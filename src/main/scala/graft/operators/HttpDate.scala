package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTTP-date parsing (RFC 9110 §5.6.7) — the ONE kernel every header
  * that carries a date routes through (`Last-Modified`, `Expires`,
  * `Date`, `Retry-After`), so the recrawl planner and the politeness
  * backoff read the same calendar. A recipient MUST accept all three
  * published forms:
  *
  *   - IMF-fixdate (the preferred form): `Sun, 06 Nov 1994 08:49:37 GMT`
  *   - obsolete RFC 850:                 `Sunday, 06-Nov-94 08:49:37 GMT`
  *   - obsolete asctime():               `Sun Nov  6 08:49:37 1994`
  *
  * Spark's datetime dialect refuses day-name fields (EEE/EEEE) for
  * PARSING, so each lane strips its weekday prefix first — the name is
  * redundant with the date. Zones PARSE (`zzz`, never a quoted
  * literal): a quoted 'GMT' would land the wall-clock fields in the
  * session time zone, skewing every derived age by the zone offset
  * under a non-UTC `spark.sql.session.timeZone`. asctime carries no
  * zone — the RFC fixes it at GMT, appended before the parse so the
  * lane stays session-zone-invariant too.
  *
  * RFC 850's two-digit year first resolves into 2000–2099 (the Java
  * `yy` reduced-year base), then the RFC's OWN disambiguation rule
  * applies when the caller supplies an observation time: a timestamp
  * that "appears to be more than 50 years in the future" MUST be
  * interpreted as the most recent past year with the same last two
  * digits (§5.6.7) — so `Sunday, 06-Nov-94` observed from 2026 is
  * 1994, not 2094. The servers still emitting RFC 850 dates are
  * exactly the ones whose `Last-Modified` values predate 2000; without
  * the rule their age signal silently vanishes into the future-guard.
  * The reference time is a COLUMN (the record's own `warc_date` /
  * `Date` header), never the wall clock — the guard is deterministic
  * and replayable. The one-argument form has no observation time and
  * keeps the bare 2000–2099 reading (documented, not guessed at).
  * Century subtraction uses a year-month interval — calendar-correct
  * across leap days, no seconds arithmetic.
  *
  * Each lane's strip pattern is disjoint from the other forms (fixdate
  * needs exactly `LLL, `; RFC 850 a longer name; asctime no comma), so
  * the coalesce never mis-routes — a value is parsed by at most one
  * lane, and an unparseable value is NULL for the caller's own default
  * policy. Pure narrow column work, codegen-friendly. */
object HttpDate {

  /** Epoch seconds of an HTTP-date column under any of the three RFC
    * 9110 forms; NULL when none parse. No observation time: the RFC
    * 850 fifty-year rule cannot apply (see the two-argument form). */
  def httpTs(c: Column): Column = httpTs(c, lit(null).cast("long"))

  /** Epoch seconds of an HTTP-date column, disambiguating RFC 850
    * two-digit years against `refS` (epoch seconds — the record's own
    * capture/Date time): an RFC 850 parse more than 50 years past
    * `refS` resolves to the prior century, per RFC 9110 §5.6.7's MUST.
    * A null `refS` (or a row with no reference) keeps the bare
    * 2000–2099 reading. */
  def httpTs(c: Column, refS: Column): Column = {
    val fixdate = try_to_timestamp(
      regexp_replace(c, "^[A-Za-z]{3}, ", ""),
      lit("dd MMM yyyy HH:mm:ss zzz"))
    val raw850 = try_to_timestamp(
      regexp_replace(c, "^[A-Za-z]{4,}, ", ""),
      lit("dd-MMM-yy HH:mm:ss zzz"))
    // the fifty-year rule: null refS makes the comparison null, and the
    // otherwise-branch keeps the raw reading — one codegen'd CASE
    val rfc850 = when(
      raw850 > timestamp_seconds(refS) + make_ym_interval(lit(50), lit(0)),
      raw850 - make_ym_interval(lit(100), lit(0)))
      .otherwise(raw850)
    val asctime = try_to_timestamp(
      concat(regexp_replace(
        regexp_replace(c, "^[A-Za-z]{3} ", ""), "  +", " "), lit(" GMT")),
      lit("MMM d HH:mm:ss yyyy zzz"))
    unix_timestamp(coalesce(fixdate, rfc850, asctime))
  }

  /** Epoch seconds of a W3C-datetime column — the sitemaps protocol's
    * `lastmod` dialect (sitemaps.org, "W3C Datetime"): a full ISO 8601
    * date-time with a MANDATORY zone designator (`Z` or `±hh:mm`,
    * optional fractional seconds, minutes-precision allowed), or a
    * bare `yyyy-MM-dd` date. Zones PARSE for the same reason as
    * [[httpTs]]; the date-only form carries no zone by design and
    * anchors at UTC midnight — the deterministic reading, and the one
    * that never schedules a fetch EARLIER than the publisher could
    * have meant by more than a day. Fractional seconds are ANY width
    * in the profile (`.5`, `.123`, `.123456`) — they normalize away
    * before the parse (a fixed `.SSS` pattern would silently drop
    * every other width), and scheduling never needs sub-seconds. The
    * profile's year / year-month reduced forms (never seen in
    * sitemaps) and anything else unparseable are NULL — a hint that
    * says nothing. */
  def w3cTs(c: Column): Column = {
    def p(fmt: String, v: Column) = try_to_timestamp(v, lit(fmt))
    val noFrac = regexp_replace(c, "\\.[0-9]+", "")
    unix_timestamp(coalesce(
      p("yyyy-MM-dd'T'HH:mm:ssXXX", noFrac),
      p("yyyy-MM-dd'T'HH:mmXXX", noFrac),
      // date-only: the concat can only parse when c IS a bare date —
      // a full datetime turns into garbage and falls out as null
      p("yyyy-MM-dd'T'HH:mm:ssXXX", concat(c, lit("T00:00:00+00:00")))))
  }
}
