package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Recrawl planning from HTTP validators — what a continuous crawl
  * does with the archive it already has: every fetched response
  * carries its conditional-refetch handles (`ETag` →
  * `If-None-Match`, `Last-Modified` → `If-Modified-Since`, RFC 9110
  * §13.1) and an age signal, and the classic age-proportional revisit
  * policy (pages that hadn't changed for long are rechecked seldom;
  * recently-changed pages soon — the Cho/Garcia-Molina incremental-
  * crawler heuristic) turns them into the next fetch slot:
  *
  *   interval = clamp(alpha × (fetch_time − last_modified),
  *                    min_hours, max_hours)
  *
  * with a flat `default_days` interval when the server sent no
  * `Last-Modified` (no age signal — neither eager nor never).
  *
  * EXPLICIT freshness beats the heuristic (RFC 9111: the server said
  * how long the response is good for): `Cache-Control: s-maxage` (a
  * crawler is a shared cache) then `max-age` give the lifetime
  * directly; `no-store`/`no-cache` mean zero; an `Expires` anchored at
  * the response `Date` (or the fetch time when Date is absent) gives
  * it by subtraction, and an unparseable Expires value (`0`, `-1` —
  * the idiomatic "already expired") also means zero. The lifetime
  * clamps through the same [min_hours, max_hours] window — an eager
  * server never hammers the fetcher, a lazy one never sleeps forever.
  * The output's nullable `freshness_s` column carries the raw explicit
  * lifetime for auditability.
  *
  * Scale shape: a pure narrow codegen projection over the record scan
  * — date parses, one clamp, zero shuffle; output feeds the frontier
  * scheduler ([[Robots.fetchSchedule]]) as its candidate set. Epoch
  * seconds (BIGINT) on the output, not timestamps — scheduler
  * arithmetic wants integers, and engine-portable comparison does
  * too. A `Last-Modified` in the future of the fetch (clock skew,
  * hostile) yields NULL age and the default interval — never a
  * negative slot. */
object Recrawl {

  def recrawlPlan(records: Dataset[graft.io.Warc.WarcRecord],
      alpha: Double = 0.1, minHours: Double = 1.0,
      maxHours: Double = 24 * 30.0, defaultDays: Double = 7.0): DataFrame = {
    val minS = math.round(minHours * 3600)
    val maxS = math.round(maxHours * 3600)
    val defaultS = math.round(defaultDays * 86400)
    // the shared RFC 9110 HTTP-date kernel: all three published forms
    // (IMF-fixdate, obsolete RFC 850, asctime), zone PARSED so age_s is
    // session-timezone-invariant (warc_date, ISO-8601 with an explicit
    // offset, never had the problem). The capture time anchors RFC
    // 850's fifty-year rule (§5.6.7): `Sunday, 06-Nov-94` observed in
    // 2026 is 1994 — the age signal the heuristic wants, not a
    // future-guard demotion to the default interval
    def httpTs(c: org.apache.spark.sql.Column) =
      HttpDate.httpTs(c, col("fetch_s"))
    def dirNum(name: String) = {
      val v = regexp_extract(col("cache_control"),
        "(?i)\\b" + name + "\\s*=\\s*\"?([0-9]+)", 1)
      when(v =!= "", v.cast(LongType))
    }
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull && col("warc_date").isNotNull)
      .select(col("target_uri").as("url"),
        col("http_etag").as("if_none_match"),
        col("http_last_modified").as("if_modified_since"),
        col("http_cache_control").as("cache_control"),
        col("http_expires").as("expires"),
        col("http_date").as("http_date"),
        unix_timestamp(to_timestamp(col("warc_date"))).as("fetch_s"))
      .withColumn("lm_s", httpTs(col("if_modified_since")))
      .withColumn("age_s",
        when(col("lm_s").isNotNull && col("lm_s") <= col("fetch_s"),
          col("fetch_s") - col("lm_s")))
      .withColumn("freshness_s",
        when(col("cache_control")
            .rlike("(?i)\\b(no-store|no-cache)\\b"), lit(0L))
          .when(dirNum("s-maxage").isNotNull, dirNum("s-maxage"))
          .when(dirNum("max-age").isNotNull, dirNum("max-age"))
          .when(col("expires").isNotNull,
            // Expires anchors at Date (absent: the fetch time); an
            // unparseable value is the idiomatic already-expired
            coalesce(greatest(httpTs(col("expires")) -
              coalesce(httpTs(col("http_date")), col("fetch_s")), lit(0L)),
              lit(0L))))
      .withColumn("interval_s",
        when(col("freshness_s").isNotNull,
          least(greatest(col("freshness_s"), lit(minS)), lit(maxS)))
          .when(col("age_s").isNotNull,
            least(greatest(round(col("age_s") * alpha).cast(LongType),
              lit(minS)), lit(maxS)))
          .otherwise(lit(defaultS)))
      .withColumn("next_fetch_s", col("fetch_s") + col("interval_s"))
      .drop("lm_s", "cache_control", "expires", "http_date")
  }

  /** Sitemap-informed recrawl — fold a site's OWN change claims (the
    * sitemaps protocol: `lastmod`, `changefreq`) into a
    * [[recrawlPlan]]. The protocol makes both fields HINTS, and the
    * precedence here keeps every stronger signal in charge:
    *
    *   - a `lastmod` NEWER than the archived capture means our copy is
    *     out of date no matter what any heuristic says — the row is
    *     flagged `stale` and its `next_fetch_s` pulls to the capture
    *     time (due immediately);
    *   - `changefreq` CAPS the revisit interval when the server gave
    *     no explicit RFC 9111 freshness (`always` → the min-hours
    *     clamp, `hourly`/`daily`/`weekly`/`monthly`/`yearly` → their
    *     literal seconds); explicit `Cache-Control`/`Expires`
    *     freshness beats the XML hint — the server's own protocol
    *     statement outranks a sidecar file. `never` and unrecognized
    *     values impose NO cap (servers lie; a "never" page keeps the
    *     archive's own revisit policy rather than being dropped);
    *   - a sitemap URL with NO archived capture is DISCOVERY: a row
    *     with null validators, `source = 'discovered'`, `stale`
    *     (never fetched is out of date by definition),
    *     `next_fetch_s = 0` (due since forever), and the hint — or
    *     the default interval — as its cycle.
    *
    * Join identity is the canonical URL on both sides (the
    * [[Frontier]] convention); a `loc` with no derivable identity
    * hints at nothing. A URL listed by several sitemaps collapses to
    * its newest `lastmod` and most eager `changefreq` first, so the
    * join never fans out plan rows. Output = the plan's columns plus
    * `stale` and `source` (`'archive'` | `'discovered'`).
    *
    * Scale shape: one map-side-partial aggregate on the sitemap side
    * (sitemap-scale), one equi-join on the canonical URL against the
    * plan, narrow column work everywhere else — no windows, no skew
    * terms. */
  def applySitemapHints(plan: DataFrame, sitemaps: DataFrame,
      minHours: Double = 1.0, maxHours: Double = 24 * 30.0,
      defaultDays: Double = 7.0): DataFrame = {
    import graft.expressions.NativeUrl
    val minS = math.round(minHours * 3600)
    val maxS = math.round(maxHours * 3600)
    val defaultS = math.round(defaultDays * 86400)
    val sm = (if (sitemaps.columns.contains("kind"))
        sitemaps.filter(col("kind") === "url") else sitemaps)
      // the canonical kernel is pass-through-tolerant by contract, so
      // fetch-identity derivability is witnessed by the SURT kernel
      // (null on non-URLs): a junk loc must not become a discovery row
      .filter(NativeUrl.surtUrl(col("loc")).isNotNull)
      .select(NativeUrl.canonicalizeUrl(col("loc")).as("k"),
        HttpDate.w3cTs(col("lastmod")).as("sm_lastmod_s"),
        lower(trim(col("changefreq"))).as("cf"))
      .withColumn("hint_s",
        when(col("cf") === "always", lit(0L))
          .when(col("cf") === "hourly", lit(3600L))
          .when(col("cf") === "daily", lit(86400L))
          .when(col("cf") === "weekly", lit(604800L))
          .when(col("cf") === "monthly", lit(2592000L))
          .when(col("cf") === "yearly", lit(31536000L)))
      .groupBy("k")
      .agg(max(col("sm_lastmod_s")).as("sm_lastmod_s"),
        min(col("hint_s")).as("hint_s"))
    val p = plan.withColumn("k", NativeUrl.canonicalizeUrl(col("url")))
      .filter(col("k").isNotNull)
    p.join(sm, Seq("k"), "full_outer")
      .withColumn("archived", col("fetch_s").isNotNull)
      .withColumn("interval2",
        when(!col("archived"),
          coalesce(least(greatest(col("hint_s"), lit(minS)), lit(maxS)),
            lit(defaultS)))
          .when(col("freshness_s").isNull && col("hint_s").isNotNull,
            least(greatest(least(col("interval_s"), col("hint_s")),
              lit(minS)), lit(maxS)))
          .otherwise(col("interval_s")))
      .withColumn("stale",
        when(!col("archived"), lit(true))
          .otherwise(coalesce(col("sm_lastmod_s") > col("fetch_s"),
            lit(false))))
      .select(
        coalesce(col("url"), col("k")).as("url"),
        col("if_none_match"), col("if_modified_since"),
        col("fetch_s"), col("age_s"), col("freshness_s"),
        col("interval2").as("interval_s"),
        when(!col("archived"), lit(0L))
          .when(col("stale"), col("fetch_s"))
          .otherwise(col("fetch_s") + col("interval2")).as("next_fetch_s"),
        col("stale"),
        when(col("archived"), lit("archive")).otherwise(lit("discovered"))
          .as("source"))
  }

  /** The recrawl loop's SECOND half — merge a conditional refetch crawl
    * into the prior corpus, producing ONE current capture per URL
    * (`url, warc_date, content_type, payload, source`):
    *
    *   - a refetched `200` REPLACES the prior capture (`source =
    *     'refetch'`);
    *   - a `304 Not Modified` response — the raw conditional-GET
    *     outcome — resolves to the PRIOR body at the same canonical
    *     URL, validated as current at the refetch time (`'revisit'`);
    *   - a `revisit` record (what a crawler that rewrites 304s as WARC
    *     revisit records emits, identical-payload-digest profile)
    *     resolves to the prior body by its sha1 digest — the
    *     [[graft.io.Warc.resolveRevisits]] machinery across crawls
    *     (`'revisit'`);
    *   - a prior URL the refetch never touched carries forward with its
    *     original capture time (`'prior'`).
    *
    * A 304/revisit naming nothing in the prior crawl (stale index, lost
    * archive) degrades to a flagged `source = 'orphan'` row with a null
    * payload — loud in the data, never an exception. A pointer whose
    * archive no longer yields its record (deleted or rewritten between
    * the scan and the fetch) degrades the same way.
    *
    * Scale shape — winners elect over POINTERS and bodies move through
    * ZERO exchanges: the one-capture-per-key aggregates and every
    * equi-join (canonical URL / sha1 digest — high-cardinality, uniform
    * keys, no skew term) move only `(warc_date, content_type, path,
    * offset, gz_offset)` structs, then the WINNING bodies alone are
    * fetched by offset through
    * [[graft.io.Warc.readWarcRecordsAtTagged]] — the pointer rows ride
    * the (pointer-scale) fetch shuffle as tags and come back PAIRED
    * with their payload inside the fetch task, so there is no
    * payload-bearing join-back either: a body goes archive scan →
    * output, untouched by any exchange. Aggregating
    * `max(struct(..., payload))` instead would shuffle every prior
    * generation's full body to elect each winner — at 100× that was a
    * ~1.1 GB exchange for a pointer-scale decision. The refetch's own
    * fresh 200 bodies likewise ride their scan straight into the
    * output union. The carry-forward is one anti-join on the same URL
    * key.
    *
    * `fetchSalt` passes through to the tagged fetch's straggler
    * defense (see [[graft.io.Warc.readWarcRecordsAtTagged]]): fetch
    * parallelism = archive files × salt, and a hot capture that many
    * revisits validate (its tags would otherwise serialize in the one
    * task owning its file) spreads across up to `salt` tasks at the
    * bounded price of one re-read per occupied bucket — single-tag
    * pointers, the cold-path bulk, stay read-once. */
  def mergeRefetch(prior: Dataset[graft.io.Warc.WarcRecord],
      refetch: Dataset[graft.io.Warc.WarcRecord],
      fetchSalt: Int = 8): DataFrame = {
    import graft.expressions.NativeUrl
    val spark = prior.sparkSession
    val curl = NativeUrl.canonicalizeUrl(col("target_uri")).as("url")
    val ptr = Seq(col("path"), col("offset"), col("gz_offset"))
    val p0 = prior.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull && col("http_status") === 200)
    // latest prior capture per canonical URL is the one a refetch
    // validates (an archive may hold several generations); ties past
    // warc_date resolve deterministically through the pointer fields
    val priorByUrl = p0
      .select((curl +: col("warc_date") +:
        col("http_content_type").as("content_type") +: ptr): _*)
      .filter(col("url").isNotNull)
      .groupBy("url")
      .agg(max(struct(col("warc_date"), col("content_type"),
        col("path"), col("offset"), col("gz_offset"))).as("o"))
      .select(col("url"), col("o.warc_date").as("warc_date"),
        col("o.content_type").as("content_type"), col("o.path").as("path"),
        col("o.offset").as("offset"), col("o.gz_offset").as("gz_offset"))
    val priorByDigest = p0
      .filter(col("payload_digest").isNotNull)
      .groupBy(col("payload_digest"))
      .agg(min(struct(col("http_content_type").as("content_type"),
        col("path"), col("offset"), col("gz_offset"))).as("o"))
      .select(col("payload_digest"),
        col("o.content_type").as("content_type"), col("o.path").as("path"),
        col("o.offset").as("offset"), col("o.gz_offset").as("gz_offset"))
    val r0 = refetch.toDF()
      .filter(col("framing_ok") && col("target_uri").isNotNull)
    val fresh = r0
      .filter(col("warc_type") === "response" && col("http_status") === 200)
      .select(curl, col("warc_date"),
        col("http_content_type").as("content_type"), col("payload"),
        lit("refetch").as("source"))
      .filter(col("url").isNotNull)
    val nm0 = r0
      .filter(col("warc_type") === "response" && col("http_status") === 304)
      .select(curl, col("warc_date"))
      .filter(col("url").isNotNull)
    val rv0 = r0
      .filter(col("warc_type") === "revisit" &&
        col("payload_digest").isNotNull)
      .select(curl, col("warc_date"), col("payload_digest"))
      .filter(col("url").isNotNull)
    val claimed = fresh.select("url")
      .union(nm0.select("url"))
      .union(rv0.select("url"))
    // the three prior-body lanes as POINTER rows (src0 = the source
    // tag each earns if its body fetches back)
    val pointers = nm0
      .join(priorByUrl.drop("warc_date"), Seq("url"), "left")
      .withColumn("src0", lit("revisit"))
      .unionByName(rv0
        .join(priorByDigest, Seq("payload_digest"), "left")
        .drop("payload_digest")
        .withColumn("src0", lit("revisit")))
      .unionByName(priorByUrl
        .join(claimed, Seq("url"), "left_anti")
        .withColumn("src0", lit("prior")))
    // fetch ONLY the winning bodies, by offset, with each pointer's
    // row riding as the fetch tag — no payload-bearing join-back;
    // duplicate pointers (several 304s validating one capture) read
    // the record once and each earn a row
    val resolved = graft.io.Warc.readWarcRecordsAtTagged(spark,
        pointers.filter(col("path").isNotNull)
          .select(col("path").as("filename"), col("offset"),
            col("gz_offset"),
            struct(col("url"), col("warc_date"), col("content_type"),
              col("src0")).as("tag")),
        salt = fetchSalt)
      .select(col("url"), col("warc_date"), col("content_type"),
        when(col("framing_ok"), col("payload")).as("payload"),
        when(col("framing_ok"), col("src0"))
          .otherwise(lit("orphan")).as("source"))
    // a 304/revisit naming nothing in the prior crawl never reaches
    // the fetch: it degrades here, loud in the data
    val orphans = pointers.filter(col("path").isNull)
      .select(col("url"), col("warc_date"), col("content_type"),
        lit(null).cast("binary").as("payload"),
        lit("orphan").as("source"))
    fresh.unionByName(resolved).unionByName(orphans)
  }
}
