package graft

import graft.operators.{Recrawl, Sniff}

/** Validator capture, RFC 6266 filename routing, and the
  * age-proportional recrawl policy's edges. */
class RecrawlSpec extends SparkSpec {

  test("filenameMime: both RFC 6266 forms, precedence, unknown extensions") {
    assert(Sniff.filenameMime("attachment; filename=\"d.csv\"")
      .contains("text/csv"))
    assert(Sniff.filenameMime("inline; filename=notes.MD")
      .contains("text/markdown"))
    // filename* wins over filename, %-escapes decode
    assert(Sniff.filenameMime(
      "attachment; filename=\"x.bin\"; filename*=UTF-8''da%20ta.jsonl")
      .contains("application/json"))
    assert(Sniff.filenameMime("attachment; filename=\"x.png\"").isEmpty)
    assert(Sniff.filenameMime("attachment").isEmpty)
    assert(Sniff.filenameMime(null).isEmpty)
    // malformed ext-value degrades to the plain form
    assert(Sniff.filenameMime(
      "attachment; filename*=garbage; filename=\"a.tex\"")
      .contains("application/x-tex"))
  }

  test("sniffTypes: the filename hint fills weak sniffs, never beats magic") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dispo_spec").toString
    val pdf = graft.operators.Pdf.writeTextPdf("real pdf")
    graft.io.Warc.writeWarcResponsesWithHeaders(Seq(
      // printable text + csv filename → the hint routes it
      ("http://a.test/d1", "application/octet-stream",
        "Content-Disposition: attachment; filename=\"t.csv\"",
        "a,b\nc,d".getBytes("UTF-8")),
      // a LYING filename on real PDF bytes: magic wins
      ("http://a.test/d2", "application/octet-stream",
        "Content-Disposition: attachment; filename=\"fake.csv\"", pdf),
      // declared specific type: the hint never runs
      ("http://a.test/d3", "text/plain",
        "Content-Disposition: attachment; filename=\"x.csv\"",
        "plain text".getBytes("UTF-8")))
      .toDF("target_uri", "content_type", "extra_headers", "payload"), dir)
    val types = graft.io.Warc.sniffTypes(graft.io.Warc.readWarc(spark, dir))
      .collect().map(r => r.target_uri -> r.http_content_type).toMap
    assert(types("http://a.test/d1") == "text/csv")
    assert(types("http://a.test/d2") == "application/pdf")
    assert(types("http://a.test/d3") == "text/plain")
  }

  test("recrawlPlan: clamps, default on absent/future Last-Modified") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_recrawl_spec").toString
    graft.io.Warc.writeWarcResponsesWithHeaders(Seq(
      // 100 s old at alpha 0.5 → 50 s → min-clamped to 3600
      ("http://a.test/fresh", "text/plain",
        "Last-Modified: Sat, 28 Feb 2026 23:58:20 GMT",
        "x".getBytes("UTF-8")),
      // ~10 years old → alpha share far past the max clamp
      ("http://a.test/ancient", "text/plain",
        "ETag: \"abc\"\r\nLast-Modified: Mon, 04 Jan 2016 00:00:00 GMT",
        "x".getBytes("UTF-8")),
      // future Last-Modified (clock skew): default, never negative
      ("http://a.test/future", "text/plain",
        "Last-Modified: Wed, 01 Apr 2026 00:00:00 GMT",
        "x".getBytes("UTF-8")),
      // no validators at all: default
      ("http://a.test/bare", "text/plain", "", "x".getBytes("UTF-8")))
      .toDF("target_uri", "content_type", "extra_headers", "payload"), dir)
    val plan = Recrawl.recrawlPlan(graft.io.Warc.readWarc(spark, dir),
      alpha = 0.5, minHours = 1.0, maxHours = 720.0, defaultDays = 7.0)
      .collect().map(r => r.getAs[String]("url") ->
        ((r.getAs[Any]("age_s"), r.getLong(r.fieldIndex("interval_s")),
          r.getAs[String]("if_none_match")))).toMap
    val fetch = 1772323200L // 2026-03-01T00:00:00Z, the staged stamp
    assert(plan("http://a.test/fresh")._1 == 100L)
    assert(plan("http://a.test/fresh")._2 == 3600L)
    assert(plan("http://a.test/ancient")._2 == 720L * 3600)
    assert(plan("http://a.test/ancient")._3 == "\"abc\"")
    assert(plan("http://a.test/future")._1 == null)
    assert(plan("http://a.test/future")._2 == 7L * 86400)
    assert(plan("http://a.test/bare")._1 == null)
    assert(plan("http://a.test/bare")._2 == 7L * 86400)
    val next = Recrawl.recrawlPlan(graft.io.Warc.readWarc(spark, dir),
      alpha = 0.5).filter($"url" === "http://a.test/fresh")
      .select("next_fetch_s").as[Long].head()
    assert(next == fetch + 3600L)

    // session-time-zone invariance: Last-Modified's 'GMT' is a quoted
    // pattern literal, so without the to_utc_timestamp re-read a +09:00
    // session would shift lm_s by the offset (and push the fresh lane's
    // lm past fetch, silently falling back to the default interval)
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      val shifted = Recrawl.recrawlPlan(graft.io.Warc.readWarc(spark, dir),
        alpha = 0.5, minHours = 1.0, maxHours = 720.0, defaultDays = 7.0)
        .collect().map(r => r.getAs[String]("url") ->
          ((r.getAs[Any]("age_s"), r.getLong(r.fieldIndex("interval_s")))))
        .toMap
      assert(shifted("http://a.test/fresh") == ((100L, 3600L)))
      assert(shifted("http://a.test/ancient")._2 == 720L * 3600)
      assert(shifted("http://a.test/future")._1 == null)
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
  }

  test("recrawlPlan: obsolete RFC 850 and asctime Last-Modified forms parse") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_httpdate").toString
    graft.io.Warc.writeWarcResponsesWithHeaders(Seq(
      // RFC 850 (full weekday, dd-MMM-yy): 100 s before the staged fetch
      ("http://a.test/r850", "text/plain",
        "Last-Modified: Saturday, 28-Feb-26 23:58:20 GMT",
        "x".getBytes("UTF-8")),
      // asctime (no zone → GMT per RFC 9110): same instant
      ("http://a.test/asctime", "text/plain",
        "Last-Modified: Sat Feb 28 23:58:20 2026",
        "x".getBytes("UTF-8")),
      // asctime's space-padded single-digit day form
      ("http://a.test/padded", "text/plain",
        "Last-Modified: Sun Feb  1 00:00:00 2026",
        "x".getBytes("UTF-8")),
      // RFC 9110 §5.6.7 fifty-year rule: `94` read from a 2026 capture
      // is 1994 (2094 is >50 years future) — a real age, not the
      // future-guard's default-interval demotion
      ("http://a.test/fifty", "text/plain",
        "Last-Modified: Sunday, 06-Nov-94 08:49:37 GMT",
        "x".getBytes("UTF-8")))
      .toDF("target_uri", "content_type", "extra_headers", "payload"), dir)
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    try {
      // parsed under a non-UTC session: both zone-less/obsolete lanes
      // must still anchor at GMT
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      val plan = Recrawl.recrawlPlan(graft.io.Warc.readWarc(spark, dir),
        alpha = 0.5, minHours = 1.0, maxHours = 720.0, defaultDays = 7.0)
        .collect().map(r => r.getAs[String]("url") ->
          r.getAs[Any]("age_s")).toMap
      assert(plan("http://a.test/r850") == 100L)
      assert(plan("http://a.test/asctime") == 100L)
      assert(plan("http://a.test/padded") == 28L * 86400)
      assert(plan("http://a.test/fifty") ==
        java.time.Instant.parse("2026-03-01T00:00:00Z").getEpochSecond -
          java.time.Instant.parse("1994-11-06T08:49:37Z").getEpochSecond)
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
  }

  test("recrawlPlan: explicit freshness beats the age heuristic when both present") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fresh_spec").toString
    graft.io.Warc.writeWarcResponsesWithHeaders(Seq(
      // an OLD page the heuristic would schedule far out, but the server
      // says 2 hours — the explicit lifetime wins
      ("http://a.test/cc", "text/plain",
        "Cache-Control: max-age=7200\r\n" +
          "Last-Modified: Mon, 04 Jan 2016 00:00:00 GMT",
        "x".getBytes("UTF-8")),
      // quoted directive value parses too
      ("http://a.test/q", "text/plain",
        "Cache-Control: max-age=\"5400\"", "x".getBytes("UTF-8")))
      .toDF("target_uri", "content_type", "extra_headers", "payload"), dir)
    val plan = graft.operators.Recrawl.recrawlPlan(
        graft.io.Warc.readWarc(spark, dir),
        alpha = 0.5, minHours = 1.0, maxHours = 720.0, defaultDays = 7.0)
      .collect().map(r => r.getAs[String]("url") ->
        ((r.getAs[Any]("freshness_s"), r.getLong(r.fieldIndex("interval_s")))))
      .toMap
    assert(plan("http://a.test/cc") == ((7200L, 7200L)))
    assert(plan("http://a.test/q") == ((5400L, 5400L)))
  }

  test("mergeRefetch: latest prior wins, orphan flags, all four sources") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_merge_spec").toString
    def b(s: String) = s.getBytes("UTF-8")
    // prior crawl: /a captured TWICE (the newer v1b must win), /b, /c, /d
    graft.io.Warc.writeWarcConditional(Seq(
      ("http://x.test/a", "text/plain", b("a-v1a"), 200, null, "2026-01-01T00:00:00Z"),
      ("http://x.test/a", "text/plain", b("a-v1b"), 200, null, "2026-02-01T00:00:00Z"),
      ("http://x.test/b", "text/plain", b("b-v1"), 200, null, "2026-01-01T00:00:00Z"),
      ("http://x.test/c", "text/plain", b("c-v1"), 200, null, "2026-01-01T00:00:00Z"),
      ("http://x.test/d", "text/plain", b("d-v1"), 200, null, "2026-01-01T00:00:00Z"))
      .toDF("target_uri", "content_type", "payload", "status",
        "revisit_digest", "warc_date"), s"$root/prior")
    // refetch: /a 304 (→ the NEWER prior body), /b changed 200, /e a 304
    // with no prior capture (orphan), /c revisit by digest; /d untouched
    graft.io.Warc.writeWarcConditional(Seq(
      ("http://x.test/a", null, null, 304, null, "2026-03-01T00:00:00Z"),
      ("http://x.test/b", "text/plain", b("b-v2"), 200, null, "2026-03-01T00:00:00Z"),
      ("http://x.test/e", null, null, 304, null, "2026-03-01T00:00:00Z"),
      ("http://x.test/c", null, null, 200,
        graft.io.Warc.warcSha1Digest(b("c-v1")), "2026-03-01T00:00:00Z"))
      .toDF("target_uri", "content_type", "payload", "status",
        "revisit_digest", "warc_date"), s"$root/refetch")
    val merged = graft.operators.Recrawl.mergeRefetch(
        graft.io.Warc.readWarc(spark, s"$root/prior"),
        graft.io.Warc.readWarc(spark, s"$root/refetch"))
      .collect().map { r =>
        r.getAs[String]("url") ->
          ((Option(r.getAs[Array[Byte]]("payload"))
            .map(new String(_, "UTF-8")).orNull,
            r.getAs[String]("source"), r.getAs[String]("warc_date")))
      }.toMap
    assert(merged.size == 5)
    assert(merged("http://x.test/a") ==
      (("a-v1b", "revisit", "2026-03-01T00:00:00Z")))
    assert(merged("http://x.test/b") ==
      (("b-v2", "refetch", "2026-03-01T00:00:00Z")))
    assert(merged("http://x.test/c") ==
      (("c-v1", "revisit", "2026-03-01T00:00:00Z")))
    assert(merged("http://x.test/d") ==
      (("d-v1", "prior", "2026-01-01T00:00:00Z")))
    assert(merged("http://x.test/e") ==
      ((null, "orphan", "2026-03-01T00:00:00Z")))
  }

  test("w3cTs: every sitemap lastmod form; garbage and empty are null") {
    import spark.implicits._
    val got = Seq("2026-01-02", "2026-01-02T03:04:05Z",
      "2026-01-02T03:04:05+09:00", "2026-01-02T03:04Z",
      "2026-01-02T03:04:05.250Z", "2026-01-02T03:04:05.5Z",
      "2026-01-02T03:04:05.123456Z", "garbage", "")
      .toDF("v")
      .select($"v", graft.operators.HttpDate.w3cTs($"v").as("s"))
      .collect().map(r => r.getString(0) -> r.getAs[Any]("s")).toMap
    assert(got("2026-01-02") == 1767312000L) // date-only anchors UTC midnight
    assert(got("2026-01-02T03:04:05Z") == 1767323045L)
    assert(got("2026-01-02T03:04:05+09:00") == 1767290645L) // zone PARSES
    assert(got("2026-01-02T03:04Z") == 1767323040L) // minutes precision
    assert(got("2026-01-02T03:04:05.250Z") == 1767323045L) // fraction
    // the profile allows ANY fraction width — both must parse, not
    // silently drop the hint
    assert(got("2026-01-02T03:04:05.5Z") == 1767323045L)
    assert(got("2026-01-02T03:04:05.123456Z") == 1767323045L)
    assert(got("garbage") == null && got("") == null)
  }

  test("applySitemapHints: stale pull, hint cap, freshness precedence, discovery") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sm_hints").toString
    // all four pages share the Jan-1 Last-Modified anchor: heuristic
    // interval at alpha 0.1 = 0.1 × 59 days = 509760 s
    def page(p: String, extra: String) =
      (s"http://a.test/$p", "text/plain",
        ("Last-Modified: Thu, 01 Jan 2026 00:00:00 GMT" + extra),
        "x".getBytes("UTF-8"))
    graft.io.Warc.writeWarcResponsesWithHeaders(Seq(
      page("stale", ""), page("capped", ""),
      page("fresh", "\r\nCache-Control: max-age=7200"), page("plain", ""))
      .toDF("target_uri", "content_type", "extra_headers", "payload"), dir)
    val plan = Recrawl.recrawlPlan(graft.io.Warc.readWarc(spark, dir),
      alpha = 0.1, minHours = 1.0, maxHours = 720.0, defaultDays = 7.0)
    val sm = Seq(
      // listed by TWO sitemaps: newest lastmod (newer than the capture
      // → stale) and most eager hint (both null here) win the collapse
      ("http://a.test/stale", "2026-03-15T00:00:00Z", ""),
      ("http://a.test/stale", "2026-01-02", "never"),
      // date-only older lastmod; two hints collapse to the eager daily
      ("http://a.test/capped", "2026-02-01", "daily"),
      ("http://a.test/capped", "2026-01-02", "yearly"),
      // the hourly hint must NOT cap the explicit max-age
      ("http://a.test/fresh", "2026-02-01", "hourly"),
      // never archived → discovery
      ("http://a.test/new", "", "weekly"),
      // a loc with no derivable identity hints at nothing
      ("not a url", "2026-02-01", "daily"))
      .toDF("loc", "lastmod", "changefreq")
    def run() = Recrawl.applySitemapHints(plan, sm,
      minHours = 1.0, maxHours = 720.0, defaultDays = 7.0)
      .collect().map(r => r.getAs[String]("url") ->
        ((r.getLong(r.fieldIndex("interval_s")),
          r.getLong(r.fieldIndex("next_fetch_s")),
          r.getBoolean(r.fieldIndex("stale")),
          r.getAs[String]("source")))).toMap
    val out = run()
    val fetch = 1772323200L // 2026-03-01T00:00:00Z, the staged stamp
    val heur = 509760L
    assert(out("http://a.test/stale") == ((heur, fetch, true, "archive")))
    assert(out("http://a.test/capped") ==
      ((86400L, fetch + 86400L, false, "archive")))
    assert(out("http://a.test/fresh") ==
      ((7200L, fetch + 7200L, false, "archive")))
    assert(out("http://a.test/plain") ==
      ((heur, fetch + heur, false, "archive")))
    assert(out("http://a.test/new") == ((604800L, 0L, true, "discovered")))
    assert(out.size == 5) // the junk loc contributed nothing
    // session-zone invariance: the date-only lastmod anchors at UTC
    // midnight, not the session's
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      assert(run() == out)
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
  }
}
