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
}
