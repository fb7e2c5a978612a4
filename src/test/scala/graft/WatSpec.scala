package graft

import org.apache.spark.sql.functions._

/** WAT sidecar: envelope shape, null-field omission, tolerant-bridge
  * degrade, and the Container addressing pair closing back to the
  * record it names. */
class WatSpec extends SparkSpec {
  import spark.implicits._

  private def stage(gz: Boolean): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft_wat_spec").toString
    val media = Seq(
      ("http://a.test/page", "text/html",
        ("""<a href="/one">first</a><a href="http://b.test/x">se<b>cond</b></a>""" +
          "<p>body</p>").getBytes("UTF-8"), "2026-03-01T00:00:00Z"),
      ("http://a.test/plain", "text/plain",
        "no links here".getBytes("UTF-8"), "2026-03-01T00:00:00Z"))
      .toDF("target_uri", "content_type", "payload", "warc_date").coalesce(1)
    graft.io.Warc.writeWarcResponses(media, s"$root/warc", gzipPerRecord = gz)
    graft.io.Wat.writeWat(
      graft.io.Warc.readWarc(spark, s"$root/warc"), s"$root/wat")
    (s"$root/warc", s"$root/wat")
  }

  test("envelope round-trips: headers, links with stripped anchors, null omission") {
    val (_, wat) = stage(gz = true)
    val rows = graft.io.Wat.readWat(spark, wat).filter($"ok").collect()
      .map(r => r.getAs[String]("url") -> r).toMap
    assert(rows.size == 2)
    val page = rows("http://a.test/page")
    assert(page.getAs[String]("warc_type") == "response")
    assert(page.getAs[Int]("status") == 200)
    assert(page.getAs[String]("content_type") == "text/html")
    val links = page.getSeq[org.apache.spark.sql.Row](page.fieldIndex("links"))
      .map(l => (l.getString(0), l.getString(1))).toList
    // markup inside the anchor strips to a space (the htmlLinks rule)
    assert(links == List(("/one", "first"), ("http://b.test/x", "se cond")))
    // the text/plain record has NO HTML-Metadata: links is null, and the
    // raw line carries no "Links" key at all (omission, not empty array)
    assert(rows("http://a.test/plain").isNullAt(
      rows("http://a.test/plain").fieldIndex("links")))
    val rawLines = new java.io.File(wat).listFiles()
      .filter(_.getName.startsWith("part-"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toList)
    assert(rawLines.count(_.contains("\"Links\"")) == 1)
    assert(rawLines.forall(_.contains("\"Gz-Offset\"")))
    // a malformed line degrades to its own flagged row
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(wat, "junk.wat"), "{\"Envelope\":42}\n")
    val flagged = graft.io.Wat.readWat(spark, wat).filter(!$"ok").collect()
    assert(flagged.length == 1 &&
      flagged(0).getAs[String]("filename") == "{\"Envelope\":42}")
  }

  test("watOutlinks: bit-parity with the WARC frontierLinks path") {
    val (warc, wat) = stage(gz = true)
    val fromWat = graft.io.Wat.watOutlinks(graft.io.Wat.readWat(spark, wat))
      .orderBy("from_url", "to_url").collect().toSeq
    val fromWarc = graft.io.Warc.frontierLinks(
        graft.io.Warc.readWarc(spark, warc))
      .orderBy("from_url", "to_url").collect().toSeq
    // no <base> tag staged: the two paths must agree edge-for-edge
    assert(fromWat == fromWarc && fromWat.length == 2)
  }

  test("request records round-trip method, User-Agent, and Concurrent-To verbatim") {
    val root = java.nio.file.Files.createTempDirectory("graft_wat_req").toString
    graft.io.Warc.writeWarcResponsesWithProvenance(
      Seq(("http://a.test/doc", "text/html", "<p>b</p>".getBytes("UTF-8"),
        "graftbot/1.0", 41L, "utf-8"))
        .toDF("target_uri", "content_type", "payload", "user_agent",
          "fetch_time_ms", "charset").coalesce(1), s"$root/warc")
    val recs = graft.io.Warc.readWarc(spark, s"$root/warc")
    graft.io.Wat.writeWat(recs, s"$root/wat")
    val back = graft.io.Wat.readWat(spark, s"$root/wat").filter($"ok")
      .collect().map(r => r.getAs[String]("warc_type") -> r).toMap
    // the request face: method + agent parsed from the embedded head
    assert(back("request").getAs[String]("method") == "GET")
    assert(back("request").getAs[String]("user_agent") == "graftbot/1.0")
    // the §5.7 link survives the round-trip BYTE-IDENTICAL to what the
    // record reader saw, on both record types that bear it; the
    // response carries none
    val readerLinks = recs.collect()
      .filter(_.concurrent_to != null)
      .map(r => r.warc_type -> r.concurrent_to).toMap
    assert(readerLinks.keySet == Set("request", "metadata"))
    for (t <- Seq("request", "metadata"))
      assert(back(t).getAs[String]("concurrent_to") == readerLinks(t))
    assert(back("response").isNullAt(back("response").fieldIndex("concurrent_to")))
    assert(back("response").isNullAt(back("response").fieldIndex("method")))
    // the warcinfo record carries no request face either
    assert(back("warcinfo").isNullAt(back("warcinfo").fieldIndex("method")))
  }

  test("Container addressing fetches the described record back, both layouts") {
    for (gz <- Seq(true, false)) {
      val (_, wat) = stage(gz)
      val sel = graft.io.Wat.readWat(spark, wat)
        .filter($"ok" && $"url" === "http://a.test/plain")
        .select($"filename", $"offset", $"gz_offset")
      val recs = graft.io.Warc.readWarcRecordsAt(spark, sel).collect()
      assert(recs.length == 1, s"gz=$gz")
      assert(recs(0).framing_ok && recs(0).target_uri == "http://a.test/plain")
      assert(new String(recs(0).payload, "UTF-8") == "no links here", s"gz=$gz")
    }
  }
}
