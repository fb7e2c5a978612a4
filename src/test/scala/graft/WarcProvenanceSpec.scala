package graft

import org.apache.spark.sql.functions._

/** Crawl provenance: warc-fields parsing (continuations, case, first
  * occurrence), the Concurrent-To links, and the left-join degrade
  * when request/metadata/warcinfo records are missing. */
class WarcProvenanceSpec extends SparkSpec {

  test("warcFields: folding, case-insensitivity, first-wins, junk lines") {
    val b = ("software: crawler/2.0\r\n" +
      "Description: a very\r\n  long folded\r\n\tvalue\r\n" +
      "SOFTWARE: shadowed\r\n" +
      "no colon line\r\n" +
      ": empty name\r\n" +
      "hostname: h.test\r\n").getBytes("UTF-8")
    val f = graft.io.Warc.warcFields(b)
    assert(f("software") == "crawler/2.0")
    assert(f("description") == "a very long folded value")
    assert(f("hostname") == "h.test")
    assert(!f.contains("no colon line"))
  }

  test("provenance catalog: linked triple, and absent links degrade to null") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_prov_spec").toString
    graft.io.Warc.writeWarcResponsesWithProvenance(
      Seq(("http://a.test/x", "text/html", "<p>x</p>".getBytes("UTF-8"),
        "bot/1", 42L, "utf-8")).toDF(
        "target_uri", "content_type", "payload", "user_agent",
        "fetch_time_ms", "charset"), dir)
    // a bare response with NO warcinfo/request/metadata in its own file
    val dir2 = java.nio.file.Files.createTempDirectory("graft_prov_bare").toString
    graft.io.Warc.writeWarcResponses(
      Seq(("http://a.test/bare", "text/html", "<p>y</p>".getBytes("UTF-8")))
        .toDF("target_uri", "content_type", "payload"), dir2)
    val recs = graft.io.Warc.readWarc(spark, dir)
      .union(graft.io.Warc.readWarc(spark, dir2))
    val rows = graft.io.Warc.crawlProvenance(recs)
      .select("url", "software", "request_method", "request_user_agent",
        "fetch_time_ms", "charset")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getString(5))).toSet
    assert(rows == Set(
      ("http://a.test/x", "graft-staging/1.0", "GET", "bot/1", 42L, "utf-8"),
      ("http://a.test/bare", null, null, null, -1L, null)))
  }

  test("readWarcStream: segments landing in a watched dir parse as in batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_stream")
    val stream = graft.io.Warc.readWarcStream(spark, dir.toString)
    assert(stream.isStreaming)
    val docs = graft.io.Warc.toDocumentsHtml(stream)
    val query = docs.writeStream.format("memory").queryName("warc_stream")
      .outputMode("append").start()
    def land(seg: String, uri: String, body: String, gz: Boolean): Unit = {
      val sub = java.nio.file.Files.createTempDirectory("graft_warc_seg")
      graft.io.Warc.writeWarcResponses(
        Seq((uri, "text/html", body.getBytes("UTF-8")))
          .toDF("target_uri", "content_type", "payload"),
        sub.toString, gzipPerRecord = gz)
      val src = java.nio.file.Files.list(sub).findFirst().get()
      java.nio.file.Files.move(src, java.nio.file.Paths.get(dir.toString, seg))
    }
    try {
      land("seg0.warc", "http://s.test/a", "<p>first batch</p>", gz = false)
      query.processAllAvailable()
      // the second segment arrives LATER and gzip-per-record (both
      // layouts through one watched dir, the crawl-output reality)
      land("seg1.warc.gz", "http://s.test/b", "<p>second batch</p>", gz = true)
      query.processAllAvailable()
      val got = spark.table("warc_stream")
        .select("url", "text").as[(String, String)].collect().toSet
      assert(got == Set(
        ("http://s.test/a", "first batch"),
        ("http://s.test/b", "second batch")))
    } finally query.stop()
  }

  test("gzipPerRecord: the member-per-record layout round-trips") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_gzpr").toString
    graft.io.Warc.writeWarcResponses(
      Seq(("http://a.test/1", "text/html", "<p>one</p>".getBytes("UTF-8")),
        ("http://a.test/2", "application/pdf",
          graft.operators.Pdf.writeTextPdf("two")))
        .toDF("target_uri", "content_type", "payload").coalesce(1),
      dir, gzipPerRecord = true)
    val f = new java.io.File(dir).listFiles().head
    assert(f.getName.endsWith(".warc.gz"))
    // two independent gzip members: a second magic beyond offset 0
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val members = bytes.indices.count(i => i + 1 < bytes.length &&
      (bytes(i) & 0xff) == 0x1f && (bytes(i + 1) & 0xff) == 0x8b)
    assert(members >= 2, s"expected concatenated members, saw $members magic(s)")
    val recs = graft.io.Warc.readWarc(spark, dir).collect()
    assert(recs.length == 2 && recs.forall(_.framing_ok))
    assert(recs.map(_.target_uri).toSet ==
      Set("http://a.test/1", "http://a.test/2"))
  }

  test("record types surface with ids; request heads parse methods") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_prov_ids").toString
    graft.io.Warc.writeWarcResponsesWithProvenance(
      Seq(("http://a.test/z", "text/html", "<p>z</p>".getBytes("UTF-8"),
        "bot/2", 7L, "utf-8")).toDF(
        "target_uri", "content_type", "payload", "user_agent",
        "fetch_time_ms", "charset"), dir)
    val recs = graft.io.Warc.readWarc(spark, dir).collect()
    assert(recs.map(_.warc_type).toSeq ==
      Seq("warcinfo", "request", "response", "metadata"))
    val resp = recs.find(_.warc_type == "response").get
    assert(resp.record_id != null && resp.record_id.startsWith("<urn:uuid:"))
    assert(recs.filter(_.concurrent_to == resp.record_id).map(_.warc_type)
      .toSet == Set("request", "metadata"))
    assert(recs.forall(_.framing_ok))
  }
}
