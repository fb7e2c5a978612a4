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
