package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.Warc

/** WARC revisit records and payload-digest resolution: the digest
  * notation (WARC 1.1 §5.9, sha1 + RFC 4648 base32), the revisit
  * record shape (identical-payload-digest profile, HTTP head, no
  * body), and the resolveRevisits join incl. the deterministic
  * one-original-per-digest pick. */
class RevisitSpec extends SparkSpec {
  import spark.implicits._

  test("warcSha1Digest matches the RFC 3174 test vector in base32") {
    // sha1("abc") = a9993e364706816aba3e25717850c26c9cd0d89d
    // base32 of those 20 bytes (RFC 4648): VGMT4NSHA2AWVOR6EVYXQUGCNSONBWE5
    assert(Warc.warcSha1Digest("abc".getBytes("US-ASCII")) ==
      "sha1:VGMT4NSHA2AWVOR6EVYXQUGCNSONBWE5")
  }

  test("writer emits digest-bearing responses and body-less revisits") {
    val df = Seq(
      ("http://r.test/a", "text/html",
        "<p>original body</p>".getBytes("UTF-8"), "http://m.test/a"),
      ("http://r.test/b", "text/html",
        "<p>solo body</p>".getBytes("UTF-8"), null))
      .toDF("target_uri", "content_type", "payload", "revisit_uri")
    val dir = Files.createTempDirectory("graft_revisit_w").toString
    Warc.writeWarcResponsesWithRevisits(df, dir)
    val rows = Warc.readWarc(spark, dir).collect()
    assert(rows.forall(_.framing_ok))
    val byUri = rows.map(r => r.target_uri -> r).toMap
    assert(rows.count(_.warc_type == "response") == 2)
    assert(rows.count(_.warc_type == "revisit") == 1)
    val orig = byUri("http://r.test/a")
    val rev = byUri("http://m.test/a")
    assert(orig.payload_digest != null &&
      orig.payload_digest.startsWith("sha1:") &&
      orig.payload_digest.length == "sha1:".length + 32)
    assert(rev.payload_digest == orig.payload_digest)
    assert(rev.payload.isEmpty) // head-only block: no entity bytes
    assert(rev.http_content_type == "text/html")
    assert(byUri("http://r.test/b").payload_digest !=
      orig.payload_digest)
  }

  test("resolveRevisits recovers the entity for the revisit URI") {
    val df = Seq(
      ("http://r.test/a", "text/html",
        "<p>shared body</p>".getBytes("UTF-8"), "http://m.test/a"),
      ("http://r.test/b", "text/plain",
        "plain".getBytes("UTF-8"), null))
      .toDF("target_uri", "content_type", "payload", "revisit_uri")
    val dir = Files.createTempDirectory("graft_revisit_r").toString
    Warc.writeWarcResponsesWithRevisits(df, dir)
    val resolved = Warc.resolveRevisits(Warc.readWarc(spark, dir)).collect()
    assert(resolved.length == 1)
    val r = resolved.head
    assert(r.getAs[String]("url") == "http://m.test/a")
    assert(r.getAs[String]("orig_uri") == "http://r.test/a")
    assert(r.getAs[String]("http_content_type") == "text/html")
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") ==
      "<p>shared body</p>")
  }

  test("several responses sharing a payload resolve to ONE deterministic original") {
    // two different URLs serve byte-identical payloads; a revisit by
    // that digest must land on exactly one original (min URI), never
    // fan out the join
    val body = "<p>twin body</p>".getBytes("UTF-8")
    val df = Seq(
      ("http://r.test/z-copy", "text/html", body, null),
      ("http://r.test/a-copy", "text/html", body, "http://m.test/t"))
      .toDF("target_uri", "content_type", "payload", "revisit_uri")
    val dir = Files.createTempDirectory("graft_revisit_d").toString
    Warc.writeWarcResponsesWithRevisits(df, dir)
    val resolved = Warc.resolveRevisits(Warc.readWarc(spark, dir)).collect()
    assert(resolved.length == 1)
    assert(resolved.head.getAs[String]("orig_uri") == "http://r.test/a-copy")
  }

  test("a revisit whose digest matches no response resolves to nothing") {
    val df = Seq(("http://r.test/a", "text/html",
      "<p>here</p>".getBytes("UTF-8"), null))
      .toDF("target_uri", "content_type", "payload", "revisit_uri")
    val dir = Files.createTempDirectory("graft_revisit_o").toString
    Warc.writeWarcResponsesWithRevisits(df, dir)
    // hand-write an orphan revisit segment alongside
    val orphan = ("WARC/1.0\r\nWARC-Type: revisit\r\n" +
      "WARC-Target-URI: http://m.test/orphan\r\n" +
      "WARC-Profile: http://netpreserve.org/warc/1.1/revisit/identical-payload-digest\r\n" +
      "WARC-Payload-Digest: sha1:AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA\r\n" +
      "Content-Length: 0\r\n\r\n\r\n\r\n").getBytes("US-ASCII")
    Files.write(java.nio.file.Paths.get(dir, "seg_orphan.warc"), orphan)
    val recs = Warc.readWarc(spark, dir)
    assert(recs.filter(col("warc_type") === "revisit").count() == 1)
    assert(Warc.resolveRevisits(recs).isEmpty)
  }
}
