package graft

import graft.operators.{Docx, Tar}

/** Archive expansion: the ustar walk (checksums, padding, prefix,
  * skip types), ZIP/TAR entry routing through every carrier, per-entry
  * failure isolation, and the warc bridge. */
class ArchiveSpec extends SparkSpec {

  test("tar: writeTar/entries round-trips names and bytes; checksum verified") {
    val in = Seq(
      "a.txt" -> "alpha".getBytes("UTF-8"),
      "dir/b.txt" -> new Array[Byte](513), // crosses a block boundary
      "c.txt" -> Array.emptyByteArray)
    val bytes = Tar.writeTar(in)
    val out = Tar.entries(bytes, 1L)
    assert(out.map(_._1) == Vector("a.txt", "dir/b.txt", "c.txt"))
    assert(out.forall { case (n, d) =>
      java.util.Arrays.equals(d, in.find(_._1 == n).get._2) })
    // flip a data-independent header byte: the checksum must object
    val bad = bytes.clone()
    bad(100) = '7' // mode field
    val e = intercept[IllegalArgumentException] { Tar.entries(bad, 2L) }
    assert(e.getMessage.contains("checksum"))
    intercept[IllegalArgumentException] { // truncated mid-entry
      Tar.entries(bytes.take(600), 3L)
    }
  }

  test("gzip: a .tar.gz walks as tar, a single-member .txt.gz is one entry") {
    import spark.implicits._
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.GZIPOutputStream(bos)
      z.write(b); z.close()
      bos.toByteArray
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_tgz").toString
    graft.io.Warc.writeWarcResponses(
      Seq(
        ("http://a.test/dump.tar.gz", "application/gzip",
          gz(Tar.writeTar(Seq("in.txt" -> "from the tarball".getBytes("UTF-8"))))),
        ("http://a.test/note.txt.gz", "application/gzip",
          gz("just gzipped".getBytes("UTF-8"))))
        .toDF("target_uri", "content_type", "payload"), dir)
    val out = graft.io.Warc.toDocumentsArchive(
        graft.io.Warc.readWarc(spark, dir))
      .select("url", "text", "extract_ok")
      .as[(String, String, Boolean)].collect().toList
      .map(r => r._1.substring(r._1.indexOf('#') + 1) -> ((r._2, r._3))).toMap
    assert(out("in.txt") == (("from the tarball", true)))
    assert(out("note.txt") == (("just gzipped", true)))
  }

  test("warc -> archive e2e: zip and tar entries land as documents") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val zipEntries = Seq(
      "one.txt" -> "plain text".getBytes("UTF-8"),
      "page.html" -> "<p>from html</p>".getBytes("UTF-8"),
      "deck.pptx" -> graft.operators.Pptx.writePptx(Seq("slide text")),
      "skip.png" -> Array[Byte](1, 2, 3), // non-text: skipped silently
      "broken.pdf" -> Array[Byte](9, 9)) // text-typed but malformed: flagged
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_arch").toString
    graft.io.Warc.writeWarcResponses(
      Seq(
        ("http://a.test/bundle.zip", "application/zip",
          Docx.writeZip(zipEntries)),
        ("http://a.test/bundle.tar", "application/x-tar",
          Tar.writeTar(Seq("t.txt" -> "tarred".getBytes("UTF-8")))),
        ("http://a.test/bad.zip", "application/zip", Array[Byte](7)))
        .toDF("target_uri", "content_type", "payload"), dir)
    val recs = graft.io.Warc.readWarc(spark, dir)
    val out = graft.io.Warc.toDocumentsArchive(recs)
      .select("url", "text", "extract_ok")
      .as[(String, String, Boolean)].collect()
      .map { case (u, t, ok) => (u.substring(u.indexOf('#') + 1), t, ok) }
      .toList
    val byEntry = out.map(r => r._1 -> r).toMap
    assert(byEntry("one.txt")._2 == "plain text" && byEntry("one.txt")._3)
    assert(byEntry("page.html")._2 == "from html")
    assert(byEntry("deck.pptx")._2 == "slide text")
    assert(byEntry("broken.pdf")._2 == null && !byEntry("broken.pdf")._3)
    assert(byEntry("t.txt")._2 == "tarred")
    assert(!byEntry.contains("skip.png"), "non-text entries are skipped")
    assert(byEntry("")._3 == false, "the unreadable archive is one flagged row")
    assert(out.length == 6)
    // the combined text face carries the good entries only
    val all = graft.io.Warc.toDocuments(recs)
      .filter(col("url").contains("#"))
      .select("url", "text").as[(String, String)].collect().toMap
    assert(all("http://a.test/bundle.zip#one.txt") == "plain text")
    assert(all("http://a.test/bundle.tar#t.txt") == "tarred")
    assert(!all.contains("http://a.test/bundle.zip#broken.pdf"))
  }
}
