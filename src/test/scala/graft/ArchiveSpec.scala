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

  test("tar: PAX 'x' path overrides, global 'g', GNU 'L' longnames") {
    def named(b: Array[Byte], id: Long): Vector[(String, String)] =
      Tar.entries(b, id).map { case (n, d) => (n, new String(d, "UTF-8")) }
    val longName = ("deep/" * 30) + "leaf-" + ("n" * 40) + ".txt"
    assert(longName.getBytes("UTF-8").length > 100)
    // writeTar auto-emits the PAX 'x' record for over-long names
    val paxed = Tar.writeTar(Seq(
      longName -> "pax body".getBytes("UTF-8"),
      "short.txt" -> "s".getBytes("UTF-8")))
    assert(named(paxed, 1L) ==
      Vector((longName, "pax body"), ("short.txt", "s")))
    // GNU 'L' longname layout
    val gnu = Tar.writeTarGnuLongNames(Seq(
      longName -> "gnu body".getBytes("UTF-8")))
    assert(named(gnu, 2L) == Vector((longName, "gnu body")))
    // a PAX-free archive built by splicing: one 'g' GLOBAL header whose
    // path applies to the later member that has no 'x' of its own
    def retyped(name: String, body: Array[Byte], flag: Char): Array[Byte] = {
      val one = Tar.writeTar(Seq(name -> body))
      val h = java.util.Arrays.copyOfRange(one, 0, one.length - 1024)
      h(156) = flag.toByte
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L
      for (i <- 0 until 512) sum += h(i) & 0xff
      val cs = java.lang.Long.toOctalString(sum)
      System.arraycopy((("0" * (6 - cs.length)) + cs).getBytes("US-ASCII"),
        0, h, 148, 6)
      h(154) = 0; h(155) = ' '
      h
    }
    val g = "31 path=from/global/header.txt\n".getBytes("UTF-8")
    assert(g.length == 31)
    val out = new java.io.ByteArrayOutputStream()
    out.write(retyped("pax_global", g, 'g'))
    out.write(Tar.writeTar(Seq("plain.txt" -> "p".getBytes("UTF-8"))))
    assert(named(out.toByteArray, 3L) ==
      Vector(("from/global/header.txt", "p")))
    // malformed PAX framing is loud
    val badPax = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(retyped("bad", "999 path=x\n".getBytes("UTF-8"), 'x'))
      o.write(new Array[Byte](1024))
      o.toByteArray
    }
    intercept[IllegalArgumentException] { Tar.entries(badPax, 4L) }
  }

  test("zip64: saturated EOCD/entry fields resolve through the ZIP64 records") {
    val in = Seq(
      "a.txt" -> "zip64 alpha".getBytes("UTF-8"),
      "dir/b.txt" -> Array.tabulate(700)(i => (i * 3).toByte))
    val bytes = Docx.writeZip64(in)
    val offs = Docx.zipEntryOffsets(bytes, 1L)
    assert(offs.map(_._1) == Vector("a.txt", "dir/b.txt"))
    in.foreach { case (n, d) =>
      val cd = offs.find(_._1 == n).get._2
      assert(java.util.Arrays.equals(Docx.zipEntryAt(bytes, cd, n, 1L), d))
    }
    // the sniffer still sees a zip family through the ZIP64 framing
    assert(graft.operators.Sniff.sniffMime(bytes).contains("application/zip"))
    // saturated fields WITHOUT the 0x0001 extra are loud, not a crash
    val broken = bytes.clone()
    // blank the extra field id of the first central entry (0x0001 → 0x0099)
    val cd0 = offs.head._2
    val nameLen = (broken(cd0 + 28) & 0xff) | ((broken(cd0 + 29) & 0xff) << 8)
    broken(cd0 + 46 + nameLen) = 0x99.toByte
    val e = intercept[IllegalArgumentException] {
      Docx.zipEntryAt(broken, cd0, "a.txt", 2L)
    }
    assert(e.getMessage.contains("ZIP64"))
    // and a walker e2e: the archive face extracts zip64 members
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_zip64").toString
    graft.io.Warc.writeWarcResponses(
      Seq(("http://a.test/big.zip", "application/zip",
        Docx.writeZip64(Seq("p1.txt" -> "member text".getBytes("UTF-8")))))
        .toDF("target_uri", "content_type", "payload"), dir)
    val rows = graft.io.Warc.toDocumentsArchive(
        graft.io.Warc.readWarc(spark, dir))
      .filter($"extract_ok").select("url", "text").as[(String, String)]
      .collect().toSet
    assert(rows == Set(("http://a.test/big.zip#p1.txt", "member text")))
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
