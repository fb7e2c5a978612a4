package graft

import graft.operators.{Docx, Epub}

/** EPUB spine extraction: OCF wayfinding (container → OPF → manifest
  * → spine), reading order, href resolution from a subdirectory,
  * percent-decoding, non-XHTML spine items, the stored mimetype rule,
  * and the fail-loud boundaries — plus the warc bridge. */
class EpubSpec extends SparkSpec {

  test("writeEpub/spineHtml round-trips chapters in spine order") {
    val bytes = Epub.writeEpub(Seq("one", "two", "three"))
    val html = Epub.spineHtml(bytes, 1L)
    assert(html.contains("<p>one</p>") && html.contains("<p>three</p>"))
    assert(html.indexOf("one") < html.indexOf("two"))
    assert(html.indexOf("two") < html.indexOf("three"))
    // the OCF magic rule: entry 0 is a STORED mimetype, so the media
    // type is readable at a fixed offset by magic sniffers
    assert(new String(bytes, 30, 8, "US-ASCII") == "mimetype")
    assert(new String(bytes, 38, 20, "US-ASCII") == "application/epub+zip")
  }

  test("spine order wins over manifest/name order; hrefs resolve and decode") {
    val container =
      """<container><rootfiles><rootfile full-path="pkg/book.opf"/></rootfiles></container>"""
    val opf =
      """<package><manifest>""" +
        """<item id="b" href="text%20b.xhtml" media-type="application/xhtml+xml"/>""" +
        """<item id="a" href="../top.xhtml" media-type="application/xhtml+xml"/>""" +
        """<item id="css" href="style.css" media-type="text/css"/>""" +
        """</manifest><spine><itemref idref="b"/><itemref idref="a"/></spine></package>"""
    val pkg = Docx.writeZip(Seq(
      "META-INF/container.xml" -> container.getBytes("UTF-8"),
      "pkg/book.opf" -> opf.getBytes("UTF-8"),
      "pkg/text b.xhtml" -> "<p>second file first</p>".getBytes("UTF-8"),
      "top.xhtml" -> "<p>parent dir</p>".getBytes("UTF-8")))
    val html = Epub.spineHtml(pkg, 2L)
    assert(html == "<p>second file first</p><p>parent dir</p>")
  }

  test("fail-loud: no container, missing opf, dangling idref, empty spine") {
    val noContainer = Docx.writeZip(Seq(
      "mimetype" -> "application/epub+zip".getBytes("UTF-8")))
    val e = intercept[IllegalArgumentException] {
      Epub.spineHtml(noContainer, 3L)
    }
    assert(e.getMessage.contains("container.xml"))
    val container =
      """<container><rootfiles><rootfile full-path="book.opf"/></rootfiles></container>"""
    val noOpf = Docx.writeZip(Seq(
      "META-INF/container.xml" -> container.getBytes("UTF-8")))
    intercept[IllegalArgumentException] { Epub.spineHtml(noOpf, 4L) }
    val dangling = Docx.writeZip(Seq(
      "META-INF/container.xml" -> container.getBytes("UTF-8"),
      "book.opf" ->
        """<package><manifest/><spine><itemref idref="ghost"/></spine></package>"""
          .getBytes("UTF-8")))
    val e2 = intercept[IllegalArgumentException] { Epub.spineHtml(dangling, 5L) }
    assert(e2.getMessage.contains("ghost"))
    val emptySpine = Docx.writeZip(Seq(
      "META-INF/container.xml" -> container.getBytes("UTF-8"),
      "book.opf" -> "<package><manifest/><spine/></package>".getBytes("UTF-8")))
    intercept[IllegalArgumentException] { Epub.spineHtml(emptySpine, 6L) }
  }

  test("warc -> epub e2e: book text lands in the corpus, flagged tolerance") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_epub").toString
    graft.io.Warc.writeWarcResponses(
      Seq(
        ("http://a.test/book.epub", "application/epub+zip",
          Epub.writeEpub(Seq("chapter one text", "chapter two text"))),
        ("http://a.test/bad.epub", "application/epub+zip", Array[Byte](7, 7, 7)))
        .toDF("target_uri", "content_type", "payload"), dir)
    val recs = graft.io.Warc.readWarc(spark, dir)
    val out = graft.io.Warc.toDocumentsEpub(recs)
      .select("url", "text", "extract_ok")
      .as[(String, String, Boolean)].collect().sortBy(_._1)
    assert(out.length == 2)
    assert(out(0)._1.endsWith("bad.epub") && !out(0)._3 && out(0)._2 == null)
    assert(out(1)._2 == "chapter one text\nchapter two text" && out(1)._3)
    val all = graft.io.Warc.toDocuments(recs)
      .select("url", "text").as[(String, String)].collect().toMap
    assert(all("http://a.test/book.epub") == "chapter one text\nchapter two text")
    assert(!all.contains("http://a.test/bad.epub"))
  }
}
