package graft

import graft.operators.Mhtml

/** MHTML aggregates: boundary framing, QP root decode, the two §4.1
  * root-selection paths, the resource inventory, sniff precedence over
  * the mail rule, and the warc bridge. */
class MhtmlSpec extends SparkSpec {

  private val css = "body{margin:0}".getBytes("UTF-8")
  private val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10)

  test("writeMhtml/parse round-trips the root html and the inventory") {
    val html = "<p>héllo — резюме &amp; 中文</p>"
    for (rootFirst <- Seq(true, false)) {
      val b = Mhtml.writeMhtml(html, "http://a.test/page",
        Seq(("http://a.test/i.png", "image/png", png),
          ("http://a.test/s.css", "text/css", css)), rootFirst)
      val d = Mhtml.parse(b, 1L)
      assert(d.rootHtml == html, s"rootFirst=$rootFirst")
      assert(d.rootLocation == "http://a.test/page")
      assert(d.resources == Seq(
        ("http://a.test/i.png", "image/png"),
        ("http://a.test/s.css", "text/css")))
    }
  }

  test("fail-loud: missing boundary, non-html root, dangling start cid") {
    val ok = Mhtml.writeMhtml("<p>x</p>", "http://a.test/p")
    assert(Mhtml.parse(ok, 1L).resources.isEmpty)
    val noBoundary = new String(ok, "ISO-8859-1")
      .replaceFirst("boundary=\"[^\"]*\"", "x=1").getBytes("ISO-8859-1")
    intercept[IllegalArgumentException] { Mhtml.parse(noBoundary, 2L) }
    val wrongRoot = new String(ok, "ISO-8859-1")
      .replaceFirst("Content-Type: text/html; charset=utf-8",
        "Content-Type: text/plain").getBytes("ISO-8859-1")
    intercept[IllegalArgumentException] { Mhtml.parse(wrongRoot, 3L) }
    val badStart = new String(Mhtml.writeMhtml("<p>x</p>", "u",
      Seq(("r", "text/css", css)), rootFirst = false), "ISO-8859-1")
      .replaceFirst("start=<root@graft>", "start=<nope@graft>")
      .getBytes("ISO-8859-1")
    intercept[IllegalArgumentException] { Mhtml.parse(badStart, 4L) }
    intercept[IllegalArgumentException] { Mhtml.parse("plain".getBytes, 5L) }
  }

  test("sniff: MHTML claims multipart/related BEFORE the mail rule") {
    val b = Mhtml.writeMhtml("<p>x</p>", "http://a.test/p")
    // the head carries From:/Subject: lines — without the MHTML rule
    // this would sniff message/rfc822
    assert(graft.operators.Sniff.sniffMime(b).contains("multipart/related"))
    // a real mail (no related subtype) still sniffs as mail
    val eml = ("Subject: hi\r\nFrom: a@b.test\r\nMessage-Id: <1@b>\r\n" +
      "\r\nbody\r\n").getBytes("UTF-8")
    assert(graft.operators.Sniff.sniffMime(eml).contains("message/rfc822"))
  }

  test("warc e2e: octet-stream .mht sniffs, routes, and joins toDocuments") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_mht").toString
    graft.io.Warc.writeWarcResponses(
      Seq(("http://a.test/saved.mht", "application/octet-stream",
        Mhtml.writeMhtml("<p>saved body</p>", "http://a.test/orig",
          Seq(("r.css", "text/css", css)))),
        ("http://a.test/broken.mht", "multipart/related",
          "not mime at all".getBytes("UTF-8")))
        .toDF("target_uri", "content_type", "payload"), dir)
    val recs = graft.io.Warc.sniffTypes(graft.io.Warc.readWarc(spark, dir))
    val face = graft.io.Warc.toDocumentsMhtml(recs)
      .select("url", "text", "n_resources", "extract_ok")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getBoolean(3))).toSet
    assert(face == Set(
      ("http://a.test/saved.mht", "saved body", 1, true),
      ("http://a.test/broken.mht", null, -1, false)))
    val union = graft.io.Warc.toDocuments(recs)
      .select("url").as[String].collect().toSet
    assert(union == Set("http://a.test/saved.mht"))
  }
}
