package graft

import graft.operators.{Docx, Pptx}

/** PPTX extraction: the DrawingML run strip (paragraphs, line breaks,
  * entities, Fallback suppression), numeric slide ordering past nine
  * slides, and the fail-loud boundaries — plus the warc bridge. */
class PptxSpec extends SparkSpec {

  test("writePptx/extractText round-trips slides and paragraphs") {
    val slides = Seq("title line", "first point\nsecond point", "closing")
    val bytes = Pptx.writePptx(slides)
    assert(Pptx.extractText(bytes, 1L) ==
      "title line\nfirst point\nsecond point\nclosing")
  }

  test("slide order is numeric, not lexicographic") {
    // 12 slides: lexicographic entry order would read slide10 before
    // slide2; the extractor must order by the part index
    val slides = (1 to 12).map(i => s"slide $i")
    assert(Pptx.extractText(Pptx.writePptx(slides), 2L) ==
      slides.mkString("\n"))
    // and the package really contains a two-digit part
    assert(Docx.zipEntry(Pptx.writePptx(slides),
      "ppt/slides/slide12.xml", 2L).nonEmpty)
  }

  test("entities, a:br line breaks, empty runs, fields keep cached text") {
    val slide =
      """<p:sld><p:cSld><p:spTree><p:sp><p:txBody>""" +
        """<a:p><a:r><a:t>a &lt; b &amp; c&#33;</a:t></a:r>""" +
        """<a:r><a:br/><a:t>after break</a:t></a:r><a:r><a:t/></a:r></a:p>""" +
        """<a:p><a:fld id="{X}" type="slidenum"><a:t>7</a:t></a:fld></a:p>""" +
        """</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"""
    val pkg = Docx.writeZip(Seq(
      "ppt/slides/slide1.xml" -> slide.getBytes("UTF-8")))
    assert(Pptx.extractText(pkg, 3L) == "a < b & c!\nafter break\n7")
  }

  test("mc:Fallback duplicate content is suppressed") {
    val slide =
      """<p:sld><p:cSld><p:spTree><mc:AlternateContent>""" +
        """<mc:Choice Requires="x"><p:sp><p:txBody>""" +
        """<a:p><a:r><a:t>the real text</a:t></a:r></a:p>""" +
        """</p:txBody></p:sp></mc:Choice>""" +
        """<mc:Fallback><p:sp><p:txBody>""" +
        """<a:p><a:r><a:t>the real text</a:t></a:r></a:p>""" +
        """</p:txBody></p:sp></mc:Fallback>""" +
        """</mc:AlternateContent></p:spTree></p:cSld></p:sld>"""
    val pkg = Docx.writeZip(Seq(
      "ppt/slides/slide1.xml" -> slide.getBytes("UTF-8")))
    assert(Pptx.extractText(pkg, 4L) == "the real text")
  }

  test("fail-loud: no slides, truncation, unterminated run") {
    val noSlides = Docx.writeZip(Seq(
      "ppt/presentation.xml" -> "<p:presentation/>".getBytes("UTF-8")))
    val e = intercept[IllegalArgumentException] {
      Pptx.extractText(noSlides, 5L)
    }
    assert(e.getMessage.contains("ppt/slides"))
    val good = Pptx.writePptx(Seq("some text"))
    intercept[IllegalArgumentException] {
      Pptx.extractText(good.take(good.length / 2), 6L)
    }
    val openRun = Docx.writeZip(Seq(
      "ppt/slides/slide1.xml" ->
        "<a:p><a:r><a:t>never closed".getBytes("UTF-8")))
    val e2 = intercept[IllegalArgumentException] {
      Pptx.extractText(openRun, 7L)
    }
    assert(e2.getMessage.contains("open <a:t>"))
  }

  test("warc -> pptx e2e: deck text lands in the corpus, flagged tolerance") {
    import spark.implicits._
    val mime =
      "application/vnd.openxmlformats-officedocument.presentationml.presentation"
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_pptx").toString
    graft.io.Warc.writeWarcResponses(
      Seq(
        ("http://a.test/deck.pptx", mime,
          Pptx.writePptx(Seq("intro", "body point"))),
        ("http://a.test/bad.pptx", mime, Array[Byte](7, 7, 7)))
        .toDF("target_uri", "content_type", "payload"), dir)
    val recs = graft.io.Warc.readWarc(spark, dir)
    val out = graft.io.Warc.toDocumentsPptx(recs)
      .select("url", "text", "extract_ok")
      .as[(String, String, Boolean)].collect().sortBy(_._1)
    assert(out.length == 2)
    assert(out(0)._1.endsWith("bad.pptx") && !out(0)._3 && out(0)._2 == null)
    assert(out(1)._2 == "intro\nbody point" && out(1)._3)
    // the combined text face carries it
    val all = graft.io.Warc.toDocuments(recs)
      .select("url", "text").as[(String, String)].collect().toMap
    assert(all("http://a.test/deck.pptx") == "intro\nbody point")
    assert(!all.contains("http://a.test/bad.pptx"))
  }
}
