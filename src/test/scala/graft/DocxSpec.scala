package graft

import graft.operators.Docx

/** DOCX extraction: ZIP central-directory walk, raw-deflate entries,
  * the bounded WordprocessingML strip (entities, preserved space,
  * breaks/tabs, foreign-writer attribute shapes), and the fail-loud
  * boundaries — plus the warc ingestion bridge with its flagged-row
  * tolerance. */
class DocxSpec extends SparkSpec {

  test("writeDocx/extractText round-trips paragraphs exactly") {
    val text = "First paragraph.\nSecond one with spaces  kept.\nThird."
    assert(Docx.extractText(Docx.writeDocx(text), 1L) == text)
    // single paragraph, empty text
    assert(Docx.extractText(Docx.writeDocx("just one line"), 2L) == "just one line")
    assert(Docx.extractText(Docx.writeDocx(""), 3L) == "")
  }

  test("XML entities and markup characters survive the round trip") {
    val text = "a < b & b > c\n\"quotes\" and 'apostrophes'"
    assert(Docx.extractText(Docx.writeDocx(text), 4L) == text)
  }

  test("foreign-writer shapes: attributes, split runs, breaks, tabs, NCRs") {
    // document.xml as a non-graft writer would emit it: runs split
    // mid-word, attribute-laden tags, w:br/w:tab, numeric char refs,
    // self-closing empty runs — built by hand, not by writeDocx
    val xml =
      """<?xml version="1.0"?><w:document xmlns:w="x"><w:body>""" +
        """<w:p w:rsidR="00AB"><w:pPr><w:jc w:val="both"/></w:pPr>""" +
        """<w:r><w:rPr><w:b/></w:rPr><w:t>Hel</w:t></w:r>""" +
        """<w:r><w:t xml:space="preserve">lo </w:t></w:r>""" +
        """<w:r><w:t>w&#111;rld&#x21;</w:t></w:r></w:p>""" +
        """<w:p><w:r><w:t>tab</w:t><w:tab/><w:t>then</w:t>""" +
        """<w:br/><w:t>break</w:t><w:t/></w:r></w:p>""" +
        """</w:body></w:document>"""
    val docx = Docx.writeZip(Seq("word/document.xml" -> xml.getBytes("UTF-8")))
    assert(Docx.extractText(docx, 5L) == "Hello world!\ntab\tthen\nbreak")
  }

  test("tab-stop definitions and AlternateContent fallbacks don't leak text") {
    // a paragraph's TAB-STOP definitions are <w:tab/> elements inside
    // w:pPr/w:tabs — they define positions, they are not tab characters
    val tabs =
      """<w:document><w:body><w:p><w:pPr><w:tabs>""" +
        """<w:tab w:val="left" w:pos="720"/><w:tab w:val="right" w:pos="9360"/>""" +
        """</w:tabs></w:pPr><w:r><w:t>no tabs here</w:t></w:r></w:p>""" +
        """</w:body></w:document>"""
    assert(Docx.extractText(
      Docx.writeZip(Seq("word/document.xml" -> tabs.getBytes("UTF-8"))), 20L)
      == "no tabs here")
    // mc:AlternateContent: the Fallback DUPLICATES the Choice's runs —
    // collecting both would double the text
    val alt =
      """<w:document><w:body><w:p><w:r><w:t>before </w:t></w:r>""" +
        """<mc:AlternateContent><mc:Choice Requires="wps">""" +
        """<w:r><w:t>chosen</w:t></w:r></mc:Choice>""" +
        """<mc:Fallback><w:r><w:t>chosen</w:t></w:r></mc:Fallback>""" +
        """</mc:AlternateContent></w:p></w:body></w:document>"""
    assert(Docx.extractText(
      Docx.writeZip(Seq("word/document.xml" -> alt.getBytes("UTF-8"))), 21L)
      == "before chosen")
  }

  test("stored (method 0) entries read identically to deflated ones") {
    val xml = "<w:document><w:body><w:p><w:r><w:t>stored</w:t></w:r></w:p>" +
      "</w:body></w:document>"
    val data = xml.getBytes("UTF-8")
    // hand-build a ZIP with one STORED entry
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    val name = "word/document.xml".getBytes("UTF-8")
    val crc = new java.util.zip.CRC32(); crc.update(data)
    w32(0x04034b50L); w16(10); w16(0); w16(0); w16(0); w16(0x21)
    w32(crc.getValue); w32(data.length.toLong); w32(data.length.toLong)
    w16(name.length); w16(0); out.write(name); out.write(data)
    val cdOff = out.size().toLong
    w32(0x02014b50L); w16(10); w16(10); w16(0); w16(0); w16(0); w16(0x21)
    w32(crc.getValue); w32(data.length.toLong); w32(data.length.toLong)
    w16(name.length); w16(0); w16(0); w16(0); w16(0); w32(0L); w32(0L)
    out.write(name)
    val cdLen = out.size().toLong - cdOff
    w32(0x06054b50L); w16(0); w16(0); w16(1); w16(1); w32(cdLen); w32(cdOff); w16(0)
    assert(Docx.extractText(out.toByteArray, 6L) == "stored")
  }

  test("malformed packages fail loudly: no EOCD, missing part, truncation") {
    intercept[IllegalArgumentException] {
      Docx.extractText("this is not a zip file at all.....".getBytes, 7L)
    }
    // a valid ZIP without word/document.xml
    val noDoc = Docx.writeZip(Seq("other.xml" -> "<a/>".getBytes("UTF-8")))
    val e = intercept[IllegalArgumentException] { Docx.extractText(noDoc, 8L) }
    assert(e.getMessage.contains("word/document.xml"))
    // truncation mid-package (EOCD gone)
    val good = Docx.writeDocx("hello")
    intercept[IllegalArgumentException] {
      Docx.extractText(good.take(good.length / 2), 9L)
    }
    // unterminated tag in the XML itself
    val badXml = Docx.writeZip(Seq(
      "word/document.xml" -> "<w:body><w:t>txt".getBytes("UTF-8")))
    intercept[IllegalArgumentException] { Docx.extractText(badXml, 10L) }
  }

  test("warc -> docx e2e: extraction on the archive path, flagged tolerance") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val mime =
      "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_docx").toString
    graft.io.Warc.writeWarcResponses(
      Seq(
        ("http://a.test/one.docx", mime, Docx.writeDocx("Alpha.\nBeta.")),
        ("http://a.test/bad.docx", mime, Array[Byte](1, 2, 3, 4)),
        ("http://a.test/page.html", "text/html",
          "<html><body>html text</body></html>".getBytes("UTF-8")))
        .toDF("target_uri", "content_type", "payload"), dir)
    val recs = graft.io.Warc.readWarc(spark, dir)
    val docx = graft.io.Warc.toDocumentsDocx(recs)
      .select("url", "text", "extract_ok")
      .as[(String, String, Boolean)].collect().sortBy(_._1)
    assert(docx.length == 2, "only the docx-typed responses route here")
    assert(docx(0)._1.endsWith("bad.docx") && !docx(0)._3 && docx(0)._2 == null,
      "a malformed package degrades to a flagged row, never a job failure")
    assert(docx(1)._2 == "Alpha.\nBeta." && docx(1)._3)
    // the combined text face carries the successful docx row
    val all = graft.io.Warc.toDocuments(recs)
      .select("url", "text").as[(String, String)].collect().toMap
    assert(all("http://a.test/one.docx") == "Alpha.\nBeta.")
    assert(!all.contains("http://a.test/bad.docx"))
  }
}
