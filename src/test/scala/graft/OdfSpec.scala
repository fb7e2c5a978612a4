package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.operators.{Docx, Odf, Sniff}

/** The OpenDocument walk: body-root dispatch, paragraph strip with
  * ODF whitespace elements, note/annotation drops, table flattening
  * with column repeats, writer round-trips, sniffing, and the warc
  * bridges. */
class OdfSpec extends SparkSpec {

  private def odtWith(body: String): Array[Byte] = {
    val content =
      "<?xml version=\"1.0\"?><office:document-content " +
        "xmlns:office=\"urn:o\" xmlns:text=\"urn:t\">" +
        s"<office:body><office:text>$body</office:text></office:body>" +
        "</office:document-content>"
    Docx.writeZip(Seq(
      "mimetype" -> Odf.OdtMime.getBytes("US-ASCII"),
      "content.xml" -> content.getBytes(UTF_8)), stored = Set("mimetype"))
  }

  test("paragraph strip: whitespace elements, spans, notes, headings") {
    val body =
      "<text:h text:outline-level=\"1\">Heading One</text:h>" +
        "<text:p>a<text:tab/>b<text:line-break/>c<text:s text:c=\"3\"/>d</text:p>" +
        "<text:p><text:span text:style-name=\"T1\">spanned " +
        "<text:span>nested</text:span></text:span> tail</text:p>" +
        "<text:p>before<text:note text:note-class=\"footnote\">" +
        "<text:note-citation>1</text:note-citation>" +
        "<text:note-body><text:p>dropped note text</text:p></text:note-body>" +
        "</text:note>after</text:p>" +
        "<text:p>ents &amp; &lt;tags&gt; &#65;</text:p><text:p/>"
    assert(new String(Odf.extractText(odtWith(body)).getBytes(UTF_8), UTF_8) ==
      "Heading One\na\tb\nc   d\nspanned nested tail\nbeforeafter\n" +
        "ents & <tags> A\n")
  }

  test("note paragraphs do not leak as separate paragraphs") {
    // the note body holds a text:p — the drop must consume it whole,
    // not surface it through the outer paragraph scan
    val out = Odf.extractText(odtWith(
      "<text:p>x<text:note><text:note-body><text:p>hidden</text:p>" +
        "</text:note-body></text:note>y</text:p>"))
    assert(out == "xy")
  }

  test("spreadsheet flattening: TABs, repeats, covered cells, trimming") {
    val ods = Odf.writeOds(Seq(Seq("a", "b"), Seq("only")))
    assert(Odf.extractText(ods) == "a\tb\nonly")
    // hand-built row with repeat + covered + trailing empties
    val content =
      "<?xml version=\"1.0\"?><office:document-content xmlns:o=\"u\">" +
        "<office:body><office:spreadsheet><table:table>" +
        "<table:table-row>" +
        "<table:table-cell table:number-columns-repeated=\"2\"><text:p>r</text:p></table:table-cell>" +
        "<table:covered-table-cell/>" +
        "<table:table-cell><text:p>z</text:p></table:table-cell>" +
        "<table:table-cell table:number-columns-repeated=\"900\"/>" +
        "</table:table-row>" +
        "</table:table></office:spreadsheet></office:body></office:document-content>"
    val zip = Docx.writeZip(Seq(
      "mimetype" -> Odf.OdsMime.getBytes("US-ASCII"),
      "content.xml" -> content.getBytes(UTF_8)), stored = Set("mimetype"))
    assert(Odf.extractText(zip) == "r\tr\t\tz")
  }

  test("writers round-trip all three kinds; package mime + sniff agree") {
    val paras = (1 to 7).map(i => s"paragraph $i with\ttab and\nbreak")
    assert(Odf.extractText(Odf.writeOdt(paras)) == paras.mkString("\n"))
    val slides = Seq("slide one", "slide two", "slide three")
    assert(Odf.extractText(Odf.writeOdp(slides)) == slides.mkString("\n"))
    assert(Odf.packageMime(Odf.writeOdt(Seq("x"))).contains(Odf.OdtMime))
    assert(Sniff.sniffMime(Odf.writeOdt(Seq("x"))).contains(Odf.OdtMime))
    assert(Sniff.sniffMime(Odf.writeOds(Seq(Seq("x")))).contains(Odf.OdsMime))
    assert(Sniff.sniffMime(Odf.writeOdp(Seq("x"))).contains(Odf.OdpMime))
  }

  test("fail-loudly: no content.xml, unknown body root, bad framing") {
    val noContent = Docx.writeZip(Seq("a.txt" -> "x".getBytes(UTF_8)))
    intercept[IllegalArgumentException] { Odf.extractText(noContent) }
    val weird = Docx.writeZip(Seq("content.xml" ->
      "<office:document-content><office:body><office:chart/></office:body></office:document-content>"
        .getBytes(UTF_8)))
    intercept[IllegalArgumentException] { Odf.extractText(weird) }
    intercept[IllegalArgumentException] {
      Odf.extractText(odtWith("<text:p>unclosed"))
    }
  }

  test("warc e2e: odf responses and archive entries land as documents") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_odf").toString
    graft.io.Warc.writeWarcResponses(
      Seq(
        ("http://a.test/doc.odt", Odf.OdtMime, Odf.writeOdt(Seq("odt body"))),
        ("http://a.test/pack.zip", "application/zip",
          Docx.writeZip(Seq("slides.odp" ->
            Odf.writeOdp(Seq("packed slide"))))))
        .toDF("target_uri", "content_type", "payload"), dir)
    val recs = graft.io.Warc.readWarc(spark, dir)
    val direct = graft.io.Warc.toDocumentsOdf(recs)
      .select("url", "text").as[(String, String)].collect().toMap
    assert(direct("http://a.test/doc.odt") == "odt body")
    val viaZip = graft.io.Warc.toDocumentsArchive(recs)
      .select("url", "text").as[(String, String)].collect().toMap
    assert(viaZip("http://a.test/pack.zip#slides.odp") == "packed slide")
    assert(graft.io.Warc.toDocuments(recs).select("url").as[String]
      .collect().toSet.contains("http://a.test/doc.odt"))
  }
}
