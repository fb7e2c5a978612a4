package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

/** Pure-JVM PPTX (PresentationML, ECMA-376) text extraction — the
  * third face of the OOXML trio after [[Docx]] (prose) and [[Xlsx]]
  * (tables), riding the same ZIP central-directory walk. A deck's
  * visible text lives in DrawingML runs: `<a:t>` content inside
  * `<a:p>` paragraphs inside shape `<p:txBody>` blocks — one
  * `ppt/slides/slideN.xml` part per slide. Extraction renders each
  * slide as newline-joined paragraph lines and joins slides with a
  * newline, the same flattening the other carriers feed the corpus.
  *
  * Slide order is NUMERIC on the part name's index (`slide2` before
  * `slide10`), not lexicographic — the part naming convention every
  * producer follows; a deck whose `p:sldIdLst` disagrees with its part
  * numbering is out of scope for a text corpus. Speaker notes
  * (`ppt/notesSlides/`) are deliberately excluded: they are presenter
  * commentary, not the document a reader of the deck sees.
  *
  * Same bounded-scan philosophy as the [[Docx]] strip: `<a:t>` run
  * framing, `</a:p>` paragraph breaks, `<a:br/>` line breaks,
  * `mc:Fallback` suppression (the AlternateContent fallback DUPLICATES
  * its sibling Choice's runs), no general XML parser. Slide-number
  * fields (`a:fld`) keep their cached literal — it is visible text.
  *
  * Fail-loudly contract ([[Multimodal]] codec rule): no slide entries,
  * malformed framing, or a truncated package throw
  * `IllegalArgumentException` with the media id; the warc bridge
  * ([[graft.io.Warc.toDocumentsPptx]]) degrades those to flagged rows. */
object Pptx {

  private val SlideName = "ppt/slides/slide([0-9]+)\\.xml".r

  /** Visible text of every slide, numeric slide order, slides joined
    * by `\n`. */
  def extractText(bytes: Array[Byte], mediaId: Long = -1L): String = {
    val slides = Docx.zipEntryOffsets(bytes, mediaId).flatMap {
      case (name @ SlideName(num), cd) => Some((num.toInt, name, cd))
      case _ => None
    }.sortBy(_._1)
    require(slides.nonEmpty,
      s"media $mediaId: ZIP package without ppt/slides/ — not a PPTX")
    slides.map { case (_, name, cd) =>
      parseSlide(
        new String(Docx.zipEntryAt(bytes, cd, name, mediaId), UTF_8),
        mediaId)
    }.mkString("\n")
  }

  /** One slide's DrawingML strip: `<a:t>` runs accumulate (entities
    * decoded with the shared [[Docx]] rules), `</a:p>` appends a line
    * break, `<a:br/>` maps to newline, `mc:Fallback` regions are
    * suppressed. The final paragraph's break is dropped so n
    * paragraphs join with n-1 breaks (the [[Docx]] rule). */
  private[graft] def parseSlide(xml: String, mediaId: Long): String = {
    val sb = new StringBuilder
    var i = 0
    var inText = false
    var suppress = 0 // nesting depth of mc:Fallback
    while (i < xml.length) {
      if (xml.charAt(i) == '<') {
        val close = xml.indexOf('>', i)
        require(close > i,
          s"media $mediaId: unterminated tag in a slide part at $i")
        val tag = xml.substring(i + 1, close)
        if ((tag == "mc:Fallback" || tag.startsWith("mc:Fallback ")) &&
            !tag.endsWith("/"))
          suppress += 1
        else if (tag == "/mc:Fallback")
          suppress = math.max(0, suppress - 1)
        else if (suppress > 0) () // nothing inside a fallback counts
        else if (inText && tag == "/a:t") inText = false
        else if (!inText && (tag == "a:t" || tag.startsWith("a:t ")))
          inText = !tag.endsWith("/") // self-closing = empty run
        else if (tag == "/a:p") sb.append('\n')
        else if (tag == "a:br" || tag == "a:br/" || tag.startsWith("a:br "))
          sb.append('\n')
        i = close + 1
      } else if (inText && suppress == 0) {
        i = Docx.appendEntityChar(xml, i, sb, mediaId)
      } else i += 1
    }
    require(!inText,
      s"media $mediaId: slide part ends inside an open <a:t> run (truncated)")
    val s = sb.result()
    if (s.nonEmpty && s.charAt(s.length - 1) == '\n') s.substring(0, s.length - 1)
    else s
  }

  // -- generator (staging/spec counterpart, the Docx.writeDocx rule) -----

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  private val NsA = "http://schemas.openxmlformats.org/drawingml/2006/main"
  private val NsP = "http://schemas.openxmlformats.org/presentationml/2006/main"
  private val NsR = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

  /** Serialize a minimal VALID `.pptx` for `slides` (one slide per
    * element, one `<a:p>` per `\n`-separated line, a single content
    * shape per slide). Deterministic bytes via [[Docx.writeZip]]. */
  def writePptx(slides: Seq[String]): Array[Byte] = {
    require(slides.nonEmpty, "writePptx needs at least one slide")
    val slideXml = slides.map { text =>
      val paras = text.split("\n", -1).map(p =>
        "<a:p><a:r><a:t>" + xmlEscape(p) + "</a:t></a:r></a:p>").mkString
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        s"""<p:sld xmlns:a="$NsA" xmlns:p="$NsP" xmlns:r="$NsR">""" +
        "<p:cSld><p:spTree>" +
        "<p:nvGrpSpPr><p:cNvPr id=\"1\" name=\"\"/><p:cNvGrpSpPr/><p:nvPr/></p:nvGrpSpPr>" +
        "<p:grpSpPr/>" +
        "<p:sp><p:nvSpPr><p:cNvPr id=\"2\" name=\"Content\"/><p:cNvSpPr/><p:nvPr/></p:nvSpPr>" +
        "<p:spPr/><p:txBody><a:bodyPr/><a:lstStyle/>" + paras +
        "</p:txBody></p:sp>" +
        "</p:spTree></p:cSld></p:sld>"
    }
    val n = slides.length
    val presentation =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        s"""<p:presentation xmlns:p="$NsP" xmlns:r="$NsR"><p:sldIdLst>""" +
        (1 to n).map(i =>
          s"""<p:sldId id="${255 + i}" r:id="rId$i"/>""").mkString +
        "</p:sldIdLst></p:presentation>"
    val presRels =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
        (1 to n).map(i =>
          s"""<Relationship Id="rId$i" Type="$NsR/slide" Target="slides/slide$i.xml"/>""").mkString +
        "</Relationships>"
    val contentTypes =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">" +
        "<Default Extension=\"rels\" ContentType=\"application/vnd.openxmlformats-package.relationships+xml\"/>" +
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/>" +
        "<Override PartName=\"/ppt/presentation.xml\" ContentType=\"application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml\"/>" +
        (1 to n).map(i =>
          "<Override PartName=\"/ppt/slides/slide" + i +
            ".xml\" ContentType=\"application/vnd.openxmlformats-officedocument.presentationml.slide+xml\"/>").mkString +
        "</Types>"
    val rels =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
        s"""<Relationship Id="rId1" Type="$NsR/officeDocument" Target="ppt/presentation.xml"/>""" +
        "</Relationships>"
    Docx.writeZip(
      Seq(
        "[Content_Types].xml" -> contentTypes.getBytes(UTF_8),
        "_rels/.rels" -> rels.getBytes(UTF_8),
        "ppt/presentation.xml" -> presentation.getBytes(UTF_8),
        "ppt/_rels/presentation.xml.rels" -> presRels.getBytes(UTF_8)) ++
        slideXml.zipWithIndex.map { case (xml, i) =>
          s"ppt/slides/slide${i + 1}.xml" -> xml.getBytes(UTF_8)
        })
  }
}
