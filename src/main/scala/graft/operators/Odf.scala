package graft.operators

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

/** Pure-JVM OpenDocument (ODF 1.2, OASIS) text extraction — the
  * LibreOffice/OpenOffice family completing the office tier next to
  * the OOXML trio ([[Docx]]/[[Xlsx]]/[[Pptx]]). One package shape
  * serves all three document kinds: a ZIP whose FIRST, STORED
  * `mimetype` entry names the kind and whose `content.xml` holds the
  * body — `office:text` paragraphs for `.odt`, `office:spreadsheet`
  * tables for `.ods`, `office:presentation` pages for `.odp` — so the
  * extractor walks `content.xml` once and dispatches on the body root,
  * not the extension.
  *
  * Same bounded-scan philosophy as the OOXML strips (shared [[Xml]]
  * primitives, no general parser): ordered `text:p`/`text:h` paragraph
  * framing; inside a paragraph the ODF whitespace elements REPLACE
  * their markup (`<text:s text:c="n"/>` → n spaces, `<text:tab/>` →
  * TAB, `<text:line-break/>` → newline — ODF collapses literal runs,
  * so these are the only faithful carriers), note/annotation bodies
  * drop whole, every other tag (spans, links, bookmarks) strips to its
  * content. Spreadsheets flatten like [[Xlsx]]: cells by TAB (repeat
  * attribute honored, trailing empties trimmed), rows by newline.
  *
  * Fail-loudly contract: no `content.xml`, unknown body root,
  * unterminated framing all throw with the media id; the warc bridge
  * degrades per record.
  *
  * Reference behavior: no office carriers in treynr/eggv
  * (eggv/retrieve.py ingests TSV text) — engine surface beyond the
  * reference, completing SURVEY.md's document-ingestion tier. */
object Odf {

  val OdtMime = "application/vnd.oasis.opendocument.text"
  val OdsMime = "application/vnd.oasis.opendocument.spreadsheet"
  val OdpMime = "application/vnd.oasis.opendocument.presentation"

  /** The stored `mimetype` entry of an ODF package, or None. */
  def packageMime(bytes: Array[Byte], mediaId: Long = -1L): Option[String] =
    try Docx.zipEntryOffsets(bytes, mediaId).collectFirst {
      case ("mimetype", cd) =>
        new String(Docx.zipEntryAt(bytes, cd, "mimetype", mediaId), US_ASCII).trim
    }.filter(_.startsWith("application/vnd.oasis.opendocument."))
    catch { case _: Exception => None }

  /** Visible text of an ODF package, dispatched on the body root. */
  def extractText(bytes: Array[Byte], mediaId: Long = -1L): String = {
    val entries = Docx.zipEntryOffsets(bytes, mediaId)
    val content = entries.find(_._1 == "content.xml").getOrElse(
      throw new IllegalArgumentException(
        s"media $mediaId: ZIP package without content.xml — not ODF"))
    val xml = new String(
      Docx.zipEntryAt(bytes, content._2, "content.xml", mediaId), UTF_8)
    val body = Xml.regions(xml, "office:body", mediaId).headOption.getOrElse(
      throw new IllegalArgumentException(
        s"media $mediaId: content.xml without office:body"))
    if (Xml.openAt(body, "office:text", 0) >= 0)
      paraRegions(Xml.regions(body, "office:text", mediaId).head, mediaId)
        .map(renderPara(_, mediaId)).mkString("\n")
    else if (Xml.openAt(body, "office:spreadsheet", 0) >= 0)
      sheetText(Xml.regions(body, "office:spreadsheet", mediaId).head, mediaId)
    else if (Xml.openAt(body, "office:presentation", 0) >= 0)
      Xml.regions(Xml.regions(body, "office:presentation", mediaId).head,
          "draw:page", mediaId)
        .map(page => paraRegions(page, mediaId)
          .map(renderPara(_, mediaId)).mkString("\n"))
        .mkString("\n")
    else throw new IllegalArgumentException(
      s"media $mediaId: office:body with no text/spreadsheet/presentation root")
  }

  /** Ordered `text:p` / `text:h` regions (interleaved document order —
    * separate per-tag passes would lose heading positions). */
  private def paraRegions(s: String, mediaId: Long): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    var continue = true
    while (continue) {
      val ap = Xml.openAt(s, "text:p", i)
      val ah = Xml.openAt(s, "text:h", i)
      val at = if (ap < 0) ah else if (ah < 0) ap else math.min(ap, ah)
      if (at < 0) continue = false
      else {
        val tag = if (at == ap) "text:p" else "text:h"
        val gt = s.indexOf('>', at)
        require(gt >= 0, s"media $mediaId: unterminated <$tag> tag")
        if (s.charAt(gt - 1) == '/') { out += ""; i = gt + 1 }
        else {
          // depth-balanced close: a note body may NEST a text:p inside
          // this paragraph — the first </text:p> is not necessarily ours
          val end = balancedClose(s, tag, gt + 1, mediaId)
          out += s.substring(gt + 1, end)
          i = end + tag.length + 3
        }
      }
    }
    out.result()
  }

  /** Start index of the closing tag matching an already-open `<tag>`,
    * counting nested (non-self-closing) reopenings. */
  private def balancedClose(s: String, tag: String, from: Int,
      mediaId: Long): Int = {
    var depth = 1
    var i = from
    while (true) {
      val close = s.indexOf("</" + tag + ">", i)
      require(close >= 0, s"media $mediaId: <$tag> without its closer")
      val open = Xml.openAt(s, tag, i)
      if (open >= 0 && open < close) {
        val gt = s.indexOf('>', open)
        require(gt >= 0, s"media $mediaId: unterminated <$tag> tag")
        if (s.charAt(gt - 1) != '/') depth += 1
        i = gt + 1
      } else {
        depth -= 1
        if (depth == 0) return close
        i = close + tag.length + 3
      }
    }
    -1 // unreachable
  }

  /** One paragraph region to text: whitespace elements replace their
    * markup, note/annotation bodies drop, other tags strip; the
    * remaining character data entity-decodes once at the end. */
  private def renderPara(r: String, mediaId: Long): String = {
    val dropWhole = Set("text:note", "office:annotation")
    val sb = new StringBuilder
    var i = 0
    while (i < r.length) {
      val c = r.charAt(i)
      if (c == '<') {
        val gt = r.indexOf('>', i)
        require(gt > i, s"media $mediaId: unterminated tag in paragraph")
        val inner = r.substring(i + 1, gt)
        val isClose = inner.startsWith("/")
        val selfClose = inner.endsWith("/")
        val name = {
          val t = if (isClose) inner.substring(1) else inner
          val sp = t.indexWhere(ch => ch == ' ' || ch == '\t' || ch == '\n' ||
            ch == '/')
          if (sp < 0) t else t.substring(0, sp)
        }
        if (!isClose && name == "text:s") {
          val n = attr(inner, "text:c").map(_.trim.toInt).getOrElse(1)
          require(n >= 0 && n <= 65535,
            s"media $mediaId: text:s count $n out of range")
          sb.append(" " * n)
          i = gt + 1
        } else if (!isClose && name == "text:tab") { sb.append('\t'); i = gt + 1 }
        else if (!isClose && name == "text:line-break") {
          sb.append('\n'); i = gt + 1
        } else if (!isClose && !selfClose && dropWhole.contains(name)) {
          val end = r.indexOf("</" + name + ">", gt + 1)
          require(end >= 0, s"media $mediaId: <$name> without its closer")
          i = end + name.length + 3
        } else i = gt + 1 // spans/links/bookmarks: markup strips
      } else { sb.append(c); i += 1 }
    }
    Xml.decode(sb.result(), mediaId)
  }

  /** Spreadsheet body: the [[Xlsx]] flattening — cells by TAB
    * (column-repeat honored, capped, trailing empties trimmed), rows
    * by newline, tables by newline. */
  private def sheetText(ss: String, mediaId: Long): String =
    Xml.regions(ss, "table:table", mediaId).map { tbl =>
      Xml.regions(tbl, "table:table-row", mediaId).map { row =>
        val cells = cellRegions(row, mediaId).flatMap { case (region, repeat) =>
          val text = paraRegions(region, mediaId)
            .map(renderPara(_, mediaId)).mkString("\n")
          Vector.fill(math.min(repeat, 1000))(text)
        }
        val trimmed = cells.reverse.dropWhile(_.isEmpty).reverse
        trimmed.mkString("\t")
      }.mkString("\n")
    }.mkString("\n")

  /** (region, repeat) of every cell in a row — real and covered,
    * self-closing forms included. */
  private def cellRegions(row: String, mediaId: Long): Vector[(String, Int)] = {
    val out = Vector.newBuilder[(String, Int)]
    var i = 0
    var continue = true
    while (continue) {
      val ar = Xml.openAt(row, "table:table-cell", i)
      val ac = Xml.openAt(row, "table:covered-table-cell", i)
      val at = if (ar < 0) ac else if (ac < 0) ar else math.min(ar, ac)
      if (at < 0) continue = false
      else {
        val tag = if (at == ar) "table:table-cell" else "table:covered-table-cell"
        val gt = row.indexOf('>', at)
        require(gt >= 0, s"media $mediaId: unterminated <$tag> tag")
        val open = row.substring(at + 1, gt)
        val repeat = attr(open, "table:number-columns-repeated")
          .map(_.trim.toInt).getOrElse(1)
        require(repeat >= 1, s"media $mediaId: non-positive column repeat")
        if (row.charAt(gt - 1) == '/') { out += (("", repeat)); i = gt + 1 }
        else {
          val end = balancedClose(row, tag, gt + 1, mediaId)
          out += ((row.substring(gt + 1, end), repeat))
          i = end + tag.length + 3
        }
      }
    }
    out.result()
  }

  /** `name="value"` on an opening tag's attribute string. */
  private def attr(open: String, name: String): Option[String] = {
    val at = open.indexOf(name + "=\"")
    if (at < 0) None
    else {
      val start = at + name.length + 2
      val end = open.indexOf('"', start)
      if (end < 0) None else Some(open.substring(start, end))
    }
  }

  // ---- writers (round-trip twins) -----------------------------------

  private def pkg(kind: String, contentBody: String): Array[Byte] = {
    val manifest =
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
        "<manifest:manifest xmlns:manifest=\"urn:oasis:names:tc:opendocument:xmlns:manifest:1.0\" manifest:version=\"1.2\">" +
        s"""<manifest:file-entry manifest:full-path="/" manifest:media-type="$kind"/>""" +
        "<manifest:file-entry manifest:full-path=\"content.xml\" manifest:media-type=\"text/xml\"/>" +
        "</manifest:manifest>"
    val content =
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
        "<office:document-content xmlns:office=\"urn:oasis:names:tc:opendocument:xmlns:office:1.0\" " +
        "xmlns:text=\"urn:oasis:names:tc:opendocument:xmlns:text:1.0\" " +
        "xmlns:table=\"urn:oasis:names:tc:opendocument:xmlns:table:1.0\" " +
        "xmlns:draw=\"urn:oasis:names:tc:opendocument:xmlns:drawing:1.0\" office:version=\"1.2\">" +
        s"<office:body>$contentBody</office:body></office:document-content>"
    Docx.writeZip(Seq(
      "mimetype" -> kind.getBytes(US_ASCII),
      "META-INF/manifest.xml" -> manifest.getBytes(UTF_8),
      "content.xml" -> content.getBytes(UTF_8)),
      stored = Set("mimetype"))
  }

  /** Encode text content: XML escape, then TAB/newline as their ODF
    * elements (literal runs would collapse). */
  private def enc(s: String): String =
    Xml.escape(s).replace("\t", "<text:tab/>").replace("\n", "<text:line-break/>")

  /** One `.odt`: a paragraph per element, alternating heading/span
    * wrapping so both strip paths are exercised. */
  def writeOdt(paragraphs: Seq[String]): Array[Byte] =
    pkg(OdtMime, "<office:text>" + paragraphs.zipWithIndex.map { case (p, i) =>
      (i % 3) match {
        case 0 => s"<text:h text:outline-level=\"1\">${enc(p)}</text:h>"
        case 1 => s"<text:p><text:span text:style-name=\"T1\">${enc(p)}</text:span></text:p>"
        case _ => s"<text:p>${enc(p)}</text:p>"
      }
    }.mkString + "</office:text>")

  /** One `.ods` with a single table. */
  def writeOds(rows: Seq[Seq[String]]): Array[Byte] =
    pkg(OdsMime, "<office:spreadsheet><table:table table:name=\"S1\">" +
      rows.map(r => "<table:table-row>" +
        r.map(c => s"<table:table-cell><text:p>${enc(c)}</text:p></table:table-cell>")
          .mkString + "</table:table-row>").mkString +
      "</table:table></office:spreadsheet>")

  /** One `.odp`: a page per slide, text in a frame's text box. */
  def writeOdp(slides: Seq[String]): Array[Byte] =
    pkg(OdpMime, "<office:presentation>" + slides.zipWithIndex.map {
      case (s, i) =>
        s"""<draw:page draw:name="page${i + 1}"><draw:frame><draw:text-box>""" +
          s"<text:p>${enc(s)}</text:p></draw:text-box></draw:frame></draw:page>"
    }.mkString + "</office:presentation>")
}
