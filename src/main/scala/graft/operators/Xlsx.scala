package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

/** Pure-JVM XLSX (SpreadsheetML, ECMA-376) text extraction — the
  * tabular sibling of [[Docx]], riding the same ZIP central-directory
  * walk. A worksheet's visible values live in two places: string cells
  * point (`t="s"`) into the `xl/sharedStrings.xml` pool, while numbers,
  * inline strings (`t="inlineStr"`), and formula results (`t="str"`)
  * carry their value in the cell itself. Extraction renders each sheet
  * as text lines — cells joined by TAB, rows by newline, sheets by
  * newline — exactly the flattening a training corpus wants from
  * tabular documents.
  *
  * Same bounded-scan philosophy as the [[Docx]] strip: `<row>`/`<c>`/
  * `<v>`/`<is><t>` framing plus the `t=` type attribute, no general
  * XML parser, the five named entities and numeric character
  * references decoded via the shared [[Docx]] entity rules.
  *
  * Fail-loudly contract: no sheet entries, a shared-string index out
  * of range, malformed framing, or a truncated package throw
  * `IllegalArgumentException` with the media id; the warc bridge
  * ([[graft.io.Warc.toDocumentsXlsx]]) degrades those to flagged rows. */
object Xlsx {

  /** Visible cell text of every worksheet, in workbook entry order. */
  def extractText(bytes: Array[Byte], mediaId: Long = -1L): String = {
    val entries = Docx.zipEntryOffsets(bytes, mediaId)
    val shared: Vector[String] =
      entries.find(_._1 == "xl/sharedStrings.xml")
        .map { case (name, cd) =>
          parseSharedStrings(
            new String(Docx.zipEntryAt(bytes, cd, name, mediaId), UTF_8),
            mediaId)
        }
        .getOrElse(Vector.empty)
    val sheets = entries.filter { case (n, _) =>
      n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml")
    }.sortBy(_._1)
    require(sheets.nonEmpty,
      s"media $mediaId: ZIP package without xl/worksheets/ — not an XLSX")
    sheets.map { case (name, cd) =>
      parseSheet(
        new String(Docx.zipEntryAt(bytes, cd, name, mediaId), UTF_8),
        shared, mediaId)
    }.mkString("\n")
  }

  /** The `<si>` pool: each item's `<t>` runs concatenated (rich-text
    * items split one string over several runs). */
  private[graft] def parseSharedStrings(xml: String,
      mediaId: Long): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    var cur: StringBuilder = null
    var inT = false
    while (i < xml.length) {
      if (xml.charAt(i) == '<') {
        val close = xml.indexOf('>', i)
        require(close > i,
          s"media $mediaId: unterminated tag in sharedStrings.xml at $i")
        val tag = xml.substring(i + 1, close)
        if (tag == "si" || tag.startsWith("si ")) cur = new StringBuilder
        else if (tag == "/si") { out += cur.result(); cur = null }
        else if (cur != null && (tag == "t" || tag.startsWith("t ")))
          inT = !tag.endsWith("/")
        else if (tag == "/t") inT = false
        i = close + 1
      } else if (inT && cur != null) {
        i = appendChar(xml, i, cur, mediaId)
      } else i += 1
    }
    require(cur == null, s"media $mediaId: sharedStrings.xml ends inside <si>")
    out.result()
  }

  /** One worksheet's `sheetData`: rows to lines, cells to TAB-joined
    * values. Cell types: `s` shared-string index, `inlineStr` an
    * embedded `<is><t>` run, everything else (numbers, booleans,
    * `str` formula results) the literal `<v>` content. */
  private[graft] def parseSheet(xml: String, shared: Vector[String],
      mediaId: Long): String = {
    val lines = Vector.newBuilder[String]
    var cells: scala.collection.mutable.ArrayBuffer[String] = null
    var cellType: String = null // non-null while inside a <c> element
    var cellFilled = false
    var buf: StringBuilder = null // collecting <v> or inline <t> content
    var inValue = false
    var i = 0
    while (i < xml.length) {
      if (xml.charAt(i) == '<') {
        val close = xml.indexOf('>', i)
        require(close > i,
          s"media $mediaId: unterminated tag in a worksheet at $i")
        val tag = xml.substring(i + 1, close)
        if (tag == "row" || tag.startsWith("row "))
          cells = scala.collection.mutable.ArrayBuffer.empty[String]
        else if (tag == "/row") { lines += cells.mkString("\t"); cells = null }
        else if (cells != null && (tag == "c" || tag.startsWith("c "))) {
          if (tag.endsWith("/")) cells += "" // self-closing empty cell
          else { cellType = attr(tag, "t").getOrElse(""); cellFilled = false }
        } else if (tag == "/c") {
          if (!cellFilled) cells += "" // <c> carrying no <v>/<is> value
          cellType = null
        } else if (cellType != null && tag == "v") {
          buf = new StringBuilder; inValue = true
        } else if (cellType != null && (tag == "t" || tag.startsWith("t "))) {
          buf = new StringBuilder; inValue = !tag.endsWith("/")
          if (!inValue) { cells += ""; cellFilled = true; buf = null } // empty run
        } else if ((tag == "/v" || tag == "/t") && inValue) {
          inValue = false
          val v = buf.result(); buf = null
          cells += (cellType match {
            case "s" =>
              val idx = v.trim.toInt
              require(idx >= 0 && idx < shared.length,
                s"media $mediaId: shared-string index $idx out of range " +
                  s"(pool has ${shared.length})")
              shared(idx)
            case _ => v // inlineStr runs, numbers, booleans, str results
          })
          cellFilled = true
        }
        i = close + 1
      } else if (inValue && buf != null) {
        i = appendChar(xml, i, buf, mediaId)
      } else i += 1
    }
    require(cells == null, s"media $mediaId: worksheet ends inside <row>")
    lines.result().mkString("\n")
  }

  /** `t="…"` style attribute lookup inside a raw tag string. */
  private def attr(tag: String, name: String): Option[String] = {
    val key = " " + name + "=\""
    val at = tag.indexOf(key)
    if (at < 0) None
    else {
      val end = tag.indexOf('"', at + key.length)
      if (end < 0) None else Some(tag.substring(at + key.length, end))
    }
  }

  /** One character of text content into `sb` (entities decoded with
    * the [[Docx]] rules); returns the next scan position. */
  private def appendChar(xml: String, i: Int, sb: StringBuilder,
      mediaId: Long): Int = {
    val c = xml.charAt(i)
    if (c == '&') {
      val semi = xml.indexOf(';', i)
      require(semi > i && semi - i <= 10,
        s"media $mediaId: malformed XML entity at $i")
      val ent = xml.substring(i + 1, semi)
      sb.append(ent match {
        case "amp" => "&"
        case "lt" => "<"
        case "gt" => ">"
        case "quot" => "\""
        case "apos" => "'"
        case e if e.length > 2 && e.charAt(0) == '#' &&
            (e.charAt(1) == 'x' || e.charAt(1) == 'X') =>
          new String(Character.toChars(Integer.parseInt(e.substring(2), 16)))
        case e if e.length > 1 && e.charAt(0) == '#' =>
          new String(Character.toChars(e.substring(1).toInt))
        case e => throw new IllegalArgumentException(
          s"media $mediaId: unknown XML entity &$e;")
      })
      semi + 1
    } else { sb.append(c); i + 1 }
  }

  // -- generator (staging/spec counterpart, the Docx.writeDocx rule) -----

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  private def colRef(c: Int): String = {
    // 0 → A, 25 → Z, 26 → AA … (the spreadsheet base-26-with-no-zero)
    var n = c + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.result()
  }

  /** Serialize a minimal VALID `.xlsx` for `rows` (one sheet, every
    * cell a shared string — repeated values share one pool slot, which
    * is exactly the structure the extractor's index path exercises). */
  def writeXlsx(rows: Seq[Seq[String]]): Array[Byte] = {
    val pool = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    rows.foreach(_.foreach(v => pool.getOrElseUpdate(v, pool.size)))
    val sst =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${rows.map(_.size).sum}" uniqueCount="${pool.size}">""" +
        pool.keysIterator.map(v =>
          "<si><t xml:space=\"preserve\">" + xmlEscape(v) + "</t></si>")
          .mkString + "</sst>"
    val sheet =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>" +
        rows.zipWithIndex.map { case (cs, r) =>
          s"""<row r="${r + 1}">""" + cs.zipWithIndex.map { case (v, c) =>
            s"""<c r="${colRef(c)}${r + 1}" t="s"><v>${pool(v)}</v></c>"""
          }.mkString + "</row>"
        }.mkString + "</sheetData></worksheet>"
    val workbook =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<workbook xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\" xmlns:r=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships\">" +
        "<sheets><sheet name=\"Sheet1\" sheetId=\"1\" r:id=\"rId1\"/></sheets></workbook>"
    val contentTypes =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">" +
        "<Default Extension=\"rels\" ContentType=\"application/vnd.openxmlformats-package.relationships+xml\"/>" +
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/>" +
        "<Override PartName=\"/xl/workbook.xml\" ContentType=\"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml\"/>" +
        "<Override PartName=\"/xl/worksheets/sheet1.xml\" ContentType=\"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml\"/>" +
        "<Override PartName=\"/xl/sharedStrings.xml\" ContentType=\"application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml\"/>" +
        "</Types>"
    val rels =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
        "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument\" Target=\"xl/workbook.xml\"/>" +
        "</Relationships>"
    val wbRels =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
        "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet\" Target=\"worksheets/sheet1.xml\"/>" +
        "<Relationship Id=\"rId2\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings\" Target=\"sharedStrings.xml\"/>" +
        "</Relationships>"
    Docx.writeZip(Seq(
      "[Content_Types].xml" -> contentTypes.getBytes(UTF_8),
      "_rels/.rels" -> rels.getBytes(UTF_8),
      "xl/workbook.xml" -> workbook.getBytes(UTF_8),
      "xl/_rels/workbook.xml.rels" -> wbRels.getBytes(UTF_8),
      "xl/sharedStrings.xml" -> sst.getBytes(UTF_8),
      "xl/worksheets/sheet1.xml" -> sheet.getBytes(UTF_8)))
  }
}
