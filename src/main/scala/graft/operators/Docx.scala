package graft.operators

import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM DOCX (OOXML, ECMA-376) text extraction — the fourth text
  * carrier after HTML, PDF, and WET. A `.docx` is a ZIP package whose
  * main part is `word/document.xml`; the visible text is the character
  * content of `<w:t>` runs, with `</w:p>` as the paragraph boundary.
  * Both layers are public layout: PKZIP's local-header/central-
  * directory structure (APPNOTE.TXT) and the WordprocessingML element
  * names. Same zero-native-deps rule as [[Pdf]]: `java.util.zip
  * .Inflater` is the whole codec dependency.
  *
  * The ZIP walk reads the CENTRAL directory (located via the
  * end-of-central-directory record), not the local headers alone — a
  * streaming writer that used data descriptors leaves zero sizes in
  * the local header, and only the central directory is authoritative.
  *
  * The XML strip is a bounded linear scan, not a general XML parser:
  * `<w:t>` content accumulates (with the five named entities and
  * numeric character references decoded), `</w:p>` appends a line
  * break, `<w:br/>`/`<w:tab/>` map to newline/tab, everything else —
  * attributes, formatting runs, section properties — is skipped by
  * tag framing alone. That is exactly the fidelity a curation corpus
  * needs, and nothing more.
  *
  * Fail-loudly contract ([[Multimodal]] codec rule): a payload without
  * a ZIP end record, a missing/truncated `word/document.xml`, an
  * unsupported compression method, or malformed entity syntax throws
  * `IllegalArgumentException` with the media id — callers bridge to
  * flagged rows at the ingestion boundary ([[graft.io.Warc
  * .toDocumentsDocx]]), the PDF tolerance pattern. */
object Docx {

  /** Visible text of a `.docx` payload, paragraphs joined by `\n`. */
  def extractText(bytes: Array[Byte], mediaId: Long = -1L): String =
    stripDocumentXml(
      new String(zipEntry(bytes, "word/document.xml", mediaId), UTF_8),
      mediaId)

  // -- ZIP package walk --------------------------------------------------

  private def zu16(b: Array[Byte], p: Int, mediaId: Long): Int = {
    require(p + 2 <= b.length, s"media $mediaId: truncated ZIP at byte $p")
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  }
  private def zu32(b: Array[Byte], p: Int, mediaId: Long): Long = {
    require(p + 4 <= b.length, s"media $mediaId: truncated ZIP at byte $p")
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  }

  private def zu64(b: Array[Byte], p: Int, mediaId: Long): Long = {
    require(p + 8 <= b.length, s"media $mediaId: truncated ZIP at byte $p")
    zu32(b, p, mediaId) | (zu32(b, p + 4, mediaId) << 32)
  }

  /** A ZIP64 64-bit value that must address THIS in-memory payload:
    * anything past Int range cannot be a valid offset/size here. */
  private def z64Int(v: Long, what: String, mediaId: Long): Long = {
    require(v >= 0 && v <= Int.MaxValue,
      s"media $mediaId: ZIP64 $what $v exceeds the in-memory payload range")
    v
  }

  /** Central-directory entries as (name, entryOffset) in directory
    * order — the shared resolution core of [[zipEntry]] and the
    * sheet-listing the XLSX walk needs. */
  private[graft] def zipEntryOffsets(b: Array[Byte],
      mediaId: Long): Vector[(String, Int)] = {
    require(b.length >= 22, s"media $mediaId: not a ZIP payload (too short)")
    // end-of-central-directory: PK\5\6, scanned back over a possible
    // trailing comment (bounded at the format's 64 KiB comment cap)
    var e = b.length - 22
    val stop = math.max(0, b.length - 22 - 0xffff)
    while (e >= stop && !(b(e) == 0x50 && b(e + 1) == 0x4b &&
        b(e + 2) == 0x05 && b(e + 3) == 0x06)) e -= 1
    require(e >= stop, s"media $mediaId: ZIP end-of-central-directory missing")
    var nEntries: Long = zu16(b, e + 10, mediaId)
    var cdOff: Long = zu32(b, e + 16, mediaId)
    // ZIP64 (APPNOTE §4.3.14/§4.3.15): an EOCD whose entry count or
    // offset saturates its field defers to the ZIP64 EOCD record,
    // located by the 20-byte locator immediately before the EOCD —
    // the >65,535-entries dump archives the crawl path actually meets
    if (nEntries == 0xffff || cdOff == 0xffffffffL) {
      val loc = e - 20
      require(loc >= 0 && zu32(b, loc, mediaId) == 0x07064b50L,
        s"media $mediaId: ZIP64 EOCD locator missing before the EOCD")
      val z = z64Int(zu64(b, loc + 8, mediaId), "EOCD offset", mediaId).toInt
      require(zu32(b, z, mediaId) == 0x06064b50L,
        s"media $mediaId: ZIP64 EOCD signature missing at $z")
      nEntries = zu64(b, z + 32, mediaId)
      require(nEntries <= Int.MaxValue,
        s"media $mediaId: ZIP64 entry count $nEntries out of range")
      cdOff = z64Int(zu64(b, z + 48, mediaId), "central-dir offset", mediaId)
    }
    require(cdOff < b.length,
      s"media $mediaId: ZIP central-directory offset $cdOff out of range")
    val out = Vector.newBuilder[(String, Int)]
    var p = cdOff.toInt
    var i = 0
    while (i < nEntries) {
      require(zu32(b, p, mediaId) == 0x02014b50L,
        s"media $mediaId: ZIP central-directory entry signature missing at $p")
      val nameLen = zu16(b, p + 28, mediaId)
      val extraLen = zu16(b, p + 30, mediaId)
      val commentLen = zu16(b, p + 32, mediaId)
      require(p + 46 + nameLen <= b.length,
        s"media $mediaId: ZIP entry name overruns")
      out += ((new String(b, p + 46, nameLen, UTF_8), p))
      p += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    out.result()
  }

  /** One central-directory entry's uncompressed bytes, read at its
    * local header with the directory's authoritative sizes. */
  private[graft] def zipEntryAt(b: Array[Byte], cdPos: Int, name: String,
      mediaId: Long): Array[Byte] = {
    val method = zu16(b, cdPos + 10, mediaId)
    var compSize = zu32(b, cdPos + 20, mediaId)
    var uncompSize = zu32(b, cdPos + 24, mediaId)
    var lhOff = zu32(b, cdPos + 42, mediaId)
    // ZIP64 extended-information extra field (id 0x0001): carries, in
    // order, replacement values for exactly the directory fields that
    // saturated their 32-bit slots (APPNOTE §4.5.3)
    if (compSize == 0xffffffffL || uncompSize == 0xffffffffL ||
        lhOff == 0xffffffffL) {
      val nameLen = zu16(b, cdPos + 28, mediaId)
      val extraLen = zu16(b, cdPos + 30, mediaId)
      var x = cdPos + 46 + nameLen
      val xEnd = x + extraLen
      var found = false
      while (x + 4 <= xEnd && !found) {
        val id = zu16(b, x, mediaId)
        val sz = zu16(b, x + 2, mediaId)
        if (id == 0x0001) {
          var f = x + 4
          if (uncompSize == 0xffffffffL) {
            uncompSize = z64Int(zu64(b, f, mediaId), "uncompressed size",
              mediaId); f += 8
          }
          if (compSize == 0xffffffffL) {
            compSize = z64Int(zu64(b, f, mediaId), "compressed size",
              mediaId); f += 8
          }
          if (lhOff == 0xffffffffL) {
            lhOff = z64Int(zu64(b, f, mediaId), "local-header offset",
              mediaId); f += 8
          }
          found = true
        } else x += 4 + sz
      }
      require(found,
        s"media $mediaId: ZIP entry '$name' saturates 32-bit fields " +
          "but carries no ZIP64 extra field")
    }
    val lh = lhOff.toInt
    require(zu32(b, lh, mediaId) == 0x04034b50L,
      s"media $mediaId: ZIP local-header signature missing at $lh")
    val dataAt = lh + 30 + zu16(b, lh + 26, mediaId) + zu16(b, lh + 28, mediaId)
    require(dataAt + compSize <= b.length,
      s"media $mediaId: ZIP entry '$name' data overruns the payload")
    method match {
      case 0 =>
        require(compSize == uncompSize,
          s"media $mediaId: stored ZIP entry with mismatched sizes")
        java.util.Arrays.copyOfRange(b, dataAt, dataAt + compSize.toInt)
      case 8 => inflateRaw(b, dataAt, compSize.toInt, uncompSize.toInt, mediaId)
      case m => throw new IllegalArgumentException(
        s"media $mediaId: unsupported ZIP compression method $m")
    }
  }

  /** One named entry's uncompressed bytes, resolved through the central
    * directory (authoritative sizes) and read at its local header. */
  private[graft] def zipEntry(b: Array[Byte], name: String,
      mediaId: Long): Array[Byte] =
    zipEntryOffsets(b, mediaId).find(_._1 == name)
      .map { case (_, cdPos) => zipEntryAt(b, cdPos, name, mediaId) }
      .getOrElse(throw new IllegalArgumentException(
        s"media $mediaId: ZIP package without '$name' — not the " +
          "expected OOXML package kind"))

  private def inflateRaw(b: Array[Byte], at: Int, compLen: Int,
      uncompLen: Int, mediaId: Long): Array[Byte] = {
    val inf = new Inflater(true) // ZIP entries are headerless deflate
    inf.setInput(b, at, compLen)
    val out = new Array[Byte](uncompLen)
    var got = 0
    try {
      while (got < uncompLen && !inf.finished()) {
        val n = inf.inflate(out, got, uncompLen - got)
        require(n > 0 || inf.finished(),
          s"media $mediaId: ZIP deflate stream stalled (truncated entry)")
        got += n
      }
    } finally inf.end()
    require(got == uncompLen,
      s"media $mediaId: ZIP entry inflated to $got of $uncompLen bytes")
    out
  }

  // -- WordprocessingML text strip ---------------------------------------

  /** Bounded text strip of a `document.xml` string (see object doc).
    * Two suppression regions keep foreign-writer markup honest:
    * property blocks (`w:pPr`/`w:rPr` — a paragraph's TAB-STOP
    * definitions are `<w:tab/>` elements inside `w:pPr/w:tabs`, which
    * must not emit tab characters) and `mc:Fallback` (the
    * AlternateContent fallback DUPLICATES its sibling Choice's runs —
    * collecting both would double the text). */
  private[graft] def stripDocumentXml(xml: String, mediaId: Long): String = {
    val sb = new StringBuilder
    var i = 0
    var inText = false
    var suppress = 0 // nesting depth of w:pPr / w:rPr / mc:Fallback
    while (i < xml.length) {
      if (xml.charAt(i) == '<') {
        val close = xml.indexOf('>', i)
        require(close > i,
          s"media $mediaId: unterminated tag in document.xml at $i")
        val tag = xml.substring(i + 1, close)
        def opens(name: String): Boolean =
          (tag == name || tag.startsWith(name + " ")) && !tag.endsWith("/")
        if (opens("w:pPr") || opens("w:rPr") || opens("mc:Fallback"))
          suppress += 1
        else if (tag == "/w:pPr" || tag == "/w:rPr" || tag == "/mc:Fallback")
          suppress = math.max(0, suppress - 1)
        else if (suppress > 0) () // nothing inside a suppressed region counts
        else if (inText && tag == "/w:t") inText = false
        else if (!inText && (tag == "w:t" || tag.startsWith("w:t ")))
          inText = !tag.endsWith("/") // self-closing = empty run
        else if (tag == "/w:p") sb.append('\n')
        else if (tag == "w:br" || tag == "w:br/" || tag.startsWith("w:br "))
          sb.append('\n')
        else if (tag == "w:tab" || tag == "w:tab/" || tag.startsWith("w:tab "))
          sb.append('\t')
        i = close + 1
      } else if (inText && suppress == 0) {
        val c = xml.charAt(i)
        if (c == '&') {
          val semi = xml.indexOf(';', i)
          require(semi > i && semi - i <= 10,
            s"media $mediaId: malformed XML entity in document.xml at $i")
          val ent = xml.substring(i + 1, semi)
          sb.append(ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case e if e.length > 2 && (e.charAt(0) == '#') &&
                (e.charAt(1) == 'x' || e.charAt(1) == 'X') =>
              new String(Character.toChars(Integer.parseInt(e.substring(2), 16)))
            case e if e.length > 1 && e.charAt(0) == '#' =>
              new String(Character.toChars(e.substring(1).toInt))
            case e => throw new IllegalArgumentException(
              s"media $mediaId: unknown XML entity &$e; in document.xml")
          })
          i = semi + 1
        } else { sb.append(c); i += 1 }
      } else i += 1
    }
    require(!inText,
      s"media $mediaId: document.xml ends inside an open <w:t> run (truncated)")
    // each </w:p> appended a break; the final paragraph's is not a
    // separator — drop exactly one so n paragraphs join with n-1 breaks
    val s = sb.result()
    if (s.nonEmpty && s.charAt(s.length - 1) == '\n') s.substring(0, s.length - 1)
    else s
  }

  /** One character of run text into `sb` with the shared OOXML entity
    * rules (the five named entities plus decimal/hex character
    * references; anything else fails loudly); returns the next scan
    * position. The [[Pptx]] slide strip shares this decoder — the
    * [[Xlsx]] scanner carries a structurally identical private copy
    * predating it. */
  private[graft] def appendEntityChar(xml: String, i: Int,
      sb: StringBuilder, mediaId: Long): Int = {
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

  // -- generator (staging/spec counterpart, the Pdf.writeTextPdf rule) ---

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  /** Serialize a minimal VALID `.docx` for `text` (one `<w:p>` per
    * `\n`-separated line, `xml:space="preserve"` runs) — the staging
    * counterpart of [[extractText]] for oracled round-trip queries.
    * Deterministic bytes: fixed timestamps, fixed entry order, real
    * deflate + CRC-32 central directory. */
  def writeDocx(text: String): Array[Byte] = {
    val body = text.split("\n", -1).map(p =>
      "<w:p><w:r><w:t xml:space=\"preserve\">" + xmlEscape(p) +
        "</w:t></w:r></w:p>").mkString
    val documentXml =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\">" +
        "<w:body>" + body + "</w:body></w:document>"
    val contentTypes =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">" +
        "<Default Extension=\"rels\" ContentType=\"application/vnd.openxmlformats-package.relationships+xml\"/>" +
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/>" +
        "<Override PartName=\"/word/document.xml\" ContentType=\"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml\"/>" +
        "</Types>"
    val rels =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
        "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument\" Target=\"word/document.xml\"/>" +
        "</Relationships>"
    writeZip(Seq(
      "[Content_Types].xml" -> contentTypes.getBytes(UTF_8),
      "_rels/.rels" -> rels.getBytes(UTF_8),
      "word/document.xml" -> documentXml.getBytes(UTF_8)))
  }

  /** Deterministic ZIP writer: deflated entries, local headers with
    * real sizes (no data descriptors), central directory + EOCD.
    * Entry names in `stored` are written UNCOMPRESSED (method 0) — the
    * OCF rule for EPUB's `mimetype`, which must be stored so byte 30
    * onward spells the media type for magic-sniffers. */
  private[graft] def writeZip(entries: Seq[(String, Array[Byte])],
      stored: Set[String] = Set.empty): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    val central = new java.io.ByteArrayOutputStream()
    def c16(v: Int): Unit = { central.write(v & 0xff); central.write((v >> 8) & 0xff) }
    def c32(v: Long): Unit = {
      central.write((v & 0xff).toInt); central.write(((v >> 8) & 0xff).toInt)
      central.write(((v >> 16) & 0xff).toInt); central.write(((v >> 24) & 0xff).toInt)
    }
    entries.foreach { case (name, data) =>
      val nameB = name.getBytes(UTF_8)
      val crc = new CRC32(); crc.update(data)
      val method = if (stored.contains(name)) 0 else 8
      val comp =
        if (method == 0) data
        else {
          val def_ = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
          def_.setInput(data); def_.finish()
          val cbuf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          while (!def_.finished()) cbuf.write(tmp, 0, def_.deflate(tmp))
          def_.end()
          cbuf.toByteArray
        }
      val lhOff = out.size().toLong
      w32(0x04034b50L); w16(20); w16(0); w16(method) // sig, version, flags
      w16(0); w16(0x21) // fixed mod time/date (determinism)
      w32(crc.getValue); w32(comp.length.toLong); w32(data.length.toLong)
      w16(nameB.length); w16(0)
      out.write(nameB); out.write(comp)
      c32(0x02014b50L); c16(20); c16(20); c16(0); c16(method)
      c16(0); c16(0x21)
      c32(crc.getValue); c32(comp.length.toLong); c32(data.length.toLong)
      c16(nameB.length); c16(0); c16(0) // name, extra, comment lens
      c16(0); c16(0); c32(0L) // disk, internal attrs, external attrs
      c32(lhOff)
      central.write(nameB)
    }
    val cdOff = out.size().toLong
    val cd = central.toByteArray
    out.write(cd)
    w32(0x06054b50L); w16(0); w16(0)
    w16(entries.length); w16(entries.length)
    w32(cd.length.toLong); w32(cdOff); w16(0)
    out.toByteArray
  }

  /** ZIP64-forced staging twin of [[writeZip]]: every central entry
    * saturates its 32-bit size/offset slots (0xFFFFFFFF) and carries
    * the real values in the 0x0001 extended-information extra field,
    * and the EOCD saturates its count/offset slots deferring to a
    * ZIP64 EOCD record + locator — the layout dump writers emit for
    * >4 GiB archives and >65,535-member dumps, exercised here at small
    * sizes (the markers, not the magnitudes, are what the walker must
    * honor). Data stays STORED so entry bytes round-trip verbatim. */
  private[graft] def writeZip64(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def w64(v: Long): Unit = { w32(v & 0xffffffffL); w32(v >>> 32) }
    val central = new java.io.ByteArrayOutputStream()
    def c16(v: Int): Unit = { central.write(v & 0xff); central.write((v >> 8) & 0xff) }
    def c32(v: Long): Unit = {
      central.write((v & 0xff).toInt); central.write(((v >> 8) & 0xff).toInt)
      central.write(((v >> 16) & 0xff).toInt); central.write(((v >> 24) & 0xff).toInt)
    }
    def c64(v: Long): Unit = { c32(v & 0xffffffffL); c32(v >>> 32) }
    entries.foreach { case (name, data) =>
      val nameB = name.getBytes(UTF_8)
      val crc = new CRC32(); crc.update(data)
      val lhOff = out.size().toLong
      w32(0x04034b50L); w16(45); w16(0); w16(0) // version 4.5, stored
      w16(0); w16(0x21)
      w32(crc.getValue); w32(data.length.toLong); w32(data.length.toLong)
      w16(nameB.length); w16(0)
      out.write(nameB); out.write(data)
      c32(0x02014b50L); c16(45); c16(45); c16(0); c16(0)
      c16(0); c16(0x21)
      c32(crc.getValue); c32(0xffffffffL); c32(0xffffffffL) // → extra
      c16(nameB.length); c16(4 + 24); c16(0)
      c16(0); c16(0); c32(0L)
      c32(0xffffffffL) // local-header offset → extra
      central.write(nameB)
      c16(0x0001); c16(24) // ZIP64 extra: uncomp, comp, lhOff
      c64(data.length.toLong); c64(data.length.toLong); c64(lhOff)
    }
    val cdOff = out.size().toLong
    val cd = central.toByteArray
    out.write(cd)
    val z64At = out.size().toLong
    w32(0x06064b50L); w64(44L) // ZIP64 EOCD, size of remainder
    w16(45); w16(45); w32(0L); w32(0L)
    w64(entries.length.toLong); w64(entries.length.toLong)
    w64(cd.length.toLong); w64(cdOff)
    w32(0x07064b50L); w32(0L); w64(z64At); w32(1L) // locator
    w32(0x06054b50L); w16(0); w16(0)
    w16(0xffff); w16(0xffff)
    w32(0xffffffffL); w32(0xffffffffL); w16(0)
    out.toByteArray
  }
}
