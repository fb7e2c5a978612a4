package graft.operators

import java.util.zip.Inflater

/** Pure-JVM PDF text extraction — the `application/pdf` face of crawl
  * ingestion. HTML responses flow through `TextFunctions.htmlToText` and
  * media through the [[Multimodal]] codecs; PDF is the one remaining
  * high-volume TEXT carrier in a real crawl (papers, reports, manuals),
  * and this extractor turns those payloads into curate-ready documents
  * with zero native dependencies: `java.util.zip.Inflater` for
  * FlateDecode (the ubiquitous content-stream filter) and byte
  * arithmetic for everything else, same as the PNG/FLAC codecs.
  *
  * Coverage — the format subset that dominates text-bearing PDFs in the
  * wild (PDF 1.0–1.7 structural features, ISO 32000 is public):
  *
  *   - content streams stored raw or behind the text-stream filters of
  *     §7.4 — `/FlateDecode`, `/LZWDecode` (TIFF variant, both
  *     `/EarlyChange` settings), `/ASCIIHexDecode`, `/ASCII85Decode` —
  *     singly or CHAINED (`[/ASCII85Decode /FlateDecode]`); direct OR
  *     indirect `/Length`;
  *   - text-showing operators `Tj`, `'`, `"`, and `TJ` arrays (kerning
  *     numbers skipped; a kern gap ≤ −180 text-space units — more than
  *     half an em at any sane font size — reads as a synthesized space,
  *     the standard heuristic for extractors without glyph metrics);
  *   - literal strings with the full escape battery (`\n \r \t \b \f
  *     \( \) \\`, octal `\ooo`, backslash line continuations, nested
  *     parens) and hex strings (odd length zero-padded per spec);
  *   - line structure from the text-positioning operators: `T*`, `'`,
  *     `"`, and `Td`/`TD` with a non-zero vertical component emit a
  *     newline between shows (the first positioning op of a text object
  *     only PLACES the first line); separate `BT…ET` objects and
  *     separate content streams join with a newline;
  *   - inline images (`BI…ID…EI`) and embedded dictionaries are skipped
  *     as opaque spans; streams whose dict declares an image filter
  *     (`/DCTDecode`, …) or a structural type (`/ObjStm`, `/XRef`,
  *     `/Metadata`, font files) are not content and are never
  *     text-scanned;
  *   - simple-font shown strings carrying a UTF-16BE BOM (`FE FF` —
  *     the §7.9.2.2 text-string convention some producers emit into
  *     content) decode as UTF-16BE instead of mojibake.
  *
  * String bytes accumulate raw and decode UTF-8 at the end (ASCII PDFs —
  * the overwhelming majority — are unaffected; our own generator
  * round-trips any UTF-8 text; other producers' non-ASCII simple-font
  * PDFs degrade to replacement chars rather than throwing — mojibake
  * degrades quality scores downstream, the same documented tradeoff as
  * WET's UTF-8 decode).
  *
  * Composite-font (CID/Type0) PDFs — most modern generators — carry a
  * `/ToUnicode` CMap (ISO 32000 §9.10.3) precisely so extractors can
  * recover text: before interpretation, every `/Font` resource name is
  * resolved to its font object, and a Type0 font with a ToUnicode
  * stream gets its `bfchar`/`bfrange` mappings parsed
  * ([[parseToUnicodeCMap]]). The interpreter tracks the current font
  * via `Tf`; strings shown under a mapped font decode code-by-code
  * (width from the codespacerange, 2 bytes for Identity-H) to the
  * mapped Unicode, unmapped codes to U+FFFD. Fonts WITHOUT a ToUnicode
  * CMap keep the old path: garbage-in-garbage-out text but no crash —
  * the quality gate is the downstream filter, per the curation design.
  *
  * Fail-loudly contract (the [[Multimodal]] codec rule): not-a-PDF and
  * encrypted documents throw `IllegalArgumentException` — a silently
  * empty text for an encrypted doc would read as "no text" and poison
  * dedup statistics; a corrupt Flate stream surfaces the underlying
  * `DataFormatException` wrapped with the media id.
  */
object Pdf {

  /** Extracted text of one PDF payload. Empty string is a VALID result
    * (a pure-image PDF has no text layer); malformed input throws. */
  def extractText(bytes0: Array[Byte], mediaId: Long = -1L): String = {
    require(bytes0.length >= 8 && startsWith(bytes0, 0, "%PDF-"),
      s"media $mediaId: not a PDF payload (missing %PDF- header)")
    // the standard-handler empty-user-password class decrypts to a
    // plaintext equivalent ([[PdfCrypt]]); everything else encrypted
    // stays the loud failure below
    val bytes = PdfCrypt.decryptStandard(bytes0, mediaId)
    requireNotEncrypted(bytes, mediaId)
    val fonts = toUnicodeMaps(bytes, mediaId)
    val out = new StringBuilder
    var from = 0
    var streamAt = indexOf(bytes, "stream", from)
    while (streamAt >= 0) {
      // `endstream`/`ObjStm` etc. also contain the letters "stream" —
      // accept only the standalone keyword
      val kwOk = isTokenBoundary(bytes, streamAt - 1) &&
        !precededBy(bytes, streamAt, "end")
      var next = streamAt + 6
      if (kwOk) {
        val dict = dictBefore(bytes, streamAt)
        val dataStart = afterStreamKeyword(bytes, streamAt)
        if (dataStart >= 0 && isTextCandidate(dict)) {
          val len = declaredLength(bytes, dict)
          val dataEnd = len match {
            case Some(n) if dataStart + n <= bytes.length => dataStart + n
            case _ => // damaged or indirect-unresolvable Length: scan
              val e = indexOf(bytes, "endstream", dataStart)
              if (e < 0) bytes.length else trimEol(bytes, e)
          }
          val data = decodeStream(bytes, dataStart, dataEnd, dict, mediaId)
          if (hasBtToken(data)) {
            val text = extractContentText(data, mediaId, fonts)
            if (text.nonEmpty) {
              if (out.nonEmpty) out.append('\n')
              out.append(text)
            }
          }
          next = math.max(next, dataEnd)
        }
      }
      from = next
      streamAt = indexOf(bytes, "stream", from)
    }
    out.toString
  }

  /** Document metadata — the provenance face of the PDF tier: curated
    * `/Info` dictionary keys (Title/Author/Subject/Keywords/Creator/
    * Producer/CreationDate/ModDate) plus `PageCount` from the root
    * page tree. Both string forms decode (literal with the full
    * escape set, hex), BOM-prefixed UTF-16BE honored, everything else
    * PDFDocEncoding-as-Latin-1 (the printable range coincides). PDF
    * date strings (`D:YYYYMMDDHHMMSS` with optional `Z`/`±HH'mm'`
    * offset, shorter prefixes zero-padded per spec defaults)
    * normalize to ISO-8601; a non-`D:` date stays verbatim (Info
    * dates are producer-written free text in the wild). The LAST
    * `/Info` reference wins (incremental updates append). A PDF
    * without `/Info` yields just `PageCount` — absence, not error; a
    * dangling reference or malformed string framing throws. */
  def pdfInfo(bytes0: Array[Byte], mediaId: Long = -1L): Map[String, String] = {
    require(bytes0.length >= 8 && startsWith(bytes0, 0, "%PDF-"),
      s"media $mediaId: not a PDF payload (missing %PDF- header)")
    val bytes = PdfCrypt.decryptStandard(bytes0, mediaId)
    requireNotEncrypted(bytes, mediaId)
    val doc = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val infoRef = "/Info\\s+(\\d+)\\s+\\d+\\s+R".r
      .findAllMatchIn(doc).toSeq.lastOption
    infoRef.foreach { m =>
      val num = m.group(1).toInt
      val body = objBody(doc, num).getOrElse(throw new IllegalArgumentException(
        s"media $mediaId: dangling /Info reference to object $num"))
      val bb = body.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      for (key <- InfoKeys) {
        val kAt = "/" + key + "(?![A-Za-z])"
        kAt.r.findFirstMatchIn(body).foreach { km =>
          var i = km.end
          while (i < bb.length && (bb(i) == ' ' || bb(i) == '\r' ||
            bb(i) == '\n' || bb(i) == '\t')) i += 1
          require(i < bb.length, s"media $mediaId: /Info $key without value")
          val raw = bb(i) match {
            case '(' => parseLiteralString(bb, i, mediaId)._1
            case '<' if i + 1 < bb.length && bb(i + 1) != '<' =>
              parseHexString(bb, i, mediaId)._1
            case _ => throw new IllegalArgumentException(
              s"media $mediaId: /Info $key is not a string")
          }
          val s =
            if (raw.length >= 2 && (raw(0) & 0xff) == 0xfe &&
              (raw(1) & 0xff) == 0xff)
              new String(raw, 2, raw.length - 2,
                java.nio.charset.StandardCharsets.UTF_16BE)
            else new String(raw,
              java.nio.charset.StandardCharsets.ISO_8859_1)
          out(key) =
            if (key == "CreationDate" || key == "ModDate") normDate(s)
            else s
        }
      }
    }
    out("PageCount") = pageCount(doc, mediaId).toString
    out.toMap
  }

  private val InfoKeys = Seq("Title", "Author", "Subject", "Keywords",
    "Creator", "Producer", "CreationDate", "ModDate")

  /** `D:`-prefixed date → ISO-8601 (missing trailing fields default to
    * 01/00 per §7.9.4); anything else verbatim. */
  private def normDate(s: String): String = {
    val m = ("^D:(\\d{4})(\\d{2})?(\\d{2})?(\\d{2})?(\\d{2})?(\\d{2})?" +
      "(Z|[+-]\\d{2}'\\d{2}'?)?$").r.findFirstMatchIn(s)
    m match {
      case None => s
      case Some(g) =>
        def p(k: Int, dflt: String) = Option(g.group(k)).getOrElse(dflt)
        val off = Option(g.group(7)).map {
          case "Z" => "Z"
          case o => o.substring(0, 3) + ":" + o.substring(4, 6)
        }.getOrElse("")
        s"${g.group(1)}-${p(2, "01")}-${p(3, "01")}T" +
          s"${p(4, "00")}:${p(5, "00")}:${p(6, "00")}$off"
    }
  }

  /** Root page tree's `/Count` (the trailer's LAST `/Root`, its
    * `/Pages` child). */
  private def pageCount(doc: String, mediaId: Long): Int = {
    val root = "/Root\\s+(\\d+)\\s+\\d+\\s+R".r
      .findAllMatchIn(doc).toSeq.lastOption.getOrElse(
        throw new IllegalArgumentException(
          s"media $mediaId: PDF without /Root")).group(1).toInt
    val cat = objBody(doc, root).getOrElse(throw new IllegalArgumentException(
      s"media $mediaId: dangling /Root reference to object $root"))
    val pages = "/Pages\\s+(\\d+)\\s+\\d+\\s+R".r.findFirstMatchIn(cat)
      .getOrElse(throw new IllegalArgumentException(
        s"media $mediaId: catalog without /Pages")).group(1).toInt
    val tree = objBody(doc, pages).getOrElse(
      throw new IllegalArgumentException(
        s"media $mediaId: dangling /Pages reference to object $pages"))
    "/Count\\s+(\\d+)".r.findFirstMatchIn(tree).getOrElse(
      throw new IllegalArgumentException(
        s"media $mediaId: page tree without /Count")).group(1).toInt
  }

  // ---------------------------------------------------------------------
  // document-level scanning

  /** Encryption check: `/Encrypt` inside a trailer dictionary (classic
    * trailer keyword or a cross-reference stream's dict). Searching only
    * dict regions keeps a content string containing the characters
    * "/Encrypt" from false-positiving. */
  private def requireNotEncrypted(bytes: Array[Byte], mediaId: Long): Unit = {
    var at = indexOf(bytes, "trailer", 0)
    while (at >= 0) {
      val window = new String(bytes, at,
        math.min(2048, bytes.length - at), java.nio.charset.StandardCharsets.ISO_8859_1)
      require(!window.contains("/Encrypt"),
        s"media $mediaId: encrypted PDF (cannot extract text without the key)")
      at = indexOf(bytes, "trailer", at + 7)
    }
    // xref-stream PDFs have no `trailer` keyword; their /XRef dict carries
    // /Encrypt instead — dictBefore finds it when the stream is scanned,
    // so check every stream dict too (cheap: dicts only)
    var s = indexOf(bytes, "stream", 0)
    while (s >= 0) {
      if (isTokenBoundary(bytes, s - 1) && !precededBy(bytes, s, "end")) {
        val d = dictBefore(bytes, s)
        require(!(d.contains("/XRef") && d.contains("/Encrypt")),
          s"media $mediaId: encrypted PDF (cannot extract text without the key)")
      }
      s = indexOf(bytes, "stream", s + 6)
    }
  }

  /** The dictionary text between the object header and the `stream`
    * keyword — enough to read /Filter, /Length, /Type without a full
    * object parser. Decoded latin-1 (dict tokens are ASCII). */
  private def dictBefore(bytes: Array[Byte], streamAt: Int): String = {
    val objAt = lastIndexOf(bytes, "obj", streamAt)
    val from = if (objAt < 0) math.max(0, streamAt - 512) else objAt
    new String(bytes, from, streamAt - from,
      java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** Position right after `stream` + EOL (spec: CRLF or bare LF). −1 if
    * the keyword isn't followed by an EOL (not a stream object). */
  private[operators] def afterStreamKeyword(bytes: Array[Byte], streamAt: Int): Int = {
    var p = streamAt + 6
    if (p < bytes.length && bytes(p) == '\r') p += 1
    if (p < bytes.length && bytes(p) == '\n') p + 1 else -1
  }

  /** Decode filters this extractor speaks, full names and the inline-
    * image abbreviations: Flate, LZW (TIFF-variant, EarlyChange),
    * ASCIIHex, ASCII85, RunLength — the text-stream filters of ISO
    * 32000 §7.4. Image codecs (DCT/JPX/CCITT/JBIG2) stay out: streams
    * carrying them are never text candidates. */
  private val SupportedFilters = Set(
    "FlateDecode", "Fl", "LZWDecode", "LZW",
    "ASCIIHexDecode", "AHx", "ASCII85Decode", "A85",
    "RunLengthDecode", "RL")

  /** The stream's filter chain in application order: a bare name or an
    * array of names ([/ASCII85Decode /FlateDecode] means 85-decode
    * FIRST). Empty for unfiltered streams. */
  private def filtersOf(dict: String): Seq[String] =
    "/Filter\\s*(?:\\[([^\\]]*)\\]|/([A-Za-z0-9]+))".r
      .findFirstMatchIn(dict).toSeq.flatMap { m =>
        if (m.group(2) != null) Seq(m.group(2))
        else "/([A-Za-z0-9]+)".r.findAllMatchIn(m.group(1))
          .map(_.group(1)).toSeq
      }

  /** Structural / binary stream types that must never be text-scanned —
    * plus any filter chain this extractor can't decode (image codecs
    * etc.): only chains made entirely of [[SupportedFilters]] are
    * candidates. */
  private def isTextCandidate(dict: String): Boolean = {
    val structural = Seq("/ObjStm", "/XRef", "/Metadata", "/EmbeddedFile",
      "/FontFile", "/Image").exists(dict.contains)
    val fs = filtersOf(dict)
    // a /Filter the parser could NOT read (an indirect ref like
    // "/Filter 2 0 R") must exclude the stream — treating it as
    // unfiltered would text-scan compressed bytes
    !structural && (!dict.contains("/Filter") || fs.nonEmpty) &&
      fs.forall(SupportedFilters)
  }

  /** Direct `/Length 123` or indirect `/Length 6 0 R` resolved by
    * scanning for `6 0 obj` and parsing the integer it wraps.
    *
    * The direct-match digits carry a `\b` guard: without it, a
    * multi-digit indirect ref like `/Length 10 0 R` backtracks — the
    * engine retries with group(1)="1", the lookahead no longer sees
    * `\s+\d+\s+R`, and the stream is "directly" 1 byte long. */
  private def declaredLength(bytes: Array[Byte], dict: String): Option[Int] = {
    val direct = "/Length\\s+(\\d+)\\b(?!\\s+\\d+\\s+R)".r
    direct.findFirstMatchIn(dict).map(_.group(1).toInt).orElse {
      "/Length\\s+(\\d+)\\s+(\\d+)\\s+R".r.findFirstMatchIn(dict).flatMap { m =>
        val at = indexOf(bytes, s"${m.group(1)} ${m.group(2)} obj", 0)
        if (at < 0) None
        else {
          val tail = new String(bytes, at, math.min(64, bytes.length - at),
            java.nio.charset.StandardCharsets.ISO_8859_1)
          "obj\\s+(\\d+)".r.findFirstMatchIn(tail).map(_.group(1).toInt)
        }
      }
    }
  }

  /** Walk back across the EOL that separates data from `endstream`. */
  private def trimEol(bytes: Array[Byte], endstreamAt: Int): Int = {
    var e = endstreamAt
    if (e > 0 && bytes(e - 1) == '\n') e -= 1
    if (e > 0 && bytes(e - 1) == '\r') e -= 1
    e
  }

  private def decodeStream(bytes: Array[Byte], from: Int, until: Int,
      dict: String, mediaId: Long): Array[Byte] = {
    val raw = java.util.Arrays.copyOfRange(bytes, from, math.max(from, until))
    filtersOf(dict).foldLeft(raw) { (d, f) =>
      try f match {
        case "FlateDecode" | "Fl" => inflate(d)
        case "LZWDecode" | "LZW" => lzwDecode(d, earlyChangeOf(dict))
        case "ASCIIHexDecode" | "AHx" => asciiHexDecode(d)
        case "ASCII85Decode" | "A85" => ascii85Decode(d)
        case "RunLengthDecode" | "RL" => runLengthDecode(d)
        case other => throw new IllegalArgumentException(s"filter $other")
      } catch {
        case e: Exception => throw new IllegalArgumentException(
          s"media $mediaId: corrupt $f stream (${e.getMessage})", e)
      }
    }
  }

  /** LZW EarlyChange parameter (code width bumps one code early when 1,
    * the default). */
  private def earlyChangeOf(dict: String): Int =
    "/EarlyChange\\s+(\\d+)".r.findFirstMatchIn(dict)
      .map(_.group(1).toInt).getOrElse(1)

  /** PDF/TIFF-variant LZW: MSB-first variable-width codes 9→12 bits,
    * 256 = clear-table, 257 = EOD; the width bumps when the NEXT code
    * could overflow, `earlyChange` codes early (spec default 1). The
    * KwKwK case (code == next table slot) is the only legal
    * forward-reference; anything else is corrupt and throws (the
    * fail-loudly contract). */
  private[graft] def lzwDecode(data: Array[Byte], earlyChange: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 3)
    val table = new scala.collection.mutable.ArrayBuffer[Array[Byte]](4096)
    def resetTable(): Unit = {
      table.clear()
      (0 until 256).foreach(b => table += Array(b.toByte))
      table += null; table += null // 256 clear, 257 eod
    }
    resetTable()
    var width = 9
    var prev: Array[Byte] = null
    var bitPos = 0
    val nBits = data.length * 8
    var done = false
    while (!done && bitPos + width <= nBits) {
      var code = 0
      var k = 0
      while (k < width) {
        val p = bitPos + k
        code = (code << 1) | ((data(p >> 3) >> (7 - (p & 7))) & 1)
        k += 1
      }
      bitPos += width
      if (code == 256) { resetTable(); width = 9; prev = null }
      else if (code == 257) done = true
      else {
        val entry =
          if (code < table.length && table(code) != null) table(code)
          else if (code == table.length && prev != null) prev :+ prev(0)
          else throw new IllegalArgumentException(
            s"corrupt LZW code $code (table ${table.length})")
        out.write(entry, 0, entry.length)
        if (prev != null) table += prev :+ entry(0)
        prev = entry
        if (width < 12 && table.length + earlyChange >= (1 << width))
          width += 1
      }
    }
    out.toByteArray
  }

  /** RunLengthDecode: length byte 0–127 copies the next n+1 literals,
    * 129–255 repeats the next byte 257−n times, 128 ends the data. */
  private[graft] def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 2)
    var i = 0
    var done = false
    while (!done && i < data.length) {
      val n = data(i) & 0xff
      if (n == 128) done = true
      else if (n < 128) {
        require(i + 1 + n + 1 <= data.length, "truncated RunLength literal run")
        out.write(data, i + 1, n + 1)
        i += n + 2
      } else {
        require(i + 1 < data.length, "truncated RunLength repeat run")
        val b = data(i + 1)
        var k = 0
        while (k < 257 - n) { out.write(b); k += 1 }
        i += 2
      }
    }
    out.toByteArray
  }

  /** ASCIIHexDecode: hex pairs, whitespace-tolerant, `>` terminates,
    * odd trailing digit pads low per spec. */
  private[graft] def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2)
    var hi = -1
    var i = 0
    var done = false
    while (!done && i < data.length) {
      val c = data(i)
      if (c == '>') done = true
      else {
        val v = Character.digit(c, 16)
        if (v >= 0) {
          if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 }
        } else require(c == ' ' || c == '\t' || c == '\r' || c == '\n' ||
          c == '\f' || c == 0, s"bad ASCIIHex byte '${c.toChar}'")
        i += 1
      }
    }
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  /** ASCII85Decode: base-85 groups (`!`..`u`), the `z` zero-group
    * shortcut, whitespace-tolerant, `~>` terminates; a partial final
    * group of n chars yields n−1 bytes per spec. */
  private[graft] def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5)
    val group = new Array[Int](5)
    var n = 0
    def flush(count: Int): Unit = {
      var v = 0L
      var k = 0
      while (k < 5) { v = v * 85 + (if (k < count) group(k) else 84); k += 1 }
      require(v <= 0xffffffffL, "ASCII85 group overflow")
      val nOut = count - 1
      var b = 0
      while (b < nOut) { out.write(((v >> (24 - 8 * b)) & 0xff).toInt); b += 1 }
    }
    var i = 0
    var done = false
    while (!done && i < data.length) {
      val c = data(i)
      if (c == '~') done = true
      else if (c == 'z' && n == 0) {
        out.write(0); out.write(0); out.write(0); out.write(0)
      }
      else if (c >= '!' && c <= 'u') {
        group(n) = c - '!'; n += 1
        if (n == 5) { flush(5); n = 0 }
      } else require(c == ' ' || c == '\t' || c == '\r' || c == '\n' ||
        c == '\f' || c == 0, s"bad ASCII85 byte '${c.toChar}'")
      i += 1
    }
    require(n != 1, "dangling single ASCII85 char")
    if (n > 1) flush(n)
    out.toByteArray
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](16 * 1024)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n > 0) out.write(buf, 0, n)
      else if (n == 0 && !inf.finished())
        require(!inf.needsDictionary(), "preset-dictionary zlib stream")
    }
    // a truncated stream exits the loop needing input without ever
    // finishing — that must surface as corrupt, not as silent partial
    // text (the fail-loudly contract)
    if (!inf.finished())
      throw new java.util.zip.DataFormatException("truncated Flate data")
    inf.end()
    out.toByteArray
  }

  /** Standalone `BT` token present? (ObjStm false-positives are already
    * filtered by dict type; this keeps image/binary raw streams out.) */
  private def hasBtToken(data: Array[Byte]): Boolean = {
    var i = indexOf(data, "BT", 0)
    while (i >= 0) {
      if (isTokenBoundary(data, i - 1) && isTokenBoundary(data, i + 2)) return true
      i = indexOf(data, "BT", i + 2)
    }
    false
  }

  // ---------------------------------------------------------------------
  // /ToUnicode CMap support (composite / Type0 fonts, ISO 32000 §9.10.3)

  /** Parsed ToUnicode mapping: `codeBytes`-wide big-endian codes →
    * Unicode strings (a code may map to several UTF-16 units, e.g.
    * ligature expansions). */
  private[graft] final case class ToUnicodeCMap(
      codeBytes: Int, map: Map[Int, String]) {
    /** Shown-string bytes → text: fixed-width code walk, unmapped codes
      * and a trailing partial code degrade to U+FFFD (never throw — a
      * missing mapping is a quality problem, not a framing one). */
    def decode(b: Array[Byte]): String = {
      val sb = new StringBuilder(b.length)
      var i = 0
      while (i + codeBytes <= b.length) {
        var code = 0; var k = 0
        while (k < codeBytes) { code = (code << 8) | (b(i + k) & 0xff); k += 1 }
        sb.append(map.getOrElse(code, "\uFFFD"))
        i += codeBytes
      }
      if (i < b.length) sb.append('\uFFFD')
      sb.toString
    }
  }

  /** Hostile-input bound: a CMap claiming more mappings than the full
    * 2-byte code space is lying. */
  private val MaxCMapEntries = 0x10000

  /** Bounded `bfchar`/`bfrange` CMap parser over a decoded ToUnicode
    * stream. Code width comes from the first codespacerange bound
    * (1 or 2 bytes; Identity-H CMaps declare `<0000> <FFFF>` → 2, the
    * default). Range entries support both forms: incrementing scalar
    * destination and explicit destination array. */
  private[graft] def parseToUnicodeCMap(data: Array[Byte]): ToUnicodeCMap = {
    val s = new String(data, java.nio.charset.StandardCharsets.ISO_8859_1)
    val codeBytes = "begincodespacerange\\s*<([0-9A-Fa-f]+)>".r
      .findFirstMatchIn(s).map(_.group(1).length / 2)
      .filter(n => n == 1 || n == 2).getOrElse(2)
    def hexStr(h: String): String = {
      // destination hex is UTF-16BE; odd digit counts pad low per the
      // hex-string rule
      val padded = if (h.length % 2 == 0) h else h + "0"
      val b = new Array[Byte](padded.length / 2)
      var k = 0
      while (k < b.length) {
        b(k) = Integer.parseInt(padded.substring(2 * k, 2 * k + 2), 16).toByte
        k += 1
      }
      new String(b, java.nio.charset.StandardCharsets.UTF_16BE)
    }
    val map = scala.collection.mutable.HashMap.empty[Int, String]
    for (sec <- "(?s)beginbfchar(.*?)endbfchar".r.findAllMatchIn(s);
         m <- "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>".r
           .findAllMatchIn(sec.group(1)) if map.size < MaxCMapEntries)
      map(Integer.parseInt(m.group(1), 16)) = hexStr(m.group(2))
    val rangeEntry =
      "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>\\s*(<[0-9A-Fa-f]+>|\\[[^\\]]*\\])".r
    for (sec <- "(?s)beginbfrange(.*?)endbfrange".r.findAllMatchIn(s);
         m <- rangeEntry.findAllMatchIn(sec.group(1))) {
      val lo = Integer.parseInt(m.group(1), 16)
      val hi = math.min(Integer.parseInt(m.group(2), 16), lo + MaxCMapEntries)
      val dst = m.group(3)
      if (dst.startsWith("[")) {
        val items = "<([0-9A-Fa-f]+)>".r.findAllMatchIn(dst)
          .map(_.group(1)).toSeq
        for ((h, k) <- items.zipWithIndex
             if lo + k <= hi && map.size < MaxCMapEntries)
          map(lo + k) = hexStr(h)
      } else {
        val base = hexStr(dst.substring(1, dst.length - 1))
        var c = lo
        while (c <= hi && map.size < MaxCMapEntries) {
          if (base.isEmpty) map(c) = base
          else {
            // spec: the LAST UTF-16 code unit increments across the range
            val arr = base.toCharArray
            arr(arr.length - 1) = (arr(arr.length - 1) + (c - lo)).toChar
            map(c) = new String(arr)
          }
          c += 1
        }
      }
    }
    ToUnicodeCMap(codeBytes, map.toMap)
  }

  /** Resolution bound: more named fonts than this and the rest keep the
    * raw-bytes path (real documents have a handful). */
  private val MaxFonts = 64

  /** Every `/Font` resource name resolved to its ToUnicode CMap — only
    * Type0 fonts carrying a `/ToUnicode N G R` stream ref land in the
    * map; simple fonts (and Type0 without ToUnicode) keep the raw-bytes
    * path. One latin-1 view of the document serves all the positional
    * regex work (latin-1 is 1:1 with byte offsets). */
  private[graft] def toUnicodeMaps(bytes: Array[Byte],
      mediaId: Long): Map[String, ToUnicodeCMap] = {
    // most PDFs carry no composite fonts: one byte-level probe skips the
    // whole latin-1 view + regex resolution for them
    if (indexOf(bytes, "/ToUnicode", 0) < 0) return Map.empty
    val doc = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    // 1. font-name → object number across every /Font resource dict
    val refs = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    // names bound to DIFFERENT font objects across pages (per-page /F1
    // is the common naming) get no document-global CMap: decoding page
    // 1's simple-font /F1 through page 2's Type0 CMap would turn clean
    // text into U+FFFD — the conservative raw-bytes path wins ties
    val ambiguous = scala.collection.mutable.HashSet.empty[String]
    var at = doc.indexOf("/Font")
    while (at >= 0 && refs.size < MaxFonts) {
      var p = at + 5
      while (p < doc.length && (doc(p) == ' ' || doc(p) == '\t' ||
        doc(p) == '\r' || doc(p) == '\n')) p += 1
      if (p + 1 < doc.length && doc(p) == '<' && doc(p + 1) == '<') {
        val end = skipDict(bytes, p)
        val body = doc.substring(p, math.min(end, doc.length))
        for (m <- "/([^\\s/<>\\[\\]()]+)\\s+(\\d+)\\s+\\d+\\s+R".r
            .findAllMatchIn(body) if refs.size < MaxFonts) {
          val (name, obj) = (m.group(1), m.group(2).toInt)
          if (refs.getOrElse(name, obj) != obj) ambiguous += name
          else refs(name) = obj
        }
      }
      at = doc.indexOf("/Font", at + 5)
    }
    ambiguous.foreach(refs.remove)
    if (refs.isEmpty) return Map.empty
    // 2. named font object → /Type0 with a /ToUnicode stream ref
    val cmapCache = scala.collection.mutable.HashMap.empty[Int, Option[ToUnicodeCMap]]
    refs.iterator.flatMap { case (name, objNum) =>
      objBody(doc, objNum).filter(_.contains("/Type0")).flatMap { body =>
        "/ToUnicode\\s+(\\d+)\\s+\\d+\\s+R".r.findFirstMatchIn(body)
          .flatMap { m =>
            val tu = m.group(1).toInt
            cmapCache.getOrElseUpdate(tu, cmapStreamOf(bytes, doc, tu, mediaId))
          }
      }.map(name -> _)
    }.toMap
  }

  /** Body text of `num G obj … endobj` (first match; any generation). */
  private[operators] def objBody(doc: String, num: Int): Option[String] =
    ("(?s)(?<![0-9])" + num + "\\s+\\d+\\s+obj\\b(.*?)(?:endobj|$)").r
      .findFirstMatchIn(doc).map(_.group(1))

  /** Decode object `num`'s stream and parse it as a ToUnicode CMap.
    * None when the object has no stream or the content has no bf
    * sections; a corrupt Flate CMap degrades to None rather than
    * failing the page text it only annotates. */
  private def cmapStreamOf(bytes: Array[Byte], doc: String, num: Int,
      mediaId: Long): Option[ToUnicodeCMap] = {
    val header = ("(?<![0-9])" + num + "\\s+\\d+\\s+obj\\b").r
      .findFirstMatchIn(doc).map(_.start).getOrElse(return None)
    val endObj = doc.indexOf("endobj", header) match {
      case -1 => doc.length
      case e => e
    }
    val streamAt = doc.indexOf("stream", header)
    if (streamAt < 0 || streamAt >= endObj) return None
    val dict = doc.substring(header, streamAt)
    val dataStart = afterStreamKeyword(bytes, streamAt)
    if (dataStart < 0) return None
    val dataEnd = declaredLength(bytes, dict) match {
      case Some(n) if dataStart + n <= bytes.length => dataStart + n
      case _ =>
        val e = indexOf(bytes, "endstream", dataStart)
        if (e < 0) bytes.length else trimEol(bytes, e)
    }
    val data =
      try decodeStream(bytes, dataStart, dataEnd, dict, mediaId)
      catch { case _: Exception => return None }
    val text = new String(data, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!text.contains("beginbfchar") && !text.contains("beginbfrange")) None
    else try Some(parseToUnicodeCMap(data)) catch {
      // a hostile/broken CMap (e.g. a code past Int range) annotates the
      // text, it must not fail it — same degrade as a corrupt Flate CMap
      case _: Exception => None
    }
  }

  // ---------------------------------------------------------------------
  // content-stream interpretation

  /** Kern gap (negative, thousandths of an em) at or past which a TJ
    * number reads as a word space. */
  private val SpaceKernThreshold = -180

  /** One pass over a decoded content stream: tokenize, track the operand
    * stack, assemble shown text with the line rules in the object doc.
    * `fonts` maps resource font names to their ToUnicode CMaps; the
    * current font follows `Tf` (graphics state — it persists across
    * `BT`/`ET`), and strings shown under a mapped font decode through
    * the CMap instead of the raw-bytes path. */
  private[graft] def extractContentText(data: Array[Byte], mediaId: Long,
      fonts: Map[String, ToUnicodeCMap] = Map.empty): String = {
    val out = new StringBuilder
    val strBytes = new java.io.ByteArrayOutputStream()
    // operand stack: only what the text ops consume — last string, last
    // array-of-strings, last two numbers, last name (for Tf)
    var lastStr: Array[Byte] = null
    var lastArr: java.util.ArrayList[AnyRef] = null
    var lastName: String = null
    var num1, num2 = 0.0 // two most recent numbers (num2 = newest)
    var inText = false
    var shownInObject = false
    var pendingObjectBreak = false // a PRIOR text object already showed text
    var curCMap: ToUnicodeCMap = null

    def flushString(b: Array[Byte]): Unit = {
      if (!shownInObject && pendingObjectBreak) {
        strBytes.write('\n'); pendingObjectBreak = false
      }
      if (curCMap != null) {
        val mapped = curCMap.decode(b)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        strBytes.write(mapped, 0, mapped.length)
      } else if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff) {
        // BOM-prefixed UTF-16BE text string (§7.9.2.2)
        val decoded = new String(b, 2, b.length - 2,
          java.nio.charset.StandardCharsets.UTF_16BE)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        strBytes.write(decoded, 0, decoded.length)
      } else strBytes.write(b, 0, b.length)
    }
    def newlineBeforeShow(): Unit =
      if (shownInObject) strBytes.write('\n')

    var i = 0
    val n = data.length
    while (i < n) {
      val c = data(i)
      if (c == '%') { // comment to EOL
        while (i < n && data(i) != '\n' && data(i) != '\r') i += 1
      } else if (c == '(') {
        val (s, next) = parseLiteralString(data, i, mediaId)
        lastStr = s; if (lastArr != null) lastArr.add(s)
        i = next
      } else if (c == '<' && i + 1 < n && data(i + 1) == '<') {
        i = skipDict(data, i) // inline dict (e.g. BDC property lists)
      } else if (c == '<') {
        val (s, next) = parseHexString(data, i, mediaId)
        lastStr = s; if (lastArr != null) lastArr.add(s)
        i = next
      } else if (c == '[') {
        lastArr = new java.util.ArrayList[AnyRef](); i += 1
      } else if (c == ']') {
        i += 1
      } else if (c == '/') { // name object: remember for Tf
        val start = i + 1
        i += 1
        while (i < n && !isDelimiter(data(i))) i += 1
        lastName = new String(data, start, i - start,
          java.nio.charset.StandardCharsets.US_ASCII)
      } else if (isNumStart(c)) {
        val start = i
        i += 1
        while (i < n && (data(i) >= '0' && data(i) <= '9' || data(i) == '.')) i += 1
        val v = new String(data, start, i - start,
          java.nio.charset.StandardCharsets.US_ASCII).toDouble
        num1 = num2; num2 = v
        if (lastArr != null) lastArr.add(java.lang.Double.valueOf(v))
      } else if (c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == 0) {
        i += 1
      } else { // operator token
        val start = i
        while (i < n && !isDelimiter(data(i))) i += 1
        val op = new String(data, start, i - start,
          java.nio.charset.StandardCharsets.US_ASCII)
        op match {
          case "BT" =>
            inText = true
            pendingObjectBreak = pendingObjectBreak || shownInObject
            shownInObject = false
          case "ET" => inText = false
          case "Tj" if inText && lastStr != null =>
            flushString(lastStr); shownInObject = true
          case "'" if inText && lastStr != null =>
            newlineBeforeShow(); flushString(lastStr); shownInObject = true
          case "\"" if inText && lastStr != null =>
            newlineBeforeShow(); flushString(lastStr); shownInObject = true
          case "TJ" if inText && lastArr != null =>
            val it = lastArr.iterator()
            while (it.hasNext) it.next() match {
              case b: Array[Byte] => flushString(b)
              case d: java.lang.Double if d.doubleValue() <= SpaceKernThreshold =>
                strBytes.write(' ')
              case _ => ()
            }
            shownInObject = true
          case "Tf" =>
            curCMap = if (lastName == null) null
              else fonts.getOrElse(lastName, null)
          case "T*" if inText => newlineBeforeShow()
          case "Td" | "TD" if inText =>
            // num2 = ty (the newest operand): vertical move = new line
            if (num2 != 0.0) newlineBeforeShow()
          case "BI" =>
            // inline image: binary data runs to the EI sentinel
            val ei = indexOf(data, "EI", i)
            i = if (ei < 0) n else ei + 2
          case _ => () // every other operator: positioning/state/paint
        }
        // operators consume their operands
        if (op != "[") { lastStr = null; lastArr = null }
      }
    }
    new String(strBytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Literal string `(...)`: nesting, escapes, octal, continuations. */
  private[operators] def parseLiteralString(data: Array[Byte], at: Int,
      mediaId: Long): (Array[Byte], Int) = {
    val out = new java.io.ByteArrayOutputStream()
    var depth = 1
    var i = at + 1
    while (depth > 0) {
      require(i < data.length, s"media $mediaId: unterminated PDF string literal")
      val c = data(i)
      if (c == '\\') {
        require(i + 1 < data.length, s"media $mediaId: dangling escape in string")
        val e = data(i + 1)
        e match {
          case 'n' => out.write('\n'); i += 2
          case 'r' => out.write('\r'); i += 2
          case 't' => out.write('\t'); i += 2
          case 'b' => out.write('\b'); i += 2
          case 'f' => out.write('\f'); i += 2
          case '(' => out.write('('); i += 2
          case ')' => out.write(')'); i += 2
          case '\\' => out.write('\\'); i += 2
          case '\r' => // line continuation: swallow CR or CRLF
            i += 2; if (i < data.length && data(i) == '\n') i += 1
          case '\n' => i += 2
          case d if d >= '0' && d <= '7' => // up to 3 octal digits
            var v = 0; var k = 0; i += 1
            while (k < 3 && i < data.length &&
                data(i) >= '0' && data(i) <= '7') {
              v = v * 8 + (data(i) - '0'); i += 1; k += 1
            }
            out.write(v & 0xff)
          case other => out.write(other); i += 2 // spec: drop the backslash
        }
      } else if (c == '(') { depth += 1; out.write(c); i += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth > 0) out.write(c)
        i += 1
      } else { out.write(c); i += 1 }
    }
    (out.toByteArray, i)
  }

  /** Hex string `<...>`: whitespace-tolerant, odd length padded with 0. */
  private[operators] def parseHexString(data: Array[Byte], at: Int,
      mediaId: Long): (Array[Byte], Int) = {
    val out = new java.io.ByteArrayOutputStream()
    var i = at + 1
    var hi = -1
    var closed = false
    while (!closed) {
      require(i < data.length, s"media $mediaId: unterminated PDF hex string")
      val c = data(i)
      if (c == '>') { closed = true; i += 1 }
      else {
        val v = Character.digit(c, 16)
        if (v >= 0) {
          if (hi < 0) hi = v
          else { out.write((hi << 4) | v); hi = -1 }
        } else require(c == ' ' || c == '\t' || c == '\r' || c == '\n',
          s"media $mediaId: bad hex-string byte '${c.toChar}'")
        i += 1
      }
    }
    if (hi >= 0) out.write(hi << 4) // odd digit count: pad low nibble
    (out.toByteArray, i)
  }

  private def skipDict(data: Array[Byte], at: Int): Int = {
    var depth = 0
    var i = at
    while (i + 1 < data.length) {
      if (data(i) == '<' && data(i + 1) == '<') { depth += 1; i += 2 }
      else if (data(i) == '>' && data(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return i
      } else i += 1
    }
    data.length
  }

  // ---------------------------------------------------------------------
  // generator — the staging/spec counterpart (a REAL writer: valid xref,
  // Flate-compressed content; any conforming reader opens its output)

  /** Serialize `text` as a minimal one-page PDF: Helvetica, one text
    * object, first line placed with `Td`, subsequent lines advanced with
    * `T*` — so extraction exercises the leading-newline rules, not just
    * `Tj`. Content stream is `/FlateDecode`-compressed with a direct
    * `/Length`. Lines come from `\n` in `text`. */
  def writeTextPdf(text: String,
      info: Seq[(String, String)] = Nil): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.ISO_8859_1
    val content = {
      val sb = new StringBuilder("BT /F1 11 Tf 14 TL 72 720 Td ")
      val lines = text.split("\n", -1)
      lines.zipWithIndex.foreach { case (line, k) =>
        if (k > 0) sb.append("T* ")
        sb.append('(').append(escapeString(line)).append(") Tj ")
      }
      sb.append("ET")
      deflate(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    // Info values: Latin-1-expressible as literal strings (escape
    // path), anything wider as BOM-prefixed UTF-16BE hex strings —
    // both reader forms exercised by real plants
    val infoObj =
      if (info.isEmpty) None
      else Some(info.map { case (k, v) =>
        val s =
          if (v.forall(_ < 256)) "(" + escapeString(v) + ")"
          else "<FEFF" + v.flatMap(c => f"${c.toInt}%04X") + ">"
        s"/$k $s"
      }.mkString("<< ", " ", " >>").getBytes(ascii))
    val objs = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>".getBytes(ascii),
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(ascii),
      ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>").getBytes(ascii),
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>".getBytes(ascii),
      null) ++ infoObj // null: stream object assembled below
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ascii))
    w("%PDF-1.4\n")
    val offsets = new Array[Int](objs.length + 1)
    objs.zipWithIndex.foreach { case (body, k) =>
      offsets(k + 1) = out.size()
      w(s"${k + 1} 0 obj\n")
      if (body != null) { out.write(body, 0, body.length); w("\nendobj\n") }
      else {
        w(s"<< /Length ${content.length} /Filter /FlateDecode >>\nstream\n")
        out.write(content, 0, content.length)
        w("\nendstream\nendobj\n")
      }
    }
    val xrefAt = out.size()
    w(s"xref\n0 ${objs.length + 1}\n")
    w("0000000000 65535 f \n")
    (1 to objs.length).foreach(k => w(f"${offsets(k)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R" +
      (if (infoObj.isDefined) s" /Info ${objs.length} 0 R" else "") +
      s" >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** Serialize `text` as a one-page COMPOSITE-font PDF: a `/Type0`
    * font with `/Identity-H` encoding, 2-byte character codes assigned
    * densely over the text's distinct UTF-16 units, and a
    * `/ToUnicode` CMap stream (Flate-compressed) mapping codes back —
    * consecutive code-point runs as `bfrange` entries, singletons as
    * `bfchar`, blocks capped at the spec's 100 entries. The content
    * stream shows hex strings of 2-byte codes, so NOTHING round-trips
    * without the CMap path: extraction of this PDF pins
    * [[parseToUnicodeCMap]], the font-resource resolution, and the `Tf`
    * tracking end-to-end. Line structure matches [[writeTextPdf]]
    * (`Td` first line, `T*` advances). */
  def writeType0TextPdf(text: String): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.ISO_8859_1
    // dense code assignment over sorted distinct UTF-16 units: runs of
    // consecutive units become bfrange entries (codes are consecutive by
    // construction), singletons bfchar
    val chars = text.replace("\n", "").toCharArray.distinct.sorted
    val code = chars.zipWithIndex.map { case (ch, k) => ch -> (k + 1) }.toMap
    def hex4(v: Int): String = f"$v%04X"
    val cmapBody = {
      val bfchar = scala.collection.mutable.ArrayBuffer.empty[String]
      val bfrange = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < chars.length) {
        var j = i
        while (j + 1 < chars.length && chars(j + 1) == chars(j) + 1) j += 1
        if (j > i)
          bfrange += s"<${hex4(code(chars(i)))}> <${hex4(code(chars(j)))}> " +
            s"<${hex4(chars(i).toInt)}>"
        else bfchar += s"<${hex4(code(chars(i)))}> <${hex4(chars(i).toInt)}>"
        i = j + 1
      }
      def blocks(entries: Seq[String], kw: String): String =
        entries.grouped(100).map(g =>
          s"${g.length} begin$kw\n${g.mkString("\n")}\nend$kw\n").mkString
      "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n" +
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def\n" +
        "/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n" +
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
        blocks(bfchar.toSeq, "bfchar") + blocks(bfrange.toSeq, "bfrange") +
        "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n"
    }
    val cmap = deflate(cmapBody.getBytes(ascii))
    val content = {
      val sb = new StringBuilder("BT /F1 11 Tf 14 TL 72 720 Td ")
      text.split("\n", -1).zipWithIndex.foreach { case (line, k) =>
        if (k > 0) sb.append("T* ")
        sb.append('<')
        line.foreach(ch => sb.append(hex4(code(ch))))
        sb.append("> Tj ")
      }
      sb.append("ET")
      deflate(sb.toString.getBytes(ascii))
    }
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ascii))
    val offsets = new Array[Int](8)
    def obj(k: Int)(body: => Unit): Unit = {
      offsets(k) = out.size()
      w(s"$k 0 obj\n"); body; w("endobj\n")
    }
    w("%PDF-1.4\n")
    obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>\n"))
    obj(2)(w("<< /Type /Pages /Kids [3 0 R] /Count 1 >>\n"))
    obj(3)(w("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>\n"))
    obj(4)(w("<< /Type /Font /Subtype /Type0 /BaseFont /Graft-Identity " +
      "/Encoding /Identity-H /DescendantFonts [6 0 R] /ToUnicode 7 0 R >>\n"))
    obj(5) {
      w(s"<< /Length ${content.length} /Filter /FlateDecode >>\nstream\n")
      out.write(content, 0, content.length)
      w("\nendstream\n")
    }
    obj(6)(w("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Graft " +
      "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) " +
      "/Supplement 0 >> /DW 500 >>\n"))
    obj(7) {
      w(s"<< /Length ${cmap.length} /Filter /FlateDecode >>\nstream\n")
      out.write(cmap, 0, cmap.length)
      w("\nendstream\n")
    }
    val xrefAt = out.size()
    w("xref\n0 8\n0000000000 65535 f \n")
    (1 to 7).foreach(k => w(f"${offsets(k)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size 8 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  private def escapeString(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '(' => "\\("
      case ')' => "\\)"
      case '\r' => "\\r"
      case c => c.toString
    }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](16 * 1024)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    d.end()
    out.toByteArray
  }

  // ---------------------------------------------------------------------
  // byte-scan helpers

  private def startsWith(b: Array[Byte], at: Int, s: String): Boolean = {
    if (at < 0 || at + s.length > b.length) return false
    var k = 0
    while (k < s.length) {
      if (b(at + k) != s.charAt(k)) return false
      k += 1
    }
    true
  }

  private[operators] def precededBy(b: Array[Byte], at: Int, s: String): Boolean =
    startsWith(b, at - s.length, s)

  private[operators] def isTokenBoundary(b: Array[Byte], at: Int): Boolean =
    at < 0 || at >= b.length || isDelimiter(b(at))

  private def isDelimiter(c: Byte): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == 0 ||
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' ||
      c == ']' || c == '{' || c == '}' || c == '/' || c == '%'

  private def isNumStart(c: Byte): Boolean =
    (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'

  private[operators] def indexOf(b: Array[Byte], s: String, from: Int): Int = {
    val first = s.charAt(0).toByte
    var i = math.max(0, from)
    val limit = b.length - s.length
    while (i <= limit) {
      if (b(i) == first && startsWith(b, i, s)) return i
      i += 1
    }
    -1
  }

  private def lastIndexOf(b: Array[Byte], s: String, before: Int): Int = {
    var i = math.min(before, b.length) - s.length
    while (i >= 0) {
      if (startsWith(b, i, s)) return i
      i -= 1
    }
    -1
  }
}
