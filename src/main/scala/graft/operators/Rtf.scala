package graft.operators

/** Pure-JVM RTF text extraction — the legacy word-processor carrier
  * still present in crawls and mail archives. RTF is a plain-text
  * control language: `{`/`}` groups, `\word` control words with an
  * optional signed numeric parameter, `\'hh` hex-escaped bytes, and
  * `\uN` Unicode escapes (with the `\ucN` convention naming how many
  * fallback bytes follow each one).
  *
  * The strip is a single bounded scan (the [[Docx]] philosophy — no
  * general parser): visible text accumulates; `\par`/`\line` append a
  * line break and `\tab` a TAB; destination groups that carry
  * NON-visible data — `fonttbl`, `colortbl`, `stylesheet`, `info`,
  * `pict`, `themedata`, and every `{\*\...}` extension — are skipped
  * by group depth; everything else is formatting and is ignored by
  * framing alone. `\uN` honors the current `\uc` skip count and
  * negative-N (the 16-bit signed encoding of U+8000..U+FFFF).
  *
  * Fail-loudly contract: a payload without the `{\rtf` magic,
  * unbalanced groups, or a malformed hex escape throws
  * `IllegalArgumentException` with the media id; the warc bridge
  * degrades to flagged rows ([[graft.io.Warc.toDocumentsRtf]]). */
object Rtf {

  private val SkipDestinations = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "themedata",
    "filetbl", "listtable", "listoverridetable", "revtbl", "header",
    "footer", "footnote", "generator", "xmlnstbl", "colorschememapping")

  /** Visible text of an RTF payload (cp1252-oriented byte semantics —
    * the format's default ANSI code page reads as latin-1 here for the
    * `\'hh` range, exact for ASCII documents). */
  def extractText(bytes: Array[Byte], mediaId: Long = -1L): String = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    require(s.startsWith("{\\rtf"),
      s"media $mediaId: RTF magic '{\\rtf' missing")
    val sb = new StringBuilder
    var i = 0
    var depth = 0
    var skipDepth = -1 // group depth at which a skip destination opened
    var uc = 1 // current \ucN fallback-byte count
    var pendingSkip = 0 // bytes to swallow after a \uN
    val ucStack = scala.collection.mutable.ArrayBuffer.empty[Int]
    def visible = skipDepth < 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '{') {
        depth += 1; ucStack += uc; i += 1
      } else if (c == '}') {
        require(depth > 0, s"media $mediaId: unbalanced RTF group at $i")
        depth -= 1
        if (ucStack.nonEmpty) { uc = ucStack.last; ucStack.remove(ucStack.length - 1) }
        if (skipDepth >= 0 && depth < skipDepth) skipDepth = -1
        i += 1
      } else if (c == '\\') {
        require(i + 1 < s.length, s"media $mediaId: RTF ends in a backslash")
        val n = s.charAt(i + 1)
        if (n == '\'') { // hex-escaped byte
          require(i + 3 < s.length, s"media $mediaId: truncated \\' escape at $i")
          val v = Integer.parseInt(s.substring(i + 2, i + 4), 16)
          if (visible) {
            if (pendingSkip > 0) pendingSkip -= 1
            else sb.append(v.toChar) // latin-1 semantics of the ANSI page
          }
          i += 4
        } else if (n == '\\' || n == '{' || n == '}') {
          if (visible) {
            if (pendingSkip > 0) pendingSkip -= 1 else sb.append(n)
          }
          i += 2
        } else if (n == '~') { // non-breaking space
          if (visible && pendingSkip == 0) sb.append(' ')
          if (visible && pendingSkip > 0) pendingSkip -= 1
          i += 2
        } else if (n == '*') { // {\*\dest ...}: an extension destination
          if (visible) skipDepth = depth
          i += 2
        } else if (Character.isLetter(n)) {
          var j = i + 1
          while (j < s.length && Character.isLetter(s.charAt(j))) j += 1
          val word = s.substring(i + 1, j)
          var param = 0L
          var hasParam = false
          if (j < s.length && (s.charAt(j) == '-' || Character.isDigit(s.charAt(j)))) {
            val neg = s.charAt(j) == '-'
            if (neg) j += 1
            val p0 = j
            while (j < s.length && Character.isDigit(s.charAt(j))) j += 1
            require(j > p0, s"media $mediaId: dangling '-' after \\$word")
            param = s.substring(p0, j).toLong
            if (neg) param = -param
            hasParam = true
          }
          if (j < s.length && s.charAt(j) == ' ') j += 1 // delimiter space
          word match {
            case "par" | "line" | "sect" | "page" =>
              if (visible && pendingSkip == 0) sb.append('\n')
            case "tab" =>
              if (visible && pendingSkip == 0) sb.append('\t')
            case "emdash" => if (visible && pendingSkip == 0) sb.append('—')
            case "endash" => if (visible && pendingSkip == 0) sb.append('–')
            case "lquote" => if (visible && pendingSkip == 0) sb.append('‘')
            case "rquote" => if (visible && pendingSkip == 0) sb.append('’')
            case "ldblquote" => if (visible && pendingSkip == 0) sb.append('“')
            case "rdblquote" => if (visible && pendingSkip == 0) sb.append('”')
            case "uc" if hasParam => uc = param.toInt
            case "u" if hasParam =>
              if (visible) {
                val cp = if (param < 0) (param + 65536).toInt else param.toInt
                sb.append(cp.toChar)
                pendingSkip = uc // swallow the fallback bytes
              }
            case w if SkipDestinations.contains(w) =>
              skipDepth = depth // this group's content is not body text
            case _ => () // formatting control word: framing only
          }
          i = j
        } else {
          // \<digit> or other symbol escapes: not text
          i += 2
        }
      } else if (c == '\r' || c == '\n') i += 1 // raw newlines are ignorable
      else {
        if (visible) {
          if (pendingSkip > 0) pendingSkip -= 1 else sb.append(c)
        }
        i += 1
      }
    }
    require(depth == 0, s"media $mediaId: RTF ends inside ${depth} open group(s)")
    val out = sb.result()
    if (out.nonEmpty && out.charAt(out.length - 1) == '\n')
      out.substring(0, out.length - 1)
    else out
  }

  // -- generator (staging/spec counterpart) ------------------------------

  private def rtfEscape(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '{' => "\\{"
      case '}' => "\\}"
      case c if c > 127 => f"\\u${c.toInt}%d?" // unicode escape + '?' fallback
      case c => c.toString
    }

  /** Serialize `text` as a minimal VALID RTF (one `\par` per line,
    * a font table and a `{\*\generator}` destination planted so the
    * skip paths are always on the oracle path). */
  def writeRtf(text: String): Array[Byte] = {
    val body = text.split("\n", -1).map(rtfEscape).mkString("\\par ")
    ("{\\rtf1\\ansi\\deff0" +
      "{\\fonttbl{\\f0 Times New Roman;}}" +
      "{\\*\\generator graft;}" +
      "\\uc1 " + body + "}")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }
}
