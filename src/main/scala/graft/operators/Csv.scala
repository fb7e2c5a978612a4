package graft.operators

/** RFC 4180 CSV text extraction — the tabular plain-text carrier
  * (`text/csv`), flattened exactly like [[Xlsx]] renders spreadsheets:
  * cells joined by TAB, records by newline. A bounded state walk, not
  * a split: quoted fields may contain commas, CRLF record breaks, and
  * doubled-quote escapes, so `split(",")` is wrong on real data —
  * this parser handles all three.
  *
  * Fail-loudly contract: a quote opening mid-field, a character after
  * a closing quote that is neither separator nor record break, or an
  * unterminated quoted field throws `IllegalArgumentException` with
  * the media id; the warc bridge degrades to flagged rows. */
object Csv {

  /** TAB/newline-flattened records of a CSV payload (UTF-8). */
  def extractText(bytes: Array[Byte], mediaId: Long = -1L): String = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val out = new StringBuilder
    val field = new StringBuilder
    var i = 0
    var inQuotes = false
    var fieldStart = true // no bytes of the current field consumed yet
    def endField(recordBreak: Boolean): Unit = {
      out.append(field)
      field.clear()
      out.append(if (recordBreak) '\n' else '\t')
      fieldStart = true
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < s.length && s.charAt(i + 1) == '"') {
            field.append('"'); i += 2 // doubled quote escape
          } else {
            inQuotes = false; i += 1
            require(i >= s.length || s.charAt(i) == ',' ||
                s.charAt(i) == '\r' || s.charAt(i) == '\n',
              s"media $mediaId: character after a closing CSV quote at $i")
          }
        } else { field.append(c); i += 1 }
      } else c match {
        case '"' =>
          require(fieldStart,
            s"media $mediaId: CSV quote opening mid-field at $i")
          inQuotes = true; fieldStart = false; i += 1
        case ',' => endField(recordBreak = false); i += 1
        case '\r' =>
          endField(recordBreak = true)
          i += (if (i + 1 < s.length && s.charAt(i + 1) == '\n') 2 else 1)
        case '\n' => endField(recordBreak = true); i += 1
        case _ => field.append(c); fieldStart = false; i += 1
      }
    }
    require(!inQuotes, s"media $mediaId: unterminated quoted CSV field")
    if (field.nonEmpty || (out.nonEmpty && out.last == '\t'))
      endField(recordBreak = true) // final record without a trailing break
    val text = out.result()
    if (text.nonEmpty && text.last == '\n') text.substring(0, text.length - 1)
    else text
  }

  // -- generator (staging/spec counterpart) ------------------------------

  private def quote(cell: String): String =
    if (cell.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + cell.replace("\"", "\"\"") + "\""
    else cell

  /** Serialize rows as RFC 4180 CSV, CRLF record breaks, cells quoted
    * whenever they need it. */
  def writeCsv(rows: Seq[Seq[String]]): Array[Byte] =
    rows.map(_.map(quote).mkString(",")).mkString("\r\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
}
