package graft.operators

/** Subtitle text extraction — SubRip (`.srt`) and WebVTT (`.vtt`),
  * the transcript carriers of a video crawl and some of the densest
  * conversational text a training corpus sees. Both formats are plain
  * text with public framing:
  *
  *  - SRT: blank-line-separated cues of `index` / `HH:MM:SS,mmm -->
  *    HH:MM:SS,mmm` / payload lines;
  *  - WebVTT: a `WEBVTT` signature line, then cues whose timing line
  *    uses `.` millisecond separators and may be preceded by a cue
  *    identifier; `NOTE`/`STYLE`/`REGION` blocks are skipped.
  *
  * Extraction yields the cue payload text (inline `<i>`/`<b>`/`<c>`/
  * `<v Speaker>` style tags stripped, entity-decoded via the shared
  * [[Docx]] rules), one line per payload line, cues joined by a
  * newline — plus the cue count and the end of the last cue (the
  * catalog duration).
  *
  * Fail-loudly contract: a VTT without the signature, a cue with a
  * malformed timing line, or an out-of-order timestamp throws
  * `IllegalArgumentException` with the media id; the warc bridge
  * ([[graft.io.Warc.toDocumentsSubtitles]]) degrades those to flagged
  * rows, the PDF tolerance pattern. */
object Subtitles {

  final case class SubtitleDoc(text: String, nCues: Int, durationSec: Double)

  private val SrtTime = // HH:MM:SS,mmm (SRT) or HH:MM:SS.mmm (VTT)
    """(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})""".r

  private def seconds(h: String, m: String, s: String, ms: String): Double =
    h.toInt * 3600 + m.toInt * 60 + s.toInt + ms.toInt / 1000.0

  /** A timing line's (start, end), or None if the line is not one. */
  private def timing(line: String, mediaId: Long): Option[(Double, Double)] = {
    val at = line.indexOf("-->")
    if (at < 0) None
    else {
      val a = SrtTime.findFirstMatchIn(line.substring(0, at))
      val b = SrtTime.findFirstMatchIn(line.substring(at + 3))
      require(a.isDefined && b.isDefined,
        s"media $mediaId: malformed cue timing line '$line'")
      val start = seconds(a.get.group(1), a.get.group(2), a.get.group(3), a.get.group(4))
      val end = seconds(b.get.group(1), b.get.group(2), b.get.group(3), b.get.group(4))
      require(end >= start,
        s"media $mediaId: cue ends before it starts ('$line')")
      Some((start, end))
    }
  }

  /** One payload line with inline tags stripped and entities decoded. */
  private def stripLine(line: String, mediaId: Long): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '<') {
        val close = line.indexOf('>', i)
        // an unclosed angle bracket is literal text, not a tag
        if (close < 0) { sb.append(c); i += 1 } else i = close + 1
      } else if (c == '&') {
        i = Docx.appendEntityChar(line, i, sb, mediaId)
      } else { sb.append(c); i += 1 }
    }
    sb.result()
  }

  /** Shared cue walk. `vtt` switches the signature requirement, the
    * comment-block skip, and tolerance for cue-identifier lines. */
  private def parse(raw: String, vtt: Boolean, mediaId: Long): SubtitleDoc = {
    val lines = raw.split("\r\n|\n|\r", -1)
    var i = 0
    if (vtt) {
      require(lines.nonEmpty && lines(0).startsWith("WEBVTT"),
        s"media $mediaId: WEBVTT signature missing")
      i = 1
    }
    val text = new StringBuilder
    var nCues = 0
    var lastEnd = 0.0
    var first = true
    while (i < lines.length) {
      // skip blank separators
      while (i < lines.length && lines(i).trim.isEmpty) i += 1
      if (i < lines.length) {
        val head = lines(i).trim
        if (vtt && (head.startsWith("NOTE") || head == "STYLE" ||
            head.startsWith("REGION"))) {
          // comment/metadata block: runs to the next blank line
          while (i < lines.length && lines(i).trim.nonEmpty) i += 1
        } else {
          // a cue: optional identifier line (SRT index / VTT id), then
          // the timing line, then payload lines to the next blank
          var t = timing(lines(i), mediaId)
          if (t.isEmpty) {
            require(i + 1 < lines.length,
              s"media $mediaId: cue identifier '$head' without a timing line")
            i += 1
            t = timing(lines(i), mediaId)
            require(t.isDefined,
              s"media $mediaId: expected a cue timing line, got '${lines(i)}'")
          }
          lastEnd = math.max(lastEnd, t.get._2)
          nCues += 1
          i += 1
          while (i < lines.length && lines(i).trim.nonEmpty) {
            if (!first) text.append('\n')
            first = false
            text.append(stripLine(lines(i), mediaId))
            i += 1
          }
        }
      }
    }
    require(nCues > 0, s"media $mediaId: subtitle file without cues")
    SubtitleDoc(text.result(), nCues, lastEnd)
  }

  /** Extract a SubRip payload (UTF-8 bytes). */
  def extractSrt(bytes: Array[Byte], mediaId: Long = -1L): SubtitleDoc =
    parse(new String(bytes, java.nio.charset.StandardCharsets.UTF_8),
      vtt = false, mediaId)

  /** Extract a WebVTT payload (UTF-8 bytes). */
  def extractVtt(bytes: Array[Byte], mediaId: Long = -1L): SubtitleDoc =
    parse(new String(bytes, java.nio.charset.StandardCharsets.UTF_8),
      vtt = true, mediaId)

  // -- generators (staging/spec counterparts) ----------------------------

  private def stamp(sec: Double, vttDot: Boolean): String = {
    val ms = math.round(sec * 1000)
    val sep = if (vttDot) "." else ","
    f"${ms / 3600000}%02d:${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d$sep${ms % 1000}%03d"
  }

  /** Serialize `lines` as an SRT file, one cue per line, 2 s cues. */
  def writeSrt(lines: Seq[String]): Array[Byte] = {
    require(lines.nonEmpty, "writeSrt needs at least one cue")
    lines.zipWithIndex.map { case (l, i) =>
      s"${i + 1}\n${stamp(i * 2.0, vttDot = false)} --> " +
        s"${stamp(i * 2.0 + 2.0, vttDot = false)}\n$l\n"
    }.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Serialize `lines` as a WebVTT file, one cue per line, 2 s cues,
    * with a NOTE block planted so the skip path is always exercised. */
  def writeVtt(lines: Seq[String]): Array[Byte] = {
    require(lines.nonEmpty, "writeVtt needs at least one cue")
    val cues = lines.zipWithIndex.map { case (l, i) =>
      s"${stamp(i * 2.0, vttDot = true)} --> " +
        s"${stamp(i * 2.0 + 2.0, vttDot = true)}\n$l\n"
    }.mkString("\n")
    s"WEBVTT\n\nNOTE generated by graft\n\n$cues"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}
