package graft.operators

import java.nio.charset.StandardCharsets.{ISO_8859_1, US_ASCII}
import java.util.Locale

/** Content-type sniffing — the crawl-reality shim in front of every
  * carrier extractor: real archives serve PDFs as
  * `application/octet-stream`, EPUBs as `binary/octet-stream`, and
  * whole mail spools with no Content-Type at all. The MIME routing the
  * text/media faces dispatch on is only as good as the header, so
  * [[sniffMime]] detects the type from leading magic bytes (and a few
  * text-shaped heuristics), and [[graft.io.Warc.sniffTypes]] rewrites
  * ONLY the generic/absent headers with the sniffed type — a declared
  * specific type always wins; sniffing fills silence, it does not
  * overrule.
  *
  * The ZIP family dispatches by central-directory content (the OOXML
  * trio by their part roots, EPUB by its stored `mimetype` entry), the
  * EBML family by DocType, RIFF by its form tag — each reusing the
  * SAME walkers the extractors run, so a payload sniffed as a type
  * will actually parse as that type downstream. Detection is
  * best-effort by contract: None means "no idea", never an error. */
object Sniff {

  private def ascii(b: Array[Byte], at: Int, len: Int): String =
    if (at + len > b.length) ""
    else new String(b, at, len, US_ASCII)

  /** The sniffed media type of a payload, or None when nothing
    * matches. Never throws. */
  def sniffMime(b: Array[Byte]): Option[String] = {
    if (b == null || b.length < 4) return None
    val m4 = ascii(b, 0, 4)
    // -- containers ----------------------------------------------------
    if (m4 == "%PDF") return Some("application/pdf")
    if (b(0) == 'P' && b(1) == 'K' && b(2) == 3 && b(3) == 4)
      return Some(zipFamily(b))
    if ((b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b)
      return Some("application/gzip")
    if (b.length >= 6 && (b(0) & 0xff) == 0xfd && ascii(b, 1, 4) == "7zXZ" &&
      b(5) == 0) return Some("application/x-xz")
    if ((b(0) & 0xff) == 0x28 && (b(1) & 0xff) == 0xb5 &&
      (b(2) & 0xff) == 0x2f && (b(3) & 0xff) == 0xfd)
      return Some("application/zstd")
    if ((b(0) & 0xff) == 0x04 && (b(1) & 0xff) == 0x22 &&
      (b(2) & 0xff) == 0x4d && (b(3) & 0xff) == 0x18)
      return Some("application/x-lz4")
    if (b.length >= 262 && ascii(b, 257, 5) == "ustar")
      return Some("application/x-tar")
    if (ascii(b, 0, 5) == "WARC/") return Some("application/warc")
    if (Sqlite.isSqlite(b)) return Some("application/vnd.sqlite3")
    // -- images --------------------------------------------------------
    if ((b(0) & 0xff) == 0x89 && ascii(b, 1, 3) == "PNG")
      return Some("image/png")
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff) return Some("image/jpeg")
    if (ascii(b, 0, 4) == "GIF8") return Some("image/gif")
    if (b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0)
      return Some("image/tiff")
    if (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42)
      return Some("image/tiff")
    if (b(0) == 0 && b(1) == 0 && b(2) == 1 && b(3) == 0 &&
      b.length >= 6 && ((b(4) & 0xff) | ((b(5) & 0xff) << 8)) > 0)
      return Some("image/x-icon")
    if (b(0) == 'B' && b(1) == 'M' && b.length >= 14)
      return Some("image/bmp")
    // -- RIFF / IFF families -------------------------------------------
    if (m4 == "RIFF" && b.length >= 12) ascii(b, 8, 4) match {
      case "WAVE" => return Some("audio/wav")
      case "WEBP" => return Some("image/webp")
      case "AVI " => return Some("video/avi")
      case _ => ()
    }
    if (m4 == "FORM" && b.length >= 12 &&
      (ascii(b, 8, 4) == "AIFF" || ascii(b, 8, 4) == "AIFC"))
      return Some("audio/aiff")
    // -- audio / video streams -----------------------------------------
    if (m4 == "fLaC") return Some("audio/flac")
    if (m4 == "OggS") return Some("audio/ogg")
    if ((b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
      (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3)
      return Some(
        try if (Mkv.docTypeOf(b, -1L)._1 == "webm") "video/webm"
          else "video/x-matroska"
        catch { case _: Exception => "video/x-matroska" })
    if (b.length >= 12 && ascii(b, 4, 4) == "ftyp") {
      // HEIF-family still images share the ISO-BMFF magic with movies;
      // the major brand separates them (checked BEFORE the movie rule)
      val brand = ascii(b, 8, 4)
      return Some(
        if (Heif.HeicBrands(brand)) "image/heic"
        else if (Heif.AvifBrands(brand)) "image/avif"
        else if (brand == "mif1") "image/heif"
        else "video/mp4")
    }
    if (ascii(b, 0, 3) == "ID3") return Some("audio/mpeg")
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0 &&
      Mpeg.parseHeader(b, 0, -1L).isDefined) return Some("audio/mpeg")
    // -- text shapes ---------------------------------------------------
    if (ascii(b, 0, 5) == "{\\rtf") return Some("application/rtf")
    textShape(b)
  }

  /** The media type a Content-Disposition FILENAME declares — the
    * third routing signal after the declared type and the magic
    * sniff, for the text formats magic can't claim: a CSV served
    * `application/octet-stream; filename="data.csv"` is printable
    * text to the byte sniffer, but the server told us exactly what it
    * is. RFC 6266 grammar: `filename*` (RFC 5987 ext-value,
    * `charset''percent-encoded`) wins over `filename`; quoted and
    * token forms both accepted. Only extensions with NO reliable
    * magic/structure are mapped — anything the byte sniffer can claim
    * stays its business (a lying filename must not overrule bytes). */
  def filenameMime(disposition: String): Option[String] = {
    if (disposition == null) return None
    val params = disposition.split(";").map(_.trim)
    def valueOf(key: String): Option[String] = params.collectFirst {
      case p if p.toLowerCase(Locale.ROOT).startsWith(key + "=") =>
        p.substring(key.length + 1).trim
    }
    val name = valueOf("filename*").flatMap { ext =>
      // RFC 5987: charset'[lang]'value with %-escapes
      val parts = ext.split("'", 3)
      if (parts.length != 3) None
      else try {
        val cs = if (parts(0).isEmpty) "UTF-8" else parts(0)
        Some(java.net.URLDecoder.decode(parts(2), cs))
      } catch { case _: Exception => None }
    }.orElse(valueOf("filename").map(_.stripPrefix("\"").stripSuffix("\"")))
    name.map(_.toLowerCase(Locale.ROOT)).flatMap { n =>
      val ext = n.substring(n.lastIndexOf('.') + 1)
      ext match {
        case "csv" => Some("text/csv")
        case "md" | "markdown" => Some("text/markdown")
        case "tex" => Some("application/x-tex")
        case "jsonl" | "ndjson" => Some("application/json")
        case "mht" | "mhtml" => Some("multipart/related")
        case "eml" => Some("message/rfc822")
        case "ics" => Some("text/calendar")
        case "vcf" => Some("text/vcard")
        case "vtt" => Some("text/vtt")
        case "srt" => Some("application/x-subrip")
        case _ => None
      }
    }
  }

  /** ZIP dispatch by central-directory content — the same walk the
    * extractors run. An unreadable directory is still a ZIP (the
    * archive branch will flag it). */
  private def zipFamily(b: Array[Byte]): String =
    try {
      val names = Docx.zipEntryOffsets(b, -1L)
      def pkgMime = names.collectFirst { case ("mimetype", cd) =>
        new String(Docx.zipEntryAt(b, cd, "mimetype", -1L), US_ASCII).trim }
      if (pkgMime.contains("application/epub+zip")) "application/epub+zip"
      else if (pkgMime.exists(_.startsWith("application/vnd.oasis.opendocument.")))
        pkgMime.get
      else if (names.exists(_._1.startsWith("word/")))
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
      else if (names.exists(_._1.startsWith("xl/")))
        "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
      else if (names.exists(_._1.startsWith("ppt/")))
        "application/vnd.openxmlformats-officedocument.presentationml.presentation"
      else "application/zip"
    } catch { case _: Exception => "application/zip" }

  /** Heuristics over the leading text (UTF-8-agnostic byte view):
    * markup roots, WebVTT/SRT cue shapes, mbox separators, RFC 5322
    * header blocks, LaTeX preambles; printable-majority falls back to
    * text/plain, anything else is unknown. */
  private def textShape(b: Array[Byte]): Option[String] = {
    val head = new String(b, 0, math.min(b.length, 4096), ISO_8859_1)
    val t = head.replace("\uFEFF", "").dropWhile(c => c == ' ' || c == '\t' ||
      c == '\r' || c == '\n')
    val lower = t.take(256).toLowerCase(Locale.ROOT)
    // YAML front matter (--- then colon lines then ---) is the
    // static-site markdown signature
    if (t.startsWith("---\n") || t.startsWith("---\r\n")) {
      val body = t.substring(t.indexOf('\n') + 1)
      val close = body.indexOf("\n---")
      if (close > 0 && body.substring(0, close).split("\r?\n")
        .forall(l => l.contains(':') || l.trim.isEmpty))
        return Some("text/markdown")
    }
    if (lower.startsWith("<?xml") || lower.startsWith("<")) {
      // markup: route by the first recognized root
      if (lower.contains("<rss")) return Some("application/rss+xml")
      if (lower.contains("<feed")) return Some("application/atom+xml")
      if (lower.contains("<urlset") || lower.contains("<sitemapindex"))
        return Some("application/xml")
      if (lower.contains("<!doctype html") || lower.contains("<html"))
        return Some("text/html")
      if (lower.startsWith("<?xml")) return Some("application/xml")
      return Some("text/html") // bare markup: the html strip degrades well
    }
    // JSON has no magic: claim only a COMPLETE parse (first JSONL line
    // or whole head) — same strict grammar the extractor runs, so a
    // payload sniffed json will parse as json downstream
    if ((t.startsWith("{") || t.startsWith("[")) && Json.sniffJson(b))
      return Some("application/json")
    if (t.startsWith("BEGIN:VCALENDAR")) return Some("text/calendar")
    if (t.startsWith("BEGIN:VCARD")) return Some("text/vcard")
    if (t.startsWith("WEBVTT")) return Some("text/vtt")
    if (t.matches("(?s)\\d+\\r?\\n\\d\\d:\\d\\d:\\d\\d[,.]\\d\\d\\d.*"))
      return Some("application/x-subrip")
    if (head.startsWith("From ") && head.contains("\n\n"))
      return Some("application/mbox")
    if (lower.startsWith("\\documentclass") ||
      lower.contains("\\begin{document}")) return Some("application/x-tex")
    // a mail header block: colon-lines incl. the canonical fields
    val headerBlock = head.split("\n\n", 2)(0)
    // MHTML (saved web page): a MIME head declaring multipart/related
    // — checked BEFORE the rfc822 rule (browser saves carry From/
    // Subject lines too, and the aggregate face owns the format)
    if (headerBlock.toLowerCase(Locale.ROOT).replaceAll("[ \t]", "")
      .contains("content-type:multipart/related"))
      return Some("multipart/related")
    val lines = headerBlock.split("\n").takeWhile(l =>
      l.nonEmpty && (l.contains(':') || l.startsWith(" ") || l.startsWith("\t")))
    if (lines.length >= 3 && {
      val keys = lines.filter(_.contains(':'))
        .map(_.split(":", 2)(0).trim.toLowerCase(Locale.ROOT)).toSet
      keys.contains("subject") && (keys.contains("from") ||
        keys.contains("received") || keys.contains("message-id"))
    }) return Some("message/rfc822")
    // printable-majority text
    val probe = math.min(b.length, 4096)
    var printable = 0
    var i = 0
    while (i < probe) {
      val c = b(i) & 0xff
      if (c == 9 || c == 10 || c == 13 || (c >= 32 && c < 127) || c >= 128)
        printable += 1
      i += 1
    }
    if (probe > 0 && printable.toDouble / probe >= 0.97) Some("text/plain")
    else None
  }
}
