package graft.operators

import java.nio.charset.{Charset, StandardCharsets}
import java.util.Locale

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM RFC 5322 / MIME email extraction — the mail-archive
  * carrier (`message/rfc822` responses, `.eml` attachments, and the
  * classic `application/mbox` mailbox framing around them).
  *
  * The walk is the honest subset a text pipeline needs, not a mail
  * client: headers unfold (RFC 5322 §2.2.3) and the address/subject
  * lines decode RFC 2047 encoded-words (`=?charset?B|Q?...?=`, with
  * the whitespace-between-encoded-words elision); bodies walk the
  * MIME tree (the multipart family by boundary delimiter lines,
  * `message/rfc822` recursively), each leaf transfer-decoded
  * (quoted-printable with soft breaks and transport-padding strip,
  * base64, or identity) and charset-decoded (UTF-8 exactly; the
  * latin-1 family byte-for-byte, the [[Rtf]] stance). Every
  * `text/plain` leaf that is not an explicit attachment contributes,
  * in walk order, newline-joined; when none exists the FIRST
  * `text/html` leaf is surfaced raw for the engine's codegen
  * `htmlToText` strip (same split the archive walk uses). Trailing
  * newlines of a text leaf are shed — document canonicalization, the
  * CRLF before a boundary belongs to the framing.
  *
  * Fail-loudly contract: a payload without a parseable header block,
  * a multipart body without its closing delimiter, an unknown
  * transfer encoding or charset, or malformed QP/base64 throws
  * `IllegalArgumentException` naming the media id; the warc bridges
  * degrade to flagged rows ([[graft.io.Warc.toDocumentsEml]]). */
object Eml {

  /** Decoded message: RFC 2047-decoded subject/from/to, the raw date
    * header, and the best body — `text` when any text/plain leaf
    * exists (all of them, walk order), else `html` carries the first
    * text/html leaf (exactly one of the two is non-null unless the
    * message has no text leaf at all). */
  case class EmlMessage(subject: String, from: String, to: String,
      date: String, text: String, html: String)

  def parseEml(bytes: Array[Byte], mediaId: Long = -1L): EmlMessage = {
    val t = new String(bytes, StandardCharsets.ISO_8859_1)
      .replace("\r\n", "\n")
    val (headers, body) = splitMessage(t, mediaId)
    require(headers.nonEmpty, s"media $mediaId: no RFC 5322 headers")
    val plains = ArrayBuffer.empty[String]
    val htmls = ArrayBuffer.empty[String]
    collectParts(headers, body, mediaId, 0, plains, htmls)
    EmlMessage(
      decodeWords(hdr(headers, "subject").orNull, mediaId),
      decodeWords(hdr(headers, "from").orNull, mediaId),
      decodeWords(hdr(headers, "to").orNull, mediaId),
      hdr(headers, "date").orNull,
      if (plains.nonEmpty) plains.mkString("\n") else null,
      if (plains.isEmpty && htmls.nonEmpty) htmls.head else null)
  }

  // -- message framing ----------------------------------------------------

  /** Header block / body split at the first blank line (a message with
    * no blank line is all headers, RFC 5322 allows an absent body). */
  private[operators] def splitMessage(t: String, mediaId: Long): (Seq[(String, String)], String) = {
    val at = t.indexOf("\n\n")
    if (at < 0) (parseHeaders(t, mediaId), "")
    else (parseHeaders(t.substring(0, at), mediaId), t.substring(at + 2))
  }

  /** Unfolded (name → value) pairs in order, names lowercased. A
    * continuation line keeps its leading WSP (unfolding removes only
    * the line break); a non-continuation line without a colon is a
    * framing error. */
  private[operators] def parseHeaders(block: String, mediaId: Long): Seq[(String, String)] = {
    val out = ArrayBuffer.empty[(String, String)]
    for (line <- block.split("\n", -1) if line.nonEmpty) {
      if (line.charAt(0) == ' ' || line.charAt(0) == '\t') {
        require(out.nonEmpty,
          s"media $mediaId: header continuation before any header")
        val (n, v) = out(out.length - 1)
        out(out.length - 1) = (n, v + line)
      } else {
        val c = line.indexOf(':')
        require(c > 0, s"media $mediaId: malformed header line")
        out += ((line.substring(0, c).trim.toLowerCase(Locale.ROOT),
          line.substring(c + 1).trim))
      }
    }
    out.toSeq
  }

  private[operators] def hdr(headers: Seq[(String, String)], name: String): Option[String] =
    headers.collectFirst { case (n, v) if n == name => v }

  /** The media type of a Content-Type value (parameters dropped,
    * lowercased); an absent header is `text/plain` (RFC 2045 §5.2). */
  private[operators] def mimeTypeOf(headers: Seq[(String, String)]): String =
    hdr(headers, "content-type")
      .map(_.split(";")(0).trim.toLowerCase(Locale.ROOT))
      .getOrElse("text/plain")

  /** A `name=value` parameter of a structured header value, quoting
    * honored, name case-insensitive. */
  private[operators] def paramOf(value: String, name: String): Option[String] =
    value.split(";").iterator.drop(1).map(_.trim).collectFirst {
      case p if p.toLowerCase(Locale.ROOT).startsWith(name + "=") =>
        val v = p.substring(name.length + 1).trim
        if (v.length >= 2 && v.charAt(0) == '"' && v.charAt(v.length - 1) == '"')
          v.substring(1, v.length - 1)
        else v
    }

  // -- MIME tree walk -----------------------------------------------------

  private def collectParts(headers: Seq[(String, String)], body: String,
      mediaId: Long, depth: Int, plains: ArrayBuffer[String],
      htmls: ArrayBuffer[String]): Unit = {
    require(depth <= 8, s"media $mediaId: MIME nesting deeper than 8")
    val mime = mimeTypeOf(headers)
    val cte = hdr(headers, "content-transfer-encoding")
      .map(_.trim.toLowerCase(Locale.ROOT)).getOrElse("7bit")
    val attachment = hdr(headers, "content-disposition")
      .exists(_.split(";")(0).trim.equalsIgnoreCase("attachment"))
    if (mime.startsWith("multipart/")) {
      // a composite body is identity-encoded by definition (RFC 2045 §6.4)
      require(cte == "7bit" || cte == "8bit" || cte == "binary",
        s"media $mediaId: multipart with transfer encoding '$cte'")
      val boundary = paramOf(hdr(headers, "content-type").get, "boundary")
        .getOrElse(throw new IllegalArgumentException(
          s"media $mediaId: multipart without a boundary parameter"))
      for (part <- splitParts(body, boundary, mediaId)) {
        val (ph, pb) = splitMessage(part, mediaId)
        collectParts(ph, pb, mediaId, depth + 1, plains, htmls)
      }
    } else if (mime == "message/rfc822") {
      require(cte == "7bit" || cte == "8bit" || cte == "binary",
        s"media $mediaId: embedded message with transfer encoding '$cte'")
      val (ih, ib) = splitMessage(body, mediaId)
      collectParts(ih, ib, mediaId, depth + 1, plains, htmls)
    } else if ((mime == "text/plain" || mime == "text/html") && !attachment) {
      val raw = transferDecode(body, cte, mediaId)
      val cs = charsetOf(hdr(headers, "content-type")
        .flatMap(paramOf(_, "charset")).getOrElse("us-ascii"), mediaId)
      var s = new String(raw, cs)
      while (s.nonEmpty && s.charAt(s.length - 1) == '\n')
        s = s.substring(0, s.length - 1)
      if (mime == "text/plain") plains += s else htmls += s
    } // any other leaf (or an attached text part): not body text
  }

  /** Parts of a multipart body: content between `--boundary` delimiter
    * lines, closed by `--boundary--` (preamble and epilogue dropped;
    * an unterminated body is a framing error — a sequential reader
    * cannot tell a lost part from a truncated archive). */
  private[operators] def splitParts(body: String, boundary: String, mediaId: Long): Seq[String] = {
    val delim = "--" + boundary
    val parts = ArrayBuffer.empty[ArrayBuffer[String]]
    var cur: ArrayBuffer[String] = null
    var closed = false
    val it = body.split("\n", -1).iterator
    while (it.hasNext && !closed) {
      val line = it.next()
      val l = line.replaceAll("[ \\t]+$", "")
      if (l == delim + "--") { closed = true; cur = null }
      else if (l == delim) { cur = ArrayBuffer.empty[String]; parts += cur }
      else if (cur != null) cur += line
    }
    require(closed,
      s"media $mediaId: multipart body missing its closing delimiter")
    parts.map(_.mkString("\n")).toSeq
  }

  // -- transfer encodings -------------------------------------------------

  private[operators] def transferDecode(body: String, cte: String, mediaId: Long): Array[Byte] =
    cte match {
      case "7bit" | "8bit" | "binary" | "" =>
        body.getBytes(StandardCharsets.ISO_8859_1)
      case "base64" =>
        try java.util.Base64.getDecoder.decode(body.replaceAll("\\s", ""))
        catch { case e: IllegalArgumentException =>
          throw new IllegalArgumentException(
            s"media $mediaId: malformed base64 body: ${e.getMessage}") }
      case "quoted-printable" => qpDecode(body, mediaId)
      case other => throw new IllegalArgumentException(
        s"media $mediaId: unknown transfer encoding '$other'")
    }

  /** RFC 2045 §6.7 quoted-printable: `=XX` hex escapes, `=` at end of
    * line is a soft break, transport-padding WSP at line ends strips. */
  private[graft] def qpDecode(body: String, mediaId: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    val lines = body.split("\n", -1)
    var li = 0
    while (li < lines.length) {
      var line = lines(li).replaceAll("[ \\t]+$", "")
      val soft = line.endsWith("=")
      if (soft) line = line.substring(0, line.length - 1)
      var i = 0
      while (i < line.length) {
        val c = line.charAt(i)
        if (c == '=') {
          require(i + 2 < line.length,
            s"media $mediaId: truncated quoted-printable escape")
          val v = try Integer.parseInt(line.substring(i + 1, i + 3), 16)
            catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"media $mediaId: malformed quoted-printable escape") }
          out.write(v); i += 3
        } else { out.write(c.toInt); i += 1 }
      }
      if (!soft && li < lines.length - 1) out.write('\n')
      li += 1
    }
    out.toByteArray
  }

  private[operators] def charsetOf(name: String, mediaId: Long): Charset =
    name.trim.toLowerCase(Locale.ROOT) match {
      case "utf-8" | "utf8" => StandardCharsets.UTF_8
      case "us-ascii" | "ascii" | "iso-8859-1" | "latin1" | "latin-1" |
           "windows-1252" | "cp1252" => // the ANSI family reads latin-1
        StandardCharsets.ISO_8859_1   // here, exact for its shared range
      case other => throw new IllegalArgumentException(
        s"media $mediaId: unsupported charset '$other'")
    }

  // -- RFC 2047 encoded-words ----------------------------------------------

  private val EncWord = "=\\?([^? \\t]+)\\?([BbQq])\\?([^? \\t]*)\\?=".r

  /** Decode every encoded-word in a header value; linear whitespace
    * BETWEEN two encoded-words is elided first (RFC 2047 §6.2 — it
    * exists only to satisfy the 76-char word limit). */
  private[graft] def decodeWords(value: String, mediaId: Long = -1L): String = {
    if (value == null) return null
    val elided = value.replaceAll("(?<=\\?=)[ \\t]+(?==\\?)", "")
    EncWord.replaceAllIn(elided, m => {
      val cs = charsetOf(m.group(1), mediaId)
      val bytes =
        if (m.group(2).equalsIgnoreCase("B"))
          try java.util.Base64.getDecoder.decode(m.group(3))
          catch { case _: IllegalArgumentException =>
            throw new IllegalArgumentException(
              s"media $mediaId: malformed B encoded-word") }
        else {
          val q = m.group(3)
          val out = new java.io.ByteArrayOutputStream
          var i = 0
          while (i < q.length) {
            val c = q.charAt(i)
            if (c == '_') { out.write(0x20); i += 1 }
            else if (c == '=') {
              require(i + 2 < q.length,
                s"media $mediaId: truncated Q encoded-word escape")
              out.write(Integer.parseInt(q.substring(i + 1, i + 3), 16))
              i += 3
            } else { out.write(c.toInt); i += 1 }
          }
          out.toByteArray
        }
      scala.util.matching.Regex.quoteReplacement(new String(bytes, cs))
    })
  }

  // -- mbox framing ---------------------------------------------------------

  /** Messages of a classic mbox: split at `From ` separator lines (at
    * start-of-file or after a blank line), mboxrd `>From ` stuffing
    * reversed, the blank separator line shed from each message tail. */
  def mboxMessages(bytes: Array[Byte], mediaId: Long = -1L): Seq[Array[Byte]] = {
    val t = new String(bytes, StandardCharsets.ISO_8859_1)
      .replace("\r\n", "\n")
    require(t.startsWith("From "),
      s"media $mediaId: mbox must open with a 'From ' separator line")
    val msgs = ArrayBuffer.empty[ArrayBuffer[String]]
    var prevBlank = true
    for (line <- t.split("\n", -1)) {
      if (prevBlank && line.startsWith("From ")) msgs += ArrayBuffer.empty
      else msgs(msgs.length - 1) +=
        (if (line.matches("^>+From .*")) line.substring(1) else line)
      prevBlank = line.isEmpty
    }
    msgs.map { ls =>
      while (ls.nonEmpty && ls(ls.length - 1).isEmpty) ls.remove(ls.length - 1)
      ls.mkString("\n").getBytes(StandardCharsets.ISO_8859_1)
    }.toSeq
  }

  // -- generators (staging/spec counterparts) -------------------------------

  private def b64Word(s: String): String =
    "=?UTF-8?B?" + java.util.Base64.getEncoder
      .encodeToString(s.getBytes(StandardCharsets.UTF_8)) + "?="

  private def qWord(s: String): String =
    "=?UTF-8?Q?" + s.getBytes(StandardCharsets.UTF_8).map { b =>
      val c = b & 0xff
      if (c == ' ') "_"
      else if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9')) c.toChar.toString
      else f"=$c%02X"
    }.mkString + "?="

  private[graft] def qpEncode(text: String): String =
    text.split("\n", -1).map { line =>
      val sb = new StringBuilder
      var col = 0
      def emit(tok: String): Unit = {
        if (col + tok.length > 72) { sb.append("=\n"); col = 0 }
        sb.append(tok); col += tok.length
      }
      val bytes = line.getBytes(StandardCharsets.UTF_8)
      var i = 0
      while (i < bytes.length) {
        val c = bytes(i) & 0xff
        val last = i == bytes.length - 1
        if (c == '=' || c < 32 || c > 126 || ((c == ' ' || c == '\t') && last))
          emit(f"=$c%02X")
        else emit(c.toChar.toString)
        i += 1
      }
      sb.result()
    }.mkString("\n")

  private def htmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  private def b64Body(bytes: Array[Byte]): String =
    java.util.Base64.getMimeEncoder(76, Array('\n'.toByte))
      .encodeToString(bytes)

  /** Serialize a VALID message with the given body text, cycling the
    * MIME shapes that put every decode path on the oracle path:
    * variant 0 = plain 8bit; 1 = multipart/alternative with a
    * quoted-printable text/plain and a text/html (the plain wins);
    * 2 = multipart/mixed nesting an alternative of base64 text parts
    * plus a base64 attachment (skipped); 3 = text/html only, QP (the
    * codegen `htmlToText` fallback). Subjects always travel as RFC
    * 2047 encoded-words — B on even variants, Q on odd. */
  def writeEml(variant: Int, subject: String, from: String, to: String,
      date: String, bodyText: String): Array[Byte] = {
    val subj = if (variant % 2 == 0) b64Word(subject) else qWord(subject)
    val head = s"From: $from\nTo: $to\nDate: $date\nSubject: $subj\n" +
      "MIME-Version: 1.0\n"
    val html = bodyText.split("\n", -1)
      .map(l => "<p>" + htmlEscape(l) + "</p>").mkString
    val msg = (variant & 3) match {
      case 0 =>
        head + "Content-Type: text/plain; charset=utf-8\n" +
          "Content-Transfer-Encoding: 8bit\n\n" + bodyText + "\n"
      case 1 =>
        val b = "=_graft_alt"
        head + s"""Content-Type: multipart/alternative; boundary="$b"""" +
          "\n\npreamble is ignored\n" +
          s"--$b\nContent-Type: text/plain; charset=utf-8\n" +
          "Content-Transfer-Encoding: quoted-printable\n\n" +
          qpEncode(bodyText) + s"\n--$b\n" +
          "Content-Type: text/html; charset=utf-8\n" +
          "Content-Transfer-Encoding: quoted-printable\n\n" +
          qpEncode(html) + s"\n--$b--\nepilogue is ignored\n"
      case 2 =>
        val bo = "=_graft_mix"; val bi = "=_graft_alt"
        head + s"""Content-Type: multipart/mixed; boundary="$bo"""" +
          s"\n\n--$bo\n" +
          s"""Content-Type: multipart/alternative; boundary="$bi"""" +
          s"\n\n--$bi\n" +
          "Content-Type: text/plain; charset=utf-8\n" +
          "Content-Transfer-Encoding: base64\n\n" +
          b64Body(bodyText.getBytes(StandardCharsets.UTF_8)) +
          s"\n--$bi\n" +
          "Content-Type: text/html; charset=utf-8\n" +
          "Content-Transfer-Encoding: base64\n\n" +
          b64Body(html.getBytes(StandardCharsets.UTF_8)) +
          s"\n--$bi--\n--$bo\n" +
          "Content-Type: application/pdf\n" +
          "Content-Transfer-Encoding: base64\n" +
          "Content-Disposition: attachment; filename=\"a.pdf\"\n\n" +
          b64Body(Array.tabulate(64)(_.toByte)) +
          s"\n--$bo--\n"
      case _ =>
        head + "Content-Type: text/html; charset=utf-8\n" +
          "Content-Transfer-Encoding: quoted-printable\n\n" +
          qpEncode(html) + "\n"
    }
    msg.getBytes(StandardCharsets.ISO_8859_1)
  }

  /** Serialize messages as a classic mbox: `From ` separator lines,
    * mboxrd stuffing of in-body `From `/`>From ` lines, one blank
    * separator line after each message. */
  def writeMbox(messages: Seq[Array[Byte]]): Array[Byte] = {
    val sb = new StringBuilder
    for (m <- messages) {
      sb.append("From graft@corpus.test Thu Jan  1 00:00:00 2026\n")
      val t = new String(m, StandardCharsets.ISO_8859_1).replace("\r\n", "\n")
      for (line <- t.split("\n", -1))
        sb.append(if (line.matches("^>*From .*")) ">" + line else line)
          .append('\n')
      sb.append('\n')
    }
    sb.result().getBytes(StandardCharsets.ISO_8859_1)
  }
}
