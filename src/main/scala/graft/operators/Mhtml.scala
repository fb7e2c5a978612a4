package graft.operators

import java.util.Locale

/** MHTML (`.mht`/`.mhtml`, RFC 2557 "MIME encapsulation of aggregate
  * documents") — the save-a-page archive every browser writes and a
  * steady presence in shared-document crawls: one MIME message whose
  * `multipart/related` body carries the root HTML plus its resources
  * (images, CSS) as sibling parts addressed by Content-Location /
  * Content-ID. Built ON the [[Eml]] MIME machinery (boundary framing,
  * QP/base64 transfer decode, charset handling) — one parser per
  * format family, the house rule.
  *
  * Root selection per RFC 2557 §4.1: the `start` parameter's
  * Content-ID when present, else the FIRST part; the root must be
  * `text/html` (an aggregate whose root is something else is outside
  * this carrier's contract — loud). Resource parts surface as a
  * (content_location, mime) inventory — the page's asset manifest,
  * next to the HTML.
  *
  * STRICT codec / tolerant bridge: malformed MIME framing, a missing
  * boundary, or a non-HTML root throws IllegalArgumentException naming
  * the media id; [[graft.io.Warc.toDocumentsMhtml]] degrades that one
  * record to a flagged row. */
object Mhtml {

  /** The decoded aggregate: the root part's HTML (transfer- and
    * charset-decoded), its Content-Location (null when absent), and
    * the non-root parts' (content_location, mime) inventory. */
  case class MhtmlDoc(rootHtml: String, rootLocation: String,
      resources: Seq[(String, String)])

  def parse(bytes: Array[Byte], mediaId: Long = -1L): MhtmlDoc = {
    val t = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("\r\n", "\n")
    val (headers, body) = Eml.splitMessage(t, mediaId)
    require(headers.nonEmpty, s"media $mediaId: no MIME headers")
    val mime = Eml.mimeTypeOf(headers)
    require(mime == "multipart/related" || mime == "multipart/mixed",
      s"media $mediaId: MHTML root is '$mime', not multipart/related")
    val ct = Eml.hdr(headers, "content-type").get
    val boundary = Eml.paramOf(ct, "boundary").getOrElse(
      throw new IllegalArgumentException(
        s"media $mediaId: multipart without a boundary parameter"))
    val startCid = Eml.paramOf(ct, "start")
    val parts = Eml.splitParts(body, boundary, mediaId)
      .map(p => Eml.splitMessage(p, mediaId))
    require(parts.nonEmpty, s"media $mediaId: MHTML with no parts")
    def cid(h: Seq[(String, String)]): String =
      Eml.hdr(h, "content-id").map(_.trim).orNull
    val rootIdx = startCid match {
      case Some(s) =>
        val want = s.trim
        val i = parts.indexWhere(p => cid(p._1) == want)
        require(i >= 0,
          s"media $mediaId: start Content-ID '$want' names no part")
        i
      case None => 0
    }
    val (rh, rb) = parts(rootIdx)
    val rootMime = Eml.mimeTypeOf(rh)
    require(rootMime == "text/html",
      s"media $mediaId: MHTML root part is '$rootMime', not text/html")
    val cte = Eml.hdr(rh, "content-transfer-encoding")
      .map(_.trim.toLowerCase(Locale.ROOT)).getOrElse("7bit")
    val raw = Eml.transferDecode(rb, cte, mediaId)
    val cs = Eml.charsetOf(Eml.hdr(rh, "content-type")
      .flatMap(Eml.paramOf(_, "charset")).getOrElse("us-ascii"), mediaId)
    val rootLoc = Eml.hdr(rh, "content-location").map(_.trim).orNull
    val resources = parts.zipWithIndex.collect {
      case ((h, _), i) if i != rootIdx =>
        (Eml.hdr(h, "content-location").map(_.trim).getOrElse(
          Option(cid(h)).getOrElse("")),
          Eml.mimeTypeOf(h))
    }
    MhtmlDoc(new String(raw, cs), rootLoc, resources)
  }

  // -- generator (staging/spec counterpart) -------------------------------

  /** Browser-style MHTML: root HTML quoted-printable under its
    * Content-Location, resources base64 — `start` names the root via
    * Content-ID when `rootFirst` is false (root NOT first, the §4.1
    * selection on the oracle path). */
  def writeMhtml(html: String, location: String,
      resources: Seq[(String, String, Array[Byte])] = Nil,
      rootFirst: Boolean = true): Array[Byte] = {
    val b = "----MultipartBoundary--graft0001----"
    val sb = new StringBuilder()
    val startParam = if (rootFirst) "" else " start=<root@graft>;"
    sb.append("From: <Saved by graft>\r\n")
    sb.append("Subject: saved page\r\n")
    sb.append("MIME-Version: 1.0\r\n")
    sb.append("Content-Type: multipart/related;" + startParam +
      " type=\"text/html\"; boundary=\"" + b + "\"\r\n\r\n")
    def rootPart(): Unit = {
      sb.append("--" + b + "\r\n")
      sb.append("Content-Type: text/html; charset=utf-8\r\n")
      sb.append("Content-Transfer-Encoding: quoted-printable\r\n")
      sb.append("Content-ID: <root@graft>\r\n")
      sb.append("Content-Location: " + location + "\r\n\r\n")
      sb.append(Eml.qpEncode(html).replace("\n", "\r\n") + "\r\n")
    }
    def resPart(loc: String, mime: String, data: Array[Byte]): Unit = {
      sb.append("--" + b + "\r\n")
      sb.append("Content-Type: " + mime + "\r\n")
      sb.append("Content-Transfer-Encoding: base64\r\n")
      sb.append("Content-Location: " + loc + "\r\n\r\n")
      sb.append(java.util.Base64.getMimeEncoder(76, "\r\n".getBytes)
        .encodeToString(data) + "\r\n")
    }
    if (rootFirst) {
      rootPart(); resources.foreach { case (l, m, d) => resPart(l, m, d) }
    } else {
      resources.foreach { case (l, m, d) => resPart(l, m, d) }; rootPart()
    }
    sb.append("--" + b + "--\r\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}
