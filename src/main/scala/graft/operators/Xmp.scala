package graft.operators

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

/** XMP packet extraction — the cross-format provenance/rights face of
  * the media catalog. XMP (ISO 16684-1) serializes Dublin Core and
  * rights properties as RDF/XML inside an `x:xmpmeta` packet that
  * rides JPEG `APP1` (header `http://ns.adobe.com/xap/1.0/\0`), PNG
  * `iTXt` (keyword `XML:com.adobe.xmp`), PDF metadata streams, and
  * more — one grammar, many carriers, like the EXIF TIFF-structure
  * walk ([[Exif]]).
  *
  * [[props]] lifts the two spec serialization forms off every
  * `rdf:Description` block, in document order: property ATTRIBUTES on
  * the Description tag (any `prefix:local` attribute that is not
  * `xmlns`/`xml`/`rdf` namespace plumbing), then property child
  * ELEMENTS — direct text, or the first-level `rdf:li` items of an
  * `rdf:Alt`/`rdf:Seq`/`rdf:Bag` container joined by `"; "` (the
  * multi-valued creator/subject shape). A property element nesting
  * other markup than a li-container is structure this catalog does
  * not model and is skipped — absence, not error; malformed framing
  * (an unterminated tag or container) throws.
  *
  * Reference scope: treynr/eggv has no media tier; the curated-props
  * design mirrors [[Exif]]'s curated-tag walk. */
object Xmp {

  /** JPEG APP1 XMP header (NUL-terminated namespace URI). */
  val JpegHeader: Array[Byte] =
    "http://ns.adobe.com/xap/1.0/".getBytes(US_ASCII) :+ 0.toByte

  /** PNG iTXt keyword carrying the packet. */
  val PngKeyword = "XML:com.adobe.xmp"

  /** (property, value) pairs of an XMP packet, document order. */
  def props(xml: String, mediaId: Long = -1L): Vector[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    var i = 0
    var continue = true
    while (continue) {
      val at = Xml.openAt(xml, "rdf:Description", i)
      if (at < 0) continue = false
      else {
        val gt = xml.indexOf('>', at)
        require(gt >= 0, s"media $mediaId: unterminated rdf:Description tag")
        val selfClosed = xml.charAt(gt - 1) == '/'
        val openTag = xml.substring(at, gt)
        // attribute form: prefix:local="value" on the Description tag
        val attrPat =
          java.util.regex.Pattern.compile("([A-Za-z_][\\w.-]*:[\\w.-]+)\\s*=\\s*\"([^\"]*)\"")
        val m = attrPat.matcher(openTag)
        while (m.find()) {
          val name = m.group(1)
          val prefix = name.substring(0, name.indexOf(':'))
          if (prefix != "xmlns" && prefix != "xml" && prefix != "rdf")
            out += ((name, Xml.decode(m.group(2), mediaId)))
        }
        if (selfClosed) i = gt + 1
        else {
          val end = xml.indexOf("</rdf:Description>", gt + 1)
          require(end >= 0,
            s"media $mediaId: rdf:Description without its closer")
          elementProps(xml.substring(gt + 1, end), mediaId, out)
          i = end + "</rdf:Description>".length
        }
      }
    }
    out.result()
  }

  /** Property child elements of one Description body. */
  private def elementProps(body: String, mediaId: Long,
      out: scala.collection.mutable.Builder[(String, String), Vector[(String, String)]]): Unit = {
    var i = 0
    while (i < body.length) {
      val lt = body.indexOf('<', i)
      if (lt < 0) return
      val nameEnd = {
        var j = lt + 1
        while (j < body.length && !" \t\n\r/>".contains(body.charAt(j))) j += 1
        j
      }
      val name = body.substring(lt + 1, nameEnd)
      if (name.isEmpty || !name.contains(':') || name.startsWith("rdf:")) {
        // not a property element (comment, structure noise): skip tag
        val gt = body.indexOf('>', lt)
        require(gt >= 0, s"media $mediaId: unterminated tag in XMP body")
        i = gt + 1
      } else {
        val gt = body.indexOf('>', nameEnd)
        require(gt >= 0, s"media $mediaId: unterminated <$name> tag")
        if (body.charAt(gt - 1) == '/') { // <prefix:local/> = empty value
          out += ((name, ""))
          i = gt + 1
        } else {
          val closer = "</" + name + ">"
          val end = body.indexOf(closer, gt + 1)
          require(end >= 0, s"media $mediaId: <$name> without its closer")
          val inner = body.substring(gt + 1, end)
          if (inner.indexOf('<') < 0)
            out += ((name, Xml.decode(inner, mediaId)))
          else {
            val containered =
              Seq("rdf:Alt", "rdf:Seq", "rdf:Bag").exists(c =>
                Xml.openAt(inner, c, 0) >= 0)
            if (containered) {
              val lis = Xml.regions(inner, "rdf:li", mediaId)
              out += ((name, lis.map(Xml.decode(_, mediaId)).mkString("; ")))
            } // other nested structure: not modeled, skipped
          }
          i = end + closer.length
        }
      }
    }
  }

  /** XMP props of a JPEG via the APP1 marker walk (the [[Exif]] walk's
    * sibling, selecting the `xap` header instead of `Exif\0\0`); a
    * JPEG without an XMP APP1 is empty, not an error. */
  def jpegXmp(b: Array[Byte], mediaId: Long = -1L): Vector[(String, String)] = {
    require(b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
      s"media $mediaId: JPEG SOI missing")
    var p = 2
    while (p + 4 <= b.length) {
      require((b(p) & 0xff) == 0xff, s"media $mediaId: JPEG marker desync at $p")
      val mk = b(p + 1) & 0xff
      if (mk == 0xd9 || mk == 0xda) return Vector.empty
      val len = ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
      require(len >= 2 && p + 2 + len <= b.length,
        s"media $mediaId: JPEG segment overruns")
      if (mk == 0xe1 && len >= 2 + JpegHeader.length &&
        java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(b, p + 4, p + 4 + JpegHeader.length),
          JpegHeader))
        return props(new String(b, p + 4 + JpegHeader.length,
          len - 2 - JpegHeader.length, UTF_8), mediaId)
      p += 2 + len
    }
    Vector.empty
  }

  // -- generator (staging/spec counterpart) ---------------------------------

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** One property to plant: element form with a direct value, an
    * rdf container of li items, or the attribute form. */
  sealed trait Prop { def name: String }
  final case class Text(name: String, value: String) extends Prop
  final case class Items(name: String, container: String,
      values: Seq[String]) extends Prop
  final case class Attr(name: String, value: String) extends Prop

  /** Serialize a VALID XMP packet carrying the given props on one
    * rdf:Description (attribute-form props on the tag, the rest as
    * children, document order preserved within each form). */
  def writePacket(ps: Seq[Prop]): String = {
    val attrs = ps.collect { case Attr(n, v) => s"""$n="${esc(v)}"""" }
    val elems = ps.collect {
      case Text(n, v) => s"<$n>${esc(v)}</$n>"
      case Items(n, c, vs) =>
        vs.map(v => s"<rdf:li>${esc(v)}</rdf:li>")
          .mkString(s"<$n><rdf:$c>", "", s"</rdf:$c></$n>")
    }
    "<?xpacket begin=\"\uFEFF\" id=\"W5M0MpCehiHzreSzNTczkc9d\"?>" +
      "<x:xmpmeta xmlns:x=\"adobe:ns:meta/\">" +
      "<rdf:RDF xmlns:rdf=\"http://www.w3.org/1999/02/22-rdf-syntax-ns#\">" +
      "<rdf:Description rdf:about=\"\"" +
      " xmlns:dc=\"http://purl.org/dc/elements/1.1/\"" +
      " xmlns:xmp=\"http://ns.adobe.com/xap/1.0/\"" +
      " xmlns:cc=\"http://creativecommons.org/ns#\"" +
      (if (attrs.isEmpty) "" else attrs.mkString(" ", " ", "")) + ">" +
      elems.mkString +
      "</rdf:Description></rdf:RDF></x:xmpmeta><?xpacket end=\"w\"?>"
  }

  /** Wrap a packet as a metadata-bearing JPEG (SOI, JFIF APP0, the
    * xap APP1, EOI) — the carrier counterpart of
    * [[Exif.writeJpegExif]]. */
  def writeXmpJpeg(packet: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    def seg(marker: Int, payload: Array[Byte]): Unit = {
      out.write(0xff); out.write(marker)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write(payload, 0, payload.length)
    }
    out.write(0xff); out.write(0xd8)
    seg(0xe0, ("JFIF".getBytes(US_ASCII) :+ 0.toByte) ++
      Array[Byte](1, 2, 0, 0, 1, 0, 1, 0, 0))
    seg(0xe1, JpegHeader ++ packet.getBytes(UTF_8))
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }
}
