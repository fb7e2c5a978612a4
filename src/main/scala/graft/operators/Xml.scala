package graft.operators

import scala.collection.mutable.ArrayBuffer

/** Shared bounded-scan XML primitives under the [[Feed]] and
  * [[Sitemap]] walkers — element-region framing and strict character
  * data, deliberately NOT an XML parser (the [[Docx]] philosophy):
  * the walkers name the exact elements they lift, and everything else
  * is framing. */
private[operators] object Xml {

  /** Index of the next `<tag` opening with a proper name boundary
    * (whitespace, `>` or `/` follows), or -1. */
  def openAt(s: String, tag: String, from: Int): Int = {
    var i = from
    while (true) {
      val at = s.indexOf("<" + tag, i)
      if (at < 0) return -1
      val after = at + 1 + tag.length
      if (after >= s.length) return -1
      val c = s.charAt(after)
      if (c == '>' || c == ' ' || c == '\t' || c == '\n' || c == '/')
        return at
      i = at + 1
    }
    -1
  }

  /** The inner text regions of every `<tag>...</tag>` block, in
    * document order (an opened block without its closer is a framing
    * error). */
  def regions(s: String, tag: String, mediaId: Long): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var i = 0
    var continue = true
    while (continue) {
      val at = openAt(s, tag, i)
      if (at < 0) continue = false
      else {
        val gt = s.indexOf('>', at)
        require(gt >= 0, s"media $mediaId: unterminated <$tag> tag")
        val end = s.indexOf("</" + tag + ">", gt + 1)
        require(end >= 0, s"media $mediaId: <$tag> without its closer")
        out += s.substring(gt + 1, end)
        i = end + tag.length + 3
      }
    }
    out.toSeq
  }

  /** Decoded text of the first `<tag ...>...</tag>` child of a block
    * (attributes on the opening tag skipped), None when absent. */
  def elemText(block: String, tag: String, mediaId: Long): Option[String] = {
    val at = openAt(block, tag, 0)
    if (at < 0) return None
    val gt = block.indexOf('>', at)
    require(gt >= 0, s"media $mediaId: unterminated <$tag> tag")
    if (gt > at && block.charAt(gt - 1) == '/') return Some("") // <tag/>
    val end = block.indexOf("</" + tag + ">", gt + 1)
    require(end >= 0, s"media $mediaId: <$tag> without its closer")
    Some(decode(block.substring(gt + 1, end), mediaId))
  }

  /** Character data: CDATA sections pass raw; outside them the five
    * XML entities and numeric references decode, anything else is
    * malformed. */
  def decode(t: String, mediaId: Long): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < t.length) {
      if (t.startsWith("<![CDATA[", i)) {
        val end = t.indexOf("]]>", i + 9)
        require(end >= 0, s"media $mediaId: unterminated CDATA section")
        sb.append(t.substring(i + 9, end))
        i = end + 3
      } else {
        val c = t.charAt(i)
        if (c == '&') {
          val semi = t.indexOf(';', i + 1)
          require(semi > i && semi - i <= 10,
            s"media $mediaId: malformed entity reference")
          val name = t.substring(i + 1, semi)
          name.toLowerCase(java.util.Locale.ROOT) match {
            case "lt" => sb.append('<')
            case "gt" => sb.append('>')
            case "amp" => sb.append('&')
            case "quot" => sb.append('"')
            case "apos" => sb.append('\'')
            case n if n.startsWith("#x") =>
              sb.appendAll(Character.toChars(Integer.parseInt(n.substring(2), 16)))
            case n if n.startsWith("#") =>
              sb.appendAll(Character.toChars(Integer.parseInt(n.substring(1))))
            case other => throw new IllegalArgumentException(
              s"media $mediaId: unknown entity '&$other;'")
          }
          i = semi + 1
        } else { sb.append(c); i += 1 }
      }
    }
    sb.result()
  }

  def escape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }
}
