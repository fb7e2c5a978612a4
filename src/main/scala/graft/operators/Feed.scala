package graft.operators

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Locale

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM web-feed extraction — RSS 2.0 (`application/rss+xml`) and
  * Atom (`application/atom+xml`), the syndication carriers: every
  * `<item>`/`<entry>` is its own prospective document (title +
  * payload), mirroring how a crawler lands on a feed once and yields
  * many articles.
  *
  * The walk is a bounded scan (the [[Docx]] philosophy — no XML
  * parser): item/entry regions are framed by their literal tags, the
  * title and the first content-bearing child (`description` for RSS;
  * `content` then `summary` for Atom) are lifted, CDATA sections pass
  * raw, and character data decodes the FIVE XML entities plus numeric
  * references — strictly, because an unknown entity in a feed is
  * malformed XML, and the tolerant bridge turns that into a flagged
  * row rather than silently wrong text. Feed payloads are web content:
  * the bridge routes them through the SAME codegen `htmlToText` strip
  * crawl HTML takes ([[graft.io.Warc.toDocumentsFeed]]).
  *
  * Fail-loudly contract: a payload with neither an `<rss>` nor a
  * `<feed>` root, an unterminated item/CDATA region, or an unknown
  * entity throws `IllegalArgumentException` naming the media id. */
object Feed {

  /** One syndicated item: the (entity-decoded) title and its raw
    * content payload — typically escaped HTML, the caller strips. */
  case class FeedItem(title: String, content: String)

  def parseFeed(bytes: Array[Byte], mediaId: Long = -1L): Seq[FeedItem] = {
    val s = new String(bytes, UTF_8)
    val (itemTag, contentTags) =
      if (hasRoot(s, "rss")) ("item", Seq("description"))
      else if (hasRoot(s, "feed")) ("entry", Seq("content", "summary"))
      else throw new IllegalArgumentException(
        s"media $mediaId: neither an <rss> nor an Atom <feed> root")
    regions(s, itemTag, mediaId).map { block =>
      FeedItem(
        elemText(block, "title", mediaId).getOrElse(""),
        contentTags.iterator.flatMap(elemText(block, _, mediaId))
          .nextOption().getOrElse(""))
    }
  }

  /** True when `<tag` opens (with a name boundary) anywhere before the
    * first item — i.e. the document root family. */
  private def hasRoot(s: String, tag: String): Boolean = {
    val at = openAt(s, tag, 0)
    at >= 0
  }

  /** Index of the next `<tag` opening with a proper name boundary
    * (whitespace, `>` or `/` follows), or -1. */
  private def openAt(s: String, tag: String, from: Int): Int = {
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
  private def regions(s: String, tag: String, mediaId: Long): Seq[String] = {
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
    * (attributes on the opening tag skipped — Atom's
    * `content type="html"` shape), None when absent. */
  private def elemText(block: String, tag: String, mediaId: Long): Option[String] = {
    val at = openAt(block, tag, 0)
    if (at < 0) return None
    val gt = block.indexOf('>', at)
    require(gt >= 0, s"media $mediaId: unterminated <$tag> tag")
    if (gt > at && block.charAt(gt - 1) == '/') return Some("") // <tag/>
    val end = block.indexOf("</" + tag + ">", gt + 1)
    require(end >= 0, s"media $mediaId: <$tag> without its closer")
    Some(xmlDecode(block.substring(gt + 1, end), mediaId))
  }

  /** Character data: CDATA sections pass raw; outside them the five
    * XML entities and numeric references decode, anything else is
    * malformed. */
  private[graft] def xmlDecode(t: String, mediaId: Long = -1L): String = {
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
          name.toLowerCase(Locale.ROOT) match {
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

  // -- generators (staging/spec counterparts) -------------------------------

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  /** Content payload rendered for a feed: even item ordinals travel
    * XML-escaped, odd ones as CDATA — both decode paths on every
    * staged feed. */
  private def payload(content: String, idx: Int): String =
    if (idx % 2 == 0) xmlEscape(content)
    else "<![CDATA[" + content + "]]>"

  /** Serialize (title, content-HTML) items as a VALID RSS 2.0 feed;
    * channel-level title/link planted so block scoping is always on
    * the oracle path. */
  def writeRss(items: Seq[(String, String)]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      .append("<rss version=\"2.0\"><channel>")
      .append("<title>planted channel</title>")
      .append("<link>http://feed.test/</link>")
    for (((t, c), i) <- items.zipWithIndex)
      sb.append("<item><title>").append(xmlEscape(t)).append("</title>")
        .append("<description>").append(payload(c, i))
        .append("</description>")
        .append("<pubDate>Thu, 01 Jan 2026 00:00:00 +0000</pubDate></item>")
    sb.append("</channel></rss>")
    sb.result().getBytes(UTF_8)
  }

  /** Serialize (title, content-HTML) items as a VALID Atom feed —
    * `<content type="html">` so the attribute-skipping open-tag walk
    * is on the oracle path. */
  def writeAtom(items: Seq[(String, String)]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      .append("<feed xmlns=\"http://www.w3.org/2005/Atom\">")
      .append("<title>planted feed</title>")
      .append("<updated>2026-01-01T00:00:00Z</updated>")
    for (((t, c), i) <- items.zipWithIndex)
      sb.append("<entry><title>").append(xmlEscape(t)).append("</title>")
        .append("<content type=\"html\">").append(payload(c, i))
        .append("</content></entry>")
    sb.append("</feed>")
    sb.result().getBytes(UTF_8)
  }
}
