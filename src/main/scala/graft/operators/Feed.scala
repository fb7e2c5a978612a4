package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

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
    Xml.regions(s, itemTag, mediaId).map { block =>
      FeedItem(
        Xml.elemText(block, "title", mediaId).getOrElse(""),
        contentTags.iterator.flatMap(Xml.elemText(block, _, mediaId))
          .nextOption().getOrElse(""))
    }
  }

  /** True when `<tag` opens (with a name boundary) anywhere before the
    * first item — i.e. the document root family. */
  private def hasRoot(s: String, tag: String): Boolean = {
    Xml.openAt(s, tag, 0) >= 0
  }

  /** Character data decode ([[Xml.decode]] — CDATA raw, strict five
    * entities + numeric references), surfaced for the spec battery. */
  private[graft] def xmlDecode(t: String, mediaId: Long = -1L): String =
    Xml.decode(t, mediaId)

  // -- generators (staging/spec counterparts) -------------------------------

  private def xmlEscape(s: String): String = Xml.escape(s)

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
