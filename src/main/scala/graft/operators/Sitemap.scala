package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Dataset}

/** Sitemap ingestion — the crawl-frontier source (sitemaps.org
  * protocol): a `<urlset>` yields page entries with their freshness
  * metadata, a `<sitemapindex>` yields child sitemap locations; a
  * large-scale crawler alternates EXPAND (index → children) and EMIT
  * (urlset → frontier rows) until the index tree is drained.
  *
  * Bounded scan on the shared [[Xml]] primitives: `<url>`/`<sitemap>`
  * regions framed literally, `loc` required per entry (a sitemap row
  * without a location is malformed — fail loudly), `lastmod` /
  * `changefreq` / `priority` optional and surfaced verbatim (absence
  * is an empty string, not a guess).
  *
  * [[expand]] is the distributed face: one narrow pass over fetched
  * sitemap payloads, each expanding to its entry rows (`kind` = `url`
  * or `sitemap`) — zero shuffle, linear in sitemap bytes; the
  * `sitemap` rows are the next fetch round's input, the `url` rows
  * join the frontier [[Robots.filterAllowed]] filters. */
object Sitemap {

  /** One frontier row: child-sitemap or page location + metadata. */
  final case class SitemapEntry(kind: String, loc: String,
      lastmod: String, changefreq: String, priority: String)

  /** Parse one sitemap payload: Left(child locations) for an index,
    * Right(page entries) for a urlset. */
  def parseSitemap(bytes: Array[Byte], mediaId: Long = -1L)
      : Either[Seq[String], Seq[SitemapEntry]] = {
    val s = new String(bytes, UTF_8)
    if (Xml.openAt(s, "sitemapindex", 0) >= 0)
      Left(Xml.regions(s, "sitemap", mediaId).map { block =>
        Xml.elemText(block, "loc", mediaId).filter(_.nonEmpty).getOrElse(
          throw new IllegalArgumentException(
            s"media $mediaId: <sitemap> entry without a <loc>"))
      })
    else if (Xml.openAt(s, "urlset", 0) >= 0)
      Right(Xml.regions(s, "url", mediaId).map { block =>
        SitemapEntry("url",
          Xml.elemText(block, "loc", mediaId).filter(_.nonEmpty).getOrElse(
            throw new IllegalArgumentException(
              s"media $mediaId: <url> entry without a <loc>")),
          Xml.elemText(block, "lastmod", mediaId).getOrElse(""),
          Xml.elemText(block, "changefreq", mediaId).getOrElse(""),
          Xml.elemText(block, "priority", mediaId).getOrElse(""))
      })
    else throw new IllegalArgumentException(
      s"media $mediaId: neither a <urlset> nor a <sitemapindex> root")
  }

  /** Distributed expansion of fetched sitemaps: (source url, payload)
    * → one row per entry — (`source`, `kind`, `loc`, `lastmod`,
    * `changefreq`, `priority`), child sitemaps as `kind = 'sitemap'`
    * rows with empty metadata. An unparseable payload is ONE flagged
    * `kind = 'error'` row with a null loc — failure isolation at the
    * sitemap grain, the bridge contract. */
  def expand(fetched: Dataset[(String, Array[Byte])]): DataFrame = {
    import fetched.sparkSession.implicits._
    fetched.mapPartitions(_.flatMap { case (source, bytes) =>
        val parsed =
          try Some(parseSitemap(bytes, -1L))
          catch { case _: Exception => None }
        parsed match {
          case None =>
            Iterator((source, "error", null: String, "", "", ""))
          case Some(Left(children)) => children.iterator.map(c =>
            (source, "sitemap", c, "", "", ""))
          case Some(Right(entries)) => entries.iterator.map(e =>
            (source, e.kind, e.loc, e.lastmod, e.changefreq, e.priority))
        }
      })
      .toDF("source", "kind", "loc", "lastmod", "changefreq", "priority")
  }

  // -- generators (staging/spec counterparts) -------------------------------

  /** Serialize page entries as a VALID urlset sitemap. */
  def writeUrlset(entries: Seq[(String, String, String, String)]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      .append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">")
    for ((loc, lastmod, changefreq, priority) <- entries) {
      sb.append("<url><loc>").append(Xml.escape(loc)).append("</loc>")
      if (lastmod.nonEmpty)
        sb.append("<lastmod>").append(lastmod).append("</lastmod>")
      if (changefreq.nonEmpty)
        sb.append("<changefreq>").append(changefreq).append("</changefreq>")
      if (priority.nonEmpty)
        sb.append("<priority>").append(priority).append("</priority>")
      sb.append("</url>")
    }
    sb.append("</urlset>")
    sb.result().getBytes(UTF_8)
  }

  /** Serialize child locations as a VALID sitemapindex. */
  def writeIndex(children: Seq[String]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      .append("<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">")
    for (c <- children)
      sb.append("<sitemap><loc>").append(Xml.escape(c))
        .append("</loc><lastmod>2026-01-01</lastmod></sitemap>")
    sb.append("</sitemapindex>")
    sb.result().getBytes(UTF_8)
  }
}
