package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.operators.Sitemap

/** Sitemap ingestion: urlset and index parsing, metadata verbatim,
  * fail-loud boundaries, the distributed expansion. */
class SitemapSpec extends SparkSpec {

  test("writeUrlset/parseSitemap round-trips entries and metadata") {
    val entries = Seq(
      ("http://s.test/a", "2026-01-02", "daily", "0.8"),
      ("http://s.test/b?x=1&y=2", "", "", ""))
    val Right(back) = Sitemap.parseSitemap(Sitemap.writeUrlset(entries), 1L)
    assert(back == Seq(
      Sitemap.SitemapEntry("url", "http://s.test/a", "2026-01-02",
        "daily", "0.8"),
      Sitemap.SitemapEntry("url", "http://s.test/b?x=1&y=2", "", "", "")))
  }

  test("writeIndex/parseSitemap round-trips child locations") {
    val kids = Seq("http://s.test/sitemap-0.xml", "http://s.test/sitemap-1.xml")
    val Left(back) = Sitemap.parseSitemap(Sitemap.writeIndex(kids), 1L)
    assert(back == kids)
  }

  test("fail-loud: unknown root, entry without loc") {
    intercept[IllegalArgumentException] {
      Sitemap.parseSitemap("<html></html>".getBytes(UTF_8), 1L)
    }
    intercept[IllegalArgumentException] {
      Sitemap.parseSitemap(
        "<urlset><url><lastmod>2026-01-01</lastmod></url></urlset>"
          .getBytes(UTF_8), 2L)
    }
  }

  test("expand: one row per entry, error isolation at the sitemap grain") {
    import spark.implicits._
    val fetched = Seq(
      ("http://a.test/sitemap.xml",
        Sitemap.writeUrlset(Seq(("http://a.test/p1", "2026-01-01", "", "")))),
      ("http://b.test/sitemap.xml",
        Sitemap.writeIndex(Seq("http://b.test/sitemap-0.xml"))),
      ("http://c.test/sitemap.xml", Array[Byte](9, 9, 9))).toDS()
    val out = Sitemap.expand(fetched)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(out.length == 3)
    assert(out(0) == ("http://a.test/sitemap.xml", "url", "http://a.test/p1"))
    assert(out(1) ==
      ("http://b.test/sitemap.xml", "sitemap", "http://b.test/sitemap-0.xml"))
    assert(out(2)._2 == "error" && out(2)._3 == null)
  }
}
