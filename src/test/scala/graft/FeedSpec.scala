package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.operators.Feed

/** Web-feed extraction: root routing, item/entry framing, entity and
  * CDATA decode, attribute-bearing open tags, channel-scope isolation,
  * fail-loud boundaries — plus the warc bridge. */
class FeedSpec extends SparkSpec {

  private def parse(xml: String): Seq[Feed.FeedItem] =
    Feed.parseFeed(xml.getBytes(UTF_8), 1L)

  test("writeRss/writeAtom round-trip items through both renderings") {
    val items = Seq(("First & last", "<p>one</p>"),
      ("Second <item>", "<p>two & three</p>"),
      ("Third", "<p>4 > 3</p>"))
    for (feed <- Seq(Feed.writeRss(items), Feed.writeAtom(items))) {
      val back = Feed.parseFeed(feed, 1L)
      assert(back.map(i => (i.title, i.content)) == items)
    }
  }

  test("channel/feed-level titles never leak into items") {
    val rss = parse(new String(Feed.writeRss(Seq(("t", "c"))), UTF_8))
    assert(rss == Seq(Feed.FeedItem("t", "c")))
    val atom = parse(new String(Feed.writeAtom(Seq(("t", "c"))), UTF_8))
    assert(atom == Seq(Feed.FeedItem("t", "c")))
  }

  test("atom prefers content over summary; missing children degrade to empty") {
    val entry = """<feed><title>f</title><entry><title>t</title>""" +
      """<summary>sum</summary><content type="html">body</content>""" +
      """</entry><entry><summary>only sum</summary></entry>""" +
      """<entry><title>bare</title></entry></feed>"""
    assert(parse(entry) == Seq(Feed.FeedItem("t", "body"),
      Feed.FeedItem("", "only sum"), Feed.FeedItem("bare", "")))
  }

  test("xmlDecode: entities, numeric refs, CDATA mid-text, fail-loud") {
    assert(Feed.xmlDecode("a &lt;b&gt; &amp;&quot;&apos; &#65;&#x42;") ==
      "a <b> &\"' AB")
    assert(Feed.xmlDecode("pre <![CDATA[raw & <kept>]]> post") ==
      "pre raw & <kept> post")
    intercept[IllegalArgumentException] { Feed.xmlDecode("&nbsp;") }
    intercept[IllegalArgumentException] { Feed.xmlDecode("dangling &amp") }
    intercept[IllegalArgumentException] { Feed.xmlDecode("<![CDATA[open") }
  }

  test("fail-loud framing: unknown root, unterminated item") {
    intercept[IllegalArgumentException] { parse("<html><body/></html>") }
    intercept[IllegalArgumentException] {
      parse("<rss><channel><item><title>t</title></channel></rss>")
    }
  }

  test("warc -> feed e2e: items land as documents, flagged tolerance") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_feed").toString
    graft.io.Warc.writeWarcResponses(
      Seq(
        ("http://f.test/news.rss", "application/rss+xml",
          Feed.writeRss(Seq(("Headline", "<p>story one</p>"),
            ("Update", "<p>story two</p>")))),
        ("http://f.test/blog.atom", "application/atom+xml",
          Feed.writeAtom(Seq(("Post", "<p>entry text</p>")))),
        ("http://f.test/bad.rss", "application/rss+xml",
          Array[Byte](1, 2, 3)))
        .toDF("target_uri", "content_type", "payload"), dir)
    val recs = graft.io.Warc.readWarc(spark, dir)
    val out = graft.io.Warc.toDocumentsFeed(recs)
      .select("url", "text", "extract_ok")
      .as[(String, String, Boolean)].collect().sortBy(_._1)
    assert(out.length == 4)
    assert(out(0)._1.endsWith("bad.rss#") && !out(0)._3 && out(0)._2 == null)
    assert(out(1)._1.endsWith("blog.atom#0") && out(1)._2 == "Post\nentry text")
    assert(out(2)._1.endsWith("news.rss#0") &&
      out(2)._2 == "Headline\nstory one")
    assert(out(3)._1.endsWith("news.rss#1") && out(3)._2 == "Update\nstory two")
    val all = graft.io.Warc.toDocuments(recs)
      .select("url", "text").as[(String, String)].collect().toMap
    assert(all("http://f.test/news.rss#1") == "Update\nstory two")
    assert(!all.contains("http://f.test/bad.rss#"))
  }
}
