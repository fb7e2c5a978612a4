package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.io.Warc
import graft.operators.LinkRank

/** The crawl's frontier graph: redirect edges off 3xx Location
  * headers, outlink edges off anchors (base-tag override, identity
  * canonicalization, authority-less drops), and the surfer rank over
  * the resulting edge list. */
class FrontierGraphSpec extends SparkSpec {
  import spark.implicits._

  test("redirectEdges: absolute, relative, and protocol-relative Locations") {
    val df = Seq(
      ("http://a.test/old", 301, "http://b.test/new"),
      ("http://a.test/dir/x", 302, "../r"),
      ("http://a.test/p", 307, "//cdn.test/c"),
      ("http://a.test/ok", 200, null.asInstanceOf[String]))
      .toDF("target_uri", "status", "location")
    val dir = Files.createTempDirectory("graft_redir_s").toString
    Warc.writeWarcRedirects(df, dir)
    val recs = Warc.readWarc(spark, dir)
    // the reader surfaces Location verbatim on 3xx and null on 200
    val byUri = recs.collect().map(r => r.target_uri -> r).toMap
    assert(byUri("http://a.test/old").http_location == "http://b.test/new")
    assert(byUri("http://a.test/ok").http_location == null)
    assert(byUri("http://a.test/ok").http_status == 200)
    val edges = Warc.redirectEdges(recs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(edges == Set(
      ("http://a.test/old", "http://b.test/new", 301),
      ("http://a.test/dir/x", "http://a.test/r", 302),
      ("http://a.test/p", "http://cdn.test/c", 307)))
  }

  test("redirectEdges: unresolvable Location drops the edge, not the job") {
    val df = Seq(("http://a.test/x", 301, "mailto:gone@b.test"))
      .toDF("target_uri", "status", "location")
    val dir = Files.createTempDirectory("graft_redir_m").toString
    Warc.writeWarcRedirects(df, dir)
    assert(Warc.redirectEdges(Warc.readWarc(spark, dir)).isEmpty)
  }

  test("frontierLinks: base-tag override, relative resolution, mailto drop") {
    val pageWithBase = """<html><head><base href="http://b.test/dir/">""" +
      """</head><body><a href="../rel">r</a>""" +
      """<a href="http://abs.test/P">a</a>""" +
      """<a href="mailto:x@y">m</a></body></html>"""
    val pageNoBase = """<html><body><a href="sub/page">s</a></body></html>"""
    val df = Seq(
      ("http://h.test/doc/1", "text/html", pageWithBase.getBytes("UTF-8")),
      ("http://h.test/doc/2", "text/html", pageNoBase.getBytes("UTF-8")))
      .toDF("target_uri", "content_type", "payload")
    val dir = Files.createTempDirectory("graft_links_s").toString
    Warc.writeWarcResponses(df, dir)
    val got = Warc.frontierLinks(Warc.readWarc(spark, dir)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      ("http://h.test/doc/1", "http://b.test/rel", "r"),
      ("http://h.test/doc/1", "http://abs.test/P", "a"),
      ("http://h.test/doc/2", "http://h.test/doc/sub/page", "s")))
  }

  test("pageRank: two hand-computed iterations, dangling node included") {
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("b", "a")).toDF("from_url", "to_url")
    val got = LinkRank.pageRank(edges, iters = 2).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // iter1: a=0.15+0.85*1=1.0, b=c=0.15+0.85*0.5=0.575
    // iter2: a=0.15+0.85*0.575=0.63875, b=c=0.15+0.85*0.5=0.575
    assert(math.abs(got("a") - 0.63875) < 1e-12)
    assert(math.abs(got("b") - 0.575) < 1e-12)
    assert(math.abs(got("c") - 0.575) < 1e-12)
  }

  test("pageRank: parallel edges vote with multiplicity") {
    val edges = Seq(
      ("a", "b"), ("a", "b"), ("a", "c")).toDF("from_url", "to_url")
    val got = LinkRank.pageRank(edges, iters = 1).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("b") - (0.15 + 0.85 * 2.0 / 3)) < 1e-12)
    assert(math.abs(got("c") - (0.15 + 0.85 * 1.0 / 3)) < 1e-12)
    assert(math.abs(got("a") - 0.15) < 1e-12) // no in-edges
  }

  test("pageRank: zero iterations returns the uniform start") {
    val edges = Seq(("a", "b")).toDF("from_url", "to_url")
    val got = LinkRank.pageRank(edges, iters = 0).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 1.0, "b" -> 1.0))
  }

  test("pageRank: checkpointEvery is bit-identical to the straight plan") {
    val edges = (0 until 400).map(i =>
      (s"n${i % 37}", s"n${(i * 7 + 1) % 37}")).toDF("from_url", "to_url")
    val plain = LinkRank.pageRank(edges, iters = 10).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val deep = LinkRank.pageRank(edges, iters = 10, checkpointEvery = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(plain.keySet == deep.keySet)
    // bit-identical: the checkpoint changes WHEN work happens, not what
    plain.foreach { case (k, v) => assert(deep(k) == v, k) }
  }

  test("hostRank: lowercase collapse, intra-host drop, port-insensitive") {
    val edges = Seq(
      ("http://A.test/p1", "https://b.test:8443/x"), // case + port fold
      ("http://a.test/p2", "http://b.test/y"),       // multiplicity
      ("http://a.test/nav", "http://a.test/other"),  // intra-host: drop
      ("http://b.test/q", "http://a.test/z"))
      .toDF("from_url", "to_url")
    val got = LinkRank.hostRank(edges, iters = 1).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // a.test: 2 out-edges (both to b.test), b.test: 1 out-edge to a.test
    assert(math.abs(got("a.test") - (0.15 + 0.85 * 1.0)) < 1e-12)
    assert(math.abs(got("b.test") - (0.15 + 0.85 * (0.5 + 0.5))) < 1e-12)
    assert(got.size == 2)
  }

  test("anchorTexts: dedup before cap, sorted join, empty anchors dropped") {
    val edges = Seq(
      ("p1", "t", "Home"), ("p2", "t", "Home"), ("p3", "t", "Home"),
      ("p4", "t", "docs"), ("p5", "t", "About us"), ("p6", "t", "blog"),
      ("p7", "t", ""), ("p8", "u", "only one"))
      .toDF("from_url", "to_url", "anchor")
    val got = LinkRank.anchorTexts(edges, maxAnchors = 3).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getInt(2)))).toMap
    // t's distinct anchors sorted: About us, Home, blog, docs → cap 3
    assert(got("t") == (("About us\nHome\nblog", 3)))
    assert(got("u") == (("only one", 1)))
  }

  test("sitemapsOf: case-insensitive key, comments stripped, group-independent") {
    val robots = ("# top comment\nUser-agent: a\nDisallow: /x\n" +
      "Sitemap: http://h.test/s1.xml\nUser-agent: b\nAllow: /\n" +
      "SITEMAP: http://h.test/s2.xml # trailing comment\n" +
      "Crawl-delay: 3\nsitemap:\n").getBytes("UTF-8")
    assert(graft.operators.Robots.sitemapsOf(robots) ==
      Seq("http://h.test/s1.xml", "http://h.test/s2.xml"))
  }

  test("sitemapSeeds: canonicalized seeds, unreadable files contribute nothing") {
    val rules = Seq(
      ("a.test", "Sitemap: HTTP://A.test:80/S.xml\n".getBytes("UTF-8")),
      ("b.test", "User-agent: *\nDisallow: /\n".getBytes("UTF-8")))
      .toDS()
    val got = graft.operators.Robots.sitemapSeeds(rules).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("a.test", "http://a.test/S.xml")))
  }

  test("backoffHosts: both Retry-After forms, max per host, default lane") {
    val dir = Files.createTempDirectory("graft_backoff_s").toString
    val body = "x".getBytes("UTF-8")
    graft.io.Warc.writeWarcResponsesWithHeaders(Seq(
      ("http://a.test/1", "text/plain", "Retry-After: 120", body, 429),
      ("http://a.test/2", "text/plain", "Retry-After: 30", body, 429),
      // date form: 5 min past the writer's staged 2026-03-01T00:00:00Z
      ("http://b.test/1", "text/plain",
        "Retry-After: Sun, 01 Mar 2026 00:05:00 GMT", body, 503),
      // a date in the PAST floors at zero (clock skew, never negative)
      ("http://c.test/1", "text/plain",
        "Retry-After: Sat, 28 Feb 2026 00:00:00 GMT", body, 429),
      // rate-limited without the header: the default backoff
      ("http://d.test/1", "text/plain", "", body, 503),
      // clean responses contribute nothing
      ("http://e.test/1", "text/plain", "", body, 200))
      .toDF("target_uri", "content_type", "extra_headers", "payload",
        "status"), dir)
    val got = graft.operators.Robots.backoffHosts(
        graft.io.Warc.readWarc(spark, dir), defaultBackoffS = 60.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a.test" -> 120.0, "b.test" -> 300.0,
      "c.test" -> 0.0, "d.test" -> 60.0))
  }

  test("applyBackoff: the host's whole queue shifts, spacing preserved") {
    val schedule = Seq(
      ("a.test", "http://a.test/1", 1.0, 0.0),
      ("a.test", "http://a.test/2", 1.0, 1.0),
      ("b.test", "http://b.test/1", 1.0, 0.0))
      .toDF("host", "url", "delay_s", "fetch_at_s")
    val backoff = Seq(("a.test", 120.0)).toDF("host", "backoff_s")
    val got = graft.operators.Robots.applyBackoff(schedule, backoff)
      .select("url", "fetch_at_s").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("http://a.test/1" -> 120.0,
      "http://a.test/2" -> 121.0, "http://b.test/1" -> 0.0))
  }

  test("canonicalDeclarations: relative resolution, self-declarations drop") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_canon_warc").toString
    def page(canon: String) =
      (s"<html><head><link rel=\"canonical\" href=\"$canon\"></head>" +
        "<body>b</body></html>").getBytes("UTF-8")
    Warc.writeWarcResponses(Seq(
      ("http://a.test/page?b=2&a=1", "text/html", page("/clean")),
      ("http://b.test/dup", "text/html", page("http://b.test/orig")),
      // self-canonical (after canonicalization): no alias asserted
      ("http://c.test/self", "text/html", page("http://C.test:80/self")),
      // no declaration at all
      ("http://d.test/none", "text/html",
        "<html><body>plain</body></html>".getBytes("UTF-8")))
      .toDF("target_uri", "content_type", "payload"), dir)
    val got = Warc.canonicalDeclarations(Warc.readWarc(spark, dir))
      .as[(String, String)].collect().toMap
    assert(got.size == 2)
    // page url canonicalized (query verbatim — RFC 3986 §6.2.2, no key
    // sort; SURT is the sorting layer), relative href resolved
    assert(got("http://a.test/page?b=2&a=1") == "http://a.test/clean")
    assert(got("http://b.test/dup") == "http://b.test/orig")
  }

  test("urlAliasClusters: role preference elects representatives") {
    // chain a->b->c, c declares canonical d: one cluster, d wins (role 2)
    // pair e->f: f wins (redirect target); f also redirects to e?
    // no — keep f clean. g->h->g would be a cycle: both sources, tie
    // falls to the lexicographic min.
    val redirects = Seq(
      ("http://x.test/a", "http://x.test/b"),
      ("http://x.test/b", "http://x.test/c"),
      ("http://y.test/e", "http://y.test/f"),
      ("http://z.test/g", "http://z.test/h"),
      ("http://z.test/h", "http://z.test/g"))
      .toDF("from_url", "to_url")
    val canonicals = Seq(
      ("http://x.test/c", "http://x.test/d"),
      // self-canonical and empty declarations are ignored
      ("http://y.test/f", "http://y.test/f"),
      ("http://q.test/p", ""))
      .toDF("url", "canonical_url")
    val got = LinkRank.urlAliasClusters(redirects, canonicals)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got.size == 8) // q.test/p has no edge: absent
    for (u <- Seq("a", "b", "c", "d"))
      assert(got(s"http://x.test/$u") == (("http://x.test/d", 4L)), u)
    assert(got("http://y.test/e") == (("http://y.test/f", 2L)))
    assert(got("http://y.test/f") == (("http://y.test/f", 2L)))
    // the cycle: both are targets AND sources (score 0), lexicographic min
    assert(got("http://z.test/g") == (("http://z.test/g", 2L)))
    assert(got("http://z.test/h") == (("http://z.test/g", 2L)))
  }

  test("urlAliasClusters: a planted id-hash collision fails loudly") {
    // real xxhash64 collisions are not constructible; the injectable
    // hash plants one — TWO unrelated pairs whose four URLs all hash
    // equal. The guard must refuse to ship silently-merged clusters,
    // and the check rides the membership pass (no standalone job).
    val redirects = Seq(
      ("http://a.test/x", "http://a.test/y"),
      ("http://b.test/x", "http://b.test/y"))
      .toDF("from_url", "to_url")
    val canonicals = Seq.empty[(String, String)]
      .toDF("url", "canonical_url")
    val e = intercept[IllegalArgumentException] {
      LinkRank.urlAliasClustersHashed(redirects, canonicals, 25,
        _ => org.apache.spark.sql.functions.lit(0L))
    }
    assert(e.getMessage.contains("collision"))
    // the honest hash on the same graph still clusters cleanly
    val ok = LinkRank.urlAliasClusters(redirects, canonicals)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ok("http://a.test/x") == "http://a.test/y")
    assert(ok("http://b.test/x") == "http://b.test/y")
  }
}
