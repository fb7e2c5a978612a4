package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.operators.Robots

/** robots.txt: grammar, group specificity, longest-match precedence,
  * wildcards and anchors, fail-loud framing, and the distributed
  * frontier filter. */
class RobotsSpec extends SparkSpec {

  private def groups(txt: String): Seq[Robots.Group] =
    Robots.parseRobots(txt.getBytes(UTF_8), 1L)

  private val standard = groups(
    """# comment line
      |User-agent: graftbot
      |Crawl-delay: 2
      |Disallow: /private
      |Allow: /private/ok
      |Disallow: /*.pdf$
      |Disallow: /tmp$
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin)

  test("grammar: comments, extensions, groups, empty disallow") {
    assert(standard.length == 2)
    assert(standard(0).agents == Seq("graftbot") &&
      standard(0).rules.length == 4)
    assert(standard(1).agents == Seq("*"))
    // several user-agent lines extend ONE group
    val multi = groups("User-agent: a\nUser-agent: b\nDisallow: /x")
    assert(multi.length == 1 && multi(0).agents == Seq("a", "b"))
    // an empty disallow is allow-everything: a no-op rule
    assert(groups("User-agent: *\nDisallow:").head.rules.isEmpty)
    intercept[IllegalArgumentException] { groups("Disallow: /x") }
    intercept[IllegalArgumentException] { groups("not a directive line") }
  }

  test("decision: specificity, longest match, wildcards, anchors") {
    def allowed(path: String, agent: String = "graftbot/1.0") =
      Robots.isAllowed(standard, agent, path)
    assert(allowed("/public/page")) // no graftbot rule matches
    assert(!allowed("/private/x")) // prefix disallow
    assert(allowed("/private/ok/x")) // longer allow wins
    assert(!allowed("/docs/a.pdf")) // * wildcard + $ anchor
    assert(allowed("/docs/a.pdfx")) // the anchor is real
    assert(!allowed("/tmp")) // exact anchor
    assert(allowed("/tmpx")) // anchored /tmp$ does not prefix-match
    // an unmatched agent falls to the * group: everything denied
    assert(!allowed("/public/page", agent = "otherbot"))
    // no groups at all: allow
    assert(Robots.isAllowed(Nil, "graftbot", "/anything"))
    // allow wins a length tie
    val tie = groups("User-agent: *\nDisallow: /a/b\nAllow: /a/c")
    assert(!Robots.isAllowed(tie, "x", "/a/b") &&
      Robots.isAllowed(tie, "x", "/a/c"))
  }

  test("pattern matching: wildcard segments in order, prefix semantics") {
    assert(Robots.patternMatches("/a/*/c", "/a/b/c/d"))
    assert(!Robots.patternMatches("/a/*/c", "/a/b"))
    assert(Robots.patternMatches("/", "/anything"))
    assert(Robots.patternMatches("/p*q$", "/pxxq"))
    assert(!Robots.patternMatches("/p*q$", "/pxxqtail"))
    // regex metacharacters in patterns are literal
    assert(!Robots.patternMatches("/a.c", "/abc"))
  }

  test("url components: host lowered with port, path with query") {
    assert(Robots.hostOf("http://Host.Test:8080/a/b?q=1") == "host.test:8080")
    assert(Robots.pathOf("http://host.test/a/b?q=1") == "/a/b?q=1")
    assert(Robots.pathOf("http://host.test") == "/")
  }

  test("filterAllowed: join + decision, crawl default, fail-closed") {
    import spark.implicits._
    val urls = Seq(
      (1L, "http://a.test/private/x"),
      (2L, "http://a.test/private/ok/x"),
      (3L, "http://a.test/open"),
      (4L, "http://norules.test/anything"),
      (5L, "http://broken.test/anything"))
      .toDF("id", "url")
    val robots = Seq(
      ("a.test",
        "User-agent: *\nDisallow: /private\nAllow: /private/ok"
          .getBytes(UTF_8)),
      ("broken.test", "unparseable policy".getBytes(UTF_8)),
      ("quiet.test", "User-agent: *\nDisallow: /".getBytes(UTF_8))).toDS()
    val out = Robots.filterAllowed(urls, robots, "graftbot")
      .select("id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true,
      4L -> true, 5L -> false))
    // the caller's columns survive the pass
    assert(Robots.filterAllowed(urls, robots, "graftbot").columns.toSeq ==
      Seq("id", "url", "allowed"))
  }
  test("repeated groups at the same specificity MERGE (RFC 9309 \u00a72.2.1)") {
    // two separate `User-agent: *` blocks — the later block's disallow
    // must be honored, not silently ignored (fail-open otherwise)
    val gs = Robots.parseRobots(
      ("User-agent: *\nDisallow: /a\n\n" +
        "User-agent: other\nDisallow: /\n\n" +
        "User-agent: *\nDisallow: /b\nAllow: /b/ok\n").getBytes("UTF-8"))
    assert(!Robots.isAllowed(gs, "graftbot", "/a/x"))
    assert(!Robots.isAllowed(gs, "graftbot", "/b/x")) // the merged rule
    assert(Robots.isAllowed(gs, "graftbot", "/b/ok/y")) // merged allow
    assert(Robots.isAllowed(gs, "graftbot", "/c"))
    // merging happens at the WINNING specificity only: the named group
    // beats *, and the * blocks' rules do not leak into its decision
    val named = Robots.parseRobots(
      ("User-agent: *\nDisallow: /\n\n" +
        "User-agent: graftbot\nDisallow: /private\n\n" +
        "User-agent: graftbot\nDisallow: /tmp\n").getBytes("UTF-8"))
    assert(Robots.isAllowed(named, "graftbot", "/public"))
    assert(!Robots.isAllowed(named, "graftbot", "/private/x"))
    assert(!Robots.isAllowed(named, "graftbot", "/tmp/x")) // merged named
    assert(!Robots.isAllowed(named, "otherbot", "/public")) // * still binds
  }

  test("crawl-delay: group selection, max-merge, nonsense skipped") {
    // the specific agent's delay beats the catch-all's
    assert(Robots.crawlDelay(standard, "graftbot/1.0") == Some(2.0))
    // the * group declares none → None for other agents
    assert(Robots.crawlDelay(standard, "otherbot") == None)
    // fractional values parse; merged same-specificity groups take MAX
    val merged = groups(
      "User-agent: a\nCrawl-delay: 0.5\nDisallow: /x\n" +
        "User-agent: a\nCrawl-delay: 3\nDisallow: /y\n")
    assert(Robots.crawlDelay(merged, "a") == Some(3.0))
    // nonsense / non-positive values are skipped like unknown directives
    assert(Robots.crawlDelay(groups(
      "User-agent: a\nCrawl-delay: soon\nDisallow: /x"), "a") == None)
    assert(Robots.crawlDelay(groups(
      "User-agent: a\nCrawl-delay: -1\nDisallow: /x"), "a") == None)
    // no matching group at all
    assert(Robots.crawlDelay(Seq.empty, "a") == None)
  }

  test("fetchSchedule: per-host slots × delays, defaults for silent hosts") {
    import spark.implicits._
    val rules = Seq(
      ("slow.test", "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n"
        .getBytes(UTF_8)),
      ("quiet.test", "User-agent: *\nDisallow: /x\n".getBytes(UTF_8)))
      .toDS()
    val frontier = Seq(
      "http://slow.test/a", "http://slow.test/b", "http://slow.test/c",
      "http://quiet.test/a", "http://norules.test/a",
      "http://norules.test/b").toDF("url")
    val got = Robots.fetchSchedule(frontier, rules, "bot", defaultDelayS = 1.0)
      .collect()
      .map(r => r.getAs[String]("url") ->
        ((r.getAs[Double]("delay_s"), r.getAs[Double]("fetch_at_s")))).toMap
    assert(got("http://slow.test/a") == ((2.0, 0.0)))
    assert(got("http://slow.test/b") == ((2.0, 2.0)))
    assert(got("http://slow.test/c") == ((2.0, 4.0)))
    assert(got("http://quiet.test/a") == ((1.0, 0.0))) // file, no delay
    assert(got("http://norules.test/a") == ((1.0, 0.0))) // no file at all
    assert(got("http://norules.test/b") == ((1.0, 1.0)))
  }

  test("fetchSchedule maxPerHost: the hot host is capped, others intact") {
    import spark.implicits._
    val rules = spark.emptyDataset[(String, Array[Byte])]
    val frontier = ((0 until 50).map(i => f"http://hot.test/p$i%02d") ++
      Seq("http://cold.test/a", "http://cold.test/b")).toDF("url")
    val got = Robots.fetchSchedule(frontier, rules, "bot",
      defaultDelayS = 1.0, maxPerHost = 5).collect()
    val byHost = got.groupBy(_.getAs[String]("host"))
    assert(byHost("hot.test").length == 5, "hot host capped")
    assert(byHost("cold.test").length == 2, "under-cap host intact")
    // slots stay dense AFTER the cap: ranks 0..4 × delay
    assert(byHost("hot.test").map(_.getAs[Double]("fetch_at_s")).sorted
      .toSeq == Seq(0.0, 1.0, 2.0, 3.0, 4.0))
    // the capped subset is the deterministic md5-order sample
    val again = Robots.fetchSchedule(frontier, rules, "bot",
      defaultDelayS = 1.0, maxPerHost = 5)
      .filter($"host" === "hot.test").select("url").as[String]
      .collect().toSet
    assert(again == byHost("hot.test").map(_.getAs[String]("url")).toSet)
  }
  test("auditPoliteness: burst hosts convict, spaced hosts clear, singletons pass") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_audit_spec").toString
    def at(s: Long) = java.time.Instant.ofEpochSecond(1772323200L + s).toString
    graft.io.Warc.writeWarcResponses(Seq(
      // burst.test fetches 1 s apart under a 2 s rule: violation
      ("http://burst.test/a", "text/plain", "x".getBytes("UTF-8"), at(0)),
      ("http://burst.test/b", "text/plain", "x".getBytes("UTF-8"), at(1)),
      ("http://burst.test/c", "text/plain", "x".getBytes("UTF-8"), at(2)),
      // calm.test spaced 5 s under the same rule: compliant
      ("http://calm.test/a", "text/plain", "x".getBytes("UTF-8"), at(0)),
      ("http://calm.test/b", "text/plain", "x".getBytes("UTF-8"), at(5)),
      // one capture: no gap, audits compliant
      ("http://lone.test/a", "text/plain", "x".getBytes("UTF-8"), at(0)))
      .toDF("target_uri", "content_type", "payload", "warc_date")
      .coalesce(1), dir)
    val rules = Seq(
      ("burst.test", "User-agent: *\nCrawl-delay: 2\n".getBytes("UTF-8")),
      ("calm.test", "User-agent: *\nCrawl-delay: 2\n".getBytes("UTF-8")))
      .toDS()
    val audit = Robots.auditPoliteness(
        graft.io.Warc.readWarc(spark, dir), rules, "bot", defaultDelayS = 1.0)
      .collect().map(r => r.getAs[String]("host") -> r).toMap
    assert(audit("burst.test").getAs[Long]("min_gap_s") == 1L)
    assert(!audit("burst.test").getAs[Boolean]("compliant"))
    assert(audit("calm.test").getAs[Long]("min_gap_s") == 5L)
    assert(audit("calm.test").getAs[Boolean]("compliant"))
    assert(audit("lone.test").isNullAt(
      audit("lone.test").fieldIndex("min_gap_s")))
    assert(audit("lone.test").getAs[Boolean]("compliant"))
    assert(audit("lone.test").getAs[Double]("delay_s") == 1.0)
  }
}
