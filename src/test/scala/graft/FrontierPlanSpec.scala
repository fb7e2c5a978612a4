package graft

import org.apache.spark.sql.functions._

/** The frontier capstone: alias collapse donates the eager member's
  * due-time, crawl-delay spaces the host queue, Retry-After shifts it. */
class FrontierPlanSpec extends SparkSpec {
  import spark.implicits._

  test("frontierPlan: collapse, crawl-delay slots, and backoff compose") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fplan").toString
    graft.io.Warc.writeWarcResponsesWithHeaders(Seq(
      // the page and its redirect shell: the shell's no-cache makes it
      // the cluster's most eager member
      ("http://a.test/page", "text/plain", "Cache-Control: max-age=7200",
        "x".getBytes("UTF-8"), 200),
      ("http://a.test/shell", "text/plain", "Cache-Control: no-cache",
        "x".getBytes("UTF-8"), 200),
      // a second URL on the same host (slot 2 under the 2 s delay)
      ("http://a.test/zz", "text/plain", "", "x".getBytes("UTF-8"), 200),
      // a rate-limited host: every slot shifts by the Retry-After
      ("http://b.test/only", "text/plain", "Retry-After: 90",
        "x".getBytes("UTF-8"), 429))
      .toDF("target_uri", "content_type", "extra_headers", "payload",
        "status").coalesce(1), dir)
    val aliases = Seq(
      ("http://a.test/shell", "http://a.test/page"),
      ("http://a.test/page", "http://a.test/page"))
      .toDF("url", "representative")
    val robots = Seq(
      ("a.test", "User-agent: *\nCrawl-delay: 2\n".getBytes("UTF-8")))
      .toDS()
    val plan = graft.operators.Frontier.frontierPlan(
        graft.io.Warc.readWarc(spark, dir), aliases, robots, "graftbot",
        minHours = 1.0, defaultDays = 7.0, defaultDelayS = 1.0,
        defaultBackoffS = 60.0)
      .collect().map(r => r.getAs[String]("url") -> r).toMap
    val fetch = 1772323200L // 2026-03-01T00:00:00Z, the staged stamp
    // the shell collapsed into the page, donating its eager due-time
    assert(!plan.contains("http://a.test/shell"))
    assert(plan("http://a.test/page").getAs[Long]("next_fetch_s") ==
      fetch + 3600L) // no-cache min-clamped, NOT the page's own 7200
    assert(plan("http://a.test/zz").getAs[Long]("next_fetch_s") ==
      fetch + 7L * 86400) // validator-less default
    // a.test spaces by its Crawl-delay: slots 0 and 2 s, url order
    assert(plan("http://a.test/page").getAs[Double]("fetch_at_s") == 0.0)
    assert(plan("http://a.test/zz").getAs[Double]("fetch_at_s") == 2.0)
    // b.test: no rule file (default 1 s delay), one slot, shifted by
    // the server's own Retry-After horizon
    assert(plan("http://b.test/only").getAs[Double]("delay_s") == 1.0)
    assert(plan("http://b.test/only").getAs[Double]("fetch_at_s") == 90.0)
  }
}
