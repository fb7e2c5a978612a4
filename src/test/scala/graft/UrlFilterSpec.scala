package graft

import org.apache.spark.sql.functions._
import graft.operators.UrlFilter

class UrlFilterSpec extends SparkSpec {
  import spark.implicits._

  test("hostOf: scheme/userinfo/port/path stripped, lowercased, null on no host") {
    val got = Seq(
      "https://Example.COM/path?q=1",
      "http://user:pw@sub.Example.com:8080/x",
      "ftp://files.example.org",
      "custom+scheme-1://H.TEST#frag",
      "no scheme here",
      "https:///path-only",
      "").toDF("url")
      .select(UrlFilter.hostOf($"url")).as[Option[String]].collect().toSeq
    assert(got == Seq(Some("example.com"), Some("sub.example.com"),
      Some("files.example.org"), Some("h.test"), None, None, None))
  }

  test("hostSuffixes: most-specific-first chain, capped, empty for null host") {
    val got = Seq("a.b.example.com", "com").toDF("h")
      .select(UrlFilter.hostSuffixes($"h")).as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("a.b.example.com", "b.example.com", "example.com", "com"))
    assert(got(1) == Seq("com"))
    val deep = Seq(("x." * 12 + "example.com")).toDF("h")
      .select(UrlFilter.hostSuffixes($"h")).as[Seq[String]].collect()(0)
    assert(deep.length == UrlFilter.MaxLabels)
    assert(deep.last == "com")
    val nul = Seq(Tuple1(null: String)).toDF("h")
      .select(UrlFilter.hostSuffixes($"h")).as[Seq[String]].collect()(0)
    assert(nul.isEmpty)
  }

  test("dropBlockedHosts: registrable-domain block takes subdomains; no-host rows kept") {
    val docs = Seq(
      (1L, "https://ok.test/a"),
      (2L, "https://blocked.example.com/x"),
      (3L, "https://cdn.blocked.example.com/y"),   // subdomain of blocked
      (4L, "https://notblocked-example.com/z"),    // not a dot-suffix match
      (5L, "https://xblocked.example.com/w"),      // different label, kept
      (6L, "junk"),                                // no host → kept
      (7L, null.asInstanceOf[String])              // null url → kept
    ).toDF("doc_id", "url")
    val blocked = Seq("blocked.example.com", "spam.test").toDF("host")
    val kept = UrlFilter.dropBlockedHosts(docs, "url", blocked)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L, 6L, 7L))
  }

  test("blocklist case-insensitivity and whole-host match") {
    val docs = Seq((1L, "https://SPAM.test/"), (2L, "https://ham.test/")).toDF("doc_id", "url")
    val blocked = Seq("Spam.TEST").toDF("host")
    val kept = UrlFilter.dropBlockedHosts(docs, "url", blocked)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(2L))
  }
}
