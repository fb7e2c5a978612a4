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

  test("canonicalizeUrl: every rule, composed and individually") {
    import spark.implicits._
    val cases = Seq(
      // scheme+host lowercase, path case kept
      ("HTTPS://WWW.Example.COM/Path/X", "https://www.example.com/Path/X"),
      // fragment dropped
      ("https://a.com/p#section-2", "https://a.com/p"),
      // default ports
      ("https://a.com:443/p", "https://a.com/p"),
      ("http://a.com:80/p", "http://a.com/p"),
      ("http://a.com:8080/p", "http://a.com:8080/p"), // non-default kept
      // trackers stripped, survivors keep order, ? restored
      ("https://a.com/p?utm_source=x&id=7&utm_campaign=y", "https://a.com/p?id=7"),
      ("https://a.com/p?id=7&fbclid=abc", "https://a.com/p?id=7"),
      ("https://a.com/p?utm_medium=z", "https://a.com/p"),
      ("https://a.com/p?gclid=1&utm_a=2&ref=h", "https://a.com/p"),
      ("https://a.com/p?b=2&a=1", "https://a.com/p?b=2&a=1"), // order kept
      // bare trailing slash dropped; a real path keeps its slash
      ("https://a.com/", "https://a.com"),
      ("https://a.com/dir/", "https://a.com/dir/"),
      // unparseable (no scheme://) passes through UNCHANGED — collapsing
      // all of these to "" would merge them into one dedup identity
      ("not a url", "not a url"),
      ("mailto:x@y.test", "mailto:x@y.test"),
      ("/relative/path?q=1", "/relative/path?q=1"),
      // a literal '&' in a query-less path is NOT rewritten to '?'
      ("https://a.com/a&b/c", "https://a.com/a&b/c"),
      // ...even a tracker-NAMED path segment in a query-less URL is
      // untouchable (strip runs on the query part only, split at the
      // first '?'; the old unanchored '&tracker=' pass deleted it)
      ("https://a.com/a&ref=home/p", "https://a.com/a&ref=home/p"),
      // ...and with a query present, only the query's trackers go
      ("https://a.com/a&ref=home/p?utm_a=1&q=2",
        "https://a.com/a&ref=home/p?q=2"),
      ("https://a.com/a&ref=home/p?ref=x", "https://a.com/a&ref=home/p"),
      // ...nor when a tracker-only query is consumed entirely (the
      // strip is anchored at '?'/'&tracker=', never a bare path '&')
      ("https://a.com/a&b/p?utm_a=1", "https://a.com/a&b/p"),
      // ...but with a real query consumed by the tracker strip, the
      // survivor's '?' is restored even past a path '&'
      ("https://a.com/p?utm_a=1&q=2", "https://a.com/p?q=2"),
      // everything at once
      ("HTTP://A.com:80/P?utm_x=1&q=2#f", "http://a.com/P?q=2"))
    val out = cases.map(_._1).toDF("url")
      .select(col("url"), UrlFilter.canonicalizeUrl(col("url")).as("canon"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(out(in) == want, s"$in -> ${out(in)}, wanted $want")
    }
  }
}
