package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens drops empties; tokenCount counts words") {
    val df = Seq("  the quick  brown   fox ", "", "one").toDF("text")
    val counts = df.select(TF.tokenCount($"text")).as[Int].collect().toSeq
    assert(counts == Seq(4, 0, 1))
  }

  test("shingles: 3-grams of a 5-token doc; short docs yield one shingle") {
    val df = Seq("a b c d e", "x y").toDF("text")
    val sh = df.select(TF.shingles($"text", 3)).as[Seq[String]].collect()
    assert(sh(0) == Seq("a b c", "b c d", "c d e"))
    assert(sh(1) == Seq("x y"))
  }

  test("langId picks the stopword-dominant language, und when none") {
    val df = Seq(
      "the cat sat on the mat and it is happy",
      "el perro y la casa de los vecinos no se ve",
      "der hund und die katze ist nicht von hier",
      "zzz qqq xxx").toDF("text")
    val langs = df.select(TF.langId($"text")).as[String].collect().toSeq
    assert(langs == Seq("en", "es", "de", "und"))
  }

  test("qualityFeatures: exact ratios on a crafted string") {
    val text = "ab cd 12"  // 8 chars, 3 tokens, 2 spaces, 2 digits, 4 alpha
    val df = Seq(text).toDF("text")
    val r = df.select(TF.qualityFeatures($"text").as("q")).select("q.*").collect()(0)
    assert(r.getAs[Int]("n_chars") == 8)
    assert(r.getAs[Int]("n_tokens") == 3)
    assert(r.getAs[Double]("space_ratio") == 2.0 / 8)
    assert(r.getAs[Double]("digit_ratio") == 2.0 / 8)
    assert(r.getAs[Double]("alpha_ratio") == 4.0 / 8)
  }

  test("bpeTokenCount drops ALL whitespace pieces (tab/newline, not just space)") {
    // pieces after boundary split: alnum runs + single non-alnum chars;
    // whitespace of any kind must not count as a token (the DuckDB oracle
    // counts alnum runs + non-alnum-non-\s chars)
    val df = Seq(
      "a\tb",        // runs a,b; tab dropped -> 2
      "a.b\nc",      // runs a,b,c + '.'; newline dropped -> 4
      "x  y\r\n z"   // runs x,y,z; all whitespace dropped -> 3
    ).toDF("text")
    val counts = df.select(TF.bpeTokenCount($"text")).as[Int].collect().toSeq
    assert(counts == Seq(2, 4, 3))
  }

  test("gopherQuality: exact signals and the composed keep verdict") {
    val prose = "the be to of and that have with " +
      "alpha beta gamma delta " * 11 // 8 + 44 = 52 tokens, all alpha
    val rows = Seq(
      (1L, prose),
      (2L, "the quick brown fox"),          // < 50 tokens
      (3L, "the with " + "$$ " * 55)        // symbol-dominated
    ).toDF("doc_id", "text")
      .select($"doc_id", TF.gopherQuality($"text").as("g"))
      .select($"doc_id", $"g.n_tokens", $"g.mean_token_len",
        $"g.symbol_ratio", $"g.alpha_ratio", $"g.stop_hits", $"g.keep")
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = rows(1L)
    assert(d1.getLong(1) == 52L)
    assert(d1.getDouble(2) == (24 + 19 * 11).toDouble / 52) // exact mean len
    assert(d1.getDouble(3) == 0.0 && d1.getDouble(4) == 1.0)
    assert(d1.getLong(5) == 8L && d1.getBoolean(6))
    assert(!rows(2L).getBoolean(6)) // too short
    val d3 = rows(3L)
    assert(d3.getDouble(3) > 0.1 && !d3.getBoolean(6)) // symbol ratio cut
    // threshold override: the 8-stopword probe alone passes at minTokens=1
    val tiny = Seq("the be to of and that have with").toDF("text")
      .select(TF.gopherQuality($"text", minTokens = 1L).as("g"))
      .select($"g.mean_token_len", $"g.keep").head()
    assert(tiny.getDouble(0) == 3.0 && tiny.getBoolean(1))
  }

  test("fingerprint is md5 hex; fingerprint64 deterministic") {
    val df = Seq("abc").toDF("text")
    assert(df.select(TF.fingerprint($"text")).as[String].head() ==
      "900150983cd24fb0d6963f7d28e17f72")
    val h1 = df.select(TF.fingerprint64($"text")).as[Long].head()
    val h2 = df.select(TF.fingerprint64($"text")).as[Long].head()
    assert(h1 == h2)
  }

  test("native TokenHashes matches transform(tokens, xxhash64) bit for bit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
      .union(Seq("", "  ", "one", " a\tb\nc  d ", "x \u00e9\u00fc tail").toDF("text"))
    val builtin = transform(TF.tokens($"text"), t => xxhash64(t))
    val diff = docs
      .select(TF.tokenHashes($"text").as("nat"), builtin.as("ref"))
      .filter(not($"nat" <=> $"ref")).count()
    assert(diff == 0)
  }

  test("native ShingleHashes matches the slice-hash formulation bit for bit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
      .union(Seq("", "a", "a b", "a b c", "a b c d", "a b a b a b").toDF("text"))
      .select(TF.tokenHashes($"text").as("th"))
    val count = greatest(size($"th") - lit(2), lit(1))
    val builtin = when(size($"th") <= 3, array(xxhash64($"th"))).otherwise(
      array_distinct(transform(sequence(lit(0), count - 1),
        i => xxhash64(slice($"th", i + 1, lit(3))))))
    val diff = docs
      .select(TF.shingleHashesFrom($"th", 3).as("nat"), builtin.as("ref"))
      .filter(not($"nat" <=> $"ref")).count()
    assert(diff == 0)
  }

  test("native MinHashSignature matches the k array_min transforms bit for bit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").union(Seq("", "a b c d e").toDF("text"))
      .select(TF.tokenHashes($"text").as("th"))
      .select(TF.shingleHashesFrom($"th", 3).as("hs"))
    val k = 8
    val builtin = array((0 until k).map(i =>
      array_min(transform($"hs", h => xxhash64(lit(i), h)))): _*)
    val diff = docs
      .select(graft.expressions.NativeText.minhashSignature($"hs", k).as("nat"),
        builtin.as("ref"))
      .filter(not($"nat" <=> $"ref")).count()
    assert(diff == 0)
  }

  test("redactPii: emails, IPv4s, + phones rewritten; counts match; clean text untouched") {
    val rows = Seq(
      "mail me at a.b+c@sub.example.org or x@y.io thanks",
      "server 192.168.0.1 and 10.0.255.254 responded",
      "call +1 (555) 010-9999 today",
      "version 1.2.3 costs 12.50 at example.com no pii here",
      "mixed: b@c.de from 8.8.8.8 dial +44 20 7946 0958")
      .toDF("text")
      .select($"text", TF.redactPii($"text").as("red"), TF.piiCounts($"text").as("c"))
      .collect()
      .map(r => (r.getString(1), r.getStruct(2).getInt(0),
        r.getStruct(2).getInt(1), r.getStruct(2).getInt(2)))
    assert(rows(0) == ("mail me at <EMAIL> or <EMAIL> thanks", 2, 0, 0))
    assert(rows(1) == ("server <IP> and <IP> responded", 0, 2, 0))
    assert(rows(2) == ("call <PHONE> today", 0, 0, 1))
    // "1.2.3" (3 octets) and "12.50" are NOT IPs; bare "example.com" is
    // not an email; nothing rewritten
    assert(rows(3) == ("version 1.2.3 costs 12.50 at example.com no pii here", 0, 0, 0))
    assert(rows(4) == ("mixed: <EMAIL> from <IP> dial <PHONE>", 1, 1, 1))
  }

  test("normalizeForDedup: case/punct/spacing variants share one key; clean text unchanged") {
    val rows = Seq(
      "The  quick,   brown FOX!",
      "the quick brown fox",
      "THE QUICK BROWN FOX?!?",
      "  the\tquick\nbrown fox  ",
      "a different document").toDF("text")
      .select(TF.normalizeForDedup($"text").as("n")).as[String].collect()
    assert(rows.take(4).toSet == Set("the quick brown fox"))
    assert(rows(4) == "a different document")
  }

  test("native WindowMd5 matches the transform/slice/concat_ws formulation bit for bit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TF.tokens($"text").as("toks"))
      .filter(size($"toks") >= 5)
    val n = 5
    val hof = transform(
      sequence(lit(1), size($"toks") - (n - 1)),
      p => md5(concat_ws(" ", slice($"toks", p, lit(n)))))
    val mismatches = docs
      .select(graft.expressions.NativeText.windowMd5($"toks", n).as("native"),
        hof.as("hof"))
      .filter(!($"native" <=> $"hof"))
      .count()
    assert(mismatches == 0L)
    // short input → empty array, not null
    val short = Seq(Seq("a", "b")).toDF("toks")
      .select(graft.expressions.NativeText.windowMd5($"toks", 5).as("w"))
      .collect()(0).getSeq[String](0)
    assert(short.isEmpty)
  }

  test("htmlMeta: title decoded/collapsed, attributes verbatim, absence empty") {
    val page = "<html><head><title> A &amp;\n B </title>" +
      """<meta charset="utf-8"><meta name="description" content="a page">""" +
      """<link rel="stylesheet" href="s.css">""" +
      """<link rel="canonical" href="http://c.test/x?a=1&amp;b=2">""" +
      """</head><body>t</body></html>"""
    val m = Seq(page, "<html><body>no head</body></html>").toDF("html")
      .select(TF.htmlMeta($"html").as("m"))
      .select($"m.title", $"m.description", $"m.canonical")
      .as[(String, String, String)].collect()
    assert(m(0) == (("A & B", "a page", "http://c.test/x?a=1&amp;b=2")))
    assert(m(1) == (("", "", ""))) // absence, not null
  }

  test("htmlLinks: aligned (href, anchor) pairs, markup-stripped anchors") {
    val page = """<p>x</p><a href="http://a/1" id="l">one <i>two</i></a>""" +
      """ mid <a rel="nofollow" href="http://a/2">three</a><a name="no-href">skip</a>"""
    val out = Seq(page).toDF("html")
      .select(explode(TF.htmlLinks($"html")).as("l"))
      .select($"l.href", $"l.anchor").as[(String, String)].collect().toSeq
    assert(out == Seq(("http://a/1", "one two"), ("http://a/2", "three")))
    assert(Seq("no links at all").toDF("html")
      .select(TF.htmlLinks($"html")).as[Seq[(String, String)]]
      .collect().head.isEmpty)
  }

  test("htmlRights: directives, license classification, TDM opt-out") {
    def rights(page: String) = Seq(page).toDF("html")
      .select(TF.htmlRights($"html").as("r"))
      .select($"r.robots", $"r.noindex", $"r.nofollow", $"r.noarchive",
        $"r.noai", $"r.license_href", $"r.license_id", $"r.tdm_reservation")
      .as[(String, Boolean, Boolean, Boolean, Boolean,
        String, String, String)].collect().head
    // mixed case lowers; token-boundary: "noindexing" must NOT trip noindex
    val a = rights("<head><META name='robots' content='NoArchive, noindexing'>" +
      "<meta name=\"tdm-reservation\" content=\"1\"></head>")
    assert(a == (("noarchive, noindexing", false, false, true, false,
      "", "", "1")))
    // link form wins over the in-body a form; CC id normalizes
    val b = rights("<head><link rel=\"license\" href=\"https://" +
      "creativecommons.org/licenses/by-nc/2.0/\"></head><body>" +
      "<a rel=\"license\" href=\"http://other.test/l\">l</a></body>")
    assert(b._6 == "https://creativecommons.org/licenses/by-nc/2.0/" &&
      b._7 == "CC-BY-NC-2.0")
    // a-only form still found; non-CC target classifies empty
    val c = rights("<body><a rel=\"license\" " +
      "href=\"http://example.test/terms\">t</a></body>")
    assert(c._6 == "http://example.test/terms" && c._7 == "")
    // public-domain shapes; absence is empty/false everywhere
    assert(rights("<a rel=\"license\" href=\"https://creativecommons.org/" +
      "publicdomain/zero/1.0/\">z</a>")._7 == "CC0-1.0")
    assert(rights("<p>plain page</p>") ==
      (("", false, false, false, false, "", "", "")))
  }

  test("dropNavLines: the RefinedWeb line rules, kept lines verbatim") {
    import spark.implicits._
    def clean(s: String): String =
      Seq(s).toDF("t").select(TF.dropNavLines($"t")).collect()(0).getString(0)
    // each rule in isolation
    assert(clean("A real sentence stays here.") == "A real sentence stays here.")
    assert(clean("HOME | ABOUT | CONTACT") == "")          // caps-dominant
    assert(clean("- item") == "")                          // short bullet
    assert(clean("Read more") == "")                       // stray fragment
    assert(clean("Copyright") == "")                       // 1-token fragment
    assert(clean("ok.") == "ok.")                          // short BUT terminal
    assert(clean("1. A numbered item with plenty of words") ==
      "1. A numbered item with plenty of words")           // long bullet kept
    assert(clean("NASA confirmed the launch today.") ==
      "NASA confirmed the launch today.")                  // acronym ≠ nav bar
    // composition: drops interleave, kept lines keep their bytes
    assert(clean("Body text one.\n\nMENU ITEMS HERE\n  indented keeps spaces.  \n* go") ==
      "Body text one.\n  indented keeps spaces.  ")
    // empty input
    assert(clean("") == "")
  }
}
