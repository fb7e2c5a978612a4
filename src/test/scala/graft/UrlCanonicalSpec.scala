package graft

import org.apache.spark.sql.functions._

import graft.expressions.{NativeUrl, UrlKernels}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §6.2 URL canonicalization: every normalization rule, the
  * tolerant passthroughs, and interpreted-vs-codegen agreement. */
class UrlCanonicalSpec extends SparkSpec {
  import spark.implicits._

  private def c(s: String): String =
    UrlKernels.canonicalizeUrlKernel(UTF8String.fromString(s)).toString

  test("case folding: scheme and host only, never userinfo/path/query") {
    assert(c("HTTP://ExAmPlE.CoM/Path?Q=V") == "http://example.com/Path?Q=V")
    assert(c("http://U:Pw@HOST.test/x") == "http://U:Pw@host.test/x")
  }

  test("default ports drop; explicit and empty ports handled") {
    assert(c("http://a.test:80/x") == "http://a.test/x")
    assert(c("https://a.test:443/x") == "https://a.test/x")
    assert(c("http://a.test:443/x") == "http://a.test:443/x")
    assert(c("http://a.test:8080/x") == "http://a.test:8080/x")
    assert(c("http://a.test:/x") == "http://a.test/x")
  }

  test("dot-segments removed by the RFC algorithm, empty segments kept") {
    assert(c("http://a.test/a/b/../c") == "http://a.test/a/c")
    assert(c("http://a.test/a/./b/") == "http://a.test/a/b/")
    assert(c("http://a.test/../../x") == "http://a.test/x")
    assert(c("http://a.test/a/..") == "http://a.test/")
    assert(c("http://a.test//a//b/.") == "http://a.test//a//b/")
  }

  test("percent normalization: unreserved decode, hex uppercase, %2E/%2F semantics") {
    assert(c("http://a.test/%7euser/%41bc") == "http://a.test/~user/Abc")
    assert(c("http://a.test/a?q=%2fx%7e") == "http://a.test/a?q=%2Fx~")
    // %2E decodes to '.' BEFORE dot-segment removal (RFC order)
    assert(c("http://a.test/%2e%2e/x") == "http://a.test/x")
    // %2F never splits a segment: 'a%2F..' is one segment, not 'a/../'
    assert(c("http://a.test/%61%2F%2e%2e/safe") == "http://a.test/a%2F../safe")
    // dangling '%' passes through untouched
    assert(c("http://a.test/x%2") == "http://a.test/x%2")
    assert(c("http://a.test/x%zz") == "http://a.test/x%zz")
  }

  test("empty path gains '/', fragment drops, IPv6 hosts lowercase") {
    assert(c("http://a.test") == "http://a.test/")
    assert(c("http://a.test?q=1") == "http://a.test/?q=1")
    // a '/' INSIDE the query must not satisfy the fast path's
    // empty-path check (it once did — two spellings of one fetch)
    assert(c("http://a.test?next=/a") == "http://a.test/?next=/a")
    assert(c("http://a.test/?next=/a") == "http://a.test/?next=/a")
    assert(c("http://a.test/x#frag") == "http://a.test/x")
    assert(c("http://a.test#frag") == "http://a.test/")
    assert(c("http://[2001:DB8::1]:80/x") == "http://[2001:db8::1]/x")
    assert(c("http://[2001:db8::1]:8443/x") == "http://[2001:db8::1]:8443/x")
  }

  test("non-hierarchical and malformed inputs pass through unchanged") {
    for (s <- Seq("mailto:a@b.test", "not a url", "", "x",
      "://nohost/x", "http://", "http://[broken/x", "ftp:relative"))
      assert(c(s) == s, s)
    // generic schemes canonicalize syntax but keep their ports
    assert(c("FTP://Host.test:21/A/../b") == "ftp://host.test:21/b")
  }

  test("already-canonical URLs return the same instance (fast path)") {
    val u = UTF8String.fromString("http://a.test/path/to/x?q=v")
    assert(UrlKernels.canonicalizeUrlKernel(u) eq u)
    val noPath = UTF8String.fromString("http://a.test")
    assert(UrlKernels.canonicalizeUrlKernel(noPath).toString == "http://a.test/")
  }

  test("column form agrees with the kernel and stays codegen (no UDF)") {
    val urls = Seq("HTTP://Example.COM/a/b/../c#f", "http://ex.test:80/%7ex",
      "mailto:z@y", "http://a.test//raw//kept/")
    val df = urls.toDF("u")
      .select(col("u"), NativeUrl.canonicalizeUrl(col("u")).as("cu"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    urls.foreach(u => assert(got(u) == c(u), u))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("null in, null out") {
    val df = Seq[Option[String]](Some("http://A.test"), None).toDF("u")
      .select(NativeUrl.canonicalizeUrl(col("u")).as("cu"))
    val rows = df.collect().map(r => Option(r.getString(0)))
    assert(rows.contains(None) && rows.contains(Some("http://a.test/")))
  }

  test("IDN hosts: NFC + lowercase + RFC 3492 punycode under xn--") {
    // vectors cross-checked against Python's punycode codec
    assert(c("http://MÜNCHEN.test/x") == "http://xn--mnchen-3ya.test/x")
    assert(c("http://bücher.de/") == "http://xn--bcher-kva.de/")
    assert(c("http://ελ.gr/") == "http://xn--qxam.gr/")
    assert(c("http://例え.jp/") == "http://xn--r8jz45g.jp/")
    assert(c("http://мир.test/") == "http://xn--h1ahn.test/")
    // only the non-ASCII label encodes; ASCII labels pass as-is
    assert(c("http://мир.Sub1.TEST/p") == "http://xn--h1ahn.sub1.test/p")
    // non-ASCII in the PATH is untouched (host identity only)
    assert(c("http://a.test/ü") == "http://a.test/ü")
  }

  private def r(base: String, ref: String): String = {
    val out = graft.expressions.UrlResolveKernels.resolveUrlKernel(
      UTF8String.fromString(base), UTF8String.fromString(ref))
    if (out == null) null else out.toString
  }

  test("resolve_url: the RFC 3986 §5.4.1 normal examples (canonicalized, fragments dropped)") {
    val base = "http://a/b/c/d;p?q"
    val cases = Seq(
      "g" -> "http://a/b/c/g",
      "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g",
      "//g" -> "http://g/", // canonicalization spells the empty path /
      "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y",
      "#s" -> "http://a/b/c/d;p?q", // fetch identity: fragment dropped
      "g#s" -> "http://a/b/c/g",
      "g?y#s" -> "http://a/b/c/g?y",
      ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x",
      "g;x?y#s" -> "http://a/b/c/g;x?y",
      "" -> "http://a/b/c/d;p?q",
      "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/",
      ".." -> "http://a/b/",
      "../" -> "http://a/b/",
      "../g" -> "http://a/b/g",
      "../.." -> "http://a/",
      "../../" -> "http://a/",
      "../../g" -> "http://a/g")
    cases.foreach { case (ref, want) => assert(r(base, ref) == want, ref) }
  }

  test("resolve_url: the RFC 3986 §5.4.2 abnormal examples") {
    val base = "http://a/b/c/d;p?q"
    val cases = Seq(
      "../../../g" -> "http://a/g",
      "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g",
      "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..",
      "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g",
      "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h",
      "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      "g?y/./x" -> "http://a/b/c/g?y/./x",
      "g?y/../x" -> "http://a/b/c/g?y/../x",
      "g#s/./x" -> "http://a/b/c/g")
    cases.foreach { case (ref, want) => assert(r(base, ref) == want, ref) }
  }

  test("resolve_url: no fetch identity resolves to null, not garbage") {
    val base = "http://a/b/c/d;p?q"
    // authority-less targets are not frontier edges
    assert(r(base, "mailto:x@y.test") == null)
    assert(r(base, "g:h") == null)
    assert(r(base, "http:g") == null) // strict RFC parser shape
    // a base that is itself relative or non-hierarchical derives nothing
    assert(r("/just/a/path", "g") == null)
    assert(r("mailto:x@y.test", "g") == null)
    // and an absolute hierarchical ref works from any usable base
    assert(r(base, "HTTPS://Other.TEST:443/a/../z") == "https://other.test/z")
  }

  test("resolve_url column form: codegen agreement incl. null lanes") {
    val df = Seq(
      ("http://a/b/c/d", "../g"),
      ("http://a/b/c/d", "mailto:x@y"),
      ("http://A.test:80/", "%7ex"))
      .toDF("base", "ref")
      .select(col("base"), col("ref"),
        NativeUrl.resolveUrl(col("base"), col("ref")).as("out"))
    val got = df.collect().map(x => (x.getString(0), x.getString(1),
      Option(x.getString(2))))
    assert(got.contains(("http://a/b/c/d", "../g", Some("http://a/b/g"))))
    assert(got.contains(("http://a/b/c/d", "mailto:x@y", None)))
    assert(got.contains(("http://A.test:80/", "%7ex", Some("http://a.test/~x"))))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
