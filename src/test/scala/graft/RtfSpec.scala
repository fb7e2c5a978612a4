package graft

import graft.operators.Rtf

/** RTF extraction: control-word framing, destination skipping, hex
  * and unicode escapes with the \uc convention, symbol words, group
  * balance, and the fail-loud boundaries — plus the warc bridge. */
class RtfSpec extends SparkSpec {

  private def extract(rtf: String, id: Long = 1L): String =
    Rtf.extractText(rtf.getBytes("ISO-8859-1"), id)

  test("writeRtf/extractText round-trips lines through \\par") {
    val text = "first line\nsecond line\nthird"
    assert(extract(new String(Rtf.writeRtf(text), "ISO-8859-1")) == text)
  }

  test("destinations are skipped: fonttbl, colortbl, \\* extensions, pict") {
    val rtf = """{\rtf1\ansi{\fonttbl{\f0 Arial;}}{\colortbl;\red0;}""" +
      """{\*\generator Foo 1.0;}{\pict 0a1b2c}visible\par also {\b bold} kept}"""
    assert(extract(rtf) == "visible\nalso bold kept")
  }

  test("escapes: hex bytes, braces, backslash, tab, symbol words") {
    val rtf = """{\rtf1 a\'e9b \{x\} c\\d\tab e\emdash f}"""
    assert(extract(rtf) == "aéb {x} c\\d\te—f")
  }

  test("\\uN honors \\uc fallback skipping, negative values, group scope") {
    // "\\" + "u" construction: the Scala lexer would otherwise
    // pre-process a literal backslash-u sequence as a source escape
    val u = "\\" + "u"
    // uc1: each \uN is followed by one fallback byte to swallow
    assert(extract(s"{\\rtf1\\uc1 x${u}8212?y}") == "x\u2014y") // em dash
    // uc2 inside a group; after the group closes uc reverts to 1
    assert(extract(s"{\\rtf1\\uc1 {\\uc2 a${u}233??b}c${u}233?d}") == "a\u00e9bc\u00e9d")
    // negative N is the signed-16-bit encoding of U+8000..U+FFFF
    assert(extract(s"{\\rtf1\\uc1 ${u}-1408?}") == "\ufa80")
  }

  test("fail-loud: magic, unbalanced groups, truncated escapes") {
    intercept[IllegalArgumentException] { extract("not rtf at all") }
    val e = intercept[IllegalArgumentException] { extract("""{\rtf1 {open}""") }
    assert(e.getMessage.contains("open group"))
    intercept[IllegalArgumentException] { extract("""{\rtf1 \'z""") }
  }

  test("warc -> rtf e2e: legacy documents land in the corpus, flagged tolerance") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_rtf").toString
    graft.io.Warc.writeWarcResponses(
      Seq(
        ("http://a.test/doc.rtf", "application/rtf",
          Rtf.writeRtf("legacy text\nsecond line")),
        ("http://a.test/bad.rtf", "text/rtf", Array[Byte](7, 7, 7)))
        .toDF("target_uri", "content_type", "payload"), dir)
    val recs = graft.io.Warc.readWarc(spark, dir)
    val out = graft.io.Warc.toDocumentsRtf(recs)
      .select("url", "text", "extract_ok")
      .as[(String, String, Boolean)].collect().sortBy(_._1)
    assert(out.length == 2)
    assert(out(0)._1.endsWith("bad.rtf") && !out(0)._3 && out(0)._2 == null)
    assert(out(1)._2 == "legacy text\nsecond line" && out(1)._3)
    val all = graft.io.Warc.toDocuments(recs)
      .select("url", "text").as[(String, String)].collect().toMap
    assert(all("http://a.test/doc.rtf") == "legacy text\nsecond line")
    assert(!all.contains("http://a.test/bad.rtf"))
  }
}
