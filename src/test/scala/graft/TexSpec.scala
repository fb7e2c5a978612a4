package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.operators.Tex

/** LaTeX extraction: whitespace tokenization, preamble cut, math and
  * float drops, structure surfacing, escapes, verbatim, fail-loud
  * boundaries — plus the warc bridge. */
class TexSpec extends SparkSpec {

  private def extract(tex: String): String =
    Tex.extractText(tex.getBytes(UTF_8), 1L)

  test("writeTex/extractText round-trips paragraphs through all riders") {
    val text = "first line\nsecond line\nthird"
    for (seed <- 0 to 2)
      assert(extract(new String(Tex.writeTex("A Title", text, seed), UTF_8))
        == s"A Title\n$text", s"seed $seed")
  }

  test("whitespace tokenizes like TeX: runs collapse, blank line = par") {
    assert(extract("one\ntwo") == "one two")
    assert(extract("one\n\n  \ntwo") == "one\ntwo")
    assert(extract("a    b\t c") == "a b c")
    assert(extract("x ~ y~z") == "x y z")
  }

  test("preamble drops; \\end{document} stops the scan") {
    assert(extract("\\documentclass{article}\npreamble words\n" +
      "\\begin{document}body\\end{document}\ntail words") == "body")
    // no \begin{document}: the whole source is body (arXiv fragments)
    assert(extract("plain fragment") == "plain fragment")
  }

  test("math drops: inline, display, \\[..\\], equation environments") {
    assert(extract("a $x^2 + y$ b") == "a b")
    assert(extract("a $$\\sum_i x_i$$ b") == "a b")
    assert(extract("a \\[ e = mc^2 \\] b") == "a b")
    assert(extract("a \\begin{align}x &= y\\\\ z &= w\\end{align} b") == "a b")
    intercept[IllegalArgumentException] { extract("open $x + y") }
  }

  test("structure surfaces: sections on own lines, unwraps, items") {
    assert(extract("pre \\section{Head}\npost") == "pre\nHead\npost")
    assert(extract("\\section*{Starred}text") == "Starred\ntext")
    assert(extract("a \\emph{kept} b \\textbf{bold} c") == "a kept b bold c")
    assert(extract("\\begin{itemize}\\item one\\item[x] two\\end{itemize}") ==
      "- one\n- two")
    assert(extract("\\footnote{noted} after") == "noted after")
  }

  test("metadata drops its arguments; floats drop wholesale") {
    assert(extract("a \\cite{x,y} b \\label{s} c \\ref{s} d") == "a b c d")
    assert(extract("a \\includegraphics[width=2cm]{fig.png} b") == "a b")
    assert(extract("a \\begin{figure}\\caption{gone}\\end{figure} b") == "a b")
    assert(extract("\\usepackage[utf8]{inputenc}x") == "x")
    intercept[IllegalArgumentException] {
      extract("\\begin{figure}never closed")
    }
  }

  test("escapes and named characters emit literals; comments eat lines") {
    assert(extract("100\\% of \\&\\_\\$\\#\\{\\}") == "100% of &_$#{}")
    // the one-space rule applies after a control word: \ldots eats the
    // following space exactly as TeX's tokenizer does
    assert(extract("a\\textbackslash{}b \\ldots c") == "a\\b …c")
    assert(extract("a \\ldots{} c") == "a … c")
    assert(extract("kept % dropped comment\nnext") == "kept next")
    val esc = "w %&$#_{}\\~^"
    assert(extract(new String(Tex.writeTex("T", esc, 0), UTF_8)) ==
      "T\n" + esc)
  }

  test("verbatim passes raw, tokenization suspended") {
    assert(extract("a \\begin{verbatim}$raw$ \\kept{}\\end{verbatim} b") ==
      "a $raw$ \\kept{} b")
  }

  test("warc -> tex e2e: articles land in the corpus, flagged tolerance") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_tex").toString
    graft.io.Warc.writeWarcResponses(
      Seq(
        ("http://t.test/paper.tex", "application/x-tex",
          Tex.writeTex("Paper", "abstract line\nbody line", 1)),
        ("http://t.test/bad.tex", "text/x-tex",
          "\\begin{equation} never closed".getBytes(UTF_8)))
        .toDF("target_uri", "content_type", "payload"), dir)
    val recs = graft.io.Warc.readWarc(spark, dir)
    val out = graft.io.Warc.toDocumentsTex(recs)
      .select("url", "text", "extract_ok")
      .as[(String, String, Boolean)].collect().sortBy(_._1)
    assert(out.length == 2)
    assert(out(0)._1.endsWith("bad.tex") && !out(0)._3 && out(0)._2 == null)
    assert(out(1)._2 == "Paper\nabstract line\nbody line" && out(1)._3)
    val all = graft.io.Warc.toDocuments(recs)
      .select("url", "text").as[(String, String)].collect().toMap
    assert(all("http://t.test/paper.tex").startsWith("Paper\n"))
    assert(!all.contains("http://t.test/bad.tex"))
  }
}
