package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.operators.Markdown

/** The CommonMark-shaped strip: block peel (headings, quotes, lists,
  * rules, fences, reference definitions), conservative inline pass,
  * YAML front matter, the writer round-trip, and the warc bridges. */
class MarkdownSpec extends SparkSpec {

  private def strip(s: String): String =
    Markdown.extractText(s.getBytes(UTF_8))

  test("block markup peels: ATX/setext headings, quotes, lists, rules") {
    val md =
      """# Title
        |## Sub ##
        |Setext title
        |============
        |Another one
        |---
        |> quoted line
        |> > nested quote
        |- bullet one
        |* bullet two
        |+ bullet three
        |3. ordered item
        |---
        |***
        |_  _  _
        |plain prose
        |""".stripMargin
    assert(strip(md) ==
      List("Title", "Sub", "Setext title", "Another one", "quoted line",
        "nested quote", "bullet one", "bullet two", "bullet three",
        "ordered item", "plain prose").mkString("\n"))
  }

  test("fences keep interiors verbatim; ref definitions drop") {
    val md =
      """before
        |```scala
        |val x = 1 * 2 // **not emphasis**
        |# not a heading
        |```
        |~~~
        |tilde fence
        |~~~
        |[ref]: https://ex.test/target
        |see [the docs][ref] here
        |""".stripMargin
    assert(strip(md) ==
      List("before", "val x = 1 * 2 // **not emphasis**", "# not a heading",
        "tilde fence", "see the docs here").mkString("\n"))
  }

  test("inline: links, images, autolinks, code spans, escapes") {
    assert(Markdown.inline("a [link text](https://x.test/p?q=1) b") ==
      "a link text b")
    assert(Markdown.inline("![alt words](img.png) leads") == "alt words leads")
    assert(Markdown.inline("go to <https://spark.apache.org> now") ==
      "go to https://spark.apache.org now")
    // code-span MARKERS strip (interior ticks of a double span too —
    // the curation strip keeps prose, not code-span boundaries)
    assert(Markdown.inline("use `spark.read` and ``a `tick` span``") ==
      "use spark.read and a tick span")
    assert(Markdown.inline("\\*literal\\* and \\# hash") ==
      "*literal* and # hash")
  }

  test("inline: emphasis pairs strip, flanking-safe cases survive") {
    assert(Markdown.inline("**bold** *ital* ***both*** ~~gone~~ __u__ _i_") ==
      "bold ital both gone u i")
    // NOT emphasis: spaced math, snake_case identifiers
    assert(Markdown.inline("2 * 3 * 4 = 24") == "2 * 3 * 4 = 24")
    assert(Markdown.inline("use snake_case_names here") ==
      "use snake_case_names here")
    assert(Markdown.inline("mixed *em* with snake_case stays") ==
      "mixed em with snake_case stays")
  }

  test("front matter: parsed to (key, value), stripped from text") {
    val md = "---\ntitle: My Doc\nquoted: \"v: colon\"\ntags: a, b\n---\n\nbody line\n"
    assert(Markdown.frontMatter(md.getBytes(UTF_8)) ==
      Vector("title" -> "My Doc", "quoted" -> "v: colon", "tags" -> "a, b"))
    assert(strip(md) == "body line")
    // no front matter: a mid-document --- is a rule, not a header
    assert(Markdown.frontMatter("body\n---\nx: y\n---\n".getBytes(UTF_8)).isEmpty)
    // unterminated header: treated as prose, not swallowed
    assert(strip("---\nkey: value\nbody\n") == "key: value\nbody")
    // CRLF input
    assert(Markdown.frontMatter("---\r\na: b\r\n---\r\n".getBytes(UTF_8)) ==
      Vector("a" -> "b"))
  }

  test("writer round-trip: the full construct cycle inverts") {
    val sentences = (1 to 10).map(i => s"sentence number $i with words")
    val md = Markdown.writeMarkdown(sentences,
      Seq("title" -> "doc 7", "source" -> "web", "lang" -> "en"))
    assert(Markdown.extractText(md.getBytes(UTF_8)) == sentences.mkString("\n"))
    assert(Markdown.frontMatter(md.getBytes(UTF_8)) ==
      Vector("title" -> "doc 7", "source" -> "web", "lang" -> "en"))
  }

  test("warc e2e: text/markdown responses and .md archive entries strip") {
    import spark.implicits._
    val md = Markdown.writeMarkdown(Seq("alpha prose", "beta prose"))
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_md").toString
    graft.io.Warc.writeWarcResponses(
      Seq(
        ("http://a.test/readme", "text/markdown", md.getBytes(UTF_8)),
        ("http://a.test/docs.zip", "application/zip",
          graft.operators.Docx.writeZip(Seq(
            "guide.md" -> "# Guide\n\nthe *content*\n".getBytes(UTF_8)))))
        .toDF("target_uri", "content_type", "payload"), dir)
    val recs = graft.io.Warc.readWarc(spark, dir)
    val direct = graft.io.Warc.toDocumentsMarkdown(recs)
      .select("url", "text").as[(String, String)].collect().toMap
    assert(direct("http://a.test/readme") == "alpha prose\nbeta prose")
    val viaZip = graft.io.Warc.toDocumentsArchive(recs)
      .select("url", "text").as[(String, String)].collect().toMap
    assert(viaZip("http://a.test/docs.zip#guide.md") == "Guide\nthe content")
    // the union face carries the markdown branch
    val union = graft.io.Warc.toDocuments(recs)
      .select("url").as[String].collect().toSet
    assert(union.contains("http://a.test/readme"))
    // front matter is the sniffable markdown signature
    assert(graft.operators.Sniff.sniffMime(
      Markdown.writeMarkdown(Seq("x"), Seq("title" -> "t")).getBytes(UTF_8))
      .contains("text/markdown"))
  }
}
