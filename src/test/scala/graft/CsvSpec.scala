package graft

import graft.operators.Csv

/** CSV extraction: the RFC 4180 state walk (quoted commas, embedded
  * CRLF, doubled-quote escapes), record framing, and the fail-loud
  * boundaries — plus the warc bridge. */
class CsvSpec extends SparkSpec {

  private def extract(csv: String, id: Long = 1L): String =
    Csv.extractText(csv.getBytes("UTF-8"), id)

  test("writeCsv/extractText round-trips rows; quoting where needed") {
    val rows = Seq(
      Seq("a", "with, comma", "c"),
      Seq("she said \"hi\"", "line\nbreak", "plain"))
    assert(Csv.extractText(Csv.writeCsv(rows), 1L) ==
      "a\twith, comma\tc\nshe said \"hi\"\tline\nbreak\tplain")
  }

  test("hand-written forms: CRLF, LF, trailing newline, empty cells") {
    assert(extract("a,b\r\nc,d\r\n") == "a\tb\nc\td")
    assert(extract("a,b\nc,d") == "a\tb\nc\td")
    assert(extract("a,,c\n,b,") == "a\t\tc\n\tb\t")
    assert(extract("\"q,1\",\"he said \"\"x\"\"\"") == "q,1\the said \"x\"")
  }

  test("fail-loud: mid-field quote, char after closing quote, unterminated") {
    intercept[IllegalArgumentException] { extract("ab\"cd\",e") }
    intercept[IllegalArgumentException] { extract("\"ab\"cd,e") }
    intercept[IllegalArgumentException] { extract("\"never closed") }
  }

  test("warc -> csv e2e: tabular text lands in the corpus, flagged tolerance") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_csv").toString
    graft.io.Warc.writeWarcResponses(
      Seq(
        ("http://a.test/t.csv", "text/csv",
          Csv.writeCsv(Seq(Seq("h1", "h2"), Seq("v,1", "v2")))),
        ("http://a.test/bad.csv", "text/csv",
          "\"open".getBytes("UTF-8")))
        .toDF("target_uri", "content_type", "payload"), dir)
    val recs = graft.io.Warc.readWarc(spark, dir)
    val out = graft.io.Warc.toDocumentsCsv(recs)
      .select("url", "text", "extract_ok")
      .as[(String, String, Boolean)].collect().sortBy(_._1)
    assert(out.length == 2)
    assert(out(0)._1.endsWith("bad.csv") && !out(0)._3 && out(0)._2 == null)
    assert(out(1)._2 == "h1\th2\nv,1\tv2" && out(1)._3)
    val all = graft.io.Warc.toDocuments(recs)
      .select("url", "text").as[(String, String)].collect().toMap
    assert(all("http://a.test/t.csv") == "h1\th2\nv,1\tv2")
    assert(!all.contains("http://a.test/bad.csv"))
  }
}
