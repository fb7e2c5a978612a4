package graft

import graft.operators.{Docx, Xlsx}

/** XLSX extraction: the sharedStrings pool (dedup, rich-text runs),
  * the cell-type scan (shared, numeric, inline, formula-result, empty
  * cells), multi-sheet flattening, and the fail-loud boundaries — plus
  * the warc bridge. */
class XlsxSpec extends SparkSpec {

  test("writeXlsx/extractText round-trips rows; repeated values share a slot") {
    val rows = Seq(
      Seq("alpha", "first sentence"),
      Seq("alpha", "second one"),
      Seq("alpha", "first sentence")) // full repeat: pool stays small
    val bytes = Xlsx.writeXlsx(rows)
    assert(Xlsx.extractText(bytes, 1L) ==
      "alpha\tfirst sentence\nalpha\tsecond one\nalpha\tfirst sentence")
    // the pool really deduped: 3 unique strings, not 6
    val sst = new String(Docx.zipEntry(bytes, "xl/sharedStrings.xml", 1L), "UTF-8")
    assert(sst.contains("uniqueCount=\"3\""))
    assert("<si>".r.findAllIn(sst).size == 3)
  }

  test("cell types: numbers, inline strings, formula results, empty cells") {
    // hand-built sheet, no shared strings at all — a foreign writer's mix
    val sheet =
      """<worksheet><sheetData>""" +
        """<row r="1"><c r="A1"><v>42</v></c><c r="B1" t="inlineStr">""" +
        """<is><t xml:space="preserve">inline text</t></is></c></row>""" +
        """<row r="2"><c r="A2" t="str"><v>=SUM result</v></c>""" +
        """<c r="B2"/><c r="C2"><v>3.14</v></c></row>""" +
        """</sheetData></worksheet>"""
    val pkg = Docx.writeZip(Seq(
      "xl/workbook.xml" -> "<workbook/>".getBytes("UTF-8"),
      "xl/worksheets/sheet1.xml" -> sheet.getBytes("UTF-8")))
    assert(Xlsx.extractText(pkg, 2L) ==
      "42\tinline text\n=SUM result\t\t3.14")
  }

  test("multiple sheets flatten in order; entities decode") {
    val s1 = """<worksheet><sheetData><row r="1"><c r="A1" t="inlineStr">""" +
      """<is><t>a &lt; b &amp; c</t></is></c></row></sheetData></worksheet>"""
    val s2 = """<worksheet><sheetData><row r="1"><c r="A1" t="inlineStr">""" +
      """<is><t>sheet&#50;</t></is></c></row></sheetData></worksheet>"""
    val pkg = Docx.writeZip(Seq(
      "xl/worksheets/sheet1.xml" -> s1.getBytes("UTF-8"),
      "xl/worksheets/sheet2.xml" -> s2.getBytes("UTF-8")))
    assert(Xlsx.extractText(pkg, 3L) == "a < b & c\nsheet2")
  }

  test("fail-loud: no sheets, out-of-range shared index, truncation") {
    val noSheets = Docx.writeZip(Seq(
      "xl/workbook.xml" -> "<workbook/>".getBytes("UTF-8")))
    val e = intercept[IllegalArgumentException] {
      Xlsx.extractText(noSheets, 4L)
    }
    assert(e.getMessage.contains("worksheets"))
    // a shared-string index past the pool is data corruption, not GIGO
    val badIdx = Docx.writeZip(Seq(
      "xl/sharedStrings.xml" ->
        "<sst><si><t>only</t></si></sst>".getBytes("UTF-8"),
      "xl/worksheets/sheet1.xml" ->
        ("""<worksheet><sheetData><row r="1"><c r="A1" t="s"><v>7</v></c>""" +
          """</row></sheetData></worksheet>""").getBytes("UTF-8")))
    val e2 = intercept[IllegalArgumentException] {
      Xlsx.extractText(badIdx, 5L)
    }
    assert(e2.getMessage.contains("out of range"))
    val good = Xlsx.writeXlsx(Seq(Seq("x")))
    intercept[IllegalArgumentException] {
      Xlsx.extractText(good.take(good.length / 2), 6L)
    }
  }

  test("warc -> xlsx e2e: tabular text lands in the corpus, flagged tolerance") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val mime =
      "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_xlsx").toString
    graft.io.Warc.writeWarcResponses(
      Seq(
        ("http://a.test/t.xlsx", mime,
          Xlsx.writeXlsx(Seq(Seq("h1", "h2"), Seq("v1", "v2")))),
        ("http://a.test/bad.xlsx", mime, Array[Byte](7, 7, 7)))
        .toDF("target_uri", "content_type", "payload"), dir)
    val recs = graft.io.Warc.readWarc(spark, dir)
    val out = graft.io.Warc.toDocumentsXlsx(recs)
      .select("url", "text", "extract_ok")
      .as[(String, String, Boolean)].collect().sortBy(_._1)
    assert(out.length == 2)
    assert(out(0)._1.endsWith("bad.xlsx") && !out(0)._3 && out(0)._2 == null)
    assert(out(1)._2 == "h1\th2\nv1\tv2" && out(1)._3)
    // the combined text face carries it
    val all = graft.io.Warc.toDocuments(recs)
      .select("url", "text").as[(String, String)].collect().toMap
    assert(all("http://a.test/t.xlsx") == "h1\th2\nv1\tv2")
    assert(!all.contains("http://a.test/bad.xlsx"))
  }
}
