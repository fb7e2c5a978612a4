package graft

import org.apache.spark.sql.functions._

/** The curate capstone: one archive in, training-ready survivors out —
  * every stage's effect pinned on a planted lane. */
class CurateArchiveSpec extends SparkSpec {
  import spark.implicits._

  test("curateArchive: detect/decode, quality floor, dedup, decontaminate compose") {
    val dir = java.nio.file.Files.createTempDirectory("graft_curate_spec").toString
    val ru = "это русский текст строчными буквами для проверки."
    val keeperText = "the quick brown fox jumps over the lazy dog near the river bank today"
    graft.io.Warc.writeWarcResponses(Seq(
      // a bare windows-1251 page: the detector must name and decode it
      ("http://a.test/legacy", "text/plain",
        (ru + " and some ascii body").getBytes(
          java.nio.charset.Charset.forName("windows-1251"))),
      // boilerplate: one token 40 times → dup-3-gram ratio ≈ 0.97 → cut
      ("http://a.test/spam", "text/plain",
        Array.fill(40)("spam").mkString(" ").getBytes("UTF-8")),
      // a page and its one-token-tail twin: the smaller URL wins
      ("http://a.test/page", "text/plain", keeperText.getBytes("UTF-8")),
      ("http://a.test/zpage", "text/plain",
        (keeperText + " zulu").getBytes("UTF-8")),
      // an html page: strips through the codegen kernel
      ("http://a.test/html", "text/html",
        "<p>first line here now</p><p>second line too</p>".getBytes("UTF-8")),
      // leaked benchmark content: decontamination drops it
      ("http://a.test/leak", "text/plain",
        "every eval item in this benchmark sentence is secret data".getBytes("UTF-8")))
      .toDF("target_uri", "content_type", "payload").coalesce(1), dir)
    val bench = Seq((1L,
      "every eval item in this benchmark sentence is secret data padded"))
      .toDF("doc_id", "text")
    val out = graft.operators.CorpusPipeline.curateArchive(
        graft.io.Warc.readWarc(spark, dir), bench = Some(bench))
      .collect().map(r => r.getAs[String]("url") -> r).toMap
    assert(out.keySet == Set("http://a.test/legacy", "http://a.test/page",
      "http://a.test/html"))
    // the legacy lane decoded under the DETECTED label, margin attached
    assert(out("http://a.test/legacy").getAs[String]("charset") == "windows-1251")
    assert(out("http://a.test/legacy").getAs[String]("text")
      .startsWith(ru))
    // a SCORED claim: positive finite margin (structural lanes are +∞)
    val legacyMargin = out("http://a.test/legacy").getAs[Double]("charset_margin")
    assert(legacyMargin > 0.0 && !legacyMargin.isInfinity)
    // the html lane stripped to line-joined text
    assert(out("http://a.test/html").getAs[String]("text") ==
      "first line here now\nsecond line too")
    // declared-silent utf-8 pages carry the structural margin
    assert(out("http://a.test/page").getAs[Double]("charset_margin")
      .isPosInfinity)
    assert(out("http://a.test/page").getAs[Long]("n_tokens") == 14L)
  }
}
