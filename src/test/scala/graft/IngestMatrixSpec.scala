package graft

import org.apache.spark.sql.functions._

/** The all-formats ingest matrix (q_ingest_matrix): every
  * toDocuments-routable carrier served through sniffTypes ∘ toDocuments
  * in one staged archive — the spec pins lane coverage and the
  * per-lane derivations the DuckDB oracle replays at sf0.01, so a
  * format silently dropping out of the dispatcher fails sbt test too,
  * not only the correctness gate. */
class IngestMatrixSpec extends SparkSpec {

  private lazy val rows = {
    val df = queries.ExtensionQueries
      .queries("q_ingest_matrix")(spark, "/root/testdata/sf0.001")
    df.collect().map(r => (r.getLong(0), r.getString(1),
      r.getString(2), r.getString(3)))
  }

  test("every lane of the routing table lands at least one document") {
    val lanes = rows.map(_._2).toSet
    assert(lanes == Set("html", "pdf", "docx", "xlsx", "pptx", "epub",
      "rtf", "subtitles", "archive", "csv", "eml", "mbox", "tex", "feed",
      "sqlite", "odf", "ics", "markdown", "text", "json", "mhtml"))
  }

  test("one document in, one document out — no lane multiplies or drops") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(rows.length.toLong == docs)
    assert(rows.map(_._1).distinct.length.toLong == docs)
  }

  test("fragment urls follow the per-entry archive convention") {
    rows.foreach { case (id, fmt, url, _) =>
      val expected = s"http://corpus.test/doc/$id" + (fmt match {
        case "archive" => "#p1.txt"
        case "mbox" | "feed" | "ics" => "#0"
        case _ => ""
      })
      assert(url == expected, s"lane $fmt")
    }
  }

  test("per-lane text derivations hold against the source corpus") {
    val src = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    rows.foreach { case (id, fmt, _, text) =>
      val (source, orig) = src(id)
      val x = orig.split(java.util.regex.Pattern.quote(". "), -1)
        .mkString("\n")
      val tabR = source + "\t" +
        orig.split(java.util.regex.Pattern.quote(". "), -1)
          .mkString("\n" + source + "\t")
      val expected = fmt match {
        case "xlsx" | "sqlite" => tabR
        case "odf" => if ((id / 21) % 3 == 1) tabR else x
        case "csv" => orig.split(java.util.regex.Pattern.quote(". "), -1)
          .map(l => s"$source\t$l\tv,$id").mkString("\n")
        case "eml" | "mbox" => s"Subject $id\n" + x
        case "tex" => s"Doc $id\n" + x
        case "feed" => "Item 0\n" + orig
        case "ics" => "Event 1\n" + orig
        case _ => x
      }
      assert(text == expected, s"lane $fmt doc $id")
    }
  }
}
