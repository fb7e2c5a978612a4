package graft

import org.apache.spark.sql.functions._

import graft.operators.Report

/** Dataset-card operator: level semantics, share arithmetic, and the
  * ONE-PASS plan property (all rollup levels through a single Expand +
  * a single aggregation exchange — no per-level scans or unions). The
  * numeric oracle lives in q_dataset_card / q_corpus_composition. */
class ReportSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      ("s1", "en", "one two three"),
      ("s1", "en", "four five"),
      ("s1", "de", "sechs"),
      ("s2", "en", "seven eight nine ten"))
      .toDF("source", "lang", "text")
  }

  test("rollup levels: leaf, per-source, global — with grouping_id encoding") {
    val card = Report.datasetCard(corpus, Seq("source", "lang")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang"),
        r.getAs[Long]("gid")) -> r).toMap
    // global: gid = 3, both dims null
    val g = card((null, null, 3L))
    assert(g.getAs[Long]("n_docs") == 4 && g.getAs[Long]("n_tokens") == 10)
    assert(g.getAs[Double]("mean_tokens") == 2.5)
    // per-source subtotal: gid = 1 (lang rolled away)
    val s1 = card(("s1", null, 1L))
    assert(s1.getAs[Long]("n_docs") == 3 && s1.getAs[Long]("n_tokens") == 6)
    assert(s1.getAs[Int]("min_tokens") == 1 && s1.getAs[Int]("max_tokens") == 3)
    // leaf: gid = 0
    val leaf = card(("s1", "en", 0L))
    assert(leaf.getAs[Long]("n_docs") == 2 && leaf.getAs[Long]("n_chars") == 22)
    assert(card.size == 1 + 2 + 3, "4 leaves minus merged? levels: 1 global + 2 sources + 3 leaves")
  }

  test("one-pass plan: a single Expand and a single aggregation exchange") {
    val plan = Report.datasetCard(corpus, Seq("source", "lang"))
      .queryExecution.executedPlan.toString
    assert("(?m)^\\s*[+:]?-? ?\\*?\\(?\\d*\\)? ?Expand".r
      .findAllIn(plan).size == 1 || plan.split("Expand").length == 2,
      s"expected exactly one Expand in:\n$plan")
    assert(plan.split("Exchange").length == 2,
      s"expected exactly one Exchange in:\n$plan")
  }

  test("composition: shares sum to 1 in both units, leaves only") {
    val rows = Report.corpusComposition(corpus, Seq("source", "lang")).collect()
    assert(rows.length == 3) // the three (source, lang) leaves
    assert(math.abs(rows.map(_.getAs[Double]("doc_share")).sum - 1.0) < 1e-12)
    assert(math.abs(rows.map(_.getAs[Double]("token_share")).sum - 1.0) < 1e-12)
    // sorted by token share desc: s1/en (5 of 10) leads? s2/en has 4, s1/en 5
    assert(rows.head.getAs[String]("source") == "s1" &&
      rows.head.getAs[String]("lang") == "en")
    spark.catalog.clearCache()
  }
}
