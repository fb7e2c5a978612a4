package graft

import org.apache.spark.sql.functions._

import graft.operators.Decontaminate

/** Benchmark decontamination: verbatim n-gram overlap flags, the ≤n
  * whole-text fallback semantics, the keep-side drop, and the
  * broadcast shape of the semi join. */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    "alpha beta gamma delta epsilon zeta", // 6 tokens → two 5-windows
    "tiny bench" // ≤ n: one whole-text gram
  ).toDF("text")

  private val docs = Seq(
    (1L, "xx alpha beta gamma delta epsilon yy"), // shares a full 5-window
    (2L, "alpha beta gamma delta zz yy ww vv"),   // only a 4-gram: clean
    (3L, "tiny bench"),                           // short-doc ≡ short-bench
    (4L, "contains tiny bench inside a longer sentence here"),
    (5L, "completely unrelated text with no overlap at all"))
    .toDF("doc_id", "text")

  test("flagContaminated: verbatim 5-gram overlap, nothing shorter") {
    val got = Decontaminate.flagContaminated(docs, bench, n = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("contaminated")).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true,
      4L -> false, 5L -> false))
    // doc 4 is the DEFINED semantics of the ≤n fallback: a short
    // benchmark's whole-text gram only equals a short document's —
    // a 5-window of a longer doc is never the 2-token string
  }

  test("dropContaminated keeps exactly the clean side") {
    val kept = Decontaminate.dropContaminated(docs, bench, n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L, 5L))
  }

  test("empty benchmark flags nothing; doc set round-trips") {
    val none = Decontaminate.flagContaminated(docs,
      Seq.empty[String].toDF("text"), n = 5)
    assert(none.filter(col("contaminated")).isEmpty)
    assert(none.count() == docs.count())
  }

  test("the benchmark gram side broadcasts (no corpus-scale shuffle)") {
    val plan = Decontaminate.flagContaminated(docs, bench, n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"))
  }

  test("flagNearContaminated catches a paraphrase exact n-grams miss") {
    import spark.implicits._
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra tango"
    val corpus = Seq(
      (1L, base),
      // the leak: ONE middle word swapped — no verbatim 8-gram survives
      // on either side of the swap at n=8? (it does on the long side —
      // so exact is tested at n=13 where none survives)
      (2L, base.replace("india", "JULIET")),
      (3L, "completely unrelated words one two three four five six seven " +
        "eight nine ten eleven twelve thirteen fourteen fifteen sixteen"))
      .toDF("doc_id", "text")
    val benchDf = Seq((100L, base)).toDF("doc_id", "text")
    // exact 13-gram decontamination MISSES the one-word swap
    val exact = Decontaminate.flagContaminated(corpus, benchDf, n = 13)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("contaminated"))
      .toMap
    assert(exact(1L) && !exact(2L) && !exact(3L))
    // the fuzzy pass catches it; the unrelated doc stays clean
    val near = Decontaminate.flagNearContaminated(corpus, benchDf,
        minJaccard = 0.6)
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("near_contaminated")).toMap
    assert(near(1L) && near(2L) && !near(3L))
  }

  test("flagNearContaminated: bench sides broadcast, corpus never shuffles") {
    import spark.implicits._
    val corpus = (1L to 50L).map(i => (i, s"doc $i body words " + ("w" * 5)))
      .toDF("doc_id", "text")
    val benchDf = Seq((100L, "doc 7 body words wwwww")).toDF("doc_id", "text")
    val plan = Decontaminate.flagNearContaminated(corpus, benchDf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"))
  }
}
