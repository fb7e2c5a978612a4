package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityLm

/** CCNet-style bigram-LM quality scoring: hand-computed probabilities on a
  * planted corpus, OOV behavior, train/score separation, partition
  * invariance, and the filter cuts. */
class QualityLmSpec extends SparkSpec {

  import spark.implicits._

  // reference corpus: "a b" twice, "a c" once → c(a,b)=2, c(a,c)=1,
  // cctx(a)=3, V = {a,b,c} = 3
  private def refDocs =
    Seq((0L, "a b"), (2L, "a b"), (4L, "a c")).toDF("doc_id", "text")

  test("trainBigramLm: counts, contexts, vocabulary match hand arithmetic") {
    val m = QualityLm.trainBigramLm(refDocs)
    val bc = m.bigrams.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(bc == Map(("a", "b") -> 2.0, ("a", "c") -> 1.0))
    val cc = m.contexts.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(cc == Map("a" -> 3.0))
    assert(m.vocab.collect().head.getDouble(0) == 3.0)
  }

  test("scoreBigramLm: smoothed probabilities match hand arithmetic") {
    val m = QualityLm.trainBigramLm(refDocs)
    // doc "a b": P(b|a) = (2+1)/(3+3) = 0.5 → mean_prob 0.5, hit
    // doc "a z": P(z|a) = (0+1)/(3+3) = 1/6, unseen bigram
    // doc "z q": P(q|z) = (0+1)/(0+3) = 1/3, unseen context
    val scored = QualityLm.scoreBigramLm(m,
        Seq((1L, "a b"), (2L, "a z"), (3L, "z q")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(5))).toMap
    assert(scored(1L)._1 == 1 && scored(1L)._2 == 1 && scored(1L)._3 == 0.5)
    assert(scored(2L)._2 == 0 && scored(2L)._3 == 1.0 / 6.0)
    assert(scored(3L)._2 == 0 && scored(3L)._3 == 1.0 / 3.0)
    // single-bigram docs: ppl = 1/P exactly (exp∘ln roundtrip ~ ulps)
    assert(math.abs(scored(1L)._4 - 2.0) < 1e-12)
    assert(math.abs(scored(2L)._4 - 6.0) < 1e-12)
    assert(math.abs(scored(3L)._4 - 3.0) < 1e-12)
  }

  test("scoreBigramLm: repeated bigrams weight by occurrence, not type") {
    val m = QualityLm.trainBigramLm(refDocs)
    // "a b a b" → bigrams (a,b),(b,a),(a,b): n=3, P(a|b)=(0+1)/(0+3)
    val r = QualityLm.scoreBigramLm(m, Seq((9L, "a b a b")).toDF("doc_id", "text"))
      .collect().head
    assert(r.getLong(1) == 3 && r.getLong(2) == 2)
    val expected = (0.5 + 0.5 + 1.0 / 3.0) / 3.0
    assert(r.getDouble(3) == expected)
  }

  test("docs with fewer than 2 tokens emit no score row") {
    val m = QualityLm.trainBigramLm(refDocs)
    val out = QualityLm.scoreBigramLm(m,
      Seq((1L, "solo"), (2L, ""), (3L, "a b")).toDF("doc_id", "text"))
    assert(out.select("doc_id").as[Long].collect().toSet == Set(3L))
  }

  test("scores are bit-identical across input partitionings") {
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat_ws(" ", (0 to 6).map(i =>
        concat(lit("w"), ((col("id") + i * 7) % 23).cast("string"))): _*).as("text"))
    val m = QualityLm.trainBigramLm(docs.filter(col("doc_id") % 5 === 0))
    val a = QualityLm.scoreBigramLm(m, docs)
    val b = QualityLm.scoreBigramLm(m, docs.repartition(17))
    val diff = a.as("a").join(b.as("b"), Seq("doc_id"))
      .filter(!(col("a.mean_prob") <=> col("b.mean_prob")) ||
        !(col("a.sum_log_prob") <=> col("b.sum_log_prob")) ||
        !(col("a.ppl") <=> col("b.ppl")))
    assert(diff.count() == 0)
  }

  test("fully-OOV document: ppl equals the vocabulary size exactly") {
    val m = QualityLm.trainBigramLm(refDocs)
    val r = QualityLm.scoreBigramLm(m,
      Seq((7L, "x y z w")).toDF("doc_id", "text")).collect().head
    // every bigram P = 1/V = 1/3 → ppl = 3
    assert(math.abs(r.getDouble(5) - 3.0) <= 3.0 * 1e-12)
  }

  test("lmKeepTopFraction keeps the exact best half; filter agrees on clear cuts") {
    val docs = Seq(
      (1L, "a b"),   // mean_prob 0.5 — best
      (2L, "a c"),   // (1+1)/6 = 1/3
      (3L, "a z"),   // 1/6
      (4L, "z q")    // 1/3 (unseen context)
    ).toDF("doc_id", "text")
    val kept = QualityLm.lmKeepTopFraction(refDocs, docs, keepFraction = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // ranks: 1 (0.5), then 2 vs 4 tie at 1/3 → doc_id break keeps 2
    assert(kept == Set(1L, 2L))
    val floor = QualityLm.lmQualityFilter(refDocs, docs, quantile = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // interpolated median of (1/6, 1/3, 1/3, 1/2) = 1/3 → keeps the 1/3s too
    assert(floor == Set(1L, 2L, 4L))
  }
}
