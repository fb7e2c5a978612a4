package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Benchmark decontamination — the eval-integrity pass every serious
  * training pipeline runs (the GPT-3 appendix-C recipe, since adopted
  * by PaLM/Llama and the open reproductions): a training document that
  * shares ANY verbatim token n-gram with an evaluation benchmark is
  * flagged (or dropped), because models memorize, and a contaminated
  * eval score is not a measurement. The match is exact-token overlap —
  * `TF.shingles` n-grams (distinct windows, the ≤n whole-text
  * fallback) on BOTH sides, so the operator is deterministic and the
  * oracle replays the identical gram algebra in SQL.
  *
  * Scale shape (the reason this is two asymmetric joins, not one):
  * the benchmark side is EVAL-scale — thousands of documents, a gram
  * set in the tens of MB — so its distinct grams BROADCAST, and the
  * corpus side's exploded grams left-semi-join against them without a
  * corpus-scale shuffle; the surviving contaminated ids are rare by
  * construction, so the distinct and the flag-back join are both
  * small-side broadcasts too. Nothing in the plan shuffles the corpus.
  *
  * Both small sides carry an EXPLICIT broadcast hint, not a prayer to
  * the planner: their size estimates derive from the CORPUS relation
  * (a filter/aggregate over it), which without column statistics stays
  * corpus-sized, and the measured 100× octave showed the planner
  * flipping the semi join to a 1.3 GB corpus-side shuffle exactly
  * because of that. The hint encodes the operator's contract — the
  * benchmark is eval-scale and contamination is rare; a benchmark
  * genuinely too large to broadcast should be split and the operator
  * run per shard (the flag is a union-friendly boolean). */
object Decontaminate {

  /** Every row of `docs` plus a `contaminated` flag: true when the
    * document shares at least one verbatim token n-gram with any
    * `bench` row's text. */
  def flagContaminated(docs: DataFrame, bench: DataFrame, n: Int = 13,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(n > 0, "n must be positive")
    val benchGrams = bench
      .select(explode(TF.shingles(col(textCol), n)).as("gram")).distinct()
    val contaminated = docs
      .select(col(idCol), explode(TF.shingles(col(textCol), n)).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .select(col(idCol)).distinct()
      .withColumn("__contaminated", lit(true))
    docs.join(broadcast(contaminated), Seq(idCol), "left")
      .withColumn("contaminated",
        coalesce(col("__contaminated"), lit(false)))
      .drop("__contaminated")
  }

  /** The keep-side of [[flagContaminated]]: `docs` minus every
    * contaminated row — the form a training-data build calls. */
  def dropContaminated(docs: DataFrame, bench: DataFrame, n: Int = 13,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    flagContaminated(docs, bench, n, textCol, idCol)
      .filter(!col("contaminated")).drop("contaminated")

  /** NEAR-duplicate decontamination — the leak vector exact n-grams
    * miss: a benchmark item that reached the training set paraphrased,
    * re-wrapped, or lightly edited shares high shingle overlap but not
    * necessarily one verbatim 13-gram. Same MinHash+LSH machinery as
    * the dedup tier ([[Dedup.minhashSignatureTable]] /
    * [[Dedup.minhashBucketTable]]), exact shingle-hash Jaccard verify
    * on every candidate (bucket collisions never produce a false
    * positive), flag ids deterministic given (k, bands, shingleN).
    *
    * Scale shape — the MIRROR of [[Dedup.minhashDedupAgainst]]'s
    * asymmetry: there the BATCH broadcasts against a corpus-scale
    * index; here the BENCHMARK side is eval-scale, so ITS buckets and
    * signature rows broadcast (explicit hints, the [[flagContaminated]]
    * contract) and the corpus streams ONCE through the narrow
    * signature/bucket derivation — no corpus-scale shuffle anywhere.
    * The verify recomputes shingle hashes only for the rare candidate
    * docs (a broadcast semi-join prune of the raw corpus), so the wide
    * hs arrays never materialize corpus-wide.
    *
    * `docSigs`: a [[Dedup.minhashSignatureTable]] frame of `docs` the
    * caller already owns (doc_id column holding `idCol` values — the
    * same (k, bands, shingleN) pinning contract as every signature
    * consumer). When given, the corpus is NOT re-tokenized here: the
    * bucket derivation explodes the existing signatures and the verify
    * reads their `hs` arrays directly (the caller persisted them, so
    * the wide arrays were already materialized once for its own dedup
    * pass — [[CorpusPipeline.curateArchive]] shares one signature
    * table between near-dup dedup and this probe instead of running
    * the tokenize → shingle → minhash kernels twice over the curated
    * corpus). */
  def flagNearContaminated(docs: DataFrame, bench: DataFrame,
      k: Int = 64, bands: Int = 16, shingleN: Int = 3,
      minJaccard: Double = 0.8, textCol: String = "text",
      idCol: String = "doc_id",
      docSigs: Option[DataFrame] = None): DataFrame = {
    val flagged = nearContaminatedIds(docs, bench, k, bands, shingleN,
        minJaccard, textCol, idCol, docSigs)
      .withColumn("__near", lit(true))
    docs.join(broadcast(flagged), Seq(idCol), "left")
      .withColumn("near_contaminated", coalesce(col("__near"), lit(false)))
      .drop("__near")
  }

  /** The flagged-id set of [[flagNearContaminated]] as a bare frame (one
    * `idCol` column) — the form [[CorpusPipeline.curateArchive]] consumes
    * directly (it anti-joins the ids instead of carrying the flag). */
  def nearContaminatedIds(docs: DataFrame, bench: DataFrame,
      k: Int = 64, bands: Int = 16, shingleN: Int = 3,
      minJaccard: Double = 0.8, textCol: String = "text",
      idCol: String = "doc_id",
      docSigs: Option[DataFrame] = None): DataFrame = {
    // NOT persisted: both consumers broadcast it, and the benchmark is
    // eval-scale by contract — recomputing its signature subtree twice
    // is cheaper than a cached frame with no unpersist point (the r16
    // persist here leaked one eval-scale frame per call — guide §5)
    val benchSigs = Dedup.minhashSignatureTable(bench, idCol, textCol,
        k, shingleN)
    val docBuckets = Dedup.minhashBucketTable(
      docSigs.getOrElse(
        Dedup.minhashSignatureTable(docs, idCol, textCol, k, shingleN)),
      k, bands)
    val candidates = docBuckets.as("d")
      .join(broadcast(Dedup.minhashBucketTable(benchSigs, k, bands).as("b")),
        col("d.band") === col("b.band") && col("d.bucket") === col("b.bucket"))
      .select(col("d.doc_id").as("doc_id"), col("b.doc_id").as("bench_id"))
      .distinct()
    val docNeeded = docSigs match {
      case Some(ds) => ds
        .join(broadcast(candidates.select(col("doc_id")).distinct()),
          Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("hs").as("hs_d"))
      case None => Dedup.minhashSignatureTable(
          docs.join(broadcast(candidates.select(col("doc_id").as(idCol))
            .distinct()), Seq(idCol), "left_semi"),
          idCol, textCol, k, shingleN)
        .select(col("doc_id"), col("hs").as("hs_d"))
    }
    candidates
      .join(docNeeded, Seq("doc_id"))
      .join(broadcast(benchSigs.select(col("doc_id").as("bench_id"),
        col("hs").as("hs_b"))), Seq("bench_id"))
      .withColumn("n_shared", size(array_intersect(col("hs_d"), col("hs_b"))))
      .filter(col("n_shared").cast("double") /
        (size(col("hs_d")) + size(col("hs_b")) - col("n_shared"))
          .cast("double") >= minJaccard)
      .select(col("doc_id").as(idCol)).distinct()
  }
}
