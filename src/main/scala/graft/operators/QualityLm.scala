package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CCNet-style statistical language-model quality scoring (Wenzek et al.
  * 2020): train a word-bigram LM with add-one smoothing on a REFERENCE
  * corpus (CCNet uses Wikipedia; the queries use a deterministic slice of
  * the documents table), score every candidate document by how well the
  * model predicts it, and filter on the score — the curation stage that
  * separates "looks like the reference distribution" from boilerplate,
  * gibberish, and SEO spam that per-doc heuristics (Gopher rules, ratios)
  * cannot see because they carry no cross-document statistics.
  *
  * The reference pipeline has no LM surface (SURVEY.md §2.9 — this is a
  * training-data extension operator like the rest of this package).
  *
  * Model representation: plain DataFrames, not a driver-side object —
  * bigram counts for a 100 TB reference corpus are themselves table-scale
  * (O(unique bigrams)), so the model must live distributed and the score
  * join must be a key join the planner can shuffle or broadcast as stats
  * dictate. KenLM-style binary formats are a single-node luxury.
  *
  * Scale shape:
  *  - train: two hash-aggregate shuffles (bigram counts; context counts
  *    derived FROM the bigram counts — never a second pass over the
  *    corpus) plus one distinct-count for the vocabulary size.
  *  - score: per-doc bigram TYPE counts (one doc-keyed aggregate, so each
  *    distinct bigram crosses the model joins once, not once per
  *    occurrence), two key joins against the model tables (prev,cur) and
  *    (prev) — AQE broadcasts small models, table-scale models ride a
  *    shuffle join — and one final doc-keyed aggregate.
  *  - nothing is collected to the driver; the "model" never leaves
  *    executor space.
  *
  * Determinism contract (the oracle story): every score column except the
  * perplexity is exact-rational arithmetic over counts, folded in value
  * order — bit-reproducible across engines and partitionings, DuckDB
  * replays it verbatim (`q_lm_score`). True perplexity needs ln/exp,
  * whose last ulp differs between libm and the JVM (the q_tfidf_terms
  * precedent), so `ppl` is NOT oracle-compared: `q_check_lm_ppl` gates it
  * in-engine instead (partition invariance, range, and an exact planted
  * fully-OOV fixed point where ppl must equal the vocabulary size).
  */
object QualityLm {

  /** A trained bigram LM: `bigrams` (prev, cur, c), `contexts`
    * (prev, cctx = Σ c over cur), `vocab` (single row: vocab = |V| as
    * DOUBLE). All counts DOUBLE (exact integer-valued) so score
    * arithmetic is one fixed expression tree. */
  final case class BigramLm(bigrams: DataFrame, contexts: DataFrame, vocab: DataFrame)

  /** (doc_id, prev, cur) bigram stream of `docs`; docs with fewer than 2
    * tokens emit nothing (a one-token document has no bigram evidence —
    * callers wanting to keep them filter on token count upstream). */
  private def bigramStream(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.TextFunctions.tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(tk) - 2), i -> struct(tk[i] AS prev, tk[i + 1] AS cur))"))
        .as("bg"))
      .select(col("doc_id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))

  /** Train the add-one bigram LM on `reference`. Two aggregate shuffles
    * and a distinct-count; the corpus streams through once. */
  def trainBigramLm(reference: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): BigramLm = {
    val bg = bigramStream(reference, idCol, textCol)
    val bigrams = bg.groupBy("prev", "cur")
      .agg(count(lit(1)).cast(DoubleType).as("c"))
    // context count = Σ bigram counts with this left term — derived from
    // the (much smaller) bigram table, not from a second corpus pass
    val contexts = bigrams.groupBy("prev")
      .agg(sum(col("c").cast(LongType)).cast(DoubleType).as("cctx"))
    // vocabulary over the SAME token stream the bigrams came from (docs
    // with >= 2 tokens), so a fully-OOV document's smoothed probability
    // has the exact 1/|V| fixed point q_check_lm_ppl pins down
    val vocab = reference
      .select(col(idCol).as("doc_id"),
        graft.functions.TextFunctions.tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(explode(col("tk")).as("tok"))
      .agg(countDistinct(col("tok")).cast(DoubleType).as("vocab"))
    BigramLm(bigrams, contexts, vocab)
  }

  /** Score `docs` under `model`. Per document (with ≥ 2 tokens):
    *
    *  - `n_bigrams`: bigram occurrences (token count − 1)
    *  - `n_hit`: occurrences whose bigram the model has seen
    *  - `mean_prob`: arithmetic mean of the smoothed bigram probabilities
    *    P(cur|prev) = (c + 1) / (cctx + |V|) — the engine-portable quality
    *    signal (exact-rational per term, value-sorted fold)
    *  - `sum_log_prob`, `ppl`: Σ ln P (value-sorted fold) and the true
    *    perplexity exp(−Σ/n) — transcendental, gate-checked not
    *    oracle-compared (see object doc)
    *
    * Unseen bigram with a seen context → P = 1/(cctx+|V|); fully unseen
    * context → P = 1/|V| exactly. Occurrence weighting happens on the
    * TYPE row (w = tf · P, w_log = tf · ln P) so repeated bigrams cross
    * the model joins once. */
  def scoreBigramLm(model: BigramLm, docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val types = bigramStream(docs, idCol, textCol)
      .groupBy("doc_id", "prev", "cur")
      .agg(count(lit(1)).as("tf"))
    val p = types
      .join(model.bigrams, Seq("prev", "cur"), "left")
      .join(model.contexts, Seq("prev"), "left")
      .crossJoin(broadcast(model.vocab)) // single row
      .withColumn("p",
        (coalesce(col("c"), lit(0.0)) + lit(1.0)) /
          (coalesce(col("cctx"), lit(0.0)) + col("vocab")))
      .select(col("doc_id"), col("tf"), col("c"),
        (col("tf").cast(DoubleType) * col("p")).as("w"),
        (col("tf").cast(DoubleType) * log(col("p"))).as("w_log"))
    p.groupBy("doc_id")
      .agg(
        sum(col("tf")).as("n_bigrams"),
        sum(when(col("c").isNotNull, col("tf")).otherwise(lit(0L))).as("n_hit"),
        aggregate(array_sort(collect_list(col("w"))), lit(0.0),
          (acc, x) => acc + x).as("sum_p"),
        aggregate(array_sort(collect_list(col("w_log"))), lit(0.0),
          (acc, x) => acc + x).as("sum_log_prob"))
      .select(col("doc_id"), col("n_bigrams"), col("n_hit"),
        (col("sum_p") / col("n_bigrams").cast(DoubleType)).as("mean_prob"),
        col("sum_log_prob"),
        exp(-col("sum_log_prob") / col("n_bigrams").cast(DoubleType)).as("ppl"))
  }

  /** The CCNet filter composed end-to-end: train on `reference`, score
    * `docs`, keep documents whose mean smoothed-bigram probability is at
    * or above the `quantile`-quantile of the scored corpus (CCNet keeps
    * the best-perplexity fraction; mean_prob is the portable score — see
    * object doc). Exact interpolating percentile, broadcast back, one
    * filter — the q_quality_floor shape, and the form that scales: the
    * floor is one broadcast scalar, the filter a map-side predicate.
    *
    * NOT oracle-compared: interpolating-percentile formulas over DOUBLE
    * inputs are engine-specific in the last ulp (`lo + (hi−lo)·f` vs
    * `lo·(1−f) + hi·f` differ), and a boundary document would flip. The
    * oracled variant is [[lmKeepTopFraction]], whose rank cut is exact. */
  def lmQualityFilter(reference: DataFrame, docs: DataFrame,
      quantile: Double = 0.5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(quantile > 0 && quantile < 1, s"quantile must be in (0,1): $quantile")
    val scored = scoreBigramLm(trainBigramLm(reference, idCol, textCol),
      docs, idCol, textCol)
    val floor = scored.agg(
      expr(s"percentile(mean_prob, $quantile)").as("floor_prob"))
    scored.crossJoin(broadcast(floor))
      .filter(col("mean_prob") >= col("floor_prob"))
      .select("doc_id", "n_bigrams", "n_hit", "mean_prob")
  }

  /** Exact-k variant of the CCNet cut: keep the best
    * ⌈keepFraction · n⌉ documents by (mean_prob desc, doc_id) global
    * rank. Because mean_prob is bit-deterministic (object doc), the rank
    * — and therefore the kept SET — is engine-portable, which the
    * interpolated floor is not; this is the oracled form.
    *
    * The global rank is DISTRIBUTED, bit-identically (the token_budget
    * prefix-sum treatment, rank-shaped): mean_prob ∈ (0, 1] (each
    * smoothed bigram probability is, so their mean is; documents with
    * fewer than two tokens never reach the scored table), so
    * `floor(mean_prob · 4096)` is a monotone coarsening of the primary
    * order key — (bucket desc, mean_prob desc, doc_id) IS the global
    * order. Each of ≤4097 buckets ranks its own rows in parallel and
    * adds the count of all higher buckets (a buckets-sized aggregate,
    * window-scanned at trivial size and broadcast back). No
    * single-partition window anywhere: hot-bucket parallelism instead
    * of one task holding the whole corpus's doc rows. */
  def lmKeepTopFraction(reference: DataFrame, docs: DataFrame,
      keepFraction: Double = 0.5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(keepFraction > 0 && keepFraction <= 1,
      s"keepFraction must be in (0,1]: $keepFraction")
    val scored = scoreBigramLm(trainBigramLm(reference, idCol, textCol),
      docs, idCol, textCol)
    val n = scored.agg(count(lit(1)).as("n"))
    val bucketed = scored.withColumn("__bkt",
      floor(col("mean_prob") * lit(4096.0)).cast(IntegerType))
    // buckets-sized prefix counts; the tiny window rides an explicit
    // constant single-group partition (pmod, not foldable lit(0)) so
    // the model-build log stays free of WindowExec warnings
    val bases = bucketed.groupBy(col("__bkt"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__base", coalesce(
        sum(col("__cnt")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(pmod(col("__bkt"), lit(1)))
          .orderBy(col("__bkt").desc)
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__base"))
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bkt"))
      .orderBy(col("mean_prob").desc, col("doc_id").asc)
    bucketed.join(broadcast(bases), Seq("__bkt"))
      .withColumn("lm_rank",
        col("__base") + row_number().over(wB).cast(LongType))
      .crossJoin(broadcast(n))
      .filter(col("lm_rank") <=
        ceil(lit(keepFraction) * col("n").cast(DoubleType)).cast(LongType))
      .select("doc_id", "lm_rank", "n_bigrams", "n_hit", "mean_prob")
  }
}
