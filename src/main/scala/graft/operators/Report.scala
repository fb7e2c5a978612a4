package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.functions.TextFunctions

/** Dataset cards — the summary artifact every released training corpus
  * ships with (composition tables in the Pile/Gopher/RefinedWeb papers:
  * docs, tokens, length distribution per source and language). One
  * operator, one pass: Spark's `rollup` plans all aggregation levels
  * (global, per-dim1, per-(dim1,dim2), …) through a single Expand +
  * partial-aggregated shuffle — no per-level scans, no unions, and the
  * whole thing is ANSI GROUPING SETS, so the card is reproducible in any
  * warehouse verbatim (the DuckDB oracle runs the literal equivalent).
  *
  * Determinism contract: every statistic is either an integer aggregate
  * (exact, order-independent) or a final-step division of such
  * aggregates cast to double — never a floating SUM, whose value depends
  * on partition merge order (the q_stats_moments DECIMAL recipe).
  *
  * Scale shape: map-side partial aggregation compresses each task to
  * one row per grouping-set key before the shuffle; with `dims` of
  * cardinality d₁, d₂ the shuffled row count is ≤ tasks · (1 + d₁ +
  * d₁d₂) — KB-scale per task whatever the corpus size. `grouping_id`
  * disambiguates a real null dimension value from a rollup subtotal
  * row. Token counts ride the codegen'd [[TextFunctions.tokenCount]]
  * kernel on the scan side.
  */
object Report {

  /** Per-rollup-level corpus statistics over `dims` (most-significant
    * dimension first — `rollup` semantics). Output: the dims,
    * `gid` (grouping_id), `n_docs`, `n_tokens`, `n_chars`,
    * `min_tokens`/`max_tokens`, `mean_tokens`, `mean_chars`. */
  def datasetCard(docs: DataFrame, dims: Seq[String],
      textCol: String = "text"): DataFrame = {
    require(dims.nonEmpty, "datasetCard needs at least one dimension")
    val perDoc = docs.select(
      dims.map(col) :+
        TextFunctions.tokenCount(col(textCol)).as("tc") :+
        length(col(textCol)).cast("long").as("cc"): _*)
    perDoc
      .rollup(dims.map(col): _*)
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_docs"),
        sum(col("tc")).as("n_tokens"),
        sum(col("cc")).as("n_chars"),
        min(col("tc")).as("min_tokens"),
        max(col("tc")).as("max_tokens"))
      .select(
        dims.map(col) ++ Seq(
          col("gid"), col("n_docs"), col("n_tokens"), col("n_chars"),
          col("min_tokens"), col("max_tokens"),
          (col("n_tokens").cast(DoubleType) / col("n_docs")).as("mean_tokens"),
          (col("n_chars").cast(DoubleType) / col("n_docs")).as("mean_chars")): _*)
  }

  /** The mixture view of a card: each non-subtotal group's share of the
    * corpus in documents and in tokens — the "composition table"
    * percentage columns, computed from one [[datasetCard]] pass plus a
    * single-row broadcast of the global totals (no second corpus scan).
    * Output: dims, n_docs, n_tokens, `doc_share`, `token_share`,
    * sorted by descending token share. The card frame is persisted for
    * its two consumers (totals + leaves); callers running many corpora
    * per session should `spark.catalog.clearCache()` between batches
    * (the jaccardPairs cache contract — Bench does). */
  def corpusComposition(docs: DataFrame, dims: Seq[String],
      textCol: String = "text"): DataFrame = {
    val card = datasetCard(docs, dims, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val leafGid = 0 // all dims grouped
    val globalGid = (1 << dims.length) - 1
    val totals = card.filter(col("gid") === globalGid)
      .select(col("n_docs").as("tot_docs"), col("n_tokens").as("tot_tokens"))
    val out = card.filter(col("gid") === leafGid)
      .join(broadcast(totals))
      .select(
        dims.map(col) ++ Seq(
          col("n_docs"), col("n_tokens"),
          (col("n_docs").cast(DoubleType) / col("tot_docs")).as("doc_share"),
          (col("n_tokens").cast(DoubleType) / col("tot_tokens")).as("token_share")): _*)
      .orderBy(col("token_share").desc, col(dims.head))
    out
  }
}
