package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.{TextFunctions => TF}

/** Keyword relevance search: BM25 top-k documents for a bag-of-terms
  * query — the lexical counterpart of the vector ANN in [[Similarity]].
  *
  * Scale shape (the reason this is NOT the textbook inverted-index join):
  * for a query of m terms, per-document term frequencies are m counted
  * array scans inside one narrow codegen'd pass — no explode, no
  * (doc, term) shuffle. The only aggregations are one single-row corpus
  * stats frame (doc count, total token count, per-term doc frequencies —
  * KBs at any corpus size, broadcast back) and the final
  * TakeOrderedAndProject top-k. At 100 TB that is one cheap full scan +
  * one top-k, versus an inverted index whose posting lists for common
  * terms are themselves TB-scale shuffles. (A standing index only wins
  * when the query stream is large; this operator is the right shape for
  * ad-hoc corpus probes.)
  *
  * Scoring: BM25 with the rational (un-logged) idf
  * `(N - df + 0.5) / (df + 0.5)` — order-equivalent per term to the
  * classic log form (both decrease monotonically in df), but free of
  * `ln`, whose last-ulp differences across math libraries break
  * cross-engine bit-parity (same reason q_tfidf_terms ranks by tf/(df+1)).
  * The per-term contributions are summed in fixed query-term order, and
  * the corpus's average doc length is computed as an exact integer token
  * sum divided once — so the whole score is a fixed IEEE expression tree
  * the DuckDB oracle replays bit-for-bit.
  */
object Search {

  /** Top-`k` documents by BM25 for `queryTerms` (distinct, non-empty).
    * Output: (doc_id, bm25), score-descending with doc-id tie-break;
    * zero-overlap documents are excluded. */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct == queryTerms, s"queryTerms must be distinct: $queryTerms")
    require(k > 0, s"k must be positive: $k")
    val terms = queryTerms.indices
    val withTf = terms.foldLeft(
        docs.select(col(idCol).as("doc_id"), TF.tokens(col(textCol)).as("toks"))
          .withColumn("dl", size(col("toks")).cast(DoubleType))) {
      (df, i) => df.withColumn(s"tf$i",
        size(filter(col("toks"), _ === lit(queryTerms(i)))).cast(DoubleType))
    }.drop("toks")
    // one single-row corpus frame: N, exact-integer avg doc length, df per
    // term — KB-scale however big the corpus, broadcast to the scorer
    val statCols =
      (sum(col("dl").cast(LongType)).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("avdl") +:
      terms.map(i => sum(when(col(s"tf$i") > 0, 1L).otherwise(0L))
        .cast(DoubleType).as(s"df$i"))
    val stats = withTf.agg(count(lit(1)).cast(DoubleType).as("n_docs"), statCols: _*)
    val score = terms.map { i =>
      when(col(s"tf$i") > 0,
        ((col("n_docs") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5))) *
          (col(s"tf$i") * lit(k1 + 1)) /
          (col(s"tf$i") + lit(k1) * (lit(1 - b) + lit(b) * (col("dl") / col("avdl")))))
        .otherwise(lit(0.0))
    }.reduce(_ + _) // fixed left-assoc fold = deterministic IEEE sum order
    withTf.crossJoin(broadcast(stats))
      .select(col("doc_id"), score.as("bm25"))
      .filter(col("bm25") > 0)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** Batch BM25: score a TABLE of queries — (query_id, term) rows —
    * against the corpus in one pass. This is the posting-list shape for
    * large query streams, where [[bm25TopK]]'s scan-side tf would rescan
    * the corpus once per query: here the corpus explodes to (doc, term)
    * tf rows ONCE, pruned to the query vocabulary BEFORE the count
    * shuffle (broadcast semi-join — the explode stream that reaches the
    * exchange is queries' terms only, not the corpus vocabulary), then
    * one aggregation per (query, doc) and a per-query top-k window.
    *
    * Same rational-idf scoring as [[bm25TopK]]; the per-(query, doc) sum
    * is a shuffle aggregation rather than a fixed-order fold, so scores
    * can differ from the scan-side operator in the last ulp —
    * q_check_bm25_batch gates rank-list + 1e-9 score agreement.
    *
    * The tokenized corpus is persisted: it feeds both the single-row stats
    * agg and the exploded tf stream, which are otherwise separate scans —
    * without the cache boundary the tokenizer (the dominant cost) runs
    * twice over the corpus. Same pattern as Dedup.minhashNearDupPairs.
    * Output: (query_id, doc_id, bm25, rank), rank ≤ k per query. */
  def bm25TopKBatch(docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text",
      queryIdCol: String = "query_id", termCol: String = "term"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val toks = docs
      .select(col(idCol).as("doc_id"), TF.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast(DoubleType))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = toks.agg(
      count(lit(1)).cast(DoubleType).as("n_docs"),
      (sum(col("dl").cast(LongType)).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("avdl"))
    val q = queries
      .select(col(queryIdCol).as("query_id"), col(termCol).as("term")).distinct()
    val tf = toks
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .join(broadcast(q.select("term").distinct()), Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast(DoubleType).as("tf"))
    val docFreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast(DoubleType).as("df"))
    val contributions = tf
      .join(broadcast(docFreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .join(broadcast(q), Seq("term"))
      .select(col("query_id"), col("doc_id"),
        (((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * (col("dl") / col("avdl")))))
          .as("s"))
    val perDoc = contributions
      .groupBy(col("query_id"), col("doc_id")).agg(sum(col("s")).as("bm25"))
    val topk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("bm25").desc, col("doc_id"))
    perDoc.withColumn("rank", row_number().over(topk)).filter(col("rank") <= k)
  }
}
