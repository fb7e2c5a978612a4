package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (ArrayType(FloatType)).
  *
  * Two paths:
  *  - `bruteForceTopK`: exact cosine top-k, query-set × corpus. Correctness
  *    baseline; at scale only sane when the query side is small enough to
  *    broadcast (the corpus streams through one whole-stage-codegen pass —
  *    no shuffle of the corpus at all).
  *  - `lshTopK`: random-hyperplane LSH bucketing (seeds are constants, so
  *    any executor recomputes the planes — no model broadcast). Candidates
  *    = same (band, bucket); then exact cosine + top-k on candidates only.
  *    The scale path: corpus shuffles once on bucket keys instead of
  *    pairing all-vs-all.
  */
object Similarity {

  /** Embedding dimensionality, from one non-null row (tiny driver-side
    * peek; the plans bake the dimension into literal hyperplanes). Empty
    * input → 0 (downstream plans then run over zero rows, harmlessly). */
  private def vectorDim(df: DataFrame, vecCol: String): Int =
    df.filter(col(vecCol).isNotNull).select(size(col(vecCol)))
      .limit(1).collect().headOption.map(_.getInt(0)).getOrElse(0)

  /** Shared LSH banding: explode `df` into one row per (band, bucket),
    * where each band's bucket is `bitsPerBand` hyperplane sign bits (seeds
    * partitioned per band so bands are independent). Single definition so
    * the two candidate-generation paths can never drift apart. */
  private def bandBucketed(df: DataFrame, idAs: String, vecAs: String,
      bands: Int, bitsPerBand: Int, dim: Int): DataFrame = {
    val sigs = array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        (0 until bitsPerBand).map(i =>
          VectorFunctions.hyperplaneSignBit(col(vecAs), b * bitsPerBand + i, dim)
            .cast("long") * lit(1L << i)).reduce(_ + _).as("bucket"))): _*)
    df.withColumn("bb", explode(sigs))
      .select(col(idAs), col(vecAs), col("bb.band"), col("bb.bucket"))
  }

  /** Exact top-k neighbors (cosine) of each query vector. `queries` is
    * broadcast — callers keep it small (it's the per-batch probe set). */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** LSH-bucketed ANN: `bands` independent signatures of `bitsPerBand`
    * hyperplane sign bits each; same-bucket vectors are candidates.
    * Recall grows with bands; cost with bands × bucket collision rate.
    * Defaults are tuned for top-k on unclustered embeddings (measured
    * recall@10 = 0.9 on the 64-dim testdata): top-k needs WIDE nets —
    * moderately-similar true neighbors still have ~0.3-0.5 angular
    * disagreement per hyperplane, so long bucket keys (8+ bits) reject
    * them almost surely (8×8 bits measured recall@10 = 0.1). Near-dup
    * detection (cosine ≥ 0.99) is the opposite regime — long keys are
    * fine and keep candidate counts linear (embeddingNearDupPairs). */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      bands: Int = 16, bitsPerBand: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = vectorDim(corpus, vecCol)
    val qRaw = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val cRaw = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    // candidate generation on ids only: the dedup shuffle carries two longs
    // per row, not embedding vectors; vectors rejoin after (corpus side by
    // id, query side broadcast)
    val q = bandBucketed(qRaw, "query_id", "qv", bands, bitsPerBand, dim)
      .select("query_id", "band", "bucket")
    val c = bandBucketed(cRaw, "neighbor_id", "cv", bands, bitsPerBand, dim)
      .select("neighbor_id", "band", "bucket")
    val candidateIds = c.join(broadcast(q), Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidateIds
      .join(cRaw, Seq("neighbor_id"))
      .join(broadcast(qRaw), Seq("query_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Embedding near-duplicate pairs: LSH candidates + exact cosine ≥
    * threshold. The all-pairs analogue of lshTopK for corpus self-dedup. */
  def embeddingNearDupPairs(
      df: DataFrame, threshold: Double,
      bands: Int = 8, bitsPerBand: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = vectorDim(df, vecCol)
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    // self-join on identical bucketing subplans → Spark's ReusedExchange
    // computes the signature shuffle once; candidate ids only (two longs
    // per row through the pair shuffle/distinct), vectors rejoin after
    val bucketedDf = bandBucketed(base, "id", "v", bands, bitsPerBand, dim)
      .select("id", "band", "bucket")
    val pairIds = bucketedDf.as("a")
      .join(bucketedDf.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    pairIds
      .join(base.select(col("id").as("id_a"), col("v").as("va")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("v").as("vb")), Seq("id_b"))
      .withColumn("cosine", VectorFunctions.cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
