package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, StructField, StructType}

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

  /** Shared LSH banding: explode `df` into one row per (band, bucket),
    * where each band's bucket is `bitsPerBand` hyperplane sign bits (seeds
    * partitioned per band so bands are independent). Single definition so
    * the two candidate-generation paths can never drift apart. Buckets
    * come from the native HyperplaneBuckets kernel — one codegen'd
    * primitive loop per row with on-the-fly plane generation (the earlier
    * literal-plane lambda folds ran interpreted and shipped ~1 MiB of
    * plane literals in every task binary). */
  private def bandBucketed(df: DataFrame, idAs: String, vecAs: String,
      bands: Int, bitsPerBand: Int): DataFrame =
    df.select(col(idAs), col(vecAs),
        graft.expressions.HyperplaneBuckets
          .hyperplaneBuckets(col(vecAs), bands, bitsPerBand).as("bks"))
      .select(col(idAs), col(vecAs),
        posexplode(col("bks")).as(Seq("band", "bucket")))

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

  /** Fraction of the corpus expected to collide with a query in at least
    * one of `bands` buckets of `bitsPerBand` random-hyperplane sign bits,
    * for angularly-uncorrelated vectors (P[bit agrees] = 1/2). The TRUE
    * neighbors collide more often — that's the recall — but this is the
    * cost floor: the exact-rerank workload is ≥ this fraction of brute
    * force, plus bucketing/dedup overhead. Statically computable from the
    * parameters alone. */
  def lshExpectedCandidateFraction(bands: Int, bitsPerBand: Int): Double =
    1.0 - math.pow(1.0 - math.pow(2.0, -bitsPerBand), bands)

  /** LSH-bucketed ANN: `bands` independent signatures of `bitsPerBand`
    * hyperplane sign bits each; same-bucket vectors are candidates.
    * Recall grows with bands; cost with bands × bucket collision rate.
    * Defaults are tuned for top-k on unclustered embeddings (measured
    * recall@10 = 0.9 on the 64-dim testdata): top-k needs WIDE nets —
    * moderately-similar true neighbors still have ~0.3-0.5 angular
    * disagreement per hyperplane, so long bucket keys (8+ bits) reject
    * them almost surely (8×8 bits measured recall@10 = 0.1). Near-dup
    * detection (cosine ≥ 0.99) is the opposite regime — long keys are
    * fine and keep candidate counts linear (embeddingNearDupPairs).
    *
    * Brute-force cutover: when `lshExpectedCandidateFraction` ≥
    * `bruteCutover`, the bucket net rejects almost nothing — the exact
    * rerank already touches most of the corpus and the bucketing/dedup
    * shuffles are pure overhead (measured 4× slower than brute at 16×4
    * bits, fraction 0.64). The operator then runs the exact path: same
    * schema, recall 1.0, one shuffle. Wide-net parameter regimes only
    * make sense on CLUSTERED real-world embeddings where the empirical
    * collision rate is far below the isotropic floor — callers there pass
    * `bruteCutover = 1.0` to force LSH (as the recall gate does, so the
    * gate always measures the genuine LSH net, never the fallback). */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      bands: Int = 16, bitsPerBand: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bruteCutover: Double = 0.5): DataFrame = {
    if (lshExpectedCandidateFraction(bands, bitsPerBand) >= bruteCutover)
      return bruteForceTopK(queries, corpus, k, idCol, vecCol)
    val qRaw = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val cRaw = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    // fused candidate path: the corpus keeps its vector through the
    // broadcast bucket join (queries, WITH their vectors, are the tiny
    // broadcast side — |queries| × bands rows), cosine is computed
    // map-side in the same codegen stage, and the per-(query, neighbor)
    // band-duplicate collapse is one agg shuffle carrying (long, long,
    // double). That is strictly fewer shuffles than the id-only variant
    // (candidates → distinct → rejoin corpus by id → rejoin queries):
    // the corpus is never shuffled by id at all.
    // Probe side repartitioned: the broadcast join otherwise streams at
    // the corpus scan's partition count (1-2 on a small parquet file) and
    // candidate generation serializes — the same measured shape as
    // embeddingNearDupPairs / Dedup's probe-side fixes.
    val nPart = corpus.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    val c = bandBucketed(cRaw.repartition(nPart), "neighbor_id", "cv",
      bands, bitsPerBand)
    val q = bandBucketed(qRaw, "query_id", "qv", bands, bitsPerBand)
      .select(col("query_id"), col("qv"), col("band"), col("bucket"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.join(broadcast(q), Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
      // same pair may collide in several bands; cosine is identical across
      // them, so max() is a deterministic duplicate collapse
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("cosine")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  // ---- IVF (inverted-file) ANN --------------------------------------------

  /** Index of the nearest centroid by L2 (argmin ‖v−c‖² = argmin ‖c‖²−2v·c
    * — the v·v term is constant per row); ties → lower index. Native
    * codegen'd kernel (graft.expressions.NearestCentroid): the built-in
    * array_min-over-struct formulation evaluated nLists interpreted
    * zip_with folds per row and re-embedded the centroid matrix as plan
    * literals in every Lloyd round's job. (A when-chain reduce is worse
    * still — it doubles the expression tree per centroid: 2^nLists nodes,
    * an analyzer OOM by 16 lists.) */
  private def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    graft.expressions.NearestCentroid.nearestCentroid(vec, centroids)

  /** k-means-lite training: deterministic init (the nLists lowest-id
    * vectors), `iters` distributed Lloyd rounds. Each round is one
    * assignment pass + a (list, dimension)-keyed average — the only thing
    * collected is the nLists×dim centroid model (KB-scale at any corpus
    * size). Centroids are rounded to 1e-6 so run-to-run float-sum ordering
    * can't perturb downstream assignments. Empty lists keep their previous
    * centroid. Train on a sampled frame at 100 TB — centroid quality
    * saturates long before the full corpus (pass `corpus.sample(...)`). */
  def trainCentroids(
      corpus: DataFrame, nLists: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Double]] = {
    val v = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    // element type follows the column (float or double — the NearestCentroid
    // kernel accepts both), so match on the runtime value
    var centroids = v.orderBy(col("id")).limit(nLists)
      .select(col("v")).collect()
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
        case n: java.lang.Number => n.doubleValue()
      }.toArray)
    for (_ <- 1 to iters) {
      // the argmin must be staged in its own select: co-selecting a
      // getField-on-CaseWhen with a generator trips ExtractGenerator into
      // re-deriving the struct type with positional field names
      // (FIELD_NOT_FOUND `d` in `col1`,`col2`)
      val assigned = v.select(nearestCentroid(col("v"), centroids).as("cid"), col("v"))
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      val stats = assigned.groupBy(col("cid"), col("pos"))
        .agg(sum(col("x").cast(DoubleType)).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone())
      stats.foreach { r =>
        val (cid, pos) = (r.getInt(0), r.getInt(1))
        next(cid)(pos) = math.rint(r.getDouble(2) / r.getLong(3) * 1e6) / 1e6
      }
      centroids = next
    }
    centroids
  }

  /** Persist a trained centroid model as a parquet table (cid, centroid).
    * The 100 TB workflow: train ONCE on a sample, save, and have every
    * later batch (or streaming microbatch) load the KB-scale model instead
    * of re-running Lloyd collects — the round-4 double-training cost,
    * eliminated across sessions rather than just memoized within one. */
  def saveCentroids(spark: SparkSession, centroids: Array[Array[Double]],
      path: String): Unit =
    centroidTable(spark, centroids).coalesce(1)
      .write.mode("overwrite").parquet(path)

  /** Load a model written by [[saveCentroids]]; cids must be the
    * contiguous 0..n-1 the trainer produced. */
  def loadCentroids(spark: SparkSession, path: String): Array[Array[Double]] = {
    val rows = spark.read.parquet(path).orderBy("cid").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getInt(0) == i, s"centroid table not contiguous at cid ${r.getInt(0)}")
    }
    rows.map(_.getSeq[Double](1).toArray)
  }

  /** Centroids as a broadcastable table (list_id, centroid). */
  private def centroidTable(spark: SparkSession, centroids: Array[Array[Double]]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(centroids.zipWithIndex.map {
        case (c, j) => Row(j, c.toSeq)
      }: _*),
      StructType(Seq(StructField("cid", IntegerType, nullable = false),
        StructField("centroid", ArrayType(DoubleType), nullable = false))))

  /** IVF ANN: k-means-lite lists + nProbe-list search — the second ANN
    * path (hyperplane LSH recall degrades on clustered real embeddings;
    * IVF adapts its partitions to the data).
    *
    * Plan shape: corpus → one assignment pass (literal-centroid argmin,
    * no shuffle) → shuffle on list id; queries × broadcast centroid table
    * → window top-nProbe lists; candidates = probe ⋈ list (the only
    * corpus shuffle), exact-cosine rerank → top-k. Probing nProbe of
    * nLists lists scans ~nProbe/nLists of the corpus per query batch. */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      nLists: Int = 16, nProbe: Int = 4, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfTopK(queries, corpus, k,
      trainCentroids(corpus, nLists, iters, idCol, vecCol),
      nProbe, idCol, vecCol)

  /** Model-taking overload: search pre-trained lists. Training is the only
    * driver-action-bearing part of IVF (2 Spark jobs per Lloyd round), so
    * a pipeline that probes the same corpus repeatedly — or runs a recall
    * gate next to the search itself — trains ONCE via `trainCentroids` and
    * reuses the model here; the search is then a single declarative plan
    * (assignment pass → one shuffle on list id → broadcast-probe rerank). */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      centroids: Array[Array[Double]], nProbe: Int,
      idCol: String, vecCol: String): DataFrame = {
    val nLists = centroids.length
    require(nProbe > 0 && nProbe <= nLists, s"nProbe must be in [1, $nLists]: $nProbe")
    val spark = corpus.sparkSession

    val assigned = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      nearestCentroid(col(vecCol), centroids).as("cid"))
    val qRaw = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probes = probeLists(qRaw, centroids, spark, nProbe)

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    assigned.join(broadcast(probes), Seq("cid"))
      .join(broadcast(qRaw), Seq("query_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Per-query nProbe nearest IVF lists: one in-row top-t kernel pass +
    * explode — ordering and tie rule ((d, cid) ascending) match the
    * assignment argmin's. This used to be queries × broadcast centroid
    * table + per-query window top-nProbe: an O(queries · nLists)
    * intermediate AND a window shuffle, which in the nLists ∝ corpus
    * self-search regime went quadratic (at ScaleBench 50× that cross
    * join was 160M rows through a sort for a 2/800-list probe). The
    * kernel pass is O(queries · √nLists + visited members) via the same
    * exact pruned scan the assignment uses, with zero extra rows and
    * zero shuffle. */
  private def probeLists(qRaw: DataFrame, centroids: Array[Array[Double]],
      spark: SparkSession, nProbe: Int): DataFrame =
    qRaw.select(col("query_id"),
      explode(graft.expressions.NearestCentroid.nearestCentroidsTop(
        col("qv"), centroids, nProbe)).as("cid"))

  /** SemDeDup-style semantic deduplication: assign every embedding to its
    * nearest centroid (k-means lists from [[trainCentroids]] — train on a
    * sample, reuse via save/loadCentroids), generate candidate pairs ONLY
    * within a cluster, and drop any row that has a smaller-id neighbor
    * with cosine ≥ `threshold` (greedy min-id survivor — deterministic,
    * single-pass, no iteration; identical vectors always share a cluster,
    * so exact twins are structurally guaranteed to dedup).
    *
    * Output: one row per input — (idCol, cid, dup_of, is_kept) where
    * `dup_of` is the smallest qualifying neighbor id (null = survivor).
    * Filter `is_kept` for the deduped corpus; keep the frame for
    * provenance. Pipe the pairs into connectedComponents + clusterKeepers
    * instead if quality-based (not min-id) keeper choice is wanted.
    *
    * Scale shape: the assignment pass is a literal-centroid argmin (no
    * shuffle, no model broadcast); the only corpus exchange is ONE
    * repartition on cid, computed once and read by both sides of the
    * self-join (ReusedExchange). Pair generation is quadratic in CLUSTER
    * size, not corpus size — size nLists so clusters stay bounded (the
    * 100 TB knob; SemDeDup's published config is ~100k clusters), and the
    * cosine filter runs inside the same stage, so the quadratic stream is
    * never shuffled or materialized. */
  def semanticDedup(
      df: DataFrame, centroids: Array[Array[Double]], threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold must be in (0, 1]: $threshold")
    val nPart = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val assigned = df
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        nearestCentroid(col(vecCol), centroids).as("cid"))
      .repartition(nPart, col("cid"))
    val dupOf = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cid") === col("b.cid") && col("a.id") < col("b.id"))
      .filter(VectorFunctions.cosine(col("a.v"), col("b.v")) >= threshold)
      .groupBy(col("b.id").as("id"))
      .agg(min(col("a.id")).as("dup_of"))
    assigned.select("id", "cid")
      .join(dupOf, Seq("id"), "left")
      .select(col("id").as(idCol), col("cid"), col("dup_of"),
        col("dup_of").isNull.as("is_kept"))
  }

  /** Product-quantization codebooks: the embedding's `dim` lanes split
    * into `m` contiguous sub-blocks, each with its own `kc`-centroid
    * k-means-lite codebook trained on the corpus's sub-vectors (reusing
    * [[trainCentroids]]'s deterministic trainer per block). Result shape
    * m × kc × (dim/m); KB-scale at any corpus size — train once on a
    * sample and persist, like the IVF model. */
  def trainPqCodebooks(
      corpus: DataFrame, m: Int, kc: Int, iters: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Array[Double]]] = {
    require(m >= 1 && kc >= 2, s"need m >= 1 sub-blocks, kc >= 2 centroids: $m, $kc")
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val sub = dim / m
    (0 until m).toArray.map { b =>
      trainCentroids(
        corpus.select(col(idCol), slice(col(vecCol), b * sub + 1, sub).as(vecCol)),
        kc, iters, idCol, vecCol)
    }
  }

  /** PQ-encode a corpus: each vector becomes `m` small codes (nearest
    * sub-codebook centroid per block — the same codegen'd argmin kernel
    * as IVF assignment). At kc = 16 that is m·log₂16 bits per vector —
    * 16× smaller than float32 lanes for m = dim/8 — the representation
    * the 100 TB similarity tier actually stores and scans. Pure map
    * (no shuffle); output (idCol, codes). */
  def pqEncode(corpus: DataFrame, codebooks: Array[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    corpus.select(col(idCol),
      array((0 until m).map(b =>
        nearestCentroid(slice(col(vecCol), b * sub + 1, sub), codebooks(b))): _*)
        .as("codes"))
  }

  /** PQ reconstruction (decode): concatenate each code's centroid — used
    * by the distortion gate; lossy by design. */
  def pqReconstruct(codes: Column, codebooks: Array[Array[Array[Double]]]): Column =
    flatten(zip_with(
      codes,
      typedLit(codebooks.map(_.map(_.toSeq).toSeq).toSeq),
      (code, book) => element_at(book, code + 1)))

  /** PQ ANN search: asymmetric distance computation + exact rerank. Each
    * query's m×kc table of squared sub-distances to every codebook
    * centroid is computed DISTRIBUTED by the `pq_adc_table` kernel (the
    * codebook model rides along as one codegen reference — no query-side
    * collect anywhere in the plan); the corpus's CODES stream through one
    * codegen'd `pq_adc` lookup loop — the corpus's float vectors are only
    * touched for the `rerankDepth` ADC survivors per query, which the
    * exact-cosine rerank then orders (the IVF-PQ refinement step). Scale
    * shape: the scan reads m-byte-scale codes instead of 4·dim-byte
    * vectors, no corpus shuffle before the rerank join. The broadcast of
    * the query tables is inherent to the flat-ADC regime (every query
    * scans every code), so the probe set must stay broadcast-small;
    * query TABLES beyond that — corpus self-search included — belong on
    * [[ivfPqTopK]], whose cid-keyed join needs no broadcast. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      codebooks: Array[Array[Array[Double]]],
      rerankDepth: Int = 100,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && rerankDepth >= k, s"need rerankDepth >= k >= 1: $rerankDepth, $k")
    val qTables = queries.select(col(idCol).as("query_id"),
      graft.expressions.PqAdcTable.pqAdcTable(col(vecCol), codebooks).as("qtable"))

    val codes = pqEncode(corpus, codebooks, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("codes"))
    val adcW = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    val shortlist = codes.crossJoin(broadcast(qTables))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", graft.expressions.PqAdc.pqAdc(col("codes"), col("qtable")))
      // narrow before the rank sort — same reason as ivfPqTopK's shortlist
      .select(col("query_id"), col("neighbor_id"), col("adc"))
      .withColumn("adc_rank", row_number().over(adcW))
      .filter(col("adc_rank") <= rerankDepth)
      .select("query_id", "neighbor_id")

    val qVec = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    shortlist
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        Seq("neighbor_id"))
      .join(broadcast(qVec), Seq("query_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** IVF-PQ search — the composition production ANN actually runs (the
    * FAISS IVFPQ shape): IVF probing restricts the scan to
    * ~nProbe/nLists of the corpus, PQ codes make the scanned rows
    * m-byte-scale, ADC scores them with one codegen'd lookup loop, and
    * the exact rerank fixes both approximations' ordering errors within
    * the shortlist. Models (centroids + codebooks) are KB-scale,
    * trained once and persisted.
    *
    * Plan: corpus → one pass computing (cid, codes) (two literal-model
    * argmins, no shuffle) → join the (query, cid) probe set → attach each
    * query's ADC table ONCE by query_id (never replicated per probed
    * list) → ADC + per-query top-rerankDepth window → vector rejoin +
    * exact cosine rerank. The corpus's float vectors are touched only for
    * shortlist members.
    *
    * Fully distributed on the query side: probe lists come from the
    * shared window derivation (`probeLists`) and ADC tables from the
    * `pq_adc_table` kernel — no driver collect, no forced broadcast. A
    * small probe set auto-broadcasts (planner stats / AQE); a TABLE-scale
    * query set — all-corpus self-search — shuffles on cid/query_id, the
    * only shape that scales there. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      nProbe: Int, rerankDepth: Int = 100,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val nLists = centroids.length
    require(nProbe > 0 && nProbe <= nLists, s"nProbe must be in [1, $nLists]: $nProbe")
    require(k >= 1 && rerankDepth >= k, s"need rerankDepth >= k >= 1: $rerankDepth, $k")
    val m = codebooks.length
    val sub0 = codebooks(0)(0).length
    val spark = corpus.sparkSession

    val qRaw = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probes = probeLists(qRaw, centroids, spark, nProbe)
    val qTables = queries.select(col(idCol).as("query_id"),
      graft.expressions.PqAdcTable.pqAdcTable(col(vecCol), codebooks).as("qtable"))

    // keyless repartition decouples candidate generation from the SCAN's
    // split count (the simhashNearDupPairs lesson): under a broadcast
    // probe join the streamed side inherits the scan's partitioning, and
    // a single-row-group parquet file = 1 split = the whole
    // O(corpus · nProbe/nLists · corpus) candidate stream generated on
    // one core (measured 3× on the sf0.1 self-join). The shuffled rows
    // are narrow (id, cid, m code bytes) — a sliver of the candidate
    // stream they parallelize — and when the probe side is big enough to
    // go sort-merge the planner re-keys this exchange anyway.
    val coded = corpus.select(col(idCol).as("neighbor_id"),
      nearestCentroid(col(vecCol), centroids).as("cid"),
      array((0 until m).map(b =>
        nearestCentroid(slice(col(vecCol), b * sub0 + 1, sub0), codebooks(b))): _*)
        .as("codes"))
      .repartition(corpus.sparkSession.conf
        .get("spark.sql.shuffle.partitions", "200").toInt)

    // bounded PER-GROUP top-k instead of a rank window: the window
    // formulation shuffled + sorted the ENTIRE candidate stream on
    // query_id (measured 2.6-2.8 GB of sort spill at ScaleBench 50× —
    // the op's last super-linear term); the native aggregate reduces
    // each partition to ≤ rerankDepth pairs per query BEFORE the
    // exchange (map-side partial, TakeOrderedAndProject's trick per
    // group), with the identical total order (adc asc, neighbor asc) —
    // bit-identical shortlist, TopKPairsSpec proves it. The narrow
    // projection before the agg is still load-bearing: the m·kc ADC
    // table (KBs/row) must not ride into the aggregation buffers.
    val shortlist = coded.join(probes, Seq("cid"))
      .join(qTables, Seq("query_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", graft.expressions.PqAdc.pqAdc(col("codes"), col("qtable")))
      .select(col("query_id"), col("neighbor_id"), col("adc"))
      .groupBy(col("query_id"))
      .agg(graft.expressions.TopKPairs.topKPairs(
        col("adc"), col("neighbor_id"), rerankDepth, smallest = true).as("short"))
      .select(col("query_id"),
        explode(col("short").getField("id")).as("neighbor_id"))

    // NO forced broadcast on the query-vector rejoin: in the self-search
    // shape the query table IS the corpus, and a broadcast hint here ships
    // every query vector to every task (measured at ScaleBench 50× as a
    // straggler + spill source). AQE still broadcasts genuinely small
    // probe sets at runtime; table-scale query sets ride the query_id
    // shuffle the shortlist already carries.
    val qVec = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    shortlist
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        Seq("neighbor_id"))
      .join(qVec, Seq("query_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
      // same bounded-aggregate swap as the shortlist: (cosine desc,
      // neighbor asc) total order, k per query, rank from the emitted
      // best-first position — row_number()-identical output
      .groupBy(col("query_id"))
      .agg(graft.expressions.TopKPairs.topKPairs(
        col("cosine"), col("neighbor_id"), k, smallest = false).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("t.id").as("neighbor_id"), col("t.score").as("cosine"))
  }

  /** Embedding near-duplicate pairs: LSH candidates + exact cosine ≥
    * threshold. The all-pairs analogue of lshTopK for corpus self-dedup.
    *
    * `maxBucketSize` is the hot-bucket guard, the embedding face of
    * `Dedup.minhashNearDupPairs`'s cap: a corpus with many identical or
    * near-identical vectors (exact-dup documents re-embedded, zero
    * vectors, template pages) piles them into the same sign-sketch
    * bucket in EVERY band, and that bucket's self-join is quadratic.
    * Over-cap buckets are dropped from pair generation; mega-clusters of
    * exact duplicates belong to exact dedup (hash the vector bytes), not
    * LSH pairing. */
  def embeddingNearDupPairs(
      df: DataFrame, threshold: Double,
      bands: Int = 8, bitsPerBand: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucketSize: Int = 1000): DataFrame = {
    require(maxBucketSize > 1, s"maxBucketSize must exceed 1: $maxBucketSize")
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    // self-join on identical bucketing subplans → Spark's ReusedExchange
    // computes the signature shuffle once; candidate ids only (two longs
    // per row through the pair shuffle/distinct), vectors rejoin after
    val bucketedDf = bandBucketed(base, "id", "v", bands, bitsPerBand)
      .select("id", "band", "bucket")
    val hotBuckets = bucketedDf.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucketSize)
      .select("band", "bucket")
    val keptBuckets = bucketedDf.join(hotBuckets, Seq("band", "bucket"), "left_anti")
    // probe side repartitioned: a broadcast self-join otherwise streams at
    // the scan's partition count (1-2 on a small parquet file) and the
    // per-bucket quadratic pair generation serializes (Dedup has the
    // measured numbers for the same shape)
    val nPart = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val pairIds = keptBuckets.repartition(nPart).as("a")
      .join(keptBuckets.as("b"),
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
