package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.apache.spark.storage.StorageLevel

/** Sequence packing for LLM training data: the concat-then-chunk manifest.
  *
  * Documents, taken in id order, are conceptually concatenated into one
  * token stream and sliced into fixed-size context windows ("packs"). The
  * manifest maps each document to its global token offset and the pack
  * range it lands in — the downstream writer can then materialize any pack
  * by pulling exactly the documents whose [pack_start, pack_end] covers it.
  *
  * The global offset is a prefix sum over a 100 TB-wide total order, which
  * does NOT need a single-partition window: partitions are range-ordered
  * by id, each partition's token total is a single long, so the driver
  * collects one long per partition (KB-scale at any corpus size), computes
  * cumulative bases, and broadcasts them back; each partition then streams
  * its rows once adding its base. Two jobs, no wide shuffle beyond the
  * range partitioning itself.
  *
  * The sorted frame is persisted for the operator's two passes: both the
  * per-partition totals job and the offset job must see the SAME physical
  * partitioning (range boundaries come from sampling, so an unpersisted
  * re-execution could legally re-draw them and the collected bases would
  * describe partitions that no longer exist).
  */
object Packing {

  /** Manifest columns: (doc_id, n_tokens, start_offset, pack_start,
    * pack_end). Documents with no tokens are excluded (they occupy no
    * window). `pack_end` is inclusive: the pack holding the document's
    * last token. */
  def packManifest(docs: DataFrame, ctxTokens: Long,
      idCol: String = "doc_id", nTokensCol: String = "n_tokens"): DataFrame = {
    require(ctxTokens > 0, s"ctxTokens must be positive: $ctxTokens")
    val spark = docs.sparkSession
    import spark.implicits._

    val sorted = docs
      .select(col(idCol).cast(LongType).as("doc_id"),
        col(nTokensCol).cast(LongType).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // pass 1: one (partition, token-total) pair per partition — tiny
    val partSums = sorted
      .select(spark_partition_id().as("pid"), col("n_tokens"))
      .groupBy("pid").agg(sum("n_tokens").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nParts = if (partSums.isEmpty) 0 else partSums.keys.max + 1
    val bases = new Array[Long](nParts + 1)
    for (p <- 0 until nParts) bases(p + 1) = bases(p) + partSums.getOrElse(p, 0L)
    val baseB = spark.sparkContext.broadcast(bases)

    // pass 2: in-partition running sum seeded with the partition's base
    val ctx = ctxTokens
    sorted.as[(Long, Long)].mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var off = baseB.value(pid)
      it.map { case (id, n) =>
        val start = off
        off += n
        (id, n, start, start / ctx, (start + n - 1) / ctx)
      }
    }.toDF("doc_id", "n_tokens", "start_offset", "pack_start", "pack_end")
  }

  /** Per-document sliding-window chunking — the OTHER way long documents
    * become training samples (packing concatenates short docs; chunking
    * splits long ones, with `strideTokens` of overlap so no span is only
    * ever seen cut in half at a window boundary).
    *
    * Window starts are 0, stride, 2·stride, … while start < n_tokens, so
    * every token is covered and (when stride < chunkTokens) consecutive
    * chunks overlap by chunkTokens − stride; tail windows run short rather
    * than duplicating the previous chunk's end. Empty documents emit no
    * chunks. Output: (doc_id, chunk_id, chunk_start, n_chunk_tokens,
    * chunk_text) — chunk_start is the 1-based token position.
    *
    * Scale shape: this is a NARROW operator — tokenize, explode the window
    * starts, slice — no shuffle at any corpus size; it pipelines inside
    * the scan's whole-stage codegen and parallelism is the scan's. The
    * explode's fan-out is n_tokens/stride rows per doc, each carrying only
    * its own slice. */
  def chunkByTokens(docs: DataFrame, chunkTokens: Int, strideTokens: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(strideTokens > 0, s"strideTokens must be positive: $strideTokens")
    require(strideTokens <= chunkTokens,
      s"strideTokens ($strideTokens) > chunkTokens ($chunkTokens) would skip " +
        "tokens between windows, breaking the every-token-covered contract")
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.TextFunctions.tokens(col(textCol)).as("tk"))
      .withColumn("n", size(col("tk")))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("tk"),
        explode(sequence(lit(0), col("n") - 1, lit(strideTokens))).as("s"),
        col("n"))
      .select(col("doc_id"),
        (col("s") / strideTokens).cast(LongType).as("chunk_id"),
        (col("s") + 1).cast(LongType).as("chunk_start"),
        least(lit(chunkTokens), col("n") - col("s")).cast(LongType)
          .as("n_chunk_tokens"),
        array_join(slice(col("tk"), col("s") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

  /** Content-defined chunking — boundaries from the TEXT, not the ruler.
    * Fixed-stride windows ([[chunkByTokens]]) shift EVERY boundary when a
    * prefix edit inserts or drops a token, so chunk-level dedup between
    * two near-identical long documents finds nothing past the edit.
    * Here boundaries come from a FastCDC-style gear hash over the token
    * stream (`TextKernels.cdcBoundariesKernel`, Xia et al. 2016): after
    * an edit the boundary stream resynchronizes, and the shared suffix
    * chunks hash-match again — feed `chunk_text` through
    * [[graft.operators.Dedup.exactDupGroups]] for sub-document dedup
    * that survives edits.
    *
    * Output: (doc_id, chunk_id, chunk_start 1-based, n_chunk_tokens,
    * chunk_text) — the [[chunkByTokens]] schema. Chunk lengths land in
    * [minTokens, maxTokens] with mean ~avgTokens (the final chunk of a
    * doc may run short). Empty documents emit no chunks.
    *
    * Scale shape: same as the stride chunker — one narrow codegen'd
    * pass (token hashes → in-row boundary kernel → explode → slice), no
    * shuffle at any corpus size, parallelism is the scan's. */
  def chunkByContent(docs: DataFrame,
      avgTokens: Int = 64, minTokens: Int = 16, maxTokens: Int = 256,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(0 < minTokens && minTokens <= avgTokens && avgTokens <= maxTokens,
      s"need 0 < min <= avg <= max, got $minTokens/$avgTokens/$maxTokens")
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.TextFunctions.tokens(col(textCol)).as("tk"),
        graft.expressions.NativeText.cdcBoundaries(
          graft.functions.TextFunctions.tokenHashes(col(textCol)),
          avgTokens, minTokens, maxTokens).as("ends"))
      .select(col("doc_id"), col("tk"),
        posexplode(col("ends")).as(Seq("chunk_id", "end")),
        col("ends"))
      .select(col("doc_id"),
        col("chunk_id").cast(LongType),
        (when(col("chunk_id") === 0, lit(0))
          .otherwise(element_at(col("ends"), col("chunk_id"))) + 1)
          .cast(LongType).as("chunk_start"),
        col("end"), col("tk"))
      .select(col("doc_id"), col("chunk_id"), col("chunk_start"),
        (col("end") + 1 - col("chunk_start")).cast(LongType).as("n_chunk_tokens"),
        array_join(
          slice(col("tk"), col("chunk_start").cast(IntegerType),
            (col("end") + 1 - col("chunk_start")).cast(IntegerType)),
          " ").as("chunk_text"))
  }

  /** Materialize the packing: one row per (pack, document segment), with
    * the exact token slice that pack receives. A document spanning k packs
    * explodes into k segments whose slice bounds are pure integer
    * arithmetic off the manifest — so the expensive part (the token
    * arrays) is touched in ONE narrow pass after one hash join against the
    * manifest; a pack's segments are reassembled downstream by
    * (pack_id, offset_in_pack).
    *
    * `docs` must carry `idCol` and a token-array column `tokensCol`.
    * Output: pack_id, doc_id, offset_in_pack, seg_tokens, n_seg_tokens. */
  def packSegments(docs: DataFrame, ctxTokens: Long,
      idCol: String = "doc_id", tokensCol: String = "tokens"): DataFrame = {
    val withN = docs
      .select(col(idCol).cast(LongType).as("doc_id"), col(tokensCol).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast(LongType))
    val manifest = packManifest(withN.select("doc_id", "n_tokens"), ctxTokens)
    val ctx = lit(ctxTokens)
    manifest
      .join(withN.select(col("doc_id"), col("toks")), Seq("doc_id"))
      .withColumn("pack_id", explode(sequence(col("pack_start"), col("pack_end"))))
      // global token interval of this (doc ∩ pack): [gs, ge)
      .withColumn("gs", greatest(col("pack_id") * ctx, col("start_offset")))
      .withColumn("ge", least((col("pack_id") + 1) * ctx,
        col("start_offset") + col("n_tokens")))
      .select(col("pack_id"), col("doc_id"),
        (col("gs") - col("pack_id") * ctx).as("offset_in_pack"),
        slice(col("toks"),
          (col("gs") - col("start_offset") + 1).cast(IntegerType),
          (col("ge") - col("gs")).cast(IntegerType)).as("seg_tokens"),
        (col("ge") - col("gs")).as("n_seg_tokens"))
  }
}
