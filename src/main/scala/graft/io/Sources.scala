package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.schema.Schemas

/** Readers for every input format the engine supports (SURVEY.md §2.1).
  *
  * All readers take an explicit schema — no inference pass, so a scan of a
  * 249 GB GVF build (reference readme.rst:224-227) touches the data exactly
  * once. Glob patterns and directories work directly (S7): one call reads a
  * whole per-chromosome directory as a single distributed dataset, with
  * `input_file_name()` available if per-file identity matters downstream.
  *
  * Partition granularity at scale is governed by
  * `spark.sql.files.maxPartitionBytes` (the analogue of the reference's
  * blocksize='150MB', eggv/process.py:60) — set once on the session, not
  * per-read. Gzipped inputs are read natively, so the reference's separate
  * gunzip step (eggv/retrieve.py:49-75) disappears.
  */
object Sources {

  /** GVF scan (S1). Headerless TSV, '#' comment lines skipped, 9 declared
    * columns. reference: eggv/process.py:25-61. */
  def readGvf(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(Schemas.gvf)
      .option("sep", "\t")
      .option("comment", "#")
      .csv(path)

  /** GTF scan (S2). Same shape, feature/frame instead of type/phase; the
    * '#' comment option also covers GTF's '#!' headers.
    * reference: eggv/process.py:64-97. */
  def readGtf(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(Schemas.gtf)
      .option("sep", "\t")
      .option("comment", "#")
      .csv(path)

  /** Processed-variant-effects scan (S3). Headered TSV, transcript forced
    * string; missing transcripts were written as the empty string, other
    * nulls as "NA" — the reader reverses both conventions. Spark's CSV
    * reader yields null for an unquoted empty field, so transcript is
    * coalesced back to "" — a lossless round trip of the in-memory
    * representation (the reference re-reads "" as NaN, conflating the two;
    * eggv/annotate.py:23-37).
    */
  def readProcessedVariants(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(Schemas.variantEffects)
      .option("sep", "\t")
      .option("header", "true")
      .option("comment", "#")
      .option("nullValue", "NA")
      .option("emptyValue", "")
      .csv(path)
      .na.fill("", Seq("transcript"))

  /** Processed-genes scan (S4). reference: eggv/annotate.py:40-52. */
  def readProcessedGenes(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(Schemas.processedGenes)
      .option("sep", "\t")
      .option("header", "true")
      .option("comment", "#")
      .option("nullValue", "NA")
      .option("emptyValue", "")
      .csv(path)

  /** Variant-metadata scan (same writer conventions as S3). */
  def readVariantMetadata(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(Schemas.variantMetadata)
      .option("sep", "\t")
      .option("header", "true")
      .option("comment", "#")
      .option("nullValue", "NA")
      .option("emptyValue", "")
      .csv(path)

  /** JSONL corpus scan — the de-facto LLM training-data interchange
    * format: one JSON document object per line, gzipped or plain, globs
    * and directories welcome. Explicit schema (default
    * `Schemas.jsonlDocument`) so the scan never runs Spark's two-pass
    * inference over a 100 TB corpus; PERMISSIVE mode null-fills rows whose
    * JSON is broken instead of failing the scan (`_corrupt_record` is
    * deliberately NOT declared — a dirty line becomes an all-null row the
    * pipeline's quality filters drop, the same contract as the GVF
    * malformed-row handling). */
  def readJsonl(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType = Schemas.jsonlDocument): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)

  /** Streaming JSONL scan: new corpus shards landing in `dir` flow through
    * the same document pipeline as the batch reader. */
  def readJsonlStream(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType = Schemas.jsonlDocument): DataFrame =
    spark.readStream
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .json(dir)

  /** A driver testdata parquet table (TESTDATA.md): `name` in
    * region/nation/customer/supplier/part/orders/lineitem/events/
    * documents/embeddings, `sfDir` like /root/testdata/sf0.01. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  // ---- streaming variants --------------------------------------------------
  // Same schema/options as the batch readers over a file-source stream
  // (`path` is a directory watched for new files — the continuous-ingest
  // shape of the reference's per-chromosome arrival loop,
  // eggv/pipeline.py:178-205, where files are processed as they land).
  // The downstream operator graph is identical to batch; only source and
  // sink differ (StreamingOps doc).

  /** Streaming GVF scan: every new GVF file landing in `dir` flows through
    * the same processing chain as the batch S1 reader. */
  def readGvfStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(Schemas.gvf)
      .option("sep", "\t")
      .option("comment", "#")
      .csv(dir)

  /** Streaming GTF scan (S2's stream twin). */
  def readGtfStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(Schemas.gtf)
      .option("sep", "\t")
      .option("comment", "#")
      .csv(dir)

  /** Streaming processed-variant-effects scan (S3's stream twin, same
    * NA/"" reversal). */
  def readProcessedVariantsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(Schemas.variantEffects)
      .option("sep", "\t")
      .option("header", "true")
      .option("comment", "#")
      .option("nullValue", "NA")
      .option("emptyValue", "")
      .csv(dir)
      .na.fill("", Seq("transcript"))
}
