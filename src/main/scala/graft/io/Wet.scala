package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** WARC/WET reader and writer — the Common Crawl ingestion format, the
  * canonical entry point of a web-scale training-data pipeline (the
  * corpus the reference's curation ops are downstream of arrives as
  * `.wet.gz` segments; ISO 28500 is the public spec).
  *
  * Scale shape: records are split with the text source's custom record
  * delimiter (`lineSep = "WARC/1.0\r\n"`), which Hadoop's LineReader
  * handles ACROSS file-split boundaries — an uncompressed WET file is
  * read split-parallel (governed by `spark.sql.files.maxPartitionBytes`
  * like every other scan), not one-task-per-file the way whole-file WARC
  * readers degrade. Gzipped segments are read natively but are
  * non-splittable, so `.wet.gz` parallelism is per-segment — exactly
  * right for Common Crawl's ~1 GB segment sizing. All header parsing is
  * native codegen'd expressions (regexp over the header block); no UDFs,
  * no driver-side work.
  *
  * Framing honesty: delimiter splitting is the distributed approximation
  * of sequential Content-Length framing. A payload that itself contains
  * a line starting `WARC/1.0` mis-splits — both fragments then FAIL the
  * `framing_ok` check (parsed byte length vs the declared
  * Content-Length), so corruption is flagged per-record, never silent.
  * Records whose payload genuinely ends in CRLF also flag (the trailing
  * record separator is indistinguishable from payload bytes without
  * sequential framing) — filter on `framing_ok` to keep exactly the
  * records a sequential reader would have produced byte-identically.
  */
object Wet {

  /** The record delimiter: every WARC record begins with this version
    * line (WARC/1.0 spec §4; Common Crawl emits 1.0). */
  private val Delim = "WARC/1.0\r\n"

  /** Header value on its own line (null when absent). WARC header names
    * are case-insensitive per spec. */
  private def h(headers: Column, name: String): Column = {
    val v = regexp_extract(headers, "(?mi)^" + name + ": ([^\\r\\n]*)", 1)
    when(v === "", lit(null)).otherwise(v)
  }

  /** Read a WET file / directory / glob (plain or `.gz`) as one record
    * per row: (warc_type, target_uri, warc_date, record_id, content_type,
    * content_length, payload, n_bytes, framing_ok). The `warcinfo`
    * file-header record surfaces as a row with `warc_type = 'warcinfo'` —
    * filter `warc_type = 'conversion'` for the text payloads. */
  def readWet(spark: SparkSession, path: String): DataFrame =
    parseWetRecords(
      spark.read.option("lineSep", Delim).text(path))

  /** Streaming [[readWet]]: new WET segments landing in `dir` parse
    * through the identical expression tree — crawl output flows straight
    * into `CorpusPipeline.curateStream` / the incremental-dedup sinks.
    * Per-segment parallelism (each microbatch's files are its splits);
    * same framing semantics as batch. */
  def readWetStream(spark: SparkSession, dir: String): DataFrame =
    parseWetRecords(
      spark.readStream.option("lineSep", Delim).text(dir))

  /** The shared parse: delimiter-split raw text rows (one per record)
    * to typed records. Works unchanged over batch and streaming scans —
    * it is a pure per-row expression tree. */
  def parseWetRecords(raw0: DataFrame): DataFrame = {
    val raw = raw0
      .filter(length(col("value")) > 0) // the split before each file's first record
    val headers = substring_index(col("value"), "\r\n\r\n", 1)
    // payload = after the first blank line, with the trailing record
    // separator CRLFs stripped (see framing note above)
    val bodyStart = length(headers) + lit(5)
    val body = when(col("value").contains("\r\n\r\n"),
        col("value").substr(bodyStart, length(col("value")) - bodyStart + lit(1)))
      .otherwise(lit(""))
    val payload = regexp_replace(body, "(\\r\\n)+$", "")
    // digits-only capture: a malformed Content-Length parses as null
    // instead of an ANSI cast error
    val lenStr = regexp_extract(headers, "(?mi)^Content-Length: (\\d+)", 1)
    val contentLength =
      when(lenStr === "", lit(null)).otherwise(lenStr).cast(LongType)
    val nBytes = octet_length(payload).cast(LongType)
    raw.select(
      h(headers, "WARC-Type").as("warc_type"),
      h(headers, "WARC-Target-URI").as("target_uri"),
      h(headers, "WARC-Date").as("warc_date"),
      h(headers, "WARC-Record-ID").as("record_id"),
      h(headers, "Content-Type").as("content_type"),
      contentLength.as("content_length"),
      payload.as("payload"),
      nBytes.as("n_bytes"),
      (contentLength.isNotNull && nBytes === contentLength).as("framing_ok"))
  }

  /** Curate-ready documents from parsed WET records — the jsonlDocument
    * shape (doc_id, url, lang, text) the corpus pipeline ingests, so
    * `toDocuments(readWet(...))` feeds `CorpusPipeline.curate` directly
    * (the CLI's `corpus --wet`). Only framing-clean `conversion` records
    * pass. `doc_id` is the 64-bit hash of the target URI — deterministic
    * across re-ingest, but at billions of documents birthday collisions
    * exist; keep `url` when exact identity matters. `lang` is the n-gram
    * language-ID computed at ingest (the CCNet placement: one pass,
    * before any grouping wants it). */
  def toDocuments(records: DataFrame): DataFrame =
    records
      .filter(col("warc_type") === "conversion" && col("framing_ok"))
      .select(
        xxhash64(col("target_uri")).as("doc_id"),
        col("target_uri").as("url"),
        graft.functions.TextFunctions.langId(col("payload")).as("lang"),
        col("payload").as("text"))

  /** Serialize (id, text) rows to WET `conversion` records — one string
    * per record, ready for [[writeWet]]. Content-Length is the payload's
    * UTF-8 byte count, per spec. */
  def toWetRecords(docs: DataFrame, uriPrefix: String,
      idCol: String = "doc_id", textCol: String = "text",
      warcDate: String = "2026-01-01T00:00:00Z"): DataFrame =
    docs.select(concat(
      lit(Delim),
      lit("WARC-Type: conversion\r\n"),
      lit("WARC-Target-URI: " + uriPrefix), col(idCol).cast("string"), lit("\r\n"),
      lit("WARC-Date: " + warcDate + "\r\n"),
      lit("WARC-Record-ID: urn:graft:"), col(idCol).cast("string"), lit("\r\n"),
      lit("Content-Type: text/plain\r\n"),
      lit("Content-Length: "), octet_length(col(textCol)).cast("string"),
      lit("\r\n\r\n"),
      col(textCol), lit("\r\n")).as("value"))

  /** Write [[toWetRecords]] rows as WET text files. Each record already
    * carries its version line and trailing CRLF; the writer's `\r\n` line
    * separator completes the spec's two-CRLF record separator, and
    * part-file boundaries are record boundaries, so a directory of parts
    * concatenates to one valid WET stream. */
  def writeWet(records: DataFrame, path: String): Unit =
    records.write.option("lineSep", "\r\n").mode("overwrite").text(path)
}
