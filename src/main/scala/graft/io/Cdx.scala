package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** CDXJ crawl indexes — the selection layer OVER the archives: one
  * sorted text line per capture (`<surt-key> <timestamp14> <json>`,
  * the format Common Crawl publishes alongside every crawl), so a
  * pipeline can pick records by domain/prefix/time and fetch only the
  * archives it needs instead of scanning 100 TB of WARC. SURT keys
  * ([[graft.expressions.NativeUrl.surtUrl]]) make one host's captures
  * contiguous under a plain string sort — the property the whole
  * format exists for.
  *
  * [[cdxFromWarc]] derives index rows from a record scan (narrow
  * codegen'd column work — the SURT kernel, one date reformat);
  * [[writeCdxj]] sorts by (surt, ts) — ONE range shuffle, the sort IS
  * the product — and writes text partitions that are each internally
  * sorted and globally range-partitioned (how CC shards its index);
  * [[readCdxj]] parses lines back strict-per-line with the house
  * tolerant-bridge flag (a malformed line degrades to its own flagged
  * row); [[fetchRecords]] closes the loop — index rows back to the
  * records they name, by offset, without scanning
  * ([[Warc.readWarcRecordsAt]]).
  *
  * Addressing follows the [[Warc.WarcRecord]] contract: for gzipped
  * archives `gz_offset` is the record's member's compressed offset and
  * `offset` member-relative (0 in the record-per-member layout); for
  * bare archives `offset` is the file offset and `gz_offset` absent. */
object Cdx {

  /** Index rows from a record scan: framing-clean responses with a
    * derivable SURT key. `ts` is WARC-Date reduced to the CDX
    * timestamp14 form (digits only); absent dates yield null ts (a
    * staging archive), never a dropped capture. */
  def cdxFromWarc(records: Dataset[Warc.WarcRecord]): DataFrame = {
    import graft.expressions.NativeUrl
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull)
      .select(
        NativeUrl.surtUrl(col("target_uri")).as("surt"),
        regexp_replace(col("warc_date"), "[^0-9]", "").substr(1, 14).as("ts"),
        col("target_uri").as("url"),
        Warc.mimeOf(col("http_content_type")).as("mime"),
        col("http_status").as("status"),
        col("payload_digest").as("digest"),
        col("content_length").as("length"),
        col("offset"),
        when(col("gz_offset") >= 0, col("gz_offset")).as("gz_offset"),
        col("path").as("filename"))
      .filter(col("surt").isNotNull)
  }

  /** Write `(surt, ts, url, mime, status, digest, length, offset,
    * gz_offset, filename)` rows as CDXJ text, globally sorted by
    * (surt, ts). */
  def writeCdxj(index: DataFrame, dir: String): Unit = {
    import graft.operators.Json.quote
    import index.sparkSession.implicits._
    index
      .orderBy("surt", "ts")
      .select(col("surt"), col("ts"), col("url"), col("mime"),
        col("status"), col("digest"), col("length"), col("offset"),
        col("gz_offset"), col("filename"))
      .map { r =>
        def s(i: Int, key: String): String =
          if (r.isNullAt(i)) "" else s"""${quote(key)}:${quote(r.get(i).toString)},"""
        val json = ("{" + s(2, "url") + s(3, "mime") + s(4, "status") +
          s(5, "digest") + s(6, "length") + s(7, "offset") +
          s(8, "gz_offset") + s(9, "filename")).stripSuffix(",") + "}"
        s"${r.getString(0)} ${Option(r.getString(1)).getOrElse("-")} $json"
      }
      .write.mode("overwrite").text(dir)
  }

  /** Fetch the records an index slice names — the whole reason the
    * index exists: `readCdxj(...).filter(<surt prefix, ts range>)`
    * then this, and only the selected records' bytes are ever read.
    * Cost follows the SELECTION (one range read + one member inflate
    * per record over the record-per-member layout), flat in corpus
    * size. Rows flagged `ok = false` by the reader are dropped here —
    * a malformed index line names nothing. */
  def fetchRecords(spark: SparkSession, index: DataFrame): Dataset[Warc.WarcRecord] = {
    val rows =
      if (index.columns.contains("ok")) index.filter(col("ok")) else index
    Warc.readWarcRecordsAt(spark,
      rows.select(col("filename"), col("offset"), col("gz_offset")))
  }

  /** Parse CDXJ lines back to typed rows; `ok = false` flags a
    * malformed line (bad framing or JSON) without failing siblings. */
  def readCdxj(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Json
    import graft.operators.Json.{JNum, JObj, JStr}
    spark.read.textFile(path)
      .map { line =>
        try {
          val sp1 = line.indexOf(' ')
          val sp2 = line.indexOf(' ', sp1 + 1)
          require(sp1 > 0 && sp2 > sp1, "missing surt/ts fields")
          val surt = line.substring(0, sp1)
          val ts0 = line.substring(sp1 + 1, sp2)
          val ts = if (ts0 == "-") null else ts0
          val fields = Json.parse(line.substring(sp2 + 1)) match {
            case JObj(fs) => fs.toMap
            case _ => throw new IllegalArgumentException("payload not an object")
          }
          def str(k: String): String = fields.get(k) match {
            case Some(JStr(v)) => v
            case _ => null
          }
          def num(k: String): java.lang.Long = fields.get(k) match {
            case Some(JStr(v)) => v.toLongOption.map(java.lang.Long.valueOf).orNull
            case Some(JNum(v)) => v.toLongOption.map(java.lang.Long.valueOf).orNull
            case _ => null
          }
          (surt, ts, str("url"), str("mime"),
            Option(str("status")).flatMap(_.toIntOption)
              .map(java.lang.Integer.valueOf).orNull,
            str("digest"), num("length"), num("offset"), num("gz_offset"),
            str("filename"), true)
        } catch {
          case _: Exception =>
            (null: String, null: String, null: String, null: String,
              null: Integer, null: String, null: java.lang.Long,
              null: java.lang.Long, null: java.lang.Long, line, false)
        }
      }
      .toDF("surt", "ts", "url", "mime", "status", "digest", "length",
        "offset", "gz_offset", "filename", "ok")
  }
}
