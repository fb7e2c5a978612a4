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
  * ([[Warc.readWarcRecordsAt]]); [[mergeCdxj]] maintains the standing
  * index incrementally — a delta sorted-merges into only the shards
  * whose ranges it touches, never re-sorting the corpus-scale side.
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

  /** One CDXJ line from a `(surt, ts, url, mime, status, digest,
    * length, offset, gz_offset, filename)` row — the single format
    * kernel [[writeCdxj]] and [[mergeCdxj]] share. */
  private def formatLine(r: org.apache.spark.sql.Row): String = {
    import graft.operators.Json.quote
    def s(i: Int, key: String): String =
      if (r.isNullAt(i)) "" else s"""${quote(key)}:${quote(r.get(i).toString)},"""
    val json = ("{" + s(2, "url") + s(3, "mime") + s(4, "status") +
      s(5, "digest") + s(6, "length") + s(7, "offset") +
      s(8, "gz_offset") + s(9, "filename")).stripSuffix(",") + "}"
    s"${r.getString(0)} ${Option(r.getString(1)).getOrElse("-")} $json"
  }

  private def indexCols(index: DataFrame): DataFrame =
    index.select(col("surt"), col("ts"), col("url"), col("mime"),
      col("status"), col("digest"), col("length"), col("offset"),
      col("gz_offset"), col("filename"))

  /** The sort key of a CDXJ line: its `<surt> <ts>` prefix. String
    * order of the prefix equals (surt, ts) column order: SURT keys are
    * space-free by construction (the line format's own framing), every
    * SURT byte is ≥ 0x20 so a prefix SURT sorts before its extensions
    * under both orders, and the absent-ts `-` (0x2D) sorts before any
    * digit — matching the column sort's nulls-first. */
  private def keyOf(line: String): String = {
    val sp2 = line.indexOf(' ', line.indexOf(' ') + 1)
    require(sp2 > 0, s"malformed cdxj line: ${line.take(80)}")
    line.substring(0, sp2)
  }

  /** Write `(surt, ts, url, mime, status, digest, length, offset,
    * gz_offset, filename)` rows as CDXJ text, globally sorted by
    * (surt, ts). `shards > 0` pins the range-partition count — the
    * layout knob that holds SHARD SIZE constant as the corpus grows
    * (the Common Crawl convention: shard count ∝ index size), which is
    * what keeps [[mergeCdxj]]'s touched-shard cost flat; 0 leaves the
    * session's parallelism in charge. */
  def writeCdxj(index: DataFrame, dir: String, shards: Int = 0): Unit = {
    import index.sparkSession.implicits._
    val arranged =
      if (shards > 0)
        indexCols(index)
          .repartitionByRange(shards, col("surt"), col("ts"))
          .sortWithinPartitions("surt", "ts")
      else indexCols(index).orderBy("surt", "ts")
    arranged
      .map(formatLine)
      .write.mode("overwrite").text(dir)
  }

  /** Incremental index maintenance — the `index-append` analogue for
    * the selection layer: sorted-merge a DELTA (new crawl segments'
    * [[cdxFromWarc]] rows) into a STANDING [[writeCdxj]] index WITHOUT
    * re-sorting the standing side. A continuous crawl
    * ([[graft.io.Warc.readWarcStream]] → [[graft.operators.Recrawl
    * .mergeRefetch]]) re-sorts nothing: the standing shards are each
    * internally sorted and globally range-partitioned, so the merge
    *
    *   1. reads each shard's FIRST line (driver-side, shards-scale —
    *      the range bounds ARE the index's own layout, no manifest);
    *   2. routes every delta row to the one shard whose range owns its
    *      key (broadcast bounds, binary search — keys below the first
    *      shard go to it, keys past the last to the last);
    *   3. rewrites ONLY the shards that received delta rows: one
    *      streaming two-iterator merge per touched shard (standing
    *      lines win ties — stable), dot-tmp + rename replace.
    *
    * Cost is the delta plus the standing bytes of TOUCHED shards —
    * flat in standing-index size for the locality-bearing deltas a
    * real recrawl produces (a re-fetched site's captures share SURT
    * prefixes and land in few shards); a delta scattered across every
    * shard honestly pays every shard, which is what periodic
    * [[writeCdxj]] re-sharding (compaction) is for. Shard COUNT is
    * preserved — a merge never splits; rebalancing is the compaction
    * pass's job. Single-writer contract, like every standing-artifact
    * maintainer here; the per-shard replace is atomic-rename, so a
    * reader sees old or new, never half.
    *
    * An empty standing dir degrades to [[writeCdxj]] (the bootstrap). */
  def mergeCdxj(spark: SparkSession, standingDir: String,
      delta: DataFrame): Unit = {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val fs = new Path(standingDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // empty part files (a range partitioner's empty tails) own no
    // range — they are not merge targets
    val parts =
      if (!fs.exists(new Path(standingDir))) Array.empty[Path]
      else fs.listStatus(new Path(standingDir))
        .filter(st => st.getPath.getName.startsWith("part-") && st.getLen > 0)
        .map(_.getPath).sortBy(_.getName)
    if (parts.isEmpty) { writeCdxj(delta, standingDir); return }
    val firstKeys = parts.map { p =>
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(p), utf8))
      try {
        val l = in.readLine()
        require(l != null, s"mergeCdxj: empty standing shard $p")
        keyOf(l)
      } finally in.close()
    }
    // shard i owns [firstKeys(i), firstKeys(i+1)); bounds = the upper
    // edges, so the routed shard = count of bounds <= key
    val bounds = spark.sparkContext.broadcast(firstKeys.drop(1))
    val shardPaths = spark.sparkContext.broadcast(parts.map(_.toString))
    val hconf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val rewritten = indexCols(delta)
      .map(r => (formatLine(r): String))
      .map { line =>
        val k = keyOf(line)
        val b = bounds.value
        var lo = 0; var hi = b.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (b(mid) <= k) lo = mid + 1 else hi = mid
        }
        (lo, k, line)
      }
      .toDF("shard", "key", "line")
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "key")
      .as[(Int, String, String)]
      .mapPartitions { it =>
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        val conf = hconf.value.value
        val done = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
        val buffered = it.buffered
        while (buffered.hasNext) {
          val shard = buffered.head._1
          val target = new Path(shardPaths.value(shard))
          val sfs = target.getFileSystem(conf)
          val tmp = new Path(target.getParent, s".${target.getName}.merge.tmp")
          val in = new java.io.BufferedReader(
            new java.io.InputStreamReader(sfs.open(target), utf8))
          val out = new java.io.BufferedWriter(
            new java.io.OutputStreamWriter(sfs.create(tmp, true), utf8))
          var added = 0L
          try {
            var standing = in.readLine()
            var lastWritten: String = null
            while (buffered.hasNext && buffered.head._1 == shard) {
              val (_, k, line) = buffered.next()
              // drain standing lines up to the delta key (ties: standing
              // first — a stable merge)
              while (standing != null && keyOf(standing) <= k) {
                out.write(standing); out.write('\n'); lastWritten = standing
                standing = in.readLine()
              }
              // convergent replay: a delta line byte-identical to the
              // one just written (equal keys drain standing first, so
              // an already-merged twin is always adjacent) is the SAME
              // capture arriving again — a re-run merge, a
              // crash-replayed microbatch — and is skipped: merging a
              // delta twice converges instead of accumulating. Distinct
              // captures sharing (surt, ts) differ in their json and
              // are kept.
              if (line != lastWritten) {
                out.write(line); out.write('\n'); lastWritten = line
                added += 1
              }
            }
            while (standing != null) {
              out.write(standing); out.write('\n')
              standing = in.readLine()
            }
          } finally { out.close(); in.close() }
          // atomic replace: a reader sees the old shard or the new one
          sfs.delete(target, false)
          require(sfs.rename(tmp, target),
            s"mergeCdxj: rename $tmp -> $target failed")
          done += ((shard, added))
        }
        done.iterator
      }
      .collect()
    val _ = rewritten // shards-scale action forces the side effects
  }

  /** At-most-once [[mergeCdxj]] per microbatch id — the streaming
    * maintenance guard (the [[graft.io.Sinks.appendBatchIdempotent]]
    * contract): the standing dir's dot-marker records the last merged
    * batch and a replayed id — Structured Streaming re-runs a failed
    * batch under the SAME id — is skipped, with the writer lease held
    * for the merge like every mutating index verb. The residual
    * crash-between-merge-and-marker window replays the delta, which
    * [[mergeCdxj]]'s byte-identical-line skip absorbs: the re-merge
    * converges instead of duplicating. Returns whether the batch
    * merged. */
  def mergeCdxjIdempotent(spark: SparkSession, standingDir: String,
      delta: DataFrame, batchId: Long): Boolean =
    graft.operators.IndexLock.withLock(spark, standingDir, "cdx-merge") {
      if (batchId <= graft.io.Sinks.lastCommittedBatch(spark, standingDir))
        false
      else {
        mergeCdxj(spark, standingDir, delta)
        graft.io.Sinks.recordCommittedBatch(spark, standingDir, batchId)
        true
      }
    }

  /** Continuous index maintenance — the standing CDXJ maintained AS
    * the crawl streams in: each microbatch of records index-derives
    * ([[cdxFromWarc]]) and sorted-merges into the standing shards
    * at-most-once ([[mergeCdxjIdempotent]]). Compose with
    * [[Warc.readWarcStream]] and the selection layer is never a
    * post-pass — a capture is fetchable through the index the moment
    * its batch commits, the `writeStreamIndexed` analogue for the
    * selection tier. Periodic [[compactCdxj]] re-balances the shard
    * drift merges accumulate, in the same maintenance window as every
    * standing artifact here. */
  def writeStreamCdx(records: Dataset[Warc.WarcRecord], standingDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Warc.WarcRecord], batchId: Long) =>
        val _ = mergeCdxjIdempotent(batch.sparkSession, standingDir,
          cdxFromWarc(batch), batchId)
      }
      .start()

  /** Re-sharding compaction — the maintenance pass [[mergeCdxj]] and
    * [[deleteFromCdxj]] defer to: merges grow shards they touch and
    * never split, deletes shrink and may remove shards, so a standing
    * index drifts away from the constant-shard-SIZE layout that keeps
    * touched-shard costs flat. Compaction re-sorts the whole index
    * into `shards` fresh range partitions (0 = session parallelism) —
    * corpus-scale by design, scheduled rarely, exactly like the BM25
    * `index-compact` verb. Lines the reader flags malformed cannot be
    * re-sharded typed; they are dropped LOUDLY (the returned second
    * count — a caller that must not lose them fixes the index first).
    * The rewrite stages beside the live index and swaps in two
    * renames; single-writer contract, readers between the renames see
    * the index mid-swap — schedule compaction in the same maintenance
    * window as every other standing-artifact rewrite here. Returns
    * (lines kept, flagged lines dropped). */
  def compactCdxj(spark: SparkSession, dir: String,
      shards: Int = 0): (Long, Long) = {
    import org.apache.hadoop.fs.Path
    val rows = readCdxj(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dropped = rows.filter(!col("ok")).count()
      val kept = rows.filter(col("ok")).count()
      val tmp = dir.stripSuffix("/") + ".compact.tmp"
      writeCdxj(rows.filter(col("ok")), tmp, shards)
      val fs = new Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(fs.delete(new Path(dir), true),
        s"compactCdxj: removing old index $dir failed")
      require(fs.rename(new Path(tmp), new Path(dir)),
        s"compactCdxj: swap $tmp -> $dir failed")
      (kept, dropped)
    } finally { val _ = rows.unpersist() }
  }

  /** Takedown maintenance — the `index-delete` analogue for the
    * selection layer: remove EVERY capture of the given URLs from a
    * standing [[writeCdxj]] index, rewriting only the shards whose
    * ranges own them. The index is the archive's visibility gate
    * (WARC segments are immutable, append-only media): un-indexing a
    * URL makes it unfetchable through [[fetchRecords]] /
    * [[latestCaptures]] / [[closestCaptures]], which is what a
    * takedown or robots-revocation pass needs NOW; reclaiming the
    * bytes is the corpus layer's job
    * ([[graft.operators.CorpusPipeline.deleteDocs]]) and archive
    * rewrite/compaction's schedule.
    *
    * Keys are SURT ([[graft.expressions.NativeUrl.surtUrl]] of the
    * `url` column — a row with no derivable SURT names nothing and is
    * ignored). A key's captures can straddle a range boundary (shards
    * split WITHIN a SURT's timestamp run), so each key routes to the
    * full shard span its `<surt> <ts>` range can reach — `"<surt> "`
    * through `"<surt> :"` (ts bytes are `-` and digits, all < `:`) —
    * and each touched shard drops its matching lines in one streaming
    * walk, dot-tmp + atomic rename like [[mergeCdxj]]. A shard
    * deleted down to zero lines is REMOVED (an empty file owns no
    * range and would poison the merge's bounds probe). Deleting an
    * absent key is a no-op. Returns the number of index lines
    * removed.
    *
    * Scale shape: the delete set distincts and routes through
    * broadcast shard bounds (takedown lists are small against a
    * corpus; the shuffle is delete-scale), and cost is the standing
    * bytes of TOUCHED shards only — flat in standing-index size for
    * the host-local selections real takedowns are. Single-writer
    * contract, per-shard atomic replace. */
  def deleteFromCdxj(spark: SparkSession, standingDir: String,
      urls: DataFrame): Long = {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    import graft.expressions.NativeUrl
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val fs = new Path(standingDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts =
      if (!fs.exists(new Path(standingDir))) Array.empty[Path]
      else fs.listStatus(new Path(standingDir))
        .filter(st => st.getPath.getName.startsWith("part-") && st.getLen > 0)
        .map(_.getPath).sortBy(_.getName)
    if (parts.isEmpty) return 0L
    val firstKeys = parts.map { p =>
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(p), utf8))
      try {
        val l = in.readLine()
        require(l != null, s"deleteFromCdxj: empty standing shard $p")
        keyOf(l)
      } finally in.close()
    }
    val bounds = spark.sparkContext.broadcast(firstKeys.drop(1))
    val shardPaths = spark.sparkContext.broadcast(parts.map(_.toString))
    val hconf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val removedPerShard = urls
      .select(NativeUrl.surtUrl(col("url")).as("surt"))
      .filter(col("surt").isNotNull)
      .distinct()
      .as[String]
      .flatMap { surt =>
        def route(k: String): Int = {
          val b = bounds.value
          var lo = 0; var hi = b.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (b(mid) <= k) lo = mid + 1 else hi = mid
          }
          lo
        }
        // a SURT's captures span ["<surt> ", "<surt> :") in line order
        (route(surt + " ") to route(surt + " :")).map(sh => (sh, surt))
      }
      .toDF("shard", "surt")
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "surt")
      .as[(Int, String)]
      .mapPartitions { it =>
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        val conf = hconf.value.value
        def surtOf(line: String): String =
          line.substring(0, line.indexOf(' '))
        val done = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
        val buffered = it.buffered
        while (buffered.hasNext) {
          val shard = buffered.head._1
          val target = new Path(shardPaths.value(shard))
          val sfs = target.getFileSystem(conf)
          val tmp = new Path(target.getParent, s".${target.getName}.del.tmp")
          val in = new java.io.BufferedReader(
            new java.io.InputStreamReader(sfs.open(target), utf8))
          val out = new java.io.BufferedWriter(
            new java.io.OutputStreamWriter(sfs.create(tmp, true), utf8))
          var removed = 0L
          var kept = 0L
          try {
            var standing = in.readLine()
            while (buffered.hasNext && buffered.head._1 == shard) {
              val (_, key) = buffered.next()
              while (standing != null && surtOf(standing) < key) {
                out.write(standing); out.write('\n'); kept += 1
                standing = in.readLine()
              }
              while (standing != null && surtOf(standing) == key) {
                removed += 1
                standing = in.readLine()
              }
            }
            while (standing != null) {
              out.write(standing); out.write('\n'); kept += 1
              standing = in.readLine()
            }
          } finally { out.close(); in.close() }
          if (kept == 0L) {
            // a fully-deleted shard is removed, not left empty: an
            // empty part owns no range and must not anchor bounds
            require(sfs.delete(tmp, false) && sfs.delete(target, false),
              s"deleteFromCdxj: removing emptied shard $target failed")
          } else {
            sfs.delete(target, false)
            require(sfs.rename(tmp, target),
              s"deleteFromCdxj: rename $tmp -> $target failed")
          }
          done += ((shard, removed))
        }
        done.iterator
      }
      .collect()
    removedPerShard.map(_._2).sum
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

  /** The "current web" view of an index: ONE capture per SURT key —
    * the latest by timestamp (ties and the remaining columns resolve
    * through one deterministic max-struct; null-ts rows, a staging
    * archive's, carry no time axis and are excluded). Compose with
    * [[fetchRecords]] and the corpus of record is every page's newest
    * capture WITHOUT re-crawling or scanning — the selection the
    * conditional-refetch loop maintains, read back out of the index.
    * One map-side-partial aggregate on the surt; index-scale, never
    * corpus-scale. */
  def latestCaptures(index: DataFrame): DataFrame = {
    val rows =
      if (index.columns.contains("ok")) index.filter(col("ok")) else index
    rows.filter(col("ts").isNotNull)
      .groupBy("surt")
      .agg(max(struct(col("ts"), col("url"), col("mime"), col("status"),
        col("digest"), col("length"), col("offset"), col("gz_offset"),
        col("filename"))).as("o"))
      .select(col("surt"), col("o.ts").as("ts"), col("o.url").as("url"),
        col("o.mime").as("mime"), col("o.status").as("status"),
        col("o.digest").as("digest"), col("o.length").as("length"),
        col("o.offset").as("offset"), col("o.gz_offset").as("gz_offset"),
        col("o.filename").as("filename"))
  }

  /** Time travel — the wayback replay semantic: per SURT key, the
    * capture CLOSEST to `atTs` (a 14-digit CDX timestamp), nearest
    * absolute time distance winning and the EARLIER capture breaking
    * exact ties (replay convention: never show newer than asked when
    * equidistant). Distance is computed in epoch seconds parsed from
    * the timestamp14 (calendar-correct — two captures straddling a
    * month boundary compare by real elapsed time, not digit
    * arithmetic). Same single-aggregate shape as [[latestCaptures]]. */
  def closestCaptures(index: DataFrame, atTs: String): DataFrame = {
    require(atTs.matches("[0-9]{14}"), s"atTs must be a 14-digit CDX timestamp: $atTs")
    val rows =
      if (index.columns.contains("ok")) index.filter(col("ok")) else index
    def epochOf(c: org.apache.spark.sql.Column) =
      unix_timestamp(to_timestamp(c, "yyyyMMddHHmmss"))
    val dist = abs(epochOf(col("ts")) - epochOf(lit(atTs)))
    rows.filter(col("ts").isNotNull)
      .groupBy("surt")
      .agg(min(struct(dist.as("d"), col("ts"), col("url"), col("mime"),
        col("status"), col("digest"), col("length"), col("offset"),
        col("gz_offset"), col("filename"))).as("o"))
      .select(col("surt"), col("o.ts").as("ts"), col("o.url").as("url"),
        col("o.mime").as("mime"), col("o.status").as("status"),
        col("o.digest").as("digest"), col("o.length").as("length"),
        col("o.offset").as("offset"), col("o.gz_offset").as("gz_offset"),
        col("o.filename").as("filename"))
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
