package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

/** TSV sinks matching the reference's writer conventions (SURVEY.md §2.2).
  *
  * The reference writes one file per partition then concatenates them into a
  * single file keeping one header (K1+K2, eggv/dfio.py:22-100), with nulls
  * as "NA" (na_rep, eggv/dfio.py:91) while missing transcripts — already
  * empty strings, not nulls — stay empty (eggv/process.py:171). Spark's CSV
  * writer distinguishes the two natively via nullValue vs emptyValue.
  *
  * At 100 TB, never coalesce(1): `writeTsv` keeps full write parallelism
  * (one part-file per partition — exactly the reference's K1 design, which
  * also wrote per-partition parts). `writeSingleTsv` exists for parity with
  * the reference's single-file outputs on small data; for 100 GB-class
  * outputs, partitioned write + out-of-engine concat is the right call
  * (SURVEY.md §7.5.7).
  */
object Sinks {

  private def tsvWriter(df: DataFrame) =
    df.write
      .option("sep", "\t")
      .option("header", "true")
      .option("nullValue", "NA")
      .option("emptyValue", "")
      .mode("overwrite")

  /** Partition-parallel TSV write (K1). One part file per partition.
    * `partitionBy` columns become `col=value/` directories (hive layout)
    * and are dropped from the file bodies — the reference's
    * one-output-file-per-chromosome identity (eggv/process.py:394-424,
    * eggv/annotate.py:207-235) maps to `partitionBy("chromosome")`:
    * re-reads of a single chromosome prune to its directory instead of
    * scanning the whole dataset. */
  def writeTsv(df: DataFrame, dir: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = tsvWriter(df)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).csv(dir)
  }

  /** Single-file TSV write (K2 parity) — serializes the final write, only
    * for small outputs such as per-chromosome files. */
  def writeSingleTsv(df: DataFrame, dir: String): Unit =
    tsvWriter(df.coalesce(1)).csv(dir)

  /** Streaming TSV sink: the exactly-once file sink (Spark's manifest
    * commit log under `checkpointDir` guarantees a batch's part files
    * appear atomically and are never double-committed on restart), with
    * the SAME writer conventions as the batch `writeTsv` — a consumer
    * cannot tell whether a dataset was produced by the batch or the
    * streaming pipeline. Returns the started query; callers own its
    * lifecycle. */
  def writeTsvStream(df: DataFrame, dir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("csv")
      .option("sep", "\t")
      .option("header", "true")
      .option("nullValue", "NA")
      .option("emptyValue", "")
      .option("path", dir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()

  /** K2 at scale: partition-parallel write, then a driver-side concat of
    * the part files (in part order) keeping one header — the reference's
    * consolidation design (eggv/dfio.py:22-60), which preserves full write
    * parallelism where `coalesce(1)` funnels the entire dataset through
    * one task. The concat is a sequential byte copy: IO-bound, no
    * parsing, no memory proportional to data size. Byte-identical to
    * `writeSingleTsv` on the same DataFrame (coalesce(1) also merges
    * partitions in order). Returns `outFile`. */
  def consolidateTsv(df: DataFrame, outFile: String): String = {
    val partsDir = outFile + ".parts"
    writeTsv(df, partsDir)
    val parts = Files.list(Paths.get(partsDir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .toSeq.sortBy(_.getFileName.toString)
    val outPath = Paths.get(outFile)
    if (outPath.getParent != null) Files.createDirectories(outPath.getParent)
    val out = new BufferedOutputStream(Files.newOutputStream(outPath))
    try {
      var first = true
      for (part <- parts) {
        val in = new BufferedInputStream(Files.newInputStream(part))
        try {
          if (!first) { // skip this part's header line
            var b = in.read()
            while (b != -1 && b != '\n') b = in.read()
          }
          val buf = new Array[Byte](1 << 20)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        } finally in.close()
        first = false
      }
    } finally out.close()
    deleteRecursively(Paths.get(partsDir))
    outFile
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  /** Parquet sink — the scale-path output format (columnar, statistics,
    * predicate pushdown on re-read); what the TSV outputs should become
    * when the consumer is this engine rather than a third-party tool.
    * `partitionBy` as in `writeTsv` — hive-layout dirs, pruned re-reads. */
  def writeParquet(df: DataFrame, dir: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(dir)
  }

  /** Compact a parquet directory's small files in place: rewrite into
    * ceil(totalBytes / targetFileBytes) files, then swap atomically
    * (tmp-write → retire old → move in). The small-files maintenance op
    * every long-running ingest needs — each streaming microbatch or
    * per-task writer leaves file counts that grow without bound, and at
    * 100 TB a scan's task count (and the namenode's listing cost) follows
    * the file count, not the byte count. Coalesce, not repartition: a
    * shuffle-free narrow rewrite (compaction only ever merges).
    *
    * Not transactional against concurrent writers/readers of `dir` — run
    * it as the ingest's own maintenance step, like the reference's
    * single-owner output dirs. Returns the new file count. */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val source = Paths.get(dir)
    val parquetFiles = Files.list(source).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    val totalBytes = parquetFiles.map(Files.size).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val tmp = Paths.get(dir + ".compact-tmp")
    deleteRecursively(tmp)
    spark.read.parquet(dir).coalesce(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    val retired = Paths.get(dir + ".compact-old")
    deleteRecursively(retired)
    Files.move(source, retired)
    Files.move(tmp, source)
    deleteRecursively(retired)
    nFiles
  }

  /** Bucketed parquet table: pre-shuffled on `bucketCols` into `numBuckets`
    * files per partition, registered in the session catalog. Joins and
    * aggregations between tables bucketed the same way skip their shuffle
    * entirely — the co-located-join layout for fact tables that are joined
    * on the same key repeatedly (the 100 TB answer to "this join shuffles
    * every run"). */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
      bucketCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
