package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.io.Sinks

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def singleFileBytes(dir: String): Array[Byte] = {
    val part = Files.list(Paths.get(dir)).iterator()
    var found: java.nio.file.Path = null
    while (part.hasNext) {
      val p = part.next()
      if (p.getFileName.toString.startsWith("part-")) found = p
    }
    Files.readAllBytes(found)
  }

  test("consolidateTsv is byte-identical to writeSingleTsv, multi-partition") {
    // nulls (-> NA) and empty strings (-> "") exercise the writer
    // conventions; repartitionByRange gives several non-trivial partitions
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"),
        when(col("o_orderkey") % 7 === 0, lit(null)).otherwise(col("o_orderpriority")).as("priority"),
        when(col("o_orderkey") % 5 === 0, lit("")).otherwise(col("o_orderstatus")).as("status2"))
      .repartitionByRange(6, col("o_orderkey"))
    assert(df.rdd.getNumPartitions == 6)

    val base = Files.createTempDirectory("graft-sinks").toString
    Sinks.writeSingleTsv(df, s"$base/single")
    val out = Sinks.consolidateTsv(df, s"$base/consolidated.tsv")

    val a = singleFileBytes(s"$base/single")
    val b = Files.readAllBytes(Paths.get(out))
    assert(a.length == b.length && java.util.Arrays.equals(a, b),
      s"consolidated output differs: ${a.length} vs ${b.length} bytes")
    // exactly one header line
    val lines = new String(b).linesIterator.toSeq
    assert(lines.count(_.startsWith("o_orderkey\t")) == 1)
    // parts dir cleaned up
    assert(!Files.exists(Paths.get(s"$base/consolidated.tsv.parts")))
  }

  test("consolidateTsv handles empty partitions between populated ones") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .repartition(8, col("k")) // most of the 8 partitions are empty
    val base = Files.createTempDirectory("graft-sinks").toString
    Sinks.writeSingleTsv(df, s"$base/single")
    val out = Sinks.consolidateTsv(df, s"$base/consolidated.tsv")
    assert(java.util.Arrays.equals(
      singleFileBytes(s"$base/single"), Files.readAllBytes(Paths.get(out))))
  }

  test("compactParquet: many small files fold to the byte-budget count, rows intact") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    val df = spark.range(0, 10000).select(col("id"), (col("id") * 2).as("v"))
    df.repartition(20).write.parquet(dir)
    def files() = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files().length == 20)
    val before = spark.read.parquet(dir).collect().map(_.toString).sorted
    // generous budget → everything folds into one file
    val n = graft.io.Sinks.compactParquet(spark, dir, targetFileBytes = 1L << 30)
    assert(n == 1 && files().length == 1)
    val after = spark.read.parquet(dir).collect().map(_.toString).sorted
    assert(after.sameElements(before))
    // tight budget splits the estimate but never grows the count back
    val total = files().map(_.length).sum
    val n2 = graft.io.Sinks.compactParquet(spark, dir, targetFileBytes = total / 2 + 1)
    assert(n2 == 2 && files().length <= 2) // coalesce can't split 1 file
    assert(spark.read.parquet(dir).count() == 10000L)
    // swap left no temp/retired debris
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(_.contains("compact")))
  }

  test("compactParquet: per-task open cap floors the task count on huge scatters") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-cap").toString + "/t"
    spark.range(0, 2000).select(col("id")).repartition(200).write.parquet(dir)
    // a generous byte budget alone would coalesce(1) — one task opening
    // all 200 files sequentially; the cap keeps opens-per-task bounded
    val n = graft.io.Sinks.compactParquet(spark, dir, targetFileBytes = 1L << 30)
    assert(n == math.ceil(200.0 / 64).toInt, s"cap-floored task count, got $n")
    assert(spark.read.parquet(dir).count() == 2000L)
    // the follow-up pass (few files now) reaches the byte target
    assert(graft.io.Sinks.compactParquet(spark, dir, targetFileBytes = 1L << 30) == 1)
  }

  test("compactParquet: hive-partitioned dir compacts per leaf, layout preserved") {
    val dir = Files.createTempDirectory("graft-compact-part").toString + "/t"
    val df = spark.range(0, 9000)
      .select(col("id"), (col("id") % 3).cast("string").as("chromosome"),
        (col("id") * 2).as("v"))
    // 10 part files per partition dir
    df.repartition(10).write.partitionBy("chromosome").parquet(dir)
    def leafFiles(part: String) = new java.io.File(s"$dir/chromosome=$part")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(Seq("0", "1", "2").forall(p => leafFiles(p).length == 10))
    val before = spark.read.parquet(dir).collect().map(_.toString).sorted

    val n = Sinks.compactParquet(spark, dir, targetFileBytes = 1L << 30)
    // one file per partition, partition dirs intact, bytes readable with
    // the partition column still inferred from the layout
    assert(n == 3)
    assert(Seq("0", "1", "2").forall(p => leafFiles(p).length == 1))
    val after = spark.read.parquet(dir).collect().map(_.toString).sorted
    assert(after.sameElements(before))
    assert(spark.read.parquet(dir).schema.fieldNames.contains("chromosome"))
    // partition pruning still works on the compacted layout
    assert(spark.read.parquet(dir).filter(col("chromosome") === "1").count() == 3000L)
    // no temp/retired debris anywhere in the tree
    def walk(f: java.io.File): Seq[String] =
      if (f.isDirectory) f.getName +: f.listFiles().toSeq.flatMap(walk) else Seq(f.getName)
    assert(!walk(new java.io.File(dir)).exists(_.contains("compact")))
  }

  test("compactParquet: mixed flat+partitioned layout is rejected; empty dir is a no-op") {
    val base = Files.createTempDirectory("graft-compact-mixed")
    val dir = base.toString + "/t"
    spark.range(0, 10).write.parquet(dir)
    // graft a partition dir next to the flat files
    val sub = Paths.get(dir, "k=1")
    spark.range(0, 10).write.parquet(sub.toString)
    val e = intercept[IllegalArgumentException] {
      Sinks.compactParquet(spark, dir)
    }
    assert(e.getMessage.contains("mixed layout"))
    // a dir with no parquet files compacts to nothing rather than
    // rewriting the dataset into one unpartitioned file
    val empty = Files.createTempDirectory("graft-compact-empty").toString
    assert(Sinks.compactParquet(spark, empty) == 0)
  }

  test("writeTsvStream: exactly-once file sink, same bytes conventions as batch writeTsv") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-stream-sink").toString
    val srcDir = Files.createTempDirectory("graft-stream-sink-src")
    val stream = graft.io.Sources.readJsonl(spark, srcDir.toString) // schema probe only
    assert(!stream.isStreaming) // (batch read; the stream below is separate)

    val inStream = graft.io.Sources.readJsonlStream(spark, srcDir.toString)
      .select($"doc_id", $"lang", $"text")
    val query = Sinks.writeTsvStream(inStream, s"$base/out", s"$base/ckpt")
    try {
      Files.write(srcDir.resolve("shard.jsonl"), Seq(
        """{"doc_id": 1, "lang": "en", "text": "alpha"}""",
        """{"doc_id": 2, "lang": null, "text": ""}""").mkString("\n").getBytes)
      query.processAllAvailable()
    } finally query.stop()

    // written bytes follow the batch conventions: null → "NA", empty
    // string → truly empty field (distinct on disk)
    import scala.jdk.CollectionConverters._
    val lines = Files.list(Paths.get(s"$base/out")).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(p => Files.readAllLines(p).asScala)
      .filterNot(_.startsWith("doc_id")).toSeq.sorted
    assert(lines == Seq("1\ten\talpha", "2\tNA\t"))
    // read back: NA → null; the unquoted empty field reads as null too
    // (Spark CSV reader quirk — the same one readProcessedVariants
    // coalesces away), so the read-back contract matches the batch S3 path
    val back = spark.read
      .option("sep", "\t").option("header", "true")
      .option("nullValue", "NA").option("emptyValue", "")
      .schema("doc_id LONG, lang STRING, text STRING")
      .csv(s"$base/out")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getString(2)))).toSet
    assert(back == Set((1L, Some("en"), Some("alpha")), (2L, None, None)))
    // the sink's commit manifest exists — the exactly-once machinery, not
    // a bare directory of parts
    assert(Files.exists(Paths.get(s"$base/out/_spark_metadata")))
  }
}
