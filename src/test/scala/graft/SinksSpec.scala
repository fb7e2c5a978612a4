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
}
