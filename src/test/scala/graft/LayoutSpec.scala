package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue/unspread16 round-trip over the full 16-bit corners and randoms") {
    val probes = Seq((0, 0), (65535, 65535), (65535, 0), (0, 65535),
      (1, 2), (43690, 21845), (12345, 54321), (256, 255))
    val df = probes.toDF("x", "y")
      .withColumn("z", Layout.zValue(col("x"), col("y")))
      .withColumn("rx", Layout.unspread16(col("z"), odd = false))
      .withColumn("ry", Layout.unspread16(col("z"), odd = true))
    df.collect().foreach { r =>
      assert(r.getAs[Long]("rx") == r.getAs[Int]("x").toLong, r.toString)
      assert(r.getAs[Long]("ry") == r.getAs[Int]("y").toLong, r.toString)
    }
    // golden: interleave(x=0b11, y=0b01) = x bits at 0,2 + y bit at 1 → 0b0111
    assert(Seq((3, 1)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"))).as[Long].head() == 7L)
  }

  test("clusterByZ: every partition covers a compact bounding box in BOTH dims") {
    // full 256x256 grid, one row per cell
    val grid = spark.range(0, 65536).select(
      (col("id") % 256).cast("int").as("x"),
      (col("id") / 256).cast("int").as("y"))
    val clustered = Layout.clusterByZ(grid, "x", "y", nPartitions = 16)
    val extents = clustered
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("x") - min("x")).as("ex"), (max("y") - min("y")).as("ey"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(extents.map(_._3).sum == 65536L)
    // z-curve locality: a z-interval's bounding box area is within a small
    // constant factor of its cell count (a partition crossing a Morton
    // quadrant boundary can briefly span a full dimension, but its AREA
    // stays bounded — the property min-max pruning feeds on). A random
    // row placement would give every partition the full 65536-cell box,
    // 16x its cell count.
    extents.foreach { case (ex, ey, n) =>
      val area = (ex + 1L) * (ey + 1L)
      assert(area <= 10L * n, s"bbox ${ex + 1}x${ey + 1} = $area for $n cells")
    }
    // and most partitions are tight blocks in BOTH dims
    val compact = extents.count { case (ex, ey, _) => ex <= 160 && ey <= 160 }
    assert(compact >= extents.length / 2,
      s"only $compact/${extents.length} partitions compact in both dims")
    // and the z column is gone from the output
    assert(!clustered.columns.contains("__z"))
  }

  test("clusterByZ write: parquet min-max footers prune on either dimension") {
    val grid = spark.range(0, 65536).select(
      (col("id") % 256).cast("int").as("x"),
      (col("id") / 256).cast("int").as("y"))
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    Layout.clusterByZ(grid, "x", "y", 16).write.mode("overwrite").parquet(dir)
    // per-file stats: a filter on y (the dimension a plain x-sort ignores)
    // must be satisfiable by a strict subset of files
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 8, s"expected >=8 files, got ${files.length}")
    val touching = files.count { f =>
      val stats = spark.read.parquet(f.getPath)
        .agg(min("y"), max("y")).head()
      stats.getInt(0) <= 16 && 16 <= stats.getInt(1)
    }
    assert(touching < files.length / 2,
      s"$touching/${files.length} files overlap y=16 — z-layout not pruning")
  }
}
