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

  test("zValueN: N=2 at 16 bits is bit-identical to the magic-number zValue") {
    val probes = Seq((0, 0), (65535, 65535), (65535, 0), (0, 65535),
      (1, 2), (43690, 21845), (12345, 54321), (256, 255))
    probes.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("magic"),
        Layout.zValueN(Seq(col("x"), col("y")), 16).as("generic"))
      .collect().foreach(r =>
        assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("zValueN: 3-column golden + sql replay agrees with the Column form") {
    // x=0b11 → bits 0,3 = 9; y=0b01 → bit 1 = 2; w=0b10 → bit 1*3+2=5 = 32
    assert(Seq((3, 1, 2)).toDF("x", "y", "w")
      .select(Layout.zValueN(Seq(col("x"), col("y"), col("w")), 2))
      .as[Long].head() == 43L)
    // sql replay: the exact string the oracle runs, evaluated by Spark SQL
    val df = Seq((12, 200, 255), (0, 0, 0), (255, 255, 255), (7, 130, 64))
      .toDF("x", "y", "w")
    df.createOrReplaceTempView("zn_probe")
    val viaSql = spark.sql(
      s"SELECT ${Layout.zValueNSql(Seq("x", "y", "w"), 8)} AS z FROM zn_probe")
      .as[Long].collect().toSeq
    val viaCol = df.select(
      Layout.zValueN(Seq(col("x"), col("y"), col("w")), 8)).as[Long].collect().toSeq
    assert(viaSql == viaCol)
  }

  test("clusterByZQuantized: 3-D partitions cover compact bounding VOLUMES") {
    // full 32x32x32 grid, one row per cell; uniform grid makes equi-depth
    // quantization ~identity, so the invariant tests the curve itself
    val grid = spark.range(0, 32768).select(
      (col("id") % 32).cast("int").as("x"),
      ((col("id") / 32) % 32).cast("int").as("y"),
      (col("id") / 1024).cast("int").as("w"))
    val clustered = Layout.clusterByZQuantized(grid, Seq("x", "y", "w"),
      nPartitions = 16, bitsPerDim = 5)
    val extents = clustered
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("x") - min("x")).as("ex"), (max("y") - min("y")).as("ey"),
        (max("w") - min("w")).as("ew"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    assert(extents.map(_._4).sum == 32768L)
    // a z-interval's bounding VOLUME stays within a small constant factor
    // of its cell count (the 3-D analogue of the 2-D area invariant; the
    // constant is larger because an interval can cross octant boundaries
    // in more ways). Random placement would give every partition the full
    // 32768-cell volume = 16x its cell count.
    extents.foreach { case (ex, ey, ew, n) =>
      val vol = (ex + 1L) * (ey + 1L) * (ew + 1L)
      assert(vol <= 12L * n, s"bbox ${ex + 1}x${ey + 1}x${ew + 1} = $vol for $n cells")
    }
  }

  test("clusterByZQuantized: skewed domains still fill the curve evenly") {
    // id^2 is heavily right-skewed; modulo-style quantization would dump
    // most rows into the low corner of the curve. Equi-depth buckets must
    // keep range partitions balanced anyway.
    val skewed = spark.range(0, 20000).select(
      (col("id") * col("id")).as("a"),
      (lit(400000000L) - col("id") * col("id")).as("b"))
    val counts = Layout.clusterByZQuantized(skewed, Seq("a", "b"),
      nPartitions = 8, bitsPerDim = 6)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").count().as[(Int, Long)].collect().map(_._2)
    assert(counts.sum == 20000L)
    assert(counts.max <= 4 * (20000 / 8),
      s"skewed partition sizes: ${counts.mkString(",")}")
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

  test("hilbertValue: exhaustive bijection + jump-free adjacency on the 16x16 grid") {
    import graft.expressions.HilbertValue
    val bits = 4
    val n = 1 << bits
    // bijection: all n² cells map to distinct d in [0, n²)
    val cells = for (x <- 0L until n; y <- 0L until n)
      yield (x, y, HilbertValue.compute(x, y, bits))
    assert(cells.map(_._3).sorted == (0L until (n.toLong * n)).toSeq)
    // the defining property Morton LACKS: consecutive d are ALWAYS
    // Manhattan-distance-1 neighbors
    val byD = cells.map(t => t._3 -> ((t._1, t._2))).toMap
    (0L until (n.toLong * n - 1)).foreach { d =>
      val (x1, y1) = byD(d)
      val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
    // d2xy inverse round-trips
    cells.foreach { case (x, y, d) =>
      assert(HilbertValue.d2xy(d, bits) == ((x, y)))
    }
    // the Column API agrees with the kernel
    val viaCol = Seq((3L, 5L), (0L, 0L), (15L, 15L), (7L, 8L)).toDF("x", "y")
      .select(Layout.hilbertValue(col("x"), col("y"), bits).as("h"))
      .as[Long].collect()
    assert(viaCol.toSeq == Seq(
      HilbertValue.compute(3, 5, bits), HilbertValue.compute(0, 0, bits),
      HilbertValue.compute(15, 15, bits), HilbertValue.compute(7, 8, bits)))
  }

  test("clusterByHilbert: bounding boxes at least as tight as Morton's on the grid") {
    val grid = spark.range(0, 65536).select(
      (col("id") % 256).cast("int").as("x"),
      (col("id") / 256).cast("int").as("y"))
    def areaSum(df: org.apache.spark.sql.DataFrame): Long = df
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("x") - min("x")).as("ex"), (max("y") - min("y")).as("ey"))
      .collect().map(r => (r.getInt(1) + 1L) * (r.getInt(2) + 1L)).sum
    val hilbert = areaSum(Layout.clusterByHilbert(grid, "x", "y", 16, bits = 8))
    val morton = areaSum(Layout.clusterByZ(grid, "x", "y", 16))
    // the jump-free curve's per-partition boxes cover no more total area
    // than Morton's (strictly less when a partition spans a Morton seam)
    assert(hilbert <= morton,
      s"hilbert bbox area $hilbert > morton $morton")
    assert(hilbert <= 3L * 65536,
      s"hilbert total bbox area $hilbert not compact")
  }
}
