package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Physical data layout for multi-dimensional scan pruning: Z-order
  * (Morton) clustering.
  *
  * Why it matters at 100 TB: parquet scan pruning is driven by per-file /
  * per-rowgroup min-max statistics, which only bite when the file layout
  * correlates with the filter columns. Range-partitioning by ONE column
  * makes that column's stats tight and every other column's stats useless;
  * interleaving the bits of TWO columns into one sort key gives every file
  * a compact bounding BOX, so filters on either dimension (or both) skip
  * most files. This is the technique behind Delta/Iceberg `OPTIMIZE
  * ZORDER BY` — here as a plain repartitionByRange + sortWithinPartitions
  * over a pure-arithmetic derived column, so it works on any writer.
  *
  * The z-value math is codegen'd integer arithmetic (shift/and/or magic
  * spreading, no UDF), identically expressible in any engine — the oracle
  * replays it in SQL.
  */
object Layout {

  /** Spread the low 16 bits of `c` so bit i lands at bit 2i (the classic
    * magic-number Morton spreading; all int64 arithmetic). */
  private[operators] def spread16(c: Column): Column = {
    val a = c.cast(LongType).bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x33333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Z-value interleaving the low 16 bits of `x` and `y` (x takes
    * the even bits). Callers with wider domains should first quantize to
    * 16 bits (e.g. `col % 65536`, or a rank/bucket). */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Recover the dimension from a z-value (even bits → x, odd → y) — the
    * inverse used by tests and by consumers mapping z-ranges back to
    * bounding boxes. */
  def unspread16(z: Column, odd: Boolean): Column = {
    val a = (if (odd) shiftright(z.cast(LongType), 1) else z.cast(LongType))
      .bitwiseAND(lit(0x55555555L))
    val b = a.bitwiseOR(shiftright(a, 1)).bitwiseAND(lit(0x33333333L))
    val d = b.bitwiseOR(shiftright(b, 2)).bitwiseAND(lit(0x0F0F0F0FL))
    val e = d.bitwiseOR(shiftright(d, 4)).bitwiseAND(lit(0x00FF00FFL))
    e.bitwiseOR(shiftright(e, 8)).bitwiseAND(lit(0x0000FFFFL))
  }

  /** Cluster `df` for writing: range-partition on the z-value of
    * (`xCol`, `yCol`) and sort within partitions, so each output file
    * covers a compact (x, y) bounding box and min-max stats prune scans
    * filtered on either column. The helper column never reaches the
    * output. One shuffle (range exchange with sampled bounds) + a
    * per-partition sort — the same cost as sorting by any single column. */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
      nPartitions: Int): DataFrame = {
    require(nPartitions > 0, s"nPartitions must be positive: $nPartitions")
    df.withColumn("__z", zValue(col(xCol), col(yCol)))
      .repartitionByRange(nPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Hilbert curve distance of (`x`, `y`) in a 2^bits grid — the
    * jump-free alternative to `zValue`: consecutive key values are always
    * grid neighbors, so range-partitioned files get tighter bounding
    * boxes for the same shuffle (better min-max pruning on average; the
    * LayoutSpec measures both). Codegen'd iterative kernel
    * ([[graft.expressions.HilbertValue]]); the oracle replays it as a
    * bits-step recursive CTE. Quantize wider domains first, as with
    * zValue. */
  def hilbertValue(x: Column, y: Column, bits: Int = 16): Column =
    graft.expressions.HilbertValue.hilbertValue(x, y, bits)

  /** `clusterByZ` with the Hilbert key instead of Morton. */
  def clusterByHilbert(df: DataFrame, xCol: String, yCol: String,
      nPartitions: Int, bits: Int = 16): DataFrame = {
    require(nPartitions > 0, s"nPartitions must be positive: $nPartitions")
    df.withColumn("__h", hilbertValue(col(xCol), col(yCol), bits))
      .repartitionByRange(nPartitions, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
  }

  /** N-column Morton value: bit i of dimension d lands at bit i·N + d, so
    * every dimension's bits are interleaved at stride N — the direct
    * generalization of `zValue` (for N = 2 at 16 bits the two are
    * bit-identical; parity-tested). Each column contributes its low
    * `bitsPerDim` bits (mask, not clamp — quantize wider domains first,
    * see `clusterByZQuantized`). N · bitsPerDim ≤ 63 keeps the key a
    * positive long. The expression is a flat OR-fold of N · bitsPerDim
    * shift/mask terms — pure codegen'd int64 arithmetic, identically
    * expressible in oracle SQL (`zValueNSql`). */
  def zValueN(cols: Seq[Column], bitsPerDim: Int): Column = {
    val n = cols.size
    require(n >= 2, s"zValueN needs >= 2 columns, got $n")
    require(bitsPerDim > 0 && n * bitsPerDim <= 63,
      s"n * bitsPerDim must be in (0, 63]: $n * $bitsPerDim")
    cols.zipWithIndex.map { case (c, d) =>
      val masked = c.cast(LongType).bitwiseAND(lit((1L << bitsPerDim) - 1))
      (0 until bitsPerDim).map { i =>
        shiftleft(shiftright(masked, i).bitwiseAND(lit(1L)), i * n + d)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Default bit budget: 16 bits per dimension, shrunk so the interleaved
    * key stays in 63 bits (3 cols → 21 ≥ 16 → 16; 4 cols → 15). */
  def zValueN(cols: Seq[Column]): Column =
    zValueN(cols, math.min(16, 63 / cols.size))

  /** ANSI-SQL replay of `zValueN(cols, bitsPerDim)` — the oracle's side of
    * the bit-for-bit contract (DuckDB and Spark SQL share `& | << >>` on
    * BIGINT). */
  def zValueNSql(cols: Seq[String], bitsPerDim: Int): String = {
    val n = cols.size
    val mask = (1L << bitsPerDim) - 1
    cols.zipWithIndex.flatMap { case (c, d) =>
      (0 until bitsPerDim).map(i =>
        s"((((CAST($c AS BIGINT) & $mask) >> $i) & 1) << ${i * n + d})")
    }.mkString(" | ")
  }

  /** Equi-depth bucket of `c` against precomputed sorted `boundaries`:
    * the count of boundaries ≤ value (null → bucket 0). A linear
    * fold over an array literal — boundaries are ≤ 2^bits - 1 elements, so
    * for the pruning-relevant bucket counts (≤ 256 per dimension; file
    * pruning only needs ~(#files)^(1/N) cells per dim) this is a few
    * hundred codegen'd compares per row, no join and no window. */
  def quantileBucket(c: Column, boundaries: Seq[Double]): Column =
    aggregate(
      lit(boundaries.toArray),
      lit(0L),
      (acc, b) => acc + when(c.cast("double") >= b, 1L).otherwise(0L))

  /** N-column Z-order clustering with per-column EQUI-DEPTH quantization:
    * each column is mapped to its approx-quantile bucket (2^bitsPerDim
    * buckets, driver-side KB-scale boundary fetch) before interleaving, so
    * skewed / non-uniform / wide-domain columns (timestamps, ids, prices)
    * fill their bit range evenly instead of collapsing into a corner of
    * the curve — the same move as Delta/Iceberg OPTIMIZE ZORDER's range
    * ids. Cost: one approxQuantile pass per column (sampled scan) + one
    * range exchange + per-partition sort. Rows with nulls land in bucket
    * 0 of that dimension (min-max stats still cover them). */
  def clusterByZQuantized(df: DataFrame, colNames: Seq[String],
      nPartitions: Int, bitsPerDim: Int = 6): DataFrame = {
    require(nPartitions > 0, s"nPartitions must be positive: $nPartitions")
    require(colNames.size >= 2, s"need >= 2 columns: $colNames")
    require(bitsPerDim > 0 && colNames.size * bitsPerDim <= 63 && bitsPerDim <= 8,
      s"bitsPerDim out of range for ${colNames.size} cols: $bitsPerDim")
    val nB = 1 << bitsPerDim
    val probs = (1 until nB).map(_.toDouble / nB).toArray
    val buckets = colNames.map { cn =>
      val bounds = df.stat.approxQuantile(cn, probs, 0.001)
        .distinct.sorted.toSeq
      quantileBucket(col(cn), bounds)
    }
    df.withColumn("__z", zValueN(buckets, bitsPerDim))
      .repartitionByRange(nPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
