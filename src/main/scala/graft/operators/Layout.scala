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
}
