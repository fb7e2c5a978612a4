package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — the operator the reference conspicuously
  * lacks: eggv annotates variants to genes by transcript-ID equality even
  * though its gene table carries start/end coordinates
  * (eggv/process.py:219-221; SURVEY.md §2.7 "ABSENT"). Positional
  * annotation is the natural generalization, and the naive formulation is
  * an inequality join — O(|points|·|intervals|) nested loop at scale.
  *
  * Scale shape: bin the coordinate space. Intervals are exploded to every
  * bin they overlap; points map to exactly one bin; the join becomes an
  * equi-join on (partition keys, bin) followed by the exact range filter.
  * Each matching (point, interval) pair meets in exactly one bin — the
  * point's — so no dedup pass is needed. Pick binSize near the typical
  * interval length: larger bins → fewer interval replicas but fatter
  * buckets; smaller bins → the reverse.
  */
object IntervalJoin {

  /** Join each left row (point `pointCol`) to every right row whose
    * [startCol, endCol] interval contains it (inclusive), matching
    * `partitionKeys` exactly (e.g. chromosome). Inner join; columns of
    * both sides are preserved. */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      partitionKeys: Seq[String], binSize: Long = 100000L): DataFrame = {
    require(binSize > 0, s"binSize must be positive: $binSize")

    def bin(c: Column): Column = floor(c / lit(binSize)).cast("long")

    val binnedPoints = points.withColumn("__bin", bin(col(pointCol)))
    // one replica of each interval per overlapped bin
    val binnedIntervals = intervals.withColumn("__bin",
      explode(sequence(bin(col(startCol)), bin(col(endCol)))))

    val joinKeys = partitionKeys :+ "__bin"
    binnedPoints
      .join(binnedIntervals, joinKeys)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
