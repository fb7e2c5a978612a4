package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed (the
  * classic: one hot customer/gene/shingle key holding >1% of a 100 TB
  * fact table, stalling its shuffle partition for hours).
  *
  * AQE's skew-join split handles sort-merge skew automatically; salting is
  * the explicit, planner-independent fallback — and the only option when
  * the skew is in an aggregation key rather than a join.
  */
object SkewOps {

  /** Row-unique salt in [0, saltFactor): hashes the row's position
    * (partition id is embedded in monotonically_increasing_id), NOT its
    * content. A content-derived salt has a degenerate failure mode exactly
    * when salting matters most — a hot group whose rows are identical (the
    * "billion zero rows" case) hashes to ONE salt and nothing spreads.
    * Position-derived salt spreads any hot group evenly regardless of
    * content. The salt value never reaches results (joins carry all salts
    * on the replicated side; aggregations re-reduce over it), so its
    * per-run stability is irrelevant to correctness. */
  private[graft] def rowSalt(saltFactor: Int): Column =
    pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor))

  /** Salted equi-join on `keys`: the big (left) side gets a row-unique
    * salt in [0, saltFactor); the small (right) side is
    * replicated saltFactor times, so each hot key fans out over saltFactor
    * shuffle partitions instead of one. Results equal the plain join.
    *
    * Use when `right` is too big to broadcast but small enough to
    * replicate saltFactor×; join types preserving unmatched right rows
    * (right/full outer) are rejected — replication would duplicate them.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive: $saltFactor")
    require(Seq("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")
        .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi joins, not $joinType")
    val saltedLeft = left.withColumn("__salt", rowSalt(saltFactor))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit((saltFactor - 1).toLong))))
    saltedLeft.join(saltedRight, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation with a salted first phase —
    * for aggregations whose group key is skewed AND whose aggregate
    * decomposes (sum/count/min/max). Spark's hash aggregate already does
    * map-side partial aggregation; this adds an extra reduce tier so a
    * single hot group's partials spread over saltFactor reducers first.
    */
  def saltedSum(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive: $saltFactor")
    df.withColumn("__salt", rowSalt(saltFactor))
      .groupBy((groupCols :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }
}
