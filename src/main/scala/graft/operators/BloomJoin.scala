package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.util.sketch.BloomFilter

import graft.expressions.BloomMightContain

/** Bloom-filter pre-join: probe a sketch of the dimension side's keys
  * BEFORE the fact side's shuffle, so rows that cannot possibly match never
  * leave their input partition.
  *
  * Why this exists next to broadcast joins: a broadcast join needs the
  * whole dimension ROW SET on every executor; the bloom pre-filter needs
  * only a bit array sized by key COUNT (~1.2 MB per million keys at 1%
  * fpp), so it still applies when the dimension is 100× past the broadcast
  * threshold. At 100 TB the win is shuffle bytes: a selective dimension
  * (say 2% of fact keys survive) cuts the fact-side exchange by ~98% at
  * the cost of one scan of the dimension keys and a per-row codegen'd
  * probe. Spark's own runtime row-group filtering
  * (spark.sql.optimizer.runtime.bloomFilter.*) makes the same trade inside
  * AQE when statistics allow; this operator is the explicit,
  * planner-independent form with a caller-controlled size/fpp budget.
  *
  * Correctness does not depend on the sketch: false positives only let
  * extra rows through to the EXACT join that always follows; false
  * negatives cannot occur. Supported shapes:
  *  - inner / left_semi: fact pre-filtered to probable matches, then joined;
  *  - left_anti: bloom-definite non-matches bypass the join entirely (a
  *    "definitely absent" verdict is exact), only probable matches pay the
  *    shuffle for the exact anti check.
  */
object BloomJoin {

  /** Build + torrent-broadcast a bloom filter of `dim`'s `key` column.
    * `expectedItems` should be an upper bound on DISTINCT keys —
    * overestimating costs bits, underestimating costs false positives
    * (which cost shuffle bytes, never correctness). Reuse the returned
    * broadcast across joins against the same dimension snapshot. */
  def buildFilter(dim: DataFrame, key: String, expectedItems: Long,
      fpp: Double = 0.01): Broadcast[BloomFilter] = {
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1): $fpp")
    val bf = dim.stat.bloomFilter(key, expectedItems, fpp)
    dim.sparkSession.sparkContext.broadcast(bf)
  }

  /** `might_contain` probe column; null key → null. */
  def mightContain(key: Column, bloom: Broadcast[BloomFilter]): Column =
    GraftColumnBridge.column(
      BloomMightContain(GraftColumnBridge.expression(key), bloom))

  /** Inner or left_semi equi-join with the fact side pre-filtered through a
    * bloom of the dimension keys. Result equals the plain join. */
  def preFilterJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, expectedItems: Long,
      fpp: Double = 0.01, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_semi", "leftsemi").contains(joinType.toLowerCase),
      s"preFilterJoin supports inner/left_semi (filtering the fact side drops " +
        s"rows a preserving join must keep), not $joinType")
    val bloom = buildFilter(dim, dimKey, expectedItems, fpp)
    // null-safe: a null fact key probes to null; inner/semi joins drop it
    // either way, so coalesce(false) just makes the prune explicit
    fact.filter(coalesce(mightContain(col(factKey), bloom), lit(false)))
      .join(dim, col(factKey) === dim(dimKey), joinType)
  }

  /** Left-anti equi-join with a bloom bypass: fact rows whose key is
    * DEFINITELY absent from `dim` (bloom says no — exact by construction)
    * skip the shuffle entirely; only probable matches run the real anti
    * join to weed out false positives. Null fact keys match nothing in an
    * equi-anti-join, so they take the bypass. Result equals the plain
    * left_anti join, row-for-row. */
  def antiJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bloom = buildFilter(dim, dimKey, expectedItems, fpp)
    val probable = coalesce(mightContain(col(factKey), bloom), lit(false))
    val bypass = fact.filter(!probable)
    val checked = fact.filter(probable)
      .join(dim, col(factKey) === dim(dimKey), "left_anti")
    bypass.unionByName(checked)
  }
}
