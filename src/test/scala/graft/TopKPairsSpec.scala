package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.TopKPairs.topKPairs

/** Bounded per-group top-k aggregate: bit-identity with the rank-window
  * formulation it replaces (both directions, ties included), partition
  * invariance (the map-side partial + merge path), and the bounded-state
  * contract. */
class TopKPairsSpec extends SparkSpec {

  private def candidates = {
    import spark.implicits._
    // 40 groups × 200 candidates, engineered score ties inside groups
    (0 until 40).flatMap { g =>
      (0 until 200).map { i =>
        (g.toLong, (g * 1000 + i).toLong, ((i * 7919) % 50) / 50.0)
      }
    }.toDF("g", "id", "score")
  }

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int,
      smallest: Boolean) = {
    val ord = if (smallest) Seq(col("score").asc, col("id").asc)
      else Seq(col("score").desc, col("id").asc)
    df.withColumn("rank",
        row_number().over(Window.partitionBy(col("g")).orderBy(ord: _*)))
      .filter(col("rank") <= k)
      .select("g", "rank", "id", "score")
  }

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int,
      smallest: Boolean) =
    df.groupBy(col("g"))
      .agg(topKPairs(col("score"), col("id"), k, smallest).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("t.id").as("id"), col("t.score").as("score"))

  test("bit-identical to the rank window, smallest and largest, ties included") {
    for (smallest <- Seq(true, false); k <- Seq(1, 7, 64)) {
      val w = viaWindow(candidates, k, smallest).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).sorted
      val a = viaAgg(candidates, k, smallest).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).sorted
      assert(a.toSeq == w.toSeq, s"smallest=$smallest k=$k diverged")
    }
  }

  test("partition-invariant: repartitioned input gives the identical result") {
    val base = viaAgg(candidates, 10, smallest = false).collect()
      .map(_.toSeq).sortBy(_.toString)
    val re = viaAgg(candidates.repartition(13), 10, smallest = false).collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(base.toSeq == re.toSeq)
  }

  test("k past the group size returns the whole group, best-first") {
    import spark.implicits._
    val small = Seq((1L, 10L, 0.3), (1L, 11L, 0.9), (1L, 12L, 0.9))
      .toDF("g", "id", "score")
    val rows = viaAgg(small, 100, smallest = false).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq((1, 11L, 0.9), (2, 12L, 0.9), (3, 10L, 0.3)))
  }

  test("null scores and ids are skipped; empty group evaluates empty") {
    import spark.implicits._
    val df = Seq((1L, Some(10L), Some(0.5)), (1L, None, Some(0.9)),
      (1L, Some(12L), None), (2L, None, None))
      .toDF("g", "id", "score")
    val out = df.groupBy(col("g"))
      .agg(topKPairs(col("score"), col("id"), 5, smallest = false).as("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1).length).toMap
    assert(out(1L) == 1 && out(2L) == 0)
  }

  test("reachable from SQL via the registry") {
    GraftExtensions.register(spark)
    candidates.createOrReplaceTempView("topk_cands")
    val rows = spark.sql(
      "SELECT g, top_k_pairs(score, id, 3, false) AS top FROM topk_cands GROUP BY g")
      .selectExpr("g", "size(top) AS n", "top[0].id AS best")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.length == 40 && rows.forall(_._2 == 3))
  }

  test("the aggregation runs as ObjectHashAggregate with a partial pass") {
    val plan = viaAgg(candidates, 5, smallest = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    // two aggregate operators around one exchange = map-side partial
    assert(plan.split("ObjectHashAggregate").length >= 3, plan)
  }
}
