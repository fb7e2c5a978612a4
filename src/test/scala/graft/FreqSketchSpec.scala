package graft

import org.apache.spark.sql.functions._

import graft.GraftExtensions
import graft.expressions.FreqSketch.freqSketch

class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic skewed stream: term "t<i>" occurs i*i times, i = 1..20
    * (n = 2870), shuffled by element hash so partition boundaries don't
    * align with term runs. */
  private def skewed = {
    val rows = (1 to 20).flatMap(i => Seq.fill(i * i)(s"t$i"))
    rows.sortBy(_.hashCode).toDF("term").repartition(13)
  }

  private def exactCounts = (1 to 20).map(i => s"t$i" -> (i.toLong * i)).toMap

  test("exact regime: capacity >= distinct terms reproduces groupBy counts") {
    val got = skewed.agg(freqSketch(col("term"), 64).as("m"))
      .select(explode(col("m"))).as[(String, Long)].collect().toMap
    assert(got == exactCounts)
  }

  test("approximate regime honors the Misra-Gries bounds across 13-partition merges") {
    val k = 5
    val n = exactCounts.values.sum
    val err = n.toDouble / (k + 1) // 478.3
    val got = skewed.agg(freqSketch(col("term"), k).as("m"))
      .select(explode(col("m"))).as[(String, Long)].collect().toMap
    assert(got.size <= k)
    // every estimate undercounts by at most n/(k+1)
    got.foreach { case (t, est) =>
      val truth = exactCounts(t)
      assert(est <= truth, s"$t overcounted: $est > $truth")
      assert(truth - est <= err, s"$t undercounted past the bound: $truth - $est > $err")
    }
    // every heavy term (truth > n/(k+1)) survives: t20 = 400 is under the
    // bound here, so go by the actual threshold
    exactCounts.filter(_._2 > err).keys.foreach(t =>
      assert(got.contains(t), s"heavy term $t missing from sketch"))
  }

  test("tiny capacity on an all-distinct stream stays bounded and non-negative") {
    val df = (1 to 500).map(i => s"u$i").toDF("term").repartition(7)
    val got = df.agg(freqSketch(col("term"), 2).as("m"))
      .select(explode(col("m"))).as[(String, Long)].collect()
    assert(got.length <= 2)
    assert(got.forall(_._2 >= 1L))
  }

  test("nulls are identity; empty group yields an empty map; groupBy works per key") {
    val df = Seq(
      (1, Some("a")), (1, Some("a")), (1, None), (1, Some("b")),
      (2, None), (2, None)
    ).toDF("g", "term")
    val got = df.groupBy("g").agg(freqSketch(col("term"), 8).as("m"))
      .select(col("g"), col("m")).as[(Int, Map[String, Long])]
      .collect().toMap
    assert(got(1) == Map("a" -> 2L, "b" -> 1L))
    assert(got(2) == Map.empty[String, Long])
  }

  test("SQL registry form matches the Column API") {
    GraftExtensions.register(spark)
    skewed.createOrReplaceTempView("fs_terms")
    val viaSql = spark.sql(
      "SELECT freq_sketch(term, 64) AS m FROM fs_terms")
      .select(explode(col("m"))).as[(String, Long)].collect().toMap
    assert(viaSql == exactCounts)
  }

  test("map-side partial aggregation: plan shows ObjectHashAggregate partial pairs") {
    val plan = skewed.agg(freqSketch(col("term"), 64))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate in:\n$plan")
  }
}
