package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
  private lazy val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
  private lazy val urgent = orders
    .filter(col("o_orderpriority") === "1-URGENT")
    .select("o_orderkey", "o_custkey")

  test("preFilterJoin equals the plain inner join") {
    val plain = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"))
      .select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet
    val bloomed = BloomJoin.preFilterJoin(
        li, urgent, "l_orderkey", "o_orderkey", expectedItems = 10000L)
      .select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet
    assert(bloomed == plain)
  }

  test("preFilterJoin equals the plain left_semi join; rejects preserving types") {
    val plain = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet
    val bloomed = BloomJoin.preFilterJoin(
        li, urgent, "l_orderkey", "o_orderkey", 10000L, joinType = "left_semi")
      .select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet
    assert(bloomed == plain)
    intercept[IllegalArgumentException] {
      BloomJoin.preFilterJoin(li, urgent, "l_orderkey", "o_orderkey", 10000L,
        joinType = "left")
    }
  }

  test("antiJoin equals the plain left_anti join, including null fact keys") {
    val factWithNulls = li.select(
      when(col("l_linenumber") === 7, lit(null)).otherwise(col("l_orderkey"))
        .as("l_orderkey"),
      col("l_linenumber"))
    val dim = urgent.select("o_orderkey")
    val plain = factWithNulls
      .join(dim, col("l_orderkey") === dim("o_orderkey"), "left_anti")
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getInt(1)))
    val bloomed = BloomJoin.antiJoin(
        factWithNulls, dim, "l_orderkey", "o_orderkey", expectedItems = 10000L)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getInt(1)))
    assert(bloomed.sorted.toSeq == plain.sorted.toSeq)
    // null keys never match an equi-anti-join, so every null row survives
    val nNull = plain.count(_._1 == -1L)
    assert(nNull > 0 && bloomed.count(_._1 == -1L) == nNull)
  }

  test("the probe actually prunes: pre-filtered fact is ~dim-selectivity sized") {
    val bloom = BloomJoin.buildFilter(urgent, "o_orderkey", 10000L, fpp = 0.01)
    val kept = li.filter(
      coalesce(BloomJoin.mightContain(col("l_orderkey"), bloom), lit(false))).count()
    val matching = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi").count()
    // kept = true matches + false positives; at 1% fpp the FP surplus must
    // stay far below the pruned mass (urgent is ~20% of orders)
    assert(kept >= matching)
    assert(kept <= matching + (li.count() * 0.05).toLong,
      s"bloom kept $kept vs $matching true matches — not pruning")
  }

  test("string keys probe with putString parity") {
    val dim = Seq("alpha", "beta", "gamma").toDF("k")
    val fact = Seq("alpha", "delta", "beta", "epsilon", "zeta").toDF("k")
    val joined = BloomJoin.preFilterJoin(fact, dim.withColumnRenamed("k", "dk"),
      "k", "dk", expectedItems = 100L)
    assert(joined.select("k").as[String].collect().sorted.toSeq == Seq("alpha", "beta"))
  }
}
