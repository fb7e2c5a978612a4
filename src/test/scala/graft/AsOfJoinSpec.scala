package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asofBackward picks the latest right row at or before each left time") {
    val trades = Seq(
      ("A", 10L, 100.0), ("A", 20L, 101.0), ("A", 30L, 102.0),
      ("B", 15L, 50.0)).toDF("sym", "t", "px")
    val quotes = Seq(
      ("A", 5L, 99.5), ("A", 20L, 100.5), ("A", 25L, 101.5),
      ("B", 99L, 1.0)).toDF("sym", "t", "bid")

    val out = AsOfJoin.asofBackward(trades, quotes, Seq("sym"), "t", Seq("bid"))
      .collect().map(r => (r.getAs[String]("sym"), r.getAs[Long]("t"),
        Option(r.getAs[java.lang.Long]("asof_time")).map(_.toLong),
        Option(r.getAs[java.lang.Double]("bid")).map(_.toDouble))).toSet

    assert(out == Set(
      ("A", 10L, Some(5L), Some(99.5)),
      ("A", 20L, Some(20L), Some(100.5)), // tie → at-or-before matches
      ("A", 30L, Some(25L), Some(101.5)),
      ("B", 15L, None, None)))            // no quote at or before → left join nulls
  }

  test("asofForward picks the earliest right row at or after each left time") {
    val trades = Seq(
      ("A", 10L, 100.0), ("A", 20L, 101.0), ("A", 30L, 102.0),
      ("B", 15L, 50.0)).toDF("sym", "t", "px")
    val quotes = Seq(
      ("A", 5L, 99.5), ("A", 20L, 100.5), ("A", 25L, 101.5),
      ("B", 3L, 1.0)).toDF("sym", "t", "bid")

    val out = AsOfJoin.asofForward(trades, quotes, Seq("sym"), "t", Seq("bid"))
      .collect().map(r => (r.getAs[String]("sym"), r.getAs[Long]("t"),
        Option(r.getAs[java.lang.Long]("asof_time")).map(_.toLong),
        Option(r.getAs[java.lang.Double]("bid")).map(_.toDouble))).toSet

    assert(out == Set(
      ("A", 10L, Some(20L), Some(100.5)),
      ("A", 20L, Some(20L), Some(100.5)), // tie → at-or-after matches
      ("A", 30L, None, None),             // nothing after → left join nulls
      ("B", 15L, None, None)))            // only an earlier quote → null
  }

  test("asofBackward rejects colliding value column names") {
    val df = Seq(("A", 1L, 1.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      AsOfJoin.asofBackward(df, df, Seq("k"), "t", Seq("v"))
    }
  }
}
