package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewOps

class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
  private lazy val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("saltedJoin equals the plain join (inner and left)") {
    // skew the key: 80% of rows onto one key
    val skewed = li.withColumn("k", when(col("l_linenumber") <= 4, 0L)
      .otherwise(col("l_orderkey")))
    val dim = orders.select(col("o_orderkey").as("k"), col("o_orderstatus")).limit(500)
    for (jt <- Seq("inner", "left")) {
      val plain = skewed.join(dim, Seq("k"), jt)
        .groupBy("k").count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val salted = SkewOps.saltedJoin(skewed, dim, Seq("k"), saltFactor = 8, jt)
        .groupBy("k").count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(salted == plain, s"join type $jt")
    }
  }

  test("saltedJoin rejects right-preserving join types") {
    intercept[IllegalArgumentException] {
      SkewOps.saltedJoin(li, orders, Seq("l_orderkey"), 4, "right")
    }
  }

  test("saltedSum equals plain aggregation") {
    val plain = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = SkewOps.saltedSum(li, Seq("l_returnflag"), "l_quantity", 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, v) => assert(math.abs(v - plain(k)) < 1e-6) }
  }
}
