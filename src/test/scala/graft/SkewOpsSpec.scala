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

  test("rowSalt spreads a constant-valued hot group over multiple salts") {
    // the degenerate case for content-derived salts: every row identical
    val hot = Seq.fill(1000)(("hotkey", 0.0)).toDF("k", "v").repartition(4)
    val nSalts = hot.select(SkewOps.rowSalt(8).as("s")).distinct().count()
    assert(nSalts >= 2, s"constant-value group got $nSalts salt(s) — no spread")
    // and the salted aggregate over it still reduces to one exact group
    val out = SkewOps.saltedSum(hot.withColumn("v", lit(1.0)), Seq("k"), "v", 8).collect()
    assert(out.length == 1 && out.head.getDouble(1) == 1000.0)
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
