package graft

import org.apache.spark.sql.functions._
import graft.io.Sinks

class BucketingSpec extends SparkSpec {

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // in-memory catalog forgets tables between sessions but the managed
    // location survives — clear it so reruns don't hit LOCATION_ALREADY_EXISTS
    val loc = new java.io.File(s"spark-warehouse/$name")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(loc)
    }
  }

  test("co-bucketed tables join without a shuffle exchange") {
    dropTable("li_bkt"); dropTable("o_bkt")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice")

    Sinks.writeBucketed(li, "li_bkt", 4, Seq("l_orderkey"))
    Sinks.writeBucketed(o, "o_bkt", 4, Seq("o_orderkey"))

    val joined = spark.table("li_bkt")
      .join(spark.table("o_bkt").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"),
      s"bucketed join should be shuffle-free, got:\n$physical")
    // and it computes the right thing
    assert(joined.count() ==
      li.join(o, col("l_orderkey") === col("o_orderkey")).count())
  }
}
