package graft


/** Plan-inspection entry point: print the formatted physical plan (and
  * optionally row counts) of any named query from the driver contract.
  *
  *   sbt "runMain graft.Explain q_simhash_near_dup /root/testdata/sf0.01"
  *   sbt "runMain graft.Explain q_topk /root/testdata/sf0.01 count"
  *
  * Reading plans is part of the engine's dev loop: `PushedFilters` on the
  * scans, `WholeStageCodegen` spans, exchange reuse, and join strategy are
  * the things that decide whether a query survives a 100× scale-up.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Explain <queryName|all> <sfDir> [count]")
    val (name, sfDir) = (args(0), args(1))
    val spark = Main.session("graft-explain")
    try {
      val qs = SparkEntry.queries
      val names =
        if (name == "all") qs.keys.toSeq.sorted
        else { require(qs.contains(name), s"unknown query: $name"); Seq(name) }
      names.foreach { n =>
        println(s"==== $n ====")
        val df = qs(n)(spark, sfDir)
        df.explain("formatted")
        if (args.length > 2 && args(2) == "count") println(s"rows: ${df.count()}")
      }
    } finally spark.stop()
  }
}
