package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph rank over the crawl's edge list — the classic
  * random-surfer iteration (`r' = (1-d) + d·Σ r/outdeg` over in-edges,
  * the un-normalized per-node form) used to weight frontier scheduling
  * and to carry page authority into curation sampling. Operates on the
  * `(from_url, to_url)` edges [[graft.io.Warc.frontierLinks]] /
  * [[graft.io.Warc.redirectEdges]] emit; parallel edges count with
  * multiplicity (a page linking twice votes twice); nodes with no
  * out-edges contribute nothing (the simple dangling treatment —
  * documented, deterministic).
  *
  * Scale shape: each iteration is one equi-join of edges to ranks on
  * `src` plus one aggregate shuffle on `dst` — both keyed on the URL,
  * so a cluster co-partitions edges once and reuses the partitioning
  * across iterations; the rank side is nodes-sized, edges-sized work
  * never re-reads the archive. For a handful of iterations the plan
  * lineage is fine as-is; callers running tens of iterations should
  * checkpoint/persist `ranks` between rounds (lineage depth, not
  * correctness). */
object LinkRank {

  def pageRank(edges: DataFrame, iters: Int,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    val e = edges.select(col("from_url").as("src"), col("to_url").as("dst"))
    val nodes = e.select(col("src").as("url"))
      .union(e.select(col("dst").as("url"))).distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var ranks = nodes.withColumn("rank", lit(1.0))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("url", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("url"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("url").agg(sum(col("c")).as("in_rank"))
      ranks = nodes.join(contribs, Seq("url"), "left")
        .select(col("url"),
          (lit(1 - damping) +
            lit(damping) * coalesce(col("in_rank"), lit(0.0))).as("rank"))
    }
    ranks
  }
}
