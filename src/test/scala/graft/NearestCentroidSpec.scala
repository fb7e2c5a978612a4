package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.expressions.NearestCentroid

/** The pruned centroid kernels must be EXACTLY the brute scan: the
  * triangle-inequality group bound may only skip provable losers, never
  * change a winner or a tie resolution. These specs drive both the
  * interpreted and codegen paths over a pruner-active list count. */
class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random centroids: L=200 (pruner active: ≥ 128),
  // dim=8, values from a hash mix — clustered enough for real pruning
  private def mkCentroids(l: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(l)(i => Array.tabulate(dim)(d =>
      (((i * 1103515245L + d * 12345L + 7L) % 1000L).toDouble / 250.0) +
        (i % 10).toDouble))

  private def mkVectors(n: Int, dim: Int): Seq[(Long, Array[Float])] =
    (0 until n).map(i => (i.toLong, Array.tabulate(dim)(d =>
      ((((i + 31L) * 2654435761L + d * 97L) % 1000L).toFloat / 250.0f) +
        (i % 10).toFloat)))

  private def bruteArr(v: Array[Float], centroids: Array[Array[Double]]): Int = {
    val normSq = centroids.map(_.map(x => x * x).sum)
    NearestCentroid.compute(
      new GenericArrayData(v.map(_.toDouble)), centroids, normSq, isFloat = false)
  }

  test("pruned argmin === brute argmin for every vector (L=200, pruner active)") {
    val centroids = mkCentroids(200, 8)
    assert(NearestCentroid.buildPruner(centroids) != null)
    val df = mkVectors(500, 8).toDF("vec_id", "v")
    val got = df.select($"vec_id",
      NearestCentroid.nearestCentroid($"v", centroids).as("cid"))
      .orderBy("vec_id").as[(Long, Int)].collect()
    mkVectors(500, 8).foreach { case (id, v) =>
      assert(got(id.toInt)._2 == bruteArr(v, centroids), s"vec $id")
    }
  }

  test("top-t kernel === the cross-join + window formulation, order included") {
    val centroids = mkCentroids(200, 8)
    val df = mkVectors(300, 8).toDF("vec_id", "v")
    val kernel = df.select($"vec_id",
      NearestCentroid.nearestCentroidsTop($"v", centroids, 5).as("cids"))
      .orderBy("vec_id").as[(Long, Seq[Int])].collect()
    // reference: explicit distances per (vector, centroid), window top-5
    val cents = centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("cid", "centroid")
    val ref = df.crossJoin(cents)
      .select($"vec_id", $"cid",
        (aggregate(zip_with($"centroid", $"centroid", (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x) -
          lit(2.0) * aggregate(zip_with($"v", $"centroid", (x, y) => x * y),
            lit(0.0), (acc, x) => acc + x)).as("d"))
      .withColumn("pr", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"vec_id")
          .orderBy($"d".asc, $"cid".asc)))
      .filter($"pr" <= 5)
      .groupBy($"vec_id").agg(collect_list(struct($"pr", $"cid")).as("l"))
      .select($"vec_id", expr("transform(array_sort(l), x -> x.cid)").as("cids"))
      .orderBy("vec_id").as[(Long, Seq[Int])].collect()
    assert(kernel.length == ref.length)
    kernel.zip(ref).foreach { case ((idK, csK), (idR, csR)) =>
      assert(idK == idR)
      assert(csK == csR, s"vec $idK: kernel $csK vs window $csR")
    }
  }

  test("exact ties resolve to the lower index through the pruner") {
    // duplicate centroid planted far from the seeds' stride positions:
    // indices 40 and 170 are identical, so any vector nearest to one has
    // an exact tie — the winner must be 40 regardless of group order
    val centroids = mkCentroids(200, 8)
    centroids(170) = centroids(40).clone()
    val v = centroids(40).map(x => (x + 1e-3).toFloat)
    val df = Seq((0L, v)).toDF("vec_id", "v")
    val top = df.select(
      NearestCentroid.nearestCentroidsTop($"v", centroids, 3).as("cids"))
      .as[Seq[Int]].collect()(0)
    assert(top.head == 40, s"tie must break low: $top")
    assert(top.contains(170), s"the twin must rank second: $top")
    assert(df.select(NearestCentroid.nearestCentroid($"v", centroids).as("c"))
      .as[Int].collect()(0) == 40)
  }

  test("small list counts stay on the brute path and agree") {
    val centroids = mkCentroids(16, 8)
    assert(NearestCentroid.buildPruner(centroids) == null)
    val df = mkVectors(100, 8).toDF("vec_id", "v")
    val got = df.select($"vec_id",
      NearestCentroid.nearestCentroid($"v", centroids).as("cid"),
      NearestCentroid.nearestCentroidsTop($"v", centroids, 1).as("top1"))
      .as[(Long, Int, Seq[Int])].collect()
    got.foreach { case (id, cid, top1) =>
      assert(top1 == Seq(cid), s"vec $id")
    }
  }
}
