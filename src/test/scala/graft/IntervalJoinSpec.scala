package graft

import graft.operators.IntervalJoin

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval matches the naive inequality join exactly") {
    val points = Seq(
      ("chr1", 5L), ("chr1", 100L), ("chr1", 250000L),
      ("chr2", 100L), ("chr1", 99999L), ("chr1", 100000L))
      .toDF("chrom", "pos")
    val intervals = Seq(
      ("chr1", 0L, 100L, "a"),          // contains 5, 100 (inclusive ends)
      ("chr1", 90000L, 110000L, "b"),   // spans a bin boundary: 99999, 100000
      ("chr1", 240000L, 260000L, "c"),  // 250000
      ("chr2", 0L, 50L, "d"))           // chr2@100 matches nothing
      .toDF("chrom", "start", "end", "name")

    val binned = IntervalJoin.pointInInterval(
        points, intervals, "pos", "start", "end", Seq("chrom"), binSize = 100000L)
      .select("chrom", "pos", "name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet

    val naive = points.join(intervals, Seq("chrom"))
      .filter($"pos" >= $"start" && $"pos" <= $"end")
      .select("chrom", "pos", "name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet

    assert(binned == naive)
    assert(binned == Set(
      ("chr1", 5L, "a"), ("chr1", 100L, "a"),
      ("chr1", 99999L, "b"), ("chr1", 100000L, "b"),
      ("chr1", 250000L, "c")))
  }

  test("no duplicate pairs when an interval spans many bins") {
    val points = Seq(("x", 500L)).toDF("k", "pos")
    val intervals = Seq(("x", 0L, 10000L, "wide")).toDF("k", "start", "end", "name")
    val out = IntervalJoin.pointInInterval(
      points, intervals, "pos", "start", "end", Seq("k"), binSize = 100L)
    assert(out.count() == 1)
  }
}
