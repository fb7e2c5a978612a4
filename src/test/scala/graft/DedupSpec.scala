package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again"), // near dup of 1
    (4L, "completely different content about spark query engines at scale"),
    (5L, "unrelated text with zero overlap whatsoever in any shingle")
  ).toDF("doc_id", "text")

  test("exactDedup keeps the min-id row per content") {
    val kept = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L))
    val groups = Dedup.exactDupGroups(docs, "doc_id", "text")
      .filter($"n_copies" > 1).collect()
    assert(groups.length == 1 && groups(0).getAs[Long]("keeper_id") == 1L)
  }

  test("minhashNearDupPairs finds exact+near dups, not unrelated docs") {
    // 16 bands × 2 rows: detection prob at jaccard≈0.54 is 1-(1-0.54²)¹⁶≈0.996
    // (8×4 would be a coin flip); deterministic either way — these params find it
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        k = 32, bands = 16, shingleN = 3, minJaccard = 0.5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))   // identical → jaccard 1.0
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // 1-word change
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("jaccardPairs computes exact shingle jaccard") {
    // doc 1 vs 3: 10 3-gram shingles each, differing in the 3 containing
    // dog/cat → 7 shared, union 13 → jaccard 7/13
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
        shingleN = 3, minJaccard = 0.1)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("jaccard"))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(math.abs(pairs((1L, 3L)) - 7.0 / 13.0) < 1e-12)
  }

  test("simhash: identical docs hash equal; near dups within small hamming") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sh(1L) == sh(2L))
    val ham13 = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    val ham14 = java.lang.Long.bitCount(sh(1L) ^ sh(4L))
    assert(ham13 < ham14, s"near-dup hamming $ham13 should be < unrelated $ham14")
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 16)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("connectedComponents: chain, pair, isolated vertex") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val vertices = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val cc = Dedup.connectedComponents(edges, vertices)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("connectedComponents converges on a long chain (diameter > 2)") {
    val n = 12L
    val edges = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val vertices = (1L to n).toDF("id")
    val cc = Dedup.connectedComponents(edges, vertices)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet == Set(1L) && cc.size == n)
  }
}
