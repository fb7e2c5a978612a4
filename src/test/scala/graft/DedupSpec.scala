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
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("simhashNearDupPairs matches brute force in BOTH blocking regimes") {
    // real corpus + mutated copies so pairs exist at several distances
    val docs0 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val corpus = docs0.union(docs0.select(($"doc_id" + 1000000L).as("doc_id"),
      concat_ws(" ", $"text", lit("tail mutation")).as("text")))
    val sigs = Dedup.simhash(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    for (maxHamming <- Seq(3, 6, 8)) { // pigeonhole, multi-index b=1, b=2
      val brute = (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs
        if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= maxHamming
      } yield (ia, ib)).toSet
      val got = Dedup.simhashNearDupPairs(corpus, "doc_id", "text", maxHamming)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute,
        s"maxHamming=$maxHamming: missed=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    }
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

  /** Count data-pass JOBS started while `body` runs, with AQE turned off
    * for the duration — under AQE one action fans out into a job per
    * shuffle-stage materialization, which measures planner mechanics, not
    * algorithmic passes. Broadcast-exchange build jobs are excluded too:
    * they are how Spark executes any broadcast join, not an extra pass.
    * Listener bus is async — poll until stable. */
  private val seenJobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private def countJobsNoAqe[T](body: => T): (T, Int) = {
    seenJobs.clear()
    val counter = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val stages = j.stageInfos.map(_.name).mkString(";")
        seenJobs.add(s"job ${j.jobId}: $stages")
        // broadcast-exchange builds run in a CompletableFuture via
        // withThreadLocalCaptured — their result stage carries that frame
        if (!stages.contains("withThreadLocalCaptured")) counter.incrementAndGet()
      }
    }
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = body
      var prev = -1
      while (counter.get != prev) { prev = counter.get; Thread.sleep(300) }
      (out, counter.get)
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }

  test("connectedComponents runs ONE job per round (convergence folded into the agg)") {
    // chain 1-2-3-4-5-6: min-label propagation needs 5 rounds to move
    // label 1 to vertex 6, +1 round to detect no change = 6 rounds
    val edges = (1L until 6L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val vertices = (1L to 6L).toDF("id")
    val (cc, jobs) = countJobsNoAqe {
      Dedup.connectedComponents(edges, vertices)
    }
    // each round's lazy localCheckpoint is materialized by the same count
    // action that reads the convergence flag — rounds jobs, nothing else
    // (the round-2 shape ran 2 jobs/round: eager checkpoint + a
    // labels-vs-prev join count)
    assert(jobs == 6, s"expected 6 jobs (one per round), saw $jobs:\n${seenJobs.toArray.mkString("\n")}")
    val m = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.values.toSet == Set(1L) && m.size == 6)
  }

  test("connectedComponents with a reliable checkpoint dir: same result, files on disk") {
    val dir = java.nio.file.Files.createTempDirectory("cc-ck").toString
    val edges = (1L until 6L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val vertices = (1L to 6L).toDF("id")
    val (cc, jobs) = countJobsNoAqe {
      Dedup.connectedComponents(edges, vertices, checkpointDir = Some(dir))
    }
    val m = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.values.toSet == Set(1L) && m.size == 6)
    // durability costs one checkpoint-WRITE job per round on top of the
    // round's count job (ReliableRDDCheckpointData writes in its own job)
    assert(jobs == 12, s"expected 12 jobs (count + checkpoint-write per round), saw $jobs:\n${seenJobs.toArray.mkString("\n")}")
    val ckFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(ckFiles > 0, "no reliable checkpoint files written")
  }

  test("connectedComponents warns (not wrong-silently) past maxIter but still returns") {
    val edges = (1L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val vertices = (1L to 8L).toDF("id")
    // maxIter below the diameter: output is a SPLIT component (documented)
    val cc = Dedup.connectedComponents(edges, vertices, maxIter = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 8)
    assert(cc.values.toSet != Set(1L), "2 rounds cannot close a diameter-7 chain")
  }
}
