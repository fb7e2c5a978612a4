package graft

import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native cosine kernel === the declarative double-fold formulation (bit parity)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = e.select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = e.select($"vec_id".as("ib"), $"embedding".as("vb"))
    // every ordered pair over 40 vectors: 1600 exact comparisons
    val mismatches = a.filter($"ia" < 40).crossJoin(b.filter($"ib" < 40))
      .select(VF.cosine($"va", $"vb").as("native"),
        VF.cosineHof($"va", $"vb").as("hof"))
      .filter(!($"native" <=> $"hof"))
      .count()
    assert(mismatches == 0L)
    // null semantics parity: zero vector, length mismatch, null element
    val edge = Seq(
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f)),
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))
    ).toDF("a", "b")
    val got = edge.select(VF.cosine($"a", $"b").as("n"), VF.cosineHof($"a", $"b").as("h"))
      .collect()
    got.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1)))
  }

  test("cosine/dot/norm on known vectors") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 1.0f), Array(1.0f, 1.0f)),
      (Array(3.0f, 4.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val cos = df.select(VF.cosine($"a", $"b")).as[Double].collect()
    assert(cos(0) == 0.0)
    assert(math.abs(cos(1) - 1.0) < 1e-15)
    assert(math.abs(cos(2) - 1.0) < 1e-15)
    assert(df.select(VF.norm($"a")).as[Double].collect()(2) == 5.0)
  }

  test("cosine of zero vector is null, not an ANSI error") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(VF.cosine($"a", $"b")).collect()(0).isNullAt(0))
  }

  test("bruteForceTopK ranks by cosine with id tie-break") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = corpus.filter($"vec_id" === 1L)
    val top = Similarity.bruteForceTopK(q, corpus, k = 2)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toSeq
    assert(top == Seq((1, 2L), (2, 3L)))
  }

  test("lshTopK returns correctly-reranked subset of brute-force ordering") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" < 5)
    val brute = Similarity.bruteForceTopK(q, e, k = 50)
      .select($"query_id", $"neighbor_id", $"cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ann = Similarity.lshTopK(q, e, k = 10, bands = 8, bitsPerBand = 6).collect()
    assert(ann.nonEmpty)
    // every ANN result's cosine must equal the exact cosine for that pair
    ann.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      brute.get(key).foreach(c => assert(math.abs(c - r.getAs[Double]("cosine")) < 1e-12))
    }
    // per query, ANN ranks must be sorted by descending cosine
    ann.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      val cosines = sorted.map(_.getAs[Double]("cosine")).toSeq
      assert(cosines == cosines.sorted.reverse)
    }
  }

  test("ivfTopK: recall vs brute force, exact cosines, bounded candidates") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" < 10)
    val brute = Similarity.bruteForceTopK(q, e, k = 10).collect()
    val bruteSet = brute.map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    val bruteCos = brute.map(r =>
      (r.getLong(0), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine")).toMap
    val ivf = Similarity.ivfTopK(q, e, k = 10, nLists = 16, nProbe = 4, iters = 3).collect()
    // probing 4/16 lists must not return more than k rows per query
    ivf.groupBy(_.getLong(0)).foreach { case (_, rows) => assert(rows.length <= 10) }
    val hits = ivf.count(r => bruteSet((r.getLong(0), r.getAs[Long]("neighbor_id"))))
    val recall = hits.toDouble / bruteSet.size
    assert(recall >= 0.5, s"IVF recall@10 too low: $recall")
    // rerank is exact: any returned pair that brute force also ranked must
    // carry the identical cosine
    ivf.foreach { r =>
      bruteCos.get((r.getLong(0), r.getAs[Long]("neighbor_id")))
        .foreach(c => assert(math.abs(c - r.getAs[Double]("cosine")) < 1e-12))
    }
  }

  test("ivfTopK accepts array<double> embeddings (trainCentroids must not assume float)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("embedding"))
    val q = e.filter($"vec_id" < 3)
    val top = Similarity.ivfTopK(q, e, k = 5, nLists = 4, nProbe = 2, iters = 1).collect()
    assert(top.nonEmpty)
    top.groupBy(_.getLong(0)).foreach { case (_, rows) => assert(rows.length <= 5) }
  }

  test("trainCentroids is deterministic and list-complete") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.trainCentroids(e, nLists = 8, iters = 2)
    val b = Similarity.trainCentroids(e, nLists = 8, iters = 2)
    assert(a.length == 8 && a.forall(_.length == 64))
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) })
  }

  test("saveCentroids/loadCentroids round-trips and drives the model-taking search") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = Similarity.trainCentroids(e, nLists = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Similarity.saveCentroids(spark, model, dir)
    val loaded = Similarity.loadCentroids(spark, dir)
    assert(loaded.length == model.length)
    assert(model.zip(loaded).forall { case (x, y) => x.sameElements(y) })
    // searching with the loaded model equals searching with the fresh one
    val q = e.limit(5)
    val fresh = Similarity.ivfTopK(q, e, 5, model, 4, "vec_id", "embedding")
      .collect().map(_.toString).sorted.toSeq
    val reloaded = Similarity.ivfTopK(q, e, 5, loaded, 4, "vec_id", "embedding")
      .collect().map(_.toString).sorted.toSeq
    assert(fresh == reloaded && fresh.nonEmpty)
  }

  test("embeddingNearDupPairs finds planted duplicates") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").limit(50)
    // plant exact duplicates under shifted ids
    val planted = e.union(e.select(($"vec_id" + 1000L).as("vec_id"), $"embedding"))
    val pairs = Similarity.embeddingNearDupPairs(planted, threshold = 0.999)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // identical vectors agree on every LSH bit → always same buckets → all found
    (0L until 50L).foreach(i => assert(pairs.contains((i, i + 1000L))))
  }

  test("PQ: full-depth rerank equals brute force; codes bounded; reconstruction is centroid concat") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = Similarity.trainPqCodebooks(e, m = 8, kc = 16, iters = 1)
    assert(model.length == 8 && model.forall(_.length == 16) &&
      model.forall(_.forall(_.length == 8)))
    // codes in range, deterministic across runs
    val codes = Similarity.pqEncode(e, model)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(cs => cs.length == 8 && cs.forall(c => c >= 0 && c < 16)))
    val again = Similarity.pqEncode(e, model)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](1)).toMap
    assert(again == codes)
    // reconstruction = concatenation of the chosen centroids
    val rec = Similarity.pqEncode(e, model)
      .select($"vec_id", Similarity.pqReconstruct($"codes", model).as("r"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1)).toMap
    codes.foreach { case (id, cs) =>
      val want = cs.zipWithIndex.flatMap { case (c, b) => model(b)(c) }
      assert(rec(id) == want.toSeq, s"recon mismatch for $id")
    }
    // with rerankDepth >= |corpus| the ADC shortlist covers everything and
    // the exact rerank makes pqTopK ≡ bruteForceTopK
    val n = e.count().toInt
    val q = e.filter($"vec_id" < 5)
    val pq = Similarity.pqTopK(q, e, k = 10, model, rerankDepth = n)
      .select("query_id", "rank", "neighbor_id").collect().toSeq
    val brute = Similarity.bruteForceTopK(q, e, k = 10)
      .select("query_id", "rank", "neighbor_id").collect().toSeq
    assert(pq.toSet == brute.toSet)
  }

  test("ivfPqTopK: probing every list at full depth equals brute force") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.trainCentroids(e, nLists = 4, iters = 1)
    val books = Similarity.trainPqCodebooks(e, m = 8, kc = 16, iters = 1)
    val n = e.count().toInt
    val q = e.filter($"vec_id" < 5)
    val full = Similarity.ivfPqTopK(q, e, k = 10, cents, books,
        nProbe = 4, rerankDepth = n)
      .select("query_id", "rank", "neighbor_id").collect().toSet
    val brute = Similarity.bruteForceTopK(q, e, k = 10)
      .select("query_id", "rank", "neighbor_id").collect().toSet
    assert(full == brute)
    // partial probing returns a valid, exactly-reranked subset shape
    val part = Similarity.ivfPqTopK(q, e, k = 10, cents, books,
      nProbe = 2, rerankDepth = 50)
    val ranks = part.groupBy("query_id").count().collect()
    assert(ranks.forall(_.getLong(1) <= 10))
  }

  test("semanticDedup: min-id survivor per similar group, cross-cluster pairs never compared") {
    // two well-separated clusters on the axes; centroids put at the axes
    val centroids = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),    // cluster 0, survivor (min id of the sim group)
      (2L, Array(0.999f, 0.01f)), // cos≈1 with 1 → dropped for 1
      (3L, Array(0.98f, 0.199f)), // cos with 1 ≈ 0.98 → kept at 0.99 threshold
      (10L, Array(0.0f, 1.0f)),   // cluster 1, survivor
      (11L, Array(0.0f, 2.0f))    // same direction, different norm → cos 1 → dropped
    ).toDF("vec_id", "embedding")
    val res = Similarity.semanticDedup(corpus, centroids, threshold = 0.99)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("cid"), Option(r.getAs[java.lang.Long]("dup_of")),
          r.getAs[Boolean]("is_kept")))).toMap
    assert(res(1L) == ((0, None, true)))
    assert(res(2L) == ((0, Some(1L), false)))
    assert(res(3L)._3, "0.98-cosine doc must survive a 0.99 threshold")
    assert(res(10L) == ((1, None, true)))
    assert(res(11L) == ((1, Some(10L), false)))
    // exact twins in the same cluster always dedup; survivors re-run stable
    val twins = corpus.union(corpus.select(($"vec_id" + 100L).as("vec_id"), $"embedding"))
    val res2 = Similarity.semanticDedup(twins, centroids, threshold = 0.99)
    assert(res2.filter($"vec_id" >= 100L && $"is_kept").count() == 0)
  }

  test("embeddingNearDupPairs: hot-bucket cap drops identical-vector mega-clusters only") {
    // 20 identical vectors (every band bucket collides — the shape that
    // goes quadratic uncapped) plus one genuinely near-dup pair
    val same = (1L to 20L).map(i => (i, Array(1.0f, 0.0f, 0.0f, 0.0f)))
    val pair = Seq(
      (100L, Array(0.0f, 1.0f, 0.01f, 0.0f)),
      (101L, Array(0.0f, 1.0f, 0.02f, 0.0f)))
    val corpus = (same ++ pair).toDF("vec_id", "embedding")
    val capped = Similarity.embeddingNearDupPairs(corpus, threshold = 0.99,
        maxBucketSize = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists(p => p._1 <= 20L), "mega-cluster pairs must be dropped")
    assert(capped.contains((100L, 101L)), "clean near-dup pair must survive")
    val uncapped = Similarity.embeddingNearDupPairs(corpus, threshold = 0.99,
        maxBucketSize = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.count(p => p._1 <= 20L && p._2 <= 20L) == 20 * 19 / 2)
  }

  test("pqAdcTable: ragged codebooks fail at analysis, not in executors") {
    // compute() reads books(0).length as kc for every book — a codebook
    // with a different centroid count must be rejected before execution
    val ragged = Array(
      Array(Array(0.0, 0.0), Array(1.0, 1.0)), // 2 centroids
      Array(Array(0.0, 0.0)))                  // 1 centroid
    val df = Seq((1L, Array(0.1f, 0.2f, 0.3f, 0.4f))).toDF("id", "vec")
    val e = intercept[Exception] {
      df.select(graft.expressions.PqAdcTable.pqAdcTable($"vec", ragged)).collect()
    }
    assert(e.getMessage.contains("uniform centroid count"), e.getMessage)
    // the uniform shape still evaluates fine
    val ok = Array(
      Array(Array(0.0, 0.0), Array(1.0, 1.0)),
      Array(Array(0.0, 0.0), Array(2.0, 2.0)))
    val t = df.select(graft.expressions.PqAdcTable.pqAdcTable($"vec", ok))
      .collect()(0).getSeq[Double](0)
    assert(t.length == 4) // m=2 × kc=2
  }
}
