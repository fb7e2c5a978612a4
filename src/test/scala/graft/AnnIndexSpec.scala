package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, Similarity}

class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id", $"embedding")
  private def queries = emb.filter($"vec_id" < 5)

  private def probeVsFresh(dir: String, corpus: org.apache.spark.sql.DataFrame): Unit = {
    val centroids = Similarity.loadCentroids(spark, s"$dir/centroids")
    val codebooks = AnnIndex.loadCodebooks(spark, s"$dir/codebooks")
    val fresh = Similarity.ivfPqTopK(queries, corpus, k = 5, centroids, codebooks,
      nProbe = 2, rerankDepth = 10, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2))
    val probe = AnnIndex.annIndexProbe(spark, dir, queries, k = 5,
      nProbe = 2, rerankDepth = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2))
    // BIT-identical, cosines included: same kernels, same models, same ties
    assert(probe.toSeq == fresh.toSeq,
      s"index probe diverged from the model-taking search:\n$probe\nvs\n$fresh")
    assert(probe.nonEmpty)
  }

  test("standing ANN index: build+append probe is bit-identical to ivfPqTopK over the union") {
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx").toString
    // two-step construction: appended vectors are coded against the
    // STANDING models, so the index must equal a fresh build over the union
    AnnIndex.annBuildIndex(emb.filter($"vec_id" % 3 =!= 2), dir,
      nLists = 4, m = 8, kc = 8, iters = 2)
    AnnIndex.annIndexAppend(emb.filter($"vec_id" % 3 === 2), dir)
    assert(spark.read.parquet(s"$dir/lists").count() == emb.count())
    probeVsFresh(dir, emb)
  }

  test("standing ANN index: probe plan pushes the cid filter; ADC scan never reads embeddings") {
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_plan").toString
    AnnIndex.annBuildIndex(emb, dir, nLists = 4, m = 8, kc = 8)
    val probe = AnnIndex.annIndexProbe(spark, dir, queries, k = 3, nProbe = 2)
    val plan = probe.queryExecution.executedPlan.toString
    // probe IO follows the probed lists: the cid IN filter reaches parquet
    assert(plan.contains("PushedFilters: [In(cid"),
      s"cid filter not pushed to the lists scan:\n$plan")
    // the ADC pass reads codes, not floats: some lists scan omits embedding
    val schemas = "ReadSchema: [^\\n]+".r.findAllIn(plan).toSeq
      .filter(_.contains("codes"))
    assert(schemas.nonEmpty && schemas.forall(!_.contains("embedding")),
      s"ADC scan reads the embedding column:\n$plan")
  }

  test("standing ANN index: replayed append batch is skipped, results unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_rp").toString
    AnnIndex.annBuildIndex(emb.filter($"vec_id" % 3 =!= 2), dir,
      nLists = 4, m = 8, kc = 8)
    val batch = emb.filter($"vec_id" % 3 === 2)
    assert(AnnIndex.annIndexAppendIdempotent(batch, dir, batchId = 0L))
    val once = AnnIndex.annIndexProbe(spark, dir, queries, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // the replay: same batch, same id — must be a no-op
    assert(!AnnIndex.annIndexAppendIdempotent(batch, dir, batchId = 0L))
    assert(spark.read.parquet(s"$dir/lists").count() == emb.count(),
      "replayed batch double-indexed")
    val again = AnnIndex.annIndexProbe(spark, dir, queries, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(again == once, "replayed batch changed probe results")
  }

  test("standing ANN index: maintained append loop bounds files, compaction is invisible") {
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_cp").toString
    AnnIndex.annBuildIndex(emb.filter($"vec_id" < 8), dir, nLists = 4, m = 8, kc = 8)
    for (b <- 0 until 8) {
      assert(AnnIndex.annIndexAppendIdempotent(
        emb.filter($"vec_id" >= 8 + b * 4 && $"vec_id" < 12 + b * 4), dir, b.toLong))
      AnnIndex.annIndexMaintain(spark, dir, maxFiles = 6)
    }
    val n = graft.io.Sinks.parquetFileCount(spark, s"$dir/lists")
    assert(n <= 6 + 8, s"lists grew unbounded: $n files") // threshold + one burst
    probeVsFresh(dir, emb.filter($"vec_id" < 40)) // = the indexed subset
    val before = AnnIndex.annIndexProbe(spark, dir, queries, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    AnnIndex.annIndexCompact(spark, dir)
    val after = AnnIndex.annIndexProbe(spark, dir, queries, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(after == before, "compaction changed probe results")
  }

  test("standing ANN index: retraction masks immediately, compaction applies physically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_del").toString
    val truthDir = java.nio.file.Files.createTempDirectory("graft_annidx_del_t").toString
    AnnIndex.annBuildIndex(emb, dir, nLists = 4, m = 8, kc = 8, iters = 2)
    val victims = AnnIndex.annIndexProbe(spark, dir, queries, k = 3, nProbe = 2)
      .select("neighbor_id").distinct().limit(4)
      .collect().map(_.getLong(0)).toSeq
    assert(AnnIndex.annIndexDelete(spark, dir, victims.toDF("vec_id")) ==
      victims.length.toLong)
    // truth: same MODELS (trainOn = full corpus), remaining vectors only
    AnnIndex.annBuildIndex(emb.filter(!$"vec_id".isin(victims: _*)), truthDir,
      nLists = 4, m = 8, kc = 8, iters = 2, trainOn = Some(emb))
    def probe(d: String) = AnnIndex.annIndexProbe(spark, d, queries, k = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val got = probe(dir)
    assert(got == probe(truthDir),
      "post-delete probe diverged from a same-model index without the victims")
    assert(!got.exists(r => victims.contains(r._3)), "retracted vector surfaced")
    // replay: registry guard — no-op
    assert(AnnIndex.annIndexDelete(spark, dir, victims.toDF("vec_id")) == 0L)
    // compaction drops the rows physically; probe unchanged
    AnnIndex.annIndexCompact(spark, dir)
    assert(spark.read.parquet(s"$dir/lists")
      .filter($"vec_id".isin(victims: _*)).count() == 0)
    assert(probe(dir) == got, "compaction changed post-delete probe results")
  }

  test("writeStreamAnnIndexed: embedding stream maintains the standing index") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_st").toString
    // bootstrap build on the first third; the stream appends the rest
    AnnIndex.annBuildIndex(emb.filter($"vec_id" < 16), dir,
      nLists = 4, m = 8, kc = 8, iters = 2, trainOn = Some(emb))
    val rows = emb.filter($"vec_id" >= 16 && $"vec_id" < 48)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val query = AnnIndex.writeStreamAnnIndexed(
      mem.toDF().toDF("vec_id", "embedding")
        .selectExpr("vec_id", "cast(embedding as array<float>) as embedding"),
      dir, s"$dir/ck", maxFiles = 6)
    try {
      rows.grouped(8).foreach { g => mem.addData(g.toIndexedSeq); query.processAllAvailable() }
    } finally query.stop()
    assert(spark.read.parquet(s"$dir/lists").count() == 48)
    assert(graft.io.Sinks.parquetFileCount(spark, s"$dir/lists") <= 6 + 4,
      "maintenance loop let append debris accumulate")
    // the streamed index answers exactly like a fresh same-model build
    // over everything it holds
    probeVsFresh(dir, emb.filter($"vec_id" < 48))
    // recovery replay of an already-committed batch id is a no-op
    assert(!AnnIndex.annIndexAppendIdempotent(
      emb.filter($"vec_id" >= 16 && $"vec_id" < 24), dir, batchId = 0L))
    assert(spark.read.parquet(s"$dir/lists").count() == 48)
  }

  test("codebook save/load round-trips the grid exactly") {
    val books = Array(
      Array(Array(1.0, 2.0), Array(3.0, 4.0)),
      Array(Array(5.0, 6.0), Array(7.0, 8.0)),
      Array(Array(9.0, 0.5), Array(0.25, 0.125)))
    val p = java.nio.file.Files.createTempDirectory("graft_cb").toString + "/cb"
    AnnIndex.saveCodebooks(spark, books, p)
    val loaded = AnnIndex.loadCodebooks(spark, p)
    assert(loaded.map(_.map(_.toSeq).toSeq).toSeq == books.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("growth re-balance: nLists scales with the corpus, probe quality holds, registry drops") {
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_grow").toString
    // build small (10% of the corpus), with nLists sized for THAT corpus
    val build = emb.filter($"vec_id" % 10 === 0)
    AnnIndex.annBuildIndex(build, dir, nLists = 4, m = 8, kc = 8, iters = 2)
    val meta0 = AnnIndex.loadMeta(spark, dir).get
    assert(meta0.nLists == 4 && meta0.builtVectors == build.count())
    // grow ~10x past build; retract a few so the re-code must drop them
    AnnIndex.annIndexAppend(emb.filter($"vec_id" % 10 =!= 0), dir)
    AnnIndex.annIndexDelete(spark, dir, emb.filter($"vec_id" >= 95 && $"vec_id" < 100)
      .select($"vec_id"))
    // growth trigger: maintain must choose REBALANCE, not just compaction
    assert(AnnIndex.annIndexMaintain(spark, dir, growthFactor = 4.0))
    val meta1 = AnnIndex.loadMeta(spark, dir).get
    val total = emb.count()
    assert(meta1.builtVectors == total - 5, "meta re-baselined to survivors")
    val targetList = meta0.builtVectors.toDouble / meta0.nLists
    assert(meta1.nLists == math.ceil((total - 5) / targetList).toInt,
      s"nLists must restore the built mean list size (got ${meta1.nLists})")
    assert(Similarity.loadCentroids(spark, s"$dir/centroids").length == meta1.nLists)
    // retraction is now physical; registry cleared
    assert(spark.read.parquet(s"$dir/lists")
      .filter($"vec_id" >= 95 && $"vec_id" < 100).count() == 0)
    assert(!graft.io.Sinks.parquetExists(spark, s"$dir/deletes"))
    // probe quality: identical-twin planted queries must find their twins
    val probe = AnnIndex.annIndexProbe(spark, dir,
      emb.filter($"vec_id" < 5), k = 5, nProbe = 2, rerankDepth = 10)
    assert(probe.filter($"rank" === 1).count() == 5)
    // and a second maintain call with the SAME thresholds is a no-op
    // (growth re-baselined): only file-count compaction could run
    assert(!AnnIndex.annIndexMaintain(spark, dir, maxFiles = 64, growthFactor = 4.0))
  }

  test("rebalance repairs a half-swapped predecessor; appends keep the meta count current") {
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_swap").toString
    val build = emb.filter($"vec_id" % 10 === 0)
    AnnIndex.annBuildIndex(build, dir, nLists = 4, m = 8, kc = 8, iters = 1)
    assert(AnnIndex.loadMeta(spark, dir).get.currentVectors == build.count())
    AnnIndex.annIndexAppend(emb.filter($"vec_id" % 10 =!= 0), dir)
    // the running count followed the append without a rebalance
    val metaAfterAppend = AnnIndex.loadMeta(spark, dir).get
    assert(metaAfterAppend.currentVectors == emb.count())
    assert(metaAfterAppend.builtVectors == build.count())
    // simulate a crash between swapDir's two renames: lists/ retired,
    // replacement never moved in
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/lists"),
      new org.apache.hadoop.fs.Path(s"$dir/.lists.rebalance-old")))
    // re-running the verb must repair and complete (the doc contract)
    AnnIndex.annIndexRebalance(spark, dir)
    val meta = AnnIndex.loadMeta(spark, dir).get
    assert(meta.builtVectors == emb.count() && meta.currentVectors == emb.count())
    assert(spark.read.parquet(s"$dir/lists").count() == emb.count())
    val probe = AnnIndex.annIndexProbe(spark, dir,
      emb.filter($"vec_id" < 5), k = 5, nProbe = math.max(2, meta.nLists / 2),
      rerankDepth = 10)
    assert(probe.filter($"rank" === 1).count() == 5)
  }
}
