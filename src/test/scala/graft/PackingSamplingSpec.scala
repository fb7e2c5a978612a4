package graft

import org.apache.spark.sql.functions._

import graft.operators.{Packing, Sampling}

class PackingSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("packManifest: golden offsets, zero-token docs excluded, inclusive pack_end") {
    val docs = Seq((1L, 3L), (2L, 4L), (3L, 1L), (4L, 0L), (5L, 10L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.packManifest(docs, ctxTokens = 5)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    // concat order 1,2,3,5 (doc 4 has no tokens): offsets 0,3,7,8
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 0L),   // tokens [0,2]   → pack 0 only
      (2L, 3L, 0L, 1L),   // tokens [3,6]   → straddles packs 0-1
      (3L, 7L, 1L, 1L),   // token  [7]     → pack 1
      (5L, 8L, 1L, 3L)))  // tokens [8,17]  → packs 1-3
  }

  test("packManifest: multi-partition prefix sum equals the sequential scan") {
    // enough rows that repartitionByRange produces several partitions —
    // the broadcast-base path must agree with a driver-side running sum
    val docs = spark.range(1, 2001).select(
      col("id").as("doc_id"), (col("id") % 17 + 1).as("n_tokens"))
    val got = Packing.packManifest(docs, ctxTokens = 64)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var off = 0L
    val want = (1L until 2001L).map { id =>
      val n = id % 17 + 1
      val row = (id, n, off)
      off += n
      row
    }
    assert(got.toSeq == want)
    assert(got.map(_._1).length == 2000) // nothing dropped or duplicated
  }

  test("packSegments: slices reassemble every doc, packs never exceed ctx") {
    // docs of 3/4/1/10 tokens at ctx=5 — doc 5 spans three packs
    val docs = Seq(
      (1L, (1 to 3).map(i => s"a$i")),
      (2L, (1 to 4).map(i => s"b$i")),
      (3L, Seq("c1")),
      (5L, (1 to 10).map(i => s"e$i")))
      .toDF("doc_id", "tokens")
    val seg = Packing.packSegments(docs, ctxTokens = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[String](3), r.getLong(4)))
    // per-doc reassembly: segments ordered by pack concatenate to the doc
    val byDoc = seg.groupBy(_._2).view.mapValues(
      _.sortBy(_._1).flatMap(_._4).toSeq).toMap
    assert(byDoc(1L) == (1 to 3).map(i => s"a$i"))
    assert(byDoc(2L) == (1 to 4).map(i => s"b$i"))
    assert(byDoc(3L) == Seq("c1"))
    assert(byDoc(5L) == (1 to 10).map(i => s"e$i"))
    // per-pack load: total tokens ≤ ctx, offsets consistent with lengths
    val byPack = seg.groupBy(_._1)
    assert(byPack.forall { case (_, ss) => ss.map(_._5).sum <= 5 })
    byPack.foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._3)
      sorted.zip(sorted.drop(1)).foreach { case (prev, next) =>
        assert(prev._3 + prev._5 == next._3) // segments tile the pack
      }
    }
    // the straddling doc: 10 tokens starting at offset 8 → packs 1..3
    assert(seg.filter(_._2 == 5L).map(_._1).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("chunkByTokens: full coverage, stride overlap, short tails, empty docs dropped") {
    // doc 1: 10 tokens, chunk 4 stride 3 → starts 0,3,6,9 (tail len 1);
    // doc 2: 3 tokens (single short chunk); doc 3: empty → no chunks
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, "a b c"),
      (3L, "   "))
      .toDF("doc_id", "text")
    val out = Packing.chunkByTokens(docs, chunkTokens = 4, strideTokens = 3)
      .orderBy("doc_id", "chunk_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(out.map(_._1).toSet == Set(1L, 2L)) // empty doc emits nothing
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(c => (c._2, c._3, c._4)).toSeq == Seq(
      (0L, 1L, 4L), (1L, 4L, 4L), (2L, 7L, 4L), (3L, 10L, 1L)))
    assert(d1.head._5 == "t1 t2 t3 t4")
    assert(d1(1)._5 == "t4 t5 t6 t7") // 1-token overlap at stride 3
    assert(d1.last._5 == "t10")       // short tail, never padded/duplicated
    // every token position is covered by some chunk
    val covered = d1.flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered == (1L to 10L).toSet)
    assert(out.filter(_._1 == 2L).map(c => (c._2, c._4, c._5)).toSeq ==
      Seq((0L, 3L, "a b c")))
  }

  test("chunkByContent: exact reassembly, bounds respected, deterministic") {
    // deterministic pseudo-random text: 300 tokens from a fixed mix
    val words = (0 until 300).map(i =>
      s"w${(i * 2654435761L % 97)}x${i % 7}").mkString(" ")
    val docs = Seq((1L, words), (2L, "a b c"), (3L, "")).toDF("doc_id", "text")
    val out = Packing.chunkByContent(docs, avgTokens = 16, minTokens = 4, maxTokens = 64)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(!out.exists(_._1 == 3L)) // empty doc → no chunks
    val d1 = out.filter(_._1 == 1L)
    assert(d1.length > 3, s"expected several chunks, got ${d1.length}")
    // chunks tile the doc exactly: reassembly == original tokens
    assert(d1.sortBy(_._2).map(_._5).mkString(" ") == words)
    // starts/lengths tile with no gaps
    d1.sortBy(_._2).foldLeft(1L) { case (expectStart, c) =>
      assert(c._3 == expectStart, s"chunk ${c._2} start")
      expectStart + c._4
    }
    // every non-final chunk within [min, max]; final may run short
    d1.dropRight(1).foreach(c => assert(c._4 >= 4 && c._4 <= 64, s"len ${c._4}"))
    assert(d1.last._4 <= 64)
    // a 3-token doc under minTokens still emits its single short chunk
    assert(out.filter(_._1 == 2L).map(_._5).toSeq == Seq("a b c"))
    // deterministic
    val again = Packing.chunkByContent(docs, 16, 4, 64)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.toSeq == again.toSeq)
  }

  test("chunkByContent: boundaries RESYNC after a prefix edit; stride chunks do not") {
    val words = (0 until 400).map(i =>
      s"tok${(i * 1103515245L % 89)}y${i % 11}").mkString(" ")
    val orig = Seq((1L, words)).toDF("doc_id", "text")
    val edited = Seq((1L, "inserted prefix tokens " + words)).toDF("doc_id", "text")
    def cdcChunks(d: org.apache.spark.sql.DataFrame) =
      Packing.chunkByContent(d, avgTokens = 16, minTokens = 4, maxTokens = 64)
        .select("chunk_text").as[String].collect().toSeq
    val a = cdcChunks(orig)
    val b = cdcChunks(edited)
    val shared = a.toSet.intersect(b.toSet).size.toDouble / a.length
    assert(shared >= 0.6, f"CDC resync too weak: $shared%.2f of ${a.length} chunks")
    // the contrast: fixed-stride chunking shares (nearly) nothing after
    // a 3-token shift
    def strideChunks(d: org.apache.spark.sql.DataFrame) =
      Packing.chunkByTokens(d, chunkTokens = 16, strideTokens = 16)
        .select("chunk_text").as[String].collect().toSet
    val sa = strideChunks(orig); val sb = strideChunks(edited)
    assert(sa.intersect(sb).size.toDouble / sa.size < 0.2,
      "stride chunking unexpectedly survived the shift — contrast broken")
  }

  test("chunkByContent: narrow plan — no exchange at any corpus size") {
    val docs = spark.range(0, 200).select(col("id").as("doc_id"),
      concat_ws(" ", (1 to 80).map(i => lit(s"w$i")): _*).as("text"))
    val plan = Packing.chunkByContent(docs, 16, 4, 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"CDC chunking must not shuffle:\n$plan")
  }

  test("chunkByTokens: narrow plan — no exchange at any corpus size") {
    val docs = spark.range(0, 200).select(col("id").as("doc_id"),
      lit((1 to 50).map(i => s"w$i").mkString(" ")).as("text"))
    val plan = Packing.chunkByTokens(docs, 16, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("mixtureWeights: integer totals, dyadic alphas, weights sum to 1 deterministically") {
    val docs = Seq(
      ("a", "x y z"), ("a", "p q"),           // 5 tokens
      ("b", "one two three four five six"),   // 6
      ("c", "lone"))                          // 1
      .toDF("source", "text")
    val nTok = graft.functions.TextFunctions.tokenCount(col("text"))
    val out = Sampling.mixtureWeights(docs, "source", nTok, alpha = 0.5)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(t => (t._1, t._2)).toSeq == Seq(("a", 5L), ("b", 6L), ("c", 1L)))
    val denom = ((0.0 + math.sqrt(5.0)) + math.sqrt(6.0)) + math.sqrt(1.0)
    assert(out.map(_._3).toSeq == Seq(math.sqrt(5.0) / denom,
      math.sqrt(6.0) / denom, math.sqrt(1.0) / denom)) // bit-exact, not ≈
    // alpha=1.0 is proportional sampling; alpha=0.25 flattens harder than 0.5
    val w1 = Sampling.mixtureWeights(docs, "source", nTok, alpha = 1.0)
      .orderBy("source").collect().map(_.getDouble(2))
    assert(math.abs(w1(0) - 5.0 / 12.0) < 1e-15)
    val w25 = Sampling.mixtureWeights(docs, "source", nTok, alpha = 0.25)
      .orderBy("source").collect().map(_.getDouble(2))
    assert(w25(2) > out(2)._3, "smaller alpha upweights the small source")
    assertThrows[IllegalArgumentException](
      Sampling.mixtureWeights(docs, "source", nTok, alpha = 0.3))
  }

  test("md5Bucket/assignSplit: seed-free, stable, exhaustive, well-mixed") {
    val docs = spark.range(0, 2000).select(col("id").as("doc_id"))
    val out = Sampling.assignSplit(docs, "doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // stable: a second run assigns identically (no rand(), no seed state)
    val again = Sampling.assignSplit(docs, "doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.toSeq == again.toSeq)
    // known value: md5("42") = a1d0... → 0xa1d0 = 41424 → bucket 24 → train
    assert(out.find(_._1 == 42L).get._2 == 24)
    assert(out.find(_._1 == 42L).get._3 == "train")
    // exhaustive: every row lands in exactly one named split
    assert(out.forall(r => Set("train", "val", "test")(r._3)))
    // well-mixed: md5 buckets put ~90/5/5 within a loose tolerance
    val frac = out.count(_._3 == "train").toDouble / out.length
    assert(frac > 0.85 && frac < 0.95, s"train fraction $frac")
    // the split is the bucket's band, row by row
    assert(out.forall { case (_, b, s) =>
      (b < 90 && s == "train") || (b >= 90 && b < 95 && s == "val") ||
        (b >= 95 && s == "test")
    })
  }

  test("hashSample: deterministic nested subsets, sane sizing") {
    val docs = spark.range(0, 2000).select(col("id").as("doc_id"))
    val s100 = Sampling.hashSample(docs, "doc_id", 100).collect().map(_.getLong(0)).toSet
    val s300 = Sampling.hashSample(docs, "doc_id", 300).collect().map(_.getLong(0)).toSet
    assert(s100.subsetOf(s300)) // growing the rate keeps prior survivors
    assert(s100.nonEmpty && s300.size < 2000)
    assert(math.abs(s100.size - 200) < 80, s"10% of 2000 ≈ 200, got ${s100.size}")
    // re-run returns the identical set
    assert(Sampling.hashSample(docs, "doc_id", 100)
      .collect().map(_.getLong(0)).toSet == s100)
  }

  test("weightedSample: deterministic, rate-accurate, monotone in weight") {
    val docs = spark.range(0, 4000).select(col("id").as("doc_id"))
    val w3 = Sampling.weightedSample(docs, "doc_id", lit(0.3))
      .collect().map(_.getLong(0)).toSet
    val w6 = Sampling.weightedSample(docs, "doc_id", lit(0.6))
      .collect().map(_.getLong(0)).toSet
    assert(math.abs(w3.size - 1200) < 150, s"30% of 4000 ≈ 1200, got ${w3.size}")
    assert(w3.subsetOf(w6)) // raising a weight only adds survivors
    assert(Sampling.weightedSample(docs, "doc_id", lit(0.3))
      .collect().map(_.getLong(0)).toSet == w3) // rerun identical
    // per-row weights: weight 0 drops everything, weight 1 keeps everything
    val mixed = Sampling.weightedSample(docs, "doc_id",
      when(col("doc_id") < 2000, lit(1.0)).otherwise(lit(0.0)))
      .collect().map(_.getLong(0))
    assert(mixed.length == 2000 && mixed.forall(_ < 2000))
  }

  test("stratifiedSample: exact k per stratum, deterministic, stable under growth") {
    // unbalanced strata: 1000 'big' rows, 40 'small'
    val docs = spark.range(0, 1040).select(col("id").as("doc_id"),
      when(col("id") < 1000, "big").otherwise("small").as("lang"))
    val panel = Sampling.stratifiedSample(docs, "lang", "doc_id", 25)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2)))
    val byLang = panel.groupBy(_._1)
    assert(byLang("big").length == 25 && byLang("small").length == 25)
    assert(byLang.values.forall(_.map(_._3).sorted.toSeq == (1 to 25)))
    // identical on re-run
    val again = Sampling.stratifiedSample(docs, "lang", "doc_id", 25)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2)))
    assert(again.toSet == panel.toSet)
    // growing a stratum only displaces members that hash after the newcomers:
    // the new panel is drawn from old panel ∪ new rows
    val grown = docs.union(spark.range(2000, 2100).select(col("id").as("doc_id"),
      lit("small").as("lang")))
    val panel2 = Sampling.stratifiedSample(grown, "lang", "doc_id", 25)
      .collect().map(r => (r.getString(1), r.getLong(0)))
    val oldSmall = panel.filter(_._1 == "small").map(_._2).toSet
    val newSmall = panel2.filter(_._1 == "small").map(_._2).toSet
    assert(newSmall.forall(id => oldSmall.contains(id) || id >= 2000))
  }

  test("capPerGroup: over-cap trimmed to exactly the cap, under-cap kept whole and unranked") {
    // 'heavy' domain with 500 docs, 'light' with 30, cap 100
    val docs = spark.range(0, 530).select(col("id").as("doc_id"),
      when(col("id") < 500, "heavy").otherwise("light").as("source"))
    val out = Sampling.capPerGroup(docs, "source", "doc_id", 100)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        Option(r.getAs[java.lang.Long]("cap_rank"))))
    val bySrc = out.groupBy(_._1)
    assert(bySrc("heavy").length == 100)
    assert(bySrc("heavy").flatMap(_._3).map(_.toLong).sorted.toSeq == (1L to 100L))
    assert(bySrc("light").length == 30)            // kept wholesale...
    assert(bySrc("light").forall(_._3.isEmpty))    // ...with null rank
    // deterministic on re-run
    val again = Sampling.capPerGroup(docs, "source", "doc_id", 100)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id")))
    assert(again.toSet == out.map(t => (t._1, t._2)).toSet)
    // nested under growth: survivors of the grown corpus come from the old
    // keep-set or the newcomers — a survivor never reappears once displaced
    val grown = docs.union(spark.range(1000, 1200).select(
      col("id").as("doc_id"), lit("heavy").as("source")))
    val kept2 = Sampling.capPerGroup(grown, "source", "doc_id", 100)
      .collect().map(r => r.getAs[Long]("doc_id")).toSet
    val kept1 = out.filter(_._1 == "heavy").map(_._2).toSet
    assert(kept2.filter(_ < 500).subsetOf(kept1))
  }

  test("capPerGroup: under-cap branch shuffles no corpus rows (AQE broadcasts the over set)") {
    // the docstring's scale contract: corpus rows on the under branch flow
    // scan → broadcast-hash anti-probe → union with NO exchange of their
    // own — the only shuffles in the plan are the group-count agg and the
    // window over the over-cap rows. Proven by the join strategy: if the
    // __over set reached the corpus via a sort-merge or shuffled-hash
    // join, corpus rows would ride an exchange; AQE must pick broadcast.
    val docs = spark.range(0, 530).select(col("id").as("doc_id"),
      when(col("id") < 500, "heavy").otherwise("light").as("source"))
    val out = Sampling.capPerGroup(docs, "source", "doc_id", 100)
    out.collect() // let AQE finalize the runtime plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"over-set join degraded from broadcast — corpus rows now shuffle:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("tokenBudget: crossing doc kept, budget spent exactly once, under-budget groups whole") {
    // heavy: 100 docs × 10 tokens = 1000 tokens vs budget 95 → the doc
    // that crosses 95 is the last survivor; light: 300 tokens vs 5000
    val docs = spark.range(0, 130).select(col("id").as("doc_id"),
      when(col("id") < 100, "heavy").otherwise("light").as("source"),
      lit(10L).as("n_tokens"))
    val out = Sampling.tokenBudget(docs, "source", "doc_id", "n_tokens",
        Map("heavy" -> 95L), defaultBudget = 5000L)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        Option(r.getAs[java.lang.Long]("cum_tokens")).map(_.toLong)))
    val bySrc = out.groupBy(_._1)
    // 9 docs fill 90 < 95; the 10th crosses (cum 100) and is kept; the 11th is not
    assert(bySrc("heavy").length == 10)
    assert(bySrc("heavy").flatMap(_._3).max == 100L)
    assert(bySrc("light").length == 30 && bySrc("light").forall(_._3.isEmpty))
    // zero budget still contributes the first doc (cum - n < 0 is false;
    // guard: budget 5 < first doc's 10 tokens keeps exactly one)
    val tiny = Sampling.tokenBudget(docs.filter(col("source") === "heavy"),
        "source", "doc_id", "n_tokens", Map("heavy" -> 5L), 0L)
      .collect()
    assert(tiny.length == 1)
  }

  test("epochShards: total order, seed sensitivity, partition invariance") {
    val docs = spark.range(500).select(col("id").as("doc_id"))
    val e1 = Sampling.epochShards(docs, "doc_id", "e1", nShards = 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every row present once; positions within a shard are 1..size
    assert(e1.map(_._1).toSet.size == 500)
    e1.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // a different seed is a different permutation (some doc moves shard
    // or position) but the same coverage
    val e2 = Sampling.epochShards(docs, "doc_id", "e2", nShards = 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(e2.map(_._1).toSet.size == 500)
    assert(e1.toSet != e2.toSet)
    // partitioning of the input never changes the assignment
    val e1b = Sampling.epochShards(docs.repartition(13), "doc_id", "e1", 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(e1.toSet == e1b.toSet)
  }
}
