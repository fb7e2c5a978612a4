package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.TokenShards

/** Binary token-shard sink: byte-exact layout, doc alignment,
  * determinism, width switching, and the fail-loud OOV contract. */
class TokenShardsSpec extends SparkSpec {

  private def enc(rows: (Long, Seq[Int])*) = {
    import spark.implicits._
    rows.toDF("doc_id", "token_ids")
  }

  test("byte-exact little-endian uint16 layout with eos terminators") {
    val dir = Files.createTempDirectory("graft_shards").toString
    // 3 docs, 2+1 / 1+1 / 2+1 = 8 tokens; budget 4 → docs 1,2 in shard 0
    // (offsets 0 and 3), doc 3 starts at offset 5 → shard 1
    val m = TokenShards.writeTokenShards(
      enc(1L -> Seq(7, 300), 2L -> Seq(5), 3L -> Seq(1, 2)),
      dir, tokensPerShard = 4, vocabSize = 1000, eosId = 0)
    val rows = m.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(rows(0L) == (("shard-00000.bin", 2L, 5L, 1L, 2L)))
    assert(rows(1L) == (("shard-00001.bin", 1L, 3L, 3L, 3L)))
    val b0 = Files.readAllBytes(Paths.get(dir, "shard-00000.bin"))
    // 7, 300, eos, 5, eos as LE uint16
    assert(b0.toSeq == Seq(7, 0, 44, 1, 0, 0, 5, 0, 0, 0).map(_.toByte))
    val b1 = Files.readAllBytes(Paths.get(dir, "shard-00001.bin"))
    assert(b1.toSeq == Seq(1, 0, 2, 0, 0, 0).map(_.toByte))
  }

  test("vocab past uint16 switches to 4-byte ids") {
    val dir = Files.createTempDirectory("graft_shards4").toString
    val m = TokenShards.writeTokenShards(
      enc(1L -> Seq(70000)), dir, 100, vocabSize = 100000, eosId = 0)
    assert(m.head.getInt(2) == 4)
    val b = Files.readAllBytes(Paths.get(dir, "shard-00000.bin"))
    assert(b.toSeq == Seq(0x70, 0x11, 1, 0, 0, 0, 0, 0).map(_.toByte)) // 70000, eos
  }

  test("writer is deterministic: two runs produce identical bytes") {
    val input = enc((0L until 50L).map(i =>
      i -> Seq.tabulate((i % 7 + 1).toInt)(j => (i * 31 + j).toInt % 500)): _*)
    val d1 = Files.createTempDirectory("graft_sh_a").toString
    val d2 = Files.createTempDirectory("graft_sh_b").toString
    TokenShards.writeTokenShards(input, d1, 16, 512, 0)
    TokenShards.writeTokenShards(input.repartition(7), d2, 16, 512, 0)
    val files1 = new java.io.File(d1).listFiles.filter(_.getName.endsWith(".bin"))
      .sortBy(_.getName)
    val files2 = new java.io.File(d2).listFiles.filter(_.getName.endsWith(".bin"))
      .sortBy(_.getName)
    assert(files1.map(_.getName).toSeq == files2.map(_.getName).toSeq)
    files1.zip(files2).foreach { case (a, b) =>
      assert(Files.readAllBytes(a.toPath).toSeq ==
        Files.readAllBytes(b.toPath).toSeq, s"${a.getName} differs")
    }
  }

  test("round-trip: read back and re-split on eos reproduces every doc") {
    import spark.implicits._
    val input = (0L until 40L).map(i =>
      i -> Seq.tabulate((i % 5 + 1).toInt)(j => 1 + (i * 13 + j).toInt % 400))
    val dir = Files.createTempDirectory("graft_sh_rt").toString
    TokenShards.writeTokenShards(enc(input: _*), dir, 24, 512, 0)
    val back = TokenShards.readTokenShards(spark, dir)
      .as[(Long, Seq[Int])].collect().sortBy(_._1)
    // concatenating shards in id order and splitting on eos = input order
    val stream = back.flatMap(_._2)
    val docs = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
    var curr = scala.collection.mutable.ArrayBuffer.empty[Int]
    stream.foreach { t =>
      if (t == 0) { docs += curr.toSeq; curr = scala.collection.mutable.ArrayBuffer.empty[Int] }
      else curr += t
    }
    assert(curr.isEmpty, "stream must end on an eos")
    assert(docs.toSeq == input.map(_._2))
    // token conservation against the manifest
    val manifestTokens = spark.read.parquet(s"$dir/manifest")
      .agg(sum("n_tokens")).head.getLong(0)
    assert(manifestTokens == input.map(_._2.length + 1).sum)
  }

  test("OOV sentinel or out-of-vocab id fails loudly with the doc id") {
    val dir = Files.createTempDirectory("graft_sh_oov").toString
    val e = intercept[org.apache.spark.SparkException] {
      TokenShards.writeTokenShards(
        enc(42L -> Seq(3, -1, 5)), dir, 100, 512, 0)
    }
    assert(e.getMessage.contains("doc 42") || e.getCause != null &&
      String.valueOf(e.getCause.getMessage).contains("doc 42"))
  }

  test("streaming sink: per-batch shards, replay skipped, tokens conserved") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graft_sh_stream").toString
    val ck = java.nio.file.Files.createTempDirectory("graft_sh_ck").toString
    val mem = MemoryStream[(Long, Seq[Int])]
    val query = TokenShards.writeStreamTokenShards(
      mem.toDF().toDF("doc_id", "token_ids"), dir, ck,
      tokensPerShard = 8, vocabSize = 512, eosId = 0)
    try {
      mem.addData((1L, Seq(5, 6)), (2L, Seq(7)))
      query.processAllAvailable()
      mem.addData((3L, Seq(9, 10, 11)))
      query.processAllAvailable()
      val manifests = spark.read.parquet(s"$dir/batch-*/manifest")
      assert(manifests.agg(org.apache.spark.sql.functions.sum("n_tokens"))
        .head.getLong(0) == (2 + 1) + (1 + 1) + (3 + 1))
      // both batch dirs exist with their own shards
      assert(new java.io.File(s"$dir").listFiles
        .count(_.getName.startsWith("batch-")) == 2)
      // read back batch 0 and re-split: both docs round-trip
      val b0 = TokenShards.readTokenShards(spark, s"$dir/batch-00000")
      val stream0 = b0.as[(Long, Seq[Int])].collect().sortBy(_._1).flatMap(_._2)
      assert(stream0.toSeq == Seq(5, 6, 0, 7, 0))
    } finally query.stop()
    // crash-replay: re-delivering an ALREADY-COMMITTED batch id through
    // the same commit path must be a no-op (the foreachBatch recovery
    // contract), while a new id past the marker still lands
    assert(!TokenShards.writeTokenShardsIdempotent(
      enc(99L -> Seq(9)), dir, batchId = 1, 8, 512, 0),
      "replayed batch id must be skipped")
    assert(TokenShards.writeTokenShardsIdempotent(
      enc(99L -> Seq(9)), dir, batchId = 2, 8, 512, 0))
    val total = spark.read.parquet(s"$dir/batch-*/manifest")
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).head.getLong(0)
    // stream batches: (3 + 2) + 4 = 9 tokens; the admitted batch 2 adds
    // doc 99 = 2 more; the SKIPPED replay of batch id 1 adds nothing
    assert(total == 9 + 2, s"replay must not double-count: $total")
  }
}
