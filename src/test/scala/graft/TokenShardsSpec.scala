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
}
