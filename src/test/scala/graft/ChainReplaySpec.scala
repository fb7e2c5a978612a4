package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.io.Warc
import graft.operators.{BpeTokenizer, CorpusPipeline, Multimodal, TokenShards}

/** Crash-replay across the CHAINED streaming sinks — the composition the
  * per-sink idempotence specs don't cover: one crawl microbatch feeds the
  * indexed-corpus sink (docs + sigs + buckets + BM25), then the
  * media-dedup sink, then the streaming token shards. A crash at any
  * boundary leaves EARLIER sinks committed for the batch and LATER ones
  * not; Structured Streaming's recovery replays the same batch id through
  * the whole chain, so the already-committed sinks must skip on their
  * markers while the rest commit — and every artifact must end IDENTICAL
  * to the uncrashed run (parquet row-identical, shard binaries
  * byte-identical). */
class ChainReplaySpec extends SparkSpec {
  import spark.implicits._

  private final class PlantedCrash extends RuntimeException("planted crash")

  // -- deterministic crawl batches -----------------------------------------

  /** 25 consecutive words from a 400-word circular bank: distinct docs
    * share no shingles, exact twins share all. */
  private def docText(i: Int): String =
    (0 until 25).map(j => s"w${(i * 25 + j) % 400}").mkString(" ")

  private def tone(freqA: Double, ampA: Double, freqB: Double, ampB: Double) =
    TestWav(8000, 1, 16,
      TestWav.toneSamples(8000, 0.5, Seq((freqA, ampA), (freqB, ampB))))

  /** Batch b as a WARC archive: 3 html docs, one wav, one ppm — batch 1
    * carries a cross-batch EXACT text twin of batch 0's first doc (new
    * url → new doc_id, must be suppressed by the standing-table probe)
    * and an audio REMIX twin of batch 0's tone (must be suppressed by
    * the standing media signatures). */
  private def stageBatch(root: Path, b: Int): Dataset[Warc.WarcRecord] = {
    val dir = root.resolve(s"warc$b")
    if (!Files.exists(dir)) {
      val html = (0 until 3).map { d =>
        val i = b * 3 + d
        (s"http://chain.test/doc/$i", "text/html",
          s"<html><body>${docText(i)}</body></html>".getBytes("US-ASCII"))
      }
      val twinDoc =
        if (b == 1) Seq(("http://chain.test/twin/0", "text/html",
          s"<html><body>${docText(0)}</body></html>".getBytes("US-ASCII")))
        else Nil
      val media = Seq(
        (s"http://chain.test/tone/$b", "audio/wav",
          tone(300.0 + 150 * b, 0.5, 900.0 + 150 * b, 0.3)),
        (s"http://chain.test/img/$b", "image/ppm",
          Multimodal.syntheticScenePpm(b.toLong)))
      val twinMedia =
        if (b == 1) Seq(("http://chain.test/tone/0remix", "audio/wav",
          tone(300.0, 0.55, 900.0, 0.27)))
        else Nil
      Warc.writeWarcResponses(
        (html ++ twinDoc ++ media ++ twinMedia)
          .toDF("target_uri", "content_type", "payload"),
        dir.toString)
    }
    Warc.readWarc(spark, dir.toString)
  }

  // -- the chain ----------------------------------------------------------

  private case class Dirs(root: Path) {
    val corpus = s"$root/corpus"
    val sigs = s"$root/sigs"
    val bm25 = s"$root/bm25"
    val mediaCorpus = s"$root/media"
    val mediaSigs = s"$root/media_sigs"
    val shards = s"$root/shards"
  }

  /** One microbatch through all three sinks; `crashAfter` plants a crash
    * at that sink boundary (0 = after the indexed-corpus sink, 1 = after
    * the media sink, 2 = after the shards). */
  private def commitBatch(d: Dirs, recs: Dataset[Warc.WarcRecord],
      batchId: Long, merges: Seq[BpeTokenizer.BpeMerge],
      vocab: Map[String, Int], crashAfter: Int = -1): Unit = {
    val docs = Warc.toDocuments(recs).select("doc_id", "text")
    CorpusPipeline.indexedCommit(docs, batchId, d.corpus, d.sigs,
      Some(d.bm25), "doc_id", "text",
      k = 64, bands = 16, shingleN = 3, minJaccard = 0.5, maxIndexFiles = 64)
    if (crashAfter == 0) throw new PlantedCrash
    val media = Warc.toMedia(recs)
      .filter(col("kind").isin("audio/wav", "image/ppm")).toDF()
    CorpusPipeline.mediaCommit(media, batchId, d.mediaCorpus, d.mediaSigs,
      maxHamming = 8)
    if (crashAfter == 1) throw new PlantedCrash
    val enc = BpeTokenizer.bpeEncodeIds(docs, merges, vocab)
      .select(col("doc_id"), col("token_ids"))
    TokenShards.writeTokenShardsIdempotent(enc, d.shards, batchId,
      tokensPerShard = 64, vocabSize = vocab.size + 1, eosId = vocab.size)
    if (crashAfter == 2) throw new PlantedCrash
  }

  // -- artifact snapshot ---------------------------------------------------

  private def md5(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"$x%02x").mkString

  /** Every artifact under `root`, content-addressed: parquet leaf dirs →
    * md5 of their sorted JSON rows (binary columns base64 through
    * toJSON), shard binaries → md5 of the bytes. */
  private def snapshot(d: Dirs): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val root = d.root
    val all = Files.walk(root).iterator().asScala.toSeq
    val parquetLeaves = all
      .filter(p => p.getFileName.toString.endsWith(".parquet") &&
        Files.isRegularFile(p))
      .map(_.getParent).distinct
    val pq = parquetLeaves.map { dir =>
      val rows = spark.read.parquet(dir.toString).toJSON.collect().sorted
      root.relativize(dir).toString -> md5(rows.mkString("\n").getBytes("UTF-8"))
    }
    val bins = all
      .filter(p => p.getFileName.toString.endsWith(".bin") &&
        Files.isRegularFile(p))
      .map(p => root.relativize(p).toString -> md5(Files.readAllBytes(p)))
    (pq ++ bins).toMap
  }

  // -- the test ------------------------------------------------------------

  test("chained sinks: a crash at EVERY boundary replays to artifacts identical to the uncrashed run") {
    val stageRoot = Files.createTempDirectory("graft_chain_stage")
    val batches = (0 until 3).map(b => stageBatch(stageRoot, b))

    // standing BPE model: trained once on batch 0's documents (models
    // never train inside a microbatch — the writeStreamAnnIndexed rule)
    val model = BpeTokenizer.trainBpe(
      Warc.toDocuments(batches(0)).select("doc_id", "text"), numMerges = 30)
    val vocab = BpeTokenizer.vocabMap(model)

    def run(crashBatch: Int, crashAfter: Int): Map[String, String] = {
      val d = Dirs(Files.createTempDirectory("graft_chain"))
      for (b <- 0 until 3) {
        if (b == crashBatch) {
          intercept[PlantedCrash] {
            commitBatch(d, batches(b), b, model.merges, vocab, crashAfter)
          }
          // recovery: Structured Streaming re-runs the SAME batch id
          // through the WHOLE chain; committed sinks skip on markers
          commitBatch(d, batches(b), b, model.merges, vocab)
        } else commitBatch(d, batches(b), b, model.merges, vocab)
      }
      snapshot(d)
    }

    val clean = {
      val d = Dirs(Files.createTempDirectory("graft_chain"))
      for (b <- 0 until 3) commitBatch(d, batches(b), b, model.merges, vocab)
      snapshot(d)
    }
    // sanity on the clean run itself: the cross-batch twins were
    // suppressed (3 batches × 3 docs + 1 twin → 9 corpus docs; media
    // 3 tones + 3 images + 1 remix twin → 6)
    assert(clean.nonEmpty)

    for (crashAfter <- 0 to 2) {
      val replayed = run(crashBatch = 1, crashAfter = crashAfter)
      assert(replayed.keySet == clean.keySet,
        s"artifact set diverged after crash at boundary $crashAfter:\n" +
          s"missing=${clean.keySet -- replayed.keySet} " +
          s"extra=${replayed.keySet -- clean.keySet}")
      val diff = clean.keys.filter(k => clean(k) != replayed(k))
      assert(diff.isEmpty,
        s"artifacts diverged after crash at boundary $crashAfter: $diff")
    }
  }

  test("chained sinks: the clean run's dedup actually fired across batches") {
    val stageRoot = Files.createTempDirectory("graft_chain_stage2")
    val batches = (0 until 3).map(b => stageBatch(stageRoot, b))
    val model = BpeTokenizer.trainBpe(
      Warc.toDocuments(batches(0)).select("doc_id", "text"), numMerges = 30)
    val vocab = BpeTokenizer.vocabMap(model)
    val d = Dirs(Files.createTempDirectory("graft_chain_clean"))
    for (b <- 0 until 3) commitBatch(d, batches(b), b, model.merges, vocab)
    // 9 distinct docs kept; the exact text twin (different url/doc_id)
    // was suppressed by the standing-table probe
    assert(spark.read.parquet(d.corpus).count() == 9,
      "cross-batch text twin must be suppressed")
    // 6 distinct media kept; the remix tone twin suppressed
    assert(spark.read.parquet(d.mediaCorpus).count() == 6,
      "cross-batch media twin must be suppressed")
    // shards exist for all three batches, tokens conserved per batch
    for (b <- 0 until 3)
      assert(Files.list(Paths.get(d.shards, f"batch-$b%05d"))
        .iterator().hasNext, s"batch $b shards missing")
  }
}
