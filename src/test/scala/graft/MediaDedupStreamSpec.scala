package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusPipeline, Multimodal}
import graft.operators.Multimodal.Media

class MediaDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("media_dedup").toString

  private def img(id: Long, sceneId: Long, perturb: Boolean = false): Media =
    Media(id, "image/ppm", Multimodal.syntheticScenePpm(sceneId, perturb = perturb))

  private def wavSamples(k: Int): IndexedSeq[Int] =
    TestWav.toneSamples(8000, 0.5, Seq((400.0 + 200 * k, 0.5), (1100.0 + 150 * k, 0.3)))

  private def corpusIds(dir: String): Set[Long] =
    spark.read.parquet(dir).select("media_id").as[Long].collect().toSet

  test("mediaCommit: intra-batch twins dropped per modality, pass-through kept") {
    val corpus = tmp() + "/corpus"; val sigs = tmp() + "/sigs"
    val batch = Seq(
      img(1L, 0L), img(2L, 0L, perturb = true),                 // image twins
      Media(3L, "audio/wav", TestWav(8000, 1, 16, wavSamples(0))),
      Media(4L, "audio/wav", TestWav(8000, 1, 16,
        TestWav.toneSamples(8000, 0.5,
          Seq((400.0, 0.55), (1100.0, 0.27))))),                // audio remix twin
      Media(5L, "application/pdf", Array[Byte](1, 2, 3))        // unhashable
    ).toDF()
    CorpusPipeline.mediaCommit(batch, 0L, corpus, sigs, maxHamming = 8)
    assert(corpusIds(corpus) == Set(1L, 3L, 5L))
    val sigRows = spark.read.parquet(sigs)
      .select("doc_id", "modality").as[(Long, String)].collect().toSet
    assert(sigRows == Set((1L, "image"), (3L, "audio")))
  }

  test("cross-batch suppression spans formats and sizes; replay is a no-op") {
    val corpus = tmp() + "/corpus"; val sigs = tmp() + "/sigs"
    val s0 = wavSamples(1)
    CorpusPipeline.mediaCommit(Seq(
      img(1L, 4L),
      Media(2L, "audio/wav", TestWav(8000, 1, 16, s0))
    ).toDF(), 0L, corpus, sigs, maxHamming = 8)
    // batch 1: FLAC re-encode of the standing audio, a resized copy of
    // the standing image, and one genuinely new image
    val resized = Multimodal.resizePpm(img(10L, 4L), 96, 96)
    CorpusPipeline.mediaCommit(Seq(
      Media(10L, "image/ppm", resized.bytes),
      Media(11L, "audio/flac", TestFlac(8000, 1, 16, s0.toArray)),
      img(12L, 5L)
    ).toDF(), 1L, corpus, sigs, maxHamming = 8)
    assert(corpusIds(corpus) == Set(1L, 2L, 12L))
    // replay of batch 1 with the same id: markers skip, state unchanged
    CorpusPipeline.mediaCommit(Seq(
      Media(10L, "image/ppm", resized.bytes),
      Media(11L, "audio/flac", TestFlac(8000, 1, 16, s0.toArray)),
      img(12L, 5L)
    ).toDF(), 1L, corpus, sigs, maxHamming = 8)
    assert(corpusIds(corpus) == Set(1L, 2L, 12L))
    assert(spark.read.parquet(sigs).count() == 3)
  }

  test("a deleted bucket index is rebuilt; dedup still holds") {
    val corpus = tmp() + "/corpus"; val sigs = tmp() + "/sigs"
    CorpusPipeline.mediaCommit(Seq(img(1L, 7L)).toDF(), 0L, corpus, sigs, 8)
    // simulate divergence: the chunk index vanishes
    val bucketPath = new java.io.File(sigs + ".buckets")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(bucketPath)
    CorpusPipeline.mediaCommit(
      Seq(img(2L, 7L, perturb = true), img(3L, 8L)).toDF(), 1L, corpus, sigs, 8)
    assert(corpusIds(corpus) == Set(1L, 3L))
  }

  test("modalities never cross-match: an audio signature equal to an image pHash does not suppress the image") {
    val corpus = tmp() + "/corpus"; val sigs = tmp() + "/sigs"
    val image = img(5L, 9L)
    val phash = Multimodal.perceptualHash64(image)
    // plant a standing AUDIO signature with the image's exact hash
    Seq((999L, "audio", phash)).toDF("doc_id", "modality", "simhash")
      .write.parquet(sigs)
    CorpusPipeline.mediaCommit(Seq(image).toDF(), 0L, corpus, sigs, 8)
    assert(corpusIds(corpus) == Set(5L))
  }

  test("writeStreamMediaDedup drives end-to-end through a real stream") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = tmp() + "/corpus"; val sigs = tmp() + "/sigs"
    val mem = MemoryStream[(Long, String, Array[Byte])]
    val query = CorpusPipeline.writeStreamMediaDedup(
      mem.toDF().toDF("media_id", "kind", "bytes"),
      corpus, sigs, tmp() + "/ckpt", maxHamming = 8)
    mem.addData((1L, "image/ppm", Multimodal.syntheticScenePpm(11L)))
    query.processAllAvailable()
    mem.addData((2L, "image/ppm", Multimodal.syntheticScenePpm(11L, perturb = true)),
      (3L, "image/ppm", Multimodal.syntheticScenePpm(12L)))
    query.processAllAvailable()
    query.stop()
    assert(corpusIds(corpus) == Set(1L, 3L))
  }

  test("mediaCommit: MPEG audio is hashable per payload — Layer I dedups, Layer III passes through") {
    val corpus = tmp() + "/corpus"; val sigs = tmp() + "/sigs"
    def pcm(freq: Double) = TestWav.toneSamples(32000, 0.3, Seq((freq, 0.5)))
      .map(v => v) // IndexedSeq[Int]
    val l1a = TestMp3.layer1(32000, 1, pcm(440.0).toArray, nb = 13)
    val l1b = TestMp3.layer1(32000, 1, pcm(440.0).map(v => (v * 1.08).toInt).toArray, nb = 13)
    val l3 = TestMp3.layerStub(3, 44100, 128, frames = 20)
    val batch = Seq(
      Media(1L, "audio/mpeg", l1a),
      Media(2L, "audio/mpeg", l1b), // re-levelled Layer I twin: must dedup
      Media(3L, "audio/mpeg", l3),  // Layer III: metadata tier, pass-through
      Media(4L, "audio/mpeg", l3.clone())) // even its exact twin passes
    CorpusPipeline.mediaCommit(batch.toDF(), 0L, corpus, sigs, maxHamming = 8)
    assert(corpusIds(corpus) == Set(1L, 3L, 4L),
      "Layer I twin suppressed; Layer III rows pass through undeduped")
    val sigRows = spark.read.parquet(sigs)
      .select("doc_id", "modality").as[(Long, String)].collect().toSet
    assert(sigRows == Set((1L, "audio")),
      "only the decodable Layer I payload entered the signature tier")
  }
}
