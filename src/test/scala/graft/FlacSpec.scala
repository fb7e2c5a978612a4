package graft

import graft.operators.{Flac, Multimodal}
import graft.operators.Multimodal.Media

class FlacSpec extends SparkSpec {
  import spark.implicits._

  private def sine(n: Int, amp: Double, period: Double): Array[Int] =
    Array.tabulate(n)(i =>
      (amp * 32767 * StrictMath.sin(2 * StrictMath.PI * i / period)).toInt)

  test("verbatim mono 16-bit round-trips sample-exact (multi-frame, partial tail)") {
    val x = sine(2500, 0.6, 37.3) // 3 frames at blockSize 1024, partial tail
    val flac = TestFlac(8000, 1, 16, x, blockSize = 1024)
    val a = Flac.decodeFlac(flac)
    assert((a.sampleRate, a.channels, a.bits) == (8000, 1, 16))
    assert(a.samples.toSeq == x.toSeq)
  }

  test("fixed-order-2 Rice frames round-trip sample-exact") {
    val x = sine(3000, 0.4, 61.7)
    val a = Flac.decodeFlac(TestFlac(8000, 1, 16, x, subframe = "fixed2"))
    assert(a.samples.toSeq == x.toSeq)
  }

  test("constant subframes round-trip") {
    val x = Array.fill(2048)(-1234)
    val a = Flac.decodeFlac(TestFlac(8000, 1, 16, x, subframe = "constant"))
    assert(a.samples.toSeq == x.toSeq)
  }

  test("left/side stereo decorrelation round-trips sample-exact") {
    val l = sine(2000, 0.5, 41.0)
    val r = sine(2000, 0.3, 97.0)
    val inter = Array.tabulate(4000)(i => if (i % 2 == 0) l(i / 2) else r(i / 2))
    val a = Flac.decodeFlac(TestFlac(8000, 2, 16, inter, leftSide = true))
    assert(a.channels == 2)
    assert(a.samples.toSeq == inter.toSeq)
  }

  test("independent stereo round-trips") {
    val inter = Array.tabulate(3000)(i => ((i * 37) % 4001) - 2000)
    val a = Flac.decodeFlac(TestFlac(16000, 2, 16, inter))
    assert(a.samples.toSeq == inter.toSeq)
  }

  test("8-bit streams round-trip") {
    val x = Array.tabulate(1500)(i => ((i * 7) % 255) - 127)
    val a = Flac.decodeFlac(TestFlac(8000, 1, 8, x))
    assert(a.bits == 8)
    assert(a.samples.toSeq == x.toSeq)
  }

  test("corruption fails loudly: flipped payload byte, truncation, bad magic") {
    val x = sine(2000, 0.5, 53.0)
    val good = TestFlac(8000, 1, 16, x, subframe = "fixed2")
    // flip a byte in the middle of frame data -> CRC or MD5 mismatch
    val bad = good.clone()
    bad(good.length / 2) = (bad(good.length / 2) ^ 0x40).toByte
    val e1 = intercept[IllegalArgumentException] { Flac.decodeFlac(bad) }
    assert(e1.getMessage.contains("CRC") || e1.getMessage.contains("MD5") ||
      e1.getMessage.contains("FLAC"))
    intercept[IllegalArgumentException] {
      Flac.decodeFlac(good.take(good.length / 2))
    }
    intercept[IllegalArgumentException] {
      Flac.decodeFlac("not a flac stream at all".getBytes("US-ASCII"))
    }
  }

  test("decoded-sample MD5 gate catches consistent-CRC corruption") {
    // re-encode different samples but splice the original STREAMINFO MD5:
    // frames are internally consistent (CRCs pass), the MD5 must object
    val x = sine(2000, 0.5, 53.0)
    val y = sine(2000, 0.5, 59.0)
    val withMd5OfX = TestFlac(8000, 1, 16, x)
    val ofY = TestFlac(8000, 1, 16, y, md5 = false)
    // STREAMINFO MD5 sits at bytes [8+18, 8+34) (4 magic + 4 header + 18)
    val spliced = ofY.clone()
    Array.copy(withMd5OfX, 26, spliced, 26, 16)
    val e = intercept[IllegalArgumentException] { Flac.decodeFlac(spliced) }
    assert(e.getMessage.contains("MD5"))
  }

  test("FLAC and WAV of the same PCM fingerprint bit-identically") {
    val samples = TestWav.toneSamples(8000, 1.0, Seq((500.0, 0.4), (1200.0, 0.25)))
    val wav = Media(1L, "audio/wav", TestWav(8000, 1, 16, samples))
    val flac = Media(2L, "audio/flac", TestFlac(8000, 1, 16, samples.toArray,
      subframe = "fixed2"))
    assert(Multimodal.audioHash64(wav) == Multimodal.audioHash64(flac))
  }

  test("decodeFeatures routes audio/flac; features equal the WAV codec's") {
    val samples = TestWav.toneSamples(8000, 1.0, Seq((440.0, 0.5)))
    val wav = Media(1L, "audio/wav", TestWav(8000, 1, 16, samples))
    val flac = Media(2L, "audio/flac", TestFlac(8000, 1, 16, samples.toArray))
    val out = Multimodal.decodeFeatures(Seq(wav, flac).toDS())
      .collect().sortBy(_.media_id)
    assert(out(0).width == out(1).width && out(0).height == out(1).height)
    out(0).features.zip(out(1).features).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6f, s"feature drift: $a vs $b")
    }
  }

  test("audioNearDupPairs spans formats: a FLAC re-encode pairs with its WAV") {
    val media = (0 until 3).flatMap { k =>
      val s = TestWav.toneSamples(8000, 0.5,
        Seq((400.0 + 200 * k, 0.5), (1100.0 + 150 * k, 0.3)))
      Seq(Media(k.toLong, "audio/wav", TestWav(8000, 1, 16, s)),
        Media(k + 100L, "audio/flac", TestFlac(8000, 1, 16, s.toArray)))
    }
    val pairs = Multimodal.audioNearDupPairs(
        Multimodal.audioHashes(media.toDS()), maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    for (k <- 0L until 3L) {
      val p = pairs.find(p => p._1 == k && p._2 == k + 100L)
      assert(p.isDefined, s"cross-format twin $k missing")
      assert(p.get._3 == 0, "lossless re-encode must be hamming 0")
    }
  }
}
