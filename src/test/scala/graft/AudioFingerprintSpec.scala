package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.Media

class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Distinct per-k tone layouts: fundamentals and overtones move with
    * k so fingerprints separate. All below 2 kHz, under the Nyquist of
    * every rate used here (including after factor-2 decimation). */
  private def layout(k: Int): Seq[(Double, Double)] = Seq(
    (250.0 + 125 * (k % 4), 0.5),
    (875.0 + 250 * (k % 3), 0.3),
    (1625.0 - 125 * (k % 5), 0.2))

  private def wav(id: Long, rate: Int, k: Int, noise: Double = 0.0): Media = {
    // the planted "noise" is a faint off-bin in-band tone (333 Hz sits
    // between the 60 Hz-step analysis bins)
    val bytes = TestWav.toneMix(rate, 1.0, layout(k) ++
      (if (noise > 0) Seq((333.0, noise)) else Nil))
    Media(id, "audio/wav", bytes)
  }

  test("amplitude-scaled copy fingerprints identically") {
    val base = TestWav.toneMix(8000, 1.0, layout(0))
    val half = TestWav.toneMix(8000, 1.0, layout(0), gain = 0.5)
    val d = hamming(
      Multimodal.audioHash64(Media(1L, "audio/wav", base)),
      Multimodal.audioHash64(Media(2L, "audio/wav", half)))
    assert(d <= 2, s"amplitude scaling drifted $d bits")
  }

  test("added faint out-of-band tone stays within the near-dup radius") {
    val d = hamming(
      Multimodal.audioHash64(wav(1L, 8000, 0)),
      Multimodal.audioHash64(wav(2L, 8000, 0, noise = 0.05)))
    assert(d <= 8, s"noisy twin drifted $d bits")
  }

  test("different tone layouts are far apart") {
    for (a <- 0 until 4; b <- 0 until 4 if a < b) {
      val d = hamming(
        Multimodal.audioHash64(wav(1L, 8000, a)),
        Multimodal.audioHash64(wav(2L, 8000, b)))
      // the shared broadband bed compresses inter-layout distance; what
      // matters is clearing the radius-8 pairing threshold with margin
      assert(d >= 12, s"layouts $a/$b only $d bits apart")
    }
  }

  test("stereo mixdown of the same material matches mono") {
    val mono = TestWav.toneSamples(8000, 1.0, layout(1), gain = 0.5)
    val stereo = mono.flatMap(s => Seq(s, s))
    val d = hamming(
      Multimodal.audioHash64(Media(1L, "audio/wav", TestWav(8000, 1, 16, mono))),
      Multimodal.audioHash64(Media(2L, "audio/wav", TestWav(8000, 2, 16, stereo))))
    assert(d <= 2, s"stereo mixdown drifted $d bits")
  }

  test("factor-2 decimation via resampleWav stays within the radius") {
    // 16 kHz -> 8 kHz: the output Nyquist (4 kHz) stays comfortably above
    // the 1.92 kHz top analysis bin, the operator's documented regime. At
    // 4 kHz output the conjugate-image leakage enters the top bins and
    // the fingerprint drifts (measured ~24 bits) — see audioHash64's doc.
    val m = wav(1L, 16000, 2)
    val down = Multimodal.resampleWav(m, 2)
    val d = hamming(Multimodal.audioHash64(m), Multimodal.audioHash64(down))
    assert(d <= 8, s"resampled twin drifted $d bits")
  }

  test("same layout rendered at different rates stays within the radius") {
    val d = hamming(
      Multimodal.audioHash64(wav(1L, 8000, 3)),
      Multimodal.audioHash64(wav(2L, 16000, 3)))
    assert(d <= 8, s"re-rated twin drifted $d bits")
  }

  test("audioNearDupPairs: planted twins pair, distinct layouts do not") {
    // twins are REMIXES of the same material (per-tone level changes of
    // ±10%) — the realistic near-dup transform; an added tone close to a
    // fundamental beats against it and legitimately drifts further
    val media = (0 until 4).flatMap { k =>
      val remix = layout(k).zipWithIndex.map { case ((f, a), i) =>
        (f, a * (if (i % 2 == 0) 1.1 else 0.9)) }
      Seq(wav(k.toLong, 8000, k),
        Media(k + 100L, "audio/wav", TestWav.toneMix(8000, 1.0, remix)))
    }
    val pairs = Multimodal.audioNearDupPairs(
        Multimodal.audioHashes(media.toDS()), maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (k <- 0L until 4L)
      assert(pairs.contains((k, k + 100L)), s"twin pair $k missing")
    assert(pairs.forall { case (a, b) =>
      (b - a) % 100L == 0L
    }, s"distinct layouts paired: $pairs")
  }

  test("malformed and non-PCM payloads fail loudly") {
    intercept[IllegalArgumentException] {
      Multimodal.audioHash64(Media(1L, "audio/wav", Array[Byte](1, 2, 3)))
    }
    intercept[IllegalArgumentException] {
      Multimodal.audioHash64(Media(2L, "audio/wav",
        TestWav(8000, 1, 16, Seq(0, 0, 0, 0), fmtTag = 85))) // MP3-in-WAV
    }
  }
}
