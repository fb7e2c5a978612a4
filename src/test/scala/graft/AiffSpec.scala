package graft

import graft.operators.Aiff
import graft.operators.Multimodal
import graft.operators.Multimodal.Media

/** AIFF/AIFF-C PCM decode: the 80-bit extended rate parse, both byte
  * orders, both depths (8-bit signed), cross-format fingerprint
  * parity with WAV, and the fail-loud boundaries. */
class AiffSpec extends SparkSpec {

  private def pcm(n: Int): Array[Int] =
    Array.tabulate(n)(i => ((i * 173 % 32768) - 16384))

  test("80-bit extended sample rates round-trip exactly") {
    for (rate <- Seq(8000, 11025, 22050, 44100, 48000, 96000)) {
      val b = Aiff.writeExtended80(rate)
      assert(Aiff.extended80(b, 0, 1L) == rate, s"rate $rate")
    }
  }

  test("big-endian AIFF round-trips samples, channels, rate") {
    val samples = pcm(2000)
    val a = Aiff.decodeAiff(Aiff.writeAiff(44100, 2, 16, samples), 2L)
    assert(a.sampleRate == 44100 && a.channels == 2 && a.bits == 16)
    assert(java.util.Arrays.equals(a.samples, samples))
  }

  test("AIFF-C sowt (little-endian) decodes to identical samples") {
    val samples = pcm(1500)
    val be = Aiff.decodeAiff(Aiff.writeAiff(22050, 1, 16, samples), 3L)
    val le = Aiff.decodeAiff(Aiff.writeAiff(22050, 1, 16, samples, sowt = true), 4L)
    assert(java.util.Arrays.equals(be.samples, le.samples))
  }

  test("8-bit AIFF samples are signed") {
    val s8 = Array(-128, -1, 0, 1, 127, -64, 64, 33)
    val a = Aiff.decodeAiff(Aiff.writeAiff(8000, 1, 8, s8), 5L)
    assert(a.samples.toSeq == s8.toSeq)
  }

  test("an AIFF and a WAV of the same PCM fingerprint bit-identically") {
    val samples = pcm(8000)
    val aiff = Aiff.writeAiff(8000, 1, 16, samples)
    val wav = {
      val out = new java.io.ByteArrayOutputStream(44 + samples.length * 2)
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
      out.write("RIFF".getBytes("US-ASCII")); w32(36 + samples.length * 2)
      out.write("WAVE".getBytes("US-ASCII")); out.write("fmt ".getBytes("US-ASCII"))
      w32(16); w16(1); w16(1); w32(8000); w32(16000); w16(2); w16(16)
      out.write("data".getBytes("US-ASCII")); w32(samples.length * 2)
      samples.foreach(w16)
      out.toByteArray
    }
    assert(Multimodal.audioHash64(Media(1L, "audio/aiff", aiff)) ==
      Multimodal.audioHash64(Media(2L, "audio/wav", wav)))
    // the feature bridge reports the decoded stream
    import spark.implicits._
    val feats = Multimodal.decodeFeatures(
      Seq(Media(3L, "audio/x-aiff", aiff)).toDS()).collect()
    assert(feats(0).width == 8000 && feats(0).height == 1)
    assert(math.abs(feats(0).features(3) - 1.0f) < 1e-6) // 8000 frames @8 kHz
  }

  test("fail-loud: magic, truncation, compressed AIFC, absurd rate") {
    intercept[IllegalArgumentException] {
      Aiff.decodeAiff(Array[Byte](1, 2, 3), 6L)
    }
    val good = Aiff.writeAiff(8000, 1, 16, pcm(100))
    intercept[IllegalArgumentException] {
      Aiff.decodeAiff(good.take(good.length - 21), 7L)
    }
    // an AIFC naming a compressed codec is refused, not mis-decoded
    val sowt = Aiff.writeAiff(8000, 1, 16, pcm(100), sowt = true)
    val idx = {
      var at = -1
      var i = 0
      while (at < 0 && i + 4 <= sowt.length) {
        if (sowt(i) == 's' && sowt(i + 1) == 'o' && sowt(i + 2) == 'w' &&
          sowt(i + 3) == 't' && i > 12) at = i
        i += 1
      }
      at
    }
    assert(idx > 0)
    val ulaw = sowt.clone()
    Array('u', 'l', 'a', 'w').map(_.toByte).zipWithIndex
      .foreach { case (c, i) => ulaw(idx + i) = c }
    val e = intercept[IllegalArgumentException] {
      Aiff.decodeAiff(ulaw, 8L)
    }
    assert(e.getMessage.contains("refused"))
  }
}
