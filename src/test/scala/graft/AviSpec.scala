package graft

import graft.operators.{Avi, Multimodal}

/** MJPEG-in-AVI container walk: framing (incl. odd-size padding),
  * frame sampling into the image tier, first-frame features, and the
  * fail-loud boundaries (non-AVI, DHT-less frames, hostile sizes). */
class AviSpec extends SparkSpec {

  // two visually distinct 16x8 frames (flat gray vs half split)
  private def grayFrame(level: Int): Array[Byte] =
    TestJpeg(16, 8, Array.fill[Byte](16 * 8)(level.toByte), grayscale = true)

  private def media(bytes: Array[Byte], id: Long = 1L) =
    Multimodal.Media(id, "video/avi", bytes)

  test("parseAvi: header info and frame ranges, word-aligned chunks") {
    val f0 = grayFrame(128)
    val f1 = grayFrame(40)
    // force an ODD chunk size to exercise the pad rule
    val odd = if (f0.length % 2 == 0) f0 :+ 0xd9.toByte else f0
    val avi = TestAvi(16, 8, Seq(odd, f1))
    val (info, chunks) = Avi.parseAvi(avi, 1L)
    assert(info.width == 16 && info.height == 8 && info.totalFrames == 2)
    assert(chunks.length == 2)
    val back0 = java.util.Arrays.copyOfRange(avi, chunks(0)._1,
      chunks(0)._1 + chunks(0)._2)
    assert(back0.toSeq == odd.toSeq, "frame bytes survive the container walk")
  }

  test("decodeAvi: first frame through the real JPEG codec") {
    val avi = TestAvi(16, 8, Seq(grayFrame(128), grayFrame(40)))
    val f = Avi.decodeAvi(media(avi))
    assert(f.kind == "video/avi" && f.width == 16 && f.height == 8)
    assert(math.abs(f.features(0) - 128f / 255) < 2e-2) // mean of frame 0, not 1
    assert(f.n_bytes == avi.length)
  }

  test("aviFrameSample bridges frames into decodeFeatures") {
    import spark.implicits._
    val avi = TestAvi(16, 8, Seq(grayFrame(128), grayFrame(40), grayFrame(200)))
    val frames = Avi.aviFrameSample(
      Seq(media(avi)).toDS(), every = 2).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(frames.forall(_.kind == "image/jpeg"))
    val feats = Multimodal.decodeFeatures(
        frames.toSeq.toDS().map(fr =>
          Multimodal.Media(fr.media_id * 10 + fr.frame_idx, fr.kind, fr.frame)))
      .collect().sortBy(_.media_id)
    assert(math.abs(feats(0).features(0) - 128f / 255) < 2e-2)
    assert(math.abs(feats(1).features(0) - 200f / 255) < 2e-2)
  }

  test("decodeFeatures routes video/avi to the real codec") {
    import spark.implicits._
    val avi = TestAvi(16, 8, Seq(grayFrame(90)))
    val f = Multimodal.decodeFeatures(Seq(media(avi)).toDS()).collect().head
    assert(f.width == 16 && math.abs(f.features(0) - 90f / 255) < 2e-2)
  }

  test("not an AVI, overrunning chunk, and frameless AVI fail loudly") {
    intercept[IllegalArgumentException] {
      Avi.parseAvi("RIFF....WAVE".getBytes("US-ASCII"), 7L)
    }
    // chunk size past the parent
    val avi = TestAvi(16, 8, Seq(grayFrame(128)))
    val evil = avi.clone()
    // find the 00dc chunk and corrupt its size field to huge
    val idx = avi.indexOfSlice("00dc".getBytes("US-ASCII"))
    evil(idx + 4) = 0xff.toByte; evil(idx + 5) = 0xff.toByte
    evil(idx + 6) = 0xff.toByte; evil(idx + 7) = 0x7f.toByte
    val e = intercept[IllegalArgumentException] { Avi.parseAvi(evil, 9L) }
    assert(e.getMessage.contains("overruns"))
  }

  test("DHT-less MJPEG decodes bit-identically via the Annex K splice") {
    // TestJpeg codes with exactly the Annex K typical tables, so a frame
    // with its DHT STRIPPED (the hardware-MJPEG convention) must decode
    // to the very same pixels once the standard tables are spliced in
    val f = grayFrame(128)
    val out = new java.io.ByteArrayOutputStream()
    var p = 0
    out.write(f(0)); out.write(f(1)); p = 2
    var inScan = false
    while (p < f.length) {
      if (!inScan && (f(p) & 0xff) == 0xff && (f(p + 1) & 0xff) == 0xc4) {
        val len = ((f(p + 2) & 0xff) << 8) | (f(p + 3) & 0xff)
        p += 2 + len
      } else {
        if (!inScan && (f(p) & 0xff) == 0xff && (f(p + 1) & 0xff) == 0xda)
          inScan = true
        out.write(f(p)); p += 1
      }
    }
    val stripped = out.toByteArray
    assert(stripped.length < f.length, "the strip must remove a DHT")
    val tabled = Avi.decodeAvi(media(TestAvi(16, 8, Seq(f)), 4L))
    val dhtless = Avi.decodeAvi(media(TestAvi(16, 8, Seq(stripped)), 5L))
    assert(tabled.features.toSeq == dhtless.features.toSeq)
    assert(dhtless.width == 16 && dhtless.height == 8)
  }
}
