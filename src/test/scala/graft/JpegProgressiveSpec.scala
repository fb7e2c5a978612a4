package graft

import graft.operators.Multimodal

/** Progressive JPEG: every decoded canvas must be BIT-IDENTICAL to the
  * baseline encoding of the same pixels (same coefficient math by
  * construction, so any divergence is a decoder defect in the
  * progressive scan paths — spectral selection, successive
  * approximation, EOB runs, refinement bits, non-interleaved
  * geometry). */
class JpegProgressiveSpec extends SparkSpec {

  private def scene(w: Int, h: Int, gray: Boolean): Array[Byte] = {
    val n = w * h * (if (gray) 1 else 3)
    val px = new Array[Byte](n)
    var i = 0
    while (i < n) {
      // deterministic structured content: gradients + a diagonal edge
      val p = i / (if (gray) 1 else 3)
      val x = p % w; val y = p / w
      val ch = i % (if (gray) 1 else 3)
      val v = ch match {
        case 0 => (x * 255 / math.max(1, w - 1) + (if (x > y) 80 else 0)) % 256
        case 1 => y * 255 / math.max(1, h - 1)
        case _ => (x * x + y * 3) % 256
      }
      px(i) = v.toByte
      i += 1
    }
    px
  }

  private def media(bytes: Array[Byte]) = Multimodal.Media(1L, "image/jpeg", bytes)

  private def assertIdentical(w: Int, h: Int, gray: Boolean,
      sub: Boolean, split: Boolean, approx: Boolean, quality: Int = 90): Unit = {
    val px = scene(w, h, gray)
    val base = Multimodal.decodeJpegCanvas(media(
      TestJpeg(w, h, px, quality = quality, grayscale = gray, subsample = sub)))
    val prog = Multimodal.decodeJpegCanvas(media(
      TestJpegProgressive(w, h, px, quality = quality, grayscale = gray,
        subsample = sub, splitAcBand = split, approx = approx)))
    assert(base._1 == prog._1 && base._2 == prog._2)
    assert(base._3.toSeq == prog._3.toSeq,
      s"canvas diverged for gray=$gray sub=$sub split=$split approx=$approx")
  }

  test("grayscale: spectral selection only") {
    assertIdentical(16, 16, gray = true, sub = false, split = false, approx = false)
  }

  test("grayscale: successive approximation with refinement scans") {
    assertIdentical(24, 16, gray = true, sub = false, split = true, approx = true)
  }

  test("color 4:4:4: split bands + successive approximation") {
    assertIdentical(24, 24, gray = false, sub = false, split = true, approx = true)
  }

  test("color 4:2:0: non-interleaved AC geometry (luma data width < padded width)") {
    // w = 24: luma MCU-padded grid is 4 blocks wide, data width 3 —
    // the single-component AC scans must walk 3, not 4
    assertIdentical(24, 24, gray = false, sub = true, split = true, approx = true)
  }

  test("color 4:2:0 with non-multiple dims and high quality") {
    assertIdentical(20, 12, gray = false, sub = true, split = false, approx = true, quality = 95)
  }

  test("low quality (sparser coefficients, longer EOB runs)") {
    assertIdentical(32, 24, gray = false, sub = false, split = true, approx = true, quality = 30)
  }

  test("flat image: everything rides cross-block EOB runs") {
    val px = Array.fill[Byte](32 * 16 * 3)(100.toByte)
    val base = Multimodal.decodeJpegCanvas(media(TestJpeg(32, 16, px)))
    val prog = Multimodal.decodeJpegCanvas(media(
      TestJpegProgressive(32, 16, px, splitAcBand = true, approx = true)))
    assert(base._3.toSeq == prog._3.toSeq)
  }

  test("decodeFeatures routes progressive streams like any JPEG") {
    import spark.implicits._
    val px = scene(16, 8, gray = true)
    val bytes = TestJpegProgressive(16, 8, px, grayscale = true)
    val f = Multimodal.decodeFeatures(Seq(media(bytes)).toDS()).collect().head
    assert(f.width == 16 && f.height == 8)
  }

  test("truncated progressive stream fails loudly") {
    val px = scene(16, 16, gray = true)
    val bytes = TestJpegProgressive(16, 16, px, grayscale = true)
    val cut = java.util.Arrays.copyOfRange(bytes, 0, bytes.length * 2 / 3)
    intercept[IllegalArgumentException] {
      Multimodal.decodeJpegCanvas(media(cut))
    }
  }
}
