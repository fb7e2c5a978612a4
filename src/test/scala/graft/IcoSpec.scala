package graft

import graft.operators.{Ico, Multimodal}
import graft.operators.Multimodal.Media

/** ICO decode: directory walk, largest-image selection, the DIB
  * (doubled-height, AND mask) re-headering path, the PNG-entry path,
  * cross-format hash parity, and the fail-loud boundaries. */
class IcoSpec extends SparkSpec {

  private def canvas(w: Int, h: Int, seed: Int = 1): Array[Byte] =
    Array.tabulate[Byte](w * h * 3)(j => ((seed * 131 + j * 7) & 0xff).toByte)

  test("dib form: largest image decodes, doubled height unwound") {
    val big = canvas(32, 24)
    val ico = Ico.writeIco(Seq((8, 8, canvas(8, 8, 2)), (32, 24, big)))
    assert(Ico.icoInfo(ico, 1L) == Ico.IcoInfo(32, 24, 2, "dib"))
    val (w, h, rgb) = Ico.decodeIcoCanvas(ico, 1L)
    assert(w == 32 && h == 24)
    assert(java.util.Arrays.equals(rgb, big))
  }

  test("png form: a PNG entry routes through the PNG codec") {
    val rgb = canvas(16, 16, 3)
    val png = TestPng(16, 16, colorType = 2, rgb) // truecolor RGB
    // hand-build a directory whose single entry is the PNG
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    w16(0); w16(1); w16(1)
    out.write(16); out.write(16); out.write(0); out.write(0)
    w16(1); w16(32); w32(png.length); w32(6 + 16)
    out.write(png)
    val ico = out.toByteArray
    assert(Ico.icoInfo(ico, 2L).form == "png")
    val (w, h, decoded) = Ico.decodeIcoCanvas(ico, 2L)
    assert(w == 16 && h == 16 && java.util.Arrays.equals(decoded, rgb))
  }

  test("cross-format: an ICO hashes like the PPM of its largest image") {
    val rgb = canvas(40, 30, 5)
    val ico = Ico.writeIco(Seq((40, 30, rgb)))
    val ppm = ("P6\n40 30\n255\n").getBytes("US-ASCII") ++ rgb
    assert(Multimodal.perceptualHash64(Media(1L, "image/x-icon", ico)) ==
      Multimodal.perceptualHash64(Media(2L, "image/ppm", ppm)))
    import spark.implicits._
    val feats = Multimodal.decodeFeatures(
      Seq(Media(3L, "image/vnd.microsoft.icon", ico)).toDS()).collect()
    assert(feats(0).width == 40 && feats(0).height == 30)
  }

  test("fail-loud: magic, truncated entry, odd doubled height") {
    intercept[IllegalArgumentException] {
      Ico.decodeIcoCanvas(Array[Byte](1, 2, 3, 4, 5, 6, 7), 4L)
    }
    val good = Ico.writeIco(Seq((10, 10, canvas(10, 10))))
    intercept[IllegalArgumentException] {
      Ico.decodeIcoCanvas(good.take(good.length / 2), 5L)
    }
    // corrupt the doubled-height field to an odd value
    val bad = good.clone()
    bad(6 + 16 + 8) = 21 // DIB height low byte (2*10 -> 21)
    val e = intercept[IllegalArgumentException] {
      Ico.decodeIcoCanvas(bad, 6L)
    }
    assert(e.getMessage.contains("doubled"))
  }
}
