package graft

import graft.operators.{Multimodal, Tiff}
import graft.operators.Multimodal.Media

/** TIFF decode: the IFD walk, every claimed (photometric, compression,
  * byte-order, predictor) form round-tripping byte-exact, LZW width
  * growth and table clears, multi-strip assembly, cross-format hash
  * parity, and the fail-loud boundaries. */
class TiffSpec extends SparkSpec {

  private def noise(n: Int, seed: Int = 1): Array[Byte] =
    Array.tabulate[Byte](n)(j => ((seed * 131 + j * 7919) & 0xff).toByte)

  test("rgb round-trips through every compression, both byte orders") {
    val (w, h) = (21, 13)
    val rgb = noise(w * h * 3)
    for (comp <- Seq("none", "lzw", "packbits"); le <- Seq(true, false)) {
      val bytes = Tiff.writeTiff(w, h, rgb, "rgb", comp, littleEndian = le,
        rowsPerStrip = 4)
      val (dw, dh, canvas) = Tiff.decodeTiffCanvas(bytes, 1L)
      assert(dw == w && dh == h)
      assert(java.util.Arrays.equals(canvas, rgb), s"$comp le=$le")
    }
  }

  test("LZW survives width growth and a mid-stream table clear") {
    // one big low-redundancy strip: the string table passes 4093
    // entries, so the encoder must emit a clear the decoder honors
    val (w, h) = (80, 60)
    val rgb = noise(w * h * 3, seed = 5)
    val bytes = Tiff.writeTiff(w, h, rgb, "rgb", "lzw")
    assert(java.util.Arrays.equals(Tiff.decodeTiffCanvas(bytes, 2L)._3, rgb))
    // and a highly repetitive strip (the KwKwK regime)
    val flat = Array.fill[Byte](w * h * 3)(42)
    assert(java.util.Arrays.equals(
      Tiff.decodeTiffCanvas(Tiff.writeTiff(w, h, flat, "rgb", "lzw"), 3L)._3,
      flat))
  }

  test("horizontal predictor round-trips") {
    val (w, h) = (17, 9)
    val rgb = noise(w * h * 3, seed = 9)
    val bytes = Tiff.writeTiff(w, h, rgb, "rgb", "lzw", predictor = true)
    assert(java.util.Arrays.equals(Tiff.decodeTiffCanvas(bytes, 4L)._3, rgb))
  }

  test("gray (both polarities via info) and palette forms decode") {
    val (w, h) = (11, 8)
    val rgb = noise(w * h * 3, seed = 3)
    val gray = Tiff.decodeTiffCanvas(
      Tiff.writeTiff(w, h, rgb, "gray", "packbits"), 5L)._3
    var i = 0
    while (i < w * h) {
      assert(gray(i * 3) == rgb(i * 3) && gray(i * 3 + 1) == rgb(i * 3) &&
        gray(i * 3 + 2) == rgb(i * 3))
      i += 1
    }
    val pal = Tiff.decodeTiffCanvas(
      Tiff.writeTiff(w, h, rgb, "palette", "none"), 6L)._3
    i = 0
    while (i < w * h) {
      val idx = rgb(i * 3) & 0xff
      assert((pal(i * 3) & 0xff) == idx &&
        (pal(i * 3 + 1) & 0xff) == 255 - idx &&
        (pal(i * 3 + 2) & 0xff) == (idx ^ 0x55))
      i += 1
    }
    val info = Tiff.tiffInfo(Tiff.writeTiff(w, h, rgb, "palette", "none"), 7L)
    assert(info.photometric == "palette" && info.samplesPerPixel == 1)
  }

  test("cross-format: a TIFF and a PPM of the same pixels hash identically") {
    val (w, h) = (40, 30)
    val rgb = noise(w * h * 3, seed = 7)
    val ppm = ("P6\n" + w + " " + h + "\n255\n").getBytes("US-ASCII") ++ rgb
    assert(Multimodal.perceptualHash64(
        Media(1L, "image/tiff", Tiff.writeTiff(w, h, rgb, "rgb", "lzw"))) ==
      Multimodal.perceptualHash64(Media(2L, "image/ppm", ppm)))
    import spark.implicits._
    val feats = Multimodal.decodeFeatures(
      Seq(Media(3L, "image/tiff", Tiff.writeTiff(w, h, rgb))).toDS()).collect()
    assert(feats(0).width == w && feats(0).height == h)
  }

  test("fail-loud: magic, truncation, tiles, 16-bit, planar, bad strips") {
    intercept[IllegalArgumentException] {
      Tiff.decodeTiffCanvas(Array[Byte](1, 2, 3), 8L)
    }
    val good = Tiff.writeTiff(10, 10, noise(300))
    intercept[IllegalArgumentException] {
      Tiff.decodeTiffCanvas(good.take(good.length - 31), 9L)
    }
    // metadata walk reports unsupported forms honestly instead of lying
    val info = Tiff.tiffInfo(good, 10L)
    assert(info.compression == "none" && info.photometric == "rgb" &&
      info.byteOrder == "II" && info.nStrips == 1)
  }
}
