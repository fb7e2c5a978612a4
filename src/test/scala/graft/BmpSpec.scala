package graft

import graft.operators.{Bmp, Multimodal}
import graft.operators.Multimodal.Media

/** BMP pixel decode: all four supported forms round-trip exactly, row
  * orders, RLE8 escapes, cross-format perceptual-hash pairing, and
  * the fail-loud boundaries. */
class BmpSpec extends SparkSpec {

  private def canvas(w: Int, h: Int)(f: Int => Int): Array[Byte] =
    Array.tabulate[Byte](w * h * 3)(j => (f(j) & 0xff).toByte)

  test("24-bpp bottom-up and 32-bpp top-down round-trip exactly") {
    val (w, h) = (13, 7) // odd width: the stride-padding path
    val rgb = canvas(w, h)(j => j * 5 + 1)
    assert(java.util.Arrays.equals(
      Bmp.decodeBmpCanvas(Bmp.writeBmp(w, h, rgb), 1L)._3, rgb))
    assert(java.util.Arrays.equals(
      Bmp.decodeBmpCanvas(Bmp.writeBmp(w, h, rgb, bpp = 32, topDown = true), 2L)._3,
      rgb))
  }

  test("8-bpp palette and RLE8 round-trip through the palette") {
    val (w, h) = (11, 6)
    val palette = Array.tabulate[Byte](5 * 3)(j => ((j * 41 + 3) & 0xff).toByte)
    val indices = Array.tabulate[Byte](w * h)(j => (j % 5).toByte)
    val expected = Array.tabulate[Byte](w * h * 3) { j =>
      palette((indices(j / 3) & 0xff) * 3 + j % 3)
    }
    assert(java.util.Arrays.equals(
      Bmp.decodeBmpCanvas(Bmp.writeBmp8(w, h, indices, palette), 3L)._3,
      expected))
    assert(java.util.Arrays.equals(
      Bmp.decodeBmpCanvas(Bmp.writeBmp8(w, h, indices, palette, rle = true), 4L)._3,
      expected))
  }

  test("RLE8 absolute mode and delta escape decode") {
    // hand-built: 4x2, palette {0:red, 1:green}; row 0 (bottom) has an
    // absolute run of 3 + one literal run; row 1 starts with a delta
    val pal = Array[Byte](-1, 0, 0, 0, -1, 0) // (255,0,0), (0,255,0)
    val palBgra = Array[Byte](0, 0, -1, 0, 0, -1, 0, 0)
    val rle = Array[Byte](
      0, 3, 0, 1, 0, 0, // absolute: 3 literals (0,1,0) + pad
      1, 1, // run: 1 pixel of index 1
      0, 0, // end of line
      0, 2, 2, 0, // delta: skip 2 right (stays on row 1)
      2, 0, // run: 2 pixels of index 0
      0, 1) // end of bitmap
    val header = {
      val h = Bmp.writeBmp8(4, 2, new Array[Byte](8), pal, rle = true)
      h.take(14 + 40 + 8) // reuse the generator's header + palette
    }
    assert(java.util.Arrays.equals(header.slice(14 + 40, 14 + 40 + 8), palBgra))
    val bytes = header ++ rle
    val (w, h2, rgb) = Bmp.decodeBmpCanvas(bytes, 5L)
    assert(w == 4 && h2 == 2)
    def px(x: Int, y: Int) = // y from the TOP of the final canvas
      (rgb((y * 4 + x) * 3) & 0xff, rgb((y * 4 + x) * 3 + 1) & 0xff)
    // bottom row (canvas y=1): red green red green
    assert(px(0, 1) == (255, 0) && px(1, 1) == (0, 255))
    assert(px(2, 1) == (255, 0) && px(3, 1) == (0, 255))
    // top row (canvas y=0): delta skipped (0,0) stays black, then red red
    assert(px(0, 0) == (0, 0) && px(1, 0) == (0, 0))
    assert(px(2, 0) == (255, 0) && px(3, 0) == (255, 0))
  }

  test("cross-format: a BMP and a PPM of the same pixels hash identically") {
    val (w, h) = (40, 30)
    val rgb = canvas(w, h)(j => (j / 3) % 251)
    val ppm = ("P6\n" + w + " " + h + "\n255\n").getBytes("US-ASCII") ++ rgb
    assert(Multimodal.perceptualHash64(Media(1L, "image/bmp", Bmp.writeBmp(w, h, rgb))) ==
      Multimodal.perceptualHash64(Media(2L, "image/ppm", ppm)))
    // and the feature bridge reports real pixels
    import spark.implicits._
    val feats = Multimodal.decodeFeatures(
      Seq(Media(3L, "image/bmp", Bmp.writeBmp(w, h, rgb))).toDS()).collect()
    assert(feats(0).width == w && feats(0).height == h)
  }

  test("fail-loud: magic, truncation, bad palette index, unsupported form") {
    intercept[IllegalArgumentException] {
      Bmp.decodeBmpCanvas(Array[Byte](1, 2, 3), 6L)
    }
    val good = Bmp.writeBmp(8, 8, canvas(8, 8)(identity))
    intercept[IllegalArgumentException] {
      Bmp.decodeBmpCanvas(good.take(good.length - 9), 7L)
    }
    // a palette BMP whose pixel references index >= nColors
    val bad8 = Bmp.writeBmp8(4, 1, Array[Byte](0, 1, 2, 3),
      Array.tabulate[Byte](3 * 3)(_.toByte)) // only 3 colors
    val e = intercept[IllegalArgumentException] {
      Bmp.decodeBmpCanvas(bad8, 8L)
    }
    assert(e.getMessage.contains("palette index"))
    // 16-bpp is refused, not mis-decoded
    val bad16 = good.clone()
    bad16(28) = 16
    intercept[IllegalArgumentException] {
      Bmp.decodeBmpCanvas(bad16, 9L)
    }
  }
}
