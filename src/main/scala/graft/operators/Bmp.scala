package graft.operators

/** Pure-JVM BMP (Windows DIB) pixel decode — unlike the metadata-only
  * container walks, BMP's dominant on-disk forms are raw pixels, so
  * this codec joins PPM/PNG/GIF/JPEG as a FULL decoder: BMPs land on
  * the same RGB canvas, take real pixel features, and perceptual-hash
  * dedup pairs a BMP with a PNG of the same image at Hamming 0.
  *
  * Supported forms (the crawl-real set): BITMAPINFOHEADER and its V4/
  * V5 supersets (same 40-byte prefix), bottom-up and top-down rows,
  * `BI_RGB` at 8 (palette), 24, and 32 bits/pixel, and `BI_RLE8`
  * (escape 0/1/2 + absolute mode, word-aligned). 1/4/16-bpp and
  * BITFIELDS forms fail loudly — rare in crawls, and a wrong channel
  * unpack would silently poison the hash space.
  *
  * Fail-loudly contract ([[Multimodal]] codec rule): bad magic,
  * truncated headers/pixel data, an out-of-range palette index, or an
  * RLE run escaping the canvas throws `IllegalArgumentException` with
  * the media id. */
object Bmp {

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  private def s32(b: Array[Byte], p: Int): Int = u32(b, p).toInt

  /** Row-major RGB canvas (3 B/px) of a BMP payload. */
  def decodeBmpCanvas(b: Array[Byte], mediaId: Long): (Int, Int, Array[Byte]) = {
    require(b.length >= 54, s"media $mediaId: payload too short for BMP")
    require(b(0) == 'B' && b(1) == 'M',
      s"media $mediaId: BM magic missing — not a BMP payload")
    val dataAt = u32(b, 10).toInt
    val dibSize = u32(b, 14).toInt
    require(dibSize == 40 || dibSize == 52 || dibSize == 56 ||
        dibSize == 108 || dibSize == 124,
      s"media $mediaId: unsupported DIB header size $dibSize")
    val width = s32(b, 18)
    val rawHeight = s32(b, 22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    require(width > 0 && height > 0 && width.toLong * height <= (64L << 20),
      s"media $mediaId: degenerate BMP dimensions ${width}x$rawHeight")
    require(u16(b, 26) == 1, s"media $mediaId: BMP planes != 1")
    val bpp = u16(b, 28)
    val compression = u32(b, 30).toInt
    require(dataAt >= 14 + dibSize && dataAt <= b.length,
      s"media $mediaId: BMP pixel-data offset $dataAt out of range")
    val out = new Array[Byte](width * height * 3)
    def rowBase(y: Int): Int = // y = scan order index
      (if (topDown) y else height - 1 - y) * width * 3
    (bpp, compression) match {
      case (24, 0) | (32, 0) =>
        val px = bpp / 8
        val stride = (width * px + 3) & ~3
        require(dataAt + stride.toLong * height <= b.length,
          s"media $mediaId: BMP pixel data truncated")
        var y = 0
        while (y < height) {
          val src = dataAt + y * stride
          val dst = rowBase(y)
          var x = 0
          while (x < width) {
            // BGR(A) order on disk
            out(dst + x * 3) = b(src + x * px + 2)
            out(dst + x * 3 + 1) = b(src + x * px + 1)
            out(dst + x * 3 + 2) = b(src + x * px)
            x += 1
          }
          y += 1
        }
      case (8, 0) | (8, 1) =>
        val clrUsed = u32(b, 46).toInt
        val nColors = if (clrUsed > 0) clrUsed else 256
        val palAt = 14 + dibSize
        require(palAt + nColors * 4 <= dataAt,
          s"media $mediaId: BMP palette overruns the pixel-data offset")
        def put(x: Int, yScan: Int, idx: Int): Unit = {
          require(idx < nColors,
            s"media $mediaId: palette index $idx out of range ($nColors entries)")
          require(x < width && yScan < height,
            s"media $mediaId: BMP pixel write outside the canvas ($x, $yScan)")
          val dst = rowBase(yScan) + x * 3
          out(dst) = b(palAt + idx * 4 + 2) // palette entries are BGRA
          out(dst + 1) = b(palAt + idx * 4 + 1)
          out(dst + 2) = b(palAt + idx * 4)
        }
        if (compression == 0) {
          val stride = (width + 3) & ~3
          require(dataAt + stride.toLong * height <= b.length,
            s"media $mediaId: BMP pixel data truncated")
          var y = 0
          while (y < height) {
            var x = 0
            while (x < width) {
              put(x, y, b(dataAt + y * stride + x) & 0xff)
              x += 1
            }
            y += 1
          }
        } else {
          // BI_RLE8: bottom-up only per spec (top-down RLE is invalid)
          require(!topDown, s"media $mediaId: top-down RLE8 BMP is invalid")
          var p = dataAt
          var x = 0
          var y = 0
          var done = false
          while (!done) {
            require(p + 2 <= b.length,
              s"media $mediaId: RLE8 stream truncated at $p")
            val n = b(p) & 0xff
            val v = b(p + 1) & 0xff
            p += 2
            if (n > 0) { // run of n pixels of palette index v
              var i = 0
              while (i < n) { put(x, y, v); x += 1; i += 1 }
            } else v match {
              case 0 => x = 0; y += 1 // end of line
              case 1 => done = true // end of bitmap
              case 2 => // delta: unsigned (dx, dy) offset
                require(p + 2 <= b.length,
                  s"media $mediaId: RLE8 delta truncated")
                x += b(p) & 0xff; y += b(p + 1) & 0xff; p += 2
              case count => // absolute mode: count literal indices
                require(p + count <= b.length,
                  s"media $mediaId: RLE8 absolute run truncated")
                var i = 0
                while (i < count) { put(x, y, b(p + i) & 0xff); x += 1; i += 1 }
                p += count + (count & 1) // word-aligned
            }
          }
        }
      case (bits, comp) => throw new IllegalArgumentException(
        s"media $mediaId: unsupported BMP form ($bits bpp, compression $comp)")
    }
    (width, height, out)
  }

  // -- generator (staging/spec counterpart) ------------------------------

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def headers(width: Int, height: Int, bpp: Int, compression: Int,
      paletteBytes: Int, pixelBytes: Int, topDown: Boolean): Array[Byte] = {
    val dataAt = 14 + 40 + paletteBytes
    "BM".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      le32((dataAt + pixelBytes).toLong) ++ le32(0L) ++ le32(dataAt.toLong) ++
      le32(40L) ++ le32(width.toLong) ++
      le32((if (topDown) -height else height).toLong) ++
      le16(1) ++ le16(bpp) ++ le32(compression.toLong) ++
      le32(pixelBytes.toLong) ++ le32(2835L) ++ le32(2835L) ++
      le32(if (paletteBytes > 0) (paletteBytes / 4).toLong else 0L) ++ le32(0L)
  }

  /** Serialize `rgb` (row-major, 3 B/px) as an uncompressed 24- or
    * 32-bpp BMP, bottom-up or top-down. */
  def writeBmp(width: Int, height: Int, rgb: Array[Byte], bpp: Int = 24,
      topDown: Boolean = false): Array[Byte] = {
    require(bpp == 24 || bpp == 32, s"writeBmp: bpp $bpp")
    require(rgb.length == width * height * 3, "writeBmp: canvas size mismatch")
    val px = bpp / 8
    val stride = (width * px + 3) & ~3
    val data = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val srcRow = (if (topDown) y else height - 1 - y) * width * 3
      var x = 0
      while (x < width) {
        data(y * stride + x * px) = rgb(srcRow + x * 3 + 2)
        data(y * stride + x * px + 1) = rgb(srcRow + x * 3 + 1)
        data(y * stride + x * px + 2) = rgb(srcRow + x * 3)
        if (px == 4) data(y * stride + x * px + 3) = 0xff.toByte
        x += 1
      }
      y += 1
    }
    headers(width, height, bpp, 0, 0, data.length, topDown) ++ data
  }

  /** Serialize indexed pixels as an 8-bpp palette BMP — RLE8-compressed
    * when `rle` (row runs + end-of-line/bitmap escapes), uncompressed
    * otherwise. `palette` is (r, g, b) triples. */
  def writeBmp8(width: Int, height: Int, indices: Array[Byte],
      palette: Array[Byte], rle: Boolean = false): Array[Byte] = {
    require(indices.length == width * height, "writeBmp8: index size mismatch")
    require(palette.length % 3 == 0 && palette.length / 3 <= 256,
      "writeBmp8: palette shape")
    val nColors = palette.length / 3
    val pal = new Array[Byte](nColors * 4)
    var c = 0
    while (c < nColors) { // BGRA entries
      pal(c * 4) = palette(c * 3 + 2)
      pal(c * 4 + 1) = palette(c * 3 + 1)
      pal(c * 4 + 2) = palette(c * 3)
      c += 1
    }
    val data = new java.io.ByteArrayOutputStream()
    if (!rle) {
      val stride = (width + 3) & ~3
      val rows = new Array[Byte](stride * height)
      var y = 0
      while (y < height) {
        val srcRow = (height - 1 - y) * width // bottom-up
        var x = 0
        while (x < width) { rows(y * stride + x) = indices(srcRow + x); x += 1 }
        y += 1
      }
      data.write(rows)
    } else {
      var y = 0
      while (y < height) {
        val srcRow = (height - 1 - y) * width // RLE8 is bottom-up
        var x = 0
        while (x < width) {
          val v = indices(srcRow + x)
          var run = 1
          while (x + run < width && run < 255 && indices(srcRow + x + run) == v)
            run += 1
          data.write(run); data.write(v & 0xff)
          x += run
        }
        data.write(0); data.write(0) // end of line
        y += 1
      }
      data.write(0); data.write(1) // end of bitmap
    }
    val bytes = data.toByteArray
    headers(width, height, 8, if (rle) 1 else 0, pal.length, bytes.length,
      topDown = false) ++ pal ++ bytes
  }
}
