package graft.operators

/** Pure-JVM ICO (Windows icon) decode — the favicon format, one of
  * the most-fetched image kinds in any crawl. An ICO is a directory
  * (reserved 0 / type 1 / count, then 16-byte entries with
  * dimensions, bit depth, size, offset) over images that are each
  * either a PNG (modern, magic-sniffed) or a headerless DIB whose
  * header height covers BOTH the XOR pixel block and the 1-bit AND
  * transparency mask.
  *
  * Decode composes what is already in-tree: PNG entries ride the full
  * [[Multimodal]] PNG codec; DIB entries are re-headered (a synthetic
  * `BM` file header, the doubled height patched back to the pixel
  * height) and ride [[Bmp.decodeBmpCanvas]] — 32/24-bpp and 8-bpp
  * palette forms, the crawl-real favicon set. The LARGEST image in
  * the directory is the canvas (what a catalog or perceptual hash
  * wants); the AND mask is ignored (pixels composite as opaque, the
  * same treatment the PNG path gives alpha on the RGB canvas).
  *
  * Fail-loudly contract: bad directory magic, an entry overrunning
  * the payload, an unsupported DIB depth, or a compressed inner DIB
  * throws `IllegalArgumentException` with the media id. */
object Ico {

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], p: Int): Long =
    (u16(b, p) & 0xffffL) | ((u16(b, p + 2) & 0xffffL) << 16)

  /** (width, height, entryCount, form) of the image the canvas would
    * use — `form` is `png` or `dib`. */
  final case class IcoInfo(width: Int, height: Int, nImages: Int, form: String)

  private def best(b: Array[Byte], mediaId: Long): (Int, Int, Int, Int, Int) = {
    require(b.length >= 6, s"media $mediaId: payload too short for ICO")
    require(u16(b, 0) == 0 && u16(b, 2) == 1,
      s"media $mediaId: ICO directory magic missing")
    val n = u16(b, 4)
    require(n > 0 && 6 + n * 16 <= b.length,
      s"media $mediaId: ICO directory holds $n entries but truncates")
    var bestI = -1; var bestPx = -1L
    var i = 0
    while (i < n) {
      val e = 6 + i * 16
      val w = if ((b(e) & 0xff) == 0) 256 else b(e) & 0xff
      val h = if ((b(e + 1) & 0xff) == 0) 256 else b(e + 1) & 0xff
      if (w.toLong * h > bestPx) { bestPx = w.toLong * h; bestI = i }
      i += 1
    }
    val e = 6 + bestI * 16
    val size = u32(b, e + 8).toInt
    val off = u32(b, e + 12).toInt
    require(off >= 0 && size >= 0 && off + size <= b.length,
      s"media $mediaId: ICO entry $bestI overruns the payload")
    val w = if ((b(e) & 0xff) == 0) 256 else b(e) & 0xff
    val h = if ((b(e + 1) & 0xff) == 0) 256 else b(e + 1) & 0xff
    (w, h, n, off, size)
  }

  private def isPng(b: Array[Byte], off: Int, size: Int): Boolean =
    size >= 8 && (b(off) & 0xff) == 0x89 && b(off + 1) == 'P' &&
      b(off + 2) == 'N' && b(off + 3) == 'G'

  /** Directory metadata (decodes nothing beyond the entry table). */
  def icoInfo(b: Array[Byte], mediaId: Long = -1L): IcoInfo = {
    val (w, h, n, off, size) = best(b, mediaId)
    IcoInfo(w, h, n, if (isPng(b, off, size)) "png" else "dib")
  }

  /** Row-major RGB canvas (3 B/px) of the LARGEST directory image. */
  def decodeIcoCanvas(b: Array[Byte], mediaId: Long): (Int, Int, Array[Byte]) = {
    val (_, _, _, off, size) = best(b, mediaId)
    if (isPng(b, off, size)) {
      Multimodal.decodePngCanvas(Multimodal.Media(mediaId, "image/png",
        java.util.Arrays.copyOfRange(b, off, off + size)))
    } else {
      // headerless DIB: dibSize, width, DOUBLED height, planes, bpp, …
      require(size >= 40, s"media $mediaId: truncated ICO DIB header")
      val dibSize = u32(b, off).toInt
      require(dibSize == 40,
        s"media $mediaId: ICO DIB header size $dibSize unsupported")
      val width = u32(b, off + 4).toInt
      val h2 = u32(b, off + 8).toInt
      require(h2 % 2 == 0 && h2 > 0,
        s"media $mediaId: ICO DIB height $h2 is not the doubled XOR+AND form")
      val height = h2 / 2
      val bpp = u16(b, off + 14)
      require(u32(b, off + 16) == 0L,
        s"media $mediaId: compressed ICO DIB unsupported")
      val palBytes = bpp match {
        case 32 | 24 => 0
        case 8 =>
          val used = u32(b, off + 32).toInt
          (if (used > 0) used else 256) * 4
        case d => throw new IllegalArgumentException(
          s"media $mediaId: ICO DIB depth $d unsupported (32/24/8)")
      }
      val stride = (width * (bpp / 8) + 3) & ~3
      val xorBytes = stride * height
      require(40 + palBytes + xorBytes <= size,
        s"media $mediaId: ICO DIB pixel block overruns its entry")
      // synthesize a BMP: file header + the DIB with its true height
      val dataAt = 14 + 40 + palBytes
      val bmp = new java.io.ByteArrayOutputStream(dataAt + xorBytes)
      bmp.write('B'); bmp.write('M')
      def w32(v: Long): Unit = {
        bmp.write((v & 0xff).toInt); bmp.write(((v >> 8) & 0xff).toInt)
        bmp.write(((v >> 16) & 0xff).toInt); bmp.write(((v >> 24) & 0xff).toInt)
      }
      w32((dataAt + xorBytes).toLong); w32(0L); w32(dataAt.toLong)
      bmp.write(b, off, 8) // dibSize + width
      w32(height.toLong) // the UNDOUBLED height
      bmp.write(b, off + 12, 40 - 12 + palBytes) // rest of DIB + palette
      bmp.write(b, off + 40 + palBytes, xorBytes) // XOR block only
      Bmp.decodeBmpCanvas(bmp.toByteArray, mediaId)
    }
  }

  // -- generator (staging/spec counterpart) ------------------------------

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Serialize images (each (width, height, row-major RGB)) as a
    * DIB-form ICO: 32-bpp XOR block (opaque alpha) + an all-zero AND
    * mask, the classic favicon layout. Dimensions ≤ 256. */
  def writeIco(images: Seq[(Int, Int, Array[Byte])]): Array[Byte] = {
    require(images.nonEmpty, "writeIco needs at least one image")
    val bodies = images.map { case (w, h, rgb) =>
      require(w > 0 && w <= 256 && h > 0 && h <= 256,
        s"ICO dimensions ${w}x$h out of range")
      require(rgb.length == w * h * 3, "writeIco: canvas size mismatch")
      val stride = w * 4 // 32-bpp rows are already word-aligned
      val maskStride = ((w + 7) / 8 + 3) & ~3
      val out = new java.io.ByteArrayOutputStream()
      out.write(le32(40L)); out.write(le32(w.toLong))
      out.write(le32(2L * h)) // doubled height
      out.write(le16(1)); out.write(le16(32))
      out.write(le32(0L)); out.write(le32((stride * h + maskStride * h).toLong))
      out.write(le32(2835L)); out.write(le32(2835L))
      out.write(le32(0L)); out.write(le32(0L))
      var y = h - 1 // bottom-up rows
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val s = (y * w + x) * 3
          out.write(rgb(s + 2) & 0xff); out.write(rgb(s + 1) & 0xff)
          out.write(rgb(s) & 0xff); out.write(0xff) // BGRA, opaque
          x += 1
        }
        y -= 1
      }
      out.write(new Array[Byte](maskStride * h)) // all-visible AND mask
      out.toByteArray
    }
    val dir = new java.io.ByteArrayOutputStream()
    dir.write(le16(0)); dir.write(le16(1)); dir.write(le16(images.length))
    var off = 6 + images.length * 16
    images.zip(bodies).foreach { case ((w, h, _), body) =>
      dir.write(if (w == 256) 0 else w); dir.write(if (h == 256) 0 else h)
      dir.write(0); dir.write(0) // palette count, reserved
      dir.write(le16(1)); dir.write(le16(32))
      dir.write(le32(body.length.toLong)); dir.write(le32(off.toLong))
      off += body.length
    }
    bodies.foreach(dir.write)
    dir.toByteArray
  }
}
