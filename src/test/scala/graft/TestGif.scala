package graft

/** Minimal GIF89a encoder for planted tests: logical screen + global
  * color table, per-frame graphic-control extensions (disposal,
  * transparency), frame sub-rectangles with optional local color tables
  * and interlacing, and a REAL LZW compressor (string-table growth,
  * width bumps, clear-code resets at dictionary overflow) so the
  * decoder's dictionary path — including the KwKwK case — is exercised,
  * not just literals. Test-only; the production decoder is
  * `Multimodal.decodeGif`/`gifFrameSample`. */
object TestGif {

  final case class Frame(left: Int, top: Int, w: Int, h: Int,
      pixels: Array[Byte], // palette indices, row-major
      disposal: Int = 0, transparentIdx: Int = -1,
      localPalette: Array[Byte] = null, interlaced: Boolean = false)

  /** Encode frames over a `w`x`h` canvas with `palette` (RGB triples,
    * power-of-two entry count >= 2) as the global color table. */
  def apply(w: Int, h: Int, palette: Array[Byte], frames: Seq[Frame],
      bgIdx: Int = 0): Array[Byte] = {
    require(palette.length % 3 == 0 && Integer.bitCount(palette.length / 3) == 1 &&
      palette.length >= 6, "palette must hold a power-of-two >= 2 RGB entries")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    u16(w); u16(h)
    val gctBits = 31 - Integer.numberOfLeadingZeros(palette.length / 3)
    u8(0x80 | (gctBits - 1)) // GCT present, size 2^gctBits
    u8(bgIdx); u8(0)
    out.write(palette)
    for (f <- frames) {
      if (f.disposal != 0 || f.transparentIdx >= 0) {
        u8(0x21); u8(0xf9); u8(4)
        u8((f.disposal << 2) | (if (f.transparentIdx >= 0) 1 else 0))
        u16(0) // delay
        u8(math.max(f.transparentIdx, 0))
        u8(0)
      }
      u8(0x2c); u16(f.left); u16(f.top); u16(f.w); u16(f.h)
      if (f.localPalette != null) {
        val n = f.localPalette.length / 3
        require(f.localPalette.length % 3 == 0 && Integer.bitCount(n) == 1 && n >= 2,
          "local palette must hold a power-of-two >= 2 RGB entries")
        val bits = 31 - Integer.numberOfLeadingZeros(n)
        u8(0x80 | (if (f.interlaced) 0x40 else 0) | (bits - 1))
        out.write(f.localPalette)
      } else u8(if (f.interlaced) 0x40 else 0)
      val palEntries =
        (if (f.localPalette != null) f.localPalette.length else palette.length) / 3
      val src = if (!f.interlaced) f.pixels else {
        // store rows in pass order (the decoder must undo this)
        val stored = new Array[Byte](f.pixels.length)
        var r = 0
        for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
             y <- start until f.h by step) {
          System.arraycopy(f.pixels, y * f.w, stored, r * f.w, f.w); r += 1
        }
        stored
      }
      writeLzw(out, src, palEntries)
    }
    u8(0x3b)
    out.toByteArray
  }

  /** Real LZW: greedy longest-match against a growing string table,
    * clear-code reset when the table fills — the standard encoder. */
  private def writeLzw(out: java.io.ByteArrayOutputStream,
      pixels: Array[Byte], palEntries: Int): Unit = {
    val minCode = math.max(2,
      32 - Integer.numberOfLeadingZeros(math.max(palEntries - 1, 1)))
    out.write(minCode)
    val clear = 1 << minCode; val end = clear + 1
    val data = new java.io.ByteArrayOutputStream()
    var acc = 0L; var bits = 0
    var width = minCode + 1
    def emit(code: Int): Unit = {
      acc |= code.toLong << bits; bits += width
      while (bits >= 8) { data.write((acc & 0xff).toInt); acc >>>= 8; bits -= 8 }
    }
    var table = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    var nextCode = end + 1
    emit(clear)
    var prev = -1
    for (p <- pixels) {
      val k = p & 0xff
      require(k < palEntries, s"pixel index $k outside palette of $palEntries")
      if (prev < 0) prev = k
      else table.get((prev, k)) match {
        case Some(code) => prev = code
        case None =>
          emit(prev)
          table((prev, k)) = nextCode
          nextCode += 1
          if (nextCode - 1 == (1 << width) && width < 12) width += 1
          if (nextCode == 4096) {
            emit(clear)
            table = scala.collection.mutable.HashMap.empty
            nextCode = end + 1; width = minCode + 1
          }
          prev = k
      }
    }
    if (prev >= 0) emit(prev)
    emit(end)
    if (bits > 0) data.write((acc & 0xff).toInt)
    val bytes = data.toByteArray
    var off = 0
    while (off < bytes.length) {
      val n = math.min(255, bytes.length - off)
      out.write(n)
      out.write(bytes, off, n)
      off += n
    }
    out.write(0)
  }
}
