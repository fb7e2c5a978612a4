package graft

/** Minimal PNG encoder for planted tests: writes a spec-correct PNG
  * (signature, IHDR, optional PLTE, one IDAT with zlib-deflated filtered
  * scanlines, IEND, per-chunk CRCs) with a caller-chosen filter type per
  * row — the only way to exercise all five scanline filters
  * deterministically. Test-only; the production decoder is
  * `Multimodal.decodePng`. */
object TestPng {

  /** Encode `pixels` (row-major, `channels(colorType)` bytes per pixel)
    * as a PNG. `filters(y % filters.length)` picks row `y`'s filter. */
  def apply(w: Int, h: Int, colorType: Int, pixels: Array[Byte],
      filters: Seq[Int] = Seq(0), bitDepth: Int = 8,
      palette: Array[Byte] = null, interlace: Int = 0): Array[Byte] = {
    val ch = channels(colorType)
    val stride = w * ch
    require(pixels.length == stride * h, "pixel buffer size mismatch")
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val f = filters(y % filters.length)
      raw(y * (stride + 1)) = f.toByte
      var x = 0
      while (x < stride) {
        val v = pixels(y * stride + x) & 0xff
        val a = if (x >= ch) pixels(y * stride + x - ch) & 0xff else 0
        val b = if (y > 0) pixels((y - 1) * stride + x) & 0xff else 0
        val c = if (y > 0 && x >= ch) pixels((y - 1) * stride + x - ch) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw(y * (stride + 1) + 1 + x) = (v - pred).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new java.io.ByteArrayOutputStream()
    writeU32(ihdr, w.toLong); writeU32(ihdr, h.toLong)
    ihdr.write(bitDepth); ihdr.write(colorType)
    ihdr.write(0); ihdr.write(0); ihdr.write(interlace)
    chunk(out, "IHDR", ihdr.toByteArray)
    if (palette != null) chunk(out, "PLTE", palette)
    chunk(out, "IDAT", comp.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  def channels(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
  }

  def chunk(out: java.io.ByteArrayOutputStream, ctype: String,
      data: Array[Byte]): Unit = {
    writeU32(out, data.length.toLong)
    val tb = ctype.getBytes("US-ASCII")
    out.write(tb); out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    writeU32(out, crc.getValue)
  }

  def writeU32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
    out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }
}
