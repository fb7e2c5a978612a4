package graft.operators

/** Pure-JVM TIFF decode — the scanned-document format of a crawl
  * (and PDF's raster cousin). Like [[Bmp]]/[[Aiff]], the dominant
  * crawl forms decode FULLY here: baseline 8-bit RGB(A), grayscale
  * (both polarities), and palette images, in either byte order, strip
  * layout, compressed as None (1), LZW (5, via the SAME TIFF-variant
  * decoder the PDF filters use — [[Pdf.lzwDecode]]), or PackBits
  * (32773), with the horizontal-differencing predictor (tag 317 = 2).
  * TIFFs land on the shared RGB canvas, take real pixel features, and
  * pair cross-format in perceptual-hash dedup.
  *
  * Out-of-scope forms fail loudly, never mis-decode: bilevel/16-bit
  * depths, planar configuration 2, tiles (322/323), JPEG-in-TIFF,
  * CCITT fax codings. Those are the fax/print tail of the format; the
  * crawl-real scans are the baseline forms above.
  *
  * Structure (TIFF 6.0): `II`/`MM` byte-order magic + 42, an IFD of
  * 12-byte entries (tag, type, count, inline-or-offset value), strip
  * offsets/byte-counts, and the tag battery decoded here:
  * 256/257 dimensions, 258 bits/sample, 259 compression, 262
  * photometric, 273/279 strips, 277 samples/pixel, 278 rows/strip,
  * 284 planar, 317 predictor, 320 color map. */
object Tiff {

  final case class TiffInfo(byteOrder: String, width: Int, height: Int,
      bitsPerSample: Int, samplesPerPixel: Int, compression: String,
      photometric: String, nStrips: Int)

  private final class Reader(b: Array[Byte], le: Boolean, mediaId: Long) {
    def u16(p: Int): Int = {
      require(p >= 0 && p + 2 <= b.length, s"media $mediaId: truncated TIFF at $p")
      if (le) (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
      else ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
    }
    def u32(p: Int): Long = {
      require(p >= 0 && p + 4 <= b.length, s"media $mediaId: truncated TIFF at $p")
      if (le) (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
      else ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    }
  }

  /** Tag → all values (SHORT/LONG/BYTE widened to Long). */
  private def readIfd(b: Array[Byte], r: Reader,
      mediaId: Long): Map[Int, Array[Long]] = {
    val ifdAt = r.u32(4).toInt
    val n = r.u16(ifdAt)
    require(n > 0 && n < 4096, s"media $mediaId: absurd TIFF IFD entry count $n")
    val out = Map.newBuilder[Int, Array[Long]]
    var i = 0
    while (i < n) {
      val e = ifdAt + 2 + i * 12
      val tag = r.u16(e)
      val typ = r.u16(e + 2)
      val count = r.u32(e + 4).toInt
      require(count >= 0, s"media $mediaId: negative TIFF tag count")
      val elemSize = typ match {
        case 1 | 2 | 6 | 7 => 1 // BYTE/ASCII/SBYTE/UNDEFINED
        case 3 | 8 => 2 // SHORT
        case 4 | 9 => 4 // LONG
        case 5 | 10 | 11 => 4 // RATIONAL halves / FLOAT (not decoded)
        case 12 => 8
        case t => throw new IllegalArgumentException(
          s"media $mediaId: unknown TIFF type $t for tag $tag")
      }
      if (typ == 1 || typ == 3 || typ == 4) {
        val total = elemSize * count
        val at = if (total <= 4) e + 8 else r.u32(e + 8).toInt
        val vals = new Array[Long](count)
        var k = 0
        while (k < count) {
          vals(k) = typ match {
            case 1 => require(at + k < b.length,
              s"media $mediaId: TIFF BYTE value overruns"); (b(at + k) & 0xffL)
            case 3 => r.u16(at + k * 2).toLong
            case _ => r.u32(at + k * 4)
          }
          k += 1
        }
        out += tag -> vals
      } // other types (ASCII descriptions, rationals) carry no pixels
      i += 1
    }
    out.result()
  }

  private def one(tags: Map[Int, Array[Long]], tag: Int, default: Long,
      mediaId: Long): Long =
    tags.get(tag).map { v =>
      require(v.nonEmpty, s"media $mediaId: empty TIFF tag $tag")
      v(0)
    }.getOrElse(default)

  private def parse(b: Array[Byte], mediaId: Long)
      : (Reader, Map[Int, Array[Long]], String) = {
    require(b.length >= 8, s"media $mediaId: payload too short for TIFF")
    val order = new String(Array(b(0), b(1)),
      java.nio.charset.StandardCharsets.US_ASCII)
    require(order == "II" || order == "MM",
      s"media $mediaId: TIFF byte-order magic missing")
    val r = new Reader(b, order == "II", mediaId)
    require(r.u16(2) == 42, s"media $mediaId: TIFF magic 42 missing")
    (r, readIfd(b, r, mediaId), order)
  }

  /** Exact metadata of a TIFF payload (decodes nothing). */
  def tiffInfo(b: Array[Byte], mediaId: Long = -1L): TiffInfo = {
    val (_, tags, order) = parse(b, mediaId)
    val w = one(tags, 256, -1, mediaId).toInt
    val h = one(tags, 257, -1, mediaId).toInt
    require(w > 0 && h > 0, s"media $mediaId: TIFF without dimensions")
    val comp = one(tags, 259, 1, mediaId).toInt match {
      case 1 => "none"
      case 5 => "lzw"
      case 32773 => "packbits"
      case c => s"other_$c"
    }
    val photo = one(tags, 262, -1, mediaId).toInt match {
      case 0 => "white_is_zero"
      case 1 => "black_is_zero"
      case 2 => "rgb"
      case 3 => "palette"
      case p => s"other_$p"
    }
    TiffInfo(order, w, h, one(tags, 258, 1, mediaId).toInt,
      one(tags, 277, 1, mediaId).toInt, comp, photo,
      tags.get(273).map(_.length).getOrElse(0))
  }

  /** Row-major RGB canvas (3 B/px) of a baseline TIFF. */
  def decodeTiffCanvas(b: Array[Byte], mediaId: Long): (Int, Int, Array[Byte]) = {
    val (_, tags, _) = parse(b, mediaId)
    val w = one(tags, 256, -1, mediaId).toInt
    val h = one(tags, 257, -1, mediaId).toInt
    require(w > 0 && h > 0 && w.toLong * h <= (64L << 20),
      s"media $mediaId: degenerate TIFF dimensions ${w}x$h")
    val spp = one(tags, 277, 1, mediaId).toInt
    val bits = tags.getOrElse(258, Array(1L))
    require(bits.forall(_ == 8L),
      s"media $mediaId: only 8-bit TIFF samples decode " +
        s"(got ${bits.mkString("/")})")
    require(one(tags, 284, 1, mediaId) == 1L,
      s"media $mediaId: planar TIFF (PlanarConfiguration 2) unsupported")
    require(!tags.contains(322) && !tags.contains(323),
      s"media $mediaId: tiled TIFF unsupported (strip layout only)")
    val compression = one(tags, 259, 1, mediaId).toInt
    val predictor = one(tags, 317, 1, mediaId).toInt
    require(predictor == 1 || predictor == 2,
      s"media $mediaId: TIFF predictor $predictor unsupported")
    val photo = one(tags, 262, -1, mediaId).toInt
    val offsets = tags.getOrElse(273,
      throw new IllegalArgumentException(
        s"media $mediaId: TIFF without StripOffsets"))
    val counts = tags.getOrElse(279,
      throw new IllegalArgumentException(
        s"media $mediaId: TIFF without StripByteCounts"))
    require(offsets.length == counts.length,
      s"media $mediaId: ${offsets.length} strip offsets vs ${counts.length} counts")
    val rowsPerStrip = math.min(one(tags, 278, h.toLong, mediaId), h.toLong).toInt
    require(rowsPerStrip > 0, s"media $mediaId: degenerate RowsPerStrip")
    require(offsets.length == (h + rowsPerStrip - 1) / rowsPerStrip,
      s"media $mediaId: strip count does not cover the image")
    val rowBytes = w * spp
    val raw = new Array[Byte](rowBytes * h)
    var stripRow = 0
    var si = 0
    while (si < offsets.length) {
      val at = offsets(si).toInt
      val len = counts(si).toInt
      require(at >= 0 && len >= 0 && at + len <= b.length,
        s"media $mediaId: TIFF strip $si overruns the payload")
      val comp = java.util.Arrays.copyOfRange(b, at, at + len)
      val strip = compression match {
        case 1 => comp
        case 5 => Pdf.lzwDecode(comp, 1) // the TIFF-variant LZW, early change
        case 32773 => packBitsDecode(comp, mediaId)
        case c => throw new IllegalArgumentException(
          s"media $mediaId: TIFF compression $c decode unsupported")
      }
      val rows = math.min(rowsPerStrip, h - stripRow)
      require(strip.length >= rows * rowBytes,
        s"media $mediaId: TIFF strip $si decodes to ${strip.length} bytes, " +
          s"needs ${rows * rowBytes}")
      if (predictor == 2) { // horizontal differencing, per sample
        var y = 0
        while (y < rows) {
          var x = spp
          while (x < rowBytes) {
            strip(y * rowBytes + x) =
              (strip(y * rowBytes + x) + strip(y * rowBytes + x - spp)).toByte
            x += 1
          }
          y += 1
        }
      }
      System.arraycopy(strip, 0, raw, stripRow * rowBytes, rows * rowBytes)
      stripRow += rows
      si += 1
    }
    val out = new Array[Byte](w * h * 3)
    photo match {
      case 2 => // RGB, extra samples (alpha) dropped
        require(spp >= 3, s"media $mediaId: RGB TIFF with $spp samples/pixel")
        var i = 0
        while (i < w * h) {
          out(i * 3) = raw(i * spp)
          out(i * 3 + 1) = raw(i * spp + 1)
          out(i * 3 + 2) = raw(i * spp + 2)
          i += 1
        }
      case 0 | 1 => // grayscale, both polarities
        require(spp == 1, s"media $mediaId: gray TIFF with $spp samples/pixel")
        var i = 0
        while (i < w * h) {
          val v = if (photo == 1) raw(i) else (~raw(i)).toByte
          out(i * 3) = v; out(i * 3 + 1) = v; out(i * 3 + 2) = v
          i += 1
        }
      case 3 => // palette: 16-bit color map planes (all R, all G, all B)
        require(spp == 1, s"media $mediaId: palette TIFF with $spp samples/pixel")
        val map = tags.getOrElse(320, throw new IllegalArgumentException(
          s"media $mediaId: palette TIFF without a ColorMap"))
        require(map.length == 3 * 256,
          s"media $mediaId: ColorMap holds ${map.length} entries, needs 768")
        var i = 0
        while (i < w * h) {
          val idx = raw(i) & 0xff
          out(i * 3) = (map(idx) >> 8).toByte
          out(i * 3 + 1) = (map(256 + idx) >> 8).toByte
          out(i * 3 + 2) = (map(512 + idx) >> 8).toByte
          i += 1
        }
      case p => throw new IllegalArgumentException(
        s"media $mediaId: TIFF photometric $p decode unsupported")
    }
    (w, h, out)
  }

  /** PackBits (TIFF 6.0 §9): n∈[0,127] copies n+1 literals, n∈[−127,−1]
    * repeats the next byte 1−n times, −128 is a no-op. */
  private[graft] def packBitsDecode(d: Array[Byte], mediaId: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(d.length * 2)
    var i = 0
    while (i < d.length) {
      val n = d(i)
      if (n >= 0) {
        require(i + 1 + n + 1 <= d.length,
          s"media $mediaId: truncated PackBits literal run")
        out.write(d, i + 1, n + 1)
        i += n + 2
      } else if (n != -128) {
        require(i + 1 < d.length, s"media $mediaId: truncated PackBits repeat")
        var k = 0
        while (k < 1 - n) { out.write(d(i + 1)); k += 1 }
        i += 2
      } else i += 1
    }
    out.toByteArray
  }

  // -- generator (staging/spec counterpart) ------------------------------

  private[graft] def packBitsEncode(d: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(d.length + 8)
    var i = 0
    while (i < d.length) {
      var run = 1
      while (i + run < d.length && run < 128 && d(i + run) == d(i)) run += 1
      if (run >= 2) { out.write(1 - run); out.write(d(i)); i += run }
      else {
        var lit = 1
        while (i + lit < d.length && lit < 128 &&
            !(i + lit + 1 < d.length && d(i + lit) == d(i + lit + 1))) lit += 1
        out.write(lit - 1); out.write(d, i, lit); i += lit
      }
    }
    out.toByteArray
  }

  /** TIFF-variant LZW ENCODER, width-schedule-synchronized with
    * [[Pdf.lzwDecode]] (early change 1): MSB-first codes, 256 clear /
    * 257 EOI, trie dictionary, clear emitted before the table can
    * overflow. */
  private[graft] def lzwEncode(d: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(d.length)
    var acc = 0L
    var nAcc = 0
    var width = 9
    def emit(code: Int): Unit = {
      acc = (acc << width) | code
      nAcc += width
      while (nAcc >= 8) {
        out.write(((acc >> (nAcc - 8)) & 0xff).toInt)
        nAcc -= 8
      }
    }
    val dict = new java.util.HashMap[Long, Integer]()
    var tableLen = 258 // mirrors the decoder's table.length
    var sinceClear = 0 // decoder adds no entry for the first code
    def reset(): Unit = { dict.clear(); tableLen = 258; sinceClear = 0 }
    emit(256) // spec: streams begin with a clear code
    reset()
    var prefix = -1 // current dictionary code for the pending string
    var i = 0
    def flushPrefix(): Unit = if (prefix >= 0) {
      emit(prefix)
      if (sinceClear > 0) {
        tableLen += 1
        if (width < 12 && tableLen + 1 >= (1 << width)) width += 1
      }
      sinceClear += 1
    }
    while (i < d.length) {
      val c = d(i) & 0xff
      val key = if (prefix < 0) -1L else (prefix.toLong << 8) | c
      if (prefix < 0) prefix = c
      else {
        val hit = dict.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          // the decoder assigns this entry code `tableLen` as it
          // processes the emitted prefix — mirror that assignment
          val newCode = tableLen + (if (sinceClear > 0) 1 else 0)
          flushPrefix()
          dict.put(key, Integer.valueOf(newCode))
          prefix = c
          if (tableLen >= 4093) { // table nearly full: clear, like real writers
            emit(256)
            width = 9
            reset()
          }
        }
      }
      i += 1
    }
    flushPrefix()
    emit(257) // EOI
    if (nAcc > 0) out.write(((acc << (8 - nAcc)) & 0xff).toInt)
    out.toByteArray
  }

  /** Serialize `rgb` as a baseline TIFF: `photo` ∈ rgb / gray /
    * palette (gray/palette take the canvas's red channel as the 8-bit
    * sample), `compression` ∈ none / lzw / packbits, either byte
    * order, `rowsPerStrip` strips, optional horizontal predictor (LZW
    * forms). Palette maps index i to (i, 255−i, i^0x55) scaled 16-bit. */
  def writeTiff(width: Int, height: Int, rgb: Array[Byte],
      photo: String = "rgb", compression: String = "none",
      littleEndian: Boolean = true, rowsPerStrip: Int = 0,
      predictor: Boolean = false): Array[Byte] = {
    require(rgb.length == width * height * 3, "writeTiff: canvas size mismatch")
    val spp = if (photo == "rgb") 3 else 1
    val rps = if (rowsPerStrip <= 0) height else rowsPerStrip
    val samples = new Array[Byte](width * height * spp)
    if (photo == "rgb") System.arraycopy(rgb, 0, samples, 0, rgb.length)
    else {
      var i = 0
      while (i < width * height) { samples(i) = rgb(i * 3); i += 1 }
    }
    val rowBytes = width * spp
    val nStrips = (height + rps - 1) / rps
    val strips = (0 until nStrips).map { si =>
      val rows = math.min(rps, height - si * rps)
      val strip = java.util.Arrays.copyOfRange(samples,
        si * rps * rowBytes, si * rps * rowBytes + rows * rowBytes)
      if (predictor) { // horizontal differencing (inverse of the decoder)
        var y = 0
        while (y < rows) {
          var x = rowBytes - 1
          while (x >= spp) {
            strip(y * rowBytes + x) =
              (strip(y * rowBytes + x) - strip(y * rowBytes + x - spp)).toByte
            x -= 1
          }
          y += 1
        }
      }
      compression match {
        case "none" => strip
        case "lzw" => lzwEncode(strip)
        case "packbits" => packBitsEncode(strip)
        case c => throw new IllegalArgumentException(s"writeTiff: compression $c")
      }
    }
    // layout: header(8) + IFD + values + strips
    val photoCode = photo match {
      case "rgb" => 2L
      case "gray" => 1L
      case "palette" => 3L
      case p => throw new IllegalArgumentException(s"writeTiff: photo $p")
    }
    val compCode = compression match {
      case "none" => 1L; case "lzw" => 5L; case "packbits" => 32773L
    }
    case class Entry(tag: Int, typ: Int, values: Array[Long])
    val entries = scala.collection.mutable.ArrayBuffer(
      Entry(256, 4, Array(width.toLong)),
      Entry(257, 4, Array(height.toLong)),
      Entry(258, 3, Array.fill(spp)(8L)),
      Entry(259, 3, Array(compCode)),
      Entry(262, 3, Array(photoCode)),
      Entry(277, 3, Array(spp.toLong)),
      Entry(278, 4, Array(rps.toLong)))
    if (predictor) entries += Entry(317, 3, Array(2L))
    if (photo == "palette")
      entries += Entry(320, 3,
        Array.tabulate(768) { j =>
          val idx = j % 256
          val v = (j / 256) match {
            case 0 => idx
            case 1 => 255 - idx
            case _ => idx ^ 0x55
          }
          (v * 257).toLong // 8-bit value scaled to the 16-bit map
        })
    // strip tags appended after we know the data layout
    val nEntries = entries.length + 2
    val ifdAt = 8
    val ifdSize = 2 + nEntries * 12 + 4
    var valueAt = ifdAt + ifdSize
    val le = littleEndian
    def pack16(v: Int): Array[Byte] =
      if (le) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      else Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def pack32(v: Long): Array[Byte] =
      if (le) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      else Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val overflow = new java.io.ByteArrayOutputStream()
    def valueField(typ: Int, values: Array[Long]): Array[Byte] = {
      val elem = if (typ == 3) 2 else 4
      val total = elem * values.length
      if (total <= 4) {
        val b = new Array[Byte](4)
        var off = 0
        values.foreach { v =>
          val e = if (typ == 3) pack16(v.toInt) else pack32(v)
          System.arraycopy(e, 0, b, off, elem)
          off += elem
        }
        b
      } else {
        val at = valueAt + overflow.size()
        values.foreach(v =>
          overflow.write(if (typ == 3) pack16(v.toInt) else pack32(v)))
        if (overflow.size() % 2 == 1) overflow.write(0)
        pack32(at.toLong)
      }
    }
    // strip placement: after the overflow values — two passes, so first
    // materialize all non-strip value fields, then compute strip offsets
    val headEntries = entries.toVector.map(e =>
      (e.tag, e.typ, e.values.length, valueField(e.typ, e.values)))
    val stripsAt = valueAt + overflow.size() +
      (if (nStrips > 1) nStrips * 8 else 0) // offset/count arrays if needed
    val stripOffsets = strips.scanLeft(stripsAt.toLong)((a, s) =>
      a + s.length + (s.length & 1)).init.toArray
    val stripCounts = strips.map(_.length.toLong).toArray
    val tailEntries = Vector(
      (273, 4, nStrips, valueField(4, stripOffsets)),
      (279, 4, nStrips, valueField(4, stripCounts)))
    val all = (headEntries ++ tailEntries).sortBy(_._1) // IFD tags ascend
    val out = new java.io.ByteArrayOutputStream()
    out.write((if (le) "II" else "MM").getBytes("US-ASCII"))
    out.write(pack16(42))
    out.write(pack32(ifdAt.toLong))
    out.write(pack16(all.length))
    all.foreach { case (tag, typ, count, field) =>
      out.write(pack16(tag)); out.write(pack16(typ))
      out.write(pack32(count.toLong)); out.write(field)
    }
    out.write(pack32(0L)) // no next IFD
    out.write(overflow.toByteArray)
    strips.foreach { s =>
      out.write(s)
      if (s.length % 2 == 1) out.write(0) // word-aligned strips
    }
    out.toByteArray
  }
}
