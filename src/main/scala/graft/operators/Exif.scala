package graft.operators

import java.nio.charset.StandardCharsets.US_ASCII

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM EXIF metadata extraction — the camera-catalog face of the
  * image tier (provenance fields a multimodal curation pipeline
  * filters and reports on: camera make/model, orientation, capture
  * timestamps, exposure, the declared pixel dimensions).
  *
  * EXIF is a TIFF structure: byte-order magic, IFD0 entries, and an
  * Exif sub-IFD behind the 0x8769 pointer. [[exifTags]] walks that
  * structure directly (a `.tif` file whose IFD0 carries the fields IS
  * valid EXIF carriage); [[jpegExif]] walks JPEG marker segments to
  * the `APP1` payload prefixed `Exif\0\0` and hands the rest to the
  * same walk — one decoder, two carriers. A curated tag set decodes
  * (ASCII NUL-trimmed, SHORT/LONG as decimals, RATIONAL as `n/d`);
  * unknown tags skip by size, the TIFF discipline.
  *
  * Fail-loudly contract: bad byte-order or marker framing, an entry
  * overrunning the payload, or an unsupported field type on a known
  * tag throws `IllegalArgumentException` naming the media id; absence
  * of APP1 or of any known tag is an empty map, not an error. */
object Exif {

  private val Ifd0Names = Map(
    0x010F -> "Make", 0x0110 -> "Model", 0x0112 -> "Orientation",
    0x0132 -> "DateTime", 0x011A -> "XResolution", 0x011B -> "YResolution")

  private val ExifIfdNames = Map(
    0x9003 -> "DateTimeOriginal", 0x829A -> "ExposureTime",
    0x829D -> "FNumber", 0x8827 -> "ISO",
    0xA002 -> "PixelXDimension", 0xA003 -> "PixelYDimension")

  /** The GPS sub-IFD's curated tags — the geo-provenance surface (a
    * location-bearing photo is a governance signal a curation policy
    * filters on before anything else touches the pixels). */
  private val GpsIfdNames = Map(
    1 -> "GPSLatitudeRef", 2 -> "GPSLatitude",
    3 -> "GPSLongitudeRef", 4 -> "GPSLongitude", 6 -> "GPSAltitude")

  private val ExifPointerTag = 0x8769
  private val GpsPointerTag = 0x8825

  /** Decoded (name → value) pairs of a TIFF-structured EXIF block:
    * IFD0's curated tags plus the Exif sub-IFD's. */
  def exifTags(b: Array[Byte], mediaId: Long = -1L): Map[String, String] = {
    require(b.length >= 8, s"media $mediaId: EXIF block too short")
    val le = b(0) == 'I' && b(1) == 'I'
    require(le || (b(0) == 'M' && b(1) == 'M'),
      s"media $mediaId: EXIF byte-order magic missing")
    def u16(p: Int): Int = {
      require(p >= 0 && p + 2 <= b.length,
        s"media $mediaId: EXIF read past end")
      if (le) (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
      else ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
    }
    def u32(p: Int): Long = {
      require(p >= 0 && p + 4 <= b.length,
        s"media $mediaId: EXIF read past end")
      if (le) (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
      else ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    }
    require(u16(2) == 42, s"media $mediaId: EXIF TIFF magic 42 missing")
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Sub-IFD pointers (0x8769/0x8825) are offsets into the same block:
    // a crafted payload can point an IFD back at itself (or a cycle).
    // That would recurse to StackOverflowError — an Error the tolerant
    // bridges' Exception degrade does not catch — so a revisited IFD
    // offset fails loudly here instead.
    val visited = scala.collection.mutable.Set.empty[Int]

    def walk(ifdAt: Int, names: Map[Int, String], depth: Int): Unit = {
      require(visited.add(ifdAt),
        s"media $mediaId: EXIF IFD cycle at offset $ifdAt")
      require(depth < 4, // real EXIF nests 2 deep (IFD0 → Exif/GPS)
        s"media $mediaId: EXIF sub-IFD nesting exceeds 4")
      val n = u16(ifdAt)
      var k = 0
      while (k < n) {
        val e = ifdAt + 2 + k * 12
        val tag = u16(e)
        val typ = u16(e + 2)
        val count = u32(e + 4)
        require(count >= 0 && count < (1 << 24),
          s"media $mediaId: absurd EXIF count $count for tag $tag")
        if (tag == ExifPointerTag || tag == GpsPointerTag) {
          require(typ == 4 && count == 1,
            s"media $mediaId: malformed sub-IFD pointer")
          walk(u32(e + 8).toInt,
            if (tag == ExifPointerTag) ExifIfdNames else GpsIfdNames,
            depth + 1)
        } else names.get(tag).foreach { name =>
          val value = typ match {
            case 2 => // ASCII, count includes the NUL
              val at = if (count <= 4) e + 8 else u32(e + 8).toInt
              require(at >= 0 && at + count <= b.length,
                s"media $mediaId: EXIF ASCII value overruns")
              new String(b, at, count.toInt, US_ASCII)
                .takeWhile(_ != 0.toChar)
            case 3 => u16(if (count <= 2) e + 8 else u32(e + 8).toInt).toString
            case 4 => (if (count == 1) u32(e + 8)
              else u32(u32(e + 8).toInt)).toString
            case 5 => // count > 1 = D/M/S triples: space-joined pairs
              val at = u32(e + 8).toInt
              (0 until count.toInt).map(j =>
                s"${u32(at + j * 8)}/${u32(at + j * 8 + 4)}").mkString(" ")
            case t => throw new IllegalArgumentException(
              s"media $mediaId: EXIF type $t on known tag $tag")
          }
          out(name) = value
        }
        k += 1
      }
    }
    walk(u32(4).toInt, Ifd0Names, 0)
    out.toMap
  }

  /** Signed decimal degrees from a walked GPS coordinate — `dms` is
    * the space-joined rational form [[exifTags]] emits (1-3 pairs:
    * degrees, minutes, seconds), `ref` the hemisphere letter (S/W
    * negate). The governance consumer's arithmetic, kept next to the
    * walker so the two can never drift. */
  def gpsDecimal(dms: String, ref: String): Double = {
    val parts = dms.split(" ").map { p =>
      val s = p.split("/")
      require(s.length == 2 && s(1).toLong != 0, s"malformed rational '$p'")
      s(0).toLong.toDouble / s(1).toLong
    }
    require(parts.nonEmpty && parts.length <= 3,
      s"GPS coordinate with ${parts.length} components")
    val v = parts.zip(Seq(1.0, 60.0, 3600.0)).map { case (x, s) => x / s }.sum
    if (ref == "S" || ref == "W") -v else v
  }

  /** EXIF tags of a JPEG: marker-segment walk (SOI, then length-framed
    * segments, stopping at SOS/EOI — metadata precedes the scan) to
    * the `APP1` payload prefixed `Exif\0\0`; no APP1 is an empty map. */
  def jpegExif(b: Array[Byte], mediaId: Long = -1L): Map[String, String] = {
    require(b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
      s"media $mediaId: JPEG SOI missing")
    var p = 2
    while (p + 4 <= b.length) {
      require((b(p) & 0xff) == 0xff, s"media $mediaId: JPEG marker desync at $p")
      val mk = b(p + 1) & 0xff
      if (mk == 0xd9 || mk == 0xda) return Map.empty // EOI / scan: no APP1
      val len = ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
      require(len >= 2 && p + 2 + len <= b.length,
        s"media $mediaId: JPEG segment overruns")
      if (mk == 0xe1 && len >= 8 &&
        new String(b, p + 4, 4, US_ASCII) == "Exif" &&
        b(p + 8) == 0 && b(p + 9) == 0)
        return exifTags(
          java.util.Arrays.copyOfRange(b, p + 10, p + 2 + len), mediaId)
      p += 2 + len
    }
    Map.empty
  }

  // -- generator (staging/spec counterpart) ---------------------------------

  /** One field to serialize: (tag, type, value). */
  private final case class Entry(tag: Int, typ: Int, count: Int,
      inline: Array[Byte], data: Array[Byte])

  /** GPS fields to plant: hemisphere refs, 1-3 rational pairs per
    * coordinate (degrees/minutes/seconds), one altitude rational. */
  final case class Gps(latRef: String, lat: Seq[(Long, Long)],
      lonRef: String, lon: Seq[(Long, Long)], alt: (Long, Long))

  /** Serialize a VALID EXIF block (TIFF header, IFD0 with the camera
    * fields and the Exif-IFD pointer, the sub-IFD with capture
    * fields, optionally a GPS sub-IFD behind the 0x8825 pointer) in
    * either byte order — the staging counterpart. */
  def writeExifBlock(make: String, model: String, orientation: Int,
      dateTime: String, exposureDen: Long, iso: Int,
      pixelX: Long, pixelY: Long, dateTimeOriginal: String,
      littleEndian: Boolean = true, gps: Option[Gps] = None): Array[Byte] = {
    def b16(v: Int): Array[Byte] =
      if (littleEndian) Array(v.toByte, (v >> 8).toByte)
      else Array((v >> 8).toByte, v.toByte)
    def b32(v: Long): Array[Byte] =
      if (littleEndian) Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte,
        (v >> 24).toByte)
      else Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte,
        v.toByte)
    def ascii(s: String): Entry = {
      val bytes = s.getBytes(US_ASCII) :+ 0.toByte
      if (bytes.length <= 4) Entry(0, 2, bytes.length,
        bytes.padTo(4, 0.toByte), null)
      else Entry(0, 2, bytes.length, null, bytes)
    }
    def short(v: Int): Entry = Entry(0, 3, 1, b16(v) ++ b16(0), null)
    def long(v: Long): Entry = Entry(0, 4, 1, b32(v), null)
    def rational(n: Long, d: Long): Entry =
      Entry(0, 5, 1, null, b32(n) ++ b32(d))
    def rationals(rs: Seq[(Long, Long)]): Entry =
      Entry(0, 5, rs.length,
        null, rs.flatMap { case (n, d) => b32(n) ++ b32(d) }.toArray)

    val ifd0 = ArrayBuffer(
      0x010F -> ascii(make), 0x0110 -> ascii(model),
      0x0112 -> short(orientation), 0x0132 -> ascii(dateTime))
    val exifIfd = ArrayBuffer(
      0x829A -> rational(1L, exposureDen), 0x8827 -> short(iso),
      0x9003 -> ascii(dateTimeOriginal), 0xA002 -> long(pixelX),
      0xA003 -> long(pixelY))

    val gpsIfd = gps.map(g => Seq(
      1 -> ascii(g.latRef), 2 -> rationals(g.lat),
      3 -> ascii(g.lonRef), 4 -> rationals(g.lon),
      6 -> rationals(Seq(g.alt))))

    // layout: header(8) | IFD0 | Exif IFD | GPS IFD | data area
    val ifd0At = 8
    val nPointers = 1 + gpsIfd.size // Exif always, GPS when planted
    val ifd0Size = 2 + (ifd0.length + nPointers) * 12 + 4
    val exifAt = ifd0At + ifd0Size
    val exifSize = 2 + exifIfd.length * 12 + 4
    val gpsAt = exifAt + exifSize
    var dataAt = gpsAt + gpsIfd.fold(0)(g => 2 + g.length * 12 + 4)
    val data = new java.io.ByteArrayOutputStream

    def render(entries: Seq[(Int, Entry)]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream
      out.write(b16(entries.length))
      for ((tag, e) <- entries.sortBy(_._1)) {
        out.write(b16(tag)); out.write(b16(e.typ)); out.write(b32(e.count))
        if (e.data == null) out.write(e.inline)
        else { out.write(b32(dataAt)); data.write(e.data)
          dataAt += e.data.length }
      }
      out.write(b32(0)) // next-IFD terminator
      out.toByteArray
    }

    val ifd0All = (ifd0 :+ (ExifPointerTag -> long(exifAt))) ++
      gpsIfd.map(_ => GpsPointerTag -> long(gpsAt))
    val ifd0Bytes = render(ifd0All.toSeq)
    val exifBytes = render(exifIfd.toSeq)
    val gpsBytes = gpsIfd.fold(Array.emptyByteArray)(render)
    val header =
      (if (littleEndian) "II" else "MM").getBytes(US_ASCII) ++
        b16(42) ++ b32(ifd0At)
    header ++ ifd0Bytes ++ exifBytes ++ gpsBytes ++ data.toByteArray
  }

  /** Wrap an EXIF block as a metadata-bearing JPEG: SOI, a JFIF APP0
    * and a COM segment (real skip work for the walk), the `Exif\0\0`
    * APP1, EOI — the segment-framing counterpart for the catalog
    * gates (pixel-bearing JPEGs carry APP1 identically). */
  def writeJpegExif(exifBlock: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    def seg(marker: Int, payload: Array[Byte]): Unit = {
      out.write(0xff); out.write(marker)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write(payload)
    }
    out.write(0xff); out.write(0xd8) // SOI
    seg(0xe0, ("JFIF".getBytes(US_ASCII) :+ 0.toByte) ++
      Array[Byte](1, 2, 0, 0, 1, 0, 1, 0, 0))
    seg(0xfe, "planted comment".getBytes(US_ASCII))
    seg(0xe1, ("Exif".getBytes(US_ASCII) ++ Array[Byte](0, 0)) ++ exifBlock)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ---- PNG textual metadata (the third provenance carrier) ----------

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG textual metadata as (keyword, text) rows, chunk order — the
    * three spec forms on one walk: `tEXt` (Latin-1), `zTXt` (deflated
    * Latin-1), `iTXt` (UTF-8, optionally deflated; the language tag
    * and translated keyword are routing metadata, not text, and are
    * skipped). CRCs verified like the pixel decoder's walk; a
    * non-text chunk is framing to skip, a malformed TEXT chunk
    * throws. */
  def pngText(b: Array[Byte], mediaId: Long = -1L): Vector[(String, String)] = {
    require(b.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOf(b, 8), PngSig),
      s"media $mediaId: not a PNG")
    val out = Vector.newBuilder[(String, String)]
    var i = 8
    var continue = true
    while (continue) {
      require(i + 8 <= b.length, s"media $mediaId: truncated PNG chunk header")
      val len = ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
      require(len <= b.length - i - 12,
        s"media $mediaId: PNG chunk claims $len bytes past end")
      val ctype = new String(b, i + 4, 4, US_ASCII)
      val dataAt = i + 8
      val n = len.toInt
      if (ctype == "tEXt" || ctype == "zTXt" || ctype == "iTXt") {
        val crc = new java.util.zip.CRC32()
        crc.update(b, i + 4, 4 + n)
        val stored = ((b(dataAt + n) & 0xffL) << 24) |
          ((b(dataAt + n + 1) & 0xffL) << 16) |
          ((b(dataAt + n + 2) & 0xffL) << 8) | (b(dataAt + n + 3) & 0xffL)
        require(crc.getValue == stored,
          s"media $mediaId: PNG chunk $ctype CRC mismatch")
        val nul = {
          var j = dataAt
          while (j < dataAt + n && b(j) != 0) j += 1
          require(j < dataAt + n, s"media $mediaId: $ctype without keyword NUL")
          j
        }
        val keyword = new String(b, dataAt, nul - dataAt,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        val text = ctype match {
          case "tEXt" =>
            new String(b, nul + 1, dataAt + n - nul - 1,
              java.nio.charset.StandardCharsets.ISO_8859_1)
          case "zTXt" =>
            require(nul + 1 < dataAt + n && b(nul + 1) == 0,
              s"media $mediaId: zTXt with unknown compression method")
            new String(inflate(b, nul + 2, dataAt + n - nul - 2, mediaId),
              java.nio.charset.StandardCharsets.ISO_8859_1)
          case _ => // iTXt: compFlag compMethod lang\0 translated\0 text
            require(nul + 3 <= dataAt + n, s"media $mediaId: truncated iTXt")
            val compFlag = b(nul + 1) & 0xff
            require(compFlag <= 1 && (compFlag == 0 || b(nul + 2) == 0),
              s"media $mediaId: iTXt with unknown compression")
            var j = nul + 3
            while (j < dataAt + n && b(j) != 0) j += 1 // language tag
            require(j < dataAt + n, s"media $mediaId: iTXt missing language NUL")
            j += 1
            while (j < dataAt + n && b(j) != 0) j += 1 // translated keyword
            require(j < dataAt + n, s"media $mediaId: iTXt missing keyword NUL")
            j += 1
            if (compFlag == 1)
              new String(inflate(b, j, dataAt + n - j, mediaId),
                java.nio.charset.StandardCharsets.UTF_8)
            else new String(b, j, dataAt + n - j,
              java.nio.charset.StandardCharsets.UTF_8)
        }
        out += ((keyword, text))
      }
      if (ctype == "IEND") continue = false
      i = dataAt + n + 4
    }
    out.result()
  }

  private def inflate(b: Array[Byte], at: Int, n: Int,
      mediaId: Long): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(b, at, n)
    val out = new java.io.ByteArrayOutputStream(n * 4 + 64)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val got = inf.inflate(buf)
        require(got > 0 || inf.finished(),
          s"media $mediaId: truncated deflate stream in text chunk")
        out.write(buf, 0, got)
        require(out.size() <= (1 << 26),
          s"media $mediaId: text chunk inflates past 64 MiB (bomb guard)")
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(
          s"media $mediaId: malformed deflate stream in text chunk", e)
    } finally inf.end()
    out.toByteArray
  }

  /** Round-trip twin: a valid 1×1 grayscale PNG carrying the given
    * text chunks — kind 0 = `tEXt`, 1 = `zTXt`, 2 = `iTXt` plain,
    * 3 = `iTXt` deflated. */
  def writeTextPng(texts: Seq[(Int, String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write((len >> 24) & 0xff); out.write((len >> 16) & 0xff)
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      val tb = ctype.getBytes(US_ASCII)
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      val v = crc.getValue
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val o = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) o.write(buf, 0, d.deflate(buf))
      d.end()
      o.toByteArray
    }
    chunk("IHDR", Array[Byte](0, 0, 0, 1, 0, 0, 0, 1, 8, 0, 0, 0, 0))
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    texts.foreach { case (kind, keyword, text) =>
      val kw = keyword.getBytes(latin1) :+ 0.toByte
      kind match {
        case 0 => chunk("tEXt", kw ++ text.getBytes(latin1))
        case 1 => chunk("zTXt", (kw :+ 0.toByte) ++ deflate(text.getBytes(latin1)))
        case 2 => chunk("iTXt", kw ++ Array[Byte](0, 0, 0, 0) ++
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        case _ => chunk("iTXt", kw ++ Array[Byte](1, 0, 0, 0) ++
          deflate(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }
    }
    // 1x1 gray pixel: one scanline, filter 0, value 0x55
    chunk("IDAT", deflate(Array[Byte](0, 0x55)))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
