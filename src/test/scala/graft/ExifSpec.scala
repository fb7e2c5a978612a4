package graft

import graft.operators.{Exif, Multimodal, Tiff}

/** EXIF extraction: the TIFF-structure walk (both byte orders, all
  * four field types, the Exif-pointer recursion), the JPEG marker
  * walk, the one-surface catalog, fail-loud boundaries. */
class ExifSpec extends SparkSpec {

  private def block(le: Boolean) = Exif.writeExifBlock(
    "CamCo", "X100", 6, "2026:01:02 12:00:00", 250L, 400,
    1024L, 768L, "2026:01:02 11:59:59", littleEndian = le)

  private val expected = Map(
    "Make" -> "CamCo", "Model" -> "X100", "Orientation" -> "6",
    "DateTime" -> "2026:01:02 12:00:00", "ExposureTime" -> "1/250",
    "ISO" -> "400", "PixelXDimension" -> "1024",
    "PixelYDimension" -> "768",
    "DateTimeOriginal" -> "2026:01:02 11:59:59")

  test("writeExifBlock/exifTags round-trips both byte orders") {
    assert(Exif.exifTags(block(le = true), 1L) == expected)
    assert(Exif.exifTags(block(le = false), 2L) == expected)
  }

  test("jpegExif: the marker walk skips APP0/COM to the Exif APP1") {
    assert(Exif.jpegExif(Exif.writeJpegExif(block(le = true)), 1L) == expected)
    // a JPEG without APP1 (or ending at EOI) is empty, not an error
    val bare = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)
    assert(Exif.jpegExif(bare, 2L).isEmpty)
    // a real pixel-bearing JPEG without EXIF is empty too
    val rgb = Array.fill(8 * 8 * 3)(100.toByte)
    assert(Exif.jpegExif(TestJpeg(8, 8, rgb), 3L).isEmpty)
  }

  test("a real TIFF image without EXIF fields is empty, not an error") {
    val rgb = Array.fill(4 * 4 * 3)(7.toByte)
    assert(Exif.exifTags(Tiff.writeTiff(4, 4, rgb), 1L).isEmpty)
  }

  test("fail-loud: bad magics, marker desync, entry overrun") {
    intercept[IllegalArgumentException] {
      Exif.exifTags("notatiff".getBytes("US-ASCII"), 1L)
    }
    intercept[IllegalArgumentException] {
      Exif.jpegExif("notjpeg!".getBytes("US-ASCII"), 2L)
    }
    // a truncated block: the IFD read runs past the end, loudly
    intercept[IllegalArgumentException] {
      Exif.exifTags(block(le = true).take(20), 3L)
    }
    // segment length overrunning the payload is loud
    val jpeg = Exif.writeJpegExif(block(le = true))
    intercept[IllegalArgumentException] {
      Exif.jpegExif(jpeg.take(jpeg.length - 30), 4L)
    }
  }

  test("imageExif: one catalog surface over both carriers") {
    import spark.implicits._
    val media = Seq(
      Multimodal.Media(1L, "image/jpeg", Exif.writeJpegExif(block(le = true))),
      Multimodal.Media(2L, "image/tiff", block(le = false)),
      Multimodal.Media(3L, "image/gif", Array[Byte](1, 2, 3)),
      Multimodal.Media(4L, "image/png", Exif.writeTextPng(Nil))).toDS()
    val out = Multimodal.imageExif(media)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(3)))
    assert(out.count(_._1 == 1L) == 9 && out.count(_._1 == 2L) == 9)
    // no carrier kind / text-free PNG: absence, not error
    assert(!out.exists(t => t._1 == 3L || t._1 == 4L))
    assert(out.filter(_._1 == 2L).map(t => t._2 -> t._3).toMap == expected)
  }

  test("GPS sub-IFD: D/M/S triples round-trip both orders, decimal math") {
    val gps = Exif.Gps("N", Seq((10L, 1L), (30L, 1L), (0L, 100L)),
      "W", Seq((74L, 1L), (0L, 1L), (2150L, 100L)), (125L, 10L))
    for (le <- Seq(true, false)) {
      val tags = Exif.exifTags(
        Exif.writeExifBlock("CamCo", "X100", 6, "2026:01:02 12:00:00",
          250L, 400, 1024L, 768L, "2026:01:02 11:59:59",
          littleEndian = le, gps = Some(gps)), 1L)
      assert(tags("GPSLatitudeRef") == "N" &&
        tags("GPSLatitude") == "10/1 30/1 0/100")
      assert(tags("GPSLongitudeRef") == "W" &&
        tags("GPSLongitude") == "74/1 0/1 2150/100")
      assert(tags("GPSAltitude") == "125/10")
      assert(tags("Make") == "CamCo") // camera fields unharmed
      // the governance consumer's arithmetic
      assert(Exif.gpsDecimal(tags("GPSLatitude"),
        tags("GPSLatitudeRef")) == 10.5)
      assert(Exif.gpsDecimal(tags("GPSLongitude"),
        tags("GPSLongitudeRef")) == -(74.0 + 21.5 / 3600))
    }
    // a GPS-free block stays GPS-free; short forms and guards
    assert(!Exif.exifTags(block(le = true), 2L).contains("GPSLatitude"))
    assert(Exif.gpsDecimal("1/2", "S") == -0.5)
    intercept[IllegalArgumentException] { Exif.gpsDecimal("1/0", "N") }
    intercept[IllegalArgumentException] {
      Exif.gpsDecimal("1/1 2/1 3/1 4/1", "N")
    }
  }

  test("pngText: all four text-chunk forms round-trip in chunk order") {
    val texts = Seq(
      (0, "Title", "A tEXt title"),
      (1, "Description", "deflated zTXt text with café"),
      (2, "Comment", "plain iTXt — unicode ’ fine"),
      (3, "Software", "deflated iTXt € body"))
    val png = Exif.writeTextPng(texts)
    assert(Exif.pngText(png) ==
      texts.map { case (_, k, v) => (k, v) }.toVector)
    // the carrier is still a REAL PNG: the pixel decoder accepts it
    val feats = Multimodal.decodePng(
      Multimodal.Media(9L, "image/png", png))
    assert(feats.width == 1 && feats.height == 1)
    // no text chunks → empty, not an error
    assert(Exif.pngText(Exif.writeTextPng(Nil)).isEmpty)
  }

  test("pngText fail-loud: bad signature, CRC damage, keyword NUL") {
    intercept[IllegalArgumentException] {
      Exif.pngText("GIF89a not a png pad".getBytes("US-ASCII"))
    }
    val png = Exif.writeTextPng(Seq((0, "Title", "x")))
    // flip one byte inside the tEXt payload: CRC must object
    val at = {
      val probe = "tEXt".getBytes("US-ASCII")
      (0 until png.length - 4).find(i => probe.indices.forall(j =>
        png(i + j) == probe(j))).get + 4
    }
    val bad = png.clone(); bad(at) = 'X'.toByte
    val e = intercept[IllegalArgumentException] { Exif.pngText(bad) }
    assert(e.getMessage.contains("CRC"))
    // imageExif surfaces the PNG carrier next to JPEG/TIFF
    import spark.implicits._
    val rows = Multimodal.imageExif(
      Seq(Multimodal.Media(5L, "image/png",
        Exif.writeTextPng(Seq((0, "Author", "ada"))))).toDS())
      .as[(Long, String, String, String)].collect().toList
    assert(rows == List((5L, "image/png", "Author", "ada")))
  }
  test("a sub-IFD pointer cycle fails loudly, not StackOverflowError") {
    // hand-built LE TIFF: IFD0's single entry is the Exif pointer
    // (0x8769) aimed back at IFD0 itself — a hostile payload shape
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val cyc = Array('I'.toByte, 'I'.toByte) ++ le16(42) ++ le32(8) ++
      le16(1) ++ // one entry at IFD offset 8
      le16(0x8769) ++ le16(4) ++ le32(1) ++ le32(8) ++ // points at itself
      le32(0) // next-IFD terminator
    val e = intercept[IllegalArgumentException] { Exif.exifTags(cyc, 7L) }
    assert(e.getMessage.contains("cycle"))
    // the Warc/Multimodal bridges degrade on Exception — an Error would
    // have killed the task; this asserts the guard fires as an Exception
    assert(e.isInstanceOf[Exception])
  }
}
