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
      Multimodal.Media(3L, "image/png", Array[Byte](1, 2, 3))).toDS()
    val out = Multimodal.imageExif(media)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(3)))
    assert(out.count(_._1 == 1L) == 9 && out.count(_._1 == 2L) == 9)
    assert(!out.exists(_._1 == 3L)) // no carrier: absence, not error
    assert(out.filter(_._1 == 2L).map(t => t._2 -> t._3).toMap == expected)
  }
}
