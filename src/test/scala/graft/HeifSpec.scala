package graft

import graft.operators.{Exif, Heif, Multimodal, Sniff}

/** The HEIF/AVIF face of the ISO-BMFF walker: writer→reader
  * round-trips across both iloc construction methods, iloc/infe/ipma
  * field-width variants, the ExifDataBlock offset forms, brand
  * routing, sniffing, and the fail-loud contract. */
class HeifSpec extends SparkSpec {

  private def tiff(id: Long) = Exif.writeExifBlock(
    s"Cam ${id % 5}", s"Model ${id % 7}", (1 + id % 8).toInt,
    s"2026:02:0${1 + id % 9} 10:00:00", 125 + id % 100,
    (100 * (1 + id % 4)).toInt, 320 + id % 16, 240 + id % 9,
    s"2026:02:0${1 + id % 9} 01:00:00", littleEndian = id % 2 == 0)

  private def coded(id: Long) =
    Array.tabulate[Byte](48 + (id % 23).toInt)(j =>
      ((id * 131 + j * 31 + 7) & 0xff).toByte)

  test("writeHeif/heifInfo round-trips every structural variant") {
    for {
      brand <- Seq("heic", "heix", "mif1", "avif")
      useIdat <- Seq(false, true)
      wide <- Seq(false, true)
      infeV <- Seq(2, 3)
    } {
      val ilocV = if (useIdat) 1 else 0
      val b = Heif.writeHeif(brand, 640, 360, coded(3L),
        exifBlock = Some(tiff(3L)), useIdat = useIdat, wideIpma = wide,
        ilocVersion = ilocV, infeVersion = infeV)
      val info = Heif.heifInfo(b, 3L)
      val label = s"$brand idat=$useIdat wide=$wide infe=$infeV"
      assert(info.majorBrand == brand, label)
      assert(info.primaryItemId == 1L && info.itemCount == 2, label)
      assert(info.primaryType ==
        (if (brand == "avif") "av01" else "hvc1"), label)
      assert(info.width == 640 && info.height == 360, label)
      assert(info.exif == Exif.exifTags(tiff(3L)), label)
    }
    // iloc version 2 (32-bit item ids), no exif item → empty map
    val bare = Heif.writeHeif("heic", 33, 21, coded(9L), ilocVersion = 2)
    val info = Heif.heifInfo(bare, 9L)
    assert(info.itemCount == 1 && info.exif.isEmpty)
    assert(info.width == 33 && info.height == 21)
  }

  test("ExifDataBlock offset forms: bare TIFF and the Exif\\0\\0 prefix") {
    val plain = Heif.heifInfo(Heif.writeHeif("heic", 10, 10, coded(1L),
      exifBlock = Some(tiff(1L))), 1L)
    val prefixed = Heif.heifInfo(Heif.writeHeif("heic", 10, 10, coded(1L),
      exifBlock = Some(tiff(1L)), exifHeaderPrefix = true), 1L)
    assert(plain.exif == prefixed.exif && plain.exif.nonEmpty)
  }

  test("sniffing: HEIF brands route before the generic ftyp→MP4 rule") {
    assert(Sniff.sniffMime(Heif.writeHeif("heic", 8, 8, coded(2L)))
      .contains("image/heic"))
    assert(Sniff.sniffMime(Heif.writeHeif("heix", 8, 8, coded(2L)))
      .contains("image/heic"))
    assert(Sniff.sniffMime(Heif.writeHeif("mif1", 8, 8, coded(2L)))
      .contains("image/heif"))
    assert(Sniff.sniffMime(Heif.writeHeif("avif", 8, 8, coded(2L)))
      .contains("image/avif"))
    // movie brands still sniff as video
    import graft.operators.{Mp4 => M4}
    val mp4 = M4.writeMp4("isom", 600L, 1200L, Seq(
      M4.Mp4TrackSpec(1L, "vide", "avc1", width = 16, height = 16,
        timescale = 600L, duration = 600L, sampleCount = 2)))
    assert(Sniff.sniffMime(mp4).contains("video/mp4"))
  }

  test("decodeFeatures + imageExif route the HEIF kinds") {
    import spark.implicits._
    val media = Seq(
      Multimodal.Media(1L, "image/heic",
        Heif.writeHeif("heic", 320, 240, coded(1L),
          exifBlock = Some(tiff(1L)))),
      Multimodal.Media(2L, "image/avif",
        Heif.writeHeif("avif", 64, 48, coded(2L)))).toDS()
    val feats = Multimodal.decodeFeatures(media).collect()
      .map(f => f.media_id -> ((f.width, f.height))).toMap
    assert(feats(1L) == ((320, 240)) && feats(2L) == ((64, 48)))
    val exifRows = Multimodal.imageExif(media)
      .as[(Long, String, String, String)].collect()
    assert(exifRows.forall(_._1 == 1L))
    assert(exifRows.map(r => r._3 -> r._4).toMap == Exif.exifTags(tiff(1L)))
  }

  test("fail-loud: non-HEIF brand, missing meta, overruns, cycles spared") {
    import graft.operators.{Mp4 => M4}
    val mp4 = M4.writeMp4("isom", 600L, 1200L, Seq(
      M4.Mp4TrackSpec(1L, "vide", "avc1", width = 16, height = 16,
        timescale = 600L, duration = 600L, sampleCount = 2)))
    intercept[IllegalArgumentException] { Heif.heifInfo(mp4, 1L) }
    // truncate mid-meta: loud
    val b = Heif.writeHeif("heic", 8, 8, coded(1L),
      exifBlock = Some(tiff(1L)))
    intercept[IllegalArgumentException] {
      Heif.heifInfo(java.util.Arrays.copyOfRange(b, 0, b.length / 2), 2L)
    }
    // corrupt the iloc offset of the Exif item: extent overrun is loud
    val evil = b.clone()
    // find 'iloc', walk to the last 8 bytes (extent offset+length of
    // item 2) and blow the offset up
    val at = {
      val probe = "iloc".getBytes("US-ASCII")
      (0 until evil.length - 4).find(i => probe.indices.forall(j =>
        evil(i + j) == probe(j))).get
    }
    val sizeAt = at - 4
    val end = sizeAt + (((evil(sizeAt) & 0xff) << 24) |
      ((evil(sizeAt + 1) & 0xff) << 16) | ((evil(sizeAt + 2) & 0xff) << 8) |
      (evil(sizeAt + 3) & 0xff))
    evil(end - 8) = 0x7f.toByte
    intercept[IllegalArgumentException] { Heif.heifInfo(evil, 3L) }
  }
  test("warc e2e: declared and octet-stream-sniffed HEIC reach the catalogs") {
    import spark.implicits._
    val heic = Heif.writeHeif("heic", 320, 240, coded(1L),
      exifBlock = Some(tiff(1L)))
    val avif = Heif.writeHeif("avif", 64, 48, coded(2L))
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_heif").toString
    graft.io.Warc.writeWarcResponses(
      Seq(("http://a.test/photo.heic", "image/heic", heic),
        // the crawl-reality lie: HEIF served as octet-stream — the
        // sniff shim must route it by the ftyp brand
        ("http://a.test/pic.bin", "application/octet-stream", avif))
        .toDF("target_uri", "content_type", "payload"), dir)
    val media = graft.io.Warc.toMedia(graft.io.Warc.sniffTypes(
      graft.io.Warc.readWarc(spark, dir)))
    val feats = Multimodal.decodeFeatures(media).collect()
      .map(f => f.kind -> ((f.width, f.height))).toMap
    assert(feats("image/heic") == ((320, 240)))
    assert(feats("image/avif") == ((64, 48)))
    val exif = Multimodal.imageExif(media)
      .as[(Long, String, String, String)].collect()
    assert(exif.nonEmpty && exif.forall(_._2 == "image/heic"))
    assert(exif.map(r => r._3 -> r._4).toMap == Exif.exifTags(tiff(1L)))
  }
}
