package graft

import graft.operators.Webp

/** WebP metadata walk: the three image-chunk forms (VP8 lossy, VP8L
  * lossless, VP8X extended), dimension/flag extraction, chunk-walk
  * framing (word alignment), and the fail-loud boundaries — plus the
  * feature bridge. */
class WebpSpec extends SparkSpec {

  test("lossy: 14-bit dimensions behind the start code") {
    val info = Webp.webpInfo(Webp.writeWebp("lossy", 320, 240), 1L)
    assert(info == Webp.WebpInfo("lossy", 320, 240, hasAlpha = false,
      hasAnimation = false, nChunks = 1))
  }

  test("lossless: packed width-1/height-1 and the alpha hint") {
    val a = Webp.webpInfo(Webp.writeWebp("lossless", 16383, 1, alpha = true), 2L)
    assert(a == Webp.WebpInfo("lossless", 16383, 1, hasAlpha = true,
      hasAnimation = false, nChunks = 1))
    val b = Webp.webpInfo(Webp.writeWebp("lossless", 1, 16383), 3L)
    assert(b.width == 1 && b.height == 16383 && !b.hasAlpha)
  }

  test("extended: canvas size, flags, and the chunk count") {
    val info = Webp.webpInfo(
      Webp.writeWebp("extended", 800, 600, alpha = true, animation = true), 4L)
    assert(info == Webp.WebpInfo("extended", 800, 600, hasAlpha = true,
      hasAnimation = true, nChunks = 3)) // VP8X + ALPH + still
    val plain = Webp.webpInfo(Webp.writeWebp("extended", 64, 64), 5L)
    assert(plain.nChunks == 2 && !plain.hasAlpha && !plain.hasAnimation)
  }

  test("odd-sized chunks walk word-aligned") {
    // seeds cycle payload lengths 64..100; find one odd so the pad
    // byte path is exercised (length 64 + seed%37 odd <=> seed odd)
    val info = Webp.webpInfo(Webp.writeWebp("lossy", 10, 10, seed = 9), 6L)
    assert(info.width == 10 && info.nChunks == 1)
  }

  test("fail-loud: bad magic, truncation, missing image chunk, bad start code") {
    intercept[IllegalArgumentException] {
      Webp.webpInfo(Array[Byte](1, 2, 3), 7L)
    }
    val good = Webp.writeWebp("lossy", 100, 50)
    intercept[IllegalArgumentException] {
      Webp.webpInfo(good.take(good.length / 2), 8L)
    }
    // damage the VP8 start code
    val bad = good.clone()
    bad(20 + 3) = 0x00 // 12 (riff) + 8 (chunk head) + 3 = start code byte
    val e = intercept[IllegalArgumentException] {
      Webp.webpInfo(bad, 9L)
    }
    assert(e.getMessage.contains("start code"))
    // a container with only metadata chunks is not an image
    val noImage = {
      val exif = Array[Byte]('E', 'X', 'I', 'F', 4, 0, 0, 0, 1, 2, 3, 4)
      "RIFF".getBytes("US-ASCII") ++
        Array[Byte]((4 + exif.length).toByte, 0, 0, 0) ++
        "WEBP".getBytes("US-ASCII") ++ exif
    }
    val e2 = intercept[IllegalArgumentException] {
      Webp.webpInfo(noImage, 10L)
    }
    assert(e2.getMessage.contains("without a VP8"))
  }

  test("feature bridge: dimensions and flags land in the catalog") {
    import spark.implicits._
    val media = Seq(
      graft.operators.Multimodal.Media(1L, "image/webp",
        Webp.writeWebp("extended", 1920, 1080, alpha = true)),
      graft.operators.Multimodal.Media(2L, "image/webp",
        Webp.writeWebp("lossless", 32, 32)))
      .toDS()
    val feats = graft.operators.Multimodal.decodeFeatures(media)
      .collect().sortBy(_.media_id)
    assert(feats(0).width == 1920 && feats(0).height == 1080)
    assert(feats(0).features(0) == 1f && feats(0).features(1) == 0f)
    assert(feats(1).width == 32 && feats(1).height == 32)
    assert(feats(1).features(0) == 0f)
  }
}
