package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.Media

class PHashSpec extends SparkSpec {
  import spark.implicits._

  private def ppm(w: Int, h: Int, rgb: Array[Byte], id: Long = 1L): Media = {
    require(rgb.length == w * h * 3)
    Media(id, "image/ppm", s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb)
  }

  /** Structured test image: smooth diagonal gradient with a bright
    * rectangle — real low-frequency content for the DCT to latch onto
    * (uniform noise would make every hash a coin flip). */
  private def scene(w: Int, h: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      val base = ((x * 200) / w + (y * 55) / h).min(255)
      val inRect = x >= w / 4 && x < w / 2 && y >= h / 4 && y < (3 * h) / 4
      val v = if (inRect) 255 - base else base
      rgb(o) = v.toByte; rgb(o + 1) = ((v * 3) / 4).toByte; rgb(o + 2) = (v / 2).toByte
    }
    rgb
  }

  private def checker(w: Int, h: Int, cell: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      val v = if (((x / cell) + (y / cell)) % 2 == 0) 230 else 25
      rgb(o) = v.toByte; rgb(o + 1) = v.toByte; rgb(o + 2) = v.toByte
    }
    rgb
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("identical canvas as PPM and PNG hashes identically (format invariance)") {
    val rgb = scene(64, 48)
    val hPpm = Multimodal.perceptualHash64(ppm(64, 48, rgb))
    val png = Media(2L, "image/png",
      TestPng(64, 48, colorType = 2, rgb, filters = Seq(0, 1, 2, 3, 4)))
    val hPng = Multimodal.perceptualHash64(png)
    assert(hPpm == hPng)
  }

  test("small pixel perturbations stay within a few bits") {
    val rgb = scene(64, 64)
    val mut = rgb.clone()
    // +4 on every 17th byte — visible noise, same structure
    var i = 0
    while (i < mut.length) { mut(i) = (((mut(i) & 0xff) + 4).min(255)).toByte; i += 17 }
    val d = hamming(
      Multimodal.perceptualHash64(ppm(64, 64, rgb)),
      Multimodal.perceptualHash64(ppm(64, 64, mut, id = 2L)))
    assert(d <= 8, s"perturbed twin drifted $d bits")
  }

  test("resize invariance: the same scene at 64x64 and 128x128 is near") {
    val d = hamming(
      Multimodal.perceptualHash64(ppm(64, 64, scene(64, 64))),
      Multimodal.perceptualHash64(ppm(128, 128, scene(128, 128), id = 2L)))
    assert(d <= 8, s"rescaled scene drifted $d bits")
  }

  test("structurally different images are far apart") {
    val d = hamming(
      Multimodal.perceptualHash64(ppm(64, 64, scene(64, 64))),
      Multimodal.perceptualHash64(ppm(64, 64, checker(64, 64, 8), id = 2L)))
    assert(d >= 16, s"unrelated images only $d bits apart")
  }

  test("JPEG re-encode of the scene stays within the near-dup radius") {
    val rgb = scene(64, 64)
    val jpg = Media(3L, "image/jpeg", TestJpeg(64, 64, rgb, quality = 90))
    val d = hamming(
      Multimodal.perceptualHash64(ppm(64, 64, rgb)),
      Multimodal.perceptualHash64(jpg))
    assert(d <= 8, s"jpeg re-encode drifted $d bits")
  }

  test("GIF hashes on its first composed frame") {
    // 2-entry palette checkerboard GIF vs the same canvas as PPM
    val w = 64; val h = 64
    val palette = Array[Byte](25, 25, 25, 230.toByte, 230.toByte, 230.toByte)
    val idx = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      idx(y * w + x) = (if (((x / 8) + (y / 8)) % 2 == 0) 1 else 0).toByte
    val gif = Media(4L, "image/gif",
      TestGif(w, h, palette, Seq(TestGif.Frame(0, 0, w, h, idx))))
    val hGif = Multimodal.perceptualHash64(gif)
    val hPpm = Multimodal.perceptualHash64(ppm(w, h, checker(w, h, 8)))
    assert(hGif == hPpm)
  }

  test("imageNearDupPairs: planted twins pair, unrelated images do not") {
    val scenes = (0L until 6L).map { k =>
      // six distinct scenes: shift the gradient per k so they differ
      val rgb = scene(64, 64).clone()
      var i = 0
      while (i < rgb.length) {
        rgb(i) = (((rgb(i) & 0xff) + k * 37) % 256).toByte
        i += 3 * (k.toInt + 1)
      }
      ppm(64, 64, rgb, id = k)
    }
    val twins = scenes.map { m =>
      val b = m.bytes.clone()
      // perturb pixel bytes past the header
      var i = b.length - 1
      var n = 0
      while (i > 20 && n < 500) { b(i) = ((b(i) & 0xff) ^ 1).toByte; i -= 7; n += 1 }
      Media(m.media_id + 100L, "image/ppm", b)
    }
    val checkers = Seq(ppm(64, 64, checker(64, 64, 8), id = 50L))
    val hashes = Multimodal.imagePHashes(
      (scenes ++ twins ++ checkers).toDS())
    val pairs = Multimodal.imageNearDupPairs(hashes, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (k <- 0L until 6L)
      assert(pairs.contains((k, k + 100L)), s"twin pair $k missing")
    assert(!pairs.exists { case (a, b) => a == 50L || b == 50L },
      "the checkerboard paired with a scene")
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("syntheticScenePpm: twins within radius 8, cross-family bases beyond it") {
    val ids = 0L until 64L
    val hash = ids.map(id => id ->
      Multimodal.perceptualHash64(Media(id, "image/ppm",
        Multimodal.syntheticScenePpm(id)))).toMap
    val twin = ids.map(id =>
      Multimodal.perceptualHash64(Media(id, "image/ppm",
        Multimodal.syntheticScenePpm(id, perturb = true))))
    for (id <- ids) {
      val d = hamming(hash(id), twin(id.toInt))
      assert(d <= 8, s"twin of scene $id drifted $d bits")
    }
    for (a <- ids; b <- ids if a < b && a % 4 != b % 4) {
      val d = hamming(hash(a), hash(b))
      assert(d > 8, s"cross-family scenes $a/$b only $d bits apart")
    }
  }

  test("non-image kinds fail loudly instead of hashing garbage") {
    intercept[IllegalArgumentException] {
      Multimodal.perceptualHash64(Media(9L, "audio/wav", Array[Byte](1, 2, 3)))
    }
  }

  test("decodePpmCanvas rescales non-255 maxval to the canonical range") {
    // 1x1 pixel at maxval 100, value (100, 50, 0) -> (255, 128, 0)
    val bytes = "P6\n1 1\n100\n".getBytes("US-ASCII") ++
      Array[Byte](100, 50, 0)
    val (w, h, rgb) = Multimodal.decodePpmCanvas(Media(1L, "image/ppm", bytes))
    assert((w, h) == (1, 1))
    assert(rgb.map(_ & 0xff).toSeq == Seq(255, 128, 0))
  }
}
