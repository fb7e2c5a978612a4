package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.Media

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Seq(
    Media(1L, "image/fake", Array.tabulate(1000)(_.toByte)),
    Media(2L, "audio/fake", Array.tabulate(10)(i => (i * 7).toByte)),
    Media(3L, "video/fake", Array.emptyByteArray)).toDS()

  test("decodeFeatures: deterministic stub features, correct schema") {
    val f1 = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
    assert(f1(0).n_bytes == 1000 && f1(1).n_bytes == 10 && f1(2).n_bytes == 0)
    assert(f1.forall(_.features.length == 16))
    assert(f1(0).width == 1 + 1000 % 1024)
  }

  test("decodePpm: real planted P6 bytes decode exactly — dims, means, histogram") {
    // 4×2 image, comment in the header, maxval 255:
    // row 0: pure red, pure green, pure blue, white | row 1: 4× black
    val header = "P6\n# planted test image\n4 2\n255\n".getBytes("US-ASCII")
    val pixels = Array(
      255, 0, 0,  0, 255, 0,  0, 0, 255,  255, 255, 255,
      0, 0, 0,    0, 0, 0,    0, 0, 0,    0, 0, 0).map(_.toByte)
    val ppm = Media(7L, "image/ppm", header ++ pixels)
    val out = Multimodal.decodeFeatures(Seq(ppm).toDS()).collect()(0)
    assert(out.width == 4 && out.height == 2)
    assert(out.n_bytes == header.length + pixels.length)
    // channel means: R = (255+255)/8/255, G likewise, B likewise = 0.25
    assert(math.abs(out.features(0) - 0.25f) < 1e-6)
    assert(math.abs(out.features(1) - 0.25f) < 1e-6)
    assert(math.abs(out.features(2) - 0.25f) < 1e-6)
    assert(out.features(3) == 2.0f) // aspect 4/2
    // luminance bins (maxv 255, 12 bins of ~21.33): red lum 76 → bin 3,
    // green 149 → bin 6, blue 28 → bin 1, white 255 → bin 11, 4× black → bin 0
    val hist = out.features.drop(4)
    assert(hist(0) == 0.5f)
    assert(hist(1) == 0.125f && hist(3) == 0.125f && hist(6) == 0.125f && hist(11) == 0.125f)
    assert(math.abs(hist.sum - 1.0f) < 1e-6)
    // same bytes, kind image/ppm vs fake: the dispatch is real — the stub
    // would produce different dims for this payload
    val asFake = Multimodal.decodeFeatures(
      Seq(ppm.copy(kind = "image/fake")).toDS()).collect()(0)
    assert(asFake.width != out.width || asFake.features.toSeq != out.features.toSeq)
  }

  test("decodePpm: malformed payloads fail loudly, never fake features") {
    def bad(bytes: Array[Byte]) = intercept[IllegalArgumentException] {
      Multimodal.decodePpm(Media(1L, "image/ppm", bytes))
    }
    assert(bad("P5\n1 1\n255\n ".getBytes("US-ASCII")) // wrong magic (grayscale)
      .getMessage.contains("not a binary PPM"))
    assert(bad("P6\n4 2\n255\nxx".getBytes("US-ASCII")) // short pixel data
      .getMessage.contains("truncated"))
    assert(bad("P6\n4 2\n65535\n".getBytes("US-ASCII")) // 16-bit samples
      .getMessage.contains("unsupported"))
    assert(bad("P6\nwide 2\n255\n".getBytes("US-ASCII")) // non-numeric dim
      .getMessage.contains("malformed"))
  }

  /** Minimal RIFF/WAVE writer for planted tests: PCM, LE. */
  private def wavBytes(sampleRate: Int, channels: Int, bits: Int,
      samples: Seq[Int], fmtTag: Int = 1): Array[Byte] = {
    val bps = bits / 8
    val dataLen = samples.length * bps
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    out.write("RIFF".getBytes("US-ASCII")); w32(36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(fmtTag); w16(channels); w32(sampleRate)
    w32(sampleRate * channels * bps); w16(channels * bps); w16(bits)
    out.write("data".getBytes("US-ASCII")); w32(dataLen)
    samples.foreach(s => if (bits == 8) out.write(s & 0xff) else w16(s))
    out.toByteArray
  }

  test("decodeWav: planted 16-bit PCM decodes exactly — rate, RMS, crossings, duration") {
    // mono square wave at half amplitude: +16384, -16384, ... (8 samples)
    val sq = wavBytes(8000, 1, 16, Seq.fill(4)(Seq(16384, -16384)).flatten)
    val out = Multimodal.decodeFeatures(
      Seq(Media(9L, "audio/wav", sq)).toDS()).collect()(0)
    assert(out.width == 8000 && out.height == 1)        // rate, channels
    assert(math.abs(out.features(0) - 0.5f) < 1e-6)     // zero DC offset
    assert(math.abs(out.features(1) - 0.5f) < 1e-6)     // RMS = amplitude
    assert(math.abs(out.features(2) - 7.0f / 8) < 1e-6) // 7 crossings / 8 samples
    assert(math.abs(out.features(3) - 8.0f / 8000) < 1e-9) // duration s
    // every |sample| = 0.5 → histogram bin 6 holds everything
    assert(out.features(4 + 6) == 1.0f)
    assert(math.abs(out.features.drop(4).sum - 1.0f) < 1e-6)
    // stereo 8-bit: silence on both channels → RMS 0, centered mean
    val st = wavBytes(44100, 2, 8, Seq.fill(20)(128))
    val so = Multimodal.decodeFeatures(
      Seq(Media(10L, "audio/wav", st)).toDS()).collect()(0)
    assert(so.width == 44100 && so.height == 2)
    assert(math.abs(so.features(0) - 0.5f) < 1e-6 && so.features(1) == 0.0f)
  }

  test("decodeWav: 24/32-bit int, float32/64, EXTENSIBLE — identical features and fingerprints") {
    import spark.implicits._
    // every variant encodes EXACTLY the same values (s/2^15 is exact in
    // float32/64, s<<8 / 2^23 == s<<16 / 2^31 == s/2^15), so features
    // and fingerprints must be BIT-identical across the format battery
    val s16 = TestWav.toneSamples(8000, 0.4, Seq((500.0, 0.5), (1200.0, 0.25)))
    def media(id: Long, b: Array[Byte]) = Media(id, "audio/wav", b)
    val w16 = TestWav(8000, 1, 16, s16)
    val variants = Seq(
      "pcm24" -> TestWav(8000, 1, 24, s16.map(_ << 8)),
      "pcm32" -> TestWav(8000, 1, 32, s16.map(_ << 16)),
      "f32" -> TestWav.float32(8000, 1, s16.map(v => (v / 32768.0).toFloat)),
      "f64" -> TestWav.float64(8000, 1, s16.map(_ / 32768.0)),
      "extensible" -> TestWav.extensiblePcm16(8000, 1, s16))
    val ref = Multimodal.decodeWav(media(1L, w16))
    variants.foreach { case (name, b) =>
      val f = Multimodal.decodeWav(media(2L, b))
      assert(f.width == ref.width && f.height == ref.height, name)
      assert(f.features.toSeq == ref.features.toSeq,
        s"$name features diverged from 16-bit PCM")
    }
    val href = Multimodal.audioHash64(media(1L, w16))
    variants.foreach { case (name, b) =>
      assert(Multimodal.audioHash64(media(3L, b)) == href,
        s"$name fingerprint diverged from 16-bit PCM")
    }
  }

  test("decodeWav: malformed payloads fail loudly, never fake features") {
    def bad(bytes: Array[Byte]) = intercept[IllegalArgumentException] {
      Multimodal.decodeWav(Media(1L, "audio/wav", bytes))
    }
    assert(bad("not audio at all, definitely not RIFF/WAVE bytes here"
      .getBytes("US-ASCII")).getMessage.contains("not a RIFF/WAVE"))
    assert(bad(wavBytes(8000, 1, 16, Seq(1, 2, 3), fmtTag = 3)) // 16-bit float: no such thing
      .getMessage.contains("IEEE float unsupported"))
    assert(bad(wavBytes(8000, 1, 16, Seq(1, 2, 3), fmtTag = 2)) // ADPCM
      .getMessage.contains("format 2 unsupported"))
    val truncated = wavBytes(8000, 1, 16, Seq.fill(100)(5)).dropRight(40)
    assert(bad(truncated).getMessage.contains("truncated"))
    // hostile unsigned chunk size ≥ 2^31: 0xFFFFFFF8.toInt = -8 would make
    // the walk advance 0 bytes and spin forever; must fail loudly instead
    val hostile = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { hostile.write(v & 0xff); hostile.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    hostile.write("RIFF".getBytes("US-ASCII")); w32(1000L)
    hostile.write("WAVE".getBytes("US-ASCII"))
    hostile.write("JUNK".getBytes("US-ASCII")); w32(0xFFFFFFF8L)
    hostile.write(new Array[Byte](32)) // payload far shorter than claimed
    assert(bad(hostile.toByteArray).getMessage.contains("claims"))
    // the resample path shares the guarded walk
    intercept[IllegalArgumentException] {
      Multimodal.resampleWav(Media(1L, "audio/wav", hostile.toByteArray), 2)
    }
  }

  test("resizePpm: nearest-neighbor picks exact source pixels; output re-decodes") {
    // 4×2 planted image (see decodePpm test) → 2×1: rows map to sy=0,
    // columns 0,1 map to sx=0,2 → pixels (red, blue)
    val header = "P6\n4 2\n255\n".getBytes("US-ASCII")
    val pixels = Array(
      255, 0, 0,  0, 255, 0,  0, 0, 255,  255, 255, 255,
      0, 0, 0,    0, 0, 0,    0, 0, 0,    0, 0, 0).map(_.toByte)
    val m = Media(1L, "image/ppm", header ++ pixels)
    val small = Multimodal.resizePpm(m, 2, 1)
    val dec = Multimodal.decodePpm(small)
    assert(dec.width == 2 && dec.height == 1)
    val body = small.bytes.drop("P6\n2 1\n255\n".length)
    assert(body.toSeq == Seq(255, 0, 0, 0, 0, 255).map(_.toByte)) // red, blue
    // upscale replicates pixels and still decodes
    val big = Multimodal.decodePpm(Multimodal.resizePpm(m, 8, 4))
    assert(big.width == 8 && big.height == 4)
    intercept[IllegalArgumentException](Multimodal.resizePpm(m, 0, 4))
  }

  test("resampleWav: decimation halves rate and keeps every k-th frame exactly") {
    val sq = wavBytes(8000, 1, 16, Seq.fill(4)(Seq(16384, -16384)).flatten)
    val m = Media(2L, "audio/wav", sq)
    val half = Multimodal.resampleWav(m, 2)
    val dec = Multimodal.decodeWav(half)
    assert(dec.width == 4000 && dec.height == 1)
    // kept frames are the +16384 ones: no crossings, RMS unchanged
    assert(dec.features(2) == 0.0f)
    assert(math.abs(dec.features(1) - 0.5f) < 1e-6)
    assert(math.abs(dec.features(3) - 4.0f / 4000) < 1e-9) // 4 frames @ 4 kHz
    // the dataset face dispatches by kind and passes unknown kinds through
    val mixed = Seq(m, Media(3L, "video/fake", Array[Byte](1, 2, 3))).toDS()
    val out = Multimodal.resizeMedia(mixed, 2, 2, audioFactor = 2)
      .collect().map(x => x.media_id -> x).toMap
    assert(Multimodal.decodeWav(out(2L)).width == 4000)
    assert(out(3L).bytes.toSeq == Seq[Byte](1, 2, 3))
  }

  test("decodePng: all five scanline filters decode to exact pixels — PPM feature parity") {
    // 4×5 RGB with varied rows so every filter's predictor is non-trivial;
    // one row per filter type None/Sub/Up/Average/Paeth
    val px = Array(
      255, 0, 0,    0, 255, 0,    0, 0, 255,    255, 255, 255,
      10, 20, 30,   40, 50, 60,   70, 80, 90,   100, 110, 120,
      200, 100, 50, 25, 75, 225,  0, 0, 0,      128, 128, 128,
      1, 2, 3,      254, 253, 252, 17, 34, 51,  68, 85, 102,
      90, 180, 45,  45, 90, 180,  180, 45, 90,  9, 8, 7).map(_.toByte)
    val png = Media(21L, "image/png", TestPng(4, 5, 2, px, filters = Seq(0, 1, 2, 3, 4)))
    val out = Multimodal.decodeFeatures(Seq(png).toDS()).collect()(0)
    assert(out.width == 4 && out.height == 5)
    assert(out.n_bytes == png.bytes.length)
    // identical pixels through the PPM decoder → identical features
    val ppm = Multimodal.decodePpm(
      Media(22L, "image/ppm", "P6\n4 5\n255\n".getBytes("US-ASCII") ++ px))
    assert(out.features.toSeq == ppm.features.toSeq)
    // same bytes under a stub kind would NOT produce these dims — dispatch is real
    val asFake = Multimodal.decodeFeatures(
      Seq(png.copy(kind = "image/x-unknown")).toDS()).collect()(0)
    assert(asFake.width != out.width || asFake.features.toSeq != out.features.toSeq)
  }

  test("decodePng: color-type matrix — gray, palette, gray+alpha, RGBA resolve identically") {
    val rgb = Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 128, 128, 128).map(_.toByte)
    val base = Multimodal.decodePng(Media(1L, "image/png", TestPng(2, 2, 2, rgb, Seq(1, 4))))
    // RGBA: same pixels, alpha varies — alpha must be ignored
    val rgba = Array(255, 0, 0, 0, 0, 255, 0, 64, 0, 0, 255, 128, 128, 128, 128, 255).map(_.toByte)
    val a = Multimodal.decodePng(Media(2L, "image/png", TestPng(2, 2, 6, rgba, Seq(4, 3))))
    assert(a.features.toSeq == base.features.toSeq)
    // palette: indices resolve through PLTE to the same colors
    val plte = Array(128, 128, 128, 255, 0, 0, 0, 255, 0, 0, 0, 255).map(_.toByte)
    val idx = Array[Byte](1, 2, 3, 0)
    val p = Multimodal.decodePng(Media(3L, "image/png", TestPng(2, 2, 3, idx, Seq(0), palette = plte)))
    assert(p.features.toSeq == base.features.toSeq)
    // grayscale and gray+alpha: r=g=b=v, same as an RGB expansion
    val gray = Array(0, 85, 170, 255).map(_.toByte)
    val grayRgb = gray.flatMap(v => Array(v, v, v))
    val g = Multimodal.decodePng(Media(4L, "image/png", TestPng(2, 2, 0, gray, Seq(2))))
    val gBase = Multimodal.decodePng(Media(5L, "image/png", TestPng(2, 2, 2, grayRgb, Seq(0))))
    assert(g.features.toSeq == gBase.features.toSeq)
    val grayA = Array(0, 200, 85, 10, 170, 99, 255, 0).map(_.toByte)
    val ga = Multimodal.decodePng(Media(6L, "image/png", TestPng(2, 2, 4, grayA, Seq(1, 2))))
    assert(ga.features.toSeq == gBase.features.toSeq)
  }

  test("decodePng: malformed payloads fail loudly, never fake features") {
    def bad(bytes: Array[Byte]) = intercept[IllegalArgumentException] {
      Multimodal.decodePng(Media(1L, "image/png", bytes))
    }
    val px = Array.fill(12)(7.toByte)
    val valid = TestPng(2, 2, 2, px)
    assert(bad("GIF89a not a png".getBytes("US-ASCII")).getMessage.contains("not a PNG"))
    // corrupt one IDAT payload byte → chunk CRC must catch it
    val idatAt = valid.indexOfSlice("IDAT".getBytes("US-ASCII"))
    val corrupt = valid.clone()
    corrupt(idatAt + 4) = (corrupt(idatAt + 4) ^ 0x55).toByte
    assert(bad(corrupt).getMessage.contains("CRC mismatch"))
    // 16-bit depth and Adam7 are rejected, not misread
    assert(bad(TestPng(2, 2, 2, px, bitDepth = 16)) // IHDR claims 16-bit
      .getMessage.contains("unsupported"))
    assert(bad(TestPng(2, 2, 2, px, interlace = 1)).getMessage.contains("unsupported"))
    // IHDR claims more rows than the IDAT stream carries → short pixel data
    val shortPng = new java.io.ByteArrayOutputStream()
    shortPng.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new java.io.ByteArrayOutputStream()
    TestPng.writeU32(ihdr, 2L); TestPng.writeU32(ihdr, 3L) // h=3, data has 2 rows
    ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    TestPng.chunk(shortPng, "IHDR", ihdr.toByteArray)
    val validIdatLen = ((valid(idatAt - 4) & 0xff) << 24) | ((valid(idatAt - 3) & 0xff) << 16) |
      ((valid(idatAt - 2) & 0xff) << 8) | (valid(idatAt - 1) & 0xff)
    TestPng.chunk(shortPng, "IDAT",
      java.util.Arrays.copyOfRange(valid, idatAt + 4, idatAt + 4 + validIdatLen))
    TestPng.chunk(shortPng, "IEND", Array.emptyByteArray)
    assert(bad(shortPng.toByteArray).getMessage.contains("short"))
    // hostile unsigned chunk length ≥ 2^31: must fail the bounds check,
    // not wrap negative through .toInt (same discipline as the WAV walk)
    val hostile = new java.io.ByteArrayOutputStream()
    hostile.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    TestPng.writeU32(hostile, 0xFFFFFFF8L)
    hostile.write("IDAT".getBytes("US-ASCII"))
    hostile.write(new Array[Byte](64))
    assert(bad(hostile.toByteArray).getMessage.contains("claims"))
    // palette index past PLTE end
    val oob = TestPng(1, 1, 3, Array[Byte](5), palette = Array(1, 2, 3).map(_.toByte))
    assert(bad(oob).getMessage.contains("palette index"))
    // truncated mid-chunk
    assert(bad(valid.dropRight(6)).getMessage.toLowerCase.contains("truncated"))
  }

  // palette: idx 0 black, 1 red, 2 green, 3 white
  private val gifPal = Array(
    0, 0, 0,  255, 0, 0,  0, 255, 0,  255, 255, 255).map(_.toByte)

  /** Decode a gifFrameSample PPM payload back to (w, h, rgb bytes). */
  private def ppmPixels(p: Array[Byte]): (Int, Int, Seq[Byte]) = {
    val s = new String(p, "US-ASCII")
    val m = "P6\\n(\\d+) (\\d+)\\n255\\n".r.findPrefixMatchOf(s).get
    (m.group(1).toInt, m.group(2).toInt, p.drop(m.matched.length).toSeq)
  }

  test("decodeGif: planted frame round-trips through own-LZW decode — dims, means") {
    // 4×2: row 0 = red red green white, row 1 = black ×4
    val px = Array[Byte](1, 1, 2, 3, 0, 0, 0, 0)
    val gif = Media(31L, "image/gif",
      TestGif(4, 2, gifPal, Seq(TestGif.Frame(0, 0, 4, 2, px))))
    val out = Multimodal.decodeFeatures(Seq(gif).toDS()).collect()(0)
    assert(out.width == 4 && out.height == 2)
    // means: R = (255+255+255)/8/255, G = (255+255)/8/255, B = 255/8/255
    assert(math.abs(out.features(0) - 3f / 8) < 1e-6)
    assert(math.abs(out.features(1) - 2f / 8) < 1e-6)
    assert(math.abs(out.features(2) - 1f / 8) < 1e-6)
    assert(out.features(3) == 2.0f)
  }

  test("gifFrameSample: animation frames compose (sub-rect, transparency, disposal)") {
    // frame 0: full 4×2 red; frame 1: 2×1 sub-rect at (1,1), green with a
    // transparent pixel (idx 1 marked transparent — red shows through);
    // disposal 2 on frame 1 restores its rect to background (black) for
    // frame 2, a full-white frame drawn only on row 0 sub-rect
    val gif = Media(32L, "image/gif", TestGif(4, 2, gifPal, Seq(
      TestGif.Frame(0, 0, 4, 2, Array[Byte](1, 1, 1, 1, 1, 1, 1, 1)),
      TestGif.Frame(1, 1, 2, 1, Array[Byte](2, 1), disposal = 2, transparentIdx = 1),
      TestGif.Frame(0, 0, 4, 1, Array[Byte](3, 3, 3, 3)))))
    val frames = Multimodal.gifFrameSample(Seq(gif).toDS()).collect()
      .sortBy(_.frame_idx)
    assert(frames.length == 3 && frames.forall(_.kind == "image/ppm"))
    def rgbAt(f: Array[Byte], x: Int, y: Int): Seq[Int] = {
      val (w, _, px) = ppmPixels(f)
      px.slice((y * w + x) * 3, (y * w + x) * 3 + 3).map(_ & 0xff)
    }
    assert(rgbAt(frames(0).frame, 0, 0) == Seq(255, 0, 0))
    // frame 1: green lands at (1,1); transparent pixel at (2,1) keeps red
    assert(rgbAt(frames(1).frame, 1, 1) == Seq(0, 255, 0))
    assert(rgbAt(frames(1).frame, 2, 1) == Seq(255, 0, 0))
    // frame 2: disposal 2 restored (1,1)-(2,1) to background black, row 0 white
    assert(rgbAt(frames(2).frame, 1, 1) == Seq(0, 0, 0))
    assert(rgbAt(frames(2).frame, 2, 1) == Seq(0, 0, 0))
    assert(rgbAt(frames(2).frame, 0, 0) == Seq(255, 255, 255))
    // the emitted PPM payloads feed the real image tier directly
    val refed = Multimodal.decodeFeatures(
      Seq(Media(33L, "image/ppm", frames(2).frame)).toDS()).collect()(0)
    assert(refed.width == 4 && refed.height == 2)
    // every=2 samples frames 0 and 2
    assert(Multimodal.gifFrameSample(Seq(gif).toDS(), every = 2)
      .collect().map(_.frame_idx).sorted.toSeq == Seq(0, 2))
  }

  test("decodeGif: interlace, local palettes, long-run LZW (KwKwK) all decode exactly") {
    // 8×8 long-run image — runs drive the dictionary/KwKwK path
    val runs = Array.tabulate(64)(i => (if (i < 30) 1 else if (i < 34) 2 else 3).toByte)
    val plain = TestGif(8, 8, gifPal, Seq(TestGif.Frame(0, 0, 8, 8, runs)))
    val inter = TestGif(8, 8, gifPal, Seq(TestGif.Frame(0, 0, 8, 8, runs, interlaced = true)))
    val Seq(a, b) = Multimodal.gifFrameSample(
      Seq(Media(40L, "image/gif", plain), Media(41L, "image/gif", inter)).toDS())
      .collect().sortBy(_.media_id).toSeq
    assert(a.frame.toSeq == b.frame.toSeq, "interlaced decode diverged")
    val (_, _, px) = ppmPixels(a.frame)
    assert(px.slice(0, 3).map(_ & 0xff) == Seq(255, 0, 0))
    assert(px.slice(63 * 3, 64 * 3).map(_ & 0xff) == Seq(255, 255, 255))
    // a local palette overrides the global one
    val lct = Array(0, 0, 255, 0, 255, 255).map(_.toByte) // idx 0 blue, 1 cyan
    val withLct = TestGif(2, 1, gifPal,
      Seq(TestGif.Frame(0, 0, 2, 1, Array[Byte](0, 1), localPalette = lct)))
    val f = Multimodal.gifFrameSample(
      Seq(Media(42L, "image/gif", withLct)).toDS()).collect()(0)
    assert(ppmPixels(f.frame)._3.map(_ & 0xff) == Seq(0, 0, 255, 0, 255, 255))
  }

  test("decodeGif: malformed payloads fail loudly, never fake features") {
    val good = TestGif(2, 2, gifPal, Seq(TestGif.Frame(0, 0, 2, 2, Array[Byte](0, 1, 2, 3))))
    def decodeAs(bytes: Array[Byte]): Unit =
      Multimodal.decodeFeatures(Seq(Media(50L, "image/gif", bytes)).toDS()).collect()
    decodeAs(good) // sanity: the base payload decodes
    intercept[org.apache.spark.SparkException] { decodeAs(good.take(10)) }
    intercept[org.apache.spark.SparkException] { decodeAs("NOTAGIF".getBytes) }
    // frame rect escaping the canvas
    val badRect = TestGif(2, 2, gifPal, Seq(TestGif.Frame(1, 1, 2, 2, Array[Byte](0, 1, 2, 3))))
    intercept[org.apache.spark.SparkException] { decodeAs(badRect) }
    // truncated mid-pixel-data
    intercept[org.apache.spark.SparkException] { decodeAs(good.dropRight(4)) }
    // unknown block type where a descriptor belongs
    val junk = good.clone(); junk(13 + gifPal.length) = 0x7f
    intercept[org.apache.spark.SparkException] { decodeAs(junk) }
  }

  test("decodeJpeg: flat blocks decode exactly; gradients within quantization error") {
    // flat 128 grayscale: every FDCT coefficient is 0 → bit-exact recovery
    val flat = Array.fill[Byte](16 * 16)(128.toByte)
    val (w1, h1, px1) = Multimodal.decodeJpegCanvas(
      Media(60L, "image/jpeg", TestJpeg(16, 16, flat, grayscale = true)))
    assert(w1 == 16 && h1 == 16)
    assert(px1.forall(_ == 128.toByte), "flat-128 grayscale must round-trip exactly")
    // horizontal ramp: low-frequency content — per-pixel error bounded by
    // the quantization step, nothing structural
    val ramp = Array.tabulate[Byte](16 * 16)(i => (64 + (i % 16) * 8).toByte)
    val (_, _, px2) = Multimodal.decodeJpegCanvas(
      Media(61L, "image/jpeg", TestJpeg(16, 16, ramp, grayscale = true)))
    val maxErr = px2.grouped(3).zipWithIndex.map { case (rgb, i) =>
      math.abs((rgb(0) & 0xff) - (ramp(i) & 0xff)) }.max
    assert(maxErr <= 8, s"gradient error $maxErr exceeds quantization bound")
    // color: solid red through YCbCr and back, channel tolerance
    val red = Array.tabulate[Byte](8 * 8 * 3)(i =>
      if (i % 3 == 0) 255.toByte else 0.toByte)
    val (_, _, px3) = Multimodal.decodeJpegCanvas(
      Media(62L, "image/jpeg", TestJpeg(8, 8, red)))
    px3.grouped(3).foreach { p =>
      assert((p(0) & 0xff) >= 245 && (p(1) & 0xff) <= 12 && (p(2) & 0xff) <= 12,
        s"solid red decoded to ${p.map(_ & 0xff).toSeq}")
    }
  }

  test("decodeJpeg: 4:2:0 MCU geometry, restart markers, feature routing") {
    // flat color: chroma constant, so 4:2:0 subsampling is lossless —
    // the four-luma-block + averaged-chroma MCU path must agree with 4:4:4
    val teal = Array.tabulate[Byte](24 * 16 * 3)(i =>
      (i % 3 match { case 0 => 0; case 1 => 128; case _ => 128 }).toByte)
    val (_, _, a) = Multimodal.decodeJpegCanvas(
      Media(63L, "image/jpeg", TestJpeg(24, 16, teal, subsample = false)))
    val (_, _, b) = Multimodal.decodeJpegCanvas(
      Media(64L, "image/jpeg", TestJpeg(24, 16, teal, subsample = true)))
    assert(a.toSeq == b.toSeq, "4:2:0 diverged from 4:4:4 on constant chroma")
    // restart markers only reset DC predictors — decoded pixels identical
    val ramp = Array.tabulate[Byte](32 * 8)(i => (32 + (i % 32) * 4).toByte)
    val plain = Multimodal.decodeJpegCanvas(
      Media(65L, "image/jpeg", TestJpeg(32, 8, ramp, grayscale = true)))._3
    val rst = Multimodal.decodeJpegCanvas(
      Media(66L, "image/jpeg", TestJpeg(32, 8, ramp, grayscale = true, restartEvery = 2)))._3
    assert(plain.toSeq == rst.toSeq, "restart markers changed decoded pixels")
    // decodeFeatures routes image/jpeg with real dims
    val out = Multimodal.decodeFeatures(Seq(
      Media(67L, "image/jpeg", TestJpeg(24, 16, teal))).toDS()).collect()(0)
    assert(out.width == 24 && out.height == 16 && out.features(3) == 1.5f)
  }

  test("decodeJpeg: malformed payloads fail loudly, never fake features") {
    val good = TestJpeg(8, 8, Array.fill[Byte](64)(100.toByte), grayscale = true)
    def decodeAs(bytes: Array[Byte]): Unit =
      Multimodal.decodeFeatures(Seq(Media(70L, "image/jpeg", bytes)).toDS()).collect()
    decodeAs(good) // sanity
    intercept[org.apache.spark.SparkException] { decodeAs("JFIFnope".getBytes) }
    // truncated scan: EOI gone — must not silently zero-pad to completion
    intercept[org.apache.spark.SparkException] { decodeAs(good.dropRight(6)) }
    // progressive coding is rejected, not half-decoded
    val prog = good.clone()
    val sofAt = {
      var i = 2
      while (!((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0)) i += 1
      i
    }
    prog(sofAt + 1) = 0xc2.toByte
    intercept[org.apache.spark.SparkException] { decodeAs(prog) }
  }

  test("frameSample: frames reassemble to the original payload") {
    val frames = Multimodal.frameSample(media.toDF(), frameBytes = 256)
      .orderBy("media_id", "frame_idx").collect()
    val byId = frames.groupBy(_.getAs[Long]("media_id"))
    val reassembled = byId(1L).sortBy(_.getAs[Int]("frame_idx"))
      .flatMap(_.getAs[Array[Byte]]("frame"))
    assert(reassembled.toSeq == Array.tabulate(1000)(_.toByte).toSeq)
    // ceil(1000/256) = 4 frames, last one short
    assert(byId(1L).length == 4)
    assert(!byId.contains(3L)) // empty payload yields no frames
  }
}
