package graft

import graft.operators.{Mpeg, Multimodal}
import graft.operators.Multimodal.Media

/** MPEG audio: metadata walker exactness, Layer I subband-layer
  * exactness against planted frames (Layer I's coded layer is lossless
  * — the FLAC precedent), near-PR filterbank round-trip bounds, and
  * the documented Layer II/III metadata-only degrade. */
class Mp3Spec extends SparkSpec {

  private def sine(n: Int, amp: Double, period: Double): Array[Int] =
    Array.tabulate(n)(i =>
      (amp * 32767 * StrictMath.sin(2 * StrictMath.PI * i / period)).toInt)

  // -- metadata walker ----------------------------------------------------

  test("mpegInfo: Layer III CBR stream — frames, duration, rates, mode") {
    val s = TestMp3.layerStub(3, 44100, 128, frames = 25, mode = 3)
    val i = Mpeg.mpegInfo(s)
    assert(i.version == 1 && i.layer == 3)
    assert(i.sampleRate == 44100 && i.channels == 1)
    assert(i.frames == 25 && i.samples == 25L * 1152 && !i.vbr)
    assert(i.bitrateKbps == 128)
    assert(math.abs(i.durationSec - 25.0 * 1152 / 44100) < 1e-9)
  }

  test("mpegInfo: Xing count honored only within the self-count ambiguity") {
    // the walker counts every frame, so a declared count is accepted
    // only within ±1 (does the tag frame count itself?); here the tag
    // says the Xing frame does NOT count itself → 4 wins over walked 5
    val s = TestMp3.layerStub(3, 44100, 128, frames = 5,
      xingFrames = Some(4), xingVbr = true)
    val i = Mpeg.mpegInfo(s)
    assert(i.frames == 4 && i.vbr, "plausible Xing count wins for duration")
    assert(math.abs(i.durationSec - 4.0 * 1152 / 44100) < 1e-9)
    // stereo side-info offset variant, exact agreement
    val st = TestMp3.layerStub(3, 44100, 128, frames = 5, mode = 0,
      xingFrames = Some(5), xingVbr = false)
    assert(Mpeg.mpegInfo(st).frames == 5)
  }

  test("mpegInfo: lying/hostile Xing counts fall back to the walked count") {
    // a wildly-off count must not produce absurd durations
    val lying = TestMp3.layerStub(3, 44100, 128, frames = 5,
      xingFrames = Some(1000), xingVbr = true)
    val li = Mpeg.mpegInfo(lying)
    assert(li.frames == 5, "lying tag count rejected, walked count wins")
    assert(li.vbr, "tag NAME (Xing=VBR) is structural and still honored")
    // u32 with the sign bit set reads negative after .toInt — must not
    // yield negative samples/duration
    val hostile = TestMp3.layerStub(3, 44100, 128, frames = 5,
      xingFrames = Some(0x80000005), xingVbr = true)
    val hi = Mpeg.mpegInfo(hostile)
    assert(hi.frames == 5 && hi.samples > 0 && hi.durationSec > 0)
    // zero is implausible too (there is at least the tag frame)
    val zero = TestMp3.layerStub(3, 44100, 128, frames = 5,
      xingFrames = Some(0), xingVbr = false)
    assert(Mpeg.mpegInfo(zero).frames == 5)
  }

  test("streamHash64/frameHashes64: tag-invariant identity, all layers") {
    // real coded Layer I audio: re-tagging must not move the hash
    val pcm = Array.tabulate(2304)(i => (8000 * StrictMath.sin(i / 11.0)).toInt)
    val s = TestMp3.layer1(32000, 1, pcm)
    assert(Mpeg.streamHash64(TestMp3.withId3(s)) == Mpeg.streamHash64(s))
    assert(Mpeg.frameHashes64(s).length == Mpeg.mpegInfo(s).frames)
    // Layer III: sample decode is refused, but identity still exists —
    // the no-fingerprint gap the stream hash closes
    val l3 = TestMp3.layerStub(3, 44100, 128, frames = 7)
    intercept[IllegalArgumentException] { Mpeg.decodeSamples(l3) }
    assert(Mpeg.streamHash64(TestMp3.withId3(l3)) == Mpeg.streamHash64(l3))
    assert(Mpeg.frameHashes64(l3).length == 7)
  }

  test("id3Frames: v2.3/v2.4, all text encodings, non-ASCII, boundaries") {
    val s = TestMp3.layerStub(3, 44100, 128, frames = 5)
    val tags = Seq("TIT2" -> "Café Récital — 夜曲", "TPE1" -> "Ärtist")
    Seq((3, 0), (3, 1), (4, 2), (4, 3)).foreach { case (major, enc) =>
      val planted = if (enc == 0) // latin-1 can't carry CJK
        Seq("TIT2" -> "Café Récital", "TPE1" -> "Ärtist") else tags
      val out = Mpeg.id3Frames(
        Mpeg.wrapId3Frames(s, planted, major, enc), 1L)
      assert(out == planted.toMap, s"v2.$major enc $enc")
    }
    // tagless and padding-only tags are empty, not errors
    assert(Mpeg.id3Frames(s, 2L).isEmpty)
    assert(Mpeg.id3Frames(TestMp3.withId3(s), 3L).isEmpty)
    // the stream identity is invariant under REAL frames too
    assert(Mpeg.streamHash64(Mpeg.wrapId3Frames(s, tags), 4L) ==
      Mpeg.streamHash64(s, 4L))
    // structural damage is loud: whole-tag unsynchronisation flag
    val unsync = Mpeg.wrapId3Frames(s, tags)
    unsync(5) = 0x80.toByte
    intercept[IllegalArgumentException] { Mpeg.id3Frames(unsync, 5L) }
    // a frame size overrunning the tag is loud
    val evil = Mpeg.wrapId3Frames(s, Seq("TIT2" -> "x"), major = 3)
    evil(14) = 0x7f.toByte // v2.3 plain u32 frame size goes huge
    intercept[IllegalArgumentException] { Mpeg.id3Frames(evil, 6L) }
  }

  test("id3Frames: v2.2 three-byte frames surface under the v2.3 names") {
    val s = TestMp3.layerStub(3, 44100, 128, frames = 5)
    // both v2.2 encodings (0 latin-1, 1 UCS-2 with BOM) round-trip,
    // ids mapped onto the v2.3 vocabulary
    Seq(0, 1).foreach { enc =>
      val planted =
        if (enc == 0) Seq("TT2" -> "Caf\u00e9 R\u00e9cital", "TP1" -> "\u00c4rtist",
          "TAL" -> "Album 3", "TRK" -> "7")
        else Seq("TT2" -> "Caf\u00e9 \u591c\u66f2", "TP1" -> "\u00c4rtist",
          "TAL" -> "Album 3", "TRK" -> "7")
      val out = Mpeg.id3Frames(
        Mpeg.wrapId3Frames(s, planted, major = 2, encoding = enc), 1L)
      assert(out == Map("TIT2" -> planted(0)._2, "TPE1" -> planted(1)._2,
        "TALB" -> "Album 3", "TRCK" -> "7"), s"v2.2 enc $enc")
    }
    // the stream identity is invariant under a v2.2 tag too
    val tagged = Mpeg.wrapId3Frames(s, Seq("TT2" -> "t"), major = 2,
      encoding = 0)
    assert(Mpeg.streamHash64(tagged, 2L) == Mpeg.streamHash64(s, 2L))
    // v2.2 reserved encodings and frame overruns are loud
    intercept[IllegalArgumentException] {
      Mpeg.wrapId3Frames(s, Seq("TT2" -> "x"), major = 2, encoding = 3)
    }
    val evil = Mpeg.wrapId3Frames(s, Seq("TT2" -> "x"), major = 2,
      encoding = 0)
    evil(13) = 0x7f.toByte // 3-byte big-endian size goes huge
    intercept[IllegalArgumentException] { Mpeg.id3Frames(evil, 6L) }
    // an unparsed major (v2.5) still fails loudly
    val v25 = Mpeg.wrapId3Frames(s, Seq("TIT2" -> "x"), major = 3)
    v25(3) = 5
    intercept[IllegalArgumentException] { Mpeg.id3Frames(v25, 7L) }
  }

  test("id3v1Fields: the legacy-trailer catalog fallback") {
    val s = TestMp3.layerStub(3, 44100, 128, frames = 5)
    val v1 = Mpeg.wrapId3v1(s, "Title One", "The Artist", "An Album",
      year = "1999", track = 7)
    // the fallback surfaces v1 fields under the v2 frame-id vocabulary
    assert(Mpeg.id3Frames(v1, 1L) == Map("TIT2" -> "Title One",
      "TPE1" -> "The Artist", "TALB" -> "An Album", "TYER" -> "1999",
      "TRCK" -> "7"))
    // empty fields are absence, not blank rows
    assert(Mpeg.id3Frames(Mpeg.wrapId3v1(s, "Only Title", "", ""), 2L) ==
      Map("TIT2" -> "Only Title"))
    // v2 supersedes v1 when both are present
    val both = Mpeg.wrapId3v1(
      Mpeg.wrapId3Frames(s, Seq("TIT2" -> "v2 wins"), major = 4),
      "v1 loses", "x", "y")
    assert(Mpeg.id3Frames(both, 3L) == Map("TIT2" -> "v2 wins"))
    // the zeroed identity-gate trailer is all-empty fields
    assert(Mpeg.id3Frames(Mpeg.wrapId3(s, v2Bytes = 0, v1 = true)
      .drop(10), 4L).isEmpty)
    // the stream identity is invariant under a real v1 trailer
    assert(Mpeg.streamHash64(v1, 5L) == Mpeg.streamHash64(s, 5L))
    // a 30-byte field fits exactly; 31 overflows loudly
    Mpeg.wrapId3v1(s, "x" * 30, "", "")
    intercept[IllegalArgumentException] { Mpeg.wrapId3v1(s, "x" * 31, "", "") }
  }

  test("mpegInfo: ID3v2 prefix and ID3v1 tail are skipped, not desync") {
    val s = TestMp3.withId3(TestMp3.layerStub(3, 44100, 96, frames = 7))
    val i = Mpeg.mpegInfo(s)
    assert(i.frames == 7 && i.layer == 3 && i.bitrateKbps == 96)
  }

  test("mpegInfo: Layer II frame sizing walks exactly") {
    val s = TestMp3.layerStub(2, 48000, 192, frames = 9)
    val i = Mpeg.mpegInfo(s)
    assert(i.layer == 2 && i.frames == 9 && i.samples == 9L * 1152)
  }

  test("mpegInfo fails loudly on garbage and mid-stream desync") {
    intercept[IllegalArgumentException] {
      Mpeg.mpegInfo("not an mpeg stream at all".getBytes("US-ASCII"))
    }
    val good = TestMp3.layerStub(3, 44100, 128, frames = 4)
    val cut = java.util.Arrays.copyOf(good, good.length - 100)
    intercept[IllegalArgumentException] { Mpeg.mpegInfo(cut) }
  }

  // -- Layer I: planted-frame exactness (the lossless coded layer) --------

  test("parseLayer1Frame returns planted alloc/scf/codes bit-exactly") {
    val alloc = new Array[Int](32)
    val scf = new Array[Int](32)
    // 10 active subbands, varied widths
    val active = Seq(0, 1, 2, 5, 8, 13, 17, 21, 26, 31)
    active.zipWithIndex.foreach { case (sb, k) =>
      alloc(sb) = 2 + (k % 13) // nb = 3..15
      scf(sb) = (7 * k + 3) % 63
    }
    val codes = Array.tabulate(12, 32) { (s, sb) =>
      if (alloc(sb) == 0) 0
      else (s * 37 + sb * 11 + 5) % (1 << (alloc(sb) + 1))
    }
    val frame = TestMp3.layer1Planted(32000, alloc, scf, codes)
    val h = Mpeg.parseHeader(frame, 0, -1).get
    assert(h.layer == 1 && h.bitrateKbps == 448 && h.sampleRate == 32000)
    val f = Mpeg.parseLayer1Frame(frame, h, -1)
    assert(f.alloc(0).toSeq == alloc.toSeq)
    assert(f.scf(0).toSeq == scf.toSeq)
    for (s <- 0 until 12; sb <- 0 until 32)
      assert(f.codes(0)(sb)(s) == codes(s)(sb),
        s"code mismatch at granule $s subband $sb")
  }

  test("requantLayer1 matches the mid-rise formula, endpoints exact") {
    // nb = 2: codes 0..3 -> -1, -1/3, 1/3, 1 (x scalefactor)
    assert(Mpeg.requantLayer1(0, 1, 0) == -1.0 * Mpeg.ScaleFactors(0))
    assert(math.abs(Mpeg.requantLayer1(1, 1, 0) + Mpeg.ScaleFactors(0) / 3.0) < 1e-12)
    assert(Mpeg.requantLayer1(3, 1, 0) == 1.0 * Mpeg.ScaleFactors(0))
    // scalefactor table is the B.1 formula
    assert(Mpeg.ScaleFactors(0) == 2.0)
    assert(math.abs(Mpeg.ScaleFactors(3) - 1.0) < 1e-12)
    assert(math.abs(Mpeg.ScaleFactors(6) - 0.5) < 1e-12)
  }

  // -- Layer I: full decode round-trip ------------------------------------

  private def alignedMaxErr(in: Array[Int], out: Array[Int],
      channels: Int): Double = {
    // decode output is already delay-compensated; compare the interior
    // (skip residual edge warmup)
    val nIn = in.length / channels
    val nOut = out.length / channels
    var err = 0.0
    var s = 512
    while (s < math.min(nIn, nOut) - 512) {
      var c = 0
      while (c < channels) {
        val e = (out(s * channels + c) - in(s * channels + c)) / 32768.0
        err = math.max(err, math.abs(e))
        c += 1
      }
      s += 1
    }
    err
  }

  test("Layer I mono round-trip: sine within near-PR + quantizer bounds") {
    val x = sine(4096, 0.6, 37.3)
    val mp3 = TestMp3.layer1(32000, 1, x)
    val a = Mpeg.decodeLayer1(mp3)
    assert(a.sampleRate == 32000 && a.channels == 1)
    assert(a.samples.length == ((4096 + 383) / 384) * 384,
      "delay-compensated + flushed: exactly frames x 384 samples")
    val err = alignedMaxErr(x, a.samples, 1)
    assert(err < 0.003, s"round-trip error $err (near-PR bound 0.003)")
  }

  test("Layer I stereo round-trip, distinct channel content") {
    val l = sine(3000, 0.5, 41.0)
    val r = sine(3000, 0.3, 97.0)
    val inter = Array.tabulate(6000)(i => if (i % 2 == 0) l(i / 2) else r(i / 2))
    val a = Mpeg.decodeLayer1(TestMp3.layer1(32000, 2, inter))
    assert(a.channels == 2)
    val err = alignedMaxErr(inter, a.samples, 2)
    assert(err < 0.003, s"stereo round-trip error $err")
  }

  test("Layer I broadband round-trip stays bounded") {
    val x = Array.tabulate(4096) { i =>
      (32767 * (0.25 * StrictMath.sin(2 * math.Pi * i / 37.3) +
        0.2 * StrictMath.sin(2 * math.Pi * i / 5.13) +
        0.15 * StrictMath.sin(2 * math.Pi * i / 113.7))).toInt
    }
    val a = Mpeg.decodeLayer1(TestMp3.layer1(32000, 1, x))
    val err = alignedMaxErr(x, a.samples, 1)
    assert(err < 0.004, s"broadband round-trip error $err")
  }

  // -- layer II/III sample refusal + feature bridge -----------------------

  test("Layer III sample decode refuses with the documented reason") {
    val s = TestMp3.layerStub(3, 44100, 128, frames = 3)
    val e = intercept[IllegalArgumentException] { Mpeg.decodeSamples(s) }
    assert(e.getMessage.contains("Layer 3"))
  }

  test("decodeFeatures: Layer I gets waveform features, Layer III exact metadata") {
    import spark.implicits._
    val l1 = TestMp3.layer1(32000, 1, sine(2048, 0.5, 53.0))
    val l3 = TestMp3.layerStub(3, 44100, 128, frames = 50)
    val feats = Multimodal.decodeFeatures(
        Seq(Media(1L, "audio/mpeg", l1), Media(2L, "audio/mpeg", l3)).toDS())
      .collect().sortBy(_.media_id)
    val f1 = feats(0)
    assert(f1.width == 32000 && f1.height == 1)
    assert(f1.features(1) > 0.2f, "RMS of a 0.5-amplitude sine")
    val f3 = feats(1)
    assert(f3.width == 44100 && f3.height == 1)
    assert(math.abs(f3.features(3) - 50.0f * 1152 / 44100) < 1e-4,
      "Layer III duration is exact metadata")
    assert(f3.features(1) == 0.0f, "no waveform features without sample decode")
  }

  // -- fingerprint tier + warc e2e ----------------------------------------

  test("warc -> audio/mpeg -> fingerprint e2e: MP3 of a waveform pairs with its WAV") {
    import spark.implicits._
    // NON-STATIONARY tones over a deterministic broadband noise bed —
    // the fingerprint's bits are signs of temporal-DCT coefficients, so
    // a stationary signal (constant spectrogram) puts every coefficient
    // at zero and its sign is codec noise; real crawl audio varies, and
    // so must the gate signal. Noise keeps every bin above the codec's
    // −68 dB floor (a pure sine's silent bins would compare true zero
    // against quantization noise).
    var lcg = 12345L
    def noise(): Double = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      ((lcg >>> 40).toInt / 8388608.0) - 1.0
    }
    val pcm = Array.tabulate(8064) { i => // 21 whole Layer I frames
      val seg = i / 1008 // 8 segments: tone + envelope change per segment
      val period = 24.0 + 13.0 * (seg % 4)
      val env = 0.15 + 0.25 * StrictMath.sin(math.Pi * (i % 1008) / 1008.0)
      (32767 * (env * StrictMath.sin(2 * math.Pi * i / period) +
        0.3 * StrictMath.sin(2 * math.Pi * i / 64.0) * (if (seg < 4) 1 else 0) +
        0.1 * noise())).toInt
    }
    // nb = 13: all 32 subbands fit the frame budget (broadband content
    // must not force the encoder to drop bands); quant floor −78 dB
    val mp3 = TestMp3.layer1(32000, 1, pcm, nb = 13)
    val wav = TestWav(32000, 1, 16, pcm)
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_mp3").toString
    graft.io.Warc.writeWarcResponses(
      Seq(("http://a.test/clip.mp3", "audio/mpeg", mp3),
        ("http://a.test/clip.wav", "audio/wav", wav))
        .toDF("target_uri", "content_type", "payload"), dir)
    val media = graft.io.Warc.toMedia(graft.io.Warc.readWarc(spark, dir))
    val hashes = Multimodal.audioHashes(media)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val d = java.lang.Long.bitCount(hashes("audio/mpeg") ^ hashes("audio/wav"))
    assert(d <= 8,
      s"MP3 and WAV of the same waveform must pair as near-dups (hamming $d)")
  }
}
