package graft

import graft.operators.{Mp4, Multimodal}
import graft.operators.Mp4.Mp4TrackSpec

/** ISO-BMFF box-tree walk: v0/v1 time-field offsets, the 64-bit
  * largesize header form, sample-entry layouts, unknown-box skipping,
  * and the fail-loud boundaries (truncation, overruns, missing boxes).
  * Plus dispatcher routing and the warc→mp4 e2e. */
class Mp4Spec extends SparkSpec {

  private def twoTrack(v: Int): Array[Byte] =
    Mp4.writeMp4("isom", timescale = 1000L, duration = 7500L,
      tracks = Seq(
        Mp4TrackSpec(1L, "vide", "avc1", width = 640, height = 360,
          timescale = 12288L, duration = 90L * 512, sampleCount = 90,
          version = v),
        Mp4TrackSpec(2L, "soun", "mp4a", timescale = 48000L,
          duration = 120L * 1024, sampleCount = 120, sampleRate = 48000,
          channels = 2, version = v)),
      version = v)

  test("mp4Info: v0 and v1 time fields walk to identical metadata") {
    Seq(0, 1).foreach { v =>
      val info = Mp4.mp4Info(twoTrack(v), v.toLong)
      assert(info.majorBrand == "isom")
      assert(info.timescale == 1000L && info.duration == 7500L)
      assert(math.abs(info.durationSec - 7.5) < 1e-12)
      assert(info.tracks.length == 2)
      val vid = info.tracks(0)
      assert(vid.trackId == 1L && vid.handler == "vide" && vid.codec == "avc1")
      assert(vid.width == 640 && vid.height == 360)
      assert(vid.timescale == 12288L && vid.sampleCount == 90L)
      assert(math.abs(vid.durationSec - 90.0 * 512 / 12288) < 1e-12)
      assert(vid.sampleRate == 0 && vid.channels == 0)
      val aud = info.tracks(1)
      assert(aud.trackId == 2L && aud.handler == "soun" && aud.codec == "mp4a")
      assert(aud.sampleRate == 48000 && aud.channels == 2)
      assert(aud.width == 0 && aud.height == 0 && aud.sampleCount == 120L)
    }
  }

  test("mp4Info: largesize moov walks identically to the 32-bit form") {
    val plain = Mp4.mp4Info(Mp4.writeMp4("mp42", 600L, 1234L,
      Seq(Mp4TrackSpec(1L, "vide", "hvc1", width = 320, height = 240,
        timescale = 600L, duration = 600L, sampleCount = 24))), 1L)
    val large = Mp4.mp4Info(Mp4.writeMp4("mp42", 600L, 1234L,
      Seq(Mp4TrackSpec(1L, "vide", "hvc1", width = 320, height = 240,
        timescale = 600L, duration = 600L, sampleCount = 24)),
      largesizeMoov = true), 2L)
    assert(plain == large.copy(), "largesize is a header form, not content")
    assert(plain.majorBrand == "mp42" && plain.tracks.head.codec == "hvc1")
  }

  test("mp4Info: unknown boxes are skipped by size, not parsed") {
    val base = twoTrack(0)
    // splice a 'free' box (12 bytes) between ftyp and moov by hand
    val ftypEnd = {
      val sz = ((base(0) & 0xff) << 24) | ((base(1) & 0xff) << 16) |
        ((base(2) & 0xff) << 8) | (base(3) & 0xff)
      sz
    }
    val free = Array[Byte](0, 0, 0, 12, 'f', 'r', 'e', 'e', 1, 2, 3, 4)
    val spliced = base.take(ftypEnd) ++ free ++ base.drop(ftypEnd)
    val info = Mp4.mp4Info(spliced, 3L)
    assert(info.tracks.length == 2 && info.timescale == 1000L)
  }

  test("mp4Info fails loudly on garbage, truncation, and overruns") {
    intercept[IllegalArgumentException] {
      Mp4.mp4Info("not an mp4 container".getBytes("US-ASCII"), 7L)
    }
    val good = twoTrack(0)
    // truncated mid-moov
    intercept[IllegalArgumentException] {
      Mp4.mp4Info(good.take(good.length / 2), 8L)
    }
    // corrupt a trak size to overrun its parent
    val evil = good.clone()
    val trakAt = {
      val idx = indexOfSlice(evil, "trak".getBytes("US-ASCII"))
      idx - 4
    }
    evil(trakAt) = 0x7f.toByte // huge size
    val e = intercept[IllegalArgumentException] { Mp4.mp4Info(evil, 9L) }
    assert(e.getMessage.contains("overruns"))
    // no moov at all: ftyp + mdat only
    val ftyp = good.take(
      ((good(0) & 0xff) << 24) | ((good(1) & 0xff) << 16) |
        ((good(2) & 0xff) << 8) | (good(3) & 0xff))
    val mdat = Array[Byte](0, 0, 0, 9, 'm', 'd', 'a', 't', 0)
    val e2 = intercept[IllegalArgumentException] {
      Mp4.mp4Info(ftyp ++ mdat, 10L)
    }
    assert(e2.getMessage.contains("moov"))
  }

  private def indexOfSlice(b: Array[Byte], pat: Array[Byte]): Int =
    b.indexOfSlice(pat.toSeq)

  test("ilstTags: iTunes item list round-trips; absence is empty, damage loud") {
    val track = Mp4TrackSpec(1L, "vide", "avc1", width = 320, height = 240,
      timescale = 600L, duration = 600L, sampleCount = 24)
    val tags = Seq("©nam" -> "Clip — 夜", "©ART" -> "Ärtist", "©alb" -> "Album")
    val tagged = Mp4.writeMp4("isom", 1000L, 5000L, Seq(track), tags = tags)
    assert(Mp4.ilstTags(tagged, 1L) == tags.toMap)
    // mp4Info is undisturbed by the udta subtree
    assert(Mp4.mp4Info(tagged, 1L).tracks.head.codec == "avc1")
    // untagged container: empty map, not an error
    assert(Mp4.ilstTags(
      Mp4.writeMp4("isom", 1000L, 5000L, Seq(track)), 2L).isEmpty)
    // identity is invariant under tagging (udta is metadata)
    assert(Mp4.contentHash64(tagged, 3L) == Mp4.contentHash64(
      Mp4.writeMp4("isom", 1000L, 5000L, Seq(track)), 3L))
    // a data box too short for its header inside a PRESENT ilst is loud
    val idx = indexOfSlice(tagged, "data".getBytes("ISO-8859-1")) - 4
    val evil = tagged.clone()
    evil(idx + 3) = 9 // data box size 9 < 8-byte value header + 8 box hdr
    intercept[IllegalArgumentException] { Mp4.ilstTags(evil, 4L) }
  }

  test("contentHash64: metadata-invariant, content-sensitive, fail-loud") {
    val mdat = Array.tabulate[Byte](80)(j => ((j * 37 + 5) & 0xff).toByte)
    val track = Mp4TrackSpec(1L, "vide", "avc1", width = 320, height = 240,
      timescale = 600L, duration = 600L, sampleCount = 24)
    val a = Mp4.writeMp4("isom", 1000L, 5000L, Seq(track), mdatBytes = mdat)
    // metadata edits: brand, v1 time fields, largesize moov — same media
    val edited = Mp4.writeMp4("mp42", 1000L, 5000L,
      Seq(track.copy(version = 1)), version = 1, largesizeMoov = true,
      mdatBytes = mdat)
    assert(Mp4.contentHash64(a, 1L) == Mp4.contentHash64(edited, 2L),
      "an edited-metadata copy must hash identically")
    // one flipped media byte moves the hash
    val changed = mdat.clone(); changed(7) = (changed(7) ^ 1).toByte
    assert(Mp4.contentHash64(a, 1L) != Mp4.contentHash64(
      Mp4.writeMp4("isom", 1000L, 5000L, Seq(track), mdatBytes = changed), 3L))
    // no mdat → no media data → loud
    val ftypOnly = a.take(
      ((a(0) & 0xff) << 24) | ((a(1) & 0xff) << 16) |
        ((a(2) & 0xff) << 8) | (a(3) & 0xff))
    val e = intercept[IllegalArgumentException] {
      Mp4.contentHash64(ftypOnly, 4L)
    }
    assert(e.getMessage.contains("mdat"))
    intercept[IllegalArgumentException] {
      Mp4.contentHash64("junk bytes, no box tree".getBytes("US-ASCII"), 5L)
    }
  }

  test("decodeFeatures routes video/mp4 to the box walk (metadata tier)") {
    import spark.implicits._
    val m = Multimodal.Media(11L, "video/mp4", twoTrack(1))
    val f = Multimodal.decodeFeatures(Seq(m).toDS()).collect().head
    assert(f.kind == "video/mp4" && f.width == 640 && f.height == 360)
    assert(math.abs(f.features(3) - 7.5f) < 1e-6)
    assert(f.n_bytes == m.bytes.length)
    // audio-only container: rate/channels ride the width/height slots
    // (the decodeMpegFeatures convention)
    val m4a = Mp4.writeMp4("M4A ", 44100L, 441000L,
      Seq(Mp4TrackSpec(1L, "soun", "mp4a", timescale = 44100L,
        duration = 441000L, sampleCount = 430, sampleRate = 44100,
        channels = 1)))
    val fa = Multimodal.decodeFeatures(
      Seq(Multimodal.Media(12L, "audio/mp4", m4a)).toDS()).collect().head
    assert(fa.width == 44100 && fa.height == 1)
    assert(math.abs(fa.features(3) - 10.0f) < 1e-6)
  }

  test("warc -> mp4 e2e: crawled video lands in the media catalog") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_mp4").toString
    graft.io.Warc.writeWarcResponses(
      Seq(("http://a.test/clip.mp4", "video/mp4", twoTrack(0)),
        ("http://a.test/clip2.mp4", "video/MP4; codecs=avc1", twoTrack(1)))
        .toDF("target_uri", "content_type", "payload"), dir)
    val feats = Multimodal.decodeFeatures(
        graft.io.Warc.toMedia(graft.io.Warc.readWarc(spark, dir)))
      .collect()
    assert(feats.length == 2, "both responses must route through the walk")
    feats.foreach { f =>
      assert(f.kind == "video/mp4", "mime params/case must normalize away")
      assert(f.width == 640 && f.height == 360)
      assert(math.abs(f.features(3) - 7.5f) < 1e-6)
    }
  }
}
