package graft

import graft.operators.Ogg

/** Ogg container walk: page framing + CRC verification, lacing packet
  * reassembly (255-continuation, zero lacing, cross-page spans),
  * Vorbis/Opus id headers, granule-derived duration, comment tags,
  * the tag/page-layout-invariant stream identity, and the fail-loud
  * boundaries — plus the feature/tag bridges. */
class OggSpec extends SparkSpec {

  test("vorbis: metadata round-trips the planted derivation") {
    val b = Ogg.writeOgg("vorbis", 2, 44100, 7)
    val info = Ogg.oggInfo(b, 1L)
    assert(info.codec == "vorbis" && info.channels == 2 &&
      info.sampleRate == 44100 && info.preSkip == 0)
    assert(info.nAudioPackets == 7 && info.lastGranule == 7L * 576)
    assert(info.nPages == 2 + 4) // 2 header pages + ceil(7/2)
    assert(math.abs(info.durationSec - 7.0 * 576 / 44100) < 1e-12)
  }

  test("opus: 48 kHz granule domain, pre-skip subtracted from duration") {
    val b = Ogg.writeOgg("opus", 1, 16000, 10)
    val info = Ogg.oggInfo(b, 2L)
    assert(info.codec == "opus" && info.channels == 1 &&
      info.sampleRate == 16000 && info.preSkip == Ogg.GenPreSkip)
    assert(info.lastGranule == Ogg.GenPreSkip + 10L * 960)
    assert(math.abs(info.durationSec - 10.0 * 960 / 48000) < 1e-12)
  }

  test("identity: tag- and page-layout-invariant, content-sensitive") {
    val h = Ogg.streamHash64(Ogg.writeOgg("vorbis", 2, 44100, 9, seed = 5), 3L)
    // different comments, same audio -> same hash
    assert(Ogg.streamHash64(Ogg.writeOgg("vorbis", 2, 44100, 9, seed = 5,
      comments = Seq("ARTIST" -> "someone")), 3L) == h)
    // different page layout (1 packet/page), same audio -> same hash
    assert(Ogg.streamHash64(Ogg.writeOgg("vorbis", 2, 44100, 9, seed = 5,
      packetsPerPage = 1), 3L) == h)
    // different audio -> different hash
    assert(Ogg.streamHash64(Ogg.writeOgg("vorbis", 2, 44100, 9, seed = 6), 3L) != h)
    // one fewer packet -> different hash
    assert(Ogg.streamHash64(Ogg.writeOgg("vorbis", 2, 44100, 8, seed = 5), 3L) != h)
  }

  test("comment tags parse for both codecs; field names uppercase") {
    val cs = Seq("Title" -> "a song", "artist" -> "x & y")
    assert(Ogg.commentTags(Ogg.writeOgg("vorbis", 1, 48000, 3,
      comments = cs), 4L) == Map("TITLE" -> "a song", "ARTIST" -> "x & y"))
    assert(Ogg.commentTags(Ogg.writeOgg("opus", 1, 48000, 3,
      comments = cs), 5L) == Map("TITLE" -> "a song", "ARTIST" -> "x & y"))
  }

  test("fail-loud: CRC damage, truncation, garbage, sequence gap") {
    val good = Ogg.writeOgg("vorbis", 1, 44100, 5)
    // flip one audio byte without fixing the CRC: the walker must object
    val damaged = good.clone()
    damaged(damaged.length - 3) = (damaged(damaged.length - 3) ^ 1).toByte
    val e = intercept[IllegalArgumentException] {
      Ogg.oggInfo(damaged, 6L)
    }
    assert(e.getMessage.contains("CRC"))
    intercept[IllegalArgumentException] { // truncated: no EOS page
      Ogg.oggInfo(good.take(good.length / 2), 7L)
    }
    intercept[IllegalArgumentException] { // not Ogg at all
      Ogg.oggInfo(Array[Byte](1, 2, 3, 4), 8L)
    }
    // splice out a middle page: CRCs stay valid, the sequence gap trips
    val pages = {
      val idx = collection.mutable.ArrayBuffer[Int]()
      var i = 0
      while (i + 4 <= good.length) {
        if (good(i) == 'O' && good(i + 1) == 'g' && good(i + 2) == 'g' &&
          good(i + 3) == 'S') idx += i
        i += 1
      }
      idx.toVector
    }
    assert(pages.length >= 4)
    val spliced = good.take(pages(2)) ++ good.drop(pages(3))
    val e2 = intercept[IllegalArgumentException] {
      Ogg.oggInfo(spliced, 9L)
    }
    assert(e2.getMessage.contains("sequence gap"))
  }

  test("packets spanning 255-lacing and page boundaries reassemble") {
    // packet lengths 40 + (i*37 % 300): several exceed 255 bytes, so
    // the lacing table carries 255-continuations; equality of the
    // repaged hash (1/page vs 3/page) proves reassembly is framing-true
    val a = Ogg.streamHash64(Ogg.writeOgg("opus", 2, 48000, 12, packetsPerPage = 3), 10L)
    val b = Ogg.streamHash64(Ogg.writeOgg("opus", 2, 48000, 12, packetsPerPage = 1), 10L)
    assert(a == b)
  }

  test("feature and tag bridges: metadata tier + catalog rows") {
    import spark.implicits._
    val media = Seq(
      graft.operators.Multimodal.Media(1L, "audio/ogg",
        Ogg.writeOgg("vorbis", 2, 44100, 6, comments = Seq("TITLE" -> "t1"))),
      graft.operators.Multimodal.Media(2L, "audio/opus",
        Ogg.writeOgg("opus", 1, 48000, 4, comments = Seq("ALBUM" -> "t2"))))
      .toDS()
    val feats = graft.operators.Multimodal.decodeFeatures(media)
      .collect().sortBy(_.media_id)
    assert(feats(0).width == 44100 && feats(0).height == 2)
    assert(math.abs(feats(0).features(3) - 6.0f * 576 / 44100) < 1e-6)
    assert(feats(1).width == 48000 && feats(1).height == 1)
    val tags = graft.operators.Multimodal.mediaTags(media)
      .select("media_id", "tag", "value")
      .as[(Long, String, String)].collect().toSet
    assert(tags == Set((1L, "TITLE", "t1"), (2L, "ALBUM", "t2")))
  }
}
