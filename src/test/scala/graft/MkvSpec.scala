package graft

import graft.operators.Mkv
import graft.operators.Mkv.MkvTrackSpec

/** Matroska/WebM EBML walk: VINT id/size framing, DocType gate, Info
  * (scale defaulting, duration), per-track metadata, SimpleTag pairs,
  * cluster counting, the metadata-invariant content identity, and the
  * fail-loud boundaries — plus the feature/tag bridges. */
class MkvSpec extends SparkSpec {

  private val av = Seq(
    MkvTrackSpec(1L, 1, "V_VP9", width = 640, height = 360),
    MkvTrackSpec(2L, 2, "A_OPUS", channels = 2, sampleRate = 48000.0))

  test("metadata round-trips the planted derivation") {
    val b = Mkv.writeMkv("webm", 1000000L, 7500.0, av, nClusters = 5)
    val info = Mkv.mkvInfo(b, 1L)
    assert(info.docType == "webm" && info.timestampScale == 1000000L)
    assert(math.abs(info.durationSec - 7.5) < 1e-12) // 7500 ms
    assert(info.nClusters == 5)
    assert(info.tracks.length == 2)
    val v = info.tracks.find(_.trackType == 1).get
    assert(v.codecId == "V_VP9" && v.width == 640 && v.height == 360)
    val a = info.tracks.find(_.trackType == 2).get
    assert(a.codecId == "A_OPUS" && a.channels == 2 && a.sampleRate == 48000.0)
  }

  test("non-default timestamp scale changes the duration arithmetic") {
    val b = Mkv.writeMkv("matroska", 40000L, 250000.0, av, nClusters = 2)
    val info = Mkv.mkvInfo(b, 2L)
    // 250000 units x 40000 ns = 10 s
    assert(math.abs(info.durationSec - 10.0) < 1e-9)
  }

  test("identity: metadata-invariant, content-sensitive") {
    val h = Mkv.contentHash64(
      Mkv.writeMkv("webm", 1000000L, 5000.0, av, 4, seed = 3), 3L)
    // retitled + retagged + other DocType, same clusters -> same hash
    assert(Mkv.contentHash64(Mkv.writeMkv("matroska", 1000000L, 5000.0, av, 4,
      seed = 3, title = "renamed",
      tags = Seq("ARTIST" -> "someone")), 3L) == h)
    // different cluster bytes -> different hash
    assert(Mkv.contentHash64(
      Mkv.writeMkv("webm", 1000000L, 5000.0, av, 4, seed = 4), 3L) != h)
    // one fewer cluster -> different hash
    assert(Mkv.contentHash64(
      Mkv.writeMkv("webm", 1000000L, 5000.0, av, 3, seed = 3), 3L) != h)
  }

  test("SimpleTag pairs parse; absent Tags is an empty map") {
    val tags = Seq("TITLE" -> "a film", "DIRECTOR" -> "x & y")
    assert(Mkv.mkvTags(Mkv.writeMkv("webm", 1000000L, 1000.0, av, 1,
      tags = tags), 4L) == tags.toMap)
    assert(Mkv.mkvTags(Mkv.writeMkv("webm", 1000000L, 1000.0, av, 1), 5L)
      == Map.empty)
  }

  test("fail-loud: not EBML, wrong DocType, truncation, bad framing") {
    intercept[IllegalArgumentException] {
      Mkv.mkvInfo(Array[Byte](1, 2, 3, 4), 6L)
    }
    // a valid EBML header whose DocType is foreign
    val foreign = Mkv.writeMkv("webm", 1000000L, 1000.0, av, 1)
    // patch the DocType string "webm" -> "webx" (first occurrence)
    val idx = {
      var i = 0
      var at = -1
      while (at < 0 && i + 4 <= foreign.length) {
        if (foreign(i) == 'w' && foreign(i + 1) == 'e' &&
          foreign(i + 2) == 'b' && foreign(i + 3) == 'm') at = i
        i += 1
      }
      at
    }
    assert(idx > 0)
    val patched = foreign.clone()
    patched(idx + 3) = 'x'
    val e = intercept[IllegalArgumentException] {
      Mkv.mkvInfo(patched, 7L)
    }
    assert(e.getMessage.contains("DocType"))
    val good = Mkv.writeMkv("webm", 1000000L, 1000.0, av, 3)
    intercept[IllegalArgumentException] {
      Mkv.mkvInfo(good.take(good.length - 7), 8L)
    }
  }

  test("feature and tag bridges: video size, audio fallback, catalog rows") {
    import spark.implicits._
    val audioOnly = Seq(MkvTrackSpec(1L, 2, "A_VORBIS", channels = 1,
      sampleRate = 44100.0))
    val media = Seq(
      graft.operators.Multimodal.Media(1L, "video/webm",
        Mkv.writeMkv("webm", 1000000L, 2000.0, av, 2,
          tags = Seq("TITLE" -> "t1"))),
      graft.operators.Multimodal.Media(2L, "audio/webm",
        Mkv.writeMkv("webm", 1000000L, 3000.0, audioOnly, 2)))
      .toDS()
    val feats = graft.operators.Multimodal.decodeFeatures(media)
      .collect().sortBy(_.media_id)
    assert(feats(0).width == 640 && feats(0).height == 360)
    assert(math.abs(feats(0).features(3) - 2.0f) < 1e-6)
    assert(feats(1).width == 44100 && feats(1).height == 1)
    val tags = graft.operators.Multimodal.mediaTags(media)
      .select("media_id", "tag", "value")
      .as[(Long, String, String)].collect().toSet
    assert(tags == Set((1L, "TITLE", "t1")))
  }
}
