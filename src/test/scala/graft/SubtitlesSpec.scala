package graft

import graft.operators.Subtitles

/** Subtitle extraction: SRT and WebVTT cue framing, identifier lines,
  * NOTE/STYLE block skipping, tag stripping, entity decode, duration
  * derivation, and the fail-loud boundaries — plus the warc bridge. */
class SubtitlesSpec extends SparkSpec {

  test("srt: writeSrt/extractSrt round-trips cue text and derives duration") {
    val doc = Subtitles.extractSrt(
      Subtitles.writeSrt(Seq("first line", "second line", "third")), 1L)
    assert(doc.text == "first line\nsecond line\nthird")
    assert(doc.nCues == 3)
    assert(math.abs(doc.durationSec - 6.0) < 1e-9) // 3 cues x 2 s
  }

  test("vtt: signature, NOTE skip, dot-millisecond timing") {
    val doc = Subtitles.extractVtt(
      Subtitles.writeVtt(Seq("hello there", "again")), 2L)
    assert(doc.text == "hello there\nagain")
    assert(doc.nCues == 2 && math.abs(doc.durationSec - 4.0) < 1e-9)
  }

  test("tags strip, entities decode, multi-line cues, cue ids") {
    val vtt =
      "WEBVTT\n\nSTYLE\n::cue { color: red }\n\nintro-cue\n" +
        "00:00:01.000 --> 00:00:04.500\n" +
        "<v Speaker>Hello &amp; welcome</v>\nto the <i>show</i> &lt;live&gt;\n\n" +
        "NOTE a comment\nstill the comment\n\n" +
        "00:01:00.000 --> 00:01:02.250\n5 < 6 stays literal\n"
    val doc = Subtitles.extractVtt(vtt.getBytes("UTF-8"), 3L)
    assert(doc.text ==
      "Hello & welcome\nto the show <live>\n5 < 6 stays literal")
    assert(doc.nCues == 2)
    assert(math.abs(doc.durationSec - 62.25) < 1e-9)
  }

  test("fail-loud: missing signature, malformed timing, no cues, bad order") {
    intercept[IllegalArgumentException] { // SRT bytes through the VTT door
      Subtitles.extractVtt(Subtitles.writeSrt(Seq("x")), 4L)
    }
    val e = intercept[IllegalArgumentException] {
      Subtitles.extractSrt("1\n00:00:xx,000 --> 00:00:02,000\nhi\n".getBytes("UTF-8"), 5L)
    }
    assert(e.getMessage.contains("timing"))
    intercept[IllegalArgumentException] { // an empty file has no cues
      Subtitles.extractVtt("WEBVTT\n\n".getBytes("UTF-8"), 6L)
    }
    val e2 = intercept[IllegalArgumentException] {
      Subtitles.extractSrt(
        "1\n00:00:05,000 --> 00:00:02,000\nhi\n".getBytes("UTF-8"), 7L)
    }
    assert(e2.getMessage.contains("ends before"))
  }

  test("warc -> subtitles e2e: both MIMEs land in the corpus, flagged tolerance") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_subs").toString
    graft.io.Warc.writeWarcResponses(
      Seq(
        ("http://a.test/t.vtt", "text/vtt",
          Subtitles.writeVtt(Seq("a transcript", "line two"))),
        ("http://a.test/t.srt", "application/x-subrip",
          Subtitles.writeSrt(Seq("srt text"))),
        ("http://a.test/bad.vtt", "text/vtt", Array[Byte](7, 7, 7)))
        .toDF("target_uri", "content_type", "payload"), dir)
    val recs = graft.io.Warc.readWarc(spark, dir)
    val out = graft.io.Warc.toDocumentsSubtitles(recs)
      .select("url", "text", "extract_ok")
      .as[(String, String, Boolean)].collect().sortBy(_._1)
    assert(out.length == 3)
    assert(out(0)._1.endsWith("bad.vtt") && !out(0)._3 && out(0)._2 == null)
    assert(out(1)._2 == "srt text" && out(1)._3)
    assert(out(2)._2 == "a transcript\nline two" && out(2)._3)
    val all = graft.io.Warc.toDocuments(recs)
      .select("url", "text").as[(String, String)].collect().toMap
    assert(all("http://a.test/t.vtt") == "a transcript\nline two")
    assert(!all.contains("http://a.test/bad.vtt"))
  }
}
