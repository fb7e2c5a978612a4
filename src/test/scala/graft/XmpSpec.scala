package graft

import graft.operators.{Exif, Multimodal, Xmp}

/** XMP packet extraction: both serialization forms, the li-container
  * join, both carriers through one catalog surface, fail-loud
  * framing. */
class XmpSpec extends SparkSpec {

  test("props: attributes, direct text, Alt/Seq containers, entities") {
    val packet = Xmp.writePacket(Seq(
      Xmp.Attr("xmp:CreatorTool", "Tool <1>"),
      Xmp.Items("dc:title", "Alt", Seq("A & B")),
      Xmp.Items("dc:creator", "Seq", Seq("ada", "grace")),
      Xmp.Text("dc:rights", "© 2026 \"Corp\"")))
    assert(Xmp.props(packet) == Vector(
      "xmp:CreatorTool" -> "Tool <1>",
      "dc:title" -> "A & B",
      "dc:creator" -> "ada; grace",
      "dc:rights" -> "© 2026 \"Corp\""))
    // namespace plumbing attributes never surface as props
    assert(!Xmp.props(packet).exists(_._1.startsWith("xmlns")))
    // an empty packet yields nothing; a packet with no Description too
    assert(Xmp.props(Xmp.writePacket(Nil)).isEmpty)
    assert(Xmp.props("<x:xmpmeta></x:xmpmeta>").isEmpty)
  }

  test("props: unmodeled nested structure skips, bad framing throws") {
    val nested = "<rdf:Description xmlns:a=\"u\">" +
      "<a:keep>v</a:keep>" +
      "<a:skip><rdf:Description/></a:skip>" + // struct, not a li container
      "</rdf:Description>"
    assert(Xmp.props(nested) == Vector("a:keep" -> "v"))
    intercept[IllegalArgumentException] {
      Xmp.props("<rdf:Description><dc:t>x</dc:t>") // no closer
    }
    intercept[IllegalArgumentException] {
      Xmp.props("<rdf:Description><dc:t><rdf:Alt><rdf:li>x" +
        "</rdf:Alt></dc:t></rdf:Description>") // li without closer
    }
  }

  test("imageXmp: one surface over the JPEG APP1 and PNG iTXt carriers") {
    import spark.implicits._
    val packet = Xmp.writePacket(Seq(
      Xmp.Items("dc:title", "Alt", Seq("T")),
      Xmp.Attr("cc:license", "https://creativecommons.org/licenses/by/4.0/")))
    val media = Seq(
      Multimodal.Media(1L, "image/jpeg", Xmp.writeXmpJpeg(packet)),
      Multimodal.Media(2L, "image/png",
        Exif.writeTextPng(Seq((2, Xmp.PngKeyword, packet)))),
      // an EXIF-bearing JPEG has no xap APP1: absence, not error
      Multimodal.Media(3L, "image/jpeg", Exif.writeJpegExif(
        Exif.writeExifBlock("C", "M", 1, "2026:01:01 00:00:00",
          100L, 100, 8L, 8L, "2026:01:01 00:00:00"))),
      // a PNG whose text chunks are NOT the xmp keyword contributes none
      Multimodal.Media(4L, "image/png",
        Exif.writeTextPng(Seq((0, "Comment", "plain"))))).toDS()
    val rows = Multimodal.imageXmp(media)
      .as[(Long, String, String, String)].collect().sortBy(r => (r._1, r._3))
    assert(rows.toList == List(
      (1L, "image/jpeg", "cc:license",
        "https://creativecommons.org/licenses/by/4.0/"),
      (1L, "image/jpeg", "dc:title", "T"),
      (2L, "image/png", "cc:license",
        "https://creativecommons.org/licenses/by/4.0/"),
      (2L, "image/png", "dc:title", "T")))
  }
}
