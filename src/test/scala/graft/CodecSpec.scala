package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.operators.{Codec, Sniff, Tar}

/** The codec layer under the archive walk: gzip/xz/zstd/lz4
  * round-trips, magic sniffing, suffix stripping, the bomb guard, and
  * the warc e2e for tar-behind-codec and single members. */
class CodecSpec extends SparkSpec {

  private val codecs = Seq(Codec.Gzip, Codec.Xz, Codec.Zstd, Codec.Lz4)

  test("compress/decompress round-trips every codec; magics sniff") {
    val payloads = Seq(
      Array.emptyByteArray,
      "hello codec world".getBytes(UTF_8),
      Array.tabulate(70000)(i => (i * 31 + i / 7).toByte)) // > one buf
    for (mime <- codecs; p <- payloads) {
      val c = Codec.compress(p, mime)
      assert(Codec.sniffCodec(c).contains(mime), s"magic for $mime")
      assert(java.util.Arrays.equals(Codec.decompress(c, mime), p),
        s"round-trip for $mime (${p.length} bytes)")
      assert(java.util.Arrays.equals(Codec.decompressAuto(c), p),
        s"auto round-trip for $mime")
    }
    // Sniff.sniffMime agrees with the codec layer's own magics
    for (mime <- codecs) {
      val c = Codec.compress("x".getBytes(UTF_8), mime)
      assert(Sniff.sniffMime(c).contains(mime), s"Sniff for $mime")
    }
  }

  test("x-gzip alias decodes; unknown mime and corrupt streams throw") {
    val c = Codec.compress("alias".getBytes(UTF_8), Codec.Gzip)
    assert(new String(Codec.decompress(c, "application/x-gzip"), UTF_8) ==
      "alias")
    intercept[IllegalArgumentException] {
      Codec.decompress(c, "application/x-brotli")
    }
    intercept[Exception] { Codec.decompress(c.take(5), Codec.Gzip) }
    intercept[IllegalArgumentException] {
      Codec.decompressAuto("no magic here".getBytes(UTF_8))
    }
  }

  test("bomb guard: expansion past maxOut fails loud, within passes") {
    val big = new Array[Byte](300000) // zeros compress tightly
    for (mime <- codecs) {
      val c = Codec.compress(big, mime)
      val e = intercept[java.io.IOException] {
        Codec.decompress(c, mime, maxOut = 100000)
      }
      assert(e.getMessage.contains("bomb guard"))
      assert(Codec.decompress(c, mime, maxOut = 300000).length == 300000)
    }
  }

  test("stripSuffix peels exactly one codec suffix") {
    assert(Codec.stripSuffix("a.txt.xz") == "a.txt")
    assert(Codec.stripSuffix("a.txt.zst") == "a.txt")
    assert(Codec.stripSuffix("a.txt.zstd") == "a.txt")
    assert(Codec.stripSuffix("a.txt.lz4") == "a.txt")
    assert(Codec.stripSuffix("a.TAR.GZ") == "a.TAR")
    assert(Codec.stripSuffix("plain.txt") == "plain.txt")
  }

  test("warc e2e: .tar.zst walks as tar, single .txt.xz/.md.lz4 are entries") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_codec").toString
    graft.io.Warc.writeWarcResponses(
      Seq(
        ("http://a.test/dump.tar.zst", Codec.Zstd,
          Codec.compress(Tar.writeTar(Seq(
            "in.txt" -> "from the zstd tarball".getBytes(UTF_8))), Codec.Zstd)),
        ("http://a.test/note.txt.xz", Codec.Xz,
          Codec.compress("just xz".getBytes(UTF_8), Codec.Xz)),
        ("http://a.test/readme.md.lz4", Codec.Lz4,
          Codec.compress("plain lz4 note".getBytes(UTF_8), Codec.Lz4)))
        .toDF("target_uri", "content_type", "payload"), dir)
    val out = graft.io.Warc.toDocumentsArchive(
        graft.io.Warc.readWarc(spark, dir))
      .select("url", "text", "extract_ok")
      .as[(String, String, Boolean)].collect().toList
      .map(r => r._1.substring(r._1.indexOf('#') + 1) -> ((r._2, r._3))).toMap
    assert(out("in.txt") == (("from the zstd tarball", true)))
    assert(out("note.txt") == (("just xz", true)))
    assert(out("readme.md") == (("plain lz4 note", true)))
  }

  test("warc e2e: a corrupt codec payload degrades to one flagged row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_codbad").toString
    graft.io.Warc.writeWarcResponses(
      Seq(("http://a.test/bad.txt.zst", Codec.Zstd,
        Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte, 1, 2, 3)))
        .toDF("target_uri", "content_type", "payload"), dir)
    val out = graft.io.Warc.toDocumentsArchive(
        graft.io.Warc.readWarc(spark, dir))
      .select("url", "extract_ok").as[(String, Boolean)].collect().toList
    assert(out == List(("http://a.test/bad.txt.zst#", false)))
  }
}
