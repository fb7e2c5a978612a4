package graft

import graft.operators.Brotli

/** RFC 7932 decoder against golden vectors produced by the REFERENCE
  * encoder (libbrotli 1.0.9, qualities 0–11, window bits 10–24, seven
  * input shapes: empty, single byte, dictionary-word-rich text,
  * repetitive text, LCG binary, multilingual UTF-8, text/binary
  * interleave) — plus the staging encoder's round-trips and the
  * fail-loud boundaries. */
class BrotliSpec extends SparkSpec {

  private def vector(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/brotli/vectors/$name")
    assert(in != null, s"missing vector $name")
    try in.readAllBytes() finally in.close()
  }

  test("golden vectors: every (input, quality, window) decodes bit-exact") {
    val qualities = Seq(0, 1, 5, 9, 11)
    val wins = Seq(10, 18, 22, 24)
    var n = 0
    for (kind <- 0 to 6) {
      val raw = vector(s"in$kind.raw")
      for (q <- qualities; wbits <- wins
           if wbits == 18 || q == 5 || q == 11) {
        val br = vector(s"in${kind}_q${q}_w$wbits.br")
        val out = Brotli.decompress(br)
        assert(java.util.Arrays.equals(out, raw),
          s"kind=$kind q=$q w=$wbits: ${out.length} vs ${raw.length}")
        n += 1
      }
    }
    assert(n == 7 * (5 + 2 * 3), s"vector matrix incomplete ($n)")
  }

  test("staging encoder round-trips, both meta-block paths") {
    val inputs = Seq[Array[Byte]](
      Array.emptyByteArray,
      "x".getBytes("UTF-8"),
      "The quick brown fox — зелёная трава, 中文.".getBytes("UTF-8"),
      Array.tabulate(70000)(i => (i * 31 + (i >> 7)).toByte), // > 1 nibble tier
      vector("in4.raw"))
    for (in <- inputs; unc <- Seq(false, true)) {
      val rt = Brotli.decompress(Brotli.compress(in, viaUncompressed = unc))
      assert(java.util.Arrays.equals(rt, in),
        s"len=${in.length} viaUncompressed=$unc")
    }
  }

  test("staging encoder output spans multiple meta-blocks past the chunk size") {
    val big = Array.tabulate((1 << 22) + 999)(i => (i * 7).toByte)
    for (unc <- Seq(false, true))
      assert(java.util.Arrays.equals(
        Brotli.decompress(Brotli.compress(big, viaUncompressed = unc)), big))
  }

  test("fail-loud: truncation, garbage, trailing bytes, bomb guard") {
    val ok = Brotli.compress("hello brotli world".getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      Brotli.decompress(java.util.Arrays.copyOfRange(ok, 0, ok.length - 2))
    }
    intercept[IllegalArgumentException] {
      Brotli.decompress(java.util.Arrays.copyOf(ok, ok.length + 3))
    }
    intercept[Exception] { Brotli.decompress(Array[Byte](0x6b, 0x01, 0x02)) }
    // reserved WBITS pattern (the large-window extension) is refused
    intercept[IllegalArgumentException] {
      // bits: 1, 000, 001 → reserved
      Brotli.decompress(Array[Byte](0x11, 0x00))
    }
    // bomb guard: a 64 KiB payload under a 1 KiB budget
    val big = Brotli.compress(new Array[Byte](1 << 16))
    intercept[java.io.IOException] { Brotli.decompress(big, maxOut = 1024) }
  }

  test("fail-loud: a truncated final byte is rejected even when the missing bits are zeros") {
    // construct the one truncation the bit reader's zero-padding used to
    // forgive: a stream whose FINAL byte is 0x00 but meaningful (the
    // trailing literals' all-zero code bits). Dropping it leaves peek()'s
    // virtual padding supplying identical bits, so the decode "succeeds"
    // — the overread flag must reject it at the final clean-end check.
    val candidate = (1 to 256).iterator.map { n =>
      new Array[Byte](n) -> Brotli.compress(new Array[Byte](n))
    }.find { case (_, br) => br.length > 1 && br.last == 0 }
    assert(candidate.nonEmpty, "no all-zero-final-byte stream found")
    val (raw, br) = candidate.get
    assert(java.util.Arrays.equals(Brotli.decompress(br), raw))
    intercept[IllegalArgumentException] {
      Brotli.decompress(java.util.Arrays.copyOfRange(br, 0, br.length - 1))
    }
    // and the blanket property on reference-encoder streams: any 1-byte
    // truncation throws, never silently succeeds (a vector whose final
    // byte the encoder emitted carries meaningful bits by construction)
    for (kind <- 0 to 6; q <- Seq(5, 11)) {
      val v = vector(s"in${kind}_q${q}_w18.br")
      if (v.length > 1)
        intercept[Exception] {
          Brotli.decompress(java.util.Arrays.copyOfRange(v, 0, v.length - 1))
        }
    }
  }

  test("warc e2e: Content-Encoding br reverses; .br archive members peel") {
    import spark.implicits._
    val html = "<p>brotli entity</p>".getBytes("UTF-8")
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_br").toString
    graft.io.Warc.writeWarcResponsesEncoded(
      Seq(("http://a.test/page", "text/html", "br", Brotli.compress(html)))
        .toDF("target_uri", "content_type", "content_encoding", "payload"), dir)
    val docs = graft.io.Warc.toDocumentsHtml(graft.io.Warc.readWarc(spark, dir))
      .select("url", "text").as[(String, String)].collect().toSet
    assert(docs == Set(("http://a.test/page", "brotli entity")))
    // a .txt.br tar member peels by suffix (brotli has no magic bytes)
    val tar = graft.operators.Tar.writeTar(Seq(
      "note.txt.br" -> Brotli.compress("member text".getBytes("UTF-8"))))
    val dir2 = java.nio.file.Files.createTempDirectory("graft_tar_br").toString
    graft.io.Warc.writeWarcResponses(
      Seq(("http://a.test/pack.tar", "application/x-tar", tar))
        .toDF("target_uri", "content_type", "payload"), dir2)
    val members = graft.io.Warc.toDocumentsArchive(
        graft.io.Warc.readWarc(spark, dir2))
      .filter(org.apache.spark.sql.functions.col("extract_ok"))
      .select("url", "text").as[(String, String)].collect().toSet
    assert(members == Set(("http://a.test/pack.tar#note.txt", "member text")))
    // and a whole .jsonl.br response routes through the codec lane
    val jl = "{\"text\":\"a\"}\n{\"text\":\"b\"}".getBytes("UTF-8")
    val dir3 = java.nio.file.Files.createTempDirectory("graft_br_jsonl").toString
    graft.io.Warc.writeWarcResponses(
      Seq(("http://a.test/dump.jsonl.br", "application/x-brotli",
        Brotli.compress(jl)))
        .toDF("target_uri", "content_type", "payload"), dir3)
    val viaCodec = graft.io.Warc.toDocumentsArchive(
        graft.io.Warc.readWarc(spark, dir3))
      .filter(org.apache.spark.sql.functions.col("extract_ok"))
      .select("url", "text").as[(String, String)].collect().toSet
    assert(viaCodec == Set(
      ("http://a.test/pack.tar#dump.jsonl#0", "a"),
      ("http://a.test/pack.tar#dump.jsonl#1", "b")).map {
        case (u, t) => (u.replace("pack.tar", "dump.jsonl.br"), t) })
  }

  test("dictionary machinery: q11 small text forces transformed words") {
    // in2 at q11/w10 compresses far below its raw size only via the
    // static dictionary (the window alone cannot explain it at 1 KiB)
    val raw = vector("in2.raw")
    val br = vector("in2_q11_w10.br")
    assert(br.length < raw.length / 2)
    assert(java.util.Arrays.equals(Brotli.decompress(br), raw))
  }
}
