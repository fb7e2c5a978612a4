package graft

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import graft.operators.Eml

/** Mail extraction: header unfolding, RFC 2047 encoded-words (B and Q,
  * adjacency elision), the MIME tree walk (boundaries, nesting,
  * message/rfc822 recursion, attachment skip), quoted-printable and
  * base64 transfer decodings, mbox framing with mboxrd stuffing, the
  * fail-loud boundaries — plus the warc bridges. */
class EmlSpec extends SparkSpec {

  private def msg(s: String): Eml.EmlMessage =
    Eml.parseEml(s.getBytes(ISO_8859_1), 1L)

  test("writeEml/parseEml round-trips every MIME shape") {
    val text = "first line\nsecond line\nthird"
    for (v <- 0 to 3) {
      val m = Eml.parseEml(Eml.writeEml(v, "Subject X", "a@x.test",
        "b@x.test", "Thu, 1 Jan 2026 00:00:00 +0000", text), v.toLong)
      assert(m.subject == "Subject X", s"variant $v")
      assert(m.from == "a@x.test" && m.to == "b@x.test")
      if (v == 3) { assert(m.text == null)
        assert(m.html == text.split("\n").map(l => s"<p>$l</p>").mkString)
      } else assert(m.text == text, s"variant $v")
    }
  }

  test("RFC 2047: B and Q words, unicode, underscore-space, adjacency") {
    val subj = "Résumé ✉ naïve"
    for (v <- 0 to 1) {
      val m = Eml.parseEml(Eml.writeEml(v, subj, "a@x", "b@x", "d", "t"))
      assert(m.subject == subj, s"variant $v")
    }
    // whitespace between two encoded-words is elided; around a plain
    // token it is preserved
    assert(Eml.decodeWords("=?UTF-8?Q?a_b?= =?UTF-8?Q?c?=") == "a bc")
    assert(Eml.decodeWords("x =?UTF-8?B?eQ==?= z") == "x y z")
    // latin-1 charset in a Q word
    assert(Eml.decodeWords("=?ISO-8859-1?Q?caf=E9?=") == "café")
  }

  test("headers unfold across continuation lines") {
    val m = msg("Subject: =?UTF-8?Q?long?=\n =?UTF-8?Q?_subject?=\n" +
      "From: a@x\nTo: b@x\nDate: d\n\nbody")
    assert(m.subject == "long subject")
    assert(m.text == "body")
  }

  test("quoted-printable: escapes, soft breaks, transport padding") {
    val body = "Content-Type: text/plain; charset=utf-8\n" +
      "Content-Transfer-Encoding: quoted-printable\n\n" +
      "caf=C3=A9 =\njoined\nhard break   \nend=20"
    val m = msg("Subject: s\n" + body)
    assert(m.text == "café joined\nhard break\nend ")
    // qpEncode survives its own decode for hostile inputs
    val hostile = "a=b\nline with trailing space \n=?fake?=\n\ttab lead"
    assert(new String(Eml.qpDecode(Eml.qpEncode(hostile), 1L), UTF_8) == hostile)
    // malformed hex fails loudly
    intercept[IllegalArgumentException] {
      msg("Subject: s\nContent-Transfer-Encoding: quoted-printable\n\nbad =ZZ x")
    }
  }

  test("base64 bodies decode; malformed base64 fails loudly") {
    val m = msg("Content-Transfer-Encoding: base64\n" +
      "Content-Type: text/plain; charset=utf-8\n\n" +
      java.util.Base64.getMimeEncoder(16, Array('\n'.toByte))
        .encodeToString("wrapped payload text".getBytes(UTF_8)))
    assert(m.text == "wrapped payload text")
    intercept[IllegalArgumentException] {
      msg("Content-Transfer-Encoding: base64\n\n!!not base64!!")
    }
  }

  test("multipart: attachment text is skipped, missing close fails loudly") {
    // a text/plain part marked attachment contributes nothing
    val b = "bb"
    val m = msg(s"""Content-Type: multipart/mixed; boundary="$b"""" +
      s"\n\n--$b\nContent-Type: text/plain\n\nkept\n--$b\n" +
      "Content-Type: text/plain\nContent-Disposition: attachment; " +
      s"filename=notes.txt\n\nskipped\n--$b--\n")
    assert(m.text == "kept")
    intercept[IllegalArgumentException] {
      msg(s"""Content-Type: multipart/mixed; boundary="$b"""" +
        s"\n\n--$b\nContent-Type: text/plain\n\nkept\n")
    }
    intercept[IllegalArgumentException] { // boundary parameter required
      msg("Content-Type: multipart/mixed\n\nx")
    }
  }

  test("message/rfc822 recursion surfaces the embedded text") {
    val m = msg("Subject: outer\nContent-Type: message/rfc822\n\n" +
      "Subject: inner\nContent-Type: text/plain\n\ninner body")
    assert(m.subject == "outer" && m.text == "inner body")
  }

  test("latin-1 body bytes decode by the charset parameter") {
    val m = Eml.parseEml(("Subject: s\n" +
      "Content-Type: text/plain; charset=iso-8859-1\n\ncafé")
      .getBytes(ISO_8859_1))
    assert(m.text == "café")
    intercept[IllegalArgumentException] { // unknown charset fails loudly
      msg("Content-Type: text/plain; charset=utf-7\n\nx")
    }
    intercept[IllegalArgumentException] { // unknown transfer encoding too
      msg("Content-Transfer-Encoding: uuencode\n\nx")
    }
  }

  test("mbox framing: split, stuffing round-trip, tail separator shed") {
    val m1 = Eml.writeEml(0, "one", "a@x", "b@x", "d",
      "body one\nFrom here it looks like a separator\n>From too")
    val m2 = Eml.writeEml(1, "two", "a@x", "b@x", "d", "body two")
    val box = Eml.writeMbox(Seq(m1, m2))
    val back = Eml.mboxMessages(box, 1L)
    assert(back.length == 2)
    val p1 = Eml.parseEml(back(0))
    assert(p1.subject == "one" &&
      p1.text == "body one\nFrom here it looks like a separator\n>From too")
    assert(Eml.parseEml(back(1)).text == "body two")
    intercept[IllegalArgumentException] { // not an mbox
      Eml.mboxMessages("To: b@x\n\nhello".getBytes(ISO_8859_1), 1L)
    }
  }

  test("warc -> eml/mbox e2e: messages land in the corpus, flagged tolerance") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_eml").toString
    val good = Eml.writeEml(1, "Hello ✉", "a@x.test", "b@x.test", "d",
      "mail body\nsecond line")
    val htmlOnly = Eml.writeEml(3, "Markup", "a@x.test", "b@x.test", "d",
      "rich line")
    val box = Eml.writeMbox(Seq(
      Eml.writeEml(0, "m0", "a@x", "b@x", "d", "first message"),
      Eml.writeEml(2, "m1", "a@x", "b@x", "d", "second message")))
    graft.io.Warc.writeWarcResponses(
      Seq(
        ("http://m.test/good.eml", "message/rfc822", good),
        ("http://m.test/rich.eml", "message/rfc822", htmlOnly),
        ("http://m.test/bad.eml", "message/rfc822", Array[Byte](7, 7, 7)),
        ("http://m.test/inbox.mbox", "application/mbox", box),
        ("http://m.test/bad.mbox", "application/mbox", Array[Byte](9)))
        .toDF("target_uri", "content_type", "payload"), dir)
    val recs = graft.io.Warc.readWarc(spark, dir)
    val eml = graft.io.Warc.toDocumentsEml(recs)
      .select("url", "text", "extract_ok")
      .as[(String, String, Boolean)].collect().sortBy(_._1)
    assert(eml.length == 3)
    assert(eml(0)._1.endsWith("bad.eml") && !eml(0)._3 && eml(0)._2 == null)
    assert(eml(1)._2 == "Hello ✉\nmail body\nsecond line" && eml(1)._3)
    // HTML-only message routes through the codegen strip
    assert(eml(2)._2 == "Markup\nrich line" && eml(2)._3)
    val mbox = graft.io.Warc.toDocumentsMbox(recs)
      .select("url", "text", "extract_ok")
      .as[(String, String, Boolean)].collect().sortBy(_._1)
    assert(mbox.length == 3)
    assert(mbox(0)._1.endsWith("bad.mbox#") && !mbox(0)._3)
    assert(mbox(1)._1.endsWith("inbox.mbox#0") &&
      mbox(1)._2 == "m0\nfirst message")
    assert(mbox(2)._1.endsWith("inbox.mbox#1") &&
      mbox(2)._2 == "m1\nsecond message")
    // the one-call corpus face carries the mail documents too
    val all = graft.io.Warc.toDocuments(recs)
      .select("url", "text").as[(String, String)].collect().toMap
    assert(all("http://m.test/good.eml").startsWith("Hello ✉\n"))
    assert(all("http://m.test/inbox.mbox#1") == "m1\nsecond message")
    assert(!all.contains("http://m.test/bad.eml"))
  }
}
