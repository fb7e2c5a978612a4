package graft

import graft.operators.{Pdf, PdfCrypt}

/** The standard security handler: encrypt→extract round-trips across
  * every supported revision (RC4-40, RC4-128, AESV2-128, AESV3-256),
  * metadata through encrypted Info strings, the wrong-password and
  * out-of-scope loud failures, and primitive vectors. */
class PdfCryptSpec extends SparkSpec {

  private val text = "First planted line\nSecond line with (parens) and \\ back\nThird"
  private val docInfo = Seq("Title" -> "Encrypted Café Report",
    "Author" -> "graft — 測試", "CreationDate" -> "D:20260214093000Z")

  test("rc4 matches the published test vectors") {
    // RFC 6229-era canonical vectors ("Key"/"Plaintext" from the
    // original Schneier publication of the cipher)
    def hex(s: String) = s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    assert(PdfCrypt.rc4(hex("0123456789abcdef"), hex("0123456789abcdef"))
      .map(b => f"${b & 0xff}%02x").mkString == "75b7878099e0c596")
    assert(PdfCrypt.rc4("Key".getBytes, "Plaintext".getBytes)
      .map(b => f"${b & 0xff}%02x").mkString == "bbf316e8d940af0ad3")
    // involution: decrypt == encrypt
    val k = hex("1f2e3d4c5b6a")
    val d = "arbitrary payload bytes".getBytes
    assert(PdfCrypt.rc4(k, PdfCrypt.rc4(k, d)).sameElements(d))
  }

  test("every revision round-trips text AND metadata through encryption") {
    val plain = Pdf.writeTextPdf(text, docInfo)
    val wantText = Pdf.extractText(plain, 0L)
    val wantInfo = Pdf.pdfInfo(plain, 0L)
    assert(wantText.nonEmpty && wantInfo("Title") == "Encrypted Café Report")
    for (r <- Seq(2, 3, 4, 6)) {
      val enc = PdfCrypt.encryptStandard(plain, r, seed = 11L * r)
      // the encrypted doc is NOT readable by the raw scan: the content
      // stream bytes are ciphertext (no BT token after inflate fails)
      assert(!java.util.Arrays.equals(enc, plain), s"R$r")
      assert(new String(enc, "ISO-8859-1").contains("/Encrypt"), s"R$r")
      // ...but the extractor decrypts the empty user password inline
      assert(Pdf.extractText(enc, r.toLong) == wantText, s"R$r text")
      assert(Pdf.pdfInfo(enc, r.toLong) == wantInfo, s"R$r info")
    }
  }

  test("composite-font (Type0) PDFs round-trip encrypted too") {
    val plain = Pdf.writeType0TextPdf("CID 文本 line\nsecond 行")
    val want = Pdf.extractText(plain, 1L)
    for (r <- Seq(3, 4, 6))
      assert(Pdf.extractText(PdfCrypt.encryptStandard(plain, r), 1L) == want,
        s"R$r")
  }

  test("a NON-empty user password stays a loud failure at every revision") {
    val plain = Pdf.writeTextPdf(text)
    for (r <- Seq(2, 3, 4, 6)) {
      val enc = PdfCrypt.encryptStandard(plain, r)
      // corrupt /U so the empty-password check fails — equivalent to a
      // real user password being set
      val doc = new String(enc, "ISO-8859-1")
      val uAt = doc.indexOf("/U <")
      assert(uAt > 0, s"R$r")
      val bad = enc.clone()
      // flip a hex digit of /U's first byte
      bad(uAt + 4) = (if (bad(uAt + 4) == '0') '1' else '0').toByte
      val e = intercept[IllegalArgumentException] {
        Pdf.extractText(bad, r.toLong)
      }
      assert(e.getMessage.contains("password") ||
        e.getMessage.contains("encrypted"), s"R$r: ${e.getMessage}")
    }
  }

  test("out-of-scope shapes fail loudly, never silently") {
    val plain = Pdf.writeTextPdf(text)
    val enc = PdfCrypt.encryptStandard(plain, 4)
    val doc = new String(enc, "ISO-8859-1")
    // a non-Standard handler
    val foreign = doc.replace("/Filter /Standard", "/Filter /Acme")
      .getBytes("ISO-8859-1")
    val e1 = intercept[IllegalArgumentException] {
      Pdf.extractText(foreign, 5L)
    }
    assert(e1.getMessage.contains("non-Standard"))
    // unsupported revision
    val r5 = doc.replace("/R 4", "/R 5").getBytes("ISO-8859-1")
    intercept[IllegalArgumentException] { Pdf.extractText(r5, 6L) }
  }

  test("warc e2e: an encrypted PDF response lands as a document") {
    import spark.implicits._
    val pdf = PdfCrypt.encryptStandard(
      Pdf.writeTextPdf("encrypted but curate-ready"), 6)
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_encpdf").toString
    graft.io.Warc.writeWarcResponses(
      Seq(("http://a.test/locked.pdf", "application/pdf", pdf))
        .toDF("target_uri", "content_type", "payload"), dir)
    val docs = graft.io.Warc.toDocumentsPdf(
      graft.io.Warc.readWarc(spark, dir))
    assert(docs.select("text").as[String].collect().toSeq ==
      Seq("encrypted but curate-ready"))
  }
}
