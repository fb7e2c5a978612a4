package graft

import graft.operators.LegacyCharset

/** WHATWG legacy CJK decoders over the checked-in index blobs: anchor
  * pointers, JVM-encoder round-trips, the katakana/EUDC/jis0212 side
  * lanes, U+FFFD-and-continue error semantics with the ASCII prepend
  * rule, and the WARC header/meta routing end-to-end. */
class LegacyCharsetSpec extends SparkSpec {

  private def jvm(name: String, s: String): Array[Byte] =
    s.getBytes(java.nio.charset.Charset.forName(name))

  test("anchor pointers: one known cell per table") {
    assert(LegacyCharset.decode(Array(0x88, 0x9F).map(_.toByte), "Shift_JIS") == "亜")
    assert(LegacyCharset.decode(Array(0xB0, 0xA1).map(_.toByte), "euc-kr") == "가")
    assert(LegacyCharset.decode(Array(0xD6, 0xD0).map(_.toByte), "GBK") == "中")
    assert(LegacyCharset.decode(Array(0xA4, 0xA4).map(_.toByte), "Big5") == "中")
    assert(LegacyCharset.decode(Array(0xB0, 0xA1).map(_.toByte), "EUC-JP") == "亜")
    // shift_jis EUDC lane (PUA): 0xF040 -> U+E000
    assert(LegacyCharset.decode(Array(0xF0, 0x40).map(_.toByte), "sjis") == "\uE000")
  }

  test("JVM-encoder round-trips per charset, mixed with ASCII") {
    val cases = Seq(
      ("windows-31j", "Shift_JIS", "abc 日本語テスト、ｶﾀｶﾅ half-width! 0x80:"),
      ("EUC-JP", "euc-jp", "abc 日本語テスト、ｶﾀｶﾅ lanes"),
      ("GBK", "gbk", "abc 中文测试汉字，标点。"),
      ("Big5", "big5", "abc 中文測試漢字，標點。"),
      ("x-windows-949", "euc-kr", "abc 한국어 시험 조각"))
    for ((enc, label, text) <- cases)
      assert(LegacyCharset.decode(jvm(enc, text), label) == text,
        s"$label via $enc")
  }

  test("jis0212 triple-byte lane round-trips what EUC-JP puts there") {
    // find a codepoint the JVM encoder sends through the 0x8F plane
    val probe = (0x4E00 to 0x9FFF).iterator.map(cp => new String(Character.toChars(cp)))
      .find(s => jvm("EUC-JP", s).headOption.contains(0x8F.toByte))
    assert(probe.nonEmpty, "no jis0212 char found")
    val s = probe.get
    assert(LegacyCharset.decode(jvm("EUC-JP", s), "EUC-JP") == s)
  }

  test("iso-2022-jp: escape modes, Roman overrides, katakana lane") {
    // JVM-encoder round-trip through the jis0208 escape mode
    val text = "plain then \u65e5\u672c\u8a9e\u30c6\u30b9\u30c8 then ascii again"
    assert(LegacyCharset.decode(jvm("ISO-2022-JP", text), "ISO-2022-JP") == text)
    def esc(s: String): Array[Byte] =
      s.replace('%', '\u001b').getBytes("ISO-8859-1")
    // Roman mode: 0x5C is yen, 0x7E is overline; ASCII mode keeps both
    assert(LegacyCharset.decode(esc("%(Ja\\~%(Ba\\~"), "iso-2022-jp") ==
      "a\u00a5\u203ea\\~")
    // katakana mode: 0x21..0x5F maps to the half-width block
    assert(LegacyCharset.decode(esc("%(I6E%(Bok"), "iso-2022-jp") ==
      "\uff76\uff85ok")
    // unknown escape and dangling lead are loud, not silent
    assert(LegacyCharset.decode(esc("%(Xa"), "iso-2022-jp") == "\uFFFD(Xa")
    assert(LegacyCharset.decode(esc("%$B!"), "iso-2022-jp") == "\uFFFD")
  }

  test("gb18030 four-byte plane: ranges lookup, euro, broken-sequence prepend") {
    // chars OUTSIDE the two-byte GBK plane: the 4-byte form (incl. a
    // supplementary-plane char) must round-trip through the ranges table
    val texts = Seq("mḿ ok", "𠀀 tail", "éh0")
    for (t <- texts)
      assert(LegacyCharset.decode(jvm("GB18030", t), "gbk") == t, t)
    // the gbk euro: single byte 0x80
    assert(LegacyCharset.decode(
      Array('x'.toByte, 0x80.toByte), "gbk") == "x€")
    // a broken 4-byte sequence replays its tail bytes (the prepend rule)
    assert(LegacyCharset.decode(
      Array(0x81.toByte, 0x30.toByte, 0x20.toByte), "gbk") == "\uFFFD0 ")
  }

  test("single-byte family: JVM round-trips, label aliases, unmapped FFFD") {
    val cases = Seq(
      ("windows-1251", "windows-1251", "abc Русский текст Ёж №"),
      ("KOI8-R", "koi8-r", "abc Привет мир"),
      ("ISO-8859-7", "greek", "abc Ελληνικά δοκιμή"),
      ("windows-1256", "windows-1256", "abc اختبار عربي"),
      // iso-8859-9 label means windows-1254 on the web
      ("windows-1254", "iso-8859-9", "abc Türkçe ĞŞı"),
      ("ISO-8859-2", "latin2", "abc Čeština ěščř"),
      ("windows-1255", "windows-1255", "abc עברית בדיקה"),
      ("x-windows-874", "tis-620", "abc ทดสอบไทย"),
      ("ISO-8859-15", "latin-9", "abc € œuvre Ÿ"),
      ("x-MacCyrillic", "x-mac-cyrillic", "abc Привет"))
    for ((enc, label, text) <- cases)
      assert(LegacyCharset.decode(jvm(enc, text), label) == text,
        s"$label via $enc")
    // an unmapped high pointer is one replacement, stream continues
    // (0x81 is unmapped in windows-1251's table per the JDK)
    val out = LegacyCharset.decode(
      Array('a'.toByte, 0x98.toByte, 'z'.toByte), "windows-1251")
    assert(out.length == 3 && out.startsWith("a") && out.endsWith("z"))
    // iso-8859-10 / -14 are documented refusals: unclaimed labels
    assert(!LegacyCharset.supports("iso-8859-10"))
    assert(!LegacyCharset.supports("iso-8859-14"))
  }

  test("nfc_normalize: decomposed riders compose; NFC input returns as-is") {
    import spark.implicits._
    import graft.functions.{TextFunctions => TF}
    val rows = Seq(
      "échec", "Ångström", "한",
      "café plain ascii").toDF("t")
      .select(TF.normalizeNfc(org.apache.spark.sql.functions.col("t")).as("n"))
      .as[String].collect().toList
    assert(rows == List("échec", "Ångström", "한",
      "café plain ascii"))
  }

  test("errors emit U+FFFD and continue; broken-pair ASCII reprocesses") {
    // sjis lead + space: replacement, then the space itself
    assert(LegacyCharset.decode(Array(0x82, 0x20).map(_.toByte), "sjis") ==
      "\uFFFD ")
    // dangling lead at EOF
    assert(LegacyCharset.decode(Array('a'.toByte, 0x82.toByte), "sjis") ==
      "a\uFFFD")
    // euc-kr: 0xFF is no lead
    assert(LegacyCharset.decode(Array(0xFF, 0x41).map(_.toByte), "euc-kr") ==
      "\uFFFDA")
    // gbk 0x7F trail hole: replacement + reprocessed DEL
    assert(LegacyCharset.decode(Array(0x81, 0x7F).map(_.toByte), "gbk") ==
      "\uFFFD\u007F")
    // unmapped but well-formed pointer: one replacement, stream continues
    assert(LegacyCharset.decode(
      Array(0x81.toByte, 0x40.toByte, 'z'.toByte), "euc-kr").endsWith("z"))
    // unsupported label is the CALLER's bug: loud
    intercept[IllegalArgumentException] {
      LegacyCharset.decode(Array(0x41.toByte), "iso-8859-10")
    }
  }

  test("warc e2e: header charset= and meta prescan both route, utf-8 fallback loud") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cjk_warc").toString
    val sjisText = "見出し テスト ｶﾅ"
    val krText = "한국어 시험"
    graft.io.Warc.writeWarcResponses(Seq(
      // header route: text/plain with an explicit charset parameter
      ("http://a.test/h", "text/plain; charset=Shift_JIS",
        jvm("windows-31j", sjisText)),
      // meta-prescan route: no header charset, the page declares itself
      ("http://a.test/m", "text/html",
        jvm("x-windows-949",
          s"""<html><head><meta charset="euc-kr"></head><body><p>$krText</p></body></html>""")),
      // outside the claimed set: falls back to UTF-8, visibly garbled
      ("http://a.test/f", "text/plain; charset=iso-8859-10",
        Array[Byte](0xC4.toByte, 0xCF.toByte)))
      .toDF("target_uri", "content_type", "payload"), dir)
    val recs = graft.io.Warc.readWarc(spark, dir)
    val texts = graft.io.Warc.toDocumentsText(recs)
      .select("url", "text").as[(String, String)].collect().toMap
    assert(texts("http://a.test/h") == sjisText)
    assert(texts("http://a.test/f").contains("\uFFFD")) // loud, not silent
    val htmls = graft.io.Warc.toDocumentsHtml(recs)
      .select("url", "text").as[(String, String)].collect().toMap
    assert(htmls("http://a.test/m") == krText)
  }
}
