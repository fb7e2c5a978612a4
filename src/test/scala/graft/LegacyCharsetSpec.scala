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

  test("detect: structural lanes — utf-8, ascii, iso-2022-jp escapes") {
    assert(LegacyCharset.detect("plain ascii only".getBytes("US-ASCII")) == "utf-8")
    assert(LegacyCharset.detect("日本語 UTF-8 ページ".getBytes("UTF-8")) == "utf-8")
    assert(LegacyCharset.detect("кириллица в utf-8".getBytes("UTF-8")) == "utf-8")
    assert(LegacyCharset.detect(jvm("ISO-2022-JP",
      "日本語テスト ascii too")) == "iso-2022-jp")
    // short high-byte tails stay on the web default, not a wild guess
    assert(LegacyCharset.detect("mostly ascii é".getBytes("windows-1252"))
      == "windows-1252")
  }

  test("detect: truncated UTF-8 (partial capture) still reads as UTF-8") {
    val full = "日本語のテストです。truncated capture".getBytes("UTF-8")
    // cut INSIDE a multi-byte sequence near the front
    val cut = java.util.Arrays.copyOf(full, 7)
    assert(LegacyCharset.detect(cut) == "utf-8")
    // an actually-invalid trail byte still fails the structural check
    val bad = full.clone; bad(1) = 'x'.toByte
    assert(LegacyCharset.detect(bad) != "utf-8")
  }

  test("detect: first multi-byte char straddling the sample cap stays UTF-8") {
    // 8191 ASCII bytes, then é (0xC3 0xA9) with its trail byte at 8192:
    // the sequence crosses the cap, bytes beyond prove continuation
    val b = ("a" * 8191 + "é déjà vu, plus 日本語 later").getBytes("UTF-8")
    assert(b.length > 8192)
    assert(LegacyCharset.detect(b) == "utf-8")
  }

  test("detect: a lead-shaped byte at the cap edge of a LEGACY page is not excused") {
    // >8 KiB cp1252 page, ASCII except one é whose single byte (0xE9,
    // lead-shaped for a 3-byte sequence) lands exactly at the cap edge;
    // its real continuation bytes exist in memory and are NOT valid
    // UTF-8 trails, so the page must not misdetect as utf-8
    val b = ("a" * 8191 + "é and ascii continues well past the cap")
      .getBytes("windows-1252")
    assert(b.length > 8192 && (b(8191) & 0xff) == 0xE9)
    assert(LegacyCharset.detect(b) == "windows-1252")
    // the same byte at the TRUE end of a payload keeps the old excuse
    // semantics: no completed witness → cp1252, not truncated UTF-8
    assert(LegacyCharset.detect("mostly ascii é".getBytes("windows-1252"))
      == "windows-1252")
  }

  test("detect: BOM-less UTF-16 via the NUL-alternation lane") {
    val t = "Latin text served as UTF-16 with the mark stripped"
    assert(LegacyCharset.detect(t.getBytes("UTF-16LE")) == "utf-16le")
    assert(LegacyCharset.detect(t.getBytes("UTF-16BE")) == "utf-16be")
    assert(LegacyCharset.decodeDetected(t.getBytes("UTF-16LE")) == t)
    assert(LegacyCharset.decodeDetected(t.getBytes("UTF-16BE")) == t)
    // CJK-heavy UTF-16 has few NULs — it must NOT claim the lane, and
    // short payloads never do
    val ja = "日本語のテストです。これは長めの文章になっています。"
    assert(LegacyCharset.detect(ja.getBytes("UTF-16LE")) != "utf-16be")
    // too short for the lane (< 16 bytes): falls through the cascade
    assert(LegacyCharset.detect("ab".getBytes("UTF-16LE")) == "utf-8")
  }

  test("detect: each CJK charset claims its own encoder's bytes") {
    val ja = "日本語のテストです。これは長めの文章で、ひらがなとカタカナと漢字が混ざっています。"
    val zhS = "这是一个简体中文的测试页面，包含了很多常用的汉字和标点符号。我们的引擎需要正确识别它。"
    val zhT = "這是一個繁體中文的測試頁面,包含了很多常用的漢字和標點符號。我們的引擎需要正確識別它。"
    val ko = "이것은 한국어 테스트 페이지입니다. 엔진은 이 문서의 문자 집합을 올바르게 감지해야 합니다."
    assert(LegacyCharset.detect(jvm("windows-31j", ja)) == "shift_jis")
    assert(LegacyCharset.detect(jvm("EUC-JP", ja)) == "euc-jp")
    assert(LegacyCharset.detect(jvm("GBK", zhS)) == "gbk")
    assert(LegacyCharset.detect(jvm("Big5", zhT)) == "big5")
    assert(LegacyCharset.detect(jvm("x-windows-949", ko)) == "euc-kr")
  }

  test("detect: the Cyrillic case-plane split separates 1251 from koi8-r") {
    val ru = "это проверка русского текста, написанного преимущественно строчными буквами как обычно."
    assert(LegacyCharset.detect(jvm("windows-1251", ru)) == "windows-1251")
    assert(LegacyCharset.detect(jvm("KOI8-R", ru)) == "koi8-r")
    assert(LegacyCharset.detect(jvm("ISO-8859-5", ru)) == "iso-8859-5")
  }

  test("detect: koi8-u claims Ukrainian via і/ї/є, koi8-r keeps Russian") {
    val uk = "це перевірка українського тексту, її літери і слова є важливі."
    val ru = "это проверка русского текста строчными буквами как обычно."
    assert(LegacyCharset.detect(jvm("KOI8-U", uk)) == "koi8-u")
    assert(LegacyCharset.detect(jvm("KOI8-R", ru)) == "koi8-r")
  }

  test("detect: script-unique single-byte families") {
    val el = "αυτή είναι μια δοκιμή ελληνικού κειμένου με πεζά γράμματα κυρίως."
    val he = "זוהי בדיקה של טקסט בעברית עם אותיות רבות כדי שהמנוע יזהה נכון."
    val ar = "هذا اختبار لنص عربي يحتوي على حروف كثيرة ليتعرف المحرك عليه بشكل صحيح."
    val th = "นี่คือการทดสอบข้อความภาษาไทยที่มีตัวอักษรจำนวนมากเพื่อการตรวจจับ"
    assert(LegacyCharset.detect(jvm("windows-1253", el)) == "windows-1253")
    assert(LegacyCharset.detect(jvm("windows-1255", he)) == "windows-1255")
    assert(LegacyCharset.detect(jvm("windows-1256", ar)) == "windows-1256")
    assert(LegacyCharset.detect(jvm("x-windows-874", th)) == "windows-874")
  }

  test("detect: the Latin family — anchors beat the 1252 default, ties fall to it") {
    val fr = "le café était déjà fermé, à côté de l'hôtel où nous étions arrivés après minuit."
    val cz = "příliš žluťoučký kůň úpěl ďábelské ódy, čeští řidiči věří světlům."
    val tr = "türkçe sınav metni: ağaç, şeker, ırmak, iğne, çiçek, gölge, yığın."
    assert(LegacyCharset.detect(jvm("windows-1252", fr)) == "windows-1252")
    assert(LegacyCharset.detect(jvm("windows-1250", cz)) == "windows-1250")
    assert(LegacyCharset.detect(jvm("windows-1254", tr)) == "windows-1254")
  }

  test("decodeDetected: detect-then-decode round-trips every claimed lane") {
    val cases = Seq(
      ("windows-31j", "日本語のテストです。ひらがなが多い文章ですよ。"),
      ("GBK", "这是简体中文的测试，我们有很多的汉字了。"),
      ("x-windows-949", "이것은 한국어 문서입니다. 감지가 되어야 합니다."),
      ("windows-1251", "проверка строчного русского текста на месте."),
      ("windows-1252", "le café déjà fermé à côté de l'hôtel coûte cher."),
      ("UTF-8", "plain utf-8 with 日本語 and кириллица"))
    for ((enc, text) <- cases)
      assert(LegacyCharset.decodeDetected(jvm(enc, text)) == text, enc)
  }

  test("detectScored: the margin separates confident claims, near-ties, and defaults") {
    // structural lanes are categorical — any finite threshold passes
    assert(LegacyCharset.detectScored("plain ascii".getBytes("US-ASCII"))
      ._2.isPosInfinity)
    assert(LegacyCharset.detectScored(
      "Latin text served as UTF-16 with the mark stripped".getBytes("UTF-16LE"))
      ._2.isPosInfinity)
    // a confidently-CJK page wins by a clear disagreeing-runner-up lead
    val ja = "日本語のテストです。これは長めの文章で、ひらがなとカタカナと漢字が混ざっています。"
    val (l1, m1) = LegacyCharset.detectScored(jvm("windows-31j", ja))
    assert(l1 == "shift_jis" && m1 > 0.15)
    // agreeing candidates are NOT evidence against a claim: cp1251 and
    // mac-cyrillic decode plain lowercase Russian identically, so the
    // margin measures the lead over koi8-r (which disagrees), not zero
    val ru = "это проверка русского текста, написанного преимущественно строчными буквами как обычно."
    val (l2, m2) = LegacyCharset.detectScored(jvm("windows-1251", ru))
    assert(l2 == "windows-1251" && m2 > 0.15)
    // the unclaimed fallback is a default, not a finding: margin 0
    val (l3, m3) = LegacyCharset.detectScored(
      "mostly ascii é".getBytes("windows-1252"))
    assert(l3 == "windows-1252" && m3 == 0.0)
    // a genuine near-tie: French accents score identically under every
    // windows Latin page and hit no flavor anchors — the label is a
    // positional preference and the margin says so
    val (l4, m4) = LegacyCharset.detectScored(
      "déjà vu café résumé naïve façade crème brûlée".getBytes("windows-1252"))
    assert(l4 == "windows-1252" && m4 == 0.0)
  }

  test("detect: deterministic on the capped sample") {
    val ja = "日本語のテストです。これは長い文章で繰り返します。" * 2000
    val b = jvm("windows-31j", ja)
    assert(b.length > 8192)
    assert(LegacyCharset.detect(b) == "shift_jis")
    assert(LegacyCharset.detect(b) == LegacyCharset.detect(b.clone))
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

  test("warc e2e: toDocumentsTextDetected fills silence, honors testimony") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_det_warc").toString
    val ja = "日本語のテストです。これは長めの文章で、ひらがなが混ざっています。"
    val ru = "это проверка русского текста строчными буквами для движка."
    graft.io.Warc.writeWarcResponses(Seq(
      // silence: bare text/plain, bytes must pick their own charset
      ("http://d.test/sjis", "text/plain", jvm("windows-31j", ja)),
      ("http://d.test/1251", "text/plain", jvm("windows-1251", ru)),
      ("http://d.test/utf8", "text/plain", ja.getBytes("UTF-8")),
      // testimony: a DECLARED charset wins over what detection would say
      ("http://d.test/decl", "text/plain; charset=euc-jp", jvm("EUC-JP", ja)))
      .toDF("target_uri", "content_type", "payload"), dir)
    val out = graft.io.Warc.toDocumentsTextDetected(
        graft.io.Warc.readWarc(spark, dir))
      .select("url", "charset", "text").as[(String, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("http://d.test/sjis") == (("shift_jis", ja)))
    assert(out("http://d.test/1251") == (("windows-1251", ru)))
    assert(out("http://d.test/utf8") == (("utf-8", ja)))
    assert(out("http://d.test/decl") == (("euc-jp", ja)))
  }

  test("warc e2e: toDocumentsHtmlDetected — silent page detected, meta wins") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_deth_warc").toString
    val ja = "日本語のテストです。ひらがなが多めの本文ですよ。"
    graft.io.Warc.writeWarcResponses(Seq(
      // pre-standards page: bare text/html, no meta, no BOM
      ("http://d.test/silent", "text/html",
        jvm("windows-31j", s"<html><body><p>$ja</p></body></html>")),
      // a meta declaration still wins over detection
      ("http://d.test/meta", "text/html",
        jvm("EUC-JP", "<html><head><meta charset=\"euc-jp\"></head>" +
          s"<body><p>$ja</p></body></html>")))
      .toDF("target_uri", "content_type", "payload"), dir)
    val out = graft.io.Warc.toDocumentsHtmlDetected(
        graft.io.Warc.readWarc(spark, dir))
      .select("url", "charset", "text").as[(String, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("http://d.test/silent") == (("shift_jis", ja)))
    assert(out("http://d.test/meta") == (("euc-jp", ja)))
  }
}
