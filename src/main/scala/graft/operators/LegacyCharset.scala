package graft.operators

/** Legacy CJK charset decode — the WHATWG Encoding Standard's
  * shift_jis / euc-jp / gbk / big5 / euc-kr DECODE state machines over
  * the standard's index tables, the charsets a real fraction of the
  * crawlable web still declares. The index content is checked in under
  * `resources/charsets/` — published spec data dumped from the system
  * JDK's own charset implementations by the checked-in generator
  * `tools/CharsetIndexGen.java` through the public `java.nio.charset`
  * API (the Brotli-dictionary resource pattern; see that file's header
  * for the source charset of each table).
  *
  * Decode semantics follow the WHATWG algorithms: ASCII bytes pass
  * through, each charset's lead/trail ranges walk its pointer space,
  * and — this is the web-platform contract, distinct from the archive
  * codecs' fail-loud rule — a malformed or unmapped sequence emits
  * U+FFFD and CONTINUES (an ASCII byte that broke a pair is reprocessed
  * as itself, the standard's prepend rule): browsers render broken
  * pages, they do not refuse them, and downstream encoding-quality
  * gates count the U+FFFDs.
  *
  * The `gbk` label decodes as gb18030 (the WHATWG rule): the two-byte
  * GBK plane through its pointer table AND the four-byte plane through
  * the ranges table — full coverage including supplementary planes.
  * Known divergences, documented loudly: big5 pointers that the WHATWG
  * index maps to two-codepoint compositions (four HKSCS pointers)
  * follow the JDK table's single-codepoint choice or U+FFFD;
  * iso-8859-10 / -14 are refused (no JDK table to dump). Charset
  * labels OUTSIDE [[labels]] are not routed here at all — the reader's
  * documented fallback is a UTF-8 decode
  * ([[graft.io.Warc]] `decodePayload`). */
object LegacyCharset {

  private def load(name: String, pointers: Int): Array[Int] = {
    val in = getClass.getResourceAsStream(s"/charsets/$name")
    require(in != null, s"charsets/$name missing from resources")
    val bytes = try in.readAllBytes() finally in.close()
    require(bytes.length == pointers * 4,
      s"charsets/$name: ${bytes.length} bytes, expected ${pointers * 4}")
    val t = new Array[Int](pointers)
    var i = 0
    while (i < pointers) {
      t(i) = ((bytes(4 * i) & 0xff) << 24) | ((bytes(4 * i + 1) & 0xff) << 16) |
        ((bytes(4 * i + 2) & 0xff) << 8) | (bytes(4 * i + 3) & 0xff)
      i += 1
    }
    t
  }

  private lazy val sjisTab = load("sjis.tab", 60 * 188)
  private lazy val jis0208Tab = load("jis0208.tab", 94 * 94)
  private lazy val jis0212Tab = load("jis0212.tab", 94 * 94)
  private lazy val gbkTab = load("gbk.tab", 126 * 190)
  private lazy val big5Tab = load("big5.tab", 126 * 157)
  private lazy val euckrTab = load("euckr.tab", 126 * 190)

  private val Sjis = "sjis"
  private val EucJp = "eucjp"
  private val Gbk = "gbk"
  private val Big5 = "big5"
  private val EucKr = "euckr"
  private val Iso2022Jp = "iso2022jp"

  /** The WHATWG single-byte family: 128-pointer tables (0x80–0xFF;
    * 0x00–0x7F is ASCII in every single-byte encoding the standard
    * defines), same blob pattern. iso-8859-10 / -14 are REFUSED (this
    * JDK carries no table to dump) — their labels fall to the reader's
    * loud UTF-8 default like any unclaimed charset. */
  private val singleByteTabs: Map[String, String] = Map(
    "sb:windows874" -> "sb_windows874.tab",
    "sb:windows1250" -> "sb_windows1250.tab",
    "sb:windows1251" -> "sb_windows1251.tab",
    "sb:windows1253" -> "sb_windows1253.tab",
    "sb:windows1254" -> "sb_windows1254.tab",
    "sb:windows1255" -> "sb_windows1255.tab",
    "sb:windows1256" -> "sb_windows1256.tab",
    "sb:windows1257" -> "sb_windows1257.tab",
    "sb:windows1258" -> "sb_windows1258.tab",
    "sb:koi8r" -> "sb_koi8r.tab",
    "sb:koi8u" -> "sb_koi8u.tab",
    "sb:iso88592" -> "sb_iso88592.tab",
    "sb:iso88593" -> "sb_iso88593.tab",
    "sb:iso88594" -> "sb_iso88594.tab",
    "sb:iso88595" -> "sb_iso88595.tab",
    "sb:iso88596" -> "sb_iso88596.tab",
    "sb:iso88597" -> "sb_iso88597.tab",
    "sb:iso88598" -> "sb_iso88598.tab",
    "sb:iso885913" -> "sb_iso885913.tab",
    "sb:iso885915" -> "sb_iso885915.tab",
    "sb:iso885916" -> "sb_iso885916.tab",
    "sb:maccyrillic" -> "sb_maccyrillic.tab")

  private lazy val singleByteTables: Map[String, Array[Int]] =
    singleByteTabs.map { case (k, f) => k -> load(f, 128) }

  /** The gb18030 four-byte RANGES table: (pointer, codepoint) anchors
    * of the linear runs (a zero codepoint anchors an unmapped gap) —
    * the WHATWG "gb18030 ranges" structure, derived by the generator
    * from the JDK's GB18030 decoder. */
  private lazy val gb18030Ranges: Array[Int] = {
    val in = getClass.getResourceAsStream("/charsets/gb18030_ranges.tab")
    require(in != null, "charsets/gb18030_ranges.tab missing from resources")
    val bytes = try in.readAllBytes() finally in.close()
    require(bytes.length % 8 == 0 && bytes.length > 0,
      s"gb18030_ranges.tab: bad length ${bytes.length}")
    val t = new Array[Int](bytes.length / 4)
    var i = 0
    while (i < t.length) {
      t(i) = ((bytes(4 * i) & 0xff) << 24) | ((bytes(4 * i + 1) & 0xff) << 16) |
        ((bytes(4 * i + 2) & 0xff) << 8) | (bytes(4 * i + 3) & 0xff)
      i += 1
    }
    t
  }

  /** Greatest anchor ≤ pointer, linear offset within its run; 0 for a
    * gap or a pointer before the first run. */
  private def gb18030RangeLookup(p: Int): Int = {
    val t = gb18030Ranges
    var lo = 0
    var hi = t.length / 2 - 1
    if (p < t(0)) return 0
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (t(2 * mid) <= p) lo = mid else hi = mid - 1
    }
    val cp = t(2 * lo + 1)
    if (cp == 0) 0 else cp + (p - t(2 * lo))
  }

  /** WHATWG label → decoder key (labels lowercase; the header/meta
    * extraction lowercases before lookup). */
  private val labelKey: Map[String, String] = Map(
    "shift_jis" -> Sjis, "shift-jis" -> Sjis, "sjis" -> Sjis,
    "x-sjis" -> Sjis, "ms_kanji" -> Sjis, "ms932" -> Sjis,
    "windows-31j" -> Sjis, "csshiftjis" -> Sjis,
    "euc-jp" -> EucJp, "x-euc-jp" -> EucJp,
    "cseucpkdfmtjapanese" -> EucJp,
    "gbk" -> Gbk, "gb2312" -> Gbk, "gb_2312" -> Gbk, "gb_2312-80" -> Gbk,
    "chinese" -> Gbk, "csgb2312" -> Gbk, "csiso58gb231280" -> Gbk,
    "iso-ir-58" -> Gbk, "x-gbk" -> Gbk,
    "big5" -> Big5, "big5-hkscs" -> Big5, "cn-big5" -> Big5,
    "csbig5" -> Big5, "x-x-big5" -> Big5,
    "euc-kr" -> EucKr, "windows-949" -> EucKr, "ks_c_5601-1987" -> EucKr,
    "ks_c_5601-1989" -> EucKr, "ksc_5601" -> EucKr, "ksc5601" -> EucKr,
    "korean" -> EucKr, "csksc56011987" -> EucKr, "cseuckr" -> EucKr,
    "iso-ir-149" -> EucKr,
    "iso-2022-jp" -> Iso2022Jp, "csiso2022jp" -> Iso2022Jp,
    // the single-byte family, WHATWG label groups (iso-8859-9 IS
    // windows-1254 and iso-8859-11/tis-620 ARE windows-874 per the
    // standard's label table — the windows supersets are what the web
    // means by those labels)
    "windows-874" -> "sb:windows874", "dos-874" -> "sb:windows874",
    "tis-620" -> "sb:windows874", "iso-8859-11" -> "sb:windows874",
    "windows-1250" -> "sb:windows1250", "x-cp1250" -> "sb:windows1250",
    "windows-1251" -> "sb:windows1251", "x-cp1251" -> "sb:windows1251",
    "windows-1253" -> "sb:windows1253", "x-cp1253" -> "sb:windows1253",
    "windows-1254" -> "sb:windows1254", "x-cp1254" -> "sb:windows1254",
    "iso-8859-9" -> "sb:windows1254", "latin5" -> "sb:windows1254",
    "windows-1255" -> "sb:windows1255", "x-cp1255" -> "sb:windows1255",
    "windows-1256" -> "sb:windows1256", "x-cp1256" -> "sb:windows1256",
    "windows-1257" -> "sb:windows1257", "x-cp1257" -> "sb:windows1257",
    "windows-1258" -> "sb:windows1258", "x-cp1258" -> "sb:windows1258",
    "koi8-r" -> "sb:koi8r", "koi8" -> "sb:koi8r", "koi" -> "sb:koi8r",
    "cskoi8r" -> "sb:koi8r",
    "koi8-u" -> "sb:koi8u", "koi8-ru" -> "sb:koi8u",
    "iso-8859-2" -> "sb:iso88592", "iso8859-2" -> "sb:iso88592",
    "latin2" -> "sb:iso88592", "csisolatin2" -> "sb:iso88592",
    "iso-ir-101" -> "sb:iso88592", "l2" -> "sb:iso88592",
    "iso-8859-3" -> "sb:iso88593", "latin3" -> "sb:iso88593",
    "iso-8859-4" -> "sb:iso88594", "latin4" -> "sb:iso88594",
    "iso-8859-5" -> "sb:iso88595", "cyrillic" -> "sb:iso88595",
    "iso-ir-144" -> "sb:iso88595",
    "iso-8859-6" -> "sb:iso88596", "arabic" -> "sb:iso88596",
    "asmo-708" -> "sb:iso88596",
    "iso-8859-7" -> "sb:iso88597", "greek" -> "sb:iso88597",
    "elot_928" -> "sb:iso88597", "iso-ir-126" -> "sb:iso88597",
    "sun_eu_greek" -> "sb:iso88597",
    "iso-8859-8" -> "sb:iso88598", "hebrew" -> "sb:iso88598",
    "visual" -> "sb:iso88598", "iso-8859-8-i" -> "sb:iso88598",
    "iso-8859-13" -> "sb:iso885913", "latin7" -> "sb:iso885913",
    "iso-8859-15" -> "sb:iso885915", "iso8859-15" -> "sb:iso885915",
    "latin-9" -> "sb:iso885915", "l9" -> "sb:iso885915",
    "csisolatin9" -> "sb:iso885915",
    "iso-8859-16" -> "sb:iso885916",
    "x-mac-cyrillic" -> "sb:maccyrillic",
    "x-mac-ukrainian" -> "sb:maccyrillic")

  /** Every charset label this decoder claims (the `decodePayload`
    * routing set). */
  val labels: Seq[String] = labelKey.keys.toSeq.sorted

  def supports(label: String): Boolean =
    labelKey.contains(label.toLowerCase(java.util.Locale.ROOT))

  /** Decode `bytes` under a claimed label; throws on a label outside
    * [[labels]] (the caller routes, this decodes). */
  def decode(bytes: Array[Byte], label: String): String = {
    val key = labelKey.getOrElse(label.toLowerCase(java.util.Locale.ROOT),
      throw new IllegalArgumentException(s"unsupported legacy charset: $label"))
    val sb = new java.lang.StringBuilder(bytes.length)
    key match {
      case Sjis => decodeSjis(bytes, sb)
      case EucJp => decodeEucJp(bytes, sb)
      case Gbk => decodeGbk(bytes, sb)
      case Big5 => decodeBig5(bytes, sb)
      case EucKr => decodeTwoByte(bytes, sb, euckrTab,
        trailLo = 0x41, trailHi = 0xFE, skip7F = false, width = 190,
        trailOff2 = 0x41)
      case Iso2022Jp => decodeIso2022Jp(bytes, sb)
      case k => decodeSingleByte(bytes, sb, singleByteTables(k))
    }
    sb.toString
  }

  /** The WHATWG single-byte decoder: ASCII passes, a high byte maps
    * through its 128-pointer table, an unmapped pointer is U+FFFD. */
  private def decodeSingleByte(b: Array[Byte],
      sb: java.lang.StringBuilder, tab: Array[Int]): Unit = {
    var i = 0
    while (i < b.length) {
      val x = b(i) & 0xff
      if (x <= 0x7F) sb.append(x.toChar)
      else {
        val cp = tab(x - 0x80)
        sb.appendCodePoint(if (cp != 0) cp else Repl)
      }
      i += 1
    }
  }

  private val Repl = 0xFFFD

  /** shift_jis decoder (WHATWG §12.2.1 shape): single-byte katakana
    * lane 0xA1–0xDF, 0x80 → U+0080, EUDC and JIS rows via the pointer
    * table, ASCII-reprocess on a broken pair. */
  private def decodeSjis(b: Array[Byte], sb: java.lang.StringBuilder): Unit = {
    var lead = 0
    var i = 0
    while (i < b.length) {
      val x = b(i) & 0xff
      if (lead != 0) {
        val leadOff = if (lead < 0xA0) 0x81 else 0xC1
        if (x >= 0x40 && x <= 0xFC && x != 0x7F) {
          val p = (lead - leadOff) * 188 + x - (if (x < 0x7F) 0x40 else 0x41)
          val cp = sjisTab(p)
          sb.appendCodePoint(if (cp != 0) cp else Repl)
          lead = 0
        } else {
          sb.appendCodePoint(Repl)
          lead = 0
          if (x <= 0x7F) i -= 1 // the prepend rule: reprocess ASCII
        }
      } else if (x <= 0x7F) sb.append(x.toChar)
      else if (x == 0x80) sb.append(0x80.toChar)
      else if (x >= 0xA1 && x <= 0xDF) sb.appendCodePoint(0xFF61 + x - 0xA1)
      else if ((x >= 0x81 && x <= 0x9F) || (x >= 0xE0 && x <= 0xFC)) lead = x
      else sb.appendCodePoint(Repl)
      i += 1
    }
    if (lead != 0) sb.appendCodePoint(Repl)
  }

  /** euc-jp decoder: 0x8E katakana lane, 0x8F jis0212 triple-byte
    * lane, jis0208 pairs. */
  private def decodeEucJp(b: Array[Byte], sb: java.lang.StringBuilder): Unit = {
    var lead = 0
    var in0212 = false
    var i = 0
    while (i < b.length) {
      val x = b(i) & 0xff
      if (lead == 0x8E && x >= 0xA1 && x <= 0xDF) {
        sb.appendCodePoint(0xFF61 + x - 0xA1)
        lead = 0
      } else if (lead == 0x8F && x >= 0xA1 && x <= 0xFE) {
        in0212 = true
        lead = x
      } else if (lead != 0) {
        if (lead >= 0xA1 && lead <= 0xFE && x >= 0xA1 && x <= 0xFE) {
          val p = (lead - 0xA1) * 94 + x - 0xA1
          val cp = (if (in0212) jis0212Tab else jis0208Tab)(p)
          sb.appendCodePoint(if (cp != 0) cp else Repl)
        } else {
          sb.appendCodePoint(Repl)
          if (x <= 0x7F) i -= 1
        }
        lead = 0
        in0212 = false
      } else if (x <= 0x7F) sb.append(x.toChar)
      else if (x == 0x8E || x == 0x8F || (x >= 0xA1 && x <= 0xFE)) lead = x
      else sb.appendCodePoint(Repl)
      i += 1
    }
    if (lead != 0) sb.appendCodePoint(Repl)
  }

  /** The gb18030 decoder (what the web's `gbk` label means on decode,
    * per WHATWG): the two-byte GBK plane through the pointer table,
    * the FOUR-byte plane (lead, digit, lead, digit) through the ranges
    * table — full Unicode coverage including supplementary planes —
    * the 0x80 euro, and the standard's multi-byte prepend rules on
    * broken sequences. */
  private def decodeGbk(b: Array[Byte], sb: java.lang.StringBuilder): Unit = {
    var first = 0
    var second = 0
    var third = 0
    var i = 0
    while (i < b.length) {
      val x = b(i) & 0xff
      if (third != 0) {
        if (x >= 0x30 && x <= 0x39) {
          val p = ((first - 0x81) * 10 + second - 0x30) * 1260 +
            (third - 0x81) * 10 + x - 0x30
          val cp = gb18030RangeLookup(p)
          sb.appendCodePoint(if (cp != 0) cp else Repl)
        } else {
          sb.appendCodePoint(Repl)
          i -= 3 // prepend (second, third, byte): reprocess all three
        }
        first = 0; second = 0; third = 0
      } else if (second != 0) {
        if (x >= 0x81 && x <= 0xFE) third = x
        else {
          sb.appendCodePoint(Repl)
          first = 0; second = 0
          i -= 2 // prepend (second, byte)
        }
      } else if (first != 0) {
        if (x >= 0x30 && x <= 0x39) second = x
        else if (x >= 0x40 && x <= 0xFE && x != 0x7F) {
          val off = if (x < 0x7F) 0x40 else 0x41
          val cp = gbkTab((first - 0x81) * 190 + x - off)
          sb.appendCodePoint(if (cp != 0) cp else Repl)
          first = 0
        } else {
          sb.appendCodePoint(Repl)
          first = 0
          if (x <= 0x7F) i -= 1
        }
      } else if (x <= 0x7F) sb.append(x.toChar)
      else if (x == 0x80) sb.append('€') // the gbk euro
      else if (x >= 0x81 && x <= 0xFE) first = x
      else sb.appendCodePoint(Repl)
      i += 1
    }
    if (first != 0 || second != 0 || third != 0) sb.appendCodePoint(Repl)
  }

  /** The shared two-byte machine (euc-kr): lead 0x81–0xFE, one
    * contiguous-ish trail range, split trail offset for the 0x7F
    * hole when present. */
  private def decodeTwoByte(b: Array[Byte], sb: java.lang.StringBuilder,
      tab: Array[Int], trailLo: Int, trailHi: Int, skip7F: Boolean,
      width: Int, trailOff2: Int): Unit = {
    var lead = 0
    var i = 0
    while (i < b.length) {
      val x = b(i) & 0xff
      if (lead != 0) {
        if (x >= trailLo && x <= trailHi && !(skip7F && x == 0x7F)) {
          val off = if (skip7F && x < 0x7F) 0x40 else trailOff2
          val cp = tab((lead - 0x81) * width + x - off)
          sb.appendCodePoint(if (cp != 0) cp else Repl)
          lead = 0
        } else {
          sb.appendCodePoint(Repl)
          lead = 0
          if (x <= 0x7F) i -= 1
        }
      } else if (x <= 0x7F) sb.append(x.toChar)
      else if (x >= 0x81 && x <= 0xFE) lead = x
      else sb.appendCodePoint(Repl)
      i += 1
    }
    if (lead != 0) sb.appendCodePoint(Repl)
  }

  /** iso-2022-jp decoder: the escape-switched mail/legacy-web charset.
    * Modes: ASCII (`ESC ( B`), JIS X 0201 Roman (`ESC ( J` — 0x5C → ¥,
    * 0x7E → ‾), half-width katakana (`ESC ( I`), and jis0208 two-byte
    * rows (`ESC $ @` / `ESC $ B`, the SAME index the euc-jp lane uses —
    * the 0x21-based pointer space is the euc space shifted by 0x80).
    * Unknown escapes and out-of-mode bytes emit U+FFFD and continue,
    * the WHATWG replacement contract. */
  private def decodeIso2022Jp(b: Array[Byte], sb: java.lang.StringBuilder): Unit = {
    val ModeAscii = 0; val ModeRoman = 1; val ModeKatakana = 2; val ModeJis = 3
    var mode = ModeAscii
    var lead = 0
    var i = 0
    while (i < b.length) {
      val x = b(i) & 0xff
      if (x == 0x1B) {
        // escape sequence: two more bytes pick the mode
        if (lead != 0) { sb.appendCodePoint(Repl); lead = 0 }
        if (i + 2 < b.length) {
          val a = b(i + 1) & 0xff
          val c = b(i + 2) & 0xff
          (a, c) match {
            case (0x28, 0x42) => mode = ModeAscii; i += 2
            case (0x28, 0x4A) => mode = ModeRoman; i += 2
            case (0x28, 0x49) => mode = ModeKatakana; i += 2
            case (0x24, 0x40) | (0x24, 0x42) => mode = ModeJis; i += 2
            case _ => sb.appendCodePoint(Repl) // unknown escape, ESC dropped
          }
        } else sb.appendCodePoint(Repl)
      } else if (mode == ModeJis) {
        if (lead == 0) {
          if (x >= 0x21 && x <= 0x7E) lead = x
          else sb.appendCodePoint(Repl)
        } else {
          if (x >= 0x21 && x <= 0x7E) {
            val cp = jis0208Tab((lead - 0x21) * 94 + x - 0x21)
            sb.appendCodePoint(if (cp != 0) cp else Repl)
          } else sb.appendCodePoint(Repl)
          lead = 0
        }
      } else if (mode == ModeKatakana) {
        if (x >= 0x21 && x <= 0x5F) sb.appendCodePoint(0xFF61 + x - 0x21)
        else sb.appendCodePoint(Repl)
      } else if (x <= 0x7F) {
        if (mode == ModeRoman && x == 0x5C) sb.append('¥')
        else if (mode == ModeRoman && x == 0x7E) sb.append('‾')
        else sb.append(x.toChar)
      } else sb.appendCodePoint(Repl)
      i += 1
    }
    if (lead != 0) sb.appendCodePoint(Repl)
  }

  // ------------------------------------------------------------------
  // Statistical charset detection — the NO-declaration path.
  //
  // `decodePayload` routes on the header/meta/BOM testimony; a page
  // with none of the three (a real fraction of the crawlable web,
  // especially pre-2010 captures) previously fell to the blind UTF-8
  // default. [[detect]] closes that gap with the classic detector
  // cascade (the Mozilla universalchardet / ICU shape, re-derived from
  // first principles — no tables copied):
  //
  //   1. ISO-2022-JP escape scan: a 7-bit stream carrying `ESC $ @/B`
  //      or `ESC ( I/J` designators IS iso-2022-jp (no other claimed
  //      charset uses them; UTF-8 text never contains bare ESC).
  //   2. BOM-less UTF-16 (servers strip marks): mostly-Latin UTF-16
  //      has a NUL in nearly every code unit, on the high-byte side
  //      for LE and the low-byte side for BE — no other claimed
  //      charset emits NUL runs, so a clear one-sided even/odd
  //      majority is decisive (≥16 bytes required, so binary junk
  //      and short tails never claim the lane).
  //   3. Strict UTF-8 structural validation: a byte stream that parses
  //      as well-formed multi-byte UTF-8 is UTF-8 — the probability of
  //      legacy two-byte text forming only valid UTF-8 sequences decays
  //      geometrically with length (the standard detector precision
  //      argument). Pure ASCII also returns "utf-8" (every claimed
  //      charset decodes ASCII identically). A sequence truncated by
  //      end-of-data is excused ONLY behind a completed-multi-byte
  //      witness: partial captures of real UTF-8 pass, a cp1252 page
  //      ending in é does not.
  //   4. Decode-and-score: the capped sample is decoded under each
  //      CANDIDATE charset and scored on the decoded code points. An
  //      ADJACENCY gate runs first: when most high bytes touch an
  //      ASCII letter the text is Latin-script by construction
  //      (accents live inside ASCII words; non-Latin words are wholly
  //      high bytes) — only the Latin family (windows-1252/1250/1254)
  //      competes for it, because every non-Latin single-byte plane
  //      covers the 1252 accent positions with plausible letters
  //      (é → ι under windows-1253, č → и under windows-1251). Scoring:
  //      structural errors (U+FFFD) penalize hard, letters of the
  //      candidate's expected script earn weight (LOWERCASE above
  //      uppercase: running text is overwhelmingly lowercase, and the
  //      Cyrillic family's layouts differ exactly by case planes —
  //      koi8-r lower 0xC0–0xDF vs cp1251 lower 0xE0–0xFF, so the
  //      case-weighted score separates them structurally), letters
  //      outside any expected script penalize mildly. A small ANCHOR
  //      set per language — the highest-frequency function-word
  //      characters (的/了/是 simplified, 這/個/們 traditional,
  //      の/に/は kana particles, 이/다/는 Hangul particles; the same
  //      public-linguistic-fact class as the n-gram langId heuristic
  //      already in TextFunctions) — disambiguates WITHIN the EUC
  //      structural family, where e.g. Korean-as-gbk decodes to
  //      structurally perfect hanzi and only the anchor layer can
  //      tell; for the Latin single-byte family the anchors are the
  //      letters at byte positions where the candidate's layout
  //      DIFFERS from windows-1252 (ě/ř/ą/ł/ż/ś for
  //      windows-1250 — no ů, its byte is French ù — ğ/ş/ı for
  //      windows-1254); і/ї/є split koi8-u from koi8-r, whose
  //      positions for them are box-drawing symbols.
  //   5. Fallback: below threshold (or fewer than 4 non-ASCII bytes —
  //      nothing to measure) the answer is windows-1252, the web's
  //      de-facto default for undeclared 8-bit content (the WHATWG
  //      default for most locales).
  //
  // Deterministic by construction: fixed candidate order, integer-free
  // scoring on a capped prefix, ties broken by list position (the
  // web-dominant flavor first). Cost is O(candidates × min(len, cap))
  // per record, executor-side, zero shuffle.
  // ------------------------------------------------------------------

  /** Candidate labels in priority order (ties break to the EARLIER
    * entry — the web-dominant flavor of each script family first). */
  private[graft] val detectCandidates: Seq[String] = Seq(
    "shift_jis", "euc-jp", "gbk", "big5", "euc-kr",
    "windows-1253", "windows-1255", "windows-1256", "windows-874",
    "windows-1251", "koi8-r", "koi8-u", "iso-8859-5", "x-mac-cyrillic",
    "windows-1252", "windows-1250", "windows-1254")

  /** Per-language anchor characters (see the cascade note above) —
    * top-frequency letters of each candidate's language (public
    * linguistic facts, the stopword/langId resource class). The
    * single-byte families NEED them: the Cyrillic/Greek/Hebrew/Arabic
    * lowercase planes occupy the SAME byte ranges, so e.g. Greek text
    * decodes under windows-1251 to structurally perfect lowercase
    * Cyrillic — only the frequency anchors (≈half the letters of real
    * text in the true language, accidental hits far rarer) give the
    * true candidate its margin. The Latin-family anchors are
    * restricted to byte positions where windows-1252 carries a symbol
    * or a rare letter (ą/ł/ż sit on ¹/³/¿) so French/Spanish text
    * never earns them by coincidence. */
  private val anchorJa = "のにはをがたでてとしも。、い"
  private val anchorZhS = "的了是在不和有这个们为没说"
  private val anchorZhT = "的是不了在這個們有和為沒說"
  private val anchorKo = "이다의에는은을를가고하지"
  private val anchorRu = "оеаинтс"
  // Ukrainian: the shared Cyrillic core plus і/ї/є — the letters whose
  // koi8-u positions are box-drawing symbols in koi8-r, the pair's
  // only separation (ties on pure-shared-range text fall to koi8-r)
  private val anchorUk = "оаніивтсїє"
  // top vowels/consonants + tonos forms + final sigma: the plain Greek
  // vowels share the byte plane with windows-1252's accented Latin
  // (é→ι), but the ADJACENCY gate keeps Latin pages out of this
  // candidate's reach — within the non-Latin field the full set gives
  // real Greek its margin over accidental Cyrillic-anchor hits
  // (ε→е, ν→н under the mac-cyrillic plane)
  private val anchorEl = "αοιετσνηάέήίόύώς"
  private val anchorHe = "יהולארתמ"
  private val anchorAr = "اليمونهر"
  private val anchorTh = "านรอเกมิ"
  // no ů: its byte position is French ù ("où"), a real 1252 tenant
  private val anchor1250 = "ěřąłżś"
  private val anchor1254 = "ğşıİ"

  private val latinOnly: Set[String] =
    Set("windows-1252", "windows-1250", "windows-1254")

  /** True iff the sample carries an ISO-2022-JP designator escape. */
  private def hasIso2022Escape(b: Array[Byte], n: Int): Boolean = {
    var i = 0
    while (i + 2 < n) {
      if ((b(i) & 0xff) == 0x1B) {
        val a = b(i + 1) & 0xff; val c = b(i + 2) & 0xff
        if ((a == 0x24 && (c == 0x40 || c == 0x42)) ||
          (a == 0x28 && (c == 0x49 || c == 0x4A))) return true
      }
      i += 1
    }
    false
  }

  /** Strict UTF-8 structural validation over the sample prefix; also
    * reports whether any non-ASCII byte appeared. A multi-byte
    * sequence straddling the SAMPLE CAP is validated against the trail
    * bytes that exist past the cap (the array is in memory — only
    * scoring is capped, never correctness), so a lead-shaped byte at
    * the cap edge of a legacy page cannot buy a blind excuse. A
    * sequence crossing the payload's TRUE end (a WARC-Truncated
    * partial capture of genuine UTF-8 must still detect as UTF-8, not
    * fall through to the legacy scoring) has its available trail
    * bytes validated and the missing ones excused — but ONLY when the
    * stream already produced a COMPLETE multi-byte sequence (a lone
    * trailing 0xE9 is a cp1252 page ending in é, not truncated UTF-8;
    * a genuine partial capture has whole characters before the
    * cut). */
  private def utf8Shape(b: Array[Byte], n: Int): (Boolean, Boolean) = {
    var i = 0
    var hasHigh = false
    var completed = 0
    while (i < n) {
      val x = b(i) & 0xff
      if (x < 0x80) i += 1
      else {
        hasHigh = true
        val need =
          if (x >= 0xC2 && x <= 0xDF) 1
          else if (x >= 0xE0 && x <= 0xEF) 2
          else if (x >= 0xF0 && x <= 0xF4) 3
          else return (false, true)
        // validate every trail byte that EXISTS IN MEMORY — beyond the
        // sample cap the array is still at hand, so a lead-shaped byte
        // at the cap edge is checked against its real continuation
        // instead of excused blindly (a >8 KiB legacy page whose
        // sampled prefix is ASCII except one lead-shaped byte at the
        // cap must not misdetect as utf-8). Only a sequence crossing
        // the payload's TRUE end is excused, and only behind the
        // completed-sequence witness (a lone trailing 0xE9 is a cp1252
        // page ending in é, not truncated UTF-8; a genuine partial
        // capture has whole characters before the cut).
        val avail = math.min(need, b.length - 1 - i)
        var j = 1
        while (j <= avail) {
          val t = b(i + j) & 0xff
          if (t < 0x80 || t > 0xBF) return (false, true)
          // the constrained second bytes (surrogate/overlong exclusion)
          if (j == 1 && ((x == 0xE0 && t < 0xA0) || (x == 0xED && t > 0x9F) ||
            (x == 0xF0 && t < 0x90) || (x == 0xF4 && t > 0x8F)))
            return (false, true)
          j += 1
        }
        if (avail < need) { // crosses the payload's true end
          if (completed == 0) return (false, true)
        } else completed += 1
        i += need + 1
      }
    }
    (true, hasHigh)
  }

  /** Score one candidate's decode of the sample. Only non-ASCII code
    * points enter the denominator — ASCII decodes identically under
    * every claimed charset and carries no signal. */
  private def scoreDecode(decoded: String, key: String,
      anchors: String): Double = {
    var n = 0; var score = 0.0; var anchorHits = 0
    var i = 0
    val isCjk = key == Sjis || key == EucJp || key == Gbk ||
      key == Big5 || key == EucKr
    val isLatin = key == "sb:windows1250" || key == "sb:windows1254" ||
      key == "cp1252"
    while (i < decoded.length) {
      val cp = decoded.codePointAt(i)
      i += Character.charCount(cp)
      if (cp > 0x7F) {
        n += 1
        if (anchors.indexOf(cp) >= 0) anchorHits += 1
        score +=
          (if (cp == Repl) -2.0
          else if (cp >= 0x3040 && cp <= 0x30FF) // kana
            (if (key == Sjis || key == EucJp) 1.0
            else if (isCjk) 0.3 else -0.5)
          else if ((cp >= 0x4E00 && cp <= 0x9FFF) ||
            (cp >= 0x3400 && cp <= 0x4DBF)) // han
            (if (key == Gbk || key == Big5) 1.0
            else if (key == Sjis || key == EucJp) 0.8
            else if (key == EucKr) 0.2 else -0.5)
          else if (cp >= 0xAC00 && cp <= 0xD7A3) // hangul syllables
            (if (key == EucKr) 1.0 else if (isCjk) 0.1 else -0.5)
          else if ((cp >= 0x1100 && cp <= 0x11FF) ||
            (cp >= 0x3130 && cp <= 0x318F)) // jamo
            (if (key == EucKr) 0.2 else -0.5)
          else if (cp >= 0xFF61 && cp <= 0xFF9F) // half-width katakana
            (if (key == Sjis || key == EucJp) 0.3
            else if (isCjk) 0.0 else -0.5)
          else if ((cp >= 0x3000 && cp <= 0x303F) ||
            (cp >= 0xFF00 && cp <= 0xFF60)) // CJK punct / fullwidth
            (if (isCjk) 0.6 else -0.3)
          else if (cp >= 0x0400 && cp <= 0x04FF) { // cyrillic
            val lower = (cp >= 0x0430 && cp <= 0x045F)
            if (key == "sb:windows1251" || key == "sb:koi8r" ||
              key == "sb:koi8u" || key == "sb:iso88595" ||
              key == "sb:maccyrillic") (if (lower) 1.0 else 0.35)
            else -0.5
          } else if (cp >= 0x0370 && cp <= 0x03FF) { // greek
            // lowercase INCLUDING the tonos vowels (ά-ώ, 0x3AC-0x3CE)
            val lower = (cp >= 0x03AC && cp <= 0x03CE)
            if (key == "sb:windows1253")
              (if (lower) 1.0 else 0.35) else -0.5
          } else if (cp >= 0x0590 && cp <= 0x05FF)
            (if (key == "sb:windows1255") 1.0 else -0.5)
          else if ((cp >= 0x0600 && cp <= 0x06FF) ||
            (cp >= 0xFB50 && cp <= 0xFDFF))
            (if (key == "sb:windows1256") 1.0 else -0.5)
          else if (cp >= 0x0E00 && cp <= 0x0E7F)
            (if (key == "sb:windows874") 1.0 else -0.5)
          else if (Character.isLetter(cp))
            (if (isLatin) 1.0 else if (isCjk) -0.3 else 0.2)
          else if (isLatin) -0.3 // symbols where letters should be
          else -0.1)
      }
    }
    if (n == 0) Double.NegativeInfinity
    else score / n + (if (n > 0) 1.0 * anchorHits / n else 0.0)
  }

  /** Detect the charset of an UNDECLARED payload (see the cascade note
    * above). Returns a WHATWG label routable by `decodePayload` —
    * "utf-8", "utf-16le"/"utf-16be" (the BOM-less NUL-alternation
    * lane), "iso-2022-jp", one of [[detectCandidates]], or the
    * "windows-1252" fallback. Deterministic; samples at most
    * `maxBytes`. */
  def detect(bytes: Array[Byte], maxBytes: Int = 8192): String =
    detectScored(bytes, maxBytes)._1

  /** [[detect]] plus its CONFIDENCE — the winning score's margin, so an
    * encoding-quality gate can threshold a coin-flip winner instead of
    * trusting it. Semantics:
    *
    *   - STRUCTURAL lanes (an ISO-2022-JP designator escape, the
    *     BOM-less UTF-16 NUL-alternation majority, structurally-valid
    *     UTF-8 / pure ASCII) are categorical, not scored: margin =
    *     `Double.PositiveInfinity` — any finite threshold passes them.
    *   - A SCORED claim's margin is the winner's lead over the best
    *     DISAGREEING candidate — one whose decode of the sample
    *     differs from the winner's. Candidates that decode the sample
    *     byte-identically (cp1251 vs mac-cyrillic on plain Russian
    *     prose, the three windows Latin pages on French accents) are
    *     not evidence against the claim: the TEXT is right under
    *     either label, and a gate must not discard a perfect decode
    *     over a label coin-flip. The lead floors at the 0.40 claim
    *     threshold when no disagreeing candidate cleared it.
    *   - The windows-1252 FALLBACK (no candidate cleared the threshold,
    *     or fewer than 4 high bytes to measure) has margin 0.0: the
    *     label is a default, not a finding.
    *
    * Deterministic like [[detect]]; one cascade run serves both. */
  def detectScored(bytes: Array[Byte], maxBytes: Int = 8192): (String, Double) = {
    val n = math.min(bytes.length, maxBytes)
    if (hasIso2022Escape(bytes, n)) return ("iso-2022-jp", Double.PositiveInfinity)
    // BOM-less UTF-16 (servers strip marks; real in crawls): mostly-
    // Latin UTF-16 text has a NUL in nearly every code unit — on the
    // high-byte side for LE, low-byte side for BE. No other claimed
    // charset emits NUL runs (NUL is not text in any of them), so a
    // clear one-sided majority of NULs at even/odd positions is
    // decisive; require enough units to not misread binary junk.
    if (n >= 16) {
      var zEven = 0; var zOdd = 0
      var j = 0
      while (j + 1 < n) {
        if (bytes(j) == 0) zEven += 1
        if (bytes(j + 1) == 0) zOdd += 1
        j += 2
      }
      val units = n / 2
      if (zOdd > units * 2 / 3 && zEven < units / 8)
        return ("utf-16le", Double.PositiveInfinity)
      if (zEven > units * 2 / 3 && zOdd < units / 8)
        return ("utf-16be", Double.PositiveInfinity)
    }
    val (utf8Ok, hasHigh) = utf8Shape(bytes, n)
    if (utf8Ok || !hasHigh) return ("utf-8", Double.PositiveInfinity)
    val sample = if (n == bytes.length) bytes
      else java.util.Arrays.copyOf(bytes, n)
    // fewer than 4 high bytes: nothing to measure, take the default
    var high = 0
    var i = 0
    while (i < n) { if ((sample(i) & 0xff) > 0x7F) high += 1; i += 1 }
    if (high < 4) return ("windows-1252", 0.0)
    // the Latin-vs-non-Latin ADJACENCY gate: in Latin-script text the
    // high bytes are accents INSIDE ASCII-letter words (café, příliš —
    // nearly every high byte touches an ASCII letter); in every
    // non-Latin script whole words are high bytes, so a high byte's
    // neighbors are high bytes or word boundaries, almost never ASCII
    // letters. A Latin page must not be claimed by a non-Latin
    // candidate whose letter plane happens to cover the accent
    // positions (é decodes to a perfectly plausible ι under
    // windows-1253, č to a plausible и under windows-1251) — above the
    // gate only the Latin family competes, and the anchor layer picks
    // the flavor. Works at every accent density, unlike a ratio gate:
    // dense Czech and sparse French both read ≈ 1.0 here.
    def asciiLetter(j: Int): Boolean = j >= 0 && j < n && {
      val x = sample(j) & 0xff
      (x >= 'a' && x <= 'z') || (x >= 'A' && x <= 'Z')
    }
    var adj = 0
    i = 0
    while (i < n) {
      if ((sample(i) & 0xff) > 0x7F &&
        (asciiLetter(i - 1) || asciiLetter(i + 1))) adj += 1
      i += 1
    }
    val latinish = adj.toDouble / high > 0.5
    var best = "windows-1252"
    var bestScore = 0.40 // the claim threshold
    var bestHash = 0
    var claimed = false
    // every candidate's (score, decode hash) — the margin compares the
    // winner against the best candidate that DISAGREES on the decode
    val runners = scala.collection.mutable.ArrayBuffer.empty[(Double, Int)]
    detectCandidates.iterator
      .filter(l => !latinish || latinOnly(l))
      .foreach { label =>
      val (decoded, key, anchors) = label match {
        case "windows-1252" =>
          // latin1 + the C1 remap, exactly decodePayload's cp1252 lane
          (decodeCp1252(sample), "cp1252", "")
        case l =>
          val k = labelKey(l)
          val anch = k match {
            case Sjis | EucJp => anchorJa
            case Gbk => anchorZhS
            case Big5 => anchorZhT
            case EucKr => anchorKo
            case "sb:windows1251" | "sb:koi8r" | "sb:iso88595" |
              "sb:maccyrillic" => anchorRu
            case "sb:koi8u" => anchorUk
            case "sb:windows1253" => anchorEl
            case "sb:windows1255" => anchorHe
            case "sb:windows1256" => anchorAr
            case "sb:windows874" => anchorTh
            case "sb:windows1250" => anchor1250
            case "sb:windows1254" => anchor1254
            case _ => ""
          }
          (decode(sample, l), k, anch)
      }
      val sc = scoreDecode(decoded, key, anchors)
      val h = decoded.hashCode
      runners += ((sc, h))
      if (sc > bestScore) {
        bestScore = sc; best = label; bestHash = h; claimed = true
      }
    }
    if (!claimed) return (best, 0.0) // unclaimed: the default, not a finding
    val second = runners.iterator
      .collect { case (sc, h) if h != bestHash => sc }
      .foldLeft(0.40)(math.max)
    (best, bestScore - second)
  }

  // the cp1252 C1 remap pair (kept in sync with Warc.decodePayload's
  // translate lane — 27 defined positions, 5 pass through)
  private val Cp1252Map: String =
    "\u0080\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089\u008a\u008b" +
      "\u008c\u008e\u0091\u0092\u0093\u0094\u0095\u0096\u0097\u0098\u0099" +
      "\u009a\u009b\u009c\u009e\u009f"
  private val Cp1252To: String =
    "\u20ac\u201a\u0192\u201e\u2026\u2020\u2021\u02c6\u2030\u0160\u2039" +
      "\u0152\u017d\u2018\u2019\u201c\u201d\u2022\u2013\u2014\u02dc\u2122" +
      "\u0161\u203a\u0153\u017e\u0178"

  /** Route a DETECTOR label to its decoder — the single label switch
    * both [[decodeDetected]] and the detect-and-decode struct kernel
    * share (one place to extend when a detector lane is added). */
  def decodeAs(bytes: Array[Byte], label: String): String = label match {
    case "utf-8" =>
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    case "utf-16le" =>
      new String(bytes, java.nio.charset.StandardCharsets.UTF_16LE)
    case "utf-16be" =>
      new String(bytes, java.nio.charset.StandardCharsets.UTF_16BE)
    case "windows-1252" => decodeCp1252(bytes)
    case l => decode(bytes, l)
  }

  /** Decode under the DETECTED charset: the one-call composition the
    * no-declaration read path uses ([[detect]] → [[decodeAs]]). */
  def decodeDetected(bytes: Array[Byte]): String =
    decodeAs(bytes, detect(bytes))

  /** Exact windows-1252 decode: latin-1 plus the 27-position C1 remap
    * (kept in sync with `Warc.decodePayload`'s translate lane). */
  def decodeCp1252(bytes: Array[Byte]): String = {
    val lat = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val sb = new java.lang.StringBuilder(lat.length)
    var j = 0
    while (j < lat.length) {
      val c = lat.charAt(j)
      // only the C1 range remaps — everything else (all ASCII, all
      // latin letters) passes with one comparison, no table scan
      if (c >= '\u0080' && c <= '\u009f') {
        val k = Cp1252Map.indexOf(c)
        sb.append(if (k >= 0) Cp1252To(k) else c)
      } else sb.append(c)
      j += 1
    }
    sb.toString
  }

  /** big5 decoder: the two disjoint trail ranges 0x40–0x7E / 0xA1–0xFE. */
  private def decodeBig5(b: Array[Byte], sb: java.lang.StringBuilder): Unit = {
    var lead = 0
    var i = 0
    while (i < b.length) {
      val x = b(i) & 0xff
      if (lead != 0) {
        if ((x >= 0x40 && x <= 0x7E) || (x >= 0xA1 && x <= 0xFE)) {
          val p = (lead - 0x81) * 157 + x - (if (x < 0x7F) 0x40 else 0x62)
          val cp = big5Tab(p)
          sb.appendCodePoint(if (cp != 0) cp else Repl)
          lead = 0
        } else {
          sb.appendCodePoint(Repl)
          lead = 0
          if (x <= 0x7F) i -= 1
        }
      } else if (x <= 0x7F) sb.append(x.toChar)
      else if (x >= 0x81 && x <= 0xFE) lead = x
      else sb.appendCodePoint(Repl)
      i += 1
    }
    if (lead != 0) sb.appendCodePoint(Repl)
  }
}
