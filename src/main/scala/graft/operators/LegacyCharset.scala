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
