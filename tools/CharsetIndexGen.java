import java.io.DataOutputStream;
import java.io.FileOutputStream;
import java.nio.ByteBuffer;
import java.nio.CharBuffer;
import java.nio.charset.Charset;
import java.nio.charset.CharsetDecoder;
import java.nio.charset.CoderResult;
import java.nio.charset.CodingErrorAction;

/**
 * Generator for the legacy-charset index blobs under
 * src/main/resources/charsets/ — the WHATWG-encoding-standard index
 * tables (index jis0208 via the shift_jis and euc-jp pointer spaces,
 * index jis0212, index gb18030's two-byte plane, index big5, index
 * euc-kr), with the CONTENT extracted from the JDK's own charset
 * implementations through the public java.nio.charset API (the same
 * Layer-III-resource pattern as tools/brotli_fixture_gen.c: the tables
 * are published spec data; this tool only dumps the system's copy).
 *
 * Sources: Shift_JIS <- windows-31j (CP932, the superset the web
 * platform's shift_jis label means), EUC-JP <- EUC-JP, GBK <- GBK,
 * Big5 <- Big5-HKSCS (the extension the web's big5 label carries),
 * EUC-KR <- x-windows-949 (the extension the web's euc-kr label
 * carries).
 *
 * Blob format: one unsigned 32-bit big-endian codepoint per pointer
 * (0 = unmapped), pointer spaces exactly as the WHATWG decode
 * algorithms compute them (see graft.operators.LegacyCharset).
 *
 * Run: java tools/CharsetIndexGen.java src/main/resources/charsets
 */
public final class CharsetIndexGen {

  /** Decode one candidate byte sequence; return its single codepoint,
   * or 0 when the decoder errors, leaves input, or yields more than
   * one codepoint (the blob stores single-codepoint mappings only). */
  static int probe(CharsetDecoder dec, byte[] seq) {
    dec.reset();
    ByteBuffer in = ByteBuffer.wrap(seq);
    CharBuffer out = CharBuffer.allocate(8);
    CoderResult r = dec.decode(in, out, true);
    if (r.isError() || in.hasRemaining()) return 0;
    r = dec.flush(out);
    if (r.isError()) return 0;
    out.flip();
    String s = out.toString();
    if (s.codePointCount(0, s.length()) != 1) return 0;
    return s.codePointAt(0);
  }

  static CharsetDecoder dec(String name) {
    return Charset.forName(name).newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT);
  }

  static void write(String dir, String file, int[] table) throws Exception {
    try (DataOutputStream o = new DataOutputStream(
        new FileOutputStream(dir + "/" + file))) {
      for (int cp : table) o.writeInt(cp);
    }
    System.out.println(file + ": " + table.length + " pointers");
  }

  public static void main(String[] args) throws Exception {
    String dir = args.length > 0 ? args[0] : "src/main/resources/charsets";
    new java.io.File(dir).mkdirs();

    // shift_jis: leads 0x81-0x9F / 0xE0-0xFC, trails 0x40-0xFC minus
    // 0x7F; pointer = (lead - (lead<0xA0?0x81:0xC1))*188 + trail
    // - (trail<0x7F?0x40:0x41)  -> 60*188 pointers
    {
      CharsetDecoder d = dec("windows-31j");
      int[] t = new int[60 * 188];
      for (int lead = 0x81; lead <= 0xFC; lead++) {
        if (lead > 0x9F && lead < 0xE0) continue;
        for (int trail = 0x40; trail <= 0xFC; trail++) {
          if (trail == 0x7F) continue;
          int p = (lead - (lead < 0xA0 ? 0x81 : 0xC1)) * 188
            + trail - (trail < 0x7F ? 0x40 : 0x41);
          t[p] = probe(d, new byte[]{(byte) lead, (byte) trail});
        }
      }
      write(dir, "sjis.tab", t);
    }

    // euc-jp jis0208: leads/trails 0xA1-0xFE; pointer =
    // (lead-0xA1)*94 + trail-0xA1 -> 94*94
    {
      CharsetDecoder d = dec("EUC-JP");
      int[] t208 = new int[94 * 94];
      int[] t212 = new int[94 * 94];
      for (int lead = 0xA1; lead <= 0xFE; lead++)
        for (int trail = 0xA1; trail <= 0xFE; trail++) {
          int p = (lead - 0xA1) * 94 + trail - 0xA1;
          t208[p] = probe(d, new byte[]{(byte) lead, (byte) trail});
          t212[p] = probe(d, new byte[]{(byte) 0x8F, (byte) lead, (byte) trail});
        }
      write(dir, "jis0208.tab", t208);
      write(dir, "jis0212.tab", t212);
    }

    // gbk (gb18030 two-byte plane): lead 0x81-0xFE, trail 0x40-0xFE
    // minus 0x7F; pointer = (lead-0x81)*190 + trail
    // - (trail<0x7F?0x40:0x41) -> 126*190. Probed through GB18030, not
    // GBK: the 2000 revision moved a handful of cells (e.g. 0xA8BC ḿ)
    // off the PUA, and the WHATWG index means the revised plane.
    {
      CharsetDecoder d = dec("GB18030");
      int[] t = new int[126 * 190];
      for (int lead = 0x81; lead <= 0xFE; lead++)
        for (int trail = 0x40; trail <= 0xFE; trail++) {
          if (trail == 0x7F) continue;
          int p = (lead - 0x81) * 190 + trail - (trail < 0x7F ? 0x40 : 0x41);
          t[p] = probe(d, new byte[]{(byte) lead, (byte) trail});
        }
      write(dir, "gbk.tab", t);
    }

    // big5: lead 0x81-0xFE, trail 0x40-0x7E / 0xA1-0xFE; pointer =
    // (lead-0x81)*157 + trail - (trail<0x7F?0x40:0x62) -> 126*157
    {
      CharsetDecoder d = dec("Big5-HKSCS");
      int[] t = new int[126 * 157];
      for (int lead = 0x81; lead <= 0xFE; lead++)
        for (int trail = 0x40; trail <= 0xFE; trail++) {
          if (trail > 0x7E && trail < 0xA1) continue;
          int p = (lead - 0x81) * 157 + trail - (trail < 0x7F ? 0x40 : 0x62);
          t[p] = probe(d, new byte[]{(byte) lead, (byte) trail});
        }
      write(dir, "big5.tab", t);
    }

    // euc-kr: lead 0x81-0xFE, trail 0x41-0xFE; pointer =
    // (lead-0x81)*190 + trail-0x41 -> 126*190
    {
      CharsetDecoder d = dec("x-windows-949");
      int[] t = new int[126 * 190];
      for (int lead = 0x81; lead <= 0xFE; lead++)
        for (int trail = 0x41; trail <= 0xFE; trail++) {
          int p = (lead - 0x81) * 190 + trail - 0x41;
          t[p] = probe(d, new byte[]{(byte) lead, (byte) trail});
        }
      write(dir, "euckr.tab", t);
    }

    // gb18030 FOUR-byte plane: the WHATWG "gb18030 ranges" table —
    // (pointer, codepoint) anchors of the linear runs that map the
    // 4-byte pointer space onto the unmapped-codepoint space. Derived
    // by probing every 4-byte sequence through the JDK's GB18030
    // decoder and emitting a new anchor wherever (codepoint - pointer)
    // changes; runtime decode is a binary search + add. Pointer =
    // ((b1-0x81)*10 + b2-0x30)*1260 + (b3-0x81)*10 + b4-0x30.
    {
      CharsetDecoder d = dec("GB18030");
      java.util.ArrayList<int[]> anchors = new java.util.ArrayList<>();
      long lastDelta = Long.MIN_VALUE; // MIN_VALUE = currently unmapped
      for (int b1 = 0x81; b1 <= 0xFE; b1++)
        for (int b2 = 0x30; b2 <= 0x39; b2++)
          for (int b3 = 0x81; b3 <= 0xFE; b3++)
            for (int b4 = 0x30; b4 <= 0x39; b4++) {
              int p = ((b1 - 0x81) * 10 + b2 - 0x30) * 1260
                + (b3 - 0x81) * 10 + b4 - 0x30;
              int cp = probe(d, new byte[]{(byte) b1, (byte) b2,
                (byte) b3, (byte) b4});
              if (cp == 0) {
                // a gap gets its own zero anchor so the runtime's
                // binary search never extends the previous run into it
                if (lastDelta != Long.MIN_VALUE) anchors.add(new int[]{p, 0});
                lastDelta = Long.MIN_VALUE;
                continue;
              }
              long delta = (long) cp - p;
              if (delta != lastDelta) {
                anchors.add(new int[]{p, cp});
                lastDelta = delta;
              }
            }
      int[] flat = new int[anchors.size() * 2];
      for (int i = 0; i < anchors.size(); i++) {
        flat[2 * i] = anchors.get(i)[0];
        flat[2 * i + 1] = anchors.get(i)[1];
      }
      write(dir, "gb18030_ranges.tab", flat);
    }

    // the WHATWG single-byte family: 128 pointers each (0x80-0xFF;
    // 0x00-0x7F is ASCII in every single-byte encoding the standard
    // defines). iso-8859-10 and -14 are NOT emitted: this JDK carries
    // no table for them, and the runtime documents the refusal.
    String[][] single = {
      {"sb_windows874.tab", "x-windows-874"},
      {"sb_windows1250.tab", "windows-1250"},
      {"sb_windows1251.tab", "windows-1251"},
      {"sb_windows1253.tab", "windows-1253"},
      {"sb_windows1254.tab", "windows-1254"},
      {"sb_windows1255.tab", "windows-1255"},
      {"sb_windows1256.tab", "windows-1256"},
      {"sb_windows1257.tab", "windows-1257"},
      {"sb_windows1258.tab", "windows-1258"},
      {"sb_koi8r.tab", "KOI8-R"},
      {"sb_koi8u.tab", "KOI8-U"},
      {"sb_iso88592.tab", "ISO-8859-2"},
      {"sb_iso88593.tab", "ISO-8859-3"},
      {"sb_iso88594.tab", "ISO-8859-4"},
      {"sb_iso88595.tab", "ISO-8859-5"},
      {"sb_iso88596.tab", "ISO-8859-6"},
      {"sb_iso88597.tab", "ISO-8859-7"},
      {"sb_iso88598.tab", "ISO-8859-8"},
      {"sb_iso885913.tab", "ISO-8859-13"},
      {"sb_iso885915.tab", "ISO-8859-15"},
      {"sb_iso885916.tab", "ISO-8859-16"},
      {"sb_maccyrillic.tab", "x-MacCyrillic"},
    };
    for (String[] sc : single) {
      CharsetDecoder d = dec(sc[1]);
      int[] t = new int[128];
      for (int b = 0x80; b <= 0xFF; b++)
        t[b - 0x80] = probe(d, new byte[]{(byte) b});
      write(dir, sc[0], t);
    }
  }
}
