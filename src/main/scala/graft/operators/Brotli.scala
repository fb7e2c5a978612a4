package graft.operators

/** Pure-JVM Brotli (RFC 7932) — the web's second compression codec.
  * `Content-Encoding: br` is ubiquitous on the live web, so a crawl
  * pipeline without it silently mis-handles a large slice of archived
  * responses. No Spark-shipped jar provides it (aircompressor carries
  * zstd/lz4/snappy only), so the format is implemented here from the
  * RFC: stream/meta-block framing, simple and complex prefix codes
  * (with the code-length code and its repeat accumulation), block
  * switching, context modes and context maps, the distance ring
  * buffer and postfix/direct distance codes, and static-dictionary
  * references with the word transforms.
  *
  * Three spec-published data blobs ride as checked-in resources —
  * content identical to RFC 7932's appendices, dumped from the
  * reference implementation's PUBLIC API (`BrotliGetDictionary`,
  * `BrotliGetTransforms`, the §7.1 context table) by
  * `tools/brotli_fixture_gen.c`, never derived from its code:
  *   - `dictionary.bin` — the 122,784-byte static dictionary
  *     (Appendix A). Its per-length offset table is NOT stored: it is
  *     recomputed from the §8 NDBITS formula and checked against the
  *     data size, so a corrupted resource fails at class-load.
  *   - `transforms.tsv` — the 121 (prefix, type, suffix) word
  *     transforms (Appendix B).
  *   - `context.bin` — the §7.1 literal-context lookup tables (the
  *     two 256-byte luts for each of the four context modes).
  *
  * Decoding is STRICT: malformed framing, over/under-subscribed
  * prefix codes, invalid transforms, or output past `maxOut` (the
  * zip-bomb guard, the [[Codec]] contract) throw
  * IllegalArgumentException — the tolerant per-record bridges own the
  * catch. The decoder is verified against golden vectors produced by
  * the reference encoder at qualities 0–11 and window sizes 10–24
  * (BrotliSpec), including dictionary-transform-heavy small-text
  * streams.
  *
  * [[compress]] is the staging/oracle twin, NOT a ratio encoder: it
  * emits valid streams through the compressed meta-block path (one
  * insert-covers-all command, a complex 8-bit flat literal code — so
  * oracle round-trips exercise the code-length code, not just stored
  * blocks) with an uncompressed-meta-block variant for framing
  * coverage. Real compression belongs to the serving side; the
  * pipeline only ever DECODES at scale. */
object Brotli {

  // ---- spec-published resources -------------------------------------------

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/brotli/$name")
    require(in != null, s"brotli: missing resource $name")
    try in.readAllBytes() finally in.close()
  }

  /** RFC 7932 §8: word-count bits per word length 4..24 (0 = no words
    * of that length). The offsets are derived, then checked. */
  private val SizeBitsByLength: Array[Int] = Array(
    0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8,
    7, 7, 8, 7, 7, 6, 6, 5, 5)

  private lazy val Dictionary: Array[Byte] = resource("dictionary.bin")

  private lazy val OffsetsByLength: Array[Int] = {
    val off = new Array[Int](SizeBitsByLength.length + 1)
    var i = 0
    while (i < SizeBitsByLength.length) {
      off(i + 1) = off(i) +
        (if (SizeBitsByLength(i) == 0) 0 else i << SizeBitsByLength(i))
      i += 1
    }
    require(off.last == Dictionary.length,
      s"brotli: dictionary resource size ${Dictionary.length} != derived ${off.last}")
    off
  }

  /** (prefixBytes, transformType, suffixBytes) — RFC 7932 Appendix B.
    * Types: 0 identity, 1..9 omit-last-N, 10 uppercase-first,
    * 11 uppercase-all, 12..20 omit-first-N. */
  private lazy val Transforms: Array[(Array[Byte], Int, Array[Byte])] = {
    def unhex(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val rows = new String(resource("transforms.tsv"),
      java.nio.charset.StandardCharsets.US_ASCII)
      .split("\n").filter(_.nonEmpty).map { line =>
        val Array(p, t, sfx) = line.split("\t", -1)
        (unhex(p), t.toInt, unhex(sfx))
      }
    require(rows.length == 121, s"brotli: ${rows.length} transforms != 121")
    rows
  }

  /** §7.1 context tables: for mode m, lut0 at m*512 (indexed by the
    * last output byte), lut1 at m*512+256 (second-to-last); the
    * context ID is `lut0(p1) | lut1(p2)`. */
  private lazy val ContextLut: Array[Byte] = {
    val t = resource("context.bin")
    require(t.length == 2048, "brotli: context table resource size")
    t
  }

  // ---- derived constant tables (formulas from §5 and §6) ------------------

  private val InsertExtra = Array(0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 5, 6, 7, 8, 9, 10, 12, 14, 24)
  private val InsertBase: Array[Int] = {
    val b = new Array[Int](24)
    var i = 1
    while (i < 24) { b(i) = b(i - 1) + (1 << InsertExtra(i - 1)); i += 1 }
    b
  }
  private val CopyExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2,
    3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 24)
  private val CopyBase: Array[Int] = {
    val b = new Array[Int](24)
    b(0) = 2
    var i = 1
    while (i < 24) { b(i) = b(i - 1) + (1 << CopyExtra(i - 1)); i += 1 }
    b
  }
  /** §6: block-count code (26 symbols). */
  private val BlockLenExtra = Array(2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4,
    5, 5, 5, 5, 6, 6, 7, 8, 9, 10, 11, 12, 13, 24)
  private val BlockLenBase: Array[Int] = {
    val b = new Array[Int](26)
    b(0) = 1
    var i = 1
    while (i < 26) { b(i) = b(i - 1) + (1 << BlockLenExtra(i - 1)); i += 1 }
    b
  }
  /** §5: the 704-symbol insert-and-copy cell tables (cells ≥ 2). */
  private val InsRangeLut = Array(0, 0, 8, 8, 0, 16, 8, 16, 16)
  private val CpyRangeLut = Array(0, 8, 0, 8, 16, 0, 16, 8, 16)
  /** §3.5: code-length-code symbol order. */
  private val ClCodeOrder = Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9,
    10, 11, 12, 13, 14, 15)

  private def err(msg: String): Nothing =
    throw new IllegalArgumentException(s"brotli: $msg")

  // ---- bit reader ----------------------------------------------------------

  private final class Reader(b: Array[Byte]) {
    private val nBits: Long = b.length.toLong * 8
    var pos: Long = 0
    /** set when any CONSUMED bit lay past the last real byte — the
      * zero-padding peek() supplies can then have silently completed a
      * symbol a truncated final byte should have failed; atCleanEnd
      * rejects such a decode even when it "succeeded" */
    private var overran = false

    /** Peek up to 24 bits (virtual zero-padding past the end — the
      * final position check catches actual overruns). */
    def peek(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val p = pos + i
        if (p < nBits)
          v |= (((b((p >> 3).toInt) >> (p & 7).toInt) & 1) << i)
        i += 1
      }
      v
    }
    def skip(n: Int): Unit = {
      pos += n
      if (pos > nBits) overran = true
      if (pos > nBits + 7) err("read past end of stream")
    }
    def read(n: Int): Int = { val v = peek(n); skip(n); v }
    def alignByte(): Unit = { pos = (pos + 7) & ~7L }
    /** true when nothing was consumed past the last byte and only zero
      * filler bits remain in the final byte */
    def atCleanEnd: Boolean = !overran && (pos >= nBits ||
      ((pos + 7) & ~7L) >= nBits && peek((nBits - pos).toInt) == 0)
    def byteAt(i: Long): Byte =
      if (i < b.length) b(i.toInt) else err("read past end of stream")
  }

  // ---- prefix codes --------------------------------------------------------

  /** Flat decode table: index = next `bits` stream bits (LSB-first),
    * entry = (len << 16) | symbol; bits == 0 → constant symbol. */
  private final class Tree(val table: Array[Int], val bits: Int)

  private def readSymbol(t: Tree, r: Reader): Int = {
    if (t.bits == 0) return t.table(0)
    val e = t.table(r.peek(t.bits))
    val len = e >>> 16
    if (len == 0) err("invalid prefix code bits")
    r.skip(len)
    e & 0xffff
  }

  private def singleTree(sym: Int) = new Tree(Array(sym), 0)

  /** Canonical code → flat table. Codes are MSB-first in the spec and
    * the stream is read LSB-first, so table indexes use bit-reversed
    * codes (the reference implementation's convention). */
  private def buildTree(lengths: Array[Int]): Tree = {
    var maxLen = 0
    var used = 0
    var only = -1
    var space = 0
    var i = 0
    while (i < lengths.length) {
      val l = lengths(i)
      if (l > 0) {
        if (l > 15) err("code length > 15")
        if (l > maxLen) maxLen = l
        used += 1; only = i
        space += 32768 >> l
      }
      i += 1
    }
    if (used == 0) err("empty prefix code")
    if (used == 1) return singleTree(only)
    if (space != 32768) err("prefix code not complete")
    val counts = new Array[Int](16)
    i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) counts(lengths(i)) += 1
      i += 1
    }
    val nextCode = new Array[Int](16)
    var code = 0
    var l = 1
    while (l <= maxLen) {
      code = (code + counts(l - 1)) << 1
      nextCode(l) = code
      l += 1
    }
    val table = new Array[Int](1 << maxLen)
    i = 0
    while (i < lengths.length) {
      val len = lengths(i)
      if (len > 0) {
        val c = nextCode(len); nextCode(len) += 1
        // reverse `len` bits
        var rev = 0
        var k = 0
        while (k < len) { rev = (rev << 1) | ((c >> k) & 1); k += 1 }
        var idx = rev
        val step = 1 << len
        while (idx < table.length) {
          table(idx) = (len << 16) | i
          idx += step
        }
      }
      i += 1
    }
    new Tree(table, maxLen)
  }

  private def alphabetBits(size: Int): Int =
    32 - Integer.numberOfLeadingZeros(size - 1)

  /** §3.4 / §3.5: one serialized prefix code over `alphabet` symbols. */
  private def readPrefixCode(alphabet: Int, r: Reader): Tree = {
    val hskip = r.read(2)
    if (hskip == 1) {
      // simple code: 1..4 listed symbols
      val nsym = r.read(2) + 1
      val abits = alphabetBits(alphabet)
      val syms = new Array[Int](nsym)
      var i = 0
      while (i < nsym) {
        val s = r.read(abits)
        if (s >= alphabet) err("simple code symbol out of alphabet")
        var j = 0
        while (j < i) { if (syms(j) == s) err("duplicate simple code symbol"); j += 1 }
        syms(i) = s
        i += 1
      }
      val lengths = new Array[Int](alphabet)
      nsym match {
        case 1 => return singleTree(syms(0))
        case 2 =>
          java.util.Arrays.sort(syms)
          lengths(syms(0)) = 1; lengths(syms(1)) = 1
        case 3 =>
          // first listed symbol takes the 1-bit code; the 2-bit pair
          // is canonical by symbol order
          if (syms(1) > syms(2)) { val t = syms(1); syms(1) = syms(2); syms(2) = t }
          lengths(syms(0)) = 1; lengths(syms(1)) = 2; lengths(syms(2)) = 2
        case _ =>
          if (r.read(1) == 1) { // tree-select: depths 1,2,3,3
            if (syms(2) > syms(3)) { val t = syms(2); syms(2) = syms(3); syms(3) = t }
            lengths(syms(0)) = 1; lengths(syms(1)) = 2
            lengths(syms(2)) = 3; lengths(syms(3)) = 3
          } else { // flat 2,2,2,2 — canonical by symbol order
            java.util.Arrays.sort(syms)
            syms.foreach(s => lengths(s) = 2)
          }
      }
      // canonical assignment: for nsym 3 / deep-4 the 1-bit symbol must
      // come FIRST in code order; buildTree assigns codes by (len,
      // symbol), which matches because shorter lengths sort first
      buildTree(lengths)
    } else {
      // complex code: code-length code with the fixed §3.5 prefix code
      val clLens = new Array[Int](18)
      var space = 0
      var numCodes = 0
      var i = hskip
      while (i < 18 && space < 32) {
        // fixed code: 00→0, 10→4, 01→3, 011→2, 0111→1, 1111→5
        val v = r.peek(4)
        val (len, bits) = (v & 3) match {
          case 0 => (0, 2)
          case 1 => (4, 2)
          case 2 => (3, 2)
          case _ => ((v >> 2) & 3) match {
            case 0 | 2 => (2, 3)
            case 1 => (1, 4)
            case _ => (5, 4)
          }
        }
        r.skip(bits)
        clLens(ClCodeOrder(i)) = len
        if (len != 0) { space += 32 >> len; numCodes += 1 }
        i += 1
      }
      if (space > 32) err("code-length code over-subscribed")
      if (numCodes != 1 && space != 32) err("code-length code incomplete")
      val clTree =
        if (numCodes == 1) singleTree(clLens.indexWhere(_ != 0))
        else buildTree(clLens)

      // symbol code lengths with 16/17 repeat accumulation
      val lengths = new Array[Int](alphabet)
      var symbol = 0
      var prevLen = 8
      var repeat = 0
      var repeatLen = 0
      var total = 0
      while (symbol < alphabet && total < 32768) {
        val cl = readSymbol(clTree, r)
        if (cl < 16) {
          repeat = 0
          lengths(symbol) = cl
          if (cl != 0) { prevLen = cl; total += 32768 >> cl }
          symbol += 1
        } else {
          val extraBits = cl - 14 // 2 for 16, 3 for 17
          val newLen = if (cl == 16) prevLen else 0
          if (repeatLen != newLen) { repeat = 0; repeatLen = newLen }
          val oldRepeat = repeat
          if (repeat > 0) repeat = (repeat - 2) << extraBits
          repeat += r.read(extraBits) + 3
          val delta = repeat - oldRepeat
          if (symbol + delta > alphabet) err("repeat past alphabet end")
          var k = 0
          while (k < delta) {
            lengths(symbol) = repeatLen
            if (repeatLen != 0) total += 32768 >> repeatLen
            symbol += 1
            k += 1
          }
        }
      }
      if (total > 32768) err("prefix code over-subscribed")
      buildTree(lengths)
    }
  }

  // ---- §6 / §7.3: block types and context maps -----------------------------

  /** 1..256, the NBLTYPES/NTREES encoding. */
  private def readVarLenUint8(r: Reader): Int =
    if (r.read(1) == 0) 1
    else {
      val n = r.read(3)
      (1 << n) + 1 + r.read(n)
    }

  private def readBlockLen(t: Tree, r: Reader): Int = {
    val s = readSymbol(t, r)
    if (s >= 26) err("block length symbol out of range")
    BlockLenBase(s) + r.read(BlockLenExtra(s))
  }

  private final class BlockState(val count: Int, r: Reader) {
    val typeTree: Tree = if (count >= 2) readPrefixCode(count + 2, r) else null
    val lenTree: Tree = if (count >= 2) readPrefixCode(26, r) else null
    var cur = 0
    var prev = 1
    var remaining: Int = if (count >= 2) readBlockLen(lenTree, r) else Int.MaxValue
    def switchType(r2: Reader): Unit = {
      val s = readSymbol(typeTree, r2)
      val next =
        if (s == 0) prev
        else if (s == 1) (cur + 1) % count
        else s - 2
      prev = cur
      cur = next
      remaining = readBlockLen(lenTree, r2)
    }
  }

  private def readContextMap(size: Int, nTrees: Int, r: Reader): Array[Byte] = {
    val map = new Array[Byte](size)
    if (nTrees < 2) return map
    val rleMax = if (r.read(1) == 1) r.read(4) + 1 else 0
    val tree = readPrefixCode(rleMax + nTrees, r)
    var i = 0
    while (i < size) {
      val s = readSymbol(tree, r)
      if (s == 0) { map(i) = 0; i += 1 }
      else if (s <= rleMax) {
        var reps = (1 << s) + r.read(s)
        if (i + reps > size) err("context map zero-run past end")
        while (reps > 0) { map(i) = 0; i += 1; reps -= 1 }
      } else {
        val v = s - rleMax
        if (v >= nTrees) err("context map value out of range")
        map(i) = v.toByte
        i += 1
      }
    }
    if (r.read(1) == 1) { // inverse move-to-front
      val mtf = new Array[Byte](256)
      var k = 0
      while (k < 256) { mtf(k) = k.toByte; k += 1 }
      i = 0
      while (i < size) {
        val idx = map(i) & 0xff
        val v = mtf(idx)
        var j = idx
        while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
        mtf(0) = v
        map(i) = v
        i += 1
      }
    }
    map
  }

  // ---- §8: dictionary word transforms --------------------------------------

  /** Uppercase one UTF-8 "character" at `at` per the §8 ferment rule;
    * returns the bytes advanced. */
  private def ferment(w: Array[Byte], at: Int): Int = {
    val c = w(at) & 0xff
    if (c < 0xc0) {
      if (c >= 'a' && c <= 'z') w(at) = (c ^ 32).toByte
      1
    } else if (c < 0xe0) {
      if (at + 1 < w.length) w(at + 1) = ((w(at + 1) & 0xff) ^ 32).toByte
      2
    } else {
      if (at + 2 < w.length) w(at + 2) = ((w(at + 2) & 0xff) ^ 5).toByte
      3
    }
  }

  private def transformWord(word: Array[Byte], id: Int): Array[Byte] = {
    val (prefix, typ, suffix) = Transforms(id)
    var w = word
    if (typ >= 12) { // omit-first-N
      val n = math.min(typ - 11, w.length)
      w = java.util.Arrays.copyOfRange(w, n, w.length)
    } else if (typ >= 1 && typ <= 9) { // omit-last-N
      val n = math.min(typ, w.length)
      w = java.util.Arrays.copyOfRange(w, 0, w.length - n)
    } else if (typ == 10 || typ == 11) {
      w = w.clone()
      var i = 0
      val end = if (typ == 10) math.min(1, w.length) else w.length
      while (i < end) i += ferment(w, i)
    } else if (typ != 0) err(s"unknown transform type $typ")
    val out = new Array[Byte](prefix.length + w.length + suffix.length)
    System.arraycopy(prefix, 0, out, 0, prefix.length)
    System.arraycopy(w, 0, out, prefix.length, w.length)
    System.arraycopy(suffix, 0, out, prefix.length + w.length, suffix.length)
    out
  }

  // ---- decoder --------------------------------------------------------------

  /** Decode a complete Brotli stream; `maxOut` (-1 = unbounded) is the
    * zip-bomb guard of the [[Codec]] contract. */
  def decompress(b: Array[Byte], maxOut: Long = -1L): Array[Byte] = {
    val r = new Reader(b)
    // §9.1 WBITS
    val wbits =
      if (r.read(1) == 0) 16
      else {
        val n = r.read(3)
        if (n != 0) 17 + n
        else {
          val m = r.read(3)
          if (m == 1) err("reserved WBITS pattern (large-window extension)")
          else if (m != 0) 8 + m
          else 17
        }
      }
    val windowSize = (1 << wbits) - 16

    var out = new Array[Byte](math.min(1 << 16, math.max(64, b.length * 4)))
    var outLen = 0
    def ensure(extra: Int): Unit = {
      if (maxOut >= 0 && outLen.toLong + extra > maxOut)
        throw new java.io.IOException(
          s"brotli: output exceeds $maxOut bytes (bomb guard)")
      if (outLen.toLong + extra > Int.MaxValue - 8) err("output exceeds 2 GiB")
      if (outLen + extra > out.length) {
        var n = out.length
        while (n < outLen + extra) n = n << 1
        out = java.util.Arrays.copyOf(out, n)
      }
    }

    // distance ring buffer persists across meta-blocks
    val distRb = Array(16, 15, 11, 4)
    var distRbIdx = 0

    var isLast = false
    while (!isLast) {
      // ---- §9.2 meta-block header
      isLast = r.read(1) == 1
      if (isLast && r.read(1) == 1) { // ISLASTEMPTY
        // stream ends; filler bits checked below
      } else {
        val mnibCode = r.read(2)
        val mnibbles = if (mnibCode == 3) 0 else mnibCode + 4
        if (mnibbles == 0) { // metadata block
          if (isLast) err("metadata block cannot be last")
          if (r.read(1) != 0) err("metadata reserved bit set")
          val skipBytes = r.read(2)
          val skipLen =
            if (skipBytes == 0) 0
            else {
              val v = r.read(8 * skipBytes)
              if (skipBytes > 1 && (v >>> (8 * (skipBytes - 1))) == 0)
                err("metadata length not minimally encoded")
              v + 1
            }
          if ((r.pos & 7) != 0 && r.peek((8 - (r.pos & 7)).toInt) != 0)
            err("nonzero filler before metadata")
          r.alignByte()
          var k = 0
          while (k < skipLen) { r.byteAt(r.pos >> 3); r.pos += 8; k += 1 }
        } else {
          var mlen = r.read(4 * mnibbles) + 1
          if (mnibbles > 4 && (mlen - 1) >>> (4 * (mnibbles - 1)) == 0)
            err("MLEN not minimally encoded")
          val uncompressed = !isLast && r.read(1) == 1
          if (uncompressed) {
            r.alignByte()
            ensure(mlen)
            var k = 0
            while (k < mlen) {
              out(outLen) = r.byteAt(r.pos >> 3); r.pos += 8
              outLen += 1; k += 1
            }
          } else {
            // ---- compressed body: the three block-type categories
            val bsL = new BlockState(readVarLenUint8(r), r)
            val bsI = new BlockState(readVarLenUint8(r), r)
            val bsD = new BlockState(readVarLenUint8(r), r)
            val npostfix = r.read(2)
            val ndirect = r.read(4) << npostfix
            val contextModes = new Array[Int](bsL.count)
            var i = 0
            while (i < bsL.count) { contextModes(i) = r.read(2); i += 1 }
            val nTreesL = readVarLenUint8(r)
            val cmapL = readContextMap(64 * bsL.count, nTreesL, r)
            val nTreesD = readVarLenUint8(r)
            val cmapD = readContextMap(4 * bsD.count, nTreesD, r)
            val litTrees = Array.fill(nTreesL)(readPrefixCode(256, r))
            val cmdTrees = Array.fill(bsI.count)(readPrefixCode(704, r))
            val distAlphabet = 16 + ndirect + (48 << npostfix)
            val distTrees = Array.fill(nTreesD)(readPrefixCode(distAlphabet, r))

            // ---- command loop
            while (mlen > 0) {
              if (bsI.remaining == 0) bsI.switchType(r)
              bsI.remaining -= 1
              val cmd = readSymbol(cmdTrees(bsI.cur), r)
              var insCode = 0
              var cpyCode = 0
              var implicitDist0 = false
              if (cmd < 128) {
                implicitDist0 = true
                insCode = (cmd >> 3) & 7
                cpyCode = (cmd & 7) + ((cmd >> 6) << 3)
              } else {
                val t = (cmd - 128) >> 6
                insCode = InsRangeLut(t) + ((cmd >> 3) & 7)
                cpyCode = CpyRangeLut(t) + (cmd & 7)
              }
              var insLen = InsertBase(insCode) + r.read(InsertExtra(insCode))
              val cpyLen = CopyBase(cpyCode) + r.read(CopyExtra(cpyCode))

              if (insLen > mlen) err("insert length past meta-block end")
              mlen -= insLen
              ensure(insLen)
              while (insLen > 0) {
                if (bsL.remaining == 0) bsL.switchType(r)
                bsL.remaining -= 1
                val p1 = if (outLen > 0) out(outLen - 1) & 0xff else 0
                val p2 = if (outLen > 1) out(outLen - 2) & 0xff else 0
                val mode = contextModes(bsL.cur)
                val ctx = (ContextLut(mode * 512 + p1) |
                  ContextLut(mode * 512 + 256 + p2)) & 0xff
                val tree = litTrees(cmapL(bsL.cur * 64 + ctx) & 0xff)
                out(outLen) = readSymbol(tree, r).toByte
                outLen += 1
                insLen -= 1
              }
              if (mlen > 0) {
                val maxDistance = math.min(outLen.toLong, windowSize.toLong).toInt
                var distance = 0
                var dcode = 0
                if (implicitDist0) {
                  distance = distRb((distRbIdx + 3) & 3)
                } else {
                  if (bsD.remaining == 0) bsD.switchType(r)
                  bsD.remaining -= 1
                  val dctx = if (cpyLen > 4) 3 else cpyLen - 2
                  val tree = distTrees(cmapD(bsD.cur * 4 + dctx) & 0xff)
                  dcode = readSymbol(tree, r)
                  if (dcode < 16) {
                    // §4 short codes off the ring buffer
                    dcode match {
                      case 0 => distance = distRb((distRbIdx + 3) & 3)
                      case 1 => distance = distRb((distRbIdx + 2) & 3)
                      case 2 => distance = distRb((distRbIdx + 1) & 3)
                      case 3 => distance = distRb(distRbIdx & 3)
                      case k =>
                        val base =
                          if (k < 10) distRb((distRbIdx + 3) & 3)
                          else distRb((distRbIdx + 2) & 3)
                        val off = ((k - 4) % 6) match {
                          case 0 => -1
                          case 1 => 1
                          case 2 => -2
                          case 3 => 2
                          case 4 => -3
                          case _ => 3
                        }
                        distance = base + off
                        if (distance <= 0) err("short distance code underflow")
                    }
                  } else if (dcode < 16 + ndirect) {
                    distance = dcode - 15
                  } else {
                    val d = dcode - ndirect - 16
                    val nbits = 1 + (d >> (npostfix + 1))
                    val hcode = (d >> npostfix) & 1
                    val postfix = d & ((1 << npostfix) - 1)
                    val extra = r.read(nbits)
                    val offset = ((2 + hcode) << nbits) - 4
                    distance = ((offset + extra) << npostfix) + postfix + ndirect + 1
                  }
                }
                if (distance <= maxDistance) {
                  // backward reference (overlap allowed)
                  if (cpyLen > mlen) err("copy length past meta-block end")
                  mlen -= cpyLen
                  ensure(cpyLen)
                  var k = 0
                  var src = outLen - distance
                  while (k < cpyLen) {
                    out(outLen) = out(src)
                    outLen += 1; src += 1; k += 1
                  }
                  if (dcode != 0) {
                    distRb(distRbIdx & 3) = distance
                    distRbIdx += 1
                  }
                } else {
                  // §8 static dictionary reference
                  if (cpyLen < 4 || cpyLen > 24 ||
                    SizeBitsByLength(cpyLen) == 0)
                    err(s"dictionary reference with word length $cpyLen")
                  val address = distance - maxDistance - 1
                  val ndbits = SizeBitsByLength(cpyLen)
                  val index = address & ((1 << ndbits) - 1)
                  val tid = address >> ndbits
                  if (tid >= 121) err(s"dictionary transform $tid out of range")
                  val base = OffsetsByLength(cpyLen) + index * cpyLen
                  val word = java.util.Arrays.copyOfRange(
                    Dictionary, base, base + cpyLen)
                  val o = transformWord(word, tid)
                  if (o.length > mlen) err("dictionary word past meta-block end")
                  mlen -= o.length
                  ensure(o.length)
                  System.arraycopy(o, 0, out, outLen, o.length)
                  outLen += o.length
                }
              }
            }
          }
        }
      }
    }
    if (!r.atCleanEnd) err("trailing bytes or nonzero filler after last meta-block")
    java.util.Arrays.copyOf(out, outLen)
  }

  // ---- staging/oracle encoder ----------------------------------------------

  private final class Writer {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def writeBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nbits
        nbits += 1
        if (nbits == 8) { buf.write(cur); cur = 0; nbits = 0 }
        i += 1
      }
    }
    /** prefix-code bits are written MSB of the code first */
    def writeCode(code: Int, len: Int): Unit = {
      var k = len - 1
      while (k >= 0) { writeBits((code >> k) & 1, 1); k -= 1 }
    }
    def alignByte(): Unit = if (nbits > 0) { buf.write(cur); cur = 0; nbits = 0 }
    def writeByte(b: Byte): Unit = { require(nbits == 0); buf.write(b & 0xff) }
    def result(): Array[Byte] = { alignByte(); buf.toByteArray }
  }

  /** Valid-stream staging encoder (see object doc): `viaUncompressed`
    * routes through raw meta-blocks; the default routes through ONE
    * compressed meta-block per ≤4 MiB chunk — a single
    * insert-covers-all command under an 8-bit flat literal code, so
    * decode exercises the complex code-length path. */
  def compress(b: Array[Byte], viaUncompressed: Boolean = false): Array[Byte] = {
    val w = new Writer
    w.writeBits(1, 1); w.writeBits(22 - 17, 3) // WBITS 22
    val chunk = 1 << 22

    def writeMlen(n: Int): Unit = {
      // minimal MNIBBLES (the decoder rejects over-wide encodings)
      val nibbles = if (n <= (1 << 16)) 4 else if (n <= (1 << 20)) 5 else 6
      w.writeBits(nibbles - 4, 2)
      w.writeBits(n - 1, 4 * nibbles)
    }

    if (b.length == 0) {
      w.writeBits(1, 1) // ISLAST
      w.writeBits(1, 1) // ISLASTEMPTY
      return w.result()
    }
    var at = 0
    while (at < b.length) {
      val n = math.min(chunk, b.length - at)
      val last = at + n == b.length
      if (viaUncompressed) {
        // uncompressed blocks cannot be last: emit all data blocks
        // non-last, then one empty last block
        w.writeBits(0, 1) // ISLAST = 0
        writeMlen(n)
        w.writeBits(1, 1) // ISUNCOMPRESSED
        w.alignByte()
        var k = 0
        while (k < n) { w.writeByte(b(at + k)); k += 1 }
      } else {
        w.writeBits(if (last) 1 else 0, 1)
        if (last) w.writeBits(0, 1) // not ISLASTEMPTY
        writeMlen(n)
        if (!last) w.writeBits(0, 1) // not ISUNCOMPRESSED
        // NBLTYPES L/I/D = 1
        w.writeBits(0, 1); w.writeBits(0, 1); w.writeBits(0, 1)
        w.writeBits(0, 2) // NPOSTFIX
        w.writeBits(0, 4) // NDIRECT
        w.writeBits(0, 2) // context mode LSB6 (single literal tree anyway)
        w.writeBits(0, 1) // NTREESL = 1
        w.writeBits(0, 1) // NTREESD = 1
        // literal tree: COMPLEX, all 256 symbols at length 8 (a valid
        // complete code: 256 × 2^-8 = 1) — this is what routes oracle
        // round-trips through the code-length-code machinery.
        // Code-length code: len(8)=1, len(16)=1 (completes the code;
        // never used). Fixed §3.5 code, reading order: 0 → '00',
        // 1 → '1110'.
        w.writeBits(0, 2) // HSKIP = 0
        var i = 0
        while (i < 8) { w.writeBits(0, 2); i += 1 } // 1,2,3,4,0,5,17,6 → len 0
        w.writeCode(0xe, 4) // symbol 16 → len 1
        w.writeBits(0, 2) // symbol 7 → len 0
        w.writeCode(0xe, 4) // symbol 8 → len 1
        // 256 × code-length symbol '8' (canonical: 8→'0', 16→'1')
        i = 0
        while (i < 256) { w.writeBits(0, 1); i += 1 }
        // command tree: simple, 1 symbol — the largest insert code
        // whose base covers n, copy code 0; the cells used carry an
        // explicit distance, but the insert covers the whole
        // meta-block so no distance is ever read
        var insCode = 23
        while (InsertBase(insCode) > n) insCode -= 1
        val cell = if (insCode >= 16) 5 else if (insCode >= 8) 2 else 0
        val cmd = 128 + cell * 64 + ((insCode & 7) << 3)
        w.writeBits(1, 2) // HSKIP=1 → simple
        w.writeBits(0, 2) // NSYM=1
        w.writeBits(cmd, 10)
        // distance tree: simple, 1 symbol (never read)
        w.writeBits(1, 2); w.writeBits(0, 2); w.writeBits(0, 6)
        // ONE command: the symbol costs 0 bits; insert extra bits,
        // then the literals as 8-bit canonical codes
        w.writeBits(n - InsertBase(insCode), InsertExtra(insCode))
        var k = 0
        while (k < n) {
          w.writeCode(b(at + k) & 0xff, 8)
          k += 1
        }
      }
      at += n
    }
    if (viaUncompressed) { w.writeBits(1, 1); w.writeBits(1, 1) } // empty last
    w.result()
  }
}
