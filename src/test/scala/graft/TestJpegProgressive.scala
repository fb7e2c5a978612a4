package graft

/** Progressive (SOF2) JPEG encoder for planted tests: the SAME
  * coefficient math as [[TestJpeg]] (verbatim FDCT/quant, so the decoded
  * canvas must be BIT-IDENTICAL to the baseline encoding of the same
  * pixels), emitted as progressive scans — interleaved DC first scan
  * with successive approximation (Al=1), a raw-bit DC refinement scan,
  * per-component AC first scans (optionally split into two spectral
  * bands) with cross-block EOB runs, and AC refinement scans with
  * correction bits per ITU T.81 G.1.2.3. Exercises every progressive
  * path of `Multimodal.decodeJpegCanvas`: spectral selection, successive
  * approximation, non-interleaved scan geometry (a 4:2:0 luma plane's
  * data width differs from its MCU-padded width), EOBn codes, ZRL in
  * refinement, and correction-bit interleaving. */
object TestJpegProgressive {

  private val zigzag = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val lumaQ = Array(
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99)
  private val chromaQ = Array(
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99)

  private val dcSpec = (Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11))
  // a flat AC table covering every rs symbol this encoder can emit:
  // (run 0-15) × (magnitude size 0-10) — EOBn up to r=14, ZRL, and any
  // first-scan coefficient category. All symbols at one code length
  // (canonical, one all-ones guard code unused) — valid, just not
  // size-optimal, which a planted test never cares about.
  private val acSpec: (Array[Int], Array[Int]) = {
    val syms = (for (r <- 0 to 15; s <- 0 to 10) yield (r << 4) | s).toArray
    var len = 1
    while ((1 << len) - 1 < syms.length) len += 1
    val counts = new Array[Int](16)
    counts(len - 1) = syms.length
    (counts, syms)
  }

  private def scaleQ(base: Array[Int], quality: Int): Array[Int] = {
    val s = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map(v => math.min(255, math.max(1, (v * s + 50) / 100)))
  }

  private final class HuffEnc(spec: (Array[Int], Array[Int])) {
    val codeOf = new Array[Int](256); val sizeOf = new Array[Int](256)
    private var code = 0
    private var k = 0
    for (l <- 1 to 16) {
      for (_ <- 0 until spec._1(l - 1)) {
        codeOf(spec._2(k)) = code; sizeOf(spec._2(k)) = l; code += 1; k += 1
      }
      code <<= 1
    }
  }

  /** Encode `rgb` as a progressive JPEG; same pixel-math contract as
    * `TestJpeg.apply`. `splitAcBand` emits AC in two spectral bands
    * (1-5, 6-63); `approx` adds a successive-approximation level
    * (first scans at Al=1, refinement scans to Al=0). */
  def apply(w: Int, h: Int, rgb: Array[Byte], quality: Int = 90,
      grayscale: Boolean = false, subsample: Boolean = false,
      splitAcBand: Boolean = false, approx: Boolean = true): Array[Byte] = {
    val qL = scaleQ(lumaQ, quality); val qC = scaleQ(chromaQ, quality)
    val nComp = if (grayscale) 1 else 3

    // ---- coefficient planes: verbatim TestJpeg math, stored not coded ----
    def fdctQuantBlock(px: Array[Double], q: Array[Int]): Array[Int] = {
      val coef = new Array[Int](64)
      for (u <- 0 until 8; v <- 0 until 8) {
        var s = 0.0
        for (y <- 0 until 8; x <- 0 until 8)
          s += px(y * 8 + x) *
            math.cos((2 * y + 1) * u * math.Pi / 16) *
            math.cos((2 * x + 1) * v * math.Pi / 16)
        val cu = if (u == 0) 0.7071067811865476 else 1.0
        val cv = if (v == 0) 0.7071067811865476 else 1.0
        coef(u * 8 + v) = math.round(s * cu * cv / 4.0).toInt
      }
      Array.tabulate(64)(i => {
        val c = coef(zigzag(i))
        math.round(c.toDouble / q(i)).toInt
      })
    }
    val hMax = if (!grayscale && subsample) 2 else 1
    val mcuW = 8 * hMax; val mcuH = 8 * hMax
    val mcusX = (w + mcuW - 1) / mcuW; val mcusY = (h + mcuH - 1) / mcuH
    def at(x: Int, y: Int): Int = {
      val cx = math.min(x, w - 1); val cy = math.min(y, h - 1)
      (cy * w + cx) * (if (grayscale) 1 else 3)
    }
    def yOf(x: Int, y: Int): Double =
      if (grayscale) (rgb(at(x, y)) & 0xff) - 128.0
      else {
        val i = at(x, y)
        0.299 * (rgb(i) & 0xff) + 0.587 * (rgb(i + 1) & 0xff) +
          0.114 * (rgb(i + 2) & 0xff) - 128.0
      }
    def cbOf(x: Int, y: Int): Double = {
      val i = at(x, y)
      -0.168736 * (rgb(i) & 0xff) - 0.331264 * (rgb(i + 1) & 0xff) +
        0.5 * (rgb(i + 2) & 0xff)
    }
    def crOf(x: Int, y: Int): Double = {
      val i = at(x, y)
      0.5 * (rgb(i) & 0xff) - 0.418688 * (rgb(i + 1) & 0xff) -
        0.081312 * (rgb(i + 2) & 0xff)
    }

    // per-component block grids (MCU-padded, like the decoder's)
    val compHi = Array.tabulate(nComp)(c => if (c == 0) hMax else 1)
    val blocksW = Array.tabulate(nComp)(c => mcusX * compHi(c))
    val blocksH = Array.tabulate(nComp)(c => mcusY * compHi(c))
    val dataW = Array.tabulate(nComp)(c =>
      ((w * compHi(c) + hMax - 1) / hMax + 7) / 8)
    val dataH = Array.tabulate(nComp)(c =>
      ((h * compHi(c) + hMax - 1) / hMax + 7) / 8)
    val blocks = Array.tabulate(nComp)(c =>
      new Array[Array[Int]](blocksW(c) * blocksH(c)))
    val px = new Array[Double](64)
    for (my <- 0 until mcusY; mx <- 0 until mcusX) {
      if (grayscale || !subsample) {
        for (i <- 0 until 64) px(i) = yOf(mx * 8 + i % 8, my * 8 + i / 8)
        blocks(0)(my * blocksW(0) + mx) = fdctQuantBlock(px, qL)
        if (!grayscale) {
          for (i <- 0 until 64) px(i) = cbOf(mx * 8 + i % 8, my * 8 + i / 8)
          blocks(1)(my * blocksW(1) + mx) = fdctQuantBlock(px, qC)
          for (i <- 0 until 64) px(i) = crOf(mx * 8 + i % 8, my * 8 + i / 8)
          blocks(2)(my * blocksW(2) + mx) = fdctQuantBlock(px, qC)
        }
      } else {
        for (by <- 0 until 2; bx <- 0 until 2) {
          for (i <- 0 until 64)
            px(i) = yOf(mx * 16 + bx * 8 + i % 8, my * 16 + by * 8 + i / 8)
          blocks(0)((my * 2 + by) * blocksW(0) + mx * 2 + bx) =
            fdctQuantBlock(px, qL)
        }
        for (i <- 0 until 64) {
          val sx = mx * 16 + (i % 8) * 2; val sy = my * 16 + (i / 8) * 2
          px(i) = (cbOf(sx, sy) + cbOf(sx + 1, sy) +
            cbOf(sx, sy + 1) + cbOf(sx + 1, sy + 1)) / 4
        }
        blocks(1)(my * blocksW(1) + mx) = fdctQuantBlock(px, qC)
        for (i <- 0 until 64) {
          val sx = mx * 16 + (i % 8) * 2; val sy = my * 16 + (i / 8) * 2
          px(i) = (crOf(sx, sy) + crOf(sx + 1, sy) +
            crOf(sx, sy + 1) + crOf(sx + 1, sy + 1)) / 4
        }
        blocks(2)(my * blocksW(2) + mx) = fdctQuantBlock(px, qC)
      }
    }

    // ---- container ----
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(mk: Int, body: Seq[Int]): Unit = {
      u8(0xff); u8(mk); u16(body.length + 2); body.foreach(u8)
    }
    u8(0xff); u8(0xd8)
    marker(0xdb, 0 +: qL)
    if (!grayscale) marker(0xdb, 1 +: qC)
    val sofBody = Seq(8, h >> 8, h & 0xff, w >> 8, w & 0xff, nComp) ++
      (if (grayscale) Seq(1, 0x11, 0)
       else Seq(1, if (subsample) 0x22 else 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    marker(0xc2, sofBody) // SOF2: progressive
    def dht(tc: Int, th: Int, spec: (Array[Int], Array[Int])): Unit =
      marker(0xc4, ((tc << 4) | th) +: (spec._1.toSeq ++ spec._2.toSeq))
    dht(0, 0, dcSpec); dht(1, 0, acSpec)
    val encDc = new HuffEnc(dcSpec); val encAc = new HuffEnc(acSpec)

    // ---- per-scan entropy writer ----
    final class BitSink {
      val data = new java.io.ByteArrayOutputStream()
      private var acc = 0L; private var nb = 0
      def putBits(code: Int, size: Int): Unit = {
        acc = (acc << size) | (code & ((1L << size) - 1)); nb += size
        while (nb >= 8) {
          val v = ((acc >> (nb - 8)) & 0xff).toInt
          data.write(v); if (v == 0xff) data.write(0x00)
          nb -= 8
        }
      }
      def flush(): Unit = if (nb > 0) {
        val v = (((acc << (8 - nb)) | ((1 << (8 - nb)) - 1)) & 0xff).toInt
        data.write(v); if (v == 0xff) data.write(0x00)
        nb = 0; acc = 0L
      }
    }
    def sos(comps: Seq[(Int, Int, Int)], ss: Int, se: Int, ah: Int, al: Int)
        (body: BitSink => Unit): Unit = {
      marker(0xda, Seq(comps.length) ++
        comps.flatMap { case (cid, tdc, tac) => Seq(cid, (tdc << 4) | tac) } ++
        Seq(ss, se, (ah << 4) | al))
      val sink = new BitSink
      body(sink)
      sink.flush()
      out.write(sink.data.toByteArray)
    }
    def category(v: Int): Int = {
      var s = 0; var a = math.abs(v); while (a > 0) { s += 1; a >>= 1 }; s
    }

    val dcAl = if (approx) 1 else 0
    val acAl = if (approx) 1 else 0
    def compIds: Seq[(Int, Int, Int)] =
      (0 until nComp).map(c => (c + 1, 0, 0))

    // DC first scan: interleaved, diffs of (dc >> dcAl) — arithmetic shift
    sos(compIds, 0, 0, 0, dcAl) { sink =>
      val pred = new Array[Int](nComp)
      for (my <- 0 until mcusY; mx <- 0 until mcusX; c <- 0 until nComp;
           by <- 0 until (if (c == 0) hMax else 1);
           bx <- 0 until (if (c == 0) hMax else 1)) {
        val hi = compHi(c)
        val blk = blocks(c)((my * hi + by) * blocksW(c) + mx * hi + bx)
        val v = blk(0) >> dcAl
        val diff = v - pred(c); pred(c) = v
        val s = category(diff)
        sink.putBits(encDc.codeOf(s), encDc.sizeOf(s))
        if (s > 0) sink.putBits(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      }
    }

    // AC scans per component, per band
    val bands = if (splitAcBand) Seq((1, 5), (6, 63)) else Seq((1, 63))
    def vAt(c: Int, b: Int, k: Int, al: Int): Int = { // point transform, toward zero
      val cc = blocks(c)(b)(k)
      val m = math.abs(cc) >> al
      if (cc < 0) -m else m
    }
    for (c <- 0 until nComp; (ss, se) <- bands) {
      sos(Seq((c + 1, 0, 0)), ss, se, 0, acAl) { sink =>
        def blockAt(i: Int): Int = {
          val by = i / dataW(c); val bx = i % dataW(c)
          by * blocksW(c) + bx
        }
        val nBlocks = dataW(c) * dataH(c)
        var eobStart = -1 // first block of a pending EOB run
        def flushEob(endExcl: Int): Unit = if (eobStart >= 0) {
          // one EOBn code always suffices: r = floor(log2 n) makes
          // extra = n - 2^r < 2^r representable in r bits
          val n = endExcl - eobStart
          var r = 0
          while ((2 << r) <= n && r < 14) r += 1
          sink.putBits(encAc.codeOf(r << 4), encAc.sizeOf(r << 4))
          if (r > 0) sink.putBits(n - (1 << r), r)
          eobStart = -1
        }
        for (i <- 0 until nBlocks) {
          val b = blockAt(i)
          val nz = (ss to se).filter(k => vAt(c, b, k, acAl) != 0)
          if (nz.isEmpty) { if (eobStart < 0) eobStart = i }
          else {
            flushEob(i)
            var k = ss
            for (pos <- nz) {
              var run = pos - k
              while (run > 15) {
                sink.putBits(encAc.codeOf(0xf0), encAc.sizeOf(0xf0))
                run -= 16
              }
              val v = vAt(c, b, pos, acAl)
              val s = category(v)
              require(s <= 10, s"test encoder AC magnitude $s needs a bigger table")
              val rs = (run << 4) | s
              sink.putBits(encAc.codeOf(rs), encAc.sizeOf(rs))
              sink.putBits(if (v < 0) v + (1 << s) - 1 else v, s)
              k = pos + 1
            }
            if (k <= se) { eobStart = i; flushEob(i + 1) } // EOB rest of block
          }
        }
        flushEob(nBlocks)
      }
    }

    if (approx) {
      // DC refinement: one raw bit (bit 0 of the true DC) per block,
      // interleaved MCU order
      sos(compIds, 0, 0, 1, 0) { sink =>
        for (my <- 0 until mcusY; mx <- 0 until mcusX; c <- 0 until nComp;
             by <- 0 until (if (c == 0) hMax else 1);
             bx <- 0 until (if (c == 0) hMax else 1)) {
          val hi = compHi(c)
          val blk = blocks(c)((my * hi + by) * blocksW(c) + mx * hi + bx)
          sink.putBits(blk(0) & 1, 1)
        }
      }
      // AC refinement per component/band: T.81 G.1.2.3 with correction
      // bits, newly-significant ±1 placements, ZRL over zero-history
      // runs, and cross-block EOB runs carrying correction bits
      for (c <- 0 until nComp; (ss, se) <- bands) {
        sos(Seq((c + 1, 0, 0)), ss, se, 1, 0) { sink =>
          def blockAt(i: Int): Int = {
            val by = i / dataW(c); val bx = i % dataW(c)
            by * blocksW(c) + bx
          }
          val nBlocks = dataW(c) * dataH(c)
          def hist(b: Int, k: Int): Int = vAt(c, b, k, 1) // previous-scan value
          def corrBit(b: Int, k: Int): Int = math.abs(blocks(c)(b)(k)) & 1
          def newlySig(b: Int, k: Int): Boolean =
            hist(b, k) == 0 && blocks(c)(b)(k) != 0

          var eobStart = -1
          def refineSpan(b: Int, from: Int, to: Int): Unit =
            for (k <- from to to; if hist(b, k) != 0)
              sink.putBits(corrBit(b, k), 1)
          def flushEob(endExcl: Int, tailBlock: Int, tailFrom: Int): Unit =
            if (eobStart >= 0 || tailFrom <= se) {
              // covered blocks: the tail of `tailBlock` (if any) counts
              // as the run's first block, plus whole blocks
              // [eobStart, endExcl); decoder reads the EOBn code inside
              // the tail block and refines in this exact order
              val whole = if (eobStart >= 0) endExcl - eobStart else 0
              val n = whole + (if (tailFrom <= se) 1 else 0)
              var r = 0
              while ((2 << r) <= n && r < 14) r += 1
              sink.putBits(encAc.codeOf(r << 4), encAc.sizeOf(r << 4))
              if (r > 0) sink.putBits(n - (1 << r), r)
              if (tailFrom <= se) refineSpan(tailBlock, tailFrom, se)
              if (eobStart >= 0)
                for (i <- eobStart until endExcl)
                  refineSpan(blockAt(i), ss, se)
              eobStart = -1
            }

          var pendingTailBlock = -1; var pendingTailFrom = se + 1
          for (i <- 0 until nBlocks) {
            val b = blockAt(i)
            val sig = (ss to se).filter(k => newlySig(b, k))
            if (sig.isEmpty) {
              // whole block rides an EOB run (corrections only)
              if (eobStart < 0) eobStart = i
            } else {
              // close any pending run BEFORE this block
              flushEob(i, pendingTailBlock, pendingTailFrom)
              pendingTailBlock = -1; pendingTailFrom = se + 1
              var k = ss
              for (pos <- sig) {
                // zero-history run length between k and pos
                var run = (k until pos).count(j => hist(b, j) == 0)
                var j = k
                while (run > 15) {
                  sink.putBits(encAc.codeOf(0xf0), encAc.sizeOf(0xf0))
                  var cnt = 0
                  while (cnt < 16) {
                    if (hist(b, j) != 0) sink.putBits(corrBit(b, j), 1)
                    else cnt += 1
                    j += 1
                  }
                  run -= 16
                }
                sink.putBits(encAc.codeOf((run << 4) | 1),
                  encAc.sizeOf((run << 4) | 1))
                sink.putBits(if (blocks(c)(b)(pos) > 0) 1 else 0, 1)
                // walk from j through pos: corrections at nonzero history
                while (j <= pos) {
                  if (hist(b, j) != 0) sink.putBits(corrBit(b, j), 1)
                  j += 1
                }
                k = pos + 1
              }
              if (k <= se) { pendingTailBlock = b; pendingTailFrom = k }
            }
          }
          flushEob(nBlocks, pendingTailBlock, pendingTailFrom)
        }
      }
    }

    u8(0xff); u8(0xd9)
    out.toByteArray
  }
}
