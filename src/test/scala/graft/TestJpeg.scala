package graft

/** Minimal baseline JPEG encoder for planted tests: SOI, DQT (Annex K
  * tables scaled by `quality`), SOF0, DHT (the ITU T.81 Annex K typical
  * Huffman tables), optional DRI, one interleaved SOS with FDCT →
  * quantize → zigzag → DC-diff/AC-RLE Huffman coding, byte stuffing,
  * restart markers, EOI. Grayscale or YCbCr with 4:4:4 / 4:2:0
  * sampling. Spec-correct by construction — the same role TestPng /
  * TestGif play for their decoders; `Multimodal.decodeJpeg` is the
  * production path under test. */
object TestJpeg {

  // ITU T.81 Annex K quantization tables, zigzag order
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

  // Annex K typical Huffman tables: (bits per length 1-16, values)
  private val dcLuma = (Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11))
  private val dcChroma = (Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11))
  private val acLuma = (Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125),
    Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
      0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
      0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
      0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
      0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
      0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
      0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
      0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
      0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
      0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
      0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
      0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
      0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
      0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))
  private val acChroma = (Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119),
    Array(
      0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
      0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
      0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
      0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
      0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
      0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
      0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
      0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
      0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
      0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
      0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
      0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
      0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
      0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))

  private val zigzag = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

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

  /** Encode `rgb` (row-major 3 B/px; also accepts 1 B/px when
    * `grayscale`) as a baseline JPEG. `subsample` = false → 4:4:4,
    * true → 4:2:0. `restartEvery` > 0 emits DRI + RSTn markers. */
  def apply(w: Int, h: Int, rgb: Array[Byte], quality: Int = 90,
      grayscale: Boolean = false, subsample: Boolean = false,
      restartEvery: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(mk: Int, body: Seq[Int]): Unit = {
      u8(0xff); u8(mk); u16(body.length + 2); body.foreach(u8)
    }
    val qL = scaleQ(lumaQ, quality); val qC = scaleQ(chromaQ, quality)
    u8(0xff); u8(0xd8) // SOI
    marker(0xdb, 0 +: qL)
    if (!grayscale) marker(0xdb, 1 +: qC)
    if (restartEvery > 0) marker(0xdd, Seq(restartEvery >> 8, restartEvery & 0xff))
    val nComp = if (grayscale) 1 else 3
    val sofBody = Seq(8, h >> 8, h & 0xff, w >> 8, w & 0xff, nComp) ++
      (if (grayscale) Seq(1, 0x11, 0)
       else Seq(1, if (subsample) 0x22 else 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    marker(0xc0, sofBody)
    def dht(tc: Int, th: Int, spec: (Array[Int], Array[Int])): Unit =
      marker(0xc4, ((tc << 4) | th) +: (spec._1.toSeq ++ spec._2.toSeq))
    dht(0, 0, dcLuma); dht(1, 0, acLuma)
    if (!grayscale) { dht(0, 1, dcChroma); dht(1, 1, acChroma) }
    marker(0xda,
      (if (grayscale) Seq(1, 1, 0x00) else Seq(3, 1, 0x00, 2, 0x11, 3, 0x11)) ++
        Seq(0, 63, 0))

    // ---- entropy coder ----
    val data = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nb = 0
    def putBits(code: Int, size: Int): Unit = {
      acc = (acc << size) | (code & ((1L << size) - 1)); nb += size
      while (nb >= 8) {
        val v = ((acc >> (nb - 8)) & 0xff).toInt
        data.write(v); if (v == 0xff) data.write(0x00)
        nb -= 8
      }
    }
    def flushBits(): Unit = if (nb > 0) {
      val v = (((acc << (8 - nb)) | ((1 << (8 - nb)) - 1)) & 0xff).toInt
      data.write(v); if (v == 0xff) data.write(0x00)
      nb = 0; acc = 0L
    }
    val encDcL = new HuffEnc(dcLuma); val encAcL = new HuffEnc(acLuma)
    val encDcC = new HuffEnc(dcChroma); val encAcC = new HuffEnc(acChroma)
    def category(v: Int): Int = { var s = 0; var a = math.abs(v); while (a > 0) { s += 1; a >>= 1 }; s }
    def putVal(v: Int, s: Int): Unit =
      if (s > 0) putBits(if (v < 0) v + (1 << s) - 1 else v, s)

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
    def encodeBlock(zz: Array[Int], dcPred: Int,
        dc: HuffEnc, ac: HuffEnc): Int = {
      val diff = zz(0) - dcPred
      val s = category(diff)
      putBits(dc.codeOf(s), dc.sizeOf(s)); putVal(diff, s)
      var k = 1
      var run = 0
      while (k < 64) {
        if (zz(k) == 0) run += 1
        else {
          while (run > 15) { putBits(ac.codeOf(0xf0), ac.sizeOf(0xf0)); run -= 16 }
          val sz = category(zz(k))
          val rs = (run << 4) | sz
          putBits(ac.codeOf(rs), ac.sizeOf(rs)); putVal(zz(k), sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) putBits(ac.codeOf(0x00), ac.sizeOf(0x00))
      zz(0)
    }

    // component planes (level-shifted), padded to MCU grid
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

    var dcY = 0; var dcCb = 0; var dcCr = 0
    var mcu = 0
    var rst = 0
    for (my <- 0 until mcusY; mx <- 0 until mcusX) {
      if (restartEvery > 0 && mcu > 0 && mcu % restartEvery == 0) {
        flushBits()
        data.write(0xff); data.write(0xd0 + rst)
        rst = (rst + 1) % 8
        dcY = 0; dcCb = 0; dcCr = 0
      }
      val px = new Array[Double](64)
      if (grayscale || !subsample) {
        for (i <- 0 until 64)
          px(i) = yOf(mx * 8 + i % 8, my * 8 + i / 8)
        dcY = encodeBlock(fdctQuantBlock(px, qL), dcY, encDcL, encAcL)
        if (!grayscale) {
          for (i <- 0 until 64) px(i) = cbOf(mx * 8 + i % 8, my * 8 + i / 8)
          dcCb = encodeBlock(fdctQuantBlock(px, qC), dcCb, encDcC, encAcC)
          for (i <- 0 until 64) px(i) = crOf(mx * 8 + i % 8, my * 8 + i / 8)
          dcCr = encodeBlock(fdctQuantBlock(px, qC), dcCr, encDcC, encAcC)
        }
      } else {
        // 4:2:0 — four luma blocks then one averaged block per chroma
        for (by <- 0 until 2; bx <- 0 until 2) {
          for (i <- 0 until 64)
            px(i) = yOf(mx * 16 + bx * 8 + i % 8, my * 16 + by * 8 + i / 8)
          dcY = encodeBlock(fdctQuantBlock(px, qL), dcY, encDcL, encAcL)
        }
        for (i <- 0 until 64) {
          val sx = mx * 16 + (i % 8) * 2; val sy = my * 16 + (i / 8) * 2
          px(i) = (cbOf(sx, sy) + cbOf(sx + 1, sy) +
            cbOf(sx, sy + 1) + cbOf(sx + 1, sy + 1)) / 4
        }
        dcCb = encodeBlock(fdctQuantBlock(px, qC), dcCb, encDcC, encAcC)
        for (i <- 0 until 64) {
          val sx = mx * 16 + (i % 8) * 2; val sy = my * 16 + (i / 8) * 2
          px(i) = (crOf(sx, sy) + crOf(sx + 1, sy) +
            crOf(sx, sy + 1) + crOf(sx + 1, sy + 1)) / 4
        }
        dcCr = encodeBlock(fdctQuantBlock(px, qC), dcCr, encDcC, encAcC)
      }
      mcu += 1
    }
    flushBits()
    out.write(data.toByteArray)
    u8(0xff); u8(0xd9) // EOI
    out.toByteArray
  }
}
