package graft.operators

/** Pure-JVM FLAC decoder — the compressed-audio counterpart of the PNG
  * decoder in [[Multimodal]]: zero native or library dependencies, every
  * structure bounds-checked, malformed payloads fail loudly
  * (IllegalArgumentException), and the STREAMINFO MD5 of the decoded
  * samples is VERIFIED, so a payload that decodes at all decodes
  * correctly (the strongest integrity contract any codec here has).
  *
  * Supported subset — the shapes real encoders emit: 8/16-bit samples,
  * 1-2 channels, all four subframe types (constant, verbatim, fixed
  * orders 0-4, LPC up to order 32), both Rice residual methods (4- and
  * 5-bit parameters, including the escape-to-raw code), wasted bits,
  * and all four channel assignments (independent, left/side, right/side,
  * mid/side). Rejected, not misread: >2 channels, other bit depths,
  * variable-blocksize streams whose headers disagree with STREAMINFO.
  *
  * Format per the public FLAC specification (RFC 9639). */
object Flac {

  /** Decoded stream: sample rate, channel count, bits per sample, and
    * interleaved samples (channel-major per frame position). */
  final case class FlacAudio(sampleRate: Int, channels: Int, bits: Int,
      samples: Array[Int])

  private final class BitReader(b: Array[Byte], var pos: Int, val id: Long) {
    var bit: Int = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"media $id: $msg")
    def bytePos: Int = pos
    def aligned: Boolean = bit == 0
    def alignToByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
    def readBit(): Int = {
      if (pos >= b.length) fail("truncated FLAC bitstream")
      val v = (b(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    /** Unsigned n-bit big-endian field (n <= 32). */
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readBitsLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Signed n-bit two's-complement field. */
    def readSigned(n: Int): Int = {
      val v = readBits(n)
      if (n > 0 && (v & (1 << (n - 1))) != 0) v - (1 << n) else v
    }
    /** Unary-coded value (count of 0 bits before the terminating 1). */
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) {
        q += 1
        if (q > (1 << 24)) fail("runaway unary code in FLAC residual")
      }
      q
    }
  }

  /** CRC-8, polynomial 0x07 (frame header). */
  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial 0x8005 (whole frame). */
  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  private val fixedCoefs: Array[Array[Int]] = Array(
    Array(),
    Array(1),
    Array(2, -1),
    Array(3, -3, 1),
    Array(4, -6, 4, -1))

  /** Decode a FLAC payload to PCM. Fails loudly on any malformed or
    * unsupported structure and on a decoded-sample MD5 mismatch against
    * STREAMINFO (when the encoder recorded one). */
  def decodeFlac(bytes: Array[Byte], mediaId: Long = -1L): FlacAudio = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"media $mediaId: $msg")
    require(bytes.length >= 42 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C',
      s"media $mediaId: not a FLAC payload")
    var p = 4
    // metadata blocks; STREAMINFO must be first
    var sampleRate = 0; var channels = 0; var bits = 0
    var totalSamples = 0L; var minBlock = 0; var maxBlock = 0
    var md5: Array[Byte] = null
    var sawStreamInfo = false
    var last = false
    while (!last) {
      if (p + 4 > bytes.length) fail("truncated FLAC metadata header")
      val h = bytes(p) & 0xff
      last = (h & 0x80) != 0
      val btype = h & 0x7f
      val len = ((bytes(p + 1) & 0xff) << 16) | ((bytes(p + 2) & 0xff) << 8) |
        (bytes(p + 3) & 0xff)
      p += 4
      if (len > bytes.length - p) fail("FLAC metadata block overruns payload")
      if (btype == 0) {
        if (sawStreamInfo) fail("duplicate FLAC STREAMINFO")
        if (len != 34) fail("malformed FLAC STREAMINFO length")
        val r = new BitReader(bytes, p, mediaId)
        minBlock = r.readBits(16); maxBlock = r.readBits(16)
        r.readBits(24); r.readBits(24) // min/max frame size (unused)
        sampleRate = r.readBits(20)
        channels = r.readBits(3) + 1
        bits = r.readBits(5) + 1
        totalSamples = r.readBitsLong(36)
        md5 = java.util.Arrays.copyOfRange(bytes, p + 18, p + 34)
        if (md5.forall(_ == 0)) md5 = null // encoder left it unset
        sawStreamInfo = true
      } else if (btype == 127) fail("invalid FLAC metadata block type 127")
      p += len
    }
    if (!sawStreamInfo) fail("FLAC stream missing STREAMINFO")
    if (sampleRate <= 0) fail("degenerate FLAC sample rate")
    if (channels > 2) fail(s"$channels-channel FLAC unsupported (1-2 only)")
    if (bits != 8 && bits != 16) fail(s"$bits-bit FLAC unsupported (8/16 only)")
    if (totalSamples <= 0) fail("FLAC stream with unknown/zero total samples")
    if (totalSamples * channels > Int.MaxValue - 8)
      fail("FLAC stream too large to decode in one buffer")

    val out = new Array[Int]((totalSamples * channels).toInt)
    var decoded = 0L

    while (decoded < totalSamples) {
      if (p >= bytes.length) fail("FLAC payload ends before all samples decode")
      val frameStart = p
      val r = new BitReader(bytes, p, mediaId)
      if (r.readBits(14) != 0x3ffe) fail("bad FLAC frame sync")
      r.readBit() // reserved
      r.readBit() // blocking strategy (both accepted; headers are checked)
      val bsCode = r.readBits(4)
      val srCode = r.readBits(4)
      val chanAsn = r.readBits(4)
      val ssCode = r.readBits(3)
      r.readBit() // reserved
      // UTF-8-style coded frame/sample number — validated for form only
      val first = r.readBits(8)
      val extra =
        if ((first & 0x80) == 0) 0
        else if ((first & 0xe0) == 0xc0) 1
        else if ((first & 0xf0) == 0xe0) 2
        else if ((first & 0xf8) == 0xf0) 3
        else if ((first & 0xfc) == 0xf8) 4
        else if ((first & 0xfe) == 0xfc) 5
        else if (first == 0xfe) 6
        else fail("malformed FLAC frame number coding")
      var e = 0
      while (e < extra) {
        if ((r.readBits(8) & 0xc0) != 0x80) fail("malformed FLAC frame number continuation")
        e += 1
      }
      val blockSize = bsCode match {
        case 0 => fail("reserved FLAC block size code")
        case 1 => 192
        case 6 => r.readBits(8) + 1
        case 7 => r.readBits(16) + 1
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case c => 256 << (c - 8)
      }
      srCode match {
        case 12 => r.readBits(8)
        case 13 | 14 => r.readBits(16)
        case 15 => fail("invalid FLAC sample rate code")
        case _ => ()
      }
      ssCode match {
        case 0 => () // from STREAMINFO
        case 1 => if (bits != 8) fail("frame sample size disagrees with STREAMINFO")
        case 4 => if (bits != 16) fail("frame sample size disagrees with STREAMINFO")
        case 3 | 7 => fail("reserved FLAC sample size code")
        case _ => fail("frame sample size disagrees with STREAMINFO")
      }
      val headerEnd = r.bytePos
      if (!r.aligned) fail("FLAC frame header not byte-aligned before CRC")
      val declaredCrc8 = r.readBits(8)
      if (crc8(bytes, frameStart, headerEnd) != declaredCrc8)
        fail("FLAC frame header CRC mismatch")
      if (blockSize <= 0 || (maxBlock > 0 && blockSize > maxBlock))
        fail("FLAC frame block size out of range")
      val nFrameCh = chanAsn match {
        case a if a <= 7 =>
          if (a + 1 != channels) fail("frame channel count disagrees with STREAMINFO")
          channels
        case 8 | 9 | 10 =>
          if (channels != 2) fail("stereo decorrelation in non-stereo FLAC")
          2
        case _ => fail("reserved FLAC channel assignment")
      }
      // the final frame may be shorter than the stream's regular block
      // size; decode what the frame declares, keep what the stream needs
      val remaining = totalSamples - decoded
      val take = math.min(blockSize.toLong, remaining).toInt

      // decode each subframe
      val chans = new Array[Array[Int]](nFrameCh)
      var c = 0
      while (c < nFrameCh) {
        val sfBits = chanAsn match {
          case 8 => if (c == 1) bits + 1 else bits  // left/side
          case 9 => if (c == 0) bits + 1 else bits  // side/right
          case 10 => if (c == 1) bits + 1 else bits // mid/side
          case _ => bits
        }
        chans(c) = decodeSubframe(r, blockSize, sfBits)
        c += 1
      }
      r.alignToByte()
      val frameEnd = r.bytePos
      val declaredCrc16 = r.readBits(16)
      if (crc16(bytes, frameStart, frameEnd) != declaredCrc16)
        fail("FLAC frame CRC mismatch")
      p = r.bytePos

      // undo inter-channel decorrelation
      val pcm: Array[Array[Int]] = chanAsn match {
        case 8 => // left/side: right = left - side
          val l = chans(0); val s = chans(1)
          Array(l, Array.tabulate(blockSize)(i => l(i) - s(i)))
        case 9 => // side/right: left = right + side
          val s = chans(0); val rt = chans(1)
          Array(Array.tabulate(blockSize)(i => rt(i) + s(i)), rt)
        case 10 => // mid/side
          val m = chans(0); val s = chans(1)
          val l = new Array[Int](blockSize); val rt = new Array[Int](blockSize)
          var i = 0
          while (i < blockSize) {
            val mid = (m(i) << 1) | (s(i) & 1)
            l(i) = (mid + s(i)) >> 1
            rt(i) = (mid - s(i)) >> 1
            i += 1
          }
          Array(l, rt)
        case _ => chans
      }
      var i = 0
      while (i < take) {
        var ch = 0
        while (ch < channels) {
          out(((decoded + i) * channels + ch).toInt) = pcm(ch)(i)
          ch += 1
        }
        i += 1
      }
      decoded += take
    }

    if (md5 != null) {
      val digest = java.security.MessageDigest.getInstance("MD5")
      val bytesPer = bits / 8
      val buf = new Array[Byte](out.length * bytesPer)
      var i = 0
      while (i < out.length) {
        val v = out(i)
        if (bytesPer == 1) buf(i) = v.toByte
        else { buf(i * 2) = (v & 0xff).toByte; buf(i * 2 + 1) = ((v >> 8) & 0xff).toByte }
        i += 1
      }
      val got = digest.digest(buf)
      if (!java.util.Arrays.equals(got, md5))
        fail("FLAC decoded-sample MD5 mismatch — corrupt stream")
    }
    FlacAudio(sampleRate, channels, bits, out)
  }

  private def decodeSubframe(r: BitReader, blockSize: Int, bits: Int): Array[Int] = {
    if (r.readBit() != 0) r.fail("FLAC subframe padding bit set")
    val t = r.readBits(6)
    var wasted = 0
    if (r.readBit() == 1) wasted = 1 + r.readUnary()
    val effBits = bits - wasted
    if (effBits <= 0) r.fail("FLAC wasted bits exceed sample size")
    val out: Array[Int] =
      if (t == 0) {
        val v = r.readSigned(effBits)
        Array.fill(blockSize)(v)
      } else if (t == 1) {
        Array.fill(blockSize)(r.readSigned(effBits))
      } else if ((t & 0x38) == 0x08 && (t & 0x07) <= 4) {
        val order = t & 0x07
        val warm = Array.fill(order)(r.readSigned(effBits))
        predictResidual(r, blockSize, order, fixedCoefs(order), 0, warm)
      } else if ((t & 0x20) != 0) {
        val order = (t & 0x1f) + 1
        val warm = Array.fill(order)(r.readSigned(effBits))
        val precision = r.readBits(4) + 1
        if (precision == 16) r.fail("invalid FLAC LPC precision code")
        val shift = r.readSigned(5)
        if (shift < 0) r.fail("negative FLAC LPC shift")
        val coefs = Array.fill(order)(r.readSigned(precision))
        predictResidual(r, blockSize, order, coefs, shift, warm)
      } else r.fail(s"reserved FLAC subframe type $t")
    if (wasted > 0) {
      var i = 0
      while (i < out.length) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  /** Rice-coded residual + prediction reconstruction (fixed and LPC share
    * the form; fixed predictors use shift 0 and integer coefficients). */
  private def predictResidual(r: BitReader, blockSize: Int, order: Int,
      coefs: Array[Int], shift: Int, warm: Array[Int]): Array[Int] = {
    val method = r.readBits(2)
    if (method > 1) r.fail("reserved FLAC residual coding method")
    val paramBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xf else 0x1f
    val partOrder = r.readBits(4)
    val nParts = 1 << partOrder
    if (blockSize % nParts != 0) r.fail("FLAC partition order does not divide block size")
    val out = new Array[Int](blockSize)
    System.arraycopy(warm, 0, out, 0, order)
    var idx = order
    var part = 0
    while (part < nParts) {
      val n = (blockSize >> partOrder) - (if (part == 0) order else 0)
      if (n < 0) r.fail("FLAC first partition shorter than predictor order")
      val param = r.readBits(paramBits)
      var i = 0
      if (param == escape) {
        val raw = r.readBits(5)
        while (i < n) {
          out(idx) = if (raw == 0) 0 else r.readSigned(raw)
          idx += 1; i += 1
        }
      } else {
        while (i < n) {
          val q = r.readUnary()
          val low = if (param == 0) 0 else r.readBits(param)
          val u = (q << param) | low
          out(idx) = (u >>> 1) ^ -(u & 1) // zigzag
          idx += 1; i += 1
        }
      }
      part += 1
    }
    // reconstruct: x[i] = residual[i] + (sum coefs[j]*x[i-1-j]) >> shift
    var i = order
    while (i < blockSize) {
      var acc = 0L
      var j = 0
      while (j < order) {
        acc += coefs(j).toLong * out(i - 1 - j)
        j += 1
      }
      out(i) = out(i) + (acc >> shift).toInt
      i += 1
    }
    out
  }
}
