package graft

import scala.collection.mutable.ArrayBuffer

/** Minimal FLAC encoder for planted tests: STREAMINFO with real MD5,
  * fixed-blocksize frames with explicit 16-bit block sizes, constant /
  * verbatim / fixed-order-2 Rice subframes, independent or left/side
  * stereo, correct CRC-8/CRC-16. Test-only; the production decoder is
  * `graft.operators.Flac.decodeFlac`. */
object TestFlac {

  private final class BitWriter {
    val bytes = new ArrayBuffer[Byte]()
    private var cur = 0
    private var nb = 0
    def putBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nb += 1
      if (nb == 8) { bytes += cur.toByte; cur = 0; nb = 0 }
    }
    def putBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { putBit(((v >> i) & 1L).toInt); i -= 1 }
    }
    def align(): Unit = while (nb != 0) putBit(0)
    def toArray: Array[Byte] = { require(nb == 0); bytes.toArray }
  }

  private def crc8(b: Seq[Byte]): Int = {
    var crc = 0
    b.foreach { x =>
      crc ^= x & 0xff
      (0 until 8).foreach { _ =>
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
      }
    }
    crc
  }

  private def crc16(b: Seq[Byte]): Int = {
    var crc = 0
    b.foreach { x =>
      crc ^= (x & 0xff) << 8
      (0 until 8).foreach { _ =>
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
      }
    }
    crc
  }

  /** Encode interleaved `samples` (channel-interleaved ints within the
    * bit depth) as a FLAC stream. `subframe`: "verbatim", "constant"
    * (requires constant blocks), or "fixed2" (order-2 fixed predictor,
    * Rice partition order 0). `leftSide` uses the left/side stereo
    * assignment (channels must be 2). */
  def apply(rate: Int, channels: Int, bits: Int, samples: Array[Int],
      blockSize: Int = 1024, subframe: String = "verbatim",
      leftSide: Boolean = false, md5: Boolean = true): Array[Byte] = {
    require(samples.length % channels == 0)
    val total = samples.length / channels
    val out = new ArrayBuffer[Byte]()
    out ++= "fLaC".getBytes("US-ASCII")
    // STREAMINFO (last metadata block)
    val si = new BitWriter
    si.putBits(blockSize, 16); si.putBits(blockSize, 16)
    si.putBits(0, 24); si.putBits(0, 24)
    si.putBits(rate, 20); si.putBits(channels - 1, 3); si.putBits(bits - 1, 5)
    si.putBits(total, 36)
    val md5bytes: Array[Byte] =
      if (!md5) new Array[Byte](16)
      else {
        val bp = bits / 8
        val buf = new Array[Byte](samples.length * bp)
        samples.indices.foreach { i =>
          if (bp == 1) buf(i) = samples(i).toByte
          else {
            buf(i * 2) = (samples(i) & 0xff).toByte
            buf(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
          }
        }
        java.security.MessageDigest.getInstance("MD5").digest(buf)
      }
    si.align()
    val siBytes = si.toArray ++ md5bytes
    out += (0x80 | 0).toByte
    out += ((siBytes.length >> 16) & 0xff).toByte
    out += ((siBytes.length >> 8) & 0xff).toByte
    out += (siBytes.length & 0xff).toByte
    out ++= siBytes

    var frameIdx = 0
    var pos = 0
    while (pos < total) {
      val bs = math.min(blockSize, total - pos)
      val w = new BitWriter
      w.putBits(0x3ffe, 14) // sync
      w.putBit(0) // reserved
      w.putBit(0) // fixed blocksize strategy (frame number = frame index)
      w.putBits(7, 4)  // blocksize: explicit 16-bit at header end
      w.putBits(0, 4)  // sample rate: from STREAMINFO
      val asn = if (leftSide) 8 else channels - 1
      w.putBits(asn, 4)
      w.putBits(bits match { case 8 => 1; case 16 => 4 }, 3)
      w.putBit(0) // reserved
      // UTF-8-coded frame index (support 0..2047)
      if (frameIdx < 0x80) w.putBits(frameIdx, 8)
      else {
        w.putBits(0xc0 | (frameIdx >> 6), 8)
        w.putBits(0x80 | (frameIdx & 0x3f), 8)
      }
      w.putBits(bs - 1, 16)
      w.align()
      val headerBytes = w.bytes.toSeq
      w.putBits(crc8(headerBytes), 8)

      // per-channel sample planes for this frame
      val planes: Array[Array[Int]] =
        if (leftSide) {
          val l = Array.tabulate(bs)(i => samples((pos + i) * 2))
          val r = Array.tabulate(bs)(i => samples((pos + i) * 2 + 1))
          Array(l, Array.tabulate(bs)(i => l(i) - r(i)))
        } else
          Array.tabulate(channels)(c =>
            Array.tabulate(bs)(i => samples((pos + i) * channels + c)))

      planes.zipWithIndex.foreach { case (x, c) =>
        val sfBits = if (leftSide && c == 1) bits + 1 else bits
        w.putBit(0)
        subframe match {
          case "constant" =>
            require(x.forall(_ == x(0)), "constant subframe needs constant block")
            w.putBits(0, 6); w.putBit(0)
            w.putBits(x(0).toLong & ((1L << sfBits) - 1), sfBits)
          case "verbatim" =>
            w.putBits(1, 6); w.putBit(0)
            x.foreach(v => w.putBits(v.toLong & ((1L << sfBits) - 1), sfBits))
          case "fixed2" =>
            require(bs > 2, "fixed2 needs blocks longer than the order")
            w.putBits(0x08 | 2, 6); w.putBit(0)
            x.take(2).foreach(v => w.putBits(v.toLong & ((1L << sfBits) - 1), sfBits))
            val resid = (2 until bs).map(i => x(i) - 2 * x(i - 1) + x(i - 2))
            // rice method 0, partition order 0, param fit to the residuals
            val mean = math.max(1L, resid.map(r => math.abs(r.toLong)).sum /
              math.max(1, resid.length))
            var param = 0
            while ((1L << param) < mean && param < 14) param += 1
            w.putBits(0, 2); w.putBits(0, 4); w.putBits(param, 4)
            resid.foreach { rv =>
              val u = (rv << 1) ^ (rv >> 31) // zigzag
              val q = u >>> param
              require(q < (1 << 20), "residual too large for test rice param")
              (0 until q).foreach(_ => w.putBit(0)); w.putBit(1)
              if (param > 0) w.putBits(u & ((1 << param) - 1), param)
            }
        }
      }
      w.align()
      val frameBytes = w.bytes.toSeq
      w.putBits(crc16(frameBytes), 16)
      out ++= w.toArray
      pos += bs
      frameIdx += 1
    }
    out.toArray
  }
}
