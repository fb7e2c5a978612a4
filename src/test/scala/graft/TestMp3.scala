package graft

import graft.operators.Mpeg
import scala.collection.mutable.ArrayBuffer

/** Minimal MPEG-1 audio generators for planted tests: a real Layer I
  * encoder (analysis filterbank → scalefactor fit → mid-rise quantizer
  * → frame pack) sharing `Mpeg.analysisWindow` so the encode/decode
  * pair is the documented near-PR unit, a raw Layer I frame builder for
  * subband-layer exactness tests, and Layer III/II header-only streams
  * (optionally with Xing tags) for the metadata walker. Test-only; the
  * production decoder is `graft.operators.Mpeg`. */
object TestMp3 {

  private final class BitWriter {
    val bytes = new ArrayBuffer[Byte]()
    private var cur = 0
    private var nb = 0
    def putBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1L).toInt; nb += 1
        if (nb == 8) { bytes += cur.toByte; cur = 0; nb = 0 }
        i -= 1
      }
    }
    def padToByte(): Unit = while (nb != 0) putBits(0, 1)
    def toArray: Array[Byte] = { require(nb == 0); bytes.toArray }
  }

  private def rateIndex(rate: Int): Int = rate match {
    case 44100 => 0
    case 48000 => 1
    case 32000 => 2
    case _ => throw new IllegalArgumentException(s"MPEG-1 rate $rate")
  }

  private def header(layerBits: Int, brIdx: Int, rate: Int, mode: Int,
      modeExt: Int = 0): Long =
    (0x7ffL << 21) | (3L << 19) | (layerBits.toLong << 17) | (1L << 16) |
      (brIdx.toLong << 12) | (rateIndex(rate).toLong << 10) |
      (mode.toLong << 6) | (modeExt.toLong << 4)

  /** Frame payload capacity (bits) at MPEG-1 Layer I 448 kbps. */
  private def l1FrameBytes(rate: Int): Int = 12 * 448000 / rate * 4

  /** Largest scalefactor index whose value still covers `maxAbs`
    * (table is decreasing; index 62 is the smallest legal value). */
  private def scfFor(maxAbs: Double): Int = {
    var idx = 62
    while (idx > 0 && Mpeg.ScaleFactors(idx) < maxAbs) idx -= 1
    idx
  }

  /** Real Layer I encode: channel-interleaved 16-bit-range `samples` →
    * a CBR 448 kbps MPEG-1 Layer I stream. Subbands whose frame-max
    * amplitude is below `silence` get allocation 0; active subbands
    * code at `nb` bits. Input is padded to whole frames (384 samples
    * per channel). */
  def layer1(rate: Int, channels: Int, samples: Array[Int],
      nb: Int = 15, silence: Double = 1e-6): Array[Byte] = {
    require(channels == 1 || channels == 2)
    require(samples.length % channels == 0)
    require(nb >= 2 && nb <= 15)
    val nIn = samples.length / channels
    val nFrames = (nIn + 383) / 384
    val n = nFrames * 384
    // per-channel analysis: S(ch)(granule)(sb)
    val S = Array.ofDim[Double](channels, n / 32, 32)
    var ch = 0
    while (ch < channels) {
      val ana = new Mpeg.AnalysisWith(Mpeg.analysisWindow)
      val in = new Array[Double](32)
      var g = 0
      while (g < n / 32) {
        var i = 0
        while (i < 32) {
          val t = g * 32 + i
          in(i) = if (t < nIn) samples(t * channels + ch) / 32768.0 else 0.0
          i += 1
        }
        ana.granule(in, S(ch)(g))
        g += 1
      }
      ch += 1
    }
    val w = new BitWriter
    val frameBytes = l1FrameBytes(rate)
    val mode = if (channels == 1) 3 else 0
    var f = 0
    while (f < nFrames) {
      val start = w.bytes.length
      w.putBits(header(3, 14, rate, mode), 32) // layer I, 448 kbps, no CRC
      val alloc = Array.ofDim[Int](channels, 32)
      val scf = Array.ofDim[Int](channels, 32)
      // near-PR analysis leaks tiny energy into EVERY subband — budget
      // the frame: subbands in descending amplitude get nb bits until
      // the frame is full, the rest code nothing (their amplitude is
      // leakage-scale, covered by the round-trip error bound)
      val amps = scala.collection.mutable.ArrayBuffer.empty[(Double, Int, Int)]
      var c = 0
      while (c < channels) {
        var sb = 0
        while (sb < 32) {
          var mx = 0.0
          var s = 0
          while (s < 12) {
            mx = math.max(mx, math.abs(S(c)(f * 12 + s)(sb))); s += 1
          }
          if (mx > silence) amps += ((mx, c, sb))
          sb += 1
        }
        c += 1
      }
      var budget = frameBytes * 8 - 32 - 32 * 4 * channels
      amps.sortBy(-_._1).foreach { case (mx, ac, sb) =>
        val cost = 6 + 12 * nb
        if (budget >= cost) {
          alloc(ac)(sb) = nb - 1
          scf(ac)(sb) = scfFor(mx)
          budget -= cost
        }
      }
      var sb = 0
      while (sb < 32) {
        var c2 = 0
        while (c2 < channels) { w.putBits(alloc(c2)(sb), 4); c2 += 1 }
        sb += 1
      }
      sb = 0
      while (sb < 32) {
        var c2 = 0
        while (c2 < channels) {
          if (alloc(c2)(sb) != 0) w.putBits(scf(c2)(sb), 6)
          c2 += 1
        }
        sb += 1
      }
      var s = 0
      while (s < 12) {
        sb = 0
        while (sb < 32) {
          var c2 = 0
          while (c2 < channels) {
            if (alloc(c2)(sb) != 0) {
              val bitsN = alloc(c2)(sb) + 1
              val full = 1 << bitsN
              val sf = Mpeg.ScaleFactors(scf(c2)(sb))
              val v = math.max(-1.0, math.min(1.0, S(c2)(f * 12 + s)(sb) / sf))
              // inverse of s'' = (2c + 1 − 2^nb)/(2^nb − 1)
              val code = StrictMath.rint((v * (full - 1) + full - 1) / 2.0).toInt
              w.putBits(math.max(0, math.min(full - 1, code)), bitsN)
            }
            c2 += 1
          }
          sb += 1
        }
        s += 1
      }
      w.padToByte()
      val used = w.bytes.length - start
      require(used <= frameBytes,
        s"planted Layer I frame overflow: $used > $frameBytes bytes " +
          "(too many active subbands for the test bitrate)")
      (used until frameBytes).foreach(_ => w.putBits(0, 8))
      f += 1
    }
    w.toArray
  }

  /** Raw mono Layer I frame from explicit alloc/scf/codes — the
    * subband-layer exactness surface (no DSP, pure bit layout). */
  def layer1Planted(rate: Int, alloc: Array[Int], scf: Array[Int],
      codes: Array[Array[Int]]): Array[Byte] = {
    require(alloc.length == 32 && scf.length == 32 && codes.length == 12)
    val w = new BitWriter
    w.putBits(header(3, 14, rate, 3), 32)
    alloc.foreach(a => w.putBits(a, 4))
    (0 until 32).foreach(sb => if (alloc(sb) != 0) w.putBits(scf(sb), 6))
    for (s <- 0 until 12; sb <- 0 until 32 if alloc(sb) != 0)
      w.putBits(codes(s)(sb), alloc(sb) + 1)
    w.padToByte()
    val frameBytes = l1FrameBytes(rate)
    require(w.bytes.length <= frameBytes, "planted frame overflow")
    (w.bytes.length until frameBytes).foreach(_ => w.putBits(0, 8))
    w.toArray
  }

  /** Layer III (or II) CBR stream of `frames` zero-payload frames —
    * the metadata-walker surface. `xingFrames` plants a Xing (VBR) or
    * Info (CBR) tag at the spec offset in the first frame. */
  def layerStub(layer: Int, rate: Int, kbps: Int, frames: Int,
      mode: Int = 3, xingFrames: Option[Int] = None,
      xingVbr: Boolean = true): Array[Byte] = {
    val layerBits = 4 - layer
    val brTable = layer match {
      case 2 => Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
      case 3 => Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
      case _ => throw new IllegalArgumentException("use layer1() for Layer I")
    }
    val brIdx = brTable.indexOf(kbps) + 1
    require(brIdx > 0, s"kbps $kbps not in the Layer $layer table")
    val frameBytes = 144 * kbps * 1000 / rate
    val out = new ArrayBuffer[Byte]()
    var f = 0
    while (f < frames) {
      val h = header(layerBits, brIdx, rate, mode)
      out += ((h >>> 24) & 0xff).toByte += ((h >>> 16) & 0xff).toByte +=
        ((h >>> 8) & 0xff).toByte += (h & 0xff).toByte
      val payload = new Array[Byte](frameBytes - 4)
      if (f == 0) xingFrames.foreach { nf =>
        val sideInfo = if (layer == 3) { if (mode == 3) 17 else 32 } else 0
        val tag = if (xingVbr) "Xing" else "Info"
        var p = sideInfo
        tag.foreach { c => payload(p) = c.toByte; p += 1 }
        payload(p + 3) = 1 // flags: frames present
        p += 4
        payload(p) = ((nf >> 24) & 0xff).toByte
        payload(p + 1) = ((nf >> 16) & 0xff).toByte
        payload(p + 2) = ((nf >> 8) & 0xff).toByte
        payload(p + 3) = (nf & 0xff).toByte
      }
      out ++= payload
      f += 1
    }
    out.toArray
  }

  /** Wrap a stream in ID3v2 (syncsafe size) and ID3v1 tags. */
  def withId3(stream: Array[Byte], v2Bytes: Int = 200): Array[Byte] = {
    val v2 = new Array[Byte](10 + v2Bytes)
    v2(0) = 'I'; v2(1) = 'D'; v2(2) = '3'; v2(3) = 4
    v2(6) = ((v2Bytes >> 21) & 0x7f).toByte
    v2(7) = ((v2Bytes >> 14) & 0x7f).toByte
    v2(8) = ((v2Bytes >> 7) & 0x7f).toByte
    v2(9) = (v2Bytes & 0x7f).toByte
    val v1 = new Array[Byte](128)
    v1(0) = 'T'; v1(1) = 'A'; v1(2) = 'G'
    v2 ++ stream ++ v1
  }
}
