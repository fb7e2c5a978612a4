package graft

/** Minimal RIFF/WAVE encoder for planted tests: PCM little-endian, 8 or
  * 16 bit. Test-only; the production codec is `Multimodal.decodeWav` /
  * `monoSamples`. */
object TestWav {

  def apply(sampleRate: Int, channels: Int, bits: Int,
      samples: Seq[Int], fmtTag: Int = 1): Array[Byte] = {
    val bps = bits / 8
    val dataLen = samples.length * bps
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    out.write("RIFF".getBytes("US-ASCII")); w32(36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(fmtTag); w16(channels); w32(sampleRate)
    w32(sampleRate * channels * bps); w16(channels * bps); w16(bits)
    out.write("data".getBytes("US-ASCII")); w32(dataLen)
    samples.foreach { s =>
      if (bits == 8) out.write(s & 0xff)
      else if (bits == 16) w16(s)
      else if (bits == 24) { out.write(s & 0xff); w16((s >> 8) & 0xffff) }
      else w32(s)
    }
    out.toByteArray
  }

  /** IEEE float32 WAV (format tag 3) of unit-range samples. */
  def float32(sampleRate: Int, channels: Int,
      samples: Seq[Float]): Array[Byte] = {
    val dataLen = samples.length * 4
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    out.write("RIFF".getBytes("US-ASCII")); w32(36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(3); w16(channels); w32(sampleRate)
    w32(sampleRate * channels * 4); w16(channels * 4); w16(32)
    out.write("data".getBytes("US-ASCII")); w32(dataLen)
    samples.foreach(s => w32(java.lang.Float.floatToIntBits(s)))
    out.toByteArray
  }

  /** IEEE float64 WAV (format tag 3, 64-bit). */
  def float64(sampleRate: Int, channels: Int,
      samples: Seq[Double]): Array[Byte] = {
    val dataLen = samples.length * 8
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    out.write("RIFF".getBytes("US-ASCII")); w32(36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(3); w16(channels); w32(sampleRate)
    w32(sampleRate * channels * 8); w16(channels * 8); w16(64)
    out.write("data".getBytes("US-ASCII")); w32(dataLen)
    samples.foreach { s =>
      val bits = java.lang.Double.doubleToLongBits(s)
      w32((bits & 0xffffffffL).toInt); w32((bits >>> 32).toInt)
    }
    out.toByteArray
  }

  /** WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapper: the 40-byte fmt chunk
    * whose SubFormat GUID leads with the wrapped tag. 16-bit PCM body. */
  def extensiblePcm16(sampleRate: Int, channels: Int,
      samples: Seq[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    out.write("RIFF".getBytes("US-ASCII")); w32(60 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(40)
    w16(0xfffe); w16(channels); w32(sampleRate)
    w32(sampleRate * channels * 2); w16(channels * 2); w16(16)
    w16(22) // cbSize
    w16(16) // valid bits
    w32(0)  // channel mask
    // SubFormat GUID: KSDATAFORMAT_SUBTYPE_PCM = 00000001-0000-0010-...
    w16(1); w16(0); w16(0); w16(0x10)
    Seq(0x80, 0x00, 0x00, 0xaa, 0x00, 0x38, 0x9b, 0x71).foreach(out.write)
    out.write("data".getBytes("US-ASCII")); w32(dataLen)
    samples.foreach(w16)
    out.toByteArray
  }

  /** 16-bit sample stream of a tone mixture over a band-limited
    * broadband "bed" (30 fixed faint sines, 63..1890 Hz — real audio is
    * broadband, and a fingerprint's empty analysis bands need signal,
    * not leakage noise). `gain` scales EVERYTHING (a pure re-level).
    * Deterministic (StrictMath). */
  def toneSamples(rate: Int, seconds: Double,
      tones: Seq[(Double, Double)], gain: Double = 1.0,
      bed: Boolean = true): IndexedSeq[Int] = {
    val n = (rate * seconds).toInt
    (0 until n).map { i =>
      val t = i.toDouble / rate
      var v = tones.map { case (f, a) =>
        a * StrictMath.sin(2 * StrictMath.PI * f * t) }.sum
      if (bed) {
        var j = 1
        while (j <= 30) {
          v += 0.02 * StrictMath.sin(2 * StrictMath.PI * (63.0 * j) * t + 0.7 * j * j)
          j += 1
        }
      }
      ((v * gain).max(-0.999).min(0.999) * 32767).toInt
    }
  }

  /** 16-bit mono WAV of [[toneSamples]]. */
  def toneMix(rate: Int, seconds: Double, tones: Seq[(Double, Double)],
      gain: Double = 1.0, bed: Boolean = true): Array[Byte] =
    apply(rate, 1, 16, toneSamples(rate, seconds, tones, gain, bed))
}
