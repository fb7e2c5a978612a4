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
    samples.foreach(s => if (bits == 8) out.write(s & 0xff) else w16(s))
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
