package graft.operators

/** Pure-JVM AIFF / AIFF-C PCM decode — the big-endian cousin of
  * RIFF/WAVE and the remaining uncompressed-audio crawl format. Like
  * [[Bmp]] (and unlike the metadata-only container walks), AIFF's
  * payload IS raw samples, so this is a FULL decoder: AIFFs land on
  * the same interleaved-PCM surface as WAV/FLAC, take real waveform
  * features, and spectrogram-fingerprint BIT-IDENTICALLY to a WAV of
  * the same PCM (the lossless-family property the dedup sink relies
  * on).
  *
  * Structure (EA IFF 85): a big-endian `FORM` container typed `AIFF`
  * or `AIFC`, a `COMM` chunk (channels, frame count, sample size, and
  * the sample rate as an 80-bit IEEE 754 extended-precision float —
  * the format's famous quirk, parsed exactly here), and an `SSND`
  * chunk (offset + block size + interleaved frames). AIFF-C names its
  * codec in `COMM`: `NONE` (big-endian PCM) and `sowt` (the
  * little-endian Mac variant) decode; compressed codecs (ulaw/ima4/…)
  * fail loudly — the [[Mpeg]] adjudication class.
  *
  * AIFF 8-bit samples are SIGNED (WAV's are unsigned) — normalized
  * here so the cross-format fingerprint property holds at every
  * supported depth (8/16 bits).
  *
  * Fail-loudly contract: bad magic, truncated chunks, a missing
  * COMM/SSND, a degenerate 80-bit rate, or an unsupported codec/depth
  * throws `IllegalArgumentException` with the media id. */
object Aiff {

  final case class AiffDecoded(sampleRate: Int, channels: Int, bits: Int,
      samples: Array[Int])

  private def u16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
  private def fourcc(b: Array[Byte], p: Int): String =
    new String(Array(b(p), b(p + 1), b(p + 2), b(p + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  /** The 80-bit extended-precision sample rate: sign(1) exponent(15)
    * mantissa(64, explicit integer bit); value = m · 2^(e−16383−63). */
  private[graft] def extended80(b: Array[Byte], p: Int, mediaId: Long): Int = {
    val exp = u16(b, p) & 0x7fff
    require((u16(b, p) & 0x8000) == 0,
      s"media $mediaId: negative AIFF sample rate")
    var mant = 0L
    var i = 0
    while (i < 8) { mant = (mant << 8) | (b(p + 2 + i) & 0xffL); i += 1 }
    require(exp != 0 || mant == 0L,
      s"media $mediaId: denormal AIFF sample rate")
    val shift = exp - 16383 - 63
    require(shift <= 0 && shift > -64,
      s"media $mediaId: absurd AIFF sample rate exponent $exp")
    val rate = mant >>> -shift
    require((rate << -shift) == mant,
      s"media $mediaId: non-integer AIFF sample rate")
    require(rate > 0 && rate <= 1000000L,
      s"media $mediaId: AIFF sample rate $rate out of range")
    rate.toInt
  }

  /** Decode an AIFF/AIFF-C payload to interleaved integer samples. */
  def decodeAiff(b: Array[Byte], mediaId: Long = -1L): AiffDecoded = {
    require(b.length >= 12, s"media $mediaId: payload too short for AIFF")
    require(fourcc(b, 0) == "FORM",
      s"media $mediaId: FORM magic missing — not an IFF payload")
    val formEnd = {
      val sz = u32(b, 4)
      require(8 + sz <= b.length, s"media $mediaId: FORM size overruns the payload")
      (8 + sz).toInt
    }
    val formType = fourcc(b, 8)
    require(formType == "AIFF" || formType == "AIFC",
      s"media $mediaId: IFF form type '$formType' is not AIFF/AIFC")
    var p = 12
    var channels = 0; var frames = 0L; var bits = 0; var rate = 0
    var littleEndian = false
    var sawComm = false
    var ssndAt = -1; var ssndLen = 0
    while (p + 8 <= formEnd) {
      val cc = fourcc(b, p)
      val sz = u32(b, p + 4).toInt
      val at = p + 8
      require(at + sz <= formEnd,
        s"media $mediaId: AIFF chunk '$cc' overruns the container")
      cc match {
        case "COMM" =>
          require(sz >= 18, s"media $mediaId: truncated COMM chunk")
          channels = u16(b, at)
          frames = u32(b, at + 2)
          bits = u16(b, at + 6)
          rate = extended80(b, at + 8, mediaId)
          if (formType == "AIFC") {
            require(sz >= 22, s"media $mediaId: AIFC COMM without a codec")
            fourcc(b, at + 18) match {
              case "NONE" => ()
              case "sowt" => littleEndian = true
              case codec => throw new IllegalArgumentException(
                s"media $mediaId: AIFC codec '$codec' decode refused " +
                  "(compressed codecs are out of clean-room scope)")
            }
          }
          sawComm = true
        case "SSND" =>
          require(sz >= 8, s"media $mediaId: truncated SSND chunk")
          val offset = u32(b, at).toInt
          require(offset >= 0 && 8 + offset <= sz,
            s"media $mediaId: SSND offset $offset out of range")
          ssndAt = at + 8 + offset
          ssndLen = sz - 8 - offset
        case _ => () // MARK/INST/COMT/… carry no samples
      }
      p = at + sz + (sz & 1) // IFF chunks are word-aligned
    }
    require(sawComm, s"media $mediaId: AIFF without a COMM chunk")
    require(ssndAt >= 0, s"media $mediaId: AIFF without an SSND chunk")
    require(channels > 0 && channels <= 64,
      s"media $mediaId: degenerate AIFF channel count $channels")
    require(bits == 8 || bits == 16,
      s"media $mediaId: AIFF sample size $bits unsupported (8/16-bit PCM)")
    val bytesPer = bits / 8
    val need = frames * channels * bytesPer
    require(need <= ssndLen,
      s"media $mediaId: SSND holds $ssndLen bytes, COMM promises $need")
    require(frames * channels <= (64L << 20),
      s"media $mediaId: absurd AIFF sample count")
    val n = (frames * channels).toInt
    val out = new Array[Int](n)
    var i = 0
    if (bits == 16) {
      while (i < n) {
        val at = ssndAt + i * 2
        val v =
          if (littleEndian) ((b(at + 1) << 8) | (b(at) & 0xff)).toShort
          else ((b(at) << 8) | (b(at + 1) & 0xff)).toShort
        out(i) = v.toInt
        i += 1
      }
    } else {
      while (i < n) { out(i) = b(ssndAt + i).toInt; i += 1 } // signed 8-bit
    }
    AiffDecoded(rate, channels, bits, out)
  }

  // -- generator (staging/spec counterpart) ------------------------------

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private[graft] def writeExtended80(rate: Int): Array[Byte] = {
    require(rate > 0, "degenerate rate")
    val hi = 63 - java.lang.Long.numberOfLeadingZeros(rate.toLong)
    val exp = 16383 + hi
    val mant = rate.toLong << (63 - hi)
    be16(exp.toInt) ++ be32(mant >>> 32) ++ be32(mant & 0xffffffffL)
  }

  /** Serialize interleaved samples as AIFF (big-endian PCM) or, with
    * `sowt`, as AIFF-C little-endian — the Mac-native twin the decoder
    * must treat identically. */
  def writeAiff(rate: Int, channels: Int, bits: Int, samples: Array[Int],
      sowt: Boolean = false): Array[Byte] = {
    require(bits == 8 || bits == 16, s"writeAiff: bits $bits")
    require(samples.length % channels == 0, "writeAiff: ragged frames")
    val frames = samples.length / channels
    val bytesPer = bits / 8
    val data = new Array[Byte](samples.length * bytesPer)
    var i = 0
    while (i < samples.length) {
      if (bits == 16) {
        if (sowt) {
          data(i * 2) = (samples(i) & 0xff).toByte
          data(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
        } else {
          data(i * 2) = ((samples(i) >> 8) & 0xff).toByte
          data(i * 2 + 1) = (samples(i) & 0xff).toByte
        }
      } else data(i) = samples(i).toByte
      i += 1
    }
    val aifc = sowt
    val comm = {
      val codec =
        if (!aifc) Array.emptyByteArray
        else "sowt".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
          Array[Byte](0, 0) // empty pascal-string codec name, padded
      be16(channels) ++ be32(frames.toLong) ++ be16(bits) ++
        writeExtended80(rate) ++ codec
    }
    val chunks =
      chunk("COMM", comm) ++
        chunk("SSND", be32(0L) ++ be32(0L) ++ data)
    "FORM".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      be32((4 + chunks.length).toLong) ++
      (if (aifc) "AIFC" else "AIFF")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ chunks
  }

  private def chunk(cc: String, payload: Array[Byte]): Array[Byte] = {
    val pad = if (payload.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
    cc.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      be32(payload.length.toLong) ++ payload ++ pad
  }
}
