package graft.operators

/** Pure-JVM AVI (RIFF) container walk for MJPEG video — the VIDEO face
  * of the multimodal tier. The other modalities decode for real
  * (PPM/PNG/GIF/JPEG images, WAV/FLAC audio); video's common
  * self-describing case is Motion-JPEG in an AVI container (the classic
  * camera/webcam format, still a real crawl presence), where every
  * frame IS a baseline JPEG — so frame sampling reduces to a container
  * walk plus the [[Multimodal.decodeJpegCanvas]] codec this module
  * already owns. No new entropy coder, no native deps: RIFF is
  * fourcc + little-endian size chunks (`avih` for dims/frame timing,
  * `movi` for the frame stream), public layout since 1992.
  *
  * Coverage: single-video-stream AVIs whose `##dc`/`##db` chunks carry
  * JPEG payloads (fccHandler `MJPG`/`mjpg`/`dmb1`). Frames that omit
  * their Huffman tables (the DHT-less variant most hardware encoders
  * emit) get the ITU T.81 Annex K "typical" tables spliced in before
  * the SOS — which is what the MJPEG convention PRESCRIBES for such
  * frames, so the splice is the spec'd decode, not a guess (AviSpec
  * proves a stripped frame decodes bit-identically to its tabled
  * original). `idx1` indexes are ignored: the `movi` list is walked
  * sequentially, which needs no index and cannot be lied to by one.
  *
  * Fail-loudly contract throughout ([[Multimodal]] codec rule):
  * malformed RIFF framing, a size field past the payload, or zero video
  * frames throw `IllegalArgumentException` with the media id.
  */
object Avi {

  /** Container-level metadata off the `avih` header. */
  final case class AviInfo(width: Int, height: Int, totalFrames: Int,
      microSecPerFrame: Int)

  /** Parse the container: header info + the byte ranges of the video
    * frame chunks (stream 0 `dc`/`db`), in stream order. */
  private[graft] def parseAvi(b: Array[Byte], mediaId: Long)
      : (AviInfo, Vector[(Int, Int)]) = {
    def u32(p: Int): Long = {
      require(p + 4 <= b.length, s"media $mediaId: truncated AVI at byte $p")
      (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
    }
    def fourcc(p: Int): String = {
      require(p + 4 <= b.length, s"media $mediaId: truncated AVI at byte $p")
      new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
    }
    require(b.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "AVI ",
      s"media $mediaId: not an AVI payload (RIFF/AVI header missing)")

    var info: AviInfo = null
    val frames = Vector.newBuilder[(Int, Int)]

    // walk chunks in [from, until); recurse into LIST chunks
    def walk(from: Int, until: Int): Unit = {
      var p = from
      while (p + 8 <= until) {
        val id = fourcc(p)
        val sz = u32(p + 4)
        require(sz <= Int.MaxValue && p + 8 + sz <= until,
          s"media $mediaId: AVI chunk '$id' size $sz overruns its parent")
        val dataAt = p + 8
        val dataEnd = dataAt + sz.toInt
        if (id == "LIST") {
          walk(dataAt + 4, dataEnd) // skip the 4-byte list type
        } else if (id == "avih") {
          require(sz >= 40, s"media $mediaId: avih chunk too short ($sz)")
          info = AviInfo(
            width = u32(dataAt + 32).toInt, height = u32(dataAt + 36).toInt,
            totalFrames = u32(dataAt + 16).toInt,
            microSecPerFrame = u32(dataAt).toInt)
        } else if ((id == "00dc" || id == "00db") && sz > 0) {
          frames += ((dataAt, sz.toInt))
        }
        p = dataEnd + (sz.toInt & 1) // chunks are word-aligned
      }
    }
    walk(12, b.length)
    require(info != null, s"media $mediaId: AVI without an avih header")
    val fs = frames.result()
    require(fs.nonEmpty, s"media $mediaId: AVI carries no video frames")
    (info, fs)
  }

  /** A frame's bytes as a standalone JPEG payload. MJPEG frames that
    * omit the DHT segment — the hardware-encoder variant, which the
    * OpenDML/MJPEG convention defines as using the ITU T.81 Annex K
    * "typical" tables — get those exact tables SPLICED in before the
    * SOS, which is the convention's prescribed decode, not a guess. A
    * frame with its own DHT passes through untouched. */
  private[graft] def frameJpeg(b: Array[Byte], at: Int, len: Int,
      mediaId: Long, idx: Int): Array[Byte] = {
    val f = java.util.Arrays.copyOfRange(b, at, at + len)
    require(f.length >= 4 && (f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8,
      s"media $mediaId frame $idx: chunk is not a JPEG (no SOI) — " +
        "only MJPEG-in-AVI video is supported")
    // scan markers up to SOS for a DHT
    var p = 2
    var hasDht = false
    var sosAt = -1
    while (sosAt < 0 && p + 4 <= f.length) {
      if ((f(p) & 0xff) != 0xff) { p = f.length }
      else {
        val marker = f(p + 1) & 0xff
        if (marker == 0xff) p += 1 // fill byte before a marker
        else if (marker == 0xda) sosAt = p
        else if (marker == 0xd8 || marker == 0x01 ||
            (marker >= 0xd0 && marker <= 0xd7)) p += 2 // length-less
        else {
          if (marker == 0xc4) hasDht = true
          val segLen = ((f(p + 2) & 0xff) << 8) | (f(p + 3) & 0xff)
          p += 2 + segLen
        }
      }
    }
    if (hasDht || sosAt < 0) f
    else {
      val out = new Array[Byte](f.length + StandardDht.length)
      System.arraycopy(f, 0, out, 0, sosAt)
      System.arraycopy(StandardDht, 0, out, sosAt, StandardDht.length)
      System.arraycopy(f, sosAt, out, sosAt + StandardDht.length,
        f.length - sosAt)
      out
    }
  }

  // ITU T.81 Annex K "typical" Huffman tables as one DHT segment
  // (DC/AC luminance id 0, DC/AC chrominance id 1) — the tables the
  // MJPEG convention mandates for DHT-less frames. Public spec data.
  private val StandardDht: Array[Byte] = {
    val dcL = (Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
      (0 to 11).toArray)
    val dcC = (Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
      (0 to 11).toArray)
    val acL = (Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125),
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
    val acC = (Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119),
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
    val tables = Seq((0x00, dcL), (0x10, acL), (0x01, dcC), (0x11, acC))
    val body = tables.flatMap { case (id, (counts, values)) =>
      id +: (counts ++ values)
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xc4)
    val len = body.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    body.foreach(v => out.write(v & 0xff))
    out.toByteArray
  }

  /** Every `every`-th video frame as an `image/jpeg`
    * [[Multimodal.MediaFrame]] — the AVI face of
    * [[Multimodal.gifFrameSample]], bridging video into the image tier
    * (`decodeFeatures` on the emitted frames, pHash dedup, …). Non-AVI
    * rows are REJECTED, not byte-windowed; `maxFrames` bounds hostile
    * containers. Typed mapPartitions, narrow, zero shuffle. */
  def aviFrameSample(ds: org.apache.spark.sql.Dataset[Multimodal.Media],
      every: Int = 1, maxFrames: Int = 256)
      : org.apache.spark.sql.Dataset[Multimodal.MediaFrame] = {
    require(every >= 1, s"every must be >= 1: $every")
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.flatMap { m =>
        require(m.kind == "video/avi" || m.kind == "video/x-msvideo",
          s"media ${m.media_id}: aviFrameSample expects video/avi, got ${m.kind}")
        val (_, chunks) = parseAvi(m.bytes, m.media_id)
        chunks.take(maxFrames).zipWithIndex.collect {
          case ((at, len), i) if i % every == 0 =>
            Multimodal.MediaFrame(m.media_id, "image/jpeg", i,
              frameJpeg(m.bytes, at, len, m.media_id, i))
        }
      }
    }
  }

  /** REAL codec for `video/avi`: the FIRST frame through the baseline
    * JPEG decoder → the shared 16-dim feature layout, dims from the
    * decoded frame (authoritative over the header), `features(3)`
    * carries the aspect ratio like every image codec. The whole-clip
    * signature for dedup is [[aviFrameSample]] + the image pHash over
    * sampled frames — one frame's features here make `decodeFeatures`
    * total over the modality, same contract as [[Multimodal.decodeGif]]
    * (first composed frame). */
  def decodeAvi(m: Multimodal.Media): Multimodal.MediaFeatures = {
    val (_, chunks) = parseAvi(m.bytes, m.media_id)
    val (at, len) = chunks.head
    val jf = Multimodal.Media(m.media_id, "image/jpeg",
      frameJpeg(m.bytes, at, len, m.media_id, 0))
    Multimodal.decodeJpeg(jf).copy(
      kind = m.kind, n_bytes = m.bytes.length)
  }
}
