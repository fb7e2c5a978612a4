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
  * their Huffman tables (the MJPEG-without-DHT variant some hardware
  * emits) fail loudly with a targeted message rather than mis-decoding
  * — the documented boundary, same contract as progressive JPEG in the
  * image codec. `idx1` indexes are ignored: the `movi` list is walked
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
    * omit the DHT segment (hardware-encoder variant relying on the
    * spec's example tables) are the documented unsupported boundary —
    * detected and rejected loudly, never mis-decoded. */
  private[graft] def frameJpeg(b: Array[Byte], at: Int, len: Int,
      mediaId: Long, idx: Int): Array[Byte] = {
    val f = java.util.Arrays.copyOfRange(b, at, at + len)
    require(f.length >= 4 && (f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8,
      s"media $mediaId frame $idx: chunk is not a JPEG (no SOI) — " +
        "only MJPEG-in-AVI video is supported")
    // scan markers up to SOS for a DHT
    var p = 2
    var hasDht = false
    var done = false
    while (!done && p + 4 <= f.length) {
      if ((f(p) & 0xff) != 0xff) { done = true }
      else {
        val marker = f(p + 1) & 0xff
        if (marker == 0xff) p += 1 // fill byte before a marker
        else if (marker == 0xda) done = true
        else if (marker == 0xd8 || marker == 0x01 ||
            (marker >= 0xd0 && marker <= 0xd7)) p += 2 // length-less
        else {
          if (marker == 0xc4) hasDht = true
          val segLen = ((f(p + 2) & 0xff) << 8) | (f(p + 3) & 0xff)
          p += 2 + segLen
        }
      }
    }
    require(hasDht,
      s"media $mediaId frame $idx: MJPEG frame omits its Huffman tables " +
        "(DHT-less hardware variant) — unsupported, supply re-muxed input")
    f
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
