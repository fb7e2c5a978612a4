package graft.operators

/** Pure-JVM WebP metadata walk — the remaining major crawl image
  * format after PNG/GIF/JPEG (all of which decode fully in
  * [[Multimodal]]). WebP is a RIFF container ("RIFF" size "WEBP")
  * whose image chunk takes one of three public forms, each carrying
  * its dimensions in a fixed header prefix:
  *
  *  - `VP8 ` (lossy): 3-byte frame tag (keyframe bit, version,
  *    first-partition size), the 0x9D012A start code, then 14-bit
  *    width/height with 2-bit upscale codes (RFC 6386 §9.1);
  *  - `VP8L` (lossless): the 0x2F signature byte, then 14-bit
  *    width-1 / height-1, the alpha-hint bit, and a 3-bit version
  *    packed LSB-first;
  *  - `VP8X` (extended): a flags byte (alpha, animation, EXIF, XMP,
  *    ICC) and a 24-bit little-endian canvas width-1 / height-1.
  *
  * Pixel DECODE is refused for all three — VP8's bool-coder/predictor
  * tier and VP8L's entropy-coded transform stack are the same
  * non-derivable-spec-data class as MPEG Layer III (the [[Mpeg]]
  * adjudication) — so WebP takes the metadata tier in
  * [[Multimodal.decodeFeatures]] (exact dimensions, alpha/animation
  * flags) and the unhashable pass-through in the media dedup sink (a
  * perceptual hash needs pixels; hashing container bytes would imply
  * a dedup that never fires).
  *
  * Fail-loudly contract: missing RIFF/WEBP magic, truncated chunks, a
  * bad start code/signature, or an image-chunk-less container throw
  * `IllegalArgumentException` with the media id. */
object Webp {

  /** `format` is `lossy`, `lossless`, or `extended` (VP8X, canvas
    * dimensions). `hasAlpha`/`hasAnimation` are false where the form
    * cannot express them (lossy). */
  final case class WebpInfo(format: String, width: Int, height: Int,
      hasAlpha: Boolean, hasAnimation: Boolean, nChunks: Int)

  private def u16le(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def u24le(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16)
  private def u32le(b: Array[Byte], p: Int): Long =
    (u24le(b, p) & 0xffffffL) | ((b(p + 3) & 0xffL) << 24)
  private def fourcc(b: Array[Byte], p: Int): String =
    new String(Array(b(p), b(p + 1), b(p + 2), b(p + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  /** Exact metadata of a WebP payload. For VP8X containers the
    * dimensions are the CANVAS size (what a catalog reports); the
    * inner still/animation frames are not walked further. */
  def webpInfo(b: Array[Byte], mediaId: Long = -1L): WebpInfo = {
    require(b.length >= 20, s"media $mediaId: payload too short for WebP")
    require(fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "WEBP",
      s"media $mediaId: RIFF/WEBP magic missing — not a WebP payload")
    val riffEnd = {
      val sz = u32le(b, 4)
      require(8 + sz <= b.length,
        s"media $mediaId: RIFF size overruns the payload")
      (8 + sz).toInt
    }
    var p = 12
    var nChunks = 0
    var info: WebpInfo = null
    while (p + 8 <= riffEnd) {
      val cc = fourcc(b, p)
      val sz = u32le(b, p + 4)
      val at = p + 8
      require(at + sz <= riffEnd,
        s"media $mediaId: WebP chunk '$cc' overruns the container")
      nChunks += 1
      if (info == null) cc match {
        case "VP8 " =>
          require(sz >= 10, s"media $mediaId: truncated VP8 frame header")
          // 3-byte frame tag: bit 0 = interframe flag (0 for the still)
          require((b(at) & 0x01) == 0,
            s"media $mediaId: VP8 still whose first frame is not a keyframe")
          require((b(at + 3) & 0xff) == 0x9d && (b(at + 4) & 0xff) == 0x01 &&
              (b(at + 5) & 0xff) == 0x2a,
            s"media $mediaId: VP8 start code missing")
          // 14-bit dimensions; top 2 bits are the upscale code
          info = WebpInfo("lossy", u16le(b, at + 6) & 0x3fff,
            u16le(b, at + 8) & 0x3fff, hasAlpha = false,
            hasAnimation = false, 0)
        case "VP8L" =>
          require(sz >= 5, s"media $mediaId: truncated VP8L header")
          require((b(at) & 0xff) == 0x2f,
            s"media $mediaId: VP8L signature byte missing")
          // LSB-first bitstream: 14-bit width-1, 14-bit height-1,
          // 1 alpha hint, 3-bit version (must be 0)
          val bits = u32le(b, at + 1)
          val w = ((bits & 0x3fff) + 1).toInt
          val h = (((bits >> 14) & 0x3fff) + 1).toInt
          val alpha = ((bits >> 28) & 1) == 1
          require(((bits >> 29) & 0x7) == 0,
            s"media $mediaId: unsupported VP8L version ${(bits >> 29) & 0x7}")
          info = WebpInfo("lossless", w, h, alpha, hasAnimation = false, 0)
        case "VP8X" =>
          require(sz >= 10, s"media $mediaId: truncated VP8X header")
          val flags = b(at) & 0xff
          info = WebpInfo("extended",
            u24le(b, at + 4) + 1, u24le(b, at + 7) + 1,
            hasAlpha = (flags & 0x10) != 0,
            hasAnimation = (flags & 0x02) != 0, 0)
        case _ => () // ALPH/ANMF/EXIF/XMP/ICCP before/after the image chunk
      }
      p = at + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    require(p == riffEnd,
      s"media $mediaId: WebP chunk walk overruns the RIFF size at $p")
    require(info != null,
      s"media $mediaId: WebP container without a VP8 /VP8L/VP8X chunk")
    info.copy(nChunks = nChunks)
  }

  // -- generator (staging/spec counterpart) ------------------------------

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le24(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    le24((v & 0xffffff).toInt) :+ ((v >> 24) & 0xff).toByte

  private def chunk(cc: String, payload: Array[Byte]): Array[Byte] = {
    val head = cc.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      le32(payload.length.toLong)
    val pad = if (payload.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
    head ++ payload ++ pad
  }

  private def riff(chunks: Array[Byte]): Array[Byte] =
    "RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      le32((4 + chunks.length).toLong) ++
      "WEBP".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ chunks

  /** Serialize a structurally VALID WebP of the requested `form`
    * (`lossy` / `lossless` / `extended`) with exact header dimensions
    * and deterministic OPAQUE coded bytes after the header — the
    * walker never decodes pixels, the honest boundary. */
  def writeWebp(form: String, width: Int, height: Int,
      alpha: Boolean = false, animation: Boolean = false,
      seed: Long = 7L): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0x3fff && height <= 0x3fff,
      s"degenerate WebP dimensions ${width}x$height")
    val opaque = Array.tabulate[Byte](64 + (seed % 37).toInt)(j =>
      ((seed * 131 + j * 7) & 0xff).toByte)
    form match {
      case "lossy" =>
        require(!alpha && !animation, "the lossy still form carries neither")
        val tag = Array[Byte](0x10, 0, 0) // keyframe, version 0, show_frame
        val header = tag ++ Array[Byte](0x9d.toByte, 0x01, 0x2a) ++
          le16(width) ++ le16(height)
        riff(chunk("VP8 ", header ++ opaque))
      case "lossless" =>
        require(!animation, "the lossless still form carries no animation")
        val bits = (width - 1).toLong | ((height - 1).toLong << 14) |
          (if (alpha) 1L << 28 else 0L)
        riff(chunk("VP8L", Array[Byte](0x2f) ++ le32(bits) ++ opaque))
      case "extended" =>
        val flags = (if (alpha) 0x10 else 0) | (if (animation) 0x02 else 0)
        val vp8x = Array[Byte](flags.toByte, 0, 0, 0) ++
          le24(width - 1) ++ le24(height - 1)
        // a plausible body: an ALPH chunk when flagged, then the still
        val alph = if (alpha) chunk("ALPH", opaque.take(16)) else Array.emptyByteArray
        val still = {
          val tag = Array[Byte](0x10, 0, 0)
          chunk("VP8 ", tag ++ Array[Byte](0x9d.toByte, 0x01, 0x2a) ++
            le16(width) ++ le16(height) ++ opaque)
        }
        riff(chunk("VP8X", vp8x) ++ alph ++ still)
      case f => throw new IllegalArgumentException(s"unknown WebP form '$f'")
    }
  }
}
