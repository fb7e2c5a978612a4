package graft.operators

/** Pure-JVM MPEG-1/2 audio (ISO/IEC 11172-3 / 13818-3) — the
  * `audio/mpeg` face of the media tier, closing the crawl-audio gap the
  * WAV/FLAC codecs left (most crawl audio ships as MPEG frames).
  *
  * What is EXACT here (formula- or small-table-defined by the public
  * spec, fully reproducible clean-room):
  *
  *   - the frame walker: 32-bit header fields, the bitrate and
  *     sample-rate tables for every (version, layer), slot-based frame
  *     sizing with padding, CRC-16 presence, ID3v2 (syncsafe size,
  *     footer flag) and ID3v1 tags, Xing/Info and VBRI headers for VBR
  *     frame counts — so `audio/mpeg` responses get REAL duration /
  *     rate / channel / bitrate metadata ([[mpegInfo]]);
  *   - MPEG-1 Layer I sample decode ([[decodeLayer1]]): 4-bit
  *     allocations, 6-bit scalefactors (the B.1 table IS the formula
  *     2^(1 − idx/3)), the mid-rise requantizer
  *     s'' = (2·c + 1 − 2^nb) / (2^nb − 1), intensity-stereo bound
  *     handling, 12-granule layout — bit-exact, asserted against
  *     planted frames in Mp3Spec (the FLAC precedent, at the subband
  *     layer where Layer I is lossless);
  *   - the 32-band synthesis filterbank STRUCTURE (the cosine
  *     modulation cos((16+i)(2k+1)π/64) is spec formula).
  *
  * What the spec defines as normative DATA TABLES that a clean-room
  * offline build cannot reproduce and this codec deliberately does NOT
  * guess:
  *
  *   - the 512-tap prototype window (ISO table 3-B.3 / annex B): this
  *     implementation substitutes a formula-designed Kaiser-windowed
  *     sinc near-PR prototype. Within this library's own
  *     analysis/synthesis pair the round-trip error is bounded and
  *     asserted in Mp3Spec; against FOREIGN encoders the window
  *     mismatch adds a small spectral deviation (inaudible-scale,
  *     irrelevant to the banded-Hamming fingerprint tier this feeds,
  *     but documented: Layer I PCM from other encoders is close, not
  *     spec-exact);
  *   - the Layer II allocation-class tables (B.2a–d) and the 34 Layer
  *     III Huffman code tables: these are pages of arbitrary normative
  *     data. GUESSED tables would not fail — they would silently
  *     decode every foreign file to plausible garbage, poisoning the
  *     dedup/fingerprint tiers downstream, which is strictly worse
  *     than the fail-loud contract. Layer II/III therefore decode
  *     METADATA exactly (framing, duration, rates — what the corpus
  *     report and media catalog need) and refuse sample decode with a
  *     clear error ([[decodeSamples]]); the media bridge degrades them
  *     to metadata-only rows, the `extract_ok` pattern.
  *
  * Fail-loudly contract (the [[Multimodal]] codec rule): not-MPEG
  * payloads, free-format bitrate, reserved fields, and mid-stream
  * desync throw `IllegalArgumentException` with the media id.
  */
object Mpeg {

  /** One parsed frame header (byte offset + derived sizes). */
  private[graft] final case class FrameHeader(
      offset: Int, version: Int, // 1 = MPEG-1, 2 = MPEG-2, 25 = MPEG-2.5
      layer: Int, // 1/2/3
      bitrateKbps: Int, sampleRate: Int, padding: Boolean, crc: Boolean,
      mode: Int, // 0 stereo, 1 joint, 2 dual, 3 single
      modeExt: Int, frameBytes: Int, samplesPerFrame: Int) {
    def channels: Int = if (mode == 3) 1 else 2
  }

  /** Stream-level metadata from one walk over every frame. */
  final case class MpegInfo(
      version: Int, layer: Int, sampleRate: Int, channels: Int,
      frames: Int, samples: Long, durationSec: Double,
      bitrateKbps: Int, // CBR nominal; mean for VBR
      vbr: Boolean)

  /** Decoded PCM (Layer I): channel-interleaved ints in 16-bit range —
    * the [[Flac.decodeFlac]] shape, so the feature/fingerprint bridges
    * treat both identically. */
  final case class MpegDecoded(sampleRate: Int, channels: Int,
      samples: Array[Int], info: MpegInfo)

  // -- header tables (spec §2.4.2.3 — small, public, exact) --------------

  private val BitrateMpeg1 = Array(
    Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448), // L1
    Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384), // L2
    Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)) // L3
  private val BitrateMpeg2 = Array(
    Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256), // L1
    Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160), // L2
    Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)) // L3
  private val RateMpeg1 = Array(44100, 48000, 32000)

  private def u32be(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  /** Parse the 4-byte header at `p`; None when not a sync point. */
  private[graft] def parseHeader(b: Array[Byte], p: Int,
      mediaId: Long): Option[FrameHeader] = {
    if (p + 4 > b.length) return None
    val h = u32be(b, p)
    if ((h >>> 21) != 0x7ff) return None
    val verBits = ((h >>> 19) & 3).toInt
    val layerBits = ((h >>> 17) & 3).toInt
    if (verBits == 1 || layerBits == 0) return None // reserved
    val version = verBits match {
      case 3 => 1
      case 2 => 2
      case _ => 25
    }
    val layer = 4 - layerBits // 11→I, 10→II, 01→III
    val brIdx = ((h >>> 12) & 0xf).toInt
    val srIdx = ((h >>> 10) & 3).toInt
    if (srIdx == 3) return None
    require(brIdx != 0, s"media $mediaId: free-format MPEG bitrate " +
      "(frame size by scan) is not supported")
    if (brIdx == 15) return None
    val kbps =
      if (version == 1) BitrateMpeg1(layer - 1)(brIdx - 1)
      else BitrateMpeg2(layer - 1)(brIdx - 1)
    val rate = version match {
      case 1 => RateMpeg1(srIdx)
      case 2 => RateMpeg1(srIdx) / 2
      case _ => RateMpeg1(srIdx) / 4
    }
    val padding = ((h >>> 9) & 1) == 1
    val crc = ((h >>> 16) & 1) == 0
    val mode = ((h >>> 6) & 3).toInt
    val modeExt = ((h >>> 4) & 3).toInt
    val spf = layer match {
      case 1 => 384
      case 2 => 1152
      case _ => if (version == 1) 1152 else 576
    }
    val frameBytes = layer match {
      case 1 => (12 * kbps * 1000 / rate + (if (padding) 1 else 0)) * 4
      case _ =>
        val base = if (layer == 3 && version != 1) 72 else 144
        base * kbps * 1000 / rate + (if (padding) 1 else 0)
    }
    Some(FrameHeader(p, version, layer, kbps, rate, padding, crc,
      mode, modeExt, frameBytes, spf))
  }

  /** Bytes to skip for a leading ID3v2 tag (0 when absent). */
  private def id3v2Size(b: Array[Byte]): Int = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') return 0
    val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
      ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
    val footer = (b(5) & 0x10) != 0
    10 + size + (if (footer) 10 else 0)
  }

  /** ID3 TEXT metadata (the media-catalog fields: TIT2 title, TPE1
    * artist, TALB album, …): a map from frame id to decoded text
    * for every `T*` text frame in a leading ID3v2.3/2.4 tag. When NO
    * v2 tag leads the stream, a trailing ID3v1 block is the fallback
    * ([[id3v1Fields]] — v2 supersedes v1, the standard precedence);
    * empty when neither is present or the tag is all padding
    * ([[wrapId3]]'s zeroed body IS valid padding, and its zeroed v1
    * trailer is all-empty fields). Frame sizes are plain u32 in v2.3
    * and syncsafe in v2.4 (the versions' one structural difference
    * here); text encodings 0 (latin-1), 1 (utf-16 with BOM),
    * 2 (utf-16be), 3 (utf-8) all decode; trailing NULs strip.
    * Non-text frames (APIC art, COMM comments, TXXX user frames whose
    * key is free-form) are skipped by size. Fail-loudly contract for
    * STRUCTURAL damage: a truncated frame, a frame overrunning the
    * tag, an unsupported major version, or whole-tag unsynchronisation
    * throws with the media id — catalog fields are exact or absent,
    * never guessed. */
  def id3Frames(bytes: Array[Byte], mediaId: Long = -1L): Map[String, String] = {
    if (bytes.length < 10 || bytes(0) != 'I' || bytes(1) != 'D' ||
      bytes(2) != '3') return id3v1Fields(bytes, mediaId)
    val major = bytes(3) & 0xff
    if (major == 2) return id3v22Frames(bytes, mediaId)
    require(major == 3 || major == 4,
      s"media $mediaId: ID3v2.$major tag (only v2.2/v2.3/v2.4 are parsed)")
    require((bytes(5) & 0x80) == 0,
      s"media $mediaId: whole-tag ID3 unsynchronisation is not supported")
    val tagEnd = math.min(bytes.length,
      10 + (((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)))
    var p = 10
    if ((bytes(5) & 0x40) != 0) { // extended header: length-prefixed, skip
      require(p + 4 <= tagEnd, s"media $mediaId: truncated ID3 extended header")
      val ehSize =
        if (major == 4)
          ((bytes(p) & 0x7f) << 21) | ((bytes(p + 1) & 0x7f) << 14) |
            ((bytes(p + 2) & 0x7f) << 7) | (bytes(p + 3) & 0x7f)
        else 4 + (((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
          ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff))
      p += ehSize
    }
    val out = Map.newBuilder[String, String]
    while (p + 10 <= tagEnd && bytes(p) != 0) {
      val id = new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
      require(id.forall(c => (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')),
        s"media $mediaId: malformed ID3 frame id '$id' at $p")
      val size =
        if (major == 4)
          ((bytes(p + 4) & 0x7f) << 21) | ((bytes(p + 5) & 0x7f) << 14) |
            ((bytes(p + 6) & 0x7f) << 7) | (bytes(p + 7) & 0x7f)
        else ((bytes(p + 4) & 0xff) << 24) | ((bytes(p + 5) & 0xff) << 16) |
          ((bytes(p + 6) & 0xff) << 8) | (bytes(p + 7) & 0xff)
      require(size >= 0 && p + 10 + size <= tagEnd,
        s"media $mediaId: ID3 frame '$id' size $size overruns the tag")
      if (id.startsWith("T") && id != "TXXX" && size >= 1) {
        val enc = bytes(p + 10) & 0xff
        val raw = java.util.Arrays.copyOfRange(bytes, p + 11, p + 10 + size)
        val text = enc match {
          case 0 => new String(raw, java.nio.charset.StandardCharsets.ISO_8859_1)
          case 1 => new String(raw, java.nio.charset.StandardCharsets.UTF_16)
          case 2 => new String(raw, java.nio.charset.StandardCharsets.UTF_16BE)
          case 3 => new String(raw, java.nio.charset.StandardCharsets.UTF_8)
          case e => throw new IllegalArgumentException(
            s"media $mediaId: ID3 frame '$id' with reserved text encoding $e")
        }
        out += id -> text.replaceAll("\\x00+$", "")
      }
      p += 10 + size
    }
    out.result()
  }

  /** The ID3v2.2 three-byte text-frame vocabulary, mapped onto the
    * v2.3 four-byte names the catalog speaks — legacy iTunes rips (a
    * real crawl slice) carry v2.2 tags, and surfacing them under the
    * SAME names keeps the media-tag catalog one vocabulary wide. */
  private val V22TextNames = Map(
    "TT2" -> "TIT2", "TP1" -> "TPE1", "TAL" -> "TALB", "TCO" -> "TCON",
    "TRK" -> "TRCK", "TYE" -> "TYER", "TP2" -> "TPE2", "TEN" -> "TENC",
    "TT1" -> "TIT1", "TT3" -> "TIT3", "TCM" -> "TCOM", "TPA" -> "TPOS")

  /** The v2.2 frame walk: 6-byte frame headers (three-byte id,
    * three-byte big-endian size, NO flags), text encodings 0
    * (latin-1) and 1 (UCS-2 with BOM) only — the layout ID3v2.2.0
    * defines. Known text frames surface under their v2.3 names
    * ([[V22TextNames]]); `COM` comments and binary frames (`PIC` art)
    * skip by size, the same discipline the v2.3/v2.4 walk applies to
    * `COMM`/`APIC`/`TXXX`. */
  private def id3v22Frames(bytes: Array[Byte],
      mediaId: Long): Map[String, String] = {
    require((bytes(5) & 0x80) == 0,
      s"media $mediaId: whole-tag ID3 unsynchronisation is not supported")
    require((bytes(5) & 0x40) == 0,
      s"media $mediaId: ID3v2.2 compression bit set (undefined scheme)")
    val tagEnd = math.min(bytes.length,
      10 + (((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)))
    var p = 10
    val out = Map.newBuilder[String, String]
    while (p + 6 <= tagEnd && bytes(p) != 0) {
      val id = new String(bytes, p, 3, java.nio.charset.StandardCharsets.US_ASCII)
      require(id.forall(c => (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')),
        s"media $mediaId: malformed ID3v2.2 frame id '$id' at $p")
      val size = ((bytes(p + 3) & 0xff) << 16) | ((bytes(p + 4) & 0xff) << 8) |
        (bytes(p + 5) & 0xff)
      require(p + 6 + size <= tagEnd,
        s"media $mediaId: ID3v2.2 frame '$id' size $size overruns the tag")
      if (V22TextNames.contains(id) && size >= 1) {
        val enc = bytes(p + 6) & 0xff
        val raw = java.util.Arrays.copyOfRange(bytes, p + 7, p + 6 + size)
        val text = enc match {
          case 0 => new String(raw, java.nio.charset.StandardCharsets.ISO_8859_1)
          case 1 => new String(raw, java.nio.charset.StandardCharsets.UTF_16)
          case e => throw new IllegalArgumentException(
            s"media $mediaId: ID3v2.2 frame '$id' with reserved encoding $e")
        }
        out += V22TextNames(id) -> text.replaceAll("\\x00+$", "")
      }
      p += 6 + size
    }
    out.result()
  }

  /** Serialize an ID3v2.2, v2.3 or v2.4 tag carrying real text frames
    * around `stream` — the staging counterpart of [[id3Frames]]
    * (wrapId3's zero-body form stays the padding-only variant).
    * `encoding` plants the frames' text encoding byte (0/1/2/3;
    * v2.2 admits only 0/1). Major 2 takes the THREE-byte frame ids
    * ([[V22TextNames]] keys). */
  def wrapId3Frames(stream: Array[Byte], frames: Seq[(String, String)],
      major: Int = 4, encoding: Int = 3): Array[Byte] = {
    require(major == 2 || major == 3 || major == 4, s"ID3v2.$major")
    require(major != 2 || encoding <= 1, s"ID3v2.2 admits encodings 0/1 only")
    val body = new java.io.ByteArrayOutputStream()
    frames.foreach { case (id, text) =>
      require(id.length == (if (major == 2) 3 else 4), s"frame id '$id'")
      val payload = encoding match {
        case 0 => text.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        case 1 => Array[Byte](0xfe.toByte, 0xff.toByte) ++
          text.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
        case 2 => text.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
        case 3 => text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        case e => throw new IllegalArgumentException(s"encoding $e")
      }
      val size = 1 + payload.length
      body.write(id.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      if (major == 2) {
        body.write((size >> 16) & 0xff); body.write((size >> 8) & 0xff)
        body.write(size & 0xff)
      } else if (major == 4) {
        body.write((size >> 21) & 0x7f); body.write((size >> 14) & 0x7f)
        body.write((size >> 7) & 0x7f); body.write(size & 0x7f)
      } else {
        body.write((size >> 24) & 0xff); body.write((size >> 16) & 0xff)
        body.write((size >> 8) & 0xff); body.write(size & 0xff)
      }
      if (major != 2) { body.write(0); body.write(0) } // frame flags
      body.write(encoding)
      body.write(payload)
    }
    val b = body.toByteArray
    val pad = 32
    val total = b.length + pad
    val hdr = new Array[Byte](10)
    hdr(0) = 'I'; hdr(1) = 'D'; hdr(2) = '3'; hdr(3) = major.toByte
    hdr(6) = ((total >> 21) & 0x7f).toByte
    hdr(7) = ((total >> 14) & 0x7f).toByte
    hdr(8) = ((total >> 7) & 0x7f).toByte
    hdr(9) = (total & 0x7f).toByte
    hdr ++ b ++ new Array[Byte](pad) ++ stream
  }

  /** Side-info size (bytes) after the header+CRC — where a Xing/Info
    * tag sits in a Layer III first frame. */
  private def sideInfoBytes(h: FrameHeader): Int =
    if (h.layer != 3) 0
    else if (h.version == 1) { if (h.channels == 1) 17 else 32 }
    else { if (h.channels == 1) 9 else 17 }

  /** Frame count from a Xing/Info or VBRI tag in the first frame, if
    * present: (frames, isVbr). */
  private def vbrFrames(b: Array[Byte], h: FrameHeader): Option[(Int, Boolean)] = {
    val at = h.offset + 4 + (if (h.crc) 2 else 0) + sideInfoBytes(h)
    if (at + 8 <= b.length &&
      ((b(at) == 'X' && b(at + 1) == 'i' && b(at + 2) == 'n' && b(at + 3) == 'g') ||
        (b(at) == 'I' && b(at + 1) == 'n' && b(at + 2) == 'f' && b(at + 3) == 'o'))) {
      val vbr = b(at) == 'X'
      val flags = u32be(b, at + 4)
      if ((flags & 1) != 0 && at + 12 <= b.length)
        return Some((u32be(b, at + 8).toInt, vbr))
    }
    val vat = h.offset + 4 + 32 // VBRI: fixed 32 bytes past the header
    if (vat + 18 <= b.length && b(vat) == 'V' && b(vat + 1) == 'B' &&
      b(vat + 2) == 'R' && b(vat + 3) == 'I')
      // frames at offset 14 within the tag
      return Some((u32be(b, vat + 14).toInt, true))
    None
  }

  /** Every frame of the stream, walked exactly — the shared core under
    * [[mpegInfo]] and the tag-invariant identity functions. Tolerates a
    * leading ID3v2, a trailing ID3v1 ("TAG", 128 bytes), and up to 3
    * bytes of trailing slack; anything else mid-stream is desync and
    * throws, as does a mid-stream layer/rate/version change. */
  private[graft] def walkFrames(bytes: Array[Byte],
      mediaId: Long): Vector[FrameHeader] = {
    var p = id3v2Size(bytes)
    require(p < bytes.length, s"media $mediaId: ID3 tag with no audio frames")
    val first = parseHeader(bytes, p, mediaId).getOrElse(
      throw new IllegalArgumentException(
        s"media $mediaId: no MPEG audio sync at stream start"))
    val end =
      if (bytes.length >= 128 && bytes(bytes.length - 128) == 'T' &&
        bytes(bytes.length - 127) == 'A' && bytes(bytes.length - 126) == 'G')
        bytes.length - 128
      else bytes.length
    val out = Vector.newBuilder[FrameHeader]
    var h = Option(first)
    while (h.isDefined) {
      val f = h.get
      require(f.sampleRate == first.sampleRate && f.layer == first.layer &&
        f.version == first.version,
        s"media $mediaId: MPEG stream changes layer/rate mid-stream at ${f.offset}")
      out += f
      p = f.offset + f.frameBytes
      h = if (p + 4 <= end) {
        val next = parseHeader(bytes, p, mediaId)
        require(next.isDefined || end - p <= 3,
          s"media $mediaId: MPEG frame desync at offset $p")
        next
      } else {
        require(p <= end, s"media $mediaId: truncated final MPEG frame " +
          s"(${p - end} bytes short)")
        require(end - p <= 3, s"media $mediaId: trailing garbage after MPEG frames")
        None
      }
    }
    out.result()
  }

  /** Walk every frame: exact stream metadata. */
  def mpegInfo(bytes: Array[Byte], mediaId: Long = -1L): MpegInfo =
    infoOf(bytes, walkFrames(bytes, mediaId))

  /** [[mpegInfo]] with the frame walk already done — callers that also
    * need the frame ranges (the media-dedup identity path) aggregate
    * the walked vector instead of walking twice. */
  private[graft] def infoOf(bytes: Array[Byte],
      fs: Vector[FrameHeader]): MpegInfo = {
    val first = fs.head
    val frames = fs.length
    val kbpsSum = fs.foldLeft(0L)(_ + _.bitrateKbps)
    val vbrSeen = fs.exists(_.bitrateKbps != first.bitrateKbps)
    val tagFrames = vbrFrames(bytes, first)
    // The walker counted every frame, so the walked count is ground
    // truth; a Xing/Info/VBRI declared count is honored only inside the
    // one-frame ambiguity of whether the tag frame counts itself. A
    // hostile/corrupt tag (negative after .toInt, zero, or merely lying)
    // must not override the true count with silent garbage — durations
    // would go negative/absurd, violating the fail-loud contract.
    val nFrames = tagFrames.map(_._1)
      .filter(n => n > 0 && math.abs(n - frames) <= 1)
      .getOrElse(frames)
    val vbr = vbrSeen || tagFrames.exists(_._2)
    val samples = nFrames.toLong * first.samplesPerFrame
    MpegInfo(first.version, first.layer, first.sampleRate, first.channels,
      nFrames, samples, samples.toDouble / first.sampleRate,
      (kbpsSum / math.max(1, frames)).toInt, vbr)
  }

  // -- tag-invariant identity --------------------------------------------

  private val Fnv64Offset = 0xcbf29ce484222325L
  private def fnv1a64(b: Array[Byte], from: Int, until: Int,
      seed: Long): Long = {
    var h = seed
    var i = from
    while (i < until) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** 64-bit content hash of the coded audio STREAM: FNV-1a chained over
    * the frame byte ranges the walker produces — exactly the bytes
    * between the ID3v2 prefix and the ID3v1 tail, so re-tagging (any
    * ID3v2, any ID3v1, or none) cannot change it, while any change to
    * the coded audio does. Works at EVERY layer with no sample decode,
    * so the Layer II/III decode refusal (see the object doc) costs no
    * exact-identity coverage: a re-tagged MP3 is an exact dup by this
    * hash. Chaining across ranges is identical to hashing their
    * concatenation (mid-stream the ranges are contiguous by the desync
    * contract; the chain just documents that the ID3 bytes are OUT). */
  def streamHash64(bytes: Array[Byte], mediaId: Long = -1L): Long =
    streamHash64Of(bytes, walkFrames(bytes, mediaId))

  private[graft] def streamHash64Of(bytes: Array[Byte],
      fs: Vector[FrameHeader]): Long = {
    var h = Fnv64Offset
    fs.foreach(f => h = fnv1a64(bytes, f.offset, f.offset + f.frameBytes, h))
    h
  }

  /** Per-frame 64-bit hash sequence (independent FNV-1a per frame),
    * same tag-stripped framing: a truncated copy's sequence is a strict
    * PREFIX of the original's, and a concatenation's is the two
    * sequences appended — the overlap evidence truncation/concat
    * detection joins on, again at every layer with no decode. */
  def frameHashes64(bytes: Array[Byte], mediaId: Long = -1L): Array[Long] = {
    val fs = walkFrames(bytes, mediaId)
    val out = new Array[Long](fs.length)
    var i = 0
    while (i < fs.length) {
      val f = fs(i)
      out(i) = fnv1a64(bytes, f.offset, f.offset + f.frameBytes, Fnv64Offset)
      i += 1
    }
    out
  }

  // -- Layer I decode ----------------------------------------------------

  /** Scalefactor B.1 by formula: 2^(1 − idx/3), idx 0..62. */
  private[graft] val ScaleFactors: Array[Double] =
    Array.tabulate(63)(i => StrictMath.pow(2.0, 1.0 - i / 3.0))

  private final class BitReader(b: Array[Byte], var pos: Int, mediaId: Long) {
    private var bit = 0
    def read(n: Int): Int = {
      var v = 0
      var k = n
      while (k > 0) {
        require(pos < b.length, s"media $mediaId: truncated MPEG frame payload")
        val take = math.min(k, 8 - bit)
        val cur = (b(pos) & 0xff) >> (8 - bit - take) & ((1 << take) - 1)
        v = (v << take) | cur
        bit += take
        if (bit == 8) { bit = 0; pos += 1 }
        k -= take
      }
      v
    }
  }

  /** One Layer I frame's raw coded content — the planted-frame
    * exactness surface (Mp3Spec): allocations, scalefactor indices,
    * and the 12×32 sample codes per channel, exactly as coded. For
    * joint-stereo subbands past the intensity bound the shared code is
    * replicated into both channels (what requantization consumes). */
  private[graft] final case class Layer1Frame(
      header: FrameHeader, alloc: Array[Array[Int]],
      scf: Array[Array[Int]], codes: Array[Array[Array[Int]]])

  private[graft] def parseLayer1Frame(b: Array[Byte], h: FrameHeader,
      mediaId: Long): Layer1Frame = {
    require(h.layer == 1 && h.version == 1,
      s"media $mediaId: not an MPEG-1 Layer I frame")
    val r = new BitReader(b, h.offset + 4 + (if (h.crc) 2 else 0), mediaId)
    val nch = h.channels
    val bound = if (h.mode == 1) (h.modeExt + 1) * 4 else 32
    val alloc = Array.ofDim[Int](nch, 32)
    var sb = 0
    while (sb < 32) {
      if (sb < bound) {
        var ch = 0
        while (ch < nch) { alloc(ch)(sb) = r.read(4); ch += 1 }
      } else {
        val a = r.read(4)
        var ch = 0
        while (ch < nch) { alloc(ch)(sb) = a; ch += 1 }
      }
      var ch = 0
      while (ch < nch) {
        require(alloc(ch)(sb) != 15,
          s"media $mediaId: forbidden Layer I allocation 15 in subband $sb")
        ch += 1
      }
      sb += 1
    }
    val scf = Array.ofDim[Int](nch, 32)
    sb = 0
    while (sb < 32) {
      var ch = 0
      while (ch < nch) {
        if (alloc(ch)(sb) != 0) {
          scf(ch)(sb) = r.read(6)
          require(scf(ch)(sb) != 63,
            s"media $mediaId: forbidden Layer I scalefactor 63")
        }
        ch += 1
      }
      sb += 1
    }
    val codes = Array.ofDim[Int](nch, 32, 12)
    var s = 0
    while (s < 12) {
      sb = 0
      while (sb < 32) {
        if (sb < bound) {
          var ch = 0
          while (ch < nch) {
            if (alloc(ch)(sb) != 0)
              codes(ch)(sb)(s) = r.read(alloc(ch)(sb) + 1)
            ch += 1
          }
        } else if (alloc(0)(sb) != 0) {
          val c = r.read(alloc(0)(sb) + 1)
          var ch = 0
          while (ch < nch) { codes(ch)(sb)(s) = c; ch += 1 }
        }
        sb += 1
      }
      s += 1
    }
    Layer1Frame(h, alloc, scf, codes)
  }

  /** Mid-rise requantization: code → scaled sample in [−1, 1].
    * s'' = (2c + 1 − 2^nb)/(2^nb − 1), then × scalefactor. */
  private[graft] def requantLayer1(code: Int, alloc: Int, scfIdx: Int): Double = {
    val nb = alloc + 1
    val full = 1 << nb
    ((2 * code + 1 - full).toDouble / (full - 1)) * ScaleFactors(scfIdx)
  }

  /** Full MPEG-1 Layer I decode: every frame through requantization
    * and the synthesis filterbank; 16-bit-range interleaved output. */
  def decodeLayer1(bytes: Array[Byte], mediaId: Long = -1L): MpegDecoded =
    decodeLayer1With(mpegInfo(bytes, mediaId), bytes, mediaId)

  /** [[decodeLayer1]] with the stream walk already done — callers that
    * inspected the metadata first (the feature bridge) skip the second
    * full-stream frame walk. */
  private[graft] def decodeLayer1With(info: MpegInfo, bytes: Array[Byte],
      mediaId: Long): MpegDecoded = {
    require(info.layer == 1 && info.version == 1,
      s"media $mediaId: sample decode supports MPEG-1 Layer I " +
        s"(got MPEG-${info.version} Layer ${info.layer}; " +
        "Layer II/III sample decode needs the spec's normative data " +
        "tables — metadata via mpegInfo)")
    var p = id3v2Size(bytes)
    val nch = info.channels
    val synth = Array.fill(nch)(new Synthesis)
    val out = new java.io.ByteArrayOutputStream(info.samples.toInt * 2 * nch)
    val pcm = new Array[Int](32)
    var h = parseHeader(bytes, p, mediaId)
    while (h.isDefined) {
      val f = parseLayer1Frame(bytes, h.get, mediaId)
      val S = new Array[Double](32)
      var s = 0
      while (s < 12) {
        var ch = 0
        while (ch < nch) {
          var sb = 0
          while (sb < 32) {
            S(sb) =
              if (f.alloc(ch)(sb) == 0) 0.0
              else requantLayer1(f.codes(ch)(sb)(s), f.alloc(ch)(sb),
                f.scf(ch)(sb))
            sb += 1
          }
          synth(ch).granule(S, pcm)
          var i = 0
          while (i < 32) {
            // interleave by hand: buffer one granule per channel
            granuleBuf(ch)(i) = pcm(i)
            i += 1
          }
          ch += 1
        }
        var i = 0
        while (i < 32) {
          var c = 0
          while (c < nch) {
            val v = granuleBuf(c)(i)
            out.write(v & 0xff); out.write((v >> 8) & 0xff)
            c += 1
          }
          i += 1
        }
        s += 1
      }
      p = h.get.offset + h.get.frameBytes
      h = if (p + 4 <= bytes.length) parseHeader(bytes, p, mediaId) else None
    }
    // flush: the last FilterbankDelay samples are still inside the
    // filterbank when frames end — drive zero granules through so the
    // tail drains and output length equals frames·384 after the head
    // trim below (true gapless alignment with the source)
    {
      val zero = new Array[Double](32)
      var g = 0
      while (g * 32 < FilterbankDelay + 32) {
        var ch = 0
        while (ch < nch) {
          synth(ch).granule(zero, pcm)
          var i = 0
          while (i < 32) { granuleBuf(ch)(i) = pcm(i); i += 1 }
          ch += 1
        }
        var i = 0
        while (i < 32) {
          var c = 0
          while (c < nch) {
            val v = granuleBuf(c)(i)
            out.write(v & 0xff); out.write((v >> 8) & 0xff)
            c += 1
          }
          i += 1
        }
        g += 1
      }
    }
    val raw = out.toByteArray
    // decoder-delay compensation: the filterbank's first
    // [[FilterbankDelay]] output samples per channel are warmup ramp,
    // not signal — trimming them time-aligns decode with the source, so
    // fingerprints/features of an MPEG and a WAV of the same waveform
    // agree (the gapless-playback convention, here deterministic
    // because the delay is a property of the filterbank, not metadata)
    val skip = FilterbankDelay * nch
    val total = raw.length / 2
    // head-trim the delay, tail-truncate the flush remainder: exactly
    // frames·384 samples per channel, time-aligned with the source
    val keep = math.min(total.toLong - skip, info.samples * nch).toInt
    val samples = new Array[Int](math.max(0, keep))
    var i = 0
    while (i < samples.length) {
      val j = i + skip
      samples(i) = ((raw(2 * j) & 0xff) | (raw(2 * j + 1) << 8)).toShort.toInt
      i += 1
    }
    MpegDecoded(info.sampleRate, nch, samples, info)
  }

  // scratch for channel interleaving (decode is single-threaded per call)
  private def granuleBuf: Array[Array[Int]] = granuleBufTl.get()
  private val granuleBufTl =
    new ThreadLocal[Array[Array[Int]]] {
      override def initialValue(): Array[Array[Int]] = Array.ofDim[Int](2, 32)
    }

  /** Unified sample entry: Layer I decodes; II/III throw with the
    * documented reason (callers that can degrade — the media feature
    * bridge — catch and keep metadata). */
  def decodeSamples(bytes: Array[Byte], mediaId: Long = -1L): MpegDecoded =
    decodeLayer1(bytes, mediaId)

  // -- generator (staging/spec counterpart, the Pdf.writeTextPdf rule) ---

  /** Serialize a CBR MPEG-1 stream of `frames` zero-payload frames —
    * the staging counterpart of [[mpegInfo]] for oracled metadata
    * queries. A zero Layer I payload is a VALID silent frame (all
    * allocations 0); Layer II/III zero payloads are exercise for the
    * walker only. */
  def writeCbrStream(layer: Int, rate: Int, kbps: Int, frames: Int,
      mode: Int = 3, fill: Int = 0): Array[Byte] = {
    require(layer >= 1 && layer <= 3)
    val srIdx = RateMpeg1.indexOf(rate)
    require(srIdx >= 0, s"not an MPEG-1 rate: $rate")
    val brIdx = BitrateMpeg1(layer - 1).indexOf(kbps) + 1
    require(brIdx > 0, s"kbps $kbps not in the MPEG-1 Layer $layer table")
    val frameBytes =
      if (layer == 1) 12 * kbps * 1000 / rate * 4
      else 144 * kbps * 1000 / rate
    val h = (0x7ffL << 21) | (3L << 19) | ((4 - layer).toLong << 17) |
      (1L << 16) | (brIdx.toLong << 12) | (srIdx.toLong << 10) |
      (mode.toLong << 6)
    val out = new Array[Byte](frames * frameBytes)
    var f = 0
    while (f < frames) {
      val p = f * frameBytes
      out(p) = ((h >>> 24) & 0xff).toByte
      out(p + 1) = ((h >>> 16) & 0xff).toByte
      out(p + 2) = ((h >>> 8) & 0xff).toByte
      out(p + 3) = (h & 0xff).toByte
      if (fill != 0) {
        // deterministic per-(frame, byte) payload pattern for identity
        // gates — writeCbrStream(..., k, fill) is byte-identical to the
        // first k frames of writeCbrStream(..., n, fill) for k <= n,
        // which is what the truncation-prefix property tests ride on.
        // Only the frame WALK ever reads such streams (a nonzero
        // Layer I payload is not meaningful coded audio).
        var j = 4
        while (j < frameBytes) {
          out(p + j) = ((f * 131 + j * 31 + fill) & 0xff).toByte
          j += 1
        }
      }
      f += 1
    }
    out
  }

  /** Trailing ID3v1 (128-byte "TAG") metadata under the SAME frame-id
    * key space as [[id3Frames]] — TIT2/TPE1/TALB/TYER, plus TRCK for a
    * v1.1 track number — so the catalog join sees one vocabulary
    * regardless of tag generation. Fields are fixed-width latin-1,
    * NUL/space padded; only non-empty fields surface (an absent year
    * is absence, not a blank row). The genre byte is an index into a
    * historic table this clean-room build does not carry — dropped.
    * Empty map when no trailer is present. */
  def id3v1Fields(bytes: Array[Byte], mediaId: Long = -1L): Map[String, String] = {
    val at = bytes.length - 128
    if (at < 0 || bytes(at) != 'T' || bytes(at + 1) != 'A' ||
      bytes(at + 2) != 'G') return Map.empty
    def field(off: Int, len: Int): String =
      new String(bytes, at + off, len,
        java.nio.charset.StandardCharsets.ISO_8859_1)
        .takeWhile(_ != 0.toChar).trim
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def put(k: String, v: String): Unit = if (v.nonEmpty) out(k) = v
    put("TIT2", field(3, 30))
    put("TPE1", field(33, 30))
    put("TALB", field(63, 30))
    put("TYER", field(93, 4))
    // v1.1: a zero byte at comment[28] marks comment[29] as the track
    if (bytes(at + 125) == 0 && bytes(at + 126) != 0)
      out("TRCK") = (bytes(at + 126) & 0xff).toString
    out.toMap
  }

  /** Serialize a trailing ID3v1.1 block onto a coded stream — the
    * staging counterpart for the [[id3v1Fields]] catalog fallback. */
  def wrapId3v1(stream: Array[Byte], title: String, artist: String,
      album: String, year: String = "", track: Int = 0): Array[Byte] = {
    val t = new Array[Byte](128)
    t(0) = 'T'; t(1) = 'A'; t(2) = 'G'
    def put(s: String, off: Int, len: Int): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      require(b.length <= len, s"ID3v1 field overflow: '$s'")
      System.arraycopy(b, 0, t, off, b.length)
    }
    put(title, 3, 30); put(artist, 33, 30); put(album, 63, 30)
    put(year, 93, 4)
    if (track > 0) { require(track < 256, s"ID3v1 track $track")
      t(126) = track.toByte }
    stream ++ t
  }

  /** Wrap a coded stream in deterministic ID3v2 (syncsafe size, zeroed
    * body) and ID3v1 tags — the staging counterpart for tag-invariance
    * gates: the wrapped stream must hash identically under
    * [[streamHash64]]/[[frameHashes64]]. */
  def wrapId3(stream: Array[Byte], v2Bytes: Int = 200,
      v1: Boolean = true): Array[Byte] = {
    require(v2Bytes >= 0 && v2Bytes < (1 << 28), s"ID3v2 size $v2Bytes")
    val v2 = new Array[Byte](10 + v2Bytes)
    v2(0) = 'I'; v2(1) = 'D'; v2(2) = '3'; v2(3) = 4
    v2(6) = ((v2Bytes >> 21) & 0x7f).toByte
    v2(7) = ((v2Bytes >> 14) & 0x7f).toByte
    v2(8) = ((v2Bytes >> 7) & 0x7f).toByte
    v2(9) = (v2Bytes & 0x7f).toByte
    val tail =
      if (!v1) Array.empty[Byte]
      else {
        val t = new Array[Byte](128)
        t(0) = 'T'; t(1) = 'A'; t(2) = 'G'
        t
      }
    v2 ++ stream ++ tail
  }

  // -- synthesis filterbank ----------------------------------------------

  /** 512-tap near-PR prototype: Kaiser(β=7.5)-windowed sinc, cutoff
    * 1.12·π/64, centered at 256. This REPLACES the spec's normative
    * window table (see the object doc for why); parameters were chosen
    * by grid search for reconstruction error — the analysis/synthesis
    * pair measures −69 dB max error on broadband content with the spec
    * latency of exactly 481 samples, bounds Mp3Spec asserts. The sign
    * structure the ISO tables bake into their stored coefficients is
    * applied explicitly in the filter loops ((−1)^k over the analysis
    * 64-blocks, (−1)^⌊k/2⌋ over the synthesis 32-blocks — both derived
    * from the cos((2sb+1)(n∓16)π/64) filter definitions' 128-sample
    * periodicity), so the prototype itself stays all-positive. */
  private def rawPrototype: Array[Double] = {
    def i0(x: Double): Double = { // modified Bessel I0 (series)
      var sum = 1.0; var term = 1.0; var k = 1
      while (k < 40) {
        term *= (x / (2.0 * k)) * (x / (2.0 * k))
        sum += term
        k += 1
      }
      sum
    }
    val beta = 7.5
    Array.tabulate(512) { n =>
      val t = n - 256.0
      val x = StrictMath.PI * t * 1.12 / 64.0
      val sinc = if (math.abs(x) < 1e-12) 1.0 else StrictMath.sin(x) / x
      val w = i0(beta * StrictMath.sqrt(
        math.max(0.0, 1.0 - (t / 256.0) * (t / 256.0)))) / i0(beta)
      sinc * w / 64.0
    }
  }

  /** Analysis/synthesis windows, normalized by two deterministic
    * probes (lazy, once per JVM, ~ms): the analysis window scales so a
    * full-scale sine yields subband amplitude ≈ 1 (the spec's nominal
    * subband range, so scalefactors cover it), and the synthesis
    * window takes the remaining factor so the full chain is unity. */
  private[graft] lazy val (analysisWindow, synthesisWindow): (Array[Double], Array[Double]) = {
    val h = rawPrototype
    // probe: a mid-band sine (subband 2 center, period 25.6 samples)
    val n = 4096
    val in = Array.tabulate(n)(i =>
      StrictMath.sin(2 * StrictMath.PI * i / 25.6))
    val out = new Array[Double](n)
    val ana = new AnalysisWith(h)
    val syn = new SynthesisWith(h, 1.0)
    val S = new Array[Double](32)
    val pcm = new Array[Double](32)
    var maxS = 0.0
    var g = 0
    while (g < n / 32) {
      val slice = java.util.Arrays.copyOfRange(in, g * 32, g * 32 + 32)
      ana.granule(slice, S)
      var q = 0
      while (q < 32) { maxS = math.max(maxS, math.abs(S(q))); q += 1 }
      syn.granuleD(S, pcm)
      System.arraycopy(pcm, 0, out, g * 32, 32)
      g += 1
    }
    // least-squares chain gain at the known 481-sample latency
    var num = 0.0; var den = 0.0
    var i = 512
    while (i + FilterbankDelay < n) {
      num += in(i) * out(i + FilterbankDelay); den += in(i) * in(i); i += 1
    }
    val chainGain = num / den
    val cA = 1.0 / maxS
    val cS = maxS / chainGain
    (h.map(_ * cA), h.map(_ * cS))
  }

  /** Analysis→synthesis latency of this filterbank pair (spec value). */
  private[graft] val FilterbankDelay = 481

  /** Analysis filterbank (TestMp3's encoder side lives in main so the
    * window constant is shared and the PAIR is the documented unit). */
  private[graft] final class AnalysisWith(h: Array[Double]) {
    private val x = new Array[Double](512)
    def granule(in32: Array[Double], outS: Array[Double]): Unit = {
      System.arraycopy(x, 0, x, 32, 480)
      var i = 0
      while (i < 32) { x(i) = in32(31 - i); i += 1 }
      val y = new Array[Double](64)
      var j = 0
      while (j < 64) {
        var acc = 0.0
        var k = 0
        while (k < 8) { acc += x(j + 64 * k) * h(j + 64 * k) *
          (if ((k & 1) == 0) 1.0 else -1.0); k += 1 }
        y(j) = acc
        j += 1
      }
      var sb = 0
      while (sb < 32) {
        var acc = 0.0
        j = 0
        while (j < 64) {
          acc += StrictMath.cos((2 * sb + 1) * (j - 16) * StrictMath.PI / 64.0) * y(j)
          j += 1
        }
        outS(sb) = acc
        sb += 1
      }
    }
  }

  private[graft] final class SynthesisWith(h: Array[Double], scale: Double) {
    private val v = new Array[Double](1024)
    def granuleD(s: Array[Double], out: Array[Double]): Unit = {
      System.arraycopy(v, 0, v, 64, 960)
      var i = 0
      while (i < 64) {
        var acc = 0.0
        var k = 0
        while (k < 32) {
          acc += StrictMath.cos((16 + i) * (2 * k + 1) * StrictMath.PI / 64.0) * s(k)
          k += 1
        }
        v(i) = acc
        i += 1
      }
      var j = 0
      while (j < 32) {
        var acc = 0.0
        var k = 0
        while (k < 16) {
          val uIdx = (k >> 1) * 128 + (if ((k & 1) == 0) j else 96 + j)
          val sgn = if (((k >> 1) & 1) == 0) 1.0 else -1.0 // (−1)^⌊k/2⌋
          acc += v(uIdx) * h(j + 32 * k) * scale * sgn
          k += 1
        }
        out(j) = acc
        j += 1
      }
    }
  }

  /** Production synthesis: [[SynthesisWith]] over [[synthesisWindow]]
    * with 16-bit clamp. */
  private final class Synthesis {
    private val inner = new SynthesisWith(synthesisWindow, 1.0)
    private val d = new Array[Double](32)
    def granule(s: Array[Double], out: Array[Int]): Unit = {
      inner.granuleD(s, d)
      var j = 0
      while (j < 32) {
        val v = StrictMath.rint(d(j) * 32767.0).toInt
        out(j) = math.max(-32768, math.min(32767, v))
        j += 1
      }
    }
  }
}
