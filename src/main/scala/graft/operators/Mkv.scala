package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

/** Pure-JVM Matroska/WebM (EBML, RFC 8794) metadata walk — the second
  * crawl video container after MP4/ISO-BMFF ([[Mp4]]): WebM is the
  * web's royalty-free delivery format and plain Matroska its superset.
  * EBML is length-prefixed structure all the way down: variable-length
  * element IDs (1–4 bytes, leading-bit length marker), variable-length
  * sizes (1–8 bytes, marker stripped; all-data-bits-ones = "unknown"),
  * master elements nesting children. The walk reads the EBML header's
  * DocType, then the Segment's Info (timestamp scale, duration),
  * Tracks (type, codec id, video dimensions, audio rate/channels),
  * Tags (SimpleTag name/value pairs — the catalog face), and COUNTS
  * Clusters without parsing their blocks: frame decode (VP9/AV1/Opus
  * payloads) is refused, the [[Mpeg]]/[[Mp4]] adjudication — the
  * catalog needs none of it.
  *
  * Identity: [[contentHash64]] hashes the Cluster payload bytes in
  * order (the coded A/V data), so an edited-metadata copy — retitled,
  * retagged, different muxer strings — is an exact dup, the
  * [[Mp4.contentHash64]] semantics for the EBML container.
  *
  * Unknown-size elements are accepted only where real muxers emit
  * them: the Segment (a live/streamed recording extends to EOF). An
  * unknown-size element anywhere else fails loudly — resynchronizing
  * by ID scan would be a guess.
  *
  * Fail-loudly contract ([[Multimodal]] codec rule): a payload without
  * the EBML magic, truncated elements, absurd VINT framing, or a
  * non-Matroska DocType throw `IllegalArgumentException` with the
  * media id. */
object Mkv {

  final case class MkvTrack(number: Long, trackType: Int, codecId: String,
      width: Int, height: Int, channels: Int, sampleRate: Double)

  /** Exact container metadata. `durationSec` is 0.0 when the Segment
    * Info carries no Duration element (legal for live recordings —
    * absence, not error). */
  final case class MkvInfo(docType: String, timestampScale: Long,
      durationSec: Double, nClusters: Int, tracks: Vector[MkvTrack])

  // -- EBML primitives ---------------------------------------------------

  /** (id, lengthOfIdBytes): IDs keep their marker bit — the
    * conventional on-the-wire representation (0x1A45DFA3, 0xAE, …). */
  private def readId(b: Array[Byte], p: Int, mediaId: Long): (Long, Int) = {
    require(p < b.length, s"media $mediaId: truncated EBML id at $p")
    val first = b(p) & 0xff
    require(first != 0, s"media $mediaId: invalid EBML id byte 0x00 at $p")
    val len = Integer.numberOfLeadingZeros(first) - 24 + 1
    require(len <= 4, s"media $mediaId: EBML id longer than 4 bytes at $p")
    require(p + len <= b.length, s"media $mediaId: truncated EBML id at $p")
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
    (v, len)
  }

  /** (size, lengthOfSizeBytes); size = -1 encodes "unknown". */
  private def readSize(b: Array[Byte], p: Int, mediaId: Long): (Long, Int) = {
    require(p < b.length, s"media $mediaId: truncated EBML size at $p")
    val first = b(p) & 0xff
    require(first != 0, s"media $mediaId: EBML size longer than 8 bytes at $p")
    val len = Integer.numberOfLeadingZeros(first) - 24 + 1
    require(p + len <= b.length, s"media $mediaId: truncated EBML size at $p")
    var v = (first & (0xff >> len)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
    val allOnes = (1L << (7 * len)) - 1
    (if (v == allOnes) -1L else v, len)
  }

  private def uint(b: Array[Byte], at: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(at + i) & 0xffL); i += 1 }
    v
  }

  private def float(b: Array[Byte], at: Int, len: Int, mediaId: Long): Double =
    len match {
      case 0 => 0.0
      case 4 => java.lang.Float.intBitsToFloat(uint(b, at, 4).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uint(b, at, 8))
      case n => throw new IllegalArgumentException(
        s"media $mediaId: EBML float of $n bytes")
    }

  // element ids (with marker bits, as on the wire)
  private val IdEbml = 0x1A45DFA3L
  private val IdDocType = 0x4282L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdTrackNumber = 0xD7L
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL
  private val IdAudio = 0xE1L
  private val IdSamplingFrequency = 0xB5L
  private val IdChannels = 0x9FL
  private val IdCluster = 0x1F43B675L
  private val IdTags = 0x1254C367L
  private val IdTag = 0x7373L
  private val IdSimpleTag = 0x67C8L
  private val IdTagName = 0x45A3L
  private val IdTagString = 0x4487L

  /** Walk the children of `[from, until)`, calling `f(id, payloadAt,
    * payloadLen)`. Only the Segment may carry an unknown size (handled
    * by the CALLER passing `until` = EOF); an unknown-size child here
    * fails loudly. */
  private def walkChildren(b: Array[Byte], from: Int, until: Int,
      mediaId: Long)(f: (Long, Int, Int) => Unit): Unit = {
    var p = from
    while (p < until) {
      val (id, idLen) = readId(b, p, mediaId)
      val (size, szLen) = readSize(b, p + idLen, mediaId)
      require(size >= 0 || id == IdSegment,
        s"media $mediaId: unknown-size EBML element 0x${id.toHexString} at $p")
      val at = p + idLen + szLen
      val len = if (size < 0) until - at else size.toInt
      require(at + len <= until,
        s"media $mediaId: EBML element 0x${id.toHexString} overruns at $p")
      f(id, at, len)
      p = at + len
    }
    require(p == until,
      s"media $mediaId: EBML children overrun their parent at $p")
  }

  /** DocType of the EBML header; fails loudly unless matroska/webm. */
  private[operators] def docTypeOf(b: Array[Byte], mediaId: Long): (String, Int) = {
    val (id, idLen) = readId(b, 0, mediaId)
    require(id == IdEbml, s"media $mediaId: not an EBML payload")
    val (size, szLen) = readSize(b, idLen, mediaId)
    require(size >= 0, s"media $mediaId: unknown-size EBML header")
    val at = idLen + szLen
    require(at + size <= b.length, s"media $mediaId: truncated EBML header")
    var docType = ""
    walkChildren(b, at, at + size.toInt, mediaId) { (cid, cat, clen) =>
      if (cid == IdDocType) docType = new String(b, cat, clen, UTF_8).trim
    }
    require(docType == "matroska" || docType == "webm",
      s"media $mediaId: EBML DocType '$docType' is not Matroska/WebM")
    (docType, at + size.toInt)
  }

  /** (segmentPayloadFrom, segmentPayloadUntil) — unknown-size Segments
    * (live recordings) extend to EOF. */
  private def segmentRange(b: Array[Byte], after: Int, mediaId: Long): (Int, Int) = {
    val (id, idLen) = readId(b, after, mediaId)
    require(id == IdSegment,
      s"media $mediaId: expected Segment after the EBML header, " +
        s"got 0x${id.toHexString}")
    val (size, szLen) = readSize(b, after + idLen, mediaId)
    val at = after + idLen + szLen
    val until = if (size < 0) b.length else at + size.toInt
    require(until <= b.length, s"media $mediaId: Segment overruns the payload")
    (at, until)
  }

  /** Exact metadata of a Matroska/WebM payload. */
  def mkvInfo(b: Array[Byte], mediaId: Long = -1L): MkvInfo = {
    val (docType, afterHeader) = docTypeOf(b, mediaId)
    val (segAt, segUntil) = segmentRange(b, afterHeader, mediaId)
    var scale = 1000000L // EBML default: 1 ms
    var durationUnits = -1.0
    val tracks = Vector.newBuilder[MkvTrack]
    var nClusters = 0
    walkChildren(b, segAt, segUntil, mediaId) { (id, at, len) =>
      if (id == IdInfo) {
        walkChildren(b, at, at + len, mediaId) { (cid, cat, clen) =>
          if (cid == IdTimestampScale) scale = uint(b, cat, clen)
          else if (cid == IdDuration) durationUnits = float(b, cat, clen, mediaId)
        }
      } else if (id == IdTracks) {
        walkChildren(b, at, at + len, mediaId) { (cid, cat, clen) =>
          if (cid == IdTrackEntry) {
            var num = 0L; var tpe = 0; var codec = ""
            var w = 0; var h = 0; var ch = 0; var rate = 0.0
            walkChildren(b, cat, cat + clen, mediaId) { (tid, tat, tlen) =>
              if (tid == IdTrackNumber) num = uint(b, tat, tlen)
              else if (tid == IdTrackType) tpe = uint(b, tat, tlen).toInt
              else if (tid == IdCodecId) codec = new String(b, tat, tlen, UTF_8)
              else if (tid == IdVideo) {
                walkChildren(b, tat, tat + tlen, mediaId) { (vid, vat, vlen) =>
                  if (vid == IdPixelWidth) w = uint(b, vat, vlen).toInt
                  else if (vid == IdPixelHeight) h = uint(b, vat, vlen).toInt
                }
              } else if (tid == IdAudio) {
                walkChildren(b, tat, tat + tlen, mediaId) { (aid, aat, alen) =>
                  if (aid == IdSamplingFrequency) rate = float(b, aat, alen, mediaId)
                  else if (aid == IdChannels) ch = uint(b, aat, alen).toInt
                }
              }
            }
            require(num > 0 && tpe > 0,
              s"media $mediaId: TrackEntry without number/type")
            tracks += MkvTrack(num, tpe, codec, w, h, ch, rate)
          }
        }
      } else if (id == IdCluster) nClusters += 1
    }
    require(scale > 0, s"media $mediaId: degenerate TimestampScale $scale")
    val durationSec =
      if (durationUnits < 0) 0.0 else durationUnits * scale / 1e9
    MkvInfo(docType, scale, durationSec, nClusters, tracks.result())
  }

  /** SimpleTag name → value pairs of the Segment's Tags element —
    * the Matroska face of [[Ogg.commentTags]]/[[Mpeg.id3Frames]].
    * Tag names stay as written (the spec already prescribes uppercase);
    * later duplicates win. Absent Tags → empty map. */
  def mkvTags(b: Array[Byte], mediaId: Long = -1L): Map[String, String] = {
    val (_, afterHeader) = docTypeOf(b, mediaId)
    val (segAt, segUntil) = segmentRange(b, afterHeader, mediaId)
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    walkChildren(b, segAt, segUntil, mediaId) { (id, at, len) =>
      if (id == IdTags) {
        walkChildren(b, at, at + len, mediaId) { (cid, cat, clen) =>
          if (cid == IdTag) {
            walkChildren(b, cat, cat + clen, mediaId) { (tid, tat, tlen) =>
              if (tid == IdSimpleTag) {
                var name = ""; var value = ""
                walkChildren(b, tat, tat + tlen, mediaId) { (sid, sat, slen) =>
                  if (sid == IdTagName) name = new String(b, sat, slen, UTF_8)
                  else if (sid == IdTagString) value = new String(b, sat, slen, UTF_8)
                }
                if (name.nonEmpty) out(name) = value
              }
            }
          }
        }
      }
    }
    out.toMap
  }

  private val Fnv64Offset = 0xcbf29ce484222325L
  private val Fnv64Prime = 0x100000001b3L

  /** 64-bit content hash over the Cluster payloads in order (FNV-1a,
    * per-cluster length folded in): the coded A/V data only, so an
    * edited-metadata copy — different Title, Tags, muxer strings,
    * header layout — hashes identically, while any change to the
    * media bytes avalanches. The [[Mp4.contentHash64]] semantics for
    * the EBML container. */
  def contentHash64(b: Array[Byte], mediaId: Long = -1L): Long = {
    val (_, afterHeader) = docTypeOf(b, mediaId)
    val (segAt, segUntil) = segmentRange(b, afterHeader, mediaId)
    var h = Fnv64Offset
    var any = false
    walkChildren(b, segAt, segUntil, mediaId) { (id, at, len) =>
      if (id == IdCluster) {
        any = true
        var i = at
        while (i < at + len) { h ^= (b(i) & 0xffL); h *= Fnv64Prime; i += 1 }
        h ^= len.toLong
        h *= Fnv64Prime
      }
    }
    require(any, s"media $mediaId: Matroska file without Clusters " +
      "(no content to identify)")
    h
  }

  // -- generator (staging/spec counterpart, the Mp4.writeMp4 rule) -------

  final case class MkvTrackSpec(number: Long, trackType: Int, codecId: String,
      width: Int = 0, height: Int = 0, channels: Int = 0,
      sampleRate: Double = 0.0)

  private def vintSize(v: Long): Array[Byte] = {
    // minimal length whose all-ones pattern is not hit (reserved)
    var len = 1
    while (len <= 8 && (v >= (1L << (7 * len)) - 1)) len += 1
    require(len <= 8, s"EBML size $v does not fit")
    val out = new Array[Byte](len)
    var i = len - 1
    var x = v
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out(0) = (out(0) | (0x80 >> (len - 1))).toByte
    out
  }

  private def idBytes(id: Long): Array[Byte] = {
    val len = if (id <= 0xffL) 1 else if (id <= 0xffffL) 2
      else if (id <= 0xffffffL) 3 else 4
    val out = new Array[Byte](len)
    var i = len - 1
    var x = id
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out
  }

  private def el(id: Long, payload: Array[Byte]): Array[Byte] =
    idBytes(id) ++ vintSize(payload.length.toLong) ++ payload

  private def uintPayload(v: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && (v >> (8 * len)) != 0) len += 1
    val out = new Array[Byte](len)
    var i = len - 1
    var x = v
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out
  }

  private def floatPayload(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = ((bits >> (8 * (7 - i))) & 0xff).toByte; i += 1 }
    out
  }

  /** Serialize a structurally VALID Matroska/WebM file: EBML header
    * with the given DocType, Segment with Info (timestamp scale,
    * duration in scale units, a Title), Tracks, optional Tags, and
    * `nClusters` Clusters of deterministic OPAQUE SimpleBlock data
    * (cluster `i` carries `48 + (i·29 mod 200)` media bytes) — the
    * walker never decodes blocks, the honest boundary. */
  def writeMkv(docType: String, timestampScale: Long, durationUnits: Double,
      tracks: Seq[MkvTrackSpec], nClusters: Int, seed: Long = 7L,
      title: String = "planted", tags: Seq[(String, String)] = Nil): Array[Byte] = {
    require(nClusters > 0, "writeMkv needs at least one Cluster")
    val header = el(IdEbml,
      el(0x4286L, uintPayload(1L)) ++ // EBMLVersion
        el(0x42F7L, uintPayload(1L)) ++ // EBMLReadVersion
        el(0x42F2L, uintPayload(4L)) ++ // EBMLMaxIDLength
        el(0x42F3L, uintPayload(8L)) ++ // EBMLMaxSizeLength
        el(IdDocType, docType.getBytes(UTF_8)) ++
        el(0x4287L, uintPayload(4L)) ++ // DocTypeVersion
        el(0x4285L, uintPayload(2L))) // DocTypeReadVersion
    val info = el(IdInfo,
      el(IdTimestampScale, uintPayload(timestampScale)) ++
        el(IdDuration, floatPayload(durationUnits)) ++
        el(0x7BA9L, title.getBytes(UTF_8)) ++ // Title
        el(0x4D80L, "graft".getBytes(UTF_8)) ++ // MuxingApp
        el(0x5741L, "graft".getBytes(UTF_8))) // WritingApp
    val trackEls = tracks.map { t =>
      val video =
        if (t.trackType == 1)
          el(IdVideo, el(IdPixelWidth, uintPayload(t.width.toLong)) ++
            el(IdPixelHeight, uintPayload(t.height.toLong)))
        else Array.emptyByteArray
      val audio =
        if (t.trackType == 2)
          el(IdAudio, el(IdSamplingFrequency, floatPayload(t.sampleRate)) ++
            el(IdChannels, uintPayload(t.channels.toLong)))
        else Array.emptyByteArray
      el(IdTrackEntry,
        el(IdTrackNumber, uintPayload(t.number)) ++
          el(IdTrackType, uintPayload(t.trackType.toLong)) ++
          el(IdCodecId, t.codecId.getBytes(UTF_8)) ++ video ++ audio)
    }
    val tracksEl = el(IdTracks, trackEls.foldLeft(Array.emptyByteArray)(_ ++ _))
    val tagsEl =
      if (tags.isEmpty) Array.emptyByteArray
      else el(IdTags, el(IdTag,
        tags.map { case (k, v) =>
          el(IdSimpleTag, el(IdTagName, k.getBytes(UTF_8)) ++
            el(IdTagString, v.getBytes(UTF_8)))
        }.foldLeft(Array.emptyByteArray)(_ ++ _)))
    val clusters = (0 until nClusters).map { i =>
      val media = Array.tabulate[Byte](48 + (i * 29) % 200)(j =>
        ((seed * 131 + i * 17 + j * 7) & 0xff).toByte)
      // SimpleBlock: track vint (0x81 = track 1), s16be timestamp, flags
      val block = Array[Byte](0x81.toByte,
        ((i >> 8) & 0xff).toByte, (i & 0xff).toByte, 0x80.toByte) ++ media
      el(IdCluster,
        el(0xE7L, uintPayload(i.toLong * 40)) ++ // Cluster Timestamp
          el(0xA3L, block)) // SimpleBlock
    }
    val segment = el(IdSegment,
      (info +: tracksEl +: tagsEl +: clusters)
        .foldLeft(Array.emptyByteArray)(_ ++ _))
    header ++ segment
  }
}
