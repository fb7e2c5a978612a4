package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

/** Pure-JVM Ogg container walk (RFC 3533) with Vorbis and Opus
  * identification headers — the remaining major crawl audio family
  * after MPEG ([[Mpeg]]) and FLAC ([[Flac]]). The container layer is
  * fully public structure: "OggS" pages with a 27-byte header, a
  * lacing segment table that frames packets (a packet ends at the
  * first lacing value < 255, continues across pages otherwise), a
  * 64-bit granule position counting PCM samples, and a page CRC-32
  * (polynomial 0x04C11DB7, unreflected, zero init — computed with the
  * CRC field zeroed) which the walker VERIFIES, so bit rot is a loud
  * failure, not garbage metadata.
  *
  * Codec identification parses only the public id headers:
  * `\x01vorbis` (channels, sample rate; 3 header packets precede
  * audio) and `OpusHead` (channels, pre-skip, input rate; 2 header
  * packets; the granule domain is ALWAYS 48 kHz — RFC 7845). Audio
  * packet DECODE is refused for both — the codebook/range-coder tiers
  * are the same non-derivable-table class as MPEG Layer III (see the
  * [[Mpeg]] adjudication) — but everything the media catalog needs
  * (duration, rate, channels, packet counts) is exact without it.
  *
  * Identity: [[streamHash64]] hashes the CODED AUDIO PACKET SEQUENCE
  * (header packets — including the comment tags — excluded), so a
  * re-tagged OR re-paged copy of the same audio is an exact dup: page
  * layout is a muxer choice the lacing reassembly normalizes away,
  * the property the MPEG stream hash cannot offer because MPEG has no
  * container layer.
  *
  * Scope: a single logical stream per file (one serial). Chained and
  * grouped (multiplexed) Ogg files fail loudly — a crawl's audio
  * overwhelmingly carries one stream, and silently walking only the
  * first would misreport the rest as absent.
  *
  * Fail-loudly contract ([[Multimodal]] codec rule): bad capture
  * pattern, CRC mismatch, sequence gaps, dangling continuation,
  * truncation, or an unknown first packet throw
  * `IllegalArgumentException` with the media id. */
object Ogg {

  /** Exact container metadata. `sampleRate` is the codec's declared
    * rate (Vorbis: the PCM rate; Opus: the ORIGINAL input rate — the
    * granule/duration domain for Opus is always 48 kHz). `preSkip` is
    * 0 for Vorbis. */
  final case class OggInfo(codec: String, channels: Int, sampleRate: Int,
      preSkip: Int, nPages: Int, nAudioPackets: Int, lastGranule: Long,
      durationSec: Double)

  private[graft] final case class OggPage(headerType: Int, granule: Long,
      serial: Long, seq: Long, lacing: Array[Int], dataAt: Int)

  // -- page CRC (poly 0x04C11DB7, unreflected, init 0, no final xor) -----

  private val CrcTable: Array[Int] = Array.tabulate(256) { n =>
    var r = n << 24
    var k = 0
    while (k < 8) {
      r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
      k += 1
    }
    r
  }

  /** Ogg page CRC over `b[from, until)` with the 4 bytes at `crcAt`
    * treated as zero (the on-wire computation rule). */
  private[graft] def pageCrc(b: Array[Byte], from: Int, until: Int,
      crcAt: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      val byte = if (i >= crcAt && i < crcAt + 4) 0 else b(i) & 0xff
      crc = (crc << 8) ^ CrcTable(((crc >>> 24) ^ byte) & 0xff)
      i += 1
    }
    crc
  }

  private def u32le(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def u64le(b: Array[Byte], p: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(p + i) & 0xffL); i -= 1 }
    v
  }

  // -- page walk ---------------------------------------------------------

  /** All pages of a single-stream file, CRC-verified, sequence-checked
    * (consecutive from the BOS page — a gap is lost data), BOS/EOS
    * flags enforced at the boundaries. */
  private[graft] def walkPages(b: Array[Byte], mediaId: Long): Vector[OggPage] = {
    val out = Vector.newBuilder[OggPage]
    var p = 0
    var serial = -1L
    var expectSeq = -1L
    var sawEos = false
    var n = 0
    while (p < b.length) {
      require(!sawEos,
        s"media $mediaId: Ogg data after the EOS page at byte $p " +
          "(chained streams are not supported)")
      require(p + 27 <= b.length, s"media $mediaId: truncated Ogg page header at $p")
      require(b(p) == 'O' && b(p + 1) == 'g' && b(p + 2) == 'g' && b(p + 3) == 'S',
        s"media $mediaId: Ogg capture pattern missing at byte $p")
      require(b(p + 4) == 0, s"media $mediaId: unsupported Ogg version ${b(p + 4)}")
      val headerType = b(p + 5) & 0xff
      val granule = u64le(b, p + 6)
      val pageSerial = u32le(b, p + 14)
      val seq = u32le(b, p + 18)
      val crc = u32le(b, p + 22).toInt
      val nSegs = b(p + 26) & 0xff
      require(p + 27 + nSegs <= b.length,
        s"media $mediaId: truncated Ogg segment table at $p")
      val lacing = new Array[Int](nSegs)
      var dataLen = 0
      var i = 0
      while (i < nSegs) {
        lacing(i) = b(p + 27 + i) & 0xff
        dataLen += lacing(i)
        i += 1
      }
      val dataAt = p + 27 + nSegs
      require(dataAt + dataLen <= b.length,
        s"media $mediaId: Ogg page data overruns the payload at $p")
      require(pageCrc(b, p, dataAt + dataLen, p + 22) == crc,
        s"media $mediaId: Ogg page CRC mismatch at byte $p")
      if (n == 0) {
        require((headerType & 0x02) != 0,
          s"media $mediaId: first Ogg page is not BOS")
        serial = pageSerial
        expectSeq = seq
      } else {
        require((headerType & 0x02) == 0,
          s"media $mediaId: BOS flag on a non-first page " +
            "(grouped/multiplexed streams are not supported)")
        require(pageSerial == serial,
          s"media $mediaId: second Ogg stream serial $pageSerial " +
            "(multiplexed files are not supported)")
      }
      require(seq == expectSeq,
        s"media $mediaId: Ogg page sequence gap (expected $expectSeq, got $seq)")
      if ((headerType & 0x04) != 0) sawEos = true
      out += OggPage(headerType, granule, pageSerial, seq, lacing, dataAt)
      expectSeq += 1
      p = dataAt + dataLen
      n += 1
    }
    require(n > 0, s"media $mediaId: no Ogg pages in the payload")
    require(sawEos, s"media $mediaId: Ogg stream without an EOS page (truncated)")
    out.result()
  }

  /** Packets reassembled from the lacing tables as (offset, length)
    * range lists — a packet spanning pages is a multi-range packet;
    * hashing the ranges in order equals hashing the reassembled
    * packet. Continuation flags are validated BOTH ways (a flag
    * without a pending partial, or a partial without the flag, is
    * framing damage). */
  private[graft] def packets(b: Array[Byte], pages: Vector[OggPage],
      mediaId: Long): Vector[Vector[(Int, Int)]] = {
    val out = Vector.newBuilder[Vector[(Int, Int)]]
    var pending: List[(Int, Int)] = Nil
    pages.foreach { pg =>
      val continued = (pg.headerType & 0x01) != 0
      require(continued == pending.nonEmpty,
        s"media $mediaId: Ogg continuation flag/state mismatch on page ${pg.seq}")
      var at = pg.dataAt
      var i = 0
      while (i < pg.lacing.length) {
        val l = pg.lacing(i)
        if (l > 0) pending = (at, l) :: pending
        if (l < 255) { out += pending.reverse.toVector; pending = Nil }
        at += l
        i += 1
      }
    }
    require(pending.isEmpty,
      s"media $mediaId: Ogg stream ends inside a packet (truncated)")
    out.result()
  }

  private def packetBytes(b: Array[Byte], ranges: Vector[(Int, Int)]): Array[Byte] = {
    val len = ranges.map(_._2).sum
    val out = new Array[Byte](len)
    var at = 0
    ranges.foreach { case (off, l) =>
      System.arraycopy(b, off, out, at, l); at += l
    }
    out
  }

  private val VorbisMagic = Array[Byte](1, 'v', 'o', 'r', 'b', 'i', 's')
  private val OpusMagic = "OpusHead".getBytes(UTF_8)

  private def startsWith(b: Array[Byte], magic: Array[Byte]): Boolean =
    b.length >= magic.length && {
      var i = 0
      while (i < magic.length && b(i) == magic(i)) i += 1
      i == magic.length
    }

  /** (codec, channels, declaredRate, preSkip, nHeaderPackets) from the
    * first packet's identification header. */
  private def idHeader(first: Array[Byte], mediaId: Long)
      : (String, Int, Int, Int, Int) =
    if (startsWith(first, VorbisMagic)) {
      require(first.length >= 30,
        s"media $mediaId: truncated Vorbis identification header")
      require(u32le(first, 7) == 0L,
        s"media $mediaId: unsupported Vorbis version ${u32le(first, 7)}")
      val channels = first(11) & 0xff
      val rate = u32le(first, 12).toInt
      require(channels > 0 && rate > 0,
        s"media $mediaId: degenerate Vorbis header ($channels ch, $rate Hz)")
      ("vorbis", channels, rate, 0, 3)
    } else if (startsWith(first, OpusMagic)) {
      require(first.length >= 19, s"media $mediaId: truncated OpusHead")
      // upper nibble is the incompatible-change major version (RFC 7845)
      require(((first(8) & 0xff) >> 4) == 0,
        s"media $mediaId: unsupported Opus version ${first(8) & 0xff}")
      val channels = first(9) & 0xff
      val preSkip = (first(10) & 0xff) | ((first(11) & 0xff) << 8)
      val inputRate = u32le(first, 12).toInt
      require(channels > 0,
        s"media $mediaId: degenerate OpusHead (0 channels)")
      ("opus", channels, inputRate, preSkip, 2)
    } else throw new IllegalArgumentException(
      s"media $mediaId: unknown Ogg codec (first packet is neither " +
        "Vorbis nor Opus)")

  /** Exact metadata of a single-stream Ogg file. Duration comes from
    * the final page's granule position: Vorbis granules are PCM
    * samples at the declared rate; Opus granules are 48 kHz samples
    * INCLUDING the pre-skip priming (RFC 7845 §4), so playable time is
    * `(granule - preSkip) / 48000`. */
  def oggInfo(b: Array[Byte], mediaId: Long = -1L): OggInfo = {
    val pages = walkPages(b, mediaId)
    val pks = packets(b, pages, mediaId)
    require(pks.nonEmpty, s"media $mediaId: Ogg stream carries no packets")
    val (codec, channels, rate, preSkip, nHeader) =
      idHeader(packetBytes(b, pks.head), mediaId)
    require(pks.length >= nHeader,
      s"media $mediaId: $codec stream with only ${pks.length} of " +
        s"$nHeader header packets")
    val lastGranule = pages.last.granule
    val durationSec = codec match {
      case "opus" => math.max(0L, lastGranule - preSkip).toDouble / 48000.0
      case _ =>
        require(rate > 0, s"media $mediaId: zero Vorbis rate")
        lastGranule.toDouble / rate
    }
    OggInfo(codec, channels, rate, preSkip, pages.length,
      pks.length - nHeader, lastGranule, durationSec)
  }

  // -- comment tags ------------------------------------------------------

  /** Vorbis-comment user tags of the stream's second packet
    * (`\x03vorbis` for Vorbis, `OpusTags` for Opus) as
    * FIELD → value with the field name uppercased (field names are
    * case-insensitive by spec). Later duplicates of a field win, the
    * [[Mpeg.id3Frames]] rule. A malformed comment packet fails loudly;
    * a stream is never REQUIRED to carry user tags (empty map). */
  def commentTags(b: Array[Byte], mediaId: Long = -1L): Map[String, String] = {
    val pages = walkPages(b, mediaId)
    val pks = packets(b, pages, mediaId)
    require(pks.length >= 2, s"media $mediaId: Ogg stream without a comment packet")
    val first = packetBytes(b, pks.head)
    val second = packetBytes(b, pks(1))
    val at =
      if (startsWith(first, VorbisMagic)) {
        require(second.length >= 7 && second(0) == 3 &&
            startsWith(java.util.Arrays.copyOfRange(second, 1, second.length),
              "vorbis".getBytes(UTF_8)),
          s"media $mediaId: second Vorbis packet is not a comment header")
        7
      } else if (startsWith(first, OpusMagic)) {
        require(startsWith(second, "OpusTags".getBytes(UTF_8)),
          s"media $mediaId: second Opus packet is not OpusTags")
        8
      } else throw new IllegalArgumentException(
        s"media $mediaId: unknown Ogg codec")
    var p = at
    def readU32(): Int = {
      require(p + 4 <= second.length,
        s"media $mediaId: truncated Vorbis comment block")
      val v = u32le(second, p); p += 4
      require(v >= 0 && v <= second.length,
        s"media $mediaId: absurd Vorbis comment length $v")
      v.toInt
    }
    val vendorLen = readU32()
    require(p + vendorLen <= second.length,
      s"media $mediaId: Vorbis vendor string overruns the packet")
    p += vendorLen
    val n = readU32()
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var i = 0
    while (i < n) {
      val len = readU32()
      require(p + len <= second.length,
        s"media $mediaId: Vorbis comment $i overruns the packet")
      val s = new String(second, p, len, UTF_8)
      p += len
      val eq = s.indexOf('=')
      require(eq > 0, s"media $mediaId: Vorbis comment without '=': '$s'")
      out(s.substring(0, eq).toUpperCase(java.util.Locale.ROOT)) =
        s.substring(eq + 1)
      i += 1
    }
    out.toMap
  }

  // -- tag/page-layout-invariant identity --------------------------------

  private val Fnv64Offset = 0xcbf29ce484222325L
  private val Fnv64Prime = 0x100000001b3L

  /** 64-bit content hash of the coded AUDIO packet sequence: FNV-1a
    * chained over each audio packet's bytes with the packet LENGTH
    * folded in at each boundary (so re-splitting bytes across packets
    * can never collide with the original framing — the container
    * analogue of [[Mpeg.streamHash64]]'s frame ranges). Header packets
    * — identification, COMMENT TAGS, setup — are excluded, so a
    * re-tagged or re-paged copy of the same audio hashes identically,
    * while any change to the coded audio avalanches. */
  def streamHash64(b: Array[Byte], mediaId: Long = -1L): Long = {
    val pages = walkPages(b, mediaId)
    val pks = packets(b, pages, mediaId)
    require(pks.nonEmpty, s"media $mediaId: Ogg stream carries no packets")
    val (_, _, _, _, nHeader) = idHeader(packetBytes(b, pks.head), mediaId)
    var h = Fnv64Offset
    pks.drop(nHeader).foreach { ranges =>
      var len = 0
      ranges.foreach { case (off, l) =>
        var i = off
        while (i < off + l) { h ^= (b(i) & 0xffL); h *= Fnv64Prime; i += 1 }
        len += l
      }
      h ^= len.toLong
      h *= Fnv64Prime
    }
    h
  }

  // -- generator (staging/spec counterpart, the Mpeg.writeCbrStream rule)

  /** Samples-per-packet the generator plants: Vorbis 576 (a short
    * window's worth), Opus 960 (the 20 ms default frame at 48 kHz). */
  val VorbisSpp = 576
  val OpusSpp = 960
  /** The generator's fixed Opus pre-skip (312 = 6.5 ms, a typical
    * encoder priming). */
  val GenPreSkip = 312

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def vorbisComments(magic: Array[Byte],
      comments: Seq[(String, String)], framing: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(magic)
    val vendor = "graft".getBytes(UTF_8)
    out.write(le32(vendor.length.toLong)); out.write(vendor)
    out.write(le32(comments.length.toLong))
    comments.foreach { case (k, v) =>
      val kv = (k + "=" + v).getBytes(UTF_8)
      out.write(le32(kv.length.toLong)); out.write(kv)
    }
    if (framing) out.write(1)
    out.toByteArray
  }

  /** Serialize a structurally VALID single-stream Ogg file: real page
    * framing, real CRCs, correct granule positions, `packetsPerPage`
    * audio packets per page (a muxer layout choice — [[streamHash64]]
    * must not see it). Audio packets are deterministic OPAQUE bytes
    * (packet `i` has length `40 + (i·37 mod 300)`, so some packets
    * exceed 255 bytes and exercise 255-lacing continuation): the
    * walker never decodes them, which is exactly the honest boundary —
    * see the object doc. */
  def writeOgg(codec: String, channels: Int, rate: Int, nPackets: Int,
      packetsPerPage: Int = 2, seed: Long = 7L,
      comments: Seq[(String, String)] = Seq("TITLE" -> "planted")): Array[Byte] = {
    require(nPackets > 0, "writeOgg needs at least one audio packet")
    require(packetsPerPage > 0, "degenerate packetsPerPage")
    val headerPackets: Seq[Array[Byte]] = codec match {
      case "vorbis" =>
        val id = new java.io.ByteArrayOutputStream()
        id.write(VorbisMagic); id.write(le32(0L))
        id.write(channels)
        id.write(le32(rate.toLong))
        id.write(le32(0L)); id.write(le32(rate * 3L)); id.write(le32(0L))
        id.write(0xb8) // blocksizes 256/2048
        id.write(1) // framing bit
        val setup = Array.tabulate[Byte](64)(j =>
          (5 ^ (j * 11) ^ (seed & 0x7f)).toByte)
        Seq(id.toByteArray,
          vorbisComments(Array[Byte](3) ++ "vorbis".getBytes(UTF_8),
            comments, framing = true),
          Array[Byte](5) ++ "vorbis".getBytes(UTF_8) ++ setup)
      case "opus" =>
        require(channels <= 2, "mapping family 0 carries at most 2 channels")
        val id = new java.io.ByteArrayOutputStream()
        id.write(OpusMagic); id.write(1)
        id.write(channels)
        id.write(le16(GenPreSkip))
        id.write(le32(rate.toLong))
        id.write(le16(0)) // output gain
        id.write(0) // mapping family 0
        Seq(id.toByteArray,
          vorbisComments("OpusTags".getBytes(UTF_8), comments, framing = false))
      case c => throw new IllegalArgumentException(s"unknown codec '$c'")
    }
    val spp = if (codec == "opus") OpusSpp else VorbisSpp
    val granuleBase = if (codec == "opus") GenPreSkip.toLong else 0L
    val audio = (0 until nPackets).map { i =>
      Array.tabulate[Byte](40 + (i * 37) % 300)(j =>
        ((seed * 131 + i * 17 + j * 7) & 0xff).toByte)
    }
    val out = new java.io.ByteArrayOutputStream()
    var seq = 0L
    def writePage(pkts: Seq[Array[Byte]], headerType: Int, granule: Long): Unit = {
      val lacing = new java.io.ByteArrayOutputStream()
      val data = new java.io.ByteArrayOutputStream()
      pkts.foreach { pk =>
        var rem = pk.length
        while (rem >= 255) { lacing.write(255); rem -= 255 }
        lacing.write(rem) // final short lacing terminates the packet
        data.write(pk)
      }
      val lac = lacing.toByteArray
      require(lac.length <= 255, "generator page exceeds 255 lacing segments")
      val page = new java.io.ByteArrayOutputStream()
      page.write("OggS".getBytes(UTF_8)); page.write(0)
      page.write(headerType)
      var g = granule
      var i = 0
      while (i < 8) { page.write((g & 0xff).toInt); g >>>= 8; i += 1 }
      page.write(le32(0x6772616fL)) // serial "ogra"
      page.write(le32(seq)); seq += 1
      page.write(le32(0L)) // CRC placeholder
      page.write(lac.length)
      page.write(lac)
      page.write(data.toByteArray)
      val bytes = page.toByteArray
      val crc = pageCrc(bytes, 0, bytes.length, 22)
      val crcB = le32(crc.toLong & 0xffffffffL)
      System.arraycopy(crcB, 0, bytes, 22, 4)
      out.write(bytes)
    }
    writePage(Seq(headerPackets.head), 0x02, 0L) // BOS: id header alone
    writePage(headerPackets.tail, 0x00, 0L) // header pages carry granule 0
    val groups = audio.grouped(packetsPerPage).toVector
    var done = 0
    groups.zipWithIndex.foreach { case (g, gi) =>
      done += g.length
      val eos = if (gi == groups.length - 1) 0x04 else 0x00
      writePage(g, eos, granuleBase + done.toLong * spp)
    }
    out.toByteArray
  }
}
