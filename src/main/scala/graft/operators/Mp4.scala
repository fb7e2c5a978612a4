package graft.operators

/** Pure-JVM ISO-BMFF (MP4, ISO/IEC 14496-12) box-tree walk — the video
  * face of [[Mpeg.mpegInfo]]. A real crawl's video is overwhelmingly
  * MP4; the catalog value (duration, per-track codec fourccs,
  * dimensions, sample counts, audio rate/channels) needs NO sample
  * decode: every field is carried by the length-prefixed box tree
  * (`ftyp`/`moov`/`mvhd`/`trak`/`tkhd`/`mdia`/`mdhd`/`hdlr`/`stbl`/
  * `stsd`/`stts`/`stsz`), whose layout is public spec. The walk handles
  * the 64-bit `largesize` header form and version 0/1 time fields
  * (32- vs 64-bit creation/modification/duration) everywhere they
  * occur.
  *
  * Reference scope note: the reference ETL (treynr/eggv, Dask/pandas
  * over genomics TSVs) has no media tier at all — this module is part
  * of the training-data-pipeline extension surface, designed alongside
  * the [[Mpeg]]/[[Avi]]/[[Flac]] codecs.
  *
  * Fail-loudly contract ([[Multimodal]] codec rule): truncated boxes, a
  * child box overrunning its parent, a missing `moov`/`mvhd`, or a
  * track missing its `tkhd`/`mdhd`/`hdlr`/`stsd` throw
  * `IllegalArgumentException` with the media id — metadata is either
  * exact or absent, never guessed (the [[Mpeg]] adjudication).
  */
object Mp4 {

  /** One track's catalog metadata. `width`/`height` are the integer
    * parts of `tkhd`'s 16.16 fixed-point presentation size (0 for
    * audio); `sampleRate`/`channels` come from the `mp4a`-family audio
    * sample entry (0 for video); `timescale`/`duration` are the MEDIA
    * clock (`mdhd`), `durationSec` their quotient. */
  final case class Mp4Track(
      trackId: Long, handler: String, codec: String,
      width: Int, height: Int,
      timescale: Long, duration: Long, durationSec: Double,
      sampleCount: Long, sampleRate: Int, channels: Int)

  /** Container-level metadata: `ftyp` major brand and the `mvhd` movie
    * clock, plus every `trak` in file order. */
  final case class Mp4Info(
      majorBrand: String, timescale: Long, duration: Long,
      durationSec: Double, tracks: Vector[Mp4Track])

  /** Byte/box readers over one payload — shared by [[mp4Info]] and
    * [[ilstTags]] so the two walks cannot drift. */
  private[operators] final class Boxes(val b: Array[Byte], val mediaId: Long) {
    def u16(p: Int): Int = {
      require(p + 2 <= b.length, s"media $mediaId: truncated MP4 at byte $p")
      ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
    }
    def u32(p: Int): Long = {
      require(p + 4 <= b.length, s"media $mediaId: truncated MP4 at byte $p")
      ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    }
    def u64(p: Int): Long = (u32(p) << 32) | u32(p + 4)
    def fourcc(p: Int): String = {
      require(p + 4 <= b.length, s"media $mediaId: truncated MP4 at byte $p")
      new String(b, p, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    // One box header at p within [p, until): (type, dataStart, boxEnd).
    // size==1 → 64-bit largesize follows the type; size==0 → the box
    // runs to the end of its parent (the spec's last-box form).
    def boxAt(p: Int, until: Int): (String, Int, Int) = {
      require(p + 8 <= until, s"media $mediaId: truncated MP4 box header at $p")
      val size32 = u32(p)
      val typ = fourcc(p + 4)
      val (hdr, size) =
        if (size32 == 1L) {
          val ls = u64(p + 8)
          require(ls >= 16, s"media $mediaId: MP4 '$typ' largesize $ls < header")
          (16, ls)
        } else if (size32 == 0L) (8, (until - p).toLong)
        else {
          require(size32 >= 8, s"media $mediaId: MP4 '$typ' size $size32 < header")
          (8, size32)
        }
      require(size <= (until - p).toLong,
        s"media $mediaId: MP4 box '$typ' size $size overruns its parent at $p")
      (typ, p + hdr, p + size.toInt)
    }
    // FullBox version+flags word; only the version byte matters here
    def version(dataAt: Int): Int = { u32(dataAt); b(dataAt) & 0xff }
    // children of a container box as (type, dataStart, boxEnd) triples
    def children(from: Int, until: Int): Vector[(String, Int, Int)] = {
      val out = Vector.newBuilder[(String, Int, Int)]
      var q = from
      while (q < until) {
        val c = boxAt(q, until)
        out += c
        q = c._3
      }
      out.result()
    }
    def child(cs: Vector[(String, Int, Int)], typ: String,
        where: String): (Int, Int) =
      cs.find(_._1 == typ).map(c => (c._2, c._3)).getOrElse(
        throw new IllegalArgumentException(
          s"media $mediaId: MP4 $where without a $typ box"))
    def childOpt(cs: Vector[(String, Int, Int)],
        typ: String): Option[(Int, Int)] =
      cs.find(_._1 == typ).map(c => (c._2, c._3))
  }

  /** Walk the box tree: exact container metadata, no sample decode. */
  def mp4Info(b: Array[Byte], mediaId: Long = -1L): Mp4Info = {
    val bx = new Boxes(b, mediaId)
    import bx.{u16, u32, u64, fourcc, boxAt, version, children, child}

    require(b.length >= 8, s"media $mediaId: not an MP4 payload (too short)")
    val (firstType, ftypData, ftypEnd) = boxAt(0, b.length)
    require(firstType == "ftyp",
      s"media $mediaId: not an MP4 payload (first box '$firstType', not ftyp)")
    require(ftypData + 4 <= ftypEnd, s"media $mediaId: ftyp without a brand")
    val majorBrand = fourcc(ftypData)

    // locate moov among the top-level boxes
    var moov: Option[(Int, Int)] = None
    var p = ftypEnd
    while (p < b.length) {
      val (typ, dataAt, end) = boxAt(p, b.length)
      if (typ == "moov") {
        require(moov.isEmpty, s"media $mediaId: MP4 with two moov boxes")
        moov = Some((dataAt, end))
      }
      p = end
    }
    val (moovAt, moovEnd) = moov.getOrElse(throw new IllegalArgumentException(
      s"media $mediaId: MP4 without a moov box"))

    val moovKids = children(moovAt, moovEnd)
    val (mvhdAt, _) = child(moovKids, "mvhd", "moov")
    val (mvTimescale, mvDuration) = version(mvhdAt) match {
      case 0 => (u32(mvhdAt + 12), u32(mvhdAt + 16))
      case 1 => (u32(mvhdAt + 20), u64(mvhdAt + 24))
      case v => throw new IllegalArgumentException(
        s"media $mediaId: mvhd version $v")
    }
    require(mvTimescale > 0, s"media $mediaId: mvhd timescale 0")
    require(mvDuration >= 0, s"media $mediaId: mvhd duration negative")

    val tracks = moovKids.filter(_._1 == "trak").map { case (_, tAt, tEnd) =>
      val tk = children(tAt, tEnd)
      val (tkhdAt, tkhdEnd) = child(tk, "tkhd", "trak")
      // after duration: reserved(8) layer(2) altgroup(2) volume(2)
      // reserved(2) matrix(36), then 16.16 width/height
      val (trackId, dimsAt) = version(tkhdAt) match {
        case 0 => (u32(tkhdAt + 12), tkhdAt + 24 + 52)
        case 1 => (u32(tkhdAt + 20), tkhdAt + 36 + 52)
        case v => throw new IllegalArgumentException(
          s"media $mediaId: tkhd version $v")
      }
      require(dimsAt + 8 <= tkhdEnd,
        s"media $mediaId: tkhd too short for presentation size")
      val tkWidth = (u32(dimsAt) >>> 16).toInt
      val tkHeight = (u32(dimsAt + 4) >>> 16).toInt

      val (mdiaAt, mdiaEnd) = child(tk, "mdia", "trak")
      val md = children(mdiaAt, mdiaEnd)
      val (mdhdAt, _) = child(md, "mdhd", "mdia")
      val (trTimescale, trDuration) = version(mdhdAt) match {
        case 0 => (u32(mdhdAt + 12), u32(mdhdAt + 16))
        case 1 => (u32(mdhdAt + 20), u64(mdhdAt + 24))
        case v => throw new IllegalArgumentException(
          s"media $mediaId: mdhd version $v")
      }
      require(trTimescale > 0, s"media $mediaId: mdhd timescale 0")
      val (hdlrAt, _) = child(md, "hdlr", "mdia")
      val handler = fourcc(hdlrAt + 8) // version/flags, pre_defined, then type

      val (minfAt, minfEnd) = child(md, "minf", "mdia")
      val stblKids = {
        val (stblAt, stblEnd) = child(children(minfAt, minfEnd), "stbl", "minf")
        children(stblAt, stblEnd)
      }
      val (stsdAt, stsdEnd) = child(stblKids, "stsd", "stbl")
      require(u32(stsdAt + 4) >= 1, s"media $mediaId: stsd with no entries")
      val (codec, entryData, entryEnd) = boxAt(stsdAt + 8, stsdEnd)
      // sample-entry layouts past the 6+2 reserved/data-reference head:
      //   visual: pre_defined(2) reserved(2) pre_defined(12) w(2) h(2)
      //   audio:  reserved(8) channelcount(2) samplesize(2)
      //           pre_defined(2) reserved(2) samplerate 16.16(4)
      val isAudio = handler == "soun"
      val (seW, seH, seRate, seCh) =
        if (isAudio) {
          require(entryData + 28 <= entryEnd,
            s"media $mediaId: audio sample entry '$codec' too short")
          (0, 0, (u32(entryData + 24) >>> 16).toInt, u16(entryData + 16))
        } else if (handler == "vide") {
          require(entryData + 28 <= entryEnd,
            s"media $mediaId: visual sample entry '$codec' too short")
          (u16(entryData + 24), u16(entryData + 26), 0, 0)
        } else (0, 0, 0, 0) // hint/meta/text tracks: identity only

      // sample count: stsz carries it directly; stts is the fallback
      // (both are mandatory in spec, but trust whichever is present)
      val sampleCount = stblKids.find(_._1 == "stsz").map { case (_, d, _) =>
        u32(d + 8)
      }.orElse(stblKids.find(_._1 == "stts").map { case (_, d, e) =>
        val n = u32(d + 4)
        require(d + 8 + 8L * n <= e, s"media $mediaId: stts overruns")
        (0L until n).map(i => u32(d + 8 + 8 * i.toInt)).sum
      }).getOrElse(throw new IllegalArgumentException(
        s"media $mediaId: MP4 track $trackId without stsz or stts"))

      Mp4Track(trackId, handler, codec,
        if (isAudio) 0 else tkWidth, if (isAudio) 0 else tkHeight,
        trTimescale, trDuration, trDuration.toDouble / trTimescale,
        sampleCount, seRate, seCh)
    }
    require(tracks.nonEmpty, s"media $mediaId: MP4 moov without any trak")
    Mp4Info(majorBrand, mvTimescale, mvDuration,
      mvDuration.toDouble / mvTimescale, tracks)
  }

  /** iTunes-style text tags (the MP4 face of [[Mpeg.id3Frames]]): the
    * `moov/udta/meta/ilst` item list, each item a box (`©nam` title,
    * `©ART` artist, `©alb` album, …) holding a `data` box whose
    * type-indicator 1 means UTF-8 text (other well-known types —
    * artwork, integers — are skipped by size). Returns item-fourcc →
    * text; empty when any level of the path is absent (untagged files
    * are the common case, not an error). Structural damage inside a
    * PRESENT ilst — a data box too short for its header, an overrun —
    * throws with the media id: catalog fields are exact or absent,
    * never guessed. */
  def ilstTags(b: Array[Byte], mediaId: Long = -1L): Map[String, String] = {
    val bx = new Boxes(b, mediaId)
    import bx.{boxAt, children, childOpt, u32}
    require(b.length >= 8, s"media $mediaId: not an MP4 payload (too short)")
    val (firstType, _, ftypEnd) = boxAt(0, b.length)
    require(firstType == "ftyp",
      s"media $mediaId: not an MP4 payload (first box '$firstType', not ftyp)")
    var moov: Option[(Int, Int)] = None
    var p = ftypEnd
    while (p < b.length) {
      val (typ, dataAt, end) = boxAt(p, b.length)
      if (typ == "moov") moov = Some((dataAt, end))
      p = end
    }
    val tags = for {
      (moovAt, moovEnd) <- moov
      (udtaAt, udtaEnd) <- childOpt(children(moovAt, moovEnd), "udta")
      (metaAt, metaEnd) <- childOpt(children(udtaAt, udtaEnd), "meta")
      // meta is a FullBox: its children start past the version/flags word
      (ilstAt, ilstEnd) <- childOpt(children(metaAt + 4, metaEnd), "ilst")
    } yield children(ilstAt, ilstEnd).flatMap { case (item, iAt, iEnd) =>
      childOpt(children(iAt, iEnd), "data").flatMap { case (dAt, dEnd) =>
        require(dAt + 8 <= dEnd,
          s"media $mediaId: MP4 ilst '$item' data box too short")
        val typeIndicator = u32(dAt) & 0xffffff // byte 0 is the version
        if (typeIndicator != 1L) None // not UTF-8 text (artwork, ints, …)
        else Some(item -> new String(b, dAt + 8, dEnd - dAt - 8,
          java.nio.charset.StandardCharsets.UTF_8))
      }
    }.toMap
    tags.getOrElse(Map.empty)
  }

  // -- metadata-invariant identity ---------------------------------------

  private val Fnv64Offset = 0xcbf29ce484222325L
  private def fnv1a64(b: Array[Byte], from: Int, until: Int,
      seed: Long): Long = {
    var h = seed
    var i = from
    while (i < until) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** 64-bit content hash of the MEDIA DATA: FNV-1a chained over the
    * payload ranges of every top-level `mdat` box in file order — the
    * MP4 face of [[Mpeg.streamHash64]]. Editing metadata (a rewritten
    * `moov`/`udta`, different time-field versions, a largesize header,
    * inserted `free` space) cannot change it, while any change to the
    * coded samples does — so a metadata-edited copy of the same video
    * is an exact dup in the media dedup sink. A REMUX that re-chunks
    * the interleaving changes the mdat layout and hashes differently:
    * exact identity covers the edited-copy case, the same honest scope
    * as the MPEG stream hash (no sample decode, no guessing). Requires
    * a well-formed box tree with at least one `mdat`; anything else
    * throws (the fail-loud codec rule — the dedup bridge degrades to
    * pass-through, [[graft.operators.CorpusPipeline]]). */
  def contentHash64(b: Array[Byte], mediaId: Long = -1L): Long = {
    def u32(p: Int): Long = {
      require(p + 4 <= b.length, s"media $mediaId: truncated MP4 at byte $p")
      ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    }
    def u64(p: Int): Long = (u32(p) << 32) | u32(p + 4)
    require(b.length >= 8, s"media $mediaId: not an MP4 payload (too short)")
    require(new String(b, 4, 4, java.nio.charset.StandardCharsets.US_ASCII) == "ftyp",
      s"media $mediaId: not an MP4 payload (first box is not ftyp)")
    var h = Fnv64Offset
    var sawMdat = false
    var p = 0
    while (p < b.length) {
      val size32 = u32(p)
      val typ = new String(b, p + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val (hdr, size) =
        if (size32 == 1L) { val ls = u64(p + 8); require(ls >= 16,
          s"media $mediaId: MP4 '$typ' largesize $ls < header"); (16, ls) }
        else if (size32 == 0L) (8, (b.length - p).toLong)
        else { require(size32 >= 8,
          s"media $mediaId: MP4 '$typ' size $size32 < header"); (8, size32) }
      require(size <= (b.length - p).toLong,
        s"media $mediaId: MP4 box '$typ' size $size overruns the payload")
      if (typ == "mdat") {
        sawMdat = true
        h = fnv1a64(b, p + hdr, p + size.toInt, h)
      }
      p += size.toInt
    }
    require(sawMdat, s"media $mediaId: MP4 without an mdat box — no media data")
    h
  }

  // -- generator (staging/spec counterpart, the Mpeg.writeCbrStream rule) --

  /** Track parameters for [[writeMp4]]: `handler` "vide" (uses
    * `width`/`height`) or "soun" (uses `sampleRate`/`channels`);
    * `version` 0/1 picks 32- vs 64-bit time fields in tkhd/mdhd. */
  final case class Mp4TrackSpec(
      trackId: Long, handler: String, codec: String,
      width: Int = 0, height: Int = 0,
      timescale: Long = 0L, duration: Long = 0L, sampleCount: Int = 0,
      sampleRate: Int = 0, channels: Int = 0, version: Int = 0)

  private[operators] def beBytes(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >>> (8 * (n - 1 - i))) & 0xff).toByte)

  private[operators] def box(typ: String, payload: Array[Byte],
      largesize: Boolean = false): Array[Byte] = {
    // latin-1, not ASCII: iTunes item fourccs carry © (0xA9)
    val t = typ.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    require(t.length == 4, s"fourcc '$typ'")
    if (largesize)
      beBytes(1L, 4) ++ t ++ beBytes(16L + payload.length, 8) ++ payload
    else beBytes(8L + payload.length, 4) ++ t ++ payload
  }
  private[operators] def fullBox(typ: String, version: Int,
      payload: Array[Byte]): Array[Byte] =
    box(typ, beBytes(version.toLong << 24, 4) ++ payload)

  /** Serialize a minimal VALID MP4 — the staging counterpart of
    * [[mp4Info]] for oracled metadata queries and specs. `version`
    * picks the mvhd time-field width; `largesizeMoov` writes moov in
    * the 64-bit `largesize` header form (byte-level variant, identical
    * walk output); `mdatBytes` is the media payload (so identity gates
    * can plant same-content/different-metadata twins). */
  def writeMp4(majorBrand: String, timescale: Long, duration: Long,
      tracks: Seq[Mp4TrackSpec], version: Int = 0,
      largesizeMoov: Boolean = false,
      mdatBytes: Array[Byte] = Array.fill[Byte](16)(0),
      tags: Seq[(String, String)] = Nil): Array[Byte] = {
    require(tracks.nonEmpty, "writeMp4 needs at least one track")
    val ftyp = box("ftyp",
      majorBrand.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        beBytes(0L, 4) ++
        "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val mvhd = fullBox("mvhd", version,
      (if (version == 1)
        beBytes(0L, 8) ++ beBytes(0L, 8) ++ beBytes(timescale, 4) ++
          beBytes(duration, 8)
      else
        beBytes(0L, 4) ++ beBytes(0L, 4) ++ beBytes(timescale, 4) ++
          beBytes(duration, 4)) ++
        beBytes(0x00010000L, 4) ++ beBytes(0x0100L, 2) ++ beBytes(0L, 2) ++ // rate, volume
        beBytes(0L, 8) ++ identityMatrix ++ beBytes(0L, 24) ++ // reserved, matrix, pre_defined
        beBytes(tracks.map(_.trackId).max + 1, 4)) // next_track_ID
    val traks = tracks.map { t =>
      val tkhd = fullBox("tkhd", t.version,
        (if (t.version == 1)
          beBytes(0L, 8) ++ beBytes(0L, 8) ++ beBytes(t.trackId, 4) ++
            beBytes(0L, 4) ++ beBytes(t.duration, 8)
        else
          beBytes(0L, 4) ++ beBytes(0L, 4) ++ beBytes(t.trackId, 4) ++
            beBytes(0L, 4) ++ beBytes(t.duration, 4)) ++
          beBytes(0L, 8) ++ beBytes(0L, 2) ++ beBytes(0L, 2) ++ // reserved, layer, altgroup
          beBytes(if (t.handler == "soun") 0x0100L else 0L, 2) ++ // volume
          beBytes(0L, 2) ++ identityMatrix ++
          beBytes(t.width.toLong << 16, 4) ++ beBytes(t.height.toLong << 16, 4))
      val mdhd = fullBox("mdhd", t.version,
        (if (t.version == 1)
          beBytes(0L, 8) ++ beBytes(0L, 8) ++ beBytes(t.timescale, 4) ++
            beBytes(t.duration, 8)
        else
          beBytes(0L, 4) ++ beBytes(0L, 4) ++ beBytes(t.timescale, 4) ++
            beBytes(t.duration, 4)) ++
          beBytes(0x55c4L, 2) ++ beBytes(0L, 2)) // language "und", pre_defined
      val hdlr = fullBox("hdlr", 0,
        beBytes(0L, 4) ++
          t.handler.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
          beBytes(0L, 12) ++ Array(0.toByte)) // reserved, empty name
      val sampleEntry =
        if (t.handler == "soun")
          box(t.codec, beBytes(0L, 6) ++ beBytes(1L, 2) ++ // reserved, dri
            beBytes(0L, 8) ++ beBytes(t.channels.toLong, 2) ++
            beBytes(16L, 2) ++ beBytes(0L, 2) ++ beBytes(0L, 2) ++
            beBytes(t.sampleRate.toLong << 16, 4))
        else
          box(t.codec, beBytes(0L, 6) ++ beBytes(1L, 2) ++
            beBytes(0L, 2) ++ beBytes(0L, 2) ++ beBytes(0L, 12) ++
            beBytes(t.width.toLong, 2) ++ beBytes(t.height.toLong, 2) ++
            beBytes(0x00480000L, 4) ++ beBytes(0x00480000L, 4) ++ // 72 dpi
            beBytes(0L, 4) ++ beBytes(1L, 2) ++ beBytes(0L, 32) ++ // frame_count, compressorname
            beBytes(24L, 2) ++ beBytes(0xffffL, 2)) // depth, pre_defined -1
      val stsd = fullBox("stsd", 0, beBytes(1L, 4) ++ sampleEntry)
      val delta = math.max(1L, t.duration / math.max(1, t.sampleCount))
      val stts = fullBox("stts", 0,
        beBytes(1L, 4) ++ beBytes(t.sampleCount.toLong, 4) ++ beBytes(delta, 4))
      val stsz = fullBox("stsz", 0,
        beBytes(1L, 4) ++ beBytes(t.sampleCount.toLong, 4)) // uniform size 1
      val stbl = box("stbl", stsd ++ stts ++ stsz)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd ++ hdlr ++ minf)
      box("trak", tkhd ++ mdia)
    }
    val udta =
      if (tags.isEmpty) Array.empty[Byte]
      else {
        val items = tags.map { case (item, text) =>
          box(item, box("data",
            beBytes(1L, 4) ++ beBytes(0L, 4) ++ // type 1 = UTF-8 text, locale
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        }.reduce(_ ++ _)
        box("udta", fullBox("meta", 0,
          fullBox("hdlr", 0, beBytes(0L, 4) ++
            "mdir".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
            beBytes(0L, 12) ++ Array(0.toByte)) ++
          box("ilst", items)))
      }
    val moov = box("moov", mvhd ++ traks.reduce(_ ++ _) ++ udta,
      largesize = largesizeMoov)
    val mdat = box("mdat", mdatBytes)
    ftyp ++ moov ++ mdat
  }

  private val identityMatrix: Array[Byte] =
    beBytes(0x00010000L, 4) ++ beBytes(0L, 4) ++ beBytes(0L, 4) ++
      beBytes(0L, 4) ++ beBytes(0x00010000L, 4) ++ beBytes(0L, 4) ++
      beBytes(0L, 4) ++ beBytes(0L, 4) ++ beBytes(0x40000000L, 4)
}
