package graft.operators

/** HEIF-family still-image metadata (HEIC/AVIF) on the ISO-BMFF box
  * walker — the fastest-growing crawl image class joins the provenance
  * catalog with NO sample decode: pixel dimensions come from the
  * `ispe` property (ISO/IEC 23008-12 §6.5.3), camera provenance from
  * the `Exif` metadata item (Annex A's ExifDataBlock, handed to
  * [[Exif.exifTags]] — one TIFF-IFD walker, three carriers), and the
  * item topology from `meta`'s `pitm`/`iinf`/`iprp`/`iloc` boxes,
  * all public spec. HEVC/AV1 sample decode is refused rather than
  * guessed (the [[Mpeg]] adjudication applied to the entropy-coder
  * class); the catalog value needs none of it.
  *
  * Box machinery is [[Mp4.Boxes]] — the same length-prefixed walk that
  * reads MP4 movies, so the two ISO-BMFF faces cannot drift.
  *
  * Reference scope note: the reference ETL (treynr/eggv, Dask/pandas
  * over genomics TSVs) has no media tier at all — this module is part
  * of the training-data-pipeline extension surface.
  *
  * Fail-loudly contract ([[Multimodal]] codec rule): truncated boxes,
  * a missing `meta`/`hdlr`/`pitm`/`iinf`/`iloc`, a non-`pict` handler,
  * an extent overrunning the payload, or an unsupported version field
  * throws `IllegalArgumentException` with the media id — metadata is
  * either exact or absent, never guessed. */
object Heif {

  /** The `ftyp` major brands this walker speaks: HEVC-coded HEIF
    * (`heic`/`heix`), the codec-agnostic structural brand (`mif1`),
    * and AV1-coded AVIF (`avif`). */
  val HeicBrands = Set("heic", "heix")
  val AvifBrands = Set("avif")
  val HeifBrands: Set[String] = HeicBrands ++ AvifBrands + "mif1"

  /** One `iinf` item: id, fourcc type (`hvc1`, `av01`, `Exif`, …). */
  final case class HeifItem(itemId: Long, itemType: String)

  /** Catalog metadata of one HEIF payload: brand, primary item and its
    * coded type, `ispe` pixel dimensions of the primary item, the item
    * inventory size, and the decoded EXIF fields (empty when the file
    * carries no Exif item — absence, not error). */
  final case class HeifInfo(
      majorBrand: String, primaryItemId: Long, primaryType: String,
      width: Int, height: Int, itemCount: Int,
      exif: Map[String, String])

  /** True when the payload leads with an `ftyp` whose major brand is
    * HEIF-family — the sniffing predicate ([[Sniff]] runs it before
    * the generic ftyp→MP4 rule). */
  def isHeif(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      new String(b, 4, 4, java.nio.charset.StandardCharsets.ISO_8859_1) == "ftyp" &&
      HeifBrands(new String(b, 8, 4, java.nio.charset.StandardCharsets.ISO_8859_1))

  /** Walk the `meta` box tree: exact still-image metadata. */
  def heifInfo(b: Array[Byte], mediaId: Long = -1L): HeifInfo = {
    val bx = new Mp4.Boxes(b, mediaId)
    import bx.{u16, u32, boxAt, version, children, child, childOpt, fourcc}

    require(b.length >= 12, s"media $mediaId: not a HEIF payload (too short)")
    val (firstType, ftypData, ftypEnd) = boxAt(0, b.length)
    require(firstType == "ftyp",
      s"media $mediaId: not a HEIF payload (first box '$firstType', not ftyp)")
    val majorBrand = fourcc(ftypData)
    require(HeifBrands(majorBrand),
      s"media $mediaId: ftyp brand '$majorBrand' is not HEIF-family")

    // locate the top-level meta FullBox
    var meta: Option[(Int, Int)] = None
    var p = ftypEnd
    while (p < b.length) {
      val (typ, dataAt, end) = boxAt(p, b.length)
      if (typ == "meta") {
        require(meta.isEmpty, s"media $mediaId: HEIF with two meta boxes")
        meta = Some((dataAt, end))
      }
      p = end
    }
    val (metaAt, metaEnd) = meta.getOrElse(throw new IllegalArgumentException(
      s"media $mediaId: HEIF without a meta box"))
    // meta is a FullBox: children start past the version/flags word
    val mk = children(metaAt + 4, metaEnd)

    val (hdlrAt, _) = child(mk, "hdlr", "meta")
    val handler = fourcc(hdlrAt + 8)
    require(handler == "pict",
      s"media $mediaId: HEIF meta handler '$handler', expected pict")

    val (pitmAt, _) = child(mk, "pitm", "meta")
    val primaryId: Long = version(pitmAt) match {
      case 0 => u16(pitmAt + 4).toLong
      case 1 => u32(pitmAt + 4)
      case v => throw new IllegalArgumentException(
        s"media $mediaId: pitm version $v")
    }

    // iinf → the item inventory (infe FullBoxes, versions 2/3)
    val (iinfAt, iinfEnd) = child(mk, "iinf", "meta")
    val iinfVer = version(iinfAt)
    val (entryCount, entriesAt) = iinfVer match {
      case 0 => (u16(iinfAt + 4).toLong, iinfAt + 6)
      case 1 => (u32(iinfAt + 4), iinfAt + 8)
      case v => throw new IllegalArgumentException(
        s"media $mediaId: iinf version $v")
    }
    val items = children(entriesAt, iinfEnd).filter(_._1 == "infe").map {
      case (_, eAt, _) =>
        version(eAt) match {
          case 2 => HeifItem(u16(eAt + 4).toLong, fourcc(eAt + 8))
          case 3 => HeifItem(u32(eAt + 4), fourcc(eAt + 10))
          case v => throw new IllegalArgumentException(
            s"media $mediaId: infe version $v (only 2/3 carry item types)")
        }
    }
    require(items.length == entryCount,
      s"media $mediaId: iinf declares $entryCount items, carries ${items.length}")
    val primaryType = items.find(_.itemId == primaryId).map(_.itemType)
      .getOrElse(throw new IllegalArgumentException(
        s"media $mediaId: primary item $primaryId missing from iinf"))

    // iprp: ipco's 1-indexed property boxes + ipma's associations
    val (iprpAt, iprpEnd) = child(mk, "iprp", "meta")
    val pk = children(iprpAt, iprpEnd)
    val (ipcoAt, ipcoEnd) = child(pk, "ipco", "iprp")
    val props = children(ipcoAt, ipcoEnd) // (type, dataAt, end), 1-indexed
    val (ipmaAt, ipmaEnd) = child(pk, "ipma", "iprp")
    val ipmaVer = version(ipmaAt)
    val ipmaFlags = (u32(ipmaAt) & 0xffffffL).toInt
    val assocCount = u32(ipmaAt + 4)
    var q = ipmaAt + 8
    var primaryProps = Vector.empty[Int]
    var e = 0L
    while (e < assocCount) {
      require(q < ipmaEnd, s"media $mediaId: ipma overruns at entry $e")
      val itemId: Long =
        if (ipmaVer < 1) { val v = u16(q).toLong; q += 2; v }
        else { val v = u32(q); q += 4; v }
      val n = b(q) & 0xff; q += 1
      val assoc = (0 until n).map { _ =>
        if ((ipmaFlags & 1) != 0) { val v = u16(q) & 0x7fff; q += 2; v }
        else { val v = b(q) & 0x7f; q += 1; v }
      }
      if (itemId == primaryId) primaryProps = assoc.toVector
      e += 1
    }
    val ispe = primaryProps.flatMap { idx =>
      require(idx >= 1 && idx <= props.length,
        s"media $mediaId: ipma property index $idx outside ipco (${props.length})")
      val (typ, dAt, _) = props(idx - 1)
      if (typ == "ispe") Some((u32(dAt + 4), u32(dAt + 8))) else None
    }.headOption.getOrElse(throw new IllegalArgumentException(
      s"media $mediaId: primary item $primaryId has no ispe property"))

    // iloc → per-item extents; versions 0/1/2, construction methods
    // 0 (absolute file offsets) and 1 (offsets into meta's idat)
    val (ilocAt, ilocEnd) = child(mk, "iloc", "meta")
    val ilocVer = version(ilocAt)
    require(ilocVer <= 2, s"media $mediaId: iloc version $ilocVer")
    val sizes = u16(ilocAt + 4)
    val offSize = (sizes >> 12) & 0xf
    val lenSize = (sizes >> 8) & 0xf
    val baseSize = (sizes >> 4) & 0xf
    val idxSize = if (ilocVer >= 1) sizes & 0xf else 0
    Seq(("offset", offSize), ("length", lenSize), ("base", baseSize),
      ("index", idxSize)).foreach { case (what, sz) =>
      require(sz == 0 || sz == 4 || sz == 8,
        s"media $mediaId: iloc $what size $sz (spec admits 0/4/8)")
    }
    def uN(at: Int, n: Int): Long = n match {
      case 0 => 0L
      case 4 => u32(at)
      case 8 => bx.u64(at)
    }
    val (itemCount, itemsAt) =
      if (ilocVer < 2) (u16(ilocAt + 6).toLong, ilocAt + 8)
      else (u32(ilocAt + 6), ilocAt + 10)
    // itemId → (constructionMethod, extents as (offset, length))
    val locs = Map.newBuilder[Long, (Int, Vector[(Long, Long)])]
    q = itemsAt
    e = 0L
    while (e < itemCount) {
      require(q < ilocEnd, s"media $mediaId: iloc overruns at item $e")
      val itemId: Long =
        if (ilocVer < 2) { val v = u16(q).toLong; q += 2; v }
        else { val v = u32(q); q += 4; v }
      val method =
        if (ilocVer >= 1) { val v = u16(q) & 0xf; q += 2; v } else 0
      require(method <= 1,
        s"media $mediaId: iloc construction method $method (item-offset " +
          "indirection is not carried by still images)")
      val dri = u16(q); q += 2
      require(dri == 0, s"media $mediaId: iloc item $itemId in external " +
        s"data reference $dri — this walker reads one payload")
      val base = uN(q, baseSize); q += baseSize
      val nExt = u16(q); q += 2
      val extents = (0 until nExt).map { _ =>
        if (idxSize > 0) q += idxSize // extent_index: unused by method 0/1
        val off = uN(q, offSize); q += offSize
        val len = uN(q, lenSize); q += lenSize
        (base + off, len)
      }.toVector
      locs += itemId -> ((method, extents))
      e += 1
    }
    val itemLocs = locs.result()

    // the optional Exif item, through the shared TIFF-IFD walker
    val idat = childOpt(mk, "idat")
    def itemBytes(id: Long): Array[Byte] = {
      val (method, extents) = itemLocs.getOrElse(id,
        throw new IllegalArgumentException(
          s"media $mediaId: item $id has no iloc entry"))
      val out = new java.io.ByteArrayOutputStream()
      extents.foreach { case (off, len) =>
        // u64 iloc fields are attacker-controlled: a wrapped Long sum
        // (base+off, at+len) could pass an additive bound and turn the
        // fail-loud contract into a raw IndexOutOfBounds — so bounds
        // are non-negativity plus SUBTRACTED comparisons, never sums
        require(off >= 0 && len >= 0,
          s"media $mediaId: item $id extent field wraps a 64-bit sum")
        val at = method match {
          case 0 => off
          case 1 =>
            val (iAt, iEnd) = idat.getOrElse(
              throw new IllegalArgumentException(
                s"media $mediaId: iloc method 1 without an idat box"))
            require(off <= (iEnd - iAt) - len,
              s"media $mediaId: item $id extent overruns idat")
            iAt + off
        }
        require(at >= 0 && len <= b.length - at,
          s"media $mediaId: item $id extent overruns the payload")
        out.write(b, at.toInt, len.toInt)
      }
      out.toByteArray
    }
    val exif = items.find(_.itemType == "Exif").map { it =>
      val block = itemBytes(it.itemId)
      require(block.length >= 4,
        s"media $mediaId: Exif item shorter than its offset field")
      // ExifDataBlock (ISO 23008-12 Annex A): u32 offset from the end
      // of the field to the TIFF header, then the payload (commonly a
      // leading "Exif\0\0" when the offset is 6)
      val tiffAt = 4 + (((block(0) & 0xffL) << 24) | ((block(1) & 0xffL) << 16) |
        ((block(2) & 0xffL) << 8) | (block(3) & 0xffL))
      require(tiffAt <= block.length - 8,
        s"media $mediaId: Exif item TIFF offset $tiffAt overruns")
      Exif.exifTags(java.util.Arrays.copyOfRange(
        block, tiffAt.toInt, block.length), mediaId)
    }.getOrElse(Map.empty[String, String])

    HeifInfo(majorBrand, primaryId, primaryType,
      ispe._1.toInt, ispe._2.toInt, items.length, exif)
  }

  // -- generator (staging/spec counterpart, the Mpeg.writeCbrStream rule) --

  /** Serialize a minimal VALID HEIF still image — the staging
    * counterpart of [[heifInfo]] for oracled metadata queries and
    * specs. The primary coded item is `hvc1` under HEIC brands and
    * `av01` under `avif`; `exifBlock` (a TIFF-structured EXIF payload,
    * e.g. [[Exif.writeExifBlock]]'s) rides as an `Exif` item whose
    * ExifDataBlock offset is 0 or, with `exifHeaderPrefix`, 6 behind a
    * real `Exif  ` prefix — both forms appear in crawls.
    * `useIdat` stores item data in `meta`'s `idat` via iloc
    * construction method 1 (offsets relative to idat, no patching);
    * otherwise items live in `mdat` under method 0's absolute offsets
    * (computed by a fixed-width two-pass build). `wideIpma` sets
    * ipma flags&1 (15-bit property indexes); `ilocVersion` picks
    * 0/1/2 (method 1 requires ≥1). */
  def writeHeif(majorBrand: String, width: Int, height: Int,
      coded: Array[Byte], exifBlock: Option[Array[Byte]] = None,
      exifHeaderPrefix: Boolean = false, useIdat: Boolean = false,
      wideIpma: Boolean = false, ilocVersion: Int = 0,
      infeVersion: Int = 2): Array[Byte] = {
    import Mp4.{box, fullBox, beBytes}
    require(HeifBrands(majorBrand), s"brand '$majorBrand'")
    require(!useIdat || ilocVersion >= 1, "iloc method 1 needs version >= 1")
    require(infeVersion == 2 || infeVersion == 3, s"infe version $infeVersion")
    val codedType = if (AvifBrands(majorBrand)) "av01" else "hvc1"
    val exifItem = exifBlock.map { tiff =>
      if (exifHeaderPrefix)
        beBytes(6L, 4) ++ "Exif  ".getBytes(
          java.nio.charset.StandardCharsets.ISO_8859_1) ++ tiff
      else beBytes(0L, 4) ++ tiff
    }

    val ftyp = box("ftyp",
      majorBrand.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        beBytes(0L, 4) ++
        (majorBrand + "mif1").getBytes(java.nio.charset.StandardCharsets.US_ASCII))

    def infe(id: Long, typ: String): Array[Byte] =
      if (infeVersion == 2)
        fullBox("infe", 2, beBytes(id, 2) ++ beBytes(0L, 2) ++
          typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
          Array(0.toByte))
      else
        fullBox("infe", 3, beBytes(id, 4) ++ beBytes(0L, 2) ++
          typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
          Array(0.toByte))

    // meta body as a function of the item offsets — every offset field
    // is fixed-width, so the layout (and thus every size) is identical
    // across the two passes and absolute offsets can be computed from
    // the first pass's lengths alone
    def metaBox(off1: Long, off2: Long): Array[Byte] = {
      val hdlr = fullBox("hdlr", 0, beBytes(0L, 4) ++
        "pict".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        beBytes(0L, 12) ++ Array(0.toByte))
      val pitm = fullBox("pitm", 0, beBytes(1L, 2))
      val infes = infe(1L, codedType) ++
        exifItem.map(_ => infe(2L, "Exif")).getOrElse(Array.empty[Byte])
      val iinf = fullBox("iinf", 0,
        beBytes(if (exifItem.isDefined) 2L else 1L, 2) ++ infes)
      val ispe = fullBox("ispe", 0,
        beBytes(width.toLong, 4) ++ beBytes(height.toLong, 4))
      val pixi = fullBox("pixi", 0,
        Array(3.toByte, 8.toByte, 8.toByte, 8.toByte))
      val ipco = box("ipco", ispe ++ pixi)
      val assoc =
        if (wideIpma) beBytes(0x8001L, 2) ++ beBytes(2L, 2) // essential ispe, pixi
        else Array((0x80 | 1).toByte, 2.toByte)
      val ipma = box("ipma",
        beBytes(0L, 3) ++ Array((if (wideIpma) 1 else 0).toByte) ++ // version 0, flags
          beBytes(1L, 4) ++ // entry_count
          beBytes(1L, 2) ++ // item_ID (the primary coded item)
          Array(2.toByte) ++ assoc) // association_count, then ispe+pixi
      val iprp = box("iprp", ipco ++ ipma)
      val method = if (useIdat) 1 else 0
      def ilocItem(id: Long, off: Long, len: Long): Array[Byte] =
        (if (ilocVersion < 2) beBytes(id, 2) else beBytes(id, 4)) ++
          (if (ilocVersion >= 1) beBytes(method.toLong, 2)
           else Array.empty[Byte]) ++
          beBytes(0L, 2) ++ // data_reference_index
          beBytes(1L, 2) ++ // extent_count
          beBytes(off, 4) ++ beBytes(len, 4)
      val nItems = if (exifItem.isDefined) 2L else 1L
      val iloc = fullBox("iloc", ilocVersion,
        beBytes(0x4400L, 2) ++ // offset_size 4, length_size 4, base 0, index 0
          (if (ilocVersion < 2) beBytes(nItems, 2) else beBytes(nItems, 4)) ++
          ilocItem(1L, off1, coded.length.toLong) ++
          exifItem.map(x => ilocItem(2L, off2, x.length.toLong))
            .getOrElse(Array.empty[Byte]))
      val idat =
        if (useIdat)
          box("idat", coded ++ exifItem.getOrElse(Array.empty[Byte]))
        else Array.empty[Byte]
      fullBox("meta", 0, hdlr ++ pitm ++ iinf ++ iprp ++ iloc ++ idat)
    }

    if (useIdat) {
      // method 1: offsets relative to idat payload — single pass
      ftyp ++ metaBox(0L, coded.length.toLong)
    } else {
      // method 0: absolute file offsets — two fixed-width passes
      val metaLen = metaBox(0L, 0L).length
      val dataStart = ftyp.length + metaLen + 8L // + mdat header
      ftyp ++ metaBox(dataStart, dataStart + coded.length) ++
        box("mdat", coded ++ exifItem.getOrElse(Array.empty[Byte]))
    }
  }
}
