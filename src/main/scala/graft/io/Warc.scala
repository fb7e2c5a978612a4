package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Full WARC reader — the BINARY-payload face of Common Crawl ingestion
  * (ISO 28500). [[Wet]] covers the text pipeline split-parallel;
  * `response` records in full `.warc` archives carry raw HTTP bodies —
  * images, audio, PDFs — that a text-mode scan would corrupt (the text
  * source DECODES bytes as UTF-8; any non-character byte is lossy). This
  * reader keeps every payload byte intact and bridges straight into the
  * multimodal tier: [[toMedia]] turns media-typed responses into
  * `Multimodal.Media` rows for the real codecs.
  *
  * Scale shape: one task per ARCHIVE FILE (`binaryFile` source +
  * per-file sequential Content-Length framing), parallelism across
  * segments — the honest contract for binary WARC, whose record framing
  * cannot be re-synchronized mid-split without risking a payload that
  * embeds the magic bytes (exactly the corruption [[Wet]]'s `framing_ok`
  * exists to flag; here framing is sequential, so it is exact, not
  * approximate). Common Crawl sizes segments ~1 GB for precisely this
  * per-file regime. Record-level gzip (`.warc.gz`, concatenated members
  * per spec) is decompressed in the same pass.
  *
  * Per-file memory is the decompressed archive (the `binaryFile`
  * source's own contract); size `spark.sql.files.maxPartitionBytes`-like
  * concerns accordingly — for bigger-than-memory archives, split them
  * upstream (Common Crawl already does).
  */
object Warc {

  /** One WARC record. `http_status`/`http_content_type` are parsed from
    * the embedded HTTP response head for `response` records (null
    * otherwise); `payload` is the HTTP BODY for responses, the raw
    * content block for every other type. `framing_ok` = the declared
    * Content-Length fit inside the file and the record terminator
    * followed — sequential framing, exact per record.
    *
    * Addressing (the CDX convention Common Crawl indexes use): for a
    * gzipped archive, `gz_offset` is the COMPRESSED byte offset of the
    * gzip member holding the record and `offset` the record's start
    * within that member's DECOMPRESSED bytes (0 in the Annex D
    * record-per-member layout — a range read + one member inflate is
    * the whole fetch); for a bare archive `gz_offset` is -1 and
    * `offset` is the plain file offset. Either pair re-addresses the
    * record without scanning ([[readWarcRecordsAt]]). */
  final case class WarcRecord(
      path: String, record_idx: Int, warc_type: String,
      target_uri: String, warc_date: String, content_length: Long,
      http_status: Integer, http_content_type: String,
      payload: Array[Byte], framing_ok: Boolean,
      payload_digest: String = null, http_location: String = null,
      record_id: String = null, concurrent_to: String = null,
      http_disposition: String = null, http_etag: String = null,
      http_last_modified: String = null, offset: Long = -1L,
      gz_offset: Long = -1L, seg_number: Integer = null,
      seg_origin_id: String = null, seg_total_length: java.lang.Long = null,
      http_cache_control: String = null, http_expires: String = null,
      http_date: String = null, truncated: String = null,
      http_retry_after: String = null)

  /** Read a WARC file / directory / glob (plain or record-gzipped
    * `.warc.gz`) as one row per record. */
  def readWarc(spark: SparkSession, path: String): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => parseWarcBytes(p, bytes) }
  }

  /** Streaming [[readWarc]]: new archive segments landing in `dir`
    * parse through the identical record walk — a continuous crawl's
    * output flows straight into the `toDocuments*` faces and the
    * incremental-dedup/curate sinks without a batch re-scan. One task
    * per NEW file per micro-batch (the file-source contract); same
    * framing semantics as batch. The binaryFile source's schema is
    * fixed, supplied explicitly (streaming file sources do not
    * infer). */
  def readWarcStream(spark: SparkSession, dir: String): Dataset[WarcRecord] = {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    spark.readStream.format("binaryFile").schema(schema).load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => parseWarcBytes(p, bytes) }
  }

  /** Offset-addressed record fetch — the payoff of the CDX selection
    * layer: given index rows `(filename, offset, gz_offset)` (what
    * [[Cdx.cdxFromWarc]] emits and [[Cdx.readCdxj]] parses back), read
    * ONLY the named records instead of scanning the archives. A
    * gz-addressed row seeks to its gzip member and inflates THAT member
    * (the Annex D record-per-member layout, [[writeWarcResponses]]
    * `gzipPerRecord` — true random access); a bare-archive row seeks to
    * the file offset directly. Parsing is the same
    * header-walk-and-Content-Length framing as the sequential reader,
    * read progressively from the stream — never the whole file.
    *
    * Scale shape: the SELECTION shuffles on filename (index-scale, not
    * corpus-scale), one task per addressed archive, fetches seek-sorted
    * within it. Cost is proportional to the records SELECTED — flat in
    * corpus size, which is the number that justifies building the
    * index at 100 TB. A row whose offsets don't address a record (a
    * stale index against a rewritten archive) degrades to its own
    * `framing_ok = false` row, never failing sibling fetches. */
  def readWarcRecordsAt(spark: SparkSession, selection: DataFrame): Dataset[WarcRecord] = {
    import spark.implicits._
    // the SESSION's Hadoop configuration rides to the fetch task (the
    // standard datasource pattern): a bare executor-side Configuration
    // would silently drop every spark.hadoop.* setting — object-store
    // credentials, filesystem impls, timeouts — exactly on the remote
    // stores the offset-addressed fetch exists for
    val hadoopConf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    selection
      .select(col("filename").cast("string"),
        coalesce(col("offset"), lit(0L)).cast("long"),
        coalesce(col("gz_offset"), lit(-1L)).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (file, rows) =>
        // forward seek order; duplicate index rows fetch once
        val wants = rows.map(r => (r._3, r._2)).toArray.distinct.sorted
        val p = new org.apache.hadoop.fs.Path(file)
        val fs = p.getFileSystem(hadoopConf.value.value)
        val in = fs.open(p)
        val recs =
          try wants.map { case (gz, off) =>
            try {
              if (gz >= 0) {
                in.seek(gz)
                val s = new java.util.zip.GZIPInputStream(
                  new java.io.BufferedInputStream(in, 64 * 1024), 64 * 1024)
                var toSkip = off
                while (toSkip > 0) {
                  val k = s.skip(toSkip)
                  require(k > 0, "warc fetch: member shorter than offset")
                  toSkip -= k
                }
                readRecordFrom(file, s, off, gz)
              } else {
                in.seek(off)
                readRecordFrom(file,
                  new java.io.BufferedInputStream(in, 64 * 1024), off, gz)
              }
            } catch {
              case _: Exception => WarcRecord(file, -1, null, null, null,
                -1L, null, null, Array.emptyByteArray, framing_ok = false,
                offset = off, gz_offset = gz)
            }
          } finally in.close()
        recs.iterator
      }
  }

  /** The TAGGED face of [[readWarcRecordsAt]]: rider columns travel
    * the pointer-scale selection shuffle and come back PAIRED with
    * their record's payload inside the fetch task — so a consumer
    * never pays the join-back that would shuffle the fetched BODIES a
    * second time (bodies move through ZERO exchanges: archive scan →
    * output). `selection` carries `(filename, offset, gz_offset,
    * tag)` with `tag` any struct; the output columns are the tag's
    * fields plus `payload` (binary, null when the fetch degrades) and
    * `framing_ok`. Several tags naming one record (duplicate index
    * rows, N 304s validating one capture) read the record ONCE and
    * emit one row per tag, in seek order. Same degrade contract as
    * the plain fetch: offsets that address nothing yield
    * `framing_ok = false` rows, never failing sibling fetches. One
    * record is in flight at a time — task memory is record-scale plus
    * the file's POINTER rows, never selection-payload-scale.
    *
    * `salt > 1` is the straggler defense for this shape: the group
    * key widens from the file to (file, hash(tag) % salt), so fetch
    * parallelism is files × salt instead of capping at the archive's
    * file count, and a HOT record — one capture that thousands of
    * tags name (a viral page's 304 validations all resolving to one
    * body) — spreads its tags across up to `salt` tasks instead of
    * serializing them in one. The cost is bounded read duplication:
    * a pointer is read once per bucket its tags occupy — exactly once
    * for the common single-tag pointer (its one tag hashes to one
    * bucket; no amplification anywhere on the cold path), at most
    * `salt` times for the hot ones, which is precisely where a
    * re-read per task is worth buying the parallelism. Forward seek
    * order holds within each bucket (the per-file sort is per-group). */
  def readWarcRecordsAtTagged(spark: SparkSession, selection: DataFrame,
      salt: Int = 1): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, BooleanType, StructType}
    import org.apache.spark.sql.Row
    val tagSchema = selection.schema("tag").dataType.asInstanceOf[StructType]
    val outSchema = StructType(tagSchema.fields)
      .add("payload", BinaryType, nullable = true)
      .add("framing_ok", BooleanType, nullable = false)
    val hadoopConf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    selection
      .select(
        col("filename").cast("string").as("filename"),
        coalesce(col("offset"), lit(0L)).cast("long").as("offset"),
        coalesce(col("gz_offset"), lit(-1L)).cast("long").as("gz_offset"),
        col("tag"),
        (if (salt > 1) pmod(hash(col("tag")), lit(salt)) else lit(0))
          .as("bucket"))
      .groupByKey((r: Row) => (r.getString(0), r.getInt(4)))(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.scalaInt))
      .flatMapGroups { (key: (String, Int), rows: Iterator[Row]) =>
        val file = key._1
        // forward seek order; equal pointers adjacent → fetched once
        val all = rows.toArray.sortBy(r => (r.getLong(2), r.getLong(1)))
        if (all.isEmpty) Iterator.empty
        else {
          val p = new org.apache.hadoop.fs.Path(file)
          val fs = p.getFileSystem(hadoopConf.value.value)
          val in = fs.open(p)
          def closeQuietly(): Unit =
            try in.close() catch { case _: Exception => () }
          // the stream outlives this call (lazy iterator): close on
          // task completion, and eagerly once the iterator drains
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => closeQuietly()))
          new Iterator[Row] {
            private var i = 0
            private var curGz = Long.MinValue
            private var curOff = Long.MinValue
            private var curPayload: Array[Byte] = null
            private var curOk = false
            def hasNext: Boolean =
              if (i < all.length) true else { closeQuietly(); false }
            def next(): Row = {
              val r = all(i); i += 1
              val gz = r.getLong(2); val off = r.getLong(1)
              if (gz != curGz || off != curOff) {
                curGz = gz; curOff = off
                val rec =
                  try {
                    if (gz >= 0) {
                      in.seek(gz)
                      val s = new java.util.zip.GZIPInputStream(
                        new java.io.BufferedInputStream(in, 64 * 1024),
                        64 * 1024)
                      var toSkip = off
                      while (toSkip > 0) {
                        val k = s.skip(toSkip)
                        require(k > 0, "warc fetch: member shorter than offset")
                        toSkip -= k
                      }
                      readRecordFrom(file, s, off, gz)
                    } else {
                      in.seek(off)
                      readRecordFrom(file,
                        new java.io.BufferedInputStream(in, 64 * 1024), off, gz)
                    }
                  } catch { case _: Exception => null }
                curOk = rec != null && rec.framing_ok
                curPayload = if (curOk) rec.payload else null
              }
              Row.fromSeq(r.getStruct(3).toSeq ++ Seq(curPayload, curOk))
            }
          }
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** One record read progressively from `in` (positioned at its first
    * byte): header bytes to the CRLFCRLF, then exactly Content-Length
    * block bytes, then the 4-byte terminator (absent at EOF — the
    * sequential walk's clean-end rule). Shares [[parseWarcBuffer]] so a
    * fetched record decodes (HTTP head, transfer/content codings)
    * byte-identically to a scanned one. */
  private def readRecordFrom(path: String, in: java.io.InputStream,
      off: Long, gz: Long): WarcRecord = {
    val head = new java.io.ByteArrayOutputStream(512)
    var tail = 0
    while (tail != 0x0d0a0d0a) {
      val b = in.read()
      require(b >= 0, "warc fetch: no header terminator before EOF")
      require(head.size < (1 << 20), "warc fetch: unterminated header")
      head.write(b)
      tail = (tail << 8) | b
    }
    val hdr = head.toByteArray
    val text = new String(hdr, java.nio.charset.StandardCharsets.UTF_8)
    require(text.startsWith("WARC/"), "warc fetch: offset is not a record start")
    val clen = "(?mi)^Content-Length: *([0-9]+)".r.findFirstMatchIn(text)
      .map(_.group(1).toLong).getOrElse(-1L)
    require(clen >= 0 && clen <= Int.MaxValue, "warc fetch: bad Content-Length")
    val block = in.readNBytes(clen.toInt)
    require(block.length == clen, "warc fetch: truncated record block")
    val term = in.readNBytes(4)
    val rec = parseWarcBuffer(path, hdr ++ block ++ term).next()
    rec.copy(offset = off, gz_offset = gz)
  }

  /** Media-typed `response` payloads as `Multimodal.Media` rows —
    * crawl archive → typed media features without leaving Spark:
    * `Multimodal.decodeFeatures(Warc.toMedia(Warc.readWarc(...)))`.
    * `media_id` is the 64-bit target-URI hash (same identity contract
    * as `Wet.toDocuments`); `kind` is the HTTP Content-Type with any
    * `; charset=` parameters stripped. Only framing-clean responses
    * with a parseable Content-Type AND a target URI pass (the URI is
    * the identity — an anonymous response has none to hash). */
  def toMedia(records: Dataset[WarcRecord]): Dataset[graft.operators.Multimodal.Media] = {
    import records.sparkSession.implicits._
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("http_content_type").isNotNull && col("target_uri").isNotNull)
      .select(
        xxhash64(col("target_uri")).as("media_id"),
        mimeOf(col("http_content_type")).as("kind"),
        col("payload").as("bytes"))
      .as[graft.operators.Multimodal.Media]
  }

  /** Media types that say nothing: sniffing fills these, never a
    * declared specific type. */
  private val GenericTypes = Set("application/octet-stream",
    "binary/octet-stream", "application/binary", "application/x-download",
    "application/unknown", "unknown/unknown", "")

  /** The crawl-reality shim: rewrite ONLY generic/absent Content-Type
    * headers with [[graft.operators.Sniff.sniffMime]]'s magic-byte
    * detection, so the MIME-dispatching faces ([[toDocuments]],
    * [[toMedia]]) see through `application/octet-stream` lies. A
    * declared specific type always wins; an unsniffable payload keeps
    * its header. One narrow pass — compose as
    * `toDocuments(sniffTypes(records))`. */
  def sniffTypes(records: Dataset[WarcRecord]): Dataset[WarcRecord] = {
    import records.sparkSession.implicits._
    records.map { r =>
      val declared = Option(r.http_content_type)
        .map(_.split(";")(0).trim.toLowerCase(java.util.Locale.ROOT))
        .getOrElse("")
      if (r.warc_type == "response" && r.framing_ok &&
          r.payload != null && GenericTypes.contains(declared)) {
        // magic/structural sniff first; when it returns nothing or
        // only the weak printable-majority text/plain, a
        // Content-Disposition FILENAME's more specific claim wins —
        // the csv/markdown/tex class has no magic for bytes to carry
        val sniffed = graft.operators.Sniff.sniffMime(r.payload)
        val resolved = sniffed match {
          case Some(m) if m != "text/plain" => sniffed
          case weak =>
            graft.operators.Sniff.filenameMime(r.http_disposition)
              .orElse(weak)
        }
        resolved.map(m => r.copy(http_content_type = m)).getOrElse(r)
      } else r
    }
  }

  /** HTTP media type, normalized: parameters stripped, trimmed,
    * lowercased — media types are case-insensitive per RFC 9110, and real
    * crawls carry `Text/HTML` and `text/html ; charset=...` variants. */
  private[io] def mimeOf(contentType: org.apache.spark.sql.Column) =
    lower(trim(substring_index(contentType, ";", 1)))

  /** Windows-1252 is ISO-8859-1 with the C1 control range 0x80–0x9F
    * remapped to printable characters (smart quotes, dashes, €, ™, …).
    * Decoding latin-1 then translating those 27 defined positions IS an
    * exact cp1252 decode — one codegen'd `translate`, no UDF and no
    * non-default JVM charset (Spark's `decode` allowlist stops at
    * ISO-8859-1). The 5 undefined cp1252 positions pass through. */
  private val c1Range: String =
    "\u0080\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089\u008a\u008b" +
      "\u008c\u008e\u0091\u0092\u0093\u0094\u0095\u0096\u0097\u0098\u0099" +
      "\u009a\u009b\u009c\u009e\u009f"
  private val cp1252Chars: String =
    "\u20ac\u201a\u0192\u201e\u2026\u2020\u2021\u02c6\u2030\u0160\u2039" +
      "\u0152\u017d\u2018\u2019\u201c\u201d\u2022\u2013\u2014\u02dc\u2122" +
      "\u0161\u203a\u0153\u017e\u0178"

  /** Decode an HTTP payload honoring the `charset=` parameter in the
    * parsed Content-Type — and, when the header names none, the
    * document's own `<meta charset=…>` / `http-equiv Content-Type`
    * declaration (sniffed from the first 1024 bytes latin-1-decoded,
    * the HTML5 prescan rule — header wins over meta per spec):
    * ISO-8859-1/latin1 and Windows-1252/cp1252 decode exactly; the
    * legacy CJK set (shift_jis, euc-jp, gbk, big5, euc-kr and their
    * WHATWG label aliases — still a real fraction of the crawlable
    * web) decodes through the native
    * [[graft.expressions.NativeCharset.decodeLegacy]] state machines;
    * everything else — including the no-declaration default — decodes
    * UTF-8, the documented LOUD fallback (a charset outside the claimed
    * set mis-decodes visibly to U+FFFD-bearing text that the
    * encoding-quality gates downstream count, never a silent drop).
    * All codegen'd column expressions, no UDF. */
  /** The testimony probe — ONE definition of how a record declares
    * its charset, shared by [[decodePayload]] (the decode routing),
    * [[charsetOf]] (the provenance label), and [[declarationSilent]]
    * (the detector gate), so the three can never disagree on what a
    * record claimed. Returns (cs, bom16, bom8): the lowercased
    * header-beats-meta charset label (empty = silence) and the two
    * BOM predicates. */
  private def testimony(payload: org.apache.spark.sql.Column,
      contentType: org.apache.spark.sql.Column) = {
    val csPat = "(?i)charset\\s*=\\s*[\"']?([A-Za-z0-9_\\-]+)"
    val headerCs = lower(regexp_extract(contentType, csPat, 1))
    // meta prescan: ASCII-compatible for every charset we distinguish
    val metaCs = lower(regexp_extract(
      substring(decode(payload, "ISO-8859-1"), 1, 1024),
      "(?i)<meta[^>]*" + csPat, 1))
    val cs = when(headerCs =!= "", headerCs).otherwise(metaCs)
    val bom16 =
      substring(payload, 1, 2) === lit(Array(0xFF.toByte, 0xFE.toByte)) ||
        substring(payload, 1, 2) === lit(Array(0xFE.toByte, 0xFF.toByte))
    val bom8 =
      substring(payload, 1, 3) ===
        lit(Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte))
    (cs, bom16, bom8)
  }

  private[io] def decodePayload(payload: org.apache.spark.sql.Column,
      contentType: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val (cs, bom16, bom8) = testimony(payload, contentType)
    val latin1 = decode(payload, "ISO-8859-1")
    // a BOM beats EVERY declaration (the WHATWG "BOM sniff" step —
    // the byte mark is the document's own first-hand testimony, and
    // real servers mislabel BOM'd payloads constantly). The JVM UTF-16
    // charset consumes the 16-bit marks itself; the UTF-8 mark decodes
    // to one U+FEFF dropped explicitly.
    when(bom8, substring(payload.cast("string"), 2, Int.MaxValue))
      .when(bom16, decode(payload, "UTF-16"))
      .when(cs.isin("iso-8859-1", "latin1", "iso8859-1"), latin1)
      .when(cs.isin("windows-1252", "cp1252"),
        translate(latin1, c1Range, cp1252Chars))
      .when(cs.isin(graft.operators.LegacyCharset.labels: _*),
        graft.expressions.NativeCharset.decodeLegacy(payload, cs))
      .otherwise(payload.cast("string"))
  }

  /** The charset label [[decodePayload]] actually ROUTES on, as a
    * column — the provenance face of the decode (BOM > header > meta >
    * default, mirroring the routing order exactly): the curation layer
    * keys encoding-quality gates and recode audits on it. An unclaimed
    * declared label reports "utf-8" (the loud fallback that decode
    * takes), never the unhonored claim; the DETECTED faces override
    * the silent lane with the detector's verdict themselves. */
  private[io] def charsetOf(payload: org.apache.spark.sql.Column,
      contentType: org.apache.spark.sql.Column) = {
    val (cs, bom16, bom8) = testimony(payload, contentType)
    val claimed = Seq("iso-8859-1", "latin1", "iso8859-1",
      "windows-1252", "cp1252") ++ graft.operators.LegacyCharset.labels
    when(bom8, lit("utf-8"))
      .when(bom16, lit("utf-16"))
      .when(cs.isin(claimed: _*), cs)
      .otherwise(lit("utf-8"))
  }

  /** True when the payload carries NO charset testimony at all — no
    * BOM, no header `charset=`, no meta-prescan hit: the routing
    * predicate of the detected faces (detection fills exactly this
    * silence, never overriding a declaration). */
  private[io] def declarationSilent(payload: org.apache.spark.sql.Column,
      contentType: org.apache.spark.sql.Column) = {
    val (cs, bom16, bom8) = testimony(payload, contentType)
    cs === "" && !bom16 && !bom8
  }

  /** [[toDocumentsText]] with the statistical charset detector on the
    * NO-declaration path and the routed label carried as a `charset`
    * column — the reader for pre-standards captures where servers sent
    * bare `text/plain` and pages carried no meta (detection fills the
    * silence; declarations still win). Same narrow zero-shuffle
    * projection; the detector is one codegen'd kernel call per
    * record over a capped 8 KiB sample. */
  def toDocumentsTextDetected(records: Dataset[WarcRecord]): DataFrame = {
    import graft.functions.TextFunctions
    // the detect-and-decode struct is computed in its OWN projection:
    // one 16-candidate cascade per silent record serves both the
    // charset and text columns (CollapseProject keeps a non-cheap
    // multi-referenced alias in place, so the call is not duplicated)
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type")) === "text/plain")
      .select(
        xxhash64(col("target_uri")).as("doc_id"),
        col("target_uri").as("url"),
        col("payload"), col("http_content_type"),
        when(declarationSilent(col("payload"), col("http_content_type")),
          graft.expressions.NativeCharset.detectAndDecode(col("payload")))
          .as("dd"))
      .select(col("doc_id"), col("url"),
        when(col("dd").isNotNull, col("dd.charset"))
          .otherwise(charsetOf(col("payload"), col("http_content_type")))
          .as("charset"),
        // detection confidence (null where a DECLARATION routed the
        // decode — testimony is not a guess and carries no margin):
        // +∞ structural, winner-minus-runner-up scored, 0 fallback —
        // the column encoding_quality gates threshold
        when(col("dd").isNotNull, col("dd.margin")).as("charset_margin"),
        when(col("dd").isNotNull, col("dd.text"))
          .otherwise(decodePayload(col("payload"), col("http_content_type")))
          .as("text"))
      .select(col("doc_id"), col("url"), col("charset"),
        col("charset_margin"),
        TextFunctions.langId(col("text")).as("lang"), col("text"))
  }

  /** Curate-ready documents from `text/html` responses: payload decoded
    * honoring the Content-Type `charset=` parameter ([[decodePayload]] —
    * latin-1/cp1252 exact, UTF-8 default), stripped through
    * `TextFunctions.htmlToText`, identity/lang-ID exactly as
    * `Wet.toDocuments` — so a FULL archive feeds `CorpusPipeline.curate`
    * without a WET conversion step. The media-type match is normalized
    * (case-insensitive, parameter- and whitespace-tolerant). */
  def toDocumentsHtml(records: Dataset[WarcRecord]): DataFrame = {
    import graft.functions.TextFunctions
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type")) === "text/html")
      .select(
        xxhash64(col("target_uri")).as("doc_id"),
        col("target_uri").as("url"),
        TextFunctions.htmlToText(
          decodePayload(col("payload"), col("http_content_type"))).as("html_text"))
      .select(col("doc_id"), col("url"),
        TextFunctions.langId(col("html_text")).as("lang"),
        col("html_text").as("text"))
  }

  /** [[toDocumentsHtml]] with the statistical charset detector on the
    * NO-declaration path and the routed label as a `charset` column —
    * same contract as [[toDocumentsTextDetected]]: a BOM, a header
    * charset, or a meta prescan hit still wins (detection never
    * overrides testimony); only the silent remainder — real in
    * pre-standards HTML, where pages declared nothing and servers sent
    * bare `text/html` — routes through the detector instead of the
    * blind UTF-8 default. */
  def toDocumentsHtmlDetected(records: Dataset[WarcRecord]): DataFrame = {
    import graft.functions.TextFunctions
    // same one-cascade-per-record shape as [[toDocumentsTextDetected]]
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type")) === "text/html")
      .select(
        xxhash64(col("target_uri")).as("doc_id"),
        col("target_uri").as("url"),
        col("payload"), col("http_content_type"),
        when(declarationSilent(col("payload"), col("http_content_type")),
          graft.expressions.NativeCharset.detectAndDecode(col("payload")))
          .as("dd"))
      .select(col("doc_id"), col("url"),
        when(col("dd").isNotNull, col("dd.charset"))
          .otherwise(charsetOf(col("payload"), col("http_content_type")))
          .as("charset"),
        // same confidence contract as [[toDocumentsTextDetected]]
        when(col("dd").isNotNull, col("dd.margin")).as("charset_margin"),
        TextFunctions.htmlToText(
          when(col("dd").isNotNull, col("dd.text"))
            .otherwise(decodePayload(col("payload"),
              col("http_content_type")))).as("html_text"))
      .select(col("doc_id"), col("url"), col("charset"),
        col("charset_margin"),
        TextFunctions.langId(col("html_text")).as("lang"),
        col("html_text").as("text"))
  }

  /** The two TEXT faces ([[toDocumentsTextDetected]] +
    * [[toDocumentsHtmlDetected]]) in ONE pass over the record scan —
    * what an end-to-end curate flow reads, where two separate faces
    * would walk the archive twice (the double-scan seam an e2e
    * pipeline cannot afford at 100 TB). Same detection contract:
    * declarations win, the silent remainder routes through ONE
    * codegen'd detect-and-decode cascade per record, the label and its
    * confidence ride as `charset` / `charset_margin`; html strips
    * through the codegen kernel, text/plain passes decoded. Narrow,
    * zero shuffle, parallelism follows the archive files. */
  def toDocumentsDetected(records: Dataset[WarcRecord]): DataFrame = {
    import graft.functions.TextFunctions
    val mime = mimeOf(col("http_content_type"))
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mime.isin("text/plain", "text/html"))
      .select(
        xxhash64(col("target_uri")).as("doc_id"),
        col("target_uri").as("url"),
        (mime === "text/html").as("is_html"),
        col("payload"), col("http_content_type"),
        when(declarationSilent(col("payload"), col("http_content_type")),
          graft.expressions.NativeCharset.detectAndDecode(col("payload")))
          .as("dd"))
      .select(col("doc_id"), col("url"),
        when(col("dd").isNotNull, col("dd.charset"))
          .otherwise(charsetOf(col("payload"), col("http_content_type")))
          .as("charset"),
        when(col("dd").isNotNull, col("dd.margin")).as("charset_margin"),
        col("is_html"),
        when(col("dd").isNotNull, col("dd.text"))
          .otherwise(decodePayload(col("payload"), col("http_content_type")))
          .as("decoded"))
      .select(col("doc_id"), col("url"), col("charset"),
        col("charset_margin"),
        when(col("is_html"), TextFunctions.htmlToText(col("decoded")))
          .otherwise(col("decoded")).as("text"))
      .select(col("doc_id"), col("url"), col("charset"),
        col("charset_margin"),
        TextFunctions.langId(col("text")).as("lang"), col("text"))
  }

  /** Serialize `(target_uri, content_type, payload)` rows as WARC
    * `response` archives — one `segN.warc` per partition, each record a
    * framed HTTP response with the payload bytes intact (binary-safe).
    * The write counterpart of [[readWarc]]: a curated subset re-shared
    * as WARC, or test/bench staging. Hadoop-FS streams, any scheme;
    * parallelism = input partitions, zero shuffle. Round-trips through
    * [[parseWarcBytes]] byte-exactly (WarcSpec).
    *
    * `gzipPerRecord = true` writes the Common Crawl interchange layout
    * instead: `segN.warc.gz` with EVERY record its own concatenated
    * gzip member (the WARC 1.1 Annex D convention that lets indexers
    * seek to a record and inflate it alone); [[readWarc]]'s
    * multi-member gunzip reads both layouts identically. */
  def writeWarcResponses(df: DataFrame, dir: String,
      gzipPerRecord: Boolean = false): Unit = {
    // rows may carry an optional `warc_date` column (ISO-8601) stamped
    // as each record's WARC-Date — the capture-time axis a CDX index
    // slices on; absent, no date header is written (a staging archive)
    val hasDate = df.columns.contains("warc_date")
    val base = Seq(col("target_uri"), col("content_type"), col("payload"))
    val cols = df.select(
      (if (hasDate) base :+ col("warc_date") else base): _*)
    cols.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val ext = if (gzipPerRecord) "warc.gz" else "warc"
        val path = new org.apache.hadoop.fs.Path(s"$dir/seg$pid.$ext")
        val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = new java.io.BufferedOutputStream(fs.create(path, true))
        val ascii = java.nio.charset.StandardCharsets.US_ASCII
        try it.foreach { r =>
          val body = r.getAs[Array[Byte]](2)
          val date =
            if (hasDate && !r.isNullAt(3)) s"WARC-Date: ${r.getString(3)}\r\n"
            else ""
          val http = (s"HTTP/1.1 200 OK\r\nContent-Type: ${r.getString(1)}\r\n" +
            s"Content-Length: ${body.length}\r\n\r\n").getBytes(ascii)
          val rec = new java.io.ByteArrayOutputStream()
          rec.write((s"WARC/1.0\r\nWARC-Type: response\r\n" +
            s"WARC-Target-URI: ${r.getString(0)}\r\n" + date +
            s"Content-Length: ${http.length + body.length}\r\n\r\n").getBytes(ascii))
          rec.write(http); rec.write(body)
          rec.write("\r\n\r\n".getBytes(ascii))
          if (gzipPerRecord) {
            val gz = new java.util.zip.GZIPOutputStream(out) {
              // finish() (not close) keeps `out` open for the next
              // member; end() releases the native zlib state a bare
              // finish() leaks until GC — one live Deflater per record
              // in flight, not per record written
              def finishAndEnd(): Unit = { finish(); `def`.end() }
            }
            gz.write(rec.toByteArray); gz.finishAndEnd()
          } else out.write(rec.toByteArray)
        } finally out.close()
      }
    }
  }

  /** The extra-headers counterpart of [[writeWarcResponses]]: rows are
    * `(target_uri, content_type, extra_headers, payload)` with
    * `extra_headers` spliced verbatim into the HTTP head (one or more
    * CRLF-joined header lines, no trailing CRLF) — the staging twin
    * for Content-Disposition / ETag / Last-Modified / Cache-Control
    * batteries. Lines whose name starts `WARC-` go into the WARC
    * header block instead (the `WARC-Truncated` staging lane). An
    * optional `status` column stamps the response status line (absent:
    * 200) — the 429/503 Retry-After staging lane. */
  def writeWarcResponsesWithHeaders(df: DataFrame, dir: String): Unit = {
    val hasStatus = df.columns.contains("status")
    val base = Seq(col("target_uri"), col("content_type"),
      col("extra_headers"), col("payload"))
    // cast in the projection so any integral status column works — a
    // LongType status (the natural type of Scala integer literals
    // through some DF constructions) must not ClassCastException at
    // the row accessor
    val cols = df.select(
      (if (hasStatus) base :+ col("status").cast("int") else base): _*)
    cols.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = new org.apache.hadoop.fs.Path(s"$dir/seg$pid.warc")
        val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = new java.io.BufferedOutputStream(fs.create(path, true))
        val ascii = java.nio.charset.StandardCharsets.US_ASCII
        try it.foreach { r =>
          val body = r.getAs[Array[Byte]](3)
          val lines = Option(r.getString(2)).filter(_.nonEmpty)
            .map(_.split("\r\n").toSeq).getOrElse(Nil)
          val (warcLines, httpLines) = lines.partition(
            _.regionMatches(true, 0, "WARC-", 0, 5))
          def block(ls: Seq[String]): String =
            ls.map(_ + "\r\n").mkString
          val st = if (hasStatus) r.getInt(4) else 200
          val reason = st match {
            case 200 => "OK"
            case 429 => "Too Many Requests"
            case 503 => "Service Unavailable"
            case _ => "Status"
          }
          val http = (s"HTTP/1.1 $st $reason\r\nContent-Type: ${r.getString(1)}\r\n" +
            block(httpLines) +
            s"Content-Length: ${body.length}\r\n\r\n").getBytes(ascii)
          out.write((s"WARC/1.0\r\nWARC-Type: response\r\n" +
            s"WARC-Target-URI: ${r.getString(0)}\r\n" +
            "WARC-Date: 2026-03-01T00:00:00Z\r\n" + // the staged fetch time
            block(warcLines) +
            s"Content-Length: ${http.length + body.length}\r\n\r\n").getBytes(ascii))
          out.write(http); out.write(body)
          out.write("\r\n\r\n".getBytes(ascii))
        } finally out.close()
      }
    }
  }

  /** The Content-Encoding counterpart of [[writeWarcResponses]]: rows
    * are `(target_uri, content_type, content_encoding, payload)` with
    * the payload ALREADY encoded under that coding (the staging side
    * encodes; this writer only frames and declares) — how real crawls
    * archive `gzip`/`br` entity bodies: wire bytes plus the header. */
  def writeWarcResponsesEncoded(df: DataFrame, dir: String): Unit = {
    val cols = df.select(col("target_uri"), col("content_type"),
      col("content_encoding"), col("payload"))
    cols.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = new org.apache.hadoop.fs.Path(s"$dir/seg$pid.warc")
        val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = new java.io.BufferedOutputStream(fs.create(path, true))
        val ascii = java.nio.charset.StandardCharsets.US_ASCII
        try it.foreach { r =>
          val body = r.getAs[Array[Byte]](3)
          val http = (s"HTTP/1.1 200 OK\r\nContent-Type: ${r.getString(1)}\r\n" +
            s"Content-Encoding: ${r.getString(2)}\r\n" +
            s"Content-Length: ${body.length}\r\n\r\n").getBytes(ascii)
          out.write((s"WARC/1.0\r\nWARC-Type: response\r\n" +
            s"WARC-Target-URI: ${r.getString(0)}\r\n" +
            s"Content-Length: ${http.length + body.length}\r\n\r\n").getBytes(ascii))
          out.write(http); out.write(body)
          out.write("\r\n\r\n".getBytes(ascii))
        } finally out.close()
      }
    }
  }

  /** The chunked-framing counterpart of [[writeWarcResponses]]: every
    * response body travels `Transfer-Encoding: chunked` (RFC 9112 §7.1)
    * — the 4th column `chunk_bytes` sets the data-chunk size, the first
    * chunk carries a planted chunk extension and the terminator a
    * trailer section, so the reader's size-line parse, extension drop,
    * and trailer skip are all exercised by staged archives. No
    * Content-Length header (a chunked message must not carry one). */
  def writeWarcResponsesChunked(df: DataFrame, dir: String): Unit = {
    val cols = df.select(col("target_uri"), col("content_type"),
      col("payload"), col("chunk_bytes"))
    cols.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = new org.apache.hadoop.fs.Path(s"$dir/seg$pid.warc")
        val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = new java.io.BufferedOutputStream(fs.create(path, true))
        val ascii = java.nio.charset.StandardCharsets.US_ASCII
        try it.foreach { r =>
          val body = r.getAs[Array[Byte]](2)
          val n = math.max(1, r.getInt(3))
          val framed = new java.io.ByteArrayOutputStream(body.length + 64)
          var off = 0
          var first = true
          while (off < body.length) {
            val take = math.min(n, body.length - off)
            val ext = if (first) ";planted=ext" else ""
            framed.write((java.lang.Long.toHexString(take.toLong) + ext +
              "\r\n").getBytes(ascii))
            framed.write(body, off, take)
            framed.write("\r\n".getBytes(ascii))
            off += take
            first = false
          }
          framed.write("0\r\nX-Planted-Trailer: t\r\n\r\n".getBytes(ascii))
          val fb = framed.toByteArray
          val http = (s"HTTP/1.1 200 OK\r\nContent-Type: ${r.getString(1)}\r\n" +
            "Transfer-Encoding: chunked\r\n\r\n").getBytes(ascii)
          out.write((s"WARC/1.0\r\nWARC-Type: response\r\n" +
            s"WARC-Target-URI: ${r.getString(0)}\r\n" +
            s"Content-Length: ${http.length + fb.length}\r\n\r\n").getBytes(ascii))
          out.write(http); out.write(fb)
          out.write("\r\n\r\n".getBytes(ascii))
        } finally out.close()
      }
    }
  }

  /** The revisit-bearing counterpart of [[writeWarcResponses]]: every
    * response record carries its `WARC-Payload-Digest` (sha1, base32 —
    * the WARC 1.1 §5.9 convention real crawlers write), and a row with
    * a non-null 4th column `revisit_uri` is followed by a `revisit`
    * record at that URI — identical-payload-digest profile, HTTP
    * head-only block, no body (the crawl-time dedup shape: the crawler
    * saw the same payload at another URL and stored only the pointer). */
  def writeWarcResponsesWithRevisits(df: DataFrame, dir: String): Unit = {
    val cols = df.select(col("target_uri"), col("content_type"),
      col("payload"), col("revisit_uri"))
    cols.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = new org.apache.hadoop.fs.Path(s"$dir/seg$pid.warc")
        val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = new java.io.BufferedOutputStream(fs.create(path, true))
        val ascii = java.nio.charset.StandardCharsets.US_ASCII
        try it.foreach { r =>
          val body = r.getAs[Array[Byte]](2)
          val digest = warcSha1Digest(body)
          val http = (s"HTTP/1.1 200 OK\r\nContent-Type: ${r.getString(1)}\r\n" +
            s"Content-Length: ${body.length}\r\n\r\n").getBytes(ascii)
          out.write((s"WARC/1.0\r\nWARC-Type: response\r\n" +
            s"WARC-Target-URI: ${r.getString(0)}\r\n" +
            s"WARC-Payload-Digest: $digest\r\n" +
            s"Content-Length: ${http.length + body.length}\r\n\r\n").getBytes(ascii))
          out.write(http); out.write(body)
          out.write("\r\n\r\n".getBytes(ascii))
          if (!r.isNullAt(3)) {
            val head = ("HTTP/1.1 200 OK\r\n" +
              s"Content-Type: ${r.getString(1)}\r\n\r\n").getBytes(ascii)
            out.write((s"WARC/1.0\r\nWARC-Type: revisit\r\n" +
              s"WARC-Target-URI: ${r.getString(3)}\r\n" +
              "WARC-Profile: http://netpreserve.org/warc/1.1/revisit/identical-payload-digest\r\n" +
              s"WARC-Payload-Digest: $digest\r\n" +
              s"Content-Length: ${head.length}\r\n\r\n").getBytes(ascii))
            out.write(head)
            out.write("\r\n\r\n".getBytes(ascii))
          }
        } finally out.close()
      }
    }
  }

  /** The conditional-refetch staging writer — what a crawler's SECOND
    * pass over known URLs produces. Rows are `(target_uri,
    * content_type, payload, status, revisit_digest, warc_date)`:
    * a non-null `revisit_digest` writes a body-less `revisit` record
    * (identical-payload-digest profile) pointing at a PRIOR crawl's
    * payload; `status = 304` writes a head-only `304 Not Modified`
    * response (the raw conditional-GET outcome, no Content-Type — the
    * server sent none); anything else a full 200 response with its
    * payload and the §5.9 sha1 digest stamped. All three refetch
    * outcomes [[graft.operators.Recrawl.mergeRefetch]] consumes. */
  def writeWarcConditional(df: DataFrame, dir: String): Unit = {
    val cols = df.select(col("target_uri"), col("content_type"),
      col("payload"), col("status"), col("revisit_digest"), col("warc_date"))
    cols.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = new org.apache.hadoop.fs.Path(s"$dir/seg$pid.warc")
        val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = new java.io.BufferedOutputStream(fs.create(path, true))
        val ascii = java.nio.charset.StandardCharsets.US_ASCII
        try it.foreach { r =>
          val uri = r.getString(0)
          val date = s"WARC-Date: ${r.getString(5)}\r\n"
          if (!r.isNullAt(4)) {
            val head = "HTTP/1.1 304 Not Modified\r\n\r\n".getBytes(ascii)
            out.write((s"WARC/1.0\r\nWARC-Type: revisit\r\n" +
              s"WARC-Target-URI: $uri\r\n" + date +
              "WARC-Profile: http://netpreserve.org/warc/1.1/revisit/identical-payload-digest\r\n" +
              s"WARC-Payload-Digest: ${r.getString(4)}\r\n" +
              s"Content-Length: ${head.length}\r\n\r\n").getBytes(ascii))
            out.write(head)
            out.write("\r\n\r\n".getBytes(ascii))
          } else if (r.getInt(3) == 304) {
            val head = "HTTP/1.1 304 Not Modified\r\n\r\n".getBytes(ascii)
            out.write((s"WARC/1.0\r\nWARC-Type: response\r\n" +
              s"WARC-Target-URI: $uri\r\n" + date +
              s"Content-Length: ${head.length}\r\n\r\n").getBytes(ascii))
            out.write(head)
            out.write("\r\n\r\n".getBytes(ascii))
          } else {
            val body = r.getAs[Array[Byte]](2)
            val http = (s"HTTP/1.1 200 OK\r\nContent-Type: ${r.getString(1)}\r\n" +
              s"Content-Length: ${body.length}\r\n\r\n").getBytes(ascii)
            out.write((s"WARC/1.0\r\nWARC-Type: response\r\n" +
              s"WARC-Target-URI: $uri\r\n" + date +
              s"WARC-Payload-Digest: ${warcSha1Digest(body)}\r\n" +
              s"Content-Length: ${http.length + body.length}\r\n\r\n").getBytes(ascii))
            out.write(http); out.write(body)
            out.write("\r\n\r\n".getBytes(ascii))
          }
        } finally out.close()
      }
    }
  }

  /** `sha1:<base32>` of the payload bytes — the WARC 1.1 §5.9 digest
    * notation (RFC 4648 base32; 160 bits is exactly 32 characters, no
    * padding). */
  private[graft] def warcSha1Digest(b: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(b)
    val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new StringBuilder(32)
    var buf = 0L
    var bits = 0
    for (x <- d) {
      buf = (buf << 8) | (x & 0xffL); bits += 8
      while (bits >= 5) {
        bits -= 5; sb.append(alphabet(((buf >> bits) & 31).toInt))
      }
    }
    "sha1:" + sb.result()
  }

  /** Resolve `revisit` records against the archive's `response`
    * records by payload digest — the crawl-time dedup join: a crawler
    * that saw an identical payload at another URL stored only a
    * digest pointer, and this recovers the entity for the revisit URI
    * without a refetch. One original per digest (deterministic
    * min-URI pick when several responses share a payload); output one
    * row per resolved revisit: `(payload_digest, url, warc_date,
    * orig_uri, http_content_type, payload)`.
    *
    * Scale shape: an inner equi-join keyed on the sha1 digest — a
    * high-cardinality, uniformly distributed key (identical payloads
    * collapse in the one-original aggregate first, so no key carries
    * more than the distinct-revisit fan-in of one payload). Both sides
    * are corpus-scale: a plain shuffled hash join, no broadcast, no
    * skew term. */
  def resolveRevisits(records: Dataset[WarcRecord]): DataFrame = {
    val resp = records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("payload_digest").isNotNull && col("target_uri").isNotNull)
      .groupBy(col("payload_digest"))
      .agg(min(struct(col("target_uri").as("orig_uri"),
        col("http_content_type"), col("payload"))).as("o"))
      .select(col("payload_digest"), col("o.orig_uri").as("orig_uri"),
        col("o.http_content_type").as("http_content_type"),
        col("o.payload").as("payload"))
    records.toDF()
      .filter(col("warc_type") === "revisit" && col("framing_ok") &&
        col("payload_digest").isNotNull && col("target_uri").isNotNull)
      .select(col("payload_digest"), col("target_uri").as("url"),
        col("warc_date"))
      .join(resp, Seq("payload_digest"), "inner")
  }

  /** Reassemble segmented records (WARC 1.1 §5.18) — how archives
    * carry a logical record too large for one file: the FIRST segment
    * keeps the original record type with `WARC-Segment-Number: 1` and
    * its `WARC-Record-ID`; later segments are `continuation` records
    * whose `WARC-Segment-Origin-ID` names it, the last also declaring
    * `WARC-Segment-Total-Length`. This operator concatenates each
    * chain's blocks in segment order and re-parses the LOGICAL record
    * through the same machinery as an unsegmented one (HTTP head,
    * transfer/content codings — all deferred while segments were
    * opaque), passing every unsegmented record through untouched.
    *
    * Failure isolation: a chain with a gap in its segment numbers, a
    * total-length mismatch, or a framing-broken member degrades to the
    * head record flagged `framing_ok = false`; an orphan continuation
    * (no head in the scan) flags itself. Scale shape: one equi-keyed
    * group per chain on the head's record-ID UUID — uniform keys, a
    * records-scale shuffle of segment payloads; unsegmented records
    * (the overwhelming majority of any real crawl) never shuffle. */
  def reassembleSegments(records: Dataset[WarcRecord]): Dataset[WarcRecord] = {
    import records.sparkSession.implicits._
    val plain = records.filter(r =>
      r.seg_number == null && r.warc_type != "continuation")
    val heads = records
      .filter(r => r.seg_number != null && r.seg_number.intValue == 1 &&
        r.record_id != null)
      .groupByKey(_.record_id)
    val conts = records
      .filter(r => r.warc_type == "continuation" && r.seg_origin_id != null)
      .groupByKey(_.seg_origin_id)
    val chains = heads.cogroup(conts) { (_, hs, cs) =>
      val head = if (hs.hasNext) hs.next() else null
      val parts = cs.toArray.sortBy(r =>
        Option(r.seg_number).map(_.intValue).getOrElse(Int.MaxValue))
      if (head == null)
        // orphan continuations: unusable without their head — flagged
        parts.iterator.map(_.copy(framing_ok = false))
      else {
        val contiguous = parts.iterator.zipWithIndex.forall {
          case (p, i) => p.seg_number != null && p.seg_number.intValue == i + 2
        }
        val total = head.payload.length.toLong +
          parts.iterator.map(_.payload.length.toLong).sum
        val declared = parts.lastOption.flatMap(p => Option(p.seg_total_length))
        val ok = contiguous && head.framing_ok && parts.forall(_.framing_ok) &&
          declared.forall(_.longValue == total) && total <= Int.MaxValue
        if (!ok) Iterator.single(head.copy(framing_ok = false))
        else {
          val block = new java.io.ByteArrayOutputStream(total.toInt)
          block.write(head.payload)
          parts.foreach(p => block.write(p.payload))
          val ascii = java.nio.charset.StandardCharsets.US_ASCII
          def hl(k: String, v: String): String =
            if (v == null) "" else s"$k: $v\r\n"
          val hdr = (s"WARC/1.0\r\nWARC-Type: ${head.warc_type}\r\n" +
            hl("WARC-Target-URI", head.target_uri) +
            hl("WARC-Date", head.warc_date) +
            hl("WARC-Record-ID", head.record_id) +
            hl("WARC-Payload-Digest", head.payload_digest) +
            s"Content-Length: ${block.size}\r\n\r\n").getBytes(ascii)
          val rec = parseWarcBuffer(head.path,
            hdr ++ block.toByteArray ++ "\r\n\r\n".getBytes(ascii)).next()
          Iterator.single(rec.copy(record_idx = head.record_idx,
            offset = head.offset, gz_offset = head.gz_offset))
        }
      }
    }
    plain.union(chains)
  }

  /** Staging writer for segmented archives: each `(target_uri,
    * content_type, payload)` row's framed HTTP response splits into
    * `segmentBytes`-sized WARC segments per §5.18 (a row whose record
    * fits in one segment writes a plain response — the pass-through
    * lane on the same oracle). */
  def writeWarcSegmented(df: DataFrame, dir: String, segmentBytes: Int): Unit = {
    val cols = df.select(col("target_uri"), col("content_type"), col("payload"))
    cols.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = new org.apache.hadoop.fs.Path(s"$dir/seg$pid.warc")
        val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = new java.io.BufferedOutputStream(fs.create(path, true))
        val ascii = java.nio.charset.StandardCharsets.US_ASCII
        def rec(headers: String, body: Array[Byte], off: Int, len: Int): Unit = {
          out.write((s"WARC/1.0\r\n$headers" +
            s"Content-Length: $len\r\n\r\n").getBytes(ascii))
          out.write(body, off, len)
          out.write("\r\n\r\n".getBytes(ascii))
        }
        try it.foreach { r =>
          val uri = r.getString(0)
          val body = r.getAs[Array[Byte]](2)
          val full = (s"HTTP/1.1 200 OK\r\nContent-Type: ${r.getString(1)}\r\n" +
            s"Content-Length: ${body.length}\r\n\r\n").getBytes(ascii) ++ body
          if (full.length <= segmentBytes)
            rec("WARC-Type: response\r\n" +
              s"WARC-Target-URI: $uri\r\n", full, 0, full.length)
          else {
            val originId = "<urn:uuid:" + java.util.UUID.nameUUIDFromBytes(
              uri.getBytes(java.nio.charset.StandardCharsets.UTF_8)) + ">"
            rec("WARC-Type: response\r\n" +
              s"WARC-Record-ID: $originId\r\n" +
              s"WARC-Target-URI: $uri\r\n" +
              "WARC-Segment-Number: 1\r\n", full, 0, segmentBytes)
            var off = segmentBytes
            var n = 2
            while (off < full.length) {
              val take = math.min(segmentBytes, full.length - off)
              val last = off + take >= full.length
              rec("WARC-Type: continuation\r\n" +
                s"WARC-Segment-Origin-ID: $originId\r\n" +
                s"WARC-Target-URI: $uri\r\n" +
                s"WARC-Segment-Number: $n\r\n" +
                (if (last) s"WARC-Segment-Total-Length: ${full.length}\r\n"
                 else ""), full, off, take)
              off += take
              n += 1
            }
          }
        } finally out.close()
      }
    }
  }

  /** `application/warc-fields` block (WARC 1.1 §8): colon-separated
    * name/value lines with RFC 5322-style continuation (leading
    * whitespace folds into the previous value). Names lowercase in the
    * result (field names are case-insensitive); first occurrence wins.
    * Tolerant by the catalog contract: junk lines are skipped, never
    * thrown — provenance is advisory metadata, not payload. */
  def warcFields(b: Array[Byte]): Map[String, String] = {
    if (b == null) return Map.empty
    val text = new String(b, java.nio.charset.StandardCharsets.UTF_8)
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var lastKey: String = null
    text.split("\r?\n", -1).foreach { line =>
      if (line.nonEmpty && (line.charAt(0) == ' ' || line.charAt(0) == '\t')) {
        if (lastKey != null) out(lastKey) = out(lastKey) + " " + line.trim
      } else {
        val c = line.indexOf(':')
        if (c > 0) {
          val k = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
          val v = line.substring(c + 1).trim
          if (!out.contains(k)) { out(k) = v; lastKey = k }
          else lastKey = null
        } else lastKey = null
      }
    }
    out.toMap
  }

  /** The crawl-provenance catalog: one row per `response`, annotated
    * with WHO fetched it and HOW — the file's `warcinfo` fields
    * (software, hostname, operator, isPartOf: WARC 1.1 §6.2), the
    * linked `request` record's method and User-Agent, and the linked
    * `metadata` record's crawler annotations (fetchTimeMs, charset —
    * §6.9) — the same provenance tier as the EXIF/XMP catalogs, at the
    * crawl grain. Links are `WARC-Concurrent-To` → the response's
    * `WARC-Record-ID` (§5.7), both carried verbatim by the reader.
    *
    * Scale shape: warcinfo is one record per ARCHIVE FILE — a
    * files-scale table, broadcast to every response row (never a
    * shuffle); request/metadata links join on record-ID UUIDs —
    * uniform keys by construction (no skew term), one partial-agg-free
    * equi-join each. All three faces are column-pruned passes over the
    * same record scan; callers bridging several should persist the
    * records first (the [[toDocuments]] guidance). */
  def crawlProvenance(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    val resp = records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull)
      .select(col("path"), col("record_id"), col("target_uri").as("url"),
        col("warc_date"))
    val info = records
      .filter(r => r.warc_type == "warcinfo" && r.framing_ok)
      .map { r =>
        val f = warcFields(r.payload)
        (r.path, f.getOrElse("software", null), f.getOrElse("hostname", null),
          f.getOrElse("operator", null), f.getOrElse("ispartof", null))
      }
      .toDF("path", "software", "hostname", "operator", "is_part_of")
      // one warcinfo per file is the norm; a rewritten archive may
      // carry several — the FIRST (min by field tuple) is the file's
      .groupBy("path")
      .agg(min(struct(col("software"), col("hostname"), col("operator"),
        col("is_part_of"))).as("o"))
      .select(col("path"), col("o.software").as("software"),
        col("o.hostname").as("hostname"), col("o.operator").as("operator"),
        col("o.is_part_of").as("is_part_of"))
    val reqs = records
      .filter(r => r.warc_type == "request" && r.framing_ok &&
        r.concurrent_to != null && r.payload != null)
      .map { r =>
        val head = new String(r.payload,
          java.nio.charset.StandardCharsets.UTF_8)
        val lines = head.split("\r\n")
        val method = lines.headOption.map(_.split(" ")(0)).orNull
        val ua = lines.tail.collectFirst {
          case l if l.toLowerCase(java.util.Locale.ROOT)
            .startsWith("user-agent:") =>
            l.substring("user-agent:".length).trim
        }.orNull
        (r.concurrent_to, method, ua)
      }
      .toDF("concurrent_to", "request_method", "request_user_agent")
    val metas = records
      .filter(r => r.warc_type == "metadata" && r.framing_ok &&
        r.concurrent_to != null)
      .map { r =>
        val f = warcFields(r.payload)
        (r.concurrent_to,
          f.get("fetchtimems").flatMap(_.toLongOption)
            .map(java.lang.Long.valueOf).orNull,
          f.getOrElse("charset", null))
      }
      .toDF("concurrent_to", "fetch_time_ms", "charset")
    resp
      .join(broadcast(info), Seq("path"), "left")
      .join(reqs, resp("record_id") === reqs("concurrent_to"), "left")
      .drop(reqs("concurrent_to"))
      .join(metas, resp("record_id") === metas("concurrent_to"), "left")
      .drop(metas("concurrent_to"))
      .drop("path", "record_id")
  }

  /** The provenance-bearing counterpart of [[writeWarcResponses]]: the
    * archive opens with a `warcinfo` record (constant staging fields),
    * and each `(target_uri, content_type, payload, user_agent,
    * fetch_time_ms, charset)` row becomes the real crawl triple —
    * `request` (Concurrent-To the response), `response` (with a
    * deterministic WARC-Record-ID), `metadata` (fetchTimeMs/charset
    * warc-fields) — the record layout Common Crawl style crawlers
    * write. */
  def writeWarcResponsesWithProvenance(df: DataFrame, dir: String): Unit = {
    val cols = df.select(col("target_uri"), col("content_type"),
      col("payload"), col("user_agent"), col("fetch_time_ms"), col("charset"))
    cols.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = new org.apache.hadoop.fs.Path(s"$dir/seg$pid.warc")
        val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = new java.io.BufferedOutputStream(fs.create(path, true))
        val ascii = java.nio.charset.StandardCharsets.US_ASCII
        def rec(headers: String, body: Array[Byte]): Unit = {
          out.write((s"WARC/1.0\r\n$headers" +
            s"Content-Length: ${body.length}\r\n\r\n").getBytes(ascii))
          out.write(body)
          out.write("\r\n\r\n".getBytes(ascii))
        }
        try {
          val infoBody = ("software: graft-staging/1.0\r\n" +
            "hostname: stage.test\r\noperator: graft\r\n" +
            "isPartOf: corpus-stage\r\n").getBytes(ascii)
          rec("WARC-Type: warcinfo\r\n" +
            "Content-Type: application/warc-fields\r\n", infoBody)
          it.foreach { r =>
            val uri = r.getString(0)
            val body = r.getAs[Array[Byte]](2)
            val respId = "<urn:uuid:" +
              java.util.UUID.nameUUIDFromBytes(
                uri.getBytes(java.nio.charset.StandardCharsets.UTF_8)) + ">"
            val reqBody = (s"GET $uri HTTP/1.1\r\nHost: stage.test\r\n" +
              s"User-Agent: ${r.getString(3)}\r\n\r\n").getBytes(ascii)
            rec("WARC-Type: request\r\n" +
              s"WARC-Target-URI: $uri\r\n" +
              s"WARC-Concurrent-To: $respId\r\n" +
              "Content-Type: application/http;msgtype=request\r\n", reqBody)
            val http = (s"HTTP/1.1 200 OK\r\nContent-Type: ${r.getString(1)}\r\n" +
              s"Content-Length: ${body.length}\r\n\r\n").getBytes(ascii)
            rec("WARC-Type: response\r\n" +
              s"WARC-Record-ID: $respId\r\n" +
              s"WARC-Target-URI: $uri\r\n", http ++ body)
            val metaBody = (s"fetchTimeMs: ${r.getLong(4)}\r\n" +
              s"charset: ${r.getString(5)}\r\n").getBytes(ascii)
            rec("WARC-Type: metadata\r\n" +
              s"WARC-Target-URI: $uri\r\n" +
              s"WARC-Concurrent-To: $respId\r\n" +
              "Content-Type: application/warc-fields\r\n", metaBody)
          }
        } finally out.close()
      }
    }
  }

  /** The crawl's redirect graph: `response` records whose HTTP status
    * is a 3xx and which carry a `Location` header become edges
    * `(from_url, to_url, status)` — the fetched URI canonicalized, the
    * Location target resolved against it (RFC 9110 §10.2.2 allows
    * relative Locations) and canonicalized by the same kernels, so
    * redirect edges, outlink edges, and revisit joins share ONE URL
    * identity. An unresolvable Location (no derivable fetch identity)
    * drops the edge. Narrow codegen'd column work over the record
    * scan: zero shuffle, parallelism follows the archive files. */
  def redirectEdges(records: Dataset[WarcRecord]): DataFrame = {
    import graft.expressions.NativeUrl
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull && col("http_location").isNotNull &&
        col("http_status").isin(301, 302, 303, 307, 308))
      .select(
        NativeUrl.canonicalizeUrl(col("target_uri")).as("from_url"),
        NativeUrl.resolveUrl(col("target_uri"), col("http_location"))
          .as("to_url"),
        col("http_status").as("status"))
      .filter(col("to_url").isNotNull)
  }

  /** The crawl's outlink graph: every `text/html` response's anchors
    * ([[graft.functions.TextFunctions.htmlLinks]]) absolutized against
    * the page URL — honoring an in-page `<base href>` (itself resolved
    * against the fetched URI first, the HTML living-standard rule) —
    * and canonicalized, one `(from_url, to_url, anchor)` row per
    * resolvable link. Authority-less targets (`mailto:`, `javascript:`)
    * resolve to null and drop: an edge list is fetch identities only.
    * All codegen'd expressions over the record scan plus one explode —
    * zero shuffle; at 100 TB the edge list partitions with the archive
    * files and feeds the frontier/rank joins downstream. */
  def frontierLinks(records: Dataset[WarcRecord]): DataFrame = {
    import graft.expressions.NativeUrl
    import graft.functions.TextFunctions
    val html = col("html")
    val baseHref = regexp_extract(html,
      "(?is)<base\\s[^>]*href\\s*=\\s*\"([^\"]*)\"", 1)
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type")) === "text/html")
      .select(col("target_uri").as("url"),
        decodePayload(col("payload"), col("http_content_type")).as("html"))
      .select(col("url"),
        when(baseHref =!= "", NativeUrl.resolveUrl(col("url"), baseHref))
          .otherwise(col("url")).as("base"),
        explode(TextFunctions.htmlLinks(html)).as("link"))
      .select(
        NativeUrl.canonicalizeUrl(col("url")).as("from_url"),
        NativeUrl.resolveUrl(coalesce(col("base"), col("url")),
          col("link.href")).as("to_url"),
        col("link.anchor").as("anchor"))
      .filter(col("to_url").isNotNull)
  }

  /** The in-page redirect lane of [[redirectEdges]]: `<meta
    * http-equiv="refresh" content="N; url=…">` pages (the HTML-living-
    * standard client-side redirect crawlers must follow — parked pages,
    * moved sites, and meta-only hosting redirect THIS way, invisible to
    * the 3xx edge list). Both attribute orders parse; the target
    * resolves against the page URL and canonicalizes through the same
    * kernels as every other edge, so the three redirect sources (3xx
    * Location, meta refresh, frontier links) share ONE URL identity. A
    * content value without a url= clause is a self-reload, not an edge.
    * Narrow codegen'd column work over the record scan: zero shuffle. */
  def refreshEdges(records: Dataset[WarcRecord]): DataFrame = {
    import graft.expressions.NativeUrl
    val html = decodePayload(col("payload"), col("http_content_type"))
    val p1 = regexp_extract(html,
      "(?is)<meta[^>]*http-equiv\\s*=\\s*[\"']?refresh[\"']?[^>]*" +
        "content\\s*=\\s*[\"']([^\"'>]*)", 1)
    val p2 = regexp_extract(html,
      "(?is)<meta[^>]*content\\s*=\\s*[\"']([^\"'>]*)[\"'][^>]*" +
        "http-equiv\\s*=\\s*[\"']?refresh", 1)
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type")) === "text/html")
      .select(col("target_uri").as("url"),
        when(p1 =!= "", p1).otherwise(p2).as("refresh"))
      .filter(col("refresh") =!= "")
      .select(col("url"), col("refresh"),
        regexp_extract(col("refresh"), "^\\s*([0-9]+)", 1).as("delay"),
        regexp_extract(col("refresh"),
          "(?i)url\\s*=\\s*['\"]?([^'\"\\s>]+)", 1).as("target"))
      .filter(col("target") =!= "")
      .select(
        NativeUrl.canonicalizeUrl(col("url")).as("from_url"),
        NativeUrl.resolveUrl(col("url"), col("target")).as("to_url"),
        coalesce(col("delay").cast("int"), lit(0)).as("delay_s"))
      .filter(col("to_url").isNotNull)
  }

  /** `rel=canonical` declarations off the crawl's HTML responses, in
    * [[graft.operators.LinkRank.urlAliasClusters]]'s `canonicals`
    * shape: `(url, canonical_url)` — the page URL canonicalized, the
    * declared href RESOLVED against it (canonical hrefs are commonly
    * relative) and canonicalized by the same kernel, self-declarations
    * dropped (a page naming itself canonical asserts no alias). Same
    * narrow codegen projection as [[refreshEdges]]; one archive scan,
    * zero shuffle. */
  def canonicalDeclarations(records: Dataset[WarcRecord]): DataFrame = {
    import graft.expressions.NativeUrl
    import graft.functions.TextFunctions
    val html = decodePayload(col("payload"), col("http_content_type"))
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type")) === "text/html")
      .select(col("target_uri").as("page"),
        TextFunctions.htmlMeta(html).getField("canonical").as("decl"))
      .filter(col("decl") =!= "")
      .select(
        NativeUrl.canonicalizeUrl(col("page")).as("url"),
        NativeUrl.resolveUrl(col("page"), col("decl")).as("canonical_url"))
      .filter(col("canonical_url").isNotNull &&
        col("canonical_url") =!= col("url"))
  }

  /** Staging writer for redirect archives: a row with a non-null
    * `location` becomes a head-only 3xx response carrying it; a null
    * `location` becomes a plain 200 with a one-line HTML body (the
    * no-edge lane). */
  def writeWarcRedirects(df: DataFrame, dir: String): Unit = {
    val cols = df.select(col("target_uri"), col("status"), col("location"))
    cols.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = new org.apache.hadoop.fs.Path(s"$dir/seg$pid.warc")
        val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = new java.io.BufferedOutputStream(fs.create(path, true))
        val ascii = java.nio.charset.StandardCharsets.US_ASCII
        try it.foreach { r =>
          val http =
            if (r.isNullAt(2)) {
              val body = "<p>ok</p>".getBytes(ascii)
              (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
                s"Content-Length: ${body.length}\r\n\r\n").getBytes(ascii) ++ body
            } else
              (s"HTTP/1.1 ${r.getInt(1)} Redirect\r\n" +
                s"Location: ${r.getString(2)}\r\n" +
                "Content-Length: 0\r\n\r\n").getBytes(ascii)
          out.write((s"WARC/1.0\r\nWARC-Type: response\r\n" +
            s"WARC-Target-URI: ${r.getString(0)}\r\n" +
            s"Content-Length: ${http.length}\r\n\r\n").getBytes(ascii))
          out.write(http)
          out.write("\r\n\r\n".getBytes(ascii))
        } finally out.close()
      }
    }
  }

  /** Reverse RFC 9112 §7.1 chunked framing: hex size line (chunk
    * extensions after `;` dropped), data, CRLF, repeated to the 0-size
    * last chunk; the trailer section is skipped unread. Output is by
    * construction never larger than the input (chunks are substrings),
    * so no bomb guard is needed. Malformed framing fails loudly — the
    * caller's tolerant passthrough is the degrade path. */
  private[io] def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    while (true) {
      val eol = indexOfCrlf(b, i)
      require(eol >= 0, "chunked: missing size line")
      var line = new String(b, i, eol - i,
        java.nio.charset.StandardCharsets.US_ASCII)
      val semi = line.indexOf(';')
      if (semi >= 0) line = line.substring(0, semi)
      val size = java.lang.Long.parseLong(line.trim, 16)
      require(size >= 0 && size <= Int.MaxValue, "chunked: bad size")
      i = eol + 2
      if (size == 0) return out.toByteArray // trailers skipped unread
      require(i + size + 2 <= b.length, "chunked: truncated chunk")
      out.write(b, i, size.toInt)
      i += size.toInt
      require(b(i) == '\r' && b(i + 1) == '\n', "chunked: missing data CRLF")
      i += 2
    }
    out.toByteArray // unreachable
  }

  private def indexOfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 2 <= b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Curate-ready documents from `application/pdf` responses — the PDF
    * face of [[toDocumentsHtml]]: payload through `Pdf.extractText`
    * (pure-JVM FlateDecode + content-stream interpretation, fail-loudly),
    * identity/lang-ID exactly as the HTML path — so the crawl's
    * second-biggest text carrier feeds `CorpusPipeline.curate` without
    * leaving Spark. The extraction is a typed mapPartitions codec (a
    * binary format walk is imperative per-row work, the [[graft.operators.Multimodal]]
    * codec rule), narrow and shuffle-free: parallelism follows the
    * archive files, like every ingest path here. */
  def toDocumentsPdf(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    import graft.functions.TextFunctions
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type")) === "application/pdf")
      .select(
        xxhash64(col("target_uri")).as("doc_id"),
        col("target_uri").as("url"),
        col("payload"))
      .as[(Long, String, Array[Byte])]
      // `Pdf.extractText` is deliberately strict (encrypted, truncated,
      // or malformed input throws) — but ONE bad PDF in a crawl must not
      // fail the whole archive job. The ingestion contract here is the
      // same as WARC framing and Content-Encoding decode: degrade to a
      // flagged row (`extract_ok = false`, null text) and let downstream
      // filters arbitrate. Strictness stays in the codec, tolerance at
      // the bridge.
      .mapPartitions(_.map { case (id, url, bytes) =>
        try (id, url, graft.operators.Pdf.extractText(bytes, id), true)
        catch { case _: Exception => (id, url, null: String, false) } })
      .toDF("doc_id", "url", "text", "extract_ok")
      .select(col("doc_id"), col("url"),
        TextFunctions.langId(col("text")).as("lang"), col("text"),
        col("extract_ok"))
  }

  /** Curate-ready documents from OOXML `.docx` responses — the fourth
    * text carrier after HTML, PDF, and plain text
    * ([[graft.operators.Docx]]: ZIP central-directory walk + bounded
    * WordprocessingML strip). Same strict-codec / tolerant-bridge
    * contract as [[toDocumentsPdf]]: one malformed package in a crawl
    * degrades to a flagged row (`extract_ok = false`, null text), never
    * fails the archive job. Legacy binary `.doc` (application/msword)
    * is NOT claimed — it is a different (OLE2) container. */
  def toDocumentsDocx(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    import graft.functions.TextFunctions
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type")) ===
          "application/vnd.openxmlformats-officedocument.wordprocessingml.document")
      .select(
        xxhash64(col("target_uri")).as("doc_id"),
        col("target_uri").as("url"),
        col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, url, bytes) =>
        try (id, url, graft.operators.Docx.extractText(bytes, id), true)
        catch { case _: Exception => (id, url, null: String, false) } })
      .toDF("doc_id", "url", "text", "extract_ok")
      .select(col("doc_id"), col("url"),
        TextFunctions.langId(col("text")).as("lang"), col("text"),
        col("extract_ok"))
  }

  /** Curate-ready documents from OOXML `.xlsx` responses — the tabular
    * text carrier ([[graft.operators.Xlsx]]: sheets flattened to
    * TAB-joined cells, newline-joined rows). Same strict-codec /
    * tolerant-bridge contract as the other binary carriers. */
  def toDocumentsXlsx(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    import graft.functions.TextFunctions
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type")) ===
          "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet")
      .select(
        xxhash64(col("target_uri")).as("doc_id"),
        col("target_uri").as("url"),
        col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, url, bytes) =>
        try (id, url, graft.operators.Xlsx.extractText(bytes, id), true)
        catch { case _: Exception => (id, url, null: String, false) } })
      .toDF("doc_id", "url", "text", "extract_ok")
      .select(col("doc_id"), col("url"),
        TextFunctions.langId(col("text")).as("lang"), col("text"),
        col("extract_ok"))
  }

  /** Curate-ready documents from OOXML `.pptx` responses — the
    * presentation face of the trio ([[graft.operators.Pptx]]: slides in
    * numeric part order, paragraphs newline-joined). Same strict-codec /
    * tolerant-bridge contract as the other binary carriers. */
  def toDocumentsPptx(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    import graft.functions.TextFunctions
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type")) ===
          "application/vnd.openxmlformats-officedocument.presentationml.presentation")
      .select(
        xxhash64(col("target_uri")).as("doc_id"),
        col("target_uri").as("url"),
        col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, url, bytes) =>
        try (id, url, graft.operators.Pptx.extractText(bytes, id), true)
        catch { case _: Exception => (id, url, null: String, false) } })
      .toDF("doc_id", "url", "text", "extract_ok")
      .select(col("doc_id"), col("url"),
        TextFunctions.langId(col("text")).as("lang"), col("text"),
        col("extract_ok"))
  }

  /** Curate-ready documents from `application/epub+zip` responses —
    * the BOOK carrier ([[graft.operators.Epub]]): the JVM side only
    * resolves the OCF/OPF spine and concatenates the chapters' raw
    * XHTML; the heavy HTML→text strip is the SAME codegen'd
    * `TextFunctions.htmlToText` column crawl HTML takes, so the plan
    * stays in whole-stage codegen. Strict-codec / tolerant-bridge. */
  def toDocumentsEpub(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    import graft.functions.TextFunctions
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type")) === "application/epub+zip")
      .select(
        xxhash64(col("target_uri")).as("doc_id"),
        col("target_uri").as("url"),
        col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, url, bytes) =>
        try (id, url, graft.operators.Epub.spineHtml(bytes, id), true)
        catch { case _: Exception => (id, url, null: String, false) } })
      .toDF("doc_id", "url", "html", "extract_ok")
      .select(col("doc_id"), col("url"),
        TextFunctions.htmlToText(col("html")).as("text"), col("extract_ok"))
      .select(col("doc_id"), col("url"),
        TextFunctions.langId(col("text")).as("lang"), col("text"),
        col("extract_ok"))
  }

  /** Curate-ready documents from RTF responses (`application/rtf`,
    * `text/rtf` — the legacy word-processor carrier;
    * [[graft.operators.Rtf]]: bounded control-word strip, destination
    * groups skipped, unicode escapes honored). Strict-codec /
    * tolerant-bridge. */
  def toDocumentsRtf(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    import graft.functions.TextFunctions
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type")).isin("application/rtf", "text/rtf"))
      .select(
        xxhash64(col("target_uri")).as("doc_id"),
        col("target_uri").as("url"),
        col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, url, bytes) =>
        try (id, url, graft.operators.Rtf.extractText(bytes, id), true)
        catch { case _: Exception => (id, url, null: String, false) } })
      .toDF("doc_id", "url", "text", "extract_ok")
      .select(col("doc_id"), col("url"),
        TextFunctions.langId(col("text")).as("lang"), col("text"),
        col("extract_ok"))
  }

  /** Curate-ready documents from subtitle responses — `text/vtt`
    * (WebVTT) and `application/x-subrip` (SRT), the video-transcript
    * carriers ([[graft.operators.Subtitles]]: cue payload text, tags
    * stripped, timing/framing dropped). Same strict-codec /
    * tolerant-bridge contract as the binary carriers. */
  def toDocumentsSubtitles(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    import graft.functions.TextFunctions
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type"))
          .isin("text/vtt", "application/x-subrip"))
      .select(
        xxhash64(col("target_uri")).as("doc_id"),
        col("target_uri").as("url"),
        mimeOf(col("http_content_type")).as("mime"),
        col("payload"))
      .as[(Long, String, String, Array[Byte])]
      .mapPartitions(_.map { case (id, url, mime, bytes) =>
        try {
          val doc =
            if (mime == "text/vtt") graft.operators.Subtitles.extractVtt(bytes, id)
            else graft.operators.Subtitles.extractSrt(bytes, id)
          (id, url, doc.text, true)
        } catch { case _: Exception => (id, url, null: String, false) } })
      .toDF("doc_id", "url", "text", "extract_ok")
      .select(col("doc_id"), col("url"),
        TextFunctions.langId(col("text")).as("lang"), col("text"),
        col("extract_ok"))
  }

  /** Curate-ready documents from ARCHIVE responses — `application/zip`
    * (the [[graft.operators.Docx]] central-directory walk) and
    * `application/x-tar` ([[graft.operators.Tar]]): every text-bearing
    * entry becomes its OWN document row (`url` = archive url `#`
    * entry name), routed by extension through the SAME extractors the
    * top-level carriers use — .txt raw, .md through the markdown
    * strip, .html and .epub through the codegen'd HTML strip,
    * .pdf/.docx/.xlsx/.pptx/.srt/.vtt through their codecs. Non-text entries (images, binaries) are
    * skipped — absence, not error. A malformed ARCHIVE degrades to one
    * flagged row; a malformed ENTRY degrades to its own flagged row,
    * never failing the sibling entries. */
  def toDocumentsArchive(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    import graft.functions.TextFunctions
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type"))
          .isin("application/zip", "application/x-tar",
            "application/gzip", "application/x-gzip",
            "application/x-xz", "application/zstd", "application/x-lz4",
            "application/x-brotli"))
      .select(
        col("target_uri").as("url"),
        mimeOf(col("http_content_type")).as("mime"),
        col("payload"))
      .as[(String, String, Array[Byte])]
      .mapPartitions(_.flatMap { case (url, mime, bytes) =>
        val parsed: Option[Seq[(String, Array[Byte])]] =
          try Some {
            if (mime == "application/zip") {
              val offs = graft.operators.Docx.zipEntryOffsets(bytes, -1L)
              offs.map { case (name, cd) =>
                name -> graft.operators.Docx.zipEntryAt(bytes, cd, name, -1L) }
            } else if (mime == "application/x-tar")
              graft.operators.Tar.entries(bytes, -1L)
            else {
              // codec layer (gzip/xz/zstd/lz4): peel it, then a
              // .tar.<codec> walks as tar (ustar magic at 257) and a
              // single-member file.txt.<codec> becomes one entry named
              // from the url basename minus the codec suffix
              // bomb guard: a member expanding past 1 GiB degrades to
              // one flagged row instead of OOMing the task
              val raw = graft.operators.Codec.decompress(
                bytes, mime, maxOut = 1L << 30)
              val isTar = raw.length >= 262 &&
                new String(raw, 257, 5,
                  java.nio.charset.StandardCharsets.US_ASCII) == "ustar"
              if (isTar) graft.operators.Tar.entries(raw, -1L)
              else {
                val base = graft.operators.Codec.stripSuffix(url.split('/').last)
                Seq(base -> raw)
              }
            }
          } catch { case _: Exception => None }
        if (parsed.isEmpty) // the whole archive is unreadable: ONE flagged row
          Iterator((url + "#", null: String, null: String, false))
        else parsed.get.iterator.flatMap { case (name0, data0) =>
          // a codec-suffixed MEMBER (x.jsonl.gz inside a tar) peels its
          // one codec layer and re-routes under the stripped name —
          // exactly once (a .gz.gz is hostile nesting, not a lane)
          val (name, data) =
            try {
              val n0 = name0.toLowerCase(java.util.Locale.ROOT)
              if (n0.matches(".*\\.(gz|gzip|xz|zst|zstd|lz4)$"))
                (graft.operators.Codec.stripSuffix(name0),
                  graft.operators.Codec.decompressAuto(data0, maxOut = 1L << 30))
              else if (n0.endsWith(".br")) // brotli has no magic: by suffix
                (graft.operators.Codec.stripSuffix(name0),
                  graft.operators.Codec.decompress(data0,
                    graft.operators.Codec.Br, maxOut = 1L << 30))
              else (name0, data0)
            } catch { case _: Exception => (name0, data0) }
          val n = name.toLowerCase(java.util.Locale.ROOT)
          def s = new String(data, java.nio.charset.StandardCharsets.UTF_8)
          try {
            if (n.endsWith(".txt"))
              List((url + "#" + name, s, null: String, true))
            else if (n.endsWith(".json") || n.endsWith(".jsonl") ||
                n.endsWith(".ndjson"))
              // one row per contained document, the response-face grain
              graft.operators.Json.extractDocs(data).map { case (idx, text) =>
                (url + "#" + name + (if (idx < 0) "" else s"#$idx"),
                  text, null: String, true) }
            else if (n.endsWith(".md") || n.endsWith(".markdown"))
              List((url + "#" + name,
                graft.operators.Markdown.extractText(data), null: String, true))
            else if (n.endsWith(".html") || n.endsWith(".htm") ||
                n.endsWith(".xhtml"))
              List((url + "#" + name, null: String, s, true))
            else if (n.endsWith(".pdf"))
              List((url + "#" + name,
                graft.operators.Pdf.extractText(data), null: String, true))
            else if (n.endsWith(".docx"))
              List((url + "#" + name,
                graft.operators.Docx.extractText(data), null: String, true))
            else if (n.endsWith(".xlsx"))
              List((url + "#" + name,
                graft.operators.Xlsx.extractText(data), null: String, true))
            else if (n.endsWith(".pptx"))
              List((url + "#" + name,
                graft.operators.Pptx.extractText(data), null: String, true))
            else if (n.endsWith(".srt"))
              List((url + "#" + name,
                graft.operators.Subtitles.extractSrt(data).text, null: String, true))
            else if (n.endsWith(".vtt"))
              List((url + "#" + name,
                graft.operators.Subtitles.extractVtt(data).text, null: String, true))
            else if (n.endsWith(".epub"))
              List((url + "#" + name, null: String,
                graft.operators.Epub.spineHtml(data), true))
            else if (n.endsWith(".odt") || n.endsWith(".ods") ||
                n.endsWith(".odp"))
              List((url + "#" + name,
                graft.operators.Odf.extractText(data), null: String, true))
            else if (n.endsWith(".sqlite") || n.endsWith(".sqlite3") ||
                (n.endsWith(".db") && graft.operators.Sqlite.isSqlite(data)))
              List((url + "#" + name,
                graft.operators.Sqlite.extractText(data), null: String, true))
            else Nil // non-text entry: skipped, not flagged
          } catch {
            case _: Exception =>
              List((url + "#" + name, null: String, null: String, false))
          }
        }
      })
      .toDF("url", "raw_text", "html", "extract_ok")
      .select(
        xxhash64(col("url")).as("doc_id"), col("url"),
        coalesce(col("raw_text"),
          TextFunctions.htmlToText(col("html"))).as("text"),
        col("extract_ok"))
      .select(col("doc_id"), col("url"),
        TextFunctions.langId(col("text")).as("lang"), col("text"),
        col("extract_ok"))
  }

  /** Curate-ready documents from `text/csv` responses — RFC 4180
    * parsed ([[graft.operators.Csv]]: quoted fields, embedded
    * commas/CRLF, doubled-quote escapes) and flattened cells-by-TAB /
    * records-by-newline, the [[toDocumentsXlsx]] rendering for plain-
    * text tables. Strict-codec / tolerant-bridge. */
  def toDocumentsCsv(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    import graft.functions.TextFunctions
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type")) === "text/csv")
      .select(
        xxhash64(col("target_uri")).as("doc_id"),
        col("target_uri").as("url"),
        col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, url, bytes) =>
        try (id, url, graft.operators.Csv.extractText(bytes, id), true)
        catch { case _: Exception => (id, url, null: String, false) } })
      .toDF("doc_id", "url", "text", "extract_ok")
      .select(col("doc_id"), col("url"),
        TextFunctions.langId(col("text")).as("lang"), col("text"),
        col("extract_ok"))
  }

  // shared tail of the mail and feed bridges: the decoded subject or
  // item title becomes the document's first line (it IS content), an
  // HTML payload routes through the SAME codegen htmlToText strip
  // crawl HTML takes; failed rows keep a null text
  private def emlDocRows(rows: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.functions.TextFunctions
    rows
      .select(col("doc_id"), col("url"),
        when(col("extract_ok"),
          concat_ws("\n", col("subject"),
            coalesce(col("raw_text"),
              TextFunctions.htmlToText(col("html"))))).as("text"),
        col("extract_ok"))
      .select(col("doc_id"), col("url"),
        TextFunctions.langId(col("text")).as("lang"), col("text"),
        col("extract_ok"))
  }

  /** Curate-ready documents from `message/rfc822` responses — mail
    * messages ([[graft.operators.Eml]]: header unfold + RFC 2047
    * decode, MIME tree walk, quoted-printable/base64 transfer
    * decodings, attachment skip). Strict-codec / tolerant-bridge. */
  def toDocumentsEml(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    emlDocRows(records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type")) === "message/rfc822")
      .select(
        xxhash64(col("target_uri")).as("doc_id"),
        col("target_uri").as("url"),
        col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, url, bytes) =>
        try {
          val m = graft.operators.Eml.parseEml(bytes, id)
          (id, url, m.subject, m.text, m.html, true)
        } catch {
          case _: Exception =>
            (id, url, null: String, null: String, null: String, false)
        } })
      .toDF("doc_id", "url", "subject", "raw_text", "html", "extract_ok"))
  }

  /** Curate-ready documents from `application/mbox` responses — each
    * mailbox message its OWN document (`url#<index>`, the archive
    * convention), the mbox framing walked by [[graft.operators.Eml
    * .mboxMessages]] (mboxrd stuffing reversed) and each message
    * through the same extraction as [[toDocumentsEml]]. An unreadable
    * mailbox is ONE flagged row; a single malformed message flags only
    * itself — failure isolation at the entry grain. */
  def toDocumentsMbox(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    emlDocRows(records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type")) === "application/mbox")
      .select(col("target_uri").as("url"), col("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (url, bytes) =>
        val msgs =
          try Some(graft.operators.Eml.mboxMessages(bytes, -1L))
          catch { case _: Exception => None }
        msgs match {
          case None =>
            Iterator((url + "#", null: String, null: String,
              null: String, false))
          case Some(ms) => ms.iterator.zipWithIndex.map { case (m, i) =>
            try {
              val e = graft.operators.Eml.parseEml(m, i.toLong)
              (url + "#" + i, e.subject, e.text, e.html, true)
            } catch {
              case _: Exception =>
                (url + "#" + i, null: String, null: String,
                  null: String, false)
            }
          }
        }
      })
      .toDF("url", "subject", "raw_text", "html", "extract_ok")
      .withColumn("doc_id", xxhash64(col("url"))))
  }

  /** Curate-ready documents from LaTeX responses —
    * `application/x-tex` / `text/x-tex`, the scientific-corpus
    * carrier ([[graft.operators.Tex]]: bounded TeX-tokenized scan,
    * preamble/math/float drop, structure commands surfaced).
    * Strict-codec / tolerant-bridge. */
  def toDocumentsTex(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    import graft.functions.TextFunctions
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type"))
          .isin("application/x-tex", "text/x-tex", "application/x-latex"))
      .select(
        xxhash64(col("target_uri")).as("doc_id"),
        col("target_uri").as("url"),
        col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, url, bytes) =>
        try (id, url, graft.operators.Tex.extractText(bytes, id), true)
        catch { case _: Exception => (id, url, null: String, false) } })
      .toDF("doc_id", "url", "text", "extract_ok")
      .select(col("doc_id"), col("url"),
        TextFunctions.langId(col("text")).as("lang"), col("text"),
        col("extract_ok"))
  }

  /** Curate-ready documents from web-feed responses —
    * `application/rss+xml` and `application/atom+xml`
    * ([[graft.operators.Feed]]): every item/entry its OWN document
    * (`url#<index>`, the feed IS many articles), the title heading the
    * text and the payload routed through the SAME codegen `htmlToText`
    * strip crawl HTML takes. An unreadable feed is ONE flagged row —
    * the same failure-isolation contract as the mailbox bridge. */
  def toDocumentsFeed(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    emlDocRows(records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type"))
          .isin("application/rss+xml", "application/atom+xml"))
      .select(col("target_uri").as("url"), col("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (url, bytes) =>
        val items =
          try Some(graft.operators.Feed.parseFeed(bytes, -1L))
          catch { case _: Exception => None }
        items match {
          case None =>
            Iterator((url + "#", null: String, null: String,
              null: String, false))
          case Some(is) => is.iterator.zipWithIndex.map { case (it, i) =>
            (url + "#" + i,
              if (it.title.isEmpty) null else it.title,
              null: String, it.content, true)
          }
        }
      })
      .toDF("url", "subject", "raw_text", "html", "extract_ok")
      .withColumn("doc_id", xxhash64(col("url"))))
  }

  /** Curate-ready documents from SQLite responses —
    * `application/vnd.sqlite3` ([[graft.operators.Sqlite]]): the
    * catalog walk over every user table, rows flattened like XLSX
    * (cells by TAB, rows/tables by newline). Strict-codec /
    * tolerant-bridge. */
  def toDocumentsSqlite(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    import graft.functions.TextFunctions
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type"))
          .isin("application/vnd.sqlite3", "application/x-sqlite3"))
      .select(
        xxhash64(col("target_uri")).as("doc_id"),
        col("target_uri").as("url"),
        col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, url, bytes) =>
        try (id, url, graft.operators.Sqlite.extractText(bytes, id), true)
        catch { case _: Exception => (id, url, null: String, false) } })
      .toDF("doc_id", "url", "text", "extract_ok")
      .select(col("doc_id"), col("url"),
        TextFunctions.langId(col("text")).as("lang"), col("text"),
        col("extract_ok"))
  }

  /** Curate-ready documents from OpenDocument responses — the ODF
    * trio (`.odt`/`.ods`/`.odp`, [[graft.operators.Odf]]): one
    * `content.xml` walk dispatched on the body root (paragraph strip /
    * TAB-flattened tables / per-page text). Strict-codec /
    * tolerant-bridge. */
  def toDocumentsOdf(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    import graft.functions.TextFunctions
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type")).isin(
          graft.operators.Odf.OdtMime, graft.operators.Odf.OdsMime,
          graft.operators.Odf.OdpMime))
      .select(
        xxhash64(col("target_uri")).as("doc_id"),
        col("target_uri").as("url"),
        col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, url, bytes) =>
        try (id, url, graft.operators.Odf.extractText(bytes, id), true)
        catch { case _: Exception => (id, url, null: String, false) } })
      .toDF("doc_id", "url", "text", "extract_ok")
      .select(col("doc_id"), col("url"),
        TextFunctions.langId(col("text")).as("lang"), col("text"),
        col("extract_ok"))
  }

  /** Curate-ready documents from calendar responses — `text/calendar`
    * (RFC 5545, [[graft.operators.Vobject]]): every VEVENT its OWN
    * document (`url#<index>` — a calendar IS many events), the summary
    * heading the description, the [[toDocumentsFeed]] contract. An
    * unreadable calendar is ONE flagged row. */
  def toDocumentsIcs(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    emlDocRows(records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type")) === "text/calendar")
      .select(col("target_uri").as("url"), col("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (url, bytes) =>
        val events =
          try Some(graft.operators.Vobject.extractIcs(bytes, -1L))
          catch { case _: Exception => None }
        events match {
          case None =>
            Iterator((url + "#", null: String, null: String,
              null: String, false))
          case Some(evs) => evs.iterator.zipWithIndex.map { case (ev, i) =>
            (url + "#" + i,
              if (ev.summary.isEmpty) null else ev.summary,
              if (ev.description.isEmpty) null else ev.description,
              null: String, true)
          }
        }
      })
      .toDF("url", "subject", "raw_text", "html", "extract_ok")
      .withColumn("doc_id", xxhash64(col("url"))))
  }

  /** Curate-ready documents from markdown responses —
    * `text/markdown` / `text/x-markdown`, the README/static-site
    * carrier ([[graft.operators.Markdown]]: front matter dropped,
    * CommonMark-shaped block+inline strip). Strict-codec /
    * tolerant-bridge. */
  def toDocumentsMarkdown(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    import graft.functions.TextFunctions
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type"))
          .isin("text/markdown", "text/x-markdown"))
      .select(
        xxhash64(col("target_uri")).as("doc_id"),
        col("target_uri").as("url"),
        col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, url, bytes) =>
        try (id, url, graft.operators.Markdown.extractText(bytes, id), true)
        catch { case _: Exception => (id, url, null: String, false) } })
      .toDF("doc_id", "url", "text", "extract_ok")
      .select(col("doc_id"), col("url"),
        TextFunctions.langId(col("text")).as("lang"), col("text"),
        col("extract_ok"))
  }

  /** Curate-ready documents from MHTML aggregates (`multipart/related`
    * and the `application/x-mimearchive` spelling browsers save under)
    * — RFC 2557 saved pages: the root part's HTML through the same
    * codegen'd strip as live `text/html`, plus the aggregate's
    * resource count (the asset-manifest signal). Strict-codec /
    * tolerant-bridge. */
  def toDocumentsMhtml(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    import graft.functions.TextFunctions
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type"))
          .isin("multipart/related", "application/x-mimearchive",
            "message/x-mht"))
      .select(col("target_uri").as("url"), col("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (url, bytes) =>
        try {
          val d = graft.operators.Mhtml.parse(bytes)
          (url, d.rootHtml, d.resources.length, true)
        } catch { case _: Exception => (url, null: String, -1, false) } })
      .toDF("url", "html", "n_resources", "extract_ok")
      .select(
        xxhash64(col("url")).as("doc_id"), col("url"),
        TextFunctions.htmlToText(col("html")).as("text"),
        col("n_resources"), col("extract_ok"))
      .select(col("doc_id"), col("url"),
        TextFunctions.langId(col("text")).as("lang"), col("text"),
        col("n_resources"), col("extract_ok"))
  }

  /** Curate-ready documents from JSON / JSONL responses
    * (`application/json`, NDJSON's `application/x-ndjson` and
    * `application/jsonlines`) — the API-response and training-dump
    * carrier. Shape contract is [[graft.operators.Json.extractDocs]]:
    * a single top-level object is ONE document at the response url; a
    * top-level array or a JSONL body yields one document PER
    * object/line at `url#<index>` (the per-line grain is the dump
    * grain — a 1M-line dump must become 1M curate rows, not one);
    * the text is the object's `text`/`content` string field. STRICT
    * codec / tolerant bridge: a malformed payload (or one violating
    * the field contract) degrades to a single flagged row for ITS url,
    * never failing the partition. */
  def toDocumentsJson(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    import graft.functions.TextFunctions
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type"))
          .isin("application/json", "application/x-ndjson",
            "application/jsonlines"))
      .select(col("target_uri").as("url"), col("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (url, bytes) =>
        try graft.operators.Json.extractDocs(bytes).map { case (idx, text) =>
          (if (idx < 0) url else s"$url#$idx", text, true)
        } catch {
          case _: Exception => Seq((url, null: String, false))
        } })
      .toDF("url", "text", "extract_ok")
      .select(
        xxhash64(col("url")).as("doc_id"), col("url"),
        TextFunctions.langId(col("text")).as("lang"), col("text"),
        col("extract_ok"))
  }

  /** Curate-ready documents from `text/plain` responses: the payload IS
    * the text (decoded with the same charset rules as HTML), no
    * stripping — the third text carrier after HTML and PDF. */
  def toDocumentsText(records: Dataset[WarcRecord]): DataFrame = {
    import graft.functions.TextFunctions
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        mimeOf(col("http_content_type")) === "text/plain")
      .select(
        xxhash64(col("target_uri")).as("doc_id"),
        col("target_uri").as("url"),
        decodePayload(col("payload"), col("http_content_type")).as("text"))
      .select(col("doc_id"), col("url"),
        TextFunctions.langId(col("text")).as("lang"), col("text"))
  }

  /** ONE call from crawl archive to curate-ready documents: every
    * text-bearing response routed to its extractor — `text/html` through
    * the HTML strip, `application/pdf` through the pure-JVM PDF
    * extractor, the OOXML trio (`.docx`/`.xlsx`/`.pptx`) through the
    * ZIP central-directory strips, JSON/JSONL through the
    * text-field contract, `text/plain` as-is — unioned into the shared
    * (doc_id, url, lang, text) shape `CorpusPipeline.curate` consumes.
    * Media-typed responses are [[toMedia]]'s business, not dropped here
    * silently — this is the TEXT face only. Each branch filters the same
    * record stream; callers bridging several faces of one archive scan
    * should `records.persist()` first (three column-pruned passes over a
    * cached record table beat three archive walks). */
  def toDocuments(records: Dataset[WarcRecord]): DataFrame =
    toDocuments(records, detectCharsets = false)

  /** `detectCharsets = true` swaps the html and plain-text faces for
    * their detected variants ([[toDocumentsHtmlDetected]] /
    * [[toDocumentsTextDetected]], charset column dropped to keep the
    * shared curate shape): the silent-declaration remainder routes
    * through the statistical detector instead of the blind UTF-8
    * default — the switch a pre-standards-heavy crawl flips. All the
    * byte-carrier faces (pdf/docx/…) are charset-free and unchanged. */
  def toDocuments(records: Dataset[WarcRecord],
      detectCharsets: Boolean): DataFrame =
    (if (detectCharsets) toDocumentsHtmlDetected(records)
      .drop("charset", "charset_margin")
    else toDocumentsHtml(records))
      // failed extractions carry no text — nothing for curation; callers
      // who need the failure rows use toDocumentsPdf/Docx directly
      .unionByName(toDocumentsPdf(records)
        .filter(col("extract_ok")).drop("extract_ok"))
      .unionByName(toDocumentsDocx(records)
        .filter(col("extract_ok")).drop("extract_ok"))
      .unionByName(toDocumentsXlsx(records)
        .filter(col("extract_ok")).drop("extract_ok"))
      .unionByName(toDocumentsPptx(records)
        .filter(col("extract_ok")).drop("extract_ok"))
      .unionByName(toDocumentsSubtitles(records)
        .filter(col("extract_ok")).drop("extract_ok"))
      .unionByName(toDocumentsEpub(records)
        .filter(col("extract_ok")).drop("extract_ok"))
      .unionByName(toDocumentsArchive(records)
        .filter(col("extract_ok")).drop("extract_ok"))
      .unionByName(toDocumentsRtf(records)
        .filter(col("extract_ok")).drop("extract_ok"))
      .unionByName(toDocumentsCsv(records)
        .filter(col("extract_ok")).drop("extract_ok"))
      .unionByName(toDocumentsEml(records)
        .filter(col("extract_ok")).drop("extract_ok"))
      .unionByName(toDocumentsMbox(records)
        .filter(col("extract_ok")).drop("extract_ok"))
      .unionByName(toDocumentsFeed(records)
        .filter(col("extract_ok")).drop("extract_ok"))
      .unionByName(toDocumentsTex(records)
        .filter(col("extract_ok")).drop("extract_ok"))
      .unionByName(toDocumentsMarkdown(records)
        .filter(col("extract_ok")).drop("extract_ok"))
      .unionByName(toDocumentsIcs(records)
        .filter(col("extract_ok")).drop("extract_ok"))
      .unionByName(toDocumentsOdf(records)
        .filter(col("extract_ok")).drop("extract_ok"))
      .unionByName(toDocumentsSqlite(records)
        .filter(col("extract_ok")).drop("extract_ok"))
      .unionByName(toDocumentsJson(records)
        .filter(col("extract_ok")).drop("extract_ok"))
      .unionByName(toDocumentsMhtml(records)
        .filter(col("extract_ok")).drop("extract_ok").drop("n_resources"))
      .unionByName(
        if (detectCharsets) toDocumentsTextDetected(records)
          .drop("charset", "charset_margin")
        else toDocumentsText(records))

  /** Sequential record walk over one archive. Malformed framing never
    * throws: the offending record surfaces with `framing_ok = false`
    * and the walk stops (nothing after a framing break is trustworthy —
    * a sequential reader would be lost too).
    *
    * Gzipped archives walk their members explicitly so every record
    * carries its member's COMPRESSED offset (`gz_offset`) and its
    * member-relative decompressed `offset` — the (filename, offset)
    * pair a CDX index needs for true random access over the Annex D
    * record-per-member layout. Members are still CONCATENATED before
    * the record walk (a rewritten archive may span a record across
    * members; the walk must not care), then each record's global
    * position maps back to its containing member. */
  private[io] def parseWarcBytes(path: String, raw: Array[Byte]): Iterator[WarcRecord] = {
    if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b) {
      // a truncated/corrupt .warc.gz is malformed FRAMING, and the
      // documented contract for that is a framing_ok = false row — not
      // an executor exception killing the whole archive scan
      val members =
        try gunzipMembers(raw) catch {
          case _: Exception => return Iterator.single(WarcRecord(
            path, 0, null, null, null, -1L, null, null,
            Array.emptyByteArray, framing_ok = false))
        }
      val total = members.iterator.map(_._2.length.toLong).sum
      if (total > Int.MaxValue) return Iterator.single(WarcRecord(
        path, 0, null, null, null, -1L, null, null,
        Array.emptyByteArray, framing_ok = false))
      val buf = new Array[Byte](total.toInt)
      val compStarts = new Array[Long](members.length)
      val decompStarts = new Array[Long](members.length)
      var at = 0
      var m = 0
      while (m < members.length) {
        compStarts(m) = members(m)._1
        decompStarts(m) = at.toLong
        System.arraycopy(members(m)._2, 0, buf, at, members(m)._2.length)
        at += members(m)._2.length
        m += 1
      }
      parseWarcBuffer(path, buf).map { r =>
        if (r.offset < 0) r
        else {
          // the member whose decompressed span contains the record start
          var lo = 0
          var hi = members.length - 1
          while (lo < hi) {
            val mid = (lo + hi + 1) >>> 1
            if (decompStarts(mid) <= r.offset) lo = mid else hi = mid - 1
          }
          r.copy(offset = r.offset - decompStarts(lo),
            gz_offset = compStarts(lo))
        }
      }
    } else parseWarcBuffer(path, raw)
  }

  /** The record walk proper, over already-decompressed bytes; `offset`
    * is buffer-relative, `gz_offset` always -1 (the gzip wrapper above
    * remaps both). */
  private def parseWarcBuffer(path: String, bytes: Array[Byte]): Iterator[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var i = 0
    var idx = 0
    var broken = false
    while (!broken && i < bytes.length) {
      // skip inter-record CRLFs
      while (i < bytes.length && (bytes(i) == '\r' || bytes(i) == '\n')) i += 1
      if (i >= bytes.length) return out.iterator
      val recStart = i.toLong
      val hdrEnd = indexOfCrlfCrlf(bytes, i)
      val versionOk = startsWith(bytes, i, "WARC/")
      if (!versionOk || hdrEnd < 0) {
        out += WarcRecord(path, idx, null, null, null, -1L, null, null,
          Array.emptyByteArray, framing_ok = false)
        broken = true
      } else {
        val headers = new String(bytes, i, hdrEnd - i,
          java.nio.charset.StandardCharsets.UTF_8)
        def h(name: String): String = {
          val m = ("(?mi)^" + java.util.regex.Pattern.quote(name) +
            ": ([^\\r\\n]*)").r.findFirstMatchIn(headers)
          m.map(_.group(1).trim).filter(_.nonEmpty).orNull
        }
        val wtype = h("WARC-Type")
        val uri = h("WARC-Target-URI")
        val date = h("WARC-Date")
        // record segmentation (WARC 1.1 §5.18): the first segment keeps
        // the original type with WARC-Segment-Number: 1; later segments
        // are `continuation` records pointing at it; the LAST carries
        // the logical block's total length. Carried verbatim —
        // reassembly is [[reassembleSegments]]' business.
        val segNumber = Option(h("WARC-Segment-Number"))
          .flatMap(_.toIntOption).map(Integer.valueOf).orNull
        val segOrigin = h("WARC-Segment-Origin-ID")
        val segTotal = Option(h("WARC-Segment-Total-Length"))
          .flatMap(_.toLongOption).map(java.lang.Long.valueOf).orNull
        // §5.13: a crawler that cut the capture short says so and why
        // (length/time/disconnect/unspecified) — carried verbatim, the
        // partial-payload warning every consumer can filter on
        val truncated = h("WARC-Truncated")
        // the crawl-time payload identity (`sha1:<base32>`, WARC 1.1
        // §5.9) — what revisit records point at; carried verbatim
        val digest = h("WARC-Payload-Digest")
        // record identity + the request/metadata → response link
        // (WARC 1.1 §5.1/§5.7) — the provenance catalog's join keys
        val recordId = h("WARC-Record-ID")
        val concurrentTo = h("WARC-Concurrent-To")
        val clen = Option(h("Content-Length")).flatMap(_.toLongOption).getOrElse(-1L)
        val blockStart = hdrEnd + 4
        // clen must fit an Int BEFORE any arithmetic: a hostile header near
        // Long.MaxValue overflows `blockStart + clen` negative (passing the
        // bound check) and then wraps in `.toInt` — surface it as the
        // documented framing_ok = false row, never an executor exception
        val ok = clen >= 0 && clen <= Int.MaxValue &&
          blockStart + clen <= bytes.length
        if (!ok) {
          out += WarcRecord(path, idx, wtype, uri, date, clen, null, null,
            Array.emptyByteArray, framing_ok = false)
          broken = true
        } else {
          val block = java.util.Arrays.copyOfRange(bytes, blockStart,
            blockStart + clen.toInt)
          // response records embed an HTTP message: status line + headers
          // + CRLF CRLF + body. Revisit records (WARC 1.1 §6.7.2,
          // identical-payload-digest profile) carry the re-fetch's HTTP
          // headers with NO body — same head parse, empty payload.
          var status: Integer = null
          var ctype: String = null
          var location: String = null
          var disposition: String = null
          var etag: String = null
          var lastModified: String = null
          var cacheControl: String = null
          var expires: String = null
          var httpDate: String = null
          var retryAfter: String = null
          var payload = block
          // a SEGMENTED record's block is a partial slice of the
          // logical block — parsing an HTTP head or reversing codings
          // over a fragment would corrupt it; segments stay opaque
          // until reassembly
          if (segNumber == null && (wtype == "response" || wtype == "revisit")) {
            val he = indexOfCrlfCrlf(block, 0)
            if (he >= 0 && startsWith(block, 0, "HTTP/")) {
              val head = new String(block, 0, he,
                java.nio.charset.StandardCharsets.UTF_8)
              val lines = head.split("\r\n")
              status = lines.head.split(" ").lift(1)
                .flatMap(_.toIntOption).map(Integer.valueOf).orNull
              ctype = lines.tail.collectFirst {
                case l if l.toLowerCase.startsWith("content-type:") =>
                  l.substring("content-type:".length).trim
              }.orNull
              // 3xx responses carry the redirect target — a frontier
              // edge the crawler followed; surfaced verbatim (resolution
              // against the fetched URI is redirectEdges' business)
              location = lines.tail.collectFirst {
                case l if l.toLowerCase.startsWith("location:") =>
                  l.substring("location:".length).trim
              }.filter(_.nonEmpty).orNull
              // routing + recrawl headers, verbatim: Content-Disposition
              // (the filename hint sniffTypes falls back to), ETag and
              // Last-Modified (the conditional-refetch validators)
              def h1(name: String): String = lines.tail.collectFirst {
                case l if l.toLowerCase.startsWith(name + ":") =>
                  l.substring(name.length + 1).trim
              }.filter(_.nonEmpty).orNull
              disposition = h1("content-disposition")
              etag = h1("etag")
              lastModified = h1("last-modified")
              // RFC 9111 freshness inputs, verbatim: explicit lifetime
              // (Cache-Control max-age / Expires anchored at Date)
              // beats the recrawl heuristic downstream
              cacheControl = h1("cache-control")
              expires = h1("expires")
              httpDate = h1("date")
              // RFC 9110 §10.2.3: the server's own backoff hint on
              // 429/503 — the politeness scheduler honors it
              retryAfter = h1("retry-after")
              payload = java.util.Arrays.copyOfRange(block, he + 4, block.length)
              // HTTP Transfer-Encoding: crawlers archive the WIRE bytes,
              // so a `Transfer-Encoding: chunked` response's body still
              // carries the chunk framing (hex size lines, extensions,
              // trailers — RFC 9112 §7.1). Reverse the transfer codings
              // FIRST (they were applied last on the wire), then the
              // entity's Content-Encoding below. Malformed chunk framing
              // passes through RAW — same contract as a truncated gzip:
              // downstream gates arbitrate garbage, the reader never
              // silently drops bytes.
              val tenc = lines.tail.collectFirst {
                case l if l.toLowerCase.startsWith("transfer-encoding:") =>
                  l.substring("transfer-encoding:".length).trim.toLowerCase
              }.getOrElse("")
              if (tenc.nonEmpty) {
                val codings = tenc.split(",").map(_.trim).filter(_.nonEmpty)
                var rest = codings
                if (codings.lastOption.contains("chunked")) {
                  payload = try dechunk(payload)
                    catch { case _: Exception => payload }
                  rest = codings.dropRight(1)
                }
                // remaining transfer codings, reverse application order;
                // an unknown coding stops the peel (bytes stay as-is)
                var k = rest.length - 1
                var stop = false
                while (k >= 0 && !stop) {
                  rest(k) match {
                    case "gzip" | "x-gzip" => payload =
                      try gunzip(payload) catch { case _: Exception => payload }
                    case "deflate" => payload =
                      try inflateHttp(payload) catch { case _: Exception => payload }
                    case "identity" => ()
                    case _ => stop = true
                  }
                  k -= 1
                }
              }
              // HTTP Content-Encoding: real crawls carry gzip/deflate
              // bodies (the server compressed them; the crawler archived
              // the wire bytes). Decode here so every bridge downstream
              // (HTML strip, PDF extract, media codecs) sees entity
              // bytes. A body that fails to decompress (truncated
              // transfer) passes through RAW — the quality/codec gates
              // downstream are the arbiters of garbage, and dropping
              // bytes in the reader would be silent data loss.
              val cenc = lines.tail.collectFirst {
                case l if l.toLowerCase.startsWith("content-encoding:") =>
                  l.substring("content-encoding:".length).trim.toLowerCase
              }.getOrElse("")
              if (cenc == "gzip" || cenc == "x-gzip")
                payload = try gunzip(payload) catch { case _: Exception => payload }
              else if (cenc == "deflate")
                payload = try inflateHttp(payload) catch { case _: Exception => payload }
              else if (cenc == "br")
                // RFC 7932 via the pure-JVM decoder; 1 GiB bomb guard
                // (the per-record degrade contract of the codec layer)
                payload = try graft.operators.Brotli.decompress(payload, 1L << 30)
                  catch { case _: Exception => payload }
            }
          }
          // record terminator: two CRLFs (or clean end-of-file)
          val termAt = blockStart + clen.toInt
          val term = termAt == bytes.length ||
            (termAt + 4 <= bytes.length && bytes(termAt) == '\r' &&
              bytes(termAt + 1) == '\n' && bytes(termAt + 2) == '\r' &&
              bytes(termAt + 3) == '\n')
          out += WarcRecord(path, idx, wtype, uri, date, clen, status, ctype,
            payload, framing_ok = term, payload_digest = digest,
            http_location = location, record_id = recordId,
            concurrent_to = concurrentTo, http_disposition = disposition,
            http_etag = etag, http_last_modified = lastModified,
            // record start in the DECOMPRESSED archive byte stream —
            // the CDX offset at the member grain this reader works at
            offset = recStart, seg_number = segNumber,
            seg_origin_id = segOrigin, seg_total_length = segTotal,
            http_cache_control = cacheControl, http_expires = expires,
            http_date = httpDate, truncated = truncated,
            http_retry_after = retryAfter)
          if (!term) broken = true
          i = termAt + 4
        }
      }
      idx += 1
    }
    out.iterator
  }

  private def startsWith(b: Array[Byte], at: Int, s: String): Boolean = {
    if (at + s.length > b.length) return false
    var k = 0
    while (k < s.length) {
      if (b(at + k) != s.charAt(k)) return false
      k += 1
    }
    true
  }

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 4 <= b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** HTTP `deflate` body: zlib-wrapped per the RFC, but some servers
    * (historically IIS) send raw DEFLATE — try zlib first, fall back. */
  private def inflateHttp(raw: Array[Byte]): Array[Byte] = {
    def run(nowrap: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(nowrap)
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream(raw.length * 4)
      val buf = new Array[Byte](64 * 1024)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (!inf.finished())
          throw new java.util.zip.DataFormatException("stalled inflate")
      }
      require(inf.finished(), "truncated deflate body")
      inf.end()
      out.toByteArray
    }
    try run(nowrap = false) catch { case _: Exception => run(nowrap = true) }
  }

  /** Concatenated-member gzip (the `.warc.gz` record-level layout —
    * GZIPInputStream consumes all members). */
  private def gunzip(raw: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(raw))
    val out = new java.io.ByteArrayOutputStream(raw.length * 4)
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** Walk a concatenated-member gzip stream (RFC 1952) keeping MEMBER
    * boundaries: one `(compressed member start, inflated bytes)` per
    * member, CRC32 and ISIZE verified like GZIPInputStream would.
    * Boundaries are what make the Annex D record-per-member layout
    * randomly addressable — the whole point of the interchange format. */
  private[io] def gunzipMembers(raw: Array[Byte]): IndexedSeq[(Long, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    var i = 0
    while (i < raw.length) {
      val start = i
      require(i + 10 <= raw.length && (raw(i) & 0xff) == 0x1f &&
        (raw(i + 1) & 0xff) == 0x8b, "gzip: bad member magic")
      require(raw(i + 2) == 8, "gzip: unsupported compression method")
      val flg = raw(i + 3) & 0xff
      i += 10
      if ((flg & 4) != 0) { // FEXTRA
        require(i + 2 <= raw.length, "gzip: truncated FEXTRA")
        i += 2 + ((raw(i) & 0xff) | ((raw(i + 1) & 0xff) << 8))
      }
      if ((flg & 8) != 0) { while (i < raw.length && raw(i) != 0) i += 1; i += 1 }
      if ((flg & 16) != 0) { while (i < raw.length && raw(i) != 0) i += 1; i += 1 }
      if ((flg & 2) != 0) i += 2 // FHCRC
      require(i <= raw.length, "gzip: truncated member header")
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(raw, i, raw.length - i)
      val bos = new java.io.ByteArrayOutputStream(64 * 1024)
      val buf = new Array[Byte](64 * 1024)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) bos.write(buf, 0, n)
        else if (!inf.finished())
          throw new java.util.zip.DataFormatException("gzip: stalled inflate")
      }
      i += (raw.length - i) - inf.getRemaining
      inf.end()
      require(i + 8 <= raw.length, "gzip: truncated member trailer")
      val data = bos.toByteArray
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      def le32(at: Int): Long =
        (raw(at) & 0xffL) | ((raw(at + 1) & 0xffL) << 8) |
          ((raw(at + 2) & 0xffL) << 16) | ((raw(at + 3) & 0xffL) << 24)
      require(le32(i) == crc.getValue, "gzip: member CRC mismatch")
      require(le32(i + 4) == (data.length.toLong & 0xffffffffL),
        "gzip: member ISIZE mismatch")
      i += 8
      out += ((start.toLong, data))
    }
    out.toIndexedSeq
  }
}
