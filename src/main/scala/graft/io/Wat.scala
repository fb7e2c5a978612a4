package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WAT metadata sidecars — the third leg of the Common Crawl triple
  * (WARC + WAT + WET): one JSON envelope per record describing the
  * capture WITHOUT its payload — the WARC headers, the parsed HTTP
  * response headers, and (for HTML) the page's raw outlinks — so a
  * metadata-only consumer (link-graph builds, header analytics, crawl
  * accounting) fetches the kilobyte sidecar and never touches the
  * payload archive. The envelope follows the Common Crawl WAT shape:
  * `Envelope.WARC-Header-Metadata` (including `WARC-Concurrent-To`,
  * the §5.7 link tying a request/metadata record to its response),
  * `Envelope.Payload-Metadata.HTTP-Response-Metadata.{Headers,
  * HTML-Metadata.Links}` (links as `{url, text}` objects, hrefs RAW as
  * written in the page — resolution is the consumer's business,
  * [[Warc.frontierLinks]]' job when wanted), `Envelope.Payload-Metadata
  * .HTTP-Request-Metadata.{Method, Headers.User-Agent}` for `request`
  * records (the crawl-accounting half of the sidecar — WHO asked and
  * HOW, parsed from the embedded request head), and
  * `Container.{Filename, Offset, Gz-Offset}` carrying the
  * [[Warc.WarcRecord]] addressing pair so a WAT row can fetch its
  * record back through [[Warc.readWarcRecordsAt]].
  *
  * Scale shape: [[watFromWarc]] is a narrow pass over the record scan —
  * header columns plus the codegen'd link extraction and two request-
  * head regex pulls, zero shuffle, parallelism follows the archive
  * files; [[writeWat]] serializes per-partition through the strict RFC
  * 8259 kernel's [[graft.operators.Json.quote]]; [[readWat]] parses
  * back strict PER LINE with the house tolerant-bridge flag (a
  * malformed line degrades to its own `ok = false` row carrying the
  * raw line, never failing siblings — the [[Cdx.readCdxj]] contract). */
object Wat {

  /** One extracted link, Common Crawl field names. */
  final case class WatLink(url: String, text: String)

  /** The typed row [[readWat]] yields (public: generated code must
    * reach the field accessors). */
  final case class WatRow(
      warc_type: String, url: String, warc_date: String,
      content_length: java.lang.Long, status: Integer,
      content_type: String, location: String, links: Seq[WatLink],
      method: String, user_agent: String, concurrent_to: String,
      filename: String, offset: java.lang.Long,
      gz_offset: java.lang.Long, ok: Boolean)

  /** Metadata rows from a record scan: every framing-clean record (the
    * triple's request/metadata/warcinfo records describe the crawl too,
    * so they are NOT filtered to responses); HTML responses carry their
    * raw outlink list, everything else a null `links`; `request`
    * records carry the method and User-Agent parsed from their embedded
    * HTTP request head (ASCII by RFC 9112 — the binary payload decodes
    * as UTF-8 for the two header pulls only), plus the
    * `WARC-Concurrent-To` response link every non-response type may
    * bear. */
  def watFromWarc(records: Dataset[Warc.WarcRecord]): DataFrame = {
    import graft.functions.TextFunctions
    val isHtml = Warc.mimeOf(col("http_content_type")) === "text/html"
    val isReq = col("warc_type") === "request"
    val reqHead = col("payload").cast("string")
    records.toDF()
      .filter(col("framing_ok") && col("warc_type").isNotNull)
      .select(
        col("warc_type"),
        col("target_uri").as("url"),
        col("warc_date"),
        when(col("content_length") >= 0, col("content_length"))
          .as("content_length"),
        col("http_status").as("status"),
        col("http_content_type").as("content_type"),
        col("http_location").as("location"),
        when(col("warc_type") === "response" && isHtml,
          TextFunctions.htmlLinks(
            Warc.decodePayload(col("payload"), col("http_content_type"))))
          .as("links"),
        when(isReq, nullif(
          regexp_extract(reqHead, "^([A-Z]+) ", 1), lit(""))).as("method"),
        when(isReq, nullif(trim(
          regexp_extract(reqHead, "(?mi)^User-Agent:[ \\t]*([^\\r\\n]*)", 1)),
          lit(""))).as("user_agent"),
        col("concurrent_to"),
        col("path").as("filename"),
        col("offset"),
        when(col("gz_offset") >= 0, col("gz_offset")).as("gz_offset"))
  }

  /** Serialize [[watFromWarc]] rows as WAT JSON lines. Null fields are
    * OMITTED (the envelope describes what the record had, not a fixed
    * schema); `Headers` / `HTML-Metadata` appear only when the record
    * carried an HTTP head / extracted links, `HTTP-Request-Metadata`
    * only on request records with a parseable head, `WARC-Concurrent-To`
    * only where the record bore the link. */
  def writeWat(records: Dataset[Warc.WarcRecord], dir: String): Unit = {
    import records.sparkSession.implicits._
    import graft.operators.Json.quote
    watFromWarc(records)
      .map { r =>
        def kv(k: String, v: String): String = s"${quote(k)}:$v"
        val warcHdr = Seq(
          Option(r.getString(0)).map(v => kv("WARC-Type", quote(v))),
          Option(r.getString(1)).map(v => kv("WARC-Target-URI", quote(v))),
          Option(r.getString(2)).map(v => kv("WARC-Date", quote(v))),
          Option(r.getString(10)).map(v => kv("WARC-Concurrent-To", quote(v))),
          (if (r.isNullAt(3)) None
           else Some(kv("Content-Length", r.getLong(3).toString))))
          .flatten.mkString("{", ",", "}")
        val headers = Seq(
          (if (r.isNullAt(4)) None
           else Some(kv("Status", r.getInt(4).toString))),
          Option(r.getString(5)).map(v => kv("Content-Type", quote(v))),
          Option(r.getString(6)).map(v => kv("Location", quote(v)))).flatten
        val links =
          if (r.isNullAt(7)) None
          else Some(r.getSeq[org.apache.spark.sql.Row](7).map { l =>
            Seq(Option(l.getString(0)).map(v => kv("url", quote(v))),
              Option(l.getString(1)).map(v => kv("text", quote(v))))
              .flatten.mkString("{", ",", "}")
          }.mkString("[", ",", "]"))
        val respParts = scala.collection.mutable.ArrayBuffer.empty[String]
        if (headers.nonEmpty)
          respParts += kv("Headers", headers.mkString("{", ",", "}"))
        links.foreach(ls =>
          respParts += kv("HTML-Metadata", s"{${kv("Links", ls)}}"))
        // the request face: method + the User-Agent header map — what a
        // crawl-accounting consumer reads (Common Crawl's request shape)
        val reqParts = Seq(
          Option(r.getString(8)).map(v => kv("Method", quote(v))),
          Option(r.getString(9)).map(v =>
            kv("Headers", s"{${kv("User-Agent", quote(v))}}"))).flatten
        val payloadParts = scala.collection.mutable.ArrayBuffer.empty[String]
        if (respParts.nonEmpty)
          payloadParts += kv("HTTP-Response-Metadata",
            respParts.mkString("{", ",", "}"))
        if (reqParts.nonEmpty)
          payloadParts += kv("HTTP-Request-Metadata",
            reqParts.mkString("{", ",", "}"))
        val payloadMeta =
          if (payloadParts.isEmpty) ""
          else "," + kv("Payload-Metadata",
            payloadParts.mkString("{", ",", "}"))
        val container = Seq(
          Option(r.getString(11)).map(v => kv("Filename", quote(v))),
          (if (r.isNullAt(12)) None
           else Some(kv("Offset", r.getLong(12).toString))),
          (if (r.isNullAt(13)) None
           else Some(kv("Gz-Offset", r.getLong(13).toString))))
          .flatten.mkString("{", ",", "}")
        s"{${kv("Envelope",
          s"{${kv("WARC-Header-Metadata", warcHdr)}$payloadMeta}")}," +
          s"${kv("Container", container)}}"
      }
      .write.mode("overwrite").text(dir)
  }

  /** Frontier edges from the WAT sidecar ALONE — the metadata-only
    * consumer path: link analytics (pageRank / hostRank / anchorTexts)
    * that fetches the link-scale WAT instead of the payload-scale
    * WARC, the reason Common Crawl publishes the sidecar at all. Raw
    * hrefs resolve against the page URL and canonicalize through the
    * same kernels as [[graft.io.Warc.frontierLinks]], so WARC-derived
    * and WAT-derived edges share one URL identity. One documented
    * divergence: a `<base href>` override is visible only on the WARC
    * path — the WAT envelope stores the page URI and raw hrefs (the
    * Common Crawl shape), so base-tagged pages' relative links resolve
    * against the page URL here. Narrow per-row work, zero shuffle. */
  def watOutlinks(wat: DataFrame): DataFrame = {
    import graft.expressions.NativeUrl
    wat.filter(col("ok") && col("warc_type") === "response" &&
        col("links").isNotNull && col("url").isNotNull)
      .select(col("url"), explode(col("links")).as("link"))
      .select(
        NativeUrl.canonicalizeUrl(col("url")).as("from_url"),
        NativeUrl.resolveUrl(col("url"), col("link.url")).as("to_url"),
        col("link.text").as("anchor"))
      .filter(col("to_url").isNotNull)
  }

  /** Parse WAT lines back to typed rows; `ok = false` flags a malformed
    * line (bad JSON, missing envelope, mis-typed field) without failing
    * siblings — the flagged row carries the raw line in `filename`. */
  def readWat(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Json
    import graft.operators.Json.{JArr, JNum, JObj, JStr, JVal}
    spark.read.textFile(path)
      .map { line =>
        try {
          def asObj(v: Option[JVal], what: String): Map[String, JVal] =
            v match {
              case Some(JObj(fs)) => fs.toMap
              case None => Map.empty
              case _ => throw new IllegalArgumentException(s"$what not an object")
            }
          def str(m: Map[String, JVal], k: String): String = m.get(k) match {
            case Some(JStr(v)) => v
            case None => null
            case _ => throw new IllegalArgumentException(s"$k not a string")
          }
          def num(m: Map[String, JVal], k: String): java.lang.Long =
            m.get(k) match {
              case Some(JNum(v)) =>
                v.toLongOption.map(java.lang.Long.valueOf).getOrElse(
                  throw new IllegalArgumentException(s"$k not integral"))
              case None => null
              case _ => throw new IllegalArgumentException(s"$k not a number")
            }
          val root = Json.parse(line) match {
            case JObj(fs) => fs.toMap
            case _ => throw new IllegalArgumentException("line not an object")
          }
          val env = asObj(root.get("Envelope"), "Envelope")
          require(env.nonEmpty, "missing Envelope")
          val wh = asObj(env.get("WARC-Header-Metadata"), "WARC-Header-Metadata")
          val pm = asObj(env.get("Payload-Metadata"), "Payload-Metadata")
          val resp = asObj(pm.get("HTTP-Response-Metadata"),
            "HTTP-Response-Metadata")
          val req = asObj(pm.get("HTTP-Request-Metadata"),
            "HTTP-Request-Metadata")
          val hdrs = asObj(resp.get("Headers"), "Headers")
          val reqHdrs = asObj(req.get("Headers"), "Headers")
          val links = asObj(resp.get("HTML-Metadata"), "HTML-Metadata")
            .get("Links") match {
              case Some(JArr(items)) => items.map {
                case JObj(fs) =>
                  val m = fs.toMap
                  WatLink(str(m, "url"), str(m, "text"))
                case _ => throw new IllegalArgumentException("link not an object")
              }
              case None => null
              case _ => throw new IllegalArgumentException("Links not an array")
            }
          val cont = asObj(root.get("Container"), "Container")
          WatRow(str(wh, "WARC-Type"), str(wh, "WARC-Target-URI"),
            str(wh, "WARC-Date"), num(wh, "Content-Length"),
            Option(num(hdrs, "Status")).map(v => Integer.valueOf(v.toInt))
              .orNull,
            str(hdrs, "Content-Type"), str(hdrs, "Location"), links,
            str(req, "Method"), str(reqHdrs, "User-Agent"),
            str(wh, "WARC-Concurrent-To"),
            str(cont, "Filename"), num(cont, "Offset"),
            num(cont, "Gz-Offset"), ok = true)
        } catch {
          case _: Exception => WatRow(null, null, null, null, null, null,
            null, null, null, null, null, line, null, null, ok = false)
        }
      }
      .toDF()
  }
}
