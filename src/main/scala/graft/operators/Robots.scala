package graft.operators

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Locale

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, StructField, StructType}

import scala.collection.mutable.ArrayBuffer

/** robots.txt parsing and URL-frontier filtering — the crawl-politeness
  * operator a 100 TB ingestion pipeline runs BEFORE fetching: which of
  * these ten billion frontier URLs may this agent crawl, given the
  * per-host rule files already on hand.
  *
  * The grammar is the REP (RFC 9309) subset crawlers agree on: `#`
  * comments, `user-agent` group headers (several per group, values
  * case-insensitive, substring product-token match with `*` as the
  * catch-all), `allow`/`disallow` rules with `*` wildcards and the `$`
  * end anchor. Decision for a path: the group whose agent line matches
  * MOST SPECIFICALLY (longest matching token; `*` is specificity 0),
  * then the matching rule with the LONGEST pattern wins, allow winning
  * length ties — the published RFC 9309 semantics. No matching rule
  * (or no matching group, or an empty disallow value) is allow: REP is
  * deny-by-exception.
  *
  * [[filterAllowed]] is the distributed face: frontier ⋈ rule files on
  * host (hash join — rule files are per-host and small, the frontier
  * is the big side; AQE handles host skew), then a narrow
  * per-partition decision pass that parses each host's rules ONCE per
  * partition (memoized — the join co-locates a host's URLs, so the
  * parse amortizes across them). URLs whose host carries no rule file
  * pass allowed, the crawl default; a rule file that fails to parse
  * denies its whole host (fail-closed — a host whose policy cannot be
  * read should not be crawled). */
object Robots {

  /** One rule: allow/deny + its pattern (`*` wildcards, optional `$`
    * anchor); specificity is the pattern's length. */
  final case class Rule(allow: Boolean, pattern: String) {
    @transient lazy val rx: java.util.regex.Pattern = compile(pattern)
  }

  /** One user-agent group: agent tokens and rules, in file order;
    * `crawlDelay` carries the group's de-facto `Crawl-delay:` seconds
    * when present (not part of RFC 9309, but the politeness extension
    * large crawlers honor). */
  final case class Group(agents: Seq[String], rules: Seq[Rule],
      crawlDelay: Option[Double] = None)

  /** A rule pattern as a compiled prefix matcher: literal chunks
    * between `*`s, `$` forcing end-of-path; used via `lookingAt` so an
    * unanchored pattern matches any path PREFIX. */
  private[graft] def compile(pattern: String): java.util.regex.Pattern = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val rx = p.split("\\*", -1)
      .map(c => if (c.isEmpty) "" else java.util.regex.Pattern.quote(c))
      .mkString(".*") + (if (anchored) "$" else "")
    java.util.regex.Pattern.compile(rx)
  }

  /** Parse a robots.txt payload into groups. Unknown directives
    * (crawl-delay, sitemap, …) are extensions, not access rules —
    * skipped; a rule line before any user-agent line, or a line
    * without a colon, is a framing error (fail loudly, the codec
    * contract — the distributed face maps that to fail-closed). */
  def parseRobots(bytes: Array[Byte], mediaId: Long = -1L): Seq[Group] = {
    val groups = ArrayBuffer.empty[(ArrayBuffer[String], ArrayBuffer[Rule])]
    val delays = ArrayBuffer.empty[Option[Double]]
    var openAgents = false // consecutive user-agent lines extend one group
    for (raw <- new String(bytes, UTF_8).split("\n", -1)) {
      val line = { val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw }.trim
      if (line.nonEmpty) {
        val c = line.indexOf(':')
        require(c > 0, s"media $mediaId: malformed robots.txt line")
        val key = line.substring(0, c).trim.toLowerCase(Locale.ROOT)
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (!openAgents) {
              groups += ((ArrayBuffer.empty, ArrayBuffer.empty))
              delays += None
            }
            groups(groups.length - 1)._1 += value.toLowerCase(Locale.ROOT)
            openAgents = true
          case "allow" | "disallow" =>
            require(groups.nonEmpty,
              s"media $mediaId: robots.txt rule before any user-agent line")
            openAgents = false
            // an empty disallow means "allow everything": a no-op rule
            // under deny-by-exception, recorded as nothing
            if (value.nonEmpty)
              groups(groups.length - 1)._2 += Rule(key == "allow", value)
          case "crawl-delay" =>
            // politeness extension: kept on the group when parseable
            // and positive; nonsense values are skipped like any other
            // unknown directive, never an error
            openAgents = false
            if (groups.nonEmpty)
              value.toDoubleOption.filter(d => d > 0 && d.isFinite)
                .foreach(d => delays(delays.length - 1) = Some(d))
          case _ => openAgents = false // extension directive: skipped
        }
      }
    }
    groups.zip(delays)
      .map { case ((a, r), d) => Group(a.toSeq, r.toSeq, d) }.toSeq
  }

  /** The `Crawl-delay` seconds that apply to `agent` — from the
    * group(s) matching at the winning specificity (the SAME group
    * selection as [[isAllowed]]); when several merged groups carry
    * delays, the MAXIMUM wins (the conservative politeness read).
    * None when no matching group declares one. */
  def crawlDelay(groups: Seq[Group], agent: String): Option[Double] = {
    val a = agent.toLowerCase(Locale.ROOT)
    def groupSpec(g: Group): Int = {
      var best = -1
      for (tok <- g.agents) {
        val spec =
          if (tok == "*") 0
          else if (a.contains(tok)) tok.length
          else -1
        if (spec > best) best = spec
      }
      best
    }
    val specs = groups.map(groupSpec)
    val bestSpec = if (specs.isEmpty) -1 else specs.max
    if (bestSpec < 0) return None
    val ds = groups.zip(specs)
      .collect { case (g, s) if s == bestSpec => g.crawlDelay }
      .flatten
    if (ds.isEmpty) None else Some(ds.max)
  }

  /** Per-host politeness delays for `agent` over the rule corpus —
    * one `(host, delay_s)` row per rule file, `defaultDelayS` when the
    * file declares none for this agent or fails to parse (scheduling
    * assumes the ALLOWED filter already ran; politeness needs a delay
    * either way). One narrow pass, hosts-scale output. */
  def hostDelays(robots: Dataset[(String, Array[Byte])], agent: String,
      defaultDelayS: Double = 1.0): DataFrame = {
    import robots.sparkSession.implicits._
    robots.map { case (h, b) =>
      val d =
        try crawlDelay(parseRobots(b), agent)
        catch { case _: Exception => None }
      (h, d.getOrElse(defaultDelayS))
    }.toDF("host", "delay_s")
  }

  /** Politeness schedule over a frontier: every URL gains its host's
    * `delay_s` and a `fetch_at_s` slot — (per-host fetch rank − 1) ×
    * delay, URLs ranked in URL order (deterministic). The plan is the
    * frontier joined to the hosts-scale delay table (broadcastable;
    * AQE picks the shuffled join past that) plus ONE host-partitioned
    * rank window — the same per-host grain a real fetcher schedules
    * at.
    *
    * `maxPerHost > 0` is the hot-host defense, IN the operator:
    * [[Sampling.capPerGroup]] bounds every host's frontier BEFORE the
    * rank window, so a pathologically hot host (one domain holding a
    * third of the frontier — the Zipfian reality) contributes at most
    * `maxPerHost` rows to its window partition instead of serializing
    * the stage. The cap is also the POLITENESS truth: a host with a
    * 1 s delay yields at most 86,400 fetches/day, so scheduling
    * millions of its URLs in one cycle is wasted frontier — cap at
    * the crawl cycle's per-host fetch budget. 0 = uncapped (the
    * caller owns frontier shaping). */
  /** Per-host backoff horizons from the PRIOR crawl's rate-limit
    * answers — RFC 9110 §10.2.3: a 429 (Too Many Requests) or 503
    * (Service Unavailable) response's `Retry-After` is the server's
    * own politeness instruction, in either published form (delta
    * seconds, or an HTTP-date the backoff derives from by subtracting
    * the capture time — [[HttpDate.httpTs]], all three RFC 9110 forms
    * including the obsolete RFC 850 and asctime dates, zone-parsed,
    * the RFC 850 fifty-year rule anchored at the capture time, and
    * clock-skew-safe: a date in the past floors at 0). A rate-limit
    * response WITHOUT the header still means "slow down":
    * `defaultBackoffS`. One max per host — the most conservative hint
    * wins. Narrow projection + one host-keyed partial-agg shuffle over
    * only the 429/503 rows (a vanishing fraction of a healthy crawl). */
  def backoffHosts(records: org.apache.spark.sql.Dataset[graft.io.Warc.WarcRecord],
      defaultBackoffS: Double = 60.0): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    def httpTs(c: org.apache.spark.sql.Column) =
      HttpDate.httpTs(c, col("fetch_s"))
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull &&
        col("http_status").isin(429, 503))
      .select(
        lower(regexp_extract(col("target_uri"),
          "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?([^/]+)", 1)).as("host"),
        col("http_retry_after").as("ra"),
        unix_timestamp(to_timestamp(col("warc_date"))).as("fetch_s"))
      .withColumn("backoff_s",
        when(col("ra").rlike("^[0-9]+$"),
          col("ra").cast(LongType).cast(DoubleType))
          .when(httpTs(col("ra")).isNotNull && col("fetch_s").isNotNull,
            greatest(httpTs(col("ra")) - col("fetch_s"), lit(0L))
              .cast(DoubleType))
          .otherwise(lit(defaultBackoffS)))
      .groupBy("host").agg(max(col("backoff_s")).as("backoff_s"))
  }

  /** Shift a [[fetchSchedule]] past each host's [[backoffHosts]]
    * horizon: every slot of a backed-off host moves by its backoff
    * (the whole queue waits out the server's hint; slot spacing —
    * the crawl-delay contract — is preserved). The backoff side is
    * hosts-scale against a URLs-scale schedule, and the broadcast
    * hint encodes that contract explicitly (the Decontaminate
    * pattern: a filter-derived small side whose size estimate the
    * planner cannot see). */
  def applyBackoff(schedule: DataFrame, backoff: DataFrame): DataFrame =
    schedule.join(broadcast(backoff), Seq("host"), "left")
      .withColumn("fetch_at_s",
        col("fetch_at_s") + coalesce(col("backoff_s"), lit(0.0)))
      .drop("backoff_s")

  /** Politeness AUDIT — the loop's verification face: given the crawl
    * that actually ran (its archive) and the rule files it ran under,
    * did every host's fetch spacing honor its `Crawl-delay`? Per host:
    * fetch count, the MINIMUM achieved gap between consecutive
    * captures (the violation metric — one burst convicts), the delay
    * the rules demanded (the [[crawlDelay]]/[[hostDelays]] selection,
    * `defaultDelayS` where none), and the verdict. A single-capture
    * host has no gap and audits compliant.
    *
    * Scale shape: one narrow projection over the record scan, ONE
    * host-partitioned window (the fetchSchedule grain — consecutive
    * gaps need the per-host time order; a pathologically hot host
    * sorts in one partition, the honest cost of auditing it), a
    * hosts-scale aggregate, and the hosts-scale delay join. */
  def auditPoliteness(records: org.apache.spark.sql.Dataset[graft.io.Warc.WarcRecord],
      robots: Dataset[(String, Array[Byte])], agent: String,
      defaultDelayS: Double = 1.0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy("fetch_s", "url")
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull && col("warc_date").isNotNull)
      .select(
        lower(regexp_extract(col("target_uri"),
          "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?([^/]+)", 1)).as("host"),
        col("target_uri").as("url"),
        unix_timestamp(to_timestamp(col("warc_date"))).as("fetch_s"))
      .withColumn("gap_s", col("fetch_s") - lag(col("fetch_s"), 1).over(w))
      .groupBy("host")
      .agg(count(lit(1)).as("n_fetches"), min(col("gap_s")).as("min_gap_s"))
      .join(hostDelays(robots, agent, defaultDelayS), Seq("host"), "left")
      .withColumn("delay_s", coalesce(col("delay_s"), lit(defaultDelayS)))
      .withColumn("compliant",
        col("min_gap_s").isNull ||
          col("min_gap_s").cast("double") >= col("delay_s"))
  }

  def fetchSchedule(urls: DataFrame, robots: Dataset[(String, Array[Byte])],
      agent: String, defaultDelayS: Double = 1.0,
      maxPerHost: Int = 0): DataFrame = {
    val hostCol = lower(regexp_extract(col("url"),
      "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?([^/]+)", 1))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy("url")
    val hosted = urls.withColumn("host", hostCol)
    val capped =
      if (maxPerHost > 0)
        Sampling.capPerGroup(hosted, "host", "url", maxPerHost)
          .drop("cap_rank")
      else hosted
    capped
      .join(hostDelays(robots, agent, defaultDelayS), Seq("host"), "left")
      .withColumn("delay_s", coalesce(col("delay_s"), lit(defaultDelayS)))
      .withColumn("fetch_at_s",
        (row_number().over(w) - 1).cast("double") * col("delay_s"))
  }

  /** True when the rule pattern matches a prefix of `path`. */
  private[graft] def patternMatches(pattern: String, path: String): Boolean =
    compile(pattern).matcher(path).lookingAt()

  /** The decision for one path: the most-specific matching agent
    * groups' longest-pattern rule; allow wins ties and no-match.
    *
    * RFC 9309 §2.2.1 requires MERGING all groups that match the same
    * user-agent at the winning specificity — repeated `User-agent: *`
    * blocks are common in the wild, and honoring only the first would
    * fail OPEN on the later blocks' disallow rules. So the combined
    * rule set of every group whose best-matching token ties the
    * winning specificity is evaluated, in file order. */
  def isAllowed(groups: Seq[Group], agent: String, path: String): Boolean = {
    val a = agent.toLowerCase(Locale.ROOT)
    def groupSpec(g: Group): Int = {
      var best = -1
      for (tok <- g.agents) {
        val spec =
          if (tok == "*") 0
          else if (a.contains(tok)) tok.length
          else -1
        if (spec > best) best = spec
      }
      best
    }
    val specs = groups.map(groupSpec)
    val bestSpec = if (specs.isEmpty) -1 else specs.max
    if (bestSpec < 0) return true
    var verdict = true // no matching rule → allow
    var bestLen = -1
    for ((g, spec) <- groups.zip(specs) if spec == bestSpec;
         r <- g.rules if r.rx.matcher(path).lookingAt()) {
      val len = r.pattern.length
      if (len > bestLen || (len == bestLen && r.allow)) {
        bestLen = len; verdict = r.allow
      }
    }
    verdict
  }

  /** The path (+query) component a rule applies to. */
  private[graft] def pathOf(url: String): String = {
    val schemeAt = url.indexOf("://")
    val from = if (schemeAt < 0) 0 else schemeAt + 3
    val slash = url.indexOf('/', from)
    if (slash < 0) "/" else url.substring(slash)
  }

  /** The host component a rule file is keyed by (lowercased, port
    * kept — REP scopes rules to the authority). */
  private[graft] def hostOf(url: String): String = {
    val schemeAt = url.indexOf("://")
    val from = if (schemeAt < 0) 0 else schemeAt + 3
    val slash = url.indexOf('/', from)
    val end = if (slash < 0) url.length else slash
    url.substring(from, end).toLowerCase(Locale.ROOT)
  }

  /** The `Sitemap:` lines of one robots.txt — the sitemaps.org
    * discovery convention: group-independent (they apply file-wide, so
    * the scan ignores user-agent framing), value taken verbatim after
    * the colon (the protocol requires an absolute URL; relative values
    * are the publisher's error and surface as-is for the caller's
    * resolver to judge). Tolerant by contract — a malformed FILE is
    * the distributed face's business; this never throws on directive
    * lines it does not understand. */
  def sitemapsOf(bytes: Array[Byte]): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    for (raw <- new String(bytes, UTF_8).split("\n", -1)) {
      val line = { val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw }.trim
      val c = line.indexOf(':')
      if (c > 0 &&
        line.substring(0, c).trim.toLowerCase(Locale.ROOT) == "sitemap") {
        val v = line.substring(c + 1).trim
        if (v.nonEmpty) out += v
      }
    }
    out.toSeq
  }

  /** Distributed sitemap discovery: per-host robots.txt files →
    * `(host, sitemap_url)` seed rows, each URL canonicalized (the
    * frontier identity shared with every edge list); unreadable or
    * sitemap-less files contribute nothing. One narrow pass over the
    * rule corpus — zero shuffle, seeds-scale output. */
  def sitemapSeeds(robots: Dataset[(String, Array[Byte])]): DataFrame = {
    import robots.sparkSession.implicits._
    import graft.expressions.NativeUrl
    robots
      .flatMap { case (host, bytes) =>
        (try sitemapsOf(bytes) catch { case _: Exception => Seq.empty })
          .map(host -> _) }
      .toDF("host", "sitemap_url")
      .select(col("host"),
        NativeUrl.canonicalizeUrl(col("sitemap_url")).as("sitemap_url"))
  }

  /** Distributed frontier filter: every row of `urls` (must carry a
    * `url` column) gains an `allowed` flag for `agent` under the
    * per-host `robots` rule files (host → robots.txt bytes). */
  def filterAllowed(urls: DataFrame, robots: Dataset[(String, Array[Byte])],
      agent: String): DataFrame = {
    val outCols = urls.columns
    val hostCol = lower(regexp_extract(col("url"),
      "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?([^/]+)", 1))
    val projected = urls.withColumn("__host", hostCol)
      .join(robots.toDF("robots_host", "robots_bytes"),
        col("__host") === col("robots_host"), "left")
      .select(outCols.map(col).toIndexedSeq :+ col("robots_bytes"): _*)
    val schema = StructType(projected.schema.fields.dropRight(1) :+
      StructField("allowed", BooleanType, nullable = false))
    val urlIdx = outCols.indexOf("url")
    val bytesIdx = outCols.length
    projected.mapPartitions { it =>
      val memo = scala.collection.mutable.HashMap
        .empty[String, Option[Seq[Group]]]
      it.map { row =>
        val url = row.getString(urlIdx)
        val allowed =
          if (row.isNullAt(bytesIdx)) true // no rule file: crawl default
          else memo.getOrElseUpdate(hostOf(url),
            try Some(parseRobots(row.getAs[Array[Byte]](bytesIdx)))
            catch { case _: Exception => None }) match {
            case Some(gs) => isAllowed(gs, agent, pathOf(url))
            case None => false // unreadable policy: fail closed
          }
        Row.fromSeq(row.toSeq.dropRight(1) :+ allowed)
      }
    }(Encoders.row(schema))
  }
}
