package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain filtering — the curation step every crawl pipeline runs
  * before content-based quality (C4 excludes bad-word domains, CCNet and
  * RefinedWeb apply UT1-style blocklists; the reference has no analogue,
  * this is roadmap §LLM-pipeline).
  *
  * Blocking is by registrable-domain SUFFIX: a blocked `example.com`
  * removes `example.com` AND every subdomain (`cdn.example.com`, …) —
  * the standard blocklist contract. Scale shape: the host's suffix chain
  * is a ≤ `MaxLabels`-element in-row array, so matching is one explode
  * (bounded ×levels, narrow rows) + one anti-join against the blocklist
  * whose strategy is AQE's call — a million-domain UT1 list is a few MB
  * and broadcasts at runtime; nothing is force-broadcast and no regex
  * mega-pattern is built (a 1M-alternative regex is the non-scalable
  * formulation this operator exists to avoid). */
object UrlFilter {

  /** Suffix-chain depth cap: hosts deeper than this many labels match on
    * their last `MaxLabels` suffixes only (public blocklists list
    * registrable domains — 2-4 labels — so deeper prefixes never carry
    * block decisions). Bounds the explode fan-out per row. */
  val MaxLabels = 8

  /** Canonical form of a URL for IDENTITY purposes — the dedup-key
    * normalization every crawl pipeline needs because the same page
    * arrives under many spellings: scheme and host lowercased, default
    * ports dropped (`:80` http, `:443` https), the fragment removed
    * (never sent to the server), tracking parameters stripped
    * (`utm_*`, `fbclid`, `gclid`, `msclkid`, `ref` — the
    * analytics-added noise that multiplies one page into dozens of
    * "distinct" URLs), an emptied query's `?` dropped, and a trailing
    * slash on a bare path removed. SURVIVING query parameters keep
    * their original order (reordering them changes semantics on some
    * servers — the conservative choice). Everything is one codegen'd
    * regexp chain, no UDF; the same chain replays verbatim in the
    * oracle. Use the result as the `xxhash64` identity input wherever
    * `target_uri` is hashed today.
    *
    * Every pattern is RE2-safe (no lookaround, no backreference) — the
    * htmlToText convention, so the DuckDB oracle replays the chain
    * verbatim.
    *
    * URLs with no `scheme://` (relative refs, mailto:, plain garbage)
    * pass through UNCHANGED: the extraction-based chain would collapse
    * them all to `""`, merging every unparseable URL into one dedup
    * identity — the opposite of conservative. And tracker stripping
    * runs on the QUERY PART ONLY (the string is split at the first
    * `?` and rejoined after), so a path byte — even a tracker-named
    * segment like `/a&ref=home/` in a query-less URL — can never be
    * touched; the earlier unanchored `&tracker=` pass deleted exactly
    * that shape. */
  def canonicalizeUrl(url: Column): Column = {
    // scheme://host[:port] lowercased (path case is significant, kept)
    val lowered = concat(
      lower(regexp_extract(url, "^([^/?#]*://[^/?#]*)", 1)),
      regexp_extract(url, "^[^/?#]*://[^/?#]*(.*)$", 1))
    val noFragment = regexp_replace(lowered, "#.*$", "")
    // default ports: captured-tail formulation (an unmatched optional
    // group substitutes empty in both engines)
    val noDefaultPort = regexp_replace(
      regexp_replace(noFragment,
        "^(https://[^/?#:]*):443([/?#].*)?$", "$1$2"),
      "^(http://[^/?#:]*):80([/?#].*)?$", "$1$2")
    // tracking params: the string is first split at the FIRST '?' and
    // the three passes run on the query part alone, so no path byte is
    // reachable by any of them — including a tracker-NAMED path
    // segment like "/a&ref=home/p" in a query-less URL, which the old
    // '&tracker=' pass (unanchored to a '?') used to delete:
    //   1. every '&'-prefixed tracker anywhere in the query;
    //   2. a LEADING tracker followed by a survivor keeps the '?' and
    //      drops itself ("?utm=1&x=2" → "?x=2");
    //   3. a query that was nothing but one tracker disappears
    //      ("?utm=1" → "").
    val trackerNames = "(?:utm_[a-z]+|fbclid|gclid|msclkid|ref)"
    val prePath = regexp_extract(noDefaultPort, "^([^?]*)", 1)
    val rawQuery = regexp_extract(noDefaultPort, "^[^?]*(\\?.*)$", 1)
    val noAmpTrackers = regexp_replace(rawQuery,
      "&" + trackerNames + "=[^&#]*", "")
    val noLeadTracker = regexp_replace(noAmpTrackers,
      "\\?" + trackerNames + "=[^&#]*&", "?")
    val tidyQuery = concat(prePath, regexp_replace(noLeadTracker,
      "\\?" + trackerNames + "=[^&#]*$", ""))
    // bare "/" path (no query left) drops the slash: http://a.com/ == http://a.com
    when(url.isNull, lit(null).cast("string"))
      .when(url.rlike("^[^/?#]*://"),
        regexp_replace(tidyQuery, "^([a-z]+://[^/?#]*)/$", "$1"))
      .otherwise(url)
  }

  /** Lowercased host of a URL, null when none parses: the authority
    * between `scheme://` (with optional userinfo) and the first
    * `/ : ? #`. Pure per-row expression — codegen'd, no UDF. */
  def hostOf(url: Column): Column = {
    val h = lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1))
    when(length(h) > 0, h)
  }

  /** The host's dot-suffix chain, most-specific first:
    * `a.b.example.com` → [a.b.example.com, b.example.com, example.com,
    * com], capped at [[MaxLabels]] labels. Null host → empty array. */
  def hostSuffixes(host: Column): Column = {
    val parts = split(host, "\\.")
    val n = least(size(parts), lit(MaxLabels))
    when(host.isNotNull,
      transform(sequence(lit(1), n),
        i => array_join(slice(parts, size(parts) - n + i, n - i + 1), ".")))
      .otherwise(array().cast("array<string>"))
  }

  /** Rows of `df` whose `urlCol` host is NOT blocked. `blocked` is a
    * one-column (`host`) frame of registrable domains (load a UT1-style
    * list with `spark.read.text`). Rows with no parseable host are KEPT
    * (block on evidence, not absence) — pre-filter `hostOf(url).isNull`
    * first if unparseable URLs must die too. */
  def dropBlockedHosts(df: DataFrame, urlCol: String, blocked: DataFrame): DataFrame = {
    val blockedHosts = blocked.select(lower(col(blocked.columns.head)).as("__suffix"))
    val withId = df.withColumn("__suffixes", hostSuffixes(hostOf(col(urlCol))))
    val hit = withId
      .select(col(urlCol), explode(col("__suffixes")).as("__suffix"))
      .join(blockedHosts, Seq("__suffix"), "left_semi")
      .select(col(urlCol)).distinct()
    withId.join(hit, Seq(urlCol), "left_anti").drop("__suffixes")
  }
}
