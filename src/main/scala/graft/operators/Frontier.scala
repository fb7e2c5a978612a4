package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The frontier capstone — ONE plan from the five politeness/freshness
  * layers that otherwise only meet in prose:
  *
  *   1. [[Recrawl.recrawlPlan]] turns the prior crawl's validators and
  *      RFC 9111 freshness into a due time per URL (`next_fetch_s`)
  *      with the conditional-GET handles riding along;
  *   2. [[Recrawl.applySitemapHints]] (when `sitemaps` is given) folds
  *      the site's OWN change claims in — the one signal a polite
  *      crawler is TOLD: a newer `lastmod` pulls the row's due time to
  *      now (`stale`), `changefreq` caps heuristic intervals, and
  *      sitemap URLs with no archived capture enter the frontier as
  *      DISCOVERY rows (`source = 'discovered'`, due since forever);
  *   3. URL-identity collapse: candidates key on their alias-cluster
  *      REPRESENTATIVE ([[LinkRank.urlAliasClusters]]) so a page is
  *      fetched ONCE, not once per redirect shell / declared canonical
  *      — the cluster's due time is its most eager member's (a member
  *      that must be rechecked now makes the page due now), ties
  *      breaking deterministically by member URL, and the winning
  *      member's `stale`/`source` riding along;
  *   4. [[Robots.fetchSchedule]] spaces each host's queue by its
  *      robots.txt `Crawl-delay` (per-host rank window, `maxPerHost`
  *      hot-host cap available);
  *   5. [[Robots.applyBackoff]] shifts every slot of a host whose
  *      prior crawl answered 429/503 past its `Retry-After` horizon.
  *
  * Output: one row per representative URL — `url, if_none_match,
  * if_modified_since, interval_s, next_fetch_s` (the freshness face)
  * plus `host, delay_s, fetch_at_s` (the politeness face: the slot
  * offset within the crawl cycle), plus `stale, source` when sitemaps
  * joined the plan. The two clocks are deliberately separate columns:
  * `next_fetch_s` is WHEN the page is due (epoch seconds), `fetch_at_s`
  * WHERE in the cycle's per-host queue it sits — a dispatcher takes
  * the due subset and dispatches by slot.
  *
  * Scale shape: recrawlPlan and backoffHosts are narrow projections
  * over the record scan (backoff aggregates only the 429/503 sliver
  * and broadcasts hosts-scale output) — callers bridging both over a
  * re-readable archive should persist the records first, the
  * [[graft.io.Warc.toDocuments]] guidance; the sitemap fold is one
  * sitemap-scale aggregate plus one equi-join; the alias join is one
  * equi-join on the URL (alias-graph-scale right side); the collapse
  * is one map-side-partial aggregate on the representative; the
  * schedule is a hosts-scale broadcast join plus ONE host-partitioned
  * rank window. No cartesians, no skew terms beyond the window's
  * documented `maxPerHost` defense. */
object Frontier {

  def frontierPlan(records: Dataset[graft.io.Warc.WarcRecord],
      aliases: DataFrame, robots: Dataset[(String, Array[Byte])],
      agent: String,
      alpha: Double = 0.1, minHours: Double = 1.0,
      maxHours: Double = 24 * 30.0, defaultDays: Double = 7.0,
      defaultDelayS: Double = 1.0, defaultBackoffS: Double = 60.0,
      maxPerHost: Int = 0,
      sitemaps: Option[DataFrame] = None): DataFrame = {
    import graft.expressions.NativeUrl
    // one URL identity with the alias/edge kernels: the alias table
    // (urlAliasClusters over redirectEdges/canonicalDeclarations) is
    // canonical-keyed, so the frontier keys canonical too; a URI with
    // no derivable fetch identity has no frontier row
    val planned0 = Recrawl.recrawlPlan(records, alpha, minHours, maxHours,
        defaultDays)
      .withColumn("url", NativeUrl.canonicalizeUrl(col("url")))
      .filter(col("url").isNotNull)
    // the site's own change claims, folded in BEFORE the collapse so a
    // stale (or discovered) member can make its whole cluster due now
    val planned = sitemaps.fold(planned0)(sm =>
      Recrawl.applySitemapHints(planned0, sm, minHours, maxHours,
        defaultDays))
    val hinted = sitemaps.isDefined
    // alias collapse: fetch each identity cluster ONCE, due when its
    // most eager member is due (min over (next_fetch_s, member url,
    // validators[, stale, source]) — next_fetch_s is never null, the
    // default lane fills it, and the member URL breaks ties
    // deterministically; the winner's stale/source tag the cluster)
    val memberFields: Seq[Column] =
      Seq(col("next_fetch_s"), col("url").as("member_url"),
        col("if_none_match"), col("if_modified_since"),
        col("interval_s")) ++
        (if (hinted) Seq(col("stale"), col("source")) else Nil)
    val outFields: Seq[Column] =
      Seq(col("rep").as("url"),
        col("o.if_none_match").as("if_none_match"),
        col("o.if_modified_since").as("if_modified_since"),
        col("o.interval_s").as("interval_s"),
        col("o.next_fetch_s").as("next_fetch_s")) ++
        (if (hinted) Seq(col("o.stale").as("stale"),
          col("o.source").as("source")) else Nil)
    val collapsed = planned
      .join(aliases.select(col("url"), col("representative")),
        Seq("url"), "left")
      .select(coalesce(col("representative"), col("url")).as("rep"),
        struct(memberFields: _*).as("m"))
      .groupBy("rep")
      .agg(min(col("m")).as("o"))
      .select(outFields: _*)
    Robots.applyBackoff(
      Robots.fetchSchedule(collapsed, robots, agent, defaultDelayS,
        maxPerHost),
      Robots.backoffHosts(records, defaultBackoffS))
  }
}
