package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph rank over the crawl's edge list — the classic
  * random-surfer iteration (`r' = (1-d) + d·Σ r/outdeg` over in-edges,
  * the un-normalized per-node form) used to weight frontier scheduling
  * and to carry page authority into curation sampling. Operates on the
  * `(from_url, to_url)` edges [[graft.io.Warc.frontierLinks]] /
  * [[graft.io.Warc.redirectEdges]] emit; parallel edges count with
  * multiplicity (a page linking twice votes twice); nodes with no
  * out-edges contribute nothing (the simple dangling treatment —
  * documented, deterministic).
  *
  * Scale shape: each iteration is one equi-join of edges to ranks on
  * `src` plus one aggregate shuffle on `dst` — both keyed on the URL,
  * so a cluster co-partitions edges once and reuses the partitioning
  * across iterations; the rank side is nodes-sized, edges-sized work
  * never re-reads the archive. For a handful of iterations the plan
  * lineage is fine as-is; TENS of iterations need `checkpointEvery`:
  * without it the logical plan nests one join+agg per round and both
  * the optimizer walk and the physical lineage grow superlinearly —
  * the measured failure mode is planner time, long before executor
  * time (SCALE.md's link_rank_deep octave). With the knob on, the
  * edge/outdeg/node sides persist once (they are re-read every round
  * otherwise) and `ranks` is eagerly localCheckpoint'ed every k
  * rounds, truncating lineage; the result is bit-identical — the
  * checkpoint changes WHEN work happens, never what. Clusters running
  * with dynamic executor loss should swap the local checkpoint for a
  * reliable one (a checkpoint dir) — same knob, same cadence. */
object LinkRank {

  def pageRank(edges: DataFrame, iters: Int,
      damping: Double = 0.85, checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    var e = edges.select(col("from_url").as("src"), col("to_url").as("dst"))
    var nodes = e.select(col("src").as("url"))
      .union(e.select(col("dst").as("url"))).distinct()
    var outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val deep = checkpointEvery > 0 && iters > checkpointEvery
    if (deep) {
      // every iteration re-reads all three otherwise
      e = e.persist(); nodes = nodes.persist(); outdeg = outdeg.persist()
    }
    var ranks = nodes.withColumn("rank", lit(1.0))
    var prevCp: DataFrame = null
    for (i <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("url", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("url"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("url").agg(sum(col("c")).as("in_rank"))
      ranks = nodes.join(contribs, Seq("url"), "left")
        .select(col("url"),
          (lit(1 - damping) +
            lit(damping) * coalesce(col("in_rank"), lit(0.0))).as("rank"))
      if (deep && (i % checkpointEvery == 0 || i == iters)) {
        // eager: the new checkpoint materializes BEFORE the previous
        // round's blocks (which it read) are released
        val cp = ranks.localCheckpoint(true)
        if (prevCp != null) prevCp.unpersist()
        prevCp = cp
        ranks = cp
      }
    }
    if (deep) { e.unpersist(); nodes.unpersist(); outdeg.unpersist() }
    ranks
  }

  /** Host-level authority: the page edge list collapsed to its host
    * graph — host of `from_url` → host of `to_url`, INTER-host edges
    * only (intra-host navigation says nothing about authority and
    * would dominate every site's self-signal), multiplicity preserved
    * (a site linking from many pages votes many times) — then the same
    * surfer iteration. The host grain is where crawl policy actually
    * acts (politeness, caps, seed weighting), and the graph is 3–4
    * orders smaller than the page graph: the rank side collapses from
    * pages-scale to hosts-scale, so iterations are cheap at any corpus
    * size. Hosts lowercase per RFC 3986 §6.2.2; scheme/port are not
    * identity here (the fetch-schedule grain). Returns (host, rank). */
  def hostRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
      checkpointEvery: Int = 0): DataFrame = {
    def hostOf(c: org.apache.spark.sql.Column) =
      lower(regexp_extract(c, "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?([^/:]+)", 1))
    val he = edges.select(
        hostOf(col("from_url")).as("from_url"),
        hostOf(col("to_url")).as("to_url"))
      .filter(col("from_url") =!= "" && col("to_url") =!= "" &&
        col("from_url") =!= col("to_url"))
    pageRank(he, iters, damping, checkpointEvery)
      .withColumnRenamed("url", "host")
  }

  /** Anchor-text corpus over the outlink edge list: what the web CALLS
    * each target page — the classic relevance/description signal, one
    * document per URL built from the DISTINCT anchors pointing at it
    * (sorted, capped, newline-joined — fully deterministic). The cap
    * is applied BEFORE any per-key collection: anchors dedup in a
    * (url, anchor) aggregate first (the hot-URL reality — a million
    * "Home" links is ONE distinct anchor), then a per-URL rank window
    * keeps the first `maxAnchors` in sort order, so no key ever
    * collects an unbounded list. Residual exposure is a URL with
    * millions of DISTINCT anchors — rare by construction of anchor
    * text, and bounded by the window's spill path, never the
    * aggregate's heap. */
  /** One URL identity from every alias mechanism the crawl records:
    * redirect edges (3xx Location — [[graft.io.Warc.redirectEdges]],
    * meta-refresh edges qualify identically) and `rel=canonical`
    * declarations ([[graft.functions.TextFunctions.htmlMeta]]) union
    * into one undirected alias graph, components resolve by
    * [[Dedup.connectedComponents]], and each cluster elects a
    * REPRESENTATIVE by role preference: a canonical target (the page's
    * own first-person testimony) beats a redirect target (the server's
    * testimony) beats a plain member, a URL that aliases AWAY (any
    * out-edge) is demoted, and ties fall to the lexicographically
    * smallest URL — total and deterministic. This is the capstone over
    * the alias machinery: fetch dedup, recrawl planning, and link-rank
    * all key on `representative` instead of treble-counting the same
    * page behind its redirect shell and its declared canonical.
    *
    * Input schemas: `redirects` carries (from_url, to_url);
    * `canonicals` carries (url, canonical_url) — empty-string and
    * self-canonical rows are ignored here (htmlMeta's absence
    * convention). hreflang alternates are deliberately NOT aliases —
    * they name different-language versions, a grouping, not an
    * identity — feed them in as extra `redirects`-shaped edges only if
    * the deployment wants language clusters collapsed.
    *
    * Output: (url, representative, cluster_size) for every URL in the
    * alias graph. URLs with no alias edge are absent — the identity
    * cluster of an unaliased URL is itself, and materializing a row
    * per corpus URL would dwarf the signal.
    *
    * Scale shape: component resolution is the iterated min-label
    * propagation (shuffle per round keyed on the URL, rounds =
    * longest chain, real alias chains are a handful of hops); roles,
    * sizes, and the keeper argmax are single map-side-partial
    * aggregates riding the component exchange. Nothing quadratic in
    * cluster size; hot superclusters (a URL the whole web redirects
    * into) cost one agg row each. */
  def urlAliasClusters(redirects: DataFrame, canonicals: DataFrame,
      maxIter: Int = 25): DataFrame =
    urlAliasClustersHashed(redirects, canonicals, maxIter, xxhash64(_))

  /** [[urlAliasClusters]] with the identity hash injectable —
    * package-visible so the spec can plant a COLLIDING hash and prove
    * the guard fails loudly (real xxhash64 collisions are not
    * constructible in a test). Production always passes xxhash64. */
  private[graft] def urlAliasClustersHashed(redirects: DataFrame,
      canonicals: DataFrame, maxIter: Int,
      idHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    // ONE materialization of the (possibly archive-scan-derived) edge
    // inputs: the role tag rides along so redirect/canonical unions
    // are never re-derived — without this, an archive-backed caller
    // (alias-clusters over WARC) re-scans the archive once per
    // downstream reference (edges, roles, vertex list)
    val tagged = redirects
      .select(col("from_url").as("a"), col("to_url").as("b"),
        lit(1).as("role"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .unionByName(canonicals
        .filter(col("canonical_url").isNotNull &&
          col("canonical_url") =!= "" &&
          col("canonical_url") =!= col("url"))
        .select(col("url").as("a"), col("canonical_url").as("b"),
          lit(2).as("role")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = tagged.select(col("a"), col("b")).distinct()
    // role preference per URL: best inbound role minus the source demotion
    val scores = tagged.select(col("b").as("url"), col("role").as("r"))
      .unionByName(tagged.select(col("a").as("url"), lit(-10).as("r")))
      .groupBy("url")
      .agg((greatest(max(when(col("r") > 0, col("r"))), lit(0)) +
        min(when(col("r") === -10, lit(-1)).otherwise(lit(0)))).as("score"))
    val ids = edges.select(col("a").as("url"))
      .union(edges.select(col("b").as("url"))).distinct()
      .select(idHash(col("url")).as("id"), col("url"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val comp = Dedup.connectedComponents(
      edges.select(idHash(col("a")).as("id_a"), idHash(col("b")).as("id_b")),
      ids.select("id"), maxIter = maxIter)
    // node-scale eager checkpoint: everything downstream (sizes, the
    // keeper argmax, the join-back) derives from membership alone, so
    // the tagged edge cache can be released before returning the
    // still-lazy result. The 64-bit collision guard rides the SAME
    // pass: component identity is xxhash64(url), and a collision
    // between any two alias-graph URLs would SILENTLY merge unrelated
    // clusters and elect one representative for both — quiet
    // corruption in an identity-defining product. A count window over
    // the id reuses the ids⋈comp exchange's own hash partitioning (no
    // extra shuffle, no standalone eager job — the guard's check is a
    // node-scale filter over the checkpointed frame), and the
    // astronomically-rare hit fails loudly to re-key offline, never
    // shipping merged.
    val idW = org.apache.spark.sql.expressions.Window.partitionBy("id")
    val membership0 = ids.join(comp, Seq("id"))
      .withColumn("__id_urls", count(lit(1)).over(idW))
      .join(scores, Seq("url"), "left")
      .na.fill(0, Seq("score"))
      .localCheckpoint(true)
    val collided = membership0.filter(col("__id_urls") > 1)
      .select(col("id")).distinct().count()
    require(collided == 0,
      s"urlAliasClusters: $collided xxhash64 collision(s) across alias-graph " +
        "URLs — component identity would merge unrelated clusters; re-key " +
        "the graph (e.g. salt the hash) before clustering")
    val membership = membership0.drop("__id_urls")
    tagged.unpersist()
    ids.unpersist()
    val sizes = membership.groupBy("component")
      .agg(count(lit(1)).as("cluster_size"))
    Dedup.clusterKeepers(membership, "url", "component", "score")
      .join(sizes, Seq("component"))
      .select(col("url"), col("keeper_id").as("representative"),
        col("cluster_size"))
  }

  def anchorTexts(edges: DataFrame, maxAnchors: Int = 32): DataFrame = {
    require(maxAnchors > 0, "maxAnchors must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("url").orderBy("anchor")
    edges
      .filter(col("anchor").isNotNull && col("anchor") =!= "")
      .select(col("to_url").as("url"), col("anchor")).distinct()
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= maxAnchors)
      .groupBy("url")
      .agg(
        array_join(sort_array(collect_list(col("anchor"))), "\n")
          .as("anchor_text"),
        count(lit(1)).cast("int").as("n_anchors"))
  }
}
