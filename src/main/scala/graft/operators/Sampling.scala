package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}

/** Deterministic, seed-free dataset splitting and sampling for training
  * pipelines. A document's split must be a pure function of its identity —
  * stable across runs, engines, partitionings, and corpus growth — so the
  * assignment hashes the id (md5, available identically in every engine an
  * oracle might run in) rather than using `rand()` or Spark's `sample`.
  * Adding documents later never moves an existing document between splits.
  */
object Sampling {

  /** Stable bucket in [0, nBuckets): the first 16 bits of md5(id) mod
    * nBuckets. Pure Catalyst (md5/substring/conv are codegen'd built-ins),
    * no UDF, no seed state.
    *
    * Known (documented) bias: 16 bits mod nBuckets leaves the first
    * `65536 % nBuckets` buckets one 1/65536-slice heavier — ≤ 0.06%
    * relative occupancy skew at nBuckets = 100, zero when nBuckets is a
    * power of two. Deterministic and oracle-matched; kept at 16 bits
    * because the value doubles as the published split contract
    * (assignSplit's bucket column) and widening would reassign splits. */
  def md5Bucket(id: Column, nBuckets: Int): Column = {
    require(nBuckets > 0 && nBuckets <= 65536,
      s"nBuckets must be in [1, 65536]: $nBuckets")
    conv(substring(md5(id.cast(StringType)), 1, 4), 16, 10)
      .cast(IntegerType) % nBuckets
  }

  /** Assign each row a named split by cumulative percentage, e.g.
    * Seq("train" -> 90, "val" -> 5, "test" -> 5). Percentages must total
    * 100. Output adds `bucket` (0-99) and `split`. */
  def assignSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Int)] = Seq("train" -> 90, "val" -> 5, "test" -> 5)): DataFrame = {
    require(weights.nonEmpty && weights.map(_._2).sum == 100,
      s"split weights must total 100: $weights")
    val bucket = md5Bucket(col(idCol), 100)
    val cum = weights.scanLeft(0)(_ + _._2).tail
    val split = weights.zip(cum).tail.foldLeft(
      when(bucket < cum.head, lit(weights.head._1))) {
      case (acc, ((name, _), upper)) => acc.when(bucket < upper, lit(name))
    }
    df.withColumn("bucket", bucket).withColumn("split", split)
  }

  /** Deterministic stratified sample: the first `perStratum` rows of each
    * stratum in md5(id) order — a fixed-size, seed-free panel per group
    * (e.g. a balanced eval set of k docs per language from a corpus where
    * languages differ by 1000×). The md5 order is a stable shuffle of each
    * stratum, so the panel is uniform-without-replacement yet identical
    * across runs and engines; adding rows later only displaces panel
    * members that hash-sort after the newcomer.
    *
    * Adds `sample_rank` (1-based position in the stratum's md5 order).
    * Scale shape: one shuffle on the stratum key + a per-partition sort
    * (WindowExec spills); the rank filter drops everything past
    * `perStratum` before any downstream exchange. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      perStratum: Int): DataFrame = {
    require(perStratum > 0, s"perStratum must be positive: $perStratum")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast(StringType)), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= perStratum)
  }

  /** Keep a deterministic `permille`/1000 fraction of rows by id hash —
    * the repeatable corpus-sampling primitive (same rows survive every
    * run; a grown corpus keeps its previously-sampled rows). */
  def hashSample(df: DataFrame, idCol: String, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000,
      s"permille must be in [0, 1000]: $permille")
    df.filter(md5Bucket(col(idCol), 1000) < permille)
  }

  /** Stable per-group order key: md5 of the row id (ties broken by the id
    * itself) — the same "deterministic shuffle" stratifiedSample ranks by. */
  private def md5Order(idCol: String): Seq[Column] =
    Seq(md5(col(idCol).cast(StringType)), col(idCol))

  /** Cap each group at `maxPerGroup` rows — the per-domain document cap of
    * web-corpus curation (a handful of giant domains otherwise dominate the
    * mixture). Survivors are the first `maxPerGroup` rows of the group in
    * md5(id) order, so the kept set is deterministic and nested: re-running,
    * re-partitioning, or growing an already-capped group never swaps a
    * survivor for a hash-later newcomer.
    *
    * Output adds `cap_rank`: the 1-based md5-order position for rows of
    * groups that EXCEEDED the cap, null for rows of groups that never hit
    * it (kept wholesale, unranked).
    *
    * Scale shape (the point of the two-branch plan): group sizes come from
    * one map-side-combined count agg; only rows of OVER-cap groups pay the
    * rank window's shuffle+sort — and Catalyst's WindowGroupLimit pushes
    * the `<= maxPerGroup` rank filter BELOW that exchange (plan-verified),
    * so each input partition ships at most maxPerGroup rows per group.
    * Under-cap rows — in a web corpus, almost all domains — flow scan →
    * hash anti-probe → out with no exchange of their own. The over-cap
    * group set's join strategy is left to the planner: its cardinality is
    * UNBOUNDED (a cap of 100 over a web corpus makes most of millions of
    * domains over-cap), so a forced broadcast would be driver-memory
    * pressure exactly when the operator matters most — with AQE the
    * common small set still becomes a runtime broadcast — the under branch
    * keeps its no-exchange shape (PackingSamplingSpec asserts the final
    * AQE plan joins the over set by broadcast, never sort-merge/shuffled
    * hash) — and a pathological set degrades to a shuffle join, not an OOM.
    * The input is scanned twice (once per branch), which
    * at 100 TB is two column-pruned parquet reads vs. shuffling the entire
    * corpus through one WindowExec; persist `df` first if its lineage is
    * expensive instead of a scan.
    *
    * Rows with a NULL group value are always kept wholesale (equi-join
    * semantics: a null key never matches the over-cap set) — coalesce the
    * group column to a sentinel first if the null group must be capped
    * too. Same contract in [[tokenBudget]]. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
      maxPerGroup: Int): DataFrame = {
    require(maxPerGroup > 0, s"maxPerGroup must be positive: $maxPerGroup")
    val over = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxPerGroup)
      .select(col(groupCol), lit(true).as("__over"))
    val flagged = df.join(over, Seq(groupCol), "left")
    val under = flagged.filter(col("__over").isNull)
      .drop("__over")
      .withColumn("cap_rank", lit(null).cast(LongType))
    val w = Window.partitionBy(col(groupCol)).orderBy(md5Order(idCol): _*)
    val capped = flagged.filter(col("__over"))
      .drop("__over")
      .withColumn("cap_rank", row_number().over(w).cast(LongType))
      .filter(col("cap_rank") <= maxPerGroup)
    under.unionByName(capped)
  }

  /** Select documents until each group's TOKEN budget is spent — the
    * mixture-building primitive ("this source contributes at most B tokens
    * to the run"). Docs are taken in md5(id) order; a doc is kept while the
    * budget is not yet exhausted BEFORE it, so the doc that crosses the
    * budget is the last survivor and every group with any budget at all
    * contributes at least one doc. Deterministic and nested under budget
    * raises, like every sampler here.
    *
    * `budgets` maps group value → token budget; groups absent from the map
    * get `defaultBudget`. The lookup is a broadcast-free literal map
    * expression (budgets are config-sized).
    *
    * Output adds `n_tokens` (from `tokenCol`) and `cum_tokens` — the
    * inclusive running sum in selection order for groups that EXCEEDED
    * their budget, null for groups kept wholesale (same nullable-rank
    * convention as capPerGroup, same two-branch scale shape: only
    * over-budget groups ride the window, and the over-group join strategy
    * is the planner's — see capPerGroup's cardinality note).
    *
    * A null `tokenCol` counts as 0 tokens in BOTH branches (the group's
    * total, the running sum, and the cut all coalesce it), so a
    * null-token row is kept iff the budget isn't already spent before it
    * — the same treatment whether its group is over or under budget. */
  def tokenBudget(df: DataFrame, groupCol: String, idCol: String,
      tokenCol: String, budgets: Map[String, Long],
      defaultBudget: Long): DataFrame = {
    require(defaultBudget >= 0 && budgets.values.forall(_ >= 0),
      "budgets must be non-negative")
    val budget =
      if (budgets.isEmpty) lit(defaultBudget)
      else coalesce(element_at(typedLit(budgets), col(groupCol).cast(StringType)),
        lit(defaultBudget))
    val toks = coalesce(col(tokenCol).cast(LongType), lit(0L))
    val over = df.groupBy(col(groupCol)).agg(sum(toks).as("__tot"))
      .filter(col("__tot") > budget)
      .select(col(groupCol), lit(true).as("__over"))
    val flagged = df.join(over, Seq(groupCol), "left")
    val under = flagged.filter(col("__over").isNull)
      .drop("__over")
      .withColumn("cum_tokens", lit(null).cast(LongType))
    // Cumulative sums admit no WindowGroupLimit pushdown (every row's
    // prefix needs every earlier row), so a single per-group window
    // would serialize a hot group's whole cumsum into ONE task — the
    // 100× skew scenario measured a real 17.7× straggler from exactly
    // that. Distributed prefix sum instead, bit-identical: the group
    // splits into 256 sub-ranges keyed by the md5 order's OWN first two
    // hex chars (so (bucket, rest-of-order) IS the md5 order), each
    // bucket cumsums in parallel, and a bucket's base is the sum of
    // earlier buckets — a groups×256-row aggregate, window-scanned at
    // trivial size. Hot-group parallelism: 256 tasks instead of 1.
    val ordMd5 = md5(col(idCol).cast(StringType))
    val overRows = flagged.filter(col("__over")).drop("__over")
      .withColumn("__bkt", substring(ordMd5, 1, 2))
    val bases = overRows.groupBy(col(groupCol), col("__bkt"))
      .agg(sum(toks).as("__bsum"))
      .withColumn("__base", coalesce(sum(col("__bsum")).over(
        Window.partitionBy(col(groupCol)).orderBy(col("__bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(groupCol), col("__bkt"), col("__base"))
    val wB = Window.partitionBy(col(groupCol), col("__bkt"))
      .orderBy(md5Order(idCol): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val trimmed = overRows.join(bases, Seq(groupCol, "__bkt"))
      .withColumn("cum_tokens", col("__base") + sum(toks).over(wB))
      .filter(col("cum_tokens") - toks < budget)
      .drop("__bkt", "__base")
    under.unionByName(trimmed)
  }

  /** Deterministic weighted (importance) sampling: keep each row with
    * probability `weight` ∈ [0, 1] — per ROW, so the weight can encode
    * source-mixing rates, quality-proportional retention, or temperature
    * reweighting — without `rand()`: the row's md5-derived unit uniform
    * `u = bucket(id, 65536) / 65536` is compared against its weight, so
    * the survivor set is a pure function of (id, weight). Re-running,
    * re-partitioning, or growing the corpus never flips a row whose
    * weight is unchanged; RAISING a weight only ADDS survivors (the
    * nested-subset property hashSample has, generalized per-row).
    *
    * The uniform reads md5 hex chars 9-12 — a DIFFERENT 16 bits than
    * `md5Bucket`/`assignSplit` (chars 1-4) — so sampling composes with
    * split assignment as an independent decision. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column): DataFrame =
    df.filter(
      conv(substring(md5(col(idCol).cast(StringType)), 9, 4), 16, 10)
        .cast(DoubleType) / lit(65536.0) < weight)

  /** x^alpha for dyadic alphas, composed from `sqrt` — reproducible where
    * `pow` is not: IEEE-754 requires sqrt correctly rounded, so the same
    * composition gives bit-identical results in every engine, while
    * `pow(x, 0.5)` is a libm transcendental whose last ulp is
    * implementation-defined. Supported: 0.25, 0.5, 0.75, 1.0 — the range
    * temperature-sampling recipes actually use. */
  private[graft] def dyadicPow(x: Column, alpha: Double): Column = alpha match {
    case 1.0  => x
    case 0.5  => sqrt(x)
    case 0.25 => sqrt(sqrt(x))
    case 0.75 => sqrt(x) * sqrt(sqrt(x))
    case a => throw new IllegalArgumentException(
      s"alpha must be one of 0.25, 0.5, 0.75, 1.0 (sqrt-composable): $a")
  }

  /** Temperature-based source mixture weights — the sampling distribution
    * behind multilingual/multi-source training mixes (weight ∝ tokens^α,
    * α < 1 upweights small sources; the XLM-R/mT5 recipe). Output one row
    * per group: (group, tokens, weight), weights summing to 1.
    *
    * Determinism is the design constraint here, not scale (the output is
    * sources-sized): token totals are INTEGER sums (exact, order-free);
    * tokens^α goes through [[dyadicPow]] (correctly-rounded sqrt
    * composition, never libm pow); and the normalizing denominator — a sum
    * of doubles, where accumulation order would leak into the last ulp —
    * is a LEFT FOLD over the group-sorted list, pinned by `array_sort` +
    * `aggregate`. The fold runs on one sources-sized row on the driver
    * side of a 2-level agg; the corpus-sized work is only the integer sum.
    * An oracle reproduces it as list_reduce over the same sorted list. */
  def mixtureWeights(df: DataFrame, groupCol: String, nTokens: Column,
      alpha: Double = 0.5): DataFrame = {
    val perGroup = df.groupBy(col(groupCol))
      .agg(sum(nTokens.cast(LongType)).as("tokens"))
    val pw = dyadicPow(col("tokens").cast(DoubleType), alpha)
    val denom = perGroup
      .agg(aggregate(
        array_sort(collect_list(struct(col(groupCol).as("g"), pw.as("w")))),
        lit(0.0), (acc, x) => acc + x.getField("w")).as("denom"))
    perGroup
      .crossJoin(broadcast(denom))
      .select(col(groupCol), col("tokens"), (pw / col("denom")).as("weight"))
  }

  /** Deterministic epoch shuffle into training shards: every row gets a
    * `shard` in [0, nShards) and a 1-based `pos` within its shard, both
    * pure functions of (seed, id) — the global random-order pass a
    * training run needs per epoch, without ever materializing a global
    * sort. A new seed is a new, uncorrelated permutation (epoch 2 =
    * different seed); the same seed reproduces the byte-identical order
    * on any cluster, any partitioning, any engine (md5 is the
    * cross-engine primitive — `md5Bucket`'s rationale).
    *
    * Shard = first 4 hex chars of md5(seed:id) mod nShards; order within
    * a shard = the full md5 hex (id tiebreak for the astronomically
    * unlikely collision). Because the order key is independent of the
    * shard bits' use, consecutive positions in a shard are uniform draws
    * from the corpus — the "shuffled shards" contract samplers and data
    * loaders assume.
    *
    * Scale shape: one shuffle on `shard` + a per-shard sort (WindowExec;
    * nShards at 100 TB is total/shardBytes, so each shard sorts
    * shardBytes, not the corpus). The production write path is the same
    * two steps as a write: `repartition(nShards, shard)`
    * `.sortWithinPartitions(key)` straight into the sink — `pos` is for
    * the manifest, and the window that computes it rides the exchange
    * the write needs anyway. */
  def epochShards(df: DataFrame, idCol: String, seed: String,
      nShards: Int): DataFrame = {
    require(nShards > 0 && nShards <= 65536,
      s"nShards must be in [1, 65536]: $nShards")
    val key = md5(concat(lit(seed + ":"), col(idCol).cast(StringType)))
    val shard = conv(substring(key, 1, 4), 16, 10).cast(LongType) % nShards
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__key").asc, col(idCol).asc)
    df.withColumn("__key", key)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast(LongType))
      .drop("__key")
  }
}
