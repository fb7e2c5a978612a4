package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Core relational operator families (SURVEY.md §2) as named queries over
  * the driver parquet tables, each paired with an equivalent DuckDB oracle.
  *
  * Determinism rules (the driver hash-compares against DuckDB):
  *  - every query ends in a total ORDER BY over a unique key set, mirrored
  *    in the oracle (nulls-first to match Spark's default);
  *  - monetary aggregates are summed as DECIMAL(18,2) — exact and
  *    order-independent — then cast to double, so both engines produce
  *    bit-identical values regardless of accumulation order;
  *  - ANSI-safe everywhere (Spark 4 defaults): try_element_at, null-guarded
  *    casts.
  *
  * The events table stores TIMESTAMP(NANOS), which Spark's parquet reader
  * rejects by default: `events()` flips spark.sql.legacy.parquet.nanosAsLong
  * and works on epoch-nano longs.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, dir, "events")
    // ts contract downstream: epoch NANOS as Long (see PipelineQueries
    // .events — same normalization, same UTC-session oracle agreement)
    raw.schema("ts").dataType match {
      case LongType => raw
      case _ => raw.withColumn("ts",
        unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    }
  }

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Exact, order-independent money sum: decimal accumulate, double out. */
  private def money(c: Column): Column = sum(dec(c)).cast(DoubleType)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S-family + P1/F: scan with pushed filter and pruned projection
    "q_scan_filter_project" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 30)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")),

    // F4/F5: disjunctive IN filter
    "q_filter_isin" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "R") && col("l_linestatus") === "F")
        .select("l_orderkey", "l_linenumber", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")),

    // P2/P3/X4: rename, casts, concat
    "q_project_cast_concat" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          concat(lit("ord"), col("l_orderkey").cast(StringType)).as("okey_tag"),
          concat_ws(",", col("l_returnflag"), col("l_linestatus")).as("flags"),
          col("l_quantity").cast(LongType).as("qty_int"))
        .orderBy("l_orderkey", "l_linenumber")),

    // X1/X5: regex extract with null-on-miss + coalesce default
    "q_regex_extract" -> ((s, dir) =>
      events(s, dir)
        .select(
          col("event_id"),
          coalesce(nullif(regexp_extract(col("props"), "\"k\": (\\d+)", 1), lit(""))
            .cast(LongType), lit(-1L)).as("k_val"),
          coalesce(nullif(regexp_extract(col("props"), "\"missing\": (\\d+)", 1), lit(""))
            .cast(LongType), lit(-1L)).as("miss_val"))
        .orderBy("event_id")),

    // X2: regex strip-prefix + cast
    "q_regex_replace" -> ((s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("devoweled"),
          regexp_replace(col("p_brand"), "^Brand#", "").cast(LongType).as("brand_num"))
        .orderBy("p_partkey")),

    // X3/X10: nullif/coalesce battery (nulls synthesized — testdata has none)
    "q_null_handling" -> ((s, dir) =>
      events(s, dir)
        .select(
          col("event_id"),
          coalesce(nullif(col("event_type"), lit("error")), lit("ok")).as("et_clean"),
          coalesce(when(col("value") > 100, lit(null)).otherwise(col("value")), lit(0.0))
            .as("value_capped"))
        .orderBy("event_id")),

    // G1/X7/X8: split + explode + positional token get
    "q_split_explode" -> ((s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          explode(split(col("p_name"), " ")).as("word"),
          try_element_at(split(col("p_name"), " "), lit(1)).as("head_token"))
        .orderBy("p_partkey", "word")),

    // J1: left equi-join (order side preserved, null lineitem cols survive)
    "q_left_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left")
        .select(o("o_orderkey"), l("l_linenumber"), l("l_partkey"), o("o_orderstatus"))
        .orderBy("o_orderkey", "l_linenumber")
    }),

    // join + aggregation: revenue per market segment
    "q_join_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), money(col("o_totalprice")).as("revenue"))
        .orderBy("c_mktsegment")
    }),

    // D1: exact full-row dedup
    "q_dedup_full" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          to_date(col("l_shipdate")).as("ship_date"))
        .distinct()
        .orderBy("l_returnflag", "l_linestatus", "ship_date")),

    // D2/D3: deterministic keep-first dedup per key (window row_number)
    "q_dedup_keymin" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
        .orderBy("c_nationkey")
    }),

    // aggregation battery (TPC-H Q1 shape; ABSENT in reference — extension)
    "q_agg_groupby" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          money(col("l_quantity")).as("sum_qty"),
          money(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          (sum(dec(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // window function: top-3 orders per customer by price
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    }),

    // quantile + fixed-width bucketing: ntile(4) within each order
    // priority (partitioned window — never a global single-partition
    // sort), total order made deterministic by the key tie-breaker, plus
    // an arithmetic fixed-width price bucket (the histogram primitive)
    "q_quantile_buckets" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("price_quartile", ntile(4).over(w))
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"), col("price_quartile"),
          floor(col("o_totalprice") / 50000).cast(LongType).as("price_bucket"))
        .orderBy("o_orderkey")
    }),

    // sort + limit (top-k — TakeOrderedAndProject, no global sort at scale)
    "q_topk" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    // set op: distinct union of customer and supplier nations
    "q_union_distinct" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy("nationkey")),

    // anti join: orders that never shipped a line item
    "q_anti_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // semi join: parts that ship
    "q_semi_join" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem")
      p.join(l, p("p_partkey") === l("l_partkey"), "left_semi")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    }),

    // salted skew-join through SkewOps: results must equal the plain join
    "q_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      graft.operators.SkewOps.saltedJoin(li, o, Seq("l_orderkey"), saltFactor = 8)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy("o_orderstatus")
    }),

    // bloom pre-filtered join: the fact shuffle only carries rows whose key
    // probes positive against a 1%-fpp sketch of the (selective) dim keys;
    // the exact join that follows makes the result equal the plain join
    "q_bloom_join" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_custkey")
      graft.operators.BloomJoin.preFilterJoin(
          t(s, dir, "lineitem"), urgent, "l_orderkey", "o_orderkey",
          expectedItems = 1000000L)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("o_custkey"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // bloom anti-join: definite non-matches bypass the shuffle, probable
    // matches run the exact anti join — equals the plain left_anti
    "q_bloom_anti_join" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      graft.operators.BloomJoin.antiJoin(
          t(s, dir, "lineitem"), urgent, "l_orderkey", "o_orderkey",
          expectedItems = 1000000L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"), money(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // z-order (Morton) key derivation — the sort key Layout.clusterByZ
    // range-partitions on so parquet min-max stats prune on BOTH columns;
    // pure codegen'd integer arithmetic, replayed step-for-step in SQL
    "q_zorder" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.operators.Layout.zValue(col("l_partkey"), col("l_suppkey"))
            .as("zval"))
        .orderBy("zval", "l_orderkey", "l_linenumber")),

    // 3-column Morton key (stride-3 interleave, 8 bits/dim) — the N-way
    // generalization; same bit-for-bit SQL replay contract as q_zorder
    "q_zorder3" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.operators.Layout.zValueN(
            Seq(col("l_partkey"), col("l_suppkey"), col("l_orderkey")),
            bitsPerDim = 8).as("zval"))
        .orderBy("zval", "l_orderkey", "l_linenumber")),

    // Hilbert curve key (8-bit grid) — the jump-free alternative to
    // Morton: consecutive keys are always grid neighbors, so range files
    // get tighter bounding boxes. The iterative rotate-accumulate kernel
    // is replayed by the oracle as an 8-step RECURSIVE CTE.
    "q_hilbert" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          graft.operators.Layout.hilbertValue(
            col("p_partkey") % 256, (col("p_size") * 7) % 256, bits = 8)
            .as("h"))
        .orderBy("p_partkey")),

    // salted two-tier aggregation; decimal input keeps the sum exact and
    // order-independent so the oracle matches bit-for-bit
    "q_salted_agg" -> ((s, dir) =>
      graft.operators.SkewOps.saltedSum(
          t(s, dir, "lineitem").withColumn("lq", dec(col("l_quantity"))),
          Seq("l_returnflag"), "lq", saltFactor = 16)
        .select(col("l_returnflag"), col("sum_lq").cast(DoubleType).as("sum_lq"))
        .orderBy("l_returnflag")),

    // multi-level aggregation: ROLLUP — per (flag, status), per flag,
    // grand total, one shuffle (Spark expands grouping sets map-side)
    "q_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), money(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")),

    // CUBE over two order dimensions — all four grouping combinations
    "q_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), money(col("o_totalprice")).as("revenue"))
        .orderBy("o_orderstatus", "o_orderpriority")),

    // explicit GROUPING SETS: segment totals and nation totals in one pass
    "q_grouping_sets" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupingSets(
          Seq(Seq(col("c_mktsegment")), Seq(col("c_nationkey"))),
          col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"), money(col("c_acctbal")).as("acct_total"))
        .orderBy("c_mktsegment", "c_nationkey")),

    // pivot: per-returnflag row counts and exact sums by linestatus column
    "q_pivot" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(money(col("l_quantity")))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
        .orderBy("l_returnflag")),

    // exact (interpolating) percentiles per group — a full-sort-per-group
    // aggregate; both engines interpolate lower + (upper-lower)*frac in
    // double, so results are bit-identical on identical inputs
    "q_percentile" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("q25"),
          expr("percentile(l_quantity, 0.5)").as("q50"),
          expr("percentile(l_quantity, 0.75)").as("q75"),
          min(col("l_quantity")).as("q_min"),
          max(col("l_quantity")).as("q_max"))
        .orderBy("l_returnflag")),

    // second-moment statistics from EXACT decimal sufficient statistics:
    // Σx, Σx², Σxy accumulate as decimals (order-independent), and
    // variance/correlation are one deterministic double expression at the
    // end — the single-pass shape that scales, without the
    // accumulation-order nondeterminism of native welford stddev/corr
    // (whose result bits change with partitioning, so they can never
    // hash-match an oracle — or themselves across reruns)
    "q_stats_moments" -> ((s, dir) => {
      val x = dec(col("l_quantity"))
      val y = dec(col("l_extendedprice"))
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"),
          sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
        .select(
          col("l_returnflag"),
          col("n"),
          (col("sx").cast(DoubleType) / col("n")).as("mean_qty"),
          ((col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType) /
            (col("n").cast(DoubleType) * (col("n") - 1))).as("var_qty"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType) /
            (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType)) *
              sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast(DoubleType))))
            .as("corr_qty_price"))
        .orderBy("l_returnflag")
    }),

    // running-frame window battery: cumulative exact sum, lag, and
    // position over an explicit ROWS frame (deterministic: the partition
    // order key o_orderkey is unique)
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice"))).over(running).cast(DoubleType)
            .as("running_spend"),
          lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"),
          row_number().over(w).as("nth_order"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // event-time tumbling window aggregation over epoch-nano events.
    // integer DIV: double division of epoch nanos loses sub-µs exactness
    "q_time_window" -> ((s, dir) =>
      events(s, dir)
        .select(
          timestamp_micros(expr("(ts DIV 3600000000000) * 3600000000"))
            .as("hour"),
          col("event_type"), col("value"))
        .groupBy(col("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), money(col("value")).as("total_value"))
        .orderBy("hour", "event_type")),

    // stream-static enrichment (batch face of StreamingOps.enrichWithStatic
    // — the identical graph runs over readStream): every event picks up its
    // user's market segment via a broadcast dim, no shuffle, no state
    "q_stream_enrich" -> ((s, dir) => {
      val ev = events(s, dir).select(col("event_id"), col("user_id"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      graft.streaming.StreamingOps.enrichWithStatic(ev, cust, Seq("user_id"))
        .orderBy("event_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem WHERE l_quantity > 30 ORDER BY l_orderkey, l_linenumber""",
    "q_filter_isin" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem WHERE l_returnflag IN ('A','R') AND l_linestatus = 'F' ORDER BY l_orderkey, l_linenumber""",
    "q_project_cast_concat" ->
      """SELECT l_orderkey, l_linenumber, 'ord' || CAST(l_orderkey AS VARCHAR) AS okey_tag, l_returnflag || ',' || l_linestatus AS flags, CAST(l_quantity AS BIGINT) AS qty_int FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_regex_extract" ->
      """SELECT event_id, COALESCE(CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS BIGINT), -1) AS k_val, COALESCE(CAST(NULLIF(regexp_extract(props, '"missing": (\d+)', 1), '') AS BIGINT), -1) AS miss_val FROM events ORDER BY event_id""",
    "q_regex_replace" ->
      """SELECT p_partkey, regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled, CAST(regexp_replace(p_brand, '^Brand#', '') AS BIGINT) AS brand_num FROM part ORDER BY p_partkey""",
    "q_null_handling" ->
      """SELECT event_id, COALESCE(NULLIF(event_type, 'error'), 'ok') AS et_clean, COALESCE(CASE WHEN value > 100 THEN NULL ELSE value END, 0.0) AS value_capped FROM events ORDER BY event_id""",
    "q_split_explode" ->
      """SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word, string_split(p_name, ' ')[1] AS head_token FROM part ORDER BY p_partkey, word""",
    "q_left_join" ->
      """SELECT o_orderkey, l_linenumber, l_partkey, o_orderstatus FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey ORDER BY o_orderkey, l_linenumber NULLS FIRST""",
    "q_join_agg" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_dedup_full" ->
      """SELECT DISTINCT l_returnflag, l_linestatus, CAST(l_shipdate AS DATE) AS ship_date FROM lineitem ORDER BY l_returnflag, l_linestatus, ship_date""",
    "q_dedup_keymin" ->
      """SELECT c_nationkey, c_custkey, c_name, c_acctbal FROM (SELECT *, row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn FROM customer) WHERE rn = 1 ORDER BY c_nationkey""",
    "q_agg_groupby" ->
      """SELECT l_returnflag, l_linestatus, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty, COUNT(*) AS count_order FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q_quantile_buckets" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice, ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC) AS price_quartile, CAST(floor(o_totalprice / 50000) AS BIGINT) AS price_bucket FROM orders ORDER BY o_orderkey""",
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""",
    "q_union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey AS nationkey FROM supplier ORDER BY nationkey""",
    "q_anti_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey) ORDER BY o_orderkey""",
    "q_semi_join" ->
      """SELECT p_partkey, p_name FROM part WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey) ORDER BY p_partkey""",
    "q_zorder3" ->
      s"""SELECT l_orderkey, l_linenumber, ${graft.operators.Layout.zValueNSql(
        Seq("l_partkey", "l_suppkey", "l_orderkey"), 8)} AS zval FROM lineitem ORDER BY zval, l_orderkey, l_linenumber""",
    "q_salted_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n_rows FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_salted_agg" ->
      """SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_lq FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_bloom_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, o_custkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE o_orderpriority = '1-URGENT' ORDER BY l_orderkey, l_linenumber""",
    "q_bloom_anti_join" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey AND o_orderpriority = '1-URGENT') GROUP BY l_returnflag ORDER BY l_returnflag""",
    // Morton spreading replayed: 16-bit mask, then 8/4/2/1 shift-or-mask
    // steps per dimension, x on even bits, y odd
    "q_zorder" ->
      """WITH a AS (SELECT l_orderkey, l_linenumber, l_partkey & 65535 AS x0, l_suppkey & 65535 AS y0 FROM lineitem), b AS (SELECT l_orderkey, l_linenumber, (x0 | (x0 << 8)) & 16711935 AS x1, (y0 | (y0 << 8)) & 16711935 AS y1 FROM a), c AS (SELECT l_orderkey, l_linenumber, (x1 | (x1 << 4)) & 252645135 AS x2, (y1 | (y1 << 4)) & 252645135 AS y2 FROM b), d AS (SELECT l_orderkey, l_linenumber, (x2 | (x2 << 2)) & 858993459 AS x3, (y2 | (y2 << 2)) & 858993459 AS y3 FROM c), e AS (SELECT l_orderkey, l_linenumber, (x3 | (x3 << 1)) & 1431655765 AS x4, (y3 | (y3 << 1)) & 1431655765 AS y4 FROM d) SELECT l_orderkey, l_linenumber, x4 | (y4 << 1) AS zval FROM e ORDER BY zval, l_orderkey, l_linenumber""",
    // the Hilbert kernel's loop replayed as a recursive CTE: each step
    // reads (rx, ry) off the current (x, y, s), rotates the quadrant, and
    // accumulates s²·((3rx) xor ry); rows finish at s = 0
    "q_hilbert" ->
      """WITH RECURSIVE h AS (SELECT p_partkey AS id, CAST(p_partkey % 256 AS BIGINT) AS x, CAST((p_size * 7) % 256 AS BIGINT) AS y, CAST(0 AS BIGINT) AS d, CAST(128 AS BIGINT) AS s FROM part UNION ALL SELECT id, CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN s - 1 - y ELSE y END) ELSE x END, CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN s - 1 - x ELSE x END) ELSE y END, d + s * s * xor(3 * rx, ry), s // 2 FROM (SELECT id, x, y, d, s, CASE WHEN (x & s) > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS rx, CASE WHEN (y & s) > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS ry FROM h WHERE s > 0)) SELECT id AS p_partkey, d AS h FROM h WHERE s = 0 ORDER BY p_partkey""",

    "q_time_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type, COUNT(*) AS n_events, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    "q_stream_enrich" ->
      """SELECT event_id, user_id, c_mktsegment FROM events LEFT JOIN customer ON user_id = c_custkey ORDER BY event_id""",
    // rollup/cube/grouping-sets nulls sort FIRST in Spark's asc default
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus) ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority) ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q_grouping_sets" ->
      """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_customers, CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acct_total FROM customer GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey)) ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""",
    "q_pivot" ->
      """SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_linestatus = 'F') AS DOUBLE) AS qty_f, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_linestatus = 'O') AS DOUBLE) AS qty_o FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_percentile" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.25) AS q25, quantile_cont(l_quantity, 0.5) AS q50, quantile_cont(l_quantity, 0.75) AS q75, MIN(l_quantity) AS q_min, MAX(l_quantity) AS q_max FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_stats_moments" ->
      """WITH s AS (SELECT l_returnflag, COUNT(*) AS n, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy, SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx, SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy, SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy FROM lineitem GROUP BY l_returnflag) SELECT l_returnflag, n, CAST(sx AS DOUBLE) / n AS mean_qty, CAST(n * sxx - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)) AS var_qty, CAST(n * sxy - sx * sy AS DOUBLE) / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_qty_price FROM s ORDER BY l_returnflag""",
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend, lag(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_orderkey, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS nth_order FROM orders ORDER BY o_custkey, o_orderkey"""
  )
}
