package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{AnnotateOps, GeneOps, VariantOps}
import graft.streaming.StreamingOps

/** The reference's own operator chains — run through the REAL engine code
  * (VariantOps/AnnotateOps/StreamingOps, not re-inlined expressions) — put
  * under the DuckDB oracle gate by synthesizing GVF-shaped inputs from the
  * shared parquet tables. The golden-file ScalaTests pin the byte-level
  * quirks; these queries prove the same operators agree with an independent
  * SQL engine on 10k+ generated attr strings, including the miss/edge paths
  * (absent rsid, missing alleles, no-MAF, unterminated Variant_effect).
  */
object PipelineQueries {

  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    // ts contract downstream: epoch NANOS as Long. parquet timestamp[ns]
    // arrives that way via nanosAsLong; timestamp[us]/[ms] arrive as a
    // timestamp type — normalize through µs in the UTC session (DuckDB
    // reads the same naive instants, so oracles agree either way).
    raw.schema("ts").dataType match {
      case LongType => raw
      case _ => raw.withColumn("ts",
        unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    }
  }

  /** GVF-shaped rows from events: ~10% lack an rsid, ~1/3 lack a variant
    * allele, ~1/5 carry a MAF, ~1/4 carry a 2-effect attr, ~1/4 an
    * UNTERMINATED effect attr (the X6 trailing-';' quirk path). Mirrored
    * verbatim in the oracle SQL. */
  private def syntheticGvf(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      col("user_id").cast(StringType).as("seqid"),
      col("event_id").as("start"),
      (col("event_id") + 1).as("end"),
      concat(
        when(col("event_id") % 10 =!= 0,
          concat(lit("Dbxref=dbSNP_151:rs"), col("event_id").cast(StringType), lit(";")))
          .otherwise(lit("")),
        when(col("event_id") % 3 =!= 0, lit("Variant_seq=A;")).otherwise(lit("")),
        lit("Reference_seq=G;"),
        when(col("event_id") % 5 === 0,
          concat(lit("global_minor_allele_frequency=1|0."),
            (col("event_id") % 97).cast(StringType), lit("|x;")))
          .otherwise(lit("")),
        when(col("event_id") % 4 === 0,
          concat(lit("Variant_effect=intron_variant 0 primary_transcript ENST"),
            col("user_id").cast(StringType),
            lit(",missense_variant 0 mRNA ENST"),
            (col("user_id") + 1).cast(StringType), lit(";")))
          .when(col("event_id") % 4 === 1,
            // unterminated on purpose: the reference regex silently misses it
            concat(lit("Variant_effect=intron_variant 0 mRNA ENST"),
              col("user_id").cast(StringType)))
          .otherwise(lit(""))
      ).as("attr"))

  /** Shared SQL CTE reproducing syntheticGvf. (Plain strings on purpose:
    * stripMargin on a string that embeds SQL would eat the first pipe of
    * every `||` concat operator.) */
  private val gvfSql =
    """gvf AS (
  SELECT CAST(user_id AS VARCHAR) AS seqid, event_id AS start, event_id + 1 AS "end",
    (CASE WHEN event_id % 10 != 0 THEN 'Dbxref=dbSNP_151:rs' || CAST(event_id AS VARCHAR) || ';' ELSE '' END)
    || (CASE WHEN event_id % 3 != 0 THEN 'Variant_seq=A;' ELSE '' END)
    || 'Reference_seq=G;'
    || (CASE WHEN event_id % 5 = 0 THEN 'global_minor_allele_frequency=1|0.' || CAST(event_id % 97 AS VARCHAR) || '|x;' ELSE '' END)
    || (CASE WHEN event_id % 4 = 0 THEN 'Variant_effect=intron_variant 0 primary_transcript ENST' || CAST(user_id AS VARCHAR) || ',missense_variant 0 mRNA ENST' || CAST(user_id + 1 AS VARCHAR) || ';'
             WHEN event_id % 4 = 1 THEN 'Variant_effect=intron_variant 0 mRNA ENST' || CAST(user_id AS VARCHAR)
             ELSE '' END) AS attr
  FROM events)"""

  /** SQL replica of the _process_gvf battery over the gvf CTE. */
  private val processedSql =
    s"""WITH $gvfSql,
proc AS (
  SELECT 'chr' || seqid AS chromosome,
    CAST(regexp_replace(regexp_extract(attr, 'Dbxref=dbSNP_\\d+:(rs\\d+)', 1), '^rs', '') AS BIGINT) AS rsid,
    start, "end",
    COALESCE(NULLIF(regexp_extract(attr, 'Variant_seq=([-,ACGT]+)', 1), ''), '-')
      || ',' || COALESCE(NULLIF(regexp_extract(attr, 'Reference_seq=([-,ACGT]+)', 1), ''), '-') AS observed,
    CAST(COALESCE(CAST(NULLIF(regexp_extract(attr, 'global_minor_allele_frequency=\\d+\\|([.0-9]+)', 1), '') AS FLOAT), 0.0) AS FLOAT) AS maf,
    COALESCE(NULLIF(regexp_extract(attr, 'Variant_effect=(.+?);', 1), ''), 'intergenic') AS effect_blob
  FROM gvf WHERE regexp_extract(attr, 'Dbxref=dbSNP_\\d+:(rs\\d+)', 1) != ''),
exploded AS (
  SELECT chromosome, rsid, start, "end", observed, maf,
    unnest(string_split(effect_blob, ',')) AS eff
  FROM proc),
variants AS (
  SELECT chromosome, rsid, start, "end", observed, maf,
    string_split(eff, ' ')[1] AS effect,
    COALESCE(string_split(eff, ' ')[4], '') AS transcript
  FROM exploded)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the full GVF regex battery + explode, through VariantOps.processGvf
    "q_variant_pipeline" -> ((s, dir) =>
      VariantOps.processGvf(syntheticGvf(s, dir))
        .orderBy("rsid", "effect", "transcript")),

    // effects isolation (global dedup) + the J1 broadcast left join +
    // intragenic split (D4), through AnnotateOps
    "q_annotate_pipeline" -> ((s, dir) => {
      val effects = VariantOps.isolateEffects(VariantOps.processGvf(syntheticGvf(s, dir)))
      val genes = s.read.parquet(s"$dir/customer.parquet")
        .filter(col("c_custkey") % 2 === 0)
        .select(
          concat(lit("chr"), (col("c_custkey") % 22).cast(StringType)).as("chromosome"),
          col("c_custkey").as("start"),
          (col("c_custkey") + 100).as("end"),
          concat(lit("ENST"), col("c_custkey").cast(StringType)).as("transcript_id"),
          concat(lit("ENSG"), (col("c_custkey") * 10).cast(StringType)).as("gene_id"),
          concat(lit("G"), col("c_custkey").cast(StringType)).as("gene_name"),
          lit("protein_coding").as("biotype"))
      AnnotateOps.annotateVariants(effects, genes)
        .orderBy("rsid", "variant_effect", "transcript")
    }),

    // intragenic split + (rsid, effect, gene) dedup through AnnotateOps
    "q_intragenic_pipeline" -> ((s, dir) => {
      val effects = VariantOps.isolateEffects(VariantOps.processGvf(syntheticGvf(s, dir)))
      val genes = s.read.parquet(s"$dir/customer.parquet")
        .filter(col("c_custkey") % 2 === 0)
        .select(
          lit("chrX").as("chromosome"), col("c_custkey").as("start"),
          (col("c_custkey") + 100).as("end"),
          concat(lit("ENST"), col("c_custkey").cast(StringType)).as("transcript_id"),
          concat(lit("ENSG"), (col("c_custkey") * 10).cast(StringType)).as("gene_id"),
          concat(lit("G"), col("c_custkey").cast(StringType)).as("gene_name"),
          lit("protein_coding").as("biotype"))
      AnnotateOps.isolateIntragenic(AnnotateOps.annotateVariants(effects, genes))
        .orderBy("rsid", "variant_effect", "gene_id")
    }),

    // the GTF attr battery (X9) through GeneOps.processGtf: quoted-attr
    // extracts, version-suffix exclusion, hyphen-truncating gene_name
    // regex, missing-biotype → 'NA', dropna on ids, non-transcript filter
    "q_gene_pipeline" -> ((s, dir) =>
      GeneOps.processGtf(
        s.read.parquet(s"$dir/part.parquet").select(
          (col("p_partkey") % 22).cast(StringType).as("seqname"),
          lit("ensembl").as("source"),
          when(col("p_partkey") % 3 === 0, lit("transcript")).otherwise(lit("exon")).as("feature"),
          col("p_partkey").as("start"),
          (col("p_partkey") + 500).as("end"),
          lit(".").as("score"), lit("+").as("strand"), lit(".").as("frame"),
          concat(
            when(col("p_partkey") % 5 =!= 0,
              concat(lit("gene_id \"ENSG"), (col("p_partkey") * 3).cast(StringType), lit("\"; ")))
              .otherwise(lit("")),
            lit("gene_version \"16\"; "),
            concat(lit("transcript_id \"ENST"), col("p_partkey").cast(StringType), lit("\"; ")),
            when(col("p_partkey") % 4 === 0,
              concat(lit("gene_name \"X-"), col("p_partkey").cast(StringType), lit("\"; ")))
              .when(col("p_partkey") % 4 === 1,
                concat(lit("gene_name \"N"), col("p_partkey").cast(StringType), lit("\"; ")))
              .otherwise(lit("")),
            when(col("p_partkey") % 7 =!= 0, lit("gene_biotype \"protein_coding\"; "))
              .otherwise(lit(""))).as("attr")))
        .orderBy("transcript_id")),

    // backward as-of join: each purchase matched to the user's latest
    // at-or-before signup (union + ordered window, one shuffle)
    "q_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id").as("signup_id"))
      graft.operators.AsOfJoin.asofBackward(
          purchases, signups, Seq("user_id"), "ts", Seq("signup_id"), "signup_ts")
        // µs-truncated output: DuckDB's parquet reader truncates ns→µs, so
        // the oracle cannot observe full nanosecond values
        .select(col("event_id"), col("user_id"),
          expr("ts DIV 1000").as("ts_us"),
          expr("signup_ts DIV 1000").as("signup_ts_us"),
          col("signup_id"))
        .orderBy("event_id")
    }),

    // forward as-of: each purchase matched to the user's EARLIEST signup
    // at-or-after (mirror window frame, same one-shuffle shape)
    "q_asof_forward" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id").as("signup_id"))
      graft.operators.AsOfJoin.asofForward(
          purchases, signups, Seq("user_id"), "ts", Seq("signup_id"), "signup_ts")
        .select(col("event_id"), col("user_id"),
          expr("ts DIV 1000").as("ts_us"),
          expr("signup_ts DIV 1000").as("signup_ts_us"),
          col("signup_id"))
        .orderBy("event_id")
    }),

    // positional (interval) annotation — the generalization the reference
    // skipped: variants matched to genes by coordinate containment via the
    // binned range join, not transcript equality
    "q_interval_annotate" -> ((s, dir) => {
      val variants = VariantOps.processGvf(syntheticGvf(s, dir))
        .select("chromosome", "rsid", "start").distinct()
      val genes = s.read.parquet(s"$dir/customer.parquet")
        .filter(col("c_custkey") % 2 === 0)
        .select(
          concat(lit("chr"), (col("c_custkey") % 22).cast(StringType)).as("chromosome"),
          (col("c_custkey") * 5).as("g_start"),
          (col("c_custkey") * 5 + 400).as("g_end"),
          concat(lit("ENSG"), (col("c_custkey") * 10).cast(StringType)).as("gene_id"))
      graft.operators.IntervalJoin.pointInInterval(
          variants, genes, "start", "g_start", "g_end",
          Seq("chromosome"), binSize = 500L)
        .select("chromosome", "rsid", "start", "gene_id")
        .orderBy("rsid", "start", "gene_id")
    }),

    // stream-stream interval join in batch mode (identical plan/result
    // under two MemoryStreams — StreamingOpsSpec proves it): purchases
    // matched to the same user's clicks in the preceding hour
    "q_stream_interval_join" -> ((s, dir) => {
      val ev = StreamingOps.nanosToTimestamp(events(s, dir))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts"))
      StreamingOps.intervalJoinStreams(purchases, clicks, "user_id", "p_ts", "c_ts",
          before = "1 hour", after = "0 seconds")
        .select(col("purchase_id"), col("click_id"), col("user_id"),
          unix_millis(col("p_ts")).as("p_ms"), unix_millis(col("c_ts")).as("c_ms"))
        .orderBy("purchase_id", "click_id")
    }),

    // left-outer variant: every purchase survives; one with no same-user
    // click in the preceding hour carries null click columns (in streaming
    // mode the null row is emitted once the click watermark passes — the
    // StreamingOpsSpec proves batch/stream parity)
    "q_stream_interval_join_left" -> ((s, dir) => {
      val ev = StreamingOps.nanosToTimestamp(events(s, dir))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts"))
      StreamingOps.intervalJoinStreams(purchases, clicks, "user_id", "p_ts", "c_ts",
          before = "1 hour", after = "0 seconds", joinType = "left_outer")
        .select(col("purchase_id"), col("click_id"), col("user_id"),
          unix_millis(col("p_ts")).as("p_ms"), unix_millis(col("c_ts")).as("c_ms"))
        .orderBy("purchase_id", "click_id")
    }),

    // session windows over event time, through StreamingOps (batch mode —
    // the identical plan runs under readStream with the same results)
    "q_session_window" -> ((s, dir) =>
      StreamingOps.sessionWindowStats(
          StreamingOps.nanosToTimestamp(events(s, dir)), "30 minutes")
        .select(col("user_id"), unix_millis(col("session_start")).as("session_start_ms"),
          col("n_events"), col("total_value"))
        .orderBy("user_id", "session_start_ms"))
  )

  private val genesSql =
    """genes AS (
  SELECT 'ENST' || CAST(c_custkey AS VARCHAR) AS transcript_id,
    'ENSG' || CAST(c_custkey * 10 AS VARCHAR) AS gene_id,
    'G' || CAST(c_custkey AS VARCHAR) AS gene_name,
    'protein_coding' AS biotype,
    'chr' || CAST(c_custkey % 22 AS VARCHAR) AS chromosome
  FROM customer WHERE c_custkey % 2 = 0)"""

  val oracles: Map[String, String] = Map(
    "q_gene_pipeline" ->
      """WITH gtf AS (
  SELECT CAST(p_partkey % 22 AS VARCHAR) AS seqname,
    CASE WHEN p_partkey % 3 = 0 THEN 'transcript' ELSE 'exon' END AS feature,
    p_partkey AS start, p_partkey + 500 AS "end",
    (CASE WHEN p_partkey % 5 != 0 THEN 'gene_id "ENSG' || CAST(p_partkey * 3 AS VARCHAR) || '"; ' ELSE '' END)
    || 'gene_version "16"; '
    || 'transcript_id "ENST' || CAST(p_partkey AS VARCHAR) || '"; '
    || (CASE WHEN p_partkey % 4 = 0 THEN 'gene_name "X-' || CAST(p_partkey AS VARCHAR) || '"; '
             WHEN p_partkey % 4 = 1 THEN 'gene_name "N' || CAST(p_partkey AS VARCHAR) || '"; '
             ELSE '' END)
    || (CASE WHEN p_partkey % 7 != 0 THEN 'gene_biotype "protein_coding"; ' ELSE '' END) AS attr
  FROM part),
x AS (
  SELECT seqname, start, "end",
    regexp_extract(attr, 'gene_id "(ENS[A-Z]*\d+)"', 1) AS gene_id,
    regexp_extract(attr, 'transcript_id "(ENS[A-Z]*\d+)"', 1) AS transcript_id,
    COALESCE(NULLIF(regexp_extract(attr, 'biotype "(\w+)"', 1), ''), 'NA') AS biotype,
    COALESCE(NULLIF(regexp_extract(attr, 'gene_name "(\w+)"', 1), ''), 'NA') AS gene_name
  FROM gtf WHERE feature = 'transcript')
SELECT 'chr' || seqname AS chromosome, start, "end", transcript_id, gene_id, gene_name, biotype
FROM x WHERE gene_id != '' AND transcript_id != ''
ORDER BY transcript_id""",
    "q_variant_pipeline" ->
      s"""$processedSql SELECT chromosome, rsid, start, "end", observed, maf, effect, transcript FROM variants ORDER BY rsid, effect, transcript""",
    "q_annotate_pipeline" ->
      s"""$processedSql, effects AS (SELECT DISTINCT rsid, effect, transcript FROM variants), $genesSql
SELECT g.chromosome, e.rsid, e.effect AS variant_effect, e.transcript, g.gene_id, g.gene_name, g.biotype AS gene_biotype
FROM effects e LEFT JOIN genes g ON e.transcript = g.transcript_id
ORDER BY rsid, variant_effect, transcript""",
    "q_intragenic_pipeline" ->
      s"""$processedSql, effects AS (SELECT DISTINCT rsid, effect, transcript FROM variants), $genesSql,
annotated AS (
  SELECT e.rsid, e.effect AS variant_effect, g.gene_id, g.gene_name, g.biotype AS gene_biotype
  FROM effects e LEFT JOIN genes g ON e.transcript = g.transcript_id)
SELECT DISTINCT rsid, variant_effect, gene_id, gene_name, gene_biotype
FROM annotated
WHERE variant_effect NOT IN ('intergenic', 'upstream_gene_variant', 'downstream_gene_variant')
  AND gene_id IS NOT NULL
ORDER BY rsid, variant_effect, gene_id""",
    "q_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
s AS (SELECT user_id, ts, event_id AS signup_id FROM events WHERE event_type = 'signup')
SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, epoch_us(s.ts) AS signup_ts_us, s.signup_id
FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
ORDER BY p.event_id""",
    "q_interval_annotate" ->
      s"""$processedSql, v AS (SELECT DISTINCT chromosome, rsid, start FROM variants),
g AS (SELECT 'chr' || CAST(c_custkey % 22 AS VARCHAR) AS chromosome, c_custkey * 5 AS g_start, c_custkey * 5 + 400 AS g_end, 'ENSG' || CAST(c_custkey * 10 AS VARCHAR) AS gene_id FROM customer WHERE c_custkey % 2 = 0)
SELECT v.chromosome, v.rsid, v.start, g.gene_id
FROM v JOIN g ON v.chromosome = g.chromosome AND v.start >= g.g_start AND v.start <= g.g_end
ORDER BY rsid, start, gene_id""",
    "q_asof_forward" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
s AS (SELECT user_id, ts, event_id AS signup_id FROM events WHERE event_type = 'signup')
SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, epoch_us(s.ts) AS signup_ts_us, s.signup_id
FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts <= s.ts
ORDER BY p.event_id""",
    // joins on µs-TRUNCATED integer timestamps: the Spark side compares
    // after the ns->µs truncation, so the oracle must too (a ns-precision
    // comparison could flip a pair sitting inside the same microsecond)
    "q_stream_interval_join" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS p_us FROM events WHERE event_type = 'purchase'), c AS (SELECT event_id AS click_id, user_id, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS c_us FROM events WHERE event_type = 'click') SELECT purchase_id, click_id, p.user_id AS user_id, p_us // 1000 AS p_ms, c_us // 1000 AS c_ms FROM p JOIN c ON p.user_id = c.user_id AND c_us >= p_us - 3600000000 AND c_us <= p_us ORDER BY purchase_id, click_id""",
    "q_stream_interval_join_left" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS p_us FROM events WHERE event_type = 'purchase'), c AS (SELECT event_id AS click_id, user_id, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS c_us FROM events WHERE event_type = 'click') SELECT purchase_id, click_id, p.user_id AS user_id, p_us // 1000 AS p_ms, c_us // 1000 AS c_ms FROM p LEFT JOIN c ON p.user_id = c.user_id AND c_us >= p_us - 3600000000 AND c_us <= p_us ORDER BY purchase_id, click_id NULLS FIRST""",
    "q_session_window" ->
      """WITH m AS (
  SELECT user_id, ts, value,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events),
s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM m)
SELECT user_id, CAST(epoch_ns(min(ts)) // 1000000 AS BIGINT) AS session_start_ms, COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_ms"""
  )
}
