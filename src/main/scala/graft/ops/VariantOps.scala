package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GVF variant processing: the regex-extraction battery, effect explode and
  * effects/metadata isolation (SURVEY.md §2.5, §2.6, §2.8).
  *
  * Everything is built from codegen'd Catalyst expressions — one
  * whole-stage-codegen pass per scan, no UDFs, no per-row interpretation —
  * which is what replaces the reference's interpreted pandas kernels
  * (eggv/process.py:100-180).
  */
object VariantOps {

  /** Spark's regexp_extract returns '' on miss; pandas str.extract returns
    * NaN. Wrap to restore null-on-miss so downstream null semantics (drop,
    * fillna) match the reference exactly (SURVEY.md §7.5.2). */
  private def extractOrNull(c: Column, pattern: String): Column =
    nullif(regexp_extract(c, pattern, 1), lit(""))

  /** Process raw GVF rows into the intermediate variant representation.
    * reference: _process_gvf, eggv/process.py:100-180.
    *
    * Chain: project → 'chr' prefix → rsid extract (X1) + drop misses (F1) →
    * strip/cast (X2) → allele extracts (X3) → observed concat (X4) → MAF
    * extract (X5) → effect-blob extract (X6) → split+explode (G1/X7) →
    * per-effect token split (X8).
    *
    * Quirks preserved verbatim for parity (SURVEY.md §7.5.5):
    *  - the effect regex `Variant_effect=(.+?);` requires a trailing ';' —
    *    an unterminated effect attr is silently treated as intergenic
    *    (eggv/process.py:158);
    *  - allele regexes only accept [-,ACGT] (eggv/process.py:134-135).
    */
  def processGvf(df: DataFrame): DataFrame = {
    val effectTokens = split(col("effect"), " ")
    df
      // early projection: prune to the 4 needed columns before regex work
      // (eggv/process.py:115) — free with Catalyst, declared for clarity
      .select(col("seqid"), col("start"), col("end"), col("attr"))
      .withColumn("chromosome", concat(lit("chr"), col("seqid").cast(StringType)))
      .withColumn("rsid", extractOrNull(col("attr"), """Dbxref=dbSNP_\d+:(rs\d+)"""))
      .filter(col("rsid").isNotNull)
      .withColumn("rsid", regexp_replace(col("rsid"), "^rs", "").cast(LongType))
      .withColumn("var_allele",
        coalesce(extractOrNull(col("attr"), """Variant_seq=([-,ACGT]+)"""), lit("-")))
      .withColumn("ref_allele",
        coalesce(extractOrNull(col("attr"), """Reference_seq=([-,ACGT]+)"""), lit("-")))
      .withColumn("observed", concat_ws(",", col("var_allele"), col("ref_allele")))
      .withColumn("maf",
        coalesce(
          extractOrNull(col("attr"), """global_minor_allele_frequency=\d+\|([.0-9]+)""")
            .cast(FloatType),
          lit(0.0f)))
      .withColumn("effect",
        coalesce(extractOrNull(col("attr"), """Variant_effect=(.+?);"""), lit("intergenic")))
      // one row per (variant × effect); explode(split(...)) never drops a
      // row here because the effect column is non-null by construction.
      // (The reference re-fills 'intergenic' after its explode,
      // eggv/process.py:166, because pandas explode of an empty list emits
      // NaN — Spark's split can't produce that, so no second fill.)
      .withColumn("effect", explode(split(col("effect"), ",")))
      // effect token layout: `term idx feature_type transcript`
      // (eggv/process.py:154-157); try_element_at → null when absent
      // (ANSI-safe), then '' to match the reference's fillna
      // (eggv/process.py:171)
      .withColumn("transcript",
        coalesce(try_element_at(effectTokens, lit(4)), lit("")).cast(StringType))
      .withColumn("effect", try_element_at(effectTokens, lit(1)))
      .select("chromosome", "rsid", "start", "end", "observed", "maf", "effect", "transcript")
  }

  /** Isolate (rsid, effect, transcript) with exact global dedup (D1).
    *
    * Deliberate deviation: the reference dedups per-partition only
    * (eggv/process.py:289-294), so its output depends on file split
    * boundaries. Global dropDuplicates is deterministic and strictly
    * stronger (SURVEY.md §7.5.1); the shuffle it costs is on a 3-column
    * projection, not the full row.
    */
  def isolateEffects(df: DataFrame): DataFrame =
    df.select("rsid", "effect", "transcript").dropDuplicates()

  /** Effects with the chromosome retained, deduped per chromosome — the
    * frame to write with `partitionBy("chromosome")` for the reference's
    * one-output-per-chromosome layout (eggv/process.py:394-424: the
    * reference processes and dedups each chromosome file independently, so
    * per-(chromosome, rsid, effect, transcript) dedup IS its semantics).
    * The written files carry the same (rsid, effect, transcript) columns
    * as `isolateEffects` — partitionBy moves chromosome into the
    * directory name. */
  def isolateEffectsByChromosome(df: DataFrame): DataFrame =
    df.select("chromosome", "rsid", "effect", "transcript").dropDuplicates()

  /** Isolate per-variant metadata, one row per rsid (D2).
    *
    * The reference keeps the first row per rsid within each partition
    * (eggv/process.py:297-315) — itself nondeterministic across splits.
    * We keep the row with the minimal (chromosome, start, end, observed,
    * maf) tuple per rsid via an aggregate: deterministic, and executed as
    * partial (map-side) min + final min — same shuffle as dropDuplicates
    * but with a stable winner. For a variant, all duplicate rows carry
    * identical metadata anyway (dupes arise only from the effect explode),
    * so this matches the reference wherever the reference is well-defined.
    */
  def isolateMetadata(df: DataFrame): DataFrame =
    df.groupBy(col("rsid"))
      .agg(
        min(struct(col("chromosome"), col("start"), col("end"), col("observed"), col("maf")))
          .as("m"))
      .select(
        col("m.chromosome"), col("m.start"), col("m.end"),
        col("rsid"), col("m.observed"), col("m.maf"))
}
