package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GTF gene processing (SURVEY.md §2.5 X9, §2.8 D3).
  * reference: _process_gtf, eggv/process.py:183-233. */
object GeneOps {

  private def extractOrNull(c: Column, pattern: String): Column =
    nullif(regexp_extract(c, pattern, 1), lit(""))

  /** Process raw GTF rows into the processed-genes table.
    *
    * Quirks preserved for parity (SURVEY.md §7.5.5):
    *  - ID regexes deliberately exclude the version suffix
    *    (`(ENS[A-Z]*\d+)`, eggv/process.py:202-205);
    *  - `biotype "(\w+)"` matches the FIRST `…biotype` occurrence, which is
    *    gene_biotype in Ensembl attr order (eggv/process.py:208);
    *  - `gene_name "(\w+)"` truncates hyphenated names at the hyphen
    *    (eggv/process.py:212).
    */
  def processGtf(df: DataFrame): DataFrame =
    df
      // keep transcript features only (F3) — annotation is by transcript ID
      .filter(col("feature") === "transcript")
      .withColumn("gene_id", extractOrNull(col("attr"), """gene_id "(ENS[A-Z]*\d+)""""))
      .withColumn("transcript_id", extractOrNull(col("attr"), """transcript_id "(ENS[A-Z]*\d+)""""))
      .withColumn("biotype",
        coalesce(extractOrNull(col("attr"), """biotype "(\w+)""""), lit("NA")))
      .withColumn("gene_name",
        coalesce(extractOrNull(col("attr"), """gene_name "(\w+)""""), lit("NA")))
      // drop rows missing identifiers (F2, eggv/process.py:216)
      .na.drop(Seq("gene_id", "transcript_id"))
      .select(
        concat(lit("chr"), col("seqname").cast(StringType)).as("chromosome"),
        col("start").cast(LongType).as("start"),
        col("end").cast(LongType).as("end"),
        col("transcript_id"), col("gene_id"), col("gene_name"), col("biotype"))

  /** Global dedup on gene_id (D3, eggv/process.py:498-500).
    *
    * Deterministic variant of dropDuplicates("gene_id"): keeps the minimal
    * full row per gene — partial-aggregated map-side, one shuffle on
    * gene_id. Reference keep-first is partition-order-dependent.
    */
  def dedupGenes(df: DataFrame): DataFrame =
    df.groupBy(col("gene_id"))
      .agg(min(struct(
        col("chromosome"), col("start"), col("end"),
        col("transcript_id"), col("gene_name"), col("biotype"))).as("m"))
      .select(
        col("m.chromosome"), col("m.start"), col("m.end"),
        col("m.transcript_id"), col("gene_id"), col("m.gene_name"), col("m.biotype"))
}
