package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Variant↔gene annotation: the reference's single join plus the
  * intergenic/intragenic split (SURVEY.md §2.7 J1, §2.4 F4/F5, §2.8 D4).
  * reference: eggv/annotate.py:55-142. */
object AnnotateOps {

  private val intergenicEffects =
    Seq("intergenic", "upstream_gene_variant", "downstream_gene_variant")

  /** Left equi-join of variant effects to genes on transcript ID
    * (eggv/annotate.py:55-94). Left join so unmatched (intergenic)
    * variants survive with null gene columns.
    *
    * Scale: one GTF build is ~200k transcript rows (a few MB) against a
    * ~100 GB effects table — the textbook broadcast-hash-join shape, so the
    * gene side is broadcast explicitly. No shuffle of the big side at all,
    * which replaces the reference's npartitions=100 shuffle merge
    * (eggv/annotate.py:76).
    */
  def annotateVariants(vdf: DataFrame, gdf: DataFrame): DataFrame = {
    val genes = gdf.select(
      col("chromosome"), col("transcript_id"), col("gene_id"),
      col("gene_name"), col("biotype"))
    vdf
      .join(broadcast(genes), vdf("transcript") === genes("transcript_id"), "left")
      // output columns per eggv/annotate.py:80-94; the variant-effects side
      // carries no chromosome, so `chromosome` is the gene's (null when
      // unmatched), exactly as the reference's suffix logic resolves it
      .select(
        genes("chromosome"),
        vdf("rsid"),
        vdf("effect").as("variant_effect"),
        vdf("transcript"),
        genes("gene_id"),
        genes("gene_name"),
        genes("biotype").as("gene_biotype"))
  }

  /** Intergenic subset (F4, eggv/annotate.py:97-117): effect is intergenic
    * or up/downstream. */
  def isolateIntergenic(df: DataFrame): DataFrame =
    df.filter(col("variant_effect").isin(intergenicEffects: _*))
      .select("rsid", "variant_effect")

  /** Intragenic subset (F5 + D4, eggv/annotate.py:120-142): everything
    * else that matched a gene, deduped on (rsid, variant_effect, gene_id).
    * The reference's split_out=100 shuffle hint is subsumed by
    * spark.sql.shuffle.partitions + AQE coalescing.
    *
    * Two-phase dedup instead of a single `dropDuplicates(subset)`: the
    * subset form compiles to `First(gene_name), First(gene_biotype)` whose
    * string agg buffers disqualify HashAggregate, so Spark plans
    * SortAggregate with TWO full sorts of the joined frame. Phase 1 is a
    * buffer-free distinct over all five columns (pure HashAggregate,
    * map-side partial combine); phase 2 picks a deterministic min-struct
    * winner per key — it only does real work when a gene build violates
    * gene_id → (name, biotype) functional dependence, and runs on the
    * already-deduped frame. Deterministic where the reference's
    * pandas-order `drop_duplicates` is positional. */
  def isolateIntragenic(df: DataFrame): DataFrame =
    df.filter(!col("variant_effect").isin(intergenicEffects: _*) &&
        col("gene_id").isNotNull)
      .select("rsid", "variant_effect", "gene_id", "gene_name", "gene_biotype")
      .distinct()
      // barrier: without it RemoveRedundantAggregates folds the distinct
      // into the min-struct aggregate (min is duplicate-insensitive) and
      // the plan degrades back to SortAggregate over the full frame. The
      // repartition is on the second aggregate's keys, so it satisfies its
      // required distribution — the min-struct agg adds NO extra exchange,
      // just a partition-local sort of the already-deduped rows.
      .repartition(col("rsid"), col("variant_effect"), col("gene_id"))
      .groupBy("rsid", "variant_effect", "gene_id")
      .agg(min(struct(col("gene_name"), col("gene_biotype"))).as("g"))
      .select(col("rsid"), col("variant_effect"), col("gene_id"),
        col("g.gene_name").as("gene_name"),
        col("g.gene_biotype").as("gene_biotype"))
}
