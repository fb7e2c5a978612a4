package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.io.{Sinks, Sources}
import graft.ops.{AnnotateOps, GeneOps, VariantOps}

/** End-to-end pipeline compositions mirroring the reference entry points
  * (SURVEY.md §3 EP1–EP3; reference eggv/pipeline.py, eggv/process.py:318-536,
  * eggv/annotate.py:145-296).
  *
  * The reference's manual persist/gather choreography collapses to Spark's
  * standard driver/executor model: one `.persist()` at the shared sub-plan
  * (the processed-variant frame feeds both the effects and metadata
  * outputs — Catalyst does not CSE across actions, so this is kept in
  * engine code, SURVEY.md §4), plain blocking actions elsewhere.
  *
  * The reference loops chromosome files one at a time (eggv/process.py:398);
  * here one glob reads all chromosomes as a single distributed dataset —
  * Spark schedules the whole build at once, which is the 1000-executor-
  * friendly shape. MEMORY_AND_DISK persist so a 249 GB intermediate spills
  * instead of reproducing the reference's 400 GB-RAM cliff
  * (readme.rst:243-249).
  */
object Pipeline {

  final case class VariantOutputs(effects: DataFrame, metadata: DataFrame)
  final case class AnnotationOutputs(intergenic: DataFrame, intragenic: DataFrame)

  /** EP1 core: GVF path/glob → processed → (effects, metadata). */
  def processVariants(spark: SparkSession, gvfPath: String): VariantOutputs = {
    val processed = VariantOps.processGvf(Sources.readGvf(spark, gvfPath))
      .persist(StorageLevel.MEMORY_AND_DISK)
    VariantOutputs(
      effects = VariantOps.isolateEffects(processed),
      metadata = VariantOps.isolateMetadata(processed))
  }

  /** EP1 gene branch: GTF path → processed genes (+ deduped view). */
  def processGenes(spark: SparkSession, gtfPath: String): DataFrame =
    GeneOps.processGtf(Sources.readGtf(spark, gtfPath))

  /** EP2: processed effects × processed genes → intergenic/intragenic. */
  def annotate(vdf: DataFrame, gdf: DataFrame): AnnotationOutputs = {
    val annotated = AnnotateOps.annotateVariants(vdf, gdf)
    AnnotationOutputs(
      intergenic = AnnotateOps.isolateIntergenic(annotated),
      intragenic = AnnotateOps.isolateIntragenic(annotated))
  }

  /** EP3: the fused complete pipeline, raw GVF + GTF in, all six outputs
    * written under `outDir`. Single Spark job graph per output; the
    * download/unzip stages of the reference (eggv/retrieve.py) are out of
    * engine scope (SURVEY.md §2.1 S5/S6).
    */
  def complete(spark: SparkSession, gvfPath: String, gtfPath: String, outDir: String): Unit = {
    val variants = processVariants(spark, gvfPath)
    val genes = processGenes(spark, gtfPath).persist(StorageLevel.MEMORY_AND_DISK)

    Sinks.writeTsv(variants.effects, s"$outDir/variant-effects")
    Sinks.writeTsv(variants.metadata, s"$outDir/variant-metadata")
    Sinks.writeTsv(genes, s"$outDir/genes")
    Sinks.writeTsv(GeneOps.dedupGenes(genes), s"$outDir/genes-deduped")

    val ann = annotate(variants.effects, genes)
    Sinks.writeTsv(ann.intergenic, s"$outDir/intergenic")
    Sinks.writeTsv(ann.intragenic, s"$outDir/intragenic")

    genes.unpersist()
  }
}
