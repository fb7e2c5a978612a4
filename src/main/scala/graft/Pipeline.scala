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

  /** The two variant outputs plus a handle on their shared persisted
    * parent: callers MUST `unpersist()` once both outputs are consumed, or
    * the 249 GB-class processed-variant intermediate stays pinned for the
    * session. */
  final case class VariantOutputs(
      effects: DataFrame, metadata: DataFrame, processed: DataFrame) {
    def unpersist(): Unit = processed.unpersist()
  }
  final case class AnnotationOutputs(intergenic: DataFrame, intragenic: DataFrame)

  /** EP1 core: GVF path/glob → processed → (effects, metadata). */
  def processVariants(spark: SparkSession, gvfPath: String): VariantOutputs = {
    val processed = VariantOps.processGvf(Sources.readGvf(spark, gvfPath))
      .persist(StorageLevel.MEMORY_AND_DISK)
    VariantOutputs(
      effects = VariantOps.isolateEffects(processed),
      metadata = VariantOps.isolateMetadata(processed),
      processed = processed)
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
    * written under `outDir`. Retrieval from URLs is the caller's staging
    * step (graft.io.Retrieve — Main's `complete`/`retrieve` commands wire
    * it). `chromosomePartitioned` switches the two variant outputs to the
    * reference's per-chromosome layout (`chromosome=chrN/` directories,
    * partition-pruned re-reads).
    */
  def complete(spark: SparkSession, gvfPath: String, gtfPath: String, outDir: String,
      chromosomePartitioned: Boolean = false): Unit =
    completeTo(spark, gvfPath, gtfPath,
      effectsDir = s"$outDir/variant-effects",
      metadataDir = s"$outDir/variant-metadata",
      genesDir = s"$outDir/genes",
      genesDedupedDir = s"$outDir/genes-deduped",
      intergenicDir = s"$outDir/intergenic",
      intragenicDir = s"$outDir/intragenic",
      chromosomePartitioned = chromosomePartitioned)

  /** EP3 over a `Catalog` layout (reference eggv/globe.py:64-109): raw
    * inputs at the catalog's raw locations, outputs to its
    * processed/annotated dirs. */
  def completeCatalog(spark: SparkSession, cat: Catalog,
      chromosomePartitioned: Boolean = false): Unit =
    completeTo(spark, cat.variantRawDir, cat.geneRawFile,
      effectsDir = cat.variantEffectsDir,
      metadataDir = cat.variantMetadataDir,
      genesDir = cat.genesDir,
      genesDedupedDir = cat.genesDedupedDir,
      intergenicDir = cat.intergenicDir,
      intragenicDir = cat.intragenicDir,
      chromosomePartitioned = chromosomePartitioned)

  /** All six sink jobs run CONCURRENTLY from driver-side futures — the
    * reference's overlapped-futures design (eggv/pipeline.py:161-230
    * `as_completed`; write futures eggv/dfio.py:94-100 gathered at :230)
    * in Spark's native form: each write is an independent job, the
    * scheduler interleaves their stages, and the cluster stays busy while
    * a small output (genes: KBs) finishes alongside a large one (effects).
    * The shared persisted parents are computed exactly once — concurrent
    * first readers of a persisted partition serialize on the block
    * manager's per-block lock, they don't recompute. */
  private[graft] def completeTo(spark: SparkSession, gvfPath: String, gtfPath: String,
      effectsDir: String, metadataDir: String, genesDir: String,
      genesDedupedDir: String, intergenicDir: String, intragenicDir: String,
      chromosomePartitioned: Boolean = false): Unit = {
    val variants = processVariants(spark, gvfPath)
    val genes = processGenes(spark, gtfPath).persist(StorageLevel.MEMORY_AND_DISK)
    val ann = annotate(variants.effects, genes)
    val partCols = if (chromosomePartitioned) Seq("chromosome") else Nil
    val effectsOut =
      if (chromosomePartitioned) VariantOps.isolateEffectsByChromosome(variants.processed)
      else variants.effects

    try
      runConcurrently(spark, Seq(
        () => Sinks.writeTsv(effectsOut, effectsDir, partCols),
        () => Sinks.writeTsv(variants.metadata, metadataDir, partCols),
        () => Sinks.writeTsv(genes, genesDir),
        () => Sinks.writeTsv(GeneOps.dedupGenes(genes), genesDedupedDir),
        () => Sinks.writeTsv(ann.intergenic, intergenicDir),
        () => Sinks.writeTsv(ann.intragenic, intragenicDir)))
    finally {
      // unpersist even on failure — a caller that catches and continues
      // must not keep the 249 GB-class intermediates pinned
      genes.unpersist()
      variants.unpersist()
    }
  }

  /** Run driver-side tasks concurrently on a dedicated pool; propagates
    * the first failure. All Spark jobs the tasks submit run under one job
    * group with interruptOnCancel, and the group is cancelled on the first
    * failure — so sibling writes already executing on the cluster are
    * killed, not just their driver threads (cancellation of a job that
    * completes in the same instant is inherently best-effort). */
  private def runConcurrently(spark: SparkSession, tasks: Seq[() => Unit]): Unit = {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val sc = spark.sparkContext
    val group = s"graft-pipeline-${java.util.UUID.randomUUID()}"
    val pool = Executors.newFixedThreadPool(tasks.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = tasks.map(t => Future {
      // job-group properties are thread-local; each task thread tags its
      // own jobs so one cancelJobGroup reaches all six writers
      sc.setJobGroup(group, "graft pipeline concurrent sinks", interruptOnCancel = true)
      try t() finally sc.clearJobGroup()
    })
    try Await.result(Future.sequence(futures), Duration.Inf)
    catch {
      case e: Throwable =>
        sc.cancelJobGroup(group)
        throw e
    } finally pool.shutdownNow()
  }
}
