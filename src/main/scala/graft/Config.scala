package graft

import java.io.FileInputStream
import java.util.Properties

import scala.jdk.CollectionConverters._

/** Pipeline configuration: defaults merged with an optional properties
  * file, then validated — the analogue of the reference's YAML config
  * singleton (eggv/configuration.py:48-91, defaults at :11-45) and its CLI
  * option validation (eggv/cli.py:43-77), minus the singleton: a Config is
  * an immutable value, so concurrent pipelines can't clobber each other.
  *
  * The reference's Dask cluster knobs (hpc/local/custom, scheduler,
  * workers, walltime) have no Spark-side meaning — cluster topology
  * belongs to spark-submit/cluster manager config, not the engine — so the
  * surviving keys are the portable ones: data layout, build selection,
  * overwrite behavior, and session-level parallelism.
  */
final case class GraftConfig(
    dataDir: String,
    build: String,
    overwrite: Boolean,
    cores: Int,
    shufflePartitions: Int,
    chromosomePartitioned: Boolean = false,
    retrieveFromRegistry: Boolean = false) {
  def catalog: Catalog = Catalog(dataDir, build)
}

object GraftConfig {

  /** Known builds, mirroring the reference's species→build mapping
    * (human→hg38, mouse→mm10; eggv/globe.py + pipeline.py:236-314). */
  val knownBuilds: Set[String] = Set("hg38", "mm10")

  private val knownKeys = Set(
    "data.dir", "build", "overwrite", "cores", "shuffle.partitions",
    "partition.by.chromosome", "retrieve.registry")

  def default: GraftConfig = {
    val cpus = Runtime.getRuntime.availableProcessors
    GraftConfig(dataDir = "data", build = "hg38", overwrite = false,
      cores = cpus, shufflePartitions = cpus)
  }

  /** Load from a java properties file over the defaults. Fails fast — with
    * every problem listed, not just the first — on unknown keys (the
    * reference silently accepts typos: a misspelled YAML key just leaves
    * the default in place), unknown builds, and non-positive parallelism. */
  def load(path: String): GraftConfig = {
    val props = new Properties()
    val in = new FileInputStream(path)
    try props.load(in) finally in.close()
    fromProperties(props)
  }

  private[graft] def fromProperties(props: Properties): GraftConfig = {
    val keys = props.stringPropertyNames().asScala.toSet
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    (keys -- knownKeys).toSeq.sorted.foreach { k =>
      errors += s"unknown config key: $k (known: ${knownKeys.toSeq.sorted.mkString(", ")})"
    }
    def get(k: String): Option[String] = Option(props.getProperty(k)).map(_.trim)
    def getInt(k: String, dflt: Int): Int = get(k) match {
      case None => dflt
      case Some(v) => v.toIntOption match {
        case Some(i) if i > 0 => i
        case _ => errors += s"config $k must be a positive integer, got: $v"; dflt
      }
    }
    def getBool(k: String, dflt: Boolean): Boolean = get(k) match {
      case None => dflt
      case Some(v) => v.toBooleanOption match {
        case Some(b) => b
        case None => errors += s"config $k must be true/false, got: $v"; dflt
      }
    }
    val d = default
    val build = get("build").getOrElse(d.build)
    if (!knownBuilds(build))
      errors += s"unknown build: $build (known: ${knownBuilds.toSeq.sorted.mkString(", ")})"
    val cores = getInt("cores", d.cores)
    val cfg = GraftConfig(
      dataDir = get("data.dir").getOrElse(d.dataDir),
      build = build,
      overwrite = getBool("overwrite", d.overwrite),
      cores = cores,
      shufflePartitions = getInt("shuffle.partitions", cores),
      // reference-parity layout: variant outputs written as
      // chromosome=chrN/ directories (per-chromosome files, pruned re-reads)
      chromosomePartitioned = getBool("partition.by.chromosome", d.chromosomePartitioned),
      // `run <config>` stages the build's full Ensembl download set into
      // the catalog's raw dirs first (the reference's `eggv complete -s`
      // convenience driven from config instead of the CLI)
      retrieveFromRegistry = getBool("retrieve.registry", d.retrieveFromRegistry))
    if (errors.nonEmpty)
      throw new IllegalArgumentException(
        s"invalid configuration:\n  ${errors.mkString("\n  ")}")
    cfg
  }
}
