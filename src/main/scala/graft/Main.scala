package graft

import org.apache.spark.sql.SparkSession

import graft.io.{Sinks, Sources}
import graft.ops.GeneOps

/** CLI entry point mirroring the reference's click CLI
  * (`eggv retrieve|process|annotate|complete`, eggv/cli.py:144-193).
  * `retrieve` (HTTP download) is out of engine scope (SURVEY.md §2.1 S5).
  *
  * Usage:
  *   graft.Main process  <gvf> <gtf> <outDir>
  *   graft.Main annotate <effectsTsvDir> <genesTsvDir> <outDir>
  *   graft.Main complete <gvf> <gtf> <outDir>
  */
object Main {

  def session(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "process" :: gvf :: gtf :: out :: Nil =>
      val spark = session("graft-process")
      val v = Pipeline.processVariants(spark, gvf)
      Sinks.writeTsv(v.effects, s"$out/variant-effects")
      Sinks.writeTsv(v.metadata, s"$out/variant-metadata")
      val genes = Pipeline.processGenes(spark, gtf)
      Sinks.writeTsv(genes, s"$out/genes")
      Sinks.writeTsv(GeneOps.dedupGenes(genes), s"$out/genes-deduped")
      spark.stop()

    case "annotate" :: effects :: genes :: out :: Nil =>
      val spark = session("graft-annotate")
      val ann = Pipeline.annotate(
        Sources.readProcessedVariants(spark, effects),
        Sources.readProcessedGenes(spark, genes))
      Sinks.writeTsv(ann.intergenic, s"$out/intergenic")
      Sinks.writeTsv(ann.intragenic, s"$out/intragenic")
      spark.stop()

    case "complete" :: gvf :: gtf :: out :: Nil =>
      val spark = session("graft-complete")
      Pipeline.complete(spark, gvf, gtf, out)
      spark.stop()

    case other =>
      System.err.println(
        s"""unknown arguments: ${other.mkString(" ")}
           |usage:
           |  graft.Main process  <gvf> <gtf> <outDir>
           |  graft.Main annotate <effectsTsv> <genesTsv> <outDir>
           |  graft.Main complete <gvf> <gtf> <outDir>""".stripMargin)
      sys.exit(2)
  }
}
