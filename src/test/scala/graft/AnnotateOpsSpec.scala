package graft

import graft.io.Sources
import graft.ops.AnnotateOps

/** Golden tests replicating reference tests/test_annotate.py over the same
  * pre-processed sample TSVs. */
class AnnotateOpsSpec extends SparkSpec {

  private lazy val vdf =
    Sources.readProcessedVariants(spark, resource("sample-hg38-processed-variant-effects.tsv"))
  private lazy val gdf =
    Sources.readProcessedGenes(spark, resource("sample-hg38-processed-genes.tsv"))
  private lazy val annotated = AnnotateOps.annotateVariants(vdf, gdf)

  test("readProcessedVariants: 5 rows, empty-string transcript survives") {
    val rows = vdf.collect()
    assert(rows.length == 5)
    assert(rows.filter(_.getAs[Long]("rsid") == 1308274876L)
      .head.getAs[String]("transcript") == "")
  }

  test("readProcessedGenes: 6 rows") {
    assert(gdf.count() == 6)
  }

  test("annotateVariants: left join keeps intergenic with null gene cols") {
    val rows = annotated.collect()
    assert(rows.length == 5)
    val inter = rows.filter(_.getAs[Long]("rsid") == 1308274876L).head
    assert(inter.getAs[String]("variant_effect") == "intergenic")
    assert(inter.getAs[String]("gene_id") == null)
    val intra = rows.filter(_.getAs[Long]("rsid") == 1486292194L)
    assert(intra.length == 4)
    assert(intra.forall(_.getAs[String]("gene_id") == "ENSG00000151240"))
    assert(intra.forall(_.getAs[String]("gene_name") == "DIP2C"))
    assert(intra.forall(_.getAs[String]("gene_biotype") == "protein_coding"))
    assert(intra.map(_.getAs[String]("transcript")).toSet == Set(
      "ENST00000381496", "ENST00000634311", "ENST00000280886", "ENST00000434695"))
  }

  test("isolateIntergenic: exactly the 1 intergenic variant") {
    val rows = AnnotateOps.isolateIntergenic(annotated).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("rsid") == 1308274876L)
    assert(rows.head.getAs[String]("variant_effect") == "intergenic")
  }

  test("isolateIntragenic: 2 rows after (rsid,effect,gene) dedup") {
    val rows = AnnotateOps.isolateIntragenic(annotated).collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Long]("rsid") == 1486292194L))
    assert(rows.map(_.getAs[String]("variant_effect")).toSet ==
      Set("intron_variant", "missense_variant"))
  }

  test("full pipeline composition (run_annotation_pipeline parity)") {
    val out = Pipeline.annotate(vdf, gdf)
    assert(out.intergenic.count() == 1)
    assert(out.intragenic.count() == 2)
  }
}
