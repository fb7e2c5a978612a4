package graft

import graft.io.Sources
import graft.ops.GeneOps

/** Golden tests replicating reference tests/test_process.py:146-190 over the
  * same sample GTF slice. */
class GeneOpsSpec extends SparkSpec {

  private lazy val gtf = Sources.readGtf(spark, resource("sample-hg38-gene-build.gtf"))
  private lazy val processed = GeneOps.processGtf(gtf)

  test("readGtf: 269 feature rows, 9 declared columns") {
    assert(gtf.columns.toSeq == Seq(
      "seqname", "source", "feature", "start", "end", "score", "strand", "frame", "attr"))
    assert(gtf.count() == 269)
  }

  test("processGtf: 6 transcripts for 2 genes, golden cells") {
    val rows = processed.collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getAs[String]("chromosome") == "chr10"))
    assert(rows.map(_.getAs[String]("gene_id")).toSet ==
      Set("ENSG00000151240", "ENSG00000201861"))
    assert(rows.map(_.getAs[String]("transcript_id")).toSet == Set(
      "ENST00000381496", "ENST00000280886", "ENST00000634311",
      "ENST00000434695", "ENST00000421992", "ENST00000364991"))
    val dip2c = rows.filter(_.getAs[String]("gene_id") == "ENSG00000151240")
    assert(dip2c.forall(_.getAs[String]("biotype") == "protein_coding"))
    assert(dip2c.forall(_.getAs[String]("gene_name") == "DIP2C"))
    val pseudo = rows.filter(_.getAs[String]("gene_id") == "ENSG00000201861")
    assert(pseudo.forall(_.getAs[String]("biotype") == "rRNA_pseudogene"))
    assert(pseudo.forall(_.getAs[String]("gene_name") == "RNA5SP298"))
  }

  test("dedupGenes: 6 transcripts → 2 unique genes, deterministic winner") {
    val rows = GeneOps.dedupGenes(processed).collect()
    assert(rows.length == 2)
    val byGene = rows.map(r => r.getAs[String]("gene_id") -> r).toMap
    // min(struct(...)) keeps the smallest (chromosome,start,...) row:
    // DIP2C transcripts start at 274190/274198/277323/324639/364962
    assert(byGene("ENSG00000151240").getAs[Long]("start") == 274190L)
    assert(byGene("ENSG00000201861").getAs[Long]("start") == 282015L)
  }
}
