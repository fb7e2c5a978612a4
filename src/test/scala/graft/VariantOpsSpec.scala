package graft

import org.apache.spark.sql.Row
import graft.io.Sources
import graft.ops.VariantOps

/** Golden tests replicating reference tests/test_process.py:44-131 over the
  * same sample GVF slice. */
class VariantOpsSpec extends SparkSpec {

  private lazy val gvf = Sources.readGvf(spark, resource("sample-hg38-chromosome-10.gvf"))
  private lazy val processed = VariantOps.processGvf(gvf)

  test("readGvf: 2 variant rows, 9 declared columns") {
    assert(gvf.columns.toSeq == Seq(
      "seqid", "source", "type", "start", "end", "score", "strand", "phase", "attr"))
    assert(gvf.count() == 2)
  }

  test("processGvf: 5 rows, golden cells (test_process.py:59-89)") {
    val rows = processed.collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[String]("chromosome") == "chr10"))
    assert(rows.forall(_.getAs[Float]("maf") == 0.0f))

    val inter = rows.filter(_.getAs[Long]("rsid") == 1308274876L)
    assert(inter.length == 1)
    assert(inter.head.getAs[String]("observed") == "C,G")
    assert(inter.head.getAs[String]("effect") == "intergenic")
    assert(inter.head.getAs[String]("transcript") == "")
    assert(inter.head.getAs[Long]("start") == 11702L)

    val intra = rows.filter(_.getAs[Long]("rsid") == 1486292194L)
    assert(intra.length == 4)
    assert(intra.forall(_.getAs[String]("observed") == "G,T"))
    assert(intra.map(_.getAs[String]("effect")).toSet ==
      Set("intron_variant", "missense_variant"))
    assert(intra.map(_.getAs[String]("transcript")).toSet == Set(
      "ENST00000381496", "ENST00000634311", "ENST00000280886", "ENST00000434695"))
  }

  test("isolateEffects: 5 unique (rsid, effect, transcript) rows") {
    val rows = VariantOps.isolateEffects(processed).collect()
    assert(rows.length == 5)
    assert(rows.map(_.schema.fieldNames.toSeq).head == Seq("rsid", "effect", "transcript"))
    val inter = rows.filter(_.getAs[Long]("rsid") == 1308274876L)
    assert(inter.head.getAs[String]("effect") == "intergenic")
    assert(inter.head.getAs[String]("transcript") == "")
  }

  test("isolateMetadata: dedups 5 effect rows to 2 variants") {
    val rows = VariantOps.isolateMetadata(processed).collect()
    assert(rows.length == 2)
    val byRsid = rows.map(r => r.getAs[Long]("rsid") -> r).toMap
    assert(byRsid(1308274876L).getAs[String]("observed") == "C,G")
    assert(byRsid(1486292194L).getAs[String]("observed") == "G,T")
    assert(byRsid(1486292194L).getAs[Long]("start") == 325000L)
    assert(rows.forall(_.getAs[String]("chromosome") == "chr10"))
    assert(rows.forall(_.getAs[Float]("maf") == 0.0f))
  }

  test("effect regex preserves the trailing-semicolon quirk (X6)") {
    import spark.implicits._
    // unterminated Variant_effect attr (ends the line, no ';') must be
    // silently missed → intergenic, matching eggv/process.py:158
    val df = Seq(
      ("10", 1L, 1L, "Dbxref=dbSNP_151:rs42;Variant_effect=intron_variant 0 mRNA ENST1"),
      ("10", 2L, 2L, "Dbxref=dbSNP_151:rs43;Variant_effect=intron_variant 0 mRNA ENST1;x=y")
    ).toDF("seqid", "start", "end", "attr")
    val out = VariantOps.processGvf(df).collect()
    val m = out.map(r => r.getAs[Long]("rsid") -> r.getAs[String]("effect")).toMap
    assert(m(42L) == "intergenic")
    assert(m(43L) == "intron_variant")
  }
}
