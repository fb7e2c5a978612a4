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

  test("readGvf on malformed rows: PERMISSIVE nulls, never a crashed scan") {
    // contract for dirty 100 TB inputs: a short line null-fills missing
    // trailing columns, a non-numeric start nulls the whole row's parsed
    // fields (Spark CSV PERMISSIVE drops the row's other values too), a
    // good line is untouched; nothing throws under ANSI mode
    val dir = java.nio.file.Files.createTempDirectory("gvf-malformed")
    val good = "chr10\tdbSNP\tSNV\t100\t101\t.\t+\t.\t" +
      "Dbxref=dbSNP_151:rs42;Variant_seq=A;Reference_seq=G;"
    java.nio.file.Files.write(dir.resolve("dirty.gvf"), java.util.Arrays.asList(
      "# header comment",
      good,
      "chr10\tdbSNP\tSNV",                       // truncated line
      "chr10\tdbSNP\tSNV\tNOT_A_NUMBER\t101\t.\t+\t.\tattr"), // bad long
      java.nio.charset.StandardCharsets.UTF_8)
    val raw = graft.io.Sources.readGvf(spark, dir.toString)
    assert(raw.count() == 3) // comment skipped, malformed rows kept as rows
    val rows = raw.collect().map(r => (r.getAs[String]("seqid"),
      Option(r.getAs[java.lang.Long]("start")).map(_.toLong))).toSet
    assert(rows.contains(("chr10", Some(100L))))
    assert(rows.exists(_._2.isEmpty)) // malformed starts surface as null
    // the processing chain keeps only rows with a parsable dbSNP id
    val processed = VariantOps.processGvf(raw)
    assert(processed.select("rsid").collect().map(_.getLong(0)).toSeq == Seq(42L))
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
