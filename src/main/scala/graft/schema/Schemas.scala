package graft.schema

import org.apache.spark.sql.types._

/** Declared StructType constants for every table in the engine.
  *
  * The reference declares schemas externally too — headerless files get
  * hard-coded column names at read time (reference: eggv/process.py:39-49
  * for GVF, eggv/process.py:78-88 for GTF) with dtype overrides where
  * inference fails (eggv/process.py:59,96; eggv/annotate.py:36). We go
  * further and declare everything fully: explicit schemas mean the CSV
  * scans never need an inference pass over the data (one full extra read
  * at 100 TB) and the plans are stable across files.
  */
object Schemas {

  /** Raw GVF variant file: 9 tab-separated fields, '#' comments.
    * reference: eggv/process.py:39-49. seqid is a string because
    * chromosome names are mixed numeric/alpha (eggv/process.py:51-52).
    */
  val gvf: StructType = StructType(Seq(
    StructField("seqid", StringType),
    StructField("source", StringType),
    StructField("type", StringType),
    StructField("start", LongType),
    StructField("end", LongType),
    StructField("score", StringType),
    StructField("strand", StringType),
    StructField("phase", StringType),
    StructField("attr", StringType)
  ))

  /** Raw GTF gene file: 9 tab-separated fields, '#!' comments.
    * reference: eggv/process.py:78-88. */
  val gtf: StructType = StructType(Seq(
    StructField("seqname", StringType),
    StructField("source", StringType),
    StructField("feature", StringType),
    StructField("start", LongType),
    StructField("end", LongType),
    StructField("score", StringType),
    StructField("strand", StringType),
    StructField("frame", StringType),
    StructField("attr", StringType)
  ))

  /** Fully processed variants (intermediate representation).
    * reference: eggv/process.py:178-180. */
  val processedVariants: StructType = StructType(Seq(
    StructField("chromosome", StringType),
    StructField("rsid", LongType),
    StructField("start", LongType),
    StructField("end", LongType),
    StructField("observed", StringType),
    StructField("maf", FloatType),
    StructField("effect", StringType),
    StructField("transcript", StringType)
  ))

  /** Variant effects table. reference: eggv/process.py:292.
    * transcript forced string on re-read (eggv/annotate.py:36). */
  val variantEffects: StructType = StructType(Seq(
    StructField("rsid", LongType),
    StructField("effect", StringType),
    StructField("transcript", StringType)
  ))

  /** Variant metadata table. reference: eggv/process.py:313. */
  val variantMetadata: StructType = StructType(Seq(
    StructField("chromosome", StringType),
    StructField("start", LongType),
    StructField("end", LongType),
    StructField("rsid", LongType),
    StructField("observed", StringType),
    StructField("maf", FloatType)
  ))

  /** Processed genes table. reference: eggv/process.py:219-221. */
  val processedGenes: StructType = StructType(Seq(
    StructField("chromosome", StringType),
    StructField("start", LongType),
    StructField("end", LongType),
    StructField("transcript_id", StringType),
    StructField("gene_id", StringType),
    StructField("gene_name", StringType),
    StructField("biotype", StringType)
  ))

  /** Annotated variants (post left join). reference: eggv/annotate.py:86-94. */
  val annotated: StructType = StructType(Seq(
    StructField("chromosome", StringType),
    StructField("rsid", LongType),
    StructField("variant_effect", StringType),
    StructField("transcript", StringType),
    StructField("gene_id", StringType),
    StructField("gene_name", StringType),
    StructField("gene_biotype", StringType)
  ))

  /** Intergenic subset. reference: eggv/annotate.py:109,117. */
  val intergenic: StructType = StructType(Seq(
    StructField("rsid", LongType),
    StructField("variant_effect", StringType)
  ))

  /** Intragenic subset. reference: eggv/annotate.py:132,139-141. */
  val intragenic: StructType = StructType(Seq(
    StructField("rsid", LongType),
    StructField("variant_effect", StringType),
    StructField("gene_id", StringType),
    StructField("gene_name", StringType),
    StructField("gene_biotype", StringType)
  ))

  /** Default JSONL corpus document (engine extension, not a reference
    * format): the common LLM training-data shard shape — id, provenance
    * url, language tag, text. Callers with richer shards pass their own
    * schema to Sources.readJsonl. */
  val jsonlDocument: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("url", StringType),
    StructField("lang", StringType),
    StructField("text", StringType)
  ))
}
