package graft.io

import org.apache.spark.sql.DataFrame

/** TSV sinks matching the reference's writer conventions (SURVEY.md §2.2).
  *
  * The reference writes one file per partition then concatenates them into a
  * single file keeping one header (K1+K2, eggv/dfio.py:22-100), with nulls
  * as "NA" (na_rep, eggv/dfio.py:91) while missing transcripts — already
  * empty strings, not nulls — stay empty (eggv/process.py:171). Spark's CSV
  * writer distinguishes the two natively via nullValue vs emptyValue.
  *
  * At 100 TB, never coalesce(1): `writeTsv` keeps full write parallelism
  * (one part-file per partition — exactly the reference's K1 design, which
  * also wrote per-partition parts). `writeSingleTsv` exists for parity with
  * the reference's single-file outputs on small data; for 100 GB-class
  * outputs, partitioned write + out-of-engine concat is the right call
  * (SURVEY.md §7.5.7).
  */
object Sinks {

  private def tsvWriter(df: DataFrame) =
    df.write
      .option("sep", "\t")
      .option("header", "true")
      .option("nullValue", "NA")
      .option("emptyValue", "")
      .mode("overwrite")

  /** Partition-parallel TSV write (K1). One part file per partition. */
  def writeTsv(df: DataFrame, dir: String): Unit =
    tsvWriter(df).csv(dir)

  /** Single-file TSV write (K2 parity) — serializes the final write, only
    * for small outputs such as per-chromosome files. */
  def writeSingleTsv(df: DataFrame, dir: String): Unit =
    tsvWriter(df.coalesce(1)).csv(dir)

  /** Parquet sink — the scale-path output format (columnar, statistics,
    * predicate pushdown on re-read); what the TSV outputs should become
    * when the consumer is this engine rather than a third-party tool. */
  def writeParquet(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").parquet(dir)

  /** Bucketed parquet table: pre-shuffled on `bucketCols` into `numBuckets`
    * files per partition, registered in the session catalog. Joins and
    * aggregations between tables bucketed the same way skip their shuffle
    * entirely — the co-located-join layout for fact tables that are joined
    * on the same key repeatedly (the 100 TB answer to "this join shuffles
    * every run"). */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
      bucketCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
