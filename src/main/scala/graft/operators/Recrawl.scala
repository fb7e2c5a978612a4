package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Recrawl planning from HTTP validators — what a continuous crawl
  * does with the archive it already has: every fetched response
  * carries its conditional-refetch handles (`ETag` →
  * `If-None-Match`, `Last-Modified` → `If-Modified-Since`, RFC 9110
  * §13.1) and an age signal, and the classic age-proportional revisit
  * policy (pages that hadn't changed for long are rechecked seldom;
  * recently-changed pages soon — the Cho/Garcia-Molina incremental-
  * crawler heuristic) turns them into the next fetch slot:
  *
  *   interval = clamp(alpha × (fetch_time − last_modified),
  *                    min_hours, max_hours)
  *
  * with a flat `default_days` interval when the server sent no
  * `Last-Modified` (no age signal — neither eager nor never).
  *
  * Scale shape: a pure narrow codegen projection over the record scan
  * — date parses, one clamp, zero shuffle; output feeds the frontier
  * scheduler ([[Robots.fetchSchedule]]) as its candidate set. Epoch
  * seconds (BIGINT) on the output, not timestamps — scheduler
  * arithmetic wants integers, and engine-portable comparison does
  * too. A `Last-Modified` in the future of the fetch (clock skew,
  * hostile) yields NULL age and the default interval — never a
  * negative slot. */
object Recrawl {

  def recrawlPlan(records: Dataset[graft.io.Warc.WarcRecord],
      alpha: Double = 0.1, minHours: Double = 1.0,
      maxHours: Double = 24 * 30.0, defaultDays: Double = 7.0): DataFrame = {
    val minS = math.round(minHours * 3600)
    val maxS = math.round(maxHours * 3600)
    val defaultS = math.round(defaultDays * 86400)
    // Spark's datetime pattern dialect refuses day-name fields (EEE)
    // for PARSING, so the IMF-fixdate weekday prefix is stripped
    // first — it is redundant with the date anyway. The zone token is
    // PARSED (zzz), not a quoted literal: a quoted 'GMT' would land
    // the wall-clock fields in the session time zone, skewing age_s by
    // the zone offset under a non-UTC spark.sql.session.timeZone
    // (warc_date, ISO-8601 with an explicit offset, never had the
    // problem).
    val lmTs = try_to_timestamp(
      regexp_replace(col("if_modified_since"), "^[A-Za-z]{3}, ", ""),
      lit("dd MMM yyyy HH:mm:ss zzz"))
    records.toDF()
      .filter(col("warc_type") === "response" && col("framing_ok") &&
        col("target_uri").isNotNull && col("warc_date").isNotNull)
      .select(col("target_uri").as("url"),
        col("http_etag").as("if_none_match"),
        col("http_last_modified").as("if_modified_since"),
        unix_timestamp(to_timestamp(col("warc_date"))).as("fetch_s"))
      .withColumn("lm_s", unix_timestamp(lmTs))
      .withColumn("age_s",
        when(col("lm_s").isNotNull && col("lm_s") <= col("fetch_s"),
          col("fetch_s") - col("lm_s")))
      .withColumn("interval_s",
        when(col("age_s").isNotNull,
          least(greatest(round(col("age_s") * alpha).cast(LongType),
            lit(minS)), lit(maxS)))
          .otherwise(lit(defaultS)))
      .withColumn("next_fetch_s", col("fetch_s") + col("interval_s"))
      .drop("lm_s")
  }
}
