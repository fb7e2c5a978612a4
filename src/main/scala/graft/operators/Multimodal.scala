package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed by per-partition batch functions.
  *
  * The Spark-side plumbing here is real — schemas, partition-batch
  * iteration, explode of frame samples — while the actual media decode is
  * a clearly-marked STUB (this environment ships no image/audio codecs).
  * A production deployment replaces `stubDecode` with a real codec call;
  * nothing else changes. In PySpark the same shape is `mapInPandas` with
  * arrow batches; in Scala the analogue is a typed `mapPartitions`, which
  * keeps the per-batch amortization (open codec once per partition, stream
  * rows through it).
  */
object Multimodal {

  /** A media row: opaque bytes + typed metadata. */
  final case class Media(media_id: Long, kind: String, bytes: Array[Byte])

  /** Decoded features: fixed-dim embedding + decoded dimensions. */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false)))

  /** STUB decode ??? — stands in for an image/audio codec (not available in
    * this container). Deterministic fake: derives dims and a 16-dim
    * feature vector purely from the bytes, so tests are stable. Replace
    * the body with e.g. a JNI/javacv decode in production. */
  private def stubDecode(m: Media): MediaFeatures = {
    val n = m.bytes.length
    // fake "decode": dims from byte length, features from a rolling byte hash
    val feats = new Array[Float](16)
    var h = 1125899906842597L
    var i = 0
    while (i < n) {
      h = 31 * h + (m.bytes(i) & 0xff)
      feats(i % 16) += ((h >>> 40) & 0xff) / 255.0f
      i += 1
    }
    MediaFeatures(m.media_id, m.kind, n, width = 1 + (n % 1024), height = 1 + (n % 768), feats)
  }

  /** Decode/feature-extract a media dataset. Per-partition batching: the
    * (stubbed) codec is "opened" once per partition — the real-codec cost
    * model this plumbing exists for. */
  def decodeFeatures(ds: Dataset[Media]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition setup would initialize the codec here (once, not per row)
      rows.map(stubDecode)
    }
  }

  /** Sample fixed-size "frames" from a binary payload (video-style): one
    * output row per `frameBytes` window, via substr slices + posexplode —
    * a pure Catalyst plan, no UDF. Empty payloads yield no frames. */
  def frameSample(df: DataFrame, frameBytes: Int): DataFrame = {
    val n = length(col("bytes"))
    val nFrames = floor((n + frameBytes - 1) / frameBytes).cast(IntegerType) // ceil(n/frameBytes)
    val frames = when(n === 0, array().cast(ArrayType(BinaryType)))
      .otherwise(transform(sequence(lit(0), nFrames - 1),
        i => col("bytes").substr(i * frameBytes + 1, lit(frameBytes))))
    df.select(col("media_id"), col("kind"),
      posexplode(frames).as(Seq("frame_idx", "frame")))
  }

  /** Build a Media dataset from the documents table by treating the text
    * payload as opaque bytes — the testdata stand-in for a real media
    * table (TESTDATA.md has no binary column). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[Media] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      lit("fake/blob").as("kind"),
      col("text").cast(BinaryType).as("bytes")).as[Media]
  }
}
