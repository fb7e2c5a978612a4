package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.Media

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Seq(
    Media(1L, "image/fake", Array.tabulate(1000)(_.toByte)),
    Media(2L, "audio/fake", Array.tabulate(10)(i => (i * 7).toByte)),
    Media(3L, "video/fake", Array.emptyByteArray)).toDS()

  test("decodeFeatures: deterministic stub features, correct schema") {
    val f1 = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
    assert(f1(0).n_bytes == 1000 && f1(1).n_bytes == 10 && f1(2).n_bytes == 0)
    assert(f1.forall(_.features.length == 16))
    assert(f1(0).width == 1 + 1000 % 1024)
  }

  test("frameSample: frames reassemble to the original payload") {
    val frames = Multimodal.frameSample(media.toDF(), frameBytes = 256)
      .orderBy("media_id", "frame_idx").collect()
    val byId = frames.groupBy(_.getAs[Long]("media_id"))
    val reassembled = byId(1L).sortBy(_.getAs[Int]("frame_idx"))
      .flatMap(_.getAs[Array[Byte]]("frame"))
    assert(reassembled.toSeq == Array.tabulate(1000)(_.toByte).toSeq)
    // ceil(1000/256) = 4 frames, last one short
    assert(byId(1L).length == 4)
    assert(!byId.contains(3L)) // empty payload yields no frames
  }
}
