package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import graft.io.Sources

class JsonlSourceSpec extends SparkSpec {

  test("readJsonl: plain + gz shards in one dir scan, broken line null-fills") {
    val dir = Files.createTempDirectory("graft-jsonl")
    Files.write(dir.resolve("shard-0.jsonl"), Seq(
      """{"doc_id": 1, "url": "https://a.example/x", "lang": "en", "text": "hello world"}""",
      """{"doc_id": 2, "text": "no url or lang"}""",
      """{broken json!}""").mkString("\n").getBytes(StandardCharsets.UTF_8))
    val gz = new GZIPOutputStream(Files.newOutputStream(dir.resolve("shard-1.jsonl.gz")))
    gz.write("""{"doc_id": 3, "url": null, "lang": "de", "text": "hallo"}"""
      .getBytes(StandardCharsets.UTF_8))
    gz.close()

    val df = Sources.readJsonl(spark, dir.toString)
    assert(df.columns.toSeq == Seq("doc_id", "url", "lang", "text"))
    val rows = df.collect().map(r => (
      Option(r.getAs[java.lang.Long]("doc_id")).map(_.toLong),
      Option(r.getAs[String]("lang")),
      Option(r.getAs[String]("text")))).toSet
    assert(rows.contains((Some(1L), Some("en"), Some("hello world"))))
    assert(rows.contains((Some(2L), None, Some("no url or lang"))))
    assert(rows.contains((Some(3L), Some("de"), Some("hallo"))))
    // PERMISSIVE: the broken line survives the scan as an all-null row —
    // exactly what a downstream quality filter drops
    assert(rows.contains((None, None, None)))
    assert(df.count() == 4)
  }

  test("readJsonlStream: same schema over a watched directory") {
    val dir = Files.createTempDirectory("graft-jsonl-stream")
    val stream = Sources.readJsonlStream(spark, dir.toString)
    assert(stream.isStreaming)
    assert(stream.schema == graft.schema.Schemas.jsonlDocument)
    val query = stream.writeStream.format("memory").queryName("jsonl_stream")
      .outputMode("append").start()
    try {
      Files.write(dir.resolve("late-shard.jsonl"),
        """{"doc_id": 9, "url": "u", "lang": "en", "text": "landed late"}"""
          .getBytes(StandardCharsets.UTF_8))
      query.processAllAvailable()
      val got = spark.table("jsonl_stream").collect()
      assert(got.length == 1 && got(0).getAs[String]("text") == "landed late")
    } finally query.stop()
  }
}
