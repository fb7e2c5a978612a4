package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.io.Wet

class WetSpec extends SparkSpec {
  import spark.implicits._

  /** A hand-built two-record WET stream with the warcinfo file header,
    * CRLF line endings, a multi-line payload, and an empty payload. */
  private def goldenWet: String = {
    def rec(headers: Seq[(String, String)], payload: String): String =
      "WARC/1.0\r\n" +
        (headers :+ ("Content-Length" ->
          payload.getBytes(StandardCharsets.UTF_8).length.toString))
          .map { case (k, v) => s"$k: $v\r\n" }.mkString +
        "\r\n" + payload + "\r\n\r\n"
    rec(Seq("WARC-Type" -> "warcinfo",
        "Content-Type" -> "application/warc-fields"),
      "software: graft-test\r\nformat: WARC File Format 1.0") +
      rec(Seq("WARC-Type" -> "conversion",
          "WARC-Target-URI" -> "http://example.test/a",
          "WARC-Date" -> "2026-01-02T03:04:05Z",
          "WARC-Record-ID" -> "<urn:uuid:aaa>",
          "Content-Type" -> "text/plain"),
        "first line\nsecond line\nthird") +
      rec(Seq("WARC-Type" -> "conversion",
          "WARC-Target-URI" -> "http://example.test/empty",
          "WARC-Record-ID" -> "<urn:uuid:bbb>",
          "Content-Type" -> "text/plain"), "")
  }

  private def writeTemp(content: String): String = {
    val dir = Files.createTempDirectory("graft_wet_spec")
    Files.write(Paths.get(dir.toString, "seg.wet"),
      content.getBytes(StandardCharsets.UTF_8))
    dir.toString
  }

  test("readWet: golden stream — headers, multi-line payload, empty payload, warcinfo") {
    val out = Wet.readWet(spark, writeTemp(goldenWet))
      .orderBy("target_uri").collect()
    assert(out.length == 3)
    val byType = out.groupBy(_.getAs[String]("warc_type"))
    assert(byType("warcinfo").length == 1)
    val conv = byType("conversion").sortBy(_.getAs[String]("target_uri"))
    assert(conv(0).getAs[String]("target_uri") == "http://example.test/a")
    assert(conv(0).getAs[String]("payload") == "first line\nsecond line\nthird")
    assert(conv(0).getAs[String]("warc_date") == "2026-01-02T03:04:05Z")
    assert(conv(0).getAs[String]("record_id") == "<urn:uuid:aaa>")
    assert(conv(0).getAs[Long]("n_bytes") == 28L)
    assert(conv(0).getAs[Long]("content_length") == 28L)
    assert(conv(0).getAs[Boolean]("framing_ok"))
    assert(conv(1).getAs[String]("payload") == "")
    assert(conv(1).getAs[Long]("content_length") == 0L)
    assert(conv(1).getAs[Boolean]("framing_ok"))
    // the warcinfo record's CRLF-joined fields survive as its payload
    assert(byType("warcinfo").head.getAs[String]("payload")
      .startsWith("software: graft-test"))
  }

  test("readWet: malformed records flag framing_ok instead of failing") {
    // no blank line; bogus Content-Length; payload containing the record
    // delimiter at line start (the documented mis-split case)
    val bad =
      "WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 5\r\nno-blank-line" +
        "WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: abc\r\n\r\nhi\r\n\r\n" +
        "WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 20\r\n\r\n" +
        "before\nWARC/1.0\r\nafter\r\n\r\n"
    val out = Wet.readWet(spark, writeTemp(bad)).collect()
    assert(out.length == 4) // the delimiter inside a payload splits it
    assert(out.forall(!_.getAs[Boolean]("framing_ok")))
  }

  test("round-trip: serialize documents, read back byte-identically") {
    val docs = Seq(
      (1L, "plain single line"),
      (2L, "multi\nline\npayload with trailing spaces   "),
      (3L, "")).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft_wet_rt").toString
    Wet.writeWet(Wet.toWetRecords(docs, "http://t/doc/"), dir)
    val back = Wet.readWet(spark, dir)
      .filter($"warc_type" === "conversion")
      .select($"target_uri", $"payload", $"framing_ok", $"content_length")
      .collect().sortBy(_.getString(0))
    assert(back.length == 3)
    assert(back.forall(_.getAs[Boolean]("framing_ok")))
    val payloads = back.map(r =>
      r.getString(0).stripPrefix("http://t/doc/").toLong -> r.getString(1)).toMap
    docs.collect().foreach(r =>
      assert(payloads(r.getLong(0)) == r.getString(1), s"doc ${r.getLong(0)}"))
  }

  test("readWetStream: segments landing in a watched dir parse as in batch") {
    val dir = Files.createTempDirectory("graft_wet_stream")
    val stream = Wet.readWetStream(spark, dir.toString)
    assert(stream.isStreaming)
    val query = stream.writeStream.format("memory").queryName("wet_stream")
      .outputMode("append").start()
    try {
      Files.write(Paths.get(dir.toString, "seg0.wet"),
        goldenWet.getBytes(StandardCharsets.UTF_8))
      query.processAllAvailable()
      val got = spark.table("wet_stream").collect()
      val batch = Wet.readWet(spark, dir.toString).collect()
      assert(got.length == batch.length)
      assert(got.map(_.toString).sorted.sameElements(batch.map(_.toString).sorted))
    } finally query.stop()
  }

  test("toDocuments: curate-ready shape — hashed ids, ingest lang-ID, clean records only") {
    val docs = Wet.toDocuments(Wet.readWet(spark, writeTemp(goldenWet)))
    assert(docs.columns.toSeq == Seq("doc_id", "url", "lang", "text"))
    val rows = docs.orderBy("url").collect()
    assert(rows.length == 2) // warcinfo excluded
    assert(rows(0).getAs[String]("url") == "http://example.test/a")
    assert(rows(0).getAs[String]("text") == "first line\nsecond line\nthird")
    assert(rows(0).getAs[String]("lang") != null)
    // id is the deterministic uri hash — stable across re-ingest
    val again = Wet.toDocuments(Wet.readWet(spark, writeTemp(goldenWet)))
      .orderBy("url").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq ==
      again.map(_.getAs[Long]("doc_id")).toSeq)
    // mis-framed records never become documents
    val bad = "WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: http://x/\r\nContent-Length: 99\r\n\r\nshort\r\n\r\n"
    assert(Wet.toDocuments(Wet.readWet(spark, writeTemp(bad))).count() == 0)
  }

  test("crawl-to-corpus streaming e2e: WET segments -> documents -> incremental dedup sink") {
    // two WET segments landing over time; segment 2 re-crawls one page
    // of segment 1 verbatim (same uri, same text) — the incremental
    // dedup sink must drop the twin and append only the fresh page
    val wetDir = Files.createTempDirectory("graft_wet_e2e")
    val out = Files.createTempDirectory("graft_wet_e2e_out")
    def rec(uri: String, body: String): String = {
      val n = body.getBytes(StandardCharsets.UTF_8).length
      s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $uri\r\n" +
        s"WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: $n\r\n\r\n$body\r\n\r\n"
    }
    val docs = Wet.toDocuments(Wet.readWetStream(spark, wetDir.toString))
    val query = graft.operators.CorpusPipeline.writeStreamIncrementalDedup(
      docs, s"$out/corpus", s"$out/sigs", s"$out/ckpt")
    try {
      Files.write(Paths.get(wetDir.toString, "seg1.wet"),
        (rec("http://e.test/a", "the first page body with several tokens here") +
          rec("http://e.test/b", "a second page wholly different from the first one"))
          .getBytes(StandardCharsets.UTF_8))
      query.processAllAvailable()
      Files.write(Paths.get(wetDir.toString, "seg2.wet"),
        (rec("http://e.test/a2", "the first page body with several tokens here") + // twin of /a
          rec("http://e.test/c", "an entirely fresh third page arriving later on"))
          .getBytes(StandardCharsets.UTF_8))
      query.processAllAvailable()
    } finally query.stop()
    val corpus = spark.read.parquet(s"$out/corpus")
      .select("url", "text").collect().map(r => r.getString(0)).toSet
    assert(corpus == Set("http://e.test/a", "http://e.test/b", "http://e.test/c"),
      s"got $corpus") // the re-crawl twin never lands
  }

  test("split-parallel read: record straddling a file-split boundary parses exactly") {
    // many records, read with a tiny maxPartitionBytes so the scan is
    // forced into multiple splits — Hadoop's custom-delimiter LineReader
    // must reassemble records across split edges
    val docs = (1L to 200L).map(i => (i, s"doc $i " + ("x " * 40).trim))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft_wet_split").toString
    Wet.writeWet(Wet.toWetRecords(docs.repartition(1), "http://t/doc/"), dir)
    val conf = spark.conf
    val prev = conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    val prevCost = conf.get("spark.sql.files.openCostInBytes", "4194304")
    try {
      conf.set("spark.sql.files.maxPartitionBytes", "2048")
      conf.set("spark.sql.files.openCostInBytes", "0")
      val df = Wet.readWet(spark, dir).filter($"warc_type" === "conversion")
      assert(df.rdd.getNumPartitions > 1, "expected a multi-split scan")
      assert(df.count() == 200)
      assert(df.filter(!$"framing_ok").count() == 0)
    } finally {
      conf.set("spark.sql.files.maxPartitionBytes", prev)
      conf.set("spark.sql.files.openCostInBytes", prevCost)
    }
  }
}
