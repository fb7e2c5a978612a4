package graft

import org.apache.spark.sql.functions._

/** SURT keys and the CDXJ index: kernel battery, global sortedness,
  * offset fidelity against the raw archive bytes, malformed-line
  * degrade. */
class CdxSpec extends SparkSpec {
  import spark.implicits._

  private def surt(u: String): String =
    Seq(u).toDF("u")
      .select(graft.expressions.NativeUrl.surtUrl($"u").as("s"))
      .collect()(0).getString(0)

  /** The CURRENT generation's shard files (manifest-resolved, range
    * order) — how a reader sees the maintained index. */
  private def currentFiles(dir: String): List[java.io.File] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (_, parts, _) = graft.io.Cdx.currentShards(fs, p)
    parts.toList.map(sp => new java.io.File(sp.toUri.getPath))
  }

  private def shardLines(dir: String): List[String] =
    currentFiles(dir).flatMap(f =>
      scala.io.Source.fromFile(f)(scala.io.Codec.UTF8).getLines().toList)

  test("surt kernel: reversal, www strip, ports, case, v6, non-urls") {
    assert(surt("http://WWW.Example.COM/A/B?C=1") == "com,example)/a/b?c=1")
    assert(surt("https://sub.d.example.com:8443/x") ==
      "com,example,d,sub:8443)/x")
    assert(surt("http://example.com:80/x") == "com,example)/x") // default drops
    assert(surt("http://user:p@example.com/x") == "com,example)/x")
    assert(surt("http://example.com") == "com,example)/")
    assert(surt("http://www.com/") == "com,www)/") // lone www is a host
    assert(surt("http://[2001:DB8::1]/x") == "[2001:db8::1])/x")
    assert(surt("not a url") == null)
    assert(surt("mailto:a@b.test") == null)
  }

  test("cdxFromWarc offsets address the record in the raw archive bytes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_off").toString
    graft.io.Warc.writeWarcResponses(
      Seq(("http://a.test/1", "text/html", "<p>one</p>".getBytes("UTF-8")),
        ("http://a.test/2", "text/html", "<p>two</p>".getBytes("UTF-8")))
        .toDF("target_uri", "content_type", "payload").coalesce(1), dir)
    val idx = graft.io.Cdx.cdxFromWarc(graft.io.Warc.readWarc(spark, dir))
      .select("url", "offset", "filename").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toList
    assert(idx.map(_._1).toSet == Set("http://a.test/1", "http://a.test/2"))
    val raw = java.nio.file.Files.readAllBytes(
      new java.io.File(dir).listFiles().head.toPath)
    idx.foreach { case (url, off, _) =>
      val tail = java.util.Arrays.copyOfRange(raw, off.toInt, raw.length)
      val d2 = java.nio.file.Files.createTempDirectory("graft_cdx_tail")
      java.nio.file.Files.write(d2.resolve("t.warc"), tail)
      val rec = graft.io.Warc.readWarc(spark, d2.toString).head()
      assert(rec.target_uri == url, s"offset $off")
    }
  }

  test("writeCdxj sorts globally; readCdxj round-trips; malformed flags") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_rt").toString
    val idx = Seq(
      ("com,zzz)/a", "20260102000000", "http://zzz.com/a", "text/html",
        Integer.valueOf(200), "sha1:AAAA", java.lang.Long.valueOf(10L),
        java.lang.Long.valueOf(0L), java.lang.Long.valueOf(123L), "seg0.warc.gz"),
      ("com,aaa)/b", "20260101000000", "http://aaa.com/b", null,
        null: Integer, null: String, null: java.lang.Long,
        java.lang.Long.valueOf(7L), null: java.lang.Long, "seg0.warc"))
      .toDF("surt", "ts", "url", "mime", "status", "digest", "length",
        "offset", "gz_offset", "filename")
    graft.io.Cdx.writeCdxj(idx, dir)
    val lines = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).sorted
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toList).toList
    assert(lines.map(_.split(" ")(0)) == lines.map(_.split(" ")(0)).sorted)
    assert(lines.head.startsWith("com,aaa)/b 20260101000000 {"))
    val back = graft.io.Cdx.readCdxj(spark, dir)
    val ok = back.filter($"ok").collect()
      .map(r => (r.getString(0), r.getString(2), r.getAs[Any]("status"),
        r.getAs[Any]("length"), r.getAs[Any]("gz_offset"))).toSet
    assert(ok == Set(
      ("com,zzz)/a", "http://zzz.com/a", 200, 10L, 123L),
      ("com,aaa)/b", "http://aaa.com/b", null, null, null)))
    // a malformed line degrades to its own flagged row
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "junk.cdxj"), "garbage-without-fields\n")
    val flagged = graft.io.Cdx.readCdxj(spark, dir).filter(!$"ok").collect()
    assert(flagged.length == 1 &&
      flagged(0).getAs[String]("filename") == "garbage-without-fields")
  }

  test("per-record-gzip members carry compressed offsets; fetch is addressed") {
    import org.apache.spark.sql.functions.{lit => flit}
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_gz").toString
    graft.io.Warc.writeWarcResponses(
      (0 until 8).map(i =>
        (s"http://h$i.test/p", "text/html", s"<p>body $i</p>".getBytes("UTF-8")))
        .toDF("target_uri", "content_type", "payload").coalesce(1),
      dir, gzipPerRecord = true)
    val recs = graft.io.Warc.readWarc(spark, dir).collect()
    assert(recs.length == 8 && recs.forall(_.framing_ok))
    // Annex D: every record its own member → member-relative offset 0,
    // strictly increasing compressed member offsets, first at byte 0
    assert(recs.forall(_.offset == 0L))
    val gz = recs.sortBy(_.record_idx).map(_.gz_offset)
    assert(gz.head == 0L && gz.sliding(2).forall(w => w(0) < w(1)))
    // index → slice → fetch: only the named records come back
    val idxDir = java.nio.file.Files.createTempDirectory("graft_cdx_gzi").toString
    graft.io.Cdx.writeCdxj(
      graft.io.Cdx.cdxFromWarc(graft.io.Warc.readWarc(spark, dir)), idxDir)
    val slice = graft.io.Cdx.readCdxj(spark, idxDir)
      .filter($"surt".startsWith("test,h3)") || $"surt".startsWith("test,h6)"))
    val fetched = graft.io.Cdx.fetchRecords(spark, slice).collect()
    assert(fetched.map(_.target_uri).toSet ==
      Set("http://h3.test/p", "http://h6.test/p"))
    assert(fetched.forall(r => r.framing_ok &&
      new String(r.payload, "UTF-8").startsWith("<p>body ")))
    // bare-archive addressing fetches by file offset through the same call
    val bare = java.nio.file.Files.createTempDirectory("graft_cdx_bare").toString
    graft.io.Warc.writeWarcResponses(
      (0 until 4).map(i =>
        (s"http://b$i.test/p", "text/plain", s"plain $i".getBytes("UTF-8")))
        .toDF("target_uri", "content_type", "payload").coalesce(1), bare)
    val bi = graft.io.Cdx.cdxFromWarc(graft.io.Warc.readWarc(spark, bare))
    val got = graft.io.Cdx.fetchRecords(spark, bi.filter($"url".contains("b2")))
      .collect()
    assert(got.length == 1 && new String(got(0).payload, "UTF-8") == "plain 2")
    // a stale offset degrades to its own flagged row, not a job failure
    val stale = bi.filter($"url".contains("b1"))
      .withColumn("offset", $"offset" + flit(3L))
    val bad = graft.io.Warc.readWarcRecordsAt(spark,
      stale.select($"filename", $"offset", $"gz_offset")).collect()
    assert(bad.length == 1 && !bad(0).framing_ok)
  }

  test("mergeCdxj: delta merges into only the touched shards, order preserved") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_merge")
    def shard(name: String, surts: String*): java.nio.file.Path = {
      val p = dir.resolve(name)
      java.nio.file.Files.writeString(p,
        surts.map(s => s"""$s 20260101000000 {"url":"http://x.test/"}""")
          .mkString("", "\n", "\n"))
      p
    }
    shard("part-00000", "com,aaa)/1", "com,bbb)/1")
    shard("part-00001", "com,mmm)/1", "com,nnn)/1")
    val untouched = shard("part-00002", "com,ttt)/1", "com,zzz)/1")
    val untouchedBytes = java.nio.file.Files.readAllBytes(untouched)
    val delta = Seq(
      // below the first shard's first key: routes to shard 0
      ("com,aa)/0", "20260101000000", "http://aa.com/0", null: String,
        null: Integer, null: String, null: java.lang.Long,
        java.lang.Long.valueOf(0L), null: java.lang.Long, "d.warc"),
      // inside shard 1's range
      ("com,mzz)/9", "20260201000000", "http://mzz.com/9", null,
        null: Integer, null, null: java.lang.Long,
        java.lang.Long.valueOf(7L), null: java.lang.Long, "d.warc"),
      // a key-tie with a standing line: standing wins the tie (stable)
      ("com,mmm)/1", "20260101000000", "http://mmm.com/1-delta", null,
        null: Integer, null, null: java.lang.Long,
        java.lang.Long.valueOf(9L), null: java.lang.Long, "d.warc"))
      .toDF("surt", "ts", "url", "mime", "status", "digest", "length",
        "offset", "gz_offset", "filename")
    graft.io.Cdx.mergeCdxj(spark, dir.toString, delta)
    // the untouched shard's bytes never moved — its FILE carries
    // forward into the new generation's manifest by name
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(untouched), untouchedBytes))
    assert(currentFiles(dir.toString).map(_.getName).contains("part-00002"))
    // the merged index is one globally-sorted, fully-parseable whole
    val lines = shardLines(dir.toString)
    assert(lines.length == 9)
    val keys = lines.map(l => l.substring(0, l.indexOf(' ', l.indexOf(' ') + 1)))
    assert(keys == keys.sorted)
    // the tie kept the standing line first
    val mmm = lines.filter(_.startsWith("com,mmm)/1 "))
    assert(mmm.length == 2 && mmm.head.contains("http://x.test/") &&
      mmm(1).contains("1-delta"))
    assert(graft.io.Cdx.readCdxj(spark, dir.toString)
      .filter(!$"ok").isEmpty)
    // bootstrap: merging into an empty dir IS the initial write
    val fresh = java.nio.file.Files.createTempDirectory("graft_cdx_boot")
    graft.io.Cdx.mergeCdxj(spark, fresh.toString, delta)
    assert(graft.io.Cdx.readCdxj(spark, fresh.toString)
      .filter($"ok").count() == 3)
  }

  test("latestCaptures / closestCaptures: the index's time axis cuts correctly") {
    val idx = Seq(
      ("com,a)/p", "20260115000000", "http://a.com/p", 0L),
      ("com,a)/p", "20260215000000", "http://a.com/p", 100L),
      ("com,a)/p", "20260315000000", "http://a.com/p", 200L),
      ("com,b)/q", "20260101000000", "http://b.com/q", 0L))
      .toDF("surt", "ts", "url", "offset")
      .withColumn("mime", lit("text/html"))
      .withColumn("status", lit(200))
      .withColumn("digest", lit(null).cast("string"))
      .withColumn("length", lit(10L))
      .withColumn("gz_offset", lit(null).cast("long"))
      .withColumn("filename", lit("seg0.warc"))
    val latest = graft.io.Cdx.latestCaptures(idx).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(latest == Map("com,a)/p" -> "20260315000000",
      "com,b)/q" -> "20260101000000"))
    // closest to Feb 10: the Feb capture wins on a (5 days), b keeps
    // its only capture however far
    val closest = graft.io.Cdx.closestCaptures(idx, "20260210000000")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(closest == Map("com,a)/p" -> "20260215000000",
      "com,b)/q" -> "20260101000000"))
    // exact tie (equidistant): the EARLIER capture wins — replay never
    // shows newer than asked when equidistant
    val tied = graft.io.Cdx.closestCaptures(idx, "20260215000000")
      .filter($"surt" === "com,a)/p").head().getString(1)
    assert(tied == "20260215000000")
    val mid = graft.io.Cdx.closestCaptures(idx, "20260301000000")
      .filter($"surt" === "com,a)/p").head().getString(1)
    assert(mid == "20260215000000") // 14 days back vs 14 days forward: earlier
  }

  test("fetch path carries the session Hadoop configuration (spark.hadoop.*)") {
    // a filesystem scheme ONLY the session conf declares: with a bare
    // executor-side `new Configuration()` the fetch would die with
    // "No FileSystem for scheme graftfs" — the session's spark.hadoop.*
    // settings (object-store credentials, fs impls) must reach the task
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_fs").toString
    graft.io.Warc.writeWarcResponses(
      Seq(("http://c.test/p", "text/plain", "conf carried".getBytes("UTF-8")))
        .toDF("target_uri", "content_type", "payload").coalesce(1), dir)
    val idx = graft.io.Cdx.cdxFromWarc(graft.io.Warc.readWarc(spark, dir))
      .withColumn("filename",
        concat(lit("graftfs:"), regexp_replace($"filename", "^file:", "")))
    val got = graft.io.Cdx.fetchRecords(spark, idx).collect()
    assert(got.length == 1 && got(0).framing_ok &&
      new String(got(0).payload, "UTF-8") == "conf carried")
  }

  test("deleteFromCdxj: straddling surt, emptied shards, no-op, merge after") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_del").toString
    def row(host: String, i: Int) =
      (s"test,$host)/p", f"202601010000$i%02d", s"http://$host.test/p",
        "text/html", Integer.valueOf(200), s"sha1:$host$i",
        java.lang.Long.valueOf(10L), java.lang.Long.valueOf(i.toLong),
        null: java.lang.Long, "seg0.warc")
    val idx = (for (h <- Seq("a", "b", "c"); i <- 0 until 8) yield row(h, i))
      .toDF("surt", "ts", "url", "mime", "status", "digest", "length",
        "offset", "gz_offset", "filename")
    // six range shards over 24 lines: b's 8-capture run straddles
    // shard boundaries, so the delete must route to a shard SPAN
    graft.io.Cdx.writeCdxj(idx, dir, shards = 6)
    def lines() = shardLines(dir)
    assert(lines().size == 24)
    // absent key: no-op, zero count
    assert(graft.io.Cdx.deleteFromCdxj(spark, dir,
      Seq("http://zz.test/p").toDF("url")) == 0L)
    assert(lines().size == 24)
    // the straddler: every one of b's captures goes, a and c intact
    val removed = graft.io.Cdx.deleteFromCdxj(spark, dir,
      Seq("http://b.test/p").toDF("url"))
    assert(removed == 8L)
    val after = lines()
    assert(after.size == 16 && !after.exists(_.startsWith("test,b)")))
    assert(after == after.sorted) // shards stay internally/globally sorted
    // the index still merges: bounds re-derive from the surviving
    // shards (any emptied shard was REMOVED, not left to poison them)
    graft.io.Cdx.mergeCdxj(spark, dir,
      Seq(("test,b)/p", "20260201000000", "http://b.test/p", "text/html",
        Integer.valueOf(200), "sha1:new", java.lang.Long.valueOf(10L),
        java.lang.Long.valueOf(99L), null: java.lang.Long, "seg1.warc"))
        .toDF("surt", "ts", "url", "mime", "status", "digest", "length",
          "offset", "gz_offset", "filename"))
    val merged = lines()
    assert(merged.size == 17 && merged == merged.sorted &&
      merged.count(_.startsWith("test,b)")) == 1)
    // compaction re-shards the drifted layout; a flagged junk line is
    // dropped LOUDLY through the returned count
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "junk.cdxj"), "garbage-line\n")
    val (kept, dropped) = graft.io.Cdx.compactCdxj(spark, dir, shards = 2)
    assert(kept == 17L && dropped == 1L)
    val compacted = lines()
    assert(compacted.size == 17 && compacted == compacted.sorted)
    assert(compacted.map(_.split(" ", 3).take(2).mkString(" ")) ==
      merged.map(_.split(" ", 3).take(2).mkString(" ")))
    // compaction consumed the flagged sidecar (counted above) and left
    // no staging residue; the batch marker and any other dot-file ride
    // through untouched (the dir itself never disappears)
    val leftovers = new java.io.File(dir).listFiles().map(_.getName)
    assert(!leftovers.contains("junk.cdxj"))
    assert(!leftovers.exists(_.startsWith(".stage-")))
  }

  private def idxRows(surts: (String, String, Long)*) =
    surts.map { case (surt, ts, off) =>
      (surt, ts, "http://" + surt.takeWhile(_ != ')') + ".test/p",
        "text/html", Integer.valueOf(200), s"sha1:$off",
        java.lang.Long.valueOf(10L), java.lang.Long.valueOf(off),
        null: java.lang.Long, "s.warc")
    }.toDF("surt", "ts", "url", "mime", "status", "digest", "length",
      "offset", "gz_offset", "filename")

  test("mergeCdxj converges on replay; the batch guard skips replayed ids") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_conv").toString
    graft.io.Cdx.writeCdxj(idxRows(
      ("test,a)/", "20260101000000", 0L), ("test,b)/", "20260101000000", 1L),
      ("test,c)/", "20260101000000", 2L), ("test,d)/", "20260101000000", 3L)),
      dir)
    def count() = graft.io.Cdx.readCdxj(spark, dir).count()
    val delta = idxRows(("test,bb)/", "20260201000000", 4L),
      ("test,cc)/", "20260201000000", 5L))
    graft.io.Cdx.mergeCdxj(spark, dir, delta)
    assert(count() == 6)
    // the crash-replay shape: the SAME delta merged again — byte-identical
    // lines are adjacent to their standing twins and skip, so the index
    // converges instead of accumulating
    graft.io.Cdx.mergeCdxj(spark, dir, delta)
    assert(count() == 6)
    // a DISTINCT capture at an existing (surt, ts) key is not a duplicate
    graft.io.Cdx.mergeCdxj(spark, dir,
      idxRows(("test,bb)/", "20260201000000", 99L)))
    assert(count() == 7)
    // the at-most-once guard: a replayed microbatch id never re-merges
    val d2 = idxRows(("test,e)/", "20260301000000", 6L))
    assert(graft.io.Cdx.mergeCdxjIdempotent(spark, dir, d2, 7L))
    assert(count() == 8)
    assert(!graft.io.Cdx.mergeCdxjIdempotent(spark, dir, d2, 7L))
    assert(count() == 8)
  }

  test("replay converges when several captures share a (surt, ts) key") {
    // the non-adjacent-twin shape: standing holds TWO distinct captures
    // at one key; a replayed delta re-sends the FIRST — draining both
    // standing lines must not forget the earlier twin (a last-line-only
    // comparison would re-add it and the index would grow every replay)
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_twin").toString
    graft.io.Cdx.writeCdxj(idxRows(
      ("test,a)/", "20260101000000", 0L),
      ("test,a)/", "20260101000000", 1L), // same key, distinct json
      ("test,z)/", "20260101000000", 2L)), dir)
    def count() = graft.io.Cdx.readCdxj(spark, dir).count()
    assert(count() == 3)
    graft.io.Cdx.mergeCdxj(spark, dir,
      idxRows(("test,a)/", "20260101000000", 0L)))
    assert(count() == 3, "replayed twin of the FIRST capture must skip")
    graft.io.Cdx.mergeCdxj(spark, dir,
      idxRows(("test,a)/", "20260101000000", 1L)))
    assert(count() == 3, "replayed twin of the SECOND capture must skip")
    // a delta that self-duplicates one line also converges to ONE copy
    graft.io.Cdx.mergeCdxj(spark, dir,
      idxRows(("test,m)/", "20260101000000", 9L),
        ("test,m)/", "20260101000000", 9L)))
    assert(count() == 4)
    val lines = shardLines(dir)
    assert(lines == lines.sorted)
  }

  test("merge/delete compare keys in code-point order (astral SURTs)") {
    // Spark laid the standing shards out in UTF-8 binary order ==
    // code-point order; Java's UTF-16 `<` disagrees for astral chars:
    // U+FF01 (！) sorts BELOW U+1F600 (😀) by code point but ABOVE its
    // lead surrogate 0xD83D. On disk: ！-key first, 😀-key second. A
    // `<`-driven drain for the 😀 delta would stop at the ！ line,
    // write the replayed 😀 line before it (misorder) and past the
    // convergence skip (duplicate).
    val kBang = "com,x)/a！"
    val kEmoji = "com,x)/a😀"
    assert(kBang > kEmoji, "lane must exercise the divergence")
    assert(graft.io.Cdx.cpCompare(kBang, kEmoji) < 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_astral").toString
    graft.io.Cdx.writeCdxj(idxRows(
      (kBang, "20260101000000", 0L),
      (kEmoji, "20260101000000", 1L),
      ("com,z)/", "20260101000000", 2L)), dir, shards = 2)
    val before = shardLines(dir)
    assert(before.map(_.takeWhile(_ != ' ')).take(2) == List(kBang, kEmoji),
      "standing layout is code-point ordered")
    // the crash-replay shape, on the astral key
    graft.io.Cdx.mergeCdxj(spark, dir,
      idxRows((kEmoji, "20260101000000", 1L)))
    assert(shardLines(dir) == before,
      "replayed astral line must skip, not duplicate or reorder")
    // a fresh capture lands AFTER the ！ line, keeping disk order
    graft.io.Cdx.mergeCdxj(spark, dir,
      idxRows((kEmoji, "20260201000000", 3L)))
    val merged = shardLines(dir)
    assert(merged.length == 4)
    val keys = merged.map(l => l.substring(0, l.indexOf(' ', l.indexOf(' ') + 1)))
    assert(keys == keys.sortWith(graft.io.Cdx.cpCompare(_, _) < 0))
    // the takedown walks the same order: deleting the 😀 URL must not
    // strand the drain before the ！ line
    val removed = graft.io.Cdx.deleteFromCdxj(spark, dir,
      Seq("http://x.com/a😀").toDF("url"))
    assert(removed == 2L)
    assert(shardLines(dir).map(_.takeWhile(_ != ' ')) ==
      List(kBang, "com,z)/"))
  }

  test("maintenance publishes whole generations: pre-flip files invisible, GC collects") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_gen").toString
    graft.io.Cdx.writeCdxj(idxRows(
      ("test,a)/", "20260101000000", 0L),
      ("test,b)/", "20260101000000", 1L)), dir)
    // a crashed writer's pre-flip residue: a next-generation shard file
    // with DIFFERENT content, never published by a manifest flip
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "shard-g000000099-00000-000"),
      "test,x)/ 20260101000000 {\"url\":\"http://x.test/ghost\"}\n")
    // readers resolve the manifest: the unpublished file is invisible
    val seen = graft.io.Cdx.readCdxj(spark, dir)
      .select("surt").as[String].collect().toSet
    assert(seen == Set("test,a)/", "test,b)/"),
      "a pre-flip shard file must not leak into readers")
    // the next maintenance verb garbage-collects the residue and the
    // superseded generation, and the index stays complete throughout
    graft.io.Cdx.mergeCdxj(spark, dir,
      idxRows(("test,c)/", "20260201000000", 2L)))
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(!names.contains("shard-g000000099-00000-000"))
    assert(names.count(_.startsWith(".manifest-")) == 1,
      "exactly one live manifest after GC")
    assert(graft.io.Cdx.readCdxj(spark, dir).count() == 3)
    // every file the live manifest names exists (a complete generation)
    currentFiles(dir).foreach(f => assert(f.exists(), f.getName))
  }

  test("bootstrap merge preserves the dir's dot-files and batch marker") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_boot2").toString
    // the streaming maintenance state a bootstrap must NOT destroy: the
    // at-most-once marker (and any sibling dot-file — the writer lease)
    val delta = idxRows(("test,a)/", "20260101000000", 0L))
    assert(graft.io.Cdx.mergeCdxjIdempotent(spark, dir, delta, 3L))
    // the marker written after the bootstrap SURVIVES it: the replayed
    // id is skipped (the old overwrite-bootstrap reset it to -1)
    assert(!graft.io.Cdx.mergeCdxjIdempotent(spark, dir, delta, 3L))
    assert(graft.io.Sinks.lastCommittedBatch(spark, dir) == 3L)
    // a takedown that empties the whole index, then a re-bootstrap:
    // marker continuity still holds across the emptied state
    assert(graft.io.Cdx.deleteFromCdxj(spark, dir,
      Seq("http://a.test/").toDF("url")) == 1L)
    assert(graft.io.Cdx.readCdxj(spark, dir).count() == 0)
    assert(graft.io.Sinks.lastCommittedBatch(spark, dir) == 3L)
    assert(!graft.io.Cdx.mergeCdxjIdempotent(spark, dir, delta, 2L),
      "an old batch id must stay skipped after a full takedown")
    assert(graft.io.Cdx.mergeCdxjIdempotent(spark, dir, delta, 4L))
    assert(graft.io.Cdx.readCdxj(spark, dir).count() == 1)
  }

  test("mergeCdxj hot-shard split: repeated hot-site merges keep shard size bounded") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_split").toString
    def wave(n: Int) = idxRows(
      (0 until 64).map(i =>
        (f"test,hot)/p$i%03d", f"2026020100${n}%02d00", (n * 64 + i).toLong)): _*)
    graft.io.Cdx.writeCdxj(idxRows(
      ("test,cold)/", "20260101000000", 0L),
      ("test,hot)/p000", "20260101000000", 1L),
      ("test,zz)/", "20260101000000", 2L)), dir, shards = 3)
    // every wave lands in the hot shard; the 4 KiB threshold forces it
    // to split instead of growing without bound between compactions
    (0 until 8).foreach(n =>
      graft.io.Cdx.mergeCdxj(spark, dir, wave(n), maxShardBytes = 4096))
    val files = currentFiles(dir)
    assert(files.length > 3, "the hot shard must have split")
    val maxBytes = files.map(_.length).max
    assert(maxBytes < 3 * 4096,
      s"no shard may grow far past the split threshold (max $maxBytes)")
    // the split index is still one globally-sorted whole with every
    // capture present exactly once, and replay still converges
    val lines = shardLines(dir)
    assert(lines == lines.sorted)
    assert(graft.io.Cdx.readCdxj(spark, dir).filter($"ok").count() ==
      3 + 8 * 64)
    graft.io.Cdx.mergeCdxj(spark, dir, wave(3), maxShardBytes = 4096)
    assert(graft.io.Cdx.readCdxj(spark, dir).filter($"ok").count() ==
      3 + 8 * 64, "a replayed wave must converge across split shards")
    // and the split shards still fetch/route: a fresh key between two
    // split boundaries merges into exactly one of them
    graft.io.Cdx.mergeCdxj(spark, dir,
      idxRows(("test,hot)/p032x", "20260301000000", 999L)))
    val after = shardLines(dir)
    assert(after.count(_.startsWith("test,hot)/p032x ")) == 1)
    assert(after == after.sorted)
  }

  test("writeStreamCdx: the standing index maintained as segments arrive") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdx_str").toString
    new java.io.File(s"$root/in").mkdirs()
    def wave(n: Int): Unit = {
      graft.io.Warc.writeWarcResponses(
        Seq.tabulate(3)(i => (s"http://w$n.test/p$i", "text/plain",
          s"wave$n doc$i".getBytes("UTF-8")))
          .toDF("target_uri", "content_type", "payload").coalesce(1),
        s"$root/w$n", gzipPerRecord = true)
      new java.io.File(s"$root/w$n").listFiles()
        .filter(_.getName.endsWith(".warc.gz")).foreach { f =>
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(s"$root/in", s"w$n-${f.getName}"))
        }
    }
    wave(0)
    val q = graft.io.Cdx.writeStreamCdx(
      graft.io.Warc.readWarcStream(spark, s"$root/in"),
      s"$root/idx", s"$root/ckpt")
    try {
      q.processAllAvailable()
      wave(1)
      q.processAllAvailable()
    } finally q.stop()
    // every capture of both waves fetches back through the index built
    // AS the segments arrived
    val got = graft.io.Cdx.fetchRecords(spark,
        graft.io.Cdx.readCdxj(spark, s"$root/idx"))
      .collect().map(r => new String(r.payload, "UTF-8")).toSet
    assert(got == (for (n <- 0 to 1; i <- 0 to 2) yield s"wave$n doc$i").toSet)
  }
}

/** A local filesystem under a scheme only the SESSION configuration
  * maps — the probe CdxSpec uses to prove `spark.hadoop.*` settings
  * reach the offset-addressed fetch task. */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}
