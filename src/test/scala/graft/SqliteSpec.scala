package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.operators.Sqlite

/** The SQLite page walk: writer→reader round-trips (single leaf,
  * interior trees, overflow chains), every serial type, schema column
  * parsing, fail-loud framing, sniffing, and the warc bridges. */
class SqliteSpec extends SparkSpec {

  test("single-leaf round-trip: catalog, columns, rows, flattening") {
    val db = Sqlite.writeSqlite("notes", Seq("source", "body"), Seq(
      Seq("web", "first row"),
      Seq("mail", "second\trow with tab")))
    assert(Sqlite.isSqlite(db))
    val tabs = Sqlite.tables(db)
    assert(tabs.map(_.name) == Vector("notes"))
    assert(Sqlite.columnsOf(tabs.head.sql)._1 == Vector("source", "body"))
    val rows = Sqlite.rows(db, tabs.head)
    assert(rows.map(_._1) == Vector(1L, 2L)) // rowid order
    assert(rows.map(_._2) == Vector(
      Vector("web", "first row"), Vector("mail", "second\trow with tab")))
    assert(Sqlite.extractText(db) ==
      "web\tfirst row\nmail\tsecond\trow with tab")
  }

  test("multi-leaf tree walks through the interior root in rowid order") {
    val n = 600 // ~70 bytes/row → far past one 4096-byte leaf
    val rows = (1 to n).map(i => Seq(s"src$i", s"row number $i " + "x" * 40))
    val db = Sqlite.writeSqlite("big", Seq("source", "body"), rows)
    val tab = Sqlite.tables(db).head
    assert(tab.rootPage > 2) // an interior page was needed
    val got = Sqlite.rows(db, tab)
    assert(got.size == n)
    assert(got.map(_._1) == (1 to n).map(_.toLong).toVector)
    assert(got(17)._2 == Vector("src18", "row number 18 " + "x" * 40))
    assert(got.last._2.head == s"src$n")
  }

  test("overflow chains: payloads past the spill threshold round-trip") {
    val long1 = "A" * 5000 // one overflow page
    val long2 = (1 to 3000).map(i => s"w$i").mkString(" ") // several pages
    val db = Sqlite.writeSqlite("blobs", Seq("body"),
      Seq(Seq("short"), Seq(long1), Seq(long2)))
    val tab = Sqlite.tables(db).head
    val got = Sqlite.rows(db, tab).map(_._2.head.asInstanceOf[String])
    assert(got == Vector("short", long1, long2))
  }

  test("record decode covers every serial type") {
    def vi(v: Long): Array[Byte] = {
      // test-local varint builder (values < 2^14 here)
      if (v <= 0x7f) Array(v.toByte)
      else Array((0x80 | (v >> 7)).toByte, (v & 0x7f).toByte)
    }
    val text = "hé".getBytes(UTF_8)
    val blob = Array[Byte](1, 2, 3)
    val body =
      Array[Byte](-1) ++ // type 1: -1
        Array[Byte](0x12, 0x34) ++ // type 2
        Array[Byte](-1, -1, -2) ++ // type 3: -2 sign-extended
        Array[Byte](0, 1, 0, 0) ++ // type 4: 65536
        Array[Byte](0, 0, 0, 0, 1, 0) ++ // type 5 (6 bytes): 256
        Array[Byte](0, 0, 0, 1, 0, 0, 0, 0) ++ // type 6 (8 bytes): 2^32
        Array[Byte](0x3f, -16, 0, 0, 0, 0, 0, 0) ++ // type 7: 1.0
        text ++ blob
    val serials = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L,
      13L + 2 * text.length, 12L + 2 * blob.length)
    val header = serials.flatMap(vi).toArray
    val payload = vi(header.length + 1L) ++ header ++ body
    val vals = Sqlite.record(payload, 7L)
    assert(vals(0) == null)
    assert(vals.slice(1, 7) == Vector(-1L, 0x1234L, -2L, 65536L, 256L, 1L << 32))
    assert(vals(7) == 1.0)
    assert(vals(8) == 0L && vals(9) == 1L)
    assert(vals(10) == "hé")
    assert(java.util.Arrays.equals(vals(11).asInstanceOf[Array[Byte]], blob))
  }

  test("schema parsing: quoting, constraints, rowid alias") {
    val (cols, pk) = Sqlite.columnsOf(
      """CREATE TABLE "my table" (id INTEGER PRIMARY KEY, "quoted col" TEXT,
        |[brack] REAL, `tick` BLOB CHECK (tick > (1,2)),
        |PRIMARY KEY (id), UNIQUE (tick),
        |FOREIGN KEY (id) REFERENCES other(x))""".stripMargin)
    assert(cols == Vector("id", "quoted col", "brack", "tick"))
    assert(pk == 0)
    assert(Sqlite.columnsOf("CREATE TABLE t (a TEXT, b TEXT)")._2 == -1)
  }

  test("fail-loud framing: magic, truncation, page type, bad offsets") {
    intercept[IllegalArgumentException] {
      Sqlite.tables("not a database at all".getBytes(UTF_8))
    }
    val db = Sqlite.writeSqlite("t", Seq("a"), Seq(Seq("x")))
    intercept[IllegalArgumentException] { Sqlite.tables(db.take(200)) }
    val badType = db.clone(); badType(100) = 2 // index page where table expected
    intercept[IllegalArgumentException] { Sqlite.tables(badType) }
    // point the catalog row's rootpage at a page beyond the database
    val tab = Sqlite.tables(db).head
    intercept[IllegalArgumentException] {
      Sqlite.rows(db, tab.copy(rootPage = 99L))
    }
  }

  test("warc e2e: sqlite responses and archive .db entries land") {
    import spark.implicits._
    val db1 = Sqlite.writeSqlite("docs", Seq("body"), Seq(Seq("from the db")))
    val db2 = Sqlite.writeSqlite("cache", Seq("v"), Seq(Seq("archived row")))
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_sqlite").toString
    graft.io.Warc.writeWarcResponses(
      Seq(
        ("http://a.test/export.sqlite", Sqlite.Mime, db1),
        ("http://a.test/bundle.zip", "application/zip",
          graft.operators.Docx.writeZip(Seq("app.db" -> db2))))
        .toDF("target_uri", "content_type", "payload"), dir)
    val recs = graft.io.Warc.readWarc(spark, dir)
    val direct = graft.io.Warc.toDocumentsSqlite(recs)
      .select("url", "text").as[(String, String)].collect().toMap
    assert(direct("http://a.test/export.sqlite") == "from the db")
    val viaZip = graft.io.Warc.toDocumentsArchive(recs)
      .select("url", "text").as[(String, String)].collect().toMap
    assert(viaZip("http://a.test/bundle.zip#app.db") == "archived row")
    assert(graft.operators.Sniff.sniffMime(db1).contains(Sqlite.Mime))
    assert(graft.io.Warc.toDocuments(recs).select("url").as[String]
      .collect().toSet.contains("http://a.test/export.sqlite"))
  }
  test("a b-tree page cycle fails loudly, not StackOverflowError") {
    val n = 600
    val rows = (1 to n).map(i => Seq(s"src$i", s"row number $i " + "x" * 40))
    val db = Sqlite.writeSqlite("big", Seq("source", "body"), rows)
    val tab = Sqlite.tables(db).head
    assert(tab.rootPage > 2) // interior root exists
    // patch the interior root's right-most child pointer to itself
    val bad = db.clone()
    val hdr = ((tab.rootPage - 1) * 4096).toInt
    val rp = tab.rootPage.toInt
    bad(hdr + 8) = ((rp >> 24) & 0xff).toByte
    bad(hdr + 9) = ((rp >> 16) & 0xff).toByte
    bad(hdr + 10) = ((rp >> 8) & 0xff).toByte
    bad(hdr + 11) = (rp & 0xff).toByte
    val e = intercept[IllegalArgumentException] { Sqlite.rows(bad, tab, 3L) }
    assert(e.getMessage.contains("cycle") && e.getMessage.contains("media 3"))
  }
}
