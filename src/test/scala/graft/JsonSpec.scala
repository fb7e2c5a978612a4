package graft

import graft.operators.Json
import graft.operators.Json._

/** JSON/JSONL extraction: the RFC 8259 grammar (full escape set,
  * surrogate pairs, strict numbers), the three document shapes, the
  * text/content preference contract, the sniff heuristic, and the
  * warc bridge end-to-end under the octet-stream lie. */
class JsonSpec extends SparkSpec {

  private def docs(s: String): Vector[(Int, String)] =
    Json.extractDocs(s.getBytes("UTF-8"), 1L)

  test("grammar: values, nesting, numbers incl. exponents, literals") {
    assert(parse("""{"a":[1,-2.5,3e10,0.1E-2],"b":{"c":null},"d":true}""") ==
      JObj(Vector(
        "a" -> JArr(Vector(JNum("1"), JNum("-2.5"), JNum("3e10"),
          JNum("0.1E-2"))),
        "b" -> JObj(Vector("c" -> JNull)),
        "d" -> JBool(true))))
    assert(parse("  [ ]  ") == JArr(Vector.empty))
    assert(parse("{}") == JObj(Vector.empty))
  }

  test("strings: escapes, \\uXXXX, surrogate pairs, both serializations") {
    assert(parse("\"a\\n\\t\\\"\\\\\\/b\"") == JStr("a\n\t\"\\/b"))
    assert(parse("\"\\u20ac\\u2603\"") == JStr("€☃"))
    // astral plane via surrogate-pair escapes = literal UTF-8 form
    assert(parse("\"\\ud83d\\ude00\"") == JStr("😀"))
    assert(parse("\"😀\"") == JStr("😀"))
    // quote round-trips both modes to the same value
    val s = "mixed \"q\" \\ / €☃😀 \t\n ctrl"
    assert(parse(Json.quote(s)) == JStr(s))
    assert(parse(Json.quote(s, asciiOnly = true)) == JStr(s))
    assert(!Json.quote(s, asciiOnly = true).exists(_ > 0x7e))
  }

  test("fail-loud grammar: garbage, trailing bytes, bad escapes, controls") {
    for (bad <- Seq("", "{", "[1,", "{\"a\":}", "{\"a\" 1}", "tru", "01",
      "1.", "1e", "-", "\"\\x\"", "\"\\u12g4\"", "\"a\nb\"", "{}x",
      "{'a':1}", "{\"a\":1,}"))
      intercept[IllegalArgumentException] { parse(bad) }
  }

  test("shapes: single object / array / JSONL, with indexes") {
    assert(docs("""{"text":"solo","n":1}""") == Vector((-1, "solo")))
    assert(docs("""[{"text":"a"},{"content":"b"}]""") ==
      Vector((0, "a"), (1, "b")))
    assert(docs("{\"text\":\"a\"}\r\n\n{\"text\":\"b\"}\n") ==
      Vector((0, "a"), (1, "b")))
    // a BOM'd single-line payload is still the single-object shape
    assert(docs("\uFEFF{\"text\":\"bom\"}") == Vector((-1, "bom")))
  }

  test("text/content contract: preference, decoys, loud violations") {
    assert(docs("""{"content":"c","text":"t"}""") == Vector((-1, "t")))
    assert(docs("""{"content":"only"}""") == Vector((-1, "only")))
    // non-string text is loud even when content would work
    intercept[IllegalArgumentException] {
      docs("""{"text":7,"content":"c"}""")
    }
    intercept[IllegalArgumentException] { docs("""{"title":"no field"}""") }
    intercept[IllegalArgumentException] { docs(""""scalar"""") }
    intercept[IllegalArgumentException] { docs("[1,2]") }
    intercept[IllegalArgumentException] { docs("{\"text\":\"a\"}\n[1]") }
  }

  test("sniff: strict-parse claims, conservative refusals") {
    def sniff(s: String) = Json.sniffJson(s.getBytes("UTF-8"))
    assert(sniff("""{"text":"a"}"""))
    assert(sniff("{\"a\":1}\n{\"a\":2}"))
    assert(sniff("[\n {\"a\":1}\n]")) // pretty-printed whole-payload parse
    assert(!sniff("{not json"))
    assert(!sniff("plain text"))
    assert(!sniff("[citation needed] reads like prose"))
    assert(graft.operators.Sniff.sniffMime(
      "{\"text\":\"x\"}".getBytes("UTF-8")).contains("application/json"))
  }

  test("warc e2e: octet-stream JSON sniffs and routes; malformed flags") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_json").toString
    graft.io.Warc.writeWarcResponses(
      Seq(
        // the crawl-reality lie: a JSONL dump served as octet-stream
        ("http://a.test/dump.jsonl", "application/octet-stream",
          "{\"text\":\"l0\"}\n{\"content\":\"l1\"}".getBytes("UTF-8")),
        ("http://a.test/api", "application/json",
          """{"text":"api doc"}""".getBytes("UTF-8")),
        ("http://a.test/broken", "application/json",
          "{\"text\": oops".getBytes("UTF-8")))
        .toDF("target_uri", "content_type", "payload"), dir)
    val out = graft.io.Warc.toDocumentsJson(graft.io.Warc.sniffTypes(
        graft.io.Warc.readWarc(spark, dir)))
      .select("url", "text", "extract_ok").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    assert(out == Set(
      ("http://a.test/dump.jsonl#0", "l0", true),
      ("http://a.test/dump.jsonl#1", "l1", true),
      ("http://a.test/api", "api doc", true),
      ("http://a.test/broken", null, false)))
    // and the union face carries the clean rows only
    val union = graft.io.Warc.toDocuments(graft.io.Warc.sniffTypes(
        graft.io.Warc.readWarc(spark, dir)))
      .select("url").as[String].collect().toSet
    assert(union == Set("http://a.test/dump.jsonl#0",
      "http://a.test/dump.jsonl#1", "http://a.test/api"))
  }

  test("archive members: .jsonl entry and codec-peeled .jsonl.gz entry") {
    import spark.implicits._
    val jsonl = "{\"text\":\"m0\"}\n{\"text\":\"m1\"}".getBytes("UTF-8")
    val tar = graft.operators.Tar.writeTar(Seq(
      "a.jsonl" -> jsonl,
      "b.jsonl.gz" -> graft.operators.Codec.compress(jsonl,
        graft.operators.Codec.Gzip),
      "c.json" -> """{"content":"solo"}""".getBytes("UTF-8")))
    val dir = java.nio.file.Files.createTempDirectory("graft_tar_json").toString
    graft.io.Warc.writeWarcResponses(
      Seq(("http://a.test/pack.tar", "application/x-tar", tar))
        .toDF("target_uri", "content_type", "payload"), dir)
    val out = graft.io.Warc.toDocumentsArchive(
        graft.io.Warc.readWarc(spark, dir))
      .filter($"extract_ok").select("url", "text").as[(String, String)]
      .collect().toSet
    assert(out == Set(
      ("http://a.test/pack.tar#a.jsonl#0", "m0"),
      ("http://a.test/pack.tar#a.jsonl#1", "m1"),
      ("http://a.test/pack.tar#b.jsonl#0", "m0"),
      ("http://a.test/pack.tar#b.jsonl#1", "m1"),
      ("http://a.test/pack.tar#c.json", "solo")))
  }
}
