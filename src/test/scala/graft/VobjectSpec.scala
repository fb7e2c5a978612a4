package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.operators.Vobject

/** The vobject grammar (RFC 5545/6350): unfolding across escapes,
  * quote-aware parameters, nested components, TEXT escapes, the
  * writers' round-trips, and the warc calendar bridge. */
class VobjectSpec extends SparkSpec {

  private def b(s: String) = s.getBytes(UTF_8)

  test("content lines: params, quoted colons, unfolding, nesting") {
    val ics =
      "BEGIN:VCALENDAR\r\n" +
      "BEGIN:VTIMEZONE\r\n" +
      "TZID:America/New_York\r\n" +
      "END:VTIMEZONE\r\n" +
      "BEGIN:VEVENT\r\n" +
      "DTSTART;TZID=\"US:East\":20260101T090000\r\n" +
      "SUMMARY:A long summary that will be fol\r\n ded across two lines\r\n" +
      "DESCRIPTION:semi\\; comma\\, slash\\\\ line\\nbreak\r\n" +
      "END:VEVENT\r\n" +
      "END:VCALENDAR\r\n"
    val evs = Vobject.extractIcs(b(ics))
    assert(evs.size == 1)
    assert(evs(0).summary ==
      "A long summary that will be folded across two lines")
    assert(evs(0).description == "semi; comma, slash\\ line\nbreak")
    assert(evs(0).dtstart == "20260101T090000")
    // the quoted param hid its colon
    val cal = Vobject.parse(b(ics)).head
    val ev = cal.children.find(_.kind == "VEVENT").get
    assert(ev.props.find(_.name == "DTSTART").get.params("TZID") == "US:East")
  }

  test("malformed input fails loud: mismatched END, orphan property") {
    intercept[IllegalArgumentException] {
      Vobject.parse(b("BEGIN:VCALENDAR\r\nEND:VEVENT\r\n"))
    }
    intercept[IllegalArgumentException] {
      Vobject.parse(b("SUMMARY:orphan\r\n"))
    }
    intercept[IllegalArgumentException] {
      Vobject.parse(b("BEGIN:VCALENDAR\r\nSUMMARY:x\r\n")) // unterminated
    }
    intercept[IllegalArgumentException] {
      Vobject.parse(b("BEGIN:VCALENDAR\r\nnocolonhere\r\nEND:VCALENDAR\r\n"))
    }
  }

  test("writeIcs round-trips escapes and folding; an escape may fold") {
    val events = Seq(
      ("Standup; daily", "room 4, floor 2\nbring notes"),
      ("Very " + ("long " * 30) + "title", "short"))
    val evs = Vobject.extractIcs(b(Vobject.writeIcs(events)))
    assert(evs.map(e => (e.summary, e.description)) == events.toVector)
    // a fold landing INSIDE an escape sequence still unfolds first:
    // place \, exactly at the 75-octet boundary
    val tricky = "x" * 65 + "," + "y" * 20
    val evs2 = Vobject.extractIcs(b(Vobject.writeIcs(Seq(("s", tricky)))))
    assert(evs2(0).description == tricky)
  }

  test("writeVcf round-trips multi-card files with repeated tags") {
    val cards = Seq(
      Seq("FN" -> "Ada Lovelace", "EMAIL" -> "ada@ex.test",
        "EMAIL" -> "ada@alt.test", "NOTE" -> "first; analyst, 1843"),
      Seq("FN" -> "Alan Turing", "TEL" -> "+44-555-0100"))
    val out = Vobject.extractVcf(b(Vobject.writeVcf(cards)))
    assert(out == cards.map(_.toVector).toVector)
    // non-catalog props (VERSION) are not rows
    assert(!out.flatten.exists(_._1 == "VERSION"))
  }

  test("warc e2e: text/calendar events land as summary-headed documents") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_ics").toString
    graft.io.Warc.writeWarcResponses(
      Seq(
        ("http://a.test/cal", "text/calendar",
          b(Vobject.writeIcs(Seq(("One", "first body"), ("Two", "second body"))))),
        ("http://a.test/bad", "text/calendar", b("BEGIN:VCALENDAR\r\n")))
        .toDF("target_uri", "content_type", "payload"), dir)
    val recs = graft.io.Warc.readWarc(spark, dir)
    val out = graft.io.Warc.toDocumentsIcs(recs)
      .select("url", "text", "extract_ok")
      .as[(String, String, Boolean)].collect().toList.sortBy(_._1)
    assert(out == List(
      ("http://a.test/bad#", null, false),
      ("http://a.test/cal#0", "One\nfirst body", true),
      ("http://a.test/cal#1", "Two\nsecond body", true)))
    // union face carries the calendar branch; sniff knows both shapes
    assert(graft.io.Warc.toDocuments(recs).select("url").as[String]
      .collect().toSet.contains("http://a.test/cal#0"))
    assert(graft.operators.Sniff.sniffMime(
      b(Vobject.writeIcs(Seq(("s", "d"))))).contains("text/calendar"))
    assert(graft.operators.Sniff.sniffMime(
      b(Vobject.writeVcf(Seq(Seq("FN" -> "A"))))).contains("text/vcard"))
  }
}
