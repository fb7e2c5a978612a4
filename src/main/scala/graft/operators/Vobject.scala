package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

/** iCalendar / vCard ingestion — the PIM-export carriers. Calendar
  * dumps (`.ics`, RFC 5545) and contact exports (`.vcf`, RFC 6350)
  * share ONE content-line grammar: `NAME;PARAM=V:VALUE` lines, CRLF +
  * leading-whitespace folding, backslash TEXT escapes, and nested
  * `BEGIN:`/`END:` component blocks — so the engine parses the vobject
  * grammar once ([[parse]]) and both carriers are thin views: every
  * VEVENT is a document (summary heads the text, the
  * [[graft.io.Warc.toDocumentsFeed]] contract), every VCARD is a
  * (tag, value) catalog row block (the [[Exif]] provenance shape).
  *
  * Single bounded pass: unfold once (folds may split ANY two octets,
  * escape sequences included, so unfolding precedes all parsing), then
  * a line walk with a component stack. Parameter scanning is
  * quote-aware (`TZID="A:B"` hides its colon). Unknown components and
  * properties pass through untouched — extraction selects, the parser
  * never filters. Malformed input throws; the warc bridges own the
  * per-record degrade.
  *
  * Reference behavior: no PIM carriers in treynr/eggv (text-only
  * pipeline, eggv/retrieve.py) — engine surface beyond the reference,
  * same strict-codec / tolerant-bridge contract as the mail carrier
  * ([[Eml]]). */
object Vobject {

  /** One content line: name, params (last wins per key, upper-cased
    * names), raw value (TEXT unescaping is the caller's view). */
  case class Prop(name: String, params: Map[String, String], value: String)

  /** One `BEGIN:`/`END:` block with its direct properties and nested
    * components, document order. */
  case class Component(kind: String, props: Vector[Prop],
      children: Vector[Component])

  /** Parse a vobject stream to its top-level components. */
  def parse(bytes: Array[Byte], mediaId: Long = -1L): Vector[Component] = {
    val unfolded = new String(bytes, UTF_8).replace("\r\n", "\n")
      .replaceAll("\n[ \t]", "")
    val lines = unfolded.split("\n").iterator.map(_.stripSuffix("\r"))
      .filter(_.nonEmpty).toVector
    val top = Vector.newBuilder[Component]
    // (kind, props, children) frames, innermost last
    var stack = List.empty[(String, Vector[Prop], Vector[Component])]
    lines.foreach { line =>
      val prop = parseLine(line, mediaId)
      prop.name match {
        case "BEGIN" =>
          stack = (prop.value.trim.toUpperCase(java.util.Locale.ROOT),
            Vector.empty, Vector.empty) :: stack
        case "END" =>
          val kind = prop.value.trim.toUpperCase(java.util.Locale.ROOT)
          stack match {
            case (k, ps, cs) :: rest =>
              if (k != kind) throw new IllegalArgumentException(
                s"vobject[$mediaId]: END:$kind closes BEGIN:$k")
              val done = Component(k, ps, cs)
              rest match {
                case (pk, pps, pcs) :: tail =>
                  stack = (pk, pps, pcs :+ done) :: tail
                case Nil =>
                  top += done
                  stack = Nil
              }
            case Nil => throw new IllegalArgumentException(
              s"vobject[$mediaId]: END:$kind without BEGIN")
          }
        case _ =>
          stack match {
            case (k, ps, cs) :: rest => stack = (k, ps :+ prop, cs) :: rest
            case Nil => throw new IllegalArgumentException(
              s"vobject[$mediaId]: property outside any component: $line")
          }
      }
    }
    if (stack.nonEmpty) throw new IllegalArgumentException(
      s"vobject[$mediaId]: unterminated BEGIN:${stack.head._1}")
    top.result()
  }

  /** `NAME;P=V;P="quo:ted":VALUE` — the name/param scan is quote-aware
    * so a parameter value may hide `:` and `;`. */
  private def parseLine(line: String, mediaId: Long): Prop = {
    var i = 0
    var inQuote = false
    var colon = -1
    val seps = Vector.newBuilder[Int]
    while (i < line.length && colon < 0) {
      val c = line.charAt(i)
      if (c == '"') inQuote = !inQuote
      else if (!inQuote && c == ';') seps += i
      else if (!inQuote && c == ':') colon = i
      i += 1
    }
    if (colon < 0) throw new IllegalArgumentException(
      s"vobject[$mediaId]: content line without ':': $line")
    val headParts = {
      val cuts = seps.result() :+ colon
      var prev = 0
      cuts.map { c => val part = line.substring(prev, c); prev = c + 1; part }
    }
    val name = headParts.head.trim.toUpperCase(java.util.Locale.ROOT)
    val params = headParts.tail.iterator.flatMap { p =>
      val eq = p.indexOf('=')
      if (eq <= 0) None
      else {
        val v = p.substring(eq + 1).trim
        val unq = if (v.length >= 2 && v.head == '"' && v.last == '"')
          v.substring(1, v.length - 1) else v
        Some(p.substring(0, eq).trim.toUpperCase(java.util.Locale.ROOT) -> unq)
      }
    }.toMap
    Prop(name, params, line.substring(colon + 1))
  }

  /** RFC 5545 §3.3.11 TEXT unescape: `\\n`/`\\N` → newline, `\\,`,
    * `\\;`, `\\\\` → literal. */
  def unescapeText(v: String): String = {
    if (v.indexOf('\\') < 0) return v
    val sb = new StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '\\' && i + 1 < v.length) {
        v.charAt(i + 1) match {
          case 'n' | 'N' => sb.append('\n')
          case other     => sb.append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.result()
  }

  private def escapeText(v: String): String =
    v.replace("\\", "\\\\").replace(";", "\\;").replace(",", "\\,")
      .replace("\r\n", "\n").replace("\n", "\\n")

  /** One calendar event, TEXT fields unescaped; absent fields empty. */
  case class IcsEvent(summary: String, description: String,
      location: String, dtstart: String)

  /** Every VEVENT of every VCALENDAR, document order (nested search —
    * real exports wrap events under VCALENDAR, some under VTIMEZONE
    * siblings). */
  def extractIcs(bytes: Array[Byte], mediaId: Long = -1L): Vector[IcsEvent] = {
    def events(c: Component): Vector[Component] =
      (if (c.kind == "VEVENT") Vector(c) else Vector.empty) ++
        c.children.flatMap(events)
    parse(bytes, mediaId).flatMap(events).map { ev =>
      def f(n: String) = ev.props.find(_.name == n).map(p =>
        unescapeText(p.value)).getOrElse("")
      IcsEvent(f("SUMMARY"), f("DESCRIPTION"), f("LOCATION"),
        ev.props.find(_.name == "DTSTART").map(_.value.trim).getOrElse(""))
    }
  }

  /** Catalog properties of a vCard surfaced as (tag, value) rows. */
  private val VcardTags = Set("FN", "N", "ORG", "TITLE", "EMAIL", "TEL",
    "NOTE", "URL", "ADR", "BDAY", "NICKNAME", "ROLE", "CATEGORIES")

  /** Every VCARD as its (tag, value) rows, document order, repeated
    * properties kept (a card with three EMAILs yields three rows). */
  def extractVcf(bytes: Array[Byte], mediaId: Long = -1L): Vector[Vector[(String, String)]] =
    parse(bytes, mediaId).filter(_.kind == "VCARD").map(_.props
      .filter(p => VcardTags.contains(p.name))
      .map(p => p.name -> unescapeText(p.value)))

  /** RFC 5545 §3.1 folding: lines longer than 75 octets continue on
    * the next line after one space. Char-based here (the writer's
    * staging corpus is UTF-8-safe: a fold between any two chars is a
    * fold between octets). */
  private def fold(line: String): String =
    if (line.length <= 75) line
    else line.grouped(74).mkString("\n ")

  /** Round-trip twin: one VCALENDAR holding one VEVENT per (summary,
    * description), escaped and folded. */
  def writeIcs(events: Seq[(String, String)]): String = {
    val sb = new StringBuilder
    sb.append("BEGIN:VCALENDAR\nVERSION:2.0\nPRODID:-//graft//EN\n")
    events.zipWithIndex.foreach { case ((sum, desc), i) =>
      sb.append("BEGIN:VEVENT\n")
      sb.append(fold(s"UID:ev-$i@graft.test")).append('\n')
      sb.append(s"DTSTART:202601${"%02d".format(i % 28 + 1)}T090000Z\n")
      sb.append(fold("SUMMARY:" + escapeText(sum))).append('\n')
      sb.append(fold("DESCRIPTION:" + escapeText(desc))).append('\n')
      sb.append("END:VEVENT\n")
    }
    sb.append("END:VCALENDAR\n")
    sb.result().replace("\n", "\r\n")
  }

  /** Round-trip twin: one 3.0 vCard per (tag, value) block. */
  def writeVcf(cards: Seq[Seq[(String, String)]]): String = {
    val sb = new StringBuilder
    cards.foreach { props =>
      sb.append("BEGIN:VCARD\nVERSION:3.0\n")
      props.foreach { case (k, v) =>
        sb.append(fold(k + ":" + escapeText(v))).append('\n') }
      sb.append("END:VCARD\n")
    }
    sb.result().replace("\n", "\r\n")
  }
}
