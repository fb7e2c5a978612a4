package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

/** JSON / JSONL document extraction — the API-response and data-dump
  * carrier of crawl reality. Training corpora ship as `.jsonl(.gz)`
  * dumps whose convention is one JSON object per line with the
  * document under a `"text"` (or `"content"`) key — the layout of
  * every major public text dump — and crawls carry `application/json`
  * API responses. Routing them to the text lane would pour JSON syntax
  * noise into the corpus; not routing them drops a first-class
  * carrier. This codec parses strictly and extracts by contract.
  *
  * Grammar is RFC 8259 in full: objects/arrays/strings/numbers/
  * true/false/null, the complete escape set including `\uXXXX` with
  * surrogate-pair combination, and a strict number grammar. UTF-8 by
  * §8.1 (a leading BOM is tolerated per §8.1's interop note). STRICT
  * codec / tolerant bridge, the house contract: malformed JSON, a
  * non-object JSONL line, or a document with no string-valued
  * `text`/`content` field throws here (naming the document), and the
  * `toDocuments` face degrades that one record to a flagged row.
  *
  * Document shapes, decided by ONE whole-payload parse attempt:
  *  - a single top-level OBJECT is one document (index -1);
  *  - a top-level ARRAY yields one document per element (each element
  *    must be an object), indexed 0..n-1;
  *  - anything else that fails the whole-payload parse is treated as
  *    JSONL: one object per non-blank line, one document per line,
  *    indexed 0..n-1. A top-level scalar (`42`, `"x"`) parses whole
  *    and fails loudly — a corpus of one number is a routing bug.
  *
  * The text field: `"text"` wins over `"content"` when both are
  * present (first occurrence of each; the dump convention), and the
  * value must be a STRING — a nested object or number under `"text"`
  * is a schema the contract doesn't cover, loudly. */
object Json {

  sealed trait JVal
  final case class JObj(fields: Vector[(String, JVal)]) extends JVal
  final case class JArr(items: Vector[JVal]) extends JVal
  final case class JStr(s: String) extends JVal
  final case class JNum(raw: String) extends JVal
  final case class JBool(b: Boolean) extends JVal
  case object JNull extends JVal

  /** Parse exactly one JSON value spanning the whole input (trailing
    * whitespace allowed, trailing garbage is an error). */
  def parse(s: String): JVal = {
    val p = new Parser(s)
    val v = p.value()
    p.ws()
    if (!p.atEnd) p.fail("trailing garbage after the JSON value")
    v
  }

  /** The (index, text) documents of a JSON payload — see the object
    * doc for the shape contract. Throws IllegalArgumentException
    * (naming `mediaId`) on any contract violation. */
  def extractDocs(bytes: Array[Byte], mediaId: Long = -1L): Vector[(Int, String)] = {
    val s0 = new String(bytes, UTF_8)
    val s = if (s0.startsWith("\uFEFF")) s0.substring(1) else s0
    def bad(msg: String): Nothing =
      throw new IllegalArgumentException(s"media $mediaId: $msg")
    val whole =
      try Some(parse(s)) catch { case _: IllegalArgumentException => None }
    whole match {
      case Some(o: JObj) => Vector((-1, textOf(o, mediaId)))
      case Some(JArr(items)) =>
        if (items.isEmpty) bad("top-level JSON array is empty")
        items.zipWithIndex.map {
          case (o: JObj, i) => (i, textOf(o, mediaId))
          case (_, i) => bad(s"array element $i is not a JSON object")
        }
      case Some(_) =>
        bad("top-level JSON is a scalar, not an object/array/JSONL")
      case None =>
        // JSONL: one object per non-blank line
        val lines = s.split("\n", -1).iterator.map(_.stripSuffix("\r"))
          .filter(_.exists(c => c > ' ')).toVector
        if (lines.isEmpty) bad("payload is neither JSON nor JSONL")
        lines.zipWithIndex.map { case (line, i) =>
          val v = try parse(line) catch {
            case e: IllegalArgumentException =>
              bad(s"JSONL line $i does not parse: ${e.getMessage}")
          }
          v match {
            case o: JObj => (i, textOf(o, mediaId))
            case _ => bad(s"JSONL line $i is not a JSON object")
          }
        }
    }
  }

  /** Convenience for single-document callers (archive members where
    * the member file is the grain): documents joined by newline. */
  def extractText(bytes: Array[Byte], mediaId: Long = -1L): String =
    extractDocs(bytes, mediaId).map(_._2).mkString("\n")

  private def textOf(o: JObj, mediaId: Long): String = {
    def str(key: String): Option[String] =
      o.fields.collectFirst { case (`key`, v) => v }.map {
        case JStr(t) => t
        case _ => throw new IllegalArgumentException(
          s"media $mediaId: '$key' field is not a JSON string")
      }
    str("text").orElse(str("content")).getOrElse(
      throw new IllegalArgumentException(
        s"media $mediaId: object has no 'text'/'content' string field"))
  }

  /** True when the payload's leading bytes are a complete JSON object/
    * array or a first JSONL line that parses as one — the sniff
    * heuristic (JSON has no magic bytes). Conservative: a document
    * larger than 64 KiB with no complete first line stays unknown.
    * Never throws. */
  def sniffJson(b: Array[Byte]): Boolean =
    try {
      val cap = math.min(b.length, 1 << 16)
      val head0 = new String(b, 0, cap, UTF_8)
      val head1 = if (head0.startsWith("\uFEFF")) head0.substring(1) else head0
      val head = head1.dropWhile(c => c == ' ' || c == '\t' || c == '\r' ||
        c == '\n')
      if (head.isEmpty || (head.charAt(0) != '{' && head.charAt(0) != '['))
        return false
      val nl = head.indexOf('\n')
      if (nl >= 0) {
        val line = head.substring(0, nl).stripSuffix("\r")
        val lineJson =
          try parse(line) match {
            case _: JObj | _: JArr => true
            case _ => false
          } catch { case _: IllegalArgumentException => false }
        if (lineJson) return true
      }
      b.length <= cap && (parse(head) match {
        case _: JObj | _: JArr => true
        case _ => false
      })
    } catch { case _: Exception => false }

  /** JSON string-escape `s` (no surrounding quotes added by callers —
    * this RETURNS them): mandatory escapes always; `asciiOnly` also
    * escapes every non-ASCII UTF-16 unit as `\uXXXX` — the staging
    * twin that proves both serializations decode identically. */
  def quote(s: String, asciiOnly: Boolean = false): String = {
    val sb = new StringBuilder(s.length + 8)
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ =>
          if (c < 0x20 || (asciiOnly && c > 0x7e))
            sb.append(f"\\u${c.toInt}%04x")
          else sb.append(c)
      }
      i += 1
    }
    sb.append('"')
    sb.toString
  }

  private final class Parser(s: String) {
    private var i = 0
    def atEnd: Boolean = i >= s.length
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"JSON error at offset $i: $msg")
    def ws(): Unit =
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    private def expect(c: Char): Unit = {
      if (atEnd || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }

    def value(): JVal = {
      ws()
      if (atEnd) fail("unexpected end of input")
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(string())
        case 't' => lit("true", JBool(true))
        case 'f' => lit("false", JBool(false))
        case 'n' => lit("null", JNull)
        case c if c == '-' || (c >= '0' && c <= '9') => number()
        case c => fail(s"unexpected character '$c'")
      }
    }

    private def lit(word: String, v: JVal): JVal = {
      if (!s.startsWith(word, i)) fail(s"expected '$word'")
      i += word.length
      v
    }

    private def obj(): JObj = {
      expect('{'); ws()
      val fields = Vector.newBuilder[(String, JVal)]
      if (!atEnd && s.charAt(i) == '}') { i += 1; return JObj(Vector.empty) }
      var more = true
      while (more) {
        ws()
        val k = string()
        ws(); expect(':')
        fields += ((k, value()))
        ws()
        if (atEnd) fail("unterminated object")
        s.charAt(i) match {
          case ',' => i += 1
          case '}' => i += 1; more = false
          case c => fail(s"expected ',' or '}' in object, got '$c'")
        }
      }
      JObj(fields.result())
    }

    private def arr(): JArr = {
      expect('['); ws()
      val items = Vector.newBuilder[JVal]
      if (!atEnd && s.charAt(i) == ']') { i += 1; return JArr(Vector.empty) }
      var more = true
      while (more) {
        items += value()
        ws()
        if (atEnd) fail("unterminated array")
        s.charAt(i) match {
          case ',' => i += 1
          case ']' => i += 1; more = false
          case c => fail(s"expected ',' or ']' in array, got '$c'")
        }
      }
      JArr(items.result())
    }

    private def string(): String = {
      expect('"')
      val sb = new StringBuilder()
      while (true) {
        if (atEnd) fail("unterminated string")
        val c = s.charAt(i)
        if (c == '"') { i += 1; return sb.toString }
        if (c < 0x20) fail("unescaped control character in string")
        if (c == '\\') {
          i += 1
          if (atEnd) fail("dangling escape")
          s.charAt(i) match {
            case '"' => sb.append('"'); i += 1
            case '\\' => sb.append('\\'); i += 1
            case '/' => sb.append('/'); i += 1
            case 'b' => sb.append('\b'); i += 1
            case 'f' => sb.append('\f'); i += 1
            case 'n' => sb.append('\n'); i += 1
            case 'r' => sb.append('\r'); i += 1
            case 't' => sb.append('\t'); i += 1
            case 'u' =>
              i += 1
              val hi = hex4()
              // surrogate pair: a high surrogate followed by an
              // escaped low surrogate combines into one code point
              if (Character.isHighSurrogate(hi) && i + 1 < s.length &&
                s.charAt(i) == '\\' && s.charAt(i + 1) == 'u') {
                val save = i
                i += 2
                val lo = hex4()
                if (Character.isLowSurrogate(lo)) { sb.append(hi); sb.append(lo) }
                else { i = save; sb.append(hi) }
              } else sb.append(hi)
            case e => fail(s"invalid escape '\\$e'")
          }
        } else { sb.append(c); i += 1 }
      }
      throw new IllegalStateException("unreachable")
    }

    private def hex4(): Char = {
      if (i + 4 > s.length) fail("truncated \\u escape")
      var v = 0
      var j = 0
      while (j < 4) {
        val c = s.charAt(i + j)
        val d =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else fail(s"non-hex digit '$c' in \\u escape")
        v = (v << 4) | d
        j += 1
      }
      i += 4
      v.toChar
    }

    private def number(): JNum = {
      val start = i
      if (!atEnd && s.charAt(i) == '-') i += 1
      if (atEnd) fail("truncated number")
      // int part: 0, or [1-9][0-9]*
      if (s.charAt(i) == '0') i += 1
      else if (s.charAt(i) >= '1' && s.charAt(i) <= '9') {
        while (i < s.length && s.charAt(i).isDigit) i += 1
      } else fail("invalid number")
      if (i < s.length && s.charAt(i) == '.') {
        i += 1
        if (atEnd || !s.charAt(i).isDigit) fail("truncated fraction")
        while (i < s.length && s.charAt(i).isDigit) i += 1
      }
      if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        i += 1
        if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        if (atEnd || !s.charAt(i).isDigit) fail("truncated exponent")
        while (i < s.length && s.charAt(i).isDigit) i += 1
      }
      JNum(s.substring(start, i))
    }
  }
}
