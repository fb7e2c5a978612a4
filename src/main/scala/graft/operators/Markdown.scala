package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

/** Markdown text extraction — the README/docs/static-site carrier.
  * Web-scale corpora are full of `.md`: repository documentation,
  * Jekyll/Hugo sources (YAML front matter + CommonMark body), wiki
  * exports. The curation strip wants the PROSE — headings, emphasis,
  * links and list markers are markup, front matter is metadata — so
  * [[extractText]] is a line-based CommonMark-shaped strip and
  * [[frontMatter]] surfaces the YAML header as (key, value) rows the
  * way [[Exif.jpegExif]] surfaces provenance.
  *
  * The strip is a single bounded pass, block state machine over lines
  * (fence tracking, setext lookahead) + one inline pass per line —
  * O(n), no backtracking, executor-safe on hostile input. Contract:
  * the PROSE content of every block in order, one line per source
  * line, blank lines dropped (curation normalizes vertical whitespace
  * anyway); code-fence interiors verbatim (code is text, the fences
  * are markup). Inline handling is deliberately conservative: paired
  * delimiters with non-space interiors (`**b**`, `*i*`, `_i_`,
  * `~~s~~`, backtick spans), image/link/reference/autolink forms, and
  * backslash escapes — `2 * 3` and `snake_case` are NOT emphasis, per
  * CommonMark's left/right-flanking intent.
  *
  * Reference behavior: treynr/eggv ingests plain text only
  * (eggv/retrieve.py:72 — gzipped TSV dumps); the markdown carrier is
  * engine surface beyond the reference, same contract as the
  * HTML/RTF/LaTeX strips. */
object Markdown {

  /** (key, value) pairs of the leading YAML front-matter block
    * (`---` ... `---`/`...`), simple scalars only — nested YAML
    * collections are out of scope (values kept raw). Empty when the
    * document has no front matter. */
  def frontMatter(bytes: Array[Byte], mediaId: Long = -1L): Vector[(String, String)] = {
    val lines = new String(bytes, UTF_8).replace("\r\n", "\n").split("\n", -1)
    if (lines.length < 2 || lines(0).trim != "---") return Vector.empty
    val end = lines.indexWhere(l => l.trim == "---" || l.trim == "...", 1)
    if (end < 0) return Vector.empty
    lines.slice(1, end).iterator.flatMap { l =>
      val c = l.indexOf(':')
      if (c <= 0 || l.startsWith(" ") || l.startsWith("\t")) None
      else {
        val v = l.substring(c + 1).trim
        val unq = if (v.length >= 2 && ((v.head == '"' && v.last == '"') ||
          (v.head == '\'' && v.last == '\''))) v.substring(1, v.length - 1) else v
        Some(l.substring(0, c).trim -> unq)
      }
    }.toVector
  }

  /** The prose of a markdown document: front matter dropped, block
    * markup (headings, quotes, lists, rules, reference definitions,
    * fences) peeled, inline markup (emphasis, links, code spans,
    * escapes) resolved. Non-empty lines joined with `\n`. */
  def extractText(bytes: Array[Byte], mediaId: Long = -1L): String = {
    var lines = new String(bytes, UTF_8).replace("\r\n", "\n")
      .split("\n", -1).toVector
    // front matter off the top
    if (lines.nonEmpty && lines.head.trim == "---") {
      val end = lines.indexWhere(l => l.trim == "---" || l.trim == "...", 1)
      if (end > 0) lines = lines.drop(end + 1)
    }
    val out = Vector.newBuilder[String]
    var inFence = false
    var fenceMark = ""
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      val t = line.trim
      if (inFence) {
        if (t.startsWith(fenceMark)) { inFence = false; fenceMark = "" }
        else if (line.nonEmpty) out += line
      } else if (t.startsWith("```") || t.startsWith("~~~")) {
        inFence = true
        fenceMark = t.substring(0, 3)
      } else if (t.isEmpty) {
        () // blank: block separator, dropped by contract
      } else if (i + 1 < lines.length && isSetextUnderline(lines(i + 1)) &&
        !isBlockMarked(line)) {
        out += inline(stripBlock(line)) // setext heading text
        i += 1                          // skip the underline
      } else if (isThematicBreak(t) || isRefDefinition(t)) {
        () // rules and [label]: url definitions are pure markup
      } else {
        val s = inline(stripBlock(line))
        if (s.nonEmpty) out += s
      }
      i += 1
    }
    out.result().mkString("\n")
  }

  /** Peel block prefixes: blockquote `>`s (nested), ONE list marker,
    * ATX heading hashes (leading + closing). */
  private def stripBlock(line0: String): String = {
    var line = line0.replaceAll("^\\s+", "")
    while (line.startsWith(">"))
      line = line.substring(1).replaceAll("^ ", "").replaceAll("^\\s+", "")
    line = line.replaceFirst("^([-*+]|\\d{1,9}[.)])\\s+", "")
    if (line.startsWith("#"))
      line = line.replaceFirst("^#{1,6}\\s+", "").replaceFirst("\\s+#+\\s*$", "")
    line.trim
  }

  private def isSetextUnderline(l: String): Boolean = {
    val t = l.trim
    t.nonEmpty && (t.forall(_ == '=') || t.forall(_ == '-'))
  }

  /** A line that is itself block-marked (list/quote/heading/fence)
    * cannot be a setext heading paragraph. */
  private def isBlockMarked(l: String): Boolean = {
    val t = l.trim
    t.isEmpty || t.startsWith("#") || t.startsWith(">") ||
      t.matches("([-*+]|\\d{1,9}[.)])\\s.*") || t.startsWith("```") ||
      t.startsWith("~~~")
  }

  private def isThematicBreak(t: String): Boolean =
    t.matches("([-_*])( *\\1){2,} *")

  private def isRefDefinition(t: String): Boolean =
    t.matches("\\[[^\\]]+\\]:\\s*\\S.*")

  /** One inline pass: images → alt, links/references → text,
    * autolinks → target, code spans → content, paired emphasis
    * delimiters removed, backslash escapes resolved. */
  private[graft] def inline(s0: String): String = {
    // backslash escapes FIRST, shadowed to private-use codepoints so
    // the marker passes can't see them (\* is a literal star, not an
    // emphasis delimiter), restored verbatim at the end
    var s = shadowEscapes(s0)
    s = s.replaceAll("!\\[([^\\]]*)\\]\\(([^)]*)\\)", "$1")
    s = s.replaceAll("\\[([^\\]]*)\\]\\(([^)]*)\\)", "$1")
    s = s.replaceAll("\\[([^\\]]*)\\]\\[[^\\]]*\\]", "$1")
    s = s.replaceAll("<((?:https?|ftp|mailto):[^>\\s]+)>", "$1")
    s = s.replaceAll("``((?:(?!``).)+)``", "$1")
    s = s.replaceAll("`([^`]+)`", "$1")
    s = s.replaceAll("\\*\\*\\*(\\S(?:[^*]*\\S)?)\\*\\*\\*", "$1")
    s = s.replaceAll("\\*\\*(\\S(?:[^*]*\\S)?)\\*\\*", "$1")
    s = s.replaceAll("\\*(\\S(?:[^*]*\\S)?)\\*", "$1")
    s = s.replaceAll("(?<![\\w])__(\\S(?:[^_]*\\S)?)__(?![\\w])", "$1")
    s = s.replaceAll("(?<![\\w])_(\\S(?:[^_]*\\S)?)_(?![\\w])", "$1")
    s = s.replaceAll("~~(\\S(?:[^~]*\\S)?)~~", "$1")
    unshadowEscapes(s).trim
  }

  private val Escapable = "\\`*_{}[]()#+.!>~|-".toSet

  private def shadowEscapes(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length &&
        Escapable.contains(s.charAt(i + 1))) {
        sb.append((0xE000 + s.charAt(i + 1)).toChar)
        i += 2
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.result()
  }

  private def unshadowEscapes(s: String): String =
    s.map(c => if (c >= 0xE000 && c < 0xE100) (c - 0xE000).toChar else c)

  /** Round-trip twin: render sentences through the construct cycle
    * (heading, bold, bullet, quote, link, fence, italic, ordered) under
    * an optional YAML front-matter header — [[extractText]] recovers
    * exactly the sentences joined with `\n`. */
  def writeMarkdown(sentences: Seq[String],
      meta: Seq[(String, String)] = Nil): String = {
    val sb = new StringBuilder
    if (meta.nonEmpty) {
      sb.append("---\n")
      meta.foreach { case (k, v) => sb.append(k).append(": ").append(v).append('\n') }
      sb.append("---\n\n")
    }
    sentences.zipWithIndex.foreach { case (s, i) =>
      val block = (i % 8) match {
        case 0 => "# " + s
        case 1 => "**" + s + "**"
        case 2 => "- " + s
        case 3 => "> " + s
        case 4 => "[" + s + "](https://ex.test/" + i + ")"
        case 5 => "```\n" + s + "\n```"
        case 6 => "*" + s + "*"
        case _ => "1. " + s
      }
      sb.append(block).append("\n\n")
    }
    sb.result()
  }
}
