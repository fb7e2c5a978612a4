package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM LaTeX text extraction — the scientific-corpus carrier
  * (arXiv sources, `application/x-tex` / `text/x-tex` responses).
  *
  * A single bounded scan with TeX's whitespace tokenization (the
  * [[Rtf]] philosophy — no macro engine): runs of whitespace collapse
  * to one space, a run holding a blank line becomes a paragraph
  * break; `%` comments eat through end-of-line; everything before
  * `\begin{document}` (when present) is preamble and drops,
  * `\end{document}` stops the scan. Structure commands surface their
  * argument — the sectioning family emits its title on its own line,
  * the emphasis family unwraps inline, `\item` becomes a `- ` bullet;
  * reference/metadata commands (`\label`, `\cite`, `\ref`,
  * `\includegraphics`, …) consume and drop their arguments; math
  * (`$…$`, `$$…$$`, `\[…\]`, and the equation environments) drops
  * wholesale; `figure`/`table` floats drop wholesale (captions
  * included — an honest bound, not a parse); `verbatim` passes raw.
  * Escaped specials (`\%`, `\&`, `\_`, …) and the named ASCII
  * commands (`\textbackslash`) emit their literal; any other control
  * word is formatting and drops with TeX's one-following-space rule.
  * Brace groups are framing only.
  *
  * Fail-loudly contract: an unterminated math segment, environment,
  * or brace-delimited argument throws `IllegalArgumentException`
  * naming the media id; the warc bridge degrades to flagged rows
  * ([[graft.io.Warc.toDocumentsTex]]). */
object Tex {

  /** Sectioning commands: argument text surfaces on its own line. */
  private val SectionCommands = Set(
    "part", "chapter", "section", "subsection", "subsubsection",
    "paragraph", "title", "caption")

  /** Wrapper commands: argument text unwraps inline. */
  private val UnwrapCommands = Set(
    "emph", "textbf", "textit", "texttt", "textsc", "textrm", "textsf",
    "underline", "mbox", "footnote", "url")

  /** Commands whose bracket/brace arguments are metadata, not text. */
  private val DropArgCommands = Set(
    "label", "ref", "eqref", "pageref", "cite", "citep", "citet",
    "includegraphics", "input", "include", "usepackage",
    "documentclass", "bibliography", "bibliographystyle", "author",
    "date", "vspace", "hspace", "pagestyle", "thispagestyle")

  /** Environments that drop wholesale, inner text included. */
  private val SkipEnvironments = Set(
    "equation", "equation*", "align", "align*", "eqnarray", "eqnarray*",
    "displaymath", "math", "figure", "figure*", "table", "table*",
    "tikzpicture", "thebibliography")

  /** Named single-character commands. */
  private val CharCommands = Map(
    "textbackslash" -> "\\", "textasciitilde" -> "~",
    "textasciicircum" -> "^", "ldots" -> "…", "dots" -> "…")

  def extractText(bytes: Array[Byte], mediaId: Long = -1L): String = {
    val s0 = new String(bytes, UTF_8).replace("\r\n", "\n")
    // preamble: drop everything before \begin{document} when present
    val docAt = s0.indexOf("\\begin{document}")
    val s = if (docAt < 0) s0 else s0.substring(docAt + "\\begin{document}".length)
    val sb = new StringBuilder

    // canonical emission: spaces never open a line or double up,
    // paragraph breaks never stack — the htmlToText tidy discipline
    def emitText(t: String): Unit = t.foreach {
      case ' ' =>
        if (sb.nonEmpty && sb.last != ' ' && sb.last != '\n') sb.append(' ')
      case '\n' =>
        while (sb.nonEmpty && sb.last == ' ') sb.setLength(sb.length - 1)
        if (sb.nonEmpty && sb.last != '\n') sb.append('\n')
      case c => sb.append(c)
    }

    var i = 0
    var stopped = false

    def skipWhitespace(): Unit = {
      var newlines = 0
      val start = i
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
          s.charAt(i) == '\n')) {
        if (s.charAt(i) == '\n') newlines += 1
        i += 1
      }
      if (i > start) emitText(if (newlines >= 2) "\n" else " ")
    }

    /** A `{...}` group's raw source (balanced), cursor past it. */
    def braceGroup(): String = {
      require(i < s.length && s.charAt(i) == '{',
        s"media $mediaId: expected a brace-delimited argument")
      var depth = 0
      val start = i + 1
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) i += 2
        else {
          if (c == '{') depth += 1
          else if (c == '}') { depth -= 1; if (depth == 0) {
            val inner = s.substring(start, i); i += 1; return inner } }
          i += 1
        }
      }
      throw new IllegalArgumentException(
        s"media $mediaId: unterminated brace group")
    }

    def skipOptArg(): Unit =
      if (i < s.length && s.charAt(i) == '[') {
        val close = s.indexOf(']', i)
        require(close >= 0, s"media $mediaId: unterminated [optional] argument")
        i = close + 1
      }

    def skipMath(close: String): Unit = {
      val end = s.indexOf(close, i)
      require(end >= 0, s"media $mediaId: unterminated math segment")
      i = end + close.length
    }

    while (i < s.length && !stopped) {
      val c = s.charAt(i)
      if (c == '%') { // comment: through end-of-line
        val nl = s.indexOf('\n', i)
        i = if (nl < 0) s.length else nl + 1
      } else if (c == ' ' || c == '\t' || c == '\n') skipWhitespace()
      else if (c == '$') {
        if (i + 1 < s.length && s.charAt(i + 1) == '$') { i += 2; skipMath("$$") }
        else { i += 1; skipMath("$") }
      } else if (c == '{' || c == '}') i += 1 // group framing only
      else if (c == '~') { emitText(" "); i += 1 }
      else if (c == '\\') {
        require(i + 1 < s.length, s"media $mediaId: source ends in a backslash")
        val n = s.charAt(i + 1)
        if (n == '[') { i += 2; skipMath("\\]") }
        else if (n == '\\') { emitText("\n"); i += 2 }
        else if ("%&$#_{}".indexOf(n) >= 0) { sb.append(n); i += 2 }
        else if (n == ',' || n == ';' || n == ' ') { emitText(" "); i += 2 }
        else if (Character.isLetter(n)) {
          var j = i + 1
          while (j < s.length && Character.isLetter(s.charAt(j))) j += 1
          var word = s.substring(i + 1, j)
          if (j < s.length && s.charAt(j) == '*') { word += "*"; j += 1 }
          i = j
          if (i < s.length && s.charAt(i) == ' ') i += 1 // TeX eats one space
          word match {
            case "begin" =>
              val env = braceGroup()
              if (env == "verbatim") {
                val end = s.indexOf("\\end{verbatim}", i)
                require(end >= 0, s"media $mediaId: unterminated verbatim")
                sb.append(s.substring(i, end)) // raw, no tokenization
                i = end + "\\end{verbatim}".length
              } else if (SkipEnvironments.contains(env)) {
                val end = s.indexOf(s"\\end{$env}", i)
                require(end >= 0, s"media $mediaId: unterminated $env environment")
                i = end + s"\\end{$env}".length
              } // any other environment: framing only
            case "end" =>
              val env = braceGroup()
              if (env == "document") stopped = true
            case "item" => skipOptArg(); emitText("\n- ")
            case "par" => emitText("\n")
            case w if SectionCommands.contains(w.stripSuffix("*")) =>
              skipOptArg()
              emitText("\n")
              emitText(extractText(braceGroup().getBytes(UTF_8), mediaId))
              emitText("\n")
            case w if UnwrapCommands.contains(w) =>
              emitText(extractText(braceGroup().getBytes(UTF_8), mediaId))
            case w if DropArgCommands.contains(w) =>
              skipOptArg()
              if (i < s.length && s.charAt(i) == '{') braceGroup()
              skipOptArg()
            case w if CharCommands.contains(w) =>
              emitText(CharCommands(w))
              if (i < s.length && s.charAt(i) == '{' &&
                  i + 1 < s.length && s.charAt(i + 1) == '}') i += 2 // \cmd{}
            case _ => () // formatting command: the one-space rule applied
          }
        } else i += 2 // other symbol escape: not text
      } else { sb.append(c); i += 1 }
    }
    // shed the canonical edges
    var out = sb.result()
    out = out.dropWhile(ch => ch == ' ' || ch == '\n')
    while (out.nonEmpty && (out.last == ' ' || out.last == '\n'))
      out = out.substring(0, out.length - 1)
    out
  }

  // -- generator (staging/spec counterpart) ---------------------------------

  private def texEscape(t: String): String =
    t.flatMap {
      case '\\' => "\\textbackslash{}"
      case '%' => "\\%"
      case '&' => "\\&"
      case '$' => "\\$"
      case '#' => "\\#"
      case '_' => "\\_"
      case '{' => "\\{"
      case '}' => "\\}"
      case '~' => "\\textasciitilde{}"
      case '^' => "\\textasciicircum{}"
      case c => c.toString
    }

  /** Serialize `text` as a minimal VALID LaTeX source: a preamble and
    * a comment (dropped), a `\section` head, each line its own
    * paragraph with cycling zero-text riders (a display equation, an
    * `\emph` wrap, a `\cite`+`\label` pair) planted so the skip and
    * unwrap paths are always on the oracle path. */
  def writeTex(title: String, text: String, seed: Int = 0): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("\\documentclass[11pt]{article}\n")
      .append("\\usepackage[utf8]{inputenc}\n")
      .append("% preamble comment: never reaches the text\n")
      .append("\\begin{document}\n")
      .append("\\maketitle\n")
      .append(s"\\section{${texEscape(title)}}\\label{sec:planted}\n")
      .append("\\begin{equation}\nE = m c^2\n\\end{equation}\n")
    for ((line, k) <- text.split("\n", -1).zipWithIndex) {
      val par = texEscape(line)
      (seed + k) % 3 match {
        case 0 => sb.append("$\\alpha + \\beta$ ").append(par)
        case 1 => sb.append("\\emph{").append(par).append("}")
        case _ => sb.append("\\cite{planted} ").append(par)
          .append(" % trailing comment\n\\label{p:").append(k).append("}")
      }
      sb.append("\n\n")
    }
    sb.append("\\end{document}\nstray tail: never reaches the text\n")
    sb.result().getBytes(UTF_8)
  }
}
