package graft.expressions

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — the frontier-identity pass of crawl
  * curation. The same resource hides behind `HTTP://Ex.COM:80/a/../b`,
  * `http://ex.com/b`, and `http://ex.com/%62`; URL-keyed dedup,
  * revisit joins, and politeness grouping all fracture unless URLs are
  * reduced to one spelling first. The kernel applies RFC 3986 §6.2.2
  * syntax-based normalization — scheme/host lowercased (IPv6 literals
  * per RFC 5952 case), percent-encoding normalized (unreserved octets
  * decoded, everything else uppercased — §6.2.2.2 BEFORE dot-segment
  * removal, so `%2E%2E` participates in §5.2.4), dot-segments removed
  * by the RFC algorithm (empty segments preserved: `//a//b` is not
  * `/a/b`), and §6.2.3 scheme-based normalization — default ports
  * dropped (http:80, https:443), the empty path of an authority URL
  * spelled `/`. The FRAGMENT is dropped: it never reaches the server,
  * and frontier identity is fetch identity (the convention every
  * crawler's canonicalizer shares). A string that is not an absolute
  * hierarchical URL (`scheme://…`) passes through unchanged —
  * tolerant by the same contract as every curation kernel here.
  *
  * Codegen'd `Expression` (no UDF) with an all-clean byte fast path
  * (no `%`, no `#`, no dot-segments, no uppercase/port in the
  * authority): the overwhelmingly common already-canonical URL at
  * 100 TB returns its own UTF8String untouched. */
object UrlKernels {

  def canonicalizeUrlKernel(u: UTF8String): UTF8String = {
    if (fastClean(u)) return u
    val s = u.toString
    val out = canonicalize(s)
    if (out == null || out == s) u else UTF8String.fromString(out)
  }

  /** One pass over the bytes: true only when no construct the
    * canonicalizer rewrites can be present. Conservative — a false
    * here just takes the full path. */
  private def fastClean(u: UTF8String): Boolean = {
    val b = u.getBytes
    val n = b.length
    var slashes = 0 // consecutive-'/' run length (tracks "://" and path start)
    var inAuthority = false
    var authorityDone = false
    var i = 0
    while (i < n) {
      val c = b(i)
      if (c == '%' || c == '#') return false
      // '?' before any path slash: the URL has an empty path and gains
      // the trailing '/' (http://ex.com?x → http://ex.com/?x). Without
      // this, a '/' INSIDE the query would satisfy the empty-path
      // guard below and the two spellings would fracture identity.
      if (c == '?' && !authorityDone) return false
      if (c == '/') {
        slashes += 1
        if (inAuthority && !authorityDone) authorityDone = true
        // "/." anywhere (covers /./ /../ and trailing /.) — rewritable
        if (i + 1 < n && b(i + 1) == '.') return false
      } else {
        if (slashes == 2 && !inAuthority && !authorityDone) inAuthority = true
        slashes = 0
      }
      if (!authorityDone) {
        // scheme or authority: uppercase, explicit ports, and
        // non-ASCII (IDN hosts — negative bytes in UTF-8) rewrite
        if (c >= 'A' && c <= 'Z') return false
        if (c < 0) return false
        if (c == ':' && inAuthority) return false
      }
      i += 1
    }
    // an authority with no path at all gains the trailing '/'
    !(inAuthority && !authorityDone)
  }

  private def canonicalize(s: String): String = {
    val ss = s.indexOf("://")
    if (ss <= 0) return null
    val scheme = s.substring(0, ss)
    if (!scheme.charAt(0).isLetter ||
      !scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.'))
      return null
    val schemeLc = scheme.toLowerCase(Locale.ROOT)
    val as = ss + 3
    var ae = as
    while (ae < s.length && s.charAt(ae) != '/' && s.charAt(ae) != '?' &&
      s.charAt(ae) != '#') ae += 1
    val auth = s.substring(as, ae)
    val at = auth.lastIndexOf('@')
    val userinfo = if (at >= 0) auth.substring(0, at + 1) else ""
    val hostport = if (at >= 0) auth.substring(at + 1) else auth
    var host: String = null
    var port = ""
    if (hostport.startsWith("[")) {
      val cb = hostport.indexOf(']')
      if (cb < 0) return null
      host = hostport.substring(0, cb + 1)
      val rest = hostport.substring(cb + 1)
      if (rest.startsWith(":")) port = rest.substring(1)
      else if (rest.nonEmpty) return null
    } else {
      val c = hostport.indexOf(':')
      if (c >= 0) { host = hostport.substring(0, c); port = hostport.substring(c + 1) }
      else host = hostport
    }
    if (host.isEmpty) return null
    val hostLc =
      if (host.exists(_ >= 0x80)) idnaHost(host)
      else host.toLowerCase(Locale.ROOT)
    val defPort = schemeLc match {
      case "http" => "80"
      case "https" => "443"
      case _ => null
    }
    val keepPort = port.nonEmpty && port != defPort
    var qs = s.indexOf('?', ae)
    val fs = s.indexOf('#', ae)
    if (fs >= 0 && qs > fs) qs = -1
    val pathEnd = if (qs >= 0) qs else if (fs >= 0) fs else s.length
    val rawPath = s.substring(ae, pathEnd)
    val query =
      if (qs >= 0) s.substring(qs + 1, if (fs >= 0) fs else s.length)
      else null
    val path = removeDotSegments(
      pctNormalize(if (rawPath.isEmpty) "/" else rawPath))
    val sb = new StringBuilder(s.length)
    sb.append(schemeLc).append("://").append(userinfo).append(hostLc)
    if (keepPort) sb.append(':').append(port)
    sb.append(if (path.isEmpty) "/" else path)
    if (query != null) sb.append('?').append(pctNormalize(query))
    sb.result()
  }

  /** SURT form (Sort-friendly URI Reordering Transform) — the key
    * every web-archive index sorts by, so one host's pages (and one
    * registrable domain's hosts) are CONTIGUOUS under a plain string
    * sort: canonicalize first (the §6.2.2 kernel above), then drop
    * the scheme and userinfo, reverse the host labels comma-joined,
    * keep a non-default port after the labels, close with `)` and the
    * path+query LOWERCASED (the web-archive convention — index keys
    * trade path case for match recall; the original-case URL rides in
    * the CDX payload). A single leading `www.` label is dropped (the
    * alias every archive canonicalizer folds). IPv6 literal hosts
    * keep their bracket form un-reversed (no labels to reorder).
    * Non-hierarchical inputs (no derivable fetch identity) → null. */
  def surtUrlKernel(u: UTF8String): UTF8String = {
    val canon = canonicalizeUrlKernel(u).toString
    val ss = canon.indexOf("://")
    if (ss <= 0) return null
    val as = ss + 3
    var ae = as
    while (ae < canon.length && canon.charAt(ae) != '/' &&
      canon.charAt(ae) != '?') ae += 1
    var auth = canon.substring(as, ae)
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1)
    var host = auth
    var port = ""
    if (host.startsWith("[")) {
      val cb = host.indexOf(']')
      if (cb < 0) return null
      if (cb + 1 < host.length && host.charAt(cb + 1) == ':')
        port = host.substring(cb + 2)
      host = host.substring(0, cb + 1)
    } else {
      val c = host.indexOf(':')
      if (c >= 0) { port = host.substring(c + 1); host = host.substring(0, c) }
    }
    if (host.isEmpty) return null
    // strip the www alias only when a multi-label host remains —
    // "www.com" IS a registrable host, not an alias of "com"
    if (host.startsWith("www.") && host.indexOf('.', 4) >= 0)
      host = host.substring(4)
    val key =
      if (host.startsWith("[")) host // v6 literal: nothing to reorder
      else host.split("\\.", -1).reverse.mkString(",")
    val rest = canon.substring(ae).toLowerCase(Locale.ROOT)
    UTF8String.fromString(
      key + (if (port.nonEmpty) ":" + port else "") + ")" +
        (if (rest.isEmpty) "/" else rest))
  }

  /** Internationalized hostname → ASCII form: NFC-normalize (JDK
    * `java.text.Normalizer` — public API), lowercase, and
    * punycode-encode each non-ASCII label under the `xn--` ACE prefix.
    * Punycode is RFC 3492's bootstring — formula-complete, zero
    * normative tables — so the transform is exact; what this
    * deliberately does NOT implement is UTS-46's mapping/validation
    * TABLES (deviation-character mapping, disallowed-codepoint
    * classes), which are normative Unicode data a clean-room build
    * cannot embed — a host needing them encodes by the simplified
    * NFC+lowercase rule and is documented as such. A label that fails
    * to encode (overflow) returns the input unchanged. */
  private[expressions] def idnaHost(host: String): String = {
    if (host.forall(_ < 0x80)) return host
    val norm = java.text.Normalizer
      .normalize(host, java.text.Normalizer.Form.NFC)
      .toLowerCase(Locale.ROOT)
    try norm.split("\\.", -1).map { label =>
      if (label.forall(_ < 0x80)) label else "xn--" + punycode(label)
    }.mkString(".")
    catch { case _: Exception => host }
  }

  /** RFC 3492 §6.3 encode, verbatim (base 36, tmin 1, tmax 26,
    * skew 38, damp 700, initial bias 72, initial n 128). */
  private def punycode(label: String): String = {
    val cps = label.codePoints().toArray
    val out = new StringBuilder
    cps.foreach(c => if (c < 0x80) out.append(c.toChar))
    val b = out.length
    if (b > 0) out.append('-')
    def digit(d: Int): Char =
      (if (d < 26) 'a' + d else '0' + d - 26).toChar
    def adapt(d0: Int, numPoints: Int, first: Boolean): Int = {
      var d = if (first) d0 / 700 else d0 / 2
      d += d / numPoints
      var k = 0
      while (d > ((36 - 1) * 26) / 2) { d /= 36 - 1; k += 36 }
      k + (36 * d) / (d + 38)
    }
    var n = 128
    var delta = 0
    var bias = 72
    var h = b
    while (h < cps.length) {
      var m = Int.MaxValue
      cps.foreach(c => if (c >= n && c < m) m = c)
      require(m - n <= (Int.MaxValue - delta) / (h + 1), "punycode overflow")
      delta += (m - n) * (h + 1)
      n = m
      cps.foreach { c =>
        if (c < n) { delta += 1; require(delta > 0, "punycode overflow") }
        if (c == n) {
          var q = delta
          var k = 36
          var done = false
          while (!done) {
            val t = if (k <= bias) 1 else if (k >= bias + 26) 26 else k - bias
            if (q < t) done = true
            else {
              out.append(digit(t + (q - t) % (36 - t)))
              q = (q - t) / (36 - t)
              k += 36
            }
          }
          out.append(digit(q))
          bias = adapt(delta, h + 1, h == b)
          delta = 0
          h += 1
        }
      }
      delta += 1
      n += 1
    }
    out.result()
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10
  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'

  /** §6.2.2.2: decode unreserved octets, uppercase the hex of every
    * other escape; a dangling `%` (not two hex digits) passes through. */
  private def pctNormalize(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) &&
        isHex(s.charAt(i + 2))) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) sb.append(v.toChar)
        else sb.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.result()
  }

  private[expressions] def removeDots(p: String): String =
    removeDotSegments(p)

  /** §5.2.4 remove_dot_segments, verbatim (empty segments preserved). */
  private def removeDotSegments(p: String): String = {
    var in = p
    val out = new StringBuilder(p.length)
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); trimLastSeg(out) }
      else if (in == "/..") { in = "/"; trimLastSeg(out) }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', start)
        if (next < 0) { out.append(in); in = "" }
        else { out.append(in.substring(0, next)); in = in.substring(next) }
      }
    }
    out.result()
  }

  private def trimLastSeg(out: StringBuilder): Unit = {
    var i = out.length - 1
    while (i >= 0 && out.charAt(i) != '/') i -= 1
    out.setLength(math.max(i, 0))
  }
}

/** Relative-reference resolution — RFC 3986 §5.2, the other half of
  * frontier identity: a crawl's outlinks are overwhelmingly relative
  * (`../g`, `/abs`, `//host/x`, `?y`), and an edge list is only as
  * good as the absolutization. The kernel runs the §5.2.2
  * transform-references algorithm verbatim (parse by the RFC's own
  * Appendix B regex, §5.2.3 merge, §5.2.4 dot-segment removal) and
  * pipes the recomposed target through [[UrlKernels
  * .canonicalizeUrlKernel]] so resolve and canonicalize agree on one
  * spelling (which also drops the fragment — fetch identity). A base
  * that is not an absolute hierarchical URL resolves to null (no
  * identity can be derived), matching the tolerant-null convention of
  * the frontier joins downstream. */
object UrlResolveKernels {

  // RFC 3986 Appendix B — the grammar's own decomposition regex
  private val UriRe = java.util.regex.Pattern.compile(
    "^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\\?([^#]*))?(#(.*))?$")

  def resolveUrlKernel(base: UTF8String, ref: UTF8String): UTF8String = {
    val out = resolve(base.toString, ref.toString)
    if (out == null) null
    else UrlKernels.canonicalizeUrlKernel(UTF8String.fromString(out))
  }

  private def resolve(base: String, ref: String): String = {
    val bm = UriRe.matcher(base)
    if (!bm.matches()) return null
    val bScheme = bm.group(2)
    val bAuth = bm.group(4)
    // frontier bases are fetched URLs: absolute + hierarchical only
    if (bScheme == null || bAuth == null) return null
    val bPath = bm.group(5)
    val bQuery = bm.group(7)
    val rm = UriRe.matcher(ref)
    if (!rm.matches()) return null
    val rScheme = rm.group(2)
    val rAuth = rm.group(4)
    val rPath = rm.group(5)
    val rQuery = rm.group(7)
    var tScheme: String = null
    var tAuth: String = null
    var tPath: String = null
    var tQuery: String = null
    if (rScheme != null) {
      tScheme = rScheme; tAuth = rAuth
      tPath = UrlKernels.removeDots(rPath); tQuery = rQuery
    } else {
      tScheme = bScheme
      if (rAuth != null) {
        tAuth = rAuth; tPath = UrlKernels.removeDots(rPath); tQuery = rQuery
      } else {
        tAuth = bAuth
        if (rPath.isEmpty) {
          tPath = bPath
          tQuery = if (rQuery != null) rQuery else bQuery
        } else {
          tPath =
            if (rPath.startsWith("/")) UrlKernels.removeDots(rPath)
            else UrlKernels.removeDots(merge(bAuth, bPath, rPath))
          tQuery = rQuery
        }
      }
    }
    if (tAuth == null) return null // e.g. ref "mailto:x" — not an edge
    val sb = new StringBuilder(base.length + ref.length)
    sb.append(tScheme).append("://").append(tAuth).append(tPath)
    if (tQuery != null) sb.append('?').append(tQuery)
    sb.result()
  }

  /** §5.2.3: merge the reference path into the base path. */
  private def merge(bAuth: String, bPath: String, rPath: String): String =
    if (bAuth != null && bPath.isEmpty) "/" + rPath
    else {
      val cut = bPath.lastIndexOf('/')
      if (cut < 0) rPath else bPath.substring(0, cut + 1) + rPath
    }
}

/** `canonicalize_url(string)` → string: see [[UrlKernels]]. */
case class CanonicalizeUrl(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"canonicalize_url requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "canonicalize_url"
  override def nullSafeEval(input: Any): Any =
    UrlKernels.canonicalizeUrlKernel(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.UrlKernels.canonicalizeUrlKernel($c);")
  override protected def withNewChildInternal(newChild: Expression): CanonicalizeUrl =
    copy(child = newChild)
}

/** `resolve_url(base, ref)` → string (null when no fetch identity can
  * be derived): see [[UrlResolveKernels]]. */
case class ResolveUrl(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"resolve_url requires (string, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "resolve_url"
  override def nullSafeEval(base: Any, ref: Any): Any =
    UrlResolveKernels.resolveUrlKernel(
      base.asInstanceOf[UTF8String], ref.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, r) => s"""
      ${ev.value} = graft.expressions.UrlResolveKernels.resolveUrlKernel($b, $r);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ResolveUrl =
    copy(left = newLeft, right = newRight)
}

/** `surt_url(url)` → string (null when no fetch identity can be
  * derived): see [[UrlKernels.surtUrlKernel]]. */
case class SurtUrl(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"surt_url requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "surt_url"
  override def nullSafeEval(input: Any): Any =
    UrlKernels.surtUrlKernel(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.UrlKernels.surtUrlKernel($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): SurtUrl =
    copy(child = newChild)
}

object NativeUrl {
  def canonicalizeUrl(url: Column): Column =
    GraftColumnBridge.column(CanonicalizeUrl(GraftColumnBridge.expression(url)))
  def surtUrl(url: Column): Column =
    GraftColumnBridge.column(SurtUrl(GraftColumnBridge.expression(url)))
  def resolveUrl(base: Column, ref: Column): Column =
    GraftColumnBridge.column(ResolveUrl(
      GraftColumnBridge.expression(base), GraftColumnBridge.expression(ref)))
}
