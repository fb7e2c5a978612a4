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
        // scheme or authority: uppercase and explicit ports rewrite
        if (c >= 'A' && c <= 'Z') return false
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
    val hostLc = host.toLowerCase(Locale.ROOT)
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

object NativeUrl {
  def canonicalizeUrl(url: Column): Column =
    GraftColumnBridge.column(CanonicalizeUrl(GraftColumnBridge.expression(url)))
}
