package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hashing kernels for the dedup hot path. The built-in
  * formulation — `transform(filter(split(text, "\\s+"), ...), xxhash64)`
  * and friends — is correct but runs interpreted (higher-order functions
  * are CodegenFallback) and allocates a UTF8String per token. These
  * kernels produce BIT-IDENTICAL hashes by calling the same XXH64
  * primitives Spark's `xxhash64` uses (seed 42, string hash over the
  * token's byte slice, array hash as a left fold), verified by parity
  * tests against the built-in expressions in TextFunctionsSpec.
  *
  * Tokenization parity: Java's `\s` (no UNICODE flag) is exactly
  * {space, \t, \n, \x0B, \f, \r} — all single ASCII bytes, which
  * multi-byte UTF-8 sequences can never contain, so a bytewise scan splits
  * at exactly the positions the regex does, and empty tokens (leading/
  * trailing/consecutive whitespace) disappear just as the filter did.
  */
object TextKernels {

  private final val Seed = 42L // XxHash64 expression default

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  /** xxhash64 of each whitespace-separated token, without materializing
    * token strings: hash runs directly over the parent string's bytes. */
  def tokenHashesKernel(s: UTF8String): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    var count = 0
    var i = 0
    var inTok = false
    while (i < n) { // first pass: count tokens (no growable allocation)
      val ws = isWs(s.getByte(i))
      if (!ws && !inTok) { count += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    val out = new Array[Long](count)
    var t = 0
    var start = 0
    i = 0
    inTok = false
    while (i < n) {
      val ws = isWs(s.getByte(i))
      if (!ws && !inTok) { start = i; inTok = true }
      else if (ws && inTok) {
        out(t) = XXH64.hashUnsafeBytes(base, off + start, i - start, Seed); t += 1
        inTok = false
      }
      i += 1
    }
    if (inTok) { out(t) = XXH64.hashUnsafeBytes(base, off + start, n - start, Seed); t += 1 }
    new GenericArrayData(out)
  }

  /** Distinct n-gram shingle hashes from token hashes, matching
    * `xxhash64(slice(th, i+1, n))` (array hash = left fold from seed 42)
    * with array_distinct's keep-first-occurrence order; ≤ n tokens →
    * the single whole-array hash (TextFunctions.shingleHashesFrom). */
  def shingleHashesKernel(th: ArrayData, n: Int): ArrayData = {
    val m = th.numElements()
    if (m <= n) {
      var h = Seed
      var i = 0
      while (i < m) { h = XXH64.hashLong(th.getLong(i), h); i += 1 }
      return new GenericArrayData(Array(h))
    }
    val count = m - n + 1
    val out = new Array[Long](count)
    val seen = new java.util.HashSet[java.lang.Long](count * 2)
    var t = 0
    var i = 0
    while (i < count) {
      var h = Seed
      var k = 0
      while (k < n) { h = XXH64.hashLong(th.getLong(i + k), h); k += 1 }
      if (seen.add(h)) { out(t) = h; t += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, t))
  }

  /** k-minima MinHash signature over shingle hashes, matching
    * `array_min(transform(hs, h => xxhash64(lit(i), h)))` per seed i
    * (xxhash64(int, long) = hashLong(h, hashInt(i, seed))). O(k·m) with
    * the k int-prefix hashes computed once. Empty input → nulls (the
    * built-in array_min of an empty array is null). */
  def minhashKernel(hs: ArrayData, k: Int): ArrayData = {
    val m = hs.numElements()
    if (m == 0) return new GenericArrayData(new Array[Any](k))
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val seedI = XXH64.hashInt(i, Seed)
      var best = Long.MaxValue
      var j = 0
      while (j < m) {
        val h = XXH64.hashLong(hs.getLong(j), seedI)
        if (h < best) best = h
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Content-defined chunk boundaries over a token-hash stream —
    * FastCDC-style (Xia et al. 2016, USENIX ATC) gear rolling hash
    * adapted from bytes to 64-bit token hashes: h = (h << 1) + th(i),
    * boundary after position i when the chunk has ≥ `min` tokens and
    * (h & mask) == 0 (mask = 2^⌊log₂ avg⌋ − 1 → ~1/avg boundary odds
    * per position), forced at `max`; h resets per chunk. Returns the
    * EXCLUSIVE end positions, ascending, final element always n.
    * The shift ages old tokens out of h (effective window 64), so after
    * any edit the boundary stream RESYNCHRONIZES with the unedited
    * text's — the property fixed-stride chunking lacks and chunk-level
    * dedup needs. Empty input → empty array. */
  def cdcBoundariesKernel(th: ArrayData, avg: Int, min: Int, max: Int): ArrayData = {
    val n = th.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyIntArray)
    val mask = (java.lang.Integer.highestOneBit(avg) - 1).toLong
    val out = new scala.collection.mutable.ArrayBuffer[Int](n / math.max(1, min) + 1)
    var h = 0L
    var last = 0
    var i = 0
    while (i < n) {
      h = (h << 1) + th.getLong(i)
      val len = i - last + 1
      if ((len >= min && (h & mask) == 0L) || len >= max) {
        out += i + 1
        last = i + 1
        h = 0L
      }
      i += 1
    }
    if (last < n) out += n
    new GenericArrayData(out.toArray)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private final val HexDigits = "0123456789abcdef".toCharArray

  /** md5 hex of every length-n sliding token window (see WindowMd5). */
  def windowMd5Kernel(arr: ArrayData, n: Int): ArrayData = {
    val nt = arr.numElements()
    val nw = nt - n + 1
    if (nw <= 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[Array[Byte]](nt)
    var i = 0
    while (i < nt) {
      toks(i) =
        if (arr.isNullAt(i)) Array.emptyByteArray
        else arr.getUTF8String(i).getBytes
      i += 1
    }
    val md = md5Local.get()
    val out = new Array[Any](nw)
    var p = 0
    while (p < nw) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(0x20.toByte)
        md.update(toks(p + j))
        j += 1
      }
      val dig = md.digest()
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(b * 2) = HexDigits((dig(b) >> 4) & 0xF)
        hex(b * 2 + 1) = HexDigits(dig(b) & 0xF)
        b += 1
      }
      out(p) = UTF8String.fromString(new String(hex))
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** `window_md5(array<string>, n)` → array<string>: md5 hex of every
  * length-n sliding token window, one element per start position —
  * BIT-IDENTICAL to `transform(sequence(1, nt-n+1), p ->
  * md5(concat_ws(" ", slice(toks, p, n))))` (the digest runs over the
  * window's tokens joined by single spaces), which runs interpreted and
  * re-slices per window. One pass here: token bytes gathered once, each
  * window streamed into a thread-local MessageDigest. Fewer than n tokens
  * → empty array. Null tokens cannot occur from the engine's tokenizers;
  * they hash as empty strings WITH separators, unlike concat_ws's
  * skip-with-separator — don't feed hand-built arrays with nulls. */
case class WindowMd5(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(s"n must be positive: $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"window_md5 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "window_md5"
  override def nullSafeEval(input: Any): Any =
    TextKernels.windowMd5Kernel(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextKernels.windowMd5Kernel($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): WindowMd5 =
    copy(child = newChild)
}

/** `token_hashes(string)` → array<bigint>: see TextKernels. */
case class TokenHashes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_hashes requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hashes"
  override def nullSafeEval(input: Any): Any =
    TextKernels.tokenHashesKernel(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextKernels.tokenHashesKernel($c);")
  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}

/** `shingle_hashes(array<bigint>, n)` → array<bigint>: see TextKernels. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(s"n must be positive: $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def nullSafeEval(input: Any): Any =
    TextKernels.shingleHashesKernel(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextKernels.shingleHashesKernel($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `minhash_signature(array<bigint>, k)` → array<bigint>: see TextKernels. */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(s"k must be positive: $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_signature"
  override def nullSafeEval(input: Any): Any =
    TextKernels.minhashKernel(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextKernels.minhashKernel($c, $k);")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** `cdc_boundaries(array<bigint>, avg, min, max)` → array<int>: see
  * TextKernels.cdcBoundariesKernel. */
case class CdcBoundaries(child: Expression, avg: Int, min: Int, max: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if 0 < min && min <= avg && avg <= max =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"need 0 < min <= avg <= max, got min=$min avg=$avg max=$max")
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_boundaries requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"
  override def nullSafeEval(input: Any): Any =
    TextKernels.cdcBoundariesKernel(input.asInstanceOf[ArrayData], avg, min, max)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextKernels.cdcBoundariesKernel($c, $avg, $min, $max);")
  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object NativeText {
  def tokenHashes(text: Column): Column =
    GraftColumnBridge.column(TokenHashes(GraftColumnBridge.expression(text)))
  def shingleHashes(th: Column, n: Int): Column =
    GraftColumnBridge.column(ShingleHashes(GraftColumnBridge.expression(th), n))
  def minhashSignature(hs: Column, k: Int): Column =
    GraftColumnBridge.column(MinHashSignature(GraftColumnBridge.expression(hs), k))
  def windowMd5(toks: Column, n: Int): Column =
    GraftColumnBridge.column(WindowMd5(GraftColumnBridge.expression(toks), n))
  def cdcBoundaries(th: Column, avg: Int, min: Int, max: Int): Column =
    GraftColumnBridge.column(
      CdcBoundaries(GraftColumnBridge.expression(th), avg, min, max))
}
