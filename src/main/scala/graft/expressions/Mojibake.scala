package graft.expressions

import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair — the encoding-damage pass of text curation. A real
  * fraction of crawl text was UTF-8 once, got decoded as Windows-1252
  * (or Latin-1) somewhere in its pipeline, and now reads `â€™` for `’`
  * and `Ã©` for `é`. The damage is EXACTLY invertible when it happened:
  * re-encode the characters under cp1252 and strictly re-decode the
  * bytes as UTF-8. The kernel does that round, accepting the fix ONLY
  * when (a) every char maps back to a cp1252 byte, (b) the byte string
  * is STRICT valid UTF-8, and (c) the decode actually changes the
  * string — pure-ASCII and healthy Latin-1 text (`café`: 0xE9 is not a
  * UTF-8 lead) pass through untouched. Twice-damaged text (two wrong
  * decodes) repairs in two rounds; the round cap stops there.
  *
  * False positives require real cp1252 text whose high-char runs spell
  * byte-exact UTF-8 sequences — multi-char sequences a human does not
  * type (the ftfy premise: fixable implies broken); the probe spec
  * pins representative healthy inputs.
  *
  * Codegen'd `Expression` (no UDF): stays inside WholeStageCodegen on
  * the curation path, with a bytewise all-ASCII fast path that skips
  * charset machinery entirely — the overwhelmingly common case at
  * 100 TB. Thread-local coders (CharsetEncoder is stateful). */
object MojibakeKernels {

  private val cp1252 = Charset.forName("windows-1252")
  private val utf8 = Charset.forName("UTF-8")

  private val encoders = new ThreadLocal[java.nio.charset.CharsetEncoder] {
    override def initialValue() = cp1252.newEncoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
  }
  private val decoders = new ThreadLocal[java.nio.charset.CharsetDecoder] {
    override def initialValue() = utf8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
  }

  def fixMojibakeKernel(u: UTF8String): UTF8String = {
    // fast path: pure-ASCII bytes cannot be mojibake
    val raw = u.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < raw.length) { if (raw(i) < 0) ascii = false; i += 1 }
    if (ascii) return u
    var cur = u.toString
    var changed = false
    var rounds = 0
    while (rounds < 2) {
      val fixed = onePass(cur)
      if (fixed == null)
        return if (changed) UTF8String.fromString(cur) else u
      cur = fixed
      changed = true
      rounds += 1
    }
    UTF8String.fromString(cur)
  }

  /** One repair round, or null when the string is not (further)
    * repairable. */
  private def onePass(s: String): String =
    try {
      val bytes = encoders.get().reset()
        .encode(java.nio.CharBuffer.wrap(s))
      val dec = decoders.get().reset().decode(bytes).toString
      if (dec == s) null else dec
    } catch { case _: CharacterCodingException => null }
}

/** `fix_mojibake(string)` → string: see [[MojibakeKernels]]. */
case class FixMojibake(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fix_mojibake requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "fix_mojibake"
  override def nullSafeEval(input: Any): Any =
    MojibakeKernels.fixMojibakeKernel(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MojibakeKernels.fixMojibakeKernel($c);")
  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)
}

object NativeMojibake {
  def fixMojibake(text: Column): Column =
    GraftColumnBridge.column(FixMojibake(GraftColumnBridge.expression(text)))
}
