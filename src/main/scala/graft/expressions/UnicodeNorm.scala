package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel behind [[NfcNormalize]] (codegen calls it by name). */
object UnicodeNormKernel {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // quick-check first: real corpora are overwhelmingly already-NFC
    // (and ASCII trivially is), so the common row costs one scan and
    // zero allocation
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(string)` → string: Unicode NFC (canonical
  * composition) via the JDK's `java.text.Normalizer` (public API, the
  * [[UrlKernels]] IDN precedent) — the text-identity pass a corpus
  * takes BEFORE hashing/dedup/tokenization: `é` spelled as one
  * codepoint and as `e` + COMBINING ACUTE are the same text to every
  * consumer downstream, and un-normalized corpora fracture dedup keys,
  * BPE merges, and decontamination grams on invisible byte
  * differences. Codegen'd native expression; already-normalized rows
  * (the overwhelming majority) pay one quick-check scan and return the
  * input buffer untouched. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(input: Any): Any =
    UnicodeNormKernel.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.UnicodeNormKernel.nfc($c);")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NativeUnicode {
  def nfcNormalize(s: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(s)))
}
