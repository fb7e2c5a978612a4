package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel behind [[DecodeLegacy]] (codegen calls it by name). */
object LegacyDecodeKernel {
  def decode(payload: Array[Byte], label: UTF8String): UTF8String =
    UTF8String.fromString(
      graft.operators.LegacyCharset.decode(payload, label.toString))
}

/** `decode_legacy(binary, charset_label)` → string: the WHATWG legacy
  * CJK decode ([[graft.operators.LegacyCharset]] — shift_jis, euc-jp,
  * gbk, big5, euc-kr and their label aliases), as a native codegen'd
  * expression so the HTML/text carriers' charset routing stays inside
  * whole-stage codegen (the same shape as the URL kernels; Spark's
  * built-in `decode` stops at ISO-8859-1). The caller routes only
  * labels the decoder claims; an unclaimed label throws — routing is
  * `decodePayload`'s contract, not silently absorbed here. */
case class DecodeLegacy(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"decode_legacy requires (binary, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "decode_legacy"
  override def nullSafeEval(payload: Any, label: Any): Any =
    LegacyDecodeKernel.decode(
      payload.asInstanceOf[Array[Byte]], label.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, l) =>
      s"${ev.value} = graft.expressions.LegacyDecodeKernel.decode($p, $l);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecodeLegacy =
    copy(left = newLeft, right = newRight)
}

/** Static kernel behind [[DetectAndDecode]] — ONE cascade run, the
  * label routed through the shared
  * [[graft.operators.LegacyCharset.decodeAs]] switch. */
object CharsetDetectKernel {
  def detectAndDecode(payload: Array[Byte])
      : org.apache.spark.sql.catalyst.InternalRow = {
    val (label, margin) =
      graft.operators.LegacyCharset.detectScored(payload)
    org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromString(label),
      UTF8String.fromString(
        graft.operators.LegacyCharset.decodeAs(payload, label)),
      margin)
  }
}

/** `detect_and_decode(binary)` → struct<charset, text, margin>: ONE
  * cascade run serving the label, the routed decode, AND the
  * confidence margin ([[graft.operators.LegacyCharset.detectScored]] —
  * +∞ for structural lanes, winner-minus-runner-up for scored claims,
  * 0 for the unclaimed fallback, so encoding-quality gates can
  * threshold a coin-flip winner) — the shape
  * [[graft.io.Warc.toDocumentsTextDetected]] projects, where separate
  * `detect_charset` + `decode_detected` columns would run the
  * 16-candidate scoring pass twice per record (and whole-stage
  * codegen's subexpression elimination dedups the `getField`
  * accesses to this one call). */
case class DetectAndDecode(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"detect_and_decode requires binary, got ${t.catalogString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(org.apache.spark.sql.types.StructField("charset", StringType,
      nullable = false),
      org.apache.spark.sql.types.StructField("text", StringType,
        nullable = false),
      org.apache.spark.sql.types.StructField("margin",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
  override def prettyName: String = "detect_and_decode"
  override def nullSafeEval(payload: Any): Any =
    CharsetDetectKernel.detectAndDecode(payload.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p =>
      s"graft.expressions.CharsetDetectKernel.detectAndDecode($p)")
  override protected def withNewChildInternal(
      newChild: Expression): DetectAndDecode = copy(child = newChild)
}

object NativeCharset {
  def decodeLegacy(payload: Column, label: Column): Column =
    GraftColumnBridge.column(DecodeLegacy(
      GraftColumnBridge.expression(payload),
      GraftColumnBridge.expression(label)))
  def detectAndDecode(payload: Column): Column =
    GraftColumnBridge.column(DetectAndDecode(
      GraftColumnBridge.expression(payload)))
}
