package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: 64-bit SimHash of an array of 64-bit token
  * hashes, in one per-row pass.
  *
  * Why a custom Expression (SURVEY.md §7.4 ladder): SimHash over built-ins
  * needs either explode + 64 conditional-sum aggregates (a shuffle of the
  * token stream — the shape Dedup.simhash originally used) or 64 nested
  * array traversals. As a single codegen'd kernel it is a pure map
  * operator — zero shuffle, stays inside whole-stage codegen, and the
  * 64-bit counting loop runs over primitive longs with no allocation
  * beyond one int[64].
  *
  * Semantics: bit b of the result is set iff more elements have bit b set
  * than clear (ties → clear), i.e. the majority sign of the classic
  * SimHash bit-count. Null elements are ignored; an empty array yields 0L.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** The kernel — shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column wrapper: simhash64(array<long>) → long. */
  def simhash64(tokenHashes: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokenHashes)))
}
