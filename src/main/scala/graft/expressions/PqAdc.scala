package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `pq_adc(codes, table)` — asymmetric-distance lookup for product
  * quantization: given a document's `m` sub-block codes and a QUERY's
  * flattened m×kc distance table (entry b·kc + c = squared L2 between the
  * query's sub-vector b and centroid c of codebook b), returns the
  * approximate squared distance Σ_b table[b·kc + codes[b]] — the FAISS
  * ADC step as one codegen'd lookup loop per (query, doc) pair. kc is
  * table.length / codes.length, derived per row so one expression serves
  * any codebook size. Null input → null; malformed input — empty codes,
  * a table length that is not a multiple of the code count, or a code
  * outside [0, kc) — is a caller bug (mismatched model) and raises with
  * an explicit message rather than summing garbage lanes.
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (array<int>, array<double>), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(codes: Any, table: Any): Any =
    PqAdc.compute(codes.asInstanceOf[ArrayData], table.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) =>
      s"${ev.value} = graft.expressions.PqAdc.compute($c, $t);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {

  def compute(codes: ArrayData, table: ArrayData): Double = {
    val m = codes.numElements()
    val n = table.numElements()
    if (m == 0 || n % m != 0)
      throw new IllegalArgumentException(
        s"pq_adc: table length $n must be a positive multiple of code count $m " +
          "(codes and table come from different PQ models?)")
    val kc = n / m
    var sum = 0.0
    var b = 0
    while (b < m) {
      val code = codes.getInt(b)
      if (code < 0 || code >= kc)
        throw new IllegalArgumentException(
          s"pq_adc: code $code at block $b outside [0, $kc) " +
            "(codes and table come from different PQ models?)")
      sum += table.getDouble(b * kc + code)
      b += 1
    }
    sum
  }

  /** Column-API form. */
  def pqAdc(codes: Column, table: Column): Column =
    GraftColumnBridge.column(PqAdc(
      GraftColumnBridge.expression(codes), GraftColumnBridge.expression(table)))
}
