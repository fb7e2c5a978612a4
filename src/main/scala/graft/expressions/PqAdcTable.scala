package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `pq_adc_table(vec)` — build a query's flattened m×kc ADC distance table
  * (entry b·kc + c = squared L2 between the query's sub-vector b and
  * centroid c of codebook b) as a distributed expression: the codebook
  * model rides along as a single codegen reference (the
  * [[NearestCentroid]] pattern), so ANY query table — including ones far
  * beyond driver scale — can enter the PQ tier with no driver-side
  * collect. This is the query-side sibling of [[PqAdc]], which consumes
  * the table against each document's codes.
  *
  * Vector elements may be float or double; nulls contribute 0; a vector
  * shorter than m·sub is zero-padded (mirrors NearestCentroid's
  * truncated-dot semantics — the missing lanes contribute only the
  * centroid's own energy).
  */
case class PqAdcTable(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      // uniform centroid count AND sub-vector width: compute() reads
      // books(0).length as kc for every book, so a ragged codebooks array
      // must fail analysis here, not throw in executors
      if (codebooks.nonEmpty && codebooks.forall(b => b.nonEmpty &&
          b.length == codebooks(0).length &&
          b.forall(_.length == codebooks(0)(0).length)))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "codebooks must be non-empty with uniform centroid count and sub-vector width")
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_table requires array<float> or array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_adc_table"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    PqAdcTable.compute(input.asInstanceOf[ArrayData], codebooks, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the model once per task via a codegen reference, not literals
    val bRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expressions.PqAdcTable.compute($v, $bRef, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcTable =
    copy(child = newChild)
}

object PqAdcTable {

  /** The kernel — shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, books: Array[Array[Array[Double]]],
      isFloat: Boolean): ArrayData = {
    val m = books.length
    val kc = books(0).length
    val sub = books(0)(0).length
    val dim = arr.numElements()
    val v = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (!arr.isNullAt(j)) v(j) = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      j += 1
    }
    val out = new Array[Double](m * kc)
    var b = 0
    while (b < m) {
      val base = b * sub
      var c = 0
      while (c < kc) {
        val cent = books(b)(c)
        var d2 = 0.0
        var k = 0
        while (k < sub) {
          val x = if (base + k < dim) v(base + k) else 0.0
          val diff = x - cent(k)
          d2 += diff * diff
          k += 1
        }
        out(b * kc + c) = d2
        c += 1
      }
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper. */
  def pqAdcTable(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.column(
      PqAdcTable(GraftColumnBridge.expression(vec), codebooks))
}
