package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `cosine_sim(a, b)` — native cosine similarity over two dense vector
  * columns (`array<float>` or `array<double>`, mixed allowed).
  *
  * BIT-IDENTICAL to the declarative formulation it replaces
  * (`VectorFunctions.cosine`'s aggregate/zip_with double folds):
  * dot(a,b) / nullif(sqrt(dot(a,a)) · sqrt(dot(b,b)), 0), every
  * accumulation a sequential left-to-right double sum starting at 0.0 —
  * the same fold order, so oracle SQL that replays the double fold keeps
  * hash-matching (parity-locked by a ScalaTest comparing the two
  * formulations with === on testdata).
  *
  * Why a custom Expression: `aggregate`/`zip_with` are higher-order
  * functions — they run INTERPRETED (CodegenFallback), allocating a
  * lambda frame per element. In pair-generation loops (semantic dedup,
  * ANN rerank: millions of candidate pairs × 3 folds × 64 lanes each)
  * that interpretation dominates the operator. This kernel is one
  * primitive-double loop per pair, inlined into whole-stage codegen.
  *
  * Null semantics (matches the HOF formulation exactly): null input
  * array → null; length mismatch → null (zip_with pads with null, the
  * null product nulls the whole fold); any null ELEMENT → null; zero
  * norm → null (nullif guard).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(dt: DataType) = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float|double> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private lazy val leftFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val rightFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("cosRes")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double $res = graft.expressions.CosineSim.compute(
        $a, $b, $leftFloat, $rightFloat);
      if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** The kernel — shared by interpreted eval and generated code. Sequential
    * left-to-right double folds, matching aggregate(zip_with(...)). */
  def compute(a: ArrayData, b: ArrayData,
      leftFloat: Boolean, rightFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  /** Column-API form. */
  def cosineSim(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      CosineSim(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
