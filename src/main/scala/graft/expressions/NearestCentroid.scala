package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: index of the nearest centroid by L2
  * (argmin ‖v−c‖² = argmin ‖c‖²−2v·c; ties → lower index) — the IVF
  * assignment kernel.
  *
  * Why a custom Expression: the built-in formulation is nLists
  * `aggregate(zip_with(vec, lit(centroid)))` folds inside an
  * array_min(array(struct...)) — higher-order functions run interpreted,
  * and the centroid matrix is replicated into the plan as nLists×dim
  * literals, paid again in plan build/codegen for every Lloyd round's job.
  * Here the matrix is a single expression parameter and the argmin is one
  * primitive-double loop. */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (centroids.nonEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("centroids must be non-empty")
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<float> or array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val normSq: Array[Double] = centroids.map(_.map(x => x * x).sum)

  override def nullSafeEval(input: Any): Any =
    NearestCentroid.compute(input.asInstanceOf[ArrayData], centroids, normSq, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the matrix once per task via a codegen reference, not literals
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val nRef = ctx.addReferenceObj("normSq", normSq, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.NearestCentroid.compute($c, $cRef, $nRef, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {

  /** The kernel — shared by interpreted eval and generated code. Matches
    * the argmin-over-(‖c‖²−2v·c, index) struct comparison: strictly
    * smaller distance wins, ties keep the lower index. Null vector
    * elements contribute 0. Dimensions beyond the vector's length
    * contribute only their centroid-norm term (mirrors zip_with's
    * null-padding making those products null → dropped by the fold). */
  def compute(arr: ArrayData, centroids: Array[Array[Double]],
      normSq: Array[Double], isFloat: Boolean): Int = {
    val dim = arr.numElements()
    val v = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (!arr.isNullAt(j)) v(j) = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      j += 1
    }
    var best = 0
    var bestD = Double.PositiveInfinity
    var i = 0
    while (i < centroids.length) {
      val c = centroids(i)
      val n = math.min(dim, c.length)
      var dot = 0.0
      var k = 0
      while (k < n) { dot += v(k) * c(k); k += 1 }
      val d = normSq(i) - 2.0 * dot
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** Column wrapper. */
  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    GraftColumnBridge.column(
      NearestCentroid(GraftColumnBridge.expression(vec), centroids))
}
