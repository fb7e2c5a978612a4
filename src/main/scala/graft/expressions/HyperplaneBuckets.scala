package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression: all `bands` LSH bucket keys of an embedding
  * in one per-row pass — bucket b is `bitsPerBand` random-hyperplane sign
  * bits (planes `b*bitsPerBand until (b+1)*bitsPerBand`) packed into a
  * long.
  *
  * Why a custom Expression (SURVEY.md §7.4 ladder): the built-in
  * formulation is bands×bitsPerBand `aggregate(zip_with(vec, lit(plane)))`
  * folds — higher-order functions are CodegenFallback, so every fold runs
  * interpreted with per-element boxing, and every plane is a dim-double
  * PLAN LITERAL (128 planes × 64 dims ≈ 1.1 MiB task binaries; BENCH_r01
  * logged the "Broadcasting large task binary" warning). Here plane
  * components are regenerated on the fly from the same splitmix64 stream
  * (VectorFunctions.hyperplane, plane p component j = splitmix64(p·φ + j))
  * — byte-identical buckets, zero literals, one primitive-double loop
  * inside whole-stage codegen.
  */
case class HyperplaneBuckets(child: Expression, bands: Int, bitsPerBand: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (bands > 0 && bitsPerBand > 0 && bitsPerBand <= 63)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"bands must be positive and bitsPerBand in [1, 63]: $bands, $bitsPerBand")
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets requires array<float> or array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  // must not touch child.dataType at construction — Catalyst copies the
  // expression (withNewChildInternal) while children are still unresolved
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    HyperplaneBuckets.compute(input.asInstanceOf[ArrayData], bands, bitsPerBand, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HyperplaneBuckets.compute($c, $bands, $bitsPerBand, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {

  /** splitmix64-derived plane component — MUST stay in lockstep with
    * VectorFunctions.hyperplane(seed, dim)(j) so expression-built and
    * literal-built buckets agree bit for bit. */
  private def component(seed: Int, j: Int): Double = {
    var z = seed.toLong * 0x9E3779B97F4A7C15L + j.toLong + 1
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (z ^ (z >>> 31)).toDouble * 1.0843961455707541e-19 // scale by 2^-63
  }

  /** The kernel — shared by interpreted eval and generated code. Null
    * elements contribute 0 to the projection (the lambda formulation
    * nulls the whole fold; embeddings with null components are not
    * meaningful inputs either way). */
  def compute(arr: ArrayData, bands: Int, bitsPerBand: Int, isFloat: Boolean): ArrayData = {
    val dim = arr.numElements()
    val v = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (!arr.isNullAt(j)) v(j) = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      j += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var i = 0
      while (i < bitsPerBand) {
        val seed = b * bitsPerBand + i
        var proj = 0.0
        var k = 0
        while (k < dim) { proj += v(k) * component(seed, k); k += 1 }
        if (proj >= 0) bucket |= (1L << i)
        i += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper: hyperplane_buckets(vec, bands, bitsPerBand) →
    * array<long> of length `bands`. */
  def hyperplaneBuckets(vec: Column, bands: Int, bitsPerBand: Int): Column =
    GraftColumnBridge.column(
      HyperplaneBuckets(GraftColumnBridge.expression(vec), bands, bitsPerBand))
}
