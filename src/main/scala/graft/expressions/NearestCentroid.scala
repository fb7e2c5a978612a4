package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
  * primitive-double loop.
  *
  * Scale: with nLists ∝ corpus (the constant-list-size IVF regime) a
  * brute scan makes assignment O(corpus · nLists) = quadratic — measured
  * as the super-linear term in the all-corpus IVF-PQ self-join. Above
  * [[NearestCentroid.PruneMinLists]] lists the kernel switches to an
  * EXACT triangle-inequality-pruned scan (Elkan/Hamerly-style bounding
  * over ~√L centroid groups): groups whose lower bound provably exceeds
  * the current best are skipped whole; every candidate that could win is
  * still scored by the identical arithmetic, so the result (including the
  * tie rule) is the brute argmin's. */
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
  // deterministic pure function of the centroid matrix — rebuilt
  // identically on every executor that deserializes the expression
  private lazy val pruner: CentroidPruner = NearestCentroid.buildPruner(centroids)

  override def nullSafeEval(input: Any): Any =
    if (pruner == null)
      NearestCentroid.compute(input.asInstanceOf[ArrayData], centroids, normSq, isFloat)
    else
      NearestCentroid.computeTop(
        input.asInstanceOf[ArrayData], centroids, normSq, isFloat, pruner, 1)(0)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the matrix once per task via a codegen reference, not literals
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val nRef = ctx.addReferenceObj("normSq", normSq, "double[]")
    if (pruner == null)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.NearestCentroid.compute($c, $cRef, $nRef, $isFloat);")
    else {
      val pRef = ctx.addReferenceObj("pruner", pruner,
        "graft.expressions.CentroidPruner")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.NearestCentroid.computeTop(" +
          s"$c, $cRef, $nRef, $isFloat, $pRef, 1)[0];")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** Top-`t` nearest centroid indices, ascending by (distance, index) — the
  * IVF probe-list kernel. One in-row scan (pruned exactly as
  * [[NearestCentroid]]) replaces the queries × centroid-table cross join
  * + per-query window sort, whose O(rows · nLists) intermediate goes
  * quadratic in the nLists ∝ corpus regime. */
case class NearestCentroidsTop(child: Expression, centroids: Array[Array[Double]], t: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (centroids.isEmpty)
        TypeCheckResult.TypeCheckFailure("centroids must be non-empty")
      else if (t < 1 || t > centroids.length)
        TypeCheckResult.TypeCheckFailure(
          s"t must be in [1, ${centroids.length}]: $t")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids_top requires array<float> or array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids_top"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val normSq: Array[Double] = centroids.map(_.map(x => x * x).sum)
  private lazy val pruner: CentroidPruner = NearestCentroid.buildPruner(centroids)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(NearestCentroid.computeTop(
      input.asInstanceOf[ArrayData], centroids, normSq, isFloat, pruner, t))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val nRef = ctx.addReferenceObj("normSq", normSq, "double[]")
    val pRef =
      if (pruner == null) "null"
      else ctx.addReferenceObj("pruner", pruner, "graft.expressions.CentroidPruner")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expressions.NearestCentroid.computeTop($c, $cRef, $nRef, $isFloat, $pRef, $t));")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsTop =
    copy(child = newChild)
}

/** Centroid-group structure for [[NearestCentroid]]'s exact pruned scan:
  * ~√L group centers, each with its member centroid indices and covering
  * radius (max Euclidean distance center→member). Pure function of the
  * centroid matrix (strided seeds, 3 deterministic Lloyd rounds over the
  * L centroid VECTORS — KB-scale, driver/executor-side microseconds).
  * Top-level (not nested in the companion) so generated code can name the
  * type. */
final class CentroidPruner(
    val supers: Array[Array[Double]],
    val superNormSq: Array[Double],
    val radius: Array[Double],
    val members: Array[Array[Int]]) extends Serializable

object NearestCentroid {

  /** Below this list count the brute scan wins (group bookkeeping costs
    * more than it saves) and the pruner is not built. */
  val PruneMinLists = 128

  def buildPruner(centroids: Array[Array[Double]]): CentroidPruner = {
    val L = centroids.length
    if (L < PruneMinLists) return null
    val G = math.max(2, math.round(math.sqrt(L.toDouble)).toInt)
    val dim = centroids.map(_.length).max
    var supers = Array.tabulate(G)(g =>
      java.util.Arrays.copyOf(centroids((g.toLong * L / G).toInt), dim))
    val assign = new Array[Int](L)
    var iter = 0
    while (iter < 3) {
      var i = 0
      while (i < L) {
        val c = centroids(i)
        var best = 0
        var bestD = Double.PositiveInfinity
        var g = 0
        while (g < G) {
          val s = supers(g)
          val n = math.min(c.length, s.length)
          var d = 0.0
          var k = 0
          while (k < n) { val x = c(k) - s(k); d += x * x; k += 1 }
          if (d < bestD) { bestD = d; best = g }
          g += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(G)(new Array[Double](dim))
      val counts = new Array[Int](G)
      i = 0
      while (i < L) {
        val c = centroids(i)
        val s = sums(assign(i))
        var k = 0
        while (k < c.length) { s(k) += c(k); k += 1 }
        counts(assign(i)) += 1
        i += 1
      }
      supers = Array.tabulate(G)(g =>
        if (counts(g) == 0) supers(g)
        else sums(g).map(_ / counts(g)))
      iter += 1
    }
    // final assignment against the settled supers, then members + radius
    val memberBufs = Array.fill(G)(scala.collection.mutable.ArrayBuffer.empty[Int])
    val radius = new Array[Double](G)
    var i = 0
    while (i < L) {
      val c = centroids(i)
      var best = 0
      var bestD = Double.PositiveInfinity
      var g = 0
      while (g < G) {
        val s = supers(g)
        val n = math.min(c.length, s.length)
        var d = 0.0
        var k = 0
        while (k < n) { val x = c(k) - s(k); d += x * x; k += 1 }
        if (d < bestD) { bestD = d; best = g }
        g += 1
      }
      memberBufs(best) += i
      val r = math.sqrt(bestD)
      if (r > radius(best)) radius(best) = r
      i += 1
    }
    new CentroidPruner(supers, supers.map(_.map(x => x * x).sum), radius,
      memberBufs.map(_.toArray))
  }

  /** The brute kernel — shared by interpreted eval and generated code.
    * Matches the argmin-over-(‖c‖²−2v·c, index) struct comparison:
    * strictly smaller distance wins, ties keep the lower index. Null
    * vector elements contribute 0. Dimensions beyond the vector's length
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

  /** Top-`t` kernel, optionally pruned (`pruner` null → brute scan).
    * Every scored centroid uses arithmetic identical to [[compute]], so
    * the selected set and its (distance, index) order equal the brute
    * scan's for any visit order; pruning only skips groups whose
    * triangle-inequality lower bound (in true-distance space, with a
    * small conservative slack for the bound's own rounding) exceeds the
    * current t-th best — candidates at exactly the boundary are still
    * scored, so exact ties resolve by index exactly as brute. */
  def computeTop(arr: ArrayData, centroids: Array[Array[Double]],
      normSq: Array[Double], isFloat: Boolean, pruner: CentroidPruner, t: Int): Array[Int] = {
    val dim = arr.numElements()
    val v = new Array[Double](dim)
    var vNormSq = 0.0
    var j = 0
    while (j < dim) {
      if (!arr.isNullAt(j)) {
        val x = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
        v(j) = x
        vNormSq += x * x
      }
      j += 1
    }
    // best-t in (d, index) order; d in the ‖c‖²−2v·c space (true dist²
    // minus the per-row constant ‖v‖², so ordering is unaffected)
    val bd = new Array[Double](t)
    val bi = new Array[Int](t)
    java.util.Arrays.fill(bd, Double.PositiveInfinity)
    java.util.Arrays.fill(bi, Int.MaxValue)
    var filled = 0

    def score(i: Int, c: Array[Double]): Unit = {
      val n = math.min(dim, c.length)
      var dot = 0.0
      var k = 0
      while (k < n) { dot += v(k) * c(k); k += 1 }
      val d = normSq(i) - 2.0 * dot
      if (d < bd(t - 1) || (d == bd(t - 1) && i < bi(t - 1))) {
        var p = t - 1
        while (p > 0 && (bd(p - 1) > d || (bd(p - 1) == d && bi(p - 1) > i))) {
          bd(p) = bd(p - 1); bi(p) = bi(p - 1); p -= 1
        }
        bd(p) = d; bi(p) = i
        if (filled < t) filled += 1
      }
    }

    if (pruner == null) {
      var i = 0
      while (i < centroids.length) { score(i, centroids(i)); i += 1 }
    } else {
      val g = pruner.supers.length
      val sdist = new Array[Double](g)
      val order = new Array[Integer](g)
      var gi = 0
      while (gi < g) {
        val s = pruner.supers(gi)
        val n = math.min(dim, s.length)
        var dot = 0.0
        var k = 0
        while (k < n) { dot += v(k) * s(k); k += 1 }
        // true squared distance to the group center, clamped (rounding
        // can drive tiny negatives for near-coincident vectors)
        sdist(gi) = math.max(0.0, pruner.superNormSq(gi) - 2.0 * dot + vNormSq)
        order(gi) = gi
        gi += 1
      }
      java.util.Arrays.sort(order, (a: Integer, b: Integer) =>
        java.lang.Double.compare(sdist(a), sdist(b)))
      var oi = 0
      while (oi < g) {
        val grp = order(oi).intValue
        val lb = math.sqrt(sdist(grp)) - pruner.radius(grp)
        // skip the whole group only when its best possible member is
        // strictly worse than the settled t-th best (true-dist² space).
        // The slack absorbs the bound's own rounding: sdist is a
        // cancellation-prone sum of ~dim products, so its absolute error
        // scales with dim · (‖s‖² + ‖v‖²), not with the bound's value —
        // a fixed relative slack under-covers exactly the high-dim /
        // large-magnitude case. 1e-12 ≈ machine-ε with headroom for the
        // dim-length accumulation; widening the slack only scores more
        // groups, it can never drop a true winner.
        val worstTrue = bd(t - 1) + vNormSq
        val slack = 1e-12 * dim *
          (pruner.superNormSq(grp) + vNormSq + math.abs(worstTrue) + 1.0)
        if (filled < t || lb <= 0.0 || lb * lb <= worstTrue + slack) {
          val ms = pruner.members(grp)
          var mi = 0
          while (mi < ms.length) { val i = ms(mi); score(i, centroids(i)); mi += 1 }
        }
        oi += 1
      }
    }
    java.util.Arrays.copyOf(bi, math.min(t, filled))
  }

  /** Column wrapper. */
  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    GraftColumnBridge.column(
      NearestCentroid(GraftColumnBridge.expression(vec), centroids))

  /** Column wrapper for the top-`t` probe-list kernel. */
  def nearestCentroidsTop(vec: Column, centroids: Array[Array[Double]], t: Int): Column =
    GraftColumnBridge.column(
      NearestCentroidsTop(GraftColumnBridge.expression(vec), centroids, t))
}
