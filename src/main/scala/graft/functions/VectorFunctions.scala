package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dense-vector column functions over ArrayType(FloatType) embeddings.
  *
  * Pure Catalyst higher-order functions (`zip_with`/`aggregate`) — codegen'd
  * and shuffle-free per row. Accumulation is sequential within a row
  * (deterministic left fold in double precision), so results are exactly
  * reproducible run-to-run and portable to any engine that folds
  * left-to-right in doubles.
  */
object VectorFunctions {

  /** Dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe on zero vectors (returns null rather than
    * raising under ANSI division semantics). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast(DoubleType) - y.cast(DoubleType)
      d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** Sign bit of a deterministic pseudo-random hyperplane projection: the
    * hyperplane for (`seed`, dimension i) has component
    * hash(seed, i) mapped to [-1, 1]; returns the projection's sign as 0/1.
    * Used for LSH bucketing of embeddings — no stored model, any executor
    * can recompute the plane from (seed, i) alone (scale path: nothing to
    * broadcast). */
  def hyperplaneSignBit(vec: Column, seed: Int): Column = {
    val proj = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, i) => x.cast(DoubleType) *
          // xxhash64 → [-1,1): scale by 2^-63
          (xxhash64(lit(seed), i).cast(DoubleType) * lit(1.0843961455707541e-19))),
      lit(0.0), (acc, v) => acc + v)
    when(proj >= 0, lit(1)).otherwise(lit(0))
  }

  /** `nbits`-bit LSH signature of an embedding as a long (random-hyperplane
    * signs, seeds 0..nbits-1). Vectors within a small angle agree on most
    * bits; bucketing on the signature (or bands of it) yields ANN candidate
    * sets. */
  def lshSignature(vec: Column, nbits: Int): Column =
    (0 until nbits).map(i =>
      hyperplaneSignBit(vec, i).cast(LongType) * lit(1L << i))
      .reduce(_ + _)
}
