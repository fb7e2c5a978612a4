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
    * raising under ANSI division semantics). Delegates to the native
    * codegen'd kernel — bit-identical to the declarative
    * `dot(a,b) / nullif(norm(a)·norm(b), 0)` folds (parity-locked in
    * SimilaritySpec), but one primitive loop instead of three interpreted
    * higher-order folds, which dominate pair-generation loops (semantic
    * dedup, ANN rerank). */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.CosineSim.cosineSim(a, b)

  /** The declarative higher-order-function formulation `cosine` replaces —
    * kept as the independent yardstick its parity spec compares against. */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast(DoubleType) - y.cast(DoubleType)
      d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** Deterministic pseudo-random hyperplane for (seed, dim): components in
    * [-1, 1) from a splitmix64 of (seed, i). Computed driver-side and
    * embedded as a plan literal — reproducible everywhere, nothing to
    * broadcast, and the projection compiles to a single zip_with fold with
    * no per-element hashing (measured ~2× vs hash-per-element). */
  def hyperplane(seed: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      var z = seed.toLong * 0x9E3779B97F4A7C15L + i.toLong + 1
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      (z ^ (z >>> 31)).toDouble * 1.0843961455707541e-19 // scale by 2^-63
    }

  /** Sign bit (0/1) of the projection of `vec` onto hyperplane `seed`. */
  def hyperplaneSignBit(vec: Column, seed: Int, dim: Int): Column = {
    val proj = aggregate(
      zip_with(vec, lit(hyperplane(seed, dim)), (x, u) => x.cast(DoubleType) * u),
      lit(0.0), (acc, v) => acc + v)
    when(proj >= 0, lit(1)).otherwise(lit(0))
  }

  /** `nbits`-bit LSH signature of an embedding as a long (random-hyperplane
    * signs, seeds 0..nbits-1). Vectors within a small angle agree on most
    * bits; bucketing on the signature (or bands of it) yields ANN candidate
    * sets. */
  def lshSignature(vec: Column, nbits: Int, dim: Int): Column =
    (0 until nbits).map(i =>
      hyperplaneSignBit(vec, i, dim).cast(LongType) * lit(1L << i))
      .reduce(_ + _)
}
