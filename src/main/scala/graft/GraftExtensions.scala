package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{CosineSim, FreqSketch, HyperplaneBuckets, MinHashMerge, MinHashSignature, ShingleHashes, SimHash64, TokenHashes, TopKPairs}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions with the SQL function registry, so SQL-only users (and
  * thrift/connect clients) reach them without the Scala API:
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ...
  *   spark.sql("SELECT simhash64(transform(split(text, ' '), t -> xxhash64(t)))")
  *
  * The config route is the cluster-manager-friendly seam (applies at
  * session build). `GraftExtensions.register(spark)` does the same for an
  * already-running session (notebooks, tests). Registration is
  * idempotent — re-registering replaces the same entry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def arity(name: String, children: Seq[Expression], n: Int): Unit =
    require(children.length == n,
      s"$name takes exactly $n argument(s), got ${children.length}")

  /** Extract a compile-time boolean parameter, same contract as
    * [[intArg]]. */
  private def boolArg(name: String, e: Expression): Boolean = {
    require(e.foldable,
      s"$name expects a literal boolean parameter, got: $e")
    val v = e.eval()
    require(v != null, s"$name literal boolean parameter must not be NULL")
    v match {
      case b: java.lang.Boolean => b.booleanValue
      case other => throw new IllegalArgumentException(
        s"$name literal boolean parameter has type ${other.getClass.getSimpleName}")
    }
  }

  /** Extract a compile-time int parameter (k, n, bands...) from a SQL
    * argument — any FOLDABLE integral expression works: `3`, `3L`,
    * `CAST(3 AS INT)`, `1 + 2`; non-constant expressions (`rand()`) and
    * non-integral types are rejected with a clear error. */
  private def intArg(name: String, e: Expression): Int = {
    require(e.foldable,
      s"$name expects a literal integer parameter (a foldable int expression), got: $e")
    val v = e.eval()
    require(v != null, s"$name literal integer parameter must not be NULL")
    v match {
      case i: java.lang.Integer => i.intValue
      case b: java.lang.Byte    => b.intValue
      case s: java.lang.Short   => s.intValue
      case l: java.lang.Long =>
        require(l >= Int.MinValue && l <= Int.MaxValue,
          s"$name literal integer parameter out of int range: $l")
        l.intValue
      case _ => throw new IllegalArgumentException(
        s"$name expects a literal integer parameter, got ${e.dataType.simpleString}: $e")
    }
  }

  private def info(clazz: Class[_], name: String, usage: String, example: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, example)

  /** The registration triples, shared by both injection routes. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("simhash64"),
      info(classOf[SimHash64], "simhash64",
        "simhash64(array<bigint>) - 64-bit SimHash of an array of 64-bit " +
          "token hashes: bit b of the result is set iff the majority of " +
          "elements set bit b (ties clear; nulls ignored; empty -> 0).",
        "SELECT simhash64(array(xxhash64('a'), xxhash64('b')))"),
      (c: Seq[Expression]) => { arity("simhash64", c, 1); SimHash64(c.head) }),

    (new FunctionIdentifier("token_hashes"),
      info(classOf[TokenHashes], "token_hashes",
        "token_hashes(string) - xxhash64 of each whitespace-separated " +
          "token (bit-identical to transform(tokens, xxhash64)).",
        "SELECT token_hashes('a b c')"),
      (c: Seq[Expression]) => { arity("token_hashes", c, 1); TokenHashes(c.head) }),

    (new FunctionIdentifier("shingle_hashes"),
      info(classOf[ShingleHashes], "shingle_hashes",
        "shingle_hashes(array<bigint>, n) - distinct n-gram shingle " +
          "hashes of a token-hash array; <= n tokens -> one whole-array hash.",
        "SELECT shingle_hashes(token_hashes('a b c d'), 3)"),
      (c: Seq[Expression]) => { arity("shingle_hashes", c, 2)
        ShingleHashes(c.head, intArg("shingle_hashes", c(1))) }),

    (new FunctionIdentifier("minhash_signature"),
      info(classOf[MinHashSignature], "minhash_signature",
        "minhash_signature(array<bigint>, k) - k-minima MinHash signature " +
          "over shingle hashes (seeds 0..k-1).",
        "SELECT minhash_signature(shingle_hashes(token_hashes('a b c d'), 3), 16)"),
      (c: Seq[Expression]) => { arity("minhash_signature", c, 2)
        MinHashSignature(c.head, intArg("minhash_signature", c(1))) }),

    (new FunctionIdentifier("minhash_merge"),
      info(classOf[MinHashMerge], "minhash_merge",
        "minhash_merge(array<bigint>) - AGGREGATE: element-wise min of " +
          "MinHash signatures across the group = the signature of the " +
          "union of the members' shingle sets. All non-empty inputs in a " +
          "group must share one length k; null lanes are identity; a " +
          "group with no non-empty input yields NULL.",
        "SELECT minhash_merge(minhash_signature(shingle_hashes(token_hashes(t), 3), 16)) FROM docs GROUP BY cluster"),
      (c: Seq[Expression]) => { arity("minhash_merge", c, 1); MinHashMerge(c.head) }),

    (new FunctionIdentifier("cosine_sim"),
      info(classOf[CosineSim], "cosine_sim",
        "cosine_sim(array<float|double>, array<float|double>) - cosine " +
          "similarity as a single codegen'd double loop; null on null " +
          "element, length mismatch, or zero norm (matches the " +
          "aggregate/zip_with double-fold formulation bit-for-bit).",
        "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 1.0D))"),
      (c: Seq[Expression]) => { arity("cosine_sim", c, 2)
        CosineSim(c.head, c(1)) }),

    (new FunctionIdentifier("freq_sketch"),
      info(classOf[FreqSketch], "freq_sketch",
        "freq_sketch(string, capacity) - AGGREGATE: Misra-Gries " +
          "heavy-hitters summary with at most `capacity` counters, as " +
          "map<string,bigint> term -> estimated count. Estimates " +
          "undercount by at most n/(capacity+1); capacity >= distinct " +
          "terms gives exact counts.",
        "SELECT freq_sketch(term, 64) FROM (SELECT explode(split(text, ' ')) AS term FROM docs)"),
      (c: Seq[Expression]) => { arity("freq_sketch", c, 2)
        FreqSketch(c.head, intArg("freq_sketch", c(1))) }),

    (new FunctionIdentifier("top_k_pairs"),
      info(classOf[TopKPairs], "top_k_pairs",
        "top_k_pairs(score double, id bigint, k, smallest boolean) - " +
          "AGGREGATE: the k best (score, id) pairs per group under the " +
          "total order (score asc|desc, id asc), best-first, as " +
          "array<struct<score,id>>. Map-side partial top-k — the " +
          "rank-window replacement whose shuffle is bounded at k rows " +
          "per group per partition.",
        "SELECT g, top_k_pairs(score, id, 10, false) FROM candidates GROUP BY g"),
      (c: Seq[Expression]) => { arity("top_k_pairs", c, 4)
        TopKPairs(c.head, c(1), intArg("top_k_pairs", c(2)),
          boolArg("top_k_pairs", c(3))) }),

    (new FunctionIdentifier("hyperplane_buckets"),
      info(classOf[HyperplaneBuckets], "hyperplane_buckets",
        "hyperplane_buckets(array<float|double>, bands, bitsPerBand) - " +
          "LSH band bucket keys from random-hyperplane sign bits.",
        "SELECT hyperplane_buckets(array(1.0D, 2.0D), 8, 8)"),
      (c: Seq[Expression]) => { arity("hyperplane_buckets", c, 3)
        HyperplaneBuckets(c.head, intArg("hyperplane_buckets", c(1)),
          intArg("hyperplane_buckets", c(2))) }))

  /** Register on a live session (the builder-config route only applies to
    * sessions built after the config is set). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      GraftColumnBridge.registerFunction(spark, ident, info, builder)
    }
}
