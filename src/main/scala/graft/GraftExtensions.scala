package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.SimHash64

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

  /** The registration triples, shared by both injection routes. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, null, "simhash64",
        "simhash64(array<bigint>) - 64-bit SimHash of an array of 64-bit " +
          "token hashes: bit b of the result is set iff the majority of " +
          "elements set bit b (ties clear; nulls ignored; empty -> 0).",
        "SELECT simhash64(array(xxhash64('a'), xxhash64('b')))"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"simhash64 takes exactly 1 argument, got ${children.length}")
        SimHash64(children.head)
      }))

  /** Register on a live session (the builder-config route only applies to
    * sessions built after the config is set). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      GraftColumnBridge.registerFunction(spark, ident, info, builder)
    }
}
