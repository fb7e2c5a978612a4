package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate: membership probe of a torrent-broadcast
  * [[org.apache.spark.util.sketch.BloomFilter]] (the public sketch that
  * `Dataset.stat.bloomFilter` builds).
  *
  * Why a custom Expression (SURVEY.md §7.4 ladder): Spark's own
  * BloomFilterMightContain is `private[sql]` and only reachable through the
  * runtime-filter optimizer rule; the lambda-free alternative — a Scala UDF
  * closing over the broadcast — leaves whole-stage codegen and boxes every
  * key. This kernel keeps the probe inside codegen: the filter is
  * materialized once per generated class from the broadcast (executors pull
  * it via torrent, not via task serialization), then probed per row on
  * primitive longs / UTF8String bytes.
  *
  * Probe semantics match what `stat.bloomFilter` inserted: integral keys
  * were `putLong`, strings `putString` (UTF-8 bytes). False positives are
  * possible by construction; false negatives are not — callers must only
  * use this as a pre-filter in front of an exact join (see
  * [[graft.operators.BloomJoin]]). A null key yields null.
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires bigint, int, or string keys, got ${other.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType => bloom.value.mightContainLong(input.asInstanceOf[Long])
    case IntegerType => bloom.value.mightContainLong(input.asInstanceOf[Int].toLong)
    case StringType =>
      bloom.value.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[Broadcast[_]].getName
    val bfCls = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bloom, bcCls)
    // one torrent fetch per generated instance, then per-row primitive probes
    val bfVar = ctx.addMutableState(bfCls, "bloomFilter",
      v => s"$v = ($bfCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case LongType => s"${ev.value} = $bfVar.mightContainLong($c);"
      case IntegerType => s"${ev.value} = $bfVar.mightContainLong((long) $c);"
      case StringType => s"${ev.value} = $bfVar.mightContainBinary($c.getBytes());"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
