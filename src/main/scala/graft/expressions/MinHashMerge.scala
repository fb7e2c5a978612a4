package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `minhash_merge(sig)` — native aggregate: element-wise minimum of
  * MinHash signature arrays (`array<bigint>`) across a group.
  *
  * Why this is the right merge: a MinHash lane is the minimum of
  * `xxhash64(seed_i, shingle)` over a document's shingle set, and
  * `min(min(A), min(B)) = min(A ∪ B)` lane by lane — so the element-wise
  * min of member signatures IS the signature of the union of their
  * shingle sets (parity-tested in DedupSpec). Cluster-level signatures
  * (e.g. after `Dedup.connectedComponents`) therefore come from ONE
  * group-by over already-computed signatures instead of re-tokenizing and
  * re-hashing concatenated member text.
  *
  * Scale shape: a `TypedImperativeAggregate` runs in ObjectHashAggregate
  * with map-side partial aggregation — each partition reduces its rows to
  * one k-lane buffer per group before the shuffle, so the exchange moves
  * O(groups · k · 8) bytes regardless of corpus size.
  *
  * Semantics: null rows and null lanes are identity elements (a null lane
  * leaves that lane's running min unchanged); empty arrays are skipped;
  * all non-empty inputs in a group must share one signature length k
  * (mixed lengths are a caller bug — fail loudly, not lane-truncate);
  * a group with no non-empty input evaluates to NULL.
  */
case class MinHashMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_merge requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_merge"

  /** Empty array = "no input seen yet" marker (distinct from any real
    * signature, which callers produce with k >= 1 lanes). */
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def mergeInto(buffer: Array[Long], arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    if (n == 0) return buffer
    if (buffer.length == 0) {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        out(i) = if (arr.isNullAt(i)) Long.MaxValue else arr.getLong(i)
        i += 1
      }
      return out
    }
    require(buffer.length == n,
      s"minhash_merge: signature length mismatch in group: ${buffer.length} vs $n " +
        "(all signatures in a group must use the same k)")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = arr.getLong(i)
        if (v < buffer(i)) buffer(i) = v
      }
      i += 1
    }
    buffer
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer else mergeInto(buffer, v.asInstanceOf[ArrayData])
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] =
    if (other.length == 0) buffer
    else mergeInto(buffer, new GenericArrayData(other))

  override def eval(buffer: Array[Long]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashMerge =
    copy(child = newChild)
}

object MinHashMerge {
  /** Column-API form: `df.groupBy(...).agg(minhashMerge(col("sig")))`. */
  def minhashMerge(sig: Column): Column =
    GraftColumnBridge.column(
      MinHashMerge(GraftColumnBridge.expression(sig)).toAggregateExpression())
}
