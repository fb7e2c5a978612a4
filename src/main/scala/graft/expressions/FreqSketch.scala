package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `freq_sketch(term, capacity)` — native aggregate: a Misra-Gries
  * heavy-hitters summary of a string column, at most `capacity` counters,
  * returned as `map<string,bigint>` of surviving terms → estimated counts.
  *
  * Guarantees (Misra-Gries 1982; merge rule from Agarwal et al., PODS
  * 2012 "Mergeable Summaries"), for n = total rows aggregated and
  * k = capacity, REGARDLESS of partitioning or merge order:
  *   - estimate ≤ true count (counters only grow on real occurrences);
  *   - true count − estimate ≤ n/(k+1);
  *   - hence every term with true count > n/(k+1) survives in the map.
  * With capacity ≥ the number of distinct terms no decrement ever fires
  * and the sketch degenerates to EXACT counts (the oracle-testable
  * regime); undersized capacities trade exactness for the fixed-size
  * bound above (gated by q_check_heavy_hitters).
  *
  * Scale shape: the buffer is O(capacity) regardless of input size, and
  * `TypedImperativeAggregate` runs in ObjectHashAggregate with map-side
  * partial aggregation — each partition reduces its token stream to one
  * ≤ capacity-entry map before the shuffle, so a corpus-wide top-terms
  * pass moves O(partitions · capacity) bytes where the exact groupBy
  * moves the whole vocabulary. This is the answer to "top terms over
  * 100 TB" when the vocabulary itself no longer fits a shuffle budget.
  *
  * Semantics: null terms are skipped; a group with no non-null input
  * evaluates to an empty map.
  */
case class FreqSketch(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1 && capacity <= (1 << 22),
    s"freq_sketch capacity must be in [1, ${1 << 22}]: $capacity")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_sketch requires a string term column, got ${other.catalogString}")
  }
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val term = v.toString
    buffer.get(term) match {
      case Some(c) => buffer.update(term, c + 1L)
      case None if buffer.size < capacity => buffer.update(term, 1L)
      case None =>
        // classic MG decrement epoch: the newcomer and one occurrence of
        // every resident are discarded together (k+1 distinct occurrences
        // per epoch → at most n/(k+1) epochs, which is the error bound)
        val dead = List.newBuilder[String]
        buffer.foreach { case (t, c) =>
          if (c == 1L) dead += t else buffer.update(t, c - 1L)
        }
        dead.result().foreach(buffer.remove)
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) =>
      buffer.update(t, buffer.getOrElse(t, 0L) + c)
    }
    if (buffer.size > capacity) {
      // subtract the (capacity+1)-th largest counter from everything and
      // drop the non-positive — the mergeable-summaries rule that keeps
      // the summed error within n/(k+1) across any merge tree
      val vals = buffer.values.toArray
      java.util.Arrays.sort(vals)
      val thresh = vals(vals.length - capacity - 1)
      val dead = List.newBuilder[String]
      buffer.foreach { case (t, c) =>
        if (c - thresh <= 0L) dead += t else buffer.update(t, c - thresh)
      }
      dead.result().foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    // emit in sorted term order so the map itself is deterministic, not
    // just its exploded form
    val terms = buffer.keysIterator.toArray
    scala.util.Sorting.quickSort(terms)
    new ArrayBasedMapData(
      new GenericArrayData(terms.map(t => UTF8String.fromString(t): Any)),
      new GenericArrayData(terms.map(t => buffer(t): Any)))
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (t, c) =>
      val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketch =
    copy(child = newChild)
}

object FreqSketch {
  /** Column-API form: `df.agg(freqSketch(col("term"), 1024))`. */
  def freqSketch(term: Column, capacity: Int): Column =
    GraftColumnBridge.column(
      FreqSketch(GraftColumnBridge.expression(term), capacity)
        .toAggregateExpression())
}
