package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single latest right row
  * with rightTime ≤ leftTime within the same key group. Spark has no
  * native as-of join (SURVEY.md §2.7 lists it ABSENT in the reference
  * too); the scalable formulation is union + ordered window, NOT a range
  * self-join:
  *
  *   tag sides → unionByName → one shuffle+sort on (keys, time) →
  *   last(right-row-struct, ignoreNulls) over the ordered frame →
  *   keep left rows.
  *
  * One exchange and one sort regardless of how many right rows precede
  * each left row — the O(n·m) pairing a naive inequality join would do
  * never materializes. The matched right row travels as ONE struct, so a
  * null inside a right value column can never mix attributes of different
  * right rows. Ties (right and left at the same instant) resolve as "at
  * or before": the right row sorts first and is visible.
  */
object AsOfJoin {

  /** Left as-of join: every left row kept, `valueCols` (right-side
    * columns, names must not collide with left's) and `rightTimeAs` (the
    * matched right timestamp) appended — null when no right row precedes.
    * Inner semantics = `.filter(col(rightTimeAs).isNotNull)`. `keys` and
    * `timeCol` must exist on both sides with identical names. */
  def asofBackward(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], timeCol: String,
      valueCols: Seq[String], rightTimeAs: String = "asof_time"): DataFrame = {
    val leftCols = left.columns.toSeq
    require(valueCols.forall(!leftCols.contains(_)),
      s"valueCols must not collide with left columns: $valueCols vs $leftCols")

    val r1 = right.select((keys :+ timeCol).map(col) :+
      struct((timeCol +: valueCols).map(col): _*).as("__r"): _*)
      .withColumn("__is_left", lit(0))
    val rStructType = r1.schema("__r").dataType

    val l1 = left
      .withColumn("__is_left", lit(1))
      .withColumn("__r", lit(null).cast(rStructType))
    // right rows get every remaining left column as null; align order
    val r2 = leftCols.foldLeft(r1)((df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(l1.columns.map(col).toIndexedSeq: _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l1.unionByName(r2)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++
        (col(s"__r.$timeCol").as(rightTimeAs) +:
          valueCols.map(c => col(s"__r.$c").as(c))): _*)
  }

  /** Forward as-of join — the mirror: for each left row, the single
    * EARLIEST right row with rightTime ≥ leftTime in the key group. Same
    * one-shuffle union+window shape, with the frame flipped to
    * [current, unbounded following] and `first(ignoreNulls)` instead of
    * `last`. Tie order flips too: at equal instants the left row sorts
    * first so a same-instant right row is visible ("at or after"). */
  def asofForward(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], timeCol: String,
      valueCols: Seq[String], rightTimeAs: String = "asof_time"): DataFrame = {
    val leftCols = left.columns.toSeq
    require(valueCols.forall(!leftCols.contains(_)),
      s"valueCols must not collide with left columns: $valueCols vs $leftCols")

    val r1 = right.select((keys :+ timeCol).map(col) :+
      struct((timeCol +: valueCols).map(col): _*).as("__r"): _*)
      .withColumn("__is_left", lit(0))
    val rStructType = r1.schema("__r").dataType

    val l1 = left
      .withColumn("__is_left", lit(1))
      .withColumn("__r", lit(null).cast(rStructType))
    val r2 = leftCols.foldLeft(r1)((df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(l1.columns.map(col).toIndexedSeq: _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__is_left").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    l1.unionByName(r2)
      .withColumn("__r", first(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++
        (col(s"__r.$timeCol").as(rightTimeAs) +:
          valueCols.map(c => col(s"__r.$c").as(c))): _*)
  }
}
