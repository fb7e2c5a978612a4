package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Event-stream operators: the same transformations run as batch over the
  * events table or as Structured Streaming over a `readStream` source —
  * the DataFrame graph is identical, only the source/sink differ.
  *
  * The reference has no streaming semantics at all (SURVEY.md §2.9 — its
  * Dask futures are batch task orchestration); this module is the
  * engine-extension for event-time processing at scale: watermarked
  * windowed aggregation (bounded state), session windows (built-in
  * session_window), and custom per-key state via flatMapGroupsWithState.
  */
object StreamingOps {

  /** Typed event row for stateful APIs. */
  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)

  /** A closed user session produced by the custom-state path. */
  final case class Session(
      user_id: Long, session_start_ms: Long, session_end_ms: Long,
      n_events: Long, total_value: Double)

  /** Internal per-user session accumulator (public: the state encoder's
    * generated code must construct it). */
  final case class SessionState(
      startMs: Long, lastMs: Long, n: Long, total: Double)

  /** Adapter from the testdata events table (epoch-nano long ts — see
    * RelationalQueries on TIMESTAMP(NANOS)) to a proper timestamp column.
    * Truncates ns → µs, Spark's native timestamp precision. Integer DIV on
    * purpose: `/` is double division and epoch nanos exceed double's 2^53
    * exact range, which rounds the microsecond. */
  def nanosToTimestamp(events: DataFrame): DataFrame =
    events.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

  /** Streaming deduplication with bounded state: duplicates (same `keys`)
    * arriving within the watermark horizon of each other collapse to the
    * first row; state for keys older than the watermark is dropped, so
    * memory is O(keys per horizon), not O(stream). The streaming twin of
    * the batch dropDuplicates in VariantOps.isolateEffects (D1) — batch
    * dedup is global, streaming dedup is exact within the horizon (a
    * duplicate arriving later than the watermark allows would re-emit,
    * which is the standard at-least-once ingest-dedup contract).
    *
    * `tsCol` must be the event-time column the watermark is defined on.
    * Works identically on a batch frame (watermark is a no-op there and
    * the dedup falls back to plain dropDuplicates semantics over keys). */
  def dedupWithinWatermark(df: DataFrame, keys: Seq[String], tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Streaming NEAR-duplicate ingest dedup: sketch each document with the
    * 64-bit SimHash kernel (a zero-shuffle map) and collapse sketch-equal
    * docs within the watermark horizon. Catches exact dups plus the
    * mutations that preserve the token stream's bit-majority — whitespace/
    * formatting edits, token reorderings — at 8 bytes of state per
    * distinct surviving sketch in the horizon. The streaming counterpart
    * of [[graft.operators.Dedup.simhashNearDupPairs]] at hamming 0: a
    * stream can't run candidate pair-joins (that needs the whole corpus),
    * so ingest-time near-dedup trades hamming tolerance for bounded
    * state, and the batch pair/cluster pass sweeps the remainder. */
  def nearDupDedupWithinWatermark(docs: DataFrame, textCol: String,
      tsCol: String, watermark: String = "1 hour"): DataFrame =
    docs.withColumn("__simhash", graft.expressions.SimHash64.simhash64(
        graft.functions.TextFunctions.tokenHashes(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__simhash")
      .drop("__simhash")

  /** Tumbling event-time window aggregation. On a stream the watermark
    * bounds state: windows older than it are finalized and dropped. */
  def windowedStats(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Session windows per user via the built-in session_window (gap-merged;
    * window end = last event + gap). Works identically batch/streaming. */
  def sessionWindowStats(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("total_value"))

  /** Stream-stream inner join within an event-time interval: each left
    * row matches right rows with the same `key` whose timestamp lies in
    * [left.ts - before, left.ts + after]. Both sides carry watermarks, so
    * each side's join state is bounded to the interval plus the watermark
    * delay — the canonical Structured Streaming two-stream join shape
    * (state for rows older than watermark + interval is evicted).
    * Column names must be disjoint apart from `key`; the interval bound
    * strings are SQL intervals ("1 hour"). Works identically in batch
    * (watermarks no-op, the range condition is a plain theta-join).
    *
    * `joinType` "inner" (default) or "left_outer": outer emits an
    * unmatched left row with null right columns once the watermark proves
    * no in-interval right row can still arrive — both watermarks plus the
    * time-range condition are exactly what Structured Streaming requires
    * to bound outer-join state. */
  def intervalJoinStreams(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      before: String = "1 hour", after: String = "1 hour",
      watermark: String = "1 hour", joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $before") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $after"),
      joinType)
      .drop(col(s"r.$key"))
  }

  /** Stream-static enrichment join: each event picks up the dimension
    * attributes for its key (user → account tier, document → source
    * domain). The static side is broadcast — Structured Streaming re-plans
    * the static subtree per microbatch, so with no shuffle on the stream
    * side there is no streaming state AT ALL: this is the cheapest join
    * shape available and the first one to reach for when the dimension
    * fits the broadcast budget. At 100 TB/day of events a MB-scale
    * dimension still joins map-side; a dimension past the broadcast
    * budget should instead pre-partition both sides on the key (or go
    * through [[graft.operators.BloomJoin]] batch-side).
    *
    * Stream-left joins must preserve the stream: inner and left only (a
    * right/full outer would need to prove a static row NEVER matches,
    * which an unbounded stream cannot). Identical graph runs in batch. */
  def enrichWithStatic(events: DataFrame, dim: DataFrame, keys: Seq[String],
      joinType: String = "left"): DataFrame = {
    require(Seq("inner", "left", "left_outer", "leftouter")
        .contains(joinType.toLowerCase),
      s"enrichWithStatic keeps the stream side: inner/left only, not $joinType")
    events.join(broadcast(dim), keys, joinType)
  }

  /** Custom sessionization with explicit state: emits a Session row when a
    * user's gap exceeds `gapMs` (or on event-time timeout for streams).
    * The shape to reach for when session logic outgrows session_window —
    * per-key state is a tiny fixed-size struct, so state size is O(active
    * users), not O(events).
    *
    * Batch and streaming take different physical paths on purpose:
    *  - batch: secondary sort (`repartition(user_id)` +
    *    `sortWithinPartitions(user_id, ts)`) + one `mapPartitions` fold
    *    with O(1) state — a hot user's whole history streams through,
    *    never materializing on-heap. (`groupByKey` can't do this: its
    *    lambda key is opaque to Catalyst, so a pre-sort is always
    *    destroyed by the grouping shuffle, and the per-group iterator
    *    would have to be sorted in memory.)
    *  - streaming: flatMapGroupsWithState with EventTimeTimeout; the
    *    in-memory sort there is bounded by one user's rows in ONE
    *    microbatch, not their history. */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] =
    if (events.isStreaming) sessionizeStream(events, gapMs)
    else sessionizeBatch(events, gapMs)

  private def flush(userId: Long, st: SessionState): Session =
    Session(userId, st.startMs, st.lastMs, st.n, st.total)

  /** Batch path: secondary-sort + streaming fold. Sessions can't span
    * partitions (hash-partitioned by user_id), and within a partition the
    * fold emits as it goes — heap is one SessionState regardless of how
    * many events the hottest user has. */
  private def sessionizeBatch(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"))
      .as[Event]
      .mapPartitions { rows =>
        new Iterator[Session] {
          private var pending: Session = null
          private var cur = 0L
          private var st: SessionState = null
          private def step(): Unit = {
            while (pending == null && rows.hasNext) {
              val e = rows.next()
              val t = e.ts.getTime
              if (st == null) {
                cur = e.user_id; st = SessionState(t, t, 1, e.value)
              } else if (e.user_id != cur) {
                pending = flush(cur, st)
                cur = e.user_id; st = SessionState(t, t, 1, e.value)
              } else if (t - st.lastMs >= gapMs) {
                // >= matches session_window: an event exactly gap after
                // the last one starts a new session (half-open windows)
                pending = flush(cur, st)
                st = SessionState(t, t, 1, e.value)
              } else {
                st = SessionState(st.startMs, t, st.n + 1, st.total + e.value)
              }
            }
            if (pending == null && !rows.hasNext && st != null) {
              pending = flush(cur, st) // tail session of the partition
              st = null
            }
          }
          def hasNext: Boolean = { step(); pending != null }
          def next(): Session = {
            step(); val out = pending; pending = null; out
          }
        }
      }
  }

  private def sessionizeStream(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._

    events
      .withWatermark("ts", "10 minutes") // required for EventTimeTimeout
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed the gap → close the session
            val out = state.getOption.map(flush(userId, _)).toList
            state.remove()
            out.iterator
          } else {
            // sort bound: one user's rows within one microbatch
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var st = state.getOption.orNull
            sorted.foreach { e =>
              val t = e.ts.getTime
              st = st match {
                case null => SessionState(t, t, 1, e.value)
                // >= matches session_window: an event exactly gap after the
                // last one starts a new session (windows are half-open)
                case s if t - s.lastMs >= gapMs =>
                  closed ::= flush(userId, s)
                  SessionState(t, t, 1, e.value)
                case s => SessionState(s.startMs, t, s.n + 1, s.total + e.value)
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(st.lastMs + gapMs)
            closed.reverseIterator
          }
      }
  }
}
