package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming operators over an event stream — the runtime the
  * reference's pom declared but never built (`spark-streaming` at
  * `pom.xml:50-54`, unused; SURVEY.md §1.3). Batch-equivalent forms of
  * these ship as `q_tumbling_window` / `q_session_gap`; these are the
  * genuinely streaming forms with watermarks and custom state.
  *
  * Scale notes: both operators shuffle once on their grouping key;
  * state is bounded by the watermark (tumbling) or the explicit
  * timeout (sessions) — without those bounds a 100 TB/day stream grows
  * state forever.
  */
object StreamOps {

  /** Watermarked tumbling-window counts/sums per event type: late rows
    * beyond `lateness` are dropped and their windows finalized —
    * append-mode emits each window exactly once when the watermark
    * passes it.
    */
  def tumblingCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup — the streaming form of `q_dedup_exact`
    * (first occurrence of each key survives, duplicates dropped).
    * `dropDuplicatesWithinWatermark` keys the state on `keys` but
    * EXPIRES each entry once the watermark passes its event time plus
    * `lateness`: on an unbounded stream the dedup state is bounded by
    * the duplicate-arrival horizon instead of growing with every key
    * ever seen — the only shape that survives a 100 TB/day stream
    * (plain `dropDuplicates` on a stream retains all keys forever).
    * One shuffle on the key columns.
    */
  def dedupStream(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String = "ts",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-stream interval join — the attribution topology (left =
    * trigger stream, right = conversion stream, match when the right
    * event lands within [leftTs, leftTs + window] for the same key).
    * The equality key + time-range condition + both-side watermarks are
    * exactly what lets Structured Streaming EVICT join state (left rows
    * once the watermark passes leftTs + window, right rows once it
    * passes rightTs) — the only stream-stream join shape that survives
    * an unbounded stream; without the range bound Spark refuses the
    * append-mode plan.
    *
    * `joinType` "inner": emissions are watermark-independent (matches
    * emit as both sides arrive). "leftOuter": the semantically hard
    * half — a null-padded left row is emitted by the WATERMARK, not by
    * data: only when the watermark passes leftTs + window (state
    * eviction time) is "no conversion" final, so unmatched rows appear
    * one watermark-advance after their window closes, and the open
    * tail (leftTs + window ≥ watermark) is never emitted in a bounded
    * drain. Both behaviors pinned in StreamOpsSpec with controlled
    * multi-batch arrival.
    *
    * Column names must be disjoint across sides ([leftKey, leftTs] vs
    * [rightKey, rightTs]); the condition is built on the named columns
    * so callers keep their own payload columns.
    */
  def intervalJoin(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      window: String = "30 minutes",
      lateness: String = "10 minutes",
      joinType: String = "inner"): DataFrame =
    left.withWatermark(leftTs, lateness)
      .join(right.withWatermark(rightTs, lateness),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $window"),
        joinType)

  /** One user session: contiguous activity with < `gap` between events
    * (same semantics as the batch `q_session_gap` island query).
    */
  final case class Session(
      userId: Long, start: java.sql.Timestamp, end: java.sql.Timestamp,
      events: Long, totalValue: Double)

  /** Open-session state (public: the state encoder's generated code
    * must construct it). Times are epoch MICROS — `Timestamp.getTime`
    * is millis and silently drops the sub-millisecond part of a
    * parquet micros timestamp (caught by StreamingQueriesSpec when the
    * emitted session bounds hash-diverged from the oracle's).
    */
  final case class SessionState(
      start: Long, last: Long, events: Long, totalValue: Double)

  private def micros(t: java.sql.Timestamp): Long =
    // floorDiv, not /: for pre-epoch timestamps getTime is negative and
    // truncation-toward-zero rounds the seconds part the wrong way —
    // the nanos (always non-negative) then push the result a full
    // second high, breaking the micros/fromMicros round-trip (advisor
    // finding r5; fromMicros already floors).
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Custom-state sessionization via `flatMapGroupsWithState`: per-user
    * state holds the open session; a processing-time timeout closes and
    * emits it when the user goes quiet. Demonstrates the
    * `KeyValueGroupedDataset` stateful API the built-in
    * `session_window` can't express (per-session running aggregates
    * emitted exactly at close).
    *
    * `timeout` is injectable: production uses the default
    * ProcessingTimeTimeout; specs pass NoTimeout because wall-clock
    * timeouts are non-deterministic under test (and with a 0-interval
    * trigger the timeout-check batches never quiesce for
    * `processAllAvailable`).
    */
  def sessionize(
      events: Dataset[(Long, java.sql.Timestamp, Double)],
      gapMs: Long,
      timeoutMs: Long = 30000,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout()): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val closed = state.getOption.map(s =>
              Session(userId, fromMicros(s.start),
                fromMicros(s.last), s.events, s.totalValue))
            state.remove()
            closed.iterator
          } else {
            val gapUs = gapMs * 1000L
            val sorted = rows.toSeq.sortBy(r => micros(r._2))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { case (_, ts, v) =>
              val t = micros(ts)
              cur match {
                case Some(s) if t - s.last < gapUs =>
                  cur = Some(s.copy(last = t, events = s.events + 1,
                    totalValue = s.totalValue + v))
                case Some(s) =>
                  closed += Session(userId, fromMicros(s.start),
                    fromMicros(s.last), s.events, s.totalValue)
                  cur = Some(SessionState(t, t, 1, v))
                case None =>
                  cur = Some(SessionState(t, t, 1, v))
              }
            }
            cur.foreach(state.update)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout())
              state.setTimeoutDuration(timeoutMs)
            // Event-time timeout: the session dies when the WATERMARK
            // passes its gap horizon (last + gap) — the instant no
            // in-order event can extend it. setTimeoutTimestamp is
            // MILLIS event time; fires on the first batch whose
            // watermark exceeds it (including the AvailableNow no-data
            // flush batch). Requires a withWatermark on the input.
            if (timeout == GroupStateTimeout.EventTimeTimeout())
              cur.foreach(s2 => state.setTimeoutTimestamp(
                Math.floorDiv(s2.last, 1000L) + gapMs))
            closed.result().iterator
          }
      }
  }
}
