package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Batch 3 of the SURVEY.md §2 Part B surface: window functions,
  * exact deduplication, and time-windowed (tumbling / session)
  * aggregation — the streaming-shaped queries in their batch-equivalent
  * form (the streaming runtime itself reuses these via
  * `graft.streaming`).
  *
  * Scale notes: every window here partitions by `user_id` — one shuffle
  * on the partition key, then a per-partition sort; no global sort, no
  * driver materialization. Tumbling/session windows group on a derived
  * key (codegen'd expression), so they scale exactly like any hash
  * aggregation.
  */
object WindowQueries {

  // try_cast: a NaN/±Inf measure yields a NULL cents (the DuckDB
  // TRY_CAST semantic), never a job-killing ANSI cast error (r17 nasty
  // sweep: one NaN event crashed every window row)
  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).try_cast("long")

  /** Appended by r5: see q_cdc_state at the end of [[entries]]. */
  val entries: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q_window_rank — ranking window: row_number + rank over
    // (partition by user order by ts, event_id). event_id is the unique
    // tiebreak → fully deterministic. Keep each user's first 5 events.
    QueryDef(
      "q_window_rank",
      (s: SparkSession, dir: String) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .withColumn("rnk", rank().over(w))
          .filter(col("rn") <= 5)
          .select("user_id", "event_id", "event_type", "rn", "rnk")
          .orderBy("user_id", "rn")
      },
      Some("""SELECT user_id, event_id, event_type, rn, rnk FROM (
             |  SELECT user_id, event_id, event_type,
             |    CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
             |    CAST(RANK() OVER w AS INTEGER) AS rnk
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
             |) WHERE rn <= 5 ORDER BY user_id, rn""".stripMargin)),

    // ------------------------------------------------------------------
    // q_window_analytic — analytic window with an explicit frame: running
    // sum (exact cents) + lag over (partition by user order by ts,
    // event_id rows unbounded preceding..current row).
    QueryDef(
      "q_window_analytic",
      (s: SparkSession, dir: String) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, dir, "events")
          .withColumn("run_cents", sum(cents(col("value"))).over(wf))
          .withColumn("prev_event", lag(col("event_id"), 1).over(w))
          .select("user_id", "event_id", "run_cents", "prev_event")
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
             |  CAST(SUM(TRY_CAST(ROUND(value*100,0) AS BIGINT)) OVER (
             |    PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents,
             |  LAG(event_id, 1) OVER (
             |    PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_event
             |FROM events ORDER BY user_id, event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_dedup_exact ★ — exact deduplication with a deterministic survivor
    // rule: keep the FIRST event (by ts, event_id) per
    // (user_id, event_type, value) key, then aggregate. This is
    // `dropDuplicates` with a defined winner — the form that stays
    // correct under any partitioning (dropDuplicates itself keeps an
    // arbitrary row). One shuffle on the dedup key.
    QueryDef(
      "q_dedup_exact",
      (s: SparkSession, dir: String) => {
        val w = Window.partitionBy("user_id", "event_type", "value")
          .orderBy(col("ts"), col("event_id"))
        Tables(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_distinct_rows"),
            sum(cents(col("value"))).as("sum_cents"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n_distinct_rows,
             |  CAST(SUM(TRY_CAST(ROUND(value*100,0) AS BIGINT)) AS BIGINT) AS sum_cents
             |FROM (
             |  SELECT *, ROW_NUMBER() OVER (
             |    PARTITION BY user_id, event_type, value
             |    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
             |  FROM events
             |) WHERE rn = 1 GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q_tumbling_window — 1-hour tumbling window aggregation
    // (`window(ts, '1 hour')`). Batch-equivalent of the streaming
    // windowed agg; epoch-aligned, so DuckDB's date_trunc('hour')
    // produces the identical bucket start.
    QueryDef(
      "q_tumbling_window",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_cents"))
          .select(col("window.start").as("win_start"), col("event_type"),
            col("n"), col("sum_cents"))
          .orderBy("win_start", "event_type"),
      Some("""SELECT CAST(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS win_start,
             |  event_type, COUNT(*) AS n,
             |  CAST(SUM(TRY_CAST(ROUND(value*100,0) AS BIGINT)) AS BIGINT) AS sum_cents
             |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q_session_gap — session windows with a 10-minute inactivity gap per
    // user (`session_window(ts, '10 minutes')` batch form). Oracle is the
    // classic gap-island rewrite: a new session starts when
    // ts - lag(ts) >= gap; session id = running count of starts.
    QueryDef(
      "q_session_gap",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "events")
          .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_cents"))
          .select(col("session_window.start").as("sess_start"), col("user_id"),
            col("n"), col("sum_cents"))
          .orderBy("user_id", "sess_start"),
      Some("""WITH marked AS (
             |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             |    TRY_CAST(ROUND(value*100,0) AS BIGINT) AS cents,
             |    CASE WHEN CAST(ts AS TIMESTAMP)
             |           - LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))
             |           >= INTERVAL 10 MINUTE OR
             |         LAG(ts) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) IS NULL
             |    THEN 1 ELSE 0 END AS is_start
             |  FROM events),
             |sess AS (
             |  SELECT *, SUM(is_start) OVER (
             |    PARTITION BY user_id ORDER BY ts
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM marked)
             |SELECT MIN(ts) AS sess_start, user_id, COUNT(*) AS n,
             |  CAST(SUM(cents) AS BIGINT) AS sum_cents
             |FROM sess GROUP BY user_id, sid ORDER BY user_id, sess_start""".stripMargin)),

    // ------------------------------------------------------------------
    // q_cdc_state ★ (new r5) — CDC changelog compaction (the MERGE
    // INTO / upsert kernel): the events stream read as a change log
    // keyed by user_id — every event upserts the user's state, an
    // 'error' event is a TOMBSTONE (deletes the key) — compacted to
    // current state: last writer wins by (ts, event_id), tombstoned
    // keys absent from the output. This is the "read the changelog,
    // produce the table" job every lakehouse runs (and the batch twin
    // of a streaming state store). Distinct from q_dedup_exact, which
    // keeps a FIRST deterministic survivor and has no delete
    // semantics. Plan: ONE shuffle on the key + per-key sort (the
    // window), filter to rn = 1 — at 100 TB this is the standard
    // changelog-compaction shape, and the (ts, event_id) total order
    // makes replays idempotent.
    QueryDef(
      "q_cdc_state",
      (s: SparkSession, dir: String) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
        Tables(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1 && col("event_type") =!= "error")
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("event_type").as("last_type"),
            cents(col("value")).as("last_cents"))
          .orderBy("user_id")
      },
      Some("""WITH ranked AS (
             |  SELECT user_id, event_id, event_type,
             |    TRY_CAST(ROUND(value*100,0) AS BIGINT) AS cents,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
             |  FROM events)
             |SELECT user_id, event_id AS last_event_id,
             |  event_type AS last_type, cents AS last_cents
             |FROM ranked WHERE rn = 1 AND event_type != 'error'
             |ORDER BY user_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_rolling_distinct ★ (new r5) — sliding-window DISTINCT count:
    // per hour, how many distinct users were active in the trailing 24
    // hours (the DAU/WAU rolling-engagement kernel). Distinct-over-a-
    // sliding-window does NOT decompose into window-function frames
    // (count(distinct) is unsupported over RANGE frames in both
    // engines, and a per-window re-scan is quadratic), so the scalable
    // shape is contribution-explode: compress the corpus to distinct
    // (hour, user) pairs first — one shuffle, corpus → activity-grid-
    // sized — then explode each pair to the ≤24 window-ends it serves,
    // semi-join onto OBSERVED hours (broadcast, bounded by the time
    // span), and distinct-count per window end. The ×24 row dilation is
    // the price of exactness and scales with the GRID, not the corpus;
    // at 100 TB the same plan holds (pairs ≪ events), or swap the final
    // distinct for an HLL merge (q_approx_distinct's play) when even
    // the grid is too hot. 720 window ends, counts 19–143 at sf0.01 —
    // fully live ramp-up and decay.
    QueryDef(
      "q_rolling_distinct",
      (s: SparkSession, dir: String) => {
        val hu = Tables(s, dir, "events")
          .select(date_trunc("hour", col("ts")).as("h"), col("user_id"))
          .distinct()
        val hours = hu.select(col("h")).distinct()
        hu.select(col("user_id"),
            explode(sequence(col("h"), col("h") + expr("interval 23 hours"),
              expr("interval 1 hour"))).as("h"))
          .join(broadcast(hours), "h")
          .distinct()
          .groupBy("h").agg(count(lit(1)).as("n_users_24h"))
          .orderBy("h")
      },
      Some("""WITH hu AS (
             |  SELECT DISTINCT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             |    user_id
             |  FROM events),
             |hours AS (SELECT DISTINCT h FROM hu),
             |w AS (
             |  SELECT DISTINCT hours.h AS h, hu.user_id
             |  FROM hu JOIN hours
             |    ON hu.h BETWEEN hours.h - INTERVAL 23 HOUR AND hours.h)
             |SELECT h, COUNT(*) AS n_users_24h
             |FROM w GROUP BY h ORDER BY h""".stripMargin)),

    // ------------------------------------------------------------------
    // q_scd2 ★ (new r5) — SCD Type-2 history build: the events stream
    // read as an attribute changelog (each user's current state =
    // event_type), materialized as VERSIONED VALIDITY INTERVALS — one
    // row per state RUN with [valid_from, valid_to) bounds, version
    // number, and an is_current flag (open interval). This is the other
    // half of the MERGE family: q_cdc_state compacts the log to the
    // current snapshot; SCD2 keeps the full history a point-in-time
    // join ("what was the user's state when this order shipped?") needs.
    // Kernel: change detection (lag over the per-key total order — a
    // run OPENS where the state differs from its predecessor) + interval
    // assembly (lead over the surviving change rows closes each run with
    // its successor's start). Plan: ONE shuffle on user_id; both windows
    // and the change filter share that partitioning, so the second
    // window re-sorts a strictly smaller per-key slice without another
    // exchange. Output is run-count-sized (≤ corpus, typically ≪ after
    // compression); at 100 TB this is the standard dimension-history
    // build and replays are idempotent on the (ts, event_id) total order.
    QueryDef(
      "q_scd2",
      (s: SparkSession, dir: String) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables(s, dir, "events")
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
          .withColumn("version", row_number().over(w))
          .withColumn("valid_to", lead(col("ts"), 1).over(w))
          .select(col("user_id"), col("version"),
            col("event_type").as("state"), col("ts").as("valid_from"),
            col("valid_to"),
            col("valid_to").isNull.cast("int").as("is_current"))
          .orderBy("user_id", "version")
      },
      Some("""WITH ordered AS (
             |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             |    LAG(event_type) OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
             |  FROM events),
             |chg AS (
             |  SELECT user_id, event_id, event_type, ts FROM ordered
             |  WHERE prev_type IS NULL OR prev_type != event_type)
             |SELECT user_id,
             |  CAST(row_number() OVER w AS INTEGER) AS version,
             |  event_type AS state, ts AS valid_from,
             |  LEAD(ts) OVER w AS valid_to,
             |  CAST(CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END
             |    AS INTEGER) AS is_current
             |FROM chg
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY user_id, version""".stripMargin)),

    // ------------------------------------------------------------------
    // q_lag_features ★ (new r5) — per-event TRAILING features: time
    // since the user's previous event (micros; −1 for their first) and
    // how many events they fired in the trailing hour EXCLUDING now —
    // the online-feature materialization every real-time model consumes
    // (rate limiting, fraud velocity, session features) computed the
    // batch way: one user_id shuffle, then a lag window and an
    // event-time RANGE frame sharing that partitioning (the q_scd2
    // one-shuffle argument; per-user frames bounded by per-user
    // activity, never corpus-wide). Event-time micros are exact longs
    // end-to-end — no float time arithmetic — and the RANGE frame is
    // [-3600s, -1µs] so "now" never counts itself (the off-by-one that
    // silently leaks the label into a feature). Output is corpus-sized
    // BY DESIGN: this query materializes a feature column, not a
    // summary (same class as q_scan_project / q_string_date_math);
    // declared output keeps the 3 feature columns + keys.
    QueryDef(
      "q_lag_features",
      (s: SparkSession, dir: String) => {
        val w = Window.partitionBy("user_id").orderBy(col("tsm"), col("event_id"))
        val wr = Window.partitionBy("user_id").orderBy(col("tsm"))
          .rangeBetween(-3600L * 1000000L, -1L)
        Tables(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("tsm"))
          .withColumn("prev", lag("tsm", 1).over(w))
          .select(col("event_id"), col("user_id"),
            coalesce(col("tsm") - col("prev"), lit(-1L)).as("since_prev_us"),
            count(lit(1)).over(wr).as("n_prev_1h"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsm
             |  FROM events),
             |f AS (
             |  SELECT event_id, user_id,
             |    COALESCE(tsm - lag(tsm) OVER
             |      (PARTITION BY user_id ORDER BY tsm, event_id), -1)
             |      AS since_prev_us,
             |    COUNT(*) OVER (PARTITION BY user_id ORDER BY tsm
             |      RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING)
             |      AS n_prev_1h
             |  FROM e)
             |SELECT event_id, user_id, CAST(since_prev_us AS BIGINT) AS since_prev_us,
             |  CAST(n_prev_1h AS BIGINT) AS n_prev_1h
             |FROM f ORDER BY event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_streaks ★ (new r5) — gaps-and-islands: each user's LONGEST run
    // of consecutive active days (and how many distinct islands their
    // activity splits into) — the engagement-streak feature and the
    // canonical island-detection kernel (the same rewrite finds
    // contiguous id ranges for file-manifest compaction). Islands via
    // the classic constant-difference trick: on the per-user DISTINCT
    // day grid, epoch_day − row_number is CONSTANT exactly within a
    // consecutive run, so grouping on that anchor materializes islands
    // without any self-join or iteration. Plan: corpus → distinct
    // (user, day) compression first (one shuffle, grid-sized output ≪
    // corpus), then a per-user window and two grid-sized aggs — at
    // 100 TB everything after the compression runs on the activity
    // grid, bounded by users × span-days.
    QueryDef(
      "q_streaks",
      (s: SparkSession, dir: String) => {
        val w = Window.partitionBy("user_id").orderBy("d")
        val days = Tables(s, dir, "events")
          .select(col("user_id"),
            datediff(to_date(col("ts")), lit("1970-01-01")).as("d"))
          .distinct()
        days
          .withColumn("anchor", col("d") - row_number().over(w))
          .groupBy("user_id", "anchor")
          .agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(max("len").as("longest_streak"),
            count(lit(1)).as("n_islands"), sum("len").as("active_days"))
          .orderBy("user_id")
      },
      Some("""WITH days AS (
             |  SELECT DISTINCT user_id,
             |    CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01' AS d
             |  FROM events),
             |isl AS (
             |  SELECT user_id,
             |    d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS anchor
             |  FROM days),
             |runs AS (
             |  SELECT user_id, anchor, COUNT(*) AS len
             |  FROM isl GROUP BY 1, 2)
             |SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak,
             |  COUNT(*) AS n_islands, CAST(SUM(len) AS BIGINT) AS active_days
             |FROM runs GROUP BY 1 ORDER BY user_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_window_dist ★ (new r5) — the rank-DISTRIBUTION analytics:
    // ntile(4) / percent_rank / cume_dist per event type over (value,
    // event_id) — quartile assignment and within-group percentile
    // position, the score-normalization shape (quality-score →
    // percentile) pipelines apply before thresholding. ntile needs a
    // TOTAL order (bucket boundaries are positional): event_id breaks
    // value ties. The two double outputs are exact cross-engine:
    // percent_rank = (rank−1)/(N−1) and cume_dist = peers≤/N divide
    // the same integers in IEEE 754 in both engines — bit-identical,
    // no tolerance needed (same argument as the e2/e4 discipline,
    // just with exactly-representable division instead).
    QueryDef(
      "q_window_dist",
      (s: SparkSession, dir: String) => {
        val w = Window.partitionBy("event_type")
          .orderBy(cents(col("value")), col("event_id"))
        Tables(s, dir, "events")
          .select(col("event_type"), col("event_id"),
            cents(col("value")).as("v_cents"),
            ntile(4).over(w).cast("long").as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"))
          .orderBy("event_type", "event_id")
      },
      Some("""SELECT event_type, event_id,
             |  TRY_CAST(ROUND(value*100,0) AS BIGINT) AS v_cents,
             |  NTILE(4) OVER w AS quartile,
             |  PERCENT_RANK() OVER w AS pct_rank,
             |  CUME_DIST() OVER w AS cume
             |FROM events
             |WINDOW w AS (PARTITION BY event_type
             |  ORDER BY TRY_CAST(ROUND(value*100,0) AS BIGINT) NULLS FIRST,
             |    event_id)
             |ORDER BY event_type, event_id""".stripMargin)),
             // NULLS FIRST in the window order: Spark ranks a NULL
             // cents (NaN measure) first ASC, DuckDB last (r17 sweep)

    // ------------------------------------------------------------------
    // q_sliding_window ★ (new r5) — SLIDING (hopping) windows: 1-hour
    // windows every 30 minutes (`window(ts, '1h', '30m')`), the one
    // time-window mode the surface lacked (tumbling = q_tumbling_window,
    // session = q_session_gap). Each event lands in exactly
    // len/slide = 2 windows — Spark materializes that via an explode of
    // the per-row window list BEFORE the hash agg (so shuffle volume is
    // 2×, the honest cost of overlap; the agg itself stays map-side
    // combined). Epoch-aligned starts, so the oracle reproduces the
    // window set with time_bucket over both 30-minute phases and an
    // unnest. Exact e2 sums as always.
    QueryDef(
      "q_sliding_window",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_cents"))
          .select(col("window.start").as("win_start"), col("event_type"),
            col("n"), col("sum_cents"))
          .orderBy("win_start", "event_type"),
      Some("""WITH e AS (
             |  SELECT CAST(ts AS TIMESTAMP) AS ts, event_type,
             |    TRY_CAST(ROUND(value*100, 0) AS BIGINT) AS cents
             |  FROM events),
             |x AS (
             |  SELECT unnest([
             |      CAST(time_bucket(INTERVAL 30 MINUTE, ts) AS TIMESTAMP),
             |      CAST(time_bucket(INTERVAL 30 MINUTE, ts) AS TIMESTAMP)
             |        - INTERVAL 30 MINUTE]) AS win_start,
             |    event_type, cents
             |  FROM e)
             |SELECT win_start, event_type, COUNT(*) AS n,
             |  CAST(SUM(cents) AS BIGINT) AS sum_cents
             |FROM x GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin))
  )
}
