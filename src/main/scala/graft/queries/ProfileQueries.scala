package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ExactMath

/** Batch 10 ★ (r5) — data-profiling operators over `events`: the
  * ANALYZE/data-quality leg every ingestion pipeline runs before
  * training jobs trust a new drop. Both queries are exact-integer and
  * oracle-checked; money-like doubles travel as cents (the `value`
  * column is 2-decimal with measured |round(v·100) − v·100| ≤ 3.6e-12,
  * the same engine-exact cast q_percentile proved out).
  */
object ProfileQueries {

  // try_cast: NaN/±Inf measures → NULL cents (DuckDB TRY_CAST
  // semantic), never an ANSI cast crash (r17 nasty sweep)
  private def cents: Column = round(col("value") * 100).try_cast("long")

  /** Closed-form OLS slope over rows of (event_type, day, y) — the
    * q_trend_ols kernel, public so the spec can prove the degenerate-
    * group guard (slope_den = 0 on a single-day type: Spark's
    * IntegralDivide yields null where DuckDB's `//` raises, so such
    * rows must never reach the divide in either engine).
    */
  def olsTrend(d: DataFrame): DataFrame = {
    val mn = d.agg(min("day").as("mnd"))
    d.join(broadcast(mn))
      .select(col("event_type"), col("y"),
        datediff(col("day"), col("mnd")).cast("long").as("x"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum("y").as("sum_y"),
        sum("x").as("sx"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n_days"), col("sum_y"),
        (col("n_days") * col("sxy") - col("sx") * col("sum_y")).as("slope_num"),
        (col("n_days") * col("sxx") - col("sx") * col("sx")).as("slope_den"),
        ExactMath.divTrunc(
          (col("n_days") * col("sxy") - col("sx") * col("sum_y")) * 1000000L,
          col("n_days") * col("sxx") - col("sx") * col("sx")).as("slope_e6"))
      .filter(col("slope_den") > 0L)
      .orderBy("event_type")
  }

  /** Two-proportion readout over a (arm, n, x) frame — the q_abtest
    * kernel, public so the spec can drive genuinely-different synthetic
    * cohorts and prove the significance flag fires (the fixture's A/A
    * split should — and does — stay at 0). The chi-square compare runs
    * in decimal(38,0): the squared term overflows 2^63 at realistic
    * cohort sizes.
    */
  def abTest(arms: DataFrame): DataFrame = {
    val a = arms.filter(col("arm") === 0L)
      .select(col("n").as("n1"), col("x").as("x1"))
    val b = arms.filter(col("arm") === 1L)
      .select(col("n").as("n2"), col("x").as("x2"))
    a.crossJoin(b)
      .select(col("n1"), col("x1"),
        ExactMath.divTrunc(col("x1") * 10000L, col("n1")).as("rate1_e4"),
        col("n2"), col("x2"),
        ExactMath.divTrunc(col("x2") * 10000L, col("n2")).as("rate2_e4"),
        (ExactMath.divTrunc(col("x2") * 10000L, col("n2")) -
          ExactMath.divTrunc(col("x1") * 10000L, col("n1"))).as("uplift_e4"),
        expr("""CAST(CASE WHEN x1 + x2 > 0 AND x1 + x2 < n1 + n2 AND
                |  100 * CAST(n1 + n2 AS DECIMAL(38,0))
                |    * CAST(x1 * (n2 - x2) - x2 * (n1 - x1) AS DECIMAL(38,0))
                |    * CAST(x1 * (n2 - x2) - x2 * (n1 - x1) AS DECIMAL(38,0))
                |  >= 384 * CAST(n1 AS DECIMAL(38,0)) * n2 * (x1 + x2)
                |    * (n1 + n2 - x1 - x2)
                |  THEN 1 ELSE 0 END AS INT)""".stripMargin).as("significant"))
  }

  /** Signed exact-integer correlation over a (d, series, x) frame — the
    * q_corr_matrix kernel, public so the spec can drive perfectly
    * correlated / anti-correlated synthetic series and pin the
    * endpoints (r²_e6 = ±1000000) and the degenerate-series NULL.
    * Signed r² instead of r: r = num/√(den1·den2) needs a square root,
    * but sign(r)·r² = sign(num)·num²/(den1·den2) is the same ORDERING
    * and stays rational — the no-libm move (cf. q_collocation_pmi's
    * log elision). num² ≤ (D²·X²)² demands wide arithmetic:
    * DECIMAL(38,0) here, HUGEINT in DuckDB — and because Spark's
    * decimal silently NULLs on overflow ~1.7× below HUGEINT's cap,
    * both engines carry an explicit symmetric |num| ≤ 3e15 domain
    * guard (→ NULL beyond it, same rows both sides; review fix r5),
    * still comfortably above any per-shard daily-count series (the
    * q_abtest bound argument).
    */
  def corrPairs(daily: DataFrame): DataFrame = {
    val pairs = daily.as("a").join(daily.as("b"), "d")
      .filter(col("a.series") < col("b.series"))
      .select(col("a.series").as("t1"), col("b.series").as("t2"),
        col("a.x").as("x"), col("b.x").as("y"))
    pairs.groupBy("t1", "t2")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("den1", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("den2", col("n") * col("syy") - col("sy") * col("sy"))
      .select(col("t1"), col("t2"), col("n").as("n_days"),
        // |num| ≤ 3e15 guard: num²·1e6 must stay under DECIMAL(38,0)'s
        // ~1e38 cap — Spark overflows to NULL silently ~1.7× EARLIER
        // than DuckDB's HUGEINT, so an explicit symmetric domain bound
        // keeps the engines agreeing everywhere instead of diverging in
        // the (1e38, 1.7e38) band (review fix r5)
        expr("""CASE WHEN den1 = 0 OR den2 = 0 OR abs(num) > 3000000000000000
                |THEN NULL ELSE
                |  (CASE WHEN num < 0 THEN -1 ELSE 1 END) *
                |  CAST((CAST(num AS DECIMAL(38,0)) * num * 1000000) div
                |       (CAST(den1 AS DECIMAL(38,0)) * den2) AS BIGINT)
                |END""".stripMargin).as("r2_e6"))
  }

  /** One FK-edge audit row — the q_fk_orphans kernel, public so the
    * spec can plant a corrupted child batch and prove the counter
    * fires (the fixture's all-zero orphans exercise only the ok path).
    */
  def fkEdge(name: String, child: DataFrame, key: String,
      parent: DataFrame, pkey: String): DataFrame = {
    // no broadcast hint on the parent key set: parent tables are
    // corpus-sized (orders is the parent of lineitem — forcing their
    // distinct keys through the driver would OOM at 100 TB, the r7
    // interval-join bug class). The anti join shuffles on the key —
    // the honest referential-audit cost — and AQE still broadcasts
    // genuinely dim-sized parents at runtime.
    val orphans = child.select(col(key).as("k"))
      .join(parent.select(col(pkey).as("k")).distinct(), Seq("k"), "left_anti")
    child.agg(count(lit(1)).as("n_child"))
      .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
      .select(lit(name).as("fk_edge"), col("n_child"), col("n_orphans"),
        (col("n_orphans") === 0L).cast("int").as("ok"))
  }

  /** Tukey-fence outlier profile over rows of (event_type, c): per
    * group, the lower-discrete q1/q3 (same explicit index formula as
    * q_percentile), the 1.5×IQR fences, and how many rows fall outside
    * each fence. All arithmetic is long-integer: the fence compare runs
    * in HALF-cent units (2c vs 2q1 − 3·IQR) so the 1.5 factor never
    * creates a fraction, and both engines evaluate the identical
    * integer predicate. Public so the spec can drive it on a synthetic
    * group where the LOWER fence fires — on `events.value` (non-negative,
    * right-skewed) the lower fence is structurally unreachable
    * (q1 − 1.5·IQR < 0 ≤ c), so the fixture only exercises n_high.
    */
  def tukeyFences(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("c")
    val wn = Window.partitionBy("event_type")
    def qAt(p: Int, nm: String) =
      max(when(col("rn") ===
        ExactMath.divTrunc((col("n") - 1L) * p, lit(100L)) + 1L, col("c"))).as(nm)
    val f = e.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy("event_type")
      .agg(max("n").as("n"), qAt(25, "q1_c"), qAt(75, "q3_c"))
    val iqr = col("q3_c") - col("q1_c")
    e.join(broadcast(f), "event_type")
      .groupBy("event_type")
      .agg(max("n").as("n"), max("q1_c").as("q1_c"), max("q3_c").as("q3_c"),
        sum(when(col("c") * 2L < col("q1_c") * 2L - iqr * 3L, 1L).otherwise(0L))
          .as("n_low"),
        sum(when(col("c") * 2L > col("q3_c") * 2L + iqr * 3L, 1L).otherwise(0L))
          .as("n_high"))
      .select(col("event_type"), col("n"), col("q1_c"), col("q3_c"),
        (col("q3_c") - col("q1_c")).as("iqr_c"), col("n_low"), col("n_high"),
        ExactMath.divTrunc((col("n_low") + col("n_high")) * 20000L + col("n"),
          col("n") * 2L).as("out_pct_e4"))
      .orderBy("event_type")
  }

  /** The windowed half of q_rate_anomaly over rows of (day, n, n_err):
    * trailing CALENDAR-day baseline (RANGE over the epoch-day index)
    * and the division-free anomaly flag. Public so ProfileSpec can
    * prove the gap semantics on a synthetic day series — the fixture
    * has no missing days, where ROWS and RANGE coincide.
    */
  def rateAnomaly(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("day_idx").rangeBetween(-7, -1)
    d.withColumn("day_idx", datediff(col("day"), lit("1970-01-01")))
      .withColumn("tn", sum("n").over(w))
      .withColumn("te", sum("n_err").over(w))
      .filter(col("tn").isNotNull) // first day: no baseline yet
      .select(col("day"), col("n"), col("n_err"),
        ExactMath.divTrunc(col("n_err") * 10000L, col("n")).as("rate_e4"),
        ExactMath.divTrunc(col("te") * 10000L, col("tn")).as("trail_e4"),
        col("tn"), col("te"))
      .select(col("day"), col("n"), col("n_err"), col("rate_e4"), col("trail_e4"),
        abs(col("rate_e4") - col("trail_e4")).as("dev_e4"),
        (abs(col("n_err") * col("tn") - col("te") * col("n")) * 100L >
          col("n") * col("tn") * 3L).cast("int").as("anomaly"))
      .orderBy("day")
  }

  val entries: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q_profile_stats ★ — one profiling row per column: total rows,
    // null count, exact distinct count, min/max (rendered as strings so
    // the 5 per-column rows share one schema; numeric min/max are cast
    // AFTER aggregation, so the ordering stays numeric). One pass over
    // the table; the multi-column exact distincts make Spark plan an
    // EXPAND (data duplicated once per distinct agg) — the honest cost
    // of exact profiling. At 100 TB swap countDistinct for
    // approx_count_distinct: the expand disappears and the query shape
    // is otherwise identical (the HLL play of q_approx_distinct).
    QueryDef(
      "q_profile_stats",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            cents.as("cents"), col("props"))
          .agg(
            count(lit(1)).as("n"),
            count(col("event_id")).as("nn_event_id"),
            countDistinct(col("event_id")).as("nd_event_id"),
            min("event_id").cast("string").as("mn_event_id"),
            max("event_id").cast("string").as("mx_event_id"),
            count(col("user_id")).as("nn_user_id"),
            countDistinct(col("user_id")).as("nd_user_id"),
            min("user_id").cast("string").as("mn_user_id"),
            max("user_id").cast("string").as("mx_user_id"),
            count(col("event_type")).as("nn_event_type"),
            countDistinct(col("event_type")).as("nd_event_type"),
            min("event_type").as("mn_event_type"),
            max("event_type").as("mx_event_type"),
            count(col("cents")).as("nn_cents"),
            countDistinct(col("cents")).as("nd_cents"),
            min("cents").cast("string").as("mn_cents"),
            max("cents").cast("string").as("mx_cents"),
            count(col("props")).as("nn_props"),
            countDistinct(col("props")).as("nd_props"),
            min("props").as("mn_props"),
            max("props").as("mx_props"))
          .selectExpr(
            """stack(5,
              |  'cents',      n, n - nn_cents,      nd_cents,      mn_cents,      mx_cents,
              |  'event_id',   n, n - nn_event_id,   nd_event_id,   mn_event_id,   mx_event_id,
              |  'event_type', n, n - nn_event_type, nd_event_type, mn_event_type, mx_event_type,
              |  'props',      n, n - nn_props,      nd_props,      mn_props,      mx_props,
              |  'user_id',    n, n - nn_user_id,    nd_user_id,    mn_user_id,    mx_user_id
              |) as (col_name, n, n_null, n_distinct, min_s, max_s)""".stripMargin)
          .orderBy("col_name"),
      Some("""WITH e AS (
             |  SELECT event_id, user_id, event_type,
             |    TRY_CAST(round(value * 100) AS BIGINT) AS cents, props
             |  FROM events)
             |SELECT * FROM (
             |  SELECT 'cents' AS col_name, COUNT(*) AS n,
             |    COUNT(*) - COUNT(cents) AS n_null,
             |    COUNT(DISTINCT cents) AS n_distinct,
             |    CAST(MIN(cents) AS VARCHAR) AS min_s,
             |    CAST(MAX(cents) AS VARCHAR) AS max_s FROM e
             |  UNION ALL
             |  SELECT 'event_id', COUNT(*), COUNT(*) - COUNT(event_id),
             |    COUNT(DISTINCT event_id),
             |    CAST(MIN(event_id) AS VARCHAR), CAST(MAX(event_id) AS VARCHAR) FROM e
             |  UNION ALL
             |  SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
             |    COUNT(DISTINCT event_type),
             |    MIN(event_type), MAX(event_type) FROM e
             |  UNION ALL
             |  SELECT 'props', COUNT(*), COUNT(*) - COUNT(props),
             |    COUNT(DISTINCT props),
             |    MIN(props), MAX(props) FROM e
             |  UNION ALL
             |  SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
             |    COUNT(DISTINCT user_id),
             |    CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR) FROM e
             |) ORDER BY col_name""".stripMargin)),

    // ------------------------------------------------------------------
    // q_histogram ★ — fixed-width value histogram per event type
    // (500-cent bins): the distribution-profiling op behind drift
    // detection and outlier triage. Exact integer bin = cents div 500;
    // ONE hash aggregation (map-side combine), output is bins ×
    // event types — constant-size whatever the corpus, the shape that
    // makes it a dashboard query at 100 TB.
    QueryDef(
      "q_histogram",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "events")
          .select(col("event_type"),
            ExactMath.divTrunc(cents, lit(500L)).as("bin"))
          // a NaN measure has no bin — excluded in both engines
          // (q_profile_stats reports null counts; r17 nasty sweep)
          .filter(col("bin").isNotNull)
          .groupBy("event_type", "bin")
          .agg(count(lit(1)).as("n"))
          .select(col("event_type"), col("bin"),
            (col("bin") * 500L).as("lo_cents"), col("n"))
          .orderBy("event_type", "bin"),
      Some("""WITH b AS (
             |  SELECT event_type,
             |    TRY_CAST(round(value * 100) AS BIGINT) // 500 AS bin
             |  FROM events
             |  WHERE TRY_CAST(round(value * 100) AS BIGINT) IS NOT NULL)
             |SELECT event_type, bin, bin * 500 AS lo_cents, COUNT(*) AS n
             |FROM b GROUP BY event_type, bin
             |ORDER BY event_type, bin""".stripMargin)),

    // ------------------------------------------------------------------
    // q_outlier_fences ★ (new r5) — Tukey-fence outlier profile per
    // event type: q1/q3 as lower-discrete order statistics on integer
    // cents, fences at 1.5×IQR, and the count of rows outside each
    // fence — the robust (quantile-based, so hot outliers can't move
    // their own threshold the way mean±kσ lets them) anomaly-triage
    // operator of a data-quality pass. The 1.5 factor is evaluated in
    // half-cent units (2c vs 2q1 − 3·IQR), so every compare is exact
    // long arithmetic in both engines; see [[tukeyFences]] for the
    // fence derivation and the structurally-dead lower fence on this
    // fixture (proven live on a synthetic group in ProfileSpec).
    // Plan: one per-group window sort for the exact quantiles (the
    // honest cost of exactness, same as q_percentile), then a broadcast
    // of the 5-row fence table onto a second scan — map-only flagging.
    // At 100 TB the fences come from approx_percentile's sketch in one
    // pass and the flag pass is unchanged.
    QueryDef(
      "q_outlier_fences",
      (s: SparkSession, dir: String) =>
        // NaN measures excluded from fences AND flag counts (standard
        // aggregate semantics, both engines — r17 nasty sweep)
        tukeyFences(Tables(s, dir, "events")
          .select(col("event_type"), cents.as("c"))
          .filter(col("c").isNotNull)),
      Some("""WITH b AS (
             |  SELECT event_type, TRY_CAST(round(value*100) AS BIGINT) AS c
             |  FROM events
             |  WHERE TRY_CAST(round(value*100) AS BIGINT) IS NOT NULL),
             |r AS (
             |  SELECT event_type, c,
             |    row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
             |    COUNT(*) OVER (PARTITION BY event_type) AS n
             |  FROM b),
             |f AS (
             |  SELECT event_type, MAX(n) AS n,
             |    MAX(CASE WHEN rn = ((n-1)*25)//100 + 1 THEN c END) AS q1_c,
             |    MAX(CASE WHEN rn = ((n-1)*75)//100 + 1 THEN c END) AS q3_c
             |  FROM r GROUP BY event_type)
             |SELECT f.event_type, CAST(f.n AS BIGINT) AS n, f.q1_c, f.q3_c,
             |  f.q3_c - f.q1_c AS iqr_c,
             |  CAST(SUM(CASE WHEN 2*b.c < 2*f.q1_c - 3*(f.q3_c - f.q1_c)
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
             |  CAST(SUM(CASE WHEN 2*b.c > 2*f.q3_c + 3*(f.q3_c - f.q1_c)
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
             |  CAST(((SUM(CASE WHEN 2*b.c < 2*f.q1_c - 3*(f.q3_c - f.q1_c) THEN 1 ELSE 0 END)
             |       + SUM(CASE WHEN 2*b.c > 2*f.q3_c + 3*(f.q3_c - f.q1_c) THEN 1 ELSE 0 END))
             |      * 20000 + f.n) // (f.n * 2) AS BIGINT) AS out_pct_e4
             |FROM b JOIN f ON b.event_type = f.event_type
             |GROUP BY f.event_type, f.n, f.q1_c, f.q3_c
             |ORDER BY f.event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q_rate_anomaly ★ (new r5) — metric-drift detection: per day, the
    // error-event share vs its trailing-7-day baseline, flagged when
    // the deviation exceeds 3% — the data-quality tripwire that pages
    // before a bad drop poisons a training run. The FLAG is division-
    // free exact integer cross-multiplication (|n_err·T_n − T_err·n|·
    // 100 > 3·n·T_n — no rounding can sit on the decision boundary;
    // exact in longs while n·T_n ≤ 9.2e16, i.e. ~1.1e8 rows/day — at
    // larger daily volumes lift the flag arithmetic to decimal(38,0),
    // the reported rates are unaffected); the reported rate columns are
    // floor-div e4 (deterministic in both engines). The baseline frame
    // is a RANGE over the epoch-day index, not ROWS — a calendar day
    // with zero events must NOT stretch the baseline onto older days
    // (ROWS would reach back 8+ calendar days across a gap — review
    // finding; the silent-feed outage is exactly when the tripwire
    // matters). Plan: ONE hash agg corpus → days (map-side combined),
    // then a window over the days-sized frame — the global window runs
    // on ≤ time-span rows (30 here, 36525 for a century), never the
    // corpus; flags at 300 e4: 6 of 29 days anomalous at sf0.01,
    // nearest deviations 288/336 — both branches live, 12+ e4 margin.
    QueryDef(
      "q_rate_anomaly",
      (s: SparkSession, dir: String) =>
        rateAnomaly(Tables(s, dir, "events")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_err"))),
      Some("""WITH d AS (
             |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, COUNT(*) AS n,
             |    SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS ne
             |  FROM events GROUP BY 1),
             |i AS (SELECT day, n, ne, day - DATE '1970-01-01' AS day_idx FROM d),
             |w AS (
             |  SELECT day, n, ne,
             |    SUM(n) OVER (ORDER BY day_idx RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS tn,
             |    SUM(ne) OVER (ORDER BY day_idx RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS te
             |  FROM i)
             |SELECT day, CAST(n AS BIGINT) AS n, CAST(ne AS BIGINT) AS n_err,
             |  CAST(ne*10000//n AS BIGINT) AS rate_e4,
             |  CAST(te*10000//tn AS BIGINT) AS trail_e4,
             |  CAST(abs(ne*10000//n - te*10000//tn) AS BIGINT) AS dev_e4,
             |  CAST(CASE WHEN abs(ne*tn - te*n)*100 > 3*n*tn THEN 1 ELSE 0 END
             |    AS INTEGER) AS anomaly
             |FROM w WHERE tn IS NOT NULL ORDER BY day""".stripMargin)),

    // ------------------------------------------------------------------
    // q_skew_stats ★ (new r5) — join/agg-key skew measurement: the
    // numbers that DECIDE whether q_join_salted's salting (or AQE's
    // skew split) is needed for a key. Per candidate key column
    // (user_id here): distinct keys, total rows, max and exact-p99
    // per-key multiplicity, the hottest key, and the max/mean ratio in
    // e4 (the "how many reducers does the hot key monopolize" figure —
    // ratio_e4/1e4 ≈ the straggler factor of an unsalted shuffle).
    // Plan: one (key) hash agg — map-side combined, so the full scan
    // reduces to key-count pairs — then ONE tiny agg over the
    // key-histogram (n_keys rows, vocabulary-sized at any corpus
    // scale). p99 uses the same explicit lower-disc index formula as
    // q_percentile; all outputs exact integers.
    QueryDef(
      "q_skew_stats",
      (s: SparkSession, dir: String) => {
        val kc = Tables(s, dir, "events")
          .groupBy("user_id").agg(count(lit(1)).as("n"))
        val w = org.apache.spark.sql.expressions.Window.orderBy(col("n"), col("user_id"))
        val ranked = kc
          .withColumn("rn", row_number().over(w))
          .withColumn("n_keys", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
        // NOTE: the global window runs over the KEY HISTOGRAM (n_keys
        // rows), not the corpus — single-partition is fine there at any
        // scale (31k rows at 10⁹ events with √n-ish key spaces; for a
        // truly huge key space swap in approx_percentile).
        ranked
          .agg(
            max(col("n_keys")).as("n_keys"),
            sum(col("n")).as("n_rows"),
            max(col("n")).as("max_key_n"),
            max(when(col("rn") === ExactMath.divTrunc((col("n_keys") - 1L) * 99L, lit(100L)) + 1L,
              col("n"))).as("p99_key_n"),
            // top key = max n, ties → smallest key: min over (-n, key).
            // (-n can't overflow — n is a positive count; the earlier
            // MaxValue - key inversion trick overflowed on negative
            // keys and silently flipped the tie-break.)
            min(struct((-col("n")).as("nn"), col("user_id")))
              .getField("user_id").as("top_key"))
          .select(col("n_keys"), col("n_rows"), col("max_key_n"), col("p99_key_n"),
            col("top_key"),
            ExactMath.divTrunc(col("max_key_n") * 10000L * col("n_keys"), col("n_rows"))
              .as("skew_ratio_e4"))
      },
      Some("""WITH kc AS (
             |  SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
             |r AS (
             |  SELECT user_id, n,
             |    row_number() OVER (ORDER BY n, user_id) AS rn,
             |    COUNT(*) OVER () AS n_keys
             |  FROM kc)
             |SELECT CAST(MAX(n_keys) AS BIGINT) AS n_keys,
             |  CAST(SUM(n) AS BIGINT) AS n_rows,
             |  CAST(MAX(n) AS BIGINT) AS max_key_n,
             |  CAST(MAX(CASE WHEN rn = (n_keys - 1) * 99 // 100 + 1 THEN n END) AS BIGINT)
             |    AS p99_key_n,
             |  CAST((SELECT user_id FROM kc ORDER BY n DESC, user_id LIMIT 1) AS BIGINT)
             |    AS top_key,
             |  CAST(MAX(n) * 10000 * MAX(n_keys) // SUM(n) AS BIGINT) AS skew_ratio_e4
             |FROM r""".stripMargin)),

    // ------------------------------------------------------------------
    // q_equi_depth ★ (new r5) — equi-DEPTH histogram per event type
    // (10 deciles of equal row count), the companion of q_histogram's
    // equi-WIDTH bins: width bins expose the SHAPE of a distribution,
    // depth bins expose its QUANTILE BOUNDARIES — the statistics a
    // cost-based optimizer stores and a drift monitor compares (equal-
    // count bins can't go empty, so tail drift always moves a boundary,
    // never vanishes into a zero-count bucket). ntile(10) over the
    // per-type (cents, event_id) TOTAL order — the unique-key tiebreak
    // makes bucket membership engine-deterministic even through runs of
    // equal values (both engines give the first n%10 buckets the extra
    // row). Plan: one per-group window sort (the honest cost of exact
    // boundaries, same as q_percentile), one 10×types hash agg; at
    // 100 TB swap the exact sort for approx_percentile's sketch
    // boundaries + one map-only bin assign — the declared output
    // (bounds + counts) is unchanged.
    QueryDef(
      "q_equi_depth",
      (s: SparkSession, dir: String) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy(col("c"), col("event_id"))
        Tables(s, dir, "events")
          .select(col("event_type"), cents.as("c"), col("event_id"))
          // NaN measures excluded from the deciles (r17 nasty sweep)
          .filter(col("c").isNotNull)
          .withColumn("decile", ntile(10).over(w))
          .groupBy("event_type", "decile")
          .agg(count(lit(1)).as("n"),
            min("c").as("lo_cents"), max("c").as("hi_cents"))
          .orderBy("event_type", "decile")
      },
      Some("""WITH b AS (
             |  SELECT event_type, TRY_CAST(round(value*100) AS BIGINT) AS c,
             |    event_id,
             |    ntile(10) OVER (PARTITION BY event_type
             |      ORDER BY TRY_CAST(round(value*100) AS BIGINT), event_id) AS decile
             |  FROM events
             |  WHERE TRY_CAST(round(value*100) AS BIGINT) IS NOT NULL)
             |SELECT event_type, CAST(decile AS INTEGER) AS decile,
             |  COUNT(*) AS n, MIN(c) AS lo_cents, MAX(c) AS hi_cents
             |FROM b GROUP BY 1, 2 ORDER BY event_type, decile""".stripMargin)),

    // ------------------------------------------------------------------
    // q_rfm ★ (new r5) — RFM (recency / frequency / monetary) quintile
    // scoring per user: the classic behavioral feature-engineering op
    // (churn features, segment labels for a training set). Each user's
    // three raw metrics come from ONE corpus→users hash agg (map-side
    // combined); the quintile scores are ntile(5) over the USERS frame
    // — per-metric total orders with the user_id tiebreak, so bucket
    // membership is engine-deterministic (same guarantee as
    // q_equi_depth). Scores are oriented the standard way (5 = most
    // recent / most frequent / highest spend) via 6 − bucket on the
    // ascending-goodness orders. The three global windows run over the
    // USER table (≪ corpus; the key-histogram size argument of
    // q_skew_stats); at 1e8+ users swap ntile for approx_percentile
    // boundary lookup + map-only binning, scores unchanged except at
    // boundaries. recency is measured against the corpus max day so
    // the query is reproducible (no wall clock).
    QueryDef(
      "q_rfm",
      (s: SparkSession, dir: String) => {
        import org.apache.spark.sql.expressions.Window
        val u = Tables(s, dir, "events")
          .groupBy("user_id")
          .agg(max(to_date(col("ts"))).as("last_day"),
            count(lit(1)).as("frequency"), sum(cents).as("monetary_cents"))
        val mx = u.agg(max("last_day").as("mxd"))
        val base = u.crossJoin(broadcast(mx))
          .select(col("user_id"),
            datediff(col("mxd"), col("last_day")).as("recency_days"),
            col("frequency"), col("monetary_cents"))
        base
          .withColumn("r_score", lit(6) - ntile(5).over(
            Window.orderBy(col("recency_days"), col("user_id"))))
          .withColumn("f_score", lit(6) - ntile(5).over(
            Window.orderBy(col("frequency").desc, col("user_id"))))
          .withColumn("m_score", lit(6) - ntile(5).over(
            Window.orderBy(col("monetary_cents").desc, col("user_id"))))
          .select(col("user_id"), col("recency_days"), col("frequency"),
            col("monetary_cents"), col("r_score"), col("f_score"),
            col("m_score"),
            (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
              .as("rfm"))
          .orderBy("user_id")
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    MAX(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS last_day,
             |    COUNT(*) AS frequency,
             |    CAST(SUM(TRY_CAST(round(value*100) AS BIGINT)) AS BIGINT)
             |      AS monetary_cents
             |  FROM events GROUP BY 1),
             |mx AS (SELECT MAX(last_day) AS mxd FROM u),
             |b AS (
             |  SELECT user_id,
             |    CAST(mxd - last_day AS INTEGER) AS recency_days,
             |    frequency, monetary_cents
             |  FROM u, mx),
             |sc AS (
             |  SELECT user_id, recency_days, frequency, monetary_cents,
             |    6 - ntile(5) OVER (ORDER BY recency_days, user_id) AS r_score,
             |    6 - ntile(5) OVER (ORDER BY frequency DESC, user_id) AS f_score,
             |    6 - ntile(5) OVER (ORDER BY monetary_cents DESC, user_id) AS m_score
             |  FROM b)
             |SELECT user_id, recency_days, frequency, monetary_cents,
             |  CAST(r_score AS INTEGER) AS r_score,
             |  CAST(f_score AS INTEGER) AS f_score,
             |  CAST(m_score AS INTEGER) AS m_score,
             |  CAST(r_score * 100 + f_score * 10 + m_score AS INTEGER) AS rfm
             |FROM sc ORDER BY user_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_trend_ols ★ (new r5) — per-type OLS trend of daily event volume:
    // the closed-form regression slope from the five sufficient
    // statistics (n, Σx, Σy, Σxy, Σx²) — slope = (nΣxy − ΣxΣy) /
    // (nΣx² − (Σx)²) — which is the whole point at scale: a trend fit
    // over any corpus reduces to ONE map-side-combined aggregation, no
    // iterative optimizer, no per-row residual pass. x is the epoch-day
    // index re-based to the corpus min day (slope is shift-invariant;
    // re-basing keeps every intermediate small — x ≤ span-days, so
    // n·Σxy ≤ days³·max_daily and the e6-scaled numerator stays ~1e13
    // at sf0.1, ~2^53-safe through 1e9-row days). Both engines emit the
    // exact integer numerator/denominator AND the truncating-division
    // e6 slope (divTrunc ≡ DuckDB `//`, verified truncation parity on
    // mixed signs — slopes go negative). Plan: corpus → (type, day)
    // hash agg (map-side combined), a 1-row min-day broadcast, then a
    // types-sized agg; the dashboard-query shape at 100 TB.
    QueryDef(
      "q_trend_ols",
      (s: SparkSession, dir: String) =>
        olsTrend(Tables(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("y"))),
      Some("""WITH d AS (
             |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             |    COUNT(*) AS y
             |  FROM events GROUP BY 1, 2),
             |mn AS (SELECT MIN(day) AS mnd FROM d),
             |b AS (SELECT event_type, y, CAST(day - mnd AS BIGINT) AS x FROM d, mn),
             |s AS (
             |  SELECT event_type, COUNT(*) AS n_days, SUM(y) AS sum_y,
             |    SUM(x) AS sx, SUM(x * y) AS sxy, SUM(x * x) AS sxx
             |  FROM b GROUP BY 1)
             |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
             |  CAST(sum_y AS BIGINT) AS sum_y,
             |  CAST(n_days * sxy - sx * sum_y AS BIGINT) AS slope_num,
             |  CAST(n_days * sxx - sx * sx AS BIGINT) AS slope_den,
             |  CAST((n_days * sxy - sx * sum_y) * 1000000
             |    // (n_days * sxx - sx * sx) AS BIGINT) AS slope_e6
             |FROM s WHERE n_days * sxx - sx * sx > 0
             |ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q_winsorize ★ (new r5) — percentile clipping (winsorization) per
    // event type: clamp values to the [p5, p95] order statistics and
    // report the mean before/after plus how many rows each tail clipped
    // — the robust-feature-scaling op that keeps a handful of extreme
    // values from dominating a normalized training feature. Boundaries
    // are the same explicit lower-disc index formula as q_percentile
    // (engine-deterministic, no interpolation); clamping and both means
    // are exact long cents with floor-div e2 rendering. Plan: one
    // per-group window sort for the exact boundaries (the q_percentile
    // cost), a 5-row broadcast back onto a second scan, one map-side-
    // combined agg. At 100 TB the boundaries come from
    // approx_percentile's sketch and the clamp pass is unchanged.
    QueryDef(
      "q_winsorize",
      (s: SparkSession, dir: String) => {
        import org.apache.spark.sql.expressions.Window
        val b = Tables(s, dir, "events")
          .select(col("event_type"), cents.as("c"))
          .filter(col("c").isNotNull) // NaN measures excluded (r17 sweep)
        val w = Window.partitionBy("event_type").orderBy("c")
        val wn = Window.partitionBy("event_type")
        def qAt(p: Int, nm: String) =
          max(when(col("rn") ===
            ExactMath.divTrunc((col("n") - 1L) * p, lit(100L)) + 1L, col("c"))).as(nm)
        val f = b.withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wn))
          .groupBy("event_type")
          .agg(qAt(5, "p5_c"), qAt(95, "p95_c"))
        val clamped = greatest(col("p5_c"), least(col("p95_c"), col("c")))
        b.join(broadcast(f), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), max("p5_c").as("p5_c"),
            max("p95_c").as("p95_c"), sum("c").as("sum_cents"),
            sum(clamped).as("sum_wins_cents"),
            sum(when(col("c") < col("p5_c"), 1L).otherwise(0L)).as("n_clip_lo"),
            sum(when(col("c") > col("p95_c"), 1L).otherwise(0L)).as("n_clip_hi"))
          .select(col("event_type"), col("n"), col("p5_c"), col("p95_c"),
            col("sum_cents"), col("sum_wins_cents"), col("n_clip_lo"),
            col("n_clip_hi"),
            ExactMath.divTrunc(col("sum_cents"), col("n")).as("mean_c"),
            ExactMath.divTrunc(col("sum_wins_cents"), col("n")).as("mean_wins_c"))
          .orderBy("event_type")
      },
      Some("""WITH b AS (
             |  SELECT event_type, TRY_CAST(round(value*100) AS BIGINT) AS c
             |  FROM events
             |  WHERE TRY_CAST(round(value*100) AS BIGINT) IS NOT NULL),
             |r AS (
             |  SELECT event_type, c,
             |    row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
             |    COUNT(*) OVER (PARTITION BY event_type) AS n
             |  FROM b),
             |f AS (
             |  SELECT event_type,
             |    MAX(CASE WHEN rn = ((n-1)*5)//100 + 1 THEN c END) AS p5_c,
             |    MAX(CASE WHEN rn = ((n-1)*95)//100 + 1 THEN c END) AS p95_c
             |  FROM r GROUP BY event_type)
             |SELECT b.event_type, COUNT(*) AS n, MAX(f.p5_c) AS p5_c,
             |  MAX(f.p95_c) AS p95_c,
             |  CAST(SUM(b.c) AS BIGINT) AS sum_cents,
             |  CAST(SUM(GREATEST(f.p5_c, LEAST(f.p95_c, b.c))) AS BIGINT)
             |    AS sum_wins_cents,
             |  CAST(SUM(CASE WHEN b.c < f.p5_c THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_clip_lo,
             |  CAST(SUM(CASE WHEN b.c > f.p95_c THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_clip_hi,
             |  CAST(SUM(b.c) // COUNT(*) AS BIGINT) AS mean_c,
             |  CAST(SUM(GREATEST(f.p5_c, LEAST(f.p95_c, b.c))) // COUNT(*) AS BIGINT)
             |    AS mean_wins_c
             |FROM b JOIN f ON b.event_type = f.event_type
             |GROUP BY b.event_type ORDER BY b.event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q_benford ★ (new r5) — Benford first-significant-digit test per
    // event type: the distribution of leading digits of the cent
    // amounts vs Benford's law, with per-digit deviation in exact e6 —
    // the classic fabricated/synthetic-data tripwire of a data-quality
    // pass (organic heavy-tailed amounts follow Benford; uniform or
    // hand-seeded generators don't — this fixture's uniform `value` is
    // itself a live demonstration, deviating hard on every digit).
    // The Benford shares log10(1+1/d) are irrational, so both engines
    // use the same 9 precomputed e6-floor constants — no libm call in
    // either plan (the q_mm_entropy lesson); observed shares are
    // floor-div e6. Leading digit via the decimal string — exact, no
    // float log. Plan: one (type, digit) hash agg (map-side combined)
    // + a ≤9-row-per-type window for the type totals; constant-size
    // output at any corpus scale.
    QueryDef(
      "q_benford",
      (s: SparkSession, dir: String) => {
        import org.apache.spark.sql.expressions.Window
        val benford = typedLit(Map(
          1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L,
          5 -> 79181L, 6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L))
        Tables(s, dir, "events")
          .select(col("event_type"), cents.as("c"))
          .filter(col("c") > 0L)
          .select(col("event_type"),
            substring(col("c").cast("string"), 1, 1).cast("int").as("digit"))
          .groupBy("event_type", "digit")
          .agg(count(lit(1)).as("n_d"))
          .withColumn("n", sum("n_d").over(Window.partitionBy("event_type")))
          .select(col("event_type"), col("digit"), col("n_d"), col("n"),
            ExactMath.divTrunc(col("n_d") * 1000000L, col("n")).as("share_e6"),
            element_at(benford, col("digit")).as("benford_e6"))
          .withColumn("dev_e6", abs(col("share_e6") - col("benford_e6")))
          .orderBy("event_type", "digit")
      },
      Some("""WITH b AS (
             |  SELECT event_type,
             |    CAST(substr(CAST(TRY_CAST(round(value*100) AS BIGINT) AS VARCHAR), 1, 1)
             |      AS INTEGER) AS digit
             |  FROM events WHERE TRY_CAST(round(value*100) AS BIGINT) > 0),
             |g AS (
             |  SELECT event_type, digit, COUNT(*) AS n_d
             |  FROM b GROUP BY 1, 2),
             |t AS (
             |  SELECT event_type, digit, n_d,
             |    SUM(n_d) OVER (PARTITION BY event_type) AS n
             |  FROM g)
             |SELECT event_type, digit, CAST(n_d AS BIGINT) AS n_d,
             |  CAST(n AS BIGINT) AS n,
             |  CAST(n_d * 1000000 // n AS BIGINT) AS share_e6,
             |  CAST(CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091
             |    WHEN 3 THEN 124938 WHEN 4 THEN 96910 WHEN 5 THEN 79181
             |    WHEN 6 THEN 66946 WHEN 7 THEN 57991 WHEN 8 THEN 51152
             |    WHEN 9 THEN 45757 END AS BIGINT) AS benford_e6,
             |  CAST(abs(n_d * 1000000 // n - CASE digit WHEN 1 THEN 301029
             |    WHEN 2 THEN 176091 WHEN 3 THEN 124938 WHEN 4 THEN 96910
             |    WHEN 5 THEN 79181 WHEN 6 THEN 66946 WHEN 7 THEN 57991
             |    WHEN 8 THEN 51152 WHEN 9 THEN 45757 END) AS BIGINT) AS dev_e6
             |FROM t ORDER BY event_type, digit""".stripMargin)),

    // ------------------------------------------------------------------
    // q_abtest ★ (new r5) — two-proportion experiment readout: users
    // split into arms by the hash rule of q_split_assign (md5(user_id)
    // mod 2 — deterministic, reproducible, the assignment an actual
    // experiment framework uses; parity would correlate with id-
    // assignment order), per-arm user-level conversion (converted =
    // ≥ 1 purchase event), uplift in e4, and a DIVISION-FREE
    // significance flag: the 1-df chi-square test χ² ≥ 3.84 (95%)
    // cross-multiplied to 100·N·(x₁(n₂−x₂) − x₂(n₁−x₁))² ≥
    // 384·n₁·n₂·x·(N−x) — no square root, no float; the squared term
    // reaches ~1e21 at sf0.1 cohort sizes, past 2^63, so the compare
    // runs in DECIMAL(38,0) vs HUGEINT (the q_autocorr move; headroom
    // to ~1e9 users/arm). On this fixture assignment is independent of
    // behavior, so the flag SHOULD be 0 — a significant readout here
    // would mean the hash assignment is biased (the A/A-test
    // discipline); the spec drives a synthetic genuinely-different
    // cohort pair to prove the flag fires. Plan: one corpus → users
    // agg, one 2-row arm agg, a 1-row cross of the two arms.
    QueryDef(
      "q_abtest",
      (s: SparkSession, dir: String) => {
        // conversion = the user purchased more often than they errored —
        // scale-free (≥-one-purchase saturates at 100% on this dense
        // fixture: every user has every type, x = N zeroes the χ²
        // denominator and the flag degenerates)
        val users = Tables(s, dir, "events")
          .groupBy("user_id")
          .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >
            sum(when(col("event_type") === "error", 1L).otherwise(0L)))
            .cast("long").as("converted"))
          .select(
            pmod(graft.functions.Md5Ops.md5Prefix(col("user_id").cast("string"), 15), lit(2L)).as("arm"),
            col("converted"))
        abTest(users.groupBy("arm")
          .agg(count(lit(1)).as("n"), sum("converted").as("x")))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |            > SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             |         THEN 1 ELSE 0 END AS converted
             |  FROM events GROUP BY 1),
             |armed AS (
             |  SELECT ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
             |    % 2 AS arm, converted
             |  FROM u),
             |arms AS (
             |  SELECT arm, COUNT(*) AS n, SUM(converted) AS x
             |  FROM armed GROUP BY 1),
             |c AS (
             |  SELECT a.n AS n1, a.x AS x1, b.n AS n2, b.x AS x2
             |  FROM arms a JOIN arms b ON a.arm = 0 AND b.arm = 1)
             |SELECT CAST(n1 AS BIGINT) AS n1, CAST(x1 AS BIGINT) AS x1,
             |  CAST(x1 * 10000 // n1 AS BIGINT) AS rate1_e4,
             |  CAST(n2 AS BIGINT) AS n2, CAST(x2 AS BIGINT) AS x2,
             |  CAST(x2 * 10000 // n2 AS BIGINT) AS rate2_e4,
             |  CAST(x2 * 10000 // n2 - x1 * 10000 // n1 AS BIGINT) AS uplift_e4,
             |  CAST(CASE WHEN x1 + x2 > 0 AND x1 + x2 < n1 + n2 AND
             |    100 * CAST(n1 + n2 AS HUGEINT)
             |      * CAST(x1 * (n2 - x2) - x2 * (n1 - x1) AS HUGEINT)
             |      * CAST(x1 * (n2 - x2) - x2 * (n1 - x1) AS HUGEINT)
             |    >= 384 * CAST(n1 AS HUGEINT) * n2 * (x1 + x2)
             |      * (n1 + n2 - x1 - x2)
             |    THEN 1 ELSE 0 END AS INTEGER) AS significant
             |FROM c""".stripMargin)),

    // ------------------------------------------------------------------
    // q_user_overlap ★ (new r5) — audience overlap between event types:
    // for every type pair, the shared-user count and Jaccard in exact
    // e6 — the behavioral-cohort matrix (feature redundancy: two event
    // types whose audiences coincide carry one signal, not two; also
    // the funnel-adjacency sanity check). Same scalable shape as
    // q_contamination_matrix on a different domain: distinct (type,
    // user) compression FIRST (corpus → ≤ types·users rows), then a
    // user-keyed self-join whose per-key fan-out is bounded by the
    // TYPE COUNT (≤ C(5,2) pairs per user here), one pair agg,
    // per-type totals broadcast back. Jaccard denominator n_a + n_b −
    // shared is exact; pairs with zero shared users are absent
    // (inner-join semantics, containment 0).
    QueryDef(
      "q_user_overlap",
      (s: SparkSession, dir: String) => {
        val tu = Tables(s, dir, "events")
          .select(col("event_type"), col("user_id")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        tu.count() // eager: totals + both join sides
        val per = tu.groupBy("event_type").agg(count(lit(1)).as("n"))
        tu.as("a")
          .join(tu.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("type_a"),
            col("b.event_type").as("type_b"))
          .agg(count(lit(1)).as("n_shared"))
          .join(broadcast(per.select(col("event_type").as("type_a"),
            col("n").as("n_a"))), "type_a")
          .join(broadcast(per.select(col("event_type").as("type_b"),
            col("n").as("n_b"))), "type_b")
          .select(col("type_a"), col("type_b"), col("n_shared"), col("n_a"),
            col("n_b"),
            ExactMath.floorDiv(col("n_shared") * 1000000L,
              col("n_a") + col("n_b") - col("n_shared")).as("jaccard_e6"))
          .orderBy("type_a", "type_b")
      },
      Some("""WITH tu AS (
             |  SELECT DISTINCT event_type, user_id FROM events),
             |per AS (SELECT event_type, COUNT(*) AS n FROM tu GROUP BY 1),
             |p AS (
             |  SELECT a.event_type AS type_a, b.event_type AS type_b,
             |    COUNT(*) AS n_shared
             |  FROM tu a JOIN tu b
             |    ON a.user_id = b.user_id AND a.event_type < b.event_type
             |  GROUP BY 1, 2)
             |SELECT p.type_a, p.type_b, CAST(p.n_shared AS BIGINT) AS n_shared,
             |  CAST(pa.n AS BIGINT) AS n_a, CAST(pb.n AS BIGINT) AS n_b,
             |  CAST((p.n_shared * 1000000) // (pa.n + pb.n - p.n_shared)
             |    AS BIGINT) AS jaccard_e6
             |FROM p JOIN per pa ON p.type_a = pa.event_type
             |       JOIN per pb ON p.type_b = pb.event_type
             |ORDER BY type_a, type_b""".stripMargin)),

    // ------------------------------------------------------------------
    // q_seasonality ★ (new r5) — hour-of-day activity profile per event
    // type: the circadian baseline behind staffing, rate-limit sizing,
    // and "is this burst abnormal FOR 3 AM" anomaly context (a raw
    // volume tripwire like q_rate_anomaly fires on every diurnal swing
    // unless it knows this profile). Per type: the peak hour (ties →
    // smallest hour, the q_skew_stats min-struct idiom), its share of
    // traffic, and the Simpson concentration Σ(n_h/N)² in exact e6 —
    // 41666 (=1e6/24) is a perfectly flat profile, 1e6 a single-hour
    // spike; the same rational-concentration move as q_mm_byte_stats
    // (entropy would need libm). Σn_h²·1e6 stays in signed 64-bit while
    // per-type volume < ~3e6 rows/hour — beyond that, decimal(38,0)
    // (the q_autocorr move). Plan: ONE (type, hour) hash agg — map-side
    // combined, ≤ 24×types rows — then a types-sized agg; dashboard
    // shape at any corpus size.
    QueryDef(
      "q_seasonality",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "events")
          .groupBy(col("event_type"), hour(col("ts")).as("h"))
          .agg(count(lit(1)).as("n_h"))
          .groupBy("event_type")
          .agg(sum("n_h").as("n"),
            min(struct((-col("n_h")).as("nn"), col("h")))
              .getField("h").as("peak_hour"),
            max("n_h").as("peak_n"),
            sum(col("n_h") * col("n_h")).as("sum_sq"))
          .select(col("event_type"), col("n"), col("peak_hour"),
            col("peak_n"),
            ExactMath.divTrunc(col("peak_n") * 1000000L, col("n"))
              .as("peak_share_e6"),
            ExactMath.divTrunc(col("sum_sq") * 1000000L, col("n") * col("n"))
              .as("simpson_e6"))
          .orderBy("event_type"),
      Some("""WITH b AS (
             |  SELECT event_type,
             |    CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS h,
             |    COUNT(*) AS n_h
             |  FROM events GROUP BY 1, 2),
             |m AS (
             |  SELECT *, MAX(n_h) OVER (PARTITION BY event_type) AS mx
             |  FROM b)
             |SELECT event_type, CAST(SUM(n_h) AS BIGINT) AS n,
             |  CAST(MIN(CASE WHEN n_h = mx THEN h END) AS INTEGER) AS peak_hour,
             |  CAST(MAX(n_h) AS BIGINT) AS peak_n,
             |  CAST(MAX(n_h) * 1000000 // SUM(n_h) AS BIGINT) AS peak_share_e6,
             |  CAST(SUM(n_h * n_h) * 1000000 // (SUM(n_h) * SUM(n_h)) AS BIGINT)
             |    AS simpson_e6
             |FROM m GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q_fk_orphans ★ (new r5) — referential-integrity audit across the
    // star schema: for every foreign-key edge (lineitem→orders,
    // lineitem→part, lineitem→supplier, orders→customer,
    // customer→nation), how many child rows reference a parent that
    // does not exist — the relationship test a data contract runs
    // before a join-heavy pipeline trusts a drop (an orphaned FK
    // silently DROPS rows from every inner join downstream; the count
    // here is the rows q_join_star would lose). Plan per edge: one
    // LEFT ANTI join — parent sides are dimension-sized and broadcast
    // where small, the fact side streams map-only; a distinct-parent
    // count rides along as the audit context. 5 output rows at any
    // corpus size. All-zero orphans on this fixture IS the check — the
    // spec plants a corrupted child batch to prove the counter fires.
    QueryDef(
      "q_fk_orphans",
      (s: SparkSession, dir: String) => {
        val li = Tables(s, dir, "lineitem")
        val or = Tables(s, dir, "orders")
        val cu = Tables(s, dir, "customer")
        fkEdge("customer.c_nationkey->nation", cu, "c_nationkey",
          Tables(s, dir, "nation"), "n_nationkey")
          .unionAll(fkEdge("lineitem.l_orderkey->orders", li, "l_orderkey", or, "o_orderkey"))
          .unionAll(fkEdge("lineitem.l_partkey->part", li, "l_partkey",
            Tables(s, dir, "part"), "p_partkey"))
          .unionAll(fkEdge("lineitem.l_suppkey->supplier", li, "l_suppkey",
            Tables(s, dir, "supplier"), "s_suppkey"))
          .unionAll(fkEdge("orders.o_custkey->customer", or, "o_custkey", cu, "c_custkey"))
          .orderBy("fk_edge")
      },
      Some("""SELECT fk_edge, CAST(n_child AS BIGINT) AS n_child,
             |  CAST(n_orphans AS BIGINT) AS n_orphans,
             |  CAST(CASE WHEN n_orphans = 0 THEN 1 ELSE 0 END AS INTEGER) AS ok
             |FROM (
             |  SELECT 'customer.c_nationkey->nation' AS fk_edge,
             |    (SELECT COUNT(*) FROM customer) AS n_child,
             |    (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
             |      (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
             |      AS n_orphans
             |  UNION ALL
             |  SELECT 'lineitem.l_orderkey->orders',
             |    (SELECT COUNT(*) FROM lineitem),
             |    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
             |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
             |  UNION ALL
             |  SELECT 'lineitem.l_partkey->part',
             |    (SELECT COUNT(*) FROM lineitem),
             |    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
             |      (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
             |  UNION ALL
             |  SELECT 'lineitem.l_suppkey->supplier',
             |    (SELECT COUNT(*) FROM lineitem),
             |    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
             |      (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
             |  UNION ALL
             |  SELECT 'orders.o_custkey->customer',
             |    (SELECT COUNT(*) FROM orders),
             |    (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
             |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
             |) t ORDER BY fk_edge""".stripMargin)),

    // ------------------------------------------------------------------
    // q_drift_tvd ★ (new r5) — VALUE-DISTRIBUTION drift between the
    // first and second calendar halves of the corpus, per event type:
    // the batch-over-batch distribution monitor (does the new data
    // drop look like the old?) as TOTAL VARIATION DISTANCE over the
    // q_histogram bins — TVD = ½·Σ|pₐ − p_b| is the PSI/KL alternative
    // that needs NO logarithm, so the whole metric is exact integer e6
    // in both engines (PSI's ln(pa/pb) would reintroduce the libm
    // problem q_mm_entropy documents; TVD is also bounded [0,1] and
    // defined when a bin is empty on one side — PSI diverges there).
    // Halves split on the calendar midpoint (1-row min/max broadcast),
    // TIME-ordered — drift means "new vs old", not an arbitrary
    // partition (q_incr_agg's parity split is deliberately the
    // opposite: interleaved halves that should NOT drift). Plan: one
    // (type, half, bin) hash agg — map-side combined — then bins-sized
    // windows; constant-size output.
    QueryDef(
      "q_drift_tvd",
      (s: SparkSession, dir: String) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables(s, dir, "events")
          .select(col("event_type"),
            datediff(to_date(col("ts")), lit("1970-01-01")).as("di"),
            ExactMath.divTrunc(cents, lit(500L)).as("bin"))
        val mm = e.agg(min("di").as("mn"), max("di").as("mx"))
        val binned = e.crossJoin(broadcast(mm))
          .select(col("event_type"), col("bin"),
            (col("di") * 2L < (col("mn") + col("mx") + 1L)).cast("int").as("old_half"))
          .groupBy("event_type", "bin")
          .agg(sum(col("old_half")).as("na"),
            sum(lit(1L) - col("old_half")).as("nb"))
        val wt = Window.partitionBy("event_type")
        binned
          .withColumn("tot_a", sum("na").over(wt))
          .withColumn("tot_b", sum("nb").over(wt))
          // one-sided-type guard: a type absent from one calendar half
          // has an undefined share there (0-denominator; Spark null vs
          // DuckDB error) — drift is only defined with both halves
          .filter(col("tot_a") > 0L && col("tot_b") > 0L)
          .select(col("event_type"),
            ExactMath.divTrunc(col("na") * 1000000L, col("tot_a")).as("pa_e6"),
            ExactMath.divTrunc(col("nb") * 1000000L, col("tot_b")).as("pb_e6"),
            col("tot_a"), col("tot_b"))
          .groupBy("event_type")
          .agg(max("tot_a").as("n_old"), max("tot_b").as("n_new"),
            count(lit(1)).as("n_bins"),
            ExactMath.divTrunc(sum(abs(col("pa_e6") - col("pb_e6"))), lit(2L))
              .as("tvd_e6"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (
             |  SELECT event_type,
             |    CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01'
             |      AS BIGINT) AS di,
             |    TRY_CAST(round(value*100) AS BIGINT) // 500 AS bin
             |  FROM events),
             |mm AS (SELECT MIN(di) AS mn, MAX(di) AS mx FROM e),
             |b AS (
             |  SELECT event_type, bin,
             |    SUM(CASE WHEN di * 2 < mn + mx + 1 THEN 1 ELSE 0 END) AS na,
             |    SUM(CASE WHEN di * 2 < mn + mx + 1 THEN 0 ELSE 1 END) AS nb
             |  FROM e, mm GROUP BY 1, 2),
             |t AS (
             |  SELECT event_type, bin, na, nb,
             |    SUM(na) OVER (PARTITION BY event_type) AS tot_a,
             |    SUM(nb) OVER (PARTITION BY event_type) AS tot_b
             |  FROM b)
             |SELECT event_type, CAST(MAX(tot_a) AS BIGINT) AS n_old,
             |  CAST(MAX(tot_b) AS BIGINT) AS n_new,
             |  COUNT(*) AS n_bins,
             |  CAST(SUM(abs(na * 1000000 // tot_a - nb * 1000000 // tot_b)) // 2
             |    AS BIGINT) AS tvd_e6
             |FROM t WHERE tot_a > 0 AND tot_b > 0
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q_rle_profile ★ (new r5) — run-length ENCODING advisor: per
    // column, how many value-runs the data forms in its natural
    // within-partition order (day partitions, (ts, event_id) order —
    // the write order of a time-partitioned ingest) vs the best case
    // after sorting by the column (runs = per-day distincts), and the
    // sort gain — the statistic that decides which sort key makes
    // parquet RLE/dictionary encoding collapse a column (the row-level
    // companion of q_zorder's file-level clustering: zorder optimizes
    // SKIPPING, this optimizes ENCODING; both are OPTIMIZE decisions).
    // Runs are partition-local by construction — exactly how parquet
    // encodes pages — so the window is day-bounded, never corpus-wide.
    // ONE window pass computes all three columns' lags; the sorted-
    // order run count needs no sort at all (runs after sorting = the
    // distinct count — counted, not simulated). All exact integers.
    QueryDef(
      "q_rle_profile",
      (s: SparkSession, dir: String) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables(s, dir, "events")
          .select(to_date(col("ts")).as("day"), col("ts"), col("event_id"),
            col("event_type"), col("user_id"), cents.as("cents"))
        val w = Window.partitionBy("day").orderBy("ts", "event_id")
        def runCol(c: String) =
          sum(when(col(s"l_$c").isNull || col(c) =!= col(s"l_$c"), 1L)
            .otherwise(0L)).as(s"runs_$c")
        val nat = e
          .withColumn("l_event_type", lag("event_type", 1).over(w))
          .withColumn("l_user_id", lag("user_id", 1).over(w))
          .withColumn("l_cents", lag("cents", 1).over(w))
          .agg(count(lit(1)).as("n"), runCol("event_type"),
            runCol("user_id"), runCol("cents"))
        val srt = e.groupBy("day")
          .agg(countDistinct("event_type").as("dt"),
            countDistinct("user_id").as("du"),
            countDistinct("cents").as("dc"))
          .agg(sum("dt").as("sorted_event_type"), sum("du").as("sorted_user_id"),
            sum("dc").as("sorted_cents"))
        nat.crossJoin(srt)
          .selectExpr(
            """stack(3,
              |  'cents',      n, runs_cents,      sorted_cents,
              |  'event_type', n, runs_event_type, sorted_event_type,
              |  'user_id',    n, runs_user_id,    sorted_user_id
              |) as (col_name, n, runs_natural, runs_sorted)""".stripMargin)
          .select(col("col_name"), col("n"), col("runs_natural"),
            col("runs_sorted"),
            ExactMath.divTrunc(col("runs_natural") * 100L, col("runs_sorted"))
              .as("sort_gain_e2"))
          .orderBy("col_name")
      },
      Some("""WITH e AS (
             |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, ts, event_id,
             |    event_type, user_id, TRY_CAST(round(value*100) AS BIGINT) AS cents
             |  FROM events),
             |l AS (
             |  SELECT *,
             |    lag(event_type) OVER w AS l_t,
             |    lag(user_id) OVER w AS l_u,
             |    lag(cents) OVER w AS l_c
             |  FROM e WINDOW w AS (PARTITION BY day ORDER BY ts, event_id)),
             |nat AS (
             |  SELECT COUNT(*) AS n,
             |    SUM(CASE WHEN l_t IS NULL OR event_type != l_t THEN 1 ELSE 0 END) AS rt,
             |    SUM(CASE WHEN l_u IS NULL OR user_id != l_u THEN 1 ELSE 0 END) AS ru,
             |    SUM(CASE WHEN l_c IS NULL OR cents != l_c THEN 1 ELSE 0 END) AS rc
             |  FROM l),
             |srt AS (
             |  SELECT SUM(dt) AS st, SUM(du) AS su, SUM(dc) AS sc FROM (
             |    SELECT COUNT(DISTINCT event_type) AS dt,
             |      COUNT(DISTINCT user_id) AS du, COUNT(DISTINCT cents) AS dc
             |    FROM e GROUP BY day))
             |SELECT col_name, CAST(n AS BIGINT) AS n,
             |  CAST(runs_natural AS BIGINT) AS runs_natural,
             |  CAST(runs_sorted AS BIGINT) AS runs_sorted,
             |  CAST((runs_natural * 100) // runs_sorted AS BIGINT) AS sort_gain_e2
             |FROM (
             |  SELECT 'cents' AS col_name, n, rc AS runs_natural, sc AS runs_sorted
             |  FROM nat, srt
             |  UNION ALL
             |  SELECT 'event_type', n, rt, st FROM nat, srt
             |  UNION ALL
             |  SELECT 'user_id', n, ru, su FROM nat, srt)
             |ORDER BY col_name""".stripMargin)),

    // ------------------------------------------------------------------
    // q_autocorr ★ (new r5) — lag-1 autocorrelation of the daily volume
    // series per event type: does today's volume predict tomorrow's
    // (regular load / weekly rhythm) or is the series white noise — the
    // seasonality probe next to q_trend_ols's level trend and
    // q_rate_anomaly's deviation tripwire. Same sufficient-statistics
    // discipline as q_trend_ols: ONE corpus→days agg, a days-sized lag
    // window, a types-sized stats agg — Pearson r over the (y_t, y_t+1)
    // pairs reduces to (n, Σx, Σy, Σxy, Σx², Σy²), no second pass. The
    // square root in r is dodged by exporting the exact integer
    // numerator/denominators plus SIGNED r² in e6 — r² = num²/(d1·d2)
    // computed in DECIMAL(38,0) (num² reaches ~1.3e29 at sf0.1 daily
    // volumes, past 2^63; decimal keeps it exact in both engines —
    // headroom to |den| < ~1.3e16, i.e. ~10¹² rows/day before the 38-
    // digit ceiling) with truncating `div` ≡ DuckDB HUGEINT `//`; the
    // sign rides separately (sign(num) = sign(r), den > 0).
    QueryDef(
      "q_autocorr",
      (s: SparkSession, dir: String) => {
        import org.apache.spark.sql.expressions.Window
        val d = Tables(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("y"))
        val w = Window.partitionBy("event_type").orderBy("day")
        val pairs = d.withColumn("x", lag("y", 1).over(w))
          .filter(col("x").isNotNull)
        pairs.groupBy("event_type")
          .agg(count(lit(1)).as("n_pairs"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("event_type"), col("n_pairs"),
            (col("n_pairs") * col("sxy") - col("sx") * col("sy")).as("num"),
            (col("n_pairs") * col("sxx") - col("sx") * col("sx")).as("den1"),
            (col("n_pairs") * col("syy") - col("sy") * col("sy")).as("den2"))
          // degenerate-series guard (same discipline as q_trend_ols):
          // a constant half of the pair series zeroes den1/den2
          .filter(col("den1") > 0L && col("den2") > 0L)
          .select(col("event_type"), col("n_pairs"), col("num"), col("den1"),
            col("den2"),
            (signum(col("num")).cast("long") *
              expr("""(CAST(num AS DECIMAL(38,0)) * CAST(num AS DECIMAL(38,0))
                      | * 1000000) div
                      |(CAST(den1 AS DECIMAL(38,0)) * CAST(den2 AS DECIMAL(38,0)))"""
                .stripMargin)).as("r2_signed_e6"))
          .orderBy("event_type")
      },
      Some("""WITH d AS (
             |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             |    COUNT(*) AS y
             |  FROM events GROUP BY 1, 2),
             |l AS (
             |  SELECT event_type, y,
             |    lag(y) OVER (PARTITION BY event_type ORDER BY day) AS x
             |  FROM d),
             |st AS (
             |  SELECT event_type, COUNT(*) AS n_pairs,
             |    SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
             |    SUM(x*x) AS sxx, SUM(y*y) AS syy
             |  FROM l WHERE x IS NOT NULL GROUP BY 1),
             |c AS (
             |  SELECT event_type, n_pairs,
             |    n_pairs * sxy - sx * sy AS num,
             |    n_pairs * sxx - sx * sx AS den1,
             |    n_pairs * syy - sy * sy AS den2
             |  FROM st)
             |SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
             |  CAST(num AS BIGINT) AS num, CAST(den1 AS BIGINT) AS den1,
             |  CAST(den2 AS BIGINT) AS den2,
             |  CAST(CAST(CASE WHEN num < 0 THEN -1 WHEN num > 0 THEN 1 ELSE 0 END
             |      AS HUGEINT) *
             |    ((CAST(num AS HUGEINT) * CAST(num AS HUGEINT) * 1000000)
             |      // (CAST(den1 AS HUGEINT) * CAST(den2 AS HUGEINT)))
             |    AS BIGINT) AS r2_signed_e6
             |FROM c WHERE den1 > 0 AND den2 > 0
             |ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q_corr_matrix ★ (new r5) — the PAIRWISE correlation matrix
    // between event types' daily volumes: q_autocorr correlates a
    // series with its own lag; this is the multivariate sibling —
    // which metrics move together (the feature-redundancy /
    // common-cause probe of a profiling pass). Day-grain inner join on
    // the date (days where both types occur — identical predicate in
    // both engines), sufficient statistics in one hash agg per pair,
    // then [[corrPairs]]' signed exact r²_e6: sign(num)·num²·1e6 //
    // (den1·den2) in DECIMAL(38,0)/HUGEINT — same ordering as Pearson
    // r, zero libm (no sqrt), NULL on degenerate (constant) series.
    // |types|² pairs of O(days) rows — trivially bounded at any scale.
    QueryDef(
      "q_corr_matrix",
      (s: SparkSession, dir: String) => {
        val daily = Tables(s, dir, "events")
          .groupBy(to_date(col("ts")).as("d"), col("event_type").as("series"))
          .agg(count(lit(1)).as("x"))
        corrPairs(daily).orderBy("t1", "t2")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
             |    event_type AS series, COUNT(*) AS x
             |  FROM events GROUP BY 1, 2),
             |p AS (
             |  SELECT a.series AS t1, b.series AS t2, a.x AS x, b.x AS y
             |  FROM daily a JOIN daily b ON a.d = b.d AND a.series < b.series),
             |st AS (
             |  SELECT t1, t2, COUNT(*) AS n,
             |    SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
             |    SUM(x*x) AS sxx, SUM(y*y) AS syy
             |  FROM p GROUP BY 1, 2),
             |c AS (
             |  SELECT t1, t2, n,
             |    n*sxy - sx*sy AS num,
             |    n*sxx - sx*sx AS den1, n*syy - sy*sy AS den2
             |  FROM st)
             |SELECT t1, t2, CAST(n AS BIGINT) AS n_days,
             |  CASE WHEN den1 = 0 OR den2 = 0
             |    OR abs(num) > 3000000000000000 THEN NULL ELSE
             |    CAST(CAST(CASE WHEN num < 0 THEN -1 ELSE 1 END AS HUGEINT) *
             |      ((CAST(num AS HUGEINT) * CAST(num AS HUGEINT) * 1000000)
             |        // (CAST(den1 AS HUGEINT) * CAST(den2 AS HUGEINT)))
             |      AS BIGINT)
             |  END AS r2_e6
             |FROM c ORDER BY t1, t2""".stripMargin)),

    // ------------------------------------------------------------------
    // q_bootstrap_ci ★ (new r14) — BOOTSTRAP confidence intervals for a
    // per-source corpus metric (the mean quality score), the error bars
    // an eval/curation table needs before acting on a per-source number
    // (a 2-point source's mean is noise; a 2000-doc source's is not —
    // this row quantifies exactly that). Poisson bootstrap (Chamandy et
    // al. 2012 — the resampling scheme that works on a DATA-PARALLEL
    // stream: each doc independently enters replica b with weight
    // w ~ Poisson(1), no global resample), DETERMINISTIC variant: the
    // weight is a pure md5 function of (replica, doc_id) mapped through
    // the exact integer Poisson(1) CDF ladder in e6 units
    // (P(≤k)·1e6 = 367879, 735758, 919698, 981011, 996340, 999406 —
    // identical CASE ladder in both engines, reproducible across
    // runs/shards, the q_split_assign argument applied to resampling).
    // B = 32 replicas; a replica whose total weight is 0 (an EMPTY
    // resample — ~e⁻ⁿ of replicas for an n-doc source, i.e. only
    // relevant for ~1–2 doc sources) has no mean and is EXCLUDED, not
    // counted as 0 (r15 fix; identically HAVING'd out in the oracle).
    // Per source, the surviving replica means' 2nd-smallest /
    // 2nd-largest (degrading to min/max when < 2 survive) are the
    // reported percentile interval (exact ranks, no quantile
    // interpolation to drift between engines). Declared output:
    // n_docs, the point estimate, lo/hi, and the halfwidth.
    // Plan: ONE pass over docs × a 32-wide replica explode (constant
    // fan-out, map-only, the score fold is a plan constant) → a
    // (source × 32)-group agg (map-side combined) → source-partitioned
    // rank window over 32-row groups → ≤ sources-group agg. All exact
    // integers; truncating division on the (possibly signed) replica
    // sums matches DuckDB `//` by the ExactMath contract.
    QueryDef(
      "q_bootstrap_ci",
      (s: SparkSession, dir: String) => {
        import org.apache.spark.sql.expressions.Window
        val b = 32
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id"), col("source"), TextQueries.qcScoreE6.as("x"))
        val rep = docs.select(col("doc_id"), col("source"), col("x"),
            explode(expr(s"sequence(0, ${b - 1})")).as("r"))
          .withColumn("u", pmod(graft.functions.Md5Ops.md5Prefix(concat(lit("bs"),
            col("r").cast("string"), lit(":"), col("doc_id").cast("string")), 15), lit(1000000L)))
          .withColumn("w",
            when(col("u") < 367879L, 0L).when(col("u") < 735758L, 1L)
              .when(col("u") < 919698L, 2L).when(col("u") < 981011L, 3L)
              .when(col("u") < 996340L, 4L).when(col("u") < 999406L, 5L)
              .otherwise(6L))
        val means = rep.groupBy("source", "r")
          .agg(sum(col("w") * col("x")).as("sw"), sum("w").as("n"))
          .filter(col("n") > 0L) // an empty resample has NO mean — it is
          // excluded, not counted as 0 (r15: for a 1–2 doc source ~37%
          // of replicas draw total weight 0 and would otherwise drag
          // lo_e6 to 0 regardless of the data)
          .select(col("source"), col("r"),
            ExactMath.divTrunc(col("sw"), col("n")).as("m"))
        val rk = Window.partitionBy("source").orderBy(col("m"), col("r"))
        val rkd = Window.partitionBy("source")
          .orderBy(col("m").desc, col("r").desc)
        val cw = Window.partitionBy("source")
        val ranked = means
          .withColumn("rn", row_number().over(rk))
          .withColumn("rnd", row_number().over(rkd))
          .withColumn("cnt", count(lit(1)).over(cw))
          .groupBy("source")
          .agg(min(when(col("rn") === least(lit(2L), col("cnt")), col("m")))
            .as("lo_e6"),
            max(when(col("rnd") === least(lit(2L), col("cnt")), col("m")))
              .as("hi_e6"))
        val pt = docs.groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("x").as("sx"))
          .select(col("source"), col("n_docs"),
            ExactMath.divTrunc(col("sx"), col("n_docs")).as("point_e6"))
        pt.join(ranked, "source")
          .withColumn("halfwidth_e6",
            ExactMath.divTrunc(col("hi_e6") - col("lo_e6"), lit(2L)))
          .orderBy("source")
      },
      Some(s"""WITH ${TextQueries.QcScoreSql},
             |rep AS (
             |  SELECT sc.doc_id, sc.source, sc.z AS x,
             |    unnest(range(0, 32)) AS r
             |  FROM sc),
             |wts AS (
             |  SELECT doc_id, source, x, r,
             |    ('0x' || substring(md5('bs' || r || ':' || doc_id), 1, 15))::BIGINT
             |      % 1000000 AS u
             |  FROM rep),
             |wt AS (
             |  SELECT source, r, x,
             |    CASE WHEN u < 367879 THEN 0 WHEN u < 735758 THEN 1
             |         WHEN u < 919698 THEN 2 WHEN u < 981011 THEN 3
             |         WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
             |         ELSE 6 END AS w
             |  FROM wts),
             |means AS (
             |  SELECT source, r,
             |    CAST(SUM(w * x) AS BIGINT) // CAST(SUM(w) AS BIGINT) AS m
             |  FROM wt GROUP BY 1, 2 HAVING SUM(w) > 0),
             |ranked AS (
             |  SELECT source, m,
             |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY m, r) AS rn,
             |    ROW_NUMBER() OVER (PARTITION BY source
             |                       ORDER BY m DESC, r DESC) AS rnd,
             |    COUNT(*) OVER (PARTITION BY source) AS cnt
             |  FROM means),
             |ci AS (
             |  SELECT source,
             |    CAST(MIN(CASE WHEN rn = LEAST(2, cnt) THEN m END)
             |      AS BIGINT) AS lo_e6,
             |    CAST(MAX(CASE WHEN rnd = LEAST(2, cnt) THEN m END)
             |      AS BIGINT) AS hi_e6
             |  FROM ranked GROUP BY 1),
             |pt AS (
             |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |    CAST(SUM(z) AS BIGINT) // COUNT(*) AS point_e6
             |  FROM sc GROUP BY 1)
             |SELECT pt.source, pt.n_docs, pt.point_e6, ci.lo_e6, ci.hi_e6,
             |  (ci.hi_e6 - ci.lo_e6) // 2 AS halfwidth_e6
             |FROM pt JOIN ci ON ci.source = pt.source
             |ORDER BY pt.source""".stripMargin))
  )
}
