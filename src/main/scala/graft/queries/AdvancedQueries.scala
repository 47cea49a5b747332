package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Batch 10 — operators beyond vanilla SQL that a reference user's
  * analytics stack grows into: as-of (nearest-earlier) joins and
  * sketch-based approximate aggregation.
  */
object AdvancedQueries {

  val entries: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q_sample_hash ★ — deterministic hash-based 10% sample of the
    // document corpus: keep rows whose 60-bit md5(doc_id) ≡ 0 (mod 10).
    // The reproducible-downsampling primitive of a training-data
    // pipeline — no RNG state, so the sample is identical across runs,
    // engines, cluster sizes, and retries (rand()-based sampling is
    // none of those), composes with any stratification for free (a
    // uniform hash is uniform within every stratum), and a row's
    // membership is decidable locally (map-only filter, no shuffle;
    // extending the sample 10% → 20% keeps the first 10% — nested
    // samples by construction). Per-lang counts verify uniformity in
    // the oracle alongside the sampled ids themselves.
    QueryDef(
      "q_sample_hash",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .filter(pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("long"), lit(10L)) === 0L)
          .select(col("doc_id"), col("lang"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, lang FROM documents
             |WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 = 0
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_asof_join — the as-of join Spark has no native operator for,
    // composed scalably as tagged-union + window (one shuffle + sort on
    // (user, time), NO range-join explosion): for each purchase event,
    // the most recent error event of the same user at or before it.
    // At equal timestamps the error sorts first (tag 0 < 1), matching
    // the oracle's `e.ts <= p.ts`. DuckDB verifies with its native
    // ASOF LEFT JOIN — two engines, two algorithms, same rows.
    QueryDef(
      "q_asof_join",
      (s: SparkSession, dir: String) => {
        val ev = Tables(s, dir, "events")
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"), lit(0).as("tag"),
            lit(null).cast("long").as("event_id"), col("ts").as("err_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(1).as("tag"),
            col("event_id"), lit(null).cast("timestamp").as("err_ts"))
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("tag"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        errors.unionByName(purchases)
          .withColumn("last_error_ts", last(col("err_ts"), ignoreNulls = true).over(w))
          .filter(col("tag") === 1)
          .select(col("event_id"), col("user_id"), col("last_error_ts"))
          .orderBy("event_id")
      },
      Some("""SELECT p.event_id, p.user_id, e.ts AS last_error_ts
             |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |      FROM events WHERE event_type = 'purchase') p
             |ASOF LEFT JOIN
             |     (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
             |      FROM events WHERE event_type = 'error') e
             |  ON p.user_id = e.user_id AND e.ts <= p.ts
             |ORDER BY p.event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_cube — CUBE grouping over (returnflag, linestatus) with
    // grouping() indicators: all 2^2 grouping-set combinations in one
    // pass (Catalyst expands to a single shuffle with a grouping-id
    // column, not 4 scans).
    QueryDef(
      "q_cube",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            round(sum("l_quantity"), 2).as("sum_qty"),
            grouping(col("l_returnflag")).cast("long").as("g_flag"),
            grouping(col("l_linestatus")).cast("long").as("g_status"))
          .orderBy(col("g_flag"), col("g_status"),
            col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             |  ROUND(SUM(l_quantity), 2) AS sum_qty,
             |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
             |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
             |FROM lineitem
             |GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin)),

    // ------------------------------------------------------------------
    // q_window_range — interval RANGE frame (event-time sliding sum):
    // per user, the sum of values in the trailing hour. Unlike a ROWS
    // frame this is value-based — the frame a time-series pipeline
    // actually wants.
    QueryDef(
      "q_window_range",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
          .withColumn("hour_sum",
            round(expr("sum(value) OVER (PARTITION BY user_id ORDER BY ts " +
              "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"), 4))
          .select(col("event_id"), col("user_id"), col("hour_sum"))
          .orderBy("event_id"),
      Some("""SELECT event_id, user_id,
             |  ROUND(SUM(value) OVER (PARTITION BY user_id
             |    ORDER BY CAST(ts AS TIMESTAMP)
             |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 4)
             |    AS hour_sum
             |FROM events ORDER BY event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_approx_distinct — HyperLogLog++ distinct-user counts per event
    // type (constant memory per group vs exact distinct's shuffle of
    // every key — the 100 TB cardinality primitive). Sketches are not
    // engine-portable → no DuckDB oracle; AdvancedSpec bounds the error
    // against the exact count.
    QueryDef(
      "q_approx_distinct",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "events")
          .groupBy("event_type")
          .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
            count(lit(1)).as("n"))
          .orderBy("event_type"),
      None)
  )
}
