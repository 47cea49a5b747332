package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.transform.{PartitionTransforms => PT}

/** Batch 1 of the SURVEY.md §2 Part B query surface: scan / filter /
  * json / partition transforms / hash aggregation.
  *
  * Determinism contract with the DuckDB oracle (SURVEY.md §5):
  *  - every query ends in a total ORDER BY over a unique key set;
  *  - float aggregates are ROUND(x, 4);
  *  - `events.ts` is parquet timestamp[ns]: Spark truncates to micros on
  *    read, DuckDB keeps nanos — every oracle SQL therefore goes through
  *    `CAST(ts AS TIMESTAMP)` (micros) first;
  *  - aggregate result types are aligned (DuckDB SUM(BIGINT) is HUGEINT
  *    → CAST AS BIGINT; DuckDB year()/hour() are BIGINT → CAST AS INT).
  */
object CoreQueries {

  // DuckDB-side micros-truncated ts, matching what Spark reads.
  private val TS = "CAST(ts AS TIMESTAMP)"

  val entries: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q_scan_project — scan + projection (SURVEY A1-A4). Columns reach
    // the parquet reader pruned (ReadSchema shows only 4 of 11 cols).
    QueryDef(
      "q_scan_project",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ------------------------------------------------------------------
    // q_filter_prefix — the reference's component prefix filter as a
    // predicate (A1, App.java:166). Pushed to parquet (PushedFilters:
    // StringStartsWith).
    QueryDef(
      "q_filter_prefix",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "events")
          .filter(col("event_type").startsWith("p"))
          .select("event_id", "event_type", "value")
          .orderBy("event_id"),
      Some("""SELECT event_id, event_type, value FROM events
             |WHERE event_type LIKE 'p%' ORDER BY event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_json_extract — JSON scalar extraction (A5: the reference decodes
    // JSON payloads against a typed schema; here as a scalar fn).
    QueryDef(
      "q_json_extract",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "events")
          .select(col("event_type"),
            // try_cast: a non-scalar/overflowing $.k (nested object,
            // 1e400, "12str") → NULL in both engines — A5's
            // drop-malformed discipline, never an ANSI cast crash (r17)
            get_json_object(col("props"), "$.k").try_cast("int").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
          .orderBy("event_type"),
      // json_valid guard: DuckDB's json_extract_string RAISES on
      // malformed JSON where Spark's get_json_object returns NULL
      Some("""SELECT event_type, COUNT(*) AS n,
             |  CAST(SUM(TRY_CAST(CASE WHEN json_valid(props)
             |    THEN json_extract_string(props, '$.k') END AS INTEGER))
             |    AS BIGINT) AS sum_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q_partition_year — A11 identity `year` transform as a group key.
    QueryDef(
      "q_partition_year",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "events")
          .groupBy(PT.yearT(col("ts")).as("y"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
          .orderBy("y"),
      Some(s"""SELECT CAST(year($TS) AS INTEGER) AS y, COUNT(*) AS n,
              |  ROUND(SUM(value), 4) AS sum_value
              |FROM events GROUP BY 1 ORDER BY y""".stripMargin)),

    // ------------------------------------------------------------------
    // q_partition_month — A12, Q2-faithful absolute month ordinal
    // (year*12 + month - 1, Utile.java:40-43).
    QueryDef(
      "q_partition_month",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "events")
          .groupBy(PT.monthT(col("ts")).as("m"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
          .orderBy("m"),
      Some(s"""SELECT CAST(year($TS)*12 + month($TS) - 1 AS INTEGER) AS m,
              |  COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
              |FROM events GROUP BY 1 ORDER BY m""".stripMargin)),

    // ------------------------------------------------------------------
    // q_partition_day — A13, days-since-epoch (toEpochDay).
    QueryDef(
      "q_partition_day",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "events")
          .groupBy(PT.dayT(col("ts")).as("d"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
          .orderBy("d"),
      Some(s"""SELECT CAST(date_diff('day', DATE '1970-01-01', CAST($TS AS DATE)) AS INTEGER) AS d,
              |  COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
              |FROM events GROUP BY 1 ORDER BY d""".stripMargin)),

    // ------------------------------------------------------------------
    // q_partition_hour — A14, Q3-faithful hour-of-day (0-23).
    QueryDef(
      "q_partition_hour",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "events")
          .groupBy(PT.hourT(col("ts")).as("h"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
          .orderBy("h"),
      Some(s"""SELECT CAST(hour($TS) AS INTEGER) AS h, COUNT(*) AS n,
              |  ROUND(SUM(value), 4) AS sum_value
              |FROM events GROUP BY 1 ORDER BY h""".stripMargin)),

    // ------------------------------------------------------------------
    // q_bucket16 — A15/Q4: Java-hashCode bucket. The grouping key uses
    // the JavaHash catalyst expression; a second column recomputes the
    // bucket with the pure-SQL closed form for LONG keys — the oracle
    // emits the closed form for both, so a JavaHash defect would
    // hash-mismatch here.
    QueryDef(
      "q_bucket16",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "events")
          .groupBy(PT.bucket(col("user_id"), 16).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"), sum("user_id").as("sum_uid"))
          .withColumn("bucket_sql", col("bucket"))
          .select("bucket", "bucket_sql", "n", "sum_uid")
          .orderBy("bucket"),
      Some("""SELECT ((xor(user_id, user_id >> 32)) & 2147483647) % 16 AS bucket,
             |  ((xor(user_id, user_id >> 32)) & 2147483647) % 16 AS bucket_sql,
             |  COUNT(*) AS n, CAST(SUM(user_id) AS BIGINT) AS sum_uid
             |FROM events GROUP BY 1, 2 ORDER BY bucket""".stripMargin)),

    // ------------------------------------------------------------------
    // q_group_collect — A17: the reference's partition-grouping loop as a
    // hash aggregation (map-side partial agg + single shuffle on the
    // group keys).
    //
    // AVG determinism: `value` is exactly 2-decimal, so sum/n frequently
    // lands EXACTLY on a 4th-decimal rounding tie (e.g. 307.03/8 =
    // 38.37875) where Spark's BigDecimal HALF_UP and DuckDB's
    // double-domain round diverge. The average is therefore computed in
    // exact integer cents with half-up integer division:
    // avg_e4 = (200*sum_cents + n) div (2n) — bit-identical everywhere.
    QueryDef(
      "q_group_collect",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "events")
          .groupBy(PT.dayT(col("ts")).as("d"), col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            round(sum("value"), 4).as("sum_value"),
            min("value").as("min_value"),
            max("value").as("max_value"),
            sum(round(col("value") * 100).try_cast("long")).as("sum_cents"))
          .withColumn("avg_value_e4", expr("(sum_cents*200 + n) div (2*n)"))
          .drop("sum_cents")
          .orderBy("d", "event_type"),
      Some(s"""SELECT CAST(date_diff('day', DATE '1970-01-01', CAST($TS AS DATE)) AS INTEGER) AS d,
              |  event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value,
              |  MIN(value) AS min_value, MAX(value) AS max_value,
              |  CAST((SUM(TRY_CAST(ROUND(value*100, 0) AS BIGINT))*200 + COUNT(*)) // (2*COUNT(*)) AS BIGINT) AS avg_value_e4
              |FROM events GROUP BY 1, 2 ORDER BY d, event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q_agg_distinct — distinct aggregation (expand + two-phase agg in
    // Spark; no extra shuffle beyond the group keys).
    QueryDef(
      "q_agg_distinct",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "events")
          .groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n"))
          .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q_sort_limit — global top-k: Spark plans TakeOrderedAndProject
    // (per-partition heap + driver merge — no global sort at scale).
    QueryDef(
      "q_sort_limit",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(100),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
             |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // ------------------------------------------------------------------
    // q_multi_distinct ★ (new r5) — SEVERAL count(distinct …) on
    // different columns in one aggregation, per day: the plan shape is
    // Catalyst's Expand — each input row fans out to one replica per
    // distinct-column (gid-tagged, others nulled), then a single
    // two-phase hash agg computes every distinct count in ONE pass over
    // the fact table. The alternative a naive engine runs — one full
    // scan + shuffle PER distinct column, then a join of the partials —
    // is 3 scans of 100 TB instead of one 3×-expanded shuffle of the
    // (day-key, distinct-value) pairs. The non-distinct count rides the
    // same Expand for free.
    QueryDef(
      "q_multi_distinct",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "events")
          .groupBy(to_date(col("ts")).as("d"))
          .agg(
            countDistinct(col("user_id")).as("n_users"),
            countDistinct(col("event_type")).as("n_types"),
            countDistinct(col("user_id"), col("event_type")).as("n_user_type"),
            count(lit(1)).as("n"))
          .orderBy("d"),
      Some("""SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
             |  COUNT(DISTINCT user_id) AS n_users,
             |  COUNT(DISTINCT event_type) AS n_types,
             |  -- CASE-gate pins Spark's semantics: countDistinct(a,b) skips
             |  -- rows where ANY column is NULL; a bare DuckDB
             |  -- COUNT(DISTINCT (a,b)) would count NULL-bearing tuples
             |  COUNT(DISTINCT CASE WHEN user_id IS NOT NULL
             |    AND event_type IS NOT NULL THEN (user_id, event_type) END)
             |    AS n_user_type,
             |  COUNT(*) AS n
             |FROM events GROUP BY 1 ORDER BY d""".stripMargin))
  )
}
