package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Batch 4 of the SURVEY.md §2 Part B surface: the type system — the
  * coercion matrix (A6, reference `App.java:241-274`), nested struct
  * construction/access (A7), array functions (A8), map functions (A9).
  *
  * Cross-engine cast determinism (why every cast below is written the
  * way it is):
  *  - double→integer: Spark CAST truncates toward zero, DuckDB CAST
  *    rounds — the oracle therefore goes through TRUNC() first;
  *  - double→decimal(12,2): both engines round to nearest; inputs are
  *    2-decimal by construction so no representable tie exists. The
  *    decimal itself is exported as exact integer cents (`v_dec_e2`):
  *    a raw DECIMAL column reaches the driver as python Decimal('50.00')
  *    from Spark parquet but float 50.0 from DuckDB, so the hash compare
  *    diverges on representation while values are equal (bisected:
  *    CORRECTNESS_r01 q_cast_matrix hash_match=false, v_dec the only
  *    string-unequal column);
  *  - timestamp from epoch seconds (the Q1 rebuild decision,
  *    SURVEY.md §1.4): both sides build micros explicitly and construct
  *    the timestamp from the integer — no engine-specific epoch cast;
  *  - timestamp→string is NOT tested (fraction-trimming differs);
  *    date→string is identical in both engines.
  */
object TypesQueries {

  val entries: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q_cast_matrix — A6: one projection exercising the full scalar
    // coercion surface of the reference's type switch.
    QueryDef(
      "q_cast_matrix",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "events")
          .select(
            col("event_id"),
            // try_cast throughout the double→exact edges: a NaN/±Inf/
            // out-of-range measure coerces to NULL in BOTH engines (the
            // reference's switch drops unrepresentable values the same
            // way) instead of killing the job under ANSI (r17 sweep)
            col("value").try_cast("long").as("v_long"),
            col("value").try_cast("int").as("v_int"),
            (col("value").try_cast(DecimalType(12, 2)) * 100).cast("long")
              .as("v_dec_e2"),
            col("value").cast("float").as("v_float"),
            (col("value") > 50).as("v_bool"),
            col("user_id").cast("double").as("uid_double"),
            col("user_id").cast("string").as("uid_str"),
            col("ts").cast("date").as("d"),
            col("ts").cast("date").cast("string").as("d_str"),
            // Q1 decision: epoch-seconds double → proper timestamp.
            // Domain-bounded to ±9.2e9 s (the int64-NANOSECONDS
            // interchange window, ~±292 years — arrow/pandas wrap
            // beyond it); outside → NULL, the A6 drop-malformed rule.
            when(abs(col("value")) <= lit(9.2e9),
              timestamp_micros((col("value") * lit(1000000.0)).try_cast("long")))
              .as("ts_from_epoch"))
          .orderBy("event_id"),
      // DuckDB quirk (probed): TRY_CAST(NaN AS DECIMAL) still raises, so
      // the decimal edge guards with isfinite() instead.
      Some("""SELECT event_id,
             |  TRY_CAST(TRUNC(value) AS BIGINT) AS v_long,
             |  TRY_CAST(TRUNC(value) AS INTEGER) AS v_int,
             |  CAST(CASE WHEN NOT isfinite(value) THEN NULL
             |       ELSE TRY_CAST(value AS DECIMAL(12,2)) END * 100 AS BIGINT)
             |    AS v_dec_e2,
             |  CAST(value AS FLOAT) AS v_float,
             |  value > 50 AS v_bool,
             |  CAST(user_id AS DOUBLE) AS uid_double,
             |  CAST(user_id AS VARCHAR) AS uid_str,
             |  CAST(ts AS DATE) AS d,
             |  CAST(CAST(ts AS DATE) AS VARCHAR) AS d_str,
             |  CASE WHEN abs(value) <= 9.2e9 THEN
             |    make_timestamp(TRY_CAST(TRUNC(value * 1000000.0) AS BIGINT))
             |  END AS ts_from_epoch
             |FROM events ORDER BY event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_nested_struct — A7: struct build + dot-path field access at two
    // nesting depths. The FINAL projection is scalar leaves only: the
    // driver's pandas comparator cannot sort/hash struct cells
    // (CORRECTNESS_r01 'unhashable type: dict' crash), so the struct is
    // exercised inside the plan and every output column is a leaf.
    // Struct round-trip through parquet stays asserted in TypesSpec.
    QueryDef(
      "q_nested_struct",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            struct(
              col("l_returnflag").as("flag"),
              col("l_linestatus").as("status"),
              struct(col("l_shipdate").as("ship"),
                col("l_quantity").as("qty")).as("detail")).as("info"))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            col("info.flag").as("flag"),
            upper(col("info.status")).as("status_u"),
            col("info.detail.ship").as("ship"),
            col("info.detail.qty").cast("long").as("qty"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  l_returnflag AS flag,
             |  UPPER(l_linestatus) AS status_u,
             |  l_shipdate AS ship,
             |  CAST(l_quantity AS BIGINT) AS qty
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ------------------------------------------------------------------
    // q_array_ops — A8: split / size / distinct / contains / sort /
    // element_at / higher-order filter over tokenized documents. All
    // codegen'd array expressions; no UDF.
    QueryDef(
      "q_array_ops",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(
            col("doc_id"),
            size(col("toks")).as("n_tokens"),
            size(array_distinct(col("toks"))).as("n_distinct"),
            array_contains(col("toks"), "spark").as("has_spark"),
            element_at(sort_array(col("toks")), 1).as("first_tok"),
            element_at(sort_array(col("toks"), asc = false), 1).as("last_tok"),
            size(expr("filter(toks, t -> length(t) > 4)")).as("n_long_toks"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
             |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
             |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
             |  list_sort(string_split(text, ' '))[1] AS first_tok,
             |  list_reverse_sort(string_split(text, ' '))[1] AS last_tok,
             |  CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS INTEGER) AS n_long_toks
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_map_ops — A9: map build / element_at / keys / concat, string
    // keys only (the reference throws on non-string keys, Q9 —
    // enforced in the ingest path; here the query surface). The FINAL
    // projection is scalars only (the driver comparator cannot hash
    // array/map cells — CORRECTNESS_r01 crash); key order is pinned by
    // both engines to insertion order, so the joined key string is
    // deterministic. DuckDB 1.0 expresses the same plan with MAP(ks,vs),
    // m[k][1] extraction, map_keys and map_concat — a real cross-engine
    // oracle, upgrading this row from rows-only to hash-checked.
    QueryDef(
      "q_map_ops",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .select(col("doc_id"),
            map_from_arrays(
              array(lit("lang"), lit("source")),
              array(col("lang"), col("source"))).as("m"))
          .select(
            col("doc_id"),
            element_at(col("m"), "lang").as("lang"),
            concat_ws(",", map_keys(col("m"))).as("ks_str"),
            map_concat(col("m"),
              map(lit("const"), lit("x"))).as("m2"))
          .select(col("doc_id"), col("lang"), col("ks_str"),
            element_at(col("m2"), "const").as("const_v"),
            size(col("m2")).as("m2_size"))
          .orderBy("doc_id"),
      Some("""WITH m0 AS (
             |  SELECT doc_id, MAP(['lang','source'], [lang, source]) AS m
             |  FROM documents),
             |m1 AS (
             |  SELECT doc_id,
             |    m['lang'][1] AS lang,
             |    array_to_string(map_keys(m), ',') AS ks_str,
             |    map_concat(m, MAP(['const'],['x'])) AS m2
             |  FROM m0)
             |SELECT doc_id, lang, ks_str,
             |  m2['const'][1] AS const_v,
             |  CAST(cardinality(m2) AS INTEGER) AS m2_size
             |FROM m1 ORDER BY doc_id""".stripMargin))
  )
}
