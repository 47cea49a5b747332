package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Batch 10 — operators beyond vanilla SQL that a reference user's
  * analytics stack grows into: deterministic hash/stratified sampling,
  * as-of and bucketized range/band joins, CUBE and interval RANGE
  * frames, exact per-group percentiles, sketch-based approximate
  * aggregation, and the training-pipeline assembly steps (data-mixing
  * weights, sequence packing).
  */
object AdvancedQueries {

  /** 32-bit Morton/Z-order interleave of two 16-bit values: bit i of
    * `x` lands at position 2i, bit i of `y` at 2i+1. Built as a STATIC
    * 32-term bitwise expression tree (shift/and/or of built-ins), so it
    * compiles into one WholeStageCodegen projection — no UDF, no loop
    * at eval time. The pure-Scala twin [[zorder16Ref]] pins the bit
    * layout in AdvancedSpec.
    */
  private[graft] def zorder16(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Reference implementation of [[zorder16]] for specs. */
  private[graft] def zorder16Ref(x: Long, y: Long): Long =
    (0 until 16).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  /** The identical 32-term formula as DuckDB SQL over columns x, y. */
  private val ZExprSql: String =
    (0 until 16).map(i =>
      s"(((x >> $i) & 1) << ${2 * i}) | (((y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")

  val entries: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q_zorder ★ — Z-order (Morton-curve) clustering assignment over
    // two join/filter dimensions of `lineitem`, the multi-column
    // data-skipping primitive behind Delta/Iceberg `OPTIMIZE ZORDER`:
    // sort-by-z bounds EVERY interleaved dimension's min/max within
    // each file, so a scan with a predicate on EITHER column can prune
    // files (a plain sort bounds only its leading column). The declared
    // query computes the z-value (map-only, one codegen'd projection —
    // the cost at 100 TB is the write-side sort it would feed), splits
    // the curve into 16 equal z-ranges standing in for output files,
    // and emits each range's per-dimension min/max — exactly the
    // file-footer stats a pruning scan would read. By construction
    // bucket = top-4 z bits = (top-2 bits of x) ⊗ (top-2 bits of y), so
    // each "file" spans ≤ 1/4 of each dimension — the locality the
    // spec asserts. Keys are folded into the 16-bit curve domain with
    // an explicit mod (a production writer rescales by range/quantile
    // instead; the curve math is unchanged).
    QueryDef(
      "q_zorder",
      (s: SparkSession, dir: String) => {
        val xy = Tables(s, dir, "lineitem")
          .select(pmod(col("l_partkey"), lit(65536L)).as("x"),
            pmod(col("l_suppkey"), lit(65536L)).as("y"))
        xy.withColumn("bucket", shiftright(zorder16(col("x"), col("y")), 28))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"),
            min("x").as("x_min"), max("x").as("x_max"),
            min("y").as("y_min"), max("y").as("y_max"))
          .orderBy("bucket")
      },
      Some(s"""WITH b AS (
              |  SELECT l_partkey % 65536 AS x, l_suppkey % 65536 AS y
              |  FROM lineitem),
              |z AS (SELECT x, y, ($ZExprSql) AS z FROM b)
              |SELECT z >> 28 AS bucket, COUNT(*) AS n,
              |  MIN(x) AS x_min, MAX(x) AS x_max,
              |  MIN(y) AS y_min, MAX(y) AS y_max
              |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin)),


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
          .filter(pmod(graft.functions.Md5Ops.md5Prefix(col("doc_id").cast("string"), 15), lit(10L)) === 0L)
          .select(col("doc_id"), col("lang"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, lang FROM documents
             |WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 = 0
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_countmin ★ (new r5) — Count-Min sketch of the corpus token
    // frequencies, built PORTABLY (4 hash rows × 1024 buckets, each
    // row's hash = 60-bit md5 of "<row>:<token>" mod 1024 — the same
    // cross-engine hash family as q_sample_hash, so Spark and DuckDB
    // build the IDENTICAL sketch) and then interrogated: for the top-20
    // exact tokens, the CMS estimate = min over rows of the hit
    // bucket's total. Every number is exact integers, which makes the
    // sketch's defining guarantee — estimate ≥ truth, overcount =
    // collision mass only — an ORACLE-CHECKED equality, not a property
    // test. Scale story: the sketch is a mergeable 4×1024 aggregate
    // (map-side partial, one tiny shuffle) answering point frequency
    // queries over any vocabulary size in O(1) memory — what you keep
    // when the exact token table itself is too big to retain, with
    // ε = e/1024 ≈ 0.3% of corpus mass error at δ = e⁻⁴.
    //
    // Since r11 the sketch is built from the exact vocabulary aggregate
    // WEIGHTED BY COUNT rather than by hashing every token instance:
    // cms[r][b] = Σ_{t: h_r(t)=b} exact(t) is the identical array (the
    // oracle's per-instance build proves it, row for row), but the 4
    // md5s run once per TYPE, not once per instance — at gen-sf1 that
    // is 4×47k hashes instead of 4×10M (measured 18.8 → ~3 s; the
    // corpus pass left is the unavoidable exact agg). A live streaming
    // sketch hashes instances because it never holds the type table;
    // a batch build over a corpus that already pays the type agg for
    // the probe side should hash types.
    QueryDef(
      "q_countmin",
      (s: SparkSession, dir: String) => {
        val toks = Tables(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("t"))
        // both the sketch and the top-k probe consume this — persisted
        // + eager, vocabulary-sized
        val exactLazy = toks.groupBy("t").agg(count(lit(1)).as("exact"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val exact = { exactLazy.count(); exactLazy }
        def bucket(row: org.apache.spark.sql.Column,
            tok: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          pmod(graft.functions.Md5Ops.md5Prefix(concat(row.cast("string"), lit(":"), tok), 15), lit(1024L))
        val hashed = exact
          .select(explode(sequence(lit(0), lit(3))).as("r"), col("t"), col("exact"))
          .select(col("r"), bucket(col("r"), col("t")).as("b"), col("exact"))
        val cms = hashed.groupBy("r", "b").agg(sum("exact").as("m"))
        val top = exact.orderBy(desc("exact"), asc("t")).limit(20)
        top.select(col("t"), col("exact"),
          explode(sequence(lit(0), lit(3))).as("r"))
          .withColumn("b", bucket(col("r"), col("t")))
          .join(cms, Seq("r", "b"))
          .groupBy("t", "exact").agg(min("m").as("est"))
          .select(col("t"), col("exact"), col("est"),
            (col("est") - col("exact")).as("overcount"))
          .orderBy(desc("exact"), asc("t"))
      },
      Some("""WITH toks AS (
             |  SELECT unnest(string_split(text, ' ')) AS t FROM documents),
             |exact AS (SELECT t, COUNT(*) AS exact FROM toks GROUP BY 1),
             |hashed AS (
             |  SELECT r, ('0x' || substring(md5(CAST(r AS VARCHAR) || ':' || t),
             |    1, 15))::BIGINT % 1024 AS b
             |  FROM toks, range(4) x(r)),
             |cms AS (SELECT r, b, COUNT(*) AS m FROM hashed GROUP BY 1, 2),
             |top AS (SELECT t, exact FROM exact
             |        ORDER BY exact DESC, t LIMIT 20),
             |probe AS (
             |  SELECT top.t, top.exact, x.r,
             |    ('0x' || substring(md5(CAST(x.r AS VARCHAR) || ':' || top.t),
             |      1, 15))::BIGINT % 1024 AS b
             |  FROM top, range(4) x(r))
             |SELECT p.t, CAST(p.exact AS BIGINT) AS exact,
             |  CAST(MIN(cms.m) AS BIGINT) AS est,
             |  CAST(MIN(cms.m) - p.exact AS BIGINT) AS overcount
             |FROM probe p JOIN cms ON p.r = cms.r AND p.b = cms.b
             |GROUP BY p.t, p.exact
             |ORDER BY exact DESC, t""".stripMargin)),

    // ------------------------------------------------------------------
    // q_feature_hash ★ (new r5) — the HASHING TRICK: each document's
    // token multiset vectorized into a fixed 256-dim count vector by
    // dim = 60-bit md5(token) mod 256 (the cross-engine hash family
    // again) — the dimensionality-fixing move that lets a linear
    // model/logreg train over an UNBOUNDED vocabulary with constant
    // per-row memory and no global dictionary (no vocabulary shuffle,
    // no OOV problem; collisions are the accepted noise). Declared
    // output is the per-doc vector SUMMARY in exact integers — nnz
    // (occupied dims), l²² norm, the peak dim load — rather than 500
    // 256-wide rows; the full vector is the same frame pre-pivot.
    // Map-side hash + one (doc, dim) agg + one doc agg: scan-speed at
    // any corpus size.
    QueryDef(
      "q_feature_hash",
      (s: SparkSession, dir: String) => {
        val dims = Tables(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
          .select(col("doc_id"),
            pmod(graft.functions.Md5Ops.md5Prefix(col("t"), 15),
              lit(256L)).as("dim"))
          .groupBy("doc_id", "dim").agg(count(lit(1)).as("c"))
        dims.groupBy("doc_id")
          .agg(count(lit(1)).as("nnz"),
            sum(col("c") * col("c")).as("l2sq"),
            max("c").as("max_dim_load"),
            sum("c").as("n_tokens"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS t
             |  FROM documents),
             |dims AS (
             |  SELECT doc_id,
             |    ('0x' || substring(md5(t), 1, 15))::BIGINT % 256 AS dim,
             |    COUNT(*) AS c
             |  FROM toks GROUP BY 1, 2)
             |SELECT doc_id, COUNT(*) AS nnz,
             |  CAST(SUM(c*c) AS BIGINT) AS l2sq,
             |  CAST(MAX(c) AS BIGINT) AS max_dim_load,
             |  CAST(SUM(c) AS BIGINT) AS n_tokens
             |FROM dims GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_split_assign ★ (new r5) — deterministic train/val/test split:
    // the disjoint-partition sibling of q_sample_hash's sampling. Every
    // document lands in exactly one split by 60-bit md5(doc_id) mod 100
    // (< 90 train, < 95 val, else test) — no RNG state, so the split is
    // identical across runs/engines/cluster sizes, a document NEVER
    // migrates between splits as the corpus grows (membership is a pure
    // function of the id), and eval contamination by re-shuffling is
    // impossible by construction. Map-only assignment + one small hash
    // agg per (source, split): counts and token sums — the table a
    // training run reads to weight its loaders. Salting/stratification
    // compose for free (uniform hash is uniform within every stratum).
    QueryDef(
      "q_split_assign",
      (s: SparkSession, dir: String) => {
        val h = pmod(graft.functions.Md5Ops.md5Prefix(col("doc_id").cast("string"), 15), lit(100L))
        Tables(s, dir, "documents")
          .select(col("source"),
            when(h < 90, "train").when(h < 95, "val").otherwise("test").as("split"),
            size(split(col("text"), " ")).cast("long").as("toks"))
          .groupBy("source", "split")
          .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
          .orderBy("source", "split")
      },
      Some("""WITH d AS (
             |  SELECT source,
             |    CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90 THEN 'train'
             |         WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 95 THEN 'val'
             |         ELSE 'test' END AS split,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
             |  FROM documents)
             |SELECT source, split, COUNT(*) AS n_docs,
             |  CAST(SUM(toks) AS BIGINT) AS n_tokens
             |FROM d GROUP BY source, split ORDER BY source, split""".stripMargin)),

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
             |HAVING COUNT(*) > 0
             |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin)),
             // HAVING COUNT(*)>0: the q_rollup empty-table rule (r17)

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
    // q_range_join — big-big band join WITHOUT a nested loop: for each
    // click event, how many purchases by the same user landed in the
    // following hour (ts, ts+1h]. Spark's own planner turns a raw
    // `p.ts > c.ts AND p.ts <= c.ts + 1h` join condition into a
    // nested-loop per user; instead the band is BUCKETIZED: purchases
    // key on (user, hour-bucket), each click probes exactly the two
    // buckets its window can overlap (window length = bucket width),
    // then the exact range predicate filters inside the equi-join.
    // Plan: two shuffles on (user_id, bkt), zero nested loops, ~2×
    // probe-side amplification — the standard interval-join layout
    // (DuckDB/Flink use the same binning idea natively). Per-task work
    // is bounded by events-per-user-per-hour, independent of corpus
    // size. All-integer micros arithmetic → engine-exact oracle (DuckDB
    // verifies with the naive inequality join — two algorithms, same
    // rows).
    QueryDef(
      "q_range_join",
      (s: SparkSession, dir: String) => {
        val HourUs = 3600000000L
        val ev = Tables(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("us"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("us").as("pus"),
            expr(s"us div $HourUs").as("bkt"))
        val probed = clicks
          .select(col("event_id"), col("user_id"), col("us"),
            explode(array(expr(s"us div $HourUs"), expr(s"us div $HourUs") + 1L))
              .as("bkt"))
        val matched = probed
          .join(purchases, Seq("user_id", "bkt"))
          .filter(col("pus") > col("us") && col("pus") <= col("us") + HourUs)
          .groupBy("event_id").agg(count(lit(1)).as("n_purchases"))
        clicks.select(col("event_id"))
          .join(matched, Seq("event_id"), "left")
          .select(col("event_id"),
            coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (
             |  SELECT event_id, user_id, event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
             |  FROM events),
             |c AS (SELECT event_id, user_id, us FROM ev WHERE event_type = 'click'),
             |p AS (SELECT user_id, us FROM ev WHERE event_type = 'purchase')
             |SELECT c.event_id,
             |  CAST(COUNT(p.us) AS BIGINT) AS n_purchases
             |FROM c LEFT JOIN p ON p.user_id = c.user_id
             |  AND p.us > c.us AND p.us <= c.us + 3600000000
             |GROUP BY c.event_id ORDER BY c.event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_sample_strat ★ — BALANCED stratified sample: exactly min(5, n)
    // documents per language, chosen by md5(doc_id) hash order — the
    // "equal representation per class" counterpart to q_sample_hash's
    // uniform Bernoulli sample (class-balancing / eval-set carving in a
    // training-data pipeline). Deterministic across runs, engines, and
    // cluster sizes. Exact per-stratum top-N needs an ordered selection,
    // so it cannot be a pure map-only filter like q_sample_hash; the
    // scalable shape is two-phase (same pattern as q_sim_topk's heap
    // pre-reduce): each shuffle partition keeps its local top-5 per
    // lang, then the global top-5 is picked from ≤ 5 × partitions
    // survivors per stratum — the full corpus is never sorted and no
    // single task ever sees a whole stratum.
    QueryDef(
      "q_sample_strat",
      (s: SparkSession, dir: String) => {
        val hk = md5(col("doc_id").cast("string"))
        val local = Window.partitionBy(spark_partition_id(), col("lang"))
          .orderBy(col("hk"), col("doc_id"))
        val global = Window.partitionBy(col("lang"))
          .orderBy(col("hk"), col("doc_id"))
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"), hk.as("hk"))
          .withColumn("lrn", row_number().over(local)).filter(col("lrn") <= 5)
          .withColumn("rk", row_number().over(global)).filter(col("rk") <= 5)
          .select(col("lang"), col("rk").cast("long").as("rk"), col("doc_id"))
          .orderBy("lang", "rk")
      },
      // ORDER BY lang NULLS FIRST: Spark sorts a NULL stratum first,
      // DuckDB last (r17 nasty sweep)
      Some("""SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id FROM (
             |  SELECT lang, doc_id,
             |    row_number() OVER (PARTITION BY lang
             |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
             |  FROM documents)
             |WHERE rk <= 5 ORDER BY lang NULLS FIRST, rk""".stripMargin)),

    // ------------------------------------------------------------------
    // q_pack_sequences ★ — sequence packing, the batch-assembly step of
    // a training pipeline: per source, documents are concatenated in
    // doc_id order into a token stream that is cut into 256-token
    // packs; a document belongs to the pack where it STARTS (the
    // standard concat-then-chunk approximation). pack_id = floor of the
    // running token count BEFORE the doc over the budget — one window
    // prefix-sum per source partition + one (source, pack) hash agg.
    // At 100 TB packing is per-shard by construction (each source
    // partition's prefix sum is independent); all-integer → oracle
    // engine-exact.
    QueryDef(
      "q_pack_sequences",
      (s: SparkSession, dir: String) => {
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("toks"))
          .withColumn("cum", sum("toks").over(w))
          .select(col("source"), col("doc_id"), col("toks"),
            graft.functions.ExactMath
              .divTrunc(col("cum") - col("toks"), lit(256L)).as("pack_id"))
          .groupBy("source", "pack_id")
          .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
          .orderBy("source", "pack_id")
      },
      Some("""WITH d AS (
             |  SELECT source, doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
             |  FROM documents),
             |c AS (
             |  SELECT source, doc_id, toks,
             |    SUM(toks) OVER (PARTITION BY source ORDER BY doc_id
             |      ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM d)
             |SELECT source, CAST((cum - toks) // 256 AS BIGINT) AS pack_id,
             |  COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS n_tokens
             |FROM c GROUP BY source, pack_id
             |ORDER BY source, pack_id NULLS FIRST""".stripMargin)),
             // NULLS FIRST: a NULL-text doc yields a NULL pack in both
             // engines; Spark orders it first, DuckDB last (r17 sweep)

    // ------------------------------------------------------------------
    // q_shard_pack ★ (new r13) — token-balanced shard assignment: the
    // shard-writing step of a training pipeline, where documents must
    // land in K output shards with near-equal token mass (a skewed
    // shard becomes the stalled trailing task of every epoch).
    // Deterministic snake/boustrophedon packing — per source, rank docs
    // by (tokens DESC, doc_id), then walk K=8 shards left-to-right,
    // right-to-left, … (rank r → shard r%8 on even passes, 7−r%8 on
    // odd): the classic sorted-round-robin LPT approximation, a pure
    // function of the corpus (no RNG, no driver state; a re-run or a
    // different cluster size reproduces the same assignment). Output is
    // the per-(source, shard) manifest: doc count, token mass, and
    // load_e4 = shard_tokens·K·1e4 // source_tokens (1e4 = perfectly
    // balanced) — exact integers, oracle engine-exact.
    // Plan: one narrow projection (size of split — no explode), one
    // rank window + one running-total window PARTITIONED BY SOURCE
    // (never a global single-task sort), one (source, shard) hash agg.
    // At 100 TB the unit of packing is the source/shard-group exactly
    // as here; a single mega-source would sub-bucket by hash first and
    // snake within sub-buckets — the same plan one level down.
    QueryDef(
      "q_shard_pack",
      (s: SparkSession, dir: String) => {
        import graft.functions.ExactMath.divTrunc
        val w = Window.partitionBy("source")
          .orderBy(col("toks").desc, col("doc_id"))
        val sw = Window.partitionBy("source")
        Tables(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("toks"))
          .withColumn("rn", row_number().over(w).cast("long") - 1L)
          .withColumn("shard",
            when(divTrunc(col("rn"), lit(8L)) % 2L === 0L, col("rn") % 8L)
              .otherwise(lit(7L) - col("rn") % 8L))
          .groupBy("source", "shard")
          .agg(count(lit(1)).as("n_docs"), sum("toks").as("shard_tokens"))
          .withColumn("load_e4",
            divTrunc(col("shard_tokens") * 8L * 10000L,
              sum("shard_tokens").over(sw)))
          .orderBy("source", "shard")
      },
      Some("""WITH d AS (
             |  SELECT source, doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
             |  FROM documents),
             |r AS (
             |  SELECT source, toks,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY toks DESC, doc_id) - 1 AS rn
             |  FROM d),
             |a AS (
             |  SELECT source, toks,
             |    CASE WHEN (rn // 8) % 2 = 0 THEN rn % 8
             |         ELSE 7 - rn % 8 END AS shard
             |  FROM r),
             |g AS (
             |  SELECT source, CAST(shard AS BIGINT) AS shard,
             |    COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS shard_tokens
             |  FROM a GROUP BY 1, 2)
             |SELECT source, shard, n_docs, shard_tokens,
             |  (shard_tokens * 8 * 10000) //
             |    CAST(SUM(shard_tokens) OVER (PARTITION BY source) AS BIGINT)
             |    AS load_e4
             |FROM g ORDER BY source, shard""".stripMargin)),

    // ------------------------------------------------------------------
    // q_epoch_order ★ (new r14) — deterministic epoch shuffle: the
    // training-order materialization q_shard_pack leaves open. A
    // training run must visit the corpus in a different order each
    // epoch, yet the order must be REPRODUCIBLE across re-runs and
    // cluster sizes (an elastic resize or a preempted re-run must not
    // silently change data order under a fixed seed). So the
    // permutation is a pure content function — sort key =
    // md5(doc_id‖':'‖epoch), no RNG, no partition-dependent state —
    // the q_split_assign/q_span_corrupt determinism argument applied
    // to batch order. Each (epoch, doc) lands in shard = key mod 8 and
    // takes pos = rank within its shard by (key, doc_id); md5 keying
    // makes the 3 declared epochs' orders pairwise-independent and
    // shard loads binomially even. Declared output is the full order
    // manifest (epoch, shard, pos, doc_id) a loader consumes.
    // Plan: map-only ×E explode (no join for the epoch axis), then ONE
    // window per (epoch, shard) group — per-shard sorts of n/8 rows,
    // never a global order. At 100 TB the same keys drive
    // repartition(shard) + sortWithinPartitions into shard files; K
    // scales with corpus so a shard fits a write task, and the
    // content-derived key guarantees the files are byte-identical at
    // any parallelism.
    QueryDef(
      "q_epoch_order",
      (s: SparkSession, dir: String) => {
        val w = Window.partitionBy("epoch", "shard")
          .orderBy(col("k"), col("doc_id"))
        Tables(s, dir, "documents")
          .select(col("doc_id"),
            explode(sequence(lit(0L), lit(2L))).as("epoch"))
          .withColumn("k",
            graft.functions.Md5Ops.md5Prefix(concat(col("doc_id").cast("string"),
              lit(":"), col("epoch").cast("string")), 15))
          .withColumn("shard", col("k") % 8L)
          .withColumn("pos", row_number().over(w).cast("long"))
          .select(col("epoch"), col("shard"), col("pos"), col("doc_id"))
          .orderBy("epoch", "shard", "pos")
      },
      Some("""WITH e AS (
             |  SELECT doc_id, unnest(range(0, 3)) AS epoch FROM documents),
             |k AS (
             |  SELECT doc_id, CAST(epoch AS BIGINT) AS epoch,
             |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
             |      CAST(epoch AS VARCHAR)), 1, 15))::BIGINT AS k
             |  FROM e)
             |SELECT epoch, k % 8 AS shard,
             |  CAST(row_number() OVER (PARTITION BY epoch, k % 8
             |    ORDER BY k, doc_id) AS BIGINT) AS pos,
             |  doc_id
             |FROM k ORDER BY epoch, shard, pos""".stripMargin)),

    // ------------------------------------------------------------------
    // q_span_corrupt ★ (new r13) — span-corruption mask preparation,
    // the T5/UL2 denoising-objective step a training-data pipeline runs
    // ahead of batching (Raffel et al. 2020 §3.1.4: mask contiguous
    // spans, ~15% of tokens, mean span ≈ 3). Deterministic variant —
    // position i of doc d SEEDS a span iff md5(d‖':'‖i) mod 20 = 0
    // (5% of positions, each covering [i, i+2] clipped to the doc →
    // ≈ 14% masked after merges), so the mask is a pure function of
    // (doc_id, position): reproducible across runs/engines/cluster
    // sizes, and a re-shard can never re-mask differently (the
    // q_split_assign determinism argument applied to the objective).
    // Overlapping/adjacent spans merge via per-doc gaps-and-islands
    // (seeds ≤ 2 apart share a span); declared output is the per-doc
    // mask profile (seeds, merged spans, masked tokens, rate_e4).
    // Plan: posexplode → codegen'd hash filter (the stream is 5% of
    // tokens after it) → doc-partitioned windows (bounded by doc
    // length) → one doc agg. Corpus-linear, shuffles keyed on doc_id.
    QueryDef(
      "q_span_corrupt",
      (s: SparkSession, dir: String) => {
        import graft.functions.ExactMath.divTrunc
        val docs = Tables(s, dir, "documents")
        val toksD = split(col("text"), " ")
        val seeds = docs
          .select(col("doc_id"), size(toksD).cast("long").as("n"),
            posexplode(toksD).as(Seq("i0", "tk")))
          .select(col("doc_id"), col("n"), (col("i0") + 1L).as("i"))
          .filter(pmod(
            graft.functions.Md5Ops.md5Prefix(concat(col("doc_id").cast("string"), lit(":"),
              col("i").cast("string")), 15),
            lit(20L)) === 0L)
        val w = Window.partitionBy("doc_id").orderBy("i")
        val isl = seeds
          .withColumn("brk",
            when(lag(col("i"), 1).over(w).isNull ||
              col("i") - lag(col("i"), 1).over(w) > 2L, 1L).otherwise(0L))
          .withColumn("isl", sum("brk").over(w))
        val spans = isl.groupBy("doc_id", "isl")
          .agg(max("n").as("n"), count(lit(1)).as("n_seeds"),
            (least(max(col("i")) + 2L, max("n")) - min(col("i")) + 1L)
              .as("cov"))
        val agg = spans.groupBy("doc_id")
          .agg(sum("n_seeds").as("n_seeds"), count(lit(1)).as("n_spans"),
            sum("cov").as("n_masked"))
        docs.select(col("doc_id"), size(toksD).cast("long").as("n_tokens"))
          .join(agg, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            coalesce(col("n_seeds"), lit(0L)).as("n_seeds"),
            coalesce(col("n_spans"), lit(0L)).as("n_spans"),
            coalesce(col("n_masked"), lit(0L)).as("n_masked"),
            divTrunc(coalesce(col("n_masked"), lit(0L)) * 10000L,
              greatest(col("n_tokens"), lit(1L))).as("mask_rate_e4"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
             |p AS (
             |  SELECT doc_id, CAST(len(ts) AS BIGINT) AS n,
             |    unnest(range(1, len(ts) + 1)) AS i
             |  FROM t),
             |seeds AS (
             |  SELECT doc_id, n, CAST(i AS BIGINT) AS i FROM p
             |  WHERE ('0x' || substring(md5(doc_id || ':' || i), 1, 15))::BIGINT
             |          % 20 = 0),
             |d2 AS (
             |  SELECT doc_id, n, i,
             |    CASE WHEN lag(i) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
             |      OR i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) > 2
             |      THEN 1 ELSE 0 END AS brk
             |  FROM seeds),
             |d3 AS (
             |  SELECT doc_id, n, i,
             |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY i) AS isl
             |  FROM d2),
             |spans AS (
             |  SELECT doc_id, isl, COUNT(*) AS n_seeds,
             |    LEAST(MAX(i) + 2, MAX(n)) - MIN(i) + 1 AS cov
             |  FROM d3 GROUP BY 1, 2),
             |agg AS (
             |  SELECT doc_id, CAST(SUM(n_seeds) AS BIGINT) AS n_seeds,
             |    CAST(COUNT(*) AS BIGINT) AS n_spans,
             |    CAST(SUM(cov) AS BIGINT) AS n_masked
             |  FROM spans GROUP BY 1)
             |SELECT t.doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
             |  COALESCE(n_seeds, 0) AS n_seeds,
             |  COALESCE(n_spans, 0) AS n_spans,
             |  COALESCE(n_masked, 0) AS n_masked,
             |  (COALESCE(n_masked, 0) * 10000) //
             |    GREATEST(CAST(len(ts) AS BIGINT), 1) AS mask_rate_e4
             |FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id
             |ORDER BY t.doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_fim_split ★ (new r14) — FILL-IN-THE-MIDDLE preparation, the
    // infilling-objective transform (Bavarian et al. 2022) a code/text
    // pipeline runs next to span corruption: each selected document is
    // split prefix|middle|suffix at two pivots and re-laid-out as
    // PSM (prefix, suffix, middle) with 3 sentinel tokens, teaching
    // the model to infill. Deterministic variant (the q_span_corrupt
    // rule): the FIM gate (50% of docs — the paper's fim_rate) and
    // both pivots are pure md5 functions of doc_id — reproducible
    // across runs/engines/cluster sizes, re-shards can never re-split
    // differently. Pivots are uniform over [0, n] (empty prefix/
    // middle/suffix all legal, as in the reference implementation).
    // Declared output: the per-doc layout budget (segment lengths,
    // PSM length = n+3 sentinels for FIM docs) + an md5 fingerprint
    // of the middle span so a downstream consumer can verify the cut
    // bytes, not just the lengths. Plan: map-only single projection —
    // no explode, no shuffle except the output sort; runs at scan
    // speed at 100 TB.
    QueryDef(
      "q_fim_split",
      (s: SparkSession, dir: String) => {
        val docs = Tables(s, dir, "documents")
        val toksD = split(col("text"), " ")
        def h(tag: String) = graft.functions.Md5Ops.md5Prefix(concat(lit(tag + ":"),
          col("doc_id").cast("string")), 15)
        docs.select(col("doc_id"), toksD.as("ts"))
          .withColumn("n", size(col("ts")).cast("long"))
          .withColumn("fim",
            when(pmod(h("fim"), lit(2L)) === 0L, 1L).otherwise(0L))
          .withColumn("a", pmod(h("fa"), col("n") + 1L))
          .withColumn("b", pmod(h("fb"), col("n") + 1L))
          .withColumn("lo", when(col("fim") === 1L,
            least(col("a"), col("b"))).otherwise(col("n")))
          .withColumn("hi", when(col("fim") === 1L,
            greatest(col("a"), col("b"))).otherwise(col("n")))
          .select(col("doc_id"), col("fim"), col("n").as("n_tokens"),
            col("lo").as("n_prefix"),
            (col("hi") - col("lo")).as("n_middle"),
            (col("n") - col("hi")).as("n_suffix"),
            substring(md5(concat_ws(" ",
              slice(col("ts"), (col("lo") + 1L).cast("int"),
                (col("hi") - col("lo")).cast("int")))), 1, 8).as("mid_fp"),
            (col("n") + when(col("fim") === 1L, 3L).otherwise(0L))
              .as("psm_len"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
             |b AS (
             |  SELECT doc_id, ts, CAST(len(ts) AS BIGINT) AS n,
             |    CASE WHEN ('0x' || substring(md5('fim:' || doc_id), 1, 15))::BIGINT
             |           % 2 = 0 THEN 1 ELSE 0 END AS fim,
             |    ('0x' || substring(md5('fa:' || doc_id), 1, 15))::BIGINT
             |      % (CAST(len(ts) AS BIGINT) + 1) AS a,
             |    ('0x' || substring(md5('fb:' || doc_id), 1, 15))::BIGINT
             |      % (CAST(len(ts) AS BIGINT) + 1) AS b
             |  FROM t),
             |c AS (
             |  SELECT doc_id, ts, n, fim,
             |    CASE WHEN fim = 1 THEN LEAST(a, b) ELSE n END AS lo,
             |    CASE WHEN fim = 1 THEN GREATEST(a, b) ELSE n END AS hi
             |  FROM b)
             |SELECT doc_id, CAST(fim AS BIGINT) AS fim, n AS n_tokens,
             |  lo AS n_prefix, hi - lo AS n_middle, n - hi AS n_suffix,
             |  -- COALESCE: an out-of-range slice (empty middle) is NULL in
             |  -- DuckDB but an empty array in Spark -> both hash ''
             |  substring(md5(COALESCE(array_to_string(
             |    ts[CAST(lo + 1 AS INTEGER):CAST(hi AS INTEGER)], ' '), '')),
             |    1, 8) AS mid_fp,
             |  n + CASE WHEN fim = 1 THEN 3 ELSE 0 END AS psm_len
             |FROM c ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_mix_weights ★ — the data-mixing table of a training pipeline:
    // per source, document count, token count, and the source's token
    // share of the corpus in exact integer e6 (the sampling weights a
    // mixture-trained run consumes). One hash agg on source + a 1-row
    // broadcast total — map-side combine makes the first agg linear,
    // nothing is ever collected. Weight in e6 floor units so the
    // oracle is engine-exact. Headroom: n_tokens * 1e6 stays in signed
    // 64-bit up to ~9.2e12 tokens PER SOURCE (2^63/1e6); a corpus
    // beyond that must compute the share via two-step division
    // (divTrunc(n_tokens, divTrunc(total, 1e6))) or decimal(38,0) —
    // the e6 grid itself loses nothing either way.
    QueryDef(
      "q_mix_weights",
      (s: SparkSession, dir: String) => {
        val per = Tables(s, dir, "documents")
          .select(col("source"),
            size(split(col("text"), " ")).cast("long").as("toks"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
        val tot = per.agg(sum("n_tokens").as("total_tokens"))
        per.crossJoin(broadcast(tot))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            graft.functions.ExactMath
              .floorDiv(col("n_tokens") * 1000000L, col("total_tokens"))
              .as("weight_e6"))
          .orderBy("source")
      },
      Some("""WITH d AS (
             |  SELECT source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
             |  FROM documents),
             |per AS (
             |  SELECT source, COUNT(*) AS n_docs,
             |    CAST(SUM(toks) AS BIGINT) AS n_tokens
             |  FROM d GROUP BY 1),
             |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM per)
             |SELECT source, n_docs, n_tokens,
             |  CAST((n_tokens * 1000000) // total AS BIGINT) AS weight_e6
             |FROM per, t ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q_join_estimate (new r5) — histogram-based JOIN-SIZE ESTIMATION,
    // the cost-based-optimizer calculation made a declared query: for
    // the user-keyed join of two event subsets (error events ⋈ purchase
    // events per user — a fan-out join, BOTH sides multi-valued), a
    // 20-bucket equi-width key histogram per side, the CBO's
    // uniform-within-bucket estimate est = nₐ·n_b / max(dₐ, d_b)
    // (containment assumption), the EXACT per-bucket join size
    // Σ_k nₐ(k)·n_b(k), and the estimation error in e4. On an FK join
    // (orders ⋈ customer) the estimate is EXACT by construction (the
    // unique side has nₖ = 1 — tried first, every err was 0, a dead
    // column); a many-to-many join is where uniformity genuinely errs
    // — per-user correlation of error and purchase volume shows up as
    // est < exact (Σ nₐ(k)·n_b(k) > nₐ·n_b/d when the two multiplicities
    // correlate) — the number that explains why a CBO mis-plans skewed
    // joins and what q_skew_stats' histogram buys it. All integer
    // arithmetic (floor-div est; err over max(1, exact)). Plan: two
    // key-level hash aggs (map-side combined, key-histogram-sized),
    // per-bucket rollups, and the exact term joins the two KEY
    // HISTOGRAMS — never the fact tables; a 1-row max-key broadcast
    // defines the bucket function. ≤ 20 output rows at any corpus size.
    QueryDef(
      "q_join_estimate",
      (s: SparkSession, dir: String) => {
        import graft.functions.ExactMath
        // r13 (r12 verdict #4): the row's 1.9-2.2 s quiet cost reproduced
        // and profiled to events.parquet I/O — the r12 shape scanned the
        // fact table FOUR times (error + purchase legs for the max-key
        // union, then again per keyed() side). Two scans now: one for
        // the max key, one feeding a single (type, bucket, key) hash agg
        // that both sides' histograms are filtered from; the persist
        // holds that key-histogram-sized frame (same bound as the two
        // per-side persists it replaces — never fact rows).
        val both = Tables(s, dir, "events")
          .filter(col("event_type").isin("error", "purchase"))
          .select(col("event_type").as("t"), col("user_id").as("k"))
        val mx = both.agg(max("k").as("mxk"))
        val kab = both.crossJoin(broadcast(mx))
          .select(col("t"),
            ExactMath.divTrunc(col("k") * 20L, col("mxk") + 1L).as("b"),
            col("k"))
          .groupBy("t", "b", "k").agg(count(lit(1)).as("nk"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        kab.count() // eager: stats + exact both reuse it
        val ka = kab.filter(col("t") === "error").select(col("b"), col("k"), col("nk"))
        val kb = kab.filter(col("t") === "purchase").select(col("b"), col("k"), col("nk"))
        val sa = ka.groupBy("b").agg(sum("nk").as("na"), count(lit(1)).as("da"))
        val sb = kb.groupBy("b").agg(sum("nk").as("nb"), count(lit(1)).as("db"))
        val exact = ka.as("x").join(kb.as("y"), Seq("b", "k"))
          .select(col("b"), (col("x.nk") * col("y.nk")).as("prod"))
          .groupBy("b").agg(sum("prod").as("exact"))
        sa.join(sb, Seq("b"), "full_outer")
          .join(exact, Seq("b"), "left")
          .select(col("b"),
            coalesce(col("na"), lit(0L)).as("na"),
            coalesce(col("da"), lit(0L)).as("da"),
            coalesce(col("nb"), lit(0L)).as("nb"),
            coalesce(col("db"), lit(0L)).as("db"),
            coalesce(col("exact"), lit(0L)).as("exact"))
          .withColumn("est", ExactMath.divTrunc(col("na") * col("nb"),
            greatest(col("da"), col("db"), lit(1L))))
          .withColumn("err_e4", ExactMath.divTrunc(
            abs(col("est") - col("exact")) * 10000L,
            greatest(col("exact"), lit(1L))))
          .select(col("b"), col("na"), col("da"), col("nb"), col("db"),
            col("est"), col("exact"), col("err_e4"))
          .orderBy("b")
      },
      Some("""WITH o AS (SELECT user_id AS k FROM events WHERE event_type = 'error'),
             |c AS (SELECT user_id AS k FROM events WHERE event_type = 'purchase'),
             |mx AS (SELECT MAX(k) AS mxk FROM (SELECT k FROM o UNION ALL SELECT k FROM c)),
             |ka AS (
             |  SELECT (k * 20) // (mxk + 1) AS b, k, COUNT(*) AS nk
             |  FROM o, mx GROUP BY 1, 2),
             |kb AS (
             |  SELECT (k * 20) // (mxk + 1) AS b, k, COUNT(*) AS nk
             |  FROM c, mx GROUP BY 1, 2),
             |sa AS (SELECT b, SUM(nk) AS na, COUNT(*) AS da FROM ka GROUP BY 1),
             |sb AS (SELECT b, SUM(nk) AS nb, COUNT(*) AS db FROM kb GROUP BY 1),
             |ex AS (
             |  SELECT ka.b, SUM(ka.nk * kb.nk) AS exact
             |  FROM ka JOIN kb ON ka.b = kb.b AND ka.k = kb.k GROUP BY 1),
             |j AS (
             |  SELECT COALESCE(sa.b, sb.b) AS b,
             |    COALESCE(sa.na, 0) AS na, COALESCE(sa.da, 0) AS da,
             |    COALESCE(sb.nb, 0) AS nb, COALESCE(sb.db, 0) AS db,
             |    COALESCE(ex.exact, 0) AS exact
             |  FROM sa FULL OUTER JOIN sb ON sa.b = sb.b
             |    LEFT JOIN ex ON COALESCE(sa.b, sb.b) = ex.b)
             |SELECT CAST(b AS BIGINT) AS b, CAST(na AS BIGINT) AS na,
             |  CAST(da AS BIGINT) AS da, CAST(nb AS BIGINT) AS nb,
             |  CAST(db AS BIGINT) AS db,
             |  CAST((na * nb) // GREATEST(da, db, 1) AS BIGINT) AS est,
             |  CAST(exact AS BIGINT) AS exact,
             |  CAST((abs((na * nb) // GREATEST(da, db, 1) - exact) * 10000)
             |    // GREATEST(exact, 1) AS BIGINT) AS err_e4
             |FROM j ORDER BY b""".stripMargin)),

    // ------------------------------------------------------------------
    // q_length_buckets ★ (new r5) — PADDING-EFFICIENCY table for
    // dynamic batching: bucket every document by the next power of two
    // of its token count (the standard length-bucketing scheme — batch
    // within a bucket, pad to the bucket cap) and report per bucket the
    // doc count, real tokens, padded tokens, and the padding waste in
    // e4 — the table that decides whether bucketed batching is worth it
    // vs q_pack_sequences' exact packing (waste here ≈ 18% vs packing's
    // ~0%; global single-max padding would be far worse). The bucket
    // cap is INTEGER-exact in both engines via the binary-string-length
    // trick (cap = 1 << len(bin(n−1)); the float-log₂ ceil trap of
    // annPlanes, dodged the same way — DuckDB computes the identical
    // expression). Plan: map-only bucket assign, ONE hash agg, ≤
    // log₂(max_len) output rows at any corpus size.
    QueryDef(
      "q_length_buckets",
      (s: SparkSession, dir: String) => {
        import graft.functions.ExactMath
        val n = size(split(col("text"), " ")).cast("long")
        Tables(s, dir, "documents")
          .select(n.as("toks"))
          .select(when(col("toks") <= 1L, 1L)
            .otherwise(expr("shiftleft(CAST(1 AS BIGINT), CAST(length(bin(toks - 1)) AS INT))"))
            .as("bucket_cap"), col("toks"))
          .groupBy("bucket_cap")
          .agg(count(lit(1)).as("n_docs"), sum("toks").as("sum_tokens"))
          .select(col("bucket_cap"), col("n_docs"), col("sum_tokens"),
            (col("bucket_cap") * col("n_docs")).as("padded_tokens"),
            ExactMath.floorDiv(
              (col("bucket_cap") * col("n_docs") - col("sum_tokens")) * 10000L,
              col("bucket_cap") * col("n_docs")).as("waste_e4"))
          .orderBy("bucket_cap")
      },
      Some("""WITH d AS (
             |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
             |  FROM documents),
             |b AS (
             |  SELECT CASE WHEN n <= 1 THEN 1
             |    ELSE (CAST(1 AS BIGINT) << length(bin(n - 1))) END AS bucket_cap, n
             |  FROM d)
             |SELECT bucket_cap, COUNT(*) AS n_docs,
             |  CAST(SUM(n) AS BIGINT) AS sum_tokens,
             |  CAST(bucket_cap * COUNT(*) AS BIGINT) AS padded_tokens,
             |  CAST(((bucket_cap * COUNT(*) - SUM(n)) * 10000)
             |    // (bucket_cap * COUNT(*)) AS BIGINT) AS waste_e4
             |FROM b GROUP BY bucket_cap
             |ORDER BY bucket_cap NULLS FIRST""".stripMargin)),
             // NULLS FIRST: a NULL-text doc yields a NULL bucket in both
             // engines; Spark orders it first, DuckDB last (r17 sweep)

    // ------------------------------------------------------------------
    // q_mix_temperature ★ (new r5) — TEMPERATURE-scaled mixture weights,
    // the rebalancing sibling of q_mix_weights' natural shares: sampling
    // weight ∝ n_tokens^α with α = 1/2, so small sources are up-weighted
    // (boost > 1) and dominant ones damped — the low-resource-upsampling
    // convention of multilingual/multi-source pretraining (α ∈ [0.3,
    // 0.7] in the mT5/XLM-R family; α = 1/2 is the one exactly
    // expressible in integer arithmetic). n^(1/2) = floor(sqrt(n)) is
    // ENGINE-EXACT: n < 2^46 is exactly representable in double, IEEE
    // sqrt is correctly rounded in both engines, and a correctly-
    // rounded sqrt can only mis-floor when the true root sits within
    // half an ulp of an integer — impossible below ~2^46 (nearest
    // candidate n = m²−1 has its root 1/(2m) below the integer, > ½ulp
    // until m ≈ 2^26); beyond that swap in a Newton integer isqrt.
    // boost_e4 = temperature_weight / natural_weight in floor-div e4 —
    // the factor each source's sampling rate actually changes by.
    // Plan: identical to q_mix_weights — one map-side-combined source
    // agg + a 1-row broadcast of the two totals; dashboard-sized output.
    QueryDef(
      "q_mix_temperature",
      (s: SparkSession, dir: String) => {
        import graft.functions.ExactMath
        val per = Tables(s, dir, "documents")
          .select(col("source"),
            size(split(col("text"), " ")).cast("long").as("toks"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
          .withColumn("isq",
            floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
        val tot = per.agg(sum("n_tokens").as("tot_n"), sum("isq").as("tot_isq"))
        per.crossJoin(broadcast(tot))
          .select(col("source"), col("n_docs"), col("n_tokens"), col("isq"),
            ExactMath.floorDiv(col("n_tokens") * 1000000L, col("tot_n"))
              .as("natural_e6"),
            ExactMath.floorDiv(col("isq") * 1000000L, col("tot_isq"))
              .as("temp_e6"))
          .withColumn("boost_e4",
            when(col("natural_e6") > 0L,
              ExactMath.divTrunc(col("temp_e6") * 10000L, col("natural_e6")))
              .otherwise(0L))
          .orderBy("source")
      },
      Some("""WITH d AS (
             |  SELECT source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
             |  FROM documents),
             |per AS (
             |  SELECT source, COUNT(*) AS n_docs,
             |    CAST(SUM(toks) AS BIGINT) AS n_tokens,
             |    CAST(floor(sqrt(CAST(SUM(toks) AS DOUBLE))) AS BIGINT) AS isq
             |  FROM d GROUP BY 1),
             |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_n,
             |        CAST(SUM(isq) AS BIGINT) AS tot_isq FROM per)
             |SELECT source, n_docs, n_tokens, isq,
             |  CAST((n_tokens * 1000000) // tot_n AS BIGINT) AS natural_e6,
             |  CAST((isq * 1000000) // tot_isq AS BIGINT) AS temp_e6,
             |  CAST(CASE WHEN (n_tokens * 1000000) // tot_n > 0
             |    THEN (((isq * 1000000) // tot_isq) * 10000)
             |      // ((n_tokens * 1000000) // tot_n)
             |    ELSE 0 END AS BIGINT) AS boost_e4
             |FROM per, t ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q_percentile — EXACT p50/p90/p99 of event value per type, in
    // integer cents (value is 2-decimal: |round(v*100) − v*100| ≤
    // 3.6e-12 measured, so the cents cast is engine-exact). The
    // percentile definition is spelled out identically in both engines
    // (lower discrete: sorted ASC, index = (n−1)·p div 100 + 1,
    // 1-based) instead of trusting two engines' quantile semantics to
    // agree. Plan: one window sort per group + conditional agg. Exact
    // per-group percentiles require a per-group sort wherever they run;
    // the constant-memory 100 TB variant is approx_percentile (same
    // sketch family as q_approx_distinct) — this is the exact-answer
    // form, which is also what makes it oracle-checkable.
    QueryDef(
      "q_percentile",
      (s: SparkSession, dir: String) => {
        val w = Window.partitionBy("event_type").orderBy("c")
        val wn = Window.partitionBy("event_type")
        def pAt(p: Int) =
          max(when(col("rn") === expr(s"((n - 1) * $p) div 100 + 1"), col("c")))
            .as(s"p${p}_c")
        Tables(s, dir, "events")
          .select(col("event_type"),
            round(col("value") * 100).try_cast("long").as("c"))
          // NULL cents (NaN measure) are excluded from the order
          // statistic — standard aggregate semantics, identical in
          // both engines (r17 nasty sweep: Spark ranks nulls first,
          // DuckDB last, shifting every percentile index otherwise)
          .filter(col("c").isNotNull)
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wn))
          .groupBy("event_type")
          .agg(max("n").as("n"), pAt(50), pAt(90), pAt(99))
          .orderBy("event_type")
      },
      Some("""WITH b AS (
             |  SELECT event_type, TRY_CAST(round(value*100) AS BIGINT) AS c
             |  FROM events WHERE TRY_CAST(round(value*100) AS BIGINT) IS NOT NULL),
             |r AS (
             |  SELECT event_type, c,
             |    row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
             |    COUNT(*) OVER (PARTITION BY event_type) AS n
             |  FROM b)
             |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
             |  MAX(CASE WHEN rn = ((n-1)*50)//100 + 1 THEN c END) AS p50_c,
             |  MAX(CASE WHEN rn = ((n-1)*90)//100 + 1 THEN c END) AS p90_c,
             |  MAX(CASE WHEN rn = ((n-1)*99)//100 + 1 THEN c END) AS p99_c
             |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q_funnel ★ (new r5) — WINDOWED ordered-sequence funnel: of the
    // users who VIEWed, how many CLICKed within 24 h strictly after
    // their first view, then PURCHASEd within 24 h strictly after that
    // first qualifying click — the behavioral-sequence operator of
    // product analytics and of sequence-conditioned training-data
    // selection ("users who completed the flow"). The per-stage
    // conversion window is what makes a funnel a funnel (without it,
    // any sufficiently long history converts everyone — measured 100%
    // at every stage on this fixture; with 24 h: 150 → 60 → 25 at
    // sf0.01, every branch live). Stage k is the MIN event time of the
    // k-th type inside (t_{k−1}, t_{k−1} + 24 h], so each user follows
    // one deterministic path and the result is engine-exact.
    // Plan: one filtered agg per stage + equi-joins on user_id whose
    // RIGHT side shrinks monotonically (stage-k survivors). The joins
    // are plain key shuffles — NOT forced broadcasts: s1 is the full
    // viewer dimension (user-scale, a forced broadcast would OOM at
    // 100 TB — review finding), and AQE already broadcasts any
    // narrowed survivor stage that actually fits. Every event_type
    // filter pushes to the scan. Conversions in exact e4.
    QueryDef(
      "q_funnel",
      (s: SparkSession, dir: String) => {
        val ev = Tables(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"))
        def within24h(prev: String) =
          col("ts") > col(prev) &&
            col("ts") <= col(prev) + expr("interval 24 hours")
        val s1 = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val s2 = ev.filter(col("event_type") === "click")
          .join(s1, "user_id").filter(within24h("t1"))
          .groupBy("user_id").agg(min("ts").as("t2"))
        val s3 = ev.filter(col("event_type") === "purchase")
          .join(s2, "user_id").filter(within24h("t2"))
          .groupBy("user_id").agg(min("ts").as("t3"))
        def e4(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
          graft.functions.ExactMath.divTrunc(num * 10000L, greatest(den, lit(1L)))
        s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
          .agg(count(col("t1")).as("n_view"),
            count(col("t2")).as("n_click"),
            count(col("t3")).as("n_purchase"))
          .select(col("n_view"), col("n_click"), col("n_purchase"),
            e4(col("n_click"), col("n_view")).as("click_conv_e4"),
            e4(col("n_purchase"), col("n_click")).as("purchase_conv_e4"))
      },
      Some("""WITH s1 AS (
             |  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t1
             |  FROM events WHERE event_type = 'view' GROUP BY user_id),
             |s2 AS (
             |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t2
             |  FROM events e JOIN s1 ON e.user_id = s1.user_id
             |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > s1.t1
             |    AND CAST(e.ts AS TIMESTAMP) <= s1.t1 + INTERVAL 24 HOUR
             |  GROUP BY e.user_id),
             |s3 AS (
             |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t3
             |  FROM events e JOIN s2 ON e.user_id = s2.user_id
             |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s2.t2
             |    AND CAST(e.ts AS TIMESTAMP) <= s2.t2 + INTERVAL 24 HOUR
             |  GROUP BY e.user_id),
             |j AS (
             |  SELECT s1.user_id, s1.t1, s2.t2, s3.t3
             |  FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
             |  LEFT JOIN s3 ON s1.user_id = s3.user_id)
             |SELECT COUNT(t1) AS n_view, COUNT(t2) AS n_click,
             |  COUNT(t3) AS n_purchase,
             |  COUNT(t2) * 10000 // GREATEST(COUNT(t1), 1) AS click_conv_e4,
             |  COUNT(t3) * 10000 // GREATEST(COUNT(t2), 1) AS purchase_conv_e4
             |FROM j""".stripMargin)),

    // ------------------------------------------------------------------
    // q_transition_matrix ★ (new r5) — first-order Markov transition
    // matrix of the event stream: for every ordered pair of consecutive
    // events WITHIN a user's timeline, count (src_type → dst_type) and
    // row-normalize to an exact e4 probability — the behavioral-model
    // operator behind next-action prediction features and sequence-
    // anomaly detection ("error→error spikes"). Consecutive-ness is a
    // lead() over (user ORDER BY ts, event_id) — the event_id tie-break
    // makes the per-user order TOTAL, so both engines pair identical
    // neighbors even on equal timestamps. Plan: one window partitioned
    // by user (shuffles once on user_id; each user's slice sorts
    // independently — no global sort), one hash agg down to the
    // |types|² matrix, then a window over those ≤25 rows for the row
    // totals. Per-user state is two fields — nothing corpus-sized.
    QueryDef(
      "q_transition_matrix",
      (s: SparkSession, dir: String) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val tr = Tables(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .withColumn("dst_type", lead(col("event_type"), 1).over(w))
          .filter(col("dst_type").isNotNull)
          .groupBy(col("event_type").as("src_type"), col("dst_type"))
          .agg(count(lit(1)).as("n"))
        tr.withColumn("tot", sum("n").over(Window.partitionBy("src_type")))
          .select(col("src_type"), col("dst_type"), col("n"),
            graft.functions.ExactMath
              .divTrunc(col("n") * 20000L + col("tot"), col("tot") * 2L)
              .as("p_e4"))
          .orderBy("src_type", "dst_type")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
             |  FROM events),
             |t AS (
             |  SELECT event_type AS src_type,
             |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |      AS dst_type
             |  FROM e),
             |c AS (
             |  SELECT src_type, dst_type, COUNT(*) AS n
             |  FROM t WHERE dst_type IS NOT NULL GROUP BY 1, 2),
             |s AS (
             |  SELECT src_type, dst_type, n,
             |    SUM(n) OVER (PARTITION BY src_type) AS tot
             |  FROM c)
             |SELECT src_type, dst_type, CAST(n AS BIGINT) AS n,
             |  CAST((n * 20000 + tot) // (tot * 2) AS BIGINT) AS p_e4
             |FROM s ORDER BY src_type, dst_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q_cohort_retention ★ (new r5) — customer-cohort retention matrix
    // over `orders`: cohort = year of a customer's FIRST order, and for
    // each offset k, how many of that cohort ordered again k years
    // later (exact e4 share of the cohort) — the engagement-decay view
    // every analytics stack ships, and the operator that decides which
    // user strata a behavioral-training corpus over-samples. Runs on
    // `orders` because its order dates spread first-purchases over 7
    // years (every user in `events` starts on day 1 — a single-cohort
    // fixture would leave the cohort dimension dead). Plan: one shuffle
    // on o_custkey serves both the first-order agg and the join back
    // (co-partitioned), distinct (cohort, k, custkey) collapses
    // member-years before counting — per-customer state is one long,
    // the output is the ≤ years² retention triangle, and the k=0
    // cohort-size denominator comes from a window over those rows, not
    // a re-scan. 10000 at k=0 is the built-in self-check.
    QueryDef(
      "q_cohort_retention",
      (s: SparkSession, dir: String) => {
        val o = Tables(s, dir, "orders")
          .select(col("o_custkey"), year(col("o_orderdate")).cast("long").as("y"))
        val first = o.groupBy("o_custkey").agg(min("y").as("y0"))
        val active = o.join(first, "o_custkey")
          .select(col("y0").as("cohort_year"), (col("y") - col("y0")).as("k"),
            col("o_custkey"))
          .distinct()
          .groupBy("cohort_year", "k")
          .agg(count(lit(1)).as("n_active"))
        active
          .withColumn("cohort_n",
            max(when(col("k") === 0L, col("n_active")))
              .over(Window.partitionBy("cohort_year")))
          .select(col("cohort_year"), col("k"), col("n_active"),
            graft.functions.ExactMath
              .divTrunc(col("n_active") * 20000L + col("cohort_n"), col("cohort_n") * 2L)
              .as("retention_e4"))
          .orderBy("cohort_year", "k")
      },
      Some("""WITH o AS (
             |  SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS y FROM orders),
             |f AS (SELECT o_custkey, MIN(y) AS y0 FROM o GROUP BY 1),
             |a AS (
             |  SELECT DISTINCT f.y0 AS cohort_year, o.y - f.y0 AS k, o.o_custkey
             |  FROM o JOIN f USING (o_custkey)),
             |c AS (SELECT cohort_year, k, COUNT(*) AS n_active FROM a GROUP BY 1, 2),
             |w AS (
             |  SELECT cohort_year, k, n_active,
             |    MAX(CASE WHEN k = 0 THEN n_active END)
             |      OVER (PARTITION BY cohort_year) AS cohort_n
             |  FROM c)
             |SELECT cohort_year, k, CAST(n_active AS BIGINT) AS n_active,
             |  CAST((n_active * 20000 + cohort_n) // (cohort_n * 2) AS BIGINT)
             |    AS retention_e4
             |FROM w ORDER BY cohort_year, k""".stripMargin)),

    // ------------------------------------------------------------------
    // q_resample_locf ★ (new r5) — time-series resampling with
    // gap-fill: each user's event stream is resampled onto a dense
    // hourly grid over [first, last] activity and empty hours carry
    // the last observation forward (LOCF) — the feature-store /
    // training-window materialization kernel (a model consuming
    // "user state at hour h" needs a value at EVERY h, not just
    // active ones). Declared output is the per-user validation
    // aggregate (grid size, gap count, LOCF sum — the sum is only
    // right if every gap got exactly the carried value).
    // Plan (r11 rework): one (user, hour) hash agg, then the grid is
    // emitted ALREADY CARRYING its LOCF value by run-length spans — a
    // lead(h) window over the OBSERVATION table (≈ |events-hours|
    // rows) gives each observation its span [h, next_h − 1], and
    // sequence+explode emits that span's grid rows with the carried
    // value attached. Identical grid, identical fill (an observed
    // hour's carry is its own value; every gap hour repeats the prior
    // observation), but the window sorts observations, never the
    // |users| × span grid, and the grid needs no join at all. The r5
    // form (dense grid → left join back → running last(ignoreNulls)
    // over the grid) sorted and joined the full grid: measured gen-sf1
    // 14.8 → 2.9 s. Hour keys are LONG epoch-hours binned with FLOOR
    // division — Spark's DIV truncates toward zero, so a bare
    // `t DIV 3600` would bin a pre-1970 timestamp one hour high while
    // DuckDB's date_trunc('hour') floors; the explicit negative-
    // remainder correction below makes the Spark bin floorDiv(t, 3600)
    // for ALL timestamps, not just ts >= 0 (sequence() over longs is a
    // plain numeric range; under the pinned UTC session epoch-hour
    // bins ARE date_trunc('hour') bins — the grid itself never needs a
    // timestamp value). All integer cents → engine-exact.
    QueryDef(
      "q_resample_locf",
      (s: SparkSession, dir: String) => {
        val hourly = Tables(s, dir, "events")
          .groupBy(col("user_id"),
            expr("CAST(ts AS LONG) DIV 3600" +
              " - (CASE WHEN CAST(ts AS LONG) % 3600 < 0 THEN 1 ELSE 0 END)")
              .as("h"))
          .agg(sum(round(col("value") * 100).try_cast("long")).as("c"))
        val wLead = Window.partitionBy("user_id").orderBy("h")
        val spans = hourly.withColumn("h_end",
          coalesce(lead(col("h"), 1).over(wLead) - 1L, col("h")))
        spans
          .select(col("user_id"), col("h").as("h_obs"), col("c"),
            explode(sequence(col("h"), col("h_end"))).as("h"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_hours"),
            sum(when(col("h") =!= col("h_obs"), 1L).otherwise(0L)).as("n_gaps"),
            sum("c").as("sum_c_locf"))
          .orderBy("user_id")
      },
      Some("""WITH hourly AS (
             |  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             |    CAST(SUM(TRY_CAST(round(value*100) AS BIGINT)) AS BIGINT) AS c,
             |    COUNT(*) AS n
             |  FROM events GROUP BY 1, 2),
             |b AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY 1),
             |grid AS (
             |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
             |  FROM b),
             |filled AS (
             |  SELECT g.user_id, g.h, hourly.c, hourly.n,
             |    last_value(hourly.c IGNORE NULLS) OVER (
             |      PARTITION BY g.user_id ORDER BY g.h
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_locf
             |  FROM grid g
             |  LEFT JOIN hourly ON g.user_id = hourly.user_id AND g.h = hourly.h)
             |SELECT user_id, COUNT(*) AS n_hours,
             |  CAST(SUM(CASE WHEN n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
             |  CAST(SUM(c_locf) AS BIGINT) AS sum_c_locf
             |FROM filled GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_approx_percentile (new r5) — the SKETCH sibling of q_percentile
    // and the variant its own scaladoc names as the 100 TB path:
    // `percentile_approx` (Greenwald–Khanna style summaries, constant
    // memory per group, mergeable map-side — no per-group sort).
    // Sketches are not engine-portable → no DuckDB oracle; instead the
    // declared output CARRIES ITS OWN CHECK (the q_approx_distinct
    // pattern): for each approximate quantile v the true-rank inclusion
    // count(c < v) ≤ n·(p + tol) ∧ count(c ≤ v) ≥ n·(p − tol) is
    // evaluated with tol = 1% in exact integer arithmetic — the
    // two-sided form is what stays sound under heavy value ties, where
    // a one-sided count(≤ v) can legitimately overshoot the target
    // rank by the whole tie mass. Plan: one sketch agg + one broadcast
    // join of the 5-row quantile table back over the stream for the
    // exact rank counts (the checking apparatus; at 100 TB only the
    // sketch agg runs).
    QueryDef(
      "q_approx_percentile",
      (s: SparkSession, dir: String) => {
        val ev = Tables(s, dir, "events")
          .select(col("event_type"), round(col("value") * 100).try_cast("long").as("c"))
        val ap = ev.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            percentile_approx(col("c"),
              array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("ap"))
          .select(col("event_type"), col("n"),
            col("ap")(0).as("p50_a"), col("ap")(1).as("p90_a"), col("ap")(2).as("p99_a"))
        val j = ev.join(broadcast(ap), "event_type")
        def ranks(p: Int, v: String) = Seq(
          sum(when(col("c") < col(v), 1L).otherwise(0L)).as(s"lt_$p"),
          sum(when(col("c") <= col(v), 1L).otherwise(0L)).as(s"le_$p"))
        val agg = j.groupBy("event_type")
          .agg(max("n").as("n"),
            (Seq(max("p50_a").as("p50_a"), max("p90_a").as("p90_a"),
              max("p99_a").as("p99_a")) ++
              ranks(50, "p50_a") ++ ranks(90, "p90_a") ++ ranks(99, "p99_a")): _*)
        def ok(p: Int) =
          (col(s"lt_$p") * 100L <= col("n") * (p + 1L)) &&
            (col(s"le_$p") * 100L >= col("n") * (p - 1L))
        agg.select(col("event_type"), col("n"),
            col("p50_a"), col("p90_a"), col("p99_a"),
            ok(50).as("ok_p50"), ok(90).as("ok_p90"), ok(99).as("ok_p99"))
          .orderBy("event_type")
      },
      None),

    // ------------------------------------------------------------------
    // q_approx_distinct — HyperLogLog++ distinct-user counts per event
    // type (constant memory per group vs exact distinct's shuffle of
    // every key — the 100 TB cardinality primitive). Sketches are not
    // engine-portable → no DuckDB oracle; instead the declared output
    // CARRIES ITS OWN CHECK (r4 ask #8): exact_users rides alongside
    // the sketch and within_5pct asserts the |approx − exact| ≤ 5%
    // bound in integer arithmetic, so the driver sees the self-check
    // row-by-row without an oracle. The exact column is the self-check
    // apparatus — at 100 TB it is dropped and only the sketch runs;
    // AdvancedSpec additionally asserts every within_5pct is true.
    QueryDef(
      "q_approx_distinct",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "events")
          .groupBy("event_type")
          .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
            countDistinct(col("user_id")).as("exact_users"),
            count(lit(1)).as("n"))
          .withColumn("within_5pct",
            abs(col("approx_users") - col("exact_users")) * 100L
              <= col("exact_users") * 5L)
          .orderBy("event_type"),
      None),

    // ------------------------------------------------------------------
    // q_compaction_bins ★ (new r5) — small-file compaction planning,
    // the OTHER half of table maintenance next to q_zorder's clustering:
    // given the per-file size ledger a lake table accumulates (modelled
    // here as the (source, doc_id/20) parquet files a naive ingest
    // would emit, sized by n_chars), assign files to target-sized
    // compaction groups WITHOUT breaking their order — the planner
    // behind OPTIMIZE / bin-packing rewrite jobs (order-preserving so
    // the table's clustering survives the rewrite). Bin rule: a file
    // joins bin ⌊cum_before/target⌋ — prefix-sum packing, the same
    // alignment Spark's own maxPartitionBytes file coalescing uses; a
    // straddling file joins the bin it starts in, so a bin overshoots
    // by at most one file and no bin but the last runs under target.
    // Plan: one hash agg corpus → file ledger (map-side combined), one
    // per-source window prefix-sum over the LEDGER (file-count-sized,
    // ≪ corpus), one bin agg. At 100 TB the ledger is table metadata —
    // this query never touches data bytes at all.
    QueryDef(
      "q_compaction_bins",
      (s: SparkSession, dir: String) => {
        import graft.functions.ExactMath
        val target = 2000L
        val files = Tables(s, dir, "documents")
          .groupBy(col("source"),
            ExactMath.divTrunc(col("doc_id"), lit(20L)).as("file_id"))
          .agg(sum("n_chars").as("bytes"))
        val w = Window.partitionBy("source").orderBy("file_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        files
          .withColumn("cum", coalesce(sum("bytes").over(w), lit(0L)))
          .withColumn("bin", ExactMath.divTrunc(col("cum"), lit(target)).cast("int"))
          .groupBy("source", "bin")
          .agg(count(lit(1)).as("n_files"), sum("bytes").as("total_bytes"),
            min("file_id").as("first_file"), max("file_id").as("last_file"))
          .orderBy("source", "bin")
      },
      Some("""WITH f AS (
             |  SELECT source, doc_id // 20 AS file_id,
             |    CAST(SUM(n_chars) AS BIGINT) AS bytes
             |  FROM documents GROUP BY 1, 2),
             |c AS (
             |  SELECT source, file_id, bytes,
             |    COALESCE(SUM(bytes) OVER (PARTITION BY source ORDER BY file_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
             |  FROM f)
             |SELECT source, CAST(cum // 2000 AS INTEGER) AS bin,
             |  COUNT(*) AS n_files, CAST(SUM(bytes) AS BIGINT) AS total_bytes,
             |  MIN(file_id) AS first_file, MAX(file_id) AS last_file
             |FROM c GROUP BY 1, 2 ORDER BY source, bin""".stripMargin)),

    // ------------------------------------------------------------------
    // q_interval_join ★ (r5, replanned r6) — interval-OVERLAP join:
    // per error event's ±5-minute incident window, how many users'
    // daily activity spans overlap it — "blast radius per incident".
    // The r5 plan exploded both sides into hour buckets and equi-joined;
    // the scale curve killed it: the true (burst, span) overlap
    // RELATION is ~9.4e8 pairs at gen-sf1 (each peak-hour burst
    // overlaps thousands of day-wide spans) and any pair-materializing
    // join pays that in full even though the answer is only a COUNT
    // per burst (2e5 rows). Measured 584 s; the bucket dilation was
    // never the problem (1.28×) — the pair relation itself is
    // density-quadratic.
    //
    // r6 plan: interval STABBING COUNTS via a time-partitioned prefix
    // sum — pairs never exist. Each span emits +1 at lo−5min and −1
    // at hi+5min (the window inverted onto the point); each burst is
    // a probe at its instant; #spans covering a probe = running sum
    // of deltas at the probe's sort position = per-hour running sum
    // (window partitioned by hour: density-linear partitions) + a
    // carry of all earlier hours' deltas (an hours-sized frame,
    // broadcast back). Kind ordering (starts < probes < ends) makes
    // both interval ends inclusive, exactly the r5 predicate.
    // DISTINCT-user correction by inclusion–exclusion: a user counts
    // twice only when her day-d and day-d+1 spans BOTH cover the
    // probe, which needs the overnight gap ≤ 10 min — a rare
    // adjacent-day self-join (equi on user, d+1), whose both-cover
    // windows equi-join to the probes by hour bucket (AQE picks
    // broadcast vs shuffle: the set is data-dependent). n_users =
    // #covering spans − #double-covers, exact. Triple cover is
    // impossible (a 10-min window cannot reach day d+2).
    // All-integer micros; oracle = the naive inequality join (two
    // algorithms, same rows). At 100 TB: work is O(n log n) in the
    // sweep rows — two key-shuffles (day-group, hour-sort) and one
    // broadcast of the hours-sized carry frame; the hour-cumsum
    // window runs on that same tiny frame (documented single-task
    // window, hours-count rows).
    QueryDef(
      "q_interval_join",
      (s: SparkSession, dir: String) => {
        val HourUs = 3600000000L
        val DayUs = 86400000000L
        val FiveMinUs = 300000000L
        val ev = Tables(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val spans = ev
          .groupBy(col("user_id"), expr(s"us div $DayUs").as("d"))
          .agg(min("us").as("lo"), max("us").as("hi"))
        val nullId = lit(null).cast("long")
        val starts = spans.select((col("lo") - FiveMinUs).as("t"),
          lit(0).as("kind"), lit(1L).as("delta"), nullId.as("event_id"))
        val ends = spans.select((col("hi") + FiveMinUs).as("t"),
          lit(2).as("kind"), lit(-1L).as("delta"), nullId.as("event_id"))
        val probes = ev.filter(col("event_type") === "error")
          .select(col("us").as("t"), lit(1).as("kind"), lit(0L).as("delta"),
            col("event_id"))
        val sweep = starts.unionByName(ends).unionByName(probes)
          .withColumn("hb", expr(s"t div $HourUs"))
        val carry = sweep.groupBy("hb").agg(sum("delta").as("hd"))
          .select(col("hb"), coalesce(sum("hd").over(
            Window.orderBy("hb").rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)).as("carry"))
        // explicit-N repartition: the sweep frame is bytes-small enough
        // for AQE to coalesce the window's hash exchange to ~1
        // partition, serializing the per-hour sort; explicit counts are
        // exempt from coalescing (same finding as q_mm_ahash, r6)
        val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt
        val counted = sweep.repartition(nPart, col("hb"))
          .join(broadcast(carry), "hb")
          .withColumn("run", sum("delta").over(
            Window.partitionBy("hb").orderBy(col("t"), col("kind"))
              .rowsBetween(Window.unboundedPreceding, 0)))
          .filter(col("kind") === 1)
          .select(col("event_id"), (col("carry") + col("run")).as("n_spans"))
        // inclusion–exclusion: users whose adjacent-day spans both
        // cover a probe (overnight gap ≤ 10 min → both-cover window
        // [s2.lo−5min, s1.hi+5min], ≤ 10 min wide → ≤ 2 hour buckets)
        val s1 = spans.as("s1")
        val s2 = spans.as("s2")
        val adj = s1.join(s2,
            col("s1.user_id") === col("s2.user_id") &&
              col("s2.d") === col("s1.d") + 1 &&
              col("s2.lo") - col("s1.hi") <= 2 * FiveMinUs)
          .select((col("s2.lo") - FiveMinUs).as("wlo"),
            (col("s1.hi") + FiveMinUs).as("whi"))
        val adjB = adj.select(col("wlo"), col("whi"),
          explode(sequence(expr(s"wlo div $HourUs"), expr(s"whi div $HourUs")))
            .as("hb"))
        // no broadcast hint: unlike the carry (provably hours-sized),
        // adjB is data-dependent — worst case one row per close
        // adjacent-day user pair × ≤2 buckets, corpus-linear. The join
        // is equi on hb, so AQE broadcasts it while it's small and
        // falls back to a shuffle join when it isn't, instead of
        // OOMing the driver at 100 TB.
        val corr = probes.withColumn("hb", expr(s"t div $HourUs"))
          .join(adjB, "hb")
          .filter(col("t") >= col("wlo") && col("t") <= col("whi"))
          .groupBy("event_id").agg(count(lit(1)).as("n_dup"))
        counted.join(corr, Seq("event_id"), "left")
          .select(col("event_id"),
            (col("n_spans") - coalesce(col("n_dup"), lit(0L))).as("n_users_active"))
          .filter(col("n_users_active") > 0)
          .orderBy("event_id")
      },
      Some("""WITH ev AS (
             |  SELECT event_id, user_id, event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
             |  FROM events),
             |a AS (
             |  SELECT user_id, us // 86400000000 AS d,
             |    MIN(us) AS lo, MAX(us) AS hi
             |  FROM ev GROUP BY 1, 2),
             |b AS (SELECT event_id, us FROM ev WHERE event_type = 'error')
             |SELECT b.event_id,
             |  CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users_active
             |FROM b JOIN a ON a.lo <= b.us + 300000000
             |  AND a.hi >= b.us - 300000000
             |GROUP BY 1 ORDER BY event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_incr_agg ★ (new r5) — incremental view maintenance: a daily
    // aggregate "materialized view" maintained as MERGEABLE partial
    // state — (n, sum, min, max) per (day, event_type) — refreshed by
    // aggregating only a DELTA batch and algebraically merging it into
    // the stored state (Σn, Σsum, min-of-min, max-of-max), never
    // rescanning history. The query computes state over a base batch
    // and a delta batch SEPARATELY (split by event_id parity, so every
    // group genuinely spans both batches and the merge does real work),
    // merges, and derives the non-mergeable average from merged state
    // (the classic IVM lesson: store sums, derive ratios) in the
    // engine-exact half-up-cents form. The oracle computes the DIRECT
    // aggregate over everything — merge(agg(base), agg(delta)) ==
    // agg(base ∪ delta) is the correctness property, checked
    // cross-engine. Plan: two filtered scans each reduced map-side to
    // group-sized partials, one group-keyed merge agg; at 100 TB the
    // base partials are the stored view (days × types rows — tiny) and
    // only the delta batch is ever scanned.
    QueryDef(
      "q_incr_agg",
      (s: SparkSession, dir: String) => {
        import graft.functions.ExactMath
        def cents = round(col("value") * 100).try_cast("long")
        def partial(df: org.apache.spark.sql.DataFrame) =
          df.groupBy(to_date(col("ts")).as("day"), col("event_type"))
            .agg(count(lit(1)).as("n"), sum(cents).as("sum_cents"),
              min(cents).as("min_cents"), max(cents).as("max_cents"))
        val ev = Tables(s, dir, "events")
        val base = partial(ev.filter(col("event_id") % 2 === 0))
        val delta = partial(ev.filter(col("event_id") % 2 === 1))
        base.unionByName(delta)
          .groupBy("day", "event_type")
          .agg(sum("n").as("n"), sum("sum_cents").as("sum_cents"),
            min("min_cents").as("min_cents"), max("max_cents").as("max_cents"))
          .select(col("day"), col("event_type"), col("n"), col("sum_cents"),
            col("min_cents"), col("max_cents"),
            ExactMath.divTrunc(col("sum_cents") * 200L + col("n"),
              col("n") * 2L).as("avg_cents"))
          .orderBy("day", "event_type")
      },
      Some("""SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
             |  COUNT(*) AS n,
             |  CAST(SUM(TRY_CAST(ROUND(value*100,0) AS BIGINT)) AS BIGINT) AS sum_cents,
             |  MIN(TRY_CAST(ROUND(value*100,0) AS BIGINT)) AS min_cents,
             |  MAX(TRY_CAST(ROUND(value*100,0) AS BIGINT)) AS max_cents,
             |  CAST((SUM(TRY_CAST(ROUND(value*100,0) AS BIGINT)) * 200 + COUNT(*))
             |    // (COUNT(*) * 2) AS BIGINT) AS avg_cents
             |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q_sample_weighted ★ (new r5) — deterministic WEIGHTED sampling:
    // per-language inclusion probability p = min(1, K/n_lang) (K = 20),
    // so rare languages are kept whole and common ones are downsampled
    // toward ~K docs — the mixture-rebalancing sampler that turns
    // q_mix_weights' share table into an actual corpus (up-weighting
    // low-resource languages is exactly this op at pretraining scale).
    // Membership stays hash-deterministic (q_sample_hash's guarantee —
    // identical across runs/engines/cluster sizes/corpus growth):
    // keep iff md5₆₀(doc_id) mod 1e6 < p_e6, with p_e6 exact integer
    // ⌊min(1e6, 20e6/n_lang)⌋. Plan: one corpus→lang count agg, its
    // ≤|langs|-row result broadcast back onto a second scan, map-only
    // filter, one final lang agg — no corpus shuffle at any step.
    // n_kept is binomial around n·p, NOT exact-K (that's
    // q_sample_strat's job); the spec bounds the deviation.
    QueryDef(
      "q_sample_weighted",
      (s: SparkSession, dir: String) => {
        import graft.functions.ExactMath
        val h = pmod(graft.functions.Md5Ops.md5Prefix(col("doc_id").cast("string"), 15), lit(1000000L))
        val docs = Tables(s, dir, "documents")
        val langN = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
          .withColumn("p_e6",
            least(lit(1000000L), ExactMath.divTrunc(lit(20000000L), col("n_docs"))))
        docs.join(broadcast(langN), "lang")
          .filter(h < col("p_e6"))
          .groupBy("lang")
          .agg(max("n_docs").as("n_docs"), max("p_e6").as("p_e6"),
            count(lit(1)).as("n_kept"), min("doc_id").as("first_kept"))
          .orderBy("lang")
      },
      Some("""WITH ln AS (
             |  SELECT lang, COUNT(*) AS n_docs,
             |    LEAST(1000000, 20000000 // COUNT(*)) AS p_e6
             |  FROM documents GROUP BY 1),
             |k AS (
             |  SELECT d.lang, d.doc_id FROM documents d JOIN ln USING (lang)
             |  WHERE ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
             |    % 1000000 < ln.p_e6)
             |SELECT ln.lang AS lang, ln.n_docs, CAST(ln.p_e6 AS BIGINT) AS p_e6,
             |  COUNT(*) AS n_kept, MIN(k.doc_id) AS first_kept
             |FROM k JOIN ln USING (lang)
             |GROUP BY ln.lang, ln.n_docs, ln.p_e6
             |ORDER BY ln.lang""".stripMargin))
  )
}
