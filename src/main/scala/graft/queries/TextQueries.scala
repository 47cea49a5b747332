package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Batch 5 ★ — text analysis over the `documents` table: token
  * statistics, quality scoring, language-marker scoring, and
  * shingle-based document fingerprinting. These are the text legs of a
  * training-data pipeline (north-star scope in SURVEY.md §2 Part B).
  *
  * Scale notes:
  *  - tokenization is a codegen'd `split`; explodes are generated
  *    row-wise (no driver materialization);
  *  - per-doc metrics are a single narrow projection — one pass over
  *    the text column, no shuffle;
  *  - token frequency is one hash aggregation on the token (shuffle on
  *    the token only, after map-side partial agg);
  *  - fingerprints use md5 (identical in every engine) so the oracle
  *    can reproduce them; ratio metrics are exact integer e2/e4 units
  *    (half-up integer division), never floats.
  */
object TextQueries {

  private def toks: Column = split(col("text"), " ")

  /** df-cut tf-idf postings (doc_id, term, w) over a documents frame —
    * the shared weight scheme of q_doc_sim_sparse and q_hybrid_rrf
    * (one implementation so the cut and idf scale can never drift
    * apart): w = tf · (100·N // df), terms with
    * df > max(2, min(N/10, 100)) dropped (Bayardo-style size pruning
    * with an absolute salience cap — see the r8 note in the body;
    * headroom argued on q_doc_sim_sparse). Persisted + eagerly materialized — every
    * caller has multiple consumers (the PERF_NOTES race rule).
    */
  def dfCutWeights(docs: DataFrame): DataFrame = {
    import graft.functions.ExactMath
    val tf = docs.select(col("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // df ≤ max(2, min(N/10, 100)): the r5 cut was N/10 alone, which is
    // NOT corpus-linear — Bayardo's candidate bound is cut·|postings|,
    // and a cut proportional to N makes that Θ(N²). The 31-word corpus
    // masked it (every term's df ≈ N, so the cut killed all but a tiny
    // tail); the r8 Heaps-law corpus exposed it (q_doc_sim_sparse
    // 4.1 s → 513 s for 10× data — candidates ∝ Σ_{df≤N/10} df² grows
    // quadratically on a Zipf vocabulary). The absolute 100-doc
    // salience cap restores the linear bound: a term in >100 documents
    // has idf² discrimination ~zero and only manufactures fan-out. The
    // N/10 leg still governs below N=1000, so driver-scale results are
    // unchanged.
    val wgt = tf.join(df_, "term").crossJoin(broadcast(n))
      .filter(col("df") <= greatest(lit(2L),
        least(ExactMath.divTrunc(col("n_docs"), lit(10L)), lit(100L))))
      .select(col("doc_id"), col("term"),
        (col("tf") * ExactMath.divTrunc(col("n_docs") * 100L, col("df"))).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    wgt.count()
    wgt
  }

  /** The oracle-side twin of [[dfCutWeights]]: CTEs p/tf/df/n/w over
    * `documents` — interpolated into both consumers' oracle SQL so the
    * two engines' shared scheme is also SHARED TEXT, not a copy.
    */
  val DfCutWeightsSql: String =
    """p AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM p GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |w AS (
      |  SELECT tf.doc_id, tf.term,
      |    tf.tf * ((n.n_docs * 100) // df.df) AS w
      |  FROM tf JOIN df USING (term) CROSS JOIN n
      |  WHERE df.df <= GREATEST(2, LEAST(n.n_docs // 10, 100)))""".stripMargin

  /** Half-up integer ratio in e4 units: round(1e4 * num/den) — exact
    * long division (ExactMath), never double (per-doc numerators can't
    * reach 2^53 today, but the exact form costs nothing). */
  private def ratioE4(num: Column, den: Column): Column =
    graft.functions.ExactMath.divTrunc(num * lit(20000L) + den, den * lit(2L))

  /** Exact integer division on non-negative longs (≡ DuckDB `//` in
    * that range), via Catalyst IntegralDivide — exact full long range. */
  private def floorDivL(a: Column, b: Column): Column =
    graft.functions.ExactMath.divTrunc(a, b)

  /** k-th smallest value of the weighted multiset described by a
    * `(z: long, c: long)` histogram frame, WITHOUT any global window:
    * iteratively partition the value interval [lo, hi] into ≤ maxB
    * fixed-width buckets (one hash agg per level; each driver collect
    * is hard-bounded at maxB rows regardless of corpus size or score
    * uniqueness), descend into the bucket containing the running rank,
    * and finish exactly once the interval holds ≤ maxB distinct
    * integers. Levels = ⌈log_maxB(hi − lo + 1)⌉. Caller guarantees
    * 1 ≤ k ≤ Σc and [lo, hi] spans the histogram; the frame should be
    * persisted (each level re-scans it). Used by q_conformal_gate;
    * unit-exercised with tiny maxB to force multi-level descent. */
  private[graft] def bucketedKthSmallest(hist: DataFrame, k: Long,
      zMin: Long, zMax: Long, maxB: Long): Long = {
    var lo = zMin
    var hi = zMax
    var rank = k // invariant: result = rank-th smallest within [lo, hi]
    while (hi - lo + 1L > maxB) {
      val w = (hi - lo) / maxB + 1L // bucket width: ⌈(hi-lo+1)/maxB⌉
      val counts = hist.filter(col("z").between(lo, hi))
        .groupBy(floorDivL(col("z") - lit(lo), lit(w)).as("b"))
        .agg(sum("c").as("cb"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      var i = 0
      var cum = 0L
      while (cum + counts(i)._2 < rank) { cum += counts(i)._2; i += 1 }
      rank -= cum
      val b = counts(i)._1
      hi = math.min(hi, lo + (b + 1L) * w - 1L)
      lo = lo + b * w
    }
    val fin = hist.filter(col("z").between(lo, hi))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var i = 0
    var cum = fin(0)._2
    while (cum < rank) { i += 1; cum += fin(i)._2 }
    fin(i)._1
  }

  // --------------------------------------------------------------------
  // Learned quality classifier (r12 verdict #1): the CCNet/DCLM/FineWeb
  // curation stage the heuristic gates (q_quality_gate,
  // q_quality_adaptive) don't cover — a LINEAR scorer over hashed token
  // features. Features are q_feature_hash's md5-mod-256 vectorizer;
  // weights and bias are HASH-DERIVED integers in e6 units (the
  // annPlanes trick: md5("qw"+dim) — no RNG state, so both engines
  // rebuild the identical model from indices alone, and the APPLY is
  // exact integer end-to-end).

  /** 60-bit md5-derived value for a seed string — driver-side twin of
    * the oracle's ('0x' || substring(md5(seed), 1, 15))::BIGINT. */
  private def h60(seed: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** e6-unit weight per hashed feature dim: md5("qw"+d) folded into
    * [-100000, 100000] (i.e. [-0.1, 0.1]). */
  private[graft] lazy val qcWeights: IndexedSeq[Long] =
    (0 until 256).map(d => h60("qw" + d) % 200001L - 100000L)

  /** e6-unit bias, same derivation family. */
  private[graft] lazy val qcBias: Long = h60("qwb") % 200001L - 100000L

  /** Feature dim of a token — q_feature_hash's exact scheme. */
  private def qcDim(t: Column): Column =
    pmod(graft.functions.Md5Ops.md5Prefix(t, 15), lit(256L))

  /** Pseudo-label shared by q_quality_grad and q_quality_train: a cheap
    * heuristic gate (≥ 10 tokens AND ≥ half distinct) — the CCNet-style
    * distillation target a linear scorer learns to imitate. */
  private def qcLabel: Column = {
    val t = split(col("text"), " ")
    when(size(array_distinct(t)) * 2 >= size(t) && size(t) >= 10, 1L)
      .otherwise(0L)
  }

  /** The ONE double step of the classifier-training family, shared by
    * q_quality_grad and q_quality_train: per-doc residual quantized to
    * e6 — r = floor((s(z/1e6) − y)·1e6 + 0.5) with the RATIONAL
    * squashing s(z) = 0.5 + z/(2·(1+|z|)) (the "fast sigmoid") instead
    * of the libm logistic. Deliberate, and the reason the family is
    * exact at ANY corpus size: σ = 1/(1+exp(−z)) differs between Java's
    * and DuckDB's exp in the final ulps, and the min distance of
    * (σ−y)·1e6+0.5 to a floor boundary SHRINKS as docs accumulate
    * (measured: 7.6e-4 at 500 docs → 1.2e-10 at gen-sf1's 50k — AT the
    * ~1e-9 libm noise floor, i.e. a coin-flip row). s needs only
    * + − × ÷ abs — each IEEE-correctly-rounded with identical operand
    * trees in both engines — so the quantized residual is BIT-IDENTICAL
    * by construction, margins irrelevant. s is a monotone sigmoid with
    * s' = 1/(2(1+|z|)²) ≤ ½; its integral loss is convex, so the
    * descent guarantees carry over with smoothness ½·Σ‖x‖² (the 2/S
    * step in q_quality_train). Everything after this one double
    * expression is commutative long arithmetic. */
  private def qcResidE6(z: Column, y: Column): Column = {
    val zd = z.cast("double") / lit(1000000.0)
    val sz = lit(0.5) + zd / (lit(2.0) * (lit(1.0) + abs(zd)))
    floor((sz - y.cast("double")) * lit(1000000.0) + lit(0.5)).cast("long")
  }

  /** Oracle-side twin of the weight derivation — interpolated into
    * every consumer so the formula is SHARED TEXT. */
  private val QcWeightSqlExpr =
    "(('0x' || substring(md5('qw' || CAST(d AS VARCHAR)), 1, 15))::BIGINT % 200001) - 100000"

  /** Oracle-side twin of [[qcResidE6]] — the IDENTICAL operand tree
    * (each IEEE op correctly rounded on the same inputs → bit-equal),
    * interpolated so the formula is shared text. */
  private def qcResidSqlExpr(z: String, y: String): String =
    s"CAST(floor(((0.5 + (CAST($z AS DOUBLE) / 1000000.0)" +
      s" / (2.0 * (1.0 + abs(CAST($z AS DOUBLE) / 1000000.0))))" +
      s" - CAST($y AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"

  /** Per-document linear score in e6 units, MAP-ONLY: one fold over
    * the token array (functions.aggregate — no explode, no doc_id
    * shuffle), each token contributing its dim's weight. The weight
    * vector rides as a 256-long foldable array literal — the degenerate
    * ideal of a broadcast: a plan constant shipped inside the task
    * binary. At 100 TB this pass runs at scan speed.
    */
  private[queries] def qcScoreE6: Column = {
    val wArr = array(qcWeights.map(lit(_)): _*)
    // NULL text scores as '' (one empty token): without the coalesce
    // Spark's fold returns a NULL score row while the oracle's unnest
    // DROPS the doc from sc — every downstream count diverges by one
    // per NULL doc (r17 nasty sweep)
    aggregate(split(coalesce(col("text"), lit("")), " "), lit(qcBias),
      (acc, t) => acc + element_at(wArr, qcDim(t).cast("int") + 1))
  }

  /** Shared oracle prefix: the weight table, per-token dims, and the
    * per-doc score — interpolated into both consumers' SQL so the
    * scheme is SHARED TEXT (the DfCutWeightsSql rule). Ends in
    * sc(doc_id, source, z). Parameterized over the document relation
    * (r17): the classifier/calibration rows union the
    * [[TextFixture.qcDocs]] planted slice in, everything else reads
    * the bare corpus.
    */
  private def qcScoreSqlFrom(docsRel: String): String =
    s"""w AS (SELECT CAST(d AS INTEGER) AS d,
       |  $QcWeightSqlExpr AS w
       |  FROM range(0, 256) t(d)),
       |tok AS (SELECT doc_id, source,
       |          unnest(string_split(COALESCE(text, ''), ' ')) AS t
       |        FROM $docsRel),
       |dims AS (SELECT doc_id, source,
       |  CAST(('0x' || substring(md5(t), 1, 15))::BIGINT % 256 AS INTEGER) AS d
       |  FROM tok),
       |sc AS (SELECT doc_id, source,
       |  $qcBias + CAST(SUM(w.w) AS BIGINT) AS z
       |  FROM dims JOIN w USING (d) GROUP BY doc_id, source)""".stripMargin

  private[queries] lazy val QcScoreSql: String = qcScoreSqlFrom("documents")

  /** The corpus ∪ planted-qc document relation, oracle side (doc_id,
    * text, source).
    */
  private[queries] lazy val QcDocsUnionRel: String =
    s"""(SELECT doc_id, text, source FROM documents
       |  UNION ALL ${TextFixture.qcSqlRows}) qdocs""".stripMargin

  private[queries] lazy val QcScoreFixtureSql: String =
    qcScoreSqlFrom(QcDocsUnionRel)

  /** The corpus ∪ planted-qc document frame, Spark side — the
    * q_quality_classifier / q_quality_calibration input (r17 fixture
    * liveness; see [[TextFixture.qcDocs]]).
    */
  private def qcFixtureInput(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .unionByName(TextFixture.qcDocs.toDF("doc_id", "text", "source"))
  }

  /** Gradient-descent steps for q_quality_train; 3 exercises weights
    * updated from a PREVIOUS step's gradient feeding the next score. */
  private[queries] val QcTrainSteps = 3

  /** The q_quality_train oracle: the identical descent unrolled as
    * generated CTEs (the BpeTrainSql rule — the step logic exists once).
    * All distributed state lives on the (doc, dim, count) sufficient-
    * statistics frame `cnt`; weights are 257-row CTEs (dim −1 = bias);
    * the update w − (g·4) // S uses DuckDB `//` which TRUNCATES on
    * mixed signs, exactly matching Scala Long division in the driver
    * loop (ExactMath scaladoc: divTrunc ≡ `//`; floorDiv is NOT this).
    */
  private def qcTrainSql: String = {
    val steps = (1 to QcTrainSteps).map { r =>
      s"""z$r AS (SELECT cnt.doc_id,
         |  (SELECT w FROM w${r - 1} WHERE d = -1)
         |    + CAST(SUM(cnt.c * w.w) AS BIGINT) AS z
         |  FROM cnt JOIN w${r - 1} w ON cnt.d = w.d GROUP BY cnt.doc_id),
         |r$r AS (SELECT z$r.doc_id,
         |  ${qcResidSqlExpr(s"z$r.z", "y.y")} AS r
         |  FROM z$r JOIN y USING (doc_id)),
         |g$r AS (
         |  SELECT cnt.d, CAST(SUM(r$r.r * cnt.c) AS BIGINT) AS g
         |  FROM cnt JOIN r$r USING (doc_id) GROUP BY cnt.d
         |  UNION ALL
         |  SELECT -1, CAST(SUM(r) AS BIGINT) FROM r$r),
         |w$r AS (SELECT w.d,
         |  w.w - (COALESCE(g.g, 0) * 2) // s2.s AS w
         |  FROM w${r - 1} w LEFT JOIN g$r g ON w.d = g.d CROSS JOIN s2)""".stripMargin
    }.mkString(",\n")
    val finalCols = (0 to QcTrainSteps)
      .map(r => s"w$r.w AS w${r}_e6").mkString(", ")
    val finalJoins = (1 to QcTrainSteps)
      .map(r => s"JOIN w$r ON w0.d = w$r.d").mkString(" ")
    s"""WITH wh AS (SELECT CAST(d AS INTEGER) AS d,
       |  $QcWeightSqlExpr AS w
       |  FROM range(0, 256) t(d)),
       |w0 AS (SELECT d, w FROM wh
       |       UNION ALL SELECT CAST(-1 AS INTEGER), $qcBias),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
       |        FROM documents),
       |cnt AS (SELECT doc_id,
       |  CAST(('0x' || substring(md5(t), 1, 15))::BIGINT % 256 AS INTEGER) AS d,
       |  CAST(COUNT(*) AS BIGINT) AS c
       |  FROM tok GROUP BY 1, 2),
       |s2 AS (SELECT GREATEST(1, COALESCE(CAST(SUM(c * c) AS BIGINT), 0)
       |  + (SELECT COUNT(*) FROM documents)) AS s FROM cnt),
       |y AS (SELECT doc_id,
       |  CASE WHEN len(list_distinct(string_split(text, ' '))) * 2
       |         >= len(string_split(text, ' '))
       |       AND len(string_split(text, ' ')) >= 10
       |    THEN 1 ELSE 0 END AS y
       |  FROM documents),
       |$steps
       |SELECT w0.d AS dim, $finalCols
       |FROM w0 $finalJoins
       |ORDER BY dim""".stripMargin
  }

  /** Full-batch descent steps for the language-ID family (the
    * QcTrainSteps rule). */
  private[queries] val LangIdSteps = 3

  /** Observability: how many times [[langIdTrainCore]] actually ran —
    * the spec pins that train + apply share ONE materialized model. */
  private[graft] val langIdTrainRuns =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** LangID trainer core — a fastText-style HASHED-FEATURE linear
    * classifier (Joulin et al. 2017's shape: hashed token features →
    * per-class linear score; the subword n-gram leg would hash char
    * n-grams into the same 256-dim table — one extra explode, same
    * plan): K one-vs-rest binary classifiers over the SHARED qcDim
    * feature scheme (q_feature_hash's md5-mod-256), trained from ZERO
    * init by [[LangIdSteps]] full-batch steps of the
    * [[qcResidE6]] rational-fast-sigmoid descent at the exact 2/S
    * smoothness step (S = Σ_docs(Σ_d c_d² + 1), shared across classes
    * — same features). The descent is the q_quality_train machinery
    * vectorized over the class axis: the corpus is read ONCE into the
    * (doc, dim, count) sufficient-statistics frame; each step is one
    * statistics-sized pass computing all K scores as agg columns and
    * all K×257 gradient longs in one collect (≈ 1.3k longs for K = 5
    * — model-sized, the q_kmeans_iter argument). Returns the final
    * (lang, dim, w_e6) weight frame, dim = −1 the bias.
    */
  /** The langid rows' input: the corpus PLUS the [[TextFixture]]
    * planted per-lang-vocabulary docs (r16, r15 verdict #4) — rides
    * along identically in both engines (the oracle unions the same
    * rows as literals), so the driver-checked confusion matrix shows
    * live diagonal dominance on the planted langs instead of only the
    * majority collapse of the all-English corpus.
    */
  private def langIdInput(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      // a NULL label is an UNLABELED doc: both engines fold it into the
      // '' class (r17 nasty sweep — a null lang NPE'd the driver-side
      // class-list sort, and SQL's NULL≠NULL join semantics would have
      // silently frozen a NULL class at zero weights)
      .select(col("doc_id"), col("text"),
        coalesce(col("lang"), lit("")).as("lang"))
      .unionByName(TextFixture.langIdDocs.toDF("doc_id", "text", "lang"))
  }

  private def langIdTrainCore(s: SparkSession, dir: String): DataFrame = {
    langIdTrainRuns.incrementAndGet()
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val docs = langIdInput(s, dir)
    val langs = docs.select("lang").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val cnt = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tk"))
      .select(col("doc_id"), qcDim(col("tk")).cast("int").as("d"))
      .groupBy("doc_id", "d").agg(count(lit(1)).as("c"))
      .persist(mem)
    val yf = docs.select(col("doc_id"), col("lang")).persist(mem)
    val sumC2 = cnt.agg(sum(col("c") * col("c"))).collect()(0).getLong(0)
    val sVal = sumC2 + yf.count() // + Σ_docs 1² (the bias feature)
    var w: Map[String, Array[Long]] =
      langs.map(_ -> Array.fill(256)(0L)).toMap
    var b: Map[String, Long] = langs.map(_ -> 0L).toMap
    for (_ <- 1 to LangIdSteps) {
      val zCols = langs.map { l =>
        val wArr = array(w(l).toIndexedSeq.map(lit(_)): _*)
        sum(col("c") * element_at(wArr, col("d") + 1)).as(s"zs_$l")
      }
      val z = cnt.groupBy("doc_id").agg(zCols.head, zCols.tail: _*)
      val rCols = langs.map { l =>
        qcResidE6(lit(b(l)) + col(s"zs_$l"),
          when(col("lang") === l, 1L).otherwise(0L)).as(s"r_$l")
      }
      val rs = z.join(yf, "doc_id")
        .select(col("doc_id") +: rCols: _*)
        .persist(mem)
      val gCols = langs.map(l => sum(col(s"r_$l") * col("c")).as(s"g_$l"))
      val g = cnt.join(rs, "doc_id")
        .groupBy("d").agg(gCols.head, gCols.tail: _*)
        .collect()
        .map(r => r.getInt(0) -> langs.indices.map(i => r.getLong(i + 1)))
        .toMap
      val gbCols =
        langs.map(l => coalesce(sum(col(s"r_$l")), lit(0L)).as(s"gb_$l"))
      val gb = rs.agg(gbCols.head, gbCols.tail: _*).collect()(0)
      rs.unpersist()
      w = langs.zipWithIndex.map { case (l, li) =>
        l -> Array.tabulate(256)(d =>
          w(l)(d) - g.get(d).map(_(li)).getOrElse(0L) * 2L / sVal)
      }.toMap
      b = langs.zipWithIndex.map { case (l, li) =>
        l -> (b(l) - gb.getLong(li) * 2L / sVal)
      }.toMap
    }
    cnt.unpersist(); yf.unpersist()
    import s.implicits._
    langs.flatMap { l =>
      ((-1, b(l)) +: (0 until 256).map(d => (d, w(l)(d))))
        .map { case (d, wv) => (l, d, wv) }
    }.toDF("lang", "dim", "w_e6")
  }

  /** The trained langid model, MATERIALIZED once per corpus through
    * the [[CorpusTable]] seam (the bpeModel pattern): (lang, dim, w_e6)
    * with dim = −1 the bias. Shared by q_langid_train and
    * q_langid_apply — apply is a broadcast join against the at-rest
    * model, never a re-train.
    */
  private def langIdModel(s: SparkSession, dir: String): DataFrame =
    CorpusTable.materialized(s, dir,
      s"langidmodel_v2_${TextFixture.langIdKey}")( // v2: r17 null-lang fold
      langIdTrainCore(s, dir))

  /** The langid descent unrolled as generated CTEs, LANG-KEYED (the
    * qcTrainSql rule vectorized over the one-vs-rest class axis) —
    * ONE copy of the chain, shared by the q_langid_train and
    * q_langid_apply oracles. Ends in `lw{LangIdSteps}(lang, d, w)`.
    * MATERIALIZED hints are load-bearing (the unigramRoundCte rule:
    * multi-consumer CTE chains re-inline exponentially without them).
    */
  private def langIdSql: String = {
    val steps = (1 to LangIdSteps).map { r =>
      val p = r - 1
      s"""lz$r AS MATERIALIZED (
         |  SELECT w.lang, cnt.doc_id, CAST(SUM(cnt.c * w.w) AS BIGINT) AS zs
         |  FROM cnt JOIN lw$p w ON cnt.d = w.d GROUP BY 1, 2),
         |lr$r AS MATERIALIZED (
         |  SELECT z.lang, z.doc_id,
         |    ${qcResidSqlExpr("(z.zs + b.w)",
            "(CASE WHEN y.lang = z.lang THEN 1 ELSE 0 END)")} AS r
         |  FROM lz$r z
         |  JOIN lw$p b ON b.lang = z.lang AND b.d = -1
         |  JOIN y ON y.doc_id = z.doc_id),
         |lg$r AS MATERIALIZED (
         |  SELECT r.lang, cnt.d, CAST(SUM(r.r * cnt.c) AS BIGINT) AS g
         |  FROM cnt JOIN lr$r r ON cnt.doc_id = r.doc_id GROUP BY 1, 2
         |  UNION ALL
         |  SELECT lang, -1, CAST(SUM(r) AS BIGINT) FROM lr$r GROUP BY 1),
         |lw$r AS MATERIALIZED (
         |  SELECT w.lang, w.d, w.w - (COALESCE(g.g, 0) * 2) // s2.s AS w
         |  FROM lw$p w LEFT JOIN lg$r g ON w.lang = g.lang AND w.d = g.d
         |  CROSS JOIN s2)""".stripMargin
    }.mkString(",\n")
    s"""ldocs AS (SELECT doc_id, text, COALESCE(lang, '') AS lang
       |  FROM documents
       |  UNION ALL ${TextFixture.langIdSqlRows}),
       |lgs AS (SELECT DISTINCT lang FROM ldocs),
       |lw0 AS (SELECT lang, CAST(d AS INTEGER) AS d, CAST(0 AS BIGINT) AS w
       |        FROM lgs CROSS JOIN (SELECT unnest(range(-1, 256)) AS d) dd),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
       |        FROM ldocs),
       |cnt AS MATERIALIZED (SELECT doc_id,
       |  CAST(('0x' || substring(md5(t), 1, 15))::BIGINT % 256 AS INTEGER) AS d,
       |  CAST(COUNT(*) AS BIGINT) AS c
       |  FROM tok GROUP BY 1, 2),
       |s2 AS (SELECT CAST(SUM(c * c) AS BIGINT)
       |  + (SELECT COUNT(*) FROM ldocs) AS s FROM cnt),
       |y AS (SELECT doc_id, lang FROM ldocs),
       |$steps""".stripMargin
  }

  /** Rounds for q_bpe_train: ≥ 3 per the r11 verdict; 5 exercises
    * merged tokens participating in later rounds' pairs.
    */
  private[queries] val BpeTrainRounds = 5

  /** The q_bpe_train oracle: the identical rounds UNROLLED as CTEs,
    * generated from ONE (pair-count → argmax → greedy-apply) fragment
    * so the round logic exists once (the CcSql rule). DuckDB's
    * list_reduce reproduces BpeApply's greedy left-to-right
    * non-overlap exactly: the accumulator is the merged-so-far token
    * string (US-joined); a merge rewrites the tail token to t1‖t2,
    * which can never equal t1 again (t2 nonempty), so a token produced
    * this round never re-merges — the same invariant the Scala scan's
    * skip-two enforces. An exhausted vocabulary degrades identically
    * in both engines: an empty argmax m_r contributes no merge rows,
    * and each apply CTE's NOT EXISTS branch carries s_{r-1} through
    * unchanged (r12 ADVICE: without it an empty m_r cross join emptied
    * every later s_r, so the encode oracle's vocabulary collapsed while
    * Spark — which breaks out of the loop — kept the last real
    * segmentation).
    */
  private def bpePairCte(r: Int) =
    s"""p$r AS (SELECT pair, CAST(SUM(wf) AS BIGINT) AS n FROM (
       |  SELECT wf, unnest(list_transform(range(1, len(toks)),
       |    i -> toks[i] || chr(31) || toks[i+1])) AS pair
       |  FROM s${r - 1} WHERE len(toks) >= 2) GROUP BY 1),
       |m$r AS (SELECT string_split(pair, chr(31))[1] AS t1,
       |  string_split(pair, chr(31))[2] AS t2, n
       |  FROM p$r ORDER BY n DESC, pair LIMIT 1)""".stripMargin

  private def bpeApplyCte(r: Int) =
    s"""s$r AS (SELECT w, wf, string_split(list_reduce(toks,
       |  (acc, x) -> CASE WHEN x = m$r.t2 AND (acc = m$r.t1
       |      OR ends_with(acc, chr(31) || m$r.t1))
       |    THEN left(acc, length(acc) - length(m$r.t1)) || m$r.t1 || m$r.t2
       |    ELSE acc || chr(31) || x END), chr(31)) AS toks
       |  FROM s${r - 1}, m$r
       |  UNION ALL
       |  SELECT w, wf, toks FROM s${r - 1}
       |  WHERE NOT EXISTS (SELECT 1 FROM m$r))""".stripMargin

  /** Shared WITH-prefix of the two BPE oracles: word frequencies, the
    * character segmentation, and [[BpeTrainRounds]] (pair-count →
    * argmax → greedy list_reduce apply) round CTEs. `finalApply` keeps
    * the last round's re-segmentation (the encode oracle reads it; the
    * train oracle only reads the m_r argmax rows).
    */
  private def bpeRoundsSql(finalApply: Boolean): String = {
    val rounds = (1 to BpeTrainRounds).map { r =>
      if (r < BpeTrainRounds || finalApply) bpePairCte(r) + ",\n" + bpeApplyCte(r)
      else bpePairCte(r)
    }.mkString(",\n")
    s"""WITH wf AS (
       |  SELECT w, COUNT(*) AS wf FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) >= 2 GROUP BY w),
       |s0 AS (SELECT w, wf, list_transform(range(1, length(w) + 1),
       |  i -> substring(w, CAST(i AS INTEGER), 1)) AS toks FROM wf),
       |$rounds""".stripMargin
  }

  private val BpeTrainSql: String = {
    val selects = (1 to BpeTrainRounds).map { r =>
      s"SELECT CAST($r AS BIGINT) AS round, t1, t2, t1 || t2 AS merged, n FROM m$r"
    }.mkString("\nUNION ALL ")
    s"""${bpeRoundsSql(finalApply = false)}
       |$selects
       |ORDER BY round""".stripMargin
  }

  /** Training-run counter, test-observable: TextSpec pins that running
    * q_bpe_train AND q_bpe_encode on one corpus trains at most once
    * (the [[bpeModel]] materialization — r12 verdict #2). */
  private[graft] val bpeTrainRuns = new java.util.concurrent.atomic.AtomicInteger

  /** Shared BPE trainer core: runs [[BpeTrainRounds]] driver-orchestrated
    * rounds (pair-count → argmax → codegen'd greedy apply) over the
    * corpus-compressed word-frequency table from the character
    * segmentation, returning the merge table rows and the FINAL
    * segmentation (w, wf, toks) — left persisted for the caller
    * ([[bpeModel]] releases it once the model table is written).
    */
  private def bpeTrainCore(s: SparkSession, dir: String)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    bpeTrainRuns.incrementAndGet()
    import graft.functions.BpeApply.bpeApply
    val words = Tables(s, dir, "documents")
      .select(explode(toks).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("wf"))
    var seg = words.select(col("w"), col("wf"),
      expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        .as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    seg.count()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= BpeTrainRounds && !exhausted) {
      // sequence(1, n) DESCENDS for n < 1 (the q_bpe_pairs trap):
      // fully-merged single-token words must not reach the explode
      val top = seg.filter(size(col("toks")) >= 2)
        .select(col("wf"), explode(expr(
          "transform(sequence(1, size(toks) - 1)," +
            " i -> concat(toks[i-1], chr(31), toks[i]))")).as("pair"))
        .groupBy("pair").agg(sum("wf").as("n"))
        .orderBy(desc("n"), asc("pair")).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true // vocabulary fully merged
      else {
        val Array(t1, t2) = top(0).getString(0).split('\u001f')
        merges += ((r.toLong, t1, t2, top(0).getLong(1)))
        val next = seg.select(col("w"), col("wf"),
          bpeApply(col("toks"), t1, t2).as("toks"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize BEFORE releasing the parent
        seg.unpersist()
        seg = next
        r += 1
      }
    }
    (merges.toSeq, seg)
  }

  /** The trained BPE model, MATERIALIZED once per corpus through the
    * [[CorpusTable]] seam (r12 verdict #2 / finding #3): q_bpe_train
    * and q_bpe_encode each used to invoke the full [[BpeTrainRounds]]
    * trainer, i.e. every Verify/Bench pass trained TWICE — at 100 TB, a
    * duplicate full training run. The model is the same kind of shared
    * corpus-keyed derived table as the dedup battery's pair/CC tables:
    * vocabulary-sized (always ≪ corpus), paid once, read at rest by
    * every consumer.
    *
    * ONE table holds both halves of the model — kind='m' rows are the
    * merge table (round, t1, t2, n), kind='s' rows the final vocabulary
    * segmentation (w, wf, toks) — because CorpusTable installs with a
    * single atomic rename: two separate tables could be split by a
    * crash between the installs, leaving an encode vocabulary from a
    * different training run than the published merges.
    */
  private def bpeModel(s: SparkSession, dir: String): DataFrame = {
    var segRelease: DataFrame = null
    val model = CorpusTable.materialized(s, dir, "bpemodel") {
      val (merges, seg) = bpeTrainCore(s, dir)
      segRelease = seg
      import s.implicits._
      val m = merges.toDF("round", "t1", "t2", "n")
        .select(lit("m").as("kind"), col("round"), col("t1"), col("t2"),
          col("n"), lit(null).cast("string").as("w"),
          lit(null).cast("long").as("wf"),
          lit(null).cast("array<string>").as("toks"))
      val v = seg.select(lit("s").as("kind"),
        lit(null).cast("long").as("round"),
        lit(null).cast("string").as("t1"), lit(null).cast("string").as("t2"),
        lit(null).cast("long").as("n"), col("w"), col("wf"), col("toks"))
      m.unionByName(v)
    }
    // the trainer's per-round persist is only needed while the model
    // table is being written; if the table already existed the build
    // thunk never ran and there is nothing to release
    if (segRelease != null) segRelease.unpersist()
    model
  }

  /** Token stream encoded against the at-rest [[bpeModel]] vocabulary:
    * one exploded (doc_id, lang, word) stream LEFT-joined to the
    * vocabulary-sized (word → subword count) frame — broadcastable at
    * 100 TB — yielding per-token n_chars, n_sub, and the
    * char-fallback flag (word absent from the trained vocab, i.e.
    * < 2 chars). Shared by q_bpe_encode (per-doc budgets) and
    * q_bpe_fertility (per-lang tokenizer eval) so the encode semantics
    * exist once.
    */
  private def bpeEncodedTokens(s: SparkSession, dir: String): DataFrame = {
    val vocab = bpeModel(s, dir).filter(col("kind") === "s")
      .select(col("w"), size(col("toks")).cast("long").as("n_sub"))
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"), explode(toks).as("w"))
      .join(vocab, Seq("w"), "left")
      .select(col("doc_id"), col("lang"),
        length(col("w")).cast("long").as("n_chars"),
        when(col("n_sub").isNull, 1L).otherwise(0L).as("fallback"),
        coalesce(col("n_sub"), length(col("w")).cast("long")).as("n_sub"))
  }

  // ---------------------------------------------------------------
  // Unigram-LM (SentencePiece) tokenizer trainer — the other tokenizer
  // family next to BPE (Kudo 2018, with the hard-EM/Viterbi E-step).
  // ---------------------------------------------------------------

  /** EM rounds for q_unigram_train: round r's Viterbi runs under the
    * counts round r−1 produced, so ≥2 exercises re-estimated scores
    * feeding a later segmentation. */
  private[graft] val UnigramRounds = 2

  /** Max trainable word length (SentencePiece's own cap); longer words
    * are excluded from training and char-fallback at encode. */
  private[queries] val UnigramMaxWord = 16

  /** Training-run counter, test-observable (the bpeTrainRuns pattern):
    * q_unigram_train AND q_unigram_encode on one corpus train at most
    * once through the [[unigramModel]] materialization. */
  private[graft] val unigramTrainRuns =
    new java.util.concurrent.atomic.AtomicInteger

  /** Shared unigram trainer core: hard-EM (Viterbi E-step) over the
    * corpus-compressed word-frequency table. Seed vocabulary = every
    * substring of length ≤ 4 of every (≤ 16-char) word; counts are
    * Laplace-smoothed over the seed domain (cnt = 1 + uses) so the
    * vocabulary never collapses and every position stays reachable
    * (single chars always present — the [[graft.functions.UnigramViterbi]]
    * segmentability contract). Each of [[UnigramRounds]] driver-
    * orchestrated rounds: integer scores L(cnt) − L(C) (exact Q30
    * log2e20; total C is a 1-row driver fetch), one vocabulary-sized
    * join building each word's aligned (piece, score) arrays, the
    * codegen'd Viterbi kernel, then a piece-count agg. EVERYTHING is
    * statistics-sized — the corpus is touched once for word
    * frequencies; at 100 TB each round is an agg over a vocab-sized
    * frame, the bpeTrainCore argument verbatim. Returns the final
    * (p, cnt) model counts and the final (w, wf, seg) segmentation,
    * both persisted for the caller to release.
    */
  private def unigramTrainCore(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    unigramTrainRuns.incrementAndGet()
    import graft.functions.UnigramViterbi.unigramViterbi
    import graft.functions.ExactMath.log2e20
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val wfu = Tables(s, dir, "documents")
      .select(explode(toks).as("w"))
      // the EMPTY word (doubled/leading/trailing spaces) must not
      // enter the trainer: Spark's sequence(1, 0) DESCENDS ([1, 0]),
      // so '' would seed phantom '' pieces that the oracle's
      // range(1, 1) (empty) never generates — r16 parity bug, found by
      // the full-battery sweep over the double-space fixture. The
      // encode side already treats '' as a 0-piece fallback in both
      // engines (the r15 fix), so dropping it here changes nothing on
      // space-normalized corpora.
      .filter(length(col("w")) >= 1 && length(col("w")) <= UnigramMaxWord)
      .groupBy("w").agg(count(lit(1)).as("wf"))
      .persist(mem)
    val nWords = wfu.count()
    // seed occurrences WITH multiplicity: one row per (word, start, len)
    val occ = wfu.select(col("w"), col("wf"), explode(expr(
      "flatten(transform(sequence(1, length(w)), a -> " +
        "transform(sequence(1, least(4, length(w) - a + 1)), " +
        "k -> substring(w, a, k))))")).as("p"))
    val seedWP = occ.select("w", "p").distinct().persist(mem)
    seedWP.count()
    var cnt = occ.groupBy("p").agg((sum("wf") + lit(1L)).as("cnt"))
      .persist(mem)
    cnt.count()
    var seg: DataFrame = null
    if (nWords == 0) // EMPTY vocabulary (r17 empty sweep): no pieces,
      // no rounds — the model is empty in both engines
      seg = wfu.select(col("w"), col("wf"),
        lit(null).cast("array<string>").as("seg")).limit(0)
    var r = if (nWords == 0) UnigramRounds + 1 else 1
    while (r <= UnigramRounds) {
      val totC = cnt.agg(sum("cnt")).collect()(0).getLong(0)
      require(totC < (1L << 33),
        s"unigram train: total count $totC exceeds the log2e20 domain")
      val lTot = graft.multimodal.Multimodal.log2e20(totC)
      val sc = cnt.select(col("p"), (log2e20(col("cnt")) - lit(lTot)).as("s"))
      val wp = seedWP.join(sc, "p")
        .groupBy("w").agg(collect_list(struct(col("p"), col("s"))).as("ps"))
      val segR = wfu.join(wp, "w")
        .select(col("w"), col("wf"),
          unigramViterbi(col("w"), expr("transform(ps, x -> x.p)"),
            expr("transform(ps, x -> x.s)")).as("seg"))
        .persist(mem)
      segR.count()
      val uses = segR.select(col("wf"), explode(col("seg")).as("p"))
        .groupBy("p").agg(sum("wf").as("u"))
      val next = seedWP.select("p").distinct()
        .join(uses, Seq("p"), "left")
        .select(col("p"), (coalesce(col("u"), lit(0L)) + lit(1L)).as("cnt"))
        .persist(mem)
      next.count()
      cnt.unpersist()
      if (seg != null) seg.unpersist()
      cnt = next
      seg = segR
      r += 1
    }
    wfu.unpersist()
    seedWP.unpersist()
    (cnt, seg)
  }

  /** The trained unigram model, MATERIALIZED once per corpus through
    * the [[CorpusTable]] seam (the bpeModel pattern, including the
    * one-table/one-atomic-install argument): kind='p' rows carry the
    * final Laplace counts (p, cnt), kind='s' rows the final per-word
    * Viterbi segmentation (w, wf, seg). Shared by q_unigram_train and
    * q_unigram_encode — encode is a vocabulary-sized join against the
    * at-rest segmentation, never a re-train.
    */
  private def unigramModel(s: SparkSession, dir: String): DataFrame = {
    var release: Seq[DataFrame] = Seq.empty
    val model = CorpusTable.materialized(s, dir, "unigrammodel2") { // r16: empty-word fix busts stale caches
      val (cnt, seg) = unigramTrainCore(s, dir)
      release = Seq(cnt, seg)
      val p = cnt.select(lit("p").as("kind"), col("p"), col("cnt"),
        lit(null).cast("string").as("w"), lit(null).cast("long").as("wf"),
        lit(null).cast("array<string>").as("seg"))
      val v = seg.select(lit("s").as("kind"),
        lit(null).cast("string").as("p"), lit(null).cast("long").as("cnt"),
        col("w"), col("wf"), col("seg"))
      p.unionByName(v)
    }
    release.foreach(_.unpersist())
    model
  }

  /** One EM round of the unigram oracle as generated CTEs (the
    * BpeTrainSql rule — round logic exists once): the Log2Sql score
    * recurrence over round r−1's counts, the per-(word, end-position)
    * candidate-score pivot `ucs` (s1..s4 = scores of the ≤4 pieces
    * ending at j), the forward Viterbi DP as a recursive CTE carrying
    * the LAST FOUR dp values as columns (one self-reference, no
    * aggregation — dp[j+1] = GREATEST of the four carried options,
    * sentinel-coalesced; the CASE ladder checks k ascending so
    * equal-value ties keep the smallest k, the
    * [[graft.functions.UnigramViterbi]] rule verbatim), the backtrace
    * walk `uwb` (j → j − bk[j], emitting the piece that ends at j),
    * and the re-estimated Laplace counts. MATERIALIZED hints are
    * load-bearing: without them DuckDB re-inlines the round chain per
    * consumer (measured 56 s → 0.13 s at sf0.001).
    */
  private def unigramRoundCte(r: Int): String = {
    val prev = r - 1
    val neg = "-4611686018427387904"
    def t(k: Int) = s"COALESCE(d.v${k - 1} + c.s$k, $neg)"
    val g = s"GREATEST(${t(1)}, ${t(2)}, ${t(3)}, ${t(4)})"
    s"""domu$r AS (SELECT DISTINCT v FROM (
       |  SELECT cnt AS v FROM ucnt$prev
       |  UNION ALL SELECT CAST(SUM(cnt) AS BIGINT) FROM ucnt$prev)),
       |${Log2Sql.cte(s"u$r")},
       |utot$r AS (SELECT CAST(SUM(cnt) AS BIGINT) AS c FROM ucnt$prev),
       |usc$r AS MATERIALIZED (
       |  SELECT cc.p, lc.l - lt.l AS s
       |  FROM ucnt$prev cc
       |  JOIN lgu$r lc ON lc.v = cc.cnt
       |  CROSS JOIN utot$r ut
       |  JOIN lgu$r lt ON lt.v = ut.c),
       |ucs$r AS MATERIALIZED (
       |  SELECT o.w, o.a + o.k - 1 AS j,
       |    MAX(CASE WHEN o.k = 1 THEN sc.s END) AS s1,
       |    MAX(CASE WHEN o.k = 2 THEN sc.s END) AS s2,
       |    MAX(CASE WHEN o.k = 3 THEN sc.s END) AS s3,
       |    MAX(CASE WHEN o.k = 4 THEN sc.s END) AS s4
       |  FROM (SELECT DISTINCT w, a, k, p FROM uocc) o
       |  JOIN usc$r sc ON sc.p = o.p
       |  GROUP BY 1, 2),
       |udp$r(w, j, v0, v1, v2, v3, bk) AS (
       |  SELECT w, 0, CAST(0 AS BIGINT), CAST(NULL AS BIGINT),
       |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), 0 FROM uwf
       |  UNION ALL
       |  SELECT d.w, d.j + 1, $g, d.v0, d.v1, d.v2,
       |    CASE WHEN ${t(1)} = $g THEN 1
       |         WHEN ${t(2)} = $g THEN 2
       |         WHEN ${t(3)} = $g THEN 3
       |         ELSE 4 END
       |  FROM udp$r d JOIN ucs$r c ON c.w = d.w AND c.j = d.j + 1
       |  WHERE d.j < length(d.w)),
       |uwb$r(w, j, p) AS (
       |  SELECT w, CAST(length(w) AS INTEGER), CAST(NULL AS VARCHAR) FROM uwf
       |  UNION ALL
       |  SELECT b.w, b.j - d.bk, substring(b.w, b.j - d.bk + 1, d.bk)
       |  FROM uwb$r b JOIN udp$r d ON d.w = b.w AND d.j = b.j
       |  WHERE b.j > 0),
       |uuse$r AS MATERIALIZED (
       |  SELECT b.p, CAST(SUM(f.wf) AS BIGINT) AS u
       |  FROM uwb$r b JOIN uwf f ON f.w = b.w
       |  WHERE b.p IS NOT NULL GROUP BY 1),
       |ucnt$r AS MATERIALIZED (
       |  SELECT sd.p, COALESCE(u.u, 0) + 1 AS cnt
       |  FROM (SELECT DISTINCT p FROM uocc) sd
       |  LEFT JOIN uuse$r u ON u.p = sd.p)""".stripMargin
  }

  /** Shared WITH-prefix of the two unigram oracles: word frequencies,
    * positional substring occurrences, Laplace seed counts, and
    * [[UnigramRounds]] generated round chains. Callers open with
    * `WITH RECURSIVE` and read `ucnt$UnigramRounds` (final counts) /
    * `uwb$UnigramRounds` (final segmentation walk).
    */
  private lazy val UnigramRoundsSql: String =
    s"""uwf AS MATERIALIZED (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS wf FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) <= $UnigramMaxWord GROUP BY w),
       |ua AS (SELECT w, wf, unnest(range(1, length(w) + 1)) AS a FROM uwf),
       |uocc AS MATERIALIZED (
       |  SELECT w, wf, a, k,
       |    substring(w, CAST(a AS INTEGER), CAST(k AS INTEGER)) AS p
       |  FROM (SELECT w, wf, a,
       |          unnest(range(1, least(4, length(w) - a + 1) + 1)) AS k
       |        FROM ua)),
       |ucnt0 AS MATERIALIZED (
       |  SELECT p, CAST(SUM(wf) + 1 AS BIGINT) AS cnt FROM uocc GROUP BY 1),
       |${(1 to UnigramRounds).map(unigramRoundCte).mkString(",\n")}""".stripMargin

  // ---------------------------------------------------------------
  // WordPiece tokenizer trainer + longest-match encode — the THIRD
  // tokenizer family next to BPE and unigram-LM (Schuster & Nakajima
  // 2012; the BERT tokenizer). Kernels in
  // [[graft.functions.WordPieceOps]].
  // ---------------------------------------------------------------

  /** Merge rounds for q_wordpiece_train — matches [[BpeTrainRounds]]
    * so the two merge-based families are directly comparable. */
  private[graft] val WordPieceRounds = 5

  /** US (chr(31)): the pair/segmentation separator — below every
    * printable byte and absent from token text, so single-string
    * order IS tuple order (the BPE rule restated). */
  private val US = ""

  /** Training-run counter, test-observable (the bpeTrainRuns pattern):
    * q_wordpiece_train AND q_wordpiece_encode on one corpus train at
    * most once through the [[wordPieceModel]] materialization. */
  private[graft] val wordPieceTrainRuns =
    new java.util.concurrent.atomic.AtomicInteger

  /** Shared WordPiece trainer core: [[WordPieceRounds]] driver-
    * orchestrated rounds over the corpus-compressed word-frequency
    * table (the bpeTrainCore argument verbatim — the corpus is read
    * once; every round is vocabulary-sized). Initial segmentation is
    * BERT's: first character bare, every later character
    * `##`-prefixed. Each round merges the adjacent pair maximizing
    * LIKELIHOOD GAIN count(t1 t2) / (count(t1) · count(t2)) — the
    * WordPiece objective, vs BPE's raw pair count — applied greedily
    * left-to-right by the codegen'd
    * [[graft.functions.WordPieceOps.WordPieceMergeApply]] (merged
    * token = t1 ++ t2 minus t2's `##`).
    *
    * The score is the IEEE-754 double n / (na · nb): the operands are
    * exact (counts ≪ 2^53) and double multiply/divide are CORRECTLY
    * ROUNDED per IEEE-754, so the sort key is bit-identical in the
    * JVM and DuckDB; ties (identical doubles) break on the
    * US-joined pair string — deterministic in both engines. The
    * argmax fetch is ONE model row per round (bounded driver data,
    * the q_pagerank3 pattern).
    *
    * Returns the merge table rows (round, t1, t2, merged, n, na, nb),
    * the FINAL segmentation (w, wf, toks), and the initial alphabet
    * (distinct s0 pieces) — the last two persisted for the caller
    * ([[wordPieceModel]] releases them once the model is written).
    */
  private def wordPieceTrainCore(s: SparkSession, dir: String)
      : (Seq[(Long, String, String, String, Long, Long, Long)], DataFrame, DataFrame) = {
    wordPieceTrainRuns.incrementAndGet()
    import graft.functions.WordPieceOps.wpMerge
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val words = Tables(s, dir, "documents")
      .select(explode(toks).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("wf"))
    var seg = words.select(col("w"), col("wf"),
      expr("transform(sequence(1, length(w)), i -> " +
        "IF(i = 1, substring(w, i, 1), concat('##', substring(w, i, 1))))")
        .as("toks"))
      .persist(mem)
    seg.count()
    val alphabet = seg.select(explode(col("toks")).as("p")).distinct()
      .persist(mem)
    alphabet.count()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long, Long, Long)]
    var r = 1
    var exhausted = false
    while (r <= WordPieceRounds && !exhausted) {
      val tc = seg.select(col("wf"), explode(col("toks")).as("tok"))
        .groupBy("tok").agg(sum("wf").as("n"))
      // sequence(1, n) DESCENDS for n < 1 (the q_bpe_pairs trap):
      // fully-merged single-token words must not reach the explode
      val top = seg.filter(size(col("toks")) >= 2)
        .select(col("wf"), explode(expr(
          "transform(sequence(1, size(toks) - 1)," +
            " i -> concat(toks[i-1], chr(31), toks[i]))")).as("pair"))
        .groupBy("pair").agg(sum("wf").as("n"))
        .withColumn("t1", substring_index(col("pair"), US, 1))
        .withColumn("t2", substring_index(col("pair"), US, -1))
        .join(tc.select(col("tok").as("t1"), col("n").as("na")), "t1")
        .join(tc.select(col("tok").as("t2"), col("n").as("nb")), "t2")
        .withColumn("score", col("n").cast("double") /
          (col("na").cast("double") * col("nb").cast("double")))
        .orderBy(desc("score"), asc("pair")).limit(1)
        .select("t1", "t2", "n", "na", "nb")
        .collect() // 1 model row per round — bounded driver data
      if (top.isEmpty) exhausted = true // vocabulary fully merged
      else {
        val (t1, t2) = (top(0).getString(0), top(0).getString(1))
        val merged = t1 + t2.stripPrefix("##")
        merges += ((r.toLong, t1, t2, merged,
          top(0).getLong(2), top(0).getLong(3), top(0).getLong(4)))
        val next = seg.select(col("w"), col("wf"),
          wpMerge(col("toks"), t1, t2, merged).as("toks"))
          .persist(mem)
        next.count() // materialize BEFORE releasing the parent
        seg.unpersist()
        seg = next
        r += 1
      }
    }
    (merges.toSeq, seg, alphabet)
  }

  /** The trained WordPiece model, MATERIALIZED once per corpus through
    * the [[CorpusTable]] seam (the bpeModel pattern, including the
    * one-table/one-atomic-install argument): kind='m' rows the merge
    * table (round, t1, t2, merged, n, na, nb), kind='s' rows the
    * final training segmentation (w, wf, toks), kind='v' rows the
    * SHIPPED VOCABULARY — initial alphabet ∪ merged tokens, the piece
    * set BERT's runtime loads (a seed piece fully merged away
    * everywhere still ships; longest-match may use it).
    */
  private def wordPieceModel(s: SparkSession, dir: String): DataFrame = {
    var release: Seq[DataFrame] = Seq.empty
    val model = CorpusTable.materialized(s, dir, "wpmodel") {
      val (merges, seg, alphabet) = wordPieceTrainCore(s, dir)
      release = Seq(seg, alphabet)
      import s.implicits._
      def nulls(cs: (String, String)*) =
        cs.map { case (n, t) => lit(null).cast(t).as(n) }
      val mDf = merges.toDF("round", "t1", "t2", "merged", "n", "na", "nb")
      val m = mDf.select(
        (lit("m").as("kind") +: Seq("round", "t1", "t2", "merged", "n",
          "na", "nb").map(col)) ++
          nulls("w" -> "string", "wf" -> "long", "toks" -> "array<string>",
            "p" -> "string"): _*)
      val v = seg.select(
        (lit("s").as("kind") +: nulls("round" -> "long", "t1" -> "string",
          "t2" -> "string", "merged" -> "string", "n" -> "long",
          "na" -> "long", "nb" -> "long")) ++
          Seq(col("w"), col("wf"), col("toks")) :+
          lit(null).cast("string").as("p"): _*)
      val vocab = alphabet.select(col("p"))
        .union(mDf.select(col("merged").as("p")))
        .distinct()
        .select(
          (lit("v").as("kind") +: nulls("round" -> "long", "t1" -> "string",
            "t2" -> "string", "merged" -> "string", "n" -> "long",
            "na" -> "long", "nb" -> "long", "w" -> "string", "wf" -> "long",
            "toks" -> "array<string>")) :+ col("p"): _*)
      m.unionByName(v).unionByName(vocab)
    }
    release.foreach(_.unpersist())
    model
  }

  /** Per-word longest-match encode frame (w, n_pieces, unk, diverged)
    * against the at-rest [[wordPieceModel]] vocabulary — greedy
    * longest-match-first, BERT's actual runtime algorithm
    * ([[graft.functions.WordPieceOps.WordPieceMatch]]), which is NOT a
    * replay of the merges: `diverged` marks trained words whose
    * longest-match segmentation differs from their training
    * segmentation (a real, observable property of WordPiece).
    * Everything is WORD-VOCABULARY-sized: distinct words → candidate
    * substring pieces (lengths capped by the vocabulary's max piece
    * length — one model-sized driver fetch) → vocab equi-join → the
    * per-word kernel; the corpus token stream then joins this frame
    * once (broadcastable at 100 TB).
    */
  private def wordPieceEncoded(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.WordPieceOps.{wpMatch, Unk}
    val model = wordPieceModel(s, dir)
    val vocab = model.filter(col("kind") === "v").select(col("p"))
    val maxL = {
      val r = vocab.agg(max(length(col("p")))).collect()(0)
      require(!r.isNullAt(0),
        "wordPieceEncoded: empty WordPiece vocabulary — the corpus has no " +
          "words, so there is nothing to encode against")
      r.getInt(0)
    }
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // persisted: feeds both the candidate explode and the final join
    // (the PERF_NOTES multi-consumer rule); Bench's per-query
    // clearCache() reclaims it (file convention, r5)
    val words = Tables(s, dir, "documents")
      .select(explode(toks).as("w")).distinct()
      .persist(mem)
    words.count()
    // candidate pieces: k ≤ maxL over-generates for ##-continuations
    // (k chars + the 2-char prefix) — harmless, they cannot be in a
    // vocabulary whose pieces are ≤ maxL chars, so the join drops them
    val cand = words.select(col("w"), explode(expr(
      s"flatten(transform(sequence(1, length(w)), a -> " +
        s"transform(sequence(1, least($maxL, length(w) - a + 1)), " +
        s"k -> IF(a = 1, substring(w, a, k), concat('##', substring(w, a, k))))))"))
      .as("p")).distinct()
    val matched = cand.join(vocab, "p").groupBy("w")
      .agg(collect_list(col("p")).as("ps")) // set-probed: order-free
    val trained = model.filter(col("kind") === "s")
      .select(col("w"), concat_ws(US, col("toks")).as("tseg"))
    words.join(matched, Seq("w"), "left")
      .select(col("w"), wpMatch(col("w"),
        coalesce(col("ps"), expr("CAST(array() AS array<string>)"))).as("seg"))
      .join(trained, Seq("w"), "left")
      .select(col("w"),
        size(col("seg")).cast("long").as("n_pieces"),
        // try_element_at: an empty word's segmentation is the EMPTY
        // array (r15 parity fix) and ANSI element_at would throw on it
        when(expr("try_element_at(seg, 1)") === Unk, 1L).otherwise(0L)
          .as("unk"),
        when(col("tseg").isNotNull &&
          concat_ws(US, col("seg")) =!= col("tseg"), 1L).otherwise(0L)
          .as("diverged"))
  }

  /** One WordPiece training round of the oracle as generated CTEs (the
    * BpeTrainSql rule — round logic exists once): token counts over
    * round r−1's segmentation, adjacent-pair counts, the
    * likelihood-gain argmax (the same IEEE double both engines
    * compute bit-identically — see [[wordPieceTrainCore]]), and the
    * greedy list_reduce apply writing the `##`-stripped merged token
    * (BpeApply's produced-token-never-re-merges invariant holds:
    * merged ≠ t1 and contains no chr(31)).
    */
  private def wpPairCte(r: Int) =
    s"""wtc$r AS MATERIALIZED (SELECT tok, CAST(SUM(wf) AS BIGINT) AS n FROM (
       |  SELECT wf, unnest(toks) AS tok FROM wps${r - 1}) GROUP BY 1),
       |wpp$r AS MATERIALIZED (SELECT pair, CAST(SUM(wf) AS BIGINT) AS n FROM (
       |  SELECT wf, unnest(list_transform(range(1, len(toks)),
       |    i -> toks[i] || chr(31) || toks[i+1])) AS pair
       |  FROM wps${r - 1} WHERE len(toks) >= 2) GROUP BY 1),
       |wpm$r AS MATERIALIZED (SELECT t1, t2,
       |  t1 || CASE WHEN starts_with(t2, '##') THEN t2[3:] ELSE t2 END AS merged,
       |  n, na, nb FROM (
       |  SELECT string_split(p.pair, chr(31))[1] AS t1,
       |    string_split(p.pair, chr(31))[2] AS t2, p.n AS n,
       |    a.n AS na, b.n AS nb, p.pair AS pair,
       |    CAST(p.n AS DOUBLE) / (CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE)) AS s
       |  FROM wpp$r p
       |  JOIN wtc$r a ON a.tok = string_split(p.pair, chr(31))[1]
       |  JOIN wtc$r b ON b.tok = string_split(p.pair, chr(31))[2]
       |  ORDER BY s DESC, pair LIMIT 1))""".stripMargin

  private def wpApplyCte(r: Int) =
    s"""wps$r AS MATERIALIZED (SELECT w, wf, string_split(list_reduce(toks,
       |  (acc, x) -> CASE WHEN x = wpm$r.t2 AND (acc = wpm$r.t1
       |      OR ends_with(acc, chr(31) || wpm$r.t1))
       |    THEN left(acc, length(acc) - length(wpm$r.t1)) || wpm$r.merged
       |    ELSE acc || chr(31) || x END), chr(31)) AS toks
       |  FROM wps${r - 1}, wpm$r
       |  UNION ALL
       |  SELECT w, wf, toks FROM wps${r - 1}
       |  WHERE NOT EXISTS (SELECT 1 FROM wpm$r))""".stripMargin

  /** Shared WITH-prefix of the two WordPiece oracles: word
    * frequencies, the BERT `##` character segmentation, and
    * [[WordPieceRounds]] generated round CTEs. */
  private def wpRoundsSql(finalApply: Boolean): String = {
    val rounds = (1 to WordPieceRounds).map { r =>
      if (r < WordPieceRounds || finalApply) wpPairCte(r) + ",\n" + wpApplyCte(r)
      else wpPairCte(r)
    }.mkString(",\n")
    s"""wpwf AS MATERIALIZED (
       |  SELECT w, COUNT(*) AS wf FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) >= 2 GROUP BY w),
       |wps0 AS MATERIALIZED (SELECT w, wf, list_transform(range(1, length(w) + 1),
       |  i -> CASE WHEN i = 1 THEN substring(w, CAST(i AS INTEGER), 1)
       |       ELSE '##' || substring(w, CAST(i AS INTEGER), 1) END) AS toks
       |  FROM wpwf),
       |$rounds""".stripMargin
  }

  /** Oracle twin of [[wordPieceEncoded]] — the per-word longest-match
    * encode as CTEs (candidate explode capped by the vocab's max piece
    * length, per-position longest match as GROUP BY MAX, the greedy
    * walk as a recursive CTE terminating early at unmatched positions
    * → [UNK]). Requires `wps0..wps{R}` + `wpm1..wpm{R}` (from
    * [[wpRoundsSql]] with finalApply) in scope and a `WITH RECURSIVE`
    * opener; ends in `wpper(w, n_pieces, unk, diverged)`. Shared by
    * the q_wordpiece_encode and q_tokenizer_compare oracles.
    */
  private lazy val WpEncodePerWordSql: String =
    s"""wpvocab AS MATERIALIZED (
       |  SELECT DISTINCT p FROM (
       |    SELECT unnest(toks) AS p FROM wps0
       |${(1 to WordPieceRounds).map(r =>
         s"    UNION ALL SELECT merged FROM wpm$r").mkString("\n")})),
       |wpml0 AS (SELECT MAX(length(p)) AS ml FROM wpvocab),
       |wpew AS MATERIALIZED (SELECT DISTINCT w FROM (
       |  SELECT unnest(string_split(text, ' ')) AS w FROM documents)),
       |wpnext AS MATERIALIZED (
       |  SELECT c.w, c.a, MAX(c.k) AS k FROM (
       |    SELECT w, a, unnest(range(1, least(ml, length(w) - a + 1) + 1)) AS k
       |    FROM (SELECT w, unnest(range(1, length(w) + 1)) AS a FROM wpew)
       |    CROSS JOIN wpml0) c
       |  JOIN wpvocab v ON v.p = CASE WHEN c.a = 1
       |    THEN substring(c.w, CAST(c.a AS INTEGER), CAST(c.k AS INTEGER))
       |    ELSE '##' || substring(c.w, CAST(c.a AS INTEGER), CAST(c.k AS INTEGER)) END
       |  GROUP BY 1, 2),
       |wpwalk(w, pos, np, seg) AS (
       |  SELECT w, CAST(1 AS BIGINT), 0, CAST('' AS VARCHAR) FROM wpew
       |  UNION ALL
       |  SELECT wk.w, wk.pos + m.k, wk.np + 1,
       |    wk.seg || CASE WHEN wk.np = 0 THEN '' ELSE chr(31) END ||
       |    CASE WHEN wk.pos = 1
       |      THEN substring(wk.w, CAST(wk.pos AS INTEGER), CAST(m.k AS INTEGER))
       |      ELSE '##' || substring(wk.w, CAST(wk.pos AS INTEGER), CAST(m.k AS INTEGER)) END
       |  FROM wpwalk wk JOIN wpnext m ON m.w = wk.w AND m.a = wk.pos
       |  WHERE wk.pos <= length(wk.w)),
       |wpfin AS (
       |  SELECT w, pos, np, seg,
       |    ROW_NUMBER() OVER (PARTITION BY w ORDER BY pos DESC) AS rn
       |  FROM wpwalk),
       |wpseg AS MATERIALIZED (
       |  SELECT w,
       |    CASE WHEN pos = length(w) + 1 THEN np ELSE 1 END AS n_pieces,
       |    CASE WHEN pos = length(w) + 1 THEN 0 ELSE 1 END AS unk,
       |    CASE WHEN pos = length(w) + 1 THEN seg ELSE '[UNK]' END AS seg
       |  FROM wpfin WHERE rn = 1),
       |wptr AS (SELECT w, array_to_string(toks, chr(31)) AS tseg
       |         FROM wps$WordPieceRounds),
       |wpper AS MATERIALIZED (
       |  SELECT g.w, g.n_pieces, g.unk,
       |    CASE WHEN t.tseg IS NOT NULL AND t.tseg <> g.seg
       |         THEN 1 ELSE 0 END AS diverged
       |  FROM wpseg g LEFT JOIN wptr t ON t.w = g.w)""".stripMargin

  private val WpTrainSql: String = {
    val selects = (1 to WordPieceRounds).map { r =>
      s"SELECT CAST($r AS BIGINT) AS round, t1, t2, merged, n, na, nb FROM wpm$r"
    }.mkString("\nUNION ALL ")
    s"""WITH ${wpRoundsSql(finalApply = false)}
       |$selects
       |ORDER BY round""".stripMargin
  }

  /** Per-document bigram-predictability frame (doc_id, n_bigrams,
    * lm_score_e4) — the KenLM-style LM signal shared by q_ngram_lm
    * (declared per-doc scores) and q_perplexity_bucket (the CCNet
    * head/middle/tail cut), extracted r13 so the model definition
    * exists once. See the q_ngram_lm scaladoc for the exact-integer
    * scheme and the 100 TB plan argument (count tables = the model,
    * persistable at rest). MATERIALIZED per corpus (the CorpusTable
    * seam, same as bpeModel): the two consumers pay the bigram explode
    * + count aggs once and read the doc-level scores at rest after.
    */
  private[queries] def lmScoreFrame(s: SparkSession, dir: String): DataFrame = {
    var bgRelease: DataFrame = null
    val out = CorpusTable.materialized(s, dir, "lmscore") {
      import graft.functions.Shingles.shinglesAll
      val docs = Tables(s, dir, "documents")
      val bg = docs
        .select(col("doc_id"), explode(shinglesAll(toks, 2)).as("bg"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      bg.count() // eager: bgc + the occurrence join both reuse it
      bgRelease = bg
      val bgc = bg.groupBy("bg").agg(count(lit(1)).as("cbg"))
      val pfx = bgc.groupBy(substring_index(col("bg"), " ", 1).as("p"))
        .agg(sum("cbg").as("cp"))
      val occ = bg.join(bgc, "bg")
        .join(pfx, substring_index(col("bg"), " ", 1) === col("p"))
        .select(col("doc_id"),
          floorDivL(col("cbg") * 10000L, col("cp")).as("p_e4"))
      val agg = occ.groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum("p_e4").as("sum_e4"))
      docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          when(coalesce(col("n_bigrams"), lit(0L)) === 0L, lit(0L))
            .otherwise(floorDivL(col("sum_e4"), col("n_bigrams")))
            .as("lm_score_e4"))
    }
    // only needed while the table is being written; if it already
    // existed the build thunk never ran
    if (bgRelease != null) bgRelease.unpersist()
    out
  }

  /** DSIR hashed-unigram bucket counts (doc_id, source, lang, b, c),
    * b = md5(token) mod 512 — the sufficient statistics of the DSIR
    * generative model, MATERIALIZED per corpus (CorpusTable seam) and
    * shared by q_dsir (select) and q_dsir_eval (grade): one corpus
    * pass, two consumers, no drift. ~min(512, doc-tokens) rows per doc
    * (always ≤ the token stream it compresses).
    */
  private def dsirBuckets(s: SparkSession, dir: String): DataFrame =
    // prefix carries the fixture hash: a fixture edit must bust the
    // cached table (the q_langid_train staleness lesson)
    CorpusTable.materialized(s, dir,
      s"dsirbuckets_v2_${TextFixture.dsirKey}") {
      import s.implicits._
      // r17 fixture liveness: the corpus's text is lang-independent
      // (target ≈ raw ⇒ logw ≈ 0), so the planted target-vocabulary
      // 'en' slice and raw-only slice ride along in BOTH engines —
      // the driver's rows then show a live importance-weight spread
      // and a live KL gap (see [[TextFixture.dsirDocs]])
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
        .unionByName(TextFixture.dsirDocs
          .toDF("doc_id", "text", "lang", "source"))
        .select(col("doc_id"), col("source"), col("lang"), explode(toks).as("t"))
        .select(col("doc_id"), col("source"), col("lang"),
          pmod(graft.functions.Md5Ops.md5Prefix(col("t"), 15),
            lit(512L)).as("b"))
        .groupBy("doc_id", "source", "lang", "b").agg(count(lit(1)).as("c"))
    }

  /** Per-document DSIR weights + keep decision (doc_id, source, lang,
    * n_tokens, logw_e20, keep) over the at-rest [[dsirBuckets]] — the
    * shared select logic of q_dsir and q_dsir_eval (see the q_dsir
    * scaladoc for the arithmetic and the 100 TB plan argument).
    */
  private def dsirWeighted(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactMath.log2e20
    val B = 512L
    val cb = dsirBuckets(s, dir)
    val rb = cb.groupBy("b").agg((sum("c") + lit(1L)).as("rv"))
    val tb = cb.filter(col("lang") === "en")
      .groupBy("b").agg((sum("c") + lit(1L)).as("tv"))
    // Bucket model: ΔL(b) = L(t_b) − L(r_b); absent target bucket →
    // t_b = 1 → L = 0 (log2e20(null) is null, coalesced to 0).
    val model = rb.join(tb, Seq("b"), "left")
      .select(col("b"),
        (coalesce(log2e20(col("tv")), lit(0L)) - log2e20(col("rv"))).as("dl"))
    val norm = cb.agg(
      (sum("c") + lit(B)).as("rtot"),
      (sum(when(col("lang") === "en", col("c")).otherwise(lit(0L))) + lit(B))
        .as("ttot"))
      .select((log2e20(col("rtot")) - log2e20(col("ttot"))).as("norm"))
    val perDoc = cb.join(broadcast(model), "b")
      .groupBy("doc_id", "source", "lang")
      .agg(sum("c").as("n_tokens"), sum(col("c") * col("dl")).as("ssum"))
      .crossJoin(broadcast(norm))
      .select(col("doc_id"), col("source"), col("lang"), col("n_tokens"),
        (col("ssum") + col("n_tokens") * col("norm")).as("logw_e20"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("logw_e20").desc, col("doc_id"))
    val cw = org.apache.spark.sql.expressions.Window.partitionBy("source")
    perDoc
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("ns", count(lit(1)).over(cw))
      .select(col("doc_id"), col("source"), col("lang"), col("n_tokens"),
        col("logw_e20"),
        when(col("rk") * 4L <= col("ns"), lit(1L)).otherwise(lit(0L)).as("keep"))
  }

  /** DuckDB twin of [[lmScoreFrame]] — ONE copy of the LM oracle CTE
    * chain (the CcSql rule), shared by the q_ngram_lm and
    * q_perplexity_bucket oracles. Ends in
    * `lm(doc_id, n_bigrams, lm_score_e4)`.
    */
  private[queries] val NgramLmSql: String =
    """t AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(ts)),
      |    i -> array_to_string(ts[i:i+1], ' '))) AS bg
      |  FROM t),
      |bgc AS (SELECT bg, COUNT(*) AS cbg FROM bg GROUP BY 1),
      |pfx AS (
      |  SELECT string_split(bg, ' ')[1] AS p, CAST(SUM(cbg) AS BIGINT) AS cp
      |  FROM bgc GROUP BY 1),
      |occ AS (
      |  SELECT b.doc_id, (bgc.cbg * 10000) // pfx.cp AS p_e4
      |  FROM bg b
      |  JOIN bgc ON b.bg = bgc.bg
      |  JOIN pfx ON string_split(b.bg, ' ')[1] = pfx.p),
      |agg AS (
      |  SELECT doc_id, COUNT(*) AS n_bigrams,
      |    CAST(SUM(p_e4) AS BIGINT) AS sum_e4
      |  FROM occ GROUP BY 1),
      |lm AS (
      |  SELECT t.doc_id AS doc_id, COALESCE(n_bigrams, 0) AS n_bigrams,
      |    CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN CAST(0 AS BIGINT)
      |         ELSE sum_e4 // n_bigrams END AS lm_score_e4
      |  FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id)""".stripMargin

  /** DuckDB twin of [[repetitionMetrics]] — ONE copy of the metric CTE
    * chain, shared by both oracles exactly as the Scala side shares the
    * DataFrame builder (an edit to the metric definition hits both
    * queries on both engines or neither). Opens a WITH ending in `m`
    * (doc_id, n_tokens, uniq_token_e4, top_bigram_e4, dup_bigram_e4);
    * callers append further CTEs with a leading comma or SELECT from m.
    */
  private val RepMetricsSql =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |tok AS (
      |  SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(ts)) AS BIGINT) AS n_distinct
      |  FROM t),
      |bg0 AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(ts)),
      |    i -> array_to_string(ts[i:i+1], ' '))) AS bg
      |  FROM t),
      |bgc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg0 GROUP BY 1, 2),
      |bga AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
      |    CAST(MAX(c) AS BIGINT) AS max_bg,
      |    CAST(COUNT(*) AS BIGINT) AS n_distinct_bg
      |  FROM bgc GROUP BY 1),
      |m AS (
      |  SELECT tok.doc_id, n_tokens,
      |    (n_distinct * 10000) // n_tokens AS uniq_token_e4,
      |    (COALESCE(max_bg, 0) * 10000) //
      |      GREATEST(COALESCE(n_bigrams, 0), 1) AS top_bigram_e4,
      |    ((COALESCE(n_bigrams, 0) - COALESCE(n_distinct_bg, 0)) * 10000) //
      |      GREATEST(COALESCE(n_bigrams, 0), 1) AS dup_bigram_e4
      |  FROM tok LEFT JOIN bga ON tok.doc_id = bga.doc_id)""".stripMargin

  /** Per-doc repetition metric frame shared by q_text_repetition and
    * q_quality_gate: (doc_id, n_tokens, uniq_token_e4, top_bigram_e4,
    * dup_bigram_e4), all exact integer e4. Token stats are a map-only
    * codegen'd projection; bigram multiplicities go explode →
    * groupBy(doc_id, bigram) → groupBy(doc_id) (map-side partial agg,
    * per-doc-bounded work — the 100 TB shape).
    */
  private def repetitionMetrics(docs: DataFrame): DataFrame = {
    import graft.functions.Shingles.shinglesAll
    val tokStats = docs.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"))
    val bg = docs
      .select(col("doc_id"), explode(shinglesAll(toks, 2)).as("bg"))
      .groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum("c").as("n_bigrams"), max("c").as("max_bg"),
        count(lit(1)).as("n_distinct_bg"))
    tokStats.join(bg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        floorDivL(col("n_distinct") * 10000L, col("n_tokens"))
          .as("uniq_token_e4"),
        floorDivL(coalesce(col("max_bg"), lit(0L)) * 10000L,
          greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L)))
          .as("top_bigram_e4"),
        floorDivL(
          (coalesce(col("n_bigrams"), lit(0L)) - coalesce(col("n_distinct_bg"), lit(0L))) * 10000L,
          greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L)))
          .as("dup_bigram_e4"))
  }

  /** ONE corpus pass building the BM25 index parts (the exact integer
    * posting weights — see the q_bm25 scaladoc for the arithmetic —
    * and the benchmark query-term bags). Invoked once per corpus by
    * [[bm25Index]]'s materialization; `pairs` and `weights` persist
    * for the multi-consumer index aggregations within the build.
    */
  private def bm25Build(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    import s.implicits._
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val docs = Tables(s, dir, "documents")
    val pairs = docs.select(col("doc_id"), explode(toks).as("term"))
      .persist(mem) // cache populated by the qterms collect below, so
                    // the weights job's tf/dl/tt stages all hit it
    val tf = pairs.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // the fixed query-doc term bag, collected ONCE (ledger-sized: ≤ 5
    // docs' distinct terms) and rebuilt as a local frame — every later
    // reference/broadcast is then free
    val qtRows = tf.filter(col("doc_id") < 5)
      .select(col("doc_id").as("q_id"), col("term"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val qterms = qtRows.toDF("q_id", "term")
    // Only the QUERY terms' postings can ever contribute to a score
    // (scores sum over q ∩ d), so the weight build restricts to them
    // BEFORE the join chain — at Heaps-vocabulary scale this shrinks
    // the posting index from all-terms to the query vocabulary
    // (gen-sf10: 53 s → see PERF_NOTES r16). df is computed on the
    // restricted tf and stays EXACT: the restriction drops terms, not
    // postings of kept terms; dl/T/D stay corpus-computed.
    val tfq = tf.join(
      broadcast(qtRows.map(_._2).distinct.toDF("term")), "term")
    val df_ = tfq.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = pairs.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val nd = docs.agg(count(lit(1)).as("n_docs"))
    val tt = pairs.agg(count(lit(1)).as("t_tokens"))
    val weights = tfq.join(df_, "term").join(dl, "doc_id")
      .crossJoin(broadcast(nd)).crossJoin(broadcast(tt))
      .select(col("doc_id"), col("term"),
        floorDivL(
          floorDivL(col("tf") * 22L * col("t_tokens") * 10000L,
            col("tf") * 10L * col("t_tokens") + lit(3L) * col("t_tokens")
              + lit(9L) * col("dl") * col("n_docs")) * col("n_docs"),
          col("df")).as("w"))
      .persist(mem) // cache built by the first scan (consumers are
                    // sequential actions; no broadcast subquery reads
                    // weights, so no build race)
    (weights, qterms)
  }

  /** Version tag of the BM25 index LAYOUT + build code, folded into the
    * CorpusTable prefix (the q_langid_train staleness lesson: the
    * corpus-identity key alone cannot see build-code changes across
    * runs sharing a tmpdir).
    */
  private[graft] val Bm25IndexVersion = "v1"

  /** The AT-REST BM25 index (r17, r16 verdict #2): q_bm25 previously
    * rebuilt tf→df→weights per run, paying a ~53 s index build at
    * gen-sf10 for a seconds-scale query — but at 100 TB the index IS
    * the at-rest artifact. Materialized once per corpus via the
    * [[CorpusTable]] seam (the graph/dedup/LM pattern), keyed on corpus
    * identity + [[Bm25IndexVersion]], holding kind-discriminated rows:
    *
    *  - `w` — (term, doc_id, w): the query terms' postings with exact
    *    integer BM25 impact weights (only query-term postings can ever
    *    contribute to a score; see [[bm25Build]]);
    *  - `q` — (term, doc_id = q_id): the fixed benchmark query-doc
    *    term bags;
    *  - `h` — (term, doc_id, w): the top-10 impact-ordered HEAD BLOCK
    *    of each posting list; per-term UB(t) = its max `w` — the
    *    MaxScore/WAND block metadata, stored WITH the index exactly as
    *    a production deployment stores it, so warm runs skip the
    *    head-selection window too.
    *
    * Warm runs drop to the scoring cost: read postings + ledger-sized
    * metadata, enumerate, score (TextSpec pins index staleness — a
    * regenerated corpus must never serve the old index).
    */
  private[graft] def bm25Index(s: SparkSession, dir: String): DataFrame =
    CorpusTable.materialized(s, dir, s"bm25idx_$Bm25IndexVersion") {
      import org.apache.spark.sql.expressions.Window
      val (weights, qterms) = bm25Build(s, dir)
      val hw = Window.partitionBy("term").orderBy(col("w").desc, col("doc_id"))
      val heads = weights.withColumn("hrk", row_number().over(hw))
        .filter(col("hrk") <= 10).select("term", "doc_id", "w")
      weights.select(lit("w").as("kind"), col("term"), col("doc_id"), col("w"))
        .unionByName(qterms.select(lit("q").as("kind"), col("term"),
          col("q_id").as("doc_id"), lit(0L).as("w")))
        .unionByName(heads.select(lit("h").as("kind"), col("term"),
          col("doc_id"), col("w")))
    }

  /** The three BM25 index parts read off the at-rest [[bm25Index]]
    * table: (weights, qterms, heads).
    */
  private[graft] def bm25Parts(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val idx = bm25Index(s, dir)
    (idx.filter(col("kind") === "w").select("doc_id", "term", "w"),
      idx.filter(col("kind") === "q")
        .select(col("doc_id").as("q_id"), col("term")),
      idx.filter(col("kind") === "h").select("term", "doc_id", "w"))
  }

  /** Exact BM25 scores of an explicit (q_id, doc_id) candidate set:
    * the posting scan is keyed by the CANDIDATE docs (join on doc_id,
    * then restrict to the query's terms), so work is
    * O(candidate postings), never O(Σ df) — the whole point of the
    * pruned enumeration feeding it.
    */
  private def bm25Scores(cands: DataFrame, weights: DataFrame,
      qterms: DataFrame): DataFrame =
    // the query-term frames are BROADCAST (|fixed query set| × vocab
    // bounded — the q_sim_topk query-set argument), so only the
    // query's terms' postings survive the first join. The candidate
    // set is NOT hinted: pruned or not it is a corpus SUBSET (the
    // PlanAudit bound-or-drop rule — a forced broadcast would OOM the
    // driver at index scale); AQE still renders it broadcast at
    // fixture scale where it measures small
    weights.join(broadcast(qterms.select("term").distinct()), "term")
      .join(cands, "doc_id")
      .join(broadcast(qterms), Seq("q_id", "term"))
      .groupBy("q_id", "doc_id").agg(sum("w").as("score"))

  /** MaxScore / impact-ordered candidate enumeration (r16, r15 verdict
    * #5), EXACT by construction:
    *  1. index artifacts (term-keyed, stored AT REST — as of r17 they
    *     really are: the [[bm25Index]] CorpusTable's `h` rows — the
    *     block metadata LOOKUP, not an index rebuild): per-term max
    *     impact UB(t) and the top-10 impact-ordered HEAD BLOCK of each
    *     posting list;
    *  2. floor: per head doc, lb(d) = max single-term impact among the
    *     query's terms — a TRUE lower bound of d's full score (weights
    *     are non-negative), read off the head join with no scoring
    *     pass; θ_q = the 10th-best lb over 10 DISTINCT docs, so the
    *     true 10th-best full score ≥ θ_q. Queries with < 10 head docs
    *     keep θ undefined → no pruning;
    *  3. term split: sort the query's terms by ascending UB; a term is
    *     NON-ESSENTIAL iff its inclusive prefix sum stays < θ_q. A doc
    *     containing only non-essential terms scores ≤ that prefix sum
    *     < θ_q ≤ true-10th, so it loses to ≥ 10 docs REGARDLESS of
    *     tie-breaks and is never enumerated;
    *  4. candidates = head-block docs ∪ docs holding ≥ 1 ESSENTIAL
    *     query term.
    * On zipfian text the non-essential set is exactly the common-term
    * head of the vocabulary (low idf ⇒ low UB), so enumeration drops
    * from Σ_{t∈q} df(t) to the rare tail — the standard 100 TB lexical
    * retrieval plan shape (block-max with one block per list; finer
    * blocks — or an exact-scored floor — tighten θ the same way at
    * more per-query cost).
    */
  private[graft] def bm25Candidates(s: SparkSession, weights: DataFrame,
      qterms: DataFrame, headBlocks: DataFrame): DataFrame = {
    import s.implicits._
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // The block metadata is LEDGER-SIZED and collected: ≤ |distinct
    // query terms| × 10 head rows (never corpus-scaled — the query-set
    // vocabulary bounds it). As of r17 it is READ off the at-rest
    // [[bm25Index]] `h` rows instead of re-derived per run. This
    // mirrors production WAND exactly: per-term max impacts and
    // head-block metadata live AT THE QUERY NODE; only posting scans
    // stay distributed.
    val qt = qterms.collect().map(r => (r.getLong(0), r.getString(1)))
    val terms = qt.map(_._2).distinct.toSeq
    val qw = weights.join(broadcast(terms.toDF("term")), "term")
    val heads = headBlocks.select("term", "doc_id", "w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val headsByTerm = heads.groupBy(_._1)
    val ub: Map[String, Long] = // UB(t) = the head block's top impact
      headsByTerm.map { case (t, hs) => t -> hs.map(_._3).max }
    val cand1 = Seq.newBuilder[(Long, Long)]
    val essential = Seq.newBuilder[(Long, String)]
    for ((q, qts) <- qt.groupBy(_._1)) {
      val ts = qts.map(_._2).toSeq
      val hrows = ts.flatMap(t =>
        headsByTerm.getOrElse(t, Array.empty[(String, Long, Long)]).toSeq)
        .filter(_._2 != q)
      cand1 ++= hrows.map(h => (q, h._2)).distinct
      // floor: per head doc, lb = max single-term impact — a TRUE
      // lower bound of its full score (weights ≥ 0); θ = the 10th
      // largest lb over distinct docs, so true-10th-score ≥ θ
      val lbs = hrows.groupBy(_._2).map(_._2.map(_._3).max).toSeq
        .sorted(Ordering[Long].reverse)
      val theta = if (lbs.size >= 10) Some(lbs(9)) else None
      var pre = 0L
      for ((t, u) <- ts.map(t => (t, ub.getOrElse(t, 0L)))
          .sortBy(x => (x._2, x._1))) {
        pre += u
        if (theta.isEmpty || pre >= theta.get) essential += ((q, t))
      }
    }
    val cand2 = qw.join(broadcast(essential.result().toDF("q_id", "term")),
        "term")
      .filter(col("doc_id") =!= col("q_id"))
      .select("q_id", "doc_id")
    // lazy: the enumeration rides into the consumer's scoring job; the
    // persist mark serves multi-consumer callers (the spec)
    cand1.result().distinct.toDF("q_id", "doc_id")
      .unionByName(cand2).distinct().persist(mem)
  }

  /** Exact scoring + top-10 of a candidate set — shared by the pruned
    * declared row and the spec's unpruned reference, so equality
    * compares ONLY the enumeration.
    */
  private[graft] def bm25TopK(cands: DataFrame, weights: DataFrame,
      qterms: DataFrame): DataFrame = {
    val scored = bm25Scores(cands, weights, qterms)
    val pre = SimilarityQueries.heapTopKLong(
      scored.select(col("q_id"), col("doc_id"), col("score")), 10)
      .select(col("q_id"), col("id").as("doc_id"), col("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("score").desc, col("doc_id"))
    pre.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("q_id"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("score"))
      .orderBy("q_id", "rk")
  }

  /** The UNPRUNED candidate enumeration (every posting of every query
    * term — the pre-r16 plan), kept as the spec's reference oracle for
    * [[bm25Candidates]] equality and the reduction measurement.
    */
  private[graft] def bm25CandidatesFull(weights: DataFrame,
      qterms: DataFrame): DataFrame =
    qterms.join(weights, "term")
      .filter(col("doc_id") =!= col("q_id"))
      .select("q_id", "doc_id").distinct()

  val entries: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q_text_tokens ★ — global token frequency, top 50. One explode +
    // one hash agg; n DESC with token tiebreak for a total order.
    QueryDef(
      "q_text_tokens",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .select(explode(toks).as("token"))
          .groupBy("token")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(50),
      Some("""SELECT token, COUNT(*) AS n FROM (
             |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
             |) GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin)),

    // ------------------------------------------------------------------
    // q_text_quality ★ — per-document quality metrics: token count,
    // char count, mean token length (e2), stopword ratio (e4), and a
    // derived keep/drop quality flag — the filter stage of a pretraining
    // data pipeline. All exact integer arithmetic.
    QueryDef(
      "q_text_quality",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text"), toks.as("t"))
          .select(
            col("doc_id"), col("lang"),
            size(col("t")).cast("long").as("n_tokens"),
            length(col("text")).cast("long").as("n_chars"),
            length(regexp_replace(col("text"), " ", "")).cast("long").as("n_nonspace"),
            size(expr("filter(t, x -> x = 'the' or x = 'a')")).cast("long").as("n_stop"))
          .select(
            col("doc_id"), col("lang"), col("n_tokens"), col("n_chars"),
            // mean token length in e2 (half-up): (200*chars + n) div (2n)
            graft.functions.ExactMath.divTrunc(
              col("n_nonspace") * 200L + col("n_tokens"),
              col("n_tokens") * 2L).as("avg_tok_len_e2"),
            ratioE4(col("n_stop"), col("n_tokens")).as("stop_ratio_e4"))
          .withColumn("quality",
            when(col("n_tokens") >= 20 && col("n_tokens") <= 80 &&
              col("stop_ratio_e4") < lit(2000L), lit("keep"))
              .otherwise(lit("drop")))
          .orderBy("doc_id"),
      Some("""WITH m AS (
             |  SELECT doc_id, lang,
             |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
             |    CAST(length(text) AS BIGINT) AS n_chars,
             |    CAST(length(replace(text,' ','')) AS BIGINT) AS n_nonspace,
             |    CAST(len(list_filter(string_split(text,' '), x -> x='the' OR x='a')) AS BIGINT) AS n_stop
             |  FROM documents)
             |SELECT doc_id, lang, n_tokens, n_chars,
             |  (n_nonspace*200 + n_tokens) // (n_tokens*2) AS avg_tok_len_e2,
             |  (n_stop*20000 + n_tokens) // (n_tokens*2) AS stop_ratio_e4,
             |  CASE WHEN n_tokens BETWEEN 20 AND 80
             |        AND (n_stop*20000 + n_tokens) // (n_tokens*2) < 2000
             |       THEN 'keep' ELSE 'drop' END AS quality
             |FROM m ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_quality_adaptive ★ (new r11) — PER-SOURCE adaptive quality
    // filter: keep each source's best 75% by stopword-ratio rank
    // instead of q_text_quality's one global fixed rule. Fixed
    // thresholds over-prune clean domains and under-prune noisy ones
    // (the reason production pipelines set per-domain cutoffs); a
    // rank quota adapts the effective threshold to each source's own
    // score distribution, and selection by (score, doc_id) rank keeps
    // the kept-set exact and engine-reproducible — no percentile
    // interpolation, no float threshold. Output per source: doc/kept
    // counts, kept-token total (what the loader actually samples), and
    // the realized cutoff score (max kept stop_ratio_e4 — the
    // per-domain threshold the quota implies).
    //
    // Scale shape: one map pass for the per-doc score, one rank window
    // PARTITIONED BY SOURCE (shuffle keyed on source — domains are
    // high-cardinality in web corpora; a pathologically hot source
    // would salt into a two-level rank the same way q_join_salted
    // does), one source-sized agg. Exact integers end to end.
    QueryDef(
      "q_quality_adaptive",
      (s: SparkSession, dir: String) => {
        import org.apache.spark.sql.expressions.Window
        val d = Tables(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(toks).cast("long").as("n_tokens"),
            size(expr("filter(split(text,' '), x -> x = 'the' or x = 'a')"))
              .cast("long").as("n_stop"))
          .select(col("doc_id"), col("source"), col("n_tokens"),
            ratioE4(col("n_stop"), col("n_tokens")).as("score"))
        val bySrc = Window.partitionBy("source")
        val rk = row_number().over(bySrc.orderBy(col("score"), col("doc_id")))
        d.select(col("source"), col("n_tokens"), col("score"),
            rk.as("rk"), count(lit(1)).over(bySrc).as("n"))
          .withColumn("keep", col("rk") * 4L <= col("n") * 3L)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("keep"), col("n_tokens")).otherwise(0L)).as("kept_tokens"),
            max(when(col("keep"), col("score"))).as("cut_score_e4"))
          .orderBy("source")
      },
      Some("""WITH m AS (
             |  SELECT doc_id, source,
             |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
             |    CAST(len(list_filter(string_split(text,' '), x -> x='the' OR x='a')) AS BIGINT) AS n_stop
             |  FROM documents),
             |sc AS (
             |  SELECT source, n_tokens,
             |    (n_stop*20000 + n_tokens) // (n_tokens*2) AS score,
             |    ROW_NUMBER() OVER (PARTITION BY source
             |      ORDER BY (n_stop*20000 + n_tokens) // (n_tokens*2)
             |        NULLS FIRST, doc_id) AS rk,
             |    COUNT(*) OVER (PARTITION BY source) AS n
             |  FROM m)
             |SELECT source, COUNT(*) AS n_docs,
             |  CAST(SUM(CASE WHEN rk*4 <= n*3 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  CAST(SUM(CASE WHEN rk*4 <= n*3 THEN n_tokens ELSE 0 END) AS BIGINT)
             |    AS kept_tokens,
             |  CAST(MAX(CASE WHEN rk*4 <= n*3 THEN score END) AS BIGINT)
             |    AS cut_score_e4
             |FROM sc GROUP BY source ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q_text_lang_id ★ — n-gram/marker-word language scoring → a
    // (actual, predicted) confusion matrix. Marker counting is
    // `regexp_count` with \b-bounded alternations — fully codegen'd,
    // one pass over the raw text (the first cut filtered an exploded
    // token array through interpreted higher-order lambdas; on this
    // all-alphanumeric corpus the \b-regex count is exactly the token
    // match count). At 100 TB this is a single narrow map + one small
    // aggregation.
    QueryDef(
      "q_text_lang_id",
      (s: SparkSession, dir: String) => {
        val scored = Tables(s, dir, "documents")
          .select(
            col("doc_id"), col("lang"),
            regexp_count(col("text"), lit("\\b(the|a|of|and)\\b")).as("s_en"),
            regexp_count(col("text"), lit("\\b(der|die|das|und)\\b")).as("s_de"),
            regexp_count(col("text"), lit("\\b(el|la|los|y)\\b")).as("s_es"))
        scored
          .withColumn("predicted",
            when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") &&
              col("s_en") > 0, lit("en"))
              .when(col("s_de") >= col("s_es") && col("s_de") > 0, lit("de"))
              .when(col("s_es") > 0, lit("es"))
              .otherwise(lit("und")))
          .groupBy("lang", "predicted")
          .agg(count(lit(1)).as("n"))
          .orderBy("lang", "predicted")
      },
      Some("""WITH sc AS (
             |  SELECT lang,
             |    len(regexp_extract_all(text, '\b(the|a|of|and)\b')) AS s_en,
             |    len(regexp_extract_all(text, '\b(der|die|das|und)\b')) AS s_de,
             |    len(regexp_extract_all(text, '\b(el|la|los|y)\b')) AS s_es
             |  FROM documents)
             |SELECT lang,
             |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en > 0 THEN 'en'
             |       WHEN s_de >= s_es AND s_de > 0 THEN 'de'
             |       WHEN s_es > 0 THEN 'es'
             |       ELSE 'und' END AS predicted,
             |  COUNT(*) AS n
             |FROM sc GROUP BY 1, 2
             |ORDER BY lang NULLS FIRST, predicted""".stripMargin)),
             // NULLS FIRST: Spark sorts a NULL label first, DuckDB last
             // (r17 nasty sweep — a NULL-lang doc flipped the row order)

    // ------------------------------------------------------------------
    // q_text_fingerprint ★ — per-document fingerprints: full-text md5
    // plus a 5-token-shingle min-hash (the "document fingerprint" a
    // dedup pipeline keys on). md5 is engine-identical, so the oracle
    // reproduces the exact fingerprint; min over hex strings is plain
    // lexicographic min. Shingle construction is the codegen'd
    // Shingles expression (the transform(sequence…)+slice+concat_ws
    // chain is interpreted — dev/PERF_NOTES.md); min over its DISTINCT
    // shingles equals min over all, and array_min of the empty array
    // (< 5 tokens) is NULL, matching the oracle's CASE.
    QueryDef(
      "q_text_fingerprint",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            md5(col("text")).as("doc_md5"),
            array_min(transform(
              graft.functions.Shingles.shingles(toks, 5), x => md5(x)))
              .as("shingle_min_md5"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, md5(text) AS doc_md5,
             |  CASE WHEN len(string_split(text,' ')) >= 5 THEN
             |    list_min(list_transform(range(1, len(string_split(text,' ')) - 3),
             |      i -> md5(array_to_string(string_split(text,' ')[i:i+4], ' '))))
             |  ELSE NULL END AS shingle_min_md5
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_text_token_count ★ — per-document token counting two ways:
    // whitespace tokens and a BPE-ish regex segmentation (letter runs /
    // digit runs / single non-alphanumerics — the GPT-2 pre-tokenizer
    // shape), the budget signal an LLM-data pipeline bins documents by.
    // One narrow codegen'd projection, no shuffle.
    QueryDef(
      "q_text_token_count",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .select(col("doc_id"),
            size(toks).cast("long").as("ws_tokens"),
            size(regexp_extract_all(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))
              .cast("long").as("bpe_tokens"),
            length(col("text")).cast("long").as("n_chars"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
             |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS bpe_tokens,
             |  CAST(len(text) AS BIGINT) AS n_chars
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_text_repetition ★ — Gopher-style repetition quality signals
    // (Rae et al. 2021 §A1.1: documents dominated by repeated n-grams
    // are low-quality training data): per doc, the distinct-token
    // ratio, the fraction of 2-gram occurrences claimed by the single
    // most frequent 2-gram, and the duplicate-2-gram fraction. All
    // exact integer e4 (floor), so the oracle is engine-exact.
    // Plan shape: token stats are one narrow map-only projection
    // (size/array_distinct, codegen'd); bigram multiplicities go
    // explode → groupBy(doc_id, bigram) → groupBy(doc_id) — both
    // shuffles key on doc+gram / doc with map-side partial agg, the
    // 100 TB shape (per-doc work bounded by doc length, no cross-doc
    // blowup). `shinglesAll` is the codegen'd non-distinct shingle
    // pass (the HOF form is interpreted — see Shingles scaladoc).
    QueryDef(
      "q_text_repetition",
      (s: SparkSession, dir: String) =>
        repetitionMetrics(Tables(s, dir, "documents"))
          .select(col("doc_id"), col("n_tokens"), col("uniq_token_e4"),
            col("top_bigram_e4"), col("dup_bigram_e4"))
          .orderBy("doc_id"),
      Some(RepMetricsSql + """
             |SELECT doc_id, n_tokens, uniq_token_e4, top_bigram_e4,
             |  dup_bigram_e4
             |FROM m ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_inverted_index ★ — term → (document frequency, first-20 posting
    // list): the index-build leg of a corpus search/retrieval pipeline.
    // Two aggregations over the distinct (term, doc) pair stream:
    //  - df is a plain hash count (map-side combine, no buffers);
    //  - postings are CAPPED BEFORE the global agg: a per-shuffle-
    //    partition window keeps only the 20 smallest doc_ids per term,
    //    so no aggregation buffer ever holds more than 20 × partitions
    //    ids per term — heavy-hitter terms (stopwords posting half the
    //    corpus) cannot blow up an agg buffer at 100 TB. Real systems
    //    shard full posting lists; the declared query's product is the
    //    capped head, which the two-phase plan computes exactly.
    QueryDef(
      "q_inverted_index",
      (s: SparkSession, dir: String) => {
        val pairs = Tables(s, dir, "documents")
          .select(explode(toks).as("term"), col("doc_id"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pairs.count() // eager: both branches below reuse it (concurrent
        // stages race an unfilled cache and recompute — PERF_NOTES)
        val df_ = pairs.groupBy("term").agg(count(lit(1)).as("df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(spark_partition_id(), col("term")).orderBy("doc_id")
        val postings = pairs
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= 20)
          .groupBy("term")
          // Scalarized: the driver's hash-compare cannot canonicalize
          // array columns (r4 RED row), so export the capped posting
          // list as a comma-joined string. Sort NUMERICALLY first, then
          // stringify — lexicographic sort of "10" < "9" would diverge.
          .agg(array_join(
            transform(slice(sort_array(collect_list("doc_id")), 1, 20),
              _.cast("string")), ",").as("postings"))
        df_.join(postings, "term").orderBy("term")
      },
      Some("""WITH p AS (
             |  SELECT DISTINCT term, doc_id FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |    FROM documents))
             |SELECT term, COUNT(*) AS df,
             |  array_to_string((list_sort(list(doc_id)))[1:20], ',') AS postings
             |FROM p GROUP BY term ORDER BY term""".stripMargin)),

    // ------------------------------------------------------------------
    // q_tfidf ★ — top-3 terms per document by tf-idf-style salience,
    // with EXACT integer scoring so the oracle is engine-exact: the log
    // in classic idf is replaced by the raw rarity ratio N/df (rank-
    // equivalent per-document since log is monotone and doc length is
    // constant within a document):
    //   score_e4 = floor(tf * 1e4 * N / (df * n_tokens_doc)).
    // Ties broken by term ASC — fully deterministic in both engines.
    // Headroom: tf*1e4*N stays in signed 64-bit while tf·N < 9.2e14 —
    // ample for any single shard; a 1e11-doc global corpus must rank
    // with score_e4 = divTrunc(tf*1e4, df) (rank-equivalent per doc
    // since N and doc_len are constant within a document).
    // Plan: tf = one (doc, term) hash agg; df = one (term) hash agg on
    // the distinct pair stream; N rides in as a 1-row broadcast (no
    // driver action); top-3 is a per-doc window over ≤ vocab rows.
    QueryDef(
      "q_tfidf",
      (s: SparkSession, dir: String) => {
        val docs = Tables(s, dir, "documents")
        // r17 optimization (guide §2.3 aggregate-before-shuffle): df and
        // doc_len both DERIVE from tf — df(term) = #tf rows per term
        // (tf is one row per distinct (doc, term)), doc_len(doc) = Σ tf
        // per doc — so the shared frame is the (≈4×-smaller) tf table,
        // not the raw token pair stream the pre-r17 plan persisted and
        // re-shuffled three times (incl. a 500k-row distinct).
        val tf = docs.select(col("doc_id"), explode(toks).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        tf.count() // eager for the three-branch reuse
        val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val len = tf.groupBy("doc_id").agg(sum("tf").as("doc_len"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id")
          .orderBy(col("score_e4").desc, col("term"))
        tf.join(df_, "term").join(len, "doc_id").crossJoin(broadcast(n))
          .select(col("doc_id"), col("term"),
            floorDivL(col("tf") * 10000L * col("n_docs"),
              col("df") * col("doc_len")).as("score_e4"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk").cast("long").as("rk"),
            col("term"), col("score_e4"))
          .orderBy("doc_id", "rk")
      },
      Some("""WITH p AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM p GROUP BY 1, 2),
             |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM p GROUP BY 1),
             |len AS (SELECT doc_id, COUNT(*) AS doc_len FROM p GROUP BY 1),
             |n AS (SELECT COUNT(*) AS n_docs FROM documents),
             |scored AS (
             |  SELECT tf.doc_id, tf.term,
             |    (tf.tf * 10000 * n.n_docs) // (df.df * len.doc_len) AS score_e4
             |  FROM tf JOIN df USING (term) JOIN len ON tf.doc_id = len.doc_id
             |  CROSS JOIN n),
             |ranked AS (
             |  SELECT doc_id, term, score_e4,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY score_e4 DESC, term) AS rk
             |  FROM scored)
             |SELECT doc_id, CAST(rk AS BIGINT) AS rk, term,
             |  CAST(score_e4 AS BIGINT) AS score_e4
             |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)),

    // ------------------------------------------------------------------
    // q_text_cooccur ★ — token co-occurrence document frequencies, the
    // build step of co-occurrence/PMI embeddings and phrase mining: for
    // the 50 strongest pairs, in how many documents do both tokens
    // appear. Plan: distinct (doc, term) stream → within-doc self-join
    // (shuffle keys on doc_id; per-doc work is quadratic in the doc's
    // DISTINCT vocabulary — bounded by doc length, never by corpus
    // size) → one (t1, t2) hash agg → top-50 under a total (n DESC,
    // t1, t2) order, so the limit is deterministic. The pair stream is
    // persisted + materialized once (self-joins recompute their common
    // subplan otherwise — PERF_NOTES).
    QueryDef(
      "q_text_cooccur",
      (s: SparkSession, dir: String) => {
        val pairs = Tables(s, dir, "documents")
          .select(col("doc_id"), explode(toks).as("t"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pairs.count()
        pairs.as("a")
          .join(pairs.as("b"),
            col("a.doc_id") === col("b.doc_id") && col("a.t") < col("b.t"))
          .select(col("a.t").as("t1"), col("b.t").as("t2"))
          .groupBy("t1", "t2").agg(count(lit(1)).as("n_docs"))
          .orderBy(col("n_docs").desc, col("t1"), col("t2"))
          .limit(50)
      },
      Some("""WITH p AS (
             |  SELECT DISTINCT doc_id, t FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS t
             |    FROM documents))
             |SELECT a.t AS t1, b.t AS t2, COUNT(*) AS n_docs
             |FROM p a JOIN p b ON a.doc_id = b.doc_id AND a.t < b.t
             |GROUP BY 1, 2 ORDER BY n_docs DESC, t1, t2 LIMIT 50""".stripMargin)),

    // ------------------------------------------------------------------
    // q_quality_gate ★ — the filter cascade of a training-data
    // pipeline: each document gets its FIRST failing rule (rule order
    // fixed: too_short → too_repetitive → low_diversity → kept) and
    // the gate reports per-verdict document/token counts and id range.
    // Thresholds sit at measured corpus quantiles (n_tokens < 20 drops
    // ~6%, dup_bigram_e4 > 600 ~10%, uniq_token_e4 < 3300 ~10%) so
    // every branch is exercised at every SF. All inputs are the exact
    // integer metrics of `repetitionMetrics` — the verdict, and hence
    // the oracle, is engine-exact. Plan: the metric frame + one
    // 4-group hash agg, nothing driver-side.
    QueryDef(
      "q_quality_gate",
      (s: SparkSession, dir: String) =>
        repetitionMetrics(Tables(s, dir, "documents"))
          .select(col("doc_id"), col("n_tokens"),
            when(col("n_tokens") < 20, "too_short")
              .when(col("dup_bigram_e4") > 600, "too_repetitive")
              .when(col("uniq_token_e4") < 3300, "low_diversity")
              .otherwise("kept").as("verdict"))
          .groupBy("verdict")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
            min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
          .orderBy("verdict"),
      Some(RepMetricsSql + """,
             |v AS (
             |  SELECT doc_id, n_tokens,
             |    CASE WHEN n_tokens < 20 THEN 'too_short'
             |         WHEN dup_bigram_e4 > 600 THEN 'too_repetitive'
             |         WHEN uniq_token_e4 < 3300 THEN 'low_diversity'
             |         ELSE 'kept' END AS verdict
             |  FROM m)
             |SELECT verdict, COUNT(*) AS n_docs,
             |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
             |FROM v GROUP BY verdict ORDER BY verdict""".stripMargin)),

    // ------------------------------------------------------------------
    // q_ngram_lm ★ (new r5) — corpus-bigram predictability score per
    // document: the KenLM-style language-model quality signal of a
    // pretraining pipeline, made ENGINE-EXACT by replacing log-prob
    // sums with the mean conditional-probability in e4 units:
    //   p_e4(occurrence) = floor(1e4 · c(bigram) / c(prefix)),
    //   lm_score_e4(doc) = floor(Σ p_e4 / n_bigrams)
    // (c(prefix) = Σ over bigrams starting with the token, so the
    // model normalizes exactly and every ratio ≤ 1e4; boilerplate-ish
    // repeated text scores high, token-salad scores low — same
    // ordering a real LM filter produces, in integers both engines
    // agree on bit-for-bit).
    // Plan: one explode into bigram occurrences (persisted — two
    // consumers), TWO corpus-wide hash aggs (bigram counts; prefix
    // counts folded FROM the bigram counts, so the second agg runs on
    // the vocabulary, not the corpus), then an equi-join of occurrences
    // to the (vocabulary-sized, broadcastable) count tables and one
    // per-doc agg. Map-side combine everywhere; no driver state; at
    // 100 TB the count tables are the LM "model" and would persist at
    // rest exactly like the IVF centroids.
    QueryDef(
      "q_ngram_lm",
      (s: SparkSession, dir: String) =>
        lmScoreFrame(s, dir).orderBy("doc_id"),
      Some(s"""WITH $NgramLmSql
             |SELECT doc_id, n_bigrams, lm_score_e4 FROM lm
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_lm_holdout ★ (new r13) — HELD-OUT language-model evaluation:
    // the bigram LM is trained on the TRAIN split only (q_split_assign's
    // exact md5-mod-100 partition — train <90, val <95, test else) and
    // scored on all three splits, producing the generalization table an
    // LM-filter pipeline must read before trusting its scores: pooled
    // conditional-probability score per split (train > held-out = the
    // generalization gap) and the unseen-bigram (OOV) rate — 0 on train
    // BY CONSTRUCTION (every train bigram is in the counts; the spec
    // pins it), > 0 on val/test. Unseen bigrams score p = 0, the
    // harshest-penalty convention, exact in integers (no smoothing
    // constant to disagree on). Same count-table "model" plan as
    // q_ngram_lm, restricted to the train slice; scoring is the same
    // vocabulary-sized left join. Output: 3 rows.
    QueryDef(
      "q_lm_holdout",
      (s: SparkSession, dir: String) => {
        import graft.functions.Shingles.shinglesAll
        val split100 = pmod(graft.functions.Md5Ops.md5Prefix(col("doc_id").cast("string"), 15), lit(100L))
        val sdocs = Tables(s, dir, "documents")
          .select(col("doc_id"),
            when(split100 < 90L, "train").when(split100 < 95L, "val")
              .otherwise("test").as("split"),
            col("text"))
        val bg = sdocs
          .select(col("split"), explode(shinglesAll(toks, 2)).as("bg"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        bg.count() // eager: the model build + the scoring join reuse it
        val cbg = bg.filter(col("split") === "train")
          .groupBy("bg").agg(count(lit(1)).as("cbg"))
        val pfx = cbg.groupBy(substring_index(col("bg"), " ", 1).as("p"))
          .agg(sum("cbg").as("cp"))
        val occ = bg
          .join(cbg, Seq("bg"), "left")
          .join(pfx, substring_index(col("bg"), " ", 1) === col("p"), "left")
          .select(col("split"),
            when(col("cbg").isNull, 0L)
              .otherwise(floorDivL(col("cbg") * 10000L, col("cp"))).as("p_e4"),
            when(col("cbg").isNull, 1L).otherwise(0L).as("unseen"))
        val sc = occ.groupBy("split")
          .agg(count(lit(1)).as("n_bigrams"), sum("unseen").as("n_unseen"),
            sum("p_e4").as("sum_e4"))
        // LEFT join + guarded divisors: a split whose docs are all
        // single-token yields zero bigrams — it must still emit a row
        // (n_bigrams=0, oov/score 0) rather than silently vanish, and
        // the divisions must agree across engines (Spark null vs DuckDB
        // error on /0) — hence coalesce + greatest(n_bigrams, 1).
        sdocs.groupBy("split").agg(count(lit(1)).as("n_docs"))
          .join(sc, Seq("split"), "left")
          .select(col("split"), col("n_docs"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
            coalesce(col("sum_e4"), lit(0L)).as("sum_e4"))
          .select(col("split"), col("n_docs"), col("n_bigrams"),
            col("n_unseen"),
            floorDivL(col("n_unseen") * 10000L,
              greatest(col("n_bigrams"), lit(1L))).as("oov_e4"),
            floorDivL(col("sum_e4"),
              greatest(col("n_bigrams"), lit(1L))).as("score_e4"))
          .orderBy("split")
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90 THEN 'train'
             |         WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 95 THEN 'val'
             |         ELSE 'test' END AS split,
             |    string_split(text, ' ') AS ts
             |  FROM documents),
             |bg AS (
             |  SELECT split, unnest(list_transform(range(1, len(ts)),
             |    i -> array_to_string(ts[i:i+1], ' '))) AS bg
             |  FROM d),
             |cbg AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS cbg
             |        FROM bg WHERE split = 'train' GROUP BY 1),
             |pfx AS (
             |  SELECT string_split(bg, ' ')[1] AS p, CAST(SUM(cbg) AS BIGINT) AS cp
             |  FROM cbg GROUP BY 1),
             |occ AS (
             |  SELECT b.split,
             |    CASE WHEN cbg.cbg IS NULL THEN 0
             |         ELSE (cbg.cbg * 10000) // pfx.cp END AS p_e4,
             |    CASE WHEN cbg.cbg IS NULL THEN 1 ELSE 0 END AS unseen
             |  FROM bg b
             |  LEFT JOIN cbg ON b.bg = cbg.bg
             |  LEFT JOIN pfx ON string_split(b.bg, ' ')[1] = pfx.p),
             |sc AS (
             |  SELECT split, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             |    CAST(SUM(unseen) AS BIGINT) AS n_unseen,
             |    CAST(SUM(p_e4) AS BIGINT) AS sum_e4
             |  FROM occ GROUP BY 1),
             |nd AS (SELECT split, COUNT(*) AS n_docs FROM d GROUP BY 1)
             |SELECT nd.split, nd.n_docs,
             |  CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             |  CAST(COALESCE(sc.n_unseen, 0) AS BIGINT) AS n_unseen,
             |  (CAST(COALESCE(sc.n_unseen, 0) AS BIGINT) * 10000)
             |    // GREATEST(CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT), 1) AS oov_e4,
             |  CAST(COALESCE(sc.sum_e4, 0) AS BIGINT)
             |    // GREATEST(CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT), 1) AS score_e4
             |FROM nd LEFT JOIN sc ON nd.split = sc.split
             |ORDER BY nd.split""".stripMargin)),

    // ------------------------------------------------------------------
    // q_perplexity_bucket ★ (new r13) — the CCNet head/middle/tail
    // partition (Wenzek et al. 2020 §4.3: score each document with a
    // reference LM, split each language into three equal perplexity
    // buckets; head+middle feed training, tail is dropped or
    // down-weighted). The score is the SHARED [[lmScoreFrame]] bigram
    // predictability (high = low perplexity — rank-equivalent to
    // CCNet's ordering, exact integer instead of a libm log-prob sum);
    // buckets are ntile(3) per lang over the total order
    // (lm_score_e4 DESC, doc_id) — both engines define ntile by the
    // same larger-buckets-first rule, so the cut is engine-exact.
    // Declared output is the per-(lang, bucket) manifest a curation
    // run consumes: doc/token mass + the score range of each bucket.
    // Plan adds ONE narrow doc-level join + a lang-partitioned window
    // over docs (never global) + a ≤15-group agg to the LM plan;
    // at 100 TB the LM count tables persist at rest (IVF-centroid
    // pattern) and the bucket boundaries per lang come off the same
    // window.
    QueryDef(
      "q_perplexity_bucket",
      (s: SparkSession, dir: String) => {
        val meta = Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            size(toks).cast("long").as("n_tokens"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy(col("lm_score_e4").desc, col("doc_id"))
        lmScoreFrame(s, dir).join(meta, "doc_id")
          .withColumn("bucket", ntile(3).over(w).cast("long"))
          .groupBy("lang", "bucket")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"),
            min("lm_score_e4").as("min_score_e4"),
            max("lm_score_e4").as("max_score_e4"))
          .orderBy("lang", "bucket")
      },
      Some(s"""WITH $NgramLmSql,
             |meta AS (
             |  SELECT doc_id, lang,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |b AS (
             |  SELECT meta.lang, meta.n_tokens, lm.lm_score_e4,
             |    ntile(3) OVER (PARTITION BY meta.lang
             |      ORDER BY lm.lm_score_e4 DESC, lm.doc_id) AS bucket
             |  FROM lm JOIN meta USING (doc_id))
             |SELECT lang, CAST(bucket AS BIGINT) AS bucket,
             |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
             |  CAST(MIN(lm_score_e4) AS BIGINT) AS min_score_e4,
             |  CAST(MAX(lm_score_e4) AS BIGINT) AS max_score_e4
             |FROM b GROUP BY 1, 2
             |ORDER BY lang NULLS FIRST, bucket""".stripMargin)),
             // NULLS FIRST: the NULL-lang partition sorts first in
             // Spark, last in DuckDB (r17 nasty sweep)

    // ------------------------------------------------------------------
    // q_doremi_weights ★ (new r14) — DoReMi-style domain reweighting
    // (Xie et al. 2023: Group-DRO multiplicative weights on per-domain
    // EXCESS LOSS; the mixture optimizer behind modern pretraining
    // mixes, vs q_mix_weights' static token shares and q_dsir's
    // per-DOCUMENT importance selection — this row optimizes the
    // per-SOURCE sampling distribution). Exact-integer analog: the
    // per-domain loss proxy is the SHARED [[lmScoreFrame]] bigram
    // predictability (low predictability = high perplexity = high
    // loss), excess(s) = corpus mean − domain mean in e4 (positive for
    // worse-predicted domains, which DRO upweights); 3 multiplicative-
    // weights rounds w ← w·clamp(1e6 + 100·excess, ≥1) // 1e6
    // (truncating division ≡ DuckDB //), exported as the per-round
    // NORMALIZED share trajectory s0..s3_e6 — the schedule a mixture-
    // trained run consumes. No overflow: |excess| ≤ 1e4 → factor
    // ≤ 2e6 → w_3 ≤ 8e6, ·1e6 ≪ 2^63.
    // Plan: the LM signal reads AT REST (lmscore CorpusTable); this
    // row adds one thin doc→source join, a ~20-group agg, then pure
    // column arithmetic (w_r composes as expressions — no per-round
    // join) + one 1-row broadcast of the four share denominators.
    // Everything after the doc-level join is source-cardinality-sized.
    QueryDef(
      "q_doremi_weights",
      (s: SparkSession, dir: String) => {
        val meta = Tables(s, dir, "documents")
          .select(col("doc_id"), col("source"))
        val perSrc = lmScoreFrame(s, dir).join(meta, "doc_id")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("lm_score_e4").as("sum_e4"))
        val tot = perSrc.agg(sum("sum_e4").as("ts"), sum("n_docs").as("tn"))
        val w = perSrc.crossJoin(broadcast(tot))
          .withColumn("m_e4", floorDivL(col("sum_e4"), col("n_docs")))
          .withColumn("excess_e4",
            floorDivL(col("ts"), col("tn")) - col("m_e4"))
          .withColumn("w0", lit(1000000L))
          .withColumn("f",
            greatest(lit(1000000L) + col("excess_e4") * 100L, lit(1L)))
          .withColumn("w1", floorDivL(col("w0") * col("f"), lit(1000000L)))
          .withColumn("w2", floorDivL(col("w1") * col("f"), lit(1000000L)))
          .withColumn("w3", floorDivL(col("w2") * col("f"), lit(1000000L)))
        val sums = w.agg(sum("w0").as("t0"), sum("w1").as("t1"),
          sum("w2").as("t2"), sum("w3").as("t3"))
        w.crossJoin(broadcast(sums))
          .select(col("source"), col("n_docs"), col("m_e4"), col("excess_e4"),
            floorDivL(col("w0") * 1000000L, col("t0")).as("s0_e6"),
            floorDivL(col("w1") * 1000000L, col("t1")).as("s1_e6"),
            floorDivL(col("w2") * 1000000L, col("t2")).as("s2_e6"),
            floorDivL(col("w3") * 1000000L, col("t3")).as("s3_e6"))
          .orderBy("source")
      },
      Some(s"""WITH $NgramLmSql,
             |meta AS (SELECT doc_id, source FROM documents),
             |ps AS (
             |  SELECT meta.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |    CAST(SUM(lm.lm_score_e4) AS BIGINT) AS sum_e4
             |  FROM lm JOIN meta USING (doc_id) GROUP BY 1),
             |tot AS (SELECT CAST(SUM(sum_e4) AS BIGINT) AS ts,
             |  CAST(SUM(n_docs) AS BIGINT) AS tn FROM ps),
             |b AS (
             |  SELECT source, n_docs, sum_e4 // n_docs AS m_e4,
             |    (SELECT ts // tn FROM tot) - sum_e4 // n_docs AS excess_e4
             |  FROM ps),
             |w AS (
             |  SELECT source, n_docs, m_e4, excess_e4,
             |    CAST(1000000 AS BIGINT) AS w0,
             |    GREATEST(1000000 + excess_e4 * 100, 1) AS f
             |  FROM b),
             |wr AS (
             |  SELECT *, (w0 * f) // 1000000 AS w1,
             |    ((w0 * f) // 1000000 * f) // 1000000 AS w2,
             |    (((w0 * f) // 1000000 * f) // 1000000 * f) // 1000000 AS w3
             |  FROM w),
             |sums AS (SELECT CAST(SUM(w0) AS BIGINT) AS t0,
             |  CAST(SUM(w1) AS BIGINT) AS t1, CAST(SUM(w2) AS BIGINT) AS t2,
             |  CAST(SUM(w3) AS BIGINT) AS t3 FROM wr)
             |SELECT source, n_docs, m_e4, excess_e4,
             |  (w0 * 1000000) // (SELECT t0 FROM sums) AS s0_e6,
             |  (w1 * 1000000) // (SELECT t1 FROM sums) AS s1_e6,
             |  (w2 * 1000000) // (SELECT t2 FROM sums) AS s2_e6,
             |  (w3 * 1000000) // (SELECT t3 FROM sums) AS s3_e6
             |FROM wr ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q_bpe_pairs ★ (new r5) — the vocabulary-induction kernel of BPE
    // tokenizer training: the first merge iteration's candidate table,
    // i.e. every adjacent character pair's corpus frequency, weighted
    // by word frequency (each in-word occurrence counts, so "aaa"
    // contributes (a,a)×2), top-50 by count with a total (count DESC,
    // pair ASC) order so the cutoff is engine-deterministic. The
    // iterated merge loop is driver-orchestrated re-runs of this exact
    // plan on a re-segmented corpus — the per-iteration table is the
    // distributed part, and this is it. Plan: corpus → word-frequency
    // table FIRST (one hash agg; pair generation then runs on the
    // VOCABULARY — corpus-compressed, the trick that makes BPE training
    // feasible at 100 TB), explode length−1 in-word positions, one pair
    // hash agg, TakeOrderedAndProject for the top-50 (per-partition
    // heaps + driver merge of 50, never a global sort).
    QueryDef(
      "q_bpe_pairs",
      (s: SparkSession, dir: String) => {
        val words = Tables(s, dir, "documents")
          .select(explode(toks).as("w"))
          .filter(length(col("w")) >= 2) // 0/1-char words yield no pairs
          .groupBy("w").agg(count(lit(1)).as("wf"))
        words
          // sequence(1, n) is DESCENDING when n < 1 — the length filter
          // above guarantees ascending 1..len−1 here
          .select(col("wf"),
            expr("explode(sequence(1, length(w) - 1))").as("i"), col("w"))
          .select(expr("substring(w, i, 2)").as("pair"), col("wf"))
          .groupBy("pair").agg(sum("wf").as("n"))
          .orderBy(desc("n"), asc("pair")).limit(50)
      },
      Some("""WITH t AS (
             |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
             |wf AS (
             |  SELECT w, COUNT(*) AS wf FROM t WHERE length(w) >= 2 GROUP BY w),
             |p AS (
             |  SELECT unnest(list_transform(range(1, length(w)),
             |    i -> substring(w, CAST(i AS INTEGER), 2))) AS pair, wf
             |  FROM wf)
             |SELECT pair, CAST(SUM(wf) AS BIGINT) AS n
             |FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 50""".stripMargin)),

    // ------------------------------------------------------------------
    // q_bpe_merge ★ (new r5) — one FULL BPE training iteration:
    // q_bpe_pairs is the candidate-count half; this row adds the other
    // half — select the argmax pair (count DESC, pair ASC: the 1-row
    // MODEL, the merge-table entry) and APPLY it to the vocabulary with
    // BPE's greedy left-to-right non-overlapping rule. The overlap rule
    // is the subtle part ("aaaa" with pair "aa" merges twice, "aaa"
    // once) and is computed set-wise, not sequentially: match positions
    // → gaps-and-islands (i − row_number per word) → each island of L
    // consecutive matches yields ⌈L/2⌉ merges (even offsets). Distinct
    // pairs can't overlap themselves, so the islands formula is exact
    // for both cases. Everything runs on the word-frequency table
    // (corpus-compressed — the BPE-at-scale trick restated from
    // q_bpe_pairs); the full tokenizer train is a driver loop of
    // exactly this plan, model-growing like pagerankSteps.
    QueryDef(
      "q_bpe_merge",
      (s: SparkSession, dir: String) => {
        import org.apache.spark.sql.expressions.Window
        val words = Tables(s, dir, "documents")
          .select(explode(toks).as("w"))
          .filter(length(col("w")) >= 2)
          .groupBy("w").agg(count(lit(1)).as("wf"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val topRow = words
          .select(col("wf"),
            expr("explode(sequence(1, length(w) - 1))").as("i"), col("w"))
          .select(expr("substring(w, i, 2)").as("pair"), col("wf"))
          .groupBy("pair").agg(sum("wf").as("n"))
          .orderBy(desc("n"), asc("pair")).limit(1)
          .collect() // the 1-row model (merge-table entry)
        if (topRow.isEmpty) {
          // EMPTY vocabulary: no pair to merge — empty output in both
          // engines (r17 empty sweep; no `return` in a stored lambda)
          words.limit(0).select(lit("").as("pair"), col("w"),
            col("wf"), col("wf").as("n_merges"),
            col("wf").as("len_before"), col("wf").as("len_after"))
        } else {
        val top = topRow.head.getString(0)
        val matches = words
          .select(col("w"), col("wf"),
            expr("explode(sequence(1, length(w) - 1))").as("i"))
          .filter(expr("substring(w, i, 2)") === top)
        val isl = matches.withColumn("isl",
          col("i") - row_number().over(Window.partitionBy("w").orderBy("i")))
        val merged = isl.groupBy(col("w"), col("wf"), col("isl"))
          .agg(count(lit(1)).as("cnt"))
          .select(col("w"), col("wf"),
            graft.functions.ExactMath.divTrunc(col("cnt") + 1L, lit(2L)).as("m"))
          .groupBy("w", "wf").agg(sum("m").as("n_merges"))
        // no unpersist here: the returned plan is lazy — releasing the
        // cache now would force the apply phase to recompute `words`;
        // Bench's per-query clearCache() reclaims it (file convention,
        // review fix r5)
        merged
          .select(lit(top).as("pair"), col("w"), col("wf"), col("n_merges"),
            length(col("w")).cast("long").as("len_before"),
            (length(col("w")) - col("n_merges")).cast("long").as("len_after"))
          .orderBy(desc("wf"), asc("w")).limit(50)
        }
      },
      Some("""WITH t AS (
             |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
             |wf AS (
             |  SELECT w, COUNT(*) AS wf FROM t WHERE length(w) >= 2 GROUP BY w),
             |p AS (
             |  SELECT unnest(list_transform(range(1, length(w)),
             |    i -> substring(w, CAST(i AS INTEGER), 2))) AS pair, wf
             |  FROM wf),
             |top AS (
             |  SELECT pair FROM p GROUP BY pair
             |  ORDER BY SUM(wf) DESC, pair LIMIT 1),
             |pos AS (
             |  SELECT w, wf, unnest(range(1, length(w))) AS i FROM wf),
             |m AS (
             |  SELECT w, wf, i,
             |    i - ROW_NUMBER() OVER (PARTITION BY w ORDER BY i) AS isl
             |  FROM pos, top
             |  WHERE substring(w, CAST(i AS INTEGER), 2) = top.pair),
             |per_isl AS (
             |  SELECT w, wf, isl, (COUNT(*) + 1) // 2 AS mg
             |  FROM m GROUP BY 1, 2, 3),
             |per_w AS (
             |  SELECT w, wf, CAST(SUM(mg) AS BIGINT) AS n_merges
             |  FROM per_isl GROUP BY 1, 2)
             |SELECT (SELECT pair FROM top) AS pair, w, wf, n_merges,
             |  CAST(length(w) AS BIGINT) AS len_before,
             |  CAST(length(w) - n_merges AS BIGINT) AS len_after
             |FROM per_w
             |ORDER BY wf DESC, w LIMIT 50""".stripMargin)),

    // ------------------------------------------------------------------
    // q_bpe_train ★ (new r12) — the MULTI-round BPE trainer (r11
    // verdict #3): q_bpe_merge is one iteration; this is the actual
    // tokenizer-training kernel — [[BpeTrainRounds]] rounds of
    // (count adjacent token pairs over the current segmentation →
    // argmax (count DESC, pair ASC) → apply the merge greedily
    // left-to-right) starting from the character segmentation,
    // exporting the MERGE TABLE (round, t1, t2, merged, n) — the
    // artifact a BPE tokenizer ships.
    //
    // Orchestration is the q_pagerank3 driver-loop pattern: each round
    // fetches ONE model row (the argmax pair — bounded driver data),
    // bakes it into the next round's plan as a constant, and
    // re-segments via the codegen'd [[graft.functions.BpeApply]]
    // (greedy non-overlap: [a a a a] → [aa aa]). Everything distributed
    // runs on the WORD-FREQUENCY table — corpus-compressed, the trick
    // that makes BPE training feasible at 100 TB: the corpus is read
    // once for the frequency agg; every round after that is
    // vocabulary-sized (the adjacent-pair HOF here is interpreted but
    // vocabulary-scale, never the corpus hot path). Each round's
    // segmentation is persisted and materialized before the previous
    // is released, so round r+1 never recomputes rounds 1..r.
    //
    // Pair identity is t1‖US‖t2 (US = chr(31), below every printable
    // byte and absent from token text), so the single-string tiebreak
    // order IS the (t1, t2) tuple order in both engines. Oracle: the
    // identical rounds UNROLLED as CTEs — DuckDB's list_reduce
    // reproduces the greedy left-to-right apply exactly (acc carries
    // the merged-so-far tokens US-joined; a merge consumes the pair, so
    // a produced token never re-merges within its round).
    //
    // r13: the trained model is MATERIALIZED per corpus ([[bpeModel]],
    // the CorpusTable seam) — this row and q_bpe_encode share ONE
    // training run per corpus instead of each invoking the trainer.
    QueryDef(
      "q_bpe_train",
      (s: SparkSession, dir: String) =>
        bpeModel(s, dir).filter(col("kind") === "m")
          .select(col("round"), col("t1"), col("t2"),
            concat(col("t1"), col("t2")).as("merged"), col("n"))
          .orderBy("round"),
      Some(BpeTrainSql)),

    // ------------------------------------------------------------------
    // q_bpe_encode ★ (new r12) — the tokenizer APPLY at corpus scale,
    // q_bpe_train's other half: segment the corpus with the trained
    // merge table and report per-document subword counts + the
    // chars-per-subword compression the tokenizer actually bought —
    // the number every data pipeline needs per doc (token budgets,
    // packing, mixture weights are all in TOKENS, not words). The
    // at-scale trick restated: the merges are applied to the
    // VOCABULARY (the kind='s' half of the materialized [[bpeModel]] —
    // the trainer's own final segmentation, read AT REST since r13:
    // one shared training run, no second implementation to
    // drift), and the corpus is segmented by ONE equi-join of the
    // exploded token stream against the vocabulary-sized
    // (word → subword count) frame (broadcast at 100 TB: vocab ≪
    // corpus) — the corpus text is never re-scanned per merge round.
    // Words outside the trained vocabulary (< 2 chars) fall back to
    // character segmentation (n_sub = length). Oracle: the shared
    // round CTEs with the FINAL apply kept, then the identical left
    // join + per-doc agg.
    QueryDef(
      "q_bpe_encode",
      (s: SparkSession, dir: String) =>
        bpeEncodedTokens(s, dir)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"),
            sum("n_chars").as("n_chars"),
            sum("n_sub").as("n_bpe"))
          .select(col("doc_id"), col("n_words"), col("n_chars"), col("n_bpe"),
            floorDivL(col("n_chars") * 10000L, greatest(col("n_bpe"), lit(1L)))
              .as("compression_e4"))
          .orderBy("doc_id"),
      Some(s"""${bpeRoundsSql(finalApply = true)},
              |v AS (SELECT w, CAST(len(toks) AS BIGINT) AS n_sub
              |      FROM s$BpeTrainRounds),
              |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              |        FROM documents),
              |enc AS (
              |  SELECT tok.doc_id, CAST(length(tok.w) AS BIGINT) AS n_chars,
              |    COALESCE(v.n_sub, length(tok.w)) AS n_sub
              |  FROM tok LEFT JOIN v ON tok.w = v.w)
              |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
              |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
              |  CAST(SUM(n_sub) AS BIGINT) AS n_bpe,
              |  (CAST(SUM(n_chars) AS BIGINT) * 10000) //
              |    GREATEST(CAST(SUM(n_sub) AS BIGINT), 1) AS compression_e4
              |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_bpe_fertility ★ (new r13) — tokenizer EVALUATION per language:
    // fertility (subwords per word) and chars-per-subword, the standard
    // multilingual-tokenizer health metrics (a language with fertility
    // ≫ the corpus mean pays more sequence length per sentence — the
    // signal that drives vocab-size and training-mix decisions), plus
    // the char-fallback word count (out-of-vocabulary words segmented
    // to characters). Reads the SAME materialized [[bpeModel]] and the
    // SAME [[bpeEncodedTokens]] join as q_bpe_encode — one encode
    // semantics, two aggregations — so eval can never drift from the
    // tokenizer it grades. All exact integer e4; the only exchange is
    // the ≤5-group lang agg after map-side combine.
    QueryDef(
      "q_bpe_fertility",
      (s: SparkSession, dir: String) =>
        bpeEncodedTokens(s, dir)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_words"),
            sum("n_chars").as("n_chars"),
            sum("n_sub").as("n_bpe"),
            sum("fallback").as("n_fallback"))
          .select(col("lang"), col("n_words"), col("n_bpe"), col("n_fallback"),
            floorDivL(col("n_bpe") * 10000L, col("n_words")).as("fertility_e4"),
            floorDivL(col("n_chars") * 10000L, greatest(col("n_bpe"), lit(1L)))
              .as("chars_per_sub_e4"))
          .orderBy("lang"),
      Some(s"""${bpeRoundsSql(finalApply = true)},
              |v AS (SELECT w, CAST(len(toks) AS BIGINT) AS n_sub
              |      FROM s$BpeTrainRounds),
              |tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
              |        FROM documents),
              |enc AS (
              |  SELECT tok.lang, CAST(length(tok.w) AS BIGINT) AS n_chars,
              |    CASE WHEN v.n_sub IS NULL THEN 1 ELSE 0 END AS fallback,
              |    COALESCE(v.n_sub, length(tok.w)) AS n_sub
              |  FROM tok LEFT JOIN v ON tok.w = v.w)
              |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
              |  CAST(SUM(n_sub) AS BIGINT) AS n_bpe,
              |  CAST(SUM(fallback) AS BIGINT) AS n_fallback,
              |  (CAST(SUM(n_sub) AS BIGINT) * 10000) // COUNT(*) AS fertility_e4,
              |  (CAST(SUM(n_chars) AS BIGINT) * 10000) //
              |    GREATEST(CAST(SUM(n_sub) AS BIGINT), 1) AS chars_per_sub_e4
              |FROM enc GROUP BY lang
              |ORDER BY lang NULLS FIRST""".stripMargin)),
              // NULLS FIRST: Spark sorts the NULL-lang group first,
              // DuckDB last (r17 nasty sweep)

    // ------------------------------------------------------------------
    // q_unigram_train ★ (new r14) — the unigram-LM (SentencePiece)
    // tokenizer trainer, the OTHER tokenizer family a data pipeline
    // meets next to BPE (Kudo 2018; hard-EM with the Viterbi E-step):
    // seed vocabulary = every ≤4-char substring of every word, Laplace
    // counts, then [[UnigramRounds]] EM rounds of (integer log₂ scores
    // → per-word Viterbi segmentation → re-estimated counts). Where
    // BPE grows a vocabulary bottom-up by merges, unigram starts from
    // an overcomplete seed and lets EM concentrate mass on useful
    // pieces — the trainer publishes the count table and the final
    // segmentation as one materialized model ([[unigramModel]]).
    // Declared output: the top-32 pieces by final count (cnt DESC,
    // piece ASC — deterministic) with the number of distinct words
    // whose final segmentation uses them. All exact integers: scores
    // are Q30 log2e20 differences, so the oracle's recursive-CTE DP
    // reproduces every dp value bit-for-bit.
    // Scale: everything after the one corpus pass (word frequencies)
    // is VOCABULARY-sized — seed ≤ 64·|vocab| rows, per-round work is
    // a vocab join + the codegen'd per-word DP kernel + a piece agg;
    // the bpeTrainCore argument verbatim. Counts stay under the
    // log2e20 2³³ domain through gen-sf10 (require()d at train time).
    QueryDef(
      "q_unigram_train",
      (s: SparkSession, dir: String) => {
        val model = unigramModel(s, dir)
        val nWords = model.filter(col("kind") === "s")
          .select(col("w"), explode(col("seg")).as("p"))
          .distinct()
          .groupBy("p").agg(count(lit(1)).as("n_words"))
        model.filter(col("kind") === "p")
          .select(col("p"), col("cnt"))
          .join(nWords, Seq("p"), "left")
          .select(col("p").as("piece"), col("cnt"),
            coalesce(col("n_words"), lit(0L)).as("n_words"))
          .orderBy(col("cnt").desc, col("piece"))
          .limit(32)
      },
      Some(s"""WITH RECURSIVE $UnigramRoundsSql,
              |unw AS (SELECT p, CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words
              |        FROM uwb$UnigramRounds WHERE p IS NOT NULL GROUP BY 1)
              |SELECT c.p AS piece, CAST(c.cnt AS BIGINT) AS cnt,
              |  COALESCE(unw.n_words, 0) AS n_words
              |FROM ucnt$UnigramRounds c LEFT JOIN unw ON unw.p = c.p
              |ORDER BY cnt DESC, piece LIMIT 32""".stripMargin)),

    // ------------------------------------------------------------------
    // q_unigram_encode ★ (new r14) — corpus encode against the trained
    // unigram model: the per-word segmentation is published BY the
    // model (kind='s' rows of the materialized [[unigramModel]] — one
    // training run per corpus ever, the bpeModel seam), so encoding is
    // ONE vocabulary-sized left join on the exploded token stream —
    // broadcastable at 100 TB, no per-document DP. Words longer than
    // [[UnigramMaxWord]] fall back to character segmentation
    // (SentencePiece's own cap), counted per doc. Declared output is
    // the per-doc encode budget (words, pieces, fallbacks,
    // fertility_e4) — the q_bpe_encode shape on the second tokenizer
    // family, so the two are directly comparable row-for-row.
    QueryDef(
      "q_unigram_encode",
      (s: SparkSession, dir: String) => {
        val vocab = unigramModel(s, dir).filter(col("kind") === "s")
          .select(col("w"), size(col("seg")).cast("long").as("n_sub"))
        Tables(s, dir, "documents")
          .select(col("doc_id"), explode(toks).as("w"))
          .join(vocab, Seq("w"), "left")
          .select(col("doc_id"),
            // an EMPTY word (consecutive/leading/trailing spaces) is
            // excluded from training in BOTH engines (r16 trainer fix),
            // so it is absent from the model entirely and lands in the
            // isNull branch here — counted as a fallback with 0 pieces
            // in both engines (r15 parity fix, found by the planted
            // double-space fixture)
            when(col("n_sub").isNull || col("n_sub") === 0L, 1L)
              .otherwise(0L).as("fallback"),
            coalesce(col("n_sub"), length(col("w")).cast("long")).as("n_sub"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_pieces"),
            sum("fallback").as("n_fallback"))
          .withColumn("fertility_e4",
            floorDivL(col("n_pieces") * 10000L, col("n_words")))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $UnigramRoundsSql,
              |usegn AS MATERIALIZED (
              |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_sub
              |  FROM uwb$UnigramRounds WHERE p IS NOT NULL GROUP BY 1),
              |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              |        FROM documents),
              |enc AS (
              |  SELECT tok.doc_id,
              |    CASE WHEN u.n_sub IS NULL THEN 1 ELSE 0 END AS fallback,
              |    COALESCE(u.n_sub, length(tok.w)) AS n_sub
              |  FROM tok LEFT JOIN usegn u ON tok.w = u.w)
              |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
              |  CAST(SUM(n_sub) AS BIGINT) AS n_pieces,
              |  CAST(SUM(fallback) AS BIGINT) AS n_fallback,
              |  (CAST(SUM(n_sub) AS BIGINT) * 10000) // COUNT(*) AS fertility_e4
              |FROM enc GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ------------------------------------------------------------------
    // q_wordpiece_train ★ (new r14) — the WordPiece tokenizer trainer
    // (Schuster & Nakajima 2012; BERT), the THIRD tokenizer family:
    // where BPE merges the most FREQUENT adjacent pair and unigram-LM
    // prunes an overcomplete seed by EM, WordPiece merges the pair
    // maximizing LIKELIHOOD GAIN count(t1 t2)/(count(t1)·count(t2)) —
    // a frequent pair of rare tokens beats a frequent pair of common
    // ones — over BERT's `##`-continuation segmentation (first char
    // bare, rest ##-prefixed; merging drops t2's ##). Declared output:
    // the merge table (round, t1, t2, merged, n, na, nb) — the
    // artifact a WordPiece tokenizer ships next to its vocab.
    // Orchestration is bpeTrainCore verbatim (driver loop, one model
    // row per round, codegen'd apply, all rounds vocabulary-sized
    // after the one corpus pass). The argmax key is the IEEE double
    // n/(na·nb): operands exact (≪ 2^53), multiply/divide correctly
    // rounded per IEEE-754 — bit-identical in JVM and DuckDB — with
    // ties broken on the pair string ([[wordPieceTrainCore]]).
    // Oracle: the identical rounds unrolled as CTEs; the list_reduce
    // apply writes the ##-stripped merged token.
    QueryDef(
      "q_wordpiece_train",
      (s: SparkSession, dir: String) =>
        wordPieceModel(s, dir).filter(col("kind") === "m")
          .select(col("round"), col("t1"), col("t2"), col("merged"),
            col("n"), col("na"), col("nb"))
          .orderBy("round"),
      Some(WpTrainSql)),

    // ------------------------------------------------------------------
    // q_wordpiece_encode ★ (new r14) — greedy LONGEST-MATCH-FIRST
    // encode against the trained WordPiece vocabulary: BERT's actual
    // runtime tokenizer, and semantically distinct from both
    // q_bpe_encode and q_unigram_encode — the runtime does NOT replay
    // the training merges, it matches the longest vocab piece at each
    // cursor (bare at word start, ##-prefixed after), and a word with
    // ANY unmatchable position becomes the single [UNK] token (the
    // whole-word failure rule). Declared per-doc output adds
    // n_diverged — trained words whose longest-match segmentation
    // differs from their training segmentation, a real WordPiece
    // property the other families can't exhibit — plus n_unk and the
    // fertility the pipeline budgets by.
    // Scale: everything is word-vocabulary-sized ([[wordPieceEncoded]]:
    // candidate explode capped by the vocab's max piece length, one
    // vocab equi-join, the per-word codegen'd kernel); the corpus
    // token stream joins the per-word frame ONCE (broadcastable at
    // 100 TB). Oracle: candidates via the same capped explode, the
    // per-position longest match as a plain GROUP BY MAX, the greedy
    // walk as a recursive CTE (terminating early at unmatched
    // positions → the [UNK] CASE), diverged via the final training
    // segmentation wps5.
    QueryDef(
      "q_wordpiece_encode",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .select(col("doc_id"), explode(toks).as("w"))
          .join(wordPieceEncoded(s, dir), "w")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"), sum("n_pieces").as("n_pieces"),
            sum("unk").as("n_unk"), sum("diverged").as("n_diverged"))
          .withColumn("fertility_e4",
            floorDivL(col("n_pieces") * 10000L, col("n_words")))
          .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE ${wpRoundsSql(finalApply = true)},
              |$WpEncodePerWordSql,
              |wptok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              |          FROM documents)
              |SELECT wptok.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
              |  CAST(SUM(p.n_pieces) AS BIGINT) AS n_pieces,
              |  CAST(SUM(p.unk) AS BIGINT) AS n_unk,
              |  CAST(SUM(p.diverged) AS BIGINT) AS n_diverged,
              |  (CAST(SUM(p.n_pieces) AS BIGINT) * 10000) // COUNT(*) AS fertility_e4
              |FROM wptok JOIN wpper p ON p.w = wptok.w
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ------------------------------------------------------------------
    // q_tokenizer_compare ★ (new r14) — the tokenizer-eval CAPSTONE:
    // all three trained families (BPE merges, unigram-LM/SentencePiece,
    // WordPiece longest-match) encoded over the SAME token stream and
    // compared per language in one table — fertility side by side plus
    // WordPiece's UNK count. This is the table a pipeline reads to
    // PICK a tokenizer (the lowest-fertility family per language wins
    // sequence-length budget); it exists only because all three
    // trainers share the corpus and their encode semantics are already
    // declared rows — this row adds NO new semantics, it joins the
    // three at-rest models ([[bpeModel]] / [[unigramModel]] /
    // [[wordPieceModel]] — zero re-training, the CorpusTable seam) on
    // one exploded (lang, word) stream. Per-family fallback rules are
    // each family's own (BPE: <2-char chars; unigram: >16-char chars;
    // WordPiece: whole-word [UNK]).
    // Scale: three vocab-sized left joins on the token stream (each
    // broadcastable at 100 TB) + a ≤5-group lang agg.
    QueryDef(
      "q_tokenizer_compare",
      (s: SparkSession, dir: String) => {
        val lw = Tables(s, dir, "documents")
          .select(col("lang"), explode(toks).as("w"))
        val bpe = bpeEncodedTokens(s, dir).groupBy("lang")
          .agg(count(lit(1)).as("n_words"), sum("n_sub").as("bpe_pieces"))
        val uniV = unigramModel(s, dir).filter(col("kind") === "s")
          .select(col("w"), size(col("seg")).cast("long").as("n_sub"))
        val uni = lw.join(uniV, Seq("w"), "left")
          .select(col("lang"),
            coalesce(col("n_sub"), length(col("w")).cast("long")).as("n_sub"))
          .groupBy("lang").agg(sum("n_sub").as("uni_pieces"))
        val wp = lw.join(wordPieceEncoded(s, dir)
            .select(col("w"), col("n_pieces"), col("unk")), "w")
          .groupBy("lang")
          .agg(sum("n_pieces").as("wp_pieces"), sum("unk").as("wp_unk"))
        bpe.join(uni, "lang").join(wp, "lang")
          .select(col("lang"), col("n_words"),
            floorDivL(col("bpe_pieces") * 10000L, col("n_words"))
              .as("bpe_fert_e4"),
            floorDivL(col("uni_pieces") * 10000L, col("n_words"))
              .as("uni_fert_e4"),
            floorDivL(col("wp_pieces") * 10000L, col("n_words"))
              .as("wp_fert_e4"),
            col("wp_unk"))
          .orderBy("lang")
      },
      Some(s"""WITH RECURSIVE ${bpeRoundsSql(finalApply = true).stripPrefix("WITH ")},
              |bv AS (SELECT w, CAST(len(toks) AS BIGINT) AS n_sub
              |       FROM s$BpeTrainRounds),
              |$UnigramRoundsSql,
              |usegn2 AS MATERIALIZED (
              |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_sub
              |  FROM uwb$UnigramRounds WHERE p IS NOT NULL GROUP BY 1),
              |${wpRoundsSql(finalApply = true)},
              |$WpEncodePerWordSql,
              |ltok AS (SELECT lang, unnest(string_split(text, ' ')) AS w
              |         FROM documents),
              |bfert AS (
              |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
              |    CAST(SUM(COALESCE(bv.n_sub, length(ltok.w))) AS BIGINT)
              |      AS pieces
              |  FROM ltok LEFT JOIN bv ON bv.w = ltok.w GROUP BY 1),
              |ufert AS (
              |  SELECT lang,
              |    CAST(SUM(COALESCE(u2.n_sub, length(ltok.w))) AS BIGINT)
              |      AS pieces
              |  FROM ltok LEFT JOIN usegn2 u2 ON u2.w = ltok.w GROUP BY 1),
              |wfert AS (
              |  SELECT lang, CAST(SUM(p.n_pieces) AS BIGINT) AS pieces,
              |    CAST(SUM(p.unk) AS BIGINT) AS wp_unk
              |  FROM ltok JOIN wpper p ON p.w = ltok.w GROUP BY 1)
              |SELECT bfert.lang, bfert.n_words,
              |  (bfert.pieces * 10000) // bfert.n_words AS bpe_fert_e4,
              |  (ufert.pieces * 10000) // bfert.n_words AS uni_fert_e4,
              |  (wfert.pieces * 10000) // bfert.n_words AS wp_fert_e4,
              |  wfert.wp_unk
              |FROM bfert
              |JOIN ufert ON ufert.lang = bfert.lang
              |JOIN wfert ON wfert.lang = bfert.lang
              |ORDER BY bfert.lang""".stripMargin)),

    // ------------------------------------------------------------------
    // q_quality_classifier ★ (new r13) — LEARNED quality filtering, the
    // modern curation stage (CCNet's wiki-vs-crawl scorer, DCLM's
    // fastText filter, FineWeb-Edu's classifier) that the heuristic
    // gates don't cover: every document scored by a linear model over
    // hashed token features and kept iff score ≥ 0; declared output is
    // the per-source keep rate + exact score mass, the table a curation
    // run reads to see what the filter is doing to each source.
    //
    // The whole APPLY is exact integer e6 — weights/bias are
    // hash-derived plan constants ([[qcWeights]]), features are token
    // counts, score = bias + Σ w[dim(token)] — so the oracle matches by
    // construction, no float anywhere. Plan shape is the 100 TB shape:
    // per-doc scoring is ONE map-only fold over the token array (no
    // explode, no doc_id shuffle — [[qcScoreE6]]); the only exchange in
    // the plan is the final ~20-group source agg after map-side
    // combine, then the mandated sort. A production retrain swaps the
    // weight literal for a broadcast variable; nothing else changes.
    // ------------------------------------------------------------------
    // q_token_budget ★ (new r13) — budget-constrained selection in
    // TOKENS: the final curation cut of a training run, which buys data
    // by token budget, not document count (the q_quality_adaptive
    // rank-quota's other half — that row keeps the best 75% of DOCS per
    // source; this one keeps the best-scored docs until 25% of each
    // source's TOKEN mass is spent, so a source of long documents keeps
    // fewer docs for the same budget). Greedy by the learned classifier
    // score (qcScoreE6, shared with q_quality_classifier — one scorer,
    // spec'd once), total order (z DESC, doc_id): keep while the
    // running token sum fits the budget. All exact integers. Declared
    // output is the per-source purchase manifest: docs/tokens kept vs
    // budget + cut_score_e6 = the score of the LAST doc the budget
    // bought (MIN over kept docs — the purchase cutoff line, not the
    // best excluded doc).
    // Plan: one scored projection (map-only fold), source-partitioned
    // rank + prefix-sum windows (never global), one ~20-group agg.
    QueryDef(
      "q_token_budget",
      (s: SparkSession, dir: String) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("z").desc, col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val sw = org.apache.spark.sql.expressions.Window.partitionBy("source")
        Tables(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            size(toks).cast("long").as("n_tokens"), qcScoreE6.as("z"))
          .withColumn("cum", sum("n_tokens").over(w))
          .withColumn("budget", floorDivL(sum("n_tokens").over(sw), lit(4L)))
          .withColumn("keep", when(col("cum") <= col("budget"), 1L).otherwise(0L))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("keep").as("n_kept"),
            sum(when(col("keep") === 1L, col("n_tokens")).otherwise(0L))
              .as("kept_tokens"),
            max("budget").as("budget_tokens"),
            coalesce(min(when(col("keep") === 1L, col("z"))), lit(0L))
              .as("cut_score_e6"))
          .orderBy("source")
      },
      Some(s"""WITH $QcScoreSql,
              |nt AS (
              |  SELECT doc_id, source,
              |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              |  FROM documents),
              |r AS (
              |  SELECT sc.source, sc.doc_id, nt.n_tokens, sc.z,
              |    SUM(nt.n_tokens) OVER (PARTITION BY sc.source
              |      ORDER BY sc.z DESC, sc.doc_id
              |      ROWS UNBOUNDED PRECEDING) AS cum,
              |    CAST(SUM(nt.n_tokens) OVER (PARTITION BY sc.source) AS BIGINT)
              |      // 4 AS budget
              |  FROM sc JOIN nt ON sc.doc_id = nt.doc_id),
              |k AS (SELECT *, CASE WHEN cum <= budget THEN 1 ELSE 0 END AS keep
              |      FROM r)
              |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              |  CAST(SUM(keep) AS BIGINT) AS n_kept,
              |  CAST(SUM(CASE WHEN keep = 1 THEN n_tokens ELSE 0 END) AS BIGINT)
              |    AS kept_tokens,
              |  CAST(MAX(budget) AS BIGINT) AS budget_tokens,
              |  COALESCE(MIN(CASE WHEN keep = 1 THEN z END), 0) AS cut_score_e6
              |FROM k GROUP BY source ORDER BY source""".stripMargin)),

    QueryDef(
      "q_quality_classifier",
      // r17: the input unions the [[TextFixture.qcDocs]] planted slice
      // (weight-selected vocabularies), so the driver's oracle row
      // shows LIVE discrimination — planted_qc_good keeps 100%,
      // planted_qc_bad 0%, planted_qc_mix ≈ half — next to the honest
      // near-uniform corpus sources.
      (s: SparkSession, dir: String) =>
        qcFixtureInput(s, dir)
          .select(col("source"), qcScoreE6.as("z"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("z") >= 0, 1L).otherwise(0L)).as("n_keep"),
            sum("z").as("score_sum_e6"))
          .select(col("source"), col("n_docs"), col("n_keep"),
            floorDivL(col("n_keep") * 10000L, col("n_docs")).as("keep_rate_e4"),
            col("score_sum_e6"))
          .orderBy("source"),
      Some(s"""WITH $QcScoreFixtureSql
              |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              |  CAST(SUM(CASE WHEN z >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
              |  (CAST(SUM(CASE WHEN z >= 0 THEN 1 ELSE 0 END) AS BIGINT) * 10000)
              |    // CAST(COUNT(*) AS BIGINT) AS keep_rate_e4,
              |  CAST(SUM(z) AS BIGINT) AS score_sum_e6
              |FROM sc GROUP BY source ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q_quality_grad ★ (new r13) — ONE full-batch gradient step for the
    // classifier above, as a SUFFICIENT-STATISTICS aggregation (the
    // q_kmeans_iter pattern): ∂L/∂w_d = Σ_docs (s(z)−y)·x_d shipped as
    // 257 exact longs (dim −1 = bias), with s the rational fast-sigmoid
    // of [[qcResidE6]] (see there for why NOT libm σ: the exp-based
    // residual's floor margins shrink to the libm noise floor as the
    // corpus grows; s is bit-identical cross-engine by construction at
    // any scale, and its convex integral loss keeps the descent
    // guarantee — TextSpec proves the step decreases it). Pseudo-labels
    // are the CCNet-style distillation move: y = a cheap heuristic gate
    // (≥ 10 tokens AND ≥ half the tokens distinct), so the linear
    // scorer learns to imitate a gate that at production scale would be
    // an expensive teacher (an LLM judge or reference-corpus LM).
    //
    // Exactness: z is exact integer e6; the residual is quantized ONCE
    // per doc — r = floor((s(z)−y)·1e6+0.5), bit-equal in both engines
    // — after which every distributed sum is a commutative LONG sum
    // (partition-order-independent, map-side combined — the same
    // argument as q_kmeans_iter's e6 coordinate sums).
    // Plan: the map-only score fold, then ONE token explode
    // → 256-group agg (map-side combine; dims are uniform by
    // construction — no skew), plus a 1-row bias agg broadcast-unioned;
    // gradient DESCENT at 100 TB is this exact query once per step.
    QueryDef(
      "q_quality_grad",
      (s: SparkSession, dir: String) => {
        val perDoc = Tables(s, dir, "documents")
          .select(col("doc_id"), col("text"), qcScoreE6.as("z"), qcLabel.as("y"))
          .select(col("doc_id"), col("text"),
            qcResidE6(col("z"), col("y")).as("r"))
        val dimG = perDoc
          // coalesce: the NULL-text doc carries ONE '' token, matching
          // qcScoreE6's fold and the oracle's coalesced tok CTE (r17)
          .select(explode(split(coalesce(col("text"), lit("")), " ")).as("tk"),
            col("r"))
          .select(qcDim(col("tk")).cast("int").as("dim"), col("r"))
          .groupBy("dim")
          .agg(sum("r").as("g_e6"), count(lit(1)).as("n_terms"))
        val biasG = perDoc
          .agg(sum("r").as("g_e6"), count(lit(1)).as("n_terms"))
          .select(lit(-1).as("dim"), col("g_e6"), col("n_terms"))
        biasG.unionByName(dimG).orderBy("dim")
      },
      Some(s"""WITH $QcScoreSql,
              |y AS (SELECT doc_id,
              |  CASE WHEN len(list_distinct(string_split(text, ' '))) * 2
              |         >= len(string_split(text, ' '))
              |       AND len(string_split(text, ' ')) >= 10
              |    THEN 1 ELSE 0 END AS y
              |  FROM documents),
              |r AS (SELECT sc.doc_id,
              |  ${qcResidSqlExpr("sc.z", "y.y")} AS r
              |  FROM sc JOIN y USING (doc_id)),
              |g AS (SELECT dims.d AS dim, CAST(SUM(r.r) AS BIGINT) AS g_e6,
              |  CAST(COUNT(*) AS BIGINT) AS n_terms
              |  FROM dims JOIN r USING (doc_id) GROUP BY 1)
              |SELECT CAST(-1 AS INTEGER) AS dim, CAST(SUM(r) AS BIGINT) AS g_e6,
              |  CAST(COUNT(*) AS BIGINT) AS n_terms FROM r
              |UNION ALL
              |SELECT * FROM g
              |ORDER BY dim""".stripMargin)),

    // ------------------------------------------------------------------
    // q_quality_train ★ (new r13) — the classifier family's TRAINER:
    // [[QcTrainSteps]] full-batch gradient-descent steps, driver-
    // orchestrated like q_bpe_train/q_pagerank3 — each step fetches one
    // bounded model frame (257 gradient longs), updates the weights in
    // exact integer arithmetic (w ← w − (g·2)/S, truncating division
    // matching DuckDB `//`; S = Σ_docs(Σ_d c_d² + 1) and the
    // fast-sigmoid's slope bound is ½, so 2/S is the 1/L-smoothness
    // step — descent guaranteed, no tuned constant), and bakes them
    // into the next step's plan as literals. Declared output is the
    // weight TRAJECTORY (dim, w0..w3 in e6) — the artifact a filtering
    // run ships.
    //
    // The at-scale shape: the corpus is read ONCE to build the
    // (doc, dim, count) sufficient-statistics frame (bounded by
    // docs × 256) and the per-doc label frame; every step after that is
    // statistics-sized — z is one agg over cnt with the weights as a
    // 257-long plan constant (no join), residuals join the doc-sized
    // label frame, gradients are one 256-group agg. Exactly the BPE
    // corpus-compression trick applied to model training; at 100 TB
    // each step costs one pass over the fingerprint-sized statistics,
    // never the text. Residuals are the bit-exact rational fast-sigmoid
    // ([[qcResidE6]] — no libm, no margins to defend, at any SF and
    // any step). Oracle: the identical descent unrolled as generated
    // CTEs; DuckDB `//` truncates on mixed signs exactly like the
    // driver's Scala Long division.
    QueryDef(
      "q_quality_train",
      (s: SparkSession, dir: String) => {
        val docs = Tables(s, dir, "documents")
        // Eager localCheckpoint, not persist (r17 optimization): the
        // descent loop references cnt/yf in every step's plan, and with
        // persist the driver re-analyzed the full scan→explode→agg
        // subtree per action (thread dumps: DeduplicateRelations +
        // plan-string generation dominated the row). Checkpointing makes
        // them LogicalRDD leaves; per-step plans are then tiny joins.
        // repartition by doc_id BEFORE the checkpoint: LogicalRDD keeps
        // the physical partitioning, so every step's per-doc aggregation
        // and doc_id joins reuse it instead of re-exchanging cnt
        val cnt = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tk"))
          .select(col("doc_id"), qcDim(col("tk")).cast("int").as("d"))
          .groupBy("doc_id", "d").agg(count(lit(1)).as("c"))
          .repartition(col("doc_id"))
          .localCheckpoint()
        val yf = docs.select(col("doc_id"), qcLabel.as("y")).localCheckpoint()
        val sumC2 = cnt.agg(coalesce(sum(col("c") * col("c")), lit(0L)))
          .collect()(0).getLong(0)
        // + Σ_docs 1² (the bias feature); floor at 1 so an EMPTY corpus
        // degrades to zero-gradient no-op steps (weights stay at init)
        // instead of a null collect + divide-by-zero (r17 empty sweep)
        val sVal = math.max(1L, sumC2 + yf.count())
        // the bias gradient Σr is the d = −1 row of the SAME per-dim
        // aggregation (bias ≡ a constant feature c = 1 on every doc), so
        // each step needs ONE action, not two (r17 optimization)
        val biasRows = yf.select(col("doc_id"), lit(-1).as("d"),
          lit(1L).as("c"))
        var w = qcWeights.toArray
        var b = qcBias
        val hist = scala.collection.mutable.ArrayBuffer((w.clone(), b))
        for (_ <- 1 to QcTrainSteps) {
          val wArr = array(w.toIndexedSeq.map(lit(_)): _*)
          val z = cnt.groupBy("doc_id")
            .agg((lit(b) + sum(col("c") * element_at(wArr, col("d") + 1)))
              .as("z"))
          val rs = z.join(yf, "doc_id")
            .select(col("doc_id"), qcResidE6(col("z"), col("y")).as("r"))
          val g = cnt.unionByName(biasRows).join(rs, "doc_id")
            .groupBy("d").agg(sum(col("r") * col("c")).as("g"))
            .collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
          val gb = g.getOrElse(-1, 0L)
          w = Array.tabulate(256)(d => w(d) - g.getOrElse(d, 0L) * 2L / sVal)
          b = b - gb * 2L / sVal
          hist += ((w.clone(), b))
        }
        import s.implicits._
        val rows = (-1 until 256).map { d =>
          def at(step: Int) =
            if (d < 0) hist(step)._2 else hist(step)._1(d)
          (d, at(0), at(1), at(2), at(3))
        }
        rows.toDF("dim", "w0_e6", "w1_e6", "w2_e6", "w3_e6").orderBy("dim")
      },
      Some(qcTrainSql)),

    // ------------------------------------------------------------------
    // q_quality_calibration ★ (new r14) — the classifier family's
    // RELIABILITY DIAGRAM: per (source, score-decile), the mean
    // PREDICTED keep probability vs the OBSERVED pseudo-label rate —
    // the table that tells a curation run whether the filter's scores
    // can be read as probabilities (threshold/quota decisions assume
    // they can) or are merely a ranking. Deciles are equi-depth per
    // source (NTILE(10) ordered by (z, doc_id) — deterministic,
    // identical semantics in both engines; partitioned by source, the
    // q_perplexity_bucket window shape, never a global sort). The
    // predicted probability is the EXACT quantized fast sigmoid the
    // training family already uses (pred_e6 = qcResidE6(z, 0) —
    // floor(s(z/1e6)·1e6 + 0.5), bit-identical across engines by the
    // correctly-rounded-operand-tree argument at [[qcResidE6]]);
    // everything after it is integer arithmetic. gap_e6 > 0 means the
    // scorer is overconfident in that decile.
    // Scale: one map-only score pass (the qcScoreE6 fold at scan
    // speed), a per-source window sort, a ≤10·sources-group agg.
    QueryDef(
      "q_quality_calibration",
      // r17: input unions the planted-qc slice (the classifier
      // arrangement) — the mixing-ramp source sweeps z through its
      // range, making the driver's reliability diagram LIVE
      (s: SparkSession, dir: String) => {
        import org.apache.spark.sql.expressions.Window
        val scored = qcFixtureInput(s, dir)
          .select(col("doc_id"), col("source"), qcScoreE6.as("z"),
            qcLabel.as("y"))
        scored
          .withColumn("decile", ntile(10).over(
            Window.partitionBy("source").orderBy(col("z"), col("doc_id"))))
          .groupBy("source", "decile")
          .agg(count(lit(1)).as("n_docs"),
            min("z").as("z_min"), max("z").as("z_max"),
            sum(qcResidE6(col("z"), lit(0L))).as("sp"),
            sum("y").as("npos"))
          .select(col("source"), col("decile").cast("long").as("decile"),
            col("n_docs"), col("z_min"), col("z_max"),
            floorDivL(col("sp"), col("n_docs")).as("mean_pred_e6"),
            floorDivL(col("npos") * 1000000L, col("n_docs")).as("obs_pos_e6"))
          .withColumn("gap_e6", col("mean_pred_e6") - col("obs_pos_e6"))
          .orderBy("source", "decile")
      },
      Some(s"""WITH $QcScoreFixtureSql,
              |yl AS (SELECT doc_id,
              |  CASE WHEN len(list_distinct(string_split(text, ' '))) * 2
              |         >= len(string_split(text, ' '))
              |       AND len(string_split(text, ' ')) >= 10
              |    THEN 1 ELSE 0 END AS y
              |  FROM $QcDocsUnionRel),
              |b AS (SELECT sc.doc_id, sc.source, sc.z, yl.y,
              |  ${qcResidSqlExpr("sc.z", "0")} AS pred,
              |  NTILE(10) OVER (PARTITION BY sc.source
              |                  ORDER BY sc.z, sc.doc_id) AS decile
              |  FROM sc JOIN yl USING (doc_id))
              |SELECT source, CAST(decile AS BIGINT) AS decile,
              |  CAST(COUNT(*) AS BIGINT) AS n_docs,
              |  CAST(MIN(z) AS BIGINT) AS z_min, CAST(MAX(z) AS BIGINT) AS z_max,
              |  CAST(SUM(pred) AS BIGINT) // COUNT(*) AS mean_pred_e6,
              |  (CAST(SUM(y) AS BIGINT) * 1000000) // COUNT(*) AS obs_pos_e6,
              |  CAST(SUM(pred) AS BIGINT) // COUNT(*)
              |    - (CAST(SUM(y) AS BIGINT) * 1000000) // COUNT(*) AS gap_e6
              |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ------------------------------------------------------------------
    // q_conformal_gate ★ (new r14) — SPLIT-CONFORMAL calibration of the
    // quality filter's keep threshold (Vovk et al.; the Papadopoulos
    // 2002 split/inductive form): instead of the fixed z ≥ 0 rule,
    // pick τ so that ≥ 90% of true positives survive the gate WITH A
    // FINITE-SAMPLE GUARANTEE — on exchangeable data, τ = the k-th
    // smallest calibration-positive score with k = ⌊(n+1)·α⌋ (α = 0.1)
    // bounds the miss rate at α. The calibration/deployment halves are
    // the deterministic md5(doc_id) mod 100 < 50 split (the
    // q_split_assign machinery — no RNG, membership never migrates).
    // Declared output: per-source deployment stats under the conformal
    // τ (kept, kept positives, achieved recall, keep rate) + the
    // global (n_cal_pos, τ) so the guarantee is auditable.
    // Scale (r15 rework, clears the r14 weak mark): the k-th order
    // statistic is found WITHOUT any global window — an iterative
    // bucketed search over the calibration score HISTOGRAM: each level
    // partitions the current VALUE interval [lo, hi] into ≤ 65536
    // fixed-width buckets (one hash agg; the driver collect is
    // hard-bounded at 65536 rows REGARDLESS of corpus size or score
    // uniqueness), locates the bucket containing rank k, and recurses
    // into it; once the interval is ≤ 65536 wide it holds ≤ 65536
    // distinct integer scores and τ is read exactly. Levels =
    // ⌈log₆₅₅₃₆(score range)⌉ ≤ 2 for any realistic doc length (range
    // 2·10¹¹ for a 10⁶-token doc ⇒ 2 levels). (n, τ) then ride into
    // the deployment agg as plan literals — no broadcast join at all.
    // Preconditions: the calibration half contains ≥ 1 positive
    // (require()d, loud even on an all-null agg). NOTE the
    // k = max(1, ⌊(n+1)·α⌋) clamp: for 1 ≤ n ≤ 8 calibration
    // positives ⌊(n+1)/10⌋ = 0 and the finite-sample miss-rate ≤ α
    // guarantee does NOT hold (no order statistic certifies α = 0.1
    // from so few points) — the gate then degrades to "keep everything
    // ≥ the calibration minimum", the conservative direction.
    QueryDef(
      "q_conformal_gate",
      (s: SparkSession, dir: String) => {
        val h = pmod(graft.functions.Md5Ops.md5Prefix(col("doc_id").cast("string"), 15), lit(100L))
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id"), col("source"), qcScoreE6.as("z"),
            qcLabel.as("y"),
            when(h < 50, lit("cal")).otherwise(lit("dep")).as("half"))
        val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
        // persisted: the bounds agg + each search level re-scan it
        val hist = docs.filter(col("half") === "cal" && col("y") === 1L)
          .groupBy("z").agg(count(lit(1)).as("c")).persist(mem)
        val bounds = hist.agg(min("z").as("lo"), max("z").as("hi"),
          sum("c").as("n")).head()
        require(!bounds.isNullAt(2) && bounds.getLong(2) > 0L,
          "q_conformal_gate: no calibration positives")
        val n = bounds.getLong(2)
        val k = math.max(1L, (n + 1L) / 10L)
        val tau = bucketedKthSmallest(hist, k,
          bounds.getLong(0), bounds.getLong(1), 65536L)
        hist.unpersist()
        docs.filter(col("half") === "dep")
          .groupBy("source")
          .agg(count(lit(1)).as("n_dep"), sum("y").as("n_dep_pos"),
            sum(when(col("z") >= tau, 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("y") === 1L && col("z") >= tau, 1L)
              .otherwise(0L)).as("kept_pos"))
          .select(col("source"), lit(n).as("n_cal_pos"),
            lit(tau).as("tau_e6"), col("n_dep"), col("n_dep_pos"),
            col("n_kept"), col("kept_pos"),
            floorDivL(col("kept_pos") * 10000L,
              greatest(col("n_dep_pos"), lit(1L))).as("recall_e4"),
            floorDivL(col("n_kept") * 10000L, col("n_dep"))
              .as("keep_rate_e4"))
          .orderBy("source")
      },
      Some(s"""WITH $QcScoreSql,
              |yl AS (SELECT doc_id,
              |  CASE WHEN len(list_distinct(string_split(text, ' '))) * 2
              |         >= len(string_split(text, ' '))
              |       AND len(string_split(text, ' ')) >= 10
              |    THEN 1 ELSE 0 END AS y
              |  FROM documents),
              |d AS (SELECT sc.doc_id, sc.source, sc.z, yl.y,
              |  CASE WHEN ('0x' || substring(md5(CAST(sc.doc_id AS VARCHAR)),
              |    1, 15))::BIGINT % 100 < 50 THEN 'cal' ELSE 'dep' END AS half
              |  FROM sc JOIN yl USING (doc_id)),
              |hist AS (SELECT z, COUNT(*) AS c FROM d
              |         WHERE half = 'cal' AND y = 1 GROUP BY 1),
              |n1 AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM hist),
              |kk AS (SELECT GREATEST(1, (n + 1) // 10) AS k FROM n1),
              |cum AS (SELECT z, SUM(c) OVER (ORDER BY z) AS cum FROM hist),
              |tau AS (SELECT MIN(z) AS t FROM cum, kk WHERE cum >= kk.k)
              |SELECT source,
              |  (SELECT n FROM n1) AS n_cal_pos,
              |  (SELECT CAST(t AS BIGINT) FROM tau) AS tau_e6,
              |  CAST(COUNT(*) AS BIGINT) AS n_dep,
              |  CAST(SUM(y) AS BIGINT) AS n_dep_pos,
              |  CAST(SUM(CASE WHEN z >= (SELECT t FROM tau)
              |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
              |  CAST(SUM(CASE WHEN y = 1 AND z >= (SELECT t FROM tau)
              |    THEN 1 ELSE 0 END) AS BIGINT) AS kept_pos,
              |  (CAST(SUM(CASE WHEN y = 1 AND z >= (SELECT t FROM tau)
              |    THEN 1 ELSE 0 END) AS BIGINT) * 10000)
              |    // GREATEST(CAST(SUM(y) AS BIGINT), 1) AS recall_e4,
              |  (CAST(SUM(CASE WHEN z >= (SELECT t FROM tau)
              |    THEN 1 ELSE 0 END) AS BIGINT) * 10000)
              |    // CAST(COUNT(*) AS BIGINT) AS keep_rate_e4
              |FROM d WHERE half = 'dep' GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ------------------------------------------------------------------
    // q_langid_train ★ (new r15, r14 verdict #3) — the LEARNED
    // language-ID stage (q_text_lang_id is marker-word scoring — a
    // fixture probe; production lang-ID is a fastText-style
    // hashed-feature linear classifier, Joulin et al. 2017):
    // [[langIdTrainCore]] trains K one-vs-rest binary classifiers over
    // the shared qcDim hashed-token features (q_feature_hash's scheme)
    // with the exact rational-fast-sigmoid descent of q_quality_train
    // (zero init, 2/S smoothness step, [[LangIdSteps]] full-batch
    // steps — every distributed sum a commutative long sum, the
    // per-doc residual bit-identical across engines by the qcResidE6
    // operand-tree argument). Declared output: the final model
    // (lang, dim, w_e6), dim −1 = bias — K×257 rows, the artifact a
    // filtering run ships. MATERIALIZED per corpus ([[langIdModel]],
    // the CorpusTable seam) and shared with q_langid_apply: training
    // runs ONCE per corpus however many consumers read it.
    // HONESTY NOTE: the shipped corpus's lang column is a pure LABEL
    // (the generator writes all-English text), so on those docs the
    // learned table collapses toward the majority-class prior — the
    // spec proves real learning on a planted corpus whose text DOES
    // carry per-lang token signal (diagonal confusion dominance).
    // r16 (r15 verdict #4): the row's input is now corpus ∪ the
    // [[TextFixture]] per-lang-vocabulary docs in BOTH engines
    // ([[langIdInput]] / the ldocs CTE), so the driver's
    // oracle-checked eval shows that diagonal dominance LIVE on the
    // planted langs alongside the honest corpus collapse.
    // Scale: one corpus pass builds the (doc, dim, count) statistics
    // frame; each step is statistics-sized (all K classes as agg
    // columns — no K× re-scan); the model is K×257 longs at rest.
    QueryDef(
      "q_langid_train",
      (s: SparkSession, dir: String) =>
        langIdModel(s, dir).orderBy("lang", "dim"),
      Some(s"""WITH $langIdSql
              |SELECT lang, CAST(d AS INTEGER) AS dim, CAST(w AS BIGINT) AS w_e6
              |FROM lw$LangIdSteps ORDER BY 1, 2""".stripMargin)),

    // ------------------------------------------------------------------
    // q_langid_apply ★ (new r15) — the APPLY + EVAL of the learned
    // lang-ID model: score every doc against all K classes from the
    // AT-REST [[langIdModel]] (zero retraining — the q_bpe_encode
    // composition rule, pinned by the langIdTrainRuns counter in
    // TextSpec), predict argmax (ties broken toward the smaller lang
    // string — deterministic in both engines), and emit the per-lang
    // EVAL table vs the fixture's lang column: support, predicted
    // count, correct count, precision/recall in e4 (the confusion
    // matrix's row/column sums plus its diagonal — what a curation run
    // reads before trusting the router).
    // Plan: the (doc, dim, count) statistics frame joins the
    // BROADCAST model (K×256 rows) → (doc, lang) score agg → per-DOC
    // rank window (K rows per partition, never global) → two ≤K-group
    // aggs. At 100 TB the scoring pass is one scan + one doc-keyed
    // shuffle; the model rides as a broadcast exactly like production
    // fastText weights.
    QueryDef(
      "q_langid_apply",
      (s: SparkSession, dir: String) => {
        import org.apache.spark.sql.expressions.Window
        val model = langIdModel(s, dir)
        val docs = langIdInput(s, dir)
        val cnt = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tk"))
          .select(col("doc_id"), qcDim(col("tk")).cast("int").as("d"))
          .groupBy("doc_id", "d").agg(count(lit(1)).as("c"))
        val wt = model.filter(col("dim") >= 0)
          .select(col("lang"), col("dim").as("d"), col("w_e6"))
        val bias = model.filter(col("dim") === -1)
          .select(col("lang"), col("w_e6").as("b"))
        val z = cnt.join(broadcast(wt), "d")
          .groupBy("doc_id", "lang")
          .agg(sum(col("c") * col("w_e6")).as("zs"))
          .join(broadcast(bias), "lang")
          .select(col("doc_id"), col("lang"), (col("zs") + col("b")).as("z"))
        val rk = Window.partitionBy("doc_id")
          .orderBy(col("z").desc, col("lang"))
        val pred = z.withColumn("rn", row_number().over(rk))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("lang").as("pred"))
        val j = docs.select(col("doc_id"), col("lang")).join(pred, "doc_id")
        val t = j.groupBy("lang")
          .agg(count(lit(1)).as("n_true"),
            sum(when(col("pred") === col("lang"), 1L).otherwise(0L))
              .as("n_correct"))
        val p = j.groupBy(col("pred").as("lang"))
          .agg(count(lit(1)).as("n_pred"))
        t.join(p, Seq("lang"), "left")
          .select(col("lang"), col("n_true"),
            coalesce(col("n_pred"), lit(0L)).as("n_pred"), col("n_correct"),
            floorDivL(col("n_correct") * 10000L,
              greatest(coalesce(col("n_pred"), lit(0L)), lit(1L)))
              .as("precision_e4"),
            floorDivL(col("n_correct") * 10000L, col("n_true"))
              .as("recall_e4"))
          .orderBy("lang")
      },
      Some(s"""WITH $langIdSql,
              |az AS (SELECT w.lang, cnt.doc_id,
              |  CAST(SUM(cnt.c * w.w) AS BIGINT) AS zs
              |  FROM cnt JOIN lw$LangIdSteps w ON cnt.d = w.d GROUP BY 1, 2),
              |asc2 AS (SELECT z.doc_id, z.lang, z.zs + b.w AS z
              |  FROM az z JOIN lw$LangIdSteps b
              |    ON b.lang = z.lang AND b.d = -1),
              |pr AS (SELECT doc_id, lang AS pred FROM (
              |  SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY doc_id
              |    ORDER BY z DESC, lang) AS rn FROM asc2)
              |  WHERE rn = 1),
              |jj AS (SELECT d.doc_id, d.lang, pr.pred
              |  FROM ldocs d JOIN pr USING (doc_id)),
              |tt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_true,
              |  CAST(SUM(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_correct
              |  FROM jj GROUP BY 1),
              |pp AS (SELECT pred AS lang, CAST(COUNT(*) AS BIGINT) AS n_pred
              |  FROM jj GROUP BY 1)
              |SELECT tt.lang, tt.n_true,
              |  CAST(COALESCE(pp.n_pred, 0) AS BIGINT) AS n_pred,
              |  tt.n_correct,
              |  (tt.n_correct * 10000)
              |    // GREATEST(CAST(COALESCE(pp.n_pred, 0) AS BIGINT), 1)
              |    AS precision_e4,
              |  (tt.n_correct * 10000) // tt.n_true AS recall_e4
              |FROM tt LEFT JOIN pp ON tt.lang = pp.lang
              |ORDER BY 1""".stripMargin)),

    // ------------------------------------------------------------------
    // q_gopher_rules ★ (new r15) — the CLASSIC rule-based quality
    // battery (Gopher, Rae et al. 2021 §A1.1; reused by MassiveText /
    // RefinedWeb / Dolma): seven document gates at the paper's REAL
    // thresholds —
    //   1. word count ∈ [50, 100000];
    //   2. mean word length ∈ [3, 10] chars;
    //   3. symbol-to-word ratio ('#', '…') ≤ 0.1;
    //   4. ≤ 90% of lines start with a bullet ('- ', '* ', '•');
    //   5. ≤ 30% of lines end with an ellipsis ('…' or '...');
    //   6. ≥ 80% of words contain ≥ 1 alphabetic character;
    //   7. ≥ 2 distinct of {the, be, to, of, and, that, have, with}.
    // Declared output: the per-source RULE FUNNEL (docs failing each
    // rule, docs passing all, pass rate) — the table a curation run
    // reads to see WHICH rule is doing the filtering on each source.
    // On the synthetic corpus the stopword rule rejects everything —
    // the battery working as designed on non-natural text (the
    // honesty-note pattern of q_langid_train). r16 (r15 verdict #4):
    // the input is now corpus ∪ the [[TextFixture]] planted natural
    // docs in BOTH engines — one source per rule failing exactly that
    // rule plus a passing natural-English source — so the driver's
    // oracle-checked funnel is live with mixed rule failures, not
    // only the all-fail collapse; TextSpec additionally pins the
    // per-rule exactness on an isolated corpus.
    // Exactness: every ratio threshold is an integer cross-
    // multiplication (3·wc ≤ chars ≤ 10·wc; 10·nsym ≤ wc;
    // 10·nbullet ≤ 9·nlines; 10·nell ≤ 3·nlines; 5·nalpha ≥ 4·wc) —
    // no division anywhere. Plan: one map-only pass of per-doc
    // bounded folds (line/token predicates over the doc's own
    // arrays), then a ≤|sources|-group agg; at 100 TB this is a
    // scan-speed stage exactly like qcScoreE6.
    QueryDef(
      "q_gopher_rules",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        val t = split(col("text"), " ")
        val lines = split(col("text"), "\n")
        val stop = array(Seq("the", "be", "to", "of", "and", "that",
          "have", "with").map(lit(_)): _*)
        // corpus + the TextFixture planted natural docs (r16): the
        // declared funnel now shows one source per rule failing
        // exactly that rule and a passing source, live in the oracle
        val base = Tables(s, dir, "documents")
          .select(col("source"), col("text"))
          .unionByName(TextFixture.gopherDocs.toDF("source", "text"))
        val d = base.select(col("source"),
          size(t).cast("long").as("wc"),
          length(translate(col("text"), " ", "")).cast("long").as("chars"),
          (length(col("text")) - length(translate(col("text"), "#…", "")))
            .cast("long").as("nsym"),
          size(lines).cast("long").as("nlines"),
          size(filter(lines, x => x.startsWith("- ") || x.startsWith("* ")
            || x.startsWith("•"))).cast("long").as("nbullet"),
          size(filter(lines, x => x.endsWith("…") || x.endsWith("...")))
            .cast("long").as("nell"),
          size(filter(t, x => x.rlike("[a-zA-Z]"))).cast("long").as("nalpha"),
          size(array_intersect(array_distinct(t), stop)).cast("long")
            .as("nstop"))
        val f = d.select(col("source"),
          when(col("wc") >= 50L && col("wc") <= 100000L, 0L).otherwise(1L)
            .as("f_wc"),
          when(col("chars") >= col("wc") * 3L &&
            col("chars") <= col("wc") * 10L, 0L).otherwise(1L).as("f_mwl"),
          when(col("nsym") * 10L <= col("wc"), 0L).otherwise(1L).as("f_sym"),
          when(col("nbullet") * 10L <= col("nlines") * 9L, 0L).otherwise(1L)
            .as("f_bullet"),
          when(col("nell") * 10L <= col("nlines") * 3L, 0L).otherwise(1L)
            .as("f_ell"),
          when(col("nalpha") * 5L >= col("wc") * 4L, 0L).otherwise(1L)
            .as("f_alpha"),
          when(col("nstop") >= 2L, 0L).otherwise(1L).as("f_stop"))
        val fails = Seq("f_wc", "f_mwl", "f_sym", "f_bullet", "f_ell",
          "f_alpha", "f_stop")
        val aggs = count(lit(1)).as("n_docs") +:
          fails.map(c => sum(col(c)).as(s"n_$c")) :+
          sum("pass").as("n_pass")
        f.withColumn("pass",
            when(fails.map(col(_) === 0L).reduce(_ && _), 1L).otherwise(0L))
          .groupBy("source")
          .agg(aggs.head, aggs.tail: _*)
          .select(col("source") +: col("n_docs") +:
            fails.map(c => col(s"n_$c")) :+ col("n_pass") :+
            floorDivL(col("n_pass") * 10000L, col("n_docs"))
              .as("pass_rate_e4"): _*)
          .orderBy("source")
      },
      Some(s"""WITH gdocs AS (SELECT source, text FROM documents
             |  UNION ALL ${TextFixture.gopherSqlRows}),
             |d AS (
             |  SELECT source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS wc,
             |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS chars,
             |    CAST(length(text) - length(replace(replace(text, '#', ''),
             |      '…', '')) AS BIGINT) AS nsym,
             |    CAST(len(string_split(text, chr(10))) AS BIGINT) AS nlines,
             |    CAST(len(list_filter(string_split(text, chr(10)),
             |      x -> starts_with(x, '- ') OR starts_with(x, '* ')
             |        OR starts_with(x, '•'))) AS BIGINT) AS nbullet,
             |    CAST(len(list_filter(string_split(text, chr(10)),
             |      x -> ends_with(x, '…') OR ends_with(x, '...')))
             |      AS BIGINT) AS nell,
             |    CAST(len(list_filter(string_split(text, ' '),
             |      x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS nalpha,
             |    CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
             |      ['the','be','to','of','and','that','have','with']))
             |      AS BIGINT) AS nstop
             |  FROM gdocs),
             |f AS (
             |  SELECT source,
             |    CASE WHEN wc >= 50 AND wc <= 100000 THEN 0 ELSE 1 END AS f_wc,
             |    CASE WHEN chars >= wc * 3 AND chars <= wc * 10
             |      THEN 0 ELSE 1 END AS f_mwl,
             |    CASE WHEN nsym * 10 <= wc THEN 0 ELSE 1 END AS f_sym,
             |    CASE WHEN nbullet * 10 <= nlines * 9 THEN 0 ELSE 1 END
             |      AS f_bullet,
             |    CASE WHEN nell * 10 <= nlines * 3 THEN 0 ELSE 1 END AS f_ell,
             |    CASE WHEN nalpha * 5 >= wc * 4 THEN 0 ELSE 1 END AS f_alpha,
             |    CASE WHEN nstop >= 2 THEN 0 ELSE 1 END AS f_stop
             |  FROM d)
             |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(f_wc) AS BIGINT) AS n_f_wc,
             |  CAST(SUM(f_mwl) AS BIGINT) AS n_f_mwl,
             |  CAST(SUM(f_sym) AS BIGINT) AS n_f_sym,
             |  CAST(SUM(f_bullet) AS BIGINT) AS n_f_bullet,
             |  CAST(SUM(f_ell) AS BIGINT) AS n_f_ell,
             |  CAST(SUM(f_alpha) AS BIGINT) AS n_f_alpha,
             |  CAST(SUM(f_stop) AS BIGINT) AS n_f_stop,
             |  CAST(SUM(CASE WHEN f_wc + f_mwl + f_sym + f_bullet + f_ell
             |    + f_alpha + f_stop = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
             |  (CAST(SUM(CASE WHEN f_wc + f_mwl + f_sym + f_bullet + f_ell
             |    + f_alpha + f_stop = 0 THEN 1 ELSE 0 END) AS BIGINT) * 10000)
             |    // CAST(COUNT(*) AS BIGINT) AS pass_rate_e4
             |FROM f GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ------------------------------------------------------------------
    // q_collocation_pmi ★ — top-50 two-word collocations ranked by
    // pointwise mutual information: phrases whose words co-occur far
    // more than their individual frequencies predict (the phrase-mining
    // signal behind tokenizer merges and stop-phrase lists — raw
    // frequency ranks "of the" first; PMI ranks actual collocations).
    // ENGINE-EXACT ranking: PMI = log(c_ab·N / (c_a·c_b)) is replaced
    // by the raw ratio in e6 units — log is monotone, so the ORDER is
    // identical and the score stays in exact integer arithmetic:
    //   score_e6 = (c_ab · N · 1e6) div (c_a · c_b),
    // with c_a,c_b = corpus token counts, N = corpus bigram count, and
    // a classic min-support c_ab ≥ 5 (PMI is noise-dominated on rare
    // pairs). Headroom: c_ab·N·1e6 needs c_ab·N < 9.2e12 — fine per
    // shard; a 1e13-token corpus ranks with the two-step
    // divTrunc(divTrunc(c_ab·1e6, c_a)·N, c_b) instead (same order
    // per-pair only approximately, so at that scale the exact form
    // runs on HUGEINT-capable engines or per-shard).
    // Plan: two corpus-linear explodes (tokens, codegen'd 2-shingles),
    // two hash aggs (map-side combine), then joins keyed on the token
    // — vocabulary-sized inputs, Zipf-concentrated but the ≥5 filter
    // runs BEFORE the joins so the joined stream is the collocation
    // candidates only; N rides in as a 1-row broadcast. Top-50 is
    // TakeOrderedAndProject (per-partition heaps, no global sort).
    QueryDef(
      "q_collocation_pmi",
      (s: SparkSession, dir: String) => {
        import graft.functions.Shingles.shinglesAll
        val docs = Tables(s, dir, "documents")
        val uc = docs.select(explode(toks).as("w"))
          .groupBy("w").agg(count(lit(1)).as("cw"))
        val bgc = docs.select(explode(shinglesAll(toks, 2)).as("bg"))
          .groupBy("bg").agg(count(lit(1)).as("cab"))
          .withColumn("w1", substring_index(col("bg"), " ", 1))
          .withColumn("w2", substring_index(col("bg"), " ", -1))
        val nb = bgc.agg(sum("cab").as("nb"))
        bgc.filter(col("cab") >= 5L)
          .join(uc.select(col("w").as("w1"), col("cw").as("c1")), "w1")
          .join(uc.select(col("w").as("w2"), col("cw").as("c2")), "w2")
          .crossJoin(broadcast(nb))
          .select(col("w1"), col("w2"), col("cab"),
            floorDivL(col("cab") * col("nb") * 1000000L,
              col("c1") * col("c2")).as("score_e6"))
          .orderBy(col("score_e6").desc, col("w1"), col("w2"))
          .limit(50)
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
             |uc AS (
             |  SELECT w, COUNT(*) AS cw FROM (
             |    SELECT unnest(ts) AS w FROM t) GROUP BY 1),
             |bgc AS (
             |  SELECT bg, COUNT(*) AS cab FROM (
             |    SELECT unnest(list_transform(range(1, len(ts)),
             |      i -> array_to_string(ts[i:i+1], ' '))) AS bg
             |    FROM t) GROUP BY 1),
             |n AS (SELECT CAST(SUM(cab) AS BIGINT) AS nb FROM bgc),
             |sc AS (
             |  SELECT string_split(bg, ' ')[1] AS w1,
             |    string_split(bg, ' ')[2] AS w2, cab,
             |    (cab * nb * 1000000) // (u1.cw * u2.cw) AS score_e6
             |  FROM bgc CROSS JOIN n
             |  JOIN uc u1 ON string_split(bg, ' ')[1] = u1.w
             |  JOIN uc u2 ON string_split(bg, ' ')[2] = u2.w
             |  WHERE cab >= 5)
             |SELECT w1, w2, cab, score_e6 FROM sc
             |ORDER BY score_e6 DESC, w1, w2 LIMIT 50""".stripMargin)),

    // ------------------------------------------------------------------
    // q_chunk_overlap ★ (new r5) — retrieval/RAG chunking: split every
    // document into fixed 16-token chunks on a 12-token stride (4-token
    // overlap so no boundary sentence is lost to a chunk edge), each
    // chunk carrying its doc, position, token count, and an md5
    // fingerprint of its joined text — the chunk table an embedding or
    // retrieval index is built FROM, and the op that turns a document
    // corpus into training-window units. Map-only per doc: starts =
    // sequence(0, n−1, stride) explode (≤ ⌈n/stride⌉ rows per doc, so
    // the dilation is bounded by chunk geometry, not corpus size), then
    // codegen'd slice + concat — no shuffle anywhere except the final
    // oracle sort; at 100 TB this runs as a pure scan→project→write.
    // The trailing chunks are allowed to be short (start < n always
    // yields ≥1 token); chunk_id = start/stride is dense per doc.
    QueryDef(
      "q_chunk_overlap",
      (s: SparkSession, dir: String) => {
        val chunk = 16
        val stride = 12
        Tables(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("ts"))
          .withColumn("start",
            explode(sequence(lit(0), size(col("ts")) - 1, lit(stride))))
          .select(col("doc_id"),
            (col("start") / stride).cast("int").as("chunk_id"),
            col("start"),
            size(slice(col("ts"), col("start") + 1, lit(chunk)))
              .as("n_toks"),
            md5(concat_ws(" ", slice(col("ts"), col("start") + 1, lit(chunk))))
              .as("chunk_md5"))
          .orderBy("doc_id", "chunk_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
             |s AS (
             |  SELECT doc_id, ts,
             |    unnest(range(0, len(ts), 12)) AS start
             |  FROM t)
             |SELECT doc_id,
             |  CAST(start // 12 AS INTEGER) AS chunk_id,
             |  CAST(start AS INTEGER) AS start,
             |  CAST(len(ts[start+1:start+16]) AS INTEGER) AS n_toks,
             |  md5(array_to_string(ts[start+1:start+16], ' ')) AS chunk_md5
             |FROM s ORDER BY doc_id, chunk_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_vocab_growth ★ (new r5) — vocabulary-growth (Heaps-law) curve:
    // how many DISTINCT bigrams the corpus has accumulated by each
    // tenth of the ingest order — the statistic that says whether a
    // corpus is still contributing novelty or has gone repetitive
    // (rising curve → keep ingesting; flat → more data buys no new
    // vocabulary), and the empirical input to tokenizer-vocab sizing.
    // The unit is the 2-gram (the unigram vocabulary here saturates in
    // the first segment — a flat 1-row curve; bigrams decay 851 → 2
    // across segments at sf0.01, a live Heaps tail). Scalable form: a
    // prefix-distinct is NOT computed per prefix (that's 10 corpus
    // scans) and needs NO corpus-wide window — each bigram's
    // FIRST-occurrence doc (one vocabulary-sized min agg) fully
    // determines every prefix count, so the curve is a ≤10-row
    // cumulative sum over per-segment first-occurrence counts.
    // Segments are equal-width doc_id ranges (≡ equal-count when ids
    // are dense, as here; an id-sparse corpus would swap in the
    // q_percentile index formula). Plan: one corpus-linear codegen'd
    // shingle explode → vocab-sized agg, one 1-row max broadcast, a
    // ≤10-row window.
    QueryDef(
      "q_vocab_growth",
      (s: SparkSession, dir: String) => {
        import graft.functions.ExactMath
        import graft.functions.Shingles.shinglesAll
        val docs = Tables(s, dir, "documents")
        val mx = docs.agg(max("doc_id").as("mx"))
        val firstDoc = docs
          .select(col("doc_id"), explode(shinglesAll(toks, 2)).as("w"))
          .groupBy("w").agg(min("doc_id").as("fd"))
        firstDoc.crossJoin(broadcast(mx))
          .select(ExactMath.divTrunc(col("fd") * 10L, col("mx") + 1L).as("k"))
          .groupBy("k").agg(count(lit(1)).as("new_tokens"))
          .withColumn("vocab_size",
            sum("new_tokens").over(
              org.apache.spark.sql.expressions.Window.orderBy("k")
                .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .orderBy("k")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
             |fd AS (
             |  SELECT w, MIN(doc_id) AS fd FROM (
             |    SELECT doc_id, unnest(list_transform(range(1, len(ts)),
             |      i -> array_to_string(ts[i:i+1], ' '))) AS w
             |    FROM t) GROUP BY 1),
             |mx AS (SELECT MAX(doc_id) AS mx FROM documents),
             |g AS (
             |  SELECT (fd * 10) // (mx + 1) AS k, COUNT(*) AS new_tokens
             |  FROM fd, mx GROUP BY 1)
             |SELECT CAST(k AS BIGINT) AS k, new_tokens,
             |  CAST(SUM(new_tokens) OVER (ORDER BY k
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |    AS vocab_size
             |FROM g ORDER BY k""".stripMargin)),

    // ------------------------------------------------------------------
    // q_skipgram ★ (new r5) — WINDOWED co-occurrence counts (skip-gram
    // context window ±2), the table word2vec/GloVe-style embedding
    // training actually consumes: q_text_cooccur counts "both tokens
    // somewhere in the same document" (topical affinity); this counts
    // "within 2 positions of each other" (syntactic/phrase affinity) —
    // the two matrices answer different questions and a pipeline
    // building embeddings needs the positional one. Pairs are
    // canonicalized (t1 < t2, both directions folded) and weighted by
    // occurrence count, not document count. Plan (r17 optimization —
    // guide §2.3/2.4 "aggregate before you shuffle / remove shuffles"):
    // the window is a CONSTANT (±2), so the (t[i], t[i+d]) pair stream
    // is generated MAP-SIDE from each document's own token array with
    // one codegen'd transform — no position table, no doc_id-keyed
    // self-join (the pre-r17 plan shuffled the posexploded corpus
    // twice and joined it to itself; same multiset of pairs, two
    // exchanges more). The pairs flow straight into the (t1, t2) hash
    // agg with map-side partial aggregation; per-doc work stays
    // ∝ doc_len·window, deterministic top-50. The inner IF guards the
    // j index so a tail token emits only its in-bounds pairs (and the
    // sequence(1, size) over an EMPTY array descends harmlessly into
    // rows the filter discards — the q_bpe_pairs trap, defused by the
    // j-bound rather than by a size gate).
    QueryDef(
      "q_skipgram",
      (s: SparkSession, dir: String) => {
        Tables(s, dir, "documents")
          .select(split(col("text"), " ").as("ts"))
          .select(explode(expr(
            "flatten(transform(sequence(1, size(ts)), i -> " +
              "filter(transform(array(i+1, i+2), j -> " +
              "IF(j <= size(ts), named_struct('ta', ts[i-1], 'tb', ts[j-1]), " +
              "CAST(NULL AS STRUCT<ta: STRING, tb: STRING>))), " +
              "x -> x IS NOT NULL)))")).as("pr"))
          .select(least(col("pr.ta"), col("pr.tb")).as("t1"),
            greatest(col("pr.ta"), col("pr.tb")).as("t2"))
          .filter(col("t1") =!= col("t2"))
          .groupBy("t1", "t2").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("t1"), col("t2"))
          .limit(50)
      },
      Some("""WITH p AS (
             |  SELECT doc_id, u.t AS t, u.p AS p FROM (
             |    SELECT doc_id, unnest(list_transform(range(len(ts)),
             |      i -> {'p': i, 't': ts[CAST(i + 1 AS INTEGER)]})) AS u
             |    FROM (SELECT doc_id, string_split(text, ' ') AS ts
             |          FROM documents))),
             |pairs AS (
             |  SELECT LEAST(a.t, b.t) AS t1, GREATEST(a.t, b.t) AS t2
             |  FROM p a JOIN p b
             |    ON a.doc_id = b.doc_id AND b.p > a.p AND b.p <= a.p + 2
             |  WHERE a.t != b.t)
             |SELECT t1, t2, COUNT(*) AS n
             |FROM pairs GROUP BY 1, 2
             |ORDER BY n DESC, t1, t2 LIMIT 50""".stripMargin)),

    // ------------------------------------------------------------------
    // q_doc_novelty ★ (new r5) — per-document NOVELTY in ingest order:
    // what fraction of a doc's distinct bigrams appear here for the
    // FIRST time (no earlier doc_id contains them) — the doc-level form
    // of q_vocab_growth's corpus curve, and the curation signal that
    // ranks an incoming drop by marginal contribution (a doc with 2%
    // novel n-grams is a near-duplicate of the corpus even when no
    // single pair-dedup fires; conversely early docs score high by
    // construction). Same scalable trick as the curve: each bigram's
    // first-occurrence doc comes from ONE vocabulary-sized min agg —
    // never a per-doc prefix scan — joined back to the per-doc distinct
    // bigram stream; novelty is exact integer e4. Plan: one codegen'd
    // shingle explode → distinct, one vocab agg, one vocab-keyed join,
    // one doc agg. Docs shorter than 2 tokens have no bigrams and are
    // absent (documented; the fixture has none).
    QueryDef(
      "q_doc_novelty",
      (s: SparkSession, dir: String) => {
        import graft.functions.Shingles.shingles
        // r17 optimization: `shingles` already dedups per doc, so
        // (doc_id, bg) rows are unique by construction — the former
        // global .distinct() was a full extra exchange for nothing —
        // and first_doc is a min window over the bg partition, folding
        // the former agg + join-back (two more exchanges of the
        // bigram stream) into the one bg-keyed shuffle.
        val w = org.apache.spark.sql.expressions.Window.partitionBy("bg")
        Tables(s, dir, "documents")
          .select(col("doc_id"),
            explode(shingles(toks, 2)).as("bg"))
          .withColumn("first_doc", min("doc_id").over(w))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
              .as("n_novel"))
          .select(col("doc_id"), col("n_bigrams"), col("n_novel"),
            floorDivL(col("n_novel") * 10000L, col("n_bigrams")).as("novelty_e4"))
          .orderBy("doc_id")
      },
      Some("""WITH bg AS (
             |  SELECT DISTINCT doc_id, unnest(list_distinct(list_transform(
             |    range(1, len(string_split(text,' '))),
             |    i -> array_to_string(string_split(text,' ')[i:i+1], ' ')))) AS bg
             |  FROM documents WHERE len(string_split(text,' ')) >= 2),
             |f AS (SELECT bg, MIN(doc_id) AS first_doc FROM bg GROUP BY 1)
             |SELECT bg.doc_id, COUNT(*) AS n_bigrams,
             |  CAST(SUM(CASE WHEN f.first_doc = bg.doc_id THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_novel,
             |  CAST((SUM(CASE WHEN f.first_doc = bg.doc_id THEN 1 ELSE 0 END)
             |    * 10000) // COUNT(*) AS BIGINT) AS novelty_e4
             |FROM bg JOIN f ON bg.bg = f.bg
             |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_doc_sim_sparse ★ (new r5) — SPARSE document similarity: top-20
    // document pairs by exact-integer tf-idf dot product through an
    // inverted-index join — the sparse complement of the dense
    // q_embed_dedup_lsh path (near-dup by shared salient VOCABULARY
    // rather than by embedding geometry; the two catch different
    // duplicate classes and production pipelines run both). Pairs are
    // generated ONLY through shared terms, and a DF-CUT (df ≤
    // max(2, min(N/10, 100)) — the size-pruning insight of Bayardo et
    // al.'s all-pairs similarity: ubiquitous terms create quadratic
    // fan-out but contribute no discrimination) bounds every term's
    // pair fan-out at cut², keeping candidates ≤ cut · |postings| —
    // corpus-LINEAR because the cap is ABSOLUTE (the r5 N/10-only cut
    // made that bound Θ(N²); the r8 Heaps corpus measured it at 126×
    // for 10× data — see dfCutWeights). Weights are exact integers
    // (w = tf · (100N // df), floor-div idf — rank-equivalent rarity,
    // the q_tfidf log-free move), so dot products and norms are
    // engine-exact longs: w ≤ tf·100N/df ~ 1e6 here, norms ≤ doc_len·w²
    // ~ 2e14 — 64-bit-safe while tf·100·N < 9.2e14 per shard (the
    // q_tfidf headroom rule; a larger corpus drops the 100× idf scale).
    // Norms ride along so a consumer can normalize to cosine; ranking
    // by raw dot is the un-normalized retrieval score (the BM25 family
    // convention). Plan: one (doc, term) tf agg, one vocab-sized df
    // agg, df-cut postings persisted once and reused by both join
    // sides + norms, per-term equi-join, one (a, b) hash agg,
    // TakeOrderedAndProject top-20 under a total order.
    QueryDef(
      "q_doc_sim_sparse",
      (s: SparkSession, dir: String) => {
        val wgt = dfCutWeights(Tables(s, dir, "documents"))
        val norms = wgt.groupBy("doc_id").agg(sum(col("w") * col("w")).as("nrm"))
        wgt.as("a")
          .join(wgt.as("b"),
            col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("n_shared"),
            sum(col("a.w") * col("b.w")).as("dot"))
          .join(norms.withColumnRenamed("doc_id", "doc_a")
            .withColumnRenamed("nrm", "norm_a"), "doc_a")
          .join(norms.withColumnRenamed("doc_id", "doc_b")
            .withColumnRenamed("nrm", "norm_b"), "doc_b")
          .select(col("doc_a"), col("doc_b"), col("n_shared"), col("dot"),
            col("norm_a"), col("norm_b"))
          .orderBy(col("dot").desc, col("doc_a"), col("doc_b"))
          .limit(20)
      },
      Some(s"""WITH $DfCutWeightsSql,
             |nrm AS (SELECT doc_id, SUM(w * w) AS nrm FROM w GROUP BY 1),
             |d AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    COUNT(*) AS n_shared, SUM(a.w * b.w) AS dot
             |  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT d.doc_a, d.doc_b, CAST(d.n_shared AS BIGINT) AS n_shared,
             |  CAST(d.dot AS BIGINT) AS dot,
             |  CAST(na.nrm AS BIGINT) AS norm_a, CAST(nb.nrm AS BIGINT) AS norm_b
             |FROM d JOIN nrm na ON d.doc_a = na.doc_id
             |       JOIN nrm nb ON d.doc_b = nb.doc_id
             |ORDER BY dot DESC, doc_a, doc_b LIMIT 20""".stripMargin)),

    // ------------------------------------------------------------------
    // q_pii_scrub ★ (new r5) — PII detection + redaction, the scrub
    // pass every training-data pipeline runs before anything else:
    // count and replace emails / IPv4s / phone-shaped numbers with
    // typed placeholders. Pure map-side (regex per row, no shuffle
    // until the mandated ORDER BY) — at 100 TB this runs at scan speed.
    // The synthetic documents fixture contains no PII by construction
    // (a detector that fires zero times proves nothing), so this row
    // runs on a GOLDEN VALUES fixture embedded identically in both
    // engines — what it pins cross-engine is the REGEX SEMANTICS
    // themselves (Java regex vs RE2: \b word boundaries, class
    // escapes, global replace, match precedence), which is exactly the
    // part of a scrubber that silently diverges between runtimes.
    // Patterns stay in the RE2-∩-Java-regex subset (no lookaround, no
    // backrefs) — the portable discipline a multi-engine pipeline
    // needs anyway.
    QueryDef(
      "q_pii_scrub",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        val phone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
        val rows = Seq(
          (1L, "contact bob.smith+spam@example.co.uk or call 555-123-4567 now"),
          (2L, "server at 10.0.0.1 and backup 192.168.255.254 port 8080"),
          (3L, "no pii here, just text with-dashes and dots. the end"),
          (4L, "a@b.io x@y.z 1.2.3.4 999-999-9999 overlap@test.com 5.6.7.8"),
          (5L, "edge: not-an-ip 1.2.3 phone 12-345-6789 mail @nope.com"))
        rows.toDF("id", "text")
          .select(col("id"),
            size(regexp_extract_all(col("text"), lit(email), lit(0))).cast("long").as("n_email"),
            size(regexp_extract_all(col("text"), lit(ip), lit(0))).cast("long").as("n_ip"),
            size(regexp_extract_all(col("text"), lit(phone), lit(0))).cast("long").as("n_phone"),
            regexp_replace(
              regexp_replace(
                regexp_replace(col("text"), email, "<EMAIL>"),
                ip, "<IP>"),
              phone, "<PHONE>").as("redacted"))
          .orderBy("id")
      },
      Some("""WITH t(id, text) AS (VALUES
             |  (1, 'contact bob.smith+spam@example.co.uk or call 555-123-4567 now'),
             |  (2, 'server at 10.0.0.1 and backup 192.168.255.254 port 8080'),
             |  (3, 'no pii here, just text with-dashes and dots. the end'),
             |  (4, 'a@b.io x@y.z 1.2.3.4 999-999-9999 overlap@test.com 5.6.7.8'),
             |  (5, 'edge: not-an-ip 1.2.3 phone 12-345-6789 mail @nope.com'))
             |SELECT CAST(id AS BIGINT) AS id,
             |  CAST(len(regexp_extract_all(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             |    AS n_email,
             |  CAST(len(regexp_extract_all(text,
             |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
             |  CAST(len(regexp_extract_all(text,
             |    '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phone,
             |  regexp_replace(regexp_replace(regexp_replace(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted
             |FROM t ORDER BY id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_normalize_unicode ★ (new r13) — the documented OPT-IN Unicode
    // mode of [[graft.functions.NormalizeText]] (r12 verdict #3):
    // code-point-level lowercase (Character.toLowerCase(int), the
    // locale-INdependent simple mapping), strip Unicode P*∪S*, fold Nd
    // digit runs, collapse isWhitespace∪isSpaceChar runs. The default
    // byte mode stays the engine's normalization (ASCII-exact, one
    // fixed-buffer pass); the modes agree byte-for-byte on pure-ASCII
    // input (NormalizeTextSpec pins that over the whole sf0.001
    // corpus). Cross-engine regex/ICU parity does NOT exist for these
    // semantics (DuckDB has no Character.getType), so — the q_pii_scrub
    // pattern — the oracle is a PINNED golden fixture: planted
    // non-ASCII variants (accents, NBSP/em spaces, smart quotes,
    // dashes, Turkish İ, Arabic-Indic digits, currency/math symbols,
    // CJK, Greek) against hand-derived expected outputs, identical
    // VALUES in both engines. What it pins is the normalization
    // SEMANTICS, the part that silently diverges between runtimes.
    QueryDef(
      "q_normalize_unicode",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        import graft.functions.NormalizeText.normalizeTextUnicode
        val rows = Seq(
          (1L, "Héllo, Wörld — v2.5!"),
          (2L, "“Smart” ‘quotes’ – and em spaces"),
          (3L, "İstanbul ŞEHİR ٤٢ km²"),
          (4L, "€99.99 ≠ ¥100 〜 50%"),
          (5L, "The QUICK   brown-fox 42!!"),
          (6L, "日本語 テスト 2024年"),
          (7L, "ΑΣΔ Σοφός"))
        rows.toDF("id", "raw")
          .select(col("id"), normalizeTextUnicode(col("raw")).as("norm"))
          .orderBy("id")
      },
      Some("""SELECT CAST(id AS BIGINT) AS id, norm FROM (VALUES
             |  (1, 'héllo wörld v0'),
             |  (2, 'smart quotes and em spaces'),
             |  (3, 'istanbul şehir 0 km²'),
             |  (4, '0 0 0'),
             |  (5, 'the quick brownfox 0'),
             |  (6, '日本語 テスト 0年'),
             |  (7, 'ασδ σοφός')) t(id, norm)
             |ORDER BY id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_vocab_oov ★ (new r5) — tokenizer VOCABULARY COVERAGE: freeze
    // the top-16 terms by corpus frequency (tie-break term asc — the
    // fixed vocab a tokenizer ships with; 16 against this fixture's
    // 31-term vocabulary so the OOV mass is LIVE at every SF, the
    // real-world analogue being a 32k vocab on an open-domain corpus)
    // and measure, per source, the
    // out-of-vocabulary token mass and distinct OOV type count — the
    // go/no-go metric for whether a tokenizer fits a corpus (high OOV
    // mass ⇒ excessive fragmentation / UNK flooding downstream).
    // Scale shape: term frequencies are one map-side-combined hash agg
    // on the term; the vocab cut is TakeOrderedAndProject (top-16 —
    // per-partition heaps + a 16-row driver merge, no global sort
    // shuffle); membership is a BROADCAST left join on the token
    // stream; the final per-source rollup is one agg. OOV ratio in
    // exact e4 (half-up integer division).
    QueryDef(
      "q_vocab_oov",
      (s: SparkSession, dir: String) => {
        import graft.functions.ExactMath
        val docs = Tables(s, dir, "documents")
        val tok = docs.select(col("source"), explode(toks).as("term"))
        val vocab = tok.groupBy("term").agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("term")).limit(16)
          .select(col("term"), lit(1L).as("in_v"))
        tok.join(broadcast(vocab), Seq("term"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"),
            countDistinct(when(col("in_v").isNull, col("term"))).as("n_oov_types"))
          .withColumn("oov_e4",
            ExactMath.divTrunc(col("n_oov") * 20000L + col("n_tokens"),
              col("n_tokens") * 2L))
          .orderBy("source")
      },
      Some("""WITH p AS (
             |  SELECT source, unnest(string_split(text, ' ')) AS term
             |  FROM documents),
             |f AS (SELECT term, COUNT(*) AS freq FROM p GROUP BY 1),
             |v AS (SELECT term FROM f ORDER BY freq DESC, term LIMIT 16),
             |t AS (
             |  SELECT p.source, p.term,
             |    CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
             |  FROM p LEFT JOIN v ON p.term = v.term)
             |SELECT source, COUNT(*) AS n_tokens,
             |  CAST(SUM(oov) AS BIGINT) AS n_oov,
             |  CAST(COUNT(DISTINCT CASE WHEN oov = 1 THEN term END) AS BIGINT)
             |    AS n_oov_types,
             |  CAST((SUM(oov) * 20000 + COUNT(*)) // (COUNT(*) * 2) AS BIGINT)
             |    AS oov_e4
             |FROM t GROUP BY source ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q_bm25 ★ (new r11) — BM25 document ranking, the canonical lexical
    // retrieval scorer (Robertson & Sparck Jones' Okapi BM25): the five
    // benchmark query documents (doc_id < 5, mirroring the similarity
    // family's fixed vec_id < 5 query set) each retrieve their top-10
    // most-relevant OTHER documents. This is the ranker q_tfidf's raw
    // salience is not: BM25 SATURATES term frequency (k1) and
    // normalizes by document length (b) — the two effects that make it
    // the default lexical baseline every hybrid-retrieval stack (and
    // q_hybrid_rrf in miniature) fuses against.
    // ENGINE-EXACT integer scoring, same discipline as q_tfidf: with
    // k1 = 6/5 and b = 3/4 (the standard 1.2/0.75 as exact rationals),
    // avgdl = T/D (T corpus tokens, D docs) kept as a fraction, the
    // per-(term, doc) saturated tf weight
    //   tf·(k1+1) / (tf + k1(1−b) + k1·b·dl/avgdl)
    // multiplies out to the all-integer 22·T·tf / (10·T·tf + 3·T +
    // 9·dl·D), exported in e4; the log idf is replaced by the raw
    // rarity ratio D/df (monotone-equivalent per term, the q_tfidf
    // substitution), composed as a second floor-div. The summed score
    //   Σ_t (tfnorm_e4(t,d) · D) // df(t)
    // is a pure integer function of counts — bit-identical in any
    // engine. Headroom: 22·T·tf·1e4 needs T·tf < 4.2e13 — ample per
    // shard; a 1e13-token corpus scores per-shard or drops the shared
    // 1e4 scale to 1e2.
    // NO df-cut, deliberately: BM25's idf already crushes common terms
    // (D/df → 1), and on this fixture's 31-word closed vocabulary a
    // Bayardo-style cut (see dfCutWeights) removes EVERY query term —
    // the degenerate case the cut's own scaladoc documents.
    // CANDIDATE ENUMERATION (r16, r15 verdict #5) is now MaxScore /
    // impact-ordered pruning (Turtle & Flood 1995; the block-max
    // family's one-block-per-list base case), EXACT by construction —
    // see [[bm25Candidates]]: per-term max-impact upper bounds + the
    // top-10 impact-ordered HEAD BLOCK of every posting list (block
    // METADATA, ≤ |query terms|·10 rows — ledger-sized, held at the
    // query node exactly as production WAND holds it), a per-query
    // floor θ = the 10th-best single-posting lower bound over the
    // head docs, then the ascending-UB prefix-sum term split — docs
    // containing only non-essential terms score < θ and are never
    // enumerated. The unpruned candidate bound Σ_{t∈q} df(t) shrinks
    // to Σ_{t essential} df(t): on zipfian text the common terms are
    // exactly the non-essential ones, so the scan drops to the rare
    // tail's postings (TextSpec measures the reduction on a planted
    // zipf corpus and pins result equality pruned-vs-unpruned; the
    // DuckDB oracle below stays the UNPRUNED scorer, so this row is
    // hash-green iff the pruning is exact). On this closed-vocabulary
    // fixture every doc holds every term and the split honestly keeps
    // everything essential — the degenerate no-win case, documented.
    // Plan: tf/df/dl are the inverted-index aggregations (map-side
    // combined); T and D ride in as 1-row broadcasts; ub/heads are
    // term-keyed index tables; candidates come from the ESSENTIAL
    // query-term equi-join; per-(q, d) accumulation is one hash agg;
    // top-10 is the heapTopKLong per-partition pre-reduce (the
    // Long-payload twin — scores rank exactly at ANY magnitude, no
    // 2^53 double-precision assumption) + a window over the
    // ≤ k·partitions survivors — the corpus is never globally sorted.
    QueryDef(
      "q_bm25",
      (s: SparkSession, dir: String) => {
        val (weights, qterms, heads) = bm25Parts(s, dir)
        bm25TopK(bm25Candidates(s, weights, qterms, heads), weights, qterms)
      },
      Some("""WITH p AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM p GROUP BY 1, 2),
             |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
             |dl AS (SELECT doc_id, COUNT(*) AS dl FROM p GROUP BY 1),
             |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
             |tt AS (SELECT COUNT(*) AS t_tokens FROM p),
             |w AS (
             |  SELECT tf.doc_id, tf.term,
             |    ((tf.tf * 22 * t_tokens * 10000) //
             |       (tf.tf * 10 * t_tokens + 3 * t_tokens + 9 * dl.dl * n_docs)
             |     * n_docs) // df.df AS w
             |  FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id
             |  CROSS JOIN nd CROSS JOIN tt),
             |q AS (SELECT doc_id AS q_id, term FROM tf WHERE doc_id < 5),
             |sc AS (
             |  SELECT q.q_id, w.doc_id, CAST(SUM(w.w) AS BIGINT) AS score
             |  FROM q JOIN w USING (term)
             |  WHERE w.doc_id != q.q_id GROUP BY 1, 2),
             |r AS (
             |  SELECT q_id, doc_id, score,
             |    row_number() OVER (PARTITION BY q_id
             |      ORDER BY score DESC, doc_id) AS rk
             |  FROM sc)
             |SELECT q_id, CAST(rk AS BIGINT) AS rk, doc_id, score
             |FROM r WHERE rk <= 10 ORDER BY q_id, rk""".stripMargin)),

    // ------------------------------------------------------------------
    // q_dsir ★ (new r13) — Data Selection via Importance Resampling
    // (Xie et al. 2023, "Data Selection for Language Models via
    // Importance Resampling"): the modern LEARNED selection stage that
    // upsamples raw documents matching a target domain. Feature space =
    // hashed unigram counts in B=512 buckets (the DSIR paper's hashed
    // n-gram generative model; md5-mod hashing is the q_feature_hash
    // idiom, identical in every engine). Target here = the lang='en'
    // slice (the paper's "formal text" target stand-in); raw = the full
    // corpus. Per-document log importance weight, EXACT in e20 units
    // via the fixed-point log₂ (ExactMath.log2e20 — the q_mm_entropy
    // arithmetic, so the score is bit-identical cross-engine, never a
    // libm ln):
    //   logw_e20(d) = Σ_b c_d[b]·(L(t_b) − L(r_b)) + n_d·(L(R) − L(T))
    // with Laplace counts t_b = 1 + target tokens in b, r_b = 1 + raw
    // tokens in b, T = Σt_b, R = Σr_b, L = floor(2²⁰log₂·). Selection
    // is the paper's deterministic top-k variant with per-source
    // budgets: keep the top 25% per source by (logw DESC, doc_id).
    // Headroom: log2e20's domain needs r_b, R < 2³³ ≈ 8.6e9 tokens —
    // per-shard scale; a 1e13-token corpus buckets counts per shard or
    // widens the recurrence to Q30/128-bit (same table, more rounds).
    // Σ c·ΔL ≤ n_d·33·2²⁰ ≈ 3.5e7·n_d — no overflow for any real doc.
    // Plan shape at 100 TB: explode → ONE (doc, bucket) hash agg with
    // map-side combine (the only corpus-keyed shuffle) → broadcast join
    // of the 512-row model table (t/r bucket log-ratios — persists at
    // rest like the IVF centroids) → per-doc agg; scalars ride in as
    // 1-row broadcasts; the keep-window partitions by source. Buckets
    // absent from the corpus need no domain completion: they cannot
    // appear in any document, and the totals fold them in as
    // T = target_tokens + B, R = raw_tokens + B exactly.
    QueryDef(
      "q_dsir",
      (s: SparkSession, dir: String) =>
        dsirWeighted(s, dir)
          .select("doc_id", "source", "n_tokens", "logw_e20", "keep")
          .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE
             |$DsirSql
             |SELECT doc_id, source, n_tokens, logw_e20,
             |  CAST(CASE WHEN rk * 4 <= ns THEN 1 ELSE 0 END AS BIGINT) AS keep
             |FROM r ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_dsir_eval ★ (new r13) — grades the selection q_dsir made, the
    // eval leg that completes the DSIR family (the q_pq_recall pattern:
    // the grader shares the graded query's exact bodies, so there is no
    // second implementation to drift). Two metrics, two directions:
    //  - mean importance weight (mlogw_raw/kept_e20): top-k per source
    //    maximizes this by construction — the selection's own objective,
    //    asserted kept > raw in the spec;
    //  - KL(target ‖ set) over the hashed-unigram bucket distributions
    //    for set = RAW vs set = KEPT — the DISTRIBUTION-match check.
    //    On this fixture the verdict is honest and negative: the shared
    //    synthetic vocabulary puts raw within ~0.002 bits of target, so
    //    a fixed 25% top-k quota OVERSHOOTS (kl_kept ≈ 0.015-0.026 >
    //    kl_raw) — precisely the concentration-vs-coverage number a
    //    curation run must see before committing to a selection quota
    //    (DSIR's premise is raw ≉ target; when raw already matches,
    //    selecting hurts, and this row says so). Exact integers: with
    // L = log2e20 and Laplace masses t_b/q_b over the FULL 512-bucket
    // domain (unobserved buckets carry smoothing mass 1 — they MUST be
    // counted, Σt_b = T),
    //   2²⁰·T·KL(t‖q) ≈ Σ t_b·L(t_b) − Σ t_b·L(q_b) + T·(L(Q) − L(T))
    // — every term a 64-bit integer, bit-identical in both engines;
    // reported in e6 bits via the truncated-divisor scaling
    // num // ((T·2²⁰) // 1e6) (divisor ≥ 5.4e8/1e6, exact-deterministic
    // even though the constant truncates). The oracle carries TWO log₂
    // recurrence instances (Log2Sql sfx="2"): selection weights first,
    // then logs over the kept-set counts the selection produced.
    // Plan: at-rest dsirBuckets → the shared dsirWeighted keep set →
    // one doc-keyed equi-join + three 512-row model frames + 1-row
    // scalar assembly. Corpus cost = the one (doc,bucket) pass, already
    // materialized.
    QueryDef(
      "q_dsir_eval",
      (s: SparkSession, dir: String) => {
        import graft.functions.ExactMath.{divTrunc, log2e20}
        val cb = dsirBuckets(s, dir)
        val kept = dsirWeighted(s, dir)
          .filter(col("keep") === 1L).select("doc_id")
        val buckets = s.range(512).select(col("id").as("b"))
        val rb = cb.groupBy("b").agg((sum("c") + lit(1L)).as("rv"))
        val tbl = cb.filter(col("lang") === "en")
          .groupBy("b").agg((sum("c") + lit(1L)).as("tv"))
        val kc = cb.join(kept, "doc_id")
          .groupBy("b").agg((sum("c") + lit(1L)).as("kv"))
        val full = buckets
          .join(tbl, Seq("b"), "left").join(rb, Seq("b"), "left")
          .join(kc, Seq("b"), "left")
          .select(
            coalesce(col("tv"), lit(1L)).as("t"),
            coalesce(col("rv"), lit(1L)).as("r"),
            coalesce(col("kv"), lit(1L)).as("k"))
        val terms = full.agg(
          sum(col("t") * log2e20(col("t"))).as("stt"),
          sum(col("t") * log2e20(col("r"))).as("str"),
          sum(col("t") * log2e20(col("k"))).as("stk"),
          sum("t").as("tt"), sum("r").as("rt"), sum("k").as("kt"))
        val div = divTrunc(shiftleft(col("tt"), 20), lit(1000000L))
        // Divisor guarded with greatest(·,1): a source with <4 docs keeps
        // nothing (rk*4<=ns never holds), and an unguarded 0-divisor
        // diverges across engines (Spark IntegralDivide → null, DuckDB
        // // → error). With kept=0 the numerator sum is null → coalesce
        // to 0 so both engines report mlogw_kept_e20 = 0.
        val ml = dsirWeighted(s, dir).agg(
          divTrunc(sum("logw_e20"), count(lit(1))).as("mlogw_raw_e20"),
          divTrunc(
            coalesce(sum(when(col("keep") === 1L, col("logw_e20"))), lit(0L)),
            greatest(sum(when(col("keep") === 1L, 1L).otherwise(0L)), lit(1L)))
            .as("mlogw_kept_e20"))
        terms.crossJoin(ml).select(
          col("tt").as("target_mass"), col("rt").as("raw_mass"),
          col("kt").as("kept_mass"),
          divTrunc(col("stt") - col("str")
            + col("tt") * (log2e20(col("rt")) - log2e20(col("tt"))), div)
            .as("kl_raw_e6"),
          divTrunc(col("stt") - col("stk")
            + col("tt") * (log2e20(col("kt")) - log2e20(col("tt"))), div)
            .as("kl_kept_e6"),
          col("mlogw_raw_e20"), col("mlogw_kept_e20"))
      },
      Some(s"""WITH RECURSIVE
             |$DsirSql,
             |kept AS MATERIALIZED (SELECT doc_id FROM r WHERE rk * 4 <= ns),
             |buckets AS (SELECT unnest(range(512)) AS b),
             |kc AS (
             |  SELECT c.b, CAST(SUM(c.c) + 1 AS BIGINT) AS kv
             |  FROM c JOIN kept USING (doc_id) GROUP BY 1),
             |fl AS MATERIALIZED (
             |  SELECT COALESCE(tb.tv, 1) AS t, COALESCE(rb.rv, 1) AS rr,
             |    COALESCE(kc.kv, 1) AS k
             |  FROM buckets bk
             |  LEFT JOIN tb ON tb.b = bk.b
             |  LEFT JOIN rb ON rb.b = bk.b
             |  LEFT JOIN kc ON kc.b = bk.b),
             |tot AS (
             |  SELECT CAST(SUM(t) AS BIGINT) AS tt, CAST(SUM(rr) AS BIGINT) AS rt,
             |    CAST(SUM(k) AS BIGINT) AS kt
             |  FROM fl),
             |dom2 AS (SELECT DISTINCT v FROM (
             |  SELECT t AS v FROM fl UNION ALL SELECT rr FROM fl
             |  UNION ALL SELECT k FROM fl
             |  UNION ALL SELECT tt FROM tot UNION ALL SELECT rt FROM tot
             |  UNION ALL SELECT kt FROM tot)),
             |${Log2Sql.cte("2")},
             |terms AS (
             |  SELECT CAST(SUM(f.t * lt.l) AS BIGINT) AS stt,
             |    CAST(SUM(f.t * lr2.l) AS BIGINT) AS str,
             |    CAST(SUM(f.t * lk.l) AS BIGINT) AS stk
             |  FROM fl f
             |  JOIN lg2 lt ON lt.v = f.t
             |  JOIN lg2 lr2 ON lr2.v = f.rr
             |  JOIN lg2 lk ON lk.v = f.k),
             |ml AS (
             |  SELECT CAST(SUM(logw_e20) AS BIGINT) // COUNT(*) AS mlogw_raw_e20,
             |    CAST(COALESCE(SUM(CASE WHEN rk * 4 <= ns THEN logw_e20 END), 0) AS BIGINT)
             |      // GREATEST(CAST(SUM(CASE WHEN rk * 4 <= ns THEN 1 ELSE 0 END) AS BIGINT), 1)
             |      AS mlogw_kept_e20
             |  FROM r)
             |SELECT tot.tt AS target_mass, tot.rt AS raw_mass,
             |  tot.kt AS kept_mass,
             |  (stt - str + tt * (lgr.l - lgt.l)) // ((tt << 20) // 1000000)
             |    AS kl_raw_e6,
             |  (stt - stk + tt * (lgk.l - lgt.l)) // ((tt << 20) // 1000000)
             |    AS kl_kept_e6,
             |  mlogw_raw_e20, mlogw_kept_e20
             |FROM terms, ml, tot
             |JOIN lg2 lgt ON lgt.v = tot.tt
             |JOIN lg2 lgr ON lgr.v = tot.rt
             |JOIN lg2 lgk ON lgk.v = tot.kt""".stripMargin))
  )

  /** Shared DuckDB chain of the DSIR oracles (the CcSql rule): bucket
    * counts `c`, smoothed target/raw bucket tables `tb`/`rb`, totals
    * `sc`, the first log₂ recurrence (`lg` over `dom`), the bucket
    * `model`, per-doc weights `wgt`, and the ranked frame `r` carrying
    * (rk, ns) for the top-25%-per-source keep rule. Callers open with
    * `WITH RECURSIVE` and read from `r` (and `c`/`tb`/`rb` for eval).
    */
  private lazy val DsirSql: String =
    s"""tok AS (
       |  SELECT doc_id, source, lang, unnest(string_split(text, ' ')) AS t
       |  FROM (SELECT doc_id, text, lang, source FROM documents
       |    UNION ALL ${TextFixture.dsirSqlRows}) ddocs),
       |c AS MATERIALIZED (
       |  SELECT doc_id, source, lang,
       |    ('0x' || substring(md5(t), 1, 15))::BIGINT % 512 AS b,
       |    CAST(COUNT(*) AS BIGINT) AS c
       |  FROM tok GROUP BY 1, 2, 3, 4),
       |rb AS (SELECT b, CAST(SUM(c) + 1 AS BIGINT) AS rv FROM c GROUP BY 1),
       |tb AS (SELECT b, CAST(SUM(c) + 1 AS BIGINT) AS tv
       |       FROM c WHERE lang = 'en' GROUP BY 1),
       |sc AS (SELECT CAST(SUM(c) + 512 AS BIGINT) AS rtot,
       |         CAST(SUM(CASE WHEN lang = 'en' THEN c ELSE 0 END) + 512
       |           AS BIGINT) AS ttot
       |       FROM c),
       |dom AS (SELECT DISTINCT v FROM (
       |  SELECT rv AS v FROM rb UNION ALL SELECT tv FROM tb
       |  UNION ALL SELECT rtot FROM sc UNION ALL SELECT ttot FROM sc)),
       |${Log2Sql.cte()},
       |model AS (
       |  SELECT rb.b, COALESCE(lt.l, 0) - lr.l AS dl
       |  FROM rb JOIN lg lr ON lr.v = rb.rv
       |  LEFT JOIN tb ON tb.b = rb.b
       |  LEFT JOIN lg lt ON lt.v = tb.tv),
       |norm AS (
       |  SELECT lgr.l - lgt.l AS norm FROM sc
       |  JOIN lg lgr ON lgr.v = sc.rtot
       |  JOIN lg lgt ON lgt.v = sc.ttot),
       |pd AS (
       |  SELECT c.doc_id, c.source, CAST(SUM(c.c) AS BIGINT) AS n_tokens,
       |    CAST(SUM(c.c * model.dl) AS BIGINT) AS ssum
       |  FROM c JOIN model ON model.b = c.b GROUP BY 1, 2),
       |wgt AS (
       |  SELECT doc_id, source, n_tokens,
       |    ssum + n_tokens * norm AS logw_e20
       |  FROM pd CROSS JOIN norm),
       |r AS MATERIALIZED (
       |  SELECT *, row_number() OVER (PARTITION BY source
       |      ORDER BY logw_e20 DESC, doc_id) AS rk,
       |    COUNT(*) OVER (PARTITION BY source) AS ns
       |  FROM wgt)""".stripMargin
}
