package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: sweep EVERY declared query's physical plan for the
  * anti-patterns the 100 TB design bans — cartesian products,
  * broadcast-nested-loop joins, and unpartitioned (single-task)
  * window operators — and print one line per flagged query. The
  * documented exceptions are listed here so the sweep stays
  * zero-noise: a new flag means a planner regression or an
  * undocumented scale hazard. Usage: PlanAudit [sfDir]
  */
object PlanAudit {

  /** (query, flag) pairs that are DESIGNED, with the reason. */
  val documented: Set[(String, String)] = Set(
    // explicit Θ(n²) exact fallback, blocked + FLOPs-budgeted; at test
    // SF AQE renders the blocked crossJoin as a BNLJ over the
    // broadcast-able block, at scale it is a shuffled cartesian —
    // both are the same designed quadratic
    ("q_embed_dedup", "CartesianProduct"),
    ("q_embed_dedup", "BroadcastNestedLoopJoin"),
    // tiny broadcast side × non-equi predicate (vec_id != q_id): BNLJ
    // over a 5-row broadcast IS the intended stream-the-corpus plan
    ("q_sim_topk", "BroadcastNestedLoopJoin"),
    // same shape: 8-row query-token bag / 5-row query set broadcast,
    // non-equi self-exclusion predicate, corpus streams once
    ("q_maxsim", "BroadcastNestedLoopJoin"),
    ("q_sim_rerank", "BroadcastNestedLoopJoin"),
    ("q_maxsim_rerank", "BroadcastNestedLoopJoin"), // 2-row pooled query broadcast
    // 1-row broadcast total joined with no key — nested-loop over 1 row
    ("q_mix_weights", "BroadcastNestedLoopJoin"),
    ("q_tfidf", "BroadcastNestedLoopJoin"),
    ("q_collocation_pmi", "BroadcastNestedLoopJoin"), // 1-row bigram total
    ("q_pagerank_iter", "BroadcastNestedLoopJoin"),   // 1-row node count
    ("q_pagerank3", "BroadcastNestedLoopJoin"),       // 1-row node count ×3 steps
    ("q_abtest", "BroadcastNestedLoopJoin"),          // 1-row × 1-row arm cross
    ("q_doc_sim_sparse", "BroadcastNestedLoopJoin"),  // 1-row n_docs for idf
    ("q_drift_tvd", "BroadcastNestedLoopJoin"),       // 1-row min/max day broadcast
    ("q_fk_orphans", "BroadcastNestedLoopJoin"),      // 1-row × 1-row count cross per edge
    ("q_hybrid_rrf", "BroadcastNestedLoopJoin"),      // 1-row n_docs + 5-query broadcast
    ("q_join_estimate", "BroadcastNestedLoopJoin"),   // 1-row max-key broadcast
    ("q_mix_temperature", "BroadcastNestedLoopJoin"), // 1-row totals broadcast
    ("q_rfm", "BroadcastNestedLoopJoin"),             // 1-row corpus max day
    ("q_rle_profile", "BroadcastNestedLoopJoin"),     // 1-row × 1-row stats cross
    ("q_trend_ols", "BroadcastNestedLoopJoin"),       // 1-row corpus min day
    ("q_vocab_growth", "BroadcastNestedLoopJoin"),    // 1-row max doc_id
    // windows over the USER table / the ≤10-row growth-curve frame,
    // not the corpus (see each query's scaladoc)
    ("q_rfm", "globalWindow"),
    ("q_vocab_growth", "globalWindow"),
    // rank window over ≤20 rows AFTER TakeOrderedAndProject
    ("q_embed_dedup_lsh", "globalWindow"),
    // windows over the KEY HISTOGRAM (vocabulary-sized), not the corpus
    ("q_skew_stats", "globalWindow"),
    // window over the DAYS table (time-span-sized, ≤36525 rows for a
    // century), not the corpus — see the q_rate_anomaly scaladoc
    ("q_rate_anomaly", "globalWindow"),
    // prefix-sum carry over the HOUR-BUCKET frame (time-span-sized:
    // ~720 rows for the 30-day corpus window), not the sweep rows —
    // see the q_interval_join scaladoc; advisor r6 adjudicated "none
    // required now", with the two-level day-partitioned prefix sum as
    // the escape hatch if the time span ever scales with the corpus
    ("q_interval_join", "globalWindow"),

    // ---- forcedBroadcast: every explicit broadcast() hint whose side
    // is NOT structurally bounded (see [[boundedRows]]) must carry its
    // written cardinality bound here — the r7 interval-join fix
    // (a data-dependent correction set was force-broadcast; would OOM
    // the driver at 100 TB) is a bug CLASS, so the sweep now enforces
    // the bound-or-drop rule machine-side. Scalar-agg totals, LIMIT
    // heads, and driver-built literal frames auto-pass.
    // nation (25 rows) / region (5 rows): schema-fixed dims
    ("q_join_broadcast", "forcedBroadcast"),
    ("q_join_star", "forcedBroadcast"),
    // per-event_type frames: 5-value closed domain
    ("q_approx_percentile", "forcedBroadcast"),
    ("q_user_overlap", "forcedBroadcast"),
    ("q_winsorize", "forcedBroadcast"),
    ("q_outlier_fences", "forcedBroadcast"),
    // per-lang frame: 5-value closed domain
    ("q_sample_weighted", "forcedBroadcast"),
    // per-source frames: 20-value closed domain
    ("q_contamination_matrix", "forcedBroadcast"),
    // hour-bucket frames: time-span-sized (~720 rows for the 30-day
    // window), same bound as the allowlisted q_interval_join carry
    ("q_rolling_distinct", "forcedBroadcast"),
    ("q_interval_join", "forcedBroadcast"),
    // query sets: id-prefix filters selecting ≤5 fixed query
    // vectors / ≤2 query docs (the declared top-k/rerank contract)
    ("q_sim_topk", "forcedBroadcast"),
    ("q_sim_ann", "forcedBroadcast"),
    ("q_sim_ivf", "forcedBroadcast"),
    ("q_hybrid_rrf", "forcedBroadcast"),
    ("q_sim_rerank", "forcedBroadcast"),
    ("q_maxsim", "forcedBroadcast"),
    ("q_maxsim_rerank", "forcedBroadcast"),
    // eval-suite shingles: the decontamination contract is an
    // asymmetric probe — the eval side is a BENCHMARK (KBs–MBs,
    // doc_id < 20 here), never the corpus; see the query's scaladoc
    ("q_decontaminate", "forcedBroadcast"))

  /** One sweep finding: query, flag, whether it's in [[documented]]. */
  final case class Finding(query: String, flag: String, documented: Boolean)

  /** Structural proof that a broadcast-hinted subtree is driver-safe:
    * bounded rows REGARDLESS of corpus size. True iff the tree is built
    * from literal/driver-side leaves, or every path to an unbounded leaf
    * passes through a row-count-capping node (grouping-free aggregate →
    * 1 row, LIMIT → k rows), composed through row-non-increasing ops
    * (project/filter/sort/dedup-to-subset) and joins/unions of bounded
    * sides. Grouping aggregates and distincts do NOT prove a bound
    * (their cardinality is the key domain — corpus-sized in general);
    * queries that broadcast those must carry a written domain bound in
    * [[documented]] under the `forcedBroadcast` flag.
    */
  private def boundedRows(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    p match {
      case _: LocalRelation | _: OneRowRelation | _: Range => true
      case a: Aggregate => a.groupingExpressions.isEmpty || boundedRows(a.child)
      case _: GlobalLimit | _: LocalLimit => true
      case j: Join => boundedRows(j.left) && boundedRows(j.right)
      case u: Union => u.children.forall(boundedRows)
      case _: Project | _: Filter | _: Sort | _: SubqueryAlias |
          _: Repartition | _: RepartitionByExpression | _: Window |
          _: ResolvedHint | _: Deduplicate | _: Distinct =>
        boundedRows(p.children.head)
      case _ => false
    }
  }

  /** Sweep every declared query's physical plan. Pure analysis — builds
    * each plan without executing it (e2e queries still run their setup
    * side effects, which is why sweeps run at sf0.001). Any thrown plan
    * error surfaces as an undocumented `PLAN ERROR` finding rather than
    * aborting the sweep.
    *
    * Known blind spot (r8): the stream_* e2e queries RUN their
    * streaming query inside the builder and return the drained sink —
    * the sweep analyzes only that post-drain batch plan, so hints and
    * join shapes inside the streaming topology are not swept. Those
    * queries therefore follow the bound-or-drop rule by review, not by
    * machine (stream_join_e2e's dim hint was dropped for exactly this
    * reason). Callable from both `main` and PlanAuditSpec so
    * the undocumented=0 invariant is machine-enforced per `sbt test`.
    */
  def sweep(spark: SparkSession, dir: String): Seq[Finding] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val fs =
        try {
          val qe = fn(spark, dir).queryExecution
          val plan = qe.executedPlan.toString
          // A Window with an empty partition spec runs in ONE task.
          // Detected on the optimized logical TREE, not the plan string:
          // TreeNode.argString OMITS empty sequences, so an empty
          // partition spec never prints as `[]` and the r4 string regex
          // silently matched nothing (caught by PlanAuditSpec's stale
          // check, r7). collectWithSubqueries so a window inside a
          // subquery expression can't hide.
          val globalWin = qe.optimizedPlan.collectWithSubqueries {
            case w: org.apache.spark.sql.catalyst.plans.logical.Window
                if w.partitionSpec.isEmpty => w
          }.nonEmpty
          // A broadcast() hint whose side has no structural row bound is
          // a driver-OOM-at-100TB hazard unless its domain bound is
          // written down (the r7 interval-join bug class). Hints live as
          // ResolvedHint in the ANALYZED plan (the optimizer folds them
          // into Join nodes); collectWithSubqueries so a hint inside an
          // IN/EXISTS block can't hide.
          val unboundedHint = qe.analyzed.collectWithSubqueries {
            case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
                if h.hints.strategy.contains(
                  org.apache.spark.sql.catalyst.plans.logical.BROADCAST) &&
                  !boundedRows(h.child) => h
          }.nonEmpty
          Seq(
            "CartesianProduct" -> plan.contains("CartesianProduct"),
            "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
            "globalWindow" -> globalWin,
            "forcedBroadcast" -> unboundedHint)
            .collect { case (f, true) =>
              Finding(name, f, documented.contains((name, f))) }
        } catch { case e: Throwable =>
          Seq(Finding(name,
            s"PLAN ERROR ${Option(e.getMessage).getOrElse(e.toString).take(100)}",
            documented = false))
        }
      spark.catalog.clearCache()
      fs
    }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val findings = sweep(spark, dir)
    findings.foreach { f =>
      println(s"${f.query}: ${f.flag}${if (f.documented) " (documented)" else "  <-- UNDOCUMENTED"}")
    }
    println(s"AUDIT DONE undocumented=${findings.count(!_.documented)}")
    spark.stop()
  }
}
