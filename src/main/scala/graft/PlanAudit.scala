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
    ("q_interval_join", "globalWindow"))

  /** One sweep finding: query, flag, whether it's in [[documented]]. */
  final case class Finding(query: String, flag: String, documented: Boolean)

  /** Sweep every declared query's physical plan. Pure analysis — builds
    * each plan without executing it (e2e queries still run their setup
    * side effects, which is why sweeps run at sf0.001). Any thrown plan
    * error surfaces as an undocumented `PLAN ERROR` finding rather than
    * aborting the sweep. Callable from both `main` and PlanAuditSpec so
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
          Seq(
            "CartesianProduct" -> plan.contains("CartesianProduct"),
            "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
            "globalWindow" -> globalWin)
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
