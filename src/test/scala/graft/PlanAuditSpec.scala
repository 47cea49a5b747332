package graft

/** Machine-enforces the per-round plan invariant the builder previously
  * reported by hand: sweeping EVERY declared query's physical plan at
  * sf0.001 finds NO undocumented cartesian product, broadcast-nested-loop
  * join, or single-task (unpartitioned) window. A new flag here means a
  * planner regression or an undocumented scale hazard — fix the plan or,
  * if the shape is genuinely designed (e.g. a 1-row broadcast total),
  * document it in [[PlanAudit.documented]] with the reason.
  */
class PlanAuditSpec extends SparkSpec {

  // One sweep shared by both assertions: each sweep builds every declared
  // query's plan (SparkEntry.queries.size of them)
  // (and runs the e2e queries' setup side effects), so running it twice
  // would double the suite's cost for no information.
  private lazy val findings = PlanAudit.sweep(spark, sfDir)

  test("plan sweep over all declared queries finds no undocumented anti-pattern") {
    val undocumented = findings.filterNot(_.documented)
    assert(undocumented.isEmpty,
      s"\nundocumented plan flags:\n${undocumented.map(f => s"  ${f.query}: ${f.flag}").mkString("\n")}")
  }

  test("documented exception list carries no stale queries") {
    // Every QUERY in the allowlist must still trip at least one of its
    // documented flags — a fully-clean documented query means its plan
    // changed and the allowlist entry no longer describes reality.
    // (Per-PAIR checking would false-fail: e.g. q_embed_dedup documents
    // both CartesianProduct and BroadcastNestedLoopJoin because AQE
    // renders its blocked quadratic as either depending on SF.)
    val flaggedQueries = findings.map(_.query).toSet
    val stale = PlanAudit.documented.map(_._1).diff(flaggedQueries)
    assert(stale.isEmpty,
      s"\ndocumented queries no longer flagged at all:\n${stale.map(q => s"  $q").mkString("\n")}")
  }
}
