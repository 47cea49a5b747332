package graft

/** Machine-enforces the per-round plan invariant the builder previously
  * reported by hand: sweeping EVERY declared query's physical plan at
  * sf0.001 finds NO undocumented cartesian product, broadcast-nested-loop
  * join, or single-task (unpartitioned) window. A new flag here means a
  * planner regression or an undocumented scale hazard — fix the plan or,
  * if the shape is genuinely designed (e.g. a 1-row broadcast total),
  * document it in [[PlanAudit.documented]] with the reason.
  *
  * Since r9 the invariant also covers the PRE-start streaming topologies
  * ([[PlanAudit.sweepStreaming]]) — the r8 blind spot where a
  * corpus-sized dim broadcast inside stream_join_e2e was visible only to
  * review — plus sharpness checks that the sweep machinery actually
  * catches a deliberately planted hazard (a sweep that can't flag a
  * planted bug proves nothing when it reports zero).
  */
class PlanAuditSpec extends SparkSpec {

  // One sweep shared by both assertions: each sweep builds every declared
  // query's plan (SparkEntry.queries.size of them)
  // (and runs the e2e queries' setup side effects), so running it twice
  // would double the suite's cost for no information.
  private lazy val findings =
    PlanAudit.sweep(spark, sfDir) ++ PlanAudit.sweepStreaming(spark, sfDir) ++
      PlanAudit.sweepStreamingExecuted(spark, sfDir)

  test("plan sweep over all declared queries finds no undocumented anti-pattern") {
    val undocumented = findings.filterNot(_.documented)
    assert(undocumented.isEmpty,
      s"\nundocumented plan flags:\n${undocumented.map(f => s"  ${f.query}: ${f.flag}").mkString("\n")}")
  }

  test("streaming sweep covers every declared stream_* topology") {
    // The sweep is only as good as its coverage: every stream_* query in
    // the contract (minus the documented stream_ingest_e2e exception —
    // bare source topology, transforms in foreachBatch) must have a
    // registered pre-start topology, or a new streaming query could
    // silently re-open the r8 blind spot.
    val declared = SparkEntry.queries.keySet.filter(_.startsWith("stream_"))
    val missing = declared -
      "stream_ingest_e2e" -- graft.queries.StreamingQueries.topologies.keySet
    assert(missing.isEmpty,
      s"stream_* queries with no swept topology: $missing")
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

  test("sharpness: a planted corpus-sized broadcast hint inside a streaming topology is caught") {
    // Rebuild exactly the r8 bug (StreamingQueries joinTopo's dropped
    // hint): a streaming fact source joined to broadcast(corpus dim).
    // The sweep's predicate must count it — otherwise the blind-spot
    // closure is decorative.
    import org.apache.spark.sql.functions._
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
    val dim = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val planted = stream.join(broadcast(dim), Seq("user_id"))
    assert(PlanAudit.unboundedHintCount(planted.queryExecution.analyzed) == 1)
    // and the hint-free topology stays clean
    val clean = stream.join(dim, Seq("user_id"))
    assert(PlanAudit.unboundedHintCount(clean.queryExecution.analyzed) == 0)
  }

  test("sharpness: the EXECUTED-plan sweep catches a planted physical nested-loop inside a drained stream (r10)") {
    // The analyzed-plan sweep can only see what analysis shows; this
    // plants a hazard that exists ONLY physically — a stream-static
    // join with no equi key, which the per-batch planner must render as
    // a BroadcastNestedLoopJoin — drains it for real, and asserts the
    // executed-plan walk flags it. A sweep that can't catch this would
    // make the streamx: checks decorative.
    import org.apache.spark.sql.functions._
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .select("event_id", "user_id")
    val dim = spark.read.parquet(s"$sfDir/region.parquet")
    val planted = stream.join(dim, col("user_id") =!= col("r_regionkey"))
    val fs = PlanAudit.auditExecutedTopology(spark, "planted_bnlj", planted)
    assert(fs.exists(f => !f.documented &&
      (f.flag == "streamx:bnlJoin" || f.flag == "streamx:cartesianJoin")),
      s"planted physical nested-loop not flagged: $fs")
    // and a real registered topology audits clean through the same path
    val clean = PlanAudit.auditExecutedTopology(spark, "clean_probe",
      graft.queries.StreamingQueries.topologies("stream_tumbling_e2e")(spark, sfDir))
    assert(clean.isEmpty, s"clean topology flagged: $clean")
  }

  test("sharpness: a condition-less join inside a streaming topology is caught") {
    // The stream:cartesianJoin detector must actually fire: a
    // stream-static crossJoin analyzes to a Join with no condition.
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
    val dim = spark.read.parquet(s"$sfDir/region.parquet")
    val planted = stream.crossJoin(dim).queryExecution.analyzed
    val bare = planted.collectWithSubqueries {
      case j: Join if j.condition.isEmpty => j
    }
    assert(bare.nonEmpty, "planted cross join not visible to the analyzed-plan walk")
  }

  test("sharpness: boundedRows accepts GlobalLimit but not a bare LocalLimit (r8 advice)") {
    // A bare LocalLimit caps rows PER PARTITION — total output scales
    // with partition count — so it must NOT prove a broadcast-safe
    // bound; the GlobalLimit∘LocalLimit pair that .limit(k) produces
    // must. Plans are hand-built so the bare-LocalLimit shape (which
    // .limit never produces) is actually exercised.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.plans.logical._
    val corpus = spark.read.parquet(s"$sfDir/customer.parquet")
      .queryExecution.analyzed
    def hinted(p: LogicalPlan): LogicalPlan =
      ResolvedHint(p, HintInfo(strategy = Some(BROADCAST)))
    assert(PlanAudit.unboundedHintCount(hinted(LocalLimit(Literal(5), corpus))) == 1)
    assert(PlanAudit.unboundedHintCount(
      hinted(GlobalLimit(Literal(5), LocalLimit(Literal(5), corpus)))) == 0)
    assert(PlanAudit.unboundedHintCount(hinted(corpus)) == 1)
  }

  test("sharpness: the hint walk COUNTS unbounded hints, so a second one can't ride an allowlist entry (r8 advice)") {
    // The count-keyed allowlist's whole point: presence-keying would let
    // any future unbounded hint ride an existing entry, so the predicate
    // must return 2 for two hints (nonEmpty-style detection couldn't).
    // Every allowlist entry must also be keyed by a declared query.
    val unknown = PlanAudit.forcedBroadcastCounts.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"allowlist keys not in the contract: $unknown")
    import org.apache.spark.sql.functions._
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val two = broadcast(cust)
      .join(broadcast(orders), col("c_custkey") === col("o_custkey"))
    assert(PlanAudit.unboundedHintCount(two.queryExecution.analyzed) == 2)
  }
}
