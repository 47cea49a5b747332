package graft

import org.apache.spark.sql.functions._

import graft.operators.ScaleOps

/** Scale building blocks: salted aggregation equals the direct
  * aggregation; bucketed tables join without an Exchange (the
  * co-located join a 100 TB fact-fact join depends on); forced
  * broadcast keeps the dim side off the shuffle.
  */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg == direct groupBy agg (count/sum/min/max)") {
    val events = Tables(spark, sfDir, "events")
    val direct = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("s"),
        min("value").as("mn"), max("value").as("mx"))
      .orderBy("event_type").collect().toSeq
    val salted = ScaleOps.saltedAgg(events, Seq(col("event_type")), 16)(
      Seq(count(lit(1)).as("n"), sum("value").as("s"),
        min("value").as("mn"), max("value").as("mx")),
      Seq(sum("n").as("n"), sum("s").as("s"),
        min("mn").as("mn"), max("mx").as("mx")))
      .orderBy("event_type").collect().toSeq
    assert(salted.length == direct.length)
    salted.zip(direct).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0) && a.getLong(1) == b.getLong(1))
      // double sum differs in fold order — compare to 1e-9 relative
      assert(math.abs(a.getDouble(2) - b.getDouble(2)) <= 1e-9 * math.abs(b.getDouble(2)))
      assert(a.getDouble(3) == b.getDouble(3) && a.getDouble(4) == b.getDouble(4))
    }
  }

  test("saltedJoin == plain equi-join; no salt column leaks into the output") {
    val ev = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("value"))
    val cust = Tables(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val salted = ScaleOps.saltedJoin(ev, "user_id", col("event_id"), cust, "c_custkey", 8)
    assert(!salted.columns.contains("__salt"))
    val direct = ev.join(cust, ev("user_id") === cust("c_custkey"))
    assert(salted.count() == direct.count())
    // per-segment aggregates identical — each fact row matched exactly
    // one dim replica (integer-exact, so plain equality)
    val a = salted.groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment").collect().toSeq
    val b = direct.groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment").collect().toSeq
    assert(a == b)
  }

  test("bucketed tables join with NO Exchange (co-located join)") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bucket_").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    ScaleOps.writeBucketed(Tables(spark, sfDir, "orders"),
      "b_orders", s"$wh/b_orders", "o_orderkey", buckets = 8)
    ScaleOps.writeBucketed(Tables(spark, sfDir, "lineitem"),
      "b_lineitem", s"$wh/b_lineitem", "l_orderkey", buckets = 8)

    // force the shuffle-join path so the assertion is about bucketing,
    // not about AQE broadcasting a small side at this tiny SF
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .select("o_orderstatus", "l_quantity")
      val plan = joined.queryExecution.executedPlan.toString
      // both sides pre-partitioned on the join key by bucketBy(8):
      // a sort-merge join with ZERO exchanges
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it is still correct
      val direct = Tables(spark, sfDir, "lineitem")
        .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select("o_orderstatus", "l_quantity")
        .orderBy("o_orderstatus", "l_quantity").collect().toSeq
      assert(joined.orderBy("o_orderstatus", "l_quantity").collect().toSeq == direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE b_orders"); spark.sql("DROP TABLE b_lineitem")
    }
  }

  test("bloomPrune: superset of true matches, prunes most non-matches") {
    val dim = Tables(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val fact = Tables(spark, sfDir, "lineitem")
    val pruned = ScaleOps.bloomPrune(fact, "l_orderkey", dim, "o_orderkey")

    // no false negatives: every true match survives the bloom
    val trueMatches = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber")
    val lost = trueMatches.except(
      pruned.join(dim, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber"))
    assert(lost.count() == 0L)

    // and it actually prunes: ~20% selectivity + fpp 1% → well under half
    val (total, kept) = (fact.count(), pruned.count())
    assert(kept >= trueMatches.count())
    assert(kept < total / 2, s"bloom kept $kept of $total — not pruning")
  }

  test("bloomPrune: an empty build side prunes everything instead of " +
      "NPEing (r16 — hit via q_triangles' empty support-filtered edge " +
      "table on the degenerate fixture)") {
    val dim = Tables(spark, sfDir, "orders")
      .filter(col("o_orderkey") < 0).select("o_orderkey") // empty
    val fact = Tables(spark, sfDir, "lineitem")
    val pruned = ScaleOps.bloomPrune(fact, "l_orderkey", dim, "o_orderkey")
    assert(pruned.count() == 0L) // exact: nothing can match an empty dim
    assert(pruned.schema == fact.schema)
  }

  test("bloomPrune: string keys work (xxhash64 both sides — no cast-to-null hole)") {
    // regression: a Long-typed probe UDF on a string key cast-to-nulls
    // and dropped EVERY row — all true matches lost silently
    val dim = Tables(spark, sfDir, "orders")
      .select("o_orderpriority").distinct().limit(2)
    val fact = Tables(spark, sfDir, "orders")
    val pruned = ScaleOps.bloomPrune(fact, "o_orderpriority", dim, "o_orderpriority")
    val trueMatches = fact.join(dim, Seq("o_orderpriority")).count()
    assert(trueMatches > 0L)
    assert(pruned.join(dim, Seq("o_orderpriority")).count() == trueMatches)
  }

  test("bloomPrune: cross-typed keys are refused (xxhash64 is type-sensitive)") {
    // an Int fact key probed against a Long dim key hashes differently
    // on build vs probe even for equal values — every matching row
    // would silently vanish, so the API must refuse the pair outright
    val dim = Tables(spark, sfDir, "orders").select(col("o_orderkey"))
    val fact = Tables(spark, sfDir, "lineitem")
      .withColumn("l_orderkey", col("l_orderkey").cast("int"))
    val e = intercept[IllegalArgumentException] {
      ScaleOps.bloomPrune(fact, "l_orderkey", dim, "o_orderkey")
    }
    assert(e.getMessage.contains("xxhash64"))
  }

  test("bloomPrune: probe is Catalyst might_contain, not a Scala UDF") {
    // the probe runs once per fact row — at 100 TB it must stay inside
    // whole-stage codegen (interpreted lambda UDFs measured ~50× slower
    // on hot paths; dev/PERF_NOTES.md)
    val dim = Tables(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val pruned = ScaleOps.bloomPrune(
      Tables(spark, sfDir, "lineitem"), "l_orderkey", dim, "o_orderkey")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no might_contain in:\n$plan")
    assert(!plan.contains("UDF"), s"interpreted UDF survived in:\n$plan")
  }

  test("joinBroadcastDim plans a BroadcastHashJoin") {
    val j = ScaleOps.joinBroadcastDim(
      Tables(spark, sfDir, "customer"),
      Tables(spark, sfDir, "nation").withColumnRenamed("n_nationkey", "c_nationkey"),
      Seq("c_nationkey"))
    assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(j.count() > 0)
  }
}
