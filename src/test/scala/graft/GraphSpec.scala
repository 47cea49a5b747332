package graft

/** Driver-side reference for the r5 graph batch (q_pagerank_iter). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("q_pagerank_iter matches a driver-side exact-integer power step (r5)") {
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    // shared r8 edge rule: support >= 3 documents (GraphQueries.undEdges)
    val edges = docs.flatMap { case (_, text) =>
      val ws = text.split(" ", -1).distinct.toSeq
      for (a <- ws; b <- ws if a != b) yield (a, b)
    }.groupBy(identity).filter(_._2.size >= 3).keys.toSeq
    val deg = edges.groupBy(_._1).map { case (s, es) => (s, es.size.toLong) }
    val n = deg.size.toLong
    val contrib = deg.map { case (s, d) => (s, (1000000000L / n) / d) }
    val want = edges.groupBy(_._2).toSeq.map { case (dst, es) =>
      val m = es.map(e => contrib(e._1)).sum
      (dst, deg(dst), 15000000000L / (n * 100L) + m * 85L / 100L)
    }.sortBy(r => (-r._3, r._1))
    val got = SparkEntry.queries("q_pagerank_iter")(spark, sfDir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == want)
    // the co-occurrence graph is symmetric: indeg == outdeg per node
    val indeg = edges.groupBy(_._2).map { case (d, es) => (d, es.size.toLong) }
    assert(indeg == deg)
    // rank mass is conserved up to truncation loss (≤ ~N e9-units per
    // divide chain): Σ r1 ∈ (0.99·1e9, 1e9]
    val mass = got.map(_._3).sum
    assert(mass <= 1000000000L && mass > 990000000L, s"mass=$mass")
  }

  test("q_pagerank3: three driver-folded supersteps match; mass bound holds (r5)") {
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    // shared r8 edge rule: support >= 3 documents (GraphQueries.undEdges)
    val edges = docs.flatMap { case (_, text) =>
      val ws = text.split(" ", -1).distinct.toSeq
      for (a <- ws; b <- ws if a != b) yield (a, b)
    }.groupBy(identity).filter(_._2.size >= 3).keys.toSeq
    val deg = edges.groupBy(_._1).map { case (s, es) => (s, es.size.toLong) }
    val n = deg.size.toLong
    val inEdges = edges.groupBy(_._2)
    var rank: Map[String, Long] = deg.map { case (s, _) => s -> 1000000000L / n }
    for (_ <- 1 to 3) {
      val contrib = rank.map { case (s, r) => s -> r / deg(s) }
      // domain = deg nodes every step (the kernel's carried rank frame)
      rank = deg.map { case (node, _) =>
        val m = inEdges.getOrElse(node, Seq.empty).flatMap(e => contrib.get(e._1)).sum
        node -> (15000000000L / (n * 100L) + m * 85L / 100L)
      }
    }
    val want = rank.toSeq.map { case (t, r) => (t, r) }.sortBy(r => (-r._2, r._1))
    val got = SparkEntry.queries("q_pagerank3")(spark, sfDir)
      .as[(String, Long)].collect().toSeq
    assert(got == want)
    // mass conserved up to 3 compounded truncation-loss rounds
    val mass = got.map(_._2).sum
    assert(mass <= 1000000000L && mass > 970000000L, s"mass=$mass")
    // fixed-point note (see scaladoc): on this near-regular graph the
    // 3-step ranks COINCIDE with the 1-step ranks — assert that, so a
    // fixture change that breaks the premise is caught loudly
    val oneStep = SparkEntry.queries("q_pagerank_iter")(spark, sfDir)
      .select("token", "pr_e9").as[(String, Long)].collect().toMap
    assert(got.forall { case (t, r) => oneStep(t) == r })
  }

  test("pagerankSteps: successive steps differ on an asymmetric graph (r5)") {
    import graft.queries.GraphQueries
    // 1→2, 1→3, 2→3, 3→1: degrees 2/1/1 — rank mass concentrates on 3
    // then flows to 1; uniform start is NOT stationary here
    val e = Seq(("1", "2"), ("1", "3"), ("2", "3"), ("3", "1"))
      .toDF("src", "dst")
    def ranks(k: Int): Map[String, Long] =
      GraphQueries.pagerankSteps(e, k).as[(String, Long)].collect().toMap
    val (r1, r2, r3) = (ranks(1), ranks(2), ranks(3))
    assert(r1 != r2 && r2 != r3, "steps did not evolve the rank vector")
    // driver fold of the same integer arithmetic, 3 steps
    val deg = Map("1" -> 2L, "2" -> 1L, "3" -> 1L)
    val in = Map("1" -> Seq("3"), "2" -> Seq("1"), "3" -> Seq("1", "2"))
    var r: Map[String, Long] = deg.map { case (k, _) => k -> (1000000000L / 3L) }
    for (_ <- 1 to 3) {
      val c = r.collect { case (k, v) if deg.contains(k) => k -> v / deg(k) }
      r = in.map { case (dst, srcs) =>
        dst -> (15000000000L / 300L +
          srcs.flatMap(c.get).sum * 85L / 100L)
      }
    }
    assert(r3 == r)
  }

  test("pagerankSteps: a source-only node survives steps and keeps contributing (r5)") {
    import graft.queries.GraphQueries
    // A→B, B→C, C→B: A has out-edges but NO in-edges — the review
    // scenario where the dst-agg-only rank frame dropped A after step 1
    val e = Seq(("A", "B"), ("B", "C"), ("C", "B")).toDF("src", "dst")
    val r2 = GraphQueries.pagerankSteps(e, 2).as[(String, Long)].collect().toMap
    // A persists with the pure teleport rank (no in-mass)
    val teleport = 15000000000L / 300L
    assert(r2.keySet == Set("A", "B", "C"))
    assert(r2("A") == teleport)
    // and A's step-2 contribution reached B: driver fold
    val r0 = 1000000000L / 3L
    val r1 = Map(
      "A" -> teleport,
      "B" -> (teleport + (r0 + r0) * 85L / 100L), // from A and C
      "C" -> (teleport + r0 * 85L / 100L))
    val want2 = Map(
      "A" -> teleport,
      "B" -> (teleport + (r1("A") + r1("C")) * 85L / 100L),
      "C" -> (teleport + r1("B") * 85L / 100L))
    assert(r2 == want2)
  }

  test("q_triangles matches a brute-force driver count; each triangle counted once (r5)") {
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    // shared r8 edge rule: support >= 3 documents (GraphQueries.undEdges)
    val und = docs.flatMap { case (_, text) =>
      val ws = text.split(" ", -1).distinct.toSeq
      for (a <- ws; b <- ws if a < b) yield (a, b)
    }.groupBy(identity).filter(_._2.size >= 3).keys.toSeq
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (w, es) => w -> es.map(_._2).toSet }
    val deg = adj.map { case (w, ns) => w -> ns.size.toLong }
    // brute force: enumerate each unordered triangle exactly once
    val triangles = und.flatMap { case (a, b) =>
      adj(a).intersect(adj(b)).filter(c => c > b).map(c => (a, b, c))
    }.toSet
    val perNode = triangles.toSeq.flatMap { case (a, b, c) => Seq(a, b, c) }
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val want = deg.toSeq.sortBy(_._1).map { case (w, d) =>
      val t = perNode.getOrElse(w, 0L)
      (w, d, t, if (d >= 2) t * 20000L / (d * (d - 1L)) else 0L)
    }
    val got = SparkEntry.queries("q_triangles")(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // conservation: per-node counts sum to exactly 3 per triangle
    assert(got.map(_._3).sum == 3L * triangles.size)
    // the fixture actually has triangles (dead-graph guard)
    assert(triangles.nonEmpty)
  }
}
