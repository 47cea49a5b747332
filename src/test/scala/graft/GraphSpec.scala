package graft

/** Driver-side reference for the r5 graph batch (q_pagerank_iter). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("q_pagerank_iter matches a driver-side exact-integer power step (r5)") {
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val edges = docs.flatMap { case (_, text) =>
      val ws = text.split(" ", -1).distinct.toSeq
      for (a <- ws; b <- ws if a != b) yield (a, b)
    }.distinct
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

  test("q_triangles matches a brute-force driver count; each triangle counted once (r5)") {
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val und = docs.flatMap { case (_, text) =>
      val ws = text.split(" ", -1).distinct.toSeq
      for (a <- ws; b <- ws if a < b) yield (a, b)
    }.distinct
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
