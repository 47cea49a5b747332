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
}
