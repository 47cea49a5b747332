package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ExactMath

/** Batch 12 ★ (r5) — graph analytics over corpus-derived graphs: the
  * link-analysis leg (PageRank-style centrality) a data pipeline grows
  * once documents/entities form a graph (citation dedup priors, seed
  * weighting, spam scoring). The graph here is the token co-occurrence
  * graph (an edge joins two tokens that share a document — symmetric by
  * construction), derived exactly like q_text_cooccur's pair stream;
  * the operator itself is graph-agnostic: any (src, dst) edge frame
  * plugs in.
  *
  * Scale notes: the edge build is per-doc-bounded quadratic (a doc's
  * DISTINCT token set self-joined within the doc — never corpus²), and
  * the distinct edge table is vocabulary²-bounded. The iteration step is
  * the standard Pregel-as-join formulation: contributions = edges ⋈
  * (rank/outdeg), one shuffle keyed on dst per superstep, map-side
  * combined — the shape that runs at any scale and that GraphX's Pregel
  * compiles to anyway, kept here in DataFrame algebra for codegen + AQE.
  */
object GraphQueries {

  private def toks: Column = split(col("text"), " ")

  /** Per-doc MAP-SIDE co-occurrence pair stream (w1 < w2 over each
    * document's sorted distinct token set): posexplode + slice, no
    * doc_id self-join — the r6 degree-dist replan (the self-join paid a
    * full exchange+sort of the exploded token frame once the corpus
    * outgrew the broadcast threshold; 13.6× at 10× data), now shared by
    * the whole graph battery. One row per (doc, unordered pair);
    * per-doc-bounded quadratic, never corpus².
    */
  private def pairStream(docs: DataFrame): DataFrame =
    docs.select(array_sort(array_distinct(toks)).as("ws"))
      .select(posexplode(col("ws")).as(Seq("i", "w1")), col("ws"))
      .select(col("w1"),
        explode(slice(col("ws"), col("i") + lit(2), size(col("ws")))).as("w2"))

  /** Normalized identity of a corpus' documents table, shared with
    * `dev/spotcheck_gen1.py` (which re-derives the same key to locate
    * the materialized edge table): path + size + mtime-millis, so a
    * regenerated corpus at the same path gets a fresh table.
    */
  private[queries] def edgeTableKey(dir: String): String =
    CorpusTable.corpusKey(dir)

  /** The graph battery's SHARED edge definition (r8): undirected token
    * co-occurrence edges with SUPPORT ≥ 3 documents. Support
    * thresholding is how co-occurrence networks are actually built (a
    * pair observed once or twice is chance adjacency, not association —
    * the count/PMI-threshold convention of collocation analysis), and it
    * is what keeps every downstream graph analytic corpus-scalable: on
    * the r8 Heaps-law corpus the threshold drops the distinct edge set
    * 17.0M → 2.9M at gen-sf1 (83% noise edges) and the degree-ordered
    * wedge count 6.7e9 → 3.9e8 (94%) — q_triangles' OLD unthresholded
    * plan filled the disk and died at gen-sf1. On the driver fixtures
    * the threshold is invisible: every one of the 31-word corpus' 465
    * pairs co-occurs in far more than 3 documents, so all four graph
    * queries' outputs are unchanged there. The support count is one
    * map-side-combined hash agg over the per-doc-bounded pair stream.
    *
    * MATERIALIZED once per corpus since r10 (the r9 verdict's
    * amortization ask): all four graph queries consume the identical
    * derived relation, and at gen-sf1 each used to rebuild it from the
    * corpus (4 × a ~60 s per-doc pair
    * aggregation — the dominant cost of the battery; the per-QUERY
    * persist only deduplicated scans WITHIN a query). This is the lake
    * pattern for any shared derived table at 100 TB: pay the corpus
    * pass once, write the vocabulary-pair-sized result (2.9M rows at
    * gen-sf1 — always ≪ corpus) as a table, let every consumer read
    * THAT. Here the "lake" is a tmp-dir parquet keyed by the corpus
    * file's identity ([[edgeTableKey]]) so a changed corpus can never
    * serve a stale edge set; a production deployment would make it a
    * bucketed lake table via the `bucketed_join_e2e` pattern and
    * re-derive it on ingest. Correctness is unchanged by construction —
    * the materialized relation is THE SAME relation each query built
    * inline (DuckDB's oracle still derives it from the same support
    * rule inside each query), which the per-query hash-matches prove.
    * Bench isolation note: `Bench` clears the block-manager cache
    * between queries, which this on-disk table deliberately survives —
    * the first graph query in a run pays the build, the other three
    * read (measured at gen-sf1: battery 333 s → 166 s, PERF_NOTES r10).
    */
  private def undEdges(s: SparkSession, dir: String): DataFrame =
    CorpusTable.materialized(s, dir, "graft_edges") {
      pairStream(Tables(s, dir, "documents"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("sup"))
        .filter(col("sup") >= 3L).select("w1", "w2")
    }

  /** Both directions of [[undEdges]] — the symmetric directed edge
    * frame the PageRank family iterates. */
  private def dirEdges(s: SparkSession, dir: String): DataFrame = {
    val und = undEdges(s, dir)
    und.select(col("w1").as("src"), col("w2").as("dst"))
      .union(und.select(col("w2").as("src"), col("w1").as("dst")))
  }

  /** The oracle-side twin of the shared edge scheme: CTEs t/dt/und
    * (+ directed `e` where a consumer asks) — interpolated into every
    * graph oracle so the support rule can never drift between engines.
    */
  private val UndEdgesSql: String =
    """t AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |dt AS (SELECT DISTINCT doc_id, unnest(ts) AS w FROM t),
      |und AS (
      |  SELECT a.w AS w1, b.w AS w2
      |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.w < b.w
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)""".stripMargin
  private val DirEdgesSql: String =
    s"""$UndEdgesSql,
       |e AS (SELECT w1 AS src, w2 AS dst FROM und
       |      UNION ALL SELECT w2 AS src, w1 AS dst FROM und)""".stripMargin

  /** `steps` PageRank supersteps over an edge frame (src, dst) in exact
    * integer e9 arithmetic from the uniform start — the q_pagerank_iter
    * kernel in a driver-orchestrated loop (public so the spec can drive
    * it on an asymmetric synthetic graph where successive steps
    * genuinely differ; see q_pagerank3's fixed-point note).
    *
    * Rank domain: the N nodes with ≥ 1 out-edge (the family's N
    * definition) — carried through EVERY step by a left join from the
    * degree table, so a source-only node (out-edges, no in-edges)
    * keeps its teleport-term rank and keeps contributing. (Review
    * finding: the earlier dst-agg-only rank frame silently dropped
    * such a node after step 1, losing its rank row AND its downstream
    * contributions from step 2 on; the symmetric declared graph never
    * exercised it.)
    */
  def pagerankSteps(e: DataFrame, steps: Int): DataFrame = {
    import graft.functions.ExactMath.divTrunc
    val cached = e.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cached.count() // the immutable graph: cached once, reused every step
    val deg = cached.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    deg.count()
    val nDf = deg.agg(count(lit(1)).as("n_nodes"))
    var rank = deg.crossJoin(broadcast(nDf))
      .select(col("src").as("node"),
        divTrunc(lit(1000000000L), col("n_nodes")).as("r"))
    for (_ <- 1 to steps) {
      val contrib = rank
        .join(deg.withColumnRenamed("src", "node"), "node")
        .select(col("node").as("src"),
          divTrunc(col("r"), col("outdeg")).as("c"))
      val inMass = cached.join(contrib, "src")
        .groupBy(col("dst").as("node")).agg(sum("c").as("m"))
      rank = deg.select(col("src").as("node"))
        .join(inMass, Seq("node"), "left")
        .crossJoin(broadcast(nDf))
        .select(col("node"),
          (divTrunc(lit(15000000000L), col("n_nodes") * 100L) +
            divTrunc(coalesce(col("m"), lit(0L)) * 85L, lit(100L))).as("r"))
    }
    rank
  }

  val entries: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q_pagerank_iter ★ (new r5) — one PageRank power-iteration step
    // (d = 0.85) from the uniform start over the token co-occurrence
    // graph, in EXACT integer e9 arithmetic so both engines agree
    // bit-for-bit: r0 = ⌊1e9/N⌋, contribution(u) = ⌊r0/outdeg(u)⌋,
    // r1(v) = ⌊15·1e9/(100·N)⌋ + ⌊85·Σ_{u→v} contribution(u)/100⌋
    // (teleport term + damped in-mass; every
    // divide is the shared divTrunc/`//` primitive, truncation loss
    // bounded by N+1 e9-units and asserted in the spec). N = nodes
    // with ≥1 edge — isolated tokens (single-token docs) are outside
    // the graph by definition. Further iterations are driver-orchestrated
    // re-runs of the same join+agg on the previous rank frame (the
    // Pregel superstep); one step is declared so the kernel itself is
    // oracle-checked.
    QueryDef(
      "q_pagerank_iter",
      (s: SparkSession, dir: String) => {
        val e = dirEdges(s, dir)
        val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
        val nDf = deg.agg(count(lit(1)).as("n_nodes"))
        val contrib = deg.crossJoin(broadcast(nDf))
          .select(col("src"),
            ExactMath.divTrunc(
              ExactMath.divTrunc(lit(1000000000L), col("n_nodes")),
              col("outdeg")).as("c"))
        e.join(contrib, "src")
          .groupBy(col("dst")).agg(sum(col("c")).as("m"))
          .join(deg.withColumnRenamed("src", "dst"), "dst")
          .crossJoin(broadcast(nDf))
          .select(col("dst").as("token"), col("outdeg"),
            (ExactMath.divTrunc(lit(15000000000L), col("n_nodes") * 100L) +
              ExactMath.divTrunc(col("m") * 85L, lit(100L))).as("pr_e9"))
          .orderBy(col("pr_e9").desc, col("token"))
      },
      Some(s"""WITH $DirEdgesSql,
             |deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
             |n AS (SELECT COUNT(*) AS n_nodes FROM deg),
             |contrib AS (
             |  SELECT src, (1000000000 // n_nodes) // outdeg AS c
             |  FROM deg, n),
             |acc AS (
             |  SELECT e.dst, CAST(SUM(c.c) AS BIGINT) AS m
             |  FROM e JOIN contrib c ON e.src = c.src GROUP BY 1)
             |SELECT acc.dst AS token, deg.outdeg,
             |  CAST(15000000000 // (n_nodes * 100) + (m * 85) // 100 AS BIGINT)
             |    AS pr_e9
             |FROM acc JOIN deg ON acc.dst = deg.src, n
             |ORDER BY pr_e9 DESC, token""".stripMargin)),

    // ------------------------------------------------------------------
    // q_pagerank3 ★ (new r5) — THREE PageRank supersteps, declared:
    // q_pagerank_iter proves the kernel; this proves the ITERATION —
    // the driver-orchestrated loop every Pregel-style computation runs
    // ([[pagerankSteps]]: the rank frame feeds the next contribution
    // join; edges + degrees are computed once and persisted, exactly
    // how a real run caches the immutable graph and re-shuffles only
    // the rank vector). Same exact integer e9 arithmetic as the single
    // step, so both engines agree bit-for-bit after all three steps —
    // the oracle unrolls the identical three (contribution ⋈ edges →
    // agg) rounds as chained CTEs. Per superstep: one dst-keyed
    // shuffle of the rank-sized frame, map-side combined; the graph
    // never re-shuffles. FIXED-POINT NOTE: this near-regular
    // co-occurrence graph reaches its integer fixed point in ONE step
    // (verified: 3-step output ≡ q_pagerank_iter at sf0.001 AND
    // sf0.01), so the cross-engine check here proves the loop
    // preserves exactness through chained truncation; the spec drives
    // [[pagerankSteps]] on an asymmetric synthetic graph where steps
    // 1/2/3 genuinely differ. Truncation loss compounds per step and
    // the spec asserts the 3-step mass bound.
    QueryDef(
      "q_pagerank3",
      (s: SparkSession, dir: String) => {
        pagerankSteps(dirEdges(s, dir), 3)
          .select(col("node").as("token"), col("r").as("pr3_e9"))
          .orderBy(col("pr3_e9").desc, col("token"))
      },
      Some {
        val steps = (1 to 3).map { i =>
          val prev = if (i == 1) "r0" else s"r${i - 1}"
          // rank domain carried by deg each step (kernel scaladoc):
          // a source-only node keeps its teleport rank
          s"""c$i AS (
             |  SELECT p.node AS src, p.r // deg.outdeg AS c
             |  FROM $prev p JOIN deg ON p.node = deg.src),
             |m$i AS (
             |  SELECT e.dst AS node, SUM(c.c) AS m
             |  FROM e JOIN c$i c ON e.src = c.src GROUP BY e.dst),
             |r$i AS (
             |  SELECT deg.src AS node,
             |    15000000000 // (n.n_nodes * 100) + (COALESCE(m$i.m, 0) * 85) // 100 AS r
             |  FROM deg CROSS JOIN n LEFT JOIN m$i ON m$i.node = deg.src)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH $DirEdgesSql,
           |deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
           |n AS (SELECT COUNT(*) AS n_nodes FROM deg),
           |r0 AS (SELECT src AS node, 1000000000 // n_nodes AS r FROM deg, n),
           |$steps
           |SELECT node AS token, CAST(r AS BIGINT) AS pr3_e9
           |FROM r3 ORDER BY pr3_e9 DESC, token""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q_triangles ★ (new r5) — per-node triangle count + local
    // clustering coefficient over the token co-occurrence graph: the
    // community-structure probe (a node whose neighbors interconnect is
    // inside a cluster; one whose neighbors don't is a bridge/hub) and
    // the canonical "join explosion" stress-test of graph analytics.
    // Algorithm: DEGREE-ORDERED edge direction — every undirected edge
    // points from its lower-(deg, node) endpoint to the higher — then
    // wedges are a self-join of directed edges on src and a triangle
    // closes when the wedge's far pair is itself a directed edge. Each
    // triangle is counted exactly ONCE (its minimum-rank vertex owns
    // it), and the wedge fan-out per node is bounded by OUT-degree,
    // which degree-ordering caps at O(√m) whatever the skew — the hub
    // that breaks the naive neighbor self-join (deg² wedges on the hub)
    // generates almost none here, because a hub out-points only to
    // higher-degree nodes. Everything is equi-joins + hash aggs; local
    // clustering = 2·tri/(deg·(deg−1)) in floor-div e4 (0 for deg 1).
    QueryDef(
      "q_triangles",
      (s: SparkSession, dir: String) => {
        val und = undEdges(s, dir)
        val deg = und.select(explode(array(col("w1"), col("w2"))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("deg"))
        val withDeg = und
          .join(deg.select(col("w").as("w1"), col("deg").as("d1")), "w1")
          .join(deg.select(col("w").as("w2"), col("deg").as("d2")), "w2")
        val dirE = withDeg.select(
          when(col("d1") < col("d2") ||
            (col("d1") === col("d2") && col("w1") < col("w2")),
            struct(col("w1").as("src"), col("w2").as("dst"), col("d2").as("dd")))
            .otherwise(
              struct(col("w2").as("src"), col("w1").as("dst"), col("d1").as("dd")))
            .as("e"))
          .select(col("e.src"), col("e.dst"), col("e.dd"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        dirE.count() // eager: wedge join reuses it twice + close join
        // Close check, r8 replan: the wedge stream is the quadratic
        // object here (Σ outdeg² rows — on the r8 Heaps-law corpus it
        // grew past 10^10 at gen-sf1 and the OLD plan's sort-merge close
        // join SORTED it, spilling until the disk filled and the query
        // DIED; the 31-word corpus' 465-edge graph had hidden this).
        // The wedge stream must never reach an exchange: a broadcast
        // bloom over the (src,dst) edge keys filters wedges MAP-SIDE in
        // the same stage that generates them — survivors ≈ triangles +
        // fpp·wedges — and only survivors are shuffled into the exact
        // close join, which removes the false positives, so the RESULT
        // is bit-identical to the unfiltered plan (the q_bloom_join
        // invariant: blooms are physical, invisible in the answer). The
        // bloom is edge-set-sized (~10 bits/edge), not wedge-sized —
        // the same corpus-linear/quadratic asymmetry the degree
        // ordering exploits. Wedge GENERATION stays Σ outdeg² compute:
        // that is the triangle-listing lower bound, now CPU-shaped
        // (codegen join + bloom probe) instead of disk-shaped.
        val edgeKeys = dirE.select(xxhash64(col("src"), col("dst")).as("bc"))
        val wedges = dirE.as("x").join(dirE.as("y"), "src")
          .filter(col("x.dd") < col("y.dd") ||
            (col("x.dd") === col("y.dd") && col("x.dst") < col("y.dst")))
          .select(col("src").as("a"), col("x.dst").as("b"), col("y.dst").as("c"))
          .withColumn("bc", xxhash64(col("b"), col("c")))
        val tris = graft.operators.ScaleOps
          .bloomPrune(wedges, "bc", edgeKeys, "bc")
          .join(dirE.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
        val triPerNode = tris
          .select(explode(array(col("a"), col("b"), col("c"))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("n_tri"))
        deg.join(triPerNode, Seq("w"), "left")
          .select(col("w").as("token"), col("deg"),
            coalesce(col("n_tri"), lit(0L)).as("n_tri"))
          .select(col("token"), col("deg"), col("n_tri"),
            when(col("deg") >= 2L,
              ExactMath.divTrunc(col("n_tri") * 20000L,
                col("deg") * (col("deg") - 1L))).otherwise(0L).as("clust_e4"))
          .orderBy("token")
      },
      Some(s"""WITH $UndEdgesSql,
             |deg AS (
             |  SELECT w, COUNT(*) AS deg FROM (
             |    SELECT w1 AS w FROM und UNION ALL SELECT w2 FROM und)
             |  GROUP BY 1),
             |dir AS (
             |  SELECT CASE WHEN (d1.deg, w1) < (d2.deg, w2) THEN w1 ELSE w2 END AS src,
             |         CASE WHEN (d1.deg, w1) < (d2.deg, w2) THEN w2 ELSE w1 END AS dst,
             |         CASE WHEN (d1.deg, w1) < (d2.deg, w2) THEN d2.deg ELSE d1.deg END AS dd
             |  FROM und JOIN deg d1 ON und.w1 = d1.w JOIN deg d2 ON und.w2 = d2.w),
             |tri AS (
             |  SELECT x.src AS a, x.dst AS b, y.dst AS c
             |  FROM dir x JOIN dir y ON x.src = y.src
             |    AND (x.dd, x.dst) < (y.dd, y.dst)
             |  WHERE EXISTS (SELECT 1 FROM dir z WHERE z.src = x.dst AND z.dst = y.dst)),
             |tpn AS (
             |  SELECT w, COUNT(*) AS n_tri FROM (
             |    SELECT a AS w FROM tri UNION ALL SELECT b FROM tri
             |    UNION ALL SELECT c FROM tri)
             |  GROUP BY 1)
             |SELECT deg.w AS token, CAST(deg.deg AS BIGINT) AS deg,
             |  CAST(COALESCE(tpn.n_tri, 0) AS BIGINT) AS n_tri,
             |  CAST(CASE WHEN deg.deg >= 2
             |    THEN (COALESCE(tpn.n_tri, 0) * 20000) // (deg.deg * (deg.deg - 1))
             |    ELSE 0 END AS BIGINT) AS clust_e4
             |FROM deg LEFT JOIN tpn ON deg.w = tpn.w
             |ORDER BY token""".stripMargin)),

    // ------------------------------------------------------------------
    // q_degree_dist ★ (new r5) — log₂-binned degree distribution of the
    // token co-occurrence graph: the first question asked of any graph
    // at scale (is it power-law? where do the hubs start?) and the
    // input to every skew decision the other graph queries make
    // (q_triangles' degree-ordering, salting thresholds). Undirected
    // degree per node from the distinct edge set, then bucket =
    // ⌊log₂(deg)⌋ computed EXACTLY as the bit length of the degree
    // (Spark: length(bin(deg)); DuckDB: length(format('{:b}', deg)) —
    // integer in both engines, no floating log), with node count and
    // min/max degree per bucket. One per-doc-bounded edge build + two
    // hash aggs; nothing here exceeds vocabulary size.
    QueryDef(
      "q_degree_dist",
      (s: SparkSession, dir: String) => {
        // Map-side pair gen + support threshold via the shared
        // [[undEdges]] (the r6 replan generalized; see its scaladoc).
        undEdges(s, dir)
          .select(explode(array(col("w1"), col("w2"))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("deg"))
          .groupBy((length(bin(col("deg"))) - 1L).cast("long").as("log2_deg"))
          .agg(count(lit(1)).as("n_nodes"),
            min("deg").as("min_deg"), max("deg").as("max_deg"))
          .orderBy("log2_deg")
      },
      Some(s"""WITH $UndEdgesSql,
             |deg AS (
             |  SELECT w, COUNT(*) AS deg FROM (
             |    SELECT w1 AS w FROM und UNION ALL SELECT w2 FROM und)
             |  GROUP BY 1)
             |SELECT CAST(LENGTH(format('{:b}', deg)) - 1 AS BIGINT) AS log2_deg,
             |  COUNT(*) AS n_nodes, CAST(MIN(deg) AS BIGINT) AS min_deg,
             |  CAST(MAX(deg) AS BIGINT) AS max_deg
             |FROM deg GROUP BY 1 ORDER BY log2_deg""".stripMargin))
  )
}
