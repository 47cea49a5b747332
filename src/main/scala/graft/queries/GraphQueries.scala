package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
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
        val dt = Tables(s, dir, "documents")
          .select(col("doc_id"), explode(array_distinct(toks)).as("w"))
        val e = dt.as("a").join(dt.as("b"), "doc_id")
          .filter(col("a.w") =!= col("b.w"))
          .select(col("a.w").as("src"), col("b.w").as("dst"))
          .distinct()
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
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
             |dt AS (SELECT DISTINCT doc_id, unnest(ts) AS w FROM t),
             |e AS (
             |  SELECT DISTINCT a.w AS src, b.w AS dst
             |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.w != b.w),
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
             |ORDER BY pr_e9 DESC, token""".stripMargin))
  )
}
