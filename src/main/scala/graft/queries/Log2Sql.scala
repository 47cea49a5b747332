package graft.queries

/** The DuckDB twin of [[graft.multimodal.Multimodal.log2e20]] as a
  * reusable oracle fragment: given a prior CTE `dom(v)` of BIGINT
  * values (1 ≤ v < 2³³), emits `init`/`it`/`lg` CTEs where
  * `lg(v, l)` carries l = floor(2²⁰·log₂(v)) computed by the exact
  * integer Q30 square-and-shift recurrence — bit-identical to the
  * Spark-side expression by construction, no transcendental call in
  * either engine. Callers must open their oracle with
  * `WITH RECURSIVE` (the `it` CTE is recursive) and splice this after
  * their `dom` definition. One copy shared by q_mm_entropy and q_dsir
  * (the CcSql lesson: duplicated oracle fragments drift).
  */
object Log2Sql {
  /** `sfx` renames the emitted CTEs (`init$sfx`/`it$sfx`/`lg$sfx`,
    * reading `dom$sfx`) so one oracle can carry TWO recurrence
    * instances when a later value domain depends on results computed
    * from an earlier one (q_dsir_eval: selection weights first, then
    * logs of the kept-set counts the selection produced). */
  def cte(sfx: String = ""): String =
    s"""init$sfx AS (SELECT v, CAST(length(format('{:b}', v)) - 1 AS BIGINT) AS e
      |         FROM dom$sfx),
      |it$sfx AS (
      |  SELECT v, e, 0 AS i, (v << 30) >> e AS x, CAST(0 AS BIGINT) AS frac
      |  FROM init$sfx
      |  UNION ALL
      |  SELECT v, e, i + 1,
      |    CASE WHEN ((x * x) >> 30) >= (CAST(2 AS BIGINT) << 30)
      |         THEN ((x * x) >> 30) >> 1 ELSE (x * x) >> 30 END,
      |    CASE WHEN ((x * x) >> 30) >= (CAST(2 AS BIGINT) << 30)
      |         THEN (frac << 1) | 1 ELSE (frac << 1) END
      |  FROM it$sfx WHERE i < 20),
      |lg$sfx AS (SELECT v, (e << 20) | frac AS l FROM it$sfx WHERE i = 20)""".stripMargin
}
