package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query of the engine's surface (SURVEY.md §2 Part B).
  *
  * @param name   key in `SparkEntry.queries`
  * @param query  (session, sf dir) → result DataFrame; must end in a
  *               total ORDER BY for oracle determinism
  * @param oracle equivalent DuckDB SQL over the same parquet tables, or
  *               None for non-SQL-expressible operators (driver then
  *               records a rows-only check; correctness is covered by
  *               ScalaTest instead)
  */
final case class QueryDef(
    name: String,
    query: (SparkSession, String) => DataFrame,
    oracle: Option[String])
