package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._
import graft.transform.PartitionTransforms._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every declared query of the engine (SURVEY.md §2 Part B). */
  def allQueries: Seq[QueryDef] =
    CoreQueries.entries ++ RelationalQueries.entries ++ TpchQueries.entries ++
      WindowQueries.entries ++
      TypesQueries.entries ++ TextQueries.entries ++ DedupQueries.entries ++
      SimilarityQueries.entries ++ IngestQueries.entries ++ MultimodalQueries.entries ++
      AdvancedQueries.entries ++ ProfileQueries.entries ++ GraphQueries.entries ++
      StreamingQueries.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The SURVEY §7 minimum slice: scan → day partition transform (A13) →
    * hash agg (A17) → total sort.
    */
  def entry(spark: SparkSession): DataFrame =
    Tables(spark, "/root/testdata/sf0.001", "events")
      .groupBy(dayT(col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .orderBy("d", "event_type")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.query).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
