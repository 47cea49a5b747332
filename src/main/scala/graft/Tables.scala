package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loader for the driver-generated parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `$dir/`. Reads go through the
  * vectorized parquet reader; filters/projections applied by callers are
  * pushed down by Catalyst (verified via .explain: PushedFilters /
  * ReadSchema). At 100 TB these would be directories of many files (or an
  * Iceberg table) — nothing here assumes a single file.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
  * default (PARQUET_TYPE_ILLEGAL). We read it via the
  * `legacy.parquet.nanosAsLong` escape hatch and truncate to a micros
  * TimestampType column — the same value DuckDB produces with
  * `CAST(ts AS TIMESTAMP)`, which is what every oracle SQL uses.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // nanos column surfaced as long → truncate to micros timestamp.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
