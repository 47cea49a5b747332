package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-generated parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `$dir/`. Reads go through the
  * vectorized parquet reader; filters/projections applied by callers are
  * pushed down by Catalyst (verified via .explain: PushedFilters /
  * ReadSchema). At 100 TB these would be directories of many files (or an
  * Iceberg table) — nothing here assumes a single file.
  *
  * Timestamp normalization: the engine's time semantics are
  * instant-based TimestampType under a pinned UTC session zone — the
  * exact semantics DuckDB gives the same naive parquet values, and the
  * only type `withWatermark`/`unix_micros` accept. The driver's
  * generator has shipped the `ts`/date columns as parquet
  * TIMESTAMP(NANOS) (Spark 4 refuses it by default → read via the
  * `legacy.parquet.nanosAsLong` escape hatch and truncate to micros)
  * and as TIMESTAMP(MICROS) with isAdjustedToUTC=false (Spark infers
  * TIMESTAMP_NTZ → cast to TimestampType, a wall-clock-preserving
  * relabel under UTC). Both land on the identical micros instant, so
  * every query and oracle is agnostic to which vintage of testdata it
  * reads.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ→TimestampType cast below is wall-clock-preserving ONLY under
    // a UTC session zone. Pin it here — at the one choke point every table
    // read passes through — rather than relying on each entrypoint's
    // builder (Bench's didn't set it) or the JVM's -Duser.timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val tsFixed =
      // nanos column surfaced as long → truncate to micros timestamp.
      if (name == "events" && df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    // NTZ columns → instant TimestampType (UTC session: same wall clock).
    tsFixed.schema.fields.filter(_.dataType == TimestampNTZType)
      .foldLeft(tsFixed)((d, f) => d.withColumn(f.name, col(f.name).cast(TimestampType)))
  }
}
