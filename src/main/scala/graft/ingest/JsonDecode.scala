package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.types._

/** JSON-lines decode against a fixed schema — the reference's
  * `parseJsonToRecord` (`App.java:211-239`, SURVEY.md A5-A9) as one
  * schema'd Spark JSON read:
  *
  *  - schema-driven projection: extra JSON keys dropped, missing fields
  *    null (`App.java:219-232`) — free with an explicit read schema;
  *  - malformed JSON line → row silently dropped (Q7,
  *    `App.java:235-238`) — `mode=DROPMALFORMED`;
  *  - DATE parsed strictly as `yyyy-MM-dd` (`App.java:257-259`) — the
  *    Spark JSON default `dateFormat`;
  *  - TIME read as string, coerced to nanos-of-day LongType (micro
  *    precision — Spark's finest);
  *  - TIMESTAMP read as string/number, coerced from either ISO-8601 or
  *    epoch seconds (the Q1 decision, SURVEY.md §1.4).
  *
  * Deviation from the reference, documented: a *well-formed* line whose
  * field fails coercion nulls that field rather than dropping the whole
  * row (the reference's catch-all at `App.java:235-238` drops the row).
  * Field-level nulling loses strictly less data; Q7 here applies to
  * JSON syntax errors. TIME/TIMESTAMP coercion is supported at the top
  * level (nested struct/list/map support the other 11 types).
  */
object JsonDecode {

  /** Raw read schema: TIME/TIMESTAMP as strings (coerced after). */
  def readSchema(schema: GStruct): StructType =
    schema.readSpark.asInstanceOf[StructType]

  private def coerce(f: GField): Column = f.gtype match {
    case GTime =>
      // "HH:mm:ss[.SSSSSS]" → nanos-of-day (micros * 1000).
      (unix_micros(try_to_timestamp(concat(lit("1970-01-01 "), col(f.name))))
        * 1000L).as(f.name)
    case GTimestamp =>
      coalesce(
        try_to_timestamp(col(f.name)),
        timestamp_seconds(expr(s"try_cast(${f.name} AS DOUBLE)"))).as(f.name)
    case _ => col(f.name)
  }

  /** Top-level TIME/TIMESTAMP coercion over an already-read raw frame
    * (shared by the batch and streaming paths).
    */
  def decodeRaw(raw: DataFrame, schema: GStruct): DataFrame =
    raw.select(schema.fields.map(coerce): _*)

  /** Decode newline-delimited JSON files into the schema's frame. */
  def read(spark: SparkSession, schema: GStruct, paths: Seq[String]): DataFrame =
    decodeRaw(
      spark.read
        .schema(readSchema(schema))
        .option("mode", "DROPMALFORMED")
        .json(paths: _*),
      schema)

  /** Decode an in-memory JSON-string column (same semantics, used by
    * the streaming path and tests).
    */
  def decodeColumn(df: DataFrame, jsonCol: String, schema: GStruct): DataFrame = {
    val parsed = df.select(
      from_json(col(jsonCol), readSchema(schema), Map("mode" -> "DROPMALFORMED")).as("r"))
      // from_json cannot drop rows; a malformed line yields an all-null
      // struct — filter it to reproduce the file-read Q7 semantics.
      .filter(col("r").isNotNull)
      .select(col("r.*"))
    parsed.select(schema.fields.map(coerce): _*)
  }
}
