package graft.types

import org.apache.spark.sql.types._

/** Iceberg-style schema model — the 13 types of the reference's
  * coercion switch (`icebergIngest/.../App.java:241-274`, SURVEY.md
  * §1.2), independent of both Iceberg (no runtime jar on this system)
  * and Spark, bridged to `StructType` for reads.
  *
  * Mapping decisions (SURVEY.md §1.2 table):
  *  - TIME → LongType nanos-of-day (no native Spark TIME; lossless).
  *  - TIMESTAMP → TimestampType, accepting epoch-seconds numbers or
  *    ISO-8601 strings (Q1: the reference's own timestamp path is a
  *    latent `ClassCastException`; we keep the capability, fix the
  *    crash).
  *  - MAP keys are strings by construction — `GMap` has no key-type
  *    parameter, so the reference's runtime rejection of non-string
  *    keys (`App.java:311-313`) is a compile-time impossibility here.
  */
sealed trait GType {
  /** Spark type used for the post-coercion, user-facing frame. */
  def spark: DataType
  /** Spark type used in the raw JSON read schema (TIME and TIMESTAMP
    * read as strings, then coerced — see JsonDecode).
    */
  def readSpark: DataType = spark
}

case object GString extends GType { val spark: DataType = StringType }
case object GInt extends GType { val spark: DataType = IntegerType }
case object GLong extends GType { val spark: DataType = LongType }
case object GFloat extends GType { val spark: DataType = FloatType }
case object GDouble extends GType { val spark: DataType = DoubleType }
case object GBoolean extends GType { val spark: DataType = BooleanType }
case object GDate extends GType { val spark: DataType = DateType }
case object GTime extends GType {
  val spark: DataType = LongType // nanos-of-day
  override def readSpark: DataType = StringType
}
case object GTimestamp extends GType {
  val spark: DataType = TimestampType
  override def readSpark: DataType = StringType // ISO or epoch-seconds number
}
final case class GDecimal(precision: Int, scale: Int) extends GType {
  val spark: DataType = DecimalType(precision, scale)
}
final case class GField(name: String, gtype: GType, required: Boolean = false)
final case class GStruct(fields: Seq[GField]) extends GType {
  def spark: DataType = StructType(fields.map(f =>
    StructField(f.name, f.gtype.spark, nullable = !f.required)))
  override def readSpark: DataType = StructType(fields.map(f =>
    StructField(f.name, f.gtype.readSpark, nullable = true)))
}
final case class GList(element: GType) extends GType {
  def spark: DataType = ArrayType(element.spark)
  override def readSpark: DataType = ArrayType(element.readSpark)
}
/** String keys only — A9 contract (`App.java:300-319`). */
final case class GMap(value: GType) extends GType {
  def spark: DataType = MapType(StringType, value.spark)
  override def readSpark: DataType = MapType(StringType, value.readSpark)
}

object GType {
  /** Primitive-type parser mirroring the reference's type-name dispatch
    * (`App.java:241-274`): "string" | "int" | "long" | "float" |
    * "double" | "boolean" | "date" | "time" | "timestamp" |
    * "decimal(p,s)". Anything else → IllegalArgumentException (same
    * fail-fast as `App.java:271-272`).
    */
  private val Dec = """decimal\((\d+),\s*(\d+)\)""".r
  def primitive(name: String): GType = name.trim.toLowerCase match {
    case "string"    => GString
    case "int" | "integer" => GInt
    case "long"      => GLong
    case "float"     => GFloat
    case "double"    => GDouble
    case "boolean"   => GBoolean
    case "date"      => GDate
    case "time"      => GTime
    case "timestamp" => GTimestamp
    case Dec(p, s)   => GDecimal(p.toInt, s.toInt)
    case other => throw new IllegalArgumentException(s"Unsupported type: $other")
  }
}
