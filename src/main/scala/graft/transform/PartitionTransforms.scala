package graft.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

import graft.functions.JavaHash.javaHash

/** The reference's Iceberg partition transforms as Spark `Column`
  * functions — reference-faithful, quirks included (SURVEY.md §1.4).
  *
  * Reference implementation: `Utile.buildPartitionData`
  * (`icebergIngest/.../Utile.java:14-71`). Deviations from the Iceberg
  * spec that we deliberately reproduce:
  *
  *  - Q2 `month`: `year*12 + month - 1` (absolute-calendar months,
  *    `Utile.java:40-43`), not months-since-1970.
  *  - Q3 `hour`: hour-of-day 0-23 (`Utile.java:47-48`), not
  *    hours-since-epoch.
  *  - Q4 `bucket[N]`: `(value.hashCode() & Integer.MAX_VALUE) % N`
  *    (`Utile.java:54-63`), Java hashCode rather than Murmur3.
  *  - Q8 null/missing source value → null partition value
  *    (`Utile.java:23-34`): Spark's null propagation gives this for free
  *    (every function below is null-in → null-out).
  *
  * All transforms are plain Catalyst expressions (codegen'd, usable as
  * partition/group/cluster keys at any scale — they shuffle on an int,
  * never on the raw value).
  */
object PartitionTransforms {

  /** `identity` — pass-through (`Utile.java:50-52`). */
  def identity(c: Column): Column = c

  /** `year` — calendar year of a date/timestamp (`Utile.java:44-45`). */
  def yearT(c: Column): Column = year(c)

  /** `month` — Q2-faithful absolute month ordinal (`Utile.java:40-43`). */
  def monthT(c: Column): Column = year(c) * lit(12) + month(c) - lit(1)

  /** `day` — days since epoch (`Utile.java:37-39`, `toEpochDay`). */
  def dayT(c: Column): Column = datediff(c.cast(DateType), to_date(lit("1970-01-01")))

  /** `hour` — Q3-faithful hour-of-day (`Utile.java:47-48`). */
  def hourT(c: Column): Column = hour(c)

  /** `bucket[N]` — Q4-faithful Java-hashCode bucket (`Utile.java:54-63`). */
  def bucket(c: Column, n: Int): Column =
    pmod(javaHash(c).bitwiseAND(lit(Int.MaxValue)), lit(n))

  /** Closed-form bucket for LONG keys, expressible in ANSI SQL (no custom
    * expression) — used where a DuckDB oracle must reproduce the bucket:
    * `Long.hashCode(v) == (int)(v ^ (v >>> 32))`, and masking with
    * Integer.MAX_VALUE keeps only bits 0-30, so the int truncation can be
    * done entirely in 64-bit arithmetic.
    */
  def bucketLongSql(c: Column, n: Int): Column =
    pmod(c.bitwiseXOR(shiftrightunsigned(c, 32)).bitwiseAND(lit(2147483647L)), lit(n.toLong))

  /** Parse a transform spec string exactly like the reference's dispatch
    * (`Utile.java:36-63`): "identity" | "year" | "month" | "day" | "hour"
    * | "bucket[N]" (N defaults to 16 when unparseable, `Utile.java:57-62`).
    */
  def forName(transform: String, c: Column): Column = transform match {
    case "identity" => identity(c)
    case "year"     => yearT(c)
    case "month"    => monthT(c)
    case "day"      => dayT(c)
    case "hour"     => hourT(c)
    case b if b.startsWith("bucket") =>
      val n = "\\d+".r.findFirstIn(b).map(_.toInt).getOrElse(16)
      bucket(c, n)
    case other =>
      throw new IllegalArgumentException(s"Unsupported transform: $other")
  }
}
