package graft

import org.apache.spark.sql.functions._
import graft.transform.{PartitionTransforms => PT}

/** Reference-faithful partition transform semantics (SURVEY.md §1.4
  * quirks Q2/Q3/Q4/Q8), checked against hand-computed expectations
  * from the reference's `Utile.buildPartitionData`.
  */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq("2024-03-15 10:23:45").toDF("s")
      .select(c.as("v")).collect()(0).getAs[T]("v")

  private val ts = to_timestamp(col("s"))

  test("year transform = calendar year") {
    assert(one[Int](PT.yearT(ts)) == 2024)
  }

  test("month transform = year*12 + month - 1 (Q2, NOT months-since-epoch)") {
    // 2024*12 + 3 - 1 = 24290 — the reference's absolute ordinal.
    assert(one[Int](PT.monthT(ts)) == 24290)
  }

  test("day transform = days since epoch") {
    // LocalDate.of(2024,3,15).toEpochDay == 19797
    assert(one[Int](PT.dayT(ts)) == 19797)
  }

  test("hour transform = hour-of-day 0-23 (Q3, NOT hours-since-epoch)") {
    assert(one[Int](PT.hourT(ts)) == 10)
  }

  test("bucket[N] = (hashCode & MaxInt) % N over long keys (Q4)") {
    val vals = Seq(0L, 1L, -1L, 42L, 123456789012L, Long.MinValue, Long.MaxValue)
    val got = vals.toDF("v").select(PT.bucket(col("v"), 16).as("b"))
      .collect().map(_.getAs[Int]("b")).toSeq
    val want = vals.map(v => (java.lang.Long.hashCode(v) & Int.MaxValue) % 16)
    assert(got == want)
  }

  test("bucketLongSql closed form == JavaHash bucket for longs") {
    val df = Tables(spark, sfDir, "events")
    val bad = df.select(PT.bucket(col("user_id"), 16).as("a"),
      PT.bucketLongSql(col("user_id"), 16).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(bad == 0)
  }

  test("null source value → null partition value (Q8)") {
    // In the reference, malformed dates die at JSON-decode time (Q7);
    // the transform only ever sees a typed value or null (Utile.java:23-34).
    val row = Seq[(java.lang.Long, String)]((null, null)).toDF("v", "s")
      .select(PT.bucket(col("v"), 16).as("b"), PT.dayT(col("s")).as("d"))
      .collect()(0)
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("forName dispatches like the reference incl. bucket[N] default 16") {
    val c = lit(42L)
    assert(one[Int](PT.forName("bucket[7]", c)) == (java.lang.Long.hashCode(42L) & Int.MaxValue) % 7)
    assert(one[Int](PT.forName("bucketXX", c)) == (java.lang.Long.hashCode(42L) & Int.MaxValue) % 16)
    intercept[IllegalArgumentException](PT.forName("nope", c))
  }
}
