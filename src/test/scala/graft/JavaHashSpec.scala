package graft

import org.apache.spark.sql.functions._

import graft.functions.JavaHash.javaHash

/** Property: the JavaHash expression equals the JVM's own
  * `Object.hashCode` for every supported type (the reference's bucket
  * transform contract, SURVEY.md Q4). Seeded sampling — the
  * scalatestplus scalacheck bridge isn't in the offline cache.
  */
class JavaHashSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(42)

  test("long hash matches Long.hashCode (incl. extremes)") {
    val vs = Seq(0L, -1L, 1L, Long.MinValue, Long.MaxValue) ++
      Seq.fill(40)(rng.nextLong())
    val got = vs.toDF("v").select(javaHash(col("v"))).collect().map(_.getInt(0)).toSeq
    assert(got == vs.map(java.lang.Long.hashCode))
  }

  test("int hash is identity") {
    val vs = Seq(0, -1, Int.MinValue, Int.MaxValue) ++ Seq.fill(40)(rng.nextInt())
    val got = vs.toDF("v").select(javaHash(col("v"))).collect().map(_.getInt(0)).toSeq
    assert(got == vs)
  }

  test("string hash matches String.hashCode (unicode incl.)") {
    val vs = Seq("", "wörld", "中文字符", "a b", "events/") ++
      Seq.fill(40)(rng.alphanumeric.take(rng.nextInt(20)).mkString)
    val got = vs.map(Tuple1(_)).toDF("v").select(javaHash(col("v")))
      .collect().map(_.getInt(0)).toSeq
    assert(got == vs.map(_.hashCode))
  }

  test("double/float/boolean hash matches JVM boxed hashCode") {
    val rows = Seq((3.14, 2.5f, true), (-0.0, -0.0f, false),
      (Double.NaN, Float.NaN, true), (Double.MaxValue, Float.MinValue, false))
    val got = rows.toDF("d", "f", "b")
      .select(javaHash(col("d")), javaHash(col("f")), javaHash(col("b")))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    val want = rows.map { case (d, f, b) =>
      (java.lang.Double.hashCode(d), java.lang.Float.hashCode(f),
        java.lang.Boolean.hashCode(b))
    }
    assert(got == want)
  }

  test("date hash matches LocalDate.hashCode (reference holds LocalDate)") {
    val dates = Seq("1970-01-01", "2024-03-15", "1969-12-31")
    val got = dates.toDF("s").select(javaHash(to_date(col("s"))))
      .collect().map(_.getInt(0)).toSeq
    val want = dates.map(java.time.LocalDate.parse(_).hashCode)
    assert(got == want)
  }

  test("decimal hash matches BigDecimal.hashCode") {
    val got = Seq("123.45", "-0.01").toDF("s")
      .select(javaHash(col("s").cast("decimal(12,2)"))).collect().map(_.getInt(0)).toSeq
    val want = Seq(new java.math.BigDecimal("123.45").setScale(2),
      new java.math.BigDecimal("-0.01").setScale(2)).map(_.hashCode)
    assert(got == want)
  }
}
