package graft

import org.apache.spark.sql.functions._

/** Property checks for the exact-arithmetic primitives the oracle
  * contract leans on: ExactMath integer division (full long range —
  * the pmod-subtraction idiom it replaced was exact only below 2^53)
  * and non-distinct shingling.
  */
class ExactMathSpec extends SparkSpec {
  import spark.implicits._

  test("ExactMath.floorDiv/ceilDiv match BigInt over the full long range") {
    val rnd = new scala.util.Random(42)
    val cases = Seq.tabulate(200) { i =>
      // 62-bit numerators: far beyond the 2^53 double cliff, but with
      // headroom so ceilDiv's a + b - 1 cannot overflow (ANSI mode).
      val a =
        if (i % 4 == 0) rnd.nextLong() & 0x3FFFFFFFFFFFFFFFL // beyond 2^53
        else if (i % 4 == 1) (1L << 53) + rnd.nextInt(1 << 20) // at the cliff
        else rnd.nextInt(1000000).toLong
      val b = 1L + (if (i % 3 == 0) rnd.nextInt(9) else rnd.nextLong() & 0xFFFFL)
      (a, b)
    }
    val got = cases.toDF("a", "b")
      .select(
        graft.functions.ExactMath.floorDiv(col("a"), col("b")).as("fd"),
        graft.functions.ExactMath.ceilDiv(col("a"), col("b")).as("cd"))
      .as[(Long, Long)].collect()
    cases.zip(got).foreach { case ((a, b), (fd, cd)) =>
      assert(fd == (BigInt(a) / BigInt(b)).toLong, s"floorDiv($a, $b)")
      assert(cd == ((BigInt(a) + b - 1) / BigInt(b)).toLong, s"ceilDiv($a, $b)")
    }
  }

  test("floorDiv is TRUE floor on mixed signs (Math.floorDiv); divTrunc truncates (r5)") {
    // ADVICE r4 flagged the old floorDiv (IntegralDivide truncation
    // under a floor-promising name). The split: floorDiv now matches
    // java.lang.Math.floorDiv / Python `//` for every sign
    // combination; divTrunc keeps SQL `div` truncation — which is ALSO
    // what DuckDB 1.0.0's integer `//` computes on mixed signs
    // (verified: -7 // 2 = -3), so divTrunc, not floorDiv, is the
    // oracle-parity primitive for signed division.
    val rnd = new scala.util.Random(99)
    val cases = Seq.tabulate(400) { i =>
      val mag = if (i % 2 == 0) rnd.nextInt(1000).toLong
                else rnd.nextLong() & 0x3FFFFFFFFFFFFFFFL
      val a = if (rnd.nextBoolean()) mag else -mag
      val bm = 1L + (rnd.nextLong() & 0xFFFFL)
      val b = if (rnd.nextBoolean()) bm else -bm
      (a, b)
    } :+ ((-7L, 2L)) :+ ((7L, -2L)) :+ ((-7L, -2L)) :+ ((-6L, 2L)) :+ ((0L, -5L))
    val got = cases.toDF("a", "b")
      .select(
        graft.functions.ExactMath.floorDiv(col("a"), col("b")).as("fd"),
        graft.functions.ExactMath.divTrunc(col("a"), col("b")).as("dt"))
      .as[(Long, Long)].collect()
    cases.zip(got).foreach { case ((a, b), (fd, dt)) =>
      assert(fd == Math.floorDiv(a, b), s"floorDiv($a, $b) = $fd")
      assert(dt == a / b, s"divTrunc($a, $b) = $dt")
    }
  }

  test("log2e20 column == Multimodal.log2e20 across the domain; null in → null out (r13)") {
    val rnd = new scala.util.Random(13)
    val vs: Seq[Long] = Seq(1L, 2L, 3L, 511L, 512L, 513L, (1L << 33) - 1) ++
      Seq.fill(400)(1L + (rnd.nextLong() & ((1L << 33) - 1)) % ((1L << 33) - 1))
    val got = vs.toDF("v")
      .select(graft.functions.ExactMath.log2e20(col("v")).as("l"))
      .as[Long].collect().toSeq
    assert(got == vs.map(graft.multimodal.Multimodal.log2e20))
    val nullGot = Seq[Option[Long]](Some(7L), None).toDF("v")
      .select(graft.functions.ExactMath.log2e20(col("v")).as("l"))
      .as[Option[Long]].collect().toSeq
    assert(nullGot == Seq(Some(graft.multimodal.Multimodal.log2e20(7L)), None))
  }

  test("shinglesAll keeps every window with multiplicity; shingles dedups") {
    val rnd = new scala.util.Random(7)
    val docs = Seq.tabulate(50) { _ =>
      Seq.fill(rnd.nextInt(12))("t" + rnd.nextInt(4)).mkString(" ")
    }
    val rows = docs.toDF("text")
      .select(
        graft.functions.Shingles.shinglesAll(split(col("text"), " "), 2).as("all"),
        graft.functions.Shingles.shingles(split(col("text"), " "), 2).as("dst"))
      .as[(Seq[String], Seq[String])].collect()
    docs.zip(rows).foreach { case (text, (all, dst)) =>
      val want = text.split(" ", -1).toSeq.sliding(2)
        .filter(_.size == 2).map(_.mkString(" ")).toSeq
      assert(all == want, s"multiplicity windows of '$text'")
      assert(dst == want.distinct, s"distinct windows of '$text'")
    }
  }
}
