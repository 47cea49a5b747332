package graft

import org.apache.spark.sql.functions._

/** Driver-side references for the r5 profiling batch (q_profile_stats,
  * q_histogram) and the salted-join equivalence property
  * (q_join_salted must equal the plain join it re-partitions).
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def eventRows =
    Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"), col("props"))
      .collect()

  test("q_profile_stats matches a driver-side per-column profile") {
    val rows = eventRows
    val n = rows.length.toLong
    def longCol(i: Int) = rows.map(r => Option(r.get(i)).map(_.asInstanceOf[Number].longValue))
    def strCol(i: Int) = rows.map(r => Option(r.get(i)).map(_.toString))
    def profNum(name: String, vs: Seq[Option[Long]]) = {
      val d = vs.flatten
      (name, n, vs.count(_.isEmpty).toLong, d.distinct.size.toLong,
        d.min.toString, d.max.toString)
    }
    def profStr(name: String, vs: Seq[Option[String]]) = {
      val d = vs.flatten
      (name, n, vs.count(_.isEmpty).toLong, d.distinct.size.toLong, d.min, d.max)
    }
    val want = Seq(
      profNum("cents", longCol(3)),
      profNum("event_id", longCol(0)),
      profStr("event_type", strCol(2)),
      profStr("props", strCol(4)),
      profNum("user_id", longCol(1)))
    val got = SparkEntry.queries("q_profile_stats")(spark, sfDir)
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(got == want)
  }

  test("q_histogram matches a driver-side binning") {
    val want = eventRows
      .map(r => (r.getString(2), r.getLong(3) / 500L))
      .groupBy(identity).map { case ((t, b), o) => (t, b, b * 500L, o.size.toLong) }
      .toSeq.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q_histogram")(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("q_skew_stats matches a driver-side key-histogram reference (r5)") {
    val counts = Tables(spark, sfDir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toSeq
    val ns = counts.map(_._2).sorted
    val nKeys = counts.size.toLong
    val nRows = ns.sum
    val p99 = ns(((nKeys - 1) * 99 / 100).toInt)
    val top = counts.maxBy { case (k, n) => (n, -k) }._1
    val want = (nKeys, nRows, ns.max, p99, top, ns.max * 10000L * nKeys / nRows)
    val got = SparkEntry.queries("q_skew_stats")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(got == want)
  }

  test("q_cdc_state: last-writer-wins with tombstones matches a driver-side fold (r5)") {
    val rows = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        // full micros precision — cast("long") would truncate to whole
        // SECONDS and resolve same-second orderings by event_id where
        // the query under test resolves them by sub-second ts
        unix_micros(col("ts")).as("tsm"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long, String, Long, Long)].collect()
    val want = rows.groupBy(_._1).flatMap { case (uid, evs) =>
      val last = evs.maxBy(e => (e._4, e._2)) // (ts, event_id) last writer
      if (last._3 == "error") None // tombstone: key deleted
      else Some((uid, last._2, last._3, last._5))
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_cdc_state")(spark, sfDir)
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(got == want)
    // tombstones actually delete: some user must be absent
    val allUsers = rows.map(_._1).distinct.size
    assert(got.size < allUsers, "expected at least one tombstoned user")
  }

  test("q_scd2: versioned validity intervals match a driver-side run-length fold (r5)") {
    val rows = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tsm"))
      .as[(Long, Long, String, Long)].collect()
    val want = rows.groupBy(_._1).toSeq.flatMap { case (uid, evs) =>
      val ordered = evs.sortBy(e => (e._4, e._2))
      val runs = ordered.foldLeft(Vector.empty[(String, Long)]) { (acc, e) =>
        if (acc.nonEmpty && acc.last._1 == e._3) acc else acc :+ ((e._3, e._4))
      }
      runs.zipWithIndex.map { case ((st, from), i) =>
        val to = if (i + 1 < runs.size) Some(runs(i + 1)._2) else None
        (uid, i + 1, st, from, to, if (to.isEmpty) 1 else 0)
      }
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q_scd2")(spark, sfDir)
      .select(col("user_id"), col("version"), col("state"),
        unix_micros(col("valid_from")).as("f"),
        unix_micros(col("valid_to")).as("t"), col("is_current"))
      .as[(Long, Int, String, Long, Option[Long], Int)].collect().toSeq
    assert(got == want)
    // exactly one open (current) interval per user — the tiling invariant
    assert(got.count(_._6 == 1) == rows.map(_._1).distinct.size)
    // and versions within a user strictly alternate states
    got.groupBy(_._1).foreach { case (_, vs) =>
      vs.sortBy(_._2).sliding(2).foreach {
        case Seq(a, b) => assert(a._3 != b._3, s"adjacent versions share state: $a $b")
        case _ =>
      }
    }
  }

  test("q_equi_depth: decile bins match a driver-side ntile fold (r5)") {
    val rows = Tables(spark, sfDir, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"),
        col("event_id"))
      .as[(String, Long, Long)].collect()
    val want = rows.groupBy(_._1).toSeq.flatMap { case (t, es) =>
      val ordered = es.sortBy(e => (e._2, e._3))
      val n = ordered.size
      // ntile semantics: first n%10 buckets carry the extra row
      val sizes = (0 until 10).map(i => n / 10 + (if (i < n % 10) 1 else 0))
      val bounds = sizes.scanLeft(0)(_ + _)
      (0 until 10).filter(sizes(_) > 0).map { i =>
        val slice = ordered.slice(bounds(i), bounds(i + 1))
        (t, i + 1, slice.size.toLong, slice.map(_._2).min, slice.map(_._2).max)
      }
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q_equi_depth")(spark, sfDir)
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // depth property: within a type, bucket sizes differ by at most 1
    // and boundaries are monotone
    got.groupBy(_._1).foreach { case (_, bs) =>
      assert(bs.map(_._3).max - bs.map(_._3).min <= 1)
      bs.sortBy(_._2).sliding(2).foreach {
        case Seq(a, b) => assert(a._5 <= b._4, s"boundaries cross: $a $b")
        case _ =>
      }
    }
  }

  test("q_rfm matches a driver-side quintile fold (r5)") {
    val ev = Tables(spark, sfDir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"),
        round(col("value") * 100).cast("long").as("c"))
      .as[(Long, java.sql.Date, Long)].collect().toSeq
    val users = ev.groupBy(_._1).toSeq.map { case (uid, es) =>
      (uid, es.map(_._2.toLocalDate.toEpochDay).max, es.size.toLong,
        es.map(_._3).sum)
    }
    val mxd = users.map(_._2).max
    val base = users.map(u => (u._1, (mxd - u._2).toInt, u._3, u._4))
    def quintile[K](keyed: Seq[(Long, K)])(implicit ord: Ordering[K]): Map[Long, Int] = {
      val sorted = keyed.sortBy(_._2)
      val n = sorted.size
      val sizes = (0 until 5).map(i => n / 5 + (if (i < n % 5) 1 else 0))
      val bounds = sizes.scanLeft(0)(_ + _)
      (for (b <- 0 until 5; i <- bounds(b) until bounds(b + 1))
        yield sorted(i)._1 -> (6 - (b + 1))).toMap
    }
    val r = quintile(base.map(u => (u._1, (u._2, u._1))))
    val f = quintile(base.map(u => (u._1, (-u._3, u._1))))
    val m = quintile(base.map(u => (u._1, (-u._4, u._1))))
    val want = base.map { u =>
      (u._1, u._2, u._3, u._4, r(u._1), f(u._1), m(u._1),
        r(u._1) * 100 + f(u._1) * 10 + m(u._1))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_rfm")(spark, sfDir)
      .as[(Long, Int, Long, Long, Int, Int, Int, Int)].collect().toSeq
    assert(got == want)
    // each score uses the full 1..5 range on this fixture
    for (i <- Seq(5, 6, 7)) {
      val vals = got.map(t => t.productElement(i - 1).asInstanceOf[Int]).toSet
      assert(vals == Set(1, 2, 3, 4, 5), s"score column $i range: $vals")
    }
  }

  test("q_streaks matches a driver-side island fold (r5)") {
    val rows = Tables(spark, sfDir, "events")
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).as("d"))
      .distinct().as[(Long, Int)].collect().toSeq
    val want = rows.groupBy(_._1).toSeq.map { case (uid, ds) =>
      val days = ds.map(_._2).distinct.sorted
      val islands = days.foldLeft(List.empty[List[Int]]) { (acc, d) =>
        acc match {
          case (h :: hs) :: t if d == h + 1 => (d :: h :: hs) :: t
          case _ => List(d) :: acc
        }
      }
      (uid, islands.map(_.size).max.toLong, islands.size.toLong,
        days.size.toLong)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_streaks")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // islands partition the active days
    got.foreach(r => assert(r._2 <= r._4 && r._3 <= r._4))
  }

  test("q_join_salted == the plain unsalted join (salting must not change the answer)") {
    val want = Tables(spark, sfDir, "events")
      .select(col("user_id"), round(col("value") * 100).cast("long").as("cents"))
      .join(Tables(spark, sfDir, "customer"),
        col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"), sum("cents").as("sum_cents"))
      .orderBy("c_mktsegment")
      .as[(String, Long, Long)].collect().toSeq
    val got = SparkEntry.queries("q_join_salted")(spark, sfDir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == want)
    // and the salt really fans out: every fact row matched exactly once
    assert(got.map(_._2).sum == want.map(_._2).sum)
  }

  test("q_rate_anomaly matches a driver-side trailing-baseline fold; both flag branches live (r5)") {
    def fold(byDay: Seq[(java.sql.Date, Long, Long)]) = byDay.flatMap { case (d, n, ne) =>
      val di = d.toLocalDate.toEpochDay
      val trail = byDay.filter { t =>
        val ti = t._1.toLocalDate.toEpochDay; ti >= di - 7 && ti <= di - 1
      }
      if (trail.isEmpty) None
      else {
        val (tn, te) = (trail.map(_._2).sum, trail.map(_._3).sum)
        val (rate, tr) = (ne * 10000L / n, te * 10000L / tn)
        Some((d, n, ne, rate, tr, math.abs(rate - tr),
          if (math.abs(ne * tn - te * n) * 100L > 3L * n * tn) 1 else 0))
      }
    }.sortBy(_._1.getTime)
    val byDay = Tables(spark, sfDir, "events")
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .as[(java.sql.Date, String)].collect()
      .groupBy(_._1).toSeq
      .map { case (d, xs) => (d, xs.length.toLong, xs.count(_._2 == "error").toLong) }
    val got = SparkEntry.queries("q_rate_anomaly")(spark, sfDir)
      .as[(java.sql.Date, Long, Long, Long, Long, Long, Int)].collect().toSeq
    assert(got == fold(byDay))
    assert(got.exists(_._7 == 1) && got.exists(_._7 == 0), "both flag branches must be live")
    // gap semantics: a 10-day outage must EMPTY the baseline (RANGE),
    // not stretch it onto stale days (ROWS would) — the post-gap day
    // has no trailing row and is absent from the output
    def day(s: String) = java.sql.Date.valueOf(s)
    val syn = Seq(
      (day("2024-01-01"), 100L, 20L), (day("2024-01-02"), 100L, 30L),
      (day("2024-01-12"), 100L, 25L), (day("2024-01-13"), 100L, 25L))
    val gotSyn = graft.queries.ProfileQueries
      .rateAnomaly(syn.toDF("day", "n", "n_err"))
      .as[(java.sql.Date, Long, Long, Long, Long, Long, Int)].collect().toSeq
    assert(gotSyn == fold(syn))
    assert(gotSyn.map(_._1) == Seq(day("2024-01-02"), day("2024-01-13")),
      "2024-01-12 must have NO baseline after the gap")
  }

  test("q_outlier_fences matches a driver-side reference; low fence proven live on synthetic data (r5)") {
    def fences(rows: Seq[(String, Long)]) =
      rows.groupBy(_._1).toSeq.map { case (g, xs) =>
        val v = xs.map(_._2).sorted
        val n = v.length.toLong
        def q(p: Int) = v((((n - 1) * p) / 100).toInt)
        val (q1, q3) = (q(25), q(75))
        val iqr = q3 - q1
        val nLow = v.count(c => 2 * c < 2 * q1 - 3 * iqr).toLong
        val nHigh = v.count(c => 2 * c > 2 * q3 + 3 * iqr).toLong
        (g, n, q1, q3, iqr, nLow, nHigh, ((nLow + nHigh) * 20000L + n) / (2 * n))
      }.sortBy(_._1)
    val cs = Tables(spark, sfDir, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
      .as[(String, Long)].collect().toSeq
    val got = SparkEntry.queries("q_outlier_fences")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == fences(cs))
    // the high fence is live on the fixture (right-skewed value)...
    assert(got.forall(_._7 > 0))
    // ...and the lower fence, structurally dead on non-negative values,
    // is proven on a synthetic group with one outlier on each side
    val syn = Seq.tabulate(101)(i => ("g", 1000L + i)) ++
      Seq(("g", -5000L), ("g", 20000L))
    val gotSyn = graft.queries.ProfileQueries.tukeyFences(syn.toDF("event_type", "c"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(gotSyn == fences(syn))
    assert(gotSyn.head._6 == 1L && gotSyn.head._7 == 1L)
  }

  test("q_trend_ols matches the driver-side closed-form slope (r5)") {
    val daily = Tables(spark, sfDir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .select(col("event_type"), datediff(col("day"), lit("1970-01-01")).as("di"),
        col("y"))
      .as[(String, Int, Long)].collect()
    val mn = daily.map(_._2).min
    val want = daily.groupBy(_._1).map { case (t, ds) =>
      val xs = ds.map(d => (d._2 - mn).toLong)
      val ys = ds.map(_._3)
      val n = ds.length.toLong
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val sxx = xs.map(x => x * x).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      (t, n, sy, num, den, num * 1000000L / den)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_trend_ols")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // slopes must not all share a sign on this fixture (trend detection
    // has to be able to say "flat-ish" per type, not just echo volume)
    assert(got.map(r => math.signum(r._4.toDouble)).distinct.size >= 2)
    // degenerate-group guard fires: a single-day type never reaches the
    // divide (it would null in Spark and raise in DuckDB)
    val withDegenerate = Seq(
      ("multi", "2024-01-01", 10L), ("multi", "2024-01-02", 20L),
      ("oneday", "2024-01-01", 5L))
      .toDF("event_type", "day", "y")
      .select(col("event_type"), to_date(col("day")).as("day"), col("y"))
    val guarded = graft.queries.ProfileQueries.olsTrend(withDegenerate)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(guarded.map(_._1) == Seq("multi"))
    assert(guarded.head._6 == 10000000L) // slope exactly +10/day in e6
  }

  test("q_winsorize: clipping bounds, counts and means match a driver fold (r5)") {
    val rows = Tables(spark, sfDir, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .as[(String, Long)].collect()
    val want = rows.groupBy(_._1).map { case (t, vs) =>
      val cs = vs.map(_._2).sorted
      val n = cs.length.toLong
      def at(p: Int) = cs((((n - 1) * p) / 100).toInt)
      val (p5, p95) = (at(5), at(95))
      val w = cs.map(c => math.max(p5, math.min(p95, c)))
      (t, n, p5, p95, cs.sum, w.sum,
        cs.count(_ < p5).toLong, cs.count(_ > p95).toLong,
        cs.sum / n, w.sum / n)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_winsorize")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == want)
    // both tails clip on every type (p5/p95 are interior order stats)
    got.foreach { r => assert(r._7 > 0L && r._8 > 0L) }
  }

  test("q_benford: shares sum to ~1e6 and the uniform fixture deviates (r5)") {
    val got = SparkEntry.queries("q_benford")(spark, sfDir)
      .as[(String, Int, Long, Long, Long, Long, Long)].collect().toSeq
    // driver-side reference
    val rows = Tables(spark, sfDir, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .as[(String, Long)].collect().filter(_._2 > 0L)
    val benford = Map(1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L,
      5 -> 79181L, 6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)
    val want = rows.map { case (t, c) => (t, c.toString.head.asDigit) }
      .groupBy(identity).map { case ((t, d), o) => ((t, d), o.size.toLong) }
    val byType = rows.groupBy(_._1).map { case (t, o) => (t, o.size.toLong) }
    got.foreach { case (t, d, nd, n, share, bf, dev) =>
      assert(nd == want((t, d)) && n == byType(t))
      assert(share == nd * 1000000L / n && bf == benford(d))
      assert(dev == math.abs(share - bf))
    }
    // per type: 9 digits present, shares sum to 1e6 − (rounding loss < 9)
    got.groupBy(_._1).foreach { case (_, ds) =>
      assert(ds.map(_._2).sorted == (1 to 9))
      val s = ds.map(_._5).sum
      assert(s > 1000000L - 9 && s <= 1000000L)
    }
    // a uniform generator is exactly what Benford flags: big deviation
    assert(got.map(_._7).max > 50000L)
  }

  test("q_lag_features matches a driver fold; no self-leak into the trailing count (r5)") {
    val rows = Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")))
      .as[(Long, Long, Long)].collect().toSeq
    val want = rows.groupBy(_._2).toSeq.flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (e._3, e._1))
      sorted.zipWithIndex.map { case ((eid, _, tsm), i) =>
        val since = if (i == 0) -1L else tsm - sorted(i - 1)._3
        val n1h = es.count(o => o._3 >= tsm - 3600000000L && o._3 <= tsm - 1L)
        (eid, uid, since, n1h.toLong)
      }
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_lag_features")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // a first event per user exists and is marked -1; the trailing
    // count never includes the event itself (self-leak guard)
    assert(got.count(_._3 == -1L) == rows.map(_._2).distinct.size)
    assert(got.exists(_._4 > 0L))
  }

  test("q_abtest: A/A split stays flat; flag fires on a real difference (r5)") {
    import graft.queries.ProfileQueries
    // driver fold of the declared query
    val users = Tables(spark, sfDir, "events")
      .groupBy("user_id")
      .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >
        sum(when(col("event_type") === "error", 1L).otherwise(0L)))
        .cast("long").as("converted"))
      .as[(Long, Long)].collect().toSeq
    def arm(uid: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(uid.toString.getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(
        md.take(8).map("%02x".format(_)).mkString.take(15), 16)
      ((h % 2) + 2) % 2
    }
    val byArm = users.groupBy(u => arm(u._1))
      .map { case (a, xs) => (a, xs.size.toLong, xs.map(_._2).sum) }
    val Seq((_, n1, x1), (_, n2, x2)) = byArm.toSeq.sortBy(_._1)
    def chi(n1: Long, x1: Long, n2: Long, x2: Long): Int = {
      val d = BigInt(x1 * (n2 - x2) - x2 * (n1 - x1))
      val x = x1 + x2; val nn = n1 + n2
      if (x > 0 && x < nn &&
        100 * BigInt(nn) * d * d >= 384 * BigInt(n1) * n2 * x * (nn - x)) 1 else 0
    }
    val want = (n1, x1, x1 * 10000L / n1, n2, x2, x2 * 10000L / n2,
      x2 * 10000L / n2 - x1 * 10000L / n1, chi(n1, x1, n2, x2))
    val got = SparkEntry.queries("q_abtest")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Int)].head()
    assert(got == want)
    // the A/A discipline: hash assignment independent of behavior must
    // NOT read significant
    assert(got._8 == 0, s"A/A split read significant: $got")
    // the flag fires on a genuine difference (40% vs 60%, n=1000/arm)…
    def run(rows: Seq[(Long, Long, Long)]) =
      ProfileQueries.abTest(rows.toDF("arm", "n", "x"))
        .as[(Long, Long, Long, Long, Long, Long, Long, Int)].head()
    assert(run(Seq((0L, 1000L, 400L), (1L, 1000L, 600L)))._8 == 1)
    // …stays quiet on a within-noise difference…
    assert(run(Seq((0L, 1000L, 500L), (1L, 1000L, 510L)))._8 == 0)
    // …and the zero-variance boundaries never divide by zero
    assert(run(Seq((0L, 100L, 0L), (1L, 100L, 0L)))._8 == 0)
    assert(run(Seq((0L, 100L, 100L), (1L, 100L, 100L)))._8 == 0)
  }

  test("q_user_overlap matches a driver-side set fold (r5)") {
    val rows = Tables(spark, sfDir, "events")
      .select(col("event_type"), col("user_id")).as[(String, Long)]
      .collect().toSeq.distinct
    val byType = rows.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    val want = byType.keys.toSeq.sorted.combinations(2).toSeq.flatMap {
      case Seq(a, b) =>
        val sh = byType(a).intersect(byType(b)).size.toLong
        if (sh == 0) None
        else {
          val (na, nb) = (byType(a).size.toLong, byType(b).size.toLong)
          Some((a, b, sh, na, nb, sh * 1000000L / (na + nb - sh)))
        }
      case _ => None
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q_user_overlap")(spark, sfDir)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // all C(5,2) pairs overlap on this dense fixture, jaccard ≤ 1e6
    assert(got.size == 10 && got.forall(_._6 <= 1000000L))
  }

  test("q_seasonality matches a driver fold; concentration bounded by [flat, spike] (r5)") {
    val rows = Tables(spark, sfDir, "events")
      .select(col("event_type"), hour(col("ts"))).as[(String, Int)].collect().toSeq
    val want = rows.groupBy(_._1).map { case (t, xs) =>
      val byH = xs.groupBy(_._2).map { case (h, o) => (h, o.size.toLong) }
      val n = xs.size.toLong
      val mx = byH.values.max
      val peak = byH.filter(_._2 == mx).keys.min
      val sq = byH.values.map(v => v * v).sum
      (t, n, peak, mx, mx * 1000000L / n, sq * 1000000L / (n * n))
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_seasonality")(spark, sfDir)
      .as[(String, Long, Int, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // Simpson bounds: ≥ flat 1e6/24 (41666), ≤ 1e6; uniform fixture
    // sits near flat
    got.foreach { r =>
      assert(r._6 >= 41666L && r._6 <= 1000000L)
      assert(r._6 < 100000L, s"${r._1} unexpectedly concentrated: ${r._6}")
    }
  }

  test("q_fk_orphans: clean star audits green; a corrupted batch fires the counter (r5)") {
    import graft.queries.ProfileQueries
    val got = SparkEntry.queries("q_fk_orphans")(spark, sfDir)
      .as[(String, Long, Long, Int)].collect().toSeq
    // driver-side reference over the two heaviest edges
    def keys(t: String, c: String) =
      Tables(spark, sfDir, t).select(col(c).cast("long")).as[Long].collect()
    val orders = keys("orders", "o_orderkey").toSet
    val liOrphans = keys("lineitem", "l_orderkey").count(!orders.contains(_)).toLong
    val custs = keys("customer", "c_custkey").toSet
    val orOrphans = keys("orders", "o_custkey").count(!custs.contains(_)).toLong
    val m = got.map(r => r._1 -> r).toMap
    assert(m("lineitem.l_orderkey->orders")._3 == liOrphans)
    assert(m("orders.o_custkey->customer")._3 == orOrphans)
    assert(got.size == 5 && got.forall(r => (r._3 == 0L) == (r._4 == 1)))
    // the fixture star is referentially intact — that IS the audit
    assert(got.forall(_._4 == 1))
    // and the counter genuinely fires: plant two orphaned child rows
    val child = Seq((1L, 10L), (2L, 99L), (3L, 98L)).toDF("id", "fk")
    val parent = Seq(Tuple1(10L)).toDF("pk")
    val bad = ProfileQueries.fkEdge("child.fk->parent", child, "fk", parent, "pk")
      .as[(String, Long, Long, Int)].head()
    assert(bad == (("child.fk->parent", 3L, 2L, 0)))
  }

  test("q_drift_tvd matches a driver fold; stationary fixture stays low-drift (r5)") {
    val rows = Tables(spark, sfDir, "events")
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long"),
        round(col("value") * 100).cast("long"))
      .as[(String, Long, Long)].collect().toSeq
    val (mn, mx) = (rows.map(_._2).min, rows.map(_._2).max)
    val want = rows.groupBy(_._1).map { case (t, xs) =>
      val binned = xs.map { case (_, di, c) => (c / 500L, di * 2 < mn + mx + 1) }
      val na = binned.count(_._2).toLong
      val nb = binned.size - na
      val byBin = binned.groupBy(_._1).map { case (b, o) =>
        (b, o.count(_._2).toLong, o.count(!_._2).toLong) }
      val tvd = byBin.map { case (_, a, b) =>
        math.abs(a * 1000000L / na - b * 1000000L / nb) }.sum / 2L
      (t, na, nb, byBin.size.toLong, tvd)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_drift_tvd")(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // a stationary uniform generator must NOT look drifted BEYOND
    // sampling noise: with halves of n rows over k bins the expected
    // noise TVD is ~sqrt(k·(1/na + 1/nb)) (binomial per bin, summed) —
    // at sf0.001's ~200-row halves that's ~0.45, so a FIXED alarm line
    // would misfire; the bound must scale with the sample
    got.foreach { case (t, na, nb, k, tvd) =>
      assert(na > 0L && nb > 0L)
      val noise = math.sqrt(k.toDouble * (1.0 / na + 1.0 / nb)) * 1e6
      assert(tvd < noise, s"$t: tvd=$tvd noise-bound=${noise.toLong}")
    }
  }

  test("q_rle_profile matches a driver-side run fold; sorting always helps (r5)") {
    val rows = Tables(spark, sfDir, "events")
      .select(to_date(col("ts")).cast("string"), col("ts").cast("string"),
        col("event_id"), col("event_type"), col("user_id"),
        round(col("value") * 100).cast("long"))
      .as[(String, String, Long, String, Long, Long)].collect().toSeq
    val byDay = rows.groupBy(_._1).values.map(_.sortBy(r => (r._2, r._3)))
    def runs[T](xs: Seq[T]): Long =
      if (xs.isEmpty) 0L else 1L + xs.sliding(2).count { case Seq(a, b) => a != b; case _ => false }
    val n = rows.size.toLong
    def profile[T](f: ((String, String, Long, String, Long, Long)) => T) = {
      val nat = byDay.map(d => runs(d.map(f))).sum
      val srt = byDay.map(d => d.map(f).distinct.size.toLong).sum
      (nat, srt)
    }
    val (ct, cs) = profile(_._6)
    val (tt, ts2) = profile(_._4)
    val (ut, us) = profile(_._5)
    val want = Seq(
      ("cents", n, ct, cs, ct * 100L / cs),
      ("event_type", n, tt, ts2, tt * 100L / ts2),
      ("user_id", n, ut, us, ut * 100L / us))
    val got = SparkEntry.queries("q_rle_profile")(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // sorting can only merge runs: natural ≥ sorted, and on this
    // random-order fixture strictly better for every column
    got.foreach { r => assert(r._3 >= r._4 && r._5 >= 100L) }
    assert(got.exists(_._5 > 150L), "no column shows a real sort gain")
  }

  test("q_autocorr matches a driver-side BigInt sufficient-statistics fold (r5)") {
    val daily = Tables(spark, sfDir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .select(col("event_type"), col("day").cast("string"), col("y"))
      .as[(String, String, Long)].collect()
    val want = daily.groupBy(_._1).map { case (t, ds) =>
      val ys = ds.sortBy(_._2).map(_._3).toSeq
      val (xs, yy) = (ys.init, ys.tail)
      val n = xs.length.toLong
      val (sx, sy) = (xs.sum, yy.sum)
      val sxy = xs.zip(yy).map { case (a, b) => a * b }.sum
      val (sxx, syy) = (xs.map(a => a * a).sum, yy.map(a => a * a).sum)
      val num = n * sxy - sx * sy
      val den1 = n * sxx - sx * sx
      val den2 = n * syy - sy * sy
      val r2 = (BigInt(num) * BigInt(num) * 1000000) / (BigInt(den1) * BigInt(den2))
      (t, n, num, den1, den2, num.sign * r2.toLong)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_autocorr")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // r² stays a correlation: |r²| ≤ 1e6, and dens are positive
    got.foreach { r =>
      assert(math.abs(r._6) <= 1000000L && r._4 > 0L && r._5 > 0L)
    }
  }

  test("corrPairs: exact ±1e6 endpoints, bounded mid, degenerate NULL (r5)") {
    import spark.implicits._
    import graft.queries.ProfileQueries
    // a: 1..5; b = 2a (perfect +), c = 12 − 2a (perfect −),
    // d: constant (degenerate), e: noisy (strictly between)
    val daily = (1 to 5).flatMap { i =>
      Seq(("d" + i, "a", i.toLong), ("d" + i, "b", 2L * i),
        ("d" + i, "c", 12L - 2L * i), ("d" + i, "d", 7L),
        ("d" + i, "e", Seq(3L, 1L, 4L, 1L, 5L)(i - 1)))
    }.toDF("d", "series", "x")
    val got = ProfileQueries.corrPairs(daily)
      .select("t1", "t2", "r2_e6")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got(("a", "b")) == Some(1000000L))   // perfectly correlated
    assert(got(("a", "c")) == Some(-1000000L))  // perfectly anti-correlated
    assert(got(("b", "c")) == Some(-1000000L))  // linearity is transitive
    assert(got(("a", "d")) == None)             // constant series → NULL
    val mid = got(("a", "e")).get
    assert(math.abs(mid) < 1000000L && mid != 0L)
  }

  test("q_bootstrap_ci == plain-Scala deterministic Poisson bootstrap (r14)") {
    import graft.queries.TextQueries.{qcWeights, qcBias}
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h15(x: String): Long =
      java.lang.Long.parseLong(md5hex(x).substring(0, 15), 16)
    def dimOf(t: String): Int = (BigInt(md5hex(t).take(15), 16) % 256).toInt
    def zOf(text: String): Long =
      qcBias + text.split(" ", -1).map(t => qcWeights(dimOf(t))).sum
    val cut = Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999406L)
    def wOf(r: Int, id: Long): Long = {
      val u = h15(s"bs$r:$id") % 1000000L
      cut.indexWhere(u < _) match { case -1 => 6L; case k => k.toLong }
    }
    // replica semantics (r15): zero-total-weight resamples are
    // EXCLUDED; ranks are 2nd-from-each-end of the survivors
    // (degrading to min/max when < 2 survive)
    def ciOf(xs: Seq[(Long, Long)]): (Long, Long) = {
      val means = (0 until 32).flatMap { r =>
        val sw = xs.map { case (id, x) => wOf(r, id) * x }.sum
        val n = xs.map { case (id, _) => wOf(r, id) }.sum
        if (n > 0L) Some((sw / n, r)) else None
      }.sortBy(identity)
      val cnt = means.size
      val k = math.min(2, cnt)
      (means(k - 1)._1, means(cnt - k)._1)
    }
    val corpus = Tables(spark, sfDir, "documents")
      .select("doc_id", "source", "text").as[(Long, String, String)]
      .collect().toSeq
    val want = corpus.groupBy(_._2).toSeq.map { case (src, ds) =>
      val xs = ds.map(d => (d._1, zOf(d._3)))
      val (lo, hi) = ciOf(xs)
      val point = xs.map(_._2).sum / xs.size.toLong
      (src, xs.size.toLong, point, lo, hi, (hi - lo) / 2)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_bootstrap_ci")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // the interval is live and ordered; the point estimate sits inside
    // it for the typical source (percentile bootstrap coverage)
    got.foreach(r => assert(r._4 <= r._5, s"lo > hi: $r"))
    assert(got.count(r => r._4 <= r._3 && r._3 <= r._5) * 2 > got.size,
      "point estimate outside its CI for most sources")
    assert(got.exists(r => r._6 > 0L), "all intervals degenerate")
  }

  test("q_bootstrap_ci: a planted 2-doc source's interval tracks its " +
      "data, not weight-0 resamples (r15)") {
    import graft.queries.TextQueries.{qcWeights, qcBias}
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h15(x: String): Long =
      java.lang.Long.parseLong(md5hex(x).substring(0, 15), 16)
    def dimOf(t: String): Int = (BigInt(md5hex(t).take(15), 16) % 256).toInt
    def zOf(text: String): Long =
      qcBias + text.split(" ", -1).map(t => qcWeights(dimOf(t))).sum
    val cut = Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999406L)
    def wOf(r: Int, id: Long): Long = {
      val u = h15(s"bs$r:$id") % 1000000L
      cut.indexWhere(u < _) match { case -1 => 6L; case k => k.toLong }
    }
    val dir = java.nio.file.Files.createTempDirectory("bsci").toString
    import spark.implicits._
    val docs = Seq(
      (1L, "tiny", "alpha beta gamma delta"),
      (2L, "tiny", "epsilon zeta eta theta"),
      (3L, "big", "one two three"), (4L, "big", "four five six"),
      (5L, "big", "seven eight nine"), (6L, "big", "ten eleven twelve"),
      (7L, "big", "a b c d"), (8L, "big", "e f g h"))
    docs.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_bootstrap_ci")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // plain-Scala replica on the planted corpus
    val xs = docs.filter(_._2 == "tiny").map(d => (d._1, zOf(d._3)))
    val means = (0 until 32).flatMap { r =>
      val sw = xs.map { case (id, x) => wOf(r, id) * x }.sum
      val n = xs.map { case (id, _) => wOf(r, id) }.sum
      if (n > 0L) Some((sw / n, r)) else None
    }.sortBy(identity)
    val k = math.min(2, means.size)
    val tiny = got("tiny")
    assert(tiny._4 == means(k - 1)._1 && tiny._5 == means(means.size - k)._1)
    // the r14 failure mode is gone: with scores far from 0, weight-0
    // resamples can no longer pin the interval's low end at exactly 0
    val zs = xs.map(_._2)
    assert(tiny._4 >= zs.min && tiny._5 <= zs.max,
      s"2-doc interval ${(tiny._4, tiny._5)} outside data range " +
        s"${(zs.min, zs.max)} — empty resamples leaked back in")
  }
}
