package graft

import org.apache.spark.sql.functions._

/** Spark-side checks for batch 10: as-of join semantics against a
  * plain-Scala reference, and HLL error bounds vs exact distinct.
  */
class AdvancedSpec extends SparkSpec {
  import spark.implicits._

  test("q_asof_join matches a driver-side as-of reference") {
    val ev = Tables(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "ts")
      .as[(Long, Long, String, java.sql.Timestamp)].collect()
    val errorsByUser: Map[Long, Seq[Long]] = ev.filter(_._3 == "error")
      .groupBy(_._2).map { case (u, rows) => u -> rows.map(_._4.getTime).sorted.toSeq }
    val want = ev.filter(_._3 == "purchase").map { case (id, u, _, ts) =>
      val prior = errorsByUser.getOrElse(u, Seq.empty).filter(_ <= ts.getTime)
      (id, if (prior.isEmpty) None else Some(prior.max))
    }.toMap
    val got = SparkEntry.queries("q_asof_join")(spark, sfDir)
      .select(col("event_id"), col("last_error_ts"))
      .as[(Long, Option[java.sql.Timestamp])].collect()
      .map { case (id, t) => id -> t.map(_.getTime) }.toMap
    assert(got == want)
  }

  test("q_range_join matches a driver-side naive band join") {
    val ev = Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .as[(Long, Long, String, Long)].collect()
    val purchasesByUser = ev.filter(_._3 == "purchase")
      .groupBy(_._2).map { case (u, rows) => u -> rows.map(_._4) }
    val want = ev.filter(_._3 == "click").map { case (id, u, _, us) =>
      id -> purchasesByUser.getOrElse(u, Array.empty[Long])
        .count(p => p > us && p <= us + 3600000000L).toLong
    }.toMap
    val got = SparkEntry.queries("q_range_join")(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("q_sample_strat: exactly min(5, stratum size) rows per lang, by hash order") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val byLang = Tables(spark, sfDir, "documents")
      .select("doc_id", "lang").as[(Long, String)].collect()
      .groupBy(_._2)
    val want = byLang.toSeq.flatMap { case (lang, rows) =>
      rows.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(5)
        .zipWithIndex.map { case (id, i) => (lang, i + 1L, id) }
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q_sample_strat")(spark, sfDir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("q_percentile matches a driver-side reference") {
    val byType = Tables(spark, sfDir, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
      .as[(String, Long)].collect().groupBy(_._1)
    val want = byType.toSeq.map { case (t, rows) =>
      val cs = rows.map(_._2).sorted
      val n = cs.length.toLong
      def at(p: Int) = cs(((n - 1) * p / 100).toInt)
      (t, n, at(50), at(90), at(99))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_percentile")(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("q_pivot matches a driver-side long-to-wide reshape") {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val ev = Tables(spark, sfDir, "events")
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .as[(java.sql.Date, String)].collect()
    val want = ev.groupBy(_._1.toString).map { case (day, rows) =>
      day -> types.map(t => rows.count(_._2 == t).toLong)
    }
    val got = SparkEntry.queries("q_pivot")(spark, sfDir)
      .as[(java.sql.Date, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1.toString -> Seq(r._2, r._3, r._4, r._5, r._6)).toMap
    assert(got == want)
  }

  test("q_mix_weights: weights partition the corpus and floor-sum to <= 1e6") {
    val rows = SparkEntry.queries("q_mix_weights")(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().toSeq
    val totalTokens = rows.map(_._3).sum
    assert(rows.map(_._2).sum ==
      Tables(spark, sfDir, "documents").count())
    rows.foreach { case (_, _, nTok, wE6) =>
      assert(wE6 == nTok * 1000000L / totalTokens)
    }
    val wSum = rows.map(_._4).sum
    assert(wSum <= 1000000L && wSum > 1000000L - rows.size)
  }

  test("q_join_star matches a driver-side reference") {
    def rows(t: String) = Tables(spark, sfDir, t)
    val orders = rows("orders")
      .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("y"))
      .as[(Long, Long, Int)].collect().filter(_._3 == 1996)
      .map(r => r._1 -> r._2).toMap
    val cust = rows("customer").select("c_custkey", "c_nationkey")
      .as[(Long, Long)].collect().toMap
    val supp = rows("supplier").select("s_suppkey", "s_nationkey")
      .as[(Long, Long)].collect().toMap
    val nation = rows("nation").select("n_nationkey", "n_name", "n_regionkey")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val asiaRegions = rows("region").select("r_regionkey", "r_name")
      .as[(Long, String)].collect().filter(_._2 == "ASIA").map(_._1).toSet
    val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
    rows("lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("ep"),
        round(col("l_discount") * 100).cast("long").as("dc"))
      .as[(Long, Long, Long, Long)].collect()
      .foreach { case (ok, sk, ep, dc) =>
        for {
          custkey <- orders.get(ok)
          cNat <- cust.get(custkey)
          sNat <- supp.get(sk) if cNat == sNat
          (nName, rKey) <- nation.get(sNat) if asiaRegions(rKey)
        } {
          val (rev, cnt) = acc.getOrElse(nName, (0L, 0L))
          acc(nName) = (rev + ep * (100 - dc), cnt + 1)
        }
      }
    val want = acc.toSeq.map { case (n, (rev, cnt)) => (n, rev, cnt) }
      .sortBy { case (n, rev, _) => (-rev, n) }
    val got = SparkEntry.queries("q_join_star")(spark, sfDir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("q_split_assign: disjoint, exhaustive, deterministic, ~90/5/5 (r5)") {
    val rows = SparkEntry.queries("q_split_assign")(spark, sfDir)
      .as[(String, String, Long, Long)].collect().toSeq
    val total = Tables(spark, sfDir, "documents").count()
    // exhaustive + disjoint: per-split doc counts sum to the corpus
    assert(rows.map(_._3).sum == total)
    assert(rows.map(r => (r._1, r._2)).distinct.size == rows.size)
    // deterministic: a second run is bit-identical
    val again = SparkEntry.queries("q_split_assign")(spark, sfDir)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(again == rows)
    // ratio sanity on the whole corpus (hash-uniform: train ≈ 90%)
    val train = rows.filter(_._2 == "train").map(_._3).sum.toDouble / total
    assert(train > 0.8 && train < 0.97, s"train fraction $train")
    // membership is a pure function of doc_id: recompute in plain Scala
    val md = java.security.MessageDigest.getInstance("MD5")
    def splitOf(id: Long): String = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16) % 100
      if (h < 90) "train" else if (h < 95) "val" else "test"
    }
    val want = Tables(spark, sfDir, "documents")
      .select("source", "doc_id").as[(String, Long)].collect()
      .groupBy { case (src, id) => (src, splitOf(id)) }
      .map { case (k, xs) => k -> xs.size.toLong }
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap == want)
  }

  test("q_funnel matches a driver-side sequential fold; windows create drop-off (r5)") {
    val evs = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tm"))
      .as[(Long, String, Long)].collect()
    val day = 24L * 3600L * 1000000L
    val byUser = evs.groupBy(_._1)
    def stage(prev: Map[Long, Long], typ: String): Map[Long, Long] =
      prev.flatMap { case (u, t0) =>
        byUser(u).filter(e => e._2 == typ && e._3 > t0 && e._3 <= t0 + day)
          .map(_._3).minOption.map(u -> _)
      }
    val t1 = evs.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3).min }
    val t2 = stage(t1, "click")
    val t3 = stage(t2, "purchase")
    def e4(n: Long, d: Long) = n * 10000L / math.max(d, 1L)
    val want = (t1.size.toLong, t2.size.toLong, t3.size.toLong,
      e4(t2.size, t1.size), e4(t3.size, t2.size))
    val got = SparkEntry.queries("q_funnel")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got == want)
    // the windows must bind: strictly decreasing stages on this fixture
    assert(got._1 > got._2 && got._2 > got._3 && got._3 > 0, got.toString)
  }

  test("q_transition_matrix matches a driver-side pairing fold (r5)") {
    val evs = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tm"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val counts = evs.groupBy(_._1).values.toSeq.flatMap { es =>
      val sorted = es.sortBy(e => (e._3, e._2)).map(_._4).toSeq
      sorted.zip(sorted.tail)
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val tots = counts.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val want = counts.toSeq.map { case ((a, b), n) =>
      (a, b, n, (n * 20000L + tots(a)) / (2L * tots(a)))
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q_transition_matrix")(spark, sfDir)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == want)
    // a transition matrix is only a matrix if multiple sources are live
    assert(got.map(_._1).distinct.size > 1)
  }

  test("q_cohort_retention matches a driver-side fold; k=0 is exactly 10000 (r5)") {
    val os = Tables(spark, sfDir, "orders")
      .select(col("o_custkey"), year(col("o_orderdate")).cast("long").as("y"))
      .as[(Long, Long)].collect()
    val first = os.groupBy(_._1).map { case (c, ys) => c -> ys.map(_._2).min }
    val counts = os.map { case (c, y) => (first(c), y - first(c), c) }.distinct
      .groupBy(t => (t._1, t._2)).map { case (k, xs) => k -> xs.size.toLong }
    val want = counts.toSeq.map { case ((cy, k), n) =>
      val cn = counts((cy, 0L))
      (cy, k, n, (n * 20000L + cn) / (2L * cn))
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q_cohort_retention")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    assert(got.filter(_._2 == 0L).forall(_._4 == 10000L))
    // orders (not events) is the input precisely so cohorts are live
    assert(got.map(_._1).distinct.size > 1)
  }

  test("q_rolling_distinct matches a driver-side sliding-window distinct fold (r5)") {
    val pairs = Tables(spark, sfDir, "events")
      .select(date_trunc("hour", col("ts")).as("h"), col("user_id"))
      .distinct().as[(java.sql.Timestamp, Long)].collect()
    val byHour = pairs.groupBy(_._1.getTime).view.mapValues(_.map(_._2).toSet).toMap
    val want = byHour.keySet.toSeq.sorted.map { h =>
      val users = (0 until 24)
        .flatMap(k => byHour.getOrElse(h - k * 3600000L, Set.empty[Long])).toSet
      (h, users.size.toLong)
    }
    val got = SparkEntry.queries("q_rolling_distinct")(spark, sfDir)
      .as[(java.sql.Timestamp, Long)].collect()
      .map(t => (t._1.getTime, t._2)).toSeq
    assert(got == want)
    // the window must be live: ramp-up/decay give many distinct counts
    assert(got.map(_._2).distinct.size > 10)
  }

  test("q_resample_locf matches a driver-side grid + carry-forward fold (r5)") {
    val hourly = Tables(spark, sfDir, "events")
      .select(col("user_id"),
        graft.functions.ExactMath.divTrunc(
          unix_micros(date_trunc("hour", col("ts"))), lit(3600000000L)).as("h"),
        round(col("value") * 100).cast("long").as("c"))
      .as[(Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._2))
      .map { case ((u, h), rs) => (u, h) -> (rs.map(_._3).sum, rs.size) }
    val want = hourly.keys.groupBy(_._1).map { case (u, ks) =>
      val h0 = ks.map(_._2).min
      val h1 = ks.map(_._2).max
      var lastC = 0L
      var gaps = 0L
      var sum = 0L
      (h0 to h1).foreach { h =>
        hourly.get((u, h)) match {
          case Some((c, _)) => lastC = c; sum += c
          case None => gaps += 1; sum += lastC
        }
      }
      (u, h1 - h0 + 1, gaps, sum)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_resample_locf")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // gaps must exist, or the query degenerates to the plain hourly agg
    assert(got.exists(_._3 > 0))
  }

  test("q_approx_percentile: self-check columns hold and approx tracks exact (r5)") {
    val rows = SparkEntry.queries("q_approx_percentile")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Boolean, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, _, _, _, _, ok50, ok90, ok99) =>
      assert(ok50 && ok90 && ok99, s"$t rank self-check failed")
    }
    // approx within 5% of the exact per-group percentile VALUES — for
    // p50/p90 only: at sf0.001 a group holds ~200 rows, so p99's ±1%
    // RANK tolerance spans ±2 ranks, and in the heavy tail adjacent
    // ranks sit far apart in value (observed 25394 vs 16289 — both
    // rank-correct). The tail quantile is exactly what the in-output
    // rank self-check (ok_p99, asserted above) is FOR; value closeness
    // is only a meaningful test where the distribution is dense.
    val exact = SparkEntry.queries("q_percentile")(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    rows.foreach { case (t, _, a50, a90, _, _, _, _) =>
      val (e50, e90) = exact(t)
      def close(a: Long, e: Long) = math.abs(a - e) <= math.max(5L, e / 20)
      assert(close(a50, e50) && close(a90, e90),
        s"$t approx ($a50,$a90) vs exact ($e50,$e90)")
    }
  }

  test("q_zorder: expression == pure-Scala Morton reference; buckets bound BOTH dims") {
    // the Column expression and the reference bit-interleave agree
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (19999L, 999L), (255L, 65280L))
    val got = pts.toDF("x", "y")
      .select(graft.queries.AdvancedQueries.zorder16(col("x"), col("y")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == pts.map { case (x, y) =>
      graft.queries.AdvancedQueries.zorder16Ref(x, y) })
    // known anchors pin the bit layout (x at even bits, y at odd)
    assert(graft.queries.AdvancedQueries.zorder16Ref(1L, 0L) == 1L)
    assert(graft.queries.AdvancedQueries.zorder16Ref(0L, 1L) == 2L)
    assert(graft.queries.AdvancedQueries.zorder16Ref(65535L, 65535L) == 0xFFFFFFFFL)
    // locality invariant on testdata: a z-range "file" spans <= 1/4 of
    // EACH dimension (top-2 bits of x and of y are fixed per bucket)
    val rows = SparkEntry.queries("q_zorder")(spark, sfDir)
      .select("bucket", "x_min", "x_max", "y_min", "y_max")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (b, xmn, xmx, ymn, ymx) =>
      assert(xmn >> 14 == xmx >> 14, s"bucket $b x top bits")
      assert(ymn >> 14 == ymx >> 14, s"bucket $b y top bits")
      // and the bucket id IS those four bits interleaved
      assert(b == graft.queries.AdvancedQueries.zorder16Ref(xmn, ymn) >> 28,
        s"bucket $b id")
    }
  }

  test("q_compaction_bins matches a driver-side prefix-sum packer (r5)") {
    val ledger = Tables(spark, sfDir, "documents")
      .select(col("source"), (col("doc_id") / 20).cast("long").as("file_id"),
        col("n_chars"))
      .as[(String, Long, Long)].collect()
      .groupBy(r => (r._1, r._2))
      .map { case ((src, fid), rs) => (src, fid, rs.map(_._3).sum) }
      .toSeq
    val want = ledger.groupBy(_._1).toSeq.flatMap { case (src, fs) =>
      val ordered = fs.sortBy(_._2)
      val cums = ordered.scanLeft(0L)(_ + _._3).init
      ordered.zip(cums).map { case ((_, fid, bytes), cum) =>
        (src, (cum / 2000L).toInt, fid, bytes)
      }.groupBy(_._2).map { case (bin, rows) =>
        (src, bin, rows.size.toLong, rows.map(_._4).sum,
          rows.map(_._3).min, rows.map(_._3).max)
      }
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q_compaction_bins")(spark, sfDir)
      .as[(String, Int, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // bins are contiguous, order-preserving file ranges within a source
    got.groupBy(_._1).foreach { case (_, bins) =>
      bins.sortBy(_._2).sliding(2).foreach {
        case Seq(a, b) => assert(a._6 < b._5, s"bin ranges overlap: $a $b")
        case _ =>
      }
    }
  }

  test("q_interval_join matches a driver-side naive overlap join (r5)") {
    val ev = Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .as[(Long, Long, String, Long)].collect()
    val spans = ev.groupBy(e => (e._2, e._4 / 86400000000L))
      .map { case ((uid, _), es) => (uid, es.map(_._4).min, es.map(_._4).max) }
      .toSeq
    val want = ev.toSeq.filter(_._3 == "error").map { e =>
      val blo = e._4 - 300000000L
      val bhi = e._4 + 300000000L
      (e._1, spans.filter(s => s._2 <= bhi && s._3 >= blo)
        .map(_._1).distinct.size.toLong)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_interval_join")(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    assert(got == want)
    // every error matches at least its own user's span
    assert(got.forall(_._2 >= 1))
  }

  test("q_incr_agg: merged partials == the direct aggregate; merge is non-trivial (r5)") {
    val direct = Tables(spark, sfDir, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"),
        min(round(col("value") * 100).cast("long")).as("min_cents"),
        max(round(col("value") * 100).cast("long")).as("max_cents"))
      .select(col("day").cast("string"), col("event_type"), col("n"),
        col("sum_cents"), col("min_cents"), col("max_cents"),
        graft.functions.ExactMath.divTrunc(col("sum_cents") * 200L + col("n"),
          col("n") * 2L).as("avg_cents"))
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q_incr_agg")(spark, sfDir)
      .select(col("day").cast("string"), col("event_type"), col("n"),
        col("sum_cents"), col("min_cents"), col("max_cents"), col("avg_cents"))
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == direct)
    // the merge must do real work: both parity batches hit every day
    val spanning = Tables(spark, sfDir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("event_id") % 2).as("parities"))
      .as[(java.sql.Date, Long)].collect()
    assert(spanning.forall(_._2 == 2), "every group should span base and delta")
  }

  test("q_sample_weighted matches a driver-side weighted-hash fold (r5)") {
    def h60mod(id: Long, m: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % m
    }
    val ds = Tables(spark, sfDir, "documents")
      .select("doc_id", "lang").as[(Long, String)].collect().toSeq
    val want = ds.groupBy(_._2).toSeq.map { case (lang, rows) =>
      val n = rows.size.toLong
      val p = math.min(1000000L, 20000000L / n)
      val kept = rows.map(_._1).filter(id => h60mod(id, 1000000L) < p)
      (lang, n, p, kept.size.toLong, kept.min)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_sample_weighted")(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // rare-language full retention: p_e6 == 1e6 implies keep everything
    got.filter(_._3 == 1000000L).foreach(r => assert(r._4 == r._2))
  }

  test("q_approx_distinct within 5% of exact per group; self-check column agrees") {
    val rows = SparkEntry.queries("q_approx_distinct")(spark, sfDir)
      .select("event_type", "approx_users", "exact_users", "within_5pct")
      .as[(String, Long, Long, Boolean)].collect()
    val exact = Tables(spark, sfDir, "events")
      .groupBy("event_type").agg(countDistinct("user_id").as("u"))
      .as[(String, Long)].collect().toMap
    assert(rows.map(_._1).toSet == exact.keySet)
    rows.foreach { case (k, a, e, ok) =>
      assert(e == exact(k), s"$k: exported exact_users $e != $exact")
      assert(math.abs(a - e) <= math.max(1L, (0.05 * e).toLong),
        s"$k: approx=$a exact=$e")
      // the declared self-check column must hold AND match its formula
      assert(ok == (math.abs(a - e) * 100L <= e * 5L), s"$k within_5pct")
      assert(ok, s"$k: within_5pct false (approx=$a exact=$e)")
    }
  }

  test("q_mix_temperature matches a driver fold; rebalancing is monotone (r5)") {
    val per = Tables(spark, sfDir, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long"))
      .as[(String, Long)].collect().toSeq
      .groupBy(_._1).map { case (s, xs) => (s, xs.size.toLong, xs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val isq = per.map { case (_, _, n) => math.floor(math.sqrt(n.toDouble)).toLong }
    val (totN, totI) = (per.map(_._3).sum, isq.sum)
    val want = per.zip(isq).map { case ((s, d, n), i) =>
      val nat = n * 1000000L / totN
      val tmp = i * 1000000L / totI
      (s, d, n, i, nat, tmp, if (nat > 0) tmp * 10000L / nat else 0L)
    }
    val got = SparkEntry.queries("q_mix_temperature")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // temperature sampling rebalances toward uniform: the smallest
    // source is boosted above parity, the largest damped below it
    val byTokens = got.sortBy(_._3)
    assert(byTokens.head._7 > 10000L, s"small source not boosted: ${byTokens.head}")
    assert(byTokens.last._7 < 10000L, s"large source not damped: ${byTokens.last}")
    // boost trends anti-monotone in size; exact ordering can flip by
    // the isqrt quantum (isq ~ 54 here → ~1/54 ≈ 185 e4-units), so
    // compare half-means, not neighbors
    val (small, large) = byTokens.map(_._7).splitAt(byTokens.size / 2)
    assert(small.sum * large.size > large.sum * small.size,
      "small-source mean boost not above large-source mean")
  }

  test("q_length_buckets: tiling, cap bounds, and a driver fold (r5)") {
    val lens = Tables(spark, sfDir, "documents")
      .select(size(split(col("text"), " ")).cast("long")).as[Long].collect().toSeq
    def cap(n: Long): Long =
      if (n <= 1) 1L else 1L << (64 - java.lang.Long.numberOfLeadingZeros(n - 1))
    val want = lens.groupBy(cap).toSeq.map { case (c, xs) =>
      val (n, s) = (xs.size.toLong, xs.sum)
      (c, n, s, c * n, (c * n - s) * 10000L / (c * n))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_length_buckets")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // tiling: every document lands in exactly one bucket
    assert(got.map(_._2).sum == lens.size.toLong)
    // bucket caps are powers of two and every doc fits: cap/2 < len ≤ cap
    got.foreach { case (c, _, _, _, _) =>
      assert(c == java.lang.Long.highestOneBit(c), s"cap $c not a power of two")
    }
    lens.foreach(n => assert(n <= cap(n) && (cap(n) == 1 || n > cap(n) / 2)))
  }

  test("q_join_estimate: exact column sums to the true join size; error is live (r5)") {
    val ev = Tables(spark, sfDir, "events")
    val trueSize = ev.filter(col("event_type") === "error").select(col("user_id"))
      .join(ev.filter(col("event_type") === "purchase").select(col("user_id")),
        "user_id").count()
    val got = SparkEntry.queries("q_join_estimate")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._7).sum == trueSize,
      "per-bucket exact terms must sum to the actual join cardinality")
    // full driver fold of the bucketed histograms
    def keyCounts(t: String) = ev.filter(col("event_type") === t)
      .select(col("user_id")).as[Long].collect().toSeq
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val (ka, kb) = (keyCounts("error"), keyCounts("purchase"))
    val mxk = (ka.keys ++ kb.keys).max
    def bucketed(kc: Map[Long, Long]) =
      kc.toSeq.groupBy { case (k, _) => k * 20L / (mxk + 1L) }
    val (ba, bb) = (bucketed(ka), bucketed(kb))
    val want = (ba.keySet ++ bb.keySet).toSeq.sorted.map { b =>
      val a = ba.getOrElse(b, Seq.empty)
      val c = bb.getOrElse(b, Seq.empty)
      val (na, da) = (a.map(_._2).sum, a.size.toLong)
      val (nb, db) = (c.map(_._2).sum, c.size.toLong)
      val cm = c.toMap
      val exact = a.map { case (k, n) => n * cm.getOrElse(k, 0L) }.sum
      val est = na * nb / math.max(1L, math.max(da, db))
      (b, na, da, nb, db, est, exact,
        math.abs(est - exact) * 10000L / math.max(1L, exact))
    }
    assert(got == want)
    // liveness of the error column is data-dependent: zero at sf0.001's
    // near-uniform multiplicities, nonzero in all 20 buckets at sf0.01
    // (driver-verified in the oracle run) — here assert formula parity
    got.foreach { case (_, na, da, nb, db, est, _, _) =>
      assert(est == na * nb / math.max(1L, math.max(da, db)))
    }
  }

  test("q_span_corrupt == plain-Scala mask fold; corpus mask rate near the T5 15% (r13)") {
    def seeded(docId: Long, i: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$docId:$i".getBytes("UTF-8")).map("%02x".format(_))
        .mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 20L == 0L
    }
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val want = docs.map { case (id, text) =>
      val n = text.split(" ", -1).length.toLong
      val seeds = (1L to n).filter(seeded(id, _))
      // merge seeds ≤ 2 apart into spans, each covering [i, i+2] ∩ doc
      val spans = seeds.foldLeft(Vector.empty[(Long, Long)]) {
        case (acc, i) if acc.nonEmpty && i - acc.last._2 <= 2 =>
          acc.init :+ ((acc.last._1, i))
        case (acc, i) => acc :+ ((i, i))
      }
      val masked = spans.map { case (a, b) => math.min(b + 2, n) - a + 1 }.sum
      (id, n, seeds.size.toLong, spans.size.toLong, masked,
        masked * 10000L / math.max(n, 1L))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_span_corrupt")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // corpus-level mask rate lands near the objective's 15% target
    val rate = want.map(_._5).sum * 10000L / want.map(_._2).sum
    assert(rate > 1000L && rate < 2000L, s"corpus mask rate e4 = $rate")
    // masks are live: some doc merged overlapping seeds into one span
    assert(want.exists(r => r._4 < r._3), "no span merge ever occurred")
  }

  test("q_shard_pack == plain-Scala snake fold; every shard within 25% of ideal (r13)") {
    val docs = Tables(spark, sfDir, "documents")
      .select("source", "doc_id", "text")
      .as[(String, Long, String)].collect().toSeq
      .map { case (src, id, t) => (src, id, t.split(" ", -1).length.toLong) }
    val want = docs.groupBy(_._1).toSeq.flatMap { case (src, grp) =>
      val ranked = grp.sortBy { case (_, id, n) => (-n, id) }.zipWithIndex
      val assigned = ranked.map { case ((_, _, n), r) =>
        val shard = if ((r / 8) % 2 == 0) r % 8 else 7 - r % 8
        (shard.toLong, n)
      }
      val tot = assigned.map(_._2).sum
      assigned.groupBy(_._1).toSeq.map { case (sh, o) =>
        val st = o.map(_._2).sum
        (src, sh, o.size.toLong, st, st * 8L * 10000L / tot)
      }
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q_shard_pack")(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // snake packing on size-sorted docs: no shard strays far from the
    // ideal K-way split (LPT-style bound; the fixture lands within ~1%)
    got.foreach { case (src, sh, _, _, load) =>
      assert(load > 7500L && load < 12500L, s"$src shard $sh load_e4=$load")
    }
  }

  test("q_epoch_order: content-keyed permutation — bijective per epoch, " +
    "dense per shard, epoch-distinct, partitioning-invariant (r14)") {
    val got = SparkEntry.queries("q_epoch_order")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val allDocs = Tables(spark, sfDir, "documents")
      .select("doc_id").as[Long].collect().toSet
    val byEpoch = got.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    byEpoch.foreach { case (e, rows) =>
      // bijection: every doc appears exactly once per epoch
      assert(rows.map(_._4).toSet == allDocs && rows.size == allDocs.size,
        s"epoch $e is not a permutation")
      // pos is dense 1..n within each shard
      rows.groupBy(_._2).foreach { case (sh, sr) =>
        assert(sr.map(_._3).sorted == (1L to sr.size.toLong),
          s"epoch $e shard $sh pos not dense")
      }
    }
    // distinct epochs visit the corpus in a different order
    def order(e: Long) = byEpoch(e).sortBy(r => (r._2, r._3)).map(_._4)
    assert(order(0L) != order(1L) && order(1L) != order(2L))
    // the permutation is a pure content function: recomputing it must be
    // byte-identical (no RNG / partition-dependent state in the key)
    val again = SparkEntry.queries("q_epoch_order")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(again == got)
  }

  test("q_fim_split == plain-Scala deterministic splitter; layout invariants (r14)") {
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h(tag: String, id: Long): Long =
      java.lang.Long.parseLong(md5hex(s"$tag:$id").substring(0, 15), 16)
    val corpus = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val want = corpus.map { case (id, text) =>
      val ts = text.split(" ", -1)
      val n = ts.length.toLong
      val fim = if (h("fim", id) % 2 == 0) 1L else 0L
      val (lo, hi) =
        if (fim == 1L) {
          val a = h("fa", id) % (n + 1); val b = h("fb", id) % (n + 1)
          (math.min(a, b), math.max(a, b))
        } else (n, n)
      val mid = ts.slice(lo.toInt, hi.toInt).mkString(" ")
      (id, fim, n, lo, hi - lo, n - hi, md5hex(mid).take(8),
        n + (if (fim == 1L) 3L else 0L))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_fim_split")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long, String, Long)].collect().toSeq
    assert(got == want)
    // layout invariants: segments tile the doc; PSM adds exactly the 3
    // sentinels on FIM docs; the gate selects a non-degenerate subset
    got.foreach { r =>
      assert(r._4 + r._5 + r._6 == r._3, s"segments do not tile: $r")
      assert(r._8 == r._3 + 3 * r._2, s"psm_len wrong: $r")
      if (r._2 == 0L) assert(r._5 == 0L && r._6 == 0L)
    }
    val nFim = got.count(_._2 == 1L)
    assert(nFim > 0 && nFim < got.size, s"degenerate FIM gate: $nFim/${got.size}")
    // some FIM doc has a non-empty middle (the objective is live)
    assert(got.exists(r => r._2 == 1L && r._5 > 0L))
  }
}
