package graft

import org.apache.spark.sql.functions._

import graft.functions.SimHash64

/** Spark-side checks for the non-oracle dedup leg (q_simhash_dup) plus
  * cross-validation of the three near-dup queries against each other on
  * real testdata — the rows-only queries need their own correctness
  * story (SURVEY.md §5 strategy 2).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("DeletionVariants: exact variant set, code-point deletions, completeness (r11)") {
    import graft.functions.DeletionVariants
    def variants(w: String, k: Int): Set[String] = {
      val df = Seq(Tuple1(w)).toDF("w")
        .select(DeletionVariants.deletionVariants(col("w"), k))
      df.collect()(0).getSeq[String](0).toSet
    }
    assert(variants("abc", 2) == Set("abc", "bc", "ac", "ab", "c", "b", "a"))
    assert(variants("aa", 2) == Set("aa", "a", ""))  // duplicates collapse
    assert(variants("ab", 0) == Set("ab"))
    // code-point semantics: one deletion removes the whole non-BMP char
    assert(variants("a😀", 1) == Set("a😀", "😀", "a"))
    // completeness property (the SymSpell invariant the blocking rests
    // on): every pair within levenshtein <= 2 shares a variant
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val words = Seq("join", "jon", "jion", "joins", "joint", "hash", "hsah",
      "bash", "ash", "a", "", "ab", "ba", "abcd", "badc", "merge", "mergee")
    for (a <- words; b <- words if a < b && lev(a, b) <= 2)
      assert(variants(a, 2).intersect(variants(b, 2)).nonEmpty,
        s"no shared deletion variant for ($a, $b) at distance ${lev(a, b)}")
  }

  test("SimHash64 expression == plain-Scala reference hash") {
    val docs = Seq("the quick brown fox", "the quick brown fox",
      "pack my box with five dozen jugs", "", "single")
    val got = docs.map(Tuple1(_)).toDF("text")
      .select(SimHash64.simHash64(split(col("text"), " ")))
      .collect().map(_.getLong(0)).toSeq
    val want = docs.map(d => SimHash64.hashTokens(d.split(" ").toSeq))
    assert(got == want)
  }

  test("SimHash64 hashes UTF-8 BYTES: non-ASCII tokens match the cross-engine constants (r5)") {
    // A single-token doc's simhash IS the token's FNV-1a-64 (each bit's
    // vote is ±1 from that one hash). These constants were verified
    // identical in DuckDB's byte-wise oracle (hex(encode(t)) parse) and
    // plain-Python FNV over .encode() — the three-way agreement pins
    // the UTF-8-byte semantics the r4 oracle only assumed for ASCII.
    val want = Map(
      "ab" -> 620445648566982762L,
      "é" -> 775207407765167617L,
      "日本" -> 1305338235904577169L)
    want.foreach { case (tok, h) =>
      assert(SimHash64.hashTokens(Seq(tok)) == h, s"token $tok")
    }
    // expression path == reference path on a mixed-script corpus
    val docs = Seq("héllo wörld 日本語 モデル", "naïve café résumé straße",
      "пример текста на русском")
    val got = docs.map(Tuple1(_)).toDF("text")
      .select(SimHash64.simHash64(split(col("text"), " ")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == docs.map(d => SimHash64.hashTokens(d.split(" ").toSeq)))
  }

  test("Fnv64 expression == SimHash64.fnv1a64 reference, including non-ASCII (r9)") {
    // The weighted-vote pipeline hashes shingle strings row-wise with
    // Fnv64; it must be bit-identical to the fold SimHash64 runs (and
    // therefore to the DuckDB byte-wise oracle the r5 constants pin).
    import graft.functions.Fnv64.fnv64
    val toks = Seq("ab", "é", "日本", "the quick brown", "", "straße café x")
    val got = toks.map(Tuple1(_)).toDF("t").select(fnv64(col("t")))
      .collect().map(_.getLong(0)).toSeq
    val want = toks.map(t =>
      SimHash64.fnv1a64(org.apache.spark.unsafe.types.UTF8String.fromString(t).getBytes))
    assert(got == want)
    assert(got(0) == 620445648566982762L) // the r5 cross-engine constant
  }

  test("randomized fidelity sweep: SimHash64 / Fnv64 / Shingles vs plain-Scala references on unicode corpora (r9)") {
    // Seeded-random property sweep (the repo's JavaHashSpec pattern —
    // the scalatestplus scalacheck bridge isn't in the offline cache):
    // 200 random docs over a mixed ASCII/accented/CJK/emoji alphabet,
    // lengths 0-30 tokens incl. repeats, pushed through the codegen'd
    // expressions in one DataFrame pass and compared element-wise to
    // the plain-Scala references. Covers the edge cases fixed docs
    // can't enumerate: empty docs, width-1/width-2 docs (no 3-gram),
    // high multiplicity, multi-byte boundaries inside shingle joins.
    import graft.functions.Fnv64.fnv64
    import graft.functions.Shingles
    val alphabet = Vector("a", "bb", "héllo", "日本", "🙂", "x1", "straße",
      "中文", "Ω", "tok")
    val rng = new scala.util.Random(1234)
    val docs = Seq.fill(200) {
      Seq.fill(rng.nextInt(31))(alphabet(rng.nextInt(alphabet.size))).mkString(" ")
    }
    val got = docs.map(Tuple1(_)).toDF("text")
      .select(SimHash64.simHash64(split(col("text"), " ")).as("sh"),
        fnv64(col("text")).as("h"),
        Shingles.shingles(split(col("text"), " "), 3).as("d3"),
        Shingles.shinglesAll(split(col("text"), " "), 3).as("a3"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2).toSeq,
        r.getSeq[String](3).toSeq))
      .toSeq
    val want = docs.map { d =>
      val toks = d.split(" ", -1).toSeq
      val all = toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      (SimHash64.hashTokens(toks),
        SimHash64.fnv1a64(org.apache.spark.unsafe.types.UTF8String.fromString(d).getBytes),
        all.distinct, all)
    }
    assert(got == want)
  }

  test("identical token arrays → identical simhash; disjoint vocab → distant") {
    val a = SimHash64.hashTokens(Seq("alpha", "beta", "gamma", "delta"))
    val b = SimHash64.hashTokens(Seq("alpha", "beta", "gamma", "delta"))
    val c = SimHash64.hashTokens(Seq("zq1", "zq2", "zq3", "zq4"))
    assert(a == b)
    assert(java.lang.Long.bitCount(a ^ c) > 10)
  }

  test("simhash banding finds every Hamming<=3 pair (pigeonhole guarantee)") {
    // 4 bands of 16 bits: any pair within Hamming 3 shares >=1 intact band.
    val base = SimHash64.hashTokens((1 to 50).map(i => s"tok$i"))
    val rng = new scala.util.Random(7)
    (1 to 100).foreach { _ =>
      val flips = rng.shuffle((0 until 64).toList).take(rng.nextInt(4))
      val variant = flips.foldLeft(base)((h, b) => h ^ (1L << b))
      val sharesBand = (0 until 4).exists(b =>
        ((base >>> (16 * b)) & 0xffffL) == ((variant >>> (16 * b)) & 0xffffL))
      assert(sharesBand, s"flips=$flips")
    }
  }

  test("q_simhash_dup: precision >= 0.9 and recall >= 0.6 vs q_dedup_ngram") {
    // Measured corpus structure (r9, shingle-feature idf-weighted
    // votes): planted j>=0.6 dups at Hamming 1-9, background floor
    // EMPTY through 10 → the Hamming<=7 cut is precision 1.0 at
    // recall ~0.68 of the exact n-gram near-dup pairs (4-7 recall is
    // probabilistic through the 4x16 bands; <=3 stays guaranteed).
    val sim = SparkEntry.queries("q_simhash_dup")(spark, sfDir)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val jac = SparkEntry.queries("q_dedup_ngram")(spark, sfDir)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(sim.nonEmpty && jac.nonEmpty)
    val precision = sim.intersect(jac).size.toDouble / sim.size
    val recall = sim.intersect(jac).size.toDouble / jac.size
    assert(precision >= 0.9, s"simhash precision $precision")
    assert(recall >= 0.6, s"simhash recall $recall")
  }

  test("q_minhash_dup == q_dedup_ngram on testdata (LSH at j>=0.6 loses nothing here)") {
    val mh = SparkEntry.queries("q_minhash_dup")(spark, sfDir)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val jac = SparkEntry.queries("q_dedup_ngram")(spark, sfDir)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(mh == jac, s"minhash=${mh.size} ngram=${jac.size}")
  }

  test("q_minhash_recall == driver-side band recall of the two declared relations (r11)") {
    val truth = SparkEntry.queries("q_dedup_ngram")(spark, sfDir)
      .select("d1", "d2", "jac_e4").as[(Long, Long, Long)].collect().toSeq
    // truth ⊆ {jac ≥ 0.6}, so truth ∩ band-candidates = truth ∩
    // q_minhash_dup's verified output — the eval is recomputable from
    // the two DECLARED relations alone
    val mh = SparkEntry.queries("q_minhash_dup")(spark, sfDir)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val want = truth.groupBy(_._3 / 1000L).toSeq.sortBy(_._1).map {
      case (band, rows) =>
        val hits = rows.count(r => mh.contains((r._1, r._2))).toLong
        (band, rows.size.toLong, hits,
          (hits * 20000L + rows.size) / (rows.size * 2L))
    }
    val got = SparkEntry.queries("q_minhash_recall")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // live-metric guards: bands partition the full truth set; recall
    // bounded; not identically zero (a dead candidate path would be)
    assert(got.nonEmpty && got.map(_._2).sum == truth.size.toLong)
    got.foreach { case (_, nt, nh, r) =>
      assert(nt > 0 && nh <= nt && r >= 0L && r <= 10000L)
    }
    assert(got.map(_._3).sum > 0L, "minhash candidate recall identically zero")
  }

  test("q_dedup_groups: exact connected components of the pair graph") {
    val pairs = SparkEntry.queries("q_dedup_ngram")(spark, sfDir)
      .select("d1", "d2").as[(Long, Long)].collect()
    val groups = SparkEntry.queries("q_dedup_groups")(spark, sfDir)
      .select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect()
    // reference union-find on the driver
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val wantLabel = parent.keys.map(d => d -> find(d)).toMap
    // canonical label = component min — re-canonicalize the reference
    val canon = wantLabel.groupBy(_._2).flatMap { case (_, m) =>
      val mn = m.keys.min; m.keys.map(_ -> mn)
    }
    assert(groups.map(g => g._1 -> g._2).toMap == canon)
    val wantSizes = canon.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }
    groups.foreach { case (_, c, sz) => assert(wantSizes(c) == sz, s"cluster $c") }
    // and the corpus genuinely exercises transitivity (a chain beyond a pair)
    assert(groups.map(_._3).max >= 2)
  }

  test("q_substring_dedup == brute-force shingle containment on testdata") {
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    // plain-Scala reference: distinct 5-token shingles per doc, corpus
    // occurrence counts over the per-doc-distinct stream
    val perDoc = docs.map { case (id, t) =>
      id -> t.split(" ").sliding(5).filter(_.length == 5)
        .map(_.mkString(" ")).toSet
    }
    val counts = perDoc.values.flatten.toSeq
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val got = SparkEntry.queries("q_substring_dedup")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq == docs.keys.toSeq.sorted)
    got.foreach { case (id, nSh, nDup, fracE4) =>
      val s = perDoc(id)
      val dup = s.count(counts(_) >= 2).toLong
      assert(nSh == s.size.toLong, s"doc $id n_shingles")
      assert(nDup == dup, s"doc $id n_dup")
      assert(fracE4 == (if (s.isEmpty) 0L else dup * 10000L / s.size),
        s"doc $id dup_frac_e4")
    }
    // the planted near-dup fixture must actually exercise the signal
    if (counts.exists(_._2 >= 2)) assert(got.exists(_._3 > 0))
  }

  test("q_fuzzy_match == brute-force all-pairs levenshtein (blocking loses nothing, r5)") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val vocab = Tables(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toSeq
    val want = (for {
      (w1, c1) <- vocab; (w2, c2) <- vocab
      if w1 < w2
      d = lev(w1, w2) if d <= 2
    } yield (w1, w2, d, c1, c2, if (c1 >= c2) w1 else w2))
      .sortBy(r => (r._3, r._1, r._2))
    val got = SparkEntry.queries("q_fuzzy_match")(spark, sfDir)
      .as[(String, String, Int, Long, Long, String)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty, "fixture should contain at least one fuzzy pair")
  }

  test("connectedComponents: distributed star contraction == driver union-find") {
    // force the distributed path (driverMaxEdges = 0) on a graph with a
    // 5-node chain (multi-round propagation), a triangle, and a pair
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .toDF("d1", "d2")
    val viaLoop = graft.queries.DedupQueries.connectedComponents(spark, pairs,
      driverMaxEdges = 0L)
      .as[(Long, Long, Long)].collect().toSet
    val viaDriver = graft.queries.DedupQueries.connectedComponents(spark, pairs)
      .as[(Long, Long, Long)].collect().toSet
    assert(viaLoop == viaDriver)
    assert(viaLoop == Set(
      (1L, 1L, 5L), (2L, 1L, 5L), (3L, 1L, 5L), (4L, 1L, 5L), (5L, 1L, 5L),
      (10L, 10L, 3L), (11L, 10L, 3L), (12L, 10L, 3L),
      (20L, 20L, 2L), (21L, 20L, 2L)))
  }

  test("connectedComponents: 120-hop chain converges distributed — the pre-r12 20-round diameter cap could not") {
    // a single path graph 0–1–2–…–120: min-label propagation moves the
    // min ONE hop per round (needs 120 rounds; the old implementation
    // threw at 20); alternating large-star/small-star halves the
    // remaining height per round and finishes in ~⌈log₂ 120⌉ + 1
    val chain = spark.range(120L)
      .select(col("id").as("d1"), (col("id") + 1).as("d2"))
    val got = graft.queries.DedupQueries.connectedComponents(spark, chain,
      driverMaxEdges = 0L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == (0L to 120L).map(d => (d, 0L, 121L)).toSet)
  }

  test("connectedComponents: salted large-star (ccSaltBuckets=8) on a planted " +
      "mega-star gives identical labels (r13)") {
    // one component owns 90% of all edges: hub 1000 fans out to 900
    // spokes (every round's min-agg concentrates on the hub key — the
    // Kiveris skew regime), plus a 50-hop chain and a pair as controls;
    // salting must be EXACTLY label-invariant, not approximately
    val mega = (1L to 900L).map(i => (1000L, 2000L + i))
    val chain = (0L until 50L).map(i => (3000L + i, 3001L + i))
    val pairs = (mega ++ chain ++ Seq((7L, 8L))).toDF("d1", "d2")
    spark.conf.set("spark.graft.ccSaltBuckets", "8")
    val salted =
      try graft.queries.DedupQueries.connectedComponents(spark, pairs,
        driverMaxEdges = 0L).as[(Long, Long, Long)].collect().toSet
      finally spark.conf.unset("spark.graft.ccSaltBuckets")
    val viaDriver = graft.queries.DedupQueries.connectedComponents(spark, pairs)
      .as[(Long, Long, Long)].collect().toSet
    assert(salted == viaDriver)
    // the mega component really is the 901-node star rooted at the hub
    assert(salted.count(_._3 == 901L) == 901)
    assert(salted.filter(_._3 == 901L).forall(_._2 == 1000L))
  }

  test("connectedComponents: star contraction == union-find on a deterministic random graph (r12)") {
    // 400 nodes, ~300 hash-derived edges (no RNG state): a mix of small
    // components, chains, and merged blobs — the shapes the operator
    // must agree with exact union-find on
    val edges = (0 until 300).map { i =>
      val a = math.abs((i * 2654435761L) % 400)
      val b = math.abs((i * 40503L + 2147483647L) % 400)
      (math.min(a, b), math.max(a, b))
    }.filter { case (a, b) => a != b }
    val pairs = edges.toDF("d1", "d2")
    val viaStars = graft.queries.DedupQueries.connectedComponents(spark, pairs,
      driverMaxEdges = 0L)
      .as[(Long, Long, Long)].collect().toSet
    val viaDriver = graft.queries.DedupQueries.connectedComponents(spark, pairs)
      .as[(Long, Long, Long)].collect().toSet
    assert(viaStars == viaDriver)
  }

  test("connectedComponents: >1M-edge graph takes the distributed branch at the DEFAULT threshold and converges (r7)") {
    // The at-scale branch proven at scale, not just via a forced
    // threshold: 1.05M undirected pairs (> the 1M default
    // driverMaxEdges → 2.1M directed edges fail the 2·threshold gate,
    // so the ADAPTIVE rule itself routes to the star contraction — no
    // collect of the edge list ever happens) over a graph with KNOWN
    // components: 150k chains of 8 consecutive nodes (chains, not
    // stars — the shape that needs multiple contraction rounds).
    // Ground truth is analytic: node i belongs to the
    // component whose min (= cluster_id) is i - i % 8, size 8.
    val k = 8
    val n = 1200000L // 150k components × 8 → 1.05M within-chain pairs
    val pairs = spark.range(n - 1)
      .filter((col("id") + 1) % k =!= 0)
      .select(col("id").as("d1"), (col("id") + 1).as("d2"))
    val labels = graft.queries.DedupQueries.connectedComponents(spark, pairs)
    val bad = labels.filter(
      col("cluster_id") =!= col("doc_id") - (col("doc_id") % k) ||
        col("cluster_size") =!= k).count()
    assert(bad == 0, s"$bad nodes with wrong component label or size")
    assert(labels.count() == n)
  }

  test("q_substring_prune == plain-Scala keep-first coverage fold (r12)") {
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq.sortBy(_._1)
    // min owner per 13-gram across the corpus
    val minOwner = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (id, t) =>
      val w = t.split(" ", -1)
      if (w.length >= 13) w.sliding(13).map(_.mkString(" ")).foreach { g =>
        if (!minOwner.contains(g) || minOwner(g) > id) minOwner(g) = id
      }
    }
    val want = docs.map { case (id, t) =>
      val w = t.split(" ", -1)
      val covered = Array.fill(w.length)(false)
      if (w.length >= 13)
        w.sliding(13).zipWithIndex.foreach { case (g, i) =>
          if (minOwner(g.mkString(" ")) < id)
            (i until i + 13).foreach(covered(_) = true)
        }
      val np = covered.count(identity).toLong
      val n = w.length.toLong
      (id, n, np, n - np, np * 10000L / math.max(n, 1L))
    }
    val got = SparkEntry.queries("q_substring_prune")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // the plant is live: some doc is pruned, and the min-owner of every
    // pruned span keeps its copy (no doc prunes spans it owns first)
    assert(got.exists(_._3 > 0), "no doc pruned — fixture has no cross-doc spans")
    assert(got.filter(_._3 > 0).forall(r => r._4 < r._2))
  }

  test("q_contamination_matrix matches a driver-side shingle fold (r5)") {
    val docs = Tables(spark, sfDir, "documents")
      .select("source", "text").as[(String, String)].collect().toSeq
    val bySource = docs.groupBy(_._1).map { case (src, ds) =>
      src -> ds.flatMap { case (_, t) =>
        val w = t.split(" ", -1)
        if (w.length < 13) Seq.empty
        else w.sliding(13).map(_.mkString(" ")).toSeq
      }.distinct.toSet
    }
    val want = bySource.keys.toSeq.sorted.combinations(2).toSeq.flatMap {
      case Seq(a, b) =>
        val shared = bySource(a).intersect(bySource(b)).size.toLong
        if (shared == 0) None
        else {
          val (na, nb) = (bySource(a).size.toLong, bySource(b).size.toLong)
          Some((a, b, shared, na, nb, shared * 1000000L / math.min(na, nb)))
        }
      case _ => None
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q_contamination_matrix")(spark, sfDir)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // live fixture: planted duplicates span sources
    assert(got.nonEmpty && got.map(_._3).max > 0L)
    // containment is a fraction of the smaller side: ≤ 1e6
    got.foreach(r => assert(r._6 <= 1000000L))
  }

  test("q_dedup_incremental == driver fold over the declared pair relation (r11)") {
    val ids = Tables(spark, sfDir, "documents").select("doc_id")
      .as[Long].collect().toSeq
    val t = (4L * (ids.max + 1L)) / 5L
    // the probe-filtered pair relation must be EXACTLY the full declared
    // pair relation restricted to batch-side d2 (losslessness of the
    // incremental probe), so the fold derives from q_dedup_ngram alone
    val pairs = SparkEntry.queries("q_dedup_ngram")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    val best = pairs.filter(_._2 >= t).groupBy(_._2).map { case (d2, ps) =>
      val b = ps.minBy(p => (-p._3, p._1))
      d2 -> (b._1, b._3)
    }
    val want = ids.filter(_ >= t).sorted.map { id =>
      best.get(id) match {
        case Some((m, j)) => (id, "drop", Some(m), Some(j))
        case None         => (id, "keep", None, None)
      }
    }
    val got = SparkEntry.queries("q_dedup_incremental")(spark, sfDir)
      .as[(Long, String, Option[Long], Option[Long])].collect().toSeq
    assert(got == want)
    // live fixture: the batch both drops and keeps
    assert(got.exists(_._2 == "drop") && got.exists(_._2 == "keep"))
  }

  test("q_split_leakage_safe: no near-dup pair straddles a split; agg matches a driver fold (r11)") {
    // the md5-mod-100 rule, recomputed driver-side (java MD5 == both engines')
    def split100(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      val h = java.lang.Long.parseLong(hex, 16) % 100L
      if (h < 90) "train" else if (h < 95) "val" else "test"
    }
    val lbl = SparkEntry.queries("q_dedup_groups")(spark, sfDir)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    def splitOf(id: Long): String = split100(lbl.getOrElse(id, id))
    // leakage safety, edge by edge: every declared near-dup pair lands
    // in ONE split (the property plain per-doc hashing violates)
    val pairs = SparkEntry.queries("q_dedup_ngram")(spark, sfDir)
      .select("d1", "d2").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(splitOf(a) == splitOf(b), s"pair ($a,$b) straddles splits")
    }
    // and the fixture is live: at least one cluster member would have
    // landed elsewhere under plain per-doc hashing
    assert(lbl.exists { case (d, c) => split100(d) != split100(c) },
      "fixture never exercises the cluster-key rerouting")
    // full-agg equivalence against a driver-side fold over documents
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        size(org.apache.spark.sql.functions.split(col("text"), " ")).cast("long"))
      .as[(Long, String, Long)].collect().toSeq
    val want = docs.groupBy(d => (d._2, splitOf(d._1))).toSeq.map {
      case ((src, sp), rows) =>
        (src, sp, rows.size.toLong, rows.map(_._3).sum,
          rows.count(r => lbl.contains(r._1)).toLong)
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q_split_leakage_safe")(spark, sfDir)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("q_winnow == plain-Scala winnow fold; ≥8-token shared runs share a fingerprint (r13)") {
    // reference winnow: k=5 grams, keys fold (hash mod 2^40, rightmost-
    // tie) into one integer, w=4 window minima — the query's exact rule
    def keysOf(tokens: Seq[String]): Seq[Long] =
      tokens.sliding(5).filter(_.size == 5).zipWithIndex.map { case (g, i0) =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(g.mkString(" ").getBytes("UTF-8")).map("%02x".format(_))
          .mkString.take(15)
        val hr = java.lang.Long.parseLong(hex, 16) % (1L << 40)
        hr * (1L << 20) + ((1L << 20) - 1L - (i0 + 1L))
      }.toSeq
    def selected(tokens: Seq[String]): Set[Long] = {
      val ks = keysOf(tokens)
      (0 to ks.size - 4).map(j => ks.slice(j, j + 4).min).toSet
    }
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val want = docs.map { case (id, t) =>
      val ts = t.split(" ", -1).toSeq
      val ng = math.max(ts.size - 4, 0).toLong
      val nw = math.max(ng - 3, 0L)
      val ns = if (nw == 0) 0L else selected(ts).size.toLong
      (id, ng, nw, ns, if (ng > 3) ns * 10000L / (ng - 3) else 0L)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_winnow")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // the paper's guarantee (Schleimer et al. §3): two docs sharing a
    // run of ≥ w+k−1 = 8 tokens share at least one selected HASH —
    // planted around disjoint prefixes/suffixes of deterministic junk
    val run = "alpha beta gamma delta epsilon zeta eta theta".split(" ").toSeq
    val a = (1 to 20).map(i => s"xa$i") ++ run ++ (1 to 9).map(i => s"ya$i")
    val b = (1 to 7).map(i => s"xb$i") ++ run ++ (1 to 15).map(i => s"yb$i")
    val hashesOf = (t: Seq[String]) => selected(t).map(_ >> 20)
    assert((hashesOf(a) intersect hashesOf(b)).nonEmpty,
      "8-token shared run produced no common fingerprint")
    // density sanity on the corpus: mean within [0.3, 0.6] of windows
    val dens = want.filter(_._3 > 0).map(_._5)
    val mean = dens.sum / dens.size
    assert(mean > 3000L && mean < 6000L, s"mean density_e4=$mean")

    // q_winnow_dup: cross-doc shared fingerprints from the SAME fold
    val fpOf: Map[Long, Set[Long]] = docs.map { case (id, t) =>
      val ts = t.split(" ", -1).toSeq
      id -> (if (ts.size < 8) Set.empty[Long] else selected(ts).map(_ >> 20))
    }.toMap
    val owner = fpOf.toSeq.flatMap { case (id, hs) => hs.map(_ -> id) }
      .groupBy(_._1).map { case (h, o) => h -> o.map(_._2).min }
    val wantDup = docs.map { case (id, _) =>
      val hs = fpOf(id)
      val shared = hs.count(h => owner(h) < id).toLong
      (id, hs.size.toLong, shared,
        shared * 10000L / math.max(hs.size.toLong, 1L))
    }.sortBy(_._1)
    val gotDup = SparkEntry.queries("q_winnow_dup")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(gotDup == wantDup)
    // cross-doc sharing is live at every SF (shared 5-grams exist)
    assert(wantDup.exists(_._3 > 0), "no shared fingerprint anywhere")
    // every non-first exact duplicate (≥8 tokens) shares ALL its
    // fingerprints — identical grams AND positions → identical picks.
    // (sf0.001 plants only shorter exact dups; verified live at
    // sf0.1/gen-sf1: 186 docs at shared_frac_e4 = 10000.)
    val firstByText = docs.groupBy(_._2).map { case (_, o) => o.map(_._1).min }.toSet
    val exactDups = docs.filter { case (id, t) =>
      !firstByText(id) && t.split(" ", -1).length >= 8 }.map(_._1)
    val dupMap = gotDup.map(r => r._1 -> r._4).toMap
    exactDups.foreach { id =>
      assert(dupMap(id) == 10000L, s"exact dup $id shared_frac != 10000")
    }
  }

  test("q_paragraph_dedup: planted boilerplate paragraph drops everywhere " +
    "but its first occurrence; matches a plain-Scala fold (r14)") {
    import spark.implicits._
    // Planted fixture: a 12-token boilerplate block heads docs 1/3/5
    // (and doc 3 repeats it mid-text); every body is otherwise unique.
    val boiler = (1 to 12).map(i => s"boiler$i").mkString(" ")
    def body(id: Long, n: Int) = (1 to n).map(i => s"u${id}w$i").mkString(" ")
    val docs: Seq[(Long, String)] = Seq(
      0L -> body(0, 30),
      1L -> s"$boiler ${body(1, 17)}",
      2L -> body(2, 5), // short doc: single ragged paragraph
      3L -> s"$boiler ${body(3, 12)} $boiler",
      4L -> body(4, 24),
      5L -> s"$boiler ${body(5, 3)}")
    val dir = java.nio.file.Files.createTempDirectory("graft_pdedup_").toString
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    // plain-Scala fold of the CCNet keep-first rule on 12-token chunks
    val paras = docs.flatMap { case (id, t) =>
      t.split(" ", -1).grouped(12).zipWithIndex.map { case (ch, pid) =>
        (id, id * 1048576L + pid, ch.mkString(" "), ch.length.toLong)
      }
    }
    val minOwner = paras.groupBy(_._3).map { case (p, o) => p -> o.map(_._2).min }
    val want = paras.groupBy(_._1).toSeq.map { case (id, ps) =>
      val kept = ps.filter(p => minOwner(p._3) == p._2)
      val nt = ps.map(_._4).sum
      val ntk = kept.map(_._4).sum
      (id, ps.size.toLong, (ps.size - kept.size).toLong, nt, ntk,
        ntk * 10000L / math.max(nt, 1L))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_paragraph_dedup")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    val byId = got.map(r => r._1 -> r).toMap
    // doc 1 (lowest id with the plant) keeps all its paragraphs
    assert(byId(1L)._3 == 0L)
    // docs 3 and 5 drop the boilerplate block; doc 3 drops BOTH copies
    // (the plant sits at chunk boundaries 0 and 24: 12-token prefix +
    // 12-token body + trailing copy)
    assert(byId(3L)._3 == 2L && byId(3L)._5 == byId(3L)._4 - 24L)
    assert(byId(5L)._3 == 1L)
    // untouched docs survive whole
    Seq(0L, 2L, 4L).foreach(id => assert(byId(id)._6 == 10000L))
    // and on the real fixture the profile is total + token-conserving
    val sf = SparkEntry.queries("q_paragraph_dedup")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(sf.size == Tables(spark, sfDir, "documents").count())
    assert(sf.forall(r => r._5 <= r._4 && r._6 <= 10000L))

    // q_paragraph_apply (r15): reconstructs exactly the kept chunks in
    // position order, under the same keep-first relation
    val gotApply = SparkEntry.queries("q_paragraph_apply")(spark, dir)
      .as[(Long, Long, Long, String)].collect().toSeq
    val wantApply = paras.groupBy(_._1).toSeq.flatMap { case (id, ps) =>
      val kept = ps.filter(p => minOwner(p._3) == p._2).sortBy(_._2)
      if (kept.isEmpty) None
      else Some((id, kept.size.toLong, kept.map(_._4).sum,
        kept.map(_._3).mkString(" ")))
    }.sortBy(_._1)
    assert(gotApply == wantApply)
    val appById = gotApply.map(r => r._1 -> r).toMap
    // doc 1 (first occurrence) keeps its full original text verbatim
    assert(appById(1L)._4 == docs.find(_._1 == 1L).get._2)
    // docs 3 and 5 keep only their unique bodies (boilerplate stripped;
    // doc 3 loses BOTH copies)
    assert(appById(3L)._4 == body(3, 12))
    assert(appById(5L)._4 == body(5, 3))
    // apply and profile agree doc-by-doc on the survivors (shared
    // kernel — kept counts can't drift)
    val profById = got.map(r => r._1 -> r).toMap
    gotApply.foreach { a =>
      val p = profById(a._1)
      assert(a._2 == p._2 - p._3 && a._3 == p._5,
        s"apply/profile drift on doc ${a._1}: $a vs $p")
    }
  }
}
