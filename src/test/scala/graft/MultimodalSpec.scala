package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaCodec, MediaMeta}

/** Multimodal plumbing: per-partition codec lifecycle, frame slicing
  * against a plain-Scala reference, and entropy signal properties —
  * the Spark-side story for the stubbed codec boundary.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeMeta constructs ONE codec per partition, not per row") {
    val df = (1L to 100L).map(i => (i, Array.fill(i.toInt)(i.toByte))).toDF("id", "payload")
      .repartition(4)
    val acc = spark.sparkContext.longAccumulator("codecInits")
    val counting = () => { acc.add(1); Multimodal.StubCodec: MediaCodec }
    val out = Multimodal.decodeMeta(df, "id", "payload", counting).collect()
    assert(out.length == 100)
    assert(acc.value <= 4, s"codec built ${acc.value} times for 4 partitions")
  }

  test("stub decode is deterministic and matches its documented formula") {
    val bytes = "hello world".getBytes("UTF-8")
    val m = Multimodal.StubCodec.decode(7L, bytes)
    val len = bytes.length
    assert(m == MediaMeta(7L, if ((bytes(0) & 1) == 0) "img" else "aud",
      64 + len % 577, 64 + len % 331, 1 + len % 3))
    assert(Multimodal.StubCodec.decode(7L, bytes) == m)
  }

  test("frameSample slices match a plain-Scala reference") {
    val payload = (0 until 100).map(_.toByte).toArray
    val got = Seq(Tuple1(payload)).toDF("p")
      .select(Multimodal.frameSample(col("p"), 32, 4).as("f"))
      .collect()(0).getAs[scala.collection.Seq[Array[Byte]]]("f")
    // 100 bytes → frames [0,32) [32,64) [64,96) [96,100); every 4th → frame 0 only
    assert(got.length == 1 && got.head.toSeq == payload.slice(0, 32).toSeq)
    val got2 = Seq(Tuple1(payload)).toDF("p")
      .select(Multimodal.frameSample(col("p"), 16, 2).as("f"))
      .collect()(0).getAs[scala.collection.Seq[Array[Byte]]]("f")
    // 7 frames (last is 4 bytes); every 2nd → frames 0,2,4,6
    assert(got2.map(_.length) == Seq(16, 16, 16, 4))
    assert(got2(3).toSeq == payload.slice(96, 100).toSeq)
  }

  test("frameSample of an empty payload: 0 frames, 0 sampled, 0 bytes (oracle-aligned)") {
    // the exact q_mm_frames projection over an empty binary — the
    // semantic the DuckDB oracle now encodes (plain range, no
    // GREATEST(n,1) floor)
    val frames = Multimodal.frameSample(col("p"), frameSize = 32, every = 4)
    val r = Seq(Tuple1(Array.empty[Byte])).toDF("p")
      .select(
        ceil(octet_length(col("p")) / 32.0).cast("long").as("n_frames"),
        size(frames).cast("long").as("n_sampled"),
        aggregate(transform(frames, f => octet_length(f).cast("long")),
          lit(0L), (a, x) => a + x).as("bytes_sampled"))
      .collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.getLong(2) == 0L)
  }

  test("fitDims: aspect-preserving integer downscale, never upscales, 1-px floor") {
    // downscale: 640x331 into 128x128 → scale = min(1, 128/640, 128/331)
    // = 0.2 exactly → 128 x 66
    assert(Multimodal.fitDims(640, 331, 128, 128) == ((128, 66)))
    // never upscale: smaller-than-target stays put
    assert(Multimodal.fitDims(64, 64, 128, 128) == ((64, 64)))
    // floor scaling with 1-px floor on pathological aspect
    assert(Multimodal.fitDims(10000, 1, 128, 128) == ((128, 1)))
    // square into square
    assert(Multimodal.fitDims(577, 577, 128, 128) == ((127, 127))) // floor(577*2218/1e4)
  }

  test("resizePayloads stub: truncates to the pixel budget; empty payload stays empty") {
    val payload = (0 until 5000).map(_.toByte).toArray
    val rows = Seq((1L, payload), (2L, Array.empty[Byte]))
      .toDF("id", "p")
    val got = Multimodal.resizePayloads(rows, "id", "p", 128, 128)
      .select("media_id", "width", "height", "out_w", "out_h", "out_payload")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
          r.getAs[Array[Byte]](5))).toMap
    val (w, h, ow, oh, out) = got(1L)
    // len 5000: w=64+5000%577=64+384=448, h=64+5000%331=64+35=99, c=1+5000%3=3
    assert((w, h) == ((448, 99)))
    val (ew, eh) = Multimodal.fitDims(448, 99, 128, 128)
    assert((ow, oh) == ((ew, eh)))
    assert(out.length == math.min(5000, ew * eh * 3))
    assert(out.toSeq == payload.take(out.length).toSeq) // truncation, not fabrication
    val (_, _, _, _, out2) = got(2L)
    assert(out2.isEmpty)
  }

  test("byte entropy: 0 for constant payloads, 8 bits for all-256-bytes, ordered") {
    assert(Multimodal.byteEntropy(Array.fill(64)(7.toByte)) == 0.0)
    val uniform = (0 until 256).map(_.toByte).toArray
    assert(math.abs(Multimodal.byteEntropy(uniform) - 8.0) < 1e-9)
    assert(Multimodal.byteEntropy(Array[Byte]()) == 0.0)
    val text = Multimodal.byteEntropy("the quick brown fox jumps".getBytes)
    assert(text > 0.0 && text < 8.0)
  }

  test("log2e20: exact at powers of two, monotone, ≤1 e20-unit from true log2") {
    assert(Multimodal.log2e20(1L) == 0L)
    assert(Multimodal.log2e20(2L) == (1L << 20))
    assert(Multimodal.log2e20(4L) == (2L << 20))
    assert(Multimodal.log2e20(65536L) == (16L << 20))
    var prev = -1L
    (1L to 4096L).foreach { v =>
      val l = Multimodal.log2e20(v)
      assert(l >= prev); prev = l
      val truth = math.log(v.toDouble) / math.log(2.0) * (1L << 20)
      assert(math.abs(l - truth) <= 1.0, s"v=$v l=$l truth=$truth")
    }
  }

  test("q_mm_entropy produces a value per document in (0, 8e6)") {
    val rows = SparkEntry.queries("q_mm_entropy")(spark, sfDir)
      .as[(Long, Long)].collect()
    assert(rows.length == 500)
    assert(rows.forall { case (_, e) => e > 0 && e < 8000000 })
  }

  test("byteEntropyE6 tracks libm byteEntropy within 10 e6-units on the corpus") {
    // the fixed-point table is ≤1 e20-unit off per term, so H·1e6 drifts
    // by at most a few units from the transcendental value — the signal
    // is the same, only now it's engine-exact
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    docs.foreach { case (id, t) =>
      val b = t.getBytes("UTF-8")
      val e6 = Multimodal.byteEntropyE6(b)
      val libm = Multimodal.byteEntropy(b) * 1e6
      assert(math.abs(e6 - libm) <= 10.0, s"doc $id: $e6 vs $libm")
    }
    // edge cases: empty and constant payloads are 0; uniform 256 is 8 bits
    assert(Multimodal.byteEntropyE6(Array[Byte]()) == 0L)
    assert(Multimodal.byteEntropyE6(Array.fill(64)(7.toByte)) == 0L)
    assert(Multimodal.byteEntropyE6((0 until 256).map(_.toByte).toArray) == 8000000L)
  }

  test("byteStats: edge cases and a driver-side reference") {
    assert(Multimodal.byteStats(Array[Byte]()) == ((0L, 0L, -1L, 0L, 0L)))
    // constant payload: 1 distinct byte, full concentration (1e6)
    assert(Multimodal.byteStats(Array.fill(64)(7.toByte)) == ((64L, 1L, 7L, 64L, 1000000L)))
    // modal tie breaks to the LOWER byte value
    assert(Multimodal.byteStats(Array[Byte](2, 1, 1, 2)) == ((4L, 2L, 1L, 2L, 500000L)))
    val got = SparkEntry.queries("q_mm_byte_stats")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val want = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> Multimodal.byteStats(t.getBytes("UTF-8")) }
      .toMap
    assert(got == want)
  }

  test("q_mm_frame_energy matches a driver-side reference; empty/non-ASCII edges (r5)") {
    import graft.functions.FrameEnergy
    def ref(b: Array[Byte]): (Long, Long, Long, Long) = {
      if (b.isEmpty) (0L, 0L, 0L, 0L)
      else {
        val sums = b.grouped(32).map(_.map(x => (x & 0xff).toLong).sum).toSeq
        (sums.size.toLong, sums.sum, sums.max, sums.min)
      }
    }
    // expression edge cases straight through the eval path
    val cases = Seq(
      Array[Byte](),
      Array.fill(32)(1.toByte),
      Array.fill(33)(-1.toByte), // unsigned view: 255s, partial last frame
      "héllo wörld 日本語 multi-byte test payload over thirty-two bytes".getBytes("UTF-8"))
    cases.foreach { b =>
      val got = cases.indexOf(b) // force stable closure; real check below
      val row = Seq(Tuple1(b)).toDF("p")
        .select(FrameEnergy.frameEnergy(col("p"), 32).as("fe"))
        .select("fe.n_frames", "fe.sum_e", "fe.max_e", "fe.min_e")
        .as[(Long, Long, Long, Long)].head()
      assert(row == ref(b), s"payload of ${b.length} bytes (case $got)")
    }
    // declared query vs reference over the corpus
    val got = SparkEntry.queries("q_mm_frame_energy")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val want = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> ref(t.getBytes("UTF-8")) }.toMap
    assert(got == want)
  }

  test("q_mm_ahash matches a driver-side brute-force fold; AHash64 matches its reference (r5)") {
    // cyclic-extension semantics: bit i tests byte (i mod n) against
    // the exact integer mean of the n-byte head (AHash64 scaladoc)
    def ahash(bytes: Array[Byte]): Long = {
      val n = math.min(64, bytes.length)
      if (n == 0) return 0L
      val s = (0 until n).map(i => (bytes(i) & 0xff).toLong).sum
      (0 until 64).foldLeft(0L) { (h, i) =>
        if ((bytes(i % n) & 0xffL) * n > s) h | (1L << i) else h
      }
    }
    // expression vs reference on edge payloads (empty, 1-byte, a 2-byte
    // payload where the cyclic wraparound sets alternating bits across
    // all four bands, 63/64/65, all-equal bytes → mean never exceeded
    // → hash 0)
    for (bytes <- Seq(Array.empty[Byte], Array[Byte](7), Array[Byte](1, 2),
        Array.fill(63)(1.toByte),
        (0 until 64).map(_.toByte).toArray, (0 until 65).map(_.toByte).toArray,
        Array.fill(64)(42.toByte))) {
      val got = Seq(Tuple1(bytes)).toDF("p")
        .select(graft.functions.AHash64.aHash64(col("p"))).as[Long].head()
      assert(got == ahash(bytes), s"len ${bytes.length}")
    }
    // declared query vs a driver-side all-pairs fold
    val hs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
      .filter(_._2.nonEmpty)
      .map { case (id, t) => id -> ahash(t.getBytes("UTF-8")) }
    val want = (for {
      i <- hs.indices; j <- (i + 1) until hs.length
      (d1, h1) = if (hs(i)._1 < hs(j)._1) hs(i) else hs(j)
      (d2, h2) = if (hs(i)._1 < hs(j)._1) hs(j) else hs(i)
      ham = java.lang.Long.bitCount(h1 ^ h2)
      if ham <= 3
    } yield (d1, d2, ham)).sorted.toSeq
    val got = SparkEntry.queries("q_mm_ahash")(spark, sfDir)
      .as[(Long, Long, Int)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q_mm_silence: multi-frame runs detected on synthetic payloads (r5)") {
    import graft.queries.MultimodalQueries
    // payload 1: loud(2) silence(3) loud(2) silence(1) — two runs, max 3
    // payload 2: all loud — no silence
    // payload 3: single partial quiet frame among loud ones — run of 1
    def frames(spec: (Int, Int)*): Array[Byte] =
      spec.flatMap { case (v, k) => Array.fill(32 * k)(v.toByte) }.toArray
    val p1 = frames((200, 2), (0, 3), (200, 2), (0, 1))
    val p2 = frames((100, 4))
    val p3 = frames((200, 3)) ++ Array.fill(4)(1.toByte)
    val df = Seq((1L, p1), (2L, p2), (3L, p3)).toDF("doc_id", "payload")
    val got = MultimodalQueries.silenceProfile(df)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 8L, 4L, 2L, 3L),   // 4 silent frames in runs of 3 + 1
      (2L, 4L, 0L, 0L, 0L),   // uniform energy: nothing below half-mean
      (3L, 4L, 1L, 1L, 1L)))  // the quiet partial tail frame
    // and the declared query agrees with the kernel on the real corpus
    val viaQuery = SparkEntry.queries("q_mm_silence")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(viaQuery.nonEmpty && viaQuery.forall(r => r._3 <= r._2))
  }

  test("q_mm_scene_cut: genuine energy jumps detected on synthetic payloads (r5)") {
    import graft.queries.MultimodalQueries
    def frames(spec: (Int, Int)*): Array[Byte] =
      spec.flatMap { case (v, k) => Array.fill(32 * k)(v.toByte) }.toArray
    // payload 1: black(3) white(3) black(3) — jumps at frames 3 and 6
    // (diffs [0,0,8160,0,0,8160,0,0]: mean 2040, cut iff d > 3060)
    // payload 2: uniform — no jump anywhere, no cuts
    // payload 3: empty — 0 frames, 0 segments, first_cut −1
    val p1 = frames((0, 3), (255, 3), (0, 3))
    val p2 = frames((100, 5))
    val p3 = Array.empty[Byte]
    val df = Seq((1L, p1), (2L, p2), (3L, p3)).toDF("doc_id", "payload")
    val got = MultimodalQueries.sceneCutProfile(df)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 9L, 2L, 3L, 8160L, 3L), // two cuts → three scenes
      (2L, 5L, 0L, 1L, 0L, -1L),   // one unbroken scene
      (3L, 0L, 0L, 0L, 0L, -1L)))  // empty payload keeps its row
    // and the declared query is consistent on the real corpus
    val viaQuery = SparkEntry.queries("q_mm_scene_cut")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(viaQuery.nonEmpty && viaQuery.forall(r =>
      r._4 == (if (r._2 > 0) r._3 + 1 else 0L) && r._6 < r._2))
  }

  test("HeaderCodec: true dims for every planted well-formed PNG/BMP; " +
      "strict validation falls back to the stub on text/truncation (r16)") {
    import graft.multimodal.{MmFixture, Multimodal}
    // golden: each planted payload decodes to its declared true meta
    MmFixture.planted.foreach { p =>
      val m = Multimodal.HeaderCodec.decode(p.id, p.bytes)
      assert((m.format, m.width, m.height, m.channels) ==
        (p.format, p.width, p.height, p.channels),
        s"planted ${p.id}: got $m want $p")
    }
    // fallback parity: inputs the validator must REJECT decode exactly
    // as the stub would (corpus rows keep their arithmetic oracle)
    val rejects = Seq(
      ("BM" + "x" * 60).getBytes("UTF-8"),     // ASCII text after 'BM'
      MmFixture.png(9, 9, colorType = 2).take(20), // truncated PNG
      MmFixture.png(9, 9, colorType = 5),      // invalid color type
      MmFixture.bmp(0, 4, 24),                 // zero width
      Array.empty[Byte])
    rejects.foreach { b =>
      assert(Multimodal.HeaderCodec.decode(7L, b) ==
        Multimodal.StubCodec.decode(7L, b), "validator must fall back")
    }
    // and a 2-bpp palette BMP maps to 1 channel
    val m = Multimodal.HeaderCodec.decode(8L, MmFixture.bmp(5, 5, 2))
    assert((m.format, m.width, m.height, m.channels) == ("bmp", 5, 5, 1))
  }

  test("HeaderCodec failure modes: every malformed class falls back to " +
      "the stub, gracefully, per case (r17)") {
    import graft.multimodal.{MmFixture, Multimodal}
    // patch helper: copy with bytes [at, at+vals) replaced
    def patch(b: Array[Byte], at: Int, vals: Int*): Array[Byte] = {
      val c = b.clone()
      vals.zipWithIndex.foreach { case (v, i) => c(at + i) = v.toByte }
      c
    }
    val png = MmFixture.png(9, 9, colorType = 2)
    val bmp = MmFixture.bmp(16, 16, 24)
    val cases: Seq[(String, Array[Byte])] = Seq(
      // --- PNG ---
      ("IHDR truncated mid-chunk (32 bytes, one short of the minimum)",
        png.take(32)),
      ("IHDR length word != 13", patch(png, 11, 14)),
      ("IHDR tag corrupted at the CRC-guarded position ('IHDX')",
        patch(png, 15, 'X')),
      ("PNG zero width", patch(png, 16, 0, 0, 0, 0)),
      ("PNG width be32 ≥ 2^31 (overflows negative; w<=0 guard)",
        patch(png, 16, 0x80, 0, 0, 0)),
      ("PNG height be32 ≥ 2^31", patch(png, 20, 0x80, 0, 0, 0)),
      // --- BMP ---
      ("BITMAPCOREHEADER dib=12 (unsupported core variant)",
        patch(bmp, 14, 12, 0, 0, 0)),
      ("BMP height == 0", patch(bmp, 22, 0, 0, 0, 0)),
      ("BMP height 0x80000000 (abs stays negative; h<=0 guard)",
        patch(bmp, 22, 0, 0, 0, 0x80)),
      ("BMP width le32 ≥ 2^31", patch(bmp, 18, 0, 0, 0, 0x80)),
      ("BMP file-size word disagrees with actual length",
        patch(bmp, 2, (bmp.length + 1) & 0xff, ((bmp.length + 1) >> 8) & 0xff,
          ((bmp.length + 1) >> 16) & 0xff, ((bmp.length + 1) >> 24) & 0xff)),
      ("BMP reserved words nonzero", patch(bmp, 6, 1)),
      ("BMP pixel offset beyond the file", patch(bmp, 10, 0xff, 0xff, 0, 0)),
      ("BMP pixel offset inside the headers", patch(bmp, 10, 10, 0, 0, 0)),
      ("BMP bpp invalid (64)", patch(bmp, 28, 64, 0)),
      // the ADVICE scenario: a degenerate text payload starting 'BM'
      // carrying NUL bytes — must NOT sniff as BMP (its length is not
      // embedded at offset 2, so the strict file-size check rejects it)
      ("NUL-laden text starting 'BM'",
        Array[Byte]('B', 'M') ++ new Array[Byte](60)),
      ("truncated BMP (53 bytes, one short of the headers)", bmp.take(53)))
    cases.foreach { case (label, b) =>
      assert(Multimodal.HeaderCodec.decode(9L, b) ==
        Multimodal.StubCodec.decode(9L, b),
        s"malformed class must fall back to stub: $label")
    }
    // the strict checks must not reject the well-formed planted set
    MmFixture.planted.foreach { p =>
      assert(Multimodal.HeaderCodec.decode(p.id, p.bytes).format == p.format)
    }
  }
}
