package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.{MmFixture, Multimodal}

/** Batch 9 ★ — multimodal binary-column operators. The testdata has no
  * media table, so payloads are derived (`encode(text)` → binary) —
  * the point is the operator plumbing, which is payload-agnostic:
  * opaque bytes in, typed metadata / frame samples / content signals
  * out. The codec for derived-text payloads is the documented stub
  * ([[graft.multimodal.Multimodal.StubCodec]]); it is a pure function
  * of the bytes, which keeps these queries DuckDB-oracle-checkable —
  * the oracle reproduces the stub arithmetic from `octet_length`. As
  * of r16, q_mm_meta additionally decodes REAL planted PNG/BMP
  * payloads through [[graft.multimodal.Multimodal.HeaderCodec]]
  * (true header parsing; see [[graft.multimodal.MmFixture]]).
  */
object MultimodalQueries {

  // NULL text carries an EMPTY payload (not a NULL one): the whole
  // family's empty-payload semantics then apply uniformly, and the
  // oracles' encode(COALESCE(text,'')) match byte-for-byte (r17 sweep)
  private def payloads(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))

  /** Scene-cut profile over (doc_id, payload) rows — the q_mm_scene_cut
    * kernel, public so the spec can drive it on synthetic payloads with
    * genuine energy jumps (the ASCII corpus is near-homogeneous; see
    * the query's scaladoc).
    */
  def sceneCutProfile(p: DataFrame): DataFrame = {
    val frames = p
      .select(col("doc_id"),
        posexplode_outer(
          graft.functions.FrameEnergy.frameEnergies(col("payload"), 32))
          .as(Seq("f", "e")))
    val wLag = Window.partitionBy("doc_id").orderBy("f")
    val wDoc = Window.partitionBy("doc_id")
    val d = frames
      .withColumn("d", abs(col("e") - lag(col("e"), 1).over(wLag)))
      .withColumn("n_d", count(col("d")).over(wDoc))
      .withColumn("sum_d", sum(col("d")).over(wDoc))
      .withColumn("cut",
        col("d") * 2L * col("n_d") > lit(3L) * col("sum_d"))
    d.groupBy("doc_id")
      .agg(count(col("e")).as("n_frames"),
        coalesce(sum(when(col("cut"), 1L).otherwise(0L)), lit(0L)).as("n_cuts"),
        coalesce(max(col("d")), lit(0L)).as("max_jump"),
        coalesce(min(when(col("cut"), col("f"))), lit(-1L)).as("first_cut"))
      .withColumn("n_segments",
        when(col("n_frames") > 0, col("n_cuts") + 1L).otherwise(0L))
      .select(col("doc_id"), col("n_frames"), col("n_cuts"),
        col("n_segments"), col("max_jump"), col("first_cut"))
      .orderBy("doc_id")
  }

  /** Silence-run profile over (doc_id, payload) rows — the q_mm_silence
    * kernel, public so the spec can drive it on synthetic payloads with
    * genuine multi-frame silence (the ASCII corpus only ever yields the
    * trailing-partial-frame artifact; see the query's scaladoc).
    */
  def silenceProfile(p: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fr = p.select(col("doc_id"),
      posexplode(graft.functions.FrameEnergy.frameEnergies(col("payload"), 32))
        .as(Seq("f", "e")))
    val wd = Window.partitionBy("doc_id")
    val flagged = fr
      .withColumn("n_frames", count(lit(1)).over(wd))
      .withColumn("sum_e", sum("e").over(wd))
      .withColumn("silent", col("e") * col("n_frames") * 2L < col("sum_e"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    flagged.count() // eager: the runs pipeline + the n_frames agg reuse it
    val ws = Window.partitionBy("doc_id").orderBy("f")
    val runs = flagged.filter(col("silent"))
      .withColumn("anchor", col("f") - row_number().over(ws))
      .groupBy("doc_id", "anchor").agg(count(lit(1)).as("run_len"))
    val perDoc = runs.groupBy("doc_id")
      .agg(sum("run_len").as("n_silent"), count(lit(1)).as("n_runs"),
        max("run_len").as("max_run"))
    flagged.groupBy("doc_id").agg(max("n_frames").as("n_frames"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_frames"),
        coalesce(col("n_silent"), lit(0L)).as("n_silent"),
        coalesce(col("n_runs"), lit(0L)).as("n_runs"),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
      .orderBy("doc_id")
  }

  val entries: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q_mm_meta ★ — per-partition codec decode (mapPartitions batch
    // shape) → metadata aggregation by format, through the REAL header
    // codec (r16, r15 verdict #3): [[Multimodal.HeaderCodec]] parses
    // genuine PNG/BMP headers and falls back to the stub for anything
    // else. The input is the corpus UNION the [[MmFixture]] planted
    // well-formed PNG/BMP payloads (negative ids — disjoint at every
    // sf), whose TRUE dimensions the oracle carries as literals built
    // from the same fixture seq — so the driver's green row is live
    // evidence the codec decodes real byte formats (a parse bug in
    // width/height/channels flips the hash), while the corpus rows
    // keep the stub's arithmetic oracle (ASCII text can never
    // mis-sniff past the header validation). The stub oracle reads the
    // first PAYLOAD BYTE via hex(encode(text)) — byte-exact even for
    // non-ASCII text (r16: DuckDB ascii() is codepoint-based and
    // diverged on the planted unicode degenerate doc).
    QueryDef(
      "q_mm_meta",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        val planted = MmFixture.planted.map(p => (p.id, p.bytes))
          .toDF("doc_id", "payload")
        Multimodal.decodeMeta(
            payloads(s, dir).unionByName(planted), "doc_id", "payload",
            () => Multimodal.HeaderCodec)
          .groupBy("format")
          .agg(count(lit(1)).as("n"), sum("width").as("sum_w"),
            sum("height").as("sum_h"), sum("channels").as("sum_c"))
          .orderBy("format")
      },
      Some(s"""WITH m AS (
             |  SELECT CASE WHEN octet_length(encode(COALESCE(text, ''))) = 0 THEN 'empty'
             |              WHEN ('0x' || substring(hex(encode(COALESCE(text, ''))),1,2))::INT % 2 = 0 THEN 'img'
             |              ELSE 'aud' END AS format,
             |    64 + octet_length(encode(COALESCE(text, ''))) % 577 AS width,
             |    64 + octet_length(encode(COALESCE(text, ''))) % 331 AS height,
             |    1 + octet_length(encode(COALESCE(text, ''))) % 3 AS channels
             |  FROM documents
             |  UNION ALL ${MmFixture.plantedMetaSql})
             |SELECT format, COUNT(*) AS n, SUM(width)::BIGINT AS sum_w,
             |  SUM(height)::BIGINT AS sum_h, SUM(channels)::BIGINT AS sum_c
             |FROM m GROUP BY format ORDER BY format""".stripMargin)),

    // ------------------------------------------------------------------
    // q_mm_frames ★ — fixed-size frame sampling (32-byte frames, every
    // 4th): the Spark side slices real binaries and measures them; the
    // oracle recomputes the same counts arithmetically — agreement
    // verifies the slicing.
    QueryDef(
      "q_mm_frames",
      (s: SparkSession, dir: String) => {
        val frames = Multimodal.frameSample(col("payload"), frameSize = 32, every = 4)
        payloads(s, dir)
          .select(col("doc_id"),
            graft.functions.ExactMath.ceilDiv(
              octet_length(col("payload")).cast("long"), lit(32L)).as("n_frames"),
            size(frames).cast("long").as("n_sampled"),
            aggregate(transform(frames, f => octet_length(f).cast("long")),
              lit(0L), (a, x) => a + x).as("bytes_sampled"))
          .orderBy("doc_id")
      },
      // Empty-payload semantic, both engines: 0 frames → 0 sampled →
      // 0 bytes (matching frameSample's empty array). `range(0, 0, 4)`
      // is empty in DuckDB; the COALESCE covers `list_sum([]) = NULL`
      // (the earlier `GREATEST(n_frames, 1)` workaround for that NULL
      // silently sampled 1 frame from an empty payload — a latent
      // divergence from Spark's 0).
      Some("""SELECT doc_id,
             |  CAST(ceil(octet_length(encode(COALESCE(text, ''))) / 32.0) AS BIGINT) AS n_frames,
             |  CAST(len(range(0, CAST(ceil(octet_length(encode(COALESCE(text, ''))) / 32.0) AS BIGINT), 4)) AS BIGINT) AS n_sampled,
             |  COALESCE(CAST(list_sum(list_transform(
             |    range(0, CAST(ceil(octet_length(encode(COALESCE(text, ''))) / 32.0) AS BIGINT), 4),
             |    i -> LEAST(32, octet_length(encode(COALESCE(text, ''))) - 32*i))) AS BIGINT), 0) AS bytes_sampled
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_mm_resize ★ — aspect-preserving resize-to-fit 128×128 through
    // the per-partition codec seam (the feature-extract/resize step of
    // a multimodal training pipeline), via the REAL
    // [[graft.multimodal.Multimodal.HeaderCodec]] as of r16: true
    // PNG/BMP dims for the planted payloads, stub fallback for the
    // text corpus — the q_mm_meta arrangement. Dimension math is exact integer
    // e4 scaling (Multimodal.fitDims) and the stub's output payload is
    // the input truncated to the resized pixel budget, so the oracle
    // reproduces dims AND output length from octet_length alone; the
    // binary-in/binary-out plumbing is real (narrow map, no shuffle of
    // payloads — only the integer projection aggregates).
    QueryDef(
      "q_mm_resize",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // r16: corpus ∪ the MmFixture planted PNG/BMP payloads through
        // the REAL header codec — the fit arithmetic below runs on
        // TRUE decoded dimensions for those rows (the oracle carries
        // only the decoded inputs as literals; the scaling math runs
        // in SQL for planted and corpus rows alike)
        val planted = MmFixture.planted.map(p => (p.id, p.bytes))
          .toDF("doc_id", "payload")
        Multimodal.resizePayloads(
            payloads(s, dir).unionByName(planted), "doc_id", "payload",
            128, 128, () => Multimodal.HeaderCodec)
          .select(col("media_id").as("doc_id"),
            col("width"), col("height"), col("out_w"), col("out_h"),
            octet_length(col("out_payload")).cast("long").as("out_len"))
          .orderBy("doc_id")
      },
      Some(s"""WITH m AS (
             |  SELECT doc_id, octet_length(encode(COALESCE(text, ''))) AS len,
             |    64 + octet_length(encode(COALESCE(text, ''))) % 577 AS w,
             |    64 + octet_length(encode(COALESCE(text, ''))) % 331 AS h,
             |    1 + octet_length(encode(COALESCE(text, ''))) % 3 AS c
             |  FROM documents
             |  UNION ALL ${MmFixture.plantedResizeSql}),
             |s AS (
             |  SELECT doc_id, len, w, h, c,
             |    LEAST(10000, 128*10000 // w, 128*10000 // h) AS s_e4
             |  FROM m)
             |SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
             |  CAST(GREATEST(1, w*s_e4 // 10000) AS INTEGER) AS out_w,
             |  CAST(GREATEST(1, h*s_e4 // 10000) AS INTEGER) AS out_h,
             |  CAST(LEAST(len, GREATEST(1, w*s_e4 // 10000) *
             |    GREATEST(1, h*s_e4 // 10000) * c) AS BIGINT) AS out_len
             |FROM s ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_mm_entropy ★ — byte-entropy content signal per payload (e.g.
    // compressed-vs-text detection). ORACLE-CHECKED as of r6: libm ln()
    // is not engine-portable at the last ulp (the r5 measurement: the
    // corpus's worst-case distance of entropy·1e6 from a rounding
    // midpoint is 5.5e-7 vs a ~1e-8 cross-libm fold error — a hash
    // flip was plausible), so BOTH engines now compute H from the SAME
    // exact-integer fixed-point log₂ (Multimodal.log2e20: Q30 square-
    // and-shift, 20 result bits, pure 64-bit multiply/shift/compare).
    // Spark runs it inline in the one-pass byte fold; the oracle
    // rebuilds the identical table over the (distinct counts ∪ totals)
    // domain in a recursive CTE — bit-identical by construction, no
    // transcendental call anywhere. r7: the fold runs as the codegen'd
    // ByteDist.byteEntropyE6 expression (static call inside whole-stage
    // codegen), not a Scala-lambda UDF. H·1e6 stays within ~3 e6-units of
    // the libm value (MultimodalSpec asserts the bridge). Byte counts
    // come from hex(payload) — byte-wise, non-ASCII-safe (r5 simhash
    // oracle idiom).
    QueryDef(
      "q_mm_entropy",
      (s: SparkSession, dir: String) =>
        payloads(s, dir)
          .select(col("doc_id"),
            graft.functions.ByteDist.byteEntropyE6(col("payload")).as("entropy_e6"))
          .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE
             |p AS (SELECT doc_id, encode(COALESCE(text, '')) AS payload FROM documents),
             |h AS (
             |  SELECT doc_id, hex(payload) AS hx,
             |    CAST(octet_length(payload) AS BIGINT) AS n
             |  FROM p WHERE octet_length(payload) > 0),
             |b AS (
             |  SELECT doc_id, unnest(list_transform(range(1, CAST(n + 1 AS INTEGER)),
             |    i -> ('0x' || substring(hx, CAST(2*i-1 AS INTEGER), 2))::INT)) AS byte
             |  FROM h),
             |cnt AS (SELECT doc_id, byte, CAST(COUNT(*) AS BIGINT) AS c
             |        FROM b GROUP BY 1, 2),
             |tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS s FROM cnt GROUP BY 1),
             |dom AS (SELECT DISTINCT v FROM
             |        (SELECT c AS v FROM cnt UNION ALL SELECT s AS v FROM tot)),
             |${Log2Sql.cte()},
             |ent AS (
             |  SELECT t.doc_id,
             |    t.s * ls.l - CAST(SUM(c.c * lc.l) AS BIGINT) AS num, t.s AS s
             |  FROM tot t
             |  JOIN lg ls ON ls.v = t.s
             |  JOIN cnt c ON c.doc_id = t.doc_id
             |  JOIN lg lc ON lc.v = c.c
             |  GROUP BY t.doc_id, t.s, ls.l)
             |SELECT d.doc_id,
             |  CAST(COALESCE((ent.num * 1000000) // (ent.s << 20), 0) AS BIGINT)
             |    AS entropy_e6
             |FROM documents d LEFT JOIN ent ON d.doc_id = ent.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_mm_byte_stats ★ — exact byte-distribution content signals per
    // payload: size, distinct bytes, modal byte (+count, ties to the
    // LOWER byte value in both engines), and the Simpson/collision
    // concentration Σcᵢ²·1e6/n² — the rational, ORACLE-CHECKED sibling
    // of q_mm_entropy's Shannon signal (which needs libm ln and is
    // measured non-portable). Same detection use (compressed/random
    // payloads → low concentration, structured → high), none of the
    // transcendental arithmetic. One codegen'd pass per payload
    // (ByteDist.byteStats expression, r7 — no Scala-lambda UDF
    // remains in any declared query); the oracle recomputes the byte
    // stream from hex(encode(text)) — byte-exact for non-ASCII text
    // too (r16: the old per-char ascii() was codepoint-based and
    // diverged on the planted unicode degenerate doc).
    QueryDef(
      "q_mm_byte_stats",
      (s: SparkSession, dir: String) =>
        payloads(s, dir)
          .select(col("doc_id"), graft.functions.ByteDist.byteStats(col("payload")).as("st"))
          .select(col("doc_id"), col("st.*"))
          .orderBy("doc_id"),
      Some("""WITH hx AS (
             |  SELECT doc_id, hex(encode(COALESCE(text, ''))) AS h,
             |    octet_length(encode(COALESCE(text, ''))) AS n
             |  FROM documents),
             |b AS (
             |  SELECT doc_id, unnest(list_transform(range(1, n + 1),
             |    i -> ('0x' || substring(h, (i-1)*2 + 1, 2))::INT)) AS byte
             |  FROM hx),
             |c AS (SELECT doc_id, byte, COUNT(*) AS c FROM b GROUP BY 1, 2),
             |agg AS (
             |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bytes,
             |    CAST(COUNT(*) AS BIGINT) AS distinct_bytes,
             |    CAST(SUM(c*c) AS BIGINT) AS sum_sq, MAX(c) AS mc
             |  FROM c GROUP BY 1),
             |modal AS (
             |  SELECT c.doc_id, CAST(MIN(c.byte) AS BIGINT) AS modal_byte
             |  FROM c JOIN agg ON c.doc_id = agg.doc_id AND c.c = agg.mc
             |  GROUP BY 1)
             |SELECT d.doc_id,
             |  COALESCE(n_bytes, 0) AS n_bytes,
             |  COALESCE(distinct_bytes, 0) AS distinct_bytes,
             |  COALESCE(modal_byte, -1) AS modal_byte,
             |  CAST(COALESCE(mc, 0) AS BIGINT) AS modal_count,
             |  COALESCE((sum_sq * 1000000) // (n_bytes * n_bytes), 0) AS simpson_e6
             |FROM documents d
             |LEFT JOIN agg ON d.doc_id = agg.doc_id
             |LEFT JOIN modal ON d.doc_id = modal.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_mm_frame_energy ★ (new r5) — per-frame byte-energy stats over
    // 32-byte frames: the frame-level triage signal of an audio/video
    // pipeline (silence / black-frame detection runs on exactly this
    // shape; the codec seam swaps byte sums for decoded sample energy
    // without changing the query). ONE fused codegen'd pass per payload
    // (`FrameEnergy` expression — no per-frame array materializes, no
    // interpreted HOF), exact integer outputs. The oracle reconstructs
    // the byte stream from hex(encode(text)) — byte-wise, so it holds
    // for non-ASCII payloads too (the r5 simhash-oracle idiom).
    QueryDef(
      "q_mm_frame_energy",
      (s: SparkSession, dir: String) =>
        payloads(s, dir)
          .select(col("doc_id"),
            graft.functions.FrameEnergy.frameEnergy(col("payload"), 32).as("fe"))
          .select(col("doc_id"),
            col("fe.n_frames").as("n_frames"), col("fe.sum_e").as("sum_e"),
            col("fe.max_e").as("max_e"), col("fe.min_e").as("min_e"))
          .orderBy("doc_id"),
      Some("""WITH p AS (SELECT doc_id, encode(COALESCE(text, '')) AS payload FROM documents),
             |h AS (
             |  SELECT doc_id, hex(payload) AS hx,
             |    CAST(octet_length(payload) AS BIGINT) AS n
             |  FROM p),
             |e AS (
             |  SELECT doc_id,
             |    list_transform(range((n + 31) // 32),
             |      f -> list_sum(list_transform(
             |        range(32*f + 1, LEAST(32*f + 32, n) + 1),
             |        i -> CAST(('0x' || substring(hx, CAST(2*i-1 AS INTEGER), 2))::INT AS BIGINT)))) AS es
             |  FROM h)
             |SELECT doc_id, CAST(len(es) AS BIGINT) AS n_frames,
             |  CAST(COALESCE(list_sum(es), 0) AS BIGINT) AS sum_e,
             |  CAST(COALESCE(list_max(es), 0) AS BIGINT) AS max_e,
             |  CAST(COALESCE(list_min(es), 0) AS BIGINT) AS min_e
             |FROM e ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_mm_silence ★ (new r5) — silence-RUN detection over per-frame
    // energies: per payload, how many frames fall below half the
    // payload's mean frame energy, how many contiguous runs they form,
    // and the longest run — the voice-activity-detection / dead-air
    // triage shape (a real VAD thresholds decoded sample energy; the
    // codec seam swaps that in without changing this query). This is
    // q_streaks' gaps-and-islands kernel applied WITHIN a binary
    // payload: frame rows come from the codegen'd `frameEnergies`
    // array (the fused stats fold can't do runs — run structure needs
    // frame ROWS), silence is the exact integer predicate
    // e·n_frames·2 < sum_e (no division), and islands anchor on
    // f − row_number over the silent frames per doc. On this ASCII
    // corpus the only low-energy frame is the trailing partial one —
    // max_run is 1 wherever silence exists (asserted live in the
    // spec on synthetic payloads with REAL multi-frame silence). All
    // windows are frame-grid-sized per doc — bounded by payload
    // length/32, never corpus-wide.
    QueryDef(
      "q_mm_silence",
      (s: SparkSession, dir: String) => silenceProfile(payloads(s, dir)),
      Some("""WITH p AS (SELECT doc_id, encode(COALESCE(text, '')) AS payload FROM documents),
             |h AS (
             |  SELECT doc_id, hex(payload) AS hx,
             |    CAST(octet_length(payload) AS BIGINT) AS n
             |  FROM p),
             |e AS (
             |  SELECT doc_id,
             |    list_transform(range((n + 31) // 32),
             |      f -> list_sum(list_transform(
             |        range(32*f + 1, LEAST(32*f + 32, n) + 1),
             |        i -> CAST(('0x' || substring(hx, CAST(2*i-1 AS INTEGER), 2))::INT AS BIGINT)))) AS es
             |  FROM h),
             |fr AS (
             |  SELECT doc_id, u.fe.f AS f, u.fe.e AS e FROM (
             |    SELECT doc_id, unnest(list_transform(range(len(es)),
             |      i -> {'f': i, 'e': es[CAST(i+1 AS INTEGER)]})) AS fe FROM e) u),
             |fl AS (
             |  SELECT doc_id, f, e,
             |    COUNT(*) OVER (PARTITION BY doc_id) AS n_frames,
             |    SUM(e) OVER (PARTITION BY doc_id) AS sum_e
             |  FROM fr),
             |si AS (
             |  SELECT doc_id, f,
             |    f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS anchor
             |  FROM fl WHERE e * n_frames * 2 < sum_e),
             |ru AS (
             |  SELECT doc_id, anchor, COUNT(*) AS run_len
             |  FROM si GROUP BY 1, 2),
             |pd AS (
             |  SELECT doc_id, SUM(run_len) AS n_silent, COUNT(*) AS n_runs,
             |    MAX(run_len) AS max_run
             |  FROM ru GROUP BY 1),
             |nf AS (SELECT doc_id, MAX(n_frames) AS n_frames FROM fl GROUP BY 1)
             |SELECT nf.doc_id, CAST(nf.n_frames AS BIGINT) AS n_frames,
             |  CAST(COALESCE(pd.n_silent, 0) AS BIGINT) AS n_silent,
             |  CAST(COALESCE(pd.n_runs, 0) AS BIGINT) AS n_runs,
             |  CAST(COALESCE(pd.max_run, 0) AS BIGINT) AS max_run
             |FROM nf LEFT JOIN pd ON nf.doc_id = pd.doc_id
             |ORDER BY nf.doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_mm_ahash ★ (new r5) — perceptual near-duplicate detection over
    // binary payloads: 64-bit average hash (codegen'd [[AHash64]];
    // exact integer mean compare, bit i = b(i)·n > Σb), banded into
    // 4×16 bits, candidate pairs from the band equi-join (pigeonhole:
    // Hamming ≤ 3 over 4 bands forces ≥1 identical band — lossless,
    // the q_simhash_dup argument), verified by full 64-bit Hamming.
    // This is image dedup without decoding: the codec seam feeds
    // decoded pixel heads to the same expression at no plan change.
    // Short payloads are cyclically extended inside AHash64 so every
    // band is live for any non-empty payload (no structurally-zero
    // band to all-pairs on — see the expression's scaladoc).
    // Map-only hash + one selective equi-join — never all-pairs; the
    // oracle (free to be quadratic at 500 docs) brute-forces all pairs
    // band-wise in pure integer SQL, which also re-proves the banding
    // lossless on this corpus. 25 pairs at sf0.01, one at distance 3 —
    // the beyond-equality verify branch is live.
    QueryDef(
      "q_mm_ahash",
      (s: SparkSession, dir: String) => {
        val h = payloads(s, dir)
          .filter(length(col("payload")) > 0) // empty → all-zero hash joins everything
          .select(col("doc_id"),
            graft.functions.AHash64.aHash64(col("payload")).as("h"))
        // Duplicate-hash collapse (r6, from the measured scale curve:
        // the r5 doc-level band join hit 57× wall at 10× data because
        // exact duplicates stack on the same band keys and the join
        // pays Σc² on every BAND, 4× over). Split the output by hash
        // equality instead:
        //  (a) identical-hash pairs from ONE full-64-bit equi-join —
        //      its candidate set IS its output (hamming 0), so this
        //      part is output-linear by construction;
        //  (b) band join over DISTINCT hash values only (corpus
        //      duplicate structure gone before banding), Hamming-
        //      verified, then expanded back to doc pairs — expansion
        //      rows = output rows. Same pair set, same pigeonhole
        //      losslessness (bands still 4×16 over the full hash).
        val same = h.as("a").join(h.as("b"),
            col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
            lit(0L).cast("int").as("hamming"))
        // Explicit-N repartition on the band key: the distinct's
        // exchange output is BYTES-tiny (50k hashes ≈ 400 KB) so AQE
        // coalesces it to ONE partition — and everything downstream of
        // that exchange, including the Σc²-row join emission, then runs
        // in one task (measured: the whole candidate stream on a single
        // core, 40 s at gen-sf1; thread-dump-confirmed). An explicit
        // partition count is the one repartition AQE does not coalesce;
        // keying it by (bi, bv) also co-locates the self-join.
        val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt
        val dh = h.select("h").distinct()
        val bands = dh.select(col("h"),
          posexplode(array((0 until 4).map(k =>
            shiftright(col("h"), 16 * k).bitwiseAND(lit(0xffffL))): _*))
            .as(Seq("bi", "bv")))
          .repartition(nPart, col("bi"), col("bv"))
        // Hamming filter BEFORE the dedup: the band join emits every
        // candidate (Σc² over band keys — ~1e8 at gen-sf1 on this
        // band-correlated text corpus), and a distinct-first plan
        // shuffles all of them; filtered-first, the XOR+popcount dies
        // inside the join's codegen and only true near-pairs (output-
        // scale) reach the distinct's exchange.
        val hashPairs = bands.as("a").join(bands.as("b"),
            col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
              col("a.h") < col("b.h"))
          .select(col("a.h").as("h1"), col("b.h").as("h2"),
            expr("bit_count(a.h ^ b.h)").cast("int").as("hamming"))
          .filter(col("hamming") <= 3)
          .distinct() // a hash pair may share several bands
        val cross = hashPairs
          .join(h.as("x"), col("x.h") === col("h1"))
          .join(h.as("y"), col("y.h") === col("h2"))
          .select(
            least(col("x.doc_id"), col("y.doc_id")).as("d1"),
            greatest(col("x.doc_id"), col("y.doc_id")).as("d2"),
            col("hamming"))
        same.unionByName(cross).orderBy("d1", "d2")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, encode(COALESCE(text, '')) AS p FROM documents
             |  WHERE octet_length(encode(COALESCE(text, ''))) > 0),
             |b AS (
             |  SELECT doc_id, LEAST(octet_length(p), 64) AS n,
             |    list_transform(range(1, LEAST(octet_length(p), 64) + 1),
             |      i -> ('0x' || substring(hex(p), CAST(2*i-1 AS INTEGER), 2))::INT) AS bs
             |  FROM d),
             |h AS (
             |  SELECT doc_id,
             |    COALESCE(list_sum(list_transform(range(1, 65), j ->
             |      CASE WHEN (j-1)//16 = 0 AND bs[CAST((j-1)%n AS INTEGER)+1]*n > list_sum(bs)
             |           THEN (1 << CAST((j-1)%16 AS INTEGER)) ELSE 0 END)), 0) AS b0,
             |    COALESCE(list_sum(list_transform(range(1, 65), j ->
             |      CASE WHEN (j-1)//16 = 1 AND bs[CAST((j-1)%n AS INTEGER)+1]*n > list_sum(bs)
             |           THEN (1 << CAST((j-1)%16 AS INTEGER)) ELSE 0 END)), 0) AS b1,
             |    COALESCE(list_sum(list_transform(range(1, 65), j ->
             |      CASE WHEN (j-1)//16 = 2 AND bs[CAST((j-1)%n AS INTEGER)+1]*n > list_sum(bs)
             |           THEN (1 << CAST((j-1)%16 AS INTEGER)) ELSE 0 END)), 0) AS b2,
             |    COALESCE(list_sum(list_transform(range(1, 65), j ->
             |      CASE WHEN (j-1)//16 = 3 AND bs[CAST((j-1)%n AS INTEGER)+1]*n > list_sum(bs)
             |           THEN (1 << CAST((j-1)%16 AS INTEGER)) ELSE 0 END)), 0) AS b3
             |  FROM b),
             |pairs AS (
             |  SELECT a.doc_id AS d1, b.doc_id AS d2,
             |    bit_count(xor(CAST(a.b0 AS BIGINT), CAST(b.b0 AS BIGINT))) +
             |    bit_count(xor(CAST(a.b1 AS BIGINT), CAST(b.b1 AS BIGINT))) +
             |    bit_count(xor(CAST(a.b2 AS BIGINT), CAST(b.b2 AS BIGINT))) +
             |    bit_count(xor(CAST(a.b3 AS BIGINT), CAST(b.b3 AS BIGINT))) AS hamming
             |  FROM h a JOIN h b ON a.doc_id < b.doc_id)
             |SELECT d1, d2, CAST(hamming AS INTEGER) AS hamming
             |FROM pairs WHERE hamming <= 3 ORDER BY d1, d2""".stripMargin)),

    // ------------------------------------------------------------------
    // q_mm_scene_cut ★ (new r5) — scene-change detection over the
    // frame-energy stream: a frame boundary is a CUT when the absolute
    // energy jump |e_f − e_{f−1}| exceeds 1.5× the payload's mean
    // absolute jump — the shot-boundary heuristic every video pipeline
    // runs on frame histograms/energies (the codec seam swaps decoded
    // frame signatures in without changing the query). Division-free
    // exact-integer predicate (d·2·n_d > 3·sum_d, the q_mm_silence
    // idiom); per-payload frame rows come from the codegen'd
    // `frameEnergies` array via posexplode_outer (empty payloads keep
    // their row: 0 frames, no cuts), the lag and the doc-total sums
    // are windows over the FRAME GRID of one doc (≤ len/32 rows) —
    // never corpus-wide — and one hash agg collapses back to one row
    // per doc. Output: cut count, segment count (cuts+1 on non-empty
    // frame grids), strongest jump, first cut frame (−1 if none).
    QueryDef(
      "q_mm_scene_cut",
      (s: SparkSession, dir: String) => sceneCutProfile(payloads(s, dir)),
      Some("""WITH p AS (SELECT doc_id, encode(COALESCE(text, '')) AS payload FROM documents),
             |h AS (
             |  SELECT doc_id, hex(payload) AS hx,
             |    CAST(octet_length(payload) AS BIGINT) AS n
             |  FROM p),
             |e AS (
             |  SELECT doc_id,
             |    list_transform(range((n + 31) // 32),
             |      f -> list_sum(list_transform(
             |        range(32*f + 1, LEAST(32*f + 32, n) + 1),
             |        i -> CAST(('0x' || substring(hx, CAST(2*i-1 AS INTEGER), 2))::INT AS BIGINT)))) AS es
             |  FROM h),
             |d AS (
             |  SELECT doc_id, es,
             |    list_transform(range(GREATEST(len(es) - 1, 0)),
             |      i -> abs(es[CAST(i+2 AS INTEGER)] - es[CAST(i+1 AS INTEGER)])) AS ds
             |  FROM e),
             |m AS (
             |  SELECT doc_id,
             |    CAST(len(es) AS BIGINT) AS n_frames,
             |    CAST(len(ds) AS BIGINT) AS n_d,
             |    CAST(COALESCE(list_sum(ds), 0) AS BIGINT) AS sum_d,
             |    CAST(COALESCE(list_max(ds), 0) AS BIGINT) AS max_jump,
             |    COALESCE(list_sum(list_transform(range(len(ds)),
             |      i -> CASE WHEN ds[CAST(i+1 AS INTEGER)] * 2 * len(ds)
             |                     > 3 * list_sum(ds) THEN 1 ELSE 0 END)), 0) AS n_cuts,
             |    list_min(list_transform(range(len(ds)),
             |      i -> CASE WHEN ds[CAST(i+1 AS INTEGER)] * 2 * len(ds)
             |                     > 3 * list_sum(ds)
             |                THEN CAST(i + 1 AS BIGINT) ELSE NULL END)) AS first_cut
             |  FROM d)
             |SELECT doc_id, n_frames, CAST(n_cuts AS BIGINT) AS n_cuts,
             |  CAST(CASE WHEN n_frames > 0 THEN n_cuts + 1 ELSE 0 END AS BIGINT)
             |    AS n_segments,
             |  max_jump, CAST(COALESCE(first_cut, -1) AS BIGINT) AS first_cut
             |FROM m ORDER BY doc_id""".stripMargin))
  )
}
