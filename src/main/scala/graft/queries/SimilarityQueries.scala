package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorOps._

/** Batch 7 ★ — similarity search over the `embeddings` table
  * (64-dim `array<float>`): brute-force cosine top-k as the exactness
  * baseline, sign-LSH bucketed ANN as the scale path, and LSH-bucketed
  * embedding near-dup pairs. North-star scope (the reference has no
  * vector surface).
  *
  * Scale design:
  *  - brute force: the tiny query set is broadcast (BroadcastNestedLoop
  *    over a 5-row build side); the corpus streams through ONE narrow
  *    pass — per-executor work is |corpus|/n_tasks × k, no shuffle of
  *    the corpus. This is the correct exhaustive plan at any scale; its
  *    cost is linear in corpus size, which is exactly what ANN avoids;
  *  - ANN: a 6-bit sign-LSH code per vector (codegen'd fold, map-only),
  *    queries probe their own bucket plus all Hamming-1 neighbors
  *    (multi-probe); the candidate join is an equi-join on the bucket
  *    code → shuffle on an int key, never a cross join. Corpus codes
  *    would be precomputed/bucketed at rest in a real deployment;
  *  - near-dup: OR-amplified LSH (6 independent 4-plane tables) for
  *    candidate pairs, exact cosine verify on candidates only.
  *
  * No DuckDB oracles (float fold-order differs across engines —
  * SURVEY.md §2 "float hash risk"); exactness/recall/precision are
  * asserted against a plain-Scala reference in SimilaritySpec. Cosines
  * are exported in e6 integer units.
  */
object SimilarityQueries {

  private val Dim = 64

  private def corpus(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  /** The fixed benchmark query set: vec_id < 5 (present at every SF). */
  private def queriesDf(s: SparkSession, dir: String): DataFrame =
    corpus(s, dir).filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  val entries: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q_sim_topk ★ — exact brute-force cosine top-10 per query.
    QueryDef(
      "q_sim_topk",
      (s: SparkSession, dir: String) => {
        val q = broadcast(queriesDf(s, dir))
        val scored = corpus(s, dir).join(q, col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            cosine(col("q_emb"), col("embedding")).as("cos"))
        val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .select(col("q_id"), col("rank"), col("vec_id"),
            round(col("cos") * 1000000).cast("long").as("cos_e6"))
          .orderBy("q_id", "rank")
      },
      None),

    // ------------------------------------------------------------------
    // q_sim_ann ★ — sign-LSH bucketed ANN: 6 hyperplanes → 64 buckets,
    // queries multi-probe all buckets within Hamming ≤ 2 of their own
    // (1+6+15 = 22 probes), exact cosine re-rank of candidates, top-10.
    // Scans ~35% of a uniform corpus instead of 100%; on a corpus with
    // genuine near neighbors (cos ≥ 0.7, per-bit agreement ≥ 0.75) the
    // true neighbors concentrate in the probed buckets and recall
    // approaches 1. On this near-random testdata (top-10 cos ≈ 0.3):
    // recall 0.60, returned-quality 0.90 of exact — asserted in
    // SimilaritySpec.
    QueryDef(
      "q_sim_ann",
      (s: SparkSession, dir: String) => {
        val planes = hyperplanes(6, Dim, seed = 42L)
        val coded = corpus(s, dir)
          .select(col("vec_id"), col("embedding"),
            lshCode(col("embedding"), planes).as("code"))
        val flips = (0L +: (0 until 6).map(b => 1L << b)) ++
          (for (i <- 0 until 6; j <- i + 1 until 6) yield (1L << i) | (1L << j))
        val probes = array(flips.map(lit): _*)
        val qProbed = broadcast(queriesDf(s, dir)
          .select(col("q_id"), col("q_emb"),
            lshCode(col("q_emb"), planes).as("q_code"))
          .select(col("q_id"), col("q_emb"),
            explode(probes).as("flip"))
          .select(col("q_id"), col("q_emb"),
            col("flip").bitwiseXOR(
              lshCode(col("q_emb"), planes)).as("probe_code")))
        val cand = coded.join(qProbed,
          col("code") === col("probe_code") && col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            cosine(col("q_emb"), col("embedding")).as("cos"))
          .distinct()
        val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
        cand.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .select(col("q_id"), col("rank"), col("vec_id"),
            round(col("cos") * 1000000).cast("long").as("cos_e6"))
          .orderBy("q_id", "rank")
      },
      None),

    // ------------------------------------------------------------------
    // q_embed_dedup ★ — embedding near-dup pairs (cos ≥ 0.5) via
    // OR-amplified LSH: 6 independent 4-plane tables; a pair is a
    // candidate iff it collides in ANY table; exact cosine verify on
    // candidates only. Candidate join is an equi-join on
    // (table, code) — no cross join anywhere.
    QueryDef(
      "q_embed_dedup",
      (s: SparkSession, dir: String) => {
        val codeCols = (0 until 6).map(t =>
          struct(lit(t).as("tbl"),
            lshCode(col("embedding"), hyperplanes(4, Dim, seed = 1000L + t)).as("code")))
        val coded = corpus(s, dir)
          .select(col("vec_id"), col("embedding"),
            explode(array(codeCols: _*)).as("tc"))
          .select(col("vec_id"), col("embedding"),
            col("tc.tbl").as("tbl"), col("tc.code").as("code"))
        val cand = coded.as("a")
          .join(coded.as("b"),
            col("a.tbl") === col("b.tbl") && col("a.code") === col("b.code") &&
              col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
            cosine(col("a.embedding"), col("b.embedding")).as("cos"))
          .distinct()
        cand.filter(col("cos") >= 0.5)
          .select(col("v1"), col("v2"),
            round(col("cos") * 1000000).cast("long").as("cos_e6"))
          .orderBy("v1", "v2")
      },
      None)
  )
}
