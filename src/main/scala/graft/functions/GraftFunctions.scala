package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL registration of the engine's custom codegen'd expressions, so a
  * pure-SQL user (`spark.sql(...)`) reaches the same primitives the
  * DataFrame API does — the library surface without any Scala imports:
  *
  * {{{
  * SELECT graft_cosine(a.embedding, b.embedding)      -- fused cosine
  * SELECT graft_simhash64(split(text, ' '))           -- 64-bit SimHash
  * SELECT graft_fnv64(token)                          -- FNV-1a-64 of a string
  * SELECT graft_ahash64(payload)                      -- 64-bit average hash
  * SELECT graft_java_hash(user_id)                    -- A15 bucket hash
  * SELECT graft_lsh_code(embedding, 8, 64)            -- sign-LSH code
  * SELECT graft_shingles(split(text, ' '), 3)         -- distinct 3-grams
  * SELECT graft_quant_i8(embedding)                   -- int8 quant stats
  * SELECT graft_frame_energy(payload, 32)             -- frame byte energy
  * SELECT graft_frame_energies(payload, 32)           -- per-frame energy array
  * SELECT graft_normalize_text(text)                  -- canonicalize (r12)
  * SELECT graft_bpe_apply(toks, 'a', 'b')             -- one BPE merge (r12)
  * SELECT graft_log2e20(n)                            -- exact fixed-point log2 (r13)
 * SELECT graft_unigram_viterbi(w, ps, ss)            -- unigram Viterbi seg (r14)
  * SELECT graft_wp_merge(toks, 'a', '##b', 'ab')      -- one WordPiece merge (r14)
  * SELECT graft_wp_match(w, pieces)                   -- WordPiece longest-match (r14)
  * SELECT graft_md5_u64(x)                            -- first 8 md5 bytes as long (r15)
  * SELECT graft_md5_ws_u64(arr)                       -- md5 u64 of space-joined array (r15)
  * SELECT graft_shingle_md5_u64(split(text,' '), 5)   -- per-window shingle md5 u64s (r15)
  * }}}
  *
  * Two registration paths sharing ONE builder list:
  *  - [[GraftFunctions.register]] on any live session (tests, REPL);
  *  - [[graft.GraftExtensions]] via
  *    `spark.sql.extensions=graft.GraftExtensions` at session build —
  *    the deployment path, which also survives `newSession()`.
  * Static arguments (plane counts, shingle width, frame size) must be
  * integer literals — they parameterize generated code, exactly like
  * the DataFrame API's Scala arguments.
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(v: UTF8String, StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  /** (name, expression builder) — the single source for both paths. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> (es => VectorOps.CosineSim(es(0), es(1))),
    "graft_simhash64" -> (es => SimHash64(es.head)),
    "graft_fnv64" -> (es => Fnv64(es.head)),
    "graft_ahash64" -> (es => AHash64(es.head)),
    "graft_java_hash" -> (es => JavaHash(es.head)),
    "graft_quant_i8" -> (es => VectorOps.QuantI8Stats(es.head)),
    "graft_vec_norm2" -> (es => VectorOps.VecNorm2(es.head)),
    "graft_shingles" -> (es =>
      Shingles(es.head, intLit(es(1), "shingle width"))),
    "graft_frame_energy" -> (es =>
      FrameEnergy.FrameEnergyExpr(es.head, intLit(es(1), "frame size"))),
    "graft_frame_energies" -> (es =>
      FrameEnergy.FrameEnergiesExpr(es.head, intLit(es(1), "frame size"))),
    "graft_lsh_code" -> (es =>
      VectorOps.LshCode(es.head,
        VectorOps.hashPlanes(intLit(es(1), "plane count"), intLit(es(2), "dim")))),
    "graft_normalize_text" -> (es => NormalizeText(es.head)),
    "graft_bpe_apply" -> (es =>
      BpeApply(es.head, strLit(es(1), "merge pair left"),
        strLit(es(2), "merge pair right"))),
    "graft_log2e20" -> (es => ExactMath.Log2E20Expr(es.head)),
    "graft_unigram_viterbi" -> (es => UnigramViterbi(es(0), es(1), es(2))),
    "graft_wp_merge" -> (es =>
      WordPieceOps.WordPieceMergeApply(es.head, strLit(es(1), "merge pair left"),
        strLit(es(2), "merge pair right"), strLit(es(3), "merged token"))),
    "graft_wp_match" -> (es => WordPieceOps.WordPieceMatch(es(0), es(1))),
    "graft_md5_u64" -> (es => Md5Ops.Md5U64(es.head)),
    "graft_md5_ws_u64" -> (es => Md5Ops.Md5WsU64(es.head)),
    "graft_shingle_md5_u64" -> (es =>
      Md5Ops.ShingleMd5U64(es.head, intLit(es(1), "shingle width"))))

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftFunctions.type].getName, name)

  /** Register every function on a live session's catalog. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name), es => b(es))
    }

  /** Injection list for [[graft.GraftExtensions]]. */
  def inject(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), es => b(es)))
    }
}
