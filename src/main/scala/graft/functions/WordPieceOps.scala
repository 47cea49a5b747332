package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The two codegen'd kernels of the WordPiece tokenizer family
  * (Schuster & Nakajima 2012; the BERT tokenizer) — the third
  * tokenizer family next to BPE ([[BpeApply]]) and unigram-LM
  * ([[UnigramViterbi]]).
  *
  * WordPiece differs from BPE in BOTH halves:
  *  - training merges the pair maximizing LIKELIHOOD GAIN
  *    count(t1 t2) / (count(t1) · count(t2)), not raw pair count, and
  *    tokens carry the `##` continuation prefix (merging `a` + `##b`
  *    yields `ab`, `##a` + `##b` yields `##ab`) — so the merge-apply
  *    needs the merged token as an explicit constant
  *    ([[WordPieceMergeApply]]; [[BpeApply]] hardcodes t1 ++ t2);
  *  - encoding is greedy LONGEST-MATCH-FIRST against the shipped
  *    vocabulary ([[WordPieceMatch]]), not a replay of the merges —
  *    the segmentation BERT's runtime actually produces, which can
  *    legitimately differ from the training segmentation of the same
  *    word.
  */
object WordPieceOps {

  /** The whole-word out-of-vocabulary token (BERT's `[UNK]`). Square
    * brackets never appear in whitespace-tokenized corpus words, so
    * the sentinel cannot collide with a real piece. */
  val Unk = "[UNK]"

  /** One WordPiece merge applied to a token sequence: every
    * left-to-right non-overlapping adjacent `(t1, t2)` becomes the
    * single token `merged` (= t1 ++ t2 with t2's `##` prefix
    * dropped — the caller computes it once per round). Greedy
    * non-overlap and the produced-token-never-re-merges invariant are
    * exactly [[BpeApply]]'s: `merged` ≠ `t1` (t2 minus `##` is
    * non-empty), so the scan resuming after a consumed pair can never
    * re-match the token it just emitted.
    */
  case class WordPieceMergeApply(child: Expression, t1: String, t2: String,
      merged: String) extends UnaryExpression {

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"wp_merge expects array<string>, got $t")
      }

    override protected def nullSafeEval(v: Any): Any =
      WordPieceOps.mergeApply(v.asInstanceOf[ArrayData],
        UTF8String.fromString(t1), UTF8String.fromString(t2),
        UTF8String.fromString(merged))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val u1 = ctx.addReferenceObj("wpT1", UTF8String.fromString(t1))
      val u2 = ctx.addReferenceObj("wpT2", UTF8String.fromString(t2))
      val um = ctx.addReferenceObj("wpMerged", UTF8String.fromString(merged))
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.WordPieceOps.mergeApply($c, $u1, $u2, $um);")
    }

    override protected def withNewChildInternal(newChild: Expression)
        : WordPieceMergeApply = copy(child = newChild)
  }

  /** Called from generated code. Same null-element contract as
    * [[BpeApply.make]]: split() output only, throw loudly. */
  def mergeApply(arr: ArrayData, t1: UTF8String, t2: UTF8String,
      merged: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"wp_merge: null token at index $i — input must be array<string> " +
            "with no null elements (split() output)")
      if (i + 1 < n && !arr.isNullAt(i + 1) &&
          arr.getUTF8String(i) == t1 && arr.getUTF8String(i + 1) == t2) {
        out.add(merged)
        i += 2
      } else {
        out.add(arr.getUTF8String(i))
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Greedy longest-match-first WordPiece encode of one word (BERT's
    * `WordpieceTokenizer`): starting at position 0, take the LONGEST
    * vocabulary piece matching at the cursor — a bare piece at
    * position 0, a `##`-prefixed piece after it — emit it, advance;
    * if NO piece matches at some position the WHOLE word becomes the
    * single `[UNK]` token (BERT's whole-word failure rule, not a
    * partial fallback).
    *
    * `pieces` is this word's candidate set — the vocabulary entries
    * that occur in the word, pre-filtered by a vocab-sized equi-join
    * (the [[UnigramViterbi]] aligned-array pattern) — so the kernel is
    * self-contained per row. Word lengths are whitespace-token sized;
    * the O(|w|²) probe loop is branch-predictable and allocation-free
    * until the output build.
    */
  case class WordPieceMatch(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = left.nullable || right.nullable

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (StringType, ArrayType(StringType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"wp_match expects (string, array<string>), got $t")
      }

    override protected def nullSafeEval(w: Any, ps: Any): Any =
      WordPieceOps.matchWord(w.asInstanceOf[UTF8String],
        ps.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (w, ps) =>
        s"${ev.value} = graft.functions.WordPieceOps.matchWord($w, $ps);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression)
        : WordPieceMatch = copy(left = l, right = r)
  }

  private val UnkArray: ArrayData =
    new GenericArrayData(Array[Any](UTF8String.fromString(Unk)))

  /** Called from generated code. */
  def matchWord(word: UTF8String, pieces: ArrayData): ArrayData = {
    val w = word.toString
    val np = pieces.numElements()
    val set = new java.util.HashSet[String](np * 2)
    var i = 0
    while (i < np) {
      if (pieces.isNullAt(i))
        throw new IllegalArgumentException(
          "wp_match: null piece — candidate array must be null-free")
      set.add(pieces.getUTF8String(i).toString)
      i += 1
    }
    val n = w.length
    // empty word = complete 0-piece segmentation (parity with the
    // DuckDB wpwalk oracle and the TextSpec replica, which both treat
    // '' as already fully segmented — NOT as an unknown token)
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](4)
    var pos = 0
    while (pos < n) {
      var k = n - pos
      var hit: String = null
      while (k >= 1 && hit == null) {
        val cand =
          if (pos == 0) w.substring(0, k) else "##" + w.substring(pos, pos + k)
        if (set.contains(cand)) hit = cand else k -= 1
      }
      if (hit == null) return UnkArray
      out.add(UTF8String.fromString(hit))
      pos += k
    }
    new GenericArrayData(out.toArray)
  }

  /** Column-level entry points. */
  def wpMerge(c: Column, t1: String, t2: String, merged: String): Column =
    GraftBridge.column(WordPieceMergeApply(GraftBridge.expression(c), t1, t2, merged))

  def wpMatch(w: Column, pieces: Column): Column =
    GraftBridge.column(WordPieceMatch(
      GraftBridge.expression(w), GraftBridge.expression(pieces)))
}
