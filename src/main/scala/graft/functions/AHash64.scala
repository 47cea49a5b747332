package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 64-bit average hash (aHash) of a binary payload — the cheapest
  * perceptual fingerprint of image dedup pipelines: bit i is set iff
  * byte i of the payload head exceeds the head's mean byte value.
  * Payloads whose heads differ by a few bytes land within a small
  * Hamming distance, so the SimHash band-join machinery finds
  * near-duplicate media without decoding it (and the real decoder,
  * [[graft.multimodal.Multimodal.StubCodec]]'s seam, would feed decoded
  * pixels to the same expression).
  *
  * The mean compare is EXACT integer arithmetic — bit i = b(i mod n)·n
  * > Σb (never a double mean) — so any engine reproduces the hash
  * bit-for-bit from the bytes. Head = first n = min(64, length) bytes;
  * payloads shorter than 64 bytes are extended CYCLICALLY so all 64
  * bits are live for any non-empty payload — without this, every
  * payload under 49 bytes has a structurally zero top band and the
  * downstream band join degrades to all-pairs among short payloads
  * (review finding; real aHash has the same shape: a fixed 8×8
  * downsample means the bit count never depends on input size). Empty
  * payload → 0L (callers filter empties before pairing).
  *
  * Catalyst expression with codegen for the same reason as
  * [[SimHash64]]: the hash runs inside WholeStageCodegen as a map-only
  * projection — no row explosion, no UDF boundary.
  */
case class AHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ahash64 expects binary, got $t")
    }

  override protected def nullSafeEval(v: Any): Any =
    AHash64.hash(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AHash64.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): AHash64 =
    copy(child = newChild)
}

object AHash64 {

  /** Called from generated code — public, allocation-free. */
  def hash(bytes: Array[Byte]): Long = {
    val n = math.min(64, bytes.length)
    if (n == 0) return 0L
    var s = 0L
    var i = 0
    while (i < n) { s += (bytes(i) & 0xffL); i += 1 }
    var out = 0L
    i = 0
    while (i < 64) {
      if ((bytes(i % n) & 0xffL) * n > s) out |= (1L << i)
      i += 1
    }
    out
  }

  /** Column-level entry point: `aHash64($"payload")`. */
  def aHash64(c: Column): Column =
    GraftBridge.column(AHash64(GraftBridge.expression(c)))
}
