package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide

/** Exact integer division helpers for oracle-checked ratio metrics.
  *
  * Spark's `Column./` is TRUE (double) division; the repo previously
  * used the `(a - pmod(a, b)) / b` trick, which is exact only while
  * the numerator stays < 2^53 (doubles round above the mantissa and
  * the quotient can land off by one — silent oracle drift at corpus
  * scales the 100 TB design targets). These wrap Catalyst's
  * `IntegralDivide` (SQL `div`, codegen'd long division): exact over
  * the full long range, matching DuckDB `//` for the non-negative
  * operands every caller uses.
  */
object ExactMath {

  /** `a div b` — exact integer division (callers use non-negative
    * operands, where truncating and floor division coincide). */
  def floorDiv(a: Column, b: Column): Column =
    GraftBridge.column(IntegralDivide(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** ceil(a/b) for non-negative a, positive b. */
  def ceilDiv(a: Column, b: Column): Column =
    floorDiv(a + b - org.apache.spark.sql.functions.lit(1L), b)
}
