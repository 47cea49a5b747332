package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ Expression converters.
  *
  * Spark 4 wraps Column around ColumnNode (connect/classic unification);
  * the classic converters live behind `private[sql]`, so custom Catalyst
  * expressions (graft.functions.*) go through this shim to become
  * user-facing `Column`s.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
