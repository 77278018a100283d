package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's private[sql] Column ⇄ Expression converters.
  * Placed in the spark.sql package on purpose — the standard pattern for
  * Catalyst-extension libraries (Column no longer exposes `.expr` publicly
  * since the Spark Connect refactor).
  */
object GraftInternal {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
