package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the private[sql] Column ⇄ catalyst-Expression conversion —
  * the supported way to expose a custom Catalyst Expression as a user
  * `Column` in Spark 4's split Column-node API. */
object GraftExpr {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
