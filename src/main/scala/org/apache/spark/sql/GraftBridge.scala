package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for custom Catalyst expressions. Spark 4 moved
  * these conversions behind `private[sql]` (org.apache.spark.sql.classic.
  * ExpressionUtils, columnNodeSupport.scala in the Spark source); extension
  * libraries reach them by living in the sql package namespace — the same
  * technique Spark's own connectors use.
  */
object GraftBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
