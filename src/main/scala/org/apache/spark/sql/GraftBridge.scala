package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column/Expression conversion for graft's
  * native Catalyst expressions (Spark 4 detached Column from
  * Expression; extensions convert through ExpressionUtils). */
object GraftBridge {
  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
