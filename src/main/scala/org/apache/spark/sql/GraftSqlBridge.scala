package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql package for the Column ↔ Expression conversion
  * (Spark 4 removed public Column.expr; the classic ExpressionUtils is
  * private[sql]). Needed by graft's custom Catalyst expressions.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
