package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's package-private Column ↔ Expression converters —
  * the standard pattern for libraries shipping custom Catalyst
  * expressions with a public Column API (ExpressionUtils is
  * private[sql] in Spark 4).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
