package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim: Spark 4 removed the public Column(Expression)
  * constructor; the conversion lives in `classic.ExpressionUtils`,
  * which is `private[sql]`. This object re-exports the two conversions
  * the engine's custom expressions need (the standard extension-point
  * pattern for libraries shipping Catalyst expressions).
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
