package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 hides the Column↔Expression constructors behind
  * `private[sql] classic.ExpressionUtils`; this in-package bridge exposes
  * exactly the two conversions our custom Catalyst expressions need (the
  * standard extension-library pattern for Spark 4's split Column API).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
