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

/** Same pattern for LogicalPlan↔DataFrame: custom logical operators (e.g.
  * [[graft.plans.AsOfJoinNode]]) need the analyzed child plans and a way to
  * wrap a hand-built plan back into a DataFrame — both `private[sql]` in
  * Spark 4's classic Dataset.
  */
object GraftPlanBridge {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
