package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into Spark's `private[sql]` surface: build a DataFrame
  * from a custom LogicalPlan and unwrap Column → Expression (the
  * injection points every Spark-native library needs for custom
  * operators; the analyzer/optimizer/planner pipeline treats the node
  * like any built-in one). */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def expr(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  def col(e: Expression): Column =
    classic.ExpressionUtils.column(e)
}
