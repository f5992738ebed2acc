package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Access bridge for `private[sql]` seams Spark 4 closed off:
  * the Column⇄Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils) and Dataset.ofRows
  * (needed to hand a custom LogicalPlan back to the public DataFrame
  * API). Lives in the sql package solely to re-export these calls for
  * graft.plans' custom expressions and operators.
  */
object GraftColumnBridge {
  def column(e: Expression): Column     = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
