package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access bridge for the Column⇄Expression converters, which Spark 4
  * scoped `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils).
  * Lives in the sql package solely to re-export those two calls for
  * graft.plans' custom expressions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column     = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
