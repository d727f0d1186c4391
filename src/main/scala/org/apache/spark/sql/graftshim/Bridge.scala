package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column ⇄ catalyst-Expression
  * converters (Spark 4 moved them behind the Spark Connect API split).
  * Lives under `org.apache.spark.sql` purely for access; no Spark
  * internals are modified. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Re-bind a DataFrame's logical plan to another session of the same
    * SparkContext — analysis, optimization, and execution then read
    * THAT session's SQLConf (the serving-isolation seam: a serve-loop
    * session cloned via `newSession()` shares the context, catalog
    * data, and cache, but maintenance conf scopes on the original
    * session can no longer touch its plans). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
