package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Narrow access shim into `private[sql]` surface: creating a DataFrame from
  * a Catalyst LogicalPlan. This is the standard extension point used by
  * Spark-native libraries for plan-level rewrites (the public API offers no
  * equivalent), needed by graft's plan enforcer (SURVEY §3.2 step 6: plan
  * reconstruction instead of hint text).
  */
object GraftShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Wrap a raw Catalyst Expression as a user-facing Column (needed to
    * expose custom native expressions through the DataFrame API). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** The Catalyst expression behind a Column. */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
