package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Accessor for the `private[sql]` Dataset factory — needed to re-plan a
  * sub-tree of an analyzed query as its own DataFrame (the SQL-path
  * updating-aggregate rewrite). Same pattern connector libraries (avro,
  * delta) use for internals access.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a Catalyst expression (resolved or not) as a user-facing Column —
    * the updating-aggregate rewrite rebuilds post-aggregation expressions
    * over its emitted `__k_*`/`__a_*` columns this way.
    */
  def colOf(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
