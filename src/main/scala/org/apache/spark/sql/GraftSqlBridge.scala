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
}
