package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge. Spark 4 moved these conversions behind
  * `private[sql] classic.ExpressionUtils`; custom Catalyst expressions (our
  * codegen'd vector ops) still need them, so this one-file shim lives in the
  * `org.apache.spark.sql` package — the same approach widely-used Spark
  * extension libraries take.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Column → a REAL (unresolved) Catalyst expression tree, not the opaque
    * `ColumnNodeExpression` wrapper [[expression]] yields. The wrapper is
    * fine inside DataFrame plans (the analyzer unwraps it at the plan
    * boundary) but cannot be spliced into a SQL plan by a function-registry
    * builder — the analyzer never looks inside it and codegen then refuses
    * it. This converter produces ordinary UnresolvedFunction/Literal nodes
    * the SQL analyzer resolves in place.
    */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** True when the session's SQL cache holds no entries — the observable
    * for persist-lifecycle regression tests (operators must release their
    * cached intermediates; round-3 verdict item #1).
    */
  def sqlCacheIsEmpty(spark: SparkSession): Boolean =
    spark.sharedState.cacheManager.isEmpty
}
