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

  /** True when the session's SQL cache holds no entries — the observable
    * for persist-lifecycle regression tests (operators must release their
    * cached intermediates; round-3 verdict item #1).
    */
  def sqlCacheIsEmpty(spark: SparkSession): Boolean =
    spark.sharedState.cacheManager.isEmpty
}
