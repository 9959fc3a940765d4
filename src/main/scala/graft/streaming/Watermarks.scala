package graft.streaming

import org.apache.spark.sql.DataFrame

/** Event-time watermark helpers.
  *
  * The reference attaches a watermark *expression* to every source (default
  * `_timestamp - 1s`, crates/arroyo-planner/src/rewriters.rs:48-85) and
  * propagates min-of-inputs across the dataflow
  * (crates/arroyo-operator/src/context.rs:36-90). Structured Streaming has
  * the same model: `withWatermark(col, delay)` per input, min across inputs
  * (`spark.sql.streaming.multipleWatermarkPolicy=min`, the default).
  *
  * Divergences kept deliberately (documented, not hidden):
  *   - arbitrary watermark expressions → project a derived event-time column
  *     first, then watermark on it ([[withEventTime]]);
  *   - idle-source timeout (reference default 5 min) has no Spark
  *     equivalent; `multipleWatermarkPolicy=max` is the closest knob.
  */
object Watermarks {
  val DefaultDelay = "1 second" // reference default watermark: ts - 1s

  def withEventTime(df: DataFrame, tsCol: String, delay: String = DefaultDelay): DataFrame =
    df.withWatermark(tsCol, delay)

  /** Watermark from an arbitrary expression: materialize the expression as
    * the event-time column, then delay-watermark it.
    */
  def withEventTimeExpr(df: DataFrame, expr: String, as: String, delay: String): DataFrame =
    df.withColumn(as, org.apache.spark.sql.functions.expr(expr)).withWatermark(as, delay)
}
