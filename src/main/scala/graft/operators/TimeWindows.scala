package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time window operators.
  *
  * Mirrors the reference engine's window surface — `tumble(width)`,
  * `hop(slide, width)`, `session(gap)` used as GROUP BY expressions
  * (reference: crates/arroyo-planner/src/lib.rs:216-241,633-675; runtime
  * operators in crates/arroyo-worker/src/arrow/{tumbling,sliding,session}_
  * aggregating_window.rs) — expressed with Spark's native `window()` /
  * `session_window()` functions so Catalyst's TimeWindowing rule plans them
  * and (in streaming) the state store + watermark machinery handles
  * emit-on-close and late-data drop.
  *
  * All helpers work identically on batch and streaming DataFrames: in batch
  * they compute the same assignment (used by the DuckDB-oracle correctness
  * gate); in streaming, pair with [[graft.streaming.Watermarks]].
  */
object TimeWindows {

  /** Tumbling window assignment column: non-overlapping bins of `width`.
    * Reference: hop(w, w) collapses to tumble (lib.rs:648-652) — same here,
    * `tumble(ts, w) == hop(ts, w, w)`.
    */
  def tumble(ts: Column, width: String): Column = window(ts, width)

  /** Hopping (sliding) window: emits one row per covering window; Spark
    * replicates rows per window at assignment time (semantically identical
    * to the reference's tier-merge, sliding_aggregating_window.rs:44-260).
    * The reference requires width to be a multiple of slide
    * (lib.rs:640-655); Spark's window() enforces the same.
    */
  def hop(ts: Column, width: String, slide: String): Column =
    window(ts, width, slide)

  /** Session window with a fixed inactivity gap. Window start = first event,
    * end = last event + gap (matches the reference's gap-merge semantics,
    * session_aggregating_window.rs:386-520).
    */
  def session(ts: Column, gap: String): Column = session_window(ts, gap)

  /** Tumbling aggregate: `groupBy(window(ts, width), keys).agg(...)` with
    * window start/end flattened to top-level columns. Catalyst plans this as
    * partial→shuffle→final hash aggregation — the same partial/final split
    * the reference hand-builds (builder.rs:135-199) — so per-key state never
    * needs the full input co-located before partials run.
    */
  def tumbleAgg(df: DataFrame, tsCol: String, width: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    flatten(df.groupBy(tumble(col(tsCol), width) +: keys: _*).agg(aggs.head, aggs.tail: _*))

  def hopAgg(df: DataFrame, tsCol: String, width: String, slide: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    flatten(df.groupBy(hop(col(tsCol), width, slide) +: keys: _*).agg(aggs.head, aggs.tail: _*))

  def sessionAgg(df: DataFrame, tsCol: String, gap: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    flatten(df.groupBy(session(col(tsCol), gap) +: keys: _*).agg(aggs.head, aggs.tail: _*))

  /** Replace the `window`/`session_window` struct column with
    * `window_start`/`window_end` top-level columns (the reference exposes
    * `.start`/`.end` on its window struct; flat columns hash-compare cleanly
    * against SQL oracles).
    */
  def flatten(df: DataFrame): DataFrame = {
    val wcol = df.columns.find(c => c == "window" || c == "session_window")
      .getOrElse(throw new IllegalArgumentException("no window column to flatten"))
    df.withColumn("window_start", col(s"`$wcol`.start"))
      .withColumn("window_end", col(s"`$wcol`.end"))
      .drop(wcol)
  }
}
