package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Updating (retraction) aggregate over an unbounded, non-windowed stream —
  * the reference's UpdatingAggregate operator
  * (crates/arroyo-worker/src/arrow/incremental_aggregator.rs): per-key
  * accumulators updated incrementally; each flush emits a retraction of the
  * previously-published row plus the new row, tagged with `_updating_meta
  * {is_retract, id}` (crates/arroyo-rpc/src/lib.rs:331-357), so downstream
  * consumers (Debezium sinks, updating joins) can maintain consistent state.
  *
  * Spark's update output mode re-emits new values but never retracts old
  * ones, so retraction synthesis needs explicit per-key state:
  * `flatMapGroupsWithState` keeps the last published aggregate per key and,
  * on every micro-batch that changes it, emits (retract(old), append(new)).
  * State is bounded by key cardinality and optionally expired with a TTL —
  * the reference's `updating_ttl` (default 24 h, SET updating_ttl).
  *
  * Supported accumulators: count / sum / min / max / avg over one numeric
  * column (the common Debezium-sink shapes). The accumulator state is a
  * fixed-width tuple, so shuffle + state-store footprint per key is
  * constant — at 100 TB the state scales with distinct keys only.
  */
object UpdatingAggregate {

  /** One output row of the updating stream. Field names avoid `min`/`max`/
    * `sum` — those collide with methods Spark's encoder codegen references
    * unqualified in generated Java.
    */
  case class Updating(
      key: String,
      n: Long,
      total: Double,
      lo: Double,
      hi: Double,
      mean: Double,
      is_retract: Boolean)

  /** Per-key accumulator state (public: Spark's encoder codegen emits Java
    * that invokes the accessors, which fails on a private class).
    */
  case class Acc(n: Long, total: Double, lo: Double, hi: Double)

  /** Incremental per-key aggregate with retractions.
    *
    * @param df       streaming DataFrame
    * @param keyCol   grouping column (stringly keyed; composite keys can be
    *                 concat_ws'd by the caller)
    * @param valueCol numeric column to aggregate
    * @param ttl      state TTL à la `SET updating_ttl` (None = keep forever)
    * @return stream of [[Updating]] rows; each change emits retract+append
    */
  def updatingAgg(df: DataFrame, keyCol: String, valueCol: String,
      ttl: Option[java.time.Duration] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val pairs = df.select(col(keyCol).cast("string").as("k"), col(valueCol).cast("double").as("v"))
      .as[(String, Double)]

    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout

    pairs.groupByKey(_._1)
      .flatMapGroupsWithState[Acc, Updating](OutputMode.Update(), timeout) {
        (key: String, rows: Iterator[(String, Double)], state: GroupState[Acc]) =>
          if (state.hasTimedOut) {
            // TTL expiry: retract the published value and drop state
            val old = state.get
            state.remove()
            Iterator(Updating(key, old.n, old.total, old.lo, old.hi, old.total / old.n, is_retract = true))
          } else {
            val vs = rows.map(_._2).toArray
            if (vs.isEmpty) Iterator.empty
            else {
              val prev = state.getOption
              val acc0 = prev.getOrElse(Acc(0L, 0.0, Double.PositiveInfinity, Double.NegativeInfinity))
              val acc = Acc(acc0.n + vs.length, acc0.total + vs.sum,
                math.min(acc0.lo, vs.min), math.max(acc0.hi, vs.max))
              state.update(acc)
              ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
              val retract = prev.map(p =>
                Updating(key, p.n, p.total, p.lo, p.hi, p.total / p.n, is_retract = true))
              val append =
                Updating(key, acc.n, acc.total, acc.lo, acc.hi, acc.total / acc.n, is_retract = false)
              (retract.iterator ++ Iterator(append))
            }
          }
      }(Encoders.product[Acc], Encoders.product[Updating])
      .toDF()
      .select(col("key"), col("n"), col("total").as("sum"), col("lo").as("min"),
        col("hi").as("max"), col("mean").as("avg"),
        struct(col("is_retract"),
          md5(col("key")).as("id")).as("_updating_meta"))
  }
}
