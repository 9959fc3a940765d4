package graft.streaming

import graft.streaming.UpdatingAggregate.{Acc, Updating}
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** transformWithState variant of [[UpdatingAggregate]] — the reference's
  * UpdatingAggregate operator (incremental_aggregator.rs) expressed on
  * Spark's arbitrary-state v2 API (Spark 4 `StatefulProcessor`).
  *
  * Differences from the flatMapGroupsWithState path:
  *   - TTL is enforced by the state store itself (`TTLConfig`), matching
  *     the reference's state-table TTL (`updating_ttl`, planner lib.rs:
  *     104-110) more directly than timer-based expiry: an expired key
  *     simply restarts from zero on its next event. (The fMGWS variant
  *     instead emits a final retraction on expiry — strictly stronger;
  *     the reference does not retract on TTL either, incremental_
  *     aggregator.rs flush path.)
  *   - Requires the RocksDB state-store provider — the right choice at
  *     100 TB state anyway (bounded memory, incremental checkpoints).
  */
object UpdatingAggregateTws {

  /** Encoders derived ONCE per JVM. `Encoders.product` goes through Scala
    * 2.13 runtime reflection, which serializes on a global lock —
    * deriving it inside `Processor.init` (per state partition, per batch,
    * on executor task threads) livelocks under 32 concurrent partitions.
    * Object-val initialization is lazy and synchronized exactly once.
    */
  private[streaming] val accEncoder = Encoders.product[Acc]
  private[streaming] val updatingEncoder = Encoders.product[Updating]

  class Processor(ttl: Option[java.time.Duration])
      extends StatefulProcessor[String, (String, Double), Updating] {
    @transient private var acc: ValueState[Acc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val cfg = ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
      acc = getHandle.getValueState[Acc]("acc", accEncoder, cfg)
    }

    override def handleInputRows(key: String, rows: Iterator[(String, Double)],
        timerValues: TimerValues): Iterator[Updating] = {
      val vs = rows.map(_._2).toArray
      if (vs.isEmpty) Iterator.empty
      else {
        val prev = if (acc.exists()) Some(acc.get()) else None
        val a0 = prev.getOrElse(Acc(0L, 0.0, Double.PositiveInfinity, Double.NegativeInfinity))
        val a = Acc(a0.n + vs.length, a0.total + vs.sum,
          math.min(a0.lo, vs.min), math.max(a0.hi, vs.max))
        acc.update(a)
        val retract = prev.map(p =>
          Updating(key, p.n, p.total, p.lo, p.hi, p.total / p.n, is_retract = true))
        retract.iterator ++ Iterator(
          Updating(key, a.n, a.total, a.lo, a.hi, a.total / a.n, is_retract = false))
      }
    }
  }

  /** Same contract as [[UpdatingAggregate.updatingAgg]]; runs on the
    * arbitrary-state v2 operator.
    */
  def updatingAgg(df: DataFrame, keyCol: String, valueCol: String,
      ttl: Option[java.time.Duration] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("k"), col(valueCol).cast("double").as("v"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .transformWithState(new Processor(ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update(), updatingEncoder)
      .toDF()
      .select(col("key"), col("n"), col("total").as("sum"), col("lo").as("min"),
        col("hi").as("max"), col("mean").as("avg"),
        struct(col("is_retract"),
          md5(col("key")).as("id")).as("_updating_meta"))
  }
}
