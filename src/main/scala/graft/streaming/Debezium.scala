package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType, StringType, TimestampType}

/** Debezium CDC envelope encode/decode — the reference's
  * `Debezium<T> {before, after, op}` (crates/arroyo-types/src/lib.rs:233-276)
  * and its DebeziumUnrollingExec / ToDebeziumExec physical nodes
  * (crates/arroyo-planner/src/physical.rs:721,968) — expressed as plain
  * column expressions over `from_json`/`to_json`.
  */
object Debezium {

  /** Envelope schema for a given payload schema. */
  def envelopeSchema(payload: StructType): StructType = StructType(Seq(
    StructField("before", payload, nullable = true),
    StructField("after", payload, nullable = true),
    StructField("op", StringType, nullable = true)))

  /** Debezium temporal wire format: TIMESTAMP payload fields arrive as
    * integer NANOSECONDS since epoch (the reference's json deserializer
    * reads integers into its ns-precision internal timestamp; see the
    * aggregate_updates.json fixture) — parse them as LONG and rebuild the
    * µs timestamp after extraction.
    */
  private def parseSchema(payload: StructType): StructType =
    StructType(payload.fields.map {
      case StructField(n, TimestampType, nullable, m) => StructField(n, LongType, nullable, m)
      case f => f
    })

  private def restoreTimestamps(df: DataFrame, payload: StructType): DataFrame =
    payload.fields.filter(_.dataType == TimestampType).foldLeft(df) { (d, f) =>
      d.withColumn(f.name, timestamp_micros(expr(s"`${f.name}` div 1000")))
    }

  /** Decode a JSON debezium stream into flat rows: `c`/`u`/`r` emit the
    * `after` image as an append, `u`/`d` emit the `before` image as a
    * retract — the reference maps op `r` (snapshot read) to create
    * (lib.rs:300-307). Output = payload columns + `_is_retract`.
    */
  def unroll(df: DataFrame, jsonCol: String, payload: StructType): DataFrame = {
    val env = from_json(col(jsonCol), envelopeSchema(parseSchema(payload))).as("env")
    val withEnv = df.select(env)
    val appends = withEnv
      .filter(col("env.op").isin("c", "u", "r") && col("env.after").isNotNull)
      .select(col("env.after.*")).withColumn("_is_retract", lit(false))
    val retracts = withEnv
      .filter(col("env.op").isin("u", "d") && col("env.before").isNotNull)
      .select(col("env.before.*")).withColumn("_is_retract", lit(true))
    restoreTimestamps(appends.unionByName(retracts), payload)
  }

  /** Batch view of a bounded debezium stream: the CURRENT state after
    * applying every c/u/d in file order, keyed by the declared PRIMARY KEY
    * columns (whole row when none). The reference consumes the stream as
    * retractions through its updating operators; a bounded batch read of
    * the same file converges to exactly this final state. File order is
    * recovered per input split via `monotonically_increasing_id` (ordered
    * within and across splits of a single file).
    *
    * Scale note: one shuffle on the PK — the same key-partitioning any
    * downstream per-key state would need; last-writer-wins via max-seq.
    */
  def mergedState(df: DataFrame, jsonCol: String, payload: StructType,
      pkCols: Seq[String]): DataFrame = {
    val env = from_json(col(jsonCol), envelopeSchema(parseSchema(payload))).as("env")
    val withEnv = df.select(env).withColumn("_seq", monotonically_increasing_id())
    val keys = if (pkCols.nonEmpty) pkCols else payload.fieldNames.toSeq
    // each record becomes up to two key events: before → tombstone for its
    // old key (covers pk-changing updates), after → upsert for its new key
    val dels = withEnv
      .filter(col("env.op").isin("u", "d") && col("env.before").isNotNull)
      .select(col("env.before.*"), col("_seq"), lit(true).as("_tomb"))
    val ups = withEnv
      .filter(col("env.op").isin("c", "u", "r") && col("env.after").isNotNull)
      .select(col("env.after.*"), col("_seq"), lit(false).as("_tomb"))
    // an update's delete applies before its insert: order (seq, tomb desc)
    val w = Window.partitionBy(keys.map(k => col(s"`$k`")): _*)
      .orderBy(col("_seq").desc, col("_tomb").asc)
    val last = dels.unionByName(ups)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && !col("_tomb"))
      .drop("_seq", "_tomb", "_rn")
    restoreTimestamps(last, payload)
  }

  /** Encode an updating stream (rows tagged `_updating_meta.is_retract`,
    * as produced by [[UpdatingAggregate.updatingAgg]]) into debezium JSON:
    * retract → op `d` with `before`, append → op `c` with `after`.
    * (Pairing u-ops from retract+append of the same key is a sink-side
    * cosmetic; final-state semantics are identical.)
    */
  def roll(df: DataFrame, metaCol: String = "_updating_meta"): Column = {
    // debezium sinks serialize TIMESTAMP as unix millis (reference default
    // TimestampFormat::UnixMillis, formats.rs:429)
    val payloadCols = df.schema.fields.filter(_.name != metaCol).map {
      case StructField(n, TimestampType, _, _) => unix_millis(col(s"`$n`")).as(n)
      case f => col(s"`${f.name}`")
    }
    val payload = struct(payloadCols.toIndexedSeq: _*)
    to_json(struct(
      when(col(s"$metaCol.is_retract"), payload).otherwise(lit(null)).as("before"),
      when(!col(s"$metaCol.is_retract"), payload).otherwise(lit(null)).as("after"),
      when(col(s"$metaCol.is_retract"), "d").otherwise("c").as("op")))
  }
}
