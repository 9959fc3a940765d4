package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, StringType}

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

  /** Decode a JSON debezium stream into flat rows: `c`/`u`/`r` emit the
    * `after` image as an append, `u`/`d` emit the `before` image as a
    * retract — the reference maps op `r` (snapshot read) to create
    * (lib.rs:300-307). Output = payload columns + `_is_retract`.
    */
  def unroll(df: DataFrame, jsonCol: String, payload: StructType): DataFrame = {
    val env = from_json(col(jsonCol), envelopeSchema(payload)).as("env")
    val withEnv = df.select(env)
    val appends = withEnv
      .filter(col("env.op").isin("c", "u", "r") && col("env.after").isNotNull)
      .select(col("env.after.*")).withColumn("_is_retract", lit(false))
    val retracts = withEnv
      .filter(col("env.op").isin("u", "d") && col("env.before").isNotNull)
      .select(col("env.before.*")).withColumn("_is_retract", lit(true))
    appends.unionByName(retracts)
  }

  /** Encode an updating stream (rows tagged `_updating_meta.is_retract`,
    * as produced by [[UpdatingAggregate.updatingAgg]]) into debezium JSON:
    * retract → op `d` with `before`, append → op `c` with `after`.
    * (Pairing u-ops from retract+append of the same key is a sink-side
    * cosmetic; final-state semantics are identical.)
    */
  def roll(df: DataFrame, metaCol: String = "_updating_meta"): Column = {
    val payloadCols = df.columns.filter(_ != metaCol).map(col)
    val payload = struct(payloadCols.toIndexedSeq: _*)
    to_json(struct(
      when(col(s"$metaCol.is_retract"), payload).otherwise(lit(null)).as("before"),
      when(!col(s"$metaCol.is_retract"), payload).otherwise(lit(null)).as("after"),
      when(col(s"$metaCol.is_retract"), "d").otherwise("c").as("op")))
  }
}
