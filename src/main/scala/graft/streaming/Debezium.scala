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
    * (lib.rs:300-307). Output = payload columns + a trailing
    * `_updating_meta{is_retract, id}` (reference DebeziumUnrollingExec,
    * physical.rs:884-948): `id` hashes the row's PRIMARY KEY values so a
    * downstream [[rollBatch]] can re-pair retract+append into `u` records.
    *
    * NO-PK DEGRADATION (documented divergence): with no declared PRIMARY
    * KEY, `id` hashes ALL payload columns, so an update's before/after
    * images get DIFFERENT ids and [[rollBatch]] can never pair them into
    * a `u` — they emit as separate d+c envelopes. Final merged state is
    * identical; only the changelog shape differs. The reference instead
    * errors on updating sinks without keys — declare a PRIMARY KEY on
    * sources feeding debezium sinks to get true `u` records.
    */
  def unroll(df: DataFrame, jsonCol: String, payload: StructType,
      pkCols: Seq[String] = Nil): DataFrame = {
    val env = from_json(col(jsonCol), envelopeSchema(parseSchema(payload)))
    // one ARRAY of (image, is_retract) events per record, exploded in
    // place: row order stays file order within each partition and a `u`
    // record's retract lands immediately before its append — the same
    // adjacency DebeziumUnrollingExec produces (physical.rs:905-912).
    // (A union of two filtered branches would lose that interleaving,
    // and streaming plans allow neither monotonically_increasing_id nor
    // window functions to recover it.)
    val retractEv = when(
      env.getField("op").isin("u", "d") && env.getField("before").isNotNull,
      struct(env.getField("before").as("img"), lit(true).as("r")))
    val appendEv = when(
      env.getField("op").isin("c", "u", "r") && env.getField("after").isNotNull,
      struct(env.getField("after").as("img"), lit(false).as("r")))
    val events = filter(array(retractEv, appendEv), x => x.isNotNull)
    val exploded = df.select(explode(events).as("ev"))
      .select(col("ev.img.*"), col("ev.r").as("_r"))
    val keys = if (pkCols.nonEmpty) pkCols else payload.fieldNames.toSeq
    restoreTimestamps(exploded, payload).select(
      payload.fieldNames.map(n => col(s"`$n`")).toIndexedSeq :+
        struct(
          col("_r").as("is_retract"),
          md5(to_json(struct(keys.map(k => col(s"`$k`")): _*))).as("id"))
          .as("_updating_meta"): _*)
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
  /** Debezium sinks serialize TIMESTAMP as unix millis (reference default
    * TimestampFormat::UnixMillis, formats.rs:429).
    */
  private def payloadStruct(df: DataFrame, metaCol: String,
      drop: Set[String] = Set.empty): Column = {
    val payloadCols = df.schema.fields
      .filter(f => f.name != metaCol && !drop(f.name)).map {
        case StructField(n, TimestampType, _, _) => unix_millis(col(s"`$n`")).as(n)
        case f => col(s"`${f.name}`")
      }
    struct(payloadCols.toIndexedSeq: _*)
  }

  def roll(df: DataFrame, metaCol: String = "_updating_meta"): Column = {
    val payload = payloadStruct(df, metaCol)
    to_json(struct(
      when(col(s"$metaCol.is_retract"), payload).otherwise(lit(null)).as("before"),
      when(!col(s"$metaCol.is_retract"), payload).otherwise(lit(null)).as("after"),
      when(col(s"$metaCol.is_retract"), "d").otherwise("c").as("op")))
  }

  /** Batch-local retract/append pairing (reference ToDebeziumExec,
    * physical.rs:1100-1182): group a micro-batch's rows by
    * `_updating_meta.id` (= key hash), order each group's events (by the
    * unroll `seq` when present, else retract-before-append — both match
    * the reference's in-batch emission order), then emit ONE envelope
    * record per key from the (first, last) events:
    *
    *   create…create → `c` (after = last), retract…retract → `d`
    *   (before = first), retract…create → `u` {before=first, after=last},
    *   create…retract → net no-op, dropped.
    *
    * Output: a single `value` JSON string column. One batch-local shuffle
    * on the key hash — the same partitioning the upstream stateful
    * operator already produced, and the price of emitting canonical `u`
    * records instead of unordered d/c pairs (file order downstream is not
    * guaranteed, so unpaired emission can replay out of order).
    *
    * INTENTIONAL DIVERGENCES from ToDebeziumExec (both verified by
    * GoldenSpec's merged-state comparison, which is order- and
    * cardinality-insensitive by construction):
    *   - PER-BATCH COMPACTION: one envelope per key per micro-batch from
    *     the (first, last) events — intermediate state changes within a
    *     batch are elided, so changelog cardinality is ≤ the reference's
    *     one-record-per-retract/append-pair. Consumers see the same final
    *     state with fewer transitions.
    *   - ORDERING: `monotonically_increasing_id` orders events by
    *     (partition, row) — exact within a partition; ACROSS partitions it
    *     follows partition index, which matches emission order for the
    *     narrow plans foreachBatch hands us but is an assumption, not a
    *     guarantee. A cross-partition key whose events interleave adversely
    *     could pick first/last from partition order rather than true
    *     emission order.
    */
  /** [[rollBatch]]'s structured twin for MERGE-backed table sinks: net
    * change per key this micro-batch as PLAIN COLUMNS (native types — no
    * JSON, no millis conversion) plus `__graft_deleted`. create…retract
    * within one batch nets to nothing; a trailing retract nets to a
    * delete carrying the retracted state (the key survives for the MERGE
    * condition); anything else nets to the final state. One row per key
    * by construction (grouped on the key hash), so the upsert can never
    * trip MERGE's multiple-source-rows error.
    */
  def netBatch(df: DataFrame, metaCol: String = "_updating_meta"): DataFrame = {
    // a meta struct carrying `seq` (a change-feed source,
    // [[graft.sinks.Cdf.updatingStream]]) orders a key's events by
    // COMMIT order, not arrival order — Spark packs file splits by size,
    // so a key's retract can arrive after its replacement within one
    // micro-batch and arrival-order netting would wrongly drop the key.
    // Null seq (the stream's initial snapshot) sorts first; the
    // monotonic id stays as the tie-break for same-seq events.
    val metaType = df.schema(df.schema.fieldIndex(metaCol)).dataType
      .asInstanceOf[StructType]
    val seqCol =
      if (metaType.fieldNames.contains("seq"))
        coalesce(col(s"$metaCol.seq"), lit(Long.MinValue))
      else lit(0L)
    val seqd = df.withColumn("__ord",
      struct(seqCol.as("s"), monotonically_increasing_id().as("m")))
    val payloadCols = df.schema.fields.filter(_.name != metaCol)
      .map(f => col(s"`${f.name}`")).toIndexedSeq
    val ev = struct(col("__ord").as("o"), col(s"$metaCol.is_retract").as("r"),
      struct(payloadCols: _*).as("p"))
    val grouped = seqd
      .groupBy(col(s"$metaCol.id").as("_id"))
      .agg(sort_array(collect_list(ev)).as("evs"))
    val first = col("evs").getItem(0)
    val last = element_at(col("evs"), -1)
    val firstR = first.getField("r")
    val lastR = last.getField("r")
    grouped
      .filter(firstR || !lastR) // create…retract = net no-op
      .select(
        when(lastR, first.getField("p")).otherwise(last.getField("p")).as("p"),
        (firstR && lastR).as("__graft_deleted"))
      .select(col("p.*"), col("__graft_deleted"))
  }

  def rollBatch(df: DataFrame, metaCol: String = "_updating_meta"): DataFrame = {
    // batch-local order id: rollBatch runs inside foreachBatch, where the
    // frame is a plain batch plan whose narrow ops preserved partition row
    // order — monotonically_increasing_id reconstructs (partition, row)
    // order, i.e. file/emission order. A meta struct carrying `seq` (a
    // change-feed source) overrides with COMMIT order — see netBatch.
    val metaType = df.schema(df.schema.fieldIndex(metaCol)).dataType
      .asInstanceOf[StructType]
    val seqCol =
      if (metaType.fieldNames.contains("seq"))
        coalesce(col(s"$metaCol.seq"), lit(Long.MinValue))
      else lit(0L)
    val seqd = df.withColumn("__ord",
      struct(seqCol.as("s"), monotonically_increasing_id().as("m")))
    val ev = struct(col("__ord").as("o"), col(s"$metaCol.is_retract").as("r"),
      payloadStruct(df, metaCol, drop = Set("__ord")).as("p"))
    val grouped = seqd
      .groupBy(col(s"$metaCol.id").as("_id"))
      .agg(sort_array(collect_list(ev)).as("evs"))
    val first = col("evs").getItem(0)
    val last = element_at(col("evs"), -1)
    val firstR = first.getField("r")
    val lastR = last.getField("r")
    grouped
      .filter(firstR || !lastR) // create…retract = net no-op
      .select(to_json(struct(
        when(firstR, first.getField("p")).otherwise(lit(null)).as("before"),
        when(!lastR, last.getField("p")).otherwise(lit(null)).as("after"),
        when(firstR && lastR, "d").otherwise(when(firstR, "u").otherwise("c")).as("op")))
        .as("value"))
  }
}
