package graft.sources

import graft.sql.Ddl.ConnectorTable
import org.apache.spark.sql.{DataFrame, Encoder, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The redis lookup table as a DataFrame (reference
  * crates/arroyo-connectors/src/redis/lookup.rs + planner
  * test/queries/lookup_join.sql):
  *
  *   CREATE TEMPORARY TABLE customers (
  *     customer_id TEXT METADATA FROM 'key' PRIMARY KEY,
  *     customer_name TEXT, plan TEXT
  *   ) WITH (connector='redis', format='json', address='redis://…')
  *
  * Spark-first shape: the keyspace surfaces as a relation and the lookup
  * join is a plain (broadcast) equi-join Catalyst plans like any other —
  * instead of the reference's per-batch MGET operator. The scan runs
  * INSIDE `mapPartitions`, so every action (and in streaming, every
  * micro-batch of a stream-static join) re-reads the store: refreshed
  * lookup rows are picked up per batch, the same freshness contract the
  * reference's `lookup.cache.ttl` bounds. For keyspaces too large to scan,
  * [[graft.operators.LookupJoin.perPartition]] is the per-key MGET path
  * with the bounded TTL cache (`lookup.cache.max_bytes`/`lookup.cache.ttl`).
  */
object RedisLookupSource {

  /** Payload columns = declared minus metadata-sourced ones. */
  def payloadSchema(t: ConnectorTable): StructType =
    StructType(t.columns.filter(c => c.virtualExpr.isEmpty && c.metadataFrom.isEmpty)
      .map(c => StructField(c.name, DataType.fromDDL(c.sqlType))))

  def frame(spark: SparkSession, t: ConnectorTable): DataFrame = {
    val address = t.options.getOrElse("address",
      sys.error(s"table ${t.name}: redis tables require 'address'"))
    t.columns.find(c => c.metadataFrom.exists(_ != "key")).foreach(c =>
      sys.error(s"Invalid metadata key '${c.metadataFrom.get}' for redis " +
        "(only 'key' is available, reference redis/lookup.rs:70-77)"))
    // reference error_missing_redis_key.sql: the PRIMARY KEY must be the
    // 'key' metadata column
    if (!t.columns.exists(c => c.primaryKey && c.metadataFrom.contains("key")))
      throw new IllegalArgumentException(
        "Redis lookup tables must have a PRIMARY KEY field defined as " +
          "`field_name TEXT METADATA FROM 'key'` (reference parity, error_missing_redis_key.sql)")

    val kvSchema = StructType(Seq(
      StructField("_redis_key", StringType), StructField("_redis_value", StringType)))
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(kvSchema)
    // single-partition lazy scan: dim-table sized by contract (it gets
    // broadcast in the join); laziness is what re-reads the store per action
    val kv = spark.range(0, 1, 1, numPartitions = 1).toDF("i").mapPartitions { _ =>
      RedisStore.at(address).scan().iterator.map { case (k, v) => Row(k, v) }
    }

    val payload = payloadSchema(t)
    val decoded = t.format match {
      case "json" =>
        kv.withColumn("_p", from_json(col("_redis_value"), payload))
          .select(col("_redis_key") +: payload.fieldNames.toIndexedSeq.map(f =>
            col(s"_p.`$f`").as(f)): _*)
      case "raw_string" =>
        require(payload.fields.length == 1,
          s"raw_string lookup table needs exactly one non-metadata column, got ${payload.fieldNames.mkString(", ")}")
        kv.select(col("_redis_key"), col("_redis_value").as(payload.fieldNames.head))
      case f => sys.error(s"unsupported redis lookup format '$f' (json | raw_string)")
    }
    // metadata('key') columns materialize from the redis key
    val withMeta = t.columns.filter(_.metadataFrom.contains("key")).foldLeft(decoded) {
      (df, c) => df.withColumn(c.name, col("_redis_key").cast(DataType.fromDDL(c.sqlType)))
    }
    withMeta.select(t.columns.filter(_.virtualExpr.isEmpty).map(c => col(c.name)).toIndexedSeq: _*)
  }

  /** Batched MGET fetcher for [[graft.operators.LookupJoin.perPartition]] —
    * the per-key path for keyspaces too big to snapshot (lookup.rs:40-55).
    */
  def mgetFetcher(address: String): Set[String] => Map[String, String] = { keys =>
    val ks = keys.toSeq
    ks.zip(RedisStore.at(address).mget(ks)).collect { case (k, Some(v)) => k -> v }.toMap
  }

  /** `lookup.cache.max_bytes` / `lookup.cache.ttl` (reference
    * tables.rs:427-429) → (maxEntries, ttlMs) for the per-partition TTL
    * cache. Bytes map to entries at the reference's default ~1 KiB/row
    * working assumption; ttl accepts `interval 'N' second|minute|...`.
    */
  def cacheConf(t: ConnectorTable): (Int, Long) = {
    val maxEntries = t.options.get("lookup.cache.max_bytes")
      .map(b => math.max(1L, b.toLong / 1024L).min(Int.MaxValue).toInt).getOrElse(100000)
    val IntervalRe = """(?i)interval\s*'(\d+)'\s*(\w+)?""".r
    val ttlMs = t.options.get("lookup.cache.ttl").map {
      case IntervalRe(n, unit) =>
        val mult = Option(unit).map(_.toLowerCase.stripSuffix("s")) match {
          case None | Some("second") => 1000L
          case Some("millisecond") => 1L
          case Some("minute") => 60000L
          case Some("hour") => 3600000L
          case Some(u) => sys.error(s"unsupported lookup.cache.ttl unit '$u'")
        }
        n.toLong * mult
      case other => other.toLong * 1000L // bare seconds
    }.getOrElse(60000L)
    (maxEntries, ttlMs)
  }
}
