package graft.sinks

import graft.sources.RedisStore
import graft.sql.Ddl.ConnectorTable
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Redis sink — the reference's three write targets
  * (crates/arroyo-connectors/src/redis/mod.rs:320-368, sink.rs):
  *
  *   - `target='string'`: SET key_prefix[+key_column] = json(row), optional
  *     `target.ttl_secs` expiry
  *   - `target='list'`  : RPUSH/LPUSH (`target.operation` append|prepend),
  *     trimmed to `target.max_length`
  *   - `target='hash'`  : HSET key_prefix[+key_column] field_column json(row)
  *
  * Rows encode per the table's format (json is what the reference emits)
  * and write executor-side via foreachPartition — the driver never sees the
  * data, so the pattern scales with partition count; the in-process
  * [[RedisStore]] stands in for the client (same command surface).
  */
object RedisSink {

  def write(df: DataFrame, t: ConnectorTable): Unit = {
    val address = t.options.getOrElse("address",
      sys.error(s"table ${t.name}: redis tables require 'address'"))
    val target = t.options.getOrElse("target",
      sys.error(s"table ${t.name}: redis sinks require 'target' (string | list | hash)"))
    val prefix = t.options.getOrElse("target.key_prefix",
      sys.error(s"table ${t.name}: redis sinks require 'target.key_prefix'"))
    val keyColumn = t.options.get("target.key_column")
    def validated(opt: String, c: String): String = {
      require(df.columns.contains(c), s"invalid column '$c' for '$opt': not in the sink schema")
      c
    }
    keyColumn.foreach(validated("target.key_column", _))

    val encoded = df.withColumn("_redis_payload",
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)))
    val keyIdx = keyColumn.map(encoded.schema.fieldIndex)
    val payloadIdx = encoded.schema.fieldIndex("_redis_payload")
    def keyOf(r: Row): String = prefix + keyIdx.map(i => String.valueOf(r.get(i))).getOrElse("")

    target match {
      case "string" =>
        val ttl = t.options.get("target.ttl_secs").map { s =>
          val v = s.toLong
          require(v > 0, "target.ttl_secs must be greater than 0"); v
        }
        encoded.foreachPartition { (rows: Iterator[Row]) =>
          val store = RedisStore.at(address)
          rows.foreach(r => store.set(keyOf(r), r.getString(payloadIdx), ttl))
        }
      case "list" =>
        val maxLength = t.options.get("target.max_length").map { s =>
          val v = s.toLong
          require(v > 0, "target.max_length must be greater than 0"); v
        }
        val prepend = t.options.get("target.operation") match {
          case None | Some("append") => false
          case Some("prepend") => true
          case Some(op) => sys.error(
            s"'$op' is not a valid value for target.operation; must be one of 'append' or 'prepend'")
        }
        encoded.foreachPartition { (rows: Iterator[Row]) =>
          val store = RedisStore.at(address)
          rows.foreach(r => store.push(keyOf(r), r.getString(payloadIdx), prepend, maxLength))
        }
      case "hash" =>
        val fieldIdx = encoded.schema.fieldIndex(
          validated("target.field_column", t.options.getOrElse("target.field_column",
            sys.error(s"table ${t.name}: hash target requires 'target.field_column'"))))
        encoded.foreachPartition { (rows: Iterator[Row]) =>
          val store = RedisStore.at(address)
          rows.foreach(r =>
            store.hset(keyOf(r), String.valueOf(r.get(fieldIdx)), r.getString(payloadIdx)))
        }
      case s => sys.error(s"'$s' is not a valid redis target")
    }
  }
}
