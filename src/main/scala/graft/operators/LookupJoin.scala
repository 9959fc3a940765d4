package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Lookup join — the reference's LookupJoin operator
  * (crates/arroyo-worker/src/arrow/lookup_join.rs:36-270): enrich a stream
  * against an external keyed table, INNER or LEFT only
  * (crates/arroyo-planner/src/plan/join.rs:247-256), with a bounded
  * per-worker cache (`lookup.cache.max_bytes` / `lookup.cache.ttl`).
  *
  * Spark-first shapes:
  *   - [[static_]]: lookup side is a (small) DataFrame — broadcast join;
  *     in streaming this is a stream-static join, re-resolved per
  *     micro-batch, so a refreshed dim table is picked up automatically.
  *   - [[perPartition]]: lookup side is a remote store — `mapPartitions`
  *     with a per-executor LRU+TTL cache and a batched fetch function
  *     (the reference's batch-get + moka cache).
  */
object LookupJoin {

  def static_(stream: DataFrame, lookup: DataFrame, keys: Seq[String], joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"lookup join supports inner/left only (reference plan/join.rs:247-256), got $joinType")
    stream.join(broadcast(lookup), keys, if (joinType == "left") "left_outer" else "inner")
  }

  def staticExpr(stream: DataFrame, lookup: DataFrame, cond: Column, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left")
    stream.join(broadcast(lookup), cond, if (joinType == "left") "left_outer" else "inner")
  }

  /** Executor-side keyed cache with TTL for remote-store lookups. One
    * instance per (executor, cacheName); thread-safe; size-bounded LRU.
    */
  final class TtlCache[K, V](maxEntries: Int, ttlMs: Long) extends Serializable {
    private val map = java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[K, (V, Long)](16, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[K, (V, Long)]): Boolean =
          size() > maxEntries
      })
    def get(k: K): Option[V] = Option(map.get(k)).collect {
      case (v, t) if System.currentTimeMillis() - t < ttlMs => v
    }
    def put(k: K, v: V): Unit = map.put(k, (v, System.currentTimeMillis()))
  }

  /** Enrich with `fetch` (a batched remote getter) through a per-partition
    * TTL cache. `project` turns (row, lookedUpValue) into the output row
    * values; nulls pass through for misses (LEFT semantics).
    */
  def perPartition[K, V](
      stream: DataFrame,
      keyOf: org.apache.spark.sql.Row => K,
      fetch: Set[K] => Map[K, V],
      outSchema: org.apache.spark.sql.types.StructType,
      project: (org.apache.spark.sql.Row, Option[V]) => org.apache.spark.sql.Row,
      maxEntries: Int = 100000,
      ttlMs: Long = 60000,
      fetchBatch: Int = 1000): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    stream.mapPartitions { rows =>
      val cache = new TtlCache[K, V](maxEntries, ttlMs)
      rows.grouped(fetchBatch).flatMap { chunk =>
        val keys = chunk.map(keyOf)
        val misses = keys.filter(cache.get(_).isEmpty).toSet
        if (misses.nonEmpty) fetch(misses).foreach { case (k, v) => cache.put(k, v) }
        chunk.lazyZip(keys).map { case (row, k) => project(row, cache.get(k)) }
      }
    }
  }
}
