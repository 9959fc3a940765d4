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
    def get(k: K): Option[V] = {
      val e = map.get(k)
      if (e == null) None
      else if (System.currentTimeMillis() - e._2 < ttlMs) Some(e._1)
      else {
        // evict on expiry, don't just filter the read — a cache whose
        // stream went idle must not retain maxEntries dead values.
        // CONDITIONAL removal (key AND the observed stale entry): the
        // cache is JVM-shared, so a plain remove(k) could race a
        // concurrent put and delete a freshly refreshed value, forcing a
        // spurious cold fetch. synchronizedMap's remove(k, v) override
        // runs under the map mutex, so only the stale tuple is evicted.
        map.remove(k, e)
        None
      }
    }
    def put(k: K, v: V): Unit = map.put(k, (v, System.currentTimeMillis()))
  }

  /** JVM-wide cache registry: the cache must OUTLIVE a task so the TTL
    * contract is real — the reference's moka cache is per-worker and
    * persists across batches (lookup_join.rs:36-270). A cache created
    * inside `mapPartitions` would die with each task, silently turning
    * every micro-batch into a cold fetch (TTL never observable).
    */
  object TtlCache {
    private final class Holder(val cache: AnyRef, val idleLimitMs: Long) {
      @volatile var lastUse: Long = System.currentTimeMillis()
    }
    private val registry = new java.util.concurrent.ConcurrentHashMap[String, Holder]()
    def of[K, V](name: String, maxEntries: Int, ttlMs: Long): TtlCache[K, V] = {
      val now = System.currentTimeMillis()
      // reclaim caches idle for 10× their TTL (≥ 10 min): a lookup whose
      // query stopped must not pin its entries in every executor for the
      // life of the JVM (each perPartition call registers one cache — an
      // unswept registry is the same unbounded-leak shape as a bare
      // persist). A reclaimed-then-reused cache just refetches cold.
      val it = registry.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (now - e.getValue.lastUse > e.getValue.idleLimitMs) it.remove()
      }
      // saturating ×10: a never-expire TTL (Long.MaxValue) must not wrap
      // negative and get swept after the 10-minute floor
      val idleLimit =
        if (ttlMs > Long.MaxValue / 10) Long.MaxValue
        else math.max(ttlMs * 10, 600000L)
      val h = registry.computeIfAbsent(name, _ =>
        new Holder(new TtlCache[K, V](maxEntries, ttlMs), idleLimit))
      h.lastUse = now
      h.cache.asInstanceOf[TtlCache[K, V]]
    }
    private[graft] def drop(name: String): Unit = registry.remove(name)
    private[graft] def registrySize: Int = registry.size()
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
      fetchBatch: Int = 1000,
      cacheName: String = java.util.UUID.randomUUID().toString): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    // cacheName is fixed at CALL time, so every task/micro-batch of this
    // lookup shares one executor-resident cache — stale values serve for
    // at most ttlMs, then the next miss refetches (moka semantics)
    stream.mapPartitions { rows =>
      val cache = TtlCache.of[K, V](cacheName, maxEntries, ttlMs)
      rows.grouped(fetchBatch).flatMap { chunk =>
        val keys = chunk.map(keyOf)
        val misses = keys.filter(cache.get(_).isEmpty).toSet
        if (misses.nonEmpty) fetch(misses).foreach { case (k, v) => cache.put(k, v) }
        chunk.lazyZip(keys).map { case (row, k) => project(row, cache.get(k)) }
      }
    }
  }
}
