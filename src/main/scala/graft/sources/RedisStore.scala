package graft.sources

import scala.collection.concurrent.TrieMap

/** In-process redis-shaped store, addressed by `redis://…` URL — the
  * command subset the reference's redis connector uses
  * (crates/arroyo-connectors/src/redis/): MGET for lookups
  * (lookup.rs:40-55), SET/EXPIRE, RPUSH/LPUSH + LTRIM, HSET for the three
  * sink targets (sink.rs; table.json string/list/hash tables).
  *
  * A JVM-global registry keyed by address plays the broker role the same
  * way the kafka decode path is spec'd broker-free: executors in local mode
  * share the JVM, so the store doubles as both the connector target and the
  * spec's observable. On a real cluster this object is the seam where a
  * redis client (same five commands) plugs in.
  */
object RedisStore {

  final class Store {
    private[RedisStore] val strings = TrieMap.empty[String, (String, Long)] // value, expiresAt (0 = never)
    private[RedisStore] val lists = TrieMap.empty[String, Vector[String]]
    private[RedisStore] val hashes = TrieMap.empty[String, TrieMap[String, String]]

    private def live(e: (String, Long)): Boolean = e._2 == 0L || e._2 > System.currentTimeMillis()

    // ── string table ─────────────────────────────────────────────────
    def set(key: String, value: String, ttlSecs: Option[Long] = None): Unit =
      strings.put(key, (value, ttlSecs.map(s => System.currentTimeMillis() + s * 1000).getOrElse(0L)))

    def get(key: String): Option[String] = strings.get(key).filter(live).map(_._1)

    /** MGET — positional, nil for misses (lookup.rs:44-55). */
    def mget(keys: Seq[String]): Seq[Option[String]] = keys.map(get)

    /** SCAN-style prefix listing (snapshot reads for lookup tables). */
    def scan(prefix: String = ""): Seq[(String, String)] =
      strings.toSeq.collect { case (k, e) if k.startsWith(prefix) && live(e) => (k, e._1) }

    // ── list table ───────────────────────────────────────────────────
    def push(key: String, value: String, prepend: Boolean, maxLength: Option[Long]): Unit =
      lists.updateWith(key) { cur =>
        val v0 = cur.getOrElse(Vector.empty)
        val v1 = if (prepend) value +: v0 else v0 :+ value
        Some(maxLength.fold(v1) { m =>
          if (prepend) v1.take(m.toInt) else v1.takeRight(m.toInt)
        })
      }

    def lrange(key: String): Seq[String] = lists.getOrElse(key, Vector.empty)

    // ── hash table ───────────────────────────────────────────────────
    def hset(key: String, field: String, value: String): Unit =
      hashes.getOrElseUpdate(key, TrieMap.empty).put(field, value)

    def hgetall(key: String): Map[String, String] =
      hashes.get(key).map(_.toMap).getOrElse(Map.empty)

    def clear(): Unit = { strings.clear(); lists.clear(); hashes.clear() }
  }

  private val stores = TrieMap.empty[String, Store]

  /** The store behind an address (created on first touch, like a
    * connection pool).
    */
  def at(address: String): Store = stores.getOrElseUpdate(address, new Store)

  def drop(address: String): Unit = stores.remove(address)
}
