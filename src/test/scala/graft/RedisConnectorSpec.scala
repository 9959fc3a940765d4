package graft

import graft.operators.LookupJoin
import graft.sources.{RedisLookupSource, RedisStore}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** Redis connector: lookup tables (snapshot relation + per-key MGET path)
  * and the three sink targets, against the in-process store — the same
  * broker-free pattern the kafka decode specs use.
  */
class RedisConnectorSpec extends SparkSpec {

  private def freshAddr(): String =
    s"redis://spec-${java.util.UUID.randomUUID()}:6379"

  private def seedCustomers(addr: String): Unit = {
    val s = RedisStore.at(addr)
    s.set("c1", """{"customer_name": "Ada", "plan": "Premium"}""")
    s.set("c2", """{"customer_name": "Bob", "plan": "Free"}""")
    s.set("c3", """{"customer_name": "Cyd", "plan": "Premium"}""")
  }

  private val customersDdl =
    """create temporary table customers (
      |    customer_id TEXT METADATA FROM 'key' PRIMARY KEY,
      |    customer_name TEXT,
      |    plan TEXT
      |) with (
      |    connector = 'redis',
      |    format = 'json',
      |    address = '%s',
      |    'lookup.cache.max_bytes' = 1000000,
      |    'lookup.cache.ttl' = interval '5' second
      |)""".stripMargin

  test("reference lookup_join.sql shape: stream LEFT JOIN redis lookup on the key") {
    val addr = freshAddr()
    seedCustomers(addr)
    val srcDir = Files.createTempDirectory("rl_src")
    Seq(
      """{"event_id": "e1", "customer_id": "c1", "event_type": "click"}""",
      """{"event_id": "e2", "customer_id": "c2", "event_type": "view"}""",
      """{"event_id": "e3", "customer_id": "c3", "event_type": "click"}""",
      """{"event_id": "e4", "customer_id": "nope", "event_type": "click"}""")
      .zipWithIndex.foreach { case (l, i) =>
        Files.write(srcDir.resolve(s"f$i.json"), (l + "\n").getBytes) }
    val script =
      s"""CREATE TABLE events (event_id TEXT, customer_id TEXT, event_type TEXT) WITH (
         |  connector='filesystem', path='$srcDir', format='json', type='source');
         |${customersDdl.format(addr)};
         |SELECT e.event_id, e.customer_id, e.event_type, c.customer_name, c.plan
         |FROM events e
         |LEFT JOIN customers c ON e.customer_id = c.customer_id
         |WHERE c.plan = 'Premium';""".stripMargin
    val p = new sql.Pipeline(spark)
    val out = p.run(script).get.collect().map(r => (r.getString(0), r.getString(3))).sorted
    assert(out.toSeq == Seq(("e1", "Ada"), ("e3", "Cyd")))
  }

  test("lookup frame re-reads the store on each action (per-batch refresh)") {
    val addr = freshAddr()
    val s = RedisStore.at(addr)
    s.set("k1", """{"customer_name": "Ada", "plan": "Free"}""")
    val t = sql.Ddl.parse(customersDdl.format(addr)).asInstanceOf[sql.Ddl.CreateTbl].table
    val df = RedisLookupSource.frame(spark, t)
    assert(df.count() == 1)
    s.set("k2", """{"customer_name": "Bob", "plan": "Free"}""")
    assert(df.count() == 2) // same DataFrame, fresh snapshot
    assert(df.columns.toSeq == Seq("customer_id", "customer_name", "plan"))
  }

  test("lookup join on a non-primary-key column is rejected (reference parity)") {
    val addr = freshAddr()
    seedCustomers(addr)
    val srcDir = Files.createTempDirectory("rl_bad")
    Files.write(srcDir.resolve("f.json"), """{"event_id": "e", "customer_id": "c1"}""".getBytes)
    val p = new sql.Pipeline(spark)
    val e = intercept[IllegalArgumentException] {
      p.run(
        s"""CREATE TABLE events (event_id TEXT, customer_id TEXT) WITH (
           |  connector='filesystem', path='$srcDir', format='json', type='source');
           |${customersDdl.format(addr)};
           |SELECT e.event_id FROM events e
           |JOIN customers c ON e.customer_id = c.customer_name;""".stripMargin)
    }
    assert(e.getMessage.contains("non-primary key"))
  }

  test("temporary table with a non-lookup type is rejected (tables.rs:286-290)") {
    val e = intercept[IllegalArgumentException] {
      sql.Ddl.parse(
        """create temporary table t (id TEXT) with (
          |  connector='redis', address='redis://x', type='sink')""".stripMargin)
    }
    assert(e.getMessage.contains("must be type 'lookup'"))
  }

  test("per-key MGET path through LookupJoin.perPartition with the TTL cache") {
    import spark.implicits._
    val addr = freshAddr()
    seedCustomers(addr)
    val stream = Seq("c1", "c2", "c1", "nope").toDF("customer_id")
    val outSchema = StructType(Seq(
      StructField("customer_id", StringType), StructField("payload", StringType)))
    val out = LookupJoin.perPartition[String, String](
      stream.repartition(1),
      r => r.getString(0),
      RedisLookupSource.mgetFetcher(addr),
      outSchema,
      (r, v) => Row(r.getString(0), v.orNull))
      .collect().map(r => (r.getString(0), Option(r.getString(1)).isDefined))
    assert(out.count(_._2) == 3) // c1 ×2 + c2 enrich; 'nope' stays null (LEFT)
  }

  test("TTL freshness: a store mutation mid-stream is visible within one expiry") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val addr = freshAddr()
    val store = graft.sources.RedisStore.at(addr)
    store.set("k1", "v1")
    val outSchema = StructType(Seq(
      StructField("k", StringType), StructField("v", StringType)))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    // generous TTL: micro-batches under full-suite load can take hundreds
    // of ms, and the stale-read assertion needs the entry alive across one
    val ttlMs = 5000L
    val out = LookupJoin.perPartition[String, String](
      input.toDF().select(col("value").as("k")).repartition(1),
      r => r.getString(0),
      RedisLookupSource.mgetFetcher(addr),
      outSchema,
      (r, v) => Row(r.getString(0), v.orNull),
      ttlMs = ttlMs,
      cacheName = "ttl-freshness-spec")
    try {
      val seen = scala.collection.mutable.ArrayBuffer.empty[String]
      val q = out.writeStream.outputMode("append")
        .foreachBatch((b: org.apache.spark.sql.Dataset[Row], _: Long) => {
          seen.synchronized { seen ++= b.collect().map(_.getString(1)) }
          ()
        })
        .start()
      input.addData("k1"); q.processAllAvailable()         // cold fetch → v1
      store.set("k1", "v2")                                // MID-STREAM mutation
      input.addData("k1"); q.processAllAvailable()         // within TTL → stale v1
      Thread.sleep(ttlMs + 300)                            // let the entry expire
      input.addData("k1"); q.processAllAvailable()         // after expiry → v2
      q.stop()
      assert(seen.toList == List("v1", "v1", "v2"),
        s"expected stale-within-ttl then refresh, got $seen")
    } finally graft.operators.LookupJoin.TtlCache.drop("ttl-freshness-spec")
  }

  test("cacheConf parses the reference's lookup.cache.* option names") {
    val t = sql.Ddl.parse(customersDdl.format("redis://x"))
      .asInstanceOf[sql.Ddl.CreateTbl].table
    val (maxEntries, ttlMs) = RedisLookupSource.cacheConf(t)
    assert(maxEntries == 976) // 1000000 / 1024
    assert(ttlMs == 5000L)
  }

  test("string sink target: SET with key_column and ttl_secs") {
    import spark.implicits._
    val addr = freshAddr()
    val t = sql.Ddl.parse(
      s"""CREATE TABLE out (uid TEXT, score BIGINT) WITH (
         |  connector='redis', type='sink', format='json', address='$addr',
         |  target='string', 'target.key_prefix'='score:', 'target.key_column'='uid',
         |  'target.ttl_secs'='120')""".stripMargin).asInstanceOf[sql.Ddl.CreateTbl].table
    graft.sinks.RedisSink.write(Seq(("u1", 10L), ("u2", 20L)).toDF("uid", "score"), t)
    val s = RedisStore.at(addr)
    assert(s.get("score:u1").exists(_.contains("\"score\":10")))
    assert(s.get("score:u2").exists(_.contains("\"uid\":\"u2\"")))
  }

  test("list sink target honors prepend and max_length") {
    import spark.implicits._
    val addr = freshAddr()
    val t = sql.Ddl.parse(
      s"""CREATE TABLE out (n BIGINT) WITH (
         |  connector='redis', type='sink', format='json', address='$addr',
         |  target='list', 'target.key_prefix'='events', 'target.operation'='prepend',
         |  'target.max_length'='3')""".stripMargin).asInstanceOf[sql.Ddl.CreateTbl].table
    graft.sinks.RedisSink.write(Seq(1L, 2L, 3L, 4L, 5L).toDF("n").repartition(1), t)
    val l = RedisStore.at(addr).lrange("events")
    assert(l.length == 3)
    assert(l.head.contains("\"n\":5")) // prepend: newest first
  }

  test("hash sink target: HSET key/field from columns") {
    import spark.implicits._
    val addr = freshAddr()
    val t = sql.Ddl.parse(
      s"""CREATE TABLE out (region TEXT, city TEXT, pop BIGINT) WITH (
         |  connector='redis', type='sink', format='json', address='$addr',
         |  target='hash', 'target.key_prefix'='geo:', 'target.key_column'='region',
         |  'target.field_column'='city')""".stripMargin).asInstanceOf[sql.Ddl.CreateTbl].table
    graft.sinks.RedisSink.write(
      Seq(("eu", "paris", 2L), ("eu", "rome", 3L), ("us", "nyc", 8L)).toDF("region", "city", "pop"), t)
    val s = RedisStore.at(addr)
    assert(s.hgetall("geo:eu").keySet == Set("paris", "rome"))
    assert(s.hgetall("geo:us")("nyc").contains("\"pop\":8"))
  }

  test("streaming SQL pipeline writes through the redis sink per micro-batch") {
    val addr = freshAddr()
    val srcDir = Files.createTempDirectory("rs_src")
    Seq("""{"uid": "a", "v": 1}""", """{"uid": "b", "v": 2}""").zipWithIndex
      .foreach { case (l, i) => Files.write(srcDir.resolve(s"f$i.json"), (l + "\n").getBytes) }
    val p = new sql.Pipeline(spark, streaming = true)
    p.run(
      s"""CREATE TABLE src (uid TEXT, v BIGINT) WITH (
         |  connector='filesystem', path='$srcDir', format='json', type='source');
         |CREATE TABLE out (uid TEXT, v BIGINT) WITH (
         |  connector='redis', type='sink', format='json', address='$addr',
         |  target='string', 'target.key_prefix'='u:', 'target.key_column'='uid');
         |INSERT INTO out SELECT uid, v FROM src;""".stripMargin)
    val s = RedisStore.at(addr)
    assert(s.get("u:a").exists(_.contains("\"v\":1")))
    assert(s.get("u:b").exists(_.contains("\"v\":2")))
  }
}
