package graft

import graft.streaming.UpdatingAggregateTws
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** transformWithState updating aggregate — needs the RocksDB state-store
  * provider (arbitrary-state v2 requirement; also the 100 TB deployment
  * choice). The provider conf is set per-test and restored after.
  */
class UpdatingAggregateTwsSpec extends SparkSpec {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb(f: => Unit): Unit = {
    val prev = spark.conf.getOption(providerKey)
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(providerKey, rocks)
    // state partitions = shuffle partitions at query start; keep the
    // RocksDB instance count small for the test
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try f
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("tws updating aggregate emits retract+append pairs across micro-batches") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val input = MemoryStream[(String, Double)]
      val updates = UpdatingAggregateTws.updatingAgg(input.toDF().toDF("k", "v"), "k", "v")
      val q = updates.writeStream.format("memory").queryName("tws_upd")
        .outputMode("update").start()
      try {
        input.addData(("a", 1.0), ("a", 2.0), ("b", 5.0))
        q.processAllAvailable()
        val batch1 = spark.table("tws_upd")
          .select(col("key"), col("n"), col("sum"), col("_updating_meta.is_retract"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
        assert(batch1 == Set(("a", 2L, 3.0, false), ("b", 1L, 5.0, false)))

        input.addData(("a", 4.0))
        q.processAllAvailable()
        val all = spark.table("tws_upd")
          .select(col("key"), col("n"), col("sum"), col("_updating_meta.is_retract"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
        assert(all.contains(("a", 2L, 3.0, true)), s"missing retraction in $all")
        assert(all.contains(("a", 3L, 7.0, false)), s"missing new value in $all")
        // b unchanged in batch 2 → no extra rows for it
        assert(all.count(_._1 == "b") == 1)
      } finally q.stop()
    }
  }

  test("tws state TTL: expired keys restart from zero (updating_ttl semantics)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val input = MemoryStream[(String, Double)]
      val updates = UpdatingAggregateTws.updatingAgg(input.toDF().toDF("k", "v"), "k", "v",
        ttl = Some(java.time.Duration.ofMillis(500)))
      val q = updates.writeStream.format("memory").queryName("tws_ttl")
        .outputMode("update").start()
      // NOTE: with TimeMode.ProcessingTime, TransformWithStateExec.
      // shouldRunAnotherBatch is always true (Spark 4.1, SPARK-50180), so
      // micro-batches run back-to-back and processAllAvailable never
      // observes quiescence — poll the memory sink with a deadline instead.
      def sinkRows(): Set[(String, Long, Double, Boolean)] =
        spark.table("tws_ttl")
          .select(col("key"), col("n"), col("sum"), col("_updating_meta.is_retract"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
      def awaitRows(expected: Set[(String, Long, Double, Boolean)], timeoutMs: Long = 60000): Unit = {
        val deadline = System.currentTimeMillis() + timeoutMs
        var got = sinkRows()
        while (got != expected && System.currentTimeMillis() < deadline) {
          Thread.sleep(200); got = sinkRows()
        }
        assert(got == expected, s"got $got")
      }
      try {
        input.addData(("a", 1.0))
        awaitRows(Set(("a", 1L, 1.0, false)))
        Thread.sleep(1200) // let the 500ms TTL lapse
        input.addData(("a", 10.0))
        // second event sees expired state → fresh n=1 append, no retraction
        // of the pre-TTL value (reference parity: TTL'd state just vanishes)
        awaitRows(Set(("a", 1L, 1.0, false), ("a", 1L, 10.0, false)))
      } finally q.stop()
    }
  }
}
