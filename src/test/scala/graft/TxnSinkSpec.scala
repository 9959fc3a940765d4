package graft

import graft.sinks.{ExactlyOnce, TxnLog}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

/** Transactional table sink (delta/iceberg semantics without the jars) and
  * the generic exactly-once batch ledger: ACID commits, idempotent replay,
  * crash-orphan invisibility, optimistic version races.
  */
class TxnSinkSpec extends SparkSpec {

  private def tmpTable(): String =
    Files.createTempDirectory("txn_table").toString

  test("writeBatch commits atomically; replaying the same txnId writes nothing") {
    import spark.implicits._
    val table = tmpTable()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    assert(TxnLog.writeBatch(df, table, "batch-0").contains(0L))
    // replay of the SAME batch (crash-after-commit recovery): no-op
    assert(TxnLog.writeBatch(df, table, "batch-0").isEmpty)
    val out = TxnLog.read(spark, table)
    assert(out.count() == 3)
    assert(TxnLog.rowCount(table) == 3)
    // a different batch appends a new version
    assert(TxnLog.writeBatch(Seq((4L, "d")).toDF("id", "v"), table, "batch-1").contains(1L))
    assert(TxnLog.read(spark, table).count() == 4)
    assert(TxnLog.commits(table).map(_.version) == Seq(0L, 1L))
  }

  test("uncommitted data files are invisible to readers (crash mid-write)") {
    import spark.implicits._
    val table = tmpTable()
    TxnLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), table, "b0")
    // simulate a writer that crashed after writing data, before committing
    val orphan = Paths.get(table, "data/orphan-dir")
    Seq((99L, "ghost")).toDF("id", "v").write.parquet(orphan.toString)
    val out = TxnLog.read(spark, table).as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a")))
  }

  test("concurrent commits resolve by optimistic version retry, no loss") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val table = tmpTable()
    val schemaJson = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT").json
    val fs = (0 until 8).map(i => Future {
      TxnLog.commit(table, s"txn-$i", Seq(s"data/f$i.parquet"), schemaJson, 1L)
    })
    val versions = Await.result(Future.sequence(fs), 60.seconds).flatten
    assert(versions.sorted == (0L until 8L))
    assert(TxnLog.commits(table).map(_.txnId).toSet == (0 until 8).map(i => s"txn-$i").toSet)
  }

  test("streaming SQL pipeline into a delta sink writes the WIRE _delta_log, replay-safe") {
    import graft.sinks.DeltaLog
    import spark.implicits._
    val table = tmpTable()
    val srcDir = Files.createTempDirectory("delta_src")
    Seq("""{"id": 1, "v": "x"}""", """{"id": 2, "v": "y"}""")
      .foreach(l => Files.write(srcDir.resolve(s"f${l.hashCode}.json"), (l + "\n").getBytes))
    val sqlText =
      s"""CREATE TABLE src (id BIGINT, v TEXT) WITH (
         |  connector='filesystem', path='$srcDir', format='json', type='source');
         |CREATE TABLE tbl (id BIGINT, v TEXT) WITH (
         |  connector='delta', path='$table', format='parquet', type='sink');
         |INSERT INTO tbl SELECT id, v FROM src;""".stripMargin
    val p = new sql.Pipeline(spark, streaming = true)
    p.run(sqlText)
    val out = DeltaLog.read(spark, table).as[(Long, String)].collect().toSet
    assert(out == Set((1L, "x"), (2L, "y")))
    // the streaming query's txn action landed (appId = sink name)
    val snap = DeltaLog.snapshot(spark, table).get
    assert(snap.appVersions.contains("tbl"), snap.appVersions)

    // batch SQL read back through the delta source connector
    val p2 = new sql.Pipeline(spark, streaming = false)
    val back = p2.run(
      s"""CREATE TABLE tbl (id BIGINT, v TEXT) WITH (
         |  connector='delta', path='$table', format='parquet', type='source');
         |SELECT count(*) AS n, sum(id) AS s FROM tbl;""".stripMargin)
    val r = back.get.collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 3)
  }

  test("streaming SQL pipeline into an iceberg sink writes real v2 metadata (r9)") {
    import graft.sinks.IcebergLog
    import spark.implicits._
    val table = tmpTable()
    val srcDir = Files.createTempDirectory("ice_src")
    Files.write(srcDir.resolve("f0.json"), "{\"id\": 5, \"v\": \"z\"}\n".getBytes)
    val p = new sql.Pipeline(spark, streaming = true)
    p.run(
      s"""CREATE TABLE src (id BIGINT, v TEXT) WITH (
         |  connector='filesystem', path='$srcDir', format='json', type='source');
         |CREATE TABLE tbl (id BIGINT, v TEXT) WITH (
         |  connector='iceberg', path='$table', format='parquet', type='sink');
         |INSERT INTO tbl SELECT id, v FROM src;""".stripMargin)
    assert(IcebergLog.read(spark, table).as[(Long, String)].collect().toSet ==
      Set((5L, "z")))
    // the per-epoch txn id (appId = sink name) rides the snapshot summary
    val m = IcebergLog.current(table).get
    assert(m.appVersions.contains("tbl"), m.appVersions)
    assert(Files.exists(java.nio.file.Paths.get(table, "metadata", "version-hint.text")))
    // batch SQL read back through the iceberg source connector
    val back = new sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE tbl (id BIGINT, v TEXT) WITH (
         |  connector='iceberg', path='$table', format='parquet', type='source');
         |SELECT count(*) AS n FROM tbl;""".stripMargin)
    assert(back.get.collect()(0).getLong(0) == 1)
  }

  test("OPTIMIZE / VACUUM SQL verbs run against a delta table (r8)") {
    import graft.sinks.DeltaLog
    import spark.implicits._
    val table = tmpTable()
    (0 until 3).foreach { i =>
      DeltaLog.writeBatch(Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1), table)
    }
    val p = new sql.Pipeline(spark, streaming = false)
    p.run(
      s"""CREATE TABLE tbl (id BIGINT, v TEXT) WITH (
         |  connector='delta', path='$table', format='parquet', type='sink');
         |OPTIMIZE tbl;
         |VACUUM tbl RETAIN 168 HOURS;""".stripMargin)
    val s = DeltaLog.snapshot(spark, table).get
    assert(s.files.size < 3, s"expected compaction, got ${s.files}")
    assert(DeltaLog.read(spark, table).count() == 3)
    // plan() validates but does NOT execute maintenance
    val nFilesAfter = DeltaLog.snapshot(spark, table).get.files.size
    new sql.Pipeline(spark, streaming = false).plan(
      s"""CREATE TABLE tbl (id BIGINT, v TEXT) WITH (
         |  connector='delta', path='$table', format='parquet', type='sink');
         |OPTIMIZE tbl;""".stripMargin)
    assert(DeltaLog.snapshot(spark, table).get.files.size == nFilesAfter,
      "plan() must not run OPTIMIZE")
    // non-delta tables reject the verbs
    val e = intercept[IllegalArgumentException] {
      new sql.Pipeline(spark, streaming = false).run(
        s"""CREATE TABLE x (id BIGINT) WITH (connector='blackhole', type='sink');
           |OPTIMIZE x;""".stripMargin)
    }
    assert(e.getMessage.contains("delta"))
  }

  test("OPTIMIZE / VACUUM SQL verbs run against an iceberg table; scan_filter prunes files (r9)") {
    import graft.sinks.IcebergLog
    import spark.implicits._
    val table = tmpTable()
    (0 until 3).foreach { i =>
      IcebergLog.writeBatch(
        Seq((i.toLong * 100, s"v$i")).toDF("id", "v").coalesce(1), table)
    }
    new sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE tbl (id BIGINT, v TEXT) WITH (
         |  connector='iceberg', path='$table', format='parquet', type='sink');
         |OPTIMIZE tbl;
         |VACUUM tbl RETAIN 0 HOURS;""".stripMargin)
    // compacted to one live file, expired snapshots GC'd, rows intact
    assert(IcebergLog.planFiles(spark, table, None, None)._2 == 1)
    assert(IcebergLog.current(table).get.snapshots.size == 1)
    assert(IcebergLog.read(spark, table).count() == 3)
    // scan_filter source option prunes against the manifest metrics
    val filtered = new sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE tbl (id BIGINT, v TEXT) WITH (
         |  connector='iceberg', path='$table', format='parquet',
         |  type='source', scan_filter='id >= 100');
         |SELECT count(*) AS n FROM tbl;""".stripMargin)
    assert(filtered.get.collect()(0).getLong(0) == 2)
  }

  test("ExactlyOnce ledger: a replayed batch id is skipped, a new one runs") {
    val ledger = Files.createTempDirectory("ledger").toString
    val writes = new AtomicInteger(0)
    assert(ExactlyOnce.run(ledger, "batch-7") { writes.incrementAndGet() })
    assert(!ExactlyOnce.run(ledger, "batch-7") { writes.incrementAndGet() })
    assert(ExactlyOnce.run(ledger, "batch-8") { writes.incrementAndGet() })
    assert(writes.get() == 2)
    assert(ExactlyOnce.committed(ledger, "batch-7"))
    assert(!ExactlyOnce.committed(ledger, "batch-9"))
  }

  test("a failed write leaves no committed marker — the batch re-runs on retry") {
    val ledger = Files.createTempDirectory("ledger2").toString
    val writes = new AtomicInteger(0)
    intercept[RuntimeException] {
      ExactlyOnce.run(ledger, "b0") { writes.incrementAndGet(); sys.error("broker down") }
    }
    assert(!ExactlyOnce.committed(ledger, "b0"))
    assert(ExactlyOnce.run(ledger, "b0") { writes.incrementAndGet() })
    assert(writes.get() == 2)
  }

  test("invalid sink.commit_mode is rejected (reference parity)") {
    import spark.implicits._
    val e = intercept[RuntimeException] {
      val p = new sql.Pipeline(spark, streaming = true)
      p.run(
        """CREATE TABLE src (id BIGINT) WITH (connector='impulse', event_rate='10', message_count='5');
          |CREATE TABLE out (id BIGINT) WITH (connector='kafka', format='json', topic='t',
          |  bootstrap_servers='none', 'sink.commit_mode'='maybe', type='sink');
          |INSERT INTO out SELECT id FROM src;""".stripMargin)
    }
    assert(e.getMessage.contains("commit_mode"))
  }
}
