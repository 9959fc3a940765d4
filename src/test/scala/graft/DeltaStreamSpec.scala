package graft

import graft.sinks.DeltaLog
import graft.sources.DeltaStreamSource
import graft.sql.Pipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Streaming reads of the wire-format Delta table (round-9): the source
  * tails `_delta_log` incrementally via a hard-link view over Spark's
  * file streaming source — appends arrive exactly once, OPTIMIZE's
  * dataChange=false compaction re-emits nothing, VACUUM can't starve a
  * slow reader, and the SQL face streams the connector end-to-end.
  */
class DeltaStreamSpec extends SparkSpec {

  test("delta source tails appends exactly once; OPTIMIZE mid-stream re-emits nothing") {
    import spark.implicits._
    val table = Files.createTempDirectory("delta_stream").toString
    (0 until 3).foreach { i =>
      DeltaLog.writeBatch(Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1), table)
    }
    val (df, view) = DeltaStreamSource.open(spark, table)
    val q = df.writeStream.format("memory").queryName("dstream")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    def got: Set[(Long, String)] =
      spark.table("dstream").as[(Long, String)].collect().toSet
    try {
      q.processAllAvailable()
      assert(got == Set((0L, "v0"), (1L, "v1"), (2L, "v2")))
      // an append lands incrementally (only the new file is read)
      DeltaLog.writeBatch(Seq((3L, "v3")).toDF("id", "v").coalesce(1), table)
      view.sync()
      q.processAllAvailable()
      assert(got == Set((0L, "v0"), (1L, "v1"), (2L, "v2"), (3L, "v3")))
      // OPTIMIZE compacts all four small files — dataChange=false adds
      // must NOT re-emit their rows
      assert(DeltaLog.optimize(spark, table).isDefined)
      view.sync()
      q.processAllAvailable()
      assert(got.size == 4, s"OPTIMIZE re-emitted rows: $got")
      // appends after the compaction still flow
      DeltaLog.writeBatch(Seq((4L, "v4")).toDF("id", "v").coalesce(1), table)
      view.sync()
      q.processAllAvailable()
      assert(got.size == 5 && got.contains((4L, "v4")))
      // VACUUM reclaims the compacted originals; the view's hard links
      // keep a slow reader safe, and new appends keep arriving
      DeltaLog.vacuum(spark, table, retentionMs = -1000)
      DeltaLog.writeBatch(Seq((5L, "v5")).toDF("id", "v").coalesce(1), table)
      view.sync()
      q.processAllAvailable()
      assert(got.size == 6 && got.contains((5L, "v5")))
    } finally {
      q.stop()
      view.close()
    }
    assert(!Files.exists(view.dir), "view dir must be deleted on close")
  }

  test("row_tracking stream surfaces _row_id/_row_commit_version: DML-preserved ids in the snapshot, fresh ids on adds (r17)") {
    import spark.implicits._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val table = Files.createTempDirectory("delta_rt_stream").resolve("t").toString
    DeltaLog.writeBatch(
      Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("id", "v").coalesce(1), table)
    // arm rowTracking (the third-party shape — see DeltaRowTrackingSpec)
    val v0 = Paths.get(table, "_delta_log", f"${0L}%020d.json")
    val out = new java.lang.StringBuilder
    Files.readAllLines(v0).forEach { line =>
      if (line.nonEmpty) {
        val n = mapper.readTree(line)
        if (n.has("protocol")) {
          val p = n.get("protocol")
            .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          p.put("minReaderVersion", 1)
          p.put("minWriterVersion", 7)
          val wf = p.putArray("writerFeatures")
          Seq("rowTracking", "domainMetadata").foreach(wf.add)
        }
        out.append(n.toString).append('\n')
        ()
      }
    }
    Files.write(v0, out.toString.getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    DeltaLog.writeBatch(
      Seq((3L, "d"), (4L, "e")).toDF("id", "v").coalesce(1), table) // base 0-1
    // CoW UPDATE before the stream opens: id preserved via the
    // materialized columns, commit version bumped
    assert(DeltaLog.updateWhere(spark, table,
      Seq("v" -> "'m'"), Some("id = 3")).isDefined)
    val updVer = DeltaLog.snapshot(spark, table).get.version
    val (df, view) = DeltaStreamSource.open(spark, table, rowTracking = true)
    assert(df.schema.fieldNames.toSeq ==
      Seq("id", "v", "_row_id", "_row_commit_version"))
    val q = df.writeStream.format("memory").queryName("rtstream")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    def got(): Map[Long, (Option[Long], Option[Long])] =
      spark.table("rtstream").collect().map(r =>
        r.getLong(0) -> ((if (r.isNullAt(2)) None else Some(r.getLong(2))),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    try {
      q.processAllAvailable()
      val snap = got()
      // snapshot: DML-preserved ids stream STABLE (materialized columns
      // override the rewritten file's fresh base+position)
      assert(snap(3L) == ((Some(0L), Some(updVer))), snap)
      assert(snap(4L) == ((Some(1L), Some(1L))), snap) // carried row keeps both
      assert(snap(0L)._1.isEmpty && snap(2L)._1.isEmpty, snap) // pre-feature
      // a per-commit add claims fresh ids past the watermark (the
      // UPDATE's rewrite claimed 2-3, so the next append starts at 4)
      DeltaLog.writeBatch(Seq((9L, "z")).toDF("id", "v").coalesce(1), table)
      view.sync()
      q.processAllAvailable()
      assert(got()(9L) == ((Some(4L), Some(updVer + 1))), got())
      // OPTIMIZE mid-stream (dataChange=false) re-emits nothing
      assert(DeltaLog.optimize(spark, table,
        smallFileBytes = Long.MaxValue).isDefined)
      view.sync()
      q.processAllAvailable()
      assert(got().size == 6, got())
    } finally { q.stop(); view.close() }
  }

  test("poller keeps a continuous stream current without manual sync") {
    import spark.implicits._
    val table = Files.createTempDirectory("delta_poll").toString
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v").coalesce(1), table)
    val (df, view) = DeltaStreamSource.open(spark, table, pollMs = Some(50))
    val q = df.writeStream.format("memory").queryName("dpoll")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      q.processAllAvailable()
      assert(spark.table("dpoll").count() == 1)
      DeltaLog.writeBatch(Seq((2L, "b")).toDF("id", "v").coalesce(1), table)
      // no manual sync: the poller must pick the commit up
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("dpoll").count() < 2 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(100)
      }
      assert(spark.table("dpoll").as[(Long, String)].collect().toSet ==
        Set((1L, "a"), (2L, "b")))
    } finally {
      q.stop()
      view.close()
    }
  }

  test("partitioned delta table streams with partition columns in declared order") {
    import spark.implicits._
    val table = Files.createTempDirectory("delta_stream_part").toString
    DeltaLog.writeBatch(
      Seq((1L, "web", "a"), (2L, "books", "b")).toDF("id", "src", "v"),
      table, partitionBy = Seq("src"))
    val (df, view) = DeltaStreamSource.open(spark, table)
    assert(df.schema.fieldNames.toSeq == Seq("id", "src", "v"))
    val q = df.writeStream.format("memory").queryName("dpart")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      q.processAllAvailable()
      assert(spark.table("dpart").as[(Long, String, String)].collect().toSet ==
        Set((1L, "web", "a"), (2L, "books", "b")))
      DeltaLog.writeBatch(Seq((3L, "web", "c")).toDF("id", "src", "v"), table,
        partitionBy = Seq("src"))
      view.sync()
      q.processAllAvailable()
      assert(spark.table("dpart").count() == 3)
    } finally {
      q.stop()
      view.close()
    }
  }

  test("SQL face: a streaming pipeline reads connector='delta' (snapshot + tail)") {
    import spark.implicits._
    val table = Files.createTempDirectory("delta_sql_stream").toString
    DeltaLog.writeBatch(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1), table)
    new Pipeline(spark, streaming = true).run(
      s"""CREATE TABLE src (id BIGINT, v TEXT) WITH (
         |  connector = 'delta', path = '$table', format = 'parquet', type = 'source');
         |CREATE TABLE out WITH (connector = 'memory', type = 'sink');
         |INSERT INTO out SELECT id, v FROM src WHERE id <> 2""".stripMargin)
    val got = spark.table("out_result").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (3L, "c")), s"got $got")
    // version_as_of is a snapshot-only option — rejected in streaming mode
    val err = intercept[RuntimeException] {
      new Pipeline(spark, streaming = true).run(
        s"""CREATE TABLE src (id BIGINT, v TEXT) WITH (
           |  connector = 'delta', path = '$table', format = 'parquet',
           |  type = 'source', version_as_of = '0');
           |CREATE TABLE out2 WITH (connector = 'memory', type = 'sink');
           |INSERT INTO out2 SELECT id, v FROM src""".stripMargin)
    }
    assert(err.getMessage.contains("version_as_of"))
  }

  test("bulk link at high file count takes the parallel path, exactly once per file (r10)") {
    import spark.implicits._
    // >256 files (the sequential cutoff) — exercises SpoolLink's pool
    val table = Files.createTempDirectory("delta_bulk").toString
    DeltaLog.writeBatch((0 until 1200).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v").repartition(300), table)
    val active = DeltaLog.snapshot(spark, table).get.files.size
    assert(active >= 256, s"need enough part files for the parallel path ($active)")
    val (df, view) = DeltaStreamSource.open(spark, table)
    try {
      val q = df.writeStream.format("memory").queryName("bulk_stream")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // every row exactly once through the parallel initial link
      assert(spark.table("bulk_stream").as[(Long, String)].collect().toSet ==
        (0 until 1200).map(i => (i.toLong, s"v$i")).toSet)
      // re-sync links nothing new (link-first + exists-catch is idempotent)
      assert(view.sync() == 0)
    } finally view.close()
  }

  test("run() closes streaming table views: poller threads and link dirs die with the run (r10)") {
    import spark.implicits._
    val tmp = Paths.get(System.getProperty("java.io.tmpdir"))
    def viewDirs: Set[String] = {
      val s = Files.list(tmp)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("graft-delta-view") || n.startsWith("graft-iceberg-view"))
        .toSet
      finally s.close()
    }
    def pollers: Set[Thread] = Thread.getAllStackTraces.keySet.asScala
      .filter(t => t.getName.startsWith("graft-delta-poll") ||
        t.getName.startsWith("graft-iceberg-poll")).toSet
    val dirsBefore = viewDirs
    val dTable = Files.createTempDirectory("delta_view_lc").toString
    DeltaLog.writeBatch(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), dTable)
    new Pipeline(spark, streaming = true).run(
      s"""CREATE TABLE src (id BIGINT, v TEXT) WITH (
         |  connector = 'delta', path = '$dTable', format = 'parquet', type = 'source');
         |CREATE TABLE lc_out WITH (connector = 'memory', type = 'sink');
         |INSERT INTO lc_out SELECT id, v FROM src""".stripMargin)
    val iTable = Files.createTempDirectory("iceberg_view_lc").toString
    graft.sinks.IcebergLog.writeBatch(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), iTable)
    new Pipeline(spark, streaming = true).run(
      s"""CREATE TABLE isrc (id BIGINT, v TEXT) WITH (
         |  connector = 'iceberg', path = '$iTable', format = 'parquet', type = 'source');
         |CREATE TABLE lc_iout WITH (connector = 'memory', type = 'sink');
         |INSERT INTO lc_iout SELECT id, v FROM isrc""".stripMargin)
    assert(spark.table("lc_out_result").count() == 2)
    assert(spark.table("lc_iout_result").count() == 2)
    // both runs are over: their view dirs are deleted and their pollers
    // interrupted (allow the interrupt a moment to land) — a long-lived
    // session must not accumulate one of each per streaming run
    val deadline = System.currentTimeMillis() + 10000
    while (pollers.exists(_.isAlive) && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(pollers.isEmpty, s"leaked pollers: ${pollers.map(_.getName)}")
    assert(viewDirs == dirsBefore,
      s"leaked view dirs: ${viewDirs.diff(dirsBefore)}")
  }
}
