package graft

import graft.sinks.{DeltaLog, IcebergLog}
import graft.sources.{DeltaStreamSource, IcebergStreamSource}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Copy-on-write DML (`DELETE FROM … WHERE` / `UPDATE … SET`) on both
  * wire-format table logs: only the files holding matching rows are
  * rewritten (stats-pruned, then row-verified), the swap lands as one
  * atomic version / overwrite snapshot, prior snapshots still time
  * travel, the ConcurrentAppend conflict rule aborts a commit that
  * would skip concurrently-added matching rows, and the streaming
  * sources refuse (or, with ignore_deletes, skip whole) the change
  * commits they cannot retract.
  */
class DmlSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def tmpTable(name: String): String =
    Files.createTempDirectory(name).toString

  private def logLines(table: String, version: Long): Seq[com.fasterxml.jackson.databind.JsonNode] =
    Files.readAllLines(Paths.get(table, "_delta_log", f"$version%020d.json"))
      .asScala.filter(_.nonEmpty).map(mapper.readTree).toSeq

  // ── delta ────────────────────────────────────────────────────────────

  test("delta DELETE rewrites only the touched files; untouched adds carry through byte-identically") {
    import spark.implicits._
    val table = tmpTable("delta_dml")
    DeltaLog.writeBatch((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), table)
    DeltaLog.writeBatch((101L to 200L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), table)
    val before = DeltaLog.snapshot(spark, table).get
    assert(before.adds.size == 2)
    // file 2 (ids 101-200) is stats-pruned out of the rewrite set
    val untouched = before.adds.find(_._2.stats.exists(_.contains("101"))).get
    val v = DeltaLog.deleteWhere(spark, table, "id <= 50")
    assert(v.contains(2L))
    val after = DeltaLog.snapshot(spark, table).get
    assert(after.adds.exists { case (p, info) =>
      p == untouched._1 && info.modificationTime == untouched._2.modificationTime },
      "the un-matching file must survive the delete untouched")
    assert(DeltaLog.read(spark, table).as[(Long, String)].collect().map(_._1).sorted
      .toSeq == (51L to 200L))
    // one atomic version: data-changing removes for the touched file only
    val removes = logLines(table, 2L).filter(_.has("remove")).map(_.get("remove"))
    assert(removes.size == 1 && removes.head.get("dataChange").asBoolean)
    // fresh adds carry stats (the rewrite keeps the skipping story alive)
    val adds = logLines(table, 2L).filter(_.has("add")).map(_.get("add"))
    assert(adds.nonEmpty && adds.forall(_.hasNonNull("stats")))
  }

  test("delta DELETE matching no rows commits nothing; full-table DELETE commits removes only") {
    import spark.implicits._
    val table = tmpTable("delta_dml_none")
    DeltaLog.writeBatch((1L to 10L).map(i => (i, i * 2)).toDF("id", "d").coalesce(1), table)
    assert(DeltaLog.deleteWhere(spark, table, "id > 999").isEmpty)
    assert(DeltaLog.snapshot(spark, table).get.version == 0L)
    assert(DeltaLog.deleteWhere(spark, table, "true").contains(1L))
    assert(DeltaLog.read(spark, table).count() == 0)
    val lines = logLines(table, 1L)
    assert(lines.count(_.has("remove")) == 1 && lines.count(_.has("add")) == 0,
      "a delete-everything version is removes-only (zero-row parts dropped)")
  }

  test("delta UPDATE applies casts to matched rows only and refreshes file stats for pruning") {
    import spark.implicits._
    val table = tmpTable("delta_upd")
    DeltaLog.writeBatch((1L to 20L).map(i => (i, 10L)).toDF("id", "score").coalesce(1), table)
    assert(DeltaLog.updateWhere(spark, table,
      Seq("score" -> "score + 90"), Some("id <= 5")).contains(1L))
    val rows = DeltaLog.read(spark, table).as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(rows(_) == 100L) && (6L to 20L).forall(rows(_) == 10L))
    // the rewritten file's stats reflect the new bounds: a filter beyond
    // them prunes to zero files
    assert(DeltaLog.planFiles(spark, table, scanFilter = Some("score > 200"))._1.isEmpty)
    assert(DeltaLog.planFiles(spark, table, scanFilter = Some("score = 100"))._1.nonEmpty)
    // unknown SET column / empty predicate are rejected loudly
    intercept[IllegalArgumentException] {
      DeltaLog.updateWhere(spark, table, Seq("nope" -> "1"), None) }
    intercept[IllegalArgumentException] {
      DeltaLog.deleteWhere(spark, table, "   ") }
  }

  test("delta UPDATE on a partition column migrates rows to their new hive directory") {
    import spark.implicits._
    val table = tmpTable("delta_upd_part")
    DeltaLog.writeBatch(
      Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "k"),
      table, partitionBy = Seq("k"))
    assert(DeltaLog.updateWhere(spark, table,
      Seq("k" -> "'c'"), Some("id = 1")).isDefined)
    val s = DeltaLog.snapshot(spark, table).get
    assert(s.adds.exists(_._2.partitionValues.toMap.get("k").contains("c")))
    assert(DeltaLog.read(spark, table, scanFilter = Some("k = 'c'"))
      .as[(Long, String)].collect().toSeq == Seq((1L, "c")))
    assert(DeltaLog.read(spark, table).count() == 3)
  }

  test("delta DML keeps the checkpoint cadence; iceberg DML compacts to a fresh two-manifest list instead") {
    import spark.implicits._
    val table = tmpTable("delta_dml_cp")
    DeltaLog.writeBatch((1L to 50L).map(i => (i, 0L)).toDF("id", "v").coalesce(1), table)
    // nine DML commits on top of the create: version 9 is the 10th
    // commit and must drop a parquet checkpoint exactly like appends do
    (1 to 9).foreach(i => assert(DeltaLog.updateWhere(spark, table,
      Seq("v" -> i.toString), Some(s"id = $i")).contains(i.toLong)))
    assert(Files.exists(Paths.get(table, "_delta_log",
      f"${9L}%020d.checkpoint.parquet")),
      "the 10th commit (version 9, a DML rewrite) must drop a checkpoint")
    // the checkpoint alone serves snapshots: age out every JSON commit
    // at-or-before it and re-read
    DeltaLog.clearSnapshotCache()
    (0L to 9L).foreach(v =>
      Files.deleteIfExists(Paths.get(table, "_delta_log", f"$v%020d.json")))
    val rows = DeltaLog.read(spark, table).as[(Long, Long)].collect().toMap
    assert(rows.size == 50)
    (1L to 9L).foreach(i => assert(rows(i) == i))
    // iceberg: no checkpoints — each DML overwrite snapshot writes a
    // FRESH survivors+added manifest list, so the list stays O(1) in the
    // number of DML commits rather than growing per commit
    val it = tmpTable("ice_dml_cp")
    IcebergLog.writeBatch((1L to 20L).map(i => (i, 0L)).toDF("id", "v").coalesce(1), it)
    (1 to 3).foreach(i => assert(IcebergLog.updateWhere(spark, it,
      Seq("v" -> i.toString), Some(s"id = $i")).isDefined))
    val m = IcebergLog.current(it).get
    assert(m.version == 4, "create + three DML snapshots")
    val list = IcebergLog.readManifestList(m.snapshots
      .find(_.get("snapshot-id").asLong == m.currentSnapshotId).get
      .get("manifest-list").asText)
    assert(list.size <= 2, s"DML manifest list must stay bounded, got ${list.size}")
  }

  test("delta ConcurrentAppend rule: a commit whose predicate MAY match a concurrently-added file aborts") {
    import spark.implicits._
    val table = tmpTable("delta_conflict")
    DeltaLog.writeBatch((1L to 10L).map(i => (i, "x")).toDF("id", "v").coalesce(1), table)
    val base = DeltaLog.snapshot(spark, table).get
    // concurrent append lands AFTER the (simulated) DML planning read
    DeltaLog.writeBatch(Seq((5L, "y")).toDF("id", "v").coalesce(1), table)
    val f1 = base.files.head
    // predicate overlapping the new file's [5,5] bounds → abort
    assert(DeltaLog.commit(spark, table, base.schema, Seq.empty, Seq.empty,
      txn = None, removed = Seq(f1), dataChange = true,
      conflict = Some((base.files.toSet, Some("id = 5")))).isEmpty)
    // disjoint predicate → lands
    assert(DeltaLog.commit(spark, table, base.schema, Seq.empty, Seq.empty,
      txn = None, removed = Seq(f1), dataChange = true,
      conflict = Some((base.files.toSet, Some("id = 999")))).isDefined)
    // the whole deleteWhere cycle converges by re-planning: rows added
    // before the call are all judged
    assert(DeltaLog.deleteWhere(spark, table, "id = 5").isDefined)
    assert(DeltaLog.read(spark, table).filter("id = 5").count() == 0)
  }

  test("delta streaming source fails loudly on a DML change commit; ignore_deletes skips it whole") {
    import spark.implicits._
    val table = tmpTable("delta_stream_dml")
    DeltaLog.writeBatch((1L to 10L).map(i => (i, "x")).toDF("id", "v").coalesce(1), table)
    val (_, view) = DeltaStreamSource.open(spark, table)
    try {
      DeltaLog.deleteWhere(spark, table, "id <= 3")
      val e = intercept[IllegalStateException](view.sync())
      assert(e.getMessage.contains("ignore_deletes"))
    } finally view.close()
    // ignore_deletes: the change commit is skipped WHOLE (linking its
    // rewritten adds would double-emit survivors); later appends flow
    val (_, view2) = DeltaStreamSource.open(spark, table, ignoreDeletes = true)
    try {
      DeltaLog.deleteWhere(spark, table, "id = 4")
      assert(view2.sync() == 0)
      DeltaLog.writeBatch(Seq((100L, "z")).toDF("id", "v").coalesce(1), table)
      assert(view2.sync() == 1)
    } finally view2.close()
  }

  // ── iceberg ──────────────────────────────────────────────────────────

  test("iceberg DELETE lands as ONE overwrite snapshot; untouched entries carry; prior snapshot time-travels") {
    import spark.implicits._
    val table = tmpTable("ice_dml")
    IcebergLog.writeBatch((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), table)
    IcebergLog.writeBatch((101L to 200L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), table)
    val preSid = IcebergLog.current(table).get.currentSnapshotId
    // the file holding ids 101-200 is metrics-pruned out of the rewrite set
    val candidates = IcebergLog.planFiles(spark, table, None, Some("id <= 50"))._1
      .map(_.path).toSet
    assert(candidates.size == 1)
    val untouchedPath = IcebergLog.entries(table, None).filter(_._1 != 2)
      .map(_._2).filterNot(candidates).head
    assert(IcebergLog.deleteWhere(spark, table, "id <= 50").isDefined)
    val m = IcebergLog.current(table).get
    val snap = m.snapshots.find(_.get("snapshot-id").asLong == m.currentSnapshotId).get
    assert(snap.get("summary").get("operation").asText == "overwrite")
    val liveNow = IcebergLog.entries(table, None).filter(_._1 != 2).map(_._2)
    assert(liveNow.contains(untouchedPath), "untouched file carried forward")
    assert(!liveNow.exists(candidates), "touched file replaced")
    assert(IcebergLog.read(spark, table).as[(Long, String)].collect().map(_._1)
      .sorted.toSeq == (51L to 200L))
    // time travel: the pre-delete snapshot still reads all 200 rows
    assert(IcebergLog.read(spark, table, snapshotId = Some(preSid)).count() == 200)
  }

  test("iceberg UPDATE applies to matched rows; partition-column update migrates directories") {
    import spark.implicits._
    val table = tmpTable("ice_upd")
    IcebergLog.writeBatch(
      Seq((1L, 10L, "a"), (2L, 10L, "a"), (3L, 10L, "b")).toDF("id", "score", "k"),
      table, partitionBy = Seq("k"))
    assert(IcebergLog.updateWhere(spark, table,
      Seq("score" -> "score * 5", "k" -> "'c'"), Some("id = 1")).isDefined)
    val rows = IcebergLog.read(spark, table)
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, 50L, "c"), (2L, 10L, "a"), (3L, 10L, "b")))
    // manifest carries the new partition value → partition pruning serves it
    val (kept, total) = IcebergLog.planFiles(spark, table, None, Some("k = 'c'"))
    assert(kept.size == 1 && total >= 2)
    assert(IcebergLog.deleteWhere(spark, table, "id > 999").isEmpty)
  }

  test("iceberg streaming source fails loudly on an overwrite snapshot; ignore_deletes skips it whole") {
    import spark.implicits._
    val table = tmpTable("ice_stream_dml")
    IcebergLog.writeBatch((1L to 10L).map(i => (i, "x")).toDF("id", "v").coalesce(1), table)
    val (_, view) = IcebergStreamSource.open(spark, table)
    try {
      IcebergLog.deleteWhere(spark, table, "id <= 3")
      val e = intercept[IllegalStateException](view.sync())
      assert(e.getMessage.contains("ignore_deletes"))
    } finally view.close()
    val (_, view2) = IcebergStreamSource.open(spark, table, ignoreDeletes = true)
    try {
      IcebergLog.deleteWhere(spark, table, "id = 4")
      assert(view2.sync() == 0)
      IcebergLog.writeBatch(Seq((100L, "z")).toDF("id", "v").coalesce(1), table)
      assert(view2.sync() == 1)
    } finally view2.close()
  }

  // ── SQL faces ────────────────────────────────────────────────────────

  test("DELETE FROM / UPDATE SQL verbs run against delta and iceberg tables; plan() only validates") {
    import spark.implicits._
    val dt = tmpTable("sql_dml_delta")
    val it = tmpTable("sql_dml_ice")
    DeltaLog.writeBatch((1L to 10L).map(i => (i, i * 10L)).toDF("id", "score").coalesce(1), dt)
    IcebergLog.writeBatch((1L to 10L).map(i => (i, i * 10L)).toDF("id", "score").coalesce(1), it)
    new sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE d (id BIGINT, score BIGINT) WITH (
         |  connector='delta', path='$dt', format='parquet', type='sink');
         |CREATE TABLE i (id BIGINT, score BIGINT) WITH (
         |  connector='iceberg', path='$it', format='parquet', type='sink');
         |DELETE FROM d WHERE id <= 4;
         |UPDATE d SET score = score + 1 WHERE id = 5;
         |DELETE FROM i WHERE id <= 4;
         |UPDATE i SET score = score + 1 WHERE id = 5;""".stripMargin)
    assert(DeltaLog.read(spark, dt).as[(Long, Long)].collect().toMap ==
      (5L to 10L).map(i => i -> (if (i == 5) 51L else i * 10L)).toMap)
    assert(IcebergLog.read(spark, it).as[(Long, Long)].collect().toMap ==
      (5L to 10L).map(i => i -> (if (i == 5) 51L else i * 10L)).toMap)
    // plan() validates without executing
    val n = DeltaLog.read(spark, dt).count()
    new sql.Pipeline(spark, streaming = false).plan(
      s"""CREATE TABLE d (id BIGINT, score BIGINT) WITH (
         |  connector='delta', path='$dt', format='parquet', type='sink');
         |DELETE FROM d;""".stripMargin)
    assert(DeltaLog.read(spark, dt).count() == n, "plan() must not run DML")
    // non-table-format connectors reject the verbs; unknown SET column
    // rejected at plan time
    assert(intercept[IllegalArgumentException] {
      new sql.Pipeline(spark, streaming = false).run(
        s"""CREATE TABLE x (id BIGINT) WITH (connector='blackhole', type='sink');
           |DELETE FROM x;""".stripMargin)
    }.getMessage.contains("delta"))
    assert(intercept[IllegalArgumentException] {
      new sql.Pipeline(spark, streaming = false).plan(
        s"""CREATE TABLE d (id BIGINT, score BIGINT) WITH (
           |  connector='delta', path='$dt', format='parquet', type='sink');
           |UPDATE d SET nope = 1;""".stripMargin)
    }.getMessage.contains("no column"))
    // the SET parser: quoted commas/WHERE-in-strings stay in the expr
    val stmt = sql.Ddl.parse("UPDATE t SET v = concat(v, ',where,') WHERE id = 1")
    stmt match {
      case sql.Ddl.Dml("update", "t", Some(w), sets) =>
        assert(w == "id = 1" && sets == Seq("v" -> "concat(v, ',where,')"))
      case other => fail(s"parsed $other")
    }
  }

  test("q_delta_dml / q_iceberg_dml inventory queries match their algebraic replay") {
    // the driver's DuckDB oracle replays the DML over the source parquet;
    // this local twin replays it in Spark so the inventory entries are
    // guarded without DuckDB
    val li = Tables.load(spark, sfDir, "lineitem")
    val expected = li.filter("NOT (l_quantity > 45)")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        queries.dsum(col("l_quantity")).as("sum_qty"),
        queries.dsum(expr(
          "CASE WHEN l_returnflag = 'R' THEN l_extendedprice * 2 ELSE l_extendedprice END"))
          .as("sum_price"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    Seq("q_delta_dml", "q_iceberg_dml").foreach { name =>
      val got = SparkEntry.queries(name)(spark, sfDir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toMap
      assert(got == expected, name)
    }
  }
}
