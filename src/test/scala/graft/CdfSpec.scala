package graft

import graft.sinks.{Cdf, DeltaLog, IcebergLog, Merge}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The change data feed (r11): with `delta.enableChangeDataFeed` set,
  * every DML verb records its change rows — `insert` / `delete` /
  * `update_preimage` / `update_postimage` — as `_change_data/` files +
  * `cdc` actions in the same commit (the public Delta CDF shape), and
  * [[DeltaLog.readChanges]] replays any version range. Iceberg derives
  * the same row shape from manifest diffs ([[IcebergLog.readChanges]]):
  * file-granularity delete+insert per overwrite snapshot, the public
  * changelog-scan semantics. This is what lets a downstream STREAM tail
  * an upserted table instead of hitting the refusal path.
  */
class CdfSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def tmpTable(name: String): String =
    Files.createTempDirectory(name).toString

  private val cdfConf = Map(Cdf.enableProp -> "true")

  private def changeCounts(df: org.apache.spark.sql.DataFrame): Map[(Long, String), Long] =
    df.groupBy(col(Cdf.commitVersionCol), col(Cdf.changeTypeCol)).count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

  test("delta DELETE/UPDATE record change rows as _change_data files + cdc actions") {
    import spark.implicits._
    val table = tmpTable("delta_cdf")
    DeltaLog.writeBatch((1L to 10L).map(i => (i, i * 10L)).toDF("id", "v").coalesce(1),
      table, tableConf = cdfConf)
    assert(DeltaLog.deleteWhere(spark, table, "id > 8").contains(1L))
    assert(DeltaLog.updateWhere(spark, table,
      Seq("v" -> "v + 1"), Some("id <= 2")).contains(2L))
    // protocol shape: cdc actions point under _change_data/, dataChange=false
    val v1 = Files.readAllLines(Paths.get(table, "_delta_log", f"${1L}%020d.json"))
      .asScala.filter(_.nonEmpty).map(mapper.readTree)
    val cdcActions = v1.filter(_.has("cdc"))
    assert(cdcActions.nonEmpty, "DML on a CDF table must write cdc actions")
    cdcActions.foreach { n =>
      assert(n.get("cdc").get("path").asText.startsWith(s"${Cdf.changeDataDir}/"))
      assert(!n.get("cdc").get("dataChange").asBoolean)
    }
    // v0 create reads back as inserts; v1 deletes; v2 update pre+post
    val counts = changeCounts(DeltaLog.readChanges(spark, table, 0L))
    assert(counts((0L, "insert")) == 10L)
    assert(counts((1L, "delete")) == 2L)
    assert(counts((2L, "update_preimage")) == 2L)
    assert(counts((2L, "update_postimage")) == 2L)
    // image content: the update pair carries old and new values per key
    val upd = DeltaLog.readChanges(spark, table, 2L, Some(2L))
      .select(col("id"), col("v"), col(Cdf.changeTypeCol))
      .as[(Long, Long, String)].collect().toSet
    assert(upd == Set((1L, 10L, "update_preimage"), (1L, 11L, "update_postimage"),
      (2L, 20L, "update_preimage"), (2L, 21L, "update_postimage")))
    // normal snapshot reads are unaffected by cdc actions
    assert(DeltaLog.read(spark, table).count() == 8)
    // bounded range excludes later versions
    assert(DeltaLog.readChanges(spark, table, 0L, Some(0L))
      .select(Cdf.changeTypeCol).distinct().as[String].collect().toSeq == Seq("insert"))
  }

  test("delta MERGE records delete / update pair / insert change rows; insert-only appends need no cdc") {
    import spark.implicits._
    val table = tmpTable("delta_cdf_merge")
    DeltaLog.writeBatch((1L to 6L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1),
      table, tableConf = cdfConf)
    val source = Seq((1L, "dead"), (2L, "n2"), (9L, "n9")).toDF("id", "v")
    val clauses = Merge.Clauses("t", "s", "t.id = s.id",
      Seq(
        Merge.MatchedClause(Some("s.v = 'dead'"), Right(())),
        Merge.MatchedClause(None, Left(Seq("v" -> "s.v")))),
      Some((None, Seq.empty)))
    assert(DeltaLog.merge(spark, table, source, clauses).contains(1L))
    val ch = DeltaLog.readChanges(spark, table, 1L, Some(1L))
      .select(col("id"), col("v"), col(Cdf.changeTypeCol))
      .as[(Long, String, String)].collect().toSet
    assert(ch == Set(
      (1L, "v1", "delete"),
      (2L, "v2", "update_preimage"), (2L, "n2", "update_postimage"),
      (9L, "n9", "insert")))
    // insert-only merge: a pure append commit, NO cdc actions (readers
    // map its dataChange adds to inserts) — and no files rewritten
    assert(DeltaLog.merge(spark, table,
      Seq((20L, "n20")).toDF("id", "v"),
      Merge.Clauses("t", "s", "t.id = s.id", Seq.empty,
        Some((None, Seq.empty)))).contains(2L))
    val v2 = Files.readAllLines(Paths.get(table, "_delta_log", f"${2L}%020d.json"))
      .asScala.filter(_.nonEmpty).map(mapper.readTree)
    assert(!v2.exists(_.has("cdc")) && !v2.exists(_.has("remove")))
    val counts = changeCounts(DeltaLog.readChanges(spark, table, 2L))
    assert(counts == Map((2L, "insert") -> 1L))
  }

  test("a pre-CDF change commit cannot be replayed: readChanges fails loudly, not silently short") {
    import spark.implicits._
    val table = tmpTable("delta_cdf_off")
    DeltaLog.writeBatch((1L to 5L).map(i => (i, i)).toDF("id", "v").coalesce(1), table)
    assert(DeltaLog.deleteWhere(spark, table, "id = 1").contains(1L)) // no CDF yet
    val e = intercept[RuntimeException] {
      DeltaLog.readChanges(spark, table, 0L).count() }
    assert(e.getMessage.contains(Cdf.enableProp))
    // enabling CDF later is a metaData commit; DML after it replays fine
    DeltaLog.writeBatch(Seq((6L, 6L)).toDF("id", "v"), table, tableConf = cdfConf)
    assert(DeltaLog.snapshot(spark, table).exists(s => Cdf.isEnabled(s.configuration)))
    assert(DeltaLog.deleteWhere(spark, table, "id = 2").contains(3L))
    val counts = changeCounts(DeltaLog.readChanges(spark, table, 2L))
    assert(counts((2L, "insert")) == 1L && counts((3L, "delete")) == 1L)
  }

  test("iceberg readChanges: manifest-diff changelog — append→insert, overwrite→delete+insert, replace→nothing") {
    import spark.implicits._
    val table = tmpTable("ice_cdf")
    IcebergLog.writeBatch((1L to 6L).map(i => (i, i * 10L)).toDF("id", "v").coalesce(1), table) // seq 1
    IcebergLog.writeBatch(Seq((7L, 70L)).toDF("id", "v").coalesce(1), table) // seq 2
    assert(IcebergLog.rewriteDataFiles(spark, table, smallBytes = Some(1L << 20)).isDefined) // seq 3 replace
    assert(IcebergLog.deleteWhere(spark, table, "id = 3").isDefined) // seq 4 overwrite
    val ch = IcebergLog.readChanges(spark, table, 1L)
      .select(col("id"), col("v"), col(Cdf.changeTypeCol), col(Cdf.commitVersionCol))
      .as[(Long, Long, String, Long)].collect()
    val bySeq = ch.groupBy(_._4)
    assert(bySeq(1L).forall(_._3 == "insert") && bySeq(1L).length == 6)
    assert(bySeq(2L).toSet == Set((7L, 70L, "insert", 2L)))
    assert(!bySeq.contains(3L), "replace (OPTIMIZE) emits nothing")
    // overwrite at file granularity: the rewritten file's 7 rows retract,
    // its 6 survivors re-insert; carried-through pairs cancel downstream
    val dels = bySeq(4L).filter(_._3 == "delete").map(r => (r._1, r._2)).toSet
    val ins = bySeq(4L).filter(_._3 == "insert").map(r => (r._1, r._2)).toSet
    assert(dels -- ins == Set((3L, 30L)), "the net change is the deleted row")
    assert(ins.subsetOf(dels), "re-inserted survivors all appeared in the retracts")
    // expired snapshots refuse loudly
    IcebergLog.expireSnapshots(spark, table, olderThanMs = -1000)
    val e = intercept[IllegalArgumentException] {
      IcebergLog.readChanges(spark, table, 1L) }
    assert(e.getMessage.contains("expired"))
  }

  test("the chain: upsert sink → delta change-feed stream → downstream upsert mirror converges") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val src = tmpTable("cdf_chain_src")
    val mirror = tmpTable("cdf_chain_mirror")
    DeltaLog.writeBatch((1L to 8L).map(i => (i, i * 10L)).toDF("id", "v").coalesce(1),
      src, tableConf = cdfConf)
    val (df, view) = graft.sources.DeltaStreamSource.open(spark, src,
      changeFeed = true, keys = Seq("id"))
    // the stream frame is payload + _updating_meta — exactly what the
    // merge_keys upsert sink consumes (netBatch nets it per key)
    val q = df.writeStream
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => {
        if (!b.isEmpty) Merge.upsertBatch(spark, "delta", mirror, b.toDF(), Seq("id"))
      })
      .trigger(Trigger.ProcessingTime(100)).start()
    def mirrorRows: Map[Long, Long] =
      DeltaLog.read(spark, mirror).as[(Long, Long)].collect().toMap
    try {
      q.processAllAvailable()
      assert(mirrorRows == (1L to 8L).map(i => i -> i * 10L).toMap,
        "initial snapshot lands as inserts")
      // an update + a delete + a merge (update/insert) on the source
      assert(DeltaLog.updateWhere(spark, src,
        Seq("v" -> "v + 1"), Some("id <= 2")).isDefined)
      assert(DeltaLog.deleteWhere(spark, src, "id >= 7").isDefined)
      assert(DeltaLog.merge(spark, src,
        Seq((3L, 999L), (20L, 2000L)).toDF("id", "v"),
        Merge.Clauses("t", "s", "t.id = s.id",
          Seq(Merge.MatchedClause(None, Left(Seq("v" -> "s.v")))),
          Some((None, Seq.empty)))).isDefined)
      view.sync()
      q.processAllAvailable()
      val want = DeltaLog.read(spark, src).as[(Long, Long)].collect().toMap
      assert(want == Map(1L -> 11L, 2L -> 21L, 3L -> 999L, 4L -> 40L,
        5L -> 50L, 6L -> 60L, 20L -> 2000L))
      assert(mirrorRows == want, "the mirror table converges to the source")
    } finally {
      q.stop()
      view.close()
    }
  }

  test("the chain on iceberg: upsert sink → change-feed stream → mirror (file-granularity diffs cancel)") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val src = tmpTable("ice_cdf_chain_src")
    val mirror = tmpTable("ice_cdf_chain_mirror")
    // bootstrap via the upsert sink itself
    Merge.upsertBatch(spark, "iceberg", src,
      (1L to 6L).map(i => (i, i * 10L)).toDF("id", "v"), Seq("id"))
    val (df, view) = graft.sources.IcebergStreamSource.open(spark, src,
      changeFeed = true, keys = Seq("id"))
    val q = df.writeStream
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => {
        if (!b.isEmpty) Merge.upsertBatch(spark, "iceberg", mirror, b.toDF(), Seq("id"))
      })
      .trigger(Trigger.ProcessingTime(100)).start()
    def mirrorRows: Map[Long, Long] =
      IcebergLog.read(spark, mirror).as[(Long, Long)].collect().toMap
    try {
      q.processAllAvailable()
      assert(mirrorRows.keySet == (1L to 6L).toSet)
      // a CDC batch (update 2 keys, insert 1) + a DELETE — each an
      // overwrite snapshot; the stream emits the file-granularity diffs
      // whose carried-through pairs cancel in netBatch
      Merge.upsertBatch(spark, "iceberg", src,
        Seq((1L, 11L), (2L, 21L), (9L, 90L)).toDF("id", "v"), Seq("id"))
      assert(IcebergLog.deleteWhere(spark, src, "id = 6").isDefined)
      view.sync()
      q.processAllAvailable()
      val want = IcebergLog.read(spark, src).as[(Long, Long)].collect().toMap
      assert(want == Map(1L -> 11L, 2L -> 21L, 3L -> 30L, 4L -> 40L,
        5L -> 50L, 9L -> 90L))
      assert(mirrorRows == want, "the mirror table converges to the source")
    } finally {
      q.stop()
      view.close()
    }
  }

  test("iceberg change-feed view RAW-LINKS pure appends until the first retraction") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val src = tmpTable("ice_cdf_link_src")
    val mirror = tmpTable("ice_cdf_link_mirror")
    IcebergLog.writeBatch(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), src)
    val (df, view) = graft.sources.IcebergStreamSource.open(spark, src,
      changeFeed = true, keys = Seq("id"))
    val q = df.writeStream
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => {
        if (!b.isEmpty) Merge.upsertBatch(spark, "iceberg", mirror, b.toDF(), Seq("id"))
      })
      .trigger(Trigger.ProcessingTime(100)).start()
    def mirrorRows: Map[Long, Long] =
      IcebergLog.read(spark, mirror).as[(Long, Long)].collect().toMap
    def viewFiles: Set[String] = {
      val s = java.nio.file.Files.walk(view.dir.resolve("data"))
      try s.iterator().asScala.filter(p =>
        p.getFileName.toString.endsWith(".parquet"))
        .map(_.getFileName.toString).toSet
      finally s.close()
    }
    def tableFiles: Set[String] =
      IcebergLog.liveFiles(src, None).filter(_.status != 2)
        .map(f => f.path.substring(f.path.lastIndexOf('/') + 1)).toSet
    try {
      q.processAllAvailable()
      assert(mirrorRows == Map(1L -> 10L, 2L -> 20L))
      // a pure append into the retraction-free stream: RAW hard links
      // (zero copy) — every view file IS a table data file by name
      IcebergLog.writeBatch(Seq((3L, 30L)).toDF("id", "v"), src)
      view.sync()
      q.processAllAvailable()
      assert(viewFiles.subsetOf(tableFiles),
        s"append must raw-link, not materialize: ${viewFiles -- tableFiles}")
      assert(mirrorRows == Map(1L -> 10L, 2L -> 20L, 3L -> 30L))
      // first retraction → the view flips to materialization for good
      assert(IcebergLog.deleteWhere(spark, src, "id = 2").isDefined)
      view.sync()
      q.processAllAvailable()
      assert(mirrorRows == Map(1L -> 10L, 3L -> 30L), s"got $mirrorRows")
      // an append AFTER the delete RE-INSERTS a retracted key: must
      // materialize with a real _change_seq (a raw link's null seq
      // would net BEFORE the retract and resurrect the delete)
      IcebergLog.writeBatch(Seq((2L, 22L)).toDF("id", "v"), src)
      view.sync()
      q.processAllAvailable()
      val materialized = viewFiles -- tableFiles
      assert(materialized.exists(_.startsWith("cdf-")),
        s"post-retraction append must materialize; view files: $viewFiles")
      assert(mirrorRows == Map(1L -> 10L, 2L -> 22L, 3L -> 30L), s"got $mirrorRows")
    } finally {
      q.stop()
      view.close()
    }
  }

  test("change feed drives a retraction-aware aggregate: per-key sums follow updates and deletes") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val src = tmpTable("cdf_agg_src")
    DeltaLog.writeBatch(
      Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 40.0))
        .toDF("id", "grp", "v").coalesce(1),
      src, tableConf = cdfConf)
    val (df, view) = graft.sources.DeltaStreamSource.open(spark, src,
      changeFeed = true, keys = Seq("id"))
    val child = df.select(col("grp").as("__k_0"),
      col("v").cast("double").as("__v_0"),
      col("_updating_meta.is_retract").as("__r"))
    val updates = graft.streaming.UpdatingSql.updatingAggRows(child,
      numKeys = 1, kinds = Seq(graft.streaming.UpdatingSql.KSum), ttl = None)
    val q = updates.writeStream.format("memory").queryName("cdf_agg")
      .outputMode("update").trigger(Trigger.ProcessingTime(100)).start()
    def events: Set[(String, Double, Boolean)] =
      spark.table("cdf_agg")
        .select(col("__k_0"), col("__a_0"), col("_updating_meta.is_retract"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2))).toSet
    try {
      q.processAllAvailable()
      assert(events == Set(("a", 30.0, false), ("b", 70.0, false)),
        "initial snapshot aggregates as inserts")
      assert(DeltaLog.updateWhere(spark, src,
        Seq("v" -> "v + 5"), Some("id = 1")).isDefined)
      assert(DeltaLog.deleteWhere(spark, src, "id = 3").isDefined)
      view.sync()
      q.processAllAvailable()
      // the update retracts a's 30 → 35; the delete retracts b's 70 → 40
      assert(events == Set(
        ("a", 30.0, false), ("a", 30.0, true), ("a", 35.0, false),
        ("b", 70.0, false), ("b", 70.0, true), ("b", 40.0, false)),
        s"got $events")
    } finally {
      q.stop()
      view.close()
    }
  }

  test("SQL face: change_feed source feeds an updating aggregate into a merge_keys sink") {
    import spark.implicits._
    val src = tmpTable("cdf_sql_src")
    val out = tmpTable("cdf_sql_out") + "/t"
    val cp = tmpTable("cdf_sql_cp")
    // a table with DML history — the current snapshot is what streams
    DeltaLog.writeBatch(
      Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
        .toDF("id", "grp", "v").coalesce(1),
      src, tableConf = cdfConf)
    DeltaLog.updateWhere(spark, src, Seq("v" -> "v * 2"), Some("grp = 'a'"))
    DeltaLog.deleteWhere(spark, src, "id = 3")
    new graft.sql.Pipeline(spark, streaming = true).run(
      s"""CREATE TABLE cdc (id BIGINT, grp TEXT, v DOUBLE) WITH (
         |  connector='delta', path='$src', format='parquet', type='source',
         |  change_feed='true', merge_keys='id');
         |CREATE TABLE agg (grp TEXT, n BIGINT, total DOUBLE) WITH (
         |  connector='delta', path='$out', format='parquet', type='sink',
         |  merge_keys='grp', checkpoint='$cp');
         |INSERT INTO agg SELECT grp, count(*), sum(v) FROM cdc GROUP BY grp""".stripMargin)
    val rows = DeltaLog.read(spark, out).as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows == Map("a" -> ((2L, 60.0))), s"got $rows")
  }

  test("change-feed stream on a table WITHOUT the property fails loudly at the change commit") {
    import spark.implicits._
    val src = tmpTable("cdf_stream_off")
    DeltaLog.writeBatch(Seq((1L, 10L)).toDF("id", "v").coalesce(1), src) // no CDF
    val (df, view) = graft.sources.DeltaStreamSource.open(spark, src,
      changeFeed = true, keys = Seq("id"))
    val q = df.writeStream.format("memory").queryName("cdf_off")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(DeltaLog.deleteWhere(spark, src, "id = 1").isDefined)
      val e = intercept[IllegalStateException] { view.sync() }
      assert(e.getMessage.contains(Cdf.enableProp))
      // appends still flow on a CDF-less table (pure inserts)
    } finally {
      q.stop()
      view.close()
    }
    // and change_feed + ignore_deletes refuse together
    intercept[IllegalArgumentException] {
      graft.sources.DeltaStreamSource.open(spark, src,
        changeFeed = true, ignoreDeletes = true)
    }
  }

  test("netBatch orders by meta.seq when present: reversed arrival order still nets correctly") {
    import spark.implicits._
    def meta(r: Boolean, id: String, seq: Option[Long]) = (r, id, seq)
    // arrival order is ADVERSARIAL (appends before their retracts —
    // what size-ordered file-split packing can produce); seq carries
    // the true commit order
    val rows = Seq(
      // key A: update pair arrives post-image FIRST
      (("a", 20L), meta(r = false, "A", Some(7L))), // update_postimage, commit 3
      (("a", 10L), meta(r = true, "A", Some(6L))),  // update_preimage, commit 3
      // key B: re-insert (commit 5) arrives BEFORE its delete (commit 4)
      (("b", 99L), meta(r = false, "B", Some(11L))),
      (("b", 90L), meta(r = true, "B", Some(8L))),
      // key C: initial-snapshot insert (null seq = first) then deleted —
      // create…retract within one batch nets to NOTHING (a downstream
      // mirror never needs to see the key); the delete arriving FIRST
      // would instead have wrongly netted to a live insert without seq
      (("c", 1L), meta(r = true, "C", Some(9L))),
      (("c", 1L), meta(r = false, "C", None)))
    val df = rows.toDF("p", "m").select(
      col("p._1").as("k"), col("p._2").as("v"),
      struct(col("m._1").as("is_retract"), col("m._2").as("id"),
        col("m._3").as("seq")).as("_updating_meta"))
    val net = graft.streaming.Debezium.netBatch(df)
      .select(col("k"), col("v"), col("__graft_deleted"))
      .as[(String, Long, Boolean)].collect().toSet
    assert(net == Set(
      ("a", 20L, false),   // pre(6) then post(7) → update to 20
      ("b", 99L, false)),  // delete(8) then re-insert(11) → lives at 99
      s"got $net")         // c: create…retract → net no-op, dropped
  }

  test("ALTER TABLE SET TBLPROPERTIES enables the change feed on an existing table from SQL") {
    import spark.implicits._
    val table = tmpTable("cdf_alter_props")
    DeltaLog.writeBatch(Seq((1L, 10L), (2L, 20L)).toDF("id", "v").coalesce(1), table)
    new graft.sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE t (id BIGINT, v BIGINT) WITH (
         |  connector='delta', path='$table', format='parquet', type='sink');
         |ALTER TABLE t SET TBLPROPERTIES ('${Cdf.enableProp}' = 'true');
         |DELETE FROM t WHERE id = 2;""".stripMargin)
    assert(DeltaLog.snapshot(spark, table).exists(s => Cdf.isEnabled(s.configuration)))
    val counts = changeCounts(DeltaLog.readChanges(spark, table, 1L))
    assert(counts == Map((2L, "delete") -> 1L), s"got $counts")
    // non-delta tables refuse
    assert(intercept[IllegalArgumentException] {
      new graft.sql.Pipeline(spark, streaming = false).plan(
        s"""CREATE TABLE x (id BIGINT) WITH (connector='blackhole', type='sink');
           |ALTER TABLE x SET TBLPROPERTIES ('a' = 'b');""".stripMargin)
    }.getMessage.contains("delta"))
  }

  test("batch SQL change reads: changes_from_version on delta and iceberg source tables") {
    import spark.implicits._
    val dt = tmpTable("cdf_sql_batch_d")
    val it = tmpTable("cdf_sql_batch_i")
    DeltaLog.writeBatch((1L to 4L).map(i => (i, i * 10L)).toDF("id", "v").coalesce(1),
      dt, tableConf = cdfConf)
    DeltaLog.deleteWhere(spark, dt, "id = 4")
    DeltaLog.updateWhere(spark, dt, Seq("v" -> "v + 1"), Some("id = 1"))
    IcebergLog.writeBatch((1L to 4L).map(i => (i, i * 10L)).toDF("id", "v").coalesce(1), it)
    IcebergLog.deleteWhere(spark, it, "id = 4")
    val got = new graft.sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE dchg (id BIGINT, v BIGINT) WITH (
         |  connector='delta', path='$dt', format='parquet', type='source',
         |  changes_from_version='1', changes_to_version='2');
         |SELECT _change_type, count(*) AS n FROM dchg GROUP BY 1""".stripMargin).get
      .as[(String, Long)].collect().toMap
    assert(got == Map("delete" -> 1L, "update_preimage" -> 1L,
      "update_postimage" -> 1L), s"got $got")
    val gotI = new graft.sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE ichg (id BIGINT, v BIGINT) WITH (
         |  connector='iceberg', path='$it', format='parquet', type='source',
         |  changes_from_version='2');
         |SELECT id, _change_type FROM ichg""".stripMargin).get
      .as[(Long, String)].collect().toSet
    // file-granularity: the touched file's 4 rows retract, 3 survivors re-insert
    assert(gotI.filter(_._2 == "delete").map(_._1) == Set(1L, 2L, 3L, 4L))
    assert(gotI.filter(_._2 == "insert").map(_._1) == Set(1L, 2L, 3L))
    // batch-only on a streaming source
    assert(intercept[Exception] {
      new graft.sql.Pipeline(spark, streaming = true).plan(
        s"""CREATE TABLE s (id BIGINT, v BIGINT) WITH (
           |  connector='delta', path='$dt', format='parquet', type='source',
           |  changes_from_version='0');
           |CREATE TABLE out (id BIGINT, v BIGINT) WITH (connector='blackhole', type='sink');
           |INSERT INTO out SELECT * FROM s""".stripMargin)
    }.getMessage.contains("batch"))
  }

  test("starting_version replays a change-feed stream from table history") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val table = tmpTable("cdf_startver")
    DeltaLog.writeBatch((1L to 3L).map(i => (i, i * 10L)).toDF("id", "v").coalesce(1),
      table, tableConf = cdfConf)
    assert(DeltaLog.updateWhere(spark, table, Seq("v" -> "v + 1"), Some("id = 2")).isDefined)
    assert(DeltaLog.deleteWhere(spark, table, "id = 3").isDefined)
    // replay EVERYTHING from version 0 — the v0 inserts arrive as
    // inserts, then the update pair and the delete, in commit order
    val (df, view) = graft.sources.DeltaStreamSource.open(spark, table,
      changeFeed = true, keys = Seq("id"), startingVersion = Some(0L))
    val q = df.writeStream.format("memory").queryName("cdf_startver")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      q.processAllAvailable()
      val evs = spark.table("cdf_startver")
        .select(col("id"), col("v"), col("_updating_meta.is_retract"),
          col("_updating_meta.seq"))
        .as[(Long, Long, Boolean, Option[Long])].collect().toSet
      // v0 is a PURE APPEND into a (then) retraction-free stream: it
      // raw-links (r14), so its rows carry null seq — the "always
      // first" slot, which is exactly commit order here (the
      // retractions at seqs 2/4 net after it)
      assert(evs == Set(
        (1L, 10L, false, None), (2L, 20L, false, None),
        (3L, 30L, false, None),
        (2L, 20L, true, Some(2L)), (2L, 21L, false, Some(3L)),
        (3L, 30L, true, Some(4L))), s"got $evs")
    } finally {
      q.stop()
      view.close()
    }
  }

  test("change_feed on an upsert sink upgrades an EXISTING table, not just bootstraps") {
    import spark.implicits._
    val table = tmpTable("cdf_upgrade")
    // table created WITHOUT the property (e.g. by an older pipeline)
    Merge.upsertBatch(spark, "delta", table,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), Seq("id"))
    assert(!DeltaLog.snapshot(spark, table).exists(s => Cdf.isEnabled(s.configuration)))
    // the first batch through a change_feed-enabled sink lands the
    // property as a metaData-only commit BEFORE its merge, so the merge
    // itself already records change rows
    Merge.upsertBatch(spark, "delta", table,
      Seq((1L, 11L), (3L, 30L)).toDF("id", "v"), Seq("id"),
      tableConf = cdfConf)
    assert(DeltaLog.snapshot(spark, table).exists(s => Cdf.isEnabled(s.configuration)))
    val fromEnable = DeltaLog.snapshot(spark, table).get.version - 1
    val counts = changeCounts(DeltaLog.readChanges(spark, table, fromEnable))
    assert(counts((fromEnable + 1, "update_preimage")) == 1L)
    assert(counts((fromEnable + 1, "update_postimage")) == 1L)
    assert(counts((fromEnable + 1, "insert")) == 1L)
  }

  test("persistent view: a RESTARTED checkpointed query resumes without re-emitting the snapshot") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val table = tmpTable("delta_pview_src")
    val vdir = Paths.get(tmpTable("delta_pview_dir"), "view")
    val out = tmpTable("delta_pview_out")
    val cp = tmpTable("delta_pview_cp")
    DeltaLog.writeBatch((1L to 5L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), table)
    def runOnce(): Unit = {
      val (df, view) = graft.sources.DeltaStreamSource.open(spark, table,
        viewDir = Some(vdir))
      val q = df.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally { q.stop(); view.close() }
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 5)
    assert(Files.exists(vdir), "persistent view survives close")
    // appends + an OPTIMIZE while the query is DOWN
    DeltaLog.writeBatch(Seq((6L, "v6")).toDF("id", "v").coalesce(1), table)
    assert(DeltaLog.optimize(spark, table).isDefined)
    DeltaLog.writeBatch(Seq((7L, "v7")).toDF("id", "v").coalesce(1), table)
    runOnce()
    val rows = spark.read.parquet(out).as[(Long, String)].collect().toSeq
    assert(rows.size == 7, s"restart must emit ONLY the new rows, got ${rows.size}")
    assert(rows.toSet == (1L to 7L).map(i => (i, s"v$i")).toSet)
  }

  test("persistent CHANGE-FEED view: restart replays only new change commits; crash-replay is name-idempotent") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val table = tmpTable("ice_pview_src")
    val vdir = Paths.get(tmpTable("ice_pview_dir"), "view")
    val mirror = tmpTable("ice_pview_mirror")
    val cp = tmpTable("ice_pview_cp")
    IcebergLog.writeBatch((1L to 4L).map(i => (i, i * 10L)).toDF("id", "v").coalesce(1), table)
    def runOnce(): Unit = {
      val (df, view) = graft.sources.IcebergStreamSource.open(spark, table,
        changeFeed = true, keys = Seq("id"), viewDir = Some(vdir))
      val q = df.writeStream
        .option("checkpointLocation", cp)
        .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => {
          if (!b.isEmpty) Merge.upsertBatch(spark, "iceberg", mirror, b.toDF(), Seq("id"))
        })
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally { q.stop(); view.close() }
    }
    runOnce()
    def mirrorRows = IcebergLog.read(spark, mirror).as[(Long, Long)].collect().toMap
    assert(mirrorRows.keySet == (1L to 4L).toSet)
    // DML while the query is down: update + delete land as overwrites
    Merge.upsertBatch(spark, "iceberg", table,
      Seq((1L, 11L), (9L, 90L)).toDF("id", "v"), Seq("id"))
    assert(IcebergLog.deleteWhere(spark, table, "id = 4").isDefined)
    runOnce()
    val want = IcebergLog.read(spark, table).as[(Long, Long)].collect().toMap
    assert(want == Map(1L -> 11L, 2L -> 20L, 3L -> 30L, 9L -> 90L))
    assert(mirrorRows == want, "restarted change-feed stream converges the mirror")
    // crash-replay idempotence: roll the state file back one snapshot
    // and REOPEN — resuming re-materializes the last (already-applied)
    // snapshot, whose deterministic cdf-<seq> names hit
    // FileAlreadyExists → the view gains NO files, the checkpointed
    // query re-emits nothing
    def viewParquet: Int = {
      val s = Files.walk(vdir)
      try s.iterator().asScala.count(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      finally s.close()
    }
    val before = viewParquet
    val m = IcebergLog.current(table).get
    Files.write(vdir.resolve(".graft-view-state"),
      (m.lastSeq - 1).toString.getBytes("UTF-8"))
    val (_, view3) = graft.sources.IcebergStreamSource.open(spark, table,
      changeFeed = true, keys = Seq("id"), viewDir = Some(vdir))
    try assert(viewParquet == before,
      "replaying an applied snapshot must add no files (idempotent names)")
    finally view3.close()
  }

  test("schema evolution under a running stream fails loudly; a restarted view picks it up") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val table = tmpTable("cdf_schema_guard")
    val vdir = Paths.get(tmpTable("cdf_schema_guard_dir"), "view")
    DeltaLog.writeBatch(Seq((1L, 10L)).toDF("id", "v").coalesce(1), table,
      tableConf = cdfConf)
    val (df, view) = graft.sources.DeltaStreamSource.open(spark, table,
      changeFeed = true, keys = Seq("id"), viewDir = Some(vdir))
    val q = df.writeStream.format("memory").queryName("cdf_guard")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      q.processAllAvailable()
      // the stream's schema is pinned per query: evolving beneath it
      // would silently hide the new column, so sync refuses
      DeltaLog.addColumns(spark, table,
        Seq("note" -> org.apache.spark.sql.types.StringType))
      val e = intercept[IllegalStateException] { view.sync() }
      assert(e.getMessage.contains("schema changed"))
    } finally {
      q.stop()
      view.close()
    }
    // a REOPENED view resumes across the evolution: the new frame
    // carries the evolved column and new commits flow
    DeltaLog.writeBatch(Seq((2L, 20L, "hi")).toDF("id", "v", "note").coalesce(1),
      table, mergeSchema = true)
    val (df2, view2) = graft.sources.DeltaStreamSource.open(spark, table,
      changeFeed = true, keys = Seq("id"), viewDir = Some(vdir))
    val q2 = df2.writeStream.format("memory").queryName("cdf_guard2")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      q2.processAllAvailable()
      assert(df2.schema.fieldNames.contains("note"))
      val rows = spark.table("cdf_guard2")
        .select(col("id"), col("note")).as[(Long, Option[String])]
        .collect().toSet
      assert(rows.contains((2L, Some("hi"))), s"got $rows")
    } finally {
      q2.stop()
      view2.close()
    }
  }

  test("iceberg: schema evolution under a running stream fails loudly; a reopened view resumes across it") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val table = tmpTable("ice_cdf_schema_guard")
    val vdir = Paths.get(tmpTable("ice_cdf_schema_guard_dir"), "view")
    Merge.upsertBatch(spark, "iceberg", table,
      Seq((1L, 10L)).toDF("id", "v"), Seq("id"))
    val (df, view) = graft.sources.IcebergStreamSource.open(spark, table,
      changeFeed = true, keys = Seq("id"), viewDir = Some(vdir))
    val q = df.writeStream.format("memory").queryName("ice_cdf_guard")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      q.processAllAvailable()
      IcebergLog.addColumns(spark, table,
        Seq("note" -> org.apache.spark.sql.types.StringType))
      val e = intercept[IllegalStateException] { view.sync() }
      assert(e.getMessage.contains("schema changed"))
    } finally {
      q.stop()
      view.close()
    }
    // a REOPENED persistent view resumes ACROSS the evolution: the new
    // frame carries the evolved column and new commits flow
    IcebergLog.writeBatch(Seq((2L, 20L, "hi")).toDF("id", "v", "note").coalesce(1),
      table, mergeSchema = true)
    val (df2, view2) = graft.sources.IcebergStreamSource.open(spark, table,
      changeFeed = true, keys = Seq("id"), viewDir = Some(vdir))
    val q2 = df2.writeStream.format("memory").queryName("ice_cdf_guard2")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      q2.processAllAvailable()
      assert(df2.schema.fieldNames.contains("note"))
      val rows = spark.table("ice_cdf_guard2")
        .select(col("id"), col("note")).as[(Long, Option[String])]
        .collect().toSet
      assert(rows.contains((2L, Some("hi"))), s"got $rows")
    } finally {
      q2.stop()
      view2.close()
    }
  }

  test("CDF on a PARTITIONED delta table: change files keep hive partition values") {
    import spark.implicits._
    val table = tmpTable("delta_cdf_part")
    DeltaLog.writeBatch(
      (1L to 8L).map(i => (i, if (i % 2 == 0) "even" else "odd")).toDF("id", "p"),
      table, partitionBy = Seq("p"), tableConf = cdfConf)
    assert(DeltaLog.deleteWhere(spark, table, "id >= 7").isDefined)
    val ch = DeltaLog.readChanges(spark, table, 1L)
      .select(col("id"), col("p"), col(Cdf.changeTypeCol))
      .as[(Long, String, String)].collect().toSet
    assert(ch == Set((7L, "odd", "delete"), (8L, "even", "delete")),
      "partition values must survive into the change rows")
  }

  test("materializeInto unpersists and removes its scratch dir when the write fails") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("cdf_mat_fail")
    val boom = org.apache.spark.sql.functions.udf((i: Long) =>
      if (i > 0) throw new RuntimeException("boom") else i)
    val df = (1L to 10L).toDF("id").withColumn("id", boom(col("id")))
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    intercept[Exception] { Cdf.materializeInto(dir, df, Seq.empty, "c0") }
    assert(spark.sparkContext.getPersistentRDDs.size == persistedBefore,
      "the failed materialization left its change frame persisted")
    // the failure-path sweep is best-effort (straggler tasks can
    // re-create scratch paths); the NEXT call's orphan sweep is the
    // accumulation guarantee — after it, no scratch dir may remain.
    // (settle: in production the next call is the next commit, not
    // microseconds after the failed job's tasks were cancelled)
    val deadline = System.currentTimeMillis() + 10000
    while (spark.sparkContext.statusTracker.getActiveJobIds().nonEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(Cdf.materializeInto(dir, (1L to 3L).toDF("id"), Seq.empty, "c1") > 0)
    val scratches = java.nio.file.Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.startsWith(".graft-cdf-mat")).toSeq
    assert(scratches.isEmpty, s"scratch leaked into the view dir: $scratches")
  }

  test("materializeInto pins replay chunking to the existing part set (of<n> names)") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("cdf_pin")
    def parts(prefix: String): Seq[String] = {
      val s = java.nio.file.Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith(prefix + "-") && n.endsWith(".parquet")).toSeq
      finally s.close()
    }
    // first attempt: the hint sizes THREE chunks (M=3 files, K=3)
    val df = (1L to 30L).toDF("id")
    assert(Cdf.materializeInto(dir, df, Seq.empty, "c7",
      rowCountHint = Some(1500000L)) == 3)
    assert(parts("c7").toSet ==
      Set("c7-0of3p3.parquet", "c7-1of3p3.parquet", "c7-2of3p3.parquet"))
    // crash-mid-link simulation: one part missing AND no completion
    // marker (a real crash never wrote it), then a REPLAY whose hint
    // now says ONE chunk (e.g. the derivation changed across engine
    // versions) \u2014 the existing names pin K=3; only the gap re-links
    java.nio.file.Files.delete(dir.resolve("c7-1of3p3.parquet"))
    java.nio.file.Files.deleteIfExists(dir.resolve(".c7.done"))
    assert(Cdf.materializeInto(dir, df, Seq.empty, "c7",
      rowCountHint = Some(1L)) == 1,
      "replay must fill exactly the missing part under the PINNED chunking")
    assert(parts("c7").size == 3)
    // the rows round-trip exactly once through the mixed-replay set
    val got = spark.read.parquet(dir.toString + "/c7-*.parquet")
      .select(col("id")).as[Long].collect().sorted.toSeq
    assert(got == (1L to 30L).toSeq, s"got ${got.size} rows")
    // a COMPLETE set short-circuits: no new files, no re-chunking
    assert(Cdf.materializeInto(dir, df, Seq.empty, "c7",
      rowCountHint = Some(1L)) == 0)
    // HIVE-PARTITIONED crash replay: K=1 chunk but THREE partition-value
    // files (M=3 > K) \u2014 completeness must judge against M, or a replay
    // with K files linked would silently drop the remaining partitions
    val pdir = java.nio.file.Files.createTempDirectory("cdf_pin_part")
    val pdf = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "p")
    assert(Cdf.materializeInto(pdir, pdf, Seq("p"), "c8",
      rowCountHint = Some(1L)) == 3)
    def pparts(): Seq[java.nio.file.Path] = {
      val s = java.nio.file.Files.walk(pdir)
      try s.iterator().asScala.filter(p =>
        p.getFileName.toString.startsWith("c8-") &&
        p.getFileName.toString.endsWith(".parquet")).toSeq
      finally s.close()
    }
    assert(pparts().map(_.getFileName.toString).toSet ==
      Set("c8-0of3p1.parquet", "c8-1of3p1.parquet", "c8-2of3p1.parquet"))
    java.nio.file.Files.delete(pparts().maxBy(_.getFileName.toString))
    java.nio.file.Files.deleteIfExists(pdir.resolve(".c8.done"))
    assert(Cdf.materializeInto(pdir, pdf, Seq("p"), "c8",
      rowCountHint = Some(1L)) == 1,
      "partitioned replay must fill the dropped partition's part")
    val pgot = spark.read.option("basePath", pdir.toString)
      .parquet(pdir.toString).select(col("id")).as[Long].collect().sorted.toSeq
    assert(pgot == Seq(1L, 2L, 3L), s"got $pgot")
    // legacy names (pre-r13, no of<n>) are authoritative as-is
    val legacyDir = java.nio.file.Files.createTempDirectory("cdf_pin_legacy")
    assert(Cdf.materializeInto(legacyDir, (1L to 5L).toDF("id"),
      Seq.empty, "c9") > 0)
    val renamed = {
      val s = java.nio.file.Files.list(legacyDir)
      try s.iterator().asScala.filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      finally s.close()
    }
    renamed.zipWithIndex.foreach { case (p, i) =>
      java.nio.file.Files.move(p, legacyDir.resolve(s"c9-$i.parquet")) }
    // a true pre-marker set carries no markers either — and a
    // legacy-created dir has no era stamp
    java.nio.file.Files.deleteIfExists(legacyDir.resolve(".c9.done"))
    java.nio.file.Files.deleteIfExists(legacyDir.resolve(".c9.started"))
    java.nio.file.Files.deleteIfExists(legacyDir.resolve(".graft-view-era"))
    assert(Cdf.materializeInto(legacyDir, (1L to 50L).toDF("id"),
      Seq.empty, "c9") == 0,
      "a legacy-named part set must be treated as authoritative")
    // a PARTITIONED pre-marker set hides its parts in hive subdirs —
    // invisible to the top-level neverStarted probe. The probe must not
    // be trusted when subdirectories exist, or the replay would
    // re-materialize beside the legacy set and duplicate change rows.
    val plegacy = java.nio.file.Files.createTempDirectory("cdf_pin_plegacy")
    assert(Cdf.materializeInto(plegacy,
      Seq((1L, "a"), (2L, "b")).toDF("id", "p"), Seq("p"), "c10") > 0)
    val pfiles = {
      val s = java.nio.file.Files.walk(plegacy)
      try s.iterator().asScala.filter(p =>
        p.getFileName.toString.startsWith("c10-") &&
        p.getFileName.toString.endsWith(".parquet")).toSeq
      finally s.close()
    }
    pfiles.zipWithIndex.foreach { case (p, i) =>
      java.nio.file.Files.move(p, p.getParent.resolve(s"c10-$i.parquet")) }
    java.nio.file.Files.deleteIfExists(plegacy.resolve(".c10.done"))
    java.nio.file.Files.deleteIfExists(plegacy.resolve(".c10.started"))
    java.nio.file.Files.deleteIfExists(plegacy.resolve(".graft-view-era"))
    assert(Cdf.materializeInto(plegacy,
      Seq((1L, "a"), (2L, "b")).toDF("id", "p"), Seq("p"), "c10") == 0,
      "a partitioned legacy set must be found by the full walk, not " +
        "re-materialized beside itself")
  }

  test("all-SQL Debezium chain: files \u2192 upsert table \u2192 change feed \u2192 updating agg \u2192 mirror, resumable") {
    import spark.implicits._
    // the reference's Debezium-chain shape a SQL-only user writes
    // (arroyo-types updating streams): hop 1 lands raw rows as a
    // merge_keys UPSERT table with the change feed on; hop 2 tails that
    // table's change feed into an updating aggregate mirrored to a
    // SECOND merge_keys table. Both hops checkpoint, so round 2 resumes
    // \u2014 only new input files and only new change commits are consumed.
    val in = tmpTable("cdf2_in")
    val tableA = tmpTable("cdf2_users")
    val tableB = tmpTable("cdf2_totals")
    val cp1 = tmpTable("cdf2_cp1")
    val cp2 = tmpTable("cdf2_cp2")
    val vdir = tmpTable("cdf2_view") + "/view"
    val hop1 =
      s"""CREATE TABLE src (id BIGINT, grp TEXT, v DOUBLE) WITH (
         |  connector='filesystem', path='$in', format='json', type='source');
         |CREATE TABLE users (id BIGINT, grp TEXT, v DOUBLE) WITH (
         |  connector='delta', path='$tableA', format='parquet', type='sink',
         |  merge_keys='id', change_feed='true', checkpoint='$cp1');
         |INSERT INTO users SELECT id, grp, v FROM src""".stripMargin
    val hop2 =
      s"""CREATE TABLE users_cdc (id BIGINT, grp TEXT, v DOUBLE) WITH (
         |  connector='delta', path='$tableA', format='parquet', type='source',
         |  change_feed='true', merge_keys='id', view_dir='$vdir');
         |CREATE TABLE grp_totals (grp TEXT, n BIGINT, total DOUBLE) WITH (
         |  connector='delta', path='$tableB', format='parquet', type='sink',
         |  merge_keys='grp', checkpoint='$cp2');
         |INSERT INTO grp_totals SELECT grp, count(*) AS n, sum(v) AS total
         |FROM users_cdc GROUP BY grp""".stripMargin
    def mirror(): Map[String, (Long, Double)] =
      DeltaLog.read(spark, tableB).as[(String, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    // round 1
    Files.write(Paths.get(s"$in/f0.json"),
      ("""{"id":1,"grp":"a","v":10.0}""" + "\n" +
        """{"id":2,"grp":"a","v":20.0}""" + "\n" +
        """{"id":3,"grp":"b","v":30.0}""" + "\n").getBytes)
    new graft.sql.Pipeline(spark, streaming = true).run(hop1)
    new graft.sql.Pipeline(spark, streaming = true).run(hop2)
    assert(mirror() == Map("a" -> ((2L, 30.0)), "b" -> ((1L, 30.0))),
      s"round 1 mirror: ${mirror()}")
    // round 2: an upsert + an insert through hop 1, a SQL DELETE on the
    // upsert table itself, then both hops RESUME
    Files.write(Paths.get(s"$in/f1.json"),
      ("""{"id":1,"grp":"a","v":11.0}""" + "\n" +
        """{"id":4,"grp":"b","v":40.0}""" + "\n").getBytes)
    new graft.sql.Pipeline(spark, streaming = true).run(hop1)
    new graft.sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE users (id BIGINT, grp TEXT, v DOUBLE) WITH (
         |  connector='delta', path='$tableA', format='parquet', type='sink');
         |DELETE FROM users WHERE id = 3""".stripMargin)
    new graft.sql.Pipeline(spark, streaming = true).run(hop2)
    // hop-1 table state: last writer per key, id=3 deleted
    val users = DeltaLog.read(spark, tableA).as[(Long, String, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(users == Map(1L -> (("a", 11.0)), 2L -> (("a", 20.0)),
      4L -> (("b", 40.0))), s"users: $users")
    // hop-2 mirror CONVERGES to the aggregate of the live rows \u2014 the
    // update retracted (1,a,10) and re-added (1,a,11), the delete
    // retracted (3,b,30), the insert added (4,b,40)
    assert(mirror() == Map("a" -> ((2L, 31.0)), "b" -> ((1L, 40.0))),
      s"round 2 mirror: ${mirror()}")
  }

  test("all-SQL Debezium chain on ICEBERG: upsert table \u2192 manifest changelog \u2192 agg \u2192 mirror, resumable") {
    import spark.implicits._
    // the iceberg twin of the delta two-hop golden: iceberg derives its
    // change feed from manifests (no sink property needed), hop 1 uses
    // the zero-read upsert_enabled landing path, and both hops resume
    val in = tmpTable("icdf2_in")
    val tableA = tmpTable("icdf2_users")
    val tableB = tmpTable("icdf2_totals")
    val cp1 = tmpTable("icdf2_cp1")
    val cp2 = tmpTable("icdf2_cp2")
    val vdir = tmpTable("icdf2_view") + "/view"
    val hop1 =
      s"""CREATE TABLE src (id BIGINT, grp TEXT, v DOUBLE) WITH (
         |  connector='filesystem', path='$in', format='json', type='source');
         |CREATE TABLE users (id BIGINT, grp TEXT, v DOUBLE) WITH (
         |  connector='iceberg', path='$tableA', format='parquet', type='sink',
         |  merge_keys='id', upsert_enabled='true', checkpoint='$cp1');
         |INSERT INTO users SELECT id, grp, v FROM src""".stripMargin
    val hop2 =
      s"""CREATE TABLE users_cdc (id BIGINT, grp TEXT, v DOUBLE) WITH (
         |  connector='iceberg', path='$tableA', format='parquet', type='source',
         |  change_feed='true', merge_keys='id', view_dir='$vdir');
         |CREATE TABLE grp_totals (grp TEXT, n BIGINT, total DOUBLE) WITH (
         |  connector='iceberg', path='$tableB', format='parquet', type='sink',
         |  merge_keys='grp', checkpoint='$cp2');
         |INSERT INTO grp_totals SELECT grp, count(*) AS n, sum(v) AS total
         |FROM users_cdc GROUP BY grp""".stripMargin
    def mirror(): Map[String, (Long, Double)] =
      IcebergLog.read(spark, tableB).as[(String, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    Files.write(Paths.get(s"$in/f0.json"),
      ("""{"id":1,"grp":"a","v":10.0}""" + "\n" +
        """{"id":2,"grp":"a","v":20.0}""" + "\n" +
        """{"id":3,"grp":"b","v":30.0}""" + "\n").getBytes)
    new graft.sql.Pipeline(spark, streaming = true).run(hop1)
    new graft.sql.Pipeline(spark, streaming = true).run(hop2)
    assert(mirror() == Map("a" -> ((2L, 30.0)), "b" -> ((1L, 30.0))),
      s"round 1 mirror: ${mirror()}")
    // round 2: upsert + insert through the zero-read path, a MoR SQL
    // DELETE on the mid table, then both hops resume
    Files.write(Paths.get(s"$in/f1.json"),
      ("""{"id":1,"grp":"a","v":11.0}""" + "\n" +
        """{"id":4,"grp":"b","v":40.0}""" + "\n").getBytes)
    new graft.sql.Pipeline(spark, streaming = true).run(hop1)
    new graft.sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE users (id BIGINT, grp TEXT, v DOUBLE) WITH (
         |  connector='iceberg', path='$tableA', format='parquet', type='sink');
         |ALTER TABLE users SET TBLPROPERTIES ('write.delete.mode' = 'merge-on-read');
         |DELETE FROM users WHERE id = 3""".stripMargin)
    new graft.sql.Pipeline(spark, streaming = true).run(hop2)
    val users = IcebergLog.read(spark, tableA).as[(Long, String, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(users == Map(1L -> (("a", 11.0)), 2L -> (("a", 20.0)),
      4L -> (("b", 40.0))), s"users: $users")
    assert(mirror() == Map("a" -> ((2L, 31.0)), "b" -> ((1L, 40.0))),
      s"round 2 mirror: ${mirror()}")
  }
}
