package graft

import graft.sinks.{IcebergLog, Merge}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Iceberg format-v2 MERGE-ON-READ (public spec: position-delete files,
  * content=1 DELETES manifests, the reserved 2147483545/6 field ids,
  * `write.{delete,update,merge}.mode` table properties): DML cost scales
  * with the rows changed instead of the files they live in. Asserted
  * against the bytes on disk and against copy-on-write twins.
  */
class MorSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def tmpTable(): String =
    Files.createTempDirectory("iceberg_mor").toString

  private def metaJson(table: String, v: Int): com.fasterxml.jackson.databind.JsonNode =
    mapper.readTree(Files.readAllBytes(
      Paths.get(table, "metadata", s"v$v.metadata.json")))

  private def currentSnapshot(table: String, v: Int): com.fasterxml.jackson.databind.JsonNode = {
    val m = metaJson(table, v)
    val cur = m.get("current-snapshot-id").asLong()
    (0 until m.get("snapshots").size()).map(m.get("snapshots").get)
      .find(_.get("snapshot-id").asLong() == cur).get
  }

  private def morTable(rows: Seq[(Long, Long)], modes: Seq[String],
      nFiles: Int = 2): String = {
    import spark.implicits._
    val table = tmpTable()
    IcebergLog.writeBatch(rows.toDF("id", "v").repartitionByRange(nFiles, col("id")),
      table)
    IcebergLog.setTableProperties(spark, table,
      modes.map(m => s"write.$m.mode" -> "merge-on-read").toMap)
    table
  }

  private def readMap(table: String): Map[Long, Long] = {
    import spark.implicits._
    IcebergLog.read(spark, table).as[(Long, Long)].collect().toMap
  }

  test("MoR DELETE writes a position-delete file and rewrites NO data file") {
    val table = morTable((1L to 100L).map(i => (i, i * 10)), Seq("delete"))
    val dataBefore = IcebergLog.liveFiles(table, None).filter(_.status != 2)
      .map(_.path).toSet
    val v = IcebergLog.deleteWhere(spark, table, "id <= 10 OR id = 55")
    assert(v.contains(3)) // v1 write, v2 properties, v3 delete
    // the data files are UNTOUCHED — only a delete file was added
    val dataAfter = IcebergLog.liveFiles(table, None).filter(_.status != 2)
      .map(_.path).toSet
    assert(dataAfter == dataBefore)
    val dels = IcebergLog.deleteFiles(table, None)
    assert(dels.nonEmpty && dels.forall(d => Files.exists(Paths.get(d.path))))
    assert(dels.map(_.records).sum == 11L)
    // file_path bounds present in the manifest → clean files skip the join
    assert(dels.forall(d => d.pathLo.isDefined && d.pathHi.isDefined))
    // snapshot: operation=delete, delete-file counts in the summary
    val snap = currentSnapshot(table, 3)
    assert(snap.get("summary").get("operation").asText == "delete")
    assert(snap.get("summary").get("added-delete-files").asInt == 1)
    assert(snap.get("summary").get("added-position-deletes").asLong == 11L)
    // the manifest LIST carries a content=1 row
    val list = IcebergLog.readManifestList(snap.get("manifest-list").asText())
    assert(list.exists(_.getInt(3) == 1) && list.exists(_.getInt(3) == 0))
    // reads exclude exactly the deleted rows
    assert(readMap(table).keySet == ((11L to 100L).toSet - 55L))
    // time travel BEFORE the delete still sees every row
    val prevSid = currentSnapshot(table, 1).get("snapshot-id").asLong()
    assert(IcebergLog.read(spark, table, Some(prevSid)).count() == 100L)
  }

  test("MoR DELETE scales with rows deleted: one snapshot, list cost O(1), clean files stay clean") {
    val table = morTable((1L to 1000L).map(i => (i, i)), Seq("delete"), nFiles = 8)
    IcebergLog.deleteWhere(spark, table, "id = 400")
    val dels = IcebergLog.deleteFiles(table, None)
    assert(dels.map(_.records).sum == 1L)
    val live = IcebergLog.liveFiles(table, None).filter(_.status != 2)
    // bounds confine the anti-join to the ONE file holding id=400
    val (clean, dirty) = IcebergLog.splitByDeletes(live, dels,
      IcebergLog.current(table).get.schema)
    assert(dirty.size == 1 && clean.size == 7)
    assert(readMap(table).size == 999)
  }

  test("MoR UPDATE on a PARTITIONED table: retract + postimage append, partition migration included") {
    import spark.implicits._
    val table = tmpTable()
    IcebergLog.writeBatch(
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L)).toDF("id", "p", "v"),
      table, partitionBy = Seq("p"))
    IcebergLog.setTableProperties(spark, table,
      Map("write.update.mode" -> "merge-on-read"))
    // migrate id=2 to partition c and bump v
    val v = IcebergLog.updateWhere(spark, table,
      Seq("p" -> "'c'", "v" -> "v + 1"), Some("id = 2"))
    assert(v.isDefined)
    val snap = currentSnapshot(table, v.get)
    assert(snap.get("summary").get("operation").asText == "overwrite")
    assert(snap.get("summary").get("added-delete-files").asInt == 1)
    val got = IcebergLog.read(spark, table).as[(Long, String, Long)]
      .collect().toSet
    assert(got == Set((1L, "a", 10L), (2L, "c", 21L), (3L, "b", 30L)))
    // the postimage landed under the NEW partition dir
    assert(IcebergLog.liveFiles(table, None).filter(_.status != 2)
      .exists(_.partitionValues.get("p").contains("c")))
  }

  test("MoR MERGE matches its copy-on-write twin row for row") {
    import spark.implicits._
    val rows = (1L to 50L).map(i => (i, i * 10))
    val mor = morTable(rows, Seq("merge"))
    val cow = morTable(rows, Seq.empty) // same shape, default copy-on-write
    val source = Seq((1L, 11L, false), (2L, 21L, false), (30L, -1L, true),
      (99L, 990L, false)).toDF("id", "v", "__graft_deleted")
    val clauses = Merge.upsertClauses(Seq("id"), Seq("id", "v"))
    assert(IcebergLog.merge(spark, mor, source, clauses).isDefined)
    assert(IcebergLog.merge(spark, cow, source, clauses).isDefined)
    assert(readMap(mor) == readMap(cow))
    assert(readMap(mor).get(1L).contains(11L) && !readMap(mor).contains(30L)
      && readMap(mor).get(99L).contains(990L))
    // the MoR side wrote deletes instead of rewriting; the CoW side did not
    assert(IcebergLog.deleteFiles(mor, None).nonEmpty)
    assert(IcebergLog.deleteFiles(cow, None).isEmpty)
  }

  test("insert-only MoR MERGE commits an APPEND snapshot (streams keep flowing)") {
    import spark.implicits._
    val table = morTable((1L to 5L).map(i => (i, i)), Seq("merge"))
    val source = Seq((6L, 60L)).toDF("id", "v")
    val clauses = Merge.Clauses("t", "s", "t.id = s.id", Seq.empty,
      Some((None, Seq.empty))) // INSERT * only
    val v = IcebergLog.merge(spark, table, source, clauses)
    assert(v.isDefined)
    assert(currentSnapshot(table, v.get).get("summary")
      .get("operation").asText == "append")
    assert(IcebergLog.deleteFiles(table, None).isEmpty)
    assert(readMap(table).get(6L).contains(60L))
  }

  test("copy-on-write DML on a table CARRYING deletes never resurrects deleted rows") {
    val table = morTable((1L to 100L).map(i => (i, i)), Seq("delete"))
    IcebergLog.deleteWhere(spark, table, "id <= 20")
    // back to copy-on-write for the UPDATE: it rewrites whole files and
    // must read them WITH the deletes applied
    IcebergLog.setTableProperties(spark, table,
      Map("write.update.mode" -> "copy-on-write"))
    assert(IcebergLog.updateWhere(spark, table,
      Seq("v" -> "v + 1000"), Some("id = 30")).isDefined)
    val got = readMap(table)
    assert(got.get(30L).contains(1030L))
    assert(!(1L to 20L).exists(got.contains), s"resurrected: ${got.keySet.filter(_ <= 20)}")
    assert(got.size == 80)
  }

  test("OPTIMIZE applies and PURGES position deletes; reads unchanged; clean files after") {
    val table = morTable((1L to 100L).map(i => (i, i)), Seq("delete"))
    IcebergLog.deleteWhere(spark, table, "id % 10 = 0")
    val before = readMap(table)
    assert(before.size == 90)
    assert(IcebergLog.rewriteDataFiles(spark, table, smallBytes = Some(1L)).isDefined
      || IcebergLog.deleteFiles(table, None).isEmpty)
    assert(IcebergLog.deleteFiles(table, None).isEmpty,
      "delete manifests must be purged by the rewrite")
    assert(readMap(table) == before)
    // the dirty files were rewritten: re-deleting the same predicate is a no-op
    assert(IcebergLog.deleteWhere(spark, table, "id % 10 = 0").isEmpty)
  }

  test("readChanges on MoR snapshots: per-row deletes, not file-granularity diffs") {
    import spark.implicits._
    val table = morTable((1L to 100L).map(i => (i, i)), Seq("delete", "update"))
    IcebergLog.deleteWhere(spark, table, "id = 7 OR id = 70") // seq 2
    IcebergLog.updateWhere(spark, table, Seq("v" -> "0"), Some("id = 9")) // seq 3
    val chg = IcebergLog.readChanges(spark, table, 2)
      .select(col("id"), col("v"), col(graft.sinks.Cdf.changeTypeCol),
        col(graft.sinks.Cdf.commitVersionCol))
      .as[(Long, Long, String, Long)].collect().toSet
    // EXACTLY the touched rows — a file-diff would have replayed whole files
    assert(chg == Set((7L, 7L, "delete", 2L), (70L, 70L, "delete", 2L),
      (9L, 9L, "delete", 3L), (9L, 0L, "insert", 3L)), s"got $chg")
  }

  test("change-feed stream tails a MoR table; append-only refuses; ignore_deletes skips whole") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val table = morTable((1L to 6L).map(i => (i, i * 10)), Seq("delete", "update"))
    // change-feed consumer mirrors into a map via netting
    val (df, view) = graft.sources.IcebergStreamSource.open(spark, table,
      changeFeed = true, keys = Seq("id"))
    val state = scala.collection.concurrent.TrieMap.empty[Long, Long]
    val q = df.writeStream.foreachBatch(
      (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => {
        graft.streaming.Debezium.netBatch(b)
          .select(col("id"), col("v"), col("__graft_deleted"))
          .collect().foreach { r =>
            if (r.getBoolean(2)) state.remove(r.getLong(0))
            else state(r.getLong(0)) = r.getLong(1)
          }
      }).trigger(Trigger.ProcessingTime(100)).start()
    try {
      q.processAllAvailable()
      assert(state.toMap == (1L to 6L).map(i => i -> i * 10).toMap)
      IcebergLog.deleteWhere(spark, table, "id = 3")
      IcebergLog.updateWhere(spark, table, Seq("v" -> "v + 1"), Some("id = 5"))
      view.sync()
      q.processAllAvailable()
      assert(state.toMap == readMap(table), s"mirror=${state.toMap}")
    } finally { q.stop(); view.close() }
    // append-only stream refuses the MoR delete snapshot
    val table2 = morTable(Seq((1L, 1L)), Seq("delete"))
    val (df2, view2) = graft.sources.IcebergStreamSource.open(spark, table2)
    try {
      IcebergLog.deleteWhere(spark, table2, "id = 1")
      val e = intercept[IllegalStateException] { view2.sync() }
      assert(e.getMessage.contains("deleted or updated live rows"))
    } finally view2.close()
    // ignore_deletes skips the delete snapshot whole
    val (df3, view3) = graft.sources.IcebergStreamSource.open(spark, table2,
      ignoreDeletes = true)
    try assert(view3.sync() == 0)
    finally view3.close()
  }

  test("stream OPEN on a table with existing deletes emits live rows only") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val table = morTable((1L to 20L).map(i => (i, i)), Seq("delete"), nFiles = 4)
    IcebergLog.deleteWhere(spark, table, "id <= 5")
    val (df, view) = graft.sources.IcebergStreamSource.open(spark, table)
    val q = df.writeStream.format("memory").queryName("mor_open")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      q.processAllAvailable()
      val ids = spark.table("mor_open").select(col("id"))
        .as[Long].collect().toSet
      assert(ids == (6L to 20L).toSet, s"got $ids")
    } finally { q.stop(); view.close() }
  }

  test("expireSnapshots reclaims delete files once no retained snapshot references them") {
    val table = morTable((1L to 50L).map(i => (i, i)), Seq("delete"))
    IcebergLog.deleteWhere(spark, table, "id <= 10")
    val delPath = IcebergLog.deleteFiles(table, None).head.path
    // purge via rewrite, then expire everything but current
    assert(IcebergLog.rewriteDataFiles(spark, table, smallBytes = Some(1L)).isDefined)
    assert(Files.exists(Paths.get(delPath)), "retained history still references it")
    val (expired, deleted) = IcebergLog.expireSnapshots(spark, table, olderThanMs = -1000L)
    assert(expired > 0 && deleted > 0)
    assert(!Files.exists(Paths.get(delPath)),
      "the delete file must be GC'd with its last referencing snapshot")
    assert(readMap(table).size == 40)
  }

  test("write.upsert.enabled: the sink lands equality-delete + append WITHOUT reading the target") {
    import spark.implicits._
    val table = tmpTable()
    IcebergLog.writeBatch((1L to 100L).map(i => (i, i * 10)).toDF("id", "v")
      .repartitionByRange(4, col("id")), table)
    IcebergLog.setTableProperties(spark, table,
      Map("write.upsert.enabled" -> "true"))
    val dataBefore = IcebergLog.liveFiles(table, None).filter(_.status != 2)
      .map(_.path).toSet
    // mixed batch: update 2 keys, delete 1, insert 1
    val batch = Seq((1L, 11L, false), (2L, 21L, false), (50L, 0L, true),
      (200L, 2000L, false)).toDF("id", "v", "__graft_deleted")
    IcebergLog.upsertAppend(spark, table, batch, Seq("id"), checkUnique = true)
    // zero data files rewritten; one equality-delete file (content=2)
    val live = IcebergLog.liveFiles(table, None).filter(_.status != 2)
    assert(dataBefore.subsetOf(live.map(_.path).toSet))
    val dels = IcebergLog.deleteFiles(table, None)
    assert(dels.size == 1 && dels.head.content == 2 && dels.head.records == 4)
    // the equality columns round-trip through the manifest entry metrics
    assert(dels.head.eqFieldIds ==
      Seq(IcebergLog.current(table).get.schema.fieldIndex("id") + 1))
    // the v2 sequence rule exempts the SAME commit's appends: updated
    // keys live at their new values, not deleted by their own eq-delete
    val got = readMap(table)
    assert(got.get(1L).contains(11L) && got.get(2L).contains(21L)
      && !got.contains(50L) && got.get(200L).contains(2000L)
      && got.size == 100, s"got size ${got.size}")
    // stacked upserts: last writer wins per key
    IcebergLog.upsertAppend(spark, table,
      Seq((1L, 12L, false), (200L, 0L, true)).toDF("id", "v", "__graft_deleted"),
      Seq("id"), checkUnique = true)
    val got2 = readMap(table)
    // 100 original − 50(deleted) + 200(inserted, then deleted) = 99
    assert(got2.get(1L).contains(12L) && !got2.contains(200L) && got2.size == 99)
    // time travel before the upserts still sees the original rows
    val sid0 = currentSnapshot(table, 1).get("snapshot-id").asLong()
    assert(IcebergLog.read(spark, table, Some(sid0)).count() == 100L)
  }

  test("equality-delete bounds confine the anti-join; OPTIMIZE purges; CoW never resurrects") {
    import spark.implicits._
    val table = tmpTable()
    IcebergLog.writeBatch((1L to 1000L).map(i => (i, i)).toDF("id", "v")
      .repartitionByRange(8, col("id")), table)
    IcebergLog.setTableProperties(spark, table,
      Map("write.upsert.enabled" -> "true"))
    // a narrow-key batch: only the file holding its range is dirty
    IcebergLog.upsertAppend(spark, table,
      Seq((400L, -4L, false), (401L, 0L, true)).toDF("id", "v", "__graft_deleted"),
      Seq("id"), checkUnique = true)
    val m = IcebergLog.current(table).get
    val base = IcebergLog.liveFiles(table, None)
      .filter(f => f.status != 2 && f.dataSeq == 1L) // the original 8 files
    val (clean, dirty) = IcebergLog.splitByDeletes(base,
      IcebergLog.deleteFiles(table, None), m.schema)
    assert(dirty.size == 1 && clean.size == 7,
      s"clean=${clean.size} dirty=${dirty.size}")
    val before = readMap(table)
    assert(before.get(400L).contains(-4L) && !before.contains(401L)
      && before.size == 999)
    // CoW UPDATE on the eq-carrying table reads through the deletes
    assert(IcebergLog.updateWhere(spark, table,
      Seq("v" -> "v + 10000"), Some("id = 402")).isDefined)
    val afterUpd = readMap(table)
    assert(afterUpd.get(402L).contains(10402L) && !afterUpd.contains(401L)
      && afterUpd.get(400L).contains(-4L))
    // OPTIMIZE folds the eq-deletes in and purges them
    assert(IcebergLog.rewriteDataFiles(spark, table, smallBytes = Some(1L)).isDefined)
    assert(IcebergLog.deleteFiles(table, None).isEmpty)
    assert(readMap(table) == afterUpd)
  }

  test("readChanges on an equality-delete snapshot: per-row retract of the LIVE preimages only") {
    import spark.implicits._
    val table = tmpTable()
    IcebergLog.writeBatch((1L to 20L).map(i => (i, i)).toDF("id", "v")
      .coalesce(2), table)
    IcebergLog.setTableProperties(spark, table,
      Map("write.upsert.enabled" -> "true"))
    // seq2: update key 5 (retract 5@5, insert 5@-5); delete key 7
    IcebergLog.upsertAppend(spark, table,
      Seq((5L, -5L, false), (7L, 0L, true)).toDF("id", "v", "__graft_deleted"),
      Seq("id"), checkUnique = true)
    // seq3: update key 5 AGAIN — its preimage must be the LIVE -5, once,
    // and key 7 (already dead) must not re-retract
    IcebergLog.upsertAppend(spark, table,
      Seq((5L, 55L, false), (7L, 0L, true)).toDF("id", "v", "__graft_deleted"),
      Seq("id"), checkUnique = true)
    val chg = IcebergLog.readChanges(spark, table, 2)
      .select(col("id"), col("v"), col(graft.sinks.Cdf.changeTypeCol),
        col(graft.sinks.Cdf.commitVersionCol))
      .as[(Long, Long, String, Long)].collect().toSet
    assert(chg == Set(
      (5L, 5L, "delete", 2L), (5L, -5L, "insert", 2L), (7L, 7L, "delete", 2L),
      (5L, -5L, "delete", 3L), (5L, 55L, "insert", 3L)), s"got $chg")
  }

  test("change-feed stream tails a write.upsert.enabled table; mirror converges") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val src = tmpTable()
    val mirror = tmpTable()
    IcebergLog.writeBatch((1L to 6L).map(i => (i, i * 10)).toDF("id", "v")
      .coalesce(1), src)
    IcebergLog.setTableProperties(spark, src, Map("write.upsert.enabled" -> "true"))
    val (df, view) = graft.sources.IcebergStreamSource.open(spark, src,
      changeFeed = true, keys = Seq("id"))
    val q = df.writeStream.foreachBatch(
      (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => {
        if (!b.isEmpty) Merge.upsertBatch(spark, "iceberg", mirror, b.toDF(), Seq("id"))
      }).trigger(Trigger.ProcessingTime(100)).start()
    try {
      q.processAllAvailable()
      // the MIRROR sink routes through write.upsert.enabled too: its
      // netted change-feed batches land as eq-delete + append
      IcebergLog.setTableProperties(spark, mirror,
        Map("write.upsert.enabled" -> "true"))
      IcebergLog.upsertAppend(spark, src,
        Seq((1L, 11L, false), (6L, 0L, true), (9L, 90L, false))
          .toDF("id", "v", "__graft_deleted"), Seq("id"), checkUnique = true)
      view.sync()
      q.processAllAvailable()
      val want = readMap(src)
      assert(want == Map(1L -> 11L, 2L -> 20L, 3L -> 30L, 4L -> 40L,
        5L -> 50L, 9L -> 90L))
      assert(readMap(mirror) == want, s"mirror=${readMap(mirror)}")
      assert(IcebergLog.deleteFiles(mirror, None).exists(_.content == 2),
        "the mirror's sink batches must have landed as equality deletes")
    } finally { q.stop(); view.close() }
  }

  test("upsert append refuses a batch with duplicate keys (order-dependent)") {
    import spark.implicits._
    val table = tmpTable()
    IcebergLog.writeBatch(Seq((1L, 1L)).toDF("id", "v"), table)
    val e = intercept[IllegalStateException] {
      IcebergLog.upsertAppend(spark, table,
        Seq((1L, 2L, false), (1L, 3L, false)).toDF("id", "v", "__graft_deleted"),
        Seq("id"), checkUnique = true)
    }
    assert(e.getMessage.contains("more than one row per key"))
  }

  test("SQL face: ALTER TABLE SET TBLPROPERTIES flips iceberg DML to merge-on-read") {
    import spark.implicits._
    val table = tmpTable()
    IcebergLog.writeBatch((1L to 30L).map(i => (i, i * 10)).toDF("id", "v")
      .coalesce(2), table)
    val dataBefore = IcebergLog.liveFiles(table, None).filter(_.status != 2)
      .map(_.path).toSet
    new graft.sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE t (id BIGINT, v BIGINT) WITH (
         |  connector='iceberg', path='$table', format='parquet', type='sink');
         |ALTER TABLE t SET TBLPROPERTIES (
         |  'write.delete.mode' = 'merge-on-read',
         |  'write.update.mode' = 'merge-on-read');
         |DELETE FROM t WHERE id <= 5;
         |UPDATE t SET v = v + 1 WHERE id = 30;""".stripMargin)
    assert(IcebergLog.current(table).get.properties
      .get("write.delete.mode").contains("merge-on-read"))
    // both verbs ran merge-on-read: the original data files are untouched
    val live = IcebergLog.liveFiles(table, None).filter(_.status != 2).map(_.path).toSet
    assert(dataBefore.subsetOf(live), "MoR DML must not rewrite data files")
    assert(IcebergLog.deleteFiles(table, None).size == 2)
    val got = readMap(table)
    assert(got.size == 25 && got.get(30L).contains(301L))
  }

  test("SQL face: upsert_enabled iceberg sink lands batches as equality deletes") {
    import spark.implicits._
    val src = Files.createTempDirectory("mor_upsert_src").toString
    val table = tmpTable() + "/t"
    (1L to 10L).map(i => (i, i)).toDF("id", "v")
      .write.mode("overwrite").parquet(src)
    def land(sel: String): Unit =
      new graft.sql.Pipeline(spark, streaming = false).run(
        s"""CREATE TABLE src (id BIGINT, v BIGINT) WITH (
           |  connector='filesystem', path='$src', format='parquet', type='source');
           |CREATE TABLE d (id BIGINT, v BIGINT) WITH (
           |  connector='iceberg', path='$table', format='parquet', type='sink',
           |  merge_keys='id', upsert_enabled='true');
           |INSERT INTO d $sel""".stripMargin)
    land("SELECT id, v FROM src")
    // bootstrap stamped the property on the fresh table
    assert(IcebergLog.current(table).get.properties
      .get("write.upsert.enabled").contains("true"))
    // the second batch lands zero-read: eq-delete + append, no rewrite
    val before = IcebergLog.liveFiles(table, None).filter(_.status != 2)
      .map(_.path).toSet
    land("SELECT id, v + 100 FROM src WHERE id <= 3")
    assert(before.subsetOf(IcebergLog.liveFiles(table, None)
      .filter(_.status != 2).map(_.path).toSet))
    assert(IcebergLog.deleteFiles(table, None).exists(_.content == 2))
    assert(readMap(table) ==
      (1L to 10L).map(i => i -> (if (i <= 3) i + 100 else i)).toMap)
    // upsert_enabled without merge_keys is refused at plan time
    val e = intercept[IllegalArgumentException] {
      new graft.sql.Pipeline(spark, streaming = false).plan(
        s"""CREATE TABLE src2 (id BIGINT) WITH (
           |  connector='filesystem', path='$src', format='parquet', type='source');
           |CREATE TABLE x (id BIGINT) WITH (
           |  connector='iceberg', path='${tmpTable()}/x', format='parquet',
           |  type='sink', upsert_enabled='true');
           |INSERT INTO x SELECT id FROM src2""".stripMargin)
    }
    assert(e.getMessage.contains("needs merge_keys"))
  }

  test("delete manifests coalesce under a long run of MoR commits (list stays O(large))") {
    import spark.implicits._
    val table = morTable((1L to 40L).map(i => (i, i)), Seq.empty)
    IcebergLog.setTableProperties(spark, table,
      Map("write.upsert.enabled" -> "true"))
    (1 to 12).foreach { k =>
      IcebergLog.upsertAppend(spark, table,
        Seq((k.toLong, -k.toLong, false)).toDF("id", "v", "__graft_deleted"),
        Seq("id"), checkUnique = true)
    }
    val m = IcebergLog.current(table).get
    val list = IcebergLog.readManifestList(m.snapshots
      .find(_.get("snapshot-id").asLong() == m.currentSnapshotId).get
      .get("manifest-list").asText())
    val delManifests = list.count(_.getInt(3) == 1)
    assert(delManifests <= 9,
      s"$delManifests delete manifests after 12 MoR commits — the small " +
        "ones must coalesce like the data side")
    // entries survive the merges with EXPLICIT sequence numbers: every
    // updated key reads at its newest value (the v2 rule still scopes
    // each delete to strictly-older files)
    val got = readMap(table)
    assert(got.size == 40)
    (1 to 12).foreach(k => assert(got(k.toLong) == -k.toLong, s"key $k"))
    // and OPTIMIZE still purges the merged manifests
    assert(IcebergLog.rewriteDataFiles(spark, table, smallBytes = Some(1L)).isDefined)
    assert(IcebergLog.deleteFiles(table, None).isEmpty)
    assert(readMap(table) == got)
  }

  test("third-party NULL entry sequence numbers inherit from the manifest list (v2 rule)") {
    import spark.implicits._
    val table = morTable((1L to 20L).map(i => (i, i)), Seq.empty)
    IcebergLog.setTableProperties(spark, table,
      Map("write.upsert.enabled" -> "true"))
    IcebergLog.upsertAppend(spark, table,
      Seq((5L, -5L, false), (7L, 0L, true)).toDF("id", "v", "__graft_deleted"),
      Seq("id"), checkUnique = true)
    assert(readMap(table).size == 19 && readMap(table)(5L) == -5L)
    // simulate a third-party writer: null out every entry's explicit
    // sequence numbers (they then INHERIT from the manifest list; a
    // reader coercing them to 0 would exempt all data from the deletes
    // and silently resurrect id=7 / the old id=5)
    val m = IcebergLog.current(table).get
    m.snapshots.foreach { s =>
      val listPath = Paths.get(s.get("manifest-list").asText())
      IcebergLog.readManifestList(listPath.toString).foreach { mf =>
        val mPath = Paths.get(mf.getString(0))
        // the table is unpartitioned, so both specs decode with an
        // empty partition struct; readEntries normalizes legacy shapes
        val partType = org.apache.spark.sql.types.StructType(Seq.empty)
        val entryType = IcebergLog.manifestEntryType(partType)
        val rows = IcebergLog.readEntries(mPath.toString, partType)
        val nulled = rows.map(r => org.apache.spark.sql.Row.fromSeq(
          r.toSeq.updated(2, null).updated(3, null)))
        val out = Files.newOutputStream(mPath)
        try graft.formats.AvroCodec.writeOcf(out, entryType, nulled.iterator)
        finally out.close()
      }
    }
    assert(readMap(table).size == 19, "inherited sequence numbers must " +
      "keep the equality deletes applying to strictly-older files")
    assert(readMap(table)(5L) == -5L && !readMap(table).contains(7L))
  }

  test("hive-encoded partition values survive mixed-mode DML (CoW reading through deletes)") {
    import spark.implicits._
    val table = tmpTable()
    // partition value with a space: the hive dir is 'p=a%20b', which a
    // URI-decoding file-column lookup would corrupt
    IcebergLog.writeBatch(
      Seq((1L, "a b", 10L), (2L, "a b", 20L), (3L, "c", 30L))
        .toDF("id", "p", "v").coalesce(1),
      table, partitionBy = Seq("p"))
    IcebergLog.setTableProperties(spark, table,
      Map("write.delete.mode" -> "merge-on-read"))
    assert(IcebergLog.deleteWhere(spark, table, "id = 1").isDefined)
    // copy-on-write UPDATE on the delete-carrying table: the candidate
    // read goes through the delete-aware override, whose file column is
    // a LITERAL path that must round-trip the %20 directory
    assert(IcebergLog.updateWhere(spark, table,
      Seq("v" -> "v + 1"), Some("id = 2")).isDefined)
    val got = IcebergLog.read(spark, table).as[(Long, String, Long)]
      .collect().toSet
    assert(got == Set((2L, "a b", 21L), (3L, "c", 30L)), s"got $got")
  }

  test("equality deletes survive schema evolution: key field ids stay positional") {
    import spark.implicits._
    val table = tmpTable()
    Merge.upsertBatch(spark, "iceberg", table,
      (1L to 10L).map(i => (i, i * 10)).toDF("id", "v"), Seq("id"))
    IcebergLog.setTableProperties(spark, table,
      Map("write.upsert.enabled" -> "true"))
    // upsert #1 under the ORIGINAL schema: eq-delete file carries id
    // values keyed by field id 1
    IcebergLog.upsertAppend(spark, table,
      Seq((3L, 33L, false)).toDF("id", "v", "__graft_deleted"),
      Seq("id"), checkUnique = true)
    // evolve: append a column (existing field ids never move), then
    // upsert under the EVOLVED schema via the sink's merge_schema path
    Merge.upsertBatch(spark, "iceberg", table,
      Seq((5L, 55L, "n5")).toDF("id", "v", "note"), Seq("id"),
      orderBy = Some("v"), mergeSchema = true)
    val got = IcebergLog.read(spark, table)
      .select(col("id"), col("v"), col("note"))
      .as[(Long, Long, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == 10, s"got ${got.size}")
    // the PRE-evolution eq-delete still retracts the original row 3
    assert(got(3L) == ((33L, None)), s"got ${got(3L)}")
    // the post-evolution upsert's delete + append both resolve
    assert(got(5L) == ((55L, Some("n5"))), s"got ${got(5L)}")
    assert(got(1L) == ((10L, None)))
  }

  test("SQL OPTIMIZE purges merge-on-read deletes on both formats") {
    import spark.implicits._
    // iceberg: position deletes land, OPTIMIZE via SQL purges them
    val it = tmpTable()
    IcebergLog.writeBatch((1L to 50L).map(i => (i, i)).toDF("id", "v")
      .coalesce(2), it)
    IcebergLog.setTableProperties(spark, it,
      Map("write.delete.mode" -> "merge-on-read"))
    IcebergLog.deleteWhere(spark, it, "id <= 5")
    assert(IcebergLog.deleteFiles(it, None).nonEmpty)
    // delta: a deletion vector lands, OPTIMIZE via SQL purges it
    val dt = tmpTable()
    graft.sinks.DeltaLog.writeBatch((1L to 50L).map(i => (i, i)).toDF("id", "v")
      .coalesce(2), dt, tableConf = Map("delta.enableDeletionVectors" -> "true"))
    graft.sinks.DeltaLog.deleteWhere(spark, dt, "id <= 5")
    assert(graft.sinks.DeltaLog.snapshot(spark, dt).get.adds
      .exists(_._2.dv.isDefined))
    new graft.sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE ti (id BIGINT, v BIGINT) WITH (
         |  connector='iceberg', path='$it', format='parquet', type='sink');
         |CREATE TABLE td (id BIGINT, v BIGINT) WITH (
         |  connector='delta', path='$dt', format='parquet', type='sink');
         |OPTIMIZE ti;
         |OPTIMIZE td;""".stripMargin)
    assert(IcebergLog.deleteFiles(it, None).isEmpty,
      "SQL OPTIMIZE must fold in and purge the position deletes")
    assert(graft.sinks.DeltaLog.snapshot(spark, dt).get.adds
      .forall(_._2.dv.isEmpty),
      "SQL OPTIMIZE must rewrite DV'd files and drop the vectors")
    assert(readMap(it).size == 45)
    import spark.implicits._
    assert(graft.sinks.DeltaLog.read(spark, dt).as[(Long, Long)]
      .collect().toMap.size == 45)
  }

  test("unsupported write-mode value and third-party equality deletes fail loudly") {
    val table = morTable(Seq((1L, 1L)), Seq.empty)
    IcebergLog.setTableProperties(spark, table,
      Map("write.delete.mode" -> "sideways"))
    val e = intercept[RuntimeException] {
      IcebergLog.deleteWhere(spark, table, "id = 1") }
    assert(e.getMessage.contains("not a write mode"))
  }

  test("OPTIMIZE aborts when a MoR DELETE lands in its plan\u2192commit window (clean planning snapshot)") {
    // the planning snapshot carries NO delete files, so a conditional
    // baseDeletes guard would never arm \u2014 and the compaction would
    // rewrite the victim from its raw bytes, resurrecting the rows a
    // concurrent merge-on-read DELETE just retracted
    val table = morTable((1L to 100L).map(i => (i, i)), Seq("delete"))
    IcebergLog.onReplaceCommit = () =>
      assert(IcebergLog.deleteWhere(spark, table, "id = 7").isDefined)
    try {
      val v = IcebergLog.rewriteDataFiles(spark, table,
        smallBytes = Some(Long.MaxValue))
      assert(v.isEmpty, "compaction must abort, never resurrect")
    } finally IcebergLog.onReplaceCommit = () => ()
    val got = readMap(table)
    assert(!got.contains(7L) && got.size == 99, "the concurrent DELETE holds")
    // the retry (quiet window) applies the delete and purges it
    assert(IcebergLog.rewriteDataFiles(spark, table,
      smallBytes = Some(Long.MaxValue)).isDefined)
    assert(IcebergLog.deleteFiles(table, None).isEmpty, "deletes purged")
    val after = readMap(table)
    assert(!after.contains(7L) && after.size == 99)
  }

  test("equality_ids rides the manifest entry (spec field 135); delete manifests ride the unpartitioned spec") {
    import spark.implicits._
    val table = tmpTable()
    IcebergLog.writeBatch(
      Seq((1L, 10L, 0L), (2L, 20L, 1L), (3L, 30L, 0L)).toDF("id", "v", "p"),
      table, partitionBy = Seq("p"))
    IcebergLog.setTableProperties(spark, table,
      Map("write.upsert.enabled" -> "true"))
    IcebergLog.upsertAppend(spark, table,
      Seq((2L, 21L, 1L, false), (4L, 40L, 0L, false))
        .toDF("id", "v", "p", "__graft_deleted"), Seq("id"), checkUnique = true)
    val dels = IcebergLog.deleteFiles(table, None)
    assert(dels.size == 1 && dels.head.content == 2)
    // the EXPLICIT spec field carries the key ids (not a derivation)
    assert(dels.head.equalityIds.contains(Seq(1)), s"got ${dels.head.equalityIds}")
    assert(dels.head.eqFieldIds == Seq(1))
    // the DELETES manifest rides the UNPARTITIONED spec (id 1) \u2014 a
    // spec-conformant external reader must treat a global equality
    // delete as partition-unscoped, never prune it away
    val m = IcebergLog.current(table).get
    val snap = m.snapshots.find(_.get("snapshot-id").asLong() == m.currentSnapshotId).get
    val delRows = IcebergLog.readManifestList(snap.get("manifest-list").asText())
      .filter(_.getInt(3) == 1)
    assert(delRows.nonEmpty && delRows.forall(_.getInt(2) == 1),
      s"delete manifests must carry partition_spec_id=1, got ${delRows.map(_.getInt(2))}")
    // metadata lists BOTH specs (readers resolve the struct by id)
    val specs = m.node.get("partition-specs")
    assert(specs.size == 2 && specs.get(1).get("spec-id").asInt() == 1 &&
      specs.get(1).get("fields").size() == 0)
    // and the table still reads correctly through it all
    val got = IcebergLog.read(spark, table).select("id", "v")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 10L, 2L -> 21L, 3L -> 30L, 4L -> 40L), s"got $got")
  }

  test("third-party equality delete matching on a SUBSET of its columns retracts on equality_ids only") {
    import spark.implicits._
    // the file carries metrics for BOTH columns (what spec-conformant
    // writers stamp) but matches only on id: the r11 value_counts
    // derivation would anti-join on (id AND v), miss (1,10) vs (1,999),
    // and silently over-return the row the delete retracts
    val table = morTable(Seq((1L, 10L), (2L, 20L)), Seq.empty, nFiles = 1)
    assert(IcebergLog.addEqualityDeleteFile(spark, table,
      Seq((1L, 999L)).toDF("id", "v"), equalityIds = Seq(1)).isDefined)
    assert(readMap(table) == Map(2L -> 20L), s"got ${readMap(table)}")
    // the changelog sees the retraction of the LIVE preimage
    val chg = IcebergLog.readChanges(spark, table,
      IcebergLog.current(table).get.lastSeq)
      .select(col("id"), col("v"), col(graft.sinks.Cdf.changeTypeCol))
      .as[(Long, Long, String)].collect().toSet
    assert(chg == Set((1L, 10L, "delete")), s"got $chg")
  }

  test("partition-scoped equality deletes: keys covering partition columns confine the rent") {
    import spark.implicits._
    val table = Files.createTempDirectory("iceberg_scoped_eq").toString
    // 4 partitions × 25 rows
    IcebergLog.writeBatch((1L to 100L).map(i => (i, i, i % 4))
      .toDF("id", "v", "p"), table, partitionBy = Seq("p"))
    IcebergLog.setTableProperties(spark, table,
      Map("write.upsert.enabled" -> "true"))
    // keys (p, id) COVER the partition column; the batch dirties ONLY
    // partitions 1 and 2 → one delete file per dirty partition, under
    // the TABLE spec with real partition values
    val batch = Seq((5L, 500L, 1L, false), (9L, 900L, 1L, false),
      (6L, 600L, 2L, true)).toDF("id", "v", "p", "__graft_deleted")
    assert(IcebergLog.upsertAppend(spark, table, batch, Seq("p", "id")).isDefined)
    val dels = IcebergLog.deleteFiles(table, None)
    assert(dels.size == 2 && dels.forall(_.content == 2), s"got $dels")
    assert(dels.map(_.partition).toSet ==
      Set(Seq("p" -> 1L), Seq("p" -> 2L)),
      s"got ${dels.map(_.partition)}")
    val m = IcebergLog.current(table).get
    val snap = m.snapshots.find(_.get("snapshot-id").asLong() == m.currentSnapshotId).get
    val delMf = IcebergLog.readManifestList(snap.get("manifest-list").asText())
      .filter(_.getInt(3) == 1)
    assert(delMf.nonEmpty && delMf.forall(_.getInt(2) == 0),
      "scoped delete manifests must ride the table spec (0), not the " +
        "unpartitioned global spec")
    // the rent is CONFINED: splitByDeletes dirties only p∈{1,2} files
    val live = IcebergLog.liveFiles(table, None).filter(_.status != 2)
    val (clean, dirty) = IcebergLog.splitByDeletes(live, dels, m.schema)
    assert(dirty.nonEmpty &&
      dirty.forall(f => Set[Any](1L, 2L).contains(f.partitionValues("p"))),
      s"dirty leaked outside the scoped partitions: ${dirty.map(_.partitionValues)}")
    assert(clean.exists(f => f.partitionValues("p") == 0L) &&
      clean.exists(f => f.partitionValues("p") == 3L),
      "untouched partitions must stay clean")
    // correctness through it: upserts landed, the delete-marked row gone
    val got = IcebergLog.read(spark, table).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got.size == 99 && got(5L) == 500L && got(9L) == 900L &&
      !got.contains(6L), s"size=${got.size} got(5)=${got.get(5L)}")
    // and a SECOND scoped upsert composes (last-writer-wins per key)
    assert(IcebergLog.upsertAppend(spark, table,
      Seq((5L, 501L, 1L, false)).toDF("id", "v", "p", "__graft_deleted"),
      Seq("p", "id")).isDefined)
    val got2 = IcebergLog.read(spark, table).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got2(5L) == 501L && got2.size == 99)

    // keys NOT covering the partition column keep the global shape
    val t2 = Files.createTempDirectory("iceberg_global_eq").toString
    IcebergLog.writeBatch((1L to 20L).map(i => (i, i, i % 2))
      .toDF("id", "v", "p"), t2, partitionBy = Seq("p"))
    IcebergLog.setTableProperties(spark, t2,
      Map("write.upsert.enabled" -> "true"))
    assert(IcebergLog.upsertAppend(spark, t2,
      Seq((3L, 33L, 1L, false)).toDF("id", "v", "p", "__graft_deleted"),
      Seq("id")).isDefined)
    val dels2 = IcebergLog.deleteFiles(t2, None)
    assert(dels2.size == 1 && dels2.head.partition.isEmpty,
      "uncovered keys must keep the GLOBAL unpartitioned-spec delete")
  }
}
