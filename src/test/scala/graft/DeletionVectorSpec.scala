package graft

import graft.sinks.{Cdf, DeletionVectors => DV, DeltaLog, Merge}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Delta DELETION VECTORS (public protocol: PROTOCOL.md "Deletion
  * Vectors", the portable RoaringBitmapArray format, Z85, protocol 3/7
  * table features, `delta.enableDeletionVectors`). The codec is pinned
  * byte-for-byte against hand-computed goldens; the DML surface against
  * copy-on-write twins and the bytes in the log.
  */
class DeletionVectorSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def tmpTable(): String =
    Files.createTempDirectory("delta_dv").resolve("t").toString

  private val dvConf = Map("delta.enableDeletionVectors" -> "true")

  private def readMap(table: String): Map[Long, Long] = {
    import spark.implicits._
    DeltaLog.read(spark, table).as[(Long, Long)].collect().toMap
  }

  test("z85 round-trips and matches the ZeroMQ reference vector") {
    // the Z85 spec's reference: 0x86 4F D2 6F B5 59 F7 5B → "HelloWorld"
    val ref = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b).map(_.toByte)
    assert(DV.z85Encode(ref) == "HelloWorld")
    assert(DV.z85Decode("HelloWorld", 8).toSeq == ref.toSeq)
    // unpadded lengths round-trip through the pad+expected-length rule
    val odd = Array[Byte](1, 2, 3, 4, 5, 6, 7)
    assert(DV.z85Decode(DV.z85Encode(odd), 7).toSeq == odd.toSeq)
    val u = java.util.UUID.randomUUID()
    assert(DV.z85DecodeUuid(DV.z85EncodeUuid(u)) == u)
  }

  test("roaring bitmap array: byte-level golden for a tiny bitmap") {
    val bm = DV.bitmapOf(Iterator(0L, 2L, 65536L))
    val bytes = bm.serialize()
    def le32(off: Int) = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
      ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def le16(off: Int) = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    assert(le32(0) == 1681511377, "RoaringBitmapArray magic")
    assert(le32(4) == 1 && le32(8) == 0, "one 32-bit bitmap (int64 count)")
    assert(le32(12) == 12346, "portable no-run cookie")
    assert(le32(16) == 2, "two containers (keys 0 and 1)")
    // descriptors: key 0 card-1=1; key 1 card-1=0
    assert(le16(20) == 0 && le16(22) == 1)
    assert(le16(24) == 1 && le16(26) == 0)
    // offsets point past cookie+count+desc+offsets = 8 + 8 + 8
    assert(le32(28) == 24 && le32(32) == 28)
    // array containers: [0, 2] then [0]
    assert(le16(36) == 0 && le16(38) == 2 && le16(40) == 0)
    assert(bytes.length == 42)
    val back = DV.deserialize(bytes)
    assert(back.cardinality == 3 && back.contains(0L) && back.contains(2L)
      && back.contains(65536L) && !back.contains(1L) && !back.contains(65537L))
  }

  test("roaring: bitmap containers (card > 4096), high spans, union, store framing") {
    // 5000 even values force a BITMAP container; values above 2^32 force
    // a second 32-bit roaring in the array
    val vals = (0L until 10000L by 2L) ++ Seq((1L << 32) + 7L, (1L << 32) + 9L)
    val bm = DV.bitmapOf(vals.iterator)
    assert(bm.cardinality == 5002)
    val back = DV.deserialize(bm.serialize())
    assert(back.contains(4998L) && !back.contains(4999L)
      && back.contains((1L << 32) + 7L) && !back.contains(7L))
    assert(back.positions.toSeq.sorted == vals.sorted)
    // store framing: write two DVs into one sidecar, load both back
    val root = Files.createTempDirectory("dv_store")
    val other = DV.bitmapOf(Iterator(42L))
    val ds = DV.writeFile(root, Seq(bm, other))
    assert(ds.map(_.cardinality) == Seq(5002L, 1L))
    assert(ds.head.offset.contains(1), "first DV right after the version byte")
    val loaded = ds.map(_.load(root))
    assert(loaded(0).contains(4998L) && loaded(1).contains(42L)
      && !loaded(1).contains(41L))
    // a corrupted byte fails the CRC loudly
    val f = DV.referencedFile(root, ds.head).get
    val raw = Files.readAllBytes(f)
    raw(10) = (raw(10) ^ 0x7f).toByte
    Files.write(f, raw)
    val e = intercept[IllegalArgumentException] { ds.head.load(root) }
    assert(e.getMessage.contains("checksum"))
  }

  test("DV DELETE rewrites NO data file; protocol upgrades to 3/7 with the feature") {
    import spark.implicits._
    val table = tmpTable()
    DeltaLog.writeBatch((1L to 100L).map(i => (i, i * 10)).toDF("id", "v")
      .repartitionByRange(2, col("id")), table, tableConf = dvConf)
    val filesBefore = DeltaLog.snapshot(spark, table).get.files.toSet
    val v = DeltaLog.deleteWhere(spark, table, "id <= 10 OR id = 55")
    assert(v.contains(1))
    val s = DeltaLog.snapshot(spark, table).get
    // same physical files, now carrying DVs — nothing rewritten
    assert(s.files.toSet == filesBefore)
    val dvs = s.adds.flatMap(_._2.dv)
    assert(dvs.map(_.cardinality).sum == 11L)
    // a tiny DV INLINES into the log (storageType i, Z85 bytes, no
    // offset) — no sidecar file for a narrow DELETE
    assert(dvs.forall(d => d.storageType == "i" && d.offset.isEmpty))
    assert(readMap(table).keySet == ((11L to 100L).toSet - 55L))
    // time travel BEFORE the delete sees every row
    assert(DeltaLog.read(spark, table, asOf = Some(0L)).count() == 100L)
    // the log carries protocol 3/7 + deletionVectors in both feature lists
    val lines = Files.readAllLines(
      Paths.get(table, "_delta_log", f"${1L}%020d.json")).asScala
    val proto = lines.map(mapper.readTree).find(_.has("protocol"))
    assert(proto.isEmpty, "protocol was declared at table creation, not at DML time")
    val lines0 = Files.readAllLines(
      Paths.get(table, "_delta_log", f"${0L}%020d.json")).asScala
    val p0 = lines0.map(mapper.readTree).find(_.has("protocol")).get.get("protocol")
    assert(p0.get("minReaderVersion").asInt == 3 && p0.get("minWriterVersion").asInt == 7)
    assert(p0.get("readerFeatures").toString.contains("deletionVectors"))
    // the add action carries the spec descriptor shape
    val addDv = lines.map(mapper.readTree).filter(_.has("add"))
      .flatMap(n => Option(n.get("add").get("deletionVector"))).headOption
    assert(addDv.isDefined)
    assert(addDv.get.get("storageType").asText == "i")
    assert(addDv.get.get("cardinality").asLong > 0)
    // a second DELETE folds into the existing DV (union, one DV per file)
    DeltaLog.deleteWhere(spark, table, "id = 12")
    assert(readMap(table).size == 88)
    assert(!readMap(table).contains(12L) && !readMap(table).contains(55L))
  }

  test("DV UPDATE on a PARTITIONED table: retract + postimage append, partition migration") {
    import spark.implicits._
    val table = tmpTable()
    DeltaLog.writeBatch(
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "a", 40L))
        .toDF("id", "p", "v").coalesce(1),
      table, partitionBy = Seq("p"), tableConf = dvConf)
    val filesBefore = DeltaLog.snapshot(spark, table).get.files.toSet
    assert(DeltaLog.updateWhere(spark, table,
      Seq("p" -> "'c'", "v" -> "v + 1"), Some("id = 2")).isDefined)
    val s = DeltaLog.snapshot(spark, table).get
    assert(filesBefore.subsetOf(s.files.toSet), "originals keep their bytes")
    assert(s.adds.exists(_._2.dv.isDefined))
    assert(s.files.exists(_.startsWith("p=c/")), "postimage migrated partitions")
    val got = DeltaLog.read(spark, table).as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "a", 10L), (2L, "c", 21L), (3L, "b", 30L),
      (4L, "a", 40L)))
  }

  test("DV MERGE matches its copy-on-write twin row for row; full-dead files drop") {
    import spark.implicits._
    def mk(conf: Map[String, String]): String = {
      val t = tmpTable()
      DeltaLog.writeBatch((1L to 50L).map(i => (i, i * 10)).toDF("id", "v")
        .repartitionByRange(5, col("id")), t, tableConf = conf)
      t
    }
    val dv = mk(dvConf)
    val cow = mk(Map.empty)
    val source = Seq((1L, 11L, false), (2L, 21L, false), (30L, -1L, true),
      (99L, 990L, false)).toDF("id", "v", "__graft_deleted")
    val clauses = Merge.upsertClauses(Seq("id"), Seq("id", "v"))
    assert(DeltaLog.merge(spark, dv, source, clauses).isDefined)
    assert(DeltaLog.merge(spark, cow, source, clauses).isDefined)
    assert(readMap(dv) == readMap(cow))
    assert(DeltaLog.snapshot(spark, dv).get.adds.exists(_._2.dv.isDefined))
    // a DELETE covering a whole file DROPS it instead of a full DV: the
    // 1..10 range file had ids 1,2 already DV'd by the merge, so this
    // delete completes it — it must vanish from the adds
    val fileCountBefore = DeltaLog.snapshot(spark, dv).get.files.size
    DeltaLog.deleteWhere(spark, dv, "id <= 10")
    val s = DeltaLog.snapshot(spark, dv).get
    assert(readMap(dv).size == 40) // 50 − id30 + id99 − ids 1..10
    assert(s.files.size < fileCountBefore,
      "fully-dead files (the 1..10 range file, and any postimage-only " +
        "append it covered) drop instead of carrying full DVs")
  }

  test("copy-on-write DML on a table CARRYING DVs never resurrects; OPTIMIZE purges") {
    import spark.implicits._
    val table = tmpTable()
    DeltaLog.writeBatch((1L to 40000L).map(i => (i, i)).toDF("id", "v")
      .repartitionByRange(2, col("id")), table, tableConf = dvConf)
    // a 15k-position DV is too big to inline → sidecar (storageType u)
    DeltaLog.deleteWhere(spark, table, "id <= 15000")
    assert(DeltaLog.snapshot(spark, table).get.adds
      .flatMap(_._2.dv).exists(_.storageType == "u"))
    // flip the property off: the UPDATE takes the copy-on-write path and
    // must read THROUGH the existing DVs. It targets id=30000 — the file
    // WITHOUT the DV — so the DV'd file survives for OPTIMIZE to purge
    DeltaLog.setTableProperties(spark, table,
      Map("delta.enableDeletionVectors" -> "false"))
    assert(DeltaLog.updateWhere(spark, table,
      Seq("v" -> "v + 1000"), Some("id = 30000")).isDefined)
    val got = readMap(table)
    assert(got.get(30000L).contains(31000L) && got.size == 25000)
    assert(!got.contains(15000L) && !got.contains(1L))
    // OPTIMIZE rewrites DV'd files with the vector applied and drops it
    assert(DeltaLog.optimize(spark, table, smallFileBytes = 1L).isDefined)
    val s = DeltaLog.snapshot(spark, table).get
    assert(s.adds.forall(_._2.dv.isEmpty), "DVs purged by the rewrite")
    assert(readMap(table) == got)
    // vacuum reclaims the now-unreferenced sidecar
    val bins = Files.list(Paths.get(table)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("deletion_vector_")).toSeq
    assert(bins.nonEmpty)
    assert(DeltaLog.vacuum(spark, table, retentionMs = -1000) > 0)
    assert(!bins.exists(Files.exists(_)))
  }

  test("CDF records DV DML change rows; checkpoint round-trips descriptors") {
    import spark.implicits._
    val table = tmpTable()
    DeltaLog.writeBatch((1L to 30L).map(i => (i, i)).toDF("id", "v").coalesce(1),
      table, tableConf = dvConf ++ Map(Cdf.enableProp -> "true"))
    DeltaLog.deleteWhere(spark, table, "id = 7")
    DeltaLog.updateWhere(spark, table, Seq("v" -> "0"), Some("id = 9"))
    val chg = DeltaLog.readChanges(spark, table, 1L)
      .select(col("id"), col("v"), col(Cdf.changeTypeCol),
        col(Cdf.commitVersionCol))
      .as[(Long, Long, String, Long)].collect().toSet
    assert(chg == Set((7L, 7L, "delete", 1L),
      (9L, 9L, "update_preimage", 2L), (9L, 0L, "update_postimage", 2L)),
      s"got $chg")
    // force a checkpoint past the DV commits, wipe the snapshot cache and
    // the json tail out of the replay path via a fresh read
    val s0 = DeltaLog.snapshot(spark, table).get
    DeltaLog.writeCheckpoint(spark, table, s0.version)
    DeltaLog.clearSnapshotCache()
    val s1 = DeltaLog.snapshot(spark, table).get
    assert(s1.adds.flatMap(_._2.dv).map(_.cardinality).sum ==
      s0.adds.flatMap(_._2.dv).map(_.cardinality).sum)
    assert(readMap(table).size == 29) // 30 − id7; the update rewrites in place
    // the change-feed STREAM tails the DV table end-to-end
    import org.apache.spark.sql.streaming.Trigger
    val (df, view) = graft.sources.DeltaStreamSource.open(spark, table,
      changeFeed = true, keys = Seq("id"))
    val q = df.writeStream.format("memory").queryName("dv_cdf")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      q.processAllAvailable()
      // the initial snapshot emitted LIVE rows only (DV applied)
      val ids = spark.table("dv_cdf").select(col("id")).as[Long].collect().toSet
      assert(ids == ((1L to 30L).toSet - 7L), s"got $ids")
      DeltaLog.deleteWhere(spark, table, "id = 11")
      view.sync()
      q.processAllAvailable()
      val retracts = spark.table("dv_cdf")
        .filter(col("_updating_meta.is_retract")).select(col("id"))
        .as[Long].collect().toSet
      assert(retracts == Set(11L), s"got $retracts")
    } finally { q.stop(); view.close() }
  }

  test("SQL face: deletion_vectors sink option + DELETE runs merge-on-read") {
    import spark.implicits._
    val src = Files.createTempDirectory("dv_sql_src").toString
    val table = tmpTable()
    (1L to 20L).map(i => (i, i)).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(src)
    new graft.sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE src (id BIGINT, v BIGINT) WITH (
         |  connector='filesystem', path='$src', format='parquet', type='source');
         |CREATE TABLE d (id BIGINT, v BIGINT) WITH (
         |  connector='delta', path='$table', format='parquet', type='sink',
         |  deletion_vectors='true');
         |INSERT INTO d SELECT id, v FROM src;
         |DELETE FROM d WHERE id <= 5;""".stripMargin)
    val s = DeltaLog.snapshot(spark, table).get
    assert(DeltaLog.dvEnabled(s.configuration))
    assert(s.adds.exists(_._2.dv.exists(_.cardinality == 5L)))
    assert(readMap(table).keySet == (6L to 20L).toSet)
    // non-delta connectors refuse the option
    val e = intercept[IllegalArgumentException] {
      new graft.sql.Pipeline(spark, streaming = false).plan(
        s"""CREATE TABLE x (id BIGINT) WITH (connector='iceberg',
           |  path='${tmpTable()}', format='parquet', type='sink',
           |  deletion_vectors='true');""".stripMargin)
    }
    assert(e.getMessage.contains("delta option"))
  }

  test("the chain on a DV table: upsert sink → change-feed stream → mirror converges") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val src = tmpTable()
    val mirror = tmpTable()
    // source table runs BOTH merge-on-read modes: deletion vectors for
    // the DML and the change feed for the downstream stream
    DeltaLog.writeBatch((1L to 8L).map(i => (i, i * 10L)).toDF("id", "v")
      .coalesce(1), src, tableConf = dvConf ++ Map(Cdf.enableProp -> "true"))
    val (df, view) = graft.sources.DeltaStreamSource.open(spark, src,
      changeFeed = true, keys = Seq("id"))
    val q = df.writeStream
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => {
        if (!b.isEmpty) Merge.upsertBatch(spark, "delta", mirror, b.toDF(), Seq("id"))
      })
      .trigger(Trigger.ProcessingTime(100)).start()
    def mirrorRows: Map[Long, Long] =
      DeltaLog.read(spark, mirror).as[(Long, Long)].collect().toMap
    try {
      q.processAllAvailable()
      assert(mirrorRows == (1L to 8L).map(i => i -> i * 10L).toMap)
      // UPDATE + DELETE + MERGE all land as DV row deltas (no file
      // rewritten) with cdc change rows; the stream replays them as
      // retraction pairs and the mirror converges
      val filesBefore = DeltaLog.snapshot(spark, src).get.files.toSet
      assert(DeltaLog.updateWhere(spark, src,
        Seq("v" -> "v + 1"), Some("id <= 2")).isDefined)
      assert(DeltaLog.deleteWhere(spark, src, "id >= 7").isDefined)
      assert(DeltaLog.merge(spark, src,
        Seq((3L, 999L), (20L, 2000L)).toDF("id", "v"),
        Merge.Clauses("t", "s", "t.id = s.id",
          Seq(Merge.MatchedClause(None, Left(Seq("v" -> "s.v")))),
          Some((None, Seq.empty)))).isDefined)
      assert(filesBefore.subsetOf(DeltaLog.snapshot(spark, src).get.files.toSet),
        "merge-on-read: the original data files all kept their bytes")
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

  test("append-only stream refuses a DV commit; ignore_deletes skips it whole") {
    import spark.implicits._
    val table = tmpTable()
    DeltaLog.writeBatch(Seq((1L, 1L), (2L, 2L)).toDF("id", "v").coalesce(1),
      table, tableConf = dvConf)
    val (_, view) = graft.sources.DeltaStreamSource.open(spark, table)
    try {
      DeltaLog.deleteWhere(spark, table, "id = 1")
      val e = intercept[IllegalStateException] { view.sync() }
      assert(e.getMessage.contains("deleted or updated live rows"))
    } finally view.close()
    val (_, view2) = graft.sources.DeltaStreamSource.open(spark, table,
      ignoreDeletes = true)
    try assert(view2.sync() == 0)
    finally view2.close()
  }

  test("OPTIMIZE aborts when a concurrent DV lands on a CLEAN victim (plan\u2192commit race)") {
    import spark.implicits._
    val table = tmpTable()
    DeltaLog.writeBatch((1L to 100L).map(i => (i, i)).toDF("id", "v")
      .repartitionByRange(2, col("id")), table, tableConf = dvConf)
    // no DVs at plan time: the guard must arm anyway (dvId "" for clean
    // victims), or this commit silently drops the fresh deletion vector
    DeltaLog.onOptimizeCommit = () =>
      assert(DeltaLog.deleteWhere(spark, table, "id = 7").isDefined)
    try assert(DeltaLog.optimize(spark, table,
      smallFileBytes = Long.MaxValue).isEmpty, "must abort, never resurrect")
    finally DeltaLog.onOptimizeCommit = () => ()
    val got = readMap(table)
    assert(!got.contains(7L) && got.size == 99, "the concurrent DELETE holds")
    // quiet retry purges the DV by rewriting with it applied
    assert(DeltaLog.optimize(spark, table, smallFileBytes = Long.MaxValue).isDefined)
    assert(DeltaLog.snapshot(spark, table).get.adds.forall(_._2.dv.isEmpty))
    val after = readMap(table)
    assert(!after.contains(7L) && after.size == 99)
  }

  test("prefixed DV descriptors resolve the prefix as a SUBDIRECTORY (protocol layout)") {
    // PROTOCOL.md's example pathOrInlineDv "ab^-aqEH.-t@S}K{vb[*k^" is
    // <table>/ab/deletion_vector_<uuid>.bin \u2014 the 2-char random prefix
    // delta-spark writes at scale is a directory, not a name fragment
    val root = Files.createTempDirectory("dv_prefix")
    val bm = DV.bitmapOf(Iterator(1L, 5L, 9L))
    val data = bm.serialize()
    val uuid = java.util.UUID.randomUUID()
    val dir = root.resolve("ab")
    Files.createDirectories(dir)
    val sidecar = dir.resolve(s"deletion_vector_$uuid.bin")
    val out = new java.io.DataOutputStream(Files.newOutputStream(sidecar))
    try {
      out.writeByte(1) // format version
      out.writeInt(data.length); out.write(data)
      val crc = new java.util.zip.CRC32; crc.update(data)
      out.writeInt(crc.getValue.toInt)
    } finally out.close()
    val d = DV.Descriptor("u", "ab" + DV.z85EncodeUuid(uuid), Some(1),
      data.length, 3L)
    assert(d.load(root).positions.toSeq == Seq(1L, 5L, 9L))
    // vacuum's liveness tracking must see the same subdirectory path
    assert(DV.referencedFile(root, d).map(_.toAbsolutePath.normalize)
      .contains(sidecar.toAbsolutePath.normalize))
  }
}
