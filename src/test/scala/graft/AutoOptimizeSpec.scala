package graft

import graft.sinks.{DeltaLog, IcebergLog}
import org.apache.spark.sql.functions._

import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** The commit-path maintenance trigger (`graft.auto-optimize.
  * deleted-ratio`, both formats): merge-on-read tables accumulate
  * delete files / deletion vectors, and the all-dirty scan rent grows
  * with them (SCALE.md) — with the property set, any MoR commit that
  * pushes deleted-rows/live-rows past the ratio runs the bounded
  * dirty-file OPTIMIZE immediately, so a long upsert/delete run keeps
  * its scan cost within a pinned factor of a clean table WITHOUT manual
  * maintenance.
  */
class AutoOptimizeSpec extends SparkSpec {

  test("iceberg: a long upsert run self-compacts at the ratio; deletes never accumulate") {
    import spark.implicits._
    val table = Files.createTempDirectory("iceberg_auto").toString
    IcebergLog.writeBatch((1L to 200L).map(i => (i, i)).toDF("id", "v")
      .repartitionByRange(2, col("id")), table)
    IcebergLog.setTableProperties(spark, table, Map(
      "write.upsert.enabled" -> "true",
      DeltaLog.autoOptimizeProp -> "0.25"))
    var purges = 0
    var maxRatio = 0.0
    (1 to 8).foreach { i =>
      // each batch upserts 20 keys ≈ 10% of the table
      val lo = (i - 1) * 20 % 200 + 1
      val batch = (lo until lo + 20).map(k => (k.toLong, k * 100L + i, false))
        .toDF("id", "v", "__graft_deleted")
      assert(IcebergLog.upsertAppend(spark, table, batch, Seq("id")).isDefined)
      val dels = IcebergLog.deleteFiles(table, None)
      val deleted = dels.map(_.records).sum
      val total = IcebergLog.liveFiles(table, None).filter(_.status != 2)
        .map(_.records).sum
      val ratio = deleted.toDouble / math.max(1L, total - deleted)
      maxRatio = math.max(maxRatio, ratio)
      if (dels.isEmpty) purges += 1
      // the INVARIANT the policy buys: the post-commit delete backlog
      // never exceeds the threshold (the triggering commit purges)
      assert(ratio < 0.25,
        s"batch $i left ratio $ratio ≥ 0.25 — the trigger did not fire")
    }
    assert(purges >= 2, s"expected repeated auto-purges, saw $purges")
    assert(maxRatio > 0.0)
    // correctness through it all: last writer wins per key
    val got = IcebergLog.read(spark, table).as[(Long, Long)].collect().toMap
    assert(got.size == 200)
    assert(got(1L) == 100L + 1 || got(1L) > 100L, s"got(1)=${got(1L)}")
    // without the property, the same run ACCUMULATES (control)
    val t2 = Files.createTempDirectory("iceberg_auto_ctl").toString
    IcebergLog.writeBatch((1L to 200L).map(i => (i, i)).toDF("id", "v")
      .repartitionByRange(2, col("id")), t2)
    IcebergLog.setTableProperties(spark, t2, Map("write.upsert.enabled" -> "true"))
    (1 to 8).foreach { i =>
      val lo = (i - 1) * 20 % 200 + 1
      IcebergLog.upsertAppend(spark, t2,
        (lo until lo + 20).map(k => (k.toLong, k * 100L + i, false))
          .toDF("id", "v", "__graft_deleted"), Seq("id"))
    }
    assert(IcebergLog.deleteFiles(t2, None).size == 8,
      "control: without the property every commit's delete file persists")
  }

  test("delta: DV deletes self-purge at the ratio; reads stay correct") {
    import spark.implicits._
    val table = Files.createTempDirectory("delta_auto").resolve("t").toString
    DeltaLog.writeBatch((1L to 200L).map(i => (i, i)).toDF("id", "v")
      .repartitionByRange(2, col("id")), table,
      tableConf = Map("delta.enableDeletionVectors" -> "true",
        DeltaLog.autoOptimizeProp -> "0.2"))
    // delete 15 rows per commit (7.5%): the third commit crosses 20%
    // deleted-vs-live and must come back CLEAN
    var sawPurge = false
    (0 until 6).foreach { i =>
      val lo = i * 15 + 1
      assert(DeltaLog.deleteWhere(spark, table,
        s"id >= $lo AND id < ${lo + 15}").isDefined)
      val s = DeltaLog.snapshot(spark, table).get
      val deleted = s.adds.flatMap(_._2.dv).map(_.cardinality).sum
      val live = 200L - (i + 1) * 15L
      assert(deleted.toDouble / live < 0.2,
        s"commit $i left DV backlog $deleted/$live ≥ 0.2")
      if (deleted == 0) sawPurge = true
    }
    assert(sawPurge, "expected at least one auto-purge to clear all DVs")
    import spark.implicits._
    val got = DeltaLog.read(spark, table).as[(Long, Long)].collect().toMap
    assert(got.keySet == (91L to 200L).toSet, s"size ${got.size}")
  }

  test("a bad ratio value fails loudly at the first MoR commit") {
    import spark.implicits._
    val table = Files.createTempDirectory("delta_auto_bad").resolve("t").toString
    DeltaLog.writeBatch((1L to 10L).map(i => (i, i)).toDF("id", "v"), table,
      tableConf = Map("delta.enableDeletionVectors" -> "true",
        DeltaLog.autoOptimizeProp -> "lots"))
    val e = intercept[RuntimeException] { DeltaLog.deleteWhere(spark, table, "id = 1") }
    assert(e.getMessage.contains("not a number"), e.getMessage)
  }

  test("a failed auto-OPTIMIZE never fails the landed commit; strict mode propagates (both formats)") {
    import spark.implicits._
    // the trigger runs AFTER the data commit lands: a compaction failure
    // by default must not fail (and replay) the caller's succeeded batch
    val dt = Files.createTempDirectory("delta_auto_decouple").resolve("t").toString
    DeltaLog.writeBatch((1L to 100L).map(i => (i, i)).toDF("id", "v")
      .repartition(2), dt,
      tableConf = Map("delta.enableDeletionVectors" -> "true",
        DeltaLog.autoOptimizeProp -> "0.05"))
    DeltaLog.onOptimizeCommit =
      () => throw new RuntimeException("induced maintenance failure")
    IcebergLog.onReplaceCommit =
      () => throw new RuntimeException("induced maintenance failure")
    try {
      val v = DeltaLog.deleteWhere(spark, dt, "id <= 20")
      assert(v.isDefined,
        "the data commit must stand when the triggered compaction fails")
      val s = DeltaLog.snapshot(spark, dt).get
      assert(s.adds.flatMap(_._2.dv).map(_.cardinality).sum == 20L,
        "the failed compaction leaves the DVs for the next trigger")
      val got = DeltaLog.read(spark, dt).as[(Long, Long)].collect().toMap
      assert(got.keySet == (21L to 100L).toSet)
      // strict opt-in: the same failure propagates (the data commit has
      // still landed — strict only changes WHO hears about maintenance)
      DeltaLog.setTableProperties(spark, dt,
        Map(DeltaLog.autoOptimizeStrictProp -> "true"))
      val e = intercept[RuntimeException] {
        DeltaLog.deleteWhere(spark, dt, "id = 21") }
      assert(e.getMessage.contains("induced"), e.getMessage)
      assert(!DeltaLog.read(spark, dt).as[(Long, Long)].collect().toMap
        .contains(21L), "strict failure still reports a LANDED delete")

      // iceberg twin
      val it = Files.createTempDirectory("iceberg_auto_decouple").toString
      IcebergLog.writeBatch((1L to 100L).map(i => (i, i)).toDF("id", "v")
        .repartitionByRange(2, col("id")), it)
      IcebergLog.setTableProperties(spark, it, Map(
        "write.upsert.enabled" -> "true",
        DeltaLog.autoOptimizeProp -> "0.05"))
      val batch = (1L to 20L).map(k => (k, k + 1000L, false))
        .toDF("id", "v", "__graft_deleted")
      assert(IcebergLog.upsertAppend(spark, it, batch, Seq("id")).isDefined,
        "the iceberg data commit must stand when the compaction fails")
      assert(IcebergLog.deleteFiles(it, None).nonEmpty,
        "the failed compaction leaves the delete files for the next trigger")
      val got2 = IcebergLog.read(spark, it).as[(Long, Long)].collect().toMap
      assert(got2.size == 100 && got2(1L) == 1001L, s"got(1)=${got2.get(1L)}")
      IcebergLog.setTableProperties(spark, it,
        Map(DeltaLog.autoOptimizeStrictProp -> "true"))
      val e2 = intercept[RuntimeException] {
        IcebergLog.upsertAppend(spark, it,
          Seq((2L, 2002L, false)).toDF("id", "v", "__graft_deleted"), Seq("id"))
      }
      assert(e2.getMessage.contains("induced"), e2.getMessage)
    } finally {
      DeltaLog.onOptimizeCommit = () => ()
      IcebergLog.onReplaceCommit = () => ()
    }
  }

  test("delta: a stats-less add (third-party write) skips the ratio check instead of over-compacting") {
    import spark.implicits._
    val dir = Files.createTempDirectory("delta_auto_nostats")
    val table = dir.resolve("t").toString
    DeltaLog.writeBatch((1L to 100L).map(i => (i, i)).toDF("id", "v")
      .repartition(2), table,
      tableConf = Map("delta.enableDeletionVectors" -> "true",
        DeltaLog.autoOptimizeProp -> "0.05"))
    // graft a STATS-LESS add — the shape a third-party writer may
    // commit: a real parquet file plus a hand-written add action with
    // no 'stats' field
    val scratch = dir.resolve("scratch").toString
    (1000L to 1009L).map(i => (i, i)).toDF("id", "v").coalesce(1)
      .write.parquet(scratch)
    val part = Files.list(java.nio.file.Paths.get(scratch)).iterator()
      .asScala.find(_.getFileName.toString.endsWith(".parquet")).get
    val dest = java.nio.file.Paths.get(table, "extra.parquet")
    Files.copy(part, dest)
    val v1 = DeltaLog.snapshot(spark, table).get.version
    val entry = s"""{"add":{"path":"extra.parquet","partitionValues":{},""" +
      s""""size":${Files.size(dest)},""" +
      s""""modificationTime":${Files.getLastModifiedTime(dest).toMillis},""" +
      """"dataChange":true}}"""
    Files.write(java.nio.file.Paths.get(table, "_delta_log",
      f"${v1 + 1}%020d.json"), (entry + "\n").getBytes("UTF-8"))
    // a MoR delete far past the ratio: the trigger must SKIP (the live
    // denominator is under-counted without extra.parquet's numRecords —
    // compacting on it would be over-eager), never fail the commit
    assert(DeltaLog.deleteWhere(spark, table, "id <= 30").isDefined)
    val s = DeltaLog.snapshot(spark, table).get
    assert(s.adds.flatMap(_._2.dv).map(_.cardinality).sum == 30L,
      "ratio must not fire while any active add lacks numRecords stats")
    val got = DeltaLog.read(spark, table).as[(Long, Long)].collect().toMap
    assert(got.keySet == ((31L to 100L) ++ (1000L to 1009L)).toSet)
  }

  test("SQL face: auto_optimize_ratio sink option arms the trigger at CREATE time") {
    import spark.implicits._
    val src = Files.createTempDirectory("auto_sql_src").toString
    val table = Files.createTempDirectory("auto_sql_t").toString
    val cp = Files.createTempDirectory("auto_sql_cp").toString
    (1 to 4).foreach { r =>
      val rows = (1L to 50L).map(k =>
        s"""{"id":$k,"v":${k * 100 + r}}""").mkString("", "\n", "\n")
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$src/f$r.json"),
        rows.getBytes)
      new graft.sql.Pipeline(spark, streaming = true).run(
        s"""CREATE TABLE src (id BIGINT, v BIGINT) WITH (
           |  connector='filesystem', path='$src', format='json', type='source');
           |CREATE TABLE t (id BIGINT, v BIGINT) WITH (
           |  connector='iceberg', path='$table', format='parquet', type='sink',
           |  merge_keys='id', upsert_enabled='true',
           |  auto_optimize_ratio='0.3', auto_optimize_strict='false',
           |  checkpoint='$cp');
           |INSERT INTO t SELECT id, v FROM src""".stripMargin)
    }
    // the property landed and the trigger kept the delete backlog bounded
    val m = IcebergLog.current(table).get
    assert(m.properties.get(DeltaLog.autoOptimizeProp).contains("0.3"))
    assert(m.properties.get(DeltaLog.autoOptimizeStrictProp).contains("false"))
    val dels = IcebergLog.deleteFiles(table, None)
    assert(dels.size < 4, s"4 upsert rounds left ${dels.size} delete files " +
      "— the trigger never fired")
    val got = IcebergLog.read(spark, table).as[(Long, Long)].collect().toMap
    assert(got.size == 50 && got(1L) == 104L, s"got(1)=${got.get(1L)}")
    // a bad value refuses before anything writes
    val bad = Files.createTempDirectory("auto_sql_bad").resolve("x").toString
    val e = intercept[IllegalArgumentException] {
      new graft.sql.Pipeline(spark, streaming = false).run(
        s"""CREATE TABLE x (id BIGINT) WITH (connector='delta', path='$bad',
           |  format='parquet', type='sink', merge_keys='id',
           |  auto_optimize_ratio='lots');
           |INSERT INTO x SELECT CAST(1 AS BIGINT)""".stripMargin)
    }
    assert(e.getMessage.contains("auto_optimize_ratio"), e.getMessage)
    assert(!Files.exists(java.nio.file.Paths.get(bad, "_delta_log")),
      "nothing may land under a refused sink")
  }
}
