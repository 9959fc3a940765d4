package graft

import graft.sinks.{DeltaLog, IcebergLog}
import org.apache.spark.sql.functions._

import java.nio.file.Files

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
           |  auto_optimize_ratio='0.3', checkpoint='$cp');
           |INSERT INTO t SELECT id, v FROM src""".stripMargin)
    }
    // the property landed and the trigger kept the delete backlog bounded
    val m = IcebergLog.current(table).get
    assert(m.properties.get(DeltaLog.autoOptimizeProp).contains("0.3"))
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
