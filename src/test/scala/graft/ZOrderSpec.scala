package graft

import graft.operators.ZOrder
import graft.sinks.{DeltaLog, IcebergLog}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Z-order clustering: the Morton curve's component-wise monotonicity,
  * the bounding-box shrink that makes multi-column min/max pruning
  * work, the iceberg manifest-metrics end-to-end effect, and the
  * OPTIMIZE … ZORDER BY SQL face.
  */
class ZOrderSpec extends SparkSpec {

  test("zValue is component-wise monotone (the Morton property)") {
    import spark.implicits._
    val df = (0 until 1000).map { i =>
      (i.toLong, (i * 37 % 100).toDouble, (i * 53 % 100).toDouble)
    }.toDF("id", "x", "y")
    val z = df.withColumn("z", ZOrder.zValue(df, Seq("x", "y")))
      .select("x", "y", "z").as[(Double, Double, Long)].collect()
    // dominance: x1<=x2 AND y1<=y2 ⟹ z1<=z2 (spot-check all pairs)
    for (a <- z; b <- z if a._1 <= b._1 && a._2 <= b._2)
      assert(a._3 <= b._3, s"$a !<= $b")
  }

  test("cluster shrinks per-file bounding boxes in BOTH dimensions") {
    import spark.implicits._
    val n = 40000
    val grid = (0 until n).map { i =>
      ((i * 2654435761L % n).toDouble, (i * 40503L % n).toDouble)
    }.toDF("x", "y")
    val nFiles = 16
    def boxes(df: org.apache.spark.sql.DataFrame): Seq[(Double, Double)] =
      df.withColumn("p", spark_partition_id())
        .groupBy("p").agg(max("x") - min("x"), max("y") - min("y"))
        .collect().map(r => (r.getDouble(1), r.getDouble(2))).toSeq
    // baseline: range-sort by x alone — y ranges stay full-width
    val linear = boxes(grid.repartitionByRange(nFiles, col("x")))
    assert(linear.map(_._2).min > n * 0.8, "baseline must be y-unclustered")
    val zBoxes = boxes(ZOrder.cluster(grid, Seq("x", "y"), nFiles))
    assert(zBoxes.size == nFiles)
    // 16 files ⟹ 4×4 curve cells of n/4 × n/4, and cluster() aligns
    // every file boundary to a cell boundary — so EVERY box is at most
    // one cell (n/4) plus quantile-sketch slack, in BOTH dimensions
    assert(zBoxes.forall { case (dx, dy) => dx < n * 0.30 && dy < n * 0.30 },
      s"every box must fit one n/4 curve cell: $zBoxes")
    // rows survive the shuffle exactly
    assert(ZOrder.cluster(grid, Seq("x", "y"), nFiles).count() == n.toLong)
  }

  test("iceberg ZORDER rewrite: manifest bounds start pruning the second dimension") {
    import spark.implicits._
    val table = Files.createTempDirectory("iceberg_z").toString
    // 8 x-disjoint appends, each y full-width — the streaming-sink shape
    (0 until 8).foreach { b =>
      val rows = (0 until 500).map { i =>
        (b * 500L + i, (i * 997 % 4000).toLong, s"d$b-$i")
      }
      IcebergLog.writeBatch(rows.toDF("x", "y", "v").coalesce(1), table)
    }
    // before: a narrow y-band filter prunes nothing (every file spans y)
    val (beforeKept, beforeTotal) =
      IcebergLog.planFiles(spark, table, None, Some("y >= 100 AND y < 600"))
    assert(beforeTotal == 8 && beforeKept.size == 8, "y must be unclustered before")
    assert(IcebergLog.rewriteDataFiles(spark, table,
      targetBytes = 8 * 1024, zorderBy = Seq("x", "y")).nonEmpty)
    val (afterKept, afterTotal) =
      IcebergLog.planFiles(spark, table, None, Some("y >= 100 AND y < 600"))
    assert(afterTotal >= 4, s"zorder rewrite should split into several files ($afterTotal)")
    assert(afterKept.size < afterTotal,
      s"y-band must prune after zorder (${afterKept.size}/$afterTotal)")
    // x pruning still works too, and rows are intact
    val (xKept, _) = IcebergLog.planFiles(spark, table, None, Some("x < 500"))
    assert(xKept.size < afterTotal)
    assert(IcebergLog.read(spark, table).count() == 4000)
    val expectBand = (0 until 500).count { i =>
      val y = i * 997 % 4000; y >= 100 && y < 600
    } * 8L
    assert(IcebergLog.read(spark, table, scanFilter = Some("y >= 100 AND y < 600"))
      .count() == expectBand)
    // partition columns are rejected as zorder targets
    val pTable = Files.createTempDirectory("iceberg_zp").toString
    IcebergLog.writeBatch(Seq((1L, "a", "x")).toDF("id", "p", "v"),
      pTable, partitionBy = Seq("p"))
    intercept[IllegalArgumentException] {
      IcebergLog.rewriteDataFiles(spark, pTable, zorderBy = Seq("p"))
    }
  }

  test("OPTIMIZE … ZORDER BY SQL verb on a delta table; bad column rejected at plan time") {
    import spark.implicits._
    val table = Files.createTempDirectory("delta_z").toString
    (0 until 4).foreach { b =>
      DeltaLog.writeBatch((0 until 200).map(i =>
        (b * 200L + i, (i * 31 % 800).toLong)).toDF("x", "y").coalesce(1), table)
    }
    new sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE tbl (x BIGINT, y BIGINT) WITH (
         |  connector='delta', path='$table', format='parquet', type='sink');
         |OPTIMIZE tbl ZORDER BY (x, y);""".stripMargin)
    val s = DeltaLog.snapshot(spark, table).get
    assert(s.version == 4, "zorder must commit a new version (0-based: 4 writes + optimize)")
    assert(DeltaLog.read(spark, table).count() == 800)
    // string-typed zorder columns work through the proxy too
    val e = intercept[IllegalArgumentException] {
      new sql.Pipeline(spark, streaming = false).plan(
        s"""CREATE TABLE tbl (x BIGINT, y BIGINT) WITH (
           |  connector='delta', path='$table', format='parquet', type='sink');
           |OPTIMIZE tbl ZORDER BY (nope);""".stripMargin)
    }
    assert(e.getMessage.contains("nope"))
  }

  test("delta stats skipping: ZORDER'd table + point filter opens O(1) files (r10)") {
    import spark.implicits._
    val table = Files.createTempDirectory("delta_stats_z").toString
    // 8 x-disjoint appends, each y full-width — the streaming-sink shape
    (0 until 8).foreach { b =>
      val rows = (0 until 500).map { i =>
        (b * 500L + i, (i * 997 % 4000).toLong, s"d$b-$i")
      }
      DeltaLog.writeBatch(rows.toDF("x", "y", "v").coalesce(1), table)
    }
    // stats landed on every add action
    val s0 = DeltaLog.snapshot(spark, table).get
    assert(s0.adds.forall(_._2.stats.exists(_.contains("numRecords"))),
      "every add must carry stats JSON")
    // before: y-band prunes nothing (every file spans y), x-point prunes to 1
    val (yBefore, total) = DeltaLog.planFiles(spark, table,
      scanFilter = Some("y >= 100 AND y < 600"))
    assert(total == 8 && yBefore.size == 8, "y must be unclustered before")
    assert(DeltaLog.planFiles(spark, table, scanFilter = Some("x = 42"))._1.size == 1,
      "x-point filter must open exactly 1 of the x-disjoint files")
    // ZORDER rewrite, then BOTH dimensions skip
    assert(DeltaLog.optimize(spark, table, smallFileBytes = 4 * 1024,
      zorderBy = Seq("x", "y"), targetFileBytes = 4 * 1024).nonEmpty)
    val (yAfter, totalAfter) = DeltaLog.planFiles(spark, table,
      scanFilter = Some("y >= 100 AND y < 600"))
    assert(totalAfter >= 4, s"zorder rewrite should split into several files ($totalAfter)")
    assert(yAfter.size < totalAfter,
      s"y-band must prune after zorder (${yAfter.size}/$totalAfter)")
    val (xAfter, _) = DeltaLog.planFiles(spark, table, scanFilter = Some("x < 500"))
    assert(xAfter.size < totalAfter)
    // pruned reads stay exact (filter re-applied after the skip)
    assert(DeltaLog.read(spark, table).count() == 4000)
    val expectBand = (0 until 500).count { i =>
      val y = i * 997 % 4000; y >= 100 && y < 600
    } * 8L
    assert(DeltaLog.read(spark, table, scanFilter = Some("y >= 100 AND y < 600"))
      .count() == expectBand)
    // the SQL face: scan_filter option on a delta source table
    val viaSql = new sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE dz (x BIGINT, y BIGINT, v TEXT) WITH (
         |  connector='delta', path='$table', format='parquet', type='source',
         |  scan_filter='y >= 100 AND y < 600');
         |SELECT count(*) AS n FROM dz""".stripMargin).get
    assert(viaSql.as[Long].collect().head == expectBand)
    // stats survive a checkpoint round-trip (pruning still works cold)
    DeltaLog.writeCheckpoint(spark, table,
      DeltaLog.snapshot(spark, table).get.version)
    DeltaLog.clearSnapshotCache()
    val (yCold, totalCold) = DeltaLog.planFiles(spark, table,
      scanFilter = Some("y >= 100 AND y < 600"))
    assert(yCold.size < totalCold, "stats must survive the checkpoint round-trip")
  }

  test("string and timestamp proxies preserve order through the curve") {
    import spark.implicits._
    val df = Seq("apple", "banana", "cherry", "kiwi", "zebra", "aardvark")
      .zipWithIndex.map { case (s, i) =>
        (s, java.sql.Timestamp.valueOf(s"2026-01-0${i + 1} 00:00:00"))
      }.toDF("s", "t")
    val z1 = df.withColumn("z", ZOrder.zValue(df, Seq("s")))
      .orderBy("s").select("z").as[Long].collect()
    assert(z1.sorted.sameElements(z1), "1-col string zorder = lexicographic order")
    val z2 = df.withColumn("z", ZOrder.zValue(df, Seq("t")))
      .orderBy("t").select("z").as[Long].collect()
    assert(z2.sorted.sameElements(z2), "1-col timestamp zorder = time order")
  }
}
