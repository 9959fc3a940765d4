package graft.examples

import graft.sinks.DeltaLog
import org.apache.spark.sql.functions._

/** SCALE.md probe for the wire-format Delta sink: (a) the data-size
  * axis — commit overhead must stay O(1) while the data write scales
  * with rows; (b) the commit-count axis — snapshot cost after many
  * micro-batch commits, with and without parquet checkpoints (the
  * protocol's log-compaction device).
  *
  * Usage: runMain graft.examples.DeltaProbe <dataDir> [commits]
  */
object DeltaProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nCommits = if (args.length > 1) args(1).toInt else 60
    val builder = graft.GraftSession.builder("delta-probe")
    graft.Bench.tmpfsLocalDir().foreach(d => builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // (a) data-size axis: one big append, then read-back
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_shipdate")
    val rows = li.count()
    val table = java.nio.file.Files.createTempDirectory("delta-probe").toString
    val (_, tWrite) = timed(DeltaLog.writeBatch(li, table))
    val (_, tRead) = timed(DeltaLog.read(spark, table).count())
    val nFiles = DeltaLog.snapshot(spark, table).get.files.size
    println(f"[delta-probe] dir=$dir rows=$rows write=${tWrite}%.2fs " +
      f"read=${tRead}%.2fs files=$nFiles")

    // (b) commit-count axis: many tiny streaming-style commits
    import spark.implicits._
    def manyCommits(cpInterval: Int): (String, Double, Double) = {
      val t = java.nio.file.Files.createTempDirectory(s"delta-cp$cpInterval").toString
      val one = Seq((1L, "x")).toDF("id", "v")
      val (_, tc) = timed((0 until nCommits).foreach { i =>
        DeltaLog.writeBatch(one, t, txn = Some(("q", i.toLong)),
          checkpointInterval = cpInterval)
      })
      // steady-state snapshot cost (what EVERY later commit and read pays)
      val (_, ts) = timed((0 until 5).foreach(_ => DeltaLog.snapshot(spark, t)))
      (t, tc, ts / 5)
    }
    val (_, tcOff, tsOff) = manyCommits(0)
    val (tOn, tcOn, tsOn) = manyCommits(10)
    val logFiles = java.nio.file.Files.list(
      java.nio.file.Paths.get(tOn, "_delta_log")).count()
    println(f"[delta-probe] $nCommits commits: no-checkpoint total=${tcOff}%.2fs " +
      f"snapshot=${tsOff * 1000}%.0fms | checkpoint@10 total=${tcOn}%.2fs " +
      f"snapshot=${tsOn * 1000}%.0fms log_entries=$logFiles")

    // (c) FILE-COUNT axis: per-commit cost on a table with many active
    // files (100 TB / 128 MB ≈ 10⁶ files — the axis the data-size probe
    // can't reach with real writes). Synthetic add actions stand in for
    // the data files: snapshot replay and commit never open them. Cold =
    // full checkpoint/log replay (what every commit paid before the
    // incremental snapshot cache); warm = replay of the new tail only.
    def fileCountAxis(nFiles: Int): Unit = {
      import java.nio.file.{Files => JF, Paths => JP}
      val one = Seq((1L, "x")).toDF("id", "v").coalesce(1)
      val t = JF.createTempDirectory(s"delta-files").toString
      DeltaLog.writeBatch(one, t, checkpointInterval = 0)
      var v = 1L
      var written = 0
      while (written < nFiles) {
        val n = math.min(20000, nFiles - written)
        val sb = new StringBuilder
        (0 until n).foreach { i =>
          // disjoint id ranges in the stats: a point filter keeps 1 file
          val lo = (written + i) * 1000L
          sb.append(s"""{"add":{"path":"part-synth-$v-$i.parquet","partitionValues":{},"size":134217728,"modificationTime":1,"dataChange":true,"stats":"{\\"numRecords\\":1000,\\"minValues\\":{\\"id\\":$lo},\\"maxValues\\":{\\"id\\":${lo + 999}},\\"nullCount\\":{\\"id\\":0}}"}}""").append('\n')
        }
        JF.write(JP.get(t, "_delta_log", f"$v%020d.json"),
          sb.toString.getBytes("UTF-8"))
        v += 1; written += n
      }
      DeltaLog.clearSnapshotCache()
      val (_, tCold) = timed(DeltaLog.writeBatch(one, t, checkpointInterval = 0))
      val (_, tWarm1) = timed(DeltaLog.writeBatch(one, t, checkpointInterval = 0))
      val (_, tWarm2) = timed(DeltaLog.writeBatch(one, t, checkpointInterval = 0))
      DeltaLog.clearSnapshotCache()
      val (_, tSnapCold) = timed(DeltaLog.snapshot(spark, t))
      val (_, tSnapWarm) = timed(DeltaLog.snapshot(spark, t))
      // the r10 skipping path: per-query driver cost of judging every
      // add's stats JSON against a point filter (warm snapshot)
      val ((kept, total), tPlan1) =
        timed(DeltaLog.planFiles(spark, t, scanFilter = Some("id = 123456")))
      val (_, tPlan2) =
        timed(DeltaLog.planFiles(spark, t, scanFilter = Some("id = 123456")))
      println(f"[delta-probe] files=$nFiles%7d commit cold=${tCold * 1000}%.0fms " +
        f"warm=${math.min(tWarm1, tWarm2) * 1000}%.0fms | snapshot " +
        f"cold=${tSnapCold * 1000}%.0fms warm=${tSnapWarm * 1000}%.0fms | " +
        f"planFiles(point)=${math.min(tPlan1, tPlan2) * 1000}%.0fms kept=${kept.size}/$total")
    }
    Seq(10000, 100000).foreach(fileCountAxis)

    // (e) BULK-COMMIT harvest axis (r11): a bulk initial load committing
    // 10⁴ parts pays 10⁴ parquet-footer opens for its add-action stats.
    // They ride the SpoolLink pool since r11 — this row pins the serial
    // vs pooled cost over the SAME real footers (probeHarvest re-runs
    // the exact per-file work writeBatch does at commit time).
    def harvestAxis(nParts: Int): Unit = {
      import java.nio.file.{Files => JF}
      val t = JF.createTempDirectory("delta-harvest").toString
      val df = spark.range(nParts * 20L)
        .select(col("id"), (col("id") % 97).as("k"), (col("id") * 7).as("v"))
        .repartition(nParts)
      val (_, tWrite) = timed(DeltaLog.writeBatch(df.toDF(), t))
      val (_, tSerial) = timed(DeltaLog.probeHarvest(spark, t, parallel = false))
      val (_, tPooled) = timed(DeltaLog.probeHarvest(spark, t, parallel = true))
      println(f"[delta-probe] bulk-commit parts=$nParts%6d " +
        f"writeBatch=${tWrite}%.2fs harvest serial=${tSerial}%.2fs " +
        f"pooled=${tPooled}%.2fs speedup=${tSerial / tPooled}%.1fx")
    }
    harvestAxis(10000)

    // (d) STREAMING-OPEN axis: DeltaStreamSource.open hard-links every
    // ACTIVE file into the view dir on the driver (one-time), and each
    // later sync links only the new tail. Synthetic adds again, but with
    // real (empty) files on disk so the links can be made — the probe
    // measures the link loop itself, which is the O(active files) piece.
    def streamOpenAxis(nFiles: Int): Unit = {
      import java.nio.file.{Files => JF, Paths => JP}
      val one = Seq((1L, "x")).toDF("id", "v").coalesce(1)
      val t = JF.createTempDirectory("delta-sopen").toString
      DeltaLog.writeBatch(one, t, checkpointInterval = 0)
      var v = 1L
      var written = 0
      while (written < nFiles) {
        val n = math.min(20000, nFiles - written)
        val sb = new StringBuilder
        (0 until n).foreach { i =>
          val name = s"part-synth-$v-$i.parquet"
          JF.createFile(JP.get(t, name))
          sb.append(s"""{"add":{"path":"$name","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}""").append('\n')
        }
        JF.write(JP.get(t, "_delta_log", f"$v%020d.json"),
          sb.toString.getBytes("UTF-8"))
        v += 1; written += n
      }
      DeltaLog.clearSnapshotCache()
      val ((_, view), tOpen) =
        timed(graft.sources.DeltaStreamSource.open(spark, t))
      DeltaLog.writeBatch(one, t, checkpointInterval = 0)
      val (linked, tSync) = timed(view.sync())
      val (_, tClose) = timed(view.close())
      println(f"[delta-probe] stream-open files=$nFiles%7d " +
        f"open=${tOpen * 1000}%.0fms incr-sync(+$linked)=${tSync * 1000}%.0fms " +
        f"close=${tClose * 1000}%.0fms")
    }
    Seq(10000, 100000).foreach(streamOpenAxis)
    spark.stop()
  }
}
