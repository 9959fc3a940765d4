package graft.examples

import org.apache.spark.sql.functions._

import graft.sinks.IcebergLog

/** Cost probe for the r16 v3-lineage DML arming: every UPDATE/DELETE
  * planning round on a v3 table now pays one [[IcebergLog.lineageOf]]
  * metadata walk (snapshots × manifest entries, decoded-manifest cache
  * behind it). Measures UPDATE wall time on a v2 table vs a v3 table
  * at growing snapshot-history depths, so the "bounded by retained
  * snapshots, cache-amortized" claim carries numbers.
  *
  * Usage: runMain graft.examples.LineageDmlProbe [appendsPerStage]
  */
object LineageDmlProbe {
  def main(args: Array[String]): Unit = {
    val stageAppends = if (args.length > 0) args(0).toInt else 50
    val builder = graft.GraftSession.builder("lineage-dml-probe")
    graft.Bench.tmpfsLocalDir().foreach(d => builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def mkTable(v3: Boolean): String = {
      val t = java.nio.file.Files.createTempDirectory("lineage-dml").toString
      IcebergLog.writeBatch(
        spark.range(1000).select(col("id"), (col("id") % 7).as("v")).coalesce(1), t)
      if (v3) IcebergLog.setTableProperties(spark, t,
        Map("format-version" -> "3"))
      t
    }
    def appendStage(t: String, stage: Int): Unit =
      (0 until stageAppends).foreach { i =>
        val lo = (stage * stageAppends + i + 1) * 1000L
        IcebergLog.writeBatch(spark.range(lo, lo + 1000)
          .select(col("id"), (col("id") % 7).as("v")).coalesce(1), t)
      }
    val v2 = mkTable(v3 = false)
    val v3 = mkTable(v3 = true)
    (0 until 3).foreach { stage =>
      appendStage(v2, stage); appendStage(v3, stage)
      val snaps = IcebergLog.current(v3).get.snapshots.size
      // same selective predicate each time; both tables same file count
      val lo = 500L + stage
      val tV2 = timed(IcebergLog.updateWhere(spark, v2,
        Seq("v" -> "v + 1"), Some(s"id = $lo")))
      val tV3 = timed(IcebergLog.updateWhere(spark, v3,
        Seq("v" -> "v + 1"), Some(s"id = $lo")))
      println(f"history=$snaps%4d snapshots: UPDATE v2=$tV2%.2fs " +
        f"v3+lineage=$tV3%.2fs (overhead ${(tV3 - tV2)}%+.2fs)")
    }
    // the walk alone, cache-warm (the per-round marginal cost)
    val m = IcebergLog.current(v3).get
    val tWalk = timed(IcebergLog.readWithLineage(spark, v3).count())
    println(f"full lineage read at ${m.snapshots.size}%d snapshots: $tWalk%.2fs")
    spark.stop()
  }
}
