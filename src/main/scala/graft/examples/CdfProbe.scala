package graft.examples

import graft.sinks.{Cdf, DeltaLog}
import graft.sources.DeltaStreamSource
import org.apache.spark.sql.functions._

/** SCALE.md probe for the change data feed (r11): what does a
  * change-feed STREAM pay per commit? The sync materializes each change
  * commit's rows into the view (one copy, bounded by the change, never
  * the table), so the probe pins three commit shapes on a 10 M-row /
  * 200-file CDF table:
  *
  *   (a) narrow update (1 k rows)   — the steady-state CDC case
  *   (b) point delete (1 file hit)  — skew case
  *   (c) full-table update          — the honest worst case: 2×10 M
  *       change rows (pre+post) copied once into the view
  *
  * Also reports the cdc-file write amplification each DML commit pays
  * on the TABLE side (the `_change_data/` bytes vs the rewrite bytes).
  *
  * Usage: runMain graft.examples.CdfProbe [nFiles] [rowsPerFile]
  */
object CdfProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = if (args.length > 0) args(0).toInt else 200
    val rowsPerFile = if (args.length > 1) args(1).toLong else 50000L
    val builder = graft.GraftSession.builder("cdf-probe")
    graft.Bench.tmpfsLocalDir().foreach(d => builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def dirBytes(p: java.nio.file.Path): Long = {
      if (!java.nio.file.Files.exists(p)) return 0L
      val s = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size).sum
      } finally s.close()
    }

    val n = nFiles * rowsPerFile
    val base = spark.range(n).select(col("id").as("k"),
      (col("id") % 997 * 1.0).as("v"))
      .repartitionByRange(nFiles, col("k"))
    val table = java.nio.file.Files.createTempDirectory("cdf-probe").toString
    val (_, tWrite) = timed(DeltaLog.writeBatch(base, table,
      tableConf = Map(Cdf.enableProp -> "true")))
    println(f"[cdf-probe] rows=$n files=$nFiles write=${tWrite}%.2fs")

    val (df, view) = DeltaStreamSource.open(spark, table,
      changeFeed = true, keys = Seq("k"))
    val q = df.writeStream.format("noop")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100)).start()
    try {
      q.processAllAvailable() // drain the initial snapshot

      def axis(label: String, dml: => Unit): Unit = {
        val cdcBefore = dirBytes(java.nio.file.Paths.get(table, Cdf.changeDataDir))
        val (_, tDml) = timed(dml)
        val cdcBytes = dirBytes(java.nio.file.Paths.get(table, Cdf.changeDataDir)) - cdcBefore
        val (linked, tSync) = timed(view.sync())
        val (_, tDrain) = timed(q.processAllAvailable())
        println(f"[cdf-probe] $label: dml=${tDml}%.2fs cdc=${cdcBytes / 1024}%d KiB " +
          f"sync(+$linked files)=${tSync}%.2fs drain=${tDrain}%.2fs")
      }

      axis("(a) narrow update (1k rows)",
        { DeltaLog.updateWhere(spark, table, Seq("v" -> "v + 1"),
            Some("k < 1000")); () })
      axis("(b) point delete",
        { DeltaLog.deleteWhere(spark, table, s"k = ${5 * rowsPerFile}"); () })
      axis("(c) full-table update",
        { DeltaLog.updateWhere(spark, table, Seq("v" -> "v + 1"), None); () })
    } finally {
      q.stop()
      view.close()
    }
    spark.stop()
  }
}
