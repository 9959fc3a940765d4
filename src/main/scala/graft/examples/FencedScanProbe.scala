package graft.examples

import org.apache.spark.sql.functions._

import graft.sinks.IcebergLog

/** Scale probe for the r17 FencedScan change (scoped field-id reads
  * replacing the session-global conf flips):
  *
  * (a) what the old session-wide nestedSchemaPruning disable COST every
  *     unrelated query — a one-leaf projection over a wide nested
  *     parquet table with pruning ON vs OFF. Pre-r17, one renamed-table
  *     read put the whole session on the OFF line for good; post-r17
  *     only the renamed read itself forgoes pruning.
  * (b) what the fence COSTS the renamed read itself — the same
  *     aggregation over an iceberg table before a rename (plain
  *     whole-stage-codegen scan) vs after (field-id fenced RDD scan:
  *     full-schema read + one codegen break). Paid ONLY by
  *     renamed-history tables; OPTIMIZE exits the path entirely.
  *
  * Usage: runMain graft.examples.FencedScanProbe [rows] [leaves]
  */
object FencedScanProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 4000000L
    val leaves = if (args.length > 1) args(1).toInt else 16
    val builder = graft.GraftSession.builder("fenced-scan-probe")
    graft.Bench.tmpfsLocalDir().foreach(d => builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def fresh() = java.nio.file.Files
      .createTempDirectory("fenced-scan-probe").toString

    // (a) unrelated-query tax of a session-wide pruning disable
    val wide = spark.range(rows).select(col("id"),
      struct((0 until leaves).map(i =>
        (col("id") * (i + 1)).as(s"l$i")): _*).as("s"))
    val plainDir = fresh()
    wide.repartition(8).write.mode("overwrite").parquet(plainDir)
    def oneLeaf(): Long = spark.read.parquet(plainDir)
      .select(col("s.l0")).agg(sum("l0")).head().getLong(0)
    oneLeaf() // warm
    spark.conf.set("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
    val tOn = timed(oneLeaf())
    spark.conf.set("spark.sql.optimizer.nestedSchemaPruning.enabled", "false")
    val tOff = timed(oneLeaf())
    spark.conf.set("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
    println(f"(a) one-leaf-of-$leaves%d scan, $rows%d rows: pruned=$tOn%.2fs " +
      f"unpruned=$tOff%.2fs (x${tOff / tOn}%.2f) — the per-query tax the " +
      "pre-r17 session-wide disable charged every later nested scan")

    // (b) fence cost on the renamed read itself
    val table = fresh()
    IcebergLog.writeBatch(spark.range(rows).select(col("id"),
      struct((col("id") % 97).as("a"), (col("id") * 3).as("b")).as("s"))
      .repartition(8), table)
    def agg(c: String): Long =
      IcebergLog.read(spark, table).agg(sum(col(c))).head().getLong(0)
    agg("s.a") // warm
    val tPlain = timed(agg("s.a"))
    val want = agg("s.a")
    IcebergLog.renameColumn(spark, table, "s", "meta")
    agg("meta.a") // warm (fenced)
    val tFenced = timed(agg("meta.a"))
    require(agg("meta.a") == want, "fenced read changed the answer")
    println(f"(b) renamed-history read, $rows%d rows: plain=$tPlain%.2fs " +
      f"fenced=$tFenced%.2fs (x${tFenced / tPlain}%.2f) — paid only by " +
      "renamed tables; unrelated scans keep the pruned line above")
    spark.stop()
  }
}
