package graft.examples

import org.apache.spark.sql.functions._

import graft.sinks.IcebergLog

/** Scale probe for the r16 NESTED iceberg surfaces:
  *
  * (a) write-pass cost — a struct-only nested schema pays ONE
  *     external-row re-type pass per write job (Catalyst aliases can't
  *     carry nested metadata), a codegen break the flat path doesn't
  *     pay. Measures flat vs nested-struct vs list-bearing (no ids)
  *     writes of the same N rows, so SCALE.md's "linear, per-job"
  *     claim carries a number.
  * (b) nested-leaf pruning — a selective predicate on `s.v` over many
  *     disjoint-range files: what fraction of files does the
  *     manifest-metrics judge skip, metadata-only.
  *
  * Usage: runMain graft.examples.NestedWriteProbe [rowsPerFile] [files]
  */
object NestedWriteProbe {
  def main(args: Array[String]): Unit = {
    val rowsPerFile = if (args.length > 0) args(0).toLong else 200000L
    val nFiles = if (args.length > 1) args(1).toInt else 32
    val builder = graft.GraftSession.builder("nested-write-probe")
    graft.Bench.tmpfsLocalDir().foreach(d => builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val n = rowsPerFile * nFiles
    val base = spark.range(n).select(col("id"),
      (col("id") % 97).as("a"), (col("id") * 3).as("b"),
      concat(lit("v"), col("id")).as("t"))

    // (a) flat vs struct-nested vs list-bearing, same bytes-ish
    def fresh() = java.nio.file.Files
      .createTempDirectory("nested-write-probe").toString
    val flatDf = base.repartition(nFiles)
    val nestedDf = base.select(col("id"),
      struct(col("a"), struct(col("b"), col("t")).as("in")).as("s"))
      .repartition(nFiles)
    val listDf = base.select(col("id"), array(col("a"), col("b")).as("xs"),
      col("t")).repartition(nFiles)
    // warm-up (JIT + committer init)
    IcebergLog.writeBatch(flatDf.limit(1000), fresh())
    IcebergLog.writeBatch(nestedDf.limit(1000), fresh())
    val tFlat = timed(IcebergLog.writeBatch(flatDf, fresh()))
    val tNested = timed(IcebergLog.writeBatch(nestedDf, fresh()))
    val tList = timed(IcebergLog.writeBatch(listDf, fresh()))
    println(f"write $n%d rows x $nFiles%d files: flat=$tFlat%.2fs " +
      f"nested-struct=$tNested%.2fs (x${tNested / tFlat}%.2f) " +
      f"list-no-ids=$tList%.2fs (x${tList / tFlat}%.2f)")

    // (b) nested-leaf prune: disjoint per-file ranges on s.v
    val table = fresh()
    (0 until nFiles).foreach { i =>
      val lo = i * rowsPerFile
      val df = spark.range(lo, lo + rowsPerFile).select(col("id"),
        struct(col("id").as("v")).as("s")).coalesce(1)
      IcebergLog.writeBatch(df, table)
    }
    val mid = n / 2
    val tPlan = timed {
      val (kept, total) = IcebergLog.planFiles(spark, table, None,
        Some(s"s.v >= $mid and s.v < ${mid + rowsPerFile}"))
      println(s"nested-leaf prune: kept ${kept.size} of $total files " +
        s"(skip ${(total - kept.size) * 100 / total}%)")
    }
    println(f"plan time (metadata only): $tPlan%.3fs")
    spark.stop()
  }
}
