package graft.examples

import org.apache.spark.sql.execution.ExplainMode

/** Round-17 plan dump (dev tool): writes `.explain("formatted")` output for
  * every headline query to <outDir>/<query>_<suffix>.txt. For the dedup
  * pipelines whose public frame is a post-checkpoint RDD scan, the
  * [[graft.operators.Dedup.planTap]] hook additionally captures the real
  * pre-checkpoint pipeline plan into the same file.
  *
  * Usage: runMain graft.examples.R17Plans [sfDir] [outDir] [suffix] [q...]
  */
object R17Plans {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("r17-plans")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/root/repo/plans/r17"
    val suffix = if (args.length > 2) args(2) else "before"
    val names = if (args.length > 3) args.drop(3).toSeq else graft.SparkEntry.headline
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val qmap = graft.SparkEntry.queries

    names.foreach { name =>
      val tapped = scala.collection.mutable.ArrayBuffer[String]()
      graft.operators.Dedup.planTap = df =>
        tapped += df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val sb = new StringBuilder
      try {
        val df = qmap(name)(spark, dir)
        sb ++= s"===== $name ($suffix) — returned frame =====\n"
        sb ++= df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        tapped.zipWithIndex.foreach { case (p, i) =>
          sb ++= s"\n===== $name ($suffix) — internal pipeline plan ${i + 1} (pre-localCheckpoint) =====\n"
          sb ++= p
        }
      } catch {
        case e: Exception => sb ++= s"EXPLAIN FAILED: ${e.getMessage}\n"
      } finally {
        graft.operators.Dedup.planTap = null
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        sb.toString.getBytes("UTF-8"))
      println(s"[plans] wrote $outDir/${name}_$suffix.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
