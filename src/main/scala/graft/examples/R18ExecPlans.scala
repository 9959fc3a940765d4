package graft.examples

import org.apache.spark.sql.execution.ExplainMode

/** Round-18 EXECUTED-plan dump (dev tool): runs each named query to
  * completion and then writes its post-AQE physical plan — the only place
  * runtime join-strategy rewrites (SMJ → shuffled-hash under
  * maxShuffledHashJoinLocalMapThreshold, broadcast demotions/promotions,
  * AQEShuffleRead coalescing) are visible; R17Plans' pre-execution dumps
  * show `isFinalPlan=false`. Used for the VERDICT r17 #6 SHJ-vs-SMJ
  * evidence at sf1.
  *
  * Usage: runMain graft.examples.R18ExecPlans [sfDir] [outDir] [suffix] [q...]
  */
object R18ExecPlans {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("r18-exec-plans")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/root/repo/plans/r18"
    val suffix = if (args.length > 2) args(2) else "executed"
    val names = if (args.length > 3) args.drop(3).toSeq else graft.SparkEntry.headline
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val qmap = graft.SparkEntry.queries

    names.foreach { name =>
      val tapped = scala.collection.mutable.ArrayBuffer[String]()
      graft.operators.Dedup.planTap = df => {
        df.write.format("noop").mode("overwrite").save()
        tapped += df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      }
      val sb = new StringBuilder
      try {
        val df = qmap(name)(spark, dir)
        df.count()
        sb ++= s"===== $name ($suffix) — EXECUTED (post-AQE) plan =====\n"
        sb ++= df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        tapped.zipWithIndex.foreach { case (p, i) =>
          sb ++= s"\n===== $name ($suffix) — internal pipeline EXECUTED plan ${i + 1} =====\n"
          sb ++= p
        }
      } catch {
        case e: Exception => sb ++= s"EXEC-EXPLAIN FAILED: ${e.getMessage}\n"
      } finally {
        graft.operators.Dedup.planTap = null
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        sb.toString.getBytes("UTF-8"))
      println(s"[exec-plans] wrote $outDir/${name}_$suffix.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
