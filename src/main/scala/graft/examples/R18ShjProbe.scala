package graft.examples

import org.apache.spark.sql.execution.ExplainMode

/** SHJ-vs-SMJ evidence probe (VERDICT r17 #6): at bench scale every join
  * side fits under the 64 MB broadcast threshold, so the
  * `preferSortMergeJoin=false` setting never has a visible site in the
  * stock plans. This probe creates the regime the conf exists for — both
  * sides too big to broadcast — by disabling auto-broadcast, then runs the
  * same queries with the session's preferSortMergeJoin=false and with the
  * Spark-default true, dumping both EXECUTED (post-AQE) plans and wall
  * times. Expected: ShuffledHashJoin selected under false, SortMergeJoin
  * under true, identical row counts.
  *
  * Usage: runMain graft.examples.R18ShjProbe [sfDir] [outDir] [q...]
  */
object R18ShjProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("r18-shj-probe")
    val dir = args.headOption.getOrElse("/tmp/bench-sf1")
    val outDir = if (args.length > 1) args(1) else "/root/repo/plans/r18"
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("q_join_shuffle", "q_multi_join")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val qmap = graft.SparkEntry.queries
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    names.foreach { name =>
      val sb = new StringBuilder
      Seq(("shj", "false"), ("smj", "true")).foreach { case (tag, pref) =>
        spark.conf.set("spark.sql.join.preferSortMergeJoin", pref)
        val df = qmap(name)(spark, dir)
        df.count() // warm (codegen/JIT)
        spark.catalog.clearCache(); System.gc()
        // execute THIS queryExecution (df.count() would plan a separate
        // aggregate and leave the dumped plan at isFinalPlan=false): the
        // explain below then shows the AQE-FINAL plan, where the
        // maxShuffledHashJoinLocalMapThreshold SMJ→SHJ rewrite happens
        val qe = qmap(name)(spark, dir).queryExecution
        val t0 = System.nanoTime()
        val n = qe.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        sb ++= f"===== $name — autoBroadcast OFF, preferSortMergeJoin=$pref ($tag): rows=$n wall=$wall%.3f s =====\n"
        sb ++= qe.explainString(ExplainMode.fromString("formatted"))
        sb ++= "\n"
        println(f"[shj-probe] $name $tag rows=$n wall=$wall%.3f")
        spark.catalog.clearCache(); System.gc()
      }
      spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_sf1_shj_vs_smj.txt"),
        sb.toString.getBytes("UTF-8"))
    }
    spark.stop()
  }
}
