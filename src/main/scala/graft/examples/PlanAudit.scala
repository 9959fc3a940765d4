package graft.examples

import org.apache.spark.sql.functions._

object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("plan-audit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    for (name <- Seq("q_ngram_collide", "q_normalize", "q_data_card", "q_url_normalize")) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("WholeStageCodegen") || l.contains("Scan parquet") ||
          l.contains("Broadcast")).map(_.take(150)).mkString(java.lang.System.lineSeparator))
    }
    spark.stop()
  }
}
