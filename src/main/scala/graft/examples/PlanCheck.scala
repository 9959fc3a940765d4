package graft.examples

/** Prints the physical plans of representative queries so scan pushdown,
  * column pruning, broadcast choices, and codegen spans can be reviewed
  * (dev tool; used to validate the plans described in README).
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("plan-check")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val targets = Seq("q_filter_project", "q_multi_join", "q_tumble", "q_ann_bruteforce")
    val qmap = graft.SparkEntry.queries
    targets.foreach { name =>
      println(s"\n========== $name ==========")
      qmap(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
