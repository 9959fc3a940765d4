package graft.examples

/** Times named SparkEntry queries over a data directory (dev tool for the
  * SCALE.md decade-up probes). Unlike Bench (fixed headline battery for
  * the graded artifact), this takes the query list on the command line so
  * new operators can be probed at sf1 the round they land.
  *
  * Usage: runMain graft.examples.QueryProbe <dir> <runs> <q1> [q2 ...]
  * Prints per-run samples and the median per query, bench-style (full
  * count() materialization, cache clear between rounds, tmpfs local dir
  * when available — the SCALE.md controlled-probe method).
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runs = args(1).toInt
    val names = args.drop(2).toSeq
    val builder = graft.GraftSession.builder("query-probe")
    graft.Bench.tmpfsLocalDir().foreach(d => builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qmap = graft.SparkEntry.queries

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      qmap(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up pass (untimed-for-scoring), then `runs` interleaved rounds
    names.foreach(once)
    spark.catalog.clearCache(); System.gc()
    val samples = (1 to runs).map { _ =>
      val round = names.map(n => n -> once(n)).toMap
      spark.catalog.clearCache(); System.gc()
      round
    }
    names.foreach { n =>
      val xs = samples.map(_(n)).sorted
      println(f"[probe] $n%-22s median=${xs(xs.length / 2)}%.3f samples=" +
        samples.map(r => f"${r(n)}%.3f").mkString("[", ",", "]") + s" dir=$dir")
    }
    spark.stop()
  }
}
