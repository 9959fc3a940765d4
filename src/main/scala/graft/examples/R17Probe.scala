package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Round-17 optimization probe (dev tool): runs named headline queries with a
  * stage listener attached and prints, per query, the wall time plus every
  * stage's (jobId, stageId, name, tasks, wall ms, executor-run ms) — the
  * empirical side of guide §1.1 with the UI disabled. Each query runs twice;
  * only the second (warm) run is instrumented, so one-time codegen/JIT cost
  * stays out of the attribution.
  *
  * Usage: runMain graft.examples.R17Probe [sfDir] [q1 q2 ...]
  */
object R17Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("r17-probe")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_minhash_lsh", "q_tfidf", "q_ngram_jaccard", "q_semdedup")
    val qmap = graft.SparkEntry.queries

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Int, Long, Long)]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val wall = (for {s <- info.submissionTime; c <- info.completionTime} yield c - s).getOrElse(-1L)
        val m = info.taskMetrics
        val detail = f"in=${m.inputMetrics.recordsRead}%,d sr=${m.shuffleReadMetrics.recordsRead}%,d " +
          f"sw=${m.shuffleWriteMetrics.recordsWritten}%,d swB=${m.shuffleWriteMetrics.bytesWritten}%,d " +
          info.name.takeWhile(_ != '\n').take(60)
        stages.add((info.stageId, detail, info.numTasks, wall, m.executorRunTime))
      }
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.add((js.jobId, Option(js.properties.getProperty("spark.job.description")).getOrElse("")))
    }

    names.foreach { name =>
      // cold pass (codegen/JIT) — uninstrumented
      qmap(name)(spark, dir).count()
      spark.catalog.clearCache(); System.gc()
      stages.clear(); jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = qmap(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300) // drain listener bus
      println(f"===== $name rows=$n wall=$wall%.3f s jobs=${jobs.size} stages=${stages.size}")
      val arr = scala.jdk.CollectionConverters.IteratorHasAsScala(stages.iterator()).asScala.toSeq
      arr.sortBy(-_._4).foreach { case (id, nm, tasks, w, run) =>
        println(f"  stage=$id%-4d tasks=$tasks%-3d wall=${w}%-6d ms run=${run}%-6d ms  $nm")
      }
      println(f"  stage wall sum=${arr.map(_._4).sum} ms  run sum=${arr.map(_._5).sum} ms")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
