package graft.examples

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCALE.md probe for the persistable IVF+PQ index: build cost, append
  * cost, steady-state query cost, and the partition-pruning evidence —
  * files/bytes the probed query batch actually read vs the whole store
  * (from the FileSourceScan's own metrics, not an estimate).
  *
  * Usage: runMain graft.examples.IndexProbe <dataDir> <runs>
  */
object IndexProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val builder = graft.GraftSession.builder("index-probe")
    graft.Bench.tmpfsLocalDir().foreach(d => builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = graft.Tables.load(spark, dir, "embeddings")
    // the q_ann battery's query-set convention: grows with the corpus
    val queries = corpus.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val nQ = queries.count()
    val nC = corpus.count()
    val idxDir = java.nio.file.Files.createTempDirectory("index-probe").toString

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (_, tBuild) = timed(Similarity.buildIvfPqIndex(corpus, idxDir))

    // append 1% of the corpus under fresh ids (no retraining)
    val newVecs = corpus.filter(col("vec_id") % 100 === 7)
      .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
    val nAppend = newVecs.count()
    val (_, tAppend) = timed(Similarity.appendToIvfPqIndex(newVecs, idxDir))

    // warm-up, then timed query rounds. Forced via the frame's OWN query
    // execution (toRdd), not count() — count() plans a separate aggregate
    // query, leaving this plan's scan metrics unpopulated.
    def queryOnce(): (DataFrame, Double) = {
      val df = Similarity.queryIvfPqIndex(spark, idxDir, queries, k = 10)
      val (_, t) = timed(df.queryExecution.toRdd.count())
      (df, t)
    }
    queryOnce()
    spark.catalog.clearCache(); System.gc()
    val results = (1 to runs).map { _ =>
      val r = queryOnce()
      spark.catalog.clearCache(); System.gc()
      r
    }
    val tQuery = results.map(_._2).sorted.apply(runs / 2)

    // pruning evidence from the executed scan's own metrics
    val (scanFiles, scanBytes) = scanTotals(results.last._1)
    val (allFiles, allBytes) = diskTotals(s"$idxDir/cells")

    println(f"[index-probe] dir=$dir corpus=$nC queries=$nQ append=$nAppend")
    println(f"[index-probe] build=${tBuild}%.2fs append=${tAppend}%.2fs " +
      f"query median=${tQuery}%.2fs samples=" +
      results.map(r => f"${r._2}%.2f").mkString("[", ",", "]"))
    println(f"[index-probe] pruning (full battery, $nQ queries x 8 probes): " +
      f"read $scanFiles/$allFiles files, ${scanBytes / 1024}%d/${allBytes / 1024}%d KiB " +
      f"(${100.0 * scanBytes / math.max(1, allBytes)}%.1f%% of the store)")
    // one query probes nProbe cells — the per-query pruning the partition
    // layout buys (a full battery legitimately touches every cell)
    val one = Similarity.queryIvfPqIndex(spark, idxDir, queries.limit(1), k = 10)
    one.queryExecution.toRdd.count()
    val (oneFiles, oneBytes) = scanTotals(one)
    println(f"[index-probe] pruning (single query, 8 probes): " +
      f"read $oneFiles/$allFiles files, ${oneBytes / 1024}%d/${allBytes / 1024}%d KiB " +
      f"(${100.0 * oneBytes / math.max(1, allBytes)}%.1f%% of the store)")

    // r8 (r7 verdict item 7): the INDEXED decontamination path — the
    // declared 100 TB swap-in for q_decontaminate_sem's brute-force
    // screen — tracked round-over-round against the same store. Eval set
    // mirrors the q_decontaminate_sem shape (vec_id % 20), tau relaxed to
    // the ANN probe's regime so the timing includes a non-empty hit
    // aggregation.
    val evalSet = corpus.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("eval_id"), col("embedding"))
    def decontOnce(): Double = {
      val df = Similarity.semanticDecontaminateIndexed(
        spark, idxDir, evalSet, tau = 0.8)
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    decontOnce()
    spark.catalog.clearCache(); System.gc()
    val dts = (1 to runs).map { _ =>
      val t = decontOnce(); spark.catalog.clearCache(); System.gc(); t
    }
    val nFlagged = Similarity.semanticDecontaminateIndexed(
      spark, idxDir, evalSet, tau = 0.8).count()
    println(f"[index-probe] decontaminate-indexed (${evalSet.count()}%d eval vecs, tau=0.8): " +
      f"median=${dts.sorted.apply(runs / 2)}%.2fs samples=" +
      dts.map(t => f"$t%.2f").mkString("[", ",", "]") +
      f" flagged=$nFlagged%d train rows")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idxDir))
    spark.stop()
  }

  /** (numFiles, bytes) actually read by the cells scan(s) of an executed
    * query, from FileSourceScanExec metrics (walks through AQE stages).
    */
  private def scanTotals(df: DataFrame): (Long, Long) = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => (other.children ++ other.subqueries).flatMap(walk)
    }
    val scans = walk(df.queryExecution.executedPlan)
    (scans.map(s => s.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum,
      scans.map(s => s.metrics.get("filesSize").map(_.value).getOrElse(0L)).sum)
  }

  private def diskTotals(path: String): (Long, Long) = {
    val root = java.nio.file.Paths.get(path)
    val files = java.nio.file.Files.walk(root).iterator()
    var n = 0L
    var bytes = 0L
    files.forEachRemaining { f =>
      val name = f.getFileName.toString
      if (java.nio.file.Files.isRegularFile(f) && name.endsWith(".parquet")) {
        n += 1
        bytes += java.nio.file.Files.size(f)
      }
    }
    (n, bytes)
  }
}
