package graft.examples

import graft.operators.Similarity
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCALE.md probe for the ONE UNTESTED SCALE AXIS of the ANN family
  * (round-7 verdict): embedding DIMENSION. Everything else is measured at
  * dim 64; production embeddings are 768-4096, where the r7 one-scan
  * `queryIvfPqIndex` plan sends the raw `vec` (dim×4 B) through the ADC
  * rank exchange per CANDIDATE row, while the slim-exchange plan's
  * shuffle bytes stay flat. This probe builds the index at dim 64 and a
  * widened dim (default 768 — the corpus vector tiled with deterministic
  * per-copy scaling), runs BOTH plans end-to-end (the slim plan's
  * survivor collect is an eager job — a SparkListener totals shuffle
  * writes and storage reads across EVERY job of the call, not just the
  * final frame), and prints the evidence behind
  * [[Similarity.VecThroughShuffleMaxDim]].
  *
  * Usage: runMain graft.examples.WideDimProbe <dataDir> <runs> [dim]
  */
object WideDimProbe {

  private class Totals extends SparkListener {
    val shufBytes = new java.util.concurrent.atomic.AtomicLong
    val shufRecords = new java.util.concurrent.atomic.AtomicLong
    val inputBytes = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        inputBytes.addAndGet(m.inputMetrics.bytesRead)
      }
    }
    def reset(): Unit = { shufBytes.set(0); shufRecords.set(0); inputBytes.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val wideDim = if (args.length > 2) args(2).toInt else 768
    val builder = graft.GraftSession.builder("wide-dim-probe")
    graft.Bench.tmpfsLocalDir().foreach(d => builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val totals = new Totals
    spark.sparkContext.addSparkListener(totals)

    val base = graft.Tables.load(spark, dir, "embeddings")
    val baseDim = base.select(size(col("embedding"))).head().getInt(0)
    require(wideDim % baseDim == 0, s"dim $wideDim must be a multiple of $baseDim")

    def widen(df: DataFrame, copies: Int): DataFrame =
      if (copies == 1) df
      else df.select(col("vec_id"),
        flatten(transform(sequence(lit(0), lit(copies - 1)), i =>
          transform(col("embedding"), x =>
            x * (lit(1.0f) + i.cast("float") * lit(0.01f))))).as("embedding"))

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    for (dim <- Seq(baseDim, wideDim)) {
      val corpus = widen(base, dim / baseDim)
      val queries = corpus.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val idxDir = java.nio.file.Files.createTempDirectory(s"widedim-$dim").toString
      val (_, tBuild) = timed(Similarity.buildIvfPqIndex(corpus, idxDir))
      val (_, storeBytes) = diskTotals(s"$idxDir/cells")
      println(f"[wide-dim] dim=$dim corpus=${corpus.count()} queries=${queries.count()} " +
        f"build=${tBuild}%.2fs store=${storeBytes / 1024}%d KiB")
      // recall across the dimension axis: does ADC rank well enough that
      // the exact re-rank recovers the true top-k? This is what caught
      // the fixed-nSubspaces=16 collapse at dim 3072 (recall 0.246, r8)
      // and what proves the auto-scaled default restores 1.000. Ground
      // truth from brute force over a bounded query subset.
      locally {
        val rq = queries.limit(50).cache()
        val gt = Similarity.bruteForceTopK(corpus, rq, k = 10)
          .select(col("query_id"), col("vec_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val ann = Similarity.queryIvfPqIndex(spark, idxDir, rq, k = 10)
          .select(col("query_id"), col("vec_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"[wide-dim] dim=$dim recall@10 (50 queries, nProbe=8/64 cells, " +
          f"auto nSubspaces): ${ann.intersect(gt).size.toDouble / gt.size}%.3f")
        rq.unpersist()
      }
      for ((label, through) <- Seq("vec-through-exchange" -> true, "slim-exchange" -> false)) {
        // end-to-end: DataFrame construction included (the slim plan's
        // survivor collect runs eagerly inside queryIvfPqIndex)
        def once(): (Double, Long, Long, Long) = {
          Thread.sleep(300) // let the async listener bus drain
          totals.reset()
          val (_, t) = timed {
            Similarity.queryIvfPqIndex(spark, idxDir, queries, k = 10,
              vecThroughShuffle = Some(through)).queryExecution.toRdd.count()
          }
          Thread.sleep(300)
          (t, totals.shufBytes.get, totals.shufRecords.get, totals.inputBytes.get)
        }
        once() // warm-up
        spark.catalog.clearCache(); System.gc()
        val rs = (1 to runs).map { _ =>
          val r = once(); spark.catalog.clearCache(); System.gc(); r
        }
        val tMed = rs.map(_._1).sorted.apply(runs / 2)
        val last = rs.last
        println(f"[wide-dim] dim=$dim plan=$label query median=${tMed}%.2fs " +
          "samples=" + rs.map(r => f"${r._1}%.2f").mkString("[", ",", "]") +
          f" exchange=${last._2 / 1024}%d KiB/${last._3}%d rows " +
          f"read=${last._4 / 1024}%d KiB")
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idxDir))
    }
    spark.stop()
  }

  private def diskTotals(path: String): (Long, Long) = {
    val root = java.nio.file.Paths.get(path)
    val files = java.nio.file.Files.walk(root).iterator()
    var n = 0L
    var bytes = 0L
    files.forEachRemaining { f =>
      if (java.nio.file.Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet")) {
        n += 1
        bytes += java.nio.file.Files.size(f)
      }
    }
    (n, bytes)
  }
}
