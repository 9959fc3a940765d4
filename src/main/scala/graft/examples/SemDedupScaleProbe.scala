package graft.examples

import graft.{GraftSession, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Measures the semanticDedup nCentroids dial at scale: the Σcell² pair
  * term grows quadratically with per-cell occupancy when nCentroids is
  * held fixed across a corpus decade-up, and returns to ~linear when
  * nCentroids scales with the corpus (the documented sizing rule —
  * cells ≈ corpus / desired-cell-size). This probe times the same
  * q_semdedup pipeline shape at each given cell count so SCALE.md can
  * show the dial working, not just assert it.
  *
  * Usage: runMain graft.examples.SemDedupScaleProbe <dir> <nCentroids...>
  */
object SemDedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cellCounts = args.drop(1).map(_.toInt).toSeq
    val builder = GraftSession.builder("semdedup-scale-probe")
    graft.Bench.tmpfsLocalDir().foreach(d => builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.load(spark, dir, "embeddings")
    val dup = e.filter(col("vec_id") % 10 === 0).select(
      (col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"),
        (x, i) => x * (lit(1.0f) + lit(0.1f) * sin(col("vec_id") + i).cast("float")))
        .as("embedding"))
    val corpus = e.select("vec_id", "embedding").unionAll(dup)
    val n = corpus.count()
    for (c <- cellCounts) {
      val t0 = System.nanoTime()
      val dropped = Similarity.semanticDedup(corpus, 0.95, nCentroids = c)
        .filter(col("keep_as") =!= col("vec_id")).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[semdedup-scale] dir=$dir corpus=$n cells=$c dropped=$dropped time=$sec%.2f s")
    }
    spark.stop()
  }
}
