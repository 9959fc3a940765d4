package graft.examples

import graft.{GraftSession, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Prints simhash near-dup quality vs exact n-gram Jaccard ground truth —
  * used to pick the floors q_simhash_quality enforces.
  */
object SimhashQualityProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-sh-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    for (dir <- dirs) {
      val d = Tables.load(spark, dir, "documents")
      val exact = Dedup.ngramJaccardPairs(d, "doc_id", "text",
        shingleSize = 3, threshold = 0.5, maxDocFreq = 1000)
      val sh = Dedup.simhashPairs(d, "doc_id", "text", maxHamming = 3)
      val nSh = sh.count()
      // precision proxy: how similar are simhash-flagged pairs really?
      val meanJ = sh.join(exact, Seq("doc_a", "doc_b"), "left")
        .agg(avg(coalesce(col("jaccard"), lit(0.0)))).head().getDouble(0)
      // recall on EXACT duplicates (jaccard = 1.0 → identical token streams)
      val dups = exact.filter(col("jaccard") >= 0.999)
      val nDups = dups.count()
      val found = dups.join(sh, Seq("doc_a", "doc_b")).count()
      // the VERIFIED pipeline (the q_simhash_quality configuration): how
      // many candidates survive the exact-verify join, its wall cost, and
      // the verified mean-J — the output-boundedness evidence for SCALE.md
      val t0 = System.nanoTime()
      val shv = Dedup.simhashPairs(d, "doc_id", "text", maxHamming = 3,
        verify = true, shingleSize = 3, minJaccard = 0.7)
      val nV = shv.count()
      val vSecs = (System.nanoTime() - t0) / 1e9
      val meanJv = shv.join(exact, Seq("doc_a", "doc_b"), "left")
        .agg(avg(coalesce(exact("jaccard"), lit(0.0)))).head().getDouble(0)
      println(f"[shq] $dir pairs=$nSh meanJ=$meanJ%.3f dups=$nDups found=$found " +
        f"verified=$nV meanJv=$meanJv%.3f verifySecs=$vSecs%.2f")
    }
    spark.stop()
  }
}
