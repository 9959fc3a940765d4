package graft.examples

import graft.{GraftSession, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Prints minhash-LSH quality vs exact n-gram Jaccard ground truth at each
  * test scale — used to pick the floors q_minhash_quality enforces.
  */
object MinhashQualityProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-mh-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val d = Tables.load(spark, dir, "documents")
      val exact = Dedup.ngramJaccardPairs(d, "doc_id", "text",
        shingleSize = 3, threshold = 0.5, maxDocFreq = 1000)
      val mh = Dedup.minhashLshPairs(d, "doc_id", "text",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5)
      val strong = exact.filter(col("jaccard") >= 0.7)
      val nStrong = strong.count()
      val found = strong.join(mh, Seq("doc_a", "doc_b")).count()
      val mae = exact.join(mh, Seq("doc_a", "doc_b"))
        .agg(avg(abs(col("est_jaccard") - col("jaccard")))).head().getDouble(0)
      println(f"[mhq] $dir strong=$nStrong recall=${found.toDouble / math.max(1, nStrong)}%.3f mae=$mae%.4f")
    }
    spark.stop()
  }
}
