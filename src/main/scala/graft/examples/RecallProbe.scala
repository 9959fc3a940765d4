package graft.examples

import graft.{GraftSession, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prints recall@5 of the approximate ANN paths vs exact brute force at
  * each test scale — used to pick the floors q_ann_recall enforces.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-recall-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = Tables.load(spark, dir, "embeddings")
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val exact = Similarity.bruteForceTopK(e, q, k = 5).select("query_id", "vec_id")
      val total = exact.count()
      def rec(df: DataFrame): Double =
        df.select("query_id", "vec_id").join(exact, Seq("query_id", "vec_id"))
          .count().toDouble / total
      val lsh1 = rec(Similarity.lshTopK(e, q, k = 5, nPlanes = 6))
      val lsh4 = rec(Similarity.lshTopK(e, q, k = 5, nPlanes = 6, nTables = 4))
      val lsh4mp = rec(Similarity.lshTopK(e, q, k = 5, nPlanes = 6, nTables = 4,
        multiProbe = true))
      // plane-count sweep under multi-probe: probe fraction ≈ T(P+1)/2^P
      // of the corpus (6→44%, 7→25%, 8→14%) — the recall/cost dial
      val lsh7mp = rec(Similarity.lshTopK(e, q, k = 5, nPlanes = 7, nTables = 4,
        multiProbe = true))
      val lsh8mp = rec(Similarity.lshTopK(e, q, k = 5, nPlanes = 8, nTables = 4,
        multiProbe = true))
      val ivf = rec(Similarity.ivfTopK(e, q, k = 5, nCentroids = 64, nProbe = 8))
      // PQ rerank sweep at the default m=16 subspaces (the tuning run also
      // swept m=8 and nCodes=32/64: m=16/K=16/rerank=64 dominated — finer
      // subspaces beat more codewords at equal index bytes: measured
      // m8/K16/rr64 0.605 vs m16/K16/rr64 0.875 at sf0.1). rerank depth is
      // the recall dial on top (ADC ordering is approximate; the exact
      // re-rank recovers what survives the cut).
      val pq32 = rec(Similarity.pqTopK(e, q, k = 5, rerank = 32))
      val pq64 = rec(Similarity.pqTopK(e, q, k = 5, rerank = 64))
      val pq96 = rec(Similarity.pqTopK(e, q, k = 5, rerank = 96))
      val ivfpq = rec(Similarity.ivfPqTopK(e, q, k = 5))
      println(f"[recall] $dir total=$total lsh1=$lsh1%.3f lsh4=$lsh4%.3f lsh4mp=$lsh4mp%.3f " +
        f"lsh7mp=$lsh7mp%.3f lsh8mp=$lsh8mp%.3f ivf=$ivf%.3f " +
        f"pq32=$pq32%.3f pq64=$pq64%.3f pq96=$pq96%.3f ivfpq=$ivfpq%.3f")
    }
    spark.stop()
  }
}
