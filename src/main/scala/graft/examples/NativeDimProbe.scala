package graft.examples

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCALE.md probe closing the round-8 caveat on [[WideDimProbe]]: its
  * widened corpus is the dim-64 table TILED, so intrinsic dimension
  * stays 64 and a dim-3072 recall of 1.000 validates only the
  * subvector-width rule, not ADC on real high-dimensional geometry.
  *
  * This probe builds NATIVE high-intrinsic-dim synthetic embeddings —
  * per-dimension independent Gaussians (full-rank covariance: intrinsic
  * dim = dim) in a HIERARCHICAL cluster geometry that makes ADC quality
  * the deciding factor: 50 topic clusters (center + σ=0.5 members, so
  * within-cluster cosine ≈ 0.8), queries are cluster members, and each
  * query's true top-10 are its planted near-dups (query + σ=0.25 noise,
  * cosine ≈ 0.97) competing against ~60 same-cluster siblings at ≈ 0.8 —
  * a ~0.17 margin that coarse quantization CAN miss (an isotropic
  * corpus with orthogonal distractors saturates recall at 1.000 for
  * every variant, measured — it validates nothing). Recall@10 runs at
  * dims 64/768/3072 for the pq, ivfpq and persisted-index paths against
  * brute-force ground truth; the fixed-16-subspace variant runs
  * alongside at every dim as the regression control for the r8 collapse
  * (autoSubspaces).
  *
  * Usage: runMain graft.examples.NativeDimProbe [nBase] [dims,…]
  */
object NativeDimProbe {

  def main(args: Array[String]): Unit = {
    val nBase = if (args.length > 0) args(0).toInt else 3000
    val dims = if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
      else Seq(64, 768, 3072)
    val nQueries = 40
    val nPlanted = 10
    val builder = graft.GraftSession.builder("native-dim-probe")
    graft.Bench.tmpfsLocalDir().foreach(d => builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def gaussian(seed: Long, dim: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(dim)(r.nextGaussian().toFloat)
    }

    for (dim <- dims) {
      // hierarchical geometry: 50 full-rank Gaussian cluster centers,
      // members = center + 0.5·noise (within-cluster cosine ≈ 0.8);
      // queries are members; true neighbors = query + 0.25·noise
      // (cosine ≈ 0.97) vs same-cluster siblings at ≈ 0.8
      val nClusters = 50
      val centers = (0 until nClusters).map(k => gaussian(k * 104729L + dim, dim))
      def member(id: Long, cluster: Int, sigma: Float): Array[Float] = {
        val c = centers(cluster)
        val g = gaussian(id * 2654435761L + dim, dim)
        Array.tabulate(dim)(d => c(d) + sigma * g(d))
      }
      val base = (0L until nBase.toLong).map(i =>
        (i, member(i, (i % nClusters).toInt, 0.5f)))
      val planted = (0 until nQueries).flatMap { q =>
        val qv = base(q)._2
        (0 until nPlanted).map { j =>
          val noise = gaussian((nBase + q * nPlanted + j) * 7919L + dim, dim)
          val v = Array.tabulate(dim)(d => qv(d) + 0.25f * noise(d))
          ((nBase + q * nPlanted + j).toLong, v)
        }
      }
      val corpus = (base ++ planted).toDF("vec_id", "embedding")
        .repartition(32).cache()
      val queries = base.take(nQueries)
        .map { case (i, v) => (i, v) }.toDF("query_id", "query_vec")
      corpus.count()

      val gt = Similarity.bruteForceTopK(corpus, queries, k = 10)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

      def recallOf(ann: DataFrame): Double = {
        val got = ann.select("query_id", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        got.intersect(gt).size.toDouble / gt.size
      }

      // sweep mode: recall vs subspace count — the evidence behind the
      // autoSubspaces subvector-width target
      if (args.contains("sweep")) {
        val widths = Seq(16, 32, 48, 64, 96, 128, 192).filter(n => dim % n == 0 && n <= dim)
        widths.foreach { n =>
          val r = recallOf(Similarity.pqTopK(corpus, queries, k = 10, nSubspaces = n))
          println(f"[native-dim-sweep] dim=$dim%4d nSubspaces=$n%3d " +
            f"subvector=${dim / n}%3d floats recall@10=$r%.3f")
        }
      }

      val rPq = recallOf(Similarity.pqTopK(corpus, queries, k = 10))
      val rPqFixed16 = recallOf(Similarity.pqTopK(corpus, queries, k = 10,
        nSubspaces = 16))
      val rIvfPq = recallOf(Similarity.ivfPqTopK(corpus, queries, k = 10))
      val idxDir = java.nio.file.Files.createTempDirectory(s"nativedim-$dim").toString
      Similarity.buildIvfPqIndex(corpus, idxDir)
      val rIndex = recallOf(Similarity.queryIvfPqIndex(spark, idxDir, queries, k = 10))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idxDir))

      println(f"[native-dim] dim=$dim%4d corpus=${nBase + nQueries * nPlanted} " +
        f"intrinsic=full recall@10: pq=$rPq%.3f ivfpq=$rIvfPq%.3f index=$rIndex%.3f " +
        f"| pq@FIXED16=$rPqFixed16%.3f (r8 regression control)")
      corpus.unpersist()
    }
    spark.stop()
  }
}
