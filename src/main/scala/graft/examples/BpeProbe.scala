package graft.examples

/** Forces BPE training down the DISTRIBUTED merge-loop path on a real
  * corpus (maxDriverVocab = 0) and times it against the driver path on
  * the same data — the SCALE.md evidence that the distributed loop is
  * correct AND affordable when a vocab ever outgrows the driver.
  *
  * Usage: runMain graft.examples.BpeProbe <dir> <numMerges>
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(30)
    val spark = graft.GraftSession.builder("bpe-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, dir, "documents")
    val freqs = graft.operators.Bpe.wordFreqs(docs, "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = freqs.count()
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (viaDriver, tD) = time(graft.operators.Bpe.trainDriver(
      freqs.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq, n))
    val (viaCluster, tC) = time(graft.operators.Bpe.trainDistributed(freqs, n))
    println(f"[bpe-probe] dir=$dir vocab=$vocab merges=$n driver=$tD%.2fs distributed=$tC%.2fs identical=${viaDriver == viaCluster}")
    freqs.unpersist()
    spark.stop()
  }
}
