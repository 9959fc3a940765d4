package graft.examples

import graft.sinks.IcebergLog

/** Scale probe for the wire-format Iceberg metadata ([[IcebergLog]]):
  * (a) commit-count axis — does the manifest MERGE keep the manifest
  * list O(large manifests) instead of O(commits), and what does the
  * steady-state append cost as commits accumulate; (b) the pruning
  * axis — what fraction of files does a selective scan_filter skip on
  * a many-file table, judged purely from manifest metrics (no parquet
  * footer is opened on the read path).
  *
  * Usage: runMain graft.examples.IcebergProbe [commits]
  */
object IcebergProbe {
  def main(args: Array[String]): Unit = {
    val nCommits = if (args.length > 0) args(0).toInt else 120
    val builder = graft.GraftSession.builder("iceberg-probe")
    graft.Bench.tmpfsLocalDir().foreach(d => builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // (a) many one-file fast-append commits with DISJOINT id ranges
    // (each commit i covers ids [1000i, 1000i+999] — the shape a
    // partition-of-time streaming sink produces)
    val table = java.nio.file.Files.createTempDirectory("iceberg-probe").toString
    val times = (0 until nCommits).map { i =>
      val df = ((i * 1000L) until (i * 1000L + 1000L)).map(id => (id, s"v$id"))
        .toDF("id", "v").coalesce(1)
      timed(IcebergLog.writeBatch(df, table, txn = Some(("probe", i.toLong))))._2
    }
    val m = IcebergLog.current(table).get
    val snap = m.snapshots.find(_.get("snapshot-id").asLong == m.currentSnapshotId).get
    val listLen = IcebergLog.readManifestList(snap.get("manifest-list").asText).size
    val (live, total) = IcebergLog.planFiles(spark, table, None, None)
    def avg(s: Seq[Double]): Double = s.sum / s.size
    println(f"[iceberg-probe] commits=$nCommits manifestList=$listLen " +
      f"(merge keeps it << commits) liveFiles=$total " +
      f"commit(first10)=${avg(times.take(10))}%.3fs " +
      f"commit(last10)=${avg(times.takeRight(10))}%.3fs")

    // (b) metrics pruning: a 10-file point lookup and a 10%-band scan
    val (pt, tPt) = timed(IcebergLog.planFiles(spark, table, None,
      Some(s"id >= ${nCommits / 2 * 1000} AND id < ${nCommits / 2 * 1000 + 500}")))
    val (band, tBand) = timed(IcebergLog.planFiles(spark, table, None,
      Some(s"id < ${nCommits * 100}")))
    println(f"[iceberg-probe] prune: point-range kept=${pt._1.size}/$total " +
      f"(${tPt}%.3fs)  10%%-band kept=${band._1.size}/$total (${tBand}%.3fs)")

    // (c) compaction + expiration keep read cost flat afterward
    val (_, tOpt) = timed(IcebergLog.rewriteDataFiles(spark, table))
    val (_, tExp) = timed(IcebergLog.expireSnapshots(spark, table, olderThanMs = 0L))
    val after = IcebergLog.planFiles(spark, table, None, None)._2
    val (n, tRead) = timed(IcebergLog.read(spark, table).count())
    println(f"[iceberg-probe] optimize=${tOpt}%.2fs expire=${tExp}%.2fs " +
      f"files $total->$after rows=$n read=${tRead}%.2fs")
    spark.stop()
  }
}
