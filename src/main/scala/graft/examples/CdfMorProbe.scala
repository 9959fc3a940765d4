package graft.examples

import graft.sinks.{Cdf, DeltaLog, IcebergLog, Merge}
import org.apache.spark.sql.functions._

/** SCALE.md probe for CDF × MERGE-ON-READ composed (r12): the r11 rows
  * probed the change feed over copy-on-write DML and the MoR paths
  * WITHOUT the feed; this pins the composition:
  *
  *   (a) delta: a DV (merge-on-read) DELETE with CDF on vs off — the
  *       change-row computation must stay bounded by the DELETE (the
  *       retracted rows), never the table
  *   (b) iceberg: the equality-upsert landing curve with a change-feed
  *       STREAM attached — the commit itself must stay zero-read/flat
  *       (iceberg's changelog is derived at read time, so the write
  *       side pays nothing; the view sync pays one copy of the change)
  *   (c) the auto-compact trigger (graft.auto-optimize.deleted-ratio):
  *       per-commit cost of the metadata-only ratio check + the
  *       occasional triggered dirty-file compaction, vs an untriggered
  *       run — the price of never letting scan rent accumulate
  *   (d) two-hop chain steady state: upsert commit → change-feed sync →
  *       updating-agg drain → mirror row visible (the all-SQL Debezium
  *       chain's per-batch latency, measured at the Scala seam)
  *
  * Usage: runMain graft.examples.CdfMorProbe [nFiles] [rowsPerFile]
  */
object CdfMorProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = if (args.length > 0) args(0).toInt else 200
    val rowsPerFile = if (args.length > 1) args(1).toLong else 50000L
    val builder = graft.GraftSession.builder("cdf-mor-probe")
    graft.Bench.tmpfsLocalDir().foreach(d => builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val n = nFiles * rowsPerFile
    def freshDelta(conf: Map[String, String]): String = {
      val t = java.nio.file.Files.createTempDirectory("cmp-delta").resolve("t").toString
      DeltaLog.writeBatch(spark.range(n).select(col("id").as("k"),
        (col("id") % 997 * 1.0).as("v")).repartitionByRange(nFiles, col("k")),
        t, tableConf = conf)
      t
    }

    // (a) DV DELETE, CDF off vs on — identical predicate, fresh tables;
    // each table takes a WARM-UP delete first so the measured pair
    // compares like for like (the first delete on a cold table pays
    // page-cache population, not CDF)
    val dvOff = freshDelta(Map("delta.enableDeletionVectors" -> "true"))
    DeltaLog.deleteWhere(spark, dvOff, "k >= 2000 AND k < 2010")
    val (_, tOff) = timed(DeltaLog.deleteWhere(spark, dvOff, "k < 1000"))
    val dvOn = freshDelta(Map("delta.enableDeletionVectors" -> "true",
      Cdf.enableProp -> "true"))
    DeltaLog.deleteWhere(spark, dvOn, "k >= 2000 AND k < 2010")
    val (_, tOn) = timed(DeltaLog.deleteWhere(spark, dvOn, "k < 1000"))
    val cdcBytes = {
      val p = java.nio.file.Paths.get(dvOn, Cdf.changeDataDir)
      if (!java.nio.file.Files.exists(p)) 0L
      else {
        val s = java.nio.file.Files.walk(p)
        try { import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
            .map(java.nio.file.Files.size).sum } finally s.close()
      }
    }
    println(f"[cdf-mor] (a) DV delete 1k rows of $n: cdf_off=${tOff}%.2fs " +
      f"cdf_on=${tOn}%.2fs cdc=${cdcBytes / 1024}%d KiB")

    // (b) iceberg equality-upsert landing curve with a change-feed stream
    val iceN = math.min(n, 2000000L) // landing curve doesn't need 10M
    val ice = java.nio.file.Files.createTempDirectory("cmp-ice").toString
    IcebergLog.writeBatch(spark.range(iceN).select(col("id").as("k"),
      (col("id") % 997 * 1.0).as("v")).repartitionByRange(16, col("k")), ice)
    IcebergLog.setTableProperties(spark, ice, Map("write.upsert.enabled" -> "true"))
    val (dfI, viewI) = graft.sources.IcebergStreamSource.open(spark, ice,
      changeFeed = true, keys = Seq("k"))
    val qI = dfI.writeStream.format("noop")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100)).start()
    try {
      qI.processAllAvailable()
      val commits = (1 to 8).map { i =>
        val batch = spark.range(1000).select(
          (col("id") * (iceN / 1000) + i).as("k"),
          lit(i.toDouble).as("v"), lit(false).as("__graft_deleted"))
        val (_, tC) = timed(IcebergLog.upsertAppend(spark, ice, batch, Seq("k")))
        val (_, tS) = timed { viewI.sync(); qI.processAllAvailable() }
        (tC, tS)
      }
      val cs = commits.map(_._1)
      println(f"[cdf-mor] (b) eq-upsert 8×1k under change-feed stream: " +
        f"commit min=${cs.min}%.2fs max=${cs.max}%.2fs " +
        f"(flat iff zero-read survives CDF) sync avg=${commits.map(_._2).sum / 8}%.2fs")
    } finally { qI.stop(); viewI.close() }

    // (c) the auto-compact trigger: same upsert run with/without the ratio
    def upsertRun(table: String, rounds: Int): Seq[Double] =
      (1 to rounds).map { i =>
        val batch = spark.range(20000).select(
          (col("id") * 50 + i).as("k"), lit(i.toDouble).as("v"),
          lit(false).as("__graft_deleted"))
        timed(IcebergLog.upsertAppend(spark, table, batch, Seq("k")))._2
      }
    val icePlain = java.nio.file.Files.createTempDirectory("cmp-ice-pl").toString
    val iceAuto = java.nio.file.Files.createTempDirectory("cmp-ice-au").toString
    Seq(icePlain, iceAuto).foreach { t =>
      IcebergLog.writeBatch(spark.range(1000000L).select(col("id").as("k"),
        (col("id") % 997 * 1.0).as("v")).repartitionByRange(16, col("k")), t)
    }
    IcebergLog.setTableProperties(spark, icePlain, Map("write.upsert.enabled" -> "true"))
    IcebergLog.setTableProperties(spark, iceAuto, Map(
      "write.upsert.enabled" -> "true", DeltaLog.autoOptimizeProp -> "0.05"))
    val plain = upsertRun(icePlain, 10)
    val auto = upsertRun(iceAuto, 10)
    val delsPlain = IcebergLog.deleteFiles(icePlain, None).size
    val delsAuto = IcebergLog.deleteFiles(iceAuto, None).size
    println(f"[cdf-mor] (c) 10×20k upserts on 1M rows: plain per-commit " +
      f"min=${plain.min}%.2fs max=${plain.max}%.2fs (deletes left: $delsPlain) | " +
      f"auto@0.05 min=${auto.min}%.2fs max=${auto.max}%.2fs total=${auto.sum}%.1fs " +
      f"vs plain total=${plain.sum}%.1fs (deletes left: $delsAuto)")

    // (d) two-hop steady state: upsert → change feed → updating agg → mirror
    val hopA = freshDelta(Map(Cdf.enableProp -> "true"))
    val mirror = new java.util.concurrent.atomic.AtomicReference[Map[Long, Double]](Map.empty)
    val (dfA, viewA) = graft.sources.DeltaStreamSource.open(spark, hopA,
      changeFeed = true, keys = Seq("k"))
    val qA = dfA
      .groupBy((col("k") % 100).as("g")).agg(sum("v").as("s"))
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val m = b.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        mirror.updateAndGet(old => old ++ m); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100)).start()
    try {
      qA.processAllAvailable()
      // r13 DECOMPOSITION: where the per-batch seconds go — the upsert
      // commit, the change-feed sync (materialize + link), and the
      // streaming drain (micro-batch planning + agg state + collect) —
      // and does the floor move with batch size (machinery vs data)
      def hop(i: Int, rows: Long): (Double, Double, Double) = {
        val (_, tUp) = timed {
          Merge.upsertBatch(spark, "delta", hopA,
            spark.range(rows).select((col("id") * 777 + i).as("k"),
              lit(i * 1.0).as("v")), Seq("k"))
        }
        val (_, tSync) = timed(viewA.sync())
        val (_, tDrain) = timed(qA.processAllAvailable())
        (tUp, tSync, tDrain)
      }
      val lat = (1 to 5).map(i => hop(i, 1000L))
      val tot = lat.map(t => t._1 + t._2 + t._3)
      println(f"[cdf-mor] (d) two-hop upsert→feed→agg→mirror, 5×1k batches: " +
        f"min=${tot.min}%.2fs max=${tot.max}%.2fs avg=${tot.sum / 5}%.2fs | " +
        f"decomposed avg: upsert=${lat.map(_._1).sum / 5}%.2fs " +
        f"sync=${lat.map(_._2).sum / 5}%.2fs drain=${lat.map(_._3).sum / 5}%.2fs")
      val big = (6 to 8).map(i => hop(i, 50000L))
      val bigTot = big.map(t => t._1 + t._2 + t._3)
      println(f"[cdf-mor] (d') same chain, 3×50k batches (50× the rows): " +
        f"avg=${bigTot.sum / 3}%.2fs (upsert=${big.map(_._1).sum / 3}%.2fs " +
        f"sync=${big.map(_._2).sum / 3}%.2fs drain=${big.map(_._3).sum / 3}%.2fs) " +
        "— a flat total vs (d) means the floor is trigger machinery, not data")
    } finally { qA.stop(); viewA.close() }

    // (d'') the win the decomposition reveals: hop 1 dominates via the
    // COPY-ON-WRITE MERGE (rewrites every key-hit file of the 10M-row
    // target); the same chain over a merge-on-read (deletion-vector)
    // table folds matches into bitmaps instead
    val hopB = freshDelta(Map(Cdf.enableProp -> "true",
      "delta.enableDeletionVectors" -> "true"))
    val (dfB, viewB) = graft.sources.DeltaStreamSource.open(spark, hopB,
      changeFeed = true, keys = Seq("k"))
    val qB = dfB
      .groupBy((col("k") % 100).as("g")).agg(sum("v").as("s"))
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect(); () }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100)).start()
    try {
      qB.processAllAvailable()
      def hopDv(i: Int): (Double, Double, Double) = {
        val (_, tUp) = timed {
          Merge.upsertBatch(spark, "delta", hopB,
            spark.range(1000).select((col("id") * 777 + i).as("k"),
              lit(i * 1.0).as("v")), Seq("k"))
        }
        val (_, tSync) = timed(viewB.sync())
        val (_, tDrain) = timed(qB.processAllAvailable())
        (tUp, tSync, tDrain)
      }
      val dv = (1 to 5).map(hopDv)
      val dvTot = dv.map(t => t._1 + t._2 + t._3)
      println(f"[cdf-mor] (d'') same chain, hop 1 on a DELETION-VECTOR table, " +
        f"5×1k: avg=${dvTot.sum / 5}%.2fs (upsert=${dv.map(_._1).sum / 5}%.2fs " +
        f"sync=${dv.map(_._2).sum / 5}%.2fs drain=${dv.map(_._3).sum / 5}%.2fs)")
    } finally { qB.stop(); viewB.close() }

    // (d''') the flat-landing variant: hop 1 on an ICEBERG
    // write.upsert.enabled table — the zero-read equality commit is the
    // engine's latency-sensitive CDC answer; this makes the whole-chain
    // number a measurement, not an inference from (b)
    val hopC = java.nio.file.Files.createTempDirectory("cmp-hop-ice").toString
    IcebergLog.writeBatch(spark.range(n).select(col("id").as("k"),
      (col("id") % 997 * 1.0).as("v")).repartitionByRange(nFiles, col("k")), hopC)
    IcebergLog.setTableProperties(spark, hopC,
      Map("write.upsert.enabled" -> "true"))
    val (dfC, viewC) = graft.sources.IcebergStreamSource.open(spark, hopC,
      changeFeed = true, keys = Seq("k"))
    val qC = dfC
      .groupBy((col("k") % 100).as("g")).agg(sum("v").as("s"))
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect(); () }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100)).start()
    try {
      qC.processAllAvailable()
      def hopIce(i: Int): (Double, Double, Double) = {
        val (_, tUp) = timed {
          Merge.upsertBatch(spark, "iceberg", hopC,
            spark.range(1000).select((col("id") * 777 + i).as("k"),
              lit(i * 1.0).as("v")), Seq("k"), orderBy = Some("v"))
        }
        val (_, tSync) = timed(viewC.sync())
        val (_, tDrain) = timed(qC.processAllAvailable())
        (tUp, tSync, tDrain)
      }
      val ic = (1 to 5).map(hopIce)
      val icTot = ic.map(t => t._1 + t._2 + t._3)
      println(f"[cdf-mor] (d''') same chain, hop 1 = ICEBERG equality upsert " +
        f"(zero-read), 5×1k: avg=${icTot.sum / 5}%.2fs " +
        f"(upsert=${ic.map(_._1).sum / 5}%.2fs sync=${ic.map(_._2).sum / 5}%.2fs " +
        f"drain=${ic.map(_._3).sum / 5}%.2fs)")
    } finally { qC.stop(); viewC.close() }

    // (e) APPEND-ONLY iceberg change-feed sync: raw-link (r14, the
    // retraction-free fast path) vs materialized copy (forced by one
    // tiny warm-up DELETE that flips the view's retraction flag) —
    // same appends, same view machinery, the delta-link economics
    // question from the r13 verdict. 100k-row append commits.
    def appendChain(forceMaterialize: Boolean): Double = {
      val t = java.nio.file.Files.createTempDirectory("cmp-ice-app").toString
      IcebergLog.writeBatch(spark.range(100000).select(col("id").as("k"),
        (col("id") * 1.0).as("v")).coalesce(4), t)
      IcebergLog.setTableProperties(spark, t,
        Map("write.delete.mode" -> "merge-on-read"))
      val (dfE, viewE) = graft.sources.IcebergStreamSource.open(spark, t,
        changeFeed = true, keys = Seq("k"))
      val qE = dfE.writeStream.format("noop")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100)).start()
      try {
        qE.processAllAvailable()
        if (forceMaterialize) {
          IcebergLog.deleteWhere(spark, t, "k = 0")
          viewE.sync(); qE.processAllAvailable()
        }
        val times = (1 to 5).map { i =>
          IcebergLog.writeBatch(spark.range(100000)
            .select((col("id") + i * 1000000L).as("k"), (col("id") * 1.0).as("v"))
            .coalesce(4), t)
          val (_, tSync) = timed(viewE.sync())
          qE.processAllAvailable()
          tSync
        }
        times.sum / times.size
      } finally { qE.stop(); viewE.close() }
    }
    val linkSync = appendChain(forceMaterialize = false)
    val matSync = appendChain(forceMaterialize = true)
    println(f"[cdf-mor] (e) append-only iceberg change-feed sync, 5×100k-row " +
      f"commits: raw-link=${linkSync}%.3fs/commit vs " +
      f"materialized=${matSync}%.3fs/commit (${matSync / linkSync}%.1f×)")

    spark.stop()
  }
}
