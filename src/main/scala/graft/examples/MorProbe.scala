package graft.examples

import graft.sinks.IcebergLog
import org.apache.spark.sql.functions._

/** SCALE.md probe for iceberg merge-on-read: the 100 TB question is
  * whether row-level DML cost scales with the ROWS CHANGED instead of
  * the files they live in. Each axis contrasts a copy-on-write table
  * with a merge-on-read twin (same rows, same layout):
  *
  *   (a) narrow DELETE (1k contiguous keys, one file's range)
  *   (b) spread DELETE (1 key per file — every file touched: CoW's
  *       honest worst case, MoR's flat case)
  *   (c) full-scan read AFTER the spread delete — what the position
  *       anti-join costs when EVERY file is dirty (the worst read case;
  *       bounds confine the narrow case to one file)
  *   (d) OPTIMIZE: applies + purges the deletes, restoring clean reads
  *
  * Usage: runMain graft.examples.MorProbe [nFiles] [rowsPerFile]
  */
object MorProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = if (args.length > 0) args(0).toInt else 200
    val rowsPerFile = if (args.length > 1) args(1).toLong else 50000L
    val builder = graft.GraftSession.builder("mor-probe")
    graft.Bench.tmpfsLocalDir().foreach(d => builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val n = nFiles * rowsPerFile
    def mkTable(mor: Boolean): String = {
      val t = java.nio.file.Files.createTempDirectory("mor-probe").toString
      IcebergLog.writeBatch(spark.range(n)
        .select(col("id").as("k"), (col("id") % 997 * 1.0).as("v"))
        .repartitionByRange(nFiles, col("k")), t)
      if (mor) IcebergLog.setTableProperties(spark, t, Map(
        "write.delete.mode" -> "merge-on-read",
        "write.update.mode" -> "merge-on-read",
        "write.merge.mode" -> "merge-on-read"))
      t
    }
    def live(t: String) = IcebergLog.liveFiles(t, None).filter(_.status != 2)
    def dels(t: String) = IcebergLog.deleteFiles(t, None)

    val cow = mkTable(false)
    val mor = mkTable(true)
    println(s"[mor-probe] rows=$n files=$nFiles " +
      f"tableBytes=${live(cow).map(_.size).sum / 1e6}%.1f MB")

    // (a) narrow DELETE: 1k contiguous keys inside one file's range
    val f0c = live(cow).map(_.path).toSet
    val (_, taCow) = timed(IcebergLog.deleteWhere(spark, cow,
      s"k >= ${5 * rowsPerFile} AND k < ${5 * rowsPerFile + 1000}"))
    val rewroteA = (f0c -- live(cow).map(_.path).toSet).size
    val bytesA = live(cow).filterNot(f => f0c.contains(f.path)).map(_.size).sum
    val (_, taMor) = timed(IcebergLog.deleteWhere(spark, mor,
      s"k >= ${5 * rowsPerFile} AND k < ${5 * rowsPerFile + 1000}"))
    val dA = dels(mor)
    println(f"[mor-probe] (a) narrow 1k-row DELETE: CoW rewrote $rewroteA " +
      f"files (${bytesA / 1e3}%.0f kB) in ${taCow}%.2fs; MoR wrote " +
      f"${dA.size} delete file (${dA.map(_.size).sum / 1e3}%.0f kB, " +
      f"${dA.map(_.records).sum} positions) in ${taMor}%.2fs, rewrote 0")

    // (b) spread DELETE: one key per file — every file touched
    val f1c = live(cow).map(_.path).toSet
    val (_, tbCow) = timed(IcebergLog.deleteWhere(spark, cow,
      s"k % $rowsPerFile = 1"))
    val rewroteB = (f1c -- live(cow).map(_.path).toSet).size
    val bytesB = live(cow).filterNot(f => f1c.contains(f.path)).map(_.size).sum
    val (_, tbMor) = timed(IcebergLog.deleteWhere(spark, mor,
      s"k % $rowsPerFile = 1"))
    val dB = dels(mor)
    println(f"[mor-probe] (b) spread $nFiles-row DELETE (every file hit): " +
      f"CoW rewrote $rewroteB files (${bytesB / 1e6}%.1f MB) in ${tbCow}%.2fs; " +
      f"MoR wrote ${dB.map(_.size).sum - dA.map(_.size).sum} delete bytes in " +
      f"${tbMor}%.2fs, rewrote 0")

    // (c) read cost with every file dirty vs the compacted CoW table
    val (cntCow, tcCow) = timed(IcebergLog.read(spark, cow)
      .agg(sum(col("v"))).collect()(0))
    val (cntMor, tcMor) = timed(IcebergLog.read(spark, mor)
      .agg(sum(col("v"))).collect()(0))
    require(cntCow == cntMor, s"$cntCow != $cntMor")
    println(f"[mor-probe] (c) full-scan agg, all files dirty: " +
      f"CoW(clean) ${tcCow}%.2fs vs MoR(anti-join) ${tcMor}%.2fs " +
      f"(${tcMor / tcCow}%.2fx)")

    // (d) OPTIMIZE applies + purges; reads return to clean-scan cost
    val (_, td) = timed(IcebergLog.rewriteDataFiles(spark, mor,
      smallBytes = Some(1L)))
    require(dels(mor).isEmpty)
    val (_, tcAfter) = timed(IcebergLog.read(spark, mor)
      .agg(sum(col("v"))).collect()(0))
    println(f"[mor-probe] (d) OPTIMIZE purge: ${td}%.2fs; clean re-scan " +
      f"${tcAfter}%.2fs; deleteFiles=0")

    // (e) landing a 1k-key spread CDC batch, three ways: copy-on-write
    //     MERGE (rewrites every key-hit file), merge-on-read MERGE
    //     (position deletes — still READS the pruned candidates), and
    //     the write.upsert.enabled equality path (reads NOTHING)
    import spark.implicits._
    def cdcBatch = spark.range(1000)
      .select((col("id") * (n / 1000)).as("k"), lit(-9.0).as("v"),
        lit(false).as("__graft_deleted"))
    val keys = Seq("k")
    val clauses = graft.sinks.Merge.upsertClauses(keys, Seq("k", "v"),
      uniqueByKey = true)
    val tCowM = mkTable(false)
    val (_, teCow) = timed(IcebergLog.merge(spark, tCowM, cdcBatch, clauses))
    val rewroteE = live(tCowM).count(_.dataSeq > 1L)
    val tMorM = mkTable(true)
    val (_, teMor) = timed(IcebergLog.merge(spark, tMorM, cdcBatch, clauses))
    val tEq = mkTable(false)
    IcebergLog.setTableProperties(spark, tEq, Map("write.upsert.enabled" -> "true"))
    val (_, teEq) = timed(graft.sinks.Merge.upsertBatch(spark, "iceberg", tEq,
      cdcBatch.drop("__graft_deleted"), keys, orderBy = Some("v")))
    println(f"[mor-probe] (e) 1k-key spread CDC batch: CoW MERGE ${teCow}%.2fs " +
      f"(rewrote+added $rewroteE files), MoR MERGE ${teMor}%.2fs " +
      f"(pos-deletes, reads candidates), equality upsert ${teEq}%.2fs " +
      f"(reads NOTHING — O(batch) whatever the table size)")
    val (ce, teRead) = timed(IcebergLog.read(spark, tEq).count())
    require(ce == n + 0L, s"$ce != $n") // 1000 keys updated in place
    println(f"[mor-probe] (e) read after equality upsert: ${teRead}%.2fs, " +
      f"rows=$ce")

    // (f) the DELTA twin — deletion vectors: the same spread DELETE
    //     (one key per file) as axis (b), CoW vs DV
    import graft.sinks.DeltaLog
    def mkDelta(dv: Boolean): String = {
      val t = java.nio.file.Files.createTempDirectory("mor-probe-delta")
        .resolve("t").toString
      DeltaLog.writeBatch(spark.range(n)
        .select(col("id").as("k"), (col("id") % 997 * 1.0).as("v"))
        .repartitionByRange(nFiles, col("k")), t,
        tableConf = if (dv) Map("delta.enableDeletionVectors" -> "true")
          else Map.empty)
      t
    }
    val dCow = mkDelta(false)
    val dDv = mkDelta(true)
    val c0 = DeltaLog.snapshot(spark, dCow).get.files.toSet
    val (_, tfCow) = timed(DeltaLog.deleteWhere(spark, dCow,
      s"k % $rowsPerFile = 1"))
    val sCow = DeltaLog.snapshot(spark, dCow).get
    val rewroteF = (c0 -- sCow.files.toSet).size
    val bytesF = sCow.adds.filterNot { case (p, _) => c0.contains(p) }
      .map(_._2.size).sum
    val (_, tfDv) = timed(DeltaLog.deleteWhere(spark, dDv,
      s"k % $rowsPerFile = 1"))
    val sDv = DeltaLog.snapshot(spark, dDv).get
    val dvBytes = sDv.adds.flatMap(_._2.dv).map(_.sizeInBytes.toLong).sum
    println(f"[mor-probe] (f) delta spread $nFiles-row DELETE: CoW rewrote " +
      f"$rewroteF files (${bytesF / 1e6}%.1f MB) in ${tfCow}%.2fs; DV wrote " +
      f"$dvBytes bitmap bytes across ${sDv.adds.count(_._2.dv.isDefined)} " +
      f"vectors in ${tfDv}%.2fs, rewrote 0")
    val (cfCow, tgCow) = timed(DeltaLog.read(spark, dCow)
      .agg(sum(col("v"))).collect()(0))
    val (cfDv, tgDv) = timed(DeltaLog.read(spark, dDv)
      .agg(sum(col("v"))).collect()(0))
    require(cfCow == cfDv, s"$cfCow != $cfDv")
    println(f"[mor-probe] (f) full-scan agg, all files DV-dirty: " +
      f"CoW(clean) ${tgCow}%.2fs vs DV(bitmap filter) ${tgDv}%.2fs " +
      f"(${tgDv / tgCow}%.2fx)")
    val (_, th) = timed(DeltaLog.optimize(spark, dDv, smallFileBytes = 1L))
    require(DeltaLog.snapshot(spark, dDv).get.adds.forall(_._2.dv.isEmpty))
    println(f"[mor-probe] (f) delta OPTIMIZE purge: ${th}%.2fs; DVs=0")

    // (g) the CDC landing CURVE: 16 consecutive 1k-key micro-batches
    //     through the merge_keys sink, copy-on-write MERGE vs the
    //     equality-upsert path — the claim under test is that eq commits
    //     stay FLAT while MERGE keeps paying the target read
    def landCurve(upsert: Boolean): Seq[Double] = {
      val t = mkTable(false)
      if (upsert) IcebergLog.setTableProperties(spark, t,
        Map("write.upsert.enabled" -> "true"))
      (0 until 16).map { b =>
        val batch = spark.range(1000)
          .select((col("id") * (n / 1000) + b).as("k"),
            lit(-100.0 - b).as("v"))
        val (_, dt) = timed(graft.sinks.Merge.upsertBatch(spark, "iceberg",
          t, batch, Seq("k"), orderBy = Some("v")))
        dt
      }
    }
    val mergeCurve = landCurve(upsert = false)
    val eqCurve = landCurve(upsert = true)
    def fmtC(c: Seq[Double]) =
      f"first=${c.head}%.2fs last=${c.last}%.2fs total=${c.sum}%.1fs"
    println(s"[mor-probe] (g) 16x 1k-key batches: MERGE ${fmtC(mergeCurve)}; " +
      s"equality upsert ${fmtC(eqCurve)}")

    // (h) r13 PARTITION-SCOPED equality deletes: a partitioned table
    //     upserted by keys that COVER the partition column confines the
    //     anti-join rent to the dirty partition (delete manifests ride
    //     the table spec with real partition values); the global form
    //     taxes EVERY partition until OPTIMIZE
    def mkPart(): String = {
      val t = java.nio.file.Files.createTempDirectory("mor-probe-part").toString
      IcebergLog.writeBatch(spark.range(n)
        .select(col("id").as("k"), (col("id") % 997 * 1.0).as("v"),
          (col("id") % 16).as("p")), t, partitionBy = Seq("p"))
      IcebergLog.setTableProperties(spark, t,
        Map("write.upsert.enabled" -> "true"))
      t
    }
    def dirtyBatch = spark.range(1000).select(
      (col("id") * 16 + 3).as("k"), // every key lives in partition p=3
      lit(-5.0).as("v"), lit(3L).as("p"), lit(false).as("__graft_deleted"))
    val tScoped = mkPart()
    val (_, thS) = timed(IcebergLog.upsertAppend(spark, tScoped, dirtyBatch,
      Seq("p", "k")))
    val tGlobal = mkPart()
    val (_, thG) = timed(IcebergLog.upsertAppend(spark, tGlobal, dirtyBatch,
      Seq("k")))
    def cleanDirty(t: String): (Int, Int) = {
      val m = IcebergLog.current(t).get
      val liveF = IcebergLog.liveFiles(t, None).filter(_.status != 2)
      val (c, d) = IcebergLog.splitByDeletes(liveF,
        IcebergLog.deleteFiles(t, None), m.schema)
      (c.size, d.size)
    }
    val (cS, dS) = cleanDirty(tScoped)
    val (cG, dG) = cleanDirty(tGlobal)
    val (sumS, trS) = timed(IcebergLog.read(spark, tScoped)
      .filter(col("p") === 7).agg(sum(col("v"))).collect()(0).getDouble(0))
    val (sumG, trG) = timed(IcebergLog.read(spark, tGlobal)
      .filter(col("p") === 7).agg(sum(col("v"))).collect()(0).getDouble(0))
    require(sumS == sumG, s"$sumS != $sumG")
    println(f"[mor-probe] (h) partitioned upsert (16 partitions, batch dirties 1): " +
      f"SCOPED keys=(p,k): commit=${thS}%.2fs clean/dirty=$cS/$dS " +
      f"untouched-partition scan=${trS}%.2fs | GLOBAL keys=(k): " +
      f"commit=${thG}%.2fs clean/dirty=$cG/$dG " +
      f"untouched-partition scan=${trG}%.2fs")
    spark.stop()
  }
}
