package graft.examples

import graft.sinks.{DeltaLog, Merge}
import org.apache.spark.sql.functions._

/** SCALE.md probe for MERGE INTO / the merge_keys upsert sink: the
  * 100 TB question is whether a SMALL CDC batch against a LARGE table
  * plans O(files-overlapping-the-batch), not O(table). The table is
  * written range-partitioned on the key so file stats carry disjoint
  * key bounds (the layout OPTIMIZE ZORDER BY / a sorted ingest produces);
  * the CDC batch touches one narrow key range plus fresh inserts. The
  * probe reports how many files each verb REMOVED (= rewrote) and wall
  * time, against a full-reconcile NMBS merge as the everything-touched
  * contrast.
  *
  * Usage: runMain graft.examples.MergeProbe [nFiles] [rowsPerFile]
  */
object MergeProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = if (args.length > 0) args(0).toInt else 200
    val rowsPerFile = if (args.length > 1) args(1).toLong else 50000L
    val builder = graft.GraftSession.builder("merge-probe")
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
    val base = spark.range(n).select(col("id").as("k"),
      (col("id") % 997 * 1.0).as("v"))
      .repartitionByRange(nFiles, col("k"))
    val table = java.nio.file.Files.createTempDirectory("merge-probe").toString
    val (_, tWrite) = timed(DeltaLog.writeBatch(base, table))
    def files = DeltaLog.snapshot(spark, table).get.files.toSet
    val f0 = files
    println(f"[merge-probe] rows=$n files=${f0.size} write=${tWrite}%.2fs")

    // (a) narrow CDC merge: 1k updates inside one file's range + 1k inserts
    val cdc = spark.range(1000).select(col("id").as("k"), lit(-1.0).as("v"))
      .unionAll(spark.range(n, n + 1000).select(col("id").as("k"), lit(-2.0).as("v")))
    val clauses = Merge.Clauses("t", "s", "t.k = s.k",
      Seq(Merge.MatchedClause(None, Left(Seq("v" -> "s.v")))),
      Some((None, Seq.empty)))
    val (_, tMerge) = timed(DeltaLog.merge(spark, table, cdc, clauses))
    val f1 = files
    val removedA = (f0 -- f1).size
    println(f"[merge-probe] (a) narrow merge: removed=$removedA " +
      f"added=${(f1 -- f0).size} t=${tMerge}%.2fs " +
      f"(expect removed ≈ files overlapping [0,1000) ≪ ${f0.size})")

    // (b) upsert-sink batch (merge_keys path), same narrow range
    val ups = spark.range(2000, 3000).select(col("id").as("k"), lit(-3.0).as("v"))
    val (_, tUps) = timed(Merge.upsertBatch(spark, "delta", table, ups, Seq("k")))
    val f2 = files
    println(f"[merge-probe] (b) upsert batch: removed=${(f1 -- f2).size} t=${tUps}%.2fs")

    // (c) contrast #1: a conditional NMBS clause whose predicate no row
    //     satisfies — every file must still be READ (no source-bounds
    //     pruning under NMBS) but none rewrites
    val nmbsCold = clauses.copy(notMatchedInsert = None,
      notBySource = Seq(Merge.MatchedClause(Some("t.v < -900"), Left(Seq("v" -> "0.0")))))
    val (_, tCold) = timed(DeltaLog.merge(spark, table, cdc, nmbsCold))
    val f3 = files
    println(f"[merge-probe] (c) NMBS no-hit reconcile: removed=${(f2 -- f3).size} " +
      f"of ${f2.size} t=${tCold}%.2fs (full READ; only the matched-clause file rewrites)")

    // (d) contrast #2: an NMBS clause most rows satisfy — the honest
    //     full-table-rewrite cost a snapshot sync pays by semantics
    val nmbsHot = clauses.copy(notMatchedInsert = None,
      notBySource = Seq(Merge.MatchedClause(Some("t.v >= 0"), Left(Seq("v" -> "t.v + 0.0")))))
    val (_, tHot) = timed(DeltaLog.merge(spark, table, cdc, nmbsHot))
    val f4 = files
    println(f"[merge-probe] (d) NMBS full reconcile: removed=${(f3 -- f4).size} " +
      f"of ${f3.size} t=${tHot}%.2fs (full-table verb by semantics)")

    // the r11 skew axes run against FRESH range-partitioned tables —
    // (d)'s full reconcile coalesced the table to one file, which would
    // make every later "removed of N" row meaningless
    def freshTable(): String = {
      val t = java.nio.file.Files.createTempDirectory("merge-probe").toString
      DeltaLog.writeBatch(base, t)
      t
    }
    def filesOf(t: String) = DeltaLog.snapshot(spark, t).get.files.toSet

    // (e) SKEW axis (r11): a batch whose keys ALL land in ONE hot target
    //     file — the adversarial case for key-bounds pruning (bounds
    //     cover one file exactly) and for the rewrite (one task rewrites
    //     the hot file while the rest of the cluster idles; bounded by
    //     one file's rows, so acceptable by construction)
    val tHotTable = freshTable()
    val e0 = filesOf(tHotTable)
    val hotLo = 5 * rowsPerFile // inside one mid-table file
    val hot = spark.range(hotLo, hotLo + rowsPerFile / 2)
      .select(col("id").as("k"), lit(-4.0).as("v"))
    val (_, tSkew) = timed(DeltaLog.merge(spark, tHotTable, hot, clauses))
    println(f"[merge-probe] (e) hot-file skew merge: " +
      f"removed=${(e0 -- filesOf(tHotTable)).size} of ${e0.size} " +
      f"t=${tSkew}%.2fs (expect 1-2 files — cost bounded by the hot file)")

    // (f) SPREAD axis (r11): the same batch SIZE spread across every
    //     file (k ≡ 0 mod rowsPerFile) — bounds cover the whole table,
    //     pruning keeps everything, every file rewrites: the honest
    //     worst case, equivalent to a full-table UPDATE; the rewrite
    //     parallelizes and re-coalesces toward the 128 MB target
    val tSpreadTable = freshTable()
    val s0 = filesOf(tSpreadTable)
    val spread = spark.range(nFiles.toLong)
      .select((col("id") * rowsPerFile).as("k"), lit(-5.0).as("v"))
    val (_, tSpread) = timed(DeltaLog.merge(spark, tSpreadTable, spread, clauses))
    println(f"[merge-probe] (f) all-files spread merge: " +
      f"removed=${(s0 -- filesOf(tSpreadTable)).size} of ${s0.size} t=${tSpread}%.2fs")

    // (g) full-table UPDATE (r11): every file touched; exercises the
    //     coalesce-sized rewrite + pooled stats harvest end-to-end
    val tFullTable = freshTable()
    val g0 = filesOf(tFullTable)
    val (_, tFull) = timed(DeltaLog.updateWhere(spark, tFullTable,
      Seq("v" -> "v + 1"), None))
    println(f"[merge-probe] (g) full-table UPDATE: " +
      f"removed=${(g0 -- filesOf(tFullTable)).size} of ${g0.size} t=${tFull}%.2fs")
    spark.stop()
  }
}
