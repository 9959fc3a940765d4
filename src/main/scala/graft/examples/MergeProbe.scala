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
    spark.stop()
  }
}
