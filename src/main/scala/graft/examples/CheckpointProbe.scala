package graft.examples

import graft.sinks.DeltaLog

import java.nio.file.{Files, Paths}

/** SCALE.md probe: the delta CHECKPOINT-REPLAY ceiling. A 1000-executor
  * table at 100 TB carries ~10⁶ active files; every cold snapshot()
  * folds the whole checkpoint on the DRIVER. This probe fabricates a
  * 10⁶-add log directly (no data files needed — replay touches
  * metadata only), then measures:
  *
  *   (a) cold JSON replay (10 × 100k-add commits) — time + retained heap
  *   (b) checkpoint WRITE — time + the part count the multi-part
  *       threshold produces
  *   (c) cold replay FROM the checkpoint — time + retained heap (the
  *       steady-state cost every fresh reader pays)
  *
  * Usage: runMain graft.examples.CheckpointProbe [addsPerCommit] [commits]
  */
object CheckpointProbe {
  def main(args: Array[String]): Unit = {
    val addsPerCommit = if (args.length > 0) args(0).toInt else 100000
    val commits = if (args.length > 1) args(1).toInt else 10
    val builder = graft.GraftSession.builder("checkpoint-probe")
    graft.Bench.tmpfsLocalDir().foreach(d => builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def heapMb(): Long = {
      System.gc(); System.gc()
      val rt = Runtime.getRuntime
      (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
    }

    val table = Files.createTempDirectory("cp_probe").resolve("t").toString
    val log = Paths.get(table, "_delta_log")
    Files.createDirectories(log)

    // fabricate the log: realistic add actions (~350 B each — uuid
    // path, two-column stats), metaData/protocol in v0
    val t0 = System.nanoTime()
    var fileNo = 0L
    (0 until commits).foreach { v =>
      val sb = new StringBuilder(addsPerCommit * 360)
      if (v == 0) {
        sb.append("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""").append('\n')
        sb.append("""{"metaData":{"id":"cp-probe","format":{"provider":"parquet"},""")
          .append(""""schemaString":"{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"v\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}",""")
          .append(""""partitionColumns":[],"configuration":{},"createdTime":1700000000000}}""")
          .append('\n')
      }
      (0 until addsPerCommit).foreach { _ =>
        fileNo += 1
        val lo = fileNo * 1000
        sb.append("""{"add":{"path":"part-""").append(fileNo)
          .append("""-4fe3.parquet","partitionValues":{},"size":134217728,""")
          .append(""""modificationTime":1700000000000,"dataChange":true,""")
          .append(""""stats":"{\"numRecords\":500000,\"minValues\":{\"id\":""")
          .append(lo).append(""",\"v\":1},\"maxValues\":{\"id\":""").append(lo + 999)
          .append(""",\"v\":999999},\"nullCount\":{\"id\":0,\"v\":0}}"}}""")
          .append('\n')
      }
      Files.write(log.resolve(f"${v.toLong}%020d.json"),
        sb.toString.getBytes("UTF-8"))
    }
    val genSec = (System.nanoTime() - t0) / 1e9
    val totalAdds = addsPerCommit.toLong * commits
    println(f"[probe] fabricated $totalAdds%,d adds in $commits commits: $genSec%.1f s")

    val heap0 = heapMb()
    val (s1, jsonSec) = timed(DeltaLog.snapshot(spark, table).get)
    val heapJson = heapMb()
    println(f"[probe] (a) cold JSON replay: $jsonSec%.2f s, " +
      f"${s1.adds.size}%,d adds, retained heap ≈ ${heapJson - heap0} MB")

    val (_, cpSec) = timed(DeltaLog.writeCheckpoint(spark, table, (commits - 1).toLong))
    val parts = Files.list(log).iterator()
    var nParts = 0
    while (parts.hasNext) {
      if (parts.next().getFileName.toString.contains(".checkpoint.")) nParts += 1
    }
    println(f"[probe] (b) checkpoint write: $cpSec%.2f s, $nParts part(s) " +
      f"(threshold ${DeltaLog.checkpointRowsPerPart}%,d rows/part)")

    // cold replay FROM the checkpoint: age out the pre-checkpoint jsons
    (0 until commits).foreach(v =>
      Files.delete(log.resolve(f"${v.toLong}%020d.json")))
    DeltaLog.clearSnapshotCache()
    val heap1 = heapMb()
    val (s2, cpReplay) = timed(DeltaLog.snapshot(spark, table).get)
    val heapCp = heapMb()
    println(f"[probe] (c) cold checkpoint replay: $cpReplay%.2f s, " +
      f"${s2.adds.size}%,d adds, retained heap ≈ ${heapCp - heap1} MB")

    require(s2.adds.size == totalAdds, s"lost adds: ${s2.adds.size}")
    spark.stop()
  }
}
