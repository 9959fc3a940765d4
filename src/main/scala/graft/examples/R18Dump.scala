package graft.examples

/** Round-18 result-equality harness (dev tool): runs named declared queries
  * and writes each one's FULL result set — every row rendered to a string,
  * sorted — to <outDir>/<query>.txt. Diffing the dumps from two trees proves
  * an optimization preserved a query's output byte-for-byte (the r17
  * q_minhash_lsh byte-compare, generalized).
  *
  * Usage: runMain graft.examples.R18Dump <sfDir> <outDir> [q1 q2 ...]
  */
object R18Dump {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("r18-dump")
    val dir = args(0)
    val outDir = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq else graft.SparkEntry.headline
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val qmap = graft.SparkEntry.queries

    names.foreach { name =>
      val df = qmap(name)(spark, dir)
      val rows = df.collect().map(_.toString).sorted
      val body = s"# $name cols=${df.columns.mkString(",")} rows=${rows.length}\n" +
        rows.mkString("\n") + "\n"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$name.txt"), body.getBytes("UTF-8"))
      println(s"[dump] $outDir/$name.txt rows=${rows.length}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
