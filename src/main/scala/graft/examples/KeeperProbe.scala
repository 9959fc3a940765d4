package graft.examples
import graft.{GraftSession, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._
object KeeperProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("keeper-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val pairs = Dedup.ngramJaccardPairs(d, "doc_id", "text",
      shingleSize = 2, threshold = 0.2, maxDocFreq = 100).localCheckpoint(true)
    println(s"[keeper] pairs=${pairs.count()}")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      Dedup.keeperAssignment(d, "doc_id", pairs).count()
      println(f"[keeper] run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
