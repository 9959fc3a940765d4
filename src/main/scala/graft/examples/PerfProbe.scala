package graft.examples

import graft.operators.Dedup
import graft.Tables
import org.apache.spark.sql.functions._

/** Stage-by-stage timing probe for the dedup operators (dev tool). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("perf-probe")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.load(spark, dir, "documents")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    t("shingles.count")(Dedup.shingles(docs, "doc_id", "text", 2).count())
    t("signatures.count")(
      Dedup.minhashSignatures(docs, "doc_id", "text", 2, 64).count())
    t("minhashLshPairs.count")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 2, 64, 16, 0.5).count())
    t("minhashLshPairs again")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 2, 64, 16, 0.5).count())
    t("ngramJaccard.count")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.2, 100).count())
    spark.stop()
  }
}
