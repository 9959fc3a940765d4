package graft.examples

import graft.operators.{Dedup, TextAnalysis}
import graft.Tables
import org.apache.spark.sql.functions._

/** Micro-timings for the TextAnalysis per-doc HOF expressions (dev tool,
  * VERDICT r17 #7): measures whether the interpreted `aggregate()`/
  * `filter(isin)` lambdas in meanWordLen / stopwordRatio / languageId /
  * qualityScore / fingerprint are above environment noise at sf1 before
  * converting any of them to codegen'd expressions.
  */
object R18Micro {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("r18-micro")
    val dir = args.headOption.getOrElse("/tmp/bench-sf1")
    val docs = Tables.load(spark, dir, "documents").repartition(32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    docs.count()

    def t(name: String)(f: => Long): Unit = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e6, n)
      }
      println(f"$name%-44s ${runs.map(_._1).min}%8.1f ms  n=${runs.head._2}")
    }

    val toks = Dedup.tokens(col("text"))
    t("scan only: length(text)")(
      docs.select(sum(length(col("text")))).collect()(0).getLong(0))
    t("tokens (filter HOF) size")(
      docs.select(sum(size(toks))).collect()(0).getLong(0))
    t("meanWordLen (aggregate HOF)")(
      docs.select(sum(TextAnalysis.meanWordLen(col("text")).cast("long")))
        .collect()(0).getLong(0))
    t("stopwordRatio (filter+isin HOF)")(
      docs.select(sum((TextAnalysis.stopwordRatio(col("text")) * 1000).cast("long")))
        .collect()(0).getLong(0))
    t("languageId (5x filter+isin HOF)")(
      docs.select(sum(length(TextAnalysis.languageId(col("text")))))
        .collect()(0).getLong(0))
    t("qualityScore (all components)")(
      docs.select(sum((TextAnalysis.qualityScore(col("text")) * 1000).cast("long")))
        .collect()(0).getLong(0))
    t("fingerprint (aggregate-struct HOF)")(
      // decimal sum: 62-bit fingerprints overflow a long sum under ANSI
      docs.select(sum(TextAnalysis.fingerprint(col("text"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .collect()(0).getDecimal(0).longValue())
    t("gopherQualityFlags-ish: punct+upper+digit regex")(
      docs.select(sum((TextAnalysis.punctRatio(col("text"))
        + TextAnalysis.upperRatio(col("text"))
        + TextAnalysis.digitRatio(col("text")) * 1000).cast("long")))
        .collect()(0).getLong(0))
    spark.stop()
  }
}
