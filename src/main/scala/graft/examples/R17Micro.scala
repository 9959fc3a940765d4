package graft.examples

import graft.operators.Dedup
import graft.Tables
import org.apache.spark.sql.functions._

/** Micro-timings for the tokenize/shingle expression pipeline (dev tool):
  * isolates which expression in the shared text path burns the CPU that
  * R17Probe attributed to the shingle-producing stages.
  */
object R17Micro {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("r17-micro")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    t("split+lower only")(
      docs.select(sum(size(split(lower(col("text")), "\\s+")))).collect()(0).getLong(0))
    t("tokens (filter HOF)")(
      docs.select(sum(size(toks))).collect()(0).getLong(0))
    t("explode(tokens)+count")(
      docs.select(explode(toks).as("t")).count())
    t("explode(tokens)+xxhash+groupBy(doc,term)")(
      docs.select(col("doc_id").as("doc"), explode(toks).as("term"))
        .select(col("doc"), xxhash64(col("term")).as("h"))
        .groupBy("doc", "h").count().count())
    val grams2 =
      when(size(toks) >= 2,
        transform(sequence(lit(0), size(toks) - 2),
          i => concat_ws(" ", slice(toks, i + 1, lit(2)))))
        .otherwise(array(concat_ws(" ", toks)))
    t("grams2 (transform+slice+concat_ws) size")(
      docs.select(sum(size(grams2))).collect()(0).getLong(0))
    t("array_distinct(transform(grams2,xxhash64))")(
      docs.select(sum(size(array_distinct(transform(grams2, s => xxhash64(s)))))).collect()(0).getLong(0))
    t("full shingles explode (Dedup.shingles)")(
      Dedup.shingles(docs, "doc_id", "text", 2).count())
    t("minhash signatures (shingleArrays+SigF)")(
      Dedup.minhashSignatures(docs, "doc_id", "text", 2, 64).count())
    spark.stop()
  }
}
