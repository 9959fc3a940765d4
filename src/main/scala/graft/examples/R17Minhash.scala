package graft.examples

import graft.operators.Dedup
import graft.Tables
import org.apache.spark.sql.functions._

/** Volume accounting inside minhashLshPairs at bench params (dev tool). */
object R17Minhash {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("r17-minhash")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.load(spark, dir, "documents")
    val (shingleSize, numHashes, bands) = (2, 64, 16)
    val rowsPerBand = numHashes / bands
    val sigArr = Dedup.minhashSignatures(docs, "doc_id", "text", shingleSize, numHashes)
      .persist()
    val bandHashes = (0 until bands).map { b =>
      xxhash64(lit(b), slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
    }
    val banded = sigArr.select(col("doc"), posexplode(array(bandHashes: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    println("sigs=" + sigArr.count())
    val occ = banded.groupBy("band", "band_hash").agg(count(lit(1)).as("bn")).persist()
    println("buckets=" + occ.count())
    occ.agg(max("bn"), avg("bn"), sum(col("bn") * (col("bn") - 1) / 2).as("raw_pairs_with_dups"))
      .show(false)
    occ.orderBy(col("bn").desc).show(10, false)
    val t0 = System.nanoTime()
    val okBuckets = occ.filter(col("bn") <= 1000).select("band", "band_hash")
    val buckets = banded.join(okBuckets, Seq("band", "band_hash"))
    val rawPairs = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
    println("rawPairs=" + rawPairs.count() + " in " + (System.nanoTime()-t0)/1e9 + "s")
    val t1 = System.nanoTime()
    println("dedupPairs=" + rawPairs.dropDuplicates("doc_a", "doc_b").count() +
      " in " + (System.nanoTime()-t1)/1e9 + "s")
    spark.stop()
  }
}
