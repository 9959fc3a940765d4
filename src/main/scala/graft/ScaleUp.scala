package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe data generator: replicates an sf0.1 testdata directory N×
  * (default 10 → "sf1") so the headline bench battery can be run one
  * decade above the driver's bench scale and quadratic surprises show up
  * before they would on a cluster (VERDICT r2 "Next round" #10).
  *
  * Replication preserves the statistical shape of each table instead of
  * naively unioning identical copies, which would corrupt the probe:
  *   - every key column is offset per copy by (max_key+1) so join
  *     fan-outs and group cardinalities scale linearly, not quadratically;
  *   - dimension tables (region, nation) are NOT scaled — fact rows keep
  *     valid FKs, exactly like TPC-H scaling;
  *   - document text is word-suffixed per copy so cross-copy pairs are
  *     neither exact nor near duplicates: the within-copy dup-rate (what
  *     dedup queries measure) stays constant while the corpus grows;
  *   - embeddings keep their vectors (top-k per query is insensitive to
  *     duplicated points; the query side grows with the corpus by the
  *     vec_id % 50 predicate, so brute-force cost grows ~N², LSH/IVF ~N —
  *     which is precisely the contrast the probe exists to measure).
  *
  * Usage: runMain graft.ScaleUp <srcDir> <outDir> [factor]
  * Output is bench-only scratch data (gitignored), never a correctness
  * input — the oracle gate runs exclusively on driver-generated testdata.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.builder("graft-scaleup").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(df: DataFrame, f: Int => DataFrame): DataFrame =
      (0 until factor).map(f).reduce(_ unionAll _)

    /** Offset each listed key column by copy × (max+1). */
    def scaleKeyed(name: String, keys: String*): Unit = {
      val df = spark.read.parquet(s"$src/$name.parquet")
      val offsets = keys.map(k => k -> (df.agg(max(col(k))).head.getLong(0) + 1L)).toMap
      copies(df, i => keys.foldLeft(df)((d, k) =>
          d.withColumn(k, col(k) + lit(i * offsets(k)))))
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }

    // dims: pass through unscaled (valid FKs from the scaled fact side)
    for (dim <- Seq("region", "nation"))
      spark.read.parquet(s"$src/$dim.parquet")
        .write.mode("overwrite").parquet(s"$out/$dim.parquet")

    scaleKeyed("customer", "c_custkey")
    scaleKeyed("supplier", "s_suppkey")
    scaleKeyed("part", "p_partkey")
    scaleKeyed("orders", "o_orderkey", "o_custkey")
    scaleKeyed("lineitem", "l_orderkey", "l_partkey", "l_suppkey")
    // events: same timestamps (10× density per window — how a bigger
    // deployment actually looks), distinct users/ids per copy so join and
    // session key cardinality scales with the data
    scaleKeyed("events", "event_id", "user_id")
    scaleKeyed("embeddings", "vec_id")

    locally {
      val docs = spark.read.parquet(s"$src/documents.parquet")
      val off = docs.agg(max(col("doc_id"))).head.getLong(0) + 1L
      copies(docs, i => {
          val d = docs.withColumn("doc_id", col("doc_id") + lit(i * off))
          // copy 0 keeps the original text; later copies suffix every
          // word so every shingle differs cross-copy (cross-copy Jaccard
          // ≈ 0) while within-copy near-dup structure is untouched
          if (i == 0) d
          else d.withColumn("text", regexp_replace(col("text"), " ", s"_c$i "))
        })
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
    }

    println(s"[scaleup] wrote $factor x $src -> $out")
    spark.stop()
  }
}
