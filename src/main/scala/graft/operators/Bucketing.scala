package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the pre-shuffle strategy for repeated big-big
  * joins at scale: write both tables bucketed (and sorted) by the join key
  * once, and every subsequent join on that key runs with NO exchange on
  * either side (SortMergeJoin over pre-bucketed scans).
  *
  * The reference has no storage layer of its own (it shuffles every join);
  * this is one of the wins of sitting on a real table format. At 100 TB,
  * bucketing the fact tables by their join keys turns the dominant
  * shuffle of every pipeline run into a one-time write cost.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (replacing any previous
    * incarnation — overwrite mode alone refuses a stale orphaned location).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    if (loc.exists()) deleteRecursively(loc)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Join two same-bucketed tables on their bucket key (exchange-free when
    * bucket counts match).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String, joinType: String = "inner"): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey), joinType)
  }

  /** True if the physical plan contains a shuffle exchange (plan check for
    * tests/tuning). String-matched so AQE-wrapped (lazily re-planned)
    * subtrees are included.
    */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
