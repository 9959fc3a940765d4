package graft

import graft.queries.{Events, Pipeline, Q, Relational}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The inventory lives in graft.queries.{Relational, Events, Pipeline};
  * each entry carries its DataFrame program and (when SQL-expressible) the
  * DuckDB oracle the driver hash-compares against.
  */
object SparkEntry {

  val inventory: Seq[Q] = Relational.all ++ Events.all ++ Pipeline.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q5-shaped multi-join: two shuffle joins + three broadcast dims.
    */
  def entry(spark: SparkSession): DataFrame =
    inventory.find(_.name == "q_multi_join").get.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    inventory.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for hash/LSH-based ops (driver
    * records a rows-only check; ScalaTest specs carry their correctness).
    */
  def oracleSql: Map[String, String] =
    inventory.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Headline benchmark subset (Bench.scala): the heavy relational joins +
    * aggregation, the window battery, and the pipeline operators that
    * dominate cost at scale.
    */
  val headline: Seq[String] = Seq(
    "q_agg", "q_join_shuffle", "q_multi_join", "q_window_fn",
    "q_tumble", "q_hop", "q_session", "q_interval_join",
    "q_dedup_exact", "q_minhash_lsh", "q_ngram_jaccard", "q_quality",
    "q_ann_bruteforce", "q_ann_lsh", "q_ann_ivf",
    // round-6: the two round-5 pair-generating ops, tracked round-over-
    // round like q_ngram_jaccard (their Σdf²/Σcell² terms are the costs
    // that move at scale)
    "q_tfidf", "q_semdedup",
    // round-7: the designed-for-scale ANN paths (PQ ADC scan + IVF+PQ
    // composed) — their compression/pruning claims deserve a tracked cost —
    // and the new brute-force semantic-decontamination screen (its
    // eval×train product is the cost that moves at scale)
    "q_ann_pq", "q_ann_ivfpq", "q_decontaminate_sem")
}
