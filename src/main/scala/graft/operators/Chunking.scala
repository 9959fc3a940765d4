package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document → training-sequence shaping: sliding-window token chunking and
  * budgeted sequence packing — the two ops between "cleaned corpus" and
  * "pretraining batches" in an LLM data pipeline.
  *
  * Pure column expressions end to end (whole-stage codegen, no UDFs), and
  * every output is deterministic, so both ops carry exact DuckDB oracles.
  */
object Chunking {

  /** Split each document into overlapping token windows: chunk i covers
    * tokens [i·stride, i·stride + chunkSize) with stride = chunkSize −
    * overlap. Documents shorter than chunkSize yield one (short) chunk;
    * empty documents yield none.
    *
    * Output: (idCol, chunk_idx, chunk_tokens, chunk_text).
    *
    * Scale: explode of per-row chunk indices — row-local, no shuffle; the
    * token array is sliced per chunk inside the same codegen stage.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap ($overlap) must be in [0, chunkSize)")
    val stride = chunkSize - overlap
    val nChunks = greatest(lit(1),
      ceil((col("n") - lit(overlap)).cast("double") / stride).cast("int"))
    df.select(col(idCol), Dedup.tokens(col(textCol)).as("tk"))
      .withColumn("n", size(col("tk")))
      .withColumn("chunk_idx",
        explode(when(col("n") > 0, sequence(lit(0), nChunks - 1))
          .otherwise(array().cast("array<int>"))))
      .select(
        col(idCol),
        col("chunk_idx"),
        least(lit(chunkSize), col("n") - col("chunk_idx") * stride)
          .cast("int").as("chunk_tokens"),
        concat_ws(" ", slice(col("tk"), col("chunk_idx") * stride + 1, lit(chunkSize)))
          .as("chunk_text"))
  }

  /** Greedy contiguous sequence packing: walk documents in id order and
    * cut a pack boundary whenever the running token total crosses the
    * budget — the concat-and-split shaping used to fill pretraining
    * context windows. A document's pack is
    * `floor(tokens-before-it / budget)` within its shard.
    *
    * Sharding keeps it scale-sane: a single global ordered cumsum would
    * funnel 100 TB through one partition, so documents are sharded by
    * `id % shards` (deterministic and oracle-portable, unlike a hash) and
    * packed per shard in parallel; `pack_id` is globally unique as
    * shard · 2³² + local pack. Each shard's window is one ordered
    * partition — shards = parallelism dial.
    *
    * Output: (idCol, n_tokens, shard, pack_id, pack_pos) where pack_pos
    * is the document's token offset inside its pack.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Int, shards: Int = 32): DataFrame = {
    require(budget > 0 && shards > 0)
    val nt = size(Dedup.tokens(col(textCol)))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), nt.cast("long").as("n_tokens"),
        pmod(col(idCol), lit(shards)).cast("int").as("shard"))
      .withColumn("cum_before", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(
        col(idCol),
        col("n_tokens"),
        col("shard"),
        (col("shard").cast("long") * 4294967296L +
          floor(col("cum_before") / budget)).as("pack_id"),
        pmod(col("cum_before"), lit(budget.toLong)).as("pack_pos"))
  }

  /** TOKEN-BALANCED shard assignment — the "write N equal shards" step
    * between a filtered corpus and the training filesystem: every output
    * shard holds ~`targetTokens` tokens (±1 document), so data loaders
    * stream uniform files instead of whatever skew the upstream
    * partitioning left behind.
    *
    * Deterministic global order without a global sort: documents order by
    * (md5(id), id) — md5's first two hex chars ARE the 256-way bucket
    * prefix, so per-bucket token sums (one tiny aggregate, 256 rows to
    * the driver) plus a per-bucket window cumsum reproduce the exact
    * global running total: shard = ⌊cumulative-tokens-before / target⌋.
    * The corpus shuffles ONCE (on the bucket key, for the windows); the
    * driver holds 256 longs, never data. The same arithmetic is
    * expressible as one SQL window, so the assignment is hash-exact
    * cross-engine (q_balanced_shards).
    *
    * Output: (idCol, n_tokens, shard).
    */
  def balancedShards(df: DataFrame, idCol: String, textCol: String,
      targetTokens: Long): DataFrame = {
    require(targetTokens > 0)
    val hkey = md5(col(idCol).cast("string"))
    // null text counts 0 tokens (a null would poison every cumulative sum
    // after it — the 100 TB bad-row policy: degrade, don't propagate)
    val base = df.select(col(idCol),
      coalesce(size(Dedup.tokens(col(textCol))).cast("long"), lit(0L)).as("n_tokens"),
      hkey.as("__hkey"), substring(hkey, 1, 2).as("__bucket"))
    val bucketSums = base.groupBy(col("__bucket"))
      .agg(sum(col("n_tokens")).as("bt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // prefix offsets over the (≤256, lexicographically ordered) buckets:
    // bucket -> tokens in all lexicographically-earlier buckets
    val prefixes = {
      var acc = 0L
      bucketSums.toSeq.sortBy(_._1).map { case (b, t) =>
        val p = acc; acc += t; b -> p
      }.toMap
    }
    val prefixCol = prefixes.foldLeft(lit(0L)) {
      case (acc, (b, p)) => when(col("__bucket") === b, lit(p)).otherwise(acc)
    }
    val w = Window.partitionBy(col("__bucket"))
      .orderBy(col("__hkey"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("__cum_before",
        prefixCol + sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        floor(col("__cum_before") / targetTokens).as("shard"))
  }

  /** Convenience: chunk text directly by a character budget (no token
    * array), e.g. for byte-level models. Row-local substring explode.
    */
  def chunkChars(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int): DataFrame = {
    require(chunkSize > 0)
    val nChunks = ceil(length(col(textCol)).cast("double") / chunkSize).cast("int")
    df.withColumn("chunk_idx",
        explode(when(length(col(textCol)) > 0, sequence(lit(0), nChunks - 1))
          .otherwise(array().cast("array<int>"))))
      .select(col(idCol), col("chunk_idx"),
        col(textCol).substr(col("chunk_idx") * chunkSize + 1, lit(chunkSize))
          .as("chunk_text"))
  }
}
