package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus curation ops for training-data mixing and benchmark hygiene.
  * Deterministic end to end (hash orderings use md5-of-id, portable to
  * the DuckDB oracle), pure column expressions — no UDFs, no collect.
  */
object Sampling {

  /** Deterministic stratified sample: up to `perStratum` rows per stratum,
    * chosen by a pseudo-random-but-stable hash order over ids — the data
    * mixing primitive ("N docs per language/domain"). Replayable across
    * runs and engines (md5 is md5 everywhere).
    *
    * Scale: one shuffle on the stratum key; Spark 4's window-group-limit
    * turns the rank filter into a partial top-k (no full per-stratum sort
    * materialization).
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      perStratum: Int): DataFrame = {
    require(perStratum > 0)
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum)
      .drop("__rn")
  }

  /** Per-group cap with an explicit priority: keep the top `k` rows of
    * each group by `priority` DESC (ties broken by `idCol` ASC so both
    * engines and reruns agree) — the "cap over-represented domains, keep
    * the best documents" mixing primitive (FineWeb-style domain caps).
    * [[stratifiedSample]] is the hash-priority special case of this.
    *
    * Scale: identical to stratifiedSample — one shuffle on the group key,
    * and Spark 4's window-group-limit rewrites the rank filter into a
    * partial top-k on the map side, so a domain with 10⁹ pages never
    * materializes a full sort.
    */
  def capPerGroup(df: DataFrame, groupCol: String, priority: org.apache.spark.sql.Column,
      idCol: String, k: Int): DataFrame = {
    require(k > 0)
    val w = Window.partitionBy(col(groupCol)).orderBy(priority.desc, col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Deterministic mixture sampling: keep each row of stratum `s` with
    * probability `fractions(s)` (falling back to `defaultFraction`) — the
    * Dolma/Pile "mixing weights" primitive ("50% web, 100% books, 20%
    * code"). No RNG: the keep/drop decision is a stable hash of
    * (stratum, id), so reruns, task retries, and engines agree
    * row-for-row — a 100 TB mixing job is idempotent and resumable.
    *
    * Mechanism: the first 8 hex chars of md5("stratum|id") are uniform in
    * [0, 16⁸); comparing them LEXICOGRAPHICALLY against the zero-padded
    * hex of floor(fraction·16⁸) keeps exactly that share. Hex-string
    * compare is identical in Spark and DuckDB, which is what makes the
    * oracle exact. A fraction ≥ 1.0 maps to threshold "g" (sorts above
    * every hex digit → keep all).
    *
    * Scale: a pure projection + filter — no shuffle, no state, pushes
    * into the scan stage and fuses with whole-stage codegen.
    */
  def mixtureSample(df: DataFrame, stratumCol: String, idCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 1.0): DataFrame = {
    def thresholdHex(f: Double): String =
      if (f >= 1.0) "g"
      else f"${math.max(0L, math.floor(f * 4294967296.0).toLong)}%08x"
    val thr = fractions.foldLeft(lit(thresholdHex(defaultFraction))) {
      case (acc, (s, f)) => when(col(stratumCol) === s, lit(thresholdHex(f))).otherwise(acc)
    }
    df.filter(
      substring(md5(concat(col(stratumCol), lit("|"), col(idCol).cast("string"))), 1, 8) < thr)
  }

  /** Benchmark decontamination: for every train document, the n-gram
    * CONTAINMENT of each eval document — |shingles(train) ∩
    * shingles(eval)| / |shingles(eval)| — the standard leakage metric
    * (an eval item fully quoted inside a long train doc scores 1.0 where
    * symmetric Jaccard would dilute it).
    *
    * Scale: inverted-index join keyed on the shingle, exactly the
    * ngram-Jaccard shape but cross-corpus; `maxDocFreq` caps hot
    * shingles (stopword runs) before the join. The eval side is
    * typically tiny next to 100 TB of train data — the join carries
    * (shingle, doc) pairs only, never documents.
    *
    * Returns (train_id, eval_id, containment) ≥ threshold.
    */
  def contaminationPairs(train: DataFrame, eval_ : DataFrame,
      idCol: String, textCol: String, shingleSize: Int = 3,
      threshold: Double = 0.5, maxDocFreq: Int = 1000): DataFrame = {
    val trainSh = Dedup.shingles(train, idCol, textCol, shingleSize)
      .withColumnRenamed("doc", "train_id")
    val evalSh = Dedup.shingles(eval_, idCol, textCol, shingleSize)
      .withColumnRenamed("doc", "eval_id")
    // hot-shingle cap measured on the TRAIN side (the big one)
    val okShingles = trainSh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
      .select("shingle")
    // persisted: feeds per-eval sizes and the cross-corpus join; released
    // by materializeAndRelease once the pair output is computed
    val evalOk = evalSh.join(okShingles, "shingle")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val evalSizes = evalOk.groupBy("eval_id").agg(count(lit(1)).as("n_eval"))
    // evalOk is already capped, so joining the (100 TB) train side straight
    // against it applies the hot-shingle filter implicitly — no separate
    // trainSh×okShingles pass over the big side
    val inter = trainSh.join(evalOk, "shingle")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("inter"))
    val scored = inter.join(evalSizes, "eval_id")
      .withColumn("containment", col("inter").cast("double") / col("n_eval"))
      .filter(col("containment") >= threshold)
      .select(col("train_id"), col("eval_id"), col("containment"))
    Dedup.materializeAndRelease(scored, evalOk)
  }

  /** Exact n-gram-collision decontamination — the GPT-3/PaLM recipe: a
    * train document is contaminated if it shares ANY exact n-gram (n
    * large, typically 8-13 words) with the benchmark set; no similarity
    * score, just collision. Complements [[contaminationPairs]] (which
    * quantifies WHICH eval item leaked and how much): the collision form
    * is the cheap corpus-wide gate, the containment form the audit.
    *
    * Returns every train row's verdict: (train_id, n_collisions
    * = distinct colliding n-grams, contaminated).
    *
    * Scale shape: the benchmark n-gram set is tiny next to a 100 TB
    * train corpus (millions of grams ≈ tens of MB as 8-byte hashes), so
    * it is distinct-ed and explicitly `broadcast()` — the train side's
    * exploded grams meet it in a broadcast hash join fused with the
    * scan-side explode, are filtered to hits immediately, and only hit
    * rows (rare by construction) reach the per-doc count shuffle. The
    * final verdict join is again broadcast (hit docs ≪ corpus). The big
    * side is never shuffled.
    */
  def ngramCollisions(train: DataFrame, eval_ : DataFrame,
      idCol: String, textCol: String, n: Int = 13): DataFrame = {
    val trainGrams = Dedup.shingles(train, idCol, textCol, n)
      .withColumnRenamed("doc", "train_id")
    val benchGrams = Dedup.shingles(eval_, idCol, textCol, n)
      .select(col("shingle")).distinct()
    val hits = trainGrams
      .join(broadcast(benchGrams), "shingle")
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_collisions")) // shingles are distinct per doc
    train.select(col(idCol).as("train_id"))
      .join(broadcast(hits), Seq("train_id"), "left")
      .select(col("train_id"),
        coalesce(col("n_collisions"), lit(0L)).as("n_collisions"),
        (coalesce(col("n_collisions"), lit(0L)) > 0).as("contaminated"))
  }

  /** EPOCH replication — the upsampling half of domain mixing
    * ([[mixtureSample]] is the downsampling half): DoReMi/Pile-style
    * domain weights are fractional EPOCH counts (wikipedia 3.2 epochs,
    * commoncrawl 0.8), and a weight above 1 means replicating the
    * domain's documents. Each row is emitted `floor(w)` times plus one
    * more with probability `frac(w)`, decided by the SAME deterministic
    * md5-fraction device as [[mixtureSample]] — so a fixed corpus +
    * weights yields a byte-identical mixture on any cluster, any run.
    *
    * Output = input columns + `epoch` (1-based copy index). Weights
    * below 1 degrade to hash-fraction sampling (epoch 1 kept with
    * probability w), making this a strict superset of [[mixtureSample]]
    * semantics for positive weights. Row-local: the weight lookup is a
    * literal CASE chain, the replication an explode of a ≤⌈w⌉-element
    * sequence — no shuffle, no state.
    */
  def epochReplicate(df: DataFrame, stratumCol: String, idCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0): DataFrame = {
    require((defaultWeight +: weights.values.toSeq).forall(w => w >= 0.0 && w <= 100.0),
      "epoch weights must be in [0, 100] — a larger weight is almost " +
        "certainly a unit error, and would explode the corpus that many times")
    def thresholdHex(f: Double): String =
      if (f >= 1.0) "g"
      else f"${math.max(0L, math.floor(f * 4294967296.0).toLong)}%08x"
    def caseChain[T](f: Double => T, lift: T => Column): Column =
      weights.foldLeft(lift(f(defaultWeight))) {
        case (acc, (s, w)) => when(col(stratumCol) === s, lift(f(w))).otherwise(acc)
      }
    val wholeEpochs = caseChain[Int](w => math.floor(w).toInt, lit(_))
    val fracThr = caseChain[String](w => thresholdHex(w - math.floor(w)), lit(_))
    val extra = (substring(
      md5(concat(col(stratumCol), lit("|"), col(idCol).cast("string"))), 1, 8)
      < fracThr).cast("int")
    val n = (wholeEpochs + extra).as("__n")
    df.withColumn("epoch",
      explode(when(n >= 1, sequence(lit(1), n))
        .otherwise(array().cast("array<int>"))))
  }
}
