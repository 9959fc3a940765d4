package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and encoding over a corpus — the
  * "train a tokenizer on your data" step of an LLM pipeline (Sennrich et
  * al. 2016), built Spark-first:
  *
  * The 100 TB insight is that BPE never needs the corpus inside its merge
  * loop: training operates on the WORD-FREQUENCY table, which is
  * vocab-bounded (~10⁶–10⁷ rows for any natural-language corpus,
  * regardless of corpus bytes). So:
  *
  *   1. ONE distributed pass builds `(word, freq)` — a scan-fused explode
  *      + one shuffle with map-side partials ([[wordFreqs]]);
  *   2. the iterative merge loop then runs over that small table — on the
  *      driver below [[maxDriverVocab]] (exact, allocation-cheap; the
  *      [[Dedup.keeperAssignment]] dual-path move), distributed above it
  *      (pair-explode → sum → argmax per round, lineage cut by
  *      localCheckpoint every few rounds) — both paths spec-proven
  *      identical;
  *   3. [[encode]] applies the learned merge ranks corpus-wide, row-local
  *      with a per-partition word→tokens memo (natural text repeats words;
  *      the memo turns per-token work into per-distinct-word work).
  *
  * Determinism: ties on pair frequency break lexicographically, so the
  * merge list is a pure function of the corpus — training twice (or on
  * the two execution paths) yields byte-identical merge tables.
  */
object Bpe {

  /** One learned merge: `left`+`right` concatenate at priority `rank`. */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Pre-tokenizer: the BPE-ish chunking the token-count ops use
    * (letter runs | digit runs | single punctuation) — lowercased like
    * [[Dedup.tokens]].
    */
  private def preTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** `(word, freq)` over the corpus: the ONLY corpus-wide pass in
    * training. Scan-fused explode, one shuffle with map-side partials.
    */
  def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(preTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Train `numMerges` merges on the corpus. Below `maxDriverVocab`
    * distinct words the loop runs on the driver (the word-freq table is a
    * few MB — shuffling it `numMerges` times buys nothing); above it, the
    * distributed loop takes over. Identical results either way.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxDriverVocab: Long = 1L << 20): Seq[Merge] = {
    val freqs = wordFreqs(df, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val vocabSize = freqs.count()
      if (vocabSize <= maxDriverVocab)
        trainDriver(
          freqs.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq, numMerges)
      else trainDistributed(freqs, numMerges)
    } finally freqs.unpersist()
  }

  /** Driver merge loop over the collected word-frequency table. */
  private[graft] def trainDriver(freqs: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    var vocab: Array[(Array[String], Long)] =
      freqs.map { case (w, f) => w.map(_.toString).toArray -> f }.toArray
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), f, _ + _)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (p, f) =>
          if (best == null || f > best._2 ||
              (f == best._2 && pairLt(p, best._1))) best = (p, f)
        }
        val (l, r) = best._1
        merges += Merge(rank, l, r, best._2)
        vocab = vocab.map { case (syms, f) => mergeOnce(syms, l, r) -> f }
        rank += 1
      }
    }
    merges.result()
  }

  /** Distributed merge loop: per round, pair-explode the (small) vocab
    * frame, sum pair freqs, take the deterministic argmax, and apply the
    * merge row-locally. localCheckpoint every 8 rounds cuts the growing
    * lineage (the classic iterative-Spark trap).
    */
  private[graft] def trainDistributed(freqs: DataFrame, numMerges: Int): Seq[Merge] = {
    val spark = freqs.sparkSession
    import spark.implicits._
    var vocab = freqs.select(split(col("word"), "").as("syms"), col("freq"))
      .as[(Seq[String], Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val best = vocab.toDF("syms", "freq")
        .select(col("freq"), explode(
          zip_with(slice(col("syms"), lit(1), greatest(size(col("syms")) - 1, lit(0))),
            slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0))),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l"), col("p.r")).agg(sum(col("freq")).as("pf"))
        .orderBy(col("pf").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, pf) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, l, r, pf)
        val mergeUdf = udf((syms: Seq[String]) => mergeOnce(syms.toArray, l, r).toSeq)
        val next = vocab.toDF("syms", "freq")
          .select(mergeUdf(col("syms")).as("syms"), col("freq"))
          .as[(Seq[String], Long)]
        val cut = if ((rank + 1) % 8 == 0) next.localCheckpoint(true) else
          next.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cut.count() // materialize before releasing the parent
        vocab.unpersist()
        vocab = cut
        rank += 1
      }
    }
    vocab.unpersist()
    merges.result()
  }

  /** Left-to-right single-pass merge of every adjacent (l, r) occurrence. */
  private def mergeOnce(syms: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += l + r
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  private def pairLt(a: (String, String), b: (String, String)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Greedy BPE encode of a single word against the learned ranks:
    * repeatedly merge the LOWEST-rank applicable pair (all occurrences),
    * exactly the decode-side convention of trained BPE vocabularies.
    */
  private[graft] def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Array[String] = {
    var syms = word.map(_.toString).toArray
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val rk = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < bestRank) { bestRank = rk; bi = i }
        i += 1
      }
      if (bi < 0) continue = false
      else syms = mergeOnce(syms, syms(bi), syms(bi + 1))
    }
    syms
  }

  /** Hard cap on the per-executor word→tokens memo in [[encode]]. Natural-
    * language vocabulary is ~10⁶–10⁷ distinct words, but a 100 TB crawl's
    * long tail (URLs-in-text, hex hashes, code identifiers) is NOT
    * vocab-bounded — an uncapped memo would grow for the life of the
    * executor. Memory envelope at the cap: ~1M entries × (word + token
    * array + map overhead ≈ 200 B) ≈ 200 MB worst case per executor,
    * typically far less. The memo is an optimization, not semantics:
    * clear-on-full keeps output byte-identical (spec-proven with cap=2).
    */
  val defaultMemoCap: Int = 1 << 20

  /** Corpus-wide encode: adds `tokens` (array<string>) and `n_bpe_tokens`.
    * Row-local — merge ranks ride a broadcast map, and a per-partition
    * word→tokens memo turns repeated words into lookups. This is the one
    * operator here that touches the full corpus; it parallelizes
    * embarrassingly and preserves partitioning.
    *
    * Null text null-propagates (the 100 TB bad-row policy: a malformed
    * row degrades, it never aborts the job). The memo is bounded by
    * `memoCap` ([[defaultMemoCap]]) with clear-on-full.
    */
  def encode(df: DataFrame, textCol: String, merges: Seq[Merge],
      memoCap: Int = defaultMemoCap): DataFrame = {
    val spark = df.sparkSession
    val ranksB = spark.sparkContext.broadcast(
      merges.map(m => (m.left, m.right) -> m.rank).toMap)
    val cap = memoCap.max(1)
    val encodeUdf = udf(new (Seq[String] => Seq[String]) with Serializable {
      @transient private lazy val memo =
        new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
      def apply(words: Seq[String]): Seq[String] =
        if (words == null) null
        else words.flatMap { w =>
          // bound BEFORE insert so the map never exceeds cap; clearing is
          // safe (pure cache) and cheaper than LRU bookkeeping in the hot path
          if (memo.size >= cap) memo.clear()
          memo.computeIfAbsent(w, (k: String) => encodeWord(k, ranksB.value))
        }
    })
    df.withColumn("tokens", encodeUdf(preTokens(col(textCol))))
      .withColumn("n_bpe_tokens", size(col("tokens")))
  }
}
