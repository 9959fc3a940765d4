package graft.examples

import graft.operators.{Chunking, Dedup, Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end pretraining-data pipeline composed from the library's
  * operators — the "a user of the reference could run their whole
  * workflow here" demonstration, and the composition PipelineSpec pins:
  *
  *   1. text normalization           ([[TextAnalysis.normalizeText]]:
  *      NFC + control strip + whitespace discipline — before anything
  *      hashes or tokenizes)
  *   2. line-level cleaning          (C4 rules — [[TextAnalysis.c4Clean]]
  *      in lenient mode for the unpunctuated demo corpus)
  *   3. doc-level quality gates      ([[TextAnalysis.gopherRules]] surface
  *      battery + [[TextAnalysis.gopherRepetitionRules]] repetition battery)
  *   4. language filter              ([[TextAnalysis.languageId]])
  *   5. exact dedup                  ([[Dedup.exact]])
  *   6. near-dup dedup               ([[Dedup.minhashLshPairs]] →
  *      [[Dedup.keeperAssignment]])
  *   7. benchmark decontamination    (both gates: containment audit via
  *      [[Sampling.contaminationPairs]] + exact n-gram collision via
  *      [[Sampling.ngramCollisions]])
  *   8. domain capping               ([[Sampling.capPerGroup]] by quality)
  *   9. sequence packing             ([[Chunking.packSequences]])
  *
  * Every stage is a DataFrame → DataFrame transform, so the whole
  * pipeline is ONE lazy Catalyst plan per materialization boundary (the
  * dedup stages materialize pair outputs internally by design). Stage
  * row counts are monotonically non-increasing through the filters —
  * PipelineSpec asserts that plus per-stage correctness hooks.
  */
object PretrainPipeline {

  /** Stage-by-stage survivor counts + the packed output. */
  final case class Result(stages: Seq[(String, Long)], packed: DataFrame)

  def run(docs: DataFrame, evalSet: DataFrame, packBudget: Int = 512,
      strict: Boolean = false): Result = {
    val stages = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def mark(name: String, df: DataFrame): DataFrame = {
      stages += name -> df.count(); df
    }

    val raw = mark("raw", docs.select(col("doc_id"), col("text"),
      coalesce(col("source"), lit("unknown")).as("source")))

    // 1. encoding repair + canonical normalization: fixMojibake inverts
    // UTF-8-as-cp1252/latin-1 damage FIRST (NFC could perturb the damaged
    // byte echo), then NFC + controls + whitespace — all BEFORE any stage
    // hashes, shingles, or tokenizes (dedup misses dups otherwise).
    // Not a filter — the count marks the stage boundary, not a drop.
    val normalized = mark("normalize", raw.withColumn("text",
      TextAnalysis.normalizeText(TextAnalysis.fixMojibake(col("text")))))

    // 2. C4 line cleaning. strict=false keeps docs whose cleaned text is
    // empty-but-was-single-line (the synthetic corpus has no terminal
    // punctuation; real crawls run strict=true and drop them).
    val c4 = TextAnalysis.c4Clean(normalized, "doc_id", "text")
    val cleaned = mark("c4_clean",
      if (strict)
        normalized.join(c4.filter(col("keep")).select("doc_id", "clean_text"), "doc_id")
          .select(col("doc_id"), col("clean_text").as("text"), col("source"))
      else normalized)

    // 3. quality gates: surface battery (relaxed to the corpus' word-count
    // band when lenient) + repetition battery at paper thresholds
    val surface = TextAnalysis.gopherRules(cleaned, "doc_id", "text",
      minWords = if (strict) 50 else 20)
    val rep = TextAnalysis.gopherRepetitionRules(cleaned, "doc_id", "text")
    val keepIds = surface.filter(
        if (strict) col("keep")
        else col("n_words") >= 20 && col("alpha_word_ratio") >= 0.8)
      .select(col("doc_id"))
      .join(rep.filter(col("keep")).select(col("doc").as("doc_id")), "doc_id")
    val gated = mark("quality_gates", cleaned.join(keepIds, "doc_id"))

    // 4. language filter (stopword-evidence id; keep en + unknown)
    val lang = mark("lang_filter", gated.filter(
      TextAnalysis.languageId(col("text")).isin("en", "und")))

    // 5. exact dedup: min id per distinct content survives
    val exactKeep = Dedup.exact(lang, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val exact = mark("exact_dedup", lang.join(exactKeep, "doc_id"))

    // 6. near-dup dedup: minhash-LSH pairs → CC keepers
    val pairs = Dedup.minhashLshPairs(exact, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.7)
    val keepers = Dedup.keeperAssignment(exact.select(col("doc_id")), "doc_id", pairs)
      .filter(col("keep_as") === col("doc"))
      .select(col("doc").as("doc_id"))
    val neardup = mark("neardup_dedup", exact.join(keepers, "doc_id"))

    // 7. decontamination against the eval set, both gates: the containment
    // audit (which eval item leaked, how much) AND the cheap exact
    // n-gram-collision sweep (any shared 8-gram disqualifies)
    val contaminated = Sampling.contaminationPairs(neardup, evalSet,
      "doc_id", "text", shingleSize = 3, threshold = 0.5)
      .select(col("train_id").as("doc_id")).distinct()
    val collided = Sampling.ngramCollisions(neardup, evalSet,
      "doc_id", "text", n = 8)
      .filter(col("contaminated")).select(col("train_id").as("doc_id"))
    val decon = mark("decontaminate",
      neardup.join(contaminated.union(collided).distinct(), Seq("doc_id"), "left_anti"))

    // 8. cap EACH source domain at its own best-quality 80% (FineWeb-style):
    // rank within the source by quality and keep the top ceil(0.8·n) —
    // a per-group fraction, unlike the fixed-k Sampling.capPerGroup
    // (which remains the right op when the budget is absolute)
    val scored = decon.withColumn("quality",
      TextAnalysis.qualityScore(col("text")))
    val bySource = org.apache.spark.sql.expressions.Window.partitionBy("source")
    val capped = mark("domain_cap", scored
      .withColumn("rk", row_number().over(
        bySource.orderBy(col("quality").desc, col("doc_id"))))
      .withColumn("grp_n", count(lit(1)).over(bySource))
      .filter(col("rk") <= greatest(ceil(col("grp_n") * 0.8), lit(1)))
      .drop("rk", "grp_n"))

    // 9. pack into fixed token budgets for training
    val packed = Chunking.packSequences(capped, "doc_id", "text", budget = packBudget)
    Result(stages.toSeq :+ ("packed" -> packed.count()), packed)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("pretrain-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val docs = graft.Tables.load(spark, dir, "documents")
    // eval set: every 37th doc plays the benchmark to decontaminate against
    val evalSet = docs.filter(col("doc_id") % 37 === 0)
      .select((col("doc_id") + 900000L).as("doc_id"), col("text"))
    val r = run(docs, evalSet)
    r.stages.foreach { case (n, c) => println(f"[pipeline] $n%-16s $c%7d") }
    spark.stop()
  }
}
