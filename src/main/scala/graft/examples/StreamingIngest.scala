package graft.examples

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The streaming counterpart to [[PretrainPipeline]]: a live ingestion
  * pipeline from a messaging topic to a deduped, quality-gated corpus —
  * the shape a continuously-crawled training set runs 24/7.
  *
  *   1. source     — any `graft-mq` topic (a `wire='true'` table makes
  *      that a REAL NATS/MQTT/AMQP/Kinesis subscription)
  *   2. normalize  — [[TextAnalysis.normalizeText]], stateless
  *   3. gates      — quality floor + language filter, stateless
  *   4. dedup      — [[Dedup.bloomIncrementalStream]]: every batch dedups
  *      against the ledger of ALL previously accepted content, with
  *      idempotent crash replay
  *
  * Stages 2-3 are scan-fused column expressions (zero state); stage 4's
  * state is the ~48-byte-per-content ledger — the pipeline never
  * re-shuffles accepted history.
  */
object StreamingIngest {

  /** Columns out of the raw envelope → (doc_id, text). Mojibake repair
    * runs BEFORE normalization (r7): crawl feeds carry double-encoded
    * text whose junk chars would otherwise fail the quality gate — and
    * NFC normalization first could perturb the damaged byte echo the
    * repair inverts. With `model` set, the trained classifier gate
    * ([[graft.operators.QualityModel]]) runs AFTER the cheap rule gates
    * — rules discard the obvious garbage free, the model (broadcast
    * coefficients, row-local) adjudicates what rules can't express.
    */
  def prepared(raw: DataFrame, minQuality: Double = 0.35,
      langs: Seq[String] = Seq("en", "und"),
      model: Option[org.apache.spark.ml.classification.LogisticRegressionModel] = None,
      modelThreshold: Double = 0.5): DataFrame = {
    val gated = raw.select(col("offset").as("doc_id"),
        TextAnalysis.normalizeText(
          TextAnalysis.fixMojibake(col("value").cast("string"))).as("text"))
      .filter(TextAnalysis.qualityScore(col("text")) >= minQuality)
      .filter(TextAnalysis.languageId(col("text")).isin(langs: _*))
    model.fold(gated) { m =>
      graft.operators.QualityModel.score(gated, m, "text", modelThreshold)
        .filter(col("quality_keep")).select("doc_id", "text")
    }
  }

  def start(spark: SparkSession, address: String, topic: String,
      outDir: String, ledgerDir: String, checkpointDir: String,
      minQuality: Double = 0.35,
      model: Option[org.apache.spark.ml.classification.LogisticRegressionModel] = None)
      : StreamingQuery = {
    val raw = spark.readStream.format("graft-mq")
      .option("address", address).option("topic", topic).load()
    Dedup.bloomIncrementalStream(prepared(raw, minQuality, model = model),
      "doc_id", "text", ledgerDir, outDir, checkpointDir)
  }
}
