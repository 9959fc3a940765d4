package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MODEL-BASED quality filtering — the FineWeb-Edu / DCLM-style gate: a
  * linear classifier over hashed token features, trained on a labeled
  * slice (LLM judgments, curated positives vs crawl negatives, …) and
  * then scored over the whole corpus. Complements the rule-based gates
  * ([[TextAnalysis.qualityScore]], Gopher batteries): rules encode known
  * pathologies; the classifier generalizes whatever the labels encode.
  *
  * Spark-first shape, sized for 100 TB:
  *   - features are HASHED unigram counts ([[HashingTF]], `numFeatures`
  *     buckets) — no vocabulary table to build, ship, or grow: feature
  *     extraction is row-local and identical on every executor;
  *   - training is one Spark ML logistic regression over the LABELED
  *     slice only (labels are expensive — the slice is ~10⁴-10⁶ rows,
  *     never the corpus), L-BFGS with map-side gradient partials;
  *   - scoring broadcasts the coefficient vector and is a pure row-local
  *     dot product — the corpus is never shuffled, and the plan fuses
  *     with whatever scan/filter surrounds it.
  *
  * Determinism: HashingTF is seedless; L-BFGS on a fixed dataset
  * converges to the same optimum (convex loss) — spec-asserted by
  * training twice and comparing coefficients.
  */
object QualityModel {

  /** Lowercased word-ish tokens as an array column — [[Dedup.tokens]],
    * shared so the classifier sees the same tokenization as every other
    * text operator. Null text degrades to an empty token set (HashingTF
    * NPEs on null input, which would abort the task — the 100 TB bad-row
    * policy says a malformed row scores as empty instead).
    */
  private def tokensCol(textCol: String): Column =
    coalesce(Dedup.tokens(col(textCol)), array().cast("array<string>"))

  /** Train a quality classifier on `labeled` (`labelCol` ∈ {0.0, 1.0}).
    * Returns the fitted model (coefficients live on the driver; ~8 B ×
    * numFeatures — 2 MiB at the default 2¹⁸ — broadcast once for
    * scoring).
    */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
      numFeatures: Int = 1 << 18, regParam: Double = 1e-4,
      maxIter: Int = 50): LogisticRegressionModel = {
    val tf = new HashingTF().setInputCol("__toks").setOutputCol("__features")
      .setNumFeatures(numFeatures)
    val featured = tf.transform(
      labeled.withColumn("__toks", tokensCol(textCol)))
    new LogisticRegression()
      .setFeaturesCol("__features").setLabelCol(labelCol)
      .setRegParam(regParam).setMaxIter(maxIter).setStandardization(false)
      .fit(featured)
  }

  /** Score a corpus: adds `quality_prob` (P(label=1)) and `quality_keep`
    * (prob ≥ threshold). Row-local — the model's coefficient vector is
    * broadcast inside the ML transform; no shuffle, no vocabulary join.
    */
  def score(df: DataFrame, model: LogisticRegressionModel, textCol: String,
      threshold: Double = 0.5): DataFrame = {
    val tf = new HashingTF().setInputCol("__toks").setOutputCol("__features")
      .setNumFeatures(model.numFeatures)
    val prob = udf((v: Vector) => v(1))
    val scored = model
      .setFeaturesCol("__features").setProbabilityCol("__prob")
      .setPredictionCol("__pred").setRawPredictionCol("__raw")
      .transform(tf.transform(df.withColumn("__toks", tokensCol(textCol))))
    scored
      .withColumn("quality_prob", prob(col("__prob")))
      .withColumn("quality_keep", col("quality_prob") >= threshold)
      .drop("__toks", "__features", "__prob", "__pred", "__raw")
  }
}
