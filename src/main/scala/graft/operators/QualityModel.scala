package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
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
    * (prob ≥ threshold).
    *
    * Pure codegen'd EXPRESSION chain, no ML transform and no Scala UDF:
    * the margin is `intercept + Σ_tokens coef[hashBucket(tok)]` where
    * [[graft.functions.HashBucketF]] reproduces HashingTF's V2 murmur3
    * bucket exactly, and the coefficient array rides the plan as ONE
    * 8·n-byte literal (2 MiB at the default 2¹⁸; shipped once per stage,
    * not per row). The whole scoring path fuses into the surrounding
    * scan's WholeStageCodegen — no shuffle, no ScalaUDF node,
    * spec-asserted both ways, and spec-pinned bit-equal to the
    * ML-transform path ([[scoreMl]]).
    */
  def score(df: DataFrame, model: LogisticRegressionModel, textCol: String,
      threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.GraftShim
    val n = model.numFeatures
    val coefs = lit(model.coefficients.toArray)
    def bucket(t: Column): Column =
      GraftShim.column(graft.functions.HashBucketF(GraftShim.expression(t), n))
    val margin = aggregate(tokensCol(textCol), lit(model.intercept),
      (acc, t) => acc + element_at(coefs, bucket(t) + 1))
    df.withColumn("quality_prob", lit(1.0) / (lit(1.0) + exp(-margin)))
      .withColumn("quality_keep", col("quality_prob") >= threshold)
  }

  /** The same scoring through Spark ML's transformer stack (HashingTF →
    * LogisticRegressionModel.transform → `vector_to_array`). Kept as the
    * reference implementation the expression path is spec-tested
    * against; the UDFs inside the ML transform make it non-fusable, so
    * [[score]] is the production path.
    */
  private[graft] def scoreMl(df: DataFrame, model: LogisticRegressionModel,
      textCol: String, threshold: Double = 0.5): DataFrame = {
    val tf = new HashingTF().setInputCol("__toks").setOutputCol("__features")
      .setNumFeatures(model.numFeatures)
    val scored = model
      .setFeaturesCol("__features").setProbabilityCol("__prob")
      .setPredictionCol("__pred").setRawPredictionCol("__raw")
      .transform(tf.transform(df.withColumn("__toks", tokensCol(textCol))))
    scored
      .withColumn("quality_prob",
        org.apache.spark.ml.functions.vector_to_array(col("__prob"))(1))
      .withColumn("quality_keep", col("quality_prob") >= threshold)
      .drop("__toks", "__features", "__prob", "__pred", "__raw")
  }
}
