package graft

import graft.operators.{QualityModel, TextAnalysis}
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpec {

  private def corpus = Tables.load(spark, sfDir, "documents")

  test("classifier learns an injected lexical signal and generalizes to held-out docs") {
    // positives carry a marker token (the separable stand-in for whatever
    // the labels encode — LLM educational judgments, curated positives)
    val labeled = corpus.select(col("doc_id"), col("text"))
      .withColumn("label", when(col("doc_id") % 4 === 0, 1.0).otherwise(0.0))
      .withColumn("text",
        when(col("label") === 1.0, concat(col("text"), lit(" eduhallmark gem")))
          .otherwise(col("text")))
    val train = labeled.filter(col("doc_id") % 3 =!= 0)
    val heldout = labeled.filter(col("doc_id") % 3 === 0)
    val model = QualityModel.train(train, "text", "label", numFeatures = 1 << 16)
    val scored = QualityModel.score(heldout, model, "text")
    val acc = scored.agg(avg(
      (col("quality_keep") === (col("label") === 1.0)).cast("double")))
      .collect()(0).getDouble(0)
    assert(acc >= 0.95, s"held-out accuracy $acc")
    // the probability column orders the classes, not just the verdict bit
    val sep = scored.agg(
      min(when(col("label") === 1.0, col("quality_prob"))).as("minPos"),
      max(when(col("label") === 0.0, col("quality_prob"))).as("maxNeg"))
      .collect()(0)
    assert(sep.getDouble(0) > sep.getDouble(1),
      s"positives must score above negatives: $sep")
  }

  test("training is deterministic: same data, same coefficients") {
    val labeled = corpus.limit(200).select(col("doc_id"), col("text"))
      .withColumn("label", when(col("doc_id") % 4 === 0, 1.0).otherwise(0.0))
      .withColumn("text",
        when(col("label") === 1.0, concat(col("text"), lit(" eduhallmark")))
          .otherwise(col("text")))
    val a = QualityModel.train(labeled, "text", "label", numFeatures = 1 << 14)
    val b = QualityModel.train(labeled, "text", "label", numFeatures = 1 << 14)
    val da = a.coefficients.toArray
    val db = b.coefficients.toArray
    assert(da.length == db.length)
    da.zip(db).foreach { case (x, y) => assert(math.abs(x - y) < 1e-8) }
  }

  test("classifier mimics the rule-based quality score it is trained on") {
    // labels from the heuristic gate: the classifier must recover the
    // rule's verdict from token counts alone (the distillation shape:
    // expensive judge → cheap linear gate)
    val scoredRule = corpus.select(col("doc_id"), col("text"))
      .withColumn("q", TextAnalysis.qualityScore(col("text")))
    val median = scoredRule.stat.approxQuantile("q", Array(0.5), 0.0)(0)
    val labeled = scoredRule
      .withColumn("label", (col("q") >= median).cast("double")).drop("q")
    val train = labeled.filter(col("doc_id") % 3 =!= 0)
    val heldout = labeled.filter(col("doc_id") % 3 === 0)
    val model = QualityModel.train(train, "text", "label", numFeatures = 1 << 16)
    val acc = QualityModel.score(heldout, model, "text").agg(avg(
      (col("quality_keep") === (col("label") === 1.0)).cast("double")))
      .collect()(0).getDouble(0)
    info(f"rule-mimic held-out accuracy: $acc%.3f")
    assert(acc >= 0.7, s"rule-mimic accuracy $acc")
  }

  test("scoring works on a STREAM: the gate drops low-quality rows per micro-batch") {
    import java.nio.file.Files
    // train batch-side on the injected signal, then score a stream with it
    val labeled = corpus.limit(400).select(col("doc_id"), col("text"))
      .withColumn("label", when(col("doc_id") % 4 === 0, 1.0).otherwise(0.0))
      .withColumn("text",
        when(col("label") === 1.0, concat(col("text"), lit(" eduhallmark")))
          .otherwise(col("text")))
    val model = QualityModel.train(labeled, "text", "label", numFeatures = 1 << 14)
    val src = Files.createTempDirectory("qm-src").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    Files.write(java.nio.file.Paths.get(s"$src/f0.json"),
      ("""{"doc_id":1,"text":"plain web filler words eduhallmark"}""" + "\n" +
        """{"doc_id":2,"text":"plain web filler words"}""" + "\n").getBytes)
    val got = scala.collection.mutable.Map[Long, Boolean]()
    val q = QualityModel.score(
        spark.readStream.schema(schema).json(src), model, "text")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.select("doc_id", "quality_keep").collect()
          .foreach(r => got.synchronized { got(r.getLong(0)) = r.getBoolean(1) })
        ()
      }.start()
    q.processAllAvailable()
    q.stop()
    assert(got(1L) && !got(2L), s"marker row keeps, plain row drops: $got")
  }

  test("scoring is row-local and fusable: no Exchange, no ScalaUDF in the scored plan") {
    val labeled = corpus.limit(100).select(col("doc_id"), col("text"))
      .withColumn("label", when(col("doc_id") % 4 === 0, 1.0).otherwise(0.0))
    val model = QualityModel.train(labeled, "text", "label", numFeatures = 1 << 14)
    val scored = QualityModel.score(corpus, model, "text")
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
    val udfs = scored.queryExecution.analyzed.expressions.flatMap(_.collect {
      case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
    })
    assert(udfs.isEmpty, s"scoring must be a pure expression chain, found UDFs: $udfs")
  }

  test("expression scoring path equals the ML-transform path bit-for-bit") {
    // the production path re-derives HashingTF's murmur3 bucket as
    // pmod(hash(tok), n) — this test pins that identity (same hash fn,
    // same seed, same nonNegativeMod) against the real ML stack
    val labeled = corpus.limit(300).select(col("doc_id"), col("text"))
      .withColumn("label", when(col("doc_id") % 4 === 0, 1.0).otherwise(0.0))
      .withColumn("text",
        when(col("label") === 1.0, concat(col("text"), lit(" eduhallmark")))
          .otherwise(col("text")))
    val model = QualityModel.train(labeled, "text", "label", numFeatures = 1 << 14)
    val expr = QualityModel.score(corpus.limit(500), model, "text")
      .select("doc_id", "quality_prob", "quality_keep").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    val ml = QualityModel.scoreMl(corpus.limit(500), model, "text")
      .select("doc_id", "quality_prob", "quality_keep").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(expr.keySet == ml.keySet)
    expr.foreach { case (id, (p, k)) =>
      assert(math.abs(p - ml(id)._1) < 1e-12, s"doc $id prob $p vs ${ml(id)._1}")
      assert(k == ml(id)._2, s"doc $id keep bit")
    }
  }

  test("null text scores as empty instead of aborting the task") {
    import spark.implicits._
    val labeled = corpus.limit(100).select(col("doc_id"), col("text"))
      .withColumn("label", when(col("doc_id") % 4 === 0, 1.0).otherwise(0.0))
    val model = QualityModel.train(labeled, "text", "label", numFeatures = 1 << 14)
    val rows = QualityModel.score(
        Seq((1L, "some text"), (2L, null)).toDF("doc_id", "text"), model, "text")
      .select("doc_id", "quality_prob").collect()
    assert(rows.length == 2)
    assert(!rows.exists(_.isNullAt(1)), "every row gets a probability")
  }
}
