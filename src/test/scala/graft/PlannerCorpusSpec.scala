package graft

import graft.sql.Pipeline
import java.nio.file.{Files, Paths}

/** The reference planner's POSITIVE test corpus (every
  * crates/arroyo-planner/src/test/queries sql file without a `--fail`
  * header): each file must parse, validate, and plan end-to-end —
  * plan_tests.rs's contract, minus scheduling. The harness pre-registers a
  * nexmark table and the src/test/udfs Rust UDFs (test/mod.rs:14-33);
  * planning stand-ins with the same names/signatures are registered here.
  *
  * All 46 positives plan: hidden `_timestamp` propagates demand-driven
  * through subquery projections and CREATE VIEW chains via the
  * analysis-retry injection, equal-width re-windowing reuses the input's
  * window column, unordered ranking windows get a constant ORDER BY, and
  * unnest nested in a scalar expression hoists into a subquery like the
  * reference's UnnestRewriter.
  */
class PlannerCorpusSpec extends SparkSpec {

  private val corpusDir = "/root/reference/crates/arroyo-planner/src/test/queries"

  private val skip: Map[String, String] = Map.empty

  private def registerHarness(p: Pipeline): Unit = {
    p.runStatement(graft.sql.Ddl.parse(
      "CREATE TABLE nexmark WITH (connector='nexmark', event_rate='10', type='source')"))
    spark.udf.register("cbor_to_json", (_: Array[Byte]) => "{}")
    spark.udf.register("get_city", (_: String) => "city")
    // irate(values: Vec<f32>) — a Vec arg makes a reference UDF a UDAF
    // (arroyo-udf parse.rs); stand-in aggregator with the same signature
    val irateAgg: org.apache.spark.sql.expressions.Aggregator[Float, Float, Float] =
      new org.apache.spark.sql.expressions.Aggregator[Float, Float, Float] {
        def zero: Float = 0f
        def reduce(b: Float, a: Float): Float = a
        def merge(a: Float, b: Float): Float = a
        def finish(b: Float): Float = b
        def bufferEncoder: org.apache.spark.sql.Encoder[Float] =
          org.apache.spark.sql.Encoders.scalaFloat
        def outputEncoder: org.apache.spark.sql.Encoder[Float] =
          org.apache.spark.sql.Encoders.scalaFloat
      }
    spark.udf.register("irate", org.apache.spark.sql.functions.udaf(irateAgg))
    spark.udf.register("parse_log", (_: String) => "{}")
    spark.udf.register("parse_prom", (_: String) => "{}")
  }

  private val positives: Seq[String] = {
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(corpusDir)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".sql"))
      .map(_.stripSuffix(".sql"))
      .filterNot { n =>
        new String(Files.readAllBytes(Paths.get(s"$corpusDir/$n.sql")))
          .startsWith("--fail")
      }
      .toSeq.sorted
  }

  test("corpus inventory matches the skip map") {
    assert(positives.size == 46, s"corpus changed: ${positives.size} positives")
    val unknown = skip.keySet.diff(positives.toSet)
    assert(unknown.isEmpty, s"skip entries not in corpus: $unknown")
  }

  positives.filterNot(skip.contains).foreach { name =>
    test(s"plans: $name") {
      GraftSession.registerFunctions(spark)
      val p = new Pipeline(spark, streaming = true)
      registerHarness(p)
      p.plan(new String(Files.readAllBytes(Paths.get(s"$corpusDir/$name.sql"))))
    }
  }
}
