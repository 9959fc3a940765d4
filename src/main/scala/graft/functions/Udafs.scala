package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** User-defined aggregate surface — the reference supports Rust UDAFs taking
  * `Vec<T>` (crates/arroyo-udf/arroyo-udf-common/src/parse.rs:200-345); its
  * test UDAFs are `my_median` and `max_product`
  * (crates/arroyo-sql-testing/src/test/queries/udaf.sql). Spark's native
  * equivalent is `Aggregator[IN, BUF, OUT]` registered via
  * `functions.udaf` for SQL callers.
  */
object Udafs {

  /** Exact median via buffer accumulation — mirrors the reference's
    * Vec<f64>-collecting my_median. O(n) state per key is inherent to the
    * exact definition; `percentile_approx` is the bounded-state scale path.
    */
  val myMedian: Aggregator[Double, Array[Double], Double] =
    new Aggregator[Double, Array[Double], Double] {
      def zero: Array[Double] = Array.empty
      def reduce(b: Array[Double], a: Double): Array[Double] = b :+ a
      def merge(x: Array[Double], y: Array[Double]): Array[Double] = x ++ y
      def finish(b: Array[Double]): Double = {
        if (b.isEmpty) return Double.NaN
        val s = b.sorted
        val n = s.length
        if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
      }
      def bufferEncoder: Encoder[Array[Double]] = Encoders.javaSerialization[Array[Double]]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** max(a*b) over rows — the reference's two-column UDAF example
    * (max_product). Constant-size buffer ⇒ full map-side combine.
    */
  val maxProduct: Aggregator[(Double, Double), Double, Double] =
    new Aggregator[(Double, Double), Double, Double] {
      def zero: Double = Double.NegativeInfinity
      def reduce(acc: Double, in: (Double, Double)): Double = math.max(acc, in._1 * in._2)
      def merge(a: Double, b: Double): Double = math.max(a, b)
      def finish(acc: Double): Double = acc
      def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  def register(spark: SparkSession): Unit = {
    spark.udf.register("my_median", udaf(myMedian))
    spark.udf.register("max_product", udaf(maxProduct))
  }
}
