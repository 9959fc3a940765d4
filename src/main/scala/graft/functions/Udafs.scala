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

  /** Growable buffer for [[myMedian]]: amortized-O(1) append (the aggregate
    * path keeps the buffer object live between rows, so in-place mutation
    * with doubling growth replaces the old O(n²) per-key `b :+ a` copies).
    * Product-encoded — no java serialization on spill/shuffle.
    */
  final case class MedianBuf(var data: Array[Double], var used: Int) {
    def add(v: Double): MedianBuf = {
      if (used == data.length)
        data = java.util.Arrays.copyOf(data, math.max(8, data.length * 2))
      data(used) = v
      used += 1
      this
    }
  }

  private val medianBufEncoder = Encoders.product[MedianBuf]

  /** Exact median via buffer accumulation — mirrors the reference's
    * Vec<f64>-collecting my_median. O(n) state per key is inherent to the
    * exact definition; `percentile_approx` is the bounded-state scale path.
    */
  val myMedian: Aggregator[Double, MedianBuf, Double] =
    new Aggregator[Double, MedianBuf, Double] {
      def zero: MedianBuf = MedianBuf(Array.empty, 0)
      def reduce(b: MedianBuf, a: Double): MedianBuf = b.add(a)
      def merge(x: MedianBuf, y: MedianBuf): MedianBuf = {
        val out = new Array[Double](x.used + y.used)
        System.arraycopy(x.data, 0, out, 0, x.used)
        System.arraycopy(y.data, 0, out, x.used, y.used)
        MedianBuf(out, out.length)
      }
      def finish(b: MedianBuf): Double = {
        if (b.used == 0) return Double.NaN
        val s = java.util.Arrays.copyOf(b.data, b.used)
        java.util.Arrays.sort(s)
        val n = s.length
        if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
      }
      def bufferEncoder: Encoder[MedianBuf] = medianBufEncoder
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
