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

  /** Buffer for [[weightedPercentileCont]]: (value, weight) pairs + the
    * percentile argument (constant per call, captured from the first row).
    */
  final case class WPctlBuf(var vals: Array[Double], var ws: Array[Double],
      var used: Int, var p: Double) {
    def add(v: Double, w: Double, pct: Double): WPctlBuf = {
      if (used == vals.length) {
        val n = math.max(8, vals.length * 2)
        vals = java.util.Arrays.copyOf(vals, n)
        ws = java.util.Arrays.copyOf(ws, n)
      }
      vals(used) = v; ws(used) = w; used += 1; p = pct
      this
    }
  }

  private val wpctlBufEncoder = Encoders.product[WPctlBuf]

  /** `approx_percentile_cont_with_weight(value, weight, p)` with the
    * reference engine's observable semantics: walk the values in ascending
    * order accumulating WEIGHT, and stop when the cumulative weight reaches
    * `p × row-count` (not `p × Σweight` — verified against the
    * every_aggregate.sql golden, where mean weight ≈ 10 puts the weighted
    * median near the 5th percentile of the data). Exact and deterministic
    * where the reference's t-digest is approximate; on this threshold rule
    * the two agree for continuous-ish data.
    */
  val weightedPercentileCont: Aggregator[(Double, Double, Double), WPctlBuf, Double] =
    new Aggregator[(Double, Double, Double), WPctlBuf, Double] {
      def zero: WPctlBuf = WPctlBuf(Array.empty, Array.empty, 0, 0.5)
      def reduce(b: WPctlBuf, a: (Double, Double, Double)): WPctlBuf =
        b.add(a._1, a._2, a._3)
      def merge(x: WPctlBuf, y: WPctlBuf): WPctlBuf = {
        val out = WPctlBuf(new Array[Double](x.used + y.used),
          new Array[Double](x.used + y.used), 0, if (x.used > 0) x.p else y.p)
        System.arraycopy(x.vals, 0, out.vals, 0, x.used)
        System.arraycopy(y.vals, 0, out.vals, x.used, y.used)
        System.arraycopy(x.ws, 0, out.ws, 0, x.used)
        System.arraycopy(y.ws, 0, out.ws, x.used, y.used)
        out.used = x.used + y.used
        out
      }
      def finish(b: WPctlBuf): Double = {
        if (b.used == 0) return Double.NaN
        val idx = (0 until b.used).sortBy(b.vals(_))
        val threshold = b.p * b.used
        var cum = 0.0
        var i = 0
        while (i < idx.length) {
          cum += b.ws(idx(i))
          if (cum >= threshold) return b.vals(idx(i))
          i += 1
        }
        b.vals(idx.last)
      }
      def bufferEncoder: Encoder[WPctlBuf] = wpctlBufEncoder
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  def register(spark: SparkSession): Unit = {
    spark.udf.register("my_median", udaf(myMedian))
    spark.udf.register("max_product", udaf(maxProduct))
    spark.udf.register("approx_percentile_cont_with_weight", udaf(weightedPercentileCont))
  }
}
