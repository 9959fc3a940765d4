package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) multi-column clustering — the layout half of
  * the manifest/log metrics story (`IcebergLog.planFiles`,
  * `DeltaLog` file skipping): min/max pruning only skips files when
  * each file covers a NARROW range of the filtered column, and a table
  * sorted by one column has full-width ranges on every other. Mapping
  * each clustering column to a 256-quantile bucket id and interleaving
  * the bucket bits puts rows that are close in EVERY dimension into the
  * same file, so bounds pruning works on all of them at once — the same
  * device as Delta's OPTIMIZE ZORDER BY.
  *
  * Spark-first mechanics (all codegen'd builtins, no UDFs, two passes):
  *   1. one `approxQuantile` pass computes 255 cut points per column on
  *      an order-preserving DOUBLE proxy (numerics as-is; dates/
  *      timestamps via unix_date/unix_micros; strings by their 7-byte
  *      big-endian prefix — monotone w.r.t. lexicographic order);
  *   2. per row, bucket id = #boundaries ≤ proxy (a `filter` over a
  *      255-literal array, whole-stage codegen), nulls → bucket 0;
  *   3. the 8-bit bucket ids interleave into one LONG z-value with
  *      shiftleft/bitwise-or terms;
  *   4. a DETERMINISTIC curve-cell-aligned split (not sampled range
  *      partitioning) lays rows out along the curve: pick the finest
  *      Morton level with ≤ nFiles whole cells, give each cell its own
  *      file(s), and split multi-file cells internally by curve
  *      position. One shuffle — the rewrite's unavoidable cost — and
  *      the helper columns are dropped before the write.
  *
  * Why not `repartitionByRange(nFiles, zval)`: range partitioning
  * SAMPLES its cut points, and a cut landing mid-cell hands one file a
  * sliver of the curve-adjacent neighbor cell. Morton curves jump —
  * the cell after (x-hi, y-lo) is (x-lo, y-hi) — so that sliver can
  * sit at the far corner of the space and the file's bounding box
  * inflates to full width in BOTH dimensions, which defeats the min/max
  * pruning the rewrite exists to enable. Aligning every file boundary
  * to a cell boundary bounds each file's box by one cell (≤ 1/2^level
  * of the space per dimension), deterministically.
  *
  * At 100 TB this is the difference between "point query opens every
  * file" and "point query opens O(1) files" for multi-dimension
  * filters; the quantile pass is O(rows) with a constant-size sketch
  * per partition and the shuffle is the rewrite itself.
  */
object ZOrder {

  /** Max clustering columns: 8 bits each into one 63-bit z-value. */
  val maxColumns = 7

  private val zCol = "__graft_zval"

  /** Order-preserving DOUBLE proxy for a clustering column. */
  private def proxy(dt: DataType, c: Column): Column = dt match {
    case _: NumericType => c.cast(DoubleType)
    case DateType => unix_date(c).cast(DoubleType)
    case TimestampType => unix_micros(c).cast(DoubleType)
    case BooleanType => when(c, 1.0d).otherwise(0.0d)
    case StringType =>
      // first 7 bytes as an unsigned big-endian integer: monotone with
      // the string's lexicographic (byte) order, < 2^56 so the double
      // keeps enough precision to separate 256 quantile buckets
      conv(rpad(substring(hex(encode(c, "UTF-8")), 1, 14), 14, "0"), 16, 10)
        .cast(DoubleType)
    case BinaryType =>
      conv(rpad(substring(hex(c), 1, 14), 14, "0"), 16, 10).cast(DoubleType)
    case other => throw new IllegalArgumentException(
      s"zorder: unsupported clustering column type $other")
  }

  private val pidCol = "__graft_zpid"

  /** `df` with rows laid out along the z-curve of `cols`, split into
    * `nFiles` partitions (one output file each when written) whose
    * boundaries are ALIGNED to Morton-cell boundaries — no file ever
    * contains rows from two cells, so every file's bounding box is at
    * most one cell wide per clustered dimension. The returned frame is
    * write-ready; writing it per hive-partition group (the caller's
    * job) keeps clustering within partitions.
    */
  def cluster(df: DataFrame, cols: Seq[String], nFiles: Int): DataFrame = {
    require(cols.nonEmpty && cols.size <= maxColumns,
      s"zorder: 1..$maxColumns clustering columns (got ${cols.size})")
    cols.foreach(c => require(df.schema.fieldNames.contains(c),
      s"zorder: no column $c in ${df.schema.fieldNames.mkString(", ")}"))
    val n = math.max(1, nFiles)
    val ncols = cols.size
    // finest Morton level whose whole-cell count fits in nFiles: each
    // cell owns >= 1 file, the first (n % nCells) cells own one extra,
    // and multi-file cells split internally by curve position — a
    // within-cell cut can never widen a box past the cell itself.
    val level = (0 to 8).takeWhile(l => (1L << (ncols * l)) <= n).last
    val nCells = 1L << (ncols * level)
    val cellShift = ncols * (8 - level)
    val cellStride = 1L << cellShift
    val base = n / nCells
    val rem = n % nCells
    val withZ = df.withColumn(zCol, zValue(df, cols))
    val cell = shiftright(col(zCol), cellShift)
    val filesHere = when(cell < rem, lit(base + 1)).otherwise(lit(base))
    val firstFile = cell * base + least(cell, lit(rem))
    val within = least(
      floor(col(zCol).bitwiseAND(lit(cellStride - 1)).cast(DoubleType)
        * filesHere / cellStride.toDouble),
      filesHere - 1L)
    val staged = withZ.withColumn(pidCol, (firstFile + within).cast(IntegerType))
    val schema = staged.schema
    val pidIdx = schema.fieldIndex(pidCol)
    // exact partition-id placement (no sampling): a one-line RDD
    // Partitioner; the z computation above stays codegen'd and this is
    // the rewrite's one shuffle either way
    val exact = staged.rdd
      .map(r => (r.getInt(pidIdx), r))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = n
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .values
    df.sparkSession.createDataFrame(exact, schema)
      .sortWithinPartitions(zCol)
      .drop(pidCol, zCol)
  }

  /** The LONG z-value column for `cols` of `df` (exposed for specs). */
  def zValue(df: DataFrame, cols: Seq[String]): Column = {
    val proxies = cols.map(c => proxy(df.schema(c).dataType, col(c)))
    // one quantile pass over all columns at once; 255 cuts → 256 buckets
    val probs = (1 until 256).map(_ / 256.0).toArray
    val proxied = df.select(proxies.zipWithIndex.map {
      case (p, i) => p.as(s"p$i")
    }: _*)
    val cuts = proxied.stat.approxQuantile(
      cols.indices.map(i => s"p$i").toArray, probs, 0.001)
    val buckets = proxies.zip(cuts).map { case (p, bounds) =>
      bucketOf(p, bounds.distinct.sorted)
    }
    interleave(buckets)
  }

  /** #boundaries ≤ proxy, as a codegen'd filter over a literal array
    * (an all-null / empty column has no quantiles → bucket 0).
    */
  private def bucketOf(p: Column, bounds: Array[Double]): Column =
    if (bounds.isEmpty) lit(0)
    else {
      val arr = array(bounds.map(lit(_)).toIndexedSeq: _*)
      val v = coalesce(p, lit(Double.MinValue))
      size(filter(arr, b => b <= v))
    }

  /** Interleave bit i of bucket j into position i*ncols + j. */
  private def interleave(buckets: Seq[Column]): Column = {
    val ncols = buckets.size
    val terms = for {
      bit <- 0 until 8
      (b, j) <- buckets.zipWithIndex
    } yield shiftleft(
      shiftright(b.cast(LongType), bit).bitwiseAND(lit(1L)),
      bit * ncols + j)
    terms.reduce(_.bitwiseOR(_))
  }
}
