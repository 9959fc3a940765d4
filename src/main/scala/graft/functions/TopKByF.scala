package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Bounded top-k state for [[TopKByF]]: a binary MIN-heap of (score, id)
  * ordered by (score asc, id desc) — the root is the WORST kept entry, so
  * a better candidate replaces it in O(log k). Never holds more than k
  * entries regardless of group size.
  */
final class TopKHeap(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** Spark SQL double semantics (SQLOrderingUtil): -0.0 == 0.0, NaN ==
    * NaN, NaN greater than everything. The window this replaces ordered by
    * (score DESC, id ASC); `better(a, b)` is true iff a ranks strictly
    * before b under that order.
    */
  @inline private def cmpScore(x: Double, y: Double): Int =
    if (x < y) -1 else if (x > y) 1 else if (x == y) 0
    else java.lang.Double.compare(x, y) // NaN handling, matches Spark
  @inline def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = cmpScore(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  private def siftDown(pos0: Int): Unit = {
    var pos = pos0
    while (true) {
      val l = 2 * pos + 1
      val r = l + 1
      var worst = pos
      // min-heap on the (score desc, id asc) rank ⇒ parent is WORSE
      // (ranks after) than children: child worse than current ⇒ swap
      if (l < size && better(scores(worst), ids(worst), scores(l), ids(l))) worst = l
      if (r < size && better(scores(worst), ids(worst), scores(r), ids(r))) worst = r
      if (worst == pos) return
      val ts = scores(pos); val ti = ids(pos)
      scores(pos) = scores(worst); ids(pos) = ids(worst)
      scores(worst) = ts; ids(worst) = ti
      pos = worst
    }
  }

  def add(score: Double, id: Long): Unit = {
    if (size < k) {
      // sift up
      var pos = size
      scores(pos) = score; ids(pos) = id
      size += 1
      while (pos > 0) {
        val parent = (pos - 1) / 2
        // parent must be worse-or-equal than child
        if (better(scores(parent), ids(parent), scores(pos), ids(pos))) {
          val ts = scores(pos); val ti = ids(pos)
          scores(pos) = scores(parent); ids(pos) = ids(parent)
          scores(parent) = ts; ids(parent) = ti
          pos = parent
        } else return
      }
    } else if (k > 0 && better(score, id, scores(0), ids(0))) {
      scores(0) = score; ids(0) = id
      siftDown(0)
    }
  }

  /** Entries in rank order (score desc, id asc) — rank = index + 1. */
  def sorted(): Array[(Double, Long)] = {
    val out = Array.tabulate(size)(i => (scores(i), ids(i)))
    out.sortWith { case ((s1, i1), (s2, i2)) => better(s1, i1, s2, i2) }
  }
}

/** Bounded per-group top-k aggregate (r18, guide §2.3 "aggregate before
  * you shuffle"): keeps the k best (score, id) pairs under the order
  * (score DESC, id ASC) and returns them rank-ordered as
  * array<struct<id, score>>.
  *
  * Replaces the `row_number().over(partitionBy(group).orderBy(score desc,
  * id)) <= k` pattern in the ANN scans. The window form — even with
  * Spark's WindowGroupLimit partial top-k — LOCALLY SORTS every candidate
  * row (O(n log n) over corpus×queries rows: 34 executor-seconds of
  * q_ann_pq's ADC stage at sf1 were this sort); the aggregate form keeps
  * O(groups × k) state, does O(n log k) heap work with map-side partials,
  * and ships only k rows per group per task. Value-identical: (score, id)
  * is a STRICT total order whenever ids are unique within a group — the
  * ANN pipelines' invariant — so "rows with row_number ≤ k" and "the k
  * heap-best" are the same set in the same order; double comparison
  * follows Spark's SQL semantics (-0.0 == 0.0, NaN greatest) and a NULL
  * score ranks after every non-null score (window DESC NULLS LAST) with
  * id-ascending among nulls, encoded as -∞ (cosines are ≥ -1, no
  * collision). NULL ids are skipped — a null-id row never survives the
  * downstream id-equality rerank join anyway. R18OptSpec pins aggregate ≡
  * window on adversarial data (ties, -0.0, duplicates).
  */
case class TopKByF(left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {
  require(k > 0 && k < 10000000, s"bad k $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"top_k_by requires (double score, bigint id), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(b: TopKHeap, input: InternalRow): TopKHeap = {
    val id = right.eval(input)
    if (id != null) {
      val s = left.eval(input)
      val score =
        if (s == null) Double.NegativeInfinity
        else {
          val d = s.asInstanceOf[Double]
          if (d == 0.0) 0.0 else d // normalize -0.0 like Spark's ordering
        }
      b.add(score, id.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) { b.add(other.scores(i), other.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKHeap): Any = {
    val entries = b.sorted()
    val out = new Array[Any](entries.length)
    var i = 0
    while (i < entries.length) {
      out(i) = new GenericInternalRow(Array[Any](entries(i)._2, entries(i)._1))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * b.size)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putDouble(b.scores(i)); bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) {
      val s = bb.getDouble; val id = bb.getLong
      h.add(s, id)
      i += 1
    }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByF =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByF =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByF =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "top_k_by"
}
