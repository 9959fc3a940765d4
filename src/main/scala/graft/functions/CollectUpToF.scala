package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Growable long buffer that STOPS accepting past `cap + 1` elements — the
  * bounded postings-list state for [[CollectUpToF]].
  */
final class LongsUpTo(var data: Array[Long], var used: Int) {
  def add(v: Long, cap: Int): Unit = {
    if (used > cap) return // already overflowed: only the fact matters
    if (used == data.length)
      data = java.util.Arrays.copyOf(data, math.max(8, data.length * 2))
    data(used) = v
    used += 1
  }
}

/** Bounded collect: gathers the group's long values into an array, but
  * stops at `cap + 1` elements — a group with MORE than `cap` rows keeps
  * exactly `cap + 1` (enough to prove overflow) and no more, so per-key
  * aggregation state is hard-bounded at (cap + 1) × 8 bytes regardless of
  * how hot the key is. This is what makes the single-pass inverted-index
  * design in [[graft.operators.Dedup.ngramJaccardPairs]] safe at corpus
  * scale: a boilerplate shingle with df = 10⁹ holds 8 KB of state (then
  * gets dropped by the df cap), where `collect_list` would hold 8 GB.
  *
  * Output order is partial-arrival order and deliberately NOT relied upon
  * by callers (postings are consumed as sets: exploded for counting,
  * pair-expanded with an a < b filter).
  */
case class CollectUpToF(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongsUpTo] with UnaryLike[Expression] {
  require(cap >= 0 && cap < Int.MaxValue - 1, s"bad cap $cap")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"collect_up_to requires bigint, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): LongsUpTo =
    new LongsUpTo(new Array[Long](8), 0)

  override def update(b: LongsUpTo, input: InternalRow): LongsUpTo = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long], cap)
    b
  }

  override def merge(b: LongsUpTo, other: LongsUpTo): LongsUpTo = {
    var i = 0
    while (i < other.used && b.used <= cap) { b.add(other.data(i), cap); i += 1 }
    b
  }

  override def eval(b: LongsUpTo): Any =
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(b.data, b.used))

  override def serialize(b: LongsUpTo): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * b.used)
    bb.putInt(b.used)
    var i = 0
    while (i < b.used) { bb.putLong(b.data(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongsUpTo = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val data = new Array[Long](math.max(8, n))
    var i = 0
    while (i < n) { data(i) = bb.getLong; i += 1 }
    new LongsUpTo(data, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectUpToF =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectUpToF =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectUpToF =
    copy(child = newChild)
  override def prettyName: String = "collect_up_to"
}
