package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bucket-dispatched bloom membership over a PARTITIONED bloom-filter set:
  * `might_contain(blooms[pmod(key, numBuckets)], key)` as ONE codegen'd
  * expression, with the serialized per-bucket bit arrays living in a Spark
  * BROADCAST VARIABLE — outside the plan tree.
  *
  * This is the scale-safe form of [[graft.operators.Dedup.bloomIncrementalPartitioned]]'s
  * prune: the earlier numBuckets-branch nested CASE over inline
  * `BloomFilterMightContain` literals blows past codegen limits (falling
  * back to interpreted) once bucket counts are large enough to matter, and
  * re-serializes every bloom into every task binary. Here the plan carries
  * one expression node; the bit arrays ship once per executor via torrent
  * broadcast, and each executor lazily deserializes them into
  * [[BloomFilter]]s exactly once per JVM (the transient lazy val).
  *
  * A `null` slot means "bucket absent from the reference" — definite-new,
  * probe returns false. Bucket dispatch uses floorMod, matching the
  * `pmod(bk, numBuckets)` bucketing of the build side.
  */
case class BloomBucketMightContainF(child: Expression,
    blooms: Broadcast[Array[Array[Byte]]]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_bucket_might_contain requires a BIGINT key, got $t")
  }
  override def dataType: DataType = BooleanType

  // deserialized once per executor JVM; BloomFilter reads are thread-safe
  @transient private lazy val filters: Array[BloomFilter] =
    blooms.value.map { b =>
      if (b == null) null
      else BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))
    }

  def test(key: Long): Boolean = {
    val f = filters(java.lang.Math.floorMod(key, filters.length.toLong).toInt)
    f != null && f.mightContainLong(key)
  }

  override protected def nullSafeEval(input: Any): Any =
    test(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, key => {
      val ref = ctx.addReferenceObj("bloomBuckets", this,
        classOf[BloomBucketMightContainF].getName)
      s"${ev.value} = $ref.test($key);"
    })

  override protected def withNewChildInternal(newChild: Expression): BloomBucketMightContainF =
    copy(child = newChild)
}
