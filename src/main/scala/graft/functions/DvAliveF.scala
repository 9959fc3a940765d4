package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deletion-vector liveness as ONE codegen'd predicate:
  * `!dv(fileName).contains(rowIndex)`, with the roaring bitmaps living
  * in a Spark BROADCAST VARIABLE — outside the plan tree (same shape as
  * [[BloomBucketMightContainF]]). The earlier Scala-UDF form broke the
  * DV'd files' scan out of whole-stage codegen and paid the
  * catalyst→Scala boxing boundary per row; this keeps the filter
  * inside the generated loop — one `HashMap.get` keyed directly by the
  * scan's UTF8String (no per-row String decode) and an O(1) bitmap
  * probe. A file with no vector in the map is fully live.
  */
private[graft] case class DvAliveF(left: Expression, right: Expression,
    bitmaps: Broadcast[Map[String, graft.sinks.DeletionVectors.Bitmap]])
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dv_alive requires (STRING file name, BIGINT position), got ($l, $r)")
    }
  override def dataType: DataType = BooleanType

  // materialized once per executor JVM, keyed by UTF8String so the
  // generated code probes with the scan's value verbatim
  @transient private lazy val byName = {
    val m = new java.util.HashMap[UTF8String, graft.sinks.DeletionVectors.Bitmap]()
    bitmaps.value.foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
    m
  }

  def test(name: UTF8String, pos: Long): Boolean = {
    val bm = byName.get(name)
    bm == null || !bm.contains(pos)
  }

  override protected def nullSafeEval(n: Any, p: Any): Any =
    test(n.asInstanceOf[UTF8String], p.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (n, p) => {
      val ref = ctx.addReferenceObj("dvAlive", this, classOf[DvAliveF].getName)
      s"${ev.value} = $ref.test($n, $p);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DvAliveF = copy(left = newLeft, right = newRight)
}
