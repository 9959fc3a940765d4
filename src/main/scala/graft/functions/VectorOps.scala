package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression computing the dot product of two FLOAT array
  * columns, accumulating in double.
  *
  * This is the inner loop of brute-force / IVF similarity search over
  * embedding columns, so it must stay inside whole-stage codegen: a Scala
  * UDF would pay serialization per row; `aggregate(zip_with(...))` builds an
  * intermediate array per row. This expression compiles to a tight primitive
  * loop over the two `ArrayData`s with no allocation.
  *
  * Null handling: null if either side is null (standard BinaryExpression
  * contract); mismatched lengths dot the common prefix (caller guarantees
  * equal dims).
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f requires array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      code"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
        }
        ${ev.value} = $acc;
      """.toString
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** Dot product of two array<float> columns (double result, codegen'd). */
  def dotF(a: Column, b: Column): Column =
    GraftShim.column(DotProductF(GraftShim.expression(a), GraftShim.expression(b)))

  /** L2 norm of an array<float> column. */
  def normF(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(dotF(a, a))
  }

  /** Cosine similarity of two array<float> columns. */
  def cosineF(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.when
    val denom = normF(a) * normF(b)
    when(denom =!= 0.0, dotF(a, b) / denom).otherwise(0.0)
  }

  /** [[cosineF]] with the two norms supplied as precomputed columns — the
    * r18 hoist for pair-forming joins (guide §1.2 step 2): `cosineF` inside
    * an N×M join/cross-join evaluates THREE full-dimension dot loops per
    * PAIR (dot(a,b) + both self-dots under the sqrt), but each norm is a
    * pure function of one row, so hoisting `normF` into a per-row column
    * before the join cuts the per-pair work to one dot loop. BIT-IDENTICAL
    * to cosineF by construction: the hoisted norm is the same sqrt(dotF(x,
    * x)) expression evaluated over the same row (same loop, same order,
    * same double), and the null/zero-denominator branches are unchanged —
    * a null vector yields a null norm, a null denom, and the same 0.0.
    */
  def cosinePre(a: Column, b: Column, normA: Column, normB: Column): Column = {
    import org.apache.spark.sql.functions.when
    val denom = normA * normB
    when(denom =!= 0.0, dotF(a, b) / denom).otherwise(0.0)
  }
}
