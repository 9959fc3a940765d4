package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Deterministic hyperplane component for sign-LSH: splitmix64 of
  * (plane, dim) mapped to [-1, 1). Top-level object ⇒ static forwarders, so
  * generated Java can call it directly.
  */
object SignLshMath {
  def component(plane: Int, dim: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    // 53 uniform bits → [0,1) → [-1,1)
    ((z >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
  }
}

/** Native codegen'd sign-LSH signature of an array<float> vector under
  * `nPlanes` deterministic random hyperplanes — replaces the
  * aggregate(zip_with(transform(...))) formulation, which allocated
  * nPlanes × dim intermediate arrays PER ROW (the dominant cost of
  * q_ann_lsh / q_ann_ivf flagged in round 1). This compiles to a tight
  * two-level loop with zero allocation, same shape as [[DotProductF]].
  *
  * `planeOffset` shifts the hyperplane family: multi-table LSH uses
  * offset = tableIndex * nPlanes so each table hashes with independent
  * planes.
  */
case class SignLshF(child: Expression, nPlanes: Int, planeOffset: Int = 0)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"sign_lsh requires array<float>, got $t")
  }
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += v.getFloat(i).toDouble * SignLshMath.component(planeOffset + p, i)
        i += 1
      }
      sig = (sig << 1) | (if (dot >= 0) 1L else 0L)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val sig = ctx.freshName("sig")
      code"""
        int $n = $v.numElements();
        long $sig = 0L;
        for (int $p = 0; $p < $nPlanes; $p++) {
          double $dot = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $dot += ((double) $v.getFloat($i)) *
              graft.functions.SignLshMath.component($planeOffset + $p, $i);
          }
          $sig = ($sig << 1) | ($dot >= 0 ? 1L : 0L);
        }
        ${ev.value} = $sig;
      """.toString
    })

  override protected def withNewChildInternal(newChild: Expression): SignLshF =
    copy(child = newChild)
}
