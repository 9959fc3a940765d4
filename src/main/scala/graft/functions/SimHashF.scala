package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Row-local 64-bit SimHash (Charikar 2002), callable from generated code
  * (top-level object ⇒ static forwarder). Each token's xxhash64 (seed 42,
  * Spark's `xxhash64` default — value-identical to the previous
  * explode/UDAF formulation) votes ±1 per bit position; the fingerprint
  * sets the bits with a positive tally. Duplicate tokens vote once per
  * occurrence, exactly like the exploded shape did.
  */
object SimHashMath {
  def simhash(tokens: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = tokens.numElements()
    var s = 0
    while (s < n) {
      val str = tokens.getUTF8String(s)
      if (str != null) {
        val h = XXH64.hashUTF8String(str, 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
          i += 1
        }
      }
      s += 1
    }
    var r = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) r |= (1L << i); i += 1 }
    r
  }
}

/** Codegen'd per-row SimHash fingerprint: array<string> tokens → bigint.
  * Replaces the explode → groupBy(doc).agg(UDAF) pipeline, which paid a
  * full (doc, token-hash) shuffle plus a 256-byte-per-doc partial-merge
  * aggregate shuffle — the fingerprint is a pure row-local computation,
  * so both shuffles were structural overhead (the same shape
  * [[MinHashSigF]] already eliminated for minhash signatures).
  */
case class SimHashF(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash requires array<string>, got $t")
  }
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHashMath.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      code"""
        ${ev.value} = graft.functions.SimHashMath.simhash($v);
      """.toString
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashF =
    copy(child = newChild)
}
