package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local Unicode NFC normalization, callable from generated code
  * (top-level object ⇒ static forwarder).
  */
object NfcMath {
  /** UTF8String → NFC-composed UTF8String. Fast path: most corpus text is
    * already normalized (all of ASCII is), and `Normalizer.isNormalized`
    * answers that without allocating the composed copy — the input slice
    * is returned untouched.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Codegen'd Unicode NFC normalization (string → string). Spark ships no
  * normalization function, but canonical composition is step one of any
  * text-cleaning pipeline: the same visible text arrives from the crawl in
  * both composed (é) and decomposed (e + U+0301) forms, and every
  * downstream equality — exact dedup hashes, shingles, token counts —
  * silently misses matches until the forms are unified. JDK-native
  * (`java.text.Normalizer`), so the hot path stays inside whole-stage
  * codegen with zero external deps.
  */
case class NfcNormalizeF(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nfc_normalize requires string, got $t")
  }
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NfcMath.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      code"""
        ${ev.value} = graft.functions.NfcMath.nfc($v);
      """.toString
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeF =
    copy(child = newChild)
}
