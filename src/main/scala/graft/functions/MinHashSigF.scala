package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Row-local MinHash signature math, callable from generated code (top-level
  * object ⇒ static forwarder). Kirsch-Mitzenmacher double hashing:
  * h_i = (h1 + i·h2) mod 2^40, signature_i = min over the shingles — each
  * shingle hashed twice (xxhash64 seeds 42 and 1), not numHashes times.
  * Value-identical to the previous SQL formulation (same xxhash64).
  */
object MinHashMath {
  private final val M = 1L << 40

  def signature(shingles: ArrayData, numHashes: Int): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = shingles.numElements()
    var s = 0
    while (s < n) {
      val str = shingles.getUTF8String(s)
      if (str != null) {
        val h1 = Math.floorMod(XXH64.hashUTF8String(str, 42L), M)
        val h2 = Math.floorMod(XXH64.hashUTF8String(str, 1L), M) | 1L
        var i = 0
        var h = h1
        while (i < numHashes) {
          if (h < sig(i)) sig(i) = h
          h += h2
          if (h >= M) h -= M
          i += 1
        }
      }
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }
}

/** Codegen'd per-row MinHash signature: array<string> shingles →
  * array<bigint> of `numHashes` minima. Replaces the explode →
  * groupBy(doc).agg(64 × min) pipeline, which paid a full (doc, shingle)
  * shuffle plus a 64-column aggregate shuffle — the signature is a pure
  * row-local computation, so those shuffles were structural overhead.
  * (cf. reference MinHash usage in its dedup examples; 100 TB framing:
  * the only remaining shuffle in LSH dedup is the banding groupBy.)
  *
  * NOTE on the double-hash step: h2 is forced odd and the space is 2^40, so
  * successive h_i values cycle through distinct residues (gcd(h2, 2^40)=1).
  */
case class MinHashSigF(child: Expression, numHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashMath.signature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      code"""
        ${ev.value} = graft.functions.MinHashMath.signature($v, $numHashes);
      """.toString
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigF =
    copy(child = newChild)
}
