package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** The exact HashingTF (V2, Spark-3 hash) feature bucket of a string term:
  * `nonNegativeMod(Murmur3_x86_32.hashUnsafeBytes2(utf8(term), seed=42),
  * numFeatures)` — byte-identical to what `ml.feature.HashingTF` computes
  * inside its transform UDF (verified against the spark-mllib 4.1.2
  * bytecode: V2 → `FeatureHasher.murmur3Hash` → `hashUnsafeBytes2`; note
  * SQL's builtin `hash()` is the DIFFERENT `hashUnsafeBytes` tail variant
  * and does NOT agree for terms whose UTF-8 length % 4 != 0).
  *
  * Exists so [[graft.operators.QualityModel.score]] can be a pure
  * codegen'd expression chain — coefficient lookup by this bucket —
  * instead of the non-fusable ML transform UDF stack.
  */
object HashBucketMath {
  private val Seed = 42
  def bucket(s: UTF8String, numFeatures: Int): Int = {
    val h = Murmur3_x86_32.hashUnsafeBytes2(
      s.getBaseObject, s.getBaseOffset, s.numBytes(), Seed)
    java.lang.Math.floorMod(h, numFeatures)
  }
}

/** Codegen'd `hash_bucket(string) → int` over `numFeatures` buckets: see
  * [[HashBucketMath]].
  */
case class HashBucketF(child: Expression, numFeatures: Int)
    extends UnaryExpression {
  require(numFeatures > 0, s"numFeatures must be positive, got $numFeatures")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hash_bucket requires string, got $t")
  }
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    HashBucketMath.bucket(input.asInstanceOf[UTF8String], numFeatures)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.HashBucketMath.bucket($v, $numFeatures);")

  override protected def withNewChildInternal(newChild: Expression): HashBucketF =
    copy(child = newChild)
}
