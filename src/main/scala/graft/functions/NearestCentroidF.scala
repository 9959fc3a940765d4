package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Row-local IVF cell assignment: argmax-of-cosine over a small driver-side
  * centroid matrix, compiled into the projection. Replaces the round-2
  * `crossJoin(broadcast(centroids)) + row_number over Window.partitionBy(id)`
  * formulation, which materialized corpus × nCentroids rows and shuffled+
  * sorted ALL of them on the corpus id just to make a row-local decision —
  * the one 100 TB scale-killer flagged by the round-2 review. This pays
  * zero shuffle: the ≤ few-KB centroid matrix rides the expression as a
  * reference object (the same trick Spark uses for broadcast literals).
  *
  * Ties break toward the LOWEST cell index (strict `>` comparison), matching
  * the old window's `orderBy(csim.desc, cid)` ascending tie-break.
  *
  * Reference: IVF probe/rerank as in FAISS-style inverted files; cell
  * assignment semantics per crates/arroyo equivalent none (beyond-reference
  * LLM-pipeline operator).
  */
case class NearestCentroidF(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nearest_centroid requires array<float>, got $t")
  }
  override def dataType: DataType = IntegerType

  /** Precomputed centroid L2 norms (cosine needs them; computing once on
    * the driver keeps the per-row loop to one dot product per centroid).
    */
  private lazy val norms: Array[Double] = centroids.map(NearestCentroidMath.norm)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    NearestCentroidMath.nearest(v, centroids, norms)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val cnorms = ctx.addReferenceObj("centroidNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      code"""
        ${ev.value} = graft.functions.NearestCentroidMath.nearest($v, $cents, $cnorms);
      """.toString
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidF =
    copy(child = newChild)
}

/** Top-level object ⇒ static forwarders callable from generated Java. */
object NearestCentroidMath {

  def norm(v: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  /** Index of the cosine-nearest centroid; ties → lowest index. */
  def nearest(v: ArrayData, cents: Array[Array[Float]], cnorms: Array[Double]): Int = {
    val n = v.numElements()
    var vnorm = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      vnorm += x * x
      i += 1
    }
    vnorm = math.sqrt(vnorm)
    var best = 0
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val m = math.min(n, cv.length)
      var dot = 0.0
      i = 0
      while (i < m) { dot += v.getFloat(i).toDouble * cv(i).toDouble; i += 1 }
      val denom = vnorm * cnorms(c)
      val sim = if (denom == 0.0) 0.0 else dot / denom
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }
}
