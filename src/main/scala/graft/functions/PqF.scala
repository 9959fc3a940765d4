package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization (PQ) kernels for ANN at corpus scale: a D-dim
  * float vector is split into M contiguous subvectors and each subvector
  * is replaced by the index of its nearest codeword in a per-subspace
  * codebook (K codewords each, trained once on a bounded sample). The
  * encoded row is M small ints — e.g. 64 floats (256 B) → 8 codes — so
  * the scan side of a nearest-neighbor query reads a ~32× smaller index
  * instead of the raw vectors. Scoring is classic ADC (asymmetric
  * distance computation): the query stays exact, the corpus side is
  * reconstructed per-subspace from the codebook, so cosine(q, x̂) needs
  * only M codeword dot products per row.
  *
  * Both expressions are codegen'd ([[NearestCentroidF]] pattern): the
  * codebook rides the generated code as a reference object, the hot loop
  * is branch-free Java over primitive arrays. Beyond-reference
  * LLM-pipeline operator (IVFADC family per Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011).
  */
case class PqEncodeF(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_encode requires array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // UnsafeArrayData (r18): the codes are read 1-16× per candidate PAIR in
  // the ADC scan — a GenericArrayData would unbox an Object per getInt
  override protected def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      PqMath.encode(input.asInstanceOf[ArrayData], codebooks))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      code"""
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(graft.functions.PqMath.encode($v, $cb));
      """.toString
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeF =
    copy(child = newChild)
}

/** ADC cosine: approximate cosine(query, x) from x's PQ codes alone.
  * left = codes (array<int>), right = query vector (array<float>).
  * Codeword norms² are precomputed driver-side so the per-row cost is
  * M subspace dot products + one sqrt.
  */
case class PqCosineF(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Float]]]) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_cosine requires (array<int> codes, array<float> query), got ($l, $r)")
  }
  override def dataType: DataType = DoubleType

  /** ||codeword||² per (subspace, code) — reconstruction norm is their sum. */
  private lazy val norms2: Array[Array[Double]] =
    codebooks.map(_.map { cw =>
      var s = 0.0; var i = 0
      while (i < cw.length) { s += cw(i).toDouble * cw(i).toDouble; i += 1 }
      s
    })

  override protected def nullSafeEval(codes: Any, query: Any): Any =
    PqMath.adcCosine(codes.asInstanceOf[ArrayData], query.asInstanceOf[ArrayData],
      codebooks, norms2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    val n2 = ctx.addReferenceObj("pqNorms2", norms2, "double[][]")
    nullSafeCodeGen(ctx, ev, (c, q) => {
      code"""
        ${ev.value} = graft.functions.PqMath.adcCosine($c, $q, $cb, $n2);
      """.toString
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqCosineF = copy(left = newLeft, right = newRight)
}

/** Per-QUERY ADC lookup table (r18, guide §1.2 step 2): [[PqCosineF]]
  * reconstructed the codebook dot product per (row × query) — M·dsub =
  * full-dimension multiplies per scanned row, plus a full-dimension query
  * self-dot, i.e. the same flop count as EXACT cosine (PQ was saving scan
  * bytes but no compute). Classic ADC instead precomputes, per query, the
  * table lut[s][c] = dot(query subvector s, codeword c) — dim × K
  * multiplies ONCE per query on the tiny broadcast side — after which each
  * scanned row costs M table lookups. Output layout: array<double> of
  * length M·K + 1, lut[s·K + c] as above, last slot = ‖query‖² (the
  * query self-dot, also per-query-constant, hoisted out of the row loop).
  *
  * Value note: the per-subspace partial sums accumulate in a different
  * grouping than [[PqMath.adcCosine]]'s flat loop, so results can differ
  * in the last ulp; candidate sets are rank-separated far above ulp noise
  * (PqSpec pins equality on the bench corpora, and the exact re-rank
  * downstream re-scores every survivor with true cosine).
  */
case class PqLutF(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_lut requires array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // UnsafeArrayData (r18): the table is probed 16× per candidate pair
  override protected def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      PqMath.adcLut(input.asInstanceOf[ArrayData], codebooks))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      code"""
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(graft.functions.PqMath.adcLut($v, $cb));
      """.toString
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutF =
    copy(child = newChild)
}

/** ADC cosine from a precomputed [[PqLutF]] table: M lookups + M norm²
  * lookups + one sqrt per row — no per-row reconstruction.
  * left = codes (array<int>), right = lut (array<double>).
  */
case class PqCosineLutF(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Float]]]) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_cosine_lut requires (array<int> codes, array<double> lut), got ($l, $r)")
  }
  override def dataType: DataType = DoubleType

  /** ‖codeword‖² per (subspace, code) — identical to [[PqCosineF]]. */
  private lazy val norms2: Array[Array[Double]] =
    codebooks.map(_.map { cw =>
      var s = 0.0; var i = 0
      while (i < cw.length) { s += cw(i).toDouble * cw(i).toDouble; i += 1 }
      s
    })
  private val codesPerSubspace: Int = codebooks.headOption.map(_.length).getOrElse(0)

  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    PqMath.adcCosineLut(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData],
      norms2, codesPerSubspace)

  // the loop is emitted INLINE (the DotProductF pattern) rather than as a
  // shared static helper: this runs once per candidate PAIR, and a shared
  // helper's ArrayData accessors are megamorphic call sites the JIT cannot
  // devirtualize, where per-generated-class call sites stay monomorphic
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n2 = ctx.addReferenceObj("pqNorms2", norms2, "double[][]")
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val cc = ctx.freshName("cc")
      val dot = ctx.freshName("dot")
      val x2 = ctx.freshName("x2")
      val q2 = ctx.freshName("q2")
      val denom = ctx.freshName("denom")
      code"""
        int $m = java.lang.Math.min($c.numElements(), $n2.length);
        double $dot = 0.0;
        double $x2 = 0.0;
        for (int $s = 0; $s < $m; $s++) {
          int $cc = $c.getInt($s);
          $dot += $l.getDouble($s * $codesPerSubspace + $cc);
          $x2 += $n2[$s][$cc];
        }
        double $q2 = $l.getDouble($l.numElements() - 1);
        double $denom = java.lang.Math.sqrt($q2) * java.lang.Math.sqrt($x2);
        ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
      """.toString
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqCosineLutF = copy(left = newLeft, right = newRight)
}

/** Top-level object ⇒ static forwarders callable from generated Java. */
object PqMath {

  /** Nearest-codeword index per subspace (L2, ties → lowest index).
    * Subspace m covers dims [m·dsub, (m+1)·dsub); a short input vector
    * zero-pads (codebooks are trained on full-length vectors, so this
    * only matters for malformed rows).
    */
  def encode(v: ArrayData, cb: Array[Array[Array[Float]]]): Array[Int] = {
    val n = v.numElements()
    val m = cb.length
    val out = new Array[Int](m)
    var s = 0
    var off = 0
    while (s < m) {
      val words = cb(s)
      val dsub = words(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < words.length) {
        val w = words(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val x = if (off + i < n) v.getFloat(off + i).toDouble else 0.0
          val diff = x - w(i).toDouble
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      off += dsub
      s += 1
    }
    out
  }

  /** Per-query ADC table for [[PqLutF]]: lut[s·K + c] = dot(query
    * subvector s, codeword c) with the same padded inner-loop order as
    * [[adcCosine]]'s reconstruction; last slot = ‖query‖² (same full-length
    * self-dot loop).
    */
  def adcLut(query: ArrayData, cb: Array[Array[Array[Float]]]): Array[Double] = {
    val m = cb.length
    val k = if (m == 0) 0 else cb(0).length
    val qn = query.numElements()
    val out = new Array[Double](m * k + 1)
    var q2 = 0.0
    var i = 0
    while (i < qn) { val x = query.getFloat(i).toDouble; q2 += x * x; i += 1 }
    out(m * k) = q2
    var s = 0
    var off = 0
    while (s < m) {
      val words = cb(s)
      val dsub = if (words.length == 0) 0 else words(0).length
      var c = 0
      while (c < words.length) {
        val w = words(c)
        var dot = 0.0
        i = 0
        while (i < dsub) {
          val q = if (off + i < qn) query.getFloat(off + i).toDouble else 0.0
          dot += q * w(i).toDouble
          i += 1
        }
        out(s * k + c) = dot
        c += 1
      }
      off += dsub
      s += 1
    }
    out
  }

  /** cosine(query, x̂) from the precomputed per-query table: M lookups. */
  def adcCosineLut(codes: ArrayData, lut: ArrayData, norms2: Array[Array[Double]],
      k: Int): Double = {
    val m = math.min(codes.numElements(), norms2.length)
    var dot = 0.0
    var x2 = 0.0
    var s = 0
    while (s < m) {
      val code = codes.getInt(s)
      dot += lut.getDouble(s * k + code)
      x2 += norms2(s)(code)
      s += 1
    }
    val q2 = lut.getDouble(lut.numElements() - 1)
    val denom = math.sqrt(q2) * math.sqrt(x2)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** cosine(query, x̂) where x̂ is the codebook reconstruction of `codes`. */
  def adcCosine(codes: ArrayData, query: ArrayData, cb: Array[Array[Array[Float]]],
      norms2: Array[Array[Double]]): Double = {
    val m = math.min(codes.numElements(), cb.length)
    val qn = query.numElements()
    var dot = 0.0
    var x2 = 0.0
    var q2 = 0.0
    var i = 0
    while (i < qn) { val x = query.getFloat(i).toDouble; q2 += x * x; i += 1 }
    var s = 0
    var off = 0
    while (s < m) {
      val code = codes.getInt(s)
      val w = cb(s)(code)
      val dsub = w.length
      i = 0
      while (i < dsub) {
        val q = if (off + i < qn) query.getFloat(off + i).toDouble else 0.0
        dot += q * w(i).toDouble
        i += 1
      }
      x2 += norms2(s)(code)
      off += dsub
      s += 1
    }
    val denom = math.sqrt(q2) * math.sqrt(x2)
    if (denom == 0.0) 0.0 else dot / denom
  }
}
