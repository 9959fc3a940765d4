package graft

import graft.functions.VectorOps
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.functions._

/** Round-18 optimization pins — every rewrite this round must be
  * value-identical to the shape it replaced:
  *   - simhashPairs postings path ≡ the quarter-band self-join,
  *   - seedPools ≡ one seedCentroids call per size (centroid identity),
  *   - cosinePre (hoisted norms) ≡ cosineF, including null/zero vectors,
  *   - ADC via per-query LUT ≡ per-row reconstruction, to well under the
  *     rank separation of real data, with identical top-k candidate sets
  *     on the bench corpus,
  *   - keeperAssignment's chunked driver probe ≡ the distributed fixpoint
  *     across the small-probe boundary.
  */
class R18OptSpec extends SparkSpec {
  import spark.implicits._

  test("simhashPairs: postings path equals the quarter-band join fallback") {
    val docs = Tables.load(spark, sfDir, "documents")
    // (min, max) pair identity: string ids order LEXICOGRAPHICALLY in the
    // fallback join's a < b, so the same pair can emit with swapped columns
    def norm(rows: Array[org.apache.spark.sql.Row], toLong: Any => Long) =
      rows.map { r =>
        val (a, b) = (toLong(r.get(0)), toLong(r.get(1)))
        (math.min(a, b), math.max(a, b), r.getInt(2))
      }.toSet
    val viaLong = norm(
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8).collect(),
      _.asInstanceOf[Long])
    // string ids exercise the legacy join-based path (postings need bigint)
    val viaString = norm(
      Dedup.simhashPairs(docs.withColumn("doc_id", col("doc_id").cast("string")),
        "doc_id", "text", maxHamming = 8).collect(),
      _.asInstanceOf[String].toLong)
    assert(viaLong.nonEmpty && viaLong === viaString)
  }

  test("simhashPairs verify path: postings equals join fallback end-to-end") {
    val docs = Tables.load(spark, sfDir, "documents")
    def norm(rows: Array[org.apache.spark.sql.Row], toLong: Any => Long) =
      rows.map { r =>
        val (a, b) = (toLong(r.get(0)), toLong(r.get(1)))
        (math.min(a, b), math.max(a, b), r.getInt(2),
          math.round(r.getDouble(3) * 1e9))
      }.toSet
    val viaLong = norm(
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 16,
        verify = true, shingleSize = 3, minJaccard = 0.1).collect(),
      _.asInstanceOf[Long])
    val viaString = norm(
      Dedup.simhashPairs(docs.withColumn("doc_id", col("doc_id").cast("string")),
        "doc_id", "text", maxHamming = 16,
        verify = true, shingleSize = 3, minJaccard = 0.1).collect(),
      _.asInstanceOf[String].toLong)
    assert(viaLong.nonEmpty && viaLong === viaString)
  }

  test("seedPools equals one seedCentroids call per size (centroid identity)") {
    val corpus = Tables.load(spark, sfDir, "embeddings")
    val pooled = Similarity.seedPools(corpus, Seq(7, 64, 256), "vec_id", "embedding")
    val separate = Seq(7, 64, 256).map(n =>
      Similarity.seedCentroids(corpus, n, "vec_id", "embedding"))
    pooled.zip(separate).zipWithIndex.foreach { case ((got, want), i) =>
      assert(got.length == want.length, s"size mismatch at ns($i)")
      got.zip(want).zipWithIndex.foreach { case ((g, w), j) =>
        assert(java.util.Arrays.equals(g, w), s"centroid $j differs at ns($i)")
      }
    }
  }

  test("cosinePre (hoisted norms) equals cosineF, incl. null and zero vectors") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f, 3.0f)), Some(Seq(3.0f, 2.0f, 1.0f))),
      (Some(Seq(0.0f, 0.0f, 0.0f)), Some(Seq(1.0f, 1.0f, 1.0f))), // zero denom
      (Option.empty[Seq[Float]], Some(Seq(1.0f, 1.0f, 1.0f))),    // null side
      (Some(Seq(-1.5f, 2.5f)), Some(Seq(2.5f, -1.5f)))
    ).toDF("a", "b")
    val rows = df.select(
        VectorOps.cosineF(col("a"), col("b")).as("direct"),
        VectorOps.cosinePre(col("a"), col("b"),
          VectorOps.normF(col("a")), VectorOps.normF(col("b"))).as("pre"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0))
        assert(r.getDouble(0) == r.getDouble(1), s"value mismatch: $r") // bit-equal
    }
  }

  test("ADC LUT equals direct reconstruction; identical top-k candidate sets") {
    val corpus = Tables.load(spark, sfDir, "embeddings")
    val cb = Similarity.trainPqCodebooks(corpus, nSubspaces = 0, nCodes = 16)
    val queries = corpus.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val both = corpus
      .select(col("vec_id"), Similarity.pqEncode(col("embedding"), cb).as("pq_codes"))
      .crossJoin(broadcast(queries.select(col("query_id"), col("query_vec"),
        Similarity.pqLut(col("query_vec"), cb).as("__lut"))))
      .select(col("query_id"), col("vec_id"),
        Similarity.pqCosine(col("pq_codes"), col("query_vec"), cb).as("direct"),
        Similarity.pqCosineLut(col("pq_codes"), col("__lut"), cb).as("lut"))
      .collect()
    assert(both.nonEmpty)
    // per-subspace partial sums regroup the double accumulation: agreement
    // far below any rank separation on real data (measured gaps ≥ 2e-5)
    val maxDiff = both.map(r => math.abs(r.getDouble(2) - r.getDouble(3))).max
    assert(maxDiff < 1e-12, s"ADC LUT drifted: $maxDiff")
    // the value the pipeline consumes: the top-r candidate SET per query
    def topK(simCol: String) = both.groupBy(_.getLong(0)).values.flatMap { rs =>
      rs.sortBy(r => (-r.getAs[Double](simCol), r.getLong(1))).take(64)
        .map(r => (r.getLong(0), r.getLong(1)))
    }.toSet
    assert(topK("direct") === topK("lut"))
  }

  test("TopKByF aggregate equals the row_number window (ties, -0.0, nulls)") {
    val rows = Seq[(Int, java.lang.Long, java.lang.Double)](
      (1, 10L, 0.9), (1, 11L, 0.9), (1, 12L, 0.9),      // three-way tie → id asc
      (1, 13L, 0.95), (1, 14L, -0.5), (1, 15L, null),   // null score ranks last
      (2, 20L, 0.0), (2, 21L, -0.0), (2, 22L, -0.0),    // -0.0 == 0.0 ties → id
      (2, 23L, 1e-300), (3, 30L, 0.7)
    )
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3)), 3),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("g",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.DoubleType))))
    for (k <- Seq(1, 2, 3, 6)) {
      val viaAgg = df.groupBy(col("g"))
        .agg(GraftShim.column(graft.functions.TopKByF(
          GraftShim.expression(col("s")), GraftShim.expression(col("id")), k)
          .toAggregateExpression()).as("tk"))
        .select(col("g"), posexplode(col("tk")).as(Seq("p", "e")))
        .select(col("g"), col("e.id").as("id"), (col("p") + 1).as("rank"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("s").desc, col("id"))
      val viaWindow = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("g"), col("id"), col("rank"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
      assert(viaAgg === viaWindow, s"k=$k")
    }
  }

  test("EvalOnceF is a value no-op (wrapped vs bare, incl. nulls)") {
    val df = Seq(
      (1L, Some(Seq(1.0f, 2.0f))), (2L, Some(Seq(0.0f, 0.0f))),
      (3L, Option.empty[Seq[Float]])
    ).toDF("id", "v")
    def once(c: org.apache.spark.sql.Column) =
      GraftShim.column(graft.functions.EvalOnceF(GraftShim.expression(c)))
    val rows = df.select(
        VectorOps.normF(col("v")).as("bare"),
        once(VectorOps.normF(col("v"))).as("wrapped"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1), s"value: $r")
    }
    // and through a broadcast-join pipeline (the site it exists for)
    val q = Seq((10L, Seq(1.0f, 0.0f))).toDF("qid", "qv")
    val viaWrapped = Similarity.bruteForceTopK(
        df.filter(col("v").isNotNull).select(col("id").as("vec_id"), col("v").as("embedding")),
        q.select(col("qid").as("query_id"), col("qv").as("query_vec")), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(viaWrapped.nonEmpty)
  }

  test("keeperAssignment chunked probe: identical across the small-probe boundary") {
    // 262 200 edges: overflows the 256Ki first collect (exercises the r18
    // persist + bounded-count branch) but fits the default driver budget
    val n = 262200L
    val docsBig = spark.range(0L, n + 1).select(col("id").as("doc_id"))
    val pairsBig = spark.range(0L, n)
      .select(col("id").as("doc_a"), (col("id") + 1L).as("doc_b"))
    val fast = Dedup.keeperAssignment(docsBig, "doc_id", pairsBig)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast.size == n.toInt + 1 && fast.values.forall(_ == 0L),
      "one chain must collapse to doc 0")
    // and a graph that overflows a tiny budget still matches the
    // distributed fixpoint (the None branch after the ambiguous probe)
    val docs8 = spark.range(0L, 9L).select(col("id").as("doc_id"))
    val pairs8 = spark.range(0L, 8L)
      .select(col("id").as("doc_a"), (col("id") + 1L).as("doc_b"))
    val viaDriver = Dedup.keeperAssignment(docs8, "doc_id", pairs8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDist = Dedup.keeperAssignment(docs8, "doc_id", pairs8, maxDriverEdges = 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver === viaDist)
  }
}
