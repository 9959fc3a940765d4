package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("bruteForceTopK matches a driver-side exact computation") {
    val corpus = Tables.load(spark, sfDir, "embeddings")
    val queries = corpus.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

    val got = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap

    // naive reference on the driver
    val vecs = corpus.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    for (q <- vecs.keys.filter(_ % 100 == 0)) {
      val expected = vecs.toSeq.map { case (id, v) => (id, cos(vecs(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(3).map(_._1)
      val mine = (1 to 3).map(rk => got((q, rk)))
      assert(mine == expected, s"query $q: got $mine expected $expected")
    }
  }

  test("lshTopK returns correctly-ranked results drawn from the query bucket") {
    val corpus = Tables.load(spark, sfDir, "embeddings")
    val queries = corpus.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val rows = Similarity.lshTopK(corpus, queries, k = 5, nPlanes = 4).collect()
    assert(rows.nonEmpty)
    // every query's own vector is in its own bucket → rank 1 is itself (sim 1.0 max, min id tiebreak)
    val rank1 = rows.filter(_.getInt(3) == 1).map(r => r.getLong(0) -> r.getLong(1)).toMap
    rank1.foreach { case (q, top) => assert(top == q, s"query $q top-1 is $top") }
  }

  test("pqTopK: compressed-scan + exact-rerank meets the recall contract and is deterministic") {
    val corpus = Tables.load(spark, sfDir, "embeddings")
    val q2 = corpus.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = Similarity.bruteForceTopK(corpus, q2, k = 5).select("query_id", "vec_id")
    val total = exact.count().toDouble
    val got = Similarity.pqTopK(corpus, q2, k = 5)
    val recall = got.select("query_id", "vec_id")
      .join(exact, Seq("query_id", "vec_id")).count() / total
    assert(recall >= 0.7, s"pq recall@5 = $recall") // floor q_ann_recall enforces
    // rank-1 self-match: a query drawn from the corpus must find itself
    got.filter(col("rank") === 1).collect()
      .foreach(r => assert(r.getLong(1) == r.getLong(0),
        s"query ${r.getLong(0)} top-1 is ${r.getLong(1)}"))
    // training + encoding are deterministic (no stored model needed)
    val again = Similarity.pqTopK(corpus, q2, k = 5)
    assert(got.collect().toSeq == again.collect().toSeq)
  }

  test("ivfPqTopK: composed cell-prune + compressed scan matches the ivf recall bound") {
    val corpus = Tables.load(spark, sfDir, "embeddings")
    val q = corpus.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = Similarity.bruteForceTopK(corpus, q, k = 5).select("query_id", "vec_id")
    val total = exact.count().toDouble
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select("query_id", "vec_id").join(exact, Seq("query_id", "vec_id"))
        .count() / total
    val ivfpq = Similarity.ivfPqTopK(corpus, q, k = 5)
    // pq-inside-probed-cells + exact rerank must not lose what cell
    // pruning alone would keep (measured EQUAL across sf0.001-0.1)
    assert(recall(ivfpq) >= 0.4, s"ivfpq recall = ${recall(ivfpq)}")
    // every survivor is exactly re-ranked: rank-1 self-match holds
    ivfpq.filter(col("rank") === 1).collect()
      .foreach(r => assert(r.getLong(1) == r.getLong(0)))
  }

  test("persisted IVF+PQ index: build→save→query equals the inline op; probes prune partitions") {
    val corpus = Tables.load(spark, sfDir, "embeddings")
    val q = corpus.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString
    try {
      Similarity.buildIvfPqIndex(corpus, dir)
      // the persisted index answers EXACTLY what the inline op computes
      // (deterministic seeding/training → identical centroids and codes)
      val fromIndex = Similarity.queryIvfPqIndex(spark, dir, q, k = 5)
        .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
      val inline = Similarity.ivfPqTopK(corpus, q, k = 5)
        .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
      assert(fromIndex == inline, "index path diverged from inline op")
      // cell pruning reaches the STORAGE layer: the probed-cell IN filter
      // appears as a parquet PartitionFilter, not a post-scan filter
      val plan = Similarity.queryIvfPqIndex(spark, dir, q.limit(1), k = 5)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [cell"), "probe filter must partition-prune")
      // r7: the raw vec rides the ADC projection — the probed partitions
      // are scanned exactly once per query batch
      val cellScans = plan.split("\n").count(l =>
        l.contains("FileScan parquet") && l.contains("/cells"))
      assert(cellScans == 1, s"expected one cells scan, got $cellScans:\n$plan")
      // the layout is genuinely partitioned by cell on disk
      val cellDirs = new java.io.File(s"$dir/cells").listFiles()
        .filter(_.getName.startsWith("cell=")).map(_.getName)
      assert(cellDirs.nonEmpty)
      // a fresh "session" (nothing cached) reads the same index back
      spark.catalog.clearCache()
      val again = Similarity.queryIvfPqIndex(spark, dir, q, k = 5)
        .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
      assert(again == inline)
      // r8: BOTH re-rank plans — vec-through-exchange and slim-exchange
      // (the wide-dim path; 16-byte rank shuffle + second pruned read) —
      // answer identically; the dimension dispatch is a pure plan choice
      for (through <- Seq(true, false)) {
        val forced = Similarity.queryIvfPqIndex(spark, dir, q, k = 5,
            vecThroughShuffle = Some(through))
          .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
        assert(forced == inline, s"vecThroughShuffle=$through diverged")
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("index append: new vectors join the persisted index without retraining") {
    import spark.implicits._
    val corpus = Tables.load(spark, sfDir, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("annidx2").toString
    try {
      Similarity.buildIvfPqIndex(corpus, dir)
      val n0 = spark.read.parquet(s"$dir/cells").count()
      // new vectors: exact copies of two corpus vectors under fresh ids
      // (guaranteed findable: they land in their twins' cells)
      val twins = corpus.filter(col("vec_id").isin(0L, 7L))
        .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
      Similarity.appendToIvfPqIndex(twins, dir)
      assert(spark.read.parquet(s"$dir/cells").count() == n0 + 2)
      // querying WITH the new vectors' own embeddings: each appended
      // vector is retrieved (itself or its exact twin at sim 1.0)
      val q = twins.select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val top = Similarity.queryIvfPqIndex(spark, dir, q, k = 2)
        .filter(col("rank") === 1)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(top.size == 2)
      top.foreach { case (qid, (hit, sim)) =>
        assert(sim > 0.9999, s"query $qid rank-1 sim $sim")
        assert(hit == qid || hit == qid - 900000L, s"query $qid hit $hit")
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("pqEncode emits one in-range code per subspace") {
    val corpus = Tables.load(spark, sfDir, "embeddings")
    val cb = Similarity.trainPqCodebooks(corpus, nSubspaces = 16, nCodes = 16)
    assert(cb.length == 16 && cb.forall(_.length == 16) && cb.forall(_.forall(_.length == 4)))
    val codes = corpus.select(Similarity.pqEncode(col("embedding"), cb).as("c"))
      .collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 16 && c.forall(x => x >= 0 && x < 16)))
    // deterministic training: byte-identical codebooks across calls
    val cb2 = Similarity.trainPqCodebooks(corpus, nSubspaces = 16, nCodes = 16)
    assert(cb.flatten.flatten.toSeq == cb2.flatten.flatten.toSeq)
  }

  test("lshTopK multi-probe recovers neighbors lost to single-bit signature misses") {
    val corpus = Tables.load(spark, sfDir, "embeddings")
    val queries = corpus.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("query_id", "vec_id")
    val total = exact.count().toDouble
    def recall(mp: Boolean): Double =
      Similarity.lshTopK(corpus, queries, k = 5, nPlanes = 6, nTables = 4,
          multiProbe = mp)
        .select("query_id", "vec_id").join(exact, Seq("query_id", "vec_id"))
        .count() / total
    val (plain, probed) = (recall(false), recall(true))
    // hamming-1 probes only ADD candidate buckets → recall is monotone,
    // and measurably so (0.30-0.36 → 0.72-0.78 across sf0.001-0.1)
    assert(probed >= plain, s"multi-probe lost recall: $probed < $plain")
    assert(probed >= 0.6, s"multi-probe recall@5 = $probed")
  }

  test("ivfTopK: rank-1 self-retrieval and high recall vs exact top-k") {
    val corpus = Tables.load(spark, sfDir, "embeddings")
    val queries = corpus.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val ivf = Similarity.ivfTopK(corpus, queries, k = 5, nCentroids = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    // a query always lands in its own cell → must retrieve itself at rank 1
    ivf.keys.map(_._1).toSeq.distinct.foreach(q => assert(ivf((q, 1)) == q))
    // recall@5 vs exact: probing 3/8 cells must stay well above random
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val hits = exact.keys.toSeq.map { q =>
      val got = (1 to 5).flatMap(rk => ivf.get((q, rk))).toSet
      (got intersect exact(q)).size.toDouble / 5.0
    }
    val recall = hits.sum / hits.size
    assert(recall >= 0.4, s"recall@5 = $recall")
  }

  test("ivf cell assignment is row-local: no Exchange in the corpus-side plan") {
    val corpus = Tables.load(spark, sfDir, "embeddings")
    val mat = corpus.limit(4).select("embedding")
      .collect().map(_.getSeq[Float](0).toArray)
    val cells = corpus.withColumn("cell",
      Similarity.nearestCentroid(col("embedding"), mat))
    val plan = cells.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"cell assignment must not shuffle the corpus:\n$plan")
    // and it stays inside whole-stage codegen (the `*(n)` prefix)
    assert(plan.contains("*(1) Project"), plan)
    // the compiled argmax agrees with the interpreted eval path
    val viaExpr = cells.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaExpr.nonEmpty && viaExpr.values.toSet.subsetOf((0 until 4).toSet))
  }

  test("ivfTopK with k-means sweeps keeps self-retrieval and recall") {
    val corpus = Tables.load(spark, sfDir, "embeddings")
    val queries = corpus.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val ivf = Similarity.ivfTopK(corpus, queries, k = 5,
        nCentroids = 8, nProbe = 3, kmeansSweeps = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    ivf.keys.map(_._1).toSeq.distinct.foreach(q => assert(ivf((q, 1)) == q))
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val hits = exact.keys.toSeq.map { q =>
      val got = (1 to 5).flatMap(rk => ivf.get((q, rk))).toSet
      (got intersect exact(q)).size.toDouble / 5.0
    }
    val recall = hits.sum / hits.size
    assert(recall >= 0.4, s"recall@5 with sweeps = $recall")
  }

  test("ivf seeding is unbiased on a SORTED corpus: cells stay balanced") {
    import spark.implicits._
    // 4 well-separated clusters, corpus ORDERED by cluster and
    // range-partitioned so each partition holds one cluster — the layout
    // real crawls have (sorted by source/date). A prefix-seeded IVF would
    // draw every centroid from cluster 0 and collapse 75% of the corpus
    // into one cell; per-partition seeding must keep cells balanced.
    val dim = 8
    def vec(cluster: Int, i: Int): Array[Float] =
      Array.tabulate(dim)(d =>
        (if (d == cluster * 2) 10.0f else 0.0f) +
          // injective per-row component so no two vectors are identical
          // (self-retrieval must be unambiguous at rank 1)
          (if (d == (cluster * 2 + 1) % dim) 0.5f + i * 0.001f
           else ((i * 31 + d * 7) % 97) * 0.005f))
    val rows = for (c <- 0 until 4; i <- 0 until 250)
      yield (c * 250L + i, vec(c, i))
    val corpus = rows.toDF("vec_id", "embedding")
      .repartitionByRange(4, col("vec_id"))
      .sortWithinPartitions("vec_id")

    val queries = corpus.filter(col("vec_id") % 125 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val ivf = Similarity.ivfTopK(corpus, queries, k = 5, nCentroids = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    ivf.keys.map(_._1).toSeq.distinct.foreach(q => assert(ivf((q, 1)) == q))

    // cell balance: with seeds drawn from every partition no single cell
    // may swallow the majority of the corpus
    val mat = {
      // reproduce the seeding exactly as ivfTopK does
      val pool = corpus.select(col("vec_id").cast("string").as("sid"),
          col("embedding").as("v"))
        .as[(String, Seq[Float])].mapPartitions(_.take(8)).toDF("sid", "v")
      pool.orderBy(xxhash64(col("sid")), col("sid")).limit(8)
        .select("v").collect().map(_.getSeq[Float](0).toArray)
    }
    val cellSizes = corpus
      .withColumn("cell", Similarity.nearestCentroid(col("embedding"), mat))
      .groupBy("cell").count().collect().map(_.getLong(1))
    assert(cellSizes.length >= 4, s"want seeds spanning clusters, got ${cellSizes.length} cells")
    assert(cellSizes.max <= 600,
      s"one cell swallowed ${cellSizes.max}/1000 rows — seeding is biased")

    // recall vs exact stays high even though the corpus is sorted
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val hits = exact.keys.toSeq.map { q =>
      val got = (1 to 5).flatMap(rk => ivf.get((q, rk))).toSet
      (got intersect exact(q)).size.toDouble / 5.0
    }
    val recall = hits.sum / hits.size
    assert(recall >= 0.6, s"recall@5 on sorted corpus = $recall")
  }

  test("cosineDupPairs finds injected duplicate embeddings") {
    import spark.implicits._
    val v1 = Array.tabulate(8)(i => (i + 1).toFloat)
    val v2 = v1.map(_ * 2.0f)             // same direction → cosine 1
    val v3 = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val d = Seq((1L, v1), (2L, v2), (3L, v3)).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineDupPairs(d, threshold = 0.99, nPlanes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("cosineDupPairs multi-table recall beats single-table on perturbed near-dups") {
    import spark.implicits._
    // 200 deterministic pseudo-random base vectors + a slightly perturbed
    // copy of each (cosine ≈ 0.997) — single-table sign-LSH misses the
    // pairs where one of 8 planes separates the copy; a second table must
    // recover most of those misses (1-(1-p)² compounding).
    def vec(seed: Long): Array[Float] =
      Array.tabulate(16)(i => math.sin(seed * 37.0 + i * 13.0).toFloat)
    val base = (1L to 200L).map(s => (s, vec(s)))
    val dups = base.map { case (s, v) =>
      (s + 10000L, v.zipWithIndex.map { case (x, i) => x * (1.0f + 0.1f * math.sin(s + i).toFloat) })
    }
    val d = (base ++ dups).toDF("vec_id", "embedding")
    def recall(tables: Int): Double = {
      val got = Similarity.cosineDupPairs(d, threshold = 0.95, nPlanes = 8, nTables = tables)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      base.count { case (s, _) => got.contains((s, s + 10000L)) }.toDouble / base.size
    }
    val r1 = recall(1)
    val r2 = recall(2)
    assert(r2 >= r1, s"multi-table recall regressed: T1=$r1 T2=$r2")
    assert(r2 >= 0.9, s"T=2 recall too low: $r2")
  }

  test("semanticDedup collapses within-cluster duplicate groups to the min id") {
    import spark.implicits._
    // cluster around e1: ids 1,2,3 nearly identical; cluster around e2:
    // ids 10,11 identical; 20 and 21 are singletons near e3/e4
    def unit(axis: Int, jitter: Float = 0f): Array[Float] =
      Array.tabulate(8)(i => (if (i == axis) 1f else 0f) + (if (i == (axis + 1) % 8) jitter else 0f))
    val d = Seq(
      (1L, unit(0)), (2L, unit(0, 0.01f)), (3L, unit(0, 0.02f)),
      (10L, unit(1)), (11L, unit(1)),
      (20L, unit(2)), (21L, unit(3))).toDF("vec_id", "embedding")
    val keep = Similarity.semanticDedup(d, threshold = 0.99, nCentroids = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keep == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 21L), s"got $keep")
  }

  test("semanticDedup auto cell count: default scales with the corpus, floors at 64 (r8)") {
    // at small N the auto default (max(64, N/512)) floors at 64 — the
    // result must be identical to an explicit nCentroids = 64. (The
    // scale half is probe territory: SCALE.md r8 measured fixed-64 cells
    // going 111× at 10× docs — Σcell² is only a bound when cells ∝ N.)
    val emb = Tables.load(spark, sfDir, "embeddings")
    val auto = Similarity.semanticDedup(emb, 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val explicit = Similarity.semanticDedup(emb, 0.95, nCentroids = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(auto.nonEmpty && auto == explicit)
  }

  test("semanticDedup collapses transitive chains through the CC fixpoint") {
    import spark.implicits._
    // a≈b (cos ≈ 0.9996) and b≈c pass the 0.999 threshold; a–c (≈ 0.9985)
    // does NOT — c must still fold into a through b
    def rot(theta: Double): Array[Float] = {
      val v = new Array[Float](8)
      v(0) = math.cos(theta).toFloat; v(1) = math.sin(theta).toFloat; v
    }
    val d = Seq((1L, rot(0)), (2L, rot(0.028)), (3L, rot(0.056)),
      (50L, { val v = new Array[Float](8); v(7) = 1f; v })).toDF("vec_id", "embedding")
    val cosAdj = math.cos(0.028); val cosFar = math.cos(0.056)
    assert(cosAdj > 0.999 && cosFar < 0.999) // the chain premise
    // one cell: the chain must fold through CC, not through cell geometry
    val keep = Similarity.semanticDedup(d, threshold = 0.999, nCentroids = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keep(2L) == 1L && keep(3L) == 1L, s"got $keep")
    assert(keep(1L) == 1L && keep(50L) == 50L)
  }

  test("semanticDedupStream: batches dedup against the keeper ledger; restart converges") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("sds-src").toString
    val out = Files.createTempDirectory("sds-out").toString + "/out"
    val ledger = Files.createTempDirectory("sds-led").toString + "/ledger"
    val cp = Files.createTempDirectory("sds-cp").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    def streamDf = spark.readStream.schema(schema).json(src)
    def keepMap(batch: Long): Map[Long, Long] =
      spark.read.parquet(s"$out/batch=$batch")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // batch 0: 1=[1,0], 2=[0,1], 3≈1 (cos ≈ 0.99995) — within-batch collapse
    Files.write(java.nio.file.Paths.get(s"$src/f0.json"),
      ("""{"vec_id":1,"embedding":[1.0,0.0]}""" + "\n" +
        """{"vec_id":2,"embedding":[0.0,1.0]}""" + "\n" +
        """{"vec_id":3,"embedding":[0.99,0.01]}""" + "\n").getBytes)
    val q = Similarity.semanticDedupStream(streamDf, threshold = 0.95,
      nCentroids = 1, ledger, out, cp)
    q.processAllAvailable()
    assert(keepMap(0) == Map(1L -> 1L, 2L -> 2L, 3L -> 1L), s"got ${keepMap(0)}")

    // batch 1: 11 ≈ keeper 1 (cross-batch collapse onto the LEDGER, not the
    // batch); 12/13 a fresh within-batch near-dup pair far from all keepers
    Files.write(java.nio.file.Paths.get(s"$src/f1.json"),
      ("""{"vec_id":11,"embedding":[1.0,0.001]}""" + "\n" +
        """{"vec_id":12,"embedding":[0.5,0.866]}""" + "\n" +
        """{"vec_id":13,"embedding":[0.51,0.86]}""" + "\n").getBytes)
    q.processAllAvailable()
    q.stop()
    assert(keepMap(1) == Map(11L -> 1L, 12L -> 12L, 13L -> 12L), s"got ${keepMap(1)}")

    // restart from the same checkpoint: the ledger (and the persisted
    // centroids) must cover BOTH prior batches — a copy of keeper 2
    // collapses, a genuinely novel direction survives
    Files.write(java.nio.file.Paths.get(s"$src/f2.json"),
      ("""{"vec_id":21,"embedding":[0.001,1.0]}""" + "\n" +
        """{"vec_id":22,"embedding":[-1.0,0.2]}""" + "\n").getBytes)
    val q2 = Similarity.semanticDedupStream(streamDf, threshold = 0.95,
      nCentroids = 1, ledger, out, cp)
    q2.processAllAvailable()
    q2.stop()
    assert(keepMap(2) == Map(21L -> 2L, 22L -> 22L), s"got ${keepMap(2)}")
    // the ledger holds exactly the keepers, with their cells and vectors
    val led = spark.read.parquet(s"$ledger/batch=0", s"$ledger/batch=1", s"$ledger/batch=2")
    assert(led.select("vec_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 12L, 22L))
  }

  test("semanticDecontaminate: flags exactly the leaked vectors; train side never shuffles") {
    import spark.implicits._
    val eval = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f)),
      (200L, Seq(0.0f, 1.0f, 0.0f))).toDF("eval_id", "embedding")
    val train = Seq(
      (1L, Seq(0.99f, 0.05f, 0.0f)),  // near eval 100 → flagged
      (2L, Seq(0.0f, 0.0f, 1.0f)),    // orthogonal → clean
      (3L, Seq(0.01f, 0.999f, 0.0f)), // near eval 200 → flagged
      (4L, Seq(0.7f, 0.7f, 0.14f))    // cos ≈ 0.70/0.70 → below τ
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(train, eval, tau = 0.95)
    val rows = out.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows == Map(1L -> ((1L, 100L)), 3L -> ((1L, 200L))), s"got $rows")
    // 100 TB shape: the eval side broadcasts; the training scan reaches the
    // join without an Exchange below it (only flagged hits shuffle, in the
    // aggregate above the filter)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"eval side must broadcast:\n$plan")
    // a vector matching BOTH evals counts both hits, top = higher cosine
    val both = Seq((9L, Seq(0.72f, 0.7f, 0.0f))).toDF("vec_id", "embedding")
    val r9 = Similarity.semanticDecontaminate(both, eval, tau = 0.5)
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(r9 == ((2L, 100L)), s"got $r9")
  }

  test("semanticDecontaminateIndexed: indexed flags ⊆ exact flags, recall holds") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val eval = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("eval_id"), col("embedding"))
    val leaked = e.filter(col("vec_id") % 20 === 0).select(
      (col("vec_id") + 500000L).as("vec_id"),
      transform(col("embedding"),
        (x, i) => x * (lit(1.0f) + lit(0.1f) * sin(col("vec_id") + i).cast("float")))
        .as("embedding"))
    val train = e.filter(col("vec_id") % 20 =!= 0).select("vec_id", "embedding")
      .unionAll(leaked)
    val exactFlags = Similarity.semanticDecontaminate(train, eval, tau = 0.95)
      .collect().map(_.getLong(0)).toSet
    val dir = java.nio.file.Files.createTempDirectory("decon-idx").toString
    try {
      Similarity.buildIvfPqIndex(train, dir)
      val viaIndex = Similarity.semanticDecontaminateIndexed(
          spark, dir, eval, tau = 0.95)
        .collect().map(_.getLong(0)).toSet
      // exact rerank cosines ⇒ no false flags ever
      assert(viaIndex.subsetOf(exactFlags), s"extras: ${viaIndex.diff(exactFlags)}")
      // probe recall: every leaked twin sits ~0.997 from its eval original
      assert(exactFlags.nonEmpty)
      assert(viaIndex.size >= (exactFlags.size * 8) / 10,
        s"indexed recall ${viaIndex.size}/${exactFlags.size}")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
