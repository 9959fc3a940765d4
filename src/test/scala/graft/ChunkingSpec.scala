package graft

import graft.operators.Chunking
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {

  private def docsDf = {
    import spark.implicits._
    Seq(
      (0L, "a b c d e f g h i j"), // 10 tokens
      (1L, "x y z"),               // shorter than a chunk
      (2L, ""),                    // empty → no chunks
      (3L, "lone")                 // single token
    ).toDF("doc_id", "text")
  }

  test("chunkTokens: windows, overlap, and tails") {
    val out = Chunking.chunkTokens(docsDf, "doc_id", "text", chunkSize = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val byDoc = out.groupBy(_._1)
    // stride 3: chunks at 0,3,6,9 → ceil((10-1)/3)=3 chunks cover tokens 0..9
    assert(byDoc(0L).sortBy(_._2).map(_._4).toSeq ==
      Seq("a b c d", "d e f g", "g h i j"), s"got ${byDoc(0L).toSeq}")
    // full coverage: every token appears in some chunk
    assert(byDoc(0L).flatMap(_._4.split(" ")).toSet == "abcdefghij".map(_.toString).toSet)
    assert(byDoc(1L).map(_._4).toSeq == Seq("x y z"))
    assert(byDoc(1L).head._3 == 3) // short chunk reports its true token count
    assert(!byDoc.contains(2L), "empty doc must yield no chunks")
    assert(byDoc(3L).map(_._4).toSeq == Seq("lone"))
  }

  test("packSequences: budget boundaries and shard-local cumsum") {
    import spark.implicits._
    // 6 docs of 40 tokens each in one shard (ids ≡ 1 mod 32): budget 100
    // → packs of 2,2,2 docs at offsets 0,40 / 80→pack1... greedy contiguous:
    // cum_before: 0,40,80,120,160,200 → pack floor(/100): 0,0,0,1,1,2
    val docs = (0 until 6).map(i => (1L + 32L * i, ("t " * 40).trim)).toDF("doc_id", "text")
    val out = Chunking.packSequences(docs, "doc_id", "text", budget = 100, shards = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out.forall(_._2 == 40L))
    assert(out.forall(_._3 == 1), s"all ids ≡ 1 mod 32: $out")
    val packsLocal = out.map(t => t._4 - 1L * 4294967296L)
    assert(packsLocal.toSeq == Seq(0L, 0L, 0L, 1L, 1L, 2L), s"got ${packsLocal.toSeq}")
    assert(out.map(_._5).toSeq == Seq(0L, 40L, 80L, 20L, 60L, 0L), s"got ${out.map(_._5).toSeq}")
  }

  test("packSequences: different shards pack independently") {
    import spark.implicits._
    val docs = Seq((0L, "a b c"), (1L, "d e f"), (32L, "g h")).toDF("doc_id", "text")
    val out = Chunking.packSequences(docs, "doc_id", "text", budget = 4, shards = 32)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(4))).sortBy(_._1)
    // shard 0: doc 0 (3 tokens, pos 0), doc 32 (pos 3); shard 1: doc 1 (pos 0)
    assert(out.toSeq == Seq((0L, 0, 0L), (1L, 1, 0L), (32L, 0, 3L)), s"got ${out.toSeq}")
  }

  test("plan quality: chunking is shuffle-free; packing shuffles once on the shard") {
    val chunkPlan = Chunking.chunkTokens(docsDf, "doc_id", "text", 64, 16)
      .queryExecution.executedPlan.toString
    assert(!chunkPlan.contains("Exchange"),
      s"row-local chunking must not shuffle:\n$chunkPlan")
    val packPlan = Chunking.packSequences(docsDf, "doc_id", "text", 512, 32)
      .queryExecution.executedPlan.toString
    // exactly one exchange: hashpartitioning on the shard for the
    // per-shard ordered cumsum — never a single global ordering
    assert("Exchange".r.findAllIn(packPlan).size == 1, s"got:\n$packPlan")
    assert(packPlan.contains("hashpartitioning(shard"), s"got:\n$packPlan")
  }

  test("chunkChars: character windows") {
    import spark.implicits._
    val df = Seq((7L, "abcdefgh")).toDF("doc_id", "text")
    val out = Chunking.chunkChars(df, "doc_id", "text", 3)
      .collect().map(r => (r.getInt(1), r.getString(2))).sortBy(_._1)
    assert(out.toSeq == Seq((0, "abc"), (1, "def"), (2, "gh")))
  }

  test("balancedShards: every shard lands within one document of the token target") {
    val docs = Tables.load(spark, sfDir, "documents")
    val target = 2000L
    val out = Chunking.balancedShards(docs, "doc_id", "text", target)
    val shardSums = out.groupBy("shard")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("t"),
        org.apache.spark.sql.functions.max("n_tokens").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(shardSums.length > 1, "corpus must span multiple shards")
    val maxDoc = shardSums.map(_._3).max
    // contiguous cumsum assignment: a shard can only exceed the target by
    // the one document that crossed the boundary; all but the last shard
    // must reach it
    shardSums.foreach { case (sh, t, _) =>
      assert(t <= target + maxDoc, s"shard $sh overfull: $t")
    }
    val lastShard = shardSums.map(_._1).max
    shardSums.filter(_._1 != lastShard).foreach { case (sh, t, _) =>
      assert(t >= target - maxDoc, s"shard $sh underfull: $t")
    }
    // every doc appears exactly once
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
    // null text counts 0 tokens and must not poison downstream cumsums
    import spark.implicits._
    val withNull = Seq((1L, "three token doc"), (2L, null), (3L, "two tokens"))
      .toDF("doc_id", "text")
    val nulled = Chunking.balancedShards(withNull, "doc_id", "text", 100L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(nulled(2L)._1 == 0L)
    assert(nulled.values.forall(_._2 == 0L), s"all fit one shard: $nulled")
  }
}
