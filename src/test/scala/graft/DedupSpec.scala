package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
  private val nearDup = base.replace("tonight", "today") // one-token edit
  private val other = "completely different content about spark engines aggregating columnar batches with watermarks"

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, base), (2L, base),        // exact duplicates
      (3L, nearDup),                 // near-duplicate of 1/2
      (4L, other)                    // unrelated
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts, keeps min id") {
    val r = Dedup.exact(docs, "doc_id", "text").orderBy("keep_id").collect()
    assert(r.length == 3)
    val dupRow = r.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dupRow.getAs[Long]("keep_id") == 1L)
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleSize = 2, numHashes = 64, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L)), s"exact dup pair missing: $keys")
    assert(pairs.find(p => (p._1, p._2) == ((1L, 2L))).get._3 == 1.0)
    assert(keys.contains((1L, 3L)) || keys.contains((2L, 3L)), s"near dup pair missing: $keys")
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L), s"unrelated doc paired: $keys")
  }

  test("keeperAssignment maps duplicates to the smallest paired id") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleSize = 2, numHashes = 64, bands = 16, threshold = 0.5)
    val keep = Dedup.keeperAssignment(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keep(1L) == 1L && keep(2L) == 1L && keep(4L) == 4L)
    assert(keep(3L) < 3L) // folded into the dup cluster
  }

  test("keeperAssignment reaches fixpoint on transitive chains (a-b, b-c ⇒ c→a)") {
    import spark.implicits._
    val ids = (1L to 8L).map(i => Tuple1(i)).toDF("doc_id")
    // chain 1-2-3, isolated 4, longer chain 5-6-7-8 (NO direct 5-7/5-8 edge)
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (7L, 8L))
      .toDF("doc_a", "doc_b")
    val keep = Dedup.keeperAssignment(ids, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keep == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L), s"got $keep")
  }

  test("ngram jaccard computes exact overlap and respects threshold") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleSize = 2, threshold = 0.3, maxDocFreq = 100)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs(((1L, 2L))) == 1.0)                       // identical
    assert(pairs.contains((1L, 3L)))                       // near dup above threshold
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L))
    // hand-check 1↔3: 16 distinct bigrams each; "tonight" is the final token
    // so exactly one bigram differs → 15 shared, union = 16+16-15 = 17
    assert(math.abs(pairs(((1L, 3L))) - 15.0 / 17.0) < 1e-9)
  }

  test("tfidf cosine: hand-computed weights; capped template terms create no pairs") {
    import spark.implicits._
    // N=4, ratio 0.75 ⇒ cap 3: "common" (df 4) is dropped as template
    // vocabulary; x,y (df 2) get idf ln 2; z,w,q (df 1) get idf ln 4.
    val d = Seq(
      (1L, "x x y common"),
      (2L, "x y common"),
      (3L, "z common"),
      (4L, "w common q")).toDF("doc_id", "text")
    val pairs = Dedup.tfidfCosinePairs(d, "doc_id", "text",
        threshold = 0.3, maxDocFreqRatio = 0.75)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // only 1↔2 share surviving vocabulary; with a = round(ln2·1e6):
    // w1 = (2a, a), w2 = (a, a) ⇒ cos = 3a²/(a√5 · a√2) = 3/√10
    assert(pairs.keySet == Set((1L, 2L)), s"got ${pairs.keySet}")
    assert(math.abs(pairs((1L, 2L)) - 3.0 / math.sqrt(10.0)) < 1e-6)
  }

  test("tfidf cosine: identical docs score 1.0; disjoint rare vocab scores nothing") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta")).toDF("doc_id", "text")
    val pairs = Dedup.tfidfCosinePairs(d, "doc_id", "text",
        threshold = 0.3, maxDocFreqRatio = 0.99)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.keySet == Set((1L, 2L)))
    assert(math.abs(pairs((1L, 2L)) - 1.0) < 1e-9)
  }

  test("pair operators release every cached intermediate (persist lifecycle)") {
    import spark.implicits._
    spark.catalog.clearCache()
    Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleSize = 2, numHashes = 64, bands = 16, threshold = 0.5).count()
    Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleSize = 2, threshold = 0.3, maxDocFreq = 100).count()
    Dedup.tfidfCosinePairs(docs, "doc_id", "text",
      threshold = 0.3, maxDocFreqRatio = 0.75).count()
    val evalDf = Seq((1000L, "the quick brown fox jumps")).toDF("doc_id", "text")
    graft.operators.Sampling.contaminationPairs(docs, evalDf, "doc_id", "text",
      shingleSize = 2, threshold = 0.3).count()
    // a leak here pins MEMORY_AND_DISK blocks for the life of the session
    // (unbounded in foreachBatch loops) — the round-3 bench confound
    assert(org.apache.spark.sql.GraftShim.sqlCacheIsEmpty(spark),
      "pair operators must unpersist their intermediates after materializing")
  }

  test("bloomIncremental keeps exactly the shard rows whose content is absent from ref") {
    import spark.implicits._
    val ref = Seq((2L, base), (4L, other)).toDF("doc_id", "text")
    val shard = Seq(
      (11L, base),      // exact dup of ref:2 → drop
      (13L, nearDup),   // near-dup only → keep (exact semantics)
      (15L, other),     // exact dup of ref:4 → drop
      (17L, "entirely novel shard content never crawled before")
    ).toDF("doc_id", "text")
    val out = Dedup.bloomIncremental(ref, shard, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(13L, 17L), s"got $out")
  }

  test("bloomIncremental with an empty reference keeps the whole shard") {
    import spark.implicits._
    val ref = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val shard = Seq((1L, base), (2L, other)).toDF("doc_id", "text")
    assert(Dedup.bloomIncremental(ref, shard, "doc_id", "text").count() == 2L)
  }

  test("bloomIncremental drops NULL-text rows on both sides (NOT IN alignment)") {
    import spark.implicits._
    val ref = Seq((1L, Some(base)), (2L, None)).toDF("doc_id", "text")
    val shard = Seq(
      (11L, Some(base)),   // dup of ref:1 → drop
      (12L, None),         // null content → out of scope, dropped
      (13L, Some(other))   // novel → keep
    ).toDF("doc_id", "text")
    val out = Dedup.bloomIncremental(ref, shard, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(13L), s"got $out")
  }

  test("bloomIncremental verify pass scrubs bloom false positives (tiny, saturated bloom)") {
    import spark.implicits._
    val ref = (1L to 50L).map(i => (i, s"ref document number $i unique payload"))
      .toDF("doc_id", "text")
    val shard = (1L to 50L).map(i => (100L + i, s"shard document number $i distinct payload"))
      .toDF("doc_id", "text")
    // 50 items forced into a bloom sized for 2 at fpp 0.5 → nearly every
    // probe is a false positive; exactness must survive on the verify join
    val out = Dedup.bloomIncremental(ref, shard, "doc_id", "text",
      expectedItems = 2, fpp = 0.5)
    assert(out.count() == 50L)
  }

  test("bloomIncrementalPartitioned equals the monolithic path (incl. saturated blooms)") {
    import spark.implicits._
    val ref = (1L to 60L).map(i => (i, s"ref corpus document $i payload"))
      .toDF("doc_id", "text")
    val shard = ((1L to 30L).map(i => (200L + i, s"ref corpus document ${i * 2} payload")) ++ // dups of even refs
      (1L to 30L).map(i => (300L + i, s"novel shard document $i payload")) :+
      ((400L, null.asInstanceOf[String]))).toDF("doc_id", "text")
    val mono = Dedup.bloomIncremental(ref, shard, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val part = Dedup.bloomIncrementalPartitioned(ref, shard, "doc_id", "text",
      numBuckets = 8).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(part == mono, s"partitioned=$part monolithic=$mono")
    assert(part == (301L to 330L).toSet, s"got $part")
    // saturated per-bucket blooms (sized for ~1 item each at fpp 0.5):
    // exactness must survive purely on the verify join
    val sat = Dedup.bloomIncrementalPartitioned(ref, shard, "doc_id", "text",
      numBuckets = 4, expectedItems = 4, fpp = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sat == mono, s"saturated=$sat monolithic=$mono")
    // high bucket count — MORE buckets than distinct reference contents,
    // so most bloom slots are null ("definite new") and the broadcast-
    // variable dispatch (not a CASE chain) is exercised at the scale the
    // op exists for
    val wide = Dedup.bloomIncrementalPartitioned(ref, shard, "doc_id", "text",
      numBuckets = 256).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(wide == mono, s"numBuckets=256=$wide monolithic=$mono")
    // empty reference: everything (non-null-text) is new
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.bloomIncrementalPartitioned(empty, shard, "doc_id", "text")
      .count() == 60L)
  }

  test("bloomIncrementalStream: each micro-batch dedups against the ledger; restart converges") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("bis-src").toString
    val out = Files.createTempDirectory("bis-out").toString + "/out"
    val ledger = Files.createTempDirectory("bis-led").toString + "/ledger"
    val cp = Files.createTempDirectory("bis-cp").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    def streamDf = spark.readStream.schema(schema).json(src)
    def outIds(batch: Long): Set[Long] =
      spark.read.parquet(s"$out/batch=$batch").select("doc_id")
        .collect().map(_.getLong(0)).toSet

    Files.write(java.nio.file.Paths.get(s"$src/f0.json"),
      ("""{"doc_id":1,"text":"alpha content"}""" + "\n" +
        """{"doc_id":2,"text":"beta content"}""" + "\n").getBytes)
    val q = graft.operators.Dedup.bloomIncrementalStream(
      streamDf, "doc_id", "text", ledger, out, cp)
    q.processAllAvailable()
    assert(outIds(0) == Set(1L, 2L), "first batch: everything is new")

    // batch 1: a re-crawl of alpha (drop), a new doc, and a within-batch
    // duplicate pair (min id keeps)
    Files.write(java.nio.file.Paths.get(s"$src/f1.json"),
      ("""{"doc_id":11,"text":"alpha content"}""" + "\n" +
        """{"doc_id":12,"text":"gamma content"}""" + "\n" +
        """{"doc_id":13,"text":"gamma content"}""" + "\n").getBytes)
    q.processAllAvailable()
    q.stop()
    assert(outIds(1) == Set(12L), s"cross-batch + within-batch dedup: ${outIds(1)}")

    // restart from the same checkpoint: the ledger must cover BOTH prior
    // batches — a re-crawl of batch-1 content drops, novel content lands
    Files.write(java.nio.file.Paths.get(s"$src/f2.json"),
      ("""{"doc_id":21,"text":"gamma content"}""" + "\n" +
        """{"doc_id":22,"text":"delta content"}""" + "\n").getBytes)
    val q2 = graft.operators.Dedup.bloomIncrementalStream(
      streamDf, "doc_id", "text", ledger, out, cp)
    q2.processAllAvailable()
    q2.stop()
    assert(outIds(2) == Set(22L), s"post-restart dedup against full ledger: ${outIds(2)}")
  }

  test("keeperAssignment: driver union-find fast path equals the distributed fixpoint") {
    import spark.implicits._
    val docs = (1L to 30L).toDF("doc_id")
    // transitive chain, a reversed-order pair, and untouched nodes
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 20L), (4L, 5L), (5L, 6L),
      (6L, 7L), (25L, 24L)).toDF("doc_a", "doc_b")
    def run(budget: Long): Map[Long, Long] =
      Dedup.keeperAssignment(docs, "doc_id", pairs, maxDriverEdges = budget)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = run(4000000L) // 7 edges → driver union-find
    val dist = run(0L)       // forced distributed fixpoint
    assert(fast == dist, s"fast=$fast dist=$dist")
    assert(fast(3L) == 1L && fast(7L) == 4L && fast(20L) == 10L &&
      fast(25L) == 24L && fast(24L) == 24L && fast(15L) == 15L)
  }

  test("minhashDedupStream: near-dup collapse onto ledger keepers; restart converges") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("mds-src").toString
    val out = Files.createTempDirectory("mds-out").toString + "/out"
    val ledger = Files.createTempDirectory("mds-led").toString + "/ledger"
    val cp = Files.createTempDirectory("mds-cp").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    def streamDf = spark.readStream.schema(schema).json(src)
    def keepers(batch: Long): Map[Long, Long] =
      spark.read.parquet(s"$out/batch=$batch")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val textA = ("the quick brown fox jumps over the lazy dog while seven " +
      "wizards brew strong coffee before the long winter night begins again")
    val textANear = textA.replace("coffee", "tea") // one word off: J ≈ 0.9
    val textB = "completely different content about spark catalyst plans and shuffles"
    val textC = "a third distinct document mentioning parquet files and bloom filters"

    def j(id: Long, t: String) = s"""{"doc_id":$id,"text":"$t"}"""
    Files.write(java.nio.file.Paths.get(s"$src/f0.json"),
      (j(1, textA) + "\n" + j(2, textB) + "\n").getBytes)
    val q = Dedup.minhashDedupStream(streamDf, "doc_id", "text", ledger, out, cp)
    q.processAllAvailable()
    assert(keepers(0) == Map(1L -> 1L, 2L -> 2L), s"batch 0: ${keepers(0)}")

    // batch 1: near-copy of A collapses cross-batch; C + its identical
    // twin dedup within-batch (min id keeps)
    Files.write(java.nio.file.Paths.get(s"$src/f1.json"),
      (j(11, textANear) + "\n" + j(12, textC) + "\n" + j(13, textC) + "\n").getBytes)
    q.processAllAvailable()
    q.stop()
    assert(keepers(1) == Map(11L -> 1L, 12L -> 12L, 13L -> 12L), s"batch 1: ${keepers(1)}")

    // restart from the same checkpoint: ledger spans both prior batches
    Files.write(java.nio.file.Paths.get(s"$src/f2.json"),
      (j(21, textC) + "\n" + j(22, "novel closing document about watermarks") + "\n").getBytes)
    val q2 = Dedup.minhashDedupStream(streamDf, "doc_id", "text", ledger, out, cp)
    q2.processAllAvailable()
    q2.stop()
    assert(keepers(2) == Map(21L -> 12L, 22L -> 22L), s"batch 2: ${keepers(2)}")
  }

  test("duplicatedSpanStats: covered-token union over duplicated 5-grams, hand-checked") {
    import spark.implicits._
    // doc 1 and doc 2 share the 8-token prefix "a b c d e f g h":
    // positions 0..3 carry duplicated 5-grams → covered = [0, 8) = 8 tokens.
    // doc 3 is 10 unique tokens → 0 duplicated. doc 4 is short (< 5 tokens).
    val d = Seq(
      (1L, "a b c d e f g h x1 y1 z1"),
      (2L, "a b c d e f g h x2 y2 z2"),
      (3L, "p q r s t u v w p2 q2"),
      (4L, "tiny doc"),
      (5L, "")                 // empty text: zero tokens, no grams, no NPE
    ).toDF("doc_id", "text")
    val r = Dedup.duplicatedSpanStats(d, "doc_id", "text", L = 5)
      .collect().map(x => x.getLong(0) -> ((x.getInt(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((11, 8L, 8.0 / 11)), s"got ${r(1L)}")
    assert(r(2L) == ((11, 8L, 8.0 / 11)), s"got ${r(2L)}")
    assert(r(3L) == ((10, 0L, 0.0)), s"got ${r(3L)}")
    assert(r(4L) == ((2, 0L, 0.0)), s"got ${r(4L)}")
    assert(r(5L) == ((0, 0L, 0.0)), s"got ${r(5L)}")
    // within-doc repetition also counts as duplication (corpus-wide > 1)
    val rep = Seq((9L, "m n o p q r m n o p q r")).toDF("doc_id", "text")
    val rr = Dedup.duplicatedSpanStats(rep, "doc_id", "text", L = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    // grams at positions 0,1 repeat at 6,7 ("m n o p q", "n o p q r");
    // union covers [0,6) ∪ [6,12) = 12 tokens... positions 0,1,6,7 with
    // L=5: [0,5)∪[1,6)∪[6,11)∪[7,12) = [0,12) = 12
    assert(rr(9L) == 12L, s"got ${rr(9L)}")
  }

  test("removeDuplicatedSpans: excises exactly the covered tokens, rejoins the rest") {
    import spark.implicits._
    // same corpus as the stats test: docs 1/2 share the 8-token prefix →
    // those 8 tokens are cut from BOTH (substring removal, not doc drop);
    // the unique tails survive verbatim.
    val d = Seq(
      (1L, "a b c d e f g h x1 y1 z1"),
      (2L, "a b c d e f g h x2 y2 z2"),
      (3L, "p q r s t u v w p2 q2"),
      (4L, "tiny doc"),
      (5L, "")
    ).toDF("doc_id", "text")
    val r = Dedup.removeDuplicatedSpans(d, "doc_id", "text", L = 5)
      .collect().map(x => x.getLong(0) -> ((x.getInt(1), x.getInt(2), x.getString(3)))).toMap
    assert(r(1L) == ((11, 3, "x1 y1 z1")), s"got ${r(1L)}")
    assert(r(2L) == ((11, 3, "x2 y2 z2")), s"got ${r(2L)}")
    assert(r(3L) == ((10, 10, "p q r s t u v w p2 q2")), s"got ${r(3L)}")
    assert(r(4L) == ((2, 2, "tiny doc")), s"got ${r(4L)}")
    assert(r(5L) == ((0, 0, "")), s"got ${r(5L)}")
    // a doc that is ONE big duplicated span vanishes entirely
    val rep = Seq((9L, "m n o p q r m n o p q r")).toDF("doc_id", "text")
    val rr = Dedup.removeDuplicatedSpans(rep, "doc_id", "text", L = 5)
      .collect().map(x => x.getLong(0) -> x.getString(3)).toMap
    assert(rr(9L) == "", s"got '${rr(9L)}'")
  }

  test("lineDedupStats: cross-doc duplicated lines keep exactly the first occurrence") {
    import spark.implicits._
    val d = Seq(
      (1L, "shared cookie banner\nunique alpha\nunique beta"),
      (2L, "shared cookie banner\nunique gamma"),
      (3L, "entirely original content")
    ).toDF("doc_id", "text")
    val r = Dedup.lineDedupStats(d, "doc_id", "text", sep = "\n")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(1L) == ((3L, 3L)), s"doc1 owns the first banner occurrence: ${r(1L)}")
    assert(r(2L) == ((2L, 1L)), s"doc2 loses its banner copy: ${r(2L)}")
    assert(r(3L) == ((1L, 1L)), s"unique doc untouched: ${r(3L)}")
  }

  test("simhash: identical docs share fingerprint; near dups closer than unrelated") {
    // r7: the fingerprint is row-local (SimHashF) — the whole (doc, simhash)
    // frame must plan without a single shuffle
    val plan = Dedup.simhash(docs, "doc_id", "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"simhash must be shuffle-free:\n$plan")
    val fp = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    // short docs flip several bits per edit; the invariant is relative:
    // a one-token edit stays much closer than unrelated content
    val near = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    val far = java.lang.Long.bitCount(fp(1L) ^ fp(4L))
    assert(near < far, s"near=$near far=$far")
    assert(far > 10)
    // 4-quarter blocking guarantees recall only for hamming ≤ 3 (pigeonhole:
    // ≤3 flips leave one 16-bit quarter untouched); identical docs always pair
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = near)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    if (near <= 3) assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhashPairs verify stage emits true Jaccard and drops low-overlap candidates") {
    // widen blocking to hamming<=64 so every quarter-collision becomes a
    // candidate — the verify stage alone must then do the filtering
    val verified = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 64,
        verify = true, shingleSize = 2, minJaccard = 0.7)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    // identical docs survive verify at exactly 1.0
    assert(verified.get((1L, 2L)).contains(1.0), s"got $verified")
    // unrelated doc 4 is below 0.7 true Jaccard against everything — even
    // if blocking admitted it, verify must drop it
    assert(!verified.keys.exists(p => p._1 == 4L || p._2 == 4L), s"got $verified")
    // every emitted pair carries true Jaccard >= minJaccard
    assert(verified.values.forall(_ >= 0.7), s"got $verified")
    // near-dup 1↔3 true bigram Jaccard is 15/17 — if blocked, the emitted
    // value must be the exact one (same formula as ngramJaccardPairs)
    verified.get((1L, 3L)).foreach(j => assert(math.abs(j - 15.0 / 17.0) < 1e-9))
  }

  test("corpusDiff classifies NULL-text docs by id presence, not hash nullity (r8)") {
    import spark.implicits._
    val old = Seq((1L, "alpha"), (2L, null), (3L, "gone"), (4L, null), (5L, "flip"))
      .toDF("doc_id", "text")
    val nw = Seq((1L, "alpha"), (2L, null), (4L, "now text"), (5L, null), (6L, null))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.corpusDiff(old, nw, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "unchanged", // same text
      2L -> "unchanged", // null -> null: same (absent) content
      3L -> "removed",   // id absent from new — NOT 'changed'
      4L -> "changed",   // null -> text
      5L -> "changed",   // text -> null
      6L -> "added"),    // new id with null text — NOT 'unchanged'
      s"got $got")
  }

  test("fingerprint is order-sensitive and deterministic") {
    import spark.implicits._
    val d = Seq((1L, "a b c"), (2L, "a b c"), (3L, "c b a")).toDF("doc_id", "text")
    val fp = d.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }
}
