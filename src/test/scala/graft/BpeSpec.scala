package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  // the classic BPE teaching corpus: word frequencies with a hand-derivable
  // merge sequence
  private val classicFreqs = Seq(
    "hug" -> 10L, "pug" -> 5L, "pun" -> 12L, "bun" -> 4L, "hugs" -> 5L)

  private def classicDocs = {
    import spark.implicits._
    // expand the frequency table into documents (one word per doc repeat)
    classicFreqs.zipWithIndex.flatMap { case ((w, f), wi) =>
      (0L until f).map(i => (wi * 1000L + i, w))
    }.toDF("doc_id", "text")
  }

  test("driver training learns the hand-derivable merge sequence, deterministically") {
    val merges = Bpe.trainDriver(classicFreqs, numMerges = 3)
    // pair freqs round 1: ug=20, pu=17, un=16, hu=15, gs=5, bu=4 → (u,g)
    // round 2 (h-ug, p-ug, p-u-n, b-u-n, h-ug-s): un=16, h+ug=15, pu=12 → (u,n)
    // round 3: (h,ug)=15
    assert(merges.map(m => (m.left, m.right, m.freq)) ==
      Seq(("u", "g", 20L), ("u", "n", 16L), ("h", "ug", 15L)))
    assert(merges.map(_.rank) == Seq(0, 1, 2))
    // pure function of the corpus: training twice is byte-identical
    assert(Bpe.trainDriver(classicFreqs, 3) == merges)
    // exhaustion: a corpus of 1-char words has no pairs → empty merge list
    assert(Bpe.trainDriver(Seq("a" -> 5L, "b" -> 3L), 10).isEmpty)
  }

  test("distributed training path equals the driver path merge-for-merge") {
    val freqs = Bpe.wordFreqs(classicDocs, "text")
    val viaDriver = Bpe.trainDriver(
      freqs.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq, 10)
    val viaCluster = Bpe.trainDistributed(freqs, 10)
    assert(viaCluster == viaDriver, s"cluster=$viaCluster driver=$viaDriver")
    assert(viaDriver.take(3).map(m => (m.left, m.right)) ==
      Seq(("u", "g"), ("u", "n"), ("h", "ug")))
    // and the public entry picks a path transparently
    assert(Bpe.train(classicDocs, "text", 10) == viaDriver)
  }

  test("encode applies ranks greedily; round-trips; counts drop vs chars") {
    val merges = Bpe.trainDriver(classicFreqs, 3)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    assert(Bpe.encodeWord("hugs", ranks).toSeq == Seq("hug", "s"))
    assert(Bpe.encodeWord("pun", ranks).toSeq == Seq("p", "un"))
    assert(Bpe.encodeWord("zebra", ranks).toSeq ==
      Seq("z", "e", "b", "r", "a")) // unseen word degrades to chars
    val enc = Bpe.encode(classicDocs, "text", merges)
      .select(col("text"), col("tokens"), col("n_bpe_tokens"))
    val rows = enc.collect()
    // every word round-trips: concatenated tokens rebuild the word
    rows.foreach { r =>
      assert(r.getSeq[String](1).mkString == r.getString(0), r.toString)
    }
    // compression: merges strictly reduce token counts vs character count
    val charTotal = rows.map(_.getString(0).length.toLong).sum
    val tokTotal = rows.map(_.getInt(2).toLong).sum
    assert(tokTotal < charTotal, s"$tokTotal !< $charTotal")
    // encoding with zero merges is exactly characters
    val raw = Bpe.encode(classicDocs, "text", Nil).agg(sum("n_bpe_tokens"))
      .collect()(0).getLong(0)
    assert(raw == charTotal)
  }

  test("encode null-propagates on null text and survives a tiny memo cap") {
    import spark.implicits._
    val merges = Bpe.trainDriver(classicFreqs, 3)
    val docs = Seq((1L, "hugs pun"), (2L, null), (3L, "bun")).toDF("doc_id", "text")
    // null text must yield null tokens, not an aborted task (100 TB bad-row policy)
    val rows = Bpe.encode(docs, "text", merges).orderBy("doc_id")
      .select("tokens", "n_bpe_tokens").collect()
    assert(rows(0).getSeq[String](0) == Seq("hug", "s", "p", "un"))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).getSeq[String](0) == Seq("b", "un"))
    // memo is a pure cache: forcing clear-on-full at cap=2 changes nothing
    val full = Bpe.encode(classicDocs, "text", merges).orderBy("doc_id")
      .select("doc_id", "tokens").collect().toSeq
    val capped = Bpe.encode(classicDocs, "text", merges, memoCap = 2)
      .orderBy("doc_id").select("doc_id", "tokens").collect().toSeq
    assert(capped == full)
  }

  test("training on the real corpus compresses it and is deterministic") {
    val docs = Tables.load(spark, sfDir, "documents").limit(200).cache()
    val merges = Bpe.train(docs, "text", numMerges = 30)
    assert(merges.length == 30, s"corpus rich enough for 30 merges, got ${merges.length}")
    assert(merges.map(_.rank) == (0 until 30))
    // merge freqs are non-increasing in rank only weakly (later merges can
    // beat earlier leftovers), but every learned pair was genuinely frequent
    assert(merges.forall(_.freq >= 2))
    val enc = Bpe.encode(docs, "text", merges)
    val agg = enc.agg(
      sum(length(regexp_replace(col("text"), "\\s+", ""))).as("chars"),
      sum("n_bpe_tokens").as("toks")).collect()(0)
    assert(agg.getLong(1) < agg.getLong(0) * 7 / 10,
      s"30 merges should cut ≥30% of char-tokens: ${agg.getLong(1)} vs ${agg.getLong(0)}")
    assert(Bpe.train(docs, "text", 30) == merges)
    docs.unpersist()
  }
}
