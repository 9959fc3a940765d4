package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("stratifiedSample: quota per stratum, short strata intact, deterministic") {
    import spark.implicits._
    val df = ((1L to 50L).map(i => (i, "big")) ++ Seq((100L, "tiny"), (101L, "tiny")))
      .toDF("doc_id", "lang")
    val take = Sampling.stratifiedSample(df, "doc_id", "lang", 10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(take.count(_._2 == "big") == 10)
    assert(take.count(_._2 == "tiny") == 2, "strata below quota keep every row")
    val again = Sampling.stratifiedSample(df, "doc_id", "lang", 10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(take.toSet == again.toSet, "hash ordering must be stable across runs")
  }

  test("capPerGroup keeps the top-k rows per group by priority desc, deterministic ties") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 100L), (2L, "a", 300L), (3L, "a", 200L), (4L, "a", 300L),
      (5L, "b", 50L)
    ).toDF("doc_id", "source", "n_chars")
    val out = Sampling.capPerGroup(df, "source", col("n_chars"), "doc_id", 2)
      .collect().map(_.getLong(0)).toSet
    // group a: n_chars 300 (doc 2), 300 (doc 4) — tie broken by doc_id,
    // so docs 2 and 4 survive; group b below quota keeps its row
    assert(out == Set(2L, 4L, 5L), s"got $out")
  }

  test("mixtureSample: deterministic, rate-accurate per stratum, 0/1 edges exact") {
    import spark.implicits._
    val df = (1L to 2000L).map(i => (i, if (i <= 1000) "web" else "books"))
      .toDF("doc_id", "source")
    val out = Sampling.mixtureSample(df, "source", "doc_id",
      Map("web" -> 0.3, "books" -> 1.0))
    val counts = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("books") == 1000L, "fraction 1.0 keeps every row")
    assert(counts("web") > 200 && counts("web") < 400,
      s"fraction 0.3 of 1000 should land near 300, got ${counts("web")}")
    val again = Sampling.mixtureSample(df, "source", "doc_id",
      Map("web" -> 0.3, "books" -> 1.0)).collect().map(_.getLong(0)).toSet
    assert(again == out.collect().map(_.getLong(0)).toSet, "must be replayable")
    val none = Sampling.mixtureSample(df, "source", "doc_id",
      Map("web" -> 0.0), defaultFraction = 0.0)
    assert(none.count() == 0L, "fraction 0.0 drops every row")
  }

  test("mixtureSample under Structured Streaming keeps exactly the batch keep-set") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, if (i % 2 == 0) "web" else "books"))
      .toDF("doc_id", "source")
    val src = java.nio.file.Files.createTempDirectory("graft-mix").toString
    df.write.mode("overwrite").parquet(src)
    val fractions = Map("web" -> 0.4, "books" -> 0.7)
    val batchKeep = Sampling.mixtureSample(df, "source", "doc_id", fractions)
      .collect().map(_.getLong(0)).toSet
    // stateless projection+filter → streams unchanged, no watermark needed
    val stream = spark.readStream.schema(df.schema).parquet(src)
    val q = Sampling.mixtureSample(stream, "source", "doc_id", fractions)
      .writeStream.format("memory").queryName("mix_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamKeep = spark.table("mix_stream").collect().map(_.getLong(0)).toSet
    assert(streamKeep == batchKeep,
      s"stream/batch keep-set diverged: ${streamKeep.diff(batchKeep).take(5)} / ${batchKeep.diff(streamKeep).take(5)}")
  }

  test("contaminationPairs: a quoted eval doc scores containment 1.0") {
    import spark.implicits._
    val evalDf = Seq((1000L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "prefix words then the quick brown fox jumps and a long suffix tail"),
      (2L, "entirely unrelated content about databases and streams"),
      (3L, "the quick red fox sleeps")) // partial overlap
      .toDF("doc_id", "text")
    val out = Sampling.contaminationPairs(train, evalDf, "doc_id", "text",
        shingleSize = 2, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    // doc 1 contains the eval verbatim: every eval 2-shingle appears → 1.0
    assert(out.contains((1L, 1000L, 1.0)), s"got $out")
    assert(!out.exists(_._1 == 2L), "unrelated doc must not pair")
    // containment is asymmetric: doc 1 is long, so Jaccard would dilute —
    // the metric must not
    out.foreach { case (_, _, c) => assert(c >= 0.3 && c <= 1.0) }
  }

  test("contaminationPairs: hot-shingle cap bounds the join") {
    import spark.implicits._
    // 50 train docs all sharing one hot shingle; cap 10 kills it, so no
    // pair can form through it
    val train = (1L to 50L).map(i => (i, s"common shingle here unique$i")).toDF("doc_id", "text")
    val evalDf = Seq((99L, "common shingle here")).toDF("doc_id", "text")
    val out = Sampling.contaminationPairs(train, evalDf, "doc_id", "text",
      shingleSize = 2, threshold = 0.1, maxDocFreq = 10)
    assert(out.count() == 0, "capped shingles must not generate pairs")
  }

  test("ngramCollisions: any shared exact n-gram flags the doc; clean docs report zero") {
    import spark.implicits._
    val bench = Seq(
      (1000L, "what is the capital of france"),
      (1001L, "two plus two equals four exactly")).toDF("doc_id", "text")
    val train = Seq(
      // quotes a full benchmark 4-gram → contaminated
      (1L, "quiz night asked what is the capital of france and more"),
      // shares words but never 4 consecutive ones → clean
      (2L, "the capital city of a country is where france keeps its what"),
      // quotes TWO distinct benchmark 4-grams (one from each eval doc)
      (3L, "is the capital of padding padding two plus two equals"),
      // short doc (< n tokens) that is NOT a benchmark doc → clean
      (4L, "tiny doc")).toDF("doc_id", "text")
    val out = Sampling.ngramCollisions(train, bench, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out.size == 4, "one verdict row per train doc")
    assert(out(1L)._2 && out(1L)._1 >= 1, s"got ${out(1L)}")
    assert(out(2L) == ((0L, false)), s"got ${out(2L)}")
    assert(out(3L)._2 && out(3L)._1 == 2L, s"got ${out(3L)}")
    assert(out(4L) == ((0L, false)))
    // whole-corpus gate: the keep set is exactly the clean docs
    val kept = Sampling.ngramCollisions(train, bench, "doc_id", "text", n = 4)
      .filter(!col("contaminated")).select("train_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L))
  }

  test("epochReplicate: whole epochs replicate, fractional epochs hash-sample, epoch column is 1..n") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, s"dom${i % 4}")).toDF("doc_id", "source")
    val out = Sampling.epochReplicate(df, "source", "doc_id",
      Map("dom0" -> 3.0, "dom1" -> 1.5, "dom2" -> 0.4))
    val counts = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("dom0") == 300L, s"exactly 3 epochs: $counts") // 100 docs x 3
    assert(counts("dom3") == 100L, "default weight 1.0 is identity")
    // fractional parts are hash-decided: within a generous band around 1.5/0.4
    assert(counts("dom1") >= 120L && counts("dom1") <= 180L, s"~1.5x: $counts")
    assert(counts("dom2") >= 20L && counts("dom2") <= 60L, s"~0.4x: $counts")
    // epoch indices are dense 1..n per doc
    val perDoc = out.filter($"source" === "dom0").groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.collect_set("epoch").as("es"))
      .collect().map(_.getSeq[Int](1).toSet).toSet
    assert(perDoc == Set(Set(1, 2, 3)))
    // deterministic: same input -> byte-identical mixture
    val again = Sampling.epochReplicate(df, "source", "doc_id",
      Map("dom0" -> 3.0, "dom1" -> 1.5, "dom2" -> 0.4))
      .collect().map(_.toString).sorted.toSeq
    assert(again == out.collect().map(_.toString).sorted.toSeq)
  }
}
