package graft

import graft.examples.StreamingIngest
import graft.sources.{MessageBroker, MqttBridge, MqttClient, MqttServer}

import java.nio.charset.StandardCharsets.UTF_8

/** End-to-end live ingestion: documents published over a REAL MQTT
  * socket flow through normalize → quality/language gates → ledger-backed
  * incremental dedup into a parquet corpus, across multiple micro-batches.
  */
class StreamingIngestSpec extends SparkSpec {

  test("wire → normalize → gates → incremental dedup, across micro-batches") {
    val server = new MqttServer
    val addr = s"ingest-${java.util.UUID.randomUUID()}"
    val topic = "docs"
    val tmp = java.nio.file.Files.createTempDirectory("ingest").toString
    try {
      val bridge = new MqttClient("127.0.0.1", server.port, "bridge")
      val device = new MqttClient("127.0.0.1", server.port, "device")
      try {
        MqttBridge.subscribeInto(bridge, "crawl/docs", addr, topic)
        Thread.sleep(50)
        val good1 = "the quick brown fox jumps over the lazy dog and keeps going for a while longer"
        val good2 = "a completely different sentence about the weather and the sea with many common words"
        val junk = "!!!! 12345 ???? 9999 ----"
        // batch 1: two good docs (one with messy whitespace → normalizes
        // to the same text as good1) + junk that the quality gate drops
        Seq(good1, "  " + good1.replace(" ", "  ") + "\t", junk)
          .foreach(d => device.publish("crawl/docs", d.getBytes(UTF_8)))
        var deadline = System.currentTimeMillis() + 10000
        while (MessageBroker.at(addr).size(topic) < 3 && System.currentTimeMillis() < deadline)
          Thread.sleep(20)

        val q = StreamingIngest.start(spark, addr, topic,
          s"$tmp/out", s"$tmp/ledger", s"$tmp/ckpt")
        q.processAllAvailable()

        // batch 2: an exact cross-batch duplicate of good1 + a new doc
        Seq(good1, good2).foreach(d => device.publish("crawl/docs", d.getBytes(UTF_8)))
        deadline = System.currentTimeMillis() + 10000
        while (MessageBroker.at(addr).size(topic) < 5 && System.currentTimeMillis() < deadline)
          Thread.sleep(20)
        q.processAllAvailable()
        q.stop()

        val kept = spark.read.parquet(s"$tmp/out")
          .select("doc_id").collect().map(_.getLong(0)).toSet
        val texts = spark.read.parquet(s"$tmp/out").count()
        // survivors: ONE copy of good1 (batch-1 dup collapsed within batch,
        // batch-2 copy collapsed against the ledger) + good2; junk gated out
        assert(texts == 2, s"expected 2 survivors, got $texts (ids $kept)")
        assert(kept.contains(0L), "first good doc keeps its min offset")
        assert(kept.exists(_ >= 3L), "the new batch-2 doc survives")
        // the ledger carries exactly the two accepted contents
        assert(spark.read.parquet(s"$tmp/ledger").count() == 2)
      } finally { bridge.close(); device.close() }
    } finally {
      server.close()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("ingest with the trained classifier gate: the model vetoes what rules passed") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // train on the injected marker signal (the stand-in for LLM labels)
    val corpus = Tables.load(spark, sfDir, "documents").limit(300)
      .select(col("doc_id"), col("text"))
      .withColumn("label", when(col("doc_id") % 4 === 0, 1.0).otherwise(0.0))
      .withColumn("text",
        when(col("label") === 1.0, concat(col("text"), lit(" eduhallmark")))
          .otherwise(col("text")))
    val model = graft.operators.QualityModel.train(corpus, "text", "label",
      numFeatures = 1 << 14)
    val addr = s"ingest-model-${java.util.UUID.randomUUID()}"
    MessageBroker.at(addr).clear()
    val tmp = java.nio.file.Files.createTempDirectory("ingest-m").toString
    // both docs pass the RULE gates (quality + language); only the marked
    // one passes the MODEL gate
    val marked = "the quick brown fox jumps over the lazy dog eduhallmark and keeps going for a while"
    val plain = "the quick brown fox jumps over the lazy dog and keeps going for quite a while longer"
    Seq(marked, plain).foreach(d =>
      MessageBroker.at(addr).publish("docs", null, d.getBytes(UTF_8)))
    val q = StreamingIngest.start(spark, addr, "docs",
      s"$tmp/out", s"$tmp/ledger", s"$tmp/ckpt", model = Some(model))
    q.processAllAvailable()
    q.stop()
    try {
      val kept = spark.read.parquet(s"$tmp/out").count()
      assert(kept == 1, s"only the marker doc passes the model gate, got $kept")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }
}
