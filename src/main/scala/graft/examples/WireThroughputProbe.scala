package graft.examples

import graft.sources._

import java.nio.charset.StandardCharsets.UTF_8

/** Measured ingest rates for the real wire clients (SCALE.md round-7):
  * loopback broker → protocol client → MessageBroker seam for each of
  * NATS / MQTT 3.1.1 / AMQP 0-9-1, then the full [[StreamingIngest]]
  * pipeline (normalize → quality/language gates → bloom-ledger dedup →
  * parquet) over the NATS-fed topic. Everything crosses real TCP
  * sockets; the numbers put a throughput figure next to the connector
  * correctness claims.
  *
  * Usage: runMain graft.examples.WireThroughputProbe [nMessages]
  */
object WireThroughputProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    // ~200-byte text docs; every 5th message is a byte-identical copy of
    // its predecessor so the content-hash dedup stage has real work (the
    // payload must NOT embed the message index, or nothing is a dup)
    def payload(i: Int): Array[Byte] = {
      val ci = if (i % 5 == 4) i - 1 else i
      (s"document number $ci with enough english filler words to pass " +
        s"the quality gate and the language gate it keeps going for a " +
        s"while sentence $ci ends here.").getBytes(UTF_8)
    }

    def rate(count: Int, secs: Double): String = f"${count / secs}%,.0f msg/s"

    // ── NATS: fire-and-forget publishes, reader-thread delivery ────────
    val natsSecs = {
      val server = new NatsServer
      val addr = "wire-probe-nats"
      MessageBroker.at(addr).clear()
      val consumer = new NatsClient("127.0.0.1", server.port, "probe-consumer")
      val producer = new NatsClient("127.0.0.1", server.port, "probe-producer")
      try {
        NatsBridge.subscribeInto(consumer, "probe.docs", addr, "docs")
        Thread.sleep(100)
        val t0 = System.nanoTime()
        (0 until n).foreach(i => producer.publish("probe.docs", payload(i)))
        producer.flush()
        while (MessageBroker.at(addr).size("docs") < n) Thread.sleep(5)
        (System.nanoTime() - t0) / 1e9
      } finally { consumer.close(); producer.close(); server.close() }
    }
    println(s"[wire-probe] nats  wire->seam: $n msgs in ${f(natsSecs)} = ${rate(n, natsSecs)}")

    // ── MQTT QoS-1: serial publish (one PUBACK RTT per message) vs the
    //    r7 pipelined publishAll (32 in flight)
    val mqttN = n / 10 // serial is RTT-bound: smaller batch, same signal
    val (mqttSecs, mqttPipeSecs) = {
      val server = new MqttServer
      val addr = "wire-probe-mqtt"
      MessageBroker.at(addr).clear()
      val sub = new MqttClient("127.0.0.1", server.port, "probe-sub")
      val pub = new MqttClient("127.0.0.1", server.port, "probe-pub")
      try {
        MqttBridge.subscribeInto(sub, "probe/docs", addr, "docs")
        val t0 = System.nanoTime()
        (0 until mqttN).foreach(i => pub.publish("probe/docs", payload(i)))
        while (MessageBroker.at(addr).size("docs") < mqttN) Thread.sleep(5)
        val serial = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        pub.publishAll("probe/docs", (0 until n).iterator.map(payload))
        while (MessageBroker.at(addr).size("docs") < mqttN + n) Thread.sleep(5)
        (serial, (System.nanoTime() - t1) / 1e9)
      } finally { sub.close(); pub.close(); server.close() }
    }
    println(s"[wire-probe] mqtt  wire->seam (serial):    $mqttN msgs in ${f(mqttSecs)} = ${rate(mqttN, mqttSecs)}")
    println(s"[wire-probe] mqtt  wire->seam (pipelined): $n msgs in ${f(mqttPipeSecs)} = ${rate(n, mqttPipeSecs)}")

    // ── AMQP 0-9-1: async basic.publish (3 frames per message) ─────────
    val amqpSecs = {
      val server = new AmqpServer
      val addr = "wire-probe-amqp"
      MessageBroker.at(addr).clear()
      val consumer = new AmqpClient("127.0.0.1", server.port)
      val producer = new AmqpClient("127.0.0.1", server.port)
      try {
        AmqpBridge.consumeInto(consumer, "docs", addr, "docs")
        Thread.sleep(100)
        val t0 = System.nanoTime()
        (0 until n).foreach(i => producer.publish("docs", payload(i)))
        while (MessageBroker.at(addr).size("docs") < n) Thread.sleep(5)
        (System.nanoTime() - t0) / 1e9
      } finally { consumer.close(); producer.close(); server.close() }
    }
    println(s"[wire-probe] amqp  wire->seam: $n msgs in ${f(amqpSecs)} = ${rate(n, amqpSecs)}")

    // ── full pipeline: NATS wire → seam → StreamingIngest → parquet ────
    val spark = graft.GraftSession.builder("wire-throughput-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pipeSecs = {
      val server = new NatsServer
      val addr = "wire-probe-pipeline"
      MessageBroker.at(addr).clear()
      val consumer = new NatsClient("127.0.0.1", server.port, "pipe-consumer")
      val producer = new NatsClient("127.0.0.1", server.port, "pipe-producer")
      try {
        NatsBridge.subscribeInto(consumer, "probe.docs", addr, "docs")
        Thread.sleep(100)
        (0 until n).foreach(i => producer.publish("probe.docs", payload(i)))
        producer.flush()
        while (MessageBroker.at(addr).size("docs") < n) Thread.sleep(5)
        val base = java.nio.file.Files.createTempDirectory("wire-probe").toString
        val q = StreamingIngest.start(spark, addr, "docs",
          s"$base/out", s"$base/ledger", s"$base/cp")
        // wave 1 pays the one-time codegen/JIT tax (published separately);
        // wave 2, against a warm session AND a non-empty dedup ledger, is
        // the steady-state number
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val warmSecs = (System.nanoTime() - t0) / 1e9
        println(s"[wire-probe] nats->ingest->parquet wave 1 (cold, empty ledger): " +
          s"$n msgs in ${f(warmSecs)} = ${rate(n, warmSecs)}")
        (n until 2 * n).foreach(i => producer.publish("probe.docs", payload(i)))
        producer.flush()
        while (MessageBroker.at(addr).size("docs") < 2L * n) Thread.sleep(5)
        val t1 = System.nanoTime()
        q.processAllAvailable()
        val secs = (System.nanoTime() - t1) / 1e9
        q.stop()
        val kept = spark.read.parquet(s"$base/out").count()
        println(s"[wire-probe] pipeline kept $kept/${2 * n} after quality+dedup " +
          s"(every 5th message is a byte-identical dup)")
        secs
      } finally { consumer.close(); producer.close(); server.close() }
    }
    println(s"[wire-probe] nats->ingest->parquet wave 2 (steady state): " +
      s"$n msgs in ${f(pipeSecs)} = ${rate(n, pipeSecs)}")
    spark.stop()
  }

  private def f(secs: Double): String = f"$secs%.2fs"
}
