package graft

import graft.sources.{MessageBroker, MessagingProfiles}
import org.apache.spark.sql.functions._

/** Messaging connector family (kinesis / fluvio / nats / mqtt / rabbitmq)
  * over the in-process broker: profile validation per reference options,
  * end-to-end SQL pipelines (streaming source → sink), offset-exact
  * resume, and format decode on the shared envelope.
  */
class MessagingConnectorsSpec extends SparkSpec {

  private def seedJson(address: String, topic: String, rows: Seq[String]): Unit = {
    val b = MessageBroker.at(address)
    rows.foreach(r => b.publish(topic, null, r.getBytes("UTF-8")))
  }

  private def parseTbl(ddl: String) =
    sql.Ddl.parse(ddl).asInstanceOf[sql.Ddl.CreateTbl].table

  test("profile validation mirrors the reference connectors") {
    // kinesis requires stream_name
    val k = parseTbl("CREATE TABLE k (id BIGINT) WITH (connector='kinesis', format='json')")
    assert(intercept[RuntimeException](MessagingProfiles.resolve(k))
      .getMessage.contains("stream_name"))
    // nats: stream XOR subject
    val nBoth = parseTbl(
      """CREATE TABLE n (id BIGINT) WITH (connector='nats', servers='srv',
        |  stream='s', subject='x', format='json')""".stripMargin)
    assert(intercept[RuntimeException](MessagingProfiles.resolve(nBoth))
      .getMessage.contains("exactly one"))
    val nNone = parseTbl(
      "CREATE TABLE n (id BIGINT) WITH (connector='nats', servers='srv', format='json')")
    assert(intercept[RuntimeException](MessagingProfiles.resolve(nNone))
      .getMessage.contains("jetstream"))
    // nats credentials auth requires the pair
    val nAuth = parseTbl(
      """CREATE TABLE n (id BIGINT) WITH (connector='nats', servers='srv',
        |  subject='x', 'auth.type'='credentials', format='json')""".stripMargin)
    assert(intercept[RuntimeException](MessagingProfiles.resolve(nAuth))
      .getMessage.contains("auth.username"))
    // mqtt qos values
    val m = parseTbl(
      """CREATE TABLE m (id BIGINT) WITH (connector='mqtt', url='tcp://b:1883',
        |  topic='t', qos='Sometimes', format='json')""".stripMargin)
    assert(intercept[RuntimeException](MessagingProfiles.resolve(m))
      .getMessage.contains("qos"))
    // fluvio requires topic; rabbitmq requires stream
    assert(intercept[RuntimeException](MessagingProfiles.resolve(
      parseTbl("CREATE TABLE f (id BIGINT) WITH (connector='fluvio', format='json')")))
      .getMessage.contains("topic"))
    assert(intercept[RuntimeException](MessagingProfiles.resolve(
      parseTbl("CREATE TABLE r (id BIGINT) WITH (connector='rabbitmq', format='json')")))
      .getMessage.contains("stream"))
    // invalid source.offset rejected
    assert(intercept[RuntimeException](MessagingProfiles.resolve(
      parseTbl("""CREATE TABLE k2 (id BIGINT) WITH (connector='kinesis',
        | stream_name='s', 'source.offset'='middle', format='json')""".stripMargin)))
      .getMessage.contains("source.offset"))
  }

  test("kinesis streaming pipeline: json decode, windowless filter to fluvio sink") {
    val in = s"stream-${java.util.UUID.randomUUID()}"
    val out = s"topic-${java.util.UUID.randomUUID()}"
    seedJson("kinesis://local", in, Seq(
      """{"id": 1, "v": "keep"}""", """{"id": 2, "v": "drop"}""", """{"id": 3, "v": "keep"}"""))
    val p = new sql.Pipeline(spark, streaming = true)
    p.run(
      s"""CREATE TABLE src (id BIGINT, v TEXT) WITH (
         |  connector='kinesis', stream_name='$in', format='json', type='source');
         |CREATE TABLE dst (id BIGINT, v TEXT) WITH (
         |  connector='fluvio', topic='$out', format='json', type='sink');
         |INSERT INTO dst SELECT id, v FROM src WHERE v = 'keep';""".stripMargin)
    val got = MessageBroker.at("fluvio://local").fetch(out, 0, 100)
      .map(m => new String(m._2.value, "UTF-8"))
    assert(got.length == 2)
    assert(got.forall(_.contains("keep")))
  }

  test("nats core subject batch read with envelope metadata passthrough") {
    val subj = s"subj-${java.util.UUID.randomUUID()}"
    seedJson("nats://srv1", subj, Seq("""{"n": 10}""", """{"n": 32}"""))
    val p = new sql.Pipeline(spark, streaming = false)
    val res = p.run(
      s"""CREATE TABLE src (n BIGINT) WITH (
         |  connector='nats', servers='srv1', subject='$subj', format='json', type='source');
         |SELECT sum(n) AS total, count(*) AS cnt FROM src;""".stripMargin)
    val r = res.get.collect()(0)
    assert(r.getLong(0) == 42 && r.getLong(1) == 2)
  }

  test("mqtt streaming source picks up messages published between micro-batches") {
    import org.apache.spark.sql.streaming.Trigger
    val topic = s"t-${java.util.UUID.randomUUID()}"
    val addr = "tcp://broker:1883"
    seedJson(addr, topic, Seq("""{"x": 1}"""))
    val raw = spark.readStream.format("graft-mq")
      .option("address", addr).option("topic", topic).load()
      .select(get_json_object(col("value").cast("string"), "$.x").cast("long").as("x"))
    val q = raw.writeStream.format("memory").queryName("mqtt_out")
      .trigger(Trigger.ProcessingTime(100)).start()
    try {
      val deadline = System.currentTimeMillis() + 20000
      while (spark.table("mqtt_out").count() < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      seedJson(addr, topic, Seq("""{"x": 2}""", """{"x": 3}"""))
      while (spark.table("mqtt_out").count() < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(spark.table("mqtt_out").agg(sum("x")).collect()(0).getLong(0) == 6)
    } finally q.stop()
  }

  test("rabbitmq sink: debezium envelope rides the shared value frame") {
    val stream = s"s-${java.util.UUID.randomUUID()}"
    val dir = java.nio.file.Files.createTempDirectory("rmq_src")
    java.nio.file.Files.write(dir.resolve("d.json"),
      "{\"k\": \"a\", \"v\": 1}\n{\"k\": \"a\", \"v\": 2}\n".getBytes)
    val p = new sql.Pipeline(spark, streaming = true)
    p.run(
      s"""CREATE TABLE src (k TEXT, v BIGINT) WITH (
         |  connector='filesystem', path='$dir', format='json', type='source');
         |CREATE TABLE dst (k TEXT, total BIGINT) WITH (
         |  connector='rabbitmq', stream='$stream', host='h1', format='debezium_json', type='sink');
         |INSERT INTO dst SELECT k, sum(v) FROM src GROUP BY k;""".stripMargin)
    val msgs = MessageBroker.at("rabbitmq://h1").fetch(stream, 0, 100)
      .map(m => new String(m._2.value, "UTF-8"))
    assert(msgs.nonEmpty)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val last = mapper.readTree(msgs.last)
    assert(last.has("op") && last.has("after"))
    assert(last.get("after").get("total").asLong() == 3)
  }
}
