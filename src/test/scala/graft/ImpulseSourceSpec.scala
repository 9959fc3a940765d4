package graft

import org.apache.spark.sql.functions._

class ImpulseSourceSpec extends SparkSpec {

  test("batch read: bounded counter with rate-spaced event times") {
    val df = spark.read.format("graft-impulse")
      .option("message_count", "1000").option("event_rate", "100")
      .option("parallelism", "8").load()
    assert(df.schema.fieldNames.toSeq == Seq("timestamp", "counter", "subtask_index"))
    assert(df.count() == 1000)
    val r = df.agg(min("counter"), max("counter"), countDistinct("counter"),
      min("timestamp"), max("timestamp")).collect()(0)
    assert(r.getLong(0) == 0 && r.getLong(1) == 999 && r.getLong(2) == 1000)
    // 1000 events at 100/s span ~10s of event time
    assert(r.getTimestamp(3).toString == "2024-01-01 00:00:00.0")
    assert(r.getTimestamp(4).toString == "2024-01-01 00:00:09.99")
    // subtasks partition the range (reference: per-subtask counters)
    assert(df.select("subtask_index").distinct().count() == 8)
  }

  test("micro-batch stream: counters arrive exactly once across batches") {
    val stream = spark.readStream.format("graft-impulse")
      .option("message_count", "500").option("event_rate", "5000").load()
    val q = stream.writeStream.format("memory").queryName("impulse_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .start()
    val deadline = System.currentTimeMillis() + 60000
    while (System.currentTimeMillis() < deadline &&
      spark.table("impulse_stream").count() < 500) Thread.sleep(200)
    q.stop()
    val counters = spark.table("impulse_stream").select("counter")
      .collect().map(_.getLong(0)).sorted
    assert(counters.length == 500, s"got ${counters.length}")
    assert(counters.toSeq == (0L until 500L)) // exactly once, no gaps/dups
  }

  test("streaming SQL pipeline over the impulse GENERATOR flushes all windows (AvailableNow)") {
    // AvailableNow makes the full bounded range available immediately
    // (SupportsTriggerAvailableNow) and eod=true appends the EndOfData
    // sentinel — so the generator-backed streaming pipeline matches the
    // batch result exactly, final window included
    val script =
      """CREATE TABLE impulse_source (
        |  timestamp TIMESTAMP, counter BIGINT NOT NULL, subtask_index BIGINT NOT NULL
        |) WITH (connector = 'impulse', event_rate = '10', message_count = '600',
        |        type = 'source', event_time_field = 'timestamp');
        |CREATE TABLE sink WITH (connector = 'memory', type = 'sink');
        |INSERT INTO sink
        |SELECT window.start AS s, count(*) AS n
        |FROM impulse_source GROUP BY tumble(interval '10 seconds')""".stripMargin
    new graft.sql.Pipeline(spark, streaming = true).run(script)
    val got = spark.table("sink_result")
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    // 600 events at 10/s = 60 s of event time → six 10 s windows × 100
    assert(got.size == 6, s"expected all 6 windows (final one flushed), got $got")
    assert(got.values.forall(_ == 100L), s"got $got")
  }

  test("works as tumbling-window input end-to-end") {
    val df = spark.read.format("graft-impulse")
      .option("message_count", "600").option("event_rate", "10").load()
    // 600 events at 10/s = 60s → one event/second bucketed per 10s window
    val agg = graft.operators.TimeWindows.tumbleAgg(df, "timestamp", "10 seconds",
      Seq(), Seq(count(lit(1)).as("n")))
    val rows = agg.select("n").collect().map(_.getLong(0))
    assert(rows.length == 6 && rows.forall(_ == 100))
  }
}
