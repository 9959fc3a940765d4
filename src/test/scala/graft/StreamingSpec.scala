package graft

import graft.operators.TimeWindows
import graft.streaming.{Debezium, UpdatingAggregate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Streaming-semantics parity: the same DataFrame programs the batch
  * inventory runs must produce identical results when executed as
  * Structured Streaming micro-batches with watermarks (the reference is a
  * pure streaming engine; batch is our oracle mode).
  */
class StreamingSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-stream").toString

  private def eventsStreamDF = {
    // file-source replay of the events table (copy parquet into a dir first)
    val src = tmp()
    Tables.load(spark, sfDir, "events").write.mode("overwrite").parquet(src)
    val schema = Tables.load(spark, sfDir, "events").schema
    spark.readStream.schema(schema).parquet(src)
  }

  test("streaming tumble aggregate equals batch result (availableNow, append mode)") {
    val stream = eventsStreamDF.withWatermark("ts", "1 second")
    val agg = TimeWindows.tumbleAgg(stream, "ts", "1 hour",
      Seq(col("event_type")), Seq(count(lit(1)).as("n")))
    val out = tmp()
    val q = agg.writeStream
      .format("memory").queryName("tumble_stream")
      .outputMode("append")
      .option("checkpointLocation", s"$out/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("tumble_stream")
      .select("window_start", "window_end", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getString(2), r.getLong(3))).toSet
    val batch = TimeWindows.tumbleAgg(Tables.load(spark, sfDir, "events"), "ts", "1 hour",
        Seq(col("event_type")), Seq(count(lit(1)).as("n")))
      .select("window_start", "window_end", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getString(2), r.getLong(3))).toSet
    // append mode emits exactly the closed windows: every emitted window
    // matches batch, and the only batch windows missing are those still
    // open at the final watermark (max event time - 1s delay)
    assert(streamed.subsetOf(batch), s"streamed rows disagree with batch: ${streamed.diff(batch).take(5)}")
    val maxTs = Tables.load(spark, sfDir, "events").agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val missing = batch.diff(streamed)
    assert(missing.nonEmpty && missing.forall(_._2.getTime > maxTs.getTime - 1000),
      s"closed windows missing from stream: ${missing.filter(_._2.getTime <= maxTs.getTime - 1000).take(5)}")
  }

  test("streaming session windows equal batch result") {
    val stream = eventsStreamDF.withWatermark("ts", "1 second")
    val agg = TimeWindows.sessionAgg(stream, "ts", "10 minutes",
      Seq(col("user_id")), Seq(count(lit(1)).as("n")))
    val out = tmp()
    val q = agg.writeStream.format("memory").queryName("session_stream")
      .outputMode("append")
      .option("checkpointLocation", s"$out/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val streamed = spark.table("session_stream")
      .select("window_start", "window_end", "user_id", "n")
      .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getLong(3))).toSet
    val batch = TimeWindows.sessionAgg(Tables.load(spark, sfDir, "events"), "ts", "10 minutes",
        Seq(col("user_id")), Seq(count(lit(1)).as("n")))
      .select("window_start", "window_end", "user_id", "n")
      .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed.subsetOf(batch), s"streamed rows disagree with batch: ${streamed.diff(batch).take(5)}")
    val maxTs = Tables.load(spark, sfDir, "events").agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val missing = batch.diff(streamed)
    assert(missing.forall(_._2.getTime > maxTs.getTime - 1000),
      s"closed sessions missing from stream: ${missing.filter(_._2.getTime <= maxTs.getTime - 1000).take(5)}")
  }

  test("updating aggregate emits retract+append pairs across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Double)]
    val updates = UpdatingAggregate.updatingAgg(
      input.toDF().toDF("k", "v"), "k", "v")
    val q = updates.writeStream.format("memory").queryName("upd_stream")
      .outputMode("update").start()

    input.addData(("a", 1.0), ("a", 2.0), ("b", 5.0))
    q.processAllAvailable()
    val batch1 = spark.table("upd_stream")
      .select(col("key"), col("n"), col("sum"), col("_updating_meta.is_retract"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
    // first batch: appends only, no retractions
    assert(batch1 == Set(("a", 2L, 3.0, false), ("b", 1L, 5.0, false)))

    input.addData(("a", 4.0))
    q.processAllAvailable()
    val all = spark.table("upd_stream")
      .select(col("key"), col("n"), col("sum"), col("_updating_meta.is_retract"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
    // second batch must retract (a,2,3.0) and append (a,3,7.0)
    assert(all.contains(("a", 2L, 3.0, true)), s"missing retraction in $all")
    assert(all.contains(("a", 3L, 7.0, false)), s"missing new value in $all")
    q.stop()
  }

  test("debezium roll/unroll round-trips appends and retracts") {
    import spark.implicits._
    val payload = StructType(Seq(
      StructField("key", StringType), StructField("n", LongType)))
    val updating = Seq(
      ("a", 10L, false),
      ("a", 9L, true)
    ).toDF("key", "n", "is_retract")
      .select(col("key"), col("n"),
        struct(col("is_retract"), lit("x").as("id")).as("_updating_meta"))
    val json = updating.select(Debezium.roll(updating).as("value"))
    val back = Debezium.unroll(json, "value", payload)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getStruct(2).getBoolean(0))).toSet
    assert(back == Set(("a", 10L, false), ("a", 9L, true)))
  }

  test("stream-stream interval join (JoinWithExpiration semantics) matches batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val left = MemoryStream[(Long, Timestamp)]
    val right = MemoryStream[(Long, Timestamp)]
    val l = left.toDF().toDF("uid", "sg_ts").withWatermark("sg_ts", "1 second")
    val r = right.toDF().toDF("p_uid", "pu_ts").withWatermark("pu_ts", "1 second")
    val joined = l.join(r,
      col("uid") === col("p_uid") &&
        col("pu_ts") >= col("sg_ts") &&
        col("pu_ts") < col("sg_ts") + org.apache.spark.sql.functions.expr("INTERVAL 30 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()

    left.addData((1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 10:05:00")))
    right.addData((1L, t("2024-01-01 10:10:00")))   // in range for uid 1
    q.processAllAvailable()
    right.addData((2L, t("2024-01-01 11:05:00")))   // out of range for uid 2
    right.addData((1L, t("2024-01-01 10:29:00")))   // second match for uid 1
    q.processAllAvailable()

    val got = spark.table("ssj")
      .select("uid", "pu_ts")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString)).toSet
    assert(got == Set(
      (1L, "2024-01-01 10:10:00.0"),
      (1L, "2024-01-01 10:29:00.0")), s"got $got")
    q.stop()
  }

  test("late rows beyond the watermark are dropped in streaming aggregation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)]
    val agg = TimeWindows.tumbleAgg(
      input.toDF().toDF("ts", "k").withWatermark("ts", "10 minutes"),
      "ts", "1 hour", Seq(col("k")), Seq(count(lit(1)).as("n")))
    val q = agg.writeStream.format("memory").queryName("late_stream")
      .outputMode("append").start()

    def t(s: String) = Timestamp.valueOf(s)
    input.addData((t("2024-01-01 10:30:00"), "x"))
    q.processAllAvailable()
    input.addData((t("2024-01-01 13:00:00"), "x")) // advances watermark to 12:50
    q.processAllAvailable()
    input.addData((t("2024-01-01 10:45:00"), "x")) // late: window 10:00 closed
    q.processAllAvailable()
    input.addData((t("2024-01-01 15:00:00"), "x")) // close remaining windows
    q.processAllAvailable()

    val rows = spark.table("late_stream")
      .select(col("window_start"), col("n"))
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    // the late 10:45 row must NOT be counted: 10:00 window closed with n=1
    assert(rows.get("2024-01-01 10:00:00.0").contains(1L), s"got $rows")
    q.stop()
  }
  test("text scalar surface is streaming-stateless: normalize/quality/url/bpe match batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.{Bpe, TextAnalysis, Urls}
    val rows = Seq(
      (1L, "  caf\u00e9  NOISY\ttext  ", "https://www.A.Example.com/x/?b=2&a=1&utm_source=s"),
      (2L, "plain words here", "http://a.example.com/x?a=1&b=2"),
      (3L, "hug pug pun hugs", "https://b.example.com/y"))
    val merges = Bpe.trainDriver(Seq("hug" -> 10L, "pug" -> 5L, "pun" -> 12L), 3)
    def shape(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      Bpe.encode(df, "text", merges)
        .select(col("id"),
          TextAnalysis.normalizeText(col("text")).as("norm"),
          TextAnalysis.qualityScore(col("text")).as("q"),
          Urls.normalize(col("url")).as("u"),
          col("n_bpe_tokens"))
    val batch = shape(rows.toDF("id", "text", "url")).collect().map(_.toSeq).toSet

    val input = MemoryStream[(Long, String, String)]
    val q = shape(input.toDF().toDF("id", "text", "url"))
      .writeStream.format("memory").queryName("scalar_stream")
      .outputMode("append").start()
    input.addData(rows.head)
    q.processAllAvailable()
    input.addData(rows.tail: _*)
    q.processAllAvailable()
    val streamed = spark.table("scalar_stream").collect().map(_.toSeq).toSet
    assert(streamed == batch, s"stream $streamed != batch $batch")
    q.stop()
  }
}
