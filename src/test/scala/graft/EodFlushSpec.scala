package graft

import org.apache.spark.sql.functions._

/** End-of-input watermark flush mechanics (Pipeline.eodField): documents
  * WHY the sentinel-drop filter needs a non-deterministic pushdown
  * barrier. Catalyst pushes deterministic predicates through
  * EventTimeWatermark into the scan; a user predicate evaluated below the
  * watermark node drops the sentinel (its payload fields are null) before
  * it can advance the watermark, and the final window never closes.
  */
class EodFlushSpec extends SparkSpec {
  import java.nio.file.Files

  private def fixture(): String = {
    val dir = Files.createTempDirectory("eod-flush")
    Files.write(dir.resolve("d.json"),
      ("{\"ts\":\"2024-01-01T00:00:00Z\",\"k\":\"a\"}\n" +
       "{\"ts\":\"9999-01-01T00:00:00Z\"}\n").getBytes)
    dir.toString
  }

  private def run(name: String)(
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Long = {
    val src = spark.readStream.schema("ts TIMESTAMP, k STRING").json(fixture())
      .withWatermark("ts", "1 second")
    val df = build(src)
      .groupBy(window(col("ts"), "1 minute"), col("k")).count()
    val q = df.writeStream.outputMode("append")
      .format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("eod-cp").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).count()
  }

  private val thr = to_timestamp(lit("9000-01-01T00:00:00Z"))

  test("sentinel flushes the final window when nothing filters below the watermark") {
    assert(run("eod_plain")(_.filter(col("ts") < thr)) == 1L)
  }

  test("a pushed-down user predicate kills the sentinel — flush lost (the hazard)") {
    // this is the failure mode the barrier exists for: k='a' is pushed
    // through EventTimeWatermark into the scan, the sentinel (k null)
    // dies below the watermark node, the window never closes
    assert(run("eod_pushed")(
      _.filter(col("ts") < thr).filter(col("k") === "a")) == 0L)
  }

  test("the non-deterministic barrier pins user predicates above the watermark") {
    val barrier = udf(() => true).asNondeterministic()
    assert(run("eod_barrier")(
      _.filter(col("ts") < thr && barrier()).filter(col("k") === "a")) == 1L)
  }
}
