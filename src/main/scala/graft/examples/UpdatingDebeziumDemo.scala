package graft.examples

import graft.GraftSession
import graft.streaming.{Debezium, UpdatingAggregate}
import org.apache.spark.sql.functions._

/** Example: updating (retraction) aggregate → Debezium JSON sink.
  *
  * Replays the events table as a rate-limited file stream, maintains a
  * per-event-type running count/sum with retractions, and prints the
  * Debezium-encoded change stream — the reference engine's
  * `SELECT ... GROUP BY ...` into a `format = debezium_json` sink.
  *
  * Run: `runMain graft.examples.UpdatingDebeziumDemo` (or via java -cp).
  */
object UpdatingDebeziumDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("updating-debezium-demo")
    val src = java.nio.file.Files.createTempDirectory("upd-demo").toString
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    // two files → at least two micro-batches with maxFilesPerTrigger=1
    events.filter(col("event_id") % 2 === 0).write.parquet(s"$src/a.parquet")
    events.filter(col("event_id") % 2 === 1).write.parquet(s"$src/b.parquet")

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*")
    val updating = UpdatingAggregate.updatingAgg(stream, "event_type", "value")
    val dbz = updating.select(Debezium.roll(updating).as("value"))

    val q = dbz.writeStream.format("console")
      .option("truncate", "false").option("numRows", "50")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.stop()
  }
}
