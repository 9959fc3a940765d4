package graft

import org.apache.spark.sql.functions._

class NexmarkSourceSpec extends SparkSpec {

  test("batch read: three-entity event stream with 1:3:46 mix, one branch per row") {
    val df = spark.read.format("graft-nexmark")
      .option("message_count", "5000").option("event_rate", "1000")
      .option("parallelism", "8").load()
    assert(df.schema.fieldNames.toSeq == Seq("person", "auction", "bid"))
    assert(df.count() == 5000)
    val counts = df.agg(
      count(col("person")).as("p"),
      count(col("auction")).as("a"),
      count(col("bid")).as("b"),
      count(when(col("person").isNotNull && col("auction").isNotNull, 1)).as("overlap"))
      .collect()(0)
    assert(counts.getLong(0) == 100)   // 5000/50 persons
    assert(counts.getLong(1) == 300)   // 3 per 50
    assert(counts.getLong(2) == 4600)  // 46 per 50
    assert(counts.getLong(3) == 0)     // exactly one branch populated
  }

  test("deterministic across parallelism and runs") {
    def load(par: Int) = spark.read.format("graft-nexmark")
      .option("message_count", "1000").option("parallelism", par.toString).load()
      .filter(col("bid").isNotNull)
      .select(col("bid.auction"), col("bid.price"), col("bid.datetime"))
      .collect().map(_.toString).sorted.toSeq
    assert(load(2) == load(8))
  }

  test("nexmark q5-style query over the event stream (bids branch)") {
    val events = spark.read.format("graft-nexmark")
      .option("message_count", "20000").load()
    val bids = events.filter(col("bid").isNotNull).select("bid.*")
    val agg = graft.operators.TimeWindows.hopAgg(bids, "datetime", "10 seconds", "2 seconds",
      Seq(col("auction")), Seq(count(lit(1)).as("n")))
    assert(agg.count() > 0)
    val total = agg.agg(sum("n")).collect()(0).getLong(0)
    assert(total == bids.count() * 5) // width/slide = 5 windows per bid
  }
}
