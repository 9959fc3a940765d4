package graft.sinks

import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, Dataset}

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Webhook sink — HTTP POST of serialized rows, the Spark analogue of the
  * reference's webhook connector (crates/arroyo-connectors/src/webhook/
  * operator.rs:41-115): JSON-serialized payloads POSTed with retries and
  * exponential backoff (50ms·2ⁿ capped at 5s, operator.rs:109-110).
  *
  * Posting happens per-partition on the executors (no driver collect);
  * `rowsPerRequest` batches rows into newline-delimited JSON bodies
  * (1 = the reference's one-POST-per-row behavior). Delivery is
  * at-least-once, same as the reference (no 2PC on webhooks).
  */
object WebhookSink {

  def post(client: HttpClient, endpoint: String, headers: Seq[(String, String)],
      body: String, maxRetries: Int = 10): Unit = {
    var retries = 0
    var done = false
    while (!done) {
      val b = HttpRequest.newBuilder(URI.create(endpoint))
        .timeout(Duration.ofSeconds(5))
        .header("Content-Type", "application/json")
      headers.foreach { case (k, v) => b.header(k, v) }
      val ok =
        try client.send(b.POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.discarding()).statusCode() / 100 == 2
        catch { case _: java.io.IOException => false }
      if (ok) done = true
      else {
        retries += 1
        if (retries > maxRetries) sys.error(s"webhook POST to $endpoint failed after $maxRetries retries")
        Thread.sleep(math.min(50L << math.min(retries, 7), 5000L))
      }
    }
  }

  /** Batch write: each partition serializes its rows to JSON and POSTs in
    * chunks of `rowsPerRequest`.
    */
  def writeBatch(df: DataFrame, endpoint: String,
      headers: Seq[(String, String)] = Nil, rowsPerRequest: Int = 512): Unit = {
    val json: Dataset[String] = df.toJSON
    json.foreachPartition { (it: Iterator[String]) =>
      if (it.hasNext) {
        val client = HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(5)).build()
        it.grouped(rowsPerRequest).foreach(chunk =>
          post(client, endpoint, headers, chunk.mkString("\n")))
      }
    }
  }

  /** Streaming write via foreachBatch (the SURVEY §2.2 mapping for webhook). */
  def writeStream(df: DataFrame, endpoint: String, checkpoint: String,
      headers: Seq[(String, String)] = Nil, rowsPerRequest: Int = 512): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        writeBatch(batch.toDF(), endpoint, headers, rowsPerRequest))
      .start()
}
