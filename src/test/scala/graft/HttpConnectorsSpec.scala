package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.{CopyOnWriteArrayList, Executors}

/** End-to-end tests for the HTTP-family connectors (reference sse /
  * polling_http / webhook) against an in-JVM HTTP server.
  */
class HttpConnectorsSpec extends SparkSpec {

  private def withServer(f: (HttpServer, Int) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(Executors.newCachedThreadPool())
    server.start()
    try f(server, server.getAddress.getPort)
    finally server.stop(0)
  }

  private def awaitCount(expected: Long, timeoutMs: Long = 30000)(count: => Long): Long = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var c = count
    while (c < expected && System.currentTimeMillis() < deadline) { Thread.sleep(200); c = count }
    c
  }

  test("sse source: events parsed, filtered by type, ids tracked") {
    withServer { (server, port) =>
      server.createContext("/events", (x: HttpExchange) => {
        x.getResponseHeaders.set("Content-Type", "text/event-stream")
        x.sendResponseHeaders(200, 0)
        val out = x.getResponseBody
        val events =
          (1 to 5).map(i => s"id: $i\nevent: tick\ndata: {\"n\": $i}\n\n") :+
            "event: ignore-me\ndata: {\"n\": 99}\n\n" :+
            ": comment line\ndata: first\ndata: second\n\n"
        events.foreach { e => out.write(e.getBytes(UTF_8)); out.flush() }
        Thread.sleep(60000) // hold the connection open like a real SSE feed
      })
      val df = spark.readStream.format("graft-sse")
        .option("endpoint", s"http://127.0.0.1:$port/events")
        .option("events", "tick,message")
        .load()
      val q = df.writeStream.format("memory").queryName("sse_out")
        .trigger(Trigger.ProcessingTime(200)).start()
      try {
        // 5 ticks + the multi-line default-type event; ignore-me filtered out
        val n = awaitCount(6)(spark.table("sse_out").count())
        assert(n == 6)
        val rows = spark.table("sse_out").collect()
        assert(rows.count(_.getString(1) == "tick") == 5)
        val multi = rows.find(_.getString(1) == "message").get
        assert(multi.getString(0) == "first\nsecond")
        // last-seen id propagates to events that don't set one
        assert(multi.getString(2) == "5")
        // payloads decode downstream with from_json, kafka-envelope style
        val parsed = spark.table("sse_out").filter(col("event") === "tick")
          .select(get_json_object(col("value"), "$.n").cast("int").as("n"))
          .agg(sum("n")).collect()(0).getLong(0)
        assert(parsed == 15)
      } finally q.stop()
    }
  }

  test("polling_http source: emit_behavior=changed suppresses unchanged bodies") {
    withServer { (server, port) =>
      val hits = new AtomicInteger
      server.createContext("/poll", (x: HttpExchange) => {
        // body changes every second request → 'changed' emits every other poll
        val body = s"""{"v": ${hits.incrementAndGet() / 2}}"""
        val b = body.getBytes(UTF_8)
        x.sendResponseHeaders(200, b.length)
        x.getResponseBody.write(b)
        x.getResponseBody.close()
      })
      val df = spark.readStream.format("graft-polling-http")
        .option("endpoint", s"http://127.0.0.1:$port/poll")
        .option("poll_interval_ms", "100")
        .option("emit_behavior", "changed")
        .load()
      val q = df.writeStream.format("memory").queryName("poll_out")
        .trigger(Trigger.ProcessingTime(200)).start()
      try {
        // processAllAvailable would chase a forever-advancing source; wait
        // for a fixed prefix instead
        awaitCount(4)(spark.table("poll_out").count())
        val vals = spark.table("poll_out")
          .select(get_json_object(col("value"), "$.v").cast("int")).collect().map(_.getInt(0)).toSeq
        assert(vals.size >= 4)
        assert(vals == vals.distinct, s"changed-mode emitted duplicate bodies: $vals")
        assert(hits.get() > vals.size, "server saw more polls than emitted rows")
      } finally q.stop()
    }
  }

  test("webhook sink: batched JSON POSTs with retry on 5xx") {
    withServer { (server, port) =>
      val bodies = new CopyOnWriteArrayList[String]()
      val fails = new AtomicInteger(2) // first two requests 500 → retried
      server.createContext("/hook", (x: HttpExchange) => {
        val body = new String(x.getRequestBody.readAllBytes(), UTF_8)
        if (fails.getAndDecrement() > 0) x.sendResponseHeaders(500, -1)
        else { bodies.add(body); x.sendResponseHeaders(200, -1) }
        x.close()
      })
      val df = spark.range(10).select(col("id"), concat(lit("row-"), col("id")).as("tag"))
      graft.sinks.WebhookSink.writeBatch(df.coalesce(1), s"http://127.0.0.1:$port/hook",
        headers = Seq("X-Graft" -> "1"), rowsPerRequest = 4)
      val lines = bodies.toArray.map(_.toString).flatMap(_.split("\n"))
      assert(lines.length == 10)
      assert(lines.forall(l => l.startsWith("{\"id\":")))
      assert(bodies.toArray.map(_.toString).forall(_.nonEmpty))
    }
  }

  test("sse + webhook through the SQL front-end (DDL connector wiring)") {
    withServer { (server, port) =>
      server.createContext("/feed", (x: HttpExchange) => {
        x.getResponseHeaders.set("Content-Type", "text/event-stream")
        x.sendResponseHeaders(200, 0)
        val out = x.getResponseBody
        (1 to 8).foreach { i =>
          out.write(s"data: {\"k\": \"u${i % 2}\", \"amount\": $i}\n\n".getBytes(UTF_8))
          out.flush()
        }
        Thread.sleep(60000)
      })
      val received = new CopyOnWriteArrayList[String]()
      server.createContext("/sink", (x: HttpExchange) => {
        received.add(new String(x.getRequestBody.readAllBytes(), UTF_8))
        x.sendResponseHeaders(200, -1); x.close()
      })
      val p = new graft.sql.Pipeline(spark, streaming = true)
      p.runStatement(graft.sql.Ddl.parse(
        s"CREATE TABLE feed (value TEXT, event TEXT, id TEXT, timestamp TIMESTAMP) " +
          s"WITH (connector='sse', endpoint='http://127.0.0.1:$port/feed', type='source')"))
      spark.sql(
        """SELECT get_json_object(value, '$.k') AS k,
          |       CAST(get_json_object(value, '$.amount') AS BIGINT) AS amount
          |FROM feed""".stripMargin).createOrReplaceTempView("feed_parsed")
      val q = spark.table("feed_parsed").writeStream.format("memory").queryName("sql_sse_out")
        .trigger(Trigger.ProcessingTime(200)).start()
      try {
        val n = awaitCount(8)(spark.table("sql_sse_out").count())
        assert(n == 8)
        graft.sinks.WebhookSink.writeBatch(
          spark.table("sql_sse_out").groupBy("k").agg(sum("amount").as("total")),
          s"http://127.0.0.1:$port/sink")
        val posted = received.toArray.map(_.toString).flatMap(_.split("\n")).sorted
        assert(posted.length == 2)
        assert(posted.forall(_.contains("total")))
      } finally q.stop()
    }
  }
}
