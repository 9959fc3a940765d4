package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.io.{InputStream, OutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64
import java.util.concurrent.CopyOnWriteArrayList

/** Drives the websocket source against a minimal in-JVM RFC6455 server
  * (handshake + unmasked server frames; enough for the JDK client).
  */
class WebsocketSourceSpec extends SparkSpec {

  /** Accept one connection: handshake, read one (masked) client text frame
    * as the subscription, then emit messages and hold the socket open.
    */
  private def serveOnce(server: ServerSocket, messages: String => Seq[String],
      subs: CopyOnWriteArrayList[String]): Thread = {
    val t = new Thread(() => {
      try {
        val sock = server.accept()
        val in = sock.getInputStream
        val out = sock.getOutputStream
        handshake(in, out)
        val sub = readClientTextFrame(in)
        subs.add(sub)
        messages(sub).foreach(m => writeTextFrame(out, m))
        Thread.sleep(60000) // keep open; test stops the query first
      } catch { case _: Exception => () }
    })
    t.setDaemon(true)
    t.start()
    t
  }

  private def handshake(in: InputStream, out: OutputStream): Unit = {
    val req = new StringBuilder
    var prev = 0
    while (!req.endsWith("\r\n\r\n")) {
      val c = in.read(); require(c >= 0, "eof in handshake"); req.append(c.toChar); prev = c
    }
    val key = req.toString.linesIterator
      .find(_.toLowerCase.startsWith("sec-websocket-key:")).get.split(":", 2)(1).trim
    val accept = Base64.getEncoder.encodeToString(MessageDigest.getInstance("SHA-1")
      .digest((key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8)))
    out.write(("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
      s"Connection: Upgrade\r\nSec-WebSocket-Accept: $accept\r\n\r\n").getBytes(UTF_8))
    out.flush()
  }

  private def readClientTextFrame(in: InputStream): String = {
    val b0 = in.read(); val b1 = in.read()
    require((b0 & 0x0f) == 1 && (b1 & 0x80) != 0, "expected masked text frame")
    var len = b1 & 0x7f
    if (len == 126) len = (in.read() << 8) | in.read()
    val mask = Array.fill(4)(in.read().toByte)
    val payload = new Array[Byte](len)
    var off = 0
    while (off < len) { val n = in.read(payload, off, len - off); require(n > 0); off += n }
    payload.indices.foreach(i => payload(i) = (payload(i) ^ mask(i % 4)).toByte)
    new String(payload, UTF_8)
  }

  private def writeTextFrame(out: OutputStream, msg: String): Unit = {
    val p = msg.getBytes(UTF_8)
    require(p.length < 126)
    out.write(Array(0x81.toByte, p.length.toByte)); out.write(p); out.flush()
  }

  test("websocket source: subscription message sent, text messages surfaced") {
    val server = new ServerSocket(0)
    val subs = new CopyOnWriteArrayList[String]()
    serveOnce(server, _ => (1 to 7).map(i => s"""{"seq": $i}"""), subs)
    try {
      val df = spark.readStream.format("graft-websocket")
        .option("endpoint", s"ws://127.0.0.1:${server.getLocalPort}/")
        .option("subscription_message", """{"subscribe": "trades"}""")
        .load()
      val q = df.writeStream.format("memory").queryName("ws_out")
        .trigger(Trigger.ProcessingTime(200)).start()
      try {
        val deadline = System.currentTimeMillis() + 30000
        while (spark.table("ws_out").count() < 7 && System.currentTimeMillis() < deadline)
          Thread.sleep(200)
        assert(spark.table("ws_out").count() == 7)
        assert(subs.size() == 1 && subs.get(0) == """{"subscribe": "trades"}""")
        val seqs = spark.table("ws_out")
          .select(get_json_object(col("value"), "$.seq").cast("int").as("s"))
          .collect().map(_.getInt(0)).sorted.toSeq
        assert(seqs == (1 to 7))
      } finally q.stop()
    } finally server.close()
  }

  test("subscription_messages.N ordering and exclusivity") {
    assert(graft.sources.WebsocketTable.subscriptionMessages(Map(
      "subscription_messages.0" -> "a", "subscription_messages.1" -> "b")) == Seq("a", "b"))
    assert(graft.sources.WebsocketTable.subscriptionMessages(
      Map("subscription_message" -> "x")) == Seq("x"))
    intercept[IllegalArgumentException] {
      graft.sources.WebsocketTable.subscriptionMessages(Map(
        "subscription_message" -> "x", "subscription_messages.0" -> "a"))
    }
  }
}
