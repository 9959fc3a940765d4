package graft.sources

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.util
import java.util.concurrent.CompletionStage
import scala.jdk.CollectionConverters._

/** Websocket source — Spark analogue of the reference's websocket connector
  * (crates/arroyo-connectors/src/websocket/mod.rs:160-299): connect to
  * `endpoint`, optionally send `subscription_message` / indexed
  * `subscription_messages.N` after the handshake, then surface every text
  * message. Same driver-buffered at-least-once model as the SSE source.
  *
  * `spark.readStream.format("graft-websocket").option("endpoint", "ws://…")`
  * → rows (value STRING, timestamp TIMESTAMP).
  */
class WebsocketSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-websocket"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = WebsocketTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WebsocketTable(properties.asScala.toMap)
}

object WebsocketTable {
  val schema: StructType = StructType(Seq(
    StructField("value", StringType), StructField("timestamp", TimestampType)))

  /** subscription_message plus subscription_messages.0, .1, … in order. */
  def subscriptionMessages(props: Map[String, String]): Seq[String] = {
    val single = props.get("subscription_message").toSeq
    require(single.isEmpty || !props.contains("subscription_messages.0"),
      "Cannot specify both 'subscription_message' and 'subscription_messages.0'")
    val indexed = Iterator.from(0)
      .map(i => props.get(s"subscription_messages.$i"))
      .takeWhile(_.isDefined).flatten.toSeq
    single ++ indexed
  }
}

class WebsocketTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"websocket(${HttpConf.endpoint(props)})"
  override def schema(): StructType = WebsocketTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = props ++ options.asScala
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = WebsocketTable.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new WebsocketMicroBatchStream(merged)
    }
  }
}

class WebsocketMicroBatchStream(props: Map[String, String]) extends PushMicroBatchStream {

  override protected def clientLoop(): Unit = {
    val client = HttpClient.newHttpClient()
    while (!Thread.currentThread().isInterrupted) {
      val closed = new java.util.concurrent.CountDownLatch(1)
      val listener = new WebSocket.Listener {
        private val partial = new StringBuilder
        override def onText(ws: WebSocket, data: CharSequence,
            last: Boolean): CompletionStage[_] = {
          partial.append(data)
          if (last) {
            buffer.append(new GenericInternalRow(Array[Any](
              UTF8String.fromString(partial.toString), HttpConf.nowMicros())))
            partial.clear()
          }
          ws.request(1)
          null
        }
        override def onClose(ws: WebSocket, statusCode: Int,
            reason: String): CompletionStage[_] = { closed.countDown(); null }
        override def onError(ws: WebSocket, error: Throwable): Unit = closed.countDown()
      }
      try {
        val b = client.newWebSocketBuilder()
        HttpConf.headers(props).foreach { case (k, v) => b.header(k, v) }
        val ws = b.buildAsync(URI.create(HttpConf.endpoint(props)), listener)
          .get(10, java.util.concurrent.TimeUnit.SECONDS)
        WebsocketTable.subscriptionMessages(props)
          .foreach(m => ws.sendText(m, true).get())
        closed.await() // messages flow via the listener until the peer closes
        try ws.abort() catch { case _: Exception => () }
        Thread.sleep(1000) // reconnect backoff
      } catch {
        case _: InterruptedException => return
        case _: Exception => Thread.sleep(1000)
      }
    }
  }
}
