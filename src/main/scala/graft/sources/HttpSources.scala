package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util
import scala.jdk.CollectionConverters._

/** Push-style HTTP sources, the Spark analogues of the reference's
  * sse / polling_http connectors (crates/arroyo-connectors/src/sse/,
  * crates/arroyo-connectors/src/polling_http/).
  *
  * These feeds are not replayable, so (like Spark's own socket source) a
  * driver-side client thread accumulates events into an in-memory buffer;
  * offsets are monotone positions into that buffer and micro-batch
  * partitions carry the sliced rows. Semantics are at-least-once across
  * restarts (the reference checkpoints only the SSE `last_id`,
  * sse/operator.rs:22-25 — the same weak guarantee).
  *
  * Format decoding (json etc.) happens downstream with `from_json`, exactly
  * as the DDL front-end does for kafka-style envelope sources.
  */
private[sources] class PushBuffer {
  private val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
  private var base = 0L
  @volatile var error: Option[Throwable] = None

  def append(r: InternalRow): Unit = synchronized { rows += r }
  def latest: Long = synchronized { base + rows.size }
  def slice(from: Long, until: Long): Array[InternalRow] = synchronized {
    val lo = math.max(0L, from - base).toInt
    val hi = math.min(rows.size.toLong, math.max(0L, until - base)).toInt
    if (lo >= hi) Array.empty else rows.slice(lo, hi).toArray
  }
  def prune(upTo: Long): Unit = synchronized {
    val d = math.min(math.max(0L, upTo - base), rows.size.toLong).toInt
    if (d > 0) { rows.remove(0, d); base += d }
  }
  /** Restart-from-checkpoint: committed offset beyond our (empty) buffer —
    * skip forward rather than replay rows we no longer have.
    */
  def fastForward(pos: Long): Unit = synchronized {
    if (rows.isEmpty && pos > base) base = pos
  }
}

private[sources] case class PushedRows(rows: Array[InternalRow]) extends InputPartition

private[sources] object PushedRowsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rs = partition.asInstanceOf[PushedRows].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rs.length }
      override def get(): InternalRow = rs(i)
      override def close(): Unit = ()
    }
  }
}

case class PushOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

/** Shared MicroBatchStream over a PushBuffer fed by a client thread. */
private[sources] abstract class PushMicroBatchStream extends MicroBatchStream {
  protected val buffer = new PushBuffer
  /** Long-running client loop; runs on a daemon thread until interrupt. */
  protected def clientLoop(): Unit
  @volatile private var started: Thread = _

  private def ensureStarted(): Unit = synchronized {
    if (started == null) {
      started = new Thread(() => try clientLoop() catch {
        case _: InterruptedException => ()
        case e: Throwable => buffer.error = Some(e)
      }, s"graft-${getClass.getSimpleName}")
      started.setDaemon(true)
      started.start()
    }
  }

  override def initialOffset(): Offset = PushOffset(0L)
  override def latestOffset(): Offset = {
    ensureStarted()
    buffer.error.foreach(e => throw new RuntimeException(s"${getClass.getSimpleName} client failed", e))
    PushOffset(buffer.latest)
  }
  override def deserializeOffset(json: String): Offset = {
    val pos = json.toLong
    buffer.fastForward(pos)
    PushOffset(pos)
  }
  override def commit(end: Offset): Unit = buffer.prune(end.asInstanceOf[PushOffset].pos)
  override def stop(): Unit = synchronized { if (started != null) started.interrupt() }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val rs = buffer.slice(start.asInstanceOf[PushOffset].pos, end.asInstanceOf[PushOffset].pos)
    if (rs.isEmpty) Array.empty else Array(PushedRows(rs))
  }
  override def createReaderFactory(): PartitionReaderFactory = PushedRowsReaderFactory
}

object HttpConf {
  def endpoint(p: Map[String, String]): String =
    p.getOrElse("endpoint", sys.error("option 'endpoint' is required"))
  /** "k1:v1,k2:v2" header map — the reference's string_to_map(headers, ':'). */
  def headers(p: Map[String, String]): Seq[(String, String)] =
    p.get("headers").toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).map { h =>
      val i = h.indexOf(':')
      require(i > 0, s"invalid header '$h'; expected 'Name: value'")
      (h.substring(0, i).trim, h.substring(i + 1).trim)
    }
  def nowMicros(): Long = System.currentTimeMillis() * 1000L
}

// ─── SSE ───────────────────────────────────────────────────────────────────

/** `spark.readStream.format("graft-sse").option("endpoint", url)` — options
  * `events` (comma-separated event-type filter) and `headers`, mirroring
  * sse/mod.rs:127-141. Output: (value, event, id, timestamp).
  */
class SseSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-sse"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SseTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SseTable(properties.asScala.toMap)
}

object SseTable {
  val schema: StructType = StructType(Seq(
    StructField("value", StringType), StructField("event", StringType),
    StructField("id", StringType), StructField("timestamp", TimestampType)))
}

class SseTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"sse(${HttpConf.endpoint(props)})"
  override def schema(): StructType = SseTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = props ++ options.asScala
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = SseTable.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new SseMicroBatchStream(merged)
    }
  }
}

class SseMicroBatchStream(props: Map[String, String]) extends PushMicroBatchStream {
  private val wanted: Set[String] =
    props.get("events").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).getOrElse(Set.empty)
  @volatile private var lastId: String = _

  override protected def clientLoop(): Unit = {
    val client = HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(5)).build()
    while (!Thread.currentThread().isInterrupted) {
      try {
        val b = HttpRequest.newBuilder(URI.create(HttpConf.endpoint(props)))
          .header("Accept", "text/event-stream")
        HttpConf.headers(props).foreach { case (k, v) => b.header(k, v) }
        if (lastId != null) b.header("Last-Event-ID", lastId)
        val resp = client.send(b.GET().build(), HttpResponse.BodyHandlers.ofInputStream())
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(resp.body(), java.nio.charset.StandardCharsets.UTF_8))
        consume(reader)
      } catch {
        case _: InterruptedException => return
        case _: java.io.InterruptedIOException => return
        case _: Exception => Thread.sleep(1000) // reconnect with backoff
      }
    }
  }

  /** text/event-stream framing: `field: value` lines, blank line dispatches;
    * `data:` accumulates multi-line, `:`-prefixed lines are comments.
    */
  private def consume(reader: java.io.BufferedReader): Unit = {
    var data = List.empty[String]
    var event: String = null
    var id: String = lastId
    var line = reader.readLine()
    while (line != null) {
      if (line.isEmpty) {
        if (data.nonEmpty) {
          if (wanted.isEmpty || wanted.contains(if (event == null) "message" else event)) {
            buffer.append(new GenericInternalRow(Array[Any](
              UTF8String.fromString(data.reverse.mkString("\n")),
              UTF8String.fromString(if (event == null) "message" else event),
              if (id == null) null else UTF8String.fromString(id),
              HttpConf.nowMicros())))
          }
          lastId = id
        }
        data = Nil; event = null
      } else if (!line.startsWith(":")) {
        val i = line.indexOf(':')
        val (field, value) =
          if (i < 0) (line, "")
          else (line.substring(0, i), line.substring(i + 1).stripPrefix(" "))
        field match {
          case "data" => data ::= value
          case "event" => event = value
          case "id" => id = value
          case _ => () // retry + unknown fields ignored
        }
      }
      line = reader.readLine()
    }
  }
}

// ─── Polling HTTP ──────────────────────────────────────────────────────────

/** `spark.readStream.format("graft-polling-http").option("endpoint", url)` —
  * options `method` (GET/POST), `body`, `poll_interval_ms` (default 1000,
  * polling_http/mod.rs:26), `emit_behavior` (`all` | `changed`,
  * polling_http/operator.rs:191), `headers`. Output: (value, timestamp).
  */
class PollingHttpSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-polling-http"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = PollingHttpTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PollingHttpTable(properties.asScala.toMap)
}

object PollingHttpTable {
  val schema: StructType = StructType(Seq(
    StructField("value", StringType), StructField("timestamp", TimestampType)))
}

class PollingHttpTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"polling_http(${HttpConf.endpoint(props)})"
  override def schema(): StructType = PollingHttpTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = props ++ options.asScala
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = PollingHttpTable.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new PollingHttpMicroBatchStream(merged)
    }
  }
}

class PollingHttpMicroBatchStream(props: Map[String, String]) extends PushMicroBatchStream {
  private val intervalMs = props.getOrElse("poll_interval_ms", "1000").toLong
  private val emitChanged = props.getOrElse("emit_behavior", "all").toLowerCase == "changed"

  override protected def clientLoop(): Unit = {
    val client = HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(5)).build()
    var last: String = null
    while (!Thread.currentThread().isInterrupted) {
      val b = HttpRequest.newBuilder(URI.create(HttpConf.endpoint(props)))
        .timeout(Duration.ofSeconds(5)) // reference: 5 s request timeout, mod.rs:269
      HttpConf.headers(props).foreach { case (k, v) => b.header(k, v) }
      val req = props.getOrElse("method", "GET").toUpperCase match {
        case "GET" => b.GET().build()
        case "POST" => b.POST(
          HttpRequest.BodyPublishers.ofString(props.getOrElse("body", ""))).build()
        case m => sys.error(s"unsupported method $m (reference supports GET/POST)")
      }
      try {
        val body = client.send(req, HttpResponse.BodyHandlers.ofString()).body()
        if (!(emitChanged && body == last)) {
          buffer.append(new GenericInternalRow(Array[Any](
            UTF8String.fromString(body), HttpConf.nowMicros())))
          last = body
        }
      } catch {
        case _: InterruptedException => return
        case _: java.io.InterruptedIOException => return
        case _: Exception => () // poll again next tick
      }
      Thread.sleep(intervalMs)
    }
  }
}
