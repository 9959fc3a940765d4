package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import scala.jdk.CollectionConverters._

/** Custom DataSource V2 implementation of the reference's `impulse`
  * connector (crates/arroyo-connectors/src/impulse/mod.rs:102-122): a
  * synthetic counter source emitting `(timestamp, counter, subtask_index)`
  * at `event_rate` events/sec, optionally bounded by `message_count`, with
  * event timestamps spaced by 1/event_rate from `start_ts`.
  *
  * This is the template for the reference's other custom sources
  * (SSE/websocket/polling-http): TableProvider → ScanBuilder → Batch +
  * MicroBatchStream; offsets are plain counter positions, so restarts
  * resume exactly (checkpointed offsets = emitted count).
  *
  * Usage: `spark.read.format("graft-impulse").option("message_count", n)…`
  * or `spark.readStream.format("graft-impulse")…`.
  */
class ImpulseSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-impulse"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = ImpulseTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ImpulseTable(properties.asScala.toMap)
}

object ImpulseTable {
  val schema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType, nullable = false),
    StructField("counter", LongType, nullable = false),
    StructField("subtask_index", LongType, nullable = false)))

  val DefaultStartMicros: Long = 1704067200000000L // 2024-01-01T00:00:00Z
}

class ImpulseTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "impulse"
  override def schema(): StructType = ImpulseTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = props ++ options.asScala
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = ImpulseTable.schema
      override def toBatch: Batch = new ImpulseBatch(merged)
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ImpulseMicroBatchStream(merged)
    }
  }
}

private object ImpulseConf {
  def rate(p: Map[String, String]): Double = p.getOrElse("event_rate", "1000").toDouble
  def count(p: Map[String, String]): Long = p.getOrElse("message_count", "1000").toLong
  def startMicros(p: Map[String, String]): Long =
    p.get("start_ts").map(java.sql.Timestamp.valueOf(_).getTime * 1000L)
      .getOrElse(ImpulseTable.DefaultStartMicros)
  def parallelism(p: Map[String, String]): Int = p.getOrElse("parallelism", "4").toInt
  /** `eod=true`: after the bounded counter range, emit ONE sentinel row at
    * a far-future event time — the stream-level analogue of the
    * reference's EndOfData, so the consumer's watermark passes every open
    * window (the SQL pipeline filters the sentinel right above its
    * watermark node).
    */
  def eod(p: Map[String, String]): Boolean = p.get("eod").contains("true")
  /** Offset horizon: counter range plus the optional sentinel slot. */
  def totalEnd(p: Map[String, String]): Long = count(p) + (if (eod(p)) 1L else 0L)

  val EodMicros: Long = 253370764800000000L // 9999-01-01T00:00:00Z
}

/** One counter range assigned to one task (= one reference subtask).
  * `eodAt` marks the counter index that emits the end-of-data sentinel
  * (-1 = none in this range).
  */
case class ImpulseRange(start: Long, end: Long, subtask: Long,
    rate: Double, startMicros: Long, eodAt: Long = -1L) extends InputPartition

class ImpulseBatch(props: Map[String, String]) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    ImpulseSplits.split(0L, ImpulseConf.count(props), props)
  override def createReaderFactory(): PartitionReaderFactory = ImpulseReaderFactory
}

object ImpulseSplits {
  def split(start: Long, end: Long, props: Map[String, String]): Array[InputPartition] = {
    val n = math.max(1, ImpulseConf.parallelism(props))
    val total = math.max(0L, end - start)
    val step = math.max(1L, (total + n - 1) / n)
    val eodAt = if (ImpulseConf.eod(props)) ImpulseConf.count(props) else -1L
    (0 until n).iterator
      .map(i => (start + i * step, math.min(end, start + (i + 1) * step), i.toLong))
      .filter { case (s, e, _) => s < e }
      .map { case (s, e, i) =>
        ImpulseRange(s, e, i, ImpulseConf.rate(props), ImpulseConf.startMicros(props), eodAt) }
      .toArray
  }
}

object ImpulseReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[ImpulseRange]
    new PartitionReader[InternalRow] {
      private var i = r.start - 1
      override def next(): Boolean = { i += 1; i < r.end }
      override def get(): InternalRow = {
        if (i == r.eodAt) InternalRow(ImpulseConf.EodMicros, i, r.subtask)
        else {
          val micros = r.startMicros + (i * 1000000.0 / r.rate).toLong
          InternalRow(micros, i, r.subtask)
        }
      }
      override def close(): Unit = ()
    }
  }
}

/** Counter-position offset (JSON = the count emitted so far). */
case class ImpulseOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

/** Micro-batch stream: the available offset advances with wall-clock ×
  * event_rate, capped at message_count (a bounded impulse ends — the
  * reference's bounded sources emit EndOfData the same way). Under
  * Trigger.AvailableNow the full bounded range (sentinel included when
  * `eod=true`) is available immediately: the event RATE spaces event
  * time, it is not a wall-clock delivery contract for a bounded run —
  * matching the reference's smoke tests, which drain bounded impulse
  * sources without real-time pacing.
  */
class ImpulseMicroBatchStream(props: Map[String, String]) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  private val startWall = System.currentTimeMillis()
  @volatile private var availableNow = false
  override def prepareForTriggerAvailableNow(): Unit = availableNow = true
  // SupportsAdmissionControl variant: impulse ignores read limits (a
  // bounded counter range is already its own admission control)
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()
  override def initialOffset(): Offset = ImpulseOffset(0L)
  override def latestOffset(): Offset = {
    if (availableNow) ImpulseOffset(ImpulseConf.totalEnd(props))
    else {
      val elapsed = (System.currentTimeMillis() - startWall) / 1000.0
      val available = (elapsed * ImpulseConf.rate(props)).toLong
      // the sentinel becomes available only once the whole range has
      val capped = math.min(ImpulseConf.count(props), available)
      ImpulseOffset(
        if (capped == ImpulseConf.count(props)) ImpulseConf.totalEnd(props) else capped)
    }
  }
  override def deserializeOffset(json: String): Offset = ImpulseOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    ImpulseSplits.split(start.asInstanceOf[ImpulseOffset].pos,
      end.asInstanceOf[ImpulseOffset].pos, props)
  override def createReaderFactory(): PartitionReaderFactory = ImpulseReaderFactory
}
