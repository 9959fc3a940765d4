package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** In-process message broker behind the messaging connector family
  * (kinesis / fluvio / nats / mqtt / rabbitmq — reference registry
  * crates/arroyo-connectors/src/lib.rs:44-56). All five reference
  * connectors share one shape: an ordered topic/stream/subject of
  * (key, value) byte messages, decoded by the table's declared format.
  * The broker registry plays the server role so pipelines run end-to-end
  * broker-free (the kafka-decode spec pattern); a real deployment swaps
  * this seam for the service client with the same publish/fetch calls.
  */
object MessageBroker {

  final case class Msg(key: Array[Byte], value: Array[Byte], tsMicros: Long)

  final class Broker {
    private val topics = TrieMap.empty[String, Vector[Msg]]

    def publish(topic: String, key: Array[Byte], value: Array[Byte]): Unit =
      topics.updateWith(topic) { cur =>
        Some(cur.getOrElse(Vector.empty) :+
          Msg(key, value, System.currentTimeMillis() * 1000L))
      }

    def size(topic: String): Long = topics.get(topic).map(_.length.toLong).getOrElse(0L)

    /** Messages in [from, until) — offsets are dense sequence positions. */
    def fetch(topic: String, from: Long, until: Long): Seq[(Long, Msg)] = {
      val v = topics.getOrElse(topic, Vector.empty)
      (from.max(0) until until.min(v.length)).map(i => (i, v(i.toInt)))
    }

    def clear(): Unit = topics.clear()
  }

  private val brokers = TrieMap.empty[String, Broker]

  def at(address: String): Broker = brokers.getOrElseUpdate(address, new Broker)
}

/** Messaging sink half: encode rows per the table's format into the shared
  * binary `value` frame and publish executor-side.
  */
object MqSink {
  def publish(df: org.apache.spark.sql.DataFrame, t: graft.sql.Ddl.ConnectorTable): Unit = {
    val (address, topic) = MessagingProfiles.resolve(t)
    val enc =
      if (df.columns.sameElements(Array("value"))) df // pre-encoded (debezium roll)
      else graft.formats.Formats.encodeValue(df, t.format, t.options)
    enc.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val b = MessageBroker.at(address)
      rows.foreach { r =>
        val v = r.get(0) match {
          case bytes: Array[Byte] => bytes
          case s: String => s.getBytes("UTF-8")
          case other => String.valueOf(other).getBytes("UTF-8")
        }
        b.publish(topic, null, v)
      }
    }
  }
}

/** DSv2 source over [[MessageBroker]]: batch reads the whole topic,
  * micro-batch streams by sequence offset with exactly-once resume
  * (checkpointed offsets are plain positions). `spark.read[Stream]
  * .format("graft-mq").option("address", …).option("topic", …)`.
  */
class MqSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-mq"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = MqTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MqTable(properties.asScala.toMap)
}

object MqTable {
  /** The kafka-style envelope every message connector shares. */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false)))
}

class MqTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"mq:${props.getOrElse("topic", "?")}"
  override def schema(): StructType = MqTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = props ++ options.asScala
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = MqTable.schema
      override def toBatch: Batch = new MqBatch(merged)
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new MqMicroBatchStream(merged)
    }
  }
}

private object MqConf {
  def address(p: Map[String, String]): String =
    p.getOrElse("address", sys.error("graft-mq: 'address' option required"))
  def topic(p: Map[String, String]): String =
    p.getOrElse("topic", sys.error("graft-mq: 'topic' option required"))

  /** Split [start, end) into ordered sub-ranges so per-row work downstream
    * of the scan parallelizes across cores — a single-partition batch
    * serializes every regex/normalize expression on one thread (measured
    * ~1k msg/s vs the wire's 130k msg/s before this split). Contiguous
    * ordered slices keep collect()/show() row order identical to the
    * single-partition shape. ≥256 rows per slice so tiny micro-batches
    * don't pay 32 empty-task launches.
    */
  def split(address: String, topic: String, start: Long, end: Long,
      p: Map[String, String]): Array[InputPartition] = {
    val n = math.max(1, p.get("parallelism").map(_.toInt).getOrElse(
      try org.apache.spark.sql.SparkSession.active.sparkContext.defaultParallelism
      catch { case _: Exception => 8 }))
    val total = math.max(0L, end - start)
    val step = math.max(256L, (total + n - 1) / n)
    (0 until n).iterator
      .map(i => (start + i * step, math.min(end, start + (i + 1) * step)))
      .filter { case (s, e) => s < e }
      .map { case (s, e) => MqRange(address, topic, s, e): InputPartition }
      .toArray
  }
}

case class MqRange(address: String, topic: String, start: Long, end: Long)
  extends InputPartition

object MqReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[MqRange]
    val msgs = MessageBroker.at(r.address).fetch(r.topic, r.start, r.end).iterator
    new PartitionReader[InternalRow] {
      private var cur: (Long, MessageBroker.Msg) = _
      override def next(): Boolean = { if (msgs.hasNext) { cur = msgs.next(); true } else false }
      override def get(): InternalRow = InternalRow(
        cur._2.key, cur._2.value, UTF8String.fromString(r.topic), cur._1, cur._2.tsMicros)
      override def close(): Unit = ()
    }
  }
}

class MqBatch(props: Map[String, String]) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val (a, t) = (MqConf.address(props), MqConf.topic(props))
    MqConf.split(a, t, 0L, MessageBroker.at(a).size(t), props)
  }
  override def createReaderFactory(): PartitionReaderFactory = MqReaderFactory
}

case class MqOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

class MqMicroBatchStream(props: Map[String, String]) extends MicroBatchStream {
  private val (address, topic) = (MqConf.address(props), MqConf.topic(props))
  override def initialOffset(): Offset = MqOffset(0L)
  override def latestOffset(): Offset = MqOffset(MessageBroker.at(address).size(topic))
  override def deserializeOffset(json: String): Offset = MqOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    MqConf.split(address, topic,
      start.asInstanceOf[MqOffset].pos, end.asInstanceOf[MqOffset].pos, props)
  override def createReaderFactory(): PartitionReaderFactory = MqReaderFactory
}
