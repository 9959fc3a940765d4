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

import java.util
import scala.jdk.CollectionConverters._

/** Custom DataSource V2 nexmark event generator — the reference's benchmark
  * source (crates/arroyo-connectors/src/nexmark/mod.rs:24-76,160-198): each
  * event is a struct of three nullable branches {person, auction, bid} with
  * exactly one branch populated, in the classic 1:3:46 ratio. All values
  * derive deterministically from the event counter, so runs are exactly
  * reproducible at any parallelism.
  *
  * `spark.read.format("graft-nexmark").option("message_count", n)` /
  * `spark.readStream.format("graft-nexmark").option("event_rate", r)`.
  */
class NexmarkSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-nexmark"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = NexmarkTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new NexmarkTable(properties.asScala.toMap)
}

object NexmarkTable {
  // schemas mirror nexmark/mod.rs:24-76 (reference field surface)
  val personSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("email_address", StringType), StructField("credit_card", StringType),
    StructField("city", StringType), StructField("state", StringType),
    StructField("datetime", TimestampType), StructField("extra", StringType)))
  val auctionSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("description", StringType),
    StructField("item_name", StringType), StructField("initial_bid", LongType),
    StructField("reserve", LongType), StructField("datetime", TimestampType),
    StructField("expires", TimestampType), StructField("seller", LongType),
    StructField("category", LongType), StructField("extra", StringType)))
  val bidSchema: StructType = StructType(Seq(
    StructField("auction", LongType), StructField("bidder", LongType),
    StructField("price", LongType), StructField("channel", StringType),
    StructField("url", StringType), StructField("datetime", TimestampType),
    StructField("extra", StringType)))
  val schema: StructType = StructType(Seq(
    StructField("person", personSchema, nullable = true),
    StructField("auction", auctionSchema, nullable = true),
    StructField("bid", bidSchema, nullable = true)))

  // classic nexmark event mix per 50 events: 1 person, 3 auctions, 46 bids
  val PersonPeriod = 50
  val AuctionsPer50 = 3

  private def s(v: String) = UTF8String.fromString(v)
  private def mix(i: Long, salt: Long): Long = {
    var h = i * 0x9E3779B97F4A7C15L + salt
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
    h & Long.MaxValue
  }

  /** Deterministic event for counter `i` at event-time `micros`. */
  def event(i: Long, micros: Long): InternalRow = {
    val slot = (i % PersonPeriod).toInt
    val row = new GenericInternalRow(3)
    if (slot == 0) {
      val id = i / PersonPeriod
      row.update(0, new GenericInternalRow(Array[Any](
        id, s(f"person-$id"), s(f"p$id@example.com"), s(f"cc-${mix(i, 1) % 10000}%04d"),
        s("city-" + mix(i, 2) % 100), s("state-" + mix(i, 3) % 50), micros, s(""))))
    } else if (slot <= AuctionsPer50) {
      val id = i / PersonPeriod * AuctionsPer50 + (slot - 1)
      val initial = 100 + mix(i, 4) % 1000
      row.update(1, new GenericInternalRow(Array[Any](
        id, s(f"desc-$id"), s(f"item-$id"), initial, initial + mix(i, 5) % 5000,
        micros, micros + 60L * 1000000L, mix(i, 6) % math.max(1, i / PersonPeriod + 1),
        mix(i, 7) % 10, s(""))))
    } else {
      row.update(2, new GenericInternalRow(Array[Any](
        mix(i, 8) % math.max(1, i / PersonPeriod * AuctionsPer50 + 1),
        mix(i, 9) % math.max(1, i / PersonPeriod + 1),
        100 + mix(i, 10) % 10000,
        s("channel-" + mix(i, 11) % 10),
        s("https://auction/" + mix(i, 8) % 1000), micros, s(""))))
    }
    row
  }

  /** End-of-data sentinel: a bid at the year-9999 event time. Consumers
    * (the SQL pipeline's eod filter) drop it above the watermark node; it
    * exists only to advance the watermark past every open window.
    */
  def eodEvent: InternalRow = {
    val row = new GenericInternalRow(3)
    row.update(2, new GenericInternalRow(Array[Any](
      0L, 0L, 0L, s("eod"), s("eod"), ImpulseConfAccess.eodMicros, s(""))))
    row
  }
}

class NexmarkTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "nexmark"
  override def schema(): StructType = NexmarkTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = props ++ options.asScala
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = NexmarkTable.schema
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          ImpulseSplits.split(0L, ImpulseConfAccess.count(merged), merged)
        override def createReaderFactory(): PartitionReaderFactory = NexmarkReaderFactory
      }
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ImpulseMicroBatchStream(merged) {
          override def createReaderFactory(): PartitionReaderFactory = NexmarkReaderFactory
        }
    }
  }
}

/** Re-exposes ImpulseConf (kept private to its file) for the nexmark table. */
private[sources] object ImpulseConfAccess {
  def count(p: Map[String, String]): Long = p.getOrElse("message_count", "1000").toLong
  def eodMicros: Long = ImpulseConf.EodMicros
}

object NexmarkReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[ImpulseRange]
    new PartitionReader[InternalRow] {
      private var i = r.start - 1
      override def next(): Boolean = { i += 1; i < r.end }
      override def get(): InternalRow =
        // `eod=true` (streaming): one sentinel BID at the far-future
        // EodMicros after the bounded range — the reference's bounded
        // nexmark source emits EndOfData the same way; the SQL pipeline
        // drops the row right above the watermark node so it only
        // advances the watermark past every open window
        if (i == r.eodAt) NexmarkTable.eodEvent
        else NexmarkTable.event(i, r.startMicros + (i * 1000000.0 / r.rate).toLong)
      override def close(): Unit = ()
    }
  }
}
