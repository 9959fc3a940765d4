package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

import java.nio.file.{Files, Path, Paths}
import java.util.UUID
import scala.jdk.CollectionConverters._

/** Transactional append-only table: a versioned commit log over parquet
  * data files — the semantics the reference's delta / iceberg sinks get
  * from their table-format libraries
  * (crates/arroyo-connectors/src/filesystem/delta.rs:142-160 routes the
  * two-phase `CommitState::DeltaLake` writer; iceberg.rs:287+ likewise) —
  * re-expressed without the format jars (none in this container):
  *
  *   - data files land under `data/<txn-uuid>/part-*.parquet`, written
  *     DISTRIBUTED by executors (plain `df.write.parquet`); nothing is
  *     visible until the commit manifest exists, so a crash mid-write
  *     leaves only ignorable orphans (delta's optimistic-writer rule)
  *   - a commit is ONE atomic rename of `_graft_log/<uuid>.tmp` →
  *     `_graft_log/<version>%020d.json` (ATOMIC_MOVE) — O(1) regardless of
  *     data size: no per-file renames, so the protocol holds at 100 TB
  *   - optimistic concurrency: losing a version race re-reads the log and
  *     retries at the next version (delta's commit loop)
  *   - exactly-once on replay: each commit records its `txnId`
  *     (app/query/batchId); re-delivering a batch whose txnId is already
  *     committed is a no-op (delta's `txn` action / the reference's
  *     two-phase commit recovery, kafka/mod.rs:128-142)
  *
  * Readers list the log, take the files of every committed version, and
  * read them as one parquet scan with the latest committed schema.
  */
object TxnLog {

  final case class Commit(version: Long, txnId: String, files: Seq[String],
      schemaJson: String, rowCount: Long)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def logDir(table: String): Path = Paths.get(table, "_graft_log")
  private val VersionRe = """(\d{20})\.json""".r

  /** All committed versions, ascending. */
  def commits(table: String): Seq[Commit] = {
    val dir = logDir(table)
    if (!Files.isDirectory(dir)) return Seq.empty
    Files.list(dir).iterator().asScala
      .flatMap(p => p.getFileName.toString match {
        case VersionRe(v) => Some((v.toLong, p))
        case _ => None
      })
      .toSeq.sortBy(_._1)
      .map { case (v, p) =>
        val n = mapper.readTree(Files.readAllBytes(p))
        Commit(v, n.get("txnId").asText(),
          (0 until n.get("files").size).map(i => n.get("files").get(i).asText()),
          n.get("schema").asText(), n.get("rowCount").asLong())
      }
  }

  def committedTxnIds(table: String): Set[String] = commits(table).map(_.txnId).toSet

  /** Atomically commit `files` as the next version. Returns the committed
    * version, or None if `txnId` was already committed (idempotent replay).
    */
  def commit(table: String, txnId: String, files: Seq[String],
      schemaJson: String, rowCount: Long): Option[Long] = {
    val dir = logDir(table)
    Files.createDirectories(dir)
    val node = mapper.createObjectNode()
    node.put("txnId", txnId)
    val fa = node.putArray("files")
    files.foreach(fa.add)
    node.put("schema", schemaJson)
    node.put("rowCount", rowCount)
    val body = node.toString.getBytes("UTF-8")
    var attempt = 0
    while (attempt < 1000) {
      val existing = commits(table)
      if (existing.exists(_.txnId == txnId)) return None
      val version = existing.lastOption.map(_.version + 1).getOrElse(0L)
      val tmp = dir.resolve(s".${UUID.randomUUID()}.tmp")
      Files.write(tmp, body)
      // hard-link, not rename: POSIX rename(2) silently REPLACES an
      // existing target, so ATOMIC_MOVE can't detect a lost version race —
      // link(2) fails with EEXIST, which is exactly the put-if-absent a
      // commit log needs (same trick delta-rs uses on posix file stores)
      try {
        Files.createLink(dir.resolve(f"$version%020d.json"), tmp)
        Files.deleteIfExists(tmp)
        return Some(version)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp) // lost the version race — re-read log, retry
        case e: Throwable => Files.deleteIfExists(tmp); throw e
      }
      attempt += 1
    }
    sys.error(s"txn commit for $txnId lost ${attempt} version races; giving up")
  }

  /** Write one batch transactionally. Data files are written by executors;
    * only the O(1) manifest commit runs on the driver. Returns the version,
    * or None when `txnId` was already committed (the replay path — the
    * batch is NOT rewritten).
    */
  def writeBatch(df: DataFrame, table: String, txnId: String): Option[Long] = {
    if (committedTxnIds(table).contains(txnId)) return None // cheap pre-check
    val txnDir = s"data/${UUID.randomUUID()}"
    val abs = Paths.get(table, txnDir)
    df.write.mode("overwrite").parquet(abs.toString)
    // row count from the freshly-written parquet footers — a metadata-only
    // scan (count pushdown), not a second pass over the batch
    val count = df.sparkSession.read.parquet(abs.toString).count()
    val files = Files.list(abs).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => s"$txnDir/${p.getFileName}").toSeq.sorted
    commit(table, txnId, files, df.schema.json, count) match {
      case some @ Some(_) => some
      case None =>
        // concurrent replay won the commit — our data dir is orphaned;
        // remove it eagerly (readers would ignore it anyway)
        Files.walk(abs).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
        None
    }
  }

  /** Snapshot read: every committed file as one parquet scan. An empty
    * table (no commits, or all commits empty) yields an empty frame with
    * the latest committed schema.
    */
  def read(spark: SparkSession, table: String): DataFrame = {
    val cs = commits(table)
    require(cs.nonEmpty, s"$table has no committed versions")
    val schema = DataType.fromJson(cs.last.schemaJson).asInstanceOf[StructType]
    val files = cs.flatMap(c => c.files.map(f => Paths.get(table, f).toString))
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files: _*)
  }

  /** Total committed row count straight from the log (metadata-only — the
    * kind of stats query table formats answer without touching data).
    */
  def rowCount(table: String): Long = commits(table).map(_.rowCount).sum
}

/** Generic exactly-once wrapper for sinks without transactional targets
  * (kafka & friends): a durable txn ledger of committed batch ids next to
  * the query's checkpoint. `run` executes the write only if `txnId` hasn't
  * committed, then durably marks it — the recovery half of the reference's
  * two-phase commit (kafka/mod.rs:128-142): a batch replayed after a crash
  * between write and mark is re-written (at-least-once inside the ledger
  * window), one replayed after the mark is skipped entirely.
  */
object ExactlyOnce {
  def run(ledgerDir: String, txnId: String)(write: => Unit): Boolean = {
    val dir = Paths.get(ledgerDir)
    Files.createDirectories(dir)
    val marker = dir.resolve(s"$txnId.committed")
    if (Files.exists(marker)) return false
    write
    val tmp = dir.resolve(s".$txnId.tmp")
    Files.write(tmp, Array.emptyByteArray)
    try { Files.createLink(marker, tmp); Files.deleteIfExists(tmp) }
    catch { case _: java.nio.file.FileAlreadyExistsException => Files.deleteIfExists(tmp) }
    true
  }

  def committed(ledgerDir: String, txnId: String): Boolean =
    Files.exists(Paths.get(ledgerDir, s"$txnId.committed"))
}
