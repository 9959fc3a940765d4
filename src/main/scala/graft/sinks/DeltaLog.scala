package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

/** WIRE-FORMAT Delta Lake transaction log — the public protocol
  * (delta.io PROTOCOL.md; reference sink:
  * crates/arroyo-connectors/src/filesystem/delta.rs:142-160), written
  * and read with no format jars: the log is newline-delimited JSON
  * actions under `_delta_log/<version>%020d.json` over plain parquet
  * data files, all of which the JDK + Spark's own parquet writer cover.
  * Tables this sink writes are readable by any Delta reader
  * (delta-spark, delta-rs, DuckDB delta) — and by [[read]] below, which
  * gives the in-repo end-to-end proof the container's jar-less
  * environment otherwise can't run.
  *
  * Protocol subset (append-only sink, like the reference's):
  *   - commit 0 carries `protocol` (minReader 1 / minWriter 2) and
  *     `metaData` (id, parquet format, `schemaString` — Delta uses
  *     Spark's own StructType JSON serialization — partitionColumns,
  *     configuration, createdTime)
  *   - every commit carries `commitInfo` (operation) + one `add` per
  *     data file (relative path, partitionValues, size,
  *     modificationTime, dataChange) and, for streaming exactly-once,
  *     the `txn` action (appId, version): a replayed micro-batch whose
  *     (appId, version) is already in the log is a NO-OP — Delta's
  *     idempotent-writer rule, same contract as the reference's
  *     two-phase commit recovery
  *   - versions are claimed with hard-link put-if-absent (link(2) fails
  *     EEXIST where rename(2) silently replaces), the delta-rs POSIX
  *     recipe; a lost race re-reads the log and retries at the next
  *     version — optimistic concurrency, O(1) per commit regardless of
  *     data size
  *
  * Data files are written DISTRIBUTED by executors into a scratch dir,
  * then hard-linked (fallback: moved) into the table root under their
  * unique part names; nothing is visible until the commit lands, so a
  * crash mid-write leaves only ignorable orphans.
  */
object DeltaLog {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def logDir(table: String): Path = Paths.get(table, "_delta_log")
  private val VersionRe = """(\d{20})\.json""".r

  final case class Snapshot(schema: StructType, files: Seq[String],
      version: Long, appVersions: Map[String, Long])

  /** Replay the log: active files = adds minus removes, latest metaData
    * schema, latest txn version per appId. Returns None for a
    * nonexistent/empty log.
    */
  def snapshot(table: String): Option[Snapshot] = {
    val dir = logDir(table)
    if (!Files.isDirectory(dir)) return None
    val versions = Files.list(dir).iterator().asScala
      .flatMap(p => p.getFileName.toString match {
        case VersionRe(v) => Some((v.toLong, p))
        case _ => None
      }).toSeq.sortBy(_._1)
    if (versions.isEmpty) return None
    var schemaJson: String = null
    val adds = scala.collection.mutable.LinkedHashMap.empty[String, Unit]
    val appVersions = scala.collection.mutable.Map.empty[String, Long]
    versions.foreach { case (_, p) =>
      Files.readAllLines(p).asScala.filter(_.nonEmpty).foreach { line =>
        val n = mapper.readTree(line)
        if (n.has("metaData")) schemaJson = n.get("metaData").get("schemaString").asText()
        if (n.has("add")) adds += decodePath(n.get("add").get("path").asText()) -> (())
        if (n.has("remove")) adds -= decodePath(n.get("remove").get("path").asText())
        if (n.has("txn")) {
          val t = n.get("txn")
          appVersions += t.get("appId").asText() -> t.get("version").asLong()
        }
      }
    }
    require(schemaJson != null, s"$table: no metaData action in _delta_log")
    Some(Snapshot(DataType.fromJson(schemaJson).asInstanceOf[StructType],
      adds.keys.toSeq, versions.last._1, appVersions.toMap))
  }

  /** Snapshot read: the add-listed files only (orphans and uncommitted
    * data are invisible — ACID isolation), latest committed schema.
    */
  def read(spark: SparkSession, table: String): DataFrame = {
    val s = snapshot(table).getOrElse(sys.error(s"$table is not a Delta table (no _delta_log)"))
    if (s.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s.schema)
    else spark.read.schema(s.schema)
      .parquet(s.files.map(f => Paths.get(table, f).toString): _*)
  }

  /** Append `df` as one atomic Delta commit. `txn` = (appId, batchId)
    * arms the idempotent-replay guard. Returns the committed version, or
    * None when the txn was already committed (the batch is NOT
    * rewritten).
    */
  def writeBatch(df: DataFrame, table: String,
      txn: Option[(String, Long)] = None): Option[Long] = {
    txn.foreach { case (app, v) =>
      if (snapshot(table).exists(_.appVersions.get(app).exists(_ >= v)))
        return None // cheap pre-check; the commit loop re-checks under race
    }
    Files.createDirectories(Paths.get(table))
    val scratch = Paths.get(table, s".graft-write-${UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(scratch.toString)
    // link each part file into the table root under its (already unique:
    // Spark embeds the job UUID) name; fall back to move on filesystems
    // without hard links
    val parts = Files.list(scratch).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      .sortBy(_.getFileName.toString)
    val added = parts.map { p =>
      val dest = Paths.get(table, p.getFileName.toString)
      try Files.createLink(dest, p)
      catch { case _: UnsupportedOperationException =>
        Files.move(p, dest, StandardCopyOption.ATOMIC_MOVE) }
      (p.getFileName.toString, Files.size(dest), Files.getLastModifiedTime(dest).toMillis)
    }
    val committed = commit(table, df.schema, added, txn)
    // scratch cleanup (links live on in the table root)
    Files.walk(scratch).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    if (committed.isEmpty) // lost to a concurrent replay: remove orphaned parts
      added.foreach { case (name, _, _) => Files.deleteIfExists(Paths.get(table, name)) }
    committed
  }

  private def commit(table: String, schema: StructType,
      added: Seq[(String, Long, Long)], txn: Option[(String, Long)]): Option[Long] = {
    val dir = logDir(table)
    Files.createDirectories(dir)
    var attempt = 0
    while (attempt < 1000) {
      val snap = snapshot(table)
      txn.foreach { case (app, v) =>
        if (snap.exists(_.appVersions.get(app).exists(_ >= v))) return None
      }
      val version = snap.map(_.version + 1).getOrElse(0L)
      val sb = new StringBuilder
      def line(n: com.fasterxml.jackson.databind.node.ObjectNode): Unit = {
        sb.append(n.toString).append('\n'); ()
      }
      val ci = mapper.createObjectNode()
      val ciBody = ci.putObject("commitInfo")
      ciBody.put("timestamp", System.currentTimeMillis())
      ciBody.put("operation", if (version == 0L) "CREATE TABLE AS SELECT" else "WRITE")
      ciBody.putObject("operationParameters").put("mode", "Append")
      line(ci)
      if (version == 0L) {
        val pr = mapper.createObjectNode()
        val prBody = pr.putObject("protocol")
        prBody.put("minReaderVersion", 1)
        prBody.put("minWriterVersion", 2)
        line(pr)
      }
      val schemaChanged = snap.forall(_.schema.json != schema.json)
      if (schemaChanged) {
        val md = mapper.createObjectNode()
        val m = md.putObject("metaData")
        m.put("id", UUID.randomUUID().toString)
        val fmt = m.putObject("format")
        fmt.put("provider", "parquet")
        fmt.putObject("options")
        m.put("schemaString", schema.json)
        m.putArray("partitionColumns")
        m.putObject("configuration")
        m.put("createdTime", System.currentTimeMillis())
        line(md)
      }
      txn.foreach { case (app, v) =>
        val tn = mapper.createObjectNode()
        val t = tn.putObject("txn")
        t.put("appId", app)
        t.put("version", v)
        line(tn)
      }
      added.foreach { case (name, size, mtime) =>
        val an = mapper.createObjectNode()
        val a = an.putObject("add")
        a.put("path", encodePath(name))
        a.putObject("partitionValues")
        a.put("size", size)
        a.put("modificationTime", mtime)
        a.put("dataChange", true)
        line(an)
      }
      val tmp = dir.resolve(s".${UUID.randomUUID()}.tmp")
      Files.write(tmp, sb.toString.getBytes("UTF-8"))
      try {
        Files.createLink(dir.resolve(f"$version%020d.json"), tmp)
        Files.deleteIfExists(tmp)
        return Some(version)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp) // lost the version race — retry
        case e: Throwable => Files.deleteIfExists(tmp); throw e
      }
      attempt += 1
    }
    sys.error(s"delta commit lost $attempt version races; giving up")
  }

  // Delta paths are URI-encoded relative paths (PROTOCOL.md "path")
  private def encodePath(p: String): String =
    java.net.URLEncoder.encode(p, "UTF-8").replace("+", "%20")
  private def decodePath(p: String): String =
    java.net.URLDecoder.decode(p, "UTF-8")
}
