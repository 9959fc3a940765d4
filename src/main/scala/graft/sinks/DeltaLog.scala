package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

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
  *     data file (relative URI-encoded path, partitionValues, size,
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
  *   - every `checkpointInterval` commits the writer drops a PARQUET
  *     CHECKPOINT (`<version>%020d.checkpoint.parquet`, one row per
  *     live action: protocol/metaData/txn/add) plus the
  *     `_last_checkpoint` pointer — the protocol's log-compaction
  *     device. Readers start from the newest checkpoint and replay only
  *     the JSON commits after it, so a month-old streaming sink's
  *     snapshot costs O(active files + tail), not O(every micro-batch
  *     ever committed); JSON commits at-or-before a checkpoint can be
  *     aged out entirely (spec-proven).
  *
  * Data files are written DISTRIBUTED by executors into a scratch dir,
  * then hard-linked (fallback: moved) into the table root under their
  * unique part names (hive `col=val/` subdirs preserved for partitioned
  * tables); nothing is visible until the commit lands, so a crash
  * mid-write leaves only ignorable orphans.
  */
object DeltaLog {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def logDir(table: String): Path = Paths.get(table, "_delta_log")
  private val VersionRe = """(\d{20})\.json""".r
  private val CheckpointRe = """(\d{20})\.checkpoint\.parquet""".r
  // third-party checkpoint forms (PROTOCOL.md "Checkpoints"): classic
  // multi-part (…checkpoint.<part>.<nParts>.parquet, usable only when
  // every part is present) and V2 (…checkpoint.<uuid>.{parquet,json},
  // a manifest whose `sidecar` actions name the files holding the
  // add/remove actions — or inlining them when it has no sidecars)
  private val CheckpointPartRe =
    """(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet""".r
  private val CheckpointV2Re =
    """(\d{20})\.checkpoint\.([^.]+)\.(parquet|json)""".r

  // Files.list/Files.walk return streams backed by an open directory fd;
  // materialize-and-close so a long-lived streaming sink (snapshot runs
  // per micro-batch) can't exhaust fds waiting on GC finalizers.
  private def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }
  private def walkDir(p: Path): Seq[Path] = {
    val s = Files.walk(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  // Latest-snapshot cache per table: a streaming sink committing every few
  // seconds must not re-collect the full checkpoint add-set (O(active
  // files), driver-side) per batch — replay only the JSON commits since
  // the cached version. At 100 TB / ~10⁶ files this turns the per-commit
  // log cost from O(files) into O(new commits).
  // Each entry remembers the log file that BACKED its version (path +
  // size + mtime): a table deleted and recreated at the same path grows
  // a log whose version-N file differs from the cached one, and the
  // identity mismatch forces a cold replay instead of seeding stale
  // adds/schema from the dead incarnation.
  private final case class LogFileId(name: String, size: Long, mtime: Long)
  private val snapCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Snapshot, LogFileId)]()

  private def logFileId(p: Path): LogFileId =
    LogFileId(p.getFileName.toString, Files.size(p),
      Files.getLastModifiedTime(p).toMillis)

  /** Test/probe hook: forget cached snapshots (forces a cold full replay). */
  private[graft] def clearSnapshotCache(): Unit = snapCache.clear()

  private def cacheKey(table: String): String =
    Paths.get(table).toAbsolutePath.normalize.toString

  final case class AddInfo(size: Long, modificationTime: Long,
      partitionValues: Seq[(String, String)],
      stats: Option[String] = None,
      /** Merge-on-read deletion vector ([[DeletionVectors]]): the add's
        * rows minus the DV's row indexes are the file's LIVE rows.
        */
      dv: Option[DeletionVectors.Descriptor] = None,
      /** rowTracking (r16): the add's fresh-row-id assignment base and
        * commit version, carried VERBATIM through snapshots so
        * checkpoint rewrites never drop them (a reader losing baseRowId
        * loses every row's identity).
        */
      baseRowId: Option[Long] = None,
      defaultRowCommitVersion: Option[Long] = None) {
    /** Concurrency identity of the DV state — a DML commit must abort
      * when a file it read got a different DV underneath it.
      */
    def dvId: String = dv.map(d =>
      s"${d.storageType}:${d.pathOrInlineDv}:${d.offset.getOrElse(0)}").getOrElse("")
  }

  private def parseDv(n: com.fasterxml.jackson.databind.JsonNode)
      : Option[DeletionVectors.Descriptor] =
    Option(n.get("deletionVector")).filterNot(_.isNull).map { d =>
      DeletionVectors.Descriptor(
        d.get("storageType").asText(),
        d.get("pathOrInlineDv").asText(),
        Option(d.get("offset")).filterNot(_.isNull).map(_.asInt()),
        d.get("sizeInBytes").asInt(),
        d.get("cardinality").asLong())
    }

  final case class Snapshot(schema: StructType, partitionColumns: Seq[String],
      adds: Seq[(String, AddInfo)], version: Long,
      appVersions: Map[String, Long], metaId: String, createdTime: Long,
      configuration: Map[String, String] = Map.empty,
      /** The last-seen `protocol` action, verbatim JSON — what a
        * checkpoint must ROUND-TRIP: re-deriving it would downgrade a
        * third-party table's protocol (columnMapping, inCommitTimestamp,
        * …) and let feature-unaware readers silently misread.
        */
      protocolJson: Option[String] = None,
      /** Live `domainMetadata` actions (r16): domain → configuration
        * JSON string, latest wins, removed=true deletes. Carried
        * through checkpoints — the rowTracking high-water mark lives at
        * `delta.rowTracking`, and dropping a foreign domain would
        * corrupt whatever writer owns it.
        */
      domainMetadata: Map[String, String] = Map.empty) {
    def files: Seq[String] = adds.map(_._1)
    /** Does the protocol list `rowTracking` as a writer feature? When
      * supported, every NEW add must carry a fresh baseRowId past the
      * `delta.rowTracking` high-water mark (r16).
      */
    def rowTrackingSupported: Boolean =
      protocolJson.exists(_.contains("\"rowTracking\""))
    def rowIdHighWaterMark: Long =
      domainMetadata.get("delta.rowTracking").flatMap { cfg =>
        try Option(mapper.readTree(cfg).get("rowIdHighWaterMark"))
          .map(_.asLong())
        catch { case _: Exception => None }
      }.getOrElse(-1L)
  }

  /** Replay the log from the newest checkpoint (if any) plus the JSON
    * commits after it: active files = adds minus removes, latest
    * metaData schema + partitioning, latest txn version per appId.
    * `asOf` = TIME TRAVEL: replay only commits ≤ that version (`VERSION
    * AS OF`), using the newest checkpoint at-or-before it — the reason
    * [[optimize]]'s tombstoned files stay on disk until [[vacuum]]'s
    * retention passes. Returns None for a nonexistent/empty log.
    */
  def snapshot(spark: SparkSession, table: String,
      asOf: Option[Long] = None): Option[Snapshot] = {
    val dir = logDir(table)
    if (!Files.isDirectory(dir)) return None
    val entries = listDir(dir)
    val horizon = asOf.getOrElse(Long.MaxValue)
    val jsons = entries.flatMap(p => p.getFileName.toString match {
      case VersionRe(v) if v.toLong <= horizon => Some((v.toLong, p))
      case _ => None
    }).sortBy(_._1)
    // (version, files, isV2) per USABLE checkpoint; a multi-part set
    // missing any part is unusable (a crashed writer's leftovers) and
    // simply doesn't participate — the coverage guard below refuses
    // loudly if the JSON chain can't stand without it
    val classicCps = entries.flatMap(p => p.getFileName.toString match {
      case CheckpointRe(v) if v.toLong <= horizon => Some((v.toLong, Seq(p), false))
      case _ => None
    })
    val multiCps = entries.flatMap(p => p.getFileName.toString match {
      case CheckpointPartRe(v, i, n) if v.toLong <= horizon =>
        Some((v.toLong, n.toInt, i.toInt, p))
      case _ => None
    }).groupBy(t => (t._1, t._2)).collect {
      case ((v, n), ps) if ps.map(_._3).toSet == (1 to n).toSet =>
        (v, ps.sortBy(_._3).map(_._4), false)
    }
    val v2Cps = entries.flatMap(p => p.getFileName.toString match {
      case CheckpointV2Re(v, _, _) if v.toLong <= horizon =>
        Some((v.toLong, Seq(p), true))
      case _ => None
    })
    // one form per version, classic/multi-part preferred (no sidecar hop)
    val checkpoints = (classicCps ++ multiCps ++ v2Cps).groupBy(_._1)
      .map { case (_, forms) => forms.find(!_._3).getOrElse(forms.head) }
      .toSeq.sortBy(_._1)
    if (jsons.isEmpty && checkpoints.isEmpty) return None
    asOf.foreach { v =>
      require((jsons.map(_._1) ++ checkpoints.map(_._1)).max == v,
        s"$table has no version $v (log ends earlier or was checkpoint-truncated past it)")
    }
    val target = (jsons.map(_._1) ++ checkpoints.map(_._1)).max

    var schemaJson: String = null
    var partCols: Seq[String] = Seq.empty
    var metaId: String = UUID.randomUUID().toString
    var createdTime: Long = 0L
    var config: Map[String, String] = Map.empty
    var protocolJson: Option[String] = None
    val adds = scala.collection.mutable.LinkedHashMap.empty[String, AddInfo]
    val appVersions = scala.collection.mutable.Map.empty[String, Long]
    val domains = scala.collection.mutable.Map.empty[String, String]

    def applyJsonLine(line: String): Unit = {
        val n = mapper.readTree(line)
        if (n.has("protocol")) {
          checkProtocol(table, n.get("protocol"))
          protocolJson = Some(n.get("protocol").toString)
        }
        if (n.has("metaData")) {
          val m = n.get("metaData")
          metaId = m.get("id").asText()
          schemaJson = m.get("schemaString").asText()
          partCols = (0 until m.get("partitionColumns").size())
            .map(i => m.get("partitionColumns").get(i).asText())
          createdTime = m.get("createdTime").asLong()
          config = Option(m.get("configuration")).map(c =>
            c.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
            .getOrElse(Map.empty)
        }
        if (n.has("add")) {
          val a = n.get("add")
          val pv = a.get("partitionValues")
          adds += decodePath(a.get("path").asText()) -> AddInfo(
            a.get("size").asLong(), a.get("modificationTime").asLong(),
            pv.properties().asScala.map(e => e.getKey ->
              (if (e.getValue.isNull) null else e.getValue.asText())).toSeq.sorted,
            Option(a.get("stats")).filterNot(_.isNull).map(_.asText()),
            parseDv(a),
            Option(a.get("baseRowId")).filterNot(_.isNull).map(_.asLong()),
            Option(a.get("defaultRowCommitVersion")).filterNot(_.isNull)
              .map(_.asLong()))
        }
        if (n.has("remove")) adds -= decodePath(n.get("remove").get("path").asText())
        if (n.has("txn")) {
          val t = n.get("txn")
          appVersions += t.get("appId").asText() -> t.get("version").asLong()
        }
        if (n.has("domainMetadata")) {
          val d = n.get("domainMetadata")
          val domain = d.get("domain").asText()
          if (Option(d.get("removed")).exists(_.asBoolean())) domains -= domain
          else domains += domain ->
            Option(d.get("configuration")).filterNot(_.isNull)
              .map(_.asText()).getOrElse("{}")
        }
      }

    def applyJson(p: Path): Unit =
      Files.readAllLines(p).asScala.filter(_.nonEmpty).foreach(applyJsonLine)

    /** One checkpoint parquet row (classic part, v2 manifest, or v2
      * sidecar — every section presence-guarded; sidecar rows are
      * handled by the caller). Removes are tombstones (vacuum fodder):
      * state reconstruction applies adds only.
      */
    def applyCheckpointRow(r: Row): Unit = {
      val i = r.fieldIndex _
      if (r.schema.fieldNames.contains("protocol") && !r.isNullAt(i("protocol"))) {
        val pr = r.getStruct(i("protocol"))
        val node = mapper.createObjectNode()
        node.put("minReaderVersion",
          Option(pr.getAs[Any]("minReaderVersion"))
            .collect { case n: Number => n.intValue() }.getOrElse(1))
        // capture the FULL protocol (writer side too): snapshots must
        // round-trip it into the next checkpoint verbatim
        Option(pr.getAs[Any]("minWriterVersion"))
          .collect { case n: Number => n.intValue() }
          .foreach(node.put("minWriterVersion", _))
        for (side <- Seq("readerFeatures", "writerFeatures"))
          if (pr.schema.fieldNames.contains(side) && pr.getAs[Any](side) != null) {
            val arr = node.putArray(side)
            pr.getAs[scala.collection.Seq[String]](side).foreach(arr.add)
          }
        checkProtocol(table, node)
        protocolJson = Some(node.toString)
      }
      if (r.schema.fieldNames.contains("metaData") && !r.isNullAt(i("metaData"))) {
        val m = r.getStruct(i("metaData"))
        metaId = m.getAs[String]("id")
        schemaJson = m.getAs[String]("schemaString")
        partCols = m.getAs[scala.collection.Seq[String]]("partitionColumns").toSeq
        createdTime = m.getAs[Long]("createdTime")
        config = Option(m.getAs[scala.collection.Map[String, String]]("configuration"))
          .map(_.toMap).getOrElse(Map.empty)
      }
      if (r.schema.fieldNames.contains("txn") && !r.isNullAt(i("txn"))) {
        val t = r.getStruct(i("txn"))
        appVersions += t.getAs[String]("appId") -> t.getAs[Long]("version")
      }
      if (r.schema.fieldNames.contains("add") && !r.isNullAt(i("add"))) {
        val a = r.getStruct(i("add"))
        val dv =
          if (a.schema.fieldNames.contains("deletionVector") &&
              a.getAs[Any]("deletionVector") != null) {
            val d = a.getStruct(a.fieldIndex("deletionVector"))
            Some(DeletionVectors.Descriptor(
              d.getAs[String]("storageType"),
              d.getAs[String]("pathOrInlineDv"),
              Option(d.getAs[Any]("offset"))
                .collect { case n: Number => n.intValue() },
              d.getAs[Int]("sizeInBytes"),
              d.getAs[Long]("cardinality")))
          } else None
        def optLong(col: String): Option[Long] =
          if (a.schema.fieldNames.contains(col))
            Option(a.getAs[Any](col)).collect { case n: Number => n.longValue() }
          else None
        adds += decodePath(a.getAs[String]("path")) -> AddInfo(
          a.getAs[Long]("size"), a.getAs[Long]("modificationTime"),
          a.getAs[scala.collection.Map[String, String]]("partitionValues").toSeq.sorted,
          // pre-r10 checkpoints have no stats column
          if (a.schema.fieldNames.contains("stats"))
            Option(a.getAs[String]("stats"))
          else None,
          dv,
          optLong("baseRowId"), optLong("defaultRowCommitVersion"))
      }
      if (r.schema.fieldNames.contains("domainMetadata") &&
          !r.isNullAt(i("domainMetadata"))) {
        val d = r.getStruct(i("domainMetadata"))
        val domain = d.getAs[String]("domain")
        if (Option(d.getAs[Any]("removed")).exists(_ == true)) domains -= domain
        else domains += domain ->
          Option(d.getAs[String]("configuration")).getOrElse("{}")
      }
    }

    /** Read checkpoint parquet part(s), applying every row and
      * collecting any `sidecar` actions for the caller. A V2-spec
      * "compatibility" checkpoint carries the CLASSIC file name but
      * stores its file actions in sidecars — so the classic branch must
      * route through here too, or sidecar-stored adds silently vanish
      * from the snapshot.
      */
    def applyCheckpointParquet(paths: Seq[String],
                               sidecars: scala.collection.mutable.Buffer[String]): Unit = {
      // STREAMING fold, not collect(): a 10⁶-add checkpoint's rows are
      // ~1 GB materialized — toLocalIterator pulls one partition at a
      // time, so replay heap is bounded by the fold's own adds map
      // (the state we must hold anyway), not by a second full copy of
      // every row object (CheckpointProbe pins the numbers)
      val it = spark.read.parquet(paths: _*).toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        if (r.schema.fieldNames.contains("sidecar") &&
            !r.isNullAt(r.fieldIndex("sidecar")))
          sidecars += r.getStruct(r.fieldIndex("sidecar")).getAs[String]("path")
        else applyCheckpointRow(r)
      }
    }

    /** Resolve collected sidecar names under _delta_log/_sidecars/ and
      * apply their add/remove rows. Absolute paths refuse loudly like
      * shallow-clone adds do.
      */
    def applySidecars(sidecars: scala.collection.Seq[String]): Unit =
      if (sidecars.nonEmpty) {
        val dir = logDir(table).resolve("_sidecars")
        val paths = sidecars.map { s =>
          require(!s.contains("://") && !s.startsWith("/"),
            s"$table: v2 checkpoint sidecar '$s' is absolute; this reader " +
              "resolves sidecars under _delta_log/_sidecars/ only")
          dir.resolve(decodePath(s)).toString
        }
        val it = spark.read.parquet(paths.toSeq: _*).toLocalIterator()
        while (it.hasNext) applyCheckpointRow(it.next())
      }

    /** V2 checkpoint: apply the manifest's non-file actions, collect its
      * `sidecar` actions, then apply every sidecar file's add/remove
      * rows via [[applySidecars]].
      */
    def applyV2Checkpoint(manifest: Path): Unit = {
      val sidecars = scala.collection.mutable.Buffer.empty[String]
      if (manifest.getFileName.toString.endsWith(".json"))
        Files.readAllLines(manifest).asScala.filter(_.nonEmpty).foreach { line =>
          val n = mapper.readTree(line)
          if (n.has("sidecar")) sidecars += n.get("sidecar").get("path").asText()
          else if (!n.has("checkpointMetadata")) applyJsonLine(line)
        }
      else applyCheckpointParquet(Seq(manifest.toString), sidecars)
      applySidecars(sidecars)
    }

    // INCREMENTAL fast path: a cached snapshot at c ≤ target whose JSON
    // tail (c, target] is fully present — seed state from the cache and
    // replay only the tail; no checkpoint parquet collect, no full-log
    // replay. Falls back cold when the tail was aged out past a
    // checkpoint or the table was recreated (cache version ahead of log).
    val cached = Option(snapCache.get(cacheKey(table))).collect {
      case (c, id) if c.version <= target &&
        jsons.view.map(_._1).filter(v => v > c.version).toSeq == (c.version + 1 to target) &&
        // identity: the log file that backed the cached version must still
        // be the SAME file — a recreated table at this path fails here
        (jsons.find(_._1 == c.version).map(_._2) orElse
          checkpoints.find(_._1 == c.version).map(_._2.head))
          .exists(p => try logFileId(p) == id catch { case _: java.io.IOException => false }) =>
        c
    }

    cached match {
      case Some(c) if c.version == target => return Some(c) // nothing new
      case Some(c) =>
        schemaJson = c.schema.json
        partCols = c.partitionColumns
        metaId = c.metaId
        createdTime = c.createdTime
        config = c.configuration
        protocolJson = c.protocolJson
        adds ++= c.adds
        appVersions ++= c.appVersions
        domains ++= c.domainMetadata
        jsons.filter(_._1 > c.version).foreach { case (_, p) => applyJson(p) }
      case None =>
        val cpVersion: Long = checkpoints.lastOption match {
          case Some((v, paths, isV2)) =>
            if (isV2) applyV2Checkpoint(paths.head)
            else {
              // a classic-NAMED file can still be a V2 "compatibility"
              // checkpoint whose adds live in sidecars — collect and
              // resolve them rather than silently dropping those rows
              val sidecars = scala.collection.mutable.Buffer.empty[String]
              applyCheckpointParquet(paths.map(_.toString), sidecars)
              applySidecars(sidecars)
            }
            v
          case None => -1L
        }
        // COVERAGE guard: the replay base (version 0, or the newest
        // usable checkpoint) plus the JSON tail must cover every commit
        // up to the target — a log whose head was aged out past an
        // incomplete/unreadable checkpoint must refuse, not silently
        // return the tail's files as the whole table
        require(jsons.map(_._1).filter(_ > cpVersion) == (cpVersion + 1 to target),
          s"$table: _delta_log does not cover versions ${cpVersion + 1}..$target " +
            "contiguously (commits aged out past a missing, incomplete-multipart, " +
            "or unreadable checkpoint); refusing to return a partial table")
        jsons.filter(_._1 > cpVersion).foreach { case (_, p) => applyJson(p) }
    }
    require(schemaJson != null, s"$table: no metaData action in _delta_log")
    val snap = Snapshot(DataType.fromJson(schemaJson).asInstanceOf[StructType],
      partCols, adds.toSeq, target, appVersions.toMap, metaId, createdTime,
      config, protocolJson, domains.toMap)
    // only the true latest state may overwrite the cache (asOf snapshots
    // are historical); an unconditional put also self-heals a recreated
    // table whose cache entry is ahead of the new log
    if (asOf.isEmpty) {
      val backing = jsons.find(_._1 == target).map(_._2)
        .orElse(checkpoints.find(_._1 == target).map(_._2.head))
      backing.foreach(p =>
        try snapCache.put(cacheKey(table), (snap, logFileId(p)))
        catch { case _: java.io.IOException => /* raced a cleanup: skip */ })
    }
    Some(snap)
  }

  /** Latest committed version whose commit timestamp ≤ `tsMillis` —
    * `TIMESTAMP AS OF` resolution. Uses each commit's `commitInfo`
    * timestamp (what this writer records), falling back to the commit
    * file's mtime for third-party commits without one; None when the
    * earliest available commit is already later (or the log was
    * checkpoint-truncated past the asked-for time).
    */
  private[graft] def versionAt(table: String, tsMillis: Long): Option[Long] = {
    val dir = logDir(table)
    if (!Files.isDirectory(dir)) return None
    val versions = listDir(dir).flatMap(p => p.getFileName.toString match {
      case VersionRe(v) => Some((v.toLong, p))
      case _ => None
    }).sortBy(_._1)
    if (versions.isEmpty) return None
    // a LINEAR clamped scan, always: the answer under delta-spark's
    // non-decreasing-clamp semantics depends on the PREFIX MAXIMUM of
    // every commit's timestamp, so any probe-based (binary) search is
    // only correct if every earlier commit is monotone — which an
    // UN-probed third-party commit falling back to file mtime can
    // silently violate (copied/restored logs reorder mtimes). The scan
    // stops at the first commit whose clamped stamp passes the instant
    // (it never comes back), reads each commit's FIRST line lazily, and
    // operates on the present files only — checkpoint aging keeps that
    // set bounded, so time travel stays tens of µs per present commit.
    versionAtLinear(versions, tsMillis)
  }

  /** Clamp each commit's effective timestamp to be non-decreasing
    * (delta-spark's adjustment), answer = the last version whose
    * CLAMPED timestamp ≤ `tsMillis`.
    */
  private def versionAtLinear(versions: Seq[(Long, Path)],
      tsMillis: Long): Option[Long] = {
    var running = Long.MinValue
    var ans = -1L
    val it = versions.iterator
    var done = false
    while (it.hasNext && !done) {
      val (v, p) = it.next()
      running = math.max(running, commitTs(p))
      if (running <= tsMillis) ans = v else done = true
    }
    if (ans < 0) None else Some(ans)
  }

  /** One commit's timestamp: the first `commitInfo` line's stamp (read
    * lazily — large DML commits carry full add lists this lookup must
    * not parse), the file mtime for third-party commits without one.
    * Tables with the `inCommitTimestamp` writer feature make THAT field
    * authoritative (the protocol's clock-skew fix — monotonic by
    * construction, unlike file timestamps a log copy can reorder).
    */
  private def commitTs(p: Path): Long = {
    val s = Files.lines(p)
    try {
      val it = s.iterator()
      while (it.hasNext) {
        val line = it.next()
        if (line.nonEmpty) {
          val n = mapper.readTree(line)
          val ci = n.get("commitInfo")
          if (ci != null) {
            val ict = ci.get("inCommitTimestamp")
            if (ict != null && !ict.isNull) return ict.asLong()
            val t = ci.get("timestamp")
            if (t != null) return t.asLong()
          }
        }
      }
      Files.getLastModifiedTime(p).toMillis
    } finally s.close()
  }

  /** Reader features this implementation actually honors beyond base
    * protocol 1. `timestampNtz`/`v2Checkpoint`-style WRITER-side
    * features never appear here; anything ELSE that changes what rows a
    * reader must return MUST be rejected — ignoring a deletion vector
    * would silently over-return rows, ignoring a column mapping would
    * silently return nulls for every mapped column.
    */
  private val supportedReaderFeatures =
    Set("timestampNtz", "deletionVectors", "columnMapping", "v2Checkpoint")

  // ── column mapping (PROTOCOL.md "Column Mapping") — read-side interop ──
  //
  // Mapped tables (`delta.columnMapping.mode` = name|id) store every
  // column under a stable PHYSICAL name (`delta.columnMapping.
  // physicalName`, typically `col-<uuid>`) so logical renames/drops are
  // metadata-only; `id` mode additionally makes the parquet FIELD ID
  // (`delta.columnMapping.id`) the authoritative resolution key. The
  // mapping is carried per-field in schemaString's metadata, which
  // `DataType.fromJson` preserves — Snapshot.schema stays LOGICAL and
  // these helpers translate at the file boundary. Partition values come
  // from the add actions (keyed by physical name): the protocol makes
  // the log authoritative, and mapped writers do not guarantee hive
  // directory layout. This engine READS mapped tables; writes refuse
  // loudly (this writer emits protocol-1 logical-named files — landing
  // one in a mapped table would corrupt it).

  private val CmModeProp = "delta.columnMapping.mode"
  private val CmPhysKey = "delta.columnMapping.physicalName"
  private val CmIdKey = "delta.columnMapping.id"
  /** Spark's parquet field-id resolution key (ParquetUtils). */
  private val ParquetFieldIdKey = "parquet.field.id"

  private[graft] def mappingMode(config: Map[String, String]): String =
    config.getOrElse(CmModeProp, "none") match {
      case m @ ("none" | "name" | "id") => m
      case other => sys.error(
        s"unknown $CmModeProp '$other'; this reader implements none|name|id")
    }

  private def physName(f: StructField): String =
    if (f.metadata.contains(CmPhysKey)) f.metadata.getString(CmPhysKey)
    else f.name

  private def cmFieldId(f: StructField): Option[Long] =
    if (f.metadata.contains(CmIdKey))
      try Some(f.metadata.getLong(CmIdKey)) catch { case _: Exception => None }
    else None

  /** Does any field at-or-below `dt` read under a different physical
    * name? (When false the logical frame needs no rebuild.)
    */
  private def needsRemap(dt: DataType): Boolean = dt match {
    case st: StructType =>
      st.fields.exists(f => physName(f) != f.name || needsRemap(f.dataType))
    case at: ArrayType => needsRemap(at.elementType)
    case mt: MapType => needsRemap(mt.keyType) || needsRemap(mt.valueType)
    case _ => false
  }

  /** The parquet-facing shape of a logical schema: every (nested) field
    * renamed to its physical name; `withIds` additionally stamps
    * `parquet.field.id` so Spark's reader resolves by FIELD ID (`id`
    * mode's contract — the file's column names may be anything).
    */
  private[graft] def physicalReadType(dt: DataType, withIds: Boolean): DataType =
    dt match {
      case st: StructType => StructType(st.fields.map { f =>
        val mb = new org.apache.spark.sql.types.MetadataBuilder()
        if (withIds) cmFieldId(f).foreach(mb.putLong(ParquetFieldIdKey, _))
        StructField(physName(f), physicalReadType(f.dataType, withIds),
          f.nullable, mb.build())
      })
      case at: ArrayType =>
        at.copy(elementType = physicalReadType(at.elementType, withIds))
      case mt: MapType => mt.copy(
        keyType = physicalReadType(mt.keyType, withIds),
        valueType = physicalReadType(mt.valueType, withIds))
      case other => other
    }

  /** Physically-named column → the logical value, rebuilding nested
    * structs/arrays/maps only where a name below actually differs.
    */
  private def remapExpr(c: org.apache.spark.sql.Column, logical: DataType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{struct, transform, transform_keys, transform_values, when}
    logical match {
      case st: StructType if needsRemap(st) =>
        val rebuilt = struct(st.fields.toIndexedSeq.map(f =>
          remapExpr(c.getField(physName(f)), f.dataType).as(f.name)): _*)
        when(c.isNotNull, rebuilt) // keep null structs null, not struct-of-nulls
      case at: ArrayType if needsRemap(at) =>
        transform(c, x => remapExpr(x, at.elementType))
      case mt: MapType if needsRemap(mt) =>
        val vs =
          if (needsRemap(mt.valueType))
            transform_values(c, (_, v) => remapExpr(v, mt.valueType))
          else c
        if (needsRemap(mt.keyType))
          transform_keys(vs, (k, _) => remapExpr(k, mt.keyType))
        else vs
      case _ => c
    }
  }

  private def quoted(name: String): String =
    "`" + name.replace("`", "``") + "`"

  /** Logical column → its physical write shape (the inverse of
    * [[remapExpr]]): nested structs/arrays/maps rebuild under physical
    * names wherever one differs.
    */
  private def toPhysExpr(c: org.apache.spark.sql.Column, logical: DataType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{struct, transform, transform_keys, transform_values, when}
    logical match {
      case st: StructType if needsRemap(st) =>
        val rebuilt = struct(st.fields.toIndexedSeq.map(f =>
          toPhysExpr(c.getField(f.name), f.dataType).as(physName(f))): _*)
        when(c.isNotNull, rebuilt)
      case at: ArrayType if needsRemap(at) =>
        transform(c, x => toPhysExpr(x, at.elementType))
      case mt: MapType if needsRemap(mt) =>
        val vs =
          if (needsRemap(mt.valueType))
            transform_values(c, (_, v) => toPhysExpr(v, mt.valueType))
          else c
        if (needsRemap(mt.keyType))
          transform_keys(vs, (k, _) => toPhysExpr(k, mt.keyType))
        else vs
      case _ => c
    }
  }

  /** WRITER features whose contracts this engine's commits honor.
    * Everything else enabled on a table makes commits refuse: the
    * protocol binds every writer to every enabled writer feature
    * (rowTracking's baseRowId, inCommitTimestamp's commitInfo field,
    * domainMetadata preservation, …) — appending while ignoring one
    * corrupts what conformant readers rely on, even though the append
    * itself "works". Conditionally-vacuous features (invariants,
    * checkConstraints, generatedColumns, identityColumns) pass exactly
    * when the table defines none of the constructs they'd govern.
    */
  private val supportedWriterFeatures = Set(
    "appendOnly", "columnMapping", "deletionVectors", "changeDataFeed",
    "timestampNtz", "v2Checkpoint", "vacuumProtocolCheck",
    // commits stamp a monotonic commitInfo.inCommitTimestamp when the
    // table enables it (see commit())
    "inCommitTimestamp",
    // r16: domainMetadata actions replay, carry through checkpoints,
    // and never drop; rowTracking appends assign fresh baseRowIds past
    // the delta.rowTracking watermark and bump it in the same commit
    // (row-REWRITING ops refuse inside commit() — id preservation needs
    // materialized columns this engine doesn't write)
    "domainMetadata", "rowTracking")

  /** PROTOCOL.md's legacy implication table: the writer features a
    * pre-table-features `minWriterVersion` binds. ONE copy — both the
    * write gate ([[checkWriterFeatures]]) and the protocol emitter
    * ([[commit]]'s upgrade block) read it, so they can never
    * desynchronize.
    */
  private def impliedWriterFeatures(minWriter: Int): Seq[String] =
    if (minWriter >= 7) Seq.empty
    else Seq(
      2 -> Seq("appendOnly", "invariants"),
      3 -> Seq("checkConstraints"),
      4 -> Seq("changeDataFeed", "generatedColumns"),
      5 -> Seq("columnMapping"),
      6 -> Seq("identityColumns")).collect {
        case (v, fs) if minWriter >= v => fs }.flatten

  private def checkWriterFeatures(table: String, snap: Snapshot,
      removesData: Boolean): Unit = {
    val (minWriter, explicit) = snap.protocolJson.map { pj =>
      val n = mapper.readTree(pj)
      val mw = Option(n.get("minWriterVersion")).map(_.asInt()).getOrElse(2)
      val f = Option(n.get("writerFeatures")).filterNot(_.isNull)
        .map(a => (0 until a.size()).map(a.get(_).asText()).toSet)
        .getOrElse(Set.empty[String])
      (mw, f)
    }.getOrElse((2, Set.empty[String]))
    // legacy minWriterVersion implies features (PROTOCOL.md table)
    val enabled = explicit ++ impliedWriterFeatures(minWriter)
    // Delta allows invariants / generation expressions / identity
    // metadata on NESTED struct fields too — probe the whole type tree,
    // not just the top level, or a nested contract slips past the gate
    def anyFieldMeta(dt: DataType, key: String): Boolean = dt match {
      case st: StructType => st.fields.exists(f =>
        f.metadata.contains(key) || anyFieldMeta(f.dataType, key))
      case at: ArrayType => anyFieldMeta(at.elementType, key)
      case mt: MapType => anyFieldMeta(mt.keyType, key) || anyFieldMeta(mt.valueType, key)
      case _ => false
    }
    def fieldMeta(key: String): Boolean = anyFieldMeta(snap.schema, key)
    val vacuous = Set(
      "invariants" -> !fieldMeta("delta.invariants"),
      "checkConstraints" -> !snap.configuration.keys.exists(_.startsWith("delta.constraints.")),
      "generatedColumns" -> !fieldMeta("delta.generationExpression"),
      "identityColumns" -> !fieldMeta("delta.identity.start"))
      .collect { case (f, true) => f }
    val unsupported = enabled -- supportedWriterFeatures -- vacuous
    require(unsupported.isEmpty,
      s"$table enables writer features ${unsupported.toSeq.sorted.mkString(", ")} " +
        "whose contracts this engine's commits do not honor (ignoring one " +
        "corrupts what conformant readers rely on); the table stays " +
        "readable — route writes through a writer that implements them")
    // appendOnly binds data-changing removes, not OPTIMIZE swaps
    if (removesData && (enabled.contains("appendOnly") &&
        snap.configuration.get("delta.appendOnly").exists(_.equalsIgnoreCase("true"))))
      sys.error(s"$table is append-only (delta.appendOnly=true); " +
        "refusing a commit that removes live rows")
  }

  /** Any (nested) field at-or-below `dt` carrying a columnMapping id —
    * the shape this writer cannot stamp below the top level (Catalyst
    * expressions cannot carry NESTED field metadata).
    */
  private def nestedCmIds(dt: DataType): Boolean = dt match {
    case st: StructType =>
      st.fields.exists(f => cmFieldId(f).isDefined || nestedCmIds(f.dataType))
    case at: ArrayType => nestedCmIds(at.elementType)
    case mt: MapType => nestedCmIds(mt.keyType) || nestedCmIds(mt.valueType)
    case _ => false
  }

  /** LOGICAL frame → the physical write shape of a mapped table: every
    * field under its physical name with the top-level parquet field id
    * stamped via alias metadata; `passThrough` columns (the cdc
    * `_change_type`) ride unchanged after the mapped columns.
    */
  private def toMappedPhysFrame(df: DataFrame, schema: StructType,
      passThrough: Seq[String] = Seq.empty,
      /** id-mode tables with NESTED mappings (r15): readers bind nested
        * columns by parquet field id, which Catalyst aliases cannot
        * stamp below the top level — the frame re-types through one
        * external-row pass under the full physical schema (ids at every
        * depth). Costs a codegen break; paid ONLY by id-mode nested
        * tables (name-mode readers bind by physicalName at every depth,
        * no per-leaf ids needed). */
      stampNestedIds: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.sparkSession.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val sel = df.select(schema.fields.toIndexedSeq.map { f =>
      val mb = new org.apache.spark.sql.types.MetadataBuilder()
      cmFieldId(f).foreach(mb.putLong(ParquetFieldIdKey, _))
      toPhysExpr(col(quoted(f.name)), f.dataType).as(physName(f), mb.build())
    } ++ passThrough.map(c => col(quoted(c))): _*)
    if (!stampNestedIds) sel
    else {
      val phys = physicalReadType(schema, withIds = true)
        .asInstanceOf[StructType]
      val full = StructType(phys.fields ++
        passThrough.map(c => sel.schema(sel.schema.fieldIndex(c))))
      sel.sparkSession.createDataFrame(sel.rdd, full)
    }
  }

  /** Does landing `schema`'s data files require the external-row
    * nested-id pass? Only when the table is id-MODE and some mapping
    * lives below the top level.
    */
  private def needsNestedIdStamp(configuration: Map[String, String],
      schema: StructType): Boolean =
    mappingMode(configuration) == "id" &&
      schema.fields.exists(f => nestedCmIds(f.dataType))

  /** Physical names of a snapshot's partition columns (what mapped hive
    * dirs — and therefore the add actions' partitionValues keys — use).
    */
  private def mappedPartCols(s: Snapshot): Seq[String] =
    s.partitionColumns.map(pc => physName(s.schema(s.schema.fieldIndex(pc))))

  /** Land a LOGICAL frame as physical-shaped data files of a mapped
    * table (phys names, field ids, phys-keyed hive dirs and stats) —
    * the one placement path CREATE, appends, DML postimages, and
    * OPTIMIZE rewrites of mapped tables share.
    */
  private def placeMappedDataFiles(spark: SparkSession, table: String,
      s0: Snapshot, df: DataFrame,
      passThrough: Seq[String] = Seq.empty): Seq[(String, AddInfo)] =
    placeMappedDataFiles(spark, table, s0.schema, s0.partitionColumns, df,
      needsNestedIdStamp(s0.configuration, s0.schema), passThrough)

  private def placeMappedDataFiles(spark: SparkSession, table: String,
      schema: StructType, partitionColumns: Seq[String],
      df: DataFrame, stampNestedIds: Boolean,
      /** Non-mapped physical columns riding after the mapped ones —
        * rowTracking's materialized id columns (r17). */
      passThrough: Seq[String]): Seq[(String, AddInfo)] = {
    val physSchema = physicalReadType(schema, withIds = true)
      .asInstanceOf[StructType]
    val physPartCols = partitionColumns.map(pc =>
      physName(schema(schema.fieldIndex(pc))))
    placeDataFiles(spark, table, physSchema, physPartCols,
      toMappedPhysFrame(df, schema, passThrough = passThrough,
        stampNestedIds = stampNestedIds))
  }

  /** Mint a fresh column mapping over `schema` (mapped-table CREATE —
    * this writer OWNS the id allocation for tables it creates): every
    * struct field, at any depth, gets a sequential
    * `delta.columnMapping.id` and a `col-<uuid>` physicalName — the
    * shape delta-spark mints under `delta.columnMapping.mode=name`.
    * Returns (mapped schema, maxColumnId).
    */
  private def mintMapping(schema: StructType): (StructType, Int) = {
    var next = 0
    def mint(dt: DataType): DataType = dt match {
      case st: StructType => StructType(st.fields.map { f =>
        next += 1
        val id = next
        val inner = mint(f.dataType)
        f.copy(dataType = inner, metadata =
          new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putLong(CmIdKey, id.toLong)
            .putString(CmPhysKey, s"col-${UUID.randomUUID()}")
            .build())
      })
      case at: ArrayType => at.copy(elementType = mint(at.elementType))
      case mt: MapType =>
        mt.copy(keyType = mint(mt.keyType), valueType = mint(mt.valueType))
      case other => other
    }
    val mapped = mint(schema).asInstanceOf[StructType]
    (mapped, next)
  }

  /** Backstop guard on [[commit]]: a LOGICAL-named data file landing in
    * a mapped table would silently null out every mapped column for
    * conformant readers — only the mapped placement paths (which pass
    * `allowMapped`) may add files there.
    */
  private def requireWritable(table: String, configuration: Map[String, String]): Unit = {
    val m = mappingMode(configuration)
    require(m == "none",
      s"$table uses delta.columnMapping.mode=$m; data files must land " +
        "through the mapped placement path (physical names + field ids) — " +
        "this commit carries logical-named files")
  }

  /** The public gating property for merge-on-read DML. */
  private[graft] def dvEnabled(configuration: Map[String, String]): Boolean =
    configuration.get("delta.enableDeletionVectors")
      .exists(_.equalsIgnoreCase("true"))

  private def checkProtocol(table: String,
      p: com.fasterxml.jackson.databind.JsonNode): Unit = {
    val minReader = Option(p.get("minReaderVersion")).map(_.asInt()).getOrElse(1)
    val features: Set[String] = Option(p.get("readerFeatures")) match {
      case Some(f) if f.isArray =>
        (0 until f.size()).map(i => f.get(i).asText()).toSet
      case _ => Set.empty
    }
    if (minReader >= 3) {
      val unsupported = features -- supportedReaderFeatures
      require(unsupported.isEmpty,
        s"$table requires reader features ${unsupported.mkString(", ")} " +
          "this reader does not implement (e.g. a deletion vector ignored " +
          "would silently over-return rows); refusing to read")
    } else require(minReader <= 2, // 2 = legacy column mapping (honored)
      s"$table requires minReaderVersion=$minReader, which this reader " +
        "does not implement; refusing to read")
  }

  /** Snapshot read: the add-listed files only (orphans and uncommitted
    * data are invisible — ACID isolation), latest committed schema. For
    * a partitioned table the files sit in hive-style `col=val/` dirs
    * below the table root; reading them with `basePath` re-derives the
    * partition columns, so partition-predicate pushdown (PartitionFilters
    * in the scan) works exactly as on a native Delta table.
    *
    * `scanFilter` (a SQL boolean over the table's columns) prunes whole
    * FILES against the add actions' `stats` (min/max/nullCount, the
    * protocol's file-skipping device) plus partitionValues before Spark
    * ever lists them, then re-applies exactly as a normal filter —
    * with [[optimize]]'s ZORDER this is the delta 100 TB scan story,
    * same engine as the Iceberg manifest-metrics path.
    */
  def read(spark: SparkSession, table: String,
      asOf: Option[Long] = None,
      scanFilter: Option[String] = None): DataFrame = {
    val s = snapshot(spark, table, asOf)
      .getOrElse(sys.error(s"$table is not a Delta table (no _delta_log)"))
    val (kept, _) = prune(spark, s, scanFilter)
    val base = readKept(spark, table, s, kept)
    scanFilter.map(_.trim).filter(_.nonEmpty)
      .map(f => base.filter(org.apache.spark.sql.functions.expr(f)))
      .getOrElse(base)
  }

  /** The MATERIALIZED row-id column names a rowTracking rewrite must
    * write: the table's declared names, or freshly minted ones whose
    * config entries (`conf`) ride the SAME commit (r16).
    */
  private def mintRowIdCols(s: Snapshot): (String, String, Map[String, String]) = {
    val idC = s.configuration
      .get("delta.rowTracking.materializedRowIdColumnName")
    val verC = s.configuration
      .get("delta.rowTracking.materializedRowCommitVersionColumnName")
    val idN = idC.getOrElse(s"_row-id-col-${UUID.randomUUID()}")
    val verN = verC.getOrElse(s"_row-commit-version-col-${UUID.randomUUID()}")
    val conf =
      (if (idC.isEmpty)
        Map("delta.rowTracking.materializedRowIdColumnName" -> idN)
      else Map.empty[String, String]) ++
      (if (verC.isEmpty)
        Map("delta.rowTracking.materializedRowCommitVersionColumnName" -> verN)
      else Map.empty[String, String])
    (idN, verN, conf)
  }

  /** rowTracking READ (r16): [[read]] plus `_row_id` /
    * `_row_commit_version` per the protocol's fresh-row rule —
    * baseRowId + the row's position in its file (DV retractions keep
    * survivors' positions, hence their ids), overridden by the
    * MATERIALIZED columns where the table declares them and a file
    * carries values (a third-party writer's preserved ids after its
    * DML). Pre-feature files return null ids — lineage was never
    * tracked for their rows.
    */
  def readWithRowIds(spark: SparkSession, table: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit}
    import spark.implicits._
    val s = snapshot(spark, table)
      .getOrElse(sys.error(s"$table is not a Delta table (no _delta_log)"))
    require(s.rowTrackingSupported,
      s"$table does not carry the rowTracking writer feature")
    val matId = s.configuration
      .get("delta.rowTracking.materializedRowIdColumnName")
    val matVer = s.configuration
      .get("delta.rowTracking.materializedRowCommitVersionColumnName")
    // mapped tables compose (r17): the materialized names are PHYSICAL
    // (hidden columns outside the mapping) — readKept routes them as
    // extra physical read fields
    val extras = (matId.toSeq ++ matVer.toSeq)
      .map(n => StructField(n, LongType, nullable = true))
    val df = readKept(spark, table, s, s.files, withMeta = true,
      extraFields = extras)
    val baseDf = broadcast(s.adds.map { case (rel, info) =>
      (rel, info.baseRowId, info.defaultRowCommitVersion)
    }.toDF(dvFileCol, "__graft_base_row_id", "__graft_commit_ver"))
    df.join(baseDf, dvFileCol)
      .withColumn("_row_id", coalesce(
        matId.map(col).getOrElse(lit(null).cast(LongType)),
        col("__graft_base_row_id") + col(dvPosCol)))
      .withColumn("_row_commit_version", coalesce(
        matVer.map(col).getOrElse(lit(null).cast(LongType)),
        col("__graft_commit_ver")))
      .select(s.schema.fieldNames.map(col).toIndexedSeq :+
        col("_row_id") :+ col("_row_commit_version"): _*)
  }

  /** Rows of specific ADDED files with their row-tracking identity
    * attached (r17 — the streaming view's add materialization):
    * `_row_id` = the add's baseRowId + the row's position in its file
    * and `_row_commit_version` = its defaultRowCommitVersion, each
    * overridden by the table's MATERIALIZED columns where the file
    * carries values (a third-party writer's preserved ids). `adds` =
    * (rel path, partitionValues, baseRowId, defaultRowCommitVersion)
    * from the commit's OWN action lines — a pure function of the log,
    * so crash replays materialize identical bytes — read by explicit
    * path (a later OPTIMIZE may have tombstoned them out of the
    * current snapshot; the bytes stay until VACUUM).
    */
  private[graft] def readAddsWithRowIds(spark: SparkSession, table: String,
      adds: Seq[(String, Seq[(String, String)], Option[Long], Option[Long])])
      : DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit, substring_index}
    import spark.implicits._
    val s = snapshot(spark, table)
      .getOrElse(sys.error(s"$table is not a Delta table (no _delta_log)"))
    val matId = s.configuration
      .get("delta.rowTracking.materializedRowIdColumnName")
    val matVer = s.configuration
      .get("delta.rowTracking.materializedRowCommitVersionColumnName")
    val extras = (matId.toSeq ++ matVer.toSeq)
      .map(n => StructField(n, LongType, nullable = true))
    val root = Paths.get(table).toAbsolutePath.normalize
    val names = adds.map(a => fileNameOf(a._1))
    require(names.distinct.size == names.size,
      s"$table: one commit's adds share a file name; row-id attachment " +
        "keys on unique names")
    val raw =
      if (mappingMode(s.configuration) != "none")
        readMappedFiles(spark, table, s,
          adds.map { case (rel, pv, _, _) => (rel, pv, None) },
          extraPhys = extras, withMeta = true)
          .withColumn(dvNameCol, substring_index(col(dvFileCol), "/", -1))
      else
        spark.read.schema(StructType(s.schema.fields ++ extras))
          .option("basePath", table)
          .parquet(adds.map(a => root.resolve(a._1).toString): _*)
          .withColumn(dvNameCol,
            substring_index(col("_metadata.file_path"), "/", -1))
          .withColumn(dvPosCol, col("_metadata.row_index"))
    val baseDf = broadcast(adds.map { case (rel, _, b, v) =>
      (fileNameOf(rel), b, v)
    }.toDF(dvNameCol, "__graft_base_row_id", "__graft_commit_ver"))
    raw.join(baseDf, dvNameCol)
      .withColumn("_row_id", coalesce(
        matId.map(col).getOrElse(lit(null).cast(LongType)),
        col("__graft_base_row_id") + col(dvPosCol)))
      .withColumn("_row_commit_version", coalesce(
        matVer.map(col).getOrElse(lit(null).cast(LongType)),
        col("__graft_commit_ver")))
      .select(s.schema.fieldNames.map(col).toIndexedSeq :+
        col("_row_id") :+ col("_row_commit_version"): _*)
  }

  private val dvNameCol = "__graft_dv_name"
  private[graft] val dvFileCol = "__graft_file"
  private[graft] val dvPosCol = "__graft_pos"

  private def fileNameOf(p: String): String =
    p.substring(p.lastIndexOf('/') + 1)

  /** Read `kept` active files (rel paths) of snapshot `s` with DELETION
    * VECTORS applied: files carrying a DV filter through a broadcast
    * name→bitmap O(1)-contains UDF over `_metadata.row_index` (bitmap
    * bytes are roaring-compressed — bounded by the DVs, never the
    * rows); clean files stay a plain whole-stage-codegen scan.
    * `withMeta` adds each row's rel path (`__graft_file`) + position
    * (`__graft_pos`) — what the DV writer needs to target rows. Both
    * the bitmap map and the name→rel lookup key on FILE NAMES, which
    * are unique by construction (fresh UUID per linked file) and
    * asserted loudly here.
    */
  private[graft] def readKept(spark: SparkSession, table: String, s: Snapshot,
      kept: Seq[String], withMeta: Boolean = false,
      /** Physical columns beyond the table schema some files MAY carry
        * (rowTracking's materialized row-id columns, r16) — absent files
        * read null. Unmapped tables only. */
      extraFields: Seq[StructField] = Seq.empty): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, substring_index, udf}
    if (mappingMode(s.configuration) != "none") {
      // extraFields on a mapped table are the rowTracking materialized
      // columns (r17): the config value IS the physical column name
      // (hidden columns live outside the logical mapping), so they read
      // as extra PHYSICAL fields — absent files return null
      val infoOf = s.adds.toMap
      return readMappedFiles(spark, table, s,
        kept.map { rel =>
          val i = infoOf(rel); (rel, i.partitionValues, i.dv)
        }, extraPhys = extraFields, withMeta = withMeta)
    }
    val byRel = s.adds.toMap
    val root = Paths.get(table).toAbsolutePath.normalize
    val readSchema = StructType(s.schema.fields ++ extraFields)
    val schemaCols =
      (s.schema.fieldNames ++ extraFields.map(_.name)).map(col).toIndexedSeq
    if (kept.isEmpty) {
      val sch = if (!withMeta) readSchema else StructType(readSchema.fields ++ Seq(
        StructField(dvFileCol, StringType), StructField(dvPosCol, LongType)))
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], sch)
    }
    val (dirty, clean) = kept.partition(rel =>
      byRel(rel).dv.exists(_.cardinality > 0))
    val checkSet = if (withMeta) kept else dirty
    checkSet.groupBy(fileNameOf).find(_._2.size > 1).foreach { case (n, ps) =>
      sys.error(s"$table: active files share the name $n (${ps.mkString(", ")}); " +
        "deletion vectors key on unique names — OPTIMIZE the table first.")
    }
    def metaRead(rels: Seq[String]): DataFrame =
      spark.read.schema(readSchema).option("basePath", table)
        .parquet(rels.map(r => root.resolve(r).toString): _*)
        .withColumn(dvNameCol,
          substring_index(col("_metadata.file_path"), "/", -1))
        .withColumn(dvPosCol, col("_metadata.row_index"))
    val dirtyDf =
      if (dirty.isEmpty) None
      else {
        val bitmaps: Map[String, DeletionVectors.Bitmap] =
          dirty.map(rel => fileNameOf(rel) -> byRel(rel).dv.get.load(root)).toMap
        val bc = spark.sparkContext.broadcast(bitmaps)
        // codegen'd predicate (DvAliveF) — the DV'd scan stays inside
        // whole-stage codegen instead of paying a UDF boxing boundary
        val alive = org.apache.spark.sql.GraftShim.column(
          graft.functions.DvAliveF(
            org.apache.spark.sql.GraftShim.expression(col(dvNameCol)),
            org.apache.spark.sql.GraftShim.expression(col(dvPosCol)), bc))
        Some(metaRead(dirty).filter(alive))
      }
    if (!withMeta) {
      val cleanDf =
        if (clean.isEmpty) None
        else Some(spark.read.schema(readSchema).option("basePath", table)
          .parquet(clean.map(r => root.resolve(r).toString): _*)
          .select(schemaCols: _*))
      (cleanDf ++ dirtyDf.map(_.select(schemaCols: _*))).reduce(_ unionAll _)
    } else {
      val all = ((if (clean.isEmpty) None else Some(metaRead(clean))) ++ dirtyDf)
        .reduce(_ unionAll _)
      import spark.implicits._
      val lookup = broadcast(kept.map(r => (fileNameOf(r), r))
        .toDF(dvNameCol, dvFileCol))
      all.join(lookup, dvNameCol)
        .select(schemaCols :+ col(dvFileCol) :+ col(dvPosCol): _*)
    }
  }

  /** Scan files of a COLUMN-MAPPED table: physical-schema read (by
    * parquet FIELD ID in `id` mode — file column names may be
    * arbitrary), deletion vectors applied, partition columns attached
    * from the log's `partitionValues` (keyed by PHYSICAL name — the
    * protocol's authoritative source; mapped writers guarantee no hive
    * layout), then the physical→logical remap. `files` = (rel path,
    * partitionValues as recorded, DV). `extraPhys` = unmapped columns
    * physically present beyond the data schema (the cdc files'
    * `_change_type`), passed through under their own names.
    *
    * One scan covers clean and DV'd files alike — [[graft.functions
    * .DvAliveF]] passes names without a bitmap, so clean files pay one
    * codegen'd hash probe per row instead of a second scan+union; fine
    * for a read-only interop path.
    */
  private def readMappedFiles(spark: SparkSession, table: String, s: Snapshot,
      files: Seq[(String, Seq[(String, String)], Option[DeletionVectors.Descriptor])],
      extraPhys: Seq[StructField] = Seq.empty,
      /** Adds `__graft_file` (rel path) + `__graft_pos` per row — what
        * the DML writers target rows by, mirroring [[readKept]]. */
      withMeta: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, substring_index}
    val mode = mappingMode(s.configuration)
    val outSchema = StructType(s.schema.fields ++ extraPhys ++
      (if (withMeta) Seq(StructField(dvFileCol, StringType),
        StructField(dvPosCol, LongType)) else Seq.empty))
    if (files.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
    val root = Paths.get(table).toAbsolutePath.normalize
    // both the DV bitmaps and the partition attach key on FILE NAME
    files.map(_._1).groupBy(fileNameOf).find(_._2.size > 1).foreach { case (n, ps) =>
      sys.error(s"$table: files share the name $n (${ps.mkString(", ")}); " +
        "mapped reads key on unique names")
    }
    val dataFields = s.schema.fields.filterNot(f => s.partitionColumns.contains(f.name))
    val physSchema = StructType(
      physicalReadType(StructType(dataFields), mode == "id")
        .asInstanceOf[StructType].fields ++ extraPhys)
    val bitmaps: Map[String, DeletionVectors.Bitmap] = files.collect {
      case (rel, _, Some(dv)) if dv.cardinality > 0 => fileNameOf(rel) -> dv.load(root)
    }.toMap
    // id-mode physSchema carries parquet.field.id stamps → the fence
    // scopes fieldId.read + the nested-pruning disable around THIS scan
    // (r17, replacing the session-global flip); name mode passes through
    var df = FencedScan(spark, physSchema) {
      val d0 = spark.read.schema(physSchema)
        .parquet(files.map(f => root.resolve(f._1).toString): _*)
        .withColumn(dvNameCol,
          substring_index(col("_metadata.file_path"), "/", -1))
      if (bitmaps.nonEmpty || withMeta)
        d0.withColumn(dvPosCol, col("_metadata.row_index"))
      else d0
    }
    if (bitmaps.nonEmpty) {
      val bc = spark.sparkContext.broadcast(bitmaps)
      df = df.filter(org.apache.spark.sql.GraftShim.column(graft.functions.DvAliveF(
        org.apache.spark.sql.GraftShim.expression(col(dvNameCol)),
        org.apache.spark.sql.GraftShim.expression(col(dvPosCol)), bc)))
    }
    if (s.partitionColumns.nonEmpty) {
      val partFields = s.partitionColumns.map(pc => s.schema(s.schema.fieldIndex(pc)))
      val raw = files.map { case (rel, pvs, _) =>
        val pv = pvs.toMap
        Row.fromSeq(fileNameOf(rel) +:
          partFields.map(f => pv.getOrElse(physName(f), null)))
      }
      val rawSchema = StructType(StructField(dvNameCol, StringType) +:
        partFields.map(f => StructField(f.name, StringType)))
      // hive-string values cast to the declared types (dates/timestamps/
      // numerics all serialize castably per the protocol)
      val lookup = partFields.foldLeft(
        spark.createDataFrame(raw.asJava, rawSchema))(
        (d, f) => d.withColumn(f.name, col(quoted(f.name)).cast(f.dataType)))
      df = df.join(broadcast(lookup), dvNameCol)
    }
    if (withMeta) {
      import spark.implicits._
      val lookup = broadcast(files.map(f => (fileNameOf(f._1), f._1))
        .toDF(dvNameCol, dvFileCol))
      df = df.join(lookup, dvNameCol)
    }
    df.select(s.schema.fields.toIndexedSeq.map { f =>
      if (s.partitionColumns.contains(f.name)) col(quoted(f.name))
      else remapExpr(col(quoted(physName(f))), f.dataType).as(f.name)
    } ++ extraPhys.map(f => col(quoted(f.name))) ++
      (if (withMeta) Seq(col(dvFileCol), col(dvPosCol)) else Seq.empty): _*)
  }

  /** One commit's ADDED files of a column-mapped table, logical shape —
    * what the streaming view materializes instead of hard-linking raw
    * physical-named files. `adds` = (rel path, partitionValues as the
    * add action records them, phys-keyed).
    */
  private[graft] def readMappedAdds(spark: SparkSession, table: String,
      adds: Seq[(String, Seq[(String, String)])]): DataFrame = {
    val s = snapshot(spark, table)
      .getOrElse(sys.error(s"$table is not a Delta table (no _delta_log)"))
    readMappedFiles(spark, table, s, adds.map { case (r, pv) => (r, pv, None) })
  }

  /** CHANGE DATA FEED batch read (delta-spark's `table_changes`): the
    * change rows of versions `fromVersion..toVersion` (default: current)
    * as table columns + `_change_type` + `_commit_version` +
    * `_commit_timestamp`. Per commit:
    *
    *   - commits carrying `cdc` actions read ONLY their `_change_data/`
    *     files (the protocol rule — their adds/removes describe the file
    *     swap, not the logical change)
    *   - pure appends (dataChange adds, no cdc) read the added files as
    *     `insert` rows — no cdc write amplification on the append path
    *   - a commit with dataChange REMOVES but no cdc action predates
    *     `delta.enableChangeDataFeed` → ERROR (the change rows were
    *     never recorded and cannot be reconstructed)
    *   - dataChange=false commits (OPTIMIZE/ZORDER) contribute nothing
    *
    * Reads the latest table schema (evolution is append-only, so older
    * files surface null for later columns). The per-version commit JSON
    * must still exist — a version aged out past a checkpoint is an
    * ERROR, not silently-missing changes.
    */
  def readChanges(spark: SparkSession, table: String, fromVersion: Long,
      toVersion: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val s = snapshot(spark, table)
      .getOrElse(sys.error(s"$table is not a Delta table (no _delta_log)"))
    val hi = toVersion.getOrElse(s.version)
    require(fromVersion >= 0 && fromVersion <= hi,
      s"readChanges: bad version range $fromVersion..$hi")
    require(hi <= s.version, s"$table has no version $hi yet")
    val dir = logDir(table)
    val schema = s.schema
    val schemaCols = schema.fieldNames.map(col).toIndexedSeq
    val mapped = mappingMode(s.configuration) != "none"
    def pvOf(a: com.fasterxml.jackson.databind.JsonNode): Seq[(String, String)] =
      Option(a.get("partitionValues")).map(_.properties().asScala.map(e =>
        e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText()))
        .toSeq.sorted).getOrElse(Seq.empty)
    val frames = (fromVersion to hi).flatMap { v =>
      val p = dir.resolve(f"$v%020d.json")
      require(Files.exists(p),
        s"$table: version $v was aged out past a checkpoint; its change " +
          "rows cannot be reconstructed")
      val actions = Files.readAllLines(p).asScala.filter(_.nonEmpty)
        .map(mapper.readTree).toSeq
      val ts = actions.iterator.flatMap(n => Option(n.get("commitInfo")))
        .flatMap(ci => Option(ci.get("inCommitTimestamp")).filterNot(_.isNull)
          .orElse(Option(ci.get("timestamp")))).map(_.asLong())
        .nextOption().getOrElse(Files.getLastModifiedTime(p).toMillis)
      val cdcFiles = actions.filter(_.has("cdc")).map(n =>
        (decodePath(n.get("cdc").get("path").asText()), pvOf(n.get("cdc"))))
      val dcAdds = actions
        .filter(n => n.has("add") &&
          Option(n.get("add").get("dataChange")).forall(_.asBoolean(true)))
        .map(n => (decodePath(n.get("add").get("path").asText()), pvOf(n.get("add"))))
      val hasDcRemove = actions.exists(n => n.has("remove") &&
        Option(n.get("remove").get("dataChange")).forall(_.asBoolean(true)))
      val base: Option[DataFrame] =
        if (cdcFiles.nonEmpty)
          if (mapped)
            Some(readMappedFiles(spark, table, s,
              cdcFiles.map { case (f, pv) => (f, pv, None) },
              Seq(StructField(Cdf.changeTypeCol, StringType))))
          else Some(spark.read.schema(Cdf.changeSchema(schema))
            .option("basePath", Paths.get(table, Cdf.changeDataDir).toString)
            .parquet(cdcFiles.map(f => Paths.get(table, f._1).toString): _*)
            .select(schemaCols :+ col(Cdf.changeTypeCol): _*))
        else if (hasDcRemove) sys.error(
          s"$table: version $v deleted or updated rows without a change " +
            s"data feed — set ${Cdf.enableProp}=true before running DML " +
            "to record change rows")
        else if (dcAdds.nonEmpty)
          if (mapped)
            Some(readMappedFiles(spark, table, s,
              dcAdds.map { case (f, pv) => (f, pv, None) })
              .withColumn(Cdf.changeTypeCol, lit("insert")))
          else Some(spark.read.schema(schema)
            .option("basePath", Paths.get(table).toAbsolutePath.normalize.toString)
            .parquet(dcAdds.map(f => Paths.get(table, f._1).toString): _*)
            .select(schemaCols: _*)
            .withColumn(Cdf.changeTypeCol, lit("insert")))
        else None // metaData-only / OPTIMIZE commit
      base.map(_.withColumn(Cdf.commitVersionCol, lit(v))
        .withColumn(Cdf.commitTimestampCol, lit(new java.sql.Timestamp(ts))))
    }
    frames.reduceOption(_ unionAll _).getOrElse {
      val empty = StructType(Cdf.changeSchema(schema).fields ++ Seq(
        StructField(Cdf.commitVersionCol, LongType),
        StructField(Cdf.commitTimestampCol, TimestampType)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], empty)
    }
  }

  /** Active files that MAY satisfy `scanFilter` (rel paths), judged
    * against add-action stats + partition values; (kept, totalActive)
    * so callers can report skip ratios. Conservative — see
    * [[StatsPruning]].
    */
  private[graft] def planFiles(spark: SparkSession, table: String,
      asOf: Option[Long] = None, scanFilter: Option[String] = None)
      : (Seq[String], Int) = {
    val s = snapshot(spark, table, asOf)
      .getOrElse(sys.error(s"$table is not a Delta table (no _delta_log)"))
    prune(spark, s, scanFilter)
  }

  private[graft] def prune(spark: SparkSession, s: Snapshot,
      scanFilter: Option[String]): (Seq[String], Int) =
    scanFilter.map(_.trim).filter(_.nonEmpty) match {
      case None => (s.files, s.adds.size)
      case Some(f) =>
        val conj = StatsPruning.conjunctsOf(spark, f)
        // mapped tables key stats and partitionValues by PHYSICAL name
        // (path-keyed — nested leaves translate per level, r16)
        val physOf: Map[String, Seq[String]] =
          if (mappingMode(s.configuration) == "none") Map.empty
          else physPathsOf(s.schema)
        (s.adds.filter { case (_, info) =>
          val fs = addFileStats(info, physOf)
          conj.forall(c => StatsPruning.mayMatch(fs, c, s.schema))
        }.map(_._1), s.adds.size)
    }

  /** [[StatsPruning.FileStats]] view of one add action: bounds and
    * counts parse lazily from the `stats` JSON, partition values stay
    * hive strings ([[StatsPruning.partValue]] types them). `physOf`
    * translates the caller's logical names to the physical keys a
    * column-mapped table's stats/partitionValues record.
    */
  private def addFileStats(info: AddInfo,
      physOf: Map[String, Seq[String]] = Map.empty): StatsPruning.FileStats =
    new StatsPruning.FileStats {
      // `name` may be a dotted NESTED path (r16): stats JSON nests per
      // struct (the protocol shape), so the lookup walks segment by
      // segment — each translated to its physical name on mapped tables
      private def segs(name: String): Seq[String] =
        physOf.getOrElse(name, name.split('.').toSeq)
      private val pv = info.partitionValues.toMap
      private lazy val statsNode = info.stats.flatMap(s =>
        try Some(mapper.readTree(s)) catch { case _: Exception => None })
      private def field(section: String, name: String) =
        segs(name).foldLeft(
          statsNode.flatMap(n => Option(n.get(section)))) {
          (node, seg) => node.flatMap(n => Option(n.get(seg)))
        }.filterNot(_.isNull)
      def partitionValue(name: String): Option[Any] = {
        val sg = segs(name)
        if (sg.size == 1 && pv.contains(sg.head)) Some(pv(sg.head)) else None
      }
      def bounds(name: String, dt: DataType): Option[(Any, Any)] =
        for {
          lo <- field("minValues", name).flatMap(jsonStatValue(_, dt))
          hi <- field("maxValues", name).flatMap(jsonStatValue(_, dt))
        } yield (lo, hi)
      def valueCount(name: String): Option[Long] =
        if (partitionValue(name).isDefined) None
        else statsNode.flatMap(n => Option(n.get("numRecords"))).map(_.asLong)
      def nullCount(name: String): Option[Long] =
        field("nullCount", name).map(_.asLong)
    }

  /** Logical dotted path → PHYSICAL path segments for every (nested)
    * struct leaf and interior — what a mapped table's stats JSON and
    * partitionValues key by (r16: nested paths included).
    */
  private def physPathsOf(schema: StructType): Map[String, Seq[String]] = {
    val out = Map.newBuilder[String, Seq[String]]
    def walk(logical: String, phys: Seq[String], dt: DataType): Unit = dt match {
      case st: StructType => st.fields.foreach { f =>
        val lp = s"$logical.${f.name}"
        val pp = phys :+ physName(f)
        out += lp -> pp
        walk(lp, pp, f.dataType)
      }
      case _ => ()
    }
    schema.fields.foreach { f =>
      out += f.name -> Seq(physName(f))
      walk(f.name, Seq(physName(f)), f.dataType)
    }
    out.result()
  }

  /** JSON stats value → the plain JVM value [[StatsPruning.compareValues]]
    * orders (dates/timestamps serialize as ISO strings, the protocol
    * shape; None = unusable → keep the file).
    */
  private def jsonStatValue(v: com.fasterxml.jackson.databind.JsonNode,
      dt: DataType): Option[Any] =
    try dt match {
      case IntegerType if v.isNumber => Some(v.asInt)
      case LongType if v.isNumber => Some(v.asLong)
      case FloatType if v.isNumber => Some(v.asDouble.toFloat)
      case DoubleType if v.isNumber => Some(v.asDouble)
      case BooleanType if v.isBoolean => Some(v.asBoolean)
      case StringType if v.isTextual => Some(v.asText)
      case DateType if v.isTextual =>
        Some(java.time.LocalDate.parse(v.asText).toEpochDay.toInt)
      case TimestampType if v.isTextual =>
        val i = java.time.Instant.parse(v.asText)
        Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
      case _ => None
    } catch { case _: Exception => None }

  /** Harvest one fresh data file's `stats` JSON from its parquet footer
    * (numRecords always; min/max/nullCount per column where the chunk
    * statistics are present and exact — conservative, like the Iceberg
    * metrics pass). Stats are an OPTIONAL protocol field: any failure
    * degrades to None, never fails the write.
    */
  private def fileStatsJson(spark: SparkSession, dest: Path,
      dataSchema: StructType): Option[String] =
    try {
      val conf = spark.sessionState.newHadoopConf()
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(dest.toAbsolutePath.toString), conf))
      try {
        // nested STRUCT leaves harvest too (r16): chunk paths are dotted
        // and the stats JSON nests per struct, the protocol shape.
        // Array/map interiors carry no delta stats (multi-valued).
        val byName: Map[String, DataType] = {
          val out = Map.newBuilder[String, DataType]
          def walk(path: String, dt: DataType): Unit = dt match {
            case st: StructType =>
              st.fields.foreach(f => walk(s"$path.${f.name}", f.dataType))
            case _: ArrayType | _: MapType => ()
            case prim => out += path -> prim
          }
          dataSchema.fields.foreach(f => walk(f.name, f.dataType))
          out.result()
        }
        val nc = scala.collection.mutable.Map.empty[String, Long]
        val lo = scala.collection.mutable.Map.empty[String, Any]
        val hi = scala.collection.mutable.Map.empty[String, Any]
        val statsOk = scala.collection.mutable.Map.empty[String, Boolean]
        val nullsOk = scala.collection.mutable.Map.empty[String, Boolean]
        reader.getFooter.getBlocks.asScala.foreach { block =>
          block.getColumns.asScala.foreach { chunk =>
            val name = chunk.getPath.toDotString
            byName.get(name).foreach { dt =>
              val st = chunk.getStatistics
              if (st == null || st.isEmpty || !st.isNumNullsSet)
                nullsOk(name) = false
              else {
                nullsOk.getOrElseUpdate(name, true)
                if (nullsOk(name)) nc(name) = nc.getOrElse(name, 0L) + st.getNumNulls
              }
              if (st == null || st.isEmpty || !st.hasNonNullValue)
                statsOk(name) = false
              else {
                statsOk.getOrElseUpdate(name, true)
                if (statsOk(name)) {
                  val mn = IcebergLog.parquetStatValue(st.genericGetMin.asInstanceOf[AnyRef], dt)
                  val mx = IcebergLog.parquetStatValue(st.genericGetMax.asInstanceOf[AnyRef], dt)
                  if (mn == null || mx == null) statsOk(name) = false
                  else {
                    if (!lo.contains(name) || StatsPruning.compareValues(mn, lo(name), dt) < 0)
                      lo(name) = mn
                    if (!hi.contains(name) || StatsPruning.compareValues(mx, hi(name), dt) > 0)
                      hi(name) = mx
                  }
                }
              }
            }
          }
        }
        val root = mapper.createObjectNode()
        root.put("numRecords", reader.getRecordCount)
        val minO = root.putObject("minValues")
        val maxO = root.putObject("maxValues")
        val nullO = root.putObject("nullCount")
        // nested leaves land under nested objects (minValues.s.q — the
        // protocol's shape), intermediate objects created on demand
        def obj(o: com.fasterxml.jackson.databind.node.ObjectNode,
            segs: Seq[String]): com.fasterxml.jackson.databind.node.ObjectNode =
          segs.foldLeft(o) { (cur, seg) =>
            cur.get(seg) match {
              case x: com.fasterxml.jackson.databind.node.ObjectNode => x
              case _ => cur.putObject(seg)
            }
          }
        def emit(path: Seq[String], dt: DataType): Unit = dt match {
          case st: StructType =>
            st.fields.foreach(f => emit(path :+ f.name, f.dataType))
          case _: ArrayType | _: MapType => ()
          case prim =>
            val key = path.mkString(".")
            if (statsOk.getOrElse(key, false)) {
              putStatValue(obj(minO, path.init), path.last, lo(key), prim)
              putStatValue(obj(maxO, path.init), path.last, hi(key), prim)
            }
            if (nullsOk.getOrElse(key, false))
              obj(nullO, path.init).put(path.last, nc(key))
            ()
        }
        dataSchema.fields.foreach(f => emit(Seq(f.name), f.dataType))
        Some(root.toString)
      } finally reader.close()
    } catch { case _: Exception => None }

  private def putStatValue(o: com.fasterxml.jackson.databind.node.ObjectNode,
      name: String, v: Any, dt: DataType): Unit = dt match {
    case IntegerType => o.put(name, v.asInstanceOf[Int])
    case LongType => o.put(name, v.asInstanceOf[Long])
    case FloatType => o.put(name, v.asInstanceOf[Float])
    case DoubleType => o.put(name, v.asInstanceOf[Double])
    case BooleanType => o.put(name, v.asInstanceOf[Boolean])
    case StringType => o.put(name, v.asInstanceOf[String])
    case DateType =>
      o.put(name, java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString)
    case TimestampType =>
      val us = v.asInstanceOf[Long]
      o.put(name, java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L).toString)
    case _ => ()
  }

  /** Probe seam (SCALE.md): re-harvest every active file's footer stats,
    * serially or on the SpoolLink pool — isolates the commit path's
    * per-added-file cost at bulk-load file counts. Returns (files,
    * seconds).
    */
  private[graft] def probeHarvest(spark: SparkSession, table: String,
      parallel: Boolean): (Int, Double) = {
    val s = snapshot(spark, table)
      .getOrElse(sys.error(s"$table is not a Delta table"))
    val dataSchema = StructType(
      s.schema.filterNot(f => s.partitionColumns.contains(f.name)))
    val paths = s.files.map(f => Paths.get(table, f))
    val t0 = System.nanoTime()
    if (parallel)
      graft.sources.SpoolLink.parMap(paths)(p => fileStatsJson(spark, p, dataSchema))
    else paths.map(p => fileStatsJson(spark, p, dataSchema))
    (paths.size, (System.nanoTime() - t0) / 1e9)
  }

  /** Append `df` as one atomic Delta commit. `txn` = (appId, batchId)
    * arms the idempotent-replay guard; `partitionBy` writes hive-style
    * `col=val/` data paths with the values recorded in each add action's
    * `partitionValues` (the Delta layout for partitioned tables — at
    * 100 TB this is what makes reads partition-prunable). Every
    * `checkpointInterval` commits a parquet checkpoint compacts the log.
    * Returns the committed version, or None when the txn was already
    * committed (the batch is NOT rewritten).
    */
  def writeBatch(df: DataFrame, table: String,
      txn: Option[(String, Long)] = None,
      partitionBy: Seq[String] = Seq.empty,
      checkpointInterval: Int = 10,
      mergeSchema: Boolean = false,
      tableConf: Map[String, String] = Map.empty): Option[Long] = {
    val spark = df.sparkSession
    txn.foreach { case (app, v) =>
      if (snapshot(spark, table).exists(_.appVersions.get(app).exists(_ >= v)))
        return None // cheap pre-check; the commit loop re-checks under race
    }
    val snap0 = snapshot(spark, table)
    if (mappingMode(snap0.map(_.configuration).getOrElse(Map.empty) ++ tableConf) != "none") {
      snap0.foreach(s0 => require(
        partitionBy.isEmpty || partitionBy == s0.partitionColumns,
        s"$table is partitioned by (${s0.partitionColumns.mkString(", ")}); " +
          s"this write declares (${partitionBy.mkString(", ")})"))
      return writeBatchMapped(df, table, snap0, txn, partitionBy,
        checkpointInterval, mergeSchema, tableConf)
    }
    Files.createDirectories(Paths.get(table))
    // declared-nullable columns landing in REQUIRED table columns get a
    // row-level null guard (r17) — the write fails on the first actual
    // null instead of refusing every file-sourced (always-nullable) batch
    val dfW = snap0.map(s0 =>
      SchemaEvolution.withRequiredGuards(df, s0.schema)).getOrElse(df)
    // data files exclude the partition columns (they live in the path and
    // in partitionValues), matching Delta's physical layout
    val added = placeDataFiles(spark, table, df.schema, partitionBy, dfW)
    val committed = commit(spark, table, df.schema, partitionBy, added, txn,
      mergeSchema = mergeSchema, tableConf = tableConf)
    committed match {
      case None => // lost to a concurrent replay: remove orphaned parts
        added.foreach { case (rel, _) => Files.deleteIfExists(Paths.get(table, rel)) }
      case Some(v) if checkpointInterval > 0 && (v + 1) % checkpointInterval == 0 =>
        writeCheckpoint(spark, table, v)
      case _ =>
    }
    committed
  }

  /** CREATE or APPEND a COLUMN-MAPPED table. CREATE (r14) mints the
    * mapping this writer then owns: sequential `delta.columnMapping.id`
    * + `col-<uuid>` physicalName on every (nested) field, maxColumnId
    * in the configuration, legacy protocol 2/5 (or 3/7 + the
    * columnMapping feature when DVs are also armed) — the shape
    * delta-spark mints under `delta.columnMapping.mode=name`. APPENDS
    * (the CDC-landing shape: a streaming sink feeding a table
    * Databricks created with columnMapping on) write under PHYSICAL
    * names with `parquet.field.id` stamped (`id` mode's contract;
    * delta-spark stamps them in `name` mode too), hive dirs use the
    * physical partition names, and the add actions carry phys-keyed
    * partitionValues and stats — exactly what a conformant mapped
    * reader binds. No schema evolution (a new column needs a fresh
    * physicalName + maxColumnId bump after creation).
    */
  private def writeBatchMapped(df: DataFrame, table: String,
      snap0: Option[Snapshot], txn: Option[(String, Long)],
      partitionBy: Seq[String],
      checkpointInterval: Int, mergeSchema: Boolean,
      tableConf: Map[String, String]): Option[Long] = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    // structural type equality: the table schema carries columnMapping
    // metadata (and exact nullability) the caller's batch never has
    def shape(dt: DataType): DataType = dt match {
      case st: StructType => StructType(st.fields.map(f =>
        StructField(f.name, shape(f.dataType), nullable = true)))
      case at: ArrayType => ArrayType(shape(at.elementType), containsNull = true)
      case mt: MapType =>
        MapType(shape(mt.keyType), shape(mt.valueType), valueContainsNull = true)
      case other => other
    }
    val (tableSchema, partCols, conf, df1) = snap0 match {
      case Some(s00) =>
        // merge_schema (r14): NEW batch columns evolve the table first —
        // scalar columns mint their id/physicalName through [[addColumns]]
        // (the maxColumnId coordination mechanism), then the batch
        // appends under the evolved schema; batch columns missing vs the
        // table null-fill (the CDC-feed-grows-a-column shape)
        val extra = df.schema.fields
          .filterNot(f => s00.schema.fieldNames.contains(f.name))
        val s0 =
          if (extra.isEmpty) s00
          else {
            require(mergeSchema,
              s"$table (column-mapped) takes exact-schema appends; batch " +
                s"adds (${extra.map(_.name).mkString(", ")}) — set " +
                "merge_schema to evolve")
            addColumns(spark, table, extra.map(f => f.name -> f.dataType).toSeq)
            snapshot(spark, table).get
          }
        // WITHOUT merge_schema the exact-schema contract stands: a batch
        // missing (or reordering) table columns refuses rather than
        // silently null-filling
        require(mergeSchema ||
          df.schema.fieldNames.toSeq == s0.schema.fieldNames.toSeq,
          s"$table (column-mapped) takes exact-schema appends; batch " +
            s"(${df.schema.fieldNames.mkString(", ")}) != table " +
            s"(${s0.schema.fieldNames.mkString(", ")})")
        val aligned = df.select(s0.schema.fields.toIndexedSeq.map { f =>
          if (df.schema.fieldNames.contains(f.name)) col(quoted(f.name))
          else org.apache.spark.sql.functions.lit(null)
            .cast(f.dataType).as(f.name)
        }: _*)
        require(aligned.schema.fields.zip(s0.schema.fields).forall {
            case (a, b) => shape(a.dataType) == shape(b.dataType) },
          s"$table (column-mapped) append type mismatch: batch " +
            s"(${df.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}) vs table " +
            s"(${s0.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")})")
        (s0.schema, s0.partitionColumns, tableConf, aligned)
      case None =>
        // CREATE: mint the mapping (this writer owns a table it creates)
        val mode = mappingMode(tableConf)
        val (mapped, maxId) = mintMapping(df.schema)
        partitionBy.foreach(pc => require(mapped.fieldNames.contains(pc),
          s"$table: partition column $pc is not in the schema"))
        (mapped, partitionBy, tableConf +
          ("delta.columnMapping.maxColumnId" -> maxId.toString), df)
    }
    Files.createDirectories(Paths.get(table))
    // placement on the PHYSICAL shape: hive dirs named by physical
    // partition columns → partitionValues keys, and footer stats keys,
    // both land physical (what prune() translates back to)
    // the MODE lives on the table (snapshot config) for appends; `conf`
    // is only the caller's overlay (empty on a plain append)
    val effectiveConf =
      snap0.map(_.configuration).getOrElse(Map.empty) ++ conf
    val added = placeMappedDataFiles(spark, table, tableSchema, partCols,
      df1, needsNestedIdStamp(effectiveConf, tableSchema), Seq.empty)
    val committed = commit(spark, table, tableSchema, partCols,
      added, txn, tableConf = conf, allowMapped = true)
    committed match {
      case None =>
        added.foreach { case (rel, _) => Files.deleteIfExists(Paths.get(table, rel)) }
      case Some(v) if checkpointInterval > 0 && (v + 1) % checkpointInterval == 0 =>
        writeCheckpoint(spark, table, v)
      case _ =>
    }
    committed
  }

  /** OPTIMIZE: bin-pack small data files into bigger ones — the
    * operational fix for what a micro-batch streaming sink does to a
    * table (one small file per batch; at 100 TB the file-count, not the
    * bytes, is what kills scan planning). Reads only the active files
    * below `smallFileBytes`, rewrites them coalesced per partition, and
    * commits the swap as ONE atomic version whose add AND remove actions
    * carry `dataChange: false` — the protocol's signal to streaming
    * readers that no rows were logically added or removed. Returns the
    * committed version, or None when fewer than two small files exist
    * (nothing to compact). Safe under concurrent appends: only files
    * this call actually read are removed, and the commit loop re-reads
    * the log on version races. Safe under concurrent OPTIMIZE too: if a
    * racing compaction already removed any file this call read, the
    * commit aborts (delta-spark's ConcurrentDeleteReadException) and the
    * loser's files are deleted — committing anyway would resurrect the
    * winner's removed rows as duplicates.
    *
    * `zorderBy` (OPTIMIZE t ZORDER BY (c1, …)) re-clusters EVERY active
    * file along the Morton curve of the named columns
    * ([[graft.operators.ZOrder]]) — the layout that makes parquet
    * row-group min/max skipping work on all the named dimensions at
    * once — still as one dataChange=false swap.
    */
  /** Test seam: runs after OPTIMIZE has planned its victims and placed
    * replacement files, before the commit — lets specs land a concurrent
    * DV/DML commit in the planning→commit window deterministically.
    */
  private[graft] var onOptimizeCommit: () => Unit = () => ()

  def optimize(spark: SparkSession, table: String,
      smallFileBytes: Long = 128L * 1024 * 1024,
      zorderBy: Seq[String] = Seq.empty,
      /** Output sizing target — separate from the victim THRESHOLD so a
        * dirty-only pass (smallFileBytes = 0, auto-compact) still bins
        * its rewrites toward real file sizes. */
      targetFileBytes: Long = 128L * 1024 * 1024): Option[Long] = {
    val s = snapshot(spark, table).getOrElse(return None)
    zorderBy.foreach { c =>
      require(s.schema.fieldNames.contains(c), s"zorder: no column $c")
      require(!s.partitionColumns.contains(c),
        s"zorder: $c is a partition column (already file-disjoint)")
    }
    // files carrying a DELETION VECTOR are always victims: rewriting
    // them with the DV applied is what PURGES the vector (delta's
    // purge/REORG shape) and returns reads to a clean codegen scan
    val dvDirty = s.adds.filter(_._2.dv.exists(_.cardinality > 0))
    val small =
      if (zorderBy.nonEmpty) s.adds // layout rewrite: every active file
      else (s.adds.filter(_._2.size < smallFileBytes) ++ dvDirty)
        .groupBy(_._1).map(_._2.head).toSeq
    if (small.size < (if (zorderBy.nonEmpty) 1 else 2) && dvDirty.isEmpty)
      return None
    if (small.isEmpty) return None
    val mapped = mappingMode(s.configuration) != "none"
    // rowTracking compaction (r16): the rewrite MATERIALIZES every
    // victim row's id/commit-version into the replacement files
    // (declared columns where a prior writer preserved them, else
    // baseRowId + position) — ids survive compaction, the same rule
    // the iceberg OPTIMIZE follows. Composes with column mapping (r17):
    // the materialized names are physical and ride as passThrough.
    val rowIds: Option[(String, String, Map[String, String])] =
      if (!s.rowTrackingSupported) None
      else Some(mintRowIdCols(s))
    val df = rowIds match {
      case None => readKept(spark, table, s, small.map(_._1))
      case Some((idN, verN, _)) =>
        import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit}
        import spark.implicits._
        val declaredId = s.configuration
          .get("delta.rowTracking.materializedRowIdColumnName")
        val declaredVer = s.configuration
          .get("delta.rowTracking.materializedRowCommitVersionColumnName")
        val extras = (declaredId.toSeq ++ declaredVer.toSeq)
          .map(n => StructField(n, LongType, nullable = true))
        val byRel = s.adds.toMap
        val raw = readKept(spark, table, s, small.map(_._1), withMeta = true,
          extraFields = extras)
        val baseDf = broadcast(small.map { case (rel, info) =>
          (rel, info.baseRowId, info.defaultRowCommitVersion)
        }.toDF(dvFileCol, "__graft_base_row_id", "__graft_commit_ver"))
        raw.join(baseDf, dvFileCol)
          .withColumn(idN, coalesce(
            declaredId.map(col).getOrElse(lit(null).cast(LongType)),
            col("__graft_base_row_id") + col(dvPosCol)))
          .withColumn(verN, coalesce(
            declaredVer.map(col).getOrElse(lit(null).cast(LongType)),
            col("__graft_commit_ver")))
          .select((s.schema.fieldNames.toIndexedSeq ++ Seq(idN, verN)).map(col): _*)
    }
    val nOut = math.max(1,
      (small.map(_._2.size).sum / math.max(1L, targetFileBytes)).toInt + 1)
    val out =
      if (zorderBy.isEmpty) df.coalesce(nOut)
      else graft.operators.ZOrder.cluster(df, zorderBy, nOut)
    val added =
      if (mapped) placeMappedDataFiles(spark, table, s, out,
        passThrough = rowIds.map { case (idN, verN, _) => Seq(idN, verN) }
          .getOrElse(Seq.empty))
      else placeDataFiles(spark, table, s.schema, s.partitionColumns, out)
    onOptimizeCommit()
    val committed = commit(spark, table, s.schema, s.partitionColumns, added,
      txn = None, removed = small.map(_._1), dataChange = false,
      allowMapped = mapped,
      tableConf = rowIds.map(_._3).getOrElse(Map.empty),
      rowIdsPreserved = rowIds.isDefined,
      // a concurrent DV landing on a victim between plan and commit
      // would be silently dropped by this rewrite — abort instead.
      // UNCONDITIONAL: dvId is "" for DV-less victims, so a first DV
      // appearing on a clean victim trips the guard too (guarding only
      // when the planning snapshot was already dirty would let that
      // commit resurrect the freshly deleted rows)
      dvBase = Some(small.map { case (rel, info) => rel -> info.dvId }.toMap))
    committed match {
      case Some(_) =>
        // tombstoned files STAY on disk (a concurrent reader may be
        // mid-scan; real Delta keeps them for the retention window) —
        // [[vacuum]] reclaims them later
      case None =>
        added.foreach { case (rel, _) => Files.deleteIfExists(Paths.get(table, rel)) }
    }
    committed
  }

  /** VACUUM: physically delete data files no active add references and
    * whose mtime is older than `retentionMs` (Delta's default is 7 days —
    * long enough that no concurrent reader still holds a snapshot that
    * references them). Returns the number of files reclaimed.
    */
  def vacuum(spark: SparkSession, table: String,
      retentionMs: Long = 7L * 24 * 3600 * 1000): Int = {
    val s = snapshot(spark, table).getOrElse(return 0)
    val active = s.files.toSet
    val horizon = System.currentTimeMillis() - retentionMs
    val root = Paths.get(table)
    val candidates = walkDir(root)
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet") &&
        !p.startsWith(logDir(table)) &&
        !root.relativize(p).toString.startsWith(".")).toSeq
    val dead = candidates.filter { p =>
      !active(root.relativize(p).toString) &&
        Files.getLastModifiedTime(p).toMillis < horizon
    }
    // deletion-vector sidecars: reclaim the ones no ACTIVE add
    // references, under the same retention horizon (a concurrent
    // reader's snapshot keeps working until the window passes)
    val referencedDv = s.adds.flatMap { case (_, info) =>
      info.dv.flatMap(d => DeletionVectors.referencedFile(
        root.toAbsolutePath.normalize, d))
    }.map(_.toAbsolutePath.normalize).toSet
    val deadDv = walkDir(root).filter { p =>
      val n = p.getFileName.toString
      Files.isRegularFile(p) && n.startsWith("deletion_vector_") &&
        n.endsWith(".bin") && !p.startsWith(logDir(table)) &&
        !referencedDv(p.toAbsolutePath.normalize) &&
        Files.getLastModifiedTime(p).toMillis < horizon
    }
    (dead ++ deadDv).foreach(Files.deleteIfExists(_))
    dead.size + deadDv.size
  }

  /** `ALTER TABLE … ADD COLUMNS`: append nullable columns to the table
    * schema as one metaData-only version (no data files touched — old
    * AND new files simply read null until something writes the column).
    * Duplicate names are rejected. Returns the committed version.
    */
  def addColumns(spark: SparkSession, table: String,
      cols: Seq[(String, DataType)]): Option[Long] = {
    require(cols.nonEmpty, "ADD COLUMNS: no columns")
    require(cols.map(_._1).distinct.size == cols.size,
      "ADD COLUMNS: duplicate column name")
    // dotted names are NESTED adds (`s.z` — r16): the field appends at
    // the END of its struct (through array/map nesting via
    // element/key/value segments, the rewriteAtPath dialect)
    val (nestedCols, flatCols) = cols.partition(_._1.contains("."))
    // the whole snapshot→mint→commit cycle RETRIES under the schemaBase
    // guard: a concurrent ADD COLUMNS landing first would otherwise be
    // clobbered (and, on mapped tables, its freshly-minted id DUPLICATED
    // — two columns bound to one parquet field id)
    var round = 0
    while (round < 5) {
      round += 1
      val s = snapshot(spark, table)
        .getOrElse(sys.error(s"$table is not a Delta table (no _delta_log)"))
      flatCols.foreach { case (n, _) =>
        require(!s.schema.fieldNames.contains(n),
          s"ADD COLUMNS: column $n already exists in $table") }
      // column-mapped tables (r14): ANY writer may evolve — the protocol's
      // delta.columnMapping.maxColumnId exists exactly to coordinate id
      // allocation across writers (new id = maxColumnId+1, bump the
      // property in the SAME metaData commit)
      val mapped = mappingMode(s.configuration) != "none"
      // fallback when the property is absent: the max cm id across
      // the WHOLE type tree (nested fields carry ids too — a
      // top-level count would collide with them); when both exist,
      // the larger wins (a lagging property must never re-mint a
      // live id)
      def maxCmId(dt: DataType): Long = dt match {
        case st: StructType => st.fields.foldLeft(0L)((m, f) =>
          math.max(m, math.max(cmFieldId(f).getOrElse(0L),
            maxCmId(f.dataType))))
        case at: ArrayType => maxCmId(at.elementType)
        case mt: MapType =>
          math.max(maxCmId(mt.keyType), maxCmId(mt.valueType))
        case _ => 0L
      }
      var next = if (!mapped) 0L else math.max(
        s.configuration.get("delta.columnMapping.maxColumnId")
          .map(_.toLong).getOrElse(0L),
        maxCmId(s.schema))
      // mint at EVERY depth (the mintMapping shape): struct members
      // get their own id + physicalName, arrays/maps recurse
      def mint(dt: DataType): DataType = dt match {
        case st: StructType => StructType(st.fields.map { f =>
          next += 1
          val id = next
          f.copy(dataType = mint(f.dataType), metadata =
            new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(f.metadata)
              .putLong(CmIdKey, id)
              .putString(CmPhysKey, s"col-${UUID.randomUUID()}")
              .build())
        })
        case at: ArrayType => at.copy(elementType = mint(at.elementType))
        case mt: MapType =>
          mt.copy(keyType = mint(mt.keyType), valueType = mint(mt.valueType))
        case other => other
      }
      def mintField(n: String, dt: DataType): StructField =
        if (!mapped) StructField(n, dt, nullable = true)
        else mint(StructType(Seq(StructField(n, dt, nullable = true))))
          .asInstanceOf[StructType].fields.head
      val widened = StructType(s.schema.fields ++
        flatCols.map { case (n, dt) => mintField(n, dt) })
      val evolved = nestedCols.foldLeft(widened) { case (sch, (path, dt)) =>
        rewriteAtPath(table, sch, path.split('.').toSeq) { (st, leaf) =>
          require(!st.fieldNames.contains(leaf),
            s"ADD COLUMNS: column $path already exists in $table")
          StructType(st.fields :+ mintField(leaf, dt))
        }
      }
      val conf = if (mapped)
        Map("delta.columnMapping.maxColumnId" -> next.toString)
      else Map.empty[String, String]
      val committed = commit(spark, table, evolved, s.partitionColumns,
        added = Seq.empty, txn = None, mergeSchema = true, tableConf = conf,
        allowMapped = mapped, schemaBase = Some(s.schema.json),
        // a nested add changes an EXISTING column's type — append-only
        // SchemaEvolution can't express that; commit the schema verbatim
        // under the schemaBase race guard instead
        schemaReplace = nestedCols.nonEmpty)
      if (committed.isDefined) return committed
    }
    sys.error(s"$table: ADD COLUMNS lost 5 concurrent-evolution races; giving up")
  }

  /** Rebuild `schema` with `leafOp` applied to the struct HOLDING the
    * path's last segment — the shared navigation for nested RENAME/DROP.
    * Prefix segments traverse struct fields, and (r16) `array<struct>`
    * via an explicit `element` segment and `map` via `key`/`value`
    * segments (`a.element.x`, `m.value.x` — delta-spark's path
    * dialect); the element-level columnMapping binding carries exactly
    * like struct fields, so readers keep resolving every existing
    * file. Every untouched field's metadata carries verbatim.
    */
  private def rewriteAtPath(table: String, schema: StructType,
      path: Seq[String])(leafOp: (StructType, String) => StructType)
      : StructType = {
    def walkType(dt: DataType, segs: Seq[String], at: String): DataType =
      (dt, segs) match {
        case (inner: StructType, _) => walk(inner, segs)
        case (arr: ArrayType, "element" +: rest) if rest.nonEmpty =>
          arr.copy(elementType =
            walkType(arr.elementType, rest, s"$at.element"))
        case (mt: MapType, "key" +: rest) if rest.nonEmpty =>
          mt.copy(keyType = walkType(mt.keyType, rest, s"$at.key"))
        case (mt: MapType, "value" +: rest) if rest.nonEmpty =>
          mt.copy(valueType = walkType(mt.valueType, rest, s"$at.value"))
        case (arr: ArrayType, seg +: _) => throw new IllegalArgumentException(
          s"$table: '$at' is ${arr.simpleString} — address its rows as " +
            s"'$at.element.…', not '$at.$seg'")
        case (mt: MapType, seg +: _) => throw new IllegalArgumentException(
          s"$table: '$at' is ${mt.simpleString} — address its sides as " +
            s"'$at.key.…' / '$at.value.…', not '$at.$seg'")
        case (other, _) => throw new IllegalArgumentException(
          s"$table: '$at' is ${other.simpleString}, not a struct — " +
            "fields evolve through struct/array-element/map-side nesting only")
      }
    def walk(st: StructType, segs: Seq[String]): StructType = segs match {
      case Seq(leaf) => leafOp(st, leaf)
      case head +: rest =>
        val i = st.fieldIndex(head)
        StructType(st.fields.updated(i, st.fields(i).copy(dataType =
          walkType(st.fields(i).dataType, rest, head))))
    }
    try walk(schema, path)
    catch { case e: IllegalArgumentException if e.getMessage != null &&
        e.getMessage.contains("does not exist") =>
      throw new IllegalArgumentException(
        s"$table: no column ${path.mkString(".")}") }
  }

  /** `ALTER TABLE … RENAME COLUMN from TO to` — the operation column
    * mapping exists for (PROTOCOL.md "Column Mapping"): a metaData-only
    * commit that changes the LOGICAL name while the
    * `delta.columnMapping.physicalName`/`id` binding — and therefore
    * every existing data file, stat key, partition dir, and DV — stays
    * untouched. `from` may be a dotted NESTED path (`s.a`); `to` is the
    * new leaf name. Unmapped tables refuse: their files carry logical
    * column names, so a rename would orphan every existing file's data.
    * Retries under the schemaBase guard like [[addColumns]].
    */
  def renameColumn(spark: SparkSession, table: String, from: String,
      to: String): Option[Long] = {
    require(from != to, s"RENAME COLUMN: '$from' to itself")
    require(!to.contains("."),
      s"RENAME COLUMN: new name '$to' must be a plain leaf name " +
        "(the field stays at its position; renames never move fields)")
    val path = from.split('.').toSeq
    var round = 0
    while (round < 5) {
      round += 1
      val s = snapshot(spark, table)
        .getOrElse(sys.error(s"$table is not a Delta table (no _delta_log)"))
      require(mappingMode(s.configuration) != "none",
        s"$table: RENAME COLUMN requires column mapping " +
          "(delta.columnMapping.mode=name|id); unmapped data files carry " +
          "logical names, so the rename would null the column in every " +
          "existing file — create the table with column mapping")
      val evolved = rewriteAtPath(table, s.schema, path) { (st, leaf) =>
        require(st.fieldNames.contains(leaf),
          s"RENAME COLUMN: no column $from in $table")
        require(!st.fieldNames.contains(to),
          s"RENAME COLUMN: column $to already exists beside $from in $table")
        StructType(st.fields.map(f =>
          if (f.name == leaf) f.copy(name = to) else f))
      }
      val parts =
        if (path.size > 1) s.partitionColumns
        else s.partitionColumns.map(pc => if (pc == from) to else pc)
      val committed = commit(spark, table, evolved, parts, added = Seq.empty,
        txn = None, allowMapped = true, schemaBase = Some(s.schema.json),
        schemaReplace = true)
      if (committed.isDefined) return committed
    }
    sys.error(s"$table: RENAME COLUMN lost 5 concurrent-evolution races; giving up")
  }

  /** `ALTER TABLE … DROP COLUMN[S]` — the other mapping-only evolution:
    * a metaData-only commit that removes the field from the table
    * schema while its PHYSICAL data stays in every existing file
    * (readers project mapped fields only, so the dead column simply
    * stops resolving; VACUUM-style physical purge is a rewrite,
    * deliberately not bundled here). Partition columns refuse — their
    * values live in the log/dirs, not the files, and dropping one
    * changes the table's layout contract.
    */
  def dropColumns(spark: SparkSession, table: String,
      cols: Seq[String]): Option[Long] = {
    require(cols.nonEmpty, "DROP COLUMN: no columns")
    require(cols.distinct.size == cols.size, "DROP COLUMN: duplicate column name")
    var round = 0
    while (round < 5) {
      round += 1
      val s = snapshot(spark, table)
        .getOrElse(sys.error(s"$table is not a Delta table (no _delta_log)"))
      require(mappingMode(s.configuration) != "none",
        s"$table: DROP COLUMN requires column mapping " +
          "(delta.columnMapping.mode=name|id); without it readers resolve " +
          "files by logical name and a re-added column of the same name " +
          "would resurrect the dead values")
      cols.foreach { c =>
        require(!s.partitionColumns.contains(c),
          s"DROP COLUMN: $c is a partition column of $table — " +
            "repartitioning requires a rewrite, not a schema commit")
      }
      // each name may be a dotted NESTED path (`s.a`): the field leaves
      // its struct, the struct (and its binding) stays
      val evolved = cols.foldLeft(s.schema) { (sch, c) =>
        rewriteAtPath(table, sch, c.split('.').toSeq) { (st, leaf) =>
          require(st.fieldNames.contains(leaf),
            s"DROP COLUMN: no column $c in $table")
          val kept = StructType(st.fields.filterNot(_.name == leaf))
          require(kept.fields.nonEmpty,
            s"DROP COLUMN: $c would empty its struct — drop the struct itself")
          kept
        }
      }
      require(evolved.fields.nonEmpty,
        s"DROP COLUMN: cannot drop every column of $table")
      val committed = commit(spark, table, evolved, s.partitionColumns,
        added = Seq.empty, txn = None, allowMapped = true,
        schemaBase = Some(s.schema.json), schemaReplace = true)
      if (committed.isDefined) return committed
    }
    sys.error(s"$table: DROP COLUMN lost 5 concurrent-evolution races; giving up")
  }

  /** Set/merge table properties as a metaData-only commit (the
    * `ALTER TABLE SET TBLPROPERTIES` shape — what lands
    * `delta.enableChangeDataFeed` on an EXISTING table). No-op (None)
    * when every entry already holds.
    */
  def setTableProperties(spark: SparkSession, table: String,
      props: Map[String, String]): Option[Long] = {
    require(props.nonEmpty, "SET TBLPROPERTIES: no properties")
    val s = snapshot(spark, table)
      .getOrElse(sys.error(s"$table is not a Delta table (no _delta_log)"))
    if (props.forall { case (k, v) => s.configuration.get(k).contains(v) }) None
    else commit(spark, table, s.schema, s.partitionColumns, added = Seq.empty,
      txn = None, tableConf = props)
  }

  /** Copy-on-write `DELETE FROM … WHERE predicate`: rewrite ONLY the
    * files holding matching rows (stats-pruned, then row-verified), as
    * one atomic remove+add version with `dataChange=true`. At 100 TB
    * this is the whole point of the stats/ZORDER machinery on the WRITE
    * path too: a point delete on a clustered table rewrites O(1) files,
    * judged on the driver against metadata only. Returns the committed
    * version, or None when no row matched (no commit — the protocol
    * needs no empty versions). Serializable vs concurrent writers: the
    * commit aborts both when a touched file was concurrently removed
    * (ConcurrentDeleteRead) and when a concurrently-added file may hold
    * matching rows (ConcurrentAppend); either way the whole
    * plan-rewrite-commit cycle retries from the fresh snapshot.
    */
  def deleteWhere(spark: SparkSession, table: String,
      predicate: String): Option[Long] = {
    import org.apache.spark.sql.functions.{coalesce, col, expr, lit, not}
    val p = predicate.trim
    require(p.nonEmpty, "DELETE: empty predicate (use 'true' to delete all rows)")
    val s0 = snapshot(spark, table)
      .getOrElse(sys.error(s"$table is not a Delta table (no _delta_log)"))
    val changes: Option[(DataFrame, DataFrame, StructType) => DataFrame] =
      Some((touched, _, _) =>
        touched.filter(coalesce(expr(p), lit(false)))
          .withColumn(Cdf.changeTypeCol, lit("delete")))
    if (dvEnabled(s0.configuration))
      // merge-on-read: fold the matching POSITIONS into each file's
      // deletion vector, rewrite nothing
      dvRun(spark, table, scanFilter = Some(p), conflictPred = Some(p),
        changes = changes) {
        (cand, _) => (cand.filter(coalesce(expr(p), lit(false)))
          .select(col(dvFileCol), col(dvPosCol)), None)
      }
    else DmlRewrite.run(spark, new DmlFormat(spark, table), scanFilter = Some(p),
      conflictPred = Some(p),
      matcher = df => df.filter(coalesce(expr(p), lit(false))),
      changes = changes) {
      (touched, _, _) => touched.filter(not(coalesce(expr(p), lit(false))))
    }
  }

  /** Table property arming the commit-path maintenance trigger on BOTH
    * formats: after a merge-on-read commit, when deleted-rows/live-rows
    * reaches the ratio, the bounded dirty-file OPTIMIZE runs right away
    * — nothing else ever nudges a table back to clean, and the all-dirty
    * scan rent grows with the dirty-file count (SCALE.md) until it does.
    */
  val autoOptimizeProp = "graft.auto-optimize.deleted-ratio"

  /** `true` makes a FAILED auto-OPTIMIZE propagate to the committing
    * caller. Default is catch-and-log: the trigger runs AFTER the data
    * commit has landed, so by default its failure must not fail (and
    * re-play) a caller's already-succeeded batch — maintenance gets the
    * same treatment the policy already gives a lost compaction race:
    * the next qualifying commit retries.
    */
  val autoOptimizeStrictProp = "graft.auto-optimize.strict"

  private[sinks] def isStrict(configuration: Map[String, String]): Boolean =
    configuration.get(autoOptimizeStrictProp).exists(_.equalsIgnoreCase("true"))

  /** Metadata-only check + the bounded purge: DV cardinalities and
    * per-add numRecords both ride the log, so the ratio costs no data
    * read; the OPTIMIZE it triggers rewrites ONLY the DV-carrying files
    * (smallFileBytes = 0 matches no clean file). A lost race just waits
    * for the next commit's trigger — and (r13) so does ANY compaction
    * failure, unless [[autoOptimizeStrictProp]] opts into propagation.
    */
  private def maybeAutoOptimize(spark: SparkSession, table: String): Unit = {
    val s = snapshot(spark, table).getOrElse(return)
    val ratio = s.configuration.get(autoOptimizeProp) match {
      case None => return
      case Some(v) => try v.toDouble catch {
        case _: NumberFormatException =>
          sys.error(s"$table: $autoOptimizeProp='$v' is not a number")
      }
    }
    require(ratio > 0, s"$table: $autoOptimizeProp must be > 0")
    val deleted = s.adds.flatMap(_._2.dv).map(_.cardinality).sum
    if (deleted == 0) return
    // the ratio needs numRecords from EVERY active add: an add without
    // stats (third-party writers may omit them) would silently vanish
    // from the live count, INFLATING deleted/live and compacting far too
    // eagerly — skip the trigger loudly instead (conservative: rent
    // keeps accruing until a manual OPTIMIZE, never a wrong rewrite)
    val counts = s.adds.map { case (rel, info) => rel -> info.stats.flatMap(st =>
      try Some(mapper.readTree(st).get("numRecords").asLong())
      catch { case _: Exception => None }) }
    counts.collectFirst { case (rel, None) => rel } match {
      case Some(rel) =>
        Console.err.println(s"[delta] $table: $autoOptimizeProp is set but " +
          s"active file $rel carries no numRecords stats (third-party " +
          "write?) — the deleted/live ratio would over-trigger; skipping " +
          "the auto-OPTIMIZE check this commit. Run OPTIMIZE manually or " +
          "rewrite the stats-less files.")
        return
      case None =>
    }
    val total = counts.flatMap(_._2).sum
    val live = math.max(1L, total - deleted)
    if (deleted.toDouble / live >= ratio) {
      try { optimize(spark, table, smallFileBytes = 0L); () }
      catch { case scala.util.control.NonFatal(e) =>
        if (isStrict(s.configuration)) throw e
        Console.err.println(s"[delta] $table: auto-OPTIMIZE after a landed " +
          s"commit failed (${e.getMessage}); the data commit stands — the " +
          "next qualifying commit retries. Set " +
          s"$autoOptimizeStrictProp=true to propagate instead.")
      }
    }
  }

  /** The delta merge-on-read DML cycle ([[DeletionVectors]];
    * `delta.enableDeletionVectors`): instead of rewriting touched
    * files, the matched row positions FOLD INTO each file's deletion
    * vector — the commit removes and re-adds the same data file with
    * the fattened DV (delta-spark's MoR shape; a file whose every row
    * is now deleted drops instead), plus ordinary adds for postimages
    * and inserts. Cost scales with the rows changed, never the file
    * bytes they live in. Per-file bitmaps build EXECUTOR-side — the
    * driver receives roaring-compressed bytes, never raw positions.
    * Conflict rules: ConcurrentDeleteRead via the removes,
    * ConcurrentAppend via `conflictPred`, and the dvBase guard (a
    * concurrent DV landing on any candidate re-plans); change rows
    * land as `_change_data` + cdc actions when the table records a
    * change feed, exactly like the copy-on-write path.
    */
  private def dvRun(spark: SparkSession, table: String,
      scanFilter: Option[String], conflictPred: Option[String],
      commitWhenUntouched: Boolean = false,
      changes: Option[(DataFrame, DataFrame, StructType) => DataFrame] = None)
      (delta: (DataFrame, StructType) => (DataFrame, Option[DataFrame]))
      : Option[Long] = {
    import org.apache.spark.sql.functions.col
    val root = Paths.get(table).toAbsolutePath.normalize
    var round = 0
    while (round < 5) {
      round += 1
      val s = snapshot(spark, table).getOrElse(
        sys.error(s"$table is not a Delta table (no _delta_log)"))
      val mapped = mappingMode(s.configuration) != "none"
      val byRel = s.adds.toMap
      val (kept, _) = prune(spark, s, scanFilter)
      if (kept.isEmpty && !commitWhenUntouched) return None
      // rowTracking MoR (r16): candidates carry their resolved
      // id/commit-version so postimages preserve identity — the DV
      // retraction side needs nothing (positions stable). Mapped tables
      // compose (r17): materialized names are physical passThrough.
      val rowIds: Option[(String, String, Map[String, String])] =
        if (!s.rowTrackingSupported) None
        else Some(mintRowIdCols(s))
      val candDf = rowIds match {
        case None => readKept(spark, table, s, kept, withMeta = true)
        case Some(_) =>
          import org.apache.spark.sql.functions.{broadcast, coalesce, lit}
          import spark.implicits._
          val declaredId = s.configuration
            .get("delta.rowTracking.materializedRowIdColumnName")
          val declaredVer = s.configuration
            .get("delta.rowTracking.materializedRowCommitVersionColumnName")
          val extras = (declaredId.toSeq ++ declaredVer.toSeq)
            .map(n => StructField(n, LongType, nullable = true))
          val raw = readKept(spark, table, s, kept, withMeta = true,
            extraFields = extras)
          val baseDf = broadcast(kept.map { rel =>
            val i = byRel(rel)
            (rel, i.baseRowId, i.defaultRowCommitVersion)
          }.toDF(dvFileCol, "__graft_base_row_id", "__graft_commit_ver"))
          raw.join(baseDf, dvFileCol)
            .withColumn("_row_id", coalesce(
              declaredId.map(col).getOrElse(lit(null).cast(LongType)),
              col("__graft_base_row_id") + col(dvPosCol)))
            .withColumn("_last_updated_sequence_number", coalesce(
              declaredVer.map(col).getOrElse(lit(null).cast(LongType)),
              col("__graft_commit_ver")))
            .select((s.schema.fieldNames.toIndexedSeq ++
              Seq("_row_id", "_last_updated_sequence_number",
                dvFileCol, dvPosCol)).map(col): _*)
      }
      val candPlain = candDf.select(s.schema.fieldNames.map(col).toIndexedSeq: _*)
      val (posDf0, appends0) = delta(candDf, s.schema)
      // postimages rename the carried ids to the DECLARED physical
      // columns on their way into the appended files
      val appends = (rowIds, appends0) match {
        case (Some((idN, verN, _)), Some(a)) if a.columns.contains("_row_id") =>
          Some(a.withColumnRenamed("_row_id", idN)
            .withColumnRenamed("_last_updated_sequence_number", verN))
        case _ => appends0
      }
      val posDf = posDf0.select(col(dvFileCol), col(dvPosCol)).persist()
      try {
        val nPos = posDf.count()
        if (nPos == 0 && appends.isEmpty && !commitWhenUntouched) return None
        import spark.implicits._
        val newBitmaps: Seq[(String, Array[Byte])] =
          if (nPos == 0) Seq.empty
          else posDf.as[(String, Long)].groupByKey(_._1)
            .mapGroups((rel, it) =>
              (rel, DeletionVectors.bitmapOf(it.map(_._2)).serialize()))
            .collect().toSeq.sortBy(_._1)
        val mergedBitmaps = newBitmaps.map { case (rel, bytes) =>
          val nb = DeletionVectors.deserialize(bytes)
          val bm = byRel.getOrElse(rel, sys.error(s"$table: $rel is not active"))
            .dv match {
            case Some(d) => DeletionVectors.union(d.load(root), nb.positions)
            case None => nb
          }
          (rel, bm)
        }
        def numRecords(info: AddInfo): Option[Long] = info.stats.flatMap(st =>
          try Some(mapper.readTree(st).get("numRecords").asLong())
          catch { case _: Exception => None })
        // a file whose EVERY row is now deleted drops outright — no
        // point re-adding a fully-dead file behind a full DV
        val (fullDead, dvUpdates) = mergedBitmaps.partition { case (rel, bm) =>
          numRecords(byRel(rel)).contains(bm.cardinality) }
        val descriptors =
          if (dvUpdates.isEmpty) Seq.empty
          else DeletionVectors.write(root, dvUpdates.map(_._2))
        val reAdds = dvUpdates.zip(descriptors).map { case ((rel, _), d) =>
          rel -> byRel(rel).copy(dv = Some(d)) }
        val removedRels = mergedBitmaps.map(_._1)
        val placedAppends = appends.map(a =>
          if (mapped) placeMappedDataFiles(spark, table, s, a,
            passThrough = rowIds.map { case (idN, verN, _) =>
              Seq(idN, verN).filter(a.columns.contains) }.getOrElse(Seq.empty))
          else placeDataFiles(spark, table, s.schema, s.partitionColumns, a))
          .getOrElse(Seq.empty)
        if (removedRels.isEmpty && placedAppends.isEmpty) return None
        val cdcFiles: Seq[(String, AddInfo)] =
          if (removedRels.nonEmpty && Cdf.isEnabled(s.configuration))
            changes.map(f => placeCdc(spark, table, s.partitionColumns,
              f(candPlain, candPlain, s.schema), removedRels.size,
              mappedSnap = if (mapped) Some(s) else None))
              .getOrElse(Seq.empty)
          else Seq.empty
        val committed = commit(spark, table, s.schema, s.partitionColumns,
          added = reAdds ++ placedAppends, txn = None, removed = removedRels,
          dataChange = true,
          conflict = Some((s.files.toSet, conflictPred)),
          cdc = cdcFiles, allowMapped = mapped,
          tableConf = rowIds.map(_._3).getOrElse(Map.empty),
          rowIdsPreserved = rowIds.isDefined,
          dvBase = Some(kept.map(rel => rel -> byRel(rel).dvId).toMap))
        committed match {
          case Some(v) =>
            if ((v + 1) % 10 == 0) writeCheckpoint(spark, table, v)
            maybeAutoOptimize(spark, table)
            return committed
          case None => // lost the race: clean up everything this round placed
            placedAppends.foreach { case (rel, _) =>
              Files.deleteIfExists(root.resolve(rel)) }
            cdcFiles.foreach { case (rel, _) =>
              Files.deleteIfExists(root.resolve(rel)) }
            descriptors.flatMap(d => DeletionVectors.referencedFile(root, d))
              .distinct.foreach(Files.deleteIfExists(_))
        }
        fullDead.foreach(_ => ()) // paths stay on disk for time travel; vacuum reclaims
      } finally { posDf.unpersist(); () }
    }
    sys.error(s"$table: merge-on-read DML lost 5 concurrent-write races; giving up")
  }

  /** THE data-file placement path — [[writeBatch]], [[optimize]] and
    * [[dvRun]] all land files through here: scratch write, link under
    * the table root preserving hive partition dirs — each under a FRESH
    * UUID NAME (the unique-name invariant deletion vectors key on; one
    * Spark job reuses part names across partition dirs) — footer stats
    * harvested on the shared pool (bulk initial loads commit 10⁴+
    * parts; serial footer opens would dominate the commit path).
    */
  private def placeDataFiles(spark: SparkSession, table: String,
      schema: StructType, partitionColumns: Seq[String],
      df: DataFrame): Seq[(String, AddInfo)] = {
    val root = Paths.get(table).toAbsolutePath.normalize
    val scratch = Paths.get(table, s".graft-place-${UUID.randomUUID()}")
    val w = df.write.mode("overwrite")
    (if (partitionColumns.nonEmpty) w.partitionBy(partitionColumns: _*) else w)
      .parquet(scratch.toString)
    val parts = walkDir(scratch)
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(p => (scratch.relativize(p).toString, p)).sortBy(_._1)
    val dataSchema = StructType(
      schema.filterNot(f => partitionColumns.contains(f.name)))
    val placed = graft.sources.SpoolLink.parMap(parts) { case (rel, p) =>
      val destDir = Option(Paths.get(rel).getParent)
        .map(d => root.resolve(d)).getOrElse(root)
      Files.createDirectories(destDir)
      val dest = destDir.resolve(s"part-${UUID.randomUUID()}.parquet")
      try Files.createLink(dest, p)
      catch { case _: UnsupportedOperationException =>
        Files.move(p, dest, StandardCopyOption.ATOMIC_MOVE) }
      val r = root.relativize(dest.toAbsolutePath.normalize).toString
      (r, AddInfo(Files.size(dest), Files.getLastModifiedTime(dest).toMillis,
        partitionValuesOf(r), fileStatsJson(spark, dest, dataSchema)))
    }
    walkDir(scratch).reverse.foreach(Files.deleteIfExists(_))
    placed
  }

  /** Copy-on-write `UPDATE … SET col = expr, … [WHERE predicate]`:
    * rewrite only the files holding matching rows, applying each
    * assignment (cast to the column's declared type) to the matching
    * rows and carrying every other row through unchanged. Rows whose
    * updated PARTITION column changes migrate to their new hive
    * directory (the rewrite re-partitions on write). Returns the
    * committed version, or None when no row matched. Same conflict
    * rules as [[deleteWhere]].
    */
  def updateWhere(spark: SparkSession, table: String,
      sets: Seq[(String, String)], predicate: Option[String]): Option[Long] = {
    import org.apache.spark.sql.functions.{coalesce, col, expr, lit, when}
    require(sets.nonEmpty, "UPDATE: no SET assignments")
    require(sets.map(_._1).distinct.size == sets.size,
      "UPDATE: duplicate SET column")
    // dotted lhs = a NESTED field assignment (`SET s.qty = …`, r15):
    // the struct rebuilds via withField, grouped per top-level column
    val (nested, flat) = sets.partition(_._1.contains("."))
    val byCol = flat.toMap
    val nestedByTop: Map[String, Seq[(Seq[String], String)]] =
      nested.map { case (c, e) => (c.split('.').toSeq, e) }
        .groupBy(_._1.head)
    nestedByTop.keys.foreach(t => require(!byCol.contains(t),
      s"UPDATE: cannot SET both $t and a field inside it"))
    val p = predicate.map(_.trim).filter(_.nonEmpty)
    val cond = coalesce(p.map(expr).getOrElse(lit(true)), lit(false))
    /** The nested field's type at `segs` (struct nesting only). */
    def typeAtPath(schema: StructType, segs: Seq[String]): DataType =
      segs.foldLeft[DataType](schema) {
        case (st: StructType, seg) =>
          require(st.fieldNames.contains(seg),
            s"UPDATE $table: no column ${segs.mkString(".")}")
          st(seg).dataType
        case (other, seg) => throw new IllegalArgumentException(
          s"UPDATE $table: '$seg' reached through ${other.simpleString}, " +
            "not a struct")
      }
    // post-image projection, shared by the rewrite and the change feed.
    // ONE select: every RHS and the predicate evaluate against the OLD
    // row (SQL UPDATE semantics), nested or not. When the input carries
    // the rowTracking id columns (r16), postimages KEEP `_row_id` and
    // null the commit-version carry — the rewritten add's
    // defaultRowCommitVersion (this DML's version) inherits.
    def applySets(df: DataFrame, schema: StructType, onlyMatching: Boolean) = {
      (flat.map(_._1) ++ nestedByTop.keys).foreach(c => require(
        schema.fieldNames.contains(c.split('.').head),
        s"UPDATE $table: no column $c"))
      val rowIdCarry: Seq[org.apache.spark.sql.Column] =
        if (!df.columns.contains("_row_id")) Seq.empty
        else Seq(col("_row_id"),
          (if (onlyMatching) lit(null).cast(LongType)
           else when(cond, lit(null).cast(LongType))
             .otherwise(col("_last_updated_sequence_number")))
            .as("_last_updated_sequence_number"))
      df.select(schema.fields.toIndexedSeq.map { f =>
        (byCol.get(f.name), nestedByTop.get(f.name)) match {
          case (Some(e), _) if onlyMatching =>
            expr(e).cast(f.dataType).as(f.name)
          case (Some(e), _) =>
            when(cond, expr(e).cast(f.dataType)).otherwise(col(f.name)).as(f.name)
          case (None, Some(ns)) =>
            val updated = ns.foldLeft(col(quoted(f.name))) {
              case (c, (segs, e)) => c.withField(segs.tail.mkString("."),
                expr(e).cast(typeAtPath(schema, segs)))
            }
            (if (onlyMatching) updated
             else when(cond, updated).otherwise(col(quoted(f.name)))).as(f.name)
          case _ => col(f.name)
        }
      } ++ rowIdCarry: _*)
    }
    val s0 = snapshot(spark, table)
      .getOrElse(sys.error(s"$table is not a Delta table (no _delta_log)"))
    if (dvEnabled(s0.configuration))
      // merge-on-read row delta: retract matching positions into the
      // deletion vectors, append the postimages
      return dvRun(spark, table, scanFilter = p, conflictPred = p,
        changes = Some { (cand, _, schema) =>
          val pre = cand.filter(cond)
          pre.withColumn(Cdf.changeTypeCol, lit("update_preimage"))
            .unionAll(applySets(pre, schema, onlyMatching = true)
              .withColumn(Cdf.changeTypeCol, lit("update_postimage")))
        }) { (cand, schema) =>
        // applySets validates every lhs (top-level AND nested paths)
        val matched = p.map(pp => cand.filter(coalesce(expr(pp), lit(false))))
          .getOrElse(cand)
        (matched.select(col(dvFileCol), col(dvPosCol)),
          Some(applySets(matched, schema, onlyMatching = true)))
      }
    DmlRewrite.run(spark, new DmlFormat(spark, table), scanFilter = p,
      conflictPred = p,
      matcher = df => p.map(pp => df.filter(coalesce(expr(pp), lit(false))))
        .getOrElse(df),
      changes = Some { (touched, _, schema) =>
        val pre = touched.filter(cond)
        pre.withColumn(Cdf.changeTypeCol, lit("update_preimage"))
          .unionAll(applySets(pre, schema, onlyMatching = true)
            .withColumn(Cdf.changeTypeCol, lit("update_postimage")))
      }) {
      (touched, _, schema) =>
        // applySets validates every lhs (top-level AND nested paths)
        applySets(touched, schema, onlyMatching = false)
    }
  }

  /** `MERGE INTO … USING … ON …` — copy-on-write upsert (the verb a CDC
    * feed or incremental refresh lands with). File mechanics are
    * [[deleteWhere]]'s: only files holding MATCHED rows are rewritten
    * (pruned first by [[Merge.keyBoundsFilter]] — the source batch's
    * actual key bounds — so a small batch against a huge table plans
    * O(overlapping files)); not-matched source rows land as fresh adds
    * in the SAME atomic version. Row semantics (clause order, the
    * multiple-source-rows error, INSERT *) are [[Merge.rewrite]]'s.
    * An INSERT-ONLY merge (no MATCHED / NOT MATCHED BY SOURCE clauses)
    * rewrites NOTHING: the unmatched source rows anti-join the pruned
    * candidate files directly and land as a pure append — no remove
    * actions, so downstream streams keep flowing. Conflict rule is
    * maximal: ANY concurrently-added file aborts and re-plans (a new
    * file may hold rows the merge should have matched). Returns the
    * committed version, or None when the merge was a no-op.
    */
  def merge(spark: SparkSession, table: String, source: DataFrame,
      clauses: Merge.Clauses): Option[Long] = {
    val s0 = snapshot(spark, table)
      .getOrElse(sys.error(s"$table is not a Delta table (no _delta_log)"))
    clauses.updateCols.foreach(cname =>
      require(s0.schema.fieldNames.contains(cname),
        s"MERGE: no column $cname in $table"))
    source.persist()
    try {
      // NOT MATCHED BY SOURCE must see every target row absent from the
      // source, so those clauses disable source-key-bounds pruning
      val scanFilter = if (Merge.pruneBySourceKeys(clauses))
        Merge.keyBoundsFilter(spark, clauses, source, s0.schema) else None
      if (dvEnabled(s0.configuration))
        // merge-on-read row delta: matched rows taking a clause retract
        // into the deletion vectors; postimages + inserts append
        return dvRun(spark, table, scanFilter, conflictPred = None,
          commitWhenUntouched = clauses.notMatchedInsert.isDefined,
          changes = Merge.changesFor(source, clauses)) { (cand, schema) =>
          val (positions, appends) =
            Merge.rowDelta(cand, source, schema, clauses, dvFileCol, dvPosCol)
          (positions, Some(appends))
        }
      val fmt = new DmlFormat(spark, table)
      if (clauses.matched.isEmpty && clauses.notBySource.isEmpty)
        DmlRewrite.run(spark, fmt, scanFilter, conflictPred = None,
          matcher = identity, touchDetect = false,
          commitWhenUntouched = clauses.notMatchedInsert.isDefined,
          changes = Merge.changesFor(source, clauses)) {
          (_, cands, schema) => Merge.insertRows(cands, source, schema, clauses)
        }
      else
        DmlRewrite.run(spark, fmt, scanFilter, conflictPred = None,
          matcher = Merge.matcher(source, clauses),
          commitWhenUntouched = clauses.notMatchedInsert.isDefined,
          changes = Merge.changesFor(source, clauses)) {
          (touched, _, schema) => Merge.rewrite(touched, source, schema, clauses)
        }
    } finally { source.unpersist(); () }
  }

  /** [[DmlRewrite.Format]] adapter — the delta side of the shared DML
    * cycle: snapshot/prune planning, footer-stats harvest into protocol
    * `stats`, and the remove+add commit with the checkpoint cadence
    * appends also follow.
    */
  private final class DmlFormat(spark: SparkSession, val table: String)
      extends DmlRewrite.Format[(String, AddInfo), Long] {
    private val root = Paths.get(table).toAbsolutePath.normalize

    // the snapshot the current planning round read: candidate reads
    // apply its deletion vectors (a copy-on-write rewrite must never
    // resurrect DV-deleted rows) and the commit aborts when any
    // candidate's DV changed underneath (dvBase guard)
    @volatile private var planned: Option[Snapshot] = None
    private def mapped: Boolean =
      planned.exists(s => mappingMode(s.configuration) != "none")
    // rowTracking DML (r16): (materialized row-id col, row-commit-ver
    // col) the rewrite must WRITE — declared names from the table
    // config, or minted here (the config change rides the same commit
    // via mintedConf). Composes with column mapping (r17): the
    // materialized names are physical and ride stampOutput's
    // passThrough into the physical-shape replacement files.
    @volatile private var plannedRowIds: Option[(String, String)] = None
    @volatile private var mintedConf: Map[String, String] = Map.empty
    def plan(scanFilter: Option[String]): DmlRewrite.Plan = {
      val s = snapshot(spark, table)
        .getOrElse(sys.error(s"$table is not a Delta table (no _delta_log)"))
      planned = Some(s)
      plannedRowIds =
        if (!s.rowTrackingSupported) None
        else {
          val (idN, verN, conf) = mintRowIdCols(s)
          mintedConf = conf
          Some((idN, verN))
        }
      val bySize = s.adds.toMap
      val (candidates, _) = prune(spark, s, scanFilter)
      DmlRewrite.Plan(s.schema, s.partitionColumns,
        candidates.map(rel => DmlRewrite.Cand(
          root.resolve(rel).normalize.toString, rel, bySize(rel).size)),
        s.files.toSet)
    }
    // the carry layer reuses the shared neutral names the transforms
    // (Merge.lineageCarry, applySets) already detect; stampOutput
    // renames them to the DECLARED physical columns on the way out
    override def carryFields: Seq[StructField] =
      if (plannedRowIds.isEmpty) Seq.empty
      else Seq(StructField("_row_id", LongType, nullable = true),
        StructField("_last_updated_sequence_number", LongType, nullable = true))
    def basePath: String = root.toString
    def dataRoot: Path = root
    def scratchPrefix: String = ".graft-dml-"
    override def readFiles(spark: SparkSession, schema: StructType,
        paths: Seq[String], fileCol: Option[String]): DataFrame = {
      import org.apache.spark.sql.functions.{broadcast, coalesce, col, concat, lit}
      import spark.implicits._
      val s = planned.get
      val byRel = s.adds.toMap
      val rels = paths.map(p => root.relativize(
        Paths.get(p).toAbsolutePath.normalize).toString)
      plannedRowIds match {
        case Some(_) =>
          // rowTracking candidate read: every row comes back with its
          // id/commit-version MATERIALIZED — the file's own declared
          // columns where present (a prior preserved rewrite), else
          // baseRowId + position / defaultRowCommitVersion
          val declaredId = s.configuration
            .get("delta.rowTracking.materializedRowIdColumnName")
          val declaredVer = s.configuration
            .get("delta.rowTracking.materializedRowCommitVersionColumnName")
          val extras = (declaredId.toSeq ++ declaredVer.toSeq)
            .map(n => StructField(n, LongType, nullable = true))
          val df = readKept(spark, table, s, rels, withMeta = true,
            extraFields = extras)
          val baseDf = broadcast(rels.map { r =>
            val i = byRel(r)
            (r, i.baseRowId, i.defaultRowCommitVersion)
          }.toDF(dvFileCol, "__graft_base_row_id", "__graft_commit_ver"))
          val joined = df.join(baseDf, dvFileCol)
            .withColumn("_row_id", coalesce(
              declaredId.map(col).getOrElse(lit(null).cast(LongType)),
              col("__graft_base_row_id") + col(dvPosCol)))
            .withColumn("_last_updated_sequence_number", coalesce(
              declaredVer.map(col).getOrElse(lit(null).cast(LongType)),
              col("__graft_commit_ver")))
          val outCols = (schema.fieldNames.toIndexedSeq ++ fileCol.toSeq ++
            Seq("_row_id", "_last_updated_sequence_number")).map(col)
          fileCol.map(c => joined
            .withColumn(c, concat(lit(root.toString + "/"), col(dvFileCol))))
            .getOrElse(joined)
            .select(outCols: _*)
        case None =>
          // mapped tables ALWAYS route through readKept (physical-name /
          // field-id resolution + log-sourced partition values); unmapped
          // tables only when a candidate carries live deletion vectors
          if (!mapped &&
              !rels.exists(r => byRel.get(r).exists(_.dv.exists(_.cardinality > 0))))
            super.readFiles(spark, schema, paths, fileCol)
          else {
            val df = readKept(spark, table, s, rels, withMeta = fileCol.isDefined)
            fileCol.map(c => df
              .withColumn(c, concat(lit(root.toString + "/"), col(dvFileCol)))
              .drop(dvFileCol, dvPosCol)).getOrElse(df)
          }
      }
    }
    /** Mapped tables write replacement files in the PHYSICAL shape —
      * same projection the append path uses. rowTracking rewrites
      * rename the carried id columns to the DECLARED physical names
      * (hidden columns — not in the table schema; readers that don't
      * know them ignore them, readers that do get preserved ids).
      */
    override def stampOutput(df: DataFrame, plan: DmlRewrite.Plan): DataFrame =
      plannedRowIds match {
        case Some((idN, verN)) =>
          val renamed = df.withColumnRenamed("_row_id", idN)
            .withColumnRenamed("_last_updated_sequence_number", verN)
          if (!mapped) renamed
          // mapped + rowTracking (r17): data columns land physical, the
          // materialized id columns ride unchanged (they ARE physical)
          else toMappedPhysFrame(renamed, plan.schema,
            passThrough = Seq(idN, verN),
            stampNestedIds = planned.exists(s =>
              needsNestedIdStamp(s.configuration, plan.schema)))
        case None =>
          if (!mapped) df
          else toMappedPhysFrame(df, plan.schema, stampNestedIds =
            planned.exists(s => needsNestedIdStamp(s.configuration, plan.schema)))
      }
    override def writePartitionColumns(plan: DmlRewrite.Plan): Seq[String] =
      if (!mapped) plan.partitionColumns else mappedPartCols(planned.get)
    def harvest(dest: Path, plan: DmlRewrite.Plan): ((String, AddInfo), Long) = {
      val rel = root.relativize(dest.toAbsolutePath.normalize).toString
      val logicalData = StructType(
        plan.schema.filterNot(f => plan.partitionColumns.contains(f.name)))
      // mapped replacement files carry PHYSICAL column names — harvest
      // stats under them so pruning's logical→phys translation matches
      val dataSchema =
        if (!mapped) logicalData
        else physicalReadType(logicalData, withIds = false).asInstanceOf[StructType]
      val stats = fileStatsJson(spark, dest, dataSchema)
      val records = stats.flatMap(st =>
        try Some(mapper.readTree(st).get("numRecords").asLong())
        catch { case _: Exception => None }).getOrElse(Long.MaxValue)
      ((rel, AddInfo(Files.size(dest), Files.getLastModifiedTime(dest).toMillis,
        partitionValuesOf(rel), stats)), records)
    }
    def deletePlaced(a: (String, AddInfo)): Unit =
      Files.deleteIfExists(root.resolve(a._1))
    override def changeFeedEnabled: Boolean =
      snapshot(spark, table).exists(s => Cdf.isEnabled(s.configuration))
    def commit(plan: DmlRewrite.Plan, added: Seq[(String, AddInfo)],
        touchedTokens: Seq[String], conflictPred: Option[String],
        changes: Option[DataFrame]): Option[Long] = {
      // change data files (PROTOCOL.md): written only when the commit
      // removes live rows — a pure append's changes are derivable from
      // its add actions (readers map dataChange adds → inserts), so
      // insert-only merges pay no cdc write
      val cdcFiles: Seq[(String, AddInfo)] = changes match {
        case Some(chg) if touchedTokens.nonEmpty =>
          placeCdc(spark, table, plan.partitionColumns, chg, touchedTokens.size,
            mappedSnap = planned.filter(_ => mapped))
        case _ => Seq.empty
      }
      val committed = DeltaLog.commit(spark, table, plan.schema,
        plan.partitionColumns, added, txn = None, removed = touchedTokens,
        dataChange = true, conflict = Some((plan.conflictBase, conflictPred)),
        cdc = cdcFiles, allowMapped = mapped,
        tableConf = mintedConf,
        rowIdsPreserved = plannedRowIds.isDefined,
        dvBase = planned.map(s => {
          val byRel = s.adds.toMap
          plan.candidates.map(c => c.token -> byRel(c.token).dvId).toMap
        }))
      committed.foreach { v =>
        if ((v + 1) % 10 == 0) writeCheckpoint(spark, table, v) }
      if (committed.isEmpty)
        cdcFiles.foreach { case (rel, _) => Files.deleteIfExists(root.resolve(rel)) }
      committed
    }
  }

  /** Write one commit's change rows into `_change_data/` (hive
    * partition dirs preserved) and return their cdc actions. When the
    * change frame is EMPTY but the commit removes live rows, one empty
    * marker file still lands — a change reader would otherwise refuse
    * the data-change removes.
    */
  private def placeCdc(spark: SparkSession, table: String,
      partitionColumns: Seq[String], chg0: DataFrame,
      nTouched: Int,
      /** Present for column-mapped tables: cdc files follow the same
        * column mapping as data files (the protocol rule — a mapped
        * reader resolves `_change_data/` columns by physicalName/id
        * too), so the change frame projects physical with
        * `_change_type` passing through, under phys hive dirs.
        */
      mappedSnap: Option[Snapshot] = None): Seq[(String, AddInfo)] = {
    val root = Paths.get(table).toAbsolutePath.normalize
    val chg = mappedSnap.map(s =>
      toMappedPhysFrame(chg0, s.schema, passThrough = Seq(Cdf.changeTypeCol),
        stampNestedIds = needsNestedIdStamp(s.configuration, s.schema)))
      .getOrElse(chg0)
    val partCols = mappedSnap.map(mappedPartCols).getOrElse(partitionColumns)
    def place(df: DataFrame, partitioned: Boolean): Seq[(String, AddInfo)] = {
      val scratch = Paths.get(table, s".graft-cdc-${UUID.randomUUID()}")
      val w0 = df.write.mode("overwrite")
      val w = if (partitioned && partCols.nonEmpty)
        w0.partitionBy(partCols: _*) else w0
      w.parquet(scratch.toString)
      val parts = walkDir(scratch)
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .map(p => (scratch.relativize(p).toString, p)).sortBy(_._1)
      val placed = parts.map { case (rel, p) =>
        val dest = root.resolve(Cdf.changeDataDir).resolve(rel)
        Files.createDirectories(dest.getParent)
        try Files.createLink(dest, p)
        catch { case _: UnsupportedOperationException =>
          Files.move(p, dest, StandardCopyOption.ATOMIC_MOVE) }
        (s"${Cdf.changeDataDir}/$rel",
          AddInfo(Files.size(dest), Files.getLastModifiedTime(dest).toMillis,
            partitionValuesOf(rel), None))
      }
      walkDir(scratch).reverse.foreach(Files.deleteIfExists(_))
      placed
    }
    val n = math.max(1, math.min(nTouched, 32))
    val placed = place(chg.coalesce(n), partitioned = true)
    if (placed.nonEmpty) placed
    else place(chg.limit(0).coalesce(1), partitioned = false)
  }

  /** `src=web/part-0.parquet` → (src -> web): hive dir segments become
    * the add action's partitionValues (hive-encoding decoded).
    */
  private def partitionValuesOf(rel: String): Seq[(String, String)] =
    rel.split('/').dropRight(1).toSeq.flatMap { seg =>
      seg.split("=", 2) match {
        // Spark's null-partition sentinel dir → a REAL null, which the
        // protocol serializes as a JSON null partitionValues entry
        case Array(k, v) if v == IcebergLog.hiveNullDir =>
          Some(k -> (null: String))
        case Array(k, v) => Some(k -> decodePath(v))
        case _ => None
      }
    }.sorted

  private[graft] def commit(spark: SparkSession, table: String, schema: StructType,
      partitionBy: Seq[String], added: Seq[(String, AddInfo)],
      txn: Option[(String, Long)], removed: Seq[String] = Seq.empty,
      dataChange: Boolean = true,
      conflict: Option[(Set[String], Option[String])] = None,
      mergeSchema: Boolean = false,
      tableConf: Map[String, String] = Map.empty,
      cdc: Seq[(String, AddInfo)] = Seq.empty,
      /** DV-state guard (merge-on-read concurrency): rel path → the
        * [[AddInfo.dvId]] the caller PLANNED against. A file whose DV
        * changed underneath (a concurrent DV commit) or that vanished
        * holds retractions/rows this commit's reads never saw — abort,
        * the caller re-plans.
        */
      dvBase: Option[Map[String, String]] = None,
      /** Set ONLY by [[writeBatch]]'s mapped-append path, whose adds
        * already carry physical names/ids/stats — everything else
        * through here writes logical-named files a mapped table must
        * refuse.
        */
      allowMapped: Boolean = false,
      /** The schema json the caller PLANNED against: a table whose
        * schema moved underneath (concurrent evolution) aborts (None)
        * so the caller re-plans instead of clobbering the other
        * writer's columns — the mapped-id minting race guard. */
      schemaBase: Option[String] = None,
      /** Commit `schema` VERBATIM instead of through append-only
        * [[SchemaEvolution]] — the RENAME/DROP COLUMN shape (a
        * metaData-only commit whose new schema is not a superset of the
        * old). Only sound under `schemaBase` (concurrent drift aborts)
        * and with no files attached. */
      schemaReplace: Boolean = false,
      /** The caller's rewrite MATERIALIZED row ids into its replacement
        * files (the rowTracking DML path, r16) — lifts the
        * row-rewriting refusal for exactly those commits; fresh adds
        * still claim assignment bases (null materialized values — the
        * inserts — inherit base+position). */
      rowIdsPreserved: Boolean = false): Option[Long] = {
    require(!schemaReplace || (added.isEmpty && cdc.isEmpty &&
      removed.isEmpty && schemaBase.isDefined),
      "schemaReplace commits must be metaData-only and schemaBase-guarded")
    val dir = logDir(table)
    Files.createDirectories(dir)
    var attempt = 0
    while (attempt < 1000) {
      val snap = snapshot(spark, table)
      // backstop (write surfaces route through the mapped placement
      // path and pass allowMapped): a logical-named data file landing
      // in a mapped table would silently null out every mapped column
      // for conformant readers. Checked on the overlaid config too, so
      // a CREATE can't arm the mode. Metadata-only commits (property
      // flips, ADD COLUMNS refusals aside) carry no files and are safe.
      if (!allowMapped && (added.nonEmpty || cdc.nonEmpty))
        requireWritable(table,
          snap.map(_.configuration).getOrElse(Map.empty) ++ tableConf)
      // every enabled writer feature binds this commit (third-party
      // tables: rowTracking, inCommitTimestamp, … — contracts this
      // engine doesn't emit must refuse, never silently violate)
      snap.foreach(checkWriterFeatures(table, _,
        removesData = removed.nonEmpty && dataChange))
      txn.foreach { case (app, v) =>
        if (snap.exists(_.appVersions.get(app).exists(_ >= v))) return None
      }
      schemaBase.foreach { base =>
        if (snap.exists(_.schema.json != base)) return None
      }
      dvBase.foreach { base =>
        val now = snap.map(_.adds.toMap).getOrElse(Map.empty)
        if (!base.forall { case (rel, id) => now.get(rel).exists(_.dvId == id) })
          return None
      }
      if (removed.nonEmpty) {
        // ConcurrentDeleteRead (delta-spark's exception of the same name):
        // a concurrent OPTIMIZE already removed one of the files this
        // commit read — landing our swap would resurrect its rows as
        // duplicates. Abort; the caller deletes the files it wrote.
        val active = snap.map(_.files.toSet).getOrElse(Set.empty[String])
        if (!removed.forall(active)) return None
      }
      conflict.foreach { case (baseFiles, predSql) =>
        // ConcurrentAppend (delta-spark's serializable-isolation rule for
        // DELETE/UPDATE): a file added since the caller planned may hold
        // rows the predicate should have touched — landing this commit
        // would silently skip them. Abort when any such file MAY match
        // (stats-judged, conservative); the caller re-plans from the
        // fresh snapshot.
        val newAdds = snap.map(_.adds.filterNot { case (p, _) => baseFiles(p) })
          .getOrElse(Seq.empty)
        if (newAdds.nonEmpty) {
          val conflicting = predSql match {
            case None => true // predicate-less DML touches every row
            case Some(p) =>
              val conj = StatsPruning.conjunctsOf(spark, p)
              // mapped tables key concurrent adds' stats physically —
              // translate the logical predicate names like prune() does
              val physOf: Map[String, Seq[String]] = snap match {
                case Some(s0) if mappingMode(s0.configuration) != "none" =>
                  physPathsOf(s0.schema)
                case _ => Map.empty
              }
              newAdds.exists { case (_, info) =>
                val fs = addFileStats(info, physOf)
                conj.forall(c => StatsPruning.mayMatch(fs, c, snap.get.schema))
              }
          }
          if (conflicting) return None
        }
      }
      // the schema this version commits under: exact match or sanctioned
      // evolution — NEVER a silent replace (SchemaEvolution); changing
      // the partitioning of an existing table is always an error
      snap.foreach { s0 =>
        // schemaReplace (RENAME COLUMN) may change a partition column's
        // LOGICAL name; the physical layout is untouched either way
        if (!schemaReplace && s0.partitionColumns != partitionBy)
          throw new IllegalArgumentException(
            s"$table is partitioned by (${s0.partitionColumns.mkString(", ")}); " +
              s"this write declares (${partitionBy.mkString(", ")}) — " +
              "repartitioning an existing table requires a rewrite, not an append")
      }
      val tableSchema =
        if (schemaReplace) schema
        else snap.map { s0 =>
          // a conflict-guarded (DML) commit carries its PLAN-time snapshot's
          // schema: drift here means a concurrent ADD COLUMNS landed after
          // planning — that's a concurrency LOSS (re-plan from the fresh
          // snapshot picks up the evolved schema), not a schema error
          try SchemaEvolution.resolve(s0.schema, schema, mergeSchema, table)
          catch { case _: IllegalArgumentException if conflict.isDefined => return None }
        }.getOrElse(schema)
      val version = snap.map(_.version + 1).getOrElse(0L)
      // configuration carries forward; tableConf entries overlay it (a
      // CREATE with change_feed='true' lands delta.enableChangeDataFeed
      // here, and enabling it later is a metaData-only commit)
      val configuration = snap.map(_.configuration).getOrElse(Map.empty) ++ tableConf
      // rowTracking (r16): when the protocol SUPPORTS the feature, every
      // NEW add claims a fresh baseRowId past the delta.rowTracking
      // high-water mark and the commit bumps the watermark domain
      // metadata. This engine APPENDS to such tables; anything that
      // rewrites or retracts rows would need the materialized-column id
      // preservation it doesn't implement — refuse loudly.
      val rowTrackingOn = snap.exists(_.rowTrackingSupported)
      // minted-materialized-name race guard (r16): a concurrent first
      // DML may have DECLARED different column names since this caller
      // planned — overlaying ours would orphan the winner's physically
      // written ids (reads would silently fall back to base+position
      // on its rewritten files). Abort; the caller re-plans and adopts
      // the declared names.
      if (rowIdsPreserved) {
        val declared = snap.map(_.configuration).getOrElse(Map.empty)
        for (k <- Seq("delta.rowTracking.materializedRowIdColumnName",
          "delta.rowTracking.materializedRowCommitVersionColumnName"))
          if (tableConf.contains(k) && declared.get(k).exists(_ != tableConf(k)))
            return None
      }
      val (added2, rowIdDomain): (Seq[(String, AddInfo)], Option[Long]) =
        if (!rowTrackingOn) (added, None)
        else {
          val liveBase = snap.map(_.adds.toMap).getOrElse(Map.empty)
          val (reAdds, freshAdds) =
            added.partition { case (p, _) => liveBase.contains(p) }
          // sound shapes: pure appends (fresh ids assign), metadata-only
          // commits, and pure DV retractions — delta's DV swap removes
          // and re-ADDS the same path with a new deletion vector, which
          // keeps the file (and every surviving row's position, hence
          // its id) stable. Everything that REWRITES rows (CoW removes
          // of paths not re-added, MoR postimages = fresh adds beside
          // re-adds, cdc) would need id preservation through the
          // materialized-column machinery.
          val reAddSet = reAdds.map(_._1).toSet
          val dvSwapOnly = removed.nonEmpty &&
            removed.forall(reAddSet.contains) && freshAdds.isEmpty
          require(rowIdsPreserved || (cdc.isEmpty &&
            (dvSwapOnly || (removed.isEmpty && reAdds.isEmpty))),
            s"$table enables rowTracking; this engine APPENDS to such " +
              "tables (fresh row ids + watermark), retracts via pure " +
              "DELETION VECTORS (positions stable, ids preserved), and " +
              "runs copy-on-write DML through materialized row-id " +
              "columns — but this commit shape would rewrite rows " +
              "WITHOUT preserving their ids; route it through a writer " +
              "that implements preservation for it")
          if (added.isEmpty) (added, None)
          else {
            // re-adds (DV swaps) inherit the live add's identity; fresh
            // adds claim past the watermark
            var hwm = snap.map(_.rowIdHighWaterMark).getOrElse(-1L)
            var bumped = false
            val out = added.map { case (p, info) =>
              liveBase.get(p) match {
                case Some(live) =>
                  p -> info.copy(baseRowId = live.baseRowId,
                    defaultRowCommitVersion = live.defaultRowCommitVersion)
                case None =>
                  val records = info.stats.flatMap { s =>
                    try Option(mapper.readTree(s).get("numRecords")).map(_.asLong())
                    catch { case _: Exception => None }
                  }.getOrElse(sys.error(
                    s"$table: rowTracking requires numRecords stats to assign " +
                      s"row ids, and $p has none"))
                  val base = hwm + 1
                  hwm += records
                  bumped = true
                  p -> info.copy(baseRowId = Some(base),
                    defaultRowCommitVersion = Some(version))
              }
            }
            (out, if (bumped) Some(hwm) else None)
          }
        }
      val sb = new StringBuilder
      def line(n: com.fasterxml.jackson.databind.node.ObjectNode): Unit = {
        sb.append(n.toString).append('\n'); ()
      }
      val ci = mapper.createObjectNode()
      val ciBody = ci.putObject("commitInfo")
      ciBody.put("timestamp", System.currentTimeMillis())
      // IN-COMMIT TIMESTAMPS (the ICT writer feature, default-on in
      // newer third-party tables): once enabled, every commit must
      // carry a commitInfo.inCommitTimestamp strictly GREATER than the
      // parent's — max(parent+1, wall clock), recomputed per commit
      // attempt so a lost version race re-derives against the winner.
      // A parent whose commit json was aged out can't prove
      // monotonicity — refuse rather than guess backwards in time.
      // ICT is governed by the delta.enableInCommitTimestamps PROPERTY;
      // a table can carry the writer feature with the property false
      // (feature supported, not enabled) — stamping there is spurious,
      // and refusing on an aged-out parent there is wrong. The feature
      // bit alone never turns ICT on.
      val ictOn = configuration.get("delta.enableInCommitTimestamps")
        .exists(_.equalsIgnoreCase("true"))
      var ictValue: Option[Long] = None
      if (ictOn) {
        val parentIct: Option[Long] = snap.map { s0 =>
          val p = dir.resolve(f"${s0.version}%020d.json")
          require(Files.exists(p),
            s"$table: inCommitTimestamp is enabled but version ${s0.version}'s " +
              "commit was aged out — the monotonic parent timestamp is " +
              "unknowable; refusing to write a possibly-regressing one")
          commitTs(p)
        }
        val v = math.max(System.currentTimeMillis(),
          parentIct.map(_ + 1).getOrElse(Long.MinValue))
        ictValue = Some(v)
        ciBody.put("inCommitTimestamp", v)
      }
      ciBody.put("operation",
        if (!dataChange) "OPTIMIZE"
        else if (version == 0L) "CREATE TABLE AS SELECT" else "WRITE")
      ciBody.putObject("operationParameters").put("mode", "Append")
      line(ci)
      // protocol: CDF is a WRITER feature (legacy minWriterVersion 4);
      // deletion vectors are a READER+WRITER table feature (protocol
      // 3/7 with explicit feature lists — DV-unaware readers must
      // refuse, or they would silently over-return deleted rows).
      // Declared at creation or when a later commit first enables either
      val cdfOn = Cdf.isEnabled(configuration)
      val cdfWasOn = snap.exists(s0 => Cdf.isEnabled(s0.configuration))
      val dvOn = dvEnabled(configuration) || added.exists(_._2.dv.isDefined)
      val dvWasOn = snap.exists(s0 => dvEnabled(s0.configuration) ||
        s0.adds.exists(_._2.dv.isDefined))
      val cmOn = mappingMode(configuration) != "none"
      // the mode can only be minted at CREATE: existing files are
      // logical-named, so arming it later would make conformant readers
      // resolve physicalNames that do not exist on disk
      require(!cmOn || snap.isEmpty ||
        snap.exists(s0 => mappingMode(s0.configuration) != "none"),
        s"$table: delta.columnMapping.mode cannot be enabled on an " +
          "existing table (its files are logical-named); create a new " +
          "mapped table and copy the rows")
      // ICT is a WRITER FEATURE: arming the property must also declare
      // `inCommitTimestamp` in writerFeatures (spec), or conformant
      // readers ignore the stamps this table now relies on
      val ictWasOn = snap.exists(
        _.configuration.get("delta.enableInCommitTimestamps")
          .exists(_.equalsIgnoreCase("true")))
      val ictFeatureMissing = ictOn &&
        !snap.flatMap(_.protocolJson).exists(_.contains("\"inCommitTimestamp\""))
      if (version == 0L || (cdfOn && !cdfWasOn) || (dvOn && !dvWasOn) ||
          ictFeatureMissing) {
        val pr = mapper.createObjectNode()
        val prBody = pr.putObject("protocol")
        // the protocol being REPLACED: a rewrite must never downgrade it
        // or drop a feature it declared — readers/writers the old
        // protocol bound would silently unbind
        val prevNode = snap.flatMap(_.protocolJson).map(mapper.readTree)
        val prevMr = prevNode.flatMap(n => Option(n.get("minReaderVersion"))
          .map(_.asInt())).getOrElse(1)
        val prevMw = prevNode.flatMap(n => Option(n.get("minWriterVersion"))
          .map(_.asInt())).getOrElse(2)
        def prevFeatures(side: String): Seq[String] = prevNode.flatMap(n =>
          Option(n.get(side)).filterNot(_.isNull).map(a =>
            (0 until a.size()).map(a.get(_).asText()): Seq[String]))
          .getOrElse(Seq.empty)
        if (dvOn || dvWasOn || ictOn || prevMw >= 7) {
          // TABLE-FEATURES form: explicit lists MUST carry every feature
          // the replaced protocol declared or implied — and once a table
          // is on the features form (prevMw 7) it never leaves it
          val rFeat = scala.collection.mutable.LinkedHashSet.empty[String]
          rFeat ++= prevFeatures("readerFeatures")
          if (dvOn || dvWasOn) rFeat += "deletionVectors"
          // columnMapping is a READER+WRITER feature on 3/7 protocols —
          // dropping it here would let mapping-unaware readers misread
          // the physical names this table's files carry
          if (cmOn) rFeat += "columnMapping"
          prBody.put("minReaderVersion",
            math.max(prevMr, if (rFeat.nonEmpty) 3 else 1))
          if (rFeat.nonEmpty) {
            val rf = prBody.putArray("readerFeatures")
            rFeat.foreach(rf.add)
          }
          prBody.put("minWriterVersion", 7)
          val wf = prBody.putArray("writerFeatures")
          val implied = scala.collection.mutable.LinkedHashSet.empty[String]
          // legacy implications of the protocol being replaced
          // (PROTOCOL.md's minWriterVersion table — the shared copy).
          // Only a genuine UPGRADE carries them: a fresh v0 table
          // replaces nothing and declares only what it uses
          if (snap.isDefined) implied ++= impliedWriterFeatures(prevMw)
          // explicit features of the replaced protocol carry forward
          implied ++= prevFeatures("writerFeatures")
          if (dvOn || dvWasOn) implied += "deletionVectors"
          if (cmOn) implied += "columnMapping"
          if (cdfOn) implied += "changeDataFeed"
          if (ictOn) implied += "inCommitTimestamp"
          implied.foreach(wf.add)
        } else if (cmOn) {
          // legacy mapping protocol (2/5 implies columnMapping AND
          // changeDataFeed per the PROTOCOL.md implication table)
          prBody.put("minReaderVersion", math.max(prevMr, 2))
          prBody.put("minWriterVersion", math.max(prevMw, 5))
        } else {
          prBody.put("minReaderVersion", prevMr)
          prBody.put("minWriterVersion",
            math.max(prevMw, if (cdfOn) 4 else 2))
        }
        line(pr)
      }
      // spec: ENABLING ICT on an existing table records the enablement
      // point (version + the first in-commit timestamp) so readers know
      // where file-mtime history ends and ICT history begins
      val configuration2 =
        if (ictOn && !ictWasOn && snap.isDefined)
          configuration +
            ("delta.inCommitTimestampEnablementVersion" -> version.toString) ++
            ictValue.map(v =>
              "delta.inCommitTimestampEnablementTimestamp" -> v.toString)
        else configuration
      val metaChanged = snap.forall(s0 =>
        s0.schema.json != tableSchema.json || s0.configuration != configuration2)
      if (metaChanged) {
        val md = mapper.createObjectNode()
        val m = md.putObject("metaData")
        // metaData.id is TABLE identity — stable across schema evolution
        // (a fresh id only at creation; the snapshot cache's identity
        // check relies on this)
        m.put("id", snap.map(_.metaId).getOrElse(UUID.randomUUID().toString))
        val fmt = m.putObject("format")
        fmt.put("provider", "parquet")
        fmt.putObject("options")
        m.put("schemaString", tableSchema.json)
        val pc = m.putArray("partitionColumns")
        partitionBy.foreach(pc.add)
        val cfg = m.putObject("configuration")
        configuration2.toSeq.sortBy(_._1).foreach { case (k, v) => cfg.put(k, v) }
        m.put("createdTime",
          snap.map(_.createdTime).filter(_ > 0).getOrElse(System.currentTimeMillis()))
        line(md)
      }
      txn.foreach { case (app, v) =>
        val tn = mapper.createObjectNode()
        val t = tn.putObject("txn")
        t.put("appId", app)
        t.put("version", v)
        line(tn)
      }
      removed.foreach { name =>
        val rn = mapper.createObjectNode()
        val r = rn.putObject("remove")
        r.put("path", encodePath(name))
        r.put("deletionTimestamp", System.currentTimeMillis())
        // compaction rewrites the same rows: dataChange=false tells
        // streaming readers no data was logically added or removed
        r.put("dataChange", dataChange)
        line(rn)
      }
      // the watermark bump lands in the SAME commit as the adds whose
      // ids it covers (rowTracking's atomicity contract)
      rowIdDomain.foreach { hwm =>
        val dn = mapper.createObjectNode()
        val d = dn.putObject("domainMetadata")
        d.put("domain", "delta.rowTracking")
        d.put("configuration", s"""{"rowIdHighWaterMark":$hwm}""")
        d.put("removed", false)
        line(dn)
      }
      added2.foreach { case (name, info) =>
        val an = mapper.createObjectNode()
        val a = an.putObject("add")
        a.put("path", encodePath(name))
        val pv = a.putObject("partitionValues")
        info.partitionValues.foreach { case (k, v) => pv.put(k, v) }
        a.put("size", info.size)
        a.put("modificationTime", info.modificationTime)
        a.put("dataChange", dataChange)
        info.stats.foreach(s => a.put("stats", s))
        info.baseRowId.foreach(b => { a.put("baseRowId", b); () })
        info.defaultRowCommitVersion.foreach(v =>
          { a.put("defaultRowCommitVersion", v); () })
        info.dv.foreach { d =>
          val dn = a.putObject("deletionVector")
          dn.put("storageType", d.storageType)
          dn.put("pathOrInlineDv", d.pathOrInlineDv)
          d.offset.foreach(o => { dn.put("offset", o); () })
          dn.put("sizeInBytes", d.sizeInBytes)
          dn.put("cardinality", d.cardinality)
        }
        line(an)
      }
      cdc.foreach { case (name, info) =>
        // change data files (PROTOCOL.md "cdc" action): the commit's
        // change rows under _change_data/, dataChange=false always —
        // they describe the change, they don't add table rows
        val cn = mapper.createObjectNode()
        val a = cn.putObject("cdc")
        a.put("path", encodePath(name))
        val pv = a.putObject("partitionValues")
        info.partitionValues.foreach { case (k, v) => pv.put(k, v) }
        a.put("size", info.size)
        a.put("dataChange", false)
        line(cn)
      }
      val bytes = sb.toString.getBytes("UTF-8")
      val tmp = dir.resolve(s".${UUID.randomUUID()}.tmp")
      Files.write(tmp, bytes)
      try {
        try Files.createLink(dir.resolve(f"$version%020d.json"), tmp)
        catch { case _: UnsupportedOperationException =>
          // no hard links (e.g. some network filesystems): same-dir rename
          // WITHOUT REPLACE_EXISTING keeps put-if-absent semantics AND
          // full-content visibility (a CREATE_NEW content write is not
          // atomic — a concurrent snapshot() could read a torn file)
          Files.move(tmp, dir.resolve(f"$version%020d.json"))
        }
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

  private val domainMetadataType = StructType(Seq(
    StructField("domain", StringType),
    StructField("configuration", StringType),
    StructField("removed", BooleanType)))

  // checkpoint rows: one live action per row, exactly one non-null column
  private val checkpointSchema = StructType(Seq(
    StructField("txn", StructType(Seq(
      StructField("appId", StringType), StructField("version", LongType)))),
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType),
      StructField("deletionVector", StructType(Seq(
        StructField("storageType", StringType),
        StructField("pathOrInlineDv", StringType),
        StructField("offset", IntegerType),
        StructField("sizeInBytes", IntegerType),
        StructField("cardinality", LongType))))))),
    StructField("remove", StructType(Seq(
      StructField("path", StringType),
      StructField("deletionTimestamp", LongType),
      StructField("dataChange", BooleanType)))),
    StructField("metaData", StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(
        StructField("provider", StringType),
        StructField("options", MapType(StringType, StringType))))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))),
    StructField("protocol", StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType),
      StructField("readerFeatures", ArrayType(StringType)),
      StructField("writerFeatures", ArrayType(StringType)))))))

  /** Compact the log state at `version` into
    * `<version>%020d.checkpoint.parquet` + the `_last_checkpoint`
    * pointer. One parquet file (the protocol's classic single-file
    * checkpoint form), one row per live action.
    */
  private[graft] def writeCheckpoint(spark: SparkSession, table: String,
      version: Long): Unit = {
    // pin the state to the version the file is NAMED for: a concurrent
    // commit can land version+1 between our commit and this checkpoint,
    // and a checkpoint that embeds it would make `VERSION AS OF version`
    // return rows from the future
    val s = snapshot(spark, table, asOf = Some(version)).getOrElse(return)
    // ROUND-TRIP the table's protocol verbatim: re-deriving it here
    // would DOWNGRADE a third-party table's protocol in the checkpoint
    // (columnMapping, inCommitTimestamp, …) — a conformant reader
    // starting from that checkpoint would then silently misread the
    // very files the features govern. The derived fallback serves only
    // logs whose protocol action predates this field (none in practice:
    // commit 0 always writes one).
    val protoRow = s.protocolJson.map { pj =>
      val n = mapper.readTree(pj)
      def features(side: String): Seq[String] =
        Option(n.get(side)).filterNot(_.isNull)
          .map(a => (0 until a.size()).map(a.get(_).asText()): Seq[String])
          .orNull
      Row(
        Option(n.get("minReaderVersion")).map(_.asInt()).getOrElse(1),
        Option(n.get("minWriterVersion")).map(_.asInt()).getOrElse(2),
        features("readerFeatures"), features("writerFeatures"))
    }.getOrElse {
      val dvOn = dvEnabled(s.configuration) || s.adds.exists(_._2.dv.isDefined)
      val cdfOn = Cdf.isEnabled(s.configuration)
      if (dvOn) Row(3, 7, Seq("deletionVectors"),
        Seq("deletionVectors") ++ (if (cdfOn) Seq("changeDataFeed") else Nil))
      else Row(1, if (cdfOn) 4 else 2, null, null)
    }
    val metaRow = Row(s.metaId, Row("parquet", Map.empty[String, String]),
      s.schema.json, s.partitionColumns, s.configuration, s.createdTime)
    val txnRows = s.appVersions.toSeq.sortBy(_._1)
    // rowTracking tables (r16): the add struct grows
    // baseRowId/defaultRowCommitVersion — a checkpoint dropping them
    // would erase every row's identity for cold replays; domainMetadata
    // actions (the watermark among them) persist as their own column.
    // Legacy tables keep the byte-identical 5-column shape.
    val withRowIds = s.adds.exists(_._2.baseRowId.isDefined)
    val domains = s.domainMetadata.toSeq.sortBy(_._1)
    val addType = StructType(
      checkpointSchema("add").dataType.asInstanceOf[StructType].fields ++
        (if (withRowIds) Seq(StructField("baseRowId", LongType),
          StructField("defaultRowCommitVersion", LongType)) else Seq.empty))
    val addRows: Seq[Row] = s.adds.map { case (path, info) =>
      val base = Seq[Any](encodePath(path), info.partitionValues.toMap,
        info.size, info.modificationTime, true, info.stats.orNull,
        info.dv.map(d => Row(d.storageType, d.pathOrInlineDv,
          d.offset.map(Integer.valueOf).orNull, d.sizeInBytes,
          d.cardinality)).orNull)
      Row((if (withRowIds) base ++ Seq(
        info.baseRowId.map(java.lang.Long.valueOf).orNull,
        info.defaultRowCommitVersion.map(java.lang.Long.valueOf).orNull)
      else base): _*)
    }
    val domainRows: Seq[Row] =
      domains.map { case (d, cfg) => Row(d, cfg, false) }
    // a v2Checkpoint-enabled table's checkpoints take the V2 form (r15):
    // a UUID-named manifest holding the non-file actions +
    // checkpointMetadata + `sidecar` pointers, with the add actions in
    // UUID-named parquet files under _delta_log/_sidecars/
    if (s.protocolJson.exists(_.contains("\"v2Checkpoint\""))) {
      writeV2Checkpoint(spark, table, version, protoRow, metaRow,
        txnRows, addRows, addType, domainRows)
      return
    }
    val cpSchema = StructType(
      checkpointSchema.fields.map(f =>
        if (f.name == "add") f.copy(dataType = addType) else f) ++
        (if (domainRows.nonEmpty) Seq(StructField("domainMetadata",
          domainMetadataType)) else Seq.empty))
    def pad(r5: Seq[Any]): Row =
      Row((if (domainRows.nonEmpty) r5 :+ null else r5): _*)
    val rows = Seq(
      pad(Seq(null, null, null, null, protoRow)),
      pad(Seq(null, null, null, metaRow, null))) ++
      txnRows.map { case (app, v) => pad(Seq(Row(app, v), null, null, null, null)) } ++
      domainRows.map(d => Row(Seq[Any](null, null, null, null, null, d): _*)) ++
      addRows.map(a => pad(Seq(null, a, null, null, null)))
    // MULTI-PART classic checkpoint (PROTOCOL.md
    // `<v>.checkpoint.<part>.<n>.parquet`) past the row threshold: one
    // giant single-file checkpoint serializes its write AND forces
    // every future replay through one unsplittable parquet; parts keep
    // both sides parallel at the 10⁶-add ceiling. Readers (ours
    // included) union all n parts and refuse incomplete sets.
    val nParts = math.max(1L,
      (rows.size + checkpointRowsPerPart - 1) / checkpointRowsPerPart).toInt
    val scratch = Files.createTempDirectory("delta-cp")
    if (nParts == 1) {
      spark.createDataFrame(rows.asJava, cpSchema)
        .coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      val part = listDir(scratch)
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(sys.error("checkpoint write produced no parquet part"))
      val dest = logDir(table).resolve(f"$version%020d.checkpoint.parquet")
      Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
    } else {
      // ONE job, nParts concurrent tasks, NO shuffle: parallelize slices
      // the action list directly into n partitions (any partition of
      // the actions into parts is a valid multi-part checkpoint) — a
      // repartition() here pays a full 10⁶-row exchange for nothing,
      // and the sequential per-part form serialized the writes
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, nParts), cpSchema)
        .write.mode("overwrite").parquet(scratch.toString)
      val parts = listDir(scratch)
        .filter(_.getFileName.toString.endsWith(".parquet")).sortBy(_.toString)
      require(parts.size == nParts,
        s"checkpoint write produced ${parts.size} parts, expected $nParts")
      parts.zipWithIndex.foreach { case (part, i) =>
        Files.move(part,
          logDir(table).resolve(
            f"$version%020d.checkpoint.${i + 1}%010d.$nParts%010d.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
      }
    }
    walkDir(scratch).reverse.foreach(Files.deleteIfExists(_))
    val lc = mapper.createObjectNode()
    lc.put("version", version)
    lc.put("size", rows.size.toLong)
    if (nParts > 1) lc.put("parts", nParts)
    // _last_checkpoint is a HINT (PROTOCOL.md): readers fall back to
    // listing, so a plain overwrite is allowed here
    Files.write(logDir(table).resolve("_last_checkpoint"),
      (lc.toString + "\n").getBytes("UTF-8"))
  }

  /** Actions per classic-checkpoint part file — past this a checkpoint
    * writes the PROTOCOL's multi-part form. Var: CheckpointProbe and
    * the interop spec exercise the multi-part path at test scale.
    */
  private[graft] var checkpointRowsPerPart: Long = 500000L

  /** V2 manifest shape: non-file actions + `checkpointMetadata` +
    * `sidecar` pointers.
    */
  private lazy val v2ManifestSchema = StructType(Seq(
    StructField("txn", checkpointSchema("txn").dataType),
    StructField("metaData", checkpointSchema("metaData").dataType),
    StructField("protocol", checkpointSchema("protocol").dataType),
    StructField("checkpointMetadata", StructType(Seq(
      StructField("version", LongType),
      StructField("tags", MapType(StringType, StringType))))),
    StructField("sidecar", StructType(Seq(
      StructField("path", StringType),
      StructField("sizeInBytes", LongType),
      StructField("modificationTime", LongType),
      StructField("tags", MapType(StringType, StringType)))))))

  /** The V2 (UUID-manifest + sidecar) checkpoint WRITE
    * (PROTOCOL.md "V2 Checkpoints") — symmetric with the r13/r14 read
    * path: add actions land in UUID-named parquet sidecars under
    * `_delta_log/_sidecars/` (multi-file past [[checkpointRowsPerPart]],
    * one no-shuffle job like the classic multi-part form), the
    * `<v>.checkpoint.<uuid>.parquet` manifest carries
    * checkpointMetadata + protocol + metaData + txns + one `sidecar`
    * pointer per file, and `_last_checkpoint` records the version.
    */
  private def writeV2Checkpoint(spark: SparkSession, table: String,
      version: Long, protoRow: Row, metaRow: Row,
      txnRows: Seq[(String, Long)], addRows: Seq[Row],
      addType: StructType, domainRows: Seq[Row]): Unit = {
    val scFileSchema = StructType(Seq(
      StructField("add", addType),
      StructField("remove", checkpointSchema("remove").dataType)))
    val manifestSchema = StructType(v2ManifestSchema.fields ++
      (if (domainRows.nonEmpty)
        Seq(StructField("domainMetadata", domainMetadataType)) else Seq.empty))
    val log = logDir(table)
    val scDir = log.resolve("_sidecars")
    Files.createDirectories(scDir)
    val sidecarRows = addRows.map(a => Row(a, null))
    val nParts = math.max(1L,
      (sidecarRows.size + checkpointRowsPerPart - 1) / checkpointRowsPerPart).toInt
    val sidecars: Seq[(String, Long, Long)] =
      if (sidecarRows.isEmpty) Seq.empty
      else {
        val scratch = Files.createTempDirectory("delta-cp-sc")
        (if (nParts == 1)
          spark.createDataFrame(sidecarRows.asJava, scFileSchema).coalesce(1)
        else spark.createDataFrame(
          spark.sparkContext.parallelize(sidecarRows, nParts), scFileSchema))
          .write.mode("overwrite").parquet(scratch.toString)
        val parts = listDir(scratch)
          .filter(_.getFileName.toString.endsWith(".parquet")).sortBy(_.toString)
        require(parts.size == nParts,
          s"v2 sidecar write produced ${parts.size} parts, expected $nParts")
        val moved = parts.map { part =>
          val name = s"${UUID.randomUUID()}.parquet"
          val dest = scDir.resolve(name)
          Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
          (name, Files.size(dest),
            Files.getLastModifiedTime(dest).toMillis)
        }
        walkDir(scratch).reverse.foreach(Files.deleteIfExists(_))
        moved
      }
    def pad(r5: Seq[Any]): Row =
      Row((if (domainRows.nonEmpty) r5 :+ null else r5): _*)
    val manifestRows: Seq[Row] =
      Seq(
        pad(Seq(null, null, null, Row(version, null), null)),
        pad(Seq(null, null, protoRow, null, null)),
        pad(Seq(null, metaRow, null, null, null))) ++
      txnRows.map { case (app, v) => pad(Seq(Row(app, v), null, null, null, null)) } ++
      domainRows.map(d => Row(Seq[Any](null, null, null, null, null, d): _*)) ++
      sidecars.map { case (name, size, mtime) =>
        pad(Seq(null, null, null, null, Row(name, size, mtime, null))) }
    val scratch = Files.createTempDirectory("delta-cp-v2")
    spark.createDataFrame(manifestRows.asJava, manifestSchema)
      .coalesce(1).write.mode("overwrite").parquet(scratch.toString)
    val part = listDir(scratch)
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(sys.error("v2 checkpoint write produced no parquet part"))
    Files.move(part,
      log.resolve(f"$version%020d.checkpoint.${UUID.randomUUID()}.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    walkDir(scratch).reverse.foreach(Files.deleteIfExists(_))
    val lc = mapper.createObjectNode()
    lc.put("version", version)
    lc.put("size", (manifestRows.size + addRows.size).toLong)
    Files.write(log.resolve("_last_checkpoint"),
      (lc.toString + "\n").getBytes("UTF-8"))
  }

  /** `input_file_name()`'s percent-encoded `file:` URI → the plain
    * filesystem path ([[dmlRewrite]] keys its touched-file map on it;
    * shared with IcebergLog's twin).
    */
  private[sinks] def decodeFileUri(uri: String): String =
    try new java.net.URI(uri).getPath catch { case _: Exception => uri }

  // Delta paths are URI-encoded relative paths (PROTOCOL.md "path").
  // MINIMAL percent-encoding via java.net.URI (spaces, '%', non-ASCII),
  // keeping '/', '=' (hive partition dirs!) and other legal path chars
  // literal — what canonical Delta writers emit; the decoder accepts any
  // valid percent-encoding either way.
  private def encodePath(p: String): String =
    new java.net.URI(null, null, p, null).getRawPath
  private def decodePath(p: String): String = {
    // the protocol allows ABSOLUTE add/remove paths (shallow clones);
    // this engine keys its active set, vacuum liveness and view links
    // by TABLE-RELATIVE paths, so an absolute path must refuse loudly —
    // resolving it "works" for reads but vacuum would judge the file
    // unreferenced and reclaim LIVE data after retention
    require(!p.startsWith("/") && !p.contains("://") && !p.startsWith("file:"),
      s"delta: absolute data-file path '$p' (a shallow-clone-style " +
        "table); this engine supports table-relative paths only — " +
        "refusing rather than mis-track liveness")
    // percent-decode ONLY: URLDecoder would turn a literal '+' (legal in
    // a path, means plus) into a space — pre-escape it to round-trip
    java.net.URLDecoder.decode(p.replace("+", "%2B"), "UTF-8")
  }
}
