package graft.sources

import graft.sinks.DeltaLog
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** STREAMING source over a wire-format Delta table (reference recovery
  * contract: crates/arroyo-connectors/src/filesystem/delta.rs — the delta
  * connector's exactly-once source side): tail the `_delta_log`
  * incrementally, emitting each logically-added row exactly once.
  *
  * Spark-first shape: instead of a custom partition reader, reuse
  * Spark's own battle-tested file streaming source (distributed parquet
  * reads, per-file commit log in the query checkpoint, maxFilesPerTrigger
  * backpressure). The delta-specific part is a VIEW directory of hard
  * links kept in sync with the log:
  *
  *   - the initial sync links the current snapshot's ACTIVE files (each
  *     logical row exactly once, however many OPTIMIZE passes produced it)
  *   - every later sync applies only NEW log versions, linking adds with
  *     `dataChange=true`. OPTIMIZE's compaction adds carry
  *     `dataChange=false` — honored, so compaction mid-stream re-emits
  *     NOTHING; its removes are ignored (append-only source contract)
  *   - links survive VACUUM (the view holds its own directory entries),
  *     so a slow reader never loses data to retention
  *
  * Offsets/exactly-once ride the file source's own checkpoint. Within
  * one query run that is automatic; ACROSS RESTARTS it needs the SAME
  * view directory (the checkpoint records absolute paths into it) —
  * pass `viewDir` (SQL: `view_dir`) to make the view persistent: a
  * state dot-file records the last applied log version, a reopened
  * view resumes the tail (links are idempotent by name, materialized
  * change files deterministically named per version), and `close()`
  * keeps the directory. Without `viewDir` the view is a temp dir for
  * the lifetime of one query — the Spark-native analogue of the
  * reference's two-phase source recovery either way.
  *
  * `sync()` is manual (tests, bounded AvailableNow runs); `open(...,
  * pollMs = Some(ms))` starts a daemon that keeps the view current for
  * continuous triggers.
  */
object DeltaStreamSource {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val VersionRe = """(\d{20})\.json""".r
  private val views = java.util.concurrent.ConcurrentHashMap.newKeySet[View]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    views.asScala.foreach(_.close())
  }, "graft-delta-view-cleanup"))

  final class View private[DeltaStreamSource] (val table: String, val dir: Path,
      val ignoreDeletes: Boolean = false,
      val changeFeed: Boolean = false,
      spark: Option[SparkSession] = None,
      val persistent: Boolean = false,
      /** Column-mapped table: raw files are physical-named, so the view
        * MATERIALIZES each commit's added rows in logical shape instead
        * of hard-linking — one copy of the appended rows, never the
        * table; deterministically named per version (replay-idempotent).
        */
      val mapped: Boolean = false,
      /** rowTracking stream (r17): the frame carries `_row_id` /
        * `_row_commit_version` like the batch face's readWithRowIds, so
        * the view MATERIALIZES — the snapshot with resolved ids, then
        * each commit's adds with theirs (the add action's baseRowId +
        * position / defaultRowCommitVersion, overridden by materialized
        * columns where a file carries them). Raw links can't surface
        * ids: they're per-file log state, invisible to a file stream.
        */
      val rowTracking: Boolean = false) {
    @volatile private[DeltaStreamSource] var lastVersion: Long = -1L
    /** Has this view EVER emitted a retraction (materialized a change
      * commit)? Until then, pure appends RAW-LINK even into a
      * change-feed view: linked rows carry null `_change_seq`, which
      * nets FIRST — sound exactly while the stream is retraction-free
      * (every future retract has a higher commit seq). The first change
      * commit flips this permanently (persisted with lastVersion).
      */
    @volatile private[DeltaStreamSource] var retractsSeen: Boolean = false
    @volatile private var closed = false
    private[DeltaStreamSource] var poller: Option[Thread] = None
    @volatile private[DeltaStreamSource] var pollerFailure: Option[Throwable] = None

    /** Persistent views record the last APPLIED log version in a
      * dot-file (invisible to the file stream) so a reopened view
      * resumes the tail instead of re-linking the snapshot. Written
      * AFTER the version's files land: a crash between replays the
      * version, whose links/materializations are idempotent by name.
      */
    private[DeltaStreamSource] val stateFile = dir.resolve(".graft-view-state")
    private[DeltaStreamSource] def saveState(): Unit = if (persistent) {
      val tmp = dir.resolve(s".graft-view-state.${java.util.UUID.randomUUID()}")
      // line 2 records retractsSeen with the SAME atomicity as
      // lastVersion, so crash replays re-derive link-vs-materialize
      // decisions identically
      Files.write(tmp, s"$lastVersion\n$retractsSeen".getBytes("UTF-8"))
      Files.move(tmp, stateFile, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    private[DeltaStreamSource] def loadState(): Unit = {
      val lines = new String(Files.readAllBytes(stateFile), "UTF-8")
        .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
      lastVersion = lines.head.toLong
      // pre-r14 state files carry only lastVersion: assume retractions
      // were seen (conservative -- appends materialize, never mis-order)
      retractsSeen = lines.lift(1).map(_.toBoolean).getOrElse(true)
    }

    /** The metaData schema the stream was OPENED under: Spark pins a
      * file-stream's schema per query, so a table evolving beneath a
      * running stream would silently never surface its new columns —
      * sync fails loudly instead (delta-spark's schema-change rule) and
      * a restart (cheap with a persistent `view_dir`) picks them up.
      */
    @volatile private[DeltaStreamSource] var openSchemaJson: String = null

    /** Apply log versions > lastVersion to the view: link every add with
      * dataChange=true, skip dataChange=false (OPTIMIZE), ignore
      * dataChange=false removes. A remove with `dataChange=true` (a
      * DELETE/UPDATE rewrote live rows) BREAKS the append-only source
      * contract — this stream has already emitted rows the table no
      * longer holds and cannot retract them — so sync FAILS loudly
      * (delta-spark's rule) unless the source was opened with
      * `ignore_deletes`; then the WHOLE change commit is skipped, adds
      * included (they rewrite already-emitted rows — linking them would
      * double-emit the survivors): delta-spark's skipChangeCommits shape.
      * Returns the number of files newly linked. Thread-safe (the poller
      * and a manual caller may race).
      */
    def sync(): Int = synchronized {
      if (closed) return 0
      pollerFailure.foreach(throw _)
      val logDir = Paths.get(table, "_delta_log")
      if (!Files.isDirectory(logDir)) return 0
      val s = Files.list(logDir)
      val entries = try s.iterator().asScala.toSeq finally s.close()
      val jsons = entries.flatMap(p => p.getFileName.toString match {
        case VersionRe(v) if v.toLong > lastVersion => Some((v.toLong, p))
        case _ => None
      }).sortBy(_._1)
      var linked = 0
      jsons.foreach { case (v, p) =>
        // commits are dense; a gap means the JSON tail was aged out past a
        // checkpoint UNDER the running stream — fail loudly rather than
        // guess (re-linking from a snapshot could double-emit compacted rows)
        require(v == lastVersion + 1,
          s"$table: log versions ${lastVersion + 1}..${v - 1} missing under a " +
            "running stream (aged out past a checkpoint?)")
        val actions = Files.readAllLines(p).asScala.filter(_.nonEmpty)
          .map(mapper.readTree).toSeq
        // schema-change guard, from the commit's own metaData action (no
        // extra log replay — sync stays O(new versions)): normalize both
        // sides through StructType.json so a TBLPROPERTIES-only metaData
        // rewrite (same schema) passes. Thrown BEFORE the version applies,
        // so a restarted view resumes exactly here under the new schema.
        if (openSchemaJson != null) actions.find(_.has("metaData")).foreach { n =>
          val sj = org.apache.spark.sql.types.DataType.fromJson(
            n.get("metaData").get("schemaString").asText()).json
          if (sj != openSchemaJson)
            throw new IllegalStateException(
              s"$table: schema changed under a running stream at version $v " +
                "(the file source pins its schema per query, so new columns " +
                "would silently never surface). Restart the stream to pick " +
                "up the evolved schema — a persistent view_dir resumes " +
                "without re-emitting.")
        }
        // a remove without the dataChange key (third-party writers may
        // omit it) defaults to TRUE per the protocol — treating it as a
        // data change is the safe reading for an append-only stream
        val changeCommit = actions.exists(n =>
          n.has("remove") && Option(n.get("remove").get("dataChange"))
            .forall(_.asBoolean(true)))
        val hasCdc = actions.exists(_.has("cdc"))
        // an add without the dataChange key defaults to TRUE like the
        // remove reading above (third-party writers may omit it)
        val hasDcAdd = actions.exists(n => n.has("add") &&
          Option(n.get("add").get("dataChange")).forall(_.asBoolean(true)))
        // pure appends (no cdc, no data-changing remove) RAW-LINK into a
        // retraction-free change-feed stream instead of materializing --
        // the zero-copy economics of the append-only path (SCALE.md
        // chain probe); mapped tables always materialize (physical
        // names), and the first retraction flips to materialization
        val linkablePureAppend = changeFeed && hasDcAdd &&
          !hasCdc && !changeCommit && !retractsSeen && !mapped
        if (changeFeed && !linkablePureAppend &&
            (hasCdc || changeCommit || hasDcAdd)) {
          if (hasCdc || changeCommit) retractsSeen = true
          if (changeCommit && !hasCdc)
            throw new IllegalStateException(
              s"$table: version $v deleted or updated live rows WITHOUT " +
                s"change data (set ${graft.sinks.Cdf.enableProp}=true on " +
                "the table before running DML) — a change-feed stream " +
                "cannot reconstruct the retractions.")
          // CHANGE FEED: materialize the commit's change rows (cdc files
          // for DML commits, adds→insert for appends — readChanges'
          // single-version frame) into the view with the in-file
          // _change_type + _change_seq columns. Materializing rather
          // than linking stamps COMMIT order into every row: Spark packs
          // file splits by size, so arrival order across files means
          // nothing, and a key's retract must still net before its
          // replacement. Cost: one copy of the commit's change rows —
          // bounded by the change, never the table; the append-only
          // source (changeFeed=false) remains the zero-copy path.
          linked += materialize(v, actions)
        } else if (changeCommit && !ignoreDeletes)
          throw new IllegalStateException(
            s"$table: version $v deleted or updated live rows under a running " +
              "append-only stream (this source cannot retract emitted rows). " +
              "Restart from a fresh snapshot, open the source with " +
              "ignore_deletes=true to skip change commits whole, or enable " +
              s"${graft.sinks.Cdf.enableProp} and open with change_feed=true " +
              "to stream the changes as retractions.")
        else if (!changeCommit && rowTracking) {
          // rowTracking stream: materialize the commit's adds with their
          // row identity from the commit's OWN action lines
          val adds = parseDcAdds(actions).map(a =>
            ((a.rel, a.partitionValues, a.baseRowId, a.defaultRowCommitVersion),
              a.stats))
          if (adds.nonEmpty) linked += materializeAddsWithIds(v, adds)
        }
        else if (!changeCommit && mapped) {
          // mapped tables: the raw files are physical-named — materialize
          // the commit's added rows in logical shape instead of linking
          val adds = parseDcAdds(actions)
            .map(a => (a.rel, a.partitionValues, a.stats))
          if (adds.nonEmpty) linked += materializeAdds(v, adds)
        }
        else if (!changeCommit) actions.foreach { n =>
          // dataChange omitted (third-party writers) defaults TRUE, the
          // same reading hasDcAdd uses — .asBoolean() on the absent key
          // would NPE
          if (n.has("add") && Option(n.get("add").get("dataChange"))
              .forall(_.asBoolean(true))) {
            if (link(decodePath(n.get("add").get("path").asText()))) linked += 1
          }
        } // change commit + ignore_deletes: skip whole (adds rewrite
          // already-emitted survivors — linking them would double-emit)
        lastVersion = v
      }
      if (jsons.nonEmpty) saveState()
      linked
    }

    /** Materialize one version's change rows into the view — payload +
      * `_change_type` + `_change_seq`, hive-partitioned like the raw
      * links. Returns files added.
      */
    private def materialize(v: Long,
        actions: Seq[com.fasterxml.jackson.databind.JsonNode]): Int = {
      val sp = spark.getOrElse(throw new IllegalStateException(
        s"$table: change_feed view opened without a SparkSession"))
      val partCols = DeltaLog.snapshot(sp, table)
        .map(_.partitionColumns).getOrElse(Seq.empty)
      val chg = graft.sinks.Cdf.changeSeq(
        DeltaLog.readChanges(sp, table, v, Some(v)))
      // change-row count from the commit itself, so the materializer
      // skips its persist+count pre-pass: cdc files (DML commits) give
      // exact counts from their local footers — the protocol's cdc
      // action carries no stats — and append commits from add stats
      // DETERMINISM: the hint must be a pure function of the log — a
      // transient failure silently falling back to count() could chunk
      // a crash-replay differently and break name-idempotence, so any
      // failure here propagates loudly instead
      val hint: Option[Long] = {
        val cdc = actions.filter(_.has("cdc"))
          .map(n => decodePath(n.get("cdc").get("path").asText()))
        if (cdc.nonEmpty) {
          val conf = sp.sessionState.newHadoopConf()
          Some(cdc.map { rel =>
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(
              org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                new org.apache.hadoop.fs.Path(
                  Paths.get(table, rel).toAbsolutePath.toString), conf))
            try r.getRecordCount finally r.close()
          }.sum)
        } else {
          val adds = actions.filter(n => n.has("add") &&
            Option(n.get("add").get("dataChange")).forall(_.asBoolean(true)))
          val counts = adds.map(n => Option(n.get("add").get("stats"))
            .filterNot(_.isNull)
            .map(st => mapper.readTree(st.asText()).get("numRecords").asLong()))
          if (counts.nonEmpty && counts.forall(_.isDefined))
            Some(counts.flatten.sum)
          else None // third-party add without stats: fall back to count()
        }
      }
      graft.sinks.Cdf.materializeInto(dir, chg, partCols, s"cdf-$v", hint)
    }

    /** Materialize one version's ADDED rows with their row-tracking
      * identity (r17): payload + `_row_id` + `_row_commit_version` from
      * the commit's own add actions. Same hint/determinism rules as
      * [[materializeAdds]].
      */
    private def materializeAddsWithIds(v: Long,
        adds: Seq[((String, Seq[(String, String)], Option[Long], Option[Long]),
          Option[String])]): Int = {
      val sp = spark.getOrElse(throw new IllegalStateException(
        s"$table: row_tracking view opened without a SparkSession"))
      val partCols = DeltaLog.snapshot(sp, table)
        .map(_.partitionColumns).getOrElse(Seq.empty)
      val counts = adds.map(_._2.flatMap(st =>
        try Some(mapper.readTree(st).get("numRecords").asLong())
        catch { case _: Exception => None }))
      val hint = if (counts.nonEmpty && counts.forall(_.isDefined))
        Some(counts.flatten.sum) else None
      graft.sinks.Cdf.materializeInto(dir,
        DeltaLog.readAddsWithRowIds(sp, table, adds.map(_._1)),
        partCols, s"add-$v", hint)
    }

    /** Materialize one version's ADDED rows (mapped tables) in logical
      * shape. Hint = Σ add-stats numRecords when every add carries
      * stats (the commit's own lines — a pure function of the log, so
      * replay-stable); else the materializer's count pre-pass, whose
      * chunking drift a replay absorbs via the pinned-parts rule.
      */
    private def materializeAdds(v: Long,
        adds: Seq[(String, Seq[(String, String)], Option[String])]): Int = {
      val sp = spark.getOrElse(throw new IllegalStateException(
        s"$table: mapped view opened without a SparkSession"))
      val partCols = DeltaLog.snapshot(sp, table)
        .map(_.partitionColumns).getOrElse(Seq.empty)
      val counts = adds.map(_._3.flatMap(st =>
        try Some(mapper.readTree(st).get("numRecords").asLong())
        catch { case _: Exception => None }))
      val hint = if (counts.nonEmpty && counts.forall(_.isDefined))
        Some(counts.flatten.sum) else None
      graft.sinks.Cdf.materializeInto(dir,
        DeltaLog.readMappedAdds(sp, table, adds.map(a => (a._1, a._2))),
        partCols, s"add-$v", hint)
    }

    /** Hard-link `rel` from the table into the view (preserving hive
      * partition subdirs); true when newly linked. Link-first (no
      * exists pre-check): the common case is a NEW file, and the
      * already-linked case is handled by the cheap FileAlreadyExists
      * catch — one syscall per file instead of two.
      */
    private[sources] def link(rel: String): Boolean = {
      val dest = dir.resolve(rel)
      Files.createDirectories(dest.getParent)
      try { Files.createLink(dest, Paths.get(table, rel)); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException =>
          try { Files.copy(Paths.get(table, rel), dest); true }
          catch { case _: java.nio.file.FileAlreadyExistsException => false }
      }
    }

    /** Bulk link for the initial snapshot sync: the one O(active files)
      * driver-side moment. Chunked across a small pool — hard links are
      * tiny independent syscalls, so this is embarrassingly parallel
      * (measured ~4× at 100k files; at 10⁶ files the difference is
      * ~35 s vs ~8 s, once per stream open).
      */
    private[sources] def linkAll(rels: Seq[String]): Unit =
      SpoolLink.parallel(rels, link)

    /** Stop the poller (if any) and delete the view directory — unless
      * the view is PERSISTENT (caller-supplied dir): those survive for
      * the next open to resume from, so a restarted query's file-source
      * checkpoint (absolute paths into this dir) stays valid. The
      * streaming query reading the view must be stopped first.
      */
    def close(): Unit = {
      closed = true
      poller.foreach(_.interrupt())
      views.remove(this)
      if (!persistent && Files.exists(dir)) {
        val s = Files.walk(dir)
        val paths = try s.iterator().asScala.toSeq finally s.close()
        paths.reverse.foreach(p => try Files.deleteIfExists(p) catch { case _: Exception => })
      }
    }
  }

  /** Open a streaming read of `table`. Returns the streaming frame
    * (schema + column order exactly as the table's metaData declares) and
    * the [[View]] handle (manual [[View.sync]] for bounded runs,
    * [[View.close]] when the query is done). `pollMs` starts a daemon
    * that keeps the view current for continuous triggers.
    *
    * `changeFeed=true` (r11) tails the table as an UPDATING stream
    * instead of refusing DML commits: the current snapshot emits as
    * inserts, appends keep emitting as inserts, and every change commit
    * emits its recorded `_change_data` rows — the frame then carries
    * payload + `_updating_meta{is_retract, id}`
    * ([[graft.sinks.Cdf.updatingStream]]; `keys` declares the id hash
    * columns, typically the table's merge keys), so the output of a
    * `merge_keys` upsert sink feeds straight into updating aggregates /
    * another upsert sink. Requires `delta.enableChangeDataFeed` on the
    * table for any commit that deletes or updates rows.
    */
  def open(spark: SparkSession, table: String,
      pollMs: Option[Long] = None,
      ignoreDeletes: Boolean = false,
      changeFeed: Boolean = false,
      keys: Seq[String] = Seq.empty,
      viewDir: Option[Path] = None,
      startingVersion: Option[Long] = None,
      /** Surface `_row_id`/`_row_commit_version` per row (r17) — the
        * streaming face of [[DeltaLog.readWithRowIds]]. Snapshot and
        * per-commit adds materialize with resolved ids. */
      rowTracking: Boolean = false): (DataFrame, View) = {
    require(!(changeFeed && ignoreDeletes),
      "change_feed and ignore_deletes are mutually exclusive (the change " +
        "feed streams exactly the commits ignore_deletes would drop)")
    require(!(rowTracking && changeFeed),
      "row_tracking and change_feed are mutually exclusive (the change " +
        "feed's retraction frame carries its own identity columns)")
    val snap = DeltaLog.snapshot(spark, table)
      .getOrElse(sys.error(s"$table is not a Delta table (no _delta_log)"))
    require(!rowTracking || snap.rowTrackingSupported,
      s"$table does not carry the rowTracking writer feature")
    // column-mapped tables: raw files are physical-named, so the view
    // MATERIALIZES (initial snapshot once, then each commit's added
    // rows) instead of hard-linking — logical-shaped copies, bounded by
    // the rows appended, deterministically named per version
    val mapped = DeltaLog.mappingMode(snap.configuration) != "none"
    // `viewDir` makes the view PERSISTENT: the same directory (and so
    // the same absolute file paths the query's file-source checkpoint
    // recorded) serves across restarts — a reopened view reads its
    // state file and resumes the log tail instead of re-linking the
    // snapshot, which under a fresh temp dir would re-emit every row
    val dir = viewDir.map { d => Files.createDirectories(d); d }
      .getOrElse(Files.createTempDirectory("graft-delta-view"))
    // claim the marker era BEFORE any link lands — keeps the O(1)
    // change-feed sync probe on partitioned views (Cdf.stampViewEra)
    graft.sinks.Cdf.stampViewEra(dir)
    val view = new View(table, dir, ignoreDeletes, changeFeed, Some(spark),
      persistent = viewDir.isDefined, mapped = mapped,
      rowTracking = rowTracking)
    views.add(view)
    val resumed = view.persistent && Files.exists(view.stateFile)
    if (resumed) {
      // the state file wins over starting_version: the query already
      // consumed up to it
      view.loadState()
      view.sync() // catch up on commits landed while the view was closed
    } else startingVersion match {
      case Some(sv) =>
        // delta-spark's startingVersion: replay the log FROM a version
        // instead of starting at the current snapshot — the sync applies
        // versions sv..current (each must still exist; aged-out tails
        // fail loudly inside sync)
        require(sv >= 0 && sv <= snap.version + 1,
          s"$table: starting_version $sv is past the log (${snap.version})")
        view.lastVersion = sv - 1
        view.sync()
      case None if rowTracking =>
        // rowTracking initial state: ONE materialization of the whole
        // snapshot with RESOLVED ids (materialized columns override
        // base+position — the batch face's rule), so rows rewritten by
        // prior DML stream out under their preserved identity
        if (snap.files.nonEmpty)
          graft.sinks.Cdf.materializeInto(view.dir,
            DeltaLog.readWithRowIds(spark, table),
            snap.partitionColumns, s"rt-${snap.version}")
        view.lastVersion = snap.version
        view.saveState()
      case None if mapped =>
        // mapped initial state: ONE logical-shaped materialization of the
        // whole snapshot (readKept's mapped path handles partitions + DVs)
        if (snap.files.nonEmpty)
          graft.sinks.Cdf.materializeInto(view.dir,
            DeltaLog.readKept(spark, table, snap, snap.files),
            snap.partitionColumns, s"map-${snap.version}")
        view.lastVersion = snap.version
        view.saveState()
      case None =>
        // initial state: the active snapshot IS each logical row exactly
        // once. Files carrying a deletion vector can't be hard-linked
        // (the raw file would re-emit DV-deleted rows): their LIVE rows
        // materialize instead — a copy bounded by the DV-dirty files,
        // never the table, deterministically named (replay-idempotent)
        val byRel = snap.adds.toMap
        val (dirty, clean) = snap.files.partition(rel =>
          byRel(rel).dv.exists(_.cardinality > 0))
        view.linkAll(clean)
        if (dirty.nonEmpty)
          graft.sinks.Cdf.materializeInto(view.dir,
            DeltaLog.readKept(spark, table, snap, dirty),
            snap.partitionColumns, s"dv-${snap.version}")
        view.lastVersion = snap.version
        view.saveState()
    }
    // arm the schema-change guard AFTER any catch-up sync, and build the
    // stream frame from the POST-catch-up schema: resuming ACROSS an
    // evolution is legal (this open reads the evolved schema); evolving
    // UNDER the running stream is not (sync fails loudly)
    val schemaNow = DeltaLog.snapshot(spark, table).get.schema
    view.openSchemaJson = schemaNow.json
    val rtFields = Seq(
      org.apache.spark.sql.types.StructField("_row_id",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("_row_commit_version",
        org.apache.spark.sql.types.LongType, nullable = true))
    val readSchema =
      if (changeFeed) graft.sinks.Cdf.streamSchema(schemaNow)
      else if (rowTracking)
        org.apache.spark.sql.types.StructType(schemaNow.fields ++ rtFields)
      else schemaNow
    val df0 = spark.readStream.schema(readSchema)
      .option("basePath", view.dir.toString)
      .parquet(view.dir.toString)
      // partition discovery appends partition columns last; restore the
      // metaData-declared order (same rule as the batch read).
      // Raw-linked snapshot files have no _change_type/_change_seq
      // columns → null → insert, ordered first; materialized change
      // files carry theirs.
    val df =
      if (changeFeed) graft.sinks.Cdf.updatingStream(
        df0.select((schemaNow.fieldNames.toIndexedSeq :+
          graft.sinks.Cdf.changeTypeCol :+ graft.sinks.Cdf.changeSeqCol)
          .map(org.apache.spark.sql.functions.col): _*),
        schemaNow, keys)
      else df0.select(
        (schemaNow.fieldNames.toIndexedSeq ++
          (if (rowTracking) Seq("_row_id", "_row_commit_version") else Seq.empty))
          .map(org.apache.spark.sql.functions.col): _*)
    pollMs.foreach { ms =>
      val t = new Thread(() => {
        try while (true) { view.sync(); Thread.sleep(ms) }
        catch {
          case _: InterruptedException =>
          case e: Throwable =>
            // surface the failure to the next manual sync() caller
            // instead of dying silently on a daemon thread
            view.pollerFailure = Some(e)
        }
      }, s"graft-delta-poll-${view.dir.getFileName}")
      t.setDaemon(true)
      view.poller = Some(t)
      t.start()
    }
    (df, view)
  }

  // percent-decode ONLY (same rule as DeltaLog.decodePath)
  private def decodePath(p: String): String =
    java.net.URLDecoder.decode(p.replace("+", "%2B"), "UTF-8")

  /** One parsed dataChange=true add action (r17 — the one decode both
    * the mapped and rowTracking sync branches share; an absent
    * dataChange key defaults TRUE per the protocol).
    */
  private final case class ParsedAdd(rel: String,
      partitionValues: Seq[(String, String)],
      stats: Option[String],
      baseRowId: Option[Long], defaultRowCommitVersion: Option[Long])

  private def parseDcAdds(
      actions: Seq[com.fasterxml.jackson.databind.JsonNode]): Seq[ParsedAdd] =
    actions.filter(n => n.has("add") &&
      Option(n.get("add").get("dataChange")).forall(_.asBoolean(true)))
      .map { n =>
        val a = n.get("add")
        ParsedAdd(
          decodePath(a.get("path").asText()),
          Option(a.get("partitionValues")).map(_.properties().asScala
            .map(e => e.getKey -> (if (e.getValue.isNull) null
              else e.getValue.asText())).toSeq.sorted)
            .getOrElse(Seq.empty),
          Option(a.get("stats")).filterNot(_.isNull).map(_.asText()),
          Option(a.get("baseRowId")).filterNot(_.isNull).map(_.asLong()),
          Option(a.get("defaultRowCommitVersion")).filterNot(_.isNull)
            .map(_.asLong()))
      }
}
