package graft.sources

import graft.sinks.IcebergLog
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** STREAMING source over a wire-format Iceberg table — the iceberg twin
  * of [[DeltaStreamSource]] (same reference recovery contract,
  * crates/arroyo-connectors/src/filesystem/source.rs): tail the table's
  * snapshot log incrementally, emitting each logically-appended row
  * exactly once.
  *
  * Same Spark-first shape: a hard-link VIEW directory over Spark's own
  * file streaming source (distributed reads, per-file offset log in the
  * query checkpoint, backpressure). The iceberg-specific part is which
  * files enter the view:
  *
  *   - the initial sync links the CURRENT snapshot's live data files
  *     (each logical row exactly once, however many rewrites produced it)
  *   - every later sync applies only NEW snapshots, in sequence-number
  *     order, linking the ADDED entries of `operation=append` snapshots.
  *     `operation=replace` (rewrite_data_files / OPTIMIZE, including
  *     ZORDER) adds NO logical rows — its snapshots are skipped whole,
  *     the iceberg analogue of Delta's dataChange=false
  *   - sequence numbers are dense by construction, so a gap means the
  *     unseen snapshots were EXPIRED under the running stream — fail
  *     loudly rather than re-link from a snapshot (which could
  *     double-emit rewritten rows)
  *   - hard links survive expire_snapshots' file GC: a slow reader
  *     never loses data to retention
  */
object IcebergStreamSource {

  private val views = java.util.concurrent.ConcurrentHashMap.newKeySet[View]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    views.asScala.foreach(_.close())
  }, "graft-iceberg-view-cleanup"))

  final class View private[IcebergStreamSource] (val table: String, val dir: Path,
      val ignoreDeletes: Boolean = false,
      val changeFeed: Boolean = false,
      spark: Option[SparkSession] = None,
      val persistent: Boolean = false,
      /** Schema history shows a RENAME: pre-rename files carry the old
        * parquet column names, so raw hard-links (read by name) would
        * silently null the renamed column — every sync MATERIALIZES
        * logical-shape rows via the field-id-stamped read schema
        * instead (the delta mapped-view pattern). */
      val renamed: Boolean = false,
      /** v3 row-lineage stream (r17): the frame carries `_row_id` /
        * `_last_updated_sequence_number` like the batch face's
        * readWithLineage, so the view MATERIALIZES — the snapshot with
        * resolved ids, then each append's adds with theirs (spec
        * assignment: the snapshot's first-row-id + position, overridden
        * by materialized columns where a file carries them). The delta
        * twin is DeltaStreamSource's rowTracking. */
      val rowLineage: Boolean = false) {
    @volatile private[IcebergStreamSource] var lastSeq: Long = -1L
    /** Has this view EVER emitted a retraction (materialized an
      * overwrite/delete snapshot)? Until then, pure appends RAW-LINK
      * into a change-feed view: linked rows carry null `_change_seq`,
      * which the netting contract orders FIRST — sound exactly when no
      * lower-seq retract of the same key can exist in the stream, i.e.
      * while the stream is retraction-free (every future retract has a
      * higher commit seq and nets after). The first DML snapshot flips
      * this permanently (persisted with lastSeq); later appends
      * materialize with real seqs.
      */
    @volatile private[IcebergStreamSource] var retractsSeen: Boolean = false
    @volatile private var closed = false
    private[IcebergStreamSource] var poller: Option[Thread] = None
    @volatile private[IcebergStreamSource] var pollerFailure: Option[Throwable] = None
    private val tableRoot = Paths.get(table).toAbsolutePath

    /** Persistent views record the last APPLIED sequence number in a
      * dot-file so a reopened view resumes the tail — see the delta
      * twin's state-file contract (written after the files land;
      * replays are idempotent by name).
      */
    @volatile private[IcebergStreamSource] var openSchemaJson: String = null
    private[IcebergStreamSource] val stateFile = dir.resolve(".graft-view-state")
    private[IcebergStreamSource] def saveState(): Unit = if (persistent) {
      val tmp = dir.resolve(s".graft-view-state.${java.util.UUID.randomUUID()}")
      // line 2 records retractsSeen with the SAME atomicity as lastSeq:
      // a crash replays both together, so link-vs-materialize decisions
      // re-derive identically
      Files.write(tmp, s"$lastSeq\n$retractsSeen".getBytes("UTF-8"))
      Files.move(tmp, stateFile, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    private[IcebergStreamSource] def loadState(): Unit = {
      val lines = new String(Files.readAllBytes(stateFile), "UTF-8")
        .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
      lastSeq = lines.head.toLong
      // pre-r14 state files carry only lastSeq: assume retractions were
      // seen (conservative — appends materialize, never mis-order)
      retractsSeen = lines.lift(1).map(_.toBoolean).getOrElse(true)
    }

    /** Apply snapshots with sequence-number > lastSeq: link the added
      * files of `append` snapshots, skip `replace` (layout rewrite, no
      * logical rows) whole. An `overwrite` snapshot (DELETE/UPDATE
      * rewrote live rows) BREAKS the append-only source contract — the
      * stream has already emitted rows the table no longer holds and
      * cannot retract them — so sync FAILS loudly unless the source was
      * opened with `ignore_deletes`; then the overwrite snapshot is
      * skipped whole, adds included (they rewrite already-emitted
      * survivors — linking them would double-emit). Returns the number
      * of files newly linked. Thread-safe.
      */
    def sync(): Int = synchronized {
      if (closed) return 0
      pollerFailure.foreach(throw _)
      val m = IcebergLog.current(table).getOrElse(return 0)
      // schema-change guard — see the delta twin: a stream's schema is
      // pinned per query; evolving under it would silently hide new
      // columns, so fail loudly and let a restart pick them up
      if (openSchemaJson != null && m.schema.json != openSchemaJson)
        throw new IllegalStateException(
          s"$table: schema changed under a running stream (the file " +
            "source pins its schema per query, so new columns would " +
            "silently never surface). Restart the stream to pick up the " +
            "evolved schema — a persistent view_dir resumes without " +
            "re-emitting.")
      val news = m.snapshots
        .filter(_.get("sequence-number").asLong() > lastSeq)
        .sortBy(_.get("sequence-number").asLong())
      // v3 initial-defaults, re-judged per sync (r17 — a default can
      // appear mid-stream via third-party metadata evolution): raw
      // links are unsound the moment one exists, because a pre-field
      // file's rows must carry the FILL — materialize instead, exactly
      // like the renamed case. Nested defaults fail loudly inside.
      val defaults = IcebergLog.initialDefaultFields(m).nonEmpty
      var linked = 0
      news.foreach { s =>
        val seq = s.get("sequence-number").asLong()
        require(seq == lastSeq + 1,
          s"$table: snapshots at sequence ${lastSeq + 1}..${seq - 1} were " +
            "expired under a running stream (slow reader past retention?)")
        val sid = s.get("snapshot-id").asLong()
        // summary and its operation key are both OPTIONAL in the spec —
        // an unlabelled snapshot reads as this engine's own default verb
        val op = Option(s.get("summary"))
          .flatMap(sm => Option(sm.get("operation"))).map(_.asText())
          .getOrElse("append")
        op match {
          case "append" if rowLineage =>
            // lineage stream: materialize the adds with resolved ids
            // (the lineage read handles renamed histories by field id
            // itself and refuses initial-default tables loudly)
            linked += materializeAddsLineage(seq, sid)
          case "append" if renamed || defaults =>
            // renamed table: links are unsound (name-resolved reads of
            // pre-rename files); default-carrying table: links are
            // unsound for files PREDATING a default field (their rows
            // must read FILLED) — materialize those through the
            // field-id read schema + per-file fills instead
            // (change-feed views included: the add-materialization
            // carries no _change_seq, which is exactly the null-first
            // contract a retraction-free stream relies on — and once
            // retractions exist, materializeChanges takes this case)
            if (changeFeed && retractsSeen) linked += materializeChanges(seq)
            else if (renamed) linked += materializeAdds(seq, sid)
            else {
              // defaults only: adds postdating every default field ARE
              // the logical rows — raw-link them (the steady-state
              // zero-copy path once the schema settles); only
              // fill-needing adds pay a materialization
              val added = IcebergLog.liveFiles(table, Some(sid))
                .filter(f => f.status == 1 && f.entryRow.get(1) == sid)
              if (IcebergLog.anyFillNeeded(table, m, added))
                linked += materializeAdds(seq, sid)
              else added.foreach(f => if (link(f.path)) linked += 1)
            }
          case "append" if changeFeed && retractsSeen =>
            // CHANGE FEED past the first retraction: materialize rather
            // than link, so every row carries its _change_seq (commit
            // order — Spark packs file splits by size, so arrival order
            // across files means nothing to a downstream netting
            // consumer, and a key retracted at a LOWER seq must net
            // before this append's re-insert)
            linked += materializeChanges(seq)
          case "append" =>
            // pure append into a retraction-free stream (or a plain
            // append-only view): RAW hard links — zero copy. Linked
            // rows read with null _change_type/_change_seq → insert,
            // ordered first; sound while no retract exists (see
            // retractsSeen) — the delta raw-link economics (SCALE.md
            // chain probe) for append-only iceberg chains
            IcebergLog.liveFiles(table, Some(sid))
              .filter(f => f.status == 1 && f.entryRow.get(1) == sid)
              .foreach(f => if (link(f.path)) linked += 1)
          case "replace" => // layout rewrite adds no logical rows — skip whole
          case "overwrite" if changeFeed =>
            // CHANGE FEED: materialize the snapshot's manifest-diff rows
            // (removed files → delete, added files → insert — the public
            // changelog-scan shape, same frame as IcebergLog.readChanges)
            // into the view as fresh parquet carrying _change_type +
            // _change_seq. The copy is bounded by the overwrite's
            // touched files, not the table.
            retractsSeen = true
            linked += materializeChanges(seq)
          case "delete" if changeFeed =>
            // merge-on-read row retraction: readChanges emits the EXACT
            // deleted rows (per-row, not file-diff) — materialize them
            retractsSeen = true
            linked += materializeChanges(seq)
          case "overwrite" | "delete" =>
            if (!ignoreDeletes) throw new IllegalStateException(
              s"$table: snapshot $sid deleted or updated live rows under a " +
                "running append-only stream (this source cannot retract " +
                "emitted rows). Restart from a fresh snapshot, open the " +
                "source with ignore_deletes=true to skip data-changing " +
                "snapshots whole, or open with change_feed=true to stream " +
                "the changes as retractions.")
          // ignore_deletes: skip whole (see scaladoc)
          case other => throw new IllegalStateException(
            s"$table: snapshot $sid has unknown operation '$other'; refusing " +
              "to guess its append-only semantics")
        }
        lastSeq = seq
      }
      if (news.nonEmpty) saveState()
      linked
    }

    /** Materialize one snapshot's change rows into the view under
      * `data/` (hive-partitioned like the raw links, `_change_type` +
      * `_change_seq` in-file). Returns files added.
      */
    private def materializeChanges(seq: Long): Int = {
      val sp = spark.getOrElse(throw new IllegalStateException(
        s"$table: change_feed view opened without a SparkSession"))
      val m = IcebergLog.current(table).get
      val chg = graft.sinks.Cdf.changeSeq(
        IcebergLog.readChanges(sp, table, seq, Some(seq)))
      // change-row count from the MANIFEST record counts (a pure
      // function of table state at this sequence — replay-stable), so
      // the materializer skips its persist+count pre-pass. Appends are
      // exact; overwrites bound by removed+added+delete-file records
      // (MoR retracts can be slightly fewer — sizing only, never
      // correctness)
      // DETERMINISM: pure function of the manifests — failures propagate
      // (a silent count() fallback could chunk a crash-replay differently)
      val hint: Option[Long] =
        m.snapshots.find(_.get("sequence-number").asLong() == seq).flatMap { snap =>
          val sid = snap.get("snapshot-id").asLong()
          val op = Option(snap.get("summary"))
            .flatMap(sm => Option(sm.get("operation"))).map(_.asText())
            .getOrElse("append")
          val live = IcebergLog.liveFiles(table, Some(sid)).filter(_.status != 2)
          val added = live.filter(f => f.status == 1 && f.entryRow.get(1) == sid)
            .map(_.records).sum
          op match {
            case "append" => Some(added)
            case "overwrite" | "delete" =>
              val livePaths = live.map(_.path).toSet
              val removed = Option(snap.get("parent-snapshot-id")).map(_.asLong())
                .map(p => IcebergLog.liveFiles(table, Some(p))
                  .filter(f => f.status != 2 && !livePaths.contains(f.path))
                  .map(_.records).sum).getOrElse(0L)
              val newDels = IcebergLog.deleteFiles(table, Some(sid))
                .filter(_.addedSnapshotId == sid).map(_.records).sum
              Some(added + removed + newDels)
            case _ => None
          }
        }
      graft.sinks.Cdf.materializeInto(dir.resolve("data"), chg,
        m.partitionColumns, s"cdf-$seq", hint)
    }

    /** Materialize one append snapshot's ADDED rows WITH their v3 row
      * lineage (r17): payload + `_row_id` +
      * `_last_updated_sequence_number`, resolved from the snapshot
      * history exactly like the batch lineage read, files read RAW (an
      * append replays as committed). Hint = Σ manifest record counts.
      */
    private def materializeAddsLineage(seq: Long, sid: Long): Int = {
      val sp = spark.getOrElse(throw new IllegalStateException(
        s"$table: row_lineage view opened without a SparkSession"))
      val m = IcebergLog.current(table).get
      val added = IcebergLog.liveFiles(table, Some(sid))
        .filter(f => f.status == 1 && f.entryRow.get(1) == sid)
      if (added.isEmpty) return 0
      graft.sinks.Cdf.materializeInto(dir.resolve("data"),
        IcebergLog.readWithLineage(sp, table, Some(added)),
        m.partitionColumns, s"add-$seq", Some(added.map(_.records).sum))
    }

    /** Materialize one append snapshot's ADDED rows in logical shape
      * (renamed tables: the field-id-stamped read schema resolves
      * pre-rename files; default-carrying tables: per-file
      * initial-default fills — both via [[IcebergLog
      * .readLiveFilesFilled]]; hive partition recovery rides basePath
      * like the batch read). Hint = Σ manifest record counts (pure
      * function of the snapshot — replay-stable).
      */
    private def materializeAdds(seq: Long, sid: Long): Int = {
      val sp = spark.getOrElse(throw new IllegalStateException(
        s"$table: materializing view opened without a SparkSession"))
      val m = IcebergLog.current(table).get
      val added = IcebergLog.liveFiles(table, Some(sid))
        .filter(f => f.status == 1 && f.entryRow.get(1) == sid)
      if (added.isEmpty) return 0
      val df = IcebergLog.readLiveFilesFilled(sp, table, m, added)
      graft.sinks.Cdf.materializeInto(dir.resolve("data"), df,
        m.partitionColumns, s"add-$seq", Some(added.map(_.records).sum))
    }

    /** Hard-link the table-absolute data `path` into the view, keeping
      * its `data/…` (hive) relative layout; true when newly linked.
      * Link-first (no exists pre-check) — see DeltaStreamSource.link.
      */
    private[sources] def link(path: String): Boolean = {
      val src = Paths.get(path).toAbsolutePath
      val dest = dir.resolve(tableRoot.relativize(src).toString)
      Files.createDirectories(dest.getParent)
      try { Files.createLink(dest, src); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException =>
          try { Files.copy(src, dest); true }
          catch { case _: java.nio.file.FileAlreadyExistsException => false }
      }
    }

    /** Stop the poller (if any) and delete the view directory — unless
      * the view is PERSISTENT (caller-supplied dir; see the delta twin).
      * The streaming query reading it must be stopped first.
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

  /** Open a streaming read of `table`: the streaming frame (schema +
    * column order exactly as the table metadata declares) and the
    * [[View]] handle. `pollMs` starts a daemon that keeps the view
    * current for continuous triggers.
    *
    * `changeFeed=true` (r11) tails the table as an UPDATING stream
    * instead of refusing overwrite snapshots: appends keep emitting as
    * inserts, and each overwrite emits its manifest-diff rows (removed
    * files retract, added files append — rows carried unchanged through
    * a rewrite cancel downstream). The frame then carries payload +
    * `_updating_meta{is_retract, id}` with `keys` driving the id hash —
    * the same contract as the delta change-feed source.
    */
  def open(spark: SparkSession, table: String,
      pollMs: Option[Long] = None,
      ignoreDeletes: Boolean = false,
      changeFeed: Boolean = false,
      keys: Seq[String] = Seq.empty,
      viewDir: Option[Path] = None,
      startingVersion: Option[Long] = None,
      /** Surface `_row_id`/`_last_updated_sequence_number` per row
        * (r17) — the streaming face of [[IcebergLog.readWithLineage]];
        * the delta twin is DeltaStreamSource's rowTracking. */
      rowLineage: Boolean = false): (DataFrame, View) = {
    require(!(changeFeed && ignoreDeletes),
      "change_feed and ignore_deletes are mutually exclusive (the change " +
        "feed streams exactly the snapshots ignore_deletes would drop)")
    require(!(rowLineage && changeFeed),
      "row_lineage and change_feed are mutually exclusive (the change " +
        "feed's retraction frame carries its own identity columns)")
    val m = IcebergLog.current(table).getOrElse(
      sys.error(s"$table is not an Iceberg table (no metadata/v*.metadata.json)"))
    // v3 initial-defaults (r17, lifting the r16 refusal): raw links
    // can't fill per file, so default-carrying tables MATERIALIZE their
    // snapshot and per-commit adds in filled shape — the renamed-table
    // pattern. Nested defaults still fail loudly inside.
    val hasDefaults = IcebergLog.initialDefaultFields(m).nonEmpty
    // a renamed table's pre-rename files carry the OLD parquet column
    // name (field ids are the identity): raw hard-links read by NAME
    // would silently null the renamed column, so such views (r14)
    // MATERIALIZE logical-shape rows through the field-id read schema —
    // the same pattern the delta mapped view uses
    val renamed = IcebergLog.renameInHistory(m)
    // persistent view (caller-supplied dir): resumes across restarts —
    // see the delta twin
    val dir = viewDir.map { d => Files.createDirectories(d); d }
      .getOrElse(Files.createTempDirectory("graft-iceberg-view"))
    // claim the marker era BEFORE any link lands — keeps the O(1)
    // change-feed sync probe on partitioned views (Cdf.stampViewEra)
    graft.sinks.Cdf.stampViewEra(dir.resolve("data"))
    val view = new View(table, dir, ignoreDeletes, changeFeed, Some(spark),
      persistent = viewDir.isDefined, renamed = renamed,
      rowLineage = rowLineage)
    views.add(view)
    val resumed = view.persistent && Files.exists(view.stateFile)
    if (resumed) {
      // the state file wins over starting_version: already consumed to it
      view.loadState()
      view.sync() // catch up on snapshots landed while the view was closed
    } else startingVersion match {
      case Some(sv) =>
        // replay from sequence number sv instead of the current snapshot
        // (sv..current must all be retained; expiry fails loudly in sync)
        require(sv >= 1 && sv <= m.lastSeq + 1,
          s"$table: starting_version $sv is past the log (${m.lastSeq})")
        view.lastSeq = sv - 1
        view.sync()
      case None if rowLineage =>
        // lineage initial state: ONE materialization of the whole
        // snapshot with resolved ids (the batch lineage read — refuses
        // loudly on non-v3 / unresolvable / default-carrying tables).
        // An EMPTY table (stream opened before the first append — the
        // natural setup order) materializes nothing; the first sync's
        // adds carry the rows.
        if (IcebergLog.liveFiles(table, None).exists(_.status != 2))
          graft.sinks.Cdf.materializeInto(dir.resolve("data"),
            IcebergLog.readWithLineage(spark, table),
            m.partitionColumns, s"lin-${m.lastSeq}")
        view.lastSeq = m.lastSeq
        view.saveState()
      case None if renamed || (hasDefaults &&
          IcebergLog.anyFillNeeded(table, m,
            IcebergLog.liveFiles(table, None).filter(_.status != 2))) =>
        // renamed / fill-needing initial state: ONE logical-shaped
        // materialization of the whole snapshot (the batch read
        // resolves pre-rename files by field id, applies deletes, and
        // fills initial-defaults per file); deterministic prefix →
        // crash replay is idempotent. A default-carrying table whose
        // live files ALL postdate the fields skips this and takes the
        // zero-copy link path below.
        graft.sinks.Cdf.materializeInto(dir.resolve("data"),
          IcebergLog.read(spark, table),
          m.partitionColumns, s"snap-${m.lastSeq}")
        view.lastSeq = m.lastSeq
        view.saveState()
      case None =>
        // initial state: the current snapshot IS each logical row exactly
        // once; the bulk link is the one O(active files) driver-side moment,
        // parallelized (SpoolLink) for high-file-count tables. Files with
        // merge-on-read position deletes can't be hard-linked (the raw
        // file would re-emit retracted rows): their LIVE rows materialize
        // instead — a copy bounded by the delete-dirty files, never the
        // table, under deterministic names (crash replay is idempotent)
        val live = IcebergLog.liveFiles(table, None).filter(_.status != 2)
        val dels = IcebergLog.deleteFiles(table, None)
        val (clean, dirty) =
          IcebergLog.splitByDeletes(live, dels, m.schema, m.fieldIds)
        SpoolLink.parallel(clean.map(_.path), view.link)
        if (dirty.nonEmpty)
          graft.sinks.Cdf.materializeInto(dir.resolve("data"),
            IcebergLog.readWithDeletes(spark, table, m.schema,
              Some(Paths.get(table, "data").toAbsolutePath.toString),
              dirty, dels, ids = m.fieldIds),
            m.partitionColumns, s"mor-${m.lastSeq}")
        view.lastSeq = m.lastSeq
        view.saveState()
    }
    val dataDir = view.dir.resolve("data")
    Files.createDirectories(dataDir)
    // arm the schema-change guard AFTER any catch-up sync and build the
    // frame from the post-catch-up schema — see the delta twin
    val schemaNow = IcebergLog.current(table).get.schema
    view.openSchemaJson = schemaNow.json
    val linFields = Seq(
      org.apache.spark.sql.types.StructField("_row_id",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("_last_updated_sequence_number",
        org.apache.spark.sql.types.LongType, nullable = true))
    val readSchema =
      if (changeFeed) graft.sinks.Cdf.streamSchema(schemaNow)
      else if (rowLineage)
        org.apache.spark.sql.types.StructType(schemaNow.fields ++ linFields)
      else schemaNow
    val df0 = spark.readStream.schema(readSchema)
      .option("basePath", dataDir.toString)
      .parquet(dataDir.toString)
      // partition discovery appends partition columns last; restore the
      // declared order (same rule as the batch read). Raw-linked
      // snapshot files have no _change_type/_change_seq columns → null →
      // insert, ordered first; materialized change files carry theirs.
    val df =
      if (changeFeed) graft.sinks.Cdf.updatingStream(
        df0.select((schemaNow.fieldNames.toIndexedSeq :+
          graft.sinks.Cdf.changeTypeCol :+ graft.sinks.Cdf.changeSeqCol)
          .map(org.apache.spark.sql.functions.col): _*),
        schemaNow, keys)
      else df0.select(
        (schemaNow.fieldNames.toIndexedSeq ++
          (if (rowLineage) linFields.map(_.name) else Seq.empty))
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
      }, s"graft-iceberg-poll-${view.dir.getFileName}")
      t.setDaemon(true)
      view.poller = Some(t)
      t.start()
    }
    (df, view)
  }
}
