package graft.sinks

import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Change-data-feed vocabulary shared by the table formats (public
  * protocol: delta.io PROTOCOL.md "Change Data Files" + delta-spark's
  * CDF column contract; Iceberg's changelog-scan equivalent derives the
  * same row shape from manifest diffs).
  *
  * A change row is a table row plus `_change_type` ∈
  * {`insert`, `delete`, `update_preimage`, `update_postimage`}; batch
  * change reads additionally stamp `_commit_version` and
  * `_commit_timestamp`. Update pairs carry the SAME key in both images,
  * so a downstream retraction consumer treats `delete`/`update_preimage`
  * as retracts and `insert`/`update_postimage` as appends — exactly the
  * engine's `_updating_meta` stream shape
  * ([[graft.streaming.Debezium]]; reference semantics:
  * crates/arroyo-types/src/lib.rs:233-276 Debezium updating streams).
  */
object Cdf {

  /** delta-spark's CDF column names (public contract). */
  val changeTypeCol = "_change_type"
  val commitVersionCol = "_commit_version"
  val commitTimestampCol = "_commit_timestamp"

  /** The delta table property that turns the feed on (public name). */
  val enableProp = "delta.enableChangeDataFeed"

  /** Directory DML verbs write change files under (protocol name). */
  val changeDataDir = "_change_data"

  def isEnabled(configuration: Map[String, String]): Boolean =
    configuration.get(enableProp).exists(_.equalsIgnoreCase("true"))

  /** Table schema + `_change_type`. */
  def changeSchema(schema: StructType): StructType =
    StructType(schema.fields :+
      StructField(changeTypeCol, StringType, nullable = true))

  /** In-file ORDER column of materialized change files: commit version
    * ×2 + 0 for retract images / 1 for append images, so a key's
    * retract sorts before its replacement REGARDLESS of which file
    * split Spark reads first (FilePartition packs splits by size, not
    * name — arrival order across files is meaningless). Null = the
    * initial snapshot links, which logically precede every change.
    */
  val changeSeqCol = "_change_seq"

  /** What a change-feed VIEW's files carry. */
  def streamSchema(schema: StructType): StructType =
    StructType(changeSchema(schema).fields :+
      StructField(changeSeqCol, org.apache.spark.sql.types.LongType,
        nullable = true))

  /** Stamp a readChanges frame with [[changeSeqCol]] and drop the
    * commit columns — the shape change-feed views materialize.
    */
  def changeSeq(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    df.withColumn(changeSeqCol, col(commitVersionCol) * 2 +
      when(col(changeTypeCol).isin("delete", "update_preimage"), 0L)
        .otherwise(1L))
      .drop(commitVersionCol, commitTimestampCol)
  }

  /** Write one commit's change rows into a view directory as parquet
    * (hive-partitioned like the raw snapshot links, `_change_type` +
    * `_change_seq` in-file), via a scratch dir + hard links so files
    * appear atomically under the running file stream. File names are
    * DETERMINISTIC per commit (`<namePrefix>-<i>of<n>.parquet` over the
    * sorted scratch parts — the `of<n>` total makes an existing part
    * set self-describing, so a replay pins the first attempt's
    * chunking) and re-materializing the same version after a crash — or
    * a persistent view resuming behind its state file — hits
    * FileAlreadyExists instead of minting duplicate rows under fresh
    * names. Returns files newly added; the copy is bounded by the
    * commit's change rows, never the table.
    */
  /** Scratch dirs currently owned by a live [[materializeInto]] call in
    * this JVM — anything else matching the scratch prefix is an orphan
    * from a failed/crashed materialization and is swept on the next call.
    */
  private val activeScratch =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  /** Scratch dirs a FINISHED call in this JVM owned — sweep-on-sight at
    * the next open, whatever their age (a failed job's straggler tasks
    * can re-create paths after the owner's own cleanup). Entries whose
    * dir is confirmed gone are pruned during the sweep, so the set stays
    * bounded by the actual leftovers.
    */
  private val retiredScratch =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  /** Scratch this JVM never owned (another process's materialization
    * into the same view dir) is swept only past this age — yanking a
    * LIVE foreign scratch mid-write would fail or corrupt that
    * process's materialization. Far above any real change-commit write
    * (bounded by one commit's rows, seconds).
    */
  private val foreignOrphanAgeMs = 15L * 60 * 1000

  /** ERA STAMP (r14): claim `dir` for the marker era. A dir holding NO
    * data (no parquet files, no non-scratch subdirs) cannot hold a
    * pre-marker legacy part set, so the neverStarted fast path may
    * trust the .started markers unconditionally — without the stamp, a
    * PARTITIONED view (hive subdirs always present) would pay a full
    * view-dir walk on EVERY commit just to rule out legacy layouts,
    * the quadratic cumulative cost the markers exist to avoid. The
    * stream sources call this at VIEW OPEN (before the first link —
    * links land data outside [[materializeInto]], which would
    * otherwise see a non-empty dir and never stamp).
    */
  private[graft] def stampViewEra(dir: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    Files.createDirectories(dir)
    val stamp = dir.resolve(".graft-view-era")
    if (Files.exists(stamp)) return
    val l = Files.list(dir)
    val clean = try !l.iterator().asScala.exists { p =>
      (Files.isDirectory(p) &&
        !p.getFileName.toString.startsWith(".graft-cdf-mat")) ||
        p.getFileName.toString.endsWith(".parquet")
    } finally l.close()
    if (clean)
      try { Files.createFile(stamp); () }
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
  }

  private[graft] def materializeInto(viewDataDir: java.nio.file.Path,
      chg0: org.apache.spark.sql.DataFrame, partCols: Seq[String],
      namePrefix: String,
      /** Change-row count derived from COMMIT METADATA (log stats /
        * manifest record counts — a pure function of the table state at
        * that version, so replay-stable like the count it replaces).
        * When present, the persist+count() pre-pass is skipped: the
        * sync pays ONE evaluation of the change frame instead of two —
        * the r11-VERDICT-recorded per-commit cost of the feed. */
      rowCountHint: Option[Long] = None): Int = {
    import java.nio.file.{Files, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    // scratch lives INSIDE the view dir (dot-prefixed → invisible to the
    // file stream): a persistent view_dir may sit on a different
    // filesystem than the system temp dir, where a cross-device hard
    // link would fail with EXDEV
    stampViewEra(viewDataDir)
    val eraStamp = viewDataDir.resolve(".graft-view-era")
    // sweep ORPHANED scratch dirs first: a failed write's straggler
    // tasks can re-create scratch paths briefly after the driver
    // rethrows, so the failure-path sweep below is best-effort — this
    // is what guarantees repeated failures never ACCUMULATE leftovers
    locally {
      val now = System.currentTimeMillis()
      val l = Files.list(viewDataDir)
      try l.iterator().asScala
        .filter { p =>
          val ap = p.toAbsolutePath.normalize
          Files.isDirectory(p) &&
            p.getFileName.toString.startsWith(".graft-cdf-mat") &&
            !activeScratch.contains(ap) &&
            // this JVM's leftovers sweep on sight; a scratch we never
            // owned may be a LIVE cross-process materialization — only
            // sweep it once stale by mtime
            (retiredScratch.contains(ap) ||
              (try Files.getLastModifiedTime(p).toMillis < now - foreignOrphanAgeMs
               catch { case _: Exception => false }))
        }
        .toSeq.foreach { orphan =>
          val w = Files.walk(orphan)
          val paths = try w.iterator().asScala.toSeq finally w.close()
          paths.reverse.foreach(x =>
            try Files.deleteIfExists(x) catch { case _: Exception => () })
          if (!Files.exists(orphan))
            retiredScratch.remove(orphan.toAbsolutePath.normalize)
        }
      finally l.close()
      // prune retired entries already gone from disk (bounds the set)
      retiredScratch.asScala.filter(p =>
        p.startsWith(viewDataDir.toAbsolutePath.normalize) && !Files.exists(p))
        .toSeq.foreach(retiredScratch.remove)
    }
    // register BEFORE the directory exists: a concurrent call's orphan
    // sweep between mkdir and a later registration could yank a live
    // scratch — with this order anything on disk but unregistered is
    // genuinely dead (this JVM's) or foreign (age-gated above)
    val scratch = viewDataDir.toAbsolutePath.normalize.resolve(
      ".graft-cdf-mat" + java.util.UUID.randomUUID().toString.replace("-", ""))
    activeScratch.add(scratch)
    try Files.createDirectory(scratch)
    catch { case e: Throwable => activeScratch.remove(scratch); throw e }
    // deterministic CHUNKING, not just names: replaying a partially
    // materialized version must re-create identical parts, and Spark's
    // default split packing depends on runtime parallelism — hash
    // repartitioning on the row content pins each row to its part
    // index regardless of how the change frame was read. The part COUNT
    // is derived from the change-row count (a pure function of the
    // table state at that version, so equally replay-stable): one file
    // per ~500k rows, capped — a small CDC commit materializes ONE view
    // file instead of fanning tiny files into the stream listing.
    def walk(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
      val s = Files.walk(p)
      try s.iterator().asScala.toSeq finally s.close()
    }
    // EVERYTHING from persist() on runs under the try: even persist can
    // throw driver-side (planning evaluates projections over local
    // relations), and a throw outside the try would leave scratch both
    // on disk and registered active — invisible to the orphan sweep
    try {
      // a completed materialization leaves a dot-marker (invisible to
      // the file stream): the steady-state sync of version N+1 costs
      // one exists() probe instead of a full view-dir walk — which
      // grows with every prior version and would make cumulative sync
      // cost quadratic in view size
      val doneMarker = viewDataDir.resolve(s".$namePrefix.done")
      if (Files.exists(doneMarker)) return 0
      // …and a STARTED marker (written before the first link) bounds the
      // other direction: a brand-new prefix — every commit's common case
      // — skips the full view-dir walk below entirely, because no part
      // of this naming era can exist without the marker. Without this,
      // each commit's sync would walk every prior version's files just
      // to learn nothing is there (quadratic cumulative cost).
      val startedMarker = viewDataDir.resolve(s".$namePrefix.started")
      val neverStarted = !Files.exists(startedMarker) &&
        // a dir THIS engine created (era stamp) can hold no pre-marker
        // legacy sets: the absent .started marker alone proves nothing
        // of this prefix exists — O(1), even for partitioned views
        (Files.exists(eraStamp) || {
          // legacy-created dir: cheap top-level probe — pre-marker sets
          // carry no markers, and unpartitioned parts live at the root;
          // any same-prefix hit falls back to the full walk. A
          // PARTITIONED pre-marker set hides its parts inside hive
          // subdirectories, invisible to a top-level listing — so the
          // probe is only trusted when the view dir has no data
          // subdirectories at all (scratch dirs excepted); any subdir
          // forces the full walk rather than risk re-materializing a
          // legacy set and duplicating its change rows.
          val l = Files.list(viewDataDir)
          try !l.iterator().asScala.exists { p =>
            p.getFileName.toString.startsWith(namePrefix + "-") ||
              (Files.isDirectory(p) &&
                !p.getFileName.toString.startsWith(".graft-cdf-mat"))
          }
          finally l.close()
        })
      // files already materialized for THIS prefix are the authoritative
      // part set. Part names carry the FILE TOTAL and the repartition
      // count (`<prefix>-<i>of<M>p<K>`): under hive partitioning the
      // file count M exceeds the chunk count K (one file per task ×
      // partition value), and completeness must be judged against M —
      // judging against K would declare a crash-mid-link replay
      // complete after K of M files and silently drop the rest. A
      // partial set pins K so the content-hash repartition reproduces
      // the identical file set and the replay fills in the missing
      // names. Pre-fix names (`<prefix>-<i>` and `<prefix>-<i>of<n>`)
      // carry no file total: their presence means authoritative-as-is
      // (the historical contract for legacy sets).
      val ExistingRe = (java.util.regex.Pattern.quote(namePrefix) +
        """-(\d+)of(\d+)p(\d+)\.parquet""").r
      val LegacyRe = (java.util.regex.Pattern.quote(namePrefix) +
        """-(\d+)(?:of(\d+))?\.parquet""").r
      var legacy = false
      val existing =
        if (neverStarted) Seq.empty // nothing of this era can exist
        else walk(viewDataDir)
          .filter(p => Files.isRegularFile(p))
          .flatMap(p => p.getFileName.toString match {
            case ExistingRe(i, m, k) => Some((i.toInt, m.toInt, k.toInt))
            case LegacyRe(_, _) => legacy = true; None
            case _ => None
          })
      if (legacy) return 0 // pre-fix names: set is authoritative
      val pinned: Option[(Int, Int)] =
        if (existing.isEmpty) None
        else {
          val (m0, k0) = (existing.head._2, existing.head._3)
          require(existing.forall(e => e._2 == m0 && e._3 == k0),
            s"view dir holds $namePrefix parts with conflicting totals " +
              s"(${existing.map(e => s"${e._2}p${e._3}").distinct.sorted.mkString(",")})")
          if (existing.map(_._1).distinct.size >= m0) {
            try Files.write(doneMarker, Array.emptyByteArray)
            catch { case _: Exception => () }
            return 0 // complete
          }
          Some((m0, k0))
        }
      val nParts = pinned.map(_._2).getOrElse(
        math.max(1L, math.min(32L, (rowCountHint.getOrElse {
          chg0.persist()
          chg0.count()
        } + 499999L) / 500000L)).toInt)
      val chg = chg0.repartition(nParts,
        chg0.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
      val w = chg.write.mode("overwrite")
      (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
        .parquet(scratch.toString)
      val placed = walk(scratch).filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
        .map(p => (scratch.relativize(p).toString, p)).sortBy(_._1)
      val total = placed.size
      // a pinned replay must reproduce the first attempt's file set
      // exactly (same K + content-hash chunking + sorted rel order ⇒
      // same M); anything else means the view dir is inconsistent
      pinned.foreach { case (m0, _) => require(total == m0,
        s"$namePrefix replay produced $total parts where the first " +
          s"attempt recorded $m0; refusing to mix the sets") }
      // started marker BEFORE the first link: its absence is what lets
      // a later attempt skip the walk, so it must cover every crash
      // window in which a dest file could exist
      try Files.write(startedMarker, Array.emptyByteArray)
      catch { case _: Exception => () }
      var n = 0
      placed.zipWithIndex.foreach { case ((rel, p), i) =>
          val relDir = Option(java.nio.file.Paths.get(rel).getParent)
          val destDir = relDir.map(d => viewDataDir.resolve(d.toString))
            .getOrElse(viewDataDir)
          val dest = destDir.resolve(s"$namePrefix-${i}of${total}p$nParts.parquet")
          Files.createDirectories(destDir)
          try { Files.createLink(dest, p); n += 1 }
          catch {
            case _: java.nio.file.FileAlreadyExistsException => // replayed
            case _: UnsupportedOperationException =>
              try { Files.move(p, dest, StandardCopyOption.ATOMIC_MOVE); n += 1 }
              catch { case _: java.nio.file.FileAlreadyExistsException => () }
          }
        }
      // marker LAST: its presence asserts every link above landed
      try Files.write(doneMarker, Array.emptyByteArray)
      catch { case _: Exception => () }
      n
    } finally {
      // deregister FIRST and guard every step: unpersist of a frame whose
      // cache materialization failed can itself throw, and an aborted
      // finally here is exactly what would leave the scratch dir both
      // on disk and marked active (invisible to the orphan sweep)
      activeScratch.remove(scratch)
      // retire UNCONDITIONALLY: even a confirmed-deleted scratch can be
      // re-created moments later by a cancelled job's straggler tasks —
      // on sight at the next open is the accumulation guarantee
      retiredScratch.add(scratch)
      try chg0.unpersist() catch { case _: Exception => () }
      // best-effort immediate sweep (a failed job's straggler tasks may
      // re-create paths for a moment — the orphan sweep at the NEXT
      // call's open is the accumulation guarantee)
      var tries = 0
      while (Files.exists(scratch) && tries < 5) {
        tries += 1
        try walk(scratch).reverse.foreach(p =>
          try Files.deleteIfExists(p) catch { case _: Exception => () })
        catch { case _: Exception => () } // files vanishing mid-walk
        if (Files.exists(scratch)) Thread.sleep(50L * tries)
      }
    }
  }

  /** Change rows → the engine's updating-stream shape: payload columns
    * + `_updating_meta{is_retract, id}` ([[graft.streaming.Debezium]]'s
    * contract). `delete`/`update_preimage` retract, `insert`/
    * `update_postimage`/absent (a raw-linked append file) append; `id`
    * hashes the declared key columns so a downstream
    * [[graft.streaming.Debezium.netBatch]] / updating aggregate can
    * pair an update's images. With no keys declared the id hashes ALL
    * payload columns — the same documented no-PK degradation as
    * [[graft.streaming.Debezium.unroll]]: update pairs then emit as
    * separate d+c events; merged state is identical.
    */
  def updatingStream(df: org.apache.spark.sql.DataFrame,
      schema: StructType, keys: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    keys.foreach(k => require(schema.fieldNames.contains(k),
      s"change feed: no key column $k in the table schema"))
    val keyCols = if (keys.nonEmpty) keys else schema.fieldNames.toSeq
    val ct = coalesce(col(changeTypeCol), lit("insert"))
    val seq =
      if (df.columns.contains(changeSeqCol)) col(changeSeqCol)
      else lit(null).cast("long")
    df.select(schema.fieldNames.map(n => col(s"`$n`")).toIndexedSeq :+
      struct(
        ct.isin("delete", "update_preimage").as("is_retract"),
        md5(to_json(struct(keyCols.map(k => col(s"`$k`")): _*))).as("id"),
        // within-batch commit order (see changeSeqCol) — netBatch nets a
        // key's events by it; null = the initial snapshot, always first
        seq.as("seq"))
        .as("_updating_meta"): _*)
  }
}
