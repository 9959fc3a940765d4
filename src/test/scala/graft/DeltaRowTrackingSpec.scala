package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sinks.DeltaLog

import scala.jdk.CollectionConverters._

/** Delta rowTracking writer-feature support (r16): appends to tables
  * whose protocol lists `rowTracking` assign fresh `baseRowId` /
  * `defaultRowCommitVersion` on every add past the `delta.rowTracking`
  * domain-metadata high-water mark, bumping it in the SAME commit;
  * domainMetadata actions replay through the log AND checkpoints; row-
  * REWRITING operations refuse loudly (id preservation needs the
  * materialized-column machinery this engine doesn't write).
  *
  * Fixtures mimic a third-party-created table: our CREATE, then the
  * protocol/config rewritten to the rowTracking shape (writer features
  * rowTracking + domainMetadata, delta.enableRowTracking=true).
  */
class DeltaRowTrackingSpec extends SparkSpec {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def tmp(): String =
    Files.createTempDirectory("delta_rowtracking").resolve("t").toString

  /** Rewrite commit 0 so the table carries the rowTracking protocol —
    * the layout delta-spark leaves when delta.enableRowTracking=true.
    */
  private def armRowTracking(table: String): Unit = {
    val v0 = Paths.get(table, "_delta_log", f"${0L}%020d.json")
    val lines = Files.readAllLines(v0)
    val out = new java.lang.StringBuilder
    lines.forEach { line =>
      if (line.isEmpty) ()
      else {
        val n = mapper.readTree(line)
        if (n.has("protocol")) {
          val p = n.get("protocol")
            .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          p.put("minReaderVersion", 1)
          p.put("minWriterVersion", 7)
          val wf = p.putArray("writerFeatures")
          Seq("rowTracking", "domainMetadata").foreach(wf.add)
        }
        if (n.has("metaData")) {
          val cfg = n.get("metaData").get("configuration")
            .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          cfg.put("delta.enableRowTracking", "true")
          ()
        }
        out.append(n.toString).append('\n')
      }
    }
    Files.write(v0, out.toString.getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
  }

  private def addActions(table: String): Seq[com.fasterxml.jackson.databind.JsonNode] = {
    val dir = Paths.get(table, "_delta_log")
    Files.list(dir).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".json"))
      .sortBy(_.getFileName.toString)
      .flatMap(p => Files.readAllLines(p).asScala)
      .filter(_.nonEmpty).map(mapper.readTree)
      .filter(_.has("add")).map(_.get("add"))
  }

  test("appends assign contiguous baseRowIds past the watermark; domain metadata bumps in the same commit") {
    import spark.implicits._
    val table = tmp()
    assert(DeltaLog.writeBatch(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1),
      table).contains(0L))
    armRowTracking(table)
    // two appends: ids claim [hwm+1, hwm+records] per file, in order
    assert(DeltaLog.writeBatch(
      Seq((4L, "d"), (5L, "e")).toDF("id", "v").coalesce(1), table)
      .contains(1L))
    assert(DeltaLog.writeBatch(
      Seq((6L, "f")).toDF("id", "v").coalesce(1), table).contains(2L))
    val adds = addActions(table)
    // commit 0 predates the feature: no baseRowId; commits 1-2 carry it
    assert(!adds.head.has("baseRowId"))
    val tracked = adds.filter(_.has("baseRowId"))
    assert(tracked.size == 2, adds.mkString("\n"))
    assert(tracked(0).get("baseRowId").asLong() == 0L)
    assert(tracked(0).get("defaultRowCommitVersion").asLong() == 1L)
    assert(tracked(1).get("baseRowId").asLong() == 2L) // past 2 rows
    assert(tracked(1).get("defaultRowCommitVersion").asLong() == 2L)
    val s = DeltaLog.snapshot(spark, table).get
    assert(s.rowIdHighWaterMark == 2L)
    assert(s.domainMetadata.contains("delta.rowTracking"))
    // values read back whole
    assert(DeltaLog.read(spark, table).count() == 6)
  }

  test("the watermark and baseRowIds survive a CHECKPOINT cold replay; appends continue the sequence") {
    import spark.implicits._
    val table = tmp()
    assert(DeltaLog.writeBatch(
      Seq((1L, "a")).toDF("id", "v").coalesce(1), table).contains(0L))
    armRowTracking(table)
    (0 until 3).foreach { i =>
      assert(DeltaLog.writeBatch(
        Seq((10L + i, s"x$i")).toDF("id", "v").coalesce(1), table).isDefined)
    }
    DeltaLog.writeCheckpoint(spark, table, 3L)
    // age out the JSON tail the checkpoint covers, force cold replay
    val dir = Paths.get(table, "_delta_log")
    (0L to 3L).foreach(v =>
      Files.deleteIfExists(dir.resolve(f"$v%020d.json")))
    DeltaLog.clearSnapshotCache()
    val s = DeltaLog.snapshot(spark, table).get
    assert(s.rowIdHighWaterMark == 2L, s.domainMetadata)
    assert(s.adds.flatMap(_._2.baseRowId).sorted == Seq(0L, 1L, 2L))
    // the next append continues PAST the replayed watermark — a lost
    // watermark would re-mint id 0 and collide
    assert(DeltaLog.writeBatch(
      Seq((99L, "z")).toDF("id", "v").coalesce(1), table).isDefined)
    val s2 = DeltaLog.snapshot(spark, table).get
    assert(s2.rowIdHighWaterMark == 3L)
    assert(s2.adds.flatMap(_._2.baseRowId).sorted == Seq(0L, 1L, 2L, 3L))
  }

  test("readWithRowIds: base+position ids, DV survivors keep them, materialized columns override") {
    import spark.implicits._
    val table = tmp()
    assert(DeltaLog.writeBatch(
      Seq((100L, "pre")).toDF("id", "v").coalesce(1), table).contains(0L))
    armRowTracking(table)
    assert(DeltaLog.writeBatch(
      Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("id", "v").coalesce(1), table)
      .isDefined)
    def ids(): Map[Long, Option[Long]] =
      DeltaLog.readWithRowIds(spark, table).collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val l1 = ids()
    assert(l1(100L).isEmpty, l1) // pre-feature file: untracked
    assert(l1(0L).contains(0L) && l1(1L).contains(1L) && l1(2L).contains(2L), l1)
    // DV retraction: survivors keep their positions, hence their ids
    DeltaLog.setTableProperties(spark, table,
      Map("delta.enableDeletionVectors" -> "true"))
    assert(DeltaLog.deleteWhere(spark, table, "id = 1").isDefined)
    val l2 = ids()
    assert(!l2.contains(1L) && l2(0L).contains(0L) && l2(2L).contains(2L), l2)
    // a MATERIALIZED row-id column (the preserved-id shape a delta-spark
    // UPDATE leaves behind) overrides base+position where present
    val matTable = tmp()
    assert(DeltaLog.writeBatch(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), matTable)
      .contains(0L))
    armRowTracking(matTable)
    val v0 = Paths.get(matTable, "_delta_log", f"${0L}%020d.json")
    val rewritten = Files.readAllLines(v0).asScala.map { l =>
      if (!l.contains("metaData")) l
      else {
        val n = mapper.readTree(l)
        val cfg = n.get("metaData").get("configuration")
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        cfg.put("delta.rowTracking.materializedRowIdColumnName",
          "_row_id_col_x")
        n.toString
      }
    }
    Files.write(v0, rewritten.mkString("", "\n", "\n").getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    // one appended file CARRIES the materialized column (ids 500, 501);
    // the plain append's file lacks it and falls back to base+position
    assert(DeltaLog.writeBatch(
      Seq((3L, "c")).toDF("id", "v").coalesce(1), matTable).isDefined)
    val s = DeltaLog.snapshot(spark, matTable).get
    val fileDf = Seq((4L, "d", 500L), (5L, "e", 501L))
      .toDF("id", "v", "_row_id_col_x").coalesce(1)
    val scratch = Files.createTempDirectory("rowid-mat")
    fileDf.write.mode("overwrite").parquet(scratch.toString)
    val part = Files.list(scratch).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val dest = Paths.get(matTable, "part-materialized.parquet")
    Files.move(part, dest)
    val hwm = s.rowIdHighWaterMark
    Files.write(Paths.get(matTable, "_delta_log", f"${s.version + 1}%020d.json"),
      (s"""{"add":{"path":"part-materialized.parquet","partitionValues":{},""" +
        s""""size":${Files.size(dest)},"modificationTime":0,"dataChange":true,""" +
        s""""baseRowId":${hwm + 1},"defaultRowCommitVersion":${s.version + 1},""" +
        s""""stats":"{\\"numRecords\\":2}"}}""" + "\n" +
        s"""{"domainMetadata":{"domain":"delta.rowTracking","configuration":""" +
        s""""{\\"rowIdHighWaterMark\\":${hwm + 2}}","removed":false}}""" + "\n")
        .getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    val got = DeltaLog.readWithRowIds(spark, matTable).collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got(4L) == 500L && got(5L) == 501L, got) // materialized wins
    assert(got(3L) == 0L, got) // column-less file: base+position
    assert(got(1L) == -1L && got(2L) == -1L, got) // pre-feature: null
  }

  test("merge-on-read UPDATE preserves ids: DV retracts, the postimage carries the identity") {
    import spark.implicits._
    val table = tmp()
    assert(DeltaLog.writeBatch(
      Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("id", "v").coalesce(1), table)
      .contains(0L))
    armRowTracking(table)
    assert(DeltaLog.writeBatch(
      Seq((3L, "d"), (4L, "e")).toDF("id", "v").coalesce(1), table).isDefined)
    DeltaLog.setTableProperties(spark, table,
      Map("delta.enableDeletionVectors" -> "true"))
    def ids(): Map[Long, (Option[Long], Option[Long])] =
      DeltaLog.readWithRowIds(spark, table).collect().map(r =>
        r.getLong(0) -> ((if (r.isNullAt(2)) None else Some(r.getLong(2))),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val before = ids()
    assert(before(3L)._1.contains(0L) && before(4L)._1.contains(1L), before)
    assert(DeltaLog.updateWhere(spark, table,
      Seq("v" -> "'m'"), Some("id = 3")).isDefined)
    val s = DeltaLog.snapshot(spark, table).get
    val after = ids()
    assert(after(3L)._1 == before(3L)._1, s"$before -> $after") // id kept
    assert(after(3L)._2.contains(s.version), after) // version bumped
    assert(after(4L) == before(4L), after) // DV survivor untouched
    assert(after(0L)._1.isEmpty, after) // pre-feature rows stay untracked
    assert(DeltaLog.read(spark, table)
      .filter(col("id") === 3L).head().getString(1) == "m")
  }

  test("rowTracking composes with COLUMN MAPPING (r17): arm → append → CoW DML → OPTIMIZE keep ids; file bytes stay physical") {
    import spark.implicits._
    val table = tmp()
    // name-mode mapped CREATE (this writer mints the mapping)
    assert(DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v").coalesce(1),
      table, tableConf = Map("delta.columnMapping.mode" -> "name"))
      .contains(0L))
    // arm rowTracking the third-party way, KEEPING the mapping features:
    // protocol 3/7, columnMapping in both feature lists
    val v0 = Paths.get(table, "_delta_log", f"${0L}%020d.json")
    val out = new java.lang.StringBuilder
    Files.readAllLines(v0).forEach { line =>
      if (line.nonEmpty) {
        val n = mapper.readTree(line)
        if (n.has("protocol")) {
          val p = n.get("protocol")
            .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          p.put("minReaderVersion", 3)
          p.put("minWriterVersion", 7)
          val rf = p.putArray("readerFeatures")
          rf.add("columnMapping")
          val wf = p.putArray("writerFeatures")
          Seq("columnMapping", "rowTracking", "domainMetadata").foreach(wf.add)
        }
        if (n.has("metaData")) {
          val cfg = n.get("metaData").get("configuration")
            .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          cfg.put("delta.enableRowTracking", "true")
          ()
        }
        out.append(n.toString).append('\n')
        ()
      }
    }
    Files.write(v0, out.toString.getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    // appends assign fresh ids (physical-shape files, phys-keyed stats)
    assert(DeltaLog.writeBatch(
      Seq((2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1), table).isDefined)
    def ids(): Map[Long, (Option[Long], Option[Long])] =
      DeltaLog.readWithRowIds(spark, table).collect().map(r =>
        r.getLong(0) -> ((if (r.isNullAt(2)) None else Some(r.getLong(2))),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val before = ids()
    assert(before(1L)._1.isEmpty, before) // pre-feature: untracked
    assert(before(2L)._1.contains(0L) && before(3L)._1.contains(1L), before)
    // CoW UPDATE mints the materialized PHYSICAL column names and
    // preserves the matched row's identity through the rewrite
    assert(DeltaLog.updateWhere(spark, table,
      Seq("v" -> "'m'"), Some("id = 2")).isDefined)
    val s = DeltaLog.snapshot(spark, table).get
    assert(s.configuration.contains(
      "delta.rowTracking.materializedRowIdColumnName"))
    val matId = s.configuration("delta.rowTracking.materializedRowIdColumnName")
    val matVer = s.configuration(
      "delta.rowTracking.materializedRowCommitVersionColumnName")
    val after = ids()
    assert(after(2L)._1 == before(2L)._1, s"$before -> $after")
    assert(after(2L)._2.contains(s.version), after)
    assert(after(3L) == before(3L), after)
    // the rewritten file's BYTES are physical: every parquet column is a
    // mapped physicalName or a materialized id column — no logical name
    val conf = spark.sessionState.newHadoopConf()
    // the UPDATE's replacement file is the add claiming THIS commit
    val newest = s.adds.toSeq
      .find(_._2.defaultRowCommitVersion.contains(s.version))
      .getOrElse(fail(s"no add at version ${s.version}: ${s.adds}"))._1
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(
          Paths.get(table, newest).toAbsolutePath.toString), conf))
    val footerCols = try {
      val g = rd.getFooter.getFileMetaData.getSchema
      (0 until g.getFieldCount).map(g.getFieldName)
    } finally rd.close()
    assert(footerCols.forall(c =>
      c.startsWith("col-") || c == matId || c == matVer),
      s"logical name leaked into mapped bytes: $footerCols")
    assert(footerCols.contains(matId) && footerCols.contains(matVer),
      footerCols.mkString(","))
    // logical predicates still prune/read through phys-keyed stats
    assert(DeltaLog.read(spark, table, scanFilter = Some("id = 2"))
      .head().getString(1) == "m")
    // CoW DELETE keeps tracked survivors; OPTIMIZE preserves everything
    assert(DeltaLog.deleteWhere(spark, table, "id = 1").isDefined)
    val afterDel = ids()
    assert(!afterDel.contains(1L) && afterDel(2L) == after(2L), afterDel)
    // a second live file so the compaction has victims to merge
    assert(DeltaLog.writeBatch(
      Seq((5L, "x")).toDF("id", "v").coalesce(1), table).isDefined)
    val beforeOpt = ids()
    assert(beforeOpt(5L)._1.isDefined, beforeOpt)
    assert(DeltaLog.optimize(spark, table,
      smallFileBytes = Long.MaxValue).isDefined)
    assert(ids() == beforeOpt, s"$beforeOpt -> ${ids()}")
    assert(DeltaLog.read(spark, table).count() == 3)
    // MERGE composes too: the matched row keeps its id and bumps to the
    // merge's version; the insert mints a fresh id past the watermark
    val src = Seq((2L, "mm"), (7L, "new")).toDF("id", "v")
    assert(DeltaLog.merge(spark, table, src,
      graft.sinks.Merge.Clauses("t", "s", "t.id = s.id",
        Seq(graft.sinks.Merge.MatchedClause(None, Left(Seq("v" -> "s.v")))),
        Some((None, Seq.empty)))).isDefined)
    val sM = DeltaLog.snapshot(spark, table).get
    val afterMerge = ids()
    assert(afterMerge(2L)._1 == before(2L)._1, s"$before -> $afterMerge")
    assert(afterMerge(2L)._2.contains(sM.version), afterMerge)
    assert(afterMerge(7L)._1.isDefined, afterMerge)
    assert(afterMerge(3L) == beforeOpt(3L), afterMerge)
    assert(DeltaLog.read(spark, table).filter(col("id") === 2L)
      .head().getString(1) == "mm")
  }

  test("row-rewriting operations refuse loudly; foreign domain metadata carries through commits and checkpoints") {
    import spark.implicits._
    val table = tmp()
    assert(DeltaLog.writeBatch(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), table)
      .contains(0L))
    armRowTracking(table)
    // plant a FOREIGN domain the way a third-party writer would
    val dir = Paths.get(table, "_delta_log")
    Files.write(dir.resolve(f"${1L}%020d.json"),
      ("""{"domainMetadata":{"domain":"acme.custom","configuration":"{\"k\":1}","removed":false}}""" + "\n")
        .getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    assert(DeltaLog.writeBatch(
      Seq((3L, "c")).toDF("id", "v").coalesce(1), table).isDefined)
    val s = DeltaLog.snapshot(spark, table).get
    assert(s.domainMetadata.get("acme.custom").contains("""{"k":1}"""))
    // checkpoint → cold replay keeps BOTH domains
    DeltaLog.writeCheckpoint(spark, table, s.version)
    (0L to s.version).foreach(v =>
      Files.deleteIfExists(dir.resolve(f"$v%020d.json")))
    DeltaLog.clearSnapshotCache()
    val s2 = DeltaLog.snapshot(spark, table).get
    assert(s2.domainMetadata.get("acme.custom").contains("""{"k":1}"""))
    assert(s2.domainMetadata.contains("delta.rowTracking"))
    // copy-on-write DML PRESERVES ids through materialized columns
    // (r16): the first DML MINTS the column names into the config, the
    // rewrite lands _row_id/_row_commit_version physically, and the
    // read-side coalesce keeps every surviving row's identity
    def ids(): Map[Long, (Option[Long], Option[Long])] =
      DeltaLog.readWithRowIds(spark, table).collect().map(r =>
        r.getLong(0) -> ((if (r.isNullAt(2)) None else Some(r.getLong(2))),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val before = ids()
    assert(DeltaLog.updateWhere(spark, table,
      Seq("v" -> "'z'"), Some("id = 3")).isDefined)
    val s3 = DeltaLog.snapshot(spark, table).get
    assert(s3.configuration.contains(
      "delta.rowTracking.materializedRowIdColumnName"))
    val afterUpd = ids()
    // the updated row keeps its id, bumps its commit version; carried
    // rows in the same rewritten file keep BOTH
    assert(afterUpd(3L)._1 == before(3L)._1, s"$before -> $afterUpd")
    assert(afterUpd(3L)._2.contains(s3.version), afterUpd)
    assert(afterUpd(1L) == before(1L) && afterUpd(2L) == before(2L), afterUpd)
    // a CoW DELETE keeps TRACKED survivors' identity; the pre-feature
    // survivor (untracked null id) gets LAZILY ASSIGNED on its first
    // rewrite — null materialized values inherit the new add's
    // base+position, the protocol's fresh-row rule
    assert(DeltaLog.deleteWhere(spark, table, "id = 1").isDefined)
    val afterDel = ids()
    assert(!afterDel.contains(1L), afterDel)
    assert(afterDel(3L) == afterUpd(3L), afterDel) // tracked: untouched
    assert(afterDel(2L)._1.isDefined &&
      afterDel(2L)._2.contains(s3.version + 1), afterDel)
    // OPTIMIZE preserves too (r16): the compaction materializes every
    // victim row's id — identities survive the rewrite byte-identically
    val beforeOpt = ids()
    assert(DeltaLog.optimize(spark, table,
      smallFileBytes = Long.MaxValue).isDefined)
    assert(ids() == beforeOpt, s"$beforeOpt -> ${ids()}")
    // the table stays readable throughout
    assert(DeltaLog.read(spark, table).count() == 2)
  }
}
