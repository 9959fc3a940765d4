package graft

import graft.sinks.DeltaLog
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The wire-format Delta log: every structural claim of the public
  * protocol (delta.io PROTOCOL.md) this writer makes is asserted against
  * the actual bytes on disk — commit-0 protocol/metaData actions, add
  * actions with relative URL-encoded paths + size + mtime + dataChange,
  * NDJSON framing, %020d version names — plus the ACID behaviors
  * (idempotent txn replay, orphan invisibility, optimistic version
  * races) proven end-to-end through [[DeltaLog.read]].
  */
class DeltaLogSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def tmpTable(): String =
    Files.createTempDirectory("delta_table").toString

  private def logLines(table: String, version: Long): Seq[com.fasterxml.jackson.databind.JsonNode] =
    Files.readAllLines(Paths.get(table, "_delta_log", f"$version%020d.json"))
      .asScala.filter(_.nonEmpty).map(mapper.readTree).toSeq

  test("commit 0 carries protocol + metaData per PROTOCOL.md; adds are complete") {
    import spark.implicits._
    val table = tmpTable()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    assert(DeltaLog.writeBatch(df, table).contains(0L))
    val lines = logLines(table, 0L)
    // exactly one protocol action, versions a v1 reader accepts
    val protocol = lines.filter(_.has("protocol"))
    assert(protocol.size == 1)
    assert(protocol.head.get("protocol").get("minReaderVersion").asInt == 1)
    assert(protocol.head.get("protocol").get("minWriterVersion").asInt == 2)
    // exactly one metaData action: id, parquet format, Spark-JSON schema,
    // partitionColumns, configuration
    val md = lines.filter(_.has("metaData"))
    assert(md.size == 1)
    val m = md.head.get("metaData")
    assert(m.get("format").get("provider").asText == "parquet")
    assert(m.get("id").asText.nonEmpty)
    assert(m.get("partitionColumns").isArray && m.get("configuration").isObject)
    val schema = org.apache.spark.sql.types.DataType.fromJson(
      m.get("schemaString").asText).asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(schema.fieldNames.toSeq == Seq("id", "v"))
    // every add: RELATIVE path that exists, positive size, mtime, dataChange
    val adds = lines.filter(_.has("add")).map(_.get("add"))
    assert(adds.nonEmpty)
    adds.foreach { a =>
      val rel = java.net.URLDecoder.decode(a.get("path").asText, "UTF-8")
      assert(!rel.startsWith("/") && Files.exists(Paths.get(table, rel)), rel)
      assert(a.get("size").asLong > 0 && a.get("modificationTime").asLong > 0)
      assert(a.get("dataChange").asBoolean)
    }
    // the table reads back exactly
    assert(DeltaLog.read(spark, table).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("appends land as new versions; a replayed (appId, version) txn is a no-op") {
    import spark.implicits._
    val table = tmpTable()
    assert(DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), table,
      txn = Some(("q", 0L))).contains(0L))
    // crash-after-commit replay of the SAME micro-batch: nothing written
    assert(DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), table,
      txn = Some(("q", 0L))).isEmpty)
    assert(DeltaLog.writeBatch(Seq((2L, "b")).toDF("id", "v"), table,
      txn = Some(("q", 1L))).contains(1L))
    assert(DeltaLog.read(spark, table).count() == 2)
    // the txn actions are in the log with the right shape
    val txns = logLines(table, 1L).filter(_.has("txn")).map(_.get("txn"))
    assert(txns.size == 1 && txns.head.get("appId").asText == "q" &&
      txns.head.get("version").asLong == 1L)
    // later commits do NOT repeat protocol/metaData (schema unchanged)
    assert(logLines(table, 1L).forall(l => !l.has("protocol") && !l.has("metaData")))
  }

  test("uncommitted data files are invisible (crash mid-write isolation)") {
    import spark.implicits._
    val table = tmpTable()
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), table)
    // a writer that crashed after writing parquet, before the log commit
    Seq((99L, "ghost")).toDF("id", "v").write.mode("append")
      .parquet(Paths.get(table, ".crashed-writer").toString)
    Files.write(Paths.get(table, "part-orphan-not-in-log.snappy.parquet"),
      Array[Byte](80, 65, 82, 49)) // stray bytes; never referenced by an add
    assert(DeltaLog.read(spark, table).as[(Long, String)].collect().toSet ==
      Set((1L, "a")))
  }

  test("concurrent commits resolve by optimistic version retry, no loss") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val table = tmpTable()
    val fs = (0 until 6).map(i => Future {
      DeltaLog.writeBatch(Seq((i.toLong, s"v$i")).toDF("id", "v"), table)
    })
    val versions = Await.result(Future.sequence(fs), 120.seconds).flatten
    assert(versions.sorted == (0L until 6L))
    assert(DeltaLog.read(spark, table).count() == 6)
  }

  test("concurrent replay of the SAME (appId, version): exactly one commit, no stray files") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val table = tmpTable()
    // the crash-recovery race: several workers replay one micro-batch
    val fs = (0 until 4).map(_ => Future {
      DeltaLog.writeBatch(Seq((1L, "x")).toDF("id", "v"), table, txn = Some(("q", 0L)))
    })
    val results = Await.result(Future.sequence(fs), 120.seconds)
    assert(results.flatten == Seq(0L), s"exactly one commit: $results")
    assert(DeltaLog.read(spark, table).count() == 1)
    // losers cleaned their orphaned parts: every on-disk parquet is
    // add-listed
    val active = DeltaLog.snapshot(spark, table).get.files.toSet
    val onDisk = Files.walk(Paths.get(table)).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet") &&
        !p.toString.contains("_delta_log"))
      .map(p => Paths.get(table).relativize(p).toString).toSet
    assert(onDisk == active, s"stray files: ${onDisk.diff(active)}")
  }

  test("partitioned table: hive paths, partitionValues in adds, prunable reads") {
    import spark.implicits._
    val table = tmpTable()
    val df = Seq((1L, "web", "a"), (2L, "web", "b"), (3L, "books", "c"))
      .toDF("id", "src", "v")
    assert(DeltaLog.writeBatch(df, table, partitionBy = Seq("src")).contains(0L))
    // metaData declares the partitioning; adds carry per-file values and
    // hive-style relative paths
    val lines = logLines(table, 0L)
    val m = lines.find(_.has("metaData")).get.get("metaData")
    assert((0 until m.get("partitionColumns").size())
      .map(m.get("partitionColumns").get(_).asText) == Seq("src"))
    val adds = lines.filter(_.has("add")).map(_.get("add"))
    assert(adds.nonEmpty)
    adds.foreach { a =>
      // canonical minimal encoding: the hive '=' stays LITERAL in the
      // logged path (delta-spark/delta-rs emit it unescaped)
      assert(a.get("path").asText.startsWith("src="), a.get("path").asText)
      val rel = java.net.URLDecoder.decode(a.get("path").asText, "UTF-8")
      assert(rel.startsWith("src="), rel)
      val pv = a.get("partitionValues")
      assert(Set("web", "books")(pv.get("src").asText), pv)
      assert(rel.startsWith(s"src=${pv.get("src").asText}/"), s"$rel vs $pv")
    }
    // full read-back includes the partition column
    assert(DeltaLog.read(spark, table).as[(Long, String, String)].collect().toSet ==
      Set((1L, "web", "a"), (2L, "web", "b"), (3L, "books", "c")))
    // a partition predicate prunes at the scan (PartitionFilters), like a
    // native Delta table
    val pruned = DeltaLog.read(spark, table).filter(col("src") === "web")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("src"),
      s"partition predicate must reach the scan:\n$plan")
    assert(pruned.count() == 2)
  }

  test("parquet checkpoints: written every interval, readable after the JSON tail is aged out") {
    import spark.implicits._
    val table = tmpTable()
    // 12 commits at interval 5 → checkpoints at versions 4 and 9
    (0 until 12).foreach { i =>
      assert(DeltaLog.writeBatch(Seq((i.toLong, s"v$i")).toDF("id", "v"), table,
        txn = Some(("cpq", i.toLong)), checkpointInterval = 5).contains(i.toLong))
    }
    val logd = Paths.get(table, "_delta_log")
    for (v <- Seq(4L, 9L))
      assert(Files.exists(logd.resolve(f"$v%020d.checkpoint.parquet")), s"checkpoint $v")
    // _last_checkpoint points at the newest one
    val lc = mapper.readTree(Files.readAllBytes(logd.resolve("_last_checkpoint")))
    assert(lc.get("version").asLong == 9L && lc.get("size").asLong > 0)
    // checkpoint rows: exactly one non-null action column per row; state complete
    val cp = spark.read.parquet(logd.resolve(f"${9L}%020d.checkpoint.parquet").toString)
    assert(cp.columns.toSeq == Seq("txn", "add", "remove", "metaData", "protocol"))
    cp.collect().foreach { r =>
      assert((0 until r.length).count(!r.isNullAt(_)) == 1, r)
    }
    // the log-compaction contract: JSON commits AT OR BEFORE the
    // checkpoint can be aged out; the reader recovers full state from the
    // checkpoint + the JSON tail
    (0L to 9L).foreach(v => Files.delete(logd.resolve(f"$v%020d.json")))
    val out = DeltaLog.read(spark, table).as[(Long, String)].collect().toSet
    assert(out == (0 until 12).map(i => (i.toLong, s"v$i")).toSet)
    val snap = DeltaLog.snapshot(spark, table).get
    assert(snap.version == 11L && snap.appVersions("cpq") == 11L)
    // the replay guard still works from checkpointed txn state
    assert(DeltaLog.writeBatch(Seq((99L, "dup")).toDF("id", "v"), table,
      txn = Some(("cpq", 5L))).isEmpty)
  }

  test("OPTIMIZE bin-packs small files with dataChange=false; VACUUM reclaims tombstones") {
    import spark.implicits._
    val table = tmpTable()
    // four micro-batch-sized commits → four small files
    (0 until 4).foreach { i =>
      DeltaLog.writeBatch(Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1), table)
    }
    val before = DeltaLog.snapshot(spark, table).get
    assert(before.files.size == 4)
    val v = DeltaLog.optimize(spark, table)
    assert(v.contains(4L), v)
    // the swap is one commit: removes for every old file, adds for the
    // compacted one(s), BOTH with dataChange=false (streaming readers
    // must see no logical change)
    val lines = logLines(table, 4L)
    val removes = lines.filter(_.has("remove")).map(_.get("remove"))
    val adds = lines.filter(_.has("add")).map(_.get("add"))
    assert(removes.map(r => java.net.URLDecoder.decode(r.get("path").asText, "UTF-8"))
      .toSet == before.files.toSet)
    assert(removes.forall(!_.get("dataChange").asBoolean))
    assert(adds.nonEmpty && adds.size < 4 && adds.forall(!_.get("dataChange").asBoolean))
    assert(lines.find(_.has("commitInfo")).get
      .get("commitInfo").get("operation").asText == "OPTIMIZE")
    // rows identical; active file count dropped
    assert(DeltaLog.read(spark, table).as[(Long, String)].collect().toSet ==
      (0 until 4).map(i => (i.toLong, s"v$i")).toSet)
    assert(DeltaLog.snapshot(spark, table).get.files.size == adds.size)
    // tombstoned files are still ON DISK (a concurrent reader may hold
    // the old snapshot) until VACUUM's retention passes
    before.files.foreach(f => assert(Files.exists(Paths.get(table, f)), f))
    assert(DeltaLog.vacuum(spark, table) == 0) // default 7-day retention: nothing yet
    val reclaimed = DeltaLog.vacuum(spark, table, retentionMs = -1000)
    assert(reclaimed == 4, s"reclaimed $reclaimed")
    before.files.foreach(f => assert(!Files.exists(Paths.get(table, f)), f))
    // the table still reads exactly after the vacuum
    assert(DeltaLog.read(spark, table).count() == 4)
    // nothing left to compact → None
    assert(DeltaLog.optimize(spark, table).isEmpty ||
      DeltaLog.snapshot(spark, table).get.files.size == 1)
  }

  test("time travel: VERSION AS OF reads historical snapshots, incl. pre-OPTIMIZE") {
    import spark.implicits._
    val table = tmpTable()
    (0 until 3).foreach { i =>
      DeltaLog.writeBatch(Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1), table)
    }
    // each historical version shows exactly its prefix of the appends
    for (v <- 0 until 3)
      assert(DeltaLog.read(spark, table, asOf = Some(v.toLong))
        .as[(Long, String)].collect().toSet ==
        (0 to v).map(i => (i.toLong, s"v$i")).toSet, s"as of $v")
    // OPTIMIZE rewrites files but old versions still read from tombstones
    DeltaLog.optimize(spark, table)
    assert(DeltaLog.read(spark, table, asOf = Some(1L))
      .as[(Long, String)].collect().toSet == Set((0L, "v0"), (1L, "v1")))
    // the SQL source face: version_as_of option
    val back = new sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE tbl (id BIGINT, v TEXT) WITH (
         |  connector='delta', path='$table', format='parquet', type='source',
         |  version_as_of='0');
         |SELECT count(*) AS n FROM tbl;""".stripMargin)
    assert(back.get.collect()(0).getLong(0) == 1)
    // a version that never existed fails loudly
    intercept[IllegalArgumentException] {
      DeltaLog.read(spark, table, asOf = Some(99L))
    }
  }

  test("checkpoint written AFTER a concurrent commit stays pinned to its named version") {
    import spark.implicits._
    val table = tmpTable()
    // three commits, no auto-checkpoint
    (0 until 3).foreach { i =>
      DeltaLog.writeBatch(Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1),
        table, checkpointInterval = 0)
    }
    // the race: the checkpoint for version 1 runs only after version 2
    // landed (writeBatch commits, ANOTHER writer commits, then the first
    // writer's checkpoint executes). It must embed version 1's state, not
    // the latest.
    DeltaLog.writeCheckpoint(spark, table, 1L)
    val cp = spark.read.parquet(
      Paths.get(table, "_delta_log", f"${1L}%020d.checkpoint.parquet").toString)
    val addPaths = cp.filter(col("add").isNotNull).select("add.path").as[String]
      .collect().map(p => java.net.URLDecoder.decode(p, "UTF-8")).toSet
    val v1Files = DeltaLog.snapshot(spark, table, asOf = Some(1L)).get.files.toSet
    assert(addPaths == v1Files, s"checkpoint 1 embeds future adds: ${addPaths.diff(v1Files)}")
    // time travel THROUGH the checkpoint: age out the covered JSON tail
    // and verify VERSION AS OF 1 still excludes version 2's row
    (0L to 1L).foreach(v => Files.delete(Paths.get(table, "_delta_log", f"$v%020d.json")))
    DeltaLog.clearSnapshotCache()
    assert(DeltaLog.read(spark, table, asOf = Some(1L))
      .as[(Long, String)].collect().toSet == Set((0L, "v0"), (1L, "v1")))
    assert(DeltaLog.read(spark, table).count() == 3)
  }

  test("concurrent OPTIMIZE: the loser's stale remove-commit aborts (ConcurrentDeleteRead)") {
    import spark.implicits._
    val table = tmpTable()
    (0 until 4).foreach { i =>
      DeltaLog.writeBatch(Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1), table)
    }
    val stale = DeltaLog.snapshot(spark, table).get // both optimizers read this
    assert(DeltaLog.optimize(spark, table).isDefined) // winner compacts + removes
    // the loser read `stale`, wrote its own compacted file, and now tries
    // to commit remove actions for files the winner already removed
    val loser = DeltaLog.commit(spark, table, stale.schema, stale.partitionColumns,
      added = Seq(("part-loser.snappy.parquet",
        DeltaLog.AddInfo(100L, System.currentTimeMillis(), Seq.empty))),
      txn = None, removed = stale.files, dataChange = false)
    assert(loser.isEmpty, "stale OPTIMIZE commit must abort, not duplicate rows")
    // table unchanged: same rows, loser's file never became active
    assert(DeltaLog.read(spark, table).as[(Long, String)].collect().toSet ==
      (0 until 4).map(i => (i.toLong, s"v$i")).toSet)
    assert(!DeltaLog.snapshot(spark, table).get.files.contains("part-loser.snappy.parquet"))
  }

  test("incremental snapshot (warm cache) is identical to a cold full replay") {
    import spark.implicits._
    val table = tmpTable()
    (0 until 8).foreach { i =>
      DeltaLog.writeBatch(Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1), table,
        txn = Some(("inc", i.toLong)), checkpointInterval = 3)
    }
    val warm = DeltaLog.snapshot(spark, table).get // built incrementally across commits
    DeltaLog.clearSnapshotCache()
    val cold = DeltaLog.snapshot(spark, table).get // full checkpoint + tail replay
    assert(warm.version == cold.version && warm.version == 7L)
    assert(warm.adds.toMap == cold.adds.toMap)
    assert(warm.appVersions == cold.appVersions && warm.appVersions("inc") == 7L)
    assert(warm.schema == cold.schema && warm.partitionColumns == cold.partitionColumns)
    // OPTIMIZE's removes flow through the incremental path too
    DeltaLog.optimize(spark, table)
    val warm2 = DeltaLog.snapshot(spark, table).get
    DeltaLog.clearSnapshotCache()
    val cold2 = DeltaLog.snapshot(spark, table).get
    assert(warm2.adds.toMap == cold2.adds.toMap && warm2.version == cold2.version)
    assert(DeltaLog.read(spark, table).count() == 8)
  }

  test("empty-batch commit keeps the schema readable; snapshot tracks the last version") {
    import spark.implicits._
    val table = tmpTable()
    DeltaLog.writeBatch(Seq.empty[(Long, String)].toDF("id", "v"), table)
    val out = DeltaLog.read(spark, table)
    assert(out.count() == 0 && out.schema.fieldNames.toSeq == Seq("id", "v"))
    DeltaLog.writeBatch(Seq((7L, "x")).toDF("id", "v"), table)
    assert(DeltaLog.snapshot(spark, table).get.version == 1L)
    assert(DeltaLog.read(spark, table).count() == 1)
  }

  test("snapshot cache never leaks across a table recreated at the same path (r10)") {
    import spark.implicits._
    val table = tmpTable()
    (1 to 3).foreach { i =>
      DeltaLog.writeBatch(Seq((i.toLong, s"a$i")).toDF("id", "v").coalesce(1), table)
    }
    assert(DeltaLog.read(spark, table).count() == 3) // cache warm at v2
    // delete + recreate at the SAME path, growing past the cached version
    Files.walk(Paths.get(table)).iterator().asScala.toSeq.reverse
      .foreach(Files.deleteIfExists(_))
    (1 to 4).foreach { i =>
      DeltaLog.writeBatch(Seq((i * 100L, s"b$i")).toDF("id", "v").coalesce(1), table)
    }
    // the new log's tail IS dense past the cached version (v3 > cached
    // v2) — only the backing-file identity check forces the cold replay
    assert(DeltaLog.snapshot(spark, table).get.version == 3L)
    assert(DeltaLog.read(spark, table).as[(Long, String)].collect().toSet ==
      (1 to 4).map(i => (i * 100L, s"b$i")).toSet,
      "stale adds from the dead incarnation must not survive")
  }

  test("reader-changing protocol features are rejected loudly (r10)") {
    import spark.implicits._
    val table = tmpTable()
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), table)
    assert(DeltaLog.read(spark, table).count() == 1)
    // a third-party writer upgrades the table to a reader feature this
    // engine doesn't implement (type widening here — deletion vectors,
    // column mapping, and v2 checkpoints ARE implemented now): ignoring
    // it could silently misread — refuse instead
    val log = Paths.get(table, "_delta_log")
    Files.write(log.resolve(f"${1L}%020d.json"),
      ("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["typeWidening"],"writerFeatures":["typeWidening"]}}""" +
        "\n").getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    val e = intercept[IllegalArgumentException] { DeltaLog.read(spark, table).count() }
    assert(e.getMessage.contains("typeWidening"), e.getMessage)
    // deletionVectors, in contrast, is an IMPLEMENTED reader feature now
    Files.write(log.resolve(f"${1L}%020d.json"),
      ("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""" +
        "\n").getBytes("UTF-8"), java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    DeltaLog.clearSnapshotCache()
    assert(DeltaLog.read(spark, table).count() == 1)
    // column mapping (minReaderVersion 2) is an IMPLEMENTED protocol
    // since r13 (ColumnMappingSpec); a bare protocol-2 upgrade reads fine
    val t2 = tmpTable()
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), t2)
    Files.write(Paths.get(t2, "_delta_log", f"${1L}%020d.json"),
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""".getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    assert(DeltaLog.read(spark, t2).count() == 1)
    // harmless reader features (timestampNtz) pass
    val t3 = tmpTable()
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), t3)
    Files.write(Paths.get(t3, "_delta_log", f"${1L}%020d.json"),
      ("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["timestampNtz"]}}""").getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    assert(DeltaLog.read(spark, t3).count() == 1)
  }

  test("enabled writer features this engine can't honor refuse commits; vacuous ones pass") {
    import spark.implicits._
    val table = tmpTable()
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), table)
    val log = Paths.get(table, "_delta_log")
    // a third-party upgrade enables a writer feature this engine has no
    // contract for (icebergCompatV2's parquet constraints): every
    // commit refuses, the table stays readable. rowTracking rides along
    // SUPPORTED (r16: appends assign baseRowIds) and must not be named.
    Files.write(log.resolve(f"${1L}%020d.json"),
      ("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],""" +
        """"writerFeatures":["deletionVectors","rowTracking",""" +
        """"icebergCompatV2","invariants"]}}""" +
        "\n").getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    assert(DeltaLog.read(spark, table).count() == 1)
    val e = intercept[IllegalArgumentException] {
      DeltaLog.writeBatch(Seq((2L, "b")).toDF("id", "v"), table)
    }
    assert(e.getMessage.contains("icebergCompatV2"), e.getMessage)
    assert(!e.getMessage.contains("rowTracking"),
      "rowTracking is supported (r16) and must not be in the refusal")
    assert(!e.getMessage.contains("invariants"),
      "invariants is vacuous here (no delta.invariants in the schema)")
    // constraint-class features the table doesn't actually use pass
    Files.write(log.resolve(f"${1L}%020d.json"),
      ("""{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["appendOnly","invariants","checkConstraints",""" +
        """"generatedColumns","changeDataFeed"]}}""" + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    DeltaLog.clearSnapshotCache()
    assert(DeltaLog.writeBatch(Seq((2L, "b")).toDF("id", "v"), table).contains(2L))
    // a NESTED invariant makes the feature non-vacuous: delta allows
    // delta.invariants on struct members, so the probe must recurse —
    // a top-level-only check would commit while silently ignoring it
    val nested = tmpTable()
    DeltaLog.writeBatch(
      Seq((1L, "a")).toDF("id", "v")
        .select($"id", org.apache.spark.sql.functions.struct($"v").as("s")),
      nested)
    val nlog = Paths.get(nested, "_delta_log")
    val v0 = Files.readAllLines(nlog.resolve(f"${0L}%020d.json")).asScala
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rewritten = v0.map { l =>
      if (!l.contains("metaData")) l
      else {
        val n = mapper.readTree(l)
        val md = n.get("metaData").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        val sch = mapper.readTree(md.get("schemaString").asText())
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        val fields = sch.withArray("fields")
        // attach an invariant to s.v — nested one level down
        val sField = (0 until fields.size()).map(fields.get)
          .find(_.get("name").asText() == "s").get
        val inner = sField.get("type").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .withArray("fields").get(0).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        inner.putObject("metadata").put("delta.invariants",
          """{"expression":{"expression":"s.v IS NOT NULL"}}""")
        md.put("schemaString", mapper.writeValueAsString(sch))
        mapper.writeValueAsString(n)
      }
    }
    Files.write(nlog.resolve(f"${0L}%020d.json"),
      rewritten.mkString("", "\n", "\n").getBytes("UTF-8"))
    Files.write(nlog.resolve(f"${1L}%020d.json"),
      ("""{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["invariants"]}}""" + "\n").getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    val e2 = intercept[IllegalArgumentException] {
      DeltaLog.writeBatch(
        Seq((2L, "b")).toDF("id", "v")
          .select($"id", org.apache.spark.sql.functions.struct($"v").as("s")),
        nested)
    }
    assert(e2.getMessage.contains("invariants"), e2.getMessage)
  }

  test("TIMESTAMP AS OF resolves the latest version at-or-before the instant (r10)") {
    import spark.implicits._
    val table = tmpTable()
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v").coalesce(1), table)
    Thread.sleep(20)
    val between = System.currentTimeMillis()
    Thread.sleep(20)
    DeltaLog.writeBatch(Seq((2L, "b")).toDF("id", "v").coalesce(1), table)
    assert(DeltaLog.versionAt(table, between).contains(0L))
    assert(DeltaLog.versionAt(table, System.currentTimeMillis()).contains(1L))
    assert(DeltaLog.versionAt(table, 1000L).isEmpty, "before the first commit")
    // the SQL face: timestamp_as_of on a delta source table
    val got = new sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE tt (id BIGINT, v TEXT) WITH (
         |  connector='delta', path='$table', format='parquet', type='source',
         |  timestamp_as_of='$between');
         |SELECT id, v FROM tt""".stripMargin).get
    assert(got.as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    // exclusive with version_as_of
    intercept[Exception] {
      new sql.Pipeline(spark, streaming = false).run(
        s"""CREATE TABLE tt2 (id BIGINT, v TEXT) WITH (
           |  connector='delta', path='$table', format='parquet', type='source',
           |  timestamp_as_of='$between', version_as_of='1');
           |SELECT id, v FROM tt2""".stripMargin)
    }
  }

  test("inCommitTimestamp (ICT writer feature) is authoritative for TIMESTAMP AS OF") {
    import spark.implicits._
    val table = tmpTable()
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), table)
    DeltaLog.writeBatch(Seq((2L, "b")).toDF("id", "v"), table)
    val log = Paths.get(table, "_delta_log")
    // an ICT writer's shape: commitInfo carries BOTH a (possibly skewed)
    // wall-clock timestamp and the monotonic inCommitTimestamp — the
    // protocol makes the latter authoritative for time travel
    Seq((0L, 1000L, 5000L), (1L, 2000L, 6000L)).foreach { case (v, wall, ict) =>
      val p = log.resolve(f"$v%020d.json")
      val lines = Files.readAllLines(p).asScala.map { l =>
        if (!l.contains("commitInfo")) l
        else l.replaceFirst(""""timestamp":\d+""",
          s""""timestamp":$wall,"inCommitTimestamp":$ict""")
      }
      Files.write(p, lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    }
    // under wall clocks 5500 would be past BOTH commits; under ICT it
    // sits between them — v0 is the correct answer
    assert(DeltaLog.versionAt(table, 5500L).contains(0L))
    assert(DeltaLog.versionAt(table, 4000L).isEmpty)
    assert(DeltaLog.versionAt(table, 6000L).contains(1L))
    // readChanges stamps change rows with the ICT too
    val ts = DeltaLog.readChanges(spark, table, 1L, Some(1L))
      .select(graft.sinks.Cdf.commitTimestampCol)
      .collect().map(_.getTimestamp(0).getTime).distinct
    assert(ts.toSeq == Seq(6000L), s"got ${ts.toSeq}")
    // WRITES: the feature bit ALONE does not arm stamping — per spec
    // ICT is governed by the delta.enableInCommitTimestamps PROPERTY
    // (a table can support the feature with it false). A commit on a
    // feature-only table must neither stamp nor refuse.
    Files.write(log.resolve(f"${2L}%020d.json"),
      ("""{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["inCommitTimestamp"]}}""" + "\n" +
        """{"commitInfo":{"timestamp":3000,"inCommitTimestamp":9000000000000000}}""" +
        "\n").getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    assert(DeltaLog.writeBatch(Seq((3L, "c")).toDF("id", "v"), table).contains(3L))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def commitIct(v: Long): Option[Long] =
      Files.readAllLines(log.resolve(f"$v%020d.json")).asScala
        .map(mapper.readTree).find(_.has("commitInfo"))
        .flatMap(n => Option(n.get("commitInfo").get("inCommitTimestamp"))
          .filterNot(_.isNull).map(_.asLong()))
    assert(commitIct(3L).isEmpty,
      s"feature-only table must not stamp ICT; got ${commitIct(3L)}")
    // once the PROPERTY is set, commits stamp a MONOTONIC
    // inCommitTimestamp: the property-flip commit (v4) stamps first
    // (its parent v3 is unstamped, so wall clock wins), and v5 must
    // land strictly above v4's stamp.
    DeltaLog.setTableProperties(spark, table,
      Map("delta.enableInCommitTimestamps" -> "true"))
    assert(commitIct(4L).isDefined, "property flip commit itself stamps")
    assert(DeltaLog.writeBatch(Seq((4L, "d")).toDF("id", "v"), table).contains(5L))
    val ict5 = commitIct(5L).get
    assert(ict5 > commitIct(4L).get, s"got $ict5 vs parent ${commitIct(4L).get}")
    // the spec's enablement point rides the metaData (readers know where
    // mtime history ends and ICT history begins)
    val cfg = DeltaLog.snapshot(spark, table).get.configuration
    assert(cfg("delta.inCommitTimestampEnablementVersion") == "4")
    assert(cfg("delta.inCommitTimestampEnablementTimestamp") ==
      commitIct(4L).get.toString)
    // arming ICT on a PLAIN (1/2) table upgrades the protocol to the
    // writer-features form, carrying the implied legacy features
    val plain = tmpTable()
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), plain)
    DeltaLog.setTableProperties(spark, plain,
      Map("delta.enableInCommitTimestamps" -> "true"))
    val pj = DeltaLog.snapshot(spark, plain).get.protocolJson.get
    val pn = mapper.readTree(pj)
    assert(pn.get("minWriterVersion").asInt() == 7, pj)
    val wf = (0 until pn.get("writerFeatures").size())
      .map(pn.get("writerFeatures").get(_).asText()).toSet
    assert(wf == Set("appendOnly", "invariants", "inCommitTimestamp"), pj)
    assert(DeltaLog.writeBatch(Seq((2L, "b")).toDF("id", "v"), plain).contains(2L))
    // a protocol rewrite must CARRY the replaced protocol's explicit
    // reader AND writer features (and never downgrade minReaderVersion):
    // a 3/7 timestampNtz table arming ICT keeps timestampNtz bound
    val tz = tmpTable()
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), tz)
    Files.write(Paths.get(tz, "_delta_log", f"${1L}%020d.json"),
      ("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["timestampNtz"],""" +
        """"writerFeatures":["timestampNtz"]}}""" + "\n").getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    DeltaLog.setTableProperties(spark, tz,
      Map("delta.enableInCommitTimestamps" -> "true"))
    val pn2 = mapper.readTree(DeltaLog.snapshot(spark, tz).get.protocolJson.get)
    assert(pn2.get("minReaderVersion").asInt() == 3, pn2.toString)
    val rf2 = (0 until pn2.get("readerFeatures").size())
      .map(pn2.get("readerFeatures").get(_).asText()).toSet
    val wf2 = (0 until pn2.get("writerFeatures").size())
      .map(pn2.get("writerFeatures").get(_).asText()).toSet
    assert(rf2 == Set("timestampNtz"), pn2.toString)
    assert(wf2 == Set("timestampNtz", "inCommitTimestamp"), pn2.toString)
  }

  test("TIMESTAMP AS OF falls back to a clamped linear scan for commits without commitInfo") {
    import spark.implicits._
    val table = tmpTable()
    (0 to 2).foreach(i => DeltaLog.writeBatch(Seq((i.toLong, "x")).toDF("id", "v"), table))
    val log = Paths.get(table, "_delta_log")
    // strip commitInfo (third-party writer shape) and give the files
    // NON-MONOTONE mtimes: v0=5000, v1=1000, v2=6000. The clamped scan
    // sees 5000, 5000, 6000 — at t=2000 no version qualifies. A naive
    // binary search would probe v1 (1000 ≤ 2000) and wrongly answer v1.
    Seq(5000L, 1000L, 6000L).zipWithIndex.foreach { case (mt, v) =>
      val p = log.resolve(f"${v.toLong}%020d.json")
      val kept = Files.readAllLines(p).asScala
        .filter(l => l.nonEmpty && !l.contains("commitInfo"))
      Files.write(p, kept.mkString("", "\n", "\n").getBytes("UTF-8"))
      Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(mt))
    }
    assert(DeltaLog.versionAt(table, 2000L).isEmpty,
      "clamped scan: v0's 5000 dominates — nothing committed at-or-before t=2000")
    assert(DeltaLog.versionAt(table, 5500L).contains(1L),
      "clamped stamps are 5000,5000,6000 — the last ≤5500 is v1")
    assert(DeltaLog.versionAt(table, 7000L).contains(2L))
  }

  test("DML commit racing a concurrent ADD COLUMNS loses cleanly (returns None) instead of throwing") {
    import spark.implicits._
    val table = tmpTable()
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v").coalesce(1), table)
    val stale = DeltaLog.snapshot(spark, table).get // plan-time snapshot
    DeltaLog.addColumns(spark, table, Seq("extra" -> org.apache.spark.sql.types.LongType))
    // a conflict-guarded commit carrying the PLAN-time schema: the
    // evolved table schema is drift, which under a DML commit means a
    // concurrency loss (re-plan), never an IllegalArgumentException
    assert(DeltaLog.commit(spark, table, stale.schema, Seq.empty,
      added = Seq.empty, txn = None, removed = stale.files,
      conflict = Some((stale.files.toSet, None))).isEmpty)
    // and a plain (unguarded) append with the stale schema still fails loudly
    intercept[IllegalArgumentException] {
      DeltaLog.commit(spark, table, stale.schema, Seq.empty,
        added = Seq.empty, txn = None)
    }
    // the schemaBase guard (r14): an evolution commit planned against a
    // schema that moved underneath loses cleanly — what stops two
    // concurrent ADD COLUMNS from clobbering each other (or, on mapped
    // tables, minting the same column id twice)
    assert(DeltaLog.commit(spark, table,
      org.apache.spark.sql.types.StructType(stale.schema.fields :+
        org.apache.spark.sql.types.StructField("mine",
          org.apache.spark.sql.types.LongType)),
      Seq.empty, added = Seq.empty, txn = None, mergeSchema = true,
      schemaBase = Some(stale.schema.json)).isEmpty)
  }

  test("null partition values round-trip as protocol nulls (r10)") {
    import spark.implicits._
    val table = tmpTable()
    DeltaLog.writeBatch(
      Seq((1L, Option(5L), "x"), (2L, Option.empty[Long], "y"))
        .toDF("id", "bucket", "v").repartition(2, col("bucket")),
      table, partitionBy = Seq("bucket"))
    val s = DeltaLog.snapshot(spark, table).get
    val pvs = s.adds.flatMap(_._2.partitionValues).toMap
    assert(pvs.keySet == Set("bucket") &&
      s.adds.exists(_._2.partitionValues.exists(_._2 == null)),
      s"null partition value must be a REAL null in the add action: ${s.adds}")
    // the add-action JSON on disk carries a JSON null (protocol shape)
    val logLines = Files.list(Paths.get(table, "_delta_log")).iterator().asScala
      .filter(_.toString.endsWith(".json"))
      .flatMap(p => Files.readAllLines(p).asScala).toSeq
    assert(logLines.exists(_.contains("\"bucket\":null")), logLines.mkString("\n"))
    // reads re-derive the partition column; null row intact, filters work
    assert(DeltaLog.read(spark, table).filter("bucket IS NULL")
      .select("id").as[Long].collect().toSeq == Seq(2L))
    assert(DeltaLog.read(spark, table).count() == 2)
  }
}
