package graft

import graft.sinks.IcebergLog
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The wire-format Iceberg table metadata (public spec, format-version
  * 2), mirroring DeltaLogSpec: commit-0 metadata shape, fast-append
  * snapshots with sequence numbers, idempotent txn replay, optimistic
  * version races, partitioned tables, snapshot time travel — all
  * asserted against the actual bytes on disk (metadata JSON + avro
  * manifests written by the repo's own Avro codec, no Iceberg jars).
  */
class IcebergLogSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def tmpTable(): String =
    Files.createTempDirectory("iceberg_table").toString

  private def metaJson(table: String, v: Int): com.fasterxml.jackson.databind.JsonNode =
    mapper.readTree(Files.readAllBytes(
      Paths.get(table, "metadata", s"v$v.metadata.json")))

  test("first commit writes spec-shaped v1 metadata: schema ids, partition spec, snapshot, sequence numbers") {
    import spark.implicits._
    val table = tmpTable()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    assert(IcebergLog.writeBatch(df, table).contains(1))
    val m = metaJson(table, 1)
    assert(m.get("format-version").asInt == 2)
    assert(m.get("table-uuid").asText.nonEmpty)
    assert(m.get("last-sequence-number").asLong == 1L)
    // schema: field ids 1..n, current-schema-id 0
    val fields = m.get("schemas").get(0).get("fields")
    assert((0 until fields.size()).map(i => fields.get(i).get("id").asInt) == Seq(1, 2))
    assert((0 until fields.size()).map(i => fields.get(i).get("name").asText) == Seq("id", "v"))
    assert(m.get("current-schema-id").asInt == 0)
    // default spec/sort-order blocks exist (unpartitioned: empty spec)
    assert(m.get("partition-specs").get(0).get("fields").size() == 0)
    assert(m.get("sort-orders").get(0).get("order-id").asInt == 0)
    // exactly one snapshot, sequence-number 1, append summary, manifest list on disk
    val snaps = m.get("snapshots")
    assert(snaps.size() == 1)
    val s0 = snaps.get(0)
    assert(s0.get("sequence-number").asLong == 1L)
    assert(s0.get("snapshot-id").asLong == m.get("current-snapshot-id").asLong)
    assert(s0.get("summary").get("operation").asText == "append")
    assert(Files.exists(Paths.get(s0.get("manifest-list").asText)))
    // version hint points at v1
    assert(new String(Files.readAllBytes(
      Paths.get(table, "metadata", "version-hint.text")), "UTF-8") == "1")
    // manifest avro carries the spec field-ids (500-series list fields,
    // 100-series data_file fields) and the iceberg schema header
    val listBytes = new String(Files.readAllBytes(
      Paths.get(s0.get("manifest-list").asText)), "ISO-8859-1")
    assert(listBytes.contains("\"field-id\":500") && listBytes.contains("\"field-id\":503"))
    val entries = IcebergLog.entries(table)
    assert(entries.nonEmpty && entries.forall(_._1 == 1)) // all ADDED
    val manifestBytes = new String(Files.readAllBytes(
      Paths.get(Paths.get(table, "metadata").toString).toFile.listFiles()
        .find(_.getName.endsWith("-m0.avro")).get.toPath), "ISO-8859-1")
    assert(manifestBytes.contains("\"field-id\":100") &&
      manifestBytes.contains("\"field-id\":134") &&
      manifestBytes.contains("format-version"))
    // record counts ride the manifest (from the parquet footers)
    assert(entries.map(_._3).sum == 3L)
    // the table reads back exactly
    assert(IcebergLog.read(spark, table).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("appends are fast-append snapshots; sequence numbers advance; replayed txn is a no-op") {
    import spark.implicits._
    val table = tmpTable()
    assert(IcebergLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), table,
      txn = Some(("q", 0L))).contains(1))
    // crash-after-commit replay of the SAME micro-batch: nothing written
    assert(IcebergLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), table,
      txn = Some(("q", 0L))).isEmpty)
    assert(IcebergLog.writeBatch(Seq((2L, "b")).toDF("id", "v"), table,
      txn = Some(("q", 1L))).contains(2))
    assert(IcebergLog.read(spark, table).count() == 2)
    val m = metaJson(table, 2)
    // two snapshots, sequence numbers 1 and 2, parent chain intact
    assert(m.get("snapshots").size() == 2)
    assert(m.get("last-sequence-number").asLong == 2L)
    val Seq(s1, s2) = (0 until 2).map(m.get("snapshots").get(_))
    assert(s1.get("sequence-number").asLong == 1L && s2.get("sequence-number").asLong == 2L)
    assert(s2.get("parent-snapshot-id").asLong == s1.get("snapshot-id").asLong)
    // the txn id rides the snapshot summary (reference arroyo.commit-id)
    assert(s2.get("summary").get("graft.txn.app").asText == "q")
    assert(s2.get("summary").get("graft.txn.version").asLong == 1L)
    // fast append: the NEW manifest list carries the old manifest forward
    val entries = IcebergLog.entries(table)
    assert(entries.size == IcebergLog.read(spark, table).count())
  }

  test("uncommitted data files are invisible (crash mid-write isolation)") {
    import spark.implicits._
    val table = tmpTable()
    IcebergLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), table)
    Seq((99L, "ghost")).toDF("id", "v").write.mode("append")
      .parquet(Paths.get(table, "data", ".crashed-writer").toString)
    Files.write(Paths.get(table, "data", "part-orphan.snappy.parquet"),
      Array[Byte](80, 65, 82, 49))
    assert(IcebergLog.read(spark, table).as[(Long, String)].collect().toSet ==
      Set((1L, "a")))
  }

  test("concurrent commits resolve by optimistic metadata-version retry, no loss") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val table = tmpTable()
    val fs = (0 until 6).map(i => Future {
      IcebergLog.writeBatch(Seq((i.toLong, s"v$i")).toDF("id", "v"), table)
    })
    val versions = Await.result(Future.sequence(fs), 120.seconds).flatten
    assert(versions.sorted == (1 to 6))
    assert(IcebergLog.read(spark, table).count() == 6)
    // sequence numbers are dense 1..6 across the six snapshots
    val m = IcebergLog.current(table).get
    assert(m.snapshots.map(_.get("sequence-number").asLong).sorted == (1L to 6L))
  }

  test("concurrent replay of the SAME (appId, version): exactly one commit, no stray files") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val table = tmpTable()
    val fs = (0 until 4).map(_ => Future {
      IcebergLog.writeBatch(Seq((1L, "x")).toDF("id", "v"), table, txn = Some(("q", 0L)))
    })
    val results = Await.result(Future.sequence(fs), 120.seconds)
    assert(results.flatten == Seq(1), s"exactly one commit: $results")
    assert(IcebergLog.read(spark, table).count() == 1)
    // losers cleaned their orphaned parts: every on-disk data parquet is
    // manifest-listed
    val active = IcebergLog.entries(table).map(_._2).toSet
    val onDisk = Files.walk(Paths.get(table, "data")).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(_.toAbsolutePath.toString).toSet
    assert(onDisk == active, s"stray files: ${onDisk.diff(active)}")
  }

  test("partitioned table: identity spec, typed partition values in manifests, columns in files") {
    import spark.implicits._
    val table = tmpTable()
    val df = Seq((1L, "web", "a"), (2L, "web", "b"), (3L, "books", "c"))
      .toDF("id", "src", "v")
    assert(IcebergLog.writeBatch(df, table, partitionBy = Seq("src")).contains(1))
    val m = metaJson(table, 1)
    val spec = m.get("partition-specs").get(0).get("fields")
    assert(spec.size() == 1)
    assert(spec.get(0).get("name").asText == "src")
    assert(spec.get(0).get("transform").asText == "identity")
    assert(spec.get(0).get("source-id").asInt == 2) // src is column id 2
    assert(spec.get(0).get("field-id").asInt == 1000)
    // manifest entries carry per-file partition values
    val entries = IcebergLog.entries(table)
    assert(entries.nonEmpty)
    assert(entries.flatMap(_._5.get("src")).toSet == Set("web", "books"))
    // full read-back restores the partition column (hive-layout
    // discovery) in declared order, and partition predicates prune at
    // the scan
    val back = IcebergLog.read(spark, table)
    assert(back.schema.fieldNames.toSeq == Seq("id", "src", "v"))
    assert(back.as[(Long, String, String)].collect().toSet ==
      Set((1L, "web", "a"), (2L, "web", "b"), (3L, "books", "c")))
    val pruned = back.filter(col("src") === "web")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("src"),
      s"partition predicate must reach the scan:\n$plan")
    assert(pruned.count() == 2)
    // appending with a DIFFERENT partitioning is rejected
    intercept[IllegalArgumentException] {
      IcebergLog.writeBatch(Seq((9L, "web", "z")).toDF("id", "src", "v"), table)
    }
  }

  test("snapshot time travel: any retained snapshot reads its own manifest list") {
    import spark.implicits._
    val table = tmpTable()
    (0 until 3).foreach { i =>
      IcebergLog.writeBatch(Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1), table)
    }
    val m = IcebergLog.current(table).get
    val bySeq = m.snapshots.sortBy(_.get("sequence-number").asLong)
      .map(_.get("snapshot-id").asLong)
    for (i <- 0 until 3) {
      assert(IcebergLog.read(spark, table, snapshotId = Some(bySeq(i)))
        .as[(Long, String)].collect().toSet ==
        (0 to i).map(j => (j.toLong, s"v$j")).toSet, s"snapshot $i")
    }
    // a snapshot id that never existed fails loudly
    intercept[RuntimeException] {
      IcebergLog.read(spark, table, snapshotId = Some(42L))
    }
  }

  test("empty-batch commit keeps the schema readable; current() tracks the last version") {
    import spark.implicits._
    val table = tmpTable()
    IcebergLog.writeBatch(Seq.empty[(Long, String)].toDF("id", "v"), table)
    val out = IcebergLog.read(spark, table)
    assert(out.count() == 0 && out.schema.fieldNames.toSeq == Seq("id", "v"))
    IcebergLog.writeBatch(Seq((7L, "x")).toDF("id", "v"), table)
    assert(IcebergLog.current(table).get.version == 2)
    assert(IcebergLog.read(spark, table).count() == 1)
  }

  test("manifest metrics prune whole files: column bounds, strings, null counts (r9)") {
    import spark.implicits._
    val table = tmpTable()
    // two one-file appends with disjoint id ranges and string prefixes
    IcebergLog.writeBatch((1L to 100L).map(i => (i, s"a$i"))
      .toDF("id", "v").coalesce(1), table)
    IcebergLog.writeBatch((200L to 300L).map(i => (i, s"z$i"))
      .toDF("id", "v").coalesce(1), table)
    // a third file whose v column is ALL NULL
    IcebergLog.writeBatch(Seq((400L, null: String), (401L, null: String))
      .toDF("id", "v").coalesce(1), table)
    def kept(f: String): Int =
      IcebergLog.planFiles(spark, table, None, Some(f))._1.size
    assert(IcebergLog.planFiles(spark, table, None, None)._2 == 3)
    assert(kept("id < 50") == 1)                       // long bounds
    assert(kept("id >= 250 AND id <= 260") == 1)
    assert(kept("id = 150") == 0)                      // gap between files
    assert(kept("id IN (5, 250)") == 2)
    assert(kept("v >= 'z'") == 1)                      // string bounds
    assert(kept("v IS NULL") == 1)                     // only the null file
    assert(kept("v IS NOT NULL") == 2)                 // all-null file dropped
    assert(kept("id < 50 OR id > 250") == 3)           // OR: no pruning, conservative
    // the pruned read still returns exactly the right rows
    assert(IcebergLog.read(spark, table, scanFilter = Some("id < 50")).count() == 49)
    assert(IcebergLog.read(spark, table, scanFilter = Some("v IS NULL"))
      .as[(Long, String)].collect().map(_._1).toSet == Set(400L, 401L))
    // and the manifest really carries the bounds (spec field-ids 125/128)
    val live = IcebergLog.planFiles(spark, table, None, None)._1
    assert(live.forall(f => f.valueCounts.nonEmpty))
    assert(live.count(_.lowerBounds.nonEmpty) == 3)
  }

  test("small manifests merge past min-count: list stays bounded, rows intact (r9)") {
    import spark.implicits._
    val table = tmpTable()
    val n = 14
    (1 to n).foreach { i =>
      IcebergLog.writeBatch(Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1), table)
    }
    val m = IcebergLog.current(table).get
    val snap = m.snapshots.find(_.get("snapshot-id").asLong == m.currentSnapshotId).get
    // count manifests in the current list by reading the avro list file
    val mfCount = IcebergLog.readManifestList(snap.get("manifest-list").asText).size
    assert(mfCount < n, s"manifest list must merge below one-per-commit ($mfCount vs $n)")
    // every row still reads; entry count = data file count
    assert(IcebergLog.read(spark, table).count() == n.toLong)
    assert(IcebergLog.entries(table).size == n)
    // merged entries became EXISTING (status 0), latest stays ADDED (1)
    assert(IcebergLog.entries(table).map(_._1).toSet == Set(0, 1))
  }

  test("rewriteDataFiles compacts small files as a replace snapshot; time travel keeps the old view (r9)") {
    import spark.implicits._
    val table = tmpTable()
    (1 to 4).foreach { i =>
      IcebergLog.writeBatch(Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1), table)
    }
    val before = IcebergLog.current(table).get
    val preSnapshot = before.currentSnapshotId
    assert(IcebergLog.entries(table).size == 4)
    val v = IcebergLog.rewriteDataFiles(spark, table)
    assert(v.contains(5))
    // one compacted live file now; rows identical
    val live = IcebergLog.planFiles(spark, table, None, None)._1
    assert(live.size == 1, s"expected 1 compacted file, got ${live.map(_.path)}")
    assert(IcebergLog.read(spark, table).as[(Long, String)].collect().toSet ==
      (1 to 4).map(i => (i.toLong, s"v$i")).toSet)
    // the replace snapshot says so
    val m = IcebergLog.current(table).get
    val snap = m.snapshots.find(_.get("snapshot-id").asLong == m.currentSnapshotId).get
    assert(snap.get("summary").get("operation").asText == "replace")
    assert(snap.get("summary").get("deleted-data-files").asInt == 4)
    // pre-compaction snapshot still reads its own four files
    assert(IcebergLog.read(spark, table, snapshotId = Some(preSnapshot)).count() == 4)
    // nothing left to compact → None
    assert(IcebergLog.rewriteDataFiles(spark, table).isEmpty)
  }

  test("rewrite on a partitioned table: table-schema field ids in metrics, hive values round-trip (r9)") {
    import spark.implicits._
    val table = tmpTable()
    // partition col in the MIDDLE so data-file column ids shift without care
    (1 to 3).foreach { i =>
      IcebergLog.writeBatch(
        Seq((i.toLong, "us east", s"v$i"), (i.toLong + 10, "eu+west", s"w$i"))
          .toDF("id", "region", "v").coalesce(1),
        table, partitionBy = Seq("region"))
    }
    assert(IcebergLog.rewriteDataFiles(spark, table).nonEmpty)
    val live = IcebergLog.planFiles(spark, table, None, None)._1
    assert(live.size == 2) // one compacted file per partition
    // metrics keyed by TABLE schema position: id=1, v=3 (region=2 absent)
    assert(live.forall(f => f.lowerBounds.contains(1) && f.lowerBounds.contains(3)
      && !f.lowerBounds.contains(2)), live.map(_.lowerBounds.keySet))
    // bounds prune on the post-partition column
    assert(IcebergLog.planFiles(spark, table, None, Some("v >= 'w'"))._1.size <= 2)
    // partition values with a space / '+' survived the hive dir round-trip
    assert(live.flatMap(_.partitionValues.get("region")).toSet ==
      Set("us east", "eu+west"))
    assert(IcebergLog.read(spark, table).as[(Long, String, String)].collect().toSet ==
      (1 to 3).flatMap(i => Seq((i.toLong, "us east", s"v$i"),
        (i.toLong + 10, "eu+west", s"w$i"))).toSet)
  }

  test("concurrent rewrites never duplicate rows (replace conflict rule, r9)") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val table = tmpTable()
    (1 to 6).foreach { i =>
      IcebergLog.writeBatch(Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1), table)
    }
    val fs = (0 until 2).map(_ => Future(IcebergLog.rewriteDataFiles(spark, table)))
    val results = Await.result(Future.sequence(fs), 120.seconds)
    // at least one won; the loser either aborted (None) or found nothing
    assert(results.flatten.nonEmpty)
    assert(IcebergLog.read(spark, table).as[(Long, String)].collect().toSeq.sorted ==
      (1 to 6).map(i => (i.toLong, s"v$i")).sorted, "replace conflict must never duplicate rows")
  }

  test("expireSnapshots GCs unreferenced manifests+data and parks txn marks (r9)") {
    import spark.implicits._
    val table = tmpTable()
    (0 until 4).foreach { i =>
      IcebergLog.writeBatch(Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1), table,
        txn = Some(("app", i.toLong)))
    }
    IcebergLog.rewriteDataFiles(spark, table) // old data files now only in old snapshots
    val preIds = IcebergLog.current(table).get.snapshots.map(_.get("snapshot-id").asLong)
    val (expired, deleted) = IcebergLog.expireSnapshots(spark, table, olderThanMs = 0L)
    assert(expired == 4 && deleted > 0, s"($expired, $deleted)")
    val m = IcebergLog.current(table).get
    assert(m.snapshots.size == 1 && m.snapshots.head.get("snapshot-id").asLong == m.currentSnapshotId)
    // current snapshot reads fine; expired ones fail loudly
    assert(IcebergLog.read(spark, table).count() == 4)
    intercept[RuntimeException] {
      IcebergLog.read(spark, table, snapshotId = Some(preIds.head))
    }
    // replay of an EXPIRED txn is still a no-op (high-water parked in properties)
    assert(m.properties.get("graft.txn.app").contains("3"))
    assert(IcebergLog.writeBatch(Seq((99L, "dup")).toDF("id", "v"), table,
      txn = Some(("app", 2L))).isEmpty)
    assert(IcebergLog.read(spark, table).count() == 4)
    // a NEW txn version still commits
    assert(IcebergLog.writeBatch(Seq((100L, "new")).toDF("id", "v"), table,
      txn = Some(("app", 4L))).nonEmpty)
    assert(IcebergLog.read(spark, table).count() == 5)
    // no orphan parquet left beyond the live set + the still-retained current snapshot
    val active = IcebergLog.entries(table).map(_._2).toSet
    val onDisk = Files.walk(Paths.get(table, "data")).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(_.toAbsolutePath.toString).toSet
    assert(onDisk == active, s"stray files: ${onDisk.diff(active)}")
  }

  test("rewrite keeps a concurrent append landing between planning and commit (r10)") {
    import spark.implicits._
    val table = tmpTable()
    (1 to 4).foreach { i =>
      IcebergLog.writeBatch(Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1), table)
    }
    // land an append in the planning→commit window: the commit loop must
    // re-derive survivors from the FRESH snapshot and carry it forward
    IcebergLog.onReplaceCommit = () =>
      assert(IcebergLog.writeBatch(
        Seq((99L, "late")).toDF("id", "v").coalesce(1), table).nonEmpty)
    try assert(IcebergLog.rewriteDataFiles(spark, table).nonEmpty)
    finally IcebergLog.onReplaceCommit = () => ()
    assert(IcebergLog.read(spark, table).as[(Long, String)].collect().toSet ==
      ((1 to 4).map(i => (i.toLong, s"v$i")).toSet + ((99L, "late"))),
      "the concurrently appended row must survive the replace commit")
  }

  test("null partition values: real nulls in manifests, IS NULL pruning, compaction round-trip (r10)") {
    import spark.implicits._
    val table = tmpTable()
    // LONG partition column with nulls — pre-fix this threw in
    // typedPartitionValue on the __HIVE_DEFAULT_PARTITION__ sentinel
    (0 until 2).foreach { b =>
      IcebergLog.writeBatch(
        Seq((b * 10 + 1L, Option(10L), s"a$b"), (b * 10 + 2L, None, s"b$b"))
          .toDF("id", "bucket", "v").repartition(2, col("bucket")),
        table, partitionBy = Seq("bucket"))
    }
    assert(IcebergLog.read(spark, table).count() == 4)
    // the manifest carries a REAL null, so IS NULL keeps exactly the
    // null-partition files and IS NOT NULL drops them
    val (nullKept, total) = IcebergLog.planFiles(spark, table, None, Some("bucket IS NULL"))
    assert(nullKept.nonEmpty && nullKept.size < total,
      s"IS NULL must keep only null-partition files (${nullKept.size}/$total)")
    assert(nullKept.forall(_.partitionValues("bucket") == null))
    val (notNullKept, _) = IcebergLog.planFiles(spark, table, None, Some("bucket IS NOT NULL"))
    assert(notNullKept.forall(_.partitionValues("bucket") != null))
    assert(IcebergLog.read(spark, table, scanFilter = Some("bucket IS NULL"))
      .select("id").as[Long].collect().toSet == Set(2L, 12L))
    // compaction re-encodes the null partition dir via the sentinel and
    // round-trips it back to a real null
    assert(IcebergLog.rewriteDataFiles(spark, table, targetBytes = 1L << 30).nonEmpty)
    assert(IcebergLog.read(spark, table).count() == 4)
    assert(IcebergLog.read(spark, table, scanFilter = Some("bucket IS NULL"))
      .select("id").as[Long].collect().toSet == Set(2L, 12L))
    val (afterNull, afterTotal) = IcebergLog.planFiles(spark, table, None, Some("bucket IS NULL"))
    assert(afterNull.size < afterTotal && afterNull.forall(_.partitionValues("bucket") == null))
    // string partition column: the sentinel must NOT surface as a literal
    val sTable = tmpTable()
    IcebergLog.writeBatch(
      Seq((1L, Option("us"), "x"), (2L, Option.empty[String], "y"))
        .toDF("id", "region", "v").repartition(2, col("region")),
      sTable, partitionBy = Seq("region"))
    val (sNull, sTotal) = IcebergLog.planFiles(spark, sTable, None, Some("region IS NULL"))
    assert(sNull.nonEmpty && sNull.size < sTotal && sNull.forall(_.partitionValues("region") == null))
    assert(IcebergLog.read(spark, sTable, scanFilter = Some("region IS NULL"))
      .select("id").as[Long].collect().toSet == Set(2L))
  }

  test("TIMESTAMP AS OF resolves the latest snapshot at-or-before the instant (r10)") {
    import spark.implicits._
    val table = tmpTable()
    IcebergLog.writeBatch(Seq((1L, "a")).toDF("id", "v").coalesce(1), table)
    Thread.sleep(20)
    val between = System.currentTimeMillis()
    Thread.sleep(20)
    IcebergLog.writeBatch(Seq((2L, "b")).toDF("id", "v").coalesce(1), table)
    val m = IcebergLog.current(table).get
    val firstSid = m.snapshots.minBy(_.get("timestamp-ms").asLong)
      .get("snapshot-id").asLong
    assert(IcebergLog.snapshotIdAt(table, between).contains(firstSid))
    assert(IcebergLog.snapshotIdAt(table, System.currentTimeMillis())
      .contains(m.currentSnapshotId))
    assert(IcebergLog.snapshotIdAt(table, 1000L).isEmpty)
    // the SQL face: timestamp_as_of on an iceberg source table
    val got = new sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE it (id BIGINT, v TEXT) WITH (
         |  connector='iceberg', path='$table', format='parquet', type='source',
         |  timestamp_as_of='$between');
         |SELECT id, v FROM it""".stripMargin).get
    assert(got.as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  test("third-party delete content this reader can't apply is rejected loudly, never over-returned") {
    import spark.implicits._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val table = tmpTable()
    IcebergLog.writeBatch(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), table)
    assert(IcebergLog.read(spark, table).count() == 2) // sane before surgery
    // hand-craft a merge-on-read table: flip the manifest-list entry's
    // `content` field to 1 (a DELETES manifest), as a position/equality-
    // delete writer would produce
    val meta = IcebergLog.current(table).get
    val listPath = Paths.get(meta.snapshots
      .find(_.get("snapshot-id").asLong == meta.currentSnapshotId).get
      .get("manifest-list").asText())
    val mfType = StructType(Seq(
      StructField("manifest_path", StringType, nullable = false),
      StructField("manifest_length", LongType, nullable = false),
      StructField("partition_spec_id", IntegerType, nullable = false),
      StructField("content", IntegerType, nullable = false),
      StructField("sequence_number", LongType, nullable = false),
      StructField("min_sequence_number", LongType, nullable = false),
      StructField("added_snapshot_id", LongType, nullable = false),
      StructField("added_files_count", IntegerType, nullable = false),
      StructField("existing_files_count", IntegerType, nullable = false),
      StructField("deleted_files_count", IntegerType, nullable = false),
      StructField("added_rows_count", LongType, nullable = false),
      StructField("existing_rows_count", LongType, nullable = false),
      StructField("deleted_rows_count", LongType, nullable = false)))
    val rows = {
      val in = Files.newInputStream(listPath)
      try graft.formats.AvroCodec.readOcf(in, mfType).toSeq finally in.close()
    }
    assert(rows.nonEmpty && rows.forall(_.getInt(3) == 0))
    val doctored = rows.zipWithIndex.map { case (r, i) =>
      if (i == 0) Row.fromSeq(r.toSeq.updated(3, 1)) else r
    }
    val out = Files.newOutputStream(listPath)
    try graft.formats.AvroCodec.writeOcf(out, mfType, doctored.iterator)
    finally out.close()
    // r11 narrowed the refusal: POSITION deletes are applied (MorSpec);
    // what remains rejected is delete content this reader can't apply —
    // here a DATA entry masquerading inside a DELETES manifest
    val e = intercept[IllegalArgumentException] { IcebergLog.read(spark, table).count() }
    assert(e.getMessage.contains("DELETES manifest"), e.getMessage)

    // entry-level guard too: a data_file with content=1 (position deletes)
    // inside a normal DATA manifest is also refused
    val t2 = tmpTable()
    IcebergLog.writeBatch(Seq((1L, "a")).toDF("id", "v").coalesce(1), t2)
    val m2 = IcebergLog.current(t2).get
    val list2 = Paths.get(m2.snapshots
      .find(_.get("snapshot-id").asLong == m2.currentSnapshotId).get
      .get("manifest-list").asText())
    val manifestPath = {
      val in = Files.newInputStream(list2)
      try graft.formats.AvroCodec.readOcf(in, mfType).toSeq.head.getString(0)
      finally in.close()
    }
    val entryType = IcebergLog.manifestEntryType(StructType(Seq.empty))
    val entries2 =
      IcebergLog.readEntries(manifestPath, StructType(Seq.empty))
    val doctored2 = entries2.map { en =>
      val df = en.getStruct(4)
      Row.fromSeq(en.toSeq.updated(4, Row.fromSeq(df.toSeq.updated(0, 1))))
    }
    val out2 = Files.newOutputStream(Paths.get(manifestPath))
    try graft.formats.AvroCodec.writeOcf(out2, entryType, doctored2.iterator)
    finally out2.close()
    val e2 = intercept[IllegalArgumentException] { IcebergLog.read(spark, t2).count() }
    assert(e2.getMessage.contains("DELETES manifest"), e2.getMessage)
  }
}
