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
}
