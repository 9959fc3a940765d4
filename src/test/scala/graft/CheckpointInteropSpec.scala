package graft

import graft.sinks.DeltaLog
import org.apache.spark.sql.Row

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Third-party delta CHECKPOINT forms (PROTOCOL.md "Checkpoints"):
  * multi-part classic checkpoints (`…checkpoint.<part>.<n>.parquet` —
  * what delta-spark writes for large tables), V2 checkpoints
  * (`…checkpoint.<uuid>.{parquet,json}` manifests with `sidecar`
  * actions under `_delta_log/_sidecars/`, the `v2Checkpoint` reader
  * feature), and the COVERAGE guard: a log whose head was aged out
  * past a missing/incomplete checkpoint must refuse loudly instead of
  * silently returning the JSON tail's files as the whole table.
  */
class CheckpointInteropSpec extends SparkSpec {

  private def tmpTable(): String =
    Files.createTempDirectory("delta_cp_interop").resolve("t").toString

  private def logDir(table: String): Path = Paths.get(table, "_delta_log")

  /** Two single-file commits (versions 0 and 1, one row each) plus a
    * classic checkpoint at v1. Returns (table, classic checkpoint path).
    */
  private def tableWithCheckpoint(): (String, Path) = {
    import spark.implicits._
    val table = tmpTable()
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v").coalesce(1), table)
    DeltaLog.writeBatch(Seq((2L, "b")).toDF("id", "v").coalesce(1), table)
    DeltaLog.writeCheckpoint(spark, table, 1L)
    (table, logDir(table).resolve(f"${1L}%020d.checkpoint.parquet"))
  }

  private def deleteJsons(table: String): Unit =
    Seq(0L, 1L).foreach(v =>
      Files.delete(logDir(table).resolve(f"$v%020d.json")))

  /** Write `rows` (schema `sch`) as ONE parquet file at `dest`. */
  private def oneFile(rows: Seq[Row], sch: org.apache.spark.sql.types.StructType,
      dest: Path): Unit = {
    val scratch = Files.createTempDirectory("cp_part")
    spark.createDataFrame(rows.asJava, sch).coalesce(1)
      .write.mode("overwrite").parquet(scratch.resolve("w").toString)
    val part = Files.list(scratch.resolve("w")).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
  }

  test("multi-part classic checkpoints read (all parts unioned); incomplete sets refuse") {
    val (table, cp) = tableWithCheckpoint()
    val df = spark.read.parquet(cp.toString)
    val all = df.collect().toSeq
    val iAdd = df.schema.fieldIndex("add")
    val (addRows, metaRows) = all.partition(r => !r.isNullAt(iAdd))
    assert(addRows.size == 2 && metaRows.nonEmpty)
    // the multi-part layout delta-spark writes for big tables: actions
    // spread across parts in no particular order
    oneFile(metaRows ++ addRows.take(1), df.schema,
      logDir(table).resolve(f"${1L}%020d.checkpoint.${1}%010d.${2}%010d.parquet"))
    oneFile(addRows.drop(1), df.schema,
      logDir(table).resolve(f"${1L}%020d.checkpoint.${2}%010d.${2}%010d.parquet"))
    Files.delete(cp)
    // age out v0 only: v1's JSON survives, so the incomplete-set case
    // below exercises the coverage guard, not the empty-log path
    Files.delete(logDir(table).resolve(f"${0L}%020d.json"))
    DeltaLog.clearSnapshotCache()
    val got = DeltaLog.read(spark, table).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L))
    // a part goes missing (crashed writer / partial copy): the set is
    // unusable and the aged log can no longer stand — refuse loudly
    Files.delete(logDir(table)
      .resolve(f"${1L}%020d.checkpoint.${2}%010d.${2}%010d.parquet"))
    DeltaLog.clearSnapshotCache()
    val e = intercept[IllegalArgumentException] { DeltaLog.read(spark, table) }
    assert(e.getMessage.contains("does not cover"), e.getMessage)
  }

  test("v2 checkpoint, parquet manifest with inline file actions") {
    val (table, cp) = tableWithCheckpoint()
    // a classic checkpoint's rows ARE the v2 inline shape (no sidecars);
    // only the name differs — pins that v2 naming alone doesn't derail
    Files.copy(cp, logDir(table).resolve(
      f"${1L}%020d.checkpoint.3a0c9f44-1111-2222-3333-444455556666.parquet"))
    Files.delete(cp)
    deleteJsons(table)
    DeltaLog.clearSnapshotCache()
    val got = DeltaLog.read(spark, table).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("v2 checkpoint, json manifest + parquet sidecar; v2Checkpoint reader feature accepted") {
    val (table, cp) = tableWithCheckpoint()
    val df = spark.read.parquet(cp.toString)
    // sidecar: the add actions only, under _delta_log/_sidecars/
    val addDf = df.select("add").where(df.col("add").isNotNull)
    val sidecarDir = logDir(table).resolve("_sidecars")
    Files.createDirectories(sidecarDir)
    oneFile(addDf.collect().toSeq, addDf.schema,
      sidecarDir.resolve("00000000-aaaa-bbbb-cccc-000000000001.parquet"))
    // manifest: protocol (with the v2Checkpoint feature), the original
    // metaData line, checkpointMetadata, and the sidecar pointer
    val v0 = Files.readAllLines(logDir(table).resolve(f"${0L}%020d.json")).asScala
    val metaLine = v0.find(_.contains("\"metaData\"")).get
    val manifest =
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""" + "\n" +
      metaLine + "\n" +
      """{"checkpointMetadata":{"version":1}}""" + "\n" +
      """{"sidecar":{"path":"00000000-aaaa-bbbb-cccc-000000000001.parquet",""" +
        """"sizeInBytes":1024,"modificationTime":0}}""" + "\n"
    Files.write(logDir(table).resolve(
      f"${1L}%020d.checkpoint.bb00c1e4-0b57-4c14-9f44-000000000002.json"),
      manifest.getBytes("UTF-8"))
    Files.delete(cp)
    deleteJsons(table)
    DeltaLog.clearSnapshotCache()
    val snap = DeltaLog.snapshot(spark, table).get
    assert(snap.version == 1L && snap.adds.size == 2)
    val got = DeltaLog.read(spark, table).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L))
    // absolute sidecar paths refuse (consistent with shallow-clone adds)
    Files.write(logDir(table).resolve(
      f"${1L}%020d.checkpoint.bb00c1e4-0b57-4c14-9f44-000000000002.json"),
      manifest.replace(
        "\"path\":\"00000000-aaaa-bbbb-cccc-000000000001.parquet\"",
        "\"path\":\"/elsewhere/sidecar.parquet\"").getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    val e = intercept[IllegalArgumentException] { DeltaLog.read(spark, table) }
    assert(e.getMessage.contains("sidecar"), e.getMessage)
  }

  test("classic-NAMED checkpoint with V2 'compatibility' sidecar rows reads completely") {
    import org.apache.spark.sql.types._
    val (table, cp) = tableWithCheckpoint()
    val df = spark.read.parquet(cp.toString)
    val all = df.collect().toSeq
    val iAdd = df.schema.fieldIndex("add")
    val (addRows, metaRows) = all.partition(r => !r.isNullAt(iAdd))
    assert(addRows.size == 2)
    // sidecar file: the add actions, under _delta_log/_sidecars/
    val addDf = df.select("add").where(df.col("add").isNotNull)
    val sidecarDir = logDir(table).resolve("_sidecars")
    Files.createDirectories(sidecarDir)
    val sidecarName = "00000000-aaaa-bbbb-cccc-000000000009.parquet"
    oneFile(addDf.collect().toSeq, addDf.schema, sidecarDir.resolve(sidecarName))
    // the classic-NAMED file keeps non-file actions + a `sidecar` row —
    // the V2-spec compatibility form (same name, adds live elsewhere).
    // A reader that applies rows blindly sees a table with ZERO files.
    val sidecarType = StructType(Seq(
      StructField("path", StringType), StructField("sizeInBytes", LongType),
      StructField("modificationTime", LongType)))
    val compatSchema = StructType(df.schema.fields :+ StructField("sidecar", sidecarType))
    val compatRows =
      metaRows.map(r => Row.fromSeq(r.toSeq :+ null)) :+
        Row.fromSeq(Seq.fill(df.schema.size)(null) :+
          Row(sidecarName, Files.size(sidecarDir.resolve(sidecarName)), 0L))
    oneFile(compatRows, compatSchema, cp)
    deleteJsons(table)
    DeltaLog.clearSnapshotCache()
    val got = DeltaLog.read(spark, table).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L),
      s"sidecar-stored adds must survive the classic-named read; got ${got.toSeq}")
  }

  test("multi-part checkpoint WRITES past the row threshold; set reads back complete") {
    import spark.implicits._
    val table = tmpTable()
    DeltaLog.writeBatch((1L to 6L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(3), table)
    DeltaLog.writeBatch(Seq((7L, "v7")).toDF("id", "v").coalesce(1), table)
    val saved = DeltaLog.checkpointRowsPerPart
    try {
      DeltaLog.checkpointRowsPerPart = 2L // force the multi-part form
      DeltaLog.writeCheckpoint(spark, table, 1L)
    } finally DeltaLog.checkpointRowsPerPart = saved
    // protocol + metaData + ≥4 adds = ≥6 rows → ≥3 parts, spec naming
    val parts = Files.list(logDir(table)).iterator().asScala
      .map(_.getFileName.toString).filter(_.contains(".checkpoint.")).toSeq
    assert(parts.size >= 3, parts.toString)
    val PartRe = """0*1\.checkpoint\.(\d{10})\.(\d{10})\.parquet""".r
    parts.foreach(p => assert(PartRe.findFirstIn(p).isDefined, p))
    val n = parts.map { case PartRe(_, total) => total.toInt }.distinct
    assert(n == Seq(parts.size), s"part total mismatch: $n vs ${parts.size}")
    // _last_checkpoint advertises the part count (the hint delta-spark
    // reads before listing)
    val lc = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readAllBytes(logDir(table).resolve("_last_checkpoint")))
    assert(lc.get("parts").asInt() == parts.size)
    // cold replay from the multi-part set alone
    deleteJsons(table)
    DeltaLog.clearSnapshotCache()
    val got = DeltaLog.read(spark, table).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (1L to 7L), s"got ${got.toSeq}")
  }

  test("aged log with NO usable checkpoint refuses — never a silent partial table") {
    import spark.implicits._
    val table = tmpTable()
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v").coalesce(1), table)
    DeltaLog.writeBatch(Seq((2L, "b")).toDF("id", "v").coalesce(1), table)
    Files.delete(logDir(table).resolve(f"${0L}%020d.json"))
    DeltaLog.clearSnapshotCache()
    val e = intercept[IllegalArgumentException] { DeltaLog.read(spark, table) }
    assert(e.getMessage.contains("does not cover"), e.getMessage)
  }

  /** A table whose protocol carries v2Checkpoint from birth: v0 is
    * hand-authored (this engine never mints the feature), appends flow
    * through the engine.
    */
  private def v2ProtocolTable(): String = {
    import spark.implicits._
    val table = tmpTable()
    val log = logDir(table)
    Files.createDirectories(log)
    val schema = """{\"type\":\"struct\",\"fields\":[""" +
      """{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},""" +
      """{\"name\":\"v\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""
    Files.write(log.resolve(f"${0L}%020d.json"),
      ("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""" + "\n" +
        s"""{"metaData":{"id":"${java.util.UUID.randomUUID()}","format":{"provider":"parquet","options":{}},"schemaString":"$schema","partitionColumns":[],"configuration":{},"createdTime":1700000000000}}""" + "\n")
        .getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v").coalesce(1), table)
    DeltaLog.writeBatch(Seq((2L, "b")).toDF("id", "v").coalesce(1), table)
    table
  }

  test("V2 checkpoint WRITES: UUID manifest + sidecar files; cold replay reads back") {
    import spark.implicits._
    val table = v2ProtocolTable()
    DeltaLog.writeCheckpoint(spark, table, 2L)
    // byte shape: no classic-named checkpoint; one UUID manifest; adds
    // live in _sidecars/, NOT inline
    val names = Files.list(logDir(table)).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(!names.contains(f"${2L}%020d.checkpoint.parquet"), names)
    val manifestName = names.find(n =>
      n.matches(f"${2L}%020d" + """\.checkpoint\.[0-9a-f-]+\.parquet""")).get
    val mdf = spark.read.parquet(logDir(table).resolve(manifestName).toString)
    assert(mdf.columns.toSet ==
      Set("txn", "metaData", "protocol", "checkpointMetadata", "sidecar"))
    val rows = mdf.collect()
    // exactly one checkpointMetadata row carrying the version
    val cpMeta = rows.filter(r => !r.isNullAt(r.fieldIndex("checkpointMetadata")))
    assert(cpMeta.length == 1 &&
      cpMeta.head.getStruct(cpMeta.head.fieldIndex("checkpointMetadata"))
        .getLong(0) == 2L)
    // protocol round-trips VERBATIM (v2Checkpoint feature intact)
    val pr = rows.filter(r => !r.isNullAt(r.fieldIndex("protocol")))
    assert(pr.length == 1 && pr.head.getStruct(pr.head.fieldIndex("protocol"))
      .getAs[scala.collection.Seq[String]]("readerFeatures").contains("v2Checkpoint"))
    // no add actions inline — they ride the sidecar pointers
    assert(!mdf.columns.contains("add"))
    val sc = rows.filter(r => !r.isNullAt(r.fieldIndex("sidecar")))
      .map(_.getStruct(rows.head.fieldIndex("sidecar")))
    assert(sc.nonEmpty)
    sc.foreach { p =>
      val f = logDir(table).resolve("_sidecars").resolve(p.getAs[String]("path"))
      assert(Files.exists(f), f)
      assert(p.getAs[Long]("sizeInBytes") == Files.size(f))
      val sdf = spark.read.parquet(f.toString)
      assert(sdf.columns.toSet == Set("add", "remove"))
      assert(sdf.where(sdf.col("add").isNotNull).count() > 0)
    }
    // cold replay FROM the v2 checkpoint alone (JSON head aged out)
    Seq(0L, 1L, 2L).foreach(v =>
      Files.delete(logDir(table).resolve(f"$v%020d.json")))
    DeltaLog.clearSnapshotCache()
    val snap = DeltaLog.snapshot(spark, table).get
    assert(snap.version == 2L && snap.adds.size == 2)
    assert(DeltaLog.read(spark, table).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L))
    // appends continue past the checkpoint; replay composes both
    DeltaLog.writeBatch(Seq((3L, "c")).toDF("id", "v").coalesce(1), table)
    DeltaLog.clearSnapshotCache()
    assert(DeltaLog.read(spark, table).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
    // _last_checkpoint records the v2 checkpoint version
    val lc = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readAllBytes(logDir(table).resolve("_last_checkpoint")))
    assert(lc.get("version").asLong() == 2L && !lc.has("parts"))
  }

  test("V2 checkpoint WRITES split sidecars past the row threshold") {
    import spark.implicits._
    val table = v2ProtocolTable()
    val saved = DeltaLog.checkpointRowsPerPart
    DeltaLog.checkpointRowsPerPart = 1L
    try DeltaLog.writeCheckpoint(spark, table, 2L)
    finally DeltaLog.checkpointRowsPerPart = saved
    val sidecarFiles = Files.list(logDir(table).resolve("_sidecars"))
      .iterator().asScala.toSeq
    assert(sidecarFiles.size == 2, sidecarFiles) // 2 adds, 1 row per file
    Seq(0L, 1L, 2L).foreach(v =>
      Files.delete(logDir(table).resolve(f"$v%020d.json")))
    DeltaLog.clearSnapshotCache()
    assert(DeltaLog.read(spark, table).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L))
  }
}
