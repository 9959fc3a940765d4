package graft

import graft.sinks.{DeletionVectors, DeltaLog}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Delta COLUMN MAPPING (PROTOCOL.md "Column Mapping"): read-side
  * interop with tables whose columns live under stable physical names
  * (`delta.columnMapping.physicalName`, `name` mode) or parquet field
  * ids (`delta.columnMapping.id`, `id` mode). Real mapped tables are
  * what Databricks-written Delta usually looks like — every fixture
  * here is hand-authored the way a third-party writer lays it out:
  * physical-named parquet in a FLAT directory (no hive layout; the log
  * is the authoritative partition source), phys-keyed stats and
  * partitionValues, protocol 2/5 (legacy) or 3/7 + columnMapping.
  * The full write surface works against them (r13 appends; r14 DML,
  * OPTIMIZE, CREATE-with-minting, maxColumnId-coordinated evolution) —
  * every write lands the conformant PHYSICAL shape.
  */
class ColumnMappingSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def tmpTable(): String =
    Files.createTempDirectory("delta_cm").resolve("t").toString

  /** One logical field of a mapped schemaString. */
  private def fieldJson(name: String, tpe: String, id: Int, phys: String): String =
    s"""{"name":"$name","type":$tpe,"nullable":true,"metadata":{""" +
      s""""delta.columnMapping.id":$id,"delta.columnMapping.physicalName":"$phys"}}"""

  private def schemaJson(fields: String*): String =
    s"""{"type":"struct","fields":[${fields.mkString(",")}]}"""

  /** metaData + protocol line pair for a mapped table. */
  private def metaLines(schema: String, mode: String,
      partCols: Seq[String], legacy: Boolean): String = {
    val protocol =
      if (legacy) """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}"""
      else """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["columnMapping"],"writerFeatures":["columnMapping"]}}"""
    val md = mapper.createObjectNode()
    val m = md.putObject("metaData")
    m.put("id", java.util.UUID.randomUUID().toString)
    m.putObject("format").put("provider", "parquet")
    m.set[com.fasterxml.jackson.databind.JsonNode]("schemaString",
      mapper.getNodeFactory.textNode(schema))
    val pc = m.putArray("partitionColumns")
    partCols.foreach(pc.add)
    m.putObject("configuration")
      .put("delta.columnMapping.mode", mode)
      .put("delta.columnMapping.maxColumnId", "10")
    m.put("createdTime", 1700000000000L)
    protocol + "\n" + md.toString + "\n"
  }

  private def addLine(path: String, pv: Map[String, String],
      stats: Option[String] = None,
      dv: Option[DeletionVectors.Descriptor] = None): String = {
    val root = mapper.createObjectNode()
    val a = root.putObject("add")
    a.put("path", path)
    val p = a.putObject("partitionValues")
    pv.foreach { case (k, v) => p.put(k, v) }
    a.put("size", 100L)
    a.put("modificationTime", 1700000000000L)
    a.put("dataChange", true)
    stats.foreach(a.put("stats", _))
    dv.foreach { d =>
      val n = a.putObject("deletionVector")
      n.put("storageType", d.storageType)
      n.put("pathOrInlineDv", d.pathOrInlineDv)
      d.offset.foreach(n.put("offset", _))
      n.put("sizeInBytes", d.sizeInBytes)
      n.put("cardinality", d.cardinality)
    }
    root.toString + "\n"
  }

  /** Write `df` as ONE parquet file named `name` directly under `dir`. */
  private def onePhysFile(df: org.apache.spark.sql.DataFrame, dir: Path,
      name: String): Unit = {
    val scratch = Files.createTempDirectory("cm_part")
    df.coalesce(1).write.mode("overwrite").parquet(scratch.resolve("w").toString)
    val part = Files.list(scratch.resolve("w")).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.createDirectories(dir)
    Files.move(part, dir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
  }

  /** The standard name-mode fixture: logical (id long, v long, cat
    * string-partition) under physical (col-9f3a, col-77bb, col-p1),
    * two flat files, phys-keyed stats. Returns the table path.
    */
  private def nameModeTable(): String = {
    import spark.implicits._
    val table = tmpTable()
    val root = Paths.get(table)
    onePhysFile(Seq((1L, 10L), (2L, 20L)).toDF("col-9f3a", "col-77bb"),
      root, "part-a.parquet")
    onePhysFile(Seq((3L, 30L), (4L, 40L)).toDF("col-9f3a", "col-77bb"),
      root, "part-b.parquet")
    val schema = schemaJson(
      fieldJson("id", "\"long\"", 1, "col-9f3a"),
      fieldJson("v", "\"long\"", 2, "col-77bb"),
      fieldJson("cat", "\"string\"", 3, "col-p1"))
    def stats(lo: Long, hi: Long) =
      s"""{"numRecords":2,"minValues":{"col-9f3a":$lo},""" +
        s""""maxValues":{"col-9f3a":$hi},"nullCount":{"col-9f3a":0}}"""
    val log = root.resolve("_delta_log")
    Files.createDirectories(log)
    Files.write(log.resolve(f"${0L}%020d.json"),
      (metaLines(schema, "name", Seq("cat"), legacy = true) +
        addLine("part-a.parquet", Map("col-p1" -> "a"), Some(stats(1, 2))) +
        addLine("part-b.parquet", Map("col-p1" -> "b"), Some(stats(3, 4)))
      ).getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    table
  }

  test("name mode: logical rows, partition values from the log, no hive layout") {
    val table = nameModeTable()
    val df = DeltaLog.read(spark, table)
    assert(df.schema.fieldNames.toSeq == Seq("id", "v", "cat"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(got.toSeq == Seq((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b"), (4L, 40L, "b")))
    // logical-named filters work end-to-end (remap before the filter)
    assert(df.filter("cat = 'b' and id > 3").collect().map(_.getLong(1)).toSeq == Seq(40L))
    // the SQL face reads mapped tables through the same path
    val sqlGot = new sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE mt (id BIGINT, v BIGINT, cat TEXT) WITH (
         |  connector='delta', path='$table', format='parquet', type='source');
         |SELECT id, v FROM mt WHERE cat = 'a'""".stripMargin).get
    assert(sqlGot.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((1L, 10L), (2L, 20L)))
  }

  test("name mode: file pruning binds phys-keyed stats AND partitionValues to logical predicates") {
    val table = nameModeTable()
    // stats-pruned: id >= 3 excludes part-a (max col-9f3a = 2)
    val (byStats, total) = DeltaLog.planFiles(spark, table, None, Some("id >= 3"))
    assert(total == 2 && byStats == Seq("part-b.parquet"))
    // partition-pruned: cat = 'a' excludes part-b
    val (byPart, _) = DeltaLog.planFiles(spark, table, None, Some("cat = 'a'"))
    assert(byPart == Seq("part-a.parquet"))
    assert(DeltaLog.read(spark, table, None, Some("id >= 3")).count() == 2)
  }

  test("id mode: parquet field ids are authoritative; file column NAMES need not match") {
    import spark.implicits._
    val table = tmpTable()
    val root = Paths.get(table)
    // a third-party writer stored the columns under names unrelated to
    // the physicalName — only the field ids line up (the id-mode contract)
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val idMeta = (id: Long) => new MetadataBuilder().putLong("parquet.field.id", id).build()
    onePhysFile(Seq((7L, "x"), (8L, "y")).toDF("a", "b")
      .select(col("a").as("weird_1", idMeta(1)), col("b").as("weird_2", idMeta(2))),
      root, "part-0.parquet")
    val schema = schemaJson(
      fieldJson("id", "\"long\"", 1, "col-zz1"),
      fieldJson("name", "\"string\"", 2, "col-zz2"))
    val log = root.resolve("_delta_log")
    Files.createDirectories(log)
    Files.write(log.resolve(f"${0L}%020d.json"),
      (metaLines(schema, "id", Seq.empty, legacy = false) +
        addLine("part-0.parquet", Map.empty)).getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    val got = DeltaLog.read(spark, table).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(got.toSeq == Seq((7L, "x"), (8L, "y")))
  }

  test("nested structs remap recursively; null structs stay null") {
    import spark.implicits._
    val table = tmpTable()
    val root = Paths.get(table)
    // physical file: s -> col-s { a -> col-sa, b -> col-sb }
    val physRows = Seq(Row(1L, Row(11L, "p")), Row(2L, Row(22L, "q")), Row(3L, null))
    val physSchema = StructType(Seq(
      StructField("col-k", LongType),
      StructField("col-s", StructType(Seq(
        StructField("col-sa", LongType), StructField("col-sb", StringType))))))
    onePhysFile(spark.createDataFrame(physRows.asJava, physSchema), root, "part-0.parquet")
    val inner =
      s"""{"type":"struct","fields":[${fieldJson("a", "\"long\"", 3, "col-sa")},""" +
        s"""${fieldJson("b", "\"string\"", 4, "col-sb")}]}"""
    val schema = schemaJson(
      fieldJson("k", "\"long\"", 1, "col-k"),
      fieldJson("s", inner, 2, "col-s"))
    val log = root.resolve("_delta_log")
    Files.createDirectories(log)
    Files.write(log.resolve(f"${0L}%020d.json"),
      (metaLines(schema, "name", Seq.empty, legacy = true) +
        addLine("part-0.parquet", Map.empty)).getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    val df = DeltaLog.read(spark, table)
    assert(df.schema("s").dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("a", "b"))
    val got = df.select("k", "s.a", "s.b").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        Option(r.getString(2)).getOrElse("-"))).sorted
    assert(got.toSeq == Seq((1L, 11L, "p"), (2L, 22L, "q"), (3L, -1L, "-")))
    assert(df.filter(col("s").isNull).count() == 1, "null struct must stay null")
  }

  test("deletion vectors apply on mapped tables; time travel sees the pre-DV rows") {
    val table = nameModeTable()
    val root = Paths.get(table)
    // a third-party DV delete of part-a row 0 (id=1): remove + re-add with DV
    val desc = DeletionVectors.write(root, Seq(
      DeletionVectors.bitmapOf(Iterator(0L)))).head
    val remove = """{"remove":{"path":"part-a.parquet","dataChange":true}}""" + "\n"
    val stats = """{"numRecords":2,"minValues":{"col-9f3a":1},""" +
      """"maxValues":{"col-9f3a":2},"nullCount":{"col-9f3a":0}}"""
    Files.write(root.resolve("_delta_log").resolve(f"${1L}%020d.json"),
      (remove + addLine("part-a.parquet", Map("col-p1" -> "a"), Some(stats), Some(desc)))
        .getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    val now = DeltaLog.read(spark, table).collect().map(_.getLong(0)).sorted
    assert(now.toSeq == Seq(2L, 3L, 4L))
    val then_ = DeltaLog.read(spark, table, asOf = Some(0L)).collect().map(_.getLong(0)).sorted
    assert(then_.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("change data feed reads map cdc files to logical columns") {
    import spark.implicits._
    val table = nameModeTable()
    val root = Paths.get(table)
    // third-party cdc file: physical data columns + _change_type, flat
    // under _change_data/, partition values ONLY in the cdc action
    onePhysFile(Seq((2L, 20L, "update_preimage"), (2L, 21L, "update_postimage"))
      .toDF("col-9f3a", "col-77bb", "_change_type"),
      root.resolve("_change_data"), "cdc-0.parquet")
    val cdc = mapper.createObjectNode()
    val c = cdc.putObject("cdc")
    c.put("path", "_change_data/cdc-0.parquet")
    c.putObject("partitionValues").put("col-p1", "a")
    c.put("size", 100L)
    c.put("dataChange", false)
    Files.write(root.resolve("_delta_log").resolve(f"${1L}%020d.json"),
      (cdc.toString + "\n").getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    val ch = DeltaLog.readChanges(spark, table, 1L, Some(1L))
      .select("id", "v", "cat", "_change_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).sorted
    assert(ch.toSeq == Seq(
      (2L, 20L, "a", "update_preimage"), (2L, 21L, "a", "update_postimage")))
  }

  test("CREATE mints a fresh mapping (r14); mode flips on existing tables refuse") {
    import spark.implicits._
    val table = tmpTable()
    assert(DeltaLog.writeBatch(
      Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("id", "v", "cat"), table,
      partitionBy = Seq("cat"),
      tableConf = Map("delta.columnMapping.mode" -> "name")).contains(0L))
    val s = DeltaLog.snapshot(spark, table).get
    // minted mapping: every field carries id + col-<uuid> physicalName;
    // maxColumnId recorded; legacy mapping protocol 2/5
    s.schema.fields.foreach { f =>
      assert(f.metadata.contains("delta.columnMapping.id"), f.name)
      assert(f.metadata.getString("delta.columnMapping.physicalName")
        .startsWith("col-"), f.name)
    }
    assert(s.configuration("delta.columnMapping.maxColumnId") == "3")
    assert(s.protocolJson.exists(p =>
      p.contains("\"minReaderVersion\":2") && p.contains("\"minWriterVersion\":5")),
      s.protocolJson.toString)
    // files on disk are PHYSICAL: col-* parquet columns, phys hive dirs
    s.adds.foreach { case (rel, info) =>
      assert(rel.startsWith("col-"), rel)
      val cols = spark.read.parquet(Paths.get(table, rel).toString)
        .schema.fieldNames
      assert(cols.forall(_.startsWith("col-")), cols.mkString(","))
      assert(info.partitionValues.forall(_._1.startsWith("col-")), rel)
    }
    // logical round trip + the full write surface on the minted table
    assert(DeltaLog.read(spark, table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq ==
      Seq((1L, 10L, "a"), (2L, 20L, "b")))
    assert(DeltaLog.writeBatch(
      Seq((3L, 30L, "a")).toDF("id", "v", "cat"), table).contains(1L))
    assert(DeltaLog.updateWhere(spark, table,
      Seq("v" -> "v + 1"), Some("id = 1")).contains(2L))
    assert(DeltaLog.read(spark, table).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((1L, 11L), (2L, 20L), (3L, 30L)))
    // NESTED schemas mint at every depth (name mode)
    val nested = tmpTable()
    assert(DeltaLog.writeBatch(
      Seq((1L, (11L, "p"))).toDF("k", "s"), nested,
      tableConf = Map("delta.columnMapping.mode" -> "name")).contains(0L))
    val sn = DeltaLog.snapshot(spark, nested).get
    val innerFields = sn.schema("s").dataType.asInstanceOf[StructType].fields
    assert(innerFields.forall(_.metadata.contains("delta.columnMapping.physicalName")))
    assert(sn.configuration("delta.columnMapping.maxColumnId") == "4")
    assert(DeltaLog.read(spark, nested).select("k", "s._2")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "p")))
    // id-mode CREATE: flat works (field ids stamped); NESTED works too
    // (r15 — the external-row pass stamps parquet ids at every depth)
    val idTable = tmpTable()
    assert(DeltaLog.writeBatch(Seq((7L, "x")).toDF("id", "name"), idTable,
      tableConf = Map("delta.columnMapping.mode" -> "id")).contains(0L))
    assert(DeltaLog.read(spark, idTable).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((7L, "x")))
    val idNested = tmpTable()
    assert(DeltaLog.writeBatch(Seq((1L, (2L, "y"))).toDF("k", "s"), idNested,
      tableConf = Map("delta.columnMapping.mode" -> "id")).contains(0L))
    // files on disk carry parquet field ids at EVERY depth — the id-mode
    // reader contract (verified in the footer, not just the round trip)
    locally {
      val sNested = DeltaLog.snapshot(spark, idNested).get
      val rel = sNested.adds.head._1
      val conf = spark.sessionState.newHadoopConf()
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(
            Paths.get(idNested, rel).toString), conf))
      val msg = try rd.getFooter.getFileMetaData.getSchema.toString
        finally rd.close()
      // "= <n>" after each leaf and the group line = a stamped field id
      assert(msg.linesIterator.count(_.contains(" = ")) >= 4, msg)
    }
    assert(DeltaLog.read(spark, idNested).select("k", "s._2").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "y")))
    // id-mode nested DML + evolution (previously refused)
    assert(DeltaLog.updateWhere(spark, idNested,
      Seq("k" -> "k + 10"), Some("s._1 = 2")).isDefined)
    assert(DeltaLog.read(spark, idNested).select("k").collect()
      .map(_.getLong(0)).toSeq == Seq(11L))
    assert(DeltaLog.addColumns(spark, idNested, Seq("extra" ->
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.LongType))))).isDefined)
    assert(DeltaLog.writeBatch(
      Seq((5L, (6L, "z"), 7L)).toDF("k", "s", "a_raw")
        .select(org.apache.spark.sql.functions.col("k"),
          org.apache.spark.sql.functions.col("s"),
          org.apache.spark.sql.functions.struct(
            org.apache.spark.sql.functions.col("a_raw").as("a")).as("extra")),
      idNested).isDefined)
    assert(DeltaLog.read(spark, idNested).select("k", "extra.a").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sorted.toSeq == Seq((5L, 7L), (11L, -1L)))
    // the mode can NOT be armed on an existing (logical-named) table
    val plain = tmpTable()
    DeltaLog.writeBatch(Seq((1L, 1L)).toDF("a", "b"), plain)
    val eFlip = intercept[IllegalArgumentException] {
      DeltaLog.setTableProperties(spark, plain,
        Map("delta.columnMapping.mode" -> "name"))
    }
    assert(eFlip.getMessage.contains("existing"), eFlip.getMessage)
    // schema evolution on the minted table mints the next id (r14)
    assert(DeltaLog.addColumns(spark, table, Seq("extra" -> LongType)).isDefined)
    val sE = DeltaLog.snapshot(spark, table).get
    assert(sE.schema("extra").metadata.getLong("delta.columnMapping.id") == 4L)
    assert(sE.configuration("delta.columnMapping.maxColumnId") == "4")
  }

  test("SQL face: column_mapping='name' sink CREATE mints a mapped table; DML composes") {
    import spark.implicits._
    val in = Files.createTempDirectory("cm_sql_in").toString
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
      .write.mode("overwrite").json(in)
    val out = tmpTable()
    new sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE src (id BIGINT, v BIGINT) WITH (
         |  connector='filesystem', path='$in', format='json', type='source');
         |CREATE TABLE dst (id BIGINT, v BIGINT) WITH (
         |  connector='delta', path='$out', format='parquet', type='sink',
         |  column_mapping='name');
         |INSERT INTO dst SELECT id, v FROM src;
         |DELETE FROM dst WHERE id = 2;""".stripMargin)
    val s = DeltaLog.snapshot(spark, out).get
    assert(DeltaLog.mappingMode(s.configuration) == "name")
    assert(s.schema.fields.forall(
      _.metadata.contains("delta.columnMapping.physicalName")))
    s.adds.foreach { case (rel, _) =>
      val cols = spark.read.parquet(Paths.get(out, rel).toString).schema.fieldNames
      assert(cols.forall(_.startsWith("col-")), cols.mkString(","))
    }
    assert(DeltaLog.read(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((1L, 10L), (3L, 30L)))
    // non-delta connectors refuse the option (at sink execution, where
    // the table properties bind)
    assert(intercept[IllegalArgumentException] {
      new sql.Pipeline(spark, streaming = false).run(
        s"""CREATE TABLE bad (id BIGINT) WITH (
           |  connector='iceberg', path='${tmpTable()}', format='parquet',
           |  type='sink', column_mapping='name');
           |INSERT INTO bad SELECT CAST(1 AS BIGINT) AS id""".stripMargin)
    }.getMessage.contains("delta option"))
  }

  test("DELETE on a mapped table rewrites physical-shape files with phys-keyed stats") {
    val table = nameModeTable()
    assert(DeltaLog.deleteWhere(spark, table, "id = 2").contains(1L))
    val got = DeltaLog.read(spark, table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(got.toSeq == Seq((1L, 10L, "a"), (3L, 30L, "b"), (4L, 40L, "b")))
    // the replacement file is CONFORMANT: physical parquet columns,
    // phys-keyed partitionValues and stats, phys hive dir
    val s = DeltaLog.snapshot(spark, table).get
    val newAdds = s.adds.filterNot(a =>
      Seq("part-a.parquet", "part-b.parquet").contains(a._1))
    assert(newAdds.size == 1, s"got ${newAdds.map(_._1)}")
    val (rel, info) = newAdds.head
    assert(rel.startsWith("col-p1="), rel)
    assert(info.partitionValues.map(_._1) == Seq("col-p1"), info.partitionValues)
    assert(info.stats.exists(_.contains("col-9f3a")), info.stats)
    val fileCols = spark.read.parquet(
      Paths.get(table, rel).toString).schema.fieldNames.toSet
    assert(fileCols == Set("col-9f3a", "col-77bb"), fileCols.toString)
    // untouched partition's file survives as-is (stats-pruned rewrite)
    assert(s.files.contains("part-b.parquet"), s.files.toString)
    // a delete matching nothing is a no-op, not an empty commit
    assert(DeltaLog.deleteWhere(spark, table, "id = 999").isEmpty)
  }

  test("UPDATE on a mapped table: partition migration re-lands under the phys hive dir") {
    val table = nameModeTable()
    // move id=1 from cat=a to cat=b AND bump v — the rewritten row must
    // land in the col-p1=b hive dir with phys-keyed partitionValues
    assert(DeltaLog.updateWhere(spark, table,
      Seq("cat" -> "'b'", "v" -> "v + 1"), Some("id = 1")).contains(1L))
    val got = DeltaLog.read(spark, table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(got.toSeq == Seq((1L, 11L, "b"), (2L, 20L, "a"), (3L, 30L, "b"), (4L, 40L, "b")))
    val s = DeltaLog.snapshot(spark, table).get
    val migrated = s.adds.filter(_._1.startsWith("col-p1=b"))
    assert(migrated.nonEmpty, s.files.toString)
    // partition pruning still binds after the DML (phys-keyed values)
    val (kept, _) = DeltaLog.planFiles(spark, table, None, Some("cat = 'b'"))
    assert(kept.forall(r => r == "part-b.parquet" || r.startsWith("col-p1=b")), kept.toString)
    assert(DeltaLog.read(spark, table, None, Some("cat = 'a'"))
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("MERGE upserts a mapped table; inserts land physical in the same commit") {
    import spark.implicits._
    val table = nameModeTable()
    val source = Seq((2L, 200L, "a"), (9L, 90L, "c")).toDF("id", "v", "cat")
    val clauses = graft.sinks.Merge.Clauses(
      "t", "s", "t.id = s.id",
      Seq(graft.sinks.Merge.MatchedClause(None, Left(Seq("v" -> "s.v")))),
      Some((None, Seq.empty))) // INSERT *
    assert(DeltaLog.merge(spark, table, source, clauses).contains(1L))
    val got = DeltaLog.read(spark, table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(got.toSeq == Seq((1L, 10L, "a"), (2L, 200L, "a"), (3L, 30L, "b"),
      (4L, 40L, "b"), (9L, 90L, "c")))
    // every new file (rewrite + insert) is physical-shape
    val s = DeltaLog.snapshot(spark, table).get
    s.adds.filterNot(a => Seq("part-a.parquet", "part-b.parquet").contains(a._1))
      .foreach { case (rel, _) =>
        val cols = spark.read.parquet(Paths.get(table, rel).toString)
          .schema.fieldNames.toSet
        assert(cols == Set("col-9f3a", "col-77bb"), s"$rel: $cols")
      }
  }

  test("DML on an id-mode table stamps field ids the id-resolving read binds") {
    import spark.implicits._
    val table = tmpTable()
    val root = Paths.get(table)
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val idMeta = (id: Long) => new MetadataBuilder().putLong("parquet.field.id", id).build()
    onePhysFile(Seq((7L, "x"), (8L, "y"), (9L, "z")).toDF("a", "b")
      .select(col("a").as("weird_1", idMeta(1)), col("b").as("weird_2", idMeta(2))),
      root, "part-0.parquet")
    val schema = schemaJson(
      fieldJson("id", "\"long\"", 1, "col-zz1"),
      fieldJson("name", "\"string\"", 2, "col-zz2"))
    val log = root.resolve("_delta_log")
    Files.createDirectories(log)
    Files.write(log.resolve(f"${0L}%020d.json"),
      (metaLines(schema, "id", Seq.empty, legacy = false) +
        addLine("part-0.parquet", Map.empty)).getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    assert(DeltaLog.deleteWhere(spark, table, "id = 8").contains(1L))
    assert(DeltaLog.updateWhere(spark, table,
      Seq("name" -> "upper(name)"), Some("id = 9")).contains(2L))
    val got = DeltaLog.read(spark, table).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(got.toSeq == Seq((7L, "x"), (9L, "Z")))
  }

  test("CDF composes with mapped DML: cdc files land physical, change rows read logical") {
    val table = nameModeTable()
    assert(DeltaLog.setTableProperties(spark, table,
      Map(graft.sinks.Cdf.enableProp -> "true")).contains(1L))
    assert(DeltaLog.updateWhere(spark, table,
      Seq("v" -> "v + 1"), Some("id = 3")).contains(2L))
    // the cdc FILE on disk is physical-shape + _change_type (what a
    // conformant mapped reader binds)
    val root = Paths.get(table)
    val cdcFiles = {
      val s = Files.walk(root.resolve("_change_data"))
      try s.iterator().asScala.filter(p =>
        p.getFileName.toString.endsWith(".parquet")).toSeq
      finally s.close()
    }
    assert(cdcFiles.nonEmpty)
    val cdcCols = spark.read.parquet(cdcFiles.map(_.toString): _*).schema.fieldNames.toSet
    assert(cdcCols == Set("col-9f3a", "col-77bb", "_change_type"), cdcCols.toString)
    // …and the change feed reads them back LOGICAL
    val ch = DeltaLog.readChanges(spark, table, 2L, Some(2L))
      .select("id", "v", "cat", "_change_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).sorted
    assert(ch.toSeq == Seq(
      (3L, 30L, "b", "update_preimage"), (3L, 31L, "b", "update_postimage")))
  }

  test("merge-on-read DML (deletion vectors) + OPTIMIZE purge on a mapped table") {
    val table = nameModeTable()
    assert(DeltaLog.setTableProperties(spark, table,
      Map("delta.enableDeletionVectors" -> "true")).contains(1L))
    // MoR delete: the data file is NOT rewritten — a DV lands on it
    assert(DeltaLog.deleteWhere(spark, table, "id = 1").contains(2L))
    val s = DeltaLog.snapshot(spark, table).get
    assert(s.files.toSet == Set("part-a.parquet", "part-b.parquet"), s.files.toString)
    assert(s.adds.exists(_._2.dv.exists(_.cardinality == 1)))
    assert(DeltaLog.read(spark, table).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 3L, 4L))
    // MoR update: retraction into the DV + physical postimage append
    assert(DeltaLog.updateWhere(spark, table,
      Seq("v" -> "v * 10"), Some("id = 4")).contains(3L))
    val got = DeltaLog.read(spark, table).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == Seq((2L, 20L), (3L, 30L), (4L, 400L)))
    // OPTIMIZE purges the DVs into clean physical rewrites
    assert(DeltaLog.optimize(spark, table, smallFileBytes = 1024 * 1024).isDefined)
    val s2 = DeltaLog.snapshot(spark, table).get
    assert(s2.adds.forall(_._2.dv.isEmpty), "OPTIMIZE must purge DVs")
    s2.adds.foreach { case (rel, _) =>
      val cols = spark.read.parquet(Paths.get(table, rel).toString)
        .schema.fieldNames.toSet
      assert(cols == Set("col-9f3a", "col-77bb"), s"$rel: $cols")
    }
    assert(DeltaLog.read(spark, table).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((2L, 20L), (3L, 30L), (4L, 400L)))
  }

  test("streaming source materializes mapped tables: snapshot, then each append, logical shape") {
    import spark.implicits._
    val table = nameModeTable()
    val (df, view) = graft.sources.DeltaStreamSource.open(spark, table)
    val q = df.writeStream.format("memory").queryName("cm_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100)).start()
    def got: Set[(Long, Long, String)] = spark.table("cm_stream")
      .as[(Long, Long, String)].collect().toSet
    try {
      q.processAllAvailable()
      assert(got == Set((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b"), (4L, 40L, "b")),
        s"got $got")
      // a mapped APPEND lands physical; the view materializes it logical
      DeltaLog.writeBatch(Seq((9L, 90L, "c")).toDF("id", "v", "cat"), table)
      view.sync()
      q.processAllAvailable()
      assert(got.size == 5 && got.contains((9L, 90L, "c")), s"got $got")
      // a replayed sync is a no-op (deterministic materialization names)
      assert(view.sync() == 0)
    } finally { q.stop(); view.close() }
  }

  test("APPENDS land physical: names, field ids, phys-keyed partitionValues and stats") {
    import spark.implicits._
    val table = nameModeTable()
    val v = DeltaLog.writeBatch(
      Seq((9L, 90L, "c"), (10L, 100L, "a")).toDF("id", "v", "cat"), table,
      txn = Some(("cm-app", 1L)))
    assert(v.contains(1L))
    // replayed (appId, version): a no-op, like any delta sink batch
    assert(DeltaLog.writeBatch(
      Seq((9L, 90L, "c")).toDF("id", "v", "cat"), table,
      txn = Some(("cm-app", 1L))).isEmpty)
    val got = DeltaLog.read(spark, table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(got.toSeq == Seq((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b"),
      (4L, 40L, "b"), (9L, 90L, "c"), (10L, 100L, "a")))
    // the bytes a CONFORMANT mapped reader binds: physical parquet
    // column names, phys-keyed partitionValues and stats in the add
    val s = DeltaLog.snapshot(spark, table).get
    val newAdds = s.adds.filterNot(a =>
      Seq("part-a.parquet", "part-b.parquet").contains(a._1))
    assert(newAdds.size == 2, s"got ${newAdds.map(_._1)}")
    newAdds.foreach { case (rel, info) =>
      assert(info.partitionValues.map(_._1) == Seq("col-p1"), s"$rel: ${info.partitionValues}")
      assert(info.stats.exists(_.contains("col-9f3a")), s"$rel: ${info.stats}")
      val fileCols = spark.read.parquet(
        java.nio.file.Paths.get(table, rel).toString).schema.fieldNames.toSet
      assert(fileCols == Set("col-9f3a", "col-77bb"), s"$rel: $fileCols")
    }
    // hive dirs use the PHYSICAL partition name
    assert(newAdds.forall(_._1.startsWith("col-p1=")), newAdds.map(_._1))
    // file pruning serves the appended files' phys-keyed stats too
    val (kept, total) = DeltaLog.planFiles(spark, table, None, Some("id >= 9"))
    assert(total == 4 && kept.toSet == newAdds.map(_._1).toSet)
    // schema drift WITHOUT merge_schema refuses
    val eDrift = intercept[IllegalArgumentException] {
      DeltaLog.writeBatch(Seq((1L, "x")).toDF("id", "extra"), table)
    }
    assert(eDrift.getMessage.contains("exact-schema"), eDrift.getMessage)
    // merge_schema (r14) EVOLVES the mapped table: the new column mints
    // its id + physicalName via the maxColumnId coordination mechanism
    assert(DeltaLog.writeBatch(
      Seq((11L, 110L, "a", "x")).toDF("id", "v", "cat", "nc"),
      table, mergeSchema = true).isDefined)
    val s2 = DeltaLog.snapshot(spark, table).get
    val nc = s2.schema("nc")
    // the fixture DECLARES maxColumnId=10 (a Databricks table may hold
    // ids above its current schema) — minting respects the watermark
    assert(nc.metadata.getLong("delta.columnMapping.id") == 11L)
    assert(nc.metadata.getString("delta.columnMapping.physicalName")
      .startsWith("col-"), nc.metadata.toString)
    assert(s2.configuration("delta.columnMapping.maxColumnId") == "11")
    // old files read null for the new column; the new row carries it
    val evolved = DeltaLog.read(spark, table)
      .select("id", "nc").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("-"))).toMap
    assert(evolved(11L) == "x" && evolved(1L) == "-", evolved.toString)
    // explicit ADD COLUMNS mints too; appends missing the column null-fill
    assert(DeltaLog.addColumns(spark, table,
      Seq("extra2" -> LongType)).isDefined)
    assert(DeltaLog.snapshot(spark, table).get
      .configuration("delta.columnMapping.maxColumnId") == "12")
    assert(DeltaLog.writeBatch(
      Seq((12L, 120L, "b", "y")).toDF("id", "v", "cat", "nc"),
      table, mergeSchema = true).isDefined)
    assert(DeltaLog.read(spark, table).filter("id = 12")
      .select("extra2").collect().head.isNullAt(0))
    // nested ADD COLUMNS (name mode) mints at every depth (r14)
    assert(DeltaLog.addColumns(spark, table, Seq("s" ->
      StructType(Seq(StructField("a", LongType))))).isDefined)
    val sN = DeltaLog.snapshot(spark, table).get
    val sField = sN.schema("s")
    assert(sField.metadata.getLong("delta.columnMapping.id") == 13L)
    val aField = sField.dataType.asInstanceOf[StructType]("a")
    assert(aField.metadata.getLong("delta.columnMapping.id") == 14L)
    assert(aField.metadata.getString("delta.columnMapping.physicalName")
      .startsWith("col-"))
    assert(sN.configuration("delta.columnMapping.maxColumnId") == "14")
    // id mode takes nested additions too (r15 — the external-row pass
    // stamps nested parquet field ids on every subsequent write)
    val idT = tmpTable()
    assert(DeltaLog.writeBatch(
      Seq((1L, "x")).toDF("id", "name"), idT,
      tableConf = Map("delta.columnMapping.mode" -> "id")).isDefined)
    assert(DeltaLog.addColumns(spark, idT, Seq("s" ->
      StructType(Seq(StructField("a", LongType))))).isDefined)
    assert(DeltaLog.writeBatch(
      Seq((2L, "y", 20L)).toDF("id", "name", "a")
        .select(org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.col("name"),
          org.apache.spark.sql.functions.struct(
            org.apache.spark.sql.functions.col("a")).as("s")), idT).isDefined)
    assert(DeltaLog.read(spark, idT).selectExpr("id", "s.a").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sorted.toSeq == Seq((1L, -1L), (2L, 20L)))
  }

  test("checkpoints round-trip the mapped protocol; cold replay from one still maps") {
    import spark.implicits._
    val table = nameModeTable()
    DeltaLog.writeBatch(Seq((9L, 90L, "c")).toDF("id", "v", "cat"), table) // v1
    DeltaLog.writeCheckpoint(spark, table, 1L)
    val cpPath = Paths.get(table, "_delta_log", f"${1L}%020d.checkpoint.parquet")
    // the protocol must survive VERBATIM (2/5, the legacy mapping form):
    // a re-derived 1/2 protocol here would let feature-unaware readers
    // start from this checkpoint and silently misread physical names
    val pr = spark.read.parquet(cpPath.toString)
      .filter(col("protocol").isNotNull).select("protocol.*").head()
    assert(pr.getInt(0) == 2 && pr.getInt(1) == 5, pr.toString)
    // cold replay FROM the checkpoint (jsons aged out) still maps
    Seq(0L, 1L).foreach(v =>
      Files.delete(Paths.get(table, "_delta_log", f"$v%020d.json")))
    DeltaLog.clearSnapshotCache()
    val got = DeltaLog.read(spark, table).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L, 3L, 4L, 9L))
    // and the checkpoint-sourced snapshot still takes mapped appends
    assert(DeltaLog.writeBatch(
      Seq((11L, 110L, "a")).toDF("id", "v", "cat"), table).contains(2L))
    assert(DeltaLog.read(spark, table).count() == 6)
  }

  test("appends into an id-mode table stamp parquet field ids the id-resolving read binds") {
    import spark.implicits._
    // the id-mode fixture from above: file names unrelated to physical
    // names, ids authoritative — an appended file WITHOUT ids would
    // fail this read
    val table = tmpTable()
    val root = Paths.get(table)
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val idMeta = (id: Long) => new MetadataBuilder().putLong("parquet.field.id", id).build()
    onePhysFile(Seq((7L, "x")).toDF("a", "b")
      .select(col("a").as("weird_1", idMeta(1)), col("b").as("weird_2", idMeta(2))),
      root, "part-0.parquet")
    val schema = schemaJson(
      fieldJson("id", "\"long\"", 1, "col-zz1"),
      fieldJson("name", "\"string\"", 2, "col-zz2"))
    val log = root.resolve("_delta_log")
    Files.createDirectories(log)
    Files.write(log.resolve(f"${0L}%020d.json"),
      (metaLines(schema, "id", Seq.empty, legacy = false) +
        addLine("part-0.parquet", Map.empty)).getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    assert(DeltaLog.writeBatch(Seq((8L, "y")).toDF("id", "name"), table).contains(1L))
    val got = DeltaLog.read(spark, table).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(got.toSeq == Seq((7L, "x"), (8L, "y")))
  }

  test("nested structs append under physical names and read back") {
    import spark.implicits._
    val table = tmpTable()
    val root = Paths.get(table)
    val physSchema = StructType(Seq(
      StructField("col-k", LongType),
      StructField("col-s", StructType(Seq(
        StructField("col-sa", LongType), StructField("col-sb", StringType))))))
    onePhysFile(spark.createDataFrame(
      Seq(Row(1L, Row(11L, "p"))).asJava, physSchema), root, "part-0.parquet")
    val inner =
      s"""{"type":"struct","fields":[${fieldJson("a", "\"long\"", 3, "col-sa")},""" +
        s"""${fieldJson("b", "\"string\"", 4, "col-sb")}]}"""
    val schema = schemaJson(
      fieldJson("k", "\"long\"", 1, "col-k"),
      fieldJson("s", inner, 2, "col-s"))
    val log = root.resolve("_delta_log")
    Files.createDirectories(log)
    Files.write(log.resolve(f"${0L}%020d.json"),
      (metaLines(schema, "name", Seq.empty, legacy = true) +
        addLine("part-0.parquet", Map.empty)).getBytes("UTF-8"))
    DeltaLog.clearSnapshotCache()
    val logicalSchema = StructType(Seq(
      StructField("k", LongType),
      StructField("s", StructType(Seq(
        StructField("a", LongType), StructField("b", StringType))))))
    val batch = spark.createDataFrame(
      Seq(Row(2L, Row(22L, "q")), Row(3L, null)).asJava, logicalSchema)
    assert(DeltaLog.writeBatch(batch, table).contains(1L))
    val df = DeltaLog.read(spark, table)
    val got = df.select("k", "s.a").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).sorted
    assert(got.toSeq == Seq((1L, 11L), (2L, 22L), (3L, -1L)))
    // the appended file's NESTED columns are physical on disk
    val newRel = DeltaLog.snapshot(spark, table).get.adds
      .map(_._1).filterNot(_ == "part-0.parquet").head
    val fileSchema = spark.read.parquet(Paths.get(table, newRel).toString).schema
    assert(fileSchema.fieldNames.toSet == Set("col-k", "col-s"))
    assert(fileSchema("col-s").dataType.asInstanceOf[StructType]
      .fieldNames.toSet == Set("col-sa", "col-sb"), fileSchema.treeString)
  }
}
