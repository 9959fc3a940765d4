package graft

import graft.sinks.{DeltaLog, IcebergLog}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** `ALTER TABLE … RENAME COLUMN / DROP COLUMN` (r15) — the metaData-only
  * evolutions column mapping (delta) and field-id identity (iceberg)
  * exist for. Pins: values survive a rename (old files resolve by
  * physicalName / field id), DML binds the NEW name, dropped data never
  * resurrects through a same-named re-add, partition-column renames
  * behave per format (delta: transparent — hive dirs are physical;
  * iceberg: reads refuse until OPTIMIZE re-lands old hive paths), and
  * unmapped delta tables refuse.
  */
class SchemaRenameDropSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("t").toString

  // ── delta ─────────────────────────────────────────────────────────────

  test("delta: rename keeps values, DML binds the new name, drop stays dead") {
    import spark.implicits._
    val table = tmp("delta_ren")
    assert(DeltaLog.writeBatch(
      Seq((1L, 10L, "x"), (2L, 20L, "y")).toDF("id", "v", "note"), table,
      tableConf = Map("delta.columnMapping.mode" -> "name")).contains(0L))
    val physV = {
      val f = DeltaLog.snapshot(spark, table).get.schema("v")
      f.metadata.getString("delta.columnMapping.physicalName")
    }

    // rename v -> vol: metaData-only (no data file added or removed)
    val beforeFiles = DeltaLog.snapshot(spark, table).get.files.toSet
    assert(DeltaLog.renameColumn(spark, table, "v", "vol").contains(1L))
    val s1 = DeltaLog.snapshot(spark, table).get
    assert(s1.files.toSet == beforeFiles)
    assert(s1.schema.fieldNames.toSeq == Seq("id", "vol", "note"))
    // the physicalName/id binding is UNCHANGED — that's the whole point
    assert(s1.schema("vol").metadata
      .getString("delta.columnMapping.physicalName") == physV)
    assert(DeltaLog.read(spark, table).select("id", "vol").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((1L, 10L), (2L, 20L)))
    // old name is gone; new name takes DML; stats pruning keys physically
    intercept[Exception] {
      DeltaLog.read(spark, table).select("v").collect() }
    assert(DeltaLog.updateWhere(spark, table,
      Seq("vol" -> "vol + 1"), Some("vol = 10")).isDefined)
    assert(DeltaLog.read(spark, table, scanFilter = Some("vol = 11"))
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))

    // drop note; re-add a column of the SAME name: fresh physicalName,
    // fresh id — old files' dead values must NOT resurrect
    assert(DeltaLog.dropColumns(spark, table, Seq("note")).isDefined)
    val s2 = DeltaLog.snapshot(spark, table).get
    assert(s2.schema.fieldNames.toSeq == Seq("id", "vol"))
    assert(DeltaLog.read(spark, table).columns.toSeq == Seq("id", "vol"))
    assert(DeltaLog.addColumns(spark, table, Seq("note" -> StringType)).isDefined)
    val s3 = DeltaLog.snapshot(spark, table).get
    assert(s3.schema("note").metadata.getLong("delta.columnMapping.id") > 3L)
    val notes = DeltaLog.read(spark, table).select("note").collect().map(_.isNullAt(0))
    assert(notes.forall(identity), "dropped data resurrected through re-add")
    // maxColumnId never regressed below the dead id
    assert(s3.configuration("delta.columnMapping.maxColumnId").toLong >= 4L)

    // appends post-rename land under the (stable) physical name
    assert(DeltaLog.writeBatch(
      Seq((3L, 30L, "z")).toDF("id", "vol", "note"), table).isDefined)
    assert(DeltaLog.read(spark, table).select("id", "vol").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((1L, 11L), (2L, 20L), (3L, 30L)))
  }

  test("delta: partition-column rename is transparent (hive dirs are physical)") {
    import spark.implicits._
    val table = tmp("delta_renp")
    assert(DeltaLog.writeBatch(
      Seq((1L, "a"), (2L, "b")).toDF("id", "cat"), table,
      partitionBy = Seq("cat"),
      tableConf = Map("delta.columnMapping.mode" -> "name")).contains(0L))
    assert(DeltaLog.renameColumn(spark, table, "cat", "category").contains(1L))
    val s = DeltaLog.snapshot(spark, table).get
    assert(s.partitionColumns == Seq("category"))
    assert(DeltaLog.read(spark, table, scanFilter = Some("category = 'a'"))
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // appends + DML after a partition rename
    assert(DeltaLog.writeBatch(
      Seq((3L, "a")).toDF("id", "category"), table).isDefined)
    assert(DeltaLog.deleteWhere(spark, table, "category = 'b'").isDefined)
    assert(DeltaLog.read(spark, table).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("delta: unmapped tables refuse rename/drop; partition drop refuses") {
    import spark.implicits._
    val plain = tmp("delta_plain")
    DeltaLog.writeBatch(Seq((1L, 2L)).toDF("a", "b"), plain)
    val e1 = intercept[IllegalArgumentException] {
      DeltaLog.renameColumn(spark, plain, "a", "c") }
    assert(e1.getMessage.contains("column mapping"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      DeltaLog.dropColumns(spark, plain, Seq("b")) }
    assert(e2.getMessage.contains("column mapping"), e2.getMessage)

    val mapped = tmp("delta_mapped")
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "cat"), mapped,
      partitionBy = Seq("cat"),
      tableConf = Map("delta.columnMapping.mode" -> "name"))
    val e3 = intercept[IllegalArgumentException] {
      DeltaLog.dropColumns(spark, mapped, Seq("cat")) }
    assert(e3.getMessage.contains("partition column"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      DeltaLog.dropColumns(spark, mapped, Seq("id", "cat")) }
    assert(e4.getMessage.contains("partition column"), e4.getMessage)
  }

  test("delta: NESTED field rename/drop (dotted paths) keep the binding") {
    import spark.implicits._
    val table = tmp("delta_nested_rd")
    val df = Seq((1L, (10L, "x")), (2L, (20L, "y"))).toDF("id", "s")
      .select(col("id"),
        struct(col("s._1").as("a"), col("s._2").as("b")).as("s"))
    assert(DeltaLog.writeBatch(df, table,
      tableConf = Map("delta.columnMapping.mode" -> "name")).contains(0L))
    // rename s.a -> qty: metaData-only; the nested physicalName binding
    // keeps existing files resolving
    assert(DeltaLog.renameColumn(spark, table, "s.a", "qty").contains(1L))
    assert(DeltaLog.read(spark, table).selectExpr("id", "s.qty").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((1L, 10L), (2L, 20L)))
    // DML binds the renamed nested leaf
    assert(DeltaLog.updateWhere(spark, table,
      Seq("id" -> "id + 100"), Some("s.qty = 10")).isDefined)
    assert(DeltaLog.read(spark, table).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(2L, 101L))
    // drop s.b; the struct (and its binding) stays
    assert(DeltaLog.dropColumns(spark, table, Seq("s.b")).isDefined)
    val sField = DeltaLog.snapshot(spark, table).get.schema("s")
    assert(sField.dataType.asInstanceOf[StructType].fieldNames.toSeq ==
      Seq("qty"))
    assert(DeltaLog.read(spark, table).selectExpr("s.qty").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(10L, 20L))
    // guards: path through a non-struct; emptying a struct
    val e1 = intercept[IllegalArgumentException] {
      DeltaLog.renameColumn(spark, table, "id.x", "y") }
    assert(e1.getMessage.contains("struct"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      DeltaLog.dropColumns(spark, table, Seq("s.qty")) }
    assert(e2.getMessage.contains("empty its struct"), e2.getMessage)
    // nested UPDATE SET (r15): the RHS and the predicate evaluate
    // against the OLD row; only the named leaf changes inside the struct
    assert(DeltaLog.updateWhere(spark, table,
      Seq("s.qty" -> "s.qty * 3"), Some("s.qty = 20")).isDefined)
    assert(DeltaLog.read(spark, table).selectExpr("s.qty").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(10L, 60L))
    // mixing a struct and a field inside it refuses
    val e3 = intercept[IllegalArgumentException] {
      DeltaLog.updateWhere(spark, table,
        Seq("s" -> "s", "s.qty" -> "1"), None) }
    assert(e3.getMessage.contains("inside it"), e3.getMessage)
    // id-mode twin: nested rename under field-id binding
    val idT = tmp("delta_nested_rd_id")
    assert(DeltaLog.writeBatch(df, idT,
      tableConf = Map("delta.columnMapping.mode" -> "id")).contains(0L))
    assert(DeltaLog.renameColumn(spark, idT, "s.b", "note").contains(1L))
    assert(DeltaLog.read(spark, idT).selectExpr("id", "s.note").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((1L, "x"), (2L, "y")))
  }

  test("delta: NESTED ADD COLUMNS (dotted paths) — unmapped, mapped minting, array elements (r16)") {
    import spark.implicits._
    def mk(rows: Seq[(Long, Int)]) = rows.toDF("id", "q")
      .select(col("id"), struct(col("q")).as("s"),
        expr("array(named_struct('a', q))").as("arr"))
    // unmapped: the new nested field reads null from old files by name
    val t1 = tmp("delta_nested_add")
    assert(DeltaLog.writeBatch(mk(Seq((1L, 10))), t1).contains(0L))
    assert(DeltaLog.addColumns(spark, t1,
      Seq("s.z" -> LongType, "arr.element.b" -> StringType)).isDefined)
    val sch1 = DeltaLog.snapshot(spark, t1).get.schema
    assert(sch1("s").dataType.asInstanceOf[StructType].fieldNames.toSeq ==
      Seq("q", "z"))
    assert(sch1("arr").dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType].fieldNames.toSeq == Seq("a", "b"))
    val r1 = DeltaLog.read(spark, t1).selectExpr("s.z", "arr[0].b").head()
    assert(r1.isNullAt(0) && r1.isNullAt(1))
    // new-shape appends land and read back beside the nulls
    val df2 = Seq((2L, 20)).toDF("id", "q")
      .select(col("id"), struct(col("q"), lit(7L).as("z")).as("s"),
        expr("array(named_struct('a', q, 'b', 'x'))").as("arr"))
    assert(DeltaLog.writeBatch(df2, t1).isDefined)
    assert(DeltaLog.read(spark, t1).selectExpr("s.z").collect()
      .map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted.toSeq ==
      Seq(-1L, 7L))
    // MAPPED name-mode: the nested add mints a fresh cm id + physicalName
    // and bumps maxColumnId
    val t2 = tmp("delta_nested_add_m")
    assert(DeltaLog.writeBatch(mk(Seq((1L, 10))), t2,
      tableConf = Map("delta.columnMapping.mode" -> "name")).contains(0L))
    val maxBefore = DeltaLog.snapshot(spark, t2).get
      .configuration("delta.columnMapping.maxColumnId").toLong
    assert(DeltaLog.addColumns(spark, t2, Seq("s.z" -> LongType)).isDefined)
    val s2 = DeltaLog.snapshot(spark, t2).get
    assert(s2.configuration("delta.columnMapping.maxColumnId").toLong >
      maxBefore)
    val zField = s2.schema("s").dataType.asInstanceOf[StructType]("z")
    assert(zField.metadata.contains("delta.columnMapping.id"))
    assert(zField.metadata.contains("delta.columnMapping.physicalName"))
    assert(DeltaLog.read(spark, t2).selectExpr("s.z").head().isNullAt(0))
  }

  test("delta: NESTED-leaf stats prune whole files, physically keyed on mapped tables (r16)") {
    import spark.implicits._
    def mk(rows: Seq[(Long, Int)]) = rows.toDF("id", "q")
      .select(col("id"), struct(col("q"), (col("q") * 2).as("p")).as("s"))
      .coalesce(1)
    // unmapped table: stats nest per struct (minValues.s.q)
    val t1 = tmp("delta_nested_stats")
    assert(DeltaLog.writeBatch(mk(Seq((1L, 10), (2L, 20))), t1).contains(0L))
    assert(DeltaLog.writeBatch(mk(Seq((3L, 30), (4L, 40))), t1).contains(1L))
    val s1 = DeltaLog.snapshot(spark, t1).get
    val (kept1, total1) = DeltaLog.prune(spark, s1, Some("s.q >= 30"))
    assert(total1 == 2 && kept1.size == 1, s"kept ${kept1.size} of $total1")
    assert(DeltaLog.read(spark, t1, scanFilter = Some("s.q >= 30"))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
    // MAPPED table: nested stats key by the per-level physical names
    // and the dotted logical predicate still prunes through them
    val t2 = tmp("delta_nested_stats_m")
    assert(DeltaLog.writeBatch(mk(Seq((1L, 10), (2L, 20))), t2,
      tableConf = Map("delta.columnMapping.mode" -> "name")).contains(0L))
    assert(DeltaLog.writeBatch(mk(Seq((3L, 30), (4L, 40))), t2).contains(1L))
    val s2 = DeltaLog.snapshot(spark, t2).get
    val (kept2, total2) = DeltaLog.prune(spark, s2, Some("s.q >= 30"))
    assert(total2 == 2 && kept2.size == 1, s"kept ${kept2.size} of $total2")
    assert(DeltaLog.read(spark, t2, scanFilter = Some("s.q >= 30"))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
    // post-RENAME of the nested leaf, the NEW name prunes through the
    // same physical stats key
    assert(DeltaLog.renameColumn(spark, t2, "s.q", "qty").isDefined)
    val s3 = DeltaLog.snapshot(spark, t2).get
    val (kept3, total3) = DeltaLog.prune(spark, s3, Some("s.qty >= 30"))
    assert(total3 == 2 && kept3.size == 1, s"kept ${kept3.size} of $total3")
  }

  test("delta: rename/drop through ARRAY elements and MAP values (r16)") {
    import spark.implicits._
    val table = tmp("delta_arr_rd")
    val df = Seq(
      (1L, Seq((10L, "x"), (11L, "xx")), Map("k1" -> (5L, "m"))),
      (2L, Seq((20L, "y")), Map("k2" -> (6L, "n"))))
      .toDF("id", "arr0", "kv0")
      .select(col("id"),
        expr("transform(arr0, e -> named_struct('a', e._1, 'b', e._2))").as("arr"),
        expr("map_from_arrays(map_keys(kv0), " +
          "transform(map_values(kv0), v -> named_struct('p', v._1, 'q', v._2)))")
          .as("kv"))
    assert(DeltaLog.writeBatch(df, table,
      tableConf = Map("delta.columnMapping.mode" -> "name")).contains(0L))
    // rename a field INSIDE array<struct<…>> via the element segment:
    // metaData-only; the element-level physicalName binding keeps every
    // existing file resolving
    assert(DeltaLog.renameColumn(spark, table, "arr.element.a", "qty")
      .contains(1L))
    assert(DeltaLog.read(spark, table)
      .selectExpr("id", "arr[0].qty").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((1L, 10L), (2L, 20L)))
    // rename inside map VALUES the same way
    assert(DeltaLog.renameColumn(spark, table, "kv.value.p", "amt")
      .contains(2L))
    assert(DeltaLog.read(spark, table)
      .selectExpr("id", "element_at(map_values(kv), 1).amt").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((1L, 5L), (2L, 6L)))
    // drop a field inside the array element; the array (and binding) stays
    assert(DeltaLog.dropColumns(spark, table, Seq("arr.element.b")).isDefined)
    val arrElem = DeltaLog.snapshot(spark, table).get.schema("arr")
      .dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    assert(arrElem.fieldNames.toSeq == Seq("qty"))
    assert(DeltaLog.read(spark, table).selectExpr("arr[0].qty").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(10L, 20L))
    // appends under the evolved shape still land and read back
    val df2 = Seq((3L, Seq(30L), Map("k3" -> 7L))).toDF("id", "arr0", "kv0")
      .select(col("id"),
        expr("transform(arr0, e -> named_struct('qty', e))").as("arr"),
        expr("map_from_arrays(map_keys(kv0), " +
          "transform(map_values(kv0), v -> named_struct('amt', v, 'q', 'z')))")
          .as("kv"))
    assert(DeltaLog.writeBatch(df2, table).isDefined)
    assert(DeltaLog.read(spark, table).selectExpr("arr[0].qty").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(10L, 20L, 30L))
    // guards: wrong segment name through an array; map sides need key/value
    val e1 = intercept[IllegalArgumentException] {
      DeltaLog.renameColumn(spark, table, "arr.a", "z") }
    assert(e1.getMessage.contains("element"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      DeltaLog.renameColumn(spark, table, "kv.p", "z") }
    assert(e2.getMessage.contains("key"), e2.getMessage)
  }

  // ── iceberg ───────────────────────────────────────────────────────────

  test("iceberg: rename keeps field-id identity; pre-rename files read by id") {
    import spark.implicits._
    val table = tmp("ice_ren")
    assert(IcebergLog.writeBatch(
      Seq((1L, 10L, "x"), (2L, 20L, "y")).toDF("id", "v", "note"), table)
      .contains(1))
    assert(IcebergLog.renameColumn(spark, table, "v", "vol").contains(2))
    val m = IcebergLog.current(table).get
    assert(m.schema.fieldNames.toSeq == Seq("id", "vol", "note"))
    // same field id under the new name; last-column-id unchanged
    assert(m.fieldIds == Map("id" -> 1, "vol" -> 2, "note" -> 3))
    assert(m.lastColumnId == 3)
    // pre-rename files (parquet column "v") resolve BY FIELD ID
    assert(IcebergLog.read(spark, table).select("id", "vol").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((1L, 10L), (2L, 20L)))
    // stats pruning binds the DECLARED id through the new name
    assert(IcebergLog.read(spark, table, scanFilter = Some("vol = 20"))
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
    // appends + DML post-rename
    assert(IcebergLog.writeBatch(
      Seq((3L, 30L, "z")).toDF("id", "vol", "note"), table).isDefined)
    assert(IcebergLog.updateWhere(spark, table,
      Seq("vol" -> "vol + 1"), Some("id = 1")).isDefined)
    assert(IcebergLog.read(spark, table).select("id", "vol").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((1L, 11L), (2L, 20L), (3L, 30L)))
  }

  test("iceberg: drop leaves an id gap; same-named re-add never resurrects") {
    import spark.implicits._
    val table = tmp("ice_drop")
    assert(IcebergLog.writeBatch(
      Seq((1L, 10L, "x"), (2L, 20L, "y")).toDF("id", "v", "note"), table)
      .contains(1))
    assert(IcebergLog.dropColumns(spark, table, Seq("v")).contains(2))
    val m1 = IcebergLog.current(table).get
    assert(m1.schema.fieldNames.toSeq == Seq("id", "note"))
    assert(m1.fieldIds == Map("id" -> 1, "note" -> 3)) // gap at 2
    assert(m1.lastColumnId == 3) // the dead id stays retired
    assert(IcebergLog.read(spark, table).columns.toSeq == Seq("id", "note"))
    // survivors' stats still prune correctly (ids, not positions)
    assert(IcebergLog.read(spark, table, scanFilter = Some("note = 'y'"))
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
    // re-add "v": FRESH id 4; old files' column (id 2) must read null
    assert(IcebergLog.addColumns(spark, table, Seq("v" -> LongType)).isDefined)
    val m2 = IcebergLog.current(table).get
    assert(m2.fieldIds == Map("id" -> 1, "note" -> 3, "v" -> 4))
    val vs = IcebergLog.read(spark, table).select("v").collect().map(_.isNullAt(0))
    assert(vs.forall(identity), "dropped data resurrected through re-add")
    // new writes fill the fresh field; old rows stay null
    assert(IcebergLog.writeBatch(
      Seq((3L, "z", 300L)).toDF("id", "note", "v"), table).isDefined)
    assert(IcebergLog.read(spark, table).select("id", "v").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sorted.toSeq == Seq((1L, -1L), (2L, -1L), (3L, 300L)))
  }

  test("iceberg: partition-column rename refuses reads until OPTIMIZE re-lands") {
    import spark.implicits._
    val table = tmp("ice_renp")
    assert(IcebergLog.writeBatch(
      Seq((1L, "a"), (2L, "b")).toDF("id", "cat"), table,
      partitionBy = Seq("cat")).contains(1))
    assert(IcebergLog.renameColumn(spark, table, "cat", "category").contains(2))
    val m = IcebergLog.current(table).get
    assert(m.partitionColumns == Seq("category"))
    // live files' hive paths still carry cat=… — reads refuse loudly
    val e = intercept[Exception] { IcebergLog.read(spark, table).collect() }
    assert(e.getMessage.contains("OPTIMIZE"), e.getMessage)
    // OPTIMIZE re-lands files under the current names; reads recover
    assert(IcebergLog.rewriteDataFiles(spark, table).isDefined)
    assert(IcebergLog.read(spark, table).select("id", "category").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((1L, "a"), (2L, "b")))
    assert(IcebergLog.read(spark, table, scanFilter = Some("category = 'b'"))
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("iceberg: drop refuses partition columns; writer topology survives gaps") {
    import spark.implicits._
    val table = tmp("ice_dropp")
    assert(IcebergLog.writeBatch(
      Seq((1L, 10L, "a")).toDF("id", "v", "cat"), table,
      partitionBy = Seq("cat")).contains(1))
    val e = intercept[IllegalArgumentException] {
      IcebergLog.dropColumns(spark, table, Seq("cat")) }
    assert(e.getMessage.contains("partition column"), e.getMessage)
    // a drop of a NON-partition column keeps the table writable
    assert(IcebergLog.dropColumns(spark, table, Seq("v")).isDefined)
    assert(IcebergLog.writeBatch(
      Seq((2L, "b")).toDF("id", "cat"), table, partitionBy = Seq("cat")).isDefined)
    assert(IcebergLog.read(spark, table).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("delta: checkpoint after rename/drop cold-replays the evolved mapping") {
    import spark.implicits._
    import java.nio.file.Paths
    val table = tmp("delta_ren_cp")
    DeltaLog.writeBatch(Seq((1L, 10L, "x")).toDF("id", "v", "note"), table,
      tableConf = Map("delta.columnMapping.mode" -> "name"))
    DeltaLog.writeBatch(Seq((2L, 20L, "y")).toDF("id", "v", "note"), table)
    assert(DeltaLog.renameColumn(spark, table, "v", "vol").contains(2L))
    assert(DeltaLog.dropColumns(spark, table, Seq("note")).contains(3L))
    DeltaLog.writeCheckpoint(spark, table, 3L)
    // age out the whole JSON head: the checkpoint alone must replay the
    // renamed+dropped schema WITH its mapping bindings
    (0L to 3L).foreach(v => java.nio.file.Files.delete(
      Paths.get(table, "_delta_log", f"$v%020d.json")))
    DeltaLog.clearSnapshotCache()
    val snap = DeltaLog.snapshot(spark, table).get
    assert(snap.schema.fieldNames.toSeq == Seq("id", "vol"))
    assert(snap.schema("vol").metadata
      .contains("delta.columnMapping.physicalName"))
    assert(DeltaLog.read(spark, table).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((1L, 10L), (2L, 20L)))
  }

  test("iceberg: equality deletes keyed on a since-DROPPED column refuse loudly") {
    import spark.implicits._
    val table = tmp("ice_eqdrop")
    IcebergLog.writeBatch(
      Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("id", "v", "extra"), table)
    // merge-keys upsert lands an equality-delete file keyed on (v)
    assert(IcebergLog.upsertAppend(spark, table,
      Seq((3L, 10L, "c", false)).toDF("id", "v", "extra", "__graft_deleted"),
      keys = Seq("v")).isDefined)
    assert(IcebergLog.read(spark, table).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    // drop the KEY column: the standing delete file's field id no longer
    // resolves — reads refuse loudly instead of over-returning id=1
    assert(IcebergLog.dropColumns(spark, table, Seq("v")).isDefined)
    val e = intercept[Exception] { IcebergLog.read(spark, table).collect() }
    assert(e.getMessage.contains("dropped") ||
      e.getMessage.contains("field id"), e.getMessage)
  }

  // ── streaming views under a mid-stream rename (pinned: REFUSE) ───────

  test("delta: a mapped streaming view refuses loudly on a mid-stream rename") {
    import spark.implicits._
    import graft.sources.DeltaStreamSource
    import org.apache.spark.sql.streaming.Trigger
    val table = tmp("delta_renstream")
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v").coalesce(1), table,
      tableConf = Map("delta.columnMapping.mode" -> "name"))
    val (df, view) = DeltaStreamSource.open(spark, table)
    val q = df.writeStream.format("memory").queryName("renstream")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      q.processAllAvailable()
      assert(spark.table("renstream").count() == 1)
      // rename mid-stream: the file source pinned its schema at open —
      // continuing would surface the old name forever; sync REFUSES
      assert(DeltaLog.renameColumn(spark, table, "v", "val2").isDefined)
      DeltaLog.writeBatch(Seq((2L, "b")).toDF("id", "val2").coalesce(1), table)
      val e = intercept[IllegalStateException] { view.sync() }
      assert(e.getMessage.contains("schema changed under a running stream"),
        e.getMessage)
    } finally { q.stop(); view.close() }
    // a RESTART picks up the renamed schema and resumes
    val (df2, view2) = DeltaStreamSource.open(spark, table)
    val q2 = df2.writeStream.format("memory").queryName("renstream2")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      q2.processAllAvailable()
      assert(df2.schema.fieldNames.toSeq == Seq("id", "val2"))
      assert(spark.table("renstream2").as[(Long, String)].collect().toSet ==
        Set((1L, "a"), (2L, "b")))
    } finally { q2.stop(); view2.close() }
  }

  test("iceberg: a streaming view refuses loudly on a mid-stream rename") {
    import spark.implicits._
    import graft.sources.IcebergStreamSource
    import org.apache.spark.sql.streaming.Trigger
    val table = tmp("ice_renstream")
    IcebergLog.writeBatch(Seq((1L, "a")).toDF("id", "v").coalesce(1), table)
    val (df, view) = IcebergStreamSource.open(spark, table)
    val q = df.writeStream.format("memory").queryName("irenstream")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      q.processAllAvailable()
      assert(spark.table("irenstream").count() == 1)
      assert(IcebergLog.renameColumn(spark, table, "v", "val2").isDefined)
      IcebergLog.writeBatch(Seq((2L, "b")).toDF("id", "val2").coalesce(1), table)
      val e = intercept[IllegalStateException] { view.sync() }
      assert(e.getMessage.toLowerCase.contains("schema"), e.getMessage)
    } finally { q.stop(); view.close() }
    // restart resumes under the renamed schema (pre-rename file included:
    // the materializing view reads it by field id)
    val (df2, view2) = IcebergStreamSource.open(spark, table)
    val q2 = df2.writeStream.format("memory").queryName("irenstream2")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      q2.processAllAvailable()
      assert(df2.schema.fieldNames.toSeq == Seq("id", "val2"))
      assert(spark.table("irenstream2").as[(Long, String)].collect().toSet ==
        Set((1L, "a"), (2L, "b")))
    } finally { q2.stop(); view2.close() }
  }

  // ── SQL faces ─────────────────────────────────────────────────────────

  test("SQL: ALTER TABLE RENAME COLUMN / DROP COLUMNS parse and dispatch") {
    import graft.sql.Ddl
    Ddl.parse("ALTER TABLE t RENAME COLUMN a TO b") match {
      case Ddl.AlterRename("t", "a", "b") => ()
      case other => fail(s"parsed $other")
    }
    Ddl.parse("ALTER TABLE t DROP COLUMN a") match {
      case Ddl.AlterDrop("t", Seq("a")) => ()
      case other => fail(s"parsed $other")
    }
    Ddl.parse("alter table t drop columns (a, b)") match {
      case Ddl.AlterDrop("t", Seq("a", "b")) => ()
      case other => fail(s"parsed $other")
    }
    intercept[IllegalArgumentException] {
      Ddl.parse("ALTER TABLE t DROP COLUMNS (a, 1bad)") }
    // dotted NESTED adds parse here (and only here — CREATE TABLE
    // rejects them), alongside plain columns
    Ddl.parse("ALTER TABLE t ADD COLUMNS (s.z BIGINT, top INT)") match {
      case Ddl.AlterAdd("t", cols) =>
        assert(cols.map(c => (c.name, c.sqlType)).toSet ==
          Set(("s.z", "BIGINT"), ("top", "INT")), cols)
      case other => fail(s"parsed $other")
    }
    intercept[IllegalArgumentException] {
      Ddl.parse("CREATE TABLE t (s.z BIGINT) WITH (connector = 'delta')") }
  }

  test("v3 lineage survives DML on a PARTITIONED table (postimages migrate, ids keep)") {
    import spark.implicits._
    val table = Files.createTempDirectory("iceberg_part_lineage").toString
    val df = Seq((0L, "a", 1L), (1L, "a", 2L), (2L, "b", 3L), (3L, "b", 4L))
      .toDF("id", "part", "v").coalesce(1)
      .sortWithinPartitions(col("id"))
    IcebergLog.writeBatch(df, table, partitionBy = Seq("part"))
    IcebergLog.setTableProperties(spark, table, Map("format-version" -> "3"))
    IcebergLog.writeBatch(
      Seq((10L, "a", 5L)).toDF("id", "part", "v").coalesce(1), table,
      partitionBy = Seq("part"))
    def lineage(): Map[Long, Option[Long]] =
      IcebergLog.readWithLineage(spark, table).collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val l1 = lineage()
    assert(l1(10L).isDefined) // post-upgrade append tracked
    // CoW UPDATE that also MIGRATES a row to another partition: the id
    // follows the row into its new partition directory
    assert(IcebergLog.updateWhere(spark, table,
      Seq("part" -> "'b'"), Some("id = 10")).isDefined)
    val l2 = lineage()
    assert(l2(10L) == l1(10L), s"$l1 -> $l2") // id survived the migration
    assert(IcebergLog.read(spark, table, scanFilter = Some("part = 'b'"))
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L, 10L))
    // pre-upgrade rows stay untracked through the untouched partition
    assert(l2(0L).isEmpty && l2(2L).isEmpty)
  }
}
