package graft

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sinks.IcebergLog

/** Nested types on the iceberg WRITE path (r16): struct/list/map schema
  * JSON per the spec's nested forms, PATH-keyed field ids minted
  * depth-by-level past last-column-id, nested parquet field-id stamping
  * (struct-only schemas), leaf-id-keyed footer metrics, nested name
  * mapping, nested UPDATE SET, and rename/drop interactions.
  *
  * Reference surface: the SQL type system includes STRUCT/ARRAY/MAP
  * (arroyo-planner/src/types.rs:100-117) and the iceberg connector
  * inherits nested support from its iceberg crate
  * (arroyo-connectors/src/filesystem/iceberg.rs) — this is parity, not
  * gold-plating.
  */
class IcebergNestedSpec extends SparkSpec {
  private val mapper = new ObjectMapper()

  private def tmp(): String =
    Files.createTempDirectory("graft-iceberg-nested").toString

  private def latestMeta(table: String) = {
    val m = IcebergLog.current(table).getOrElse(fail(s"no metadata in $table"))
    m
  }

  private def nestedDf = {
    import spark.implicits._
    Seq(
      (1L, "a", 10, 1.5, Seq(1L, 2L), Map("k1" -> 1)),
      (2L, "b", 20, 2.5, Seq(3L), Map("k2" -> 2)),
      (3L, "a", 30, 3.5, Seq.empty[Long], Map.empty[String, Int]),
      (4L, "c", 40, 4.5, Seq(4L, 5L, 6L), Map("k3" -> 3, "k4" -> 4))
    ).toDF("id", "tag", "qty", "price", "xs", "kv")
      .select(col("id"), col("tag"),
        struct(col("qty"), struct(col("price")).as("inner")).as("s"),
        col("xs"), col("kv"))
  }

  test("nested CREATE: schema JSON carries spec forms, path ids mint level-order, last-column-id covers leaves") {
    val table = tmp()
    IcebergLog.writeBatch(nestedDf, table)
    val m = latestMeta(table)
    // round-trip: StructType survives the JSON
    assert(m.schema("s").dataType.isInstanceOf[StructType])
    assert(m.schema("xs").dataType.isInstanceOf[ArrayType])
    assert(m.schema("kv").dataType.isInstanceOf[MapType])
    val ids = m.fieldIdPaths
    // top-level level-order 1..5, nested mint past them
    assert(ids("id") == 1 && ids("tag") == 2 && ids("s") == 3 &&
      ids("xs") == 4 && ids("kv") == 5)
    val nestedIds = Seq("s.qty", "s.inner", "s.inner.price",
      "xs.element", "kv.key", "kv.value").map(ids)
    assert(nestedIds.forall(_ > 5), s"nested ids not past top-level: $ids")
    assert(ids.values.toSeq.distinct.size == ids.size, "duplicate ids")
    assert(m.lastColumnId == ids.values.max)
    // read round-trips values
    val back = IcebergLog.read(spark, table)
    assert(back.count() == 4)
    val r = back.filter(col("id") === 4L).select(
      col("s.qty"), col("s.inner.price"), size(col("xs")),
      col("kv")("k4")).head()
    assert(r.getInt(0) == 40 && r.getDouble(1) == 4.5 &&
      r.getInt(2) == 3 && r.getInt(3) == 4)
  }

  test("struct-only schema: parquet footers carry field ids at EVERY depth; list/map schemas carry none") {
    import spark.implicits._
    def footerIds(table: String): Set[(String, Int)] = {
      val conf = spark.sessionState.newHadoopConf()
      graft.sinks.IcebergLog.clearManifestCache()
      val files = Files.walk(Paths.get(table, "data")).iterator()
      val out = scala.collection.mutable.Set.empty[(String, Int)]
      files.forEachRemaining { p =>
        if (p.toString.endsWith(".parquet")) {
          val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(p.toString), conf))
          try {
            val md = rd.getFooter.getFileMetaData.getSchema
            def walk(prefix: String, g: org.apache.parquet.schema.GroupType): Unit =
              g.getFields.forEach { f =>
                val name = if (prefix.isEmpty) f.getName else s"$prefix.${f.getName}"
                if (f.getId != null) out += name -> f.getId.intValue()
                if (!f.isPrimitive) walk(name, f.asGroupType())
              }
            walk("", md)
          } finally rd.close()
        }
      }
      out.toSet
    }
    // struct-only: ids at both depths
    val t1 = tmp()
    val df1 = Seq((1L, 2, 3.0)).toDF("id", "q", "p")
      .select(col("id"), struct(col("q"), col("p")).as("s"))
    IcebergLog.writeBatch(df1, t1)
    val ids1 = footerIds(t1)
    val declared = latestMeta(t1).fieldIdPaths
    assert(ids1.contains("id" -> declared("id")))
    assert(ids1.contains("s" -> declared("s")))
    assert(ids1.contains("s.q" -> declared("s.q")))
    assert(ids1.contains("s.p" -> declared("s.p")))
    // list-bearing: NO ids anywhere (all-or-nothing binding)
    val t2 = tmp()
    IcebergLog.writeBatch(Seq((1L, Seq(1, 2))).toDF("id", "xs"), t2)
    assert(footerIds(t2).isEmpty)
    // name mapping covers the nested paths instead
    val nm = latestMeta(t2).properties("schema.name-mapping.default")
    val nmNode = mapper.readTree(nm)
    val xsEntry = (0 until nmNode.size()).map(nmNode.get)
      .find(_.get("names").get(0).asText() == "xs").get
    assert(xsEntry.get("fields").get(0).get("names").get(0).asText() == "element")
    assert(xsEntry.get("fields").get(0).get("field-id").asInt() ==
      latestMeta(t2).fieldIdPaths("xs.element"))
  }

  test("footer metrics key nested leaves by DECLARED path ids (value/null counts, bounds)") {
    val table = tmp()
    IcebergLog.writeBatch(nestedDf, table)
    val m = latestMeta(table)
    val ids = m.fieldIdPaths
    val live = IcebergLog.liveFiles(table, None).filter(_.status != 2)
    assert(live.nonEmpty)
    val f = live.head
    assert(f.valueCounts.contains(ids("s.qty")),
      s"no value count for s.qty in ${f.valueCounts}")
    assert(f.valueCounts.contains(ids("s.inner.price")))
    assert(f.valueCounts.contains(ids("xs.element")))
    assert(f.valueCounts.contains(ids("kv.key")) &&
      f.valueCounts.contains(ids("kv.value")))
    // bounds present for nested numeric leaves
    assert(f.lowerBounds.contains(ids("s.qty")))
  }

  test("nested DML: CoW DELETE + UPDATE with nested predicate and nested SET (old-row semantics)") {
    val table = tmp()
    IcebergLog.writeBatch(nestedDf, table)
    IcebergLog.deleteWhere(spark, table, "s.qty > 35")
    IcebergLog.updateWhere(spark, table,
      Seq("s.inner.price" -> "s.inner.price * 2", "tag" -> "'u'"),
      Some("s.qty >= 20"))
    val rows = IcebergLog.read(spark, table)
      .select(col("id"), col("tag"), col("s.qty"), col("s.inner.price"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, "a", 10, 1.5), (2L, "u", 20, 5.0), (3L, "u", 30, 7.0)))
  }

  test("nested DML merge-on-read (v3 DVs): nested SET postimages, retractions by position") {
    val table = tmp()
    import spark.implicits._
    val df = Seq((1L, 10, 1.0), (2L, 20, 2.0), (3L, 30, 3.0))
      .toDF("id", "q", "p")
      .select(col("id"), struct(col("q"), col("p")).as("s"))
    IcebergLog.writeBatch(df, table)
    IcebergLog.setTableProperties(spark, table, Map(
      "format-version" -> "3",
      "write.delete.mode" -> "merge-on-read",
      "write.update.mode" -> "merge-on-read"))
    IcebergLog.updateWhere(spark, table,
      Seq("s.p" -> "s.p * 10"), Some("s.q >= 20"))
    IcebergLog.deleteWhere(spark, table, "s.q = 30")
    val rows = IcebergLog.read(spark, table)
      .select(col("id"), col("s.q"), col("s.p")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 10, 1.0), (2L, 20, 20.0)))
  }

  test("RENAME of a struct column: descendants' paths move, ids stay, pre-rename files resolve by id at depth") {
    val table = tmp()
    import spark.implicits._
    val df = Seq((1L, 10, 1.0), (2L, 20, 2.0))
      .toDF("id", "q", "p").select(col("id"), struct(col("q"), col("p")).as("s"))
    IcebergLog.writeBatch(df, table)
    val before = latestMeta(table).fieldIdPaths
    IcebergLog.renameColumn(spark, table, "s", "meta")
    val after = latestMeta(table).fieldIdPaths
    assert(after("meta") == before("s"))
    assert(after("meta.q") == before("s.q"))
    assert(after("meta.p") == before("s.p"))
    // pre-rename files read under the NEW name, by field id
    val rows = IcebergLog.read(spark, table)
      .select(col("id"), col("meta.q")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 10), (2L, 20)))
    // DML against the new nested name still works post-rename
    IcebergLog.updateWhere(spark, table, Seq("meta.q" -> "meta.q + 1"),
      Some("id = 1"))
    assert(IcebergLog.read(spark, table).filter(col("id") === 1L)
      .select(col("meta.q")).head().getInt(0) == 11)
  }

  test("renamed-table reads leave session confs untouched; unrelated nested scans keep pruning (r17)") {
    import spark.implicits._
    val table = tmp()
    val df = Seq((1L, 10, 1.0), (2L, 20, 2.0)).toDF("id", "q", "p")
      .select(col("id"), struct(col("q"), col("p")).as("s"))
    IcebergLog.writeBatch(df, table)
    IcebergLog.renameColumn(spark, table, "s", "meta")
    spark.conf.set("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
    val idBefore = spark.conf.get("spark.sql.parquet.fieldId.read.enabled")
    // the renamed read is null-safe WITH session pruning on: the
    // FencedScan compiles the id-resolving plan under its own scoped
    // confs, and the RDD fence keeps any outer optimizer from
    // re-pruning the stamped scan into nulls — even composed under a
    // join planned by the (pruning-on) session
    val renamed = IcebergLog.read(spark, table)
    val other = Seq((1L, "x"), (2L, "y")).toDF("id", "t")
    val joined = renamed.join(other, "id").select(col("id"), col("meta.q"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(joined.toSeq == Seq((1L, 10), (2L, 20)), joined.mkString(","))
    // ...and the confs did NOT leak: still exactly as before the read
    assert(spark.conf.get(
      "spark.sql.optimizer.nestedSchemaPruning.enabled") == "true")
    assert(spark.conf.get(
      "spark.sql.parquet.fieldId.read.enabled") == idBefore)
    // an UNRELATED nested parquet scan in the same session still prunes:
    // selecting one leaf reads a one-leaf struct, not the whole struct
    val plainDir = tmp()
    df.write.mode("overwrite").parquet(plainDir)
    val q = spark.read.parquet(plainDir).select(col("s.q"))
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("struct<s:struct<q:int>>"),
      s"nested pruning lost after a renamed-table read:\n$scan")
  }

  test("NESTED field rename/drop/add (dotted paths) under field-id identity (r16)") {
    val table = tmp()
    import spark.implicits._
    val df = Seq((1L, 10, 1.0, "a"), (2L, 20, 2.0, "b")).toDF("id", "q", "p", "t")
      .select(col("id"),
        struct(col("q"), struct(col("p"), col("t")).as("in")).as("s"))
    IcebergLog.writeBatch(df, table)
    val before = latestMeta(table).fieldIdPaths
    // rename a LEAF inside a struct: id unchanged, descendants move
    assert(IcebergLog.renameColumn(spark, table, "s.q", "qty").isDefined)
    // rename a MID-LEVEL struct: its children's paths move with it
    assert(IcebergLog.renameColumn(spark, table, "s.in", "meta").isDefined)
    val after = latestMeta(table).fieldIdPaths
    assert(after("s.qty") == before("s.q"))
    assert(after("s.meta") == before("s.in"))
    assert(after("s.meta.p") == before("s.in.p"))
    // pre-rename files resolve by id at every depth
    val r = IcebergLog.read(spark, table)
      .select(col("id"), col("s.qty"), col("s.meta.t")).collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getString(2))).sortBy(_._1)
    assert(r.toSeq == Seq((1L, 10, "a"), (2L, 20, "b")))
    // DROP a nested leaf: survivors keep ids; the id is retired
    assert(IcebergLog.dropColumns(spark, table, Seq("s.meta.t")).isDefined)
    val m2 = latestMeta(table)
    assert(!m2.fieldIdPaths.contains("s.meta.t"))
    assert(m2.lastColumnId >= before("s.in.t"))
    // ADD a nested field: fresh id past last-column-id, old rows null
    assert(IcebergLog.addColumns(spark, table,
      Seq("s.bonus" -> org.apache.spark.sql.types.LongType)).isDefined)
    val m3 = latestMeta(table)
    assert(m3.fieldIdPaths("s.bonus") > m2.lastColumnId)
    val r2 = IcebergLog.read(spark, table)
      .select(col("id"), col("s.bonus")).collect().sortBy(_.getLong(0))
    assert(r2.forall(_.isNullAt(1)))
    // re-ADD the dropped nested name: FRESH id — old bytes stay dead
    assert(IcebergLog.addColumns(spark, table,
      Seq("s.meta.t" -> org.apache.spark.sql.types.StringType)).isDefined)
    assert(latestMeta(table).fieldIdPaths("s.meta.t") != before("s.in.t"))
    val r3 = IcebergLog.read(spark, table)
      .select(col("s.meta.t")).collect()
    assert(r3.forall(_.isNullAt(0)), r3.mkString(","))
    // DML still binds through the evolved nested names
    assert(IcebergLog.updateWhere(spark, table,
      Seq("s.qty" -> "s.qty + 5"), Some("s.meta.p = 1.0")).isDefined)
    assert(IcebergLog.read(spark, table).filter(col("id") === 1L)
      .select(col("s.qty")).head().getInt(0) == 15)
    // (pre-r17 a manual pruning-conf restore lived here; reads no
    // longer mutate session confs)
    // guards: renaming through a non-struct refuses; emptying refuses
    val e1 = intercept[IllegalArgumentException](
      IcebergLog.renameColumn(spark, table, "id.x", "y"))
    assert(e1.getMessage.contains("struct"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      IcebergLog.dropColumns(spark, table, Seq("s.meta.p", "s.meta.t")))
    assert(e2.getMessage.contains("empty its struct"), e2.getMessage)
  }

  test("v3 ROW LINEAGE composes with nested schemas: ids survive a nested-SET UPDATE") {
    val table = tmp()
    import spark.implicits._
    val df = Seq((0L, 10, 1.0), (1L, 20, 2.0), (2L, 30, 3.0))
      .toDF("id", "q", "p")
      .select(col("id"), struct(col("q"), col("p")).as("s")).coalesce(1)
    IcebergLog.writeBatch(Seq((100L, 5, 0.5)).toDF("id", "q", "p")
      .select(col("id"), struct(col("q"), col("p")).as("s")).coalesce(1), table)
    IcebergLog.setTableProperties(spark, table, Map("format-version" -> "3"))
    IcebergLog.writeBatch(df, table)
    def lineage(): Map[Long, Option[Long]] =
      IcebergLog.readWithLineage(spark, table).collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val l1 = lineage()
    assert(l1(0L).contains(0L) && l1(2L).contains(2L) && l1(100L).isEmpty, l1)
    // CoW UPDATE with a nested predicate AND a nested SET: the touched
    // file rewrites with BOTH the new struct value and materialized ids
    assert(IcebergLog.updateWhere(spark, table,
      Seq("s.p" -> "s.p * 10"), Some("s.q >= 20")).isDefined)
    val l2 = lineage()
    assert(l2(1L) == l1(1L) && l2(2L) == l1(2L) && l2(0L) == l1(0L), l2)
    assert(IcebergLog.read(spark, table)
      .filter(col("id") === 2L).select(col("s.p")).head().getDouble(0) == 30.0)
  }

  test("v3 lineage arming skips list/map schemas: DML/OPTIMIZE rewrites carry NO id-less lineage columns (r17)") {
    import spark.implicits._
    val table = tmp()
    def footerFieldNames(): Set[String] = {
      val conf = spark.sessionState.newHadoopConf()
      val files = Files.walk(Paths.get(table, "data")).iterator()
      val out = scala.collection.mutable.Set.empty[String]
      files.forEachRemaining { p =>
        if (p.toString.endsWith(".parquet")) {
          val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(p.toString), conf))
          try rd.getFooter.getFileMetaData.getSchema.getFields
            .forEach(f => out += f.getName)
          finally rd.close()
        }
      }
      out.toSet
    }
    IcebergLog.writeBatch(
      Seq((1L, 10, Seq(1, 2)), (2L, 20, Seq(3))).toDF("id", "q", "xs"), table)
    IcebergLog.setTableProperties(spark, table, Map("format-version" -> "3"))
    // list column ⇒ files carry NO parquet field ids, so a materialized
    // _row_id would be invisible to a spec-conformant id-resolving
    // reader (name mapping doesn't cover the reserved lineage fields) —
    // the DML cycle must take the LEGACY rewrite, not arm lineage
    assert(IcebergLog.updateWhere(spark, table,
      Seq("q" -> "q + 1"), Some("id = 1")).isDefined)
    assert(!footerFieldNames().contains("_row_id"),
      s"id-less lineage column materialized: ${footerFieldNames()}")
    IcebergLog.rewriteDataFiles(spark, table)
    assert(!footerFieldNames().contains("_row_id"),
      s"OPTIMIZE materialized an id-less lineage column")
    val rows = IcebergLog.read(spark, table)
      .select(col("id"), col("q")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 11), (2L, 20)))
  }

  test("RENAME refuses on list/map schemas (files carry no ids to resolve by)") {
    val table = tmp()
    import spark.implicits._
    IcebergLog.writeBatch(Seq((1L, Seq(1, 2))).toDF("id", "xs"), table)
    val e = intercept[IllegalArgumentException](
      IcebergLog.renameColumn(spark, table, "id", "id2"))
    assert(e.getMessage.contains("list/map"))
  }

  test("DROP of a struct column retires its leaf ids; re-added same name minting fresh ids reads old data as null") {
    val table = tmp()
    import spark.implicits._
    val df = Seq((1L, 10, 1.0)).toDF("id", "q", "p")
      .select(col("id"), struct(col("q"), col("p")).as("s"))
    IcebergLog.writeBatch(df, table)
    val before = latestMeta(table)
    val retired = before.fieldIdPaths.filter(_._1.startsWith("s")).values.toSet
    IcebergLog.dropColumns(spark, table, Seq("s"))
    val afterDrop = latestMeta(table)
    assert(!afterDrop.fieldIdPaths.keySet.exists(_.startsWith("s")))
    assert(afterDrop.lastColumnId >= retired.max)
    // re-ADD a struct of the same name: fresh ids, old bytes stay dead
    IcebergLog.addColumns(spark, table, Seq("s" ->
      StructType(Seq(StructField("q", IntegerType), StructField("p", DoubleType)))))
    val afterAdd = latestMeta(table)
    assert((afterAdd.fieldIdPaths.filter(_._1.startsWith("s")).values.toSet
      intersect retired).isEmpty, "a dropped id was re-minted")
    val r = IcebergLog.read(spark, table).select(col("id"), col("s")).head()
    assert(r.getLong(0) == 1L && r.isNullAt(1))
  }

  test("nested schema evolution: mergeSchema append adds a nested column with fresh leaf ids past last-column-id") {
    val table = tmp()
    import spark.implicits._
    IcebergLog.writeBatch(Seq((1L, "a")).toDF("id", "tag"), table)
    val lcBefore = latestMeta(table).lastColumnId
    val evolved = Seq((2L, "b", 5, 6.0)).toDF("id", "tag", "q", "p")
      .select(col("id"), col("tag"), struct(col("q"), col("p")).as("s"))
    IcebergLog.writeBatch(evolved, table, mergeSchema = true)
    val m = latestMeta(table)
    val ids = m.fieldIdPaths
    assert(ids("s") > lcBefore && ids("s.q") > ids("s") && ids("s.p") > ids("s"))
    val rows = IcebergLog.read(spark, table)
      .select(col("id"), col("s")).collect().sortBy(_.getLong(0))
    assert(rows(0).isNullAt(1)) // pre-evolution file reads null struct
    assert(rows(1).getStruct(1).getInt(0) == 5)
  }

  test("partitioned nested table: identity partition on a top-level primitive, nested payload rides along") {
    val table = tmp()
    IcebergLog.writeBatch(nestedDf, table, partitionBy = Seq("tag"))
    val rows = IcebergLog.read(spark, table, scanFilter = Some("tag = 'a'"))
      .select(col("id"), col("s.qty")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 10), (3L, 30)))
  }

  test("nested stats prune: manifest bounds on a nested LEAF skip whole files (r16)") {
    val table = tmp()
    import spark.implicits._
    // two files with disjoint s.qty ranges: [10,20] and [30,40]
    val mk = (rows: Seq[(Long, Int, Double)]) => rows.toDF("id", "qty", "p")
      .select(col("id"), struct(col("qty"), col("p")).as("s")).coalesce(1)
    IcebergLog.writeBatch(mk(Seq((1L, 10, 1.0), (2L, 20, 2.0))), table)
    IcebergLog.writeBatch(mk(Seq((3L, 30, 3.0), (4L, 40, 4.0))), table)
    // the nested-leaf predicate prunes to ONE file via the manifest
    // bounds keyed by the leaf's declared field id
    val (kept, total) = IcebergLog.planFiles(spark, table, None,
      Some("s.qty >= 30"))
    assert(total == 2 && kept.size == 1, s"kept ${kept.size} of $total")
    val rows = IcebergLog.read(spark, table, scanFilter = Some("s.qty >= 30"))
      .select(col("id")).collect().map(_.getLong(0)).sorted
    assert(rows.toSeq == Seq(3L, 4L))
    // deeper nesting prunes the same way; an unprunable nested ref
    // (unknown path) conservatively keeps everything
    val (keptAll, _) = IcebergLog.planFiles(spark, table, None,
      Some("s.qty >= 0"))
    assert(keptAll.size == 2)
  }

  test("OPTIMIZE (rewriteDataFiles) preserves nested values and nested footer ids") {
    val table = tmp()
    IcebergLog.writeBatch(nestedDf.repartition(4, col("id")), table)
    IcebergLog.rewriteDataFiles(spark, table)
    val rows = IcebergLog.read(spark, table)
      .select(col("id"), col("s.inner.price"), col("xs"), col("kv"))
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 4)
    assert(rows(3).getDouble(1) == 4.5)
    assert(rows(3).getSeq[Long](2) == Seq(4L, 5L, 6L))
  }

  test("SQL face: UPDATE t SET s.qty = … on an iceberg table goes through (refusal lifted)") {
    val table = tmp()
    import spark.implicits._
    val df = Seq((1L, 10, 1.0), (2L, 20, 2.0)).toDF("id", "q", "p")
      .select(col("id"), struct(col("q"), col("p")).as("s"))
    IcebergLog.writeBatch(df, table)
    val sqlFace = new graft.sql.Pipeline(spark)
    sqlFace.run(
      s"""CREATE TABLE t (id BIGINT, s STRUCT<q INT, p DOUBLE>) WITH (
         |  connector = 'iceberg', path = '$table', type = 'source');
         |UPDATE t SET s.q = s.q + 100 WHERE id = 2;
         |ALTER TABLE t ADD COLUMNS (s.z BIGINT);
         |ALTER TABLE t RENAME COLUMN s.p TO price;""".stripMargin)
    val r = IcebergLog.read(spark, table).filter(col("id") === 2L)
      .select(col("s.q"), col("s.z"), col("s.price")).head()
    assert(r.getInt(0) == 120 && r.isNullAt(1) && r.getDouble(2) == 2.0)
  }
}
