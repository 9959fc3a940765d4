package graft

import graft.sinks.{DeltaLog, IcebergLog}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import java.nio.file.Files

/** Append-time schema evolution on both table formats — and the guard it
  * replaces: before r10 a Delta append whose schema drifted silently
  * REPLACED the table metaData (an upstream refactor could quietly
  * narrow a 100 TB table). Now drift is an error unless the writer opts
  * into merge_schema, evolution is append-only (existing columns keep
  * position and type — what keeps Iceberg's position-derived field ids
  * stable), and ALTER TABLE ADD COLUMNS surfaces it in SQL.
  */
class SchemaEvolutionSpec extends SparkSpec {

  private def tmpTable(name: String): String =
    Files.createTempDirectory(name).toString

  test("delta: drifted append is an ERROR, not a silent metaData replace") {
    import spark.implicits._
    val table = tmpTable("delta_drift")
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), table)
    // extra column without merge_schema → rejected
    val e1 = intercept[IllegalArgumentException] {
      DeltaLog.writeBatch(Seq((2L, "b", 9L)).toDF("id", "v", "extra"), table) }
    assert(e1.getMessage.contains("merge_schema"))
    // missing column → rejected
    val e2 = intercept[IllegalArgumentException] {
      DeltaLog.writeBatch(Seq(3L).toDF("id"), table) }
    assert(e2.getMessage.contains("missing columns"))
    // type change on an existing column → rejected even WITH merge_schema
    val e3 = intercept[IllegalArgumentException] {
      DeltaLog.writeBatch(Seq((4L, 5L)).toDF("id", "v"), table, mergeSchema = true) }
    assert(e3.getMessage.contains("type drift"))
    // partitioning change → rejected
    val e4 = intercept[IllegalArgumentException] {
      DeltaLog.writeBatch(Seq((5L, "c")).toDF("id", "v"), table,
        partitionBy = Seq("v")) }
    assert(e4.getMessage.contains("partitioned"))
    // the table is untouched by all four attempts
    assert(DeltaLog.snapshot(spark, table).get.version == 0L)
    assert(DeltaLog.read(spark, table).count() == 1)
  }

  test("delta: merge_schema appends nullable columns; old files read null; identity is stable") {
    import spark.implicits._
    val table = tmpTable("delta_evolve")
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), table)
    val id0 = DeltaLog.snapshot(spark, table).get.metaId
    assert(DeltaLog.writeBatch(Seq((2L, "b", 9L)).toDF("id", "v", "extra"), table,
      mergeSchema = true).contains(1L))
    val s = DeltaLog.snapshot(spark, table).get
    assert(s.schema.fieldNames.toSeq == Seq("id", "v", "extra"))
    assert(s.schema("extra").nullable)
    // metaData.id is table IDENTITY — unchanged across evolution
    assert(s.metaId == id0)
    val rows = DeltaLog.read(spark, table).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2))))
    assert(rows.toSeq == Seq((1L, "a", None), (2L, "b", Some(9L))))
    // a later batch MISSING the evolved column is fine under merge_schema
    assert(DeltaLog.writeBatch(Seq((3L, "c")).toDF("id", "v"), table,
      mergeSchema = true).contains(2L))
    assert(DeltaLog.read(spark, table).filter("extra IS NULL").count() == 2)
    // checkpoint round-trip carries the evolved schema
    (3L to 10L).foreach(i =>
      DeltaLog.writeBatch(Seq((i, "x", i)).toDF("id", "v", "extra"), table))
    DeltaLog.clearSnapshotCache()
    assert(DeltaLog.snapshot(spark, table).get.schema.fieldNames.toSeq ==
      Seq("id", "v", "extra"))
  }

  test("delta addColumns: metaData-only version; stats pruning still serves the new column") {
    import spark.implicits._
    val table = tmpTable("delta_addcol")
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), table)
    assert(DeltaLog.addColumns(spark, table, Seq("score" -> LongType)).contains(1L))
    assert(DeltaLog.read(spark, table).schema.fieldNames.toSeq == Seq("id", "v", "score"))
    assert(DeltaLog.read(spark, table).filter("score IS NULL").count() == 1)
    intercept[IllegalArgumentException] {
      DeltaLog.addColumns(spark, table, Seq("id" -> LongType)) }
    // writes to the new column land with stats: a disjoint filter prunes
    // the NEW file, while the pre-evolution file (no stats for the
    // column) is kept conservatively — never wrongly skipped
    DeltaLog.writeBatch(Seq((2L, "b", 100L)).toDF("id", "v", "score"), table)
    val (kept, total) = DeltaLog.planFiles(spark, table, scanFilter = Some("score > 100"))
    assert(total == 2 && kept.size == 1, "new file pruned by its score bounds")
    assert(DeltaLog.planFiles(spark, table, scanFilter = Some("score = 100"))._1.size == 2,
      "pre-evolution file kept conservatively (missing stats never skip)")
  }

  test("iceberg: drifted append is an ERROR; merge_schema grows the schemas history") {
    import spark.implicits._
    val table = tmpTable("ice_evolve")
    IcebergLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), table)
    val e = intercept[IllegalArgumentException] {
      IcebergLog.writeBatch(Seq((2L, "b", 9L)).toDF("id", "v", "extra"), table) }
    assert(e.getMessage.contains("merge_schema"))
    assert(IcebergLog.writeBatch(Seq((2L, "b", 9L)).toDF("id", "v", "extra"), table,
      mergeSchema = true).isDefined)
    val m = IcebergLog.current(table).get
    assert(m.schema.fieldNames.toSeq == Seq("id", "v", "extra"))
    assert(m.currentSchemaId == 1)
    // schemas is an append-only history: both schemas retained
    assert(m.node.get("schemas").size() == 2)
    val rows = IcebergLog.read(spark, table).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2))))
    assert(rows.toSeq == Seq((1L, "a", None), (2L, "b", Some(9L))))
    // metrics for the evolved column prune the NEW file (field id =
    // position+1 stays stable because evolution only appends); the
    // pre-evolution file has no metrics for it → kept conservatively
    val (kept, total) = IcebergLog.planFiles(spark, table, None, Some("extra > 9"))
    assert(total == 2 && kept.size == 1, "new file pruned by its extra bounds")
    assert(IcebergLog.planFiles(spark, table, None, Some("extra = 9"))._1.size == 2,
      "pre-evolution file kept conservatively (missing metrics never skip)")
  }

  test("iceberg addColumns: schemas history entry + empty snapshot; batch column ORDER may differ") {
    import spark.implicits._
    val table = tmpTable("ice_addcol")
    IcebergLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), table)
    assert(IcebergLog.addColumns(spark, table,
      Seq("score" -> LongType)).isDefined)
    val m = IcebergLog.current(table).get
    assert(m.schema.fieldNames.toSeq == Seq("id", "v", "score"))
    intercept[IllegalArgumentException] {
      IcebergLog.addColumns(spark, table, Seq("v" -> LongType)) }
    // a batch whose column order differs from the table still stats
    // against TABLE positions (field ids must not follow batch order):
    // a disjoint filter on score prunes the new file by its bounds
    IcebergLog.writeBatch(
      Seq((7L, 2L, "b")).toDF("score", "id", "v"), table, mergeSchema = true)
    val (kept, total) = IcebergLog.planFiles(spark, table, None, Some("score > 7"))
    assert(total == 2 && kept.size == 1)
    assert(IcebergLog.read(spark, table).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2))))
      .toSeq == Seq((1L, "a", None), (2L, "b", Some(7L))))
  }

  test("post-evolution iceberg manifests stamp the CURRENT schema-id in their avro metadata") {
    import spark.implicits._
    val table = tmpTable("ice_manifest_schemaid")
    IcebergLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), table)
    IcebergLog.writeBatch(Seq((2L, "b", 9L)).toDF("id", "v", "extra"), table,
      mergeSchema = true)
    val m = IcebergLog.current(table).get
    assert(m.currentSchemaId == 1)
    val listPath = m.snapshots
      .find(_.get("snapshot-id").asLong == m.currentSnapshotId).get
      .get("manifest-list").asText
    // the newest ADDED manifest rides last in the fast-append list; its
    // OCF "schema-id" metadata must agree with the embedded "schema"
    // entry (and metadata.json's current-schema-id) — a reader resolving
    // the manifest schema BY ID would otherwise bind the pre-evolution one
    val manifest = IcebergLog.readManifestList(listPath).last.getString(0)
    val meta = ocfMeta(java.nio.file.Paths.get(manifest))
    assert(meta("schema-id") == "1", s"manifest stamped ${meta("schema-id")}")
    val embedded = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(meta("schema"))
    assert(embedded.get("schema-id").asInt == 1)
  }

  /** Minimal avro OCF header reader: the file-metadata string map. */
  private def ocfMeta(p: java.nio.file.Path): Map[String, String] = {
    val in = Files.newInputStream(p)
    try {
      def readVar(): Long = {
        var acc = 0L; var shift = 0; var b = in.read()
        while ((b & 0x80) != 0) { acc |= (b & 0x7fL) << shift; shift += 7; b = in.read() }
        acc |= (b & 0x7fL) << shift
        (acc >>> 1) ^ -(acc & 1)
      }
      def readBytes(): Array[Byte] = {
        val n = readVar().toInt
        val a = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val r = in.read(a, off, n - off); require(r > 0, "EOF in OCF meta"); off += r
        }
        a
      }
      require(in.skip(4) == 4)
      val out = Map.newBuilder[String, String]
      var n = readVar()
      while (n != 0) {
        if (n < 0) { readVar(); n = -n }
        (0L until n).foreach { _ =>
          out += (new String(readBytes(), "UTF-8") -> new String(readBytes(), "UTF-8"))
        }
        n = readVar()
      }
      out.result()
    } finally in.close()
  }

  test("ALTER TABLE ADD COLUMNS SQL verb evolves both formats; later statements see the new schema") {
    import spark.implicits._
    val dt = tmpTable("sql_alter_delta")
    val it = tmpTable("sql_alter_ice")
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), dt)
    IcebergLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), it)
    new sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE d (id BIGINT, v TEXT) WITH (
         |  connector='delta', path='$dt', format='parquet', type='sink');
         |CREATE TABLE i (id BIGINT, v TEXT) WITH (
         |  connector='iceberg', path='$it', format='parquet', type='sink');
         |ALTER TABLE d ADD COLUMNS (score BIGINT);
         |ALTER TABLE i ADD COLUMN score BIGINT;
         |UPDATE d SET score = id * 10;
         |UPDATE i SET score = id * 10;""".stripMargin)
    assert(DeltaLog.read(spark, dt).select("id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 10L)))
    assert(IcebergLog.read(spark, it).select("id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 10L)))
    // existing column rejected at plan time; non-table-format rejected
    assert(intercept[IllegalArgumentException] {
      new sql.Pipeline(spark, streaming = false).plan(
        s"""CREATE TABLE d (id BIGINT, v TEXT) WITH (
           |  connector='delta', path='$dt', format='parquet', type='sink');
           |ALTER TABLE d ADD COLUMNS (v TEXT);""".stripMargin)
    }.getMessage.contains("already exists"))
    assert(intercept[IllegalArgumentException] {
      new sql.Pipeline(spark, streaming = false).run(
        s"""CREATE TABLE x (id BIGINT) WITH (connector='blackhole', type='sink');
           |ALTER TABLE x ADD COLUMNS (y BIGINT);""".stripMargin)
    }.getMessage.contains("delta"))
  }

  test("nested nullability relaxes ONE WAY: non-null batch into nullable table ok; nullable batch into required table refused (r17)") {
    import spark.implicits._
    // struct() over toDF-int columns is non-nullable; when() without
    // otherwise makes the nested field nullable
    def reqDf(id: Long, q: Int) = Seq((id, q)).toDF("id", "q")
      .select(col("id"), struct(col("q")).as("s"))
    def nullableDf(id: Long, q: Int) = Seq((id, q)).toDF("id", "q")
      .select(col("id"), struct(when(col("q") >= 0, col("q")).as("q")).as("s"))
    for (fmt <- Seq("delta", "iceberg")) {
      def write(df: org.apache.spark.sql.DataFrame, t: String) = fmt match {
        case "delta" => DeltaLog.writeBatch(df, t); ()
        case _ => IcebergLog.writeBatch(df, t); ()
      }
      // direction 1: table nested field REQUIRED, batch nullable → the
      // append would admit nulls into a required column with no
      // row-level check — refused
      val t1 = tmpTable(s"${fmt}_req")
      write(reqDf(1L, 10), t1)
      val e = intercept[IllegalArgumentException](write(nullableDf(2L, 20), t1))
      assert(e.getMessage.contains("nullability"), s"$fmt: ${e.getMessage}")
      // direction 2: table nested field NULLABLE, batch non-null → fine
      val t2 = tmpTable(s"${fmt}_nullable")
      write(nullableDf(1L, 10), t2)
      write(reqDf(2L, 20), t2)
      val n = fmt match {
        case "delta" => DeltaLog.read(spark, t2).count()
        case _ => IcebergLog.read(spark, t2).count()
      }
      assert(n == 2L, s"$fmt: $n")
      // TOP-LEVEL columns: declared nullability alone does NOT refuse
      // (every file-sourced batch is declared nullable) — instead a
      // ROW-LEVEL guard fails the write on the first ACTUAL null
      // (r17 review; the delta-spark invariant behavior)
      val t3 = tmpTable(s"${fmt}_toplevel")
      write(Seq((1L, 10)).toDF("id", "q"), t3) // both non-nullable
      val schemaN = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", LongType,
          nullable = true),
        org.apache.spark.sql.types.StructField("q",
          org.apache.spark.sql.types.IntegerType, nullable = false)))
      // declared-nullable but actually non-null: lands
      write(spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(2L, 20)), schemaN), t3)
      // an ACTUAL null in the required column: the write job fails
      def messages(t: Throwable): String =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
      val e3 = intercept[Exception](write(spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(null, 30)),
        schemaN), t3))
      assert(messages(e3).contains("required column id"),
        s"$fmt: ${messages(e3)}")
      val n3 = fmt match {
        case "delta" => DeltaLog.read(spark, t3).count()
        case _ => IcebergLog.read(spark, t3).count()
      }
      assert(n3 == 2L, s"$fmt: $n3")
    }
  }
}
