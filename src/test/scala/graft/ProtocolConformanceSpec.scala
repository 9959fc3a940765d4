package graft

import graft.formats.AvroCodec
import graft.sinks.{Cdf, DeltaLog, IcebergLog}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Protocol-conformance pins: the exact wire fields third-party readers
  * are known to require, asserted against the BYTES on disk (not our own
  * reader's view of them). The container has no external Delta/Iceberg
  * reader (zero egress), so these specs are the stand-in for interop
  * evidence: each row pins a field a real reader resolves by name/id.
  *
  * First members (Iceberg v2 spec, "Manifests" + "Equality Delete
  * Files"): `data_file.equality_ids` (field 135, REQUIRED for content=2
  * entries), global delete manifests under an unpartitioned spec, and
  * decode compatibility with pre-r12 manifests that lack field 135.
  */
class ProtocolConformanceSpec extends SparkSpec {

  private def tmpTable(): String =
    Files.createTempDirectory("iceberg_conf").toString

  /** OCF header metadata of an avro file (schema JSON and friends). */
  private def ocfMeta(path: java.nio.file.Path): Map[String, String] = {
    var captured = Map.empty[String, String]
    val in = Files.newInputStream(path)
    try AvroCodec.readOcfResolving(in, m => { captured = m; StructType(Nil) })
    finally in.close()
    captured
  }

  test("equality-delete manifest bytes carry the spec's field ids (135/136) and ride spec 1") {
    import spark.implicits._
    val table = tmpTable()
    IcebergLog.writeBatch(
      Seq((1L, 10L, 0L), (2L, 20L, 1L)).toDF("id", "v", "p"),
      table, partitionBy = Seq("p"))
    IcebergLog.setTableProperties(spark, table,
      Map("write.upsert.enabled" -> "true"))
    IcebergLog.upsertAppend(spark, table,
      Seq((1L, 11L, 0L, false)).toDF("id", "v", "p", "__graft_deleted"),
      Seq("id"), checkUnique = true)
    val m = IcebergLog.current(table).get
    val snap = m.snapshots.find(_.get("snapshot-id").asLong() == m.currentSnapshotId).get
    val delManifest = IcebergLog.readManifestList(snap.get("manifest-list").asText())
      .filter(_.getInt(3) == 1).map(_.getString(0))
    assert(delManifest.size == 1)
    val meta = ocfMeta(Paths.get(delManifest.head))
    val schemaJson = meta("avro.schema")
    // the ids a spec-conformant reader resolves BY NUMBER
    for (pin <- Seq(
        "\"name\":\"equality_ids\"", "\"field-id\":135", "\"element-id\":136",
        "\"field-id\":134" /* content */, "\"field-id\":100" /* file_path */,
        "\"field-id\":109" /* value_counts */, "\"field-id\":125", "\"field-id\":128"))
      assert(schemaJson.contains(pin), s"manifest schema missing $pin")
    // a manifest has ONE partition spec; global deletes ride the
    // unpartitioned one — and its embedded spec says so
    assert(meta("partition-spec-id") == "1")
    assert(meta("partition-spec") == "[]")
    assert(meta("content") == "deletes")
    assert(meta("format-version") == "2")
    // the DATA manifests still ride the table's identity spec
    val dataManifest = IcebergLog.readManifestList(snap.get("manifest-list").asText())
      .filter(_.getInt(3) == 0).map(_.getString(0))
    assert(dataManifest.nonEmpty)
    val dMeta = ocfMeta(Paths.get(dataManifest.head))
    assert(dMeta("partition-spec-id") == "0")
    assert(dMeta("partition-spec").contains("\"name\":\"p\""))
    // metadata.json lists both specs, default stays 0
    assert(m.node.get("default-spec-id").asInt() == 0)
    val specs = m.node.get("partition-specs")
    assert(specs.size() == 2 && specs.get(1).get("spec-id").asInt() == 1)
  }

  test("pre-r12 manifests (no equality_ids on the wire) decode and normalize to the current shape") {
    val partType = StructType(Seq(StructField("p", LongType, nullable = true)))
    val legacyType = IcebergLog.manifestEntryType(partType, withEqIds = false)
    val legacyJson = IcebergLog.manifestEntrySchemaJson(partType, withEqIds = false)
    assert(!legacyJson.contains("equality_ids"))
    val entry = Row(1, 7L, 3L, 3L,
      Row(0, "/t/data/p=0/x.parquet", "PARQUET", Row(0L), 5L, 100L,
        Seq(Row(1, 5L), Row(2, 5L)), null, null, null))
    val p = Files.createTempFile("legacy_manifest", ".avro")
    val out = Files.newOutputStream(p)
    try AvroCodec.writeOcf(out, legacyType, Iterator(entry),
      schemaJsonOverride = Some(legacyJson),
      extraMeta = Seq("partition-spec-id" -> "0", "format-version" -> "2",
        "content" -> "data"))
    finally out.close()
    // the reader resolves the WRITER's 10-field shape from the embedded
    // schema and pads — callers always see the widest (14-field: eq_ids
    // + the r13 v3 deletion-vector triple) struct
    val rows = IcebergLog.readEntries(p.toString, partType)
    assert(rows.size == 1)
    val df = rows.head.getStruct(4)
    assert(df.size == 14, s"expected padded 14-field data_file, got ${df.size}")
    assert(df.get(10) == null, "legacy entries carry null equality_ids")
    assert(df.get(11) == null && df.get(12) == null && df.get(13) == null,
      "non-v3 entries carry null DV fields")
    assert(df.getString(1) == "/t/data/p=0/x.parquet" && df.getLong(4) == 5L)
    // and a CURRENT manifest round-trips the field intact
    val freshType = IcebergLog.manifestEntryType(partType)
    val fresh = Row(1, 7L, 3L, 3L,
      Row(2, "/t/data/eqdelete-y.parquet", "PARQUET", Row(null), 2L, 50L,
        Seq(Row(1, 2L)), null, null, null, Seq(1)))
    val p2 = Files.createTempFile("fresh_manifest", ".avro")
    val out2 = Files.newOutputStream(p2)
    try AvroCodec.writeOcf(out2, freshType, Iterator(fresh),
      schemaJsonOverride = Some(IcebergLog.manifestEntrySchemaJson(partType)),
      extraMeta = Seq("partition-spec-id" -> "0", "format-version" -> "2",
        "content" -> "deletes"))
    finally out2.close()
    val back = IcebergLog.readEntries(p2.toString, partType).head.getStruct(4)
    assert(back.get(10) == Seq(1), s"equality_ids round-trip, got ${back.get(10)}")
  }

  test("a mixed table (pre-r12 delete manifest alongside current ones) reads correctly") {
    import spark.implicits._
    // simulate an r11-written table: rewrite the CURRENT eq-delete
    // manifest in the legacy 10-field shape in place, then keep using
    // the table — reads must fall back to the value_counts derivation
    // (loudly) and later commits must carry the legacy manifest forward
    val table = tmpTable()
    IcebergLog.writeBatch(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v"),
      table)
    IcebergLog.setTableProperties(spark, table,
      Map("write.upsert.enabled" -> "true"))
    IcebergLog.upsertAppend(spark, table,
      Seq((2L, 21L, false)).toDF("id", "v", "__graft_deleted"),
      Seq("id"), checkUnique = true)
    val m = IcebergLog.current(table).get
    val snap = m.snapshots.find(_.get("snapshot-id").asLong() == m.currentSnapshotId).get
    val delManifests = IcebergLog.readManifestList(snap.get("manifest-list").asText())
      .filter(_.getInt(3) == 1)
    assert(delManifests.size == 1)
    val mfPath = Paths.get(delManifests.head.getString(0))
    val partType = StructType(Seq.empty[StructField]) // spec 1 (unpartitioned... table has no partitions so spec 0 is empty too)
    val entries = IcebergLog.readEntries(mfPath.toString, partType)
    // strip the 11th field back off and rewrite under the LEGACY schema
    val legacy = entries.map(e =>
      Row(e.get(0), e.get(1), e.get(2), e.get(3),
        Row.fromSeq(e.getStruct(4).toSeq.dropRight(1))))
    val tmp = Files.createTempFile(mfPath.getParent, "legacy", ".avro")
    val out = Files.newOutputStream(tmp)
    try AvroCodec.writeOcf(out,
      IcebergLog.manifestEntryType(partType, withEqIds = false),
      legacy.iterator,
      schemaJsonOverride =
        Some(IcebergLog.manifestEntrySchemaJson(partType, withEqIds = false)),
      extraMeta = Seq("partition-spec-id" -> "0", "format-version" -> "2",
        "content" -> "deletes"))
    finally out.close()
    Files.move(tmp, mfPath, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // NOTE: the manifest LIST records the old length; our reader streams
    // sequentially and ignores manifest_length, matching real readers'
    // tolerance. The derivation fallback must land on the key column.
    val dels = IcebergLog.deleteFiles(table, None)
    assert(dels.head.equalityIds.isEmpty && dels.head.eqFieldIds == Seq(1))
    val got = IcebergLog.read(spark, table).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 10L, 2L -> 21L, 3L -> 30L), s"got $got")
    // a follow-up upsert commits a CURRENT manifest next to the legacy
    // one; both apply
    IcebergLog.upsertAppend(spark, table,
      Seq((3L, 0L, true)).toDF("id", "v", "__graft_deleted"),
      Seq("id"), checkUnique = true)
    val got2 = IcebergLog.read(spark, table).as[(Long, Long)].collect().toMap
    assert(got2 == Map(1L -> 10L, 2L -> 21L), s"got $got2")
    val dels2 = IcebergLog.deleteFiles(table, None)
    assert(dels2.exists(_.equalityIds.contains(Seq(1))) &&
      dels2.exists(_.equalityIds.isEmpty))
  }

  test("iceberg parquet footers carry field ids; metadata carries the name mapping") {
    import spark.implicits._
    def footerIds(path: String): Map[String, Integer] = {
      val conf = spark.sessionState.newHadoopConf()
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(path), conf))
      try r.getFooter.getFileMetaData.getSchema.getFields.asScala
        .map(f => f.getName -> (if (f.getId == null) null else
          Integer.valueOf(f.getId.intValue()))).toMap
      finally r.close()
    }
    val table = tmpTable()
    IcebergLog.writeBatch(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), table)
    IcebergLog.setTableProperties(spark, table, Map(
      "write.delete.mode" -> "merge-on-read", "write.upsert.enabled" -> "true"))
    // DATA files: table field ids (spec: readers resolve columns BY id)
    val dataFile = IcebergLog.liveFiles(table, None).head.path
    assert(footerIds(dataFile) == Map("id" -> 1, "v" -> 2),
      s"data footer: ${footerIds(dataFile)}")
    // POSITION-delete files: the spec-reserved ids 2147483546/2147483545
    IcebergLog.deleteWhere(spark, table, "id = 1")
    val posFile = IcebergLog.deleteFiles(table, None).find(_.content == 1).get.path
    assert(footerIds(posFile) == Map(
      "file_path" -> 2147483546, "pos" -> 2147483545),
      s"pos-delete footer: ${footerIds(posFile)}")
    // EQUALITY-delete files: the key columns' table ids
    IcebergLog.upsertAppend(spark, table,
      Seq((2L, 21L, false)).toDF("id", "v", "__graft_deleted"), Seq("id"))
    val eqFile = IcebergLog.deleteFiles(table, None).find(_.content == 2).get.path
    assert(footerIds(eqFile) == Map("id" -> 1), s"eq-delete footer: ${footerIds(eqFile)}")
    // and the name-mapping property backs files that LACK ids
    val nm = IcebergLog.current(table).get.properties("schema.name-mapping.default")
    assert(nm == """[{"field-id":1,"names":["id"]},{"field-id":2,"names":["v"]}]""", nm)
    // reads unaffected by the stamped metadata
    assert(IcebergLog.read(spark, table).as[(Long, Long)].collect().toMap ==
      Map(2L -> 21L))
  }

  test("delta log bytes: protocol features, DV descriptor keys, cdc path shape") {
    import spark.implicits._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val table = Files.createTempDirectory("delta_conf").resolve("t").toString
    DeltaLog.writeBatch(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
      .coalesce(1), table, tableConf = Map(
      "delta.enableDeletionVectors" -> "true", Cdf.enableProp -> "true"))
    DeltaLog.deleteWhere(spark, table, "id = 2")
    def actions(v: Long): Seq[com.fasterxml.jackson.databind.JsonNode] =
      Files.readAllLines(Paths.get(table, "_delta_log", f"$v%020d.json"))
        .asScala.filter(_.nonEmpty).map(mapper.readTree).toSeq
    // commit 0: the protocol action third-party readers gate on —
    // table features (3/7) with BOTH feature lists naming the features
    val pr = actions(0L).find(_.has("protocol")).get.get("protocol")
    assert(pr.get("minReaderVersion").asInt() == 3 &&
      pr.get("minWriterVersion").asInt() == 7, pr.toString)
    def feats(k: String): Set[String] =
      (0 until pr.get(k).size()).map(pr.get(k).get(_).asText()).toSet
    assert(feats("readerFeatures") == Set("deletionVectors"), pr.toString)
    assert(feats("writerFeatures") == Set("deletionVectors", "changeDataFeed"),
      pr.toString)
    // commit 1 (the DV delete): the add's deletionVector descriptor
    // carries exactly the protocol's five keys, and the cdc action's
    // path lives under _change_data/
    val a1 = actions(1L)
    val dv = a1.find(_.has("add")).map(_.get("add").get("deletionVector")).get
    for (k <- Seq("storageType", "pathOrInlineDv", "sizeInBytes", "cardinality"))
      assert(dv.has(k), s"descriptor missing $k: $dv")
    assert(dv.get("cardinality").asLong() == 1L)
    assert(Seq("u", "i", "p").contains(dv.get("storageType").asText()))
    val cdc = a1.find(_.has("cdc")).map(_.get("cdc")).get
    assert(cdc.get("path").asText().startsWith(Cdf.changeDataDir + "/"),
      cdc.toString)
    assert(!cdc.get("dataChange").asBoolean(),
      "cdc actions must carry dataChange=false (protocol: readers that " +
        "do not understand cdc must not double-count)")
    // the remove/add pair of a DV commit: same path, dataChange=true
    val addPath = a1.find(_.has("add")).get.get("add").get("path").asText()
    val rmPath = a1.find(_.has("remove")).get.get("remove").get("path").asText()
    assert(addPath == rmPath, "a DV commit re-adds the SAME data file")
  }

  test("THIRD-PARTY manifests (full spec field set, own order) read by name resolution") {
    import spark.implicits._
    // the real v2 data_file layout iceberg-java/pyiceberg write: fields
    // we do not model are INTERLEAVED with ours (column_sizes 108 sits
    // between file_size_in_bytes 104 and value_counts 109;
    // nan_value_counts 137 between null_value_counts and lower_bounds;
    // key_metadata/split_offsets/sort_order_id after the bounds) — the
    // exact shape positional decode corrupts on and name resolution
    // must handle
    def kv(vt: DataType) = ArrayType(StructType(Seq(
      StructField("key", IntegerType, nullable = false),
      StructField("value", vt, nullable = false))), containsNull = false)
    val tpDataFile = StructType(Seq(
      StructField("content", IntegerType, nullable = false),
      StructField("file_path", StringType, nullable = false),
      StructField("file_format", StringType, nullable = false),
      StructField("partition", StructType(Seq.empty), nullable = false),
      StructField("record_count", LongType, nullable = false),
      StructField("file_size_in_bytes", LongType, nullable = false),
      StructField("column_sizes", kv(LongType), nullable = true),
      StructField("value_counts", kv(LongType), nullable = true),
      StructField("null_value_counts", kv(LongType), nullable = true),
      StructField("nan_value_counts", kv(LongType), nullable = true),
      StructField("lower_bounds", kv(BinaryType), nullable = true),
      StructField("upper_bounds", kv(BinaryType), nullable = true),
      StructField("key_metadata", BinaryType, nullable = true),
      StructField("split_offsets", ArrayType(LongType, containsNull = false), nullable = true),
      StructField("equality_ids", ArrayType(IntegerType, containsNull = false), nullable = true),
      StructField("sort_order_id", IntegerType, nullable = true)))
    val tpEntry = StructType(Seq(
      StructField("status", IntegerType, nullable = false),
      StructField("snapshot_id", LongType, nullable = true),
      StructField("sequence_number", LongType, nullable = true),
      StructField("file_sequence_number", LongType, nullable = true),
      StructField("data_file", tpDataFile, nullable = false)))

    // graft a third-party-shaped EQUALITY-delete manifest into a REAL
    // table and read THROUGH it: build the table + upsert, then rewrite
    // its delete manifest in the foreign shape carrying the same facts
    val table = tmpTable()
    IcebergLog.writeBatch(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v"),
      table)
    IcebergLog.setTableProperties(spark, table,
      Map("write.upsert.enabled" -> "true"))
    IcebergLog.upsertAppend(spark, table,
      Seq((2L, 21L, false)).toDF("id", "v", "__graft_deleted"), Seq("id"))
    val m = IcebergLog.current(table).get
    val snap = m.snapshots.find(_.get("snapshot-id").asLong() == m.currentSnapshotId).get
    val mfRow = IcebergLog.readManifestList(snap.get("manifest-list").asText())
      .filter(_.getInt(3) == 1).head
    val mfPath = Paths.get(mfRow.getString(0))
    val partType = StructType(Seq.empty[StructField])
    val ours = IcebergLog.readEntries(mfPath.toString, partType)
    val foreign = ours.map { e =>
      val df = e.getStruct(4)
      Row(e.get(0), e.get(1), e.get(2), e.get(3),
        Row(df.get(0), df.get(1), df.get(2), df.get(3), df.get(4), df.get(5),
          Seq(Row(1, 8L), Row(2, 8L)) /* column_sizes */,
          df.get(6), df.get(7),
          Seq(Row(2, 0L)) /* nan_value_counts */,
          df.get(8), df.get(9),
          Array[Byte](1, 2, 3) /* key_metadata */,
          Seq(4L) /* split_offsets */,
          df.get(10) /* equality_ids */,
          0 /* sort_order_id */))
    }
    val tmp = Files.createTempFile(mfPath.getParent, "foreign", ".avro")
    val out = Files.newOutputStream(tmp)
    // auto-derived schema (field names intact, no field-id props —
    // name resolution must not depend on them)
    try AvroCodec.writeOcf(out, tpEntry, foreign.iterator)
    finally out.close()
    Files.move(tmp, mfPath, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // the equality delete still reads: explicit equality_ids honored,
    // extra fields skipped, and the table returns the upserted state
    val dels = IcebergLog.deleteFiles(table, None)
    assert(dels.size == 1 && dels.head.content == 2 &&
      dels.head.equalityIds.contains(Seq(1)), s"got $dels")
    val got = IcebergLog.read(spark, table).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 10L, 2L -> 21L, 3L -> 30L), s"got $got")

    // third-party manifest LIST: extra nullable fields + foreign order
    val tpList = StructType(Seq(
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
      StructField("deleted_rows_count", LongType, nullable = false),
      StructField("partitions", ArrayType(StructType(Seq(
        StructField("contains_null", BooleanType, nullable = false),
        StructField("contains_nan", BooleanType, nullable = true),
        StructField("lower_bound", BinaryType, nullable = true),
        StructField("upper_bound", BinaryType, nullable = true))),
        containsNull = false), nullable = true),
      StructField("key_metadata", BinaryType, nullable = true)))
    val listPath = Paths.get(snap.get("manifest-list").asText())
    val listRows = IcebergLog.readManifestList(listPath.toString)
    val foreignList = listRows.map(r => Row.fromSeq(r.toSeq ++ Seq(
      Seq(Row(false, null, null, null)), null)))
    val tmpL = Files.createTempFile(listPath.getParent, "foreignL", ".avro")
    val outL = Files.newOutputStream(tmpL)
    try AvroCodec.writeOcf(outL, tpList, foreignList.iterator)
    finally outL.close()
    Files.move(tmpL, listPath, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val got2 = IcebergLog.read(spark, table).as[(Long, Long)].collect().toMap
    assert(got2 == Map(1L -> 10L, 2L -> 21L, 3L -> 30L), s"got $got2")
  }

  test("file: URI metadata paths (third-party writers) resolve; %XX decodes; remote authority refuses") {
    import spark.implicits._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val table = tmpTable()
    IcebergLog.writeBatch(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), table)
    IcebergLog.setTableProperties(spark, table,
      Map("write.delete.mode" -> "merge-on-read"))
    IcebergLog.deleteWhere(spark, table, "id = 1")
    // rewrite metadata.json + the manifest list with file:// URIs for
    // every manifest-list/manifest path — the form iceberg-java records
    val m = IcebergLog.current(table).get
    val metaPath = Paths.get(table, "metadata", s"v${m.version}.metadata.json")
    val root = mapper.readTree(Files.readAllBytes(metaPath))
      .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    val snaps = root.get("snapshots")
    (0 until snaps.size()).foreach { i =>
      val sn = snaps.get(i).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val lp = sn.get("manifest-list").asText()
      sn.put("manifest-list", "file://" + lp)
      // and inside each list, manifest paths become file: URIs too
      val rows = IcebergLog.readManifestList(lp)
      val uri = rows.map(r => org.apache.spark.sql.Row.fromSeq(
        ("file://" + r.getString(0)) +: r.toSeq.drop(1)))
      val tmp = Files.createTempFile(Paths.get(lp).getParent, "urilist", ".avro")
      val out = Files.newOutputStream(tmp)
      try graft.formats.AvroCodec.writeOcf(out,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("manifest_path",
            org.apache.spark.sql.types.StringType, nullable = false)) ++
          Seq("manifest_length" -> "long", "partition_spec_id" -> "int",
            "content" -> "int", "sequence_number" -> "long",
            "min_sequence_number" -> "long", "added_snapshot_id" -> "long",
            "added_files_count" -> "int", "existing_files_count" -> "int",
            "deleted_files_count" -> "int", "added_rows_count" -> "long",
            "existing_rows_count" -> "long", "deleted_rows_count" -> "long")
            .map { case (n, t) => org.apache.spark.sql.types.StructField(n,
              if (t == "long") org.apache.spark.sql.types.LongType
              else org.apache.spark.sql.types.IntegerType, nullable = false) }),
        uri.iterator)
      finally out.close()
      Files.move(tmp, Paths.get(lp), java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    Files.write(metaPath, root.toString.getBytes("UTF-8"))
    // the merge-on-read table reads THROUGH the URI forms
    val got = IcebergLog.read(spark, table).as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 20L), s"got $got")
    // remote authorities refuse loudly rather than misread
    val e = intercept[RuntimeException] {
      IcebergLog.readManifestList("file://otherhost/x.avro") }
    assert(e.getMessage.contains("remote authority"), e.getMessage)
    // %20 decodes (URI-encoded space in a path)
    val spaced = Files.createTempDirectory("uri dir")
    val f = spaced.resolve("x.txt"); Files.write(f, "hi".getBytes)
    assert(Files.exists(IcebergLog.localPath(
      "file://" + f.toString.replace(" ", "%20"))))
  }

  test("generic avro decode: enum, fixed, real maps, unions, named-type reuse") {
    // a foreign writer schema exercising every branch of the resolving
    // decoder that iceberg manifests do NOT use — hand-encoded bytes,
    // so the decode is pinned against the avro spec, not our writer
    def vint(n: Long): Array[Byte] = {
      var z = (n << 1) ^ (n >> 63)
      val b = scala.collection.mutable.ArrayBuffer.empty[Byte]
      while ((z & ~0x7fL) != 0) { b += ((z & 0x7f) | 0x80).toByte; z >>>= 7 }
      b += z.toByte
      b.toArray
    }
    def str(s0: String): Array[Byte] = vint(s0.length.toLong) ++ s0.getBytes("UTF-8")
    val writerSchema =
      """{"type":"record","name":"R","fields":[
        |{"name":"e","type":{"type":"enum","name":"E","symbols":["A","B","C"]}},
        |{"name":"f","type":{"type":"fixed","name":"F","size":4}},
        |{"name":"m","type":{"type":"map","values":"long"}},
        |{"name":"u","type":["null","string"]},
        |{"name":"ref","type":{"type":"record","name":"R2","fields":[{"name":"x","type":"int"}]}},
        |{"name":"ref2","type":"R2"}
        |]}""".stripMargin.replace("\n", "")
    val datum: Array[Byte] =
      vint(1) ++                       // enum index 1 = "B"
      Array[Byte](9, 8, 7, 6) ++       // fixed(4)
      vint(1) ++ str("k") ++ vint(5L) ++ vint(0) ++ // map {k: 5}
      vint(1) ++ str("hi") ++          // union branch 1 (string)
      vint(7) ++                       // ref.x
      vint(8)                          // ref2.x (named-type REUSE)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('O', 'b', 'j', 1))
    out.write(vint(1)) // one metadata entry
    out.write(str("avro.schema"))
    out.write(vint(writerSchema.getBytes("UTF-8").length.toLong))
    out.write(writerSchema.getBytes("UTF-8"))
    out.write(vint(0)) // end of metadata map
    val sync = new Array[Byte](16)
    out.write(sync)
    out.write(vint(1)) // one record in the block
    out.write(vint(datum.length.toLong))
    out.write(datum)
    out.write(sync)
    val target = StructType(Seq(
      StructField("e", StringType),
      StructField("f", BinaryType),
      StructField("m", org.apache.spark.sql.types.MapType(StringType, LongType)),
      StructField("u", StringType),
      StructField("ref", StructType(Seq(StructField("x", IntegerType)))),
      StructField("ref2", StructType(Seq(StructField("x", IntegerType)))),
      StructField("missing_ok", StringType, nullable = true)))
    val rows = AvroCodec.readOcfResolvingRows(
      new java.io.ByteArrayInputStream(out.toByteArray), _ => Right(target)).toSeq
    assert(rows.size == 1)
    val r = rows.head
    assert(r.getString(0) == "B")
    assert(r.getAs[Array[Byte]](1).toSeq == Seq[Byte](9, 8, 7, 6))
    assert(r.getAs[Map[String, Long]](2) == Map("k" -> 5L))
    assert(r.getString(3) == "hi")
    assert(r.getStruct(4).getInt(0) == 7 && r.getStruct(5).getInt(0) == 8)
    assert(r.get(6) == null, "missing writer field projects to null")
  }

  test("delta: absolute (shallow-clone) add paths refuse loudly, never mis-track liveness") {
    import spark.implicits._
    val table = Files.createTempDirectory("delta_abs").resolve("t").toString
    DeltaLog.writeBatch(Seq((1L, 10L)).toDF("id", "v").coalesce(1), table)
    // append a commit whose add names an ABSOLUTE path (the protocol's
    // shallow-clone form): vacuum keys liveness by relative path, so
    // silently resolving this would reclaim live data after retention
    val logDir = Paths.get(table, "_delta_log")
    val v1 = logDir.resolve(f"${1L}%020d.json")
    Files.write(v1,
      ("""{"add":{"path":"/elsewhere/part-x.parquet","partitionValues":{},""" +
        """"size":10,"modificationTime":0,"dataChange":true}}""" + "\n").getBytes)
    DeltaLog.clearSnapshotCache()
    val e = intercept[IllegalArgumentException] { DeltaLog.read(spark, table).count() }
    assert(e.getMessage.contains("absolute data-file path"), e.getMessage)
  }

  test("delta checkpoint parquet schema: the column structure third-party readers bind") {
    import spark.implicits._
    val table = Files.createTempDirectory("delta_cp_conf").resolve("t").toString
    DeltaLog.writeBatch(Seq((1L, 10L), (2L, 20L)).toDF("id", "v").coalesce(1),
      table, tableConf = Map("delta.enableDeletionVectors" -> "true",
        graft.sinks.Cdf.enableProp -> "true"))
    DeltaLog.deleteWhere(spark, table, "id = 1") // a DV to round-trip
    val v = DeltaLog.snapshot(spark, table).get.version
    DeltaLog.writeCheckpoint(spark, table, v)
    val cp = Paths.get(table, "_delta_log", f"$v%020d.checkpoint.parquet")
    assert(Files.exists(cp))
    val sch = spark.read.parquet(cp.toString).schema
    def sub(name: String): StructType =
      sch(name).dataType.asInstanceOf[StructType]
    assert(sch.fieldNames.toSet == Set("txn", "add", "remove", "metaData", "protocol") ||
      sch.fieldNames.toSet == Set("txn", "add", "metaData", "protocol"),
      sch.fieldNames.mkString(","))
    assert(sub("txn").fieldNames.toSeq == Seq("appId", "version"))
    val add = sub("add")
    for (f <- Seq("path", "partitionValues", "size", "modificationTime",
        "dataChange", "stats", "deletionVector"))
      assert(add.fieldNames.contains(f), s"add.$f missing")
    assert(add("partitionValues").dataType ==
      org.apache.spark.sql.types.MapType(StringType, StringType, true) ||
      add("partitionValues").dataType ==
      org.apache.spark.sql.types.MapType(StringType, StringType, false),
      "partitionValues must be a map<string,string> (readers bind it so)")
    assert(add("deletionVector").dataType.asInstanceOf[StructType].fieldNames.toSeq ==
      Seq("storageType", "pathOrInlineDv", "offset", "sizeInBytes", "cardinality"))
    val md = sub("metaData")
    for (f <- Seq("id", "format", "schemaString", "partitionColumns",
        "configuration", "createdTime"))
      assert(md.fieldNames.contains(f), s"metaData.$f missing")
    assert(md("format").dataType.asInstanceOf[StructType].fieldNames.toSeq ==
      Seq("provider", "options"))
    assert(sub("protocol").fieldNames.toSeq ==
      Seq("minReaderVersion", "minWriterVersion", "readerFeatures", "writerFeatures"))
    // the rows themselves: one protocol, one metaData, the DV descriptor intact
    val rows = spark.read.parquet(cp.toString)
    assert(rows.filter(col("protocol").isNotNull).count() == 1)
    assert(rows.filter(col("metaData").isNotNull).count() == 1)
    val dvRows = rows.filter(col("add.deletionVector").isNotNull)
    assert(dvRows.count() == 1 &&
      dvRows.select(col("add.deletionVector.cardinality")).as[Long].head() == 1L)
    // _last_checkpoint hint names this version
    val lc = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      Files.readAllBytes(Paths.get(table, "_delta_log", "_last_checkpoint")))
    assert(lc.get("version").asLong() == v)
  }

  /** Hand-assembled OCF with `avro.codec=deflate` — iceberg-java's
    * DEFAULT manifest compression (write.metadata.compression-codec=
    * gzip), one raw-DEFLATE block per the avro spec.
    */
  private def writeDeflateOcf(path: java.nio.file.Path, schemaJson: String,
      wire: StructType, rows: Seq[Row]): Unit =
    writeCompressedOcf(path, schemaJson, wire, rows, "deflate")

  private def writeCompressedOcf(path: java.nio.file.Path, schemaJson: String,
      wire: StructType, rows: Seq[Row], codec: String): Unit = {
    def vint(out: java.io.OutputStream, v0: Long): Unit = {
      var v = (v0 << 1) ^ (v0 >> 63) // zigzag
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7fL) | 0x80L).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    val payload = new java.io.ByteArrayOutputStream()
    rows.foreach(r => payload.write(AvroCodec.encodeRow(r, wire)))
    val comp = new java.io.ByteArrayOutputStream()
    codec match {
      case "deflate" =>
        val defl = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, true /* raw, no zlib header */)
        defl.setInput(payload.toByteArray); defl.finish()
        val buf = new Array[Byte](8192)
        while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
        defl.end()
      case "snappy" =>
        // spec: snappy payload + big-endian CRC32 of the UNCOMPRESSED bytes
        comp.write(org.xerial.snappy.Snappy.compress(payload.toByteArray))
        val crc = new java.util.zip.CRC32()
        crc.update(payload.toByteArray)
        comp.write(java.nio.ByteBuffer.allocate(4)
          .putInt(crc.getValue.toInt).array())
    }
    val tmp = Files.createTempFile(path.getParent, codec, ".avro")
    val out = Files.newOutputStream(tmp)
    try {
      out.write(Array[Byte]('O', 'b', 'j', 1))
      def b(s: Array[Byte]): Unit = { vint(out, s.length.toLong); out.write(s) }
      vint(out, 2L)
      b("avro.schema".getBytes("UTF-8")); b(schemaJson.getBytes("UTF-8"))
      b("avro.codec".getBytes("UTF-8")); b(codec.getBytes("UTF-8"))
      vint(out, 0L)
      val sync = Array.fill[Byte](16)(7)
      out.write(sync)
      vint(out, rows.size.toLong)
      vint(out, comp.size.toLong)
      comp.writeTo(out)
      out.write(sync)
    } finally out.close()
    Files.move(tmp, path, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  test("avro snappy-codec OCF reads (Kafka-ecosystem writers): payload + CRC32 verified") {
    val wire = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true)))
    val rows = (1L to 500L).map(i => Row(i, if (i % 7 == 0) null else s"n$i"))
    val p = Files.createTempFile("snappy_ocf", ".avro")
    writeCompressedOcf(p, AvroCodec.avroSchemaJson(wire, "r"), wire, rows, "snappy")
    val in = Files.newInputStream(p)
    val back = try AvroCodec.readOcf(in, wire).toSeq finally in.close()
    assert(back == rows, s"snappy round-trip mismatch: ${back.take(3)}")
    // a corrupted block fails the CRC loudly, never returns wrong rows
    val bytes = Files.readAllBytes(p)
    bytes(bytes.length - 25) = (bytes(bytes.length - 25) ^ 0x1).toByte
    val pBad = Files.createTempFile("snappy_bad", ".avro")
    Files.write(pBad, bytes)
    val inB = Files.newInputStream(pBad)
    try intercept[Exception] { AvroCodec.readOcf(inB, wire).toSeq }
    finally inB.close()
  }

  test("iceberg-java manifest list: DEFLATE blocks + renamed count fields bind by field id, then alias") {
    import spark.implicits._
    val table = tmpTable()
    IcebergLog.writeBatch(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v"),
      table)
    IcebergLog.setTableProperties(spark, table,
      Map("write.upsert.enabled" -> "true"))
    IcebergLog.upsertAppend(spark, table,
      Seq((2L, 21L, false)).toDF("id", "v", "__graft_deleted"), Seq("id"))
    val m = IcebergLog.current(table).get
    val snap = m.snapshots.find(_.get("snapshot-id").asLong() == m.currentSnapshotId).get
    val listPath = Paths.get(snap.get("manifest-list").asText())
    val orig = IcebergLog.readManifestList(listPath.toString)
    assert(orig.exists(_.getInt(3) == 1), "need a deletes row for the pin")

    // iceberg-java's wire: the three *files_count fields carry the
    // PRE-RENAME names AND sit after the rows counts — neither name nor
    // position matches ours, only field-ids 504-506 identify them;
    // partitions 507 interleaved; whole file deflate-compressed
    val javaJson = """{"type":"record","name":"manifest_file","fields":[""" +
      """{"name":"manifest_path","type":"string","field-id":500},""" +
      """{"name":"manifest_length","type":"long","field-id":501},""" +
      """{"name":"partition_spec_id","type":"int","field-id":502},""" +
      """{"name":"content","type":"int","field-id":517},""" +
      """{"name":"sequence_number","type":"long","field-id":515},""" +
      """{"name":"min_sequence_number","type":"long","field-id":516},""" +
      """{"name":"added_snapshot_id","type":"long","field-id":503},""" +
      """{"name":"added_rows_count","type":"long","field-id":512},""" +
      """{"name":"existing_rows_count","type":"long","field-id":513},""" +
      """{"name":"deleted_rows_count","type":"long","field-id":514},""" +
      """{"name":"partitions","type":["null",{"type":"array","items":{"type":"record","name":"r508","fields":[{"name":"contains_null","type":"boolean","field-id":509}]}}],"default":null,"field-id":507},""" +
      """{"name":"added_data_files_count","type":"int","field-id":504},""" +
      """{"name":"existing_data_files_count","type":"int","field-id":505},""" +
      """{"name":"deleted_data_files_count","type":"int","field-id":506}]}"""
    val wire = StructType(Seq(
      StructField("manifest_path", StringType, nullable = false),
      StructField("manifest_length", LongType, nullable = false),
      StructField("partition_spec_id", IntegerType, nullable = false),
      StructField("content", IntegerType, nullable = false),
      StructField("sequence_number", LongType, nullable = false),
      StructField("min_sequence_number", LongType, nullable = false),
      StructField("added_snapshot_id", LongType, nullable = false),
      StructField("added_rows_count", LongType, nullable = false),
      StructField("existing_rows_count", LongType, nullable = false),
      StructField("deleted_rows_count", LongType, nullable = false),
      StructField("partitions", ArrayType(StructType(Seq(
        StructField("contains_null", BooleanType, nullable = false))),
        containsNull = false), nullable = true),
      StructField("added_data_files_count", IntegerType, nullable = false),
      StructField("existing_data_files_count", IntegerType, nullable = false),
      StructField("deleted_data_files_count", IntegerType, nullable = false)))
    val foreign = orig.map(r => Row(
      r.get(0), r.get(1), r.get(2), r.get(3), r.get(4), r.get(5), r.get(6),
      r.get(10), r.get(11), r.get(12),
      Seq(Row(false)),
      r.get(7), r.get(8), r.get(9)))

    // (a) field-id binding (java tags ids)
    writeDeflateOcf(listPath, javaJson, wire, foreign)
    val byId = IcebergLog.readManifestList(listPath.toString)
    assert(byId.size == orig.size)
    orig.zip(byId).foreach { case (o, g) =>
      assert(g.toSeq == o.toSeq, s"field-id decode mismatch: $g vs $o") }
    val got = IcebergLog.read(spark, table).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 10L, 2L -> 21L, 3L -> 30L), s"got $got")

    // (b) alias fallback (a writer that tags NO ids still resolves the
    // renamed fields through the declared aliases; rows counts by name)
    val noIdsJson = javaJson.replaceAll(""","field-id":\d+""", "")
    assert(!noIdsJson.contains("field-id"))
    writeDeflateOcf(listPath, noIdsJson, wire, foreign)
    val byAlias = IcebergLog.readManifestList(listPath.toString)
    orig.zip(byAlias).foreach { case (o, g) =>
      assert(g.toSeq == o.toSeq, s"alias decode mismatch: $g vs $o") }
    val got2 = IcebergLog.read(spark, table).as[(Long, Long)].collect().toMap
    assert(got2 == Map(1L -> 10L, 2L -> 21L, 3L -> 30L), s"got $got2")
  }

  test("foreign partition specs resolve by id from metadata; unknown spec ids refuse") {
    import spark.implicits._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val table = tmpTable()
    IcebergLog.writeBatch(Seq((1L, 10L, 0L)).toDF("id", "v", "p"), table,
      partitionBy = Seq("p"))
    // graft a third-party EVOLVED spec (id 2, bucket transform) into the
    // metadata, the shape the old spec-0-or-unpartitioned assumption
    // silently projected onto an empty struct
    val m0 = IcebergLog.current(table).get
    val metaPath = Paths.get(table, "metadata", s"v${m0.version}.metadata.json")
    val root = mapper.readTree(Files.readAllBytes(metaPath))
      .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    val sp2 = mapper.createObjectNode()
    sp2.put("spec-id", 2)
    val f = mapper.createObjectNode()
    f.put("name", "id_bucket"); f.put("transform", "bucket[4]")
    f.put("source-id", 1); f.put("field-id", 1001)
    sp2.set[com.fasterxml.jackson.databind.JsonNode]("fields",
      mapper.createArrayNode().add(f))
    root.get("partition-specs")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode].add(sp2)
    Files.write(metaPath, root.toString.getBytes("UTF-8"))
    val m = IcebergLog.current(table).get
    // spec 0 = table identity spec, spec 1 = unpartitioned delete spec,
    // spec 2 = the foreign bucket spec (int result type, its OWN id)
    assert(IcebergLog.partTypeOfSpec(m, 0).fieldNames.toSeq == Seq("p"))
    assert(IcebergLog.partTypeOfSpec(m, 1).isEmpty)
    val pt2 = IcebergLog.partTypeOfSpec(m, 2)
    assert(pt2.fieldNames.toSeq == Seq("id_bucket"))
    assert(pt2.fields.head.dataType == IntegerType)
    assert(pt2.fields.head.metadata.getLong("field-id") == 1001L)
    val e = intercept[RuntimeException] { IcebergLog.partTypeOfSpec(m, 9) }
    assert(e.getMessage.contains("partition-spec 9"), e.getMessage)
    // a manifest written UNDER spec 2 keeps its partition values
    val entry = Row(1, 7L, 3L, 3L,
      Row(0, s"$table/data/x.parquet", "PARQUET", Row(2), 5L, 100L,
        null, null, null, null, null))
    val mp = Files.createTempFile("spec2_manifest", ".avro")
    val out = Files.newOutputStream(mp)
    try AvroCodec.writeOcf(out, IcebergLog.manifestEntryType(pt2),
      Iterator(entry),
      schemaJsonOverride = Some(IcebergLog.manifestEntrySchemaJson(pt2)),
      extraMeta = Seq("partition-spec-id" -> "2", "format-version" -> "2",
        "content" -> "data"))
    finally out.close()
    val back = IcebergLog.readEntries(mp.toString, pt2)
    assert(back.head.getStruct(4).getStruct(3).getInt(0) == 2,
      "spec-2 partition value dropped")
  }

  test("decoded-manifest cache: hit on re-read, invalidated by recreation at the same path") {
    val partType = StructType(Seq.empty[StructField])
    val entryType = IcebergLog.manifestEntryType(partType)
    def entry(path: String) = Row(1, 7L, 3L, 3L,
      Row(0, path, "PARQUET", Row(), 5L, 100L, null, null, null, null, null))
    val p = Files.createTempFile("cache_manifest", ".avro")
    def writeEntries(rows: Seq[Row]): Unit = {
      val tmp = Files.createTempFile(p.getParent, "cache_tmp", ".avro")
      val out = Files.newOutputStream(tmp)
      try AvroCodec.writeOcf(out, entryType, rows.iterator,
        schemaJsonOverride = Some(IcebergLog.manifestEntrySchemaJson(partType)),
        extraMeta = Seq("partition-spec-id" -> "0", "format-version" -> "2",
          "content" -> "data"))
      finally out.close()
      Files.move(tmp, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    writeEntries(Seq(entry("/t/data/a.parquet")))
    val h0 = IcebergLog.manifestCacheHits.get()
    val r1 = IcebergLog.readEntries(p.toString, partType)
    val r2 = IcebergLog.readEntries(p.toString, partType)
    assert(r1.size == 1 && r2 == r1)
    assert(IcebergLog.manifestCacheHits.get() >= h0 + 1,
      "second identical read must be a cache hit")
    // recreation at the SAME path (new inode) must MISS — serving the
    // stale decode would resurrect a dropped table's files
    writeEntries(Seq(entry("/t/data/b.parquet"), entry("/t/data/c.parquet")))
    val r3 = IcebergLog.readEntries(p.toString, partType)
    assert(r3.size == 2 &&
      r3.map(_.getStruct(4).getString(1)).toSet ==
        Set("/t/data/b.parquet", "/t/data/c.parquet"),
      s"stale cached decode served after recreation: $r3")
  }

  test("third-party RENAME COLUMN resolves pre-rename files by FIELD ID, not name") {
    import spark.implicits._
    val table = tmpTable()
    IcebergLog.writeBatch(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), table)
    // a third-party ALTER TABLE RENAME COLUMN v TO amount: metadata-only
    // — the data files on disk keep parquet column name 'v' (field id 2);
    // the spec's Column Projection rule says readers select BY FIELD ID,
    // so a by-name read would silently return NULL amounts
    val m0 = IcebergLog.current(table).get
    val dir = Paths.get(table, "metadata")
    val p = dir.resolve(s"v${m0.version}.metadata.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(Files.readAllBytes(p))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val schemas = node.get("schemas")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
    val renamed = schemas.get(0).deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    renamed.put("schema-id", 1)
    renamed.get("fields").get(1)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .put("name", "amount")
    schemas.add(renamed)
    node.put("current-schema-id", 1)
    Files.write(p, node.toString.getBytes("UTF-8"))
    val df = IcebergLog.read(spark, table)
    assert(df.schema.fieldNames.toSeq == Seq("id", "amount"))
    val got = df.as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 10L, 2L -> 20L),
      s"renamed column must resolve by field id, got $got")
    // the changelog replays the PRE-RENAME files too
    val ch = IcebergLog.readChanges(spark, table, 1L, Some(1L))
      .select("id", "amount").as[(Long, Long)].collect().toMap
    assert(ch == Map(1L -> 10L, 2L -> 20L), s"got $ch")
    // manifest-metric pruning keys on field ids — unaffected by renames
    val (kept, total) = IcebergLog.planFiles(spark, table, None, Some("amount >= 5"))
    assert(total == kept.size)
    // the streaming view (r14): raw links are unsound on renamed tables,
    // so the view MATERIALIZES logical rows via the field-id read
    // schema — snapshot AND per-commit adds both resolve pre-rename
    // files correctly
    val (sdf, view) = graft.sources.IcebergStreamSource.open(spark, table)
    val q = sdf.writeStream.format("memory").queryName("renamed_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100)).start()
    def streamed: Map[Long, Long] = spark.table("renamed_stream")
      .as[(Long, Long)].collect().toMap
    try {
      q.processAllAvailable()
      assert(streamed == Map(1L -> 10L, 2L -> 20L), s"got $streamed")
      // a post-rename append materializes too (logical shape)
      IcebergLog.writeBatch(Seq((3L, 30L)).toDF("id", "amount"), table)
      view.sync()
      q.processAllAvailable()
      assert(streamed == Map(1L -> 10L, 2L -> 20L, 3L -> 30L), s"got $streamed")
      // a replayed sync is a no-op (deterministic materialization names)
      assert(view.sync() == 0)
    } finally { q.stop(); view.close() }
  }

  test("renamed PARTITION column: reads refuse (hive recovery is name-bound); OPTIMIZE repairs") {
    import spark.implicits._
    val table = tmpTable()
    IcebergLog.writeBatch(Seq((1L, "a"), (2L, "b")).toDF("id", "p"), table,
      partitionBy = Seq("p"))
    // third-party RENAME COLUMN p TO cat — metadata-only; the files'
    // hive paths still read p=a / p=b
    val m0 = IcebergLog.current(table).get
    val dir = Paths.get(table, "metadata")
    val p = dir.resolve(s"v${m0.version}.metadata.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(Files.readAllBytes(p))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val schemas = node.get("schemas")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
    val renamed = schemas.get(0).deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    renamed.put("schema-id", 1)
    renamed.get("fields").get(1)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .put("name", "cat")
    schemas.add(renamed)
    node.put("current-schema-id", 1)
    Files.write(p, node.toString.getBytes("UTF-8"))
    IcebergLog.clearManifestCache()
    // partition VALUES recover from hive dir names, which carry the OLD
    // name — a silent null partition would be data corruption: refuse
    val e = intercept[RuntimeException] { IcebergLog.read(spark, table).count() }
    assert(e.getMessage.contains("renamed") && e.getMessage.contains("OPTIMIZE"),
      e.getMessage)
    // the repair path: OPTIMIZE reads data columns by FIELD ID, takes
    // partition values from the MANIFESTS (spec-name keyed), and
    // re-lands every file under the CURRENT hive names
    assert(IcebergLog.rewriteDataFiles(spark, table,
      zorderBy = Seq("id")).isDefined) // layout rewrite: EVERY live file
    val got = IcebergLog.read(spark, table)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "b"), s"got $got")
    val live = IcebergLog.liveFiles(table, None).filter(_.status != 2)
    assert(live.forall(_.path.contains("cat=")), live.map(_.path).toString)
  }

  test("partition-scoped equality deletes confine to their partition even when keys omit it") {
    import spark.implicits._
    // the spec allows a partition-scoped delete whose equality_ids do
    // NOT include the partition column: it applies ONLY inside its own
    // partition. Two scoped deletes sharing equality columns must not
    // cross-kill — file-level pruning alone would let partition 1's
    // delete retract a matching key from a file partition 2's delete
    // made dirty (silent under-return)
    val table = tmpTable()
    IcebergLog.writeBatch(
      Seq((7L, 10L, 1L), (8L, 20L, 1L), (7L, 30L, 2L), (9L, 40L, 2L))
        .toDF("id", "v", "p"),
      table, partitionBy = Seq("p"))
    val m = IcebergLog.current(table).get
    val snap = m.snapshots.find(_.get("snapshot-id").asLong() == m.currentSnapshotId).get
    val sid = m.currentSnapshotId
    val dataDir = Paths.get(table, "data")
    // two single-column delete files: D1 retracts id=7 SCOPED p=1,
    // D2 retracts id=9 SCOPED p=2
    def delFile(ids: Seq[Long]): java.nio.file.Path = {
      val scratch = Files.createTempDirectory("eqdel")
      ids.toDF("id").coalesce(1).write.mode("overwrite")
        .parquet(scratch.resolve("w").toString)
      val part = Files.list(scratch.resolve("w")).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = dataDir.resolve(s"eq-${java.util.UUID.randomUUID()}.parquet")
      Files.move(part, dest)
      dest
    }
    val d1 = delFile(Seq(7L))
    val d2 = delFile(Seq(9L))
    // a foreign-shaped DELETES manifest under the TABLE spec carrying
    // the partition values (the scope) and equality_ids = [1] (id)
    val entryType = StructType(Seq(
      StructField("status", IntegerType, nullable = false),
      StructField("snapshot_id", LongType, nullable = true),
      StructField("sequence_number", LongType, nullable = true),
      StructField("file_sequence_number", LongType, nullable = true),
      StructField("data_file", StructType(Seq(
        StructField("content", IntegerType, nullable = false),
        StructField("file_path", StringType, nullable = false),
        StructField("file_format", StringType, nullable = false),
        StructField("partition", StructType(Seq(
          StructField("p", LongType, nullable = true))), nullable = false),
        StructField("record_count", LongType, nullable = false),
        StructField("file_size_in_bytes", LongType, nullable = false),
        StructField("equality_ids",
          ArrayType(IntegerType, containsNull = false), nullable = true))),
        nullable = false)))
    val entries = Seq(
      Row(1, sid, 2L, 2L, Row(2, d1.toAbsolutePath.toString, "PARQUET",
        Row(1L), 1L, Files.size(d1), Seq(1))),
      Row(1, sid, 2L, 2L, Row(2, d2.toAbsolutePath.toString, "PARQUET",
        Row(2L), 1L, Files.size(d2), Seq(1))))
    val mfPath = Paths.get(table, "metadata",
      s"del-${java.util.UUID.randomUUID()}.avro")
    val out = Files.newOutputStream(mfPath)
    try AvroCodec.writeOcf(out, entryType, entries.iterator)
    finally out.close()
    // splice a content=1 row into the manifest list
    val listType = StructType(Seq(
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
    val listPath = Paths.get(snap.get("manifest-list").asText())
    val listRows = IcebergLog.readManifestList(listPath.toString) :+
      Row(mfPath.toAbsolutePath.toString, Files.size(mfPath), 0, 1,
        2L, 2L, sid, 2, 0, 0, 2L, 0L, 0L)
    val tmpL = Files.createTempFile(listPath.getParent, "list", ".avro")
    val outL = Files.newOutputStream(tmpL)
    try AvroCodec.writeOcf(outL, listType, listRows.iterator)
    finally outL.close()
    Files.move(tmpL, listPath, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val got = IcebergLog.read(spark, table).as[(Long, Long, Long)]
      .collect().map(r => (r._1, r._3)).toSet
    // id=7 dies ONLY in p=1; id=9 only in p=2; p=2's id=7 SURVIVES
    assert(got == Set((8L, 1L), (7L, 2L)), s"got $got")
  }

  test("snapshot refs: tags resolve for time travel, survive commits, and pin expiry") {
    import spark.implicits._
    val table = tmpTable()
    IcebergLog.writeBatch(Seq((1L, 10L)).toDF("id", "v"), table)
    val m1 = IcebergLog.current(table).get
    val firstSid = m1.currentSnapshotId
    // a third-party writer tags the first snapshot
    val dir = Paths.get(table, "metadata")
    val p = dir.resolve(s"v${m1.version}.metadata.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(Files.readAllBytes(p))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val tag = node.get("refs")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .putObject("rev-1")
    tag.put("snapshot-id", firstSid)
    tag.put("type", "tag")
    Files.write(p, node.toString.getBytes("UTF-8"))
    assert(IcebergLog.snapshotIdOfRef(table, "rev-1") == firstSid)
    // the tag SURVIVES this engine's next commit (foreign refs carry
    // forward; only main advances)
    IcebergLog.writeBatch(Seq((2L, 20L)).toDF("id", "v"), table)
    val m2 = IcebergLog.current(table).get
    assert(m2.refs.get("rev-1").map(_._1).contains(firstSid), s"refs: ${m2.refs}")
    assert(m2.refs("main")._1 == m2.currentSnapshotId)
    val old = IcebergLog.read(spark, table,
      Some(IcebergLog.snapshotIdOfRef(table, "rev-1")))
      .as[(Long, Long)].collect().toMap
    assert(old == Map(1L -> 10L), s"got $old")
    // expiry PINS ref'd snapshots: expiring everything older than now
    // must keep the tagged one (a dangling tag breaks its time travel)
    IcebergLog.expireSnapshots(spark, table, olderThanMs = 0L)
    val m3 = IcebergLog.current(table).get
    assert(m3.snapshots.exists(_.get("snapshot-id").asLong() == firstSid),
      "tagged snapshot expired out from under its ref")
    assert(IcebergLog.read(spark, table, Some(firstSid))
      .as[(Long, Long)].collect().toMap == Map(1L -> 10L))
    val e = intercept[RuntimeException] {
      IcebergLog.snapshotIdOfRef(table, "nope")
    }
    assert(e.getMessage.contains("rev-1"), e.getMessage)
    // the SQL face: ref = '<tag>' time travel
    val sqlGot = new graft.sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE rt (id BIGINT, v BIGINT) WITH (
         |  connector='iceberg', path='$table', format='parquet',
         |  type='source', ref='rev-1');
         |SELECT id, v FROM rt""".stripMargin).get
    assert(sqlGot.as[(Long, Long)].collect().toMap == Map(1L -> 10L))
  }

  test("catalog-managed metadata naming (NNNNN-uuid.metadata.json) reads; writes route to the catalog") {
    import spark.implicits._
    val table = tmpTable()
    IcebergLog.writeBatch(Seq((1L, 10L)).toDF("id", "v"), table)
    IcebergLog.writeBatch(Seq((2L, 20L)).toDF("id", "v"), table)
    val dir = Paths.get(table, "metadata")
    // re-shape into the pyiceberg/REST layout: uuid-named files, no
    // vN forms, no version-hint (the catalog holds the pointer)
    Files.move(dir.resolve("v1.metadata.json"),
      dir.resolve("00001-8c30794b-aaaa-bbbb-cccc-7b33e32d7e09.metadata.json"))
    Files.move(dir.resolve("v2.metadata.json"),
      dir.resolve("00002-8c30794b-aaaa-bbbb-cccc-7b33e32d7e0a.metadata.json"))
    Files.deleteIfExists(dir.resolve("version-hint.text"))
    val m = IcebergLog.current(table).get
    assert(m.version == 2 && m.catalogManaged)
    val got = IcebergLog.read(spark, table).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 10L, 2L -> 20L), s"got $got")
    // writes/maintenance must route through the owning catalog
    val e = intercept[IllegalArgumentException] {
      IcebergLog.writeBatch(Seq((3L, 30L)).toDF("id", "v"), table)
    }
    assert(e.getMessage.contains("catalog-managed"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      IcebergLog.setTableProperties(spark, table, Map("k" -> "v"))
    }
    assert(e2.getMessage.contains("catalog-managed"), e2.getMessage)
    // a CAS race only the catalog adjudicated: two files claim one
    // version — ambiguous without it, refuse loudly
    Files.copy(dir.resolve("00002-8c30794b-aaaa-bbbb-cccc-7b33e32d7e0a.metadata.json"),
      dir.resolve("00002-8c30794b-aaaa-bbbb-cccc-7b33e32d7e0b.metadata.json"))
    val e3 = intercept[IllegalArgumentException] { IcebergLog.current(table) }
    assert(e3.getMessage.contains("ambiguous"), e3.getMessage)
  }

  test("puffin writer emits a spec-compliant footer: magic/payload/size/flags/magic") {
    val dir = Files.createTempDirectory("puffin_footer")
    val (file, at) = graft.formats.Puffin.writeDvFile(dir, Seq(
      "s3://bucket/data/a.parquet" -> Seq(1L, 5L, 9L),
      "s3://bucket/data/b.parquet" -> Seq(0L)))
    val bytes = Files.readAllBytes(file)
    val magic = "PFA1".getBytes("UTF-8")
    // header magic and the footer's CLOSING magic (what a conformant
    // reader seeks to first)
    assert(bytes.take(4).sameElements(magic))
    assert(bytes.takeRight(4).sameElements(magic))
    // tail framing: FooterPayloadSize (LE4) + Flags (4, uncompressed=0)
    val tail = java.nio.ByteBuffer.wrap(bytes, bytes.length - 12, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val size = tail.getInt; val flags = tail.getInt
    assert(flags == 0, "footer payload must be flagged uncompressed")
    val payloadStart = bytes.length - 12 - size
    // the footer's OPENING magic sits immediately before the payload
    assert(bytes.slice(payloadStart - 4, payloadStart).sameElements(magic))
    val meta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(bytes, payloadStart, size, "UTF-8"))
    val blobs = meta.get("blobs")
    assert(blobs.size == 2)
    (0 until 2).foreach { i =>
      val b = blobs.get(i)
      assert(b.get("type").asText == "deletion-vector-v1")
      assert(b.get("fields").size == 0)
      // v3 convention: the adopting snapshot is created AFTER the file
      assert(b.get("snapshot-id").asLong == -1L)
      assert(b.get("sequence-number").asLong == -1L)
    }
    // footer offset/length per blob EQUAL the returned manifest values
    // (the v3 spec requires content_offset/content_size to match them)
    val a = blobs.get(0)
    assert((a.get("offset").asLong, a.get("length").asLong) ==
      at("s3://bucket/data/a.parquet"))
    assert(a.get("properties").get("referenced-data-file").asText ==
      "s3://bucket/data/a.parquet")
    assert(a.get("properties").get("cardinality").asText == "3")
    // the footer-driven reader agrees with the raw-byte parse…
    assert(graft.formats.Puffin.readFileMetadata(file) == meta)
    // …and the blob region still decodes through the offset-based v3
    // read path used when planning scans
    val (off, len) = at("s3://bucket/data/a.parquet")
    val bm = graft.sinks.DeletionVectors.loadIcebergDv(file, off, len)
    assert(Seq(1L, 5L, 9L).forall(bm.contains))
    assert(!bm.contains(2L))
  }

}
