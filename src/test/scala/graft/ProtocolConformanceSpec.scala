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
    // schema and pads — callers always see the 11-field struct
    val rows = IcebergLog.readEntries(p.toString, partType)
    assert(rows.size == 1)
    val df = rows.head.getStruct(4)
    assert(df.size == 11, s"expected padded 11-field data_file, got ${df.size}")
    assert(df.get(10) == null, "legacy entries carry null equality_ids")
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
}
