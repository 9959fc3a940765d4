package graft

import graft.formats.{AvroCodec, Formats, ProtobufCodec}
import graft.sql.Ddl
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class FormatsSpec extends SparkSpec {

  private def tmp(): String = java.nio.file.Files.createTempDirectory("graft-fmt").toString

  private val schema = StructType.fromDDL(
    "id BIGINT, name STRING, score DOUBLE, ok BOOLEAN, ts TIMESTAMP, tags ARRAY<STRING>")

  private def sampleRows: Seq[Row] = {
    val ts = java.sql.Timestamp.valueOf("2024-03-01 10:30:00.123456")
    Seq(
      Row(1L, "alpha", 1.5, true, ts, Seq("a", "b")),
      Row(2L, "béta", -2.25, false, ts, Seq.empty[String]),
      Row(3L, null, null, null, null, null))
  }

  test("avro: raw datum round-trip preserves every supported type") {
    sampleRows.foreach { r =>
      val bytes = AvroCodec.encodeRow(r, schema)
      val back = AvroCodec.decodeRow(bytes, schema)
      assert(back == r, s"expected $r got $back")
    }
  }

  test("avro: confluent wire framing carries the schema id") {
    val datum = AvroCodec.encodeRow(sampleRows.head, schema)
    val framed = AvroCodec.frameConfluent(datum, 42)
    assert(framed(0) == 0)
    val (id, back) = AvroCodec.unframeConfluent(framed)
    assert(id == 42)
    assert(java.util.Arrays.equals(back, datum))
  }

  test("avro: OCF files round-trip through executors (write + read DataFrames)") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(sampleRows, 2), schema)
    val dir = tmp()
    Formats.writeAvroFiles(df, dir)
    val back = Formats.readAvroFiles(spark, dir, schema, streaming = false)
    assert(back.schema == schema)
    val got = back.collect().sortBy(r => r.getLong(0))
    assert(got.toSeq == sampleRows)
  }

  test("avro: schema json declares nullable unions and logical timestamp") {
    val js = AvroCodec.avroSchemaJson(schema, "events")
    assert(js.contains("\"record\""))
    assert(js.contains("[\"null\", \"long\"]"))
    assert(js.contains("timestamp-micros"))
  }

  test("protobuf: round-trip, null elision, unknown-field skip, packed repeated") {
    val pschema = StructType.fromDDL("id BIGINT, name STRING, score DOUBLE, ns ARRAY<BIGINT>")
    val r = Row(7L, "x", 2.5, Seq(1L, 2L, 300L))
    val bytes = ProtobufCodec.encodeRow(r, pschema)
    assert(ProtobufCodec.decodeRow(bytes, pschema) == r)

    // nulls elide → decode as null
    val rn = Row(null, "only-name", null, null)
    val bn = ProtobufCodec.encodeRow(rn, pschema)
    assert(ProtobufCodec.decodeRow(bn, pschema) == rn)

    // decoding against a NARROWER schema skips the unknown fields
    val narrow = StructType.fromDDL("id BIGINT, name STRING")
    assert(ProtobufCodec.decodeRow(bytes, narrow) == Row(7L, "x"))

    // packed repeated (wire type 2 for a numeric repeated field) decodes too
    val packed = {
      val out = new java.io.ByteArrayOutputStream()
      out.write((4 << 3) | 2) // field 4 (ns), len-delim
      val payload = new java.io.ByteArrayOutputStream()
      Seq(1L, 2L, 300L).foreach { v0 =>
        var v = v0
        while ((v & ~0x7fL) != 0) { payload.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
        payload.write(v.toInt)
      }
      out.write(payload.size())
      payload.writeTo(out)
      out.toByteArray
    }
    assert(ProtobufCodec.decodeRow(packed, pschema) == Row(null, null, null, Seq(1L, 2L, 300L)))
  }

  test("bad_data: drop skips undecodable kafka payloads, fail raises") {
    import spark.implicits._
    val good = AvroCodec.encodeRow(Row(1L, "ok", 1.0, true, null, null), schema)
    val bad = "definitely not avro".getBytes
    val raw = Seq(good, bad).toDF("value")

    val dropped = Formats.decodeValue(raw, schema, "avro", Map("bad_data" -> "drop"))
    assert(dropped.collect().map(_.getLong(0)).toSeq == Seq(1L))

    val failing = Formats.decodeValue(raw, schema, "avro", Map.empty)
    val e = intercept[Exception] { failing.collect() }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("bad_data=fail")))
  }

  test("bad_data: json filesystem source drops malformed lines when asked") {
    val dir = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/data.json"),
      "{\"id\": 1, \"v\": \"a\"}\nTHIS IS NOT JSON\n{\"id\": 2, \"v\": \"b\"}\n".getBytes)
    val p = new sql.Pipeline(spark)
    val res = p.run(
      s"""CREATE TABLE j (id BIGINT, v TEXT) WITH (connector='filesystem', path='$dir', format='json', bad_data='drop');
         |SELECT id, v FROM j""".stripMargin).get
    val rows = res.collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("kafka decode path: json payload + metadata('…') virtual columns (broker-free)") {
    import spark.implicits._
    // a crafted kafka-shaped frame: (key, value, topic, partition, offset, timestamp)
    val ts = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    val raw = Seq(
      (Array[Byte](1), "{\"id\": 10, \"v\": \"x\"}".getBytes, "t1", 0, 5L, ts),
      (Array[Byte](2), "{\"id\": 11, \"v\": \"y\"}".getBytes, "t1", 1, 6L, ts))
      .toDF("key", "value", "topic", "partition", "offset", "timestamp")

    val t = Ddl.parse(
      """CREATE TABLE k (
        |  id BIGINT, v TEXT,
        |  off BIGINT GENERATED ALWAYS AS (metadata('offset_id')),
        |  part INT GENERATED ALWAYS AS (metadata('partition')),
        |  top TEXT GENERATED ALWAYS AS (metadata('topic'))
        |) WITH (connector='kafka', type='source', format='json',
        |        bootstrap_servers='none', topic='t1')""".stripMargin)
      .asInstanceOf[Ddl.CreateTbl].table

    val p = new sql.Pipeline(spark)
    val decoded = p.applyColumns(t, p.decodeKafka(raw, t))
    // trailing `_timestamp` = the hidden per-source event time the
    // reference appends to every stream (message time for kafka)
    assert(decoded.columns.toSeq == Seq("id", "v", "off", "part", "top", "_timestamp"))
    val rows = decoded.collect().sortBy(_.getLong(0))
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3), r.getString(4))).toSeq ==
      Seq((10L, "x", 5L, 0, "t1"), (11L, "y", 6L, 1, "t1")))
  }

  test("kafka decode path: avro payload with confluent framing") {
    import spark.implicits._
    val pschema = StructType.fromDDL("id BIGINT, v STRING")
    def frame(id: Long, v: String): Array[Byte] =
      AvroCodec.frameConfluent(AvroCodec.encodeRow(Row(id, v), pschema), 7)
    val ts = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    val raw = Seq(
      (Array[Byte](1), frame(1L, "a"), "t", 0, 0L, ts),
      (Array[Byte](2), frame(2L, "b"), "t", 0, 1L, ts))
      .toDF("key", "value", "topic", "partition", "offset", "timestamp")
    val t = Ddl.parse(
      """CREATE TABLE ka (id BIGINT, v TEXT) WITH (connector='kafka', format='avro',
        |  'avro.confluent_schema_registry' = 'true')""".stripMargin)
      .asInstanceOf[Ddl.CreateTbl].table
    val p = new sql.Pipeline(spark)
    val decoded = p.applyColumns(t, p.decodeKafka(raw, t))
    assert(decoded.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("metadata('…') on a non-kafka table is rejected (reference parity)") {
    val t = Ddl.parse(
      """CREATE TABLE f (id BIGINT, o BIGINT GENERATED ALWAYS AS (metadata('offset_id')))
        |WITH (connector='filesystem', path='/tmp/x', format='json')""".stripMargin)
      .asInstanceOf[Ddl.CreateTbl].table
    val p = new sql.Pipeline(spark)
    import spark.implicits._
    val e = intercept[RuntimeException] {
      p.applyColumns(t, Seq((1L, "x")).toDF("id", "ignored"))
    }
    assert(e.getMessage.contains("only available on kafka"))
  }
}
