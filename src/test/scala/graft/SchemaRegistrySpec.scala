package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.formats.{AvroCodec, Formats, SchemaRegistry}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.concurrent.TrieMap

/** Confluent schema-registry client against an in-JVM stub serving the
  * registry's public REST surface (reference
  * crates/arroyo-rpc/src/schema_resolver.rs:240-460): register-on-write,
  * fetch-writer-schema-by-framed-id on read, schema evolution via
  * name-based alignment + Avro promotions.
  */
class SchemaRegistrySpec extends SparkSpec {

  /** Minimal registry stub: ids are global, subjects hold version lists,
    * registering an identical schema is idempotent (returns the same id) —
    * the semantics the real registry documents.
    */
  private class StubRegistry {
    val byId = TrieMap.empty[Int, String]
    val subjects = TrieMap.empty[String, List[Int]]
    val nextId = new AtomicInteger(0)
    val fetches = new AtomicInteger(0)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

    def handle(x: HttpExchange): Unit = {
      val path = x.getRequestURI.getPath.stripPrefix("/")
      val method = x.getRequestMethod
      def respond(code: Int, body: String): Unit = {
        val b = body.getBytes(UTF_8)
        x.getResponseHeaders.set("Content-Type", "application/vnd.schemaregistry.v1+json")
        x.sendResponseHeaders(code, b.length)
        x.getResponseBody.write(b)
        x.getResponseBody.close()
      }
      (method, path.split("/").toList) match {
        case ("GET", "subjects" :: Nil) =>
          respond(200, subjects.keys.map("\"" + _ + "\"").mkString("[", ",", "]"))
        case ("GET", "schemas" :: "ids" :: id :: Nil) =>
          fetches.incrementAndGet()
          byId.get(id.toInt) match {
            case Some(s) => respond(200, mapper.createObjectNode().put("schema", s).toString)
            case None => respond(404, """{"error_code":40403,"message":"Schema not found"}""")
          }
        case ("GET", "subjects" :: subj :: "versions" :: "latest" :: Nil) =>
          subjects.get(subj).flatMap(_.lastOption) match {
            case Some(id) =>
              val n = mapper.createObjectNode()
              n.put("subject", subj); n.put("version", subjects(subj).length)
              n.put("id", id); n.put("schema", byId(id))
              respond(200, n.toString)
            case None => respond(404, """{"error_code":40401,"message":"Subject not found"}""")
          }
        case ("POST", "subjects" :: subj :: "versions" :: Nil) =>
          val schema = mapper.readTree(new String(x.getRequestBody.readAllBytes(), UTF_8))
            .get("schema").asText()
          val id = byId.find(_._2 == schema).map(_._1).getOrElse {
            val i = nextId.incrementAndGet(); byId.put(i, schema); i
          }
          subjects.updateWith(subj) {
            case Some(ids) if ids.contains(id) => Some(ids)
            case Some(ids) => Some(ids :+ id)
            case None => Some(List(id))
          }
          respond(200, s"""{"id": $id}""")
        case _ => respond(404, """{"error_code":404,"message":"no route"}""")
      }
    }
  }

  private def withRegistry(f: (StubRegistry, String) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val stub = new StubRegistry
    server.createContext("/", (x: HttpExchange) => stub.handle(x))
    server.setExecutor(Executors.newCachedThreadPool())
    server.start()
    try f(stub, s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("register is idempotent and testConnection probes GET subjects") {
    withRegistry { (stub, endpoint) =>
      val conf = SchemaRegistry.Conf(endpoint, None, None)
      SchemaRegistry.testConnection(conf)
      val schema = AvroCodec.avroSchemaJson(StructType.fromDDL("id BIGINT, v STRING"), "rec")
      val id1 = SchemaRegistry.register(conf, "t-value", schema)
      val id2 = SchemaRegistry.register(conf, "t-value", schema)
      assert(id1 == id2)
      val (lid, lschema) = SchemaRegistry.latest(conf, "t-value")
      assert(lid == id1 && lschema == schema)
      assert(stub.subjects("t-value") == List(id1))
    }
  }

  test("encode registers under {topic}-value and frames with the registry id") {
    import spark.implicits._
    withRegistry { (stub, endpoint) =>
      val opts = Map(
        "avro.confluent_schema_registry" -> "true",
        "schema_registry.endpoint" -> endpoint,
        "topic" -> "orders")
      val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      val encoded = Formats.encodeValue(df, "avro", opts).collect()
      assert(stub.subjects.contains("orders-value"))
      val expectId = stub.subjects("orders-value").head
      val framedIds = encoded.map(r => AvroCodec.unframeConfluent(r.getAs[Array[Byte]](0))._1)
      assert(framedIds.toSet == Set(expectId))
    }
  }

  test("read path fetches the writer schema by framed id, once per id (cached)") {
    import spark.implicits._
    withRegistry { (stub, endpoint) =>
      val conf = SchemaRegistry.Conf(endpoint, None, None)
      val schema = StructType.fromDDL("id BIGINT, v STRING")
      val id = SchemaRegistry.register(conf, "t-value", AvroCodec.avroSchemaJson(schema, "rec"))
      val raw = Seq(1L -> "a", 2L -> "b", 3L -> "c").map { case (i, v) =>
        Tuple1(AvroCodec.frameConfluent(AvroCodec.encodeRow(Row(i, v), schema), id))
      }.toDF("value")
      val opts = Map(
        "avro.confluent_schema_registry" -> "true",
        "schema_registry.endpoint" -> endpoint)
      val out = Formats.decodeValue(raw, schema, "avro", opts).collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(out.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
      // 3 messages, 1 schema id → at most one fetch per executor JVM
      // (local mode: exactly one JVM)
      assert(stub.fetches.get() == 1)
    }
  }

  test("schema evolution: reordered + added writer fields align by name, int promotes to long") {
    import spark.implicits._
    withRegistry { (stub, endpoint) =>
      val conf = SchemaRegistry.Conf(endpoint, None, None)
      // writer: reordered vs reader, extra field `extra`, and `n` written
      // as int where the reader declares BIGINT
      val writer = StructType.fromDDL("v STRING, extra DOUBLE, n INT, id BIGINT")
      val reader = StructType.fromDDL("id BIGINT, v STRING, n BIGINT, missing STRING")
      val id = SchemaRegistry.register(conf, "e-value", AvroCodec.avroSchemaJson(writer, "w"))
      val raw = Seq(
        Tuple1(AvroCodec.frameConfluent(AvroCodec.encodeRow(Row("a", 0.5, 7, 1L), writer), id)),
        Tuple1(AvroCodec.frameConfluent(AvroCodec.encodeRow(Row("b", 1.5, 8, 2L), writer), id))
      ).toDF("value")
      val opts = Map(
        "avro.confluent_schema_registry" -> "true",
        "schema_registry.endpoint" -> endpoint)
      val out = Formats.decodeValue(raw, reader, "avro", opts).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), Option(r.get(3)))).sortBy(_._1)
      assert(out.toSeq == Seq((1L, "a", 7L, None), (2L, "b", 8L, None)))
    }
  }

  test("unknown schema id and unreachable registry raise clear errors") {
    withRegistry { (_, endpoint) =>
      val conf = SchemaRegistry.Conf(endpoint, None, None)
      val e = intercept[IllegalArgumentException](SchemaRegistry.schemaById(conf, 42))
      assert(e.getMessage.contains("42"))
    }
    val bad = SchemaRegistry.Conf("http://127.0.0.1:1", None, None)
    intercept[Exception](SchemaRegistry.testConnection(bad))
  }

  test("confluent connector requires schema_registry.endpoint (plan-time validation)") {
    val ddl =
      """CREATE TABLE c (id BIGINT, v TEXT) WITH (
        |  connector='confluent', format='avro', topic='t',
        |  'bootstrap_servers'='none')""".stripMargin
    val t = sql.Ddl.parse(ddl).asInstanceOf[sql.Ddl.CreateTbl].table
    val p = new sql.Pipeline(spark)
    val e = intercept[RuntimeException](p.sourceFrame(t))
    assert(e.getMessage.contains("schema_registry.endpoint"))
  }
}
