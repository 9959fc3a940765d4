package graft.formats

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.types._

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

/** Confluent Schema Registry client over the registry's public REST surface
  * (reference crates/arroyo-rpc/src/schema_resolver.rs:240-460 and
  * crates/arroyo-connectors/src/confluent/):
  *
  *   - `GET  subjects`                          — connection test
  *   - `GET  schemas/ids/{id}`                  — writer schema for a framed message
  *   - `GET  subjects/{s}/versions/latest`      — latest (id, schema) for a subject
  *   - `POST subjects/{s}/versions`             — register, returns {"id": n}
  *
  * Object-level with a per-JVM schema cache: the read path runs inside
  * executor tasks (each decoded message carries a schema id), so the
  * closure captures only the endpoint + credential strings and ids resolve
  * through [[structTypeForId]] at most once per executor. Option names
  * follow the reference connector: `schema_registry.endpoint`,
  * `schema_registry.api_key`, `schema_registry.api_secret`.
  */
object SchemaRegistry {

  final case class Conf(endpoint: String, apiKey: Option[String], apiSecret: Option[String])

  def confOf(options: Map[String, String]): Option[Conf] =
    options.get("schema_registry.endpoint").map(ep =>
      Conf(ep.stripSuffix("/"),
        options.get("schema_registry.api_key"),
        options.get("schema_registry.api_secret")))

  @transient private lazy val http = HttpClient.newHttpClient()
  @transient private lazy val mapper = new ObjectMapper()

  /** (endpoint, id) → parsed writer StructType; registry ids are immutable
    * so the cache never invalidates. ConcurrentHashMap.computeIfAbsent is
    * single-flight per key: when 32 tasks hit a cold executor at once, the
    * registry sees ONE fetch, not a thundering herd.
    */
  private val byIdCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), StructType]()

  private def request(conf: Conf, path: String): HttpRequest.Builder = {
    val b = HttpRequest.newBuilder(URI.create(s"${conf.endpoint}/$path"))
      .header("Content-Type", "application/vnd.schemaregistry.v1+json")
    (conf.apiKey, conf.apiSecret) match {
      case (Some(k), Some(s)) =>
        b.header("Authorization",
          "Basic " + Base64.getEncoder.encodeToString(s"$k:$s".getBytes(UTF_8)))
      case _ => b
    }
  }

  private def send(r: HttpRequest): (Int, String) = {
    val resp = http.send(r, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  /** GET subjects — reachability probe (reference `test()`). */
  def testConnection(conf: Conf): Unit = {
    val (code, _) = send(request(conf, "subjects").GET().build())
    if (code != 200)
      throw new IllegalArgumentException(
        s"schema registry at ${conf.endpoint} returned $code (expected 200 on GET subjects)")
  }

  /** Writer schema JSON for a message's framed schema id. */
  def schemaById(conf: Conf, id: Int): String = {
    val (code, body) = send(request(conf, s"schemas/ids/$id").GET().build())
    if (code == 404)
      throw new IllegalArgumentException(s"schema id $id not found in registry")
    if (code != 200)
      throw new IllegalArgumentException(s"schema registry error $code fetching id $id")
    mapper.readTree(body).get("schema").asText()
  }

  /** Cached writer schema for a framed id, as a Spark StructType. */
  def structTypeForId(conf: Conf, id: Int): StructType =
    byIdCache.computeIfAbsent((conf.endpoint, id),
      _ => AvroCodec.parseAvroSchema(schemaById(conf, id)))

  /** Latest (id, schema) for a subject. */
  def latest(conf: Conf, subject: String): (Int, String) = {
    val (code, body) = send(
      request(conf, s"subjects/${enc(subject)}/versions/latest").GET().build())
    if (code != 200)
      throw new IllegalArgumentException(
        s"schema registry error $code fetching latest version of '$subject'")
    val n = mapper.readTree(body)
    (n.get("id").asInt(), n.get("schema").asText())
  }

  /** Register a schema under a subject; returns the registry-assigned id
    * (idempotent server-side for an identical schema).
    */
  def register(conf: Conf, subject: String, schemaJson: String,
      schemaType: String = "AVRO"): Int = {
    val payload = mapper.createObjectNode()
    payload.put("schema", schemaJson)
    payload.put("schemaType", schemaType)
    val (code, body) = send(
      request(conf, s"subjects/${enc(subject)}/versions")
        .POST(HttpRequest.BodyPublishers.ofString(payload.toString)).build())
    code match {
      case 200 => mapper.readTree(body).get("id").asInt()
      case 409 => throw new IllegalArgumentException(
        s"incompatible schema for subject '$subject': $body")
      case 422 => throw new IllegalArgumentException(s"invalid schema: $body")
      case 401 => throw new IllegalArgumentException("invalid credentials for schema registry")
      case c => throw new IllegalArgumentException(s"schema registry returned error $c: $body")
    }
  }

  /** The reference's subject convention for kafka topics: `{topic}-value`. */
  def valueSubject(options: Map[String, String]): String =
    options.getOrElse("topic", "graft") + "-value"

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")
}
