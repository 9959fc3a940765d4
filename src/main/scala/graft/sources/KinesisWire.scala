package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import java.net.{HttpURLConnection, InetSocketAddress, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec
import scala.collection.concurrent.TrieMap

/** AWS Signature Version 4 request signing, pure JDK (HMAC-SHA256 +
  * SHA-256) — the public algorithm from the AWS General Reference
  * (docs.aws.amazon.com/general/latest/gr/sigv4-create-canonical-request
  * .html and siblings): canonical request → string-to-sign → derived
  * signing key (AWS4+secret → date → region → service → "aws4_request")
  * → signature → Authorization header. Spec-verified against the
  * worked IAM ListUsers example AWS publishes with its documentation.
  */
object SigV4 {

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  private def sha256Hex(data: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(data).map(b => f"$b%02x").mkString

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  /** `headers` must carry lowercase names; they are canonicalized in
    * sorted order. Returns the full `Authorization` header value.
    */
  def authorization(method: String, path: String, query: String,
      headers: Seq[(String, String)], payload: Array[Byte],
      accessKey: String, secretKey: String, region: String, service: String,
      amzDate: String): String = {
    val date = amzDate.take(8)
    val sortedHeaders = headers.sortBy(_._1)
    val canonicalHeaders = sortedHeaders.map { case (k, v) => s"$k:${v.trim}\n" }.mkString
    val signedHeaders = sortedHeaders.map(_._1).mkString(";")
    val canonicalRequest =
      s"$method\n$path\n$query\n$canonicalHeaders\n$signedHeaders\n${sha256Hex(payload)}"
    val scope = s"$date/$region/$service/aws4_request"
    val stringToSign =
      s"AWS4-HMAC-SHA256\n$amzDate\n$scope\n${sha256Hex(canonicalRequest.getBytes(UTF_8))}"
    val kSigning = hmac(hmac(hmac(hmac(
      s"AWS4$secretKey".getBytes(UTF_8), date), region), service), "aws4_request")
    val signature = hex(hmac(kSigning, stringToSign))
    s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$signature"
  }
}

/** A REAL Kinesis Data Streams API client — the wire half of the
  * reference's kinesis connector (crates/arroyo-connectors/src/kinesis/).
  * Kinesis speaks JSON over HTTP(S) POST: `X-Amz-Target:
  * Kinesis_20131202.<Op>`, `Content-Type: application/x-amz-json-1.1`,
  * base64 record data, every request SigV4-signed. This client
  * implements PutRecord / GetShardIterator / GetRecords over
  * `HttpURLConnection` against any endpoint URL (AWS or a loopback
  * emulator), with real [[SigV4]] signatures on every call.
  */
final class KinesisClient(endpoint: String, region: String,
    accessKey: String, secretKey: String) extends AutoCloseable {

  private val mapper = new ObjectMapper()
  private val url = new URL(endpoint)
  private val hostHeader =
    if (url.getPort > 0 && url.getPort != url.getDefaultPort) s"${url.getHost}:${url.getPort}"
    else url.getHost

  private def amzNow(): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())

  private[sources] def call(target: String, bodyJson: String): com.fasterxml.jackson.databind.JsonNode = {
    val payload = bodyJson.getBytes(UTF_8)
    val amzDate = amzNow()
    val headers = Seq(
      "content-type" -> "application/x-amz-json-1.1",
      "host" -> hostHeader,
      "x-amz-date" -> amzDate,
      "x-amz-target" -> s"Kinesis_20131202.$target")
    val auth = SigV4.authorization("POST", "/", "", headers, payload,
      accessKey, secretKey, region, "kinesis", amzDate)
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    headers.filterNot(_._1 == "host").foreach { case (k, v) => conn.setRequestProperty(k, v) }
    conn.setRequestProperty("Authorization", auth)
    conn.getOutputStream.write(payload)
    val code = conn.getResponseCode
    val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val resp = if (in == null) Array.emptyByteArray else in.readAllBytes()
    require(code == 200, s"$target failed: HTTP $code ${new String(resp, UTF_8)}")
    mapper.readTree(resp)
  }

  private def q(s: String): String = mapper.writeValueAsString(s)

  /** Returns the record's sequence number. */
  def putRecord(stream: String, partitionKey: String, data: Array[Byte]): String =
    call("PutRecord",
      s"""{"StreamName":${q(stream)},"PartitionKey":${q(partitionKey)},"Data":${q(Base64.getEncoder.encodeToString(data))}}""")
      .get("SequenceNumber").asText()

  def getShardIterator(stream: String, shardId: String = "shardId-000000000000",
      iteratorType: String = "TRIM_HORIZON"): String =
    call("GetShardIterator",
      s"""{"StreamName":${q(stream)},"ShardId":${q(shardId)},"ShardIteratorType":${q(iteratorType)}}""")
      .get("ShardIterator").asText()

  /** (records as (partitionKey, data), next iterator). */
  def getRecords(iterator: String, limit: Int = 1000): (Seq[(String, Array[Byte])], String) = {
    val node = call("GetRecords", s"""{"ShardIterator":${q(iterator)},"Limit":$limit}""")
    val recs = node.get("Records")
    val out = (0 until recs.size()).map { i =>
      val r = recs.get(i)
      (r.get("PartitionKey").asText(), Base64.getDecoder.decode(r.get("Data").asText()))
    }
    (out, node.get("NextShardIterator").asText())
  }

  override def close(): Unit = ()
}

/** Loopback Kinesis Data Streams emulator (single shard per stream) on
  * the JDK's built-in HTTP server. It VERIFIES each request's SigV4
  * signature by recomputing it from the shared secret before answering —
  * so the integration spec proves the client's canonicalization and key
  * derivation end-to-end, not just the happy-path JSON.
  */
final class KinesisServer(accessKey: String, secretKey: String, region: String)
    extends AutoCloseable {

  private val mapper = new ObjectMapper()
  private val streams = TrieMap.empty[String, Vector[(String, String)]] // (pk, b64data)
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 16)

  def port: Int = server.getAddress.getPort
  def endpoint: String = s"http://127.0.0.1:$port/"

  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.start()

  private def respond(ex: HttpExchange, code: Int, json: String): Unit = {
    val b = json.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/x-amz-json-1.1")
    ex.sendResponseBody(code, b)
  }

  private def handle(ex: HttpExchange): Unit = try {
    val payload = ex.getRequestBody.readAllBytes()
    val h = ex.getRequestHeaders
    val amzDate = h.getFirst("X-Amz-Date")
    val target = h.getFirst("X-Amz-Target")
    val auth = h.getFirst("Authorization")
    // recompute the signature the client must have produced
    val expected = SigV4.authorization("POST", "/", "",
      Seq(
        "content-type" -> h.getFirst("Content-Type"),
        "host" -> h.getFirst("Host"),
        "x-amz-date" -> amzDate,
        "x-amz-target" -> target),
      payload, accessKey, secretKey, region, "kinesis", amzDate)
    if (auth != expected) {
      respond(ex, 403, s"""{"__type":"IncompleteSignatureException","expected":${mapper.writeValueAsString(expected)}}""")
      return
    }
    val body = mapper.readTree(payload)
    target.stripPrefix("Kinesis_20131202.") match {
      case "PutRecord" =>
        val stream = body.get("StreamName").asText()
        val seq = streams.updateWith(stream) { cur =>
          Some(cur.getOrElse(Vector.empty) :+
            (body.get("PartitionKey").asText(), body.get("Data").asText()))
        }.get.length - 1
        respond(ex, 200, s"""{"ShardId":"shardId-000000000000","SequenceNumber":"$seq"}""")
      case "GetShardIterator" =>
        val stream = body.get("StreamName").asText()
        respond(ex, 200, s"""{"ShardIterator":"$stream#0"}""")
      case "GetRecords" =>
        val Array(stream, posStr) = body.get("ShardIterator").asText().split("#", 2)
        val pos = posStr.toInt
        val limit = if (body.has("Limit")) body.get("Limit").asInt() else 1000
        val all = streams.getOrElse(stream, Vector.empty)
        val slice = all.slice(pos, math.min(pos + limit, all.length))
        val recs = slice.zipWithIndex.map { case ((pk, data), i) =>
          s"""{"PartitionKey":${mapper.writeValueAsString(pk)},"Data":${mapper.writeValueAsString(data)},"SequenceNumber":"${pos + i}"}"""
        }.mkString("[", ",", "]")
        respond(ex, 200,
          s"""{"Records":$recs,"NextShardIterator":"$stream#${pos + slice.length}","MillisBehindLatest":0}""")
      case other =>
        respond(ex, 400, s"""{"__type":"UnknownOperationException","op":"$other"}""")
    }
  } catch {
    case e: Exception =>
      respond(ex, 500, s"""{"__type":"InternalFailure","message":"${e.getMessage}"}""")
  } finally ex.close()

  private implicit class ExOps(ex: HttpExchange) {
    def sendResponseBody(code: Int, b: Array[Byte]): Unit = {
      ex.sendResponseHeaders(code, b.length.toLong)
      ex.getResponseBody.write(b)
    }
  }

  override def close(): Unit = server.stop(0)
}

/** Wire ↔ seam bridge, mirroring the other protocol bridges. */
object KinesisBridge {
  /** Drain all available records from TRIM_HORIZON into the seam topic;
    * returns the next shard iterator for incremental re-drains.
    */
  def drainInto(client: KinesisClient, stream: String,
      address: String, topic: String, iterator: Option[String] = None): String = {
    var it = iterator.getOrElse(client.getShardIterator(stream))
    var continue = true
    while (continue) {
      val (recs, next) = client.getRecords(it)
      recs.foreach { case (pk, data) =>
        MessageBroker.at(address).publish(topic, pk.getBytes(UTF_8), data)
      }
      continue = recs.nonEmpty
      it = next
    }
    it
  }

  def publishFrom(client: KinesisClient, stream: String,
      address: String, topic: String, from: Long = 0L): Long = {
    val broker = MessageBroker.at(address)
    val msgs = broker.fetch(topic, from, broker.size(topic))
    msgs.foreach { case (i, m) =>
      client.putRecord(stream, s"pk-$i", m.value)
    }
    from + msgs.length
  }
}
