package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

/** A REAL MQTT 3.1.1 implementation over TCP (pure JDK sockets) — the
  * wire half of the reference's mqtt connector
  * (crates/arroyo-connectors/src/mqtt/). MQTT 3.1.1 is the OASIS-standard
  * binary protocol: 2+-byte fixed header (packet type + flags, varint
  * remaining-length), length-prefixed UTF-8 strings, u16 packet ids.
  * [[MqttClient]] implements the client side at QoS 0 and 1 (CONNECT/
  * CONNACK, SUBSCRIBE/SUBACK, PUBLISH/PUBACK both directions, PINGREQ/
  * PINGRESP, DISCONNECT) against ANY 3.1.1 broker. [[MqttServer]] is a
  * minimal loopback broker speaking the same frames for
  * infrastructure-free integration specs, and [[MqttBridge]] lands
  * deliveries in the [[MessageBroker]] seam the `graft-mq` DSv2 tables
  * read — wire subscription → Spark source with no further plumbing.
  */
object MqttWire {

  // packet types
  final val CONNECT = 1; final val CONNACK = 2; final val PUBLISH = 3
  final val PUBACK = 4; final val SUBSCRIBE = 8; final val SUBACK = 9
  final val PINGREQ = 12; final val PINGRESP = 13; final val DISCONNECT = 14

  /** MQTT varint remaining-length: 7 bits per byte, MSB = continuation,
    * max 4 bytes (value ≤ 268 435 455).
    */
  private[graft] def writeVarint(out: OutputStream, n0: Int): Unit = {
    require(n0 >= 0 && n0 <= 268435455, s"remaining length out of range: $n0")
    var n = n0
    var continue = true
    while (continue) {
      var b = n % 128
      n /= 128
      if (n > 0) b |= 0x80 else continue = false
      out.write(b)
    }
  }

  private[graft] def readVarint(in: InputStream): Int = {
    var mult = 1
    var value = 0
    var i = 0
    var continue = true
    while (continue) {
      val b = in.read()
      require(b >= 0, "connection closed in remaining-length")
      value += (b & 0x7f) * mult
      mult *= 128
      i += 1
      require(i <= 4, "malformed remaining-length (over 4 bytes)")
      continue = (b & 0x80) != 0
    }
    value
  }

  private[sources] def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private[sources] def putU16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }

  private[sources] def putStr(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    putU16(out, b.length); out.write(b, 0, b.length)
  }

  /** One whole control packet: (type, flags, body). */
  private[sources] def readPacket(in: InputStream): (Int, Int, Array[Byte]) = {
    val h = in.read()
    if (h < 0) return (-1, 0, Array.emptyByteArray)
    val len = readVarint(in)
    val body = new Array[Byte](len)
    var off = 0
    while (off < len) {
      val r = in.read(body, off, len - off)
      require(r >= 0, "connection closed mid-packet")
      off += r
    }
    ((h >> 4) & 0xf, h & 0xf, body)
  }

  private[sources] def writePacket(out: OutputStream, tpe: Int, flags: Int,
      body: Array[Byte]): Unit = out.synchronized {
    out.write((tpe << 4) | flags)
    writeVarint(out, body.length)
    out.write(body)
    out.flush()
  }
}

/** MQTT 3.1.1 client: QoS 0/1 publish + subscribe. Deliveries run on the
  * reader thread; QoS-1 publishes block until PUBACK (5 s timeout).
  */
final class MqttClient(host: String, port: Int, clientId: String = "graft") extends AutoCloseable {
  import MqttWire._

  private val socket = new Socket(host, port)
  private val in = new BufferedInputStream(socket.getInputStream)
  private val out = new BufferedOutputStream(socket.getOutputStream)
  private val closed = new AtomicBoolean(false)
  private val nextId = new AtomicInteger(1)
  private val pendingAcks = new ConcurrentHashMap[Int, CountDownLatch]()
  private val handlers = new ConcurrentHashMap[String, (String, Array[Byte]) => Unit]()

  // CONNECT / CONNACK handshake, synchronous before the reader starts
  locally {
    val b = new ByteArrayOutputStream()
    putStr(b, "MQTT"); b.write(4) // protocol level 3.1.1
    b.write(0x02) // clean session
    putU16(b, 60) // keepalive seconds
    putStr(b, clientId)
    writePacket(out, CONNECT, 0, b.toByteArray)
    val (tpe, _, body) = readPacket(in)
    require(tpe == CONNACK && body.length == 2 && body(1) == 0,
      s"CONNACK expected, got type=$tpe rc=${body.lastOption.getOrElse(-1)}")
  }

  private val reader = new Thread(() => {
    try {
      var continue = true
      while (continue && !closed.get()) {
        val (tpe, flags, body) = readPacket(in)
        tpe match {
          case -1 => continue = false
          case PUBLISH =>
            val qos = (flags >> 1) & 0x3
            val topicLen = u16(body, 0)
            val topic = new String(body, 2, topicLen, UTF_8)
            val (payloadOff, pid) =
              if (qos > 0) (2 + topicLen + 2, u16(body, 2 + topicLen)) else (2 + topicLen, 0)
            val payload = java.util.Arrays.copyOfRange(body, payloadOff, body.length)
            if (qos == 1) {
              val ack = new ByteArrayOutputStream(); putU16(ack, pid)
              writePacket(out, PUBACK, 0, ack.toByteArray)
            }
            val h = handlers.get(topic)
            if (h != null) h(topic, payload)
          case PUBACK | SUBACK =>
            // both carry a u16 packet id first; SUBACK additionally has
            // return codes, ignored here (QoS-1-only subset)
            val l = pendingAcks.remove(u16(body, 0))
            if (l != null) l.countDown()
          case PINGREQ => writePacket(out, PINGRESP, 0, Array.emptyByteArray)
          case _ => () // PINGRESP: nothing pending on it here
        }
      }
    } catch { case _: Exception if closed.get() => () }
  }, s"mqtt-client-$clientId")
  reader.setDaemon(true)
  reader.start()

  /** Non-zero u16 packet id (MQTT-2.3.1-1 forbids id 0 in every packet
    * that carries one — SUBSCRIBE included; conforming brokers close the
    * connection on 0, which the shared counter would emit at wrap).
    */
  private def nextPid(): Int = {
    var p = nextId.getAndIncrement() & 0xffff
    while (p == 0) p = nextId.getAndIncrement() & 0xffff
    p
  }

  /** Exact-topic subscription at QoS 1 (the subset the connector uses).
    * Blocks until the broker's SUBACK (same latch pattern as the QoS-1
    * publish/PUBACK flow): returning earlier would let a `wire='true'`
    * DDL bridge silently lose messages published immediately after
    * WireBridges.ensure (ADVICE r6).
    */
  def subscribe(topic: String)(handler: (String, Array[Byte]) => Unit): Unit = {
    handlers.put(topic, handler)
    val pid = nextPid()
    val latch = new CountDownLatch(1)
    pendingAcks.put(pid, latch)
    try {
      val b = new ByteArrayOutputStream()
      putU16(b, pid)
      putStr(b, topic); b.write(1) // requested QoS 1
      writePacket(out, SUBSCRIBE, 0x2, b.toByteArray)
      require(latch.await(5, TimeUnit.SECONDS), s"no SUBACK for pid=$pid within 5s")
    } finally pendingAcks.remove(pid)
  }

  /** QoS-1 publish: blocks until the broker's PUBACK. */
  def publish(topic: String, payload: Array[Byte]): Unit = {
    val pid = nextPid()
    val latch = new CountDownLatch(1)
    pendingAcks.put(pid, latch)
    try {
      val b = new ByteArrayOutputStream()
      putStr(b, topic); putU16(b, pid); b.write(payload, 0, payload.length)
      writePacket(out, PUBLISH, 0x2 /* QoS 1 */, b.toByteArray)
      require(latch.await(5, TimeUnit.SECONDS), s"no PUBACK for pid=$pid within 5s")
    } finally pendingAcks.remove(pid) // no leak when the await times out
  }

  /** PIPELINED QoS-1 publish: up to `maxInFlight` messages outstanding
    * before blocking on the oldest PUBACK — MQTT 3.1.1 explicitly allows
    * multiple in-flight QoS-1 packets (the receive-maximum notion 5.0
    * formalizes); one-RTT-per-message is a CLIENT limitation, not a
    * protocol one. Still at-least-once: the method returns only after
    * EVERY payload is acknowledged. `maxInFlight` < 65535 keeps pids
    * unambiguous within the window.
    */
  def publishAll(topic: String, payloads: Iterator[Array[Byte]],
      maxInFlight: Int = 32): Long = {
    require(maxInFlight > 0 && maxInFlight < 0xffff)
    val inFlight = new java.util.ArrayDeque[(Int, CountDownLatch)]()
    def awaitOldest(): Unit = {
      val (pid, latch) = inFlight.removeFirst()
      try require(latch.await(5, TimeUnit.SECONDS), s"no PUBACK for pid=$pid within 5s")
      finally pendingAcks.remove(pid)
    }
    var n = 0L
    payloads.foreach { payload =>
      if (inFlight.size >= maxInFlight) awaitOldest()
      val pid = nextPid()
      val latch = new CountDownLatch(1)
      pendingAcks.put(pid, latch)
      val b = new ByteArrayOutputStream()
      putStr(b, topic); putU16(b, pid); b.write(payload, 0, payload.length)
      writePacket(out, PUBLISH, 0x2 /* QoS 1 */, b.toByteArray)
      inFlight.addLast(pid -> latch)
      n += 1
    }
    while (!inFlight.isEmpty) awaitOldest()
    n
  }

  override def close(): Unit = {
    closed.set(true)
    try writePacket(out, MqttWire.DISCONNECT, 0, Array.emptyByteArray)
    catch { case _: Exception => () }
    try socket.close() catch { case _: Exception => () }
  }
}

/** Minimal loopback MQTT 3.1.1 broker: exact-topic fan-out at QoS 1
  * (PUBACK to the publisher; subscriber PUBACKs accepted and dropped).
  */
final class MqttServer extends AutoCloseable {
  import MqttWire._

  private val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
  private val closed = new AtomicBoolean(false)
  private val subs = new java.util.ArrayList[(String, OutputStream)]()
  private val serverPid = new AtomicInteger(1)

  def port: Int = server.getLocalPort

  private def deliver(topic: String, payload: Array[Byte]): Unit =
    subs.synchronized {
      subs.forEach { case (t, out) =>
        if (t == topic) {
          try {
            val b = new ByteArrayOutputStream()
            putStr(b, topic); putU16(b, serverPid.getAndIncrement() & 0xffff)
            b.write(payload, 0, payload.length)
            writePacket(out, PUBLISH, 0x2, b.toByteArray)
          } catch { case _: Exception => () }
        }
      }
    }

  private val acceptor = new Thread(() => {
    try {
      while (!closed.get()) {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), "mqtt-server-conn")
        t.setDaemon(true)
        t.start()
      }
    } catch { case _: Exception if closed.get() => () }
  }, "mqtt-server-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(sock: Socket): Unit = {
    val in = new BufferedInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)
    try {
      val (tpe, _, _) = readPacket(in)
      require(tpe == CONNECT, s"expected CONNECT, got $tpe")
      writePacket(out, CONNACK, 0, Array[Byte](0, 0))
      var continue = true
      while (continue && !closed.get()) {
        val (t, flags, body) = readPacket(in)
        t match {
          case -1 | DISCONNECT => continue = false
          case SUBSCRIBE =>
            // body: pid, then (topic, qos)+ — register each, SUBACK granted QoS 1
            val pid = u16(body, 0)
            var off = 2
            val granted = new ByteArrayOutputStream()
            putU16(granted, pid)
            while (off < body.length) {
              val len = u16(body, off)
              val topic = new String(body, off + 2, len, UTF_8)
              off += 2 + len + 1 // skip requested qos
              subs.synchronized { subs.add((topic, out)); () }
              granted.write(1)
            }
            writePacket(out, SUBACK, 0, granted.toByteArray)
          case PUBLISH =>
            val qos = (flags >> 1) & 0x3
            val topicLen = u16(body, 0)
            val topic = new String(body, 2, topicLen, UTF_8)
            val (payloadOff, pid) =
              if (qos > 0) (2 + topicLen + 2, u16(body, 2 + topicLen)) else (2 + topicLen, 0)
            val payload = java.util.Arrays.copyOfRange(body, payloadOff, body.length)
            if (qos == 1) {
              val ack = new ByteArrayOutputStream(); putU16(ack, pid)
              writePacket(out, PUBACK, 0, ack.toByteArray)
            }
            deliver(topic, payload)
          case PINGREQ => writePacket(out, PINGRESP, 0, Array.emptyByteArray)
          case _ => () // subscriber PUBACKs etc.
        }
      }
    } catch { case _: Exception => () }
    finally { try sock.close() catch { case _: Exception => () } }
  }

  override def close(): Unit = {
    closed.set(true)
    try server.close() catch { case _: Exception => () }
  }
}

/** Wire ↔ seam bridge, mirroring [[NatsBridge]]. */
object MqttBridge {
  def subscribeInto(client: MqttClient, wireTopic: String,
      address: String, topic: String): Unit =
    client.subscribe(wireTopic) { (t, payload) =>
      MessageBroker.at(address).publish(topic, t.getBytes(UTF_8), payload)
    }

  def publishFrom(client: MqttClient, wireTopic: String,
      address: String, topic: String, from: Long = 0L): Long = {
    val broker = MessageBroker.at(address)
    val msgs = broker.fetch(topic, from, broker.size(topic))
    client.publishAll(wireTopic, msgs.iterator.map(_._2.value))
    from + msgs.length
  }
}
