package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

/** A REAL NATS client-protocol implementation over TCP (pure JDK sockets)
  * — the wire half of the reference's nats connector
  * (crates/arroyo-connectors/src/nats/). NATS core is a line-oriented
  * text protocol (public spec: docs.nats.io/reference/reference-protocols
  * /nats-protocol): the server greets `INFO {json}`, the client sends
  * `CONNECT {json}`, subscribes with `SUB <subject> <sid>`, publishes
  * with `PUB <subject> <nbytes>\r\n<payload>\r\n`, and deliveries arrive
  * as `MSG <subject> <sid> <nbytes>\r\n<payload>\r\n`; `PING`/`PONG`
  * keep the connection alive.
  *
  * [[NatsClient]] speaks that protocol to ANY core-NATS endpoint.
  * [[NatsServer]] is a minimal loopback broker speaking the same bytes —
  * the standard way to integration-test a protocol client in an
  * infrastructure-free environment: the spec drives real frames through
  * real sockets end-to-end. [[NatsBridge]] lands deliveries in the
  * [[MessageBroker]] registry, which is the seam the `graft-mq` DSv2
  * source/sink already read — so a wire subscription becomes a Spark
  * (micro-batch or batch) source with no further plumbing.
  */
object NatsWire {

  private[sources] def writeLine(out: OutputStream, s: String): Unit = {
    out.write(s.getBytes(UTF_8)); out.write('\r'); out.write('\n')
  }

  /** Read a CRLF-terminated protocol line (control lines are ASCII). */
  private[sources] def readLine(in: InputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != -1 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    if (c == -1 && sb.isEmpty) null else sb.toString
  }

  private[sources] def readPayload(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      require(r >= 0, "connection closed mid-payload")
      off += r
    }
    // trailing CRLF after the payload
    in.read(); in.read()
    buf
  }
}

/** Client side of the NATS wire protocol. Thread-safety: publishes are
  * synchronized on the output stream; deliveries run on a reader thread.
  */
final class NatsClient(host: String, port: Int, name: String = "graft") extends AutoCloseable {
  import NatsWire._

  private val socket = new Socket(host, port)
  private val in = new BufferedInputStream(socket.getInputStream)
  private val out = new BufferedOutputStream(socket.getOutputStream)
  private val handlers = new ConcurrentHashMap[String, (String, Array[Byte]) => Unit]()
  private val closed = new AtomicBoolean(false)
  // element type must be a REFERENCE type: with [Unit], poll's timeout
  // null coerces to () and the flush require can never fail — a missing
  // PONG would silently pass (caught by -feature's Unit!=null warning)
  private val pongs = new java.util.concurrent.LinkedBlockingQueue[java.lang.Boolean]()
  private var sid = 0

  // handshake: server speaks first
  locally {
    val info = readLine(in)
    require(info != null && info.startsWith("INFO "), s"not a NATS server: $info")
    out.synchronized {
      writeLine(out, s"""CONNECT {"verbose":false,"name":"$name","lang":"scala","version":"0"}""")
      out.flush()
    }
  }

  private val reader = new Thread(() => {
    try {
      var line = readLine(in)
      while (line != null && !closed.get()) {
        if (line.startsWith("MSG ")) {
          // MSG <subject> <sid> [reply-to] <nbytes>
          val parts = line.split(" ")
          val subject = parts(1)
          val msgSid = parts(2)
          val nBytes = parts.last.toInt
          val payload = readPayload(in, nBytes)
          val h = handlers.get(msgSid)
          if (h != null) h(subject, payload)
        } else if (line == "PING") {
          out.synchronized { writeLine(out, "PONG"); out.flush() }
        } else if (line == "PONG") {
          pongs.put(java.lang.Boolean.TRUE) // completes a pending flush()
        } // +OK / -ERR: nothing to do for this client
        line = readLine(in)
      }
    } catch { case _: Exception if closed.get() => () }
  }, s"nats-client-$name")
  reader.setDaemon(true)
  reader.start()

  /** Subscribe; `handler(subject, payload)` runs on the reader thread. */
  def subscribe(subject: String)(handler: (String, Array[Byte]) => Unit): String = {
    val id = this.synchronized { sid += 1; sid.toString }
    handlers.put(id, handler)
    out.synchronized { writeLine(out, s"SUB $subject $id"); out.flush() }
    id
  }

  def publish(subject: String, payload: Array[Byte]): Unit =
    out.synchronized {
      writeLine(out, s"PUB $subject ${payload.length}")
      out.write(payload); out.write('\r'); out.write('\n')
      out.flush()
    }

  private val flushLock = new Object

  /** Round-trip a PING so all prior publishes are known server-processed:
    * the protocol guarantees in-order processing per connection, so the
    * PONG arriving means every earlier PUB was handled. Blocks on the
    * actual PONG (5 s timeout), not a sleep. Serialized, and stale PONGs
    * (from a previous timed-out flush) are drained first so a retry
    * cannot be satisfied by its predecessor's late answer.
    */
  def flush(): Unit = flushLock.synchronized {
    pongs.clear()
    out.synchronized { writeLine(out, "PING"); out.flush() }
    require(pongs.poll(5, java.util.concurrent.TimeUnit.SECONDS) != null,
      "no PONG within 5s")
  }

  override def close(): Unit = {
    closed.set(true)
    try socket.close() catch { case _: Exception => () }
  }
}

/** Minimal loopback NATS server: full fan-out semantics for exact-subject
  * subscriptions (no wildcards — the subset the connector uses), real
  * sockets, real frames. One thread per connection.
  */
final class NatsServer extends AutoCloseable {
  import NatsWire._

  private val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
  private val closed = new AtomicBoolean(false)
  // subject -> list of (connection-out, sid); synchronized on `subs`
  private val subs = new java.util.ArrayList[(String, OutputStream, String)]()

  def port: Int = server.getLocalPort

  private def deliver(subject: String, payload: Array[Byte]): Unit =
    subs.synchronized {
      subs.forEach { case (subj, out, sid) =>
        if (subj == subject) {
          try {
            out.synchronized {
              writeLine(out, s"MSG $subject $sid ${payload.length}")
              out.write(payload); out.write('\r'); out.write('\n')
              out.flush()
            }
          } catch { case _: Exception => () } // dead subscriber: skip
        }
      }
    }

  private val acceptor = new Thread(() => {
    try {
      while (!closed.get()) {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), "nats-server-conn")
        t.setDaemon(true)
        t.start()
      }
    } catch { case _: Exception if closed.get() => () }
  }, "nats-server-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(sock: Socket): Unit = {
    val in = new BufferedInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)
    try {
      out.synchronized {
        writeLine(out, """INFO {"server_name":"graft-loopback","proto":1}""")
        out.flush()
      }
      var line = readLine(in)
      while (line != null && !closed.get()) {
        if (line.startsWith("PUB ")) {
          val parts = line.split(" ") // PUB <subject> [reply-to] <nbytes>
          val subject = parts(1)
          val payload = readPayload(in, parts.last.toInt)
          deliver(subject, payload)
        } else if (line.startsWith("SUB ")) {
          val parts = line.split(" ") // SUB <subject> [queue] <sid>
          subs.synchronized { subs.add((parts(1), out, parts.last)); () }
        } else if (line == "PING") {
          out.synchronized { writeLine(out, "PONG"); out.flush() }
        } // CONNECT / PONG: accepted silently
        line = readLine(in)
      }
    } catch { case _: Exception => () }
    finally { try sock.close() catch { case _: Exception => () } }
  }

  override def close(): Unit = {
    closed.set(true)
    try server.close() catch { case _: Exception => () }
  }
}

/** Wire ↔ seam bridge: a subscription that lands every delivery in the
  * [[MessageBroker]] registry topic the `graft-mq` DSv2 table reads, and
  * a drain that publishes a registry topic's messages out over the wire.
  */
object NatsBridge {
  /** Deliveries on `subject` → `MessageBroker.at(address)` topic. */
  def subscribeInto(client: NatsClient, subject: String,
      address: String, topic: String): String =
    client.subscribe(subject) { (subj, payload) =>
      MessageBroker.at(address).publish(topic, subj.getBytes(UTF_8), payload)
    }

  /** Registry topic range [from, until) → wire publishes, in order. */
  def publishFrom(client: NatsClient, subject: String,
      address: String, topic: String, from: Long = 0L): Long = {
    val broker = MessageBroker.at(address)
    val msgs = broker.fetch(topic, from, broker.size(topic))
    msgs.foreach { case (_, m) => client.publish(subject, m.value) }
    from + msgs.length
  }

  private val UTF_8 = java.nio.charset.StandardCharsets.UTF_8
}
