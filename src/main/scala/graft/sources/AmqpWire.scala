package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

/** A REAL AMQP 0-9-1 implementation over TCP (pure JDK sockets) — the
  * wire half of the reference's rabbitmq connector
  * (crates/arroyo-connectors/src/rabbitmq/). AMQP 0-9-1 is the public
  * OASIS/RabbitMQ spec: an 8-byte protocol header, then framed traffic
  * (frame type u8, channel u16, size u32, payload, 0xCE frame-end) in
  * network byte order; METHOD frames carry (class-id, method-id, args)
  * with shortstr/longstr/field-table/packed-bit encodings, and message
  * content travels as a HEADER frame (class, weight, body-size,
  * property-flags) followed by BODY frames.
  *
  * [[AmqpClient]] implements the client side of the connection/channel
  * negotiation (connection.start → start-ok with PLAIN auth → tune →
  * tune-ok → open → open-ok, channel.open), queue.declare,
  * basic.publish (default exchange → queue routing, the connector's
  * shape) and basic.consume at no-ack, against any 0-9-1 broker.
  * [[AmqpServer]] is the loopback broker speaking the same frames for
  * infrastructure-free integration specs; [[AmqpBridge]] lands
  * deliveries in the [[MessageBroker]] seam the `graft-mq` DSv2 tables
  * read.
  */
object AmqpWire {

  final val FrameMethod = 1
  final val FrameHeader = 2
  final val FrameBody = 3
  final val FrameHeartbeat = 8
  final val FrameEnd = 0xCE

  final case class Frame(tpe: Int, channel: Int, payload: Array[Byte])

  private[graft] def readFrame(in: DataInputStream): Frame = {
    val tpe = in.read()
    if (tpe < 0) throw new EOFException("connection closed")
    val channel = in.readUnsignedShort()
    val size = in.readInt()
    require(size >= 0 && size <= (1 << 24), s"frame size out of range: $size")
    val payload = new Array[Byte](size)
    in.readFully(payload)
    require(in.read() == FrameEnd, "missing frame-end octet")
    Frame(tpe, channel, payload)
  }

  private[graft] def writeFrame(out: DataOutputStream, tpe: Int, channel: Int,
      payload: Array[Byte]): Unit = out.synchronized {
    out.write(tpe)
    out.writeShort(channel)
    out.writeInt(payload.length)
    out.write(payload)
    out.write(FrameEnd)
    out.flush()
  }

  /** Builder for method/header payloads (network byte order throughout). */
  final class Args {
    private val bos = new ByteArrayOutputStream()
    private val out = new DataOutputStream(bos)
    def u8(v: Int): Args = { out.write(v); this }
    def u16(v: Int): Args = { out.writeShort(v); this }
    def u32(v: Int): Args = { out.writeInt(v); this }
    def u64(v: Long): Args = { out.writeLong(v); this }
    def shortstr(s: String): Args = {
      val b = s.getBytes(UTF_8)
      require(b.length < 256, "shortstr overflow")
      out.write(b.length); out.write(b); this
    }
    def longstr(b: Array[Byte]): Args = { out.writeInt(b.length); out.write(b); this }
    def longstr(s: String): Args = longstr(s.getBytes(UTF_8))
    def emptyTable(): Args = { out.writeInt(0); this }
    def bytes: Array[Byte] = { out.flush(); bos.toByteArray }
  }

  /** Cursor over method/header payloads. */
  final class Reader(b: Array[Byte]) {
    private var pos = 0
    def u8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val v = ((b(pos) & 0xff) << 8) | (b(pos + 1) & 0xff); pos += 2; v }
    def u32(): Long = { var v = 0L; (0 until 4).foreach(i => v = (v << 8) | (b(pos + i) & 0xff)); pos += 4; v }
    def u64(): Long = { var v = 0L; (0 until 8).foreach(i => v = (v << 8) | (b(pos + i) & 0xff)); pos += 8; v }
    def shortstr(): String = {
      val n = u8(); val s = new String(b, pos, n, UTF_8); pos += n; s
    }
    def longstrBytes(): Array[Byte] = {
      val n = u32().toInt; val s = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; s
    }
    /** Field tables are skipped by their byte length — a client needs none
      * of the server-properties content to negotiate.
      */
    def skipTable(): Unit = { val n = u32().toInt; pos += n }
  }

  private[graft] def method(classId: Int, methodId: Int)(f: Args => Args): Array[Byte] =
    f(new Args().u16(classId).u16(methodId)).bytes

  /** Content HEADER payload for class 60 (basic): weight 0, body size,
    * no properties.
    */
  private[graft] def contentHeader(bodySize: Long): Array[Byte] =
    new Args().u16(60).u16(0).u64(bodySize).u16(0).bytes

  val ProtocolHeader: Array[Byte] = Array[Byte]('A', 'M', 'Q', 'P', 0, 0, 9, 1)
}

/** AMQP 0-9-1 client: one connection, one channel, default-exchange
  * publish and no-ack consume (the connector's shape). Deliveries run on
  * the reader thread.
  */
final class AmqpClient(host: String, port: Int,
    user: String = "guest", pass: String = "guest") extends AutoCloseable {
  import AmqpWire._

  private val socket = new Socket(host, port)
  private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
  private val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))
  private val closed = new AtomicBoolean(false)
  private val handlers = new ConcurrentHashMap[String, (String, Array[Byte]) => Unit]()
  // synchronous method replies during setup/declare/consume (unbounded so
  // the reader thread never blocks on an unawaited reply)
  private val replies = new java.util.concurrent.LinkedBlockingQueue[(Int, Int, Reader)]()
  // publisher-confirm state (class 85): publish sequence numbers are
  // delivery tags; `outstanding` holds unacked tags, drained by the
  // reader on basic.ack (single or cumulative `multiple`)
  private val confirmsOn = new AtomicBoolean(false)
  private var publishSeq = 0L // guarded by out.synchronized
  private val outstanding = new java.util.TreeSet[Long]()

  // ── connection negotiation (synchronous, before the reader starts) ──
  locally {
    out.synchronized { out.write(ProtocolHeader); out.flush() }
    expectMethodSync(10, 10) // connection.start (props/mechanisms skipped)
    writeFrame(out, FrameMethod, 0, method(10, 11) { a => // start-ok
      a.emptyTable().shortstr("PLAIN")
        .longstr(Array[Byte](0) ++ user.getBytes(UTF_8) ++ Array[Byte](0) ++ pass.getBytes(UTF_8))
        .shortstr("en_US")
    })
    val tune = expectMethodSync(10, 30) // connection.tune
    val channelMax = tune.u16(); val frameMax = tune.u32().toInt
    writeFrame(out, FrameMethod, 0, method(10, 31) { a => // tune-ok: echo
      a.u16(channelMax).u32(if (frameMax == 0) 131072 else frameMax).u16(0)
    })
    writeFrame(out, FrameMethod, 0, method(10, 40)(_.shortstr("/").shortstr("").u8(0))) // open
    expectMethodSync(10, 41) // open-ok
    writeFrame(out, FrameMethod, 1, method(20, 10)(_.shortstr(""))) // channel.open
    expectMethodSync(20, 11) // channel.open-ok
  }

  /** During setup the reader thread isn't running: read frames inline. */
  private def expectMethodSync(classId: Int, methodId: Int): Reader = {
    var f = readFrame(in)
    while (f.tpe == FrameHeartbeat) f = readFrame(in)
    require(f.tpe == FrameMethod, s"expected METHOD frame, got ${f.tpe}")
    val r = new Reader(f.payload)
    val (c, m) = (r.u16(), r.u16())
    require(c == classId && m == methodId, s"expected ($classId,$methodId), got ($c,$m)")
    c match {
      case 10 if m == 10 => { r.u8(); r.u8(); r.skipTable() } // start: versions + props
      case _ => ()
    }
    r
  }

  private val reader = new Thread(() => {
    try {
      var pendingKey: String = null
      var pendingSize = 0L
      val pendingBody = new ByteArrayOutputStream()
      while (!closed.get()) {
        val f = readFrame(in)
        f.tpe match {
          case FrameMethod =>
            val r = new Reader(f.payload)
            val (c, m) = (r.u16(), r.u16())
            if (c == 60 && m == 60) { // basic.deliver
              r.shortstr() // consumer-tag
              r.u64() // delivery-tag
              r.u8() // redelivered bit
              r.shortstr() // exchange
              pendingKey = r.shortstr() // routing key = queue
              pendingBody.reset()
            } else if (c == 60 && m == 80) { // basic.ack (publisher confirm)
              val tag = r.u64()
              val multiple = (r.u8() & 1) != 0
              outstanding.synchronized {
                if (multiple) { outstanding.headSet(tag, true).clear(); () }
                else { outstanding.remove(tag); () }
                outstanding.notifyAll()
              }
            } else replies.put((c, m, r))
          case FrameHeader =>
            val r = new Reader(f.payload)
            r.u16(); r.u16() // class, weight
            pendingSize = r.u64()
            if (pendingSize == 0) dispatch(pendingKey, pendingBody)
          case FrameBody =>
            pendingBody.write(f.payload, 0, f.payload.length)
            if (pendingBody.size >= pendingSize) dispatch(pendingKey, pendingBody)
          case _ => () // heartbeat
        }
      }
    } catch { case _: Exception if closed.get() => () case _: EOFException => () }
  }, "amqp-client-reader")

  private def dispatch(key: String, body: ByteArrayOutputStream): Unit = {
    val h = handlers.get(key)
    if (h != null) h(key, body.toByteArray)
  }

  reader.setDaemon(true)
  reader.start()

  private def awaitReply(classId: Int, methodId: Int): Reader = {
    val (c, m, r) = replies.poll(5, java.util.concurrent.TimeUnit.SECONDS) match {
      case null => throw new IllegalStateException(s"no ($classId,$methodId) reply within 5s")
      case x => x
    }
    require(c == classId && m == methodId, s"expected ($classId,$methodId), got ($c,$m)")
    r
  }

  def declareQueue(name: String): String = {
    writeFrame(out, FrameMethod, 1, method(50, 10) { a => // queue.declare
      a.u16(0).shortstr(name).u8(0).emptyTable()
    })
    awaitReply(50, 11).shortstr() // declare-ok → queue name
  }

  /** Publish to the default exchange with the queue name as routing key.
    * Bodies are chunked at 64 KiB, under every broker's frame-max.
    */
  def publish(queue: String, payload: Array[Byte]): Unit =
    // ONE lock over the whole method+header+body sequence: AMQP requires
    // content frames to immediately follow basic.publish on the channel,
    // so concurrent publishers must not interleave (writeFrame's own
    // per-frame lock is reentrant under this one)
    out.synchronized {
      // in confirm mode EVERY publish consumes a delivery tag (spec), so
      // fire-and-forget publishes after enableConfirms keep tags aligned
      if (confirmsOn.get) publishSeq += 1
      writeFrame(out, FrameMethod, 1, method(60, 40) { a => // basic.publish
        a.u16(0).shortstr("").shortstr(queue).u8(0)
      })
      writeFrame(out, FrameHeader, 1, contentHeader(payload.length.toLong))
      var off = 0
      while (off < payload.length) { // empty body: header only, no body frame
        val n = math.min(65536, payload.length - off)
        writeFrame(out, FrameBody, 1, java.util.Arrays.copyOfRange(payload, off, off + n))
        off += n
      }
    }

  /** Enable PUBLISHER CONFIRMS (class 85, the RabbitMQ extension every
    * 0-9-1 broker ships): after confirm.select/select-ok, the broker
    * basic.ack's every publish by its sequence-number delivery tag —
    * the at-least-once handshake fire-and-forget publish lacks.
    */
  def enableConfirms(): Unit = {
    writeFrame(out, FrameMethod, 1, method(85, 10)(_.u8(0))) // confirm.select
    awaitReply(85, 11) // select-ok
    confirmsOn.set(true)
  }

  /** Publish and block until the broker's basic.ack for THIS message
    * (single or cumulative `multiple` acks both count it). Requires
    * [[enableConfirms]].
    */
  def publishConfirmed(queue: String, payload: Array[Byte]): Unit = {
    require(confirmsOn.get, "publishConfirmed requires enableConfirms() first")
    val tag = out.synchronized { // same lock as publish: tags == wire order
      val t = publishSeq + 1 // publish() itself advances the counter
      outstanding.synchronized { outstanding.add(t); () }
      publish(queue, payload)
      t
    }
    val deadline = System.nanoTime() + 5000000000L
    outstanding.synchronized {
      while (outstanding.contains(tag)) {
        val remainMs = (deadline - System.nanoTime()) / 1000000L
        require(remainMs > 0, s"no basic.ack for tag=$tag within 5s")
        outstanding.wait(remainMs)
      }
    }
  }

  /** no-ack consume; `handler(routingKey, body)` on the reader thread. */
  def consume(queue: String)(handler: (String, Array[Byte]) => Unit): String = {
    handlers.put(queue, handler)
    writeFrame(out, FrameMethod, 1, method(60, 20) { a => // basic.consume
      a.u16(0).shortstr(queue).shortstr("").u8(0x02 /* no-ack */).emptyTable()
    })
    awaitReply(60, 21).shortstr() // consume-ok → consumer tag
  }

  override def close(): Unit = {
    closed.set(true)
    try socket.close() catch { case _: Exception => () }
  }
}

/** Minimal loopback AMQP 0-9-1 broker: full negotiation, named queues,
  * default-exchange routing, no-ack fan-out to every consumer of a
  * queue. One thread per connection.
  */
final class AmqpServer extends AutoCloseable {
  import AmqpWire._

  private val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
  private val closed = new AtomicBoolean(false)
  // queue -> consumers (out stream, channel)
  private val consumers = new java.util.ArrayList[(String, DataOutputStream)]()

  def port: Int = server.getLocalPort

  private def deliver(queue: String, payload: Array[Byte]): Unit =
    consumers.synchronized {
      consumers.forEach { case (q, cout) =>
        if (q == queue) {
          try {
            writeFrame(cout, FrameMethod, 1, method(60, 60) { a => // basic.deliver
              a.shortstr("ctag").u64(1L).u8(0).shortstr("").shortstr(queue)
            })
            writeFrame(cout, FrameHeader, 1, contentHeader(payload.length.toLong))
            // chunk at 64 KiB like AmqpClient.publish: the tune we sent
            // advertised frame-max 131072, and a spec-conforming client
            // rejects any frame over the negotiated max (ADVICE r6)
            var off = 0
            while (off < payload.length) { // empty body: header only
              val n = math.min(65536, payload.length - off)
              writeFrame(cout, FrameBody, 1,
                java.util.Arrays.copyOfRange(payload, off, off + n))
              off += n
            }
          } catch { case _: Exception => () }
        }
      }
    }

  private val acceptor = new Thread(() => {
    try {
      while (!closed.get()) {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), "amqp-server-conn")
        t.setDaemon(true)
        t.start()
      }
    } catch { case _: Exception if closed.get() => () }
  }, "amqp-server-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(sock: Socket): Unit = {
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    try {
      val header = new Array[Byte](8)
      in.readFully(header)
      require(java.util.Arrays.equals(header, ProtocolHeader), "not AMQP 0-9-1")
      writeFrame(out, FrameMethod, 0, method(10, 10) { a => // connection.start
        a.u8(0).u8(9).emptyTable().longstr("PLAIN").longstr("en_US")
      })
      var pendingQueue: String = null
      var pendingSize = 0L
      val pendingBody = new ByteArrayOutputStream()
      // publisher confirms (class 85): once selected, every completed
      // publish on this connection is basic.ack'd with its delivery tag
      var confirmMode = false
      var confirmTag = 0L
      def ackIfConfirming(): Unit = if (confirmMode) {
        confirmTag += 1
        writeFrame(out, FrameMethod, 1, method(60, 80)(_.u64(confirmTag).u8(0)))
      }
      var continue = true
      while (continue && !closed.get()) {
        val f = readFrame(in)
        f.tpe match {
          case FrameMethod =>
            val r = new Reader(f.payload)
            val (c, m) = (r.u16(), r.u16())
            (c, m) match {
              case (10, 11) => // start-ok (PLAIN creds accepted)
                writeFrame(out, FrameMethod, 0, method(10, 30)(_.u16(0).u32(131072).u16(0)))
              case (10, 31) => () // tune-ok
              case (10, 40) => // connection.open
                writeFrame(out, FrameMethod, 0, method(10, 41)(_.shortstr("")))
              case (20, 10) => // channel.open
                writeFrame(out, FrameMethod, f.channel, method(20, 11)(_.longstr("")))
              case (50, 10) => // queue.declare
                r.u16(); val q = r.shortstr()
                writeFrame(out, FrameMethod, f.channel,
                  method(50, 11)(_.shortstr(q).u32(0).u32(0)))
              case (60, 20) => // basic.consume
                r.u16(); val q = r.shortstr()
                consumers.synchronized { consumers.add((q, out)); () }
                writeFrame(out, FrameMethod, f.channel, method(60, 21)(_.shortstr("ctag")))
              case (60, 40) => // basic.publish
                r.u16(); r.shortstr() // exchange ("")
                pendingQueue = r.shortstr()
                pendingBody.reset()
              case (85, 10) => // confirm.select
                confirmMode = true
                writeFrame(out, FrameMethod, f.channel, method(85, 11)(a => a))
              case (10, 50) | (20, 40) => continue = false // close
              case _ => ()
            }
          case FrameHeader =>
            val r = new Reader(f.payload)
            r.u16(); r.u16()
            pendingSize = r.u64()
            if (pendingSize == 0) { deliver(pendingQueue, Array.emptyByteArray); ackIfConfirming() }
          case FrameBody =>
            pendingBody.write(f.payload, 0, f.payload.length)
            if (pendingBody.size >= pendingSize) {
              deliver(pendingQueue, pendingBody.toByteArray)
              ackIfConfirming()
            }
          case _ => () // heartbeat
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

/** Wire ↔ seam bridge, mirroring [[NatsBridge]]/[[MqttBridge]]. */
object AmqpBridge {
  def consumeInto(client: AmqpClient, queue: String,
      address: String, topic: String): String = {
    client.declareQueue(queue)
    client.consume(queue) { (q, payload) =>
      MessageBroker.at(address).publish(topic, q.getBytes(UTF_8), payload)
    }
  }

  def publishFrom(client: AmqpClient, queue: String,
      address: String, topic: String, from: Long = 0L): Long = {
    val broker = MessageBroker.at(address)
    val msgs = broker.fetch(topic, from, broker.size(topic))
    msgs.foreach { case (_, m) => client.publish(queue, m.value) }
    from + msgs.length
  }
}
