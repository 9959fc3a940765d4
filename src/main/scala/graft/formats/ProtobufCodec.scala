package graft.formats

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.io.{ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Minimal protobuf wire-format codec over Spark rows — the reference's
  * ProtobufFormat (crates/arroyo-rpc/src/formats.rs:396-459,
  * crates/arroyo-formats/src/proto/) compiles a .proto descriptor; here the
  * DDL-declared StructType IS the message shape, mapped positionally:
  * column i (0-based) ⇒ proto field number i+1.
  *
  * Wire mapping (proto3 semantics):
  *   BOOLEAN/INT/BIGINT → varint ·  DOUBLE → fixed64 ·  FLOAT → fixed32
  *   STRING/BINARY → length-delimited ·  nested STRUCT → embedded message
  *   TIMESTAMP → varint epoch-micros ·  ARRAY → repeated (packed accepted
  *   on decode for numeric) ·  absent field → null (proto3 default elision)
  */
object ProtobufCodec {

  private final val Varint = 0
  private final val Fixed64 = 1
  private final val LenDelim = 2
  private final val Fixed32 = 5

  // ── low-level ─────────────────────────────────────────────────────────

  private def writeVarint(out: OutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def readVarint(in: InputStream): Long = {
    var shift = 0
    var acc = 0L
    var b = in.read()
    if (b < 0) throw new EOFException("proto: EOF in varint")
    while ((b & 0x80) != 0) {
      acc |= (b & 0x7fL) << shift
      shift += 7
      b = in.read()
      if (b < 0) throw new EOFException("proto: EOF in varint")
    }
    acc | ((b & 0x7fL) << shift)
  }

  private def readN(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException(s"proto: EOF reading $n bytes")
      off += r
    }
    buf
  }

  private def wireTypeOf(dt: DataType): Int = dt match {
    case BooleanType | IntegerType | LongType | ShortType | ByteType | TimestampType => Varint
    case DoubleType => Fixed64
    case FloatType => Fixed32
    case StringType | BinaryType | _: StructType | _: ArrayType => LenDelim
    case other => throw new IllegalArgumentException(s"proto: unsupported type $other")
  }

  // ── encode ────────────────────────────────────────────────────────────

  private def writeTag(out: OutputStream, fieldNum: Int, wire: Int): Unit =
    writeVarint(out, (fieldNum.toLong << 3) | wire)

  private def scalarToVarint(v: Any, dt: DataType): Long = dt match {
    case BooleanType => if (v.asInstanceOf[Boolean]) 1L else 0L
    case IntegerType => v.asInstanceOf[Int].toLong
    case ShortType => v.asInstanceOf[Short].toLong
    case ByteType => v.asInstanceOf[Byte].toLong
    case LongType => v.asInstanceOf[Long]
    case TimestampType => v match {
      case ts: java.sql.Timestamp => ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L
      case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000L
      case l: Long => l
    }
    case other => throw new IllegalArgumentException(s"proto: not a varint type $other")
  }

  private def writeField(out: OutputStream, fieldNum: Int, v: Any, dt: DataType): Unit = dt match {
    case ArrayType(et, _) =>
      // repeated field: one tagged occurrence per element (unpacked —
      // universally decodable)
      v.asInstanceOf[scala.collection.Seq[Any]].foreach { e =>
        if (e != null) writeField(out, fieldNum, e, et)
      }
    case DoubleType =>
      writeTag(out, fieldNum, Fixed64)
      out.write(ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putLong(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])).array())
    case FloatType =>
      writeTag(out, fieldNum, Fixed32)
      out.write(ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(java.lang.Float.floatToIntBits(v.asInstanceOf[Float])).array())
    case StringType =>
      writeTag(out, fieldNum, LenDelim)
      val b = v.toString.getBytes(StandardCharsets.UTF_8)
      writeVarint(out, b.length.toLong)
      out.write(b)
    case BinaryType =>
      writeTag(out, fieldNum, LenDelim)
      val b = v.asInstanceOf[Array[Byte]]
      writeVarint(out, b.length.toLong)
      out.write(b)
    case st: StructType =>
      writeTag(out, fieldNum, LenDelim)
      val b = encodeRow(v.asInstanceOf[Row], st)
      writeVarint(out, b.length.toLong)
      out.write(b)
    case _ =>
      writeTag(out, fieldNum, Varint)
      writeVarint(out, scalarToVarint(v, dt))
  }

  /** Encode one row as a protobuf message (column i ⇒ field i+1). Nulls are
    * elided like proto3 defaults.
    */
  def encodeRow(row: Row, schema: StructType): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) writeField(out, i + 1, row.get(i), f.dataType)
    }
    out.toByteArray
  }

  // ── decode ────────────────────────────────────────────────────────────

  private def varintToScalar(v: Long, dt: DataType): Any = dt match {
    case BooleanType => v != 0
    case IntegerType => v.toInt
    case ShortType => v.toShort
    case ByteType => v.toByte
    case LongType => v
    case TimestampType =>
      val ts = new java.sql.Timestamp(Math.floorDiv(v, 1000L))
      ts.setNanos((Math.floorMod(v, 1000000L) * 1000L).toInt)
      ts
    case other => throw new IllegalArgumentException(s"proto: not a varint type $other")
  }

  private def skip(in: InputStream, wire: Int): Unit = wire match {
    case Varint => readVarint(in)
    case Fixed64 => readN(in, 8)
    case LenDelim => readN(in, readVarint(in).toInt)
    case Fixed32 => readN(in, 4)
    case w => throw new IllegalArgumentException(s"proto: unknown wire type $w")
  }

  /** Decode a protobuf message into a Row shaped by `schema`. Unknown
    * fields are skipped; missing fields surface as null.
    */
  def decodeRow(bytes: Array[Byte], schema: StructType): Row = {
    val values = new Array[Any](schema.fields.length)
    val repeated = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.ArrayBuffer[Any]]
    val in = new java.io.ByteArrayInputStream(bytes)

    while (in.available() > 0) {
      val tag = readVarint(in)
      val fieldNum = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      val idx = fieldNum - 1
      if (idx < 0 || idx >= schema.fields.length) skip(in, wire)
      else {
        val dt = schema.fields(idx).dataType
        dt match {
          case ArrayType(et, _) =>
            val buf = repeated.getOrElseUpdate(idx, scala.collection.mutable.ArrayBuffer.empty[Any])
            if (wire == LenDelim && wireTypeOf(et) != LenDelim) {
              // packed numeric repeated
              val sub = new java.io.ByteArrayInputStream(readN(in, readVarint(in).toInt))
              while (sub.available() > 0) buf += readScalar(sub, wireTypeOf(et), et)
            } else buf += readScalar(in, wire, et)
          case st: StructType =>
            val b = readN(in, readVarint(in).toInt)
            values(idx) = decodeRow(b, st)
          case _ => values(idx) = readScalar(in, wire, dt)
        }
      }
    }
    repeated.foreach { case (i, buf) => values(i) = buf.toSeq }
    Row.fromSeq(values.toIndexedSeq)
  }

  private def readScalar(in: InputStream, wire: Int, dt: DataType): Any = (wire, dt) match {
    case (Fixed64, DoubleType) =>
      java.lang.Double.longBitsToDouble(
        ByteBuffer.wrap(readN(in, 8)).order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong)
    case (Fixed32, FloatType) =>
      java.lang.Float.intBitsToFloat(
        ByteBuffer.wrap(readN(in, 4)).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt)
    case (LenDelim, StringType) => new String(readN(in, readVarint(in).toInt), StandardCharsets.UTF_8)
    case (LenDelim, BinaryType) => readN(in, readVarint(in).toInt)
    case (LenDelim, st: StructType) => decodeRow(readN(in, readVarint(in).toInt), st)
    case (Varint, t) => varintToScalar(readVarint(in), t)
    case (w, t) => throw new IllegalArgumentException(s"proto: wire $w incompatible with $t")
  }

  // ── length-prefixed file framing (filesystem connector) ───────────────

  /** Write messages length-prefixed (varint size + message — the standard
    * delimited stream framing) for filesystem protobuf tables.
    */
  def writeDelimited(out: OutputStream, schema: StructType, rows: Iterator[Row]): Unit = {
    rows.foreach { r =>
      val b = encodeRow(r, schema)
      writeVarint(out, b.length.toLong)
      out.write(b)
    }
    out.flush()
  }

  /** Read a length-prefixed message stream. */
  def readDelimited(in: InputStream, schema: StructType): Iterator[Row] =
    new Iterator[Row] {
      private var nextSize: Int = -1
      private def peek(): Unit = if (nextSize < 0) {
        val first = in.read()
        if (first < 0) nextSize = -2
        else {
          var acc = 0L
          var shift = 0
          var b = first
          while ((b & 0x80) != 0) {
            acc |= (b & 0x7fL) << shift; shift += 7
            b = in.read()
            if (b < 0) throw new EOFException("proto: EOF in length prefix")
          }
          acc |= (b & 0x7fL) << shift
          nextSize = acc.toInt
        }
      }
      override def hasNext: Boolean = { peek(); nextSize >= 0 }
      override def next(): Row = {
        if (!hasNext) throw new NoSuchElementException
        val r = decodeRow(readN(in, nextSize), schema)
        nextSize = -1
        r
      }
    }
}
