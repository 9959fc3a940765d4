package graft.formats

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.io.{ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Minimal Apache Avro binary codec over Spark rows — no external jar
  * (spark-avro isn't in the container), implementing the subset of the
  * spec the reference's AvroFormat uses
  * (crates/arroyo-rpc/src/formats.rs:245-395, crates/arroyo-formats/src/
  * avro/): record schemas with nullable-union fields, raw datums,
  * Confluent Schema Registry wire framing (magic 0x00 + 4-byte schema id),
  * and Object Container Files (null codec) for the filesystem connector.
  *
  * The DDL-declared StructType is both writer and reader schema; schema
  * resolution between differing schemas is out of scope (the reference
  * fetches the writer schema from the registry for that).
  *
  * Supported Spark types: BOOLEAN, INT, BIGINT, FLOAT, DOUBLE, STRING,
  * BINARY, TIMESTAMP (avro long/timestamp-micros), DATE (avro int/date),
  * ARRAY, MAP<STRING,_>, nested STRUCT. Every field encodes as the
  * union ["null", T] (Spark fields are nullable by default).
  */
object AvroCodec {

  // ── schema JSON ───────────────────────────────────────────────────────

  /** The Avro record schema (as JSON) for a StructType — what goes in the
    * OCF `avro.schema` header or gets registered with a schema registry.
    */
  def avroSchemaJson(schema: StructType, name: String): String = {
    def quote(s: String) = "\"" + s + "\""
    def typeJson(dt: DataType): String = dt match {
      case BooleanType => quote("boolean")
      case IntegerType | ShortType | ByteType => quote("int")
      case LongType => quote("long")
      case FloatType => quote("float")
      case DoubleType => quote("double")
      case StringType => quote("string")
      case BinaryType => quote("bytes")
      case TimestampType => """{"type": "long", "logicalType": "timestamp-micros"}"""
      case DateType => """{"type": "int", "logicalType": "date"}"""
      case ArrayType(et, cn) =>
        s"""{"type": "array", "items": ${if (cn) unionJson(et) else typeJson(et)}}"""
      case MapType(StringType, vt, vcn) =>
        s"""{"type": "map", "values": ${if (vcn) unionJson(vt) else typeJson(vt)}}"""
      case st: StructType => recordJson(st, name + "_rec" + st.hashCode.abs)
      case other => throw new IllegalArgumentException(s"avro: unsupported type $other")
    }
    def unionJson(dt: DataType): String = s"""["null", ${typeJson(dt)}]"""
    def recordJson(st: StructType, recName: String): String = {
      // union ⟺ nullable, mirroring parseAvroSchema and the binary codec:
      // non-nullable fields carry no branch index on the wire
      val fields = st.fields.map(f =>
        if (f.nullable)
          s"""{"name": ${quote(f.name)}, "type": ${unionJson(f.dataType)}, "default": null}"""
        else s"""{"name": ${quote(f.name)}, "type": ${typeJson(f.dataType)}}""")
      s"""{"type": "record", "name": ${quote(recName)}, "fields": [${fields.mkString(", ")}]}"""
    }
    recordJson(schema, name)
  }

  /** Recursively force `containsNull`/`valueContainsNull` to true — the
    * historical wire shape of every array/map this codec wrote before
    * non-null items were representable. Sink paths that serialize a
    * FRAME-derived schema (where e.g. `split()` yields containsNull=false)
    * canonicalize through this so their wire bytes stay byte-identical to
    * what a DDL-declared reader (`array<string>` parses containsNull=true)
    * expects. Writers that NEED spec-exact non-null items (Iceberg
    * manifests) pass their StructType uncanonicalized.
    */
  def canonicalNullable(dt: DataType): DataType = dt match {
    case ArrayType(et, _) => ArrayType(canonicalNullable(et), containsNull = true)
    case MapType(kt, vt, _) =>
      MapType(kt, canonicalNullable(vt), valueContainsNull = true)
    case st: StructType => StructType(st.fields.map(f =>
      f.copy(dataType = canonicalNullable(f.dataType))))
    case other => other
  }

  /** Inverse of [[avroSchemaJson]]: an Avro record schema (as fetched from
    * a schema registry) → the StructType this codec decodes with. Handles
    * the types the wire format covers: primitives, `["null", T]` unions,
    * timestamp-micros / date logical types, arrays, maps, nested records.
    */
  def parseAvroSchema(json: String): StructType = {
    import com.fasterxml.jackson.databind.JsonNode
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

    def dataTypeOf(n: JsonNode): DataType = {
      if (n.isTextual) primitiveOf(n.asText())
      else if (n.isArray) {
        // union: drop the "null" branch (nullability rides the StructField)
        val branches = (0 until n.size).map(n.get)
          .filterNot(b => b.isTextual && b.asText() == "null")
        if (branches.size != 1)
          throw new IllegalArgumentException(s"avro: unsupported union $n")
        dataTypeOf(branches.head)
      } else {
        val t = n.get("type").asText()
        val logical = Option(n.get("logicalType")).map(_.asText())
        (t, logical) match {
          case ("long", Some("timestamp-micros")) => TimestampType
          case ("long", Some("timestamp-millis")) => TimestampType
          case ("int", Some("date")) => DateType
          // containsNull ⟺ the items/values type is a ["null", T] union —
          // the binary codec only reads a branch index for unions
          case ("array", _) =>
            ArrayType(dataTypeOf(n.get("items")), containsNull = n.get("items").isArray)
          case ("map", _) =>
            MapType(StringType, dataTypeOf(n.get("values")),
              valueContainsNull = n.get("values").isArray)
          case ("record", _) => recordOf(n)
          case _ => primitiveOf(t)
        }
      }
    }
    def primitiveOf(t: String): DataType = t match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "string" => StringType
      case "bytes" => BinaryType
      case other => throw new IllegalArgumentException(s"avro: unsupported primitive $other")
    }
    def recordOf(n: JsonNode): StructType = {
      val fields = n.get("fields")
      StructType((0 until fields.size).map { i =>
        val f = fields.get(i)
        val t = f.get("type")
        // nullable ⟺ the writer wrapped the type in a ["null", T] union —
        // the binary decoder must only read a branch index for unions
        StructField(f.get("name").asText(), dataTypeOf(t), nullable = t.isArray)
      })
    }
    recordOf(mapper.readTree(json))
  }

  // ── primitive encoding ────────────────────────────────────────────────

  private def writeVarLong(out: OutputStream, v0: Long): Unit = {
    // zigzag then base-128 varint (Avro spec, binary encoding)
    var v = (v0 << 1) ^ (v0 >> 63)
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def readVarLong(in: InputStream): Long = {
    var shift = 0
    var acc = 0L
    var b = in.read()
    if (b < 0) throw new EOFException("avro: EOF in varint")
    while ((b & 0x80) != 0) {
      acc |= (b & 0x7fL) << shift
      shift += 7
      b = in.read()
      if (b < 0) throw new EOFException("avro: EOF in varint")
    }
    acc |= (b & 0x7fL) << shift
    (acc >>> 1) ^ -(acc & 1) // un-zigzag
  }

  private def writeBytes(out: OutputStream, b: Array[Byte]): Unit = {
    writeVarLong(out, b.length.toLong)
    out.write(b)
  }

  private def readNBytes(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException(s"avro: EOF reading $n bytes")
      off += r
    }
    buf
  }

  private def readBytes(in: InputStream): Array[Byte] =
    readNBytes(in, readVarLong(in).toInt)

  // ── datum encoding (Row ↔ bytes) ──────────────────────────────────────

  private def writeValue(out: OutputStream, v: Any, dt: DataType): Unit = dt match {
    case BooleanType => out.write(if (v.asInstanceOf[Boolean]) 1 else 0)
    case IntegerType => writeVarLong(out, v.asInstanceOf[Int].toLong)
    case ShortType => writeVarLong(out, v.asInstanceOf[Short].toLong)
    case ByteType => writeVarLong(out, v.asInstanceOf[Byte].toLong)
    case LongType => writeVarLong(out, v.asInstanceOf[Long])
    case FloatType =>
      val bits = java.lang.Float.floatToIntBits(v.asInstanceOf[Float])
      out.write(ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(bits).array())
    case DoubleType =>
      val bits = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
      out.write(ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(bits).array())
    case StringType => writeBytes(out, v.toString.getBytes(StandardCharsets.UTF_8))
    case BinaryType => writeBytes(out, v.asInstanceOf[Array[Byte]])
    case TimestampType =>
      val micros = v match {
        case ts: java.sql.Timestamp => ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L
        case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000L
        case l: Long => l
      }
      writeVarLong(out, micros)
    case DateType =>
      val days = v match {
        case d: java.sql.Date => d.toLocalDate.toEpochDay
        case d: java.time.LocalDate => d.toEpochDay
        case i: Int => i.toLong
      }
      writeVarLong(out, days)
    case ArrayType(et, cn) =>
      val items = v.asInstanceOf[scala.collection.Seq[Any]]
      if (items.nonEmpty) {
        writeVarLong(out, items.size.toLong)
        // branch index iff containsNull — mirrors the schema JSON and reader
        items.foreach(i => if (cn) writeNullable(out, i, et) else writeValue(out, i, et))
      }
      writeVarLong(out, 0L) // end of blocks
    case MapType(StringType, vt, vcn) =>
      val m = v.asInstanceOf[scala.collection.Map[String, Any]]
      if (m.nonEmpty) {
        writeVarLong(out, m.size.toLong)
        m.foreach { case (k, mv) =>
          writeBytes(out, k.getBytes(StandardCharsets.UTF_8))
          if (vcn) writeNullable(out, mv, vt) else writeValue(out, mv, vt)
        }
      }
      writeVarLong(out, 0L)
    case st: StructType => writeRecord(out, v.asInstanceOf[Row], st)
    case other => throw new IllegalArgumentException(s"avro: unsupported type $other")
  }

  private def writeNullable(out: OutputStream, v: Any, dt: DataType): Unit =
    if (v == null) writeVarLong(out, 0L) // union branch 0 = null
    else {
      writeVarLong(out, 1L) // union branch 1 = the value type
      writeValue(out, v, dt)
    }

  private def writeRecord(out: OutputStream, row: Row, schema: StructType): Unit =
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val v = if (row.isNullAt(i)) null else row.get(i)
      // branch index iff nullable — must mirror readRecord exactly, or a
      // registry schema without unions round-trips corrupted
      if (f.nullable) writeNullable(out, v, f.dataType)
      else if (v == null)
        throw new IllegalArgumentException(s"avro: null value in non-nullable field ${f.name}")
      else writeValue(out, v, f.dataType)
    }

  private def readValue(in: InputStream, dt: DataType): Any = dt match {
    case BooleanType => in.read() == 1
    case IntegerType => readVarLong(in).toInt
    case ShortType => readVarLong(in).toShort
    case ByteType => readVarLong(in).toByte
    case LongType => readVarLong(in)
    case FloatType =>
      java.lang.Float.intBitsToFloat(
        ByteBuffer.wrap(readNBytes(in, 4)).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt)
    case DoubleType =>
      java.lang.Double.longBitsToDouble(
        ByteBuffer.wrap(readNBytes(in, 8)).order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong)
    case StringType => new String(readBytes(in), StandardCharsets.UTF_8)
    case BinaryType => readBytes(in)
    case TimestampType =>
      val micros = readVarLong(in)
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      ts
    case DateType => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(readVarLong(in)))
    case ArrayType(et, cn) =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
      var n = readVarLong(in)
      while (n != 0) {
        if (n < 0) { readVarLong(in); n = -n } // block with byte-size prefix
        var i = 0L
        while (i < n) {
          buf += (if (cn) readNullable(in, et) else readValue(in, et))
          i += 1
        }
        n = readVarLong(in)
      }
      buf.toSeq
    case MapType(StringType, vt, vcn) =>
      val buf = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      var n = readVarLong(in)
      while (n != 0) {
        if (n < 0) { readVarLong(in); n = -n }
        var i = 0L
        while (i < n) {
          val k = new String(readBytes(in), StandardCharsets.UTF_8)
          buf(k) = (if (vcn) readNullable(in, vt) else readValue(in, vt))
          i += 1
        }
        n = readVarLong(in)
      }
      buf.toMap
    case st: StructType => readRecord(in, st)
    case other => throw new IllegalArgumentException(s"avro: unsupported type $other")
  }

  private def readNullable(in: InputStream, dt: DataType): Any =
    readVarLong(in) match {
      case 0 => null
      case 1 => readValue(in, dt)
      case b => throw new IllegalArgumentException(s"avro: bad union branch $b")
    }

  private def readRecord(in: InputStream, schema: StructType): Row =
    // nullable=false fields (registry schemas without a ["null",T] union)
    // carry no branch index on the wire
    Row.fromSeq(schema.fields.toIndexedSeq.map(f =>
      if (f.nullable) readNullable(in, f.dataType) else readValue(in, f.dataType)))

  /** Encode one row as a raw Avro datum (`avro.raw_datums = true`). */
  def encodeRow(row: Row, schema: StructType): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    writeRecord(out, row, schema)
    out.toByteArray
  }

  /** Decode one raw Avro datum. */
  def decodeRow(bytes: Array[Byte], schema: StructType): Row =
    readRecord(new java.io.ByteArrayInputStream(bytes), schema)

  // ── Confluent Schema Registry wire framing ────────────────────────────

  /** magic 0x00 + big-endian 4-byte schema id + datum
    * (`avro.confluent_schema_registry = true`).
    */
  def frameConfluent(datum: Array[Byte], schemaId: Int): Array[Byte] = {
    val out = ByteBuffer.allocate(5 + datum.length)
    out.put(0.toByte).putInt(schemaId).put(datum)
    out.array()
  }

  /** Strip Confluent framing → (schemaId, datum). */
  def unframeConfluent(bytes: Array[Byte]): (Int, Array[Byte]) = {
    require(bytes.length >= 5 && bytes(0) == 0,
      "confluent avro: expected magic byte 0x00 + 4-byte schema id")
    val bb = ByteBuffer.wrap(bytes, 1, 4)
    (bb.getInt, java.util.Arrays.copyOfRange(bytes, 5, bytes.length))
  }

  // ── Object Container Files (filesystem connector) ─────────────────────

  private val OcfMagic = Array[Byte]('O', 'b', 'j', 1)

  /** Write rows as one Avro OCF stream (null codec, single block).
    * `schemaJsonOverride` replaces the auto-derived `avro.schema` header
    * with an explicit writer schema — the encoding is still driven by
    * `schema`, so the override must describe the SAME wire shape (field
    * order, `["null", T]` unions exactly where fields are nullable); this
    * is how Iceberg manifests carry their spec-mandated `field-id` props.
    * `extraMeta` adds file-metadata entries (e.g. Iceberg's
    * `format-version`, `partition-spec`).
    */
  def writeOcf(out: OutputStream, schema: StructType, rows: Iterator[Row],
      recordName: String = "graft_record",
      schemaJsonOverride: Option[String] = None,
      extraMeta: Seq[(String, String)] = Nil): Unit = {
    val sync = new Array[Byte](16)
    // deterministic sync marker from the schema (re-runs produce identical
    // files — handy for idempotent sinks)
    val schemaJson = schemaJsonOverride.getOrElse(avroSchemaJson(schema, recordName))
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(schemaJson.getBytes(StandardCharsets.UTF_8))
    System.arraycopy(digest, 0, sync, 0, 16)

    out.write(OcfMagic)
    writeVarLong(out, (2 + extraMeta.size).toLong)
    writeBytes(out, "avro.schema".getBytes(StandardCharsets.UTF_8))
    writeBytes(out, schemaJson.getBytes(StandardCharsets.UTF_8))
    writeBytes(out, "avro.codec".getBytes(StandardCharsets.UTF_8))
    writeBytes(out, "null".getBytes(StandardCharsets.UTF_8))
    extraMeta.foreach { case (k, v) =>
      writeBytes(out, k.getBytes(StandardCharsets.UTF_8))
      writeBytes(out, v.getBytes(StandardCharsets.UTF_8))
    }
    writeVarLong(out, 0L) // end of map
    out.write(sync)

    val buf = new ByteArrayOutputStream(4096)
    var n = 0L
    rows.foreach { r => writeRecord(buf, r, schema); n += 1 }
    if (n > 0) {
      writeVarLong(out, n)
      writeVarLong(out, buf.size().toLong)
      buf.writeTo(out)
      out.write(sync)
    }
    out.flush()
  }

  /** Read an Avro OCF stream written with [[writeOcf]] (or any null-codec
    * OCF whose writer schema matches the declared StructType).
    */
  def readOcf(in: InputStream, schema: StructType): Iterator[Row] =
    readOcfResolving(in, _ => schema)

  /** Like [[readOcf]], but the reader StructType is chosen AFTER the
    * header: `pick` receives the file-metadata map (notably the embedded
    * `avro.schema` writer-schema JSON) and must return the exact wire
    * shape the WRITER used — the decode is positional, so this is how a
    * reader handles a format that grew a field (e.g. Iceberg manifests
    * written before/after `equality_ids` existed).
    */
  def readOcfResolving(in: InputStream,
      pick: Map[String, String] => StructType): Iterator[Row] =
    readOcfResolvingRows(in, meta => Left(pick(meta)))

  /** The general resolving read: after the header, `choose` returns
    * either `Left(writerShape)` — POSITIONAL decode, when the caller
    * recognizes the writer schema as one of its own shapes (fast path:
    * no per-record name lookup) — or `Right(target)` — decode by the
    * EMBEDDED writer schema itself (any conformant writer: any field
    * order, unknown fields skipped, missing nullable fields null) and
    * project each record onto `target` by FIELD NAME.
    */
  def readOcfResolvingRows(in: InputStream,
      choose: Map[String, String] => Either[StructType, StructType]): Iterator[Row] = {
    val magic = readNBytes(in, 4)
    require(java.util.Arrays.equals(magic, OcfMagic), "avro: not an OCF (bad magic)")
    // metadata map (validate codec, surface the rest to `choose`)
    val meta = scala.collection.mutable.Map.empty[String, String]
    var n = readVarLong(in)
    while (n != 0) {
      if (n < 0) { readVarLong(in); n = -n }
      var i = 0L
      while (i < n) {
        val key = new String(readBytes(in), StandardCharsets.UTF_8)
        val value = readBytes(in)
        meta(key) = new String(value, StandardCharsets.UTF_8)
        if (key == "avro.codec") {
          val codec = meta(key)
          // deflate is iceberg-java's DEFAULT for manifests/manifest
          // lists (write.metadata.compression-codec=gzip) and snappy the
          // common Kafka-ecosystem OCF codec — a reader refusing them
          // rejects most real third-party files at the header; this
          // engine keeps WRITING null-codec files
          require(codec == "null" || codec == "deflate" || codec == "snappy",
            s"avro: unsupported codec '$codec' (null, deflate, snappy)")
        }
        i += 1
      }
      n = readVarLong(in)
    }
    readNBytes(in, 16) // sync marker
    val readOne: InputStream => Row = choose(meta.toMap) match {
      case Left(positional) => s => readRecord(s, positional)
      case Right(target) =>
        val writerJson = meta.getOrElse("avro.schema", throw new IllegalArgumentException(
          "avro: no embedded writer schema — cannot resolve by name"))
        val tree = parseAvTree(writerJson)
        s => projectValue(readGeneric(s, tree), target, "<root>")
          .asInstanceOf[Row]
    }
    val codec = meta.getOrElse("avro.codec", "null")
    val compressed = codec != "null"

    new Iterator[Row] {
      private var remainingInBlock = 0L
      private var exhausted = false
      // null codec decodes straight off `in`; a compressed block
      // decompresses whole (blocks are writer-bounded — iceberg
      // manifests use ~the default 64k sync interval) and decodes from
      // the buffer
      private var blockIn: InputStream = in
      private def advanceBlock(): Unit = {
        val first = in.read()
        if (first < 0) { exhausted = true; return }
        // un-read trick: varint first byte already consumed — rebuild count
        var acc = 0L
        var shift = 0
        var b = first
        while ((b & 0x80) != 0) {
          acc |= (b & 0x7fL) << shift; shift += 7
          b = in.read()
          if (b < 0) throw new EOFException("avro: EOF in block count")
        }
        acc |= (b & 0x7fL) << shift
        var count = (acc >>> 1) ^ -(acc & 1)
        if (count < 0) count = -count
        val byteSize = readVarLong(in)
        if (compressed) {
          val raw = codec match {
            case "deflate" =>
              // spec: the payload is one RAW (nowrap — no zlib header)
              // DEFLATE stream per block
              val comp = readNBytes(in, byteSize.toInt)
              val inf = new java.util.zip.Inflater(true)
              inf.setInput(comp)
              val out = new java.io.ByteArrayOutputStream(math.max(64, comp.length * 3))
              val buf = new Array[Byte](8192)
              while (!inf.finished()) {
                val k = inf.inflate(buf)
                if (k > 0) out.write(buf, 0, k)
                else if (!inf.finished())
                  throw new EOFException("avro: truncated deflate block")
              }
              inf.end()
              out.toByteArray
            case "snappy" =>
              // spec: snappy-compressed payload + big-endian CRC32 of
              // the UNCOMPRESSED bytes
              require(byteSize > 4, s"avro: snappy block of $byteSize bytes")
              val comp = readNBytes(in, byteSize.toInt - 4)
              val crcBytes = readNBytes(in, 4)
              val out = org.xerial.snappy.Snappy.uncompress(comp)
              val crc = new java.util.zip.CRC32()
              crc.update(out)
              val want = ByteBuffer.wrap(crcBytes).getInt & 0xffffffffL
              require(crc.getValue == want,
                "avro: snappy block CRC mismatch (corrupt block)")
              out
            case other => throw new IllegalArgumentException(
              s"avro: unsupported codec '$other'")
          }
          blockIn = new java.io.ByteArrayInputStream(raw)
          readNBytes(in, 16) // block-trailing sync marker
        }
        remainingInBlock = count
      }
      override def hasNext: Boolean = {
        while (remainingInBlock == 0 && !exhausted) {
          advanceBlock()
          if (!exhausted && remainingInBlock == 0) exhausted = true // empty trailing block
        }
        remainingInBlock > 0
      }
      override def next(): Row = {
        if (!hasNext) throw new NoSuchElementException
        val r = readOne(blockIn)
        remainingInBlock -= 1
        if (remainingInBlock == 0 && !compressed) {
          readNBytes(in, 16) // block-trailing sync marker
        }
        r
      }
    }
  }

  // ── writer-schema-driven (name-resolving) decode ─────────────────────
  // The positional codec above requires the reader to KNOW the writer's
  // exact wire shape. Conformant third-party writers (Iceberg manifests
  // from iceberg-java/pyiceberg) write MORE fields, in their own order —
  // this decoder walks the file's own embedded schema, so any field
  // order decodes, unknown fields are read-and-skipped, and records
  // project onto the requested StructType by field name.

  private sealed trait Av
  private case object AvNull extends Av
  private case object AvBool extends Av
  private case object AvInt extends Av
  private case object AvLong extends Av
  private case object AvFloat extends Av
  private case object AvDouble extends Av
  private case object AvString extends Av
  private case object AvBytes extends Av
  private final case class AvFixed(size: Int) extends Av
  private final case class AvEnum(symbols: IndexedSeq[String]) extends Av
  private final case class AvArray(item: Av) extends Av
  private final case class AvMap(value: Av) extends Av
  private final case class AvUnion(branches: IndexedSeq[Av]) extends Av
  /** `ids(i)` is field i's `field-id` attribute, -1 when the writer
    * schema carries none. Iceberg's avro schemas tag every field — the
    * STABLE identity across the spec's renames (e.g. manifest-list
    * field 504 is `added_data_files_count` from iceberg-java,
    * `added_files_count` in the spec) — so projection matches by id
    * first, name second.
    */
  private final case class AvRecord(fields: IndexedSeq[(String, Av)],
      ids: IndexedSeq[Int]) extends Av

  private[graft] def parseAvTree(json: String): AnyRef = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val reg = scala.collection.mutable.Map.empty[String, Av]
    def parse(n: com.fasterxml.jackson.databind.JsonNode): Av =
      if (n.isTextual) n.asText() match {
        case "null" => AvNull
        case "boolean" => AvBool
        case "int" => AvInt
        case "long" => AvLong
        case "float" => AvFloat
        case "double" => AvDouble
        case "string" => AvString
        case "bytes" => AvBytes
        case ref => reg.getOrElse(ref, throw new IllegalArgumentException(
          s"avro: unresolved named-type reference '$ref'"))
      }
      else if (n.isArray)
        AvUnion((0 until n.size()).map(i => parse(n.get(i))).toIndexedSeq)
      else n.get("type").asText() match {
        case "record" =>
          val fieldsNode = n.get("fields")
          val fs = (0 until fieldsNode.size()).map { i =>
            val f = fieldsNode.get(i)
            (f.get("name").asText(), parse(f.get("type")))
          }.toIndexedSeq
          val ids = (0 until fieldsNode.size()).map { i =>
            Option(fieldsNode.get(i).get("field-id"))
              .filter(_.isNumber).map(_.asInt()).getOrElse(-1)
          }.toIndexedSeq
          val rec = AvRecord(fs, ids)
          register(n, rec)
          rec
        case "array" => AvArray(parse(n.get("items")))
        case "map" => AvMap(parse(n.get("values")))
        case "fixed" =>
          val fx = AvFixed(n.get("size").asInt()); register(n, fx); fx
        case "enum" =>
          val syms = n.get("symbols")
          val e = AvEnum((0 until syms.size()).map(syms.get(_).asText()).toIndexedSeq)
          register(n, e); e
        case prim =>
          // {"type":"long","logicalType":"timestamp-micros"} and friends
          parse(n.get("type"))
      }
    def register(n: com.fasterxml.jackson.databind.JsonNode, t: Av): Unit =
      Option(n.get("name")).map(_.asText()).foreach { nm =>
        reg(nm) = t
        Option(n.get("namespace")).map(_.asText())
          .foreach(ns => reg(s"$ns.$nm") = t)
      }
    parse(mapper.readTree(json))
  }

  /** Decode one value per the writer tree: records become
    * name→value LinkedHashMaps, arrays Seqs, maps Maps, unions their
    * branch's value, enums their symbol string.
    */
  private[graft] def readGeneric(in: InputStream, t: AnyRef): Any = t match {
    case AvNull => null
    case AvBool => in.read() == 1
    case AvInt => readVarLong(in).toInt
    case AvLong => readVarLong(in)
    case AvFloat =>
      java.lang.Float.intBitsToFloat(
        ByteBuffer.wrap(readNBytes(in, 4)).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt)
    case AvDouble =>
      java.lang.Double.longBitsToDouble(
        ByteBuffer.wrap(readNBytes(in, 8)).order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong)
    case AvString => new String(readBytes(in), StandardCharsets.UTF_8)
    case AvBytes => readBytes(in)
    case AvFixed(sz) => readNBytes(in, sz)
    case AvEnum(symbols) => symbols(readVarLong(in).toInt)
    case AvArray(item) =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
      var n = readVarLong(in)
      while (n != 0) {
        if (n < 0) { readVarLong(in); n = -n }
        var i = 0L
        while (i < n) { buf += readGeneric(in, item); i += 1 }
        n = readVarLong(in)
      }
      buf.toSeq
    case AvMap(value) =>
      val buf = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      var n = readVarLong(in)
      while (n != 0) {
        if (n < 0) { readVarLong(in); n = -n }
        var i = 0L
        while (i < n) {
          val k = new String(readBytes(in), StandardCharsets.UTF_8)
          buf(k) = readGeneric(in, value)
          i += 1
        }
        n = readVarLong(in)
      }
      buf
    case AvUnion(branches) =>
      val b = readVarLong(in).toInt
      require(b >= 0 && b < branches.length, s"avro: bad union branch $b")
      readGeneric(in, branches(b))
    case AvRecord(fields, ids) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      var i = 0
      while (i < fields.length) {
        val v = readGeneric(in, fields(i)._2)
        m(fields(i)._1) = v
        // id-keyed twin entry ('#' cannot start an avro field name) —
        // what projectValue's field-id lookup binds
        if (ids(i) >= 0) m("#" + ids(i)) = v
        i += 1
      }
      m
    case other => throw new IllegalArgumentException(s"avro: bad decode tree $other")
  }

  /** Project a generically-decoded value onto a Spark type: records map
    * to Rows by FIELD ID first (the target StructField's `field-id`
    * metadata vs the writer schema's `field-id` attributes — the stable
    * identity across the iceberg spec's field renames), then exact
    * name, then any names in the target's `aliases` metadata (known
    * historical spellings for writers that tag no ids). Extra writer
    * fields drop; a missing nullable target is null; a missing
    * NON-nullable target fails loudly — guessing a required field would
    * corrupt silently.
    */
  private[graft] def projectValue(v: Any, dt: DataType, where: String): Any = (v, dt) match {
    case (null, _) => null
    case (m: scala.collection.Map[_, _], st: StructType) =>
      val mm = m.asInstanceOf[scala.collection.Map[String, Any]]
      Row.fromSeq(st.fields.toIndexedSeq.map { f =>
        val byId =
          if (f.metadata.contains("field-id"))
            mm.get("#" + f.metadata.getLong("field-id"))
          else None
        val byAlias =
          if (f.metadata.contains("aliases"))
            f.metadata.getStringArray("aliases").iterator
              .map(mm.get).collectFirst { case Some(x) => x }
          else None
        byId.orElse(mm.get(f.name)).orElse(byAlias) match {
          case Some(x) => projectValue(x, f.dataType, s"$where.${f.name}")
          case None if f.nullable => null
          case None => throw new IllegalArgumentException(
            s"avro: writer schema has no field '$where.${f.name}' and the " +
              "reader requires it (non-nullable)")
        }
      })
    case (s: scala.collection.Seq[_], ArrayType(et, _)) =>
      s.map(projectValue(_, et, where))
    case (m: scala.collection.Map[_, _], MapType(StringType, vt, _)) =>
      m.asInstanceOf[scala.collection.Map[String, Any]].toMap
        .map { case (k, x) => k -> projectValue(x, vt, where) }
    case (i: Int, LongType) => i.toLong // spec resolution: int promotes
    case (l: Long, IntegerType)
      if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
    case (ts: Long, TimestampType) =>
      val t = new java.sql.Timestamp(Math.floorDiv(ts, 1000L))
      t.setNanos((Math.floorMod(ts, 1000000L) * 1000L).toInt)
      t
    case (days: Int, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong))
    case (x, _) => x
  }
}
