package graft.formats

import org.apache.spark.sql.{DataFrame, Encoder, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Format layer glue — maps the reference's Format enum
  * (crates/arroyo-rpc/src/formats.rs:396-459) onto DataFrames, plus the
  * BadData policy (formats.rs:461-497): `bad_data = 'fail'` (default)
  * propagates decode errors, `'drop'` silently skips undecodable rows —
  * the Spark-native twins being FAILFAST/DROPMALFORMED for the built-in
  * json reader and a try/skip in our own codecs.
  */
object Formats {

  sealed trait BadData
  case object FailBad extends BadData
  case object DropBad extends BadData

  def badDataOf(options: Map[String, String]): BadData =
    options.get("bad_data") match {
      case None | Some("fail") => FailBad
      case Some("drop") => DropBad
      case Some(other) =>
        throw new IllegalArgumentException(
          s"invalid value for 'bad_data': `$other`; expected one of 'drop' or 'fail'")
    }

  /** Spark json-reader mode string for a BadData policy. */
  def jsonMode(bad: BadData): String = bad match {
    case FailBad => "FAILFAST"
    case DropBad => "DROPMALFORMED"
  }

  // ── binary value-frame decoding (kafka & friends) ─────────────────────

  /** Decode a binary `value` column into the declared schema — the shape
    * every message connector shares (kafka/nats/mqtt…: payload bytes +
    * metadata columns). Non-`value` input columns (topic/partition/offset/
    * timestamp/key) pass through untouched after the decoded fields, so
    * `metadata('…')` virtual columns can reference them.
    *
    * @param format  json | avro | protobuf | raw_string | raw_bytes
    * @param options avro.confluent_schema_registry / avro.raw_datums /
    *                bad_data
    */
  def decodeValue(df: DataFrame, schema: StructType, format: String,
      options: Map[String, String]): DataFrame = {
    val bad = badDataOf(options)
    format match {
      case "json" =>
        val parsed = df.withColumn("_decoded",
          from_json(col("value").cast("string"), schema,
            Map("mode" -> jsonMode(bad))))
        // FAILFAST inside from_json throws per-row; DROPMALFORMED yields
        // null structs → filter them
        val dropped = bad match {
          case DropBad => parsed.filter(col("_decoded").isNotNull)
          case FailBad => parsed
        }
        dropped.select(
          (schema.fieldNames.map(f => col(s"_decoded.`$f`").as(f)) ++
            passthroughCols(df)).toIndexedSeq: _*)
      case "raw_string" =>
        df.select((Seq(col("value").cast("string").as("value")) ++ passthroughCols(df)): _*)
      case "raw_bytes" =>
        df.select((Seq(col("value")) ++ passthroughCols(df)): _*)
      case "avro" =>
        val confluent = options.get("avro.confluent_schema_registry").contains("true")
        val registry = if (confluent) SchemaRegistry.confOf(options) else None
        decodeWith(df, schema, bad) { bytes =>
          registry match {
            case Some(conf) =>
              // schema-registry read path: each message names its writer
              // schema by framed id — fetch it (cached per executor JVM),
              // decode with the WRITER's shape, align to the declared
              // columns by name (schema evolution: reordered/added writer
              // fields don't break the reader)
              val (id, datum) = AvroCodec.unframeConfluent(bytes)
              val writer = SchemaRegistry.structTypeForId(conf, id)
              val wrow = AvroCodec.decodeRow(datum, writer)
              val widx = writer.fieldNames.zipWithIndex.toMap
              Row.fromSeq(schema.fields.toIndexedSeq.map { f =>
                widx.get(f.name) match {
                  case Some(i) => promote(wrow.get(i), writer.fields(i).dataType, f.dataType)
                  case None => null
                }
              })
            case None =>
              val datum = if (confluent) AvroCodec.unframeConfluent(bytes)._2 else bytes
              AvroCodec.decodeRow(datum, schema)
          }
        }
      case "protobuf" =>
        decodeWith(df, schema, bad)(bytes => ProtobufCodec.decodeRow(bytes, schema))
      case f => throw new IllegalArgumentException(s"unsupported value format '$f'")
    }
  }

  /** Avro schema-evolution numeric/byte promotions (Avro spec "Schema
    * Resolution"): int→long/float/double, long→float/double, float→double,
    * string↔bytes. Identity when writer and reader types already agree.
    */
  private def promote(v: Any, from: DataType, to: DataType): Any =
    if (v == null || from == to) v
    else (from, to) match {
      case (IntegerType, LongType)   => v.asInstanceOf[Int].toLong
      case (IntegerType, FloatType)  => v.asInstanceOf[Int].toFloat
      case (IntegerType, DoubleType) => v.asInstanceOf[Int].toDouble
      case (LongType, FloatType)     => v.asInstanceOf[Long].toFloat
      case (LongType, DoubleType)    => v.asInstanceOf[Long].toDouble
      case (FloatType, DoubleType)   => v.asInstanceOf[Float].toDouble
      case (BinaryType, StringType)  => new String(v.asInstanceOf[Array[Byte]], "UTF-8")
      case (StringType, BinaryType)  => v.asInstanceOf[String].getBytes("UTF-8")
      case _ => throw new IllegalArgumentException(
        s"cannot promote writer type $from to reader type $to")
    }

  private def passthroughCols(df: DataFrame) =
    df.columns.filter(_ != "value").map(c => col(s"`$c`")).toSeq

  private def decodeWith(df: DataFrame, schema: StructType, bad: BadData)(
      decode: Array[Byte] => Row): DataFrame = {
    val others = df.schema.fields.filter(_.name != "value")
    val valueIdx = df.schema.fieldIndex("value")
    require(df.schema.fields(valueIdx).dataType == BinaryType,
      "value column must be BINARY for avro/protobuf decoding")
    val otherIdxs = others.map(f => df.schema.fieldIndex(f.name))
    val outSchema = StructType(schema.fields ++ others)
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](valueIdx)
        val decoded =
          try Some(decode(bytes))
          catch {
            case e: Exception => bad match {
              case DropBad => None
              case FailBad => throw new IllegalArgumentException(
                s"bad_data=fail: undecodable message (${e.getMessage})", e)
            }
          }
        decoded.map(d => Row.fromSeq(d.toSeq ++ otherIdxs.map(r.get).toSeq))
      }
    }
  }

  // ── value-frame encoding (sink side) ──────────────────────────────────

  /** Encode rows into a single binary `value` column for message sinks. */
  def encodeValue(df: DataFrame, format: String, options: Map[String, String]): DataFrame = {
    // canonicalize frame-derived nullability so wire bytes stay identical
    // to what DDL-declared reader schemas (containsNull=true) decode
    val schema = AvroCodec.canonicalNullable(df.schema).asInstanceOf[StructType]
    format match {
      case "json" => df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*))
        .cast("binary").as("value"))
      case "raw_string" =>
        require(schema.fields.length == 1, "raw_string sink requires exactly one column")
        df.select(col(df.columns.head).cast("string").cast("binary").as("value"))
      case "raw_bytes" =>
        require(schema.fields.length == 1, "raw_bytes sink requires exactly one column")
        df.select(col(df.columns.head).cast("binary").as("value"))
      case "avro" =>
        val confluent = options.get("avro.confluent_schema_registry").contains("true")
        // registry write path: register this sink's schema under the
        // reference's `{topic}-value` subject ONCE (driver-side, at plan
        // build) and frame every message with the returned id
        val schemaId = SchemaRegistry.confOf(options).filter(_ => confluent) match {
          case Some(conf) =>
            SchemaRegistry.register(conf, SchemaRegistry.valueSubject(options),
              AvroCodec.avroSchemaJson(schema, "sink"))
          case None => options.getOrElse("avro.schema_id", "1").toInt
        }
        encodeWith(df) { row =>
          val datum = AvroCodec.encodeRow(row, schema)
          if (confluent) AvroCodec.frameConfluent(datum, schemaId) else datum
        }
      case "protobuf" => encodeWith(df)(row => ProtobufCodec.encodeRow(row, schema))
      case f => throw new IllegalArgumentException(s"unsupported sink value format '$f'")
    }
  }

  private def encodeWith(df: DataFrame)(encode: Row => Array[Byte]): DataFrame = {
    val outSchema = StructType(Seq(StructField("value", BinaryType)))
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    df.mapPartitions(rows => rows.map(r => Row(encode(r))))
  }

  // ── filesystem avro / protobuf ────────────────────────────────────────

  /** Read a directory (or single file) of Avro OCFs into the declared
    * schema. Rides the binaryFile source → per-file OCF decode in
    * executors: each file is one task-side stream, no driver collect.
    */
  def readAvroFiles(spark: SparkSession, path: String, schema: StructType,
      streaming: Boolean, options: Map[String, String] = Map.empty): DataFrame = {
    val bad = badDataOf(options)
    val files =
      if (streaming)
        spark.readStream.format("binaryFile").schema(binaryFileSchema)
          .option("pathGlobFilter", "*.avro").load(path)
      else spark.read.format("binaryFile").option("pathGlobFilter", "*.avro").load(path)
    flatDecodeFiles(files, schema, bad)(bytes =>
      AvroCodec.readOcf(new java.io.ByteArrayInputStream(bytes), schema))
  }

  /** Read length-prefixed protobuf message files. */
  def readProtoFiles(spark: SparkSession, path: String, schema: StructType,
      streaming: Boolean, options: Map[String, String] = Map.empty): DataFrame = {
    val bad = badDataOf(options)
    val files =
      if (streaming)
        spark.readStream.format("binaryFile").schema(binaryFileSchema)
          .option("pathGlobFilter", "*.pb").load(path)
      else spark.read.format("binaryFile").option("pathGlobFilter", "*.pb").load(path)
    flatDecodeFiles(files, schema, bad)(bytes =>
      ProtobufCodec.readDelimited(new java.io.ByteArrayInputStream(bytes), schema))
  }

  private val binaryFileSchema = StructType.fromDDL(
    "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY")

  private def flatDecodeFiles(files: DataFrame, schema: StructType, bad: BadData)(
      decode: Array[Byte] => Iterator[Row]): DataFrame = {
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(schema)
    val contentIdx = files.schema.fieldIndex("content")
    files.mapPartitions { rows =>
      rows.flatMap { r =>
        try decode(r.getAs[Array[Byte]](contentIdx))
        catch {
          case e: Exception => bad match {
            case DropBad => Iterator.empty
            case FailBad => throw new IllegalArgumentException(
              s"bad_data=fail: undecodable file (${e.getMessage})", e)
          }
        }
      }
    }
  }

  /** Write a DataFrame as one Avro OCF per partition under `path` —
    * executor-side, scales with partition count.
    */
  def writeAvroFiles(df: DataFrame, path: String, prefix: String = "part"): Unit = {
    val schema = AvroCodec.canonicalNullable(df.schema).asInstanceOf[StructType]
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val out = java.nio.file.Files.newOutputStream(
          java.nio.file.Paths.get(path, f"$prefix-$pid%05d.avro"))
        try AvroCodec.writeOcf(out, schema, rows) finally out.close()
      }
    }
  }

  /** Write a DataFrame as length-prefixed protobuf files. */
  def writeProtoFiles(df: DataFrame, path: String, prefix: String = "part"): Unit = {
    val schema = df.schema
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val out = java.nio.file.Files.newOutputStream(
          java.nio.file.Paths.get(path, f"$prefix-$pid%05d.pb"))
        try ProtobufCodec.writeDelimited(out, schema, rows) finally out.close()
      }
    }
  }
}
