package graft.examples

import graft.formats.AvroCodec
import graft.sinks.IcebergLog
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.nio.file.Files

/** SCALE.md probe (r12): what does the name-resolving manifest decode
  * cost vs the positional fast path? planFiles pays ~1.4 µs/file/query
  * on our own manifests (positional); third-party manifests decode by
  * their embedded writer schema into per-record maps and project by
  * name. This measures both on the same 10⁵-entry manifest so the
  * fallback's price (paid ONLY on foreign manifests) is a recorded
  * number, not a guess.
  *
  * Usage: runMain graft.examples.ManifestDecodeProbe [entries]
  */
object ManifestDecodeProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 100000
    val partType = StructType(Seq.empty[StructField])
    def kvL(id: Int, v: Long) = Seq(Row(id, v))
    val entries = (0 until n).map { i =>
      Row(1, 7L, 3L, 3L,
        Row(0, s"/t/data/part-$i.parquet", "PARQUET", Row(), 50000L, 1048576L,
          kvL(1, 50000L), kvL(1, 0L), null, null, null))
    }
    // our shape (positional fast path)
    val own = Files.createTempFile("own_manifest", ".avro")
    locally {
      val out = Files.newOutputStream(own)
      try AvroCodec.writeOcf(out, IcebergLog.manifestEntryType(partType),
        entries.iterator,
        schemaJsonOverride = Some(IcebergLog.manifestEntrySchemaJson(partType)),
        extraMeta = Seq("partition-spec-id" -> "0", "format-version" -> "2",
          "content" -> "data"))
      finally out.close()
    }
    // a third-party shape: full v2 field set, extra fields interleaved
    def kv(vt: DataType) = ArrayType(StructType(Seq(
      StructField("key", IntegerType, nullable = false),
      StructField("value", vt, nullable = false))), containsNull = false)
    val tpEntry = StructType(Seq(
      StructField("status", IntegerType, nullable = false),
      StructField("snapshot_id", LongType, nullable = true),
      StructField("sequence_number", LongType, nullable = true),
      StructField("file_sequence_number", LongType, nullable = true),
      StructField("data_file", StructType(Seq(
        StructField("content", IntegerType, nullable = false),
        StructField("file_path", StringType, nullable = false),
        StructField("file_format", StringType, nullable = false),
        StructField("partition", StructType(Seq.empty), nullable = false),
        StructField("record_count", LongType, nullable = false),
        StructField("file_size_in_bytes", LongType, nullable = false),
        StructField("column_sizes", kv(LongType), nullable = true),
        StructField("value_counts", kv(LongType), nullable = true),
        StructField("null_value_counts", kv(LongType), nullable = true),
        StructField("nan_value_counts", kv(LongType), nullable = true),
        StructField("lower_bounds", kv(BinaryType), nullable = true),
        StructField("upper_bounds", kv(BinaryType), nullable = true),
        StructField("key_metadata", BinaryType, nullable = true),
        StructField("split_offsets", ArrayType(LongType, containsNull = false), nullable = true),
        StructField("equality_ids", ArrayType(IntegerType, containsNull = false), nullable = true),
        StructField("sort_order_id", IntegerType, nullable = true))),
        nullable = false)))
    val foreignRows = entries.map { e =>
      val df = e.getStruct(4)
      Row(e.get(0), e.get(1), e.get(2), e.get(3),
        Row(df.get(0), df.get(1), df.get(2), df.get(3), df.get(4), df.get(5),
          kvL(1, 8L), df.get(6), df.get(7), kvL(1, 0L), df.get(8), df.get(9),
          null, Seq(4L), null, 0))
    }
    val foreign = Files.createTempFile("foreign_manifest", ".avro")
    locally {
      val out = Files.newOutputStream(foreign)
      try AvroCodec.writeOcf(out, tpEntry, foreignRows.iterator)
      finally out.close()
    }
    def timed(f: => Int): Double = {
      val t0 = System.nanoTime(); val r = f
      require(r == n, s"decoded $r of $n")
      (System.nanoTime() - t0) / 1e9
    }
    // warm the JIT, then 3 COLD samples each (cache cleared per sample —
    // the r13 decoded-manifest cache would otherwise hide the decode)
    (1 to 2).foreach { _ =>
      IcebergLog.clearManifestCache()
      IcebergLog.readEntries(own.toString, partType).size
      IcebergLog.readEntries(foreign.toString, partType).size
    }
    def timedCold(path: String): Double = {
      IcebergLog.clearManifestCache()
      timed(IcebergLog.readEntries(path, partType).size)
    }
    val pos = (1 to 3).map(_ => timedCold(own.toString))
    val gen = (1 to 3).map(_ => timedCold(foreign.toString))
    // r13: the SECOND plan over the same foreign manifest hits the
    // decoded-manifest cache — a lookup, not a re-decode
    IcebergLog.clearManifestCache()
    IcebergLog.readEntries(foreign.toString, partType).size
    val hot = (1 to 3).map(_ =>
      timed(IcebergLog.readEntries(foreign.toString, partType).size))
    println(f"[manifest-decode] $n entries: positional=${pos.min}%.3fs " +
      f"(${pos.min / n * 1e6}%.2f µs/entry) name-resolved=${gen.min}%.3fs " +
      f"(${gen.min / n * 1e6}%.2f µs/entry) ratio=${gen.min / pos.min}%.1f× " +
      f"cached-replan=${hot.min}%.4fs (${gen.min / math.max(hot.min, 1e-9)}%.0f× faster than re-decode)")
  }
}
