package graft.examples

import graft.formats.AvroCodec
import graft.sinks.{DeletionVectors, IcebergLog}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import java.nio.ByteOrder
import java.nio.file.{Files, Paths, StandardCopyOption}

/** SCALE.md probe for the iceberg v3 DELETION-VECTOR read path: the
  * same table, same deleted rows, read through (1) v2 position-delete
  * parquet (anti-join on name+pos) and (2) v3 puffin DVs (codegen'd
  * broadcast bitmap probe). The spread delete (one row per file) is
  * the anti-join's honest worst case — every file dirty — and the
  * shape a long-running CDC mirror converges to; the probe answers
  * what the v3 read form buys at that point.
  *
  * Usage: runMain graft.examples.V3DvProbe [nFiles] [rowsPerFile] [rowsPerFileDeleted]
  */
object V3DvProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = if (args.length > 0) args(0).toInt else 200
    val rowsPerFile = if (args.length > 1) args(1).toLong else 50000L
    val delPerFile = if (args.length > 2) args(2).toLong else 50L
    val builder = graft.GraftSession.builder("v3dv-probe")
    graft.Bench.tmpfsLocalDir().foreach(d => builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val n = nFiles * rowsPerFile
    val table = Files.createTempDirectory("v3dv-probe").toString
    IcebergLog.writeBatch(spark.range(n)
      .select(col("id").as("k"), (col("id") % 997 * 1.0).as("v"))
      .repartitionByRange(nFiles, col("k")), table)
    IcebergLog.setTableProperties(spark, table,
      Map("write.delete.mode" -> "merge-on-read"))
    // spread delete: delPerFile rows in EVERY file
    IcebergLog.deleteWhere(spark, table, s"k % $rowsPerFile < $delPerFile")
    val expect = n - nFiles * delPerFile
    def readCount(): Long = IcebergLog.read(spark, table).count()
    assert(readCount() == expect)
    val (_, tPos1) = timed(readCount())
    val (_, tPos2) = timed(readCount())
    println(f"[v3dv-probe] rows=$n files=$nFiles deleted=${nFiles * delPerFile} " +
      f"| v2 position anti-join full scan: ${tPos1}%.2fs / ${tPos2}%.2fs")

    // ── convert the delete files to ONE puffin of per-file DV blobs ──
    val dels = IcebergLog.deleteFiles(table, None)
    val delRows = spark.read.schema(StructType(Seq(
        StructField("file_path", StringType), StructField("pos", LongType))))
      .parquet(dels.map(_.path): _*)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    def blob(positions: Seq[Long]): Array[Byte] = {
      val r32 = DeletionVectors.bitmapOf(positions.iterator).serialize().drop(12)
      val vec = ByteBuffer.allocate(12 + r32.length).order(ByteOrder.LITTLE_ENDIAN)
      vec.putLong(1L).putInt(0)
      vec.put(r32)
      val v = vec.array()
      val b = ByteBuffer.allocate(4 + 4 + v.length + 4)
      b.putInt(4 + v.length)
      b.put(Array(0xD1.toByte, 0xD3.toByte, 0x39.toByte, 0x64.toByte))
      b.put(v)
      val crc = new java.util.zip.CRC32
      crc.update(b.array(), 4, 4 + v.length)
      b.putInt(crc.getValue.toInt)
      b.array()
    }
    val metaDir = Paths.get(table, "metadata")
    val puffin = metaDir.resolve("dv-probe.puffin")
    val out = Files.newOutputStream(puffin)
    var offset = 4L
    val blobAt = scala.collection.mutable.Map.empty[String, (Long, Long)]
    try {
      out.write("PFA1".getBytes("UTF-8"))
      delRows.toSeq.sortBy(_._1).foreach { case (ref, positions) =>
        val b = blob(positions)
        blobAt(ref) = (offset, b.length.toLong)
        out.write(b)
        offset += b.length
      }
      out.write("PFA1".getBytes("UTF-8"))
    } finally out.close()
    val v3Entry = StructType(Seq(
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
        StructField("referenced_data_file", StringType, nullable = true),
        StructField("content_offset", LongType, nullable = true),
        StructField("content_size_in_bytes", LongType, nullable = true))),
        nullable = false)))
    val m = IcebergLog.current(table).get
    val snap = m.snapshots.find(_.get("snapshot-id").asLong() == m.currentSnapshotId).get
    val partType = StructType(Seq.empty[StructField])
    IcebergLog.readManifestList(snap.get("manifest-list").asText())
      .filter(_.getInt(3) == 1).foreach { mf =>
      val mfPath = Paths.get(mf.getString(0))
      val entries = IcebergLog.readEntries(mfPath.toString, partType)
      val rows = blobAt.toSeq.sortBy(_._1).map { case (ref, (off, size)) =>
        val e = entries.head
        Row(e.get(0), e.get(1), e.get(2), e.get(3),
          Row(1, puffin.toAbsolutePath.toString, "PUFFIN", Row(),
            delPerFile, size, ref, off, size))
      }
      val tmp = Files.createTempFile(mfPath.getParent, "v3dv", ".avro")
      val o2 = Files.newOutputStream(tmp)
      try AvroCodec.writeOcf(o2, v3Entry, rows.iterator)
      finally o2.close()
      Files.move(tmp, mfPath, StandardCopyOption.REPLACE_EXISTING)
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val mp = metaDir.resolve(s"v${m.version}.metadata.json")
    val node = mapper.readTree(Files.readAllBytes(mp))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.put("format-version", 3)
    Files.write(mp, node.toString.getBytes("UTF-8"))

    assert(readCount() == expect, "v3 DV read must return the same rows")
    val (_, tDv1) = timed(readCount())
    val (_, tDv2) = timed(readCount())
    println(f"[v3dv-probe] v3 puffin DV full scan (${blobAt.size} blobs, " +
      f"${Files.size(puffin) / 1e3}%.0f kB puffin): ${tDv1}%.2fs / ${tDv2}%.2fs")
    println(f"[v3dv-probe] anti-join/DV-probe ratio: ${tPos2 / tDv2}%.2fx")

    // ── WRITE-side cost (r14, the native v3 write mode): the SAME
    // spread delete landed as (a) v2 position-delete parquets vs
    // (b) v3 puffin DVs (executor-built bitmaps, prior-delete folding,
    // spec footer) — what the upgrade costs/buys on the commit path
    def freshDeleteCost(v3: Boolean): Double = {
      val t = Files.createTempDirectory("v3dv_w").toString
      IcebergLog.writeBatch(spark.range(n)
        .select(col("id").as("k"), (col("id") % 997 * 1.0).as("v"))
        .repartitionByRange(nFiles, col("k")), t)
      val props = Map("write.delete.mode" -> "merge-on-read") ++
        (if (v3) Map("format-version" -> "3") else Map.empty)
      IcebergLog.setTableProperties(spark, t, props)
      val (_, sec) = timed(
        IcebergLog.deleteWhere(spark, t, s"k % $rowsPerFile < $delPerFile"))
      assert(IcebergLog.read(spark, t).count() == expect)
      sec
    }
    val tV2w = freshDeleteCost(v3 = false)
    val tV3w = freshDeleteCost(v3 = true)
    println(f"[v3dv-probe] WRITE spread delete (${nFiles * delPerFile} rows " +
      f"across $nFiles files): v2 pos-delete parquet ${tV2w}%.2fs vs " +
      f"v3 puffin DV ${tV3w}%.2fs (${tV2w / tV3w}%.2fx)")
    spark.stop()
  }
}
