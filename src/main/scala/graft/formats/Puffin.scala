package graft.formats

import java.nio.ByteBuffer
import java.nio.ByteOrder
import java.nio.file.{Files, Path}

/** Minimal Puffin surface for iceberg v3 DELETION VECTORS (puffin
  * spec + iceberg v3 "Position Delete Files"): this engine WRITES v2
  * tables, so the writer here serves fixtures/probes and the eventual
  * v3 write path; the READ side lives in
  * [[graft.sinks.DeletionVectors.loadIcebergDv]] (blobs read straight
  * at the manifest's content_offset — no footer parse).
  */
object Puffin {

  /** One `deletion-vector-v1` blob: `[len BE4 = 4 + |vector|]`
    * `[magic D1 D3 39 64]` `[vector: 64-bit portable roaring — bucket
    * count LE8, per bucket key LE4 + 32-bit portable roaring]`
    * `[crc32 BE4 over magic+vector]`. Positions must sit in bucket 0
    * (row indexes within one data file always do).
    */
  def dvBlob(positions: Iterator[Long]): Array[Byte] = {
    val bm = graft.sinks.DeletionVectors.bitmapOf(positions)
    val ser = bm.serialize()
    val buckets = java.nio.ByteBuffer.wrap(ser, 4, 8)
      .order(ByteOrder.LITTLE_ENDIAN).getLong
    // single-bucket frame: a position ≥ 2^32 would serialize a second
    // 32-bit map this framing silently truncates — refuse instead. An
    // EMPTY bitmap frames as zero buckets (claiming one with no payload
    // would make the blob unreadable)
    require(buckets <= 1L,
      "puffin dvBlob: positions must fit one 32-bit bucket (row indexes " +
        "within a single data file always do)")
    val r32 = ser.drop(12) // delta container header off; same 32-bit wire
    val v =
      if (buckets == 0L)
        ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
          .putLong(0L).array()
      else {
        val vec = ByteBuffer.allocate(12 + r32.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        vec.putLong(1L).putInt(0)
        vec.put(r32)
        vec.array()
      }
    val b = ByteBuffer.allocate(4 + 4 + v.length + 4) // big-endian
    b.putInt(4 + v.length)
    b.put(Array(0xD1.toByte, 0xD3.toByte, 0x39.toByte, 0x64.toByte))
    b.put(v)
    val crc = new java.util.zip.CRC32
    crc.update(b.array(), 4, 4 + v.length)
    b.putInt(crc.getValue.toInt)
    b.array()
  }

  /** Write one puffin file holding a DV blob per entry of `positions`
    * (keyed by referenced data file). Returns (file, per-key
    * (content_offset, content_size_in_bytes)) — what the manifest's
    * fields 143-145 record.
    */
  def writeDvFile(dir: Path, positions: Seq[(String, Seq[Long])])
      : (Path, Map[String, (Long, Long)]) = {
    val file = dir.resolve(s"dv-${java.util.UUID.randomUUID()}.puffin")
    val out = Files.newOutputStream(file)
    var offset = 4L
    val at = Map.newBuilder[String, (Long, Long)]
    try {
      out.write("PFA1".getBytes("UTF-8"))
      positions.foreach { case (ref, ps) =>
        val b = dvBlob(ps.iterator)
        at += ref -> (offset, b.length.toLong)
        out.write(b)
        offset += b.length
      }
      out.write("PFA1".getBytes("UTF-8")) // stand-in footer section
    } finally out.close()
    (file, at.result())
  }
}
