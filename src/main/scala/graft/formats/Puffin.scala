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
  def dvBlob(positions: Iterator[Long]): Array[Byte] =
    dvBlobOf(graft.sinks.DeletionVectors.bitmapOf(positions))

  /** Same framing from an already-built bitmap — what the iceberg v3
    * write path hands over (bitmaps build executor-side; the driver
    * only ever sees roaring-compressed bytes).
    */
  def dvBlobOf(bm: graft.sinks.DeletionVectors.Bitmap): Array[Byte] = {
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

  private val Magic = Array(0x50.toByte, 0x46.toByte, 0x41.toByte, 0x31.toByte) // "PFA1"

  /** Write one puffin file holding a DV blob per entry of `positions`
    * (keyed by referenced data file). Returns (file, per-key
    * (content_offset, content_size_in_bytes)) — what the manifest's
    * fields 143-145 record.
    *
    * The file is SPEC-COMPLIANT end to end: `Magic  Blob₁…Blobₙ
    * Magic FooterPayload FooterPayloadSize(LE4) Flags(4) Magic`, with
    * FooterPayload the uncompressed UTF-8 FileMetadata JSON listing
    * each blob as `deletion-vector-v1` with `fields:[]`,
    * `snapshot-id`/`sequence-number` −1 (the iceberg v3 convention —
    * the commit that adopts the DV is created AFTER the file, so the
    * writer cannot know them), `offset`/`length` spanning the full
    * framed blob (len prefix through CRC — what `content_offset`/
    * `content_size_in_bytes` must equal), and the required
    * `referenced-data-file` + `cardinality` string properties. A
    * conformant third-party reader (iceberg-java/pyiceberg) can open
    * these files from the footer alone.
    */
  def writeDvFile(dir: Path, positions: Seq[(String, Seq[Long])])
      : (Path, Map[String, (Long, Long)]) =
    writeDvFileOf(dir, positions.map { case (r, ps) =>
      r -> graft.sinks.DeletionVectors.bitmapOf(ps.iterator) })

  def writeDvFileOf(dir: Path,
      dvs: Seq[(String, graft.sinks.DeletionVectors.Bitmap)])
      : (Path, Map[String, (Long, Long)]) = {
    val file = dir.resolve(s"dv-${java.util.UUID.randomUUID()}.puffin")
    val out = Files.newOutputStream(file)
    var offset = 4L
    val at = Map.newBuilder[String, (Long, Long)]
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.createObjectNode()
    val blobsArr = meta.putArray("blobs")
    try {
      out.write(Magic)
      dvs.foreach { case (ref, dv) =>
        val b = dvBlobOf(dv)
        at += ref -> (offset, b.length.toLong)
        val bm = blobsArr.addObject()
        bm.put("type", "deletion-vector-v1")
        bm.putArray("fields")
        bm.put("snapshot-id", -1L)
        bm.put("sequence-number", -1L)
        bm.put("offset", offset)
        bm.put("length", b.length.toLong)
        val props = bm.putObject("properties")
        props.put("referenced-data-file", ref)
        props.put("cardinality", dv.cardinality.toString)
        out.write(b)
        offset += b.length
      }
      meta.putObject("properties").put("created-by", "graft")
      val payload = mapper.writeValueAsBytes(meta)
      out.write(Magic)
      out.write(payload)
      val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      tail.putInt(payload.length)
      tail.putInt(0) // flags: footer payload NOT compressed
      out.write(tail.array())
      out.write(Magic)
    } finally out.close()
    (file, at.result())
  }

  /** Parse a puffin file's footer into its FileMetadata JSON — the
    * conformant read path (offset-free): seek the trailing magic, read
    * FooterPayloadSize + Flags, decode the payload. Refuses compressed
    * footers (this writer never emits them) and any magic mismatch.
    */
  def readFileMetadata(file: Path): com.fasterxml.jackson.databind.JsonNode = {
    val bytes = Files.readAllBytes(file)
    require(bytes.length >= 20 &&
      bytes.take(4).sameElements(Magic) &&
      bytes.takeRight(4).sameElements(Magic),
      s"$file: not a puffin file (magic mismatch)")
    val tail = ByteBuffer.wrap(bytes, bytes.length - 12, 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    val payloadSize = tail.getInt
    val flags = tail.getInt
    require((flags & 1) == 0,
      s"$file: puffin footer payload is compressed; this reader handles " +
        "uncompressed footers only")
    val payloadStart = bytes.length - 12 - payloadSize
    require(payloadStart >= 8 &&
      bytes.slice(payloadStart - 4, payloadStart).sameElements(Magic),
      s"$file: puffin footer framing invalid (payload size $payloadSize " +
        "does not land on the footer's opening magic)")
    new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(bytes, payloadStart, payloadSize, "UTF-8"))
  }
}
