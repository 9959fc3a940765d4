package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}

/** Delta DELETION VECTORS (public protocol: PROTOCOL.md "Deletion
  * Vectors" + the RoaringFormatSpec): a per-data-file bitmap of deleted
  * row indexes, carried on the `add` action as a descriptor
  * `{storageType, pathOrInlineDv, offset, sizeInBytes, cardinality}`.
  * The bitmap is a 64-bit ROARING BITMAP ARRAY — magic 1681511377, a
  * count, then one standard 32-bit roaring bitmap ("portable" wire
  * format) per 2³²-value span — and lives either inline in the log
  * (storageType `i`, Z85-encoded) or in a `deletion_vector_<uuid>.bin`
  * sidecar (`u`/`p`), each stored DV framed as
  * [size:int32 BE][data][crc32:int32 BE] under a 1-byte format-version
  * header.
  *
  * This codec writes the no-run-container roaring layout (array
  * containers ≤ 4096 values, bitmap containers above) and reads all
  * three container kinds under both cookies — enough to consume
  * third-party DVs and to round-trip its own. Byte-level goldens in
  * DeletionVectorSpec pin the wire format.
  */
private[graft] object DeletionVectors {

  // ── Z85 (ZeroMQ base85, the alphabet delta's Base85Codec uses) ──────

  private val z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val z85Decode: Array[Int] = {
    val a = Array.fill(128)(-1)
    z85Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** Encode; input padded with zero bytes to a multiple of 4 (the
    * decoder drops the pad via its expected-length argument).
    */
  def z85Encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else bytes ++ new Array[Byte](4 - bytes.length % 4)
    val sb = new StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (padded(i + j) & 0xffL); j += 1 }
      var k = 4
      val chunk = new Array[Char](5)
      while (k >= 0) { chunk(k) = z85Alphabet(((v % 85).toInt)); v /= 85; k -= 1 }
      sb.appendAll(chunk)
      i += 4
    }
    sb.toString
  }

  /** Decode to exactly `outLen` bytes (the pad the encoder added is
    * dropped); `outLen < 0` returns every decoded byte.
    */
  def z85Decode(s: String, outLen: Int = -1): Array[Byte] = {
    require(s.length % 5 == 0, s"z85: length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j).toInt
        val d = if (c < 128) z85Decode(c) else -1
        require(d >= 0, s"z85: bad character '${s.charAt(i + j)}'")
        v = v * 85 + d
        j += 1
      }
      var k = 3
      while (k >= 0) { out(o + k) = (v & 0xff).toByte; v >>= 8; k -= 1 }
      i += 5
      o += 4
    }
    if (outLen < 0 || outLen == out.length) out else out.take(outLen)
  }

  def z85EncodeUuid(uuid: java.util.UUID): String = {
    val b = ByteBuffer.allocate(16)
    b.putLong(uuid.getMostSignificantBits)
    b.putLong(uuid.getLeastSignificantBits)
    z85Encode(b.array())
  }

  def z85DecodeUuid(s: String): java.util.UUID = {
    val b = ByteBuffer.wrap(z85Decode(s, 16))
    new java.util.UUID(b.getLong, b.getLong)
  }

  // ── 32-bit roaring bitmap (RoaringFormatSpec "portable") ────────────

  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347
  private val NoOffsetThreshold = 4

  /** One container: key = high 16 bits; values = the low 16 bits,
    * sorted, as Ints in [0, 65536).
    */
  private[sinks] final case class Container(key: Int, values: Array[Int]) {
    def cardinality: Int = values.length
    def contains(low: Int): Boolean =
      java.util.Arrays.binarySearch(values, low) >= 0
  }

  /** Sorted-by-key containers of one 32-bit bitmap. */
  private[sinks] final case class Roaring32(containers: Array[Container]) {
    def cardinality: Long = containers.map(_.cardinality.toLong).sum
    def contains(v: Int): Boolean = {
      val key = (v >>> 16) & 0xffff
      val low = v & 0xffff
      // containers are few; linear scan with early exit
      var i = 0
      while (i < containers.length && containers(i).key < key) i += 1
      i < containers.length && containers(i).key == key && containers(i).contains(low)
    }
    def isEmpty: Boolean = containers.isEmpty
  }

  private def writeRoaring32(r: Roaring32, b: ByteBuffer): Unit = {
    val n = r.containers.length
    b.putInt(SerialCookieNoRun)
    b.putInt(n)
    r.containers.foreach { c =>
      b.putShort((c.key & 0xffff).toShort)
      b.putShort(((c.cardinality - 1) & 0xffff).toShort)
    }
    // offset header (always present under the no-run cookie)
    var off = 4 + 4 + 4 * n + 4 * n
    r.containers.foreach { c =>
      b.putInt(off)
      off += (if (c.cardinality <= 4096) 2 * c.cardinality else 8192)
    }
    r.containers.foreach { c =>
      if (c.cardinality <= 4096) c.values.foreach(v => b.putShort(v.toShort))
      else {
        val words = new Array[Long](1024)
        c.values.foreach(v => words(v >>> 6) |= (1L << (v & 63)))
        words.foreach(b.putLong)
      }
    }
  }

  private def roaring32Bytes(r: Roaring32): Int =
    8 + r.containers.map(c => 8 +
      (if (c.cardinality <= 4096) 2 * c.cardinality else 8192)).sum

  private def readRoaring32(b: ByteBuffer): Roaring32 = {
    val cookie = b.getInt
    val (n, runFlags) =
      if ((cookie & 0xffff) == SerialCookie) {
        val n = (cookie >>> 16) + 1
        val flags = new Array[Byte]((n + 7) / 8)
        b.get(flags)
        (n, Some(flags))
      } else {
        require(cookie == SerialCookieNoRun,
          s"roaring: bad cookie $cookie (not a portable bitmap)")
        (b.getInt, None)
      }
    val keys = new Array[Int](n)
    val cards = new Array[Int](n)
    var i = 0
    while (i < n) {
      keys(i) = b.getShort & 0xffff
      cards(i) = (b.getShort & 0xffff) + 1
      i += 1
    }
    // offset header: always under the no-run cookie; under the run
    // cookie only when n >= NoOffsetThreshold. Containers are laid out
    // sequentially either way — skip it.
    if (runFlags.isEmpty || n >= NoOffsetThreshold) b.position(b.position() + 4 * n)
    val containers = new Array[Container](n)
    i = 0
    while (i < n) {
      val isRun = runFlags.exists(f => (f(i / 8) & (1 << (i % 8))) != 0)
      val values: Array[Int] =
        if (isRun) {
          val nRuns = b.getShort & 0xffff
          val out = Array.newBuilder[Int]
          var r = 0
          while (r < nRuns) {
            val start = b.getShort & 0xffff
            val len = b.getShort & 0xffff
            var v = start
            while (v <= start + len) { out += v; v += 1 }
            r += 1
          }
          out.result()
        } else if (cards(i) <= 4096) {
          val out = new Array[Int](cards(i))
          var j = 0
          while (j < cards(i)) { out(j) = b.getShort & 0xffff; j += 1 }
          out
        } else {
          val out = Array.newBuilder[Int]
          var w = 0
          while (w < 1024) {
            val word = b.getLong
            if (word != 0L) {
              var bit = 0
              while (bit < 64) {
                if ((word & (1L << bit)) != 0) out += (w << 6) | bit
                bit += 1
              }
            }
            w += 1
          }
          out.result()
        }
      containers(i) = Container(keys(i), values)
      i += 1
    }
    Roaring32(containers)
  }

  // ── 64-bit roaring bitmap array (delta's RoaringBitmapArray) ────────

  private val ArrayMagic = 1681511377

  final class Bitmap private[DeletionVectors] (
      private[DeletionVectors] val maps: Array[Roaring32]) extends Serializable {
    def cardinality: Long = maps.map(_.cardinality).sum
    def positions: Iterator[Long] =
      maps.iterator.zipWithIndex.flatMap { case (m, hi) =>
        m.containers.iterator.flatMap(c =>
          c.values.iterator.map(low =>
            (hi.toLong << 32) | ((c.key.toLong << 16) | low)))
      }
    def contains(v: Long): Boolean = {
      require(v >= 0, s"deletion vector: negative row index $v")
      val hi = (v >>> 32).toInt
      hi < maps.length && maps(hi).contains(v.toInt)
    }
    /** Portable wire bytes: magic, int64 bitmap count, each 32-bit
      * bitmap in portable roaring format.
      */
    def serialize(): Array[Byte] = {
      val size = 4 + 8 + maps.map(roaring32Bytes).sum
      val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(ArrayMagic)
      b.putLong(maps.length.toLong)
      maps.foreach(writeRoaring32(_, b))
      b.array()
    }
  }

  // ── Iceberg v3 deletion vectors (Puffin `deletion-vector-v1`) ────────

  /** Read one iceberg v3 deletion vector straight out of a puffin file:
    * the manifest's delete entry supplies (content_offset,
    * content_size_in_bytes), so no footer parse is needed. Blob bytes
    * per the v3 spec: `[len: 4B big-endian = 4 + |vector|]`
    * `[magic D1 D3 39 64]` `[vector]` `[crc32 over magic+vector, 4B
    * big-endian]`; the vector is the 64-bit roaring "portable" format
    * (RoaringFormatSpec): uint64 LE bucket count, then per ascending
    * bucket a uint32 LE high key + a standard 32-bit portable roaring
    * bitmap. Every framing field is verified loudly — a misread DV
    * silently over- or under-returns rows.
    */
  def loadIcebergDv(file: java.nio.file.Path, offset: Long, size: Long): Bitmap = {
    require(size >= 12 && size <= Int.MaxValue,
      s"iceberg dv: implausible content_size_in_bytes $size in $file")
    val all = new Array[Byte](size.toInt)
    val ch = java.nio.channels.FileChannel.open(file)
    try {
      require(offset >= 0 && offset + size <= ch.size(),
        s"iceberg dv: blob [$offset, +$size) lies outside $file (${ch.size()} bytes)")
      val bb = ByteBuffer.wrap(all)
      var pos = offset
      while (bb.hasRemaining) {
        val n = ch.read(bb, pos)
        require(n > 0, s"iceberg dv: short read at $pos in $file")
        pos += n
      }
    } finally ch.close()
    val be = ByteBuffer.wrap(all) // big-endian (buffer default)
    val len = be.getInt
    require(len == size - 8,
      s"iceberg dv: stored length $len != content size $size - 8 in $file")
    val magic = Array(be.get(), be.get(), be.get(), be.get())
    require(magic.sameElements(Array(0xD1.toByte, 0xD3.toByte, 0x39.toByte, 0x64.toByte)),
      s"iceberg dv: bad magic ${magic.map(b => f"${b & 0xff}%02X").mkString(" ")} in $file")
    val crc = new java.util.zip.CRC32
    crc.update(all, 4, len) // magic + vector
    val stored = ByteBuffer.wrap(all, 4 + len, 4).getInt
    require(stored == crc.getValue.toInt,
      s"iceberg dv: crc mismatch in $file @ $offset")
    val lb = ByteBuffer.wrap(all, 8, len - 4).slice().order(ByteOrder.LITTLE_ENDIAN)
    val nBuckets = lb.getLong
    // row indexes are per-FILE: the high-32 key is 0 for any real file;
    // cap generously but refuse absurd keys before allocating by them
    require(nBuckets >= 0 && nBuckets <= 4096,
      s"iceberg dv: implausible bucket count $nBuckets in $file")
    if (nBuckets == 0L) return new Bitmap(Array.empty)
    val buckets = (0 until nBuckets.toInt).map { _ =>
      val key = lb.getInt
      require(key >= 0 && key <= 4095,
        s"iceberg dv: implausible high-32 key $key in $file")
      key -> readRoaring32(lb)
    }
    val maps = Array.fill(buckets.map(_._1).max + 1)(Roaring32(Array.empty))
    buckets.foreach { case (k, r) =>
      require(maps(k).isEmpty, s"iceberg dv: duplicate bucket key $k in $file")
      maps(k) = r
    }
    new Bitmap(maps)
  }

  /** Build a bitmap from row indexes (any order, duplicates fine). */
  def bitmapOf(positions: Iterator[Long]): Bitmap = {
    val sorted = positions.toArray.sorted.distinct
    if (sorted.isEmpty) return new Bitmap(Array.empty)
    require(sorted.head >= 0, "deletion vector: negative row index")
    val maxHi = (sorted.last >>> 32).toInt
    val maps = (0 to maxHi).map { hi =>
      val lo = sorted.filter(v => (v >>> 32).toInt == hi).map(_.toInt)
      val containers = lo.groupBy(v => (v >>> 16) & 0xffff).toSeq.sortBy(_._1)
        .map { case (key, vs) => Container(key, vs.map(_ & 0xffff).sorted) }
      Roaring32(containers.toArray)
    }
    new Bitmap(maps.toArray)
  }

  /** Union (an existing DV merged with newly-deleted positions). */
  def union(a: Bitmap, positions: Iterator[Long]): Bitmap =
    bitmapOf(a.positions ++ positions)

  def deserialize(bytes: Array[Byte]): Bitmap = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(b.getInt == ArrayMagic,
      "deletion vector: bad magic (not a portable RoaringBitmapArray)")
    val n = b.getLong
    require(n >= 0 && n <= Int.MaxValue, s"deletion vector: $n bitmaps")
    new Bitmap(Array.fill(n.toInt)(readRoaring32(b)))
  }

  // ── the DV descriptor (add-action JSON) ─────────────────────────────

  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Int], sizeInBytes: Int, cardinality: Long) {
    /** Resolve + load + verify this descriptor's bitmap. */
    def load(tableRoot: Path): Bitmap = storageType match {
      case "i" =>
        deserialize(z85Decode(pathOrInlineDv, sizeInBytes))
      case "u" | "p" =>
        val file =
          if (storageType == "p") java.nio.file.Paths.get(pathOrInlineDv)
          else uuidPath(tableRoot, pathOrInlineDv)
        val all = Files.readAllBytes(file)
        val off = offset.getOrElse(0)
        val b = ByteBuffer.wrap(all, off, all.length - off)
        val size = b.getInt // big-endian (buffer default)
        require(size == sizeInBytes,
          s"deletion vector $file@$off: stored size $size != descriptor $sizeInBytes")
        val data = new Array[Byte](size)
        b.get(data)
        val crc = new java.util.zip.CRC32
        crc.update(data)
        require(b.getInt == crc.getValue.toInt,
          s"deletion vector $file@$off: checksum mismatch")
        deserialize(data)
      case other => sys.error(s"deletion vector: unknown storageType '$other'")
    }
  }

  /** Serialized size under which a DV inlines into the log (`i`) rather
    * than paying a sidecar entry — a narrow DELETE's descriptor stays a
    * one-line log affair; reads skip the file open entirely.
    */
  val inlineMaxBytes = 512

  /** Persist one commit's DVs: each bitmap at or under
    * [[inlineMaxBytes]] inlines into its descriptor (`i`, Z85-encoded);
    * the rest land together in one fresh sidecar (`u`). One descriptor
    * per input, in order.
    */
  def write(tableRoot: Path, bitmaps: Seq[Bitmap]): Seq[Descriptor] = {
    val serialized = bitmaps.map(bm => (bm, bm.serialize()))
    val big = serialized.collect { case (bm, b) if b.length > inlineMaxBytes => bm }
    val fileDescs = if (big.isEmpty) Iterator.empty else writeFile(tableRoot, big).iterator
    serialized.map { case (bm, b) =>
      if (b.length <= inlineMaxBytes)
        Descriptor("i", z85Encode(b), None, b.length, bm.cardinality)
      else fileDescs.next()
    }
  }

  /** Write one commit's DVs into a fresh sidecar file under the table
    * root (format version 1; each DV framed [size BE][data][crc32 BE]).
    * Returns the shared pathOrInlineDv plus one descriptor per input, in
    * order.
    */
  def writeFile(tableRoot: Path, bitmaps: Seq[Bitmap]): Seq[Descriptor] = {
    val uuid = java.util.UUID.randomUUID()
    val enc = z85EncodeUuid(uuid)
    val file = tableRoot.resolve(s"deletion_vector_$uuid.bin")
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      Files.newOutputStream(file)))
    try {
      out.writeByte(1) // format version
      var offset = 1
      bitmaps.map { bm =>
        val data = bm.serialize()
        out.writeInt(data.length)
        out.write(data)
        val crc = new java.util.zip.CRC32
        crc.update(data)
        out.writeInt(crc.getValue.toInt)
        val d = Descriptor("u", enc, Some(offset), data.length, bm.cardinality)
        offset += 4 + data.length + 4
        d
      }
    } finally out.close()
  }

  /** `[<prefix>]<z85 uuid>` → the sidecar path. The encoded UUID is
    * always the LAST 20 characters (16 bytes → exactly 20 z85 chars);
    * anything before it is an opaque directory prefix. Splitting on a
    * separator would be wrong — '/' is itself a z85 alphabet character.
    */
  private def uuidPath(tableRoot: Path, pathOrInlineDv: String): Path = {
    require(pathOrInlineDv.length >= 20,
      s"deletion vector: '$pathOrInlineDv' is shorter than an encoded UUID")
    val enc = pathOrInlineDv.substring(pathOrInlineDv.length - 20)
    val prefix = pathOrInlineDv.substring(0, pathOrInlineDv.length - 20)
    // the prefix is a SUBDIRECTORY, not a file-name fragment: the
    // protocol's own example "ab^-aqEH.-t@S}K{vb[*k^" resolves to
    // <table>/ab/deletion_vector_<uuid>.bin — delta-spark writes such
    // random prefixes by default at scale, so concatenating would make
    // every third-party prefixed DV a NoSuchFileException
    val dir = if (prefix.isEmpty) tableRoot else tableRoot.resolve(prefix)
    dir.resolve(s"deletion_vector_${z85DecodeUuid(enc)}.bin")
  }

  /** The sidecar file a `u`-descriptor references (vacuum must treat it
    * as referenced while any retained add carries the descriptor).
    */
  def referencedFile(tableRoot: Path, d: Descriptor): Option[Path] =
    d.storageType match {
      case "u" => Some(uuidPath(tableRoot, d.pathOrInlineDv))
      case "p" => Some(java.nio.file.Paths.get(d.pathOrInlineDv))
      case _ => None
    }
}
