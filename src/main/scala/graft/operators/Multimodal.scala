package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns + typed metadata, with decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side plumbing is real: schemas, partition-size control, batched
  * `mapPartitions` over rows (the Scala analogue of `mapInPandas` — one
  * iterator per partition, vectorizable per chunk), deterministic outputs.
  * Image decode is REAL (JDK-native `javax.imageio`: png/jpeg/bmp/gif →
  * BT.601 luma + nearest-neighbor resample), audio decode is REAL for both
  * PCM WAV and G.711 µ-law/A-law compressed WAV (JDK-native
  * `javax.sound.sampled` → mono float samples, see [[Codec.decodeWav]]),
  * and video decode is REAL for the intra-frame formats the JDK can
  * carry — the two AVI payloads, MJPEG (each `00dc` chunk is a baseline
  * JPEG, including the AVI1 variant that omits Huffman tables) and
  * uncompressed bottom-up BGR DIB (`00db`), via a pure-JDK RIFF parser
  * ([[Avi.parse]]) + `javax.imageio` per frame — plus animated GIF via
  * the JDK's multi-image reader. Only inter-frame video codecs (h264/vp9/…)
  * and perceptual audio (mp3/ogg/aac) remain a clearly-marked
  * deterministic fake ([[Codec.decodeFake]]) because this container ships
  * no codec libraries for those.
  */
object Multimodal {

  /** media metadata struct carried next to the bytes */
  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // png/jpeg/wav/mp4/…
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sample_rate", IntegerType)))

  /** A decoded frame: row-major grayscale f32 pixels (fake decode). */
  final case class Frame(width: Int, height: Int, pixels: Array[Float])

  /** Minimal RIFF/AVI container support, pure JDK. AVI is the one video
    * container whose common intra-frame payloads the JDK can genuinely
    * decode: MJPEG (`00dc` chunks are standalone baseline JPEGs — old
    * cameras, OpenCV's default writer) and uncompressed DIB (`00db`
    * chunks are bottom-up BGR bitmaps). The parser is a lenient chunk
    * walk — unknown chunks (`idx1`, `JUNK`, vendor LISTs) are skipped,
    * which is what a 100 TB crawl of real files requires.
    *
    * Reference behavior: media columns ride pipelines as opaque bytes +
    * metadata (the reference's raw_bytes format,
    * crates/arroyo-formats/src/ser.rs); the decode stage is this module's
    * extension for training-data pipelines.
    */
  object Avi {
    /** Parsed video stream: geometry + the raw payload of every frame
      * chunk in file order, plus the stream's compression fourcc
      * (`"MJPG"`, `""` for BI_RGB) and bit depth from `strf`.
      */
    final case class Video(width: Int, height: Int, frames: Vector[Array[Byte]],
        compression: String, bitCount: Int)

    private def le32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Lenient RIFF walk: collects `##dc`/`##db` frame payloads and the
      * video stream's `strf` BITMAPINFOHEADER; `avih` supplies geometry
      * when `strf` is absent. Throws on a non-AVI header; tolerates
      * truncated tails (frames parsed so far are returned).
      */
    def parse(bytes: Array[Byte]): Video = {
      require(bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI ",
        "not a RIFF/AVI payload")
      var width = 0; var height = 0; var compression = ""; var bitCount = 0
      var lastStreamType = "" // fccType of the most recent strh (vids/auds/…)
      val frames = Vector.newBuilder[Array[Byte]]
      def walk(from: Int, to: Int): Unit = {
        var pos = from
        while (pos + 8 <= to) {
          val id = fourcc(bytes, pos)
          val size = le32(bytes, pos + 4)
          val dataStart = pos + 8
          val dataEnd = math.min(dataStart + size, to)
          if (size < 0 || dataStart > to) return // truncated/corrupt tail
          id match {
            // guards check dataEnd (bytes actually present), not the declared
            // size — a truncated file may declare 40 and carry 20
            case "LIST" if dataEnd - dataStart >= 4 => walk(dataStart + 4, dataEnd)
            case "avih" if dataEnd - dataStart >= 40 =>
              if (width == 0) { width = le32(bytes, dataStart + 32); height = le32(bytes, dataStart + 36) }
            case "strh" if dataEnd - dataStart >= 4 =>
              lastStreamType = fourcc(bytes, dataStart)
            // the strf's layout depends on which stream owns it: only a
            // 'vids' stream's strf is a BITMAPINFOHEADER (an audio track's
            // WAVEFORMATEX would alias the geometry fields — e.g. mono PCM
            // puts 44100 where biWidth sits). When NO strh was parseable
            // (corrupt/truncated header), fall back to the lenient
            // biSize-shaped heuristic so a lone intact strf still counts.
            case "strf" if (lastStreamType == "vids" || lastStreamType.isEmpty) &&
                dataEnd - dataStart >= 20 && le32(bytes, dataStart) >= 40 =>
              // BITMAPINFOHEADER (biSize first) => this strf belongs to a video stream
              width = le32(bytes, dataStart + 4)
              height = math.abs(le32(bytes, dataStart + 8))
              bitCount = le32(bytes, dataStart + 12) >>> 16
              val comp = le32(bytes, dataStart + 16)
              compression = if (comp == 0) "" else {
                val c = Array[Byte](comp.toByte, (comp >> 8).toByte, (comp >> 16).toByte, (comp >> 24).toByte)
                new String(c, java.nio.charset.StandardCharsets.US_ASCII).trim
              }
            case _ if id.length == 4 && id(0).isDigit && id(1).isDigit &&
                (id.substring(2) == "dc" || id.substring(2) == "db") =>
              if (dataEnd > dataStart) frames += java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
            case _ => () // idx1, JUNK, vendor chunks: skip
          }
          val next = dataStart + size + (size & 1) // chunks are word-aligned
          if (next <= pos) return // declared size overflowed Int — corrupt
          pos = next
        }
      }
      walk(12, bytes.length)
      Video(width, height, frames.result(), compression, bitCount)
    }

    private def putLe32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    private def putCc(out: java.io.ByteArrayOutputStream, s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII), 0, 4)

    /** Build a spec-shaped AVI around pre-encoded frame payloads: RIFF →
      * `LIST hdrl` (avih + `LIST strl` with strh/strf) → `LIST movi`
      * (one `00dc`/`00db` chunk per frame) → `idx1`. `compression` is the
      * strf fourcc ("MJPG", or "" for uncompressed BI_RGB DIB frames,
      * which also flips the chunk id to `00db`).
      */
    def encode(frames: Seq[Array[Byte]], width: Int, height: Int,
        compression: String = "MJPG", bitCount: Int = 24, fps: Int = 25): Array[Byte] = {
      val raw = compression.isEmpty
      val chunkId = if (raw) "00db" else "00dc"
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val o = new java.io.ByteArrayOutputStream()
        putCc(o, id); putLe32(o, body.length); o.write(body, 0, body.length)
        if ((body.length & 1) == 1) o.write(0)
        o.toByteArray
      }
      def list(kind: String, body: Array[Byte]): Array[Byte] = {
        val o = new java.io.ByteArrayOutputStream()
        putCc(o, "LIST"); putLe32(o, body.length + 4); putCc(o, kind); o.write(body, 0, body.length)
        o.toByteArray
      }
      val avih = { // MainAVIHeader, 56 bytes
        val o = new java.io.ByteArrayOutputStream()
        putLe32(o, if (fps > 0) 1000000 / fps else 0); putLe32(o, 0); putLe32(o, 0)
        putLe32(o, 0x10) // AVIF_HASINDEX
        putLe32(o, frames.length); putLe32(o, 0); putLe32(o, 1)
        putLe32(o, frames.map(_.length).maxOption.getOrElse(0))
        putLe32(o, width); putLe32(o, height)
        (0 until 4).foreach(_ => putLe32(o, 0))
        o.toByteArray
      }
      val strh = { // AVIStreamHeader, 56 bytes
        val o = new java.io.ByteArrayOutputStream()
        putCc(o, "vids"); putCc(o, if (raw) "DIB " else compression.padTo(4, ' '))
        putLe32(o, 0); putLe32(o, 0); putLe32(o, 0)
        putLe32(o, 1); putLe32(o, fps) // dwScale / dwRate
        putLe32(o, 0); putLe32(o, frames.length)
        putLe32(o, frames.map(_.length).maxOption.getOrElse(0))
        putLe32(o, -1); putLe32(o, 0)
        putLe32(o, 0); putLe32(o, (height << 16) | (width & 0xffff))
        o.toByteArray
      }
      val strf = { // BITMAPINFOHEADER, 40 bytes
        val o = new java.io.ByteArrayOutputStream()
        putLe32(o, 40); putLe32(o, width); putLe32(o, height)
        putLe32(o, (bitCount << 16) | 1) // planes=1 | biBitCount
        if (raw) putLe32(o, 0) else putCc(o, compression.padTo(4, ' '))
        putLe32(o, width * height * (bitCount / 8))
        (0 until 4).foreach(_ => putLe32(o, 0))
        o.toByteArray
      }
      val hdrl = list("hdrl", chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val moviBody = new java.io.ByteArrayOutputStream()
      val idx = new java.io.ByteArrayOutputStream()
      var off = 4 // idx1 offsets are relative to the movi list's kind fourcc
      frames.foreach { f =>
        val c = chunk(chunkId, f)
        moviBody.write(c, 0, c.length)
        putCc(idx, chunkId); putLe32(idx, 0x10); putLe32(idx, off); putLe32(idx, f.length)
        off += c.length
      }
      val movi = list("movi", moviBody.toByteArray)
      val body = hdrl ++ movi ++ chunk("idx1", idx.toByteArray)
      val out = new java.io.ByteArrayOutputStream()
      putCc(out, "RIFF"); putLe32(out, body.length + 4); putCc(out, "AVI ")
      out.write(body, 0, body.length)
      out.toByteArray
    }
  }

  /** Codec boundary: images decode for REAL via JDK-native `javax.imageio`
    * (png/jpeg/bmp/gif need no external jar), WAV audio decodes for REAL
    * via JDK-native `javax.sound.sampled` — PCM plus the G.711 µ-law /
    * A-law compressed encodings the JDK converts natively — and AVI video
    * decodes for REAL for MJPEG and uncompressed-DIB payloads
    * ([[Avi.parse]] + `javax.imageio`, incl. the AVI1 missing-Huffman-table
    * repair). Inter-frame video codecs and perceptual audio remain stubbed
    * behind [[decodeFake]] (no codec libraries for those in this
    * container).
    */
  object Codec {
    // tiff: JDK 9+ ships com.sun.imageio.plugins.tiff natively — scanned
    // documents in crawl data arrive as TIFF routinely (r7)
    private val imageFormats = Set("png", "jpeg", "jpg", "bmp", "gif", "tiff", "tif")
    private val audioFormats = Set("wav", "wave")
    private val videoFormats = Set("avi", "mjpeg", "gif")

    def canDecode(format: String): Boolean =
      format != null && imageFormats(format.toLowerCase)

    def canDecodeAudio(format: String): Boolean =
      format != null && audioFormats(format.toLowerCase)

    def canDecodeVideo(format: String): Boolean =
      format != null && videoFormats(format.toLowerCase)

    /** Real image decode: bytes → row-major grayscale f32 (ITU-R BT.601
      * luma). Deterministic across executors — pure function of the bytes.
      */
    def decodeReal(bytes: Array[Byte], format: String): Frame = {
      require(canDecode(format), s"no real codec for format '$format'")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"imageio failed to decode a '$format' payload")
      lumaOf(img)
    }

    /** The standard JPEG Huffman tables (ITU T.81 Annex K) as ready-to-
      * splice DHT marker segments. Harvested once from the JDK's own
      * encoder — which emits exactly the Annex K tables when Huffman
      * optimization is off (its default) — instead of transcribing ~420
      * bytes of spec constants. Needed because motion-JPEG streams in the
      * wild ("AVI1") routinely omit DHT and expect the decoder to supply
      * the standard tables.
      */
    private lazy val standardDhtSegments: Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      val j = bos.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      var i = 2
      var stop = false
      while (!stop && i + 4 <= j.length) {
        val marker = j(i + 1) & 0xff
        if ((j(i) & 0xff) != 0xff || marker == 0xDA) stop = true
        else {
          val len = ((j(i + 2) & 0xff) << 8) | (j(i + 3) & 0xff)
          if (marker == 0xC4) out.write(j, i, 2 + len)
          i += 2 + len
        }
      }
      require(out.size > 0, "JDK JPEG encoder unexpectedly emitted no DHT segments")
      out.toByteArray
    }

    /** Repair an AVI1-style baseline JPEG that omits its Huffman tables:
      * if no DHT (0xFFC4) marker precedes SOS, splice the standard Annex K
      * tables in front of SOS. JPEGs that carry their own tables pass
      * through untouched.
      */
    def ensureDht(jpeg: Array[Byte]): Array[Byte] = {
      var i = 2
      var sosAt = -1
      var hasDht = false
      while (sosAt < 0 && i + 4 <= jpeg.length && (jpeg(i) & 0xff) == 0xff) {
        val marker = jpeg(i + 1) & 0xff
        if (marker == 0xDA) sosAt = i
        else if (marker >= 0xD0 && marker <= 0xD8) i += 2
        else {
          if (marker == 0xC4) hasDht = true
          i += 2 + (((jpeg(i + 2) & 0xff) << 8) | (jpeg(i + 3) & 0xff))
        }
      }
      if (hasDht || sosAt < 0) jpeg
      else {
        val out = new java.io.ByteArrayOutputStream(jpeg.length + standardDhtSegments.length)
        out.write(jpeg, 0, sosAt)
        out.write(standardDhtSegments, 0, standardDhtSegments.length)
        out.write(jpeg, sosAt, jpeg.length - sosAt)
        out.toByteArray
      }
    }

    /** Real video decode, dispatched on the container magic: RIFF → AVI
      * (MJPEG / raw DIB frames), `GIF8` → animated GIF. All frames as
      * grayscale f32, in stream order. Pure function of the bytes —
      * deterministic across executors.
      */
    def decodeVideo(bytes: Array[Byte]): Vector[Frame] =
      if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')
        decodeAviFrames(bytes)
      else if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8')
        decodeGifFrames(bytes)
      else throw new IllegalArgumentException("not an AVI or animated-GIF payload")

    /** AVI frames: MJPEG payloads (anything opening with the JPEG SOI
      * marker) go through [[ensureDht]] + `javax.imageio`; uncompressed
      * payloads are decoded as bottom-up BGR DIBs with 4-byte row padding
      * (the BI_RGB layout `00db` chunks carry).
      */
    private def decodeAviFrames(bytes: Array[Byte]): Vector[Frame] = {
      val v = Avi.parse(bytes)
      v.frames.map { payload =>
        if (payload.length >= 2 && (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8) {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(ensureDht(payload)))
          require(img != null, "imageio failed to decode an MJPEG frame")
          lumaOf(img)
        } else
          decodeDib(payload, v.width, v.height, math.max(v.bitCount, 24))
      }
    }

    /** Animated-GIF frames via the JDK's multi-image GIF reader. Frames
      * are decoded as stored (no inter-frame compositing: an optimized
      * GIF whose later frames are partial-screen deltas yields the raw
      * delta rasters — full-frame GIFs, the common case for ML media
      * corpora, decode exactly).
      */
    def decodeGifFrames(bytes: Array[Byte]): Vector[Frame] = {
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        (0 until n).map(i => lumaOf(reader.read(i))).toVector
      } finally {
        reader.dispose()
        iis.close()
      }
    }

    /** Bottom-up BGR DIB → luma frame (rows padded to 4-byte stride). */
    private def decodeDib(payload: Array[Byte], w: Int, h: Int, bitCount: Int): Frame = {
      val bpp = bitCount / 8
      val stride = ((w * bpp + 3) / 4) * 4
      require(payload.length >= stride * h, s"DIB payload too short for ${w}x$h@$bitCount")
      val px = new Array[Float](w * h)
      var y = 0
      while (y < h) {
        val rowOff = (h - 1 - y) * stride // bottom-up
        var x = 0
        while (x < w) {
          val o = rowOff + x * bpp
          val b = payload(o) & 0xff
          val g = payload(o + 1) & 0xff
          val r = payload(o + 2) & 0xff
          px(y * w + x) = (0.299f * r + 0.587f * g + 0.114f * b) / 255f
          x += 1
        }
        y += 1
      }
      Frame(w, h, px)
    }

    private def lumaOf(img: java.awt.image.BufferedImage): Frame = {
      val w = img.getWidth
      val h = img.getHeight
      val px = new Array[Float](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          px(y * w + x) = (0.299f * r + 0.587f * g + 0.114f * b) / 255f
          x += 1
        }
        y += 1
      }
      Frame(w, h, px)
    }

    /** Nearest-neighbor resample to a target geometry. */
    def resample(f: Frame, w: Int, h: Int): Frame = {
      val px = new Array[Float](w * h)
      var y = 0
      while (y < h) {
        val sy = y * f.height / h
        var x = 0
        while (x < w) {
          px(y * w + x) = f.pixels(sy * f.width + (x * f.width / w))
          x += 1
        }
        y += 1
      }
      Frame(w, h, px)
    }

    /** Real WAV decode via the JDK's `javax.sound.sampled` — the same
      * no-external-jar move as `javax.imageio` for images. Bytes → the
      * header's sample rate plus mono float samples in [-1, 1] (channels
      * averaged). Covers the PCM encodings the WAV container actually
      * carries (8-bit unsigned and 16-bit signed, either endianness) AND
      * the two compressed G.711 encodings the JDK converts natively:
      * µ-law and A-law (telephony/call-center corpora). Pure function of
      * the bytes — deterministic across executors.
      */
    def decodeWav(bytes: Array[Byte]): (Int, Array[Float]) = {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val base = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val enc0 = base.getFormat.getEncoding
      val in =
        if (enc0 == AudioFormat.Encoding.ULAW || enc0 == AudioFormat.Encoding.ALAW) {
          // real compressed-audio decode: the JDK expands G.711 to PCM16
          val f0 = base.getFormat
          AudioSystem.getAudioInputStream(
            new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, f0.getSampleRate, 16,
              f0.getChannels, 2 * f0.getChannels, f0.getSampleRate, false), base)
        } else base
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        require((enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED && bits == 16) ||
            (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED && bits == 8),
          s"native wav decode covers PCM 16-bit signed / 8-bit unsigned, got $enc $bits-bit")
        val ch = fmt.getChannels
        val bytesPerSample = bits / 8
        val raw = in.readAllBytes()
        val nFrames = raw.length / (bytesPerSample * ch)
        val out = new Array[Float](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0.0f
          var c = 0
          while (c < ch) {
            val off = (f * ch + c) * bytesPerSample
            acc +=
              (if (bits == 8) ((raw(off) & 0xff) - 128) / 128.0f
               else {
                 val (lo, hi) = if (fmt.isBigEndian) (off + 1, off) else (off, off + 1)
                 ((raw(hi) << 8) | (raw(lo) & 0xff)).toShort / 32768.0f
               })
            c += 1
          }
          out(f) = acc / ch
          f += 1
        }
        (fmt.getSampleRate.toInt, out)
      } finally in.close()
    }

    /** Dispatch: real decode for images, WAV audio (PCM + G.711), and AVI
      * video (MJPEG / raw DIB — first frame); deterministic fake otherwise
      * (inter-frame video codecs, perceptual audio). Audio surfaces as a
      * 1×n frame so the shared feature-pooling path applies unchanged.
      *
      * Corrupt or exotic-variant bytes (truncated file, 24-bit/float WAV,
      * malformed PNG, h264-in-AVI) fall back to the fake rather than throw:
      * in a 100 TB corpus a handful of bad files is certain, and one
      * unguarded exception here would fail the task 4 times and abort the
      * whole job.
      */
    def decode(bytes: Array[Byte], meta: Row): Frame = {
      val mediaType = meta.getString(0)
      val format = meta.getString(1)
      val real: Option[Frame] =
        if (mediaType == "image" && canDecode(format))
          scala.util.Try(decodeReal(bytes, format)).toOption
        else if (mediaType == "audio" && canDecodeAudio(format))
          scala.util.Try {
            val (_, samples) = decodeWav(bytes)
            Frame(samples.length, 1, samples)
          }.toOption
        else if (mediaType == "video" && canDecodeVideo(format))
          scala.util.Try(decodeVideo(bytes).head).toOption
        else None
      real.getOrElse(decodeFake(bytes, meta.getInt(2), meta.getInt(3)))
    }

    /** Deterministic fake: pixels derived from a rolling hash of the bytes —
      * stable across runs/executors, so tests and benchmarks are exact.
      */
    def decodeFake(bytes: Array[Byte], width: Int, height: Int): Frame = {
      val px = new Array[Float](width * height)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      var p = 0
      while (p < px.length) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17 // xorshift
        px(p) = ((h & 0xFFFF).toFloat / 65535.0f)
        p += 1
      }
      Frame(width, height, px)
    }
  }

  /** Attach a metadata struct column for raw media bytes. */
  def withMeta(df: DataFrame, bytesCol: String, mediaType: String, format: String,
      width: Int, height: Int): DataFrame =
    df.withColumn("media_meta", struct(
      lit(mediaType).as("media_type"), lit(format).as("format"),
      lit(width).as("width"), lit(height).as("height"),
      lit(1).as("n_frames"), lit(0).as("sample_rate")))

  /** Attach video metadata by probing each AVI container (header parse
    * only — frame payloads are not decoded). Unparseable bytes get
    * (0, 0, 0) geometry, to be caught downstream by the decode fallback.
    */
  def withVideoMeta(df: DataFrame, bytesCol: String, format: String = "avi"): DataFrame = {
    val probe = udf { (bytes: Array[Byte]) =>
      if (bytes == null) (0, 0, 0)
      else scala.util.Try {
        if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') {
          val fs = Codec.decodeGifFrames(bytes)
          (fs.headOption.map(_.width).getOrElse(0), fs.headOption.map(_.height).getOrElse(0), fs.length)
        } else {
          val v = Avi.parse(bytes)
          (v.width, v.height, v.frames.length)
        }
      }.getOrElse((0, 0, 0))
    }
    df.withColumn("_p", probe(col(bytesCol)))
      .withColumn("media_meta", struct(
        lit("video").as("media_type"), lit(format).as("format"),
        col("_p._1").as("width"), col("_p._2").as("height"),
        col("_p._3").as("n_frames"), lit(0).as("sample_rate")))
      .drop("_p")
  }

  /** Decode + feature-extract: bytes → fixed-size embedding (mean-pooled
    * patch intensities of the decoded frame). Batched per partition; the
    * per-row work is pure function of (bytes, meta) so it parallelizes and
    * re-executes deterministically (speculative tasks safe).
    */
  def extractFeatures(df: DataFrame, bytesCol: String, dim: Int = 16): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType), nullable = true))
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    val bytesIdx = df.schema.fieldIndex(bytesCol)
    val metaIdx = df.schema.fieldIndex("media_meta")
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](bytesIdx)
        if (bytes == null) Row.fromSeq(r.toSeq :+ null)
        else {
          val meta = r.getStruct(metaIdx)
          val frame = Codec.decode(bytes, meta)
          Row.fromSeq(r.toSeq :+ meanPool(frame, dim))
        }
      }
    }
  }

  /** Resize: decode (real for images) then resample to the target geometry.
    * Output adds a `frame` struct column.
    */
  def resize(df: DataFrame, bytesCol: String, w: Int, h: Int): DataFrame = {
    val frameSchema = StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("pixels", ArrayType(FloatType))))
    val outSchema = StructType(df.schema.fields :+ StructField("frame", frameSchema))
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    val bytesIdx = df.schema.fieldIndex(bytesCol)
    val metaIdx = df.schema.fieldIndex("media_meta")
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](bytesIdx)
        if (bytes == null) Row.fromSeq(r.toSeq :+ null)
        else {
          val meta = r.getStruct(metaIdx)
          // same corrupt-bytes fallback as Codec.decode: one truncated
          // image must not abort the resize job
          val f0 =
            (if (meta.getString(0) == "image" && Codec.canDecode(meta.getString(1)))
              scala.util.Try(Codec.decodeReal(bytes, meta.getString(1))).toOption
            else None).getOrElse(Codec.decodeFake(bytes, w, h))
          val f = if (f0.width == w && f0.height == h) f0 else Codec.resample(f0, w, h)
          Row.fromSeq(r.toSeq :+ Row(f.width, f.height, f.pixels.toSeq))
        }
      }
    }
  }

  /** Audio analysis: PCM WAV bytes → content-derived columns
    * (sample_rate, n_frames, rms, peak) via the REAL JDK decode — the
    * audio analogue of the image feature path. Null bytes (or non-wav
    * payloads) yield null stats rather than failing the partition.
    */
  def audioStats(df: DataFrame, bytesCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("sample_rate", IntegerType), StructField("n_frames", IntegerType),
      StructField("rms", FloatType), StructField("peak", FloatType)))
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    val bytesIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](bytesIdx)
        val stats: Seq[Any] =
          if (bytes == null) Seq(null, null, null, null)
          else try {
            val (sr, samples) = Codec.decodeWav(bytes)
            var sum2 = 0.0
            var peak = 0.0f
            samples.foreach { s =>
              sum2 += s.toDouble * s
              if (math.abs(s) > peak) peak = math.abs(s)
            }
            val rms = if (samples.isEmpty) 0.0f
              else math.sqrt(sum2 / samples.length).toFloat
            Seq[Any](sr, samples.length, rms, peak)
          } catch { case _: Exception => Seq(null, null, null, null) }
        Row.fromSeq(r.toSeq ++ stats)
      }
    }
  }

  /** Frame sampling for video-ish media: one row per sampled frame index
    * (`explode` of a deterministic index sequence — the metadata-only
    * shape, no decode; pair with [[videoFrameFeatures]] for decoded
    * output).
    */
  def sampleFrames(df: DataFrame, everyN: Int): DataFrame =
    df.withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("media_meta.n_frames") - 1, lit(0)), lit(everyN))))

  /** REAL frame sampling + feature extraction for video columns: each AVI
    * payload is container-parsed once per row, every `everyN`-th frame is
    * decoded (MJPEG / raw DIB via the JDK codecs) and mean-pooled to a
    * `dim`-float feature vector — one output row per sampled frame
    * (`frame_idx`, `frame_w`, `frame_h`, `features`). Undecodable bytes
    * degrade to a single fake frame at index 0 (same 100 TB bad-file
    * policy as [[Codec.decode]]); null bytes yield zero rows. Row-local
    * work only — parallelism and partitioning pass through untouched.
    */
  def videoFrameFeatures(df: DataFrame, bytesCol: String, everyN: Int = 1, dim: Int = 16): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType), StructField("frame_w", IntegerType),
      StructField("frame_h", IntegerType), StructField("features", ArrayType(FloatType))))
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    val bytesIdx = df.schema.fieldIndex(bytesCol)
    val metaIdx = df.schema.fieldIndex("media_meta")
    val step = math.max(everyN, 1)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](bytesIdx)
        if (bytes == null) Iterator.empty
        else {
          val meta = r.getStruct(metaIdx)
          val frames = scala.util.Try(Codec.decodeVideo(bytes)).toOption
            .filter(_.nonEmpty)
            .getOrElse(Vector(Codec.decodeFake(bytes, meta.getInt(2), meta.getInt(3))))
          Iterator.range(0, frames.length, step).map { i =>
            val f = frames(i)
            Row.fromSeq(r.toSeq ++ Seq(i, f.width, f.height, meanPool(f, dim)))
          }
        }
      }
    }
  }

  private def meanPool(frame: Frame, dim: Int): Seq[Float] = {
    val out = new Array[Float](dim)
    val counts = new Array[Int](dim)
    var i = 0
    while (i < frame.pixels.length) {
      val b = i * dim / frame.pixels.length
      out(b) += frame.pixels(i); counts(b) += 1
      i += 1
    }
    var b = 0
    while (b < dim) { if (counts(b) > 0) out(b) /= counts(b); b += 1 }
    out.toSeq
  }
}
