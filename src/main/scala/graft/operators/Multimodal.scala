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
  * BT.601 luma + nearest-neighbor resample) and PCM WAV audio decode is
  * REAL (JDK-native `javax.sound.sampled` → mono float samples, see
  * [[Codec.decodeWav]]); only video and compressed audio (mp3/ogg/aac)
  * remain a clearly-marked deterministic fake ([[Codec.decodeFake]])
  * because this container ships no codec libraries for those.
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

  /** Codec boundary: images decode for REAL via JDK-native `javax.imageio`
    * (png/jpeg/bmp/gif need no external jar) and PCM WAV decodes for REAL
    * via JDK-native `javax.sound.sampled`; video and compressed audio
    * remain stubbed behind [[decodeFake]] (no codec libraries for those in
    * this container).
    */
  object Codec {
    private val imageFormats = Set("png", "jpeg", "jpg", "bmp", "gif")
    private val audioFormats = Set("wav", "wave")

    def canDecode(format: String): Boolean =
      format != null && imageFormats(format.toLowerCase)

    def canDecodeAudio(format: String): Boolean =
      format != null && audioFormats(format.toLowerCase)

    /** Real image decode: bytes → row-major grayscale f32 (ITU-R BT.601
      * luma). Deterministic across executors — pure function of the bytes.
      */
    def decodeReal(bytes: Array[Byte], format: String): Frame = {
      require(canDecode(format), s"no real codec for format '$format' (audio/video are stubbed)")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"imageio failed to decode a '$format' payload")
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

    /** Real PCM WAV decode via the JDK's `javax.sound.sampled` — the same
      * no-external-jar move as `javax.imageio` for images. Bytes → the
      * header's sample rate plus mono float samples in [-1, 1] (channels
      * averaged). Supports the PCM encodings the WAV container actually
      * carries: 8-bit unsigned and 16-bit signed, either endianness.
      * Pure function of the bytes — deterministic across executors.
      */
    def decodeWav(bytes: Array[Byte]): (Int, Array[Float]) = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
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

    /** Dispatch: real decode for images and PCM WAV, deterministic fake
      * otherwise (video, compressed audio). Audio surfaces as a 1×n frame
      * so the shared feature-pooling path applies unchanged.
      *
      * Corrupt or exotic-variant bytes (truncated file, 24-bit/float/A-law
      * WAV, malformed PNG) fall back to the fake rather than throw: in a
      * 100 TB corpus a handful of bad files is certain, and one unguarded
      * exception here would fail the task 4 times and abort the whole job.
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
    * (`explode` of a deterministic index sequence — the shape a frame
    * sampler needs; the decode of each frame is the stubbed codec).
    */
  def sampleFrames(df: DataFrame, everyN: Int): DataFrame =
    df.withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("media_meta.n_frames") - 1, lit(0)), lit(everyN))))

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
