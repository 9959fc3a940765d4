package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = {
    import spark.implicits._
    Seq(
      (1L, Array[Byte](1, 2, 3, 4)),
      (2L, Array[Byte](1, 2, 3, 4)),   // identical bytes → identical features
      (3L, Array[Byte](9, 9, 9, 9))
    ).toDF("id", "bytes")
  }

  test("binary media column + metadata + deterministic feature extraction") {
    // format 'raw' has no real codec → exercises the deterministic fake path
    val df = Multimodal.withMeta(media, "bytes", "image", "raw", 8, 8)
    assert(df.schema("media_meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.contains("media_type"))
    val feats = Multimodal.extractFeatures(df, "bytes", dim = 4)
      .select(col("id"), col("features"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(1L).length == 4)
    assert(feats(1L) == feats(2L))       // same bytes, same features
    assert(feats(1L) != feats(3L))       // different bytes differ
    // re-run: exact determinism across executions
    val again = Multimodal.extractFeatures(df, "bytes", dim = 4)
      .select(col("id"), col("features"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(again == feats)
  }

  test("real PNG decode via javax.imageio: features reflect actual pixels") {
    import spark.implicits._
    // 8×8 PNG: left half black, right half white
    def png(): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8)
        img.setRGB(x, y, if (x < 4) 0x000000 else 0xFFFFFF)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val df = Multimodal.withMeta(
      Seq((1L, png()), (2L, png())).toDF("id", "bytes"), "bytes", "image", "png", 8, 8)
    val feats = Multimodal.extractFeatures(df, "bytes", dim = 2)
      .select(col("id"), col("features"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // row-major mean-pool over halves: both buckets mix black+white columns
    // equally → each ≈ 0.5; and decode is deterministic across rows
    assert(feats(1L) == feats(2L))
    assert(feats(1L).forall(v => v > 0.4f && v < 0.6f), s"got ${feats(1L)}")

    // geometry comes from the actual decoded image
    val frame = Multimodal.resize(df, "bytes", 4, 4).select("frame.*").collect()(0)
    assert(frame.getInt(0) == 4 && frame.getInt(1) == 4)
    val px = frame.getSeq[Float](2)
    // resampled 4×4 keeps the black-left / white-right structure
    assert(px.grouped(4).forall(row => row(0) < 0.1f && row(3) > 0.9f), s"got $px")
  }

  test("real TIFF decode via the JDK-native plugin (scanned-document format)") {
    import spark.implicits._
    // same half-black/half-white 8x8, but TIFF-encoded: the decode path
    // must treat it exactly like the PNG case (JDK 9+ ships the plugin)
    def tiff(): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8)
        img.setRGB(x, y, if (x < 4) 0x000000 else 0xFFFFFF)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "tiff", out), "JDK must carry a TIFF writer")
      out.toByteArray
    }
    val df = Multimodal.withMeta(
      Seq((1L, tiff())).toDF("id", "bytes"), "bytes", "image", "tiff", 8, 8)
    val feats = Multimodal.extractFeatures(df, "bytes", dim = 2)
      .select(col("features")).collect()(0).getSeq[Float](0)
    assert(feats.forall(v => v > 0.4f && v < 0.6f), s"got $feats")
    val frame = Multimodal.resize(df, "bytes", 4, 4).select("frame.*").collect()(0)
    assert(frame.getInt(0) == 4 && frame.getInt(1) == 4)
    val px = frame.getSeq[Float](2)
    assert(px.grouped(4).forall(row => row(0) < 0.1f && row(3) > 0.9f), s"got $px")
  }

  test("real PCM WAV decode via javax.sound.sampled: stats reflect actual samples") {
    import spark.implicits._
    // 0.1 s of a 440 Hz sine at 8 kHz, 16-bit mono, amplitude 0.5 —
    // written with the same JDK API users would, then decoded back
    def wav(amplitude: Double): Array[Byte] = {
      val sr = 8000
      val n = 800
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val v = (amplitude * math.sin(2 * math.Pi * 440.0 * i / sr) * 32767).toInt
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val df = Seq((1L, wav(0.5)), (2L, wav(0.5)), (3L, wav(0.1)))
      .toDF("id", "bytes")
    val stats = Multimodal.audioStats(df, "bytes")
      .select("id", "sample_rate", "n_frames", "rms", "peak")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getFloat(3), r.getFloat(4)))).toMap
    // header fields come from the real WAV header
    assert(stats(1L)._1 == 8000 && stats(1L)._2 == 800, s"got ${stats(1L)}")
    // a sine's RMS is amplitude/sqrt(2); peak is the amplitude — both are
    // content-derived, impossible to fake from the byte hash
    assert(math.abs(stats(1L)._3 - 0.5 / math.sqrt(2)) < 0.01, s"rms ${stats(1L)._3}")
    assert(math.abs(stats(1L)._4 - 0.5) < 0.01, s"peak ${stats(1L)._4}")
    assert(stats(1L) == stats(2L), "identical bytes, identical stats")
    assert(math.abs(stats(3L)._3 - 0.1 / math.sqrt(2)) < 0.01, s"rms ${stats(3L)._3}")

    // the shared feature path decodes audio for real too: amplitude pools
    // track the waveform (each bucket of a symmetric sine means ≈ 0)
    val feats = Multimodal.withMeta(df, "bytes", "audio", "wav", 0, 0)
    val pooled = Multimodal.extractFeatures(feats, "bytes", dim = 4)
      .select("id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(pooled(1L).forall(v => math.abs(v) < 0.05), s"got ${pooled(1L)}")

    // non-wav bytes degrade to null stats, not a task failure
    val junk = Multimodal.audioStats(
      Seq((9L, Array[Byte](1, 2, 3))).toDF("id", "bytes"), "bytes")
      .select("sample_rate").collect()(0)
    assert(junk.isNullAt(0))
  }

  // ── real video: MJPEG-in-AVI round-trip through our RIFF writer/parser ──

  private def jpegOf(seed: Int, w: Int = 16, h: Int = 12): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (((x * 16 + seed * 40) & 0xff) << 16) | (((y * 20) & 0xff) << 8) | ((x * y + seed) & 0xff))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  test("real MJPEG-AVI decode: container round-trip matches per-still JPEG decode") {
    import graft.operators.Multimodal.{Avi, Codec}
    val jpegs = (0 until 3).map(jpegOf(_))
    val avi = Avi.encode(jpegs, 16, 12, compression = "MJPG")
    val parsed = Avi.parse(avi)
    assert(parsed.width == 16 && parsed.height == 12 && parsed.compression == "MJPG")
    assert(parsed.frames.length == 3)
    val frames = Codec.decodeVideo(avi)
    assert(frames.length == 3)
    // each container frame decodes EXACTLY like the standalone JPEG —
    // same bytes, same ImageIO path
    frames.zip(jpegs).foreach { case (f, j) =>
      val still = Codec.decodeReal(j, "jpeg")
      assert(f.width == 16 && f.height == 12)
      assert(f.pixels.sameElements(still.pixels))
    }
    // frames are genuinely distinct images
    assert(!frames(0).pixels.sameElements(frames(1).pixels))
  }

  test("AVI1 repair: DHT-stripped MJPEG frames decode via the standard Annex K tables") {
    import graft.operators.Multimodal.{Avi, Codec}
    // strip every DHT segment, as real motion-JPEG streams do ("AVI1")
    def stripDht(j: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(j, 0, 2)
      var i = 2
      var done = false
      while (!done && i + 4 <= j.length) {
        val m = j(i + 1) & 0xff
        if (m == 0xDA) { out.write(j, i, j.length - i); done = true }
        else {
          val len = 2 + (((j(i + 2) & 0xff) << 8) | (j(i + 3) & 0xff))
          if (m != 0xC4) out.write(j, i, len)
          i += len
        }
      }
      out.toByteArray
    }
    val jpegs = (0 until 2).map(jpegOf(_))
    val stripped = jpegs.map(stripDht)
    assert(stripped(0).length < jpegs(0).length) // tables really came out
    def hasDht(j: Array[Byte]): Boolean =
      j.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc4)
    assert(!hasDht(stripped(0)))
    // the MJPEG path splices the standard Annex K tables back in (the
    // AVI1 convention; not every JPEG decoder is as forgiving as the
    // JDK's), and since the JDK encoder writes exactly those tables,
    // decode is bit-identical to the original
    assert(hasDht(Codec.ensureDht(stripped(0))))
    assert(Codec.ensureDht(jpegs(0)).eq(jpegs(0)), "tables present → pass-through untouched")
    val avi = Avi.encode(stripped, 16, 12, compression = "MJPG")
    val frames = Codec.decodeVideo(avi)
    frames.zip(jpegs).foreach { case (f, orig) =>
      assert(f.pixels.sameElements(Codec.decodeReal(orig, "jpeg").pixels))
    }
  }

  test("real uncompressed-DIB AVI decode: bottom-up BGR with row padding") {
    import graft.operators.Multimodal.{Avi, Codec}
    val w = 3; val h = 2 // stride 3*3=9 → padded to 12
    // top row red, bottom row blue, stored bottom-up
    val stride = 12
    val dib = new Array[Byte](stride * h)
    for (x <- 0 until w) {
      dib(0 * stride + x * 3) = 0xff.toByte     // file row 0 = image bottom: B=255
      dib(1 * stride + x * 3 + 2) = 0xff.toByte // file row 1 = image top: R=255
    }
    val avi = Avi.encode(Seq(dib, dib), w, h, compression = "", bitCount = 24)
    val frames = Codec.decodeVideo(avi)
    assert(frames.length == 2)
    val f = frames(0)
    assert(f.width == w && f.height == h)
    // BT.601: red → 0.299, blue → 0.114
    assert(f.pixels.take(w).forall(v => math.abs(v - 0.299f) < 1e-3), s"top ${f.pixels.toSeq}")
    assert(f.pixels.drop(w).forall(v => math.abs(v - 0.114f) < 1e-3), s"bottom ${f.pixels.toSeq}")
  }

  test("videoFrameFeatures: per-frame rows with real decoded features; corrupt bytes degrade") {
    import spark.implicits._
    import graft.operators.Multimodal.{Avi, Codec}
    val jpegs = (0 until 4).map(jpegOf(_))
    val avi = Avi.encode(jpegs, 16, 12)
    val df = Multimodal.withVideoMeta(
      Seq((1L, avi), (2L, Array[Byte](1, 2, 3)), (3L, null.asInstanceOf[Array[Byte]]))
        .toDF("id", "bytes"), "bytes")
    // header probe fills n_frames without decoding
    val metas = df.select($"id", $"media_meta.n_frames", $"media_meta.width").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(metas(1L) == ((4, 16)) && metas(2L) == ((0, 0)))
    val rows = Multimodal.videoFrameFeatures(df, "bytes", everyN = 2, dim = 4)
      .select("id", "frame_idx", "frame_w", "features").collect()
    val byId = rows.groupBy(_.getLong(0))
    // 4 frames sampled every 2 → idx 0 and 2, real geometry
    assert(byId(1L).map(_.getInt(1)).sorted.toSeq == Seq(0, 2))
    assert(byId(1L).forall(_.getInt(2) == 16))
    // features match the shared still-image pooling of the same frame
    val f0 = byId(1L).find(_.getInt(1) == 0).get.getSeq[Float](3)
    val still = Codec.decodeReal(jpegs(0), "jpeg")
    val pooledDf = Multimodal.extractFeatures(
      Multimodal.withMeta(Seq((1L, jpegs(0))).toDF("id", "bytes"), "bytes", "image", "jpeg", 16, 12),
      "bytes", dim = 4).select("features").collect()(0).getSeq[Float](0)
    assert(f0 == pooledDf, s"$f0 vs $pooledDf")
    assert(still.width == 16)
    // corrupt bytes → one fake frame at idx 0, not a task failure
    assert(byId(2L).map(_.getInt(1)).toSeq == Seq(0))
    // null bytes → zero rows
    assert(!byId.contains(3L))
  }

  test("real animated-GIF decode: frame count, geometry, and palette-exact pixels") {
    import spark.implicits._
    import graft.operators.Multimodal.Codec
    // 3 solid-gray frames: ≤256 colors → GIF encodes them exactly
    val grays = Seq(40, 120, 200)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    grays.foreach { g =>
      val img = new java.awt.image.BufferedImage(10, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 10) img.setRGB(x, y, (g << 16) | (g << 8) | g)
      w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    w.endWriteSequence(); ios.close()
    val gif = bos.toByteArray
    val frames = Codec.decodeVideo(gif)
    assert(frames.length == 3)
    frames.zip(grays).foreach { case (f, g) =>
      assert(f.width == 10 && f.height == 8)
      // gray luma: 0.299g + 0.587g + 0.114g = g (exact for solid gray)
      assert(f.pixels.forall(p => math.abs(p - g / 255f) < 1e-6), s"gray $g got ${f.pixels(0)}")
    }
    // the DataFrame path: meta probe + per-frame features work for gif too
    val df = Multimodal.withVideoMeta(Seq((1L, gif)).toDF("id", "bytes"), "bytes", format = "gif")
    assert(df.select($"media_meta.n_frames").collect()(0).getInt(0) == 3)
    val rows = Multimodal.videoFrameFeatures(df, "bytes", everyN = 1, dim = 2)
      .select("frame_idx", "features").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getSeq[Float](1)(0)).sorted.zip(grays.map(_ / 255f)).forall {
      case (a, b) => math.abs(a - b) < 1e-6
    })
  }

  test("real G.711 µ-law and A-law WAV decode via javax.sound.sampled") {
    import spark.implicits._
    import graft.operators.Multimodal.Codec
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    val sr = 8000f
    val n = 800
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (0.5 * math.sin(2 * math.Pi * 440.0 * i / sr) * 32767).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    def g711(enc: AudioFormat.Encoding): Array[Byte] = {
      val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, sr, 16, 1, 2, sr, false)
      val src = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), pcmFmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        AudioSystem.getAudioInputStream(new AudioFormat(enc, sr, 8, 1, 1, sr, false), src),
        AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    for (enc <- Seq(AudioFormat.Encoding.ULAW, AudioFormat.Encoding.ALAW)) {
      val wavBytes = g711(enc)
      // the compressed payload is half the PCM size — it really is G.711
      assert(wavBytes.length < n * 2 - 100, s"$enc not compressed: ${wavBytes.length}")
      val (rate, samples) = Codec.decodeWav(wavBytes)
      assert(rate == 8000 && samples.length == n)
      // G.711 companding at half scale: segment step ≈ 3% of full scale
      // near the peak → |err| ≤ ~1.6%; far tighter than any fake could be
      val maxErr = samples.indices.map { i =>
        val orig = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort / 32768.0f
        math.abs(samples(i) - orig)
      }.max
      assert(maxErr < 0.02f, s"$enc max err $maxErr")
    }
    // audioStats rides the same path: G.711 payloads produce real stats
    val stats = Multimodal.audioStats(
      Seq((1L, g711(AudioFormat.Encoding.ULAW))).toDF("id", "bytes"), "bytes")
      .select("sample_rate", "n_frames", "rms").collect()(0)
    assert(stats.getInt(0) == 8000 && stats.getInt(1) == n)
    assert(math.abs(stats.getFloat(2) - 0.5 / math.sqrt(2)) < 0.01)
  }

  test("AVI with an audio track: the auds strf (WAVEFORMATEX) must not claim the geometry") {
    import graft.operators.Multimodal.{Avi, Codec}
    // hand-build a two-stream AVI: auds strl FIRST (the layout real muxers
    // emit), then vids — an audio WAVEFORMATEX aliasing the BITMAPINFOHEADER
    // fields (44100 where biWidth sits) must not overwrite width/height
    def le32(v: Int): Array[Byte] =
      Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      cc(id) ++ le32(body.length) ++ body ++ (if ((body.length & 1) == 1) Array[Byte](0) else Array.emptyByteArray)
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      cc("LIST") ++ le32(body.length + 4) ++ cc(kind) ++ body
    val w = 3; val h = 2
    val audStrh = cc("auds") ++ cc("    ") ++ Array.fill(48)(0.toByte)
    // WAVEFORMATEX: wFormatTag=1|nChannels=1 (first u32 = 65537 ≥ 40!),
    // nSamplesPerSec=44100 — would become "width" without the vids guard
    val audStrf = le32(1 | (1 << 16)) ++ le32(44100) ++ le32(88200) ++ le32(2 | (16 << 16))
    val vidStrh = cc("vids") ++ cc("DIB ") ++ Array.fill(48)(0.toByte)
    val vidStrf = le32(40) ++ le32(w) ++ le32(h) ++ le32(1 | (24 << 16)) ++ le32(0) ++
      le32(w * h * 3) ++ Array.fill(16)(0.toByte)
    val stride = 12 // 3*3 padded to 4
    val dib = new Array[Byte](stride * h)
    val hdrl = list("hdrl",
      chunk("avih", le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(2) ++ le32(0) ++ le32(w) ++ le32(h) ++ Array.fill(16)(0.toByte)) ++
      list("strl", chunk("strh", audStrh) ++ chunk("strf", audStrf)) ++
      list("strl", chunk("strh", vidStrh) ++ chunk("strf", vidStrf)))
    val movi = list("movi", chunk("01db", dib)) // video is stream 01 here
    val body = hdrl ++ movi
    val avi = cc("RIFF") ++ le32(body.length + 4) ++ cc("AVI ") ++ body
    val parsed = Avi.parse(avi)
    assert(parsed.width == w && parsed.height == h,
      s"audio strf leaked into geometry: ${parsed.width}x${parsed.height}")
    assert(parsed.bitCount == 24 && parsed.frames.length == 1)
    val frames = Codec.decodeVideo(avi)
    assert(frames.head.width == w && frames.head.height == h)
  }

  test("AVI parser survives fuzzed and truncated containers (100 TB bad-file policy)") {
    import graft.operators.Multimodal.{Avi, Codec}
    val rnd = new scala.util.Random(42)
    // pure garbage: must throw cleanly (caller wraps in Try), never hang
    (0 until 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(512))(rnd.nextInt.toByte)
      scala.util.Try(Codec.decodeVideo(junk)) // must return promptly
    }
    // RIFF-framed garbage: magic passes, body is noise — parse must not
    // throw (lenient walk) and decode must fail cleanly or produce frames
    (0 until 200).foreach { _ =>
      val junk = Array.fill(64 + rnd.nextInt(512))(rnd.nextInt.toByte)
      "RIFF".getBytes.copyToArray(junk, 0)
      "AVI ".getBytes.copyToArray(junk, 8)
      val parsed = scala.util.Try(Avi.parse(junk))
      assert(parsed.isSuccess, "lenient walk must tolerate garbage bodies")
      scala.util.Try(Codec.decodeVideo(junk))
    }
    // every truncation prefix of a VALID container parses without throwing
    // and yields at most the full frame count
    val jpegs = (0 until 3).map(jpegOf(_))
    val avi = Avi.encode(jpegs, 16, 12)
    (12 to avi.length by 7).foreach { n =>
      val v = Avi.parse(java.util.Arrays.copyOfRange(avi, 0, n))
      assert(v.frames.length <= 3)
    }
    // random single-byte corruptions: parse stays graceful (decode may
    // legitimately fail on a corrupted JPEG payload — cleanly)
    (0 until 100).foreach { _ =>
      val mut = avi.clone()
      mut(12 + rnd.nextInt(mut.length - 12)) = rnd.nextInt.toByte
      scala.util.Try(Avi.parse(mut)).foreach(v => assert(v.frames.length <= 3))
      scala.util.Try(Codec.decodeVideo(mut))
    }
  }

  test("resize produces target geometry; frame sampling explodes indices") {
    val df = Multimodal.withMeta(media, "bytes", "video", "mp4", 4, 4)
      .withColumn("media_meta", col("media_meta").withField("n_frames", lit(10)))
    val rs = Multimodal.resize(df, "bytes", 2, 3).select("frame.*").collect()
    assert(rs.forall(r => r.getInt(0) == 2 && r.getInt(1) == 3 && r.getSeq[Float](2).length == 6))
    val sampled = Multimodal.sampleFrames(df, everyN = 3)
      .groupBy("id").agg(collect_list("frame_idx").as("idx"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).sorted).toMap
    assert(sampled(1L) == Seq(0, 3, 6, 9))
  }
}
