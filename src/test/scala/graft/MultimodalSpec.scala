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
