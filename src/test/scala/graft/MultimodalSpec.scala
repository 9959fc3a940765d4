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
