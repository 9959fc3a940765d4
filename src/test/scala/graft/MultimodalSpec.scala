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
    val df = Multimodal.withMeta(media, "bytes", "image", "png", 8, 8)
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
