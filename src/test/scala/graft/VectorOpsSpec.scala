package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(2.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f))
    ).toDF("id", "a", "b")
  }

  test("dotF computes exact dot product (codegen path)") {
    val rows = df.select(col("id"), VectorOps.dotF(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(rows.map(_.getDouble(1)).toSeq == Seq(32.0, 0.0, 2.0))
  }

  test("dotF interpreted path matches codegen") {
    // force interpreted eval through a non-codegen context: eval via filter on agg
    val viaAgg = df.agg(sum(VectorOps.dotF(col("a"), col("b")))).collect()(0).getDouble(0)
    assert(viaAgg == 34.0)
  }

  test("cosineF is 1 for parallel, 0 for orthogonal vectors") {
    val rows = df.select(col("id"), VectorOps.cosineF(col("a"), col("b")).as("c"))
      .orderBy("id").collect()
    assert(math.abs(rows(1).getDouble(1)) < 1e-12)          // orthogonal
    assert(math.abs(rows(2).getDouble(1) - 1.0) < 1e-12)    // parallel
  }

  test("dotF is null-safe") {
    import spark.implicits._
    val d = Seq((1L, Option(Array(1.0f)), Option.empty[Array[Float]])).toDF("id", "a", "b")
    val r = d.select(VectorOps.dotF(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }
}
