package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SC}
import org.scalacheck.Prop.propBoolean

/** Property-based checks for the deterministic sampling/capping family:
  * the operators' contracts (exact replayability, per-group bounds,
  * statistically-sane keep rates) must hold across the parameter space,
  * not just the example fixtures in SamplingSpec.
  */
class SamplingPropertySpec extends SparkSpec {

  private def check(label: String, prop: Prop, n: Int = 20): Unit = {
    val res = SC.check(SC.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$label failed: ${res.status}")
  }

  test("mixtureSample: replayable, rate within binomial bounds, subset of input") {
    import spark.implicits._
    val rows = 1200
    val df = (1L to rows.toLong).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source").cache()
    df.count()
    val genFrac = Gen.choose(0.05, 0.95)
    check("mixtureSample", Prop.forAll(genFrac) { f =>
      val fractions = Map("s0" -> f, "s1" -> f, "s2" -> f)
      val kept = Sampling.mixtureSample(df, "source", "doc_id", fractions)
        .collect().map(_.getLong(0)).toSet
      val again = Sampling.mixtureSample(df, "source", "doc_id", fractions)
        .collect().map(_.getLong(0)).toSet
      // binomial 5σ bounds on n=1200 trials
      val sigma = math.sqrt(rows * f * (1 - f))
      val lo = rows * f - 5 * sigma
      val hi = rows * f + 5 * sigma
      (kept == again) :| "replayable" &&
        (kept.size >= lo && kept.size <= hi) :| s"rate: got ${kept.size} for f=$f" &&
        kept.forall(id => id >= 1 && id <= rows) :| "subset of input ids"
    })
    df.unpersist()
  }

  test("capPerGroup: per-group count bounded by k, survivors are the priority top-k") {
    import spark.implicits._
    val genK = Gen.choose(1, 12)
    val genRows = Gen.choose(30, 120)
    check("capPerGroup", Prop.forAll(genK, genRows) { (k, n) =>
      // deterministic pseudo-random priorities (hash) over 4 groups
      val data = (1 to n).map { i =>
        (i.toLong, s"g${i % 4}", ((i * 2654435761L) % 1000).toLong)
      }
      val df = data.toDF("doc_id", "grp", "prio")
      val out = Sampling.capPerGroup(df, "grp", col("prio"), "doc_id", k)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val byGroup = out.groupBy(_._2)
      val expected = data.groupBy(_._2).map { case (g, rows) =>
        g -> rows.sortBy(r => (-r._3, r._1)).take(k).map(_._1).toSet
      }
      byGroup.forall { case (_, rows) => rows.length <= k } :| "count <= k" &&
        expected.forall { case (g, want) =>
          byGroup.getOrElse(g, Array.empty[(Long, String, Long)]).map(_._1).toSet == want
        } :| "exactly the top-k by (priority desc, id)"
    }, n = 15)
  }
}
