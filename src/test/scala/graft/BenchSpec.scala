package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Proves the Bench fail-loud contract: a headline query that throws is
  * recorded in the JSON "errors" field with its timing EXCLUDED from the
  * total, and the battery reports the failure (⇒ main exits nonzero).
  */
class BenchSpec extends SparkSpec {

  private val okQuery: (SparkSession, String) => DataFrame =
    (s, dir) => s.read.parquet(s"$dir/region.parquet")
  private val brokenQuery: (SparkSession, String) => DataFrame =
    (s, _) => { throw new IllegalStateException("deliberately broken"); s.emptyDataFrame }

  test("a throwing query lands in errors, not in the timings") {
    val qmap = Map("q_ok" -> okQuery, "q_broken" -> brokenQuery)
    val (line, errors) =
      Bench.runBattery(spark, sfDir, runs = 2, qmap, Seq("q_ok", "q_broken"))

    assert(errors.map(_._1) == Seq("q_broken"))
    assert(errors.head._2.contains("deliberately broken"))
    assert(line.contains(""""errors":{"q_broken":"""))
    // the broken query must not contribute a (near-zero) median
    assert(!line.contains(""""q_broken":-"""))
    assert(line.contains(""""q_ok":"""))
    // its samples are nulls, keeping the artifact shape stable
    assert(line.contains(""""q_broken":[null,null]"""))
  }

  test("an all-green battery reports no errors and a positive total") {
    val qmap = Map("q_ok" -> okQuery)
    val (line, errors) = Bench.runBattery(spark, sfDir, runs = 1, qmap, Seq("q_ok"))
    assert(errors.isEmpty)
    assert(line.contains(""""errors":{}"""))
    val total = """"value":([0-9.]+)""".r.findFirstMatchIn(line).get.group(1).toDouble
    assert(total > 0.0)
  }

  test("artifact carries environment telemetry (loadavg + dirty pages, r8)") {
    val qmap = Map("q_ok" -> okQuery)
    val (line, _) = Bench.runBattery(spark, sfDir, runs = 1, qmap, Seq("q_ok"))
    // the graded JSON line must let a reader distinguish a contaminated
    // box from a regression without a re-run
    assert(line.contains(""""env":{"loadavg_before":""""), line)
    assert(line.contains(""""dirty_kb_before":"""), line)
    assert(line.contains(""""loadavg_after":""""), line)
    assert(line.contains(""""dirty_kb_after":"""), line)
    // on this Linux box the readings are real, not the fallback
    val (load, dirty) = Bench.envTelemetry()
    assert(load != "unknown" && load.split(" ").length == 3, load)
    assert(dirty >= 0L, s"Dirty: $dirty")
  }

  test("headline tracks the designed-for-scale ANN paths") {
    assert(SparkEntry.headline.contains("q_ann_pq"))
    assert(SparkEntry.headline.contains("q_ann_ivfpq"))
    // every headline query must exist in the query map
    SparkEntry.headline.foreach(n => assert(SparkEntry.queries.contains(n), n))
  }
}
