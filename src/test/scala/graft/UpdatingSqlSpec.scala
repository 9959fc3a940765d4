package graft

import graft.streaming.UpdatingSql
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Generalized SQL-path updating aggregate (UpdatingSql.translate):
  * composite keys, expression groupings, multiple aggregates, and true
  * retract+append emission across micro-batches.
  */
class UpdatingSqlSpec extends SparkSpec {

  test("frameKey: composite keys cannot alias (length-prefixed framing)") {
    import org.apache.spark.sql.Row
    import graft.streaming.UpdatingSql
    // Row.toString would render both of these as "[a,b]" (round-3 ADVICE:
    // colliding ids merged two keys' events into one debezium envelope)
    assert(UpdatingSql.frameKey(Row("a,b")) != UpdatingSql.frameKey(Row("a", "b")))
    // NULL vs the string "null" differ too
    assert(UpdatingSql.frameKey(Row(null)) != UpdatingSql.frameKey(Row("null")))
    // equal keys frame identically (the pairing contract)
    assert(UpdatingSql.frameKey(Row("a", 1L)) == UpdatingSql.frameKey(Row("a", 1L)))
  }

  test("translate: multi-agg grouped query matches plain aggregation in batch") {
    import spark.implicits._
    Seq(("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 20.0), ("b", 30.0))
      .toDF("k", "v").createOrReplaceTempView("us_t")
    val df = spark.sql(
      """SELECT k, count(*) AS n, sum(v) AS s, min(v) AS mn, max(v) AS mx, avg(v) AS av
        |FROM us_t GROUP BY k""".stripMargin)
    val translated = UpdatingSql.translate(df, None)
    assert(translated.isDefined, "expected the plan shape to translate")
    val rows = translated.get.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getStruct(6).getBoolean(0))).toSet
    assert(rows == Set(
      ("a", 2L, 4.0, 1.0, 3.0, 2.0, false),
      ("b", 3L, 60.0, 10.0, 30.0, 20.0, false)), s"got $rows")
  }

  test("translate: composite keys and expression groupings/inputs") {
    import spark.implicits._
    Seq((1L, 2L, 2.0, 3.0), (1L, 3L, 4.0, 5.0), (2L, 2L, 1.0, 1.0))
      .toDF("k1", "k2", "a", "b").createOrReplaceTempView("us_t2")
    val df = spark.sql(
      "SELECT k1, k2 % 2 AS m, sum(a * b) AS sab FROM us_t2 GROUP BY k1, k2 % 2")
    val translated = UpdatingSql.translate(df, None)
    assert(translated.isDefined)
    val rows = translated.get.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == Set((1L, 0L, 6.0), (1L, 1L, 20.0), (2L, 0L, 1.0)), s"got $rows")
  }

  test("translate: unsupported shapes fall back (non-agg, collect_list)") {
    import spark.implicits._
    Seq(("a", 1.0)).toDF("k", "v").createOrReplaceTempView("us_t3")
    val nonAgg = spark.sql("SELECT k FROM us_t3")
    assert(UpdatingSql.translate(nonAgg, None).isEmpty)
    val cl = spark.sql("SELECT k, collect_list(v) FROM us_t3 GROUP BY k")
    assert(UpdatingSql.translate(cl, None).isEmpty)
  }

  test("translate: count(distinct), post-agg expressions and HAVING") {
    import spark.implicits._
    Seq(("a", "x", 1L), ("a", "x", 2L), ("a", "y", 3L), ("b", "z", 4L))
      .toDF("k", "c", "q").createOrReplaceTempView("us_t5")
    val q = """SELECT * FROM (
              |  SELECT concat('p_', k) AS pk, count(*) AS n,
              |         count(distinct c) AS d, sum(q + 5) + 10 AS s
              |  FROM us_t5 GROUP BY concat('p_', k)
              |) WHERE n >= 1""".stripMargin
    val translated = UpdatingSql.translate(spark.sql(q), None)
    assert(translated.isDefined, "expected distinct+expr+filter shape to translate")
    val rows = translated.get.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows == Set(("p_a", 3L, 2L, 31.0), ("p_b", 1L, 1L, 19.0)), s"got $rows")
  }

  test("translate: global aggregate with count(distinct) and filter") {
    import spark.implicits._
    Seq(1L, 2L, 2L, 3L).toDF("s").createOrReplaceTempView("us_t6")
    val q = "SELECT * FROM (SELECT count(distinct s) AS subtasks FROM us_t6) WHERE subtasks >= 1"
    val translated = UpdatingSql.translate(spark.sql(q), None)
    assert(translated.isDefined, "expected global distinct shape to translate")
    val rows = translated.get.collect().map(r => r.getLong(0)).toSet
    assert(rows == Set(3L), s"got $rows")
  }

  test("streaming: second micro-batch emits retract of the published row") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val df = input.toDF().toDF("k", "v")
      .selectExpr("k AS __k_0", "CAST(v AS DOUBLE) AS __v_0", "CAST(v AS DOUBLE) AS __v_1")
    val updates = UpdatingSql.updatingAggRows(df, numKeys = 1,
      kinds = Seq(UpdatingSql.KCountStar, UpdatingSql.KSum), ttl = None)
    val q = updates.writeStream.format("memory").queryName("us_stream")
      .outputMode("update").start()
    try {
      input.addData(("a", 1.0))
      q.processAllAvailable()
      input.addData(("a", 2.0), ("b", 5.0))
      q.processAllAvailable()
      val rows = spark.table("us_stream")
        .select(col("__k_0"), col("__a_0"), col("__a_1"), col("_updating_meta.is_retract"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      // batch 1: append (a,1,1.0). batch 2: retract (a,1,1.0), append
      // (a,2,3.0), append (b,1,5.0)
      assert(rows.toSet == Set(
        ("a", 1L, 1.0, false), ("a", 1L, 1.0, true),
        ("a", 2L, 3.0, false), ("b", 1L, 5.0, false)), s"got ${rows.toSet}")
    } finally q.stop()
  }

  test("retract-aware input: counts, sums and distinct maps subtract") {
    import spark.implicits._
    // (key, value, distinct-string, is_retract): insert 3 rows for key a,
    // then retract one — net state must reflect the subtraction, and
    // distinct multiplicity must only drop a value at count zero
    val rows = Seq(
      ("a", 1.0, "x", false),
      ("a", 2.0, "x", false),
      ("a", 3.0, "y", false),
      ("a", 2.0, "x", true))
    val child = rows.toDF("k", "v", "c", "r")
      .selectExpr("k AS __k_0", "CAST(v AS DOUBLE) AS __v_0",
        "CAST(v AS DOUBLE) AS __v_1", "CAST(c AS STRING) AS __v_2", "r AS __r")
    val out = UpdatingSql.updatingAggRows(child, numKeys = 1,
      kinds = Seq(UpdatingSql.KCountStar, UpdatingSql.KSum, UpdatingSql.KDistinct),
      ttl = None)
      .filter(!org.apache.spark.sql.functions.col("_updating_meta.is_retract"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // net: 2 rows (3 inserts − 1 retract), sum 1+3=4, distinct {x,y}=2
    // (x still present: multiplicity 2−1=1)
    assert(out.toSeq == Seq(("a", 2L, 4.0, 2L)), s"got ${out.toSeq}")
  }

  test("retract-aware input: a fully-retracted key emits only the retract") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Double, Boolean)]
    val child = input.toDF().toDF("k", "v", "r")
      .selectExpr("k AS __k_0", "CAST(v AS DOUBLE) AS __v_0", "r AS __r")
    val updates = UpdatingSql.updatingAggRows(child, numKeys = 1,
      kinds = Seq(UpdatingSql.KSum), ttl = None)
    val q = updates.writeStream.format("memory").queryName("us_retract")
      .outputMode("update").start()
    try {
      input.addData(("a", 5.0, false))
      q.processAllAvailable()
      input.addData(("a", 5.0, true)) // retract the only row
      q.processAllAvailable()
      val rows = spark.table("us_retract")
        .select(col("__k_0"), col("__a_0"), col("_updating_meta.is_retract"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
      // batch 1: append (a,5). batch 2: retract (a,5) and NOTHING else —
      // the group disappeared (debezium d) and its state was dropped
      assert(rows.toSet == Set(("a", 5.0, false), ("a", 5.0, true)), s"got ${rows.toSet}")
      // state dropped ⇒ re-inserting starts fresh (a create, not an update)
      input.addData(("a", 7.0, false))
      q.processAllAvailable()
      val all = spark.table("us_retract")
        .select(col("__a_0"), col("_updating_meta.is_retract"))
        .collect().map(r => (r.getDouble(0), r.getBoolean(1)))
      assert(all.count(t => t._1 == 7.0 && !t._2) == 1 &&
        !all.exists(t => t._1 == 7.0 && t._2), s"got ${all.toSeq}")
    } finally q.stop()
  }

  test("translate: variance family matches Spark's own batch results") {
    import spark.implicits._
    Seq(("a", 1.0), ("a", 3.0), ("a", 5.0), ("b", 10.0), ("b", 20.0), ("c", 7.0))
      .toDF("k", "v").createOrReplaceTempView("us_t4")
    val q = """SELECT k, var_pop(v) AS vp, var_samp(v) AS vs,
              |  stddev_pop(v) AS sp, stddev_samp(v) AS ss
              |FROM us_t4 GROUP BY k""".stripMargin
    val translated = UpdatingSql.translate(spark.sql(q), None)
    assert(translated.isDefined, "variance family should translate")
    def grab(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(math.round(r.getDouble(i) * 1e9) / 1e9)
    val got = translated.get.collect()
      .map(r => (r.getString(0), grab(r, 1), grab(r, 2), grab(r, 3), grab(r, 4))).toSet
    val want = spark.sql(q).collect()
      .map(r => (r.getString(0), grab(r, 1), grab(r, 2), grab(r, 3), grab(r, 4))).toSet
    assert(got == want, s"got $got want $want")
    // single-row group: sample variants are null, population variants 0
    assert(got.exists(t => t._1 == "c" && t._2.contains(0.0) && t._3.isEmpty && t._5.isEmpty))
  }

  test("streaming: stddev retract+append across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val df = input.toDF().toDF("k", "v")
      .selectExpr("k AS __k_0", "CAST(v AS DOUBLE) AS __v_0")
    val updates = UpdatingSql.updatingAggRows(df, numKeys = 1,
      kinds = Seq(UpdatingSql.KStddevSamp), ttl = None)
    val q = updates.writeStream.format("memory").queryName("us_stddev")
      .outputMode("update").start()
    try {
      input.addData(("a", 2.0), ("a", 4.0))
      q.processAllAvailable()
      input.addData(("a", 6.0))
      q.processAllAvailable()
      val rows = spark.table("us_stddev")
        .select(col("__k_0"), col("__a_0"), col("_updating_meta.is_retract"))
        .collect().map(r => (r.getString(0),
          Option(r.get(1)).map(_ => math.round(r.getDouble(1) * 1e6) / 1e6),
          r.getBoolean(2)))
      // batch 1: append stddev{2,4}=√2. batch 2: retract √2, append stddev{2,4,6}=2
      val s2 = math.round(math.sqrt(2.0) * 1e6) / 1e6
      assert(rows.toSet == Set(
        ("a", Some(s2), false), ("a", Some(s2), true), ("a", Some(2.0), false)),
        s"got ${rows.toSet}")
    } finally q.stop()
  }

  test("fuzz: full accumulator battery matches Spark batch on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xC0FFEE)
    // groups of size 1..40, values spanning negatives/zeros/duplicates,
    // nullable second column, epoch-scale third column (cancellation probe)
    val rows = (0 until 400).map { i =>
      val k = s"g${rnd.nextInt(12)}"
      val v: java.lang.Double =
        if (rnd.nextInt(10) == 0) null else rnd.nextInt(200) - 100 + rnd.nextDouble()
      val w: java.lang.Double = 1.7e9 + rnd.nextInt(100000)
      val b = rnd.nextInt(64).toLong
      val s = s"s${rnd.nextInt(6)}"
      (k, v, w, b, s, rnd.nextBoolean())
    }
    rows.toDF("k", "v", "w", "b", "s", "fl").createOrReplaceTempView("us_fz")
    val q = """SELECT k,
              |  count(*) AS c0, count(v) AS c1, count(distinct s) AS cd,
              |  sum(v) AS sm, avg(v) AS av, min(v) AS mn, max(v) AS mx,
              |  var_samp(v) AS vs, stddev_pop(v) AS sp,
              |  median(v) AS md, percentile(v, 0.25) AS p25,
              |  corr(v, w) AS cr, covar_pop(v, w) AS cp, covar_samp(v, w) AS cs,
              |  regr_slope(v, w) AS rs, regr_intercept(v, w) AS ri,
              |  regr_r2(v, w) AS r2, regr_count(v, w) AS rc,
              |  regr_avgx(v, w) AS rx, regr_avgy(v, w) AS ry,
              |  regr_sxx(v, w) AS sxx, regr_syy(v, w) AS syy, regr_sxy(v, w) AS sxy,
              |  bit_and(b) AS ba, bit_or(b) AS bo, bit_xor(b) AS bx,
              |  bool_and(fl) AS fa, bool_or(fl) AS fo
              |FROM us_fz GROUP BY k""".stripMargin
    val translated = UpdatingSql.translate(spark.sql(q), None)
    assert(translated.isDefined, "battery should translate")
    def canon(r: org.apache.spark.sql.Row): (String, Seq[Any]) =
      (r.getString(0), (1 until 29).map { i =>
        if (r.isNullAt(i)) null
        else r.get(i) match {
          // 1e-9 relative: double paths accumulate in different orders
          case d: Double => BigDecimal(d).round(new java.math.MathContext(9))
          case x => x
        }
      })
    val got = translated.get.drop("_updating_meta").collect().map(canon).toMap
    val want = spark.sql(q).collect().map(canon).toMap
    assert(got.keySet == want.keySet, s"group sets differ")
    want.foreach { case (k, w) =>
      assert(got(k) == w, s"group $k:\n  got  ${got(k)}\n  want $w")
    }
  }

  test("SQL pipeline e2e: debezium sink carries retractable envelope with sink names") {
    import graft.sql.{Ddl, Pipeline}
    val dir = java.nio.file.Files.createTempDirectory("graft-us").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/d.json"),
      "{\"k\": \"x\", \"v\": 1.5}\n{\"k\": \"x\", \"v\": 2.5}\n{\"k\": \"y\", \"v\": 4.0}\n".getBytes)
    val outDir = java.nio.file.Files.createTempDirectory("graft-us-out").toString
    val p = new Pipeline(spark, streaming = true)
    p.run(
      s"""CREATE TABLE src (k TEXT, v DOUBLE) WITH (connector='filesystem', path='$dir', format='json', type='source');
         |CREATE TABLE snk (kk TEXT, n BIGINT, total DOUBLE) WITH (connector='filesystem', path='$outDir/out', format='debezium_json', type='sink');
         |INSERT INTO snk SELECT k, count(*), sum(v) FROM src GROUP BY k""".stripMargin)
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val lines = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$outDir/out"))
      .iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
      .filterNot(f => f.getFileName.toString.startsWith(".") || f.toString.contains("_spark_metadata"))
      .flatMap(f => java.nio.file.Files.readAllLines(f).asScala)
      .map(_.trim).filter(_.nonEmpty).map(mapper.readTree).toSeq
    assert(lines.nonEmpty)
    val afters = lines.filter(l => l.get("op").asText() == "c").map(_.get("after"))
    // sink-declared names, not SELECT auto-names
    assert(afters.forall(a => a.has("kk") && a.has("n") && a.has("total")), s"got $lines")
    val byK = afters.map(a => a.get("kk").asText() -> (a.get("n").asLong(), a.get("total").asDouble())).toMap
    assert(byK("x") == ((2L, 4.0)) && byK("y") == ((1L, 4.0)), s"got $byK")
  }
}
