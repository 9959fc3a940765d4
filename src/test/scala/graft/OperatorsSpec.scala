package graft

import graft.functions.{Scalars, Udafs}
import graft.operators.{AsyncUdf, LookupJoin}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import java.util.concurrent.CompletableFuture

class OperatorsSpec extends SparkSpec {

  test("custom scalar functions: json extraction + multi_hash (Column + SQL surfaces)") {
    import spark.implicits._
    GraftSession.registerFunctions(spark)
    val df = Seq((1L, """{"k": 42, "s": "hi"}""")).toDF("id", "js")
    val r = df.select(
      Scalars.getFirstJsonObject(col("js"), "$.k").as("k"),
      Scalars.extractJson(col("js"), "$.s").as("arr"),
      Scalars.multiHash(col("js")).as("mh")).collect()(0)
    assert(r.getString(0) == "42")
    assert(r.getSeq[String](1) == Seq("hi"))
    assert(r.getString(2).length == 32)

    df.createOrReplaceTempView("js_t")
    val sqlR = spark.sql(
      "SELECT get_first_json_object(js, '$.k') AS k, multi_hash(js) AS mh FROM js_t").collect()(0)
    assert(sqlR.getString(0) == "42")
    // SQL and Column surfaces must compute the SAME hash (expression-builder
    // registration shares the xxhash64 pair)
    assert(sqlR.getString(1) == r.getString(2))
  }

  test("json functions: real parser semantics (nested paths, escapes, wildcards)") {
    import spark.implicits._
    GraftSession.registerFunctions(spark)
    val nested = """{"a": {"k": 1}, "k": "top", "q": "say \"hi\"", "xs": [{"v": 1}, {"v": 2}]}"""
    val df = Seq(Tuple1(nested)).toDF("js")
    df.createOrReplaceTempView("js_nested")
    val r = spark.sql(
      """SELECT get_first_json_object(js, '$.k') AS top_k,
        |       get_first_json_object(js, '$.a.k') AS nested_k,
        |       get_first_json_object(js, '$.q') AS escaped,
        |       extract_json(js, '$.xs[*].v') AS all_vs
        |FROM js_nested""".stripMargin).collect()(0)
    // '$.k' must match the TOP-LEVEL key, not the nested a.k (the old regex
    // parser got this wrong)
    assert(r.getString(0) == "top")
    assert(r.getString(1) == "1")
    assert(r.getString(2) == "say \"hi\"")
    assert(r.getSeq[String](3) == Seq("1", "2")) // ALL matches, not first
  }

  test("multi_hash: column-wise hashing prevents delimiter collisions") {
    import spark.implicits._
    GraftSession.registerFunctions(spark)
    val r = Seq(("a b", "c", "a", "b c")).toDF("w", "x", "y", "z")
      .selectExpr("multi_hash(w, x) AS h1", "multi_hash(y, z) AS h2").collect()(0)
    assert(r.getString(0) != r.getString(1))
  }

  test("UDAFs: my_median and max_product (reference udaf.sql)") {
    import spark.implicits._
    GraftSession.registerFunctions(spark)
    Seq((1.0, 2.0), (3.0, 4.0), (5.0, 1.0), (7.0, 2.0))
      .toDF("a", "b").createOrReplaceTempView("u_t")
    val r = spark.sql(
      "SELECT my_median(a) AS med, max_product(a, b) AS mp FROM u_t").collect()(0)
    assert(r.getDouble(0) == 4.0) // median of 1,3,5,7
    assert(r.getDouble(1) == 14.0) // 7*2
  }

  test("async UDF: ordered mode preserves input order, concurrency-bounded") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(2)
    val out = AsyncUdf.withAsyncColumn(df, "res", LongType,
      row => CompletableFuture.supplyAsync { () =>
        Thread.sleep(1) // simulate remote latency
        row.getLong(0) * 10
      },
      maxConcurrency = 8, ordered = true)
    val rows = out.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows.size == 100)
    rows.foreach { case (id, res) => assert(res == id * 10) }
  }

  test("async UDF: ordered mode genuinely overlaps calls (wall-time bound)") {
    import spark.implicits._
    // 32 rows × 100ms latency in ONE partition: serial = 3.2s; with
    // maxConcurrency=16 the sliding window should finish in ~2 × 100ms
    // (+ overhead). Assert well under the serial bound.
    val df = (1 to 32).map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1)
    val t0 = System.nanoTime()
    val out = AsyncUdf.withAsyncColumn(df, "res", LongType,
      row => CompletableFuture.supplyAsync { () =>
        Thread.sleep(100)
        row.getLong(0) * 10
      },
      maxConcurrency = 16, ordered = true)
    val rows = out.collect()
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    assert(rows.map(_.getLong(0)).toSeq == (1L to 32L)) // input order kept
    rows.foreach(r => assert(r.getLong(2) == r.getLong(0) * 10))
    assert(elapsedMs < 1600, s"expected overlapped execution, took ${elapsedMs}ms (serial would be 3200ms)")
  }

  test("async UDF: unordered mode emits in completion order, bounded in-flight") {
    import spark.implicits._
    import java.util.concurrent.atomic.AtomicInteger
    // Row 1 is slow; with completion-order emission it must NOT block the
    // fast rows behind it. Also track peak in-flight ≤ maxConcurrency.
    val peak = new AtomicInteger(0)
    val cur = new AtomicInteger(0)
    val df = (1 to 20).map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1)
    val out = AsyncUdf.withAsyncColumn(df, "res", LongType,
      row => CompletableFuture.supplyAsync { () =>
        val c = cur.incrementAndGet()
        peak.updateAndGet(p => math.max(p, c))
        try {
          if (row.getLong(0) == 1L) Thread.sleep(800) else Thread.sleep(10)
          row.getLong(0) * 10
        } finally cur.decrementAndGet()
      },
      maxConcurrency = 4, ordered = false)
    val ids = out.collect().map(_.getLong(0)).toSeq
    assert(ids.toSet == (1L to 20L).toSet)
    assert(ids.last == 1L, s"slow row should surface last in completion order, got $ids")
    assert(peak.get() <= 4, s"in-flight exceeded maxConcurrency: ${peak.get()}")
  }

  test("async UDF: timeout yields null instead of failing the job") {
    import spark.implicits._
    val df = Seq((1L, "slow"), (2L, "fast")).toDF("id", "v")
    val out = AsyncUdf.withAsyncColumn(df, "res", StringType,
      row => CompletableFuture.supplyAsync { () =>
        if (row.getString(1) == "slow") Thread.sleep(5000)
        row.getString(1).toUpperCase
      },
      maxConcurrency = 4, ordered = true, timeoutMs = 500)
    val rows = out.collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(rows(1L).isEmpty)        // timed out → null
    assert(rows(2L).contains("FAST"))
  }

  test("lookup join: static broadcast (inner/left) and restriction check") {
    val events = Tables.load(spark, sfDir, "events")
    val nation = Tables.load(spark, sfDir, "nation")
    val enriched = LookupJoin.static_(
      events.withColumn("n_nationkey", pmod(col("user_id"), lit(25)).cast("int")),
      nation, Seq("n_nationkey"), "left")
    assert(enriched.count() == events.count()) // left join keeps all rows
    intercept[IllegalArgumentException] {
      LookupJoin.static_(events, nation, Seq("n_nationkey"), "full_outer")
    }
  }

  test("lookup join: per-partition cached fetch against a remote-store stub") {
    import spark.implicits._
    val fetchCount = spark.sparkContext.longAccumulator("fetches")
    val df = (1 to 1000).map(i => (i.toLong, i % 10)).toDF("id", "k").repartition(2)
    val outSchema = StructType(df.schema.fields :+ StructField("name", StringType))
    val out = LookupJoin.perPartition[Int, String](
      df,
      keyOf = r => r.getInt(1),
      fetch = keys => { fetchCount.add(keys.size); keys.map(k => k -> s"name-$k").toMap },
      outSchema = outSchema,
      project = (r, v) => org.apache.spark.sql.Row.fromSeq(r.toSeq :+ v.orNull))
    val rows = out.collect()
    assert(rows.length == 1000)
    assert(rows.forall(r => r.getString(2) == s"name-${r.getInt(1)}"))
    // cache effectiveness: 10 distinct keys × ≤2 partitions ≪ 1000 rows
    assert(fetchCount.value <= 20, s"fetched ${fetchCount.value} keys")
  }

  test("bucketed tables join without a shuffle exchange") {
    import graft.operators.Bucketing
    val orders = Tables.load(spark, sfDir, "orders")
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "lineitem_b", "l_orderkey", 8)
    // force SMJ so the bucketing (not a broadcast) eliminates the exchange
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "lineitem_b",
        "o_orderkey", "l_orderkey")
      assert(!Bucketing.hasShuffle(joined), "bucketed join should be exchange-free")
      assert(joined.count() == lineitem.count())
      // the same join on raw (unbucketed) frames does shuffle
      val raw = orders.join(lineitem, orders("o_orderkey") === lineitem("l_orderkey"))
      assert(Bucketing.hasShuffle(raw))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("streaming exact dedup keeps first occurrence within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val dedup = graft.operators.Dedup.streamingExact(
      input.toDF().toDF("ts", "id", "v"), "ts", "10 minutes", "id")
    val q = dedup.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    input.addData(
      (ts("2024-01-01 10:00:00"), 1L, "first"),
      (ts("2024-01-01 10:01:00"), 1L, "dup"),
      (ts("2024-01-01 10:02:00"), 2L, "only"))
    q.processAllAvailable()
    input.addData((ts("2024-01-01 10:03:00"), 1L, "dup2"))
    q.processAllAvailable()
    val got = spark.table("sdedup")
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(got == Map(1L -> "first", 2L -> "only"), s"got $got")
    q.stop()
  }

  test("salted skew join equals plain join, spreads hot keys over salts") {
    import spark.implicits._
    // one pathological hot key (90% of rows) + tail
    val large = ((1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i => ((i % 7 + 2).toLong, i)))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c")).toDF("sk", "name")
    val plain = large.join(small, col("k") === col("sk")).drop("sk")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val salted = graft.operators.SkewJoin.saltedEquiJoin(large, small, "k", "sk", salts = 8)
      .drop("sk")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain)
    // left join keeps unmatched rows exactly once
    val lplain = large.join(small, col("k") === col("sk"), "left").drop("sk").count()
    val lsalted = graft.operators.SkewJoin.saltedEquiJoin(large, small, "k", "sk", 8, "left").count()
    assert(lplain == lsalted && lsalted == 1000)
  }

  test("streaming checkpoint restore: stop mid-stream, restart, identical final result") {
    import org.apache.spark.sql.streaming.Trigger
    val src = java.nio.file.Files.createTempDirectory("cp-src").toString
    val cp = java.nio.file.Files.createTempDirectory("cp-chk").toString
    val events = Tables.load(spark, sfDir, "events")
    // split at a TIME boundary (a paused stream, not interleaved ids) so
    // run-1's closed windows carry complete counts
    val mid = lit("2024-01-15").cast("timestamp")
    events.filter(col("ts") < mid).write.parquet(s"$src/p=a")
    val agg = () => graft.operators.TimeWindows.tumbleAgg(
      spark.readStream.schema(events.schema).option("maxFilesPerTrigger", "1").parquet(src)
        .withWatermark("ts", "1 second"),
      "ts", "1 hour", Seq(col("event_type")), Seq(count(lit(1)).as("n")))

    val outDir = java.nio.file.Files.createTempDirectory("cp-out").toString

    // run 1: consume what's there, then stop (simulates failure/stop);
    // file sink = recoverable + exactly-once
    val q1 = agg().writeStream.format("parquet").outputMode("append")
      .option("path", outDir)
      .option("checkpointLocation", cp).trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(120000)

    // more data arrives while "down"
    events.filter(col("ts") >= mid).write.mode("append").parquet(s"$src/p=b")

    // run 2: restart from the same checkpoint into the same sink
    val q2 = agg().writeStream.format("parquet").outputMode("append")
      .option("path", outDir)
      .option("checkpointLocation", cp).trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)

    // sink contents = exactly the windows closed across both runs; every
    // emitted row must agree with a batch aggregate over the full data
    // (no dup, no loss: batch-1 state survives the restart)
    val restored = spark.read.parquet(outDir)
      .select("window_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val full = graft.operators.TimeWindows.tumbleAgg(events, "ts", "1 hour",
        Seq(col("event_type")), Seq(count(lit(1)).as("n")))
      .select("window_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(restored.nonEmpty)
    restored.foreach { case (k, n) =>
      assert(full.get(k).contains(n), s"window $k: restored $n vs batch ${full.get(k)}")
    }
  }
}
