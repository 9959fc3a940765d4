package graft

import graft.sql.Pipeline
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Golden end-to-end corpus: the reference's own smoke-test pipelines
  * (crates/arroyo-sql-testing/src/test/queries/<name>.sql) run through our SQL
  * front-end against the reference's input fixtures, diffed against its
  * committed golden outputs (crates/arroyo-sql-testing/golden_outputs/),
  * with the same debezium merge-by-PK semantics as smoke_tests.rs:560-700.
  *
  * Batch mode must match EXACTLY. Streaming (AvailableNow) runs the same
  * scripts and ALSO matches exactly: the pipeline overlays an end-of-input
  * sentinel on every bounded json file source (Pipeline.eodField), which
  * advances the watermark past every open window when input ends — the
  * Spark analogue of the reference's EndOfData
  * (crates/arroyo-types/src/lib.rs:188-193), so append-mode windowed
  * pipelines flush their final windows instead of leaving them open.
  */
class GoldenSpec extends SparkSpec {

  private val refDir = "/root/reference/crates/arroyo-sql-testing"
  private val mapper = new ObjectMapper()

  private def tmp(): String = Files.createTempDirectory("graft-golden").toString

  // ── canonicalization ──────────────────────────────────────────────────

  private val TsRe =
    """^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})(\.\d+)?(Z|[+-]\d{2}:?\d{2})?$""".r

  private def normTs(s: String): String = s match {
    case TsRe(base, frac, _) =>
      val f = Option(frac).map(_.replaceAll("0+$", "")).filter(_.length > 1).getOrElse("")
      base + f
    case _ => s
  }

  /** Canonical number text: engines disagree on integer-vs-float JSON
    * rendering for the same value (DataFusion writes `regr_count` as
    * 1781.0 and large doubles in scientific notation; Spark writes long
    * aggregates as 1781) — normalize through BigDecimal.
    */
  /** When non-zero, numbers compare at this many significant digits.
    * Used ONLY by every_aggregate: regr_sxx/regr_sxy accumulate thousands
    * of f64 operations whose result depends on summation order — DataFusion
    * (sequential) and Spark (32-partition merge) agree to ~10 significant
    * digits and diverge beyond, which is floating-point reality, not a
    * semantic difference. Every other golden compares exactly.
    */
  private var numSigDigits: Int = 0

  private def canonNum(n: JsonNode): String = {
    var bd = n.decimalValue()
    if (numSigDigits > 0)
      bd = bd.round(new java.math.MathContext(numSigDigits))
    if (bd.compareTo(java.math.BigDecimal.ZERO) == 0) "0"
    else bd.stripTrailingZeros.toPlainString
  }

  /** Canonical JSON: sorted keys, null fields dropped (json writers differ
    * on null-vs-absent), timestamps normalized (zone + trailing zeros),
    * numbers normalized (int/float/scientific renderings unified).
    */
  private def canon(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val out = mapper.createObjectNode()
      o.properties().asScala.toSeq.sortBy(_.getKey).foreach { e =>
        if (!e.getValue.isNull) out.set[JsonNode](e.getKey, canon(e.getValue))
      }
      out
    case a: ArrayNode =>
      val out = mapper.createArrayNode()
      a.asScala.foreach(x => out.add(canon(x)))
      out
    case t: TextNode => new TextNode(normTs(t.asText()))
    case num if num.isNumber => new TextNode(canonNum(num))
    case other => other
  }

  private def multiset(lines: Seq[JsonNode]): Map[String, Int] =
    lines.map(canon(_).toString).groupBy(identity).view.mapValues(_.size).toMap

  // ── debezium merge (smoke_tests.rs merge_debezium) ────────────────────

  private def mergeDebezium(lines: Seq[JsonNode], pks: Option[Seq[String]]): Set[String] = {
    val state = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def key(v: JsonNode): String = pks match {
      case Some(ks) => ks.map(k => Option(v.get(k)).map(_.toString).getOrElse("null")).mkString("|")
      case None => canon(v).toString
    }
    lines.foreach { l =>
      val op = l.get("op").asText()
      val before = Option(l.get("before")).filterNot(_.isNull)
      val after = Option(l.get("after")).filterNot(_.isNull)
      op match {
        case "c" => after.foreach(a => state(key(a)) = canon(a).toString)
        case "u" =>
          before.foreach(b => state.remove(key(b)))
          after.foreach(a => state(key(a)) = canon(a).toString)
        case "d" => before.foreach(b => state.remove(key(b)))
        case other => fail(s"unknown debezium op $other")
      }
    }
    state.values.toSet
  }

  // ── runner ────────────────────────────────────────────────────────────

  private def readJsonLines(p: Path): Seq[JsonNode] = {
    if (!Files.exists(p)) return Seq.empty
    val files =
      if (Files.isRegularFile(p)) Seq(p)
      else Files.walk(p).iterator().asScala
        .filter(Files.isRegularFile(_))
        .filter { f =>
          val n = f.getFileName.toString
          !f.toString.contains("_spark_metadata") &&
            !n.startsWith(".") && !n.startsWith("_") && !n.endsWith(".crc")
        }.toSeq
    files.flatMap(f => Files.readAllLines(f).asScala)
      .map(_.trim).filter(_.nonEmpty).map(mapper.readTree)
  }

  private def registerTestUdfs(): Unit = {
    GraftSession.registerFunctions(spark)
    // the reference's none_udf: an aggregate that always returns NULL
    // (udaf.sql exercises Option-returning UDAFs)
    val noneAgg: Aggregator[Long, Long, java.lang.Double] =
      new Aggregator[Long, Long, java.lang.Double] {
        def zero: Long = 0L
        def reduce(b: Long, a: Long): Long = b
        def merge(a: Long, b: Long): Long = a
        def finish(b: Long): java.lang.Double = null
        def bufferEncoder: Encoder[Long] = Encoders.scalaLong
        def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
      }
    spark.udf.register("none_udf", org.apache.spark.sql.functions.udaf(noneAgg))
    // the reference harness's scalar udf (udfs.rs double_negative): -2x.
    // async_double_negative computes the same value; the async machinery is
    // covered by OperatorsSpec/q_async_udf, so the SQL name maps to the
    // same scalar here.
    spark.udf.register("double_negative", (x: Long) => -2L * x)
    spark.udf.register("async_double_negative", (x: Long) => -2L * x)
  }

  /** Run queries/<name>.sql with fixture substitution; returns (output
    * lines, golden lines, primary keys from the --pk header).
    */
  private def runGolden(name: String, streaming: Boolean): (Seq[JsonNode], Seq[JsonNode], Option[Seq[String]]) = {
    val raw = new String(Files.readAllBytes(Paths.get(s"$refDir/src/test/queries/$name.sql")))
    val pks = """--pk=(\S+)""".r.findFirstMatchIn(raw).map(_.group(1).split(",").toSeq)
    val outPath = s"${tmp()}/out"
    val script = raw
      .replace("$input_dir", s"$refDir/inputs")
      .replace("$output_path", outPath)
    registerTestUdfs()
    new Pipeline(spark, streaming).run(script)
    val out = readJsonLines(Paths.get(outPath))
    val golden = readJsonLines(Paths.get(s"$refDir/golden_outputs/$name.json"))
    (out, golden, pks)
  }

  private def checkExact(name: String, streaming: Boolean = false): Unit = {
    val (out, golden, pks) = runGolden(name, streaming)
    assert(golden.nonEmpty, s"golden output missing for $name")
    assert(out.nonEmpty, s"$name produced no output")
    if (golden.head.has("op")) {
      assert(mergeDebezium(out, pks) == mergeDebezium(golden, pks),
        s"$name: merged debezium state differs\nout:    ${mergeDebezium(out, pks)}\ngolden: ${mergeDebezium(golden, pks)}")
    } else {
      val (o, g) = (multiset(out), multiset(golden))
      val extra = o.keySet.diff(g.keySet).take(3)
      val missing = g.keySet.diff(o.keySet).take(3)
      assert(o == g, s"$name mismatch: extra=$extra missing=$missing " +
        s"(out ${out.size} rows, golden ${golden.size} rows)")
    }
  }

  // ── batch: exact golden match ─────────────────────────────────────────

  test("golden batch: select_star") { checkExact("select_star") }
  test("golden batch: union") { checkExact("union") }
  test("golden batch: hourly_by_event_type (tumble)") { checkExact("hourly_by_event_type") }
  test("golden batch: month_loose_watermark (30-day tumble)") { checkExact("month_loose_watermark") }
  test("golden batch: session_window") { checkExact("session_window") }
  test("golden batch: sliding_window_end (hop)") { checkExact("sliding_window_end") }
  test("golden batch: most_active_driver_last_hour (hop + row_number)") {
    checkExact("most_active_driver_last_hour")
  }
  test("golden batch: windowed_inner_join") { checkExact("windowed_inner_join") }
  test("golden batch: aggregates (debezium sink)") { checkExact("aggregates") }
  test("golden batch: grouped_aggregates (debezium merge by pk)") { checkExact("grouped_aggregates") }
  test("golden batch: udaf (my_median / none_udf / max_product)") { checkExact("udaf") }

  test("golden batch: select_star via memory table") { checkExact("memory_table") }
  test("golden batch: test_merge_sink (two INSERTs, one sink)") { checkExact("test_merge_sink") }
  test("golden batch: cast_to_sink_type (sink DDL casts the SELECT)") {
    checkExact("cast_to_sink_type")
  }
  test("golden batch: double_negative_udf") { checkExact("double_negative_udf") }
  test("golden batch: async_udf") { checkExact("async_udf") }
  test("golden batch: json_operators (unstructured source, -> access)") {
    checkExact("json_operators")
  }
  test("golden batch: tight_watermark (tumble through a view)") { checkExact("tight_watermark") }
  test("golden batch: global_session_window") { checkExact("global_session_window") }
  test("golden batch: unnest_in_view (array_agg + unnest)") { checkExact("unnest_in_view") }
  test("golden batch: offset_impulse_join (two tumbled aggregates joined)") {
    checkExact("offset_impulse_join")
  }
  test("golden batch: windowed_outer_join (full outer on window.start)") {
    checkExact("windowed_outer_join")
  }
  test("golden batch: nexmark_q5 shape (hop + per-window max join)") {
    // the reference repo ships no nexmark_bids.json fixture (the committed
    // golden can't be reproduced from its inputs dir) — generate a bids
    // fixture, run the reference's own nexmark_q5.sql through the pipeline,
    // and verify against an independently-computed expected result
    import org.apache.spark.sql.functions.{col, window, max, count}
    val dir = tmp()
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val lines = (0 until 2000).map { i =>
      val ts = base.plusMillis(i * 37L)
      s"""{"datetime":"$ts","auction":${(i * 7919) % 13}}"""
    }
    Files.write(Paths.get(s"$dir/nexmark_bids.json"), lines.asJava)
    val raw = new String(Files.readAllBytes(
      Paths.get(s"$refDir/src/test/queries/nexmark_q5.sql")))
    val outPath = s"${tmp()}/out"
    registerTestUdfs()
    new Pipeline(spark, streaming = false)
      .run(raw.replace("$input_dir", dir).replace("$output_path", outPath))
    val out = readJsonLines(Paths.get(outPath))
      .map(n => (n.get("auction").asLong, n.get("count").asLong))
      .groupBy(identity).view.mapValues(_.size).toMap
    val bids = spark.read
      .schema("datetime TIMESTAMP, auction BIGINT").json(s"$dir/nexmark_bids.json")
    val ab = bids.groupBy(window(col("datetime"), "10 seconds", "2 seconds").as("w"),
      col("auction")).agg(count("*").as("num"))
    val mx = ab.groupBy("w").agg(max("num").as("maxn"))
    val expected = ab.join(mx, "w").filter(col("num") >= col("maxn"))
      .select("auction", "num").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(out.nonEmpty && out == expected)
  }
  test("golden batch: reinvoke_window_function (re-windowed aggregate)") {
    checkExact("reinvoke_window_function")
  }
  test("golden streaming: nexmark_q5 shape matches batch exactly") {
    // same generated fixture as the batch test; with the end-of-input
    // flush the streaming run must emit the COMPLETE batch-computed
    // multiset, final windows included
    import org.apache.spark.sql.functions.{col, window, max, count}
    val dir = tmp()
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val lines = (0 until 2000).map { i =>
      val ts = base.plusMillis(i * 37L)
      s"""{"datetime":"$ts","auction":${(i * 7919) % 13}}"""
    }
    Files.write(Paths.get(s"$dir/nexmark_bids.json"), lines.asJava)
    val raw = new String(Files.readAllBytes(
      Paths.get(s"$refDir/src/test/queries/nexmark_q5.sql")))
    val outPath = s"${tmp()}/out"
    registerTestUdfs()
    new Pipeline(spark, streaming = true)
      .run(raw.replace("$input_dir", dir).replace("$output_path", outPath))
    val out = readJsonLines(Paths.get(outPath))
      .map(n => (n.get("auction").asLong, n.get("count").asLong))
      .groupBy(identity).view.mapValues(_.size).toMap
    val bids = spark.read
      .schema("datetime TIMESTAMP, auction BIGINT").json(s"$dir/nexmark_bids.json")
    val ab = bids.groupBy(window(col("datetime"), "10 seconds", "2 seconds").as("w"),
      col("auction")).agg(count("*").as("num"))
    val mx = ab.groupBy("w").agg(max("num").as("maxn"))
    val expected = ab.join(mx, "w").filter(col("num") >= col("maxn"))
      .select("auction", "num").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(out.nonEmpty, "streaming nexmark_q5 emitted nothing")
    assert(out == expected, s"streaming differs from batch: " +
      s"extra=${out.toSet.diff(expected.toSet).take(3)} " +
      s"missing=${expected.toSet.diff(out.toSet).take(3)}")
  }
  test("golden streaming: nexmark_q5 over the nexmark CONNECTOR matches batch") {
    // the reference's flagship workload on its own generator source: the
    // schemaless nexmark connector (full {person, auction, bid} events,
    // native EndOfData sentinel) streamed through the q5 shape must emit
    // exactly what the batch run of the same script computes, final
    // windows included — and both must match an independently-computed
    // DataFrame expectation over the same deterministic event stream
    import org.apache.spark.sql.functions.{col, window, max, count}
    val script = (outPath: String) => s"""
      |CREATE TABLE nexmark WITH (
      |  connector = 'nexmark',
      |  event_rate = '1000',
      |  message_count = '20000'
      |);
      |CREATE TABLE top_auctions (
      |  auction BIGINT,
      |  count INT
      |) WITH (
      |  connector = 'single_file',
      |  path = '$outPath',
      |  format = 'json',
      |  type = 'sink'
      |);
      |INSERT INTO top_auctions
      |SELECT AuctionBids.auction, AuctionBids.num
      | FROM (
      |   SELECT bid.auction AS auction, count(*) AS num,
      |     hop(interval '2 second', interval '10 seconds') as window
      |   FROM nexmark WHERE bid IS NOT NULL
      |   GROUP BY bid.auction, window
      | ) AS AuctionBids
      | JOIN (
      |   SELECT max(CountBids.num) AS maxn, CountBids.window
      |   FROM (
      |     SELECT count(*) AS num,
      |       hop(interval '2 second', interval '10 seconds') as window
      |     FROM nexmark WHERE bid IS NOT NULL
      |     GROUP BY bid.auction, window
      |   ) AS CountBids
      |   GROUP BY CountBids.window
      | ) AS MaxBids
      | ON AuctionBids.window = MaxBids.window AND AuctionBids.num >= MaxBids.maxn
      |""".stripMargin
    def runAndRead(streaming: Boolean): Map[(Long, Long), Int] = {
      val outPath = s"${tmp()}/out"
      new Pipeline(spark, streaming = streaming).run(script(outPath))
      readJsonLines(Paths.get(outPath))
        .map(n => (n.get("auction").asLong, n.get("count").asLong))
        .groupBy(identity).view.mapValues(_.size).toMap
    }
    val batch = runAndRead(streaming = false)
    val stream = runAndRead(streaming = true)
    val bids = spark.read.format("graft-nexmark")
      .option("message_count", "20000").option("event_rate", "1000").load()
      .filter(col("bid").isNotNull)
      .select(col("bid.auction").as("auction"), col("bid.datetime").as("datetime"))
    val ab = bids.groupBy(window(col("datetime"), "10 seconds", "2 seconds").as("w"),
      col("auction")).agg(count("*").as("num"))
    val mx = ab.groupBy("w").agg(max("num").as("maxn"))
    val expected = ab.join(mx, "w").filter(col("num") >= col("maxn"))
      .select("auction", "num").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(batch.nonEmpty, "batch q5 over the connector emitted nothing")
    assert(batch == expected, s"batch differs from DataFrame expectation: " +
      s"extra=${batch.toSet.diff(expected.toSet).take(3)} " +
      s"missing=${expected.toSet.diff(batch.toSet).take(3)}")
    assert(stream == batch, s"streaming differs from batch: " +
      s"extra=${stream.toSet.diff(batch.toSet).take(3)} " +
      s"missing=${batch.toSet.diff(stream.toSet).take(3)}")
  }

  test("golden streaming: nexmark_q8 shape (persons × sellers per tumble) matches batch") {
    // nexmark q8: persons who opened auctions in the same 10s tumble —
    // a JOIN of two tumbling aggregates over DIFFERENT branches of the
    // same generator stream (person × auction), exercising the spool
    // machinery across heterogeneous legs
    import org.apache.spark.sql.functions.{col, window}
    val script = (outPath: String) => s"""
      |CREATE TABLE nexmark WITH (
      |  connector = 'nexmark',
      |  event_rate = '1000',
      |  message_count = '20000'
      |);
      |CREATE TABLE joined (
      |  id BIGINT
      |) WITH (
      |  connector = 'single_file',
      |  path = '$outPath',
      |  format = 'json',
      |  type = 'sink'
      |);
      |INSERT INTO joined
      |SELECT P.id
      | FROM (
      |   SELECT person.id AS id, tumble(interval '10 seconds') AS window
      |   FROM nexmark WHERE person IS NOT NULL
      |   GROUP BY person.id, window
      | ) AS P
      | JOIN (
      |   SELECT auction.seller AS seller, tumble(interval '10 seconds') AS window
      |   FROM nexmark WHERE auction IS NOT NULL
      |   GROUP BY auction.seller, window
      | ) AS A
      | ON P.id = A.seller AND P.window = A.window
      |""".stripMargin
    def runAndRead(streaming: Boolean): Map[Long, Int] = {
      val outPath = s"${tmp()}/out"
      new Pipeline(spark, streaming = streaming).run(script(outPath))
      readJsonLines(Paths.get(outPath)).map(_.get("id").asLong)
        .groupBy(identity).view.mapValues(_.size).toMap
    }
    val batch = runAndRead(streaming = false)
    val stream = runAndRead(streaming = true)
    val ev = spark.read.format("graft-nexmark")
      .option("message_count", "20000").option("event_rate", "1000").load()
    val p = ev.filter(col("person").isNotNull)
      .groupBy(window(col("person.datetime"), "10 seconds").as("w"),
        col("person.id").as("id")).count().select("id", "w")
    val a = ev.filter(col("auction").isNotNull)
      .groupBy(window(col("auction.datetime"), "10 seconds").as("w"),
        col("auction.seller").as("seller")).count().select("seller", "w")
    val expected = p.join(a, p("id") === a("seller") && p("w") === a("w"))
      .select("id").collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(batch.nonEmpty && batch == expected,
      s"batch vs expectation: extra=${batch.toSet.diff(expected.toSet).take(3)} " +
        s"missing=${expected.toSet.diff(batch.toSet).take(3)}")
    assert(stream == batch, s"stream vs batch: " +
      s"extra=${stream.toSet.diff(batch.toSet).take(3)} " +
      s"missing=${batch.toSet.diff(stream.toSet).take(3)}")
  }

  test("golden streaming: nexmark_q7 shape (raw stream × windowed max) matches batch") {
    // nexmark q7: the highest-priced bid of every 10s tumble — a RAW
    // stream joined to a windowed aggregate with window-containment band
    // conditions (a different shape from q5/q8's agg×agg joins: one leg
    // is unaggregated)
    import org.apache.spark.sql.functions.{col, max, window}
    val script = (outPath: String) => s"""
      |CREATE TABLE nexmark WITH (
      |  connector = 'nexmark',
      |  event_rate = '1000',
      |  message_count = '20000'
      |);
      |CREATE TABLE top_bids (
      |  auction BIGINT,
      |  price BIGINT
      |) WITH (
      |  connector = 'single_file',
      |  path = '$outPath',
      |  format = 'json',
      |  type = 'sink'
      |);
      |INSERT INTO top_bids
      |SELECT B.auction, B.price
      | FROM (SELECT bid.auction AS auction, bid.price AS price,
      |              timestamp AS datetime
      |       FROM nexmark WHERE bid IS NOT NULL) AS B
      | JOIN (
      |   SELECT max(bid.price) AS maxprice,
      |          tumble(interval '10 seconds') AS window
      |   FROM nexmark WHERE bid IS NOT NULL
      |   GROUP BY window
      | ) AS M
      | ON B.price = M.maxprice
      |  AND B.datetime >= M.window.start AND B.datetime < M.window.end
      |""".stripMargin
    def runAndRead(streaming: Boolean): Map[(Long, Long), Int] = {
      val outPath = s"${tmp()}/out"
      new Pipeline(spark, streaming = streaming).run(script(outPath))
      readJsonLines(Paths.get(outPath))
        .map(n => (n.get("auction").asLong, n.get("price").asLong))
        .groupBy(identity).view.mapValues(_.size).toMap
    }
    val batch = runAndRead(streaming = false)
    val stream = runAndRead(streaming = true)
    val bids = spark.read.format("graft-nexmark")
      .option("message_count", "20000").option("event_rate", "1000").load()
      .filter(col("bid").isNotNull)
      .select(col("bid.auction").as("auction"), col("bid.price").as("price"),
        col("bid.datetime").as("datetime"))
    val mx = bids.groupBy(window(col("datetime"), "10 seconds").as("w"))
      .agg(max("price").as("maxprice"))
    val expected = bids.join(mx,
        bids("price") === mx("maxprice") &&
          bids("datetime") >= mx("w.start") && bids("datetime") < mx("w.end"))
      .select("auction", "price").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(batch.nonEmpty && batch == expected,
      s"batch vs expectation: extra=${batch.toSet.diff(expected.toSet).take(3)} " +
        s"missing=${expected.toSet.diff(batch.toSet).take(3)}")
    assert(stream == batch, s"stream vs batch: " +
      s"extra=${stream.toSet.diff(batch.toSet).take(3)} " +
      s"missing=${batch.toSet.diff(stream.toSet).take(3)}")
  }

  test("golden streaming: nexmark q1/q2 shapes (stateless map + filter) match batch") {
    import org.apache.spark.sql.functions.col
    // q1 currency conversion (projection), q2 auction filter — the
    // stateless end of the nexmark family over the generator connector
    val script = (outPath: String) => s"""
      |CREATE TABLE nexmark WITH (
      |  connector = 'nexmark',
      |  event_rate = '1000',
      |  message_count = '20000'
      |);
      |CREATE TABLE converted (
      |  auction BIGINT,
      |  bidder BIGINT,
      |  price_eur DOUBLE
      |) WITH (
      |  connector = 'single_file',
      |  path = '$outPath',
      |  format = 'json',
      |  type = 'sink'
      |);
      |INSERT INTO converted
      |SELECT bid.auction, bid.bidder,
      |       CAST(0.908 AS DOUBLE) * bid.price AS price_eur
      | FROM nexmark WHERE bid IS NOT NULL AND bid.auction % 7 = 0
      |""".stripMargin
    def runAndRead(streaming: Boolean): Map[(Long, Long, Double), Int] = {
      val outPath = s"${tmp()}/out"
      new Pipeline(spark, streaming = streaming).run(script(outPath))
      readJsonLines(Paths.get(outPath))
        .map(n => (n.get("auction").asLong, n.get("bidder").asLong,
          n.get("price_eur").asDouble))
        .groupBy(identity).view.mapValues(_.size).toMap
    }
    val batch = runAndRead(streaming = false)
    val stream = runAndRead(streaming = true)
    val expected = spark.read.format("graft-nexmark")
      .option("message_count", "20000").option("event_rate", "1000").load()
      .filter(col("bid").isNotNull && col("bid.auction") % 7 === 0)
      .select(col("bid.auction"), col("bid.bidder"),
        (col("bid.price") * 0.908).as("price_eur"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(batch.nonEmpty && batch == expected)
    assert(stream == batch, s"stream vs batch: " +
      s"extra=${stream.toSet.diff(batch.toSet).take(3)} " +
      s"missing=${batch.toSet.diff(stream.toSet).take(3)}")
  }

  test("golden streaming: nexmark_q3 shape (person × auction branch join) matches batch") {
    import org.apache.spark.sql.functions.col
    // q3: sellers in selected states with auctions in one category — an
    // INNER join of two RAW event branches (no windows, no aggregates):
    // Spark's stream-stream inner join in append mode
    val script = (outPath: String) => s"""
      |CREATE TABLE nexmark WITH (
      |  connector = 'nexmark',
      |  event_rate = '1000',
      |  message_count = '20000'
      |);
      |CREATE TABLE sellers (
      |  name VARCHAR,
      |  city VARCHAR,
      |  auction_id BIGINT
      |) WITH (
      |  connector = 'single_file',
      |  path = '$outPath',
      |  format = 'json',
      |  type = 'sink'
      |);
      |INSERT INTO sellers
      |SELECT P.name, P.city, A.id AS auction_id
      | FROM (SELECT auction.id AS id, auction.seller AS seller
      |       FROM nexmark WHERE auction IS NOT NULL AND auction.category = 3) AS A
      | JOIN (SELECT person.id AS id, person.name AS name, person.city AS city
      |       FROM nexmark WHERE person IS NOT NULL
      |         AND person.state IN ('state-1', 'state-5', 'state-7')) AS P
      | ON A.seller = P.id
      |""".stripMargin
    def runAndRead(streaming: Boolean): Map[(String, String, Long), Int] = {
      val outPath = s"${tmp()}/out"
      new Pipeline(spark, streaming = streaming).run(script(outPath))
      readJsonLines(Paths.get(outPath))
        .map(n => (n.get("name").asText, n.get("city").asText,
          n.get("auction_id").asLong))
        .groupBy(identity).view.mapValues(_.size).toMap
    }
    val batch = runAndRead(streaming = false)
    val stream = runAndRead(streaming = true)
    val ev = spark.read.format("graft-nexmark")
      .option("message_count", "20000").option("event_rate", "1000").load()
    val a = ev.filter(col("auction").isNotNull && col("auction.category") === 3)
      .select(col("auction.id").as("aid"), col("auction.seller").as("seller"))
    val p = ev.filter(col("person").isNotNull &&
        col("person.state").isin("state-1", "state-5", "state-7"))
      .select(col("person.id").as("pid"), col("person.name"), col("person.city"))
    val expected = a.join(p, a("seller") === p("pid"))
      .select("name", "city", "aid").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(batch.nonEmpty && batch == expected,
      s"batch vs expectation: extra=${batch.toSet.diff(expected.toSet).take(3)} " +
        s"missing=${expected.toSet.diff(batch.toSet).take(3)}")
    assert(stream == batch, s"stream vs batch: " +
      s"extra=${stream.toSet.diff(batch.toSet).take(3)} " +
      s"missing=${batch.toSet.diff(stream.toSet).take(3)}")
  }

  test("golden: nexmark_q4 shape (winning bid per auction → avg per category), batch AND streaming") {
    // q4: average CLOSING price per category — an interval join (bids
    // within [auction.datetime, auction.expires]) under a per-auction max
    // under a per-category average. The unwindowed nested aggregate is an
    // UPDATING query (reference parity: the planner rejects it into a
    // plain json sink — asserted below), so the legal streaming face is a
    // debezium_json sink whose retract+append envelope, replayed to final
    // state, must converge to the batch result exactly.
    import org.apache.spark.sql.functions.{avg, col, max}
    def script(outPath: String, fmt: String) = s"""
      |CREATE TABLE nexmark WITH (
      |  connector = 'nexmark',
      |  event_rate = '1000',
      |  message_count = '20000'
      |);
      |CREATE TABLE category_price (
      |  category BIGINT,
      |  avg_final DOUBLE
      |) WITH (
      |  connector = 'single_file',
      |  path = '$outPath',
      |  format = '$fmt',
      |  type = 'sink'
      |);
      |INSERT INTO category_price
      |SELECT Q.category, AVG(Q.final) AS avg_final
      | FROM (
      |   SELECT MAX(B.price) AS final, A.category AS category
      |   FROM (SELECT auction.id AS id, auction.category AS category,
      |                auction.datetime AS dt, auction.expires AS expires
      |         FROM nexmark WHERE auction IS NOT NULL) AS A
      |   JOIN (SELECT bid.auction AS auction, bid.price AS price,
      |                bid.datetime AS dt
      |         FROM nexmark WHERE bid IS NOT NULL) AS B
      |   ON A.id = B.auction AND B.dt >= A.dt AND B.dt <= A.expires
      |   GROUP BY A.id, A.category
      | ) AS Q
      | GROUP BY Q.category
      |""".stripMargin
    val batchOut = s"${tmp()}/out"
    new Pipeline(spark, streaming = false).run(script(batchOut, "json"))
    val got = readJsonLines(Paths.get(batchOut))
      .map(n => n.get("category").asLong -> n.get("avg_final").asDouble).toMap
    // reference parity: the updating query must NOT insert into a plain
    // json sink in streaming mode (no_inserting_updates_into_non_updating)
    val err = intercept[IllegalArgumentException] {
      new Pipeline(spark, streaming = true).run(script(s"${tmp()}/rejected", "json"))
    }
    assert(err.getMessage.contains("non-updating sink"), err.getMessage)
    // the legal streaming face: debezium envelope, replayed to final state
    val streamOut = s"${tmp()}/out"
    new Pipeline(spark, streaming = true).run(script(streamOut, "debezium_json"))
    val state = scala.collection.mutable.LinkedHashMap.empty[Long, Double]
    readJsonLines(Paths.get(streamOut)).foreach { l =>
      val before = Option(l.get("before")).filterNot(_.isNull)
      val after = Option(l.get("after")).filterNot(_.isNull)
      l.get("op").asText() match {
        case "c" => after.foreach(a => state(a.get("category").asLong) = a.get("avg_final").asDouble)
        case "u" =>
          before.foreach(b => state.remove(b.get("category").asLong))
          after.foreach(a => state(a.get("category").asLong) = a.get("avg_final").asDouble)
        case "d" => before.foreach(b => state.remove(b.get("category").asLong))
        case other => fail(s"unknown debezium op $other")
      }
    }
    val stream = state.toMap
    val ev = spark.read.format("graft-nexmark")
      .option("message_count", "20000").option("event_rate", "1000").load()
    val a = ev.filter(col("auction").isNotNull).select(
      col("auction.id").as("aid"), col("auction.category").as("category"),
      col("auction.datetime").as("adt"), col("auction.expires").as("expires"))
    val b = ev.filter(col("bid").isNotNull).select(
      col("bid.auction").as("auction"), col("bid.price").as("price"),
      col("bid.datetime").as("bdt"))
    val expected = a.join(b, a("aid") === b("auction") &&
        b("bdt") >= a("adt") && b("bdt") <= a("expires"))
      .groupBy("aid", "category").agg(max("price").as("final"))
      .groupBy("category").agg(avg("final").as("avg_final"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.nonEmpty && got == expected,
      s"extra=${got.toSet.diff(expected.toSet).take(3)} " +
        s"missing=${expected.toSet.diff(got.toSet).take(3)}")
    assert(stream == got, s"stream vs batch: " +
      s"extra=${stream.toSet.diff(got.toSet).take(3)} " +
      s"missing=${got.toSet.diff(stream.toSet).take(3)}")
  }

  test("golden: nexmark_q6 shape (avg of each seller's last-10 winning bids), batch AND streaming") {
    // q6: per-seller average over the 10 most recent winning bids — the
    // q4 winner derivation under a per-key ordered window (ROW_NUMBER
    // OVER PARTITION BY) under a final aggregate. The SQL face is
    // batch-only BY REFERENCE PARITY: a window function over updating
    // (non-windowed-aggregate) input is rejected by the planner exactly
    // like the reference's no_updating_window_functions.sql — asserted
    // below. The streaming face runs at the DataFrame level through the
    // r8 join-spool (WindowFnOnClose.spoolBranches): the interval join
    // streams natively, winners/window/avg evaluate as one batch over
    // the closed join — byte-exact vs batch.
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.{avg, col, max, row_number}
    def script(outPath: String) = s"""
      |CREATE TABLE nexmark WITH (
      |  connector = 'nexmark',
      |  event_rate = '1000',
      |  message_count = '20000'
      |);
      |CREATE TABLE seller_avg (
      |  seller BIGINT,
      |  avg_last10 DOUBLE
      |) WITH (
      |  connector = 'single_file',
      |  path = '$outPath',
      |  format = 'json',
      |  type = 'sink'
      |);
      |INSERT INTO seller_avg
      |SELECT W.seller, AVG(W.final) AS avg_last10
      | FROM (
      |   SELECT seller, final,
      |          ROW_NUMBER() OVER (PARTITION BY seller ORDER BY dt DESC, id DESC) AS rn
      |   FROM (
      |     SELECT A.id AS id, A.seller AS seller, A.dt AS dt, MAX(B.price) AS final
      |     FROM (SELECT auction.id AS id, auction.seller AS seller,
      |                  auction.datetime AS dt, auction.expires AS expires
      |           FROM nexmark WHERE auction IS NOT NULL) AS A
      |     JOIN (SELECT bid.auction AS auction, bid.price AS price,
      |                  bid.datetime AS bdt
      |           FROM nexmark WHERE bid IS NOT NULL) AS B
      |     ON A.id = B.auction AND B.bdt >= A.dt AND B.bdt <= A.expires
      |     GROUP BY A.id, A.seller, A.dt
      |   ) AS winners
      | ) AS W
      | WHERE W.rn <= 10
      | GROUP BY W.seller
      |""".stripMargin
    val outPath = s"${tmp()}/out"
    new Pipeline(spark, streaming = false).run(script(outPath))
    val got = readJsonLines(Paths.get(outPath))
      .map(n => n.get("seller").asLong -> n.get("avg_last10").asDouble).toMap
    // reference parity: ROW_NUMBER over updating input is rejected
    // (no_updating_window_functions.sql) — q6's SQL face cannot stream
    val err = intercept[IllegalArgumentException] {
      new Pipeline(spark, streaming = true).run(script(s"${tmp()}/rejected"))
    }
    assert(err.getMessage.contains("windowed input"), err.getMessage)
    // streaming DataFrame face: spool the interval join, batch the rest
    def q6plan(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val a = ev.filter(col("auction").isNotNull).select(
        col("auction.id").as("aid"), col("auction.seller").as("seller"),
        col("auction.datetime").as("adt"), col("auction.expires").as("expires"))
      val b = ev.filter(col("bid").isNotNull).select(
        col("bid.auction").as("auction"), col("bid.price").as("price"),
        col("bid.datetime").as("bdt"))
      a.join(b, a("aid") === b("auction") &&
          b("bdt") >= a("adt") && b("bdt") <= a("expires"))
        .groupBy("aid", "seller", "adt").agg(max("price").as("final"))
        .withColumn("rn", row_number().over(
          W.partitionBy("seller").orderBy(col("adt").desc, col("aid").desc)))
        .filter(col("rn") <= 10)
        .groupBy("seller").agg(avg("final").as("avg_last10"))
    }
    val streamEv = spark.readStream.format("graft-nexmark")
      .option("message_count", "20000").option("event_rate", "1000").load()
    val (spooled, q6spools) = graft.streaming.SpoolDirs.track {
      graft.streaming.WindowFnOnClose.spoolBranches(
        spark, q6plan(streamEv), alignFrontiers = false)
    }
    assert(spooled.isDefined, "join-spool must accept the q6 shape")
    val stream = spooled.get.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // r9 spool lifecycle: a direct-API consumer releases after draining
    assert(q6spools.nonEmpty)
    graft.streaming.SpoolDirs.release(q6spools)
    q6spools.foreach(d => assert(!Files.exists(d), s"spool dir leaked: $d"))
    val ev = spark.read.format("graft-nexmark")
      .option("message_count", "20000").option("event_rate", "1000").load()
    val a = ev.filter(col("auction").isNotNull).select(
      col("auction.id").as("aid"), col("auction.seller").as("seller"),
      col("auction.datetime").as("adt"), col("auction.expires").as("expires"))
    val b = ev.filter(col("bid").isNotNull).select(
      col("bid.auction").as("auction"), col("bid.price").as("price"),
      col("bid.datetime").as("bdt"))
    val winners = a.join(b, a("aid") === b("auction") &&
        b("bdt") >= a("adt") && b("bdt") <= a("expires"))
      .groupBy("aid", "seller", "adt").agg(max("price").as("final"))
    val expected = winners
      .withColumn("rn", row_number().over(
        W.partitionBy("seller").orderBy(col("adt").desc, col("aid").desc)))
      .filter(col("rn") <= 10)
      .groupBy("seller").agg(avg("final").as("avg_last10"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.nonEmpty && got == expected,
      s"extra=${got.toSet.diff(expected.toSet).take(3)} " +
        s"missing=${expected.toSet.diff(got.toSet).take(3)}")
    assert(stream == got, s"stream vs batch: " +
      s"extra=${stream.toSet.diff(got.toSet).take(3)} " +
      s"missing=${got.toSet.diff(stream.toSet).take(3)}")
  }

  test("golden batch: active_drivers (nested updating aggregate)") {
    checkExact("active_drivers")
  }
  test("golden batch: filter_updating_aggregates") { checkExact("filter_updating_aggregates") }
  test("golden batch: every_aggregate (full aggregate battery)") {
    numSigDigits = 8 // see the field's scaladoc: regr_sxx/sxy fp noise
    try checkExact("every_aggregate")
    finally numSigDigits = 0
  }
  test("golden batch: debezium_coercion (json source → debezium sink)") {
    checkExact("debezium_coercion")
  }
  test("golden batch: debezium_pass_through (debezium source → sink)") {
    checkExact("debezium_pass_through")
  }
  test("golden batch: debezium_agg (aggregate over a CDC stream)") {
    checkExact("debezium_agg")
  }
  test("golden batch: updating_inner_join (non-windowed inner join → debezium)") {
    checkExact("updating_inner_join")
  }

  // ── the reference's --fail corpus: same scripts must be rejected ──────

  private def checkFails(name: String): Unit = {
    val raw = new String(Files.readAllBytes(Paths.get(s"$refDir/src/test/queries/$name.sql")))
    assert(raw.startsWith("--fail"), s"$name is not a --fail golden")
    val script = raw
      .replace("$input_dir", s"$refDir/inputs")
      .replace("$output_path", s"${tmp()}/out")
    registerTestUdfs()
    val e = intercept[Exception] {
      new Pipeline(spark, streaming = true).run(script)
    }
    info(s"$name rejected: ${e.getMessage.linesIterator.next()}")
  }

  test("golden fail: most_active_driver_last_hour_unaligned (hop multiple)") {
    checkFails("most_active_driver_last_hour_unaligned")
  }
  test("golden fail: updating_full_join") { checkFails("updating_full_join") }
  test("golden fail: updating_left_join") { checkFails("updating_left_join") }
  test("golden fail: updating_right_join") { checkFails("updating_right_join") }
  test("golden fail: updating_inner_join_with_updating") {
    checkFails("updating_inner_join_with_updating")
  }

  // ── streaming (AvailableNow): exact for stateless + updating sinks ────

  test("golden streaming: select_star") { checkExact("select_star", streaming = true) }
  test("golden streaming: union") { checkExact("union", streaming = true) }
  test("golden streaming: aggregates (update-mode debezium)") {
    checkExact("aggregates", streaming = true)
  }
  test("golden streaming: grouped_aggregates") {
    checkExact("grouped_aggregates", streaming = true)
  }
  test("golden streaming: memory_table") {
    checkExact("memory_table", streaming = true)
  }
  test("golden streaming: cast_to_sink_type") {
    checkExact("cast_to_sink_type", streaming = true)
  }
  test("golden streaming: debezium_coercion") {
    checkExact("debezium_coercion", streaming = true)
  }
  test("golden streaming: debezium_pass_through (merged state)") {
    checkExact("debezium_pass_through", streaming = true)
  }
  test("golden streaming: updating_inner_join") {
    checkExact("updating_inner_join", streaming = true)
  }
  test("golden streaming: test_merge_sink (sink-merge rewrite)") {
    checkExact("test_merge_sink", streaming = true)
  }
  test("golden streaming: debezium_agg (retractable agg over CDC input)") {
    checkExact("debezium_agg", streaming = true)
  }
  test("golden streaming: filter_updating_aggregates (global distinct + filter)") {
    checkExact("filter_updating_aggregates", streaming = true)
  }
  test("golden streaming: active_drivers (nested updating aggregate)") {
    checkExact("active_drivers", streaming = true)
  }
  test("golden streaming: every_aggregate (full retractable battery)") {
    numSigDigits = 8 // same fp-noise bound as the batch run
    try checkExact("every_aggregate", streaming = true)
    finally numSigDigits = 0
  }

  // ── streaming: windowed append pipelines (EXACT — end-of-input flush) ─
  // The pipeline overlays a far-future sentinel row on each bounded json
  // file source (Pipeline.eodField), which advances the watermark past
  // every open window at end of input — the Spark analogue of the
  // reference's EndOfData (arroyo-types/src/lib.rs:188-193). Streaming
  // output is therefore the COMPLETE golden multiset, not a subset.

  test("golden streaming: hourly_by_event_type matches golden exactly") {
    checkExact("hourly_by_event_type", streaming = true)
  }
  test("golden streaming: session_window matches golden exactly") {
    checkExact("session_window", streaming = true)
  }
  test("golden streaming: sliding_window_end matches golden exactly") {
    checkExact("sliding_window_end", streaming = true)
  }
  test("golden streaming: windowed_inner_join matches golden exactly") {
    checkExact("windowed_inner_join", streaming = true)
  }
  test("golden streaming: tight_watermark matches golden exactly") {
    checkExact("tight_watermark", streaming = true)
  }
  test("golden streaming: global_session_window matches golden exactly") {
    checkExact("global_session_window", streaming = true)
  }
  test("golden streaming: month_loose_watermark matches golden exactly") {
    checkExact("month_loose_watermark", streaming = true)
  }
  test("golden streaming: udaf matches golden exactly") {
    checkExact("udaf", streaming = true)
  }
  test("golden streaming: unnest_in_view matches golden exactly") {
    checkExact("unnest_in_view", streaming = true)
  }
  test("golden streaming: offset_impulse_join matches golden exactly") {
    checkExact("offset_impulse_join", streaming = true)
  }
  // Spark rejects a FULL OUTER stream-stream join whose inputs are
  // aggregate outputs — the pipeline falls back to spooling each windowed
  // aggregate (append mode, emit-on-close) and joining the closed windows
  // as a batch (WindowFnOnClose.spoolBranches)
  test("golden streaming: windowed_outer_join matches golden exactly") {
    // r9: spool lifecycle — the parquet spool dirs backing the batch
    // rebuild must be reclaimed once the pipeline has drained the frame
    val (_, spools) = graft.streaming.SpoolDirs.track {
      checkExact("windowed_outer_join", streaming = true)
    }
    assert(spools.nonEmpty, "expected the spool fallback to be exercised")
    spools.foreach(d => assert(!Files.exists(d), s"spool dir leaked: $d"))
  }

  // ── streaming: stateless pipelines run exact ──────────────────────────

  test("golden streaming: json_operators") {
    checkExact("json_operators", streaming = true)
  }
  test("golden streaming: double_negative_udf") {
    checkExact("double_negative_udf", streaming = true)
  }
  test("golden streaming: async_udf") {
    checkExact("async_udf", streaming = true)
  }

  // ── streaming: window-functions-on-close (reference window_fn.rs) ─────

  test("golden streaming: most_active_driver_last_hour (OVER per closed window)") {
    // the on-close split streams the bottom aggregate and runs the OVER
    // per closed-window batch; with the end-of-input flush every window
    // closes, so the ranked output matches the golden exactly
    checkExact("most_active_driver_last_hour", streaming = true)
  }

  test("golden streaming: reinvoke_window_function (re-aggregation per closed window)") {
    checkExact("reinvoke_window_function", streaming = true)
  }

  test("streaming window function NOT partitioned by the window is rejected") {
    val dir = Files.createTempDirectory("wf_bad")
    Files.write(dir.resolve("d.json"),
      "{\"ts\": \"2024-01-01T00:00:00Z\", \"k\": \"a\", \"v\": 1}\n".getBytes)
    val e = intercept[IllegalArgumentException] {
      new Pipeline(spark, streaming = true).run(
        s"""CREATE TABLE src (ts TIMESTAMP, k TEXT, v BIGINT) WITH (
           |  connector='filesystem', path='$dir', format='json', type='source',
           |  event_time_field='ts');
           |CREATE TABLE out WITH (connector='blackhole', type='sink');
           |INSERT INTO out
           |SELECT * FROM (
           |  SELECT k, window.start AS s, cnt,
           |         row_number() OVER (PARTITION BY k ORDER BY cnt DESC) AS rn
           |  FROM (SELECT k, tumble(interval '1 minute') AS window, count(*) AS cnt
           |        FROM src GROUP BY 1, 2)
           |) WHERE rn = 1;""".stripMargin)
    }
    assert(e.getMessage.contains("PARTITION BY the time window"))
  }
}
