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
  * scripts; stateless/updating pipelines match exactly, while append-mode
  * windowed pipelines satisfy streamed ⊆ golden with only final-watermark
  * windows missing (Spark has no end-of-stream watermark flush — the
  * reference's bounded sources emit EndOfData which closes every window;
  * documented divergence).
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

  /** Canonical JSON: sorted keys, null fields dropped (json writers differ
    * on null-vs-absent), timestamps normalized (zone + trailing zeros).
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

  /** Streaming append-mode windowed pipelines: all emitted rows must be in
    * the golden set; rows may be missing only near the final watermark.
    */
  private def checkSubset(name: String): Unit = {
    val (out, golden, _) = runGolden(name, streaming = true)
    assert(golden.nonEmpty, s"golden output missing for $name")
    val (o, g) = (multiset(out), multiset(golden))
    val bogus = o.keySet.diff(g.keySet).take(3)
    assert(bogus.isEmpty, s"$name: streaming emitted rows not in golden: $bogus")
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

  // ── streaming (AvailableNow): exact for stateless + updating sinks ────

  test("golden streaming: select_star") { checkExact("select_star", streaming = true) }
  test("golden streaming: union") { checkExact("union", streaming = true) }
  test("golden streaming: aggregates (update-mode debezium)") {
    checkExact("aggregates", streaming = true)
  }
  test("golden streaming: grouped_aggregates") {
    checkExact("grouped_aggregates", streaming = true)
  }

  // ── streaming: windowed append pipelines (subset semantics) ───────────

  test("golden streaming: hourly_by_event_type emits only golden rows") {
    checkSubset("hourly_by_event_type")
  }
  test("golden streaming: session_window emits only golden rows") {
    checkSubset("session_window")
  }
  test("golden streaming: sliding_window_end emits only golden rows") {
    checkSubset("sliding_window_end")
  }
}
