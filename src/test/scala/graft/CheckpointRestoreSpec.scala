package graft

import graft.sql.Pipeline
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Checkpoint/restore parity — the reference runs EVERY smoke test as
  * start → checkpoint mid-stream → stop → restore → finish → compare
  * (crates/arroyo-sql-testing/src/smoke_tests.rs:327 run_and_checkpoint,
  * :480 run_completely). The Spark equivalent: run a pipeline with a
  * pinned checkpointLocation over half the input, stop, add the rest,
  * rerun the same script with the same checkpoint — the second run must
  * resume from committed offsets and RESTORED operator state, and the
  * combined output must equal a single uninterrupted run.
  */
class CheckpointRestoreSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private def jsonLines(p: Path): Seq[JsonNode] = {
    if (!Files.exists(p)) return Seq.empty
    Files.walk(p).iterator().asScala
      .filter(Files.isRegularFile(_))
      .filter { f =>
        val n = f.getFileName.toString
        !f.toString.contains("_spark_metadata") && !n.startsWith(".") && !n.startsWith("_")
      }
      .flatMap(f => Files.readAllLines(f).asScala)
      .map(_.trim).filter(_.nonEmpty).map(mapper.readTree).toSeq
  }

  test("updating aggregate state (incl. distinct maps) survives a restart") {
    val src = Files.createTempDirectory("cr-src").toString
    val out = Files.createTempDirectory("cr-out").toString + "/out"
    val cp = Files.createTempDirectory("cr-cp").toString
    val script =
      s"""CREATE TABLE src (k TEXT, c TEXT, v DOUBLE) WITH (
         |  connector='filesystem', path='$src', format='json', type='source');
         |CREATE TABLE snk (k TEXT, n BIGINT, d BIGINT, s DOUBLE) WITH (
         |  connector='filesystem', path='$out', format='debezium_json', type='sink',
         |  checkpoint='$cp');
         |INSERT INTO snk SELECT k, count(*), count(distinct c), sum(v) FROM src GROUP BY k
         |""".stripMargin
    Files.write(Paths.get(s"$src/f0.json"),
      ("""{"k":"a","c":"x","v":1.0}""" + "\n" +
        """{"k":"a","c":"y","v":2.0}""" + "\n" +
        """{"k":"b","c":"x","v":10.0}""" + "\n").getBytes)
    new Pipeline(spark, streaming = true).run(script)
    val firstRun = jsonLines(Paths.get(out))
    assert(firstRun.nonEmpty, "first run emitted nothing")

    // second half: key a grows (same distinct c), key b gains a new c,
    // key c appears fresh — all three transitions need RESTORED state
    Files.write(Paths.get(s"$src/f1.json"),
      ("""{"k":"a","c":"y","v":4.0}""" + "\n" +
        """{"k":"b","c":"z","v":20.0}""" + "\n" +
        """{"k":"c","c":"w","v":100.0}""" + "\n").getBytes)
    new Pipeline(spark, streaming = true).run(script)

    // files from the two runs interleave arbitrarily on disk, so assert on
    // the emitted images rather than a file-order replay: the second run
    // must emit `u` records whose BEFORE is the first run's state (proof
    // the accumulators — incl. the distinct map — were restored) and whose
    // AFTER combines both halves
    def img(n: JsonNode) = (n.get("k").asText(), n.get("n").asLong,
      n.get("d").asLong, n.get("s").asDouble)
    val lines = jsonLines(Paths.get(out))
    val updates = lines.filter(_.get("op").asText() == "u")
      .map(l => img(l.get("before")) -> img(l.get("after"))).toSet
    assert(updates.contains((("a", 2L, 2L, 3.0), ("a", 3L, 2L, 7.0))),
      s"key a did not resume from restored state: $lines")
    assert(updates.contains((("b", 1L, 1L, 10.0), ("b", 2L, 2L, 30.0))),
      s"key b's distinct map was not restored: $lines")
    val creates = lines.filter(_.get("op").asText() == "c").map(l => img(l.get("after")))
    assert(creates.contains(("c", 1L, 1L, 100.0)), s"fresh key missing: $lines")
    // a restored key must NOT re-emit a create (that would mean state loss)
    assert(creates.count(_._1 == "a") == 1 && creates.count(_._1 == "b") == 1,
      s"restored keys re-created: $lines")
  }

  test("stream-stream join buffers survive a restart (left arrives before the restart)") {
    val lsrc = Files.createTempDirectory("crj-l").toString
    val rsrc = Files.createTempDirectory("crj-r").toString
    val out = Files.createTempDirectory("crj-out").toString + "/out"
    val cp = Files.createTempDirectory("crj-cp").toString
    val script =
      s"""CREATE TABLE l (lts TIMESTAMP, k BIGINT) WITH (
         |  connector='filesystem', path='$lsrc', format='json', type='source',
         |  event_time_field='lts');
         |CREATE TABLE r (rts TIMESTAMP, k BIGINT, v TEXT) WITH (
         |  connector='filesystem', path='$rsrc', format='json', type='source',
         |  event_time_field='rts');
         |CREATE TABLE jout (k BIGINT, v TEXT) WITH (
         |  connector='filesystem', path='$out', format='json', type='sink',
         |  checkpoint='$cp');
         |INSERT INTO jout
         |SELECT l.k, r.v FROM l JOIN r
         |ON l.k = r.k AND rts BETWEEN lts - interval '1 minute' AND lts + interval '1 minute'
         |""".stripMargin
    // run 1: only the LEFT side has rows — they go into join state
    Files.write(Paths.get(s"$lsrc/f0.json"),
      ("""{"lts":"2024-01-01T00:00:10Z","k":1}""" + "\n" +
        """{"lts":"2024-01-01T00:00:20Z","k":2}""" + "\n").getBytes)
    Files.write(Paths.get(s"$rsrc/f0.json"),
      ("""{"rts":"2024-01-01T00:00:05Z","k":9,"v":"no-match"}""" + "\n").getBytes)
    new Pipeline(spark, streaming = true).run(script)
    assert(jsonLines(Paths.get(out)).isEmpty, "nothing should match in run 1")

    // run 2: matching RIGHT rows arrive — they can only join against
    // RESTORED left-side buffers
    Files.write(Paths.get(s"$rsrc/f1.json"),
      ("""{"rts":"2024-01-01T00:00:15Z","k":1,"v":"a"}""" + "\n" +
        """{"rts":"2024-01-01T00:00:25Z","k":2,"v":"b"}""" + "\n").getBytes)
    new Pipeline(spark, streaming = true).run(script)

    val rows = jsonLines(Paths.get(out))
      .map(n => (n.get("k").asLong, n.get("v").asText)).toSet
    assert(rows == Set((1L, "a"), (2L, "b")),
      s"restored join state did not produce the cross-restart matches: $rows")
  }

  test("tumbling window spanning a restart emits the combined aggregate") {
    val src = Files.createTempDirectory("crw-src").toString
    val out = Files.createTempDirectory("crw-out").toString + "/out"
    val cp = Files.createTempDirectory("crw-cp").toString
    val script =
      s"""CREATE TABLE ev (ts TIMESTAMP, k TEXT) WITH (
         |  connector='filesystem', path='$src', format='json', type='source',
         |  event_time_field='ts');
         |CREATE TABLE wout (s TIMESTAMP, k TEXT, cnt BIGINT) WITH (
         |  connector='filesystem', path='$out', format='json', type='sink',
         |  checkpoint='$cp');
         |INSERT INTO wout
         |SELECT window.start, k, count(*) FROM ev
         |GROUP BY tumble(interval '1 minute'), k
         |""".stripMargin
    // run 1: two rows inside window [00:00, 00:01) — watermark stays below
    // the window end, so nothing is emitted yet; the partial count lives
    // only in checkpointed operator state
    Files.write(Paths.get(s"$src/f0.json"),
      ("""{"ts":"2024-01-01T00:00:10Z","k":"a"}""" + "\n" +
        """{"ts":"2024-01-01T00:00:20Z","k":"a"}""" + "\n").getBytes)
    new Pipeline(spark, streaming = true).run(script)
    assert(jsonLines(Paths.get(out)).isEmpty,
      "window emitted before the watermark passed its end")

    // run 2: one more row in the SAME window, then rows that push the
    // watermark past its end — the emitted count must combine both runs
    Files.write(Paths.get(s"$src/f1.json"),
      ("""{"ts":"2024-01-01T00:00:40Z","k":"a"}""" + "\n" +
        """{"ts":"2024-01-01T00:02:30Z","k":"a"}""" + "\n").getBytes)
    new Pipeline(spark, streaming = true).run(script)

    val rows = jsonLines(Paths.get(out))
      .map(n => (n.get("s").asText(), n.get("k").asText(), n.get("cnt").asLong))
    assert(rows.contains(("2024-01-01T00:00:00.000Z", "a", 3L)) ||
      rows.exists(r => r._3 == 3L && r._1.startsWith("2024-01-01T00:00")),
      s"restored window state did not combine across the restart: $rows")
    assert(!rows.exists(_._3 == 2L), s"partial pre-restart count leaked: $rows")
  }
}
