package graft

import graft.sinks.{DeltaLog, IcebergLog, Merge}
import graft.sql.Pipeline
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** MERGE-backed upsert sinks (`merge_keys` on delta/iceberg sinks): the
  * API-level batch driver (bootstrap, last-wins dedupe, null-safe keys),
  * the batch SQL path, streaming aggregates materializing across
  * checkpointed runs, debezium passthrough carrying real deletes, and
  * the append-only gate for updating plans without merge_keys.
  */
class UpsertSinkSpec extends SparkSpec {

  test("upsertBatch: bootstrap, merge_order_by last-wins, null-safe keys") {
    import spark.implicits._
    val table = Files.createTempDirectory("upsert-api").toString + "/t"
    Merge.upsertBatch(spark, "delta", table,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ver"), Seq("id"))
    assert(DeltaLog.read(spark, table).count() == 2)
    // a CDC batch carrying several versions of key 2: newest wins
    Merge.upsertBatch(spark, "delta", table,
      Seq((2L, "b1", 2L), (2L, "b2", 3L), (3L, "c", 1L)).toDF("id", "v", "ver"),
      Seq("id"), orderBy = Some("ver"))
    val rows = DeltaLog.read(spark, table).as[(Long, String, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(rows == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    // null keys: group-by keys may be null; <=> matches them in place
    val t2 = Files.createTempDirectory("upsert-null").toString + "/t"
    Merge.upsertBatch(spark, "iceberg", t2,
      Seq[(Option[Long], String)]((Some(1L), "a"), (None, "n1")).toDF("id", "v"), Seq("id"))
    Merge.upsertBatch(spark, "iceberg", t2,
      Seq[(Option[Long], String)]((None, "n2")).toDF("id", "v"), Seq("id"))
    val r2 = IcebergLog.read(spark, t2).as[(Option[Long], String)].collect().toMap
    assert(r2 == Map(Some(1L) -> "a", None -> "n2"))
  }

  test("batch pipeline: delta sink with merge_keys upserts instead of appending") {
    import spark.implicits._
    val table = Files.createTempDirectory("upsert-batch").toString + "/t"
    def runWith(rows: Seq[(Long, Long)]): Unit = {
      val src = Files.createTempDirectory("upsert-batch-src").toString
      rows.toDF("id", "score").write.mode("overwrite").parquet(src)
      new Pipeline(spark, streaming = false).run(
        s"""CREATE TABLE src (id BIGINT, score BIGINT) WITH (
           |  connector='filesystem', path='$src', format='parquet', type='source');
           |CREATE TABLE d (id BIGINT, score BIGINT) WITH (
           |  connector='delta', path='$table', format='parquet', type='sink',
           |  merge_keys='id');
           |INSERT INTO d SELECT id, score FROM src""".stripMargin)
    }
    runWith(Seq((1L, 10L), (2L, 20L)))
    runWith(Seq((2L, 99L), (3L, 30L)))
    val rows = DeltaLog.read(spark, table).as[(Long, Long)].collect().toMap
    assert(rows == Map(1L -> 10L, 2L -> 99L, 3L -> 30L),
      "second run must update key 2 and insert key 3, not append")
  }

  test("streaming aggregate materializes into a delta table across checkpointed runs") {
    import spark.implicits._
    val src = Files.createTempDirectory("upsert-agg-src").toString
    val table = Files.createTempDirectory("upsert-agg").toString + "/t"
    val cp = Files.createTempDirectory("upsert-agg-cp").toString
    val script =
      s"""CREATE TABLE src (k TEXT, v DOUBLE) WITH (
         |  connector='filesystem', path='$src', format='json', type='source');
         |CREATE TABLE d (k TEXT, n BIGINT, total DOUBLE) WITH (
         |  connector='delta', path='$table', format='parquet', type='sink',
         |  merge_keys='k', checkpoint='$cp');
         |INSERT INTO d SELECT k, count(*), sum(v) FROM src GROUP BY k""".stripMargin
    Files.write(Paths.get(s"$src/f0.json"),
      ("""{"k":"a","v":1.0}""" + "\n" + """{"k":"a","v":2.0}""" + "\n" +
        """{"k":"b","v":10.0}""" + "\n").getBytes)
    new Pipeline(spark, streaming = true).run(script)
    val first = DeltaLog.read(spark, table).as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(first == Map("a" -> ((2L, 3.0)), "b" -> ((1L, 10.0))))
    // second run from the SAME checkpoint: only keys a (grown) and c (new)
    // change — the update-mode batch carries just them; b must survive
    Files.write(Paths.get(s"$src/f1.json"),
      ("""{"k":"a","v":4.0}""" + "\n" + """{"k":"c","v":100.0}""" + "\n").getBytes)
    new Pipeline(spark, streaming = true).run(script)
    val second = DeltaLog.read(spark, table).as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(second == Map("a" -> ((3L, 7.0)), "b" -> ((1L, 10.0)), "c" -> ((1L, 100.0))))
  }

  test("debezium passthrough: updates rewrite in place, deletes remove the row") {
    import spark.implicits._
    val src = Files.createTempDirectory("upsert-dbz-src").toString
    val table = Files.createTempDirectory("upsert-dbz").toString + "/t"
    val cp = Files.createTempDirectory("upsert-dbz-cp").toString
    // PRIMARY KEY on the debezium source is what pairs a u-envelope's
    // before/after into one _updating_meta.id — required for merge sinks
    val script =
      s"""CREATE TABLE cdc (id BIGINT PRIMARY KEY, v TEXT) WITH (
         |  connector='filesystem', path='$src', format='debezium_json', type='source');
         |CREATE TABLE d (id BIGINT, v TEXT) WITH (
         |  connector='iceberg', path='$table', format='parquet', type='sink',
         |  merge_keys='id', checkpoint='$cp');
         |INSERT INTO d SELECT id, v FROM cdc""".stripMargin
    Files.write(Paths.get(s"$src/f0.jsonl"),
      ("""{"before": null, "after": {"id": 1, "v": "x"}, "op": "c"}""" + "\n" +
        """{"before": null, "after": {"id": 2, "v": "y"}, "op": "c"}""" + "\n").getBytes)
    new Pipeline(spark, streaming = true).run(script)
    assert(IcebergLog.read(spark, table).as[(Long, String)].collect().toMap ==
      Map(1L -> "x", 2L -> "y"))
    // same checkpoint: id 1 updated, id 2 deleted
    Files.write(Paths.get(s"$src/f1.jsonl"),
      ("""{"before": {"id": 1, "v": "x"}, "after": {"id": 1, "v": "x2"}, "op": "u"}""" + "\n" +
        """{"before": {"id": 2, "v": "y"}, "after": null, "op": "d"}""" + "\n").getBytes)
    new Pipeline(spark, streaming = true).run(script)
    assert(IcebergLog.read(spark, table).as[(Long, String)].collect().toMap ==
      Map(1L -> "x2"), "u must rewrite in place; d must remove the row")
  }

  test("partitioned upsert table: bootstrap partitions, updates stay in their partition dirs") {
    import spark.implicits._
    val table = Files.createTempDirectory("upsert-part").toString + "/t"
    Merge.upsertBatch(spark, "delta", table,
      Seq((1L, "us", 10L), (2L, "us", 20L), (3L, "eu", 30L)).toDF("id", "region", "score"),
      Seq("id"), partitionBy = Seq("region"))
    assert(DeltaLog.snapshot(spark, table).get.partitionColumns == Seq("region"))
    Merge.upsertBatch(spark, "delta", table,
      Seq((2L, "us", 99L), (4L, "eu", 40L)).toDF("id", "region", "score"), Seq("id"))
    val rows = DeltaLog.read(spark, table).as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows == Map(1L -> (("us", 10L)), 2L -> (("us", 99L)),
      3L -> (("eu", 30L)), 4L -> (("eu", 40L))))
    // partition layout survives the merge rewrite
    import scala.jdk.CollectionConverters._
    val dirs = Files.list(Paths.get(table)).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSet
    assert(dirs.exists(_.startsWith("region=us")) && dirs.exists(_.startsWith("region=eu")))
  }

  test("a batch with duplicate merge keys still trips the guard (no orderBy, no meta)") {
    import spark.implicits._
    val table = Files.createTempDirectory("upsert-dup").toString + "/t"
    Merge.upsertBatch(spark, "delta", table,
      Seq((1L, "a")).toDF("id", "v"), Seq("id"))
    val e = intercept[IllegalStateException] {
      Merge.upsertBatch(spark, "delta", table,
        Seq((1L, "x"), (1L, "y")).toDF("id", "v"), Seq("id"))
    }
    assert(e.getMessage.contains("more than one source row"))
  }

  test("upsert schema evolution: a new CDC column evolves the table under merge_schema") {
    import spark.implicits._
    val table = Files.createTempDirectory("upsert-evolve").toString + "/t"
    Merge.upsertBatch(spark, "delta", table,
      Seq((1L, "a")).toDF("id", "v"), Seq("id"))
    // without the flag the drift is a loud error
    val e = intercept[IllegalArgumentException] {
      Merge.upsertBatch(spark, "delta", table,
        Seq((2L, "b", "extra")).toDF("id", "v", "note"), Seq("id"))
    }
    assert(e.getMessage.contains("note"))
    // with it, the column appends nullable and the upsert lands
    Merge.upsertBatch(spark, "delta", table,
      Seq((1L, "a2", "hi"), (2L, "b", "yo")).toDF("id", "v", "note"), Seq("id"),
      mergeSchema = true)
    val rows = DeltaLog.read(spark, table).as[(Long, String, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows == Map(1L -> (("a2", Some("hi"))), 2L -> (("b", Some("yo")))))
    // same composition on iceberg (field ids stay position-stable)
    val it = Files.createTempDirectory("upsert-evolve-ice").toString + "/t"
    Merge.upsertBatch(spark, "iceberg", it, Seq((1L, "a")).toDF("id", "v"), Seq("id"))
    Merge.upsertBatch(spark, "iceberg", it,
      Seq((1L, "a2", 9L)).toDF("id", "v", "n"), Seq("id"), mergeSchema = true)
    val ir = IcebergLog.read(spark, it).as[(Long, String, Option[Long])].collect()
    assert(ir.toSeq == Seq((1L, "a2", Some(9L))))
  }

  test("upsert type drift and case-variant columns are loud errors, never silent casts") {
    import spark.implicits._
    val table = Files.createTempDirectory("upsert-drift").toString + "/t"
    Merge.upsertBatch(spark, "delta", table,
      Seq((1L, 1.5)).toDF("id", "amount"), Seq("id"))
    // type drift: amount arrives as STRING — merge would cast bad values
    // to null silently, so the drift must reject in BOTH flag states
    val e1 = intercept[IllegalArgumentException] {
      Merge.upsertBatch(spark, "delta", table,
        Seq((1L, "oops")).toDF("id", "amount"), Seq("id"))
    }
    assert(e1.getMessage.contains("type drift"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Merge.upsertBatch(spark, "delta", table,
        Seq((1L, "oops")).toDF("id", "amount"), Seq("id"), mergeSchema = true)
    }
    assert(e2.getMessage.contains("type drift"), e2.getMessage)
    // case variant: evolving AMOUNT next to amount would make every later
    // read ambiguous under Spark's case-insensitive analysis
    val e3 = intercept[IllegalArgumentException] {
      Merge.upsertBatch(spark, "delta", table,
        Seq((1L, 2.5)).toDF("id", "AMOUNT"), Seq("id"), mergeSchema = true)
    }
    assert(e3.getMessage.contains("case"), e3.getMessage)
    // a SUBSET batch (missing non-key columns) stays legal without any flag
    Merge.upsertBatch(spark, "delta", table, Seq(Tuple1(1L)).toDF("id"), Seq("id"))
    assert(DeltaLog.read(spark, table).count() == 1)
  }

  test("updating plan into a table sink WITHOUT merge_keys is rejected") {
    val src = Files.createTempDirectory("upsert-gate-src").toString
    Files.write(Paths.get(s"$src/f0.json"), """{"k":"a","v":1.0}""".getBytes)
    val e = intercept[Exception] {
      new Pipeline(spark, streaming = true).run(
        s"""CREATE TABLE src (k TEXT, v DOUBLE) WITH (
           |  connector='filesystem', path='$src', format='json', type='source');
           |CREATE TABLE d (k TEXT, n BIGINT) WITH (
           |  connector='delta', path='${Files.createTempDirectory("x")}/t',
           |  format='parquet', type='sink');
           |INSERT INTO d SELECT k, count(*) FROM src GROUP BY k""".stripMargin)
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("merge_keys")), s"got: ${chain(e)}")
  }
}
