package graft

import graft.sinks.{DeltaLog, IcebergLog, Merge}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** `MERGE INTO` (copy-on-write upsert) on both table formats: clause
  * semantics (statement order, AND-conditions, INSERT * / explicit,
  * the multiple-source-rows error), file mechanics (only key-range-
  * overlapping files rewritten — the source batch's actual bounds prune
  * the plan), one atomic commit carrying updates AND inserts, and the
  * SQL face.
  */
class MergeSpec extends SparkSpec {

  private def tmpTable(name: String): String =
    Files.createTempDirectory(name).toString

  private def upsertClauses(extraInsertCond: Option[String] = None) = Merge.Clauses(
    "t", "s", "t.id = s.id",
    Seq(Merge.MatchedClause(None, Left(Seq("v" -> "s.v")))),
    Some((extraInsertCond, Seq.empty)))

  test("delta MERGE upserts in ONE version; files outside the source key bounds survive untouched") {
    import spark.implicits._
    val table = tmpTable("delta_merge")
    DeltaLog.writeBatch((1L to 100L).map(i => (i, s"old$i")).toDF("id", "v").coalesce(1), table)
    DeltaLog.writeBatch((1000L to 1100L).map(i => (i, s"old$i")).toDF("id", "v").coalesce(1), table)
    val before = DeltaLog.snapshot(spark, table).get
    val untouched = before.adds.find(_._2.stats.exists(_.contains("1000"))).get
    // source touches ids 50-60 (file 1's range) and inserts 200-205
    val source = ((50L to 60L) ++ (200L to 205L)).map(i => (i, s"new$i")).toDF("id", "v")
    assert(DeltaLog.merge(spark, table, source, upsertClauses()).contains(2L))
    val after = DeltaLog.snapshot(spark, table).get
    assert(after.adds.exists { case (p, info) =>
      p == untouched._1 && info.modificationTime == untouched._2.modificationTime },
      "file outside the source key bounds must survive the merge untouched")
    val rows = DeltaLog.read(spark, table).as[(Long, String)].collect().toMap
    assert(rows.size == 207)
    (50L to 60L).foreach(i => assert(rows(i) == s"new$i"))
    (200L to 205L).foreach(i => assert(rows(i) == s"new$i"))
    assert(rows(49L) == "old49" && rows(1000L) == "old1000")
  }

  test("delta MERGE clause order: first holding clause wins; DELETE clause drops rows") {
    import spark.implicits._
    val table = tmpTable("delta_merge_del")
    DeltaLog.writeBatch(
      (1L to 10L).map(i => (i, i * 10L)).toDF("id", "score").coalesce(1), table)
    val source = (1L to 10L).map(i => (i, i % 2 == 0)).toDF("id", "dead")
    val clauses = Merge.Clauses("t", "s", "t.id = s.id",
      Seq(
        Merge.MatchedClause(Some("s.dead"), Right(())),
        Merge.MatchedClause(None, Left(Seq("score" -> "t.score + 1")))),
      None)
    assert(DeltaLog.merge(spark, table, source, clauses).isDefined)
    val rows = DeltaLog.read(spark, table).as[(Long, Long)].collect().toMap
    assert(rows.keySet == (1L to 10L by 2).toSet, "even ids deleted")
    assert(rows(1L) == 11L && rows(9L) == 91L, "odd ids updated by the later clause")
  }

  test("delta MERGE: a target row matched by two source rows is an ERROR; no-op and insert-only paths") {
    import spark.implicits._
    val table = tmpTable("delta_merge_dup")
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v").coalesce(1), table)
    val dup = Seq((1L, "x"), (1L, "y")).toDF("id", "v")
    val e = intercept[IllegalStateException] {
      DeltaLog.merge(spark, table, dup, upsertClauses()) }
    assert(e.getMessage.contains("more than one source row"))
    assert(DeltaLog.snapshot(spark, table).get.version == 0L)
    // no matches + no NOT MATCHED clause = no commit
    val noInsert = upsertClauses().copy(notMatchedInsert = None)
    assert(DeltaLog.merge(spark, table,
      Seq((99L, "z")).toDF("id", "v"), noInsert).isEmpty)
    // no matches + INSERT * = pure append (zero files rewritten)
    assert(DeltaLog.merge(spark, table,
      Seq((99L, "z")).toDF("id", "v"), upsertClauses()).contains(1L))
    assert(DeltaLog.read(spark, table).count() == 2)
    // the insert-only version removed nothing
    assert(DeltaLog.snapshot(spark, table).get.adds.size == 2)
  }

  test("iceberg MERGE upserts as ONE overwrite snapshot; prior snapshot time-travels") {
    import spark.implicits._
    val table = tmpTable("ice_merge")
    IcebergLog.writeBatch((1L to 100L).map(i => (i, s"old$i")).toDF("id", "v").coalesce(1), table)
    val preSid = IcebergLog.current(table).get.currentSnapshotId
    val source = ((50L to 60L) ++ (200L to 205L)).map(i => (i, s"new$i")).toDF("id", "v")
    assert(IcebergLog.merge(spark, table, source, upsertClauses()).isDefined)
    val m = IcebergLog.current(table).get
    val snap = m.snapshots.find(_.get("snapshot-id").asLong == m.currentSnapshotId).get
    assert(snap.get("summary").get("operation").asText == "overwrite")
    val rows = IcebergLog.read(spark, table).as[(Long, String)].collect().toMap
    assert(rows.size == 106 && rows(50L) == "new50" && rows(200L) == "new200" &&
      rows(49L) == "old49")
    assert(IcebergLog.read(spark, table, snapshotId = Some(preSid)).count() == 100)
    // conditioned INSERT: only some unmatched source rows land
    val cond = upsertClauses(extraInsertCond = Some("s.id < 300"))
    assert(IcebergLog.merge(spark, table,
      Seq((250L, "in"), (350L, "out")).toDF("id", "v"), cond).isDefined)
    val rows2 = IcebergLog.read(spark, table).as[(Long, String)].collect().toMap
    assert(rows2.contains(250L) && !rows2.contains(350L))
  }

  test("NOT MATCHED BY SOURCE reconciles a snapshot: delete/flag target rows the source dropped") {
    import spark.implicits._
    val table = tmpTable("delta_merge_nmbs")
    DeltaLog.writeBatch(
      (1L to 10L).map(i => (i, s"v$i", "live")).toDF("id", "v", "status").coalesce(1), table)
    // the new snapshot keeps ids 1-5 (id 3 gets a new value), drops 6-10
    val source = ((1L to 5L).map(i => (i, if (i == 3) "v3b" else s"v$i"))).toDF("id", "v")
    val clauses = Merge.Clauses("t", "s", "t.id = s.id",
      Seq(Merge.MatchedClause(None, Left(Seq("v" -> "s.v")))),
      Some((None, Seq("id" -> "s.id", "v" -> "s.v", "status" -> "'live'"))),
      notBySource = Seq(
        Merge.MatchedClause(Some("t.id >= 9"), Right(())),
        Merge.MatchedClause(None, Left(Seq("status" -> "'retired'")))))
    assert(DeltaLog.merge(spark, table, source, clauses).isDefined)
    val rows = DeltaLog.read(spark, table).as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows.keySet == (1L to 8L).toSet, "ids 9-10 deleted by the first NMBS clause")
    assert(rows(3L) == (("v3b", "live")), "matched row updated")
    (6L to 8L).foreach(i => assert(rows(i) == ((s"v$i", "retired")),
      s"id $i retired by the second NMBS clause"))
    (1L to 5L).foreach(i => assert(rows(i)._2 == "live"))
  }

  test("NOT MATCHED BY SOURCE disables source-key-bounds pruning (files outside the bounds ARE touched)") {
    import spark.implicits._
    val table = tmpTable("ice_merge_nmbs")
    IcebergLog.writeBatch((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), table)
    IcebergLog.writeBatch((1000L to 1010L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), table)
    // source only overlaps the low file's key range — a bounds-pruned
    // plan would never see the 1000s, but NMBS must delete them
    val source = (1L to 10L).map(i => (i, s"n$i")).toDF("id", "v")
    val clauses = Merge.Clauses("t", "s", "t.id = s.id",
      Seq(Merge.MatchedClause(None, Left(Seq("v" -> "s.v")))), None,
      notBySource = Seq(Merge.MatchedClause(None, Right(()))))
    assert(IcebergLog.merge(spark, table, source, clauses).isDefined)
    val rows = IcebergLog.read(spark, table).as[(Long, String)].collect().toMap
    assert(rows.keySet == (1L to 10L).toSet, "rows absent from the source deleted")
    assert(rows(1L) == "n1")
  }

  test("MERGE INTO SQL verb runs against delta and iceberg; subquery source; plan() validates only") {
    import spark.implicits._
    val dt = tmpTable("sql_merge_delta")
    val it = tmpTable("sql_merge_ice")
    val srcDir = tmpTable("sql_merge_src")
    DeltaLog.writeBatch((1L to 5L).map(i => (i, i * 10L)).toDF("id", "score").coalesce(1), dt)
    IcebergLog.writeBatch((1L to 5L).map(i => (i, i * 10L)).toDF("id", "score").coalesce(1), it)
    Seq((2L, 999L), (7L, 70L)).toDF("id", "score").write.mode("overwrite").parquet(srcDir)
    new sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE d (id BIGINT, score BIGINT) WITH (
         |  connector='delta', path='$dt', format='parquet', type='sink');
         |CREATE TABLE i (id BIGINT, score BIGINT) WITH (
         |  connector='iceberg', path='$it', format='parquet', type='sink');
         |CREATE TABLE src (id BIGINT, score BIGINT) WITH (
         |  connector='filesystem', path='$srcDir', format='parquet', type='source');
         |MERGE INTO d AS t USING src AS s ON t.id = s.id
         |  WHEN MATCHED THEN UPDATE SET score = s.score
         |  WHEN NOT MATCHED THEN INSERT *;
         |MERGE INTO i AS t USING (SELECT id, score + 1 AS score FROM src) AS s
         |  ON t.id = s.id
         |  WHEN MATCHED THEN UPDATE SET score = s.score
         |  WHEN NOT MATCHED THEN INSERT (id, score) VALUES (s.id, s.score);""".stripMargin)
    val drows = DeltaLog.read(spark, dt).as[(Long, Long)].collect().toMap
    assert(drows == Map(1L -> 10L, 2L -> 999L, 3L -> 30L, 4L -> 40L, 5L -> 50L, 7L -> 70L))
    val irows = IcebergLog.read(spark, it).as[(Long, Long)].collect().toMap
    assert(irows == Map(1L -> 10L, 2L -> 1000L, 3L -> 30L, 4L -> 40L, 5L -> 50L, 7L -> 71L))
    // plan() validates but does not run
    val n = DeltaLog.snapshot(spark, dt).get.version
    new sql.Pipeline(spark, streaming = false).plan(
      s"""CREATE TABLE d (id BIGINT, score BIGINT) WITH (
         |  connector='delta', path='$dt', format='parquet', type='sink');
         |CREATE TABLE src (id BIGINT, score BIGINT) WITH (
         |  connector='filesystem', path='$srcDir', format='parquet', type='source');
         |MERGE INTO d AS t USING src AS s ON t.id = s.id
         |  WHEN MATCHED THEN DELETE;""".stripMargin)
    assert(DeltaLog.snapshot(spark, dt).get.version == n, "plan() must not run MERGE")
    // bad clauses are parse/validation errors
    assert(intercept[IllegalArgumentException] {
      sql.Ddl.parse("MERGE INTO d USING s ON a = b") // no WHEN clause
    }.getMessage.contains("WHEN"))
    assert(intercept[IllegalArgumentException] {
      sql.Ddl.parse("MERGE INTO d USING (SELECT 1) ON a = b WHEN MATCHED THEN DELETE")
    }.getMessage.contains("alias"))
  }

  test("NOT MATCHED BY SOURCE SQL face: full snapshot sync in one statement") {
    import spark.implicits._
    val dt = tmpTable("sql_merge_nmbs")
    val srcDir = tmpTable("sql_merge_nmbs_src")
    DeltaLog.writeBatch((1L to 6L).map(i => (i, i * 10L)).toDF("id", "score").coalesce(1), dt)
    Seq((2L, 999L), (7L, 70L)).toDF("id", "score").write.mode("overwrite").parquet(srcDir)
    new sql.Pipeline(spark, streaming = false).run(
      s"""CREATE TABLE d (id BIGINT, score BIGINT) WITH (
         |  connector='delta', path='$dt', format='parquet', type='sink');
         |CREATE TABLE src (id BIGINT, score BIGINT) WITH (
         |  connector='filesystem', path='$srcDir', format='parquet', type='source');
         |MERGE INTO d AS t USING src AS s ON t.id = s.id
         |  WHEN MATCHED THEN UPDATE SET score = s.score
         |  WHEN NOT MATCHED BY TARGET THEN INSERT *
         |  WHEN NOT MATCHED BY SOURCE AND t.id > 4 THEN DELETE
         |  WHEN NOT MATCHED BY SOURCE THEN UPDATE SET score = -1;""".stripMargin)
    val rows = DeltaLog.read(spark, dt).as[(Long, Long)].collect().toMap
    // 2 updated, 7 inserted, 5-6 deleted (unmatched, id>4), 1/3/4 → -1
    assert(rows == Map(1L -> -1L, 2L -> 999L, 3L -> -1L, 4L -> -1L, 7L -> 70L))
    // parse shape: NMBS clauses keep statement order and conditions
    sql.Ddl.parse(
      """MERGE INTO d USING s ON d.a = s.a
        |WHEN NOT MATCHED BY SOURCE AND x THEN UPDATE SET a = 1
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin) match {
      case m: sql.Ddl.MergeInto =>
        assert(m.matched.isEmpty && m.insert.isEmpty)
        assert(m.notBySource == Seq(
          (Some("x"), Left(Seq("a" -> "1"))), (None, Right(()))))
      case other => fail(s"unexpected parse: $other")
    }
  }

  test("MERGE tokenizer: nested THEN/WHEN in conditions, string literals and backquotes never mis-split") {
    def mergeOf(stmt: String): graft.sql.Ddl.MergeInto =
      graft.sql.Ddl.parse(stmt).asInstanceOf[graft.sql.Ddl.MergeInto]
    // THEN inside a nested SUBQUERY in a clause AND-condition
    val m1 = mergeOf(
      """MERGE INTO d USING s ON d.k = s.k
        |WHEN MATCHED AND d.k IN (SELECT CASE WHEN x > 0 THEN 1 ELSE 2 END FROM u) THEN DELETE
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(m1.matched == Seq((Some(
      "d.k IN (SELECT CASE WHEN x > 0 THEN 1 ELSE 2 END FROM u)"), Right(()))))
    assert(m1.insert.contains((None, Seq.empty)))
    // THEN inside a function call's CASE argument (non-paren CASE is
    // covered by CASE-depth; here both nestings stack)
    val m2 = mergeOf(
      """MERGE INTO d USING s ON d.k = s.k
        |WHEN MATCHED AND coalesce(CASE WHEN s.a THEN s.b END, 0) > 1
        |THEN UPDATE SET v = s.v""".stripMargin)
    assert(m2.matched == Seq((Some(
      "coalesce(CASE WHEN s.a THEN s.b END, 0) > 1"),
      Left(Seq("v" -> "s.v")))))
    // WHEN / THEN inside STRING LITERALS are inert
    val m3 = mergeOf(
      """MERGE INTO d USING s ON d.k = s.k
        |WHEN MATCHED AND s.note = 'WHEN x THEN y' THEN UPDATE SET note = 'THEN'
        |WHEN NOT MATCHED THEN INSERT (k, note) VALUES (s.k, 'WHEN')""".stripMargin)
    assert(m3.matched == Seq((Some("s.note = 'WHEN x THEN y'"),
      Left(Seq("note" -> "'THEN'")))))
    assert(m3.insert.contains((None, Seq("k" -> "s.k", "note" -> "'WHEN'"))))
    // a BACKQUOTED column named `then` is an identifier, not a keyword
    val m4 = mergeOf(
      """MERGE INTO d USING s ON d.k = s.k
        |WHEN MATCHED AND s.`then` > 0 THEN DELETE""".stripMargin)
    assert(m4.matched == Seq((Some("s.`then` > 0"), Right(()))))
    // pathological clause ORDER: NMBS first, MATCHED in the middle,
    // NOT MATCHED last — families keep statement order within each list
    val m5 = mergeOf(
      """MERGE INTO d USING s ON d.k = s.k
        |WHEN NOT MATCHED BY SOURCE AND d.v > 9 THEN DELETE
        |WHEN MATCHED AND s.dead THEN DELETE
        |WHEN NOT MATCHED BY TARGET THEN INSERT *
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = -1""".stripMargin)
    assert(m5.matched == Seq(
      (Some("s.dead"), Right(())), (None, Left(Seq("v" -> "s.v")))))
    assert(m5.notBySource == Seq(
      (Some("d.v > 9"), Right(())), (None, Left(Seq("v" -> "-1")))))
    assert(m5.insert.contains((None, Seq.empty)))
    // malformed shapes are loud: missing THEN, bad action per family
    assert(intercept[IllegalArgumentException] { graft.sql.Ddl.parse(
      "MERGE INTO d USING s ON a = b WHEN MATCHED UPDATE SET v = 1")
    }.getMessage.contains("THEN"))
    assert(intercept[IllegalArgumentException] { graft.sql.Ddl.parse(
      "MERGE INTO d USING s ON a = b WHEN NOT MATCHED THEN DELETE")
    }.getMessage.contains("INSERT"))
    assert(intercept[IllegalArgumentException] { graft.sql.Ddl.parse(
      "MERGE INTO d USING s ON a = b WHEN MATCHED THEN INSERT *")
    }.getMessage.contains("UPDATE SET"))
  }

  test("a CASE WHEN inside a merge clause does not split the statement's WHEN clauses") {
    sql.Ddl.parse(
      """MERGE INTO d USING s ON d.k = s.k
        |WHEN MATCHED THEN UPDATE SET p = CASE WHEN s.x > 0 THEN s.p ELSE d.p END
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin) match {
      case m: sql.Ddl.MergeInto =>
        assert(m.matched == Seq((None,
          Left(Seq("p" -> "CASE WHEN s.x > 0 THEN s.p ELSE d.p END")))))
        assert(m.insert.contains((None, Seq.empty)))
      case other => fail(s"unexpected parse: $other")
    }
  }

  test("timestamp-keyed MERGE: bounds render in UTC and prune correctly") {
    import spark.implicits._
    val table = tmpTable("delta_merge_ts")
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:00:00")
    // two files with disjoint hour ranges
    DeltaLog.writeBatch((0 to 5).map(h => (ts(h), s"old$h")).toDF("t", "v").coalesce(1), table)
    DeltaLog.writeBatch((12 to 17).map(h => (ts(h), s"old$h")).toDF("t", "v").coalesce(1), table)
    val before = DeltaLog.snapshot(spark, table).get.adds
    val source = Seq((ts(13), "new13"), (ts(14), "new14")).toDF("t", "v")
    val clauses = Merge.Clauses("x", "s", "x.t = s.t",
      Seq(Merge.MatchedClause(None, Left(Seq("v" -> "s.v")))), None)
    assert(DeltaLog.merge(spark, table, source, clauses).isDefined)
    val after = DeltaLog.snapshot(spark, table).get
    val survivors = after.adds.map(_._1).toSet intersect before.map(_._1).toSet
    assert(survivors.size == 1,
      s"the 00-05h file must survive untouched (bounds pruned); got $survivors")
    val rows = DeltaLog.read(spark, table).as[(java.sql.Timestamp, String)].collect().toMap
    assert(rows.size == 12 && rows(ts(13)) == "new13" && rows(ts(14)) == "new14" &&
      rows(ts(0)) == "old0" && rows(ts(17)) == "old17")
  }

  test("keyBoundsFilter: unrenderable bound type with one null key must NOT collapse to IS NULL") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    // TIMESTAMP_NTZ has no litSql rendering; a null-safe key with one
    // null plus real values used to degenerate the filter to `k IS NULL`,
    // pruning files that hold genuinely matching non-null keys
    val d = java.time.LocalDateTime.of(2024, 3, 1, 12, 0)
    val source = Seq(Some(d), None, Some(d.plusHours(2))).toDF("k")
    val schema = StructType(Seq(StructField("k", TimestampNTZType)))
    val clauses = Merge.Clauses("t", "s", "t.k <=> s.k",
      Seq(Merge.MatchedClause(None, Left(Seq("k" -> "s.k")))), None)
    assert(Merge.keyBoundsFilter(spark, clauses, source, schema).isEmpty,
      "unrenderable bounds must emit NO conjunct (no pruning), never IS NULL")
    // all-null keys: the IS NULL collapse is correct and stays
    val allNull = Seq[Option[java.time.LocalDateTime]](None, None).toDF("k")
    assert(Merge.keyBoundsFilter(spark, clauses, allNull, schema)
      .contains("k IS NULL"))
  }

  test("insert-only MERGE skips the multiple-source-rows guard (delta-spark rule)") {
    import spark.implicits._
    val table = tmpTable("delta_merge_insonly_dup")
    DeltaLog.writeBatch(Seq((1L, "a")).toDF("id", "v").coalesce(1), table)
    // two source rows match target id 1 — an updating merge must refuse,
    // but an insert-only merge has nothing order-dependent to do: both
    // matching rows are simply NOT inserted
    val source = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("id", "v")
    val insertOnly = Merge.Clauses("t", "s", "t.id = s.id",
      matched = Seq.empty, notMatchedInsert = Some((None, Seq.empty)))
    assert(DeltaLog.merge(spark, table, source, insertOnly).isDefined)
    val rows = DeltaLog.read(spark, table).as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "a", 2L -> "z"))
  }

  test("insert-only iceberg MERGE commits as append, not overwrite (streams keep flowing)") {
    import spark.implicits._
    val table = tmpTable("ice_merge_insonly")
    IcebergLog.writeBatch(Seq((1L, "a")).toDF("id", "v").coalesce(1), table)
    assert(IcebergLog.merge(spark, table,
      Seq((9L, "z")).toDF("id", "v"), upsertClauses()).isDefined)
    val m = IcebergLog.current(table).get
    val snap = m.snapshots.find(_.get("snapshot-id").asLong == m.currentSnapshotId).get
    assert(snap.get("summary").get("operation").asText == "append",
      "zero files replaced = an append snapshot")
    assert(IcebergLog.read(spark, table).count() == 2)
  }
}
