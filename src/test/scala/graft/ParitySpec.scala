package graft

import graft.sql.{Ddl, Pipeline}

/** Negative-test corpus ported from the reference planner's `--fail`
  * queries (crates/arroyo-planner/src/test/queries/error_*.sql,
  * no_updating_joins.sql, no_updating_window_functions.sql,
  * no_virtual_fields_updating.sql, error_memory_table_double_write.sql,
  * error_read_from_unwritten_memory_table.sql) — statements the engine must
  * REJECT, not silently mis-plan.
  */
class ParitySpec extends SparkSpec {

  private def tmp(): String = java.nio.file.Files.createTempDirectory("graft-parity").toString

  private def jsonSourceDir(): String = {
    val dir = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/d.json"),
      "{\"id\": 1, \"k\": \"a\", \"v\": 2.0}\n{\"id\": 2, \"k\": \"b\", \"v\": 3.0}\n".getBytes)
    dir
  }

  private def debeziumSourceDir(): String = {
    val dir = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/d.jsonl"),
      ("{\"before\": null, \"after\": {\"id\": 1, \"v\": \"x\"}, \"op\": \"c\"}\n").getBytes)
    dir
  }

  private def failsWith(msgPart: String)(body: => Unit): Unit = {
    val e = intercept[Exception](body)
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains(msgPart)), s"expected '$msgPart' in: ${chain(e)}")
  }

  test("no_updating_joins: joining an updating (debezium) source is rejected") {
    val p = new Pipeline(spark, streaming = true)
    val dir = debeziumSourceDir()
    p.runStatement(Ddl.parse(
      s"CREATE TABLE d (id BIGINT, v TEXT) WITH (connector='filesystem', path='$dir', format='debezium_json', type='source')"))
    p.runStatement(Ddl.parse("CREATE TABLE out WITH (connector='blackhole', type='sink')"))
    failsWith("updating left side of join") {
      p.runStatement(Ddl.parse(
        "INSERT INTO out SELECT a.id FROM d a JOIN d b ON a.id = b.id"))
    }
  }

  test("no_updating_joins: joining a non-windowed aggregate is rejected") {
    val p = new Pipeline(spark, streaming = true)
    val dir = jsonSourceDir()
    p.runStatement(Ddl.parse(
      s"CREATE TABLE s (id BIGINT, k TEXT, v DOUBLE) WITH (connector='filesystem', path='$dir', format='json', type='source')"))
    p.runStatement(Ddl.parse(
      "CREATE TABLE counts AS (SELECT count(*) AS c, k FROM s GROUP BY k)"))
    p.runStatement(Ddl.parse("CREATE TABLE out WITH (connector='blackhole', type='sink')"))
    failsWith("updating left side of join") {
      p.runStatement(Ddl.parse(
        "INSERT INTO out SELECT a.c, b.c FROM counts a JOIN counts b ON a.k = b.k"))
    }
  }

  test("no_updating_window_functions: OVER on an updating input is rejected") {
    val p = new Pipeline(spark, streaming = true)
    val dir = debeziumSourceDir()
    p.runStatement(Ddl.parse(
      s"CREATE TABLE d (id BIGINT, v TEXT) WITH (connector='filesystem', path='$dir', format='debezium_json', type='source')"))
    p.runStatement(Ddl.parse("CREATE TABLE out WITH (connector='blackhole', type='sink')"))
    failsWith("Window functions require already windowed input") {
      p.runStatement(Ddl.parse(
        "INSERT INTO out SELECT id, row_number() OVER (PARTITION BY v ORDER BY id) AS rn FROM d"))
    }
  }

  test("no_inserting_updates_into_non_updating: updating result into a json file sink") {
    val p = new Pipeline(spark, streaming = true)
    val dir = jsonSourceDir()
    p.runStatement(Ddl.parse(
      s"CREATE TABLE s (id BIGINT, k TEXT, v DOUBLE) WITH (connector='filesystem', path='$dir', format='json', type='source')"))
    p.runStatement(Ddl.parse(
      s"CREATE TABLE fsink (k TEXT, c BIGINT) WITH (connector='filesystem', path='${tmp()}', format='json', type='sink')"))
    failsWith("non-updating sink") {
      p.runStatement(Ddl.parse("INSERT INTO fsink SELECT k, count(*) AS c FROM s GROUP BY k"))
    }
  }

  test("EXPLAIN / ANALYZE / COPY / DESCRIBE are rejected (plan/mod.rs:400-414)") {
    val p = new Pipeline(spark)
    failsWith("EXPLAIN is not supported") {
      p.runStatement(Ddl.parse("EXPLAIN SELECT 1"))
    }
    failsWith("ANALYZE is not supported") {
      p.runStatement(Ddl.parse("ANALYZE TABLE t COMPUTE STATISTICS"))
    }
    failsWith("COPY is not supported") {
      p.runStatement(Ddl.parse("COPY t TO 'f.csv'"))
    }
    failsWith("DESCRIBE is not supported") {
      p.runStatement(Ddl.parse("DESCRIBE t"))
    }
  }

  test("error_mismatched_nested_windows: mixed session + tumble is rejected, not regex-mangled") {
    val p = new Pipeline(spark)
    val dir = jsonSourceDir()
    p.runStatement(Ddl.parse(
      s"""CREATE TABLE e (id BIGINT, k TEXT, v DOUBLE, ts TIMESTAMP GENERATED ALWAYS AS (CAST('2024-01-01' AS TIMESTAMP))) WITH (
         |connector='filesystem', path='$dir', format='json', type='source', event_time_field='ts')""".stripMargin))
    failsWith("does not match input window") {
      p.runStatement(Ddl.parse(
        """SELECT count(*) FROM (
          |  SELECT k, session(interval '10 minutes') AS window FROM e GROUP BY 1, 2
          |) GROUP BY tumble(interval '1 hour')""".stripMargin))
    }
  }

  test("error_offset_sliding_window: hop width must be a multiple of slide") {
    val p = new Pipeline(spark)
    val dir = jsonSourceDir()
    p.runStatement(Ddl.parse(
      s"""CREATE TABLE e2 (id BIGINT, k TEXT, v DOUBLE, ts TIMESTAMP GENERATED ALWAYS AS (CAST('2024-01-01' AS TIMESTAMP))) WITH (
         |connector='filesystem', path='$dir', format='json', type='source', event_time_field='ts')""".stripMargin))
    failsWith("must be a multiple of slide") {
      p.runStatement(Ddl.parse(
        "SELECT k, hop(interval '3 minute', interval '10 minute') AS window, count(*) FROM e2 GROUP BY 1, 2"))
    }
  }

  test("no_virtual_fields_updating: generated columns on a debezium table are rejected") {
    val p = new Pipeline(spark)
    failsWith("can't use virtual fields with debezium format") {
      p.runStatement(Ddl.parse(
        """CREATE TABLE dz (id BIGINT, s TEXT, ts TIMESTAMP GENERATED ALWAYS AS (CAST(s AS TIMESTAMP)))
          |WITH (connector='filesystem', path='/tmp/x', format='debezium_json', type='source')""".stripMargin))
    }
  }

  test("error_memory_table_double_write + read_from_unwritten: memory table lifecycle") {
    val p = new Pipeline(spark)
    val dir = jsonSourceDir()
    p.runStatement(Ddl.parse(
      s"CREATE TABLE src (id BIGINT, k TEXT, v DOUBLE) WITH (connector='filesystem', path='$dir', format='json', type='source')"))
    p.runStatement(Ddl.parse("CREATE TABLE mem (k TEXT, v DOUBLE)"))

    // read before any insert → plan error
    failsWith("without first inserting into it") {
      p.runStatement(Ddl.parse("SELECT * FROM mem"))
    }

    p.runStatement(Ddl.parse("INSERT INTO mem SELECT k, v FROM src"))
    p.runStatement(Ddl.parse("SELECT k, v FROM mem"))

    // second insert → error (reference: one writer per memory table)
    failsWith("Can only insert into a memory table once") {
      p.runStatement(Ddl.parse("INSERT INTO mem SELECT k, v FROM src"))
    }
  }

  test("insert_into_source: inserting into a source table is rejected") {
    val p = new Pipeline(spark)
    val dir = jsonSourceDir()
    p.runStatement(Ddl.parse(
      s"CREATE TABLE src_i (id BIGINT, k TEXT, v DOUBLE) WITH (connector='filesystem', path='$dir', format='json', type='source')"))
    failsWith("but it is a source") {
      p.runStatement(Ddl.parse("INSERT INTO src_i SELECT * FROM src_i"))
    }
  }

  test("select_from_sink: reading a sink table is rejected") {
    val p = new Pipeline(spark)
    val dir = jsonSourceDir()
    p.runStatement(Ddl.parse(
      s"CREATE TABLE src_s (id BIGINT, k TEXT, v DOUBLE) WITH (connector='filesystem', path='$dir', format='json', type='source')"))
    p.runStatement(Ddl.parse(
      s"CREATE TABLE out_s (id BIGINT) WITH (connector='filesystem', path='${tmp()}/o', format='json', type='sink')"))
    failsWith("but it is a sink") {
      p.runStatement(Ddl.parse("SELECT * FROM out_s"))
    }
  }

  test("misplaced_hop: window function outside GROUP BY is rejected") {
    val p = new Pipeline(spark)
    val dir = jsonSourceDir()
    p.runStatement(Ddl.parse(
      s"CREATE TABLE src_h (id BIGINT, k TEXT, v DOUBLE) WITH (connector='filesystem', path='$dir', format='json', type='source')"))
    failsWith("Are you missing a GROUP BY clause") {
      p.runStatement(Ddl.parse(
        "SELECT hop(interval '1 second', interval '10 second') AS window, count(*) FROM src_h"))
    }
  }

  test("error_second_aggregate_missing_window: re-agg must keep a window") {
    val p = new Pipeline(spark, streaming = true)
    val dir = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/d.json"),
      "{\"ts\": \"2024-01-01T00:00:00Z\", \"k\": \"a\"}\n".getBytes)
    p.runStatement(Ddl.parse(
      s"CREATE TABLE ev (ts TIMESTAMP, k TEXT) WITH (connector='filesystem', path='$dir', format='json', type='source', event_time_field='ts')"))
    p.runStatement(Ddl.parse("CREATE TABLE outw WITH (connector='blackhole', type='sink')"))
    failsWith("must have window in aggregate") {
      p.runStatement(Ddl.parse(
        """INSERT INTO outw SELECT count(*) FROM (
          |  SELECT k, tumble(interval '1 minute') AS window, count(*) AS c
          |  FROM ev GROUP BY 1, 2)""".stripMargin))
    }
  }

  test("updating_filter_join: updating join without equi-condition gets the equijoin error") {
    val p = new Pipeline(spark, streaming = true)
    val dir = debeziumSourceDir()
    p.runStatement(Ddl.parse(
      s"CREATE TABLE du (id BIGINT, v TEXT) WITH (connector='filesystem', path='$dir', format='debezium_json', type='source')"))
    p.runStatement(Ddl.parse("CREATE TABLE outj WITH (connector='blackhole', type='sink')"))
    failsWith("Updating joins must include an equijoin condition") {
      p.runStatement(Ddl.parse(
        "INSERT INTO outj SELECT a.id FROM du a JOIN du b ON a.id < b.id"))
    }
  }

  test("error_missing_redis_key: redis lookup PK must be the key metadata column") {
    val p = new Pipeline(spark)
    failsWith("METADATA FROM 'key'") {
      p.runStatement(Ddl.parse(
        """CREATE TEMPORARY TABLE lk (key TEXT PRIMARY KEY, value TEXT) WITH (
          |  connector='redis', format='json', address='redis://localhost:6379')""".stripMargin))
    }
  }

  test("metadata_error: metadata field with the wrong declared type is rejected") {
    val p = new Pipeline(spark)
    failsWith("incorrect data type for metadata field 'topic'") {
      p.runStatement(Ddl.parse(
        """CREATE TABLE mq (name TEXT, value INT, topic INT METADATA FROM 'topic') WITH (
          |  connector='mqtt', url='tcp://localhost:1883', topic='plant/#',
          |  type='source', format='json')""".stripMargin))
    }
  }

  test("virtual_bad_schema: generated column referencing a missing field is rejected") {
    val p = new Pipeline(spark)
    val dir = jsonSourceDir()
    failsWith("notfield") {
      p.runStatement(Ddl.parse(
        s"""CREATE TABLE vb (id BIGINT, diff INT GENERATED ALWAYS AS (notfield) STORED)
           |WITH (connector='filesystem', path='$dir', format='json', type='source')""".stripMargin))
    }
  }

  test("filesystem_invalid_partition: partition field must exist in the schema") {
    val p = new Pipeline(spark)
    failsWith("Unable to get field named \"not_a_real_field\"") {
      p.runStatement(Ddl.parse(
        s"""CREATE TABLE psink (id TEXT, type TEXT) WITH (
           |  connector='filesystem', path='${tmp()}/o', format='parquet', type='sink',
           |  'partitioning.fields' = [type, not_a_real_field])""".stripMargin))
    }
  }

  test("filesystem sink partitions output by partitioning.fields") {
    val p = new Pipeline(spark)
    val dir = jsonSourceDir()
    val out = tmp() + "/o"
    p.run(
      s"""CREATE TABLE srcp (id BIGINT, k TEXT, v DOUBLE) WITH (connector='filesystem', path='$dir', format='json', type='source');
         |CREATE TABLE outp (id BIGINT, k TEXT, v DOUBLE) WITH (connector='filesystem', path='$out', format='parquet', type='sink', 'partitioning.fields' = [k]);
         |INSERT INTO outp SELECT id, k, v FROM srcp""".stripMargin)
    val parts = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("k="))
    assert(parts.toSet == Set("k=a", "k=b"), s"got ${parts.toSet}")
    assert(spark.read.parquet(out).count() == 2)
  }

  test("memory table feeds a downstream select with declared column names") {
    val p = new Pipeline(spark)
    val dir = jsonSourceDir()
    p.runStatement(Ddl.parse(
      s"CREATE TABLE src2 (id BIGINT, k TEXT, v DOUBLE) WITH (connector='filesystem', path='$dir', format='json', type='source')"))
    p.runStatement(Ddl.parse("CREATE TABLE mem2 (kind TEXT, amount DOUBLE)"))
    p.runStatement(Ddl.parse("INSERT INTO mem2 SELECT k, v FROM src2"))
    p.runStatement(Ddl.parse("SELECT kind, amount FROM mem2 ORDER BY amount"))
    val rows = p.run("SELECT sum(amount) AS s FROM mem2").get.collect()
    assert(rows(0).getDouble(0) == 5.0)
  }
}
