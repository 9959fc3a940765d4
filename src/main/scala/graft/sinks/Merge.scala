package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The row-level engine behind `MERGE INTO` on both table formats
  * (upsert — the verb a CDC feed or incremental training-data refresh
  * lands with). The file-level machinery (touch-detect, copy-on-write
  * swap, conflict rules) is each log's `dmlRewrite`; this object owns
  * what happens to the ROWS of the touched files:
  *
  *   - matched rows take the FIRST matched clause (statement order)
  *     whose AND-condition holds: UPDATE SET rewrites them, DELETE
  *     drops them; rows matching no clause carry through unchanged
  *   - a target row matched by MORE THAN ONE source row is an ERROR
  *     (delta-spark's multiple-source-rows rule: applying both updates
  *     would be order-dependent)
  *   - source rows matching NO target row become INSERTs (explicit
  *     column list, or `INSERT *` by name; absent columns → null)
  *
  * And the scale device: [[keyBoundsFilter]] turns the ON condition's
  * equi-conjuncts into target-side bounds of the ACTUAL source keys, so
  * the touched-file scan opens only files whose stats overlap the
  * source batch — a small CDC batch against a 100 TB table plans
  * O(files-overlapping-the-batch), not O(table).
  */
private[graft] object Merge {

  /** One WHEN MATCHED / NOT MATCHED BY SOURCE clause: optional
    * AND-condition plus its action — Left(sets) = UPDATE SET,
    * Right(()) = DELETE.
    */
  final case class MatchedClause(and: Option[String],
      action: Either[Seq[(String, String)], Unit])

  final case class Clauses(
      targetAlias: String,
      sourceAlias: String,
      cond: String,
      matched: Seq[MatchedClause],
      /** (AND-condition, target-col → expr); empty sets = `INSERT *`. */
      notMatchedInsert: Option[(Option[String], Seq[(String, String)])],
      /** WHEN NOT MATCHED BY SOURCE clauses (snapshot reconciliation:
        * UPDATE/DELETE target rows the source no longer carries). Their
        * conditions and SET expressions may reference only the TARGET —
        * source columns are all-null on these rows by construction.
        */
      notBySource: Seq[MatchedClause] = Seq.empty,
      /** The caller GUARANTEES the source is unique on the merge keys
        * (netBatch output, an orderBy-deduped batch), so [[rewrite]] may
        * skip the multiple-source-rows guard — one fewer Spark job per
        * upsert micro-batch. Never set this for user-supplied sources.
        */
      sourceUniqueByKey: Boolean = false) {
    def updateCols: Seq[String] =
      (matched ++ notBySource).flatMap(_.action.left.toSeq).flatten.map(_._1) ++
        notMatchedInsert.toSeq.flatMap(_._2.map(_._1))
  }

  private val matchFlag = "__graft_s_matched"
  private val uidCol = "__graft_t_uid"
  private val clauseCol = "__graft_clause"

  /** The ONE clause-selection machine [[rewrite]] and [[changesFor]]
    * both project from — kept single so the committed rows and the
    * recorded change images can never drift (the same twin-divergence
    * hazard [[DmlRewrite]] was extracted to kill).
    *
    * Unified clause list: MATCHED clauses fire on matched rows, NOT
    * MATCHED BY SOURCE on unmatched ones — within each family the
    * first-holding-clause rule applies, and the two families are
    * disjoint by their guards so one index column serves both.
    */
  private final class ClausePlan(touched: DataFrame, source: DataFrame,
      schema: StructType, c: Clauses, withUid: Boolean) {
    val allClauses: Seq[(MatchedClause, Boolean)] =
      c.matched.map((_, true)) ++ c.notBySource.map((_, false))
    private val t0 = if (withUid)
      touched.withColumn(uidCol, monotonically_increasing_id()) else touched
    private val joined0 = t0.alias(c.targetAlias)
      .join(source.withColumn(matchFlag, lit(true)).alias(c.sourceAlias),
        expr(c.cond), "left")
    private val isMatched = coalesce(col(matchFlag), lit(false))
    // first-holding-clause index, -1 = no clause (carry through)
    private val firstIdx = allClauses.map { case (mc, onMatched) =>
      (if (onMatched) isMatched else !isMatched) &&
        mc.and.map(expr).getOrElse(lit(true))
    }.zipWithIndex.foldRight(lit(-1): Column) { case ((cd, i), acc) =>
      when(cd, lit(i)).otherwise(acc) }
    /** Joined frame carrying [[clauseCol]]. */
    val withIdx: DataFrame = joined0.withColumn(clauseCol, firstIdx)
    /** The multiple-source-rows rule: >1 joined row for one target uid
      * means two source rows claimed the same target row —
      * order-dependent, refuse (delta-spark's
      * DELTA_MULTIPLE_SOURCE_ROW_MATCHING error). Insert-only merges
      * skip the check like delta-spark does (nothing order-dependent
      * can happen), as do provably key-unique sources. ONE guard shared
      * by the copy-on-write [[rewrite]] and the merge-on-read
      * [[rowDelta]] so the rule can never drift between them.
      */
    def requireSingleSourceRow(): Unit = {
      val dup = if (c.sourceUniqueByKey ||
          (c.matched.isEmpty && c.notBySource.isEmpty)) 0L
        else withIdx.filter(col(matchFlag))
          .groupBy(col(uidCol)).count().filter(col("count") > 1).limit(1).count()
      if (dup > 0) throw new IllegalStateException(
        "MERGE: a target row matched more than one source row; applying " +
          "both would be order-dependent. Deduplicate the source on the " +
          "merge keys first.")
    }
    private val deleteIdxs = allClauses.zipWithIndex.collect {
      case ((MatchedClause(_, Right(_)), _), i) => i }
    val isDelete: Column =
      if (deleteIdxs.isEmpty) lit(false)
      else col(clauseCol).isin(deleteIdxs.map(Integer.valueOf): _*)
    /** Target-image columns, unchanged. */
    def targetImage: Seq[Column] = schema.fields.toIndexedSeq.map(f =>
      col(s"${c.targetAlias}.${f.name}").as(f.name))
    /** Post-image columns: each field with its selected clause's SET
      * expression applied (cast to the declared type), else carried.
      */
    def postImage: Seq[Column] = schema.fields.toIndexedSeq.map { f =>
      val base = col(s"${c.targetAlias}.${f.name}")
      allClauses.zipWithIndex.foldRight(base) {
        case (((MatchedClause(_, Left(sets)), _), i), acc) =>
          sets.toMap.get(f.name) match {
            case Some(e) => when(col(clauseCol) === i,
              expr(e).cast(f.dataType)).otherwise(acc)
            case None => acc
          }
        case (_, acc) => acc
      }.as(f.name)
    }
    /** v3 row-lineage carry columns (r16), present only when the
      * TARGET frame rides them (iceberg's lineage-armed DML cycle):
      * every row keeps its `_row_id`; rows a clause UPDATED bump
      * `_last_updated_sequence_number` to null (the committing file's
      * data sequence inherits, per the spec), carried rows keep theirs.
      */
    def lineageCarry: Seq[Column] =
      if (!touched.columns.contains("_row_id")) Seq.empty
      else Seq(col(s"${c.targetAlias}._row_id").as("_row_id"),
        when(col(clauseCol) >= 0, lit(null).cast(LongType))
          .otherwise(col(s"${c.targetAlias}._last_updated_sequence_number"))
          .as("_last_updated_sequence_number"))
  }

  /** Rows of the touched target files × source → their replacements
    * (survivors + updates) UNION the inserts, in target-schema order.
    * Runs the multiple-source-rows guard eagerly (one job).
    */
  def rewrite(touched: DataFrame, source: DataFrame, schema: StructType,
      c: Clauses, writeDefaults: Map[String, Any] = Map.empty): DataFrame = {
    val plan = new ClausePlan(touched, source, schema, c, withUid = true)
    plan.requireSingleSourceRow()
    val survivors = plan.withIdx.filter(!plan.isDelete)
      .select(plan.postImage ++ plan.lineageCarry: _*)
    val inserts = c.notMatchedInsert.map(_ =>
      insertRows(touched, source, schema, c, writeDefaults))
    inserts.map(survivors.unionAll).getOrElse(survivors)
  }

  /** The MERGE as a merge-on-read ROW DELTA instead of a file rewrite:
    * (positions of target rows a clause retracts, rows to append). The
    * candidate frame carries each row's file/position in `fileCol`/
    * `posCol`; rows where a MATCHED or NOT-MATCHED-BY-SOURCE clause
    * fires are retracted by position — update clauses additionally
    * append their postimage, NOT MATCHED inserts append as-is. Same
    * [[ClausePlan]] the copy-on-write [[rewrite]] projects from, same
    * multiple-source-rows guard.
    */
  def rowDelta(cands: DataFrame, source: DataFrame, schema: StructType,
      c: Clauses, fileCol: String, posCol: String,
      writeDefaults: Map[String, Any] = Map.empty): (DataFrame, DataFrame) = {
    Seq(fileCol, posCol).foreach(mc => require(!source.columns.contains(mc),
      s"MERGE: source column $mc collides with the row-position metadata"))
    val plan = new ClausePlan(cands, source, schema, c, withUid = true)
    plan.requireSingleSourceRow()
    val fired = plan.withIdx.filter(col(clauseCol) >= 0)
    val positions = fired.select(
      col(s"${c.targetAlias}.$fileCol").as(fileCol),
      col(s"${c.targetAlias}.$posCol").as(posCol))
    val posts = fired.filter(!plan.isDelete)
      .select(plan.postImage ++ plan.lineageCarry: _*)
    val appends = c.notMatchedInsert
      .map(_ => posts.unionAll(
        insertRows(cands, source, schema, c, writeDefaults)))
      .getOrElse(posts)
    (positions, appends)
  }

  /** The NOT MATCHED → INSERT rows of a merge, in target-schema order:
    * source rows matching NO row of `base`. `base` may be the touched
    * files' rows (the general path — a file holding any matched row is
    * touched by construction, so the anti-join is exact) or the whole
    * pruned candidate frame (the insert-only fast path, which rewrites
    * nothing — candidates are every file that could hold a matching key,
    * equally exact).
    */
  def insertRows(base: DataFrame, source: DataFrame, schema: StructType,
      c: Clauses,
      /** Column → the value an insert leaving it UNSPECIFIED must write
        * (iceberg v3 `write-default`, r17) — the spec's rule for INSERT
        * clauses omitting a default-carrying column; an explicit SET
        * (even to null) always wins. Empty for delta (no such concept).
        */
      writeDefaults: Map[String, Any] = Map.empty): DataFrame = {
    val (and, sets) = c.notMatchedInsert.getOrElse(
      throw new IllegalArgumentException("MERGE: no NOT MATCHED clause"))
    val unmatched0 = source.alias(c.sourceAlias)
      .join(base.alias(c.targetAlias), expr(c.cond), "left_anti")
    val unmatched = and.map(a => unmatched0.filter(expr(a))).getOrElse(unmatched0)
    val bySet = sets.toMap
    val srcCols = source.schema.fieldNames.toSet
    // lineage-armed targets (r16): inserted rows carry NULL lineage —
    // the spec's inheritance mints their ids from the appended file's
    // assignment base, no write-time coordination needed
    val lineageNulls: Seq[Column] =
      if (!base.columns.contains("_row_id")) Seq.empty
      else Seq(lit(null).cast(LongType).as("_row_id"),
        lit(null).cast(LongType).as("_last_updated_sequence_number"))
    def defaultOrNull(name: String): Column =
      writeDefaults.get(name).map(v => lit(v)).getOrElse(lit(null))
    unmatched.select(schema.fields.toIndexedSeq.map { f =>
      (if (sets.isEmpty) // INSERT *: by name, absent → write-default/null
        (if (srcCols.contains(f.name)) col(f.name) else defaultOrNull(f.name))
      else bySet.get(f.name).map(expr).getOrElse(defaultOrNull(f.name)))
        .cast(f.dataType).as(f.name)
    } ++ lineageNulls: _*)
  }

  /** Change-feed rows for a merge, computed only when the target table
    * records one ([[Cdf]]): per matched row taking a clause, a `delete`
    * image or an `update_preimage`+`update_postimage` pair; per
    * not-matched source row, an `insert` image. Inserts anti-join the
    * CANDIDATE frame (see [[insertRows]]) so the insert-only fast path —
    * where nothing is touched — still records them.
    */
  def changesFor(source: DataFrame, c: Clauses)
      : Option[(DataFrame, DataFrame, StructType) => DataFrame] =
    Some { (touched, cands, schema) =>
      val inserts = c.notMatchedInsert.map(_ =>
        insertRows(cands, source, schema, c)
          .withColumn(Cdf.changeTypeCol, lit("insert")))
      val spark = touched.sparkSession
      val emptyChanges = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        Cdf.changeSchema(schema))
      if (c.matched.isEmpty && c.notBySource.isEmpty)
        inserts.getOrElse(emptyChanges)
      else {
        // the SAME ClausePlan projection rewrite commits from — change
        // rows are definitionally the pre/post views of that plan, so
        // the two can't drift (the dup guard already ran in rewrite)
        val plan = new ClausePlan(touched, source, schema, c, withUid = false)
        val acting = plan.withIdx.filter(col(clauseCol) >= 0)
        val pre = acting.select(plan.targetImage :+
          when(plan.isDelete, lit("delete")).otherwise(lit("update_preimage"))
            .as(Cdf.changeTypeCol): _*)
        val post = acting.filter(!plan.isDelete)
          .select(plan.postImage :+
            lit("update_postimage").as(Cdf.changeTypeCol): _*)
        val matchedChanges = pre.unionAll(post)
        inserts.map(matchedChanges.unionAll).getOrElse(matchedChanges)
      }
    }

  /** Touch-detect matcher for [[rewrite]]'s file plan: which candidate
    * rows would a clause act on? Matched-family clauses touch the rows
    * the source semi-joins to; NOT MATCHED BY SOURCE clauses touch the
    * anti-join side — the whole candidate set when any such clause is
    * unconditional (a full reconcile IS a full-table verb), else only
    * rows satisfying some clause condition.
    */
  def matcher(source: DataFrame, c: Clauses): DataFrame => DataFrame = df => {
    import org.apache.spark.sql.functions.{coalesce => cl}
    val t = df.alias(c.targetAlias)
    val s = source.alias(c.sourceAlias)
    val matchedRows = t.join(s, expr(c.cond), "left_semi")
    if (c.notBySource.isEmpty) matchedRows
    else if (c.notBySource.exists(_.and.isEmpty)) df
    else {
      val anti = t.join(s, expr(c.cond), "left_anti")
      val orCond = c.notBySource.flatMap(_.and)
        .map(a => cl(expr(a), lit(false))).reduce(_ || _)
      matchedRows.unionByName(anti.filter(orCond))
    }
  }

  /** Whether [[keyBoundsFilter]] pruning is sound for these clauses:
    * NOT MATCHED BY SOURCE must see every target row that is NOT in the
    * source, so any such clause disables source-bounds file pruning.
    */
  def pruneBySourceKeys(c: Clauses): Boolean = c.notBySource.isEmpty

  /** Target-side file-pruning filter from the ON condition's
    * equi-conjuncts: for each `t.col = s.col` (or `<=>`), the ACTUAL
    * min/max of the source keys become `col BETWEEN lo AND hi` — for
    * null-safe equality with null source keys, OR'd with `col IS NULL`
    * so null-keyed target files stay in the plan. Conservative and
    * optional — any shape it can't prove is simply not pruned on.
    */
  def keyBoundsFilter(spark: SparkSession, c: Clauses, source: DataFrame,
      schema: StructType): Option[String] = {
    def attr(e: Expression, alias: String): Option[String] = e match {
      case UnresolvedAttribute(Seq(q, n)) if q.equalsIgnoreCase(alias) => Some(n)
      case _ => None
    }
    def pairOf(l: Expression, r: Expression): Option[(String, String)] =
      attr(l, c.targetAlias).flatMap(tc => attr(r, c.sourceAlias).map(tc -> _))
        .orElse(attr(r, c.targetAlias).flatMap(tc => attr(l, c.sourceAlias).map(tc -> _)))
    // (targetCol, sourceCol, nullSafe)
    val pairs = StatsPruning.conjunctsOf(spark, c.cond).flatMap {
      case EqualTo(l, r) => pairOf(l, r).map { case (tc, sc) => (tc, sc, false) }
      case EqualNullSafe(l, r) => pairOf(l, r).map { case (tc, sc) => (tc, sc, true) }
      case _ => None
    }.filter { case (tc, sc, _) =>
      schema.fieldNames.contains(tc) && source.schema.fieldNames.contains(sc) }
    if (pairs.isEmpty) return None
    val aggs = pairs.flatMap { case (_, sc, _) => Seq(min(col(sc)), max(col(sc)),
      sum(when(col(sc).isNull, 1L).otherwise(0L))) }
    val row = source.agg(aggs.head, aggs.tail: _*).head()
    val conjuncts = pairs.zipWithIndex.flatMap { case ((tc, _, nullSafe), i) =>
      val (lo, hi) = (row.get(3 * i), row.get(3 * i + 1))
      val hasNullKey = nullSafe && !row.isNullAt(3 * i + 2) && row.getLong(3 * i + 2) > 0
      // min/max are null ⟺ EVERY source key is null (aggregates skip
      // nulls); only then may the conjunct collapse to IS NULL. A
      // renderable-type failure (litSql → None on a NON-null bound) must
      // emit NO conjunct instead — conflating the two would prune files
      // holding genuinely matching non-null keys (silent data loss)
      val allNull = row.isNullAt(3 * i) && row.isNullAt(3 * i + 1)
      val range = for {
        l <- Option(lo).flatMap(litSql)
        h <- Option(hi).flatMap(litSql)
      } yield s"$tc >= $l AND $tc <= $h"
      (range, hasNullKey) match {
        case (Some(r), true) => Some(s"(($r) OR $tc IS NULL)")
        case (Some(r), false) => Some(r)
        case (None, true) if allNull => Some(s"$tc IS NULL")
        case (None, _) => None // unrenderable bound type: don't prune on this pair
      }
    }
    Some(conjuncts.mkString(" AND ")).filter(_.nonEmpty)
  }

  /** MERGE clauses for a key-based upsert batch carrying
    * `__graft_deleted` ([[graft.streaming.Debezium.netBatch]]'s shape,
    * or any append batch with the flag columned in): deleted keys drop,
    * live matched keys update every non-key column, live unmatched keys
    * insert. Key equality is null-safe (group-by keys may be null).
    */
  def upsertClauses(keys: Seq[String], dataCols: Seq[String],
      uniqueByKey: Boolean = false): Clauses = {
    val cond = keys.map(k => s"t.`$k` <=> s.`$k`").mkString(" AND ")
    val nonKey = dataCols.filterNot(keys.contains)
    Clauses("t", "s", cond,
      MatchedClause(Some("s.`__graft_deleted`"), Right(())) +:
        (if (nonKey.isEmpty) Seq.empty
         else Seq(MatchedClause(None, Left(nonKey.map(c => c -> s"s.`$c`"))))),
      Some((Some("NOT s.`__graft_deleted`"), dataCols.map(c => c -> s"s.`$c`"))),
      sourceUniqueByKey = uniqueByKey)
  }

  /** One (micro-)batch of a MERGE-backed table sink (`merge_keys` on a
    * delta/iceberg sink): normalize the frame to net changes plus
    * `__graft_deleted` — retract/append streams via
    * [[graft.streaming.Debezium.netBatch]], append streams optionally
    * last-wins-deduped on `orderBy` — bootstrap the table on first
    * contact, then upsert. Replay-idempotent by construction (re-merging
    * the same net batch updates rows to the values they already hold and
    * re-deletes nothing), which is what makes it safe under
    * foreachBatch's at-least-once redelivery without a txn action.
    */
  def upsertBatch(spark: SparkSession, fmt: String, table: String,
      b: DataFrame, keys: Seq[String], orderBy: Option[String] = None,
      partitionBy: Seq[String] = Seq.empty,
      mergeSchema: Boolean = false,
      tableConf: Map[String, String] = Map.empty): Unit = {
    require(keys.nonEmpty, "merge_keys: at least one key column")
    val hasMeta = b.columns.contains("_updating_meta")
    val net0 =
      if (hasMeta) graft.streaming.Debezium.netBatch(b)
      else b.withColumn("__graft_deleted", lit(false))
    val net = orderBy match {
      case Some(ob) if !hasMeta =>
        // CDC-shaped append batch: keep the newest row per key so one
        // batch carrying several versions of a key can't trip the
        // multiple-source-rows error
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*).orderBy(col(ob).desc)
        net0.withColumn("__graft_rn", row_number().over(w))
          .filter(col("__graft_rn") === 1).drop("__graft_rn")
      case _ => net0 // netBatch is one-row-per-key by construction
    }
    val dataCols = net.columns.filterNot(_ == "__graft_deleted").toSeq
    keys.foreach(k => require(dataCols.contains(k),
      s"merge_keys: no column $k in the batch (have: ${dataCols.mkString(", ")})"))
    // the orderBy path keeps row 1 per window over EXACTLY these keys —
    // provably unique, skip the dup-guard job. netBatch is one row per
    // META id (PK/group-key hash), which only coincides with merge_keys
    // when the user picked the full key set — not provable here, so the
    // guard stays (it is what catches merge_keys ⊂ group keys loudly);
    // NOTE the window dedup never runs on meta-carrying batches, so
    // orderBy certifies nothing there.
    val clauses = upsertClauses(keys, dataCols,
      uniqueByKey = orderBy.isDefined && !hasMeta)
    val exists = fmt match {
      case "delta" => DeltaLog.snapshot(spark, table).isDefined
      case "iceberg" => IcebergLog.current(table).isDefined
      case other => throw new IllegalArgumentException(
        s"merge_keys: unsupported table format $other")
    }
    if (!exists) {
      val alive = net.filter(!col("__graft_deleted")).drop("__graft_deleted")
      fmt match {
        case "delta" => DeltaLog.writeBatch(alive, table, partitionBy = partitionBy,
          tableConf = tableConf)
        case _ =>
          IcebergLog.writeBatch(alive, table, partitionBy = partitionBy)
          if (tableConf.nonEmpty)
            IcebergLog.setTableProperties(spark, table, tableConf)
      }
      ()
    } else {
      // table properties the sink declares (change_feed='true',
      // upsert_enabled='true') must land on an EXISTING table too — a
      // metadata-only commit, exactly once; without this only
      // bootstrap-created tables got them
      if (tableConf.nonEmpty) fmt match {
        case "delta" => DeltaLog.setTableProperties(spark, table, tableConf)
        case _ => IcebergLog.setTableProperties(spark, table, tableConf); ()
      }
      // CDC feeds evolve: under merge_schema, columns the batch carries
      // that the table lacks are APPENDED (nullable, existing rows read
      // null) before the upsert — the same append-only evolution the
      // append sinks run, composed with MERGE. Shared-column TYPE drift
      // and case-variant collisions are errors in BOTH flag states (the
      // merge would otherwise cast drifted values to null silently);
      // batch-only columns without the flag are a loud drift error.
      val tableSchema = fmt match {
        case "delta" => DeltaLog.snapshot(spark, table).get.schema
        case _ => IcebergLog.current(table).get.schema
      }
      val batchSchema = org.apache.spark.sql.types.StructType(
        net.schema.fields.filterNot(_.name == "__graft_deleted"))
      val newCols = SchemaEvolution.resolveNewColumns(
        tableSchema, batchSchema, mergeSchema, table)
      if (newCols.nonEmpty) fmt match {
        case "delta" => DeltaLog.addColumns(spark, table, newCols)
        case _ => IcebergLog.addColumns(spark, table, newCols)
      }
      fmt match {
        case "delta" => DeltaLog.merge(spark, table, net, clauses)
        case _ =>
          // `write.upsert.enabled` (the public Flink-iceberg property):
          // land the batch as equality-delete + append WITHOUT reading
          // the target — O(batch) per commit whatever the table size.
          // The provably-unique cases skip the dup check exactly like
          // the MERGE path's guard.
          if (IcebergLog.current(table).exists(_.properties
              .get("write.upsert.enabled").exists(_.equalsIgnoreCase("true"))))
            IcebergLog.upsertAppend(spark, table, net, keys,
              checkUnique = !clauses.sourceUniqueByKey)
          else IcebergLog.merge(spark, table, net, clauses)
      }
      ()
    }
  }

  /** SQL literal for a bound value; None for types we won't render. */
  private def litSql(v: Any): Option[String] = v match {
    case n: Byte => Some(n.toString)
    case n: Short => Some(n.toString)
    case n: Int => Some(n.toString)
    case n: Long => Some(n.toString)
    case n: Float => Some(s"CAST('$n' AS FLOAT)")
    case n: Double => Some(s"CAST('$n' AS DOUBLE)")
    case d: java.math.BigDecimal => Some(d.toPlainString)
    case s: String => Some("'" + s.replace("'", "''") + "'")
    case b: Boolean => Some(b.toString)
    case d: java.sql.Date => Some(s"DATE '$d'")
    case t: java.sql.Timestamp =>
      // Timestamp.toString renders JVM-default-zone wall time, but the
      // literal parses in spark.sql.session.timeZone (GraftSession pins
      // UTC) — render the instant in UTC explicitly or the bounds shift
      // by the zone offset and pruning turns unsound
      val s = java.time.LocalDateTime
        .ofInstant(t.toInstant, java.time.ZoneOffset.UTC)
        .toString.replace('T', ' ')
      Some(s"TIMESTAMP '$s'")
    case _ => None
  }
}
