package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project, Window}

/** Window-functions-on-close — the reference's WindowFunction operator
  * (crates/arroyo-worker/src/arrow/window_fn.rs): an OVER whose PARTITION
  * BY includes the time window runs once per CLOSED window, after the
  * watermark seals it. Ditto re-aggregation of closed windows
  * (reinvoke_window_function.sql).
  *
  * Spark-first shape: Structured Streaming supports neither row-window
  * functions nor chained aggregations in a streaming query, but an
  * append-mode windowed aggregate already emits ALL rows of a window in
  * the micro-batch where the watermark closes it. So the plan splits at
  * the first (bottom-most) streaming Aggregate:
  *
  *   - below: runs as a normal streaming windowed aggregation (append
  *     mode, emit-on-close)
  *   - above (window functions, outer aggregates, filters): re-executed
  *     per micro-batch as plain BATCH operators over the closed-window
  *     rows — correct because each emitted window partition is complete
  *     within its batch, which is exactly the reference's
  *     fire-on-window-close contract
  *
  * The guard mirrors the reference planner: the OVER must partition by
  * the window column, otherwise batch-local evaluation would be wrong and
  * the query is rejected.
  */
object WindowFnOnClose {

  /** Split the analyzed plan if it needs (and supports) the
    * on-close pattern. Returns (streaming child, per-batch rest).
    * None = the plain streaming path handles this plan.
    */
  def split(spark: SparkSession, df: DataFrame): Option[(DataFrame, DataFrame => DataFrame)] = {
    if (!df.isStreaming) return None
    val plan = df.queryExecution.analyzed
    val aggs = plan.collect { case a: Aggregate => a }
    val wins = plan.collect { case w: Window => w }
    if (aggs.isEmpty) return None
    // a single aggregate and no window functions: Spark streams it natively
    if (wins.isEmpty && aggs.length <= 1) return None
    // pre-order collect ⇒ last Aggregate is the bottom-most of a chain
    val bottom = aggs.last
    // emit-on-close only exists for TIME-WINDOWED aggregates (append mode
    // fires when the watermark seals a window). A non-windowed bottom
    // aggregate is an updating stream — UpdatingSql's retraction chain
    // owns that shape (e.g. active_drivers.sql's nested updating agg)
    if (!bottom.groupingExpressions.exists(_.references.exists(r =>
        r.name == "window" || r.name == "session_window"))) return None
    // the split is only sound when every batch-side operator sits ABOVE the
    // streamed aggregate (a linear chain) — parallel aggregation branches
    // (e.g. join of two aggregates) keep the native path
    val others: Seq[LogicalPlan] = (aggs.dropRight(1): Seq[LogicalPlan]) ++ wins
    if (!others.forall(_.collectFirst { case n if n eq bottom => n }.isDefined)) return None
    // reference parity (window_fn.rs): OVER must partition by the window
    wins.foreach { w =>
      val ok = w.partitionSpec.exists(_.references.exists(r =>
        r.name == "window" || r.name == "session_window"))
      if (!ok) throw new IllegalArgumentException(
        "window functions in streaming queries must PARTITION BY the time window " +
          "(reference window_fn.rs fires per closed window)")
    }
    val childOut = bottom.output
    val child = GraftSqlBridge.ofRows(spark, bottom)
    val rest = (batch: DataFrame) => {
      val bplan = batch.queryExecution.analyzed
      // the batch frame carries the child's schema in order: remap the
      // upper plan's references onto the batch's fresh exprIds
      val mapping: Map[Long, Attribute] =
        childOut.map(_.exprId.id).zip(bplan.output).toMap
      val swapped = plan.transformUp { case n if n eq bottom => bplan }
        .transformAllExpressions {
          case a: AttributeReference => mapping.getOrElse(a.exprId.id, a)
        }
      GraftSqlBridge.ofRows(spark, swapped)
    }
    Some((child, rest))
  }

  /** PARALLEL stateful branches Spark can't chain in one streaming query
    * (e.g. windowed_outer_join.sql: a FULL OUTER join of two windowed
    * aggregates — Spark rejects outer stream-stream joins whose keys are
    * aggregate outputs). The reference wires such branches with shuffle
    * edges; our durable analogue: stream each bottom-most windowed
    * aggregate to its own parquet spool (append mode, emit-on-close),
    * then run everything above the spools — the join included — as one
    * BATCH over the closed windows. Every emitted window is sealed by
    * the watermark, so batch evaluation over the spool is exactly the
    * reference's fire-on-close semantics; with AvailableNow triggers the
    * spools are complete when the batch runs.
    *
    * Returns the rebuilt BATCH frame, or None when the plan has neither
    * windowed bottom aggregates nor spoolable bottom joins (r8 — see the
    * join fallback inside), or something streaming remains outside them
    * (then the native error stands).
    */
  /** @param alignFrontiers when true, truncate every spool to the minimum
    *   common closed-window frontier (reference min-watermark semantics for
    *   legs whose watermarks stopped at different points). Pass false when
    *   every source flushed at end of input (Pipeline's EndOfData sentinel):
    *   all legs are then COMPLETE, and truncating to min(max(window.end))
    *   would drop legitimate final windows on legs that simply have no data
    *   in them (e.g. the outer-join leg with the last lonely window).
    */
  def spoolBranches(spark: SparkSession, df: DataFrame,
      alignFrontiers: Boolean = true): Option[DataFrame] = {
    if (!df.isStreaming) return None
    val plan = df.queryExecution.analyzed
    val aggBottoms: Seq[LogicalPlan] = plan.collect {
      case a: Aggregate if a.groupingExpressions.exists(_.references.exists(r =>
          r.name == "window" || r.name == "session_window")) &&
        a.child.collectFirst { case x: Aggregate => x }.isEmpty => a
    }
    // r8 (nexmark q6 shape): an interval join under NESTED UNWINDOWED
    // aggregates / window functions has no windowed aggregate to spool,
    // but the bottom-most stream-stream JOIN itself streams natively in
    // append mode. Spool the join output and run everything above it as
    // one batch — the same fire-on-close contract, keyed on the join
    // instead of a window.
    if (aggBottoms.isEmpty) {
      return spoolStreamJoins(spark, plan, streamingReadback = false)
        .map(p => GraftSqlBridge.ofRows(spark, p))
        .filterNot(_.isStreaming)
    }
    val bottoms: Seq[LogicalPlan] = aggBottoms
    // each replacement re-exposes the ORIGINAL output attribute ids via an
    // aliasing Project, so nothing above needs rewriting. (A global
    // id→new-attr map would cross-wire branches: grouping attributes keep
    // their source exprIds, and parallel branches over the same source
    // share those ids — the probe case had both join legs emitting
    // driver_id#1.)
    val spooled: Seq[(LogicalPlan, org.apache.spark.sql.DataFrame, Option[String])] =
      bottoms.map { bottom =>
        val dir = SpoolDirs.create("graft-spool").toString
        // spool under POSITIONAL names: a join's legs can both emit the
        // same column name (q4's A.dt/B.dt), which the parquet writer
        // rejects; the restore Project below aliases everything back to
        // the original names and exprIds, so nothing above notices
        val renamed = Project(bottom.output.zipWithIndex.map {
          case (a, i) => Alias(a, s"__spool_$i")()
        }, bottom)
        val child = GraftSqlBridge.ofRows(spark, renamed)
        val q = child.writeStream.outputMode("append")
          .option("checkpointLocation", s"$dir/cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", s"$dir/data").start()
        q.awaitTermination()
        val back = spark.read.schema(child.schema).parquet(s"$dir/data")
        val winIdx = bottom.output.indexWhere(o =>
          o.name == "window" || o.name == "session_window")
        val winCol = if (winIdx >= 0) Some(s"__spool_$winIdx") else None
        (bottom, back, winCol)
      }
    // each spool closed windows up to ITS leg's watermark; the reference
    // propagates the MIN watermark across a node's inputs
    // (WatermarkHolder, crates/arroyo-operator/src/context.rs:36-90), so
    // joining legs with different frontiers would fabricate half-null
    // rows for windows one leg hasn't closed. Align every spool to the
    // minimum common closed frontier first.
    val frontiers =
      if (!alignFrontiers) Seq.empty
      else spooled.flatMap { case (_, back, winCol) =>
        winCol.map { w =>
          val r = back.agg(org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.col(s"$w.end"))).head()
          if (r.isNullAt(0)) java.sql.Timestamp.from(java.time.Instant.EPOCH)
          else r.getTimestamp(0)
        }
      }
    val common =
      if (frontiers.isEmpty) None
      else Some(frontiers.minBy(_.getTime))
    val replaced: Seq[(LogicalPlan, LogicalPlan)] = spooled.map { case (bottom, back, winCol) =>
      val aligned = (winCol, common) match {
        case (Some(w), Some(f)) if spooled.length > 1 =>
          back.filter(org.apache.spark.sql.functions.col(s"$w.end") <=
            org.apache.spark.sql.functions.lit(f))
        case _ => back
      }
      val bplan = aligned.queryExecution.analyzed
      val restored = Project(
        bplan.output.zip(bottom.output).map { case (nw, old) =>
          Alias(nw, old.name)(exprId = old.exprId, qualifier = old.qualifier)
        }, bplan)
      bottom -> restored
    }
    val rebuilt = plan.transformUp {
      case n if replaced.exists(_._1 eq n) => replaced.find(_._1 eq n).get._2
    }
    val out = GraftSqlBridge.ofRows(spark, rebuilt)
    if (out.isStreaming) None else Some(out)
  }

  /** Durable JOIN edge (r8): spool every bottom-most stream-stream join
    * of `plan` to parquet (append mode — inner joins emit eagerly on
    * match, so under AvailableNow the spool is complete at end of input
    * regardless of watermark) and replace it with a read of the spool:
    * a BATCH read (`streamingReadback = false`, the q6-shape path — the
    * rest of the plan evaluates as one batch over the closed join) or a
    * STREAMING file-source read (`streamingReadback = true` — the
    * nexmark-q4 shape, where [[UpdatingSql]]'s retraction chain must
    * keep running in update mode ABOVE the join Spark won't allow inside
    * an update-mode query). The spark-native analogue of the reference's
    * shuffle edge between a join operator and downstream updating
    * aggregates. Returns None when the plan has no qualifying join.
    */
  private[graft] def spoolStreamJoins(spark: SparkSession, plan: LogicalPlan,
      streamingReadback: Boolean): Option[LogicalPlan] = {
    val joins = plan.collect {
      case j: Join if j.left.isStreaming && j.right.isStreaming &&
        j.collectFirst { case a: Aggregate => a }.isEmpty &&
        j.collectFirst { case w: Window => w }.isEmpty => j
    }
    // keep only OUTERMOST qualifying joins (pre-order collect lists outer
    // before inner; a nested join is spooled via its ancestor)
    val outer = joins.foldLeft(Seq.empty[LogicalPlan]) { (kept, j) =>
      if (kept.exists(_.collectFirst { case n if n eq j => n }.isDefined)) kept
      else kept :+ j
    }
    if (outer.isEmpty) return None
    val replaced: Seq[(LogicalPlan, LogicalPlan)] = outer.map { bottom =>
      val dir = SpoolDirs.create("graft-join-spool").toString
      // positional spool names: a join's legs can both emit the same
      // column name (q4's A.dt/B.dt), which the parquet writer rejects
      val renamed = Project(bottom.output.zipWithIndex.map {
        case (a, i) => Alias(a, s"__spool_$i")()
      }, bottom)
      val child = GraftSqlBridge.ofRows(spark, renamed)
      val q = child.writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", s"$dir/data").start()
      q.awaitTermination()
      val back =
        if (streamingReadback)
          spark.readStream.schema(child.schema).parquet(s"$dir/data")
        else spark.read.schema(child.schema).parquet(s"$dir/data")
      val bplan = back.queryExecution.analyzed
      val restored = Project(
        bplan.output.zip(bottom.output).map { case (nw, old) =>
          Alias(nw, old.name)(exprId = old.exprId, qualifier = old.qualifier)
        }, bplan)
      bottom -> restored
    }
    Some(plan.transformUp {
      case n if replaced.exists(_._1 eq n) => replaced.find(_._1 eq n).get._2
    })
  }
}
