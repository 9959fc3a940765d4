package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, GraftSqlBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.aggregate.ScalaAggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** SQL-path updating aggregates: translates a non-windowed aggregation
  * plan — including scalar expressions AROUND the aggregate calls, a
  * Filter/Project stack above it (HAVING / post-agg WHERE), global (no
  * GROUP BY) aggregates, `count(distinct …)`, the full every_aggregate
  * battery (bit/bool ops, median/percentiles, corr/covar/regr_*), and
  * aggregates whose INPUT is itself updating (an unrolled CDC source or a
  * nested updating aggregate) — into the generalized retraction operator
  * ([[updatingAggRows]]), so `INSERT INTO <debezium sink> SELECT …` emits
  * true retract+append pairs like the reference's UpdatingAggregate
  * (crates/arroyo-worker/src/arrow/incremental_aggregator.rs; retractable
  * accumulators :117-119).
  *
  * Numerics: single-input moments and two-input co-moments accumulate
  * SHIFTED by the first value each key observes (`offA`/`offB`), so
  * `Σ(x−o)² − (Σ(x−o))²/n` stays catastrophic-cancellation-free for
  * epoch-sized inputs while remaining exactly retractable by subtraction
  * (a Welford recurrence is stable but not cleanly reversible).
  *
  * Retraction-aware inputs subtract from the accumulators, which works
  * for everything except min/max and bit_and/bit_or (those need the full
  * value multiset); [[translateAgg]] rejects those combinations explicitly
  * rather than emitting silently wrong results.
  */
object UpdatingSql extends Serializable {

  /** Per-thread MD5 — `emit` runs in the stateful-operator hot path (two
    * rows per state change), so the digest instance must not be allocated
    * per row. Thread-local because executor task threads share the object.
    */
  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private[streaming] def md5Hex(s: String): String = {
    val d = md5Local.get()
    d.reset()
    d.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  /** Unambiguous rendering of a composite key for the pairing id.
    * Row.toString joins fields with ',' and no escaping, so keys
    * ("a,b") and ("a","b") would collide — and Debezium.rollBatch groups
    * envelopes by this id, so a collision merges two keys' events into
    * one `u` record. Length-prefix every field (with a distinct marker
    * for NULL vs the string "null"), mirroring the reference's multi_hash
    * over primary-key values (physical.rs:930-940).
    */
  private[graft] def frameKey(key: Row): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < key.length) {
      if (key.isNullAt(i)) sb.append("n;")
      else {
        val s = String.valueOf(key.get(i))
        sb.append(s.length).append(':').append(s)
      }
      i += 1
    }
    sb.toString
  }

  sealed trait Kind extends Serializable
  case object KCountStar extends Kind
  case object KCount extends Kind
  case object KSum extends Kind
  case object KMin extends Kind
  case object KMax extends Kind
  case object KAvg extends Kind
  // variance family rides (count, Σx, Σx²) — the same retractable shape
  // the reference gets from DataFusion's sliding accumulators
  case object KVarPop extends Kind
  case object KVarSamp extends Kind
  case object KStddevPop extends Kind
  case object KStddevSamp extends Kind
  // count(distinct x): per-value multiplicity map (DataFusion's distinct
  // accumulator keeps the same set; retract decrements)
  case object KDistinct extends Kind
  case object KBitAnd extends Kind
  case object KBitOr extends Kind
  case object KBitXor extends Kind // xor is self-inverse ⇒ retractable
  case object KBoolAnd extends Kind // true/false counters ⇒ retractable
  case object KBoolOr extends Kind
  /** Exact interpolated percentile (Spark Percentile semantics; median =
    * KPct(0.5)). State = value→count multiset, like DataFusion's median
    * accumulator.
    */
  final case class KPct(p: Double) extends Kind
  /** approx_percentile_cont_with_weight with the reference's observable
    * threshold rule (see graft.functions.Udafs.weightedPercentileCont):
    * ascending cumulative WEIGHT crossing `p × row-count`.
    */
  final case class KPctW(p: Double) extends Kind
  // two-input co-moment family (first arg = y, second = x)
  case object KCorr extends Kind
  case object KCovarPop extends Kind
  case object KCovarSamp extends Kind
  case object KRegrCount extends Kind
  case object KRegrAvgX extends Kind
  case object KRegrAvgY extends Kind
  case object KRegrSlope extends Kind
  case object KRegrIntercept extends Kind
  case object KRegrR2 extends Kind
  case object KRegrSxx extends Kind
  case object KRegrSyy extends Kind
  case object KRegrSxy extends Kind

  private def isTwoInput(k: Kind): Boolean = k match {
    case KCorr | KCovarPop | KCovarSamp | KRegrCount | KRegrAvgX | KRegrAvgY |
         KRegrSlope | KRegrIntercept | KRegrR2 | KRegrSxx | KRegrSyy | KRegrSxy |
         KPctW(_) => true
    case _ => false
  }

  /** Kinds whose accumulator cannot subtract an input row. */
  private def nonRetractable(k: Kind): Boolean = k match {
    case KMin | KMax | KBitAnd | KBitOr => true
    case _ => false
  }

  /** Generalized per-key accumulator: one slot per aggregate spec.
    * Fixed-width per key for the scalar family; `num` (value→count or
    * value→Σweight) backs order statistics and `dst` backs distinct —
    * those scale with per-key distinct values, inherent to the exact
    * semantics (DataFusion's median/distinct accumulators hold the same).
    */
  case class AccG(rows: Long, cnt: Array[Long],
      sum: Array[Double], sq: Array[Double],
      lo: Array[Double], hi: Array[Double],
      sumB: Array[Double], sqB: Array[Double], sumAB: Array[Double],
      offA: Array[Double], offB: Array[Double],
      bits: Array[Long], nF: Array[Long],
      num: Array[Map[Double, Double]], dst: Array[Map[String, Long]])

  private val accEncoder = Encoders.product[AccG]

  /** Attempt the rewrite; None = plan shape not supported (caller falls
    * back to plain update-mode aggregation). Throws when the plan
    * aggregates an UPDATING input in a shape we can't retract — falling
    * back would silently treat retractions as insertions.
    */
  def translate(df: DataFrame, ttl: Option[java.time.Duration]): Option[DataFrame] = {
    val spark = df.sparkSession
    val analyzed = df.queryExecution.analyzed
    translateUpdating(analyzed, ttl, spark).map { frame =>
      val cols = analyzed.output.map(a => col(s"`__e_${a.exprId.id}`").as(a.name)) :+
        col("_updating_meta")
      frame.select(cols: _*)
    }
  }

  /** Re-attach `_updating_meta` after a user projection dropped it: a
    * `SELECT id, v FROM cdc` over an unrolled CDC source projects only
    * the named columns, but a MERGE-backed table sink (and a faithful
    * debezium re-emit) needs the retract flags. Rebuilds a
    * Project/Filter/SubqueryAlias stack over a meta-carrying child with
    * the meta column appended — the reference auto-propagates its hidden
    * column through these nodes (plan/mod.rs:266-305). None when some
    * deeper node (aggregate, join) severed the lineage.
    */
  def propagateMeta(df: DataFrame): Option[DataFrame] = {
    val spark = df.sparkSession
    def rec(plan: LogicalPlan): Option[DataFrame] =
      if (plan.output.exists(_.name == "_updating_meta"))
        Some(GraftSqlBridge.ofRows(spark, plan))
      else plan match {
        case SubqueryAlias(_, child) => rec(child)
        case Project(pl, child) => rec(child).map { cdf =>
          val outs = pl.map(ne => GraftSqlBridge.colOf(ne).as(ne.name))
          cdf.select(outs :+ col("_updating_meta"): _*)
        }
        case Filter(cond, child) =>
          rec(child).map(_.filter(GraftSqlBridge.colOf(cond)))
        case _ => None
      }
    if (df.columns.contains("_updating_meta")) Some(df)
    else rec(df.queryExecution.analyzed)
  }

  /** Recursively translate a SubqueryAlias/Project/Filter stack over one
    * or more nested Aggregates into an updating frame whose data columns
    * are named `__e_<exprId>` (one per plan-output attribute) plus a
    * trailing `_updating_meta`. Filters apply to retract and append rows
    * alike — both carry the row values the predicate needs, so a state
    * change whose old value passed and new value doesn't emits only the
    * retract (and vice versa), exactly the reference's semantics for
    * filters over updating streams (HAVING / post-agg WHERE).
    */
  private def translateUpdating(plan: LogicalPlan, ttl: Option[java.time.Duration],
      spark: SparkSession): Option[DataFrame] = plan match {
    case SubqueryAlias(_, child) => translateUpdating(child, ttl, spark)
    case agg: Aggregate => translateAgg(agg, ttl, spark)
    case Project(pl, child) =>
      translateUpdating(child, ttl, spark).flatMap { cdf =>
        val outs = pl.map { ne =>
          val body = ne match { case Alias(c, _) => c; case e => e }
          GraftSqlBridge.colOf(remapAttrs(body)).as(s"__e_${ne.exprId.id}")
        }
        Some(cdf.select(outs :+ col("_updating_meta"): _*))
      }
    case Filter(cond, child) =>
      translateUpdating(child, ttl, spark).map { cdf =>
        cdf.filter(GraftSqlBridge.colOf(remapAttrs(cond)))
      }
    case _ => None
  }

  /** Attribute references → the `__e_<exprId>` columns of a translated
    * child frame.
    */
  private def remapAttrs(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute(Seq(s"__e_${a.exprId.id}"))
  }

  /** Durable operator edge between two stateful updating operators.
    *
    * Spark rejects chained flatMapGroupsWithState in update mode, so a
    * nested updating aggregate (reference: UpdatingAggregate feeding
    * UpdatingAggregate, e.g. active_drivers.sql) cannot run as one
    * streaming query. The reference connects such operators with a
    * network shuffle edge (LogicalEdge::Shuffle); the Spark-native
    * analogue of a durable inter-operator channel is a spool directory:
    * the inner operator streams its retract/append rows (payload +
    * `__r` flag) to files, and the outer operator reads them back as its
    * own streaming source with full per-row fidelity.
    *
    * Bounded (AvailableNow) semantics: the inner query runs to completion
    * here — every Pipeline trigger is AvailableNow. An always-on variant
    * would start the inner query without awaiting; the file source tails
    * the spool.
    */
  private def relay(frame: DataFrame, spark: SparkSession): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-relay").toString
    val spool = s"$dir/spool"
    val payload = StructType(frame.schema.fields.filterNot(_.name == "_updating_meta"))
    new java.io.File(spool).mkdirs()
    val q = frame
      .withColumn("__r", col("_updating_meta.is_retract")).drop("_updating_meta")
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$dir/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch((b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        b.toDF().write.mode("append").json(spool))
      .start()
    q.awaitTermination()
    val rSchema = StructType(payload.fields :+ StructField("__r", BooleanType))
    spark.readStream.schema(rSchema).json(spool)
      .select(payload.fieldNames.map(n => col(s"`$n`")).toIndexedSeq :+
        struct(col("__r").as("is_retract"), lit("").as("id")).as("_updating_meta"): _*)
  }

  private def foldDouble(e: Expression): Option[Double] =
    if (!e.foldable) None
    else e.eval() match {
      case d: Double => Some(d)
      case f: Float => Some(f.toDouble)
      case dec: org.apache.spark.sql.types.Decimal => Some(dec.toDouble)
      case n: Number => Some(n.doubleValue())
      case _ => None
    }

  private def translateAgg(agg: Aggregate, ttl: Option[java.time.Duration],
      spark: SparkSession): Option[DataFrame] = {
    if (agg.groupingExpressions.exists(_.references.exists(r =>
        r.name == "window" || r.name == "session_window"))) return None

    // the aggregate's input: a nested updating sub-plan (translated
    // recursively, connected through the relay), or a stateless child —
    // itself updating when it carries an unrolled CDC source's
    // _updating_meta column
    val nested = agg.child.collectFirst { case a: Aggregate => a }.isDefined
    val (childDf0, fix, updatingInput): (DataFrame, Expression => Expression, Boolean) =
      if (nested) {
        translateUpdating(agg.child, ttl, spark) match {
          case Some(c) => (relay(c, spark), remapAttrs _, true)
          case None => return None
        }
      } else {
        val upd = agg.child.output.exists(_.name == "_updating_meta")
        // r8 (nexmark q4 shape): an updating aggregate over a
        // stream-stream (interval) join — Spark rejects the join inside
        // an update-mode query, so spool the join durably first (append
        // mode, eager inner-join emission) and aggregate over the
        // spool's STREAMING read-back; the retraction chain above keeps
        // its true incremental update semantics
        val childPlan =
          if (agg.child.isStreaming)
            WindowFnOnClose.spoolStreamJoins(spark, agg.child,
              streamingReadback = true).getOrElse(agg.child)
          else agg.child
        (GraftSqlBridge.ofRows(spark, childPlan), identity[Expression] _, upd)
      }

    val groupings = agg.groupingExpressions
    // (kind, primary input, secondary input)
    val specs = scala.collection.mutable.ArrayBuffer.empty[(Kind, Expression, Option[Expression])]

    def specFor(ae: AggregateExpression): Option[Int] = {
      if (ae.filter.nonEmpty) return None
      val ki: Option[(Kind, Expression, Option[Expression])] = ae.aggregateFunction match {
        case Count(Seq(e)) if ae.isDistinct => Some((KDistinct, e, None))
        case _ if ae.isDistinct => None
        case Count(Seq(Literal(_, _))) => Some((KCountStar, Literal(1), None))
        case Count(Seq(e)) => Some((KCount, e, None))
        case Sum(e, _) => Some((KSum, e, None))
        case Min(e) => Some((KMin, e, None))
        case Max(e) => Some((KMax, e, None))
        case Average(e, _) => Some((KAvg, e, None))
        case VariancePop(e, _) => Some((KVarPop, e, None))
        case VarianceSamp(e, _) => Some((KVarSamp, e, None))
        case StddevPop(e, _) => Some((KStddevPop, e, None))
        case StddevSamp(e, _) => Some((KStddevSamp, e, None))
        case b: BitAndAgg => Some((KBitAnd, b.child, None))
        case b: BitOrAgg => Some((KBitOr, b.child, None))
        case b: BitXorAgg => Some((KBitXor, b.child, None))
        case b: BoolAnd => Some((KBoolAnd, b.child, None))
        case b: BoolOr => Some((KBoolOr, b.child, None))
        case m: Median => Some((KPct(0.5), m.child, None))
        case p: Percentile =>
          (foldDouble(p.percentageExpression), foldDouble(p.frequencyExpression)) match {
            case (Some(pv), Some(1.0)) => Some((KPct(pv), p.child, None))
            case _ => None
          }
        case c: Corr => Some((KCorr, c.children(0), Some(c.children(1))))
        case c: CovPopulation => Some((KCovarPop, c.children(0), Some(c.children(1))))
        case c: CovSample => Some((KCovarSamp, c.children(0), Some(c.children(1))))
        case r: RegrCount => Some((KRegrCount, r.children(0), Some(r.children(1))))
        case r: RegrAvgX => Some((KRegrAvgX, r.children(0), Some(r.children(1))))
        case r: RegrAvgY => Some((KRegrAvgY, r.children(0), Some(r.children(1))))
        case r: RegrSlope => Some((KRegrSlope, r.children(0), Some(r.children(1))))
        case r: RegrIntercept => Some((KRegrIntercept, r.children(0), Some(r.children(1))))
        case r: RegrR2 => Some((KRegrR2, r.children(0), Some(r.children(1))))
        case r: RegrSXX => Some((KRegrSxx, r.children(0), Some(r.children(1))))
        case r: RegrSYY => Some((KRegrSyy, r.children(0), Some(r.children(1))))
        case r: RegrSXY => Some((KRegrSxy, r.children(0), Some(r.children(1))))
        case sa: ScalaAggregator[_, _, _]
            if (sa.agg eq graft.functions.Udafs.weightedPercentileCont) ||
              sa.aggregatorName.contains("approx_percentile_cont_with_weight") =>
          // children = (value, weight, p-literal)
          foldDouble(sa.children(2)).map(p => (KPctW(p), sa.children(0), Some(sa.children(1))))
        case _ => None
      }
      ki.flatMap { case (k, in, in2) =>
        if (updatingInput && nonRetractable(k))
          throw new IllegalArgumentException(
            s"$k over an updating (CDC or nested-aggregate) input is not " +
              "retractable without the full value multiset; rewrite the query " +
              "or aggregate an append-only stream (reference retracts via " +
              "DataFusion sliding accumulators, incremental_aggregator.rs:117)")
        specs += ((k, in, in2))
        Some(specs.length - 1)
      }
    }

    // rewrite each SELECT-list expression onto the operator's emitted
    // __k_<i>/__a_<j> columns; scalar expressions around the aggregate
    // calls (e.g. `sum(q + 5) + 10`, `round(avg(x), 4)`) survive as-is
    def rewriteOut(e: Expression): Option[Expression] = {
      val gi = groupings.indexWhere(g => e.semanticEquals(g))
      if (gi >= 0) Some(UnresolvedAttribute(Seq(s"__k_$gi")))
      else e match {
        case ae: AggregateExpression => specFor(ae).map(j => UnresolvedAttribute(Seq(s"__a_$j")))
        case _: AttributeReference => None // raw input column outside any aggregate
        case _ if e.children.isEmpty => Some(e)
        case _ =>
          val kids = e.children.map(rewriteOut)
          if (kids.exists(_.isEmpty)) None
          else Some(e.withNewChildren(kids.map(_.get)))
      }
    }

    val outExprs: Seq[(String, Expression)] = agg.aggregateExpressions.map { ne =>
      val body = ne match { case Alias(c, _) => c; case e => e }
      rewriteOut(body) match {
        case Some(re) => (s"__e_${ne.exprId.id}", re)
        case None =>
          if (updatingInput) throw new IllegalArgumentException(
            s"cannot aggregate an updating input with non-retractable expression $ne")
          return None
      }
    }
    if (specs.isEmpty) return None

    // project the child to [keys…, values…, secondaries…, __r]: a global
    // aggregate gets one synthetic constant key (keyed state needs ≥1 key
    // column; the reference's global UpdatingAggregate likewise runs
    // single-keyed)
    val keyExprs: Seq[Expression] =
      if (groupings.isEmpty) Seq(Literal(0)) else groupings
    val keyCols = keyExprs.zipWithIndex.map { case (g, i) =>
      GraftSqlBridge.colOf(fix(g)).as(s"__k_$i")
    }
    val valCols = specs.toSeq.zipWithIndex.map { case ((k, in, _), j) =>
      k match {
        case KDistinct =>
          GraftSqlBridge.colOf(Cast(fix(in), StringType)).as(s"__v_$j")
        case KBitAnd | KBitOr | KBitXor =>
          GraftSqlBridge.colOf(Cast(fix(in), LongType)).as(s"__v_$j")
        case KBoolAnd | KBoolOr =>
          GraftSqlBridge.colOf(Cast(fix(in), BooleanType)).as(s"__v_$j")
        case KCountStar => lit(1.0).as(s"__v_$j")
        case KCount =>
          // only null-ness matters; avoid ANSI cast failures on non-numerics
          val c = GraftSqlBridge.colOf(fix(in))
          when(c.isNull, lit(null)).otherwise(lit(1.0)).cast("double").as(s"__v_$j")
        case _ =>
          GraftSqlBridge.colOf(Cast(fix(in), DoubleType)).as(s"__v_$j")
      }
    }
    val secCols = specs.toSeq.zipWithIndex.collect { case ((k, _, Some(in2)), j) =>
      GraftSqlBridge.colOf(Cast(fix(in2), DoubleType)).as(s"__w_$j")
    }
    val rCol =
      if (updatingInput) col("_updating_meta.is_retract").as("__r")
      else lit(false).as("__r")
    val child = childDf0.select(keyCols ++ valCols ++ secCols :+ rCol: _*)

    val result = updatingAggRows(child, keyExprs.length, specs.toSeq.map(_._1), ttl)

    val outCols = outExprs.map { case (n, e) => GraftSqlBridge.colOf(e).as(n) } :+
      col("_updating_meta")
    Some(result.select(outCols: _*))
  }

  /** Spark Percentile semantics over a value→count multiset: 0-based rank
    * `p × (n−1)`, linear interpolation between the two enclosing values.
    */
  private def interpolatedPct(m: Map[Double, Double], p: Double): Any = {
    if (m.isEmpty) return null
    val sorted = m.toArray.sortBy(_._1)
    val n = sorted.map(_._2).sum
    if (n <= 0) return null
    val pos = p * (n - 1)
    val lo = math.floor(pos)
    def valueAt(rank: Double): Double = {
      var cum = 0.0
      var i = 0
      while (i < sorted.length) {
        cum += sorted(i)._2
        if (cum > rank) return sorted(i)._1
        i += 1
      }
      sorted.last._1
    }
    val lower = valueAt(lo)
    if (pos == lo) lower
    else lower + (valueAt(lo + 1) - lower) * (pos - lo)
  }

  /** The reference's observable weighted-percentile rule (see
    * Udafs.weightedPercentileCont): ascending cumulative WEIGHT crossing
    * `p × row-count`, no interpolation.
    */
  private def thresholdPct(m: Map[Double, Double], p: Double, rowCount: Long): Any = {
    if (m.isEmpty || rowCount == 0) return null
    val sorted = m.toArray.sortBy(_._1)
    val threshold = p * rowCount
    var cum = 0.0
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= threshold) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }

  /** The generalized retraction operator: child must be projected as
    * `__k_0…__k_{numKeys-1}`, one `__v_j` per spec (StringType for
    * KDistinct, LongType for bit ops, BooleanType for bool ops, DoubleType
    * otherwise), a `__w_j` per two-input spec, plus an optional trailing
    * BooleanType `__r` (input-row retraction flag). Emits `__k_*`, `__a_*`
    * and `_updating_meta{is_retract,id}` rows; every state change emits
    * retract(old)+append(new); a key whose net row count reaches zero
    * emits only the retract and drops its state.
    */
  def updatingAggRows(child: DataFrame, numKeys: Int, kinds: Seq[Kind],
      ttl: Option[java.time.Duration]): DataFrame = {
    val keyFields = child.schema.fields.take(numKeys)
    val keySchema = StructType(keyFields)
    def outType(k: Kind): DataType = k match {
      case KCountStar | KCount | KDistinct | KRegrCount => LongType
      case KBitAnd | KBitOr | KBitXor => LongType
      case KBoolAnd | KBoolOr => BooleanType
      case _ => DoubleType
    }
    val outSchema = StructType(
      keyFields ++
        kinds.zipWithIndex.map { case (k, j) => StructField(s"__a_$j", outType(k)) } :+
        StructField("_updating_meta", StructType(Seq(
          StructField("is_retract", BooleanType, nullable = false),
          StructField("id", StringType)))))

    implicit val keyEnc: Encoder[Row] = RowEncoder.encoderFor(keySchema)
    implicit val rowEnc: Encoder[Row] = RowEncoder.encoderFor(child.schema)
    implicit val outEnc: Encoder[Row] = RowEncoder.encoderFor(outSchema)

    val nSpecs = kinds.length
    val rIdx = child.columns.indexOf("__r") // -1 = append-only child
    val wIdx: Array[Int] = Array.tabulate(nSpecs)(j => child.columns.indexOf(s"__w_$j"))
    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout

    // centered population variance from (n, Σx, Σx²); clamped at 0
    // against floating-point cancellation
    def varPop(acc: AccG, j: Int): Double = {
      val n = acc.cnt(j).toDouble
      val m = acc.sum(j) / n
      math.max(0.0, acc.sq(j) / n - m * m)
    }
    def sxx(acc: AccG, j: Int): Double = acc.sqB(j) - acc.sumB(j) * acc.sumB(j) / acc.cnt(j)
    def syy(acc: AccG, j: Int): Double = acc.sq(j) - acc.sum(j) * acc.sum(j) / acc.cnt(j)
    def sxy(acc: AccG, j: Int): Double = acc.sumAB(j) - acc.sum(j) * acc.sumB(j) / acc.cnt(j)

    def value(acc: AccG, j: Int): Any = {
      val n = acc.cnt(j)
      kinds(j) match {
        case KCountStar => acc.rows
        case KCount => n
        case KDistinct => acc.dst(j).size.toLong
        case KSum => if (n == 0) null else acc.sum(j) + acc.offA(j) * n
        case KMin => if (n == 0) null else acc.lo(j)
        case KMax => if (n == 0) null else acc.hi(j)
        // restore the shift INSIDE the division: (Σ' + n·o)/n is the
        // plain Σ/n (bit-exact vs batch for integer inputs), whereas
        // o + Σ'/n rounds twice and drifts ulps (nexmark q4 parity)
        case KAvg => if (n == 0) null else (acc.sum(j) + acc.offA(j) * n) / n
        case KVarPop => if (n == 0) null else varPop(acc, j)
        case KStddevPop => if (n == 0) null else math.sqrt(varPop(acc, j))
        case KVarSamp =>
          if (n < 2) null else varPop(acc, j) * n / (n - 1).toDouble
        case KStddevSamp =>
          if (n < 2) null else math.sqrt(varPop(acc, j) * n / (n - 1).toDouble)
        case KBitAnd | KBitOr | KBitXor => if (n == 0) null else acc.bits(j)
        case KBoolAnd => if (n == 0) null else acc.nF(j) == 0
        case KBoolOr => if (n == 0) null else (n - acc.nF(j)) > 0
        case KPct(p) => interpolatedPct(acc.num(j), p)
        case KPctW(p) => thresholdPct(acc.num(j), p, n)
        case KRegrCount => n
        case KRegrAvgX => if (n == 0) null else (acc.sumB(j) + acc.offB(j) * n) / n
        case KRegrAvgY => if (n == 0) null else (acc.sum(j) + acc.offA(j) * n) / n
        case KRegrSxx => if (n == 0) null else sxx(acc, j)
        case KRegrSyy => if (n == 0) null else syy(acc, j)
        case KRegrSxy => if (n == 0) null else sxy(acc, j)
        case KRegrSlope =>
          if (n == 0 || sxx(acc, j) == 0) null else sxy(acc, j) / sxx(acc, j)
        case KRegrIntercept =>
          if (n == 0 || sxx(acc, j) == 0) null
          else {
            val slope = sxy(acc, j) / sxx(acc, j)
            (acc.offA(j) + acc.sum(j) / n) - slope * (acc.offB(j) + acc.sumB(j) / n)
          }
        case KRegrR2 =>
          if (n == 0 || sxx(acc, j) == 0) null
          else if (syy(acc, j) == 0) 1.0
          else { val s = sxy(acc, j); s * s / (sxx(acc, j) * syy(acc, j)) }
        case KCorr =>
          if (n == 0) null
          else {
            val d = math.sqrt(sxx(acc, j) * syy(acc, j))
            if (d == 0) null else sxy(acc, j) / d
          }
        case KCovarPop => if (n == 0) null else sxy(acc, j) / n
        case KCovarSamp => if (n < 2) null else sxy(acc, j) / (n - 1)
      }
    }
    def emit(key: Row, acc: AccG, isRetract: Boolean): Row = {
      // retraction streams emit 2 rows per state change — reuse a
      // thread-local digest instead of allocating one per emitted row.
      // The id hashes the KEY only (reference multi_hash of the primary
      // keys, physical.rs:930-940) so sink-side pairing can merge a state
      // change's retract+append into one debezium `u` record; frameKey
      // length-prefixes fields so composite keys can't alias.
      val id = UpdatingSql.md5Hex(UpdatingSql.frameKey(key))
      Row.fromSeq(key.toSeq ++ (0 until nSpecs).map(value(acc, _)) :+ Row(isRetract, id))
    }

    child
      .groupByKey(r => Row.fromSeq((0 until numKeys).map(r.get)))(keyEnc)
      .flatMapGroupsWithState[AccG, Row](OutputMode.Update(), timeout) {
        (key: Row, rows: Iterator[Row], state: GroupState[AccG]) =>
          if (state.hasTimedOut) {
            val old = state.get
            state.remove()
            Iterator(emit(key, old, isRetract = true))
          } else {
            val prev = state.getOption
            val acc = prev.map(a => AccG(a.rows, a.cnt.clone(),
                a.sum.clone(), a.sq.clone(), a.lo.clone(), a.hi.clone(),
                a.sumB.clone(), a.sqB.clone(), a.sumAB.clone(),
                a.offA.clone(), a.offB.clone(),
                a.bits.clone(), a.nF.clone(), a.num.clone(), a.dst.clone()))
              .getOrElse(AccG(0L, new Array[Long](nSpecs),
                new Array[Double](nSpecs), new Array[Double](nSpecs),
                Array.fill(nSpecs)(Double.PositiveInfinity),
                Array.fill(nSpecs)(Double.NegativeInfinity),
                new Array[Double](nSpecs), new Array[Double](nSpecs),
                new Array[Double](nSpecs),
                Array.fill(nSpecs)(Double.NaN), Array.fill(nSpecs)(Double.NaN),
                Array.tabulate(nSpecs)(j =>
                  if (kinds(j) == KBitAnd) -1L else 0L),
                new Array[Long](nSpecs),
                Array.fill(nSpecs)(Map.empty[Double, Double]),
                Array.fill(nSpecs)(Map.empty[String, Long])))
            var rowsSeen = acc.rows
            var any = false
            rows.foreach { r =>
              any = true
              val retract = rIdx >= 0 && r.getBoolean(rIdx)
              val delta = if (retract) -1L else 1L
              rowsSeen += delta
              var j = 0
              while (j < nSpecs) {
                val vi = numKeys + j
                val needsSecond = wIdx(j) >= 0
                val skip = r.isNullAt(vi) || (needsSecond && r.isNullAt(wIdx(j)))
                if (!skip) {
                  kinds(j) match {
                    case KDistinct =>
                      val v = r.getString(vi)
                      val m = acc.dst(j)
                      val c = m.getOrElse(v, 0L) + delta
                      acc.dst(j) = if (c <= 0) m - v else m.updated(v, c)
                    case KBitAnd | KBitOr | KBitXor =>
                      val v = r.getLong(vi)
                      acc.cnt(j) += delta
                      kinds(j) match {
                        case KBitAnd => acc.bits(j) &= v // append-only (guarded)
                        case KBitOr => acc.bits(j) |= v
                        case _ => acc.bits(j) ^= v // xor: self-inverse on retract
                      }
                    case KBoolAnd | KBoolOr =>
                      val v = r.getBoolean(vi)
                      acc.cnt(j) += delta
                      if (!v) acc.nF(j) += delta
                    case KPct(_) =>
                      val v = r.getDouble(vi)
                      acc.cnt(j) += delta
                      val m = acc.num(j)
                      val c = m.getOrElse(v, 0.0) + delta
                      acc.num(j) = if (c <= 0) m - v else m.updated(v, c)
                    case KPctW(_) =>
                      val v = r.getDouble(vi)
                      val w = r.getDouble(wIdx(j))
                      acc.cnt(j) += delta
                      val m = acc.num(j)
                      val c = m.getOrElse(v, 0.0) + delta * w
                      acc.num(j) = if (c <= 0) m - v else m.updated(v, c)
                    case k if isTwoInput(k) =>
                      val a = r.getDouble(vi)
                      val b = r.getDouble(wIdx(j))
                      if (acc.offA(j).isNaN) { acc.offA(j) = a; acc.offB(j) = b }
                      val ca = a - acc.offA(j)
                      val cb = b - acc.offB(j)
                      acc.cnt(j) += delta
                      acc.sum(j) += delta * ca
                      acc.sq(j) += delta * ca * ca
                      acc.sumB(j) += delta * cb
                      acc.sqB(j) += delta * cb * cb
                      acc.sumAB(j) += delta * ca * cb
                    case _ =>
                      val v = r.getDouble(vi)
                      if (acc.offA(j).isNaN) acc.offA(j) = v
                      val ca = v - acc.offA(j)
                      acc.cnt(j) += delta
                      acc.sum(j) += delta * ca
                      acc.sq(j) += delta * ca * ca
                      // min/max never see retracts (translateAgg rejects)
                      if (v < acc.lo(j)) acc.lo(j) = v
                      if (v > acc.hi(j)) acc.hi(j) = v
                  }
                }
                j += 1
              }
            }
            if (!any) Iterator.empty
            else if (rowsSeen <= 0) {
              // every input row retracted: the group disappears (debezium d)
              state.remove()
              prev.map(p => emit(key, p, isRetract = true)).iterator
            } else {
              val next = AccG(rowsSeen, acc.cnt, acc.sum, acc.sq, acc.lo, acc.hi,
                acc.sumB, acc.sqB, acc.sumAB, acc.offA, acc.offB,
                acc.bits, acc.nF, acc.num, acc.dst)
              state.update(next)
              ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
              prev.map(p => emit(key, p, isRetract = true)).iterator ++
                Iterator(emit(key, next, isRetract = false))
            }
          }
      }(accEncoder, outEnc)
      .toDF()
  }
}
