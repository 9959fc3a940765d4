package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, GraftSqlBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, StddevPop, StddevSamp, Sum, VariancePop, VarianceSamp}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** SQL-path updating aggregates: translates a non-windowed aggregation
  * plan — including scalar expressions AROUND the aggregate calls, a
  * Filter/Project stack above it (HAVING / post-agg WHERE), global (no
  * GROUP BY) aggregates, `count(distinct …)`, and aggregates whose INPUT
  * is itself updating (an unrolled CDC source or a nested updating
  * aggregate) — into the generalized retraction operator
  * ([[updatingAggRows]]), so `INSERT INTO <debezium sink> SELECT …` emits
  * true retract+append pairs like the reference's UpdatingAggregate
  * (crates/arroyo-worker/src/arrow/incremental_aggregator.rs; retractable
  * accumulators :117-119).
  *
  * Retraction-aware inputs subtract from the accumulators, which works
  * for the count/sum/avg/variance family and for `count(distinct)` (a
  * per-value multiplicity map, exactly DataFusion's distinct-accumulator
  * shape); min/max over an updating input would need the full value
  * multiset, and [[translateAgg]] rejects that combination explicitly
  * rather than emitting silently wrong results.
  */
object UpdatingSql {

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

  sealed trait Kind
  case object KCountStar extends Kind
  case object KCount extends Kind
  case object KSum extends Kind
  case object KMin extends Kind
  case object KMax extends Kind
  case object KAvg extends Kind
  // variance family rides (count, sum, sum-of-squares) — the same
  // retractable-accumulator shape the reference gets from DataFusion's
  // sliding accumulators (incremental_aggregator.rs:117-119)
  case object KVarPop extends Kind
  case object KVarSamp extends Kind
  case object KStddevPop extends Kind
  case object KStddevSamp extends Kind
  // count(distinct x): per-value multiplicity map (DataFusion's distinct
  // accumulator keeps the same set; retract decrements)
  case object KDistinct extends Kind

  /** Generalized per-key accumulator: one slot per aggregate spec.
    * Fixed-width per key for the scalar family; `dst` holds the
    * value→multiplicity map for distinct specs (state scales with the
    * number of distinct values per key — inherent to exact distinct).
    */
  case class AccG(rows: Long, cnt: Array[Long], sum: Array[Double],
      lo: Array[Double], hi: Array[Double], sq: Array[Double],
      dst: Array[Map[String, Long]])

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

  private def translateAgg(agg: Aggregate, ttl: Option[java.time.Duration],
      spark: SparkSession): Option[DataFrame] = {
    if (agg.groupingExpressions.exists(_.references.exists(r =>
        r.name == "window" || r.name == "session_window"))) return None

    // the aggregate's input: a nested updating sub-plan (translated
    // recursively), or a stateless child — which is itself updating when
    // it carries an unrolled CDC source's _updating_meta column
    val nested = agg.child.collectFirst { case a: Aggregate => a }.isDefined
    val (childDf0, fix, updatingInput): (DataFrame, Expression => Expression, Boolean) =
      if (nested) {
        translateUpdating(agg.child, ttl, spark) match {
          case Some(c) => (relay(c, spark), remapAttrs _, true)
          case None => return None
        }
      } else {
        val upd = agg.child.output.exists(_.name == "_updating_meta")
        (GraftSqlBridge.ofRows(spark, agg.child), identity[Expression] _, upd)
      }

    val groupings = agg.groupingExpressions
    val specs = scala.collection.mutable.ArrayBuffer.empty[(Kind, Expression)]

    def specFor(ae: AggregateExpression): Option[Int] = {
      if (ae.filter.nonEmpty) return None
      val ki: Option[(Kind, Expression)] = ae.aggregateFunction match {
        case Count(Seq(e)) if ae.isDistinct => Some((KDistinct, e))
        case _ if ae.isDistinct => None
        case Count(Seq(Literal(_, _))) => Some((KCountStar, Literal(1)))
        case Count(Seq(e)) => Some((KCount, e))
        case Sum(e, _) => Some((KSum, e))
        case Min(e) => Some((KMin, e))
        case Max(e) => Some((KMax, e))
        case Average(e, _) => Some((KAvg, e))
        case VariancePop(e, _) => Some((KVarPop, e))
        case VarianceSamp(e, _) => Some((KVarSamp, e))
        case StddevPop(e, _) => Some((KStddevPop, e))
        case StddevSamp(e, _) => Some((KStddevSamp, e))
        case _ => None
      }
      ki.flatMap { case (k, in) =>
        if (updatingInput && (k == KMin || k == KMax))
          throw new IllegalArgumentException(
            "min/max over an updating (CDC or nested-aggregate) input is not " +
              "retractable without the full value multiset; rewrite the query " +
              "or aggregate an append-only stream (reference retracts via " +
              "DataFusion sliding accumulators, incremental_aggregator.rs:117)")
        specs += ((k, in))
        Some(specs.length - 1)
      }
    }

    // rewrite each SELECT-list expression onto the operator's emitted
    // __k_<i>/__a_<j> columns; scalar expressions around the aggregate
    // calls (e.g. `sum(q + 5) + 10`, `concat('p_', k)`) survive as-is
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

    // project the child to [keys…, values…, __r]: a global aggregate gets
    // one synthetic constant key (keyed state needs ≥1 key column; the
    // reference's global UpdatingAggregate likewise runs single-keyed)
    val keyExprs: Seq[Expression] =
      if (groupings.isEmpty) Seq(Literal(0)) else groupings
    val keyCols = keyExprs.zipWithIndex.map { case (g, i) =>
      GraftSqlBridge.colOf(fix(g)).as(s"__k_$i")
    }
    val valCols = specs.toSeq.zipWithIndex.map { case ((k, in), j) =>
      k match {
        case KDistinct =>
          GraftSqlBridge.colOf(Cast(fix(in), StringType)).as(s"__v_$j")
        case KCountStar => lit(1.0).as(s"__v_$j")
        case KCount =>
          // only null-ness matters; avoid ANSI cast failures on non-numerics
          val c = GraftSqlBridge.colOf(fix(in))
          when(c.isNull, lit(null)).otherwise(lit(1.0)).cast("double").as(s"__v_$j")
        case _ =>
          GraftSqlBridge.colOf(Cast(fix(in), DoubleType)).as(s"__v_$j")
      }
    }
    val rCol =
      if (updatingInput) col("_updating_meta.is_retract").as("__r")
      else lit(false).as("__r")
    val child = childDf0.select(keyCols ++ valCols :+ rCol: _*)

    val result = updatingAggRows(child, keyExprs.length, specs.toSeq.map(_._1), ttl)

    val outCols = outExprs.map { case (n, e) => GraftSqlBridge.colOf(e).as(n) } :+
      col("_updating_meta")
    Some(result.select(outCols: _*))
  }

  /** The generalized retraction operator: child must be projected as
    * `__k_0…__k_{numKeys-1}, __v_0…__v_{specs-1}` (one input per spec;
    * StringType for KDistinct, DoubleType otherwise) plus an optional
    * trailing BooleanType `__r` (input-row retraction flag). Emits
    * `__k_*`, `__a_*` and `_updating_meta{is_retract,id}` rows; every
    * state change emits retract(old)+append(new); a key whose net row
    * count reaches zero emits only the retract and drops its state.
    */
  def updatingAggRows(child: DataFrame, numKeys: Int, kinds: Seq[Kind],
      ttl: Option[java.time.Duration]): DataFrame = {
    val keyFields = child.schema.fields.take(numKeys)
    val keySchema = StructType(keyFields)
    val outSchema = StructType(
      keyFields ++
        kinds.zipWithIndex.map { case (k, j) =>
          StructField(s"__a_$j",
            k match { case KCountStar | KCount | KDistinct => LongType; case _ => DoubleType })
        } :+
        StructField("_updating_meta", StructType(Seq(
          StructField("is_retract", BooleanType, nullable = false),
          StructField("id", StringType)))))

    implicit val keyEnc: Encoder[Row] = RowEncoder.encoderFor(keySchema)
    implicit val rowEnc: Encoder[Row] = RowEncoder.encoderFor(child.schema)
    implicit val outEnc: Encoder[Row] = RowEncoder.encoderFor(outSchema)

    val nSpecs = kinds.length
    val rIdx = child.columns.indexOf("__r") // -1 = append-only child
    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout

    // population variance from (n, Σx, Σx²); clamped at 0 against
    // floating-point cancellation
    def varPop(acc: AccG, j: Int): Double = {
      val n = acc.cnt(j).toDouble
      val m = acc.sum(j) / n
      math.max(0.0, acc.sq(j) / n - m * m)
    }
    def value(acc: AccG, j: Int): Any = kinds(j) match {
      case KCountStar => acc.rows
      case KCount => acc.cnt(j)
      case KDistinct => acc.dst(j).size.toLong
      case KSum => if (acc.cnt(j) == 0) null else acc.sum(j)
      case KMin => if (acc.cnt(j) == 0) null else acc.lo(j)
      case KMax => if (acc.cnt(j) == 0) null else acc.hi(j)
      case KAvg => if (acc.cnt(j) == 0) null else acc.sum(j) / acc.cnt(j)
      case KVarPop => if (acc.cnt(j) == 0) null else varPop(acc, j)
      case KStddevPop => if (acc.cnt(j) == 0) null else math.sqrt(varPop(acc, j))
      case KVarSamp =>
        val n = acc.cnt(j)
        if (n < 2) null else varPop(acc, j) * n / (n - 1).toDouble
      case KStddevSamp =>
        val n = acc.cnt(j)
        if (n < 2) null else math.sqrt(varPop(acc, j) * n / (n - 1).toDouble)
    }
    def emit(key: Row, acc: AccG, isRetract: Boolean): Row = {
      // retraction streams emit 2 rows per state change — reuse a
      // thread-local digest instead of allocating one per emitted row.
      // The id hashes the KEY only (reference multi_hash of the primary
      // keys, physical.rs:930-940) so sink-side pairing can merge a state
      // change's retract+append into one debezium `u` record.
      val id = UpdatingSql.md5Hex(key.toString)
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
            val acc = prev.map(a => AccG(a.rows, a.cnt.clone(), a.sum.clone(),
                a.lo.clone(), a.hi.clone(), a.sq.clone(), a.dst.clone()))
              .getOrElse(AccG(0L, new Array[Long](nSpecs),
                new Array[Double](nSpecs),
                Array.fill(nSpecs)(Double.PositiveInfinity),
                Array.fill(nSpecs)(Double.NegativeInfinity),
                new Array[Double](nSpecs),
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
                if (!r.isNullAt(numKeys + j)) {
                  kinds(j) match {
                    case KDistinct =>
                      val v = r.getString(numKeys + j)
                      val m = acc.dst(j)
                      val c = m.getOrElse(v, 0L) + delta
                      acc.dst(j) = if (c <= 0) m - v else m.updated(v, c)
                    case _ =>
                      val v = r.getDouble(numKeys + j)
                      acc.cnt(j) += delta
                      acc.sum(j) += delta * v
                      acc.sq(j) += delta * v * v
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
              val next = AccG(rowsSeen, acc.cnt, acc.sum, acc.lo, acc.hi, acc.sq, acc.dst)
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
