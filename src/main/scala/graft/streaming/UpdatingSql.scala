package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, GraftSqlBridge, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, StddevPop, StddevSamp, Sum, VariancePop, VarianceSamp}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Project}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** SQL-path updating aggregates: translates an analyzed non-windowed
  * `Aggregate` plan into the generalized retraction operator
  * ([[updatingAggRows]]) so `INSERT INTO <debezium sink> SELECT k, agg(…)
  * GROUP BY k` emits true retract+append pairs like the reference's
  * UpdatingAggregate (crates/arroyo-worker/src/arrow/
  * incremental_aggregator.rs:117-119) — not just re-emitted rows.
  *
  * Generalizes round-1's fixed (String key, Double value, 5 aggs) shape:
  * composite keys of any type, arbitrary grouping EXPRESSIONS, any number
  * of count(* )/count/sum/min/max/avg/var_pop/var_samp/stddev_pop/
  * stddev_samp aggregates over arbitrary input expressions. Plans outside
  * that shape (distinct aggs, UDAFs, HAVING over non-members) return None
  * and fall back to Spark's plain update mode.
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

  /** One output column: either the i-th grouping key or an aggregate. */
  private sealed trait OutCol { def name: String }
  private final case class KeyOut(name: String, keyIdx: Int) extends OutCol
  private final case class AggOut(name: String, specIdx: Int) extends OutCol

  /** Generalized per-key accumulator: one slot per aggregate spec.
    * Fixed-width per key ⇒ state scales with distinct keys only.
    */
  case class AccG(rows: Long, cnt: Array[Long], sum: Array[Double],
      lo: Array[Double], hi: Array[Double], sq: Array[Double])

  private val accEncoder = Encoders.product[AccG]

  /** Attempt the rewrite; None = plan shape not supported (caller falls
    * back to plain update-mode aggregation).
    */
  def translate(df: DataFrame, ttl: Option[java.time.Duration]): Option[DataFrame] = {
    val spark = df.sparkSession
    val analyzed = df.queryExecution.analyzed

    // unwrap an optional attribute-only Project (rename/reorder) above the
    // Aggregate
    val (agg, outerMap) = analyzed match {
      case Project(pl, a: Aggregate) =>
        val mapped = pl.map {
          case ar: AttributeReference => Some(ar.name -> ar.exprId)
          case al @ Alias(ar: AttributeReference, _) => Some(al.name -> ar.exprId)
          case _ => None
        }
        if (mapped.exists(_.isEmpty)) return None
        (a, Some(mapped.flatten))
      case a: Aggregate => (a, None)
      case _ => return None
    }
    if (agg.groupingExpressions.exists(_.references.exists(r =>
        r.name == "window" || r.name == "session_window"))) return None

    val groupings = agg.groupingExpressions
    // global aggregate (no GROUP BY): keyed state needs ≥1 key column
    // (StatefulOpClusteredDistribution rejects Nil) — Spark's plain
    // update-mode global agg already has the right semantics there
    if (groupings.isEmpty) return None

    // classify every aggregate-list item in order
    val outs = scala.collection.mutable.ArrayBuffer.empty[OutCol]
    val specs = scala.collection.mutable.ArrayBuffer.empty[(Kind, Expression)]
    val outAttr = scala.collection.mutable.Map.empty[Long, OutCol] // exprId → out

    def classify(ne: NamedExpression): Boolean = {
      val inner = ne match { case Alias(c, _) => c; case e => e }
      val keyIdx = groupings.indexWhere(g => inner.semanticEquals(g))
      if (keyIdx >= 0) {
        val o = KeyOut(ne.name, keyIdx)
        outs += o; outAttr(ne.exprId.id) = o
        return true
      }
      inner match {
        case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
          val kindInput: Option[(Kind, Expression)] = ae.aggregateFunction match {
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
          kindInput match {
            case Some((k, in)) =>
              val o = AggOut(ne.name, specs.length)
              specs += ((k, in)); outs += o; outAttr(ne.exprId.id) = o
              true
            case None => false
          }
        case _ => false
      }
    }
    if (!agg.aggregateExpressions.forall(classify)) return None
    if (specs.isEmpty) return None

    // project keys + one double input per spec below the aggregate
    val projList: Seq[NamedExpression] =
      groupings.zipWithIndex.map { case (g, i) => Alias(g, s"__k_$i")() } ++
        specs.zipWithIndex.map { case ((_, in), j) =>
          Alias(Cast(in, DoubleType), s"__v_$j")()
        }
    val child = GraftSqlBridge.ofRows(spark, Project(projList, agg.child))

    val result = updatingAggRows(child, groupings.length, specs.map(_._1).toSeq, ttl)

    // final column order = the query's SELECT order (through the outer
    // Project when present)
    val ordered: Seq[OutCol] = outerMap match {
      case Some(m) => m.map { case (name, eid) =>
        outAttr.get(eid.id) match {
          case Some(KeyOut(_, i)) => KeyOut(name, i)
          case Some(AggOut(_, j)) => AggOut(name, j)
          case None => return None
        }
      }
      case None => outs.toSeq
    }
    val cols = ordered.map {
      case KeyOut(name, i) => col(s"__k_$i").as(name)
      case AggOut(name, j) => col(s"__a_$j").as(name)
    } :+ col("_updating_meta")
    Some(result.select(cols: _*))
  }

  /** The generalized retraction operator: child must be projected as
    * `__k_0…__k_{numKeys-1}, __v_0…__v_{specs-1}` (one input per spec).
    * Emits `__k_*`, `__a_*` and `_updating_meta{is_retract,id}` rows;
    * every state change emits retract(old)+append(new).
    */
  def updatingAggRows(child: DataFrame, numKeys: Int, kinds: Seq[Kind],
      ttl: Option[java.time.Duration]): DataFrame = {
    val keyFields = child.schema.fields.take(numKeys)
    val keySchema = StructType(keyFields)
    val outSchema = StructType(
      keyFields ++
        kinds.zipWithIndex.map { case (k, j) =>
          StructField(s"__a_$j",
            k match { case KCountStar | KCount => LongType; case _ => DoubleType })
        } :+
        StructField("_updating_meta", StructType(Seq(
          StructField("is_retract", BooleanType, nullable = false),
          StructField("id", StringType)))))

    implicit val keyEnc: Encoder[Row] = RowEncoder.encoderFor(keySchema)
    implicit val rowEnc: Encoder[Row] = RowEncoder.encoderFor(child.schema)
    implicit val outEnc: Encoder[Row] = RowEncoder.encoderFor(outSchema)

    val nSpecs = kinds.length
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
                a.lo.clone(), a.hi.clone(), a.sq.clone()))
              .getOrElse(AccG(0L, new Array[Long](nSpecs),
                new Array[Double](nSpecs),
                Array.fill(nSpecs)(Double.PositiveInfinity),
                Array.fill(nSpecs)(Double.NegativeInfinity),
                new Array[Double](nSpecs)))
            var rowsSeen = acc.rows
            var any = false
            rows.foreach { r =>
              any = true
              rowsSeen += 1
              var j = 0
              while (j < nSpecs) {
                if (!r.isNullAt(numKeys + j)) {
                  val v = r.getDouble(numKeys + j)
                  acc.cnt(j) += 1
                  acc.sum(j) += v
                  acc.sq(j) += v * v
                  if (v < acc.lo(j)) acc.lo(j) = v
                  if (v > acc.hi(j)) acc.hi(j) = v
                }
                j += 1
              }
            }
            if (!any) Iterator.empty
            else {
              val next = AccG(rowsSeen, acc.cnt, acc.sum, acc.lo, acc.hi, acc.sq)
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
