package graft.sinks

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression,
  GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan,
  LessThanOrEqual, Literal}
import org.apache.spark.sql.types._

/** File-skipping shared by the Iceberg manifest-metrics path and the
  * Delta add-action `stats` path: judge a scan filter's conjuncts
  * against one file's partition values + column bounds + null counts
  * and drop the file only when a conjunct is provably unsatisfiable on
  * it. Conservative by construction — any unknown shape, missing
  * bound, or type mismatch keeps the file (the filter is always
  * re-applied as a normal predicate after the scan).
  *
  * At 100 TB this is the scan story for BOTH table formats: a point
  * filter on a ZORDER'd table opens O(1) files instead of all of them,
  * and the judgment happens on the driver against metadata only —
  * Spark never lists the skipped files.
  */
private[graft] object StatsPruning {

  /** What the pruner needs to know about one file, column-name-keyed.
    * Implementations: Iceberg field-id manifest metrics, Delta JSON
    * `stats` on add actions.
    */
  trait FileStats {
    /** Some(value-or-null) when `name` is an identity partition column
      * of this file (the value may be a hive-path string — [[partValue]]
      * aligns it with the column type); None when it's a data column.
      */
    def partitionValue(name: String): Option[Any]
    /** Typed (lo, hi) bounds for a data column, when harvested. */
    def bounds(name: String, dt: DataType): Option[(Any, Any)]
    /** Values (incl. nulls) present for the column, when known. */
    def valueCount(name: String): Option[Long]
    def nullCount(name: String): Option[Long]
  }

  def conjunctsOf(spark: SparkSession, filterSql: String): Seq[Expression] = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    split(spark.sessionState.sqlParser.parseExpression(filterSql))
  }

  /** Total order used for both footer aggregation and scan pruning. */
  def compareValues(a: Any, b: Any, dt: DataType): Int = dt match {
    case IntegerType | DateType => a.asInstanceOf[Int] compare b.asInstanceOf[Int]
    case LongType | TimestampType => a.asInstanceOf[Long] compare b.asInstanceOf[Long]
    case FloatType => java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
    case DoubleType => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case StringType => a.asInstanceOf[String] compareTo b.asInstanceOf[String]
    case BooleanType => a.asInstanceOf[Boolean] compare b.asInstanceOf[Boolean]
    case other => throw new IllegalArgumentException(s"stats prune: no order for $other")
  }

  /** Catalyst literal → the plain JVM value [[compareValues]] orders,
    * coerced to the column's type (null = not comparable → keep file).
    */
  def litValue(l: Literal, dt: DataType): Any = {
    val v = l.value
    if (v == null) return null
    (dt, v) match {
      case (IntegerType, n: Number) => n.intValue()
      case (LongType, n: Number) => n.longValue()
      case (FloatType, n: Number) => n.floatValue()
      case (DoubleType, n: Number) => n.doubleValue()
      case (DoubleType, d: Decimal) => d.toDouble
      case (FloatType, d: Decimal) => d.toFloat
      case (IntegerType, d: Decimal) if d.toBigDecimal.isValidInt => d.toInt
      case (LongType, d: Decimal) if d.toBigDecimal.isValidLong => d.toLong
      case (StringType, s) => s.toString
      case (BooleanType, b: Boolean) => b
      // catalyst internals: DateType = Int days, TimestampType = Long micros
      case (DateType, n: Number) if l.dataType == DateType => n.intValue()
      case (TimestampType, n: Number) if l.dataType == TimestampType => n.longValue()
      case _ => null
    }
  }

  /** Partition values may arrive as hive-path strings; align them with
    * the column type for comparison (null = not convertible → unknown).
    */
  def partValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (s: String, StringType) => s
    case (s: String, IntegerType) => try s.toInt catch { case _: NumberFormatException => null }
    case (s: String, LongType) => try s.toLong catch { case _: NumberFormatException => null }
    case (s: String, FloatType) => try s.toFloat catch { case _: NumberFormatException => null }
    case (s: String, DoubleType) => try s.toDouble catch { case _: NumberFormatException => null }
    case (s: String, BooleanType) =>
      try s.toBoolean catch { case _: IllegalArgumentException => null }
    case (s: String, DateType) =>
      try java.time.LocalDate.parse(s).toEpochDay.toInt
      catch { case _: java.time.format.DateTimeParseException => null }
    case (s: String, TimestampType) =>
      // hive path format "yyyy-MM-dd HH:mm:ss[.f…]"; compared against
      // Catalyst literal micros, which GraftSession pins to UTC
      try {
        val ldt = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L
      } catch { case _: java.time.format.DateTimeParseException => null }
    case (n: Number, IntegerType) => n.intValue()
    case (n: Number, LongType) => n.longValue()
    case (n: Number, DoubleType) => n.doubleValue()
    case (b: Boolean, BooleanType) => b
    // an unconverted string for any other column type would CCE inside
    // compareValues — unknown (null) is the conservative reading
    case (_: String, _) => null
    case _ => v
  }

  /** May any row of `file` satisfy conjunct `c`? Mirrors Iceberg's
    * InclusiveMetricsEvaluator shape (public spec semantics).
    */
  def mayMatch(file: FileStats, c: Expression, schema: StructType): Boolean = {
    // dotted refs resolve through STRUCT nesting only (r16 — iceberg
    // manifests key nested-leaf bounds by field id): a leaf inside a
    // struct is single-valued per row, so its file bounds prune exactly
    // like a top-level column's. Array/map interiors are multi-valued
    // and never resolve here (GetArrayItem etc. aren't
    // UnresolvedAttribute anyway) — conservative, keep the file.
    def nestedType(parts: Seq[String]): Option[DataType] =
      parts.foldLeft(Option[DataType](schema)) {
        case (Some(st: StructType), seg) if st.fieldNames.contains(seg) =>
          Some(st(seg).dataType)
        case _ => None
      }
    def colOf(e: Expression): Option[(String, DataType)] = e match {
      case a: UnresolvedAttribute if schema.fieldNames.contains(a.name) =>
        Some(a.name -> schema(schema.fieldIndex(a.name)).dataType)
      case a: UnresolvedAttribute if a.nameParts.size > 1 =>
        nestedType(a.nameParts).collect {
          case leaf if !leaf.isInstanceOf[StructType] =>
            a.nameParts.mkString(".") -> leaf
        }
      case _ => None
    }
    // containsNullsOnly: every value in this file's column is null, so
    // no comparison/equality conjunct can match any row
    def allNull(name: String): Boolean =
      file.partitionValue(name).isEmpty && {
        (file.valueCount(name), file.nullCount(name)) match {
          case (Some(v), Some(n)) => v > 0 && v == n
          case _ => false
        }
      }
    // the file's value range for a column: partition cols are single-
    // valued; data cols read the bounds (absent → unknown → keep)
    def range(name: String, dt: DataType): Option[(Any, Any)] =
      file.partitionValue(name) match {
        case Some(raw) =>
          val v = partValue(raw, dt)
          if (v == null) None else Some((v, v))
        case None => file.bounds(name, dt)
      }
    def cmp(col: (String, DataType), lit: Literal, test: Int => Boolean,
        flip: Boolean = false): Boolean = {
      val (name, dt) = col
      if (allNull(name)) return false
      val lv = litValue(lit, dt)
      if (lv == null) return true
      range(name, dt) match {
        case None => true
        case Some((lo, hi)) =>
          try {
            // test receives cmp(bound, lit) for the bound that decides it
            if (!flip) test(compareValues(lo, lv, dt)) || test(compareValues(hi, lv, dt)) ||
              (compareValues(lo, lv, dt) <= 0 && compareValues(hi, lv, dt) >= 0 && test(0))
            else test(compareValues(lo, lv, dt)) || test(compareValues(hi, lv, dt))
          } catch { case _: IllegalArgumentException => true }
      }
    }
    def inRange(col: (String, DataType), lit: Literal): Boolean = {
      val (name, dt) = col
      if (allNull(name)) return false
      val lv = litValue(lit, dt)
      if (lv == null) return true
      range(name, dt) match {
        case None => true
        case Some((lo, hi)) =>
          try compareValues(lo, lv, dt) <= 0 && compareValues(hi, lv, dt) >= 0
          catch { case _: IllegalArgumentException => true }
      }
    }
    c match {
      case EqualTo(a, l: Literal) => colOf(a).forall(inRange(_, l))
      case EqualTo(l: Literal, a) => colOf(a).forall(inRange(_, l))
      // some value < lit ⟺ lo < lit; etc. — one bound decides each
      case LessThan(a, l: Literal) => colOf(a).forall(cmp(_, l, _ < 0, flip = true))
      case LessThan(l: Literal, a) => colOf(a).forall(cmp(_, l, _ > 0, flip = true))
      case LessThanOrEqual(a, l: Literal) => colOf(a).forall(cmp(_, l, _ <= 0, flip = true))
      case LessThanOrEqual(l: Literal, a) => colOf(a).forall(cmp(_, l, _ >= 0, flip = true))
      case GreaterThan(a, l: Literal) => colOf(a).forall(cmp(_, l, _ > 0, flip = true))
      case GreaterThan(l: Literal, a) => colOf(a).forall(cmp(_, l, _ < 0, flip = true))
      case GreaterThanOrEqual(a, l: Literal) => colOf(a).forall(cmp(_, l, _ >= 0, flip = true))
      case GreaterThanOrEqual(l: Literal, a) => colOf(a).forall(cmp(_, l, _ <= 0, flip = true))
      case In(a, lits) if lits.forall(_.isInstanceOf[Literal]) =>
        colOf(a).forall(col => lits.exists(l => inRange(col, l.asInstanceOf[Literal])))
      case IsNull(a) => colOf(a).forall { case (name, _) =>
        file.partitionValue(name) match {
          case Some(v) => v == null
          case None => file.nullCount(name).forall(_ > 0)
        }
      }
      case IsNotNull(a) => colOf(a).forall { case (name, _) =>
        file.partitionValue(name) match {
          case Some(v) => v != null
          case None =>
            (file.valueCount(name), file.nullCount(name)) match {
              case (Some(v), Some(n)) => v > n
              case _ => true
            }
        }
      }
      case _ => true // unknown shape: no pruning by this conjunct
    }
  }
}
