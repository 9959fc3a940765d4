package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

package object queries {

  /** One inventory entry: a named DataFrame program plus (optionally) the
    * ANSI-SQL oracle DuckDB runs over the same parquet tables. `oracle =
    * None` ⇒ the driver records a weaker rows-only check (used for ops whose
    * hashing/LSH internals aren't portable to DuckDB SQL).
    */
  final case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** Exact double-sum: accumulate in DECIMAL (associative, order-independent)
    * and cast back to double. A plain double `sum()` differs between engines
    * in the last ulps because partial-aggregation order differs; that would
    * break hash-equality with the DuckDB oracle. The oracle-side twin is
    * `CAST(SUM(CAST(x AS DECIMAL(18,s)) AS DOUBLE)`.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact double-average: decimal sum / count, divided in double. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(c)

  /** Oracle-side SQL for [[dsum]]. */
  def oSum(x: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Oracle-side SQL for [[davg]]. */
  def oAvg(x: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,$scale))) AS DOUBLE) / COUNT($x)"

  /** Revenue term used by several TPC-H-style queries, exact in decimal:
    * extendedprice * (1 - discount). Oracle twin: [[oRevenue]].
    */
  def revenue: Column =
    sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1.0) - col("l_discount")).cast(DecimalType(18, 4))).cast("double")

  val oRevenue: String =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE)"

  /** DuckDB-side tokenizer identical to [[graft.operators.Dedup.tokens]]. */
  def oTokens(x: String): String =
    s"list_filter(string_split_regex(lower($x), '\\s+'), t -> t <> '')"
}
