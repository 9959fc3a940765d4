package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual escape hatch when AQE's skew
  * splitting isn't enough (e.g. one key holding >10% of a 100 TB fact
  * table). The skewed (large) side gets a random-but-deterministic salt in
  * [0, salts); the small side is replicated once per salt value; the join
  * key becomes (key, salt), spreading each hot key over `salts` reducers.
  *
  * Equivalent to the plain equi-join for any `salts ≥ 1` (each large-side
  * row meets exactly one replica of its matching small-side row).
  */
object SkewJoin {

  def saltedEquiJoin(
      large: DataFrame,
      small: DataFrame,
      largeKey: String,
      smallKey: String,
      salts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(salts >= 1)
    // deterministic salt (hash of the whole row modulo salts): reproducible
    // across retries, unlike rand()
    val salted = large.withColumn("_salt",
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("_salt", col("_salt").cast("bigint"))
    salted.join(replicated,
        salted(largeKey) === replicated(smallKey) && salted("_salt") === replicated("_salt"),
        joinType)
      .drop("_salt")
  }
}
