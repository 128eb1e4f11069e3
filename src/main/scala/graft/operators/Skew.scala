package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting — the manual fallback for hot keys that
  * AQE's skew-join splitting can't reach (e.g. a single viral key in
  * a broadcast-ineligible join, or a hot aggregation key).
  */
object Skew {

  /** Two-phase salted aggregation: partial sums over (key, salt)
    * spread a hot key over `salts` reducers, then a cheap final
    * combine over the (now tiny) per-key partials. Correct for any
    * commutative-associative aggregate; exposed for sum/count.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame = {
    require(salts > 0)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__psum").as(s"sum_$valueCol"), sum("__pcnt").as("n_rows"))
  }

  /** Salted equi-join for a skewed big side: the big side gets a
    * deterministic salt in [0, salts); the small side is replicated
    * `salts`× via explode; the join key becomes (keys, salt), so one
    * hot key spreads over `salts` tasks. Cost: small side ×salts —
    * use only when the small side fits that replication.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val b = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val s = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    b.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}
