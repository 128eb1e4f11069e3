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
  /** Deterministic per-row salt from the row's own content: a salt
    * derived from `monotonically_increasing_id` changes when a lost
    * map task recomputes under a different partition layout, and a
    * changed shuffle key after partial stage retry means duplicated or
    * dropped rows downstream. Hashing the visible columns is
    * recomputation-stable; identical rows sharing a lane only softens
    * the spread, never correctness.
    */
  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts))

  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame = {
    require(salts > 0)
    val salted = df.withColumn("__salt", rowSalt(df, salts))
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
    val b = big.withColumn("__salt", rowSalt(big, salts))
    val s = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    b.join(s, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Skew-aware unordered within-key pairs: self-join `df` on `key`,
    * emitting (key, item_1, item_2) with item_1 < item_2 — the
    * co-occurrence explosion behind market-basket / co-purchase
    * queries. A key with K items yields K·(K−1)/2 rows, ALL produced
    * by one reducer in a plain self-join, so one viral key stalls the
    * stage no matter how many executors exist (and AQE's skew split
    * cannot divide a single key's build side).
    *
    * A one-row stats probe (map-side partial max — cheap next to the
    * pair explosion) picks the plan: below `hotThreshold` the plain
    * co-partitioned self-join runs untouched; above it, only the hot
    * keys' rows take the salted path ([[saltedJoin]]: one side salted
    * into `salts` lanes, the other replicated ×salts — affordable
    * precisely because it is limited to the hot slice), the cold
    * majority still takes the plain join, and the two pair sets union.
    * Output is identical either way; callers should cache `df` since
    * the probe and the join both traverse it.
    */
  def selfPairs(df: DataFrame, key: String, item: String,
                hotThreshold: Long = 100000L, salts: Int = 16): DataFrame = {
    require(salts > 0)
    def pairs(rel: DataFrame, salted: Boolean): DataFrame = {
      val joined =
        if (salted) saltedJoin(
          rel.select(col(key), col(item).as(s"${item}_1")),
          rel.select(col(key), col(item).as(s"${item}_2")),
          Seq(key), salts)
        else rel.select(col(key), col(item).as(s"${item}_1"))
          .join(rel.select(col(key), col(item).as(s"${item}_2")), Seq(key))
      joined.filter(col(s"${item}_1") < col(s"${item}_2"))
        .select(col(key), col(s"${item}_1"), col(s"${item}_2"))
    }
    // ONE aggregation serves both the max probe and the hot-key list;
    // the hot keys are collected while small by definition (they
    // exceed the threshold, so there are at most |df|/threshold of
    // them) and re-enter the plan as a local relation — the returned
    // lazy plan never recomputes the probe aggregation
    val hotRows = df.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold).select(col(key)).collect()
    if (hotRows.isEmpty) pairs(df, salted = false)
    else {
      val hotKeys = broadcast(df.sparkSession.createDataFrame(
        java.util.Arrays.asList(hotRows: _*),
        org.apache.spark.sql.types.StructType(Seq(df.schema(key)))))
      val hot = df.join(hotKeys, Seq(key), "left_semi")
      val cold = df.join(hotKeys, Seq(key), "left_anti")
      pairs(cold, salted = false).unionAll(pairs(hot, salted = true))
    }
  }
}
