package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Round-6 second analytics inventory: rank statistics (Kendall
  * concordance), robust dispersion (MAD outlier screen), and
  * multi-resolution change energy (Haar wavelet scan) — plus the
  * diversity/richness estimators and sampling primitives added later
  * in the round. Same determinism contract as [[Analytics]]:
  * integer lanes everywhere (cents/milli quantization,
  * cross-multiplied ratios before ONE integer division), ANSI
  * zero-denominator guards mirrored on both engines, sign split
  * before any integer division whose numerator can be negative
  * (Spark `div` truncates toward zero; DuckDB `//` floors — they
  * only agree on non-negative operands).
  *
  * Reference behavior: pydala2 exposes none of these — they extend
  * the training-data-pipeline stack (SURVEY.md "beyond the
  * reference") the way `pydala/dataset.py`'s maintenance ops extend
  * storage management.
  */
object Analytics2 {

  /** Exact lineitem cents lane (the q314/q317 convention). */
  private val CentsF =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

  /** Exact events milli lane (the q241/q222 convention). */
  private val VMilliF =
    "CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact Kendall concordance between two per-nation metrics
    // (supplier-side revenue vs lineitem count): every metric pair is
    // compared by SIGN, never by difference product, so nothing can
    // overflow at any scale. The O(G²) pair pass runs on the
    // 25-row aggregate frame — bounded by group cardinality, not by
    // row count, which is the 100 TB shape for rank statistics: the
    // raw table collapses via one map-side-combined aggregate first.
    // tau_milli splits the sign before the integer division (Spark
    // div truncates, DuckDB // floors; they agree only on
    // non-negative operands).
    "q318_kendall_tau" -> { (s, d) =>
      val bynat = Tables.lineitem(s, d)
        .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").as("nk"))
        .agg(sum(expr(CentsF)).as("rev_c"), count(lit(1)).as("n_li"))
      val a = bynat.select(col("nk").as("nka"), col("rev_c").as("ra"),
        col("n_li").as("ca"))
      val b = bynat.select(col("nk").as("nkb"), col("rev_c").as("rb"),
        col("n_li").as("cb"))
      a.join(b, col("nka") < col("nkb"))
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(expr("CASE WHEN (ra > rb AND ca > cb) OR (ra < rb AND ca < cb) " +
            "THEN 1 ELSE 0 END")).as("n_conc"),
          sum(expr("CASE WHEN (ra > rb AND ca < cb) OR (ra < rb AND ca > cb) " +
            "THEN 1 ELSE 0 END")).as("n_disc"),
          sum(expr("CASE WHEN ra = rb THEN 1 ELSE 0 END")).as("n_tie_x"),
          sum(expr("CASE WHEN ca = cb THEN 1 ELSE 0 END")).as("n_tie_y"))
        .withColumn("tau_milli", expr(
          "CASE WHEN n_conc >= n_disc THEN (n_conc - n_disc) * 1000 div n_pairs " +
            "ELSE -((n_disc - n_conc) * 1000 div n_pairs) END"))
        .select("n_pairs", "n_conc", "n_disc", "n_tie_x", "n_tie_y",
          "tau_milli")
    },

    // Robust outlier screen per event_type: exact type-1 median, exact
    // type-1 MAD (median absolute deviation), then the count of rows
    // beyond 3·MAD — all in the exact milli lane, both quantile picks
    // tie-broken by event_id (the q241 identity: the k-th ranked value
    // with rn·2 ≥ n ∧ (rn−1)·2 < n is the lower median). Two
    // partitioned-window passes + one broadcast rejoin of the 5-row
    // bounds frame; nothing single-partition, nothing resident
    // per-key beyond the running rank.
    "q319_mad_outliers" -> { (s, d) =>
      val base = Tables.events(s, d)
        .select(col("event_type"), col("event_id"),
          expr(VMilliF).as("vmilli"))
      val ord1 = Window.partitionBy("event_type")
        .orderBy(col("vmilli"), col("event_id"))
      val med = base
        .withColumn("rn", row_number().over(ord1).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        .groupBy("event_type")
        .agg(max("n").as("n"),
          max(when(expr("rn * 2 >= n AND (rn - 1) * 2 < n"),
            col("vmilli"))).as("med"))
      val dev = base.join(broadcast(med), "event_type")
        .withColumn("adev", expr("abs(vmilli - med)"))
      val ord2 = Window.partitionBy("event_type")
        .orderBy(col("adev"), col("event_id"))
      val mad = dev
        .withColumn("rn2", row_number().over(ord2).cast("long"))
        .groupBy("event_type")
        .agg(max(when(expr("rn2 * 2 >= n AND (rn2 - 1) * 2 < n"),
          col("adev"))).as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(max("n").as("n"), max("med").as("med"), max("mad").as("mad"),
          sum(expr("CASE WHEN adev > 3 * mad THEN 1 ELSE 0 END")).as("n_out"))
        .withColumn("out_rate_milli", expr("n_out * 1000 div n"))
        .select("event_type", "n", "med", "mad", "n_out", "out_rate_milli")
        .orderBy("event_type")
    },

    // Multi-resolution change-energy scan: the daily revenue series in
    // exact cents, cut into 8-day blocks, Haar-transformed — detail
    // energy at three scales (day-pair, 2-day, 4-day) per block, all
    // in PURE integer arithmetic (sums, differences, squares of
    // cents — no floats anywhere). The day frame is
    // bounded-cardinality (one row per calendar day) so its global
    // row_number window is bounded by construction; everything below
    // it is one map-side-combined rollup and one 8-way conditional
    // pivot. HONEST CEILING: block detail² at ~10⁹ cents/day reaches
    // ~10¹⁸ per term — past that the energy lanes move to
    // DECIMAL(38,0).
    "q320_haar_energy" -> { (s, d) =>
      val day = Tables.lineitem(s, d)
        .groupBy(col("l_shipdate").as("day"))
        .agg(sum(expr(CentsF)).as("rev_c"))
      val ranked = day
        .withColumn("rn",
          row_number().over(Window.orderBy(col("day"))).cast("long") - 1)
        .withColumn("blk", expr("rn div 8"))
        .withColumn("pos", expr("rn % 8"))
      val pivots = (0 to 7).map(k =>
        max(when(col("pos") === lit(k), col("rev_c"))).as(s"v$k"))
      ranked.groupBy("blk")
        .agg(count(lit(1)).as("n_days"),
          (min(col("day")).as("day_start") +: pivots): _*)
        .filter(col("n_days") === 8)
        .select(col("blk"), col("day_start"),
          expr("v0+v1+v2+v3+v4+v5+v6+v7").as("a_c"),
          expr("(v0-v1)*(v0-v1) + (v2-v3)*(v2-v3) + (v4-v5)*(v4-v5) + " +
            "(v6-v7)*(v6-v7)").as("e1_cc"),
          expr("((v0+v1)-(v2+v3))*((v0+v1)-(v2+v3)) + " +
            "((v4+v5)-(v6+v7))*((v4+v5)-(v6+v7))").as("e2_cc"),
          expr("((v0+v1+v2+v3)-(v4+v5+v6+v7))*((v0+v1+v2+v3)-(v4+v5+v6+v7))")
            .as("e3_cc"))
        .orderBy("blk")
    })

  val oracles: Map[String, String] = Map(

    "q318_kendall_tau" ->
      s"""WITH bynat AS (
         |  SELECT s_nationkey AS nk,
         |    CAST(SUM($CentsF) AS BIGINT) AS rev_c,
         |    COUNT(*) AS n_li
         |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |  GROUP BY 1),
         |p AS (
         |  SELECT a.rev_c AS ra, b.rev_c AS rb, a.n_li AS ca, b.n_li AS cb
         |  FROM bynat a JOIN bynat b ON a.nk < b.nk),
         |t AS (
         |  SELECT COUNT(*) AS n_pairs,
         |    CAST(SUM(CASE WHEN (ra > rb AND ca > cb) OR (ra < rb AND ca < cb)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_conc,
         |    CAST(SUM(CASE WHEN (ra > rb AND ca < cb) OR (ra < rb AND ca > cb)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_disc,
         |    CAST(SUM(CASE WHEN ra = rb THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_tie_x,
         |    CAST(SUM(CASE WHEN ca = cb THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_tie_y
         |  FROM p)
         |SELECT n_pairs, n_conc, n_disc, n_tie_x, n_tie_y,
         |  CASE WHEN n_conc >= n_disc
         |    THEN (n_conc - n_disc) * 1000 // n_pairs
         |    ELSE -((n_disc - n_conc) * 1000 // n_pairs) END AS tau_milli
         |FROM t""".stripMargin,

    "q319_mad_outliers" ->
      s"""WITH base AS (
         |  SELECT event_type, event_id, $VMilliF AS vmilli FROM events),
         |r1 AS (
         |  SELECT event_type, vmilli,
         |    ROW_NUMBER() OVER (PARTITION BY event_type
         |      ORDER BY vmilli, event_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY event_type) AS n
         |  FROM base),
         |med AS (
         |  SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
         |    CAST(MAX(CASE WHEN rn * 2 >= n AND (rn - 1) * 2 < n
         |      THEN vmilli END) AS BIGINT) AS med
         |  FROM r1 GROUP BY 1),
         |dev AS (
         |  SELECT b.event_type, b.event_id, abs(vmilli - med) AS adev,
         |    med, n
         |  FROM base b JOIN med USING (event_type)),
         |r2 AS (
         |  SELECT event_type, adev, n, med,
         |    ROW_NUMBER() OVER (PARTITION BY event_type
         |      ORDER BY adev, event_id) AS rn2
         |  FROM dev),
         |mad AS (
         |  SELECT event_type,
         |    CAST(MAX(CASE WHEN rn2 * 2 >= n AND (rn2 - 1) * 2 < n
         |      THEN adev END) AS BIGINT) AS mad
         |  FROM r2 GROUP BY 1)
         |SELECT d.event_type, MAX(d.n) AS n, MAX(d.med) AS med,
         |  MAX(mad.mad) AS mad,
         |  CAST(SUM(CASE WHEN adev > 3 * mad.mad THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_out,
         |  CAST(SUM(CASE WHEN adev > 3 * mad.mad THEN 1 ELSE 0 END)
         |    AS BIGINT) * 1000 // MAX(d.n) AS out_rate_milli
         |FROM dev d JOIN mad USING (event_type)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q320_haar_energy" ->
      s"""WITH day AS (
         |  SELECT l_shipdate AS day, CAST(SUM($CentsF) AS BIGINT) AS rev_c
         |  FROM lineitem GROUP BY 1),
         |r AS (
         |  SELECT day, rev_c,
         |    ROW_NUMBER() OVER (ORDER BY day) - 1 AS rn
         |  FROM day),
         |b AS (SELECT rn // 8 AS blk, rn % 8 AS pos, day, rev_c FROM r),
         |g AS (
         |  SELECT blk, COUNT(*) AS n_days, MIN(day) AS day_start,
         |    CAST(MAX(CASE WHEN pos = 0 THEN rev_c END) AS BIGINT) AS v0,
         |    CAST(MAX(CASE WHEN pos = 1 THEN rev_c END) AS BIGINT) AS v1,
         |    CAST(MAX(CASE WHEN pos = 2 THEN rev_c END) AS BIGINT) AS v2,
         |    CAST(MAX(CASE WHEN pos = 3 THEN rev_c END) AS BIGINT) AS v3,
         |    CAST(MAX(CASE WHEN pos = 4 THEN rev_c END) AS BIGINT) AS v4,
         |    CAST(MAX(CASE WHEN pos = 5 THEN rev_c END) AS BIGINT) AS v5,
         |    CAST(MAX(CASE WHEN pos = 6 THEN rev_c END) AS BIGINT) AS v6,
         |    CAST(MAX(CASE WHEN pos = 7 THEN rev_c END) AS BIGINT) AS v7
         |  FROM b GROUP BY 1)
         |SELECT blk, day_start,
         |  v0+v1+v2+v3+v4+v5+v6+v7 AS a_c,
         |  (v0-v1)*(v0-v1) + (v2-v3)*(v2-v3) + (v4-v5)*(v4-v5) +
         |    (v6-v7)*(v6-v7) AS e1_cc,
         |  ((v0+v1)-(v2+v3))*((v0+v1)-(v2+v3)) +
         |    ((v4+v5)-(v6+v7))*((v4+v5)-(v6+v7)) AS e2_cc,
         |  ((v0+v1+v2+v3)-(v4+v5+v6+v7))*((v0+v1+v2+v3)-(v4+v5+v6+v7))
         |    AS e3_cc
         |FROM g WHERE n_days = 8 ORDER BY blk""".stripMargin)
}
