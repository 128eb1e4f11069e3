package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Round-6 fourth analytics inventory: data-profiling operators a
  * training-data pipeline runs before trusting a new 100 TB corpus —
  * functional-dependency checking, key discovery, inclusion
  * (foreign-key) coefficients, association mining, trend tests.
  * Same determinism contract as [[Analytics]]–[[Analytics3]]: integer
  * lanes end-to-end, ANSI zero-denominator guards mirrored on both
  * engines, sign split before any integer division whose numerator
  * can be negative.
  *
  * Reference behavior: pydala2 exposes none of these — they extend
  * the training-data-pipeline stack (SURVEY.md "beyond the
  * reference"), in the lineage of Papenbrock et al.'s profiling
  * suites (FD/UCC/IND discovery) re-expressed as Spark aggregations.
  */
object Analytics4 {

  /** One functional-dependency lane over a single table: two
    * map-side-combined shuffles on the LHS key, nothing driver-side.
    * g3_remove is Kivinen–Mannila's g₃ error (min rows to delete to
    * make the FD hold) = Σ_lhs (rows_lhs − max rhs frequency).
    */
  private def fdLane(t: DataFrame, name: String, lhs: String,
      rhs: String): DataFrame = {
    val pairs = t.groupBy(expr(lhs).as("lhs"), expr(rhs).as("rhs"))
      .agg(count(lit(1)).as("c"))
    pairs.groupBy("lhs")
      .agg(sum("c").as("rows_l"), max("c").as("keep_l"),
        count(lit(1)).as("k_rhs"))
      .agg(count(lit(1)).as("lhs_groups"),
        sum(expr("CASE WHEN k_rhs > 1 THEN 1 ELSE 0 END"))
          .as("viol_groups"),
        sum("rows_l").as("rows_total"),
        (sum("rows_l") - sum("keep_l")).as("g3_remove"))
      .withColumn("fd", lit(name))
  }

  /** One inclusion-dependency lane: distinct both sides, equi-join,
    * count hits. No forced broadcast — AQE picks broadcast when the
    * referenced side's distinct frame is small, shuffle otherwise,
    * which is the right call at 100 TB where a "dimension" can be
    * 10⁹ keys.
    */
  private def inclLane(from: DataFrame, fcol: String, to: DataFrame,
      tcol: String, name: String): DataFrame = {
    val fd = from.select(col(fcol).cast("bigint").as("v")).distinct()
    val td = to.select(col(tcol).cast("bigint").as("v")).distinct()
      .withColumn("hit", lit(1))
    fd.join(td, Seq("v"), "left")
      .agg(count(lit(1)).as("ndv_from"), count("hit").as("contained"))
      .withColumn("dep", lit(name))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Functional-dependency profiling on orders: for each candidate
    // FD report violating-group count and the g₃ error (min rows to
    // remove). o_orderkey→o_custkey must hold (key), the other two
    // are expected-false controls. Integer end-to-end; the only
    // division is guarded and non-negative.
    "q390_fd_check" -> { (s, d) =>
      val o = Tables.orders(s, d)
      fdLane(o, "fd1_orderkey_custkey", "o_orderkey", "o_custkey")
        .unionByName(fdLane(o, "fd2_custkey_priority", "o_custkey",
          "o_orderpriority"))
        .unionByName(fdLane(o, "fd3_orderdate_status", "o_orderdate",
          "o_orderstatus"))
        .withColumn("viol_milli", expr(
          "CASE WHEN rows_total = 0 THEN NULL " +
            "ELSE g3_remove * 1000 div rows_total END"))
        .withColumn("holds", expr("viol_groups = 0"))
        .select("fd", "lhs_groups", "viol_groups", "rows_total",
          "g3_remove", "viol_milli", "holds")
        .orderBy("fd")
    },

    // Single-column key discovery (unique-column-combination
    // profiling, arity 1) on orders: unpivot all six columns into one
    // (col_name, value-string) lane, then per column exact NDV, null
    // count, uniqueness ratio. The string cast only has to PRESERVE
    // distinctness (round-trip float formatting is injective on both
    // engines), never to match across them — values never surface.
    // One shuffle over 6×n rows; at 100 TB the exact-NDV lane swaps
    // for the mergeable HLL sketch (q193) with identical plumbing.
    "q391_key_discovery" -> { (s, d) =>
      Tables.orders(s, d).selectExpr(
        """stack(6,
          |  'o_orderkey',      cast(o_orderkey as string),
          |  'o_custkey',       cast(o_custkey as string),
          |  'o_orderstatus',   o_orderstatus,
          |  'o_totalprice',    cast(o_totalprice as string),
          |  'o_orderdate',     cast(cast(o_orderdate as date) as string),
          |  'o_orderpriority', o_orderpriority) as (col_name, v)"""
          .stripMargin)
        .groupBy("col_name")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("v")).as("ndv"),
          (count(lit(1)) - count(col("v"))).as("n_null"))
        .withColumn("uniq_milli", expr(
          "CASE WHEN n_rows = 0 THEN NULL ELSE ndv * 1000 div n_rows END"))
        .withColumn("is_key", expr("ndv = n_rows"))
        .orderBy("col_name")
    },

    // Inclusion-dependency (FK-candidate) coefficients: what share of
    // the referencing column's distinct values exist in the referenced
    // column? Three true FKs plus one deliberately-partial control
    // (nationkey ⊆ regionkey only for keys 0–4). Distinct + equi-join
    // per pair, all counts exact.
    "q392_inclusion_deps" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      inclLane(li, "l_partkey", Tables.part(s, d), "p_partkey",
          "dep1_li_part")
        .unionByName(inclLane(li, "l_suppkey", Tables.supplier(s, d),
          "s_suppkey", "dep2_li_supplier"))
        .unionByName(inclLane(Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey", "dep3_ord_customer"))
        .unionByName(inclLane(Tables.customer(s, d), "c_nationkey",
          Tables.region(s, d), "r_regionkey", "dep4_nation_region"))
        .withColumn("incl_milli", expr(
          "CASE WHEN ndv_from = 0 THEN NULL " +
            "ELSE contained * 1000 div ndv_from END"))
        .withColumn("is_fk", expr("contained = ndv_from"))
        .select("dep", "ndv_from", "contained", "incl_milli", "is_fk")
        .orderBy("dep")
    })

  private def fdSqlLane(name: String, lhs: String, rhs: String): String =
    s"""SELECT '$name' AS fd, COUNT(*) AS lhs_groups,
       |    CAST(SUM(CASE WHEN k_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS viol_groups,
       |    CAST(SUM(rows_l) AS BIGINT) AS rows_total,
       |    CAST(SUM(rows_l) - SUM(keep_l) AS BIGINT) AS g3_remove
       |  FROM (
       |    SELECT lhs, CAST(SUM(c) AS BIGINT) AS rows_l,
       |      MAX(c) AS keep_l, COUNT(*) AS k_rhs
       |    FROM (SELECT $lhs AS lhs, $rhs AS rhs, COUNT(*) AS c
       |          FROM orders GROUP BY 1, 2)
       |    GROUP BY 1)""".stripMargin

  private def inclSqlLane(name: String, ftab: String, fcol: String,
      ttab: String, tcol: String): String =
    s"""SELECT '$name' AS dep, COUNT(*) AS ndv_from,
       |    CAST(COUNT(t.v) AS BIGINT) AS contained
       |  FROM (SELECT DISTINCT CAST($fcol AS BIGINT) AS v FROM $ftab) f
       |  LEFT JOIN (SELECT DISTINCT CAST($tcol AS BIGINT) AS v
       |             FROM $ttab) t ON f.v = t.v""".stripMargin

  val oracles: Map[String, String] = Map(

    "q390_fd_check" ->
      s"""WITH u AS (
         |  ${fdSqlLane("fd1_orderkey_custkey", "o_orderkey", "o_custkey")}
         |  UNION ALL
         |  ${fdSqlLane("fd2_custkey_priority", "o_custkey",
             "o_orderpriority")}
         |  UNION ALL
         |  ${fdSqlLane("fd3_orderdate_status", "o_orderdate",
             "o_orderstatus")})
         |SELECT fd, lhs_groups, viol_groups, rows_total, g3_remove,
         |  CASE WHEN rows_total = 0 THEN NULL
         |    ELSE g3_remove * 1000 // rows_total END AS viol_milli,
         |  viol_groups = 0 AS holds
         |FROM u ORDER BY fd""".stripMargin,

    "q391_key_discovery" ->
      """WITH u AS (
        |  SELECT 'o_orderkey' AS col_name,
        |    CAST(o_orderkey AS VARCHAR) AS v FROM orders
        |  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR)
        |    FROM orders
        |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
        |  UNION ALL SELECT 'o_totalprice', CAST(o_totalprice AS VARCHAR)
        |    FROM orders
        |  UNION ALL SELECT 'o_orderdate',
        |    CAST(CAST(o_orderdate AS DATE) AS VARCHAR) FROM orders
        |  UNION ALL SELECT 'o_orderpriority', o_orderpriority
        |    FROM orders)
        |SELECT col_name, COUNT(*) AS n_rows, COUNT(DISTINCT v) AS ndv,
        |  CAST(COUNT(*) - COUNT(v) AS BIGINT) AS n_null,
        |  CASE WHEN COUNT(*) = 0 THEN NULL
        |    ELSE COUNT(DISTINCT v) * 1000 // COUNT(*) END AS uniq_milli,
        |  COUNT(DISTINCT v) = COUNT(*) AS is_key
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    "q392_inclusion_deps" ->
      s"""WITH u AS (
         |  ${inclSqlLane("dep1_li_part", "lineitem", "l_partkey",
             "part", "p_partkey")}
         |  UNION ALL
         |  ${inclSqlLane("dep2_li_supplier", "lineitem", "l_suppkey",
             "supplier", "s_suppkey")}
         |  UNION ALL
         |  ${inclSqlLane("dep3_ord_customer", "orders", "o_custkey",
             "customer", "c_custkey")}
         |  UNION ALL
         |  ${inclSqlLane("dep4_nation_region", "customer", "c_nationkey",
             "region", "r_regionkey")})
         |SELECT dep, ndv_from, contained,
         |  CASE WHEN ndv_from = 0 THEN NULL
         |    ELSE contained * 1000 // ndv_from END AS incl_milli,
         |  contained = ndv_from AS is_fk
         |FROM u ORDER BY dep""".stripMargin)
}
