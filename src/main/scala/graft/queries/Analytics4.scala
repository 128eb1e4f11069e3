package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.PortableSql

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

  private val Du = PortableSql.Duck
  private val Sp = PortableSql.Spark

  /** The q419 integer-exact nearest-centroid assignment substrate,
    * shared with q508's ARI (Analytics7): ×32768-quantized lanes,
    * floor-mod label-mean centroids, argmin with (dd, label_c)
    * tie-break. Returns one row per vector: (vec_id, label, label_c).
    */
  private[queries] def centroidPred(s: SparkSession, d: String): DataFrame = {
    val vq = Tables.spread(Tables.embeddings(s, d))
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("q1000", expr(
        "CAST(floor(CAST(v AS DOUBLE) * 32768.0) AS BIGINT) * 1000"))
    val cm = vq
      .groupBy(col("label").as("label_c"), col("pos"))
      .agg(expr("sum(q1000 div 1000)").as("sq"),
        count(lit(1)).as("cnt"))
      .withColumn("cmilli", expr(
        "((sq * 1000) - (((sq * 1000) % cnt + cnt) % cnt)) div cnt"))
      .select("label_c", "pos", "cmilli")
    vq.join(broadcast(cm), Seq("pos"))
      .groupBy("vec_id", "label", "label_c")
      .agg(sum(expr("(q1000 - cmilli) * (q1000 - cmilli)")).as("dd"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy("dd", "label_c")))
      .filter(col("rn") === 1)
  }

  /** The exact cents lane (the Analytics2/3 CentsF convention). */
  private val CentsF =
    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

  /** Distinct (order, part) basket frame — ONE builder for the three
    * co-occurrence queries (q396/q402/q416), mirroring each oracle's
    * shared `b` CTE.
    */
  private def basket(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()

  /** Mann–Kendall z with continuity correction in ONE shared IEEE
    * text: z = (S ∓ 1)·√(18/V18) with V18 = 18·Var(S) kept integer
    * (the ties-corrected n(n−1)(2n+5) − Σt(t−1)(2t+5)) — the single
    * division rides inside the correctly-rounded sqrt, the only
    * other float op is the final multiply (the RunsZF discipline).
    */
  private val MkZF: String =
    "CASE WHEN v18 <= 0 THEN NULL WHEN s_stat = 0 THEN 0 ELSE " +
      "CAST(floor(CAST(CASE WHEN s_stat > 0 THEN s_stat - 1 " +
      "ELSE s_stat + 1 END AS DOUBLE) * " +
      "sqrt(CAST(18 AS DOUBLE) / CAST(v18 AS DOUBLE)) * " +
      "CAST(1000000 AS DOUBLE)) AS BIGINT) END"

  /** Truncating sign-split quantized slope (dy·1000)/dx, dx > 0:
    * Spark `div` truncates while DuckDB `//` floors, so the negative
    * arm routes through the positive division and negates — both
    * engines then truncate identically.
    */
  private def senSlopeF(dl: graft.functions.SqlDialect): String =
    s"CASE WHEN dy >= 0 THEN ${dl.intDiv("dy * 1000", "dx")} " +
      s"ELSE -${dl.intDiv("(-dy) * 1000", "dx")} END"

  /** Cochran–Armitage z² = N·D² / (R(N−R)(N·Σw²n − (Σwn)²)) with
    * D = N·Σwr − R·Σwn. D² and the denominator ride the 128-bit lane
    * (D² is ~10²⁰ at sf0.1 — past BIGINT), while the ×N factor joins
    * in the FLOAT tail so the integer lane never has to hold N·D²
    * (~10²⁶ at sf0.1, and past even DECIMAL(38) by ~sf30). HONEST
    * CEILING: D² < 10³⁸ holds to D ≈ 10¹⁹, i.e. ~sf1000. The float
    * divisions go through wideToDouble (exact below 2⁶²,
    * power-of-two floor-scale above — identical on both engines,
    * never the raw HUGEINT→DOUBLE cast whose DuckDB rounding is
    * broken above 2⁶⁴).
    */
  private def caZ2F(dl: graft.functions.SqlDialect): String =
    "CASE WHEN den_w <= 0 THEN NULL ELSE " +
      s"CAST(floor(${dl.wideToDouble("num_w")} / " +
      s"${dl.wideToDouble("den_w")} * CAST(n_total AS DOUBLE) " +
      "* CAST(1000000 AS DOUBLE)) AS BIGINT) END"

  /** Per-cell χ² contribution ×10⁶ as ONE exact wide division:
    * (O·n − R·C)²·10⁶ / (n·R·C). The numerator square is ~10²⁶ at
    * sf1 — both factors ride the 128-bit lane and the quotient
    * (a per-cell χ² term, bounded by n) lands back in BIGINT.
    */
  private def chi2TermF(dl: graft.functions.SqlDialect): String =
    s"CAST(${dl.intDiv(
      dl.wide("dlt") + " * dlt * 1000000",
      "(" + dl.wide("n_tot") + " * r_m * c_m)")} AS BIGINT)"

  /** Cramér's V ×10⁶ — one shared sqrt over an all-integer ratio. */
  private val CramerVF: String =
    "CASE WHEN n_tot <= 0 OR k_min <= 0 THEN NULL ELSE " +
      "CAST(floor(sqrt(CAST(chi2_micro AS DOUBLE) / " +
      "CAST(n_tot * k_min * 1000000 AS DOUBLE)) * " +
      "CAST(1000000 AS DOUBLE)) AS BIGINT) END"

  /** Kendall τ-b ×10⁶: 2(C−D)/√((n0·2−n1·2)(n0·2−n2·2)) — the ×2
    * marginal-tie lanes avoid ever halving an odd integer, and the
    * product under the sqrt rides wideToDouble (it reaches ~10²⁷ at
    * sf1).
    */
  private def tauBF(dl: graft.functions.SqlDialect): String =
    "CASE WHEN prod4_w <= 0 THEN NULL ELSE " +
      "CAST(floor(CAST(2 * cmd AS DOUBLE) / " +
      s"sqrt(${dl.wideToDouble("prod4_w")}) * " +
      "CAST(1000000 AS DOUBLE)) AS BIGINT) END"

  /** Per-stratum sample std ×1000 from the exact integer moment lanes:
    * √((n·Σx² − (Σx)²)/(n(n−1))) — the quadratic form rides the
    * 128-bit lane, the two divisions live inside the correctly-rounded
    * sqrt's argument in a fixed order.
    */
  private def stdMilliF(dl: graft.functions.SqlDialect): String =
    "CASE WHEN n_h < 2 OR num_w < 0 THEN NULL ELSE " +
      s"CAST(floor(sqrt(${dl.wideToDouble("num_w")} / " +
      "CAST(n_h AS DOUBLE) / CAST(n_h - 1 AS DOUBLE)) * " +
      "CAST(1000 AS DOUBLE)) AS BIGINT) END"

  /** Neyman allocation k_h = 1000·N_h·s_h / Σ N_g·s_g as one exact
    * wide division (the ×1000 pushes the product past BIGINT at sf1).
    */
  private def neymanKF(dl: graft.functions.SqlDialect): String =
    "CASE WHEN sum_w <= 0 OR s_milli IS NULL THEN 0 ELSE " +
      s"CAST(${dl.intDiv(dl.wide("n_h") + " * s_milli * 1000",
        "sum_w")} AS BIGINT) END"

  /** q433's z = D/√(nᵢk₀(n₀−k₀)) with BOTH wide operands routed
    * through wideToDouble (sign-split on D, whose magnitude passes
    * BIGINT near sf10⁴ — never a raw wide→BIGINT cap). Negative arm
    * is −⌊|z|·10⁶⌋ on both engines.
    */
  private def bhZF(dl: graft.functions.SqlDialect): String =
    "CASE WHEN prod_w <= 0 THEN NULL " +
      s"WHEN dd >= 0 THEN CAST(floor(${dl.wideToDouble("dd")} / " +
      s"sqrt(${dl.wideToDouble("prod_w")}) * " +
      "CAST(1000000 AS DOUBLE)) AS BIGINT) " +
      s"ELSE -CAST(floor(${dl.wideToDouble("(-dd)")} / " +
      s"sqrt(${dl.wideToDouble("prod_w")}) * " +
      "CAST(1000000 AS DOUBLE)) AS BIGINT) END"

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
    },

    // Mann–Kendall trend test on monthly order counts: S over all
    // month pairs (bounded frame — months², broadcast non-equi join),
    // ties-corrected variance, continuity-corrected z. Everything
    // integer until the single shared sqrt text; V18 ≈ n³ stays well
    // inside BIGINT at any horizon because n is months, not rows.
    "q393_mann_kendall" -> { (s, d) =>
      val m = Tables.orders(s, d)
        .groupBy(expr("year(o_orderdate) * 100 + month(o_orderdate)")
          .as("ym"))
        .agg(count(lit(1)).as("y"))
      val sStat = m.select(col("ym").as("xa"), col("y").as("ya"))
        .join(broadcast(m.select(col("ym").as("xb"), col("y").as("yb"))),
          col("xa") < col("xb"))
        .agg(coalesce(sum(expr(
          "CASE WHEN yb > ya THEN 1 WHEN yb < ya THEN -1 ELSE 0 END")),
          lit(0L)).as("s_stat"))
      m.groupBy("y").agg(count(lit(1)).as("t"))
        .agg(sum("t").as("n_m"),
          coalesce(sum(expr("t * (t - 1) * (2 * t + 5)")), lit(0L))
            .as("tie_sum"))
        .crossJoin(broadcast(sStat))
        .withColumn("v18", expr(
          "n_m * (n_m - 1) * (2 * n_m + 5) - tie_sum"))
        .withColumn("z_micro", expr(MkZF))
        .withColumn("trend", expr(
          "CASE WHEN z_micro IS NULL THEN NULL " +
            "WHEN z_micro > 1959964 THEN 'increasing' " +
            "WHEN z_micro < -1959964 THEN 'decreasing' " +
            "ELSE 'none' END"))
        .select("n_m", "s_stat", "v18", "z_micro", "trend")
    },

    // Theil–Sen estimator on monthly revenue (exact cents) — the
    // BOUNDED-frame companion to q353 (which runs the same estimator
    // over the 2.9M-row daily pair frame through GlobalOrder): at
    // monthly grain the pair frame and the median window stay under
    // months² (≤ ~3.5k rows) at ANY data scale, so the broadcast
    // non-equi join + single-partition row_number is the cheaper
    // plan, and the Mann–Kendall companion columns (pos/neg slope
    // mass) ride the same pairs for free.
    "q394_theil_sen" -> { (s, d) =>
      val m = Tables.orders(s, d)
        .groupBy(expr(
          "(year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1")
          .as("x"))
        .agg(sum(expr(CentsF))
          .as("yc"))
      val pairs = m.select(col("x").as("xa"), col("yc").as("ya"))
        .join(broadcast(m.select(col("x").as("xb"), col("yc").as("yb"))),
          col("xa") < col("xb"))
        .select(expr("xb - xa").as("dx"), expr("yb - ya").as("dy"))
        .withColumn("slope_q", expr(senSlopeF(Sp)))
      val agg = pairs.agg(count(lit(1)).as("n_pairs"),
        coalesce(sum(expr("CASE WHEN slope_q > 0 THEN 1 ELSE 0 END")),
          lit(0L)).as("n_pos"),
        coalesce(sum(expr("CASE WHEN slope_q < 0 THEN 1 ELSE 0 END")),
          lit(0L)).as("n_neg"))
      val med = pairs
        .withColumn("rn", row_number().over(Window.orderBy("slope_q")))
        .crossJoin(broadcast(agg))
        .filter(expr("rn = (n_pairs + 1) div 2"))
        .select(col("slope_q").as("sen_slope_milli"), col("n_pairs"),
          col("n_pos"), col("n_neg"))
      m.agg(count(lit(1)).as("n_months"))
        .crossJoin(broadcast(med))
        .withColumn("pos_share_milli", expr(
          "CASE WHEN n_pairs = 0 THEN NULL " +
            "ELSE n_pos * 1000 div n_pairs END"))
        .select("n_months", "n_pairs", "sen_slope_milli", "n_pos",
          "n_neg", "pos_share_milli")
    },

    // Cochran–Armitage trend-in-proportions across the seven order
    // years (ordered scores w = year − 1991): is the 'F'-status share
    // drifting monotonically? One map-side-combined rollup to seven
    // rows, then pure 128-bit integer lanes for D and the quadratic
    // forms, one wideToDouble division at the very end.
    "q395_cochran_armitage" -> { (s, d) =>
      Tables.orders(s, d)
        .filter(expr("year(o_orderdate) BETWEEN 1992 AND 1998"))
        .groupBy(expr("CAST(year(o_orderdate) - 1991 AS BIGINT)").as("w"))
        .agg(count(lit(1)).as("n_i"),
          coalesce(sum(expr(
            "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END")), lit(0L))
            .as("r_i"))
        .agg(sum("n_i").as("n_total"), sum("r_i").as("r_total"),
          sum(expr("w * n_i")).as("swn"), sum(expr("w * r_i")).as("swr"),
          sum(expr("w * w * n_i")).as("sw2n"))
        .withColumn("d_stat", expr(
          s"${Sp.wide("n_total")} * swr - ${Sp.wide("r_total")} * swn"))
        .withColumn("num_w", expr("d_stat * d_stat"))
        .withColumn("den_w", expr(
          s"${Sp.wide("r_total")} * (n_total - r_total) * " +
            s"(${Sp.wide("n_total")} * sw2n - ${Sp.wide("swn")} * swn)"))
        .withColumn("z2_micro", expr(caZ2F(Sp)))
        .withColumn("reject_95", expr(
          "CASE WHEN z2_micro IS NULL THEN NULL " +
            "ELSE z2_micro > 3841459 END"))
        .select(col("n_total"), col("r_total"),
          expr("CAST(d_stat AS BIGINT)").as("d_stat"),
          col("z2_micro"), col("reject_95"))
    },

    // Association-rule mining (market basket): part pairs co-occurring
    // in an order, support ≥ 2, confidence both directions and lift as
    // integer milli lanes, global top-20 by lift. The pair generation
    // is the canonical co-occurrence self-join on the basket key —
    // output bounded by Σ(items-per-basket choose 2), never |parts|².
    // Top-k rides BottomK so the plan keeps the WindowGroupLimit
    // bounded heap instead of a full single-partition sort.
    "q396_assoc_rules" -> { (s, d) =>
      val b = basket(s, d)
      val nOrders = b.agg(countDistinct("ok").as("n_orders"))
      val supp = b.groupBy("pk").agg(count(lit(1)).as("supp"))
      val pairs = b.select(col("ok"), col("pk").as("pa"))
        .join(b.select(col("ok"), col("pk").as("pb")), Seq("ok"))
        .filter(col("pa") < col("pb"))
        .groupBy("pa", "pb").agg(count(lit(1)).as("supp_ab"))
        .filter(col("supp_ab") >= 2)
      val rules = pairs
        .join(supp.select(col("pk").as("pa"), col("supp").as("supp_a")),
          Seq("pa"))
        .join(supp.select(col("pk").as("pb"), col("supp").as("supp_b")),
          Seq("pb"))
        .crossJoin(broadcast(nOrders))
        .withColumn("conf_ab_milli", expr("supp_ab * 1000 div supp_a"))
        .withColumn("conf_ba_milli", expr("supp_ab * 1000 div supp_b"))
        .withColumn("lift_milli", expr(
          "supp_ab * n_orders * 1000 div (supp_a * supp_b)"))
        .select("pa", "pb", "supp_ab", "supp_a", "supp_b",
          "conf_ab_milli", "conf_ba_milli", "lift_milli")
      graft.operators.BottomK.perGroup(rules, Seq.empty,
          Seq(col("lift_milli").desc, col("pa"), col("pb")), 20)
        .orderBy(col("lift_milli").desc, col("pa"), col("pb"))
    },

    // χ² test of independence on the mktsegment × orderpriority
    // contingency table, zero-observed cells included via the full
    // marginal grid (they contribute R·C/n). Per-cell terms quantize
    // to micro through one exact 128-bit division BEFORE summing
    // (sums of rationals can't stay integer — the q375 convention),
    // then Cramér's V from the summed statistic.
    "q397_chi2_independence" -> { (s, d) =>
      val ct = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"),
          col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("n_c"))
      val rm = ct.groupBy("seg").agg(sum("n_c").as("r_m"))
      val cm = ct.groupBy("pri").agg(sum("n_c").as("c_m"))
      val tot = ct.agg(sum("n_c").as("n_tot"),
        countDistinct("seg").as("r_levels"),
        countDistinct("pri").as("c_levels"))
      rm.crossJoin(broadcast(cm)) // full grid: r×c levels, both tiny
        .join(ct, Seq("seg", "pri"), "left")
        .na.fill(0L, Seq("n_c"))
        .crossJoin(broadcast(tot))
        .withColumn("dlt", expr("n_c * n_tot - r_m * c_m"))
        .withColumn("term_micro", expr(chi2TermF(Sp)))
        .groupBy("n_tot", "r_levels", "c_levels")
        .agg(sum("term_micro").as("chi2_micro"))
        .withColumn("k_min", expr(
          "least(r_levels, c_levels) - 1"))
        .withColumn("v_micro", expr(CramerVF))
        .withColumn("reject_95", expr("chi2_micro > 26296228"))
        .select("n_tot", "r_levels", "c_levels", "chi2_micro",
          "v_micro", "reject_95")
    },

    // Kendall τ-b between quantity and discount classes: concordant/
    // discordant mass over the bounded class-pair frame (≤ ~550²/2
    // pairs regardless of row count — the q373 collapse), marginal tie
    // corrections as ×2 integer lanes, one shared sqrt at the end.
    "q398_kendall_tau" -> { (s, d) =>
      val cls = Tables.lineitem(s, d)
        .groupBy(expr("CAST(l_quantity AS BIGINT)").as("qv"),
          expr("CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("dv"))
        .agg(count(lit(1)).as("n_gv"))
      val cd = cls.select(col("qv").as("qa"), col("dv").as("da"),
          col("n_gv").as("na"))
        .join(broadcast(cls.select(col("qv").as("qb"), col("dv").as("db"),
          col("n_gv").as("nb"))),
          col("qa") < col("qb") ||
            (col("qa") === col("qb") && col("da") < col("db")))
        .agg(
          coalesce(sum(expr(
            s"CASE WHEN qa < qb AND da < db THEN ${Sp.wide("na")} * nb " +
              s"ELSE ${Sp.wide("0")} END")), expr(Sp.wide("0"))).as("c_w"),
          coalesce(sum(expr(
            s"CASE WHEN qa < qb AND da > db THEN ${Sp.wide("na")} * nb " +
              s"ELSE ${Sp.wide("0")} END")), expr(Sp.wide("0"))).as("d_w"))
      val qm = cls.groupBy("qv").agg(sum("n_gv").as("t"))
        .agg(sum("t").as("n_rows"),
          coalesce(sum(expr("t * (t - 1)")), lit(0L)).as("n1x2"))
      val dm = cls.groupBy("dv").agg(sum("n_gv").as("t"))
        .agg(coalesce(sum(expr("t * (t - 1)")), lit(0L)).as("n2x2"))
      qm.crossJoin(broadcast(dm)).crossJoin(broadcast(cd))
        .withColumn("n0x2", expr("n_rows * (n_rows - 1)"))
        .withColumn("cmd", expr("CAST(c_w - d_w AS BIGINT)"))
        .withColumn("prod4_w", expr(
          s"${Sp.wide("n0x2 - n1x2")} * (n0x2 - n2x2)"))
        .withColumn("tau_micro", expr(tauBF(Sp)))
        .select(col("n_rows"),
          expr("CAST(c_w AS BIGINT)").as("c_pairs"),
          expr("CAST(d_w AS BIGINT)").as("d_pairs"),
          col("n1x2"), col("n2x2"), col("tau_micro"))
    },

    // Neyman-allocation stratified sampling (budget 1000): allocate
    // k_h ∝ N_h·s_h from exact per-stratum moment lanes, then draw the
    // k_h lowest portable-hash rows per stratum. The draw is
    // TWO-STAGE so it scales: BottomK with the literal budget cap
    // keeps the WindowGroupLimit bounded heap (≤1000·strata rows
    // survive), and only that bounded candidate frame sees the
    // variable-k re-rank, which no optimizer rewrite could bound.
    "q399_stratified_sample" -> { (s, d) =>
      val base = Tables.orders(s, d).select(
        col("o_orderkey").as("ok"),
        col("o_orderpriority").as("stratum"),
        expr(CentsF)
          .as("x"))
      val st = base.groupBy("stratum")
        .agg(count(lit(1)).as("n_h"), sum("x").as("sx"),
          sum(expr(s"${Sp.wide("x")} * x")).as("sxx"))
        .withColumn("num_w", expr(
          s"n_h * sxx - ${Sp.wide("sx")} * sx"))
        .withColumn("s_milli", expr(stdMilliF(Sp)))
      val tw = st.agg(coalesce(sum(expr(
          "CASE WHEN s_milli IS NULL THEN 0 ELSE n_h * s_milli END")),
          lit(0L)).as("sum_w"))
      val alloc = st.crossJoin(broadcast(tw))
        .withColumn("k_h", expr(neymanKF(Sp)))
        .select("stratum", "n_h", "sx", "s_milli", "k_h")
      val cand = graft.operators.BottomK.perGroup(
        base.withColumn("h",
          expr(Sp.hash64("concat('ney:', CAST(ok AS STRING))"))),
        Seq("stratum"), Seq(col("h"), col("ok")), 1000)
      val samp = cand
        .withColumn("rn", row_number().over(
          Window.partitionBy("stratum").orderBy("h", "ok")))
        .join(alloc.select("stratum", "k_h"), Seq("stratum"))
        .filter(col("rn") <= col("k_h"))
        .groupBy("stratum")
        .agg(count(lit(1)).as("n_sampled"), sum("x").as("sum_samp"))
      alloc.join(samp, Seq("stratum"), "left")
        .withColumn("n_sampled", coalesce(col("n_sampled"), lit(0L)))
        .withColumn("mean_true_cents", expr("sx div n_h"))
        .withColumn("mean_samp_cents", expr(
          "CASE WHEN n_sampled = 0 THEN NULL " +
            "ELSE sum_samp div n_sampled END"))
        .select("stratum", "n_h", "s_milli", "k_h", "n_sampled",
          "mean_true_cents", "mean_samp_cents")
        .orderBy("stratum")
    },

    // Hampel outlier filter on daily revenue: centered 7-day rolling
    // median and MAD via lag/lead arrays over the bounded day frame
    // (~2,400 rows by construction — the day-frame window convention),
    // flag |y−med| > 3·1.4826·MAD as the pure integer compare
    // 10000·|y−med| > 44478·MAD. Edge days (incomplete window) are
    // not evaluated.
    "q400_hampel_filter" -> { (s, d) =>
      val day = Tables.orders(s, d)
        .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
        .agg(sum(expr(CentsF))
          .as("y"))
      val w = Window.orderBy("day")
      val arr = day
        .withColumn("arr", array(
          lag("y", 3).over(w), lag("y", 2).over(w), lag("y", 1).over(w),
          col("y"),
          lead("y", 1).over(w), lead("y", 2).over(w),
          lead("y", 3).over(w)))
        .filter(expr("size(filter(arr, v -> v IS NOT NULL)) = 7"))
        .withColumn("med", expr("element_at(array_sort(arr), 4)"))
        .withColumn("mad", expr(
          "element_at(array_sort(transform(arr, v -> abs(v - med))), 4)"))
        .withColumn("dev", expr("abs(y - med)"))
        .withColumn("is_out", expr("10000 * dev > 44478 * mad"))
        .withColumn("ratio_milli", expr(
          "CASE WHEN mad = 0 THEN NULL " +
            "ELSE 10000 * dev * 1000 div (44478 * mad) END"))
      arr.agg(count(lit(1)).as("n_eval"),
        coalesce(sum(expr("CASE WHEN is_out THEN 1 ELSE 0 END")),
          lit(0L)).as("n_outliers"),
        max("ratio_milli").as("max_ratio_milli"),
        max(expr("CASE WHEN is_out THEN day ELSE NULL END"))
          .as("last_outlier_day"))
    },

    // Unnormalized Haar wavelet energy pyramid on daily order counts:
    // at level ℓ the detail coefficient per 2^ℓ-day block is the
    // signed sum (+ first half, − second half), so each level is ONE
    // map-side-combined groupBy on t div 2^ℓ — no window, no
    // sequential pass, missing days simply contribute nothing.
    // Energy = Σ det² stays integer end-to-end.
    "q401_haar_energy" -> { (s, d) =>
      val day = Tables.orders(s, d)
        .groupBy(expr(
          "datediff(CAST(o_orderdate AS DATE), DATE'1992-01-01')")
          .as("t"))
        .agg(count(lit(1)).as("y"))
      // ONE scan for all four levels: explode each day row to its
      // (level, block) cells, then two rollups — vs four separate
      // aggregates over the full orders lineage
      day.select(explode(expr("array(1L, 2L, 3L, 4L)")).as("level"),
          col("t"), col("y"))
        .groupBy(col("level"),
          expr("t div shiftleft(1, CAST(level AS INT))").as("p"))
        .agg(sum(expr(
          "CASE WHEN t % shiftleft(1, CAST(level AS INT)) < " +
            "shiftleft(1, CAST(level AS INT) - 1) THEN y ELSE -y END"))
          .as("det"),
          sum("y").as("blk_sum"))
        .groupBy("level")
        .agg(count(lit(1)).as("n_blocks"),
          coalesce(sum(expr("det * det")), lit(0L)).as("energy"),
          coalesce(sum(expr("blk_sum * blk_sum")), lit(0L))
            .as("approx_energy"))
        .select("level", "n_blocks", "energy", "approx_energy")
        .orderBy("level")
    },

    // A-priori frequent-triple mining: prune to frequent items first
    // (the L1 candidate cut — at scale this is what keeps the 3-way
    // basket self-join from exploding), then count triples within
    // orders, keep support ≥ 2, top-10 via the bounded-heap BottomK.
    "q402_apriori_triples" -> { (s, d) =>
      val b = basket(s, d)
      val freq1 = b.groupBy("pk").agg(count(lit(1)).as("s1"))
        .filter(col("s1") >= 2).select("pk")
      val fb0 = b.join(freq1, Seq("pk"))
      // result-neutral second prune: only baskets holding ≥ 3
      // frequent items can produce a triple — this is the cut that
      // keeps the 3-way join linear in surviving baskets at scale
      val ok3 = fb0.groupBy("ok").agg(count(lit(1)).as("ni"))
        .filter(col("ni") >= 3).select("ok")
      val fb = fb0.join(ok3, Seq("ok"))
      val triples = fb.select(col("ok"), col("pk").as("pa"))
        .join(fb.select(col("ok"), col("pk").as("pb")), Seq("ok"))
        .filter(col("pa") < col("pb"))
        .join(fb.select(col("ok"), col("pk").as("pc")), Seq("ok"))
        .filter(col("pb") < col("pc"))
        .groupBy("pa", "pb", "pc").agg(count(lit(1)).as("supp_abc"))
        .filter(col("supp_abc") >= 2)
      graft.operators.BottomK.perGroup(triples, Seq.empty,
          Seq(col("supp_abc").desc, col("pa"), col("pb"), col("pc")), 10)
        .orderBy(col("supp_abc").desc, col("pa"), col("pb"), col("pc"))
    },

    // Distinct customers over a trailing 3-month window. Spark has no
    // COUNT(DISTINCT) OVER, and emulating it with a window would drag
    // the full row set through one task — instead each (month,
    // customer) pair EXPANDS to the ≤3 windows it can serve
    // (map-side explode, shuffle on the window key, exact distinct
    // agg). Output-linear at any scale.
    "q403_rolling_distinct" -> { (s, d) =>
      val mc = Tables.orders(s, d)
        .select(expr(
          "(year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1")
          .as("mi"), col("o_custkey").as("ck"))
        .distinct()
      val months = mc.select("mi").distinct()
      val u1 = mc.groupBy("mi")
        .agg(countDistinct("ck").as("u1"))
      val u3 = mc
        .select(col("ck"), explode(expr("sequence(mi, mi + 2)")).as("tm"))
        .groupBy("tm").agg(countDistinct("ck").as("u3"))
      months.join(u1, Seq("mi"))
        .join(u3.withColumnRenamed("tm", "mi"), Seq("mi"))
        .withColumn("overlap_milli", expr(
          "CASE WHEN u3 = 0 THEN NULL ELSE u1 * 1000 div u3 END"))
        .select(expr("CAST(mi AS BIGINT)").as("mi"), col("u1"),
          col("u3"), col("overlap_milli"))
        .orderBy("mi")
    },

    // Rolling-origin backtest of the seasonal-naive forecast
    // (ŷ_m = y_{m−12}) against the naive-1 benchmark (ŷ_m = y_{m−1})
    // on monthly revenue: per test year, WAPE and the MASE-style
    // ratio of the two error masses. Bounded month frame, two
    // self-joins, every ratio integer-quantized.
    "q404_seasonal_backtest" -> { (s, d) =>
      val m = Tables.orders(s, d)
        .groupBy(expr(
          "(year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1")
          .as("mi"))
        .agg(sum(expr(CentsF))
          .as("y"))
      m.join(broadcast(m.select(col("mi").as("m12"),
          col("y").as("y12"))), col("mi") - 12 === col("m12"))
        .join(broadcast(m.select(col("mi").as("m1"),
          col("y").as("y1"))), col("mi") - 1 === col("m1"))
        .groupBy(expr("1992 + mi div 12").as("yr"))
        .agg(count(lit(1)).as("n_test"), sum("y").as("sum_y"),
          sum(expr("abs(y - y12)")).as("sum_ae12"),
          sum(expr("abs(y - y1)")).as("sum_ae1"))
        .withColumn("wape12_milli", expr(
          "CASE WHEN sum_y = 0 THEN NULL " +
            "ELSE sum_ae12 * 1000 div sum_y END"))
        .withColumn("mase_milli", expr(
          "CASE WHEN sum_ae1 = 0 THEN NULL " +
            "ELSE sum_ae12 * 1000 div sum_ae1 END"))
        .select("yr", "n_test", "sum_y", "sum_ae12", "sum_ae1",
          "wape12_milli", "mase_milli")
        .orderBy("yr")
    },

    // Deequ-style constraint-suite report over orders: completeness,
    // domain membership, range, referential integrity, and key
    // uniqueness as one (constraint, observed_milli, threshold,
    // passed) table — the validation gate a pipeline runs before
    // promoting a new drop. Each lane is one exact aggregate; the
    // referential lane is a distinct + left join like q392.
    "q405_constraint_report" -> { (s, d) =>
      val o = Tables.orders(s, d)
      // the four single-table lanes share ONE aggregate pass (vs one
      // full scan each), then unpivot to report rows
      val tbl = o.agg(
          expr("count(o_custkey) * 1000 div count(1)").as("m1"),
          expr("coalesce(sum(CASE WHEN o_orderstatus IN ('F','O','P') " +
            "THEN 1 ELSE 0 END), 0) * 1000 div count(1)").as("m2"),
          expr("coalesce(sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 " +
            "END), 0) * 1000 div count(1)").as("m3"),
          expr("count(DISTINCT o_orderkey) * 1000 div count(1)")
            .as("m5"))
        .selectExpr(
          """stack(4,
            |  'c1_complete_custkey', m1,
            |  'c2_domain_status',    m2,
            |  'c3_range_price_pos',  m3,
            |  'c5_unique_orderkey',  m5) as (constraint, observed_milli)"""
            .stripMargin)
        .withColumn("threshold_milli", lit(1000L))
      val ref = o.select(col("o_custkey").as("v")).distinct()
        .join(Tables.customer(s, d)
          .select(col("c_custkey").as("v")).distinct()
          .withColumn("hit", lit(1)), Seq("v"), "left")
        .agg(expr("count(hit) * 1000 div count(1)")
          .as("observed_milli"))
        .withColumn("constraint", lit("c4_ref_custkey"))
        .withColumn("threshold_milli", lit(1000L))
      tbl.unionByName(ref)
        .withColumn("passed", expr("observed_milli >= threshold_milli"))
        .select("constraint", "observed_milli", "threshold_milli",
          "passed")
        .orderBy("constraint")
    },

    // Exact 1-D energy distance between embedding label groups 0/1
    // (distribution-shift gate on the first coordinate, micro-
    // quantized): E = 2E|X−Y| − E|X−X'| − E|Y−Y'|. The pairwise
    // absolute-difference masses come from ONE sorted pass with
    // exclusive prefix lanes — Σ|vᵢ−vⱼ| = Σₖ cₖ(vₖ·C₍<ₖ₎ − S₍<ₖ₎) —
    // so the O(n²) definition costs O(n log n) distributed: the four
    // cumulative lanes ride GlobalOrder.withRunningSums in one pass,
    // never a single-partition window.
    "q406_energy_distance" -> { (s, d) =>
      val cls = Tables.embeddings(s, d)
        .filter(expr("label IN (0, 1)"))
        .select(col("label"), expr(
          "CAST(floor(CAST(element_at(embedding, 1) AS DOUBLE) " +
            "* 1000000) AS BIGINT)").as("v"))
        .groupBy("v")
        .agg(coalesce(sum(expr("CASE WHEN label = 0 THEN 1 ELSE 0 END")),
          lit(0L)).as("cx"),
          coalesce(sum(expr("CASE WHEN label = 1 THEN 1 ELSE 0 END")),
            lit(0L)).as("cy"))
      val cum = graft.plans.GlobalOrder.withRunningSums(
        cls, Seq(col("v")), col("v"),
        Seq(col("cx") -> "cum_cx", expr("cx * v") -> "cum_sx",
          col("cy") -> "cum_cy", expr("cy * v") -> "cum_sy"))
      val agg = cum
        .withColumn("cx_ex", expr("cum_cx - cx"))
        .withColumn("sx_ex", expr("cum_sx - cx * v"))
        .withColumn("cy_ex", expr("cum_cy - cy"))
        .withColumn("sy_ex", expr("cum_sy - cy * v"))
        // pair-mass lanes are O(n²·v_range): WIDE sums (a BIGINT lane
        // overflows near 2·10⁶ rows); the BIGINT output casts hold to
        // ~10⁷ rows — the honest ceiling for these diagnostic columns
        .agg(sum("cx").as("nx"), sum("cy").as("ny"),
          coalesce(sum(expr(
            s"${Sp.wide("cx")} * (v * cy_ex - sy_ex) " +
              s"+ ${Sp.wide("cy")} * (v * cx_ex - sx_ex)")),
            expr(Sp.wide("0"))).as("a_cross"),
          coalesce(sum(expr(
            s"2 * ${Sp.wide("cx")} * (v * cx_ex - sx_ex)")),
            expr(Sp.wide("0"))).as("b_xx"),
          coalesce(sum(expr(
            s"2 * ${Sp.wide("cy")} * (v * cy_ex - sy_ex)")),
            expr(Sp.wide("0"))).as("c_yy"))
      agg
        .withColumn("num_w", expr(
          s"greatest(2 * ${Sp.wide("a_cross")} * nx * ny " +
            s"- ${Sp.wide("b_xx")} * ny * ny " +
            s"- ${Sp.wide("c_yy")} * nx * nx, ${Sp.wide("0")})"))
        .withColumn("den_w", expr(
          s"${Sp.wide("nx")} * nx * ny * ny"))
        .withColumn("e_micro", expr(
          "CASE WHEN den_w <= 0 THEN NULL ELSE " +
            s"CAST(${Sp.intDiv("num_w * 1000000", "den_w")} AS BIGINT) " +
            "END"))
        .select(col("nx"), col("ny"),
          expr("CAST(a_cross AS BIGINT)").as("a_cross"),
          expr("CAST(b_xx AS BIGINT)").as("b_xx"),
          expr("CAST(c_yy AS BIGINT)").as("c_yy"), col("e_micro"))
    },

    // Split-conformal calibration on event values: per-type exact
    // medians from the calibration half (portable-hash split), the
    // 90% conformal quantile q̂ as the ceil((n+1)·0.9)-th smallest
    // nonconformity — an EXACT distributed selection via
    // GlobalOrder.withRowNumber, never a single-partition sort — and
    // the held-out coverage share, which should straddle 900‰.
    "q407_conformal_coverage" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_id").as("id"), col("event_type").as("et"),
          expr("CAST(floor(value * 1000) AS BIGINT)").as("v"))
        .withColumn("cal", expr(
          s"${Sp.hash64("concat('conf:', CAST(id AS STRING))")} % 2 = 0"))
      // exact per-type UPPER median of calibration values (cum·2 ≥
      // n+1 first holds at the upper of the two central values for
      // even n): weighted rank over the per-type distinct-value frame
      // (partitioned window — scales with types × distinct values,
      // not rows)
      val medCls = ev.filter(col("cal")).groupBy("et", "v")
        .agg(count(lit(1)).as("c"))
      val med = medCls
        .withColumn("cum", sum("c").over(
          Window.partitionBy("et").orderBy("v")))
        .withColumn("n_t", sum("c").over(Window.partitionBy("et")))
        .filter(expr("cum * 2 >= n_t + 1"))
        .groupBy("et").agg(min("v").as("med"))
      val scored = ev.join(med, Seq("et"))
        .withColumn("nc", expr("abs(v - med)"))
      val calN = scored.filter(col("cal"))
        .agg(count(lit(1)).as("n_cal"))
      val ranked = graft.plans.GlobalOrder.withRowNumber(
        scored.filter(col("cal")).select("nc", "id"),
        Seq(col("nc"), col("id")), col("nc"), "rk")
      val qhat = ranked.crossJoin(broadcast(calN))
        .filter(expr("rk = (9 * (n_cal + 1) + 9) div 10"))
        .select(col("nc").as("qhat"), col("n_cal"))
      scored.filter(!col("cal"))
        .crossJoin(broadcast(qhat))
        .agg(max("n_cal").as("n_cal"), max("qhat").as("qhat"),
          count(lit(1)).as("n_test"),
          coalesce(sum(expr("CASE WHEN nc <= qhat THEN 1 ELSE 0 END")),
            lit(0L)).as("n_cover"))
        .withColumn("cover_milli", expr(
          "CASE WHEN n_test = 0 THEN NULL " +
            "ELSE n_cover * 1000 div n_test END"))
        .select("n_cal", "n_test", "qhat", "n_cover", "cover_milli")
    },

    // Personalized PageRank seeded at every hundredth part node of
    // the q113 supply graph — "influence from this set", the seeded
    // corpus-expansion weighting. Identical scaled-integer recurrence
    // as q113 (order-independent sums, bit-identical across
    // partitionings AND engines); the oracle unrolls the same three
    // rounds with the teleport mass restricted to the seed rows.
    "q408_ppr" -> { (s, d) =>
      val edges = Relational2.supplyEdges(s, d)
      val seeds = Tables.lineitem(s, d)
        .select(col("l_partkey").as("node")).distinct()
        .filter(col("node") % 100 === 0)
      graft.operators.PageRank.personalized(edges, seeds, iterations = 3)
        .filter(col("rank_ppt") > 0)
        .orderBy("node")
    },

    // M4 time-series downsampling of the event value stream into
    // daily buckets: per bucket min/max/first/last — the published
    // error-free downsampling for line visualization. first/last ride
    // one partitioned two-direction row_number (shuffle by bucket,
    // within-bucket sort — bounded by rows-per-pixel, the M4
    // contract); min/max are plain map-side-combined aggregates.
    "q409_m4_downsample" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(expr("unix_micros(ts) div 86400000000").as("b"),
          expr("unix_micros(ts)").as("tsu"), col("event_id").as("id"),
          expr(Analytics2.VMilliF).as("v"))
      val wAsc = Window.partitionBy("b").orderBy(col("tsu"), col("id"))
      val wDesc = Window.partitionBy("b")
        .orderBy(col("tsu").desc, col("id").desc)
      val fl = ev
        .withColumn("ra", row_number().over(wAsc))
        .withColumn("rd", row_number().over(wDesc))
        .filter(col("ra") === 1 || col("rd") === 1)
        .groupBy("b")
        .agg(max(expr("CASE WHEN ra = 1 THEN v END")).as("v_first"),
          max(expr("CASE WHEN rd = 1 THEN v END")).as("v_last"))
      ev.groupBy("b")
        .agg(count(lit(1)).as("n"), min("v").as("v_min"),
          max("v").as("v_max"))
        .join(fl, Seq("b"))
        .select("b", "n", "v_min", "v_max", "v_first", "v_last")
        .orderBy("b")
    },

    // Exact isotonic regression (PAVA fit) on monthly revenue via the
    // minimax identity ŷᵢ = max_{j≤i} min_{k≥i} mean(y[j..k]) — the
    // sequential pool-adjacent-violators loop becomes three bounded
    // relational steps: interval means from prefix sums (months²
    // intervals), an i×interval containment join, and a min-then-max
    // rollup. Means quantize to micro through one wide division
    // BEFORE the minimax (deterministic on both engines).
    "q410_isotonic" -> { (s, d) =>
      val m = Tables.orders(s, d)
        .groupBy(expr(
          "(year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1")
          .as("mi"))
        .agg(sum(expr(CentsF))
          .as("y"))
      // bounded month frame — the day/ym window convention
      val c = m.withColumn("p", sum("y").over(Window.orderBy("mi")))
      val jSide = c.select(col("mi").as("j"),
        expr("p - y").as("pjm1"))
      val kSide = c.select(col("mi").as("k"), col("p").as("pk"))
      val iv = jSide.join(broadcast(kSide), col("j") <= col("k"))
        .withColumn("a_micro", expr(
          s"CAST(${Sp.intDiv(Sp.wide("pk - pjm1") + " * 1000000",
            "(k - j + 1)")} AS BIGINT)"))
        .select("j", "k", "a_micro")
      m.select(col("mi"), col("y"))
        .join(broadcast(iv),
          col("j") <= col("mi") && col("mi") <= col("k"))
        .groupBy("mi", "y", "j").agg(min("a_micro").as("mn"))
        .groupBy("mi", "y").agg(max("mn").as("yhat_micro"))
        .select(expr("CAST(mi AS BIGINT)").as("mi"), col("y"),
          col("yhat_micro"))
        .orderBy("mi")
    },

    // Dynamic time warping between the 1995 and 1996 monthly revenue
    // curves — the whole O(12²) DP runs inside ONE nested-fold
    // expression (array accumulator = DP row), entirely in exact
    // integer cents, so the "Spark can't do sequential DP" objection
    // dissolves for bounded series: the recurrence is data-parallel
    // across groups even though it is sequential within one. L1
    // distance rides along as the no-warp baseline.
    "q411_dtw" -> { (s, d) =>
      val m = Tables.orders(s, d)
        .filter(expr("year(o_orderdate) IN (1995, 1996)"))
        .groupBy(expr("year(o_orderdate)").as("yr"),
          expr("month(o_orderdate)").as("mo"))
        .agg(sum(expr(CentsF))
          .as("yc"))
      val arrs = m.groupBy("yr").agg(expr(
        "transform(sort_array(collect_list(struct(mo, yc))), s -> s.yc)")
        .as("arr"))
      val a = arrs.filter(col("yr") === 1995)
        .select(col("arr").as("a"))
      val b = arrs.filter(col("yr") === 1996)
        .select(col("arr").as("b"))
      val big = "9223372036854775807L"
      val initRow =
        "aggregate(sequence(1, 12), cast(array() as array<bigint>), " +
          "(row, j) -> concat(row, array(" +
          "abs(element_at(a, 1) - element_at(b, j)) + " +
          "if(j > 1, element_at(row, j - 1), 0L))))"
      val dp =
        s"aggregate(sequence(2, 12), $initRow, " +
          "(acc, i) -> aggregate(sequence(1, 12), " +
          "cast(array() as array<bigint>), " +
          "(row, j) -> concat(row, array(" +
          "abs(element_at(a, i) - element_at(b, j)) + least(" +
          "element_at(acc, j), " +
          s"if(j > 1, element_at(acc, j - 1), $big), " +
          s"if(j > 1, element_at(row, j - 1), $big))))))"
      a.crossJoin(broadcast(b))
        .withColumn("n_a", expr("size(a)"))
        .withColumn("n_b", expr("size(b)"))
        .withColumn("dtw_cents", expr(s"element_at($dp, 12)"))
        .withColumn("l1_cents", expr(
          "aggregate(zip_with(a, b, (x, y) -> abs(x - y)), 0L, " +
            "(acc, v) -> acc + v)"))
        .select("n_a", "n_b", "dtw_cents", "l1_cents")
    },

    // Rank-based AUC (Mann–Whitney with midranks) of the event value
    // as a 'purchase' classifier: midrank sums stay exact through the
    // ×2 lanes over the distinct-value class frame, whose cumulative
    // count rides GlobalOrder (value classes are row-scale). AUC
    // should hover near 500000 micro — value carries no type signal —
    // which the oracle confirms bit-exactly rather than approximately.
    "q412_auc" -> { (s, d) =>
      val cls = Tables.events(s, d)
        .select(expr(Analytics2.VMilliF).as("v"),
          expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
            .as("pos"))
        .groupBy("v").agg(count(lit(1)).as("c"), sum("pos").as("c1"))
      val cum = graft.plans.GlobalOrder.withRunningSum(
        cls, Seq(col("v")), col("v"), col("c"), "cum_c")
      cum.withColumn("c_ex", expr("cum_c - c"))
        .agg(sum("c1").as("n_pos"),
          sum(expr("c - c1")).as("n_neg"),
          coalesce(sum(expr("c1 * (2 * c_ex + c + 1)")), lit(0L))
            .as("rs2"))
        .withColumn("u2", expr("rs2 - n_pos * (n_pos + 1)"))
        .withColumn("auc_micro", expr(
          "CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL ELSE " +
            s"CAST(${Sp.intDiv(Sp.wide("u2") + " * 1000000",
              "(2 * " + Sp.wide("n_pos") + " * n_neg)")} AS BIGINT) " +
            "END"))
        .select("n_pos", "n_neg", "u2", "auc_micro")
    },

    // TPC-H Q17 adapted (no partsupp in this schema): small-quantity-
    // order revenue for one brand, where "small" is the correlated
    // 20%-of-part-average condition rewritten as the pure integer
    // cross-multiplication qty·5·cnt < Σqty — the decorrelated
    // per-part pre-aggregate joins back instead of a per-row scalar
    // subquery, which is the plan you want at 100 TB anyway.
    "q413_small_qty_revenue" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val pa = li.groupBy(col("l_partkey").as("pk"))
        .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("sq"),
          count(lit(1)).as("cnt"))
      li.join(Tables.part(s, d).filter(col("p_brand") === "Brand#4"),
          col("l_partkey") === col("p_partkey"))
        .join(pa, col("l_partkey") === col("pk"))
        .filter(expr("CAST(l_quantity AS BIGINT) * 5 * cnt < sq"))
        .agg(count(lit(1)).as("n_small"),
          coalesce(sum(expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 " +
              "AS BIGINT)")), lit(0L)).as("rev_cents"))
        .withColumn("avg_yearly_cents", expr("rev_cents div 7"))
        .select("n_small", "rev_cents", "avg_yearly_cents")
    },

    // TPC-H Q18 adapted: large-volume orders (Σqty > 250) with their
    // customer, top-100 by total price. The HAVING pre-aggregate
    // shrinks the fact side BEFORE the customer join, and the top-100
    // rides the BottomK bounded heap.
    "q414_large_volume_orders" -> { (s, d) =>
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey").as("ok"))
        .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("sum_qty"))
        .filter(col("sum_qty") > 250)
      val j = Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("ok"))
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey").as("custkey"),
          col("c_mktsegment").as("mktsegment"),
          col("o_orderkey").as("orderkey"),
          expr(CentsF).as("cents"),
          col("sum_qty"))
      graft.operators.BottomK.perGroup(j, Seq.empty,
          Seq(col("cents").desc, col("orderkey")), 100)
        .orderBy(col("cents").desc, col("orderkey"))
    },

    // Simplified silhouette on SQUARED centroid distances per label
    // (the sqrt-free variant keeps every lane integer): a² = distance
    // to own centroid, b² = min over other labels, s = (b²−a²)/max.
    // Centroids reuse the q286 floor-div milli lanes; the vec×centroid
    // distance join fans each vector to 10 labels across 64 dims —
    // map-side arithmetic, one shuffle on (vec, label).
    "q415_silhouette" -> { (s, d) =>
      val vq = Tables.spread(Tables.embeddings(s, d))
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .withColumn("q1000", expr(
          "CAST(floor(CAST(v AS DOUBLE) * 32768.0) AS BIGINT) * 1000"))
      val cm = vq
        .groupBy(col("label").as("label_c"), col("pos"))
        .agg(expr("sum(q1000 div 1000)").as("sq"),
          count(lit(1)).as("cnt"))
        .withColumn("cmilli", expr(
          "((sq * 1000) - (((sq * 1000) % cnt + cnt) % cnt)) div cnt"))
        .select("label_c", "pos", "cmilli")
      val d2 = vq.join(broadcast(cm), Seq("pos"))
        .groupBy("vec_id", "label", "label_c")
        .agg(sum(expr(
          "(q1000 - cmilli) * (q1000 - cmilli)")).as("dd"))
      val ab = d2.groupBy("vec_id", "label")
        .agg(max(expr("CASE WHEN label_c = label THEN dd END"))
          .as("a2"),
          min(expr("CASE WHEN label_c <> label THEN dd END")).as("b2"))
        .withColumn("s_micro", expr(
          "CASE WHEN greatest(a2, b2) = 0 THEN 0 " +
            "WHEN b2 >= a2 THEN CAST(" +
            s"${Sp.intDiv(Sp.wide("b2 - a2") + " * 1000000",
              "greatest(a2, b2)")} AS BIGINT) " +
            "ELSE -CAST(" +
            s"${Sp.intDiv(Sp.wide("a2 - b2") + " * 1000000",
              "greatest(a2, b2)")} AS BIGINT) END"))
      ab.groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          sum("s_micro").as("sum_s"),
          coalesce(sum(expr("CASE WHEN s_micro > 0 THEN 1 ELSE 0 END")),
            lit(0L)).as("n_pos"))
        .withColumn("mean_s_micro", expr(
          "CASE WHEN n_vecs = 0 THEN NULL " +
            "WHEN sum_s >= 0 THEN sum_s div n_vecs " +
            "ELSE -((-sum_s) div n_vecs) END"))
        .select("label", "n_vecs", "sum_s", "mean_s_micro", "n_pos")
        .orderBy("label")
    },

    // Newman modularity of the brand partition over the co-purchase
    // graph: Q·4m² = Σ_c (4m·L_c − d_c²) keeps the whole statistic
    // integer (the only division is the final micro quantization,
    // sign-split because Q can be negative). Edges are the q396
    // basket pairs collapsed to distinct; degrees and communities via
    // two joins against part.p_brand.
    "q416_modularity" -> { (s, d) =>
      val b = basket(s, d)
      val edges = b.select(col("ok"), col("pk").as("pa"))
        .join(b.select(col("ok"), col("pk").as("pb")), Seq("ok"))
        .filter(col("pa") < col("pb"))
        .select("pa", "pb").distinct()
      val brand = Tables.part(s, d)
        .select(col("p_partkey").as("pk"), col("p_brand").as("c"))
      val e2 = edges
        .join(brand.select(col("pk").as("pa"), col("c").as("ca")),
          Seq("pa"))
        .join(brand.select(col("pk").as("pb"), col("c").as("cb")),
          Seq("pb"))
      val m = e2.agg(count(lit(1)).as("m_edges"))
      val lc = e2.filter(col("ca") === col("cb"))
        .groupBy(col("ca").as("c")).agg(count(lit(1)).as("l_c"))
      val dc = e2.select(col("ca").as("c"))
        .unionAll(e2.select(col("cb").as("c")))
        .groupBy("c").agg(count(lit(1)).as("d_c"))
      val per = dc.join(lc, Seq("c"), "left")
        .na.fill(0L, Seq("l_c"))
        .crossJoin(broadcast(m))
        .agg(count(lit(1)).as("n_comms"), max("m_edges").as("m_edges"),
          coalesce(sum(expr(
            s"4 * ${Sp.wide("m_edges")} * l_c " +
              s"- ${Sp.wide("d_c")} * d_c")), expr(Sp.wide("0")))
            .as("num_w"))
      per.withColumn("den_w", expr(
          s"4 * ${Sp.wide("m_edges")} * m_edges"))
        .withColumn("q_micro", expr(
          "CASE WHEN den_w <= 0 THEN NULL " +
            "WHEN num_w >= 0 THEN CAST(" +
            s"${Sp.intDiv("num_w * 1000000", "den_w")} AS BIGINT) " +
            "ELSE -CAST(" +
            s"${Sp.intDiv("(-num_w) * 1000000", "den_w")} AS BIGINT) " +
            "END"))
        .select(col("m_edges"), col("n_comms"),
          expr("CAST(num_w AS BIGINT)").as("num"), col("q_micro"))
    },

    // Exact 5% trimmed and winsorized means of order value at row
    // scale: the global rank is GlobalOrder's two-phase distributed
    // row_number (never a single-partition sort), the two clamp
    // values are rank selections, and every mean is an integer cents
    // division.
    "q417_trimmed_mean" -> { (s, d) =>
      val x = Tables.orders(s, d).select(
        col("o_orderkey").as("id"),
        expr(CentsF)
          .as("x"))
      val rk = graft.plans.GlobalOrder.withRowNumber(
        x, Seq(col("x"), col("id")), col("x"), "rk",
        countName = Some("n"))
      // countName already stamps the exact total on every row — no
      // second pass over the ranked lineage needed
      val lim = rk.withColumnRenamed("n", "n_tot")
        .withColumn("k", expr("n_tot div 20"))
      val bounds = lim
        .filter(expr("rk = k + 1 OR rk = n_tot - k"))
        .agg(min("x").as("lo_x"), max("x").as("hi_x"))
      lim.crossJoin(broadcast(bounds))
        .agg(max("n_tot").as("n"), max("k").as("k"),
          max("lo_x").as("lo_x"), max("hi_x").as("hi_x"),
          sum("x").as("sum_all"),
          coalesce(sum(expr(
            "CASE WHEN rk > k AND rk <= n_tot - k THEN x END")), lit(0L))
            .as("sum_mid"),
          coalesce(sum(expr(
            "CASE WHEN rk > k AND rk <= n_tot - k THEN 1 ELSE 0 END")),
            lit(0L)).as("n_mid"))
        .withColumn("mean_cents", expr(
          "CASE WHEN n = 0 THEN NULL ELSE sum_all div n END"))
        .withColumn("trimmed_mean_cents", expr(
          "CASE WHEN n_mid = 0 THEN NULL ELSE sum_mid div n_mid END"))
        .withColumn("winsor_mean_cents", expr(
          "CASE WHEN n = 0 THEN NULL " +
            "ELSE (sum_mid + k * lo_x + k * hi_x) div n END"))
        .select("n", "k", "lo_x", "hi_x", "mean_cents",
          "trimmed_mean_cents", "winsor_mean_cents")
    },

    // Kendall's W (concordance of the 7 yearly revenue rankings of
    // the 25 nations): doubled midranks keep ties integer, S2 =
    // Σ(R2 − m(n+1))² is exact, and W = 3·S2/(m²(n³−n) − m·ΣT) needs
    // one guarded division. Bounded frames throughout (nations ×
    // years); the heavy lifting is the map-side revenue rollup.
    "q418_kendall_w" -> { (s, d) =>
      val rev = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .groupBy(expr("CAST(year(o_orderdate) AS BIGINT)").as("yr"),
          expr("CAST(c_nationkey AS BIGINT)").as("nk"))
        .agg(sum(expr(CentsF))
          .as("rev"))
      val ranked = rev
        .withColumn("mr", rank().over(
          Window.partitionBy("yr").orderBy("rev")))
        .withColumn("t", count(lit(1)).over(
          Window.partitionBy("yr", "rev")))
        .withColumn("r2", expr("2 * mr + t - 1"))
      val ties = ranked.select("yr", "rev", "t").distinct()
        .groupBy("yr").agg(coalesce(sum(expr("t * t * t - t")), lit(0L))
          .as("t_j"))
        .agg(sum("t_j").as("sum_t"), count(lit(1)).as("m_raters"))
      val rsum = ranked.groupBy("nk").agg(sum("r2").as("r2_i"))
      val nItems = rsum.agg(count(lit(1)).as("n_items"))
      val s2 = rsum.crossJoin(broadcast(nItems))
        .crossJoin(broadcast(ties))
        .agg(max("n_items").as("n_items"), max("m_raters").as("m_raters"),
          max("sum_t").as("sum_t"),
          coalesce(sum(expr(
            "(r2_i - m_raters * (n_items + 1)) * " +
              "(r2_i - m_raters * (n_items + 1))")), lit(0L)).as("s2"))
      s2.withColumn("den", expr(
          "m_raters * m_raters * " +
            "(n_items * n_items * n_items - n_items) " +
            "- m_raters * sum_t"))
        .withColumn("w_micro", expr(
          "CASE WHEN den <= 0 THEN NULL " +
            "ELSE 3 * s2 * 1000000 div den END"))
        .select("n_items", "m_raters", "sum_t", "s2", "w_micro")
    },

    // Nearest-centroid classifier accuracy on the embeddings: assign
    // every vector to its closest label centroid (exact integer
    // squared distances in the q415 lanes, ties to the smallest
    // label) and report per-label recall — the cluster-quality gate
    // run after any labeling/clustering step. The argmin is a
    // per-vector bounded window (10 candidate labels), never global.
    "q419_centroid_accuracy" -> { (s, d) =>
      val pred = centroidPred(s, d)
      pred.groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          coalesce(sum(expr(
            "CASE WHEN label_c = label THEN 1 ELSE 0 END")), lit(0L))
            .as("n_correct"))
        .withColumn("recall_milli", expr(
          "CASE WHEN n_vecs = 0 THEN NULL " +
            "ELSE n_correct * 1000 div n_vecs END"))
        .select("label", "n_vecs", "n_correct", "recall_milli")
        .orderBy("label")
    },

    // Decile gains/lift table for the event-value 'purchase'
    // classifier (companion to q412's AUC): global rank by descending
    // value via GlobalOrder on the NEGATED key (ascending two-phase
    // rank — never a single-partition sort), decile from pure integer
    // arithmetic, cumulative gains over the bounded 10-row frame.
    "q420_decile_gains" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_id").as("id"),
          expr(s"-(${Analytics2.VMilliF})").as("nv"),
          expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
            .as("pos"))
      val rk = graft.plans.GlobalOrder.withRowNumber(
        ev, Seq(col("nv"), col("id")), col("nv"), "rk",
        countName = Some("n"))
      val dec = rk
        .withColumn("decile", expr("((rk - 1) * 10) div n"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_d"), sum("pos").as("n_pos"))
      val tot = dec.agg(sum("n_pos").as("tot_pos"), sum("n_d").as("n"))
      dec.crossJoin(broadcast(tot))
        .withColumn("cum_pos", sum("n_pos").over(
          Window.orderBy("decile"))) // bounded: 10 rows
        .withColumn("gain_milli", expr(
          "CASE WHEN tot_pos = 0 THEN NULL " +
            "ELSE cum_pos * 1000 div tot_pos END"))
        .withColumn("lift_milli", expr(
          "CASE WHEN n_d = 0 OR tot_pos = 0 THEN NULL " +
            s"ELSE CAST(${Sp.intDiv(Sp.wide("n_pos") + " * n * 1000",
              "(" + Sp.wide("n_d") + " * tot_pos)")} AS BIGINT) END"))
        .select("decile", "n_d", "n_pos", "cum_pos", "gain_milli",
          "lift_milli")
        .orderBy("decile")
    },

    // Bag-semantics set operations gate: EXCEPT ALL / INTERSECT ALL
    // keep multiplicities (the DISTINCT variants q36/q37 cover the
    // set forms). The multiset difference/intersection of the two
    // status groups' priority multisets is summarized per priority so
    // the gate stays small at any scale.
    "q421_bag_set_ops" -> { (s, d) =>
      val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderpriority").as("pri"))
      val p = Tables.orders(s, d).filter(col("o_orderstatus") === "P")
        .select(col("o_orderpriority").as("pri"))
      val ex = f.exceptAll(p).groupBy("pri")
        .agg(count(lit(1)).as("n"))
        .withColumn("op", lit("except_all"))
      val in = f.intersectAll(p).groupBy("pri")
        .agg(count(lit(1)).as("n"))
        .withColumn("op", lit("intersect_all"))
      ex.unionByName(in).select("op", "pri", "n").orderBy("op", "pri")
    },

    // Bigram language-model table: top-3 continuations for the 20
    // most frequent context tokens — the n-gram conditional table
    // behind cheap next-token scoring and corpus-drift checks. Both
    // top-k stages ride BottomK bounded heaps; bigrams come from one
    // position explode (map-side), counts map-side combine.
    "q422_bigram_lm" -> { (s, d) =>
      val bg = Tables.documents(s, d)
        .select(expr(Sp.tokens("text")).as("toks"))
        .filter(expr("size(toks) >= 2"))
        .select(explode(expr("sequence(1, size(toks) - 1)")).as("g"),
          col("toks"))
        .select(expr("element_at(toks, CAST(g AS INT))").as("w1"),
          expr("element_at(toks, CAST(g AS INT) + 1)").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c_bigram"))
      val uni = bg.groupBy("w1").agg(sum("c_bigram").as("c_unigram"))
      val top = graft.operators.BottomK.perGroup(uni, Seq.empty,
        Seq(col("c_unigram").desc, col("w1")), 20)
      val cont = bg.join(top, Seq("w1"))
      graft.operators.BottomK.perGroup(cont, Seq("w1"),
          Seq(col("c_bigram").desc, col("w2")), 3)
        .withColumn("p_milli", expr(
          "CASE WHEN c_unigram = 0 THEN NULL " +
            "ELSE c_bigram * 1000 div c_unigram END"))
        .select("w1", "w2", "c_bigram", "c_unigram", "p_milli")
        .orderBy(col("c_unigram").desc, col("w1"),
          col("c_bigram").desc, col("w2"))
    },

    // Dictionary/prefix-encoding advisor: within each first-token
    // block of part names, how many bytes would front-coding the
    // sort-ordered strings save? Neighbor pairs via a per-block lag
    // (partitioned window — blocks are the vocabulary, rows/block is
    // what scales), common-prefix length via a positional compare
    // array, everything integer.
    "q423_prefix_advisor" -> { (s, d) =>
      val p = Tables.part(s, d)
        .select(col("p_partkey").as("id"), col("p_name").as("nm"))
        .withColumn("blk", expr("substring_index(nm, ' ', 1)"))
      val w = Window.partitionBy("blk").orderBy("nm", "id")
      p.withColumn("prev", lag("nm", 1).over(w))
        .withColumn("minl", expr("least(length(nm), length(prev))"))
        // first mismatch position, computed ONCE (0 = full prefix)
        .withColumn("cpos", expr(
          """CASE WHEN prev IS NULL OR minl = 0 THEN NULL
            |  ELSE array_position(
            |    transform(sequence(1, CAST(minl AS INT)),
            |      i -> substring(nm, i, 1) = substring(prev, i, 1)),
            |    false) END""".stripMargin))
        .withColumn("cp", expr(
          "CASE WHEN prev IS NULL THEN 0 WHEN minl = 0 THEN 0 " +
            "WHEN cpos = 0 THEN minl ELSE cpos - 1 END"))
        .agg(count(lit(1)).as("n_strings"),
          coalesce(sum(expr("CASE WHEN prev IS NULL THEN 0 ELSE 1 END")),
            lit(0L)).as("n_pairs"),
          sum(expr("CAST(length(nm) AS BIGINT)")).as("total_bytes"),
          coalesce(sum("cp"), lit(0L)).as("saved_bytes"))
        .withColumn("save_milli", expr(
          "CASE WHEN total_bytes = 0 THEN NULL " +
            "ELSE saved_bytes * 1000 div total_bytes END"))
        .select("n_strings", "n_pairs", "total_bytes", "saved_bytes",
          "save_milli")
    },

    // Heaps'-law vocabulary-growth curve: distinct vocabulary after
    // each tenth of the global token stream. The global token
    // position comes from per-doc offsets (GlobalOrder running sum
    // over doc lengths — distributed, never a single-partition
    // window) plus the within-doc index; each token's FIRST position
    // then buckets into one of ten checkpoints and a bounded 10-row
    // cumulative finishes the curve.
    "q424_heaps_law" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), expr(Sp.tokens("text")).as("toks"))
        .withColumn("dlen", expr("CAST(size(toks) AS BIGINT)"))
      val off = graft.plans.GlobalOrder.withRunningSum(
        docs, Seq(col("doc_id")), col("doc_id"), col("dlen"), "cum")
      // one plain pass over docs — dlen ≥ 0 makes Σdlen = max(cum),
      // without re-running tokenization + the ranked spine
      val tot = docs.agg(coalesce(sum("dlen"), lit(0L)).as("total"))
      val fp = off.filter(col("dlen") >= 1)
        .select(col("cum") - col("dlen"), col("toks"))
        .toDF("offset", "toks")
        .select(col("offset"),
          posexplode(col("toks")).as(Seq("g0", "w")))
        .select(col("w"), (col("offset") + col("g0") + 1).as("pos"))
        .groupBy("w").agg(min("pos").as("fpos"))
      val curve = fp.crossJoin(broadcast(tot))
        .groupBy(expr("((fpos - 1) * 10) div total + 1").as("checkpoint"))
        .agg(count(lit(1)).as("new_vocab"))
      // full 10-row grid: a saturated vocabulary still reports every
      // checkpoint (new_vocab = 0 past saturation)
      tot.select(explode(expr("sequence(1L, 10L)")).as("checkpoint"),
          col("total"))
        .join(curve, Seq("checkpoint"), "left")
        .na.fill(0L, Seq("new_vocab"))
        .withColumn("vocab_cum", sum("new_vocab").over(
          Window.orderBy("checkpoint"))) // bounded: 10 rows
        .withColumn("tokens_seen", expr("checkpoint * total div 10"))
        .select("checkpoint", "tokens_seen", "new_vocab", "vocab_cum")
        .orderBy("checkpoint")
    },

    // Optimizer cost-model validation: the textbook equi-join
    // cardinality estimate |A⋈B| ≈ |A|·|B|/max(ndv_A, ndv_B) against
    // the measured count for the three FK joins — the advisor that
    // tells you whether NDV statistics are good enough to trust join
    // reordering on this corpus. Integer lanes; error sign-split.
    "q425_cardinality_check" -> { (s, d) =>
      def lane(name: String, a: DataFrame, ka: String, b: DataFrame,
          kb: String): DataFrame = {
        val sa = a.agg(count(lit(1)).as("n_a"),
          countDistinct(col(ka)).as("ndv_a"))
        val sb = b.agg(count(lit(1)).as("n_b"),
          countDistinct(col(kb)).as("ndv_b"))
        val act = a.select(col(ka).as("k"))
          .join(b.select(col(kb).as("k")), Seq("k"))
          .agg(count(lit(1)).as("actual"))
        sa.crossJoin(broadcast(sb)).crossJoin(broadcast(act))
          .withColumn("join_name", lit(name))
      }
      lane("j1_li_part", Tables.lineitem(s, d), "l_partkey",
          Tables.part(s, d), "p_partkey")
        .unionByName(lane("j2_li_supplier", Tables.lineitem(s, d),
          "l_suppkey", Tables.supplier(s, d), "s_suppkey"))
        .unionByName(lane("j3_ord_customer", Tables.orders(s, d),
          "o_custkey", Tables.customer(s, d), "c_custkey"))
        .withColumn("est", expr(
          "CASE WHEN greatest(ndv_a, ndv_b) = 0 THEN NULL ELSE " +
            s"CAST(${Sp.intDiv(Sp.wide("n_a") + " * n_b",
              "greatest(ndv_a, ndv_b)")} AS BIGINT) END"))
        .withColumn("err_milli", expr(
          "CASE WHEN actual = 0 OR est IS NULL THEN NULL " +
            "WHEN est >= actual THEN (est - actual) * 1000 div actual " +
            "ELSE -((actual - est) * 1000 div actual) END"))
        .select("join_name", "n_a", "n_b", "ndv_a", "ndv_b", "actual",
          "est", "err_milli")
        .orderBy("join_name")
    },

    // Feature-hashing (hashing-trick) collision audit at 1024
    // buckets: how much of the vocabulary and how much of the token
    // MASS lands in collided buckets — the check run before choosing
    // a hashed feature width. Portable 60-bit hash, everything
    // integer.
    "q426_feature_hash_collisions" -> { (s, d) =>
      val vocab = Tables.documents(s, d)
        .select(explode(expr(Sp.tokens("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .withColumn("bkt", expr(
          s"${Sp.hash64("concat('fh:', w)")} % 1024"))
      val per = vocab.groupBy("bkt")
        .agg(count(lit(1)).as("k"), sum("c").as("mass"))
      per.agg(sum("k").as("n_vocab"),
          count(lit(1)).as("n_buckets_used"),
          coalesce(sum(expr("CASE WHEN k >= 2 THEN 1 ELSE 0 END")),
            lit(0L)).as("n_collided_buckets"),
          coalesce(sum(expr("CASE WHEN k >= 2 THEN k ELSE 0 END")),
            lit(0L)).as("collided_vocab"),
          max("k").as("max_bucket"),
          sum("mass").as("total_mass"),
          coalesce(sum(expr("CASE WHEN k >= 2 THEN mass ELSE 0 END")),
            lit(0L)).as("collided_mass"))
        .withColumn("vocab_coll_milli", expr(
          "CASE WHEN n_vocab = 0 THEN NULL " +
            "ELSE collided_vocab * 1000 div n_vocab END"))
        .withColumn("mass_coll_milli", expr(
          "CASE WHEN total_mass = 0 THEN NULL " +
            "ELSE collided_mass * 1000 div total_mass END"))
        .select("n_vocab", "n_buckets_used", "n_collided_buckets",
          "collided_vocab", "max_bucket", "total_mass",
          "collided_mass", "vocab_coll_milli", "mass_coll_milli")
    },

    // Behavioral Markov chain over event types: per-user transition
    // counts (one partitioned lag — scales with users), row-normalized
    // to parts-per-million, then three power-iteration rounds toward
    // the stationary distribution — all in the q113 scaled-integer
    // discipline (order-independent sums, bit-identical across
    // engines), over a types² matrix that is BOUNDED regardless of
    // row count.
    "q427_markov_stationary" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id").as("u"), col("event_type").as("et"),
          expr("unix_micros(ts)").as("tsu"), col("event_id").as("id"))
      val w = Window.partitionBy("u").orderBy("tsu", "id")
      val trans = ev.withColumn("prev", lag("et", 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy("prev", "et").agg(count(lit(1)).as("c"))
      val mat = trans
        .withColumn("row_tot", sum("c").over(
          Window.partitionBy("prev"))) // bounded: types² frame
        .withColumn("p_ppm", expr("c * 1000000 div row_tot"))
        .select(col("prev"), col("et").as("cur"), col("p_ppm"))
      val types = mat.select(col("prev").as("t")).distinct()
      var v = types.crossJoin(broadcast(
          types.agg(count(lit(1)).as("nt"))))
        .select(col("t"), expr("1000000 div nt").as("mass"))
      for (_ <- 1 to 3) {
        v = mat.join(v, col("prev") === col("t"))
          .groupBy(col("cur").as("t"))
          .agg(expr("sum(mass * p_ppm) div 1000000").as("mass"))
      }
      v.select(col("t").as("event_type"), col("mass").as("mass3_ppm"))
        .orderBy("event_type")
    },

    // Empirical-Bayes (beta-binomial, method-of-moments) shrinkage of
    // per-part return rates: the prior strength comes from the pooled
    // mean and the between-part variance of the micro-quantized rates
    // — every moment an exact integer sum, the prior itself one wide
    // division — and each part's shrunk rate is (k·10⁶ + a)/(n·10⁶ +
    // a + b). Reports the 10 parts the prior moves furthest (the
    // low-n outliers shrinkage exists to tame).
    "q428_eb_shrinkage" -> { (s, d) =>
      val pr = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("pk"))
        .agg(count(lit(1)).as("n"),
          coalesce(sum(expr(
            "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END")), lit(0L))
            .as("k"))
        .withColumn("r_micro", expr("k * 1000000 div n"))
      val mom = pr.agg(count(lit(1)).as("p_cnt"),
          sum("n").as("sum_n"), sum("k").as("sum_k"),
          sum("r_micro").as("sum_r"),
          sum(expr(s"${Sp.wide("r_micro")} * r_micro")).as("sum_r2_w"))
        .withColumn("m_micro", expr(
          "CASE WHEN sum_n = 0 THEN 0 ELSE sum_k * 1000000 div sum_n " +
            "END"))
        // between-part variance of the quantized rates, micro² units
        .withColumn("v_micro2", expr(
          "CASE WHEN p_cnt < 2 THEN 0 ELSE CAST(" +
            s"${Sp.intDiv(
              s"(p_cnt * sum_r2_w - ${Sp.wide("sum_r")} * sum_r)",
              "(" + Sp.wide("p_cnt") + " * (p_cnt - 1))")} AS BIGINT) " +
            "END"))
        // prior strength s = m(1−m)/v − 1, clamped at 0 (no prior)
        .withColumn("s_prior", expr(
          "CASE WHEN v_micro2 <= 0 THEN 0 ELSE greatest(" +
            "m_micro * (1000000 - m_micro) div v_micro2 - 1, 0) END"))
        .withColumn("a_micro", expr("m_micro * s_prior"))
        .withColumn("b_micro", expr("(1000000 - m_micro) * s_prior"))
        .select("m_micro", "v_micro2", "s_prior", "a_micro", "b_micro")
      val shrunk = pr.crossJoin(broadcast(mom))
        .withColumn("raw_milli", expr("k * 1000 div n"))
        .withColumn("shrunk_milli", expr(
          s"CAST(${Sp.intDiv(
            s"(${Sp.wide("k")} * 1000000 + a_micro) * 1000",
            s"(${Sp.wide("n")} * 1000000 + a_micro + b_micro)")} " +
            "AS BIGINT)"))
        .withColumn("diff_milli", expr(
          "abs(raw_milli - shrunk_milli)"))
      graft.operators.BottomK.perGroup(shrunk, Seq.empty,
          Seq(col("diff_milli").desc, col("pk")), 10)
        .select("pk", "n", "k", "raw_milli", "shrunk_milli",
          "diff_milli", "s_prior")
        .orderBy(col("diff_milli").desc, col("pk"))
    },

    // Exact Shapley attribution (3 binary features, full factorial):
    // how much of the return-rate lift belongs to high quantity, deep
    // discount, urgent priority? Cell rates micro-quantize first, the
    // 8-cell grid collapses to one row, and the ×6 Shapley weights
    // (2,1,1,2) keep every value integer — the classic explainability
    // op with zero floats.
    "q429_shapley_rates" -> { (s, d) =>
      val cells = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .select(
          expr("CASE WHEN CAST(l_quantity AS BIGINT) > 25 THEN 1 " +
            "ELSE 0 END").as("fa"),
          expr("CASE WHEN CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 " +
            "AS BIGINT) >= 5 THEN 1 ELSE 0 END").as("fb"),
          expr("CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') " +
            "THEN 1 ELSE 0 END").as("fc"),
          expr("CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END")
            .as("y"))
        .groupBy("fa", "fb", "fc")
        .agg(count(lit(1)).as("n"), sum("y").as("k"))
        .withColumn("r", expr("k * 1000000 div n"))
      def v(a: Int, b: Int, c: Int): String =
        s"max(CASE WHEN fa = $a AND fb = $b AND fc = $c THEN r END)"
      val wide = cells.agg(
        expr(v(0, 0, 0)).as("v000"), expr(v(1, 0, 0)).as("v100"),
        expr(v(0, 1, 0)).as("v010"), expr(v(0, 0, 1)).as("v001"),
        expr(v(1, 1, 0)).as("v110"), expr(v(1, 0, 1)).as("v101"),
        expr(v(0, 1, 1)).as("v011"), expr(v(1, 1, 1)).as("v111"))
      wide.selectExpr(
        """stack(3,
          |  'f1_high_qty',
          |    2 * (v100 - v000) + (v110 - v010) + (v101 - v001)
          |      + 2 * (v111 - v011),
          |  'f2_deep_discount',
          |    2 * (v010 - v000) + (v110 - v100) + (v011 - v001)
          |      + 2 * (v111 - v101),
          |  'f3_urgent',
          |    2 * (v001 - v000) + (v101 - v100) + (v011 - v010)
          |      + 2 * (v111 - v110)) as (feature, phi_x6_micro)"""
          .stripMargin,
        "v000", "v111")
        .select("feature", "phi_x6_micro", "v000", "v111")
        .orderBy("feature")
    },

    // Reciprocal-rank fusion of two document rankings (length-based
    // relevance proxy and hash-randomized tie-break ranking): each
    // ranking is an exact distributed row_number via GlobalOrder, the
    // fused score Σ⌊10⁹/(60+r)⌋ stays integer, top-10 by fusion. The
    // IR-stack combiner for merging retrieval channels.
    "q430_rrf_fusion" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          expr(Sp.hash64("concat('rrf:', CAST(doc_id AS STRING))"))
            .as("h"))
      val ra = graft.plans.GlobalOrder.withRowNumber(
        docs.select(col("doc_id"), expr("-n_chars").as("neg")),
        Seq(col("neg"), col("doc_id")), col("neg"), "ra")
        .select("doc_id", "ra")
      val rb = graft.plans.GlobalOrder.withRowNumber(
        docs.select("doc_id", "h"),
        Seq(col("h"), col("doc_id")), col("h"), "rb")
        .select("doc_id", "rb")
      val fused = ra.join(rb, Seq("doc_id"))
        .withColumn("rrf_nano", expr(
          "1000000000 div (60 + ra) + 1000000000 div (60 + rb)"))
      graft.operators.BottomK.perGroup(fused, Seq.empty,
          Seq(col("rrf_nano").desc, col("doc_id")), 10)
        .select("doc_id", "ra", "rb", "rrf_nano")
        .orderBy(col("rrf_nano").desc, col("doc_id"))
    },

    // Stratified ATT (average treatment effect on the treated):
    // treatment = urgent priority, outcome = any line shipped > 90
    // days after order, strata = (segment, order year) with common
    // support (both arms present). Cell rates micro-quantize first;
    // the treated-weighted difference is one sign-split division —
    // the observational-causal adjustment a naive rate diff gets
    // wrong whenever segment mix differs across arms.
    "q431_att_stratified" -> { (s, d) =>
      val base = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment").as("seg"),
          expr("CAST(year(o_orderdate) AS BIGINT)").as("yr"),
          expr("CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 " +
            "END").as("treated"),
          col("o_orderdate"))
      val withLate = base.join(
        Tables.lineitem(s, d).select("l_orderkey", "l_shipdate"),
        col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey", "seg", "yr", "treated")
        .agg(max(expr(
          "CASE WHEN datediff(CAST(l_shipdate AS DATE), " +
            "CAST(o_orderdate AS DATE)) > 90 THEN 1 ELSE 0 END"))
          .as("late"))
      val cell = withLate.groupBy("seg", "yr", "treated")
        .agg(count(lit(1)).as("n"), sum("late").as("k"))
        .withColumn("r_micro", expr("k * 1000000 div n"))
      val strata = cell.filter(col("treated") === 1)
        .select(col("seg"), col("yr"), col("n").as("n_t"),
          col("r_micro").as("rt"))
        .join(cell.filter(col("treated") === 0)
          .select(col("seg"), col("yr"), col("r_micro").as("rc")),
          Seq("seg", "yr")) // common support
      val naive = withLate.groupBy("treated")
        .agg(count(lit(1)).as("n"), sum("late").as("k"))
        .agg(coalesce(sum(expr(
          "CASE WHEN treated = 1 THEN (k * 1000000 div n) " +
            "ELSE -(k * 1000000 div n) END")), lit(0L))
          .as("naive_diff_micro"))
      strata.agg(count(lit(1)).as("n_strata"),
          sum("n_t").as("n_treated"),
          coalesce(sum(expr("n_t * (rt - rc)")), lit(0L)).as("num"))
        .crossJoin(broadcast(naive))
        .withColumn("att_micro", expr(
          "CASE WHEN n_treated = 0 THEN NULL " +
            "WHEN num >= 0 THEN num div n_treated " +
            "ELSE -((-num) div n_treated) END"))
        .select("n_strata", "n_treated", "att_micro",
          "naive_diff_micro")
    },

    // Partial-dependence profile of return rate vs quantity bucket,
    // marginalizing over the CORPUS discount mix (not the bucket's
    // own): per-cell rates and mix weights micro-quantize first, the
    // profile is one weighted sum per bucket with present-cell weight
    // renormalization. The model-free PD table that separates a
    // feature's effect from its correlated mix.
    "q432_partial_dependence" -> { (s, d) =>
      val li = Tables.lineitem(s, d).select(
        expr("CAST(l_quantity AS BIGINT) div 5").as("qb"),
        expr("CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("dc"),
        expr("CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END").as("y"))
      val mix = li.groupBy("dc").agg(count(lit(1)).as("n_d"))
      val wtot = mix.agg(sum("n_d").as("n_all"))
      val wm = mix.crossJoin(broadcast(wtot))
        .withColumn("w_ppm", expr("n_d * 1000000 div n_all"))
        .select("dc", "w_ppm")
      val cellr = li.groupBy("qb", "dc")
        .agg(count(lit(1)).as("n_c"), sum("y").as("k_c"))
        .withColumn("r_micro", expr("k_c * 1000000 div n_c"))
      val pd = cellr.join(broadcast(wm), Seq("dc"))
        .groupBy("qb")
        .agg(sum("n_c").as("n_rows"), sum("k_c").as("k_rows"),
          coalesce(sum(expr(s"${Sp.wide("w_ppm")} * r_micro")),
            expr(Sp.wide("0"))).as("wr_w"),
          coalesce(sum("w_ppm"), lit(0L)).as("w_present"))
        .withColumn("pd_micro", expr(
          "CASE WHEN w_present = 0 THEN NULL ELSE CAST(" +
            s"${Sp.intDiv("wr_w", Sp.wide("w_present"))} AS BIGINT) " +
            "END"))
        .withColumn("raw_micro", expr(
          "CASE WHEN n_rows = 0 THEN NULL " +
            "ELSE k_rows * 1000000 div n_rows END"))
      pd.select("qb", "n_rows", "pd_micro", "raw_micro").orderBy("qb")
    },

    // Benjamini–Hochberg FDR control (α = 0.05, m = 25) over the 25
    // per-nation one-proportion z-tests of return rate vs the corpus:
    // z = D/√(nᵢ·k₀·(n₀−k₀)) with D = kᵢn₀ − k₀nᵢ exact integer, the
    // step-up critical curve Φ⁻¹(1 − αk/2m) as pinned micro literals
    // (identical constants on both engines — exp/ln/Φ never enter
    // shared texts), and the rejection front computed on the bounded
    // 25-row frame. The multiple-testing discipline every per-segment
    // alerting pipeline needs.
    "q433_bh_fdr" -> { (s, d) =>
      val nat = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .groupBy(expr("CAST(c_nationkey AS BIGINT)").as("nk"))
        .agg(count(lit(1)).as("n"),
          coalesce(sum(expr(
            "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END")), lit(0L))
            .as("k"))
      val tot = nat.agg(sum("n").as("n0"), sum("k").as("k0"))
      val z = nat.crossJoin(broadcast(tot))
        .withColumn("dd", expr(s"${Sp.wide("k")} * n0 " +
          s"- ${Sp.wide("k0")} * n"))
        .withColumn("prod_w", expr(
          s"${Sp.wide("n")} * k0 * (n0 - k0)"))
        .withColumn("z_micro", expr(bhZF(Sp)))
        .withColumn("abs_z", expr(
          "CASE WHEN z_micro >= 0 THEN z_micro ELSE -z_micro END"))
      val crit = Seq(3090232L, 2878161L, 2747781L, 2652069L, 2575829L,
        2512144L, 2457263L, 2408915L, 2365618L, 2326347L, 2290367L,
        2257129L, 2226211L, 2197286L, 2170090L, 2144410L, 2120071L,
        2096927L, 2074854L, 2053748L, 2033520L, 2014090L, 1995393L,
        1977368L, 1959963L)
      val critSql = crit.zipWithIndex
        .map { case (c, i) => s"WHEN ${i + 1} THEN ${c}L" }
        .mkString("CASE rk ", " ", " END")
      val ranked = z
        .withColumn("rk", row_number().over(
          Window.orderBy(col("abs_z").desc, col("nk")))) // 25 rows
        .withColumn("crit_micro", expr(critSql))
      val kmax = ranked.agg(coalesce(max(expr(
        "CASE WHEN abs_z >= crit_micro THEN rk END")), lit(0L))
        .as("kmax"))
      ranked.crossJoin(broadcast(kmax))
        .withColumn("rejected", expr("rk <= kmax"))
        .select("nk", "n", "k", "z_micro", "rk", "crit_micro",
          "rejected")
        .orderBy("rk")
    },

    // Sorted-neighborhood entity-resolution blocking — the classic
    // alternative to q363's length bands: rank the vocabulary
    // lexicographically (distributed — the 8-byte big-endian prefix
    // key is monotone in the string order, so GlobalOrder buckets on
    // it), pair each token with its ≤3 successors via overlapping
    // rank bands (never a non-equi join at scale), and score
    // candidates with the codegen'd Damerau–Levenshtein.
    "q434_sorted_neighborhood" -> { (s, d) =>
      val v = Analytics3.partVocab(s, d)
        .withColumn("k8", expr(
          "aggregate(sequence(1, 8), 0L, (acc, i) -> acc * 256 + " +
            "CASE WHEN i <= length(t) THEN " +
            "CAST(ascii(substring(t, i, 1)) AS BIGINT) ELSE 0L END)"))
      val rk = graft.plans.GlobalOrder.withRowNumber(
        v, Seq(col("t")), col("k8"), "rk")
      val left = rk.select(col("t").as("ta"), col("rk").as("rka"),
        explode(expr("array(rk div 4, rk div 4 + 1)")).as("band"))
      val right = rk.select(col("t").as("tb"), col("rk").as("rkb"),
        expr("rkb div 4").as("band"))
      val cand = left.join(right, Seq("band"))
        .filter(expr("rkb - rka BETWEEN 1 AND 3"))
        .select("ta", "tb").distinct()
        .withColumn("dl", expr("damerau_levenshtein(ta, tb)"))
      cand.agg(count(lit(1)).as("n_candidates"),
          coalesce(sum(expr("CASE WHEN dl <= 2 THEN 1 ELSE 0 END")),
            lit(0L)).as("n_hits"))
        .crossJoin(broadcast(rk.agg(count(lit(1)).as("n_tokens"))))
        .withColumn("hit_milli", expr(
          "CASE WHEN n_candidates = 0 THEN NULL " +
            "ELSE n_hits * 1000 div n_candidates END"))
        .select("n_tokens", "n_candidates", "n_hits", "hit_milli")
    },

    // Effective supplier count per nation (inverse Simpson ×1000 on
    // quantity volumes): (Σw)²/Σw² — the diversity index that prices
    // supply concentration without entropy's logarithm. One rollup to
    // (nation, supplier) cells, one wide division per nation.
    "q435_effective_suppliers" -> { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(expr("CAST(s_nationkey AS BIGINT)").as("nk"),
          col("l_suppkey"))
        .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("w"))
        .groupBy("nk")
        .agg(count(lit(1)).as("n_suppliers"), sum("w").as("sw"),
          sum(expr(s"${Sp.wide("w")} * w")).as("sw2_w"))
        .withColumn("eff_milli", expr(
          "CASE WHEN sw2_w <= 0 THEN NULL ELSE CAST(" +
            s"${Sp.intDiv(Sp.wide("sw") + " * sw * 1000", "sw2_w")} " +
            "AS BIGINT) END"))
        .withColumn("eff_share_milli", expr(
          "CASE WHEN n_suppliers = 0 OR eff_milli IS NULL THEN NULL " +
            "ELSE eff_milli div n_suppliers END"))
        .select("nk", "n_suppliers", "sw", "eff_milli",
          "eff_share_milli")
        .orderBy("nk")
    },

    // Out-of-orderness histogram + watermark advisor: per user (with
    // event_id as the arrival proxy) the running event-time max in
    // arrival order prices each event's lateness; the log₂-bucketed
    // histogram plus the exact p99 (a GlobalOrder rank selection)
    // is precisely what you need to size withWatermark before
    // deploying a streaming job.
    "q436_lateness_histogram" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id").as("u"), col("event_id").as("id"),
          expr("unix_micros(ts)").as("tsu"))
      val w = Window.partitionBy("u").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lateReal = ev
        .withColumn("mx", max("tsu").over(w))
        .withColumn("late_ms", expr(
          "greatest(0L, mx - tsu) div 1000"))
      val n = lateReal.agg(count(lit(1)).as("n_all"))
      val rk = graft.plans.GlobalOrder.withRowNumber(
        lateReal.select("late_ms", "id"),
        Seq(col("late_ms"), col("id")), col("late_ms"), "rk")
      val p99 = rk.crossJoin(broadcast(n))
        .filter(expr("rk = (99 * n_all + 99) div 100"))
        .select(col("late_ms").as("p99_late_ms"))
      lateReal
        .withColumn("bucket", expr(
          "CASE WHEN late_ms = 0 THEN 0L " +
            "ELSE CAST(length(bin(late_ms)) AS BIGINT) END"))
        .groupBy("bucket").agg(count(lit(1)).as("n_events"))
        .crossJoin(broadcast(n)).crossJoin(broadcast(p99))
        .withColumn("share_milli", expr(
          "CASE WHEN n_all = 0 THEN NULL " +
            "ELSE n_events * 1000 div n_all END"))
        .select("bucket", "n_events", "share_milli", "p99_late_ms")
        .orderBy("bucket")
    },

    // Bipartiteness check within the 4-hop ball of the q203 seeds:
    // BFS parity colors the reached nodes, then one edges⋈hops⋈hops
    // join counts same-parity (conflict) edges — 0 proves the supply
    // graph 2-colorable locally, and any odd cycle would surface as a
    // positive count. Per-round join+agg discipline via operators.Bfs.
    "q437_bipartite_check" -> { (s, d) =>
      val edges = Relational2.supplyEdges(s, d)
      val seeds = Tables.lineitem(s, d)
        .select(col("l_partkey").as("node")).distinct()
        .filter(col("node") % 100 === 0)
      // ONE distinct edge pin shared by the BFS and the conflict
      // count (round-11, the q507 pattern): supplyEdges carries
      // lineitem multiplicity, and both consumers need the distinct
      // directed edges — the per-consumer dedup shuffle ran twice.
      // Via Bfs.prepare (round-12): projects (src, dst) before the
      // distinct (advisor — the call site must not silently break if
      // supplyEdges grows a column) and clusters the pin on src so
      // the BFS rounds AND the conflict join's first probe reuse the
      // pinned exchange instead of re-shuffling the edge frame.
      val e = graft.operators.Bfs.prepare(edges)
      val hops = graft.operators.Bfs.runPrepared(e, seeds, maxHops = 4)
      // eager 1-row materialization so the pin can be released before
      // returning (hops is checkpointed; nothing else reads e)
      val conflicts = e
        .join(hops.select(col("node").as("src"),
          expr("hops % 2").as("pa")), Seq("src"))
        .join(hops.select(col("node").as("dst"),
          expr("hops % 2").as("pb")), Seq("dst"))
        .agg(count(lit(1)).as("n_reached_edges"),
          coalesce(sum(expr("CASE WHEN pa = pb THEN 1 ELSE 0 END")),
            lit(0L)).as("n_conflicts"))
        .localCheckpoint(true)
      e.unpersist()
      hops.agg(count(lit(1)).as("n_reached"),
          coalesce(sum(expr("CASE WHEN hops % 2 = 0 THEN 1 ELSE 0 " +
            "END")), lit(0L)).as("n_even"))
        .crossJoin(broadcast(conflicts))
        .withColumn("bipartite_in_ball", expr("n_conflicts = 0"))
        .select("n_reached", "n_even", "n_reached_edges",
          "n_conflicts", "bipartite_in_ball")
    },

    // Hodges–Lehmann location estimator of monthly revenue: the
    // median of all Walsh averages (yᵢ+yⱼ)/2, i ≤ j — the robust
    // location partner to q394's Theil–Sen slope, same bounded
    // months² pair discipline, the ×2 lane defers the halving until
    // after the median so everything stays integer.
    "q439_hodges_lehmann" -> { (s, d) =>
      val m = Tables.orders(s, d)
        .groupBy(expr(
          "(year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1")
          .as("mi"))
        .agg(sum(expr(CentsF)).as("y"))
      val pairs = m.select(col("mi").as("ia"), col("y").as("ya"))
        .join(broadcast(m.select(col("mi").as("ib"), col("y").as("yb"))),
          col("ia") <= col("ib"))
        .select(expr("ya + yb").as("w2"))
      val cnt = pairs.agg(count(lit(1)).as("n_walsh"))
      val med = pairs
        .withColumn("rn", row_number().over(Window.orderBy("w2")))
        .crossJoin(broadcast(cnt))
        .filter(expr("rn = (n_walsh + 1) div 2"))
        .select(expr("w2 div 2").as("hl_cents"), col("n_walsh"))
      val medPlain = m
        .withColumn("rn", row_number().over(Window.orderBy("y")))
        .crossJoin(broadcast(m.agg(count(lit(1)).as("n_months"))))
        .filter(expr("rn = (n_months + 1) div 2"))
        .select(col("y").as("median_cents"), col("n_months"))
      medPlain.crossJoin(broadcast(med))
        .select("n_months", "n_walsh", "median_cents", "hl_cents")
    },

    // Wald–Wolfowitz runs-up-and-down test on daily order counts
    // (regime check on the SIGNS OF SUCCESSIVE DIFFERENCES — q364
    // tests runs above/below the median, a different null): zero
    // diffs drop, R runs against E[R]=(2N−1)/3 and Var=(16N−29)/90
    // where N = OBSERVATIONS = nd + 1 (nd below counts the nonzero
    // diffs, one fewer than the points they connect), so in nd the
    // moments read E[R]=(2nd+1)/3 and Var=(16nd−13)/90 — one shared
    // sqrt text.
    "q440_runs_updown" -> { (s, d) =>
      val day = Tables.orders(s, d)
        .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
        .agg(count(lit(1)).as("y"))
      val w = Window.orderBy("day") // bounded day frame
      val sgn = day
        .withColumn("diff", col("y") - lag("y", 1).over(w))
        .filter(expr("diff IS NOT NULL AND diff <> 0"))
        .withColumn("sg", expr("CASE WHEN diff > 0 THEN 1 ELSE -1 END"))
      val runs = sgn
        .withColumn("prev_sg", lag("sg", 1).over(Window.orderBy("day")))
        .agg(count(lit(1)).as("nd"),
          (coalesce(sum(expr(
            "CASE WHEN prev_sg IS NULL OR sg <> prev_sg THEN 1 " +
              "ELSE 0 END")), lit(0L))).as("r_runs"))
      runs.withColumn("z_micro", expr(
          "CASE WHEN nd < 2 OR 16 * nd - 13 <= 0 THEN NULL ELSE " +
            "CAST(floor(CAST(3 * r_runs - 2 * nd - 1 AS DOUBLE) / " +
            "CAST(3 AS DOUBLE) * sqrt(CAST(90 AS DOUBLE) / " +
            "CAST(16 * nd - 13 AS DOUBLE)) * " +
            "CAST(1000000 AS DOUBLE)) AS BIGINT) END"))
        .withColumn("reject_95", expr(
          "CASE WHEN z_micro IS NULL THEN NULL " +
            "ELSE z_micro > 1959964 OR z_micro < -1959964 END"))
        .select("nd", "r_runs", "z_micro", "reject_95")
    },

    // Exact two-sample Kolmogorov–Smirnov between the BUILDING and
    // MACHINERY segments' order values: D = max|F₁−F₂| over the
    // merged support, computed from two cumulative count lanes in ONE
    // GlobalOrder pass (the q406 discipline — row-scale distinct
    // values never meet a single-partition window), the statistic and
    // the α=0.05 decision λ = D·√(n₁n₂/(n₁+n₂)) each one exact wide
    // ratio into a shared sqrt text.
    "q441_ks_two_sample" -> { (s, d) =>
      val cls = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .filter(expr("c_mktsegment IN ('BUILDING', 'MACHINERY')"))
        .select(expr(CentsF).as("v"),
          expr("CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END")
            .as("g1"))
        .groupBy("v")
        .agg(coalesce(sum("g1"), lit(0L)).as("c1"),
          coalesce(sum(expr("1 - g1")), lit(0L)).as("c2"))
      val cum = graft.plans.GlobalOrder.withRunningSums(
        cls, Seq(col("v")), col("v"),
        Seq(col("c1") -> "cum1", col("c2") -> "cum2"))
      val tot = cls.agg(sum("c1").as("n1"), sum("c2").as("n2"))
      val dmax = cum.crossJoin(broadcast(tot))
        .withColumn("dnum_w", expr(
          s"abs(${Sp.wide("cum1")} * n2 - ${Sp.wide("cum2")} * n1)"))
        .agg(max("dnum_w").as("dmax_w"), max("n1").as("n1"),
          max("n2").as("n2"))
      dmax
        .withColumn("ks_milli", expr(
          "CASE WHEN n1 = 0 OR n2 = 0 THEN NULL ELSE CAST(" +
            s"${Sp.intDiv("dmax_w * 1000",
              "(" + Sp.wide("n1") + " * n2)")} AS BIGINT) END"))
        .withColumn("lambda_micro", expr(
          "CASE WHEN n1 = 0 OR n2 = 0 THEN NULL ELSE " +
            s"CAST(floor(${Sp.wideToDouble("dmax_w")} / " +
            s"sqrt(${Sp.wideToDouble(
              Sp.wide("n1") + " * n2 * (n1 + n2)")}) * " +
            "CAST(1000000 AS DOUBLE)) AS BIGINT) END"))
        .withColumn("reject_95", expr(
          "CASE WHEN lambda_micro IS NULL THEN NULL " +
            "ELSE lambda_micro > 1358100 END"))
        .select("n1", "n2", "ks_milli", "lambda_micro", "reject_95")
    },

    // Equi-depth histogram builder (the ANALYZE-style optimizer
    // statistic): ten buckets of equal row mass over order value,
    // boundaries by exact GlobalOrder rank selection at the i·n/10
    // positions, per-bucket counts and min/max from the same ranked
    // spine. What a cost-based optimizer persists per column.
    "q442_equidepth_histogram" -> { (s, d) =>
      val x = Tables.orders(s, d).select(
        col("o_orderkey").as("id"), expr(CentsF).as("x"))
      val rk = graft.plans.GlobalOrder.withRowNumber(
        x, Seq(col("x"), col("id")), col("x"), "rk",
        countName = Some("n"))
      rk.withColumn("bucket", expr("((rk - 1) * 10) div n + 1"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"), min("x").as("lo"),
          max("x").as("hi"))
        .withColumn("width", expr("hi - lo"))
        .select("bucket", "n_rows", "lo", "hi", "width")
        .orderBy("bucket")
    },

    // Grubbs' max-outlier test on daily revenue: G = max|y−ȳ|/s with
    // the deviation and variance lanes exact integer (×n so no mean
    // division ever happens: G² ·n(n−1)... reduces to one shared
    // sqrt of an integer ratio), verdict against the α=0.05 critical
    // value for the day-frame n pinned as the t-based literal
    // computed offline.
    "q443_grubbs" -> { (s, d) =>
      val day = Tables.orders(s, d)
        .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
        .agg(sum(expr(CentsF)).as("y"))
      val st = day.agg(count(lit(1)).as("nd"), sum("y").as("sy"),
        sum(expr(s"${Sp.wide("y")} * y")).as("syy_w"))
      day.crossJoin(broadcast(st))
        .withColumn("dev_n", expr(
          s"abs(${Sp.wide("y")} * nd - ${Sp.wide("sy")})"))
        .agg(max("nd").as("nd"), max("dev_n").as("maxdev_w"),
          max(expr(
            s"nd * syy_w - ${Sp.wide("sy")} * sy")).as("ssn_w"))
        // G·10⁶ = maxdev·√((n−1)/(n·SS_n)) with SS_n = nΣy²−(Σy)²:
        // |y−ȳ|·n / (n·√(SS_n/(n(n−1)))) — one sqrt, fixed op order
        .withColumn("g_micro", expr(
          "CASE WHEN nd < 3 OR ssn_w <= 0 THEN NULL ELSE " +
            s"CAST(floor(${Sp.wideToDouble("maxdev_w")} * " +
            "sqrt(CAST(nd - 1 AS DOUBLE) / " +
            s"(CAST(nd AS DOUBLE) * ${Sp.wideToDouble("ssn_w")})) * " +
            "CAST(1000000 AS DOUBLE)) AS BIGINT) END"))
        .select("nd", "g_micro")
        .withColumn("suspect_outlier", expr(
          // deliberately LOOSER than the true two-sided α = 0.05
          // critical value (≈ 4.25 at n ~ 2400) — a liberal screen
          // that over-flags rather than under-flags; same literal on
          // both engines so the verdict stays bit-exact
          "CASE WHEN g_micro IS NULL THEN NULL " +
            "ELSE g_micro > 4000000 END"))
    },

    // Chow structural-break F-test on the monthly-revenue OLS at the
    // known 1995-01 breakpoint (the parametric companion to q365's
    // nonparametric Pettitt): per-segment SSR from the closed form
    // (Syy·Sxx − Sxy²)/(n·Sxx) with every centered sum an exact
    // 128-bit integer (sums are ADDITIVE, so pooled = A+B — one
    // 2-row rollup feeds all three regressions), and the F ratio is
    // one fixed-op-order float text over the six wideToDouble lanes.
    "q444_chow_test" -> { (s, d) =>
      val m = Tables.orders(s, d)
        .groupBy(expr(
          "(year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1")
          .as("mi"))
        .agg(sum(expr(CentsF)).as("y"))
        .withColumn("seg", expr("CASE WHEN mi < 36 THEN 0 ELSE 1 END"))
      val st = m.groupBy("seg")
        .agg(count(lit(1)).as("n"), sum("mi").as("sx"),
          sum("y").as("sy"),
          sum(expr("mi * mi")).as("sxx"),
          sum(expr("mi * y")).as("sxy"),
          sum(expr(s"${Sp.wide("y")} * y")).as("syy_w"))
      def c(col0: String, seg: Int): String =
        s"max(CASE WHEN seg = $seg THEN $col0 END)"
      val wide = st.agg(
        expr(c("n", 0)).as("n1"), expr(c("sx", 0)).as("sx1"),
        expr(c("sy", 0)).as("sy1"), expr(c("sxx", 0)).as("sxx1"),
        expr(c("sxy", 0)).as("sxy1"), expr(c("syy_w", 0)).as("syy1"),
        expr(c("n", 1)).as("n2"), expr(c("sx", 1)).as("sx2"),
        expr(c("sy", 1)).as("sy2"), expr(c("sxx", 1)).as("sxx2"),
        expr(c("sxy", 1)).as("sxy2"), expr(c("syy_w", 1)).as("syy2"))
      def lanes(t: String, n: String, sx: String, sy: String,
          sxx: String, sxy: String, syy: String): Seq[(String, String)] =
        Seq(
          s"num$t" -> (s"greatest((${Sp.wide(n)} * $syy " +
            s"- ${Sp.wide(sy)} * $sy) * ($n * $sxx - $sx * $sx) " +
            s"- (${Sp.wide(n)} * $sxy - ${Sp.wide(sx)} * $sy) " +
            s"* (${Sp.wide(n)} * $sxy - ${Sp.wide(sx)} * $sy), " +
            s"${Sp.wide("0")})"),
          s"den$t" -> s"${Sp.wide(n)} * ($n * $sxx - $sx * $sx)")
      val withLanes =
        (lanes("p", "(n1 + n2)", "(sx1 + sx2)", "(sy1 + sy2)",
          "(sxx1 + sxx2)", "(sxy1 + sxy2)", "(syy1 + syy2)") ++
          lanes("a", "n1", "sx1", "sy1", "sxx1", "sxy1", "syy1") ++
          lanes("b", "n2", "sx2", "sy2", "sxx2", "sxy2", "syy2"))
          .foldLeft(wide) { case (df, (nm, e)) =>
            df.withColumn(nm, expr(e))
          }
      val fText =
        "CASE WHEN n1 IS NULL OR n2 IS NULL OR n1 + n2 < 5 " +
          "OR denp <= 0 OR dena <= 0 OR denb <= 0 THEN NULL ELSE " +
          s"CAST(floor(((${Sp.wideToDouble("nump")} / " +
          s"${Sp.wideToDouble("denp")} - " +
          s"${Sp.wideToDouble("numa")} / ${Sp.wideToDouble("dena")} - " +
          s"${Sp.wideToDouble("numb")} / ${Sp.wideToDouble("denb")}) / " +
          "CAST(2 AS DOUBLE)) / " +
          s"((${Sp.wideToDouble("numa")} / ${Sp.wideToDouble("dena")} + " +
          s"${Sp.wideToDouble("numb")} / ${Sp.wideToDouble("denb")}) / " +
          "CAST(n1 + n2 - 4 AS DOUBLE)) * " +
          "CAST(1000000 AS DOUBLE)) AS BIGINT) END"
      withLanes
        .withColumn("f_micro", expr(fText))
        .withColumn("break_95", expr(
          "CASE WHEN f_micro IS NULL THEN NULL " +
            "ELSE f_micro > 3111000 END"))
        .select(expr("n1 + n2").as("n_months"), col("n1"), col("n2"),
          col("f_micro"), col("break_95"))
    },

    // SQL-surface gate: GROUP BY ALL / ORDER BY ALL (the q389 LATERAL
    // discipline — pin that the convenience spellings resolve to the
    // same plan and values on both engines).
    "q438_group_by_all" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("q438_orders")
      s.sql(
        """SELECT o_orderstatus AS status, o_orderpriority AS priority,
          |  COUNT(*) AS n,
          |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
          |    AS BIGINT)) AS BIGINT) AS cents
          |FROM q438_orders
          |GROUP BY ALL
          |ORDER BY ALL""".stripMargin)
    },

    // SQL-surface gate: standard PIVOT (q438 discipline). Both engines
    // accept the SQL-standard relational pivot with aliased IN values
    // and multiple aliased aggregates, and both name the output
    // columns <valueAlias>_<aggAlias> — but they disagree on the
    // empty-cell convention for COUNT (Spark: NULL, DuckDB: 0), so
    // the count lanes are COALESCEd to 0 on BOTH sides; sum cells are
    // NULL-on-empty on both engines and ride through untouched. Scale
    // shape: one map-side-combined aggregate over 5×3 cells.
    "q445_pivot" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("q445_orders")
      s.sql(
        """SELECT priority,
          |  COALESCE(f_n, 0) AS f_n, f_cents,
          |  COALESCE(o_n, 0) AS o_n, o_cents,
          |  COALESCE(p_n, 0) AS p_n, p_cents
          |FROM (
          |  SELECT o_orderpriority AS priority, o_orderstatus AS status,
          |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
          |      AS cents
          |  FROM q445_orders)
          |PIVOT (COUNT(*) AS n, SUM(cents) AS cents
          |       FOR status IN ('F' AS f, 'O' AS o, 'P' AS p))
          |ORDER BY priority""".stripMargin)
    },

    // SQL-surface gate: standard UNPIVOT — the wide→long inverse of
    // q445, over a per-priority metrics frame. Both engines EXCLUDE
    // NULL cells by default; every lane here is a non-null BIGINT
    // (UNPIVOT requires one common type across the IN columns), so
    // the default never fires and the gate pins the happy path plus
    // the metric-name labeling both engines derive from the column
    // identifiers as written.
    "q446_unpivot" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("q446_orders")
      s.sql(
        """SELECT priority, metric, val FROM (
          |  SELECT o_orderpriority AS priority,
          |    COUNT(*) AS n_orders,
          |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
          |      AS BIGINT)) AS BIGINT) AS cents,
          |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
          |  FROM q446_orders GROUP BY 1)
          |UNPIVOT (val FOR metric IN (n_orders, cents, n_custs))
          |ORDER BY priority, metric""".stripMargin)
    },

    // SQL-surface gate: QUALIFY — top-3 orders per customer by value.
    // Spark 4 has no QUALIFY clause, so the Spark side is the
    // canonical subquery-filter spelling of the same plan; the DuckDB
    // oracle uses native QUALIFY. The rank predicate rk <= 3 under a
    // per-customer window is the WindowGroupLimit shape (bounded
    // per-group state, never a global sort); the tie-break
    // (cents DESC, o_orderkey) is total, so both engines agree
    // row-for-row.
    "q447_qualify_topk" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("q447_orders")
      s.sql(
        """SELECT custkey, o_orderkey, cents, rk FROM (
          |  SELECT CAST(o_custkey AS BIGINT) AS custkey, o_orderkey,
          |    cents,
          |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
          |      ORDER BY cents DESC, o_orderkey) AS BIGINT) AS rk
          |  FROM (
          |    SELECT o_custkey, o_orderkey,
          |      CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
          |        AS cents
          |    FROM q447_orders))
          |WHERE rk <= 3
          |ORDER BY custkey, rk""".stripMargin)
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
         |FROM u ORDER BY dep""".stripMargin,

    "q393_mann_kendall" ->
      s"""WITH m AS (
         |  SELECT year(CAST(o_orderdate AS DATE)) * 100 +
         |      month(CAST(o_orderdate AS DATE)) AS ym,
         |    COUNT(*) AS y
         |  FROM orders GROUP BY 1),
         |s AS (
         |  SELECT CAST(COALESCE(SUM(CASE WHEN b.y > a.y THEN 1
         |    WHEN b.y < a.y THEN -1 ELSE 0 END), 0) AS BIGINT) AS s_stat
         |  FROM m a JOIN m b ON a.ym < b.ym),
         |t AS (
         |  SELECT CAST(SUM(t) AS BIGINT) AS n_m,
         |    CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
         |      AS tie_sum
         |  FROM (SELECT y, COUNT(*) AS t FROM m GROUP BY 1)),
         |v AS (
         |  SELECT n_m, s_stat,
         |    n_m * (n_m - 1) * (2 * n_m + 5) - tie_sum AS v18
         |  FROM t CROSS JOIN s),
         |z AS (SELECT *, $MkZF AS z_micro FROM v)
         |SELECT n_m, s_stat, v18, z_micro,
         |  CASE WHEN z_micro IS NULL THEN NULL
         |    WHEN z_micro > 1959964 THEN 'increasing'
         |    WHEN z_micro < -1959964 THEN 'decreasing'
         |    ELSE 'none' END AS trend
         |FROM z""".stripMargin,

    "q394_theil_sen" ->
      s"""WITH m AS (
         |  SELECT (year(CAST(o_orderdate AS DATE)) - 1992) * 12 +
         |      month(CAST(o_orderdate AS DATE)) - 1 AS x,
         |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS yc
         |  FROM orders GROUP BY 1),
         |p AS (
         |  SELECT b.x - a.x AS dx, b.yc - a.yc AS dy
         |  FROM m a JOIN m b ON a.x < b.x),
         |q AS (SELECT ${senSlopeF(Du)} AS slope_q FROM p),
         |agg AS (
         |  SELECT COUNT(*) AS n_pairs,
         |    CAST(COALESCE(SUM(CASE WHEN slope_q > 0 THEN 1 ELSE 0 END),
         |      0) AS BIGINT) AS n_pos,
         |    CAST(COALESCE(SUM(CASE WHEN slope_q < 0 THEN 1 ELSE 0 END),
         |      0) AS BIGINT) AS n_neg
         |  FROM q),
         |r AS (
         |  SELECT slope_q, ROW_NUMBER() OVER (ORDER BY slope_q) AS rn
         |  FROM q),
         |med AS (
         |  SELECT slope_q AS sen_slope_milli
         |  FROM r CROSS JOIN agg WHERE rn = (n_pairs + 1) // 2),
         |nm AS (SELECT COUNT(*) AS n_months FROM m)
         |SELECT n_months, n_pairs, sen_slope_milli, n_pos, n_neg,
         |  CASE WHEN n_pairs = 0 THEN NULL
         |    ELSE n_pos * 1000 // n_pairs END AS pos_share_milli
         |FROM nm CROSS JOIN agg CROSS JOIN med""".stripMargin,

    "q395_cochran_armitage" ->
      s"""WITH yr AS (
         |  SELECT CAST(year(CAST(o_orderdate AS DATE)) - 1991 AS BIGINT)
         |      AS w,
         |    COUNT(*) AS n_i,
         |    CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1
         |      ELSE 0 END), 0) AS BIGINT) AS r_i
         |  FROM orders
         |  WHERE year(CAST(o_orderdate AS DATE)) BETWEEN 1992 AND 1998
         |  GROUP BY 1),
         |t AS (
         |  SELECT CAST(SUM(n_i) AS BIGINT) AS n_total,
         |    CAST(SUM(r_i) AS BIGINT) AS r_total,
         |    CAST(SUM(w * n_i) AS BIGINT) AS swn,
         |    CAST(SUM(w * r_i) AS BIGINT) AS swr,
         |    CAST(SUM(w * w * n_i) AS BIGINT) AS sw2n
         |  FROM yr),
         |c AS (
         |  SELECT *, ${Du.wide("n_total")} * swr -
         |    ${Du.wide("r_total")} * swn AS d_stat
         |  FROM t),
         |e AS (
         |  SELECT *, d_stat * d_stat AS num_w,
         |    ${Du.wide("r_total")} * (n_total - r_total) *
         |      (${Du.wide("n_total")} * sw2n -
         |       ${Du.wide("swn")} * swn) AS den_w
         |  FROM c),
         |f AS (SELECT *, ${caZ2F(Du)} AS z2_micro FROM e)
         |SELECT n_total, r_total, CAST(d_stat AS BIGINT) AS d_stat,
         |  z2_micro,
         |  CASE WHEN z2_micro IS NULL THEN NULL
         |    ELSE z2_micro > 3841459 END AS reject_95
         |FROM f""".stripMargin,

    "q396_assoc_rules" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM b),
        |sa AS (SELECT pk, COUNT(*) AS supp FROM b GROUP BY 1),
        |p AS (
        |  SELECT a.pk AS pa, c.pk AS pb, COUNT(*) AS supp_ab
        |  FROM b a JOIN b c ON a.ok = c.ok AND a.pk < c.pk
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |j AS (
        |  SELECT p.pa, p.pb, p.supp_ab, x.supp AS supp_a,
        |    y.supp AS supp_b
        |  FROM p JOIN sa x ON p.pa = x.pk JOIN sa y ON p.pb = y.pk),
        |r AS (
        |  SELECT pa, pb, supp_ab, supp_a, supp_b,
        |    supp_ab * 1000 // supp_a AS conf_ab_milli,
        |    supp_ab * 1000 // supp_b AS conf_ba_milli,
        |    CAST(supp_ab * n_orders * 1000 // (supp_a * supp_b)
        |      AS BIGINT) AS lift_milli
        |  FROM j CROSS JOIN n),
        |k AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY lift_milli DESC, pa, pb)
        |    AS rn
        |  FROM r)
        |SELECT pa, pb, supp_ab, supp_a, supp_b, conf_ab_milli,
        |  conf_ba_milli, lift_milli
        |FROM k WHERE rn <= 20
        |ORDER BY lift_milli DESC, pa, pb""".stripMargin,

    "q397_chi2_independence" ->
      s"""WITH ct AS (
         |  SELECT c_mktsegment AS seg, o_orderpriority AS pri,
         |    COUNT(*) AS n_c
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2),
         |rm AS (SELECT seg, CAST(SUM(n_c) AS BIGINT) AS r_m
         |  FROM ct GROUP BY 1),
         |cm AS (SELECT pri, CAST(SUM(n_c) AS BIGINT) AS c_m
         |  FROM ct GROUP BY 1),
         |tot AS (
         |  SELECT CAST(SUM(n_c) AS BIGINT) AS n_tot,
         |    COUNT(DISTINCT seg) AS r_levels,
         |    COUNT(DISTINCT pri) AS c_levels
         |  FROM ct),
         |grid AS (
         |  SELECT rm.seg, cm.pri, rm.r_m, cm.c_m,
         |    COALESCE(ct.n_c, 0) AS n_c
         |  FROM rm CROSS JOIN cm
         |  LEFT JOIN ct ON rm.seg = ct.seg AND cm.pri = ct.pri),
         |cell AS (
         |  SELECT n_tot, r_levels, c_levels,
         |    n_c * n_tot - r_m * c_m AS dlt, r_m, c_m
         |  FROM grid CROSS JOIN tot),
         |chi AS (
         |  SELECT n_tot, r_levels, c_levels,
         |    CAST(SUM(${chi2TermF(Du)}) AS BIGINT) AS chi2_micro
         |  FROM cell GROUP BY 1, 2, 3),
         |k AS (
         |  SELECT *, least(r_levels, c_levels) - 1 AS k_min FROM chi)
         |SELECT n_tot, r_levels, c_levels, chi2_micro,
         |  $CramerVF AS v_micro,
         |  chi2_micro > 26296228 AS reject_95
         |FROM k""".stripMargin,

    "q398_kendall_tau" ->
      s"""WITH cls AS (
         |  SELECT CAST(l_quantity AS BIGINT) AS qv,
         |    CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)
         |      AS dv,
         |    COUNT(*) AS n_gv
         |  FROM lineitem GROUP BY 1, 2),
         |cd AS (
         |  SELECT
         |    COALESCE(SUM(CASE WHEN a.qv < b.qv AND a.dv < b.dv
         |      THEN ${Du.wide("a.n_gv")} * b.n_gv
         |      ELSE ${Du.wide("0")} END), ${Du.wide("0")}) AS c_w,
         |    COALESCE(SUM(CASE WHEN a.qv < b.qv AND a.dv > b.dv
         |      THEN ${Du.wide("a.n_gv")} * b.n_gv
         |      ELSE ${Du.wide("0")} END), ${Du.wide("0")}) AS d_w
         |  FROM cls a JOIN cls b
         |    ON a.qv < b.qv OR (a.qv = b.qv AND a.dv < b.dv)),
         |qm AS (
         |  SELECT CAST(SUM(t) AS BIGINT) AS n_rows,
         |    CAST(COALESCE(SUM(t * (t - 1)), 0) AS BIGINT) AS n1x2
         |  FROM (SELECT qv, CAST(SUM(n_gv) AS BIGINT) AS t
         |        FROM cls GROUP BY 1)),
         |dm AS (
         |  SELECT CAST(COALESCE(SUM(t * (t - 1)), 0) AS BIGINT) AS n2x2
         |  FROM (SELECT dv, CAST(SUM(n_gv) AS BIGINT) AS t
         |        FROM cls GROUP BY 1)),
         |f AS (
         |  SELECT n_rows, n1x2, n2x2, c_w, d_w,
         |    n_rows * (n_rows - 1) AS n0x2,
         |    CAST(c_w - d_w AS BIGINT) AS cmd
         |  FROM qm CROSS JOIN dm CROSS JOIN cd),
         |g AS (
         |  SELECT *, ${Du.wide("n0x2 - n1x2")} * (n0x2 - n2x2)
         |    AS prod4_w
         |  FROM f)
         |SELECT n_rows, CAST(c_w AS BIGINT) AS c_pairs,
         |  CAST(d_w AS BIGINT) AS d_pairs, n1x2, n2x2,
         |  ${tauBF(Du)} AS tau_micro
         |FROM g""".stripMargin,

    "q399_stratified_sample" ->
      s"""WITH base AS (
         |  SELECT o_orderkey AS ok, o_orderpriority AS stratum,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS x
         |  FROM orders),
         |st AS (
         |  SELECT stratum, COUNT(*) AS n_h, CAST(SUM(x) AS BIGINT) AS sx,
         |    SUM(${Du.wide("x")} * x) AS sxx
         |  FROM base GROUP BY 1),
         |sv AS (
         |  SELECT *, n_h * sxx - ${Du.wide("sx")} * sx AS num_w FROM st),
         |sm AS (SELECT *, ${stdMilliF(Du)} AS s_milli FROM sv),
         |tw AS (
         |  SELECT CAST(COALESCE(SUM(CASE WHEN s_milli IS NULL THEN 0
         |    ELSE n_h * s_milli END), 0) AS BIGINT) AS sum_w
         |  FROM sm),
         |al AS (SELECT sm.*, sum_w, ${neymanKF(Du)} AS k_h
         |  FROM sm CROSS JOIN tw),
         |hb AS (SELECT *,
         |  ${Du.hash64("concat('ney:', CAST(ok AS VARCHAR))")} AS h
         |  FROM base),
         |rk AS (
         |  SELECT stratum, x,
         |    ROW_NUMBER() OVER (PARTITION BY stratum ORDER BY h, ok)
         |      AS rn
         |  FROM hb),
         |samp AS (
         |  SELECT r.stratum, COUNT(*) AS n_sampled,
         |    CAST(SUM(x) AS BIGINT) AS sum_samp
         |  FROM rk r JOIN al a ON r.stratum = a.stratum
         |    AND r.rn <= a.k_h
         |  GROUP BY 1)
         |SELECT a.stratum, a.n_h, a.s_milli, a.k_h,
         |  COALESCE(s.n_sampled, 0) AS n_sampled,
         |  a.sx // a.n_h AS mean_true_cents,
         |  CASE WHEN COALESCE(s.n_sampled, 0) = 0 THEN NULL
         |    ELSE s.sum_samp // s.n_sampled END AS mean_samp_cents
         |FROM al a LEFT JOIN samp s ON a.stratum = s.stratum
         |ORDER BY a.stratum""".stripMargin,

    "q400_hampel_filter" ->
      """WITH day AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |l AS (
        |  SELECT day, y,
        |    [lag(y, 3) OVER w, lag(y, 2) OVER w, lag(y, 1) OVER w, y,
        |     lead(y, 1) OVER w, lead(y, 2) OVER w, lead(y, 3) OVER w]
        |      AS arr
        |  FROM day WINDOW w AS (ORDER BY day)),
        |e AS (
        |  SELECT * FROM l
        |  WHERE len(list_filter(arr, v -> v IS NOT NULL)) = 7),
        |m AS (SELECT *, list_sort(arr)[4] AS med FROM e),
        |md AS (
        |  SELECT *,
        |    list_sort(list_transform(arr, v -> abs(v - med)))[4] AS mad,
        |    abs(y - med) AS dev
        |  FROM m),
        |f AS (
        |  SELECT *, 10000 * dev > 44478 * mad AS is_out,
        |    CASE WHEN mad = 0 THEN NULL
        |      ELSE 10000 * dev * 1000 // (44478 * mad) END AS ratio_milli
        |  FROM md)
        |SELECT COUNT(*) AS n_eval,
        |  CAST(COALESCE(SUM(CASE WHEN is_out THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_outliers,
        |  MAX(ratio_milli) AS max_ratio_milli,
        |  MAX(CASE WHEN is_out THEN day ELSE NULL END)
        |    AS last_outlier_day
        |FROM f""".stripMargin,

    "q401_haar_energy" -> {
      val lanes = (1 to 4).map { l =>
        val blk = 1 << l
        val half = 1 << (l - 1)
        s"""SELECT CAST($l AS BIGINT) AS level, COUNT(*) AS n_blocks,
           |    CAST(COALESCE(SUM(det * det), 0) AS BIGINT) AS energy,
           |    CAST(COALESCE(SUM(blk_sum * blk_sum), 0) AS BIGINT)
           |      AS approx_energy
           |  FROM (
           |    SELECT t // $blk AS p,
           |      CAST(SUM(CASE WHEN t % $blk < $half THEN y ELSE -y END)
           |        AS BIGINT) AS det,
           |      CAST(SUM(y) AS BIGINT) AS blk_sum
           |    FROM day GROUP BY 1)""".stripMargin
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH day AS (
         |  SELECT date_diff('day', DATE '1992-01-01',
         |      CAST(o_orderdate AS DATE)) AS t,
         |    COUNT(*) AS y
         |  FROM orders GROUP BY 1)
         |$lanes
         |ORDER BY level""".stripMargin
    },

    "q402_apriori_triples" ->
      """WITH b AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |f1 AS MATERIALIZED (
        |  SELECT pk FROM b GROUP BY 1 HAVING COUNT(*) >= 2),
        |fb0 AS MATERIALIZED (
        |  SELECT b.ok, b.pk FROM b JOIN f1 ON b.pk = f1.pk),
        |ok3 AS MATERIALIZED (
        |  SELECT ok FROM fb0 GROUP BY 1 HAVING COUNT(*) >= 3),
        |fb AS MATERIALIZED (
        |  SELECT fb0.ok, fb0.pk FROM fb0 JOIN ok3 ON fb0.ok = ok3.ok),
        |t AS (
        |  SELECT a.pk AS pa, c.pk AS pb, e.pk AS pc, COUNT(*) AS supp_abc
        |  FROM fb a JOIN fb c ON a.ok = c.ok AND a.pk < c.pk
        |  JOIN fb e ON a.ok = e.ok AND c.pk < e.pk
        |  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2),
        |k AS (
        |  SELECT *, ROW_NUMBER() OVER (
        |    ORDER BY supp_abc DESC, pa, pb, pc) AS rn
        |  FROM t)
        |SELECT pa, pb, pc, supp_abc FROM k WHERE rn <= 10
        |ORDER BY supp_abc DESC, pa, pb, pc""".stripMargin,

    "q403_rolling_distinct" ->
      """WITH mc AS (
        |  SELECT DISTINCT
        |    (year(CAST(o_orderdate AS DATE)) - 1992) * 12 +
        |      month(CAST(o_orderdate AS DATE)) - 1 AS mi,
        |    o_custkey AS ck
        |  FROM orders),
        |months AS (SELECT DISTINCT mi FROM mc),
        |u1 AS (SELECT mi, COUNT(DISTINCT ck) AS u1 FROM mc GROUP BY 1),
        |ex AS (
        |  SELECT ck, unnest(range(mi, mi + 3)) AS tm FROM mc),
        |u3 AS (SELECT tm AS mi, COUNT(DISTINCT ck) AS u3
        |  FROM ex GROUP BY 1)
        |SELECT months.mi, u1, u3,
        |  CASE WHEN u3 = 0 THEN NULL ELSE u1 * 1000 // u3 END
        |    AS overlap_milli
        |FROM months JOIN u1 ON months.mi = u1.mi
        |JOIN u3 ON months.mi = u3.mi
        |ORDER BY months.mi""".stripMargin,

    "q404_seasonal_backtest" ->
      """WITH m AS (
        |  SELECT (year(CAST(o_orderdate AS DATE)) - 1992) * 12 +
        |      month(CAST(o_orderdate AS DATE)) - 1 AS mi,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |j AS (
        |  SELECT m.mi, m.y, a.y AS y12, b.y AS y1
        |  FROM m JOIN m a ON m.mi - 12 = a.mi
        |  JOIN m b ON m.mi - 1 = b.mi),
        |g AS (
        |  SELECT 1992 + mi // 12 AS yr, COUNT(*) AS n_test,
        |    CAST(SUM(y) AS BIGINT) AS sum_y,
        |    CAST(SUM(abs(y - y12)) AS BIGINT) AS sum_ae12,
        |    CAST(SUM(abs(y - y1)) AS BIGINT) AS sum_ae1
        |  FROM j GROUP BY 1)
        |SELECT yr, n_test, sum_y, sum_ae12, sum_ae1,
        |  CASE WHEN sum_y = 0 THEN NULL
        |    ELSE sum_ae12 * 1000 // sum_y END AS wape12_milli,
        |  CASE WHEN sum_ae1 = 0 THEN NULL
        |    ELSE sum_ae12 * 1000 // sum_ae1 END AS mase_milli
        |FROM g ORDER BY yr""".stripMargin,

    "q405_constraint_report" ->
      """WITH c1 AS (
        |  SELECT 'c1_complete_custkey' AS constraint_name,
        |    COUNT(o_custkey) * 1000 // COUNT(*) AS observed_milli
        |  FROM orders),
        |c2 AS (
        |  SELECT 'c2_domain_status',
        |    CAST(COALESCE(SUM(CASE WHEN o_orderstatus IN ('F','O','P')
        |      THEN 1 ELSE 0 END), 0) AS BIGINT) * 1000 // COUNT(*)
        |  FROM orders),
        |c3 AS (
        |  SELECT 'c3_range_price_pos',
        |    CAST(COALESCE(SUM(CASE WHEN o_totalprice > 0 THEN 1
        |      ELSE 0 END), 0) AS BIGINT) * 1000 // COUNT(*)
        |  FROM orders),
        |c4 AS (
        |  SELECT 'c4_ref_custkey',
        |    COUNT(t.v) * 1000 // COUNT(*)
        |  FROM (SELECT DISTINCT o_custkey AS v FROM orders) f
        |  LEFT JOIN (SELECT DISTINCT c_custkey AS v FROM customer) t
        |    ON f.v = t.v),
        |c5 AS (
        |  SELECT 'c5_unique_orderkey',
        |    COUNT(DISTINCT o_orderkey) * 1000 // COUNT(*)
        |  FROM orders),
        |u AS (
        |  SELECT * FROM c1 UNION ALL SELECT * FROM c2
        |  UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4
        |  UNION ALL SELECT * FROM c5)
        |SELECT constraint_name AS "constraint", observed_milli,
        |  CAST(1000 AS BIGINT) AS threshold_milli,
        |  observed_milli >= 1000 AS passed
        |FROM u ORDER BY 1""".stripMargin,

    "q406_energy_distance" ->
      """WITH pts AS (
        |  SELECT label,
        |    CAST(floor((embedding[1]::DOUBLE) * 1000000) AS BIGINT) AS v
        |  FROM embeddings WHERE label IN (0, 1)),
        |cls AS (
        |  SELECT v,
        |    CAST(COALESCE(SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END),
        |      0) AS BIGINT) AS cx,
        |    CAST(COALESCE(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END),
        |      0) AS BIGINT) AS cy
        |  FROM pts GROUP BY 1),
        |w AS (
        |  SELECT *,
        |    CAST(SUM(cx) OVER o AS BIGINT) AS cum_cx,
        |    CAST(SUM(cx * v) OVER o AS BIGINT) AS cum_sx,
        |    CAST(SUM(cy) OVER o AS BIGINT) AS cum_cy,
        |    CAST(SUM(cy * v) OVER o AS BIGINT) AS cum_sy
        |  FROM cls WINDOW o AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (
        |  SELECT *, cum_cx - cx AS cx_ex, cum_sx - cx * v AS sx_ex,
        |    cum_cy - cy AS cy_ex, cum_sy - cy * v AS sy_ex
        |  FROM w),
        |agg AS (
        |  SELECT CAST(SUM(cx) AS BIGINT) AS nx,
        |    CAST(SUM(cy) AS BIGINT) AS ny,
        |    CAST(COALESCE(SUM(CAST(cx AS HUGEINT) * (v * cy_ex - sy_ex)
        |      + CAST(cy AS HUGEINT) * (v * cx_ex - sx_ex)), 0)
        |      AS BIGINT) AS a_cross,
        |    CAST(COALESCE(SUM(2 * CAST(cx AS HUGEINT) *
        |      (v * cx_ex - sx_ex)), 0) AS BIGINT) AS b_xx,
        |    CAST(COALESCE(SUM(2 * CAST(cy AS HUGEINT) *
        |      (v * cy_ex - sy_ex)), 0) AS BIGINT) AS c_yy
        |  FROM t),
        |f AS (
        |  SELECT *,
        |    greatest(2 * CAST(a_cross AS HUGEINT) * nx * ny -
        |      CAST(b_xx AS HUGEINT) * ny * ny -
        |      CAST(c_yy AS HUGEINT) * nx * nx,
        |      CAST(0 AS HUGEINT)) AS num_w,
        |    CAST(nx AS HUGEINT) * nx * ny * ny AS den_w
        |  FROM agg)
        |SELECT nx, ny, a_cross, b_xx, c_yy,
        |  CASE WHEN den_w <= 0 THEN NULL
        |    ELSE CAST((num_w * 1000000 // den_w) AS BIGINT) END
        |    AS e_micro
        |FROM f""".stripMargin,

    "q407_conformal_coverage" ->
      s"""WITH ev AS (
         |  SELECT event_id AS id, event_type AS et,
         |    CAST(floor(value * 1000) AS BIGINT) AS v,
         |    ${Du.hash64("concat('conf:', CAST(event_id AS VARCHAR))")}
         |      % 2 = 0 AS cal
         |  FROM events),
         |mc AS (
         |  SELECT et, v, COUNT(*) AS c FROM ev WHERE cal GROUP BY 1, 2),
         |mr AS (
         |  SELECT *,
         |    CAST(SUM(c) OVER (PARTITION BY et ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum,
         |    CAST(SUM(c) OVER (PARTITION BY et) AS BIGINT) AS n_t
         |  FROM mc),
         |med AS (
         |  SELECT et, MIN(v) AS med FROM mr
         |  WHERE cum * 2 >= n_t + 1 GROUP BY 1),
         |sc AS (
         |  SELECT ev.id, ev.v, ev.cal, abs(ev.v - med.med) AS nc
         |  FROM ev JOIN med ON ev.et = med.et),
         |cn AS (SELECT COUNT(*) AS n_cal FROM sc WHERE cal),
         |rk AS (
         |  SELECT nc, ROW_NUMBER() OVER (ORDER BY nc, id) AS rk
         |  FROM sc WHERE cal),
         |qh AS (
         |  SELECT nc AS qhat, n_cal FROM rk CROSS JOIN cn
         |  WHERE rk = (9 * (n_cal + 1) + 9) // 10)
         |SELECT MAX(n_cal) AS n_cal, COUNT(*) AS n_test,
         |  MAX(qhat) AS qhat,
         |  CAST(COALESCE(SUM(CASE WHEN nc <= qhat THEN 1 ELSE 0 END),
         |    0) AS BIGINT) AS n_cover,
         |  CASE WHEN COUNT(*) = 0 THEN NULL
         |    ELSE CAST(COALESCE(SUM(CASE WHEN nc <= qhat THEN 1
         |      ELSE 0 END), 0) AS BIGINT) * 1000 // COUNT(*) END
         |    AS cover_milli
         |FROM sc CROSS JOIN qh WHERE NOT cal""".stripMargin,

    "q408_ppr" -> {
      val rounds = (1 to 3).map { i =>
        val p = i - 1
        s"""i$i AS (
           |  SELECT ed.dst AS node, SUM(r$p.r // ed.d) AS fl
           |  FROM r$p JOIN ed ON r$p.node = ed.src GROUP BY ed.dst),
           |r$i AS (
           |  SELECT nodes.node,
           |    CASE WHEN sd.node IS NOT NULL THEN base ELSE 0 END +
           |      (85 * COALESCE(i$i.fl, 0)) // 100 AS r
           |  FROM nodes CROSS JOIN b
           |  LEFT JOIN sd ON nodes.node = sd.node
           |  LEFT JOIN i$i ON nodes.node = i$i.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH f AS (
         |  SELECT DISTINCT l_partkey AS src, l_suppkey + 10000000 AS dst
         |  FROM lineitem),
         |e AS (SELECT src, dst FROM f UNION SELECT dst, src FROM f),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |sd AS (
         |  SELECT node FROM nodes
         |  WHERE node < 10000000 AND node % 100 = 0),
         |p AS (SELECT COUNT(*) AS sn FROM sd),
         |b AS (
         |  SELECT ((1000000000000 // sn) * 15) // 100 AS base,
         |    1000000000000 // sn AS init
         |  FROM p),
         |deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
         |ed AS (
         |  SELECT e.src, e.dst, deg.d FROM e
         |  JOIN deg ON e.src = deg.src),
         |r0 AS (
         |  SELECT nodes.node,
         |    CASE WHEN sd.node IS NOT NULL THEN init ELSE 0 END AS r
         |  FROM nodes CROSS JOIN b
         |  LEFT JOIN sd ON nodes.node = sd.node),
         |$rounds
         |SELECT node, CAST(r AS BIGINT) AS rank_ppt FROM r3
         |WHERE r > 0
         |ORDER BY node""".stripMargin
    },

    "q409_m4_downsample" ->
      """WITH ev AS (
        |  SELECT epoch_us(ts::TIMESTAMP) // 86400000000 AS b,
        |    epoch_us(ts::TIMESTAMP) AS tsu, event_id AS id,
        |    CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT) AS v
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY b ORDER BY tsu, id) AS ra,
        |    ROW_NUMBER() OVER (PARTITION BY b ORDER BY tsu DESC,
        |      id DESC) AS rd
        |  FROM ev),
        |fl AS (
        |  SELECT b, MAX(CASE WHEN ra = 1 THEN v END) AS v_first,
        |    MAX(CASE WHEN rd = 1 THEN v END) AS v_last
        |  FROM r WHERE ra = 1 OR rd = 1 GROUP BY 1),
        |agg AS (
        |  SELECT b, COUNT(*) AS n, MIN(v) AS v_min, MAX(v) AS v_max
        |  FROM ev GROUP BY 1)
        |SELECT agg.b, n, v_min, v_max, v_first, v_last
        |FROM agg JOIN fl ON agg.b = fl.b ORDER BY agg.b""".stripMargin,

    "q410_isotonic" ->
      s"""WITH m AS (
         |  SELECT (year(CAST(o_orderdate AS DATE)) - 1992) * 12 +
         |      month(CAST(o_orderdate AS DATE)) - 1 AS mi,
         |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS y
         |  FROM orders GROUP BY 1),
         |c AS (
         |  SELECT *, CAST(SUM(y) OVER (ORDER BY mi
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS p
         |  FROM m),
         |js AS (SELECT mi AS j, p - y AS pjm1 FROM c),
         |ks AS (SELECT mi AS k, p AS pk FROM c),
         |iv AS (
         |  SELECT j, k,
         |    CAST(${Du.intDiv(Du.wide("pk - pjm1") + " * 1000000",
             "(k - j + 1)")} AS BIGINT) AS a_micro
         |  FROM js JOIN ks ON j <= k),
         |mn AS (
         |  SELECT m.mi, m.y, iv.j, MIN(a_micro) AS mn
         |  FROM m JOIN iv ON iv.j <= m.mi AND m.mi <= iv.k
         |  GROUP BY 1, 2, 3),
         |mx AS (SELECT mi, y, MAX(mn) AS yhat_micro FROM mn GROUP BY 1, 2)
         |SELECT CAST(mi AS BIGINT) AS mi, y, yhat_micro
         |FROM mx ORDER BY mi""".stripMargin,

    "q411_dtw" -> {
      val big = "9223372036854775807"
      val dp =
        s"""list_reduce(
           |    list_prepend(
           |      list_reduce(
           |        list_prepend([]::BIGINT[],
           |          list_transform(range(1, 13), j -> [j]::BIGINT[])),
           |        (row, jx) -> list_append(row,
           |          abs(a[1] - b[jx[1]]) +
           |          CASE WHEN jx[1] > 1 THEN row[jx[1] - 1]
           |            ELSE 0 END)),
           |      list_transform(range(2, 13), i -> [i]::BIGINT[])),
           |    (acc, x) -> list_reduce(
           |      list_prepend([]::BIGINT[],
           |        list_transform(range(1, 13), j -> [j]::BIGINT[])),
           |      (row, jx) -> list_append(row,
           |        abs(a[x[1]] - b[jx[1]]) + least(
           |          acc[jx[1]],
           |          CASE WHEN jx[1] > 1 THEN acc[jx[1] - 1]
           |            ELSE $big END,
           |          CASE WHEN jx[1] > 1 THEN row[jx[1] - 1]
           |            ELSE $big END))))[12]""".stripMargin
      s"""WITH m AS (
         |  SELECT year(CAST(o_orderdate AS DATE)) AS yr,
         |    month(CAST(o_orderdate AS DATE)) AS mo,
         |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS yc
         |  FROM orders
         |  WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996)
         |  GROUP BY 1, 2),
         |aa AS (SELECT list(yc ORDER BY mo) AS a FROM m WHERE yr = 1995),
         |bb AS (SELECT list(yc ORDER BY mo) AS b FROM m WHERE yr = 1996),
         |f AS (SELECT a, b FROM aa CROSS JOIN bb)
         |SELECT CAST(len(a) AS INTEGER) AS n_a,
         |  CAST(len(b) AS INTEGER) AS n_b,
         |  $dp AS dtw_cents,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(list_zip(a, b), s -> abs(s[1] - s[2]))),
         |    (acc, v) -> acc + v) AS l1_cents
         |FROM f""".stripMargin
    },

    "q412_auc" ->
      s"""WITH cls AS (
         |  SELECT CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT)
         |      AS v,
         |    COUNT(*) AS c,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
         |      ELSE 0 END) AS BIGINT) AS c1
         |  FROM events GROUP BY 1),
         |w AS (
         |  SELECT *, CAST(SUM(c) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS cum_c
         |  FROM cls),
         |agg AS (
         |  SELECT CAST(SUM(c1) AS BIGINT) AS n_pos,
         |    CAST(SUM(c - c1) AS BIGINT) AS n_neg,
         |    CAST(COALESCE(SUM(c1 * (2 * (cum_c - c) + c + 1)), 0)
         |      AS BIGINT) AS rs2
         |  FROM w),
         |f AS (SELECT *, rs2 - n_pos * (n_pos + 1) AS u2 FROM agg)
         |SELECT n_pos, n_neg, u2,
         |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL ELSE
         |    CAST(${Du.intDiv(Du.wide("u2") + " * 1000000",
             "(2 * " + Du.wide("n_pos") + " * n_neg)")} AS BIGINT) END
         |    AS auc_micro
         |FROM f""".stripMargin,

    "q413_small_qty_revenue" ->
      """WITH pa AS (
        |  SELECT l_partkey AS pk,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
        |    COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1),
        |j AS (
        |  SELECT l.l_extendedprice
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |    AND p.p_brand = 'Brand#4'
        |  JOIN pa ON l.l_partkey = pa.pk
        |  WHERE CAST(l.l_quantity AS BIGINT) * 5 * cnt < sq),
        |g AS (
        |  SELECT COUNT(*) AS n_small,
        |    CAST(COALESCE(SUM(CAST(CAST(l_extendedprice
        |      AS DECIMAL(18,2)) * 100 AS BIGINT)), 0) AS BIGINT)
        |      AS rev_cents
        |  FROM j)
        |SELECT n_small, rev_cents, rev_cents // 7 AS avg_yearly_cents
        |FROM g""".stripMargin,

    "q414_large_volume_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey AS ok,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING SUM(CAST(l_quantity AS BIGINT)) > 250),
        |j AS (
        |  SELECT c_custkey AS custkey, c_mktsegment AS mktsegment,
        |    o_orderkey AS orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents,
        |    sum_qty
        |  FROM orders JOIN big ON o_orderkey = ok
        |  JOIN customer ON o_custkey = c_custkey),
        |k AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY cents DESC, orderkey)
        |    AS rn
        |  FROM j)
        |SELECT custkey, mktsegment, orderkey, cents, sum_qty
        |FROM k WHERE rn <= 100
        |ORDER BY cents DESC, orderkey""".stripMargin,

    "q415_silhouette" ->
      s"""WITH vq AS (
         |  SELECT vec_id, label,
         |    generate_subscripts(embedding, 1) - 1 AS pos,
         |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 32768.0)
         |      AS BIGINT) * 1000 AS q1000
         |  FROM embeddings),
         |cm AS (
         |  SELECT label AS label_c, pos,
         |    CAST(SUM(q1000 // 1000) AS BIGINT) AS sq,
         |    CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM vq GROUP BY 1, 2),
         |m AS (
         |  SELECT label_c, pos,
         |    ((sq * 1000) - (((sq * 1000) % cnt + cnt) % cnt)) // cnt
         |      AS cmilli
         |  FROM cm),
         |d2 AS (
         |  SELECT vec_id, label, label_c,
         |    CAST(SUM((q1000 - cmilli) * (q1000 - cmilli)) AS BIGINT)
         |      AS dd
         |  FROM vq JOIN m ON vq.pos = m.pos
         |  GROUP BY 1, 2, 3),
         |ab AS (
         |  SELECT vec_id, label,
         |    MAX(CASE WHEN label_c = label THEN dd END) AS a2,
         |    MIN(CASE WHEN label_c <> label THEN dd END) AS b2
         |  FROM d2 GROUP BY 1, 2),
         |sm AS (
         |  SELECT *,
         |    CASE WHEN greatest(a2, b2) = 0 THEN 0
         |      WHEN b2 >= a2 THEN CAST(${Du.intDiv(
             Du.wide("b2 - a2") + " * 1000000", "greatest(a2, b2)")}
         |        AS BIGINT)
         |      ELSE -CAST(${Du.intDiv(
             Du.wide("a2 - b2") + " * 1000000", "greatest(a2, b2)")}
         |        AS BIGINT) END AS s_micro
         |  FROM ab)
         |SELECT label, COUNT(*) AS n_vecs,
         |  CAST(SUM(s_micro) AS BIGINT) AS sum_s,
         |  CASE WHEN COUNT(*) = 0 THEN NULL
         |    WHEN CAST(SUM(s_micro) AS BIGINT) >= 0
         |      THEN CAST(SUM(s_micro) AS BIGINT) // COUNT(*)
         |    ELSE -((-CAST(SUM(s_micro) AS BIGINT)) // COUNT(*)) END
         |    AS mean_s_micro,
         |  CAST(COALESCE(SUM(CASE WHEN s_micro > 0 THEN 1 ELSE 0 END),
         |    0) AS BIGINT) AS n_pos
         |FROM sm GROUP BY 1 ORDER BY 1""".stripMargin,

    "q416_modularity" ->
      """WITH b AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |e AS MATERIALIZED (
        |  SELECT DISTINCT a.pk AS pa, c.pk AS pb
        |  FROM b a JOIN b c ON a.ok = c.ok AND a.pk < c.pk),
        |e2 AS MATERIALIZED (
        |  SELECT pa, pb, x.p_brand AS ca, y.p_brand AS cb
        |  FROM e JOIN part x ON pa = x.p_partkey
        |  JOIN part y ON pb = y.p_partkey),
        |m AS (SELECT COUNT(*) AS m_edges FROM e2),
        |lc AS (
        |  SELECT ca AS c, COUNT(*) AS l_c FROM e2
        |  WHERE ca = cb GROUP BY 1),
        |dc AS (
        |  SELECT c, COUNT(*) AS d_c FROM (
        |    SELECT ca AS c FROM e2 UNION ALL SELECT cb FROM e2)
        |  GROUP BY 1),
        |per AS (
        |  SELECT COUNT(*) AS n_comms, MAX(m_edges) AS m_edges,
        |    COALESCE(SUM(4 * CAST(m_edges AS HUGEINT) *
        |      COALESCE(l_c, 0) - CAST(d_c AS HUGEINT) * d_c),
        |      CAST(0 AS HUGEINT)) AS num_w
        |  FROM dc LEFT JOIN lc ON dc.c = lc.c CROSS JOIN m),
        |f AS (
        |  SELECT *, 4 * CAST(m_edges AS HUGEINT) * m_edges AS den_w
        |  FROM per)
        |SELECT m_edges, n_comms, CAST(num_w AS BIGINT) AS num,
        |  CASE WHEN den_w <= 0 THEN NULL
        |    WHEN num_w >= 0 THEN
        |      CAST((num_w * 1000000 // den_w) AS BIGINT)
        |    ELSE -CAST(((-num_w) * 1000000 // den_w) AS BIGINT) END
        |    AS q_micro
        |FROM f""".stripMargin,

    "q417_trimmed_mean" ->
      """WITH x AS (
        |  SELECT o_orderkey AS id,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS x
        |  FROM orders),
        |rk AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY x, id) AS rk,
        |    COUNT(*) OVER () AS n_tot
        |  FROM x),
        |lim AS (SELECT *, n_tot // 20 AS k FROM rk),
        |bounds AS (
        |  SELECT MIN(x) AS lo_x, MAX(x) AS hi_x FROM lim
        |  WHERE rk = k + 1 OR rk = n_tot - k),
        |agg AS (
        |  SELECT MAX(n_tot) AS n, MAX(k) AS k,
        |    MAX(lo_x) AS lo_x, MAX(hi_x) AS hi_x,
        |    CAST(SUM(x) AS BIGINT) AS sum_all,
        |    CAST(COALESCE(SUM(CASE WHEN rk > k AND rk <= n_tot - k
        |      THEN x END), 0) AS BIGINT) AS sum_mid,
        |    CAST(COALESCE(SUM(CASE WHEN rk > k AND rk <= n_tot - k
        |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_mid
        |  FROM lim CROSS JOIN bounds)
        |SELECT n, k, lo_x, hi_x,
        |  CASE WHEN n = 0 THEN NULL ELSE sum_all // n END AS mean_cents,
        |  CASE WHEN n_mid = 0 THEN NULL ELSE sum_mid // n_mid END
        |    AS trimmed_mean_cents,
        |  CASE WHEN n = 0 THEN NULL
        |    ELSE (sum_mid + k * lo_x + k * hi_x) // n END
        |    AS winsor_mean_cents
        |FROM agg""".stripMargin,

    "q418_kendall_w" ->
      """WITH rev AS (
        |  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
        |    CAST(c_nationkey AS BIGINT) AS nk,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT *, RANK() OVER (PARTITION BY yr ORDER BY rev) AS mr,
        |    COUNT(*) OVER (PARTITION BY yr, rev) AS t
        |  FROM rev),
        |r2f AS (SELECT *, 2 * mr + t - 1 AS r2 FROM ranked),
        |ties AS (
        |  SELECT CAST(SUM(t_j) AS BIGINT) AS sum_t,
        |    COUNT(*) AS m_raters
        |  FROM (
        |    SELECT yr, CAST(COALESCE(SUM(t * t * t - t), 0) AS BIGINT)
        |      AS t_j
        |    FROM (SELECT DISTINCT yr, rev, t FROM r2f) GROUP BY 1)),
        |rsum AS (
        |  SELECT nk, CAST(SUM(r2) AS BIGINT) AS r2_i
        |  FROM r2f GROUP BY 1),
        |ni AS (SELECT COUNT(*) AS n_items FROM rsum),
        |s2 AS (
        |  SELECT MAX(n_items) AS n_items, MAX(m_raters) AS m_raters,
        |    MAX(sum_t) AS sum_t,
        |    CAST(COALESCE(SUM((r2_i - m_raters * (n_items + 1)) *
        |      (r2_i - m_raters * (n_items + 1))), 0) AS BIGINT) AS s2
        |  FROM rsum CROSS JOIN ni CROSS JOIN ties),
        |f AS (
        |  SELECT *, m_raters * m_raters *
        |    (n_items * n_items * n_items - n_items) -
        |    m_raters * sum_t AS den
        |  FROM s2)
        |SELECT n_items, m_raters, sum_t, s2,
        |  CASE WHEN den <= 0 THEN NULL
        |    ELSE 3 * s2 * 1000000 // den END AS w_micro
        |FROM f""".stripMargin,

    "q419_centroid_accuracy" ->
      """WITH vq AS (
        |  SELECT vec_id, label,
        |    generate_subscripts(embedding, 1) - 1 AS pos,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 32768.0)
        |      AS BIGINT) * 1000 AS q1000
        |  FROM embeddings),
        |cm AS (
        |  SELECT label AS label_c, pos,
        |    CAST(SUM(q1000 // 1000) AS BIGINT) AS sq,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM vq GROUP BY 1, 2),
        |m AS (
        |  SELECT label_c, pos,
        |    ((sq * 1000) - (((sq * 1000) % cnt + cnt) % cnt)) // cnt
        |      AS cmilli
        |  FROM cm),
        |d2 AS (
        |  SELECT vec_id, label, label_c,
        |    CAST(SUM((q1000 - cmilli) * (q1000 - cmilli)) AS BIGINT)
        |      AS dd
        |  FROM vq JOIN m ON vq.pos = m.pos
        |  GROUP BY 1, 2, 3),
        |pred AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |    ORDER BY dd, label_c) AS rn
        |  FROM d2)
        |SELECT label, COUNT(*) AS n_vecs,
        |  CAST(COALESCE(SUM(CASE WHEN label_c = label THEN 1 ELSE 0
        |    END), 0) AS BIGINT) AS n_correct,
        |  CASE WHEN COUNT(*) = 0 THEN NULL
        |    ELSE CAST(COALESCE(SUM(CASE WHEN label_c = label THEN 1
        |      ELSE 0 END), 0) AS BIGINT) * 1000 // COUNT(*) END
        |    AS recall_milli
        |FROM pred WHERE rn = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q420_decile_gains" ->
      """WITH ev AS (
        |  SELECT event_id AS id,
        |    -(CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT))
        |      AS nv,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events),
        |rk AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY nv, id) AS rk,
        |    COUNT(*) OVER () AS n
        |  FROM ev),
        |dec AS (
        |  SELECT ((rk - 1) * 10) // n AS decile, COUNT(*) AS n_d,
        |    CAST(SUM(pos) AS BIGINT) AS n_pos
        |  FROM rk GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(n_pos) AS BIGINT) AS tot_pos,
        |    CAST(SUM(n_d) AS BIGINT) AS n
        |  FROM dec),
        |c AS (
        |  SELECT *, CAST(SUM(n_pos) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_pos
        |  FROM dec CROSS JOIN tot)
        |SELECT decile, n_d, n_pos, cum_pos,
        |  CASE WHEN tot_pos = 0 THEN NULL
        |    ELSE cum_pos * 1000 // tot_pos END AS gain_milli,
        |  CASE WHEN n_d = 0 OR tot_pos = 0 THEN NULL
        |    ELSE CAST((CAST(n_pos AS HUGEINT) * n * 1000 //
        |      (CAST(n_d AS HUGEINT) * tot_pos)) AS BIGINT) END
        |    AS lift_milli
        |FROM c ORDER BY decile""".stripMargin,

    "q421_bag_set_ops" ->
      """WITH f AS (
        |  SELECT o_orderpriority AS pri FROM orders
        |  WHERE o_orderstatus = 'F'),
        |p AS (
        |  SELECT o_orderpriority AS pri FROM orders
        |  WHERE o_orderstatus = 'P'),
        |ex AS (
        |  SELECT 'except_all' AS op, pri, COUNT(*) AS n
        |  FROM (SELECT pri FROM f EXCEPT ALL SELECT pri FROM p)
        |  GROUP BY 2),
        |i AS (
        |  SELECT 'intersect_all' AS op, pri, COUNT(*) AS n
        |  FROM (SELECT pri FROM f INTERSECT ALL SELECT pri FROM p)
        |  GROUP BY 2)
        |SELECT op, pri, n FROM ex
        |UNION ALL SELECT op, pri, n FROM i
        |ORDER BY op, pri""".stripMargin,

    "q422_bigram_lm" ->
      s"""WITH base AS (
         |  SELECT ${Du.tokens("text")} AS toks FROM documents),
         |pos AS (
         |  SELECT toks, unnest(range(1, len(toks))) AS g
         |  FROM base WHERE len(toks) >= 2),
         |bg AS (
         |  SELECT toks[g] AS w1, toks[g + 1] AS w2, COUNT(*) AS c_bigram
         |  FROM pos GROUP BY 1, 2),
         |uni AS (
         |  SELECT w1, CAST(SUM(c_bigram) AS BIGINT) AS c_unigram
         |  FROM bg GROUP BY 1),
         |top AS (
         |  SELECT w1, c_unigram FROM (
         |    SELECT *, ROW_NUMBER() OVER (ORDER BY c_unigram DESC, w1)
         |      AS rn
         |    FROM uni) WHERE rn <= 20),
         |cont AS (
         |  SELECT bg.w1, bg.w2, bg.c_bigram, top.c_unigram,
         |    ROW_NUMBER() OVER (PARTITION BY bg.w1
         |      ORDER BY bg.c_bigram DESC, bg.w2) AS rn
         |  FROM bg JOIN top ON bg.w1 = top.w1)
         |SELECT w1, w2, c_bigram, c_unigram,
         |  CASE WHEN c_unigram = 0 THEN NULL
         |    ELSE c_bigram * 1000 // c_unigram END AS p_milli
         |FROM cont WHERE rn <= 3
         |ORDER BY c_unigram DESC, w1, c_bigram DESC, w2""".stripMargin,

    "q423_prefix_advisor" ->
      """WITH p AS (
        |  SELECT p_partkey AS id, p_name AS nm,
        |    split_part(p_name, ' ', 1) AS blk
        |  FROM part),
        |l AS (
        |  SELECT *, lag(nm) OVER (PARTITION BY blk ORDER BY nm, id)
        |    AS prev
        |  FROM p),
        |ml AS (
        |  SELECT *, least(length(nm), length(prev)) AS minl FROM l),
        |ps AS (
        |  SELECT *,
        |    CASE WHEN prev IS NULL OR minl = 0 THEN NULL
        |      ELSE list_position(
        |        list_transform(range(1, minl + 1),
        |          i -> substr(nm, i::INT, 1) = substr(prev, i::INT, 1)),
        |        false) END AS cpos
        |  FROM ml),
        |cpf AS (
        |  SELECT *,
        |    CASE WHEN prev IS NULL THEN 0 WHEN minl = 0 THEN 0
        |      WHEN cpos = 0 THEN minl ELSE cpos - 1 END AS cp
        |  FROM ps)
        |SELECT COUNT(*) AS n_strings,
        |  CAST(COALESCE(SUM(CASE WHEN prev IS NULL THEN 0 ELSE 1 END),
        |    0) AS BIGINT) AS n_pairs,
        |  CAST(SUM(CAST(length(nm) AS BIGINT)) AS BIGINT)
        |    AS total_bytes,
        |  CAST(COALESCE(SUM(cp), 0) AS BIGINT) AS saved_bytes,
        |  CASE WHEN CAST(SUM(CAST(length(nm) AS BIGINT)) AS BIGINT) = 0
        |    THEN NULL
        |    ELSE CAST(COALESCE(SUM(cp), 0) AS BIGINT) * 1000 //
        |      CAST(SUM(CAST(length(nm) AS BIGINT)) AS BIGINT) END
        |    AS save_milli
        |FROM cpf""".stripMargin,

    "q424_heaps_law" ->
      s"""WITH docs AS (
         |  SELECT doc_id, ${Du.tokens("text")} AS toks FROM documents),
         |dl AS (
         |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dlen
         |  FROM docs),
         |off AS (
         |  SELECT *, CAST(SUM(dlen) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS cum
         |  FROM dl),
         |tot AS (
         |  SELECT CAST(COALESCE(SUM(dlen), 0) AS BIGINT) AS total
         |  FROM dl),
         |tk AS (
         |  SELECT cum - dlen AS off0, toks,
         |    unnest(range(1, len(toks) + 1)) AS g
         |  FROM off WHERE dlen >= 1),
         |fp AS (
         |  SELECT toks[g] AS w, MIN(off0 + g) AS fpos
         |  FROM tk GROUP BY 1),
         |curve AS (
         |  SELECT ((fpos - 1) * 10) // total + 1 AS checkpoint,
         |    COUNT(*) AS new_vocab
         |  FROM fp CROSS JOIN tot GROUP BY 1),
         |grid AS (
         |  SELECT unnest(range(1, 11)) AS checkpoint, total FROM tot),
         |g2 AS (
         |  SELECT grid.checkpoint, grid.total,
         |    COALESCE(curve.new_vocab, 0) AS new_vocab
         |  FROM grid LEFT JOIN curve
         |    ON grid.checkpoint = curve.checkpoint),
         |c2 AS (
         |  SELECT *, CAST(SUM(new_vocab) OVER (ORDER BY checkpoint
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS vocab_cum
         |  FROM g2)
         |SELECT checkpoint, checkpoint * total // 10 AS tokens_seen,
         |  CAST(new_vocab AS BIGINT) AS new_vocab, vocab_cum
         |FROM c2 ORDER BY checkpoint""".stripMargin,

    "q425_cardinality_check" -> {
      def lane(name: String, at: String, ka: String, bt: String,
          kb: String): String =
        s"""SELECT '$name' AS join_name, n_a, n_b, ndv_a, ndv_b, actual
           |  FROM (SELECT COUNT(*) AS n_a, COUNT(DISTINCT $ka) AS ndv_a
           |        FROM $at)
           |  CROSS JOIN (SELECT COUNT(*) AS n_b,
           |    COUNT(DISTINCT $kb) AS ndv_b FROM $bt)
           |  CROSS JOIN (SELECT COUNT(*) AS actual
           |    FROM $at JOIN $bt ON $ka = $kb)""".stripMargin
      s"""WITH u AS (
         |  ${lane("j1_li_part", "lineitem", "l_partkey", "part",
             "p_partkey")}
         |  UNION ALL
         |  ${lane("j2_li_supplier", "lineitem", "l_suppkey", "supplier",
             "s_suppkey")}
         |  UNION ALL
         |  ${lane("j3_ord_customer", "orders", "o_custkey", "customer",
             "c_custkey")}),
         |e AS (
         |  SELECT *, CASE WHEN greatest(ndv_a, ndv_b) = 0 THEN NULL
         |    ELSE CAST(${Du.intDiv(Du.wide("n_a") + " * n_b",
             "greatest(ndv_a, ndv_b)")} AS BIGINT) END AS est
         |  FROM u)
         |SELECT join_name, n_a, n_b, ndv_a, ndv_b, actual, est,
         |  CASE WHEN actual = 0 OR est IS NULL THEN NULL
         |    WHEN est >= actual THEN (est - actual) * 1000 // actual
         |    ELSE -((actual - est) * 1000 // actual) END AS err_milli
         |FROM e ORDER BY join_name""".stripMargin
    },

    "q426_feature_hash_collisions" ->
      s"""WITH v AS (
         |  SELECT w, COUNT(*) AS c FROM (
         |    SELECT unnest(${Du.tokens("text")}) AS w FROM documents)
         |  GROUP BY 1),
         |b AS (
         |  SELECT *, ${Du.hash64("concat('fh:', w)")} % 1024 AS bkt
         |  FROM v),
         |per AS (
         |  SELECT bkt, COUNT(*) AS k, CAST(SUM(c) AS BIGINT) AS mass
         |  FROM b GROUP BY 1),
         |agg AS (
         |  SELECT CAST(SUM(k) AS BIGINT) AS n_vocab,
         |    COUNT(*) AS n_buckets_used,
         |    CAST(COALESCE(SUM(CASE WHEN k >= 2 THEN 1 ELSE 0 END), 0)
         |      AS BIGINT) AS n_collided_buckets,
         |    CAST(COALESCE(SUM(CASE WHEN k >= 2 THEN k ELSE 0 END), 0)
         |      AS BIGINT) AS collided_vocab,
         |    MAX(k) AS max_bucket,
         |    CAST(SUM(mass) AS BIGINT) AS total_mass,
         |    CAST(COALESCE(SUM(CASE WHEN k >= 2 THEN mass ELSE 0 END),
         |      0) AS BIGINT) AS collided_mass
         |  FROM per)
         |SELECT n_vocab, n_buckets_used, n_collided_buckets,
         |  collided_vocab, max_bucket, total_mass, collided_mass,
         |  CASE WHEN n_vocab = 0 THEN NULL
         |    ELSE collided_vocab * 1000 // n_vocab END
         |    AS vocab_coll_milli,
         |  CASE WHEN total_mass = 0 THEN NULL
         |    ELSE collided_mass * 1000 // total_mass END
         |    AS mass_coll_milli
         |FROM agg""".stripMargin,

    "q427_markov_stationary" -> {
      val rounds = (1 to 3).map { i =>
        val p = i - 1
        s"""v$i AS (
           |  SELECT cur AS t,
           |    CAST(SUM(mass * p_ppm) AS BIGINT) // 1000000 AS mass
           |  FROM mat JOIN v$p ON mat.prev = v$p.t GROUP BY 1)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH ev AS (
         |  SELECT user_id AS u, event_type AS et,
         |    epoch_us(ts::TIMESTAMP) AS tsu, event_id AS id
         |  FROM events),
         |tr AS (
         |  SELECT prev, et AS cur, COUNT(*) AS c FROM (
         |    SELECT *, lag(et) OVER (PARTITION BY u ORDER BY tsu, id)
         |      AS prev
         |    FROM ev)
         |  WHERE prev IS NOT NULL GROUP BY 1, 2),
         |mat AS (
         |  SELECT prev, cur, c * 1000000 //
         |    CAST(SUM(c) OVER (PARTITION BY prev) AS BIGINT) AS p_ppm
         |  FROM tr),
         |ty AS (SELECT DISTINCT prev AS t FROM mat),
         |nt AS (SELECT COUNT(*) AS n FROM ty),
         |v0 AS (SELECT t, 1000000 // n AS mass FROM ty CROSS JOIN nt),
         |$rounds
         |SELECT t AS event_type, mass AS mass3_ppm
         |FROM v3 ORDER BY 1""".stripMargin
    },

    "q428_eb_shrinkage" ->
      """WITH pr AS (
        |  SELECT l_partkey AS pk, COUNT(*) AS n,
        |    CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN 1
        |      ELSE 0 END), 0) AS BIGINT) AS k
        |  FROM lineitem GROUP BY 1),
        |pr2 AS (SELECT *, k * 1000000 // n AS r_micro FROM pr),
        |mom AS (
        |  SELECT COUNT(*) AS p_cnt, CAST(SUM(n) AS BIGINT) AS sum_n,
        |    CAST(SUM(k) AS BIGINT) AS sum_k,
        |    CAST(SUM(r_micro) AS BIGINT) AS sum_r,
        |    SUM(CAST(r_micro AS HUGEINT) * r_micro) AS sum_r2_w
        |  FROM pr2),
        |m2 AS (
        |  SELECT *, CASE WHEN sum_n = 0 THEN 0
        |    ELSE sum_k * 1000000 // sum_n END AS m_micro
        |  FROM mom),
        |m3 AS (
        |  SELECT *, CASE WHEN p_cnt < 2 THEN 0 ELSE
        |    CAST(((p_cnt * sum_r2_w - CAST(sum_r AS HUGEINT) * sum_r)
        |      // (CAST(p_cnt AS HUGEINT) * (p_cnt - 1))) AS BIGINT) END
        |    AS v_micro2
        |  FROM m2),
        |m4 AS (
        |  SELECT *, CASE WHEN v_micro2 <= 0 THEN 0
        |    ELSE greatest(m_micro * (1000000 - m_micro) // v_micro2
        |      - 1, 0) END AS s_prior
        |  FROM m3),
        |m5 AS (
        |  SELECT m_micro, v_micro2, s_prior,
        |    m_micro * s_prior AS a_micro,
        |    (1000000 - m_micro) * s_prior AS b_micro
        |  FROM m4),
        |sh AS (
        |  SELECT pk, n, k, k * 1000 // n AS raw_milli,
        |    CAST(((CAST(k AS HUGEINT) * 1000000 + a_micro) * 1000 //
        |      (CAST(n AS HUGEINT) * 1000000 + a_micro + b_micro))
        |      AS BIGINT) AS shrunk_milli,
        |    s_prior
        |  FROM pr2 CROSS JOIN m5),
        |df AS (
        |  SELECT *, abs(raw_milli - shrunk_milli) AS diff_milli
        |  FROM sh),
        |rk AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY diff_milli DESC, pk)
        |    AS rn
        |  FROM df)
        |SELECT pk, n, k, raw_milli, shrunk_milli, diff_milli, s_prior
        |FROM rk WHERE rn <= 10
        |ORDER BY diff_milli DESC, pk""".stripMargin,

    "q429_shapley_rates" -> {
      def v(a: Int, b: Int, c: Int): String =
        s"MAX(CASE WHEN fa = $a AND fb = $b AND fc = $c THEN rr END)"
      s"""WITH cells AS (
         |  SELECT
         |    CASE WHEN CAST(l_quantity AS BIGINT) > 25 THEN 1 ELSE 0
         |      END AS fa,
         |    CASE WHEN CAST(CAST(l_discount AS DECIMAL(12,2)) * 100
         |      AS BIGINT) >= 5 THEN 1 ELSE 0 END AS fb,
         |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |      THEN 1 ELSE 0 END AS fc,
         |    COUNT(*) AS n,
         |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS k
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2, 3),
         |rc AS (SELECT *, k * 1000000 // n AS rr FROM cells),
         |w AS (
         |  SELECT ${v(0, 0, 0)} AS v000, ${v(1, 0, 0)} AS v100,
         |    ${v(0, 1, 0)} AS v010, ${v(0, 0, 1)} AS v001,
         |    ${v(1, 1, 0)} AS v110, ${v(1, 0, 1)} AS v101,
         |    ${v(0, 1, 1)} AS v011, ${v(1, 1, 1)} AS v111
         |  FROM rc),
         |u AS (
         |  SELECT 'f1_high_qty' AS feature,
         |    2 * (v100 - v000) + (v110 - v010) + (v101 - v001)
         |      + 2 * (v111 - v011) AS phi_x6_micro, v000, v111
         |  FROM w
         |  UNION ALL SELECT 'f2_deep_discount',
         |    2 * (v010 - v000) + (v110 - v100) + (v011 - v001)
         |      + 2 * (v111 - v101), v000, v111
         |  FROM w
         |  UNION ALL SELECT 'f3_urgent',
         |    2 * (v001 - v000) + (v101 - v100) + (v011 - v010)
         |      + 2 * (v111 - v110), v000, v111
         |  FROM w)
         |SELECT feature, phi_x6_micro, v000, v111
         |FROM u ORDER BY feature""".stripMargin
    },

    "q430_rrf_fusion" ->
      s"""WITH docs AS (
         |  SELECT doc_id, n_chars,
         |    ${Du.hash64("concat('rrf:', CAST(doc_id AS VARCHAR))")}
         |      AS h
         |  FROM documents),
         |ra AS (
         |  SELECT doc_id,
         |    ROW_NUMBER() OVER (ORDER BY -n_chars, doc_id) AS ra
         |  FROM docs),
         |rb AS (
         |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY h, doc_id) AS rb
         |  FROM docs),
         |f AS (
         |  SELECT ra.doc_id, ra, rb,
         |    1000000000 // (60 + ra) + 1000000000 // (60 + rb)
         |      AS rrf_nano
         |  FROM ra JOIN rb ON ra.doc_id = rb.doc_id),
         |k AS (
         |  SELECT *, ROW_NUMBER() OVER (ORDER BY rrf_nano DESC, doc_id)
         |    AS rn
         |  FROM f)
         |SELECT doc_id, ra, rb, rrf_nano FROM k WHERE rn <= 10
         |ORDER BY rrf_nano DESC, doc_id""".stripMargin,

    "q431_att_stratified" ->
      """WITH base AS (
        |  SELECT o_orderkey, c_mktsegment AS seg,
        |    CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
        |      AS treated,
        |    o_orderdate
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |wl AS (
        |  SELECT o_orderkey, seg, yr, treated,
        |    MAX(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
        |      CAST(l_shipdate AS DATE)) > 90 THEN 1 ELSE 0 END) AS late
        |  FROM base JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2, 3, 4),
        |cell AS (
        |  SELECT seg, yr, treated, COUNT(*) AS n,
        |    CAST(SUM(late) AS BIGINT) AS k,
        |    CAST(SUM(late) AS BIGINT) * 1000000 // COUNT(*) AS r_micro
        |  FROM wl GROUP BY 1, 2, 3),
        |st AS (
        |  SELECT t.seg, t.yr, t.n AS n_t, t.r_micro AS rt,
        |    c.r_micro AS rc
        |  FROM cell t JOIN cell c ON t.seg = c.seg AND t.yr = c.yr
        |    AND t.treated = 1 AND c.treated = 0),
        |naive AS (
        |  SELECT CAST(COALESCE(SUM(CASE WHEN treated = 1
        |    THEN (k * 1000000 // n) ELSE -(k * 1000000 // n) END), 0)
        |    AS BIGINT) AS naive_diff_micro
        |  FROM (SELECT treated, COUNT(*) AS n,
        |        CAST(SUM(late) AS BIGINT) AS k
        |        FROM wl GROUP BY 1)),
        |agg AS (
        |  SELECT COUNT(*) AS n_strata, CAST(SUM(n_t) AS BIGINT)
        |      AS n_treated,
        |    CAST(COALESCE(SUM(n_t * (rt - rc)), 0) AS BIGINT) AS num
        |  FROM st)
        |SELECT n_strata, n_treated,
        |  CASE WHEN n_treated = 0 THEN NULL
        |    WHEN num >= 0 THEN num // n_treated
        |    ELSE -((-num) // n_treated) END AS att_micro,
        |  naive_diff_micro
        |FROM agg CROSS JOIN naive""".stripMargin,

    "q432_partial_dependence" ->
      s"""WITH li AS (
         |  SELECT CAST(l_quantity AS BIGINT) // 5 AS qb,
         |    CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)
         |      AS dc,
         |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
         |  FROM lineitem),
         |mix AS (SELECT dc, COUNT(*) AS n_d FROM li GROUP BY 1),
         |wtot AS (SELECT CAST(SUM(n_d) AS BIGINT) AS n_all FROM mix),
         |wm AS (
         |  SELECT dc, n_d * 1000000 // n_all AS w_ppm
         |  FROM mix CROSS JOIN wtot),
         |cellr AS (
         |  SELECT qb, dc, COUNT(*) AS n_c,
         |    CAST(SUM(y) AS BIGINT) AS k_c,
         |    CAST(SUM(y) AS BIGINT) * 1000000 // COUNT(*) AS r_micro
         |  FROM li GROUP BY 1, 2),
         |pd AS (
         |  SELECT qb, CAST(SUM(n_c) AS BIGINT) AS n_rows,
         |    CAST(SUM(k_c) AS BIGINT) AS k_rows,
         |    COALESCE(SUM(${Du.wide("w_ppm")} * r_micro),
         |      ${Du.wide("0")}) AS wr_w,
         |    CAST(COALESCE(SUM(w_ppm), 0) AS BIGINT) AS w_present
         |  FROM cellr JOIN wm ON cellr.dc = wm.dc
         |  GROUP BY 1)
         |SELECT qb, n_rows,
         |  CASE WHEN w_present = 0 THEN NULL
         |    ELSE CAST(${Du.intDiv("wr_w", Du.wide("w_present"))}
         |      AS BIGINT) END AS pd_micro,
         |  CASE WHEN n_rows = 0 THEN NULL
         |    ELSE k_rows * 1000000 // n_rows END AS raw_micro
         |FROM pd ORDER BY qb""".stripMargin,

    "q433_bh_fdr" -> {
      val crit = Seq(3090232L, 2878161L, 2747781L, 2652069L, 2575829L,
        2512144L, 2457263L, 2408915L, 2365618L, 2326347L, 2290367L,
        2257129L, 2226211L, 2197286L, 2170090L, 2144410L, 2120071L,
        2096927L, 2074854L, 2053748L, 2033520L, 2014090L, 1995393L,
        1977368L, 1959963L)
      val critSql = crit.zipWithIndex
        .map { case (c, i) => s"WHEN ${i + 1} THEN $c" }
        .mkString("CASE rk ", " ", " END")
      s"""WITH nat AS (
         |  SELECT CAST(c_nationkey AS BIGINT) AS nk, COUNT(*) AS n,
         |    CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN 1
         |      ELSE 0 END), 0) AS BIGINT) AS k
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1),
         |tot AS (
         |  SELECT CAST(SUM(n) AS BIGINT) AS n0,
         |    CAST(SUM(k) AS BIGINT) AS k0
         |  FROM nat),
         |z AS (
         |  SELECT *, ${Du.wide("k")} * n0 - ${Du.wide("k0")} * n AS dd,
         |    ${Du.wide("n")} * k0 * (n0 - k0) AS prod_w
         |  FROM nat CROSS JOIN tot),
         |z2 AS (
         |  SELECT *, ${bhZF(Du)} AS z_micro
         |  FROM z),
         |z3 AS (
         |  SELECT *, CASE WHEN z_micro >= 0 THEN z_micro
         |    ELSE -z_micro END AS abs_z
         |  FROM z2),
         |rkd AS (
         |  SELECT *, ROW_NUMBER() OVER (ORDER BY abs_z DESC, nk) AS rk
         |  FROM z3),
         |rc AS (SELECT *, $critSql AS crit_micro FROM rkd),
         |km AS (
         |  SELECT CAST(COALESCE(MAX(CASE WHEN abs_z >= crit_micro
         |    THEN rk END), 0) AS BIGINT) AS kmax
         |  FROM rc)
         |SELECT nk, n, k, z_micro, rk, crit_micro, rk <= kmax
         |  AS rejected
         |FROM rc CROSS JOIN km ORDER BY rk""".stripMargin
    },

    "q434_sorted_neighborhood" ->
      s"""WITH v AS (
         |  SELECT t, COUNT(*) AS n FROM (
         |    SELECT unnest(${Du.tokens("p_name")}) AS t FROM part)
         |  GROUP BY 1),
         |rk AS (
         |  SELECT t, ROW_NUMBER() OVER (ORDER BY t) AS rk FROM v),
         |l AS (
         |  SELECT t AS ta, rk AS rka, unnest([rk // 4, rk // 4 + 1])
         |    AS band
         |  FROM rk),
         |r AS (SELECT t AS tb, rk AS rkb, rk // 4 AS band FROM rk),
         |cand AS (
         |  SELECT DISTINCT ta, tb
         |  FROM l JOIN r ON l.band = r.band
         |  WHERE rkb - rka BETWEEN 1 AND 3),
         |sc AS (
         |  SELECT *, damerau_levenshtein(ta, tb) AS dl FROM cand),
         |agg AS (
         |  SELECT COUNT(*) AS n_candidates,
         |    CAST(COALESCE(SUM(CASE WHEN dl <= 2 THEN 1 ELSE 0 END),
         |      0) AS BIGINT) AS n_hits
         |  FROM sc),
         |nt AS (SELECT COUNT(*) AS n_tokens FROM rk)
         |SELECT n_tokens, n_candidates, n_hits,
         |  CASE WHEN n_candidates = 0 THEN NULL
         |    ELSE n_hits * 1000 // n_candidates END AS hit_milli
         |FROM agg CROSS JOIN nt""".stripMargin,

    "q435_effective_suppliers" ->
      """WITH cells AS (
        |  SELECT CAST(s_nationkey AS BIGINT) AS nk, l_suppkey,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |agg AS (
        |  SELECT nk, COUNT(*) AS n_suppliers,
        |    CAST(SUM(w) AS BIGINT) AS sw,
        |    SUM(CAST(w AS HUGEINT) * w) AS sw2_w
        |  FROM cells GROUP BY 1),
        |f AS (
        |  SELECT *, CASE WHEN sw2_w <= 0 THEN NULL ELSE
        |    CAST((CAST(sw AS HUGEINT) * sw * 1000 // sw2_w) AS BIGINT)
        |    END AS eff_milli
        |  FROM agg)
        |SELECT nk, n_suppliers, sw, eff_milli,
        |  CASE WHEN n_suppliers = 0 OR eff_milli IS NULL THEN NULL
        |    ELSE eff_milli // n_suppliers END AS eff_share_milli
        |FROM f ORDER BY nk""".stripMargin,

    "q436_lateness_histogram" ->
      """WITH ev AS (
        |  SELECT user_id AS u, event_id AS id,
        |    epoch_us(ts::TIMESTAMP) AS tsu
        |  FROM events),
        |lr AS (
        |  SELECT *, CAST(MAX(tsu) OVER (PARTITION BY u ORDER BY id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS mx
        |  FROM ev),
        |lm AS (
        |  SELECT *, greatest(0, mx - tsu) // 1000 AS late_ms FROM lr),
        |n AS (SELECT COUNT(*) AS n_all FROM lm),
        |rk AS (
        |  SELECT late_ms, ROW_NUMBER() OVER (ORDER BY late_ms, id)
        |    AS rk
        |  FROM lm),
        |p99 AS (
        |  SELECT late_ms AS p99_late_ms FROM rk CROSS JOIN n
        |  WHERE rk = (99 * n_all + 99) // 100),
        |h AS (
        |  SELECT CASE WHEN late_ms = 0 THEN 0
        |    ELSE CAST(length(bin(late_ms)) AS BIGINT) END AS bucket,
        |    COUNT(*) AS n_events
        |  FROM lm GROUP BY 1)
        |SELECT bucket, n_events,
        |  CASE WHEN n_all = 0 THEN NULL
        |    ELSE n_events * 1000 // n_all END AS share_milli,
        |  p99_late_ms
        |FROM h CROSS JOIN n CROSS JOIN p99
        |ORDER BY bucket""".stripMargin,

    "q437_bipartite_check" ->
      """WITH RECURSIVE f AS (
        |  SELECT DISTINCT l_partkey AS src, l_suppkey + 10000000 AS dst
        |  FROM lineitem),
        |e AS (SELECT src, dst FROM f UNION SELECT dst, src FROM f),
        |bfs AS (
        |  SELECT DISTINCT src AS node, 0 AS hops FROM f
        |  WHERE src % 100 = 0
        |  UNION
        |  SELECT e.dst, bfs.hops + 1 FROM bfs JOIN e ON bfs.node = e.src
        |  WHERE bfs.hops < 4),
        |h AS (SELECT node, MIN(hops) AS hops FROM bfs GROUP BY 1),
        |conf AS (
        |  SELECT COUNT(*) AS n_reached_edges,
        |    CAST(COALESCE(SUM(CASE WHEN a.hops % 2 = b.hops % 2
        |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_conflicts
        |  FROM e JOIN h a ON e.src = a.node JOIN h b ON e.dst = b.node),
        |r AS (
        |  SELECT COUNT(*) AS n_reached,
        |    CAST(COALESCE(SUM(CASE WHEN hops % 2 = 0 THEN 1 ELSE 0
        |      END), 0) AS BIGINT) AS n_even
        |  FROM h)
        |SELECT n_reached, n_even, n_reached_edges, n_conflicts,
        |  n_conflicts = 0 AS bipartite_in_ball
        |FROM r CROSS JOIN conf""".stripMargin,

    "q438_group_by_all" ->
      """SELECT o_orderstatus AS status, o_orderpriority AS priority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |    AS BIGINT)) AS BIGINT) AS cents
        |FROM orders
        |GROUP BY ALL
        |ORDER BY ALL""".stripMargin,

    "q439_hodges_lehmann" ->
      """WITH m AS (
        |  SELECT (year(CAST(o_orderdate AS DATE)) - 1992) * 12 +
        |      month(CAST(o_orderdate AS DATE)) - 1 AS mi,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |p AS (
        |  SELECT a.y + b.y AS w2 FROM m a JOIN m b ON a.mi <= b.mi),
        |cnt AS (SELECT COUNT(*) AS n_walsh FROM p),
        |r AS (SELECT w2, ROW_NUMBER() OVER (ORDER BY w2) AS rn FROM p),
        |med AS (
        |  SELECT w2 // 2 AS hl_cents, n_walsh FROM r CROSS JOIN cnt
        |  WHERE rn = (n_walsh + 1) // 2),
        |rm AS (SELECT y, ROW_NUMBER() OVER (ORDER BY y) AS rn FROM m),
        |nm AS (SELECT COUNT(*) AS n_months FROM m),
        |mp AS (
        |  SELECT y AS median_cents, n_months FROM rm CROSS JOIN nm
        |  WHERE rn = (n_months + 1) // 2)
        |SELECT n_months, n_walsh, median_cents, hl_cents
        |FROM mp CROSS JOIN med""".stripMargin,

    "q440_runs_updown" ->
      """WITH day AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS y
        |  FROM orders GROUP BY 1),
        |df AS (
        |  SELECT day, y - lag(y) OVER (ORDER BY day) AS diff FROM day),
        |sg AS (
        |  SELECT day, CASE WHEN diff > 0 THEN 1 ELSE -1 END AS sg
        |  FROM df WHERE diff IS NOT NULL AND diff <> 0),
        |rr AS (
        |  SELECT sg, lag(sg) OVER (ORDER BY day) AS prev_sg FROM sg),
        |agg AS (
        |  SELECT COUNT(*) AS nd,
        |    CAST(COALESCE(SUM(CASE WHEN prev_sg IS NULL
        |      OR sg <> prev_sg THEN 1 ELSE 0 END), 0) AS BIGINT)
        |      AS r_runs
        |  FROM rr),
        |z AS (
        |  SELECT *, CASE WHEN nd < 2 OR 16 * nd - 13 <= 0 THEN NULL
        |    ELSE CAST(floor(CAST(3 * r_runs - 2 * nd - 1 AS DOUBLE) /
        |      CAST(3 AS DOUBLE) * sqrt(CAST(90 AS DOUBLE) /
        |      CAST(16 * nd - 13 AS DOUBLE)) *
        |      CAST(1000000 AS DOUBLE)) AS BIGINT) END AS z_micro
        |  FROM agg)
        |SELECT nd, r_runs, z_micro,
        |  CASE WHEN z_micro IS NULL THEN NULL
        |    ELSE z_micro > 1959964 OR z_micro < -1959964 END
        |    AS reject_95
        |FROM z""".stripMargin,

    "q441_ks_two_sample" ->
      s"""WITH cls AS (
         |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS v,
         |    CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'BUILDING'
         |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS c1,
         |    CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'MACHINERY'
         |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS c2
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
         |  GROUP BY 1),
         |cum AS (
         |  SELECT *, CAST(SUM(c1) OVER o AS BIGINT) AS cum1,
         |    CAST(SUM(c2) OVER o AS BIGINT) AS cum2
         |  FROM cls WINDOW o AS (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |tot AS (
         |  SELECT CAST(SUM(c1) AS BIGINT) AS n1,
         |    CAST(SUM(c2) AS BIGINT) AS n2
         |  FROM cls),
         |dm AS (
         |  SELECT MAX(abs(${Du.wide("cum1")} * n2 -
         |    ${Du.wide("cum2")} * n1)) AS dmax_w,
         |    MAX(n1) AS n1, MAX(n2) AS n2
         |  FROM cum CROSS JOIN tot)
         |SELECT n1, n2,
         |  CASE WHEN n1 = 0 OR n2 = 0 THEN NULL ELSE
         |    CAST(${Du.intDiv("dmax_w * 1000",
             "(" + Du.wide("n1") + " * n2)")} AS BIGINT) END
         |    AS ks_milli,
         |  CASE WHEN n1 = 0 OR n2 = 0 THEN NULL ELSE
         |    CAST(floor(${Du.wideToDouble("dmax_w")} /
         |      sqrt(${Du.wideToDouble(
             Du.wide("n1") + " * n2 * (n1 + n2)")}) *
         |      CAST(1000000 AS DOUBLE)) AS BIGINT) END
         |    AS lambda_micro,
         |  CASE WHEN n1 = 0 OR n2 = 0 THEN NULL ELSE
         |    CAST(floor(${Du.wideToDouble("dmax_w")} /
         |      sqrt(${Du.wideToDouble(
             Du.wide("n1") + " * n2 * (n1 + n2)")}) *
         |      CAST(1000000 AS DOUBLE)) AS BIGINT) > 1358100 END
         |    AS reject_95
         |FROM dm""".stripMargin,

    "q444_chow_test" -> {
      def num(n: String, sx: String, sy: String, sxx: String,
          sxy: String, syy: String): String =
        s"greatest((${Du.wide(n)} * $syy - ${Du.wide(sy)} * $sy) * " +
          s"($n * $sxx - $sx * $sx) - " +
          s"(${Du.wide(n)} * $sxy - ${Du.wide(sx)} * $sy) * " +
          s"(${Du.wide(n)} * $sxy - ${Du.wide(sx)} * $sy), " +
          s"${Du.wide("0")})"
      def den(n: String, sx: String, sxx: String): String =
        s"${Du.wide(n)} * ($n * $sxx - $sx * $sx)"
      val fText =
        "CASE WHEN n1 IS NULL OR n2 IS NULL OR n1 + n2 < 5 " +
          "OR denp <= 0 OR dena <= 0 OR denb <= 0 THEN NULL ELSE " +
          s"CAST(floor(((${Du.wideToDouble("nump")} / " +
          s"${Du.wideToDouble("denp")} - " +
          s"${Du.wideToDouble("numa")} / ${Du.wideToDouble("dena")} - " +
          s"${Du.wideToDouble("numb")} / ${Du.wideToDouble("denb")}) / " +
          "CAST(2 AS DOUBLE)) / " +
          s"((${Du.wideToDouble("numa")} / ${Du.wideToDouble("dena")} + " +
          s"${Du.wideToDouble("numb")} / ${Du.wideToDouble("denb")}) / " +
          "CAST(n1 + n2 - 4 AS DOUBLE)) * " +
          "CAST(1000000 AS DOUBLE)) AS BIGINT) END"
      def c(col0: String, seg: Int): String =
        s"MAX(CASE WHEN seg = $seg THEN $col0 END)"
      s"""WITH m AS (
         |  SELECT (year(CAST(o_orderdate AS DATE)) - 1992) * 12 +
         |      month(CAST(o_orderdate AS DATE)) - 1 AS mi,
         |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS y
         |  FROM orders GROUP BY 1),
         |ms AS (
         |  SELECT *, CASE WHEN mi < 36 THEN 0 ELSE 1 END AS seg
         |  FROM m),
         |st AS (
         |  SELECT seg, COUNT(*) AS n, CAST(SUM(mi) AS BIGINT) AS sx,
         |    CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(mi * mi) AS BIGINT) AS sxx,
         |    CAST(SUM(mi * y) AS BIGINT) AS sxy,
         |    SUM(${Du.wide("y")} * y) AS syy_w
         |  FROM ms GROUP BY 1),
         |w AS (
         |  SELECT ${c("n", 0)} AS n1, ${c("sx", 0)} AS sx1,
         |    ${c("sy", 0)} AS sy1, ${c("sxx", 0)} AS sxx1,
         |    ${c("sxy", 0)} AS sxy1, ${c("syy_w", 0)} AS syy1,
         |    ${c("n", 1)} AS n2, ${c("sx", 1)} AS sx2,
         |    ${c("sy", 1)} AS sy2, ${c("sxx", 1)} AS sxx2,
         |    ${c("sxy", 1)} AS sxy2, ${c("syy_w", 1)} AS syy2
         |  FROM st),
         |l AS (
         |  SELECT *,
         |    ${num("(n1 + n2)", "(sx1 + sx2)", "(sy1 + sy2)",
             "(sxx1 + sxx2)", "(sxy1 + sxy2)", "(syy1 + syy2)")}
         |      AS nump,
         |    ${den("(n1 + n2)", "(sx1 + sx2)", "(sxx1 + sxx2)")}
         |      AS denp,
         |    ${num("n1", "sx1", "sy1", "sxx1", "sxy1", "syy1")}
         |      AS numa,
         |    ${den("n1", "sx1", "sxx1")} AS dena,
         |    ${num("n2", "sx2", "sy2", "sxx2", "sxy2", "syy2")}
         |      AS numb,
         |    ${den("n2", "sx2", "sxx2")} AS denb
         |  FROM w),
         |f AS (SELECT *, $fText AS f_micro FROM l)
         |SELECT n1 + n2 AS n_months, n1, n2, f_micro,
         |  CASE WHEN f_micro IS NULL THEN NULL
         |    ELSE f_micro > 3111000 END AS break_95
         |FROM f""".stripMargin
    },

    "q442_equidepth_histogram" ->
      """WITH x AS (
        |  SELECT o_orderkey AS id,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS x
        |  FROM orders),
        |rk AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY x, id) AS rk,
        |    COUNT(*) OVER () AS n
        |  FROM x),
        |b AS (
        |  SELECT ((rk - 1) * 10) // n + 1 AS bucket, COUNT(*) AS n_rows,
        |    MIN(x) AS lo, MAX(x) AS hi
        |  FROM rk GROUP BY 1)
        |SELECT bucket, n_rows, lo, hi, hi - lo AS width
        |FROM b ORDER BY bucket""".stripMargin,

    "q443_grubbs" ->
      s"""WITH day AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS y
         |  FROM orders GROUP BY 1),
         |st AS (
         |  SELECT COUNT(*) AS nd, CAST(SUM(y) AS BIGINT) AS sy,
         |    SUM(${Du.wide("y")} * y) AS syy_w
         |  FROM day),
         |dv AS (
         |  SELECT nd, syy_w, sy,
         |    abs(${Du.wide("y")} * nd - ${Du.wide("sy")}) AS dev_n
         |  FROM day CROSS JOIN st),
         |agg AS (
         |  SELECT MAX(nd) AS nd, MAX(dev_n) AS maxdev_w,
         |    MAX(nd * syy_w - ${Du.wide("sy")} * sy) AS ssn_w
         |  FROM dv),
         |g AS (
         |  SELECT nd, CASE WHEN nd < 3 OR ssn_w <= 0 THEN NULL ELSE
         |    CAST(floor(${Du.wideToDouble("maxdev_w")} *
         |      sqrt(CAST(nd - 1 AS DOUBLE) /
         |      (CAST(nd AS DOUBLE) * ${Du.wideToDouble("ssn_w")})) *
         |      CAST(1000000 AS DOUBLE)) AS BIGINT) END AS g_micro
         |  FROM agg)
         |SELECT nd, g_micro,
         |  CASE WHEN g_micro IS NULL THEN NULL
         |    ELSE g_micro > 4000000 END AS suspect_outlier
         |FROM g""".stripMargin,

    "q445_pivot" ->
      """SELECT priority,
        |  COALESCE(f_n, 0) AS f_n, CAST(f_cents AS BIGINT) AS f_cents,
        |  COALESCE(o_n, 0) AS o_n, CAST(o_cents AS BIGINT) AS o_cents,
        |  COALESCE(p_n, 0) AS p_n, CAST(p_cents AS BIGINT) AS p_cents
        |FROM (
        |  SELECT o_orderpriority AS priority, o_orderstatus AS status,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders)
        |PIVOT (COUNT(*) AS n, SUM(cents) AS cents
        |       FOR status IN ('F' AS f, 'O' AS o, 'P' AS p))
        |ORDER BY priority""".stripMargin,

    "q446_unpivot" ->
      """SELECT priority, metric, val FROM (
        |  SELECT o_orderpriority AS priority,
        |    COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS cents,
        |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
        |  FROM orders GROUP BY 1)
        |UNPIVOT (val FOR metric IN (n_orders, cents, n_custs))
        |ORDER BY priority, metric""".stripMargin,

    "q447_qualify_topk" ->
      """SELECT CAST(o_custkey AS BIGINT) AS custkey, o_orderkey, cents,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY cents DESC, o_orderkey) AS rk
        |FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders)
        |QUALIFY rk <= 3
        |ORDER BY custkey, rk""".stripMargin)
}
