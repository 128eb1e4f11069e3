package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Round-8 analytics inventory. Same determinism contract as
  * [[Analytics]]–[[Analytics5]]: integer lanes end-to-end, ANSI
  * zero-denominator guards mirrored on both engines, floats only
  * through shared fixed-op-order texts over exact sums.
  *
  * Reference behavior: pydala2 exposes none of these — they extend
  * the training-data-pipeline stack (SURVEY.md "beyond the
  * reference").
  */
object Analytics6 {

  private val Sp = graft.functions.PortableSql.Spark
  private val Du = graft.functions.PortableSql.Duck

  /** The exact cents lane (the Analytics2–5 CentsF convention). */
  private val CentsF =
    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

  /** RBO@10 weights, exact integer: w_d = 9^d · 10^(10−d) · (2520/d)
    * for p = 9/10 — every reciprocal depth and every power of p is a
    * rational with denominator dividing 10^10·2520, so truncated
    * rank-biased overlap is an exact integer ratio (the q340/q448
    * scaled-integer discipline applied to Webber et al.'s measure).
    * Shared literal text on both engines.
    */
  private val RboW =
    "CASE d WHEN 1 THEN 22680000000000 WHEN 2 THEN 10206000000000 " +
      "WHEN 3 THEN 6123600000000 WHEN 4 THEN 4133430000000 " +
      "WHEN 5 THEN 2976069600000 WHEN 6 THEN 2232052200000 " +
      "WHEN 7 THEN 1721868840000 WHEN 8 THEN 1355971711500 " +
      "WHEN 9 THEN 1084777369200 ELSE 878669669052 END"
  private val RboDenom = "226800000000000" // 9 · 10^10 · 2520

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Rank-biased overlap (p = 0.9, truncated at depth 10) between
    // the 1995 and 1996 top-10 part revenue rankings — the
    // top-weighted companion to q465's footrule: RBO weights
    // agreement at depth d by p^d/d, so swapping ranks 1↔2 moves the
    // score far more than 9↔10. Exact integers end-to-end (see
    // [[RboW]]); the two top-10s are TakeOrderedAndProject bounded
    // heaps (never a global sort), the depth expansion runs over the
    // ≤10-row joined frame.
    "q473_rbo" -> { (s, d) =>
      def top10(yr: Int) = Tables.lineitem(s, d)
        .filter(expr(s"year(l_shipdate) = $yr"))
        .groupBy(col("l_partkey").as("pk"))
        .agg(sum(expr(
          "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .as("rev"))
        .orderBy(col("rev").desc, col("pk").asc)
        .limit(10)
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("rev").desc, col("pk").asc)).cast("long"))
      val j = top10(1995).select(col("pk"), col("r").as("ra"))
        .join(top10(1996).select(col("pk"), col("r").as("rb")), "pk")
      j.select(col("ra"), col("rb"),
          explode(expr("sequence(1, 10)")).as("d"))
        .filter(expr("greatest(ra, rb) <= d"))
        .groupBy("d").agg(count(lit(1)).as("x_d"))
        .agg(
          coalesce(max(when(col("d") === 10, col("x_d"))), lit(0L))
            .as("x_at_10"),
          coalesce(sum(expr(s"($RboW) * x_d")), lit(0L)).as("num"))
        .select(col("x_at_10"), col("num"),
          expr(s"CAST(${Sp.intDiv(s"${Sp.wide("num")} * 1000000", RboDenom)} " +
            "AS BIGINT)").as("rbo_micro"))
    },

    // Hoover (Robin Hood) index of customer spend concentration: the
    // share of total revenue that would have to move to equalize all
    // customers — H = Σ|x_i − μ| / (2Σx), kept exact by scaling the
    // deviation by n (n·x_i − S is integral; no float mean enters).
    // One aggregate to per-customer cents, one scalar broadcast, one
    // map-side-combined absolute-deviation sum in the DECIMAL(38)
    // lane (n·x crosses BIGINT around 10⁵ customers × 10⁸ cents ×
    // 100× — wide from the start). The inequality companion to q449's
    // Lorenz/Gini pair.
    "q476_hoover" -> { (s, d) =>
      val cust = Tables.orders(s, d)
        .groupBy("o_custkey").agg(sum(expr(CentsF)).as("cents"))
      val tot = cust.agg(count(lit(1)).as("n"), sum("cents").as("st"))
      cust.crossJoin(broadcast(tot))
        .select(col("n"), col("st"),
          expr(s"abs(${Sp.wide("n")} * cents - ${Sp.wide("st")})").as("adev"))
        .groupBy("n", "st").agg(sum("adev").as("sad"))
        .select(col("n"), col("st").as("total_cents"),
          expr(s"CAST(${Sp.intDiv("sad", Sp.wide("n"))} AS BIGINT)")
            .as("sum_absdev_cents"),
          expr("CASE WHEN st <= 0 THEN NULL ELSE " +
            s"CAST(${Sp.intDiv("sad * 1000000",
              s"(${Sp.wide("n")} * st * 2)")} AS BIGINT) END")
            .as("hoover_micro"))
    },

    // Palma ratio of customer spend: top-10% share over bottom-40%
    // share — the inequality measure that ignores the stable middle.
    // Per-customer cents rank through GlobalOrder (customers are
    // row-scale — never a single-partition sort); decile cut points
    // are pure integer arithmetic on the total count; both share sums
    // are map-side-combined; the single float-free ratio surfaces in
    // micro units via exact wide division.
    "q477_palma" -> { (s, d) =>
      val cust = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("ck")).agg(sum(expr(CentsF)).as("cents"))
      val ranked = graft.plans.GlobalOrder.withRowNumber(
        cust, Seq(col("cents").desc, col("ck").asc),
        negate(col("cents")), "rnk", countName = Some("n_all"))
      ranked
        .withColumn("k10", expr("n_all div 10"))
        .withColumn("k40", expr("(4 * n_all) div 10"))
        .groupBy("n_all", "k10", "k40")
        .agg(
          sum(when(col("rnk") <= col("k10"), col("cents"))
            .otherwise(lit(0L))).as("s_top"),
          sum(when(col("rnk") > col("n_all") - col("k40"), col("cents"))
            .otherwise(lit(0L))).as("s_bot"))
        .select(col("n_all"), col("k10"), col("k40"),
          col("s_top").as("top10_cents"), col("s_bot").as("bot40_cents"),
          expr("CASE WHEN k10 = 0 OR s_bot <= 0 THEN NULL ELSE " +
            s"CAST(${Sp.intDiv(s"${Sp.wide("s_top")} * 1000000", "s_bot")} " +
            "AS BIGINT) END").as("palma_micro"))
    },

    // Jarque–Bera normality test per line status from the exact
    // decimal power sums s1..s4 (q453's moment discipline plus the
    // third moment): JB = n·(g1²/6 + g2ex²/24) with g1 = m3/m2^1.5
    // and g2ex = m4/m2² − 3, central moments expanded about the raw
    // sums and the double math happening once per group through ONE
    // shared fixed-op-order text. l_quantity's DECIMAL(4,0) lane
    // keeps s4 ≤ 50⁴·n, exact far past 100 TB.
    "q478_jarque_bera" -> { (s, d) =>
      val QDec = "CAST(l_quantity AS DECIMAL(4,0))"
      val mean = s"(${Sp.wideToDouble("s1")} / n)"
      val m2 = s"(${Sp.wideToDouble("s2")} / n - $mean * $mean)"
      val m3 = s"(${Sp.wideToDouble("s3")} / n - 3 * $mean * " +
        s"(${Sp.wideToDouble("s2")} / n) + 2 * $mean * $mean * $mean)"
      val m4 = s"(${Sp.wideToDouble("s4")} / n - 4 * $mean * " +
        s"(${Sp.wideToDouble("s3")} / n) + " +
        s"6 * $mean * $mean * (${Sp.wideToDouble("s2")} / n) - " +
        s"3 * $mean * $mean * $mean * $mean)"
      val jb = s"(CAST(n AS DOUBLE) * ((($m3 * $m3) / ($m2 * $m2 * $m2)) / 6 + " +
        s"(($m4 / ($m2 * $m2) - 3) * ($m4 / ($m2 * $m2) - 3)) / 24))"
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(expr(QDec)).as("s1"),
          sum(expr(s"$QDec * $QDec")).as("s2"),
          sum(expr(s"$QDec * $QDec * $QDec")).as("s3"),
          sum(expr(s"$QDec * $QDec * $QDec * $QDec")).as("s4"))
        .selectExpr("l_linestatus", "n",
          s"CASE WHEN n < 2 OR $m2 <= 0 THEN NULL ELSE " +
            s"CAST(floor($jb * CAST(1000 AS DOUBLE)) AS BIGINT) END " +
            "AS jb_milli")
        .orderBy("l_linestatus")
    },

    // DeltaAgg MIN/MAX maintenance (the IVM case with no group
    // inverse): state built over pre-1997 shipments, then one mixed
    // batch — retract every 13th orderkey's rows (which includes
    // group extrema: the bounded-recompute path) and insert every 3rd
    // 1997+ row. The oracle recomputes min/max directly over the
    // updated row set, so the gate pins merge ≡ recompute end-to-end
    // INCLUDING the key-bounded base re-aggregation of
    // extremum-touched groups (DeltaAgg.mergeMinMax: safe groups
    // merge from state ⊕ Δ alone; unsafe groups re-aggregate through
    // a left-semi join on their keys — never an O(|base|) rescan).
    // NULL lane: every 7th orderkey ships a NULL value, so n_vals,
    // NULL-retraction no-ops, and all-NULL extremum semantics ride
    // the same gate.
    "q471_delta_minmax" -> { (s, d) =>
      val l = Tables.lineitem(s, d).select(
        expr("CAST(l_partkey % 500 AS BIGINT)").as("g"),
        expr("CASE WHEN l_orderkey % 7 = 0 THEN NULL " +
          "ELSE CAST(l_quantity AS BIGINT) END").as("v"),
        col("l_shipdate"), col("l_orderkey"))
      val base = l.filter(expr("l_shipdate < TIMESTAMP '1997-01-01'"))
      val dels = base.filter(expr("l_orderkey % 13 = 0"))
        .withColumn("op", lit(-1))
      val ins = l.filter(expr(
          "l_shipdate >= TIMESTAMP '1997-01-01' AND l_orderkey % 3 = 0"))
        .withColumn("op", lit(1))
      val updated = base.filter(expr("l_orderkey % 13 <> 0"))
        .unionByName(ins.drop("op"))
      graft.operators.DeltaAgg.mergeMinMax(
          graft.operators.DeltaAgg.fromBaseMinMax(base, Seq("g"), "v"),
          dels.unionByName(ins), Seq("g"), "v", "op")(
          updated.select("g", "v"))
        .orderBy("g")
    },

    // Brown–Forsythe homogeneity-of-variance test across the five
    // order priorities (Levene's test with the median center — robust
    // to the heavy right tail of order values): W = ((N−k)/(k−1)) ·
    // Σnⱼ(z̄ⱼ−z̄)² / ΣΣ(zᵢⱼ−z̄ⱼ)² on zᵢⱼ = |xᵢⱼ − medⱼ|. Group
    // medians are exact lower medians via per-priority ranks (5
    // partitioned windows — HONEST CEILING: each group sorts serially
    // in one task; past ~10⁸ rows per priority, swap the median pass
    // to a per-group GlobalOrder). All z lanes are exact integers;
    // the between/within quadratics expand about the raw sums
    // (nⱼ(z̄ⱼ−z̄)² = (ZⱼN−Znⱼ)²/(nⱼN²)) and surface through ONE
    // fixed-op-order float text over the five pivoted groups — group
    // order is pinned by the priority literals, so both engines sum
    // the five terms in the same sequence.
    "q480_levene_bf" -> { (s, d) =>
      val pr = Tables.orders(s, d)
        .select(col("o_orderpriority").as("p"), expr(CentsF).as("x"),
          col("o_orderkey"))
      val wj = org.apache.spark.sql.expressions.Window.partitionBy("p")
      val med = pr
        .withColumn("r", row_number().over(
          wj.orderBy(col("x"), col("o_orderkey"))).cast("long"))
        .withColumn("nj", count(lit(1)).over(wj))
        .filter(col("r") === expr("(nj + 1) div 2"))
        .select(col("p"), col("x").as("med"))
      val lanes = pr.join(broadcast(med), "p")
        .select(col("p"), abs(col("x") - col("med")).as("z"))
        .groupBy("p")
        .agg(count(lit(1)).as("nj"), sum("z").as("zj"),
          sum(expr(s"${Sp.wide("z")} * z")).as("qj"))
      val pivots = (1 to 5).flatMap { i =>
        Seq(
          max(when(expr(s"p LIKE '$i-%'"), col("nj"))).as(s"n$i"),
          max(when(expr(s"p LIKE '$i-%'"), col("zj"))).as(s"z$i"),
          max(when(expr(s"p LIKE '$i-%'"), col("qj"))).as(s"q$i"))
      }
      lanes.agg(pivots.head, pivots.tail: _*)
        .selectExpr(
          Seq("n1 + n2 + n3 + n4 + n5 AS nt",
            s"${Sp.wide("z1")} + z2 + z3 + z4 + z5 AS zt") ++
            (1 to 5).flatMap(i => Seq(s"n$i", s"z$i", s"q$i")): _*)
        .selectExpr(
          "CAST(nt AS BIGINT) AS n_total",
          "CAST(zt AS BIGINT) AS sum_absdev_cents",
          s"CASE WHEN nt <= 5 OR (${bfB(Sp)}) <= 0 THEN NULL ELSE " +
            s"CAST(floor(((CAST(nt AS DOUBLE) - 5) / 4) * (${bfA(Sp)}) / " +
            s"(${bfB(Sp)}) * CAST(1000000 AS DOUBLE)) AS BIGINT) END " +
            "AS w_micro")
    },

    // Welch's unequal-variance t-test between URGENT and LOW order
    // values, with the Welch–Satterthwaite df and Cohen's d rider —
    // the two-sample comparison battery every experimentation
    // pipeline needs, kept engine-exact the q478 way: per-group
    // (n, Σx, Σx²) in wide integer lanes, one map-side-combined
    // aggregate, every float surfacing through the SAME
    // fixed-op-order texts ([[welchVar]]). Means are exact integer
    // micro-cents; t is SIGNED (floor of a negative is deterministic
    // on both engines).
    "q482_welch_t" -> { (s, d) =>
      val x = s"CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 2 END"
      val v1 = welchVar(Sp, 1)
      val v2 = welchVar(Sp, 2)
      val se2 = s"($v1 / CAST(n1 AS DOUBLE) + $v2 / CAST(n2 AS DOUBLE))"
      val tTxt = s"((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) - " +
        s"CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / sqrt($se2))"
      val dfTxt = s"(($se2 * $se2) / " +
        s"((($v1 / CAST(n1 AS DOUBLE)) * ($v1 / CAST(n1 AS DOUBLE))) / " +
        s"(CAST(n1 AS DOUBLE) - 1) + " +
        s"((($v2 / CAST(n2 AS DOUBLE)) * ($v2 / CAST(n2 AS DOUBLE))) / " +
        s"(CAST(n2 AS DOUBLE) - 1))))"
      val dTxt = s"((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) - " +
        s"CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / " +
        s"sqrt(((CAST(n1 AS DOUBLE) - 1) * $v1 + " +
        s"(CAST(n2 AS DOUBLE) - 1) * $v2) / " +
        s"(CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2)))"
      Tables.orders(s, d)
        .filter(expr(
          "o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '5-%'"))
        .select(expr(x).as("grp"), expr(CentsF).as("cents"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("cents").as("sx"),
          sum(expr(s"${Sp.wide("cents")} * cents")).as("qx"))
        .agg(
          max(when(col("grp") === 1, col("n"))).as("n1"),
          max(when(col("grp") === 1, col("sx"))).as("s1"),
          max(when(col("grp") === 1, col("qx"))).as("q1"),
          max(when(col("grp") === 2, col("n"))).as("n2"),
          max(when(col("grp") === 2, col("sx"))).as("s2"),
          max(when(col("grp") === 2, col("qx"))).as("q2"))
        .selectExpr("n1", "n2",
          s"CAST(${Sp.intDiv(s"${Sp.wide("s1")} * 1000000", "n1")} AS BIGINT)" +
            " AS mean1_microcents",
          s"CAST(${Sp.intDiv(s"${Sp.wide("s2")} * 1000000", "n2")} AS BIGINT)" +
            " AS mean2_microcents",
          s"CASE WHEN n1 < 2 OR n2 < 2 OR ($v1) <= 0 OR ($v2) <= 0 " +
            "THEN NULL ELSE " +
            s"CAST(floor($tTxt * CAST(1000 AS DOUBLE)) AS BIGINT) END " +
            "AS t_milli",
          s"CASE WHEN n1 < 2 OR n2 < 2 OR ($v1) <= 0 OR ($v2) <= 0 " +
            "THEN NULL ELSE " +
            s"CAST(floor($dfTxt * CAST(1000 AS DOUBLE)) AS BIGINT) END " +
            "AS df_milli",
          s"CASE WHEN n1 < 2 OR n2 < 2 OR ($v1) <= 0 OR ($v2) <= 0 " +
            "THEN NULL ELSE " +
            s"CAST(floor($dTxt * CAST(1000000 AS DOUBLE)) AS BIGINT) END " +
            "AS d_micro")
    },

    // Day-over-day top-10 churn of part revenue rankings — the
    // ranking-stability monitor (a leaderboard whose top-10 Jaccard
    // collapses overnight signals a data problem before any absolute
    // metric moves). Per-day top-10 via a day-PARTITIONED bounded
    // rank (WindowGroupLimit heap per day — never global), then one
    // equi-join of consecutive days on (next day, part). All exact
    // integers; |A∪B| = nA + nB − shared.
    "q483_topk_churn" -> { (s, d) =>
      val byDay = org.apache.spark.sql.expressions.Window
        .partitionBy("day")
      val top = Tables.lineitem(s, d)
        .groupBy(expr("CAST(l_shipdate AS DATE)").as("day"),
          col("l_partkey").as("pk"))
        .agg(sum(expr(
          "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .as("rev"))
        .withColumn("r", row_number().over(
          byDay.orderBy(col("rev").desc, col("pk").asc)))
        .filter(col("r") <= 10)
        .select("day", "pk")
      val sizes = top.groupBy("day").agg(count(lit(1)).as("n"))
      val shared = top.as("a")
        .join(top.as("b"),
          expr("date_add(a.day, 1) = b.day AND a.pk = b.pk"))
        .groupBy(col("b.day").as("day")).agg(count(lit(1)).as("shared"))
      sizes.as("cur")
        .join(sizes.as("prev"),
          expr("date_add(prev.day, 1) = cur.day"))
        .select(col("cur.day").as("day"), col("prev.n").as("n_prev"),
          col("cur.n").as("n_cur"))
        .join(shared, Seq("day"), "left")
        .withColumn("shared", coalesce(col("shared"), lit(0L)))
        .withColumn("jaccard_milli", expr(
          "CASE WHEN n_prev + n_cur - shared = 0 THEN NULL " +
            "ELSE shared * 1000 div (n_prev + n_cur - shared) END"))
        .select("day", "n_prev", "n_cur", "shared", "jaccard_milli")
        .orderBy("day")
    },

    // Seasonal-naive forecast evaluation on daily order counts: the
    // day−7 forecast (same weekday last week) scored by MAPE, the
    // ops-monitoring baseline every anomaly detector is judged
    // against. The forecast joins on the CALENDAR date (day − 7), not
    // 7 rows back — a row-based lag silently misaligns the weekday on
    // gapped day frames (round-8 review finding); a day whose week-ago
    // date has no orders scores nothing, exactly as the metric is
    // defined. Exact integer lanes: each day's absolute percentage
    // error is one integer division (|x_t − x_{t−7}|·10⁶ div x_t),
    // the aggregate is their exact mean.
    "q484_seasonal_naive" -> { (s, d) =>
      val days = Tables.orders(s, d)
        .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
        .agg(count(lit(1)).as("nd"))
      days
        .join(days.select(expr("date_add(day, 7)").as("day"),
          col("nd").as("f")), Seq("day"))
        .withColumn("ape", expr("abs(nd - f) * 1000000 div nd"))
        .agg(count(lit(1)).as("n_days_scored"),
          sum("ape").as("sum_ape"),
          max("ape").as("worst_ape_micro"))
        .withColumn("mape_micro", expr("sum_ape div n_days_scored"))
        .select("n_days_scored", "mape_micro", "worst_ape_micro")
    },

    // One-sample Kolmogorov–Smirnov test of order dates against the
    // discrete uniform over their own [min, max] span — the
    // load-uniformity check (q95 is the TWO-sample drift twin). Kept
    // exact by clearing denominators: D⁺/D⁻ comparisons scale by
    // n·span so every lane is an integer (cum·span − n·(d−lo+1));
    // the single division to micro units happens once on the exact
    // maxima through the wide lane. Per-day cumulative rides the
    // calendar-bounded day frame.
    "q486_ks_uniform" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window.orderBy("dd")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val days = Tables.orders(s, d)
        .select(expr(
          "datediff(CAST(o_orderdate AS DATE), DATE '1990-01-01')")
          .cast("long").as("dd"))
        .groupBy("dd").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(w))
      val tot = days.agg(sum("c").as("n"), min("dd").as("lo"),
        max("dd").as("hi"))
      days.crossJoin(broadcast(tot))
        .withColumn("span", expr("hi - lo + 1"))
        .withColumn("dp", expr("cum * span - n * (dd - lo + 1)"))
        .withColumn("dm", expr("n * (dd - lo + 1) - (cum - c) * span"))
        .groupBy("n", "span")
        .agg(max("dp").as("d_plus_scaled"), max("dm").as("d_minus_scaled"))
        .select(col("n"), col("span"),
          col("d_plus_scaled"), col("d_minus_scaled"),
          expr("CASE WHEN n * span = 0 THEN NULL ELSE " +
            s"CAST(${Sp.intDiv(
              s"${Sp.wide("greatest(d_plus_scaled, d_minus_scaled)")} * 1000000",
              "(n * span)")} AS BIGINT) END").as("ks_micro"))
    })

  /** Welch lanes: v_i = (Q_i − S_i²/n_i)/(n_i − 1) over the exact
    * per-group sums — ONE text interpolated into both engines.
    */
  private def welchVar(D: graft.functions.SqlDialect, i: Int): String =
    s"((${D.wideToDouble(s"q$i")} - (CAST(s$i AS DOUBLE) * " +
      s"CAST(s$i AS DOUBLE)) / CAST(n$i AS DOUBLE)) / (CAST(n$i AS DOUBLE) - 1))"

  /** Between-groups quadratic Σⱼ(ZⱼN−Znⱼ)²/(nⱼN²) as a shared
    * fixed-op-order float text over the pivoted lanes (columns n1..n5,
    * z1..z5 plus nt/zt totals). The signed difference stays in the
    * wide integer lane; only its absolute value surfaces to double.
    */
  private def bfA(P: graft.functions.SqlDialect): String =
    (1 to 5).map { j =>
      val num = P.wideToDouble(s"abs(${P.wide(s"z$j")} * nt - zt * n$j)")
      s"(($num * $num) / (CAST(n$j AS DOUBLE) * CAST(nt AS DOUBLE) * " +
        s"CAST(nt AS DOUBLE)))"
    }.mkString("(", " + ", ")")

  /** Within-groups quadratic Σⱼ(Qⱼ − Zⱼ²/nⱼ), same contract. */
  private def bfB(P: graft.functions.SqlDialect): String =
    (1 to 5).map { j =>
      s"(${P.wideToDouble(s"q$j")} - (CAST(z$j AS DOUBLE) * " +
        s"CAST(z$j AS DOUBLE)) / CAST(n$j AS DOUBLE))"
    }.mkString("(", " + ", ")")

  val oracles: Map[String, String] = Map(

    "q473_rbo" ->
      s"""WITH r95 AS (
         |  SELECT l_partkey AS pk,
         |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
         |      AS rev
         |  FROM lineitem WHERE year(l_shipdate) = 1995 GROUP BY 1),
         |t95 AS (
         |  SELECT pk, ROW_NUMBER() OVER (ORDER BY rev DESC, pk) AS ra
         |  FROM r95 QUALIFY ra <= 10),
         |r96 AS (
         |  SELECT l_partkey AS pk,
         |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
         |      AS rev
         |  FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1),
         |t96 AS (
         |  SELECT pk, ROW_NUMBER() OVER (ORDER BY rev DESC, pk) AS rb
         |  FROM r96 QUALIFY rb <= 10),
         |j AS (SELECT ra, rb FROM t95 JOIN t96 USING (pk)),
         |dx AS (
         |  SELECT d, COUNT(*) AS x_d
         |  FROM range(1, 11) t(d) JOIN j ON greatest(ra, rb) <= d
         |  GROUP BY d)
         |SELECT
         |  CAST(COALESCE(MAX(CASE WHEN d = 10 THEN x_d END), 0) AS BIGINT)
         |    AS x_at_10,
         |  CAST(COALESCE(SUM(($RboW) * x_d), 0) AS BIGINT) AS num,
         |  CAST(${Du.intDiv(
                 s"${Du.wide(s"COALESCE(SUM(($RboW) * x_d), 0)")} * 1000000",
                 RboDenom)} AS BIGINT) AS rbo_micro
         |FROM dx""".stripMargin,

    "q476_hoover" ->
      s"""WITH cust AS (
         |  SELECT o_custkey, SUM($CentsF) AS cents
         |  FROM orders GROUP BY 1),
         |tot AS (SELECT COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS st
         |  FROM cust),
         |dev AS (
         |  SELECT n, st,
         |    SUM(abs(${Du.wide("n")} * cents - ${Du.wide("st")})) AS sad
         |  FROM cust, tot GROUP BY 1, 2)
         |SELECT n, st AS total_cents,
         |  CAST(${Du.intDiv("sad", Du.wide("n"))} AS BIGINT)
         |    AS sum_absdev_cents,
         |  CASE WHEN st <= 0 THEN NULL ELSE
         |    CAST(${Du.intDiv("sad * 1000000", s"(${Du.wide("n")} * st * 2)")}
         |      AS BIGINT) END AS hoover_micro
         |FROM dev""".stripMargin,

    "q477_palma" ->
      s"""WITH cust AS (
         |  SELECT o_custkey AS ck, SUM($CentsF) AS cents
         |  FROM orders GROUP BY 1),
         |rk AS (
         |  SELECT cents,
         |    ROW_NUMBER() OVER (ORDER BY cents DESC, ck) AS rnk,
         |    COUNT(*) OVER () AS n_all
         |  FROM cust),
         |cut AS (
         |  SELECT n_all, n_all // 10 AS k10, (4 * n_all) // 10 AS k40,
         |    CAST(SUM(CASE WHEN rnk <= n_all // 10 THEN cents ELSE 0 END)
         |      AS BIGINT) AS s_top,
         |    CAST(SUM(CASE WHEN rnk > n_all - (4 * n_all) // 10
         |      THEN cents ELSE 0 END) AS BIGINT) AS s_bot
         |  FROM rk GROUP BY 1, 2, 3)
         |SELECT n_all, k10, k40, s_top AS top10_cents, s_bot AS bot40_cents,
         |  CASE WHEN k10 = 0 OR s_bot <= 0 THEN NULL ELSE
         |    CAST(${Du.intDiv(s"${Du.wide("s_top")} * 1000000", "s_bot")}
         |      AS BIGINT) END AS palma_micro
         |FROM cut""".stripMargin,

    "q478_jarque_bera" -> {
      val mean = s"(${Du.wideToDouble("s1")} / n)"
      val m2 = s"(${Du.wideToDouble("s2")} / n - $mean * $mean)"
      val m3 = s"(${Du.wideToDouble("s3")} / n - 3 * $mean * " +
        s"(${Du.wideToDouble("s2")} / n) + 2 * $mean * $mean * $mean)"
      val m4 = s"(${Du.wideToDouble("s4")} / n - 4 * $mean * " +
        s"(${Du.wideToDouble("s3")} / n) + " +
        s"6 * $mean * $mean * (${Du.wideToDouble("s2")} / n) - " +
        s"3 * $mean * $mean * $mean * $mean)"
      val jb = s"(CAST(n AS DOUBLE) * ((($m3 * $m3) / ($m2 * $m2 * $m2)) / 6 + " +
        s"(($m4 / ($m2 * $m2) - 3) * ($m4 / ($m2 * $m2) - 3)) / 24))"
      s"""WITH s AS (
         |  SELECT l_linestatus, COUNT(*) AS n,
         |    SUM(CAST(l_quantity AS DECIMAL(4,0))) AS s1,
         |    SUM(CAST(l_quantity AS DECIMAL(4,0)) *
         |        CAST(l_quantity AS DECIMAL(4,0))) AS s2,
         |    SUM(CAST(l_quantity AS DECIMAL(4,0)) *
         |        CAST(l_quantity AS DECIMAL(4,0)) *
         |        CAST(l_quantity AS DECIMAL(4,0))) AS s3,
         |    SUM(CAST(l_quantity AS DECIMAL(4,0)) *
         |        CAST(l_quantity AS DECIMAL(4,0)) *
         |        CAST(l_quantity AS DECIMAL(4,0)) *
         |        CAST(l_quantity AS DECIMAL(4,0))) AS s4
         |  FROM lineitem GROUP BY 1)
         |SELECT l_linestatus, n,
         |  CASE WHEN n < 2 OR $m2 <= 0 THEN NULL ELSE
         |  CAST(floor($jb * CAST(1000 AS DOUBLE)) AS BIGINT) END AS jb_milli
         |FROM s ORDER BY l_linestatus""".stripMargin
    },

    "q482_welch_t" -> {
      val v1 = welchVar(Du, 1)
      val v2 = welchVar(Du, 2)
      val se2 = s"($v1 / CAST(n1 AS DOUBLE) + $v2 / CAST(n2 AS DOUBLE))"
      val tTxt = s"((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) - " +
        s"CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / sqrt($se2))"
      val dfTxt = s"(($se2 * $se2) / " +
        s"((($v1 / CAST(n1 AS DOUBLE)) * ($v1 / CAST(n1 AS DOUBLE))) / " +
        s"(CAST(n1 AS DOUBLE) - 1) + " +
        s"((($v2 / CAST(n2 AS DOUBLE)) * ($v2 / CAST(n2 AS DOUBLE))) / " +
        s"(CAST(n2 AS DOUBLE) - 1))))"
      val dTxt = s"((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) - " +
        s"CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / " +
        s"sqrt(((CAST(n1 AS DOUBLE) - 1) * $v1 + " +
        s"(CAST(n2 AS DOUBLE) - 1) * $v2) / " +
        s"(CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2)))"
      val guard = s"n1 < 2 OR n2 < 2 OR ($v1) <= 0 OR ($v2) <= 0"
      s"""WITH g AS (
         |  SELECT CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 2 END
         |    AS grp,
         |    $CentsF AS cents
         |  FROM orders
         |  WHERE o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '5-%'),
         |l AS (
         |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(cents) AS BIGINT) AS sx,
         |    SUM(${Du.wide("cents")} * cents) AS qx
         |  FROM g GROUP BY 1),
         |p AS (
         |  SELECT
         |    MAX(CASE WHEN grp = 1 THEN n END) AS n1,
         |    MAX(CASE WHEN grp = 1 THEN sx END) AS s1,
         |    MAX(CASE WHEN grp = 1 THEN qx END) AS q1,
         |    MAX(CASE WHEN grp = 2 THEN n END) AS n2,
         |    MAX(CASE WHEN grp = 2 THEN sx END) AS s2,
         |    MAX(CASE WHEN grp = 2 THEN qx END) AS q2
         |  FROM l)
         |SELECT n1, n2,
         |  CAST(${Du.intDiv(s"${Du.wide("s1")} * 1000000", "n1")} AS BIGINT)
         |    AS mean1_microcents,
         |  CAST(${Du.intDiv(s"${Du.wide("s2")} * 1000000", "n2")} AS BIGINT)
         |    AS mean2_microcents,
         |  CASE WHEN $guard THEN NULL ELSE
         |    CAST(floor($tTxt * CAST(1000 AS DOUBLE)) AS BIGINT) END
         |    AS t_milli,
         |  CASE WHEN $guard THEN NULL ELSE
         |    CAST(floor($dfTxt * CAST(1000 AS DOUBLE)) AS BIGINT) END
         |    AS df_milli,
         |  CASE WHEN $guard THEN NULL ELSE
         |    CAST(floor($dTxt * CAST(1000000 AS DOUBLE)) AS BIGINT) END
         |    AS d_micro
         |FROM p""".stripMargin
    },

    "q483_topk_churn" ->
      """WITH rev AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day, l_partkey AS pk,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS rev
        |  FROM lineitem GROUP BY 1, 2),
        |tk AS (
        |  SELECT day, pk,
        |    ROW_NUMBER() OVER (PARTITION BY day ORDER BY rev DESC, pk) AS r
        |  FROM rev QUALIFY r <= 10),
        |sz AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n FROM tk GROUP BY 1),
        |sh AS (
        |  SELECT b.day AS day, CAST(COUNT(*) AS BIGINT) AS shared
        |  FROM tk a JOIN tk b ON a.day + INTERVAL 1 DAY = b.day
        |    AND a.pk = b.pk
        |  GROUP BY 1)
        |SELECT cur.day AS day, prev.n AS n_prev, cur.n AS n_cur,
        |  COALESCE(sh.shared, 0) AS shared,
        |  CASE WHEN prev.n + cur.n - COALESCE(sh.shared, 0) = 0 THEN NULL
        |    ELSE COALESCE(sh.shared, 0) * 1000 //
        |      (prev.n + cur.n - COALESCE(sh.shared, 0)) END AS jaccard_milli
        |FROM sz cur
        |JOIN sz prev ON prev.day + INTERVAL 1 DAY = cur.day
        |LEFT JOIN sh ON sh.day = cur.day
        |ORDER BY day""".stripMargin,

    "q486_ks_uniform" ->
      s"""WITH days AS (
         |  SELECT CAST(datediff('day', DATE '1990-01-01',
         |      CAST(o_orderdate AS DATE)) AS BIGINT) AS dd,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM orders GROUP BY 1),
         |cm AS (
         |  SELECT dd, c,
         |    SUM(c) OVER (ORDER BY dd
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM days),
         |tot AS (
         |  SELECT CAST(SUM(c) AS BIGINT) AS n, MIN(dd) AS lo, MAX(dd) AS hi
         |  FROM days),
         |sc AS (
         |  SELECT n, hi - lo + 1 AS span,
         |    cum * (hi - lo + 1) - n * (dd - lo + 1) AS dp,
         |    n * (dd - lo + 1) - (cum - c) * (hi - lo + 1) AS dm
         |  FROM cm, tot)
         |SELECT n, span,
         |  CAST(MAX(dp) AS BIGINT) AS d_plus_scaled,
         |  CAST(MAX(dm) AS BIGINT) AS d_minus_scaled,
         |  CASE WHEN n * span = 0 THEN NULL ELSE
         |    CAST(${Du.intDiv(
                s"${Du.wide("greatest(MAX(dp), MAX(dm))")} * 1000000",
                "(n * span)")} AS BIGINT) END AS ks_micro
         |FROM sc GROUP BY 1, 2""".stripMargin,

    "q484_seasonal_naive" ->
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS nd
        |  FROM orders GROUP BY 1),
        |e AS (
        |  SELECT abs(cur.nd - prev.nd) * 1000000 // cur.nd AS ape
        |  FROM d cur JOIN d prev ON prev.day + INTERVAL 7 DAY = cur.day)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_days_scored,
        |  CAST(SUM(ape) // COUNT(*) AS BIGINT) AS mape_micro,
        |  CAST(MAX(ape) AS BIGINT) AS worst_ape_micro
        |FROM e""".stripMargin,

    "q480_levene_bf" ->
      s"""WITH pr AS (
         |  SELECT o_orderpriority AS p, $CentsF AS x, o_orderkey
         |  FROM orders),
         |rk AS (
         |  SELECT p, x,
         |    ROW_NUMBER() OVER (PARTITION BY p ORDER BY x, o_orderkey) AS r,
         |    COUNT(*) OVER (PARTITION BY p) AS nj
         |  FROM pr),
         |med AS (SELECT p, x AS med FROM rk WHERE r = (nj + 1) // 2),
         |zz AS (
         |  SELECT pr.p, abs(pr.x - med.med) AS z
         |  FROM pr JOIN med ON pr.p = med.p),
         |lanes AS (
         |  SELECT p, CAST(COUNT(*) AS BIGINT) AS nj,
         |    CAST(SUM(z) AS BIGINT) AS zj,
         |    SUM(${Du.wide("z")} * z) AS qj
         |  FROM zz GROUP BY 1),
         |piv AS (
         |  SELECT
         |${(1 to 5).map(i =>
             s"    MAX(CASE WHEN p LIKE '$i-%' THEN nj END) AS n$i,\n" +
             s"    MAX(CASE WHEN p LIKE '$i-%' THEN zj END) AS z$i,\n" +
             s"    MAX(CASE WHEN p LIKE '$i-%' THEN qj END) AS q$i")
             .mkString(",\n")}
         |  FROM lanes),
         |tot AS (
         |  SELECT *, n1 + n2 + n3 + n4 + n5 AS nt,
         |    ${Du.wide("z1")} + z2 + z3 + z4 + z5 AS zt
         |  FROM piv)
         |SELECT CAST(nt AS BIGINT) AS n_total,
         |  CAST(zt AS BIGINT) AS sum_absdev_cents,
         |  CASE WHEN nt <= 5 OR (${bfB(Du)}) <= 0 THEN NULL ELSE
         |    CAST(floor(((CAST(nt AS DOUBLE) - 5) / 4) * (${bfA(Du)}) /
         |    (${bfB(Du)}) * CAST(1000000 AS DOUBLE)) AS BIGINT) END
         |    AS w_micro
         |FROM tot""".stripMargin,

    "q471_delta_minmax" ->
      """WITH upd AS (
        |  SELECT CAST(l_partkey % 500 AS BIGINT) AS g,
        |    CASE WHEN l_orderkey % 7 = 0 THEN NULL
        |      ELSE CAST(l_quantity AS BIGINT) END AS v
        |  FROM lineitem
        |  WHERE (l_shipdate < TIMESTAMP '1997-01-01' AND l_orderkey % 13 <> 0)
        |     OR (l_shipdate >= TIMESTAMP '1997-01-01' AND l_orderkey % 3 = 0))
        |SELECT g, COUNT(*) AS n_rows, COUNT(v) AS n_vals,
        |  MIN(v) AS min_v, MAX(v) AS max_v
        |FROM upd GROUP BY g ORDER BY g""".stripMargin)
}
