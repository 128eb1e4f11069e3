package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.PortableSql
import graft.plans.GlobalOrder

/** Round-7 analytics inventory: inequality/concentration measures,
  * probabilistic-forecast evaluation, exact-dyadic smoothing,
  * resampling without randomness, higher moments, and Katz
  * centrality. Same determinism contract as [[Analytics]]–
  * [[Analytics4]]: integer lanes end-to-end, ANSI zero-denominator
  * guards mirrored on both engines, sign split before any integer
  * division whose numerator can be negative, floats only through
  * shared fixed-op-order texts over exact sums.
  *
  * Reference behavior: pydala2 exposes none of these — they extend
  * the training-data-pipeline stack (SURVEY.md "beyond the
  * reference").
  */
object Analytics5 {

  private val Du = PortableSql.Duck
  private val Sp = PortableSql.Spark

  /** The exact cents lane (the Analytics2–4 CentsF convention). */
  private val CentsF =
    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

  /** Daily orders rollup shared by the smoothing/resampling queries:
    * calendar-bounded (~2.4k rows at ANY data scale — the heavy
    * lifting is the map-side orders→day combine).
    */
  private def dayFrame(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(count(lit(1)).as("nd"), sum(expr(CentsF)).as("sd"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Lorenz curve + exact Gini over per-customer revenue: customers
    // ranked ascending by (cents, custkey) through GlobalOrder (NEVER
    // a single-partition window — the customer frame is row-scale),
    // rank and cumulative revenue in ONE running-sums pass, deciles by
    // integer rank split, Gini from the rank-weighted sum identity
    // G = (2·Σrank·x − (n+1)·Σx) / (n·Σx) — numerator non-negative
    // under ascending order, so the wide integer division needs no
    // sign split. The concentration profile every training-data
    // budget allocation starts from.
    "q449_lorenz_gini" -> { (s, d) =>
      val cust = Tables.orders(s, d)
        .groupBy("o_custkey").agg(sum(expr(CentsF)).as("cents"))
      val ranked = GlobalOrder.withRunningSums(
        cust, Seq(col("cents"), col("o_custkey")), col("cents"),
        Seq(lit(1L).as("one") -> "rk", col("cents") -> "cum"))
      val tot = ranked.agg(
        max("rk").cast("long").as("n"),
        sum("cents").as("s"),
        sum(expr(s"${Sp.wide("rk")} * cents")).as("a_w"))
      val gini = tot.select(
        col("n"), col("s"),
        expr("CASE WHEN n = 0 OR s = 0 THEN NULL ELSE " +
          s"CAST(${Sp.intDiv(
            s"(2 * ${Sp.wide("a_w")} - (CAST(n AS DECIMAL(38,0)) + 1) * s) * 1000000",
            s"(CAST(n AS DECIMAL(38,0)) * s)")} AS BIGINT) END").as("gini_micro"))
      ranked
        .crossJoin(broadcast(gini))
        .withColumn("decile", expr("CAST(((rk - 1) * 10) div n AS BIGINT)"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_cust"),
          sum("cents").as("cents_d"),
          max("cum").as("cum_cents"),
          max("s").as("s_tot"), max("gini_micro").as("g_mic"))
        .withColumn("share_milli",
          expr("CASE WHEN s_tot = 0 THEN NULL " +
            "ELSE cum_cents * 1000 div s_tot END"))
        .select(col("decile"), col("n_cust"), col("cents_d"),
          col("cum_cents"), col("share_milli"),
          col("g_mic").as("gini_micro"))
        .orderBy("decile")
    },

    // Brier-score decomposition (Murphy): forecast = per-priority
    // P(status F) learned on the pre-1995 TRAIN split quantized to
    // milli, evaluated on the 1995+ TEST split. brier = reliability −
    // resolution + uncertainty over the 5 priority bins; every lane
    // is an exact integer on the milli grid (quantization makes the
    // identity hold only to the grid — stated, not hidden). The
    // calibration companion to the ECE/lift gates.
    "q450_brier_decomposition" -> { (s, d) =>
      val o = Tables.orders(s, d)
        .select(col("o_orderpriority").as("g"),
          expr("CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END").as("y"),
          expr("CASE WHEN o_orderdate < TIMESTAMP '1995-01-01' " +
            "THEN 1 ELSE 0 END").as("is_train"))
      val grp = o.groupBy("g").agg(
        sum(expr("is_train")).as("n_tr"),
        sum(expr("is_train * y")).as("pos_tr"),
        sum(expr("1 - is_train")).as("n_te"),
        sum(expr("(1 - is_train) * y")).as("pos_te"))
        .filter(col("n_tr") > 0 && col("n_te") > 0)
        .withColumn("p_milli", expr("pos_tr * 1000 div n_tr"))
        .withColumn("o_milli", expr("pos_te * 1000 div n_te"))
      grp.agg(
          sum("n_te").as("n_test"), sum("pos_te").as("pos_test"),
          sum(expr("pos_te * (1000 - p_milli) * (1000 - p_milli) + " +
            "(n_te - pos_te) * p_milli * p_milli")).as("brier_s"),
          sum(expr("n_te * (p_milli - o_milli) * (p_milli - o_milli)"))
            .as("rel_s"),
          sum(expr("n_te * o_milli * o_milli")).as("so2"))
        .withColumn("obar_milli", expr("pos_test * 1000 div n_test"))
        .select(col("n_test"), col("obar_milli"),
          expr("brier_s div n_test").as("brier_micro"),
          expr("rel_s div n_test").as("rel_micro"),
          // resolution = Σn(o_g−ō)²/n = Σn·o_g²/n − ō² on the grid
          expr("(so2 div n_test) - obar_milli * obar_milli")
            .as("res_micro"),
          expr("obar_milli * (1000 - obar_milli)").as("unc_micro"))
    },

    // EWMA with EXACT dyadic weights: α = 1/2 truncated at 20 lags,
    // so weight(gap) = 2^(19−gap) on the 2^20 scale and every lane is
    // an exact integer — no float recurrence, no libm. The window
    // rides a BROADCAST bounded non-equi self-join of the calendar
    // day frame (the q353 discipline: bounded frames broadcast, never
    // Cartesian); gaps in the calendar contribute nothing on either
    // engine because the weight indexes CALENDAR distance. Truncation
    // bias < 2^-20 of the peak — beneath the milli output grid.
    "q451_ewma_dyadic" -> { (s, d) =>
      val day = dayFrame(s, d).select(col("day"), col("nd").as("y"))
      val hist = day.select(col("day").as("d2"), col("y").as("y2"))
      day.join(broadcast(hist),
          expr("datediff(day, d2) BETWEEN 0 AND 19"))
        .withColumn("w", expr(
          "CAST(power(CAST(2 AS DOUBLE), CAST(19 - datediff(day, d2) " +
            "AS DOUBLE)) AS BIGINT)"))
        .groupBy("day")
        .agg(max(expr("CASE WHEN d2 = day THEN y END")).as("y"),
          count(lit(1)).as("n_lags"),
          sum(expr("y2 * w")).as("ewma_s"))
        .withColumn("ewma_milli", expr("ewma_s * 1000 div 1048576"))
        .select("day", "y", "n_lags", "ewma_s", "ewma_milli")
        .orderBy("day")
    },

    // Jackknife for the ratio estimator (average order value =
    // Σcents/Σorders) with DAYS as the resampling unit — the exact,
    // randomness-free resampling: every leave-one-day-out replicate
    // is a closed form over the totals, so the whole jackknife is one
    // day rollup + one pass over ~2.4k replicates. Replicates are
    // quantized to micro before the variance lane (stated grid);
    // var_micro2 = (n−1)·(n·ΣR² − (ΣR)²) / n² in wide integers.
    "q452_jackknife_ratio" -> { (s, d) =>
      val day = dayFrame(s, d)
      val tot = day.agg(count(lit(1)).as("n_days"),
        sum("nd").as("n_all"), sum("sd").as("s_all"))
      val reps = day.crossJoin(broadcast(tot))
        .filter(expr("n_all > nd"))
        .withColumn("r_i", expr(Sp.intDiv(
          s"${Sp.wide("(s_all - sd)")} * 1000000", "(n_all - nd)")))
      reps.agg(
          count(lit(1)).as("n"),
          max(expr(s"${Sp.intDiv(s"${Sp.wide("s_all")} * 1000000", "n_all")}"))
            .as("r_w"),
          sum(expr(Sp.wide("r_i"))).as("sr_w"),
          sum(expr(s"${Sp.wide("r_i")} * r_i")).as("sr2_w"))
        .select(
          col("n").as("n_days"),
          expr(s"CAST(r_w AS BIGINT)").as("r_micro"),
          expr(s"CAST(${Sp.intDiv("sr_w", "n")} AS BIGINT)")
            .as("jk_mean_micro"),
          // variance in micro² overflows BIGINT (and its integer
          // quotient overflows the LONG that IntegralDivide returns)
          // — surface the standard error as sqrt(wide numerator)/n in
          // ONE shared float text: the numerator is non-negative by
          // Cauchy–Schwarz (wideToDouble precondition), sqrt and the
          // single divide are correctly rounded on both engines
          expr("CAST(floor(sqrt(" + Sp.wideToDouble(
            s"((CAST(n AS DECIMAL(38,0)) - 1) * " +
              s"(CAST(n AS DECIMAL(38,0)) * sr2_w - sr_w * sr_w))") +
            ") / CAST(n AS DOUBLE)) AS BIGINT)")
            .as("jk_se_micro"))
    },

    // Excess kurtosis per return flag from exact decimal power sums
    // s1..s4 (the q58 moment discipline extended one order): one
    // map-side-combined shuffle, then the double math happens once
    // per group on the exact sums through ONE shared fixed-op-order
    // text — g2 = m4/m2² − 3 with central moments expanded about the
    // raw sums. l_quantity's DECIMAL(4,0) lane keeps s4 ≤ 50⁴·n,
    // exact far past 100 TB.
    "q453_kurtosis" -> { (s, d) =>
      val QDec = "CAST(l_quantity AS DECIMAL(4,0))"
      // s-lanes surface through wideToDouble (the module convention):
      // a bare DECIMAL→DOUBLE cast above 2⁶² is not engine-identical,
      // and s4 ≤ 50⁴·n crosses 2⁶² around 7·10¹¹ rows per group
      val mean = s"(${Sp.wideToDouble("s1")} / n)"
      val m2 = s"(${Sp.wideToDouble("s2")} / n - $mean * $mean)"
      val m4 = s"(${Sp.wideToDouble("s4")} / n - 4 * $mean * (${Sp.wideToDouble("s3")} / n) + " +
        s"6 * $mean * $mean * (${Sp.wideToDouble("s2")} / n) - " +
        s"3 * $mean * $mean * $mean * $mean)"
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(expr(QDec)).as("s1"),
          sum(expr(s"$QDec * $QDec")).as("s2"),
          sum(expr(s"$QDec * $QDec * $QDec")).as("s3"),
          sum(expr(s"$QDec * $QDec * $QDec * $QDec")).as("s4"))
        .selectExpr("l_returnflag", "n",
          s"CASE WHEN n < 2 OR $m2 <= 0 THEN NULL ELSE " +
            s"CAST(floor(($m4 / ($m2 * $m2) - 3) * CAST(1000000 AS DOUBLE)) " +
            "AS BIGINT) END AS kurt_micro")
        .orderBy("l_returnflag")
    },

    // Incremental aggregate maintenance gate: the per-status revenue
    // rollup is maintained by DeltaAgg.merge under a mixed change set
    // (1997+ orders arrive as inserts; every 13th pre-1997 order is
    // retracted) WITHOUT rescanning the base — the oracle recomputes
    // the same rollup directly over the updated row set, so the gate
    // pins the z-set identity state ⊕ Δ ≡ recompute, zero-crossing
    // groups included. Cost shape: one aggregate over the change set
    // + one state-sized join; never O(base).
    "q457_delta_agg" -> { (s, d) =>
      val o = Tables.orders(s, d)
        .select(col("o_orderstatus").as("status"), expr(CentsF).as("cents"),
          col("o_orderdate"), col("o_orderkey"))
      val base = o.filter(expr("o_orderdate < TIMESTAMP '1997-01-01'"))
      val ins = o.filter(expr("o_orderdate >= TIMESTAMP '1997-01-01'"))
        .withColumn("op", lit(1))
      val dels = base.filter(expr("o_orderkey % 13 = 0"))
        .withColumn("op", lit(-1))
      val state = graft.operators.DeltaAgg.fromBase(
        base, Seq("status"), "cents")
      graft.operators.DeltaAgg.merge(
          state, ins.unionByName(dels), Seq("status"), "cents", "op")
        .orderBy("status")
    },

    // Count-min sketch, portable: a d=4 × w=64 counter matrix from
    // the shared md5-lane hash (both engines build the IDENTICAL
    // matrix — the sketch is an aggregation, so it shuffles d·w cells
    // regardless of key-space size), probed for ten keys against
    // their exact counts. The overcount column pins the CMS guarantee
    // est ≥ exact row by row; the matrix itself is mergeable by cell
    // addition (partial aggregation IS the merge).
    "q458_countmin" -> { (s, d) =>
      val keys = Tables.events(s, d)
        .select(col("user_id").cast("long").as("k")).na.drop()
      val bExpr = (src: String) =>
        s"${Sp.hash64(s"concat('cms', CAST(j AS STRING), ':', CAST($src AS STRING))")} % 64"
      val cells = keys
        .select(col("k"), explode(expr("sequence(0, 3)")).as("j"))
        .withColumn("b", expr(bExpr("k")))
        .groupBy("j", "b").agg(count(lit(1)).as("c"))
      keys.groupBy("k").agg(count(lit(1)).as("n_exact"))
        .filter(col("k") <= 10)
        .select(col("k"), col("n_exact"),
          explode(expr("sequence(0, 3)")).as("j"))
        .withColumn("b", expr(bExpr("k")))
        .join(cells, Seq("j", "b"))
        .groupBy("k", "n_exact").agg(min("c").as("n_est"))
        .withColumn("overcount", col("n_est") - col("n_exact"))
        .select(col("k").as("user_id"), col("n_exact"), col("n_est"),
          col("overcount"))
        .orderBy("user_id")
    },

    // SQL-surface gate: GROUPING() under ROLLUP (the q445/q446
    // discipline) — subtotal rows are distinguishable from genuine
    // NULL groups only through GROUPING flags, and both engines agree
    // on flag values and subtotal NULL placement.
    "q459_grouping_flags" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("q459_orders")
      s.sql(
        """SELECT o_orderstatus AS status, o_orderpriority AS priority,
          |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_s,
          |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_p,
          |  COUNT(*) AS n,
          |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
          |    AS BIGINT)) AS BIGINT) AS cents
          |FROM q459_orders
          |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
          |ORDER BY g_s, g_p, status NULLS FIRST, priority NULLS FIRST"""
          .stripMargin)
    },

    // SQL-surface gate: regexp_extract group capture — shared name,
    // shared no-match convention (empty string, not NULL) on both
    // engines; the pattern stays in the RE2∩Java-regex common subset.
    "q460_regexp_extract" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("q460_orders")
      s.sql(
        """SELECT regexp_extract(o_orderpriority, '([0-9]+)', 1)
          |    AS prio_digit,
          |  regexp_extract(o_orderstatus, '([0-9]+)', 1) AS status_digit,
          |  COUNT(*) AS n
          |FROM q460_orders
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    },

    // SQL-surface gate: bitwise aggregates (bit_and / bit_or /
    // bit_xor) over the event-id lanes per type — both engines name
    // and define them identically; xor doubles as a cheap
    // order-insensitive checksum at scale.
    "q461_bit_aggs" -> { (s, d) =>
      Tables.events(s, d).createOrReplaceTempView("q461_events")
      s.sql(
        """SELECT event_type,
          |  CAST(bit_and(event_id) AS BIGINT) AS all_and,
          |  CAST(bit_or(event_id) AS BIGINT) AS all_or,
          |  CAST(bit_xor(event_id) AS BIGINT) AS all_xor,
          |  COUNT(*) AS n
          |FROM q461_events
          |GROUP BY 1 ORDER BY 1""".stripMargin)
    },

    // SQL-surface gate: TRY_CAST — NULL (never error) on malformed
    // input AND on numeric overflow, identically on both engines;
    // the overflow lane exercises double→BIGINT far past 2⁶³ on a
    // 0.1% row subset — TryCast pays a caught exception per failing
    // row, so an every-row-overflow lane would cost seconds at sf0.1
    // (measured) and minutes at scale.
    "q462_try_cast" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("q462_orders")
      s.sql(
        """SELECT o_orderpriority AS priority,
          |  COUNT(TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER))
          |    AS n_digit_ok,
          |  CAST(SUM(TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER))
          |    AS BIGINT) AS digit_sum,
          |  COUNT(TRY_CAST(o_orderstatus AS INTEGER)) AS n_status_ok,
          |  COUNT(TRY_CAST(o_totalprice * CASE WHEN o_orderkey % 1000 = 0
          |    THEN 1e15 ELSE 1.0 END AS BIGINT)) AS n_overflow_ok,
          |  COUNT(*) AS n
          |FROM q462_orders
          |GROUP BY 1 ORDER BY 1""".stripMargin)
    },

    // Feature co-activation (Gram) matrix of the embedding corpus on
    // the q196 quantization grid: G[i,j] = Σ_vec q_i·q_j for i ≤ j —
    // the PCA/whitening substrate as ONE map-side-combinable
    // aggregation. The i≤j cell expansion is ARRAY-LOCAL (nested
    // transform over the quantized array inside each row — the q467
    // payload-local pattern), so nothing is exchanged before the
    // partial aggregate: the round-7 formulation self-joined the
    // exploded (vec_id, i, qi) frame on vec_id, paying a hash
    // exchange of n·d rows for an expansion the row already owns.
    // The per-vector expand emits d(d+1)/2 = 2080 cells but the
    // combiner collapses them to 2080 running sums per partition, so
    // the only shuffle is O(partitions·d²) regardless of corpus size
    // (pinned in PlanShapeSpec: no exchange below the partial
    // aggregate).
    "q463_embed_gram" -> { (s, d) =>
      // The i≤j cell list is DATA-INDEPENDENT (d·(d+1)/2 = 2080 index
      // pairs), so it broadcasts as a tiny table and each row's cells
      // come from codegen'd element_at probes — measured 3× faster at
      // sf0.1 than the first array-local form (nested lambda
      // transforms fall out of whole-stage codegen and pay a slice
      // allocation per index). The j < size guard keeps short vectors
      // exact (a cell exists only where both positions do, matching
      // the round-7 posexplode semantics).
      val cells = s.range(0, 64L * 64)
        .select(expr("id div 64").as("i"), expr("id % 64").as("j"))
        .filter(col("i") <= col("j"))
      Tables.embeddings(s, d)
        .withColumn("q", expr(
          "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 32768.0) AS BIGINT))"))
        // fail LOUDLY if the corpus ever outgrows the 64-dim cell
        // table — the j < size(q) guard below would otherwise
        // silently compute only the top-left 64×64 block (CASE takes
        // the throwing branch only when actually oversize)
        .filter(expr("CASE WHEN size(q) <= 64 THEN true " +
          "ELSE assert_true(false, 'q463: embedding dim exceeds the 64-dim cell table') IS NULL END"))
        .join(broadcast(cells), expr("j < size(q)"))
        .select(col("i"), col("j"),
          expr("element_at(q, CAST(i AS INT) + 1) * " +
            "element_at(q, CAST(j AS INT) + 1)").as("p"))
        .groupBy("i", "j")
        .agg(sum(col("p")).as("g"), count(lit(1)).as("n_vec"))
        .orderBy("i", "j")
    },

    // Poisson overdispersion (index-of-dispersion) test on daily
    // order counts: D = s²/x̄ with z = (D−1)·√((n−1)/2) — regime
    // volatility makes counts overdispersed even when the mean trend
    // is flat. Numerator n·Σx²−S²−(n−1)·S is an exact integer
    // (sign-split: underdispersion is real), the single float tail is
    // one shared text over the wide lanes.
    "q464_dispersion" -> { (s, d) =>
      val zText = (nm: String) =>
        s"CAST(floor(${Sp.wideToDouble(nm)} / " +
          s"${Sp.wideToDouble("(CAST(nd AS DECIMAL(38,0)) - 1) * s1")} * " +
          "sqrt(CAST(nd - 1 AS DOUBLE) / CAST(2 AS DOUBLE)) * " +
          "CAST(1000000 AS DOUBLE)) AS BIGINT)"
      dayFrame(s, d).select(col("nd").as("x"))
        .agg(count(lit(1)).as("nd"), sum("x").as("s1"),
          sum(expr("x * x")).as("s2"))
        .withColumn("num_w", expr(
          s"${Sp.wide("nd")} * s2 - ${Sp.wide("s1")} * s1 - " +
            s"(${Sp.wide("nd")} - 1) * s1"))
        .withColumn("z_micro", expr(
          "CASE WHEN nd < 2 OR s1 <= 0 THEN NULL " +
            s"WHEN num_w >= 0 THEN ${zText("num_w")} " +
            s"ELSE -${zText("(-num_w)")} END"))
        .select(col("nd").as("n_days"), col("s1").as("n_orders"),
          col("z_micro"),
          expr("CASE WHEN z_micro IS NULL THEN NULL " +
            "ELSE z_micro > 1644854 END").as("overdispersed_95"))
    },

    // Spearman footrule distance between the 1995 and 1996 part
    // revenue rankings: ranks are assigned WITHIN the set of parts
    // present in both years (rank first and intersect after would
    // make the two rankings permutations of different index sets, the
    // normalization bound false, and agree_milli silently negative
    // under asymmetric year coverage), so both are permutations of
    // 1..m and Σ|rank₉₅ − rank₉₆| ≤ ⌊m²/2⌋ holds exactly. Ranks ride
    // GlobalOrder over the common frame (parts are row-scale — never
    // a single-partition window); ties broken by part key so both
    // engines rank identically. The rank-agreement companion to the
    // Kendall τ gates.
    "q465_footrule" -> { (s, d) =>
      def yearCents(yr: Int, name: String): DataFrame =
        Tables.lineitem(s, d)
          .filter(expr(s"year(l_shipdate) = $yr"))
          .groupBy("l_partkey")
          .agg(sum(expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .as(name))
      val common = yearCents(1995, "ca").join(yearCents(1996, "cb"),
        "l_partkey")
      val ra = GlobalOrder.withRunningSum(common,
        Seq(col("ca"), col("l_partkey")), col("ca"),
        lit(1L).as("one"), "rk_a")
      val rb = GlobalOrder.withRunningSum(
        ra.select("l_partkey", "cb", "rk_a"),
        Seq(col("cb"), col("l_partkey")), col("cb"),
        lit(1L).as("one"), "rk_b")
      rb.agg(count(lit(1)).as("m"),
          sum(expr("abs(rk_a - rk_b)")).as("footrule"))
        .withColumn("max_fr", expr("m * m div 2"))
        .withColumn("agree_milli", expr(
          "CASE WHEN max_fr = 0 THEN NULL " +
            "ELSE (max_fr - footrule) * 1000 div max_fr END"))
        .select("m", "footrule", "max_fr", "agree_milli")
    },

    // CUPED variance reduction (the standard A/B pre-period
    // adjustment): per-user pre-period event count as covariate x,
    // post-period value sum as metric y, arms by user-id parity.
    // θ = cov(x,y)/var(x) from POOLED exact moment lanes; each arm's
    // adjusted mean ȳ_a − θ(x̄_a − x̄) is ONE fixed-op-order float
    // text over the integer sums (covariance sign-split through the
    // non-negative wide-to-double lane; var(x) ≥ 0 needs none).
    "q466_cuped" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val u = ev.groupBy(col("user_id").cast("long").as("uid")).agg(
        sum(expr("CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END"))
          .as("x"),
        coalesce(sum(expr(
          "CASE WHEN ts >= TIMESTAMP '2024-01-16' " +
            s"THEN ${Analytics2.VMilliF} ELSE 0 END")), lit(0L)).as("y"))
        .withColumn("arm", expr("uid % 2"))
      val pooled = u.agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * x")).as("sxx"),
        sum(expr(s"${Sp.wide("x")} * y")).as("sxy_w"))
      val thetaD = // θ as a double subexpression (sign-split cov)
        s"((CASE WHEN ${Sp.wide("n")} * sxy_w - ${Sp.wide("sx")} * sy >= 0 " +
          s"THEN ${Sp.wideToDouble(s"(${Sp.wide("n")} * sxy_w - ${Sp.wide("sx")} * sy)")} " +
          s"ELSE -${Sp.wideToDouble(s"(${Sp.wide("sx")} * sy - ${Sp.wide("n")} * sxy_w)")} END) / " +
          s"${Sp.wideToDouble(s"(${Sp.wide("n")} * sxx - ${Sp.wide("sx")} * sx)")})"
      u.groupBy("arm").agg(count(lit(1)).as("n_a"),
          sum("x").as("sx_a"), sum("y").as("sy_a"))
        .crossJoin(broadcast(pooled))
        .withColumn("ybar_micro", expr(
          s"CAST(${Sp.intDiv(s"${Sp.wide("sy_a")} * 1000000", "n_a")} AS BIGINT)"))
        .withColumn("adj_micro", expr(
          s"CASE WHEN n_a = 0 OR ${Sp.wide("n")} * sxx - ${Sp.wide("sx")} * sx <= 0 " +
            "THEN NULL ELSE " +
            "CAST(floor((CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) - " +
            s"$thetaD * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) - " +
            "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) * " +
            "CAST(1000000 AS DOUBLE)) AS BIGINT) END"))
        .select(col("arm").cast("long").as("arm"), col("n_a"),
          col("sx_a"), col("sy_a"), col("ybar_micro"), col("adj_micro"))
        .orderBy("arm")
    },

    // Native session_window() BATCH aggregation (the SQL-function
    // face of the q185 streaming session gate): Spark's built-in
    // session assembly vs the oracle's gaps-and-islands spelling —
    // same 6-hour end-exclusive gap rule, one hash exchange on
    // user_id either way.
    "q468_session_window" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"),
          session_window(col("ts"), "6 hours").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          sum(expr(Analytics2.VMilliF)).as("vmilli_sum"))
        .select(col("user_id"), col("sw.start").as("win_start"),
          col("n_events"),
          expr("CAST(vmilli_sum AS BIGINT)").as("vmilli_sum"))
        .orderBy("user_id", "win_start")
    },

    // Winsorized + trimmed mean of order value at 5% (t = ⌊n/20⌋
    // replaced/dropped per tail): the robust-location companion to
    // the Hodges–Lehmann and MAD gates. Ranks ride GlobalOrder
    // (orders are row-scale); the two clamp bounds x₍t₊₁₎ and
    // x₍n₋t₎ are picked by rank equality and broadcast back for the
    // single clamp-and-sum pass — two passes total, no sort-merge of
    // the full frame anywhere.
    "q469_winsorized_mean" -> { (s, d) =>
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), expr(CentsF).as("cents"))
      val ranked = GlobalOrder.withRunningSum(o,
        Seq(col("cents"), col("k")), col("cents"), lit(1L).as("one"), "rk")
      val n = ranked.agg(max("rk").cast("long").as("n"))
      val bounds = ranked.crossJoin(broadcast(n))
        .withColumn("t", expr("n div 20"))
        .filter(expr("rk = t + 1 OR rk = n - t"))
        .groupBy("n", "t")
        .agg(min(expr("CASE WHEN rk = t + 1 THEN cents END")).as("v_lo"),
          max(expr("CASE WHEN rk = n - t THEN cents END")).as("v_hi"))
      ranked.crossJoin(broadcast(bounds))
        .agg(max("n").as("n"), max("t").as("t"),
          max("v_lo").as("v_lo"), max("v_hi").as("v_hi"),
          sum(expr("CASE WHEN rk <= t THEN v_lo " +
            "WHEN rk > n - t THEN v_hi ELSE cents END")).as("wins_sum"),
          sum(expr("CASE WHEN rk > t AND rk <= n - t THEN cents END"))
            .as("trim_sum"))
        .select(col("n"), col("t"), col("v_lo"), col("v_hi"),
          expr(s"CAST(${Sp.intDiv(s"${Sp.wide("wins_sum")} * 1000000",
            "n")} AS BIGINT)").as("wins_mean_micro"),
          expr("CASE WHEN n - 2 * t <= 0 THEN NULL ELSE " +
            s"CAST(${Sp.intDiv(s"${Sp.wide("trim_sum")} * 1000000",
              "(n - 2 * t)")} AS BIGINT) END").as("trim_mean_micro"))
    },

    // Katz centrality on the undirected part↔supplier supply graph:
    // 3 rounds of the path-counting recurrence c ← Σ_in (10⁶ + c) div
    // 16 (attenuation α = 1/16 as an exact integer division — both
    // engines truncate identically on the non-negative lane), so
    // c counts α-discounted walks of length ≤ 3 in ppm. Same
    // join+agg-per-round shape as PageRank (q113) — each round is one
    // shuffle on the edge key; the oracle unrolls the identical three
    // rounds. HONEST CEILINGS: (1) the supplier node offset 10⁷
    // (the q113 convention) collides with partkey above SF ≈ 50
    // (TPC-H partkey range is 200 000·SF) — beyond that the offset
    // must grow with the key range; (2) c grows like (deg/16)³·10⁶ —
    // BIGINT holds to in-degrees ~10⁵ per node; denser graphs need a
    // larger attenuation denominator or the DECIMAL(38,0) lane.
    // Ceiling (1) binds first.
    "q454_katz_centrality" -> { (s, d) =>
      val f = Tables.lineitem(s, d)
        .select(col("l_partkey").as("src"),
          (col("l_suppkey") + 10000000L).as("dst")).distinct()
      val e = f.union(f.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      val nodes = e.select(col("src").as("node")).distinct()
      var c = nodes.withColumn("c", lit(0L))
      for (_ <- 1 to 3) {
        val flow = e.join(c.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(expr("(1000000 + c) div 16")).as("fl"))
        c = nodes.join(flow, Seq("node"), "left")
          .withColumn("c", coalesce(col("fl"), lit(0L)))
          .select("node", "c")
          .localCheckpoint(eager = false)
      }
      c.select(col("node"), col("c").as("katz_ppm")).orderBy("node")
    })

  val oracles: Map[String, String] = Map(

    "q449_lorenz_gini" ->
      s"""WITH cust AS (
         |  SELECT o_custkey, CAST(SUM($CentsF) AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |rk AS (
         |  SELECT cents,
         |    ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS rk,
         |    CAST(SUM(cents) OVER (ORDER BY cents, o_custkey
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum
         |  FROM cust),
         |tot AS (
         |  SELECT CAST(MAX(rk) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s,
         |    CAST(SUM(CAST(rk AS HUGEINT) * cents) AS HUGEINT) AS a_w
         |  FROM rk),
         |g AS (
         |  SELECT n, s, CASE WHEN n = 0 OR s = 0 THEN NULL ELSE
         |    CAST(((2 * a_w - (CAST(n AS HUGEINT) + 1) * s) * 1000000) //
         |      (CAST(n AS HUGEINT) * s) AS BIGINT) END AS gini_micro
         |  FROM tot)
         |SELECT CAST(((rk - 1) * 10) // n AS BIGINT) AS decile,
         |  COUNT(*) AS n_cust,
         |  CAST(SUM(cents) AS BIGINT) AS cents_d,
         |  CAST(MAX(cum) AS BIGINT) AS cum_cents,
         |  CASE WHEN MAX(s) = 0 THEN NULL
         |    ELSE CAST(MAX(cum) * 1000 // MAX(s) AS BIGINT) END AS share_milli,
         |  MAX(gini_micro) AS gini_micro
         |FROM rk CROSS JOIN g
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q450_brier_decomposition" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS g,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
        |    CASE WHEN o_orderdate < TIMESTAMP '1995-01-01'
        |      THEN 1 ELSE 0 END AS is_train
        |  FROM orders),
        |grp AS (
        |  SELECT g, CAST(SUM(is_train) AS BIGINT) AS n_tr,
        |    CAST(SUM(is_train * y) AS BIGINT) AS pos_tr,
        |    CAST(SUM(1 - is_train) AS BIGINT) AS n_te,
        |    CAST(SUM((1 - is_train) * y) AS BIGINT) AS pos_te
        |  FROM o GROUP BY 1),
        |q AS (
        |  SELECT *, pos_tr * 1000 // n_tr AS p_milli,
        |    pos_te * 1000 // n_te AS o_milli
        |  FROM grp WHERE n_tr > 0 AND n_te > 0),
        |agg AS (
        |  SELECT CAST(SUM(n_te) AS BIGINT) AS n_test,
        |    CAST(SUM(pos_te) AS BIGINT) AS pos_test,
        |    CAST(SUM(pos_te * (1000 - p_milli) * (1000 - p_milli) +
        |      (n_te - pos_te) * p_milli * p_milli) AS BIGINT) AS brier_s,
        |    CAST(SUM(n_te * (p_milli - o_milli) * (p_milli - o_milli))
        |      AS BIGINT) AS rel_s,
        |    CAST(SUM(n_te * o_milli * o_milli) AS BIGINT) AS so2
        |  FROM q)
        |SELECT n_test, pos_test * 1000 // n_test AS obar_milli,
        |  brier_s // n_test AS brier_micro,
        |  rel_s // n_test AS rel_micro,
        |  (so2 // n_test) -
        |    (pos_test * 1000 // n_test) * (pos_test * 1000 // n_test)
        |    AS res_micro,
        |  (pos_test * 1000 // n_test) *
        |    (1000 - pos_test * 1000 // n_test) AS unc_micro
        |FROM agg""".stripMargin,

    "q451_ewma_dyadic" ->
      """WITH day AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    COUNT(*) AS y
        |  FROM orders GROUP BY 1)
        |SELECT a.day, CAST(MAX(CASE WHEN b.day = a.day THEN b.y END)
        |    AS BIGINT) AS y,
        |  COUNT(*) AS n_lags,
        |  CAST(SUM(b.y * CAST(power(CAST(2 AS DOUBLE),
        |    CAST(19 - (a.day - b.day) AS DOUBLE)) AS BIGINT))
        |    AS BIGINT) AS ewma_s,
        |  CAST(SUM(b.y * CAST(power(CAST(2 AS DOUBLE),
        |    CAST(19 - (a.day - b.day) AS DOUBLE)) AS BIGINT)) * 1000
        |    // 1048576 AS BIGINT) AS ewma_milli
        |FROM day a JOIN day b ON a.day - b.day BETWEEN 0 AND 19
        |GROUP BY a.day ORDER BY a.day""".stripMargin,

    "q452_jackknife_ratio" ->
      s"""WITH day AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS nd,
         |    CAST(SUM($CentsF) AS BIGINT) AS sd
         |  FROM orders GROUP BY 1),
         |tot AS (
         |  SELECT COUNT(*) AS n_days, CAST(SUM(nd) AS BIGINT) AS n_all,
         |    CAST(SUM(sd) AS BIGINT) AS s_all
         |  FROM day),
         |reps AS (
         |  SELECT (CAST(s_all - sd AS HUGEINT) * 1000000) // (n_all - nd)
         |      AS r_i,
         |    n_days, n_all, s_all
         |  FROM day CROSS JOIN tot WHERE n_all > nd),
         |agg AS (
         |  SELECT COUNT(*) AS n,
         |    MAX((CAST(s_all AS HUGEINT) * 1000000) // n_all) AS r_w,
         |    CAST(SUM(r_i) AS HUGEINT) AS sr_w,
         |    CAST(SUM(r_i * r_i) AS HUGEINT) AS sr2_w
         |  FROM reps)
         |SELECT CAST(n AS BIGINT) AS n_days,
         |  CAST(r_w AS BIGINT) AS r_micro,
         |  CAST(sr_w // n AS BIGINT) AS jk_mean_micro,
         |  CAST(floor(sqrt(${Du.wideToDouble(
           "((CAST(n AS HUGEINT) - 1) * " +
             "(CAST(n AS HUGEINT) * sr2_w - sr_w * sr_w))")}) /
         |    CAST(n AS DOUBLE)) AS BIGINT) AS jk_se_micro
         |FROM agg""".stripMargin,

    "q453_kurtosis" -> {
      val mean = s"(${Du.wideToDouble("s1")} / n)"
      val m2 = s"(${Du.wideToDouble("s2")} / n - $mean * $mean)"
      val m4 = s"(${Du.wideToDouble("s4")} / n - 4 * $mean * " +
        s"(${Du.wideToDouble("s3")} / n) + " +
        s"6 * $mean * $mean * (${Du.wideToDouble("s2")} / n) - " +
        s"3 * $mean * $mean * $mean * $mean)"
      s"""WITH s AS (
         |  SELECT l_returnflag, COUNT(*) AS n,
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
         |SELECT l_returnflag, n,
         |  CASE WHEN n < 2 OR $m2 <= 0 THEN NULL ELSE
         |  CAST(floor(($m4 / ($m2 * $m2) - 3) *
         |    CAST(1000000 AS DOUBLE)) AS BIGINT) END AS kurt_micro
         |FROM s ORDER BY l_returnflag""".stripMargin
    },

    "q468_session_window" ->
      """WITH e AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts,
        |    CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT) AS vm
        |  FROM events),
        |flags AS (
        |  SELECT user_id, ts, vm,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w >= INTERVAL 6 HOUR
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts, vm,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flags)
        |SELECT user_id, MIN(ts) AS win_start, COUNT(*) AS n_events,
        |  CAST(SUM(vm) AS BIGINT) AS vmilli_sum
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, win_start""".stripMargin,

    "q469_winsorized_mean" ->
      s"""WITH o AS (
         |  SELECT o_orderkey AS k, $CentsF AS cents FROM orders),
         |rk AS (
         |  SELECT cents,
         |    ROW_NUMBER() OVER (ORDER BY cents, k) AS rk
         |  FROM o),
         |nn AS (SELECT CAST(MAX(rk) AS BIGINT) AS n,
         |  CAST(MAX(rk) AS BIGINT) // 20 AS t FROM rk),
         |bounds AS (
         |  SELECT n, t,
         |    CAST(MIN(CASE WHEN rk.rk = t + 1 THEN cents END) AS BIGINT)
         |      AS v_lo,
         |    CAST(MAX(CASE WHEN rk.rk = n - t THEN cents END) AS BIGINT)
         |      AS v_hi
         |  FROM rk CROSS JOIN nn
         |  WHERE rk.rk = t + 1 OR rk.rk = n - t
         |  GROUP BY 1, 2),
         |agg AS (
         |  SELECT MAX(n) AS n, MAX(t) AS t, MAX(v_lo) AS v_lo,
         |    MAX(v_hi) AS v_hi,
         |    CAST(SUM(CASE WHEN rk.rk <= t THEN v_lo
         |      WHEN rk.rk > n - t THEN v_hi ELSE cents END) AS BIGINT)
         |      AS wins_sum,
         |    CAST(SUM(CASE WHEN rk.rk > t AND rk.rk <= n - t THEN cents
         |      END) AS BIGINT) AS trim_sum
         |  FROM rk CROSS JOIN bounds)
         |SELECT n, t, v_lo, v_hi,
         |  CAST((CAST(wins_sum AS HUGEINT) * 1000000) // n AS BIGINT)
         |    AS wins_mean_micro,
         |  CASE WHEN n - 2 * t <= 0 THEN NULL ELSE
         |    CAST((CAST(trim_sum AS HUGEINT) * 1000000) // (n - 2 * t)
         |      AS BIGINT) END AS trim_mean_micro
         |FROM agg""".stripMargin,

    "q466_cuped" -> {
      val thetaD =
        s"((CASE WHEN CAST(n AS HUGEINT) * sxy_w - CAST(sx AS HUGEINT) * sy >= 0 " +
          s"THEN ${Du.wideToDouble("(CAST(n AS HUGEINT) * sxy_w - CAST(sx AS HUGEINT) * sy)")} " +
          s"ELSE -${Du.wideToDouble("(CAST(sx AS HUGEINT) * sy - CAST(n AS HUGEINT) * sxy_w)")} END) / " +
          s"${Du.wideToDouble("(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)")})"
      s"""WITH u AS (
         |  SELECT CAST(user_id AS BIGINT) AS uid,
         |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
         |      THEN 1 ELSE 0 END) AS BIGINT) AS x,
         |    CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
         |      THEN CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT)
         |      ELSE 0 END), 0) AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |ua AS (SELECT *, uid % 2 AS arm FROM u),
         |pooled AS (
         |  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
         |    CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x * x) AS BIGINT) AS sxx,
         |    CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy_w
         |  FROM ua),
         |arms AS (
         |  SELECT arm, COUNT(*) AS n_a, CAST(SUM(x) AS BIGINT) AS sx_a,
         |    CAST(SUM(y) AS BIGINT) AS sy_a
         |  FROM ua GROUP BY 1)
         |SELECT CAST(arm AS BIGINT) AS arm, n_a, sx_a, sy_a,
         |  CAST((CAST(sy_a AS HUGEINT) * 1000000) // n_a AS BIGINT)
         |    AS ybar_micro,
         |  CASE WHEN n_a = 0 OR
         |      CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx <= 0
         |    THEN NULL ELSE
         |    CAST(floor((CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) -
         |      $thetaD * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) -
         |      CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) *
         |      CAST(1000000 AS DOUBLE)) AS BIGINT) END AS adj_micro
         |FROM arms CROSS JOIN pooled
         |ORDER BY arm""".stripMargin
    },

    "q463_embed_gram" ->
      """WITH q AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 32768.0)
        |      AS BIGINT) AS qi
        |  FROM embeddings)
        |SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
        |  CAST(SUM(a.qi * b.qi) AS BIGINT) AS g,
        |  COUNT(*) AS n_vec
        |FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q464_dispersion" -> {
      val zText = (nm: String) =>
        s"CAST(floor(${Du.wideToDouble(nm)} / " +
          s"${Du.wideToDouble("(CAST(nd AS HUGEINT) - 1) * s1")} * " +
          "sqrt(CAST(nd - 1 AS DOUBLE) / CAST(2 AS DOUBLE)) * " +
          "CAST(1000000 AS DOUBLE)) AS BIGINT)"
      s"""WITH day AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS x
         |  FROM orders GROUP BY 1),
         |agg AS (
         |  SELECT COUNT(*) AS nd, CAST(SUM(x) AS BIGINT) AS s1,
         |    CAST(SUM(x * x) AS BIGINT) AS s2
         |  FROM day),
         |lanes AS (
         |  SELECT *, CAST(nd AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 -
         |    (CAST(nd AS HUGEINT) - 1) * s1 AS num_w
         |  FROM agg),
         |z AS (
         |  SELECT nd, s1,
         |    CASE WHEN nd < 2 OR s1 <= 0 THEN NULL
         |      WHEN num_w >= 0 THEN ${zText("num_w")}
         |      ELSE -${zText("(-num_w)")} END AS z_micro
         |  FROM lanes)
         |SELECT nd AS n_days, s1 AS n_orders, z_micro,
         |  CASE WHEN z_micro IS NULL THEN NULL
         |    ELSE z_micro > 1644854 END AS overdispersed_95
         |FROM z""".stripMargin
    },

    "q465_footrule" ->
      """WITH a AS (
        |  SELECT l_partkey, CAST(SUM(CAST(CAST(l_extendedprice
        |      AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS ca
        |  FROM lineitem WHERE year(CAST(l_shipdate AS DATE)) = 1995
        |  GROUP BY 1),
        |b AS (
        |  SELECT l_partkey, CAST(SUM(CAST(CAST(l_extendedprice
        |      AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cb
        |  FROM lineitem WHERE year(CAST(l_shipdate AS DATE)) = 1996
        |  GROUP BY 1),
        |common AS (
        |  SELECT a.l_partkey, ca, cb FROM a JOIN b USING (l_partkey)),
        |rk AS (
        |  SELECT l_partkey,
        |    ROW_NUMBER() OVER (ORDER BY ca, l_partkey) AS rk_a,
        |    ROW_NUMBER() OVER (ORDER BY cb, l_partkey) AS rk_b
        |  FROM common),
        |j AS (
        |  SELECT COUNT(*) AS m,
        |    CAST(SUM(abs(rk_a - rk_b)) AS BIGINT) AS footrule
        |  FROM rk)
        |SELECT m, footrule, m * m // 2 AS max_fr,
        |  CASE WHEN m * m // 2 = 0 THEN NULL
        |    ELSE (m * m // 2 - footrule) * 1000 // (m * m // 2) END
        |    AS agree_milli
        |FROM j""".stripMargin,

    "q458_countmin" -> {
      val bDu = (src: String) =>
        s"${Du.hash64(s"'cms' || CAST(j AS VARCHAR) || ':' || CAST($src AS VARCHAR)")} % 64"
      s"""WITH keys AS (
         |  SELECT CAST(user_id AS BIGINT) AS k FROM events
         |  WHERE user_id IS NOT NULL),
         |js AS (SELECT unnest(range(0, 4)) AS j),
         |cells AS (
         |  SELECT j, ${bDu("k")} AS b, COUNT(*) AS c
         |  FROM keys CROSS JOIN js GROUP BY 1, 2),
         |probes AS (
         |  SELECT k, COUNT(*) AS n_exact FROM keys GROUP BY 1
         |  HAVING k <= 10),
         |pj AS (
         |  SELECT p.k, p.n_exact, js.j, ${bDu("p.k")} AS b
         |  FROM probes p CROSS JOIN js)
         |SELECT pj.k AS user_id, pj.n_exact,
         |  CAST(MIN(cells.c) AS BIGINT) AS n_est,
         |  CAST(MIN(cells.c) - pj.n_exact AS BIGINT) AS overcount
         |FROM pj JOIN cells ON pj.j = cells.j AND pj.b = cells.b
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin
    },

    "q459_grouping_flags" ->
      """SELECT o_orderstatus AS status, o_orderpriority AS priority,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_s,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_p,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |    AS BIGINT)) AS BIGINT) AS cents
        |FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY g_s, g_p, status NULLS FIRST, priority NULLS FIRST"""
        .stripMargin,

    "q460_regexp_extract" ->
      """SELECT regexp_extract(o_orderpriority, '([0-9]+)', 1)
        |    AS prio_digit,
        |  regexp_extract(o_orderstatus, '([0-9]+)', 1) AS status_digit,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q461_bit_aggs" ->
      """SELECT event_type,
        |  CAST(bit_and(event_id) AS BIGINT) AS all_and,
        |  CAST(bit_or(event_id) AS BIGINT) AS all_or,
        |  CAST(bit_xor(event_id) AS BIGINT) AS all_xor,
        |  COUNT(*) AS n
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q462_try_cast" ->
      """SELECT o_orderpriority AS priority,
        |  COUNT(TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER))
        |    AS n_digit_ok,
        |  CAST(SUM(TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER))
        |    AS BIGINT) AS digit_sum,
        |  COUNT(TRY_CAST(o_orderstatus AS INTEGER)) AS n_status_ok,
        |  COUNT(TRY_CAST(o_totalprice * CASE WHEN o_orderkey % 1000 = 0
        |    THEN 1e15 ELSE 1.0 END AS BIGINT)) AS n_overflow_ok,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q457_delta_agg" ->
      s"""WITH upd AS (
         |  SELECT o_orderstatus AS status,
         |    $CentsF AS cents
         |  FROM orders
         |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         |     OR o_orderkey % 13 <> 0)
         |SELECT status, COUNT(*) AS n_rows,
         |  COUNT(cents) AS n_vals,
         |  CAST(SUM(cents) AS BIGINT) AS sum_cents
         |FROM upd GROUP BY 1 ORDER BY status""".stripMargin,

    "q454_katz_centrality" ->
      """WITH f AS (
        |  SELECT DISTINCT l_partkey AS src, l_suppkey + 10000000 AS dst
        |  FROM lineitem),
        |e AS (SELECT src, dst FROM f UNION SELECT dst, src FROM f),
        |nodes AS (SELECT DISTINCT src AS node FROM e),
        |c0 AS (SELECT node, CAST(0 AS BIGINT) AS c FROM nodes),
        |i1 AS (SELECT e.dst AS node, SUM((1000000 + c0.c) // 16) AS fl
        |       FROM c0 JOIN e ON c0.node = e.src GROUP BY e.dst),
        |c1 AS (SELECT nodes.node, CAST(COALESCE(i1.fl, 0) AS BIGINT) AS c
        |       FROM nodes LEFT JOIN i1 ON nodes.node = i1.node),
        |i2 AS (SELECT e.dst AS node, SUM((1000000 + c1.c) // 16) AS fl
        |       FROM c1 JOIN e ON c1.node = e.src GROUP BY e.dst),
        |c2 AS (SELECT nodes.node, CAST(COALESCE(i2.fl, 0) AS BIGINT) AS c
        |       FROM nodes LEFT JOIN i2 ON nodes.node = i2.node),
        |i3 AS (SELECT e.dst AS node, SUM((1000000 + c2.c) // 16) AS fl
        |       FROM c2 JOIN e ON c2.node = e.src GROUP BY e.dst),
        |c3 AS (SELECT nodes.node, CAST(COALESCE(i3.fl, 0) AS BIGINT) AS c
        |       FROM nodes LEFT JOIN i3 ON nodes.node = i3.node)
        |SELECT node, c AS katz_ppm FROM c3 ORDER BY node""".stripMargin)
}
