package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.PortableSql

/** Round-6 third analytics inventory: string-distance entity ops on
  * the codegen'd [[graft.functions.StringDistance]] kernels, plus the
  * statistics/test wave (normality, runs, rank tests, changepoints).
  * Same determinism contract as [[Analytics]]/[[Analytics2]]: integer
  * lanes, shared IEEE formula texts for any float tail, ANSI
  * zero-denominator guards mirrored on both engines, sign split
  * before any integer division whose numerator can be negative.
  *
  * Reference behavior: pydala2 exposes none of these — they extend
  * the training-data-pipeline stack (SURVEY.md "beyond the
  * reference").
  */
object Analytics3 {

  private val Du = PortableSql.Duck
  private val Sp = PortableSql.Spark

  /** Wald–Wolfowitz z in ONE shared IEEE text: z = A·√((N−1)/V) with
    * A = R·N − 2n₁n₂ − N and V = 2n₁n₂(2n₁n₂ − N) — the algebra keeps
    * every division inside one sqrt (correctly rounded on both
    * engines) and the only non-sqrt float op is the final multiply.
    */
  private val RunsZF: String =
    "CASE WHEN v_stat <= 0 OR nn <= 1 THEN NULL ELSE " +
      "CAST(floor(CAST(a_stat AS DOUBLE) * " +
      "sqrt(CAST(nn - 1 AS DOUBLE) / CAST(v_stat AS DOUBLE)) * " +
      "CAST(1000000 AS DOUBLE)) AS BIGINT) END"

  /** Pettitt significance at α = 0.05 as a PURE INTEGER compare:
    * p ≈ 2·exp(−6K²/(n³+n²)) < 0.05 ⟺ 6K² > −ln(0.025)·(n³+n²), with
    * −ln(0.025) = 3.688879… as the rational literal 3688879/10⁶ —
    * exp/ln are libm-dependent (NOT correctly rounded, unlike sqrt)
    * and never enter shared texts in this codebase.
    */
  private def pettittSigF(dl: graft.functions.SqlDialect): String =
    "CASE WHEN 6 * k_stat * k_stat > " +
      dl.intDiv("3688879 * (nd * nd * nd + nd * nd)", "1000000") +
      " THEN 1 ELSE 0 END"

  /** q367's Kruskal–Wallis lanes over (sum_q, n_total, tie_cube):
    * H·1000 = 3000·Σ(S2²/4n_g)·4/(N(N+1)) − 3000(N+1) with the
    * per-group floors inside sum_q (the q326 SSB discipline; clamp
    * ≥ 0 BEFORE any division so no negative ever meets div-vs-//),
    * then the tie correction as one exact wide ratio. EVERY cubic/
    * quadratic lane rides DECIMAL(38,0)/HUGEINT end-to-end — the
    * 10× probe measured S2²/n_g and N³ crossing 2⁶³ at 6M rows
    * (ANSI ArithmeticException), the q321/q344 overflow class.
    */
  private def kwCubeF(dl: graft.functions.SqlDialect): String =
    s"(${dl.wide("n_total")} * n_total * n_total - n_total)"
  private def kwHMilliF(dl: graft.functions.SqlDialect): String =
    s"greatest(CAST(${dl.intDiv(dl.wide("sum_q") + " * 3000",
      "(" + dl.wide("n_total") + " * (n_total + 1))")} AS BIGINT) " +
      "- 3000 * (n_total + 1), 0)"
  private def kwHAdjF(dl: graft.functions.SqlDialect): String =
    s"CASE WHEN ${kwCubeF(dl)} - tie_cube <= ${dl.wide("0")} THEN NULL " +
      s"ELSE CAST(${dl.intDiv(
        dl.wide("h_milli") + s" * ${kwCubeF(dl)}",
        "(" + kwCubeF(dl) + " - tie_cube)")} AS BIGINT) END"
  private def kwTieMilliF(dl: graft.functions.SqlDialect): String =
    s"CASE WHEN ${kwCubeF(dl)} <= ${dl.wide("0")} THEN NULL " +
      s"ELSE CAST(${dl.intDiv("tie_cube * 1000", kwCubeF(dl))} " +
      "AS BIGINT) END"
  /** Per-group floor(S2²/n_g). DuckDB divides HUGEINTs directly;
    * Spark's `div` ALWAYS returns LONG (the probe caught the result
    * ≈ n_g·N² ~ 7·10¹⁹ overflowing at 6M rows), so the Spark side
    * decomposes S2 = q·n + r and assembles the IDENTICAL integer
    * floor(S2²/n) = q²n + 2qr + floor(r²/n) in the DECIMAL lane —
    * every operand that meets `div` or `%` is LONG-safe (q ≈ 2N,
    * r < n_g).
    */
  private def kwSumQTermF(dl: graft.functions.SqlDialect): String =
    if (!dl.spark) dl.intDiv(dl.wide("s2_g") + " * s2_g", "n_g")
    else "(CAST((s2_g div n_g) AS DECIMAL(38,0)) * (s2_g div n_g) * n_g " +
      "+ CAST(2 * (s2_g div n_g) * (s2_g % n_g) AS DECIMAL(38,0)) " +
      "+ CAST(((s2_g % n_g) * (s2_g % n_g) div n_g) AS DECIMAL(38,0)))"

  /** q368's Durbin–Watson: every residual is the EXACT integer
    * eₜ·Δ = yₜ·Δ − aΔ − bΔ·xₜ (Δ = n·Sxx − Sx², aΔ and bΔ the
    * Cramer numerators), so the num/den quadratic forms ride the
    * wide lane and DW surfaces as ONE division of two portable
    * wide→doubles.
    */
  private def dwMicroF(dl: graft.functions.SqlDialect): String =
    "CASE WHEN den_w <= 0 THEN NULL ELSE " +
      s"CAST(floor(${dl.wideToDouble("num_w")} / ${dl.wideToDouble("den_w")} " +
      "* CAST(1000000 AS DOUBLE)) AS BIGINT) END"
  private def dwBMicroF(dl: graft.functions.SqlDialect): String =
    "CASE WHEN delta <= 0 THEN NULL WHEN bnum >= 0 THEN " +
      s"CAST(${dl.intDiv(dl.wide("bnum") + " * 1000000", "delta")} AS BIGINT) " +
      "ELSE -" +
      s"CAST(${dl.intDiv(dl.wide("-bnum") + " * 1000000", "delta")} AS BIGINT) END"

  /** q369's Ljung–Box Q over the q360 moment family (r1..r5 are the
    * Durbin–Levinson ρ̂ₖ columns): Q = n(n+2)·Σₖ ρ̂ₖ²/(n−k), summed in
    * LITERAL k order inside one shared text (term order is part of
    * the IEEE contract), then the χ²₍₅,0.95₎ verdict as an integer
    * compare on the already-quantized micro value.
    */
  private val LbQF: String =
    "CASE WHEN n <= 5 OR r1 IS NULL THEN NULL ELSE " +
      "CAST(floor(CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE) * (" +
      "r1 * r1 / CAST(n - 1 AS DOUBLE) + r2 * r2 / CAST(n - 2 AS DOUBLE) + " +
      "r3 * r3 / CAST(n - 3 AS DOUBLE) + r4 * r4 / CAST(n - 4 AS DOUBLE) + " +
      "r5 * r5 / CAST(n - 5 AS DOUBLE)) * CAST(1000000 AS DOUBLE)) " +
      "AS BIGINT) END"
  private val LbRejectF: String =
    "CASE WHEN q_micro IS NULL THEN NULL " +
      "WHEN q_micro > 11070497 THEN 1 ELSE 0 END"

  /** The events milli lane — shared with Analytics2 so q369's inputs
    * can never drift from q360's.
    */
  private val VMilliF = Analytics2.VMilliF
  private val CentsF =
    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

  /** q370's Friedman statistic over (sum_q = Σⱼ S2ⱼ², n_blocks,
    * k_treat) with S2ⱼ the DOUBLED within-block rank sums (doubling
    * keeps tie mid-ranks integer): Q·1000 = 3000·ΣS2ⱼ²/(n·k(k+1)) −
    * 3000·n·(k+1), clamped ≥ 0 BEFORE nothing divides it (the floors
    * can push a tied-everywhere block set slightly negative).
    */
  private def friedmanQF(dl: graft.functions.SqlDialect): String =
    s"greatest(CAST(${dl.intDiv(dl.wide("sum_q") + " * 3000",
      "(n_blocks * k_treat * (k_treat + 1))")} AS BIGINT) " +
      "- 3000 * n_blocks * (k_treat + 1), 0)"

  /** q371's one-way F over group moments (n_g, s_g, q_g) — the q326
    * lanes verbatim: per-group floors inside sum_sg2_over_ng, SSB
    * clamped ≥ 0 before the single cross-multiplied division.
    */
  private def anovaTermF(dl: graft.functions.SqlDialect): String =
    s"CAST(${dl.intDiv(dl.wide("s_g") + " * s_g", "n_g")} AS BIGINT)"
  private def anovaGrandF(dl: graft.functions.SqlDialect): String =
    s"CAST(${dl.intDiv(dl.wide("s_total") + " * s_total", "n_total")} " +
      "AS BIGINT)"
  private def anovaFMilliF(dl: graft.functions.SqlDialect): String =
    "CASE WHEN ss_within <= 0 OR k_groups <= 1 THEN NULL ELSE " +
      s"CAST(${dl.intDiv(
        dl.wide("greatest(ss_between, 0)") + " * (n_total - k_groups) * 1000",
        "(" + dl.wide("ss_within") + " * (k_groups - 1))")} AS BIGINT) END"

  /** q372's continuity-corrected McNemar χ²·1000 on the discordant
    * counts — pure integer (the correction clamps |b−c|−1 at 0 so the
    * numerator never goes negative into the division).
    */
  private def mcnemarF(dl: graft.functions.SqlDialect): String =
    "CASE WHEN b_disc + c_disc = 0 THEN NULL ELSE " +
      s"CAST(${dl.intDiv(
        "greatest(abs(b_disc - c_disc) - 1, 0) * " +
          "greatest(abs(b_disc - c_disc) - 1, 0) * 1000",
        "(b_disc + c_disc)")} AS BIGINT) END"

  /** q373's tie-corrected Jonckheere–Terpstra variance and z, over
    * exact integer inputs: diff_w = JT4 − mean4 (QUADRUPLED lane —
    * ×2 for tie half-counts, ×2 again so the mean N²−Σn² needs no /4)
    * and the three Kendall-style variance terms T1/72 +
    * C3g·C3v/(36·N(N−1)(N−2)) + C2g·C2v/(8·N(N−1)), each a ratio of
    * exact wide integers surfaced through the portable wide→double
    * (diff sign-split first — wideToDouble is nonneg-only). The
    * variance sums in LITERAL term order inside one shared text.
    */
  private def jtVDblF(dl: graft.functions.SqlDialect): String =
    s"${dl.wideToDouble("t1_w")} / CAST(72 AS DOUBLE) + " +
      s"${dl.wideToDouble("c3p_w")} / ${dl.wideToDouble("den3_w")} + " +
      s"${dl.wideToDouble("c2p_w")} / ${dl.wideToDouble("den2_w")}"
  private def jtDDblF(dl: graft.functions.SqlDialect): String =
    s"CASE WHEN diff_w >= 0 THEN ${dl.wideToDouble("diff_w")} " +
      s"ELSE -(${dl.wideToDouble("(-diff_w)")}) END"
  private val JtZF: String =
    "CASE WHEN v_dbl <= CAST(0 AS DOUBLE) THEN NULL ELSE " +
      "CAST(floor(d_dbl * CAST(1000000 AS DOUBLE) / " +
      "(CAST(4 AS DOUBLE) * sqrt(v_dbl))) AS BIGINT) END"

  /** q374's Cochran Q·1000 — pure integer: the numerator
    * k·ΣCⱼ² − (ΣR)² is exactly ≥ 0 (Cauchy–Schwarz, no floors
    * involved), so only the all-identical-rows denominator needs a
    * guard.
    */
  private def cochranQF(dl: graft.functions.SqlDialect): String =
    "CASE WHEN k_treat * sum_r - sum_r2 <= 0 THEN NULL ELSE " +
      s"CAST(${dl.intDiv(
        "(k_treat - 1) * 1000 * (k_treat * sum_c2 - " +
          dl.wide("sum_r") + " * sum_r)",
        "(k_treat * sum_r - sum_r2)")} AS BIGINT) END"

  /** q375's log-rank lanes: per-step expectation and hypergeometric
    * variance quantized to micro BEFORE summation (the q343 survival
    * convention — sums of rationals can't stay integer otherwise),
    * then z = (O−E)·1000/√V in one shared sqrt text.
    */
  private def lrEStepF(dl: graft.functions.SqlDialect): String =
    s"CAST(${dl.intDiv(dl.wide("d") + " * n1_risk * 1000000",
      "n_risk")} AS BIGINT)"
  private def lrVStepF(dl: graft.functions.SqlDialect): String =
    "CASE WHEN n_risk <= 1 THEN 0 ELSE " +
      s"CAST(${dl.intDiv(
        dl.wide("d") +
          " * n1_risk * (n_risk - n1_risk) * (n_risk - d) * 1000000",
        "(" + dl.wide("n_risk") + " * n_risk * (n_risk - 1))")} " +
      "AS BIGINT) END"
  private val LrZF: String =
    "CASE WHEN v_micro <= 0 THEN NULL ELSE " +
      "CAST(floor(CAST(o1_micro - e1_micro AS DOUBLE) * " +
      "CAST(1000 AS DOUBLE) / sqrt(CAST(v_micro AS DOUBLE))) " +
      "AS BIGINT) END"

  /** q376's four quality-filter predicates — identical integer texts
    * on both engines (the token list is the dialect-paired builder).
    */
  private def ablF1(dl: graft.functions.SqlDialect): String =
    "CASE WHEN n_chars < 150 THEN 1 ELSE 0 END"
  private def ablF2(dl: graft.functions.SqlDialect): String =
    s"CASE WHEN ${dl.size(dl.arrDistinct("toks"))} * 1000 < " +
      s"600 * ${dl.size("toks")} THEN 1 ELSE 0 END"
  private def ablF3(dl: graft.functions.SqlDialect): String =
    s"CASE WHEN n_chars * 10 < 30 * ${dl.size("toks")} " +
      s"OR n_chars * 10 > 100 * ${dl.size("toks")} THEN 1 ELSE 0 END"
  private def ablF4(dl: graft.functions.SqlDialect): String =
    s"CASE WHEN length(${dl.regexReplaceAll("text", "[^0-9]", "")}) * 5 " +
      "> n_chars THEN 1 ELSE 0 END"

  /** q379's ordered EMD·1000 between a group's sensitive-attribute
    * distribution and the global one — every per-level term shares
    * the denominator n_g·N, so the sum is ONE exact rational:
    * EMD = Σᵢ|cumᵍᵢ·N − cumᵢ·n_g| / ((m−1)·n_g·N).
    */
  private def tClosenessF(dl: graft.functions.SqlDialect): String =
    "CASE WHEN m_levels <= 1 OR n_g = 0 THEN NULL ELSE " +
      s"CAST(${dl.intDiv(dl.wide("sum_absdiff") + " * 1000",
        "((m_levels - 1) * n_g * n_total)")} AS BIGINT) END"

  /** q381's deterministic Poisson(1) weight from a 60-bit portable
    * hash reduced mod 10⁶ — CDF thresholds round(Σₖ e⁻¹/k!·10⁶) as
    * integer literals (libm exp never runs at query time), capped
    * at 5.
    */
  private val BootWF: String =
    "CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1 " +
      "WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3 " +
      "WHEN u < 996340 THEN 4 ELSE 5 END"

  /** q378's signed group-mean in milli — sign-split BEFORE the
    * integer division (Spark `div` truncates, DuckDB `//` floors;
    * they agree only on non-negative operands).
    */
  private def signedMeanMilliF(dl: graft.functions.SqlDialect): String =
    "CASE WHEN s_g >= 0 THEN " +
      s"CAST(${dl.intDiv("s_g * 1000", "n_g")} AS BIGINT) " +
      s"ELSE -CAST(${dl.intDiv("(-s_g) * 1000", "n_g")} AS BIGINT) END"
  private def strengthMilliF(dl: graft.functions.SqlDialect): String =
    "CASE WHEN greatest(ss_between, 0) + ss_within <= 0 THEN NULL ELSE " +
      s"CAST(${dl.intDiv("greatest(ss_between, 0) * 1000",
        "(greatest(ss_between, 0) + ss_within)")} AS BIGINT) END"

  /** The part-name token vocabulary both engines agree on: whitespace
    * tokens, deduplicated, with token frequency. Tiny by construction
    * (TPC-H part names draw from a fixed color-word list), and
    * SUBLINEAR at scale — Heaps' law keeps any real corpus vocabulary
    * far below row count, which is what licenses the pairwise block
    * join downstream.
    */
  private[queries] def partVocab(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(explode(expr(Sp.tokens("p_name"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))

  /** q363 kernel over any vocab frame (t, n): all pairs within full
    * Damerau–Levenshtein ≤ 2, classified by edit kind. Band join:
    * every LEFT token joins its own floor(len/3) band and both
    * neighbors. |len diff| ≤ 2 bounds |band diff| ≤ 1, but the lex
    * pair predicate (ta < tb) is direction-agnostic w.r.t. length —
    * the lex-smaller token can be LONGER and sit one band above tb,
    * so a one-sided {b, b+1} explode silently drops such pairs.
    * Exploding {b−1, b, b+1} guarantees every qualifying pair meets
    * in ≥1 band (completeness law in `TypoPairsSpec`); distinct()
    * collapses multi-band meetings.
    */
  private[graft] def typoPairs(v: DataFrame): DataFrame = {
    val left = v.select(col("t").as("ta"), col("n").as("na"),
      explode(expr("array(CAST(length(t) AS BIGINT) div 3 - 1, " +
        "CAST(length(t) AS BIGINT) div 3, " +
        "CAST(length(t) AS BIGINT) div 3 + 1)")).as("band"))
    val right = v.select(col("t").as("tb"), col("n").as("nb"),
      expr("CAST(length(tb) AS BIGINT) div 3").as("band"))
    left.join(right, Seq("band"))
      .filter(expr("ta < tb AND abs(length(ta) - length(tb)) <= 2"))
      .withColumn("dl", expr("damerau_levenshtein(ta, tb)"))
      .filter(expr("dl <= 2"))
      .select("ta", "tb", "na", "nb", "dl").distinct()
      .withColumn("ham", expr(
        "CASE WHEN length(ta) = length(tb) THEN hamming(ta, tb) END"))
      .withColumn("kind", expr(
        """CASE WHEN length(ta) <> length(tb) THEN 'indel'
          |     WHEN ham = dl THEN 'subst'
          |     WHEN ham = 2 * dl THEN 'swap'
          |     ELSE 'mixed' END""".stripMargin))
      .select("ta", "tb", "dl", "ham", "kind", "na", "nb")
      .orderBy("ta", "tb")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Typo-pair mining over the part-name vocabulary with the
    // codegen'd FULL Damerau–Levenshtein (DuckDB-builtin-identical,
    // byte alphabet — see StringDistanceExpressions.scala): all
    // vocabulary pairs within edit distance ≤ 2, classified by edit
    // kind — same-length pairs split into pure substitutions
    // (hamming = dl) vs adjacent-transposition slips (hamming = 2·dl
    // with dl swaps), length-changing pairs are indels. The pair
    // frame is a length-banded self-join (|len diff| ≤ 2 rides the
    // equi-join on a shared length-band key pair); vocabulary is
    // sublinear in corpus size (Heaps), so the blocked pair count
    // stays bounded at 100 TB while the kernel itself is O(len²) on
    // token-length strings inside whole-stage codegen.
    "q363_typo_pairs" -> { (s, d) => typoPairs(partVocab(s, d)) },

    // Wald–Wolfowitz runs test on daily order volume vs its lower
    // median: is the above/below-median sequence random, or does
    // demand cluster in regimes? Days equal to the median are dropped
    // (the standard dichotomization), runs counted by one lag pass
    // over the CALENDAR-BOUNDED day frame (~2.4k rows at any data
    // scale — the heavy lifting is the orders→day map-side count),
    // and z = A·√((N−1)/V) in exact-integer A, V with one shared
    // sqrt text. Complements q354 (monotone trend) with regime
    // clustering — a series can pass Mann–Kendall yet fail runs.
    "q364_runs_test" -> { (s, d) =>
      val day = Tables.orders(s, d)
        .groupBy(col("o_orderdate").as("day"))
        .agg(count(lit(1)).as("y"))
      val tot = day.agg(count(lit(1)).as("n_days"))
      val ranked = day
        .withColumn("rn",
          row_number().over(Window.orderBy(col("y"), col("day"))).cast("long"))
        .withColumn("n", count(lit(1)).over())
      val medF = ranked.filter(expr("rn * 2 >= n AND (rn - 1) * 2 < n"))
        .select(col("y").as("med"))
      val seq = day.crossJoin(broadcast(medF))
        .filter(col("y") =!= col("med"))
        .withColumn("sgn", expr("CASE WHEN y > med THEN 1 ELSE 0 END"))
        .withColumn("prev", lag("sgn", 1).over(Window.orderBy("day")))
      seq.agg(
          max("med").as("med"),
          coalesce(sum("sgn"), lit(0L)).as("n_above"),
          coalesce(sum(expr("1 - sgn")), lit(0L)).as("n_below"),
          coalesce(sum(expr(
            "CASE WHEN prev IS NULL OR sgn <> prev THEN 1 ELSE 0 END")),
            lit(0L)).as("runs"))
        .crossJoin(broadcast(tot))
        .withColumn("nn", expr("n_above + n_below"))
        .withColumn("a_stat", expr("runs * nn - 2 * n_above * n_below - nn"))
        .withColumn("v_stat", expr(
          "2 * n_above * n_below * (2 * n_above * n_below - nn)"))
        .withColumn("z_micro", expr(RunsZF))
        .select("n_days", "med", "n_above", "n_below", "runs",
          "a_stat", "v_stat", "z_micro")
    },

    // Pettitt changepoint test on the daily order-volume series: the
    // rank-based single-changepoint detector, EXACT at any scale via
    // the O(n) identity Uₜ − Uₜ₋₁ = Vₜ = #(yⱼ < yₜ) − #(yⱼ > yₜ) — the
    // pairwise double sum collapses to a value-class cumulative join
    // plus one running sum, never an n² pair frame (contrast q353,
    // which genuinely needs the pairs). K = max|Uₜ|, the split day
    // index t*, and an α=0.05 verdict by pure-integer compare (the
    // exp() of the closed-form p-value never enters — libm exp is not
    // cross-engine exact).
    "q365_pettitt" -> { (s, d) =>
      val day = Tables.orders(s, d)
        .groupBy(col("o_orderdate").as("day"))
        .agg(count(lit(1)).as("y"))
      val nd = day.agg(count(lit(1)).as("nd"))
      val cls = day.groupBy("y").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(Window.orderBy("y")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val cand = day.join(broadcast(cls), Seq("y"))
        .crossJoin(broadcast(nd))
        .withColumn("v", expr("2 * cum - c - nd"))
        .withColumn("x", row_number().over(Window.orderBy("day")).cast("long"))
        .withColumn("u", sum("v").over(Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("x") < col("nd"))
      val k = cand.agg(max(abs(col("u"))).as("k_stat"))
      cand.crossJoin(broadcast(k))
        .filter(abs(col("u")) === col("k_stat"))
        .orderBy("x").limit(1)
        .select(col("nd").as("n_days"), col("k_stat"),
          col("x").as("t_star"), col("u").as("u_at_t"),
          expr(pettittSigF(Sp)).as("sig_05"))
    },

    // Exponential time-decay-weighted revenue by market segment with a
    // 6-month half-life — the recency-weighted demand signal a
    // training-data curator reads before sampling. The half-life
    // weight 2^(−k) is DYADIC, so the whole computation stays EXACT:
    // Σ cents·2^(13−k) rides the DECIMAL(38,0)/HUGEINT lane and one
    // floor-shift recovers integer decayed cents — no float ever
    // enters (contrast any exp(−λt) formulation, which would be
    // libm-dependent). One broadcast dim join + one map-side
    // aggregate; recency_milli = decayed/nominal measures how recent
    // each segment's revenue mass is (1000·2^{-13} = stale … 1000 =
    // all-current).
    "q366_decayed_revenue" -> { (s, d) =>
      val o = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .withColumn("cents",
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        // clamp BEFORE the division (post-1998-12 dates would put a
        // negative numerator into div-vs-//) and cap at 13 so the
        // shift count stays in [0, 13] on any date range
        .withColumn("k", expr(
          "least(greatest((1998 - year(o_orderdate)) * 12 + " +
            "(12 - month(o_orderdate)), 0) div 6, 13)"))
        .withColumn("m",
          expr("shiftleft(CAST(1 AS BIGINT), CAST(13 - k AS INT))"))
      o.groupBy(col("c_mktsegment").as("mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum("cents").as("revenue_cents"),
          sum(expr("CAST(cents AS DECIMAL(19,0)) * m")).as("wide"))
        .withColumn("decayed_cents", expr("CAST(wide div 8192 AS BIGINT)"))
        .withColumn("recency_milli", expr(
          "CASE WHEN revenue_cents = 0 THEN NULL " +
            "ELSE decayed_cents * 1000 div revenue_cents END"))
        .select("mktsegment", "n_orders", "revenue_cents",
          "decayed_cents", "recency_milli")
        .orderBy("mktsegment")
    },

    // Kruskal–Wallis rank test: does quantity distribution differ by
    // return flag? EXACT mid-ranks at any scale without ever ranking
    // a row: quantity is a small-vocabulary value (the class frame is
    // |distinct values| rows), so per-class mid-ranks come from one
    // bounded cumulative pass and each group's DOUBLED rank sum
    // S2_g = Σ_v n_gv·(2·cum_v − c_v + 1) is a pure-integer map-side
    // aggregate. H rides the wide lane (per-group floors summed — the
    // q326 SSB discipline), the tie correction (huge here: 50 classes,
    // ~12k-deep ties) is one exact wide ratio, and the α=0.05 verdict
    // is an integer compare on the quantized milli value against
    // χ²₍₂,0.95₎ = 5.991. BIGINT headroom: s2_g ~ n_g·N and tie cubes
    // fit through ~10⁹ rows; past that both move to the wide lane.
    "q367_kruskal_wallis" -> { (s, d) =>
      val cls = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("g"),
          expr("CAST(l_quantity AS BIGINT)").as("q"))
        .agg(count(lit(1)).as("n_gv"))
      val pool = cls.groupBy("q").agg(sum("n_gv").as("c"))
        .withColumn("cum", sum("c").over(Window.orderBy("q")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val ties = pool.agg(sum(expr(s"${Sp.wide("c")} * c * c - c"))
        .as("tie_cube"))
      val grp = cls.join(broadcast(pool), Seq("q"))
        .groupBy("g")
        .agg(sum("n_gv").as("n_g"),
          sum(expr("n_gv * (2 * cum - c + 1)")).as("s2_g"))
        .withColumn("term", expr(kwSumQTermF(Sp)))
      grp.agg(count(lit(1)).as("n_groups"), sum("n_g").as("n_total"),
          sum("term").as("sum_q"))
        .crossJoin(broadcast(ties))
        .withColumn("h_milli", expr(kwHMilliF(Sp)))
        .withColumn("h_adj_milli", expr(kwHAdjF(Sp)))
        .withColumn("tie_milli", expr(kwTieMilliF(Sp)))
        .withColumn("reject_95", expr("h_adj_milli > 5991"))
        .select("n_groups", "n_total", "tie_milli", "h_milli",
          "h_adj_milli", "reject_95")
    },

    // Durbin–Watson on the daily-order-volume OLS trend: are the
    // detrended residuals serially correlated (the assumption every
    // trend fit upstream quietly makes)? Residuals stay EXACT by
    // working in the Δ-scaled frame — eₜ·Δ = yₜ·Δ − aΔ − bΔ·xₜ with
    // Δ = n·Sxx − Sx² and the Cramer numerators, all BIGINT through
    // ~10⁵ orders/day (past that they move wide) — so num/den are
    // exact wide quadratic forms and Δ² cancels in the ratio. DW
    // surfaces as ONE division of two portable wide→doubles; slope
    // b_micro sign-splits before its integer division. The only
    // unbounded work is the orders→day map-side count; everything
    // after runs on the calendar-bounded day frame.
    "q368_durbin_watson" -> { (s, d) =>
      val day = Tables.orders(s, d)
        .groupBy(col("o_orderdate").as("day"))
        .agg(count(lit(1)).as("y"))
        .withColumn("x", row_number().over(Window.orderBy("day")).cast("long"))
      val sums = day.agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum("y").as("sy"), sum(expr("x * x")).as("sxx"),
          sum(expr("x * y")).as("sxy"))
        .withColumn("delta", expr("n * sxx - sx * sx"))
        .withColumn("bnum", expr("n * sxy - sx * sy"))
        .withColumn("anum", expr("sy * sxx - sx * sxy"))
      day.crossJoin(broadcast(sums))
        .withColumn("e", expr("y * delta - anum - bnum * x"))
        .withColumn("e_prev", lag("e", 1).over(Window.orderBy("day")))
        .agg(max("n").as("n_days"), max("delta").as("delta"),
          max("bnum").as("bnum"),
          sum(expr("CAST(e AS DECIMAL(19,0)) * e")).as("den_w"),
          sum(expr("CASE WHEN e_prev IS NULL THEN NULL " +
            "ELSE CAST(e - e_prev AS DECIMAL(19,0)) * (e - e_prev) END"))
            .as("num_w"))
        .withColumn("b_micro", expr(dwBMicroF(Sp)))
        .withColumn("dw_micro", expr(dwMicroF(Sp)))
        .withColumn("pos_autocorr", expr("dw_micro < 1500000"))
        .select("n_days", "b_micro", "dw_micro", "pos_autocorr")
    },

    // Ljung–Box portmanteau test (lags 1–5) per event_type — "is this
    // series white noise at all?", the gate question before any of the
    // q357/q359/q360 time-series machinery is trusted. The ρ̂ₖ are the
    // q360 Durbin–Levinson autocorrelations on EXACT BIGINT/DECIMAL
    // moments (one type-partitioned ordered pass emits lag products
    // and the non-circular head/tail boundary sums); Q = n(n+2)·Σ
    // ρ̂ₖ²/(n−k) evaluates in ONE shared IEEE text with literal term
    // order, and the verdict is an integer compare of the quantized
    // micro value against χ²₍₅,0.95₎ = 11.0705.
    "q369_ljung_box" -> { (s, d) =>
      val ord = Window.partitionBy("event_type")
        .orderBy(col("tsu"), col("event_id"))
      val e = Tables.events(s, d)
        .withColumn("tsu", expr("unix_micros(ts)"))
        .withColumn("v", expr(VMilliF))
      val lagged = (1 to 5).foldLeft(e) { (df, k) =>
        df.withColumn(s"v_$k", lag("v", k).over(ord))
      }
        .withColumn("rn", row_number().over(ord).cast("long"))
        .withColumn("nn",
          count(lit(1)).over(Window.partitionBy("event_type")))
      val aggCols = Seq(sum(col("v")).as("sv"),
        sum(expr("CAST(v AS DECIMAL(19,0)) * v")).as("qv")) ++
        (1 to 5).flatMap(k => Seq(
          sum(expr(s"CAST(v AS DECIMAL(19,0)) * v_$k")).as(s"p$k"),
          sum(when(expr(s"rn <= $k"), col("v")).otherwise(0L)).as(s"h$k"),
          sum(when(expr(s"rn > nn - $k"), col("v")).otherwise(0L))
            .as(s"t$k")))
      val sums = lagged.groupBy("event_type")
        .agg(count(lit(1)).as("n"), aggCols: _*)
      (1 to 5).foldLeft(sums) { (df, k) =>
        df.withColumn(s"r$k", expr(Analytics2.pacfRF(Sp, k)))
      }
        .withColumn("q_micro", expr(LbQF))
        .withColumn("reject_95", expr(LbRejectF))
        .select(col("event_type"), col("n"),
          expr(Analytics2.pacfMicroF("r1")).as("r1_micro"),
          expr(Analytics2.pacfMicroF("r2")).as("r2_micro"),
          expr(Analytics2.pacfMicroF("r3")).as("r3_micro"),
          expr(Analytics2.pacfMicroF("r4")).as("r4_micro"),
          expr(Analytics2.pacfMicroF("r5")).as("r5_micro"),
          col("q_micro"), col("reject_95"))
        .orderBy("event_type")
    },

    // Friedman test: does order priority shift monthly revenue once
    // the month (block) effect is removed? Blocks = order months,
    // treatments = the 5 priorities; each complete block ranks its k
    // cell revenues (rank() min-rank + tie count gives DOUBLED
    // mid-ranks, so ties stay integer), and Q rides the wide lane.
    // The block-rank window is k rows per partition — partitioned,
    // never row-scale — and the cell rollup is the only unbounded
    // pass. α=0.05 verdict vs χ²₍₄,0.95₎ = 9.488 (df pinned to the
    // 5-treatment vocabulary) on the quantized milli value.
    "q370_friedman" -> { (s, d) =>
      val cell = Tables.orders(s, d)
        .groupBy(
          expr("CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)")
            .as("ym"),
          col("o_orderpriority").as("treat"))
        .agg(sum(expr(CentsF)).as("v"))
      val k = cell.agg(countDistinct("treat").as("k_treat"))
      val complete = cell.groupBy("ym").agg(count(lit(1)).as("n_t"))
        .crossJoin(broadcast(k))
        .filter(col("n_t") === col("k_treat"))
        .select("ym")
      val ranked = cell.join(broadcast(complete), Seq("ym"))
        .withColumn("rmin",
          rank().over(Window.partitionBy("ym").orderBy("v")).cast("long"))
        .withColumn("ties",
          count(lit(1)).over(Window.partitionBy("ym", "v")))
        .withColumn("s2", expr("2 * rmin + ties - 1"))
      val byT = ranked.groupBy("treat")
        .agg(count(lit(1)).as("n_blocks"), sum("s2").as("s2_j"))
      val tot = byT.agg(count(lit(1)).as("k_treat"),
          max("n_blocks").as("n_blocks"),
          sum(expr("CAST(s2_j AS DECIMAL(19,0)) * s2_j")).as("sum_q"))
        .withColumn("q_milli", expr(friedmanQF(Sp)))
        .select("k_treat", "q_milli")
      byT.crossJoin(broadcast(tot))
        .withColumn("mean_rank_milli", expr("s2_j * 1000 div (2 * n_blocks)"))
        .withColumn("reject_95", expr("q_milli > 9487"))
        .select("treat", "n_blocks", "s2_j", "mean_rank_milli",
          "q_milli", "reject_95")
        .orderBy("treat")
    },

    // Brown–Forsythe (median-Levene) variance-homogeneity test: do
    // quantity SPREADS differ by return flag, not just their centers
    // (q367 tests location; equal-variance is what every pooled-stat
    // lane upstream assumes)? Everything runs on the bounded
    // value-class frame: group medians come from one partitioned
    // cumulative (DOUBLED median = lo+hi central values keeps the
    // even-count case integer), the |2y − 2med| deviations are
    // class-weighted — NO second row pass — and the one-way F on the
    // deviations uses the q326 lanes (per-group floors, SSB clamped
    // before the division). Verdict vs the df₂→∞ critical
    // F₍₂,∞₎ = 2.996 on the quantized milli value.
    "q371_brown_forsythe" -> { (s, d) =>
      val cls = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("g"),
          expr("CAST(l_quantity AS BIGINT)").as("q"))
        .agg(count(lit(1)).as("n_gv"))
      val cum = cls
        .withColumn("cum", sum("n_gv").over(Window.partitionBy("g")
          .orderBy("q")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n_g", sum("n_gv").over(Window.partitionBy("g")))
      val med = cum
        .withColumn("v_lo", when(expr(
          "cum >= (n_g + 1) div 2 AND cum - n_gv < (n_g + 1) div 2"),
          col("q")))
        .withColumn("v_hi", when(expr(
          "cum >= n_g div 2 + 1 AND cum - n_gv < n_g div 2 + 1"), col("q")))
        .groupBy("g").agg(max("v_lo").as("v_lo"), max("v_hi").as("v_hi"))
        .withColumn("m2", expr("v_lo + v_hi"))
        .select("g", "m2")
      val grp = cls.join(broadcast(med), Seq("g"))
        .withColumn("z2", expr("abs(2 * q - m2)"))
        .groupBy("g")
        .agg(sum("n_gv").as("n_g"), sum(expr("n_gv * z2")).as("s_g"),
          sum(expr("n_gv * z2 * z2")).as("q_g"))
        .withColumn("term", expr(anovaTermF(Sp)))
      grp.agg(count(lit(1)).as("k_groups"), sum("n_g").as("n_total"),
          sum("s_g").as("s_total"), sum("q_g").as("q_total"),
          sum("term").as("sum_sg2_over_ng"))
        .withColumn("ss_between",
          expr(s"sum_sg2_over_ng - ${anovaGrandF(Sp)}"))
        .withColumn("ss_within", expr("q_total - sum_sg2_over_ng"))
        .withColumn("f_milli", expr(anovaFMilliF(Sp)))
        .withColumn("reject_95", expr("f_milli > 2996"))
        .select("k_groups", "n_total", "ss_between", "ss_within",
          "f_milli", "reject_95")
    },

    // McNemar test on two short-document detectors (chars < 300 vs
    // tokens < 55, both near the corpus median): are the two filters
    // exchangeable, or does one systematically flag docs the other
    // clears? Paired binary over one map-side pass; the verdict needs
    // ONLY the two discordant counts — the continuity-corrected
    // χ²·1000 = 1000·(|b−c|−1)²/(b+c) is pure integer with the
    // correction clamped at 0, compared against χ²₍₁,0.95₎ = 3.841.
    // The detector-upgrade gate: swap B in for A only if McNemar
    // can't tell them apart on held-out docs.
    "q372_mcnemar" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("a", expr("CASE WHEN n_chars < 300 THEN 1 ELSE 0 END"))
        .withColumn("b", expr(
          s"CASE WHEN ${Sp.size(Sp.tokens("text"))} < 55 THEN 1 ELSE 0 END"))
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(expr("a * b")), lit(0L)).as("both_short"),
          coalesce(sum(expr("a * (1 - b)")), lit(0L)).as("b_disc"),
          coalesce(sum(expr("(1 - a) * b")), lit(0L)).as("c_disc"))
        .withColumn("chi2_milli", expr(mcnemarF(Sp)))
        .withColumn("reject_95", expr("chi2_milli > 3841"))
        .select("n_docs", "both_short", "b_disc", "c_disc",
          "chi2_milli", "reject_95")
    },

    // Jonckheere–Terpstra ordered-alternative test: does quantity
    // trend MONOTONICALLY across the 11 ordered discount bands? (A
    // Kruskal–Wallis "they differ" is weaker than "they increase".)
    // The pairwise U statistic collapses onto the bounded value-class
    // frame — an 11×50 grid self-joined under band order (broadcast
    // nested-loop on ~550 rows, never a row-level pair) — in the
    // QUADRUPLED integer lane so tie half-counts and the /4 mean stay
    // integer. The variance is the FULL Kendall-style tie-corrected
    // form (quantity ties are massive), three ratios of exact wide
    // integers summed in literal order; z through one shared sqrt.
    "q373_jonckheere" -> { (s, d) =>
      val cls = Tables.lineitem(s, d)
        .groupBy(
          expr("CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("gd"),
          expr("CAST(l_quantity AS BIGINT)").as("q"))
        .agg(count(lit(1)).as("n_gv"))
      val gStats = cls.groupBy("gd").agg(sum("n_gv").as("n_g"))
        .agg(count(lit(1)).as("k_groups"), sum("n_g").as("n_total"),
          sum(expr(s"${Sp.wide("n_g")} * n_g")).as("sum_n2_w"),
          sum(expr(s"${Sp.wide("n_g")} * (n_g - 1)")).as("c2g_w"),
          sum(expr(s"${Sp.wide("n_g")} * (n_g - 1) * (n_g - 2)"))
            .as("c3g_w"),
          sum(expr(s"${Sp.wide("n_g")} * (n_g - 1) * (2 * n_g + 5)"))
            .as("bg_w"))
      val vStats = cls.groupBy("q").agg(sum("n_gv").as("t_v"))
        .agg(sum(expr(s"${Sp.wide("t_v")} * (t_v - 1)")).as("c2v_w"),
          sum(expr(s"${Sp.wide("t_v")} * (t_v - 1) * (t_v - 2)"))
            .as("c3v_w"),
          sum(expr(s"${Sp.wide("t_v")} * (t_v - 1) * (2 * t_v + 5)"))
            .as("a_w"))
      val u = cls.select(col("gd").as("ga"), col("q").as("qa"),
          col("n_gv").as("na"))
        .join(broadcast(cls.select(col("gd").as("gb"), col("q").as("qb"),
          col("n_gv").as("nb"))), col("ga") < col("gb"))
        .agg(coalesce(sum(expr(
          s"CASE WHEN qa < qb THEN 2 * ${Sp.wide("na")} * nb " +
            s"WHEN qa = qb THEN ${Sp.wide("na")} * nb " +
            s"ELSE ${Sp.wide("0")} END")), expr(Sp.wide("0"))).as("u2_w"))
      gStats.crossJoin(broadcast(vStats)).crossJoin(broadcast(u))
        .withColumn("diff_w", expr(
          s"2 * u2_w - (${Sp.wide("n_total")} * n_total - sum_n2_w)"))
        .withColumn("t1_w", expr(
          s"greatest(${Sp.wide("n_total")} * " +
            "((n_total - 1) * (2 * n_total + 5)) - bg_w - a_w, " +
            s"${Sp.wide("0")})"))
        .withColumn("c3p_w", expr("c3g_w * c3v_w"))
        .withColumn("den3_w", expr(
          s"36 * ${Sp.wide("n_total")} * ((n_total - 1) * (n_total - 2))"))
        .withColumn("c2p_w", expr("c2g_w * c2v_w"))
        .withColumn("den2_w", expr(
          s"8 * ${Sp.wide("n_total")} * (n_total - 1)"))
        .withColumn("v_dbl", expr(
          s"CASE WHEN n_total < 3 THEN CAST(-1 AS DOUBLE) " +
            s"ELSE ${jtVDblF(Sp)} END"))
        .withColumn("d_dbl", expr(jtDDblF(Sp)))
        .withColumn("z_micro", expr(JtZF))
        .withColumn("trend", expr(
          "CASE WHEN z_micro IS NULL THEN NULL " +
            "WHEN z_micro > 1644854 THEN 'increasing' " +
            "WHEN z_micro < -1644854 THEN 'decreasing' " +
            "ELSE 'none' END"))
        .select(col("n_total"), col("k_groups"),
          expr("CAST(diff_w AS BIGINT)").as("jt4_minus_mean4"),
          col("z_micro"), col("trend"))
    },

    // Cochran's Q over customers × years 1995–1997: is the share of
    // active customers HOMOGENEOUS across the three years, accounting
    // for each customer's own activity profile (the paired design a
    // plain per-year χ² ignores)? PURE integer end-to-end — the
    // numerator k·ΣCⱼ² − (ΣR)² is exact and nonnegative by
    // Cauchy–Schwarz, so the only guard is the degenerate
    // all-rows-identical denominator. One distinct + two bounded
    // rollups; verdict vs χ²₍₂,0.95₎ = 5.991 on the quantized value.
    "q374_cochran_q" -> { (s, d) =>
      val act = Tables.orders(s, d)
        .filter(expr("year(o_orderdate) BETWEEN 1995 AND 1997"))
        .select(col("o_custkey"),
          expr("CAST(year(o_orderdate) AS BIGINT)").as("yr"))
        .distinct()
      val rs = act.groupBy("o_custkey").agg(count(lit(1)).as("r_i"))
        .agg(count(lit(1)).as("n_subjects"), sum("r_i").as("sum_r"),
          sum(expr("r_i * r_i")).as("sum_r2"))
      val cs = act.groupBy("yr").agg(count(lit(1)).as("c_j"))
        .agg(count(lit(1)).as("k_treat"),
          sum(expr(s"${Sp.wide("c_j")} * c_j")).as("sum_c2"))
      rs.crossJoin(broadcast(cs))
        .withColumn("q_milli", expr(cochranQF(Sp)))
        .withColumn("reject_95", expr("q_milli > 5991"))
        .select("n_subjects", "k_treat", "sum_r", "sum_r2",
          "q_milli", "reject_95")
    },

    // Log-rank test on the q343 survival frame: do large line items
    // (quantity > 25) ship on a different latency curve than small
    // ones, under the same 1998-06-01 right-censoring? Per event time
    // the group-1 expectation d·n₁/n and hypergeometric variance
    // quantize to micro BEFORE summing (the q343 convention — sums of
    // rationals can't stay integer), at-risk counts ride two
    // cumulative lanes over the bounded distinct-duration frame, and
    // z = (O−E)·1000/√V in one shared sqrt text. The subject table is
    // touched once, map-side combined.
    "q375_logrank" -> { (s, d) =>
      val subj = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(expr("o_orderdate <= DATE '1998-06-01'"))
        .select(
          expr("CASE WHEN l_shipdate <= DATE '1998-06-01' " +
            "THEN datediff(l_shipdate, o_orderdate) " +
            "ELSE datediff(DATE '1998-06-01', o_orderdate) END")
            .cast("long").as("obs"),
          expr("CASE WHEN l_shipdate <= DATE '1998-06-01' THEN 1 ELSE 0 END")
            .as("ev"),
          expr("CASE WHEN CAST(l_quantity AS BIGINT) > 25 THEN 1 ELSE 0 END")
            .as("g1"))
      val steps = subj.groupBy("obs")
        .agg(count(lit(1)).as("c_all"), sum("ev").as("d"),
          sum("g1").as("c1"), sum(expr("ev * g1")).as("d1"))
      val n = steps.agg(sum("c_all").as("n_total"), sum("c1").as("n1_total"))
      val ordw = Window.orderBy("obs")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      steps.crossJoin(broadcast(n))
        .withColumn("cum_le", sum("c_all").over(ordw))
        .withColumn("cum1_le", sum("c1").over(ordw))
        .withColumn("n_risk", expr("n_total - cum_le + c_all"))
        .withColumn("n1_risk", expr("n1_total - cum1_le + c1"))
        .filter(col("d") > 0)
        .withColumn("e_step", expr(lrEStepF(Sp)))
        .withColumn("v_step", expr(lrVStepF(Sp)))
        .agg(max("n_total").as("n_total"), max("n1_total").as("n1_total"),
          count(lit(1)).as("n_steps"),
          sum(expr("d1 * 1000000")).as("o1_micro"),
          sum("e_step").as("e1_micro"), sum("v_step").as("v_micro"))
        .withColumn("z_micro", expr(LrZF))
        .withColumn("reject_95", expr("abs(z_micro) > 1959964"))
        .select("n_total", "n1_total", "n_steps", "o1_micro", "e1_micro",
          "v_micro", "z_micro", "reject_95")
    },

    // Quality-filter ABLATION MATRIX: every 2⁴ combination of four
    // standard curation filters (too-short, repetitive low-distinct
    // vocabulary, chars-per-token out of band, digit-heavy) counted
    // in ONE map-side pass over the corpus — the table a curator
    // reads to see marginal vs joint removal (filters overlap; the
    // sequential funnel q204 can't show that a filter is redundant).
    // Pure integer predicates on the dialect-paired token list;
    // 16-row output regardless of corpus size.
    "q376_filter_ablation" -> { (s, d) =>
      val f = Tables.documents(s, d)
        .withColumn("toks", expr(Sp.tokens("text")))
        .withColumn("f_short", expr(ablF1(Sp)))
        .withColumn("f_repet", expr(ablF2(Sp)))
        .withColumn("f_toklen", expr(ablF3(Sp)))
        .withColumn("f_digit", expr(ablF4(Sp)))
        .withColumn("mask", expr(
          "CAST(f_short + 2 * f_repet + 4 * f_toklen + 8 * f_digit " +
            "AS BIGINT)"))
      val tot = f.agg(count(lit(1)).as("n_corpus"))
      // complete 0..15 mask spine: an empty combination must show a
      // zero row (the q361 absent-digit discipline) or the matrix
      // can't distinguish "impossible" from "dropped"
      s.range(0, 16).toDF("mask")
        .join(f.groupBy("mask").agg(count(lit(1)).as("n_docs")),
          Seq("mask"), "left")
        .withColumn("n_docs", coalesce(col("n_docs"), lit(0L)))
        .crossJoin(broadcast(tot))
        .withColumn("f_short", expr("mask % 2"))
        .withColumn("f_repet", expr("(mask div 2) % 2"))
        .withColumn("f_toklen", expr("(mask div 4) % 2"))
        .withColumn("f_digit", expr("(mask div 8) % 2"))
        .withColumn("share_milli", expr("n_docs * 1000 div n_corpus"))
        .select("mask", "f_short", "f_repet", "f_toklen", "f_digit",
          "n_docs", "share_milli")
        .orderBy("mask")
    },

    // 4-truss peeling on the co-purchase graph, three rounds: keep
    // only edges supported by ≥ 2 triangles, recount, repeat — the
    // community-core extractor that k-core can't express (degree is
    // forgeable by hubs; triangle support is not). Each round is one
    // ordered-triangle join (a<b<c meets each triangle once) + one
    // explode-to-edges rollup on the bounded support-≥2 pair frame
    // (q290's memoized substrate); per-round frames are memoized so
    // the union of round summaries never recomputes a predecessor.
    // Output: per-round edge/triangle totals — the convergence
    // profile a 100 TB run would monitor.
    "q377_ktruss_peel" -> { (s, d) =>
      def support(e: DataFrame): DataFrame = {
        val tri = e.select(col("pa").as("a"), col("pb").as("b"))
          .join(e.select(col("pa").as("b"), col("pb").as("c")), "b")
          .join(e.select(col("pa").as("a2"), col("pb").as("c2")),
            col("a2") === col("a") && col("c2") === col("c"))
          .select("a", "b", "c")
        tri.select(explode(expr(
            "array(struct(a AS x, b AS y), struct(a AS x, c AS y), " +
              "struct(b AS x, c AS y))")).as("e"))
          .select(col("e.x").as("pa"), col("e.y").as("pb"))
          .groupBy("pa", "pb").agg(count(lit(1)).as("sup"))
      }
      var edges = Analytics.pairCounts(s, d).select("pa", "pb")
      val rounds = (1 to 3).map { r =>
        val withSup = Tables.memo(s, s"$d#q377sup$r") {
          edges.join(support(edges), Seq("pa", "pb"), "left")
            .withColumn("sup", coalesce(col("sup"), lit(0L)))
        }
        edges = withSup.filter(col("sup") >= 2).select("pa", "pb")
        withSup.agg(
            count(lit(1)).as("n_edges_in"),
            expr("coalesce(sum(sup), 0) div 3").as("n_triangles"),
            coalesce(sum(expr("CASE WHEN sup >= 2 THEN 1 ELSE 0 END")),
              lit(0L)).as("n_edges_kept"))
          .withColumn("round", lit(r.toLong))
          .select("round", "n_edges_in", "n_triangles", "n_edges_kept")
      }
      rounds.reduce(_.unionAll(_)).orderBy("round")
    },

    // Weekday seasonal decomposition of daily order volume: centered
    // 7-day moving-average detrend (×7 keeps it integer; edge days
    // with incomplete windows drop), then a one-way ANOVA of the
    // detrended series across ISO weekdays — the per-weekday seasonal
    // component (sign-split milli means) plus a seasonality-strength
    // ratio SSB/(SSB+SSW), the "is weekday worth modeling" number.
    // The MA window is 7 rows over the calendar-bounded day frame;
    // moments ride the q326 lanes (negatives never meet a division:
    // only squares and clamped sums divide).
    "q378_weekday_decompose" -> { (s, d) =>
      val day = Tables.orders(s, d)
        .groupBy(col("o_orderdate").as("day"))
        .agg(count(lit(1)).as("y"))
      val w = Window.orderBy("day").rowsBetween(-3, 3)
      val det = day
        .withColumn("ma7", sum("y").over(w))
        .withColumn("cnt7", count(lit(1)).over(w))
        .filter(col("cnt7") === 7)
        .withColumn("v", expr("7 * y - ma7"))
        .withColumn("dow", expr("CAST(weekday(day) + 1 AS BIGINT)"))
      val grp = det.groupBy("dow")
        .agg(count(lit(1)).as("n_g"), sum("v").as("s_g"),
          sum(expr("v * v")).as("q_g"))
        .withColumn("term", expr(anovaTermF(Sp)))
        .withColumn("mean_detr7_milli", expr(signedMeanMilliF(Sp)))
      val tot = grp.agg(count(lit(1)).as("k_groups"),
          sum("n_g").as("n_total"), sum("s_g").as("s_total"),
          sum("q_g").as("q_total"), sum("term").as("sum_sg2_over_ng"))
        .withColumn("ss_between",
          expr(s"sum_sg2_over_ng - ${anovaGrandF(Sp)}"))
        .withColumn("ss_within", expr("q_total - sum_sg2_over_ng"))
        .withColumn("f_milli", expr(anovaFMilliF(Sp)))
        .withColumn("strength_milli", expr(strengthMilliF(Sp)))
        .select("ss_between", "ss_within", "f_milli", "strength_milli")
      grp.crossJoin(broadcast(tot))
        .select("dow", "n_g", "mean_detr7_milli", "ss_between",
          "ss_within", "f_milli", "strength_milli")
        .orderBy("dow")
    },

    // t-closeness audit — the third leg of the privacy triad
    // (q306 k-anonymity, q333 l-diversity): for each (nation,
    // segment) quasi-identifier class, the ordered earth-mover
    // distance between its order-priority distribution and the
    // global one. Every |ΔCDF| term shares the n_g·N denominator so
    // the whole EMD is ONE exact rational in the wide lane; the
    // level spine left-join keeps absent priorities contributing
    // their full cumulative gap. One fact pass → 625-cell rollup;
    // everything after is bounded.
    "q379_t_closeness" -> { (s, d) =>
      val base = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select("c_custkey", "c_nationkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nk"),
          col("c_mktsegment").as("seg"), col("o_orderpriority").as("pr"))
      val cls = base.groupBy("nk", "seg", "pr")
        .agg(count(lit(1)).as("n_gi"))
      val levels = cls.select("pr").distinct()
      val groups = cls.groupBy("nk", "seg").agg(sum("n_gi").as("n_g"))
      val glob = cls.groupBy("pr").agg(sum("n_gi").as("n_i"))
        .withColumn("cum_i", sum("n_i").over(Window.orderBy("pr")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val tot = glob.agg(sum("n_i").as("n_total"),
        count(lit(1)).as("m_levels"))
      val spine = groups.crossJoin(broadcast(levels))
        .join(cls, Seq("nk", "seg", "pr"), "left")
        .withColumn("n_gi", coalesce(col("n_gi"), lit(0L)))
        .withColumn("cum_gi", sum("n_gi")
          .over(Window.partitionBy("nk", "seg").orderBy("pr")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .join(broadcast(glob.select("pr", "cum_i")), Seq("pr"))
        .crossJoin(broadcast(tot))
      val emd = spine
        // the last level's cumulative gap is 0 by construction; the
        // (m−1)-term sum just includes it as an exact zero
        .withColumn("absdiff", expr("abs(cum_gi * n_total - cum_i * n_g)"))
        .groupBy("nk", "seg")
        .agg(max("n_g").as("n_g"), sum("absdiff").as("sum_absdiff"),
          max("m_levels").as("m_levels"), max("n_total").as("n_total"))
        .withColumn("emd_milli", expr(tClosenessF(Sp)))
      val t = emd.agg(max("emd_milli").as("t_milli"))
      emd.crossJoin(broadcast(t))
        .withColumn("meets_t_200", expr("emd_milli <= 200"))
        .select(col("nk").cast("long").as("nationkey"), col("seg"),
          col("n_g"), col("emd_milli"), col("t_milli"), col("meets_t_200"))
        .orderBy(col("emd_milli").desc, col("nationkey"), col("seg"))
        .limit(20)
    },

    // Zipf rank–frequency conformity at dyadic probe ranks: a Zipfian
    // corpus keeps r·f_r roughly constant, so the normalized products
    // rf_r/rf_1 read directly as the exponent drift a tokenizer/
    // dedup pipeline cares about (s≈1 ⇒ flat; heavier boilerplate ⇒
    // rising tail). Top-1024 tokens via one TakeOrdered heap (never a
    // global sort); ranking happens INSIDE the bounded 1024-row frame.
    "q380_zipf_check" -> { (s, d) =>
      val top = TextOps.docsWithToks(s, d)
        .select(explode(col("toks")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("f"))
        .orderBy(col("f").desc, col("t"))
        .limit(1024)
      val ranked = top
        .withColumn("r",
          row_number().over(Window.orderBy(col("f").desc, col("t")))
            .cast("long"))
        .withColumn("rf", expr("r * f"))
      val rf1 = ranked.filter(col("r") === 1)
        .select(col("rf").as("rf_1"))
      ranked
        .filter(expr("r IN (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)"))
        .crossJoin(broadcast(rf1))
        .withColumn("rf_vs_r1_milli", expr("rf * 1000 div rf_1"))
        .select("r", "t", "f", "rf", "rf_vs_r1_milli")
        .orderBy("r")
    },

    // Deterministic Poisson bootstrap CI for the mean order value —
    // THE distributed bootstrap (per-row independent weights, no
    // coordination, any executor can draw its rows' weights from the
    // portable hash alone; classic resampling needs a global index).
    // B = 40 resamples ride one explode; Poisson(1) weights come from
    // integer CDF thresholds on hash mod 10⁶ (no RNG, no libm at
    // query time); each resample mean is an exact cents division and
    // the 95% CI picks order statistics 2 and 39 inside the bounded
    // 40-row frame.
    "q381_poisson_bootstrap" -> { (s, d) =>
      graft.functions.GraftFunctions.ensureRegistered(s)
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        expr(CentsF).as("cents"))
      val full = o.agg(count(lit(1)).as("n_orders"),
        expr("sum(cents) div count(1)").as("mean_cents"))
      val res = o
        .select(col("o_orderkey"), col("cents"),
          explode(expr("sequence(0, 39)")).as("b"))
        .withColumn("u", expr(Sp.hash64(
          "concat('boot:', cast(b as string), ':', " +
            "cast(o_orderkey as string))") + " % 1000000"))
        .withColumn("w", expr(BootWF))
        .groupBy("b")
        .agg(sum("w").as("n_b"), sum(expr("w * cents")).as("s_b"))
        .withColumn("mean_b", expr(
          "CASE WHEN n_b = 0 THEN NULL ELSE s_b div n_b END"))
        .withColumn("rk", row_number()
          .over(Window.orderBy(col("mean_b").asc_nulls_last, col("b")))
          .cast("long"))
      res.agg(
          max(expr("CASE WHEN rk = 2 THEN mean_b END")).as("lo_cents"),
          max(expr("CASE WHEN rk = 39 THEN mean_b END")).as("hi_cents"),
          count(lit(1)).as("n_resamples"))
        .crossJoin(broadcast(full))
        .withColumn("width_cents", expr("hi_cents - lo_cents"))
        .select("n_orders", "mean_cents", "n_resamples", "lo_cents",
          "hi_cents", "width_cents")
    },

    // Partition-key advisor: score six candidate layout columns by
    // NDV fit against the table's target file count and by value
    // balance (max/mean per-value rows) — the two numbers that decide
    // whether a hive layout produces sane file counts or a long-tail
    // of tiny/huge partitions. ONE scan feeds all candidates via a
    // struct-explode (never six passes); everything after the
    // (col, value) rollup is six rows.
    "q382_partition_advisor" -> { (s, d) =>
      val cands = Seq(
        ("l_shipdate", "CAST(l_shipdate AS STRING)"),
        ("ship_month",
          "CAST(year(l_shipdate) * 100 + month(l_shipdate) AS STRING)"),
        ("l_returnflag", "l_returnflag"),
        ("l_linestatus", "l_linestatus"),
        ("l_partkey", "CAST(l_partkey AS STRING)"),
        ("l_suppkey", "CAST(l_suppkey AS STRING)"))
      val arr = cands.map { case (n, e) =>
        s"named_struct('c', '$n', 'v', $e)"
      }.mkString("array(", ", ", ")")
      Tables.lineitem(s, d)
        .select(explode(expr(arr)).as("e"))
        .groupBy(expr("e.c").as("col"), expr("e.v").as("v"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("col")
        .agg(count(lit(1)).as("ndv"), sum("cnt").as("n_rows"),
          max("cnt").as("max_per_value"))
        .withColumn("avg_per_value", expr("n_rows div ndv"))
        .withColumn("balance_milli",
          expr("max_per_value * ndv * 1000 div n_rows"))
        .withColumn("target_files", expr("greatest(n_rows div 25000, 1)"))
        .withColumn("fit_milli", expr(
          "abs(ndv - target_files) * 1000 div greatest(ndv, target_files)"))
        .withColumn("recommended",
          expr("balance_milli <= 5000 AND fit_milli <= 900"))
        .select("col", "ndv", "n_rows", "avg_per_value", "max_per_value",
          "balance_milli", "fit_milli", "recommended")
        .orderBy("col")
    },

    // Column-profile drift between the first and second half of the
    // table's time range — the schema-health monitor an ingest
    // pipeline runs per batch: NDV and mean movement per metric
    // column, cross-multiplied so the relative drift never leaves the
    // integer lane (|sv_b·n_a − sv_a·n_b| / (sv_a·n_b) rides the wide
    // lane). One scan via struct-explode; the (col, period, value)
    // rollup bounds everything downstream by the value vocabulary.
    "q383_profile_drift" -> { (s, d) =>
      val metrics = Seq(
        ("quantity", "CAST(l_quantity AS BIGINT)"),
        ("price_cents",
          "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"),
        ("discount_pct",
          "CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)"),
        ("tax_pct", "CAST(CAST(l_tax AS DECIMAL(12,2)) * 100 AS BIGINT)"))
      val arr = metrics.map { case (n, e) =>
        s"named_struct('c', '$n', 'v', $e)"
      }.mkString("array(", ", ", ")")
      val per = Tables.lineitem(s, d)
        .withColumn("late", expr(
          "CASE WHEN l_shipdate >= DATE '1995-06-01' THEN 1 ELSE 0 END"))
        .select(col("late"), explode(expr(arr)).as("e"))
        .groupBy(expr("e.c").as("col"), col("late"), expr("e.v").as("v"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("col", "late")
        .agg(count(lit(1)).as("ndv"), sum("cnt").as("n"),
          sum(expr("v * cnt")).as("sv"))
      val a = per.filter(col("late") === 0)
        .select(col("col"), col("ndv").as("ndv_a"), col("n").as("n_a"),
          col("sv").as("sv_a"))
      val b = per.filter(col("late") === 1)
        .select(col("col"), col("ndv").as("ndv_b"), col("n").as("n_b"),
          col("sv").as("sv_b"))
      a.join(b, Seq("col"))
        .withColumn("mean_a_milli",
          expr(s"CAST(${Sp.intDiv(Sp.wide("sv_a") + " * 1000", "n_a")} " +
            "AS BIGINT)"))
        .withColumn("mean_b_milli",
          expr(s"CAST(${Sp.intDiv(Sp.wide("sv_b") + " * 1000", "n_b")} " +
            "AS BIGINT)"))
        .withColumn("mean_drift_milli", expr(
          "CASE WHEN sv_a = 0 THEN NULL ELSE " +
            s"CAST(${Sp.intDiv(
              s"abs(${Sp.wide("sv_b")} * n_a - ${Sp.wide("sv_a")} * n_b) " +
                "* 1000",
              "(" + Sp.wide("sv_a") + " * n_b)")} AS BIGINT) END"))
        .withColumn("ndv_drift_milli", expr(
          "abs(ndv_b - ndv_a) * 1000 div greatest(ndv_a, 1)"))
        .select("col", "n_a", "n_b", "ndv_a", "ndv_b", "mean_a_milli",
          "mean_b_milli", "mean_drift_milli", "ndv_drift_milli")
        .orderBy("col")
    },

    // Join-skew advisor: per candidate join key, the max/mean key
    // frequency and the salt factor that would spread the hottest key
    // across a 32-task stage — the number the q103 salted-join
    // machinery needs as input, computed instead of guessed:
    // salt = ⌈max_cnt · P / n_rows⌉. One struct-explode scan; the
    // per-key frame is the only unbounded intermediate and it
    // map-side combines.
    "q384_skew_advisor" -> { (s, d) =>
      val keys = Seq(
        ("l_orderkey", "CAST(l_orderkey AS STRING)"),
        ("l_partkey", "CAST(l_partkey AS STRING)"),
        ("l_suppkey", "CAST(l_suppkey AS STRING)"))
      val arr = keys.map { case (n, e) =>
        s"named_struct('c', '$n', 'v', $e)"
      }.mkString("array(", ", ", ")")
      Tables.lineitem(s, d)
        .select(explode(expr(arr)).as("e"))
        .groupBy(expr("e.c").as("key_col"), expr("e.v").as("v"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("key_col")
        .agg(count(lit(1)).as("ndv"), sum("cnt").as("n_rows"),
          max("cnt").as("max_cnt"))
        .withColumn("skew_milli", expr("max_cnt * ndv * 1000 div n_rows"))
        .withColumn("salt_rec", expr(
          "greatest((max_cnt * 32 + n_rows - 1) div n_rows, 1)"))
        .withColumn("needs_salt", expr("salt_rec > 1"))
        .select("key_col", "ndv", "n_rows", "max_cnt", "skew_milli",
          "salt_rec", "needs_salt")
        .orderBy("key_col")
    },

    // Harmonic centrality (3-hop) of the top-50 co-purchase hubs:
    // H₆ = 6·|d=1| + 3·|d=2| + 2·|d=3| — the 1/d weights at bounded
    // depth are EXACT in the ×6 integer lane (closeness centrality
    // needs full-graph distances; the 3-hop harmonic probe is the
    // scale-honest variant — beyond that the frontier frame is the
    // classic BFS blow-up, so the seed set is bounded up front, not
    // after the fact). Each hop is one equi-join + distinct + anti
    // joins against nearer hops, all seeded (≤ 50 × degree rows).
    "q386_harmonic_centrality" -> { (s, d) =>
      val edges = Analytics.pairCounts(s, d).select("pa", "pb")
      val sym = Tables.memo(s, s"$d#q386sym") {
        edges.union(edges.select(col("pb").as("pa"), col("pa").as("pb")))
          .distinct()
      }
      val seeds = sym.groupBy(col("pa").as("node"))
        .agg(count(lit(1)).as("deg"))
        .orderBy(col("deg").desc, col("node"))
        .limit(50)
        .select("node")
      val h1 = sym.join(broadcast(seeds), col("pa") === col("node"))
        .select(col("node"), col("pb").as("v"))
      val h2 = h1.join(sym, col("v") === col("pa"))
        .select(col("node"), col("pb").as("v")).distinct()
        .filter(col("node") =!= col("v"))
        .join(h1, Seq("node", "v"), "left_anti")
      val h3 = h2.join(sym, col("v") === col("pa"))
        .select(col("node"), col("pb").as("v")).distinct()
        .filter(col("node") =!= col("v"))
        .join(h1, Seq("node", "v"), "left_anti")
        .join(h2, Seq("node", "v"), "left_anti")
      val c1 = h1.groupBy("node").agg(count(lit(1)).as("n1"))
      val c2 = h2.groupBy("node").agg(count(lit(1)).as("n2"))
      val c3 = h3.groupBy("node").agg(count(lit(1)).as("n3"))
      c1.join(c2, Seq("node"), "left").join(c3, Seq("node"), "left")
        .withColumn("n2", coalesce(col("n2"), lit(0L)))
        .withColumn("n3", coalesce(col("n3"), lit(0L)))
        .withColumn("h6", expr("6 * n1 + 3 * n2 + 2 * n3"))
        .select("node", "n1", "n2", "n3", "h6")
        .orderBy(col("h6").desc, col("node"))
        .limit(30)
    },

    // Sketch-estimated self-join size on l_partkey — F₂ = Σf(k)²,
    // the number a cost-based optimizer needs BEFORE running the
    // q290-style pair join. The KMV bottom-256 keys (by portable
    // hash) give an unbiased uniform key sample carrying their FULL
    // frequencies plus the NDV estimate (k−1)·2⁶⁰/h₍ₖ₎, so
    // F̂₂ = mean(f²)·D̂ — everything integer, the 2⁶⁰ product in the
    // wide lane. Reported against the exact F₂ with a ≤±50% gate
    // (the sketch reads 256 keys; the truth reads all of them).
    "q387_join_size_sketch" -> { (s, d) =>
      graft.functions.GraftFunctions.ensureRegistered(s)
      val freq = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("f"))
        .withColumn("h",
          expr("portable_hash64(concat('jsz:', cast(k as string)))"))
      val exact = freq.agg(count(lit(1)).as("ndv_exact"),
        sum(expr("CAST(f AS DECIMAL(19,0)) * f")).as("f2_exact_w"))
      val samp = freq.orderBy(col("h").asc, col("k").asc).limit(256)
      val est = samp.agg(count(lit(1)).as("k_samp"), max("h").as("h_k"),
          sum(expr("CAST(f AS DECIMAL(19,0)) * f")).as("f2_samp_w"))
        .withColumn("d_est", expr(
          "CASE WHEN h_k <= 0 THEN NULL ELSE " +
            s"CAST(${Sp.intDiv(
              Sp.wide("k_samp - 1") + " * 1152921504606846976", "h_k")} " +
            "AS BIGINT) END"))
        .withColumn("f2_est", expr(
          s"CAST(${Sp.intDiv(Sp.wide("f2_samp_w") + " * d_est",
            "k_samp")} AS BIGINT)"))
      est.crossJoin(broadcast(exact))
        .withColumn("f2_exact", expr("CAST(f2_exact_w AS BIGINT)"))
        .withColumn("err_milli", expr(
          "CASE WHEN f2_exact = 0 THEN NULL ELSE " +
            "abs(f2_est - f2_exact) * 1000 div f2_exact END"))
        .withColumn("within_50pct", expr("err_milli <= 500"))
        .select("ndv_exact", "k_samp", "d_est", "f2_exact", "f2_est",
          "err_milli", "within_50pct")
    })

  val oracles: Map[String, String] = Map(

    "q363_typo_pairs" ->
      s"""WITH toks AS (
         |  SELECT unnest(${Du.tokens("p_name")}) AS t FROM part),
         |v AS (SELECT t, COUNT(*) AS n FROM toks GROUP BY 1),
         |pairs AS (
         |  SELECT a.t AS ta, b.t AS tb, a.n AS na, b.n AS nb,
         |    damerau_levenshtein(a.t, b.t) AS dl
         |  FROM v a JOIN v b ON a.t < b.t
         |  WHERE abs(length(a.t) - length(b.t)) <= 2),
         |hit AS (SELECT * FROM pairs WHERE dl <= 2),
         |cls AS (
         |  SELECT ta, tb, dl,
         |    CASE WHEN length(ta) = length(tb)
         |      THEN hamming(ta, tb) END AS ham,
         |    na, nb
         |  FROM hit)
         |SELECT ta, tb, dl, ham,
         |  CASE WHEN length(ta) <> length(tb) THEN 'indel'
         |       WHEN ham = dl THEN 'subst'
         |       WHEN ham = 2 * dl THEN 'swap'
         |       ELSE 'mixed' END AS kind,
         |  na, nb
         |FROM cls ORDER BY ta, tb""".stripMargin,

    "q364_runs_test" ->
      s"""WITH day AS (
         |  SELECT o_orderdate AS day, COUNT(*) AS y FROM orders GROUP BY 1),
         |tot AS (SELECT COUNT(*) AS n_days FROM day),
         |r AS (
         |  SELECT y, ROW_NUMBER() OVER (ORDER BY y, day) AS rn,
         |    COUNT(*) OVER () AS n
         |  FROM day),
         |medf AS (SELECT y AS med FROM r WHERE rn * 2 >= n AND (rn - 1) * 2 < n),
         |seq AS (
         |  SELECT day.day, med,
         |    CASE WHEN y > med THEN 1 ELSE 0 END AS sgn
         |  FROM day CROSS JOIN medf WHERE y <> med),
         |lagged AS (
         |  SELECT med, sgn, LAG(sgn) OVER (ORDER BY day) AS prev FROM seq),
         |a AS (
         |  SELECT MAX(med) AS med,
         |    COALESCE(CAST(SUM(sgn) AS BIGINT), 0) AS n_above,
         |    COALESCE(CAST(SUM(1 - sgn) AS BIGINT), 0) AS n_below,
         |    COALESCE(CAST(SUM(CASE WHEN prev IS NULL OR sgn <> prev
         |      THEN 1 ELSE 0 END) AS BIGINT), 0) AS runs
         |  FROM lagged),
         |t AS (
         |  SELECT a.*, tot.n_days, n_above + n_below AS nn
         |  FROM a CROSS JOIN tot),
         |t2 AS (
         |  SELECT *, runs * nn - 2 * n_above * n_below - nn AS a_stat,
         |    2 * n_above * n_below * (2 * n_above * n_below - nn) AS v_stat
         |  FROM t)
         |SELECT n_days, med, n_above, n_below, runs, a_stat, v_stat,
         |  $RunsZF AS z_micro
         |FROM t2""".stripMargin,

    "q365_pettitt" ->
      s"""WITH day AS (
         |  SELECT o_orderdate AS day, COUNT(*) AS y FROM orders GROUP BY 1),
         |ndf AS (SELECT COUNT(*) AS nd FROM day),
         |cls AS (SELECT y, COUNT(*) AS c FROM day GROUP BY 1),
         |cum AS (
         |  SELECT y, c, CAST(SUM(c) OVER (ORDER BY y
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM cls),
         |vf AS (
         |  SELECT day.day, nd, 2 * cum - c - nd AS v
         |  FROM day JOIN cum USING (y) CROSS JOIN ndf),
         |uf AS (
         |  SELECT day, nd, ROW_NUMBER() OVER (ORDER BY day) AS x,
         |    CAST(SUM(v) OVER (ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS u
         |  FROM vf),
         |cand AS (SELECT nd, x, u FROM uf WHERE x < nd),
         |kf AS (SELECT MAX(abs(u)) AS k_stat FROM cand)
         |SELECT nd AS n_days, k_stat, x AS t_star, u AS u_at_t,
         |  ${pettittSigF(Du)} AS sig_05
         |FROM cand CROSS JOIN kf WHERE abs(u) = k_stat
         |ORDER BY x LIMIT 1""".stripMargin,

    "q366_decayed_revenue" ->
      s"""WITH o AS (
         |  SELECT c_mktsegment AS mktsegment,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         |    least(greatest((1998 - year(o_orderdate)) * 12 +
         |      (12 - month(o_orderdate)), 0) // 6, 13) AS k
         |  FROM orders JOIN customer ON o_custkey = c_custkey),
         |g AS (
         |  SELECT mktsegment, COUNT(*) AS n_orders,
         |    CAST(SUM(cents) AS BIGINT) AS revenue_cents,
         |    SUM(CAST(cents AS HUGEINT) *
         |      CAST((CAST(1 AS BIGINT) << (13 - k)) AS HUGEINT)) AS wide
         |  FROM o GROUP BY 1),
         |t AS (
         |  SELECT mktsegment, n_orders, revenue_cents,
         |    CAST(wide // 8192 AS BIGINT) AS decayed_cents
         |  FROM g)
         |SELECT mktsegment, n_orders, revenue_cents, decayed_cents,
         |  CASE WHEN revenue_cents = 0 THEN NULL
         |    ELSE decayed_cents * 1000 // revenue_cents END AS recency_milli
         |FROM t ORDER BY mktsegment""".stripMargin,

    "q367_kruskal_wallis" ->
      s"""WITH cls AS (
         |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS q,
         |    COUNT(*) AS n_gv
         |  FROM lineitem GROUP BY 1, 2),
         |pool AS (
         |  SELECT q, CAST(SUM(n_gv) AS BIGINT) AS c FROM cls GROUP BY 1),
         |cum AS (
         |  SELECT q, c, CAST(SUM(c) OVER (ORDER BY q
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM pool),
         |ties AS (SELECT SUM(${Du.wide("c")} * c * c - c) AS tie_cube
         |  FROM pool),
         |grp AS (
         |  SELECT g, CAST(SUM(n_gv) AS BIGINT) AS n_g,
         |    CAST(SUM(n_gv * (2 * cum - c + 1)) AS BIGINT) AS s2_g
         |  FROM cls JOIN cum USING (q) GROUP BY 1),
         |term AS (SELECT g, n_g, ${kwSumQTermF(Du)} AS term FROM grp),
         |tot AS (
         |  SELECT COUNT(*) AS n_groups, CAST(SUM(n_g) AS BIGINT) AS n_total,
         |    SUM(term) AS sum_q
         |  FROM term),
         |h AS (SELECT *, ${kwHMilliF(Du)} AS h_milli
         |  FROM tot CROSS JOIN ties),
         |h2 AS (SELECT *, ${kwHAdjF(Du)} AS h_adj_milli,
         |  ${kwTieMilliF(Du)} AS tie_milli FROM h)
         |SELECT n_groups, n_total, tie_milli, h_milli, h_adj_milli,
         |  h_adj_milli > 5991 AS reject_95
         |FROM h2""".stripMargin,

    "q368_durbin_watson" ->
      s"""WITH day AS (
         |  SELECT o_orderdate AS day, COUNT(*) AS y FROM orders GROUP BY 1),
         |dx AS (
         |  SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS x FROM day),
         |sums AS (
         |  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
         |    CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x * x) AS BIGINT) AS sxx,
         |    CAST(SUM(x * y) AS BIGINT) AS sxy
         |  FROM dx),
         |cr AS (
         |  SELECT *, n * sxx - sx * sx AS delta,
         |    n * sxy - sx * sy AS bnum, sy * sxx - sx * sxy AS anum
         |  FROM sums),
         |e AS (
         |  SELECT day, n, delta, bnum, y * delta - anum - bnum * x AS e
         |  FROM dx CROSS JOIN cr),
         |l AS (
         |  SELECT n, delta, bnum, e, LAG(e) OVER (ORDER BY day) AS e_prev
         |  FROM e),
         |agg AS (
         |  SELECT MAX(n) AS n_days, MAX(delta) AS delta, MAX(bnum) AS bnum,
         |    SUM(CAST(e AS HUGEINT) * e) AS den_w,
         |    SUM(CASE WHEN e_prev IS NULL THEN NULL
         |      ELSE CAST(e - e_prev AS HUGEINT) * (e - e_prev) END) AS num_w
         |  FROM l),
         |fin AS (
         |  SELECT n_days, ${dwBMicroF(Du)} AS b_micro,
         |    ${dwMicroF(Du)} AS dw_micro
         |  FROM agg)
         |SELECT n_days, b_micro, dw_micro,
         |  dw_micro < 1500000 AS pos_autocorr
         |FROM fin""".stripMargin,

    "q369_ljung_box" -> {
      val sumArms = (1 to 5).map(k =>
        s"SUM(v * v_$k) AS p$k,\n" +
          s"        |    CAST(SUM(CASE WHEN rn <= $k THEN v ELSE 0 END) " +
          s"AS BIGINT) AS h$k,\n" +
          s"        |    CAST(SUM(CASE WHEN rn > nn - $k THEN v ELSE 0 END) " +
          s"AS BIGINT) AS t$k").mkString(",\n        |    ")
      val lagArms = (1 to 5).map(k => s"LAG(v, $k) OVER w AS v_$k")
        .mkString(", ")
      val rArms = (1 to 5).map(k => s"${Analytics2.pacfRF(Du, k)} AS r$k")
        .mkString(",\n        |    ")
      s"""WITH e AS (
         |  SELECT event_type, event_id, epoch_us(ts::TIMESTAMP) AS tsu,
         |    $VMilliF AS v
         |  FROM events),
         |l AS (
         |  SELECT event_type, v,
         |    $lagArms,
         |    ROW_NUMBER() OVER w AS rn,
         |    COUNT(*) OVER (PARTITION BY event_type) AS nn
         |  FROM e
         |  WINDOW w AS (PARTITION BY event_type ORDER BY tsu, event_id)),
         |sums AS (
         |  SELECT event_type, COUNT(*) AS n,
         |    CAST(SUM(v) AS BIGINT) AS sv,
         |    SUM(v * v) AS qv,
         |    $sumArms
         |  FROM l GROUP BY 1),
         |r AS (
         |  SELECT event_type, n,
         |    $rArms
         |  FROM sums),
         |q AS (SELECT *, $LbQF AS q_micro FROM r)
         |SELECT event_type, n,
         |  ${Analytics2.pacfMicroF("r1")} AS r1_micro,
         |  ${Analytics2.pacfMicroF("r2")} AS r2_micro,
         |  ${Analytics2.pacfMicroF("r3")} AS r3_micro,
         |  ${Analytics2.pacfMicroF("r4")} AS r4_micro,
         |  ${Analytics2.pacfMicroF("r5")} AS r5_micro,
         |  q_micro, $LbRejectF AS reject_95
         |FROM q ORDER BY event_type""".stripMargin
    },

    "q370_friedman" ->
      s"""WITH cell AS (
         |  SELECT CAST(year(CAST(o_orderdate AS DATE)) * 100 +
         |      month(CAST(o_orderdate AS DATE)) AS BIGINT) AS ym,
         |    o_orderpriority AS treat,
         |    CAST(SUM($CentsF) AS BIGINT) AS v
         |  FROM orders GROUP BY 1, 2),
         |k AS (SELECT COUNT(DISTINCT treat) AS k_treat FROM cell),
         |complete AS (
         |  SELECT ym FROM cell CROSS JOIN k
         |  GROUP BY ym, k_treat HAVING COUNT(*) = k_treat),
         |ranked AS (
         |  SELECT treat,
         |    2 * CAST(RANK() OVER (PARTITION BY cell.ym ORDER BY v)
         |      AS BIGINT) +
         |    COUNT(*) OVER (PARTITION BY cell.ym, v) - 1 AS s2
         |  FROM cell JOIN complete ON cell.ym = complete.ym),
         |byt AS (
         |  SELECT treat, COUNT(*) AS n_blocks,
         |    CAST(SUM(s2) AS BIGINT) AS s2_j
         |  FROM ranked GROUP BY 1),
         |tot AS (
         |  SELECT COUNT(*) AS k_treat, MAX(n_blocks) AS n_blocks,
         |    SUM(CAST(s2_j AS HUGEINT) * s2_j) AS sum_q
         |  FROM byt),
         |qf AS (SELECT k_treat, ${friedmanQF(Du)} AS q_milli FROM tot)
         |SELECT treat, n_blocks, s2_j,
         |  s2_j * 1000 // (2 * n_blocks) AS mean_rank_milli,
         |  q_milli, q_milli > 9487 AS reject_95
         |FROM byt CROSS JOIN qf ORDER BY treat""".stripMargin,

    "q371_brown_forsythe" ->
      s"""WITH cls AS (
         |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS q,
         |    COUNT(*) AS n_gv
         |  FROM lineitem GROUP BY 1, 2),
         |cum AS (
         |  SELECT g, q, n_gv,
         |    CAST(SUM(n_gv) OVER (PARTITION BY g ORDER BY q
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum,
         |    CAST(SUM(n_gv) OVER (PARTITION BY g) AS BIGINT) AS n_g
         |  FROM cls),
         |med AS (
         |  SELECT g,
         |    MAX(CASE WHEN cum >= (n_g + 1) // 2
         |      AND cum - n_gv < (n_g + 1) // 2 THEN q END) +
         |    MAX(CASE WHEN cum >= n_g // 2 + 1
         |      AND cum - n_gv < n_g // 2 + 1 THEN q END) AS m2
         |  FROM cum GROUP BY 1),
         |z AS (
         |  SELECT cls.g, n_gv, abs(2 * q - m2) AS z2
         |  FROM cls JOIN med ON cls.g = med.g),
         |grp AS (
         |  SELECT g, CAST(SUM(n_gv) AS BIGINT) AS n_g,
         |    CAST(SUM(n_gv * z2) AS BIGINT) AS s_g,
         |    CAST(SUM(n_gv * z2 * z2) AS BIGINT) AS q_g
         |  FROM z GROUP BY 1),
         |term AS (SELECT *, ${anovaTermF(Du)} AS term FROM grp),
         |tot AS (
         |  SELECT COUNT(*) AS k_groups, CAST(SUM(n_g) AS BIGINT) AS n_total,
         |    CAST(SUM(s_g) AS BIGINT) AS s_total,
         |    CAST(SUM(q_g) AS BIGINT) AS q_total,
         |    CAST(SUM(term) AS BIGINT) AS sum_sg2_over_ng
         |  FROM term),
         |ss AS (
         |  SELECT *, sum_sg2_over_ng - ${anovaGrandF(Du)} AS ss_between,
         |    q_total - sum_sg2_over_ng AS ss_within
         |  FROM tot),
         |f AS (SELECT *, ${anovaFMilliF(Du)} AS f_milli FROM ss)
         |SELECT k_groups, n_total, ss_between, ss_within, f_milli,
         |  f_milli > 2996 AS reject_95
         |FROM f""".stripMargin,

    "q372_mcnemar" ->
      s"""WITH flags AS (
         |  SELECT CASE WHEN n_chars < 300 THEN 1 ELSE 0 END AS a,
         |    CASE WHEN ${Du.size(Du.tokens("text"))} < 55
         |      THEN 1 ELSE 0 END AS b
         |  FROM documents),
         |agg AS (
         |  SELECT COUNT(*) AS n_docs,
         |    COALESCE(CAST(SUM(a * b) AS BIGINT), 0) AS both_short,
         |    COALESCE(CAST(SUM(a * (1 - b)) AS BIGINT), 0) AS b_disc,
         |    COALESCE(CAST(SUM((1 - a) * b) AS BIGINT), 0) AS c_disc
         |  FROM flags),
         |chi AS (SELECT *, ${mcnemarF(Du)} AS chi2_milli FROM agg)
         |SELECT n_docs, both_short, b_disc, c_disc, chi2_milli,
         |  chi2_milli > 3841 AS reject_95
         |FROM chi""".stripMargin,

    "q373_jonckheere" ->
      s"""WITH cls AS (
         |  SELECT CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)
         |      AS gd,
         |    CAST(l_quantity AS BIGINT) AS q, COUNT(*) AS n_gv
         |  FROM lineitem GROUP BY 1, 2),
         |byg AS (SELECT gd, CAST(SUM(n_gv) AS BIGINT) AS n_g
         |  FROM cls GROUP BY 1),
         |gstats AS (
         |  SELECT COUNT(*) AS k_groups, CAST(SUM(n_g) AS BIGINT) AS n_total,
         |    SUM(${Du.wide("n_g")} * n_g) AS sum_n2_w,
         |    SUM(${Du.wide("n_g")} * (n_g - 1)) AS c2g_w,
         |    SUM(${Du.wide("n_g")} * (n_g - 1) * (n_g - 2)) AS c3g_w,
         |    SUM(${Du.wide("n_g")} * (n_g - 1) * (2 * n_g + 5)) AS bg_w
         |  FROM byg),
         |byv AS (SELECT q, CAST(SUM(n_gv) AS BIGINT) AS t_v
         |  FROM cls GROUP BY 1),
         |vstats AS (
         |  SELECT SUM(${Du.wide("t_v")} * (t_v - 1)) AS c2v_w,
         |    SUM(${Du.wide("t_v")} * (t_v - 1) * (t_v - 2)) AS c3v_w,
         |    SUM(${Du.wide("t_v")} * (t_v - 1) * (2 * t_v + 5)) AS a_w
         |  FROM byv),
         |u AS (
         |  SELECT COALESCE(SUM(
         |    CASE WHEN a.q < b.q THEN 2 * ${Du.wide("a.n_gv")} * b.n_gv
         |      WHEN a.q = b.q THEN ${Du.wide("a.n_gv")} * b.n_gv
         |      ELSE ${Du.wide("0")} END), ${Du.wide("0")}) AS u2_w
         |  FROM cls a JOIN cls b ON a.gd < b.gd),
         |t AS (
         |  SELECT n_total, k_groups,
         |    2 * u2_w - (${Du.wide("n_total")} * n_total - sum_n2_w)
         |      AS diff_w,
         |    greatest(${Du.wide("n_total")} *
         |      ((n_total - 1) * (2 * n_total + 5)) - bg_w - a_w,
         |      ${Du.wide("0")}) AS t1_w,
         |    c3g_w * c3v_w AS c3p_w,
         |    36 * ${Du.wide("n_total")} * ((n_total - 1) * (n_total - 2))
         |      AS den3_w,
         |    c2g_w * c2v_w AS c2p_w,
         |    8 * ${Du.wide("n_total")} * (n_total - 1) AS den2_w
         |  FROM gstats CROSS JOIN vstats CROSS JOIN u),
         |v AS (
         |  SELECT n_total, k_groups, diff_w,
         |    CASE WHEN n_total < 3 THEN CAST(-1 AS DOUBLE)
         |      ELSE ${jtVDblF(Du)} END AS v_dbl,
         |    ${jtDDblF(Du)} AS d_dbl
         |  FROM t),
         |z AS (SELECT *, $JtZF AS z_micro FROM v)
         |SELECT n_total, k_groups, CAST(diff_w AS BIGINT) AS jt4_minus_mean4,
         |  z_micro,
         |  CASE WHEN z_micro IS NULL THEN NULL
         |    WHEN z_micro > 1644854 THEN 'increasing'
         |    WHEN z_micro < -1644854 THEN 'decreasing'
         |    ELSE 'none' END AS trend
         |FROM z""".stripMargin,

    "q374_cochran_q" ->
      s"""WITH act AS (
         |  SELECT DISTINCT o_custkey,
         |    CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr
         |  FROM orders
         |  WHERE year(CAST(o_orderdate AS DATE)) BETWEEN 1995 AND 1997),
         |r AS (SELECT o_custkey, COUNT(*) AS r_i FROM act GROUP BY 1),
         |rs AS (
         |  SELECT COUNT(*) AS n_subjects, CAST(SUM(r_i) AS BIGINT) AS sum_r,
         |    CAST(SUM(r_i * r_i) AS BIGINT) AS sum_r2
         |  FROM r),
         |c AS (SELECT yr, COUNT(*) AS c_j FROM act GROUP BY 1),
         |cs AS (
         |  SELECT COUNT(*) AS k_treat, SUM(${Du.wide("c_j")} * c_j) AS sum_c2
         |  FROM c),
         |q AS (
         |  SELECT n_subjects, k_treat, sum_r, sum_r2, ${cochranQF(Du)}
         |    AS q_milli
         |  FROM rs CROSS JOIN cs)
         |SELECT n_subjects, k_treat, sum_r, sum_r2, q_milli,
         |  q_milli > 5991 AS reject_95
         |FROM q""".stripMargin,

    "q375_logrank" ->
      s"""WITH subj AS (
         |  SELECT
         |    CASE WHEN CAST(l_shipdate AS DATE) <= DATE '1998-06-01'
         |      THEN date_diff('day', CAST(o_orderdate AS DATE),
         |        CAST(l_shipdate AS DATE))
         |      ELSE date_diff('day', CAST(o_orderdate AS DATE),
         |        DATE '1998-06-01') END AS obs,
         |    CASE WHEN CAST(l_shipdate AS DATE) <= DATE '1998-06-01'
         |      THEN 1 ELSE 0 END AS ev,
         |    CASE WHEN CAST(l_quantity AS BIGINT) > 25 THEN 1 ELSE 0 END
         |      AS g1
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE CAST(o_orderdate AS DATE) <= DATE '1998-06-01'),
         |steps AS (
         |  SELECT obs, COUNT(*) AS c_all, CAST(SUM(ev) AS BIGINT) AS d,
         |    CAST(SUM(g1) AS BIGINT) AS c1,
         |    CAST(SUM(ev * g1) AS BIGINT) AS d1
         |  FROM subj GROUP BY 1),
         |n AS (SELECT CAST(SUM(c_all) AS BIGINT) AS n_total,
         |  CAST(SUM(c1) AS BIGINT) AS n1_total FROM steps),
         |risk AS (
         |  SELECT obs, d, c1, d1, n_total, n1_total,
         |    n_total - CAST(SUM(c_all) OVER w AS BIGINT) + c_all AS n_risk,
         |    n1_total - CAST(SUM(c1) OVER w AS BIGINT) + c1 AS n1_risk
         |  FROM steps CROSS JOIN n
         |  WINDOW w AS (ORDER BY obs
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |terms AS (
         |  SELECT n_total, n1_total, d1,
         |    ${lrEStepF(Du)} AS e_step, ${lrVStepF(Du)} AS v_step
         |  FROM risk WHERE d > 0),
         |agg AS (
         |  SELECT MAX(n_total) AS n_total, MAX(n1_total) AS n1_total,
         |    COUNT(*) AS n_steps,
         |    CAST(SUM(d1 * 1000000) AS BIGINT) AS o1_micro,
         |    CAST(SUM(e_step) AS BIGINT) AS e1_micro,
         |    CAST(SUM(v_step) AS BIGINT) AS v_micro
         |  FROM terms),
         |z AS (SELECT *, $LrZF AS z_micro FROM agg)
         |SELECT n_total, n1_total, n_steps, o1_micro, e1_micro, v_micro,
         |  z_micro, abs(z_micro) > 1959964 AS reject_95
         |FROM z""".stripMargin,

    "q376_filter_ablation" ->
      s"""WITH f AS (
         |  SELECT ${Du.tokens("text")} AS toks, n_chars, text
         |  FROM documents),
         |g AS (
         |  SELECT ${ablF1(Du)} AS f_short, ${ablF2(Du)} AS f_repet,
         |    ${ablF3(Du)} AS f_toklen, ${ablF4(Du)} AS f_digit
         |  FROM f),
         |m AS (
         |  SELECT CAST(f_short + 2 * f_repet + 4 * f_toklen + 8 * f_digit
         |    AS BIGINT) AS mask
         |  FROM g),
         |tot AS (SELECT COUNT(*) AS n_corpus FROM m),
         |cnt AS (SELECT mask, COUNT(*) AS n_docs FROM m GROUP BY 1),
         |spine AS (
         |  SELECT UNNEST(range(0::BIGINT, 16::BIGINT)) AS mask)
         |SELECT spine.mask AS mask, spine.mask % 2 AS f_short,
         |  (spine.mask // 2) % 2 AS f_repet,
         |  (spine.mask // 4) % 2 AS f_toklen,
         |  (spine.mask // 8) % 2 AS f_digit,
         |  COALESCE(n_docs, 0) AS n_docs,
         |  COALESCE(n_docs, 0) * 1000 // n_corpus AS share_milli
         |FROM spine LEFT JOIN cnt ON spine.mask = cnt.mask CROSS JOIN tot
         |ORDER BY mask""".stripMargin,

    "q377_ktruss_peel" -> {
      val rounds = (1 to 3).map { r =>
        s"""tri$r AS (
           |  SELECT ea.pa AS a, ea.pb AS b, eb.pb AS c
           |  FROM e$r ea JOIN e$r eb ON ea.pb = eb.pa
           |  JOIN e$r ec ON ec.pa = ea.pa AND ec.pb = eb.pb),
           |sup$r AS (
           |  SELECT x AS pa, y AS pb, COUNT(*) AS sup FROM (
           |    SELECT a AS x, b AS y FROM tri$r
           |    UNION ALL SELECT a, c FROM tri$r
           |    UNION ALL SELECT b, c FROM tri$r)
           |  GROUP BY 1, 2),
           |ws$r AS (
           |  SELECT e$r.pa, e$r.pb, COALESCE(sup, 0) AS sup
           |  FROM e$r LEFT JOIN sup$r USING (pa, pb)),
           |st$r AS (
           |  SELECT CAST($r AS BIGINT) AS round, COUNT(*) AS n_edges_in,
           |    CAST(COALESCE(SUM(sup), 0) AS BIGINT) // 3 AS n_triangles,
           |    COALESCE(CAST(SUM(CASE WHEN sup >= 2 THEN 1 ELSE 0 END)
           |      AS BIGINT), 0) AS n_edges_kept
           |  FROM ws$r),
           |e${r + 1} AS (SELECT pa, pb FROM ws$r WHERE sup >= 2)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH p AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |e1 AS (
         |  SELECT a.pk AS pa, b.pk AS pb
         |  FROM p a JOIN p b ON a.ok = b.ok AND a.pk < b.pk
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |$rounds
         |SELECT round, n_edges_in, n_triangles, n_edges_kept FROM (
         |  SELECT * FROM st1 UNION ALL SELECT * FROM st2
         |  UNION ALL SELECT * FROM st3)
         |ORDER BY round""".stripMargin
    },

    "q378_weekday_decompose" ->
      s"""WITH day AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS y
         |  FROM orders GROUP BY 1),
         |ma AS (
         |  SELECT day, y, CAST(SUM(y) OVER w AS BIGINT) AS ma7,
         |    COUNT(*) OVER w AS cnt7
         |  FROM day
         |  WINDOW w AS (ORDER BY day
         |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         |det AS (
         |  SELECT CAST(isodow(day) AS BIGINT) AS dow, 7 * y - ma7 AS v
         |  FROM ma WHERE cnt7 = 7),
         |grp AS (
         |  SELECT dow, COUNT(*) AS n_g, CAST(SUM(v) AS BIGINT) AS s_g,
         |    CAST(SUM(v * v) AS BIGINT) AS q_g
         |  FROM det GROUP BY 1),
         |t1 AS (
         |  SELECT *, ${anovaTermF(Du)} AS term,
         |    ${signedMeanMilliF(Du)} AS mean_detr7_milli
         |  FROM grp),
         |tot AS (
         |  SELECT COUNT(*) AS k_groups, CAST(SUM(n_g) AS BIGINT) AS n_total,
         |    CAST(SUM(s_g) AS BIGINT) AS s_total,
         |    CAST(SUM(q_g) AS BIGINT) AS q_total,
         |    CAST(SUM(term) AS BIGINT) AS sum_sg2_over_ng
         |  FROM t1),
         |ss AS (
         |  SELECT *, sum_sg2_over_ng - ${anovaGrandF(Du)} AS ss_between,
         |    q_total - sum_sg2_over_ng AS ss_within
         |  FROM tot),
         |fin AS (
         |  SELECT ss_between, ss_within, ${anovaFMilliF(Du)} AS f_milli,
         |    ${strengthMilliF(Du)} AS strength_milli
         |  FROM ss)
         |SELECT dow, n_g, mean_detr7_milli, ss_between, ss_within,
         |  f_milli, strength_milli
         |FROM t1 CROSS JOIN fin ORDER BY dow""".stripMargin,

    "q379_t_closeness" ->
      s"""WITH base AS (
         |  SELECT c_nationkey AS nk, c_mktsegment AS seg,
         |    o_orderpriority AS pr
         |  FROM orders JOIN customer ON o_custkey = c_custkey),
         |cls AS (
         |  SELECT nk, seg, pr, COUNT(*) AS n_gi FROM base GROUP BY 1, 2, 3),
         |levels AS (SELECT DISTINCT pr FROM cls),
         |groups AS (
         |  SELECT nk, seg, CAST(SUM(n_gi) AS BIGINT) AS n_g
         |  FROM cls GROUP BY 1, 2),
         |gl AS (SELECT pr, CAST(SUM(n_gi) AS BIGINT) AS n_i
         |  FROM cls GROUP BY 1),
         |globc AS (
         |  SELECT pr, CAST(SUM(n_i) OVER (ORDER BY pr
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_i
         |  FROM gl),
         |tot AS (SELECT CAST(SUM(n_i) AS BIGINT) AS n_total,
         |  COUNT(*) AS m_levels FROM gl),
         |spine AS (
         |  SELECT g.nk, g.seg, l.pr, g.n_g, COALESCE(c.n_gi, 0) AS n_gi
         |  FROM groups g CROSS JOIN levels l
         |  LEFT JOIN cls c ON c.nk = g.nk AND c.seg = g.seg AND c.pr = l.pr),
         |cum AS (
         |  SELECT nk, seg, pr, n_g,
         |    CAST(SUM(n_gi) OVER (PARTITION BY nk, seg ORDER BY pr
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_gi
         |  FROM spine),
         |j AS (
         |  SELECT nk, seg, n_g, m_levels, n_total,
         |    abs(cum_gi * n_total - cum_i * n_g) AS absdiff
         |  FROM cum JOIN globc USING (pr) CROSS JOIN tot),
         |emd AS (
         |  SELECT nk, seg, MAX(n_g) AS n_g,
         |    CAST(SUM(absdiff) AS BIGINT) AS sum_absdiff,
         |    MAX(m_levels) AS m_levels, MAX(n_total) AS n_total
         |  FROM j GROUP BY 1, 2),
         |e2 AS (SELECT *, ${tClosenessF(Du)} AS emd_milli FROM emd),
         |t AS (SELECT MAX(emd_milli) AS t_milli FROM e2)
         |SELECT CAST(nk AS BIGINT) AS nationkey, seg, n_g, emd_milli,
         |  t_milli, emd_milli <= 200 AS meets_t_200
         |FROM e2 CROSS JOIN t
         |ORDER BY emd_milli DESC, nationkey, seg
         |LIMIT 20""".stripMargin,

    "q380_zipf_check" ->
      s"""WITH b AS (SELECT ${Du.tokens("text")} AS toks FROM documents),
         |tk AS (SELECT unnest(toks) AS t FROM b),
         |vf AS (SELECT t, COUNT(*) AS f FROM tk GROUP BY 1),
         |top AS (SELECT t, f FROM vf ORDER BY f DESC, t LIMIT 1024),
         |rnk AS (
         |  SELECT t, f, CAST(ROW_NUMBER() OVER (ORDER BY f DESC, t)
         |    AS BIGINT) AS r
         |  FROM top),
         |rf AS (SELECT r, t, f, r * f AS rf FROM rnk),
         |r1 AS (SELECT rf AS rf_1 FROM rf WHERE r = 1)
         |SELECT r, t, f, rf, rf * 1000 // rf_1 AS rf_vs_r1_milli
         |FROM rf CROSS JOIN r1
         |WHERE r IN (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)
         |ORDER BY r""".stripMargin,

    "q381_poisson_bootstrap" ->
      s"""WITH o AS (
         |  SELECT o_orderkey, $CentsF AS cents FROM orders),
         |f AS (
         |  SELECT COUNT(*) AS n_orders,
         |    CAST(SUM(cents) AS BIGINT) // COUNT(*) AS mean_cents
         |  FROM o),
         |e AS (
         |  SELECT o_orderkey, cents,
         |    UNNEST(range(0::BIGINT, 40::BIGINT)) AS b
         |  FROM o),
         |uf AS (
         |  SELECT cents, b,
         |    ${Du.hash64("concat('boot:', CAST(b AS VARCHAR), ':', " +
                "CAST(o_orderkey AS VARCHAR))")} % 1000000 AS u
         |  FROM e),
         |wf AS (SELECT b, cents, $BootWF AS w FROM uf),
         |g AS (
         |  SELECT b, CAST(SUM(w) AS BIGINT) AS n_b,
         |    CAST(SUM(w * cents) AS BIGINT) AS s_b
         |  FROM wf GROUP BY 1),
         |m AS (
         |  SELECT b, CASE WHEN n_b = 0 THEN NULL ELSE s_b // n_b END
         |    AS mean_b
         |  FROM g),
         |r AS (
         |  SELECT b, mean_b,
         |    ROW_NUMBER() OVER (ORDER BY mean_b ASC NULLS LAST, b) AS rk
         |  FROM m),
         |ci AS (
         |  SELECT MAX(CASE WHEN rk = 2 THEN mean_b END) AS lo_cents,
         |    MAX(CASE WHEN rk = 39 THEN mean_b END) AS hi_cents,
         |    COUNT(*) AS n_resamples
         |  FROM r)
         |SELECT n_orders, mean_cents, n_resamples, lo_cents, hi_cents,
         |  hi_cents - lo_cents AS width_cents
         |FROM ci CROSS JOIN f""".stripMargin,

    "q382_partition_advisor" ->
      s"""WITH kv AS (
         |  SELECT 'l_shipdate' AS col,
         |    CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS v FROM lineitem
         |  UNION ALL SELECT 'ship_month',
         |    CAST(year(CAST(l_shipdate AS DATE)) * 100 +
         |      month(CAST(l_shipdate AS DATE)) AS VARCHAR) FROM lineitem
         |  UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem
         |  UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem
         |  UNION ALL SELECT 'l_partkey', CAST(l_partkey AS VARCHAR)
         |    FROM lineitem
         |  UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR)
         |    FROM lineitem),
         |c AS (SELECT col, v, COUNT(*) AS cnt FROM kv GROUP BY 1, 2),
         |g AS (
         |  SELECT col, COUNT(*) AS ndv, CAST(SUM(cnt) AS BIGINT) AS n_rows,
         |    MAX(cnt) AS max_per_value
         |  FROM c GROUP BY 1),
         |t AS (
         |  SELECT *, n_rows // ndv AS avg_per_value,
         |    max_per_value * ndv * 1000 // n_rows AS balance_milli,
         |    greatest(n_rows // 25000, 1) AS target_files
         |  FROM g)
         |SELECT col, ndv, n_rows, avg_per_value, max_per_value,
         |  balance_milli,
         |  abs(ndv - target_files) * 1000 // greatest(ndv, target_files)
         |    AS fit_milli,
         |  balance_milli <= 5000 AND
         |    abs(ndv - target_files) * 1000 // greatest(ndv, target_files)
         |      <= 900 AS recommended
         |FROM t ORDER BY col""".stripMargin,

    "q383_profile_drift" ->
      s"""WITH kv AS (
         |  SELECT CASE WHEN CAST(l_shipdate AS DATE) >= DATE '1995-06-01'
         |      THEN 1 ELSE 0 END AS late,
         |    'quantity' AS col, CAST(l_quantity AS BIGINT) AS v
         |  FROM lineitem
         |  UNION ALL SELECT
         |    CASE WHEN CAST(l_shipdate AS DATE) >= DATE '1995-06-01'
         |      THEN 1 ELSE 0 END,
         |    'price_cents',
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |  FROM lineitem
         |  UNION ALL SELECT
         |    CASE WHEN CAST(l_shipdate AS DATE) >= DATE '1995-06-01'
         |      THEN 1 ELSE 0 END,
         |    'discount_pct',
         |    CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)
         |  FROM lineitem
         |  UNION ALL SELECT
         |    CASE WHEN CAST(l_shipdate AS DATE) >= DATE '1995-06-01'
         |      THEN 1 ELSE 0 END,
         |    'tax_pct', CAST(CAST(l_tax AS DECIMAL(12,2)) * 100 AS BIGINT)
         |  FROM lineitem),
         |c AS (
         |  SELECT col, late, v, COUNT(*) AS cnt FROM kv GROUP BY 1, 2, 3),
         |per AS (
         |  SELECT col, late, COUNT(*) AS ndv, CAST(SUM(cnt) AS BIGINT) AS n,
         |    CAST(SUM(v * cnt) AS BIGINT) AS sv
         |  FROM c GROUP BY 1, 2),
         |a AS (SELECT col, ndv AS ndv_a, n AS n_a, sv AS sv_a
         |  FROM per WHERE late = 0),
         |b AS (SELECT col, ndv AS ndv_b, n AS n_b, sv AS sv_b
         |  FROM per WHERE late = 1)
         |SELECT col, n_a, n_b, ndv_a, ndv_b,
         |  CAST(${Du.intDiv(Du.wide("sv_a") + " * 1000", "n_a")} AS BIGINT)
         |    AS mean_a_milli,
         |  CAST(${Du.intDiv(Du.wide("sv_b") + " * 1000", "n_b")} AS BIGINT)
         |    AS mean_b_milli,
         |  CASE WHEN sv_a = 0 THEN NULL ELSE
         |    CAST(${Du.intDiv(
                s"abs(${Du.wide("sv_b")} * n_a - ${Du.wide("sv_a")} * n_b) " +
                  "* 1000",
                "(" + Du.wide("sv_a") + " * n_b)")} AS BIGINT) END
         |    AS mean_drift_milli,
         |  abs(ndv_b - ndv_a) * 1000 // greatest(ndv_a, 1)
         |    AS ndv_drift_milli
         |FROM a JOIN b USING (col) ORDER BY col""".stripMargin,

    "q384_skew_advisor" ->
      s"""WITH kv AS (
         |  SELECT 'l_orderkey' AS key_col, CAST(l_orderkey AS VARCHAR) AS v
         |  FROM lineitem
         |  UNION ALL SELECT 'l_partkey', CAST(l_partkey AS VARCHAR)
         |  FROM lineitem
         |  UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR)
         |  FROM lineitem),
         |c AS (SELECT key_col, v, COUNT(*) AS cnt FROM kv GROUP BY 1, 2),
         |g AS (
         |  SELECT key_col, COUNT(*) AS ndv,
         |    CAST(SUM(cnt) AS BIGINT) AS n_rows, MAX(cnt) AS max_cnt
         |  FROM c GROUP BY 1),
         |t AS (
         |  SELECT *, max_cnt * ndv * 1000 // n_rows AS skew_milli,
         |    greatest((max_cnt * 32 + n_rows - 1) // n_rows, 1) AS salt_rec
         |  FROM g)
         |SELECT key_col, ndv, n_rows, max_cnt, skew_milli, salt_rec,
         |  salt_rec > 1 AS needs_salt
         |FROM t ORDER BY key_col""".stripMargin,

    "q386_harmonic_centrality" ->
      s"""WITH p AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |e AS (
         |  SELECT a.pk AS pa, b.pk AS pb
         |  FROM p a JOIN p b ON a.ok = b.ok AND a.pk < b.pk
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |sym AS (SELECT pa, pb FROM e UNION SELECT pb, pa FROM e),
         |seeds AS (
         |  SELECT pa AS node FROM sym GROUP BY 1
         |  ORDER BY COUNT(*) DESC, pa LIMIT 50),
         |h1 AS (
         |  SELECT node, pb AS v FROM sym JOIN seeds ON sym.pa = seeds.node),
         |h2 AS (
         |  SELECT node, v FROM (
         |    SELECT DISTINCT h1.node AS node, sym.pb AS v
         |    FROM h1 JOIN sym ON h1.v = sym.pa) t
         |  WHERE node <> v AND NOT EXISTS (
         |    SELECT 1 FROM h1 x WHERE x.node = t.node AND x.v = t.v)),
         |h3 AS (
         |  SELECT node, v FROM (
         |    SELECT DISTINCT h2.node AS node, sym.pb AS v
         |    FROM h2 JOIN sym ON h2.v = sym.pa) t
         |  WHERE node <> v AND NOT EXISTS (
         |    SELECT 1 FROM h1 x WHERE x.node = t.node AND x.v = t.v)
         |  AND NOT EXISTS (
         |    SELECT 1 FROM h2 y WHERE y.node = t.node AND y.v = t.v)),
         |c1 AS (SELECT node, COUNT(*) AS n1 FROM h1 GROUP BY 1),
         |c2 AS (SELECT node, COUNT(*) AS n2 FROM h2 GROUP BY 1),
         |c3 AS (SELECT node, COUNT(*) AS n3 FROM h3 GROUP BY 1)
         |SELECT c1.node AS node, n1, COALESCE(n2, 0) AS n2,
         |  COALESCE(n3, 0) AS n3,
         |  6 * n1 + 3 * COALESCE(n2, 0) + 2 * COALESCE(n3, 0) AS h6
         |FROM c1 LEFT JOIN c2 ON c1.node = c2.node
         |LEFT JOIN c3 ON c1.node = c3.node
         |ORDER BY h6 DESC, node LIMIT 30""".stripMargin,

    "q387_join_size_sketch" ->
      s"""WITH freq AS (
         |  SELECT l_partkey AS k, COUNT(*) AS f FROM lineitem GROUP BY 1),
         |fh AS (
         |  SELECT k, f,
         |    ${Du.hash64("concat('jsz:', CAST(k AS VARCHAR))")} AS h
         |  FROM freq),
         |exact AS (
         |  SELECT COUNT(*) AS ndv_exact,
         |    SUM(CAST(f AS HUGEINT) * f) AS f2_exact_w
         |  FROM fh),
         |samp AS (SELECT * FROM fh ORDER BY h, k LIMIT 256),
         |est AS (
         |  SELECT COUNT(*) AS k_samp, MAX(h) AS h_k,
         |    SUM(CAST(f AS HUGEINT) * f) AS f2_samp_w
         |  FROM samp),
         |e2 AS (
         |  SELECT *, CASE WHEN h_k <= 0 THEN NULL ELSE
         |    CAST((CAST(k_samp - 1 AS HUGEINT) * 1152921504606846976 // h_k)
         |      AS BIGINT) END AS d_est
         |  FROM est),
         |e3 AS (
         |  SELECT *, CAST((CAST(f2_samp_w AS HUGEINT) * d_est // k_samp)
         |    AS BIGINT) AS f2_est
         |  FROM e2),
         |fin AS (
         |  SELECT ndv_exact, k_samp, d_est,
         |    CAST(f2_exact_w AS BIGINT) AS f2_exact, f2_est
         |  FROM e3 CROSS JOIN exact)
         |SELECT ndv_exact, k_samp, d_est, f2_exact, f2_est,
         |  CASE WHEN f2_exact = 0 THEN NULL ELSE
         |    abs(f2_est - f2_exact) * 1000 // f2_exact END AS err_milli,
         |  CASE WHEN f2_exact = 0 THEN NULL ELSE
         |    abs(f2_est - f2_exact) * 1000 // f2_exact END <= 500
         |    AS within_50pct
         |FROM fin""".stripMargin)
}
