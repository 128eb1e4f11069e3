package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.PortableSql

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
  private[queries] val VMilliF =
    "CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT)"

  private val Du = PortableSql.Duck

  /** The shared Pearson-from-exact-sums formula — identical IEEE text
    * on both engines (every input is an exact BIGINT; the whole float
    * tail is one shared op sequence ending in a floor quantization).
    * The zero-variance guard runs in the SAME double text as the
    * denominator (n·Σy² and (Σy)² overflow BIGINT at ~10⁹-dollar day
    * sums, so an integer guard can't exist; because the guard and the
    * sqrt argument are one shared expression, `> 0` here is exactly
    * "the denominator is nonzero" on both engines).
    */
  private val VarXF =
    "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - " +
      "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
  private val VarYF =
    "CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - " +
      "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
  private val RMicroF =
    s"CASE WHEN $VarXF <= CAST(0 AS DOUBLE) OR $VarYF <= CAST(0 AS DOUBLE) " +
      "THEN NULL " +
      "ELSE CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - " +
      "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      s"(sqrt($VarXF) * sqrt($VarYF)) * " +
      "CAST(1000000 AS DOUBLE)) AS BIGINT) END"

  // ---- shared IEEE formula texts (defined ONCE, referenced by both
  // the Spark query and the DuckDB oracle — the RMicroF discipline;
  // a second copy is how bit-exactness silently dies) --------------

  /** q329/q359's z-normalized SAX symbol over (rev_c, s1, s2, nd) —
    * dialect-aware because s2 (the DECIMAL/HUGEINT second moment)
    * must surface through the portable wide→double (DuckDB's
    * HUGEINT→DOUBLE cast double-rounds above 2⁶⁴); everything else
    * in the text is engine-identical.
    */
  private val SaxMF = "CAST(s1 AS DOUBLE) / CAST(nd AS DOUBLE)"
  private def saxSdF(dl: graft.functions.SqlDialect) =
    s"sqrt(${dl.wideToDouble("s2")} / CAST(nd AS DOUBLE) - " +
      s"($SaxMF) * ($SaxMF))"
  private def saxSymF(dl: graft.functions.SqlDialect) =
    s"CASE WHEN ${saxSdF(dl)} <= CAST(0 AS DOUBLE) THEN 'b' " +
      s"WHEN (CAST(rev_c AS DOUBLE) - $SaxMF) / ${saxSdF(dl)} < CAST(-0.43 AS DOUBLE) THEN 'a' " +
      s"WHEN (CAST(rev_c AS DOUBLE) - $SaxMF) / ${saxSdF(dl)} < CAST(0.43 AS DOUBLE) THEN 'b' " +
      "ELSE 'c' END"

  /** q335's Welch-t over (n1, s1, q1, n2, s2, q2), micro-quantized. */
  private val WelchMvF =
    "CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) - " +
      "CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)"
  private val WelchVaF =
    "(CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / " +
      "CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - CAST(1 AS DOUBLE)) / " +
      "CAST(n1 AS DOUBLE)"
  private val WelchVbF =
    "(CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / " +
      "CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - CAST(1 AS DOUBLE)) / " +
      "CAST(n2 AS DOUBLE)"
  private val WelchTF =
    s"CASE WHEN n1 <= 1 OR n2 <= 1 OR ($WelchVaF) + ($WelchVbF) <= " +
      "CAST(0 AS DOUBLE) THEN NULL ELSE " +
      s"CAST(floor(abs(($WelchMvF) / sqrt(($WelchVaF) + ($WelchVbF))) * " +
      "CAST(1000000 AS DOUBLE)) AS BIGINT) END"

  /** q339's per-token z-score over (r, ns, sr, srr). */
  private val StyMuF = "CAST(sr AS DOUBLE) / CAST(ns AS DOUBLE)"
  private val StySdF =
    s"sqrt(CAST(srr AS DOUBLE) / CAST(ns AS DOUBLE) - ($StyMuF) * ($StyMuF))"
  private def styZF(r: String): String =
    s"CASE WHEN $StySdF <= CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE) " +
      s"ELSE (CAST($r AS DOUBLE) - $StyMuF) / $StySdF END"

  /** q360's Durbin–Levinson family over (n, sv, qv, p_k, h_k, t_k) —
    * dialect-aware because the second-moment lanes (qv, p_k) ride
    * DECIMAL(38,0)/HUGEINT and must surface through the portable
    * wide→double. All inputs non-negative by construction.
    */
  private[queries] val PacfMF = "CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)"
  private[queries] def pacfC0F(dl: graft.functions.SqlDialect) =
    s"${dl.wideToDouble("qv")} - (CAST(sv AS DOUBLE) * " +
      "CAST(sv AS DOUBLE)) / CAST(n AS DOUBLE)"
  private[queries] def pacfCkF(dl: graft.functions.SqlDialect, k: Int) =
    s"${dl.wideToDouble(s"p$k")} - ($PacfMF) * (CAST(2 AS DOUBLE) * " +
      s"CAST(sv AS DOUBLE) - CAST(h$k AS DOUBLE) - CAST(t$k AS DOUBLE)) " +
      s"+ CAST(n - $k AS DOUBLE) * ($PacfMF) * ($PacfMF)"
  private[queries] def pacfRF(dl: graft.functions.SqlDialect, k: Int) =
    s"CASE WHEN ${pacfC0F(dl)} <= CAST(0 AS DOUBLE) THEN NULL " +
      s"ELSE (${pacfCkF(dl, k)}) / (${pacfC0F(dl)}) END"
  private val Phi22F =
    "CASE WHEN CAST(1 AS DOUBLE) - r1 * r1 = CAST(0 AS DOUBLE) " +
      "THEN NULL ELSE (r2 - r1 * r1) / (CAST(1 AS DOUBLE) - r1 * r1) END"
  private val Phi21F = "r1 * (CAST(1 AS DOUBLE) - phi22)"
  private val Phi33F =
    "CASE WHEN CAST(1 AS DOUBLE) - phi21 * r1 - phi22 * r2 = " +
      "CAST(0 AS DOUBLE) THEN NULL " +
      "ELSE (r3 - phi21 * r2 - phi22 * r1) / " +
      "(CAST(1 AS DOUBLE) - phi21 * r1 - phi22 * r2) END"
  private[queries] def pacfMicroF(c: String) =
    s"CASE WHEN $c IS NULL THEN NULL " +
      s"ELSE CAST(floor($c * CAST(1000000 AS DOUBLE)) AS BIGINT) END"

  /** q350's binomial order-statistic rank targets over n. */
  private val CiZsF = "CAST(1.959964 AS DOUBLE) * sqrt(CAST(n AS DOUBLE))"
  private val CiLoF = s"greatest(CAST(1 AS BIGINT), " +
    s"CAST(floor((CAST(n AS DOUBLE) - $CiZsF) / CAST(2 AS DOUBLE)) AS BIGINT))"
  private val CiHiF = s"least(n, " +
    s"CAST(ceil((CAST(n AS DOUBLE) + $CiZsF) / CAST(2 AS DOUBLE)) AS BIGINT) + 1)"

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
      a.join(broadcast(b), col("nka") < col("nkb"))
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
    // energy at three scales (day-pair, 2-day, 4-day) per block. The
    // day frame is bounded-cardinality (one row per calendar day) so
    // its global row_number window is bounded by construction;
    // everything below it is one map-side-combined rollup and one
    // 8-way conditional pivot. Squares of 4-day cent sums clear 2⁶³
    // at ~10⁹ cents/day (the 10× probe caught the BIGINT version),
    // so the energy lanes ride DECIMAL(38,0)/HUGEINT and surface as
    // the exact integer's double rounding — identical on both
    // engines at any magnitude.
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
          expr("CAST(CAST(v0-v1 AS DECIMAL(19,0)) * (v0-v1) + " +
            "CAST(v2-v3 AS DECIMAL(19,0)) * (v2-v3) + " +
            "CAST(v4-v5 AS DECIMAL(19,0)) * (v4-v5) + " +
            "CAST(v6-v7 AS DECIMAL(19,0)) * (v6-v7) AS DOUBLE)").as("e1_cc"),
          expr("CAST(CAST((v0+v1)-(v2+v3) AS DECIMAL(19,0)) * " +
            "((v0+v1)-(v2+v3)) + " +
            "CAST((v4+v5)-(v6+v7) AS DECIMAL(19,0)) * " +
            "((v4+v5)-(v6+v7)) AS DOUBLE)").as("e2_cc"),
          expr("CAST(CAST((v0+v1+v2+v3)-(v4+v5+v6+v7) AS DECIMAL(19,0)) * " +
            "((v0+v1+v2+v3)-(v4+v5+v6+v7)) AS DOUBLE)").as("e3_cc"))
        .orderBy("blk")
    },

    // Lead/lag cross-correlation between order intake (daily order
    // count by o_orderdate) and shipped revenue (daily whole-dollar
    // revenue by l_shipdate) at lags −3..+3: both series collapse to
    // bounded day frames via map-side-combined aggregates, the lag
    // alignment is a 7-way explode + ONE hash equi-join on the shifted
    // date (never 7 joins, never a window), and each lag's Pearson is
    // computed from exact BIGINT sums through the one shared IEEE
    // formula. Whole-dollar quantization keeps Σy² inside BIGINT at
    // 100 TB-ish daily magnitudes (~10⁶ $/day → Σy² ~ 10¹⁵).
    "q321_xcorr_lags" -> { (s, d) =>
      val fx = Tables.orders(s, d)
        .groupBy(col("o_orderdate").as("day"))
        .agg(count(lit(1)).as("xn"))
      val fy = Tables.lineitem(s, d)
        .groupBy(col("l_shipdate").as("day"))
        .agg(expr(s"sum($CentsF) div 100").as("yd"))
      val lagged = fy
        .select(col("day"), col("yd"),
          explode(expr("sequence(-3, 3)")).as("k"))
        .withColumn("xday", expr("date_sub(day, k)"))
      lagged
        .join(fx.select(col("day").as("xday"), col("xn")), "xday")
        .groupBy("k")
        // Σy² rides the DECIMAL(38,0) lane: daily dollar sums reach
        // ~10⁸ at 10× sf0.1 and their squares sum past 2⁶³ (the 10×
        // probe caught the BIGINT version overflowing); the value is
        // only ever consumed through CAST(syy AS DOUBLE)
        .agg(count(lit(1)).as("n"), sum("xn").as("sx"), sum("yd").as("sy"),
          sum(expr("xn * xn")).as("sxx"),
          sum(expr("CAST(yd AS DECIMAL(19,0)) * CAST(yd AS DECIMAL(19,0))"))
            .as("syy_w"),
          sum(expr("xn * yd")).as("sxy"))
        // the wide moment surfaces ONCE through the portable
        // wide→double; RMicroF's CAST(syy AS DOUBLE) is then an
        // identity on an already-double column on both engines
        .withColumn("syy", expr(
          graft.functions.PortableSql.Spark.wideToDouble("syy_w")))
        .withColumn("r_micro", expr(RMicroF))
        .select(col("k").cast("long").as("k"), col("n"), col("sx"),
          col("sy"), col("sxy"), col("r_micro"))
        .orderBy("k")
    },

    // Simpson diversity of each source's token distribution — the
    // no-transcendentals diversity index (probability two random
    // tokens differ), exact as the integer rational
    // (N(N−1) − Σnᵢ(nᵢ−1)) / (N(N−1)) in micro units. Rides the same
    // (source, token) count aggregate as q247's hapax rate; nothing
    // beyond two map-side-combined aggregations ever shuffles. HONEST
    // CEILING: (N(N−1))·10⁶ needs N ≲ 3·10⁶ tokens per source in the
    // BIGINT lane — past that the ratio lane moves to DECIMAL(38,0).
    "q322_simpson_diversity" -> { (s, d) =>
      TextOps.docsWithToks(s, d)
        .select(col("source"), explode(col("toks")).as("t"))
        .groupBy("source", "t").agg(count(lit(1)).as("n"))
        .groupBy("source")
        .agg(count(lit(1)).as("vocab"), sum("n").as("n_tokens"),
          sum(expr("n * (n - 1)")).as("s2"))
        .withColumn("simpson_micro", expr(
          "CASE WHEN n_tokens <= 1 THEN NULL ELSE " +
            "(n_tokens * (n_tokens - 1) - s2) * 1000000 div " +
            "(n_tokens * (n_tokens - 1)) END"))
        .select("source", "n_tokens", "vocab", "s2", "simpson_micro")
        .orderBy("source")
    },

    // Chao1 vocabulary-richness estimate per source: how many distinct
    // tokens the corpus WOULD show at infinite sampling, from the
    // observed vocabulary plus the bias-corrected f₁²-term
    // (D + f₁(f₁−1)/(2(f₂+1)) — the +1 makes the estimator total, no
    // zero guard needed). The capture-recapture view of corpus
    // coverage: singleton/doubleton counts ride the same (source,
    // token) aggregate as q247/q322, and the estimate is exact milli.
    "q323_chao1_vocab" -> { (s, d) =>
      TextOps.docsWithToks(s, d)
        .select(col("source"), explode(col("toks")).as("t"))
        .groupBy("source", "t").agg(count(lit(1)).as("n"))
        .groupBy("source")
        .agg(count(lit(1)).as("vocab"),
          sum(expr("CASE WHEN n = 1 THEN 1 ELSE 0 END")).as("f1"),
          sum(expr("CASE WHEN n = 2 THEN 1 ELSE 0 END")).as("f2"))
        .withColumn("chao1_milli", expr(
          "vocab * 1000 + f1 * (f1 - 1) * 1000 div (2 * (f2 + 1))"))
        .withColumn("undetected_milli", expr("chao1_milli - vocab * 1000"))
        .select("source", "vocab", "f1", "f2", "chao1_milli",
          "undetected_milli")
        .orderBy("source")
    },

    // K-minimum-values NDV estimator vs exact truth, per event_type:
    // the k-th smallest 60-bit portable hash of the key gives
    // est = (k−1)·2⁶⁰ / h_k — the mergeable bottom-k sketch whose
    // union is just "merge and keep the k smallest" (the KMV property
    // the q193 HLL gate proves for HLL). The candidate pass is a
    // rank ≤ k filter on the distinct-hash frame — WindowGroupLimit
    // keeps at most k rows per partition in flight — and the exact
    // lane is one count(distinct-frame) aggregate. The estimate lane
    // cannot overflow: h_k ≥ k−1 by pigeonhole (k distinct
    // non-negative hashes), so (k−1)·2⁶⁰ div h_k ≤ 2⁶⁰ < 2⁶³.
    "q324_kmv_distinct" -> { (s, d) =>
      val k = 64
      val hF =
        "portable_hash64(concat('kmv:', cast(user_id as string)))"
      graft.functions.GraftFunctions.ensureRegistered(s)
      val dh = Tables.events(s, d)
        .select(col("event_type"), expr(hF).as("h"))
        .distinct()
      val exact = dh.groupBy("event_type").agg(count(lit(1)).as("d_exact"))
      val bottom = graft.operators.BottomK
        .perGroup(dh, Seq("event_type"), Seq(col("h")), k)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_k"), max("h").as("h_k"))
      exact.join(bottom, "event_type")
        .withColumn("est_ndv", expr(
          s"CASE WHEN n_k < $k THEN n_k ELSE " +
            s"CAST(CAST(${k - 1} AS DECIMAL(38,0)) * 1152921504606846976 " +
            "div h_k AS BIGINT) END"))
        .withColumn("err_milli", expr(
          "abs(est_ndv - d_exact) * 1000 div d_exact"))
        .select("event_type", "d_exact", "n_k", "h_k", "est_ndv",
          "err_milli")
        .orderBy("event_type")
    },

    // Deterministic bottom-k stratified sample + bias readout: each
    // (source, lang) stratum keeps its k=50 docs with the smallest
    // portable hash — a distributed "reservoir" with NO randomness
    // and NO coordination (any executor can decide membership from
    // the hash alone; merging partial bottom-k sets is associative),
    // which is the 100 TB sampling shape. The rank ≤ k filter is a
    // WindowGroupLimit heap; the readout compares stratum mean
    // n_chars in the full frame vs the sample, exact milli.
    "q325_bottomk_sample" -> { (s, d) =>
      graft.functions.GraftFunctions.ensureRegistered(s)
      val base = Tables.documents(s, d)
        .select(col("source"), col("lang"), col("doc_id"), col("n_chars"),
          expr("portable_hash64(concat('smp:', cast(doc_id as string)))")
            .as("h"))
      val full = base.groupBy("source", "lang")
        .agg(count(lit(1)).as("n_total"), sum("n_chars").as("chars_sum"))
      val samp = graft.operators.BottomK
        .perGroup(base, Seq("source", "lang"), Seq(col("h"), col("doc_id")), 50)
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_sample"), sum("n_chars").as("chars_s"))
      full.join(samp, Seq("source", "lang"))
        .withColumn("mean_full_milli", expr("chars_sum * 1000 div n_total"))
        .withColumn("mean_samp_milli", expr("chars_s * 1000 div n_sample"))
        .withColumn("bias_milli", expr("mean_samp_milli - mean_full_milli"))
        .select("source", "lang", "n_total", "n_sample", "mean_full_milli",
          "mean_samp_milli", "bias_milli")
        .orderBy("source", "lang")
    },

    // One-way ANOVA of order value across order priorities, fully in
    // exact integer lanes: per-group Σv and Σv² in whole dollars
    // (dollar quantization keeps Σv² inside BIGINT to ~10⁹ rows),
    // SSB/SSW via per-group floor divisions in the DECIMAL(38,0)
    // (Spark) / HUGEINT (DuckDB) lane — S_g² div n_g is exact floor
    // division on both engines (never DECIMAL `//` on the DuckDB
    // side, which rounds) — and F in milli by one cross-multiplied
    // integer division. The floor in each SS term biases by < 1 part
    // in 10¹⁴ and is applied identically on both engines. One
    // map-side-combined rollup to a 5-row frame; everything after is
    // scalar.
    "q326_anova_f" -> { (s, d) =>
      // dollars via the exact cents lane + floor division (a direct
      // DECIMAL→BIGINT cast truncates on Spark but ROUNDS on DuckDB)
      val vF =
        "(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 100)"
      val g = Tables.orders(s, d)
        .select(col("o_orderpriority").as("grp"), expr(vF).as("v"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n_g"), sum("v").as("s_g"),
          sum(expr("v * v")).as("q_g"))
      g.agg(
          count(lit(1)).as("k_groups"),
          sum("n_g").as("n_total"),
          sum("s_g").as("s_total"),
          sum("q_g").as("q_total"),
          sum(expr("CAST(CAST(s_g AS DECIMAL(19,0)) * s_g div n_g AS BIGINT)"))
            .as("sum_sg2_over_ng"))
        .withColumn("ss_between", expr(
          "sum_sg2_over_ng - CAST(CAST(s_total AS DECIMAL(19,0)) * s_total " +
            "div n_total AS BIGINT)"))
        .withColumn("ss_within", expr("q_total - sum_sg2_over_ng"))
        // greatest(ss_between, 0): true SSB ≥ 0 but the k per-group
        // floors can push the computed value to ≈ −k when group means
        // coincide, and a negative numerator would hit the div-vs-//
        // truncate/floor divergence — clamp BEFORE the division
        .withColumn("f_milli", expr(
          "CASE WHEN ss_within <= 0 OR k_groups <= 1 THEN NULL ELSE " +
            "CAST(CAST(greatest(ss_between, 0) AS DECIMAL(38,0)) " +
            "* (n_total - k_groups) " +
            "* 1000 div (CAST(ss_within AS DECIMAL(38,0)) * (k_groups - 1)) " +
            "AS BIGINT) END"))
        .select("k_groups", "n_total", "ss_between", "ss_within", "f_milli")
    },

    // Rich-club coefficient of the co-purchase graph at degree
    // thresholds 2/4/8/16/32: do high-degree parts preferentially
    // co-occur with each other? φ(k) = 2·E_k / (N_k(N_k−1)) over the
    // subgraph induced by nodes of degree ≥ k, exact micro. Rides the
    // SAME memoized support-≥2 pair frame as q290/q299 (the pair join
    // is paid once per session), the degree frame is one aggregate,
    // and the 5 thresholds ride one explode — never 5 passes. Each
    // threshold row left-joins its edge count so an empty rich club
    // still reports φ (N_k ≤ 1 → NULL, both engines).
    "q327_rich_club" -> { (s, d) =>
      val edges = Analytics.pairCounts(s, d).select("pa", "pb")
      val deg = edges.select(col("pa").as("node"))
        .union(edges.select(col("pb").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val ks = "array(2, 4, 8, 16, 32)"
      val degK = deg
        .select(explode(expr(ks)).as("k"), col("deg"))
        .filter(col("deg") >= col("k"))
        .groupBy("k").agg(count(lit(1)).as("n_nodes"))
      val edK = edges
        .join(deg.select(col("node").as("pa"), col("deg").as("da")), "pa")
        .join(deg.select(col("node").as("pb"), col("deg").as("db")), "pb")
        .select(explode(expr(ks)).as("k"), col("da"), col("db"))
        .filter(col("da") >= col("k") && col("db") >= col("k"))
        .groupBy("k").agg(count(lit(1)).as("n_edges"))
      degK.join(edK, Seq("k"), "left")
        .withColumn("n_edges", coalesce(col("n_edges"), lit(0L)))
        .withColumn("phi_micro", expr(
          "CASE WHEN n_nodes <= 1 THEN NULL ELSE " +
            "2 * n_edges * 1000000 div (n_nodes * (n_nodes - 1)) END"))
        .select(col("k").cast("long").as("k"), col("n_nodes"),
          col("n_edges"), col("phi_micro"))
        .orderBy("k")
    },

    // Pairwise Pearson correlation matrix of three lineitem metrics
    // (quantity, whole-dollar price, discount pct) from ONE
    // map-side-combined moment pass: all 9 sums in exact BIGINT
    // (dollar quantization keeps Σp² inside BIGINT to ~10⁹ rows),
    // then the three pair rows are shaped by a 3-way explode and
    // scored by the one shared Pearson text — the same guard-in-
    // double discipline as q321, so no integer square of a 10¹²-scale
    // sum ever exists.
    "q328_corr_matrix" -> { (s, d) =>
      val a = Tables.lineitem(s, d)
        .select(
          expr("CAST(l_quantity AS BIGINT)").as("q"),
          expr(s"$CentsF div 100").as("p"),
          expr("CAST(CAST(l_discount AS DECIMAL(5,2)) * 100 AS BIGINT)")
            .as("dc"))
        .agg(count(lit(1)).as("n"),
          sum("q").as("s_q"), sum("p").as("s_p"), sum("dc").as("s_d"),
          sum(expr("q * q")).as("s_qq"), sum(expr("p * p")).as("s_pp"),
          sum(expr("dc * dc")).as("s_dd"), sum(expr("q * p")).as("s_qp"),
          sum(expr("q * dc")).as("s_qd"), sum(expr("p * dc")).as("s_pd"))
      a.select(explode(array(
          struct(lit("price_disc").as("pair"), col("n"),
            col("s_p").as("sx"), col("s_d").as("sy"), col("s_pp").as("sxx"),
            col("s_dd").as("syy"), col("s_pd").as("sxy")),
          struct(lit("qty_disc").as("pair"), col("n"),
            col("s_q").as("sx"), col("s_d").as("sy"), col("s_qq").as("sxx"),
            col("s_dd").as("syy"), col("s_qd").as("sxy")),
          struct(lit("qty_price").as("pair"), col("n"),
            col("s_q").as("sx"), col("s_p").as("sy"), col("s_qq").as("sxx"),
            col("s_pp").as("syy"), col("s_qp").as("sxy")))).as("t"))
        .select(col("t.pair").as("pair"), col("t.n").as("n"),
          col("t.sx").as("sx"), col("t.sy").as("sy"), col("t.sxy").as("sxy"),
          col("t.sxx").as("sxx"), col("t.syy").as("syy"))
        .withColumn("r_micro", expr(RMicroF))
        .select("pair", "n", "sx", "sy", "sxy", "r_micro")
        .orderBy("pair")
    },

    // SAX motif discovery on daily revenue: z-normalize the series
    // against exact global moments (Σ in BIGINT cents, Σ² in the
    // DECIMAL(38,0)/HUGEINT lane, the float tail ONE shared IEEE
    // sequence), discretize each day to {a,b,c} at the N(0,1)
    // terciles ±0.43, pack consecutive 7-day blocks into words via
    // the q320 conditional pivot (order from arithmetic, never from
    // collect order), and report words that recur — repeated weekly
    // revenue shapes. The day frame is calendar-bounded, so every
    // window here is a legitimate tiny frame; the raw table is
    // touched exactly once, map-side combined.
    "q329_sax_motifs" -> { (s, d) =>
      val day = Tables.lineitem(s, d)
        .groupBy(col("l_shipdate").as("day"))
        .agg(sum(expr(CentsF)).as("rev_c"))
      val stats = day.agg(count(lit(1)).as("nd"), sum("rev_c").as("s1"),
        sum(expr("CAST(rev_c AS DECIMAL(19,0)) * CAST(rev_c AS DECIMAL(19,0))"))
          .as("s2"))
      val sym = day.crossJoin(broadcast(stats))
        .withColumn("sym", expr(saxSymF(graft.functions.PortableSql.Spark)))
        .withColumn("rn",
          row_number().over(Window.orderBy(col("day"))).cast("long") - 1)
        .withColumn("blk", expr("rn div 7"))
        .withColumn("pos", expr("rn % 7"))
      val pivots = (0 to 6).map(k =>
        max(when(col("pos") === lit(k), col("sym"))).as(s"p$k"))
      sym.groupBy("blk")
        .agg(count(lit(1)).as("n_days"), pivots: _*)
        .filter(col("n_days") === 7)
        .withColumn("word", expr("concat(p0, p1, p2, p3, p4, p5, p6)"))
        .groupBy("word")
        .agg(count(lit(1)).as("n_blocks"), min("blk").as("first_blk"))
        .filter(col("n_blocks") >= 2)
        .orderBy(col("n_blocks").desc, col("word"))
    },

    // Degree assortativity of the co-purchase graph: do high-degree
    // parts link to high-degree parts? Pearson over the symmetrized
    // edge list's endpoint degrees — exact BIGINT moment sums through
    // the shared Pearson text (the q321 discipline). Rides the
    // memoized pair frame + one degree aggregate + two hash equi-joins;
    // the symmetrize is a union, not a second join pass.
    "q331_assortativity" -> { (s, d) =>
      val edges = Analytics.pairCounts(s, d).select("pa", "pb")
      val deg = edges.select(col("pa").as("node"))
        .union(edges.select(col("pb").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val ed = edges
        .join(deg.select(col("node").as("pa"), col("deg").as("da")), "pa")
        .join(deg.select(col("node").as("pb"), col("deg").as("db")), "pb")
        .select("da", "db")
      ed.select(col("da").as("x"), col("db").as("y"))
        .union(ed.select(col("db").as("x"), col("da").as("y")))
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("x * x")).as("sxx"), sum(expr("y * y")).as("syy"),
          sum(expr("x * y")).as("sxy"))
        .withColumn("r_micro", expr(RMicroF))
        .select("n", "sx", "sxy", "r_micro")
    },

    // Flesch-style readability per source, transcendental-free: words
    // from the q247 tokenizer, sentences from the q315 terminator
    // split, syllables approximated by vowel-group runs — three
    // per-doc integer counts, one map-side-combined rollup, and the
    // 206.835 − 1.015·(w/s) − 84.6·(y/w) score in exact milli via two
    // positive integer divisions (the subtractions may go negative;
    // nothing divides after them).
    "q332_readability" -> { (s, d) =>
      val Sp = graft.functions.PortableSql.Spark
      Tables.spread(Tables.documents(s, d).select("source", "text"))
        .select(col("source"),
          expr(s"CAST(size(${Sp.tokens("text")}) AS BIGINT)").as("w"),
          expr(s"CAST(size(${Sp.filterL(
            "split(text, '[.!?]')", "x", "trim(x) != ''")}) AS BIGINT)")
            .as("sent"),
          expr(s"CAST(size(${Sp.regexExtractAll("text", "[aeiouyAEIOUY]+")}) " +
            "AS BIGINT)").as("syll"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("w").as("words"),
          sum("sent").as("sents"), sum("syll").as("sylls"))
        .withColumn("flesch_milli", expr(
          "CASE WHEN sents = 0 OR words = 0 THEN NULL ELSE " +
            "206835 - 1015 * words div sents - 84600 * sylls div words END"))
        .select("source", "n_docs", "words", "sents", "sylls",
          "flesch_milli")
        .orderBy("source")
    },

    // l-diversity audit — the sequel to q306's k-anonymity gate: a
    // group can be large (k-anonymous) yet reveal its sensitive value
    // if every member shares it. Sensitive attribute = account-balance
    // band (5 integer-cent bands); per (mktsegment, nation) group the
    // distinct-band count l, then the rollup: min l, groups with
    // l < 3, share of customers exposed. One two-level aggregate —
    // group cells are segments×nations, bounded by construction.
    "q333_l_diversity" -> { (s, d) =>
      val bandF =
        "CASE WHEN bal_c < 0 THEN 0 WHEN bal_c < 250000 THEN 1 " +
          "WHEN bal_c < 500000 THEN 2 WHEN bal_c < 750000 THEN 3 " +
          "ELSE 4 END"
      Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_nationkey"),
          expr("CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("bal_c"))
        .withColumn("band", expr(bandF))
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(count(lit(1)).as("sz"), countDistinct(col("band")).as("l"))
        .agg(count(lit(1)).as("n_groups"), min("l").as("min_l"),
          sum(expr("CASE WHEN l < 3 THEN 1 ELSE 0 END")).as("n_low_l"),
          sum(expr("CASE WHEN l < 3 THEN sz ELSE 0 END")).as("n_exposed"),
          sum("sz").as("n_customers"),
          sum("l").as("l_sum"))
        .withColumn("exposed_milli", expr(
          "CASE WHEN n_customers = 0 THEN NULL " +
            "ELSE n_exposed * 1000 div n_customers END"))
        .withColumn("avg_l_milli", expr(
          "CASE WHEN n_groups = 0 THEN NULL ELSE l_sum * 1000 div n_groups END"))
        .select("n_groups", "min_l", "n_low_l", "n_exposed", "n_customers",
          "exposed_milli", "avg_l_milli")
    },

    // Customer-lifetime-value cohort curves: cumulative revenue per
    // cohort member by months-since-first-order (0..11) — q292's
    // retention matrix with money on it. The running sum rides a
    // cohort-partitioned window over the cohorts×12 cell frame
    // (bounded by construction, never row scale); everything below it
    // is two map-side-combined aggregates and one hash join on the
    // customer key.
    "q334_clv_cohorts" -> { (s, d) =>
      val o = Tables.orders(s, d)
        .select(col("o_custkey"),
          expr("CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)")
            .as("ym"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("rev_c"))
      val first = o.groupBy("o_custkey").agg(min("ym").as("cym"))
      val coh = first.groupBy("cym").agg(count(lit(1)).as("n_cohort"))
      val cells = o.join(first, "o_custkey")
        .withColumn("m_since", expr(
          "(ym div 100 - cym div 100) * 12 + (ym % 100 - cym % 100)"))
        .filter(col("m_since").between(0, 11))
        .groupBy("cym", "m_since")
        .agg(sum("rev_c").as("rev_c"))
      cells.join(coh, "cym")
        .withColumn("cum_rev_c", sum("rev_c").over(
          Window.partitionBy("cym").orderBy("m_since")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("clv_c", expr("cum_rev_c div n_cohort"))
        .select("cym", "m_since", "n_cohort", "rev_c", "cum_rev_c", "clv_c")
        .orderBy("cym", "m_since")
    },

    // Parts whose price level SHIFTED between the 1992-95 and 1996-98
    // halves, ranked by Welch's t: per-(part, half) exact moment sums
    // (cents; per-part Σv² is row-bounded so BIGINT holds), the t
    // statistic in ONE shared IEEE text over the exact ints, floor-
    // quantized to micro so the top-20 order is integer-deterministic.
    // The ranking is a TakeOrdered top-k heap — never a global sort;
    // parts seen in only one half or with degenerate variance drop
    // out via the in-text guard (identical on both engines).
    "q335_price_movers" -> { (s, d) =>
      val h = Tables.lineitem(s, d)
        .select(col("l_partkey"),
          expr("CASE WHEN year(l_shipdate) <= 1995 THEN 1 ELSE 2 END")
            .as("half"),
          expr(CentsF).as("v"))
        .groupBy("l_partkey", "half")
        .agg(count(lit(1)).as("n"), sum("v").as("s"),
          sum(expr("v * v")).as("q"))
      h.filter(col("half") === 1)
        .select(col("l_partkey"), col("n").as("n1"), col("s").as("s1"),
          col("q").as("q1"))
        .join(h.filter(col("half") === 2)
          .select(col("l_partkey"), col("n").as("n2"), col("s").as("s2"),
            col("q").as("q2")), "l_partkey")
        .withColumn("t_micro", expr(WelchTF))
        .filter(col("t_micro").isNotNull)
        .withColumn("mean1_c", expr("s1 div n1"))
        .withColumn("mean2_c", expr("s2 div n2"))
        .select("l_partkey", "n1", "n2", "mean1_c", "mean2_c", "t_micro")
        .orderBy(col("t_micro").desc, col("l_partkey"))
        .limit(20)
    },

    // Order-header vs line-level revenue reconciliation: recompute
    // each order's total from its lines in the exact cent-percent²
    // lane (the q317 ledger units) and compare against
    // o_totalprice·10⁴ — the cross-table integrity audit a warehouse
    // runs before trusting either table. One join, two aggregates;
    // mismatch magnitudes are exact integers (diffs may be negative;
    // nothing divides them — the within-1% test cross-multiplies).
    "q336_order_recon" -> { (s, d) =>
      val lines = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("okey"),
          expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("ep_c"),
          expr("CAST(CAST(l_discount AS DECIMAL(5,2)) * 100 AS BIGINT)")
            .as("d_pct"),
          expr("CAST(CAST(l_tax AS DECIMAL(5,2)) * 100 AS BIGINT)")
            .as("t_pct"))
        .groupBy("okey")
        .agg(sum(expr("ep_c * (100 - d_pct) * (100 + t_pct)")).as("recon_cpp"))
      Tables.orders(s, d)
        .select(col("o_orderkey").as("okey"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) " +
            "* 10000").as("total_cpp"))
        .join(lines, "okey")
        .withColumn("adiff", expr("abs(recon_cpp - total_cpp)"))
        .agg(count(lit(1)).as("n_orders"),
          sum(expr("CASE WHEN adiff = 0 THEN 1 ELSE 0 END")).as("n_exact"),
          sum(expr("CASE WHEN adiff * 100 <= total_cpp THEN 1 ELSE 0 END"))
            .as("n_within_1pct"),
          max("adiff").as("max_adiff_cpp"),
          sum("adiff").as("sum_adiff_cpp"))
        .withColumn("exact_milli", expr("n_exact * 1000 div n_orders"))
        .select("n_orders", "n_exact", "n_within_1pct", "max_adiff_cpp",
          "sum_adiff_cpp", "exact_milli")
    },

    // Newman modularity of the brand partition over the co-purchase
    // graph: Q = Σ_c [e_c/m − (d_c/2m)²], computed as the single
    // exact rational Σ_c(4·m·e_c − d_c²) / 4m² — one integer
    // numerator sum (order-free), ONE sign-split division at the end.
    // Communities come from a broadcast part→brand join; d_c and e_c
    // are two bounded rollups over the memoized pair frame. HONEST
    // CEILING: num·10⁶ needs m ≲ 1.5·10⁶ edges in BIGINT — past that
    // the lane moves to DECIMAL(38,0)/HUGEINT.
    "q337_modularity" -> { (s, d) =>
      val edges = Analytics.pairCounts(s, d).select("pa", "pb")
      val brand = Tables.part(s, d).select("p_partkey", "p_brand")
      val m = edges.agg(count(lit(1)).as("m"))
      val deg = edges.select(col("pa").as("node"))
        .union(edges.select(col("pb").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val dC = deg
        .join(broadcast(brand), col("node") === col("p_partkey"))
        .groupBy("p_brand").agg(sum("deg").as("d_c"))
      val eC = edges
        .join(broadcast(brand.select(col("p_partkey").as("pa"),
          col("p_brand").as("ba"))), "pa")
        .join(broadcast(brand.select(col("p_partkey").as("pb"),
          col("p_brand").as("bb"))), "pb")
        .filter(col("ba") === col("bb"))
        .groupBy(col("ba")).agg(count(lit(1)).as("e_c"))
        .select(col("ba").as("p_brand"), col("e_c"))
      dC.join(eC, Seq("p_brand"), "left")
        .withColumn("e_c", coalesce(col("e_c"), lit(0L)))
        .crossJoin(broadcast(m))
        .agg(count(lit(1)).as("n_comm"), max("m").as("m"),
          sum("e_c").as("e_within"),
          sum(expr("4 * m * e_c - d_c * d_c")).as("qnum"))
        .withColumn("q_micro", expr(
          "CASE WHEN qnum >= 0 THEN qnum * 1000000 div (4 * m * m) " +
            "ELSE -((-qnum) * 1000000 div (4 * m * m)) END"))
        .select("n_comm", "m", "e_within", "qnum", "q_micro")
    },

    // Decile-by-decile (QQ) shift of order value between the 1992-95
    // and 1996-98 halves: type-1 deciles per half (the q241 identity
    // at j/10), aligned into 9 (decile, before, after) rows by a
    // 9-struct explode of the two one-row half frames. Relative shift
    // in milli splits the sign before the division (shifts go both
    // ways). Each half ranks through GlobalOrder's two-phase
    // distributed row_number — a `partitionBy(half)` window has only
    // TWO partitions, i.e. each task sorts half the table (the 10×
    // probe measured that shape at 7.7×); two distributed rank
    // passes beat one two-task sort at any real scale.
    "q338_qq_shift" -> { (s, d) =>
      val base = Tables.orders(s, d)
        .select(
          expr("CASE WHEN year(o_orderdate) <= 1995 THEN 1 ELSE 2 END")
            .as("half"),
          col("o_orderkey"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("v"))
      val picks = (1 to 9).map(j =>
        max(when(expr(s"rn * 10 >= $j * n AND (rn - 1) * 10 < $j * n"),
          col("v"))).as(s"d$j"))
      def ranked(h: Int): DataFrame =
        graft.plans.GlobalOrder.withRowNumber(
          base.filter(col("half") === h),
          Seq(col("v"), col("o_orderkey")), col("v"), "rn", Some("n"))
      val halves = ranked(1).unionByName(ranked(2))
        .groupBy("half")
        .agg(count(lit(1)).as("n_half"), picks: _*)
      val a = halves.filter(col("half") === 1)
      val b = halves.filter(col("half") === 2)
      val pairs = (1 to 9).map(j =>
        struct(lit(j.toLong).as("decile"), col(s"a.d$j").as("q1_c"),
          col(s"b.d$j").as("q2_c")))
      a.as("a").crossJoin(broadcast(b.as("b")))
        .select(explode(array(pairs: _*)).as("t"))
        .select(col("t.decile").as("decile"), col("t.q1_c").as("q1_c"),
          col("t.q2_c").as("q2_c"))
        .withColumn("shift_c", expr("q2_c - q1_c"))
        .withColumn("shift_milli", expr(
          "CASE WHEN q2_c >= q1_c THEN (q2_c - q1_c) * 1000 div q1_c " +
            "ELSE -((q1_c - q2_c) * 1000 div q1_c) END"))
        .select("decile", "q1_c", "q2_c", "shift_c", "shift_milli")
        .orderBy("decile")
    },

    // Burrows' Delta stylometry between sources: z-scores of the
    // top-50 tokens' per-source rates (ppm integer lane), pairwise
    // mean |z_a − z_b| as the authorship distance. The z tail is one
    // shared IEEE text over exact integer (rate, Σr, Σr²) inputs and
    // every per-token |Δz| is floor-quantized to micro BEFORE the
    // pair aggregate — so the 50-term sum is an order-free integer,
    // never a float reduction. All frames after the (source, token)
    // count are bounded: 50 tokens × |sources| cells, |sources|²
    // pairs. Absent (source, token) cells are zero-filled via the
    // cross join — a missing word IS stylometric signal.
    "q339_stylometry" -> { (s, d) =>
      val toks = TextOps.docsWithToks(s, d)
        .select(col("source"), explode(col("toks")).as("t"))
      val counts = toks.groupBy("source", "t").agg(count(lit(1)).as("n_st"))
      val totals = counts.groupBy("source").agg(sum("n_st").as("n_s"))
      val top = counts.groupBy("t").agg(sum("n_st").as("n_t"))
        .orderBy(col("n_t").desc, col("t")).limit(50).select("t")
      val filled = totals.select("source", "n_s")
        .crossJoin(broadcast(top))
        .join(counts, Seq("source", "t"), "left")
        .withColumn("n_st", coalesce(col("n_st"), lit(0L)))
        .withColumn("r", expr("n_st * 1000000 div n_s"))
      val stats = filled.groupBy("t")
        .agg(count(lit(1)).as("ns"), sum("r").as("sr"),
          sum(expr("r * r")).as("srr"))
      val z = filled.join(broadcast(stats), "t")
        .select(col("t"), col("source"), col("r"), col("ns"), col("sr"),
          col("srr"))
      z.as("a").join(z.as("b"),
          col("a.t") === col("b.t") && col("a.source") < col("b.source"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
          col("a.ns").as("ns"), col("a.sr").as("sr"), col("a.srr").as("srr"),
          col("a.r").as("ra"), col("b.r").as("rb"))
        .withColumn("zdiff_micro", expr(
          s"CAST(floor(abs((${styZF("ra")}) - (${styZF("rb")})) * " +
            "CAST(1000000 AS DOUBLE)) AS BIGINT)"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("n_tokens"), sum("zdiff_micro").as("zsum"))
        .withColumn("delta_milli", expr("zsum div (n_tokens * 1000)"))
        .select("src_a", "src_b", "n_tokens", "delta_milli")
        .orderBy("src_a", "src_b")
    },

    // Laspeyres price/volume decomposition of the 1995→1996 revenue
    // change per brand: ΔR splits into a price effect
    // (R₁·Q₀ div Q₁ − R₀, ONE positive-operand floor division) and a
    // volume effect defined as the exact complement (ΔR − pe), so the
    // ledger identity ΔR = pe + ve holds BIT-EXACTLY in-band on both
    // engines — the floor lives in the split point, never in the
    // total. Two map-side rollups + one 25-row brand join. HONEST
    // CEILING: R₁·Q₀ holds to ~10¹⁸ cent·units in BIGINT.
    "q341_price_volume" -> { (s, d) =>
      val by = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .filter(expr("year(l_shipdate) IN (1995, 1996)"))
        .groupBy(col("p_brand"), expr("year(l_shipdate)").as("yr"))
        .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("q"),
          sum(expr(CentsF)).as("r"))
      by.filter(col("yr") === 1995)
        .select(col("p_brand"), col("q").as("q0"), col("r").as("r0"))
        .join(by.filter(col("yr") === 1996)
          .select(col("p_brand"), col("q").as("q1"), col("r").as("r1")),
          "p_brand")
        .withColumn("dr_c", expr("r1 - r0"))
        .withColumn("pe_c", expr("r1 * q0 div q1 - r0"))
        .withColumn("ve_c", expr("dr_c - pe_c"))
        .select("p_brand", "q0", "q1", "r0", "r1", "dr_c", "pe_c", "ve_c")
        .orderBy("p_brand")
    },

    // Decision-stump feature importance for predicting returns,
    // entropy-free: weighted Gini impurity after splitting on each
    // candidate feature (discount band / quantity decade / ship
    // month), as per-group floor-quantized micro terms — integer
    // sums, order-free — against the unsplit impurity. The scan is a
    // narrow 4-column projection read once per candidate aggregate;
    // every group frame is bounded (≤12 cells). The impurity
    // numerator 2·pos·(n−pos)·10⁶ rides the DECIMAL(38,0)/HUGEINT
    // lane from the start (it would clear BIGINT at only ~5M rows);
    // the divided-out micro results fit LONG by construction.
    "q342_gini_importance" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
        .select(
          expr("CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END").as("pos"),
          expr("CAST(CAST(l_discount AS DECIMAL(5,2)) * 100 AS BIGINT)")
            .as("disc"),
          expr("CAST(l_quantity AS BIGINT) div 10").as("qb"),
          expr("CAST(month(l_shipdate) AS BIGINT)").as("mo"))
      def feat(tag: String, key: String): DataFrame =
        li.groupBy(col(key).as("g"))
          .agg(count(lit(1)).as("n_g"), sum("pos").as("pos_g"))
          .select(lit(tag).as("feature"), col("n_g"), col("pos_g"))
      val groups = feat("disc_band", "disc")
        .unionAll(feat("month", "mo"))
        .unionAll(feat("qty_decade", "qb"))
      val tot = li.agg(count(lit(1)).as("nn"), sum("pos").as("pp"))
      groups.crossJoin(broadcast(tot))
        .withColumn("term_micro", expr(
          "CAST(CAST(2 AS DECIMAL(19,0)) * pos_g * (n_g - pos_g) * 1000000 " +
            "div (CAST(n_g AS DECIMAL(19,0)) * nn) AS BIGINT)"))
        .groupBy("feature")
        .agg(count(lit(1)).as("n_groups"),
          sum("term_micro").as("after_micro"),
          max(expr(
            "CAST(CAST(2 AS DECIMAL(19,0)) * pp * (nn - pp) * 1000000 " +
              "div (CAST(nn AS DECIMAL(19,0)) * nn) AS BIGINT)"))
            .as("before_micro"))
        .withColumn("drop_micro", expr("before_micro - after_micro"))
        .select("feature", "n_groups", "before_micro", "after_micro",
          "drop_micro")
        .orderBy(col("drop_micro").desc, col("feature"))
    },

    // Nelson–Aalen cumulative hazard of order→ship latency with
    // right-censoring at 1998-06-01 — the product-free survival
    // estimator (Kaplan–Meier's Π(1−d/n) cannot be made bit-exact
    // across engines; H(t) = Σ d_s/n_s is a SUM of rationals, so each
    // step quantizes to micro and the cumulative is an integer
    // window). At-risk counts come from one cumulative count over the
    // bounded distinct-duration frame (≤ a few hundred day values) —
    // the subject table is touched once, map-side combined; no
    // per-subject state survives the first aggregate.
    "q343_nelson_aalen" -> { (s, d) =>
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
            .as("ev"))
      val steps = subj.groupBy("obs")
        .agg(count(lit(1)).as("c_all"), sum("ev").as("d"))
      val n = steps.agg(sum("c_all").as("n_total"))
      val ordw = Window.orderBy("obs")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      steps.crossJoin(broadcast(n))
        .withColumn("cum_le", sum("c_all").over(ordw))
        .withColumn("n_risk", expr("n_total - cum_le + c_all"))
        .filter(col("d") > 0)
        .withColumn("h_step_micro", expr("d * 1000000 div n_risk"))
        .withColumn("h_cum_micro", sum("h_step_micro").over(ordw))
        .select(col("obs").as("t_days"), col("d"), col("n_risk"),
          col("h_step_micro"), col("h_cum_micro"))
        .orderBy("t_days")
    },

    // Rescaled-range (Hurst) table for daily revenue at window sizes
    // 8/16/32 — long-memory diagnostics without fitting a log-log
    // slope. The whole R/S statistic is EXACT-INTEGER until one final
    // shared division: scaled deviations N_j = w·Σ_{i≤j}v − j·S are
    // integers (whole-dollar lane keeps w·Q inside BIGINT), the range
    // includes the j=0 origin, and R/S = Range / √(wQ − S²) is one
    // int-by-sqrt(int) division, floor-quantized per block BEFORE the
    // per-size mean (order-free). Every window is (size, block)-
    // partitioned over the calendar-bounded day frame.
    "q344_rescaled_range" -> { (s, d) =>
      val day = Tables.lineitem(s, d)
        .groupBy(col("l_shipdate").as("day"))
        .agg(expr(s"sum($CentsF) div 100").as("v"))
      val ranked = day
        .withColumn("rn",
          row_number().over(Window.orderBy(col("day"))).cast("long") - 1)
        .select(col("v"), col("rn"),
          explode(expr("array(8, 16, 32)")).as("w"))
        .withColumn("blk", expr("rn div w"))
        .withColumn("pos", expr("rn % w"))
      val part = Window.partitionBy("w", "blk")
      val ordp = part.orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // second moments in the DECIMAL(38,0) lane (HUGEINT on the
      // DuckDB side): at 10× sf0.1 daily dollars, w·Σv² and (Σv)²
      // both clear 2⁶³ — the 10× probe caught the BIGINT version
      val varI = "w * qq - CAST(ss AS DECIMAL(19,0)) * ss"
      val rsF =
        s"CASE WHEN cnt != w OR $varI <= 0 THEN NULL ELSE " +
          "CAST(floor(CAST(greatest(mx, CAST(0 AS BIGINT)) - " +
          "least(mn, CAST(0 AS BIGINT)) AS DOUBLE) / " +
          s"sqrt(${graft.functions.PortableSql.Spark.wideToDouble(varI)}) * " +
          "CAST(1000000 AS DOUBLE)) AS BIGINT) END"
      ranked
        .withColumn("cum", sum("v").over(ordp))
        .withColumn("ss", sum("v").over(part))
        .withColumn("qq",
          sum(expr("CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0))"))
            .over(part))
        .withColumn("cnt", count(lit(1)).over(part))
        .withColumn("nj", expr("w * cum - (pos + 1) * ss"))
        .groupBy("w", "blk")
        .agg(max("cnt").as("cnt"), max("ss").as("ss"), max("qq").as("qq"),
          max("nj").as("mx"), min("nj").as("mn"))
        .withColumn("rs_micro", expr(rsF))
        .filter(col("rs_micro").isNotNull)
        .groupBy("w")
        .agg(count(lit(1)).as("n_blocks"),
          expr("sum(rs_micro) div count(1)").as("mean_rs_micro"),
          max("rs_micro").as("max_rs_micro"))
        .select(col("w").cast("long").as("w"), col("n_blocks"),
          col("mean_rs_micro"), col("max_rs_micro"))
        .orderBy("w")
    },

    // Month-over-month top-100 stability: how much of each month's
    // top-100 parts (by shipped revenue) carries into the next
    // month — the rank-churn monitor that decides whether yesterday's
    // hot-list caches are still valid. Per-month top-100 is a
    // month-partitioned WindowGroupLimit heap (BottomK with a
    // descending order); the overlap join runs on months×100 rows.
    // Month pairs with zero overlap still report (left join from the
    // consecutive-month spine).
    "q345_topk_stability" -> { (s, d) =>
      val tops = graft.operators.BottomK.perGroup(
        Tables.lineitem(s, d)
          .groupBy(
            expr("CAST((year(l_shipdate) - 1992) * 12 " +
              "+ month(l_shipdate) - 1 AS BIGINT)").as("mi"),
            col("l_partkey").as("pk"))
          .agg(sum(expr(CentsF)).as("rev_c")),
        Seq("mi"), Seq(col("rev_c").desc, col("pk")), 100)
        .select("mi", "pk")
      val counts = tops.groupBy("mi").agg(count(lit(1)).as("n_top"))
      val overlap = tops
        .join(tops.select((col("mi") - 1).as("mi"), col("pk")),
          Seq("mi", "pk"))
        .groupBy("mi").agg(count(lit(1)).as("n_overlap"))
      counts.as("a")
        .join(counts.as("b"), col("a.mi") + 1 === col("b.mi"))
        .select(col("a.mi").as("mi_a"), col("a.n_top").as("n_a"),
          col("b.n_top").as("n_b"))
        .join(overlap.select(col("mi").as("mi_a"), col("n_overlap")),
          Seq("mi_a"), "left")
        .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
        .withColumn("stability_milli", expr("n_overlap * 1000 div n_a"))
        .select("mi_a", "n_a", "n_b", "n_overlap", "stability_milli")
        .orderBy("mi_a")
    },

    // Sample-ratio-mismatch check for the q223 hash split: the FIRST
    // thing to verify before reading any A/B result. χ² for a 50/50
    // split is (n₀−n₁)²/(n₀+n₁) — exact micro by cross-multiplying,
    // and the pass/fail flag compares against the χ²₍₁,0.95₎ critical
    // value with BOTH sides integer (flag = (n₀−n₁)²·10⁶ >
    // 3841459·N) — no float ever enters. One aggregate over the
    // per-user dedup.
    "q346_srm_check" -> { (s, d) =>
      val S = graft.functions.PortableSql.Spark
      Tables.events(s, d)
        .select("user_id").distinct()
        .withColumn("arm", expr(s"${S.hash64("concat('ab:', user_id)")} % 2"))
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"))
        .withColumn("chi_micro", expr(
          "CASE WHEN n0 + n1 = 0 THEN NULL " +
            "ELSE (n0 - n1) * (n0 - n1) * 1000000 div (n0 + n1) END"))
        .withColumn("srm_flag", expr(
          "(n0 - n1) * (n0 - n1) * 1000000 > 3841459 * (n0 + n1)"))
        .select("n0", "n1", "chi_micro", "srm_flag")
    },

    // New-vs-returning decomposition per month: the growth-accounting
    // readout (is MAU growth acquisition or retention?). First-seen
    // month from one per-user aggregate, actives from one dedup —
    // never a month×user matrix; the monthly frame is
    // calendar-bounded.
    "q347_new_vs_returning" -> { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"),
          expr("CAST(year(ts) * 100 + month(ts) AS BIGINT)").as("ym"))
        .distinct()
      val first = ud.groupBy("user_id").agg(min("ym").as("fym"))
      ud.join(first, "user_id")
        .groupBy("ym")
        .agg(count(lit(1)).as("n_active"),
          sum(expr("CASE WHEN ym = fym THEN 1 ELSE 0 END")).as("n_new"))
        .withColumn("n_returning", expr("n_active - n_new"))
        .withColumn("new_milli", expr("n_new * 1000 div n_active"))
        .select("ym", "n_active", "n_new", "n_returning", "new_milli")
        .orderBy("ym")
    },

    // Negative-sampling hygiene for contrastive training pairs:
    // deterministic pseudo-random part pairs (two independent 60-bit
    // hash lanes per index) checked against the true co-purchase
    // positives — the "how many of my negatives are secretly
    // positives" audit that decides whether in-batch negatives are
    // safe. The 10k candidate frame broadcasts into a hash semi-join
    // against the memoized pair frame; the generator is pure
    // arithmetic over an index explode, so any executor can
    // re-generate any shard.
    "q348_negative_sampling" -> { (s, d) =>
      val S = graft.functions.PortableSql.Spark
      val maxPk = Tables.part(s, d).agg(max("p_partkey").as("mx"))
      val cand = maxPk
        .select(col("mx"), explode(expr("sequence(0, 9999)")).as("i"))
        .select(
          expr(s"1 + ${S.hash64("concat('nega:', i)")} % mx").as("ra"),
          expr(s"1 + ${S.hash64("concat('negb:', i)")} % mx").as("rb"))
        .filter(col("ra") =!= col("rb"))
        .select(least(col("ra"), col("rb")).as("pa"),
          greatest(col("ra"), col("rb")).as("pb"))
      val pos = Analytics.pairCounts(s, d).select("pa", "pb")
      val hits = broadcast(cand.distinct())
        .join(pos, Seq("pa", "pb"))
        .agg(count(lit(1)).as("n_false_neg"))
      cand.agg(count(lit(1)).as("n_cand"))
        .crossJoin(cand.distinct().agg(count(lit(1)).as("n_distinct")))
        .crossJoin(broadcast(hits))
        .withColumn("fn_milli", expr("n_false_neg * 1000 div n_distinct"))
        .select("n_cand", "n_distinct", "n_false_neg", "fn_milli")
    },

    // KMV sketch ALGEBRA: union and intersection cardinality of two
    // user sets (clickers vs purchasers) estimated purely from
    // bottom-k sketches, against exact truth. The key identity: any
    // hash among the k smallest of A∪B that belongs to A is
    // automatically among the k smallest of A — so intersection
    // membership is decided sketch-against-sketch, never against the
    // full sets. est∩ = ρ·est∪ with ρ = |both|/m cross-multiplied
    // before ONE division. Each bottom-k is a TakeOrdered heap
    // (k·partitions rows max); k=64 < |A∪B| so the estimator branch
    // (not the exact-small fallback) is what the oracle pins.
    "q349_kmv_set_ops" -> { (s, d) =>
      val S = graft.functions.PortableSql.Spark
      val k = 64
      val hF = s"${S.hash64("concat('kset:', user_id)")}"
      def users(t: String) = Tables.events(s, d)
        .filter(col("event_type") === t)
        .select("user_id").distinct()
      val a = users("click")
      val b = users("purchase")
      val ha = a.select(expr(hF).as("h"))
      val hb = b.select(expr(hF).as("h"))
      val bkA = ha.orderBy("h").limit(k)
      val bkB = hb.orderBy("h").limit(k)
      val bkU = ha.union(hb).distinct().orderBy("h").limit(k)
      val sketch = bkU.agg(count(lit(1)).as("n_u"), max("h").as("h_k"))
        .crossJoin(broadcast(
          bkU.join(bkA, "h").join(bkB, "h").agg(count(lit(1)).as("n_both"))))
      val exact = a.join(b, "user_id")
        .agg(count(lit(1)).as("exact_inter"))
        .crossJoin(broadcast(a.agg(count(lit(1)).as("exact_a"))))
        .crossJoin(broadcast(b.agg(count(lit(1)).as("exact_b"))))
        .withColumn("exact_union", expr("exact_a + exact_b - exact_inter"))
      exact.crossJoin(broadcast(sketch))
        .withColumn("est_union", expr(
          s"CASE WHEN n_u < $k THEN n_u ELSE " +
            s"CAST(CAST(${k - 1} AS DECIMAL(38,0)) * 1152921504606846976 " +
            "div h_k AS BIGINT) END"))
        .withColumn("est_inter", expr(
          s"n_both * est_union div least(CAST($k AS BIGINT), n_u)"))
        .withColumn("err_union_milli", expr(
          "CASE WHEN exact_union = 0 THEN NULL " +
            "ELSE abs(est_union - exact_union) * 1000 div exact_union END"))
        .withColumn("err_inter_milli", expr(
          "CASE WHEN exact_inter = 0 THEN NULL " +
            "ELSE abs(est_inter - exact_inter) * 1000 div exact_inter END"))
        .select("exact_a", "exact_b", "exact_union", "exact_inter",
          "n_u", "n_both", "est_union", "est_inter",
          "err_union_milli", "err_inter_milli")
    },

    // Distribution-free 95% CI for the median, per event_type: the
    // binomial order-statistic interval — ranks ⌊(n − z√n)/2⌋ and
    // ⌈(n + z√n)/2⌉+1 (z = 1.959964), clamped into [1, n]. The rank
    // TARGETS are computed once per type in one shared double text
    // (so both engines pick identical integer ranks), then the three
    // order statistics come from ONE partitioned ranked pass with the
    // targets broadcast back in — never a per-quantile re-sort.
    "q350_median_ci" -> { (s, d) =>
      val base = Tables.events(s, d)
        .select(col("event_type"), col("event_id"), expr(VMilliF).as("vmilli"))
      val targets = base.groupBy("event_type")
        .agg(count(lit(1)).as("n"))
        .withColumn("lo_rank", expr(CiLoF))
        .withColumn("hi_rank", expr(CiHiF))
      val ord = Window.partitionBy("event_type")
        .orderBy(col("vmilli"), col("event_id"))
      base
        .withColumn("rn", row_number().over(ord).cast("long"))
        .join(broadcast(targets), "event_type")
        .groupBy("event_type")
        .agg(max("n").as("n"), max("lo_rank").as("lo_rank"),
          max("hi_rank").as("hi_rank"),
          max(when(expr("rn = lo_rank"), col("vmilli"))).as("ci_lo"),
          max(when(expr("rn * 2 >= n AND (rn - 1) * 2 < n"),
            col("vmilli"))).as("med"),
          max(when(expr("rn = hi_rank"), col("vmilli"))).as("ci_hi"))
        .select("event_type", "n", "lo_rank", "hi_rank", "ci_lo", "med",
          "ci_hi")
        .orderBy("event_type")
    },

    // Co-burst synchrony between clicks and errors: minutes where
    // BOTH series run above their own type-1 median minute-rate,
    // vs the expected co-occurrence under independence — the
    // "do errors spike with traffic" diagnostic. The minute spine is
    // time-bounded; medians come from one partitioned ranked pass
    // over it; the readout is exact counts with lift cross-multiplied
    // (lift > 1000 milli ⇒ synchronized beyond chance).
    "q351_co_burst" -> { (s, d) =>
      val mins = Tables.events(s, d)
        .filter(col("event_type").isin("click", "error"))
        .groupBy(expr("date_trunc('minute', ts)").as("mn"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val ord = Window.partitionBy("event_type").orderBy(col("cnt"), col("mn"))
      val med = mins
        .withColumn("rn", row_number().over(ord).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        .groupBy("event_type")
        .agg(max(when(expr("rn * 2 >= n AND (rn - 1) * 2 < n"),
          col("cnt"))).as("med"))
      val flagged = mins.join(broadcast(med), "event_type")
        .withColumn("hot", expr("CASE WHEN cnt > med THEN 1 ELSE 0 END"))
      val c = flagged.filter(col("event_type") === "click")
        .select(col("mn"), col("hot").as("hot_c"))
      val e = flagged.filter(col("event_type") === "error")
        .select(col("mn"), col("hot").as("hot_e"))
      c.join(e, Seq("mn"))
        .agg(count(lit(1)).as("n_minutes"),
          sum("hot_c").as("n_hot_click"),
          sum("hot_e").as("n_hot_error"),
          sum(expr("hot_c * hot_e")).as("n_both"))
        .withColumn("lift_milli", expr(
          "CASE WHEN n_hot_click = 0 OR n_hot_error = 0 THEN NULL " +
            "ELSE n_both * n_minutes * 1000 div (n_hot_click * n_hot_error) " +
            "END"))
        .select("n_minutes", "n_hot_click", "n_hot_error", "n_both",
          "lift_milli")
    },

    // Two-sample Hodges–Lehmann location shift (click vs error
    // values): the exact weighted median of ALL pairwise differences,
    // computed WITHOUT materializing the n² pairs — both samples
    // collapse to unit-quantized value histograms first, the
    // difference distribution is the histogram cross product
    // (|values|² cells, value-range-bounded — never row²), and the
    // median pick is q210's unique-crossing-row predicate over the
    // bounded difference spine. The histogram side broadcasts, so the
    // pair pass is a BroadcastNestedLoopJoin over bounded frames.
    "q352_hodges_lehmann" -> { (s, d) =>
      val h = Tables.events(s, d)
        .filter(col("event_type").isin("click", "error"))
        .select(col("event_type"),
          expr(s"$VMilliF div 1000").as("vu"))
        .groupBy("event_type", "vu").agg(count(lit(1)).as("c"))
      val h1 = h.filter(col("event_type") === "click")
        .select(col("vu").as("v1"), col("c").as("c1"))
      val h2 = h.filter(col("event_type") === "error")
        .select(col("vu").as("v2"), col("c").as("c2"))
      val diff = h1.join(broadcast(h2))
        .select(expr("v1 - v2").as("d"), expr("c1 * c2").as("w"))
        .groupBy("d").agg(sum("w").as("w"))
      val run = Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = diff.agg(sum("w").as("tw"), count(lit(1)).as("n_cells"))
      diff
        .withColumn("cw", sum("w").over(run))
        .crossJoin(broadcast(tot))
        .filter(col("cw") * 2 >= col("tw") &&
          (col("cw") - col("w")) * 2 < col("tw"))
        .select(col("d").as("hl_shift_unit"), col("cw"), col("tw"),
          col("n_cells"))
    },

    // Theil–Sen robust trend of daily order volume: the exact median
    // of all pairwise slopes over the calendar-bounded day frame —
    // the day count is bounded, so the pair frame is bounded² (a few
    // million rows), NOT row², and it ranks through GlobalOrder (a
    // bare global sort of the slope frame would be the q338 mistake).
    // Per-pair slopes floor-quantize with the sign split; the median
    // is the type-1 lower-median identity over the distributed rank.
    "q353_theil_sen" -> { (s, d) =>
      val day = Tables.orders(s, d)
        .groupBy(col("o_orderdate").as("day"))
        .agg(count(lit(1)).as("y"))
        .withColumn("x",
          row_number().over(Window.orderBy(col("day"))).cast("long"))
      val a = day.select(col("x").as("xa"), col("y").as("ya"))
      val b = day.select(col("x").as("xb"), col("y").as("yb"))
      val slopes = a.join(broadcast(b), col("xa") < col("xb"))
        .select(expr(
          "CASE WHEN yb >= ya THEN (yb - ya) * 1000 div (xb - xa) " +
            "ELSE -((ya - yb) * 1000 div (xb - xa)) END").as("sl"))
      // median by counts (round-11 optimization): the lower-median
      // filter `rn*2 >= n AND (rn-1)*2 < n` selects exactly rank
      // ceil(n/2), a pure function of n — so the pair frame never
      // needs per-ROW ranks. Collapse to per-slope counts (map-side
      // partial agg shrinks the pair stream before it shuffles), run
      // ONE distributed running sum over the value-sized frame, and
      // pick the slope whose cumulative count first reaches the
      // median rank. Plan: the 3-pass rank over the full pair frame
      // (pin + boundaries + offsets + 64-bucket window) becomes one
      // grouped aggregate + a running sum over distinct slopes.
      val bySlope = slopes.groupBy("sl").agg(count(lit(1)).as("c"))
      val cum = graft.plans.GlobalOrder.withRunningSum(
        bySlope, Seq(col("sl")), col("sl"), col("c"), "cw")
      val tot = bySlope.agg(sum("c").as("n"))
      cum.crossJoin(broadcast(tot))
        .filter(expr("cw >= (n + 1) div 2 AND cw - c < (n + 1) div 2"))
        .select(col("sl").as("slope_milli_per_day"),
          expr("(n + 1) div 2").as("rn"), col("n"))
    },

    // Mann–Kendall trend test on the same day frame: S = Σ sign
    // pairs (exact integers from the bounded pair pass), tie-corrected
    // variance n(n−1)(2n+5)/18 − Σt(t−1)(2t+5)/18 as ONE integer
    // numerator over the shared /18, and z in a single shared double
    // text ending in floor (floor, unlike integer division, agrees on
    // negatives across engines). Complements q353: direction +
    // significance, same bounded substrate.
    "q354_mann_kendall" -> { (s, d) =>
      val zF =
        "CASE WHEN var18 <= 0 THEN NULL " +
          "WHEN s_stat > 0 THEN CAST(floor((CAST(s_stat AS DOUBLE) - " +
          "CAST(1 AS DOUBLE)) / sqrt(CAST(var18 AS DOUBLE) / " +
          "CAST(18 AS DOUBLE)) * CAST(1000000 AS DOUBLE)) AS BIGINT) " +
          "WHEN s_stat < 0 THEN CAST(floor((CAST(s_stat AS DOUBLE) + " +
          "CAST(1 AS DOUBLE)) / sqrt(CAST(var18 AS DOUBLE) / " +
          "CAST(18 AS DOUBLE)) * CAST(1000000 AS DOUBLE)) AS BIGINT) " +
          "ELSE 0 END"
      val day = Tables.orders(s, d)
        .groupBy(col("o_orderdate").as("day"))
        .agg(count(lit(1)).as("y"))
        .withColumn("x",
          row_number().over(Window.orderBy(col("day"))).cast("long"))
      val a = day.select(col("x").as("xa"), col("y").as("ya"))
      val b = day.select(col("x").as("xb"), col("y").as("yb"))
      val pairs = a.join(broadcast(b), col("xa") < col("xb"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(expr("CASE WHEN yb > ya THEN 1 ELSE 0 END")).as("n_up"),
          sum(expr("CASE WHEN yb < ya THEN 1 ELSE 0 END")).as("n_down"))
      val ties = day.groupBy("y").agg(count(lit(1)).as("t"))
        .agg(count(lit(1)).as("n_levels"),
          sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie18"))
      val nRow = day.agg(count(lit(1)).as("nd"))
      pairs.crossJoin(broadcast(ties)).crossJoin(broadcast(nRow))
        .withColumn("s_stat", expr("n_up - n_down"))
        .withColumn("var18", expr("nd * (nd - 1) * (2 * nd + 5) - tie18"))
        .withColumn("z_micro", expr(zF))
        .select("nd", "n_pairs", "s_stat", "var18", "z_micro")
    },

    // FK cardinality profile for the three fact edges — the join-
    // planning prior (children per parent: min/max/mean) a 100 TB
    // engine reads before choosing broadcast vs shuffle vs skew
    // salting. One map-side aggregate per edge + a bounded union;
    // parents with zero children are visible via the left join from
    // the parent side (min_children = 0 rows count).
    "q355_fk_cardinality" -> { (s, d) =>
      def edge(tag: String, parent: DataFrame, pk: String,
               child: DataFrame, fk: String): DataFrame = {
        val cnt = child.groupBy(col(fk).as("k")).agg(count(lit(1)).as("c"))
        parent.select(col(pk).as("k")).distinct()
          .join(cnt, Seq("k"), "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
          .agg(count(lit(1)).as("n_parents"),
            sum(expr("CASE WHEN c = 0 THEN 1 ELSE 0 END")).as("n_childless"),
            min("c").as("min_children"), max("c").as("max_children"),
            sum("c").as("n_children"))
          .withColumn("mean_children_milli",
            expr("n_children * 1000 div n_parents"))
          .select(lit(tag).as("edge"), col("n_parents"), col("n_childless"),
            col("min_children"), col("max_children"), col("n_children"),
            col("mean_children_milli"))
      }
      edge("customer->orders", Tables.customer(s, d), "c_custkey",
          Tables.orders(s, d), "o_custkey")
        .unionAll(edge("orders->lineitem", Tables.orders(s, d), "o_orderkey",
          Tables.lineitem(s, d), "l_orderkey"))
        .unionAll(edge("supplier->lineitem", Tables.supplier(s, d),
          "s_suppkey", Tables.lineitem(s, d), "l_suppkey"))
        .orderBy("edge")
    },

    // Time-to-first-purchase funnel: hours from each user's first
    // 'signup' to their first 'purchase', log₂-bucketed, plus the
    // never-converted count — the activation-latency distribution.
    // Two min-aggregates (never a per-event window), one bounded
    // bucket rollup; the bucket is binary-string length arithmetic
    // (the q238 idiom), no log() call.
    "q356_ttfp" -> { (s, d) =>
      val firsts = Tables.events(s, d)
        .filter(col("event_type").isin("signup", "purchase"))
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "signup",
            expr("unix_micros(ts)"))).as("ts_s"),
          min(when(col("event_type") === "purchase",
            expr("unix_micros(ts)"))).as("ts_p"))
        .filter(col("ts_s").isNotNull)
      val conv = firsts
        .filter(col("ts_p").isNotNull && col("ts_p") >= col("ts_s"))
        .withColumn("hours", expr("(ts_p - ts_s) div 3600000000"))
        .withColumn("bucket",
          expr("CAST(length(bin(hours + 1)) AS BIGINT)"))
      val tot = firsts.agg(count(lit(1)).as("n_signups"))
      conv.groupBy("bucket")
        .agg(count(lit(1)).as("n_users"), min("hours").as("min_hours"),
          max("hours").as("max_hours"))
        .crossJoin(broadcast(tot))
        .withColumn("share_milli", expr("n_users * 1000 div n_signups"))
        .select("bucket", "n_users", "min_hours", "max_hours", "n_signups",
          "share_milli")
        .orderBy("bucket")
    },

    // Seasonal-naive forecast backtest per brand: predict each
    // month's revenue as the same month last year, score MAE (exact
    // cents) and MAPE (milli, cross-multiplied per month then
    // averaged as an integer mean) — the baseline every forecasting
    // pipeline must beat, and the harness that scores it. One
    // month×brand rollup + one self-join on the shifted month key.
    "q357_seasonal_naive_backtest" -> { (s, d) =>
      val by = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"),
          expr("CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)")
            .as("ym"))
        .agg(sum(expr(CentsF)).as("rev_c"))
      by.select(col("p_brand"), col("ym"), col("rev_c"))
        .join(by.select(col("p_brand"), (col("ym") + 100).as("ym"),
          col("rev_c").as("pred_c")), Seq("p_brand", "ym"))
        .withColumn("abs_err_c", expr("abs(rev_c - pred_c)"))
        .withColumn("ape_milli", expr(
          "CASE WHEN rev_c = 0 THEN NULL ELSE abs_err_c * 1000 div rev_c END"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_months"),
          sum("abs_err_c").as("sum_abs_err_c"),
          sum("ape_milli").as("sum_ape_milli"),
          count("ape_milli").as("n_ape"))
        .withColumn("mae_c", expr("sum_abs_err_c div n_months"))
        .withColumn("mape_milli", expr(
          "CASE WHEN n_ape = 0 THEN NULL ELSE sum_ape_milli div n_ape END"))
        .select("p_brand", "n_months", "mae_c", "mape_milli")
        .orderBy("p_brand")
    },

    // Two-sample Cramér–von Mises statistic (click vs error values):
    // the INTEGRATED ECDF distance — where q95's KS sees only the
    // worst point, CvM sums (F₁−F₂)² over every pooled observation.
    // Fully exact: per-value counts, two GlobalOrder running sums for
    // the cumulative lanes (a global ordered window would be the
    // q338 mistake), and the statistic as ONE integer rational —
    // Σ w·(cum₁·n₂ − cum₂·n₁)² over n₁·n₂·(n₁+n₂)², numerator in
    // the DECIMAL(38,0)/HUGEINT lane (d² alone reaches ~10²³).
    "q358_cramer_von_mises" -> { (s, d) =>
      val vals = Tables.events(s, d)
        .filter(col("event_type").isin("click", "error"))
        .groupBy(expr(VMilliF).as("v"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("c1"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("c2"))
      // both cumulative lanes in ONE GlobalOrder pass — shared bucket
      // probe, shared offsets, shared window
      val cum = graft.plans.GlobalOrder.withRunningSums(
        vals, Seq(col("v")), col("v"),
        Seq(col("c1") -> "cum1", col("c2") -> "cum2"))
      val tot = vals.agg(sum("c1").as("n1"), sum("c2").as("n2"),
        count(lit(1)).as("n_values"))
      cum.crossJoin(broadcast(tot))
        .withColumn("dterm", expr(
          "CAST(cum1 AS DECIMAL(19,0)) * n2 - CAST(cum2 AS DECIMAL(19,0)) * n1"))
        .agg(max("n1").as("n1"), max("n2").as("n2"),
          max("n_values").as("n_values"),
          sum(expr("dterm * dterm * (c1 + c2)")).as("num"))
        .withColumn("t_micro", expr(
          "CASE WHEN n1 = 0 OR n2 = 0 THEN NULL ELSE " +
            "CAST(num * 1000000 div (CAST(n1 AS DECIMAL(19,0)) * n2 * " +
            "(n1 + n2) * (n1 + n2)) AS BIGINT) END"))
        // empty input: the oracle's grouped aggregate emits 0 rows; an
        // ungrouped Spark agg would emit one all-NULL row — align
        .filter(col("n_values").isNotNull)
        .select("n1", "n2", "n_values", "t_micro")
    },

    // Year-over-year revenue SHAPE similarity: each year's daily
    // series becomes a ~365-symbol SAX string (q329's terciles,
    // z-normalized against the GLOBAL moments so years are
    // comparable), and consecutive years are compared by edit
    // distance — "did the seasonal shape change", robust to level
    // shifts by construction. The string assembles from
    // sort-by-day arithmetic (array_sort on (day, sym) structs /
    // ordered string_agg — deterministic on both engines, the q68
    // levenshtein parity), and the whole query runs on the
    // calendar-bounded day frame.
    "q359_yearly_shape_distance" -> { (s, d) =>
      val day = Tables.lineitem(s, d)
        .groupBy(col("l_shipdate").as("day"))
        .agg(sum(expr(CentsF)).as("rev_c"))
      val stats = day.agg(count(lit(1)).as("nd"), sum("rev_c").as("s1"),
        sum(expr("CAST(rev_c AS DECIMAL(19,0)) * CAST(rev_c AS DECIMAL(19,0))"))
          .as("s2"))
      val words = day.crossJoin(broadcast(stats))
        .withColumn("sym", expr(saxSymF(graft.functions.PortableSql.Spark)))
        .groupBy(expr("CAST(year(day) AS BIGINT)").as("yr"))
        .agg(count(lit(1)).as("len"),
          expr("array_join(transform(array_sort(collect_list(" +
            "struct(day, sym))), x -> x.sym), '')").as("w"))
      words.select(col("yr").as("year_a"), col("len").as("len_a"),
          col("w").as("wa"))
        .join(words.select((col("yr") - 1).as("year_a"),
          col("yr").as("year_b"), col("len").as("len_b"), col("w").as("wb")),
          "year_a")
        .withColumn("lev", expr("CAST(levenshtein(wa, wb) AS BIGINT)"))
        .withColumn("sim_milli", expr(
          "(greatest(len_a, len_b) - lev) * 1000 div greatest(len_a, len_b)"))
        .select("year_a", "year_b", "len_a", "len_b", "lev", "sim_milli")
        .orderBy("year_a")
    },

    // Partial autocorrelation (lags 1–3) per event_type via
    // Durbin–Levinson on EXACT moments: one type-partitioned ordered
    // pass emits lag products AND the lag-boundary head/tail sums
    // (non-circular series need them — r_k's cross term is
    // m·(2S − head_k − tail_k), not 2mS), every sum an exact BIGINT,
    // and the r₁→φ₃₃ recursion runs as stepwise DOUBLE columns whose
    // defining text is identical on both engines. The AR-order
    // diagnostic (PACF cutoff) without a single transcendental call.
    "q360_pacf" -> { (s, d) =>
      val Sp = graft.functions.PortableSql.Spark
      val ord = Window.partitionBy("event_type")
        .orderBy(col("tsu"), col("event_id"))
      val e = Tables.events(s, d)
        .withColumn("tsu", expr("unix_micros(ts)"))
        .withColumn("v", expr(VMilliF))
      val lagged = (1 to 3).foldLeft(e) { (df, k) =>
        df.withColumn(s"v_$k", lag("v", k).over(ord))
      }
        .withColumn("rn", row_number().over(ord).cast("long"))
        .withColumn("nn",
          count(lit(1)).over(Window.partitionBy("event_type")))
      // second moments in the DECIMAL(38,0) lane (Σv² crosses 2⁶³ at
      // ~2·10⁹ events per type in milli units — the q321/q344 class)
      val aggCols = Seq(sum(col("v")).as("sv"),
        sum(expr("CAST(v AS DECIMAL(19,0)) * v")).as("qv")) ++
        (1 to 3).flatMap(k => Seq(
          sum(expr(s"CAST(v AS DECIMAL(19,0)) * v_$k")).as(s"p$k"),
          sum(when(expr(s"rn <= $k"), col("v")).otherwise(0L)).as(s"h$k"),
          sum(when(expr(s"rn > nn - $k"), col("v")).otherwise(0L))
            .as(s"t$k")))
      val sums = lagged.groupBy("event_type")
        .agg(count(lit(1)).as("n"), aggCols: _*)
      sums
        .withColumn("r1", expr(pacfRF(Sp, 1)))
        .withColumn("r2", expr(pacfRF(Sp, 2)))
        .withColumn("r3", expr(pacfRF(Sp, 3)))
        .withColumn("phi22", expr(Phi22F))
        .withColumn("phi21", expr(Phi21F))
        .withColumn("phi33", expr(Phi33F))
        .select(col("event_type"), col("n"),
          expr(pacfMicroF("r1")).as("pacf1_micro"),
          expr(pacfMicroF("phi22")).as("pacf2_micro"),
          expr(pacfMicroF("phi33")).as("pacf3_micro"))
        .orderBy("event_type")
    },

    // Benford χ² conformity — the TEST STATISTIC on top of q231's
    // per-digit deviation table: χ²·10⁶ = Σ_d (n_d·10⁶ − N·p_d)² /
    // (N·p_d) over the complete 1–9 digit spine (absent digits
    // contribute their full expected mass via the left join), with
    // the squared term in the DECIMAL/HUGEINT lane, and the verdict
    // an integer compare against the χ²₍₈,0.95₎ critical value —
    // no float ever enters. First-digit fraud screening with a
    // decision, not just a table.
    "q361_benford_chisq" -> { (s, d) =>
      val digits = Tables.orders(s, d)
        .select(expr(
          "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("pc"))
        .withColumn("d", expr(
          "CAST(substr(CAST(pc AS STRING), 1, 1) AS BIGINT)"))
        .groupBy("d").agg(count(lit(1)).as("n_obs"))
      val spine = s.range(1, 10).toDF("d")
      val tot = digits.agg(sum("n_obs").as("n_tot"))
      spine.join(digits, Seq("d"), "left")
        .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
        .crossJoin(broadcast(tot))
        .withColumn("p_micro", expr(Events.BenfordMicroF))
        .withColumn("term_micro", expr(
          "CAST(CAST(n_obs * 1000000 - n_tot * p_micro AS DECIMAL(19,0)) * " +
            "(n_obs * 1000000 - n_tot * p_micro) " +
            "div (CAST(n_tot AS DECIMAL(19,0)) * p_micro) AS BIGINT)"))
        .agg(count(lit(1)).as("n_digits"), max("n_tot").as("n_tot"),
          sum("term_micro").as("chi2_micro"))
        .withColumn("reject_95", expr("chi2_micro > 15507000"))
        .select("n_digits", "n_tot", "chi2_micro", "reject_95")
    },

    // Church–Gale term burstiness for the top-50 collection terms:
    // cf/df (occurrences per containing document) separates topical
    // words (bursty — when they appear, they appear often) from
    // function words (cf ≈ df) — the feature that upgrades df-only
    // stopword lists. One (token, doc) distinct + one token rollup;
    // top-50 is a TakeOrdered heap; ratio exact milli.
    "q362_term_burstiness" -> { (s, d) =>
      TextOps.docsWithToks(s, d)
        .select(col("doc_id"), explode(col("toks")).as("t"))
        .groupBy("t", "doc_id").agg(count(lit(1)).as("n_td"))
        .groupBy("t")
        .agg(count(lit(1)).as("df"), sum("n_td").as("cf"))
        .withColumn("burst_milli", expr("cf * 1000 div df"))
        .withColumn("bursty", expr("cf > 2 * df"))
        .orderBy(col("cf").desc, col("t"))
        .limit(50)
        .select("t", "cf", "df", "burst_milli", "bursty")
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
         |  CAST(CAST(v0-v1 AS HUGEINT) * (v0-v1) +
         |    CAST(v2-v3 AS HUGEINT) * (v2-v3) +
         |    CAST(v4-v5 AS HUGEINT) * (v4-v5) +
         |    CAST(v6-v7 AS HUGEINT) * (v6-v7) AS DOUBLE) AS e1_cc,
         |  CAST(CAST((v0+v1)-(v2+v3) AS HUGEINT) * ((v0+v1)-(v2+v3)) +
         |    CAST((v4+v5)-(v6+v7) AS HUGEINT) * ((v4+v5)-(v6+v7))
         |    AS DOUBLE) AS e2_cc,
         |  CAST(CAST((v0+v1+v2+v3)-(v4+v5+v6+v7) AS HUGEINT) *
         |    ((v0+v1+v2+v3)-(v4+v5+v6+v7)) AS DOUBLE) AS e3_cc
         |FROM g WHERE n_days = 8 ORDER BY blk""".stripMargin,

    "q321_xcorr_lags" ->
      s"""WITH fx AS (
         |  SELECT o_orderdate AS day, COUNT(*) AS xn FROM orders GROUP BY 1),
         |fy AS (
         |  SELECT l_shipdate AS day,
         |    CAST(SUM($CentsF) AS BIGINT) // 100 AS yd
         |  FROM lineitem GROUP BY 1),
         |l AS (
         |  SELECT day, yd, k
         |  FROM fy CROSS JOIN (SELECT UNNEST(range(-3::BIGINT, 4::BIGINT))
         |    AS k) ks),
         |j AS (
         |  SELECT k, xn, yd
         |  FROM l JOIN fx
         |    ON CAST(fx.day AS DATE) = CAST(l.day AS DATE) - CAST(k AS INTEGER)),
         |a AS (
         |  SELECT k, COUNT(*) AS n,
         |    CAST(SUM(xn) AS BIGINT) AS sx, CAST(SUM(yd) AS BIGINT) AS sy,
         |    CAST(SUM(xn * xn) AS BIGINT) AS sxx,
         |    SUM(yd * yd) AS syy_w,
         |    CAST(SUM(xn * yd) AS BIGINT) AS sxy
         |  FROM j GROUP BY 1),
         |a2 AS (
         |  SELECT k, n, sx, sy, sxx, sxy,
         |    ${Du.wideToDouble("syy_w")} AS syy
         |  FROM a)
         |SELECT k, n, sx, sy, sxy,
         |  $RMicroF AS r_micro
         |FROM a2 ORDER BY k""".stripMargin,

    "q322_simpson_diversity" ->
      s"""WITH b AS (SELECT source, ${Du.tokens("text")} AS toks
         |  FROM documents),
         |p AS (SELECT source, unnest(toks) AS t FROM b),
         |c AS (SELECT source, t, COUNT(*) AS n FROM p GROUP BY 1, 2),
         |g AS (
         |  SELECT source, COUNT(*) AS vocab,
         |    CAST(SUM(n) AS BIGINT) AS n_tokens,
         |    CAST(SUM(n * (n - 1)) AS BIGINT) AS s2
         |  FROM c GROUP BY 1)
         |SELECT source, n_tokens, vocab, s2,
         |  CASE WHEN n_tokens <= 1 THEN NULL ELSE
         |    (n_tokens * (n_tokens - 1) - s2) * 1000000 //
         |    (n_tokens * (n_tokens - 1)) END AS simpson_micro
         |FROM g ORDER BY source""".stripMargin,

    "q323_chao1_vocab" ->
      s"""WITH b AS (SELECT source, ${Du.tokens("text")} AS toks
         |  FROM documents),
         |p AS (SELECT source, unnest(toks) AS t FROM b),
         |c AS (SELECT source, t, COUNT(*) AS n FROM p GROUP BY 1, 2),
         |g AS (
         |  SELECT source, COUNT(*) AS vocab,
         |    CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         |    CAST(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
         |  FROM c GROUP BY 1)
         |SELECT source, vocab, f1, f2,
         |  vocab * 1000 + f1 * (f1 - 1) * 1000 // (2 * (f2 + 1))
         |    AS chao1_milli,
         |  vocab * 1000 + f1 * (f1 - 1) * 1000 // (2 * (f2 + 1))
         |    - vocab * 1000 AS undetected_milli
         |FROM g ORDER BY source""".stripMargin,

    "q324_kmv_distinct" ->
      s"""WITH dh AS (
         |  SELECT DISTINCT event_type,
         |    ${Du.hash64("concat('kmv:', cast(user_id as varchar))")} AS h
         |  FROM events),
         |ex AS (SELECT event_type, COUNT(*) AS d_exact FROM dh GROUP BY 1),
         |r AS (
         |  SELECT event_type, h,
         |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
         |  FROM dh),
         |b AS (
         |  SELECT event_type, COUNT(*) AS n_k, CAST(MAX(h) AS BIGINT) AS h_k
         |  FROM r WHERE rk <= 64 GROUP BY 1),
         |e AS (
         |  SELECT ex.event_type, d_exact, n_k, h_k,
         |    CASE WHEN n_k < 64 THEN n_k
         |      ELSE CAST(CAST(63 AS HUGEINT) * 1152921504606846976 // h_k
         |        AS BIGINT) END AS est_ndv
         |  FROM ex JOIN b USING (event_type))
         |SELECT event_type, d_exact, n_k, h_k, est_ndv,
         |  abs(est_ndv - d_exact) * 1000 // d_exact AS err_milli
         |FROM e ORDER BY event_type""".stripMargin,

    "q325_bottomk_sample" ->
      s"""WITH base AS (
         |  SELECT source, lang, doc_id, n_chars,
         |    ${Du.hash64("concat('smp:', cast(doc_id as varchar))")} AS h
         |  FROM documents),
         |f AS (
         |  SELECT source, lang, COUNT(*) AS n_total,
         |    CAST(SUM(n_chars) AS BIGINT) AS chars_sum
         |  FROM base GROUP BY 1, 2),
         |r AS (
         |  SELECT source, lang, n_chars,
         |    ROW_NUMBER() OVER (PARTITION BY source, lang
         |      ORDER BY h, doc_id) AS rk
         |  FROM base),
         |sm AS (
         |  SELECT source, lang, COUNT(*) AS n_sample,
         |    CAST(SUM(n_chars) AS BIGINT) AS chars_s
         |  FROM r WHERE rk <= 50 GROUP BY 1, 2)
         |SELECT source, lang, n_total, n_sample,
         |  chars_sum * 1000 // n_total AS mean_full_milli,
         |  chars_s * 1000 // n_sample AS mean_samp_milli,
         |  chars_s * 1000 // n_sample - chars_sum * 1000 // n_total
         |    AS bias_milli
         |FROM f JOIN sm USING (source, lang)
         |ORDER BY source, lang""".stripMargin,

    "q326_anova_f" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS grp,
        |    (CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100)
        |      AS v
        |  FROM orders),
        |g AS (
        |  SELECT grp, COUNT(*) AS n_g, CAST(SUM(v) AS BIGINT) AS s_g,
        |    CAST(SUM(v * v) AS BIGINT) AS q_g
        |  FROM o GROUP BY 1),
        |t AS (
        |  SELECT COUNT(*) AS k_groups, CAST(SUM(n_g) AS BIGINT) AS n_total,
        |    CAST(SUM(s_g) AS BIGINT) AS s_total,
        |    CAST(SUM(q_g) AS BIGINT) AS q_total,
        |    CAST(SUM(CAST(CAST(s_g AS HUGEINT) * s_g // n_g AS BIGINT))
        |      AS BIGINT) AS sum_sg2_over_ng
        |  FROM g),
        |u AS (
        |  SELECT k_groups, n_total,
        |    sum_sg2_over_ng - CAST(CAST(s_total AS HUGEINT) * s_total
        |      // n_total AS BIGINT) AS ss_between,
        |    q_total - sum_sg2_over_ng AS ss_within
        |  FROM t)
        |SELECT k_groups, n_total, ss_between, ss_within,
        |  CASE WHEN ss_within <= 0 OR k_groups <= 1 THEN NULL ELSE
        |    CAST(CAST(greatest(ss_between, 0) AS HUGEINT)
        |      * (n_total - k_groups) * 1000
        |      // (CAST(ss_within AS HUGEINT) * (k_groups - 1)) AS BIGINT) END
        |    AS f_milli
        |FROM u""".stripMargin,

    "q327_rich_club" ->
      """WITH p AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |pairs AS (
        |  SELECT a.pk AS pa, b.pk AS pb
        |  FROM p a JOIN p b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |deg AS (
        |  SELECT node, COUNT(*) AS deg FROM (
        |    SELECT pa AS node FROM pairs
        |    UNION ALL SELECT pb AS node FROM pairs)
        |  GROUP BY 1),
        |ks AS (SELECT UNNEST([2, 4, 8, 16, 32]) AS k),
        |degk AS (
        |  SELECT k, COUNT(*) AS n_nodes
        |  FROM deg CROSS JOIN ks WHERE deg >= k GROUP BY 1),
        |edk AS (
        |  SELECT k, COUNT(*) AS n_edges
        |  FROM pairs
        |  JOIN deg da ON da.node = pairs.pa
        |  JOIN deg db ON db.node = pairs.pb
        |  CROSS JOIN ks
        |  WHERE da.deg >= k AND db.deg >= k
        |  GROUP BY 1)
        |SELECT CAST(degk.k AS BIGINT) AS k, n_nodes,
        |  COALESCE(n_edges, 0) AS n_edges,
        |  CASE WHEN n_nodes <= 1 THEN NULL ELSE
        |    2 * COALESCE(n_edges, 0) * 1000000 //
        |    (n_nodes * (n_nodes - 1)) END AS phi_micro
        |FROM degk LEFT JOIN edk ON degk.k = edk.k
        |ORDER BY k""".stripMargin,

    "q328_corr_matrix" ->
      s"""WITH li AS (
         |  SELECT CAST(l_quantity AS BIGINT) AS q,
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      // 100 AS p,
         |    CAST(CAST(l_discount AS DECIMAL(5,2)) * 100 AS BIGINT) AS dc
         |  FROM lineitem),
         |a AS (
         |  SELECT COUNT(*) AS n,
         |    CAST(SUM(q) AS BIGINT) AS s_q, CAST(SUM(p) AS BIGINT) AS s_p,
         |    CAST(SUM(dc) AS BIGINT) AS s_d,
         |    CAST(SUM(q * q) AS BIGINT) AS s_qq,
         |    CAST(SUM(p * p) AS BIGINT) AS s_pp,
         |    CAST(SUM(dc * dc) AS BIGINT) AS s_dd,
         |    CAST(SUM(q * p) AS BIGINT) AS s_qp,
         |    CAST(SUM(q * dc) AS BIGINT) AS s_qd,
         |    CAST(SUM(p * dc) AS BIGINT) AS s_pd
         |  FROM li),
         |m AS (
         |  SELECT 'price_disc' AS pair, n, s_p AS sx, s_d AS sy,
         |    s_pp AS sxx, s_dd AS syy, s_pd AS sxy FROM a
         |  UNION ALL
         |  SELECT 'qty_disc', n, s_q, s_d, s_qq, s_dd, s_qd FROM a
         |  UNION ALL
         |  SELECT 'qty_price', n, s_q, s_p, s_qq, s_pp, s_qp FROM a)
         |SELECT pair, n, sx, sy, sxy,
         |  $RMicroF AS r_micro
         |FROM m ORDER BY pair""".stripMargin,

    "q329_sax_motifs" -> {
      s"""WITH day AS (
         |  SELECT l_shipdate AS day, CAST(SUM($CentsF) AS BIGINT) AS rev_c
         |  FROM lineitem GROUP BY 1),
         |stats AS (
         |  SELECT COUNT(*) AS nd, CAST(SUM(rev_c) AS BIGINT) AS s1,
         |    SUM(CAST(rev_c AS HUGEINT) * rev_c) AS s2
         |  FROM day),
         |sym AS (
         |  SELECT ${saxSymF(Du)} AS sym,
         |    ROW_NUMBER() OVER (ORDER BY day) - 1 AS rn
         |  FROM day CROSS JOIN stats),
         |b AS (SELECT rn // 7 AS blk, rn % 7 AS pos, sym FROM sym),
         |g AS (
         |  SELECT blk, COUNT(*) AS n_days,
         |    MAX(CASE WHEN pos = 0 THEN sym END) AS p0,
         |    MAX(CASE WHEN pos = 1 THEN sym END) AS p1,
         |    MAX(CASE WHEN pos = 2 THEN sym END) AS p2,
         |    MAX(CASE WHEN pos = 3 THEN sym END) AS p3,
         |    MAX(CASE WHEN pos = 4 THEN sym END) AS p4,
         |    MAX(CASE WHEN pos = 5 THEN sym END) AS p5,
         |    MAX(CASE WHEN pos = 6 THEN sym END) AS p6
         |  FROM b GROUP BY 1),
         |w AS (
         |  SELECT concat(p0, p1, p2, p3, p4, p5, p6) AS word, blk
         |  FROM g WHERE n_days = 7)
         |SELECT word, COUNT(*) AS n_blocks, MIN(blk) AS first_blk
         |FROM w GROUP BY 1 HAVING COUNT(*) >= 2
         |ORDER BY n_blocks DESC, word""".stripMargin
    },

    "q331_assortativity" ->
      s"""WITH p AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |pairs AS (
         |  SELECT a.pk AS pa, b.pk AS pb
         |  FROM p a JOIN p b ON a.ok = b.ok AND a.pk < b.pk
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |deg AS (
         |  SELECT node, COUNT(*) AS deg FROM (
         |    SELECT pa AS node FROM pairs
         |    UNION ALL SELECT pb AS node FROM pairs)
         |  GROUP BY 1),
         |ed AS (
         |  SELECT da.deg AS da, db.deg AS db
         |  FROM pairs
         |  JOIN deg da ON da.node = pairs.pa
         |  JOIN deg db ON db.node = pairs.pb),
         |sym AS (
         |  SELECT da AS x, db AS y FROM ed
         |  UNION ALL SELECT db AS x, da AS y FROM ed),
         |a AS (
         |  SELECT COUNT(*) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x * x) AS BIGINT) AS sxx,
         |    CAST(SUM(y * y) AS BIGINT) AS syy,
         |    CAST(SUM(x * y) AS BIGINT) AS sxy
         |  FROM sym)
         |SELECT n, sx, sxy, $RMicroF AS r_micro
         |FROM a""".stripMargin,

    "q332_readability" ->
      s"""WITH b AS (
         |  SELECT source,
         |    CAST(len(${Du.tokens("text")}) AS BIGINT) AS w,
         |    CAST(len(list_filter(regexp_split_to_array(text, '[.!?]'),
         |      x -> trim(x) != '')) AS BIGINT) AS sent,
         |    CAST(len(${Du.regexExtractAll("text", "[aeiouyAEIOUY]+")})
         |      AS BIGINT) AS syll
         |  FROM documents),
         |g AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |    CAST(SUM(w) AS BIGINT) AS words,
         |    CAST(SUM(sent) AS BIGINT) AS sents,
         |    CAST(SUM(syll) AS BIGINT) AS sylls
         |  FROM b GROUP BY 1)
         |SELECT source, n_docs, words, sents, sylls,
         |  CASE WHEN sents = 0 OR words = 0 THEN NULL ELSE
         |    206835 - 1015 * words // sents - 84600 * sylls // words END
         |    AS flesch_milli
         |FROM g ORDER BY source""".stripMargin,

    "q333_l_diversity" ->
      """WITH c AS (
        |  SELECT c_mktsegment, c_nationkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS bal_c
        |  FROM customer),
        |banded AS (
        |  SELECT c_mktsegment, c_nationkey,
        |    CASE WHEN bal_c < 0 THEN 0 WHEN bal_c < 250000 THEN 1
        |      WHEN bal_c < 500000 THEN 2 WHEN bal_c < 750000 THEN 3
        |      ELSE 4 END AS band
        |  FROM c),
        |g AS (
        |  SELECT c_mktsegment, c_nationkey, COUNT(*) AS sz,
        |    COUNT(DISTINCT band) AS l
        |  FROM banded GROUP BY 1, 2),
        |t AS (
        |  SELECT COUNT(*) AS n_groups, CAST(MIN(l) AS BIGINT) AS min_l,
        |    CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_low_l,
        |    CAST(SUM(CASE WHEN l < 3 THEN sz ELSE 0 END) AS BIGINT)
        |      AS n_exposed,
        |    CAST(SUM(sz) AS BIGINT) AS n_customers,
        |    CAST(SUM(l) AS BIGINT) AS l_sum
        |  FROM g)
        |SELECT n_groups, min_l, n_low_l, n_exposed, n_customers,
        |  CASE WHEN n_customers = 0 THEN NULL
        |    ELSE n_exposed * 1000 // n_customers END AS exposed_milli,
        |  CASE WHEN n_groups = 0 THEN NULL
        |    ELSE l_sum * 1000 // n_groups END AS avg_l_milli
        |FROM t""".stripMargin,

    "q334_clv_cohorts" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
        |      AS ym,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS rev_c
        |  FROM orders),
        |first AS (SELECT o_custkey, MIN(ym) AS cym FROM o GROUP BY 1),
        |coh AS (SELECT cym, COUNT(*) AS n_cohort FROM first GROUP BY 1),
        |cells AS (
        |  SELECT f.cym,
        |    (o.ym // 100 - f.cym // 100) * 12 + (o.ym % 100 - f.cym % 100)
        |      AS m_since,
        |    CAST(SUM(rev_c) AS BIGINT) AS rev_c
        |  FROM o JOIN first f ON o.o_custkey = f.o_custkey
        |  WHERE (o.ym // 100 - f.cym // 100) * 12 +
        |    (o.ym % 100 - f.cym % 100) BETWEEN 0 AND 11
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT cells.cym, m_since, n_cohort, rev_c,
        |    CAST(SUM(rev_c) OVER (PARTITION BY cells.cym ORDER BY m_since
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_rev_c
        |  FROM cells JOIN coh ON cells.cym = coh.cym)
        |SELECT cym, m_since, n_cohort, rev_c, cum_rev_c,
        |  cum_rev_c // n_cohort AS clv_c
        |FROM w ORDER BY cym, m_since""".stripMargin,

    "q335_price_movers" -> {
      s"""WITH li AS (
         |  SELECT l_partkey,
         |    CASE WHEN year(l_shipdate) <= 1995 THEN 1 ELSE 2 END AS half,
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS v
         |  FROM lineitem),
         |h AS (
         |  SELECT l_partkey, half, COUNT(*) AS n,
         |    CAST(SUM(v) AS BIGINT) AS s, CAST(SUM(v * v) AS BIGINT) AS q
         |  FROM li GROUP BY 1, 2),
         |j AS (
         |  SELECT a.l_partkey, a.n AS n1, a.s AS s1, a.q AS q1,
         |    b.n AS n2, b.s AS s2, b.q AS q2
         |  FROM h a JOIN h b ON a.l_partkey = b.l_partkey
         |    AND a.half = 1 AND b.half = 2),
         |t AS (SELECT l_partkey, n1, n2, s1, s2, $WelchTF AS t_micro FROM j)
         |SELECT l_partkey, n1, n2, s1 // n1 AS mean1_c, s2 // n2 AS mean2_c,
         |  t_micro
         |FROM t WHERE t_micro IS NOT NULL
         |ORDER BY t_micro DESC, l_partkey
         |LIMIT 20""".stripMargin
    },

    "q336_order_recon" ->
      """WITH lines AS (
        |  SELECT l_orderkey AS okey,
        |    CAST(SUM(
        |      CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |      (100 - CAST(CAST(l_discount AS DECIMAL(5,2)) * 100 AS BIGINT)) *
        |      (100 + CAST(CAST(l_tax AS DECIMAL(5,2)) * 100 AS BIGINT)))
        |      AS BIGINT) AS recon_cpp
        |  FROM lineitem GROUP BY 1),
        |j AS (
        |  SELECT
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000
        |      AS total_cpp,
        |    recon_cpp,
        |    abs(recon_cpp -
        |      CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * 10000) AS adiff
        |  FROM orders JOIN lines ON o_orderkey = okey),
        |t AS (
        |  SELECT COUNT(*) AS n_orders,
        |    CAST(SUM(CASE WHEN adiff = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_exact,
        |    CAST(SUM(CASE WHEN adiff * 100 <= total_cpp THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_within_1pct,
        |    CAST(MAX(adiff) AS BIGINT) AS max_adiff_cpp,
        |    CAST(SUM(adiff) AS BIGINT) AS sum_adiff_cpp
        |  FROM j)
        |SELECT n_orders, n_exact, n_within_1pct, max_adiff_cpp,
        |  sum_adiff_cpp, n_exact * 1000 // n_orders AS exact_milli
        |FROM t""".stripMargin,

    "q337_modularity" ->
      """WITH p AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |pairs AS (
        |  SELECT a.pk AS pa, b.pk AS pb
        |  FROM p a JOIN p b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |m AS (SELECT COUNT(*) AS m FROM pairs),
        |deg AS (
        |  SELECT node, COUNT(*) AS deg FROM (
        |    SELECT pa AS node FROM pairs
        |    UNION ALL SELECT pb AS node FROM pairs)
        |  GROUP BY 1),
        |dc AS (
        |  SELECT p_brand, CAST(SUM(deg) AS BIGINT) AS d_c
        |  FROM deg JOIN part ON node = p_partkey GROUP BY 1),
        |ec AS (
        |  SELECT ba.p_brand, COUNT(*) AS e_c
        |  FROM pairs
        |  JOIN part ba ON pairs.pa = ba.p_partkey
        |  JOIN part bb ON pairs.pb = bb.p_partkey
        |  WHERE ba.p_brand = bb.p_brand GROUP BY 1),
        |c AS (
        |  SELECT dc.p_brand, d_c, COALESCE(e_c, 0) AS e_c
        |  FROM dc LEFT JOIN ec USING (p_brand)),
        |t AS (
        |  SELECT COUNT(*) AS n_comm, CAST(MAX(m) AS BIGINT) AS m,
        |    CAST(SUM(e_c) AS BIGINT) AS e_within,
        |    CAST(SUM(4 * m * e_c - d_c * d_c) AS BIGINT) AS qnum
        |  FROM c CROSS JOIN m)
        |SELECT n_comm, m, e_within, qnum,
        |  CASE WHEN qnum >= 0 THEN qnum * 1000000 // (4 * m * m)
        |    ELSE -((-qnum) * 1000000 // (4 * m * m)) END AS q_micro
        |FROM t""".stripMargin,

    "q338_qq_shift" -> {
      val picks = (1 to 9).map(j =>
        s"CAST(MAX(CASE WHEN rn * 10 >= $j * n AND (rn - 1) * 10 < $j * n " +
          s"THEN v END) AS BIGINT) AS d$j").mkString(",\n        |    ")
      val flat = (1 to 9).map(j =>
        s"a.d$j AS a$j, b.d$j AS b$j").mkString(", ")
      val arms = (1 to 9).map(j =>
        s"SELECT $j AS decile, a$j AS q1_c, b$j AS q2_c FROM j")
        .mkString("\n        |  UNION ALL ")
      s"""WITH base AS (
         |  SELECT CASE WHEN year(o_orderdate) <= 1995 THEN 1 ELSE 2 END
         |      AS half,
         |    o_orderkey,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         |  FROM orders),
         |r AS (
         |  SELECT half, v,
         |    ROW_NUMBER() OVER (PARTITION BY half ORDER BY v, o_orderkey)
         |      AS rn,
         |    COUNT(*) OVER (PARTITION BY half) AS n
         |  FROM base),
         |h AS (
         |  SELECT half,
         |    $picks
         |  FROM r GROUP BY 1),
         |j AS (SELECT $flat FROM h a JOIN h b
         |  ON a.half = 1 AND b.half = 2),
         |u AS (
         |  $arms)
         |SELECT CAST(decile AS BIGINT) AS decile, q1_c, q2_c,
         |  q2_c - q1_c AS shift_c,
         |  CASE WHEN q2_c >= q1_c THEN (q2_c - q1_c) * 1000 // q1_c
         |    ELSE -((q1_c - q2_c) * 1000 // q1_c) END AS shift_milli
         |FROM u ORDER BY decile""".stripMargin
    },

    "q339_stylometry" -> {
      s"""WITH b AS (SELECT source, ${Du.tokens("text")} AS toks
         |  FROM documents),
         |tk AS (SELECT source, unnest(toks) AS t FROM b),
         |counts AS (SELECT source, t, COUNT(*) AS n_st FROM tk GROUP BY 1, 2),
         |totals AS (
         |  SELECT source, CAST(SUM(n_st) AS BIGINT) AS n_s
         |  FROM counts GROUP BY 1),
         |top AS (
         |  SELECT t FROM (
         |    SELECT t, CAST(SUM(n_st) AS BIGINT) AS n_t
         |    FROM counts GROUP BY 1)
         |  ORDER BY n_t DESC, t LIMIT 50),
         |filled AS (
         |  SELECT totals.source, n_s, top.t,
         |    COALESCE(n_st, 0) * 1000000 // n_s AS r
         |  FROM totals CROSS JOIN top
         |  LEFT JOIN counts
         |    ON counts.source = totals.source AND counts.t = top.t),
         |stats AS (
         |  SELECT t, COUNT(*) AS ns, CAST(SUM(r) AS BIGINT) AS sr,
         |    CAST(SUM(r * r) AS BIGINT) AS srr
         |  FROM filled GROUP BY 1),
         |z AS (
         |  SELECT filled.t, source, r, ns, sr, srr
         |  FROM filled JOIN stats ON filled.t = stats.t),
         |pr AS (
         |  SELECT a.source AS src_a, b.source AS src_b, a.ns AS ns,
         |    a.sr AS sr, a.srr AS srr, a.r AS ra, b.r AS rb
         |  FROM z a JOIN z b ON a.t = b.t AND a.source < b.source),
         |q AS (
         |  SELECT src_a, src_b,
         |    CAST(floor(abs((${styZF("ra")}) - (${styZF("rb")})) *
         |      CAST(1000000 AS DOUBLE)) AS BIGINT) AS zdiff
         |  FROM pr)
         |SELECT src_a, src_b, COUNT(*) AS n_tokens,
         |  CAST(SUM(zdiff) AS BIGINT) // (COUNT(*) * 1000) AS delta_milli
         |FROM q GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    "q341_price_volume" ->
      """WITH by AS (
        |  SELECT p_brand, year(l_shipdate) AS yr,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS r
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE year(l_shipdate) IN (1995, 1996)
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT a.p_brand, a.q AS q0, b.q AS q1, a.r AS r0, b.r AS r1
        |  FROM by a JOIN by b ON a.p_brand = b.p_brand
        |    AND a.yr = 1995 AND b.yr = 1996),
        |t AS (
        |  SELECT p_brand, q0, q1, r0, r1, r1 - r0 AS dr_c,
        |    r1 * q0 // q1 - r0 AS pe_c
        |  FROM j)
        |SELECT p_brand, q0, q1, r0, r1, dr_c, pe_c, dr_c - pe_c AS ve_c
        |FROM t ORDER BY p_brand""".stripMargin,

    "q342_gini_importance" ->
      """WITH li AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos,
        |    CAST(CAST(l_discount AS DECIMAL(5,2)) * 100 AS BIGINT) AS disc,
        |    CAST(l_quantity AS BIGINT) // 10 AS qb,
        |    CAST(month(l_shipdate) AS BIGINT) AS mo
        |  FROM lineitem),
        |groups AS (
        |  SELECT 'disc_band' AS feature, COUNT(*) AS n_g,
        |    CAST(SUM(pos) AS BIGINT) AS pos_g
        |  FROM li GROUP BY feature, disc
        |  UNION ALL
        |  SELECT 'month', COUNT(*), CAST(SUM(pos) AS BIGINT)
        |  FROM li GROUP BY 1, mo
        |  UNION ALL
        |  SELECT 'qty_decade', COUNT(*), CAST(SUM(pos) AS BIGINT)
        |  FROM li GROUP BY 1, qb),
        |tot AS (
        |  SELECT COUNT(*) AS nn, CAST(SUM(pos) AS BIGINT) AS pp FROM li),
        |terms AS (
        |  SELECT feature,
        |    CAST(CAST(2 AS HUGEINT) * pos_g * (n_g - pos_g) * 1000000
        |      // (CAST(n_g AS HUGEINT) * nn) AS BIGINT) AS term_micro,
        |    CAST(CAST(2 AS HUGEINT) * pp * (nn - pp) * 1000000
        |      // (CAST(nn AS HUGEINT) * nn) AS BIGINT) AS before_micro
        |  FROM groups CROSS JOIN tot),
        |g AS (
        |  SELECT feature, COUNT(*) AS n_groups,
        |    CAST(SUM(term_micro) AS BIGINT) AS after_micro,
        |    CAST(MAX(before_micro) AS BIGINT) AS before_micro
        |  FROM terms GROUP BY 1)
        |SELECT feature, n_groups, before_micro, after_micro,
        |  before_micro - after_micro AS drop_micro
        |FROM g ORDER BY drop_micro DESC, feature""".stripMargin,

    "q343_nelson_aalen" ->
      """WITH subj AS (
        |  SELECT
        |    CASE WHEN CAST(l_shipdate AS DATE) <= DATE '1998-06-01'
        |      THEN date_diff('day', CAST(o_orderdate AS DATE),
        |        CAST(l_shipdate AS DATE))
        |      ELSE date_diff('day', CAST(o_orderdate AS DATE),
        |        DATE '1998-06-01') END AS obs,
        |    CASE WHEN CAST(l_shipdate AS DATE) <= DATE '1998-06-01'
        |      THEN 1 ELSE 0 END AS ev
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE CAST(o_orderdate AS DATE) <= DATE '1998-06-01'),
        |steps AS (
        |  SELECT obs, COUNT(*) AS c_all, CAST(SUM(ev) AS BIGINT) AS d
        |  FROM subj GROUP BY 1),
        |n AS (SELECT CAST(SUM(c_all) AS BIGINT) AS n_total FROM steps),
        |r AS (
        |  SELECT obs, c_all, d, n_total,
        |    CAST(SUM(c_all) OVER (ORDER BY obs
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_le
        |  FROM steps CROSS JOIN n),
        |e AS (
        |  SELECT obs AS t_days, d,
        |    n_total - cum_le + c_all AS n_risk,
        |    d * 1000000 // (n_total - cum_le + c_all) AS h_step_micro
        |  FROM r WHERE d > 0)
        |SELECT t_days, d, n_risk, h_step_micro,
        |  CAST(SUM(h_step_micro) OVER (ORDER BY t_days
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS h_cum_micro
        |FROM e ORDER BY t_days""".stripMargin,

    "q344_rescaled_range" ->
      s"""WITH day AS (
        |  SELECT l_shipdate AS day,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) // 100 AS v
        |  FROM lineitem GROUP BY 1),
        |r0 AS (
        |  SELECT v, ROW_NUMBER() OVER (ORDER BY day) - 1 AS rn FROM day),
        |e AS (
        |  SELECT v, rn, k.w, rn // k.w AS blk, rn % k.w AS pos
        |  FROM r0 CROSS JOIN (SELECT UNNEST([8, 16, 32]) AS w) k),
        |wnd AS (
        |  SELECT w, blk, pos, v,
        |    CAST(SUM(v) OVER (PARTITION BY w, blk ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum,
        |    CAST(SUM(v) OVER (PARTITION BY w, blk) AS BIGINT) AS ss,
        |    SUM(v * v) OVER (PARTITION BY w, blk) AS qq,
        |    COUNT(*) OVER (PARTITION BY w, blk) AS cnt
        |  FROM e),
        |blkrows AS (
        |  SELECT w, blk, cnt, ss, qq,
        |    w * cum - (pos + 1) * ss AS nj
        |  FROM wnd),
        |g AS (
        |  SELECT w, blk, MAX(cnt) AS cnt, MAX(ss) AS ss, MAX(qq) AS qq,
        |    CAST(MAX(nj) AS BIGINT) AS mx, CAST(MIN(nj) AS BIGINT) AS mn
        |  FROM blkrows GROUP BY 1, 2),
        |rs AS (
        |  SELECT w, blk,
        |    CASE WHEN cnt != w
        |        OR w * qq - CAST(ss AS HUGEINT) * ss <= 0 THEN NULL ELSE
        |      CAST(floor(CAST(greatest(mx, CAST(0 AS BIGINT)) -
        |        least(mn, CAST(0 AS BIGINT)) AS DOUBLE) /
        |        sqrt(${Du.wideToDouble("w * qq - CAST(ss AS HUGEINT) * ss")}) *
        |        CAST(1000000 AS DOUBLE)) AS BIGINT) END AS rs_micro
        |  FROM g)
        |SELECT CAST(w AS BIGINT) AS w, COUNT(*) AS n_blocks,
        |  CAST(SUM(rs_micro) AS BIGINT) // COUNT(*) AS mean_rs_micro,
        |  CAST(MAX(rs_micro) AS BIGINT) AS max_rs_micro
        |FROM rs WHERE rs_micro IS NOT NULL
        |GROUP BY 1 ORDER BY w""".stripMargin,

    "q345_topk_stability" ->
      """WITH rv AS (
        |  SELECT CAST((year(l_shipdate) - 1992) * 12 + month(l_shipdate) - 1
        |      AS BIGINT) AS mi,
        |    l_partkey AS pk,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem GROUP BY 1, 2),
        |tops AS (
        |  SELECT mi, pk FROM (
        |    SELECT mi, pk,
        |      ROW_NUMBER() OVER (PARTITION BY mi ORDER BY rev_c DESC, pk)
        |        AS rk
        |    FROM rv)
        |  WHERE rk <= 100),
        |counts AS (SELECT mi, COUNT(*) AS n_top FROM tops GROUP BY 1),
        |ov AS (
        |  SELECT a.mi, COUNT(*) AS n_overlap
        |  FROM tops a JOIN tops b ON a.mi = b.mi - 1 AND a.pk = b.pk
        |  GROUP BY 1)
        |SELECT a.mi AS mi_a, a.n_top AS n_a, b.n_top AS n_b,
        |  COALESCE(n_overlap, 0) AS n_overlap,
        |  COALESCE(n_overlap, 0) * 1000 // a.n_top AS stability_milli
        |FROM counts a
        |JOIN counts b ON a.mi + 1 = b.mi
        |LEFT JOIN ov ON ov.mi = a.mi
        |ORDER BY mi_a""".stripMargin,

    "q346_srm_check" ->
      s"""WITH u AS (
         |  SELECT DISTINCT user_id FROM events),
         |arms AS (
         |  SELECT ${Du.hash64("concat('ab:', user_id)")} % 2 AS arm FROM u),
         |a AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
         |  FROM arms)
         |SELECT n0, n1,
         |  CASE WHEN n0 + n1 = 0 THEN NULL
         |    ELSE (n0 - n1) * (n0 - n1) * 1000000 // (n0 + n1) END
         |    AS chi_micro,
         |  (n0 - n1) * (n0 - n1) * 1000000 > 3841459 * (n0 + n1) AS srm_flag
         |FROM a""".stripMargin,

    "q347_new_vs_returning" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |    CAST(year(ts) * 100 + month(ts) AS BIGINT) AS ym
        |  FROM events),
        |f AS (SELECT user_id, MIN(ym) AS fym FROM ud GROUP BY 1),
        |g AS (
        |  SELECT ym, COUNT(*) AS n_active,
        |    CAST(SUM(CASE WHEN ym = fym THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_new
        |  FROM ud JOIN f USING (user_id) GROUP BY 1)
        |SELECT ym, n_active, n_new, n_active - n_new AS n_returning,
        |  n_new * 1000 // n_active AS new_milli
        |FROM g ORDER BY ym""".stripMargin,

    "q348_negative_sampling" ->
      s"""WITH mx AS (SELECT CAST(MAX(p_partkey) AS BIGINT) AS mx FROM part),
         |cand0 AS (
         |  SELECT
         |    1 + ${Du.hash64("concat('nega:', i)")} % mx AS ra,
         |    1 + ${Du.hash64("concat('negb:', i)")} % mx AS rb
         |  FROM mx CROSS JOIN
         |    (SELECT UNNEST(range(0::BIGINT, 10000::BIGINT)) AS i) ix),
         |cand AS (
         |  SELECT least(ra, rb) AS pa, greatest(ra, rb) AS pb
         |  FROM cand0 WHERE ra != rb),
         |cd AS (SELECT DISTINCT pa, pb FROM cand),
         |p AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |pos AS (
         |  SELECT a.pk AS pa, b.pk AS pb
         |  FROM p a JOIN p b ON a.ok = b.ok AND a.pk < b.pk
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |hits AS (
         |  SELECT COUNT(*) AS n_false_neg
         |  FROM cd JOIN pos ON cd.pa = pos.pa AND cd.pb = pos.pb),
         |t AS (
         |  SELECT (SELECT COUNT(*) FROM cand) AS n_cand,
         |    (SELECT COUNT(*) FROM cd) AS n_distinct,
         |    n_false_neg
         |  FROM hits)
         |SELECT n_cand, n_distinct, n_false_neg,
         |  n_false_neg * 1000 // n_distinct AS fn_milli
         |FROM t""".stripMargin,

    "q349_kmv_set_ops" ->
      s"""WITH a AS (
         |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         |b AS (
         |  SELECT DISTINCT user_id FROM events
         |  WHERE event_type = 'purchase'),
         |ha AS (SELECT ${Du.hash64("concat('kset:', user_id)")} AS h FROM a),
         |hb AS (SELECT ${Du.hash64("concat('kset:', user_id)")} AS h FROM b),
         |bka AS (SELECT h FROM ha ORDER BY h LIMIT 64),
         |bkb AS (SELECT h FROM hb ORDER BY h LIMIT 64),
         |bku AS (
         |  SELECT h FROM (SELECT DISTINCT h FROM (
         |    SELECT h FROM ha UNION ALL SELECT h FROM hb))
         |  ORDER BY h LIMIT 64),
         |sk AS (
         |  SELECT (SELECT COUNT(*) FROM bku) AS n_u,
         |    (SELECT CAST(MAX(h) AS BIGINT) FROM bku) AS h_k,
         |    (SELECT COUNT(*) FROM bku
         |     JOIN bka ON bku.h = bka.h
         |     JOIN bkb ON bku.h = bkb.h) AS n_both),
         |ex AS (
         |  SELECT
         |    (SELECT COUNT(*) FROM a) AS exact_a,
         |    (SELECT COUNT(*) FROM b) AS exact_b,
         |    (SELECT COUNT(*) FROM a JOIN b USING (user_id)) AS exact_inter),
         |t AS (
         |  SELECT exact_a, exact_b,
         |    exact_a + exact_b - exact_inter AS exact_union, exact_inter,
         |    n_u, n_both,
         |    CASE WHEN n_u < 64 THEN n_u ELSE
         |      CAST(CAST(63 AS HUGEINT) * 1152921504606846976 // h_k
         |        AS BIGINT) END AS est_union
         |  FROM ex CROSS JOIN sk),
         |u AS (
         |  SELECT t.*,
         |    n_both * est_union // least(CAST(64 AS BIGINT), n_u) AS est_inter
         |  FROM t)
         |SELECT exact_a, exact_b, exact_union, exact_inter, n_u, n_both,
         |  est_union, est_inter,
         |  CASE WHEN exact_union = 0 THEN NULL
         |    ELSE abs(est_union - exact_union) * 1000 // exact_union END
         |    AS err_union_milli,
         |  CASE WHEN exact_inter = 0 THEN NULL
         |    ELSE abs(est_inter - exact_inter) * 1000 // exact_inter END
         |    AS err_inter_milli
         |FROM u""".stripMargin,

    "q350_median_ci" -> {
      s"""WITH base AS (
         |  SELECT event_type, event_id, $VMilliF AS vmilli FROM events),
         |tg AS (
         |  SELECT event_type, n, $CiLoF AS lo_rank, $CiHiF AS hi_rank
         |  FROM (SELECT event_type, COUNT(*) AS n FROM base GROUP BY 1)),
         |r AS (
         |  SELECT b.event_type, vmilli,
         |    ROW_NUMBER() OVER (PARTITION BY b.event_type
         |      ORDER BY vmilli, event_id) AS rn,
         |    n, lo_rank, hi_rank
         |  FROM base b JOIN tg ON b.event_type = tg.event_type)
         |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
         |  CAST(MAX(lo_rank) AS BIGINT) AS lo_rank,
         |  CAST(MAX(hi_rank) AS BIGINT) AS hi_rank,
         |  CAST(MAX(CASE WHEN rn = lo_rank THEN vmilli END) AS BIGINT)
         |    AS ci_lo,
         |  CAST(MAX(CASE WHEN rn * 2 >= n AND (rn - 1) * 2 < n
         |    THEN vmilli END) AS BIGINT) AS med,
         |  CAST(MAX(CASE WHEN rn = hi_rank THEN vmilli END) AS BIGINT)
         |    AS ci_hi
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q351_co_burst" ->
      """WITH mins AS (
        |  SELECT date_trunc('minute', ts) AS mn, event_type,
        |    COUNT(*) AS cnt
        |  FROM events WHERE event_type IN ('click', 'error')
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, mn, cnt,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY cnt, mn) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM mins),
        |med AS (
        |  SELECT event_type,
        |    CAST(MAX(CASE WHEN rn * 2 >= n AND (rn - 1) * 2 < n
        |      THEN cnt END) AS BIGINT) AS med
        |  FROM r GROUP BY 1),
        |fl AS (
        |  SELECT mins.mn, mins.event_type,
        |    CASE WHEN cnt > med THEN 1 ELSE 0 END AS hot
        |  FROM mins JOIN med ON mins.event_type = med.event_type),
        |c AS (SELECT mn, hot AS hot_c FROM fl WHERE event_type = 'click'),
        |e AS (SELECT mn, hot AS hot_e FROM fl WHERE event_type = 'error'),
        |t AS (
        |  SELECT COUNT(*) AS n_minutes,
        |    CAST(SUM(hot_c) AS BIGINT) AS n_hot_click,
        |    CAST(SUM(hot_e) AS BIGINT) AS n_hot_error,
        |    CAST(SUM(hot_c * hot_e) AS BIGINT) AS n_both
        |  FROM c JOIN e USING (mn))
        |SELECT n_minutes, n_hot_click, n_hot_error, n_both,
        |  CASE WHEN n_hot_click = 0 OR n_hot_error = 0 THEN NULL
        |    ELSE n_both * n_minutes * 1000 // (n_hot_click * n_hot_error)
        |    END AS lift_milli
        |FROM t""".stripMargin,

    "q352_hodges_lehmann" ->
      s"""WITH h AS (
         |  SELECT event_type, $VMilliF // 1000 AS vu, COUNT(*) AS c
         |  FROM events WHERE event_type IN ('click', 'error')
         |  GROUP BY 1, 2),
         |h1 AS (SELECT vu AS v1, c AS c1 FROM h WHERE event_type = 'click'),
         |h2 AS (SELECT vu AS v2, c AS c2 FROM h WHERE event_type = 'error'),
         |diff AS (
         |  SELECT v1 - v2 AS d, CAST(SUM(c1 * c2) AS BIGINT) AS w
         |  FROM h1 CROSS JOIN h2 GROUP BY 1),
         |tot AS (
         |  SELECT CAST(SUM(w) AS BIGINT) AS tw, COUNT(*) AS n_cells
         |  FROM diff),
         |run AS (
         |  SELECT d, w,
         |    CAST(SUM(w) OVER (ORDER BY d
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cw
         |  FROM diff)
         |SELECT d AS hl_shift_unit, cw, tw, n_cells
         |FROM run CROSS JOIN tot
         |WHERE cw * 2 >= tw AND (cw - w) * 2 < tw""".stripMargin,

    "q353_theil_sen" ->
      """WITH day AS (
        |  SELECT o_orderdate AS day, COUNT(*) AS y FROM orders GROUP BY 1),
        |dx AS (
        |  SELECT y, ROW_NUMBER() OVER (ORDER BY day) AS x FROM day),
        |sl AS (
        |  SELECT CASE WHEN b.y >= a.y
        |      THEN (b.y - a.y) * 1000 // (b.x - a.x)
        |      ELSE -((a.y - b.y) * 1000 // (b.x - a.x)) END AS sl,
        |    a.x AS xa, b.x AS xb
        |  FROM dx a JOIN dx b ON a.x < b.x),
        |r AS (
        |  SELECT sl,
        |    ROW_NUMBER() OVER (ORDER BY sl, xa, xb) AS rn,
        |    COUNT(*) OVER () AS n
        |  FROM sl)
        |SELECT sl AS slope_milli_per_day, rn, n
        |FROM r WHERE rn * 2 >= n AND (rn - 1) * 2 < n""".stripMargin,

    "q354_mann_kendall" -> {
      val zF =
        "CASE WHEN var18 <= 0 THEN NULL " +
          "WHEN s_stat > 0 THEN CAST(floor((CAST(s_stat AS DOUBLE) - " +
          "CAST(1 AS DOUBLE)) / sqrt(CAST(var18 AS DOUBLE) / " +
          "CAST(18 AS DOUBLE)) * CAST(1000000 AS DOUBLE)) AS BIGINT) " +
          "WHEN s_stat < 0 THEN CAST(floor((CAST(s_stat AS DOUBLE) + " +
          "CAST(1 AS DOUBLE)) / sqrt(CAST(var18 AS DOUBLE) / " +
          "CAST(18 AS DOUBLE)) * CAST(1000000 AS DOUBLE)) AS BIGINT) " +
          "ELSE 0 END"
      s"""WITH day AS (
         |  SELECT o_orderdate AS day, COUNT(*) AS y FROM orders GROUP BY 1),
         |dx AS (
         |  SELECT y, ROW_NUMBER() OVER (ORDER BY day) AS x FROM day),
         |p AS (
         |  SELECT COUNT(*) AS n_pairs,
         |    CAST(SUM(CASE WHEN b.y > a.y THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_up,
         |    CAST(SUM(CASE WHEN b.y < a.y THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_down
         |  FROM dx a JOIN dx b ON a.x < b.x),
         |ties AS (
         |  SELECT COUNT(*) AS n_levels,
         |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
         |  FROM (SELECT y, COUNT(*) AS t FROM day GROUP BY 1)),
         |nr AS (SELECT COUNT(*) AS nd FROM day),
         |t AS (
         |  SELECT nd, n_pairs, n_up - n_down AS s_stat,
         |    nd * (nd - 1) * (2 * nd + 5) - tie18 AS var18
         |  FROM p CROSS JOIN ties CROSS JOIN nr)
         |SELECT nd, n_pairs, s_stat, var18, $zF AS z_micro
         |FROM t""".stripMargin
    },

    "q355_fk_cardinality" ->
      """WITH e1 AS (
        |  SELECT 'customer->orders' AS edge, p.k, COALESCE(c.c, 0) AS c
        |  FROM (SELECT DISTINCT c_custkey AS k FROM customer) p
        |  LEFT JOIN (SELECT o_custkey AS k, COUNT(*) AS c FROM orders
        |             GROUP BY 1) c USING (k)),
        |e2 AS (
        |  SELECT 'orders->lineitem' AS edge, p.k, COALESCE(c.c, 0) AS c
        |  FROM (SELECT DISTINCT o_orderkey AS k FROM orders) p
        |  LEFT JOIN (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem
        |             GROUP BY 1) c USING (k)),
        |e3 AS (
        |  SELECT 'supplier->lineitem' AS edge, p.k, COALESCE(c.c, 0) AS c
        |  FROM (SELECT DISTINCT s_suppkey AS k FROM supplier) p
        |  LEFT JOIN (SELECT l_suppkey AS k, COUNT(*) AS c FROM lineitem
        |             GROUP BY 1) c USING (k)),
        |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2
        |      UNION ALL SELECT * FROM e3)
        |SELECT edge, COUNT(*) AS n_parents,
        |  CAST(SUM(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_childless,
        |  CAST(MIN(c) AS BIGINT) AS min_children,
        |  CAST(MAX(c) AS BIGINT) AS max_children,
        |  CAST(SUM(c) AS BIGINT) AS n_children,
        |  CAST(SUM(c) AS BIGINT) * 1000 // COUNT(*) AS mean_children_milli
        |FROM u GROUP BY 1 ORDER BY edge""".stripMargin,

    "q356_ttfp" ->
      """WITH f AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup'
        |      THEN epoch_us(ts::TIMESTAMP) END) AS ts_s,
        |    MIN(CASE WHEN event_type = 'purchase'
        |      THEN epoch_us(ts::TIMESTAMP) END) AS ts_p
        |  FROM events WHERE event_type IN ('signup', 'purchase')
        |  GROUP BY 1),
        |s AS (SELECT * FROM f WHERE ts_s IS NOT NULL),
        |tot AS (SELECT COUNT(*) AS n_signups FROM s),
        |conv AS (
        |  SELECT (ts_p - ts_s) // 3600000000 AS hours
        |  FROM s WHERE ts_p IS NOT NULL AND ts_p >= ts_s),
        |b AS (
        |  SELECT CAST(length(bin(hours + 1)) AS BIGINT) AS bucket, hours
        |  FROM conv)
        |SELECT bucket, COUNT(*) AS n_users,
        |  CAST(MIN(hours) AS BIGINT) AS min_hours,
        |  CAST(MAX(hours) AS BIGINT) AS max_hours,
        |  n_signups,
        |  COUNT(*) * 1000 // n_signups AS share_milli
        |FROM b CROSS JOIN tot
        |GROUP BY bucket, n_signups ORDER BY bucket""".stripMargin,

    "q357_seasonal_naive_backtest" ->
      """WITH by AS (
        |  SELECT p_brand,
        |    CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)
        |      AS ym,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT a.p_brand, a.ym, a.rev_c, b.rev_c AS pred_c,
        |    abs(a.rev_c - b.rev_c) AS abs_err_c,
        |    CASE WHEN a.rev_c = 0 THEN NULL
        |      ELSE abs(a.rev_c - b.rev_c) * 1000 // a.rev_c END AS ape_milli
        |  FROM by a JOIN by b
        |    ON a.p_brand = b.p_brand AND a.ym = b.ym + 100)
        |SELECT p_brand, COUNT(*) AS n_months,
        |  CAST(SUM(abs_err_c) AS BIGINT) // COUNT(*) AS mae_c,
        |  CASE WHEN COUNT(ape_milli) = 0 THEN NULL
        |    ELSE CAST(SUM(ape_milli) AS BIGINT) // COUNT(ape_milli) END
        |    AS mape_milli
        |FROM j GROUP BY 1 ORDER BY p_brand""".stripMargin,

    "q358_cramer_von_mises" ->
      s"""WITH vals AS (
         |  SELECT $VMilliF AS v,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c1,
         |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c2
         |  FROM events WHERE event_type IN ('click', 'error')
         |  GROUP BY 1),
         |cum AS (
         |  SELECT v, c1, c2,
         |    CAST(SUM(c1) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum1,
         |    CAST(SUM(c2) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum2
         |  FROM vals),
         |tot AS (
         |  SELECT CAST(SUM(c1) AS BIGINT) AS n1,
         |    CAST(SUM(c2) AS BIGINT) AS n2,
         |    COUNT(*) AS n_values
         |  FROM vals),
         |agg AS (
         |  SELECT n1, n2, n_values,
         |    SUM((CAST(cum1 AS HUGEINT) * n2 - CAST(cum2 AS HUGEINT) * n1)
         |      * (CAST(cum1 AS HUGEINT) * n2 - CAST(cum2 AS HUGEINT) * n1)
         |      * (c1 + c2)) AS num
         |  FROM cum CROSS JOIN tot
         |  GROUP BY 1, 2, 3)
         |SELECT n1, n2, n_values,
         |  CASE WHEN n1 = 0 OR n2 = 0 THEN NULL ELSE
         |    CAST(num * 1000000 // (CAST(n1 AS HUGEINT) * n2 *
         |      (n1 + n2) * (n1 + n2)) AS BIGINT) END AS t_micro
         |FROM agg""".stripMargin,

    "q359_yearly_shape_distance" ->
      s"""WITH day AS (
         |  SELECT l_shipdate AS day,
         |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS rev_c
         |  FROM lineitem GROUP BY 1),
         |stats AS (
         |  SELECT COUNT(*) AS nd, CAST(SUM(rev_c) AS BIGINT) AS s1,
         |    SUM(CAST(rev_c AS HUGEINT) * rev_c) AS s2
         |  FROM day),
         |sym AS (
         |  SELECT CAST(year(day) AS BIGINT) AS yr, day, ${saxSymF(Du)} AS sym
         |  FROM day CROSS JOIN stats),
         |words AS (
         |  SELECT yr, COUNT(*) AS len,
         |    string_agg(sym, '' ORDER BY day) AS w
         |  FROM sym GROUP BY 1)
         |SELECT a.yr AS year_a, b.yr AS year_b,
         |  a.len AS len_a, b.len AS len_b,
         |  CAST(levenshtein(a.w, b.w) AS BIGINT) AS lev,
         |  (greatest(a.len, b.len) - CAST(levenshtein(a.w, b.w) AS BIGINT))
         |    * 1000 // greatest(a.len, b.len) AS sim_milli
         |FROM words a JOIN words b ON b.yr = a.yr + 1
         |ORDER BY year_a""".stripMargin,

    "q360_pacf" -> {
      val sumArms = (1 to 3).map(k =>
        s"SUM(v * v_$k) AS p$k,\n" +
          s"        |    CAST(SUM(CASE WHEN rn <= $k THEN v ELSE 0 END) " +
          s"AS BIGINT) AS h$k,\n" +
          s"        |    CAST(SUM(CASE WHEN rn > nn - $k THEN v ELSE 0 END) " +
          s"AS BIGINT) AS t$k").mkString(",\n        |    ")
      s"""WITH e AS (
         |  SELECT event_type, event_id, epoch_us(ts::TIMESTAMP) AS tsu,
         |    $VMilliF AS v
         |  FROM events),
         |l AS (
         |  SELECT event_type, v,
         |    LAG(v, 1) OVER w AS v_1, LAG(v, 2) OVER w AS v_2,
         |    LAG(v, 3) OVER w AS v_3,
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
         |  SELECT event_type, n, ${pacfRF(Du, 1)} AS r1,
         |    ${pacfRF(Du, 2)} AS r2,
         |    ${pacfRF(Du, 3)} AS r3
         |  FROM sums),
         |p2 AS (SELECT *, $Phi22F AS phi22 FROM r),
         |p1 AS (SELECT *, $Phi21F AS phi21 FROM p2),
         |p3 AS (SELECT *, $Phi33F AS phi33 FROM p1)
         |SELECT event_type, n,
         |  ${pacfMicroF("r1")} AS pacf1_micro,
         |  ${pacfMicroF("phi22")} AS pacf2_micro,
         |  ${pacfMicroF("phi33")} AS pacf3_micro
         |FROM p3 ORDER BY event_type""".stripMargin
    },

    "q361_benford_chisq" ->
      s"""WITH p AS (
         |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |    AS pc
         |  FROM orders),
         |c AS (
         |  SELECT CAST(substr(CAST(pc AS VARCHAR), 1, 1) AS BIGINT) AS d,
         |    COUNT(*) AS n_obs
         |  FROM p GROUP BY 1),
         |spine AS (SELECT UNNEST(range(1::BIGINT, 10::BIGINT)) AS d),
         |t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_tot FROM c),
         |f0 AS (
         |  SELECT spine.d AS d, COALESCE(n_obs, 0) AS n_obs, n_tot
         |  FROM spine LEFT JOIN c ON spine.d = c.d CROSS JOIN t),
         |f AS (
         |  SELECT d, n_obs, n_tot, ${Events.BenfordMicroF} AS p_micro
         |  FROM f0),
         |terms AS (
         |  SELECT n_tot,
         |    CAST(CAST(n_obs * 1000000 - n_tot * p_micro AS HUGEINT) *
         |      (n_obs * 1000000 - n_tot * p_micro)
         |      // (CAST(n_tot AS HUGEINT) * p_micro) AS BIGINT)
         |      AS term_micro
         |  FROM f)
         |SELECT COUNT(*) AS n_digits, CAST(MAX(n_tot) AS BIGINT) AS n_tot,
         |  CAST(SUM(term_micro) AS BIGINT) AS chi2_micro,
         |  CAST(SUM(term_micro) AS BIGINT) > 15507000 AS reject_95
         |FROM terms""".stripMargin,

    "q362_term_burstiness" ->
      s"""WITH b AS (SELECT doc_id, ${Du.tokens("text")} AS toks
         |  FROM documents),
         |tk AS (SELECT doc_id, unnest(toks) AS t FROM b),
         |td AS (SELECT t, doc_id, COUNT(*) AS n_td FROM tk GROUP BY 1, 2),
         |g AS (
         |  SELECT t, COUNT(*) AS df, CAST(SUM(n_td) AS BIGINT) AS cf
         |  FROM td GROUP BY 1)
         |SELECT t, cf, df, cf * 1000 // df AS burst_milli,
         |  cf > 2 * df AS bursty
         |FROM g ORDER BY cf DESC, t LIMIT 50""".stripMargin)
}
