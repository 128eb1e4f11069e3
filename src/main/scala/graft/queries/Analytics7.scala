package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.SqlDialect

/** Round-8 continuation inventory. Same determinism contract as
  * [[Analytics]]–[[Analytics6]]: integer lanes end-to-end wherever the
  * math allows; floats only through ONE fixed-op-order text shared by
  * both engines; natural-log constants enter as rational literals
  * (the q358/q443 convention), never as engine `ln` calls.
  *
  * Reference behavior: pydala2 exposes none of these — they extend
  * the training-data-pipeline stack (SURVEY.md "beyond the
  * reference"): link-analysis ranking, sequence complexity, survival,
  * sequential testing, extreme-value monitoring, and the
  * margin-criterion parallel-corpus mining step.
  */
object Analytics7 {

  private val Sp = graft.functions.PortableSql.Spark
  private val Du = graft.functions.PortableSql.Duck

  /** The exact cents lane (the Analytics2–6 CentsF convention). */
  private val CentsF =
    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

  /** Ordinal pattern of a consecutive-day triple (a, b, c): each
    * position's rank with ties broken by POSITION (earlier wins), so
    * every triple maps to exactly one of the 6 permutations — the
    * Bandt–Pompe convention that keeps flat stretches deterministic.
    * ONE text interpolated into both engines.
    */
  private val PermCode =
    "((1 + (CASE WHEN b < a THEN 1 ELSE 0 END) + " +
      "(CASE WHEN c < a THEN 1 ELSE 0 END)) * 100 + " +
      "(1 + (CASE WHEN a <= b THEN 1 ELSE 0 END) + " +
      "(CASE WHEN c < b THEN 1 ELSE 0 END)) * 10 + " +
      "(1 + (CASE WHEN a <= c THEN 1 ELSE 0 END) + " +
      "(CASE WHEN b <= c THEN 1 ELSE 0 END)))"

  /** SPRT micro-nat rational constants for H0 p=0.20 vs H1 p=0.25,
    * α = β = 0.05: ln(p1/p0) = ln(1.25) → 223144 µnat,
    * ln((1−p1)/(1−p0)) = ln(0.9375) → −64539 µnat, and the Wald
    * boundary ln((1−β)/α) = ln(19) → 2944439 µnat. Same literals on
    * both engines, so the decision lane is pure integer arithmetic.
    */
  private val LnRatioPos = 223144L
  private val LnRatioNeg = 64539L
  private val WaldBound = 2944439L

  /** Gumbel method-of-moments constants as exactly-parsed rational
    * doubles (integer ÷ power of ten — both engines' BIGINT→DOUBLE
    * casts and the division are correctly rounded, so the constant is
    * the identical double everywhere; the texts are engine-identical,
    * hence plain vals): √6/π, Euler–Mascheroni γ, and −ln(−ln(0.99))
    * for the 100-block return level.
    */
  private val Sqrt6OverPi =
    "(CAST(779696801233676 AS DOUBLE) / CAST(1000000000000000 AS DOUBLE))"
  private val EulerGamma =
    "(CAST(5772156649015329 AS DOUBLE) / CAST(10000000000000000 AS DOUBLE))"
  private val GumbelQ99 =
    "(CAST(4600149226776579 AS DOUBLE) / CAST(1000000000000000 AS DOUBLE))"

  /** Fixed-order mean of the rank-1..8 pivot lanes `<pfx>1..<pfx>8`
    * over `k` present neighbors — the float adds run in pivot-column
    * order on both engines, so the average is bit-identical.
    */
  private def avgTop8(d: SqlDialect, pfx: String, k: String): String =
    s"((${(1 to 8).map(i => s"coalesce($pfx$i, ${d.dblZero})")
      .mkString(" + ")}) / CAST($k AS DOUBLE))"

  /** Difference-margin criterion (Artetxe & Schwenk's margin scoring,
    * the CCMatrix mining rule in its additive form): cos(x, y) minus
    * the mean of the two sides' average-kNN cosines. Engine-identical
    * text, so a shared val (the Sqrt6OverPi convention).
    */
  private val MarginT: String =
    "(cos - ((a_s + a_t) / CAST(2 AS DOUBLE)))"

  /** q508's ARI-to-micro text: ONE exact integer division, with the
    * numerator sign-split (Spark `div` truncates toward zero, DuckDB
    * `//` floors — they agree only on non-negative operands, and
    * 2·T·Σij − 2·Σa·Σb goes negative whenever agreement is below
    * chance). The denominator T·(Σa+Σb) − 2·Σa·Σb = Σa(T−Σb) +
    * Σb(T−Σa) ≥ 0 always (Σa, Σb ≤ T), so only the numerator splits.
    */
  private def ariMicroF(d: SqlDialect): String = {
    val den = s"(${d.wide("t2")} * (sa + sb) - ${d.wide("2")} * sa * sb)"
    val num = s"(${d.wide("2")} * t2 * sij - ${d.wide("2")} * sa * sb)"
    val negNum = s"(${d.wide("2")} * sa * sb - ${d.wide("2")} * t2 * sij)"
    s"CASE WHEN $den = 0 THEN CAST(1000000 AS BIGINT) " +
      s"WHEN $num >= 0 THEN CAST(${d.intDiv(s"$num * 1000000", den)} AS BIGINT) " +
      s"ELSE -CAST(${d.intDiv(s"$negNum * 1000000", den)} AS BIGINT) END"
  }

  /** The q494/q497/q498 mining substrate: a FIXED-size (~25 id)
    * query panel against the rest of the corpus, cosine per pair
    * through the shared sequential fold. Brute-force is the verifier
    * tier (the q33 shape — query panel broadcasts, corpus streams),
    * and the fixed panel keeps it LINEAR in corpus size; at 100 TB
    * the pair frame swaps to the q34/q79 LSH/IVF candidate path with
    * identical downstream scoring.
    */
  /** FIXED-SIZE panel modulus (round-10, verdict #4): ~25 query ids
    * via a count-derived modulus, so the brute-force tier stays
    * LINEAR in corpus size; a fraction panel made it quadratic. At
    * the gate's sf the modulus evaluates to the same 20.
    */
  private def embPanelMod(s: SparkSession, d: String): Long =
    Tables.memo(s, s"$d#a7embmod") {
      import s.implicits._
      Seq(math.max(1L, Tables.embeddings(s, d).count() / 25L)).toDF("m")
    }.head().getLong(0)

  private def embPairs(s: SparkSession, d: String): DataFrame =
    Tables.memo(s, s"$d#a7embpairs") {
      // norms hoisted per VECTOR (n sqrt-folds, not 2 per pair); the
      // per-pair work is the dot fold alone. Op sequence is unchanged
      // vs SqlDialect.cosine — dot, two sqrts, multiply, divide — so
      // the double is bit-identical to the inline form on both engines.
      val m = embPanelMod(s, d)
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          expr(s"sqrt(${Sp.norm2("embedding")})").as("nrm"))
      val src = emb.filter(expr(s"vec_id % $m = 0"))
        .select(col("vec_id").as("sid"), col("embedding").as("se"),
          col("nrm").as("sn"))
      val tgt = emb.filter(expr(s"vec_id % $m <> 0"))
        .select(col("vec_id").as("tid"), col("embedding").as("te"),
          col("nrm").as("tn"))
      tgt.crossJoin(broadcast(src))
        .select(col("sid"), col("tid"),
          expr(s"(${Sp.dot("se", "te")}) / (sn * tn)").as("cos"))
    }

  /** Oracle twin of [[embPairs]] — the src/tgt/pairs CTE prefix,
    * norms hoisted identically.
    */
  private def embPairsCte: String =
    s"""qm AS (
       |  SELECT greatest(1, count(*) // 25) AS m FROM embeddings),
       |src AS (
       |  SELECT vec_id AS sid, embedding AS se,
       |    sqrt(${Du.norm2("embedding")}) AS sn
       |  FROM embeddings, qm WHERE vec_id % qm.m = 0),
       |tgt AS (
       |  SELECT vec_id AS tid, embedding AS te,
       |    sqrt(${Du.norm2("embedding")}) AS tn
       |  FROM embeddings, qm WHERE vec_id % qm.m <> 0),
       |pairs AS (
       |  SELECT sid, tid, (${Du.dot("se", "te")}) / (sn * tn) AS cos
       |  FROM src, tgt)""".stripMargin

  /** Holt–Winters additive recurrence as ONE sequential fold text
    * per engine (q506): acc = [level, trend, s0..s6, count], elements
    * are the day-ordered counts as doubles. Every constant is a
    * rational double and both engines execute the identical op
    * sequence per step, so the final state is bit-identical. The
    * first element initializes level (zero-init elsewhere).
    */
  private def hwFold(d: SqlDialect, xsArr: String): String = {
    def at(i: Int) = if (d.spark) s"element_at(acc, $i)" else s"acc[$i]"
    val v = if (d.spark) "v" else "v[1]"
    def arr(els: Seq[String]) =
      if (d.spark) els.mkString("array(", ", ", ")")
      else els.mkString("[", ", ", "]")
    val A = "(CAST(2 AS DOUBLE) / CAST(10 AS DOUBLE))"
    val A1 = "(CAST(8 AS DOUBLE) / CAST(10 AS DOUBLE))"
    val B = "(CAST(1 AS DOUBLE) / CAST(10 AS DOUBLE))"
    val B1 = "(CAST(9 AS DOUBLE) / CAST(10 AS DOUBLE))"
    val G = "(CAST(3 AS DOUBLE) / CAST(10 AS DOUBLE))"
    val G1 = "(CAST(7 AS DOUBLE) / CAST(10 AS DOUBLE))"
    val si = s"(CAST(${at(10)} AS INT) % 7)"
    val sOld = s"(CASE $si ${(0 to 6).map(j =>
      s"WHEN $j THEN ${at(3 + j)}").mkString(" ")} ELSE ${at(3)} END)"
    val nl = s"($A * ($v - $sOld) + $A1 * (${at(1)} + ${at(2)}))"
    val nt = s"($B * ($nl - ${at(1)}) + $B1 * ${at(2)})"
    val ns = s"($G * ($v - $nl) + $G1 * $sOld)"
    val step = arr(Seq(nl, nt) ++ (0 to 6).map(j =>
      s"CASE WHEN $si = $j THEN $ns ELSE ${at(3 + j)} END") :+
      s"${at(10)} + CAST(1 AS DOUBLE)")
    val first = arr(Seq(v, "CAST(0 AS DOUBLE)") ++
      (0 to 6).map(_ => "CAST(0 AS DOUBLE)") :+ "CAST(1 AS DOUBLE)")
    val init =
      if (d.spark) "array(" + Seq.fill(10)("cast(0 as double)").mkString(", ") + ")"
      else "[" + Seq.fill(10)("0").mkString(", ") + "]::DOUBLE[]"
    val elems =
      if (d.spark) xsArr else s"list_transform($xsArr, w -> [w])"
    d.fold(elems, init, "acc", "v",
      s"CASE WHEN ${at(10)} = CAST(0 AS DOUBLE) THEN $first ELSE $step END")
  }

  /** The Kaplan–Meier event-step table (obs, c_all, d, n_risk,
    * step_micro): ship-latency day grain, d > 0 rows only — shared by
    * q491 and q526 (Greenwood, Analytics8), memoized so the heavy
    * lineitem⋈orders pass runs once per (session, sfDir). Values are
    * exact integers; the memo cannot change them.
    */
  private[queries] def kmEventSteps(s: SparkSession, d: String): DataFrame =
    Tables.memo(s, s"$d#kmsteps") {
      val subj = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(expr("o_orderdate <= DATE '1998-03-01'"))
        .select(
          expr("CASE WHEN l_shipdate <= DATE '1998-03-01' " +
            "THEN datediff(l_shipdate, o_orderdate) " +
            "ELSE datediff(DATE '1998-03-01', o_orderdate) END")
            .cast("long").as("obs"),
          expr("CASE WHEN l_shipdate <= DATE '1998-03-01' THEN 1 ELSE 0 END")
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
        .withColumn("step_micro", expr("(n_risk - d) * 1000000 div n_risk"))
    }

  /** Daily order counts (the q506/q511 series frame). */
  private def dayCounts(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(count(lit(1)).as("x"))

  /** Day-ordered series as doubles — the fold-order-load-bearing
    * collect/sort/transform expression, ONE copy for q506 and q511.
    */
  private val DaySeriesT =
    "transform(sort_array(collect_list(struct(day, x))), " +
      "p -> CAST(p.x AS DOUBLE))"

  /** Post-fold access + forecast texts over the fold result `hw` and
    * the exploded `horizon` column (q506).
    */
  private def hwOut(d: SqlDialect): (String, String, String) = {
    def h(i: Int) = if (d.spark) s"element_at(hw, $i)" else s"hw[$i]"
    val lane = s"(CASE ((CAST(${h(10)} AS INT) + CAST(horizon AS INT) - 1) % 7) " +
      (0 to 6).map(j => s"WHEN $j THEN ${h(3 + j)}").mkString(" ") +
      s" ELSE ${h(3)} END)"
    val fc = s"(${h(1)} + CAST(horizon AS DOUBLE) * ${h(2)} + $lane)"
    (s"CAST(floor(${h(1)} * CAST(1000 AS DOUBLE)) AS BIGINT)",
      s"CAST(floor(${h(2)} * CAST(1000 AS DOUBLE)) AS BIGINT)",
      s"CAST(floor($fc * CAST(1000 AS DOUBLE)) AS BIGINT)")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Holt–Winters additive smoothing (α=0.2, β=0.1, γ=0.3, weekly
    // season) of daily order counts, with the 7-day-ahead forecast
    // table — the seasonal upgrade of q156's EWMA and the model
    // q484's seasonal-naive baseline is judged against. The entire
    // recurrence is ONE sequential fold over the day-ordered series
    // ([[hwFold]]: identical op order on both engines ⇒ bit-exact
    // doubles, zero-init documented); the series array is
    // calendar-bounded (~2.4k doubles at ANY scale), the heavy
    // lifting is the map-side orders→day combine, and the output is
    // horizon × (level, trend, forecast) in floored milli units.
    "q506_holt_winters" -> { (s, d) =>
      val days = dayCounts(s, d)
      val (lv, tr, fc) = hwOut(Sp)
      days.agg(expr(DaySeriesT).as("xs"))
        .withColumn("hw", expr(hwFold(Sp, "xs")))
        .select(col("hw"), explode(expr("sequence(1, 7)")).as("horizon"))
        .selectExpr("CAST(horizon AS BIGINT) AS horizon",
          s"$lv AS level_milli", s"$tr AS trend_milli",
          s"$fc AS forecast_milli")
        .orderBy("horizon")
    },

    // HITS hubs-and-authorities (Kleinberg 1999) on the directed
    // supplier→customer trade graph, two un-normalized power-iteration
    // rounds — which keeps every score an EXACT path count: a¹(c) =
    // indeg(c), h¹(s) = Σ_{s→c} a¹(c), a²(c) = Σ_{s→c} h¹(s) (the
    // number of s→c'→s'→c walks landing at c). Normalization only
    // rescales the ranking, so the integer lane loses nothing. Each
    // round is one join+agg over the DISTINCT edge set (the q113/q454
    // shape); the per-round frames a¹/h¹ are node-cardinality
    // (customers/suppliers GROW with SF), so the joins stay shuffle
    // equi-joins — AQE may still broadcast them at small scale, but
    // no hint forces a driver collect at sf1000. Top-20 via
    // TakeOrderedAndProject (bounded heap, never a global sort).
    // HONEST CEILING: a² ≤ |S|·|E|·max-indeg — BIGINT holds past
    // 10⁶ suppliers × 10⁹ edges; beyond that move the a² lane to the
    // wide decimal.
    "q488_hits" -> { (s, d) =>
      val e = Tables.lineitem(s, d).select(col("l_suppkey").as("src"),
          col("l_orderkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("src"), col("o_custkey").as("dst"))
        .distinct()
      val a1 = e.groupBy("dst").agg(count(lit(1)).as("auth1"))
      val h1 = e.join(a1, "dst")
        .groupBy("src").agg(sum("auth1").as("h1"))
      val a2 = e.join(h1, "src")
        .groupBy("dst").agg(sum("h1").as("auth2"))
      a2.join(a1, "dst")
        .select(col("dst").as("cust"), col("auth1"), col("auth2"))
        .orderBy(col("auth2").desc, col("cust").asc)
        .limit(20)
    },

    // Next-event-type surprisal per current state — the conditional-
    // entropy-in-bits profile of the event stream's first-order Markov
    // model, computed the q173 way: surprisal of transition (t1, t2)
    // is floor(log2(c(t1·)/c(t1,t2))) bits via integer bit-length —
    // no float log anywhere. Consecutive pairs ride a per-user window
    // (partitioned — scales with users); the model join runs over the
    // type×type frame (vocabulary-sized). A state whose mean surprisal
    // collapses to 0 has become deterministic — the stream-health
    // companion to q295's transition matrix and q284's second-order
    // counts.
    "q489_transition_bits" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("t2", lead("event_type", 1).over(w))
        .filter(col("t2").isNotNull)
        .select(col("event_type").as("t1"), col("t2"))
      val c2 = pairs.groupBy("t1", "t2").agg(count(lit(1)).as("c2"))
      val c1 = c2.groupBy("t1").agg(sum("c2").as("n_out"))
      c2.join(c1, Seq("t1"))
        .withColumn("bits", expr("length(bin(n_out div c2)) - 1").cast("long"))
        .groupBy("t1", "n_out")
        .agg(sum(expr("c2 * bits")).as("sum_bits"))
        .withColumn("milli_bits", expr("sum_bits * 1000 div n_out"))
        .select("t1", "n_out", "sum_bits", "milli_bits")
        .orderBy("t1")
    },

    // Permutation-pattern complexity (Bandt & Pompe 2002) of the daily
    // order-count series: every consecutive-day triple maps to one of
    // the 6 ordinal patterns ([[PermCode]], position-tiebroken), and
    // the pattern histogram is the series' complexity fingerprint — a
    // collapsing pattern set means the load curve turned predictable.
    // Exact integers end-to-end: per-pattern counts, permille shares,
    // and the Rényi-2 collision statistic Σc²·10⁶ div N² (the q322
    // Simpson lane — the log-free entropy surrogate). The triple
    // window rides the calendar-day frame (~2.4k rows at ANY scale —
    // PlanAudit-allowlisted); the heavy lifting is the map-side
    // orders→day combine.
    "q490_perm_patterns" -> { (s, d) =>
      val w = Window.orderBy("day")
      val tri = Tables.orders(s, d)
        .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
        .agg(count(lit(1)).as("a"))
        .withColumn("b", lead("a", 1).over(w))
        .withColumn("c", lead("a", 2).over(w))
        .filter(col("c").isNotNull)
      val cnts = tri.select(expr(PermCode).cast("long").as("pattern"))
        .groupBy("pattern").agg(count(lit(1)).as("cnt"))
      val tot = cnts.agg(sum("cnt").as("n_triples"),
        sum(expr("cnt * cnt")).as("sum_sq"))
      cnts.crossJoin(broadcast(tot))
        .select(col("pattern"), col("cnt"),
          expr("cnt * 1000 div n_triples").as("permille"),
          col("n_triples"),
          expr("sum_sq * 1000000 div (n_triples * n_triples)")
            .as("collision_micro"))
        .orderBy("pattern")
    },

    // Kaplan–Meier product-limit survival of order→ship latency with
    // administrative censoring at 1998-03-01 — the estimator twin of
    // q343's Nelson–Aalen cumulative hazard (same subject frame
    // construction, different cutoff cohort). Determinism without an
    // engine float product: each event step's ratio is pre-floored to
    // an exact integer step_micro = (n−d)·10⁶ div n, and S(t) is the
    // SEQUENTIAL integer fold Π-style over the time-sorted steps
    // (s ← s·step div 10⁶ from 10⁶) — a micro-precision product-limit
    // whose deviation from the real-valued K-M is < #steps·1e-6,
    // identical on both engines at ANY n (no magnitude ceiling: only
    // the ≤10⁶ step ratio is encoded, never n itself). The step table
    // is latency-day-grain (≤ ~200 rows at any scale), so the encoded
    // array, its per-row prefix folds, and the cumulative at-risk
    // window are all cardinality-bounded by construction.
    "q491_kaplan_meier" -> { (s, d) =>
      val es = kmEventSteps(s, d)
      // encode shift: the driver's synthetic lineitem ships up to
      // ~3 years BEFORE the order date (not TPC-H-faithful), so obs
      // is signed; +10⁶ days keeps the encode positive (and the `%`
      // lane well-defined) for any calendar within ±2.7 millennia
      val arr = es.agg(expr(
        "sort_array(collect_list((obs + 1000000) * 10000000 + step_micro))")
        .as("a"))
      es.withColumnRenamed("obs", "t_days")
        .crossJoin(broadcast(arr))
        .withColumn("surv_micro", expr(Sp.fold(
          Sp.filterL("a", "v",
            s"${Sp.intDiv("v", "10000000")} - 1000000 <= t_days"),
          "CAST(1000000 AS BIGINT)", "acc", "v",
          Sp.intDiv("(acc * (v % 10000000))", "1000000"))))
        .select("t_days", "d", "n_risk", "step_micro", "surv_micro")
        .orderBy("t_days")
    },

    // Wald's sequential probability ratio test (SPRT 1945) on the
    // 1995 return rate: H0 p=0.20 vs H1 p=0.25 at α=β=0.05. The
    // log-likelihood ratio k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0)) is
    // pure integer arithmetic in micro-nats ([[LnRatioPos]] — the
    // rational-literal convention, no engine ln), and the decision
    // compares against the Wald boundaries ±ln(19). One
    // map-side-combined counting aggregate over the year partition —
    // the sequential-monitoring rider to q223's lift and q346's SRM.
    "q492_sprt" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(expr("year(l_shipdate) = 1995"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END")).as("k"))
        .select(col("n"), col("k"),
          expr(s"k * $LnRatioPos - (n - k) * $LnRatioNeg")
            .as("llr_micronat"),
          expr(s"CASE WHEN k * $LnRatioPos - (n - k) * $LnRatioNeg " +
            s">= $WaldBound THEN 'accept_h1' " +
            s"WHEN k * $LnRatioPos - (n - k) * $LnRatioNeg " +
            s"<= -$WaldBound THEN 'accept_h0' " +
            "ELSE 'continue' END").as("decision"))
    },

    // Gumbel (EV1) fit to monthly block maxima of daily revenue by the
    // method of moments — the extreme-value monitor behind "what daily
    // load should we provision for?": β̂ = s·√6/π, μ̂ = m − γ·β̂, plus
    // the 100-block return level μ̂ + β̂·(−ln(−ln(0.99))). Daily cents
    // and monthly maxima are exact integers; the block-maxima moments
    // (n, Σx, Σx²) ride wide lanes, and every float surfaces through
    // ONE fixed-op-order text over them — the constants are rational
    // doubles ([[sqrt6OverPi]]). Two bounded aggregations (day-grain,
    // then month-grain ~84 rows); no windows, no shuffle beyond the
    // two combines.
    "q493_gumbel_maxima" -> { (s, d) =>
      val varT = s"(${Sp.wideToDouble(
        s"(${Sp.wide("nb")} * s2 - ${Sp.wide("s1")} * s1)")} / " +
        "(CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1)))"
      val betaT = s"(sqrt($varT) * $Sqrt6OverPi)"
      val muT = s"((CAST(s1 AS DOUBLE) / CAST(nb AS DOUBLE)) - " +
        s"$EulerGamma * $betaT)"
      val rlT = s"($muT + $betaT * $GumbelQ99)"
      Tables.orders(s, d)
        .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
        .agg(sum(expr(CentsF)).as("dc"))
        .groupBy(expr("date_trunc('month', day)").as("mo"))
        .agg(max("dc").as("mx"))
        .agg(count(lit(1)).as("nb"), sum("mx").as("s1"),
          sum(expr(s"${Sp.wide("mx")} * mx")).as("s2"))
        .selectExpr("nb AS n_blocks",
          s"CAST(${Sp.intDiv(s"${Sp.wide("s1")} * 1000000", "nb")} AS BIGINT)" +
            " AS mean_microcents",
          s"CASE WHEN nb < 2 OR ($varT) <= 0 THEN NULL ELSE " +
            s"CAST(floor($betaT) AS BIGINT) END AS beta_cents",
          s"CASE WHEN nb < 2 OR ($varT) <= 0 THEN NULL ELSE " +
            s"CAST(floor($muT) AS BIGINT) END AS mu_cents",
          s"CASE WHEN nb < 2 OR ($varT) <= 0 THEN NULL ELSE " +
            s"CAST(floor($rlT) AS BIGINT) END AS rl100_cents")
    },

    // Margin-criterion mining (Artetxe & Schwenk, the CCMatrix/LASER
    // bitext rule, additive form): a hash-defined 5% query slice mines
    // its best counterpart among the rest, scored not by raw cosine
    // but by cosine minus the mean of both sides' average-k-NN cosine
    // — the correction that kills hubness false matches. All cosines
    // ride the shared sequential fold; each side's kNN average sums
    // its rank-1..8 pivot lanes in FIXED column order ([[avgTop8]]),
    // so every float is bit-identical across engines; ranking ties
    // break on ids. The query slice broadcasts against the corpus
    // (the q33 brute-force shape — the verifier tier); at 100 TB the
    // pair frame swaps to the q34/q79 LSH/IVF candidate path with the
    // same margin scoring on top.
    "q494_margin_mining" -> { (s, d) =>
      val pairs = embPairs(s, d)
      val wS = Window.partitionBy("sid")
        .orderBy(col("cos").desc, col("tid").asc)
      val sCols = (1 to 8).map(i =>
        max(when(col("rn") === i, col("cos"))).as(s"c$i")) :+
        count(lit(1)).as("ks")
      val sAvg = pairs.withColumn("rn", row_number().over(wS))
        .filter(col("rn") <= 8)
        .groupBy("sid")
        .agg(sCols.head, sCols.tail: _*)
        .withColumn("a_s", expr(avgTop8(Sp, "c", "ks")))
        .select("sid", "a_s")
      val wT = Window.partitionBy("tid")
        .orderBy(col("cos").desc, col("sid").asc)
      val tCols = (1 to 8).map(i =>
        max(when(col("rn") === i, col("cos"))).as(s"e$i")) :+
        count(lit(1)).as("kt")
      val tAvg = pairs.withColumn("rn", row_number().over(wT))
        .filter(col("rn") <= 8)
        .groupBy("tid")
        .agg(tCols.head, tCols.tail: _*)
        .withColumn("a_t", expr(avgTop8(Sp, "e", "kt")))
        .select("tid", "a_t")
      val wBest = Window.partitionBy("sid")
        .orderBy(col("margin").desc, col("tid").asc)
      pairs.join(broadcast(sAvg), Seq("sid"))
        .join(tAvg, Seq("tid"))
        .withColumn("margin", expr(MarginT))
        .withColumn("rb", row_number().over(wBest))
        .filter(col("rb") === 1)
        .select(col("sid"), col("tid").as("best_tid"),
          expr("CAST(floor(cos * CAST(1000000 AS DOUBLE)) AS BIGINT)")
            .as("cos_micro"),
          expr("CAST(floor(margin * CAST(1000000 AS DOUBLE)) AS BIGINT)")
            .as("margin_micro"))
        .orderBy("sid")
    },

    // Sample entropy (Richman & Moorman 2000) of the daily order-count
    // series at m=2, r=5: B counts template pairs matching on 2
    // consecutive days (Chebyshev tolerance ≤ r), A on 3 — both EXACT
    // integer counts over the SAME N−2 template universe (every
    // template must be extendable to m+1, per the estimator's
    // definition — otherwise final-day templates inflate B and bias
    // A/B downward), over the all-pairs day frame (calendar-bounded:
    // ~2.4k days ⇒ ~3M pairs at ANY scale, a broadcast nested-loop
    // the optimizer cannot mistake for a data-sized cartesian).
    // SampEn = −ln(A/B); the ratio is emitted exactly in micro units
    // (−ln is monotone, so regularity thresholds translate 1:1 into
    // ratio space — the log-free surrogate convention of q490/q322).
    "q496_sample_entropy" -> { (s, d) =>
      val w = Window.orderBy("day")
      val tpl = Tables.orders(s, d)
        .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
        .agg(count(lit(1)).as("x1"))
        .withColumn("x2", lead("x1", 1).over(w))
        .withColumn("x3", lead("x1", 2).over(w))
      val a = tpl.select(col("day").as("da"), col("x1").as("a1"),
        col("x2").as("a2"), col("x3").as("a3"))
      val b = tpl.select(col("day").as("db"), col("x1").as("b1"),
        col("x2").as("b2"), col("x3").as("b3"))
      val m2 = "a3 IS NOT NULL AND b3 IS NOT NULL AND " +
        "abs(a1 - b1) <= 5 AND abs(a2 - b2) <= 5"
      val m3 = s"$m2 AND abs(a3 - b3) <= 5"
      val cnt = a.join(broadcast(b), col("da") < col("db"))
        .agg(
          sum(expr(s"CASE WHEN $m2 THEN 1 ELSE 0 END")).as("b_pairs"),
          sum(expr(s"CASE WHEN $m3 THEN 1 ELSE 0 END")).as("a_pairs"))
      val nd = tpl.agg(count(lit(1)).as("n_days"))
      cnt.crossJoin(broadcast(nd))
        .select(col("n_days"), col("b_pairs"), col("a_pairs"),
          expr("CASE WHEN b_pairs = 0 THEN NULL " +
            "ELSE a_pairs * 1000000 div b_pairs END").as("ratio_micro"))
    },

    // Reciprocal top-3 pairs across the q494 split — forward-backward
    // consistency filtering, the bitext-alignment gate that survives
    // hubness (a hub target collects many forward votes but returns
    // few): keep (x, y) only when y is in x's forward top-3 AND x is
    // in y's backward top-3. Pure integer ranks on the shared-fold
    // cosine (ties break on ids), so the pair set is deterministic;
    // both rank windows are partitioned (query- and target-keyed) and
    // the join is equi on (sid, tid).
    "q497_reciprocal_pairs" -> { (s, d) =>
      val p = embPairs(s, d)
      val fwd = p.withColumn("fwd_rank", row_number().over(
          Window.partitionBy("sid").orderBy(col("cos").desc, col("tid").asc))
          .cast("long"))
        .filter(col("fwd_rank") <= 3)
      val bwd = p.withColumn("bwd_rank", row_number().over(
          Window.partitionBy("tid").orderBy(col("cos").desc, col("sid").asc))
          .cast("long"))
        .filter(col("bwd_rank") <= 3)
        .select("sid", "tid", "bwd_rank")
      fwd.join(bwd, Seq("sid", "tid"))
        .select(col("sid"), col("tid"), col("fwd_rank"), col("bwd_rank"),
          expr("CAST(floor(cos * CAST(1000000 AS DOUBLE)) AS BIGINT)")
            .as("cos_micro"))
        .orderBy("sid", "tid")
    },

    // Adjusted Rand index between the ground-truth embedding labels
    // and the nearest-centroid clustering (the q419 integer-exact
    // assignment substrate: ×32768-quantized lanes, floor-mod
    // centroid means, (dd, label) tie-break) — the chance-corrected
    // clustering-agreement score next to q415's silhouette and q419's
    // per-class recall. EVERY lane is an exact integer: contingency
    // pair counts C(n,2) per cell/row/column, and ARI clears its
    // denominators as (2·T·Σij − 2·Σa·Σb) / (T·(Σa+Σb) − 2·Σa·Σb)
    // with T = C(n,2) — wide lanes, one exact division to micro.
    // Denominator 0 (degenerate single-cluster agreement) emits 10⁶
    // by the standard convention.
    "q508_ari" -> { (s, d) =>
      val pred = Analytics4.centroidPred(s, d)
        .select(col("label").cast("long").as("la"),
          col("label_c").cast("long").as("lb"))
      val sij = pred.groupBy("la", "lb").agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) div 2")).as("sij"))
      val sa = pred.groupBy("la").agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) div 2")).as("sa"),
          count(lit(1)).as("n_classes"))
      val sb = pred.groupBy("lb").agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) div 2")).as("sb"),
          count(lit(1)).as("n_clusters"))
      val nn = pred.agg(count(lit(1)).as("n"))
      nn.crossJoin(broadcast(sij)).crossJoin(broadcast(sa))
        .crossJoin(broadcast(sb))
        .withColumn("t2", expr("n * (n - 1) div 2"))
        .selectExpr("n", "n_classes", "n_clusters", "sij", "sa", "sb",
          s"${ariMicroF(Sp)} AS ari_micro")
    },

    // Holt–Winters holdout backtest: fit q506's fold on all days up
    // to max−14, forecast 7 ahead, score against the held-out actuals
    // — per-horizon absolute error plus the MASE against the
    // same-weekday seasonal-naive baseline: the PROPER aggregate
    // Σ|err| / Σ|naive err| over the holdout week (repeated as a
    // scalar column — a per-point ratio would NULL out whenever one
    // day's naive error happens to be 0), so a MASE ≥ 1000 milli says
    // the smoother earns nothing over naive. Errors are exact
    // integers: forecast_milli is the floored fold output, actuals
    // scale ×1000, the naive forecast is the calendar day−7 count.
    // Everything rides the calendar-bounded day frame.
    "q511_hw_backtest" -> { (s, d) =>
      val days = dayCounts(s, d)
      val cut = days.agg(expr("date_add(max(day), -14)").as("cutoff"))
      val train = days.crossJoin(broadcast(cut))
        .filter(col("day") <= col("cutoff"))
      val (_, _, fc) = hwOut(Sp)
      val fits = train.groupBy("cutoff")
        .agg(expr(DaySeriesT).as("xs"))
        .withColumn("hw", expr(hwFold(Sp, "xs")))
      val scored = fits
        .select(col("cutoff"), col("hw"),
          explode(expr("sequence(1, 7)")).as("horizon"))
        .withColumn("fday", expr("date_add(cutoff, CAST(horizon AS INT))"))
        .withColumn("forecast_milli", expr(fc))
        .join(days.select(col("day").as("fday"), col("x").as("actual")),
          Seq("fday"))
        .join(days.select(expr("date_add(day, 7)").as("fday"),
          col("x").as("naive")), Seq("fday"))
        .withColumn("abs_err_milli",
          expr("abs(actual * 1000 - forecast_milli)"))
        .withColumn("naive_err_milli", expr("abs(actual - naive) * 1000"))
      val tot = scored.agg(sum("abs_err_milli").as("t_abs"),
        sum("naive_err_milli").as("t_naive"))
      scored.crossJoin(broadcast(tot))
        .select(expr("CAST(horizon AS BIGINT)").as("horizon"),
          col("forecast_milli"), expr("actual * 1000").as("actual_milli"),
          col("abs_err_milli"), col("naive_err_milli"),
          expr("CASE WHEN t_naive = 0 THEN NULL ELSE " +
            "t_abs * 1000 div t_naive END").as("mase_milli"))
        .orderBy("horizon")
    },

    // Simpson's-paradox reversal check: is the URGENT-vs-other return
    // rate association the same sign overall as within every ship-year
    // stratum? A reversal (aggregate sign opposed by all strata) is
    // the canonical confounding alarm a metrics review runs before
    // shipping an "X drives Y" conclusion. Rate comparisons stay
    // division-free via cross-multiplication in wide lanes
    // (r_a·n_b vs r_b·n_a — exact at any scale), so signs are exact
    // integers; per-stratum rows carry the overall sign and the
    // reversal flag as repeated scalar columns.
    "q510_simpson_check" -> { (s, d) =>
      val base = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .select(expr("year(l_shipdate)").cast("long").as("stratum"),
          expr("CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END")
            .as("grp"),
          expr("CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END").as("ret"))
      def signT(ra: String, na: String, rb: String, nb: String) =
        s"CASE WHEN ${Sp.wide(ra)} * $nb > ${Sp.wide(rb)} * $na THEN 1 " +
          s"WHEN ${Sp.wide(ra)} * $nb < ${Sp.wide(rb)} * $na THEN -1 " +
          "ELSE 0 END"
      val str = base.groupBy("stratum").agg(
          sum(expr("CASE WHEN grp = 1 THEN 1 ELSE 0 END")).as("n_a"),
          sum(expr("CASE WHEN grp = 1 THEN ret ELSE 0 END")).as("r_a"),
          sum(expr("CASE WHEN grp = 0 THEN 1 ELSE 0 END")).as("n_b"),
          sum(expr("CASE WHEN grp = 0 THEN ret ELSE 0 END")).as("r_b"))
        .withColumn("assoc_sign",
          expr(signT("r_a", "n_a", "r_b", "n_b")).cast("long"))
      val ov = str.agg(sum("n_a").as("ta"), sum("r_a").as("rva"),
          sum("n_b").as("tb"), sum("r_b").as("rvb"))
        .withColumn("overall_sign",
          expr(signT("rva", "ta", "rvb", "tb")).cast("long"))
        .select("overall_sign")
      val opp = str.crossJoin(broadcast(ov)).agg(
        count(lit(1)).as("n_strata"),
        sum(expr("CASE WHEN overall_sign <> 0 AND " +
          "assoc_sign = -overall_sign THEN 1 ELSE 0 END")).as("n_opposing"))
      val flags = ov.crossJoin(broadcast(opp))
        .withColumn("reversal", expr(
          "CASE WHEN overall_sign <> 0 AND n_opposing = n_strata " +
            "THEN 1 ELSE 0 END").cast("long"))
        .select("overall_sign", "n_opposing", "reversal")
      str.crossJoin(broadcast(flags))
        .select("stratum", "n_a", "r_a", "n_b", "r_b", "assoc_sign",
          "overall_sign", "n_opposing", "reversal")
        .orderBy("stratum")
    },

    // Wilcoxon signed-rank test on paired daily order counts, 1995 vs
    // 1996 matched on (month, day-of-month) — the PAIRED twin of
    // q296's Mann–Whitney. Zero differences drop (standard); ties on
    // |d| take AVERAGE ranks kept exact by doubling (r2 = lo + hi of
    // the tie run, an integer), so W⁺ and W⁻ are exact in the ×2
    // lane. The normal approximation z surfaces through ONE
    // fixed-op-order text (tie-variance correction omitted — the
    // decision statistic is the exact W lane). Ranks ride the
    // paired-calendar-day frame (≤366 rows at ANY scale —
    // PlanAudit-allowlisted).
    "q501_wilcoxon_signed" -> { (s, d) =>
      def yearCounts(yr: Int) = Tables.orders(s, d)
        .filter(expr(s"year(o_orderdate) = $yr"))
        .groupBy(expr("month(o_orderdate)").as("mo"),
          expr("day(o_orderdate)").as("dd"))
        .agg(count(lit(1)).as(s"n$yr"))
      val diff = yearCounts(1995).join(yearCounts(1996), Seq("mo", "dd"))
        .withColumn("diff", expr("n1996 - n1995"))
        .filter(col("diff") =!= 0)
        .withColumn("adiff", abs(col("diff")))
      val ranked = diff
        .withColumn("rmin", rank().over(Window.orderBy("adiff")).cast("long"))
        .withColumn("tcnt", count(lit(1)).over(
          Window.partitionBy("adiff")))
        .withColumn("r2", expr("2 * rmin + tcnt - 1"))
      val zT = "((CAST(wp2 AS DOUBLE) / 2 - CAST(n AS DOUBLE) * " +
        "(n + 1) / 4) / sqrt(CAST(n AS DOUBLE) * (n + 1) * " +
        "(2 * n + 1) / 24))"
      ranked.agg(count(lit(1)).as("n"),
          sum(expr("CASE WHEN diff > 0 THEN r2 ELSE 0 END")).as("wp2"),
          sum(expr("CASE WHEN diff < 0 THEN r2 ELSE 0 END")).as("wm2"))
        .selectExpr("n AS n_pairs", "wp2 AS w_plus_x2", "wm2 AS w_minus_x2",
          s"CASE WHEN n < 2 THEN NULL ELSE " +
            s"CAST(floor($zT * CAST(1000 AS DOUBLE)) AS BIGINT) END" +
            " AS z_milli")
    },

    // Hubness skew of the reverse-8-NN occurrence distribution
    // (Radovanović et al. 2010): how many query vectors list each
    // target in their top-8 — a right-skewed occurrence histogram is
    // the high-dimensional hubness pathology that q494's margin
    // corrects. Occurrences are exact integer counts (zero-occurrence
    // targets included via the left join); the moment skewness
    // g1 = m3/m2^1.5 rides the q478 lanes (Σo, Σo², Σo³ in wide
    // integers, ONE fixed-op-order float text). The argmax hub is a
    // bounded top-1 (TakeOrderedAndProject).
    "q498_hubness" -> { (s, d) =>
      val p = embPairs(s, d)
      val occ8 = p.withColumn("rn", row_number().over(
          Window.partitionBy("sid").orderBy(col("cos").desc, col("tid").asc)))
        .filter(col("rn") <= 8)
        .groupBy("tid").agg(count(lit(1)).as("o"))
      val allT = Tables.embeddings(s, d)
        .filter(expr(s"vec_id % ${embPanelMod(s, d)} <> 0"))
        .select(col("vec_id").as("tid"))
      val o = allT.join(occ8, Seq("tid"), "left")
        .withColumn("occ", coalesce(col("o"), lit(0L)))
      val mom = o.agg(count(lit(1)).as("n"), sum("occ").as("s1"),
        sum(expr(s"${Sp.wide("occ")} * occ")).as("s2"),
        sum(expr(s"${Sp.wide("occ")} * occ * occ")).as("s3"))
      val hub = o.orderBy(col("occ").desc, col("tid").asc).limit(1)
        .select(col("tid").as("hub_tid"), col("occ").as("hub_occ"))
      mom.crossJoin(broadcast(hub))
        .selectExpr("n AS n_targets", "hub_tid", "hub_occ",
          s"CAST(${Sp.intDiv(s"${Sp.wide("s1")} * 1000", "n")} AS BIGINT)" +
            " AS mean_milli",
          s"CASE WHEN n < 2 OR (${skewM2(Sp)}) <= 0 THEN NULL ELSE " +
            s"CAST(floor((${skewM3(Sp)}) / sqrt((${skewM2(Sp)}) * " +
            s"(${skewM2(Sp)}) * (${skewM2(Sp)})) * CAST(1000 AS DOUBLE)) " +
            "AS BIGINT) END AS skew_milli")
    })

  /** Central moment texts about the raw sums for the q498 occurrence
    * lanes (n, s1, s2, s3) — the q478 Jarque–Bera discipline: m2 =
    * s2/n − μ², m3 = s3/n − 3μ(s2/n) + 2μ³, μ = s1/n, each ONE shared
    * fixed-op-order text.
    */
  private val SkewMu =
    "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
  private def skewM2(d: SqlDialect): String =
    s"(${d.wideToDouble("s2")} / CAST(n AS DOUBLE) - " +
      s"$SkewMu * $SkewMu)"
  private def skewM3(d: SqlDialect): String =
    s"(${d.wideToDouble("s3")} / CAST(n AS DOUBLE) - " +
      s"3 * $SkewMu * (${d.wideToDouble("s2")} / CAST(n AS DOUBLE)) + " +
      s"2 * $SkewMu * $SkewMu * $SkewMu)"

  val oracles: Map[String, String] = Map(

    "q506_holt_winters" -> {
      val (lv, tr, fc) = hwOut(Du)
      s"""WITH days AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS x
         |  FROM orders GROUP BY 1),
         |arr AS (SELECT list(CAST(x AS DOUBLE) ORDER BY day) AS xs
         |  FROM days),
         |hwt AS (SELECT ${hwFold(Du, "xs")} AS hw FROM arr),
         |hz AS (SELECT unnest(range(1, 8)) AS horizon)
         |SELECT CAST(horizon AS BIGINT) AS horizon,
         |  $lv AS level_milli, $tr AS trend_milli,
         |  $fc AS forecast_milli
         |FROM hwt, hz ORDER BY horizon""".stripMargin
    },

    "q488_hits" ->
      """WITH e AS (
        |  SELECT DISTINCT l_suppkey AS src, o_custkey AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |a1 AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS auth1
        |  FROM e GROUP BY 1),
        |h1 AS (SELECT src, CAST(SUM(auth1) AS BIGINT) AS h1
        |  FROM e JOIN a1 USING (dst) GROUP BY 1),
        |a2 AS (SELECT dst, CAST(SUM(h1) AS BIGINT) AS auth2
        |  FROM e JOIN h1 USING (src) GROUP BY 1)
        |SELECT dst AS cust, auth1, auth2
        |FROM a2 JOIN a1 USING (dst)
        |ORDER BY auth2 DESC, cust LIMIT 20""".stripMargin,

    "q489_transition_bits" ->
      s"""WITH p AS (
         |  SELECT event_type AS t1,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS t2
         |  FROM events),
         |pairs AS (SELECT t1, t2 FROM p WHERE t2 IS NOT NULL),
         |c2 AS (SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS c2
         |  FROM pairs GROUP BY 1, 2),
         |c1 AS (SELECT t1, CAST(SUM(c2) AS BIGINT) AS n_out
         |  FROM c2 GROUP BY 1),
         |sc AS (
         |  SELECT t1, n_out, c2,
         |    CAST(length(printf('%b', ${Du.intDiv("n_out", "c2")})) - 1
         |      AS BIGINT) AS bits
         |  FROM c2 JOIN c1 USING (t1))
         |SELECT t1, n_out, CAST(SUM(c2 * bits) AS BIGINT) AS sum_bits,
         |  CAST(${Du.intDiv("SUM(c2 * bits) * 1000", "n_out")} AS BIGINT)
         |    AS milli_bits
         |FROM sc GROUP BY 1, 2 ORDER BY t1""".stripMargin,

    "q490_perm_patterns" ->
      s"""WITH days AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS a
         |  FROM orders GROUP BY 1),
         |tri AS (
         |  SELECT a, lead(a, 1) OVER (ORDER BY day) AS b,
         |    lead(a, 2) OVER (ORDER BY day) AS c
         |  FROM days),
         |pat AS (
         |  SELECT CAST($PermCode AS BIGINT) AS pattern
         |  FROM tri WHERE c IS NOT NULL),
         |cnts AS (SELECT pattern, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM pat GROUP BY 1),
         |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_triples,
         |  CAST(SUM(cnt * cnt) AS BIGINT) AS sum_sq FROM cnts)
         |SELECT pattern, cnt,
         |  ${Du.intDiv("cnt * 1000", "n_triples")} AS permille,
         |  n_triples,
         |  ${Du.intDiv("sum_sq * 1000000", "(n_triples * n_triples)")}
         |    AS collision_micro
         |FROM cnts, tot ORDER BY pattern""".stripMargin,

    "q491_kaplan_meier" ->
      s"""WITH subj AS (
         |  SELECT
         |    CASE WHEN CAST(l_shipdate AS DATE) <= DATE '1998-03-01'
         |      THEN date_diff('day', CAST(o_orderdate AS DATE),
         |        CAST(l_shipdate AS DATE))
         |      ELSE date_diff('day', CAST(o_orderdate AS DATE),
         |        DATE '1998-03-01') END AS obs,
         |    CASE WHEN CAST(l_shipdate AS DATE) <= DATE '1998-03-01'
         |      THEN 1 ELSE 0 END AS ev
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE CAST(o_orderdate AS DATE) <= DATE '1998-03-01'),
         |steps AS (
         |  SELECT CAST(obs AS BIGINT) AS obs,
         |    CAST(COUNT(*) AS BIGINT) AS c_all,
         |    CAST(SUM(ev) AS BIGINT) AS d
         |  FROM subj GROUP BY 1),
         |n AS (SELECT CAST(SUM(c_all) AS BIGINT) AS n_total FROM steps),
         |risk AS (
         |  SELECT obs, d,
         |    CAST(n_total - SUM(c_all) OVER (ORDER BY obs
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + c_all
         |      AS BIGINT) AS n_risk
         |  FROM steps, n),
         |es AS (
         |  SELECT obs, d, n_risk,
         |    CAST(${Du.intDiv("(n_risk - d) * 1000000", "n_risk")} AS BIGINT)
         |      AS step_micro
         |  FROM risk WHERE d > 0),
         |arr AS (
         |  SELECT list((obs + 1000000) * 10000000 + step_micro ORDER BY obs)
         |    AS a
         |  FROM es)
         |SELECT obs AS t_days, d, n_risk, step_micro,
         |  CAST(${Du.fold(
             Du.filterL("a", "v",
               s"${Du.intDiv("v", "10000000")} - 1000000 <= obs"),
             "CAST(1000000 AS BIGINT)", "acc", "v",
             Du.intDiv("(acc * (v % 10000000))", "1000000"))} AS BIGINT)
         |    AS surv_micro
         |FROM es, arr ORDER BY t_days""".stripMargin,

    "q492_sprt" ->
      s"""WITH c AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS k
         |  FROM lineitem WHERE year(l_shipdate) = 1995)
         |SELECT n, k,
         |  k * $LnRatioPos - (n - k) * $LnRatioNeg AS llr_micronat,
         |  CASE WHEN k * $LnRatioPos - (n - k) * $LnRatioNeg
         |    >= $WaldBound THEN 'accept_h1'
         |  WHEN k * $LnRatioPos - (n - k) * $LnRatioNeg
         |    <= -$WaldBound THEN 'accept_h0'
         |  ELSE 'continue' END AS decision
         |FROM c""".stripMargin,

    "q493_gumbel_maxima" -> {
      val varT = s"(${Du.wideToDouble(
        s"(${Du.wide("nb")} * s2 - ${Du.wide("s1")} * s1)")} / " +
        "(CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1)))"
      val betaT = s"(sqrt($varT) * $Sqrt6OverPi)"
      val muT = s"((CAST(s1 AS DOUBLE) / CAST(nb AS DOUBLE)) - " +
        s"$EulerGamma * $betaT)"
      val rlT = s"($muT + $betaT * $GumbelQ99)"
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |    CAST(SUM($CentsF) AS BIGINT) AS dc
         |  FROM orders GROUP BY 1),
         |mo AS (
         |  SELECT date_trunc('month', day) AS mo,
         |    CAST(MAX(dc) AS BIGINT) AS mx
         |  FROM daily GROUP BY 1),
         |m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS nb,
         |    CAST(SUM(mx) AS BIGINT) AS s1,
         |    SUM(${Du.wide("mx")} * mx) AS s2
         |  FROM mo)
         |SELECT nb AS n_blocks,
         |  CAST(${Du.intDiv(s"${Du.wide("s1")} * 1000000", "nb")} AS BIGINT)
         |    AS mean_microcents,
         |  CASE WHEN nb < 2 OR ($varT) <= 0 THEN NULL ELSE
         |    CAST(floor($betaT) AS BIGINT) END AS beta_cents,
         |  CASE WHEN nb < 2 OR ($varT) <= 0 THEN NULL ELSE
         |    CAST(floor($muT) AS BIGINT) END AS mu_cents,
         |  CASE WHEN nb < 2 OR ($varT) <= 0 THEN NULL ELSE
         |    CAST(floor($rlT) AS BIGINT) END AS rl100_cents
         |FROM m""".stripMargin
    },

    "q494_margin_mining" -> {
      val sPiv = (1 to 8).map(i =>
        s"MAX(CASE WHEN rn = $i THEN cos END) AS c$i").mkString(", ")
      val tPiv = (1 to 8).map(i =>
        s"MAX(CASE WHEN rn = $i THEN cos END) AS e$i").mkString(", ")
      s"""WITH $embPairsCte,
         |sr AS (
         |  SELECT sid, cos,
         |    ROW_NUMBER() OVER (PARTITION BY sid
         |      ORDER BY cos DESC, tid ASC) AS rn
         |  FROM pairs),
         |sa AS (
         |  SELECT sid, $sPiv, CAST(COUNT(*) AS BIGINT) AS ks
         |  FROM sr WHERE rn <= 8 GROUP BY sid),
         |sAvg AS (SELECT sid, ${avgTop8(Du, "c", "ks")} AS a_s FROM sa),
         |tr AS (
         |  SELECT tid, cos,
         |    ROW_NUMBER() OVER (PARTITION BY tid
         |      ORDER BY cos DESC, sid ASC) AS rn
         |  FROM pairs),
         |ta AS (
         |  SELECT tid, $tPiv, CAST(COUNT(*) AS BIGINT) AS kt
         |  FROM tr WHERE rn <= 8 GROUP BY tid),
         |tAvg AS (SELECT tid, ${avgTop8(Du, "e", "kt")} AS a_t FROM ta),
         |scored AS (
         |  SELECT sid, tid, cos, ${MarginT} AS margin
         |  FROM pairs JOIN sAvg USING (sid) JOIN tAvg USING (tid)),
         |best AS (
         |  SELECT sid, tid, cos, margin,
         |    ROW_NUMBER() OVER (PARTITION BY sid
         |      ORDER BY margin DESC, tid ASC) AS rb
         |  FROM scored)
         |SELECT sid, tid AS best_tid,
         |  CAST(floor(cos * CAST(1000000 AS DOUBLE)) AS BIGINT) AS cos_micro,
         |  CAST(floor(margin * CAST(1000000 AS DOUBLE)) AS BIGINT)
         |    AS margin_micro
         |FROM best WHERE rb = 1 ORDER BY sid""".stripMargin
    },

    "q496_sample_entropy" -> {
      val m2 = "a3 IS NOT NULL AND b3 IS NOT NULL AND " +
        "abs(a1 - b1) <= 5 AND abs(a2 - b2) <= 5"
      val m3 = s"$m2 AND abs(a3 - b3) <= 5"
      s"""WITH days AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS x1
         |  FROM orders GROUP BY 1),
         |tpl AS (
         |  SELECT day, x1, lead(x1, 1) OVER (ORDER BY day) AS x2,
         |    lead(x1, 2) OVER (ORDER BY day) AS x3
         |  FROM days),
         |cnt AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN $m2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS b_pairs,
         |    CAST(SUM(CASE WHEN $m3 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS a_pairs
         |  FROM (SELECT day AS da, x1 AS a1, x2 AS a2, x3 AS a3 FROM tpl) a
         |  JOIN (SELECT day AS db, x1 AS b1, x2 AS b2, x3 AS b3 FROM tpl) b
         |    ON da < db),
         |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM days)
         |SELECT n_days, b_pairs, a_pairs,
         |  CASE WHEN b_pairs = 0 THEN NULL
         |    ELSE ${Du.intDiv("a_pairs * 1000000", "b_pairs")} END
         |    AS ratio_micro
         |FROM cnt, nd""".stripMargin
    },

    "q497_reciprocal_pairs" ->
      s"""WITH $embPairsCte,
         |fwd AS (
         |  SELECT sid, tid, cos,
         |    ROW_NUMBER() OVER (PARTITION BY sid
         |      ORDER BY cos DESC, tid ASC) AS fwd_rank
         |  FROM pairs QUALIFY fwd_rank <= 3),
         |bwd AS (
         |  SELECT sid, tid,
         |    ROW_NUMBER() OVER (PARTITION BY tid
         |      ORDER BY cos DESC, sid ASC) AS bwd_rank
         |  FROM pairs QUALIFY bwd_rank <= 3)
         |SELECT sid, tid, CAST(fwd_rank AS BIGINT) AS fwd_rank,
         |  CAST(bwd_rank AS BIGINT) AS bwd_rank,
         |  CAST(floor(cos * CAST(1000000 AS DOUBLE)) AS BIGINT) AS cos_micro
         |FROM fwd JOIN bwd USING (sid, tid)
         |ORDER BY sid, tid""".stripMargin,

    "q511_hw_backtest" -> {
      val (_, _, fc) = hwOut(Du)
      s"""WITH days AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS x
         |  FROM orders GROUP BY 1),
         |cut AS (SELECT max(day) - INTERVAL 14 DAY AS cutoff FROM days),
         |arr AS (
         |  SELECT cutoff, list(CAST(x AS DOUBLE) ORDER BY day) AS xs
         |  FROM days, cut WHERE day <= cutoff GROUP BY cutoff),
         |hwt AS (SELECT cutoff, ${hwFold(Du, "xs")} AS hw FROM arr),
         |hz AS (SELECT unnest(range(1, 8)) AS horizon),
         |sc AS (
         |  SELECT horizon,
         |    CAST(cutoff + to_days(CAST(horizon AS INTEGER)) AS DATE)
         |      AS fday,
         |    $fc AS forecast_milli
         |  FROM hwt, hz),
         |j AS (
         |  SELECT sc.horizon, sc.forecast_milli, a.x AS actual,
         |    n.x AS naive,
         |    abs(a.x * 1000 - sc.forecast_milli) AS abs_err_milli,
         |    abs(a.x - n.x) * 1000 AS naive_err_milli
         |  FROM sc
         |  JOIN days a ON sc.fday = a.day
         |  JOIN days n ON sc.fday = n.day + INTERVAL 7 DAY),
         |tot AS (
         |  SELECT CAST(SUM(abs_err_milli) AS BIGINT) AS t_abs,
         |    CAST(SUM(naive_err_milli) AS BIGINT) AS t_naive
         |  FROM j)
         |SELECT CAST(horizon AS BIGINT) AS horizon, forecast_milli,
         |  actual * 1000 AS actual_milli,
         |  abs_err_milli, naive_err_milli,
         |  CASE WHEN t_naive = 0 THEN NULL ELSE
         |    ${Du.intDiv("t_abs * 1000", "t_naive")} END AS mase_milli
         |FROM j, tot ORDER BY horizon""".stripMargin
    },

    "q510_simpson_check" -> {
      def signT(ra: String, na: String, rb: String, nb: String) =
        s"CASE WHEN ${Du.wide(ra)} * $nb > ${Du.wide(rb)} * $na THEN 1 " +
          s"WHEN ${Du.wide(ra)} * $nb < ${Du.wide(rb)} * $na THEN -1 " +
          "ELSE 0 END"
      s"""WITH base AS (
         |  SELECT CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT)
         |      AS stratum,
         |    CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END AS grp,
         |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |str AS (
         |  SELECT stratum,
         |    CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_a,
         |    CAST(SUM(CASE WHEN grp = 1 THEN ret ELSE 0 END) AS BIGINT)
         |      AS r_a,
         |    CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_b,
         |    CAST(SUM(CASE WHEN grp = 0 THEN ret ELSE 0 END) AS BIGINT)
         |      AS r_b
         |  FROM base GROUP BY 1),
         |st2 AS (
         |  SELECT *, CAST(${signT("r_a", "n_a", "r_b", "n_b")} AS BIGINT)
         |    AS assoc_sign
         |  FROM str),
         |ov AS (
         |  SELECT CAST(${signT("rva", "ta", "rvb", "tb")} AS BIGINT)
         |    AS overall_sign
         |  FROM (SELECT CAST(SUM(n_a) AS BIGINT) AS ta,
         |      CAST(SUM(r_a) AS BIGINT) AS rva,
         |      CAST(SUM(n_b) AS BIGINT) AS tb,
         |      CAST(SUM(r_b) AS BIGINT) AS rvb FROM str) t),
         |opp AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
         |    CAST(SUM(CASE WHEN overall_sign <> 0 AND
         |      assoc_sign = -overall_sign THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_opposing
         |  FROM st2, ov),
         |flags AS (
         |  SELECT overall_sign, n_opposing,
         |    CAST(CASE WHEN overall_sign <> 0 AND n_opposing = n_strata
         |      THEN 1 ELSE 0 END AS BIGINT) AS reversal
         |  FROM ov, opp)
         |SELECT stratum, n_a, r_a, n_b, r_b, assoc_sign,
         |  overall_sign, n_opposing, reversal
         |FROM st2, flags ORDER BY stratum""".stripMargin
    },

    "q508_ari" ->
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
         |pred AS (
         |  SELECT CAST(label AS BIGINT) AS la, CAST(label_c AS BIGINT) AS lb
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY dd, label_c) AS rn FROM d2) p
         |  WHERE rn = 1),
         |sij AS (SELECT CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS sij FROM
         |  (SELECT COUNT(*) AS c FROM pred GROUP BY la, lb) q),
         |sa AS (SELECT CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS sa,
         |  CAST(COUNT(*) AS BIGINT) AS n_classes FROM
         |  (SELECT COUNT(*) AS c FROM pred GROUP BY la) q),
         |sb AS (SELECT CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS sb,
         |  CAST(COUNT(*) AS BIGINT) AS n_clusters FROM
         |  (SELECT COUNT(*) AS c FROM pred GROUP BY lb) q),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(*) AS BIGINT) * (CAST(COUNT(*) AS BIGINT) - 1) // 2
         |    AS t2
         |  FROM pred)
         |SELECT n, n_classes, n_clusters, sij, sa, sb,
         |  ${ariMicroF(Du)} AS ari_micro
         |FROM nn, sij, sa, sb""".stripMargin,

    "q501_wilcoxon_signed" -> {
      val zT = "((CAST(wp2 AS DOUBLE) / 2 - CAST(n AS DOUBLE) * " +
        "(n + 1) / 4) / sqrt(CAST(n AS DOUBLE) * (n + 1) * " +
        "(2 * n + 1) / 24))"
      s"""WITH y95 AS (
         |  SELECT month(CAST(o_orderdate AS DATE)) AS mo,
         |    day(CAST(o_orderdate AS DATE)) AS dd,
         |    CAST(COUNT(*) AS BIGINT) AS n1995
         |  FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995
         |  GROUP BY 1, 2),
         |y96 AS (
         |  SELECT month(CAST(o_orderdate AS DATE)) AS mo,
         |    day(CAST(o_orderdate AS DATE)) AS dd,
         |    CAST(COUNT(*) AS BIGINT) AS n1996
         |  FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1996
         |  GROUP BY 1, 2),
         |df AS (
         |  SELECT n1996 - n1995 AS diff, abs(n1996 - n1995) AS adiff
         |  FROM y95 JOIN y96 USING (mo, dd)
         |  WHERE n1996 - n1995 <> 0),
         |rk AS (
         |  SELECT diff,
         |    CAST(RANK() OVER (ORDER BY adiff) AS BIGINT) AS rmin,
         |    CAST(COUNT(*) OVER (PARTITION BY adiff) AS BIGINT) AS tcnt
         |  FROM df),
         |lanes AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN diff > 0 THEN 2 * rmin + tcnt - 1
         |      ELSE 0 END) AS BIGINT) AS wp2,
         |    CAST(SUM(CASE WHEN diff < 0 THEN 2 * rmin + tcnt - 1
         |      ELSE 0 END) AS BIGINT) AS wm2
         |  FROM rk)
         |SELECT n AS n_pairs, wp2 AS w_plus_x2, wm2 AS w_minus_x2,
         |  CASE WHEN n < 2 THEN NULL ELSE
         |    CAST(floor($zT * CAST(1000 AS DOUBLE)) AS BIGINT) END
         |    AS z_milli
         |FROM lanes""".stripMargin
    },

    "q498_hubness" ->
      s"""WITH $embPairsCte,
         |rk AS (
         |  SELECT sid, tid,
         |    ROW_NUMBER() OVER (PARTITION BY sid
         |      ORDER BY cos DESC, tid ASC) AS rn
         |  FROM pairs QUALIFY rn <= 8),
         |occ8 AS (SELECT tid, CAST(COUNT(*) AS BIGINT) AS o
         |  FROM rk GROUP BY 1),
         |o AS (
         |  SELECT tgt.tid, COALESCE(occ8.o, 0) AS occ
         |  FROM tgt LEFT JOIN occ8 ON tgt.tid = occ8.tid),
         |mom AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(occ) AS BIGINT) AS s1,
         |    SUM(${Du.wide("occ")} * occ) AS s2,
         |    SUM(${Du.wide("occ")} * occ * occ) AS s3
         |  FROM o),
         |hub AS (
         |  SELECT tid AS hub_tid, occ AS hub_occ,
         |    ROW_NUMBER() OVER (ORDER BY occ DESC, tid ASC) AS hr
         |  FROM o QUALIFY hr = 1)
         |SELECT n AS n_targets, hub_tid, hub_occ,
         |  CAST(${Du.intDiv(s"${Du.wide("s1")} * 1000", "n")} AS BIGINT)
         |    AS mean_milli,
         |  CASE WHEN n < 2 OR (${skewM2(Du)}) <= 0 THEN NULL ELSE
         |    CAST(floor((${skewM3(Du)}) / sqrt((${skewM2(Du)}) *
         |    (${skewM2(Du)}) * (${skewM2(Du)})) * CAST(1000 AS DOUBLE))
         |    AS BIGINT) END AS skew_milli
         |FROM mom, hub""".stripMargin)
}
