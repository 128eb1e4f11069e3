package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.PortableSql
import graft.plans.GlobalOrder

/** Round-6 analytics inventory: market-basket mining, exact heavy
  * hitters, cohort retention, data-quality auditing, stratified
  * allocation, Markov transitions, rank/χ² statistics, volatility
  * bands, per-node clustering coefficients, and scalar-quantization
  * vector search. Same determinism contract as [[Relational]]:
  * integer lanes (cross-multiplied ratios, milli/micro quantization),
  * identical IEEE op sequences for the double tails, ANSI
  * zero-denominator guards mirrored on both engines.
  *
  * Reference behavior: pydala2 exposes none of these — they extend
  * the training-data-pipeline stack (SURVEY.md "beyond the
  * reference") the way `pydala/dataset.py`'s maintenance ops extend
  * storage management.
  */
object Analytics {

  /** Distinct (order, part) incidence — the market-basket substrate
    * (memoized: q290 and q299 both traverse it).
    */
  private def basket(s: SparkSession, d: String): DataFrame =
    Tables.memo(s, s"$d#q290basket") {
      Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
    }

  /** Co-purchase part pairs (pa < pb) with support >= 2 and their
    * shared-order counts — ONE memoized pass serving both q290 (rule
    * scores) and q299 (graph edges), so the O(Σ|basket|²) pair join
    * is paid once. Support filtering caps density: a hot basket
    * contributes |basket|² candidate pairs, but only pairs
    * re-observed in a SECOND basket survive, so pair count is
    * bounded by the repeated co-purchase structure, not basket size.
    */
  private[queries] def pairCounts(s: SparkSession, d: String): DataFrame =
    Tables.memo(s, s"$d#q290pairs") {
      val p = basket(s, d)
      p.as("a").join(p.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 2)
    }

  /** q299's graph view of [[pairCounts]]. */
  private def coEdges(s: SparkSession, d: String): DataFrame =
    pairCounts(s, d).select("pa", "pb")

  /** int8 scalar-quantization bucket of `xd` under per-dim bounds
    * [mn, mx] — identical text on BOTH engines (CASE/least/floor/CAST
    * only), so the encode is one shared IEEE sequence. A collapsed
    * dimension (mx = mn) encodes to bucket 0 and reconstructs to mn
    * exactly (the zero-range guard both engines need — Spark-4 ANSI
    * would throw on the division, DuckDB would yield inf).
    */
  private val BqF =
    "CASE WHEN mx = mn THEN CAST(0 AS BIGINT) ELSE " +
      "least(CAST(255 AS BIGINT), CAST(floor((xd - mn) * " +
      "CAST(255 AS DOUBLE) / (mx - mn)) AS BIGINT)) END"

  /** Mid-bucket reconstruction of [[BqF]] — shared text likewise. */
  private val ReconF =
    "CASE WHEN mx = mn THEN mn ELSE " +
      "mn + (CAST(bq AS DOUBLE) + CAST(0.5 AS DOUBLE)) * (mx - mn) / " +
      "CAST(255 AS DOUBLE) END"

  /** Micro-quantized squared reconstruction error — the integer lane
    * that makes per-dim/per-pair error SUMS order-free (a double Σ
    * over a shuffled group is not deterministic; an integer Σ is).
    */
  private val ErrMicroF =
    "CAST(floor((xd - recon) * (xd - recon) * CAST(1000000 AS DOUBLE)) " +
      "AS BIGINT)"

  private val Sp = PortableSql.Spark
  private val Du = PortableSql.Duck

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Market-basket association mining: part pairs co-ordered in >= 2
    // orders, scored by confidence and lift in exact milli (lift =
    // n_ab·N / (n_a·n_b), cross-multiplied before the single integer
    // division). The pair join is keyed on the order — expansion is
    // basket-size-bounded (TPC-H baskets are tiny; a production rules
    // miner would add a per-basket size cap the same way q214 caps
    // prefixes) — and the item-frequency joins are hash equi-joins on
    // the part key. Top-40 by lift is a bounded WindowGroupLimit heap.
    "q290_basket_rules" -> { (s, d) =>
      val p = basket(s, d)
      val nOrders = p.select("ok").distinct().agg(count(lit(1)).as("n_orders"))
      val item = p.groupBy("pk").agg(count(lit(1)).as("n_item"))
      pairCounts(s, d)
        .join(item.select(col("pk").as("pa"), col("n_item").as("n_a")), "pa")
        .join(item.select(col("pk").as("pb"), col("n_item").as("n_b")), "pb")
        .crossJoin(broadcast(nOrders))
        .withColumn("conf_milli", expr("n_ab * 1000 div n_a"))
        .withColumn("lift_milli", expr("n_ab * n_orders * 1000 div (n_a * n_b)"))
        .select("pa", "pb", "n_ab", "n_a", "n_b", "conf_milli", "lift_milli")
        .orderBy(col("lift_milli").desc, col("pa"), col("pb"))
        .limit(40)
    },

    // Exact heavy hitters via distributed Misra–Gries + exact recount
    // (operators/HeavyHitters.scala): suppliers carrying > 1% of all
    // lineitems. The candidate pass bounds per-task memory to k
    // counters and the shuffle to k·partitions rows — the 100 TB
    // shape for huge key spaces — and the recount restores exactness,
    // which is what the oracle checks.
    "q291_heavy_hitters" -> { (s, d) =>
      graft.operators.HeavyHitters.frequentItems(
        Tables.lineitem(s, d), "l_suppkey", 100)
    },

    // Monthly cohort retention matrix: customers grouped by first-
    // order month, tracked for 12 months. Two map-side-combined
    // aggregates (first-order month, active months) + one hash join
    // on the customer key + a broadcast-sized cohort-total join.
    "q292_cohort_retention" -> { (s, d) =>
      val o = Tables.orders(s, d).select(col("o_custkey"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("ym"))
      val first = o.groupBy("o_custkey").agg(min("ym").as("cym"))
      val active = o.distinct()
      val cohortN = first.groupBy("cym").agg(count(lit(1)).as("n_cohort"))
      active.join(first, "o_custkey")
        .withColumn("m_since",
          expr("(ym div 100 - cym div 100) * 12 + (ym % 100 - cym % 100)"))
        .filter(col("m_since").between(0, 11))
        .groupBy("cym", "m_since")
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(cohortN), "cym")
        .withColumn("ret_milli", expr("n_active * 1000 div n_cohort"))
        .select("cym", "m_since", "n_cohort", "n_active", "ret_milli")
        .orderBy("cym", "m_since")
    },

    // Data-quality audit — the pre-ingest contract check a pipeline
    // runs before accepting a batch: referential orphans both ways,
    // duplicate line identity, domain violations, cross-table date
    // sanity. One row per check (check, n_bad, n_total, bad_milli);
    // every lane is an anti-join or a conditional aggregate — no
    // wide shuffles, fact tables scanned a bounded number of times.
    "q293_dq_audit" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val nLi = li.agg(count(lit(1)).as("n_total"))
      val nOrd = o.agg(count(lit(1)).as("n_total"))
      def check(name: String, bad: DataFrame, tot: DataFrame): DataFrame =
        bad.agg(count(lit(1)).as("n_bad")).crossJoin(broadcast(tot))
          .select(lit(name).as("chk"), col("n_bad"), col("n_total"),
            expr("CASE WHEN n_total = 0 THEN NULL " +
              "ELSE n_bad * 1000 div n_total END").as("bad_milli"))
      val orphan = li.select("l_orderkey")
        .join(o.select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
      val childless = o.select("o_orderkey")
        .join(li.select("l_orderkey").distinct(),
          col("o_orderkey") === col("l_orderkey"), "left_anti")
      val dupLine = li.groupBy("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).as("c")).filter(col("c") > 1)
      val nonposQty = li.filter(col("l_quantity") <= 0)
      val discRange = li.filter(col("l_discount") < 0 || col("l_discount") > 0.5)
      val shipEarly = li.select("l_orderkey", "l_shipdate")
        .join(o.select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") < col("o_orderdate"))
      check("li_disc_range", discRange, nLi)
        .unionAll(check("li_dup_line", dupLine, nLi))
        .unionAll(check("li_nonpos_qty", nonposQty, nLi))
        .unionAll(check("li_orphan", orphan, nLi))
        .unionAll(check("li_ship_before_order", shipEarly, nLi))
        .unionAll(check("ord_childless", childless, nOrd))
        .orderBy("chk")
    },

    // Stratified sample allocation by largest remainder (Hamilton):
    // a 10,000-doc budget split across sources proportional to their
    // counts, exactly — Σ alloc = budget, every lane integer. The
    // remainder rank runs over a source-cardinality frame (bounded by
    // construction), the total via one broadcast scalar.
    "q294_stratified_alloc" -> { (s, d) =>
      val counts = Tables.documents(s, d)
        .groupBy("source").agg(count(lit(1)).as("n_docs"))
      val tot = counts.agg(sum("n_docs").as("n_total"))
      val base = counts.crossJoin(broadcast(tot))
        .withColumn("base", expr("10000 * n_docs div n_total"))
        .withColumn("rem", expr("10000 * n_docs - base * n_total"))
      val deficit = base.agg((lit(10000) - sum("base")).cast("long").as("deficit"))
      base.crossJoin(broadcast(deficit))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("source"))))
        .withColumn("extra",
          expr("CASE WHEN rk <= deficit THEN 1 ELSE 0 END").cast("long"))
        .withColumn("alloc", col("base") + col("extra"))
        .select("source", "n_docs", "base", "extra", "alloc")
        .orderBy("source")
    },

    // Per-user event-type transition matrix (first-order Markov):
    // consecutive-event pairs under (ts, event_id) order within each
    // user, transition probability in exact milli against the
    // from-type total. One hash exchange on user_id for the lag
    // window, then a bounded (|types|²) rollup.
    "q295_markov_transitions" -> { (s, d) =>
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("tsu"), col("event_id"))
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(ts)").as("tsu"))
        .withColumn("from_type", lag("event_type", 1).over(byUser))
        .filter(col("from_type").isNotNull)
      val fromTot = pairs.groupBy("from_type").agg(count(lit(1)).as("n_from"))
      pairs.groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n_trans"))
        .join(broadcast(fromTot), "from_type")
        .withColumn("p_milli", expr("n_trans * 1000 div n_from"))
        .select("from_type", "to_type", "n_trans", "n_from", "p_milli")
        .orderBy("from_type", "to_type")
    },

    // Mann–Whitney U drift test between the click and purchase value
    // distributions — exact integer U (doubled to absorb the ½-tie
    // term) from quantized-value counts and a distributed running
    // cumulative (GlobalOrder — never a single-partition window over
    // the value spine), tie-corrected z as one identical IEEE
    // sequence on both engines. The nonparametric cousin of the KS
    // gate (q95): detects location shift where KS detects any shape
    // change.
    "q296_mann_whitney" -> { (s, d) =>
      // value IS NOT NULL: a NULL quantized value would sort first in
      // GlobalOrder's spine but last in DuckDB's window default —
      // filtered identically on both sides so the landmine never arms.
      // HONEST CEILING (the SpearmanF convention): tie_t3 = Σ(t³−t) ≤
      // n³, so the BIGINT lane holds to n ≈ 2·10⁶ comparison rows —
      // beyond that tie_t3 and the degeneracy guard move to
      // DECIMAL(38,0).
      val v = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase") &&
          col("value").isNotNull)
        .select(expr("CAST(floor(value * 1000) AS BIGINT)").as("v"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("isa"))
      val perV = v.groupBy("v").agg(
        sum("isa").as("na_v"),
        sum(expr("1 - isa")).as("nb_v"),
        count(lit(1)).as("t_v"))
      val cum = GlobalOrder.withRunningSum(perV, Seq(col("v")), col("v"),
        col("nb_v"), "cumb")
      cum.agg(
          sum("na_v").as("n_a"), sum("nb_v").as("n_b"),
          sum(expr("na_v * (2 * (cumb - nb_v) + nb_v)")).as("u2"),
          sum(expr("t_v * t_v * t_v - t_v")).as("tie_t3"))
        // degeneracy guard in a factored DECIMAL lane — m(m−1)(m+1)
        // at widths 12+12+12 ≤ 38, so the all-tied test stays valid
        // past the BIGINT m³ overflow at m ≈ 2.1M rows (tie_t3 itself
        // is small whenever tie groups are — the guard must not be
        // the thing that aborts first)
        .withColumn("z", expr(
          "CASE WHEN n_a = 0 OR n_b = 0 " +
            "OR CAST(tie_t3 AS DECIMAL(38,0)) = " +
            "CAST(n_a + n_b AS DECIMAL(12,0)) * " +
            "CAST(n_a + n_b - 1 AS DECIMAL(12,0)) * " +
            "CAST(n_a + n_b + 1 AS DECIMAL(12,0)) " +
            "THEN NULL ELSE " +
            "(CAST(u2 - n_a * n_b AS DOUBLE)) / " +
            "sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 3 * " +
            "(CAST(n_a + n_b + 1 AS DOUBLE) - CAST(tie_t3 AS DOUBLE) / " +
            "(CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b - 1 AS DOUBLE)))) END"))
        .select("n_a", "n_b", "u2", "tie_t3", "z")
    },

    // χ² independence screen of lang × source over documents — "is
    // language mix uniform across crawls": per-cell contribution in
    // exact-ordered micro units (floor of one identical double
    // sequence; the integer SUM of contributions is order-free, so
    // the total is deterministic where a double Σ would not be).
    // Observed/row/col/total counts are three map-side-combined
    // aggregates; the total is one broadcast scalar.
    "q297_chisq_lang_source" -> { (s, d) =>
      val docs = Tables.documents(s, d).select("lang", "source")
      val cells = docs.groupBy("lang", "source").agg(count(lit(1)).as("o"))
      val rows = docs.groupBy("lang").agg(count(lit(1)).as("r"))
      val cols = docs.groupBy("source").agg(count(lit(1)).as("c"))
      val n = docs.agg(count(lit(1)).as("n"))
      cells.join(broadcast(rows), "lang")
        .join(broadcast(cols), "source")
        .crossJoin(broadcast(n))
        // DECIMAL(38,0) product lane: r·c·10⁶ overflows BIGINT once a
        // hot language AND a hot source each clear ~3M docs — the 10⁶
        // scale folds into the narrower factor (c·10⁶ < 2⁶³ up to ~9
        // trillion docs/source) so the decimal product stays at width
        // 38; the integer-divide result fits back in BIGINT
        .withColumn("exp_micro", expr(
          "CAST(r AS DECIMAL(19,0)) * CAST(c * 1000000 AS DECIMAL(19,0)) " +
            "div n"))
        .withColumn("contrib_micro", expr(
          "CAST(floor((CAST(o AS DOUBLE) * CAST(n AS DOUBLE) - " +
            "CAST(r AS DOUBLE) * CAST(c AS DOUBLE)) * " +
            "(CAST(o AS DOUBLE) * CAST(n AS DOUBLE) - " +
            "CAST(r AS DOUBLE) * CAST(c AS DOUBLE)) * CAST(1000000 AS DOUBLE) / " +
            "(CAST(r AS DOUBLE) * CAST(c AS DOUBLE) * CAST(n AS DOUBLE))) " +
            "AS BIGINT)"))
        .select("lang", "source", "o", "exp_micro", "contrib_micro")
        .orderBy("lang", "source")
    },

    // Bollinger bands on daily order revenue: 7-day rolling mean ±2σ
    // and breakout flags. Revenue in exact cents; the rolling second
    // moment rides a DECIMAL(38,0) lane (cents² at warehouse scale
    // overflows BIGINT); σ is one identical sqrt of a
    // greatest(0, ·)-guarded population variance. The day spine is
    // calendar-bounded, so the ordered window is a legitimate tiny
    // frame (the q258 convention).
    "q298_bollinger" -> { (s, d) =>
      val w = Window.orderBy("day").rowsBetween(-6, 0)
      Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(expr("CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 " +
          "AS BIGINT)) AS BIGINT)").as("rev_c"))
        .withColumn("n_win", count(lit(1)).over(w))
        .withColumn("s1", sum("rev_c").over(w))
        .withColumn("s2",
          sum(expr("CAST(rev_c AS DECIMAL(19,0)) * CAST(rev_c AS DECIMAL(19,0))"))
            .over(w))
        .withColumn("m", expr("CAST(s1 AS DOUBLE) / CAST(n_win AS DOUBLE)"))
        // s2 surfaces via the portable wide→double (DuckDB HUGEINT
        // casts double-round above 2⁶⁴; see SqlDialect.wideToDouble)
        .withColumn("sd", expr(
          "sqrt(greatest(CAST(0 AS DOUBLE), " +
            s"${Sp.wideToDouble("s2")} / CAST(n_win AS DOUBLE) - m * m))"))
        .withColumn("breach", expr(
          "CASE WHEN n_win < 7 THEN NULL " +
            "WHEN CAST(rev_c AS DOUBLE) > m + 2 * sd THEN 1 " +
            "WHEN CAST(rev_c AS DOUBLE) < m - 2 * sd THEN -1 ELSE 0 END")
          .cast("long"))
        .select("day", "rev_c", "n_win", "m", "sd", "breach")
        .orderBy("day")
    },

    // Per-node local clustering coefficient on the co-purchase graph
    // (edges = part pairs co-ordered >= 2 times): closed wedges per
    // node over deg·(deg−1)/2, in exact milli. Triangle enumeration
    // is the q137 equi-join chain (a<b<c — each triangle found once),
    // exploded to its three corners for the per-node count; the
    // degree frame joins on the node key. Everything hash-keyed, no
    // cartesian.
    "q299_clustering_coeff" -> { (s, d) =>
      val e = coEdges(s, d)
      val sym = e.unionAll(e.select(col("pb").as("pa"), col("pa").as("pb")))
      val deg = sym.groupBy(col("pa").as("node")).agg(count(lit(1)).as("deg"))
      val tri = e.as("e1")
        .join(e.as("e2"), col("e1.pb") === col("e2.pa"))
        .join(e.as("e3"),
          col("e3.pa") === col("e1.pa") && col("e3.pb") === col("e2.pb"))
        .select(col("e1.pa").as("a"), col("e1.pb").as("b"), col("e2.pb").as("c"))
      val perNode = tri.select(col("a").as("node"))
        .unionAll(tri.select(col("b").as("node")))
        .unionAll(tri.select(col("c").as("node")))
        .groupBy("node").agg(count(lit(1)).as("n_tri"))
      deg.filter(col("deg") >= 3)
        .join(perNode, "node")
        .withColumn("cc_milli", expr("n_tri * 2000 div (deg * (deg - 1))"))
        .select("node", "deg", "n_tri", "cc_milli")
        .orderBy(col("cc_milli").desc, col("node"))
        .limit(30)
    },

    // Scalar-quantization (int8) codec profile: per-dimension bounds,
    // encode to 255 mid-bucket levels, micro-quantized squared
    // reconstruction error rolled up per dimension. The bounds frame
    // is |dims| rows (broadcast); encode+error is one narrow
    // codegen'd projection over the exploded corpus — the cheap
    // 4×-compression baseline to judge PQ (q158) against.
    "q300_sq_profile" -> { (s, d) =>
      val ex = Tables.spread(Tables.embeddings(s, d))
        .select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .withColumn("xd", col("x").cast("double"))
        .withColumn("pos", col("pos").cast("long"))
      val bounds = ex.groupBy("pos").agg(min("xd").as("mn"), max("xd").as("mx"))
      ex.join(broadcast(bounds), "pos")
        .withColumn("bq", expr(BqF))
        .withColumn("recon", expr(ReconF))
        .withColumn("err_micro", expr(ErrMicroF))
        .groupBy("pos")
        .agg(min("mn").as("mn"), max("mx").as("mx"),
          count(lit(1)).as("n"), sum("err_micro").as("err_micro"))
        .orderBy("pos")
    },

    // SQ-ADC search recall: top-10 by quantized asymmetric distance
    // (exact query element vs mid-bucket reconstruction, micro-int
    // distances — order-free sums, deterministic ranking) vs exact
    // float top-10, for the first 20 query vectors. The q86 recall
    // shape pointed at the q300 codec: how much of exact KNN the
    // 4×-compressed index preserves. Per-query top-10s are bounded
    // WindowGroupLimit heaps; the dim join broadcasts the bounds.
    "q301_sq_recall" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val ex = Tables.spread(emb)
        .select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .withColumn("xd", col("x").cast("double"))
      val bounds = ex.groupBy("pos").agg(min("xd").as("mn"), max("xd").as("mx"))
      val enc = ex.join(broadcast(bounds), "pos")
        .withColumn("bq", expr(BqF))
        .withColumn("recon", expr(ReconF))
        .select(col("vec_id").as("vid"), col("pos"), col("recon"))
      val q = ex.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("pos"), col("xd"))
      val adc = q.join(enc, "pos").filter(col("qid") =!= col("vid"))
        .withColumn("c_micro", expr(ErrMicroF))
        .groupBy("qid", "vid").agg(sum("c_micro").as("d_micro"))
      val sqTop = adc.withColumn("rk", row_number().over(
          Window.partitionBy("qid").orderBy(col("d_micro"), col("vid"))))
        .filter(col("rk") <= 10).select("qid", "vid")
      // codegen'd distance kernel (same op sequence as the portable
      // fold — bit-identical, but inside whole-stage codegen)
      val exact = emb.as("a").join(emb.as("b"),
          expr("a.vec_id < 20 AND a.vec_id != b.vec_id"))
        .select(col("a.vec_id").as("qid"), col("b.vec_id").as("vid"),
          graft.functions.VectorExpressions
            .sqDist(col("a.embedding"), col("b.embedding")).as("dist"))
      val exTop = exact.withColumn("rk", row_number().over(
          Window.partitionBy("qid").orderBy(col("dist"), col("vid"))))
        .filter(col("rk") <= 10).select("qid", "vid")
      val hits = exTop.join(sqTop, Seq("qid", "vid"), "left_semi")
        .groupBy("qid").agg(count(lit(1)).as("n_hit"))
      emb.filter(col("vec_id") < 20).select(col("vec_id").as("qid"))
        .join(hits, Seq("qid"), "left")
        .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
        .withColumn("recall_milli", expr("n_hit * 1000 div 10"))
        .orderBy("qid")
    },

    // Bigram language-model coverage: train a bigram vocabulary on
    // the 80% split (doc_id % 5 != 0), score held-out docs by the
    // share of their bigram OCCURRENCES present in it — the log-free
    // integer cousin of LM perplexity filtering (runtime ln is
    // banned by the bit-exactness contract; coverage ranks the same
    // quality signal). Vocab join is a broadcastable distinct-gram
    // frame at probe scale and a hash equi-join at corpus scale.
    "q302_bigram_coverage" -> { (s, d) =>
      val grams = TextOps.docsWithToks(s, d)
        .select(col("doc_id"), col("source"),
          explode(expr(Sp.shingles("toks", 2))).as("g"))
      val vocab = grams.filter(expr("doc_id % 5 != 0"))
        .select("g").distinct()
      grams.filter(expr("doc_id % 5 = 0"))
        .join(vocab.withColumn("iv", lit(true)), Seq("g"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when(col("iv").isNull, 0L).otherwise(1L)).as("n_known"))
        .withColumn("cov_milli", expr("n_known * 1000 div n_bigrams"))
        .orderBy("source")
    },

    // ABC inventory classification — the cumulative-share cut every
    // warehouse planner runs: parts ranked by revenue, class A = the
    // prefix holding ≤80% of revenue, B to 95%, C the tail. The
    // cumulative revenue is a GlobalOrder distributed running sum
    // (rank spine = parts — row scale, never a single-partition
    // window); the class test is cross-multiplied integers.
    "q303_abc_classification" -> { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("pk"))
        .agg(expr("CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) " +
          "* 100 AS BIGINT)) AS BIGINT)").as("rev_c"))
      val tot = rev.agg(sum("rev_c").as("tot_c"))
      GlobalOrder.withRunningSum(rev,
          Seq(col("rev_c").desc, col("pk").asc), negate(col("rev_c")),
          col("rev_c"), "cum_c")
        .crossJoin(broadcast(tot))
        .withColumn("cls", expr(
          "CASE WHEN cum_c * 100 <= 80 * tot_c THEN 'A' " +
            "WHEN cum_c * 100 <= 95 * tot_c THEN 'B' ELSE 'C' END"))
        .groupBy("cls")
        .agg(count(lit(1)).as("n_parts"), sum("rev_c").as("rev_c"),
          max("tot_c").as("tot_c"))
        .withColumn("share_milli", expr("rev_c * 1000 div tot_c"))
        .select("cls", "n_parts", "rev_c", "share_milli")
        .orderBy("cls")
    },

    // Supplier revenue concentration: Herfindahl–Hirschman index in
    // micro units (Σ share² — the DECIMAL(38,0) second-moment lane,
    // one identical double division at the end) plus the CR4 top-4
    // concentration ratio in exact milli. The supplier frame is
    // bounded, so its rank window is a legitimate tiny frame.
    "q304_herfindahl" -> { (s, d) =>
      val rev = Tables.memo(s, s"$d#q304rev") {
        Tables.lineitem(s, d)
          .groupBy(col("l_suppkey").as("sk"))
          .agg(expr("CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) " +
            "* 100 AS BIGINT)) AS BIGINT)").as("rev_c"))
      }
      // top-4 via TakeOrdered (bounded per-partition heaps + a 4-row
      // driver merge) — never a row_number over the full supplier
      // frame, which is a single-partition window at warehouse scale
      val top4 = rev.orderBy(col("rev_c").desc, col("sk")).limit(4)
        .agg(coalesce(sum("rev_c"), lit(0L)).as("top4_c"))
      rev.agg(
          count(lit(1)).as("n_suppliers"),
          sum("rev_c").as("tot_c"),
          sum(expr("CAST(rev_c AS DECIMAL(19,0)) * CAST(rev_c AS DECIMAL(19,0))"))
            .as("s2"))
        .crossJoin(broadcast(top4))
        // Σ share² surfaces through the portable wide→double (DuckDB's
        // HUGEINT→DOUBLE double-rounds above 2⁶⁴; see SqlDialect)
        .withColumn("hhi_micro", expr(
          s"CAST(floor(${Sp.wideToDouble("s2")} * CAST(1000000 AS DOUBLE) / " +
            "(CAST(tot_c AS DOUBLE) * CAST(tot_c AS DOUBLE))) AS BIGINT)"))
        .withColumn("cr4_milli", expr("top4_c * 1000 div tot_c"))
        .select("n_suppliers", "tot_c", "hhi_micro", "cr4_milli")
    },

    // Template-cluster size histogram — the dedup planner's first
    // question ("how much of the corpus shares an opening template,
    // and in what cluster shapes"): clusters by the 8-token-prefix
    // digest (the boilerplate unit — whole-text digests almost never
    // collide, openings do; the q144 span lesson), sizes rolled into
    // ⌊log₂⌋+1 buckets. Two map-side-combined aggregates over 8-byte
    // digests; the text column never shuffles.
    "q305_dup_cluster_sizes" -> { (s, d) =>
      TextOps.docsWithToks(s, d)
        .select(expr(Sp.hash64(
          Sp.strJoin(Sp.slice("toks", "1", "8"), " "))).as("h"))
        .groupBy("h").agg(count(lit(1)).as("sz"))
        .withColumn("bucket", expr("CAST(length(bin(sz)) AS BIGINT)"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_clusters"), sum("sz").as("n_docs"))
        .orderBy("bucket")
    },

    // k-anonymity audit over the (mktsegment, nationkey) quasi-
    // identifier — the privacy gate a dataset passes before leaving
    // the pipeline: group sizes, the share of customers in groups
    // smaller than k=10. One aggregate + one bounded rollup.
    "q306_k_anonymity" -> { (s, d) =>
      Tables.customer(s, d)
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_groups"),
          min("sz").as("min_size"),
          sum(expr("CASE WHEN sz < 10 THEN 1 ELSE 0 END")).as("n_small"),
          sum(expr("CASE WHEN sz < 10 THEN sz ELSE 0 END")).as("n_at_risk"),
          sum("sz").as("n_customers"))
        .withColumn("risk_milli", expr(
          "CASE WHEN n_customers = 0 THEN NULL " +
            "ELSE n_at_risk * 1000 div n_customers END"))
        .select("n_groups", "min_size", "n_small", "n_at_risk",
          "n_customers", "risk_milli")
    },

    // Partition-balance audit for candidate shuffle keys: hash each
    // key into 64 buckets (the portable digest — what the engine's
    // hash partitioner would see) and report max-over-mean skew in
    // milli (1000 = perfectly balanced). The pre-flight check before
    // choosing a repartition/bucketing key at 100 TB; a skew_milli
    // of 2000 means the hottest partition carries 2× its share.
    "q307_partition_balance" -> { (s, d) =>
      def balance(tag: String, keyed: DataFrame): DataFrame =
        keyed.select(expr(s"${Sp.hash64("concat('pb:', k)")} % 64").as("b"))
          .groupBy("b").agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("n_buckets"), min("n").as("min_n"),
            max("n").as("max_n"), sum("n").as("n_rows"))
          .select(lit(tag).as("key_name"), col("n_buckets"), col("min_n"),
            col("max_n"), col("n_rows"),
            expr("max_n * n_buckets * 1000 div n_rows").as("skew_milli"))
      balance("l_orderkey",
          Tables.lineitem(s, d).select(col("l_orderkey").as("k")))
        .unionAll(balance("user_id",
          Tables.events(s, d).select(col("user_id").as("k"))))
        .orderBy("key_name")
    },

    // Join-cardinality estimator audit — the planner diagnostic
    // behind every broadcast/shuffle decision: the textbook
    // uniformity estimate |A⋈B| ≈ n_a·n_b / max(d_a, d_b) against
    // the TRUE output size, computed WITHOUT materializing the join
    // (actual = Σ_k c_A(k)·c_B(k) over per-key counts — a
    // group-count join, never the row join itself). Error in milli;
    // >1000 = the estimator over-predicts. Three join shapes: a
    // clean FK join, a self-join on a mid-cardinality key, and a
    // self-join on a hot key (where uniformity breaks down).
    "q308_join_cardinality" -> { (s, d) =>
      def audit(tag: String, a: DataFrame, b: DataFrame): DataFrame = {
        val ca = a.groupBy("k").agg(count(lit(1)).as("ca"))
        val cb = b.groupBy("k").agg(count(lit(1)).as("cb"))
        val statsA = ca.agg(sum("ca").as("n_a"), count(lit(1)).as("d_a"))
        val statsB = cb.agg(sum("cb").as("n_b"), count(lit(1)).as("d_b"))
        val actual = ca.join(cb, "k")
          .agg(coalesce(sum(expr("ca * cb")), lit(0L)).as("actual"))
        // DECIMAL(38,0) product lane: n_a·n_b overflows BIGINT for
        // two ~3·10⁹-row inputs — routine at warehouse scale, and
        // exactly the regime a cardinality audit exists for
        statsA.crossJoin(broadcast(statsB))
          .crossJoin(broadcast(actual))
          .withColumn("est", expr(
            "CAST(n_a AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0)) " +
              "div greatest(d_a, d_b)"))
          .withColumn("err_milli", expr(
            "CASE WHEN actual = 0 THEN NULL " +
              "ELSE CAST(est AS DECIMAL(19,0)) * 1000 div actual END"))
          .select(lit(tag).as("join_name"), col("n_a"), col("n_b"),
            col("d_a"), col("d_b"), col("est"), col("actual"),
            col("err_milli"))
      }
      val liOk = Tables.lineitem(s, d).select(col("l_orderkey").as("k"))
      val ordOk = Tables.orders(s, d).select(col("o_orderkey").as("k"))
      val liPk = Tables.lineitem(s, d).select(col("l_partkey").as("k"))
      val evUid = Tables.events(s, d).select(col("user_id").as("k"))
      audit("li_orders_orderkey", liOk, ordOk)
        .unionAll(audit("li_li_partkey", liPk, liPk))
        .unionAll(audit("ev_ev_user", evUid, evUid))
        .orderBy("join_name")
    },

    // Incremental join maintenance (operators/DeltaJoin.scala): when
    // append increments land on BOTH sides of a materialized join,
    // the refresh is three delta-probed terms — never a recompute of
    // the base join. The gate splits lineitem (by line number) and
    // orders (by key class) into base+increment, computes the delta,
    // and carries the completeness identity |base⋈base| + |Δ| =
    // |full⋈full| as an output column the oracle must agree on.
    "q309_delta_join" -> { (s, d) =>
      val li = Tables.lineitem(s, d).select(col("l_orderkey").as("k"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("price_c"),
        col("l_linenumber"))
      val o = Tables.orders(s, d).select(col("o_orderkey").as("k"))
      val liBase = li.filter(col("l_linenumber") < 6).drop("l_linenumber")
      val liDelta = li.filter(col("l_linenumber") >= 6).drop("l_linenumber")
      val oBase = o.filter(expr("k % 10 != 0"))
      val oDelta = o.filter(expr("k % 10 = 0"))
      val delta = graft.operators.DeltaJoin
        .appendDelta(liBase, liDelta, oBase, oDelta, Seq("k"))
      val base = liBase.join(oBase, Seq("k"))
      val full = graft.operators.DeltaJoin
        .fullJoin(liBase, liDelta, oBase, oDelta, Seq("k"))
      delta.agg(count(lit(1)).as("n_delta"),
          coalesce(sum("price_c"), lit(0L)).as("rev_delta_c"))
        .crossJoin(broadcast(base.agg(count(lit(1)).as("n_base"))))
        .crossJoin(broadcast(full.agg(count(lit(1)).as("n_full"))))
        .withColumn("identity_ok",
          col("n_base") + col("n_delta") === col("n_full"))
        .select("n_base", "n_delta", "n_full", "rev_delta_c", "identity_ok")
    },

    // Total-variation distance between the event-type mixes of the
    // corpus' two time halves — the distribution-drift monitor that
    // needs no logs (PSI/KL do) and no quantiles (KS does): TVD =
    // ½ Σ|p_i − q_i|, kept exact by cross-multiplying counts before
    // the single division. Midpoint from the corpus' own time range
    // (broadcast scalar); two map-side-combined rollups.
    "q310_tvd_drift" -> { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("event_type"), expr("unix_micros(ts)").as("tsu"))
      val mid = e.agg(expr("(min(tsu) + max(tsu)) div 2").as("mid"))
      val halves = e.crossJoin(broadcast(mid))
        .withColumn("h", expr("CASE WHEN tsu < mid THEN 0 ELSE 1 END"))
      val perType = halves.groupBy("event_type")
        .agg(sum(expr("CASE WHEN h = 0 THEN 1 ELSE 0 END")).as("n1"),
          sum(expr("CASE WHEN h = 1 THEN 1 ELSE 0 END")).as("n2"))
      // count-product DECIMAL lane (the q297/q308 convention): n·t
      // products overflow BIGINT near 7·10⁷ events per half; ×1000/2
      // folds to ×500 to keep the decimal width at 38
      val tots = perType.agg(sum("n1").as("t1"), sum("n2").as("t2"))
      perType.crossJoin(broadcast(tots))
        .agg(max("t1").as("n_first"), max("t2").as("n_second"),
          sum(expr("abs(CAST(n1 AS DECIMAL(19,0)) * t2 - " +
            "CAST(n2 AS DECIMAL(19,0)) * t1)")).as("absdiff_x"))
        .withColumn("tvd_milli", expr(
          "CASE WHEN n_first = 0 OR n_second = 0 THEN NULL " +
            "ELSE absdiff_x * 500 div " +
            "(CAST(n_first AS DECIMAL(19,0)) * n_second) END"))
        .select("n_first", "n_second", "tvd_milli")
    },

    // Burst-dedup audit: per (user, type), an activity burst is a
    // maximal run of events with gaps ≤ 1 h, and only the burst's
    // FIRST event is kept — the repeated-ping collapse a telemetry
    // pipeline runs before sessionless rollups. (This is gap-window
    // semantics, deliberately: a kept-event-relative debounce — drop
    // anything within 1 h of the last KEPT — is a sequential fold
    // that neither engine's window algebra expresses; the burst
    // formulation is the declarative, shuffle-once equivalent both
    // engines agree on.) One hash exchange on the (user, type) key.
    "q311_debounce" -> { (s, d) =>
      val byKey = Window.partitionBy("user_id", "event_type")
        .orderBy(col("tsu"), col("event_id"))
      val run = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(ts)").as("tsu"))
        .withColumn("prev", lag("tsu", 1).over(byKey))
        .withColumn("new_win",
          when(col("prev").isNull || col("tsu") - col("prev") > 3600000000L, 1L)
            .otherwise(0L))
        .withColumn("win_id", sum("new_win").over(run))
        .withColumn("rn_in_win", row_number().over(
          Window.partitionBy("user_id", "event_type", "win_id")
            .orderBy(col("tsu"), col("event_id"))))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(expr("CASE WHEN rn_in_win = 1 THEN 1 ELSE 0 END")).as("n_kept"))
        .withColumn("drop_milli",
          expr("(n_events - n_kept) * 1000 div n_events"))
        .orderBy("event_type")
    },

    // Vocabulary-growth (Heaps-law) readout per source: distinct
    // tokens within the first ¼, ½, and all of each source's doc-id
    // span — sublinear growth ⇒ natural text, near-linear ⇒ id-like
    // noise. The prefix levels are PURE FUNCTIONS of broadcast
    // per-source (min, max) doc-id bounds — no rank pass at all, so
    // nothing orders a row-scale frame; three conditional distinct
    // aggregates share one exchange.
    "q312_vocab_growth" -> { (s, d) =>
      val tok = TextOps.docsWithToks(s, d)
        .select(col("source"), col("doc_id"), explode(col("toks")).as("t"))
      // bounds from the DOC-level frame (≈50× fewer rows than the
      // exploded tokens); size(toks) > 0 matches explode's drop of
      // token-less docs, so (lo, hi) are identical to a token-frame
      // aggregate
      val span = TextOps.docsWithToks(s, d)
        .filter(expr("size(toks) > 0"))
        .groupBy("source")
        .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      tok.join(broadcast(span), "source")
        .withColumn("q1", expr("doc_id <= lo + (hi - lo) div 4"))
        .withColumn("q2", expr("doc_id <= lo + (hi - lo) div 2"))
        .groupBy("source")
        .agg(
          count_distinct(when(col("q1"), col("t"))).as("v_quarter"),
          count_distinct(when(col("q2"), col("t"))).as("v_half"),
          count_distinct(col("t")).as("v_full"),
          sum(expr("CASE WHEN q1 THEN 1 ELSE 0 END")).as("n_quarter"),
          sum(expr("CASE WHEN q2 THEN 1 ELSE 0 END")).as("n_half"),
          count(lit(1)).as("n_full"))
        .orderBy("source")
    },

    // Label separability by embedding norm alone — AUC via the
    // rank-sum identity AUC = U / (n₀·n₁), on micro-quantized squared
    // norms with the q296 doubled-U machinery (GlobalOrder value
    // spine, tie-splitting ½ absorbed by the doubling). An AUC near
    // 500 milli says the norm carries no label signal — the sanity
    // check before anyone trains a norm-thresholding filter.
    "q313_norm_auc" -> { (s, d) =>
      // HONEST CEILING (q296's convention): u2 ≈ 2·n_pos·n_neg tops
      // BIGINT near 1.5·10⁹ embeddings per class — past that the u2
      // lane moves to DECIMAL(38,0); the AUC division already rides
      // the decimal lane (×1000/2 folded to ×500 to hold width 38)
      val v = Tables.spread(Tables.embeddings(s, d))
        .filter(col("label").isin(0, 1))
        .select(
          expr(s"CAST(floor((${Sp.norm2("embedding")}) * " +
            "CAST(1000000 AS DOUBLE)) AS BIGINT)").as("v"),
          when(col("label") === 1, 1L).otherwise(0L).as("isa"))
      val perV = v.groupBy("v").agg(
        sum("isa").as("na_v"),
        sum(expr("1 - isa")).as("nb_v"))
      val cum = GlobalOrder.withRunningSum(perV, Seq(col("v")), col("v"),
        col("nb_v"), "cumb")
      cum.agg(
          sum("na_v").as("n_pos"), sum("nb_v").as("n_neg"),
          sum(expr("na_v * (2 * (cumb - nb_v) + nb_v)")).as("u2"))
        .withColumn("auc_milli", expr(
          "CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL " +
            "ELSE CAST(u2 AS DECIMAL(19,0)) * 500 div " +
            "(CAST(n_pos AS DECIMAL(19,0)) * n_neg) END"))
        .select("n_pos", "n_neg", "u2", "auc_milli")
    },

    // Discount-band response curve: quantity and revenue against the
    // discount ladder (centi-discount bands — exact integers from the
    // DECIMAL cast, never a float bucketer). One map-side-combined
    // rollup; avg quantities in exact milli.
    "q314_discount_bands" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(
          expr("CAST(CAST(l_discount AS DECIMAL(5,2)) * 100 AS BIGINT)")
            .as("disc_c"),
          expr("CAST(l_quantity AS BIGINT)").as("qty"),
          expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("price_c"))
        .groupBy("disc_c")
        .agg(count(lit(1)).as("n"), sum("qty").as("qty_sum"),
          sum("price_c").as("rev_c"))
        .withColumn("avg_qty_milli", expr("qty_sum * 1000 div n"))
        .orderBy("disc_c")
    },

    // Sentence-level text profile per source: sentence counts from
    // terminator splits, words-per-sentence in exact milli — the
    // readability axis the token metrics (q24/q25) don't see. One
    // narrow projection + rollup; the text column never shuffles.
    "q315_sentence_stats" -> { (s, d) =>
      TextOps.docsWithToks(s, d)
        .select(col("source"),
          expr("CAST(size(filter(split(text, '[.!?]'), " +
            "x -> trim(x) != '')) AS BIGINT)").as("n_sent"),
          expr("CAST(size(toks) AS BIGINT)").as("n_toks"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_sent").as("sent_sum"),
          sum("n_toks").as("tok_sum"))
        .withColumn("sent_per_doc_milli", expr("sent_sum * 1000 div n_docs"))
        .withColumn("toks_per_sent_milli", expr(
          "CASE WHEN sent_sum = 0 THEN NULL " +
            "ELSE tok_sum * 1000 div sent_sum END"))
        .orderBy("source")
    },

    // DAU/MAU stickiness per month — the engagement ratio every
    // product dashboard leads with: average daily-active count over
    // monthly-active count, in exact milli (ΣDAU·1000 div (days·MAU)
    // — one cross-multiplied division, no float averaging). Two
    // distinct aggregates sharing the (user, day) dedup pass.
    "q316_stickiness" -> { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"),
          (year(col("ts")) * 100 + month(col("ts"))).cast("long").as("ym"),
          to_date(col("ts")).as("day"))
        .distinct()
      val dau = ud.groupBy("ym", "day").agg(count(lit(1)).as("dau"))
        .groupBy("ym").agg(count(lit(1)).as("n_days"), sum("dau").as("dau_sum"))
      val mau = ud.select("ym", "user_id").distinct()
        .groupBy("ym").agg(count(lit(1)).as("mau"))
      dau.join(mau, "ym")
        .withColumn("stickiness_milli",
          expr("dau_sum * 1000 div (n_days * mau)"))
        .select("ym", "n_days", "dau_sum", "mau", "stickiness_milli")
        .orderBy("ym")
    },

    // Revenue waterfall — gross → discount loss → tax add → returns
    // loss → net, reconciled in-band: every stage in exact
    // cent-percent² units (cents × integer discount pct × integer tax
    // pct — no rounding mode ever enters, the q239 lane squared), and
    // the output carries the ledger identity net = gross − disc + tax
    // − returns as a column the oracle must agree on. One map-side-
    // combined rollup over lineitem. HONEST CEILING: Σ cents·10⁴ at
    // ~10⁹ rows approaches 2⁶³ — past that the lanes move to
    // DECIMAL(38,0).
    "q317_revenue_waterfall" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(
          expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("ep_c"),
          expr("CAST(CAST(l_discount AS DECIMAL(5,2)) * 100 AS BIGINT)")
            .as("d_pct"),
          expr("CAST(CAST(l_tax AS DECIMAL(5,2)) * 100 AS BIGINT)")
            .as("t_pct"),
          (col("l_returnflag") === "R").as("ret"))
        .agg(
          sum(expr("ep_c * 10000")).as("gross_cpp"),
          sum(expr("ep_c * d_pct * 100")).as("disc_loss_cpp"),
          sum(expr("ep_c * (100 - d_pct) * t_pct")).as("tax_add_cpp"),
          sum(expr("CASE WHEN ret THEN ep_c * (100 - d_pct) * (100 + t_pct) " +
            "ELSE 0 END")).as("returns_loss_cpp"),
          sum(expr("CASE WHEN ret THEN 0 " +
            "ELSE ep_c * (100 - d_pct) * (100 + t_pct) END")).as("net_cpp"))
        .withColumn("identity_ok", expr(
          "net_cpp = gross_cpp - disc_loss_cpp + tax_add_cpp - returns_loss_cpp"))
        .select("gross_cpp", "disc_loss_cpp", "tax_add_cpp",
          "returns_loss_cpp", "net_cpp", "identity_ok")
    })

  val oracles: Map[String, String] = Map(

    "q290_basket_rules" ->
      """WITH p AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM p),
        |item AS (SELECT pk, COUNT(*) AS n_item FROM p GROUP BY 1),
        |pairs AS (
        |  SELECT a.pk AS pa, b.pk AS pb, COUNT(*) AS n_ab
        |  FROM p a JOIN p b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT pa, pb, n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
        |  n_ab * 1000 // ia.n_item AS conf_milli,
        |  n_ab * n.n_orders * 1000 // (ia.n_item * ib.n_item) AS lift_milli
        |FROM pairs
        |JOIN item ia ON ia.pk = pa
        |JOIN item ib ON ib.pk = pb
        |CROSS JOIN n
        |ORDER BY lift_milli DESC, pa, pb
        |LIMIT 40""".stripMargin,

    "q291_heavy_hitters" ->
      """WITH t AS (SELECT COUNT(*) AS n FROM lineitem)
        |SELECT l_suppkey, COUNT(*) AS cnt
        |FROM lineitem CROSS JOIN t
        |GROUP BY l_suppkey, t.n
        |HAVING COUNT(*) * 100 > t.n
        |ORDER BY cnt DESC, l_suppkey""".stripMargin,

    "q292_cohort_retention" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym
        |  FROM orders),
        |first AS (SELECT o_custkey, MIN(ym) AS cym FROM o GROUP BY 1),
        |active AS (SELECT DISTINCT o_custkey, ym FROM o),
        |coh AS (SELECT cym, COUNT(*) AS n_cohort FROM first GROUP BY 1),
        |m AS (
        |  SELECT f.cym,
        |    (a.ym // 100 - f.cym // 100) * 12 + (a.ym % 100 - f.cym % 100)
        |      AS m_since
        |  FROM active a JOIN first f ON a.o_custkey = f.o_custkey)
        |SELECT m.cym, m_since, n_cohort, COUNT(*) AS n_active,
        |  COUNT(*) * 1000 // n_cohort AS ret_milli
        |FROM m JOIN coh ON m.cym = coh.cym
        |WHERE m_since BETWEEN 0 AND 11
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2""".stripMargin,

    "q293_dq_audit" ->
      """WITH nli AS (SELECT COUNT(*) AS n_total FROM lineitem),
        |nord AS (SELECT COUNT(*) AS n_total FROM orders),
        |bads AS (
        |  SELECT 'li_disc_range' AS chk,
        |    (SELECT COUNT(*) FROM lineitem
        |     WHERE l_discount < 0 OR l_discount > 0.5) AS n_bad
        |  UNION ALL
        |  SELECT 'li_dup_line',
        |    (SELECT COUNT(*) FROM (SELECT 1 FROM lineitem
        |       GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1))
        |  UNION ALL
        |  SELECT 'li_nonpos_qty',
        |    (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
        |  UNION ALL
        |  SELECT 'li_orphan',
        |    (SELECT COUNT(*) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                       WHERE o.o_orderkey = l.l_orderkey))
        |  UNION ALL
        |  SELECT 'li_ship_before_order',
        |    (SELECT COUNT(*) FROM lineitem l JOIN orders o
        |       ON l.l_orderkey = o.o_orderkey
        |     WHERE l.l_shipdate < o.o_orderdate)
        |  UNION ALL
        |  SELECT 'ord_childless',
        |    (SELECT COUNT(*) FROM orders o
        |     WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |                       WHERE l.l_orderkey = o.o_orderkey)))
        |SELECT chk, n_bad,
        |  CASE WHEN chk = 'ord_childless'
        |    THEN (SELECT n_total FROM nord)
        |    ELSE (SELECT n_total FROM nli) END AS n_total,
        |  CASE WHEN (CASE WHEN chk = 'ord_childless'
        |      THEN (SELECT n_total FROM nord)
        |      ELSE (SELECT n_total FROM nli) END) = 0 THEN NULL
        |    ELSE n_bad * 1000 // (CASE WHEN chk = 'ord_childless'
        |      THEN (SELECT n_total FROM nord)
        |      ELSE (SELECT n_total FROM nli) END) END AS bad_milli
        |FROM bads
        |ORDER BY chk""".stripMargin,

    "q294_stratified_alloc" ->
      """WITH counts AS (
        |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
        |tot AS (SELECT SUM(n_docs) AS n_total FROM counts),
        |base AS (
        |  SELECT source, n_docs,
        |    CAST(10000 * n_docs // n_total AS BIGINT) AS base,
        |    10000 * n_docs - (10000 * n_docs // n_total) * n_total AS rem
        |  FROM counts CROSS JOIN tot),
        |def AS (SELECT CAST(10000 - SUM(base) AS BIGINT) AS deficit FROM base),
        |rk AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
        |  FROM base CROSS JOIN def)
        |SELECT source, n_docs, base,
        |  CAST(CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT) AS extra,
        |  base + CAST(CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc
        |FROM rk ORDER BY source""".stripMargin,

    "q296_mann_whitney" ->
      """WITH v AS (
        |  SELECT CAST(floor(value * 1000) AS BIGINT) AS v,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isa
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
        |pv AS (
        |  SELECT v, CAST(SUM(isa) AS BIGINT) AS na_v,
        |    CAST(SUM(1 - isa) AS BIGINT) AS nb_v, COUNT(*) AS t_v
        |  FROM v GROUP BY 1),
        |c AS (
        |  SELECT *, CAST(SUM(nb_v) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumb
        |  FROM pv),
        |agg AS (
        |  SELECT CAST(SUM(na_v) AS BIGINT) AS n_a,
        |    CAST(SUM(nb_v) AS BIGINT) AS n_b,
        |    CAST(SUM(na_v * (2 * (cumb - nb_v) + nb_v)) AS BIGINT) AS u2,
        |    CAST(SUM(t_v * t_v * t_v - t_v) AS BIGINT) AS tie_t3
        |  FROM c)
        |SELECT n_a, n_b, u2, tie_t3,
        |  CASE WHEN n_a = 0 OR n_b = 0
        |    OR CAST(tie_t3 AS DECIMAL(38,0)) =
        |      CAST(n_a + n_b AS DECIMAL(12,0)) *
        |      CAST(n_a + n_b - 1 AS DECIMAL(12,0)) *
        |      CAST(n_a + n_b + 1 AS DECIMAL(12,0))
        |    THEN NULL ELSE
        |    (CAST(u2 - n_a * n_b AS DOUBLE)) /
        |    sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 3 *
        |    (CAST(n_a + n_b + 1 AS DOUBLE) - CAST(tie_t3 AS DOUBLE) /
        |    (CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b - 1 AS DOUBLE)))) END AS z
        |FROM agg""".stripMargin,

    "q297_chisq_lang_source" ->
      """WITH cells AS (
        |  SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2),
        |rr AS (SELECT lang, COUNT(*) AS r FROM documents GROUP BY 1),
        |cc AS (SELECT source, COUNT(*) AS c FROM documents GROUP BY 1),
        |nn AS (SELECT COUNT(*) AS n FROM documents)
        |SELECT lang, source, o,
        |  CAST(CAST(r AS HUGEINT) * CAST(c * 1000000 AS HUGEINT)
        |    // n AS BIGINT) AS exp_micro,
        |  CAST(floor((CAST(o AS DOUBLE) * CAST(n AS DOUBLE) -
        |    CAST(r AS DOUBLE) * CAST(c AS DOUBLE)) *
        |    (CAST(o AS DOUBLE) * CAST(n AS DOUBLE) -
        |    CAST(r AS DOUBLE) * CAST(c AS DOUBLE)) * CAST(1000000 AS DOUBLE) /
        |    (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) * CAST(n AS DOUBLE)))
        |    AS BIGINT) AS contrib_micro
        |FROM cells JOIN rr USING (lang) JOIN cc USING (source) CROSS JOIN nn
        |ORDER BY lang, source""".stripMargin,

    "q298_bollinger" ->
      s"""WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT day, rev_c,
        |    CAST(COUNT(*) OVER win AS BIGINT) AS n_win,
        |    CAST(SUM(rev_c) OVER win AS BIGINT) AS s1,
        |    SUM(CAST(rev_c AS DECIMAL(19,0)) * CAST(rev_c AS DECIMAL(19,0)))
        |      OVER win AS s2
        |  FROM d
        |  WINDOW win AS (ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
        |w2 AS (
        |  SELECT *, CAST(s1 AS DOUBLE) / CAST(n_win AS DOUBLE) AS m FROM w),
        |w3 AS (
        |  SELECT *, sqrt(greatest(CAST(0 AS DOUBLE),
        |    ${Du.wideToDouble("s2")} / CAST(n_win AS DOUBLE) - m * m)) AS sd
        |  FROM w2)
        |SELECT day, rev_c, n_win, m, sd,
        |  CAST(CASE WHEN n_win < 7 THEN NULL
        |    WHEN CAST(rev_c AS DOUBLE) > m + 2 * sd THEN 1
        |    WHEN CAST(rev_c AS DOUBLE) < m - 2 * sd THEN -1 ELSE 0 END
        |    AS BIGINT) AS breach
        |FROM w3 ORDER BY day""".stripMargin,

    "q299_clustering_coeff" ->
      """WITH p AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (
        |  SELECT a.pk AS pa, b.pk AS pb
        |  FROM p a JOIN p b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |sym AS (SELECT pa, pb FROM e UNION ALL SELECT pb, pa FROM e),
        |deg AS (SELECT pa AS node, COUNT(*) AS deg FROM sym GROUP BY 1),
        |tri AS (
        |  SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
        |  FROM e e1 JOIN e e2 ON e1.pb = e2.pa
        |  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
        |pn AS (
        |  SELECT node, COUNT(*) AS n_tri FROM (
        |    SELECT a AS node FROM tri
        |    UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri)
        |  GROUP BY 1)
        |SELECT node, deg, n_tri, n_tri * 2000 // (deg * (deg - 1)) AS cc_milli
        |FROM deg JOIN pn USING (node)
        |WHERE deg >= 3
        |ORDER BY cc_milli DESC, node
        |LIMIT 30""".stripMargin,

    "q300_sq_profile" ->
      s"""WITH ex AS (
         |  SELECT vec_id,
         |    CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
         |    CAST(unnest(embedding) AS DOUBLE) AS xd
         |  FROM embeddings),
         |b AS (SELECT pos, MIN(xd) AS mn, MAX(xd) AS mx FROM ex GROUP BY 1),
         |enc AS (
         |  SELECT ex.pos, xd, mn, mx, $BqF AS bq FROM ex JOIN b USING (pos)),
         |r AS (SELECT pos, mn, mx, xd, $ReconF AS recon FROM enc)
         |SELECT pos, MIN(mn) AS mn, MAX(mx) AS mx, COUNT(*) AS n,
         |  CAST(SUM($ErrMicroF) AS BIGINT) AS err_micro
         |FROM r GROUP BY pos ORDER BY pos""".stripMargin,

    "q301_sq_recall" ->
      s"""WITH ex AS (
         |  SELECT vec_id,
         |    CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
         |    CAST(unnest(embedding) AS DOUBLE) AS xd
         |  FROM embeddings),
         |b AS (SELECT pos, MIN(xd) AS mn, MAX(xd) AS mx FROM ex GROUP BY 1),
         |enc0 AS (
         |  SELECT vec_id AS vid, ex.pos, xd, mn, mx, $BqF AS bq
         |  FROM ex JOIN b USING (pos)),
         |enc AS (SELECT vid, pos, $ReconF AS recon FROM enc0),
         |q AS (SELECT vec_id AS qid, pos, xd FROM ex WHERE vec_id < 20),
         |adc AS (
         |  SELECT qid, vid, CAST(SUM($ErrMicroF) AS BIGINT) AS d_micro
         |  FROM q JOIN enc USING (pos)
         |  WHERE qid != vid GROUP BY 1, 2),
         |sqtop AS (
         |  SELECT qid, vid FROM (
         |    SELECT qid, vid,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d_micro, vid) AS rk
         |    FROM adc) WHERE rk <= 10),
         |exact AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS vid,
         |    ${Du.sqdist("a.embedding", "b.embedding")} AS dist
         |  FROM embeddings a JOIN embeddings b
         |    ON a.vec_id < 20 AND a.vec_id != b.vec_id),
         |extop AS (
         |  SELECT qid, vid FROM (
         |    SELECT qid, vid,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, vid) AS rk
         |    FROM exact) WHERE rk <= 10),
         |hits AS (
         |  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_hit
         |  FROM extop JOIN sqtop USING (qid, vid) GROUP BY 1)
         |SELECT e.vec_id AS qid,
         |  COALESCE(n_hit, CAST(0 AS BIGINT)) AS n_hit,
         |  COALESCE(n_hit, CAST(0 AS BIGINT)) * 1000 // 10 AS recall_milli
         |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 20) e
         |LEFT JOIN hits ON e.vec_id = hits.qid
         |ORDER BY qid""".stripMargin,

    "q302_bigram_coverage" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, ${Du.tokens("text")} AS toks FROM documents),
         |g AS (
         |  SELECT doc_id, source, unnest(${Du.shingles("toks", 2)}) AS g
         |  FROM t),
         |vocab AS (SELECT DISTINCT g FROM g WHERE doc_id % 5 != 0),
         |h AS (
         |  SELECT source, (vocab.g IS NOT NULL) AS iv
         |  FROM g LEFT JOIN vocab ON g.g = vocab.g
         |  WHERE doc_id % 5 = 0)
         |SELECT source, COUNT(*) AS n_bigrams,
         |  CAST(SUM(CASE WHEN iv THEN 1 ELSE 0 END) AS BIGINT) AS n_known,
         |  CAST(SUM(CASE WHEN iv THEN 1 ELSE 0 END) AS BIGINT) * 1000
         |    // COUNT(*) AS cov_milli
         |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,

    "q303_abc_classification" ->
      """WITH rev AS (
        |  SELECT l_partkey AS pk,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(SUM(rev_c) AS BIGINT) AS tot_c FROM rev),
        |c AS (
        |  SELECT pk, rev_c,
        |    CAST(SUM(rev_c) OVER (ORDER BY rev_c DESC, pk
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_c
        |  FROM rev)
        |SELECT CASE WHEN cum_c * 100 <= 80 * tot_c THEN 'A'
        |    WHEN cum_c * 100 <= 95 * tot_c THEN 'B' ELSE 'C' END AS cls,
        |  COUNT(*) AS n_parts, CAST(SUM(rev_c) AS BIGINT) AS rev_c,
        |  CAST(SUM(rev_c) AS BIGINT) * 1000 // tot_c AS share_milli
        |FROM c CROSS JOIN tot
        |GROUP BY cls, tot_c
        |ORDER BY cls""".stripMargin,

    "q304_herfindahl" ->
      s"""WITH rev AS (
        |  SELECT l_suppkey AS sk,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem GROUP BY 1),
        |t4 AS (
        |  SELECT CAST(COALESCE(SUM(rev_c), 0) AS BIGINT) AS top4_c
        |  FROM (SELECT rev_c FROM rev ORDER BY rev_c DESC, sk LIMIT 4)),
        |a AS (
        |  SELECT COUNT(*) AS n_suppliers, CAST(SUM(rev_c) AS BIGINT) AS tot_c,
        |    SUM(CAST(rev_c AS DECIMAL(19,0)) * CAST(rev_c AS DECIMAL(19,0)))
        |      AS s2
        |  FROM rev)
        |SELECT n_suppliers, tot_c,
        |  CAST(floor(${Du.wideToDouble("s2")} * CAST(1000000 AS DOUBLE) /
        |    (CAST(tot_c AS DOUBLE) * CAST(tot_c AS DOUBLE))) AS BIGINT)
        |    AS hhi_micro,
        |  top4_c * 1000 // tot_c AS cr4_milli
        |FROM a CROSS JOIN t4""".stripMargin,

    "q305_dup_cluster_sizes" ->
      s"""WITH t AS (SELECT ${Du.tokens("text")} AS toks FROM documents),
         |c AS (
         |  SELECT ${Du.hash64(Du.strJoin(Du.slice("toks", "1", "8"), " "))}
         |    AS h, COUNT(*) AS sz
         |  FROM t GROUP BY 1)
         |SELECT CAST(length(bin(sz)) AS BIGINT) AS bucket,
         |  COUNT(*) AS n_clusters, CAST(SUM(sz) AS BIGINT) AS n_docs
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "q306_k_anonymity" ->
      """WITH g AS (
        |  SELECT c_mktsegment, c_nationkey, COUNT(*) AS sz
        |  FROM customer GROUP BY 1, 2)
        |SELECT COUNT(*) AS n_groups, MIN(sz) AS min_size,
        |  CAST(SUM(CASE WHEN sz < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
        |  CAST(SUM(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS BIGINT)
        |    AS n_at_risk,
        |  CAST(SUM(sz) AS BIGINT) AS n_customers,
        |  CASE WHEN CAST(SUM(sz) AS BIGINT) = 0 THEN NULL
        |    ELSE CAST(SUM(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS BIGINT)
        |      * 1000 // CAST(SUM(sz) AS BIGINT) END AS risk_milli
        |FROM g""".stripMargin,

    "q307_partition_balance" ->
      s"""WITH c1 AS (
         |  SELECT ${Du.hash64("concat('pb:', l_orderkey)")} % 64 AS b,
         |    COUNT(*) AS n
         |  FROM lineitem GROUP BY 1),
         |a1 AS (
         |  SELECT COUNT(*) AS n_buckets, MIN(n) AS min_n, MAX(n) AS max_n,
         |    CAST(SUM(n) AS BIGINT) AS n_rows
         |  FROM c1),
         |c2 AS (
         |  SELECT ${Du.hash64("concat('pb:', user_id)")} % 64 AS b,
         |    COUNT(*) AS n
         |  FROM events GROUP BY 1),
         |a2 AS (
         |  SELECT COUNT(*) AS n_buckets, MIN(n) AS min_n, MAX(n) AS max_n,
         |    CAST(SUM(n) AS BIGINT) AS n_rows
         |  FROM c2)
         |SELECT 'l_orderkey' AS key_name, n_buckets, min_n, max_n, n_rows,
         |  max_n * n_buckets * 1000 // n_rows AS skew_milli FROM a1
         |UNION ALL
         |SELECT 'user_id', n_buckets, min_n, max_n, n_rows,
         |  max_n * n_buckets * 1000 // n_rows AS skew_milli FROM a2
         |ORDER BY key_name""".stripMargin,

    "q308_join_cardinality" ->
      """WITH
        |liok AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
        |ordok AS (SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
        |lipk AS (SELECT l_partkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
        |evu AS (SELECT user_id AS k, COUNT(*) AS c FROM events GROUP BY 1),
        |j1 AS (
        |  SELECT 'li_orders_orderkey' AS join_name,
        |    (SELECT CAST(SUM(c) AS BIGINT) FROM liok) AS n_a,
        |    (SELECT CAST(SUM(c) AS BIGINT) FROM ordok) AS n_b,
        |    (SELECT COUNT(*) FROM liok) AS d_a,
        |    (SELECT COUNT(*) FROM ordok) AS d_b,
        |    (SELECT CAST(COALESCE(SUM(a.c * b.c), 0) AS BIGINT)
        |     FROM liok a JOIN ordok b ON a.k = b.k) AS actual),
        |j2 AS (
        |  SELECT 'li_li_partkey' AS join_name,
        |    (SELECT CAST(SUM(c) AS BIGINT) FROM lipk) AS n_a,
        |    (SELECT CAST(SUM(c) AS BIGINT) FROM lipk) AS n_b,
        |    (SELECT COUNT(*) FROM lipk) AS d_a,
        |    (SELECT COUNT(*) FROM lipk) AS d_b,
        |    (SELECT CAST(COALESCE(SUM(a.c * b.c), 0) AS BIGINT)
        |     FROM lipk a JOIN lipk b ON a.k = b.k) AS actual),
        |j3 AS (
        |  SELECT 'ev_ev_user' AS join_name,
        |    (SELECT CAST(SUM(c) AS BIGINT) FROM evu) AS n_a,
        |    (SELECT CAST(SUM(c) AS BIGINT) FROM evu) AS n_b,
        |    (SELECT COUNT(*) FROM evu) AS d_a,
        |    (SELECT COUNT(*) FROM evu) AS d_b,
        |    (SELECT CAST(COALESCE(SUM(a.c * b.c), 0) AS BIGINT)
        |     FROM evu a JOIN evu b ON a.k = b.k) AS actual),
        |u AS (SELECT * FROM j1 UNION ALL SELECT * FROM j2
        |      UNION ALL SELECT * FROM j3),
        |e AS (
        |  SELECT *, CAST(CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT)
        |    // greatest(d_a, d_b) AS BIGINT) AS est
        |  FROM u)
        |SELECT join_name, n_a, n_b, d_a, d_b, est, actual,
        |  CASE WHEN actual = 0 THEN NULL
        |    ELSE CAST(CAST(est AS HUGEINT) * 1000 // actual AS BIGINT)
        |    END AS err_milli
        |FROM e ORDER BY join_name""".stripMargin,

    "q309_delta_join" ->
      """WITH li AS (
        |  SELECT l_orderkey AS k,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS price_c,
        |    l_linenumber
        |  FROM lineitem),
        |o AS (SELECT o_orderkey AS k FROM orders),
        |libase AS (SELECT k, price_c FROM li WHERE l_linenumber < 6),
        |lidelta AS (SELECT k, price_c FROM li WHERE l_linenumber >= 6),
        |obase AS (SELECT * FROM o WHERE k % 10 != 0),
        |odelta AS (SELECT * FROM o WHERE k % 10 = 0),
        |delta AS (
        |  SELECT a.k, a.price_c FROM lidelta a JOIN obase b ON a.k = b.k
        |  UNION ALL
        |  SELECT a.k, a.price_c FROM libase a JOIN odelta b ON a.k = b.k
        |  UNION ALL
        |  SELECT a.k, a.price_c FROM lidelta a JOIN odelta b ON a.k = b.k),
        |d AS (
        |  SELECT COUNT(*) AS n_delta,
        |    CAST(COALESCE(SUM(price_c), 0) AS BIGINT) AS rev_delta_c
        |  FROM delta),
        |bs AS (
        |  SELECT COUNT(*) AS n_base
        |  FROM libase a JOIN obase b ON a.k = b.k),
        |f AS (
        |  SELECT COUNT(*) AS n_full
        |  FROM (SELECT k, price_c FROM libase
        |        UNION ALL SELECT k, price_c FROM lidelta) a
        |  JOIN (SELECT k FROM obase UNION ALL SELECT k FROM odelta) b
        |    ON a.k = b.k)
        |SELECT n_base, n_delta, n_full, rev_delta_c,
        |  n_base + n_delta = n_full AS identity_ok
        |FROM d CROSS JOIN bs CROSS JOIN f""".stripMargin,

    "q310_tvd_drift" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts::TIMESTAMP) AS tsu FROM events),
        |m AS (SELECT (MIN(tsu) + MAX(tsu)) // 2 AS mid FROM e),
        |h AS (
        |  SELECT event_type, CASE WHEN tsu < mid THEN 0 ELSE 1 END AS h
        |  FROM e CROSS JOIN m),
        |pt AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM h GROUP BY 1),
        |t AS (
        |  SELECT CAST(SUM(n1) AS BIGINT) AS t1, CAST(SUM(n2) AS BIGINT) AS t2
        |  FROM pt),
        |a AS (
        |  SELECT MAX(t1) AS n_first, MAX(t2) AS n_second,
        |    SUM(abs(CAST(n1 AS HUGEINT) * t2 - CAST(n2 AS HUGEINT) * t1))
        |      AS absdiff_x
        |  FROM pt CROSS JOIN t)
        |SELECT n_first, n_second,
        |  CASE WHEN n_first = 0 OR n_second = 0 THEN NULL
        |    ELSE CAST(absdiff_x * 500
        |      // (CAST(n_first AS HUGEINT) * n_second) AS BIGINT)
        |    END AS tvd_milli
        |FROM a""".stripMargin,

    "q311_debounce" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts::TIMESTAMP) AS tsu
        |  FROM events),
        |g AS (
        |  SELECT *, LAG(tsu, 1) OVER w AS prev,
        |    CASE WHEN LAG(tsu, 1) OVER w IS NULL
        |      OR tsu - LAG(tsu, 1) OVER w > 3600000000 THEN 1 ELSE 0 END
        |      AS new_win
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id, event_type
        |    ORDER BY tsu, event_id)),
        |wi AS (
        |  SELECT *, CAST(SUM(new_win) OVER (PARTITION BY user_id, event_type
        |    ORDER BY tsu, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS win_id
        |  FROM g),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type, win_id
        |    ORDER BY tsu, event_id) AS rn_in_win
        |  FROM wi)
        |SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN rn_in_win = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  (COUNT(*) - CAST(SUM(CASE WHEN rn_in_win = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT)) * 1000 // COUNT(*) AS drop_milli
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q312_vocab_growth" ->
      s"""WITH t0 AS (
         |  SELECT source, doc_id, ${Du.tokens("text")} AS toks
         |  FROM documents),
         |tok AS (SELECT source, doc_id, unnest(toks) AS t FROM t0),
         |span AS (
         |  SELECT source, MIN(doc_id) AS lo, MAX(doc_id) AS hi
         |  FROM t0 WHERE len(toks) > 0 GROUP BY 1),
         |j AS (
         |  SELECT tok.source, t,
         |    doc_id <= lo + (hi - lo) // 4 AS q1,
         |    doc_id <= lo + (hi - lo) // 2 AS q2
         |  FROM tok JOIN span ON tok.source = span.source)
         |SELECT source,
         |  CAST(COUNT(DISTINCT CASE WHEN q1 THEN t END) AS BIGINT)
         |    AS v_quarter,
         |  CAST(COUNT(DISTINCT CASE WHEN q2 THEN t END) AS BIGINT) AS v_half,
         |  CAST(COUNT(DISTINCT t) AS BIGINT) AS v_full,
         |  CAST(SUM(CASE WHEN q1 THEN 1 ELSE 0 END) AS BIGINT) AS n_quarter,
         |  CAST(SUM(CASE WHEN q2 THEN 1 ELSE 0 END) AS BIGINT) AS n_half,
         |  COUNT(*) AS n_full
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "q313_norm_auc" ->
      s"""WITH v AS (
         |  SELECT CAST(floor((${Du.norm2("embedding")}) *
         |    CAST(1000000 AS DOUBLE)) AS BIGINT) AS v,
         |    CASE WHEN label = 1 THEN 1 ELSE 0 END AS isa
         |  FROM embeddings WHERE label IN (0, 1)),
         |pv AS (
         |  SELECT v, CAST(SUM(isa) AS BIGINT) AS na_v,
         |    CAST(SUM(1 - isa) AS BIGINT) AS nb_v
         |  FROM v GROUP BY 1),
         |c AS (
         |  SELECT *, CAST(SUM(nb_v) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cumb
         |  FROM pv),
         |a AS (
         |  SELECT CAST(SUM(na_v) AS BIGINT) AS n_pos,
         |    CAST(SUM(nb_v) AS BIGINT) AS n_neg,
         |    CAST(SUM(na_v * (2 * (cumb - nb_v) + nb_v)) AS BIGINT) AS u2
         |  FROM c)
         |SELECT n_pos, n_neg, u2,
         |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
         |    ELSE CAST(CAST(u2 AS HUGEINT) * 500
         |      // (CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT) END AS auc_milli
         |FROM a""".stripMargin,

    "q314_discount_bands" ->
      """SELECT CAST(CAST(l_discount AS DECIMAL(5,2)) * 100 AS BIGINT)
        |    AS disc_c,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |    AS BIGINT)) AS BIGINT) AS rev_c,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) * 1000 // COUNT(*)
        |    AS avg_qty_milli
        |FROM lineitem
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q315_sentence_stats" ->
      s"""WITH s AS (
         |  SELECT source,
         |    CAST(len(list_filter(regexp_split_to_array(text, '[.!?]'),
         |      x -> trim(x) != '')) AS BIGINT) AS n_sent,
         |    CAST(len(${Du.tokens("text")}) AS BIGINT) AS n_toks
         |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_sent) AS BIGINT) AS sent_sum,
        |  CAST(SUM(n_toks) AS BIGINT) AS tok_sum,
        |  CAST(SUM(n_sent) AS BIGINT) * 1000 // COUNT(*)
        |    AS sent_per_doc_milli,
        |  CASE WHEN CAST(SUM(n_sent) AS BIGINT) = 0 THEN NULL
        |    ELSE CAST(SUM(n_toks) AS BIGINT) * 1000
        |      // CAST(SUM(n_sent) AS BIGINT) END AS toks_per_sent_milli
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    "q316_stickiness" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |    CAST(year(ts) * 100 + month(ts) AS BIGINT) AS ym,
        |    CAST(ts AS DATE) AS day
        |  FROM events),
        |dau AS (
        |  SELECT ym, COUNT(*) AS n_days, CAST(SUM(dau) AS BIGINT) AS dau_sum
        |  FROM (SELECT ym, day, COUNT(*) AS dau FROM ud GROUP BY 1, 2)
        |  GROUP BY 1),
        |mau AS (
        |  SELECT ym, COUNT(*) AS mau
        |  FROM (SELECT DISTINCT ym, user_id FROM ud) GROUP BY 1)
        |SELECT dau.ym, n_days, dau_sum, mau,
        |  dau_sum * 1000 // (n_days * mau) AS stickiness_milli
        |FROM dau JOIN mau ON dau.ym = mau.ym
        |ORDER BY 1""".stripMargin,

    "q317_revenue_waterfall" ->
      """WITH li AS (
        |  SELECT
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS ep_c,
        |    CAST(CAST(l_discount AS DECIMAL(5,2)) * 100 AS BIGINT) AS d_pct,
        |    CAST(CAST(l_tax AS DECIMAL(5,2)) * 100 AS BIGINT) AS t_pct,
        |    l_returnflag = 'R' AS ret
        |  FROM lineitem),
        |a AS (
        |  SELECT
        |    CAST(SUM(ep_c * 10000) AS BIGINT) AS gross_cpp,
        |    CAST(SUM(ep_c * d_pct * 100) AS BIGINT) AS disc_loss_cpp,
        |    CAST(SUM(ep_c * (100 - d_pct) * t_pct) AS BIGINT) AS tax_add_cpp,
        |    CAST(SUM(CASE WHEN ret THEN ep_c * (100 - d_pct) * (100 + t_pct)
        |      ELSE 0 END) AS BIGINT) AS returns_loss_cpp,
        |    CAST(SUM(CASE WHEN ret THEN 0
        |      ELSE ep_c * (100 - d_pct) * (100 + t_pct) END) AS BIGINT)
        |      AS net_cpp
        |  FROM li)
        |SELECT gross_cpp, disc_loss_cpp, tax_add_cpp, returns_loss_cpp,
        |  net_cpp,
        |  net_cpp = gross_cpp - disc_loss_cpp + tax_add_cpp - returns_loss_cpp
        |    AS identity_ok
        |FROM a""".stripMargin,

    "q295_markov_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts::TIMESTAMP) AS tsu
        |  FROM events),
        |p AS (
        |  SELECT event_type AS to_type,
        |    LAG(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY tsu, event_id) AS from_type
        |  FROM e),
        |f AS (SELECT from_type, COUNT(*) AS n_from FROM p
        |      WHERE from_type IS NOT NULL GROUP BY 1)
        |SELECT p.from_type, to_type, COUNT(*) AS n_trans, n_from,
        |  COUNT(*) * 1000 // n_from AS p_milli
        |FROM p JOIN f ON p.from_type = f.from_type
        |GROUP BY 1, 2, 4
        |ORDER BY 1, 2""".stripMargin)
}
