package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Global plan-hygiene audit: NO query in the suite may plan an
  * unbounded Cartesian product. Scalar cross joins (1-row aggregate
  * frames, broadcast eval samples) lower to
  * BroadcastNestedLoopJoin — bounded by the broadcast threshold and
  * fine; CartesianProductExec means BOTH sides were too big to
  * broadcast and the pair blowup would be quadratic at scale. Pinning
  * this for every query (not just the individually-audited ones in
  * PlanShapeSpec) turns the per-round manual crossJoin sweep into a
  * regression gate for STRUCTURAL mistakes: dropping a broadcast()
  * hint from a frame Catalyst estimates big, or introducing a
  * non-equi join between two large relations. What it cannot catch
  * at sf0.001 is size DRIFT — a "scalar" frame that grows past the
  * broadcast threshold only at production scale still lowers to
  * BroadcastNestedLoopJoin here (Catalyst's no-CBO estimates can't
  * see filter-bounded smallness, so shrinking the threshold would
  * false-fail legitimately bounded sides like q47's 20-row probe
  * set); per-operator capacity math in docs/SCALE.md carries that
  * burden.
  *
  * Lifecycle and streaming queries are excluded — their builders run
  * physical side effects (dataset writes, micro-batch drains), not
  * lazy plans; their plan shapes are pinned by their own round-trip
  * gates and specs.
  */
class PlanAuditSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  private val effectful: Set[String] =
    graft.queries.Lifecycle.queries.keySet ++
      graft.queries.StreamOps.queries.keySet

  /** Queries ALLOWED to plan a single-partition (no partitionSpec)
    * window, each for one of two audited reasons — anything else that
    * plans one fails the sweep, so a new unbounded offender can't
    * hide in the WindowExec warning noise of the bench tail:
    *
    *   - rank-≤-k windows where Catalyst's WindowGroupLimit /
    *     TakeOrderedAndProject pushdown bounds what reaches the one
    *     task to k·partitions rows (pinned per site in PlanShapeSpec);
    *   - windows over frames that are CARDINALITY-BOUNDED by
    *     construction (calendar-day grain ~2.4k rows at any scale,
    *     vocab-/top-k-sized frames, scalar summaries) — the row count
    *     can't grow with the data.
    */
  private val bareWindowAllowed: Set[String] = Set(
    // rank-≤-k sites bounded by Catalyst's WindowGroupLimit /
    // TakeOrderedAndProject pushdown (the pushdown itself is pinned
    // per site in PlanShapeSpec — losing it fails THAT spec)
    "q96_bm25", "q157_sparse_cosine",
    // calendar-day-grain frames (~2.4k rows at ANY scale factor: the
    // heavy lifting is the map-side orders→day combine; the window
    // input cannot grow with the data)
    "q140_mixture_epochs", "q227_monthly_rev", "q258_volume_anomaly",
    "q270_moving_avg", "q298_bollinger", "q320_haar_energy",
    "q329_sax_motifs", "q343_nelson_aalen", "q344_rescaled_range",
    "q352_hodges_lehmann", "q354_mann_kendall", "q364_runs_test",
    "q365_pettitt", "q367_kruskal_wallis", "q368_durbin_watson",
    "q375_logrank", "q378_weekday_decompose", "q381_poisson_bootstrap",
    "q394_theil_sen", "q400_hampel_filter", "q410_isotonic",
    "q439_hodges_lehmann", "q440_runs_updown",
    // frames bounded by construction to a fixed or key-space-bounded
    // cardinality: strata/quota/bucket tables (20-25 rows), decile and
    // rejection fronts (10-25 rows), vocab- or group-count-sized
    // summaries, BottomK/top-k outputs (k rows by contract)
    "q90_domain_mix", "q204_filter_funnel", "q218_cum_distinct",
    "q231_benford", "q294_stratified_alloc", "q379_t_closeness",
    "q380_zipf_check", "q396_assoc_rules", "q402_apriori_triples",
    "q414_large_volume_orders", "q420_decile_gains", "q422_bigram_lm",
    "q424_heaps_law", "q428_eb_shrinkage", "q430_rrf_fusion",
    "q433_bh_fdr",
    // q473: rank assignment over the ALREADY-LIMITED top-10 frame
    // (TakeOrderedAndProject bounds what reaches the window to 10 rows)
    "q473_rbo",
    // q486: cumulative count over the calendar-day frame (q227 class)
    "q486_ks_uniform",
    // q517: every window runs over the weekday×month matrix or its
    // row/column margins — ≤84 cells at ANY scale (calendar-bounded by
    // construction); the heavy pass is the map-side orders→cell combine
    "q517_median_polish",
    // q526: cumulative windows over the latency-day-grain step table
    // (≤~2.2k rows at any scale — the q491/q343 class); the heavy pass
    // is the map-side lineitem→step combine
    "q526_greenwood",
    // q490: consecutive-day lead triples over the calendar-day frame
    // (q227 class); q491: cumulative at-risk count over the
    // latency-day-grain step table (≤ ~200 rows at any scale — the
    // q343 Nelson–Aalen class)
    "q490_perm_patterns", "q491_kaplan_meier",
    // q496: lead templates over the calendar-day frame (q227 class)
    "q496_sample_entropy",
    // q501: signed-rank windows over the paired-calendar-day frame
    // (≤366 rows at any scale — q364/q440 class)
    "q501_wilcoxon_signed")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
       if !effectful(name)) {
    test(s"$name plans no unbounded cartesian product or stray global window") {
      // plain collect, not collectWithSubqueries: on the pre-AQE
      // sparkPlan, subquery expressions still hold UNPLANNED logical
      // plans (the cast throws), and a scalar subquery is 1-row by
      // contract anyway
      val qe = fn(spark, sfDir).queryExecution
      val carts = qe.sparkPlan.collect {
        case c: CartesianProductExec => c
      }
      assert(carts.isEmpty,
        s"$name plans ${carts.size} CartesianProductExec node(s) — " +
          "either broadcast the small side or bound the pair space")
      val bare = qe.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }
      assert(bare.isEmpty || bareWindowAllowed(name),
        s"$name plans ${bare.size} single-partition window(s) and is not " +
          "on the audited allowlist — route row-scale ranks through " +
          "GlobalOrder, or add the query here with its boundedness argument")
    }
  }
}
