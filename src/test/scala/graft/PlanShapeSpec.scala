package graft

/** Physical-plan shape assertions for the properties the 100 TB design
  * depends on (docs/SCALE.md): predicate pushdown and column pruning
  * reaching the parquet scan, dimension joins broadcasting, map-side
  * partial aggregation, and whole-stage codegen on the hot path.
  * Asserted on the REAL headline queries, not toy plans, so a
  * formulation regression (e.g. a join silently turning into a
  * shuffle) fails the suite, not just the benchmark.
  */
class PlanShapeSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("filter + projection push down to the parquet scan (q02)") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(!p.contains("PushedFilters: []"), p)
    assert(p.contains("ReadSchema"), p)
  }

  test("dataset-API SQL-string filter pushes down too (q61)") {
    val p = plan("q61_dataset_api")
    assert(p.contains("PushedFilters: ["), p)
    assert(!p.contains("PushedFilters: []"), p)
  }

  test("dimension joins broadcast instead of shuffling the fact (q04)") {
    val p = plan("q04_broadcast_join_agg")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("aggregations combine map-side before the shuffle (q01)") {
    val p = plan("q01_pricing_summary")
    // partial + final pair: at least two HashAggregate operators
    assert("HashAggregate".r.findAllMatchIn(p).size >= 2, p)
  }

  test("tf-idf scoring join broadcasts the vocabulary side (q69)") {
    val p = plan("q69_tfidf_topk")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("contamination screen broadcasts the benchmark set (q72)") {
    val p = plan("q72_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("chunking is a narrow map — no aggregation or join exchange (q70)") {
    val p = plan("q70_doc_chunks")
    // only the final presentation sort may exchange; the operator itself
    // must not shuffle (no hash-partitioned exchange, no join)
    assert(!p.contains("hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("rank-filter top-n plans as a bounded-heap WindowGroupLimit (q07)") {
    // Catalyst pushes `row_number <= k` into Partial+Final
    // WindowGroupLimit: each map task keeps a k-bounded heap per key
    // BEFORE the shuffle — the reason top-n stays declarative instead
    // of a hand-built heap operator
    val df = SparkEntry.queries("q07_window_topn")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Partial") && p.contains("Final"), p)
  }

  test("bucketed tables join without a shuffle exchange") {
    // the co-located-join path for repeated fact-fact joins: bucket both
    // sides on the key at write, and the join plans with NO exchange —
    // at 100 TB this turns every recurring key join into a local zip
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    graft.sources.WritePipeline.writeBucketed(
      (1 to 1000).map(i => (i.toLong, s"o$i")).toDF("key", "ov"),
      "bkt_orders", Seq("key"), 4, Seq("key"))
    graft.sources.WritePipeline.writeBucketed(
      (1 to 3000).map(i => ((i % 1000 + 1).toLong, i.toLong)).toDF("key", "lv"),
      "bkt_lineitem", Seq("key"), 4, Seq("key"))
    val joined = spark.table("bkt_orders").join(spark.table("bkt_lineitem"), "key")
    joined.collect() // force the final (AQE-resolved) plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(joined.count() == 3000)
  }

  test("pii scrub is a narrow pruned projection — no shuffle, no join (q83)") {
    val p = plan("q83_pii_scrub")
    assert(!p.contains("hashpartitioning"), p)
    assert(!p.contains("Join"), p)
    // column pruning: only the two referenced columns reach the scan
    assert(p.contains("c_custkey") && !p.contains("c_acctbal"), p)
  }

  test("split assignment aggregates map-side, never joins (q84)") {
    val p = plan("q84_split_assign")
    assert("HashAggregate".r.findAllMatchIn(p).size >= 2, p)
    assert(!p.contains("Join"), p)
  }

  test("quality-band bounds broadcast to the corpus filter (q85)") {
    val p = plan("q85_quality_band")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("semantic dedup pairs join on the cluster key — never cartesian (q117)") {
    val p = plan("q117_semantic_dedup")
    // the pair search must be an equi-join keyed on label (bucketed by
    // cluster); an all-pairs cartesian would be the N² anti-pattern
    // the technique exists to avoid
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("pagerank rounds are equi-joins + aggregations — no cartesian (q113)") {
    val p = plan("q113_pagerank")
    assert(!p.contains("CartesianProduct"), p)
    assert("HashAggregate".r.findAllMatchIn(p).size >= 2, p) // map-side partials
  }

  test("bloom contamination probes inside the scan, then broadcasts the confirm (q121)") {
    val p = plan("q121_bloom_contamination")
    // the codegen'd bloom probe must appear as a plain Filter predicate
    // (scan side), and the exact confirm as a broadcast join — the
    // corpus gram stream is never shuffled for the screen itself
    assert(p.contains("bloom_might_contain_long"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.indexOf("bloom_might_contain_long") > p.indexOf("BroadcastHashJoin"),
      "bloom probe should sit BELOW the confirm join (printed after it):\n" + p)
  }

  test("boilerplate screen broadcasts the template set back to the corpus (q122)") {
    val p = plan("q122_boilerplate_segments")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("oov scoring broadcasts the vocabulary (q123)") {
    val p = plan("q123_oov_rate")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("nearest as-of runs both direction windows over ONE hash exchange (q124)") {
    val p = plan("q124_asof_nearest")
    // the union shuffles once on user_id; the two carries are two Sort
    // + Window passes over that one exchange. Other hash exchanges:
    // the purchase dedup aggregation. A per-direction shuffle would
    // push the count past 2.
    val hashEx = "Exchange hashpartitioning".r.findAllMatchIn(p).size
    assert(hashEx <= 2, s"expected <=2 hash exchanges (purch dedup + window), got $hashEx:\n$p")
    assert("Window".r.findAllMatchIn(p).size >= 2, p)
  }

  test("kmeans refine assigns via a broadcast of the centroid table (q125)") {
    val p = plan("q125_kmeans_refine")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("mix resampling filters against broadcast thresholds (q126)") {
    val p = plan("q126_mix_resample")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("bpe merge round aggregates map-side at both stages (q127)") {
    val p = plan("q127_bpe_merge_step")
    // word counts + pair counts, each partial+final
    assert("HashAggregate".r.findAllMatchIn(p).size >= 4, p)
    assert(!p.contains("Join"), p) // vocab-sized work, no join at all
  }

  test("label-noise screen broadcasts centroids and bounds the heap (q128)") {
    val p = plan("q128_label_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("pagerank rounds never reshuffle the edge table") {
    // eDeg is materialized once, evenly hash-partitioned on src; each
    // round may broadcast it (small sf) or probe it in place, but must
    // not add a per-round shuffle of the edges. The post-checkpoint
    // plan's only SHUFFLE exchanges are the inflow aggregation (by
    // dst), the |V|-row nodes join, and the final sort — broadcast
    // exchanges are sketch-sized and don't count
    val p = plan("q113_pagerank")
    val shuffles = "Exchange (hash|range)partitioning".r.findAllMatchIn(p).size
    assert(shuffles <= 3, s"expected <=3 shuffle exchanges, got $shuffles:\n$p")
  }

  test("tz-converted write prep is narrow — conversion never shuffles (q112 read-back agg)") {
    // the strip/localize pair is a codegen'd projection; assert on the
    // prepared frame the write consumes, not the post-write aggregate
    val prep = graft.sources.WritePipeline.prepare(
      graft.core.Tables.events(spark, sf).select("event_id", "ts"),
      graft.sources.WriteConfig(tz = Some("America/New_York"), removeTz = true,
        datepartsFrom = Some("ts"), dateparts = Seq("year")))
    val p = prep.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(p.contains("convert_timezone") || p.contains("converttimezone"), p)
  }

  test("knn recall joins two bounded top-5 sets and spans [0,1] (q86)") {
    val rows = SparkEntry.queries("q86_knn_recall")(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val nHit = r.getAs[Long]("n_hit"); val rec = r.getAs[Double]("recall")
      assert(nHit >= 0 && nHit <= 5)
      assert(math.abs(rec - nHit / 5.0) < 1e-15)
    }
  }

  test("novelty: one window pass on the gram key, then a combined rollup (q89)") {
    val p = plan("q89_novelty")
    // the first-sighting min is a Window over hashpartitioning(g)
    assert(p.contains("Window") && p.contains("hashpartitioning(g"), p)
    // and the per-doc rollup after it is a partial+final aggregate pair
    assert("HashAggregate".r.findAllMatchIn(p).size >= 2, p)
  }

  test("domain-mix quotas broadcast to the per-doc rank filter (q90)") {
    val p = plan("q90_domain_mix")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("cdc chunking shuffles once per doc then once per fingerprint (q91)") {
    val df = SparkEntry.queries("q91_cdc_chunks")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // boundary assignment is a per-doc window over hashpartitioning(doc_id)
    assert(p.contains("Window") && p.contains("hashpartitioning(doc_id"), p)
    // chunk rollup + fingerprint dedup are aggregate pairs
    assert("HashAggregate".r.findAllMatchIn(p).size >= 2, p)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_copies") >= 2)
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_copies"))
    }
  }

  test("collocation mining broadcasts the unigram counts (q94)") {
    val p = plan("q94_collocations")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("ks drift is windowed per source and bounded to [0,1] (q95)") {
    val df = SparkEntry.queries("q95_ks_drift")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Window") && p.contains("hashpartitioning(s"), p)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ks = r.getAs[Double]("ks")
      assert(ks >= 0.0 && ks <= 1.0, s"ks out of range: $ks")
    }
  }

  test("triangle counting is equi-joins only — no nested-loop blowup (q137)") {
    val p = plan("q137_triangles")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("span dedup shuffles 8-byte fingerprints, not span strings (q144)") {
    val p = plan("q144_span_dedup")
    // every exchange must partition on doc_id or the hash key — a
    // `span` string reaching an exchange would mean the 16-gram text
    // itself crosses the wire
    val exchanges = "hashpartitioning\\(([a-zA-Z0-9_#]+)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchanges.nonEmpty, p)
    assert(exchanges.forall(c => c.startsWith("hk") || c.startsWith("doc_id")),
      s"unexpected exchange keys: $exchanges")
  }

  test("posting lists df-filter before collecting postings (q139)") {
    // the collect_list agg must sit above the df-band semi/inner join,
    // so head terms are filtered before any list state builds
    val df = SparkEntry.queries("q139_posting_lists")(spark, sf)
    val p = df.queryExecution.optimizedPlan.toString
    val collectAt = p.indexOf("collect_list")
    val joinAt = p.indexOf("Join")
    assert(collectAt >= 0 && joinAt >= 0 && collectAt < joinAt,
      s"collect_list at $collectAt vs join at $joinAt:\n$p")
  }

  test("the hot path stays inside whole-stage codegen (q01)") {
    // AQE reveals codegen spans only in the final (executed) plan
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // codegen'd operators carry the `*(stageId)` prefix in the final plan
    assert(p.contains("WholeStageCodegen") || "\\*\\(\\d+\\)".r.findFirstIn(p).isDefined, p)
  }

  test("attribution rides the as-of union — no per-purchase probe join (q154)") {
    val p = plan("q154_attribution")
    // the match is the union + last-non-null window carry; a
    // CartesianProduct or nested-loop probe would be the per-row
    // anti-pattern AsofJoin exists to avoid
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
  }

  test("sparse cosine drops hot terms before the posting self-join (q157)") {
    val df = SparkEntry.queries("q157_sparse_cosine")(spark, sf)
    val p = df.queryExecution.optimizedPlan.toString
    // the df-cap semi join must gate the pair join's inputs — without
    // it one stop-term's posting list alone drives O(n²) pairs
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("Cartesian"), p)
  }

  test("PQ codebook and ADC table joins broadcast — vectors never shuffle for them (q158/q164)") {
    val p1 = plan("q158_pq_encode")
    assert(p1.contains("BroadcastHashJoin"), p1)
    val p2 = plan("q164_pq_adc")
    assert(p2.contains("BroadcastHashJoin"), p2)
    assert(!p2.contains("CartesianProduct"), p2)
  }

  test("IVF-PQ search probes + ADC table broadcast; top-10 is a bounded heap (q176)") {
    val p = plan("q176_ivfpq_search")
    // the probe list (40 rows) and the per-query distance table
    // (K·M·|q| rows) both broadcast — the corpus-sized codes frame
    // never shuffles for them — and the per-query top-10 is a
    // WindowGroupLimit heap, not a global sort
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("weighted sampling is hash + bounded window — never a join (q159)") {
    val p = plan("q159_weighted_sample")
    assert(!p.contains("Join"), p)
    // per-source top-k plans as the bounded WindowGroupLimit heap
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("row-scale global ranks are two-phase distributed — no single-partition window") {
    // the seven former `Window.orderBy` (no partitionBy) sites now
    // route through GlobalOrder: every Window in these plans must
    // carry a partition spec, or the plan serializes the whole input
    // through one task at scale
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (q <- Seq("q85_quality_band", "q100_corpus_prep",
        "q104_peak_concurrency", "q131_approx_quantile_bound", "q166_equidepth",
        "q87_token_rank", "q179_vocab_coverage", "q208_pareto_cut",
        "q210_weighted_median", "q216_skyline")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val bad = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$q still contains a global (single-partition) window:\n${bad.mkString("\n")}")
    }
  }

  test("row-scale top-k windows keep the WindowGroupLimit pushdown (q96/q157)") {
    // the two remaining bare `Window.orderBy` sites at row scale are
    // safe ONLY because Catalyst pushes `row_number <= k` into a
    // per-partition bounded heap (WindowGroupLimit) below the
    // single-partition window, so at most k·partitions rows ever reach
    // the one task. That rewrite is shape-sensitive — e.g. referencing
    // the rank column a second time defeats it silently. This pin
    // makes such an edit a test failure instead of a 100 TB incident.
    // Either rendering is the safe one: WindowGroupLimit (bounded heap
    // below the window) or TakeOrderedAndProject (per-partition top-k
    // + driver merge of k rows) — both cap what reaches the single
    // partition at k·partitions rows
    for (q <- Seq("q96_bm25", "q157_sparse_cosine")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("WindowGroupLimit") || p.contains("TakeOrderedAndProject"),
        s"$q lost the rank-limit pushdown — full-volume single-partition window:\n$p")
    }
  }

  test("bottom-k sketch/sample sites keep the WindowGroupLimit heap (q324/q325)") {
    // both queries rank row-scale frames (distinct user hashes; the
    // full documents table) and keep only rank ≤ k — safe because
    // BottomK's rank column never escapes, so Catalyst bounds each
    // map task to a k-heap per group. Pin it per call site.
    for (q <- Seq("q324_kmv_distinct", "q325_bottomk_sample")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("WindowGroupLimit"),
        s"$q lost the rank-limit pushdown:\n$p")
    }
  }

  test("bucketed fact-to-fact join reads co-located buckets — no join-side shuffle (q198)") {
    val df = SparkEntry.queries("q198_bucketed_join")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the query's own require already pins the join subplan; here the
    // FULL plan must contain the SMJ and exactly one hash exchange —
    // the aggregation's, never the join inputs'
    assert(p.contains("SortMergeJoin"), p)
    assert("Exchange hashpartitioning".r.findAllMatchIn(p).size <= 1, p)
  }

  test("blocked fuzzy join is an equi-join on the blocking key — no cartesian (q200)") {
    val p = plan("q200_fuzzy_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Join"), p)
  }

  test("SCD2 build rides ONE hash exchange — windows and agg share the user partition (q199)") {
    val p = plan("q199_scd2_intervals")
    // lag window, island cumsum, per-island agg, and the lead window
    // all cluster on user_id; only the first exchange is real (the
    // final presentation orderBy is a range exchange, not hash)
    assert("Exchange hashpartitioning".r.findAllMatchIn(p).size <= 1, p)
  }

  test("spatial radius join is an equi-join on grid cells — no cartesian (q221)") {
    val p = plan("q221_spatial_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("exact set-similarity join is equi-join on prefix elements — no cartesian (q214)") {
    val p = plan("q214_setsim_prefix")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the candidate generator is a hash/sort-merge equi-join
    assert(p.contains("Join"), p)
  }

  test("gram matrix cells come from a broadcast index table — no exchange before the cell aggregate (q463)") {
    // the i≤j cell list is data-independent, so it broadcasts; each
    // row's cells are codegen'd element_at probes, and the only hash
    // exchange in the whole plan is the 2080-cell aggregate's own
    // partial→final boundary. The round-7 formulation self-joined the
    // exploded frame on vec_id — a hash exchange of n·d rows that
    // this pin forbids.
    // pre-execution plan: the post-collect AQE string renders Final
    // AND Initial plans, double-counting the one real exchange
    val p = plan("q463_embed_gram")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert("Exchange hashpartitioning".r.findAllMatchIn(p).size <= 1, p)
    assert("HashAggregate".r.findAllMatchIn(p).size >= 2, p) // partial+final
  }

  test("rolling WAU explodes contributions — no range self-join (q161)") {
    val p = plan("q161_rolling_wau")
    // the contribute-forward rewrite: a Generate (explode) feeds the
    // distinct count; the only joins are the day-keyed merges and the
    // broadcast scalar bound
    assert(p.contains("Generate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
