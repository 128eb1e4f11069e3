package graft

import org.apache.spark.sql.functions._

import graft.queries.Analytics8

/** Laws for the round-9 query wave's determinism machinery
  * (Analytics8), run on sf0.001 plus crafted frames for the
  * expression-level folds.
  */
class Analytics8Spec extends SparkSpecBase {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val Sp = graft.functions.PortableSql.Spark

  test("q512 LZ78 fold: known factor counts on crafted token streams") {
    // n identical tokens parse into phrases a, aa, aaa, ... — k
    // phrases cover k(k+1)/2 tokens, so 10 tokens -> 4 factors;
    // n DISTINCT tokens -> n factors (no phrase ever repeats)
    val df = Seq(
      ("same10", Seq.fill(10)("a")),
      ("distinct6", Seq("a", "b", "c", "d", "e", "f")),
      ("period2", Seq("a", "b", "a", "b", "a", "b", "a", "b"))
    ).toDF("tag", "tp")
      .withColumn("st", expr(Analytics8.lz78Fold(Sp, "tp")))
      .withColumn("factors", expr(
        "CAST(size(st) - 1 + CASE WHEN element_at(st, 1) = '' " +
          "THEN 0 ELSE 1 END AS BIGINT)"))
    val got = df.select("tag", "factors").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("same10") == 4L, s"10 identical tokens: ${got("same10")}")
    assert(got("distinct6") == 6L, s"6 distinct tokens: ${got("distinct6")}")
    // a b | a b(cand known: 'a'->known? dict after (a,b): a, then b?
    // trace: a->new(a); b->new? cand='b' not in {a} -> dict {a,b};
    // a -> cur=a (known); b -> cand='a b' new -> dict {a,b,'a b'};
    // a -> cur=a; b -> cur='a b' (known); a -> cand='a b a' new ->
    // dict 4; b -> cur=b (known, trailing) -> factors 4 + 1 = 5
    assert(got("period2") == 5L, s"period-2 stream: ${got("period2")}")
  }

  test("q514 Croston fold: hand-checked SES lanes on a 3-event series") {
    // events (day, size): (0, 10), (2, 20), (6, 40), encoded d*1e5+z
    val ev = Seq((0L, 10L), (2L, 20L), (6L, 40L))
      .map { case (d, z) => d * 100000L + z }
    val df = Seq(Tuple1(ev)).toDF("ev")
      .withColumn("st", expr(Analytics8.crostonFold(Sp, "ev")))
      .select(expr("element_at(st, 1)"), expr("element_at(st, 2)"))
    val r = df.collect()(0)
    // z: 10000 -> (9*10000 + 20000)/10 = 11000 -> (9*11000 + 40000)/10
    //  = 13900
    assert(r.getLong(0) == 13900L, s"size_hat ${r.getLong(0)}")
    // p: init gap (2-0)*1000 = 2000 -> (9*2000 + 4000)/10 = 2200
    assert(r.getLong(1) == 2200L, s"interval_hat ${r.getLong(1)}")
  }

  test("q515 Cliff's delta: pair-count identity and delta bounds") {
    val r = SparkEntry.queries("q515_cliffs_delta")(spark, sfDir).collect()(0)
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    val (gt, lt, eq) = (r.getAs[Long]("gt"), r.getAs[Long]("lt"),
      r.getAs[Long]("eq"))
    assert(gt + lt + eq == na * nb, "gt + lt + eq must equal n_a * n_b")
    val d = r.getAs[Long]("delta_micro")
    assert(d >= -1000000L && d <= 1000000L, s"delta out of [-1, 1]: $d")
  }

  test("q524 winnowing guarantee: docs sharing a 7-token run share a " +
    "fingerprint") {
    // two docs with a common 7-token run embedded at different offsets:
    // every 4-window of 4-shingles inside the run is identical, so the
    // min-selected fingerprint of that window must match
    val run = Seq("k1", "k2", "k3", "k4", "k5", "k6", "k7")
    val a = Seq("xa", "xb") ++ run ++ Seq("xc")
    val b = Seq("ya") ++ run ++ Seq("yb", "yc", "yd")
    val df = Seq(("a", a), ("b", b)).toDF("tag", "toks")
      .withColumn("hs", expr(Sp.transform(
        Sp.rangeIncl("1", "size(toks) - 3"), "i",
        Sp.hash64(s"${Sp.strJoin(Sp.slice("toks", "i", "4"), " ")}"))))
      .withColumn("fp", explode(expr(Sp.arrDistinct(Sp.transform(
        Sp.rangeIncl("1", s"${Sp.size("hs")} - 3"), "i",
        Sp.arrMin(Sp.slice("hs", "i", "4")))))))
    val fps = df.select("tag", "fp").collect()
      .groupBy(_.getString(0)).map { case (k, v) =>
        k -> v.map(_.getLong(1)).toSet }
    assert(fps("a").intersect(fps("b")).nonEmpty,
      "a shared 7-token run must yield a shared winnowing fingerprint")
  }

  test("q526 Greenwood lanes agree with q491 and are monotone") {
    val km = SparkEntry.queries("q491_kaplan_meier")(spark, sfDir)
      .select(col("t_days"), col("surv_micro").as("s491"))
    val gw = SparkEntry.queries("q526_greenwood")(spark, sfDir)
      .select("t_days", "surv_micro", "g_nano", "ci_half_micro")
    val j = gw.join(km, "t_days").collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      assert(r.getAs[Long]("surv_micro") == r.getAs[Long]("s491"),
        s"surv mismatch at t=${r.getAs[Long]("t_days")}")
      assert(r.getAs[Long]("ci_half_micro") >= 0L)
    }
    val g = j.map(r => (r.getAs[Long]("t_days"), r.getAs[Long]("g_nano")))
      .sortBy(_._1)
    g.sliding(2).foreach {
      case Array((_, a), (_, b)) => assert(b >= a, "g_nano must not decrease")
      case _ =>
    }
  }

  test("q527 RocksDB-backed stream dedup is value-identical to q134's " +
    "default-backend run (state-backend invariance)") {
    val h134 = graft.core.CanonHash.of(
      SparkEntry.queries("q134_stream_dedup")(spark, sfDir))
    val h527 = graft.core.CanonHash.of(
      SparkEntry.queries("q527_stream_dedup_rocksdb")(spark, sfDir))
    assert(h134 == h527,
      "the dedup result must not depend on the state-store backend")
  }

  test("q528 coverage lanes are consistent; q529 DiD identity; " +
    "q530 ECE bounded by the max bin gap") {
    val cov = SparkEntry.queries("q528_interval_coverage")(spark, sfDir)
      .collect()(0)
    assert(cov.getAs[Long]("n_covered") + cov.getAs[Long]("n_below") +
      cov.getAs[Long]("n_above") == cov.getAs[Long]("n_days"))
    val did = SparkEntry.queries("q529_diff_in_diff")(spark, sfDir)
      .collect()(0)
    assert(did.getAs[Long]("did_milli") ==
      (did.getAs[Long]("mean_t_post_milli") - did.getAs[Long]("mean_t_pre_milli")) -
        (did.getAs[Long]("mean_c_post_milli") - did.getAs[Long]("mean_c_pre_milli")))
    val ece = SparkEntry.queries("q530_ece")(spark, sfDir).collect()
    val maxGap = ece.map(_.getAs[Long]("gap_milli")).max
    ece.foreach(r => assert(r.getAs[Long]("ece_micro") <= maxGap * 1000,
      "ECE (a weighted mean of bin gaps) cannot exceed the max gap"))
  }

  test("q522 cluster sampling never splits a duplicate cluster; " +
    "q523 tranches partition the corpus") {
    val cs = SparkEntry.queries("q522_cluster_sample")(spark, sfDir).collect()
    cs.foreach(r => assert(r.getAs[Long]("n_split") == 0L,
      "cluster-coherent sampling must not split clusters"))
    val tr = SparkEntry.queries("q523_token_tranches")(spark, sfDir)
      .collect()
    val trs = tr.map(_.getAs[Long]("tranche")).toSet
    assert(trs.subsetOf(Set(0L, 1L, 2L, 3L)) && tr.nonEmpty)
    // every doc with >= 1 token lands in exactly one tranche (the
    // sampling gate covers the same >= 1-token universe, so its
    // per-source doc counts are the independent cross-check)
    val nDocs = tr.map(_.getAs[Long]("n_docs")).sum
    val expected = cs.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == expected, s"tranches cover $nDocs of $expected docs")
  }
}
