package graft

import org.apache.spark.sql.functions._

/** Laws for the round-8 continuation queries' determinism machinery
  * (Analytics7 / TextOps additions), run on sf0.001.
  */
class Analytics7Spec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("q491 Kaplan-Meier: surv_micro non-increasing in t and equal " +
    "to a BigInt recomputation of the floored product-limit") {
    val rows = SparkEntry.queries("q491_kaplan_meier")(spark, sfDir)
      .select("t_days", "n_risk", "d", "surv_micro")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // monotone non-increasing survival
    rows.sliding(2).foreach {
      case Array((ta, _, _, sa), (tb, _, _, sb)) =>
        assert(sb <= sa, s"S must not increase: t=$ta s=$sa -> t=$tb s=$sb")
      case _ =>
    }
    // independent recomputation: same fold in BigInt, from the
    // published (n_risk, d) lanes, in time order
    var s = BigInt(1000000)
    rows.foreach { case (t, n, d, surv) =>
      val step = (BigInt(n - d) * 1000000) / BigInt(n)
      s = (s * step) / 1000000
      assert(s == BigInt(surv),
        s"floored product-limit mismatch at t=$t: law=$s query=$surv")
    }
  }

  test("q490 permutation patterns: codes are valid permutations and " +
    "counts cover all triples") {
    val df = SparkEntry.queries("q490_perm_patterns")(spark, sfDir)
    val rows = df.select("pattern", "cnt", "n_triples").collect()
    val valid = Set(123L, 132L, 213L, 231L, 312L, 321L)
    rows.foreach { r =>
      assert(valid(r.getLong(0)), s"invalid ordinal code ${r.getLong(0)}")
    }
    val total = rows.map(_.getLong(1)).sum
    assert(rows.forall(_.getLong(2) == total),
      "n_triples must equal the sum of pattern counts")
  }

  test("q501 Wilcoxon: doubled-rank identity W+ + W- = n(n+1)") {
    val r = SparkEntry.queries("q501_wilcoxon_signed")(spark, sfDir)
      .select("n_pairs", "w_plus_x2", "w_minus_x2").collect()
    assert(r.length == 1)
    val n = r(0).getLong(0)
    assert(r(0).getLong(1) + r(0).getLong(2) == n * (n + 1),
      "sum of doubled signed ranks must be n(n+1)")
  }

  test("q502 percolation: components monotone with threshold, " +
    "bounded by nodes, gain consistent") {
    val rows = SparkEntry.queries("q502_percolation")(spark, sfDir)
      .select("threshold_milli", "n_nodes", "n_edges", "n_components",
        "largest_comp")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)
    assert(rows.length == 3)
    rows.foreach { case (t, nodes, edges, comps, largest) =>
      assert(comps >= 1 || nodes == 0)
      assert(comps <= nodes, s"t=$t: more components than nodes")
      assert(largest <= nodes)
      assert(largest >= (if (nodes > 0) 1L else 0L))
      assert(edges >= 0)
    }
    // raising the threshold can only split components (or keep them)
    rows.sliding(2).foreach {
      case Array((_, _, _, cA, _), (_, _, _, cB, _)) => assert(cB >= cA)
      case _ =>
    }
  }

  test("q492 SPRT: decision boundary consistent with the llr lane") {
    val r = SparkEntry.queries("q492_sprt")(spark, sfDir)
      .select("llr_micronat", "decision").collect()
    assert(r.length == 1)
    val (llr, dec) = (r(0).getLong(0), r(0).getString(1))
    val expect =
      if (llr >= 2944439L) "accept_h1"
      else if (llr <= -2944439L) "accept_h0"
      else "continue"
    assert(dec == expect)
  }
}
