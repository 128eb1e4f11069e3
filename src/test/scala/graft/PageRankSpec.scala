package graft

import graft.operators.PageRank

/** Scaled-integer PageRank: hand-computed recurrences plus the
  * determinism property the integer formulation exists for.
  */
class PageRankSpec extends SparkSpecBase {

  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int) =
    PageRank.run(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("symmetric 2-cycle is the uniform fixed point") {
    // a↔b: every round each node forwards its whole rank to the other;
    // base + 0.85·(Scale/2) = Scale/2 exactly at this scale
    val r = ranks(Seq(("a", "b"), ("b", "a")), 3)
    assert(r == Map("a" -> 500000000000L, "b" -> 500000000000L))
  }

  test("star graph after one round matches the hand recurrence") {
    // l1→c, l2→c, c→l1, c→l2; n=3, init 333333333333 each,
    // base = (333333333333*15)//100 = 49999999999
    // c: base + (85*(2*333333333333))//100    = 616666666665
    // leaf: base + (85*(333333333333//2))//100 = 191666666665
    val r = ranks(Seq(("l1", "c"), ("l2", "c"), ("c", "l1"), ("c", "l2")), 1)
    assert(r("c") == 616666666665L)
    assert(r("l1") == 191666666665L && r("l2") == 191666666665L)
  }

  test("duplicate edges count once; total mass is conserved up to floor loss") {
    val edges = Seq(("a", "b"), ("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"))
    val r = ranks(edges, 4)
    val total = r.values.sum
    // every node loses < den micro-units per round to floor division
    assert(total <= PageRank.Scale && total > PageRank.Scale - 3 * 4 * 100)
    val dedup = ranks(edges.distinct, 4)
    assert(r == dedup)
  }

  test("result is identical across input partitionings") {
    val edges = (1 to 200).map(i => (s"n${i % 20}", s"n${(i * 7) % 20}"))
    val df1 = edges.toDF("src", "dst").repartition(1)
    val df17 = edges.toDF("src", "dst").repartition(17)
    val a = PageRank.run(df1, 3).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = PageRank.run(df17, 3).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("random digraphs match an exact in-memory reference (dangling nodes included)") {
    // the oracle graph (symmetric bipartite) has no dangling nodes and
    // no self-referential quirks — this law walks random shapes with
    // both, against a naive sequential implementation of the SAME
    // integer recurrence
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 10 + rnd.nextInt(30)
      val edges = Seq.fill(40 + rnd.nextInt(80))(
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
        .filter { case (a, b) => a != b }
      val iters = 1 + rnd.nextInt(4)
      val expected = naivePageRank(edges, iters)
      val got = ranks(edges, iters)
      assert(got == expected, s"trial $trial (n=$n iters=$iters)")
    }
  }

  /** Sequential exact-Long reference of PageRank's recurrence. */
  private def naivePageRank(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val outdeg = e.groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
    val base = ((PageRank.Scale / n) * 15) / 100
    var rank = nodes.map(_ -> PageRank.Scale / n).toMap
    for (_ <- 1 to iters) {
      val inflow = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((s, d) <- e) inflow(d) += rank(s) / outdeg(s)
      rank = nodes.map(nd => nd -> (base + (85L * inflow(nd)) / 100)).toMap
    }
    rank
  }

  test("zero iterations returns the uniform prior; empty graph is empty") {
    val r = ranks(Seq(("a", "b")), 0)
    assert(r == Map("a" -> 500000000000L, "b" -> 500000000000L))
    val empty = PageRank.run(Seq.empty[(String, String)].toDF("src", "dst"))
    assert(empty.count() == 0)
  }

  test("personalized with seeds = all nodes IS uniform PageRank") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
      ("d", "a"), ("c", "d")).toDF("src", "dst")
    val allNodes = Seq("a", "b", "c", "d").toDF("node")
    val uni = PageRank.run(edges, 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val per = PageRank.personalized(edges, allNodes, 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni == per)
  }

  test("personalized: mass stays in the seed component; off-graph and dup seeds ignored") {
    // two disconnected 2-cycles; seeds in the first one only
    val edges = Seq(("a", "b"), ("b", "a"), ("x", "y"), ("y", "x"))
      .toDF("src", "dst")
    val seeds = Seq("a", "a", "zzz-not-a-node").toDF("node")
    val r = PageRank.personalized(edges, seeds, 3).collect()
      .map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(r("x") == 0L && r("y") == 0L)
    // single seed: init = Scale; a↔b alternates full forwarding —
    // after 3 rounds: a = base + 0.85·(round-2 b), all mass in {a,b}
    assert(r("a") > 0L && r("b") > 0L)
    assert(r.values.sum <= PageRank.Scale)
    assert(r.values.sum > PageRank.Scale - 2 * 3 * 100)
  }
}
