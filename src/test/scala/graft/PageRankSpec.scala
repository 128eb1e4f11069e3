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

  test("zero iterations returns the uniform prior; empty graph is empty") {
    val r = ranks(Seq(("a", "b")), 0)
    assert(r == Map("a" -> 500000000000L, "b" -> 500000000000L))
    val empty = PageRank.run(Seq.empty[(String, String)].toDF("src", "dst"))
    assert(empty.count() == 0)
  }
}
