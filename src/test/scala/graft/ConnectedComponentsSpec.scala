package graft

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    ConnectedComponents(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("chain, pair and triangle resolve to min-id components") {
    val got = comps(Seq(
      1L -> 2L, 2L -> 3L, 3L -> 4L, // chain of 4
      10L -> 11L,                   // pair
      20L -> 21L, 21L -> 22L, 20L -> 22L)) // triangle
    assert(got == Map(
      1L -> (1L, 4L), 2L -> (1L, 4L), 3L -> (1L, 4L), 4L -> (1L, 4L),
      10L -> (10L, 2L), 11L -> (10L, 2L),
      20L -> (20L, 3L), 21L -> (20L, 3L), 22L -> (20L, 3L)))
  }

  test("long chain needs multiple propagation rounds and still converges") {
    val n = 9L
    val got = comps((1L until n).map(i => i -> (i + 1)))
    assert(got.size == n)
    assert(got.values.forall { case (comp, size) => comp == 1L && size == n })
  }

  test("self-loops and duplicate/reversed edges are harmless") {
    val got = comps(Seq(5L -> 5L, 1L -> 2L, 2L -> 1L, 1L -> 2L))
    assert(got == Map(1L -> (1L, 2L), 2L -> (1L, 2L)))
  }

  test("empty edge list yields an empty result") {
    val got = comps(Seq.empty)
    assert(got.isEmpty)
  }

  test("string vertex ids converge on a multi-round chain") {
    // diameter-4 chain: >1 propagation round, so the convergence probe
    // itself is exercised — must be structural, not a numeric label sum
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e", "x" -> "y")
      .toDF("src", "dst")
    val got = ConnectedComponents(edges).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == Map(
      "a" -> ("a", 5L), "b" -> ("a", 5L), "c" -> ("a", 5L),
      "d" -> ("a", 5L), "e" -> ("a", 5L),
      "x" -> ("x", 2L), "y" -> ("x", 2L)))
  }

  private def lssComps(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    ConnectedComponents.largeSmallStar(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("large/small-star matches min-label propagation on random graphs") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val edges = (1 to 120).map(_ =>
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
      assert(lssComps(edges) == comps(edges), s"trial $trial: $edges")
    }
  }

  test("large/small-star collapses a deep chain in logarithmic rounds") {
    // a 64-node path: min-label propagation needs ~diameter rounds;
    // the contraction's 60-round `require` would trip long before a
    // linear-round implementation finished a much deeper graph — here
    // it must converge AND produce the single correct component
    val n = 64L
    val got = lssComps((1L until n).map(i => i -> (i + 1)))
    assert(got.size == n)
    assert(got.values.forall { case (comp, size) => comp == 1L && size == n })
  }

  test("large/small-star handles stars, triangles and singleton pairs") {
    val got = lssComps(Seq(
      1L -> 2L, 2L -> 3L, 3L -> 4L,
      10L -> 11L,
      20L -> 21L, 21L -> 22L, 20L -> 22L))
    assert(got == Map(
      1L -> (1L, 4L), 2L -> (1L, 4L), 3L -> (1L, 4L), 4L -> (1L, 4L),
      10L -> (10L, 2L), 11L -> (10L, 2L),
      20L -> (20L, 3L), 21L -> (20L, 3L), 22L -> (20L, 3L)))
  }
}
