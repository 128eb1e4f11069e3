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
}
