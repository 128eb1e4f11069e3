package graft

import graft.operators.Triangles

/** Degree-oriented triangle counting: exact per-node counts on known
  * graphs, invariance to direction/duplicates/self-loops.
  */
class TrianglesSpec extends SparkSpecBase {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle, chain, and square") {
    // triangle 1-2-3 plus a pendant 4 and a chain 5-6-7
    assert(run(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (5L, 6L), (6L, 7L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // square has no triangles
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))).isEmpty)
  }

  test("K4: every node is in C(3,2) = 3 triangles") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(run(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("direction, duplicate edges, and self-loops are normalized away") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L),
      (2L, 2L), (3L, 3L))
    assert(run(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("two triangles sharing an edge") {
    // 1-2-3 and 2-3-4 share edge 2-3
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(run(g) == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }
}
