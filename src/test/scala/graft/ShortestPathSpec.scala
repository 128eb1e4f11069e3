package graft

import org.apache.spark.sql.functions._
import graft.operators.ShortestPath

/** Contract tests for bounded Bellman-Ford: hand-built graphs with
  * known answers, plus a random-graph law against driver-side
  * path-enumeration Dijkstra-style relaxation — an INDEPENDENT
  * formulation (scala arrays, no SQL), so a shared-bug with the
  * level-synchronous DataFrame loop is implausible.
  */
class ShortestPathSpec extends SparkSpecBase {

  import spark.implicits._

  private def edgesOf(tris: (Long, Long, Long)*) = {
    val fwd = tris.toDF("src", "dst", "w")
    fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst"), col("w")))
  }

  test("line graph: weights accumulate; rounds bound the hop count") {
    val e = edgesOf((1L, 2L, 5L), (2L, 3L, 1L), (3L, 4L, 2L))
    val got = ShortestPath.boundedSssp(e, Seq(1L), rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 5L, 3L -> 6L))
  }

  test("a longer path with smaller total weight wins within the round budget") {
    // 1→4 direct costs 10; 1→2→3→4 costs 3 but needs 3 hops
    val e = edgesOf((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    val two = ShortestPath.boundedSssp(e, Seq(1L), rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(two(4L) == 10L)
    val three = ShortestPath.boundedSssp(e, Seq(1L), rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(three(4L) == 3L)
  }

  test("multi-source takes the min over seeds; zero-weight edges fine") {
    val e = edgesOf((1L, 2L, 0L), (2L, 3L, 4L), (9L, 3L, 1L))
    val got = ShortestPath.boundedSssp(e, Seq(1L, 9L), rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 9L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("random graphs match driver-side bounded relaxation") {
    val rnd = new scala.util.Random(53)
    for (trial <- 1 to 3) {
      val n = 30
      val tris = (1 to 120).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, rnd.nextInt(9).toLong)
      }.filter(t => t._1 != t._2)
      val rounds = 1 + rnd.nextInt(4)
      // driver-side truth: dist[r][v] = min over <= r-edge paths
      var d = Map(0L -> 0L)
      for (_ <- 1 to rounds) {
        val relaxed = tris.flatMap { case (s0, t0, w) =>
          Seq((s0, t0, w), (t0, s0, w))
        }.flatMap { case (s0, t0, w) => d.get(s0).map(ds => t0 -> (ds + w)) }
        d = (d.toSeq ++ relaxed).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).min }
      }
      val got = ShortestPath.boundedSssp(
          tris.toDF("src", "dst", "w")
            .unionAll(tris.toDF("dst", "src", "w").select("src", "dst", "w")),
          Seq(0L), rounds)
        .as[(Long, Long)].collect().toMap
      assert(got == d, s"trial $trial rounds=$rounds: got=$got exp=$d")
    }
  }
}
