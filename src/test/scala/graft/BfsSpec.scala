package graft

import org.apache.spark.sql.functions._
import graft.operators.Bfs

/** Contract tests for the multi-source BFS operator on graphs whose
  * hop structure is known by construction.
  */
class BfsSpec extends SparkSpecBase {

  import spark.implicits._

  private def edgesOf(pairs: (Long, Long)*) = {
    val fwd = pairs.toDF("src", "dst")
    fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("line graph: hops equal distance, truncated at maxHops") {
    val e = edgesOf(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L)
    val got = Bfs.run(e, Seq(1L).toDF("node"), maxHops = 3)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("multi-source takes the minimum over seeds") {
    val e = edgesOf(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    val got = Bfs.run(e, Seq(1L, 5L).toDF("node"), maxHops = 4)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 5L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
  }

  test("disconnected components stay unreached; cycles terminate") {
    val e = edgesOf(1L -> 2L, 2L -> 3L, 3L -> 1L, 10L -> 11L)
    val got = Bfs.run(e, Seq(1L).toDF("node"), maxHops = 10)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 1))
  }

  test("duplicate and self-loop edges are harmless") {
    val e = edgesOf(1L -> 2L, 1L -> 2L, 2L -> 2L, 2L -> 3L)
    val got = Bfs.run(e, Seq(1L).toDF("node"), maxHops = 2)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("maxHops = 0 returns exactly the (deduplicated) seed set") {
    val e = edgesOf(1L -> 2L)
    val got = Bfs.run(e, Seq(1L, 1L).toDF("node"), maxHops = 0)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0))
  }
}
