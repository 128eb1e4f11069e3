package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first search: minimum hop count from any seed
  * node, bounded by `maxHops` — k-hop reachability over a distributed
  * edge list (the neighborhood-expansion primitive behind influence
  * radius, contamination spread, and graph-feature extraction).
  *
  * Execution shape per round: one equi-join of the current frontier
  * against the edge table + one anti-join against the visited set —
  * both hash joins on the node key, no cartesian anywhere. The
  * frontier is usually a small fraction of the graph, so the join
  * probes broadcast in practice; the visited set grows monotonically
  * and is `localCheckpoint`ed each round to truncate the lineage (the
  * same discipline as [[KCore]] — without it, round N's plan replays
  * rounds 1..N-1).
  *
  * At 100 TB: edges stay hash-partitioned on `src` across rounds
  * (one shuffle, reused), each round's work is proportional to the
  * frontier's out-degree sum, and `maxHops` bounds the round count —
  * the standard Pregel-style BFS schedule expressed as DataFrame
  * joins.
  */
object Bfs {

  /** @param edges directed edge list with `src`/`dst` columns —
    *              symmetrize at the call site for undirected graphs;
    *              parallel edges are deduplicated here.
    * @param seeds one `node` column; hop 0.
    * @return (node, hops) — min hops from any seed, hops ≤ maxHops;
    *         unreached nodes are absent.
    */
  def run(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val e = prepare(edges)
    try runPrepared(e, seeds, maxHops)
    finally { e.unpersist(); () }
  }

  /** Dedup + hash-partition on `src` + pin (round-12, guide §2.4
    * "share one exchange"): the per-round frontier join needs
    * `src`-clustering, but a pin made straight from `distinct()`
    * carries (src, dst)-partitioning the planner cannot reuse, so
    * EVERY round re-shuffled the whole edge frame (event-log: the
    * round job was ~85 % of q507/q203 wall). Partitioned on `src`
    * once, each round exchanges only the frontier — the
    * [[ShortestPath]] edge-layout rule applied here. The caller owns
    * the persist lifecycle (unpersist after the sweeps; results are
    * checkpointed).
    */
  def prepare(edges: DataFrame): DataFrame =
    edges.select("src", "dst").distinct()
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** [[run]] over an ALREADY deduplicated-and-persisted edge frame —
    * for callers that sweep the same graph several times (q507's
    * double BFS): the edge distinct+pin is paid once across sweeps
    * instead of per run. The caller owns the persist lifecycle; the
    * returned frame is checkpointed, so unpersisting after the sweeps
    * is safe.
    */
  def runPrepared(e: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    locally {
      var visited = seeds.select(col("node")).distinct()
        .withColumn("hops", lit(0)).localCheckpoint()
      var frontier = visited
      var h = 1
      var frontierNonEmpty = !frontier.isEmpty
      while (h <= maxHops && frontierNonEmpty) {
        val next = e.join(frontier.select(col("node").as("src")), "src")
          .select(col("dst").as("node")).distinct()
          .join(visited.select("node"), Seq("node"), "left_anti")
          .withColumn("hops", lit(h))
          .localCheckpoint()
        frontierNonEmpty = !next.isEmpty
        if (frontierNonEmpty) {
          // both sides are already checkpointed, so the union's
          // lineage stays shallow without re-materializing the whole
          // visited set each round (which would cost O(V) per round);
          // every 8 rounds the union TREE itself is collapsed so a
          // deep maxHops never accumulates an O(rounds)-leaf plan
          visited = visited.unionAll(next)
          if (h % 8 == 0) visited = visited.localCheckpoint()
          frontier = next
        }
        h += 1
      }
      visited
    }
  }
}
