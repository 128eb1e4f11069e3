package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round single-source shortest paths (Bellman-Ford): after
  * `rounds` synchronous relaxations, `dist(v)` is the exact minimum
  * weight over all paths from the source set to `v` using at most
  * `rounds` edges — a pure function of the input (what a bounded
  * DuckDB oracle can pin), and the fixpoint answer whenever `rounds`
  * ≥ the graph's hop diameter.
  *
  * The weighted counterpart of the BFS k-hop operator (q203): BFS
  * counts hops, this minimizes an additive non-negative weight
  * (procurement cost, latency, edit budget).
  *
  * Scale (100 TB design point): each round is one equi-join of the
  * current distance frame against the edge frame on the edge's source
  * key plus one min-aggregate — O(E) shuffled per round, nothing on
  * the driver. The edge frame is repartitioned ONCE on `src` and
  * localCheckpoint'ed, so every round's join reuses that layout
  * shuffle-free on the edge side; the distance frame is
  * localCheckpoint'ed per round (the [[ConnectedComponents]]/[[KCore]]
  * lineage rule — it feeds both the relaxation join and the union, so
  * an uncapped lineage replays the whole prefix 2^rounds times).
  */
object ShortestPath {

  /** @param edges  directed weighted edges (src, dst, w) — BIGINT
    *               node ids, non-negative BIGINT weights; pass both
    *               directions for an undirected graph
    * @param sources starting nodes (distance 0)
    * @return (node, dist) for every node reachable in ≤ `rounds` edges
    */
  def boundedSssp(edges: DataFrame, sources: Seq[Long], rounds: Int): DataFrame = {
    require(rounds >= 1, s"need >= 1 relaxation round, got $rounds")
    require(sources.nonEmpty, "need at least one source node")
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("dst"), col("w"))
      .repartition(col("src"))
      .localCheckpoint(eager = false)
    var dist = spark.range(sources.length)
      .select(element_at(
          array(sources.map(lit): _*), col("id").cast("int") + 1).as("node"),
        lit(0L).as("dist"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to rounds) {
      dist = dist.join(e, col("node") === col("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
        .unionByName(dist)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint(eager = false)
    }
    dist
  }
}
