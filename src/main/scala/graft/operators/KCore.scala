package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling: iteratively delete every node of degree < k, a
  * fixed number of rounds (the distributed formulation — a true
  * fixpoint loop is the same body run until the edge count stops
  * falling; fixed rounds keep the result a pure function of the
  * input, which is what the DuckDB oracle (q177) pins).
  *
  * The k-core is the standard graph-density filter run next to
  * connected components (q56) and label propagation (q175) in a
  * dedup/quality stack: components say WHAT is reachable, LPA says
  * what is DENSE around a node, the k-core says which nodes have
  * enough independent support to trust at all (a doc linked from one
  * spam hub dies with the hub; one inside a dense clique of mutual
  * near-dups survives).
  *
  * Scale (100 TB design point): each round is one degree aggregation
  * (map-side partial combine on the src key) and two semi joins of
  * the edge frame against the surviving-node frame — O(E) shuffled
  * per round, strictly shrinking, nothing on the driver. The edge
  * frame is localCheckpoint'ed EVERY round (the
  * [[ConnectedComponents]] rule): the plan references the previous
  * round's frame twice (degree agg + the rebuilt edge list), so an
  * uncapped lineage replays the whole prefix up to 2^rounds times.
  * The survivor frame is checkpointed too — it feeds BOTH semi joins,
  * and as a persisted RDD the degree aggregation runs once instead of
  * relying on exchange reuse across join sides. The initial
  * repartition on `src` is pinned by the checkpoint, so the per-round
  * degree agg and src-side semi join reuse it shuffle-free.
  */
object KCore {

  /** @param edges directed (src, dst) pairs; pass BOTH directions for
    *              an undirected graph so the per-src count is the
    *              full degree.
    * @return (node, deg) for nodes still alive after `rounds` peels,
    *         with their residual degree.
    */
  def run(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k-core needs k >= 1, got $k")
    require(rounds >= 1, s"k-core needs >= 1 round, got $rounds")
    var e = edges.select(col("src"), col("dst"))
      .repartition(col("src"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to rounds) {
      val keep = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src").as("keep"))
        .localCheckpoint(eager = false)
      e = e.join(keep, col("src") === col("keep"), "left_semi")
        .join(keep, col("dst") === col("keep"), "left_semi")
        .localCheckpoint(eager = false)
    }
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
  }
}
