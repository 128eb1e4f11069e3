package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous mode-label propagation (LPA) community detection.
  *
  * Complements [[ConnectedComponents]]: components follow REACHABILITY
  * (one bridge edge glues two blocks together), LPA follows DENSITY —
  * each round every node adopts the most frequent label among its
  * neighbors (ties → smallest label), so a node wedged between two
  * dense blocks joins the denser one and a lone bridge cannot merge
  * communities. The dedup pipeline uses it when near-dup clusters
  * should split at weak links instead of chaining through them.
  *
  * Determinism: synchronous rounds (all nodes update from the SAME
  * previous-round labels) + the (count DESC, label ASC) argmax make
  * the result a pure function of the edge set and round count — no
  * vertex-visit-order dependence, which is what makes the DuckDB
  * oracle (q175) possible.
  *
  * Scale (100 TB design point): each round is one co-partitioned
  * edge⋈label hash join on the source id, one (node, label) count with
  * map-side partial aggregation, and one bounded per-node argmax
  * window — O(E) shuffled bytes per round, no all-pairs term, nothing
  * on the driver. Lineage is capped with a localCheckpoint every 4
  * rounds (the [[ConnectedComponents]] pattern) so deep runs do not
  * accumulate a replan-everything plan tree.
  */
object LabelPropagation {

  /** @param edges directed (src, dst) pairs; pass BOTH directions for
    *              an undirected graph (every node then has in-edges,
    *              so none drops out of the label frame).
    * @return (node, lbl) — the community label after `rounds`
    *         synchronous updates. Labels start as the node ids.
    */
  def run(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"label propagation needs >= 1 round, got $rounds")
    val e = edges.select(col("src"), col("dst"))
    var lbl = e.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
    for (i <- 1 to rounds) {
      val cnt = e.join(lbl, col("src") === col("node"))
        .groupBy(col("dst").as("n2"), col("lbl"))
        .agg(count(lit(1)).as("c"))
      lbl = cnt
        .withColumn("rk", row_number().over(
          Window.partitionBy("n2").orderBy(col("c").desc, col("lbl").asc)))
        .filter(col("rk") === 1)
        .select(col("n2").as("node"), col("lbl"))
      if (i % 4 == 0 && i < rounds) lbl = lbl.localCheckpoint()
    }
    lbl
  }
}
