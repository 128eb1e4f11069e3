package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank-style link importance over an edge list — the corpus
  * quality-weighting signal large-scale web-data pipelines attach to
  * documents before sampling (an operator the reference lacks; it is
  * a natural neighbor of [[ConnectedComponents]] in the dedup/quality
  * stack).
  *
  * ALL arithmetic is scaled-integer: ranks live in parts-per-1e12 of
  * the total mass, per-edge contributions are `rank div outdeg`, and
  * damping is `(num * inflow) div den`. Integer sums are
  * order-independent, so the result is bit-identical across
  * partitionings, retries, AND engines (floating-point PageRank sums
  * in shuffle order and is none of those). Floor division loses a few
  * micro-units per node per round — ~1e-10 relative, far below any
  * ranking-relevant difference. Dangling-node mass is dropped (not
  * redistributed); the oracle computes the identical recurrence.
  *
  * Scale shape: each iteration is one join of the rank table (|V|
  * rows) against the degree-annotated edge list (|E| rows) on the
  * source plus one aggregation by destination — the same two shuffles
  * a Pregel step pays, expressed relationally so AQE handles skewed
  * hubs. `iterations` is a fixed small constant (quality weighting
  * uses 3–10 rounds, not convergence); `localCheckpoint` every other
  * round keeps the lineage bounded like ConnectedComponents does.
  */
object PageRank {

  val Scale = 1000000000000L // 1e12: |V| up to ~1e7 keeps sums < 2^63

  private def validate(iterations: Int, damping: (Int, Int)): Unit = {
    require(iterations >= 0 && iterations <= 50, "iterations in [0, 50]")
    val (num, den) = damping
    require(num > 0 && den > num, "damping must satisfy 0 < num < den")
    // keeps (Scale/n)·(den−num) and num·inflow within Long: den ≤ 1e4
    // bounds both products by ~1e16 ≪ 2^63
    require(den <= 10000, s"damping denominator too large (max 10000): $den")
  }

  /** Node table and degree-annotated edge table, materialized once
    * for all rounds — shared by [[run]] and [[personalized]] so the
    * two recurrences can never drift (PageRankSpec pins their
    * equality at seeds = all nodes).
    *
    * Aliases: deg derives from e, and an unqualified join of the two
    * trips the ambiguous-self-join detector. The explicit repartition
    * by `src` before the checkpoint materializes the RDD in
    * evenly-sized hash buckets on the iteration join key — without it
    * the checkpoint freezes whatever (possibly skewed, possibly
    * single-partition after AQE coalescing) layout the degree join
    * ended on, and every round inherits that skew. Under AQE the
    * checkpoint's partitioning isn't visible to downstream planning,
    * so rounds still shuffle their |V|-row rank side — but the |E|-row
    * edge table is never reshuffled (pinned by PlanShapeSpec).
    */
  private def prep(edges: DataFrame): (DataFrame, DataFrame) = {
    val e = edges.select(col("src"), col("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint() // reused every round AND by the final join
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    val eDeg = e.as("e").join(deg.as("g"), col("e.src") === col("g.src"))
      .select(col("e.src"), col("e.dst"), col("g.__deg"))
      .repartition(col("src"))
      .localCheckpoint()
    (nodes, eDeg)
  }

  /** The shared iteration loop: `flagged` is the node table with each
    * node's per-round teleport mass as `__base` (uniform for [[run]],
    * seed-concentrated for [[personalized]]).
    */
  private def iterate(flagged: DataFrame, eDeg: DataFrame,
                      rank0: DataFrame, iterations: Int,
                      num: Int, den: Int): DataFrame = {
    var rank = rank0
    for (i <- 1 to iterations) {
      // per-round aliases: from round 2 on, `rank` carries eDeg's
      // lineage, so an unqualified rank×eDeg join is a self-join to
      // the ambiguity detector
      val inflow = rank.as("r").join(eDeg.as("ed"), col("r.node") === col("ed.src"))
        .select(col("ed.dst").as("node"),
          expr("rank_ppt div __deg").as("__c"))
        .groupBy("node").agg(sum("__c").as("__inflow"))
      rank = flagged.join(inflow, Seq("node"), "left")
        .select(col("node"),
          expr(s"__base + ($num * coalesce(__inflow, 0L)) div $den")
            .as("rank_ppt"))
      if (i % 2 == 0 && i < iterations) rank = rank.localCheckpoint()
    }
    rank
  }

  /** @param edges   DataFrame with `src`/`dst` (any equatable type);
    *                duplicate edges count once.
    * @param damping (numerator, denominator), default (85, 100).
    * @return (node, rank_ppt) with rank in parts-per-[[Scale]].
    */
  def run(edges: DataFrame, iterations: Int = 3,
          damping: (Int, Int) = (85, 100)): DataFrame = {
    validate(iterations, damping)
    val (num, den) = damping
    val (nodes, eDeg) = prep(edges)
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("rank_ppt", lit(0L))
    val base = ((Scale / n) * (den - num)) / den // teleport mass per node
    val flagged = nodes.withColumn("__base", lit(base))
    val rank0 = nodes.withColumn("rank_ppt", lit(Scale / n))
    iterate(flagged, eDeg, rank0, iterations, num, den)
      .select("node", "rank_ppt")
  }

  /** Personalized PageRank: identical integer recurrence, but both
    * the initial mass and the teleport term concentrate on `seeds`
    * (∩ graph nodes) instead of spreading uniformly — the "influence
    * from this set" weighting behind seeded corpus expansion. With
    * seeds = all nodes this IS [[run]] (base and init reduce to the
    * uniform values) — PageRankSpec pins that law.
    *
    * @param seeds DataFrame with a `node` column; rows outside the
    *              graph are ignored, duplicates collapse.
    */
  def personalized(edges: DataFrame, seeds: DataFrame,
                   iterations: Int = 3,
                   damping: (Int, Int) = (85, 100)): DataFrame = {
    validate(iterations, damping)
    val (num, den) = damping
    val (nodes, eDeg) = prep(edges)
    val sd = seeds.select(col("node")).distinct()
      .join(nodes, Seq("node")).localCheckpoint()
    val sN = sd.count()
    if (sN == 0) return nodes.withColumn("rank_ppt", lit(0L))
    val baseSeed = ((Scale / sN) * (den - num)) / den
    val init = Scale / sN
    val marked = nodes
      .join(sd.withColumn("__seed", lit(1)), Seq("node"), "left")
      .localCheckpoint()
    val flagged = marked.select(col("node"), expr(
      s"CASE WHEN __seed = 1 THEN ${baseSeed}L ELSE 0L END").as("__base"))
    val rank0 = marked.select(col("node"), expr(
      s"CASE WHEN __seed = 1 THEN ${init}L ELSE 0L END").as("rank_ppt"))
    iterate(flagged, eDeg, rank0, iterations, num, den)
      .select("node", "rank_ppt")
  }
}
