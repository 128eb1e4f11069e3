package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * the cluster-assembly step of a near-dup pipeline (LSH/SimHash
  * candidate pairs → KEEP/DROP groups with a canonical member).
  *
  * Algorithm: iterative min-label propagation. Each round is one
  * shuffle (edge⋈label hash join + min-combine aggregation); rounds =
  * graph diameter. Labels are seeded with min(self, direct neighbors),
  * which is exactly one propagation round for free. The driver loop
  * reads only a one-row convergence aggregate (the count of vertices
  * whose label changed this round) — data rows never reach the
  * driver — and `localCheckpoint` caps lineage growth per round.
  * Convergence is structural, so labels may be ANY orderable type
  * (strings included), not just numeric ids.
  *
  * Scale: near-dup components are tiny and shallow (pairs/triples), so
  * diameter ≈ 2-3 and this is 2-3 shuffles over the edge list. For
  * adversarially long chains use [[largeSmallStar]] (same join shape,
  * O(log n) rounds); the reference has no graph operator at all
  * (SURVEY §2), so the simple propagation is the right first tool.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame of undirected edges; vertex
    *              type must be orderable (labels are mins).
    * @return (id, comp, csize): every vertex that appears in an edge,
    *         its component label (= min vertex id in the component),
    *         and the component size.
    */
  def apply(edges: DataFrame): DataFrame = {
    val Array(srcC, dstC) = edges.columns
    val cand = edges.select(col(srcC).as("a"), col(dstC).as("b"))
      .filter(col("a") =!= col("b"))
    // both orientations from ONE pass over the (possibly expensive)
    // upstream edge computation — a union of two branches would run it twice.
    // Re-partitioned on the probe key `a` BEFORE checkpointing: the
    // checkpoint pins that partitioning, so every round's edge⋈label join
    // reuses it instead of re-shuffling the (large) edge list per round.
    val sym = cand.select(explode(array(
        struct(col("a"), col("b")),
        struct(col("b").as("a"), col("a").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct()
      .repartition(col("a"))
      .localCheckpoint(eager = false)
    var labels = sym.groupBy(col("b").as("id"))
      .agg(min("a").as("nmin"))
      .select(col("id"), least(col("id"), col("nmin")).as("comp"))
      .localCheckpoint(eager = false)
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      // one propagation step: min over direct neighbors
      val prop = sym.join(labels, sym("a") === labels("id"))
        .groupBy(col("b").as("id"))
        .agg(min("comp").as("nmin"))
        .join(labels.withColumnRenamed("comp", "own"), "id")
        .select(col("id"), col("own"), least(col("own"), col("nmin")).as("c1"))
      // path-halving: jump to the label's own label (labels are vertex
      // ids, so the jump is a self-join of the small label frame) —
      // effective reach per round roughly doubles, so rounds drop from
      // O(diameter) toward O(log diameter)
      val upd = prop.as("x").join(
          prop.select(col("id").as("jid"), col("c1").as("jc")).as("y"),
          col("x.c1") === col("y.jid"), "left")
        .select(col("x.id").as("id"), col("x.own").as("own"),
          least(col("x.c1"), coalesce(col("y.jc"), col("x.c1"))).as("comp"))
        .localCheckpoint(eager = false) // lazy: the count below materializes
      // structural convergence probe: a round with no label change is the
      // fixed point, regardless of the label type
      changed = upd.filter(col("comp") =!= col("own")).count()
      labels = upd.select("id", "comp")
      rounds += 1
    }
    if (sys.env.contains("GRAFT_DEBUG"))
      System.err.println(s"[components] converged after $rounds rounds")
    labels.withColumn("csize", count(lit(1)).over(Window.partitionBy("comp")))
  }

  /** Large-star / small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14) — the variant for
    * ADVERSARIALLY DEEP graphs. Min-label propagation above pays
    * O(diameter-ish) rounds; on a million-node path that is dozens of
    * shuffles. Each L/S round here is the same join-plus-aggregation
    * shape but contracts the graph toward stars, converging in
    * O(log n) rounds on any topology. Near-dup candidate graphs are
    * shallow, so [[apply]] stays the default; switch here when
    * components can chain (CDC passage graphs, reply/quote chains).
    *
    * Same contract as [[apply]]: (id, comp, csize) for every vertex
    * on an edge, comp = min vertex id of the component, any orderable
    * vertex type.
    */
  def largeSmallStar(edges: DataFrame): DataFrame = {
    val Array(srcC, dstC) = edges.columns
    var e = edges.select(col(srcC).as("u"), col(dstC).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(eager = false)

    // large-star: every neighbor LARGER than u re-attaches to the min
    // of u's closed neighborhood; processed from both endpoints
    def largeStar(in: DataFrame): DataFrame = {
      val nb = in.select(explode(array(
          struct(col("u"), col("v")),
          struct(col("v").as("u"), col("u").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
      val m = nb.groupBy("u").agg(min("v").as("nmin"))
        .select(col("u"), least(col("u"), col("nmin")).as("m"))
      nb.join(m, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // small-star: orient every edge toward its larger endpoint; each
    // node and its smaller neighbors all re-attach to the minimum
    def smallStar(in: DataFrame): DataFrame = {
      val or = in.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct()
      val m = or.groupBy("u").agg(min("v").as("m")) // all v < u, so m < u
      or.join(m, "u")
        .select(explode(array(
          struct(col("v").as("u"), col("m").as("v")),
          struct(col("u"), col("m").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    var rounds = 0
    var stable = false
    while (!stable) {
      val next = smallStar(largeStar(e)).localCheckpoint(eager = false)
      // fixed point = edge SET unchanged (stars map to themselves);
      // two one-row counts — no data rows reach the driver
      stable = next.exceptAll(e).isEmpty && e.exceptAll(next).isEmpty
      e = next
      rounds += 1
      require(rounds <= 60, "large/small-star failed to converge — cyclic labels?")
    }
    if (sys.env.contains("GRAFT_DEBUG"))
      System.err.println(s"[components/lss] converged after $rounds rounds")

    // star form: every edge is (child, root); roots appear only as v
    val labels = e.select(col("u").as("id"), col("v").as("comp"))
      .unionByName(e.select(col("v").as("id"), col("v").as("comp")).distinct())
      .distinct()
    labels.withColumn("csize", count(lit(1)).over(Window.partitionBy("comp")))
  }
}
