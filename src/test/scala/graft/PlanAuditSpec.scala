package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Global plan-hygiene audit: NO query in the suite may plan an
  * unbounded Cartesian product. Scalar cross joins (1-row aggregate
  * frames, broadcast eval samples) lower to
  * BroadcastNestedLoopJoin — bounded by the broadcast threshold and
  * fine; CartesianProductExec means BOTH sides were too big to
  * broadcast and the pair blowup would be quadratic at scale. Pinning
  * this for every query (not just the individually-audited ones in
  * PlanShapeSpec) turns the per-round manual crossJoin sweep into a
  * regression gate for STRUCTURAL mistakes: dropping a broadcast()
  * hint from a frame Catalyst estimates big, or introducing a
  * non-equi join between two large relations. What it cannot catch
  * at sf0.001 is size DRIFT — a "scalar" frame that grows past the
  * broadcast threshold only at production scale still lowers to
  * BroadcastNestedLoopJoin here (Catalyst's no-CBO estimates can't
  * see filter-bounded smallness, so shrinking the threshold would
  * false-fail legitimately bounded sides like q47's 20-row probe
  * set); per-operator capacity math in docs/SCALE.md carries that
  * burden.
  *
  * Lifecycle and streaming queries are excluded — their builders run
  * physical side effects (dataset writes, micro-batch drains), not
  * lazy plans; their plan shapes are pinned by their own round-trip
  * gates and specs.
  */
class PlanAuditSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  private val effectful: Set[String] =
    graft.queries.Lifecycle.queries.keySet ++
      graft.queries.StreamOps.queries.keySet

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
       if !effectful(name)) {
    test(s"$name plans no unbounded cartesian product") {
      // plain collect, not collectWithSubqueries: on the pre-AQE
      // sparkPlan, subquery expressions still hold UNPLANNED logical
      // plans (the cast throws), and a scalar subquery is 1-row by
      // contract anyway
      val plan = fn(spark, sfDir).queryExecution.sparkPlan
      val carts = plan.collect {
        case c: CartesianProductExec => c
      }
      assert(carts.isEmpty,
        s"$name plans ${carts.size} CartesianProductExec node(s) — " +
          "either broadcast the small side or bound the pair space")
    }
  }
}
