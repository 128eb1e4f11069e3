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
  * regression gate: a future edit that drops a broadcast hint or
  * grows a scalar frame past the threshold fails HERE, not in a 100x
  * slower production run.
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
