package graft.streaming

import scala.collection.concurrent.TrieMap

/** Per-streaming-run micro-batch telemetry, recorded by the gates'
  * drain path and harvested by [[graft.Bench]] to attribute each
  * streaming gate's wall cost to state machinery vs data volume
  * (round-7 item: the q201/q135/q109/q188 I/O-lane drift was argued
  * from filesystem state but never measured — these numbers make the
  * split visible per bench run).
  *
  * All durations are summed over the run's micro-batches from
  * `StreamingQueryProgress.durationMs` / `stateOperators`:
  *  - `wallMs`        triggerExecution (total per-batch wall)
  *  - `addBatchMs`    sink/exec time (the data-volume lane)
  *  - `getBatchMs`    source listing+read planning
  *  - `planMs`        queryPlanning
  *  - `walCommitMs`   offset WAL commit (driver-side fsync lane)
  *  - `commitOffsetsMs` offset log finalization
  *  - `stateUpdateMs` state-store allUpdatesTimeMs (update lane)
  *  - `stateCommitMs` state-store commitTimeMs (provider checkpoint)
  *  - `stateRemoveMs` state-store allRemovalsTimeMs (eviction lane)
  *
  * Multiple runs of one tag (Bench's min-of-3) append; the harvester
  * picks the min-wall run to pair with Bench's min-time estimator.
  * The registry is process-global and tiny (a few structs per gate);
  * `harvest()` drains it.
  */
object StreamTelemetry {

  final case class Stat(
      batches: Int, rows: Long, wallMs: Long, addBatchMs: Long,
      getBatchMs: Long, planMs: Long, walCommitMs: Long,
      commitOffsetsMs: Long, stateRows: Long, stateMemB: Long,
      stateUpdateMs: Long, stateCommitMs: Long, stateRemoveMs: Long,
      truncated: Boolean = false) {
    /** THE lane list — the stderr render and Bench's archived JSON
      * both derive from it, so a new lane can't silently exist in one
      * surface and not the other. */
    def lanes: Seq[(String, Long)] = Seq(
      "batches" -> batches.toLong, "rows" -> rows, "wallMs" -> wallMs,
      "addBatchMs" -> addBatchMs, "getBatchMs" -> getBatchMs,
      "planMs" -> planMs, "walCommitMs" -> walCommitMs,
      "commitOffsetsMs" -> commitOffsetsMs, "stateRows" -> stateRows,
      "stateMemB" -> stateMemB, "stateUpdateMs" -> stateUpdateMs,
      "stateCommitMs" -> stateCommitMs, "stateRemoveMs" -> stateRemoveMs,
      "truncated" -> (if (truncated) 1L else 0L))
    def render: String =
      lanes.map { case (k, v) => s"$k=$v" }.mkString(" ")
    def json: String =
      lanes.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
  }

  private val runs = TrieMap.empty[String, Vector[Stat]]

  def record(tag: String, stat: Stat): Unit =
    runs.updateWith(tag) {
      case Some(v) => Some(v :+ stat)
      case None    => Some(Vector(stat))
    }

  /** Min-wall run per tag since the last harvest; clears the buffer. */
  def harvest(): Map[String, Stat] = {
    val out = runs.readOnlySnapshot().toMap
      .map { case (k, v) => k -> v.minBy(_.wallMs) }
    runs.clear()
    out
  }
}
