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
      stateUpdateMs: Long, stateCommitMs: Long, stateRemoveMs: Long) {
    def render: String =
      s"batches=$batches rows=$rows wallMs=$wallMs addBatchMs=$addBatchMs " +
        s"getBatchMs=$getBatchMs planMs=$planMs walCommitMs=$walCommitMs " +
        s"commitOffsetsMs=$commitOffsetsMs stateRows=$stateRows " +
        s"stateMemB=$stateMemB stateUpdateMs=$stateUpdateMs " +
        s"stateCommitMs=$stateCommitMs stateRemoveMs=$stateRemoveMs"
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
