package graft.operators

/** Bounded-wait harvest of an observed `count` metric (round-12,
  * advisor finding): `Observation.get` blocks INDEFINITELY on an
  * uncompleted promise, so the documented "metric optimized away"
  * fallback (`Try(obs.get(...)).getOrElse(0L)`) could never fire — if
  * the CollectMetrics node were ever eliminated the operator would
  * hang, not return 0. This awaits the public metrics future under a
  * generous deadline instead: the listener normally completes it
  * within milliseconds of the action returning; the deadline only
  * exists for the eliminated-subtree case (which can only happen when
  * the observed frame was provably empty — hence the 0 default).
  */
private[operators] object ObservedCount {

  private val Deadline = scala.concurrent.duration.Duration(30, "s")

  /** The observed long metric `key`, or 0 when the metrics never
    * arrive (eliminated subtree ⇒ zero observed rows).
    */
  def apply(obs: org.apache.spark.sql.Observation, key: String = "n"): Long =
    try {
      val row = scala.concurrent.Await.result(obs.future, Deadline)
      scala.util.Try(row.getAs[Long](key)).getOrElse(0L)
    } catch {
      case _: java.util.concurrent.TimeoutException => 0L
    }
}
