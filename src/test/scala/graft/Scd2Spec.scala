package graft

import org.apache.spark.sql.functions._

/** Structural laws of the q199 SCD2 interval build that the value
  * hash can't fully express: per-key intervals must tile the key's
  * history (contiguous, non-overlapping, half-open), exactly the last
  * interval is open-ended, adjacent intervals must actually change
  * type (maximal runs), and no event is lost or duplicated.
  */
class Scd2Spec extends SparkSpecBase
    with org.scalatest.BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val scd2 =
    SparkEntry.queries("q199_scd2_intervals")(spark, sf).cache()

  // the cache is suite-local: left persisted it would substitute an
  // InMemoryRelation into LATER suites' q199 plans (PlanShapeSpec
  // asserts on the fresh plan's exchange count)
  override def afterAll(): Unit = { scd2.unpersist(); super.afterAll() }

  test("intervals are contiguous and non-overlapping per user") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("island")
    val viol = scd2
      .withColumn("next_from", lead("valid_from_us", 1).over(w))
      .filter(col("next_from").isNotNull &&
        col("valid_to_us") =!= col("next_from"))
      .count()
    assert(viol == 0, s"$viol gaps/overlaps between consecutive intervals")
  }

  test("exactly one open-ended interval per user, and it is the last") {
    val byUser = scd2.groupBy("user_id")
      .agg(sum(when(col("valid_to_us").isNull, 1).otherwise(0)).as("n_open"),
        max("island").as("max_isl"),
        max(when(col("valid_to_us").isNull, col("island"))).as("open_isl"))
    assert(byUser.filter(col("n_open") =!= 1).count() == 0)
    assert(byUser.filter(col("open_isl") =!= col("max_isl")).count() == 0)
  }

  test("adjacent intervals change event_type (runs are maximal)") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("island")
    val viol = scd2
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull &&
        col("prev_type") === col("event_type"))
      .count()
    assert(viol == 0, s"$viol non-maximal (same-type adjacent) runs")
  }

  test("event counts are conserved: interval n_events sums to the source") {
    val total = scd2.agg(sum("n_events")).head.getLong(0)
    val src = graft.core.Tables.events(spark, sf).count()
    assert(total == src, s"intervals carry $total events, source has $src")
  }
}
