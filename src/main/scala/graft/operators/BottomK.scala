package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keep the k lowest-ranked rows per group — the distributed
  * "reservoir" primitive behind deterministic sampling (q325) and
  * bottom-k sketches like KMV (q324).
  *
  * The shape matters more than the code: a `row_number ≤ k` filter
  * directly over a partitioned window is the ONE top-k idiom Catalyst
  * rewrites to a WindowGroupLimit — each map task keeps a k-bounded
  * heap per group and only k·partitions rows ever reach the window
  * sort. Callers must keep the rank column unreferenced (dropping it
  * here preserves the rewrite; projecting it again would defeat it —
  * see PlanShapeSpec's pin).
  *
  * Bottom-k sets are mergeable: bottomK(A ∪ B) = bottomK(bottomK(A) ∪
  * bottomK(B)) whenever the ordering is total (callers append a
  * tie-breaking column), which is what makes the primitive safe to
  * apply per-partition, per-file, or per-day and combine later —
  * BottomKSpec pins the law.
  *
  * Reference behavior: pydala2 has no sampling/sketch surface; this
  * extends the training-pipeline stack (SURVEY.md "beyond the
  * reference").
  */
object BottomK {

  /** k lowest rows per `groupCols` group under `orderCols` (must be a
    * total order for determinism — add a tie-break column). The rank
    * column never escapes, so the WindowGroupLimit rewrite survives.
    */
  def perGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      k: Int): DataFrame = {
    require(k > 0, s"bottom-k needs k > 0, got $k")
    df.withColumn("__bk_rk",
        row_number().over(
          Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)))
      .filter(col("__bk_rk") <= k)
      .drop("__bk_rk")
  }
}
