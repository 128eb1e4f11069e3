package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (the IVM companion to
  * [[DeltaJoin]]): maintain a grouped (count, sum) state under a
  * mixed stream of INSERTS and RETRACTIONS without rescanning the
  * base — the classic signed-multiset (z-set) formulation from the
  * incremental-view-maintenance literature, restricted to the
  * commutative-group aggregates (COUNT/SUM and everything derivable:
  * mean, ratio lanes) where a delta is always mergeable. MIN/MAX are
  * deliberately out of scope: a retraction of the current extremum
  * needs the base (no group inverse).
  *
  * Scale shape: the change set aggregates FIRST (map-side combine to
  * one signed row per touched key), then a null-safe full-outer join
  * against the state on the group keys — cost is O(|state| +
  * |changes|), never O(|base|). Groups whose maintained count
  * reaches zero drop out, matching a recompute over the updated
  * base exactly.
  *
  * Reference behavior: pydala2 exposes no incremental computation;
  * this extends the SURVEY §2.3 delta/merge stack.
  */
object DeltaAgg {

  /** Merge signed changes into a (keys..., n_rows, sum_<valueCol>)
    * state frame.
    *
    * @param state   current aggregate: keys ++ (n_rows: long,
    *                n_vals: long, sum_<valueCol>: long) — the layout
    *                this function itself produces (see [[fromBase]]);
    *                n_vals counts non-NULL values so an all-NULL
    *                group's sum stays NULL through any merge
    * @param changes one row per changed base row: keys ++ valueCol ++
    *                opCol (+1 insert, −1 retraction)
    */
  def merge(state: DataFrame, changes: DataFrame, keys: Seq[String],
            valueCol: String, opCol: String): DataFrame = {
    val sumCol = s"sum_$valueCol"
    val d = changes.groupBy(keys.map(col): _*)
      .agg(sum(col(opCol).cast("long")).as("d_n"),
        // signed count of NON-NULL change values: SUM over an
        // all-NULL group must stay NULL after any merge, exactly as
        // a recompute would report it
        sum(when(col(valueCol).isNull, lit(0L))
          .otherwise(col(opCol).cast("long"))).as("d_nv"),
        sum(col(opCol).cast("long") * col(valueCol).cast("long"))
          .as("d_sum"))
      .alias("dagg_d")
    // alias both sides: state and changes commonly share lineage
    // (both derived from one base frame), which otherwise trips
    // Spark's ambiguous-self-join detection on the key references
    val st = state.alias("dagg_s")
    // null-safe key equality: a NULL group key is a real group (the
    // Merge.scala convention) — a plain equi-join would duplicate it
    val cond = keys.map(k =>
      col(s"dagg_s.$k") <=> col(s"dagg_d.$k")).reduce(_ && _)
    st.join(d, cond, "full_outer")
      .select(
        keys.map(k =>
          coalesce(col(s"dagg_s.$k"), col(s"dagg_d.$k")).as(k)) ++ Seq(
          (coalesce(col("dagg_s.n_rows"), lit(0L)) +
            coalesce(col("dagg_d.d_n"), lit(0L))).as("n_rows"),
          (coalesce(col("dagg_s.n_vals"), lit(0L)) +
            coalesce(col("dagg_d.d_nv"), lit(0L))).as("n_vals"),
          (coalesce(col(s"dagg_s.$sumCol"), lit(0L)) +
            coalesce(col("dagg_d.d_sum"), lit(0L))).as("sum_raw")): _*)
      .withColumn(sumCol,
        when(col("n_vals") === 0L, lit(null).cast("long"))
          .otherwise(col("sum_raw")))
      .drop("sum_raw")
      .filter(col("n_rows") > 0)
      .select((keys ++ Seq("n_rows", "n_vals", sumCol)).map(col): _*)
  }

  /** Build the state layout from a base frame (one aggregate pass). */
  def fromBase(base: DataFrame, keys: Seq[String],
               valueCol: String): DataFrame =
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        count(col(valueCol)).as("n_vals"),
        sum(col(valueCol).cast("long")).as(s"sum_$valueCol"))
}
