package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (the IVM companion to
  * [[DeltaJoin]]): maintain a grouped (count, sum) state under a
  * mixed stream of INSERTS and RETRACTIONS without rescanning the
  * base — the classic signed-multiset (z-set) formulation from the
  * incremental-view-maintenance literature, restricted to the
  * commutative-group aggregates (COUNT/SUM and everything derivable:
  * mean, ratio lanes) where a delta is always mergeable — plus, since
  * round 8, MIN/MAX through [[mergeMinMax]]'s bounded re-aggregation
  * (no group inverse exists, so extremum-touched groups recompute
  * from the updated base, key-bounded by a semi join).
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

  /** Per-call tags for LRU-adopted frames — see [[mergeMinMax]]. */
  private val mergeSeq = new java.util.concurrent.atomic.AtomicLong()

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

  /** Extremum-state layout: keys ++ (n_rows, n_vals, min_<v>, max_<v>). */
  def fromBaseMinMax(base: DataFrame, keys: Seq[String],
                     valueCol: String): DataFrame =
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        count(col(valueCol)).as("n_vals"),
        min(col(valueCol).cast("long")).as(s"min_$valueCol"),
        max(col(valueCol).cast("long")).as(s"max_$valueCol"))

  /** Maintain a grouped MIN/MAX state under inserts + retractions with
    * BOUNDED base re-aggregation — the standard IVM answer to "min/max
    * have no group inverse". Inserts merge monotonically
    * (`least`/`greatest` are semilattice ops); a retraction can only
    * invalidate a stored extremum when the retracted value TIES it
    * (values strictly inside the (min, max) interval leave both ends
    * standing). So groups split into:
    *
    *   - SAFE (no retraction at either extremum): merged entirely from
    *     state ⊕ Δ, the base never read — at steady state this is
    *     almost every group;
    *   - UNSAFE (some retraction ties min or max, or retracts from a
    *     group the state doesn't know): re-aggregated from the
    *     UPDATED base, restricted to exactly those groups by a
    *     null-safe left-semi join, so the rescan is
    *     O(rows-in-touched-groups), never O(|base|). With the base
    *     partitioned/bucketed on the group keys the semi join prunes
    *     at the scan (DPP); AQE broadcasts the key set when small.
    *
    * `updatedBase` is by-name and evaluated ONLY when unsafe groups
    * exist (the emptiness probe runs on state ⋈ Δ, never the base) —
    * a pure-insert or interior-retraction batch provably never
    * touches it (law-tested in DeltaAggSpec with a throwing thunk).
    * It must be the post-change base (what a merge just wrote): the
    * unsafe path is then a plain recompute for those groups, which is
    * correct by definition.
    */
  def mergeMinMax(state: DataFrame, changes: DataFrame, keys: Seq[String],
                  valueCol: String, opCol: String)
                 (updatedBase: => DataFrame): DataFrame = {
    val minCol = s"min_$valueCol"
    val maxCol = s"max_$valueCol"
    val v = col(valueCol).cast("long")
    val op = col(opCol).cast("long")
    val d = changes.groupBy(keys.map(col): _*)
      .agg(sum(op).as("d_n"),
        sum(when(col(valueCol).isNull, lit(0L)).otherwise(op)).as("d_nv"),
        min(when(op > 0, v)).as("ins_min"),
        max(when(op > 0, v)).as("ins_max"),
        // most extreme RETRACTED values — the invalidation test
        min(when(op < 0, v)).as("ret_min"),
        max(when(op < 0, v)).as("ret_max"))
      .alias("dagg_d")
    val st = state.alias("dagg_s")
    val cond = keys.map(k =>
      col(s"dagg_s.$k") <=> col(s"dagg_d.$k")).reduce(_ && _)
    // The state⋈Δ frame is consumed up to three times per merge (the
    // emptiness probe, the safe branch, the semi-join key side), so it
    // is persisted ONCE and its lifecycle handed to the memo LRU via a
    // per-call tag (a library operator must not pin storage it never
    // releases). NOT keyed by plan digest: two merges over different
    // in-memory change sets canonicalize to the same plan text
    // (LocalRelation data is not in the digest), and a content-keyed
    // memo would serve one merge's state to the other.
    val joined = {
      val raw = st.join(d, cond, "full_outer")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.core.Tables.adopt(state.sparkSession,
        s"deltaagg#${mergeSeq.incrementAndGet()}", raw)
      raw
    }
    // NULL-valued retractions never appear in ret_min/ret_max (min/max
    // ignore NULLs) and never invalidate an extremum. The state-min
    // NULL clause is conservative: a non-NULL retraction against an
    // all-NULL-value group is inconsistent input — recompute it.
    val unsafe = coalesce(
      col("dagg_d.ret_min").isNotNull && (
        col("dagg_s.n_rows").isNull ||
          col(s"dagg_s.$minCol").isNull ||
          col("dagg_d.ret_min") <= col(s"dagg_s.$minCol") ||
          col("dagg_d.ret_max") >= col(s"dagg_s.$maxCol")),
      lit(false))
    val outCols = keys ++ Seq("n_rows", "n_vals", minCol, maxCol)
    val safe = joined.filter(!unsafe)
      .select(
        keys.map(k =>
          coalesce(col(s"dagg_s.$k"), col(s"dagg_d.$k")).as(k)) ++ Seq(
          (coalesce(col("dagg_s.n_rows"), lit(0L)) +
            coalesce(col("dagg_d.d_n"), lit(0L))).as("n_rows"),
          (coalesce(col("dagg_s.n_vals"), lit(0L)) +
            coalesce(col("dagg_d.d_nv"), lit(0L))).as("n_vals"),
          least(col(s"dagg_s.$minCol"), col("dagg_d.ins_min")).as(minCol),
          greatest(col(s"dagg_s.$maxCol"), col("dagg_d.ins_max")).as(maxCol)): _*)
      .filter(col("n_rows") > 0)
      .select(outCols.map(col): _*)
    val unsafeKeys = joined.filter(unsafe)
      .select(keys.map(k =>
        coalesce(col(s"dagg_s.$k"), col(s"dagg_d.$k")).as(k)): _*)
    // adaptive gate: one state⋈Δ-sized job decides whether the base is
    // touched at all (the same move AQE makes — measure, then plan)
    if (unsafeKeys.isEmpty) safe
    else {
      val kb = unsafeKeys.alias("dagg_k")
      val touched = updatedBase.alias("dagg_b").join(kb,
        keys.map(k =>
          col(s"dagg_b.$k") <=> col(s"dagg_k.$k")).reduce(_ && _),
        "left_semi")
      safe.unionByName(
        fromBaseMinMax(touched, keys, valueCol).select(outCols.map(col): _*))
    }
  }
}
