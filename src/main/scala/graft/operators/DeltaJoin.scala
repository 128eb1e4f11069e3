package graft.operators

import org.apache.spark.sql.DataFrame

/** Incremental equi-join maintenance for append-only inputs — the
  * join analogue of the sidecar's incremental aggregate maintenance
  * (reference behavior: pydala's delta/merge machinery maintains
  * TABLES incrementally, `pydala/dataset.py:1549-1777`; this extends
  * the idea to a materialized JOIN, the shape every training-data
  * refresh pipeline hits when a new crawl increment lands).
  *
  * Identity: with appends ΔA, ΔB,
  *   (A ∪ ΔA) ⋈ (B ∪ ΔB) = (A ⋈ B) ∪ (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
  * and the three right-hand terms — the DELTA — never touch the
  * already-materialized A ⋈ B. At 100 TB this is the difference
  * between re-shuffling two fact tables and probing the big bases
  * with broadcast-sized increments: each term joins one SMALL side
  * (the delta) against one big one, so Spark broadcasts the delta
  * and the bases are scanned once each with no shuffle; the ΔA ⋈ ΔB
  * term is delta-sized on both sides. The union is append semantics
  * exactly — valid because the inputs are append-only (no updates or
  * deletes; those route through [[Merge]]'s copy-on-write instead).
  */
object DeltaJoin {

  /** The rows ADDED to `A ⋈ B` by appends `aDelta`/`bDelta`, computed
    * without recomputing the base join. Column layout matches the
    * plain `aAll.join(bAll, keys)` output. No broadcast HINT: a hint
    * is honored unconditionally (AQE never demotes it), so a large
    * increment would abort at the 8 GB broadcast limit instead of
    * degrading — the size-based threshold (and AQE's runtime
    * re-plan) already broadcasts the common small-increment shape
    * and falls back to a shuffle join for the rest.
    */
  def appendDelta(aBase: DataFrame, aDelta: DataFrame,
                  bBase: DataFrame, bDelta: DataFrame,
                  keys: Seq[String]): DataFrame =
    aDelta.join(bBase, keys)
      .unionByName(aBase.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))

  /** The oracle identity, for specs: base join ∪ delta must equal the
    * full join as a MULTISET. */
  def fullJoin(aBase: DataFrame, aDelta: DataFrame,
               bBase: DataFrame, bDelta: DataFrame,
               keys: Seq[String]): DataFrame =
    aBase.unionByName(aDelta).join(bBase.unionByName(bDelta), keys)
}
