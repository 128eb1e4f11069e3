package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact frequent-items ("heavy hitters") above a frequency threshold
  * n/k, via a distributed Misra–Gries candidate pass plus an exact
  * recount (reference behavior: pydala exposes no frequent-items
  * operator; this is part of the beyond-reference profiling stack
  * alongside [[Profile]]).
  *
  * Why not a plain groupBy-count: at 100 TB a full exact count
  * shuffles one record per DISTINCT key. When the key space is huge
  * (URLs, n-grams, user ids) and only the > n/k tail matters, the
  * Misra–Gries summary bounds the shuffle to k·partitions candidate
  * rows — each map task keeps at most k counters regardless of input
  * size, and the union of per-partition survivors is a SUPERSET of
  * every global heavy hitter (standard MG guarantee: an item with
  * global count > n/k cannot be decremented to zero in every
  * partition it appears in; deleting one occurrence of an absent item
  * costs k−1 other deletions, and a partition admits at most
  * n_p/k such rounds, so global decrements ≤ n/k < count).
  *
  * The exact recount then restores exactness: candidates are few
  * (≤ k·partitions), so they broadcast as a semi-join filter and the
  * recount aggregates only matching rows — map-side combined, tiny
  * shuffle. Output = exactly the items with count·k > n, with their
  * EXACT counts (the MG estimates are discarded — they exist only to
  * name candidates). No false negatives by the superset guarantee; no
  * false positives because the final filter uses exact counts.
  */
object HeavyHitters {

  /** All values of `keyCol` (cast to long) with count·k > total rows,
    * with exact counts, descending.
    *
    * @param k sensitivity: returns items strictly more frequent than
    *          n/k; per-task memory is O(k) counters
    */
  def frequentItems(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    // Persist the projected keys for the call: the lineage below the
    // projection (possibly a whole pipeline) would otherwise be
    // recomputed by BOTH scans, and the recount could see a different
    // partitioning than the candidate pass summarized. Two scans of
    // the persisted column is the exact-result minimum.
    val keys = df.select(col(keyCol).cast("long").as("k")).na.drop()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Single fused pass: Misra–Gries counters (at most k-1 survive)
      // AND the partition's row count as a tagged side row — the total
      // falls out of the same scan with exactly-once semantics (a
      // LongAccumulator would double-count on task retry).
      val summary = keys.select("k").as[Long].mapPartitions { it =>
        val counters = new java.util.HashMap[Long, Long]()
        var nRows = 0L
        it.foreach { key =>
          nRows += 1L
          val cur = counters.get(key)
          if (cur != 0L || counters.containsKey(key)) counters.put(key, cur + 1L)
          else if (counters.size < k - 1) counters.put(key, 1L)
          else {
            // decrement-all round: drop every counter by one, evict zeros
            val del = new java.util.ArrayList[Long]()
            val e = counters.entrySet().iterator()
            while (e.hasNext) {
              val en = e.next()
              if (en.getValue == 1L) del.add(en.getKey)
              else en.setValue(en.getValue - 1L)
            }
            del.forEach(counters.remove(_))
          }
        }
        import scala.jdk.CollectionConverters._
        Iterator((0, nRows)) ++
          counters.keySet().asScala.iterator.map(key => (1, key))
      }.toDF("tag", "v")
        // tiny: 1 count row + ≤ k-1 candidates per partition
        .collect()
      val total = summary.collect { case r if r.getInt(0) == 0 => r.getLong(1) }.sum
      val candidates = summary.collect { case r if r.getInt(0) == 1 => r.getLong(1) }
        .distinct.toSeq
      // exact recount of the candidate superset only: the semi join
      // broadcasts ≤ k·partitions keys, so the corpus never shuffles
      val out = keys
        .join(broadcast(candidates.toDF("k")), Seq("k"), "left_semi")
        .groupBy("k").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * k > total)
        .select(col("k").as(keyCol), col("cnt"))
        .orderBy(col("cnt").desc, col(keyCol))
      // the result is provably < k rows — materialize it eagerly so
      // the persisted keys can be released before returning (a lazy
      // return would either leak the cache or recompute the lineage)
      spark.createDataFrame(
        spark.sparkContext.parallelize(out.collect().toIndexedSeq, 1),
        out.schema)
    } finally keys.unpersist(blocking = false)
  }

  /** The naive exact definition — the spec's oracle, never the
    * production path at huge key cardinality. */
  def naiveFrequentItems(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val keys = df.select(col(keyCol).cast("long").as("k")).na.drop()
    val total = keys.count()
    keys.groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > total)
      .select(col("k").as(keyCol), col("cnt"))
      .orderBy(col("cnt").desc, col(keyCol))
  }
}
