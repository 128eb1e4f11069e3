package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.SchemaOps
import graft.sources.{FsUtil, ParquetDataset, WriteConfig, WritePipeline}

/** Result of a keyed merge — same fields as the reference's
  * MergeResult (pydala/dataset.py:1671-1684).
  */
final case class MergeResult(
    sourceCount: Long,
    inserted: Long,
    updated: Long,
    rewrittenFiles: Seq[String],
    insertedFiles: Seq[String],
    preservedFiles: Seq[String])

/** Mid-swap merge failure. DIVERGES from the reference error it is
  * named after, deliberately: the reference's PartialMergeError
  * (pydala/io.py:41-64, tests/test_dataset_merge.py:705-757) fires
  * AFTER the merge physically succeeded, when only the metadata
  * refresh fails, and carries the successful MergeResult. This engine
  * has no post-merge refresh step that can fail independently (the
  * sidecar update is part of the same call), so the error instead
  * covers the failure mode this engine DOES have — a mid-PROMOTE
  * physical failure — and carries file-level recovery payload:
  * partial results are preserved on disk, managed metadata is NOT
  * refreshed, originals are untouched (the swap promotes strictly
  * before deleting), `promoted` lists rewrite files that landed in
  * the dataset and `remaining` those still staged under `_tmp_merge`.
  * The post-promote cleanup half of the swap has its own sibling
  * contract, [[MergeCleanupError]].
  */
final class PartialMergeError(
    val affectedFiles: Seq[String],
    val promoted: Seq[String],
    val remaining: Seq[String],
    cause: Throwable)
  extends RuntimeException(
    s"merge swap failed after ${promoted.size} rewrite file(s) landed; " +
      s"${remaining.size} still staged; originals untouched", cause)

/** Post-promote cleanup failure — the other half of the swap
  * (round-10, advisor finding): every rewrite file landed, so the
  * merge's DATA is durable and complete, but deleting the superseded
  * originals failed partway. Until `remainingOriginals` are removed,
  * their rows are visible TWICE (original + rewrite) — never lost or
  * torn. `result` reflects the completed UPDATE phase (mirroring the
  * reference's succeeded-but-unclean payload shape; the
  * insert-remainder phase is not attempted after a failed cleanup, so
  * `result.inserted` is 0); operators finish cleanup by deleting
  * `remainingOriginals`, refreshing stats, and re-running the merge
  * (idempotent: the rewritten keys now match and rewrite in place).
  */
final class MergeCleanupError(
    val result: MergeResult,
    val remainingOriginals: Seq[String],
    cause: Throwable)
  extends RuntimeException(
    s"merge promote succeeded but ${remainingOriginals.size} superseded " +
      s"original file(s) could not be deleted; their rows are duplicated " +
      s"until cleanup", cause)

/** Keyed merge (insert / update / upsert) with copy-on-write file
  * rewrites — reference pydala/dataset.py:1549-1777 and the contract
  * pinned by tests/test_dataset_merge.py:
  *
  *  - null-safe key equality (`<=>`);
  *  - duplicate source keys → last row wins;
  *  - omitted keys → every column common to source and target
  *    (whole-row identity);
  *  - update rewrites ONLY the files containing matched rows;
  *  - an update that would change a partition value is rejected.
  *
  * Scale notes: the only shuffles are the key joins; matched-file
  * discovery rides on `input_file_name()` so no extra pass over the
  * target is needed; unmatched files are never read past their footer
  * (semi-join probes push the key filter down).
  *
  * Source-reads-target rule (round-11, found by the q546 gate): a
  * `source` whose LINEAGE reads this same dataset (incremental index
  * maintenance — new values computed from current values) must be
  * materialized by the caller first (`localCheckpoint(true)` or a
  * staging write). The swap's `refreshByPath` invalidates cached
  * plans that depend on the target path, so a merely-cached source
  * would silently recompute against the half-updated dataset in the
  * insert-remainder phase and double-apply its own delta.
  */
object Merge {

  def apply(ds: ParquetDataset, source: DataFrame, keys: Seq[String],
            strategy: String): MergeResult = {
    require(Seq("insert", "update", "upsert").contains(strategy),
      s"unknown merge strategy: $strategy")
    val spark = ds.spark
    val partCols = ds.partitionColumns

    // empty target: everything inserts
    if (ds.isEmpty) {
      val src = dedupLastWins(source, effectiveKeys(source.columns.toSeq, source.columns.toSeq, keys))
      if (strategy == "update")
        return MergeResult(src.count(), 0, 0, Nil, Nil, Nil)
      val before = ds.relFiles.toSet
      // one counted pass: the write's observed row count IS the source
      // count (post-dedup), so no separate count job re-scans the source
      val obs = org.apache.spark.sql.Observation()
      ds.write(src.observe(obs, count(lit(1)).as("n")),
        WriteConfig(mode = "append", partitionBy = partCols))
      // missing metric ⇒ the observed subtree was optimized away as
      // provably empty ⇒ zero rows (bounded wait — see ObservedCount)
      val n = ObservedCount(obs)
      val after = ds.relFiles
      return MergeResult(n, n, 0, Nil,
        after.filterNot(before.contains), Nil)
    }

    // resolve the target ONCE: every spark.read.parquet pays a driver
    // footer-inference job, and a merge needs the same schema in four
    // places (key resolution, range-bounded probe, affected-file read,
    // insert-remainder read)
    val tgt0 = ds.df
    val ks = effectiveKeys(source.columns.toSeq, tgt0.columns.toSeq, keys)
    require(ks.nonEmpty, "no common key columns between source and target")
    val src = dedupLastWins(source, ks).cache()

    try strategy match {
      case "insert" => doInsert(ds, src, ks, partCols, tgt0)
      case "update" => doUpdate(ds, src, ks, partCols, insertRemainder = false, tgt0)
      case "upsert" => doUpdate(ds, src, ks, partCols, insertRemainder = true, tgt0)
    } finally {
      // a long-lived session runs many merges — don't let per-merge
      // caches accumulate executor memory
      src.unpersist()
    }
  }

  /** Multi-source form: a list of sources is ONE logical batch
    * (reference pydala/dataset.py:1636-1639) — relaxed union-by-name
    * first, then a single merge, so last-row-wins dedup sees the later
    * list elements as later rows.
    */
  def apply(ds: ParquetDataset, sources: Seq[DataFrame], keys: Seq[String],
            strategy: String): MergeResult = {
    require(sources.nonEmpty, "merge needs at least one source")
    apply(ds, sources.reduce(_.unionByName(_, allowMissingColumns = true)),
      keys, strategy)
  }

  /** Omitted keys ⇒ all columns common to source and target
    * (pydala/dataset.py:1729-1744).
    */
  private def effectiveKeys(srcCols: Seq[String], tgtCols: Seq[String],
                            keys: Seq[String]): Seq[String] =
    if (keys.nonEmpty) keys else srcCols.filter(tgtCols.contains)

  /** Duplicate source keys → last row wins, in source row order
    * (pydala/dataset.py last-row-wins; tests/test_dataset_merge.py:429).
    * The order id is captured before any shuffle.
    */
  private[operators] def dedupLastWins(source: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__ord").desc)
    source.withColumn("__ord", monotonically_increasing_id())
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__ord", "__rn")
  }

  /** The reference's delta pre-filter (_get_delta_other_df,
    * pydala/dataset.py:808-863): bound the target's key read with
    * `key BETWEEN src.min AND src.max OR key IS NULL` range predicates
    * from the source — at scale this prunes target row groups before
    * the anti-join probe even runs (the ranges push down to parquet).
    * The same aggregate pass also carries `count(1)` — the merge needs
    * the post-dedup source count anyway (MergeResult), and folding it
    * here removes a whole extra pass over the source.
    */
  private def keyBounds(src: DataFrame, ks: Seq[String])
      : (org.apache.spark.sql.Row, Long) = {
    val aggs = count(lit(1)).as("__n") +:
      ks.flatMap(k => Seq(min(col(k)).as(s"__mn_$k"), max(col(k)).as(s"__mx_$k")))
    val row = src.agg(aggs.head, aggs.tail: _*).collect()(0)
    (row, row.getLong(0))
  }

  /** Bound a target read by the source's key min/max — rows outside
    * the range can never match a source key (null keys keep the
    * isNull arm for `<=>` matches), so every merge-side target scan
    * is safe to range-restrict and the predicates push down to
    * parquet row groups. `row` is the [[keyBounds]] row (count first,
    * then min/max pairs).
    */
  private def rangeBound(tgt: DataFrame, ks: Seq[String],
                         row: org.apache.spark.sql.Row): DataFrame =
    ks.zipWithIndex.foldLeft(tgt) { case (t, (k, i)) =>
      val (mn, mx) = (row.get(1 + 2 * i), row.get(2 + 2 * i))
      if (mn == null || mx == null) t
      else t.filter(col(k).isNull || col(k).between(lit(mn), lit(mx)))
    }

  private def doInsert(ds: ParquetDataset, src: DataFrame,
                       ks: Seq[String], partCols: Seq[String],
                       tgt0: DataFrame): MergeResult = {
    // rename target keys so the join condition is unambiguous; the
    // target read is range-bounded by the source's key min/max
    val (bounds, srcCount) = keyBounds(src, ks)
    val tgtKeys = rangeBound(tgt0, ks, bounds)
      .select(ks.map(k => col(k).as(s"__t_$k")): _*).distinct()
    val cond = ks.map(k => col(k) <=> col(s"__t_$k")).reduce(_ && _)
    val newRows = src.join(tgtKeys, cond, "left_anti")
    val before = ds.relFiles.toSet
    val inserted =
      stagedObservedAppend(ds, SchemaOps.align(newRows, tgt0.schema), partCols)
    val after = ds.relFiles
    MergeResult(srcCount, inserted, 0, Nil,
      after.filterNot(before.contains), before.toSeq.sorted)
  }

  /** Append `data` through a staged observed write (round-12, verdict
    * #5): ONE traversal of the anti-join remainder yields both the
    * inserted-row count and the files — the old shape paid a
    * cache + count() + write (two jobs over the remainder). Zero rows
    * ⇒ the staging dir is dropped and nothing is promoted (a direct
    * empty append could land empty part-files in `relFiles`
    * bookkeeping). A promote failure surfaces as [[PartialMergeError]]
    * with no affected originals — the insert phase rewrites nothing,
    * so originals are untouched by construction and `remaining` lists
    * the still-staged insert files.
    */
  private def stagedObservedAppend(ds: ParquetDataset, data: DataFrame,
                                   partCols: Seq[String],
                                   refreshStats: Boolean = true): Long = {
    val obs = org.apache.spark.sql.Observation()
    val tmp = s"${ds.path}/_tmp_merge_ins"
    FsUtil.deleteRecursively(tmp)
    // count-preserving by construction: the insert config runs no
    // dedup/unique stage, so the observed input count IS the written
    // row count
    WritePipeline.write(data.observe(obs, count(lit(1)).as("n")), tmp,
      WriteConfig(mode = "append", partitionBy = partCols))
    val n = ObservedCount(obs)
    if (n > 0) {
      try FsUtil.promote(tmp, ds.path)
      catch { case e: FsUtil.PromoteFailedException =>
        throw new PartialMergeError(Nil, e.promoted, e.remaining, e)
      }
      ds.spark.catalog.refreshByPath(ds.path)
      ds.refreshSchema()
      if (refreshStats && ds.stats.nonEmpty) ds.updateStats()
    } else FsUtil.deleteRecursively(tmp)
    n
  }

  private def doUpdate(ds: ParquetDataset, src: DataFrame,
                       ks: Seq[String], partCols: Seq[String],
                       insertRemainder: Boolean,
                       tgt0: DataFrame): MergeResult = {
    val spark = ds.spark
    val path = ds.path
    // every target-side scan below is range-bounded by the source's
    // key min/max (the reference's delta pre-filter) — the predicates
    // push down to parquet, so target row groups outside the update's
    // key range are never decoded
    val (bounds, srcCount) = keyBounds(src, ks)
    val target = tgt0
    val tgtF = rangeBound(target, ks, bounds).withColumn("__file", input_file_name())

    val joinKeysOnly = src.select(ks.map(k => col(k).as(s"__k_$k")): _*).distinct()
    def keyCond(t: DataFrame): Column =
      ks.map(k => t(k) <=> col(s"__k_$k")).reduce(_ && _)

    // ONE bounded pass over the target yields both the matched-file
    // set (only these are rewritten) and the partition-change
    // rejection (tests/test_dataset_merge.py:400-427: a source row's
    // partition value must equal the matched target row's). Keys are
    // unique after dedupLastWins, so the inner join cannot multiply.
    val srcPartCols = partCols.filter(src.columns.contains)
    val srcProj = src.select(ks.map(k => col(k).as(s"__k_$k")) ++
      srcPartCols.map(p => col(p).as(s"__p_$p")): _*)
    val violFlag: Column =
      if (srcPartCols.isEmpty) lit(0)
      else srcPartCols.map(p => !(col(p) <=> col(s"__p_$p")))
        .reduce(_ || _).cast("int")
    val perFile = tgtF.join(srcProj, keyCond(tgtF), "inner")
      .groupBy("__file").agg(max(violFlag).as("__viol"))
      .collect()
    if (perFile.exists(_.getInt(1) > 0))
      throw new IllegalArgumentException(
        "merge update would change a partition value; rewrite rejected")
    val affectedAbs = perFile.map(r => FsUtil.stripScheme(r.getString(0)))
    val affectedRel = affectedAbs.map(f => FsUtil.relativize(path, f)).sorted.toSeq

    val allRel = ds.relFiles
    val preserved = allRel.filterNot(affectedRel.contains)

    var updated = 0L
    var insertedCount = 0L
    val beforeAll = allRel.toSet

    if (affectedRel.nonEmpty) {
      // explicit schema: the affected files are a subset of the target
      // just resolved, so re-inferring their footers is a pure extra
      // driver job (partition columns ride in via basePath + the
      // provided schema, exactly as inference would place them)
      val affected = spark.read.option("basePath", path)
        .schema(target.schema)
        .parquet(affectedAbs.toIndexedSeq: _*)
      // rows whose key is NOT being updated survive as-is
      val keep = affected.join(joinKeysOnly, keyCond(affected), "left_anti")
      // matched source rows, aligned to the target schema; `updated` is
      // harvested from an observed metric on the staged write below —
      // a separate count() would re-run the whole semi-join as its own
      // job just to throw the rows away
      val updObs = org.apache.spark.sql.Observation()
      val matchedSrc = src.join(
        affected.select(ks.map(col): _*).distinct().select(
          ks.map(k => col(k).as(s"__k_$k")): _*),
        ks.map(k => col(k) <=> col(s"__k_$k")).reduce(_ && _), "left_semi")
        .observe(updObs, count(lit(1)).as("n"))
      val newData = SchemaOps.align(keep, target.schema)
        .unionByName(SchemaOps.align(matchedSrc, target.schema))
      // Staged copy-on-write swap (round-9): the rewrite lands in a
      // `_`-prefixed staging dir (invisible to listings and scans),
      // then promotes file-by-file through the SAME rename-degraded /
      // chaos-hooked path as compaction, and ONLY then are the
      // originals deleted — so a mid-swap failure can duplicate
      // visibility of rewritten rows but never lose or tear a row,
      // and managed metadata is never refreshed on failure.
      val tmp = s"$path/_tmp_merge"
      FsUtil.deleteRecursively(tmp)
      WritePipeline.write(newData, tmp,
        WriteConfig(mode = "append", partitionBy = partCols))
      updated = ObservedCount(updObs)
      try FsUtil.promote(tmp, path)
      catch { case e: FsUtil.PromoteFailedException =>
        throw new PartialMergeError(affectedRel, e.promoted, e.remaining, e)
      }
      // the cleanup half of the swap carries its own recovery contract
      // (round-10): after a successful promote the rewrite is durable,
      // so a failed original-delete must surface the not-yet-deleted
      // paths — silently returning would leave rows durably duplicated
      // with no payload for operator cleanup. The payload inputs are
      // computed BEFORE the delete (round-11, advisor): if the same FS
      // fault that broke the delete also broke a fresh count/listing,
      // a payload built inside the catch would mask the cleanup error
      // with a secondary exception and lose the recovery details.
      val sourceCount = srcCount // from the keyBounds pass — no extra job
      val insertedRel = ds.relFiles.filterNot(beforeAll.contains)
      try FsUtil.delete(path, affectedAbs.toIndexedSeq)
      catch { case e: Throwable =>
        // best-effort narrowing: existence probes touch the same FS
        // that just failed, so fall back to "all originals remain"
        // (conservative — over-reporting duplicates is safe, the
        // cleanup delete is idempotent) rather than mask the error
        val remainingOriginals =
          try affectedAbs.filter(FsUtil.exists)
            .map(f => FsUtil.relativize(path, f)).sorted.toSeq
          catch { case _: Throwable => affectedRel }
        throw new MergeCleanupError(
          MergeResult(sourceCount, 0L, updated, affectedRel,
            insertedRel, preserved),
          remainingOriginals, e)
      }
      // invalidate the cached listing: the files just deleted must not
      // be served to the insert-remainder read below
      spark.catalog.refreshByPath(path)
      ds.refreshSchema() // the memoized schema pre-dates the swap
    }

    if (insertRemainder) {
      // bounded too: target keys outside the source's range can never
      // anti-match a source row (explicit schema: the post-promote
      // files were all aligned to the target schema, so re-inference
      // would be an extra driver job returning the same answer)
      val tgtKeys = rangeBound(
        spark.read.schema(target.schema).parquet(path), ks, bounds)
        .select(ks.map(k => col(k).as(s"__t_$k")): _*).distinct()
      val cond = ks.map(k => col(k) <=> col(s"__t_$k")).reduce(_ && _)
      val newRows = src.join(tgtKeys, cond, "left_anti")
      // one traversal: observed staged append (see stagedObservedAppend)
      // instead of the old cache + count() + write pair; the tail below
      // owns the sidecar refresh, as it always has
      insertedCount = stagedObservedAppend(ds,
        SchemaOps.align(newRows, target.schema), partCols,
        refreshStats = false)
    }

    if (ds.stats.nonEmpty) ds.updateStats()
    val afterAll = ds.relFiles
    MergeResult(srcCount, insertedCount, updated,
      affectedRel, afterAll.filterNot(beforeAll.contains), preserved)
  }
}
