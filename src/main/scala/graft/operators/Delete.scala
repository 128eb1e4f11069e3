package graft.operators

import org.apache.spark.sql.functions._
import graft.sources.{FsUtil, ParquetDataset, WriteConfig, WritePipeline}

/** Result of a row-level delete — mirrors MergeResult's file
  * accounting.
  */
final case class DeleteResult(
    deleted: Long,
    rewrittenFiles: Seq[String],
    preservedFiles: Seq[String])

/** Result of a retention (TTL) delete: whole-file drops are separated
  * from row-level rewrites because they cost only metadata I/O.
  */
final case class RetentionResult(
    deleted: Long,
    droppedFiles: Seq[String],
    rewrittenFiles: Seq[String],
    preservedFiles: Seq[String])

/** Row-level DELETE WHERE with copy-on-write file rewrites — the
  * mutation the reference reaches via filter-scan + overwrite
  * (pydala/dataset.py delete_files is file-granular only); here rows
  * matching the predicate are removed and ONLY the files containing
  * them are rewritten, the merge machinery's discovery pattern.
  *
  * Null semantics are SQL DELETE's: a row is deleted when the
  * predicate is TRUE; FALSE and NULL rows survive.
  *
  * Failure contract (a plain filesystem has no multi-file atomic
  * rename, so the swap is journaled):
  *  - failure BEFORE the swap: tmp dir is removed, dataset unchanged;
  *  - failure DURING the swap (after the journal is written): the
  *    dataset may transiently hold kept rows twice, but the journal
  *    (`_graft_delete_journal`) records the staged files and the
  *    originals to remove, and the NEXT `Delete.where` (or an explicit
  *    [[Delete.recover]]) completes the swap deterministically —
  *    promote whatever is still staged, remove the listed originals,
  *    drop the journal. Replay is idempotent in every crash window
  *    because the journal is only written once the staged files are
  *    fully materialized, and recovery never re-derives anything from
  *    the (possibly half-swapped) data files.
  *
  * Scale notes: the discovery pass filters on the predicate, which
  * pushes down to parquet — files whose row-group stats exclude the
  * predicate are never decoded, so deleting a key range from a
  * key-sorted 100 TB dataset reads only the matching slab. The
  * rewrite reads exactly the affected files. No shuffle anywhere —
  * both passes are narrow scans.
  */
object Delete {

  private def journalPath(path: String) = s"$path/_graft_delete_journal"
  private def tmpPath(path: String) = s"$path/_tmp_delete"

  /** Complete a swap interrupted mid-flight, if a journal exists.
    * Safe to call any time; no-op without a journal. Returns true if
    * a pending swap was completed.
    */
  def recover(ds: ParquetDataset): Boolean = {
    val path = ds.path
    val jp = journalPath(path)
    if (!FsUtil.exists(jp)) return false
    val originals = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(FsUtil.stripScheme(jp)))
      .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty)
    // staged files still in tmp move into place (idempotent: promote
    // moves only what exists); then the journaled originals go
    if (FsUtil.exists(tmpPath(path))) FsUtil.promote(tmpPath(path), path)
    FsUtil.delete(path, originals.map(r => s"$path/$r"))
    FsUtil.delete(path, Seq(jp))
    ds.spark.catalog.refreshByPath(path)
    true
  }

  def where(ds: ParquetDataset, predicate: String): DeleteResult = {
    val spark = ds.spark
    val path = ds.path
    recover(ds) // complete any interrupted prior swap FIRST
    if (ds.isEmpty) return DeleteResult(0, Nil, Nil)

    val pred = expr(graft.sources.Sanitize(predicate))
    // resolve the target through the dataset's schema memo: the bare
    // spark.read.parquet here paid a footer-inference job per delete
    val tgt0 = ds.df
    val tgtF = tgt0.withColumn("__file", input_file_name())
    // the discovery pass traverses exactly the pred-TRUE rows, which
    // ARE the deleted rows — observe the count here instead of paying
    // two more count jobs (affected total minus kept) later
    val delObs = org.apache.spark.sql.Observation()
    val affectedAbs = tgtF.filter(pred)
      .observe(delObs, count(lit(1)).as("n"))
      .select("__file").distinct()
      .collect().map(r => FsUtil.stripScheme(r.getString(0)))
    // a missing metric means the optimizer eliminated the observed
    // subtree as provably empty (empty-relation propagation) — which
    // can only happen when zero rows matched (bounded wait — see
    // ObservedCount)
    val deleted = ObservedCount(delObs)
    val affectedRel = affectedAbs.map(f => FsUtil.relativize(path, f)).sorted.toSeq
    val preserved = ds.relFiles.filterNot(affectedRel.contains)
    if (affectedRel.isEmpty) return DeleteResult(0, Nil, preserved)

    // single traversal: the staged rewrite below is the only consumer
    // of the affected slab, so there is nothing left to cache for
    val affected = spark.read.option("basePath", path)
      .schema(tgt0.schema)
      .parquet(affectedAbs.toIndexedSeq: _*)
    try {
      // TRUE deletes; FALSE and NULL survive
      val keep = affected.filter(!coalesce(pred, lit(false)))
      // Staged rewrite (Maintenance's failure contract): surviving
      // rows land in a tmp dir first, so a mid-write failure leaves
      // the original files — and therefore every row — untouched. A
      // direct append would commit part-files before the originals
      // are removed, double-counting kept rows on failure.
      val tmp = tmpPath(path)
      FsUtil.deleteRecursively(tmp)
      try WritePipeline.write(keep, tmp,
        WriteConfig(mode = "overwrite", partitionBy = ds.partitionColumns))
      catch {
        case e: Exception =>
          FsUtil.deleteRecursively(tmp)
          throw new graft.operators.StagedRewriteException(affectedRel,
            s"staged delete failed before swap; dataset unchanged: ${e.getMessage}", e)
      }
      // Journal THEN swap: the journal lists the originals to remove,
      // and is only written once the staged files are complete — so a
      // crash anywhere in the swap is completed by recover() (promote
      // the remaining staged files, remove the journaled originals).
      // Without the journal, a re-run after a partial swap would
      // re-stage kept rows from the originals and promote them NEXT TO
      // the first run's promoted files — permanent duplication.
      java.nio.file.Files.write(
        java.nio.file.Paths.get(FsUtil.stripScheme(journalPath(path))),
        (affectedRel.mkString("\n") + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      try {
        FsUtil.promote(tmp, path)
        FsUtil.delete(path, affectedAbs.toIndexedSeq)
        FsUtil.delete(path, Seq(journalPath(path)))
      } catch {
        case e: Exception =>
          throw new graft.operators.StagedRewriteException(affectedRel,
            "staged delete failed DURING swap; journal retained — the next " +
              s"Delete.where or Delete.recover completes it: ${e.getMessage}", e)
      }
      spark.catalog.refreshByPath(path)
      // the rewrite can shrink the unified schema (e.g. the only file
      // carrying an evolved column was fully deleted)
      ds.refreshSchema()
      if (ds.stats.nonEmpty) ds.updateStats()
      DeleteResult(deleted, affectedRel, preserved)
    } finally ()
  }

  /** Retention (TTL) delete: remove every row whose `tsCol` is
    * strictly below `cutoffMicros`, deciding per FILE from the stats
    * sidecar's exact integer bounds:
    *
    *  - `max < cutoff` → the file is expired whole and dropped with a
    *    metadata-only delete — never decoded, never rewritten;
    *  - `min ≥ cutoff` → untouched (and the row-level pass's pushdown
    *    never decodes it either);
    *  - straddling (or bounds missing — conservative) → the journaled
    *    row-level [[where]] rewrites just those files.
    *
    * On a ts-sorted or date-partitioned 100 TB dataset almost every
    * expired byte leaves via the metadata-only lane: the daily
    * retention job costs one sidecar scan plus at most one straddling
    * file rewrite per partition — this is why retention is not just
    * `DELETE WHERE ts < cutoff`.
    */
  def retention(ds: ParquetDataset, tsCol: String,
                cutoffMicros: Long): RetentionResult = {
    // a prior interrupted swap leaves the sidecar stale — complete it
    // and refresh BEFORE classifying from those stats (where()'s own
    // "recover FIRST" discipline), or the metadata lane would drop
    // files whose kept rows were already promoted and double-count
    if (recover(ds)) ds.updateStats()
    val s = ds.stats.getOrElse(throw new IllegalStateException(
      "retention needs the stats sidecar — call updateStats() first"))
    // one row per (file, row_group) after the column filter, so the
    // sums are file totals and min/max the file's exact bounds
    val perFile = s
      .filter(col("column") === tsCol && col("typ") === "timestamp")
      .groupBy("file_path")
      .agg(min("min_int").as("lo"), max("max_int").as("hi"),
        sum("rg_num_rows").as("rows"), sum("null_count").as("nulls"),
        count(lit(1)).as("groups"), count("max_int").as("bounded"))
      .collect()
    // metadata lane only when the stats PROVE every row is expired:
    // all row groups carry bounds, max < cutoff, and zero nulls (a
    // NULL ts never matches the predicate, so NULL rows must survive
    // exactly as they do in the row-level lane)
    val dead = perFile.filter { r => // file_path, lo, hi, rows, nulls, groups, bounded
      !r.isNullAt(2) && r.getLong(2) < cutoffMicros &&
        r.getLong(4) == 0L && r.getLong(6) == r.getLong(5)
    }
    val deadSet = dead.map(_.getString(0)).toSet
    val deadFiles = deadSet.toSeq.sorted
    val deadRows = dead.map(_.getLong(3)).sum
    if (deadFiles.nonEmpty) ds.deleteFiles(deadFiles)
    // the row-level lane runs only if some surviving file CAN hold an
    // expired row (lo < cutoff, or bounds unknown — conservative);
    // otherwise the daily retention job is the sidecar scan alone.
    // Coverage guard: a live file with NO sidecar row for (tsCol,
    // timestamp) — schema-evolved file missing the column, or the
    // column stored under another typ — is invisible to perFile, so
    // it must be routed through the row-level lane rather than
    // silently kept with its expired rows intact.
    val covered = perFile.map(_.getString(0)).toSet
    val uncovered = ds.relFiles.exists(f => !covered.contains(f))
    val straddler = uncovered ||
      perFile.exists(r => !deadSet.contains(r.getString(0)) &&
        (r.isNullAt(1) || r.getLong(1) < cutoffMicros ||
          r.getLong(6) != r.getLong(5)))
    val res =
      if (straddler) where(ds, s"$tsCol < timestamp_micros(${cutoffMicros}L)")
      else DeleteResult(0, Nil, ds.relFiles)
    RetentionResult(deadRows + res.deleted, deadFiles,
      res.rewrittenFiles, res.preservedFiles)
  }
}
