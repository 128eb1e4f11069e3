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

/** Row-level DELETE WHERE with copy-on-write file rewrites — the
  * mutation the reference reaches via filter-scan + overwrite
  * (pydala/dataset.py delete_files is file-granular only); here rows
  * matching the predicate are removed and ONLY the files containing
  * them are rewritten, the merge machinery's discovery pattern.
  *
  * Null semantics are SQL DELETE's: a row is deleted when the
  * predicate is TRUE; FALSE and NULL rows survive.
  *
  * Scale notes: the discovery pass filters on the predicate, which
  * pushes down to parquet — files whose row-group stats exclude the
  * predicate are never decoded, so deleting a key range from a
  * key-sorted 100 TB dataset reads only the matching slab. The
  * rewrite reads exactly the affected files. No shuffle anywhere —
  * both passes are narrow scans.
  */
object Delete {

  def where(ds: ParquetDataset, predicate: String): DeleteResult = {
    val spark = ds.spark
    val path = ds.path
    if (ds.isEmpty) return DeleteResult(0, Nil, Nil)

    val pred = expr(graft.sources.Sanitize(predicate))
    val tgtF = spark.read.parquet(path).withColumn("__file", input_file_name())
    val affectedAbs = tgtF.filter(pred)
      .select("__file").distinct()
      .collect().map(r => FsUtil.stripScheme(r.getString(0)))
    val affectedRel = affectedAbs.map(f => FsUtil.relativize(path, f)).sorted.toSeq
    val preserved = ds.relFiles.filterNot(affectedRel.contains)
    if (affectedRel.isEmpty) return DeleteResult(0, Nil, preserved)

    // cache the affected slab: the two counts and the rewrite all
    // traverse it (the Merge intermediates pattern)
    val affected = spark.read.option("basePath", path)
      .parquet(affectedAbs.toIndexedSeq: _*).cache()
    try {
      // TRUE deletes; FALSE and NULL survive
      val keep = affected.filter(!coalesce(pred, lit(false)))
      val deleted = affected.count() - keep.count()
      // Staged rewrite (Maintenance's failure contract): surviving
      // rows land in a tmp dir first, so a mid-write failure leaves
      // the original files — and therefore every row — untouched. A
      // direct append would commit part-files before the originals
      // are removed, double-counting kept rows on failure.
      //
      // Contract boundary: "dataset unchanged" holds for failures up
      // to the swap below. The promote+delete swap itself is
      // best-effort (same as Maintenance's compact swap — a plain
      // filesystem has no multi-file atomic rename): a crash between
      // promote and delete leaves kept rows present twice until the
      // delete of the originals completes. A swap-phase failure
      // raises StagedRewriteException with partialSwap semantics so
      // callers can re-run the delete (it is idempotent: re-running
      // the same predicate removes the stale originals' rows again).
      val tmp = s"$path/_tmp_delete"
      FsUtil.deleteRecursively(tmp)
      try WritePipeline.write(keep, tmp,
        WriteConfig(mode = "overwrite", partitionBy = ds.partitionColumns))
      catch {
        case e: Exception =>
          FsUtil.deleteRecursively(tmp)
          throw new graft.operators.StagedRewriteException(affectedRel,
            s"staged delete failed before swap; dataset unchanged: ${e.getMessage}", e)
      }
      try {
        FsUtil.promote(tmp, path)
        FsUtil.delete(path, affectedAbs.toIndexedSeq)
      } catch {
        case e: Exception =>
          throw new graft.operators.StagedRewriteException(affectedRel,
            "staged delete failed DURING swap; kept rows may be present twice " +
              s"(promoted files + unremoved originals) — re-run to converge: ${e.getMessage}", e)
      }
      spark.catalog.refreshByPath(path)
      if (ds.stats.nonEmpty) ds.updateStats()
      DeleteResult(deleted, affectedRel, preserved)
    } finally { affected.unpersist(); () }
  }
}
