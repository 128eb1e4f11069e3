package graft

import org.apache.spark.sql.functions._
import graft.operators.Delete
import graft.sources.ParquetDataset

/** Row-level DELETE WHERE: copy-on-write rewrites touch only files
  * containing matched rows; SQL null semantics (TRUE deletes, FALSE
  * and NULL survive).
  */
class DeleteSpec extends SparkSpecBase {

  import spark.implicits._

  test("deletes matching rows, rewrites only affected files") {
    val dir = tmpDir("del")
    val ds = new ParquetDataset(spark, dir)
    // two files with disjoint key ranges; the predicate hits only one
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((10L, "c"), (11L, "d")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    ds.updateStats()
    val before = ds.relFiles

    val res = Delete.where(ds, "k = 10")
    assert(res.deleted == 1)
    assert(res.rewrittenFiles.size == 1)
    assert(res.preservedFiles.size == 1)
    // the untouched file survives physically
    assert(ds.relFiles.intersect(before).toSet == res.preservedFiles.toSet)
    assert(ds.df.orderBy("k").select("k").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 11L))
    // sidecar reconciled with the rewrite
    assert(ds.stats.get.select("file_path").distinct().count() ==
      ds.relFiles.size)
  }

  test("NULL predicate rows survive (SQL delete semantics)") {
    val dir = tmpDir("delnull")
    val ds = new ParquetDataset(spark, dir)
    Seq((1L, Some("x")), (2L, None), (3L, Some("y")))
      .toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)

    val res = Delete.where(ds, "v = 'x'") // NULL v → predicate NULL → survives
    assert(res.deleted == 1)
    assert(ds.df.orderBy("k").select("k").collect().map(_.getLong(0)).toSeq ==
      Seq(2L, 3L))
  }

  test("staged swap hygiene: no tmp remnant, keep rows land exactly once") {
    val dir = tmpDir("delstage")
    val ds = new ParquetDataset(spark, dir)
    // hive-partitioned so the staged rewrite must preserve layout
    // through the tmp dir + promote
    Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "c", "p2"), (4L, "d", "p2"))
      .toDF("k", "v", "p").write.mode("append").partitionBy("p").parquet(dir)

    val res = Delete.where(ds, "k % 2 = 0")
    assert(res.deleted == 2)
    // the staging dir never survives a successful swap
    assert(!graft.sources.FsUtil.exists(s"$dir/_tmp_delete"))
    // every kept row exactly once — the pre-swap failure mode this
    // guards is a partial append duplicating keep rows
    assert(ds.df.select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L))
    assert(ds.partitionColumns == Seq("p"))
  }

  test("journal recovery completes an interrupted swap without duplication") {
    val dir = tmpDir("deljournal")
    val ds = new ParquetDataset(spark, dir)
    Seq((1L, "keep"), (2L, "drop")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((10L, "other")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    val affected = ds.relFiles.filterNot(_.isEmpty)
    // simulate a crash mid-swap: the keep rows are fully staged, the
    // journal lists the original affected file, but neither promote
    // nor original-delete ran
    val victim = {
      val byFile = spark.read.parquet(dir).withColumn("f", input_file_name())
        .filter(col("k") === 2L).select("f").head.getString(0)
      graft.sources.FsUtil.relativize(dir, graft.sources.FsUtil.stripScheme(byFile))
    }
    spark.read.parquet(s"$dir/${victim}").filter(col("k") =!= 2L)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_tmp_delete")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_graft_delete_journal"), victim + "\n")

    assert(Delete.recover(ds))
    // converged: original gone, staged keep rows present exactly once,
    // journal and tmp cleaned
    assert(!graft.sources.FsUtil.exists(s"$dir/_graft_delete_journal"))
    assert(!graft.sources.FsUtil.exists(s"$dir/_tmp_delete"))
    assert(ds.df.select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 10L))
    // idempotent: nothing pending on a second call
    assert(!Delete.recover(ds))
  }

  test("no matches: nothing rewritten, empty dataset no-op") {
    val dir = tmpDir("delnone")
    val ds = new ParquetDataset(spark, dir)
    assert(Delete.where(ds, "1 = 1").deleted == 0)
    Seq((1L, "a")).toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    val res = Delete.where(ds, "k = 99")
    assert(res.deleted == 0 && res.rewrittenFiles.isEmpty &&
      res.preservedFiles.size == 1)
    assert(ds.df.count() == 1)
  }

  test("retention: expired files drop via metadata; only straddlers rewrite") {
    val dir = tmpDir("ret")
    val ds = new ParquetDataset(spark, dir)
    def tsOf(us: Long) = new java.sql.Timestamp(us / 1000) // whole ms below
    // three files: fully expired [1s,2s], straddling [2s,4s], fully
    // live [4s,5s]; cutoff at 3s
    Seq((1L, tsOf(1000000000L)), (2L, tsOf(2000000000L))).toDF("k", "ts")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((3L, tsOf(2500000000L)), (4L, tsOf(4000000000L))).toDF("k", "ts")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((5L, tsOf(4500000000L)), (6L, tsOf(5000000000L))).toDF("k", "ts")
      .coalesce(1).write.mode("append").parquet(dir)
    ds.updateStats()

    val res = Delete.retention(ds, "ts", 3000000000L)
    assert(res.deleted == 3, res) // k=1,2 (whole file) + k=3 (straddler row)
    assert(res.droppedFiles.size == 1, res)
    assert(res.rewrittenFiles.size == 1, res)
    assert(res.droppedFiles.intersect(res.rewrittenFiles).isEmpty)
    assert(ds.df.select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(4L, 5L, 6L))
    // sidecar reconciled: metadata count serves the surviving rows
    assert(ds.count() == 3)
  }

  test("retention: NULL-ts rows survive even in a bounds-expired file") {
    val dir = tmpDir("retnull")
    val ds = new ParquetDataset(spark, dir)
    // one file: rows at 1s/2s plus a NULL ts; parquet stats exclude
    // nulls, so max=2s < cutoff — the null_count guard must route the
    // file to the row-level lane where the NULL row survives
    Seq((1L, Some(new java.sql.Timestamp(1000L))),
        (2L, Some(new java.sql.Timestamp(2000L))), (3L, None))
      .toDF("k", "ts").coalesce(1).write.mode("append").parquet(dir)
    ds.updateStats()
    val res = Delete.retention(ds, "ts", 3000000L)
    assert(res.droppedFiles.isEmpty, res)
    assert(res.deleted == 2, res)
    assert(ds.df.select("k").collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("retention: a live file absent from the sidecar routes to the row-level lane") {
    val dir = tmpDir("retcov")
    val ds = new ParquetDataset(spark, dir)
    def tsOf(us: Long) = new java.sql.Timestamp(us / 1000)
    // file A: fully live [4s,5s], covered by the sidecar
    Seq((1L, tsOf(4000000000L)), (2L, tsOf(5000000000L))).toDF("k", "ts")
      .coalesce(1).write.mode("append").parquet(dir)
    ds.updateStats()
    // file B appended AFTER the sidecar build: holds an expired row
    // the stats cannot see. Without the coverage guard the classifier
    // sees no dead file and no straddler, skips the row-level lane,
    // and k=3 silently survives while RetentionResult reports success.
    Seq((3L, tsOf(1000000000L)), (4L, tsOf(4500000000L))).toDF("k", "ts")
      .coalesce(1).write.mode("append").parquet(dir)
    val res = Delete.retention(ds, "ts", 3000000000L)
    assert(res.deleted == 1, res)
    assert(res.droppedFiles.isEmpty, res)
    assert(ds.df.select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 4L))
  }

  test("retention with no expired files is a pure no-op") {
    val dir = tmpDir("retnoop")
    val ds = new ParquetDataset(spark, dir)
    Seq((1L, new java.sql.Timestamp(9000000L))).toDF("k", "ts")
      .coalesce(1).write.mode("append").parquet(dir)
    ds.updateStats()
    val res = Delete.retention(ds, "ts", 1000L)
    assert(res.deleted == 0 && res.droppedFiles.isEmpty &&
      res.rewrittenFiles.isEmpty && res.preservedFiles.size == 1)
    assert(ds.df.count() == 1)
  }
}
