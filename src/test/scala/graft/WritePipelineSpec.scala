package graft

import org.apache.spark.sql.functions._
import graft.sources._

/** Pins the prepare/write contract (reference pydala/io.py:381-437,
  * tests/test_writer_prepare.py).
  */
class WritePipelineSpec extends SparkSpecBase {

  import spark.implicits._

  test("sort spec parsing") {
    assert(SortKey.parse("a desc, b") == Seq(SortKey("a", desc = true), SortKey("b")))
    assert(SortKey.parse("a") == Seq(SortKey("a")))
  }

  test("prepare: sort then first-occurrence-wins dedup") {
    val df = Seq((2, "b"), (1, "first"), (1, "dup"), (3, "c")).toDF("k", "v")
    val out = WritePipeline.prepare(df,
      WriteConfig(sortBy = Seq(SortKey("k")), unique = UniqueOn(Seq("k"))))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out == Seq((1, "first"), (2, "b"), (3, "c")))
  }

  test("prepare: dateparts derive from the timestamp column") {
    val df = Seq(Tuple1(java.sql.Timestamp.valueOf("2024-03-05 10:30:00")))
      .toDF("ts")
    val out = WritePipeline.prepare(df, WriteConfig(
      datepartsFrom = Some("ts"), dateparts = Seq("year", "month", "day")))
      .collect()(0)
    assert(out.getInt(1) == 2024 && out.getInt(2) == 3 && out.getInt(3) == 5)
  }

  test("write: hive partitioning + maxRowsPerFile + append/overwrite") {
    val dir = tmpDir("wp")
    val df = (1 to 100).map(i => (i, if (i % 2 == 0) "even" else "odd")).toDF("id", "cat")
    WritePipeline.write(df, dir, WriteConfig(
      partitionBy = Seq("cat"), maxRowsPerFile = 20))
    val files = FsUtil.listParquet(dir)
    assert(files.forall(f => f.contains("cat=even") || f.contains("cat=odd")))
    assert(files.size >= 6) // 50 rows per partition / 20 per file → ≥3 each
    val back = spark.read.parquet(dir)
    assert(back.count() == 100)
    assert(back.columns.toSet == Set("id", "cat"))

    // append adds
    WritePipeline.write(df, dir, WriteConfig(partitionBy = Seq("cat")))
    assert(spark.read.parquet(dir).count() == 200)

    // overwrite replaces (write-new-then-delete-old)
    WritePipeline.write(df.limit(10), dir,
      WriteConfig(mode = "overwrite", partitionBy = Seq("cat")))
    assert(spark.read.parquet(dir).count() == 10)
  }

  test("bloomFilterCols stamps per-row-group bloom filters in the footer") {
    val dir = tmpDir("bloom")
    WritePipeline.write(
      (1L to 500L).map(i => (i, s"v$i")).toDF("k", "v"),
      dir, WriteConfig(bloomFilterCols = Seq("k")))
    val ks = StatsSidecar.bloomFilterOffsets(spark, dir, "k")
    val vs = StatsSidecar.bloomFilterOffsets(spark, dir, "v")
    assert(ks.nonEmpty && ks.forall(_ >= 0), s"bloom missing on configured column: $ks")
    assert(vs.nonEmpty && vs.forall(_ < 0), s"bloom stamped on unconfigured column: $vs")
  }

  test("writeAll treats a list of sources per-item") {
    val dir = tmpDir("wpall")
    WritePipeline.writeAll(
      Seq(Seq((1, "a")).toDF("id", "v"), Seq((2, "b")).toDF("id", "v")),
      dir, WriteConfig())
    assert(spark.read.parquet(dir).count() == 2)
    // per-item batches → at least one file per element
    assert(graft.sources.FsUtil.listParquet(dir).size >= 2)
    // overwrite applies to the LIST: first element replaces, rest append
    WritePipeline.writeAll(
      Seq(Seq((7, "x")).toDF("id", "v"), Seq((8, "y")).toDF("id", "v")),
      dir, WriteConfig(mode = "overwrite"))
    val ids = spark.read.parquet(dir).collect().map(_.getInt(0)).sorted
    assert(ids.toSeq == Seq(7, 8))
  }

  test("deleteFiles rejects traversal and absolute paths") {
    val dir = tmpDir("wpguard")
    Seq((1, "a")).toDF("id", "v").write.mode("overwrite").parquet(dir)
    val ds = new graft.sources.ParquetDataset(spark, dir)
    intercept[IllegalArgumentException](ds.deleteFiles(Seq("../escape.parquet")))
    intercept[IllegalArgumentException](ds.deleteFiles(Seq("/etc/passwd")))
    assert(ds.df.count() == 1) // nothing was deleted
  }
}
