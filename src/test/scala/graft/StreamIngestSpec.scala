package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sources.{ParquetDataset, WriteConfig}
import graft.streaming.StreamIngest

/** Streaming ingestion lands micro-batches in the same managed layout
  * as batch writes, and upsert-mode dedups across batches.
  */
class StreamIngestSpec extends SparkSpecBase {

  import spark.implicits._

  test("append ingestion writes micro-batches through the pipeline") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("si")
    val mem = MemoryStream[(Int, String)]
    val q = StreamIngest.append(
      mem.toDF().toDF("id", "v"), dir,
      WriteConfig(), tmpDir("sick"))
    mem.addData((1, "a"), (2, "b"))
    q.processAllAvailable()
    mem.addData((3, "c"))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(dir).orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq == Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("upsert ingestion merges batches on the key") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("su")
    val mem = MemoryStream[(Int, String)]
    val q = StreamIngest.upsert(
      mem.toDF().toDF("id", "v"), dir, Seq("id"), tmpDir("suck"))
    mem.addData((1, "first"), (2, "b"))
    q.processAllAvailable()
    mem.addData((1, "updated"), (3, "c"))
    q.processAllAvailable()
    q.stop()
    val ds = new ParquetDataset(spark, dir)
    val out = ds.df.orderBy("id").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq == Seq((1, "updated"), (2, "b"), (3, "c")))
  }
}
