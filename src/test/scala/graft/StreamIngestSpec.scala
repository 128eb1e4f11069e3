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

  test("watermarked tumbling-window aggregation over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = StreamIngest.windowedAgg(
      mem.toDF().toDF("ts", "k", "v"), "ts", "k", "v", "10 minutes", "1 hour")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("winagg").start()
    mem.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), "a", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "a", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-01 10:11:00"), "a", 4.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
      "SELECT k, n_events, total_value FROM winagg ORDER BY window.start")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(("a", 2L, 3.0), ("a", 1L, 4.0)))
  }

  test("stateful per-key totals accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamIngest.{KeyedEvent, KeyedTotals}
    val mem = MemoryStream[KeyedEvent]
    val out = StreamIngest.statefulTotals(mem.toDS())
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("statefulx").start()
    mem.addData(KeyedEvent(1, 2.0), KeyedEvent(1, 3.0), KeyedEvent(2, 1.0))
    q.processAllAvailable()
    mem.addData(KeyedEvent(1, 5.0))
    q.processAllAvailable()
    q.stop()
    // last update per key reflects the running totals across batches
    val last = spark.sql(
      """SELECT key, n, total FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY key ORDER BY n DESC) rk
        |  FROM statefulx) WHERE rk = 1""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(last == Set((1L, 3L, 10.0), (2L, 1L, 1.0)))
  }

  test("streaming dedup drops repeated digests within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val out = StreamIngest.dedupedStream(
      mem.toDF().toDF("ts", "digest"), "ts", Seq("digest"), "1 hour")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedupstream").start()
    mem.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), "a"),
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:02"), "b"))
    q.processAllAvailable()
    // same digest again in a later micro-batch, still inside the horizon
    mem.addData((java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), "a"))
    q.processAllAvailable()
    q.stop()
    val digests = spark.sql("SELECT digest FROM dedupstream")
      .collect().map(_.getString(0)).sorted
    assert(digests.toSeq == Seq("a", "b"))
  }

  test("session windows close after the gap and count per key") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val agg = StreamIngest.sessionAgg(
      mem.toDF().toDF("ts", "k"), "ts", "k", "5 minutes", "10 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sessagg").start()
    mem.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "u"),
      (java.sql.Timestamp.valueOf("2024-01-01 10:02:00"), "u"),
      (java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), "u"))
    q.processAllAvailable()
    // advance the watermark past both session ends so append emits them
    mem.addData((java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), "u"))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.sql(
      "SELECT n_events FROM sessagg ORDER BY session_window.start")
      .collect().map(_.getLong(0))
    assert(sessions.toSeq == Seq(2L, 1L))
  }

  test("stream-stream interval join matches within the window only") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val clicks = MemoryStream[(java.sql.Timestamp, String, Long)]
    val buys = MemoryStream[(java.sql.Timestamp, String, Long)]
    val joined = StreamIngest.intervalJoin(
      clicks.toDF().toDF("cts", "k", "click_id"),
      buys.toDF().toDF("bts", "k", "buy_id"),
      Seq("k"), "cts", "bts", before = "0 minutes", after = "60 minutes",
      watermark = "2 hours")
    val q = joined.selectExpr("click_id", "buy_id").writeStream
      .outputMode("append").format("memory").queryName("ivj").start()
    clicks.addData(
      (ts("2024-01-01 10:00:00"), "u", 1L),
      (ts("2024-01-01 12:00:00"), "u", 2L))
    buys.addData(
      (ts("2024-01-01 10:30:00"), "u", 100L), // ← click 1 (+30 min)
      (ts("2024-01-01 11:30:00"), "u", 101L), // ← nothing (click 1 +90)
      (ts("2024-01-01 12:10:00"), "u", 102L)) // ← click 2 (+10 min)
    q.processAllAvailable()
    // advance both watermarks so the append-mode join finalizes
    // (distinct keys: the sentinels must not join each other)
    clicks.addData((ts("2024-01-01 16:00:00"), "z1", 9L))
    buys.addData((ts("2024-01-01 16:00:00"), "z2", 9L))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.sql("SELECT click_id, buy_id FROM ivj ORDER BY click_id, buy_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 100L), (2L, 102L)))
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
