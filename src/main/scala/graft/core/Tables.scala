package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical access to the driver-generated test tables.
  *
  * All tables are plain parquet files `<sfDir>/<name>.parquet`
  * (TPC-H-ish star schema + `events` + `documents` + `embeddings`,
  * see /root/repo/TESTDATA.md).
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
  * vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read
  * it with `spark.sql.legacy.parquet.nanosAsLong` and floor-divide to
  * microseconds — the same truncation DuckDB applies when casting
  * timestamp_ns to its microsecond TIMESTAMP, so oracle comparisons
  * agree. Integer division (`div`) is deliberate: nanos-since-epoch
  * (~1.7e18) exceeds Double's 2^53 exact range, so a floating-point
  * division would corrupt microseconds.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Spread a small input across the session's parallelism: a table
    * that arrives as a few tiny parquet files reads as one or two scan
    * partitions (Spark packs small files by BYTES up to
    * maxPartitionBytes, so a file count alone over- and under-counts
    * both ways: 40 tiny files pack into 1 partition; 1 big file
    * splits into many). The guard estimates the scan's partition
    * count from the plan's size statistics — metadata only, no
    * physical plan or RDD lineage materialization, so AQE's view of
    * the exchange is untouched. At real scale the estimate clears
    * `defaultParallelism` and this is a no-op. Callers should project
    * the columns they need BEFORE spreading — the round-robin exchange
    * shuffles whole rows, and a dragged-along `text` column is the
    * bulk of the table.
    */
  def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    val maxPart = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val estParts = (bytes / maxPart).toLong + 1
    if (estParts < want) df.repartition(want) else df
  }

  /** Memoized nanos→µs-converted `events` frames, keyed per
    * (session, sfDir): the conversion sits under EVERY event query, and
    * re-reading + re-dividing per call showed up as whole-query
    * regressions once the suite grew. MEMORY_AND_DISK so eviction
    * under pressure degrades to disk reads instead of evicting hotter
    * caches.
    */
  private val eventsMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Generic memoized-and-persisted frame, keyed per (session, tag) —
    * for query-local frames that a stats probe and the returned plan
    * BOTH traverse (a bare .cache() inside a query fn is never
    * unpersisted and pins storage for the session's lifetime; this
    * map is drained by [[dropMemos]] at Bench's phase boundary).
    */
  private val frameMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def memo(spark: SparkSession, tag: String)(build: => DataFrame): DataFrame =
    frameMemo.getOrElseUpdate((spark, tag),
      build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Unpersist and forget every memoized frame for `spark` (all table
    * dirs). Bench calls this at its warm→measured phase boundary —
    * `clearCache()` alone drops the storage but leaves the memo maps
    * pointing at unpersisted frames, which would silently recompute
    * (events) or pin dead plans for the JVM lifetime.
    */
  def dropMemos(spark: SparkSession): Unit = {
    Seq(eventsMemo, frameMemo).foreach(_.filterInPlace { case ((s, _), df) =>
      if (s eq spark) { df.unpersist(); false } else !s.sparkContext.isStopped
    })
    graft.queries.TextOps.dropMemos(spark)
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    name match {
      case "events" =>
        eventsMemo.getOrElseUpdate((spark, sfDir), {
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read
            .parquet(s"$sfDir/events.parquet")
            .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        })
      case other =>
        spark.read.parquet(s"$sfDir/$other.parquet")
    }
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
