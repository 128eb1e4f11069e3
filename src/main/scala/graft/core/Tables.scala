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
    * that arrives as one tiny parquet file reads as ONE partition, and
    * CPU-heavy per-row operators (hashing, folds) would run on a
    * single core. At real scale inputs have many splits and this is a
    * no-op.
    */
  def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    name match {
      case "events" =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read
          .parquet(s"$sfDir/events.parquet")
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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
