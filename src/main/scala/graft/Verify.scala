package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // annotated INT64 micros (not legacy INT96) so footers carry
      // usable timestamp min/max stats — q183's window planning and
      // every sidecar timeRange depend on it
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // streaming gates sum telemetry over recentProgress, which
      // Spark caps at numRecentProgressUpdates (default 100) - a
      // probe-scaled gate can exceed 100 micro-batches and would
      // silently undercount its lanes
      .config("spark.sql.streaming.numRecentProgressUpdates", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev loop only (driver never sets it): restrict to named queries
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // The driver's DuckDB oracle reads the raw tables' naive (NTZ)
    // timestamps, so its result timestamps are naive; Spark's
    // session-TZ TIMESTAMP writes parquet isAdjustedToUTC=true, which
    // the comparator loads tz-aware and mismatches on tzinfo alone.
    // The session zone is pinned UTC, so casting result timestamps to
    // NTZ at the dump boundary is value-identity — it only aligns the
    // parquet annotation with the oracle's.
    def ntzNormalized(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types.TimestampType
      df.schema.fields.collect { case f if f.dataType == TimestampType => f.name }
        .foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("timestamp_ntz")))
    }
    // Same cache-budget discipline as Bench: 186 queries in one
    // session accumulate memoized/cached frames monotonically without
    // a between-queries sweep (the r3 late-suite failure mode, which
    // would otherwise also slow the driver's correctness run).
    val cacheBudgetMB = sys.env.getOrElse("SPARK_GRAFT_CACHE_BUDGET_MB", "1536").toLong
    // Flake instrumentation (round-7, q294): with SPARK_GRAFT_HASH_DUMP
    // set, re-read each written result and print a canonical value
    // hash (`[hash] <name> <sha256>`) — columns sorted by name, rows
    // sorted by stringified values, mirroring the driver-compare
    // canonicalization closely enough for RUN-TO-RUN self-comparison
    // (the only use; never compared cross-engine). Lets repeated
    // suite runs prove which side of a driver hash mismatch moved.
    val hashDump = sys.env.contains("SPARK_GRAFT_HASH_DUMP")
    def canonHash(path: String): String = {
      val df = spark.read.parquet(path)
      val cols = df.columns.sorted
      val lines = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect()
        .map { r =>
          cols.indices.map { i =>
            val v = r.get(i)
            if (v == null) "\u0000null"
            else s"${v.getClass.getSimpleName}\u0001$v"
          }.mkString("\u0001")
        }.sorted
      val md = java.security.MessageDigest.getInstance("SHA-256")
      lines.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
      md.digest().map("%02x".format(_)).mkString
    }
    SparkEntry.selectQueries(only).foreach { case (name, fn) =>
      try {
        ntzNormalized(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        if (hashDump) println(s"[hash] $name ${canonHash(s"$outDir/$name")}")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      graft.core.Tables.trimStorage(spark, cacheBudgetMB << 20)
    }
    // JSON string escape (graft.core.JsonText — the one shared
    // escaper): a tab or CR in builder-authored SQL would otherwise
    // make the driver's json.load fail and silently zero the round's
    // correctness.
    def q(s: String): String = graft.core.JsonText.escape(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
