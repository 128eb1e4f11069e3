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
    // Canonical value hash (round-7 q294 flake -> round-8 artifact):
    // ALWAYS computed per query (round-7's SPARK_GRAFT_HASH_DUMP gate
    // dropped -- the driver's hash red cell recurred twice, so the
    // in-run hash must exist as a persistent artifact, not a rerun
    // tool). Columns sorted by name, rows sorted by stringified
    // values, mirroring the driver-compare canonicalization closely
    // enough for RUN-TO-RUN self-comparison (never compared
    // cross-engine). Persisted to $outDir/$name/_canon_sha256 -- the
    // underscore prefix keeps parquet readers blind to it -- so any
    // later driver mismatch is adjudicated against what the run
    // itself computed, no rerun needed.
    // Round-9 (verdict #1): persist the VALUES, not just the hash.
    // `_canon_rows.txt.gz` holds the exact sorted canonical lines the
    // hash is computed over, so a driver hash mismatch is adjudicated
    // as a specific row/column diff against what this run saw —
    // results are result-sized by contract, and the four r8 red cells
    // gzip to a few KB each.
    def gzipLines(path: String, ls: Array[String]): Unit = {
      val out = new java.util.zip.GZIPOutputStream(
        Files.newOutputStream(Paths.get(path)))
      try ls.foreach(l => out.write((l + "\n").getBytes("UTF-8")))
      finally out.close()
    }
    val hashes = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.selectQueries(only).foreach { case (name, fn) =>
      try {
        val norm = ntzNormalized(fn(spark, sfDir))
        // round-10 (verdict #7): a result family the seam spec hasn't
        // pinned must fail HERE, loudly, before it can reach the
        // driver comparator (the r6–r8 HUGEINT class was exactly an
        // unpinned-family seam)
        graft.core.CanonHash.assertSeamCovered(name, norm.schema)
        norm.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val lines = graft.core.CanonHash.lines(spark.read.parquet(s"$outDir/$name"))
        val h = graft.core.CanonHash.hashOfLines(lines)
        Files.writeString(Paths.get(s"$outDir/$name/_canon_sha256"), h + "\n")
        gzipLines(s"$outDir/$name/_canon_rows.txt.gz", lines)
        hashes(name) = h
        println(s"[hash] $name $h")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      graft.core.Tables.trimStorage(spark, cacheBudgetMB << 20)
    }
    // One aggregate snapshot per run -- the round-end HASHES_rNN.json
    // commit is a copy of this file from a full sweep. ONLY full runs
    // write the well-known name (the bench_out.json rule): a
    // SPARK_GRAFT_ONLY dev loop into the same outDir would silently
    // clobber a full-sweep snapshot with a subset. Selection-limited
    // runs (dev loops AND verify_shard shards) write a clearly-partial
    // sibling instead, which the shard runner merges.
    val hashFile =
      if (only.isEmpty) "_canon_hashes.json" else "_canon_hashes_partial.json"
    Files.writeString(Paths.get(s"$outDir/$hashFile"),
      hashes.map { case (k, v) =>
        s"${graft.core.JsonText.escape(k)}: ${graft.core.JsonText.escape(v)}"
      }.mkString("{", ",", "}"))
    // Env stamp (round-9 verdict #1): one line pinning the runtime a
    // snapshot was produced under, so a cross-run hash disagreement
    // can first be checked for an environment delta before anything
    // else is suspected.
    Files.writeString(Paths.get(s"$outDir/_env.txt"),
      s"spark=${spark.version} jdk=${System.getProperty("java.version")} " +
      s"tz=${java.util.TimeZone.getDefault.getID} cpus=$cpus " +
      s"shufflePartitions=${spark.conf.get("spark.sql.shuffle.partitions")} " +
      s"only=${only.map(_.size.toString).getOrElse("FULL")}\n")
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
