package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.ScanPruner

/** Managed parquet dataset: a directory of parquet files with optional
  * hive partitioning and a statistics sidecar — the Spark-native
  * `ParquetDataset` (reference pydala/dataset.py:1010-1177).
  *
  * Everything relational (filter/sort/agg/join) happens on the plain
  * `DataFrame` from [[df]]; the class adds the management layer:
  * sidecar statistics, explicit file-level scan pruning, the
  * normalizing write pipeline, keyed merge, and maintenance.
  */
final class ParquetDataset(val spark: SparkSession, rawPath: String) {

  val path: String = FsUtil.stripScheme(rawPath).stripSuffix("/")

  /** Physical data files, absolute paths — authoritative (ADR 0001). */
  def files: Seq[String] = FsUtil.listParquet(path)

  /** Dataset-relative file names (hive segments included). */
  def relFiles: Seq[String] = files.map(f => FsUtil.relativize(path, f))

  def isEmpty: Boolean = files.isEmpty

  /** Hive partition column names, inferred from the first file's path
    * (partitioning is uniform across a dataset).
    */
  def partitionColumns: Seq[String] = relFiles.headOption
    .map(f => f.split("/").dropRight(1).toSeq.flatMap { seg =>
      val i = seg.indexOf('=')
      if (i > 0) Some(seg.substring(0, i)) else None
    })
    .getOrElse(Nil)

  /** Resolved schema memo (round-12, verdict #2): every bare
    * `spark.read.parquet` pays a one-task footer-inference job at plan
    * time (~35–60 ms + inter-job gap), and lifecycle/merge/maintenance
    * paths consult [[df]] many times per operation. The first call
    * infers; later calls supply the remembered schema and plan with
    * zero jobs. Instance-scoped and dropped by [[refreshSchema]],
    * which every mutating path (write/delete/merge/maintenance swap)
    * calls — an EXTERNAL writer mutating the same path must use its
    * own instance (it already must, for `refreshByPath` reasons).
    * Metadata only; no data is ever cached here.
    */
  @volatile private var schemaMemo: Option[org.apache.spark.sql.types.StructType] = None

  /** Forget the memoized schema — called after every mutation of the
    * underlying files (the schema can evolve on append, repartition's
    * dateparts, dtype optimization, schema repair).
    */
  def refreshSchema(): Unit = schemaMemo = None

  /** The full lazy scan. Partition discovery and row-group pruning are
    * native; this is the entry point for all relational work.
    */
  def df: DataFrame = schemaMemo match {
    case Some(sc) => spark.read.schema(sc).parquet(path)
    case None =>
      val d = spark.read.parquet(path)
      // inference already yields an all-nullable tree; memoized as-is
      schemaMemo = Some(d.schema)
      d
  }

  /** SQL-string filter — the reference's whole predicate-translation
    * subsystem collapses into Catalyst (SURVEY §2.2).
    */
  def filter(sql: String): DataFrame = df.filter(Sanitize(sql))

  def count(): Long = stats match {
    // metadata-only count from the sidecar when available (one row
    // group appears once per column — dedupe first)
    case Some(s) =>
      val r = s.select("file_path", "row_group", "rg_num_rows").distinct()
        .agg(sum("rg_num_rows")).collect()(0)
      if (r.isNullAt(0)) 0L else r.getLong(0)
    case None => df.count()
  }

  // ---- stats sidecar ------------------------------------------------

  def stats: Option[DataFrame] = StatsSidecar.read(spark, path)

  /** Reconcile the sidecar with the physical files. */
  def updateStats(): DataFrame = StatsSidecar.update(spark, path)

  /** File-level pruned scan: translate the row predicate into a
    * conservative range predicate over the sidecar, read only the
    * surviving files (ALL their rows — no row filtering, matching the
    * reference scan(), pydala/dataset.py:1200-1246).
    */
  def scan(filterSql: String): DataFrame = {
    val all = relFiles
    if (all.isEmpty) return df.limit(0)
    val chosen = ScanPruner.selectFiles(stats, all, Sanitize(filterSql)).getOrElse(all)
    if (chosen.isEmpty) df.limit(0)
    else if (chosen.size == all.size) df
    else {
      // explicit schema (the Merge affected-read pattern): the chosen
      // files are a subset of the dataset just resolved, so
      // re-inferring their footers is a pure extra driver job;
      // partition columns ride in via basePath + the provided schema
      val sc = schemaMemo.getOrElse(df.schema)
      spark.read.option("basePath", path).schema(sc)
        .parquet(chosen.map(f => s"$path/$f"): _*)
    }
  }

  /** Files a scan(filter) would read — the dry-run face of pruning. */
  def pruneFiles(filterSql: String): Seq[String] =
    ScanPruner.selectFiles(stats, relFiles, Sanitize(filterSql)).getOrElse(relFiles)

  /** Dataset time range for a timestamp column, metadata-only from the
    * sidecar (reference `SELECT MIN(ts.min), MAX(ts.max)`,
    * pydala/dataset.py:2303-2307). Epoch-micros bounds, None when the
    * sidecar or stats are missing.
    */
  def timeRange(column: String): Option[(Long, Long)] = stats.flatMap { s =>
    val exact = s.columns.contains("min_int")
    val (lo, hi) = if (exact) ("min_int", "max_int") else ("min_num", "max_num")
    val r = s.filter(col("column") === column && col("typ") === "timestamp")
      .agg(min(lo).cast("long"), max(hi).cast("long")).collect()(0)
    if (r.isNullAt(0) || r.isNullAt(1)) None
    else Some((r.getLong(0), r.getLong(1)))
  }

  /** First timestamp column of the schema (reference timestamp-column
    * autodetection, pydala/dataset.py:497-500).
    */
  def timestampColumn: Option[String] =
    df.schema.fields.find(f =>
      f.dataType == org.apache.spark.sql.types.TimestampType ||
        f.dataType == org.apache.spark.sql.types.TimestampNTZType).map(_.name)

  // ---- write --------------------------------------------------------

  /** Normalizing write (sort → dedupe → cast → dateparts → partitioned
    * parquet) followed by a sidecar refresh.
    */
  def write(data: DataFrame, cfg: WriteConfig = WriteConfig()): Unit = {
    WritePipeline.write(data, path, cfg)
    refreshSchema() // appends can evolve the unified schema
    if (stats.nonEmpty || cfg.mode == "overwrite") updateStats()
  }

  // ---- maintenance --------------------------------------------------

  def vacuum(): Unit = {
    FsUtil.delete(path, files)
    FsUtil.deleteRecursively(StatsSidecar.sidecarPath(path))
    spark.catalog.refreshByPath(path)
    refreshSchema()
  }

  def deleteFiles(rel: Seq[String]): Unit = {
    rel.foreach(Sanitize.relPath)
    FsUtil.delete(path, rel.map(f => s"$path/$f"))
    spark.catalog.refreshByPath(path)
    refreshSchema()
    // keep the sidecar in sync: count()/timeRange()/scan() prefer it, so a
    // stale sidecar would keep serving rows for the files just deleted
    if (stats.nonEmpty) updateStats()
  }
}

/** Filter sanitization (reference pydala/helpers/security.py:118-140):
  * strip comments and NULs, require balanced quotes.
  */
object Sanitize {
  def apply(sql: String): String = {
    val cleaned = stripComments(sql)
      .replace("\u0000", "")
      .trim
    val quotes = cleaned.count(_ == '\'')
    require(quotes % 2 == 0, s"unbalanced quotes in filter: $sql")
    cleaned
  }

  /** Quote-aware comment strip: line/block comment markers INSIDE a
    * quoted region are data, not comments — a blind regex corrupted
    * `name = 'a--b'` to `name = 'a` and then rejected it for the
    * unbalanced quote it had just created. (The reference's sanitizer
    * shares the naive regex; this is a deliberate divergence.) All
    * three SQL quoting forms are tracked: string literals ('…'),
    * backtick identifiers (`…`), and double-quoted identifiers ("…").
    * Escaped quotes follow the doubling convention, which a parity
    * scan handles for free (each half toggles once).
    */
  private def stripComments(sql: String): String = {
    val out = new StringBuilder(sql.length)
    var i = 0
    var quote: Char = 0 // 0 = outside any quoted region
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (quote != 0) {
        out.append(c)
        if (c == quote) quote = 0
        i += 1
      } else if (c == '\'' || c == '`' || c == '"') {
        out.append(c); quote = c; i += 1
      } else if (c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') {
        // line comment: drop to end of line (newline itself survives)
        val nl = sql.indexOf('\n', i)
        i = if (nl < 0) sql.length else nl
      } else if (c == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*') {
        // a removed block comment leaves a SPACE: plain removal would
        // join its neighbors and could SYNTHESIZE a marker the scan
        // already passed (`-/**/-` → `--`), re-opening the bypass this
        // function exists to close
        out.append(' ')
        val end = sql.indexOf("*/", i + 2)
        i = if (end < 0) sql.length else end + 2
      } else {
        out.append(c); i += 1
      }
    }
    out.toString
  }

  /** Dataset-relative path guard (reference security.py:143-244): a
    * user-supplied relative file name must stay inside the dataset
    * root — no traversal segments, no NULs, no absolute paths.
    */
  def relPath(p: String): String = {
    require(!p.contains("\u0000"), "NUL byte in path")
    require(!p.startsWith("/") && !p.matches("^[A-Za-z]:.*"),
      s"absolute path where dataset-relative expected: $p")
    require(!p.split("[/\\\\]").contains(".."), s"path traversal rejected: $p")
    p
  }
}
