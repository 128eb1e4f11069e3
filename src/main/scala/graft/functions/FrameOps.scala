package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** DataFrame helpers mirroring the reference's public polars helper
  * re-exports (pydala/helpers/polars.py:2-15, pinned by
  * tests/test_helpers_contract.py:89-227): drop_null_columns,
  * explode_all, unnest_all, with_row_count, with_strftime_columns,
  * with_truncated_columns. (cast_relaxed = SchemaOps.align, delta =
  * left_anti join in Merge, opt_dtype = SchemaOps.optDtype,
  * unify_schemas = SchemaOps.unify, partition_by = [[partitionBy]].)
  */
object FrameOps {

  /** Anti-join delta (reference `Writer.delta`, pydala/io.py:364-379;
    * public re-export pydala/helpers/polars.py:2-15, pinned
    * tests/test_helpers_contract.py:131-148): rows of `df` with no
    * match in `other`, keyed on `subset` (default: every column common
    * to both), with null-safe key equality — the same contract the
    * merge-insert path uses. Plans as a left-anti hash join; Catalyst
    * broadcasts `other` when it is small.
    */
  def delta(df: DataFrame, other: DataFrame, subset: Seq[String] = Nil): DataFrame = {
    val keys =
      if (subset.nonEmpty) subset
      else df.columns.toSeq.filter(other.columns.contains(_))
    require(keys.nonEmpty, "delta: no common columns to compare on")
    val l = df.alias("graft_delta_l")
    val r = other.select(keys.map(other(_)): _*).alias("graft_delta_r")
    val cond = keys.map(k =>
      col(s"graft_delta_l.`$k`") <=> col(s"graft_delta_r.`$k`")).reduce(_ && _)
    l.join(r, cond, "left_anti")
  }

  /** Relaxed cast to a target schema (reference `cast_relaxed`,
    * pydala/helpers/polars.py:2-15): missing fields become typed nulls,
    * mismatched types coerce, extra columns are kept. Alias of
    * [[SchemaOps.align]] with `keepExtra = true`.
    */
  def castRelaxed(df: DataFrame, target: StructType): DataFrame =
    SchemaOps.align(df, target, keepExtra = true)

  /** Drop columns whose values are ALL null — one aggregate pass. */
  def dropNullColumns(df: DataFrame): DataFrame = {
    if (df.columns.isEmpty) return df
    val counts = df.select(df.columns.toSeq.map(c => count(col(c)).as(c)): _*).collect()(0)
    val keep = df.columns.toSeq.zipWithIndex.collect {
      case (c, i) if counts.getLong(i) > 0 => c
    }
    if (keep.size == df.columns.length) df else df.select(keep.map(col): _*)
  }

  /** Explode every top-level array column (sequentially — each explode
    * multiplies rows like the reference's explode_all).
    */
  def explodeAll(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case _: ArrayType => d.withColumn(f.name, explode_outer(col(f.name)))
        case _ => d
      }
    }

  /** Recursively flatten struct columns to `parent_child` columns. */
  def unnestAll(df: DataFrame, sep: String = "_"): DataFrame = {
    def cols(prefix: String, alias: String, t: StructType): Seq[Column] =
      t.fields.toSeq.flatMap { f =>
        val path = if (prefix.isEmpty) s"`${f.name}`" else s"$prefix.`${f.name}`"
        val name = if (alias.isEmpty) f.name else s"$alias$sep${f.name}"
        f.dataType match {
          case s: StructType => cols(path, name, s)
          case _ => Seq(col(path).as(name))
        }
      }
    val flat = df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case s: StructType => cols(s"`${f.name}`", f.name, s)
        case _ => Seq(col(s"`${f.name}`"))
      }
    }
    if (df.schema.fields.exists(_.dataType.isInstanceOf[StructType]))
      df.select(flat: _*)
    else df
  }

  /** Add a deterministic 0-based row count in the order of `orderBy`
    * (the reference's with_row_count; an explicit order key keeps it
    * reproducible on a cluster).
    *
    * When the leading order column is numeric / date / timestamp the
    * count is computed by the exact two-phase distributed rank
    * ([[graft.plans.GlobalOrder]]) — no single-partition sort. A
    * non-bucketable leading column (string, binary) falls back to the
    * global window, which serializes; order by a numeric key first
    * where scale matters.
    */
  def withRowCount(df: DataFrame, orderBy: Seq[String],
                   name: String = "row_nr"): DataFrame = {
    import org.apache.spark.sql.types._
    val bucketExpr: Option[Column] = orderBy.headOption.flatMap { c =>
      df.schema(c).dataType match {
        case _: NumericType => Some(col(c))
        case DateType => Some(unix_date(col(c)))
        case TimestampType => Some(unix_micros(col(c)))
        case TimestampNTZType => Some(unix_micros(col(c).cast("timestamp")))
        case _ => None
      }
    }
    bucketExpr match {
      case Some(b) =>
        graft.plans.GlobalOrder.withRowNumber(df, orderBy.map(col), b, name)
          .withColumn(name, col(name) - 1)
      case None =>
        val w = Window.orderBy(orderBy.map(col): _*)
        // LongType like the bucketed path — a 0-based row count is a
        // 64-bit quantity at scale regardless of which path built it
        df.withColumn(name, (row_number().over(w) - 1).cast("long"))
    }
  }

  /** Derive formatted-string columns from a timestamp column
    * (with_strftime_columns). Formats use Spark datetime patterns.
    */
  def withStrftimeColumns(df: DataFrame, tsCol: String,
                          formats: Map[String, String]): DataFrame =
    formats.foldLeft(df) { case (d, (name, fmt)) =>
      d.withColumn(name, date_format(col(tsCol), fmt))
    }

  /** Derive truncated-timestamp columns (with_truncated_columns):
    * units like "year"/"month"/"day"/"hour".
    */
  def withTruncatedColumns(df: DataFrame, tsCol: String,
                           units: Seq[String]): DataFrame =
    units.foldLeft(df) { (d, u) =>
      d.withColumn(s"${tsCol}_$u", date_trunc(u, col(tsCol)))
    }

  /** Split a frame into one lazy frame per distinct partition-column
    * value combination (reference `partition_by`,
    * pydala/helpers/polars.py:2-15, pinned by
    * tests/test_helpers_contract.py:198-215): each entry is the
    * partition-value map plus the matching rows WITHOUT the partition
    * columns; no columns → one entry with an empty map.
    *
    * The distinct key set is collected to the driver — this is a
    * dimensional-split API (like the reference's, which materializes
    * every frame); `maxPartitions` guards against calling it on a
    * high-cardinality key. For data-scale splits use the write path's
    * hive `partitionBy`, which never drives through the driver.
    *
    * Cost: each returned frame is a filter over the SOURCE, so a
    * caller consuming all K entries would re-scan it K times.
    * `persistSource` (default true) instead pins one
    * MEMORY_AND_DISK pass — the key-distinct warms it and every
    * split reads the cached pass. The pin is registered with
    * `Tables.adopt`, so its lifecycle is OWNED by the memo LRU:
    * `Tables.trimStorage` evicts it coldest-first under a storage
    * budget and `Tables.dropMemos` drains it at phase boundaries — it
    * does not silently outlive its usefulness. Callers may still
    * `df.unpersist()` early; pass `persistSource = false` for a
    * one-entry drill-down where a single re-scan is cheaper than
    * caching the whole source.
    */
  def partitionBy(df: DataFrame, columns: Seq[String],
                  maxPartitions: Int = 10000,
                  persistSource: Boolean = true): Seq[(Map[String, Any], DataFrame)] = {
    if (columns.isEmpty) return Seq(Map.empty[String, Any] -> df)
    val wePersisted = persistSource &&
      df.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    if (wePersisted)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keys =
      try {
        val k = df.select(columns.map(col): _*).distinct()
          .limit(maxPartitions + 1).collect()
        require(k.length <= maxPartitions,
          s"partitionBy: more than $maxPartitions distinct keys over ${columns.mkString(",")}")
        k
      } catch {
        // the guard (or the key job) failing must not leak the pinned
        // cache — nothing is returned, so nobody could unpersist it
        case e: Throwable =>
          if (wePersisted) df.unpersist()
          throw e
      }
    // hand the pin to the memo LRU only once the guard has passed:
    // trimStorage/dropMemos own its lifecycle from here (adopting
    // before the guard would leave a memo entry retaining the dead
    // frame on the failure path)
    if (wePersisted)
      graft.core.Tables.adopt(df.sparkSession,
        s"partitionBy#${System.identityHashCode(df.queryExecution)}", df)
    val rest = df.columns.toSeq.filterNot(columns.contains)
    keys.toSeq.map { row =>
      val kv = columns.zipWithIndex.map { case (c, i) => c -> row.get(i) }.toMap
      val pred = columns.zipWithIndex.map { case (c, i) =>
        if (row.isNullAt(i)) col(c).isNull else col(c) <=> lit(row.get(i))
      }.reduce(_ && _)
      kv -> df.filter(pred).select(rest.map(col): _*)
    }
  }
}
