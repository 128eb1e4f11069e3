package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Timestamp unit / timezone conversion — the Spark face of the
  * reference's `convert_timestamp` (pydala/schema.py:70-109, exposed
  * through the write path's `ts_unit`/`tz`/`remove_tz` args,
  * pydala/io.py:325-351 and pydala/dataset.py:891-893).
  *
  * Arrow carries (unit, tz) in the column type, so the reference
  * converts by schema cast. Spark is different on both axes:
  *
  *  - UNIT: `TimestampType` is always µs internally; the unit only
  *    exists in the parquet FILE. [[outputTimestampType]] maps a unit
  *    spec to `spark.sql.parquet.outputTimestampType`, which
  *    [[graft.sources.WritePipeline]] scopes around the write.
  *    "ms" truncates sub-millisecond digits — the same truncation
  *    allowance the reference grants (pydala/io.py:106). "ns" is
  *    rejected: Spark cannot WRITE nanos (reads truncate to µs, see
  *    graft.core.Tables).
  *  - TZ: `TimestampType` is an instant (no per-column zone);
  *    `TimestampNTZType` is a wall clock. So tz conversion is a
  *    strip/localize pair between those two types, not a metadata
  *    swap. `strip(df, tz)` ≡ the reference's `remove_tz=True` (its
  *    arrow cast drops the zone keeping the stored UTC wall clock —
  *    that is `strip(df, "UTC")`, the default); `localize(df, tz)`
  *    interprets a wall clock in `tz` (the reference's metadata-only
  *    relabel corresponds to `localize(df, "UTC")`).
  *
  * Both directions are pure column expressions (codegen'd
  * `convert_timezone`), narrow, and fused into the surrounding scan —
  * no shuffle at any scale.
  */
object TsConvert {

  /** Zone ids reach SQL text — keep them to the IANA/offset alphabet. */
  private def checkTz(tz: String): String = {
    require(tz.matches("[A-Za-z0-9_/+\\-:]{1,64}"), s"malformed time zone: $tz")
    tz
  }

  def timestampColumns(df: DataFrame): Seq[String] =
    df.schema.fields.filter(_.dataType == TimestampType).map(_.name).toSeq

  def ntzColumns(df: DataFrame): Seq[String] =
    df.schema.fields.filter(_.dataType == TimestampNTZType).map(_.name).toSeq

  /** Instant → wall clock in `wallTz` (TIMESTAMP → TIMESTAMP_NTZ). */
  def stripColumn(c: Column, wallTz: String = "UTC"): Column =
    convert_timezone(lit(checkTz(wallTz)), c)

  /** Wall clock in `tz` → instant (TIMESTAMP_NTZ → TIMESTAMP). The
    * session zone only bridges the final cast — the resulting instant
    * is session-independent.
    */
  def localizeColumn(c: Column, tz: String, sessionTz: String): Column =
    convert_timezone(lit(checkTz(tz)), lit(checkTz(sessionTz)), c)
      .cast(TimestampType)

  /** Drop the zone from every TIMESTAMP column (or `cols`), rendering
    * wall clocks in `wallTz`.
    */
  def strip(df: DataFrame, wallTz: String = "UTC",
            cols: Seq[String] = Nil): DataFrame = {
    val targets = if (cols.nonEmpty) cols else timestampColumns(df)
    targets.foldLeft(df)((d, c) => d.withColumn(c, stripColumn(col(c), wallTz)))
  }

  /** Interpret every TIMESTAMP_NTZ column (or `cols`) as a wall clock
    * in `tz`, producing instants.
    */
  def localize(df: DataFrame, tz: String, cols: Seq[String] = Nil): DataFrame = {
    val sessionTz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    val targets = if (cols.nonEmpty) cols else ntzColumns(df)
    targets.foldLeft(df)((d, c) =>
      d.withColumn(c, localizeColumn(col(c), tz, sessionTz)))
  }

  /** Map a unit spec to `spark.sql.parquet.outputTimestampType`. */
  def outputTimestampType(unit: String): String = unit.toLowerCase match {
    case "us" | "micros" => "TIMESTAMP_MICROS"
    case "ms" | "millis" => "TIMESTAMP_MILLIS"
    case "int96" => "INT96"
    case "ns" | "nanos" => throw new IllegalArgumentException(
      "Spark cannot write nanosecond timestamps; use us or ms " +
        "(nanosecond INPUTS are truncated to micros at read, see graft.core.Tables)")
    case other => throw new IllegalArgumentException(s"unknown timestamp unit: $other")
  }
}
