package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level dataset profiling — the schema-discovery report a
  * curator runs before trusting a new table (per column: rows, nulls,
  * distincts, bounds). The reference surfaces this ad hoc through
  * DuckDB SUMMARIZE; here it is a first-class operator whose output
  * is a DataFrame (so it can be stored, diffed across snapshots, or
  * joined against a previous profile for drift).
  *
  * Execution shape: ONE narrow aggregate pass per column for the
  * exact lanes (count/nulls/min/max are map-side partials; the exact
  * distinct is its own hash aggregate — putting N count_distincts in
  * one agg would go through Catalyst's expand and multiply the scan
  * N×), plus an approx_count_distinct lane in the shared pass. At
  * 100 TB you read `ndv_approx` (no distinct shuffle) and skip the
  * exact lane via `exactNdv = false`; the q195 gate runs both and
  * pins the sketch's error bound, which is what licenses trusting
  * the approx lane alone.
  *
  * Bounds are emitted as strings for a uniform schema. Doubles in
  * ±10¹⁶ render via DECIMAL(18,2) (canonical on every engine — raw
  * double formatting differs); NaN renders as "NaN" (Spark's max
  * treats NaN as greatest, so a NaN-containing column REPORTS it
  * instead of silently clipping to the largest finite value);
  * magnitudes beyond the decimal range fall back to the engine's
  * native double rendering rather than failing the profile under
  * ANSI overflow. The operator is total: zero-column input yields an
  * empty profile.
  */
object Profile {

  private def q(name: String) = col(s"`$name`")

  def table(df: DataFrame, exactNdv: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    if (df.schema.isEmpty)
      return Seq.empty[(String, Long, Long, Option[Long], Long, String, String)]
        .toDF("column", "n_rows", "n_nulls", "ndv_exact", "ndv_approx",
          "min_str", "max_str")
    def boundStr(f: StructField, agg: String): org.apache.spark.sql.Column = {
      val c = q(f.name)
      f.dataType match {
        case DoubleType | FloatType =>
          val b = (if (agg == "min") min(c) else max(c)).cast("double")
          // total over the full double domain: NaN explicit, in-range
          // via canonical decimal, overflow-range via native rendering
          when(isnan(b), lit("NaN"))
            .when(abs(b) < lit(1e16), b.cast("decimal(18,2)").cast("string"))
            .otherwise(b.cast("string"))
        case _ =>
          (if (agg == "min") min(c) else max(c)).cast("string")
      }
    }
    val perCol = df.schema.fields.toSeq.map { f =>
      val base = df.agg(
        count(lit(1)).as("n_rows"),
        count(q(f.name)).as("n_present"),
        approx_count_distinct(q(f.name), 0.05).as("ndv_approx"),
        boundStr(f, "min").as("min_str"),
        boundStr(f, "max").as("max_str"))
      val withNdv =
        if (exactNdv) {
          val exact = df.select(q(f.name).as("v")).distinct().agg(
            count(when(col("v").isNotNull, 1)).as("ndv_exact"))
          base.crossJoin(broadcast(exact))
        } else base.withColumn("ndv_exact", lit(null).cast("long"))
      withNdv.select(
        lit(f.name).as("column"),
        col("n_rows"),
        (col("n_rows") - col("n_present")).as("n_nulls"),
        col("ndv_exact"),
        col("ndv_approx"),
        col("min_str"), col("max_str"))
    }
    perCol.reduce(_ unionAll _).orderBy("column")
  }
}
