package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
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
  * Bounds are emitted as strings for a uniform schema: doubles via
  * DECIMAL(18,2) so the rendering is engine-portable (both Spark and
  * DuckDB print decimals canonically; raw double formatting differs).
  */
object Profile {

  def table(df: DataFrame, exactNdv: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def boundStr(f: StructField, agg: String): org.apache.spark.sql.Column = {
      val c = col(f.name)
      val v = f.dataType match {
        case DoubleType | FloatType =>
          expr(s"$agg(CAST(`${f.name}` AS DECIMAL(18,2)))")
        case _ => if (agg == "min") min(c) else max(c)
      }
      v.cast("string")
    }
    val perCol = df.schema.fields.toSeq.map { f =>
      val base = df.agg(
        count(lit(1)).as("n_rows"),
        count(col(f.name)).as("n_present"),
        approx_count_distinct(col(f.name), 0.05).as("ndv_approx"),
        boundStr(f, "min").as("min_str"),
        boundStr(f, "max").as("max_str"))
      val withNdv =
        if (exactNdv) {
          val exact = df.select(col(f.name)).distinct().agg(
            count(when(col(f.name).isNotNull, 1)).as("ndv_exact"))
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
