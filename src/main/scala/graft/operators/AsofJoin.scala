package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

/** As-of join: for each left row, attach the nearest right row at or
  * before (backward) / at or after (forward) the left row's time, per
  * key, optionally within a tolerance — the operator the reference
  * exposes only through raw SQL and Spark lacks natively (pandas'
  * merge_asof surface).
  *
  * Implemented by COMPOSITION (preference (a) of the extension
  * ladder): tag both sides, union them, and carry the most recent
  * right-side payload through a last-non-null window — one shuffle on
  * (keys, time), no join explosion, no per-key driver loops. At 100 TB
  * this is a single sort-shuffle of |L|+|R| rows; the window is
  * pipelined within each key partition. Forward direction is the same
  * plan over the reversed time order.
  *
  * Right columns come back null when no right row qualifies (left-asof
  * semantics, same as DuckDB's ASOF LEFT JOIN).
  */
object AsofJoin {

  /** @param tolerance maximum |leftTime - rightTime| for a match, in
    *                  the time column's native units (epoch micros for
    *                  timestamps, raw units for numerics).
    */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
            leftTime: String, rightTime: String,
            payload: Seq[String],
            direction: String = "backward",
            tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one key column")
    require(Seq("backward", "forward").contains(direction),
      s"direction must be backward|forward, got: $direction")
    val backward = direction == "backward"

    def micros(c: Column, dt: DataType): Column = dt match {
      case TimestampType => unix_micros(c)
      case TimestampNTZType => unix_micros(c.cast(TimestampType))
      case _ => c.cast("long")
    }

    val lCols = left.columns.toSeq
    // union schema: keys ++ __t ++ __side ++ __mtv ++ left cols ++ payload
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1)) // left sorts AFTER right at equal time
      .withColumn("__mtv", lit(null).cast("long"))
      .select(keys.map(col) ++ Seq(col("__t"), col("__side"), col("__mtv")) ++
        lCols.filterNot(keys.contains).map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"__p_$p")): _*)
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__mtv", micros(col(rightTime), right.schema(rightTime).dataType))
      .select(keys.map(col) ++ Seq(col("__t"), col("__side"), col("__mtv")) ++
        lCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(p => col(p).as(s"__p_$p")): _*)

    // backward scans time ascending (carry the latest preceding right
    // row); forward scans descending (carry the earliest following one).
    // Right sorts before left at equal times either way — "at or
    // before/after" is inclusive.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (backward) col("__t").asc else col("__t").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = (payload.map(p => s"__p_$p") :+ "__mtv")
      .foldLeft(lTagged.unionByName(rTagged)) { (d, c) =>
        d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }

    val ltv = micros(col("__t"), left.schema(leftTime).dataType)
    val keep: Column = tolerance match {
      case None => col("__mtv").isNotNull
      case Some(tol) =>
        val gap = if (backward) ltv - col("__mtv") else col("__mtv") - ltv
        col("__mtv").isNotNull && gap <= tol
    }

    carried.filter(col("__side") === 1)
      .select(keys.map(col) ++ lCols.filterNot(keys.contains).map(col) ++
        payload.map(p =>
          when(keep, col(s"__p_$p"))
            .otherwise(lit(null).cast(right.schema(p).dataType)).as(p)): _*)
  }
}
