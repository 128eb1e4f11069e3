package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row whose
  * time is <= the left row's time, per key — the operator the
  * reference exposes only through raw SQL and Spark lacks natively.
  *
  * Implemented by COMPOSITION (preference (a) of the extension
  * ladder): tag both sides, union them, and carry the most recent
  * right-side payload forward with a last-non-null window — one
  * shuffle on (keys, time), no join explosion, no per-key driver
  * loops. At 100 TB this is a single sort-shuffle of |L|+|R| rows;
  * the window is pipelined within each key partition.
  *
  * Right columns come back null when no right row precedes the left
  * row (left-asof semantics, same as DuckDB's ASOF LEFT JOIN).
  */
object AsofJoin {

  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
            leftTime: String, rightTime: String,
            payload: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one key column")

    val lCols = left.columns.toSeq
    // union schema: keys ++ __t ++ __side ++ left cols ++ payload
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1)) // left sorts AFTER right at equal time
      .select(keys.map(col) ++ Seq(col("__t"), col("__side")) ++
        lCols.filterNot(keys.contains).map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"__p_$p")): _*)
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(keys.map(col) ++ Seq(col("__t"), col("__side")) ++
        lCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(p => col(p).as(s"__p_$p")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = payload.foldLeft(lTagged.unionByName(rTagged)) { (d, p) =>
      d.withColumn(s"__p_$p", last(col(s"__p_$p"), ignoreNulls = true).over(w))
    }

    filled.filter(col("__side") === 1)
      .select(keys.map(col) ++ lCols.filterNot(keys.contains).map(col) ++
        payload.map(p => col(s"__p_$p").as(p)): _*)
  }
}
