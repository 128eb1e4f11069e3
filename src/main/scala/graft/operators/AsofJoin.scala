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
  * plan over the reversed time order. Nearest direction carries BOTH
  * the latest-preceding and earliest-following right rows over the
  * same hash exchange (two sorted window passes, one shuffle) and
  * picks the smaller absolute gap per left row, ties to backward —
  * pandas' merge_asof(direction='nearest').
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
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got: $direction")
    val backward = direction == "backward"

    // a tolerance compares leftTime and rightTime gaps in each column's
    // NATIVE units (micros for timestamps, days for dates, raw for
    // numerics) — a mixed pairing would silently compare micros against
    // days instead of failing
    def unitFamily(dt: DataType): String = dt match {
      case TimestampType | TimestampNTZType => "timestamp(micros)"
      case org.apache.spark.sql.types.DateType => "date(days)"
      case _ => "numeric(raw)"
    }
    tolerance.foreach { _ =>
      val (lf, rf) = (unitFamily(left.schema(leftTime).dataType),
        unitFamily(right.schema(rightTime).dataType))
      require(lf == rf,
        s"asof tolerance: time columns have mismatched unit families — " +
          s"$leftTime is $lf, $rightTime is $rf; cast one side first")
    }

    def micros(c: Column, dt: DataType): Column = dt match {
      case TimestampType => unix_micros(c)
      case TimestampNTZType => unix_micros(c.cast(TimestampType))
      case org.apache.spark.sql.types.DateType =>
        unix_date(c).cast("long") // tolerance unit = days for date columns
      case _ => c.cast("long")
    }

    val lCols = left.columns.toSeq
    // the WHOLE matched right row travels as ONE struct (__m): carrying
    // payload columns independently could mix fields from different
    // right rows when the nearest row holds nulls — merge_asof attaches
    // one row, nulls included
    val mType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__mtv", org.apache.spark.sql.types.LongType) +:
        payload.map(p => right.schema(p).copy(name = p)))

    // union schema: keys ++ __t ++ __side ++ __m ++ left cols
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1)) // left sorts AFTER right at equal time
      .withColumn("__m", lit(null).cast(mType))
      .select(keys.map(col) ++ Seq(col("__t"), col("__side"), col("__m")) ++
        lCols.filterNot(keys.contains).map(col): _*)
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__m", struct(
        micros(col(rightTime), right.schema(rightTime).dataType).as("__mtv") +:
          payload.map(p => col(p).as(p)): _*))
      .select(keys.map(col) ++ Seq(col("__t"), col("__side"), col("__m")) ++
        lCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // backward scans time ascending (carry the latest preceding right
    // row); forward scans descending (carry the earliest following one).
    // Right sorts before left at equal times either way — "at or
    // before/after" is inclusive.
    def carryWindow(asc: Boolean) = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (asc) col("__t").asc else col("__t").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val unioned = lTagged.unionByName(rTagged)
    val ltv = micros(col("__t"), left.schema(leftTime).dataType)

    // qualifies = a carried row exists and (when bounded) its gap on
    // that side is within tolerance
    def keepOf(m: Column, back: Boolean): Column = tolerance match {
      case None => m.isNotNull
      case Some(tol) =>
        val gap = if (back) ltv - m.getField("__mtv") else m.getField("__mtv") - ltv
        m.isNotNull && gap <= tol
    }

    val withMatch: DataFrame = direction match {
      case "nearest" =>
        // both carries share the hash exchange on `keys`; Spark plans
        // one shuffle + two in-partition sorts (asc, desc)
        val carried = unioned
          .withColumn("__mb", last(col("__m"), ignoreNulls = true).over(carryWindow(asc = true)))
          .withColumn("__mf", last(col("__m"), ignoreNulls = true).over(carryWindow(asc = false)))
        val kb = keepOf(col("__mb"), back = true)
        val kf = keepOf(col("__mf"), back = false)
        val nearer = // tie (equal gap) keeps the backward row
          ltv - col("__mb").getField("__mtv") <= col("__mf").getField("__mtv") - ltv
        carried.withColumn("__m",
          when(kb && kf, when(nearer, col("__mb")).otherwise(col("__mf")))
            .when(kb, col("__mb"))
            .when(kf, col("__mf")))
      case _ =>
        unioned
          .withColumn("__m", last(col("__m"), ignoreNulls = true).over(carryWindow(asc = backward)))
          .withColumn("__m", when(keepOf(col("__m"), back = backward), col("__m")))
    }

    withMatch.filter(col("__side") === 1)
      .select(keys.map(col) ++ lCols.filterNot(keys.contains).map(col) ++
        payload.map(p =>
          col("__m").getField(p).cast(right.schema(p).dataType).as(p)): _*)
  }
}
