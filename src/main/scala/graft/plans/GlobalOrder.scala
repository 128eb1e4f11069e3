package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Codegen'd `#{b in bounds : b <= key}` via binary search over a
  * broadcast-referenced sorted array — the bucket-assignment kernel of
  * [[GlobalOrder]]. A chained-CASE formulation of the same function
  * (64 branches) blows the generated method past the JVM limit and
  * drops the whole projection to interpreted eval (~5 µs/row measured
  * at sf0.1 — slower than the single-partition sort it replaces);
  * this is 6 comparisons inside whole-stage codegen.
  */
private[plans] case class BucketOfSorted(child: Expression, bounds: Array[Double])
  extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bucket_of_sorted"

  override protected def nullSafeEval(input: Any): Any = {
    val i = java.util.Arrays.binarySearch(bounds, input.asInstanceOf[Double])
    if (i >= 0) i + 1 else -(i + 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("bounds", bounds, "double[]")
    val idx = ctx.freshName("idx")
    nullSafeCodeGen(ctx, ev, c => s"""
       |int $idx = java.util.Arrays.binarySearch($arr, $c);
       |${ev.value} = $idx >= 0 ? $idx + 1 : -($idx + 1);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact global ordered-window computation WITHOUT a single-partition
  * sort — the distributed replacement for `Window.orderBy(...)` with
  * no partitionBy (Spark's `WindowExec: No Partition Defined` path,
  * which moves every row to one task and is the one remaining
  * serialization point at corpus scale).
  *
  * Two-phase scheme:
  *   1. bucket boundaries: approximate quantiles of a numeric bucket
  *      key (one narrow partial-aggregate pass; accuracy only affects
  *      LOAD BALANCE, never values);
  *   2. per-bucket counts/sums (second narrow aggregate pass, ≤ a few
  *      hundred result rows to the driver);
  *   3. per-bucket window (`Window.partitionBy(bucket)`) plus the
  *      broadcast cumulative offset of all earlier buckets.
  *
  * The bucket id is a PURE FUNCTION of the row's key value
  * (`#boundaries ≤ key`), not of any physical partitioning — so the
  * offset map computed in phase 2 is consistent with phase 3 even if
  * Spark re-plans, re-samples, or recomputes between jobs. This is
  * what makes the result bit-identical to the single-partition
  * `row_number`: every row's bucket is stable, offsets are exact row
  * counts, and the within-bucket sort uses the caller's full sort
  * key. (A `repartitionByRange`+`monotonically_increasing_id` scheme
  * is one pass cheaper but ties rank correctness to two independent
  * jobs sampling identical range boundaries — a recompute hazard this
  * formulation doesn't have.)
  *
  * Requirements: `bucketBy` must be monotone-consistent with the
  * leading `order` column (usually the column itself, cast to
  * double; longs beyond 2^53 may merge adjacent buckets, which is
  * harmless — merged ties stay in one bucket). Rows with a NULL
  * bucket key all land in bucket −1, matching ASC NULLS FIRST
  * ordering; a DESCENDING leading column passes its negation as the
  * bucket key (q87/q179 do: order `n desc`, bucket `-n`); NULLS LAST
  * orders likewise need a caller-side monotone transform. Current
  * call sites (all non-null keys): q85/q100 quality ranks, q104 sweep
  * prefix sum, q131 exact quantile ranks, q166 equi-depth, q87/q179
  * vocab ranks via negation, FrameOps.withRowCount, q203/q208/q210/
  * q252/q263/q266/q276/q279/q296/q303/q313 rank/cumulative lanes,
  * q338 per-half decile ranks, q353 pair-slope median rank, and
  * q358's paired running sums (withRunningSums).
  *
  * At 100 TB: phase 1+2 are map-side-combined aggregates (tiny
  * shuffles), phase 3 shuffles the data once on the bucket id into
  * `buckets` parallel sorts — the same volume a global sort shuffles,
  * but with no single reduce task.
  */
object GlobalOrder {

  private val BucketCol = "__graft_gb"

  /** The helper traverses its input three times (boundaries, counts,
    * the ranked output) — pin ONE upstream computation so an expensive
    * lineage (a sessionization window, a decimal re-cast of a fact
    * scan) isn't paid per pass. The pin is handed to the memo LRU
    * (`Tables.adopt`), so `trimStorage`/`dropMemos` own its lifecycle;
    * Spark's cache manager dedups equivalent plans, so repeated calls
    * on the same frame share one entry. At cluster scale
    * MEMORY_AND_DISK spills — the same order of I/O a global sort's
    * shuffle files would cost.
    */
  private def pinned(df: DataFrame): DataFrame = {
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.core.Tables.adopt(df.sparkSession,
        s"globalOrder#${System.identityHashCode(df.queryExecution)}", df)
    }
    df
  }

  /** Quantile bucket boundaries for `bd` (may be fewer than requested
    * under heavy ties); None when the input has no non-null key.
    *
    * Boundary quality affects LOAD BALANCE only — the offsets are
    * recomputed from the actual bucket counts — so the probe runs on
    * a 5% sample with modest sketch accuracy (a 10× cheaper pass than
    * an exact-grade quantile, and at cluster scale the only pass whose
    * cost doesn't shrink with the answer). The sample falls back to
    * the full frame when it comes up empty (tiny inputs).
    */
  private[plans] def boundaries(df: DataFrame, bd: Column, buckets: Int): Option[Seq[Double]] = {
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val probsArr = array(probs.map(lit): _*)
    // ONE full-frame sketch, one driver round-trip. The previous
    // two-round-trip scheme (5% sample probe, full-frame retry when
    // the sample caught no non-null key) saved sketch-update CPU at
    // the cost of a second job on tiny inputs and a skew-prone
    // estimate everywhere; one modest-accuracy full sketch is both
    // the single job and the better-balanced bounds. Boundary quality
    // affects load balance only (law-tested), so sketch accuracy is
    // never a correctness knob.
    val row = df.agg(percentile_approx(bd, probsArr, lit(1000)).as("qs"))
      .collect()(0)
    if (row.isNullAt(0)) None
    else Some(row.getSeq[Double](0).filter(d => !d.isNaN).distinct.sorted)
  }

  /** Bucket id: −1 for NULL keys, else the count of boundaries ≤ key —
    * a pure, monotone function of the key value, computed by the
    * codegen'd [[BucketOfSorted]] binary search (lambda `filter` and
    * a 64-way CASE chain both measured interpreted-slow here).
    */
  private def bucketOf(bd: Column, bounds: Seq[Double]): Column =
    when(bd.isNull, lit(-1))
      .otherwise(Bridge.column(BucketOfSorted(Bridge.expression(bd), bounds.toArray)))

  /** Cumulative offsets per bucket id from per-bucket totals; returns
    * (offset-map-expression over the bucket column, grand total).
    */
  private def offsetExpr(perBucket: Seq[(Int, Long)]): (Column, Long) = {
    var acc = 0L
    val offs = perBucket.sortBy(_._1).map { case (b, c) =>
      val o = acc; acc += c; (b, o)
    }
    val m = map(offs.flatMap { case (b, o) => Seq(lit(b), lit(o)) }: _*)
    (element_at(m, col(BucketCol)), acc)
  }

  /** Exact 1-based global `row_number` over `order`, distributed.
    * `countName`, when set, adds the exact total row count as a
    * literal column (replacing the usual `count().over(partitionBy())`
    * global window, which is the same single-partition shape).
    */
  def withRowNumber(df0: DataFrame, order: Seq[Column], bucketBy: Column,
                    rankName: String, countName: Option[String] = None,
                    buckets: Int = 64): DataFrame = {
    val df = pinned(df0)
    val bd = bucketBy.cast(DoubleType)
    withRowNumberBounds(df, order, bd, rankName, countName,
      boundaries(df, bd, buckets))
  }

  /** [[withRowNumber]] with the bucket boundaries injected — the law
    * seam proving boundary QUALITY affects load balance only: any
    * bounds (exact quantiles, garbage, none) must produce identical
    * ranks, because offsets are recomputed from actual bucket counts
    * and the bucket id is a pure function of the key.
    */
  private[graft] def withRowNumberBounds(df: DataFrame, order: Seq[Column],
      bd: Column, rankName: String, countName: Option[String],
      boundsOpt0: Option[Seq[Double]]): DataFrame = {
    // normalize injected bounds: BucketOfSorted's binary search
    // requires sorted distinct values (driver-side, ≤ `buckets` items)
    val boundsOpt = boundsOpt0.map(_.filter(d => !d.isNaN).distinct.sorted)
      .filter(_.nonEmpty)
    boundsOpt match {
      case None => // empty input (or all-null keys): nothing to rank
        val out = df.withColumn(rankName,
          row_number().over(Window.orderBy(order: _*)).cast("long"))
        countName.fold(out)(n => out.withColumn(n, count(lit(1)).over(Window.partitionBy())))
      case Some(bounds) =>
        val tagged = df.withColumn(BucketCol, bucketOf(bd, bounds))
        val perBucket = tagged.groupBy(BucketCol).count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toSeq
        val (off, total) = offsetExpr(perBucket)
        val w = Window.partitionBy(BucketCol).orderBy(order: _*)
        val ranked = tagged
          .withColumn(rankName, row_number().over(w).cast("long") + off)
          .drop(BucketCol)
        countName.fold(ranked)(n => ranked.withColumn(n, lit(total)))
    }
  }

  /** Exact global running MAX of `value` (as BIGINT) in `order`,
    * distributed: per-bucket running max, combined (`greatest` skips
    * nulls) with the broadcast max of all earlier buckets.
    *
    * `exclusive = true` computes the max over STRICTLY EARLIER ROWS
    * (frame `UNBOUNDED PRECEDING .. 1 PRECEDING`; null for the global
    * first row) — the dominance-test shape (skyline: "best of
    * everything cheaper than me"). The exclusive frame is ROW-based,
    * so callers must pass a tie-free `order` (peers are NOT excluded).
    */
  def withRunningMax(df0: DataFrame, order: Seq[Column], bucketBy: Column,
                     value: Column, name: String, exclusive: Boolean = false,
                     buckets: Int = 64): DataFrame = {
    val df = pinned(df0)
    val bd = bucketBy.cast(DoubleType)
    val hi = if (exclusive) -1L else 0L
    boundaries(df, bd, buckets) match {
      case None =>
        val w = Window.orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, hi)
        df.withColumn(name, max(value.cast("long")).over(w))
      case Some(bounds) =>
        val tagged = df.withColumn(BucketCol, bucketOf(bd, bounds))
        val perBucket = tagged.groupBy(BucketCol)
          .agg(max(value.cast("long")).as("m")).collect()
          .map(r => r.getInt(0) ->
            (if (r.isNullAt(1)) None else Some(r.getLong(1))))
          .toSeq
        // offset for bucket b = max over buckets < b (inclusive of all
        // their rows — strictly earlier by bucket monotonicity).
        // Every bucket present in the data gets an entry once any
        // earlier bucket contributed a non-null max (an all-null
        // bucket forwards the accumulator unchanged); buckets before
        // the first contribution stay absent — element_at yields NULL
        // there and `greatest` skips it.
        var acc: Option[Long] = None
        val offs = perBucket.sortBy(_._1).flatMap { case (b, m) =>
          val o = acc.map(b -> _)
          acc = (acc, m) match {
            case (Some(a), Some(v)) => Some(math.max(a, v))
            case (a, v) => a.orElse(v)
          }
          o
        }
        val off =
          if (offs.isEmpty) lit(null).cast("long")
          else element_at(
            map(offs.flatMap { case (b, o) => Seq(lit(b), lit(o)) }: _*),
            col(BucketCol))
        val w = Window.partitionBy(BucketCol).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, hi)
        tagged
          .withColumn(name, greatest(max(value.cast("long")).over(w), off))
          .drop(BucketCol)
    }
  }

  /** Exact global running sum of `value` (as BIGINT) in `order`,
    * distributed: per-bucket running sum plus the broadcast total of
    * all earlier buckets.
    */
  def withRunningSum(df0: DataFrame, order: Seq[Column], bucketBy: Column,
                     value: Column, name: String, buckets: Int = 64): DataFrame =
    withRunningSums(df0, order, bucketBy, Seq(value -> name), buckets)

  /** Several running sums over ONE ordering in ONE pass: the bucket
    * probe, the per-bucket offset job, and the partitioned window are
    * all shared across the value columns (q358 needs two cumulative
    * lanes over the same spine — two sequential [[withRunningSum]]
    * calls would double every phase and pin an intermediate frame).
    */
  def withRunningSums(df0: DataFrame, order: Seq[Column], bucketBy: Column,
                      values: Seq[(Column, String)],
                      buckets: Int = 64): DataFrame = {
    val df = pinned(df0)
    val bd = bucketBy.cast(DoubleType)
    boundaries(df, bd, buckets) match {
      case None =>
        val w = Window.orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        values.foldLeft(df) { case (acc, (value, name)) =>
          acc.withColumn(name, sum(value.cast("long")).over(w))
        }
      case Some(bounds) =>
        val tagged = df.withColumn(BucketCol, bucketOf(bd, bounds))
        val perBucketRows = tagged.groupBy(BucketCol)
          .agg(sum(values.head._1.cast("long")).as("s0"),
            values.zipWithIndex.tail.map { case ((v, _), i) =>
              sum(v.cast("long")).as(s"s$i") }: _*)
          .collect()
        val w = Window.partitionBy(BucketCol).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val withCols = values.zipWithIndex.foldLeft(tagged) {
          case (acc, ((value, name), i)) =>
            val perBucket = perBucketRows
              // an all-null bucket sums to SQL NULL → contributes 0 to
              // the running total, matching the window sum's
              // null-skipping
              .map(r => r.getInt(0) ->
                (if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1))).toSeq
            val (off, _) = offsetExpr(perBucket)
            acc.withColumn(name, sum(value.cast("long")).over(w) + off)
        }
        withCols.drop(BucketCol)
    }
  }
}
