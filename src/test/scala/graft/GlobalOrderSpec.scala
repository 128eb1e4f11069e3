package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.GlobalOrder

/** GlobalOrder must be BIT-IDENTICAL to the single-partition
  * `Window.orderBy` it replaces — rank, total count, and running sum —
  * including under heavy ties, tiny inputs, and empty inputs.
  */
class GlobalOrderSpec extends SparkSpecBase {

  import spark.implicits._

  test("rowNumber matches the single-partition row_number on a total order") {
    val df = (1 to 5000).map { i =>
      (i.toLong, (i * 2654435761L % 100003L).toDouble / 7.0)
    }.toDF("id", "v").repartition(8)
    val order = Seq(col("v"), col("id"))
    val expected = df.withColumn("rn", row_number().over(Window.orderBy(order: _*)))
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = GlobalOrder.withRowNumber(df, order, col("v"), "rn", countName = Some("n"))
    val rows = got.collect()
    assert(rows.length == 5000)
    rows.foreach { r =>
      assert(r.getAs[Long]("rn") == expected(r.getAs[Long]("id")).toLong)
      assert(r.getAs[Long]("n") == 5000L)
    }
  }

  test("rowNumber survives heavy ties (few distinct bucket keys)") {
    // 3 distinct values across 10k rows: most quantile boundaries
    // collapse; ranks must still be exact via the id tiebreak
    val df = (1 to 10000).map(i => (i.toLong, (i % 3).toDouble)).toDF("id", "v")
      .repartition(8)
    val order = Seq(col("v"), col("id"))
    val expected = df.withColumn("rn", row_number().over(Window.orderBy(order: _*)))
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = GlobalOrder.withRowNumber(df, order, col("v"), "rn").collect()
    got.foreach(r => assert(r.getAs[Long]("rn") == expected(r.getAs[Long]("id")).toLong))
  }

  test("runningSum matches the single-partition prefix sum") {
    val df = (1 to 4000).map { i =>
      (i.toLong % 977, if (i % 2 == 0) 1 else -1)
    }.toDF("t", "delta").repartition(8)
    val order = Seq(col("t").asc, col("delta").asc)
    val w = Window.orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("cur", sum(col("delta").cast("long")).over(w))
      .groupBy("t").agg(max("cur").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = GlobalOrder.withRunningSum(df, order, col("t"), col("delta"), "cur")
      .groupBy("t").agg(max("cur").as("m"))
      .collect()
    assert(got.length == expected.size)
    got.foreach(r => assert(r.getLong(1) == expected(r.getLong(0))))
  }

  test("withRunningSums == two sequential withRunningSum passes") {
    // the shared-pass variant (one bucket probe, one offset job, one
    // window) must be value-identical to chaining single-column calls
    val df = (1 to 3000).map { i =>
      (i.toLong, (i % 41).toLong, (i % 7).toLong, (i * 13 % 29).toLong)
    }.toDF("id", "v", "a", "b").repartition(8)
    val order = Seq(col("v"), col("id"))
    val multi = GlobalOrder.withRunningSums(df, order, col("v"),
        Seq(col("a") -> "ca", col("b") -> "cb"))
      .select("id", "ca", "cb").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val single = GlobalOrder.withRunningSum(
        GlobalOrder.withRunningSum(df, order, col("v"), col("a"), "ca"),
        order, col("v"), col("b"), "cb")
      .select("id", "ca", "cb").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(multi.sameElements(single))
  }

  test("empty input falls back cleanly") {
    val df = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(GlobalOrder.withRowNumber(df, Seq(col("v")), col("v"), "rn",
      countName = Some("n")).collect().isEmpty)
    assert(GlobalOrder.withRunningSum(df, Seq(col("v")), col("v"),
      col("id"), "cur").collect().isEmpty)
    assert(GlobalOrder.withRunningMax(df, Seq(col("v")), col("v"),
      col("id"), "m").collect().isEmpty)
  }

  test("runningMax (inclusive + exclusive) matches the single-partition window, nulls included") {
    val rnd = new scala.util.Random(41)
    // tie-free order key; ~10% null values exercise greatest's
    // null-skipping and the all-null-bucket offset forwarding
    val df = (1 to 3000).map { i =>
      (i.toLong, rnd.nextDouble() * 1000,
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(1000).toLong))
    }.toDF("id", "k", "v").repartition(8)
    val order = Seq(col("k").asc, col("id").asc)
    for (excl <- Seq(false, true)) {
      val hi = if (excl) -1L else 0L
      val w = Window.orderBy(order: _*).rowsBetween(Window.unboundedPreceding, hi)
      val expected = df.withColumn("m", max(col("v")).over(w))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      val got = GlobalOrder.withRunningMax(df, order, col("k"), col("v"), "m",
          exclusive = excl, buckets = 16).collect()
      assert(got.length == 3000)
      got.foreach { r =>
        val m = if (r.isNullAt(3)) -1L else r.getLong(3)
        assert(m == expected(r.getLong(0)), s"excl=$excl id=${r.getLong(0)}")
      }
    }
  }

  test("boundary quality never affects values: garbage bounds == exact bounds == no bounds") {
    // offsets are recomputed from ACTUAL bucket counts and the bucket
    // id is a pure function of the key, so any bounds — adversarially
    // skewed, out-of-range, duplicated, unsorted, or absent — must
    // yield bit-identical ranks; only load balance may differ
    val df = (1 to 4000).map { i =>
      (i.toLong, (i * 48271L % 2311L).toDouble)
    }.toDF("id", "v").repartition(8)
    val order = Seq(col("v"), col("id"))
    val bd = col("v").cast("double")
    val expected = GlobalOrder.withRowNumberBounds(df, order, bd, "rn",
        Some("n"), None)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("rn"), r.getAs[Long]("n"))).toMap
    val boundsCases = Seq(
      Seq(-1e9, 0.0, 3.0, 3.0, 17.5, 1e12),         // skewed + dupes + out of range
      Seq(2310.0, 1.0, 500.0),                       // unsorted
      Seq(Double.NaN, 100.0),                        // NaN filtered
      (1 to 63).map(_ * 2311.0 / 64),                // near-exact quantiles
      Seq(1e18))                                     // single bound beyond range
    for (bounds <- boundsCases) {
      val got = GlobalOrder.withRowNumberBounds(df, order, bd, "rn",
        Some("n"), Some(bounds)).collect()
      assert(got.length == 4000, s"bounds=$bounds")
      got.foreach { r =>
        assert((r.getAs[Long]("rn"), r.getAs[Long]("n")) ==
          expected(r.getAs[Long]("id")), s"bounds=$bounds id=${r.getAs[Long]("id")}")
      }
    }
  }

  test("plan shape: the rank window is partitioned — no global window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = (1 to 2000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = GlobalOrder.withRowNumber(df, Seq(col("v"), col("id")), col("v"), "rn")
    val bad = out.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
