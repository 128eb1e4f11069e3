package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Bucketed range join: same result as the naive BETWEEN join, hash
  * join plan instead of nested-loop.
  */
class RangeJoinSpec extends SparkSpecBase {

  import spark.implicits._

  test("matches the naive between-join exactly") {
    val rnd = new scala.util.Random(11)
    val points = (1 to 500).map(id => (id.toLong, rnd.nextInt(10000).toLong))
      .toDF("pid", "p")
    val intervals = (1 to 80).map { id =>
      val lo = rnd.nextInt(9500).toLong
      (id.toLong, lo, lo + rnd.nextInt(800).toLong)
    }.toDF("iid", "lo", "hi")

    val fast = RangeJoin(points, intervals, "p", "lo", "hi", bucket = 256)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive)
    assert(fast.nonEmpty)
  }

  test("extra equi keys restrict matches per key") {
    val points = Seq(("a", 1L, 5L), ("b", 2L, 5L)).toDF("k", "pid", "p")
    val intervals = Seq(("a", 10L, 0L, 9L)).toDF("k", "iid", "lo", "hi")
    val out = RangeJoin(points, intervals, "p", "lo", "hi", bucket = 4, keys = Seq("k"))
    assert(out.select("pid").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("values beyond 2^53 bucket exactly (nanosecond timestamps)") {
    // double division would round trunc((2^62+999)/1000) into the wrong
    // bucket and silently drop the match; integral `div` cannot
    val base = 1L << 62
    val points = Seq((1L, base + 999)).toDF("pid", "p")
    val intervals = Seq((7L, base + 500, base + 1500)).toDF("iid", "lo", "hi")
    val out = RangeJoin(points, intervals, "p", "lo", "hi", bucket = 1000)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 7L)))
  }

  test("auto bucket width matches the naive join too") {
    val rnd = new scala.util.Random(13)
    val points = (1 to 200).map(id => (id.toLong, rnd.nextInt(5000).toLong))
      .toDF("pid", "p")
    val intervals = (1 to 40).map { id =>
      val lo = rnd.nextInt(4800).toLong
      (id.toLong, lo, lo + rnd.nextInt(400).toLong)
    }.toDF("iid", "lo", "hi")
    val fast = RangeJoin.auto(points, intervals, "p", "lo", "hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive)
  }

  test("hash-join plan, not nested loop") {
    val points = (1 to 100).map(i => (i.toLong, i.toLong * 10)).toDF("pid", "p")
    val intervals = Seq((1L, 0L, 500L)).toDF("iid", "lo", "hi")
    val plan = RangeJoin(points, intervals, "p", "lo", "hi", bucket = 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
  }

  test("overlap matches the naive quadratic overlap join, one row per pair") {
    val rnd = new scala.util.Random(41)
    // bounds span negative values: `div` truncates toward zero, and the
    // keep-at-later-start-bucket dedup relies only on its monotonicity,
    // which must hold on both sides of zero
    val mk = (tag: String) => (1 to 120).map { i =>
      val lo = (rnd.nextInt(1000) - 500).toLong
      (s"k${rnd.nextInt(3)}", s"$tag$i", lo, lo + rnd.nextInt(60))
    }
    val a = mk("a").toDF("k", "ida", "lo_a", "hi_a")
    val b = mk("b").toDF("k", "idb", "lo_b", "hi_b")
    val naive = a.as("x").join(b.as("y"),
        col("x.k") === col("y.k") &&
          col("lo_a") <= col("hi_b") && col("lo_b") <= col("hi_a"))
      .select("ida", "idb").collect().map(r => (r.getString(0), r.getString(1)))
    // several bucket widths, incl. ones smaller than the intervals
    // (multi-bucket pairs must still surface exactly once)
    Seq(7L, 25L, 64L, 1000L).foreach { w =>
      val got = RangeJoin.overlap(a, b, "lo_a", "hi_a", "lo_b", "hi_b",
          bucket = w, keys = Seq("k"))
        .select("ida", "idb").collect().map(r => (r.getString(0), r.getString(1)))
      assert(got.length == got.distinct.length, s"dup pairs at bucket=$w")
      assert(got.sorted.toSeq == naive.sorted.toSeq, s"mismatch at bucket=$w")
    }
  }

  test("overlap plans as a hash join, not a nested loop") {
    val a = (1 to 50).map(i => (i.toLong, i.toLong + 5)).toDF("lo_a", "hi_a")
    val b = (1 to 50).map(i => (i.toLong + 2, i.toLong + 9)).toDF("lo_b", "hi_b")
    val plan = RangeJoin.overlap(a, b, "lo_a", "hi_a", "lo_b", "hi_b", bucket = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
  }
}
