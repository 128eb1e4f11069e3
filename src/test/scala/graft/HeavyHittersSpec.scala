package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

/** The Misra–Gries candidate pass + exact recount must equal the
  * naive exact groupBy-HAVING definition bit-for-bit — the superset
  * guarantee means no heavy item is lost, the recount means no light
  * candidate survives.
  */
class HeavyHittersSpec extends SparkSpecBase {

  import spark.implicits._

  test("matches the naive exact definition on a skewed corpus") {
    val rnd = new scala.util.Random(7)
    // Zipf-ish: key k with frequency ~ N/k — a real heavy tail
    val rows = (1 to 50).flatMap(k => Seq.fill(2000 / k)(k.toLong)) ++
      Seq.fill(3000)(rnd.nextInt(100000).toLong + 1000L)
    val df = rnd.shuffle(rows).toDF("key").repartition(8)
    for (k <- Seq(10, 50, 200)) {
      val got = HeavyHitters.frequentItems(df, "key", k).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = HeavyHitters.naiveFrequentItems(df, "key", k).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == want, s"k=$k")
      assert(want.nonEmpty || k > 10, s"k=$k degenerate test data")
    }
  }

  test("uniform keys below threshold yield empty output") {
    val df = (1 to 10000).map(i => (i % 100).toLong).toDF("key").repartition(4)
    // every key has exactly 100 occurrences = n/100; > n/100 is false
    assert(HeavyHitters.frequentItems(df, "key", 100).collect().isEmpty)
  }

  test("null keys are ignored, not counted into the total") {
    val df = ((1 to 90).map(_ => Some(1L)) ++ (1 to 60).map(_ => None))
      .toDF("key")
    // n (non-null) = 90; key 1 has 90 > 90/2
    val got = HeavyHitters.frequentItems(df, "key", 2).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 90L)))
  }

  test("single partition with more distinct keys than counters still finds the hitters") {
    // forces MG decrement rounds: 1000 distinct light keys + 1 heavy,
    // k-1 = 4 counters
    val rows = (1 to 1000).map(_.toLong * 10) ++ Seq.fill(600)(7L)
    val df = rows.toDF("key").coalesce(1)
    val got = HeavyHitters.frequentItems(df, "key", 5).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(7L))
    assert(got.head.getLong(1) == 600L)
  }
}
