package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.DeltaJoin

/** The incremental-join identity must hold as a MULTISET equality:
  * base⋈base ∪ appendDelta == (base∪Δ)⋈(base∪Δ), duplicates and all.
  */
class DeltaJoinSpec extends SparkSpecBase {

  import spark.implicits._

  private def multiset(df: DataFrame): Map[Seq[Any], Long] =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length.toLong).toMap

  test("append delta completes the base join to the full join (randomized, with dup keys)") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      def mk(n: Int, tag: String) = (1 to n).map { i =>
        (rnd.nextInt(40).toLong, s"$tag$i")
      }
      val aAll = mk(200, "a"); val bAll = mk(150, "b")
      val (aBaseR, aDeltaR) = aAll.partition(_ => rnd.nextInt(10) < 8)
      val (bBaseR, bDeltaR) = bAll.partition(_ => rnd.nextInt(10) < 8)
      val aBase = aBaseR.toDF("k", "av").repartition(4)
      val aDelta = aDeltaR.toDF("k", "av").repartition(2)
      val bBase = bBaseR.toDF("k", "bv").repartition(4)
      val bDelta = bDeltaR.toDF("k", "bv").repartition(2)
      val got = multiset(aBase.join(bBase, Seq("k"))
        .unionByName(DeltaJoin.appendDelta(aBase, aDelta, bBase, bDelta, Seq("k"))))
      val want = multiset(DeltaJoin.fullJoin(aBase, aDelta, bBase, bDelta, Seq("k")))
      assert(got == want, s"trial $trial")
    }
  }

  test("empty deltas produce an empty delta join") {
    val a = Seq((1L, "x")).toDF("k", "av")
    val b = Seq((1L, "y")).toDF("k", "bv")
    val empty = a.limit(0)
    val emptyB = b.limit(0)
    assert(DeltaJoin.appendDelta(a, empty, b, emptyB, Seq("k")).count() == 0)
  }

  test("delta joins broadcast the increment — no base-side shuffle for the probe terms") {
    val aBase = (1 to 5000).map(i => (i.toLong % 97, i.toLong)).toDF("k", "av")
    val aDelta = (1 to 20).map(i => (i.toLong % 97, -i.toLong)).toDF("k", "av")
    val bBase = (1 to 5000).map(i => (i.toLong % 97, i.toLong)).toDF("k", "bv")
    val bDelta = (1 to 20).map(i => (i.toLong % 97, -i.toLong)).toDF("k", "bv")
    val p = DeltaJoin.appendDelta(aBase, aDelta, bBase, bDelta, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
