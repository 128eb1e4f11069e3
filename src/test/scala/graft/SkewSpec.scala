package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted aggregation/join must be value-identical to the unsalted
  * forms (integer sums — no float-order concerns).
  */
class SkewSpec extends SparkSpecBase {

  import spark.implicits._

  private def skewed() = {
    // one hot key (90% of rows) + a long tail
    val rows = (1 to 2000).map { i =>
      val k = if (i % 10 != 0) "hot" else s"k${i % 37}"
      (k, i.toLong)
    }
    rows.toDF("k", "v")
  }

  test("saltedSumCount equals plain groupBy sums") {
    val df = skewed()
    val plain = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(df, Seq("k"), "v", salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin equals plain join") {
    val big = skewed()
    val dim = Seq(("hot", "H"), ("k3", "A"), ("k7", "B")).toDF("k", "tag")
    val plain = big.join(dim, Seq("k")).groupBy("k", "tag")
      .agg(sum("v").as("s")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(big, dim, Seq("k"), salts = 8)
      .groupBy("k", "tag").agg(sum("v").as("s")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  private def naivePairs(df: org.apache.spark.sql.DataFrame) =
    df.as("a").join(df.as("b"),
        col("a.k") === col("b.k") && col("a.v") < col("b.v"))
      .select(col("a.k"), col("a.v").as("v_1"), col("b.v").as("v_2"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("selfPairs equals the naive self-join, hot path engaged") {
    // one viral key with 60 items (> threshold 10) + a cold tail:
    // the probe must route k=hot through the salted branch and the
    // pair set must still be identical, each unordered pair once
    val rows = (1 to 60).map(i => ("hot", i.toLong)) ++
      (1 to 30).map(i => (s"k${i % 7}", (100 + i).toLong))
    val df = rows.toDF("k", "v").cache()
    val got = Skew.selfPairs(df, "k", "v", hotThreshold = 10L, salts = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naivePairs(df))
    assert(got.count(_._1 == "hot") == 60 * 59 / 2)
    df.unpersist()
  }

  test("selfPairs below threshold takes the plain single-join plan") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "v")
    val out = Skew.selfPairs(df, "k", "v", hotThreshold = 10L)
    // no salted branch: the plan carries no salt column and no union
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__salt") && !plan.toLowerCase.contains("union"))
    assert(out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq(("a", 1L, 2L)))
  }
}
