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
}
