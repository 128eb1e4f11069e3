package graft

import graft.functions.BloomExpressions
import org.apache.spark.sql.functions._

/** Bloom membership probe: no false negatives ever, bounded false
  * positives, null-safe, and usable as a scan-side predicate.
  */
class BloomExpressionsSpec extends SparkSpecBase {

  import spark.implicits._

  test("members always probe true; non-members mostly false") {
    val members = (0L until 1000L).map(_ * 2) // evens
    val bf = BloomExpressions.buildLong(members.toDF("v"), "v",
      expectedItems = members.size, fpp = 0.01)
    val probed = (0L until 2000L).toDF("v")
      .withColumn("hit", BloomExpressions.mightContain(bf, col("v")))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val (evens, odds) = probed.partition(_._1 % 2 == 0)
    assert(evens.forall(_._2), "a bloom filter can never false-negative")
    val fp = odds.count(_._2)
    assert(fp <= 50, s"false-positive rate implausibly high: $fp/1000 at fpp=0.01")
  }

  test("null input probes to null, not false") {
    val bf = BloomExpressions.buildLong(Seq(1L).toDF("v"), "v", 1)
    val out = Seq(Some(1L), None).toDF("v")
      .select(BloomExpressions.mightContain(bf, col("v")).as("hit"))
      .collect()
    assert(out(0).getBoolean(0))
    assert(out(1).isNullAt(0))
  }

  test("non-bigint input is rejected at analysis") {
    val bf = BloomExpressions.buildLong(Seq(1L).toDF("v"), "v", 1)
    val e = intercept[Exception] {
      Seq("a").toDF("s")
        .select(BloomExpressions.mightContain(bf, col("s"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("bigint"), e.getMessage)
  }

  test("prefilter + exact confirm equals the exact semi-join") {
    // the q121 shape: bloom may pass extra rows, the confirm join
    // removes them — the composition must equal the plain semi-join
    val corpus = (0L until 5000L).toDF("v")
    val bench = (0L until 5000L).filter(_ % 97 == 0).toDF("v")
    val bf = BloomExpressions.buildLong(bench, "v", 52, 0.05)
    val viaBloom = corpus
      .filter(BloomExpressions.mightContain(bf, col("v")))
      .join(broadcast(bench), Seq("v"), "left_semi")
      .collect().map(_.getLong(0)).sorted
    val exact = corpus.join(bench, Seq("v"), "left_semi")
      .collect().map(_.getLong(0)).sorted
    assert(viaBloom.toSeq == exact.toSeq)
  }
}
