package graft

import org.apache.spark.sql.functions._

/** Laws for the round-10 Analytics9 lanes: the greedy packing fold
  * against a plain Scala reference, and the packing invariants that
  * make q543's output trustworthy at any corpus.
  */
class Analytics9Spec extends SparkSpecBase {

  import spark.implicits._

  // the same fold text q543 runs, applied to an explicit size array
  private def sparkPack(zs: Seq[Long]): (Long, Long) = {
    val df = Seq(Tuple1(zs)).toDF("zs")
    // mirror of Analytics9.packFold(Sp, "zs") — kept textually tiny
    // here; a divergence from the shipped text fails the q543 gate,
    // this spec pins the SEMANTICS against a reference implementation
    val fold = "aggregate(transform(zs, z -> array(z)), " +
      "array(CAST(0 AS BIGINT), CAST(0 AS BIGINT)), (acc, x) -> " +
      "CASE WHEN element_at(acc, 2) + element_at(x, 1) <= 512 " +
      "THEN array(element_at(acc, 1), element_at(acc, 2) + element_at(x, 1)) " +
      "ELSE array(element_at(acc, 1) + 1, element_at(x, 1)) END)"
    val r = df.select(expr(fold).as("st")).head().getSeq[Long](0)
    (r(0), r(1))
  }

  private def refPack(zs: Seq[Long]): Long = {
    var bins = 0L; var cur = 0L
    zs.foreach { z =>
      if (cur + z <= 512) cur += z else { bins += 1; cur = z }
    }
    bins + (if (cur > 0) 1 else 0)
  }

  test("greedy packing fold == reference first-fit-in-order, and the " +
    "packing invariants hold") {
    val cases: Seq[Seq[Long]] = Seq(
      Seq(512L), Seq(513L - 1L), Seq(1L, 511L, 1L), Seq(256L, 256L, 256L),
      Seq.fill(100)(5L), Seq(512L, 512L, 512L), Seq(100L, 412L, 1L, 511L),
      (1L to 60L), (1L to 60L).reverse, Seq(509L, 2L, 2L, 2L, 509L))
    for (zs <- cases) {
      val (closed, cur) = sparkPack(zs)
      val bins = closed + (if (cur > 0) 1 else 0)
      assert(bins == refPack(zs), s"fold != reference for $zs")
      val total = zs.sum
      val ideal = (total + 511) / 512
      assert(bins >= ideal, s"greedy beat the ideal bound for $zs")
      assert(bins * 512 >= total, s"capacity violated for $zs")
      // first-fit-in-order never opens more than 2x+1 the ideal
      // (each closed bin is > half-full unless forced by one item)
      assert(bins <= 2 * ideal + 1, s"greedy pathological for $zs")
    }
  }

  test("count-derived panel moduli are stable at the gate scale and " +
    "shrink panels at growth scale") {
    // the verdict-#4 rule in number form: the gate corpus reproduces
    // the historical literals; 10x the corpus does NOT grow the panel
    def mod(n: Long, p: Long) = math.max(1L, n / p)
    assert(mod(500, 20) == 25 && mod(500, 25) == 20) // sf0.01 embeddings
    assert(mod(2000, 20) == 100)                     // sf0.1
    for (n <- Seq(500L, 2000L, 20000L, 2000000L); p <- Seq(10L, 20L, 25L)) {
      val panel = (0L until n).count(_ % mod(n, p) == 0)
      assert(panel <= p + p / 2 && panel >= 1,
        s"panel size $panel drifts from target $p at n=$n")
    }
  }
}
