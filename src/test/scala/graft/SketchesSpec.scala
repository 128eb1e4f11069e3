package graft

import graft.functions.{MisraGries, Sketches}

/** Misra–Gries heavy hitters: the frequency guarantee holds across a
  * real multi-partition aggregation (merges included).
  */
class SketchesSpec extends SparkSpecBase {

  import spark.implicits._

  test("items above n/(k+1) survive a distributed aggregation") {
    // skewed stream: "hot" is 40% of 10k items, "warm" 20%, the rest
    // spread over a long tail of distinct keys
    val rnd = new scala.util.Random(3)
    val items = (1 to 10000).map { i =>
      val r = rnd.nextInt(10)
      if (r < 4) "hot" else if (r < 6) "warm" else s"tail${rnd.nextInt(2000)}"
    }
    val ds = items.toDS().repartition(8) // force partial buffers + merges
    val summary = ds.select(Sketches.heavyHitters(k = 10)).collect().head
    assert(summary.contains("hot"), summary.keys.toSeq.sorted.mkString(","))
    assert(summary.contains("warm"))
    assert(summary.size <= 10)
    // undercount bound: reported ≥ true - n/(k+1)
    val trueHot = items.count(_ == "hot").toLong
    assert(summary("hot") >= trueHot - 10000 / 11)
  }

  test("merge keeps the capacity bound and the undercount guarantee") {
    val mg = new MisraGries(3)
    val a = Seq("x", "x", "y", "z", "w").foldLeft(mg.zero)(mg.reduce)
    val b = Seq("x", "q", "q", "r").foldLeft(mg.zero)(mg.reduce)
    val m = mg.merge(a, b)
    assert(m.size <= 3)
    assert(m.contains("x")) // 3 of 9 items > 9/4
  }
}
