package graft

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.operators.BottomK

class BottomKSpec extends SparkSpecBase with TableDrivenPropertyChecks {
  import spark.implicits._

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.select("g", "v", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity)

  test("bottom-k merge law: bottomK(A ∪ B) == bottomK(bottomK(A) ∪ bottomK(B))") {
    // the mergeability that licenses per-partition / per-file /
    // per-day application + later combination (KMV sketches, split
    // sampling). Randomized over seeds; total order via (v, id).
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val mk = () => Seq.fill(rnd.nextInt(40))(
        (s"g${rnd.nextInt(3)}", rnd.nextInt(12).toLong, rnd.nextLong().abs))
      val a = mk().toDF("g", "v", "id")
      val b = mk().toDF("g", "v", "id")
      val k = 1 + rnd.nextInt(6)
      val direct = BottomK.perGroup(
        a.union(b), Seq("g"), Seq(col("v"), col("id")), k)
      val merged = BottomK.perGroup(
        BottomK.perGroup(a, Seq("g"), Seq(col("v"), col("id")), k)
          .union(BottomK.perGroup(b, Seq("g"), Seq(col("v"), col("id")), k)),
        Seq("g"), Seq(col("v"), col("id")), k)
      assert(sortedRows(direct).sameElements(sortedRows(merged)))
    }
  }

  test("keeps exactly min(k, group size) rows per group — the k smallest") {
    val df = Seq(
      ("a", 5L, 1L), ("a", 1L, 2L), ("a", 3L, 3L), ("a", 2L, 4L),
      ("b", 9L, 5L), ("b", 7L, 6L)).toDF("g", "v", "id")
    val out = sortedRows(BottomK.perGroup(df, Seq("g"), Seq(col("v"), col("id")), 2))
    assert(out.toSeq == Seq(("a", 1L, 2L), ("a", 2L, 4L), ("b", 7L, 6L), ("b", 9L, 5L)))
  }

  test("GLOBAL top-k (empty groupCols) keeps the k smallest and the bounded-heap plan") {
    // the no-group path eight queries ride (q396/q402/q414, q422,
    // q428, q430, q434): the global window MUST still plan bounded —
    // Catalyst rewrites it to TakeOrderedAndProject(limit=k) (the
    // distributed top-k take, per-partition heaps + k-row merge), or
    // a WindowGroupLimit heap. Without either the whole frame funnels
    // through one task — the incident class VERDICT r5 #2 flagged.
    val df = Seq.tabulate(200)(i => ("x", (i * 53 % 997).toLong, i.toLong))
      .toDF("g", "v", "id")
    val got = BottomK.perGroup(df, Seq.empty, Seq(col("v"), col("id")), 5)
    val expect = df.collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(identity).take(5).toSeq
    assert(got.select("v", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq == expect)
    val p = got.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject(limit=5")
      || p.contains("WindowGroupLimit"), p)
  }

  test("plans as a WindowGroupLimit bounded heap, never a full window sort") {
    // the rank column is dropped inside perGroup, which is exactly
    // what keeps the rewrite alive; this pin makes a future edit that
    // re-exposes the rank a failure instead of a 100 TB incident
    val df = Seq.tabulate(100)(i => (s"g${i % 4}", (i * 37 % 101).toLong, i.toLong))
      .toDF("g", "v", "id")
    val p = BottomK.perGroup(df, Seq("g"), Seq(col("v"), col("id")), 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }
}
