package graft

import org.apache.spark.sql.functions._

import graft.operators.DeltaAgg

/** DeltaAgg law: merging signed changes into a maintained state must
  * equal a full recompute over (base ∖ retractions) ⊎ inserts as a
  * multiset of groups — including NULL group keys, zero-crossing
  * groups (all rows retracted → group disappears), and brand-new
  * groups arriving only in the delta.
  */
class DeltaAggSpec extends SparkSpecBase {

  import spark.implicits._

  private def groupSet(df: org.apache.spark.sql.DataFrame) =
    df.select("k1", "k2", "n_rows", "n_vals", "sum_v").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2),
        r.getLong(3), Option(r.get(4)))).toSet

  test("merge ≡ recompute on random data with null keys, " +
    "disappearing groups, and delta-only groups") {
    val rnd = new scala.util.Random(77)
    def key(): (Integer, String) = (
      if (rnd.nextInt(10) == 0) null
      else Integer.valueOf(rnd.nextInt(5)),
      if (rnd.nextInt(10) == 0) null else s"g${rnd.nextInt(4)}")
    val base = Seq.fill(400) { val (a, b) = key(); (a, b, rnd.nextInt(100).toLong) }
      .toDF("k1", "k2", "v")
    // retract a deterministic subset of EXACT base rows; insert fresh
    // rows including a key combo absent from the base
    val dels = base.filter(expr("v % 7 = 0"))
      .withColumn("op", lit(-1))
    val ins = (Seq.fill(80) { val (a, b) = key(); (a, b, rnd.nextInt(100).toLong) } :+
      ((Integer.valueOf(99), "fresh", 5L)))
      .toDF("k1", "k2", "v").withColumn("op", lit(1))
    val changes = dels.unionByName(ins)

    val state = DeltaAgg.fromBase(base, Seq("k1", "k2"), "v")
    val merged = DeltaAgg.merge(state, changes, Seq("k1", "k2"), "v", "op")

    // recompute: base minus the retracted multiset, plus inserts.
    // dels retracts each selected row once; base rows are distinct
    // multiset members, so an anti-join on all columns removes
    // exactly the retracted OCCURRENCES here because v%7=0 selects
    // whole equal-row classes either way.
    val kept = base.filter(expr("v % 7 <> 0"))
    val updated = kept.unionByName(ins.drop("op"))
    val want = DeltaAgg.fromBase(updated, Seq("k1", "k2"), "v")

    assert(groupSet(merged) == groupSet(want),
      s"missing=${(groupSet(want) -- groupSet(merged)).take(3)} " +
        s"extra=${(groupSet(merged) -- groupSet(want)).take(3)}")
  }

  test("an all-NULL-value group keeps a NULL sum through merges " +
    "(the recompute semantic)") {
    val base = Seq[(Int, String, java.lang.Long)](
      (1, "a", null), (1, "a", null), (2, "b", 5L))
      .toDF("k1", "k2", "v")
    val changes = Seq[(Int, String, java.lang.Long, Int)](
      (3, "c", 9L, 1)).toDF("k1", "k2", "v", "op")
    val out = DeltaAgg.merge(
      DeltaAgg.fromBase(base, Seq("k1", "k2"), "v"),
      changes, Seq("k1", "k2"), "v", "op")
    val nullGrp = out.filter(col("k1") === 1).collect().head
    assert(nullGrp.getAs[Long]("n_rows") == 2L)
    assert(nullGrp.getAs[Long]("n_vals") == 0L)
    assert(nullGrp.isNullAt(nullGrp.fieldIndex("sum_v")),
      "all-NULL group's sum must stay NULL after merge")
  }

  test("retracting every row of a group removes the group") {
    val base = Seq((1, "a", 10L), (1, "a", 20L), (2, "b", 5L))
      .toDF("k1", "k2", "v")
    val changes = Seq((1, "a", 10L, -1), (1, "a", 20L, -1))
      .toDF("k1", "k2", "v", "op")
    val out = DeltaAgg.merge(
      DeltaAgg.fromBase(base, Seq("k1", "k2"), "v"),
      changes, Seq("k1", "k2"), "v", "op")
    assert(out.count() == 1L)
    assert(out.select("k1").as[Int].head() == 2)
  }

  private def minMaxSet(df: org.apache.spark.sql.DataFrame) =
    df.select("k1", "k2", "n_rows", "n_vals", "min_v", "max_v").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2),
        r.getLong(3), Option(r.get(4)), Option(r.get(5)))).toSet

  test("mergeMinMax ≡ recompute under extremum retractions, null keys, " +
    "null values, disappearing and delta-only groups") {
    val rnd = new scala.util.Random(91)
    def key(): (Integer, String) = (
      if (rnd.nextInt(10) == 0) null
      else Integer.valueOf(rnd.nextInt(5)),
      if (rnd.nextInt(10) == 0) null else s"g${rnd.nextInt(4)}")
    def value(): java.lang.Long =
      if (rnd.nextInt(8) == 0) null else java.lang.Long.valueOf(rnd.nextInt(100).toLong)
    val base = Seq.fill(400) { val (a, b) = key(); (a, b, value()) }
      .toDF("k1", "k2", "v")
    // v%7=0 retracts whole equal-row classes — including rows that ARE
    // a group's min or max (the case the bounded recompute exists for)
    val dels = base.filter(expr("v % 7 = 0")).withColumn("op", lit(-1))
    val ins = (Seq.fill(80) { val (a, b) = key(); (a, b, value()) } :+
      ((Integer.valueOf(99), "fresh", java.lang.Long.valueOf(5L))))
      .toDF("k1", "k2", "v").withColumn("op", lit(1))
    val kept = base.filter(expr("v % 7 <> 0 OR v IS NULL"))
    val updated = kept.unionByName(ins.drop("op"))

    val merged = DeltaAgg.mergeMinMax(
      DeltaAgg.fromBaseMinMax(base, Seq("k1", "k2"), "v"),
      dels.unionByName(ins), Seq("k1", "k2"), "v", "op")(updated)
    val want = DeltaAgg.fromBaseMinMax(updated, Seq("k1", "k2"), "v")
    assert(minMaxSet(merged) == minMaxSet(want),
      s"missing=${(minMaxSet(want) -- minMaxSet(merged)).take(3)} " +
        s"extra=${(minMaxSet(merged) -- minMaxSet(want)).take(3)}")
  }

  test("mergeMinMax never reads the base when no retraction ties an extremum") {
    val base = Seq((1, "a", 10L), (1, "a", 50L), (1, "a", 30L),
      (2, "b", 5L), (2, "b", 9L)).toDF("k1", "k2", "v")
    // interior retraction (30 is strictly between 10 and 50) + inserts
    // that extend an extremum monotonically + a brand-new group
    val changes = Seq((1, "a", 30L, -1), (1, "a", 60L, 1), (3, "c", 7L, 1))
      .toDF("k1", "k2", "v", "op")
    val out = DeltaAgg.mergeMinMax(
      DeltaAgg.fromBaseMinMax(base, Seq("k1", "k2"), "v"),
      changes, Seq("k1", "k2"), "v", "op")(
      fail("base must not be evaluated for a safe batch"))
    val m = out.collect().map(r => (r.getInt(0), (r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)))).toMap
    assert(m(1) == ((3L, 3L, 10L, 60L)))
    assert(m(2) == ((2L, 2L, 5L, 9L)))
    assert(m(3) == ((1L, 1L, 7L, 7L)))
  }

  test("retracting a group's extremum re-aggregates ONLY touched groups " +
    "and matches recompute") {
    val base = Seq((1, "a", 10L), (1, "a", 50L), (2, "b", 5L), (2, "b", 9L))
      .toDF("k1", "k2", "v")
    val changes = Seq((1, "a", 50L, -1)).toDF("k1", "k2", "v", "op")
    val updated = Seq((1, "a", 10L), (2, "b", 5L), (2, "b", 9L))
      .toDF("k1", "k2", "v")
    val out = DeltaAgg.mergeMinMax(
      DeltaAgg.fromBaseMinMax(base, Seq("k1", "k2"), "v"),
      changes, Seq("k1", "k2"), "v", "op")(updated)
    assert(minMaxSet(out) ==
      minMaxSet(DeltaAgg.fromBaseMinMax(updated, Seq("k1", "k2"), "v")))
    // and the recompute branch is key-bounded: a left-semi join on the
    // group keys gates the base scan
    val p = out.queryExecution.optimizedPlan.toString
    assert(p.contains("LeftSemi"), p)
  }

  test("merge is incremental-composition-consistent: " +
    "two batches ≡ one combined batch") {
    val base = Seq((1, "a", 3L), (2, "b", 4L)).toDF("k1", "k2", "v")
    val b1 = Seq((1, "a", 7L, 1), (2, "b", 4L, -1)).toDF("k1", "k2", "v", "op")
    val b2 = Seq((3, "c", 9L, 1), (1, "a", 3L, -1)).toDF("k1", "k2", "v", "op")
    val st = DeltaAgg.fromBase(base, Seq("k1", "k2"), "v")
    val twoStep = DeltaAgg.merge(
      DeltaAgg.merge(st, b1, Seq("k1", "k2"), "v", "op"),
      b2, Seq("k1", "k2"), "v", "op")
    val oneStep = DeltaAgg.merge(st, b1.unionByName(b2),
      Seq("k1", "k2"), "v", "op")
    assert(groupSet(twoStep) == groupSet(oneStep))
  }
}
