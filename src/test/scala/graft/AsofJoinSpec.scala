package graft

import graft.operators.AsofJoin

/** As-of join semantics: latest right row with time <= left time, per
  * key; null payload when nothing precedes.
  */
class AsofJoinSpec extends SparkSpecBase {

  import spark.implicits._

  test("picks the latest preceding right row, inclusive at equal time") {
    val left = Seq(("u1", 1L, 100L), ("u1", 2L, 250L), ("u2", 3L, 50L))
      .toDF("k", "lid", "t")
    val right = Seq(("u1", 10L, 100L), ("u1", 20L, 200L), ("u2", 30L, 60L))
      .toDF("k", "rid", "rt")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("rid", "rt"))
      .orderBy("lid").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(3)) null else r.getLong(3)))
    // lid=1 at t=100 matches rid=10 (equal time inclusive);
    // lid=2 at t=250 matches rid=20 (latest preceding);
    // lid=3 at t=50 precedes u2's only right row → null
    assert(out.toSeq == Seq((1L, 10L), (2L, 20L), (3L, null)))
  }

  test("left rows and columns are preserved exactly") {
    val left = Seq(("k", 1L, 5L, "extra")).toDF("k", "lid", "t", "note")
    val right = Seq(("k", 9L, 1L)).toDF("k", "rid", "rt")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("rid"))
    assert(out.columns.toSeq == Seq("k", "lid", "t", "note", "rid"))
    val r = out.collect()(0)
    assert(r.getString(3) == "extra" && r.getLong(4) == 9L)
  }

  test("forward direction picks the earliest following right row") {
    val left = Seq(("u", 1L, 100L), ("u", 2L, 201L), ("u", 3L, 999L))
      .toDF("k", "lid", "t")
    val right = Seq(("u", 10L, 100L), ("u", 20L, 200L), ("u", 30L, 300L))
      .toDF("k", "rid", "rt")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("rid"),
        direction = "forward")
      .orderBy("lid").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(3)) null else r.getLong(3)))
    // t=100 → rid=10 (inclusive); t=201 → rid=30 (next following);
    // t=999 → nothing follows → null
    assert(out.toSeq == Seq((1L, 10L), (2L, 30L), (3L, null)))
  }

  test("nearest picks the smaller gap either side, ties to backward") {
    val left = Seq(("u", 1L, 100L), ("u", 2L, 205L), ("u", 3L, 195L))
      .toDF("k", "lid", "t")
    val right = Seq(("u", 10L, 90L), ("u", 20L, 300L)).toDF("k", "rid", "rt")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("rid"),
        direction = "nearest")
      .orderBy("lid").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(3)) null else r.getLong(3)))
    // t=100: gaps 10 back vs 200 fwd → rid=10; t=205: 115 vs 95 → rid=20;
    // t=195: 105 vs 105 — tie goes backward → rid=10
    assert(out.toSeq == Seq((1L, 10L), (2L, 20L), (3L, 10L)))
  }

  test("nearest applies the tolerance on each side independently") {
    val left = Seq(("u", 1L, 100L), ("u", 2L, 500L)).toDF("k", "lid", "t")
    val right = Seq(("u", 10L, 89L), ("u", 20L, 104L)).toDF("k", "rid", "rt")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("rid"),
        direction = "nearest", tolerance = Some(5L))
      .orderBy("lid").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(3)) null else r.getLong(3)))
    // t=100: backward gap 11 > 5 (disqualified), forward gap 4 ≤ 5 →
    // rid=20; t=500: neither side within 5 → null
    assert(out.toSeq == Seq((1L, 20L), (2L, null)))
  }

  test("nearest with both sides in tolerance still picks by gap") {
    // backward gap 7 and forward gap 4, both ≤ 10 → forward wins
    val left = Seq(("u", 1L, 100L)).toDF("k", "lid", "t")
    val right = Seq(("u", 10L, 93L), ("u", 20L, 104L)).toDF("k", "rid", "rt")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("rid"),
        direction = "nearest", tolerance = Some(10L)).collect().head
    assert(out.getLong(out.fieldIndex("rid")) == 20L)
  }

  test("payload fields come from the SAME matched row (null included)") {
    // nearest preceding row holds a NULL payload: a per-column carry
    // would reach past it to an out-of-tolerance older row; the struct
    // carry must attach the matched row as-is
    val left = Seq(("u", 1L, 100L)).toDF("k", "lid", "t")
    val right = Seq(("u", Some(5L), 10L), ("u", None, 90L))
      .toDF("k", "p", "rt")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("p"),
        tolerance = Some(50L))
      .collect().head
    // matched row is rt=90 (gap 10 ≤ 50) whose payload IS null — not
    // the rt=10 row's p=5
    assert(out.isNullAt(out.fieldIndex("p")))
  }

  test("date-typed time columns join (tolerance unit = days)") {
    val left = Seq(("k", 1L, java.sql.Date.valueOf("2024-03-10")))
      .toDF("k", "lid", "d")
    val right = Seq(
      ("k", 10L, java.sql.Date.valueOf("2024-03-01")),
      ("k", 20L, java.sql.Date.valueOf("2024-03-08"))).toDF("k", "rid", "rd")
    val out = AsofJoin(left, right, Seq("k"), "d", "rd", Seq("rid"),
        tolerance = Some(5L))
      .collect().head
    assert(out.getLong(out.fieldIndex("rid")) == 20L) // 2 days back, ≤5
  }

  test("tolerance with mismatched time-unit families is rejected") {
    // timestamp micros vs date days: the gap check would silently
    // compare across units — must throw, not mismatch quietly
    val left = Seq(("k", 1L, java.sql.Timestamp.valueOf("2024-03-10 00:00:00")))
      .toDF("k", "lid", "t")
    val right = Seq(("k", 10L, java.sql.Date.valueOf("2024-03-09")))
      .toDF("k", "rid", "rd")
    val e = intercept[IllegalArgumentException] {
      AsofJoin(left, right, Seq("k"), "t", "rd", Seq("rid"),
        tolerance = Some(86400000000L))
    }
    assert(e.getMessage.contains("unit families"))
    // numeric vs timestamp likewise
    intercept[IllegalArgumentException] {
      AsofJoin(right.withColumnRenamed("rd", "n").withColumn("n", $"rid"),
        left, Seq("k"), "n", "t", Seq("lid"), tolerance = Some(1L))
    }
  }

  test("tolerance nulls out matches beyond the window") {
    val left = Seq(("u", 1L, 100L), ("u", 2L, 500L)).toDF("k", "lid", "t")
    val right = Seq(("u", 10L, 90L)).toDF("k", "rid", "rt")
    val out = AsofJoin(left, right, Seq("k"), "t", "rt", Seq("rid"),
        tolerance = Some(50L))
      .orderBy("lid").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(3)) null else r.getLong(3)))
    // t=100 is 10 units after rt=90 (≤50 → match); t=500 is 410 after (> 50)
    assert(out.toSeq == Seq((1L, 10L), (2L, null)))
  }
}
