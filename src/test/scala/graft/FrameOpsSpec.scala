package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.FrameOps

/** Pins the frame-helper contract (reference
  * tests/test_helpers_contract.py:89-227).
  */
class FrameOpsSpec extends SparkSpecBase {

  import spark.implicits._

  test("dropNullColumns removes all-null columns only") {
    val df = Seq((1, Option.empty[String], "x"), (2, None, "y"))
      .toDF("id", "dead", "alive")
    val out = FrameOps.dropNullColumns(df)
    assert(out.columns.toSeq == Seq("id", "alive"))
  }

  test("explodeAll explodes arrays, keeps empty arrays as null rows") {
    val df = Seq((1, Seq("a", "b")), (2, Seq.empty[String])).toDF("id", "xs")
    val out = FrameOps.explodeAll(df).collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getString(1)))
    assert(out.toSet == Set((1, "a"), (1, "b"), (2, null)))
  }

  test("unnestAll flattens nested structs with joined names") {
    val df = Seq((1, ("a", (2.5, true)))).toDF("id", "s")
      .select(col("id"), col("s._1").as("name"),
        struct(col("s._2._1").as("x"), col("s._2._2").as("ok")).as("inner"))
      .select(col("id"), struct(col("name"), col("inner")).as("payload"))
    val out = FrameOps.unnestAll(df)
    assert(out.columns.toSeq == Seq("id", "payload_name", "payload_inner_x", "payload_inner_ok"))
    val r = out.collect()(0)
    assert(r.getInt(0) == 1 && r.getString(1) == "a" && r.getDouble(2) == 2.5 && r.getBoolean(3))
  }

  test("withRowCount is deterministic in the declared order") {
    val df = Seq(("c", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    val out = FrameOps.withRowCount(df, Seq("k")).orderBy("row_nr")
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 0L), ("b", 1L), ("c", 2L)))
    // numeric leading key: the distributed (bucketed) path, same contract
    val num = FrameOps.withRowCount(df, Seq("v", "k")).orderBy("row_nr")
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(num.toSeq == Seq(("c", 0L), ("a", 1L), ("b", 2L)))
  }

  test("strftime and truncated columns derive from the timestamp") {
    val df = Seq(Tuple1(java.sql.Timestamp.valueOf("2024-03-05 10:30:45"))).toDF("ts")
    val out = FrameOps.withTruncatedColumns(
      FrameOps.withStrftimeColumns(df, "ts", Map("ym" -> "yyyy-MM")),
      "ts", Seq("hour"))
    val r = out.collect()(0)
    assert(r.getString(1) == "2024-03")
    assert(r.getTimestamp(2).toString == "2024-03-05 10:00:00.0")
  }

  test("delta keeps rows absent from other, null-safe, on a subset") {
    val src = Seq((1L, Option("a"), 10), (2L, None, 20), (3L, Option("c"), 30))
      .toDF("k", "s", "v")
    val tgt = Seq((1L, Option("a"), 99), (2L, Option.empty[String], 99))
      .toDF("k", "s", "x")
    // null-safe: (2, null) matches (2, null) and is dropped
    val out = FrameOps.delta(src, tgt, Seq("k", "s")).select("k").as[Long].collect()
    assert(out.toSeq == Seq(3L))
    // default subset = common columns (k, s) → same result
    val out2 = FrameOps.delta(src, tgt).select("k").as[Long].collect()
    assert(out2.toSeq == Seq(3L))
  }

  test("delta plans as a left-anti join (no row explosion)") {
    val src = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val tgt = Seq((1L, "a")).toDF("k", "s")
    val p = FrameOps.delta(src, tgt).queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), p)
  }

  test("castRelaxed coerces, fills missing with nulls, keeps extras") {
    import org.apache.spark.sql.types._
    val df = Seq((1, "2.5", "keepme")).toDF("id", "num", "extra")
    val target = StructType(Seq(
      StructField("id", LongType), StructField("num", DoubleType),
      StructField("absent", StringType)))
    val out = FrameOps.castRelaxed(df, target)
    assert(out.columns.toSeq == Seq("id", "num", "absent", "extra"))
    val r = out.collect()(0)
    assert(r.getLong(0) == 1L && r.getDouble(1) == 2.5 && r.isNullAt(2)
      && r.getString(3) == "keepme")
  }
}
