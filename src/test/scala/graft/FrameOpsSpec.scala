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
      .collect().map(r => (r.getString(0), r.getInt(2)))
    assert(out.toSeq == Seq(("a", 0), ("b", 1), ("c", 2)))
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
}
