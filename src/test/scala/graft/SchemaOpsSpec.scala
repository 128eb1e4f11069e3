package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.functions.SchemaOps

/** Pins the reference schema contract (tests/test_schema_contract.py). */
class SchemaOpsSpec extends SparkSpecBase {

  test("promotion ladder: int widths and float beat ints, string on top") {
    assert(SchemaOps.promote(ByteType, IntegerType) == IntegerType)
    assert(SchemaOps.promote(LongType, FloatType) == FloatType)
    assert(SchemaOps.promote(IntegerType, DoubleType) == DoubleType)
    assert(SchemaOps.promote(DoubleType, StringType) == StringType)
    assert(SchemaOps.promote(NullType, ShortType) == ShortType)
  }

  test("promotion: unresolvable conflicts fall back to string") {
    assert(SchemaOps.promote(BooleanType, IntegerType) == StringType)
    assert(SchemaOps.promote(TimestampType, LongType) == StringType)
  }

  test("unify: field order of first appearance, missing fields nullable") {
    val a = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("v", FloatType)))
    val b = StructType(Seq(
      StructField("v", DoubleType),
      StructField("extra", StringType)))
    val u = SchemaOps.unify(Seq(a, b))
    assert(u.fieldNames.toSeq == Seq("id", "v", "extra"))
    assert(u("v").dataType == DoubleType)
    assert(u("id").nullable) // absent from b
    assert(u("extra").nullable)
  }

  test("strToBool: truthy vocabulary, null-preserving") {
    import spark.implicits._
    val df = Seq("true", "wahr", "1", "1.0", "yes", "ja", "ok", "o.k", "okay",
      "no", "false", "2", null).toDF("s")
    val out = df.select(SchemaOps.strToBool($"s").as("b")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(out.take(9).forall(_ == true))
    assert(out.slice(9, 12).forall(_ == false))
    assert(out(12) == null)
  }

  test("align: missing fields become typed nulls, extras drop, int→ts coerces") {
    import spark.implicits._
    val df = Seq((1L, "x", 86400000000L)).toDF("id", "junk", "ts")
    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("ts", TimestampType),
      StructField("absent", DoubleType)))
    val out = SchemaOps.align(df, target)
    assert(out.schema.fieldNames.toSeq == Seq("id", "ts", "absent"))
    val row = out.collect()(0)
    assert(row.getTimestamp(1).toInstant.toString == "1970-01-02T00:00:00Z")
    assert(row.isNullAt(2))
  }

  test("optDtype: shrinks longs and parses numeric strings") {
    import spark.implicits._
    val df = Seq((1L, "42", "1.5"), (2L, "7", "2.5")).toDF("n", "si", "sd")
    val prop = SchemaOps.optDtype(df)
    assert(prop("n") == ByteType)
    assert(prop("si") == ByteType)
    assert(prop("sd") == DoubleType)
  }

  test("optDtype: non-numeric strings untouched") {
    import spark.implicits._
    val df = Seq(("abc", 1000L)).toDF("s", "n")
    val prop = SchemaOps.optDtype(df)
    assert(!prop.contains("s"))
    assert(prop("n") == ShortType)
  }
}
