package graft

import graft.operators.Profile

/** Profile.table totality contract: NaN and overflow-range doubles,
  * dotted column names, all-null columns, and empty schemas must all
  * produce a report, never a crash or a silent misreport.
  */
class ProfileSpec extends SparkSpecBase {

  import spark.implicits._

  private def rowFor(df: org.apache.spark.sql.DataFrame, c: String) =
    df.filter(org.apache.spark.sql.functions.col("column") === c).head()

  test("NaN surfaces in max, not silently clipped") {
    val p = Profile.table(Seq(1.0, Double.NaN, 2.0).toDF("x"))
    val r = rowFor(p, "x")
    assert(r.getAs[String]("max_str") == "NaN")
    assert(r.getAs[String]("min_str") == "1.00")
    assert(r.getAs[Long]("n_nulls") == 0L)
  }

  test("overflow-range doubles fall back to native rendering under ANSI") {
    val p = Profile.table(Seq(1.0, 1e20).toDF("y"))
    val r = rowFor(p, "y")
    assert(r.getAs[String]("min_str") == "1.00")
    assert(r.getAs[String]("max_str").toDouble == 1e20)
  }

  test("dotted column names, all-null columns, zero columns") {
    val dotted = Seq((1, Option.empty[String]), (2, None))
      .toDF("a.b", "nulls")
    val p = Profile.table(dotted)
    assert(rowFor(p, "a.b").getAs[Long]("ndv_exact") == 2L)
    val n = rowFor(p, "nulls")
    assert(n.getAs[Long]("n_nulls") == 2L && n.getAs[Long]("ndv_exact") == 0L)
    assert(n.isNullAt(n.fieldIndex("min_str")))
    assert(Profile.table(spark.range(5).drop("id")).collect().isEmpty)
  }

  test("exactNdv = false skips the distinct lane (scale mode)") {
    val p = Profile.table(Seq(1, 2, 2).toDF("k"), exactNdv = false)
    val r = rowFor(p, "k")
    assert(r.isNullAt(r.fieldIndex("ndv_exact")))
    assert(r.getAs[Long]("ndv_approx") >= 1L)
  }
}
