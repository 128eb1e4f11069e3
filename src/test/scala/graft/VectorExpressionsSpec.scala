package graft

import org.apache.spark.sql.functions._
import graft.functions.{PortableSql, VectorExpressions}

/** The codegen'd DotProductFloat must be bit-identical to the
  * portable-SQL HOF fold — that equivalence is what lets the fast
  * expression keep the DuckDB-oracle guarantee.
  */
class VectorExpressionsSpec extends SparkSpecBase {

  import spark.implicits._

  private val S = PortableSql.Spark

  test("dot product bit-matches the HOF fold on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      VectorExpressions.dot(col("a"), col("b")).as("fast"),
      expr(S.dot("a", "b")).as("slow")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("squared L2 distance bit-matches the HOF fold on random vectors") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      VectorExpressions.sqDist(col("a"), col("b")).as("fast"),
      expr(S.sqdist("a", "b")).as("slow")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("sqDist null propagation and identical-vector zero") {
    val df = Seq(
      (1L, Array(1.5f, -2.5f), Array(1.5f, -2.5f)),
      (2L, null.asInstanceOf[Array[Float]], Array(1.0f))).toDF("id", "a", "b")
    val out = df.select(VectorExpressions.sqDist(col("a"), col("b")).as("d"))
      .collect()
    assert(out(0).getDouble(0) == 0.0)
    assert(out(1).isNullAt(0))
  }

  test("norm matches sqrt of the HOF norm2, nulls propagate") {
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, null.asInstanceOf[Array[Float]])).toDF("id", "v")
    val out = df.select(
      VectorExpressions.norm(col("v")).as("n"),
      expr(s"sqrt(${S.norm2("v")})").as("ref")).collect()
    assert(out(0).getDouble(0) == 5.0 && out(0).getDouble(1) == 5.0)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
  }
}
