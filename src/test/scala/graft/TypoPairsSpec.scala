package graft

import org.apache.spark.sql.functions._

import graft.queries.Analytics3

/** Completeness law for the q363 banded typo-pair join: the length
  * bands are an OPTIMIZATION (turning |len diff| ≤ 2 into an
  * equi-join) and must be invisible in the result — the band join
  * must return exactly the pairs a brute-force cross join returns.
  *
  * The regression vocabulary pins the bug class this law exists for:
  * a pair whose lex-smaller token is LONGER and crosses a
  * floor(len/3) boundary downward (ta = "aabbcc" len 6 band 2,
  * tb = "abbcc" len 5 band 1, dl = 1) never meets under a one-sided
  * {b, b+1} left explode because the pair predicate (ta < tb) is
  * lexicographic, not length-ordered.
  */
class TypoPairsSpec extends SparkSpecBase {

  import spark.implicits._

  graft.functions.GraftFunctions.ensureRegistered(spark)

  private def bruteForce(v: org.apache.spark.sql.DataFrame) = {
    val l = v.select(col("t").as("ta"), col("n").as("na"))
    val r = v.select(col("t").as("tb"), col("n").as("nb"))
    l.crossJoin(r)
      .filter(expr("ta < tb AND abs(length(ta) - length(tb)) <= 2"))
      .withColumn("dl", expr("damerau_levenshtein(ta, tb)"))
      .filter(expr("dl <= 2"))
      .select("ta", "tb", "dl", "na", "nb")
  }

  private def law(tokens: Seq[String]): Unit = {
    val v = tokens.zipWithIndex
      .map { case (t, i) => (t, (i + 1).toLong) }.toDF("t", "n")
    val got = Analytics3.typoPairs(v)
      .select("ta", "tb", "dl", "na", "nb")
      .collect().map(_.toSeq).toSet
    val want = bruteForce(v).collect().map(_.toSeq).toSet
    assert(got == want,
      s"band join diverged from brute force: missing=${want -- got}, " +
        s"extra=${got -- want}")
  }

  test("lex-smaller-but-longer pair crossing a band boundary downward " +
    "is found (the one-sided-explode regression)") {
    // ta = "aabbcc" (len 6, band 2) < tb = "abbcc" (len 5, band 1),
    // dl = 1: bands differ by −1 in the lex direction.
    val v = Seq(("aabbcc", 3L), ("abbcc", 5L)).toDF("t", "n")
    val rows = Analytics3.typoPairs(v).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("ta") == "aabbcc")
    assert(rows.head.getAs[String]("tb") == "abbcc")
    assert(rows.head.getAs[Long]("dl") == 1L)
    assert(rows.head.getAs[String]("kind") == "indel")
  }

  test("band join ≡ brute force on a boundary-dense vocabulary") {
    // Lengths straddling every band boundary in [1, 10]; mixed lex
    // orders relative to length so both explode directions are hit.
    law(Seq(
      "a", "b", "ab", "ba", "abc", "abd", "acb", "abcd", "abce",
      "aabb", "abcde", "abbcc", "aabbcc", "zbbcc", "zabbcc",
      "abcdefg", "abcdefgh", "bbcdefgh", "abcdefghi"))
  }

  test("band join ≡ brute force on same-length swap/subst clusters") {
    law(Seq("color", "colro", "colour", "dolor", "colors", "coolr"))
  }

  test("multi-band meetings are collapsed (no duplicate pairs)") {
    val v = Seq(("abc", 1L), ("abd", 2L), ("abcd", 3L)).toDF("t", "n")
    val got = Analytics3.typoPairs(v)
      .groupBy("ta", "tb").count().filter(col("count") > 1).count()
    assert(got == 0L)
  }
}
