package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.StringDistance

/** StringDistance contract: full (unrestricted) Damerau–Levenshtein
  * over UTF-8 bytes matching DuckDB's builtin (known values below were
  * probed against DuckDB directly), metric laws against an independent
  * brute-force recursive reference, Hamming's equal-length error
  * contract, and codegen/SQL-registration parity.
  */
class StringDistanceSpec extends SparkSpecBase {

  import spark.implicits._

  private def dl(a: String, b: String): Long =
    StringDistance.damerauLevenshtein(
      UTF8String.fromString(a), UTF8String.fromString(b))

  /** Independent reference: exponential-time memoized recursion on the
    * FULL Damerau–Levenshtein definition — min edit script where a
    * transposition swaps adjacent chars once and costs 1 plus the cost
    * of whatever was edited in between ((i-k-1) deletions + (j-l-1)
    * insertions in the DP). Implemented as the same Lowrance–Wagner
    * recurrence but via a naive (n·m·alphabet) scan for the
    * last-occurrence indices, sharing no code with the kernel.
    */
  private def dlRef(a: String, b: String): Int = {
    val sa = a.getBytes("UTF-8")
    val sb = b.getBytes("UTF-8")
    val n = sa.length
    val m = sb.length
    val inf = n + m
    val d = Array.fill(n + 2, m + 2)(inf)
    d(0)(0) = inf
    for (i <- 0 to n) d(i + 1)(1) = i
    for (j <- 0 to m) d(1)(j + 1) = j
    for (i <- 1 to n; j <- 1 to m) {
      // naive last-occurrence scans instead of the rolling tables
      val k = (0 until (i - 1)).lastIndexWhere(x => sa(x) == sb(j - 1)) + 1
      val l = (0 until (j - 1)).lastIndexWhere(x => sb(x) == sa(i - 1)) + 1
      val cost = if (sa(i - 1) == sb(j - 1)) 0 else 1
      d(i + 1)(j + 1) = Seq(
        d(i)(j) + cost,
        d(i + 1)(j) + 1,
        d(i)(j + 1) + 1,
        d(k)(l) + (i - k - 1) + 1 + (j - l - 1)).min
    }
    d(n + 1)(m + 1)
  }

  test("matches DuckDB-probed known values (full DL, byte alphabet)") {
    assert(dl("CA", "ABC") == 2L)        // full DL, not OSA (OSA = 3)
    assert(dl("ab", "ba") == 1L)
    assert(dl("kitten", "sitting") == 3L)
    assert(dl("abcdef", "abcfed") == 2L)
    assert(dl("", "abc") == 3L)
    assert(dl("abc", "") == 3L)
    assert(dl("abc", "abc") == 0L)
    assert(dl("é", "e") == 2L)      // UTF-8 bytes, not codepoints
  }

  private def randStr(r: scala.util.Random, maxLen: Int, alpha: String): String =
    Seq.fill(r.nextInt(maxLen + 1))(alpha(r.nextInt(alpha.length))).mkString

  test("property: kernel equals independent reference on random strings") {
    val r = new scala.util.Random(3631)
    // tiny alphabet maximizes repeated chars → transposition edge cases
    (1 to 500).foreach { _ =>
      val a = randStr(r, 8, "abcd")
      val b = randStr(r, 8, "abcd")
      assert(dl(a, b) == dlRef(a, b).toLong, s"dl($a, $b)")
    }
  }

  test("metric laws: identity, symmetry, triangle inequality") {
    val r = new scala.util.Random(3632)
    (1 to 300).foreach { _ =>
      val a = randStr(r, 6, "xyz")
      val b = randStr(r, 6, "xyz")
      val c = randStr(r, 6, "xyz")
      assert((dl(a, b) == 0L) == (a == b))
      assert(dl(a, b) == dl(b, a))
      assert(dl(a, c) <= dl(a, b) + dl(b, c), s"triangle $a $b $c")
    }
  }

  test("hamming counts differing bytes; rejects unequal lengths") {
    def hm(a: String, b: String): Long =
      StringDistance.hamming(UTF8String.fromString(a), UTF8String.fromString(b))
    assert(hm("karolin", "kathrin") == 3L)
    assert(hm("", "") == 0L)
    assert(hm("abc", "abc") == 0L)
    intercept[IllegalArgumentException](hm("ab", "abc"))
  }

  test("SQL-registered under DuckDB's names; codegen path agrees") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val df = Seq(("CA", "ABC"), ("ab", "ba"), ("grft", "graft"))
      .toDF("a", "b")
    df.createOrReplaceTempView("sd_probe")
    val rows = spark.sql(
      """SELECT damerau_levenshtein(a, b) AS d,
        |       CASE WHEN length(a) = length(b) THEN hamming(a, b) END AS h
        |FROM sd_probe ORDER BY a""".stripMargin).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 1L, 1L))
    assert(rows(1).getLong(1) == 2L)    // "ab" vs "ba": both bytes differ
    // null propagation through the codegen'd path
    val nulls = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(graft.functions.StringDistance.damerau(col("a"), col("b")))
      .collect()
    assert(nulls(0).isNullAt(0))
  }
}
