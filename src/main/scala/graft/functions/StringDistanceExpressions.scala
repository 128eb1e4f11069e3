package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd string-distance expressions Spark lacks natively.
  *
  * Spark ships `levenshtein` only; typo-tolerant vocabulary
  * clustering and fuzzy entity matching want the transposition-aware
  * Damerau–Levenshtein ("hte" → "the" is ONE keyboard slip, not two
  * independent edits) and the fixed-length Hamming distance (hash
  * prefixes, fingerprints). Both are implemented over UTF-8 BYTES —
  * the same alphabet DuckDB's `damerau_levenshtein`/`hamming`
  * builtins use (verified empirically: `damerau_levenshtein('é','e')
  * = 2`, the two-byte UTF-8 encoding) — which is what lets the
  * oracle gate share ONE SQL text across both engines.
  *
  * This is the FULL (unrestricted, Lowrance–Wagner) Damerau–
  * Levenshtein, not the restricted OSA variant: `('CA','ABC') = 2`
  * (CA → AC → ABC, a transposition later edited *between*), where
  * OSA gives 3. DuckDB implements the full variant, so we must too.
  *
  * Kernels are static methods invoked from generated code (the
  * [[NfcNormalize]] pattern): the DP loop runs inside whole-stage
  * codegen with no boxing, and interpreted eval shares the identical
  * kernel.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "damerau_levenshtein"

  override def nullSafeEval(a: Any, b: Any): Any =
    StringDistance.damerauLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringDistance.damerauLevenshtein($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class HammingDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "hamming"

  override def nullSafeEval(a: Any, b: Any): Any =
    StringDistance.hamming(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringDistance.hamming($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringDistance {

  /** Full Damerau–Levenshtein over UTF-8 bytes (Lowrance–Wagner DP
    * with the last-occurrence alphabet table). O(n·m) time and one
    * flat int matrix of (n+2)·(m+2) — callers feed tokens/names, not
    * documents; at vocabulary-term lengths the matrix is a few
    * hundred bytes and never escapes the young generation.
    */
  def damerauLevenshtein(ua: UTF8String, ub: UTF8String): Long = {
    val sa = ua.getBytes
    val sb = ub.getBytes
    val n = sa.length
    val m = sb.length
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    val inf = n + m
    val w = m + 2
    val d = new Array[Int]((n + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= n) {
      d((i + 1) * w) = inf
      d((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= m) {
      d(j + 1) = inf
      d(w + j + 1) = j
      j += 1
    }
    val da = new Array[Int](256)
    i = 1
    while (i <= n) {
      var db = 0
      val ai = sa(i - 1) & 0xff
      j = 1
      while (j <= m) {
        val bj = sb(j - 1) & 0xff
        val k = da(bj)
        val l = db
        var cost = 1
        if (ai == bj) { cost = 0; db = j }
        var best = d(i * w + j) + cost                    // substitute/match
        val ins = d((i + 1) * w + j) + 1                  // insert
        if (ins < best) best = ins
        val del = d(i * w + j + 1) + 1                    // delete
        if (del < best) best = del
        val tra = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1) // transpose
        if (tra < best) best = tra
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      da(ai) = i
      i += 1
    }
    d((n + 1) * w + m + 1).toLong
  }

  /** Hamming distance over UTF-8 bytes; DuckDB's `hamming` rejects
    * unequal lengths, and silently returning a number for unequal
    * inputs would hide a caller bug, so we mirror the error contract.
    */
  def hamming(ua: UTF8String, ub: UTF8String): Long = {
    val sa = ua.getBytes
    val sb = ub.getBytes
    if (sa.length != sb.length)
      throw new IllegalArgumentException(
        s"hamming: strings must be of equal length (${sa.length} vs ${sb.length})")
    var diff = 0L
    var i = 0
    while (i < sa.length) {
      if (sa(i) != sb(i)) diff += 1L
      i += 1
    }
    diff
  }

  def damerau(a: Column, b: Column): Column =
    Bridge.column(DamerauLevenshtein(Bridge.expression(a), Bridge.expression(b)))

  def hammingCol(a: Column, b: Column): Column =
    Bridge.column(HammingDistance(Bridge.expression(a), Bridge.expression(b)))
}
