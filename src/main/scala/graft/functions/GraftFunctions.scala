package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graftshim.Bridge

/** Session-level registration of graft's native SQL functions, so the
  * dialect-paired SQL fragments (see [[SqlDialect]]) can call them by
  * name from `expr(...)` strings. Idempotent per session.
  */
object GraftFunctions {

  // weak keys: registration tracking must not pin discarded sessions
  // (per-tenant session churn would otherwise leak sessionState)
  private val done = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Arity guard: a bare args.head would surface as an anonymous
    * NoSuchElementException during analysis.
    */
  private[functions] def one(
      name: String,
      args: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
    : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(args.size == 1, s"$name expects exactly 1 argument, got ${args.size}")
    args.head
  }

  private[functions] def two(
      name: String,
      args: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
    : (org.apache.spark.sql.catalyst.expressions.Expression,
       org.apache.spark.sql.catalyst.expressions.Expression) = {
    require(args.size == 2, s"$name expects exactly 2 arguments, got ${args.size}")
    (args.head, args(1))
  }

  def ensureRegistered(spark: SparkSession): Unit = {
    if (done.add(spark)) {
      Bridge.registerFunction(spark, "portable_hash64",
        args => PortableHash64(GraftFunctions.one("portable_hash64", args)))
      Bridge.registerFunction(spark, "portable_md5_lanes",
        args => PortableMd5Lanes(GraftFunctions.one("portable_md5_lanes", args)))
      Bridge.registerFunction(spark, "nfc_normalize",
        args => NfcNormalize(GraftFunctions.one("nfc_normalize", args)))
      // registered under DuckDB's builtin names so dialect-SHARED SQL
      // text runs verbatim on both engines (the oracle-gate contract)
      Bridge.registerFunction(spark, "damerau_levenshtein",
        args => {
          val (a, b) = GraftFunctions.two("damerau_levenshtein", args)
          DamerauLevenshtein(a, b)
        })
      Bridge.registerFunction(spark, "hamming",
        args => {
          val (a, b) = GraftFunctions.two("hamming", args)
          HammingDistance(a, b)
        })
    }
  }
}

/** The production injection point: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` and every
  * session (including ones the library never touches directly) gets
  * graft's native functions at build time — no post-hoc registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("portable_hash64"),
      new ExpressionInfo(classOf[PortableHash64].getName, "portable_hash64"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PortableHash64(GraftFunctions.one("portable_hash64", args))))
    ext.injectFunction((
      FunctionIdentifier("portable_md5_lanes"),
      new ExpressionInfo(classOf[PortableMd5Lanes].getName, "portable_md5_lanes"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PortableMd5Lanes(GraftFunctions.one("portable_md5_lanes", args))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NfcNormalize(GraftFunctions.one("nfc_normalize", args))))
    ext.injectFunction((
      FunctionIdentifier("damerau_levenshtein"),
      new ExpressionInfo(classOf[DamerauLevenshtein].getName, "damerau_levenshtein"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val (a, b) = GraftFunctions.two("damerau_levenshtein", args)
        DamerauLevenshtein(a, b)
      }))
    ext.injectFunction((
      FunctionIdentifier("hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName, "hamming"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val (a, b) = GraftFunctions.two("hamming", args)
        HammingDistance(a, b)
      }))
  }
}
