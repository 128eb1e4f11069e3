package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these converters
  * `private[sql]`; a shim package under org.apache.spark.sql is the
  * standard way for libraries to attach custom Catalyst expressions
  * to the public Column API without a session-extension hook.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Run a (possibly transformed) parsed logical plan as a DataFrame —
    * the plan-level equivalent of `spark.sql`, for callers that rewrite
    * relation identifiers before analysis.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Register a native (codegen-capable) expression under a SQL name —
    * the library-level equivalent of a SparkSessionExtensions
    * injectFunction hook, usable on an already-built session.
    */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Apply the function injections of a [[SparkSessionExtensions]] to an
    * already-built session — what `spark.sql.extensions` does at build
    * time, exposed for tests and late binding.
    */
  def applyFunctionExtensions(spark: SparkSession,
                              ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.registerFunctions(
      spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry)
}
