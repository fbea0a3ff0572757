package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, SparkSession}

/** Bridge into Spark's `private[sql]` classic-API surface.
  *
  * Spark 4 split `Column` from catalyst `Expression` (Spark Connect); the
  * supported conversion lives in `org.apache.spark.sql.classic.ExpressionUtils`
  * which is package-private to `org.apache.spark.sql`. This object is the one
  * place in the codebase allowed to reach it.
  */
object Shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply a SparkSessionExtensions configurator and return the names
    * it registered, resolving one function to prove the builder wiring
    * (test hook: `registerFunctions`/`FunctionRegistry` are
    * private[sql], and `spark.sql.extensions` is a static conf that a
    * same-JVM second session cannot exercise).
    */
  def extensionFunctionNames(
      f: org.apache.spark.sql.SparkSessionExtensions => Unit): Seq[String] = {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    f(ext)
    val registry =
      new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    ext.registerFunctions(registry)
    registry.listFunction().map(_.funcName)
  }

  def evalRegistered(
      f: org.apache.spark.sql.SparkSessionExtensions => Unit,
      name: String, args: Seq[Expression]): Any = {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    f(ext)
    val registry =
      new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    ext.registerFunctions(registry)
    registry.lookupFunction(FunctionIdentifier(name), args).eval(null)
  }

  /** Register a builder under `name` in the session's function registry so
    * the expression is usable from SQL text and `call_function`.
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val registry = spark.sessionState.functionRegistry
    val info = new ExpressionInfo("graft", name)
    registry.registerFunction(FunctionIdentifier(name), info, builder)
  }
}
