package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.DotProduct

/**
 * Session extensions: registers the engine's native expressions for SQL
 * use. Activate with
 * `SparkSession.builder().withExtensions(new GraftExtensions)` or
 * `spark.sql.extensions=graft.GraftExtensions`; then
 * `SELECT graft_dot(a, b)` works in plain SQL.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      GraftExtensions.dotBuilder))
  }
}

object GraftExtensions {
  private val dotBuilder:
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression = { children =>
    require(children.length == 2, "graft_dot expects exactly 2 arguments")
    DotProduct(children.head, children(1))
  }

  /** Registry-path registration for an ALREADY-RUNNING session (the
    * builder path only applies at session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_dot", dotBuilder, "built-in")
}
