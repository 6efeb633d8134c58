package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⟷ Expression bridge. Spark 4 moved the classic `Column.expr`
  * accessor behind `private[sql]` (`org.apache.spark.sql.classic.
  * ExpressionUtils`, columnNodeSupport.scala); extensions conventionally
  * bridge from inside the package. This is the only file outside the
  * `graft` namespace. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column → Expression conversion. [[expression]] wraps the
    * column node lazily (`ColumnNodeExpression`), which the analyzer
    * only unwraps on DataFrame API paths — an expression returned from a
    * FunctionRegistry builder must already be a plain Catalyst tree
    * (possibly with UnresolvedFunction leaves, which the analyzer DOES
    * resolve) or execution hits "Cannot generate code". This runs the
    * classic converter up front. */
  def expressionEager(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** The persisted RDD under a `localCheckpoint`ed / `checkpoint`ed
    * Dataset. `Dataset.unpersist` releases only CacheManager entries, so
    * checkpoint blocks otherwise linger until GC (ContextCleaner) — this
    * exposes the handle for deterministic release. */
  def checkpointedRdd(df: org.apache.spark.sql.Dataset[_])
      : Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
}
