package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Expression-level helpers shared across operator modules. */
object ExprUtil {

  /** let-binding for a single expression: evaluates `value` ONCE per row
    * and hands the result to `body` as a bound lambda variable.
    *
    * This is the expression-level twin of [[Staging.barrier]], for places
    * a persist() barrier cannot go — streaming plans and single-Column
    * APIs. The repo's documented lambda-closure trap is that a lambda
    * body referencing an outer EXPRESSION makes Catalyst re-evaluate that
    * expression per element (no CSE inside lambdas — quadratic when the
    * expression itself scans the row's text). A `NamedLambdaVariable`,
    * by contrast, is a slot holding an already-computed value, so lambdas
    * in `body` that close over the bound variable read it for free.
    * `transform` over the 1-element array is that binder: `array(value)`
    * evaluates `value` once; `element_at(.., 1)` unwraps the result. */
  def bound(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), v => body(v)), 1)
}
