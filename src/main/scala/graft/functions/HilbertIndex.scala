package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Native codegen'd HILBERT curve index of two non-negative long keys —
 * the custom-`Expression` escape hatch (builder-prompt preference
 * order (b)) applied where expression trees genuinely cannot express
 * the computation compactly: the xy2d walk (Butz 1971; Hamilton 2006)
 * is a `bits`-iteration LOOP whose state (x, y) is rewritten every
 * level, so a tree formulation either explodes exponentially (each
 * level references the previous twice), pays the interpreted
 * higher-order-function path per level (nested let-bindings), or
 * stacks 2·bits projections (the staged form) — AUDIT_r16_hilbert
 * measures those at ~50× and ~15× this loop's cost respectively,
 * while the loop itself sits within 1.5× of Morton's flat tree. Both
 * eval paths are the identical classical recurrence: at level
 * `s = 2^i` the quadrant bits contribute `s²·((3·rx) xor ry)` to the
 * index and the frame reflects/transposes for the next level.
 *
 * Caller contract mirrors [[graft.operators.Layout.zValue]]: inputs
 * already in `[0, 2^bits)` (only low bits are read, out-of-domain
 * keys fold the space); bits ≤ 31 keeps the index in the positive
 * Long range; NULL in → NULL out.
 */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType || right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two bigint arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    else if (bits < 1 || bits > 31)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs 1 <= bits <= 31")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $a; long $y = $b; long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Column-API entry: `graft_hilbert(x, y, bits)`. */
  def apply(x: Column, y: Column, bits: Int): Column =
    bridge.column(HilbertIndex(
      bridge.expression(x), bridge.expression(y), bits))
}
