package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Native codegen'd 3-DIMENSIONAL Hilbert curve index — the t96 3-key
 * Morton interleave's locality upgrade, via Skilling's transpose
 * algorithm ("Programming the Hilbert curve", AIP Conf. Proc. 707,
 * 2004): undo-excess-work rotations per level (MSB down), one Gray
 * encode, a parity smear from the last axis, then an MSB-first
 * round-robin interleave of the transposed words. Like the 2-D
 * [[HilbertIndex]], the walk is a per-level LOOP rewriting its state —
 * inexpressible compactly as an expression tree — hence the generated
 * Java loop; interpreted eval is the identical recurrence.
 *
 * Caller contract mirrors [[graft.operators.Layout.zValueN]]: inputs
 * already in `[0, 2^bits)`; `3·bits ≤ 62` keeps the index positive;
 * NULL in → NULL out. Adjacency (every consecutive index step moves
 * exactly one cell in one dimension — Morton's Z breaks this at every
 * octant seam) is spec-verified on the full 8×8×8 grid via the
 * inverse transform.
 */
case class HilbertIndex3(first: Expression, second: Expression,
    third: Expression, bits: Int) extends TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert3"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.exists(_.dataType != LongType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects three bigint arguments")
    else if (bits < 1 || 3 * bits > 62)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs 1 <= bits and 3*bits <= 62")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    HilbertIndex3.index(Array(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long]), bits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val x = ctx.freshName("hX")
      val q = ctx.freshName("hQ")
      val p = ctx.freshName("hP")
      val t = ctx.freshName("hT")
      val i = ctx.freshName("hI")
      val d = ctx.freshName("hD")
      val qq = ctx.freshName("hQ2")
      s"""
         |long[] $x = new long[]{$a, $b, $c};
         |for (long $q = 1L << ${bits - 1}; $q > 1L; $q >>= 1) {
         |  long $p = $q - 1L;
         |  for (int $i = 0; $i < 3; $i++) {
         |    if (($x[$i] & $q) != 0L) {
         |      $x[0] ^= $p;
         |    } else {
         |      long $t = ($x[0] ^ $x[$i]) & $p;
         |      $x[0] ^= $t; $x[$i] ^= $t;
         |    }
         |  }
         |}
         |for (int $i = 1; $i < 3; $i++) $x[$i] ^= $x[$i - 1];
         |long $t = 0L;
         |for (long $qq = 1L << ${bits - 1}; $qq > 1L; $qq >>= 1)
         |  if (($x[2] & $qq) != 0L) $t ^= $qq - 1L;
         |for (int $i = 0; $i < 3; $i++) $x[$i] ^= $t;
         |long $d = 0L;
         |for (int $q = ${bits - 1}; $q >= 0; $q--)
         |  for (int $i = 0; $i < 3; $i++)
         |    $d = ($d << 1) | (($x[$i] >> $q) & 1L);
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): HilbertIndex3 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object HilbertIndex3 {
  /** Column-API entry: `graft_hilbert3(x, y, z, bits)`. */
  def apply(x: Column, y: Column, z: Column, bits: Int): Column =
    bridge.column(HilbertIndex3(bridge.expression(x),
      bridge.expression(y), bridge.expression(z), bits))

  /** The shared JVM recurrence (interpreted eval + spec replays):
    * Skilling AxestoTranspose followed by the MSB-first round-robin
    * interleave. MUTATES `x`. */
  private[graft] def index(x: Array[Long], bits: Int): Long = {
    val n = x.length
    var q = 1L << (bits - 1)
    while (q > 1L) {
      val p = q - 1L
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1L) { if ((x(n - 1) & q) != 0L) t ^= q - 1L; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    var d = 0L
    var b = bits - 1
    while (b >= 0) {
      i = 0
      while (i < n) { d = (d << 1) | ((x(i) >> b) & 1L); i += 1 }
      b -= 1
    }
    d
  }

  /** The inverse walk (index → axes) — spec-only, for the adjacency
    * and bijection properties (Skilling TransposetoAxes after
    * un-interleaving). */
  private[graft] def axes(d: Long, bits: Int, n: Int): Array[Long] = {
    val x = new Array[Long](n)
    var pos = n * bits - 1
    var b = bits - 1
    while (b >= 0) {
      var i = 0
      while (i < n) {
        x(i) |= ((d >> pos) & 1L) << b
        pos -= 1
        i += 1
      }
      b -= 1
    }
    var t = x(n - 1) >> 1
    var i = n - 1
    while (i > 0) { x(i) ^= x(i - 1); i -= 1 }
    x(0) ^= t
    var q = 2L
    val top = 2L << (bits - 1)
    while (q != top) {
      val p = q - 1L
      i = n - 1
      while (i >= 0) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i -= 1
      }
      q <<= 1
    }
    x
  }
}
