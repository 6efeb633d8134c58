package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Level buffer for [[QuantileSketchAgg]]: `n` counts ALL non-null rows
  * observed; `levels(l)` holds values of weight `2^l`. Total weight is
  * an INVARIANT equal to `n` (compaction is weight-preserving). */
private[graft] final class QuantileBuffer(
    var n: Long,
    val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Double]])

/**
 * Mergeable quantile sketch as a custom `TypedImperativeAggregate` —
 * the at-scale twin of exact sort-based percentiles, completing the
 * sketch family next to the Misra–Gries heavy hitters (`p7`/`p8`) and
 * the HLL cardinality twin (`w3`), same exact/approx pairing rule.
 *
 * Why the exact form doesn't scale unconditionally: an exact percentile
 * needs the sorted value multiset — a corpus-wide sort (or a
 * value-domain group-by) per profiled column. This sketch keeps at most
 * `capacity` values PER LEVEL with weights 2^level (Munro & Paterson
 * 1980's multi-pass selection structure, in the one-pass mergeable form
 * of Agarwal et al., "Mergeable Summaries", PODS'12): fixed memory, one
 * pass, map-side combinable.
 *
 * Determinism rule (the repo's differential-gate requirement): KLL's
 * randomized compactor is replaced by the DETERMINISTIC keep-odd rule —
 * compact a sorted even-length run by promoting the elements at odd
 * positions (1, 3, …) to the next level at doubled weight. If a level
 * holds an odd count, its MINIMUM stays behind so the compacted run is
 * even — total weight is preserved exactly (`Σ weight·2^level == n`,
 * spec-asserted), so rank targets never drift.
 *
 * Guarantees (QuantileSketchSpec):
 *   - `n ≤ capacity` ⇒ NO compaction ever fires ⇒ the sketch holds every
 *     value at weight 1 and `eval` IS the exact percentile — this
 *     degeneration is the oracle-gated regime (`p9`), the p7 precedent;
 *   - over capacity, each reported quantile's true rank deviates from
 *     its target by at most ε·n with ε = O(log²(n/capacity)/capacity)
 *     (deterministic bound; empirically ≪ that — spec-gated on both the
 *     weight invariant and the observed rank error);
 *   - merge is concatenate-then-compact: guarantees hold under ANY
 *     partitioning / merge order (values may differ, bounds don't).
 *
 * Rank semantics are pinned explicitly (NOT delegated to an engine's
 * percentile flavor): for probability q over n rows the target rank is
 * `ceil(q·n)` computed in IEEE double (`math.ceil(q * n)`), clamped to
 * ≥ 1, and the answer is the smallest value whose cumulative weight
 * reaches it. The oracle mirrors the same formula with
 * `CAST(q AS DOUBLE)` so both engines round the target identically even
 * where decimal and binary q·n disagree (q=0.1, n=500 → 51, not 50).
 *
 * eval output: `array<struct<p double, value double>>`, one entry per
 * requested probability in input order. NaN inputs are rejected by
 * contract (profiled metrics are finite); nulls are skipped like every
 * SQL aggregate.
 */
case class QuantileSketchAgg(
    child: Expression,
    capacity: Int,
    probabilities: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_quantile_sketch"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("p", DoubleType), StructField("value", DoubleType))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType if capacity >= 2 && probabilities.nonEmpty &&
        probabilities.forall(p => p > 0.0 && p <= 1.0) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a double column, capacity >= 2 and " +
        s"probabilities in (0, 1], got ${child.dataType.simpleString}, " +
        s"capacity=$capacity, probabilities=$probabilities")
  }

  override def createAggregationBuffer(): QuantileBuffer =
    new QuantileBuffer(0L, mutable.ArrayBuffer(mutable.ArrayBuffer.empty))

  /** Promote the odd-position elements of sorted level `l` (its minimum
    * staying behind when the count is odd) to level `l+1`; cascade. */
  private def compact(buf: QuantileBuffer, l: Int): Unit = {
    val level = buf.levels(l)
    if (level.size <= capacity) return
    if (l + 1 >= buf.levels.size) buf.levels += mutable.ArrayBuffer.empty
    val a = level.toArray
    java.util.Arrays.sort(a)
    val start = a.length % 2 // odd count: a(0) stays at this level
    val next = buf.levels(l + 1)
    var i = start + 1
    while (i < a.length) { next += a(i); i += 2 }
    level.clear()
    if (start == 1) level += a(0)
    compact(buf, l + 1)
  }

  override def update(buf: QuantileBuffer, input: InternalRow): QuantileBuffer = {
    val v = child.eval(input)
    if (v == null) return buf
    buf.n += 1
    buf.levels(0) += v.asInstanceOf[Double]
    if (buf.levels(0).size > capacity) compact(buf, 0)
    buf
  }

  override def merge(buf: QuantileBuffer, other: QuantileBuffer): QuantileBuffer = {
    buf.n += other.n
    while (buf.levels.size < other.levels.size)
      buf.levels += mutable.ArrayBuffer.empty
    var l = 0
    while (l < other.levels.size) {
      buf.levels(l) ++= other.levels(l)
      l += 1
    }
    l = 0
    while (l < buf.levels.size) { compact(buf, l); l += 1 }
    buf
  }

  override def eval(buf: QuantileBuffer): Any = {
    // weighted items sorted by value; cumulative-weight walk per target
    val items = mutable.ArrayBuffer.empty[(Double, Long)]
    var l = 0
    while (l < buf.levels.size) {
      val w = 1L << l
      buf.levels(l).foreach(v => items += ((v, w)))
      l += 1
    }
    val sorted = items.sortBy(_._1).toArray
    val out = probabilities.map { p =>
      if (buf.n == 0L) InternalRow(p, null)
      else {
        val target = math.max(1L, math.ceil(p * buf.n).toLong)
        var cum = 0L
        var i = 0
        var ans = sorted.last._1
        var found = false
        while (i < sorted.length && !found) {
          cum += sorted(i)._2
          if (cum >= target) { ans = sorted(i)._1; found = true }
          i += 1
        }
        InternalRow(p, ans)
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def serialize(buf: QuantileBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.levels.size)
    buf.levels.foreach { level =>
      out.writeInt(level.size)
      level.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): QuantileBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val nLevels = in.readInt()
    val levels = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Double]]
    var l = 0
    while (l < nLevels) {
      val sz = in.readInt()
      val level = new mutable.ArrayBuffer[Double](sz)
      var i = 0
      while (i < sz) { level += in.readDouble(); i += 1 }
      levels += level
      l += 1
    }
    if (levels.isEmpty) levels += mutable.ArrayBuffer.empty
    new QuantileBuffer(n, levels)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = newChildren.head)
}

object QuantileSketchAgg {
  /** Column-API entry: the sketch as an aggregate column. */
  def apply(c: Column, capacity: Int, probabilities: Seq[Double]): Column =
    bridge.column(
      QuantileSketchAgg(bridge.expression(c), capacity, probabilities)
        .toAggregateExpression())
}
