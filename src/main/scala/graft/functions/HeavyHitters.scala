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
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra–Gries heavy-hitter sketch as a custom `TypedImperativeAggregate`
 * — the at-scale twin of the exact top-k value profile
 * ([[graft.operators.Quality.topValues]], gated as `p6`), following the
 * same exact/approx pairing as the w3 HLL twin and the p3 approx
 * profile.
 *
 * Why the exact form doesn't scale unconditionally: `topValues` group-bys
 * the VALUE domain — fine for enum-like columns, corpus-scale state for
 * high-cardinality ones (URLs, n-grams). Misra–Gries keeps at most
 * `numCounters` counters per partial aggregate — fixed memory, one pass,
 * map-side combinable — and its merged summary is MERGEABLE with the
 * standard guarantees (Agarwal et al., "Mergeable Summaries", PODS'12):
 *
 *   - every item with true frequency > N / (numCounters + 1) SURVIVES;
 *   - each reported count is a LOWER BOUND, short by at most
 *     N / (numCounters + 1) (N = total non-null rows).
 *
 * Counter values (not the guarantees) depend on partition/merge order,
 * so the sketch is spec-gated on its guarantees (HeavyHittersSpec)
 * rather than oracle-equality-gated — the same honesty rule as the HLL
 * and approx-percentile twins (DESIGN.md).
 *
 * update: present → +1; room → insert 1; full → decrement ALL (drop
 * zeros) — the classic k-counter step. merge: sum counters, then if over
 * capacity subtract the (numCounters+1)-th largest count and drop ≤ 0
 * (the mergeable-summaries reduction). eval: surviving (value,
 * count_lb) pairs sorted (count desc, value asc) for a stable report.
 */
case class MisraGriesAgg(
    child: Expression,
    numCounters: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_misra_gries"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", StringType), StructField("count_lb", LongType))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if numCounters > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column and numCounters > 0, got " +
        s"${child.dataType.simpleString}, numCounters=$numCounters")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val key = v.asInstanceOf[UTF8String].toString // copy out of row buffer
    buf.get(key) match {
      case Some(c) => buf.update(key, c + 1)
      case None if buf.size < numCounters => buf.update(key, 1L)
      case None =>
        // decrement-all step; zeros drop out
        val dead = mutable.ArrayBuffer.empty[String]
        buf.foreach { case (k, c) => if (c == 1) dead += k else buf.update(k, c - 1) }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    if (buf.size > numCounters) {
      // subtract the (numCounters+1)-th largest count from everything
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - numCounters - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.foreach { case (k, c) => if (c - cut <= 0) dead += k else buf.update(k, c - cut) }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // count ties break by UTF-8 BINARY order (UTF8String's comparator) —
    // the ordering StringType sorts give the exact twin (p6) and the
    // DuckDB oracle; Java String order diverges on supplementary-plane
    // characters (surrogate pairs sort below 0xE0.. lead bytes)
    val sorted = buf.toSeq
      .map { case (v, c) => (UTF8String.fromString(v), c) }
      .sortWith { case ((va, ca), (vb, cb)) =>
        ca > cb || (ca == cb && va.compareTo(vb) < 0) }
    new GenericArrayData(sorted.map { case (v, c) =>
      InternalRow(v, c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** Column-API entry: the sketch as an aggregate column. */
  def apply(c: Column, numCounters: Int): Column =
    bridge.column(
      MisraGriesAgg(bridge.expression(c), numCounters).toAggregateExpression())
}
