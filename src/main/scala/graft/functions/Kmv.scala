package graft.functions

import java.nio.ByteBuffer

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
 * KMV (bottom-k / k-minimum-values) distinct sketch (Bar-Yossef et al.,
 * RANDOM 2002) as a `TypedImperativeAggregate` — the AGGREGATE form of
 * [[graft.operators.CorpusStats.kmvSketch]]'s window pipeline, and the
 * sixth member of the sketch family (MG `p7`/`p8`, quantiles `p9`,
 * Count-Min `p10`, HLL `p11`, KMV `p12`/`p13`).
 *
 * Why both forms exist: the window form composes with arbitrary
 * DataFrame pipelines (and p13's sketch-union runs on its output); this
 * aggregate form is the SCALE and STREAMING shape — a fixed ≤k·8-byte
 * buffer per group, map-side combined like any aggregate, so the
 * shuffle carries O(groups·k) bytes with no sort anywhere, and the same
 * state machine runs under Structured Streaming update mode (the other
 * sketches' streaming story). The two are value-identical:
 * CorpusStatsSpec proves sketch-for-sketch equality and `p12a` gates
 * the aggregate path against `p12`'s verbatim oracle.
 *
 * Gating strength: like `p11`, the state is a deterministic function of
 * the input SET — bottom-k of distinct hashes is commutative,
 * associative and idempotent — so any partitioning / merge order yields
 * the same sketch. The portable hash is the repo's md5 idiom: the first
 * 8 digest bytes big-endian as an unsigned 64-bit value, whose unsigned
 * numeric order equals the lexicographic order of its 16-hex-char
 * rendering (what the oracle sorts on).
 *
 * `eval` returns one struct per group:
 *   - `n_keys`: retained hashes (= min(k, distinct inputs));
 *   - `kth_hash`: largest retained hash as 16 hex chars (null when the
 *     group is empty);
 *   - `est_e6`: the KMV estimate `(k-1)·2^64·10^6 div h_k` in exact
 *     integer micro-units (exact count `n·10^6` below capacity);
 *   - `sketch`: all retained hashes ascending, hex — the mergeable
 *     synopsis itself, so sketch-level set ops (p13) can run on stored
 *     aggregate output.
 */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2 && k <= (1 << 20), s"KmvAgg capacity k must be in [2, 2^20], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_distinct"

  override def dataType: DataType = StructType(Seq(
    StructField("n_keys", LongType, nullable = false),
    StructField("kth_hash", StringType, nullable = true),
    StructField("est_e6", LongType, nullable = false),
    StructField("sketch", ArrayType(StringType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](KmvAgg.UnsignedOrder)

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val md = HashKernels.mdLocal.get()
    md.reset()
    md.update(v.asInstanceOf[UTF8String].getBytes)
    val d = md.digest()
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    // only insert if it would survive: below the current kth, or room left
    if (buf.size < k || java.lang.Long.compareUnsigned(h, buf.last()) < 0) {
      buf.add(h)
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    buf.addAll(other)
    while (buf.size > k) buf.pollLast()
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val n = buf.size
    val hexes = new Array[Any](n)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      hexes(i) = UTF8String.fromString(f"${it.next().longValue()}%016x")
      i += 1
    }
    val estE6 =
      if (n < k) n.toLong * 1000000L
      else {
        val hk = BigInt(java.lang.Long.toUnsignedString(buf.last()))
        val num = BigInt(k - 1) * (BigInt(1) << 64) * 1000000L
        (num / hk).toLong
      }
    InternalRow(n.toLong,
      if (n == 0) null else hexes(n - 1),
      estE6, new GenericArrayData(hexes))
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 8)
    buf.forEach(h => bb.putLong(h))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren.head)
}

object KmvAgg {
  /** Serializable unsigned-64 comparator (a lambda field on the case
    * class would ride along in the task closure and Java lambdas are
    * not serializable). */
  private object UnsignedOrder
      extends java.util.Comparator[java.lang.Long] with Serializable {
    override def compare(a: java.lang.Long, b: java.lang.Long): Int =
      java.lang.Long.compareUnsigned(a, b)
  }

  /** Column-API entry: the sketch as an aggregate column. */
  def apply(c: Column, k: Int): Column =
    bridge.column(KmvAgg(bridge.expression(c), k).toAggregateExpression())
}
