package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

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
 * Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
 * custom `TypedImperativeAggregate` — point-frequency estimates over a
 * high-cardinality column in `depth × width` longs of fixed memory,
 * the third member of the sketch family (MG heavy hitters `p7`/`p8`,
 * quantiles `p9`).
 *
 * Where MG and the quantile sketch are oracle-gated only in their
 * under-capacity degeneration (their state depends on merge order),
 * Count-Min is STRONGER: counters are sums and merge is elementwise
 * addition — fully commutative and associative — so the whole sketch,
 * and therefore every estimate, is a deterministic order-independent
 * function of the input multiset at ANY capacity. `p10` gates the
 * estimates against a DuckDB oracle that replays the same counters in
 * SQL, collisions and all — no degeneration argument needed.
 *
 * Row hashes are the repo's engine-portable idiom: row `i` maps value
 * `v` to bucket `parseHex(md5("i:v")[0,12)) % width` — the same
 * function is expressible in both engines (Spark `conv(substring(md5(
 * concat(i, ':', v)), 1, 12), 16, 10) % width`, DuckDB `CAST('0x' ||
 * substr(md5(i || ':' || v), 1, 12) AS BIGINT) % width`; 48 bits, no
 * sign issues). Estimates carry the standard guarantees: never BELOW
 * the true count; above it by at most the row-collision mass
 * (CountMinSpec gates both, plus merge-order independence).
 *
 * `eval` returns `array<struct<value string, est long>>` for the fixed
 * `probes` list, in probe order — probes are part of the aggregate
 * (driver-side metadata), the scalable shape for monitoring a known
 * watchlist over an unbounded stream or corpus.
 */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    probes: Seq[String],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_count_min"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", StringType), StructField("est", LongType))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if depth > 0 && width > 0 && probes.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, depth/width > 0 and a " +
        s"non-empty probe list, got ${child.dataType.simpleString}, " +
        s"depth=$depth, width=$width, probes=${probes.size}")
  }

  /** UTF-8 bytes of the per-hash-row prefix `"i:"` — computed once per
    * operator instance, not per row (the aggregate's hottest path). */
  @transient private lazy val rowPrefixes: Array[Array[Byte]] =
    Array.tabulate(depth)(i => s"$i:".getBytes(StandardCharsets.UTF_8))

  /** Bucket of the key bytes in hash row `i`: first 48 md5 bits of
    * "i:v" mod width — bit-for-bit the expression both engines' SQL
    * forms compute. Streams the prefix and key bytes through the shared
    * thread-local digest (reset per call): no per-row digest
    * allocation, no "i:v" string materialization. */
  private def bucket(i: Int, keyBytes: Array[Byte]): Int = {
    val md = HashKernels.mdLocal.get()
    md.reset()
    md.update(rowPrefixes(i))
    md.update(keyBytes)
    val d = md.digest()
    var h = 0L
    var b = 0
    while (b < 6) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
    (h % width).toInt
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val keyBytes = v.asInstanceOf[UTF8String].getBytes
    var i = 0
    while (i < depth) { buf(i * width + bucket(i, keyBytes)) += 1L; i += 1 }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = probes.map { p =>
      var est = Long.MaxValue
      var i = 0
      val pb = p.getBytes(StandardCharsets.UTF_8)
      while (i < depth) {
        val c = buf(i * width + bucket(i, pb))
        if (c < est) est = c
        i += 1
      }
      InternalRow(UTF8String.fromString(p), est)
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

object CountMinAgg {
  /** Column-API entry: the sketch as an aggregate column. */
  def apply(c: Column, depth: Int, width: Int,
      probes: Seq[String]): Column =
    bridge.column(
      CountMinAgg(bridge.expression(c), depth, width, probes)
        .toAggregateExpression())
}
